"""CEP sequence-pattern detection over conversation transcripts.

The north-star frames this engine as CEP over an agent-transcript
stream; this module is the explicit MATCH_RECOGNIZE-style member of
that family: detect the classic **failure -> retry** pattern — an
assistant tool-call turn whose tool response is empty (``error``) or
absent (``missing``), where the conversation's NEXT tool call reuses
the same tool. That sequence is the canonical "agent retried a flaky
tool" signal a harvesting pipeline uses to mine hard examples and to
rank tools by flakiness (reference analog: the detection-confidence
re-check loop in `/root/reference/services/harvest_service.py:166-214`,
which re-runs inference on frames whose first pass produced no usable
detections).

Pattern semantics (shared verbatim by the batch plan, the DuckDB
oracle, and the streaming handler):

- a *call* is a turn with ``role='assistant' AND tool IS NOT NULL``;
- its *outcome* comes from the turn at ``turn_idx + 1``: ``ok`` if that
  turn exists with ``role='tool'`` and non-blank text, ``error`` if it
  exists with blank text, ``missing`` if the conversation has no turn
  at that index (the response was dropped at source);
- a *match* is a consecutive pair of calls (in turn order) where the
  first call's outcome is not ``ok`` and the second call uses the same
  tool. Output: ``(conv_id, fail_idx, retry_idx, tool, outcome)``.

Scale posture (batch): both the outcome lookup and the next-call pairing
are ``lead`` windows over the SAME ``conv_id`` partitioning — one hash
exchange total, no self-join, whole-stage codegen throughout. The
pandas twin (``failed_retry_pdf``) exists for the streaming handler,
which must evaluate the pattern over buffered + carried turns at
watermark session close (see ``streaming/pipeline.py::
start_pattern_stream_job``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MATCH_COLUMNS = ["conv_id", "fail_idx", "retry_idx", "tool", "outcome"]

TIMEOUT_COLUMNS = ["conv_id", "call_idx", "tool", "call_us", "status", "wait_us"]


def timeout_matches(transcripts: DataFrame, timeout_s: float) -> DataFrame:
    """CEP **absence/timeout** pattern — the negative-pattern sibling of
    ``failed_retry_matches``: a tool call with no IN-TIME response.

    A *call* is ``role='assistant' AND tool IS NOT NULL`` at turn ``i``
    with event time ``call_ts``; its *in-time response* is a turn at
    ``i + 1`` with ``role='tool'`` and ``ts <= call_ts + timeout``. Every
    call lacking one is a match (reference analog: the harvest loop's
    forgotten-frame skip when inference produces nothing usable within
    the frame budget, `/root/reference/services/harvest_service.py:
    166-214` — here lifted to event time, the CEP absence operator).

    Output per match: ``(conv_id, call_idx, tool, call_us, status,
    wait_us)`` where ``status`` is ``'late'`` (a tool response exists at
    ``i+1`` but arrived after the deadline; ``wait_us`` = its actual
    wait) or ``'absent'`` (no tool response at ``i+1`` at all;
    ``wait_us`` NULL). All times are exact integer epoch micros — no
    float leaves the query.

    Scale posture: ONE ``lead`` window over the conv_id partitioning —
    a single hash exchange of the turn table, no self-join, whole-stage
    codegen; identical profile to ``failed_retry_matches``. The
    streaming twin (``streaming/timeouts.py``) emits the same match SET
    (projected to conv_id/call_idx/tool/call_us) the moment each match
    is decidable — at response arrival for ``late``, at the event-time
    watermark passing ``call_ts + timeout`` for unanswered calls.
    """
    timeout_us = int(round(timeout_s * 1_000_000))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
        F.lead("turn_idx").over(w).alias("n_idx"),
        F.lead("role").over(w).alias("n_role"),
        F.lead("ts").over(w).alias("n_ts"),
    )
    calls = seq.where(
        (F.col("role") == "assistant") & F.col("tool").isNotNull()
    )
    # null-safe: on the conversation's last turn lead() is NULL and
    # ~NULL is NULL, which would silently skip the 'absent' branch
    responded = F.coalesce(
        (F.col("n_idx") == F.col("turn_idx") + 1)
        & (F.col("n_role") == "tool"),
        F.lit(False),
    )
    wait = F.unix_micros("n_ts") - F.unix_micros("ts")
    return calls.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("call_idx"),
        "tool",
        F.unix_micros("ts").alias("call_us"),
        F.when(responded & (wait > timeout_us), F.lit("late"))
        .when(~responded, F.lit("absent"))
        .alias("status"),
        F.when(responded, wait).alias("wait_us"),
    ).where(F.col("status").isNotNull())


def failed_retry_matches(transcripts: DataFrame) -> DataFrame:
    """Batch detector: failure->retry matches over a transcript frame
    with columns (conv_id, turn_idx, role, text, tool)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        F.lead("turn_idx").over(w).alias("n_idx"),
        F.lead("role").over(w).alias("n_role"),
        F.lead("text").over(w).alias("n_text"),
    )
    calls = seq.where(
        (F.col("role") == "assistant") & F.col("tool").isNotNull()
    ).select(
        "conv_id",
        "turn_idx",
        "tool",
        F.when(
            (F.col("n_idx") == F.col("turn_idx") + 1)
            & (F.col("n_role") == "tool"),
            F.when(
                F.length(F.trim(F.col("n_text"))) == 0, F.lit("error")
            ).otherwise(F.lit("ok")),
        )
        .otherwise(F.lit("missing"))
        .alias("outcome"),
    )
    paired = calls.select(
        "conv_id",
        "turn_idx",
        "tool",
        "outcome",
        F.lead("turn_idx").over(w).alias("retry_idx"),
        F.lead("tool").over(w).alias("next_tool"),
    )
    return paired.where(
        (F.col("outcome") != "ok") & (F.col("next_tool") == F.col("tool"))
    ).select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("fail_idx"),
        F.col("retry_idx").cast("int").alias("retry_idx"),
        "tool",
        "outcome",
    )


def _blank(x) -> bool:
    # strip(' ') not strip(): Spark/DuckDB trim() removes only spaces, so a
    # tab/newline-only response is NOT blank in the batch rule either
    return x is None or (isinstance(x, float) and pd.isna(x)) or not str(x).strip(" ")


def _isnull(x) -> bool:
    # mirrors SQL `IS NULL` exactly — an empty-string tool is still a call
    return x is None or (isinstance(x, float) and pd.isna(x))


def failed_retry_pdf(
    turns: pd.DataFrame, carry: pd.DataFrame
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Pandas twin of ``failed_retry_matches`` for the streaming handler.

    ``turns``: one conversation's newly-finalized turns (columns conv_id,
    turn_idx, role, text, tool — any order). ``carry``: the <=2-row
    suffix carried from the previous close (columns c_idx, c_role,
    c_text, c_tool) — the conversation's last call turn plus, if already
    seen, the turn immediately after it. The concatenation is a complete
    prefix of the conversation from that call onward (watermark-closed
    sessions finalize in event-time order, and turn order equals ts
    order in the derivation), so outcomes computed by index adjacency
    here equal the batch window's.

    Returns ``(matches, new_carry)``: every match whose retry call is
    now final, and the new suffix to carry (last call + its successor
    if seen). The last call's own retry-check stays pending in the
    carry — it is evaluated exactly once, at the close where the next
    call arrives (or never, if the conversation ends).
    """
    cols = ["turn_idx", "role", "text", "tool"]
    prev = pd.DataFrame(
        {
            "turn_idx": pd.array(carry["c_idx"], dtype="int64"),
            "role": list(carry["c_role"]),
            "text": list(carry["c_text"]),
            "tool": list(carry["c_tool"]),
        }
    )
    allt = pd.concat([prev, turns[cols]], ignore_index=True).sort_values(
        "turn_idx", kind="mergesort"
    )
    conv_id = turns["conv_id"].iloc[0] if len(turns) else None

    idx = allt["turn_idx"].to_numpy()
    roles = allt["role"].tolist()
    texts = allt["text"].tolist()
    tools = allt["tool"].tolist()

    calls = []  # (turn_idx, tool, outcome)
    for j in range(len(allt)):
        if roles[j] != "assistant" or _isnull(tools[j]):
            continue
        if j + 1 < len(allt) and idx[j + 1] == idx[j] + 1 and roles[j + 1] == "tool":
            outcome = "error" if _blank(texts[j + 1]) else "ok"
        else:
            # complete prefix: a later finalized turn with a higher index
            # proves idx+1 was dropped at source; if j is the LAST row its
            # outcome may still be pending, but the last call never emits
            # at this close anyway.
            outcome = "missing"
        calls.append((int(idx[j]), tools[j], outcome, j))

    rows = []
    for (fi, tool, outcome, _), (ri, rtool, _, _) in zip(calls, calls[1:]):
        if outcome != "ok" and rtool == tool:
            rows.append((conv_id, fi, ri, tool, outcome))
    matches = pd.DataFrame(rows, columns=MATCH_COLUMNS)
    matches["fail_idx"] = matches["fail_idx"].astype("int32")
    matches["retry_idx"] = matches["retry_idx"].astype("int32")

    if calls:
        j = calls[-1][3]
        keep = [j, j + 1] if j + 1 < len(allt) and idx[j + 1] == idx[j] + 1 else [j]
        suffix = allt.iloc[keep]
        new_carry = pd.DataFrame(
            {
                "c_idx": pd.array(suffix["turn_idx"], dtype="int32"),
                "c_role": suffix["role"].tolist(),
                "c_text": suffix["text"].tolist(),
                "c_tool": suffix["tool"].tolist(),
            }
        )
    else:
        # no call seen yet in this conversation: nothing can match later
        # without a new call first, so the carry stays empty
        new_carry = EMPTY_PATTERN_CARRY.copy()
    return matches, new_carry


EMPTY_PATTERN_CARRY = pd.DataFrame(
    {
        "c_idx": pd.array([], dtype="int32"),
        "c_role": pd.array([], dtype="object"),
        "c_text": pd.array([], dtype="object"),
        "c_tool": pd.array([], dtype="object"),
    }
)
