"""Streaming SFT context→target export — the batch ``sft_pairs`` catalog
query as a continuous stateful stream (the third export sibling, after
the composite training export and the DPO preference stream).

Shape: buffer-then-emit like the session correlator (state.py), but the
emitted artifact is SFT pairs over the conversation's ORDERED turns, and
the state carries the last ``context_turns`` already-emitted turns
forward. That carry is what makes the stream EXACTLY batch-equal even
when a conversation spans multiple session windows: the first assistant
turn of session 2 still sees the tail of session 1 as context, precisely
as the batch frame (``ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING`` over the
whole conversation) would. Carry width is O(context_turns) per live
conversation — constant. Since r5 the carry OUTLIVES the last session
close on the ``cap_state_retention`` clock: a conversation resuming with
non-late turns (ts >= watermark) after all its sessions were emitted
still sees the previous tail as context, exactly as the batch frame
does; a resumption later than the retention is scored as a fresh
conversation (the sibling ledgers' divergence floor).

Emission discipline mirrors the correlator: a session is emitted only
once the event-time watermark passes ``session_end + gap`` (no earlier
turn can still arrive), sessions close strictly in time order, and the
event-time timeout flushes whatever remains when the watermark moves past
the conversation. Beyond-watermark rows are dropped and counted (W2/W6 —
``applyInPandasWithState`` does not pre-filter them).

Exactly-once: the handler is deterministic given (state, batch), state is
checkpoint-versioned, and the epoch sink is idempotent — a replayed epoch
rewrites identical rows (W7), pinned by the kill-resume test.

Reference analog: the continuous dataset writer
(`/root/reference/queue_harvesting.py:30-57`) feeding the pair export
(`/root/reference/exports/yolov8/yolov8_export.py:63-90`), re-expressed
for text SFT pairs.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_harvesting_spark.config import HarvestConfig
from data_harvesting_spark.operators.curate_sessions import parse_duration_seconds
from data_harvesting_spark.operators.kernel import split_sessions

# buffered (not-yet-emitted) turns + the ≤context_turns carry of already-
# emitted turns (context continuity across session closes)
SFT_STATE_SCHEMA = StructType(
    [
        StructField("turn_idx", ArrayType(IntegerType()), True),
        StructField("role", ArrayType(StringType()), True),
        StructField("text", ArrayType(StringType()), True),
        StructField("ts_us", ArrayType(LongType()), True),
        StructField("c_idx", ArrayType(IntegerType()), True),
        StructField("c_role", ArrayType(StringType()), True),
        StructField("c_text", ArrayType(StringType()), True),
    ]
)

SFT_OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), True),
        StructField("turn_idx", IntegerType(), True),
        StructField("context", StringType(), True),
        StructField("target", StringType(), True),
    ]
)


def _line(role, text) -> str:
    """Python twin of the batch ``concat_ws(": ", role, text)`` — null
    text collapses to the bare role, empty text keeps the separator."""
    if text is None or (isinstance(text, float) and pd.isna(text)):
        return "" if role is None else str(role)
    if role is None:
        return str(text)
    return f"{role}: {text}"


def _ws_tokens_py(text) -> int:
    """Python twin of the batch whitespace token count (0 for
    empty/null) — shared rule with ``context_window_trim``. Mirrors the
    JVM exactly: trim() strips spaces only (not tabs/newlines), the
    split pattern is Java ``\\s+`` (ASCII whitespace, not unicode), and
    split keeps leading/trailing empty tokens (Spark split limit=-1)."""
    if text is None or (isinstance(text, float) and pd.isna(text)):
        return 0
    t = str(text).strip(" ")
    if not t:
        return 0
    return len(re.split(r"[ \t\n\x0b\f\r]+", t))


def sft_pairs_pdf(
    pdf: pd.DataFrame,
    carry: pd.DataFrame,
    context_turns: int,
    context_budget: int | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Emit SFT pairs for ``pdf``'s turns given the already-emitted
    ``carry`` prefix; return (pairs, new carry = last context_turns of
    carry+pdf). Turn order is batch's: ascending turn_idx.
    ``context_budget`` applies the context_window_trim rule per pair
    (longest suffix of context+target within the token budget, target
    always kept, walk stops at the first busting line) — the exact twin
    of ``sft_pairs_frame``'s array fold."""
    pdf = pdf.sort_values("turn_idx")
    conv_id = pdf["conv_id"].iloc[0]
    all_idx = list(carry["c_idx"]) + [int(x) for x in pdf["turn_idx"]]
    all_role = list(carry["c_role"]) + list(pdf["role"])
    all_text = list(carry["c_text"]) + list(pdf["text"])
    lines = [_line(r, t) for r, t in zip(all_role, all_text)]
    n_carry = len(carry)
    rows = []
    for j in range(n_carry, len(all_idx)):
        role, text = all_role[j], all_text[j]
        if role != "assistant" or text is None or not str(text).strip():
            continue
        lo = max(0, j - context_turns)
        if lo == j:
            continue
        if context_budget is not None:
            total = _ws_tokens_py(text)
            lo_eff = j
            for i in range(j - 1, lo - 1, -1):
                total += _ws_tokens_py(all_text[i])
                if total > context_budget:
                    break
                lo_eff = i
            ctx = "\n".join(lines[lo_eff:j])
        else:
            ctx = "\n".join(lines[lo:j])
        rows.append((conv_id, all_idx[j], ctx, text))
    pairs = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "context", "target"]
    )
    pairs["turn_idx"] = pairs["turn_idx"].astype("int32")
    k = min(context_turns, len(all_idx))
    new_carry = pd.DataFrame(
        {
            "c_idx": pd.array(all_idx[-k:] if k else [], dtype="int32"),
            "c_role": all_role[-k:] if k else [],
            "c_text": all_text[-k:] if k else [],
        }
    )
    return pairs, new_carry


def _state_to_frames(conv_id: str, tup: tuple) -> tuple[pd.DataFrame, pd.DataFrame]:
    turn_idx, role, text, ts_us, c_idx, c_role, c_text = tup[:7]
    buf = pd.DataFrame(
        {
            "conv_id": np.repeat(conv_id, len(turn_idx)),
            "turn_idx": pd.array(turn_idx, dtype="int32"),
            "role": role,
            "text": text,
            "ts": pd.to_datetime(pd.array(ts_us, dtype="int64"), unit="us"),
        }
    )
    carry = pd.DataFrame(
        {
            "c_idx": pd.array(c_idx or [], dtype="int32"),
            "c_role": c_role or [],
            "c_text": c_text or [],
        }
    )
    return buf, carry


def _frames_to_state(buf: pd.DataFrame, carry: pd.DataFrame) -> tuple:
    return (
        buf["turn_idx"].astype("int32").tolist(),
        buf["role"].tolist(),
        [None if pd.isna(x) else x for x in buf["text"]],
        (buf["ts"].astype("datetime64[us]").astype("int64")).tolist(),
        carry["c_idx"].astype("int32").tolist(),
        carry["c_role"].tolist(),
        [None if pd.isna(x) else x for x in carry["c_text"]],
    )


_EMPTY_CARRY = pd.DataFrame(
    {"c_idx": pd.array([], dtype="int32"), "c_role": [], "c_text": []}
)


def make_sft_handler(
    cfg: HarvestConfig, context_turns: int = 3, late_counter=None,
    context_budget: int | None = None,
):
    """Build the applyInPandasWithState handler (see module docstring)."""
    gap_s = parse_duration_seconds(cfg.session_gap)
    gap_ms = int(gap_s * 1000)
    retention_ms = max(
        gap_ms, int(parse_duration_seconds(cfg.cap_state_retention) * 1000)
    )

    def handler(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]

        if state.hasTimedOut:
            buf, carry = _state_to_frames(conv_id, state.get)
            if len(buf):
                pairs, carry = sft_pairs_pdf(
                    buf, carry, context_turns, context_budget
                )
                if len(pairs):
                    yield pairs
                # gap timeout flushed the final buffered session; keep the
                # emitted-turns carry on the RETENTION clock — a non-late
                # turn can still arrive (ts >= watermark) and its batch
                # context window reaches back across this close (r5 fix:
                # previously the carry was dropped here, truncating the
                # context of any post-close resumption)
                if len(carry):
                    last_ms = buf["ts"].max().value // 1_000_000
                    wm_ms = state.getCurrentWatermarkMs()
                    state.update(
                        _frames_to_state(buf.iloc[0:0], carry)
                    )
                    state.setTimeoutTimestamp(
                        max(last_ms + retention_ms, wm_ms + 1)
                    )
                    return
            # retention timeout on a carry-only state: a resumption this
            # late falls outside the retention contract (same divergence
            # floor as the sibling ledgers)
            state.remove()
            return

        new = pd.concat(list(pdfs), ignore_index=True)
        wm0_ms = state.getCurrentWatermarkMs()
        if wm0_ms > 0:
            late = new["ts"].astype("datetime64[us]").astype("int64") < (
                wm0_ms * 1000
            )
            if late.any():
                if late_counter is not None:
                    late_counter.add(int(late.sum()))
                new = new[~late]
                if len(new) == 0 and not state.exists:
                    return

        if state.exists:
            buf0, carry = _state_to_frames(conv_id, state.get)
            buf = pd.concat([buf0, new[buf0.columns]], ignore_index=True)
        else:
            carry = _EMPTY_CARRY
            buf = new[["conv_id", "turn_idx", "role", "text", "ts"]]
        if len(buf) == 0:
            # late-only batch on a carry-only conversation: leave the carry
            # and its retention timeout untouched (resetting it here would
            # evict the carry at the next watermark tick, truncating the
            # context of a later non-late resumption)
            return

        wm_ms = state.getCurrentWatermarkMs()
        sessions = split_sessions(buf, gap_s)
        keep: list[pd.DataFrame] = []
        for sess in sessions:
            end_ms = sess["ts"].max().value // 1_000_000
            # strict <: at ts == end + gap an admissible turn still merges
            if not keep and wm_ms > 0 and end_ms + gap_ms < wm_ms:
                pairs, carry = sft_pairs_pdf(
                    sess, carry, context_turns, context_budget
                )
                if len(pairs):
                    yield pairs
            else:
                keep.append(sess)

        if keep:
            remaining = pd.concat(keep, ignore_index=True)
            state.update(_frames_to_state(remaining, carry))
            last_ms = remaining["ts"].max().value // 1_000_000
            state.setTimeoutTimestamp(max(last_ms + gap_ms, wm_ms + 1))
        elif len(carry):
            # everything emitted, nothing buffered — but a NON-late turn
            # (ts >= watermark) can still resume this conversation, and
            # the batch frame's context window reaches back across the
            # close. Keep the O(context_turns) carry on the retention
            # clock (r5 fix; previously removed here, which truncated the
            # context of post-close resumptions — the cross-close test
            # pins the repaired behavior).
            empty_buf = buf.iloc[0:0]
            state.update(_frames_to_state(empty_buf, carry))
            last_ms = buf["ts"].max().value // 1_000_000
            state.setTimeoutTimestamp(max(last_ms + retention_ms, wm_ms + 1))
        else:
            state.remove()

    return handler


def sft_stream(
    transcripts_stream: DataFrame,
    cfg: HarvestConfig,
    context_turns: int = 3,
    late_counter=None,
    context_budget: int | None = None,
) -> DataFrame:
    """Wire the SFT handler onto a watermarked transcript stream."""
    return (
        transcripts_stream.withWatermark("ts", cfg.watermark_delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            make_sft_handler(cfg, context_turns, late_counter,
                             context_budget),
            outputStructType=SFT_OUTPUT_SCHEMA,
            stateStructType=SFT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
