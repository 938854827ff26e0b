"""Stateful session correlator (J3/P9/P10/W5) — the streaming core.

``applyInPandasWithState`` keyed by ``conv_id`` (reference keyed state:
`utils/ClassificationObject.py:52-83`, tracker correlation
`condition.py:22-24`). Design: **buffer-then-emit-on-close**:

- each micro-batch appends the key's new turns to an ArrayType state buffer
  (RocksDB-backed, spills to disk),
- the buffer is split into gap-bounded sessions in EVENT time; a session is
  emitted through the shared kernel (operators/kernel.py) only once the
  watermark passes ``session_end + gap`` — i.e. no earlier turn can still
  arrive (within-watermark late turns land in the buffer and sort in),
- event-time timeout (W5) closes and emits whatever remains when the
  watermark moves past the conversation, then drops the state.

This gives byte parity with the batch runner by construction (same kernel,
same gap-splitting), exactly-once when paired with the idempotent sink
keyed (conv_id, window_start) (sink.py), and bounded state (sessions close
as the watermark advances; RocksDB absorbs hot conversations).

Conversation-scope budgets (cfg.cap_scope, the reference's per-video cap):
the state also carries the P9 emitted count and P10 suppression cursor,
threaded through session closes in event-time order; after the last
session closes, a counters-only tombstone is retained for
``cap_state_retention`` so a later session continues the budget instead of
restarting (exact batch parity for inter-session gaps under the
retention).

Late-data policy (W2/W6): unlike JVM windowed aggregations,
``applyInPandasWithState`` does NOT pre-filter rows older than the
watermark — the handler itself drops beyond-watermark rows and counts them
in an accumulator (pinned by
tests/test_streaming.py::test_late_drop_counted_in_metrics and surfaced
through metrics.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

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
from data_harvesting_spark.operators.kernel import (
    curate_session,
    curate_sessions_frame,
    session_id_array,
    split_sessions,
)
from data_harvesting_spark.schema import CURATED_SCHEMA

# state = column-wise session buffer (ArrayType fields, RocksDB-friendly)
# + the conversation-scope cap cursor (P9 budget spent so far + P10
# suppression watermark), carried across this conversation's session closes
STATE_SCHEMA = StructType(
    [
        StructField("turn_idx", ArrayType(IntegerType()), True),
        StructField("role", ArrayType(StringType()), True),
        StructField("text", ArrayType(StringType()), True),
        StructField("tool", ArrayType(StringType()), True),
        StructField("ts_us", ArrayType(LongType()), True),
        StructField("text_hash", ArrayType(LongType()), True),
        StructField("emitted", LongType(), True),
        StructField("suppress_until", LongType(), True),
    ]
)

_EMPTY_BUFFER = ([], [], [], [], [], [])


def _carry_of(state_tuple: tuple) -> dict:
    emitted = state_tuple[6] if len(state_tuple) > 6 else None
    sup = state_tuple[7] if len(state_tuple) > 7 else None
    return {
        "emitted": int(emitted) if emitted is not None else 0,
        "suppress_until": int(sup) if sup is not None else -1,
    }


def _buffer_to_pdf(conv_id: str, state_tuple: tuple) -> pd.DataFrame:
    turn_idx, role, text, tool, ts_us, text_hash = state_tuple[:6]
    return pd.DataFrame(
        {
            "conv_id": np.repeat(conv_id, len(turn_idx)),
            "turn_idx": pd.array(turn_idx, dtype="int32"),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pd.to_datetime(pd.array(ts_us, dtype="int64"), unit="us"),
            "text_hash": pd.array(text_hash, dtype="Int64"),  # nullable int: no float roundtrip
        }
    )


def _pdf_to_buffer(pdf: pd.DataFrame) -> tuple:
    return (
        pdf["turn_idx"].astype("int32").tolist(),
        pdf["role"].tolist(),
        [None if pd.isna(x) else x for x in pdf["text"]],
        [None if pd.isna(x) else x for x in pdf["tool"]],
        (pdf["ts"].astype("datetime64[us]").astype("int64")).tolist(),
        [None if pd.isna(x) else int(x) for x in pdf["text_hash"]],
    )


def make_correlator(cfg: HarvestConfig, late_counter=None):
    """Build the applyInPandasWithState handler closure.

    ``late_counter``: optional Spark Accumulator counting dropped late
    rows. Unlike JVM windowed aggregations, applyInPandasWithState does
    NOT pre-filter rows older than the watermark (pinned by
    tests/test_streaming.py::test_late_drop_counted_in_metrics) — the
    handler enforces the W2/W6 late-data policy itself so a
    beyond-watermark turn can neither reopen nor corrupt a session.
    """
    gap_s = parse_duration_seconds(cfg.session_gap)
    gap_ms = int(gap_s * 1000)
    conv_scope = cfg.cap_scope == "conversation"
    retention_ms = int(parse_duration_seconds(cfg.cap_state_retention) * 1000)

    def handler(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]

        if state.hasTimedOut:
            tup = state.get
            buf = _buffer_to_pdf(conv_id, tup)
            carry = _carry_of(tup)
            if len(buf) == 0:
                # counters-only tombstone expired (conversation-scope cap
                # cursor past its retention) — forget the conversation
                state.remove()
                return
            # one multi-session kernel call over the whole remaining buffer
            # (identical semantics to per-session calls with the carried
            # cursor, and it makes the conversation-scope min gate exact:
            # deferred conversations are gated on their full pair count
            # here, just like batch)
            pdf2, sids = session_id_array(buf, gap_s)
            out = curate_sessions_frame(
                pdf2, sids, cfg, carry if conv_scope else None
            )
            if len(out):
                yield out
            last_ms = buf["ts"].max().value // 1_000_000
            wm = state.getCurrentWatermarkMs()
            if conv_scope and carry["emitted"] > 0:
                # keep the cap cursor so a session arriving within the
                # retention window continues the conversation's budget
                # instead of restarting at 0 (exact batch parity for
                # inter-session gaps < cap_state_retention)
                state.update(
                    _EMPTY_BUFFER
                    + (carry["emitted"], carry["suppress_until"])
                )
                state.setTimeoutTimestamp(
                    max(last_ms + gap_ms + retention_ms, wm + 1)
                )
            elif (
                conv_scope
                and cfg.min_pairs_per_conv > 1
                and carry["emitted"] == 0
                and carry.get("gate_blocked", 0) > 0
                and wm < last_ms + gap_ms + retention_ms
            ):
                # min gate failed with nothing emitted: keep the BUFFER
                # (not just counters) for the retention window, so a later
                # session pools with these pairs and the gate sees the
                # conversation total — exactly as batch would (r2 ADVICE:
                # dropping here made earlier pairs never count). At the
                # retention-expiry timeout wm has passed last+gap+retention,
                # so this branch is not re-entered — the state is removed
                # and the conversation stays gated, batch-equal for any
                # inter-session gap under the retention.
                state.update(
                    _pdf_to_buffer(buf)
                    + (carry["emitted"], carry["suppress_until"])
                )
                state.setTimeoutTimestamp(
                    max(last_ms + gap_ms + retention_ms, wm + 1)
                )
            else:
                state.remove()
            return

        new = pd.concat(list(pdfs), ignore_index=True)
        new = new.rename(columns={"ts": "ts"})
        new["text_hash"] = new["text_hash"].astype("Int64")

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
            tup = state.get
            carry = _carry_of(tup)
            buf = pd.concat([_buffer_to_pdf(conv_id, tup), new], ignore_index=True)
        else:
            carry = {"emitted": 0, "suppress_until": -1}
            buf = new

        # closed sessions are a time-ordered prefix (earlier session ⇒
        # earlier end), so threading the conversation-scope carry through
        # them in order reproduces the batch kernel's cumulative budget.
        # Conversation-scope min gate: the gate needs the conversation's
        # TOTAL pair count, so emission is deferred — every session stays
        # buffered until the event-time timeout curates the whole
        # conversation at once (exact batch semantics by construction).
        defer_for_min_gate = conv_scope and cfg.min_pairs_per_conv > 1
        sessions = split_sessions(buf, gap_s)
        wm_ms = state.getCurrentWatermarkMs()
        keep: list[pd.DataFrame] = []
        for sess in sessions:
            end_ms = sess["ts"].max().value // 1_000_000
            # strict <: an admissible event at ts == watermark == end + gap
            # would still MERGE into this session (JVM merges touching
            # windows), so the session is only closed once wm is past it
            if (
                not defer_for_min_gate
                and not keep
                and wm_ms > 0
                and end_ms + gap_ms < wm_ms
            ):
                out = curate_session(  # closed: no earlier-than-
                    sess, cfg, carry if conv_scope else None
                )
                if len(out):  # watermark turn can arrive
                    yield out
            else:
                keep.append(sess)

        if keep:
            remaining = pd.concat(keep, ignore_index=True)
            state.update(
                _pdf_to_buffer(remaining)
                + (carry["emitted"], carry["suppress_until"])
            )
            last_ms = remaining["ts"].max().value // 1_000_000
            # fire once the watermark passes session end + gap
            state.setTimeoutTimestamp(max(last_ms + gap_ms, wm_ms + 1))
        elif conv_scope and carry["emitted"] > 0:
            last_ms = (
                buf["ts"].max().value // 1_000_000 if len(buf) else wm_ms
            )
            state.update(
                _EMPTY_BUFFER + (carry["emitted"], carry["suppress_until"])
            )
            state.setTimeoutTimestamp(
                max(last_ms + gap_ms + retention_ms, wm_ms + 1)
            )
        else:
            state.remove()

    return handler


def correlate_stream(transcripts_stream, cfg: HarvestConfig, late_counter=None):
    """Wire the stateful correlator onto a watermarked transcript stream.

    transcripts_stream: streaming DataFrame with TRANSCRIPT_SCHEMA columns
    plus precomputed ``text_hash`` (JVM xxhash64 — keeps hashing out of
    Python and identical to the batch path).
    """
    return (
        transcripts_stream.withWatermark("ts", cfg.watermark_delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            make_correlator(cfg, late_counter),
            outputStructType=CURATED_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
