"""Streaming CEP failure->retry pattern detection — the batch
``pattern_failed_retry`` catalog query as a continuous stateful stream
(the explicit MATCH_RECOGNIZE-style member of the streaming family).

Shape: buffer-then-emit like the SFT exporter (streaming/sft.py) —
``applyInPandasWithState`` keyed by conv_id, sessions finalized strictly
in event-time order once the watermark passes ``session_end + gap`` —
but the emitted artifact is pattern MATCHES, and the carry is the
conversation's pattern-active suffix: its last tool-call turn plus, if
already seen, the turn immediately after it (which pins that call's
outcome). That <=2-row carry is the information floor for exactness:
every earlier call's outcome and retry-pairing is fully determined by
turns already finalized, so matches spanning session closes (fail at
the end of one session, retry in the next) emit exactly as the batch
windows would (pinned by the cross-session test).

Retention: after all sessions close the conversation keeps its carry
(O(1) rows) until event-time timeout at ``last activity +
max(session_gap, cap_state_retention)`` — a retry arriving later than
the retention is scored as a fresh conversation (no match), the same
divergence floor as the sibling dedup/cap ledgers. Within retention the
stream is EXACTLY batch-equal.

Exactly-once: the handler is deterministic given (state, batch), state
is checkpoint-versioned, and matches flow through the idempotent epoch
sink — a replayed epoch rewrites identical rows (W7; kill-resume test).

Late data (W2/W6): Spark >= 4.1 pre-filters beyond-watermark rows before
``applyInPandasWithState`` and accounts them in the
``numRowsDroppedByWatermark`` state-operator metric; the handler keeps
its own drop-and-count guard (the accumulator) for engines that hand
late rows through. The parity test accepts either accounting channel.
"""

from __future__ import annotations

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
from data_harvesting_spark.operators.patterns import (
    EMPTY_PATTERN_CARRY,
    failed_retry_pdf,
)

PATTERN_STATE_SCHEMA = StructType(
    [
        StructField("turn_idx", ArrayType(IntegerType()), True),
        StructField("role", ArrayType(StringType()), True),
        StructField("text", ArrayType(StringType()), True),
        StructField("tool", ArrayType(StringType()), True),
        StructField("ts_us", ArrayType(LongType()), True),
        StructField("c_idx", ArrayType(IntegerType()), True),
        StructField("c_role", ArrayType(StringType()), True),
        StructField("c_text", ArrayType(StringType()), True),
        StructField("c_tool", ArrayType(StringType()), True),
    ]
)

PATTERN_OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), True),
        StructField("fail_idx", IntegerType(), True),
        StructField("retry_idx", IntegerType(), True),
        StructField("tool", StringType(), True),
        StructField("outcome", StringType(), True),
    ]
)

_BUF_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _opt(xs):
    return [None if pd.isna(x) else x for x in xs]


def _state_to_frames(conv_id: str, tup: tuple) -> tuple[pd.DataFrame, pd.DataFrame]:
    turn_idx, role, text, tool, ts_us, c_idx, c_role, c_text, c_tool = tup[:9]
    buf = pd.DataFrame(
        {
            "conv_id": np.repeat(conv_id, len(turn_idx)),
            "turn_idx": pd.array(turn_idx, dtype="int32"),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pd.to_datetime(pd.array(ts_us, dtype="int64"), unit="us"),
        }
    )
    carry = pd.DataFrame(
        {
            "c_idx": pd.array(c_idx or [], dtype="int32"),
            "c_role": c_role or [],
            "c_text": c_text or [],
            "c_tool": c_tool or [],
        }
    )
    return buf, carry


def _frames_to_state(buf: pd.DataFrame, carry: pd.DataFrame) -> tuple:
    return (
        buf["turn_idx"].astype("int32").tolist(),
        buf["role"].tolist(),
        _opt(buf["text"]),
        _opt(buf["tool"]),
        (buf["ts"].astype("datetime64[us]").astype("int64")).tolist(),
        carry["c_idx"].astype("int32").tolist(),
        carry["c_role"].tolist(),
        _opt(carry["c_text"]),
        _opt(carry["c_tool"]),
    )


def make_pattern_handler(cfg: HarvestConfig, late_counter=None):
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
                # gap timeout: the buffered final session is complete (the
                # watermark passed its end + gap) — evaluate the pattern
                # suffix exactly once, then fall back to carry-only
                # retention in case a later session still retries it
                matches, carry = failed_retry_pdf(buf, carry)
                if len(matches):
                    yield matches
                if len(carry):
                    last_ms = buf["ts"].max().value // 1_000_000
                    wm_ms = state.getCurrentWatermarkMs()
                    state.update(_frames_to_state(buf.iloc[0:0], carry))
                    state.setTimeoutTimestamp(
                        max(last_ms + retention_ms, wm_ms + 1)
                    )
                    return
            # retention timeout on a carry-only state (or no carry left):
            # the retry never arrived within retention — forget
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
            carry = EMPTY_PATTERN_CARRY.copy()
            buf = new[_BUF_COLS]
        if len(buf) == 0:
            return

        wm_ms = state.getCurrentWatermarkMs()
        last_ms = buf["ts"].max().value // 1_000_000
        sessions = split_sessions(buf, gap_s)
        keep: list[pd.DataFrame] = []
        for sess in sessions:
            end_ms = sess["ts"].max().value // 1_000_000
            if not keep and wm_ms > 0 and end_ms + gap_ms < wm_ms:
                matches, carry = failed_retry_pdf(sess, carry)
                if len(matches):
                    yield matches
            else:
                keep.append(sess)

        if keep:
            remaining = pd.concat(keep, ignore_index=True)
            state.update(_frames_to_state(remaining, carry))
            # gap clock: flush the buffered session promptly once the
            # watermark passes its end + gap (the carry then switches to
            # the retention clock in the hasTimedOut branch)
            state.setTimeoutTimestamp(max(last_ms + gap_ms, wm_ms + 1))
        elif len(carry):
            # all sessions emitted, but the carried call could still be
            # retried by a non-late future turn — keep the O(1) carry
            # until the retention passes (exactness within retention)
            empty_buf = buf.iloc[0:0]
            state.update(_frames_to_state(empty_buf, carry))
            state.setTimeoutTimestamp(max(last_ms + retention_ms, wm_ms + 1))
        else:
            state.remove()

    return handler


def pattern_stream(
    transcripts_stream: DataFrame,
    cfg: HarvestConfig,
    late_counter=None,
) -> DataFrame:
    """Wire the pattern handler onto a watermarked transcript stream."""
    return (
        transcripts_stream.withWatermark("ts", cfg.watermark_delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            make_pattern_handler(cfg, late_counter),
            outputStructType=PATTERN_OUTPUT_SCHEMA,
            stateStructType=PATTERN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
