"""Streaming CEP **absence/timeout** detection — the batch
``pattern_tool_timeout`` query as a continuous alert stream (the
negative-pattern member of the streaming CEP family, beside the
failure->retry sequence pattern in streaming/patterns.py).

A tool call must receive its response — the turn at ``call_idx + 1``
with ``role='tool'`` — within ``response_timeout`` of the call's event
time. Calls that don't are emitted as alerts ``(conv_id, call_idx,
tool, call_us)`` the moment the match is decidable:

- **on response arrival**, when the turn at ``call_idx + 1`` turns out
  to be late (``ts > call_ts + timeout``) or not a tool response at
  all — the turn at an index is unique, so its content settles the
  call immediately;
- **on the event-time watermark passing ``call_ts + timeout``** for
  still-unanswered calls — under the watermark contract every in-time
  response (``ts <= deadline < watermark``) has already arrived, so
  absence at that instant is proof, not a guess. This is the part no
  session-close machinery can provide: the alert fires at the per-call
  deadline, not when the conversation's session eventually closes.

Unlike the session-keyed handlers, this one needs NO session gap and no
retention knob: state is self-bounding. Per conversation it holds

- *pending calls* — unresolved calls, each resolved exactly once (by
  response arrival or by deadline), and
- a *responder pool* — turns seen so far that could still answer a
  not-yet-arrived call. Turn order equals event-time order in the
  transcript derivation (derive.py), so a future non-late call at
  ``j - 1`` has ``ts <= pool[j].ts``; once the watermark passes a pool
  turn's own event time no such call can arrive any more and the row is
  pruned. The pool is therefore bounded by the out-of-order horizon
  (the watermark delay), and pending calls by the timeout horizon.

The per-key timer is the MIN over pending deadlines (or the pool's max
event time when nothing is pending, so empty state is eventually
dropped) — multi-deadline scheduling folded onto Spark's single
event-time timeout per key.

Stream == batch EXACTLY (same match set as
``operators/patterns.py::timeout_matches`` projected to the alert
columns) under the watermark contract; rows later than the watermark
are dropped and counted on the same dual channel as the sibling jobs
(engine ``numRowsDroppedByWatermark`` on Spark >= 4.1, else the handler
accumulator). A dropped late row diverges exactly as documented for
every other job: the stream scores what it was actually shown.

Exactly-once: the handler is deterministic given (state, batch); alerts
flow through the idempotent epoch sink (W7; kill-resume test).
"""

from __future__ import annotations

from collections.abc import Iterator

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
from data_harvesting_spark.operators.patterns import _isnull

TIMEOUT_STATE_SCHEMA = StructType(
    [
        StructField("p_idx", ArrayType(IntegerType()), True),
        StructField("p_tool", ArrayType(StringType()), True),
        StructField("p_call_us", ArrayType(LongType()), True),
        StructField("r_idx", ArrayType(IntegerType()), True),
        StructField("r_role", ArrayType(StringType()), True),
        StructField("r_ts_us", ArrayType(LongType()), True),
    ]
)

TIMEOUT_OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), True),
        StructField("call_idx", IntegerType(), True),
        StructField("tool", StringType(), True),
        StructField("call_us", LongType(), True),
    ]
)

ALERT_COLUMNS = ["conv_id", "call_idx", "tool", "call_us"]


def make_timeout_handler(cfg: HarvestConfig, late_counter=None):
    """Build the applyInPandasWithState handler (see module docstring)."""
    timeout_us = int(round(parse_duration_seconds(cfg.response_timeout) * 1e6))

    def handler(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]

        if state.exists:
            p_idx, p_tool, p_call_us, r_idx, r_role, r_ts_us = state.get
            pending = list(zip(p_idx, p_tool, p_call_us))
            pool = dict(zip(r_idx, zip(r_role, r_ts_us)))
        else:
            pending, pool = [], {}

        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000

        if not state.hasTimedOut:
            new = pd.concat(list(pdfs), ignore_index=True)
            ts_us = new["ts"].astype("datetime64[us]").astype("int64")
            if wm_ms > 0:
                late = ts_us < wm_us
                if late.any():
                    if late_counter is not None:
                        late_counter.add(int(late.sum()))
                    new, ts_us = new[~late], ts_us[~late]
                    if len(new) == 0 and not state.exists:
                        return
            for idx, role, tool, t_us in zip(
                new["turn_idx"], new["role"], new["tool"], ts_us
            ):
                pool[int(idx)] = (role, int(t_us))
                if role == "assistant" and not _isnull(tool):
                    pending.append((int(idx), tool, int(t_us)))

        alerts, still = [], []
        for idx, tool, call_us in pending:
            resp = pool.get(idx + 1)
            if resp is not None:
                resp_role, resp_us = resp
                if not (resp_role == "tool" and resp_us <= call_us + timeout_us):
                    alerts.append((conv_id, idx, tool, call_us))
                # else: answered in time — resolved silently
            elif wm_us > call_us + timeout_us:
                alerts.append((conv_id, idx, tool, call_us))
            else:
                still.append((idx, tool, call_us))

        # prune — two independent rules:
        # (1) watermark: a pool turn with ts < watermark can no longer
        #     answer any future call (that call's ts <= the turn's ts
        #     would make it late);
        # (2) settled predecessor: turn i only ever resolves the call at
        #     i-1. If i-1 is known at this invocation (in the pool or a
        #     new row) and is NOT still pending, its resolution already
        #     happened above — row i is dead weight. Contiguous turns
        #     arrive together, so this collapses the pool to range
        #     boundaries + answers to still-open calls, instead of the
        #     whole watermark horizon.
        still_idx = {i for i, _, _ in still}
        pool = {
            i: v
            for i, v in pool.items()
            if v[1] >= wm_us and ((i - 1) not in pool or (i - 1) in still_idx)
        }

        if still or pool:
            state.update(
                (
                    [i for i, _, _ in still],
                    [t for _, t, _ in still],
                    [c for _, _, c in still],
                    list(pool.keys()),
                    [v[0] for v in pool.values()],
                    [v[1] for v in pool.values()],
                )
            )
            if still:
                next_us = min(c + timeout_us for _, _, c in still)
            else:
                next_us = max(v[1] for v in pool.values())
            # fires once wm_ms exceeds the ms floor, i.e. wm_us strictly
            # passes next_us — the emission condition above
            state.setTimeoutTimestamp(max(next_us // 1000 + 1, wm_ms + 1))
        else:
            state.remove()

        if alerts:
            out = pd.DataFrame(alerts, columns=ALERT_COLUMNS)
            out["call_idx"] = out["call_idx"].astype("int32")
            out["call_us"] = out["call_us"].astype("int64")
            yield out

    return handler


def timeout_stream(
    transcripts_stream: DataFrame,
    cfg: HarvestConfig,
    late_counter=None,
) -> DataFrame:
    """Wire the timeout handler onto a watermarked transcript stream."""
    return (
        transcripts_stream.withWatermark("ts", cfg.watermark_delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            make_timeout_handler(cfg, late_counter),
            outputStructType=TIMEOUT_OUTPUT_SCHEMA,
            stateStructType=TIMEOUT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
