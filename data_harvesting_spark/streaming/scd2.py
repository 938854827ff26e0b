"""Streaming SCD Type-2 dimension maintenance — the batch
``scd2_user_state`` catalog query as a continuous CDC-style stream.

Contract: the stream emits every CLOSED version row (valid_to set) of
the per-user dimension history, each the moment its closing event
passes the watermark; the OPEN (current) version per user lives in
keyed state — that state is the dimension's current table, bounded by
the ENTITY count (users), not the stream length, which is the SCD2 data
model itself. The emitted closed-version set equals the batch query's
``is_current = false`` rows EXACTLY (parity test), because finalization
is strictly event-time ordered:

- rows are buffered per user until the watermark passes their ts, so no
  earlier event can still arrive when a row is folded into the history;
- ties at identical ts order by event_id (the batch total order), and a
  tie group can never split across watermark flushes (equal ts are all
  on the same side of any watermark cut);
- change-point collapse (consecutive equal states merge) happens on the
  finalized prefix only, against the carried open version.

Late rows beyond the watermark are dropped and counted (W2/W6) — on
Spark >= 4.1 the engine pre-filters them into
``numRowsDroppedByWatermark``; the handler's accumulator covers engines
that hand them through.

Exactly-once: deterministic handler + checkpoint-versioned state +
idempotent epoch sink (W7, kill-resume test).

Reference parity: the reference mutates one in-memory "current state"
per tracked object (`/root/reference/services/harvest_service.py:198-232`);
SCD2 maintenance is that mutation with every supersession preserved as
an immutable versioned interval.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCD2_STATE_SCHEMA = StructType(
    [
        # open (current) version — empty arrays when no version yet
        StructField("open_state", ArrayType(StringType()), True),
        StructField("open_from_us", ArrayType(LongType()), True),
        StructField("open_version", ArrayType(LongType()), True),
        # buffered not-yet-final events
        StructField("b_ts_us", ArrayType(LongType()), True),
        StructField("b_event_id", ArrayType(LongType()), True),
        StructField("b_type", ArrayType(StringType()), True),
    ]
)

SCD2_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("version", LongType(), True),
        StructField("state", StringType(), True),
        StructField("valid_from_us", LongType(), True),
        StructField("valid_to_us", LongType(), True),
    ]
)


def make_scd2_handler(late_counter=None):
    def handler(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]

        if state.exists:
            (os_, of_, ov_, bts, bid, bty) = state.get
            open_row = (
                (os_[0], of_[0], ov_[0]) if len(os_) else None
            )
            buf = pd.DataFrame(
                {"ts_us": bts, "event_id": bid, "etype": bty}
            )
        else:
            open_row, buf = None, pd.DataFrame(
                {"ts_us": [], "event_id": [], "etype": []}
            )

        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000

        if not state.hasTimedOut:
            new = pd.concat(list(pdfs), ignore_index=True)
            if len(new):
                ts_us = (
                    new["ts"].astype("datetime64[us]").astype("int64")
                )
                late = ts_us < wm_us if wm_ms > 0 else ts_us < 0
                if late.any() and late_counter is not None:
                    late_counter.add(int(late.sum()))
                add = pd.DataFrame(
                    {
                        "ts_us": ts_us[~late],
                        "event_id": new["event_id"][~late].astype("int64"),
                        "etype": new["event_type"][~late],
                    }
                )
                buf = pd.concat([buf, add], ignore_index=True)

        # finalize strictly-before-watermark rows in batch total order
        if wm_ms > 0 and len(buf):
            final = buf[buf["ts_us"] < wm_us].sort_values(
                ["ts_us", "event_id"]
            )
            buf = buf[buf["ts_us"] >= wm_us]
        else:
            final = buf.iloc[0:0]

        closed = []
        for ts_us, etype in zip(final["ts_us"], final["etype"]):
            if open_row is None:
                open_row = (etype, int(ts_us), 1)
            elif etype != open_row[0]:
                closed.append(
                    (user_id, open_row[2], open_row[0], open_row[1],
                     int(ts_us))
                )
                open_row = (etype, int(ts_us), open_row[2] + 1)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "version", "state", "valid_from_us",
                    "valid_to_us",
                ],
            )

        if open_row is None and len(buf) == 0:
            state.remove()
            return
        state.update(
            (
                [open_row[0]] if open_row else [],
                [open_row[1]] if open_row else [],
                [open_row[2]] if open_row else [],
                buf["ts_us"].astype("int64").tolist(),
                buf["event_id"].astype("int64").tolist(),
                buf["etype"].tolist(),
            )
        )
        if len(buf):
            # re-arm so the next watermark advance flushes finalizable
            # rows even if this user receives no further input
            state.setTimeoutTimestamp(
                max(int(buf["ts_us"].min()) // 1000, wm_ms) + 1
            )

    return handler


def scd2_stream(
    event_stream: DataFrame, watermark_delay: str, late_counter=None
) -> DataFrame:
    """Wire the SCD2 handler onto a watermarked event stream."""
    return (
        event_stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_scd2_handler(late_counter),
            outputStructType=SCD2_OUTPUT_SCHEMA,
            stateStructType=SCD2_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
