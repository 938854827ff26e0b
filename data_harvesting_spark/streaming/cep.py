"""Generic streaming CEP — any ``SeqPattern`` (operators/cep.py) as a
continuous stateful stream over any keyed row shape.

The streaming argument is the same one SCD2 maintenance uses
(`streaming/scd2.py`): rows buffer per key until the event-time
watermark passes their timestamp, then finalize strictly in the key's
total order (order equals event-time order in every shape here, and an
equal-ts tie group can never split across watermark cuts — equal
timestamps land on the same side of any strict cut). A contiguous
pattern over the finalized sequence is therefore decidable exactly:
once row r is final, no row can ever appear before it, so every match
whose LAST step lands on a newly-final row is emitted at that flush —
and never again, because later flushes only test matches ending in
their own new rows. The carry is the last ``n-1`` finalized rows per
key: the only prefix a future row can extend (the information floor,
same argument as the failure->retry carry in streaming/patterns.py).

State bound: O(in-flight rows within the watermark) + O(n-1) carry per
key. After a key goes quiet the carry is kept for ``retention`` of
event time, then dropped — a row arriving later than the retention
starts a fresh sequence (the documented divergence floor shared with
the dedup/cap ledgers); within retention the stream is EXACTLY
batch-equal (parity tests).

Late data (W2/W6): engine pre-filter (``numRowsDroppedByWatermark``) on
Spark >= 4.1, handler accumulator otherwise. Exactly-once (W7):
deterministic handler + checkpoint-versioned state + idempotent epoch
sink (kill-resume tests).

Row shapes are declared, not hard-coded: a ``CepRows`` spec lists the
payload columns and their types, and the state schema / pandas
conversions derive from it — the transcript shape and the event-log
shape below are two instances of ONE handler factory.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DataType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_harvesting_spark.operators.cep import SeqPattern, seq_match_pdf

_SPARK_T = {
    "int": IntegerType(),
    "long": LongType(),
    "double": DoubleType(),
    "string": StringType(),
}
_PD_T = {"int": "int32", "long": "int64", "double": "float64"}


@dataclass(frozen=True)
class CepRows:
    """Keyed row shape for the streaming matcher.

    ``key`` — the groupBy column; ``order`` — columns whose ascending
    order is the key's total order (must be consistent with event
    time); ``cols`` — (name, kind) payload columns, kind in
    int/long/double/string; ``ts`` — the event-time column (stored in
    state as exact integer micros).
    """

    key: str
    order: tuple[str, ...]
    cols: tuple[tuple[str, str], ...]
    ts: str = "ts"

    def state_schema(self) -> StructType:
        fields = []
        for side in ("b", "c"):
            for name, kind in self.cols:
                fields.append(
                    StructField(
                        f"{side}_{name}", ArrayType(_SPARK_T[kind]), True
                    )
                )
            fields.append(
                StructField(f"{side}_ts_us", ArrayType(LongType()), True)
            )
        return StructType(fields)

    def _to_frame(self, arrays: tuple) -> pd.DataFrame:
        data = {}
        for (name, kind), arr in zip(self.cols, arrays):
            if kind == "string":
                data[name] = pd.array(list(arr), dtype="object")
            else:
                data[name] = pd.array(arr, dtype=_PD_T[kind])
        data[self.ts] = pd.to_datetime(
            pd.array(arrays[len(self.cols)], dtype="int64"), unit="us"
        )
        return pd.DataFrame(data)

    def _to_arrays(self, frame: pd.DataFrame) -> tuple:
        out = []
        for name, kind in self.cols:
            if kind == "string":
                out.append(
                    [None if pd.isna(x) else x for x in frame[name]]
                )
            else:
                out.append(frame[name].astype(_PD_T[kind]).tolist())
        out.append(
            frame[self.ts].astype("datetime64[us]").astype("int64").tolist()
        )
        return tuple(out)


TRANSCRIPT_ROWS = CepRows(
    key="conv_id",
    order=("turn_idx",),
    cols=(
        ("turn_idx", "int"),
        ("role", "string"),
        ("text", "string"),
        ("tool", "string"),
    ),
)

EVENT_ROWS = CepRows(
    key="user_id",
    order=("ts", "event_id"),
    cols=(
        ("event_id", "long"),
        ("event_type", "string"),
        ("value", "double"),
    ),
)


def _pd_dtype(t: DataType) -> str:
    if isinstance(t, IntegerType):
        return "int32"
    if isinstance(t, LongType):
        return "int64"
    if isinstance(t, DoubleType):
        return "float64"
    return "object"


def make_seq_handler(
    rows: CepRows,
    pattern: SeqPattern,
    output_schema: StructType,
    retention_ms: int,
    late_counter=None,
):
    """Build the applyInPandasWithState handler (module docstring).

    ``output_schema`` must start with the key column followed by the
    pattern's emit aliases (+ ``span_us`` for time-bounded patterns).
    """
    n = len(pattern.steps)
    n_cols = len(rows.cols)
    sort_cols = list(rows.order)
    out_names = [f.name for f in output_schema.fields[1:]]
    out_dtypes = {
        f.name: _pd_dtype(f.dataType) for f in output_schema.fields
    }
    key_name = output_schema.fields[0].name

    def handler(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        key_val = key[0]
        if state.exists:
            tup = state.get
            buf = rows._to_frame(tup[: n_cols + 1])
            carry = rows._to_frame(tup[n_cols + 1 :])
        else:
            buf = rows._to_frame(tuple([[]] * (n_cols + 1)))
            carry = rows._to_frame(tuple([[]] * (n_cols + 1)))

        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000

        if not state.hasTimedOut:
            new = pd.concat(list(pdfs), ignore_index=True)
            if len(new):
                ts_us = (
                    new[rows.ts]
                    .astype("datetime64[us]")
                    .astype("int64")
                )
                late = ts_us < wm_us if wm_ms > 0 else ts_us < 0
                if late.any():
                    if late_counter is not None:
                        late_counter.add(int(late.sum()))
                    new = new[~late]
                if len(new):
                    buf = pd.concat(
                        [buf, new[buf.columns]], ignore_index=True
                    )

        # finalize strictly-before-watermark rows in the key's order
        if wm_ms > 0 and len(buf):
            b_us = buf[rows.ts].astype("datetime64[us]").astype("int64")
            fin = buf[b_us < wm_us].sort_values(sort_cols, kind="mergesort")
            buf = buf[b_us >= wm_us]
        else:
            fin = buf.iloc[0:0]

        if len(fin):
            seq = pd.concat([carry, fin], ignore_index=True)
            matches = seq_match_pdf(seq, pattern)
            # only matches whose LAST step row is newly final — earlier
            # ones were emitted at the flush that finalized their last row
            fresh = matches[matches["_start"] >= len(carry) - (n - 1)]
            if len(fresh):
                out = {key_name: [key_val] * len(fresh)}
                for c in out_names:
                    out[c] = fresh[c].to_numpy()
                opdf = pd.DataFrame(out)
                for c, dt in out_dtypes.items():
                    if dt != "object":
                        opdf[c] = opdf[c].astype(dt)
                yield opdf
            carry = seq.iloc[len(seq) - min(n - 1, len(seq)) :]

        if len(buf) == 0 and len(carry) == 0:
            state.remove()
            return
        state.update(rows._to_arrays(buf) + rows._to_arrays(carry))
        if len(buf):
            min_ms = (
                int(
                    buf[rows.ts]
                    .astype("datetime64[us]")
                    .astype("int64")
                    .min()
                )
                // 1000
            )
            state.setTimeoutTimestamp(max(min_ms, wm_ms) + 1)
        else:
            last_ms = (
                int(
                    carry[rows.ts]
                    .astype("datetime64[us]")
                    .astype("int64")
                    .max()
                )
                // 1000
            )
            state.setTimeoutTimestamp(max(last_ms + retention_ms, wm_ms + 1))

    return handler


def seq_pattern_stream(
    stream: DataFrame,
    rows: CepRows,
    pattern: SeqPattern,
    output_schema: StructType,
    watermark_delay: str,
    retention_ms: int,
    late_counter=None,
) -> DataFrame:
    """Wire the generic matcher onto a watermarked keyed stream."""
    return (
        stream.withWatermark(rows.ts, watermark_delay)
        .groupBy(rows.key)
        .applyInPandasWithState(
            make_seq_handler(
                rows, pattern, output_schema, retention_ms, late_counter
            ),
            outputStructType=output_schema,
            stateStructType=rows.state_schema(),
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


DIALOG_OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), True),
        StructField("s0_idx", IntegerType(), True),
        StructField("s1_idx", IntegerType(), True),
        StructField("s2_idx", IntegerType(), True),
        StructField("tool", StringType(), True),
    ]
)

BURST_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("s0_event_id", LongType(), True),
        StructField("s1_event_id", LongType(), True),
        StructField("s2_event_id", LongType(), True),
        StructField("span_us", LongType(), True),
    ]
)
