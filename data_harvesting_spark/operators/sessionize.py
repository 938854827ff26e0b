"""Batch sessionization (W1 analog) + curated-span projection (P11/P12).

The reference's "session" is one video file processed end-to-end
(`/root/reference/queue_harvesting.py:30-57`); in the graft a session is a
gap-bounded run of turns within a conv_id. Streaming uses
``session_window`` (streaming/pipeline.py); the batch-parity formulation
here is the classic lag+cumsum sessionizer — identical results, pure
window functions, one shuffle on conv_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(transcripts: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Assign ``session_id`` (int, 0-based per conv) and ``window_start``
    (min ts of the session) to every turn. New session when the gap from
    the previous turn STRICTLY exceeds ``gap_seconds`` — matching JVM
    ``session_window``, which merges touching windows (an event at exactly
    last + gap stays in the session; pinned by the exact-boundary parity
    test). Microsecond precision, same as the kernel path (shape 12,
    FIXTURES.md)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gapped = transcripts.withColumn(
        "_new",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
            > gap_seconds * 1_000_000,
            1,
        ).otherwise(0),
    )
    out = gapped.withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    ).drop("_new")
    w_sess = Window.partitionBy("conv_id", "session_id")
    return out.withColumn("window_start", F.min("ts").over(w_sess))


def crop_span(transcripts: DataFrame) -> DataFrame:
    """P11 crop-to-union: trim each conversation to the
    [first qualifying turn, last qualifying turn] span, where qualifying =
    tool-involved. Mirrors `/root/reference/condition.py:98-127`
    (min/max bbox + clamp) as min/max over turn_idx.
    """
    # window formulation: span min/max ride the same conv_id partitioning
    # the renumber window uses — one shuffle for crop+renumber combined,
    # no aggregate-plus-join-back (which would cost two more exchanges)
    w = Window.partitionBy("conv_id")
    qual = F.when(F.col("tool").isNotNull(), F.col("turn_idx"))
    lo = F.min(qual).over(w)
    hi = F.max(qual).over(w)
    return (
        transcripts.withColumn("_lo", lo)
        .withColumn("_hi", hi)
        .where((F.col("turn_idx") >= F.col("_lo")) & (F.col("turn_idx") <= F.col("_hi")))
        .drop("_lo", "_hi")
    )


def renumber(cropped: DataFrame) -> DataFrame:
    """P12 coordinate renormalization analog: renumber turns 0..k within the
    curated span, keeping original order (reference:
    `condition.py:130-157` shifts boxes into the crop frame)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return cropped.withColumn(
        "new_turn_idx", (F.row_number().over(w) - 1).cast("int")
    )
