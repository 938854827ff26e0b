"""Harvest-rate aggregates (W4): tumbling + sliding windows per tool/role.

The reference's only rate notion is the fixed frame-sampling stride
(`/root/reference/services/harvest_service.py:156-157`); the graft's
north_star adds real event-time windowed rates. Plain Catalyst hash
aggregation — partial (map-side) aggregation comes free, the shuffle key is
(window, grain key), and AQE coalesces small partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def harvest_rates(
    transcripts: DataFrame,
    grain: str = "tool",
    window: str = "1 hour",
    slide: str | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-window turn counts + distinct-conversation counts by tool/role.

    ``exact_distinct=True`` uses exact COUNT(DISTINCT) (oracle-comparable);
    the scale path defaults to ``approx_count_distinct`` — a single-pass
    HLL sketch that avoids the distinct-expand shuffle at 100 TB.
    """
    key = F.col(grain)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    distinct = (
        F.countDistinct("conv_id")
        if exact_distinct
        else F.approx_count_distinct("conv_id")
    )
    return (
        transcripts.where(key.isNotNull())
        .groupBy(win.alias("w"), key.alias("key"))
        .agg(
            F.count("*").alias("turn_count"),
            distinct.alias("conv_distinct"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.lit(grain).alias("grain"),
            "key",
            "turn_count",
            "conv_distinct",
        )
    )
