"""Bucketed co-located joins (M5 scale posture, SURVEY §4).

The engine's recurring big-big join is transcripts ⟗ curated on
``conv_id`` — e.g. enriching curated examples with conversation-level
aggregates, or auditing curated output against its source turns. At
100 TB both sides are huge, so the shuffle for that join dominates the
plan unless both sides are PRE-CLUSTERED on the key. Spark's mechanism
is bucketed tables: write each side once with ``bucketBy(N, conv_id)``
and every later equi-join on ``conv_id`` reads bucket i against bucket i
with NO Exchange on either side (plan-pinned by
tests/test_operators.py::test_bucketed_join_is_shuffle_free).

Reference analog: the reference has no storage layout at all (flat
directories of files, `exports/flat/flat_export.py:30-48`); bucketing is
the lakehouse-native answer to "the next job will group by the same key
again". On Iceberg the same declaration is the partition-spec transform
``bucket(N, conv_id)``.

Bucket-count guidance at scale: pick N so one bucket of the LARGER table
is a few hundred MB (task-sized); both tables must use the same N (or
one a divisor of the other) for the co-located read to kick in, and
``spark.sql.sources.bucketing.enabled`` (default true) must stay on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 64,
    bucket_col: str = "conv_id",
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Materialize ``df`` as a bucketed (optionally bucket-sorted)
    parquet table registered in the session catalog at an explicit
    ``path`` (external table — no hidden warehouse writes).

    ``sort_cols`` additionally sorts within each bucket file, which lets
    a later sort-merge join skip its per-task sort too.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str = "conv_id",
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With both sides
    bucketed on ``on`` with compatible bucket counts, the physical plan
    has no Exchange — each task streams one bucket from each side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
    spread_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Skew-safe equi-join: split each hot key of ``big`` across
    ``n_salt`` reducers by salting the join key, and replicate ``small``
    once per salt so every fragment still finds its match. The result
    is row-identical to ``big.join(small, on, how)`` — salting changes
    WHERE rows meet, never WHICH rows meet (parity-pinned by
    tests/test_r5_additions.py::test_salted_join_parity_and_plan).

    When to reach for it (north_rule: skew handled explicitly): the
    probe side has hot keys (`key_skew_report` is the diagnosis), the
    build side exceeds the broadcast threshold (else broadcast wins
    outright — no salt needed), and AQE's skew-join split didn't kick
    in (it only splits post-shuffle partitions of sort-merge joins, not
    a skewed shuffled-hash build). Cost model: the build side ships
    n_salt× over the wire; pick n_salt ≈ (hot-key rows / healthy task
    size), not larger.

    The salt must spread ROWS of the same key, so it hashes
    ``spread_cols`` (a row-distinguishing column set, e.g. the event
    id); defaults to all non-key columns of ``big``. Deterministic —
    re-runs salt identically. Only ``big``-preserving joins make sense
    here (inner / left / left_semi / left_anti): a right/outer join
    would see the replicated ``small`` rows n_salt times.
    """
    from pyspark.sql import functions as F

    if how in ("right", "right_outer", "outer", "full", "full_outer"):
        raise ValueError(f"salted_join preserves the big side only: {how}")
    spread = list(spread_cols) or [c for c in big.columns if c != on]
    salted_big = big.withColumn(
        "_salt", F.pmod(F.hash(*spread), F.lit(n_salt))
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salt - 1))
    ).alias("_salt")
    replicated = small.select("*", salts)
    joined = salted_big.hint("shuffle_hash").join(
        replicated, [on, "_salt"], how
    )
    return joined.drop("_salt")
