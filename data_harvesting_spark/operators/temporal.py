"""Temporal joins — generic **as-of** and **range (interval)** joins
between two event tables.

Generalizes the transcript-internal J3 call↔response correlation
(`operators/curate.py::correlate_pairs`, re-expressing the reference's
per-frame match loop `/root/reference/services/harvest_service.py:160-232`)
to arbitrary left/right tables keyed on any equality columns — the
time-series surface Spark lacks as a built-in (pandas has ``merge_asof``
single-node; Flink has interval joins).

Scale design (100 TB posture):

- ``asof_join`` is the **merge formulation**: tag + union the two inputs,
  then a single running ``max(struct(ts, tiebreak, payload))`` window per
  key carries the latest right row up to each left row. ONE exchange on
  the key (both inputs co-partitioned by the same shuffle), no range
  self-join, no per-row probe, no BroadcastNestedLoopJoin — the plan is
  Exchange → Sort → Window → Filter regardless of either side's size.
  Ties on the right timestamp resolve deterministically by the caller's
  ``right_order`` tiebreak column (struct comparison is lexicographic, so
  the max picks the greatest tiebreak among equal timestamps).
- ``range_join`` is the **bucketed interval join**: left rows explode to
  the (at most two) fixed-width time buckets their window can overlap,
  the join is a plain equi-join on (key, bucket) — SortMergeJoin /
  ShuffledHashJoin, never a BNLJ — and the exact interval predicate
  filters the candidates. Candidate volume is bounded by bucket
  co-residency (window width), not |L|×|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    right_order: str | None = None,
    prefix: str = "asof_",
    strict: bool = False,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: attach to every left row the right row with
    the greatest ``right_ts`` at-or-before (``strict=False``) or strictly
    before (``strict=True``) the left row's ``left_ts``, within the same
    ``on`` key — NULLs when no such row (left-outer semantics).

    ``right_cols`` — right payload columns to carry (default: everything
    except ``on`` + ``right_ts``), each emitted as ``{prefix}{col}``;
    the matched timestamp is emitted as ``{prefix}{right_ts}``.
    ``right_order`` — deterministic tie-break among right rows sharing a
    timestamp (greatest wins); default: first of ``right_cols``.
    ``tolerance_us`` — matches older than ``left_ts - tolerance`` are
    nulled out (pandas ``merge_asof(tolerance=...)``).
    """
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in set(on) | {right_ts}
        ]
    # payload-free right (key + ts only): tie-break on the timestamp
    # itself — rows tied on ts are then indistinguishable, and no payload
    # column means no observable difference
    tiebreak = right_order or (right_cols[0] if right_cols else right_ts)
    carry = [c for c in right_cols if c != tiebreak]

    # right rows sort BEFORE left rows at an equal timestamp for the
    # inclusive join (the running-max frame up to the left row then
    # contains them), AFTER for the strict join (excluded)
    r_side, l_side = (0, 1) if not strict else (1, 0)

    # .cast("timestamp") first: the parquet tables carry TIMESTAMP_NTZ,
    # which unix_micros rejects; with the session timezone pinned UTC the
    # cast is value-preserving
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r2 = right.select(
        *on,
        r_us.alias("_ord"),
        F.lit(r_side).alias("_side"),
        F.struct(
            r_us.alias("_m_ts"),
            F.col(tiebreak).alias("_m_tb"),
            *[F.col(c).alias(f"_m_{c}") for c in carry],
        ).alias("_match"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns],
    )
    l2 = left.select(
        *on,
        l_us.alias("_ord"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(r2.schema["_match"].dataType).alias("_match"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )

    w = (
        Window.partitionBy(*on)
        .orderBy("_ord", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r2.unionByName(l2)
        .withColumn("_hit", F.max("_match").over(w))
        .where(F.col("_side") == l_side)
    )
    if tolerance_us is not None:
        out = out.withColumn(
            "_hit",
            F.when(
                F.col("_hit._m_ts") >= F.col("_ord") - F.lit(tolerance_us),
                F.col("_hit"),
            ),
        )
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        F.timestamp_micros(F.col("_hit._m_ts"))
        .cast(right.schema[right_ts].dataType)
        .alias(f"{prefix}{right_ts}"),
        *[
            F.col("_hit._m_tb").alias(f"{prefix}{c}") if c == tiebreak
            else F.col(f"_hit._m_{c}").alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_us: int = 0,
    upper_us: int = 1_800_000_000,
    left_alias: str = "l",
    right_alias: str = "r",
) -> DataFrame:
    """Interval join: all (left, right) pairs sharing the ``on`` key with
    ``right_ts`` in ``(left_ts + lower_us, left_ts + upper_us]`` —
    strictly-after lower bound, inclusive upper (Flink intervalJoin
    semantics with an open lower edge).

    Output: every non-key left column as ``{left_alias}_{col}``, every
    non-key right column as ``{right_alias}_{col}``, the ``on`` keys once
    unprefixed. Inner-join semantics — compose with a left join back onto
    ``left`` for zero-match rows (see
    ``plans/q_relational.py::events_range_follow``).
    """
    width = upper_us - lower_us
    if width <= 0:
        raise ValueError("upper_us must exceed lower_us")
    # .cast("timestamp"): the parquet tables carry TIMESTAMP_NTZ, which
    # unix_micros rejects; session timezone pinned UTC keeps it exact
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    # a right row in (l+lower, l+upper] lies in the bucket of l+lower or
    # the one after (window width == bucket width) — 2 candidates exactly
    l2 = left.select(
        *on,
        *[F.col(c).alias(f"{left_alias}_{c}") for c in left.columns
          if c not in on],
        F.floor((l_us + F.lit(lower_us)) / F.lit(width)).alias("_b0"),
        l_us.alias("_l_us"),
    ).select(
        "*", F.explode(F.array("_b0", F.col("_b0") + 1)).alias("_bucket")
    ).drop("_b0")
    r2 = right.select(
        *on,
        *[F.col(c).alias(f"{right_alias}_{c}") for c in right.columns
          if c not in on],
        F.floor(r_us / F.lit(width)).alias("_bucket"),
        r_us.alias("_r_us"),
    )
    return (
        l2.join(r2, [*on, "_bucket"])
        .where(
            (F.col("_r_us") > F.col("_l_us") + F.lit(lower_us))
            & (F.col("_r_us") <= F.col("_l_us") + F.lit(upper_us))
        )
        .drop("_bucket", "_l_us", "_r_us")
    )


def time_bucket_gapfill(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    bucket_seconds: int = 900,
    aggs: list | None = None,
    locf: list[str] | None = None,
) -> DataFrame:
    """Hypertable-style time-bucket rollup with **gap filling** — the
    TimescaleDB ``time_bucket_gapfill`` + ``locf`` shape: aggregate per
    (keys, fixed-width time bucket), then emit EVERY bucket of the
    table's span for every key, with missing buckets present as rows
    (aggregates NULL, or carried forward for the ``locf`` columns).

    ``aggs`` — aliased aggregate Columns (default ``count(*) as n``);
    ``locf`` — output columns to last-observation-carry-forward across
    gap rows (leading gaps before a key's first observation stay NULL).
    Emits ``bucket_start_s`` (bigint epoch seconds) rather than a
    timestamp: engine-portable and hash-stable across timezone models.

    Scale posture: the span is a 1-row global aggregate broadcast into
    the per-key grid (the deliberate 1-row-frame shape — NOT a window
    over the data side); the grid is built in-row by ``sequence`` +
    ``explode``, sized |keys| × span/bucket — independent of the fact
    table's row count. One exchange for the rollup, one for the grid
    join, one sort for the LOCF window.
    """
    if aggs is None:
        aggs = [F.count("*").alias("n")]
    locf = locf or []
    b_us = int(bucket_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucketed = df.withColumn("_bkt", F.floor(us / F.lit(b_us)))
    actual = bucketed.groupBy(*keys, "_bkt").agg(*aggs)
    span = bucketed.groupBy().agg(
        F.min("_bkt").alias("_lo"), F.max("_bkt").alias("_hi")
    )
    grid = (
        df.select(*keys).distinct()
        .crossJoin(F.broadcast(span))
        .select(*keys, F.explode(F.sequence("_lo", "_hi")).alias("_bkt"))
    )
    out = grid.join(actual, [*keys, "_bkt"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in locf:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.select(
        *keys,
        (F.col("_bkt") * bucket_seconds).cast("bigint").alias("bucket_start_s"),
        *[c for c in out.columns if c not in set(keys) | {"_bkt"}],
    )


def runs_encode(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    value_col: str,
    span_col: str = "ts",
) -> DataFrame:
    """Gaps-and-islands run-length encoding: collapse CONSECUTIVE rows
    with equal ``value_col`` (per key, in the key's total order) into
    one row per run — ``keys + (run_value, run_len, start_us, end_us)``.
    The batch twin of the streaming SCD2 change-point collapse
    (streaming/scd2.py folds exactly these runs incrementally; a run's
    [start, next-run-start) is an SCD2 validity interval), and the
    variable-length complement of the fixed-length ``seq_match``
    (operators/cep.py) — "3+ consecutive errors" is a run filter, not a
    fixed pattern.

    Scale posture: the classic two-window shape — change flag by
    null-safe ``lag`` inequality, run id by running SUM of the flag —
    shares ONE key-hash exchange with the final per-run aggregate
    (plan-asserted). All emitted times are exact integer micros.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    chg = (
        ~F.col(value_col).eqNullSafe(F.lag(value_col).over(w))
    ).cast("bigint")
    us = F.unix_micros(F.col(span_col).cast("timestamp"))
    flagged = df.select(
        *keys, *order_by, value_col, us.alias("_us"), chg.alias("_chg")
    )
    runs = flagged.withColumn("_rid", F.sum("_chg").over(w))
    return runs.groupBy(*keys, "_rid").agg(
        F.min(value_col).alias("run_value"),
        F.count(F.lit(1)).cast("bigint").alias("run_len"),
        F.min("_us").cast("bigint").alias("start_us"),
        F.max("_us").cast("bigint").alias("end_us"),
    ).drop("_rid")
