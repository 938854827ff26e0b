"""Relational catalog queries over the TPC-H-ish tables + events stream —
the general OLAP surface (scan pushdown, broadcast joins, windowed aggs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_harvesting_spark.plans.catalog import register

# ---------------------------------------------------------------- TPC-H Q1
@register(
    "tpch_q1",
    """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: pushdown filter + hash agg.
    Float sums are groupwise-small here, rounded for hash stability."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------- broadcast join
@register(
    "orders_by_nation",
    """
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def q_orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact(orders) ⋈ dim(customer) ⋈ dim(nation) with explicit
    broadcast of the dims — zero shuffle on the fact side until the agg."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


# ---------------------------------------------------------------- events sliding
@register(
    "events_sliding_value",
    """
WITH offs AS (SELECT * FROM (VALUES (0), (1)) AS o(i))
SELECT CAST((floor(epoch(ts) / 1800) - offs.i) * 1800 AS BIGINT) AS window_start_s,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events CROSS JOIN offs
GROUP BY 1, 2
""",
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h / 30min) per event_type over the events stream;
    value integerized to cents so sums are order-exact."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


# ---------------------------------------------------------------- P14 bucketing
@register(
    "value_buckets",
    """
SELECT CASE WHEN value <= 10 THEN 'low'
            WHEN value <= 100 THEN 'mid'
            WHEN value <= 1000 THEN 'high'
            ELSE 'extreme' END AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
""",
)
def q_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14 — numeric range bucketing (reference HLS→color bucketing,
    `utils/ColorDetector.py:122-189`) as a nested CASE WHEN."""
    from data_harvesting_spark.operators.mapping import bucketize

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.select(
            bucketize("value", [10.0, 100.0, 1000.0],
                      ["low", "mid", "high", "extreme"]).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------- approx sketch
@register(
    "events_user_distinct",
    """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
FROM events GROUP BY event_type
""",
)
def q_events_user_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user counts per event type. Oracle compares the exact
    variant; the HLL sketch (approx_count_distinct) is asserted within 5%
    of exact in unit tests — the 100 TB path."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )


# ---------------------------------------------------------------- JSON surface
@register(
    "tool_args_rollup",
    """
SELECT event_type,
       CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
           AS value_milli_sum
FROM events
GROUP BY event_type, k_bucket
""",
)
def q_tool_args_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured tool-argument extraction + rollup: parse the JSON
    ``props`` payload JVM-side (``get_json_object``, codegen — no Python),
    bucket the extracted argument, aggregate count and integerized value
    sum per (event_type, bucket).

    The reference parses its queue message JSON the same way
    (`/root/reference/queue_harvesting.py:40-48`); this is that surface as
    a declarative scan + hash agg. The float sum is integerized
    (floor(value*1000), exact in IEEE double for this range) so the
    cross-engine value-hash cannot flake at the ulp."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(
            "event_type",
            (k % 10).alias("k_bucket"),
            F.floor(F.col("value") * 1000).cast("bigint").alias("vm"),
        )
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("vm").cast("bigint").alias("value_milli_sum"),
        )
    )


# ---------------------------------------------------------------- TPC-H Q3
@register(
    "tpch_q3",
    """
SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority: the canonical selective
    fact-fact join. Both selections sit below the joins (pushed to the
    parquet scans), the filtered customer⋈orders side is explicitly
    broadcast into the lineitem scan (zero shuffle on the big fact until
    the final small agg), and the top-10 is a deterministic
    revenue-then-key TakeOrdered — no global sort materializes. At 100 TB
    the broadcast holds exactly while the date+segment selectivity does;
    AQE demotes it to a shuffle join past the threshold with the same
    semantics."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cut = "1998-06-01"
    co = (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .join(
            o.where(F.col("o_orderdate") < cut).select(
                "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
    )
    return (
        li.where(F.col("l_shipdate") > cut)
        .join(F.broadcast(co), li.l_orderkey == co.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------- funnel
@register(
    "events_funnel",
    """
WITH stage AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view_any,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase_any
  FROM events GROUP BY user_id),
ordered AS (
  SELECT user_id, t_signup,
         CASE WHEN t_view_any > t_signup THEN t_view_any END AS t_view,
         CASE WHEN t_purchase_any > t_view_any AND t_view_any > t_signup
              THEN t_purchase_any END AS t_purchase
  FROM stage)
SELECT CAST(count(t_signup) AS BIGINT) AS n_signup,
       CAST(count(t_view) AS BIGINT) AS n_signup_view,
       CAST(count(t_purchase) AS BIGINT) AS n_signup_view_purchase,
       round(count(t_view) * 1.0 / count(t_signup), 6) AS conv_view,
       round(count(t_purchase) * 1.0 / count(t_view), 6) AS conv_purchase
FROM ordered
"""
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → later view → later purchase): conditional
    min-timestamps in ONE user_id hash aggregate, then stage ordering as
    per-row comparisons — the funnel never materializes per-event state
    or self-joins the event log (the naive three-way self-join would be
    three fact shuffles; this is one). First-touch semantics: each
    stage anchors at the user's EARLIEST qualifying event."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    from data_harvesting_spark.operators.funnel import (
        funnel_report,
        funnel_stage_mins,
    )

    return funnel_report(funnel_stage_mins(e))


# ---------------------------------------------------------------- cohort table
@register(
    "cohort_retention",
    """
WITH signup AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
cohort_size AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort
  FROM signup GROUP BY cohort_week),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
  FROM events),
cells AS (
  SELECT s.cohort_week,
         CAST(floor((epoch(a.activity_week) - epoch(s.cohort_week))
                    / 604800) AS INT) AS week_offset,
         CAST(count(*) AS BIGINT) AS n_active
  FROM activity a JOIN signup s USING (user_id)
  WHERE a.activity_week >= s.cohort_week
  GROUP BY 1, 2)
SELECT c.cohort_week, c.week_offset, c.n_active, z.n_cohort,
       round(c.n_active * 1.0 / z.n_cohort, 6) AS retention
FROM cells c JOIN cohort_size z USING (cohort_week)
""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: per-user signup week (one user_id
    agg), distinct (user, activity-week) pairs (one agg), ONE user_id
    shuffle join between them, then a (cohort, offset) rollup with the
    tiny cohort-size dim broadcast back. No window functions, no
    self-join of the raw event log."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    signup = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    cohort_size = signup.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("activity_week")
    ).distinct()
    cells = (
        activity.join(signup, "user_id")
        .where(F.col("activity_week") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week",
            F.floor(
                (
                    F.unix_timestamp("activity_week")
                    - F.unix_timestamp("cohort_week")
                )
                / 604800
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    return cells.join(F.broadcast(cohort_size), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "n_cohort",
        F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
    )


@register(
    "events_ewma",
    """
WITH r AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events)
SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
       round(sum(value * CASE WHEN rn = 1 THEN power(0.7, n - 1)
                              ELSE 0.3 * power(0.7, n - rn) END), 6)
           AS ewma
FROM r GROUP BY user_id
""",
)
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event value
    (alpha=0.3, s_1 = x_1; s_i = a*x_i + (1-a)*s_{i-1}) — the smoothed
    per-key health/engagement signal a monitoring rollup keeps. The
    recurrence's closed form is a plain weighted SUM (weight of row i is
    a*(1-a)^(n-i), the first row (1-a)^(n-1)), so the "sequential" state
    machine is ONE aggregate: no recursion, no collect, no UDF. Every
    exponent is n-i <= n so all weights are in (0,1] — well-conditioned
    at any series length, unlike the (1-a)^(-i) prefix-sum form which
    overflows past ~700 rows.

    Scale posture: one hash exchange on user_id serves both the rank
    window and the final aggregate (same partitioning); the weighted sum
    is map-side combinable within the sorted partition. Weights sum to
    1 so ewma is bounded by max(value): the 6-decimal rounding is far
    above the ~1e-13 relative float noise of cross-engine sum order."""
    from pyspark.sql import Window

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = e.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    )
    weight = F.when(
        F.col("rn") == 1, F.pow(F.lit(0.7), F.col("n") - 1)
    ).otherwise(0.3 * F.pow(F.lit(0.7), F.col("n") - F.col("rn")))
    return r.groupBy("user_id").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.round(F.sum(F.col("value") * weight), 6).alias("ewma"),
    )


# ---------------------------------------------------------------- as-of join
@register(
    "events_asof_attribution",
    """
WITH clicks AS (
  SELECT user_id, ts,
         max_by(event_id, event_id) AS event_id,
         max_by(value, event_id) AS value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), purchases AS (
  SELECT event_id, user_id, ts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, p.value,
       c.ts AS click_ts, c.event_id AS click_event_id,
       c.value AS click_value
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def q_events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic backward AS-OF join (`operators/temporal.py::asof_join`):
    each purchase is attributed to the user's latest click at-or-before
    it (NULLs when the user never clicked before buying) — the
    table-to-table generalization of J3's in-transcript correlation.

    The oracle is DuckDB's NATIVE `ASOF LEFT JOIN`, an independent
    implementation of the same semantics — not a re-transcription of the
    Spark plan. Ties among same-timestamp clicks resolve to the greatest
    event_id in both engines (the oracle's max_by pre-reduce, the
    operator's struct-max tiebreak), so the compare is deterministic even
    on fixtures with timestamp collisions.

    Scale posture: merge formulation — ONE exchange on user_id shared by
    both inputs, a running struct-max window, no range self-join and no
    BNLJ (plan-asserted in tests); right-side payload rides the struct,
    so no join back to fetch click columns."""
    from data_harvesting_spark.operators.temporal import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max(F.struct("event_id", "value")).alias("_m"))
        .select(
            "user_id", "ts",
            F.col("_m.event_id").alias("event_id"),
            F.col("_m.value").alias("value"),
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return asof_join(
        purchases, clicks, on=["user_id"],
        right_cols=["event_id", "value"], right_order="event_id",
        prefix="click_",
    )


# ---------------------------------------------------------------- range join
@register(
    "events_error_followups",
    """
SELECT e.event_id, e.user_id, e.ts,
       CAST(count(f.event_id) AS BIGINT) AS n_follow,
       round(coalesce(sum(f.value), 0), 4) AS follow_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
LEFT JOIN events f
  ON f.user_id = e.user_id
 AND f.ts > e.ts AND f.ts <= e.ts + INTERVAL 30 MINUTE
GROUP BY e.event_id, e.user_id, e.ts
""",
)
def q_events_error_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join (`operators/temporal.py::range_join`): for
    every error event, how much same-user activity follows within 30
    minutes (count + value sum; zero rows kept) — the blast-radius /
    impact query shape.

    Scale posture: bucketed interval join — left rows explode to exactly
    2 fixed-width time buckets, the join is a plain equi-join on
    (user_id, bucket) with the exact interval predicate as a post-filter
    (never a BNLJ, plan-asserted), candidates bounded by bucket
    co-residency. The zero-match join-back keys on ~|errors| rows, not
    the pair table. The 4-decimal rounding absorbs cross-engine
    float-sum-order noise (values are 2-decimal, ≤dozens per group)."""
    from data_harvesting_spark.operators.temporal import range_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    pairs = range_join(
        errors, ev.select("user_id", "ts", "event_id", "value"),
        on=["user_id"], lower_us=0, upper_us=30 * 60 * 1_000_000,
    )
    agg = pairs.groupBy(F.col("l_event_id").alias("event_id")).agg(
        F.count("*").alias("_n"),
        F.sum("r_value").alias("_v"),
    )
    return errors.join(agg, "event_id", "left").select(
        "event_id", "user_id", "ts",
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_follow"),
        F.round(F.coalesce(F.col("_v"), F.lit(0.0)), 4).alias("follow_value"),
    )


# ------------------------------------------------------------- gap-fill rollup
@register(
    "events_gapfill",
    """
WITH b AS (
  SELECT event_type, CAST(floor(epoch(ts) / 900) AS BIGINT) AS bkt,
         CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS v_sum,
         round(avg(value), 6) AS v_avg
  FROM events GROUP BY 1, 2
), span AS (SELECT min(bkt) AS lo, max(bkt) AS hi FROM b),
grid AS (
  SELECT t.event_type, gs.bkt
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(range(lo, hi + 1)) AS bkt FROM span) gs
)
SELECT g.event_type, g.bkt * 900 AS bucket_start_s,
       coalesce(b.n, 0) AS n, round(coalesce(b.v_sum, 0), 4) AS v_sum,
       last_value(b.v_avg IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.bkt
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_avg
FROM grid g LEFT JOIN b USING (event_type, bkt)
""",
)
def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup with gap filling
    (`operators/temporal.py::time_bucket_gapfill`): 15-minute activity
    buckets per event_type over the table's full span, EVERY bucket
    present — empty ones as explicit zero rows with the per-bucket mean
    carried forward (TimescaleDB `time_bucket_gapfill` + `locf`
    semantics; leading gaps before a type's first observation stay
    NULL). ~50% of the fixture's grid rows are gap-filled.

    Scale posture: the grid is |event_types| × span/bucket — built from
    a 1-row broadcast span frame + in-row sequence/explode, independent
    of the fact-table row count; the rollup itself is one hash agg. The
    4/6-decimal rounding happens BEFORE the LOCF carry, so both engines
    carry bit-identical values."""
    from data_harvesting_spark.operators.temporal import time_bucket_gapfill

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = time_bucket_gapfill(
        ev, keys=["event_type"], ts_col="ts", bucket_seconds=900,
        aggs=[
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("v_sum"),
            F.round(F.avg("value"), 6).alias("locf_avg"),
        ],
        locf=["locf_avg"],
    )
    return out.select(
        "event_type", "bucket_start_s",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        F.round(F.coalesce(F.col("v_sum"), F.lit(0.0)), 4).alias("v_sum"),
        "locf_avg",
    )


# ---------------------------------------------------------------- TPC-H Q18
@register(
    "tpch_q18",
    """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
SELECT c.c_name, o.o_orderkey,
       CAST(epoch(o.o_orderdate) AS BIGINT) AS orderdate_s,
       round(o.o_totalprice, 2) AS total_price,
       round(b.total_qty, 4) AS total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume customers: HAVING on a fact
    aggregate, joined back through orders to the customer dim, top-100.

    Scale shape: the lineitem agg is ONE hash aggregate (map-side
    combine); the HAVING filter leaves a tiny qualifying-order set that
    is explicitly broadcast into orders (no orders shuffle), customer
    joins broadcast the already-top-filtered rows' keys only after the
    orders join cuts cardinality; the top-100 is TakeOrdered
    (per-partition heap + 100-row driver merge), never a global sort.
    Per-order quantity sums are groupwise-small doubles, rounded for
    hash stability like tpch_q1."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty_raw"))
        .where(F.col("total_qty_raw") > 300)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("orderdate_s"),
            F.round("o_totalprice", 2).alias("total_price"),
            F.round("total_qty_raw", 4).alias("total_qty"),
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------- TPC-H Q4-ish
@register(
    "orders_priority_semi",
    """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
GROUP BY o_orderpriority
""",
)
def q_orders_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS: order-priority counts for orders with at
    least one high-quantity line — the canonical left-SEMI join (never a
    join-then-distinct, which would materialize the 1:N blowup before
    collapsing it).

    Scale shape: the quantity filter pushes to the lineitem scan and the
    semi-join needs no distinct on the right side (semi short-circuits
    on first match). Both sides shuffle on l_orderkey at 100 TB; when
    the filtered side fits, AQE demotes to broadcast — semantics
    identical either way."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    hits = li.where(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        o.join(hits, o.o_orderkey == hits.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------- SCD Type 2
@register(
    "scd2_user_state",
    """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
       event_type AS state,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       CAST(LEAD(epoch_us(ts)) OVER w AS BIGINT) AS valid_to_us,
       (LEAD(ts) OVER w IS NULL) AS is_current
FROM changes
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build from a change-event log:
    collapse each user's event stream to its state CHANGE points
    (event_type as the tracked attribute) and emit versioned validity
    intervals [valid_from, valid_to) with an is_current flag — the
    standard warehouse dimension-history shape (Kimball SCD2), derived
    here entirely from the append-only log the way a CDC compaction job
    would.

    Scale shape: both windows (change detection, interval sealing) ride
    ONE user_id exchange — no self-join against the log, no
    merge-into. Ties inside a user are totally ordered by (ts,
    event_id), so versions are deterministic under replay. Point-in-time
    lookups against the result are the as-of join (`events_asof_attribution`).

    Reference parity: the reference keeps only current state in memory
    (`/root/reference/services/harvest_service.py:198-232`); SCD2 is
    that state WITH its history, reconstructible at any timestamp."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(by_user))
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    # events.ts is TIMESTAMP_NTZ; the session tz is UTC, so the cast is
    # the identity DuckDB's epoch_us applies to the same naive value.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return changes.select(
        "user_id",
        F.row_number().over(by_user).cast("bigint").alias("version"),
        F.col("event_type").alias("state"),
        ts_us.alias("valid_from_us"),
        F.lead(ts_us).over(by_user).alias("valid_to_us"),
        F.lead("ts").over(by_user).isNull().alias("is_current"),
    )


# ------------------------------------------------------- sliding HLL users
def _hll_sliding_sql() -> str:
    from data_harvesting_spark.operators.sketch import hll_numerator

    num = hll_numerator(5)
    return f"""
WITH offs AS (SELECT * FROM (VALUES (0), (1), (2), (3), (4), (5), (6)) AS o(i)),
ev AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(user_id AS VARCHAR) AS term
  FROM events),
hashed AS (
  SELECT day, CAST(concat('0x', substr(md5(term), 1, 15)) AS BIGINT) AS h
  FROM ev),
rho AS (
  SELECT day, h & 31 AS bucket,
         CASE WHEN (h >> 5) = 0 THEN 56
              ELSE 56 - length(bin(h >> 5)) END AS rho
  FROM hashed),
winreg AS (
  SELECT day - offs.i AS window_start_day, bucket, max(rho) AS m_j
  FROM rho CROSS JOIN offs GROUP BY 1, 2),
sums AS (
  SELECT window_start_day, CAST(count(*) AS BIGINT) AS registers_used,
         CAST(sum((1::BIGINT) << (56 - m_j)) AS BIGINT) AS s_present
  FROM winreg GROUP BY 1),
s AS (
  SELECT window_start_day, registers_used,
         s_present + (32 - registers_used) * (1::BIGINT << 56) AS s_scaled
  FROM sums),
exact AS (
  SELECT ev.day - offs.i AS window_start_day,
         CAST(count(DISTINCT term) AS BIGINT) AS exact_users
  FROM ev CROSS JOIN offs GROUP BY 1)
SELECT s.window_start_day, registers_used, s_scaled,
       round({num!r} / s_scaled, 2) AS hll_users,
       exact_users,
       round(abs({num!r} / s_scaled - exact_users) / exact_users, 4)
         AS rel_err
FROM s JOIN exact USING (window_start_day)
"""


@register("hll_sliding_users", _hll_sliding_sql())
def q_hll_sliding_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day sliding distinct-user counts from MERGED per-day HLL
    sketches — the sketch-mergeability law exercised as a windowing
    primitive, machine-checked: Spark builds 32-register sketches per
    DAY and rolls each window up by bucket-wise MAX of seven day
    sketches; the oracle computes every window's registers directly from
    raw rows. Bit-equality of the two proves max-merge associativity end
    to end (plus identical estimates, since the harmonic sums are exact
    integers on both sides).

    100 TB posture: raw rows are touched ONCE (per-day register build,
    map-side combine caps each task at m=32 rows per day); the sliding
    explosion ×7 happens on the O(days × 32) register table, not on
    events. The exact countDistinct per window rides alongside as the
    verification column — at scale it is the column you drop, and
    nothing else touches raw rows per-window."""
    from data_harvesting_spark.operators.sketch import (
        hll_estimate_grouped,
        hll_registers_grouped,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    items = e.select(
        F.floor(
            F.unix_timestamp(F.col("ts").cast("timestamp")) / 86400
        )
        .cast("bigint")
        .alias("day"),
        F.col("user_id").cast("string").alias("term"),
    )
    day_regs = hll_registers_grouped(items, ["day"], bits=5)
    win_regs = (
        day_regs.select(
            "day", "bucket", "m_j",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        )
        .select(
            (F.col("day") - F.col("i")).alias("window_start_day"),
            "bucket",
            "m_j",
        )
        .groupBy("window_start_day", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    est = hll_estimate_grouped(win_regs, ["window_start_day"], bits=5)
    exact = (
        items.select(
            "day", "term",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        )
        .select((F.col("day") - F.col("i")).alias("window_start_day"), "term")
        .groupBy("window_start_day")
        .agg(F.countDistinct("term").cast("bigint").alias("exact_users"))
    )
    from data_harvesting_spark.operators.sketch import hll_numerator

    # rel_err from the UNROUNDED ratio (num / s_scaled), matching the
    # oracle — rounding first would shift the 4th decimal on edge rows.
    raw = F.lit(hll_numerator(5)) / F.col("s_scaled")
    return est.join(exact, "window_start_day").select(
        "window_start_day",
        "registers_used",
        "s_scaled",
        F.col("hll_estimate").alias("hll_users"),
        "exact_users",
        F.round(
            F.abs(raw - F.col("exact_users")) / F.col("exact_users"), 4
        ).alias("rel_err"),
    )


# --------------------------------------------------- quantile sketch (log2)
@register(
    "value_quantile_sketch",
    """
WITH vm AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(value * 1000) AS BIGINT) AS v
  FROM events),
hist AS (
  SELECT event_type, day,
         CASE WHEN v <= 0 THEN 0 ELSE length(bin(v)) END AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM vm GROUP BY 1, 2, 3),
merged AS (
  SELECT event_type, bucket, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM hist GROUP BY 1, 2),
cum AS (
  SELECT event_type, bucket, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM merged),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
hit AS (
  SELECT event_type, q, n, bucket, cnt, cum,
         CAST(ceil(q * n - 1e-9) AS BIGINT) AS r
  FROM cum CROSS JOIN qs
  WHERE cum >= CAST(ceil(q * n - 1e-9) AS BIGINT)
    AND cum - cnt < CAST(ceil(q * n - 1e-9) AS BIGINT)),
est AS (
  SELECT event_type, q, CAST(n AS BIGINT) AS n,
         round(
           (CASE WHEN bucket = 0 THEN 0
                 ELSE (1::BIGINT << (bucket - 1)) END)
           + ((CASE WHEN bucket = 0 THEN 0
                    ELSE ((1::BIGINT << bucket) - 1)
                         - (1::BIGINT << (bucket - 1)) END)
              * (r - (cum - cnt))) * 1.0 / cnt,
           4) AS est
  FROM hit),
exact AS (
  SELECT event_type,
         CAST(floor(quantile_cont(v, 0.5)) AS BIGINT) AS e50,
         CAST(floor(quantile_cont(v, 0.9)) AS BIGINT) AS e90,
         CAST(floor(quantile_cont(v, 0.99)) AS BIGINT) AS e99
  FROM vm GROUP BY 1)
SELECT e.event_type, e.q, e.n, e.est,
       CASE WHEN e.q = 0.5 THEN x.e50
            WHEN e.q = 0.9 THEN x.e90
            ELSE x.e99 END AS exact_milli
FROM est e JOIN exact x ON e.event_type = x.event_type
""",
)
def q_value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of the (milli-integerized) value column per event
    type, estimated from MERGED per-day log2-bucket histograms — the
    fourth mergeable sketch (quantiles) beside CMS, HLL and bottom-k,
    with its merge law machine-checked the same way as
    `hll_sliding_users`: Spark builds per-(type, day) histograms and
    sums them into per-type sketches; the oracle histograms raw rows
    directly. Estimates are exact-integer bucket spans with one double
    division, so they match bit-for-bit; the exact interpolated
    percentile rides alongside (floored — the ulp-absorbing
    `latency_quantiles` precedent) as the verification column.

    100 TB posture: raw rows are touched once (map-side combine caps
    each task at keys × ~64 bucket rows); merge, cumsum and the quantile
    fan-out (in-row explode, no dim join) all run on O(keys × buckets)
    rows. The exact percentile is the column you drop at scale."""
    from data_harvesting_spark.operators.sketch import (
        histogram_quantiles,
        log2_histogram_grouped,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    vm = e.select(
        "event_type",
        F.floor(
            F.unix_timestamp(F.col("ts").cast("timestamp")) / 86400
        )
        .cast("bigint")
        .alias("day"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("v"),
    )
    day_hist = log2_histogram_grouped(vm, ["event_type", "day"])
    merged = day_hist.groupBy("event_type", "bucket").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    est = histogram_quantiles(merged, ["event_type"], [0.5, 0.9, 0.99])
    exact = vm.groupBy("event_type").agg(
        F.floor(F.percentile("v", F.lit(0.5))).cast("bigint").alias("e50"),
        F.floor(F.percentile("v", F.lit(0.9))).cast("bigint").alias("e90"),
        F.floor(F.percentile("v", F.lit(0.99))).cast("bigint").alias("e99"),
    )
    return est.join(F.broadcast(exact), "event_type").select(
        "event_type",
        "q",
        "n",
        "est",
        F.when(F.col("q") == 0.5, F.col("e50"))
        .when(F.col("q") == 0.9, F.col("e90"))
        .otherwise(F.col("e99"))
        .alias("exact_milli"),
    )


# --------------------------------------------------- robust anomaly days
@register(
    "events_anomaly_days",
    """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM events GROUP BY 1, 2),
med AS (
  SELECT event_type, quantile_cont(total_cents, 0.5) AS med
  FROM daily GROUP BY 1),
dev AS (
  SELECT d.event_type, d.day, d.total_cents, m.med,
         abs(d.total_cents - m.med) AS adev
  FROM daily d JOIN med m USING (event_type)),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1)
SELECT d.event_type, d.day, d.total_cents,
       CAST(floor(d.med) AS BIGINT) AS med_cents,
       round(
         CASE WHEN m.mad = 0 THEN NULL
              ELSE 0.6745 * (d.total_cents - d.med) / m.mad END, 4)
         AS robust_z,
       coalesce(
         abs(CASE WHEN m.mad = 0 THEN NULL
                  ELSE 0.6745 * (d.total_cents - d.med) / m.mad END) > 3.5,
         FALSE) AS is_anomaly
FROM dev d JOIN mad m USING (event_type)
""",
)
def q_events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, day) anomaly detection by MODIFIED Z-SCORE
    (Iglewicz & Hoaglin 1993): 0.6745 * (x - median) / MAD, flag at
    |z| > 3.5 — the robust outlier rule that, unlike mean/stddev
    z-scores, is not itself dragged by the outliers it hunts.

    Determinism: daily totals are exact integer cents; the interpolated
    median of integers and the MAD of the resulting dyadic deviations
    are exact dyadic rationals (no rounding error exists to diverge on),
    so both engines compute identical doubles and the flag's 3.5
    boundary is stable. MAD = 0 degrades to NULL z / FALSE flag.

    Scale shape: one (type, day) hash agg over raw events; everything
    after runs on O(types × days) rows — medians are per-type exact
    percentiles over that small set (at 100 TB the days-per-type stays
    bounded, which is exactly why the rollup precedes the median), and
    both stats broadcast back."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = (
        e.select(
            "event_type",
            F.floor(
                F.unix_timestamp(F.col("ts").cast("timestamp")) / 86400
            )
            .cast("bigint")
            .alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("bigint").alias("total_cents"))
    )
    med = daily.groupBy("event_type").agg(
        F.percentile("total_cents", F.lit(0.5)).alias("med")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("total_cents") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    z = F.when(
        F.col("mad") == 0, F.lit(None).cast("double")
    ).otherwise(
        F.lit(0.6745) * (F.col("total_cents") - F.col("med")) / F.col("mad")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "day",
        "total_cents",
        F.floor("med").cast("bigint").alias("med_cents"),
        F.round(z, 4).alias("robust_z"),
        F.coalesce(F.abs(z) > 3.5, F.lit(False)).alias("is_anomaly"),
    )


# --------------------------------------------------- Z-order layout key
def _zorder_sql() -> str:
    from data_harvesting_spark.operators.layout import zorder_key_sql

    return f"""
WITH dims AS (
  SELECT event_id,
         user_id & 65535 AS ux,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) & 65535 AS tx
  FROM events)
SELECT event_id, ux, tx,
       CAST({zorder_key_sql('ux', 'tx')} AS BIGINT) AS zkey
FROM dims
"""


@register("events_zorder_key", _zorder_sql())
def q_events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (user bucket, hour bucket) —
    the multi-dimension data-skipping layout (Delta/Iceberg
    `OPTIMIZE ZORDER BY`, UB-tree): sorting on zkey co-locates rows
    close in EITHER dimension, so file/row-group min-max stats prune for
    time-range AND per-user queries from one layout. Pure integer
    shift/and/or expression (operators/layout.py::zorder_key) — no UDF,
    no shuffle, rides the scan; the oracle evaluates the bit-identical
    SQL spelling. The pruning win itself is pinned by
    `test_zorder_prunes_both_dimensions` (blocks-hit meter: Z-order
    beats a single-column sort on the opposite dimension)."""
    from data_harvesting_spark.operators.layout import zorder_key

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    dims = e.select(
        "event_id",
        F.col("user_id").bitwiseAND(F.lit(65535)).alias("ux"),
        F.floor(
            F.unix_timestamp(F.col("ts").cast("timestamp")) / 3600
        )
        .cast("bigint")
        .bitwiseAND(F.lit(65535))
        .alias("tx"),
    )
    return dims.select(
        "event_id", "ux", "tx",
        zorder_key(F.col("ux"), F.col("tx")).cast("bigint").alias("zkey"),
    )


# ---------------------------------------------------------------- TPC-H Q5
@register(
    "tpch_q5",
    """
SELECT n.n_name AS nation,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local-supplier volume: the canonical 6-table join
    with the non-tree edge (customer and supplier must share a nation).

    Scale shape: region→nation prunes to a broadcast dim chain; supplier
    and customer broadcast as dims; the only big-big edge is
    orders⋈lineitem, which AQE plans as ONE orderkey exchange pair at
    scale (here the filtered orders side broadcasts too). The non-tree
    c_nationkey = s_nationkey predicate rides the lineitem join as a
    post-filter on two already-joined dim columns — no extra shuffle.
    Revenue is integerized to cents per row before the sum, so the
    group sums are exact int64 and the cross-engine hash cannot flake
    at the ulp (groups here are thousands of rows — too big for the
    round-after-float-sum trick tpch_q1 uses on groupwise-small data)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    asia_nations = (
        n.join(
            F.broadcast(r.where(F.col("r_name") == "ASIA")),
            n.n_regionkey == r.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(asia_nations), s.s_nationkey == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev_cents).alias("revenue_cents"))
    )


# ---------------------------------------------------------------- TPC-H Q17
@register(
    "tpch_q17",
    """
WITH lim AS (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_lim
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
             / 700.0, 4) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN lim t ON t.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#4' AND l.l_quantity < t.qty_lim
""",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity-order revenue: the correlated
    scalar subquery (l_quantity < 0.2 * that part's average quantity)
    decorrelated into an aggregate + join-back — the standard rewrite
    Catalyst itself applies to correlated scalar subqueries.

    Determinism note: per-part avg(l_quantity) is a mean of
    integer-valued doubles — the partial sums are exact in IEEE, so the
    limit is bit-identical cross-engine despite the 1:N float division;
    the revenue output is integerized cents (exact int64 sums).

    Scale shape: the per-part quantity agg is one hash aggregate on the
    same l_partkey key the join-back uses; the brand filter pushes to
    the part scan and broadcasts; final agg is a scalar."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    lim = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_lim")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return (
        li.join(
            F.broadcast(
                p.where(F.col("p_brand") == "Brand#4").select("p_partkey")
            ),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(lim, "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            F.sum(cents).alias("total_cents"),
            F.round(F.sum(cents) / 700.0, 4).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ------------------------------------------------------------- anti join
@register(
    "orders_priority_anti",
    """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_quantity > 45)
GROUP BY o_orderpriority
""",
)
def q_orders_priority_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as an explicit LEFT ANTI join — the complement of
    `orders_priority_semi` (together they partition the orders table, a
    property the test asserts). Same scale shape as the semi: pushdown
    filter on the probe side, one orderkey-keyed join, no
    join-then-null-filter materialization."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    hits = li.where(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        o.join(hits, o.o_orderkey == hits.l_orderkey, "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ----------------------------------- generic CEP: time-bounded burst match
@register(
    "pattern_seq_conversion",
    """
WITH seq AS (
  SELECT user_id, event_id, event_type, ts,
         LEAD(event_id, 1)   OVER w AS e1,
         LEAD(event_type, 1) OVER w AS t1,
         LEAD(event_id, 2)   OVER w AS e2,
         LEAD(event_type, 2) OVER w AS t2,
         LEAD(ts, 2)         OVER w AS ts2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       event_id AS s0_event_id,
       e1       AS s1_event_id,
       e2       AS s2_event_id,
       epoch_us(ts2) - epoch_us(ts) AS span_us
FROM seq
WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
  AND epoch_us(ts2) - epoch_us(ts) <= 86400000000
""",
)
def q_pattern_seq_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic-CEP conversion burst: view -> click -> purchase as
    CONSECUTIVE events of one user (no intervening event of any type)
    within 24 hours — the time-bounded (`within_us`) instance of
    `operators/cep.py::seq_match`, stricter than the first-touch funnel
    (`events_funnel`) which allows gaps. The span is exact integer
    micros end-to-end. Streaming twin:
    `streaming/pipeline.py::start_burst_pattern_stream_job` (same
    handler factory as the dialog pattern — one matcher, two row
    shapes). Scale posture: ONE user_id Exchange+Sort shared by the
    lead chains and the span bound; no self-join (plan-asserted)."""
    from data_harvesting_spark.operators.cep import (
        CONVERSION_BURST,
        seq_match,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return seq_match(
        ev, ["user_id"], ["ts", "event_id"], CONVERSION_BURST
    )


# --------------------------------------------- gaps-and-islands run lengths
@register(
    "event_runs",
    """
WITH flagged AS (
  SELECT user_id, event_id, event_type, ts,
         CASE WHEN event_type = LAG(event_type) OVER w
              THEN 0 ELSE 1 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT *,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rid
  FROM flagged
)
SELECT user_id,
       min(event_type)              AS run_value,
       CAST(count(*) AS BIGINT)     AS run_len,
       CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS end_us
FROM runs
GROUP BY user_id, rid
HAVING count(*) >= 3
""",
)
def q_event_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of >= 3 CONSECUTIVE same-type
    events per user ("retry storms" when the type is error) via
    `operators/temporal.py::runs_encode` — the variable-length
    complement of the fixed-length generic CEP matcher, and the batch
    twin of the streaming SCD2 change-point collapse. Scale posture:
    change-flag lag, running-sum run ids, and the per-run aggregate all
    share ONE user_id exchange (plan-asserted)."""
    from data_harvesting_spark.operators.temporal import runs_encode

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    runs = runs_encode(
        ev, ["user_id"], ["ts", "event_id"], "event_type", span_col="ts"
    )
    return runs.where(F.col("run_len") >= 3)


# ---------------------------------------------------------------- TPC-H Q13
@register(
    "tpch_q13",
    """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey,
         CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
""",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer-order-count distribution: how many
    customers placed exactly k (non-urgent) orders, INCLUDING the
    zero-order customers — the canonical filtered LEFT OUTER JOIN +
    double aggregation histogram.

    Scale shape: Q13's naive plan outer-joins customer to raw orders
    (1:N blowup) and then counts. This plan aggregates orders per
    o_custkey FIRST (one hash agg, map-side combine collapses the fact
    table to one row per customer key), then LEFT OUTER joins the tiny
    per-key counts back to customer and coalesces the misses to 0 —
    the join is 1:1, the priority filter pushes to the orders scan,
    and the final histogram agg runs on |customers| rows. At 100 TB
    both join sides are large → sort-merge on custkey; AQE demotes to
    broadcast when the aggregated side fits."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per_key = (
        o.where(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    per_cust = c.join(
        per_key, c.c_custkey == per_key.o_custkey, "left_outer"
    ).select(
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


# ----------------------------------------------------------- key-skew report
@register(
    "key_skew_report",
    """
WITH per_key AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(n_events) AS BIGINT) AS n_total
  FROM per_key
)
SELECT p.user_id, p.n_events,
       round(p.n_events / CAST(t.n_total AS DOUBLE), 6) AS share,
       round(p.n_events * t.n_keys / CAST(t.n_total AS DOUBLE), 4)
         AS x_mean
FROM per_key p CROSS JOIN tot t
ORDER BY p.n_events DESC, p.user_id
LIMIT 10
""",
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key skew diagnostics: the 10 heaviest shuffle keys with their
    row counts, corpus share, and multiple-of-the-mean — the report a
    pipeline operator reads BEFORE choosing a salt factor for a skewed
    join or aggregation (north_rule: "partitioning / shuffle / skew
    handled explicitly"; `salted_tool_counts` is the treatment, this is
    the diagnosis).

    Scale shape: the per-key counts are ONE hash aggregate with
    map-side combine (the skewed key's billions of rows pre-collapse
    inside each task — counting is the one operation skew cannot hurt);
    the two corpus scalars reduce the per-key table again and return as
    a 1-row broadcast crossJoin (never an empty-spec window, which
    would single-partition the table); the top-10 is TakeOrdered, no
    global sort. x_mean = n_events * n_keys / n_total stays an exact
    integer ratio until the one rounded division."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_key = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    tot = per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("n_events").cast("bigint").alias("n_total"),
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n_events",
            F.round(
                F.col("n_events") / F.col("n_total").cast("double"), 6
            ).alias("share"),
            F.round(
                F.col("n_events")
                * F.col("n_keys")
                / F.col("n_total").cast("double"),
                4,
            ).alias("x_mean"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(10)
    )


# ---------------------------------------------------------------- TPC-H Q21
@register(
    "tpch_q21",
    """
WITH li AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
         max(CASE WHEN late THEN l_suppkey END) AS late_supp
  FROM li GROUP BY l_orderkey
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order p JOIN supplier s ON p.late_supp = s.s_suppkey
WHERE p.n_supp >= 2 AND p.n_late = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style "suppliers who kept the order waiting": for each
    finished multi-supplier order, find the SOLE supplier whose line
    shipped late, then rank suppliers by how many orders they alone
    held up. (Adaptation: the synthetic lineitem carries no
    receipt/commit dates, so "late" = shipped >60 days after the order
    date; the quantifier structure — EXISTS another supplier, NOT
    EXISTS another late supplier — is the shape under test.)

    Scale shape: the canonical formulation self-joins lineitem twice
    (EXISTS + NOT EXISTS); this plan replaces both quantifiers with ONE
    per-order aggregate — count(DISTINCT suppkey), count(DISTINCT late
    suppkey), and max(late suppkey) (which IS the lone late supplier
    whenever n_late = 1) — so lineitem is shuffled once on l_orderkey,
    the same key as its join with orders (AQE coalesces; no second
    fact-sized exchange). supplier joins broadcast; top-10 is
    TakeOrdered. Reference analog: multi-enricher disagreement
    triage (SURVEY §2 J1/P5/P6 composition)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    joined = li.join(
        o.where(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("late"),
    )
    late_supp = F.when(F.col("late"), F.col("l_suppkey"))
    per_order = joined.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(late_supp).alias("n_late"),
        F.max(late_supp).alias("late_supp"),
    )
    return (
        per_order.where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------- TPC-H Q22
@register(
    "tpch_q22",
    """
WITH cust AS (
  SELECT c_custkey, c_nationkey, c_acctbal
  FROM customer
  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13, 15, 17, 19)
),
avg_bal AS (
  SELECT avg(c_acctbal) AS ab FROM cust WHERE c_acctbal > 0.0
)
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM cust, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = cust.c_custkey
      AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
""",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style "global sales opportunity": per nation group, the
    count and total balance of above-average-balance customers who have
    never placed an urgent order — scalar-subquery threshold + anti-join.
    (Adaptation: nation-key residues stand in for phone prefixes, and
    the anti-join is against URGENT orders because the synthetic data
    gives every customer at least one order.)

    Scale shape: the average is a scalar aggregate returned as a 1-row
    broadcast crossJoin (never an empty-spec window); the NOT EXISTS is
    a LEFT ANTI join against the DISTINCT urgent-order custkeys — the
    priority filter pushes to the orders scan and the distinct collapses
    the fact side map-side to at most |customers| keys before the wire;
    the final agg runs on the filtered customer rows. At 100 TB the anti
    join is sort-merge on custkey; AQE demotes to broadcast when the
    distinct key side fits."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_nationkey").isin([1, 3, 5, 7, 9, 11, 13, 15, 17, 19])
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    urgent_keys = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(urgent_keys, c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# --------------------------------------------------------- data-quality scan
@register(
    "dq_profile",
    """
WITH m AS (
  SELECT
    CAST(count(*) AS DOUBLE)                             AS n_rows,
    CAST(count(*) - count(event_id) AS DOUBLE)           AS event_id_nulls,
    CAST(count(DISTINCT event_id) AS DOUBLE)             AS event_id_distinct,
    CAST(count(*) - count(user_id) AS DOUBLE)            AS user_id_nulls,
    CAST(count(DISTINCT user_id) AS DOUBLE)              AS user_id_distinct,
    CAST(count(*) - count(event_type) AS DOUBLE)         AS event_type_nulls,
    CAST(count(DISTINCT event_type) AS DOUBLE)           AS event_type_distinct,
    CAST(count(*) - count(value) AS DOUBLE)              AS value_nulls,
    CAST(min(value) AS DOUBLE)                           AS value_min,
    CAST(max(value) AS DOUBLE)                           AS value_max,
    round(avg(value), 6)                                 AS value_mean,
    CAST(count(*) - count(ts) AS DOUBLE)                 AS ts_nulls,
    CAST(floor(epoch(min(ts))) AS DOUBLE)                AS ts_min_epoch,
    CAST(floor(epoch(max(ts))) AS DOUBLE)                AS ts_max_epoch,
    round(avg(length(props)), 4)                         AS props_avg_len
  FROM events
)
SELECT t.col AS column_name, t.metric, t.value
FROM m, LATERAL (VALUES
  ('_table',     'n_rows',     m.n_rows),
  ('event_id',   'n_nulls',    m.event_id_nulls),
  ('event_id',   'n_distinct', m.event_id_distinct),
  ('user_id',    'n_nulls',    m.user_id_nulls),
  ('user_id',    'n_distinct', m.user_id_distinct),
  ('event_type', 'n_nulls',    m.event_type_nulls),
  ('event_type', 'n_distinct', m.event_type_distinct),
  ('value',      'n_nulls',    m.value_nulls),
  ('value',      'min',        m.value_min),
  ('value',      'max',        m.value_max),
  ('value',      'mean',       m.value_mean),
  ('ts',         'n_nulls',    m.ts_nulls),
  ('ts',         'min_epoch',  m.ts_min_epoch),
  ('ts',         'max_epoch',  m.ts_max_epoch),
  ('props',      'avg_len',    m.props_avg_len)
) AS t(col, metric, value)
""",
)
def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style single-pass data-quality profile of the event log:
    per-column null counts, exact distinct counts, numeric min/max/mean,
    timestamp range, and string length — the validation report a
    pipeline runs on every ingested batch before trusting it downstream
    (the batch analog of the streaming metrics/lineage listener,
    reference analog: the queue consumer's payload sanity checks,
    /root/reference/queue_harvesting.py:84-118).

    Scale shape: every metric comes out of ONE aggregate pass over the
    scan — partial aggregation happens map-side per partition and only
    the per-partition metric tuples (a few hundred bytes) cross the
    wire to the scalar final aggregate (the known-intended
    SinglePartition class); the long (column, metric, value) layout is
    an in-row stack of the 1-row result, not a second pass. The exact
    count(DISTINCT) trio rides the same pass via Spark's expand; at
    100 TB swap them for approx_count_distinct / the shipped HLL
    sketch (operators/sketch.py) — the report shape is unchanged."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = F.count(F.lit(1)).cast("double")
    m = ev.agg(
        n.alias("n_rows"),
        (n - F.count("event_id")).alias("event_id_nulls"),
        F.countDistinct("event_id").cast("double").alias("event_id_distinct"),
        (n - F.count("user_id")).alias("user_id_nulls"),
        F.countDistinct("user_id").cast("double").alias("user_id_distinct"),
        (n - F.count("event_type")).alias("event_type_nulls"),
        F.countDistinct("event_type")
        .cast("double")
        .alias("event_type_distinct"),
        (n - F.count("value")).alias("value_nulls"),
        F.min("value").cast("double").alias("value_min"),
        F.max("value").cast("double").alias("value_max"),
        F.round(F.avg("value"), 6).alias("value_mean"),
        (n - F.count("ts")).alias("ts_nulls"),
        F.unix_timestamp(F.min("ts")).cast("double").alias("ts_min_epoch"),
        F.unix_timestamp(F.max("ts")).cast("double").alias("ts_max_epoch"),
        F.round(F.avg(F.length("props")), 4).alias("props_avg_len"),
    )
    pairs = [
        ("_table", "n_rows", "n_rows"),
        ("event_id", "n_nulls", "event_id_nulls"),
        ("event_id", "n_distinct", "event_id_distinct"),
        ("user_id", "n_nulls", "user_id_nulls"),
        ("user_id", "n_distinct", "user_id_distinct"),
        ("event_type", "n_nulls", "event_type_nulls"),
        ("event_type", "n_distinct", "event_type_distinct"),
        ("value", "n_nulls", "value_nulls"),
        ("value", "min", "value_min"),
        ("value", "max", "value_max"),
        ("value", "mean", "value_mean"),
        ("ts", "n_nulls", "ts_nulls"),
        ("ts", "min_epoch", "ts_min_epoch"),
        ("ts", "max_epoch", "ts_max_epoch"),
        ("props", "avg_len", "props_avg_len"),
    ]
    stack_args = ", ".join(
        f"'{col}', '{metric}', {field}" for col, metric, field in pairs
    )
    return m.select(
        F.expr(
            f"stack({len(pairs)}, {stack_args}) "
            "AS (column_name, metric, value)"
        )
    )


# ---------------------------------------------------------- dq constraints
@register(
    "dq_constraints",
    """
WITH m AS (
  SELECT
    count(*) AS n_rows,
    count(event_id) AS event_id_filled,
    count(DISTINCT event_id) AS event_id_distinct,
    count(user_id) AS user_id_filled,
    count(CASE WHEN value >= 0.0 THEN 1 END) AS value_nonneg,
    count(value) AS value_filled,
    count(CASE WHEN event_type IN
      ('click','view','purchase','signup','error') THEN 1 END)
      AS event_type_known,
    count(event_type) AS event_type_filled
  FROM events
)
SELECT t.rule, t.passed, round(t.actual, 6) AS actual
FROM m, LATERAL (VALUES
  ('event_id is unique',
     m.event_id_distinct = m.event_id_filled,
     CAST(m.event_id_distinct AS DOUBLE) / m.event_id_filled),
  ('event_id is complete',
     m.event_id_filled = m.n_rows,
     CAST(m.event_id_filled AS DOUBLE) / m.n_rows),
  ('user_id is complete',
     m.user_id_filled = m.n_rows,
     CAST(m.user_id_filled AS DOUBLE) / m.n_rows),
  ('value is non-negative',
     m.value_nonneg = m.value_filled,
     CAST(m.value_nonneg AS DOUBLE) / m.value_filled),
  ('event_type in domain',
     m.event_type_known = m.event_type_filled,
     CAST(m.event_type_known AS DOUBLE) / m.event_type_filled)
) AS t(rule, passed, actual)
""",
)
def q_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint verification over the event log: named
    rules (uniqueness, completeness, non-negativity, domain membership)
    each reported as (rule, passed, actual ratio) — the gate a pipeline
    evaluates before promoting a batch (compare `streaming/metrics.py`,
    which tracks the same health signals continuously).

    Scale shape: identical to dq_profile — ONE aggregate pass, map-side
    partial aggregation, a scalar final aggregate, and an in-row stack
    into the report layout. The rule evaluations are arithmetic on the
    1-row metric tuple, costing nothing at any scale."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    known = ["click", "view", "purchase", "signup", "error"]
    m = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("event_id").alias("event_id_filled"),
        F.countDistinct("event_id").alias("event_id_distinct"),
        F.count("user_id").alias("user_id_filled"),
        F.count(F.when(F.col("value") >= 0.0, 1)).alias("value_nonneg"),
        F.count("value").alias("value_filled"),
        F.count(
            F.when(F.col("event_type").isin(known), 1)
        ).alias("event_type_known"),
        F.count("event_type").alias("event_type_filled"),
    )
    rules = [
        (
            "event_id is unique",
            F.col("event_id_distinct") == F.col("event_id_filled"),
            F.col("event_id_distinct")
            / F.col("event_id_filled").cast("double"),
        ),
        (
            "event_id is complete",
            F.col("event_id_filled") == F.col("n_rows"),
            F.col("event_id_filled") / F.col("n_rows").cast("double"),
        ),
        (
            "user_id is complete",
            F.col("user_id_filled") == F.col("n_rows"),
            F.col("user_id_filled") / F.col("n_rows").cast("double"),
        ),
        (
            "value is non-negative",
            F.col("value_nonneg") == F.col("value_filled"),
            F.col("value_nonneg") / F.col("value_filled").cast("double"),
        ),
        (
            "event_type in domain",
            F.col("event_type_known") == F.col("event_type_filled"),
            F.col("event_type_known")
            / F.col("event_type_filled").cast("double"),
        ),
    ]
    return m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(rule).alias("rule"),
                        passed.alias("passed"),
                        F.round(actual, 6).alias("actual"),
                    )
                    for rule, passed, actual in rules
                ]
            )
        ).alias("r")
    ).select("r.rule", "r.passed", "r.actual")


# ------------------------------------------------------------- salted join
@register(
    "salted_user_join",
    """
WITH dim AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
)
SELECT e.event_type,
       round(avg(floor(epoch(e.ts)) - floor(epoch(d.first_ts))), 4)
         AS avg_age_s,
       CAST(count(*) AS BIGINT) AS n_events
FROM events e JOIN dim d USING (user_id)
GROUP BY e.event_type
""",
)
def q_salted_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event age since each user's first touch, via an explicitly
    SKEW-SALTED fact-to-dim join: the hot user keys `key_skew_report`
    diagnoses are split across 8 reducers by salting the join key, and
    the per-user dim is replicated once per salt so every fragment
    still matches — the treatment for a skewed join whose build side
    exceeds broadcast (north_rule: skew handled explicitly;
    `salted_tool_counts` is the same treatment for aggregation).

    Scale shape: salting changes where rows meet, never which rows
    meet — the oracle is the PLAIN join, so the driver's value check
    proves the rewrite exact. The shuffled-hash join is forced (that's
    the at-scale shape where the dim exceeds broadcast; AQE's skew
    split would not help a shuffled-hash build side); the dim ships
    8x, which for a per-user tuple is noise next to splitting a
    billion-row hot key. Timestamps compare as floor-epoch seconds on
    both engines."""
    from data_harvesting_spark.operators.bucketed import salted_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    joined = salted_join(
        ev, dim, on="user_id", n_salt=8, spread_cols=("event_id",)
    )
    return joined.groupBy("event_type").agg(
        F.round(
            F.avg(
                F.unix_timestamp("ts") - F.unix_timestamp("first_ts")
            ),
            4,
        ).alias("avg_age_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


# ---------------------------------------------------------------- TPC-H Q7
@register(
    "tpch_q7",
    """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
    OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
""",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style bi-nation trade volume: revenue per year between
    two specific nations, in both directions — the shape where TWO
    independent dimension lineages (order→customer→nation and
    supplier→nation) must both resolve on the same fact row before the
    direction filter applies.

    Scale shape: the only big-big edge is lineitem⋈orders (one
    orderkey exchange pair at scale; AQE demotes to broadcast when the
    filtered side fits — at test scale it does). customer, supplier,
    and both nation copies are broadcast dims; the two-direction
    predicate is a post-filter on already-joined dim columns, no extra
    shuffle. Catalyst pushes nothing nation-specific into the fact
    scan here (the filter needs both lineages joined) — the right
    at-scale trim is semi-joining customer/supplier down to the two
    nations BEFORE the fact join, which the broadcast of the filtered
    dims achieves. Revenue is integerized to cents per row before the
    sum (exact int64 group sums, hash-stable cross-engine)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    pair = (F.col("cust_nation") == "NATION_1") & (
        F.col("supp_nation") == "NATION_2"
    ) | (F.col("cust_nation") == "NATION_2") & (
        F.col("supp_nation") == "NATION_1"
    )
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(rev_cents).alias("revenue_cents"))
    )


# --------------------------------------------------------------- dq monitor
def _dq_monitor_sql() -> str:
    from data_harvesting_spark.operators.sketch import HLL_NUMERATOR

    return f"""
WITH m AS (
  SELECT
    count(*) AS n_rows,
    count(event_id) AS event_id_filled,
    count(user_id) AS user_id_filled,
    count(value) AS value_filled,
    count(CASE WHEN value >= 0.0 THEN 1 END) AS value_nonneg,
    count(event_type) AS event_type_filled,
    count(CASE WHEN event_type IN
      ('click','view','purchase','signup','error') THEN 1 END)
      AS event_type_known
  FROM events
),
hashed AS (
  SELECT CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events WHERE event_id IS NOT NULL
),
rho AS (
  SELECT h & 1023 AS bucket,
         CASE WHEN (h >> 10) = 0 THEN 51
              ELSE 51 - length(bin(h >> 10)) END AS rho
  FROM hashed
),
regs AS (SELECT bucket, max(rho) AS m_j FROM rho GROUP BY bucket),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS registers_used,
         CAST(sum((1::BIGINT) << (51 - m_j)) AS BIGINT) AS s_present
  FROM regs
),
est AS (
  SELECT {HLL_NUMERATOR!r} /
         (s_present + (1024 - registers_used) * (1::BIGINT << 51))
           AS est_distinct
  FROM sums
)
SELECT t.rule, t.passed, t.actual
FROM m, est, LATERAL (VALUES
  ('event_id is unique (hll)',
     round(est.est_distinct / m.event_id_filled, 6) >= 0.9,
     round(est.est_distinct / m.event_id_filled, 6)),
  ('event_id is complete',
     m.event_id_filled = m.n_rows,
     round(CAST(m.event_id_filled AS DOUBLE) / m.n_rows, 6)),
  ('user_id is complete',
     m.user_id_filled = m.n_rows,
     round(CAST(m.user_id_filled AS DOUBLE) / m.n_rows, 6)),
  ('value is non-negative',
     m.value_nonneg = m.value_filled,
     round(CAST(m.value_nonneg AS DOUBLE) / m.value_filled, 6)),
  ('event_type in domain',
     m.event_type_known = m.event_type_filled,
     round(CAST(m.event_type_known AS DOUBLE) / m.event_type_filled, 6))
) AS t(rule, passed, actual)
"""


@register("dq_monitor", _dq_monitor_sql())
def q_dq_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous data-quality monitor's batch twin
    (`operators/dq.py::dq_monitor_batch`): the `dq_constraints` rules
    with the uniqueness check swapped for the HLL estimate — the form
    that survives an unbounded stream, where per-id state is O(stream)
    but 1024 max-merge registers are O(1). The oracle rebuilds the
    identical registers (md5 → 60-bit int → bucket/rho) and the
    exact-int harmonic sum, so the value check pins the full sketch
    arithmetic, not just the counters. The streaming job
    (`streaming/pipeline.py::start_dq_monitor_stream_job`) folds the
    same two mergeable states per epoch; its final report equals this
    query bit-for-bit (stream==batch test).

    Scale shape: one counter aggregate pass (map-side partials) + one
    1024-group register agg (O(registers) per task); the report is
    arithmetic on their 1-row join."""
    from data_harvesting_spark.operators.dq import dq_monitor_batch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return dq_monitor_batch(ev)


# ---------------------------------------------------------------- TPC-H Q6
@register(
    "tpch_q6",
    """
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style forecasting revenue change: the canonical
    pure-pushdown scan-aggregate. All three predicates reach the parquet
    scan as PushedFilters (date range row-group pruning does most of the
    work at 100 TB); the whole plan is one WholeStageCodegen span ending
    in a scalar partial+final agg — zero shuffle of data rows, one row
    per task to the driver. Revenue integerized to cents per row so the
    sum is order-exact (same discipline as events_sliding_value)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
                    "bigint"
                )
            ).alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------- TPC-H Q10
@register(
    "tpch_q10",
    """
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, c.c_custkey
LIMIT 20
""",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item report: top 20 customers by revenue
    lost to returns in a quarter. Join order is scale-deliberate: the
    date-filtered orders slice joins the returnflag-filtered lineitem on
    l_orderkey first (both filters pushed to the scans; a quarter of
    orders is still huge at 100 TB, so this stays a shuffle join and
    AQE may demote/broadcast at small SF), THEN the per-order partial
    agg shrinks the fact to one row per (orderkey, custkey) before the
    customer join — the customer dim is shuffled against an
    already-aggregated side, never against raw lineitem. nation is a
    25-row broadcast. Top-20 is a deterministic revenue-then-key
    TakeOrdered; no global sort. Revenue integerized to cents per row
    so sums are order-exact."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    o_q = o.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        li.where(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
            .alias("rev_cents"),
        )
        .join(o_q, F.col("l_orderkey") == o_q.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev_cents").alias("revenue_cents"))
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            "revenue_cents",
        )
        .orderBy(F.desc("revenue_cents"), "c_custkey")
        .limit(20)
    )


# ------------------------------------------------------- TPC-H Q12 (adapted)
@register(
    "tpch_q12",
    """
SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 'high' ELSE 'low' END AS priority_class,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS late_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style shipping-mode/priority audit, adapted to this
    schema (no l_shipmode/l_commitdate columns — TESTDATA.md): count
    lineitems shipped more than 60 days after their order date, split by
    urgent-vs-other order priority. The reference's per-row latency gate
    (SURVEY P3/A8) at relational scale. Shape: both sides project to
    3/2 columns at the scan, one fact-fact shuffle join on the orderkey
    (co-partitioned by the join key — the bucketed-join variant in
    operators/bucketed.py removes even that exchange when both tables
    are bucketed), then a 2-group hash agg with map-side partials;
    nothing materializes beyond the join buffers."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        li.select("l_orderkey", "l_shipdate")
        .join(
            o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high"
            )
            .otherwise("low")
            .alias("priority_class")
        )
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late_items"),
        )
    )


# ---------------------------------------------------------------- TPC-H Q14
@register(
    "tpch_q14",
    """
WITH base AS (
  SELECT CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           AS rev_cents,
         p.p_type
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
    AND l.l_shipdate < TIMESTAMP '1997-10-01')
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_cents ELSE 0 END)
            AS BIGINT) AS promo_cents,
       CAST(sum(rev_cents) AS BIGINT) AS total_cents,
       round(sum(CASE WHEN p_type = 'PROMO' THEN rev_cents ELSE 0 END) * 1.0
             / sum(rev_cents), 6) AS promo_share
FROM base
""",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promotion-effect share: one month of lineitem
    (date filter pushed to the scan) joined to the part dim — broadcast
    here and at any realistic scale (part is orders of magnitude smaller
    than lineitem; AQE demotes past the threshold) — then a scalar
    conditional aggregate. Revenue integerized to cents per row before
    either sum so both the numerator and denominator are exact int64;
    the share is one final division (bit-stable)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    agg = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .select("l_partkey", rev.alias("rev_cents"))
        .join(F.broadcast(p.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("rev_cents")).otherwise(0)
            ).alias("promo_cents"),
            F.sum("rev_cents").alias("total_cents"),
        )
    )
    return agg.select(
        "promo_cents",
        "total_cents",
        F.round(F.col("promo_cents") / F.col("total_cents"), 6).alias(
            "promo_share"
        ),
    )


# ---------------------------------------------------------------- TPC-H Q15
@register(
    "tpch_q15",
    """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_cents
FROM rev r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_cents = (SELECT max(total_cents) FROM rev)
""",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: quarterly revenue per suppkey (one
    hash agg over the date-pruned scan, cents-integerized so the maximum
    is well-defined across engines), the scalar max returned as a 1-row
    broadcast crossJoin filter (the deliberate alternative to an
    empty-spec window that would single-partition the agg output), then
    the supplier dim broadcast for the name. Emits every supplier tied
    at the max, as the spec's view formulation does."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            ).alias("total_cents")
        )
    )
    best = rev.agg(F.max("total_cents").alias("best_cents"))
    return (
        rev.join(F.broadcast(best), F.col("total_cents") == F.col("best_cents"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_cents")
    )


# ---------------------------------------------------------------- TPC-H Q19
@register(
    "tpch_q19",
    """
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style discounted-revenue with a disjunction of
    conjunctive brand/size/quantity terms (adapted: this schema has no
    p_container, so the container lists become size bands). The
    cross-table OR cannot split into per-scan filters, but its
    single-table residues CAN and do: the part side prunes to the three
    brands and max size band, the lineitem side to the covering quantity
    envelope — both pushed to the scans — and the full disjunction
    evaluates as the equi-join's residual condition (never a nested-loop
    join). Part stays a broadcast dim."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    p_pruned = p.where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
        & F.col("p_size").between(1, 35)
    ).select("p_partkey", "p_brand", "p_size")
    li_pruned = li.where(F.col("l_quantity").between(1, 30)).select(
        "l_partkey",
        "l_quantity",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("rev_cents"),
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li_pruned.join(
            F.broadcast(p_pruned),
            (F.col("l_partkey") == F.col("p_partkey")) & cond,
        )
        .agg(
            F.count("*").alias("n_items"),
            F.sum("rev_cents").alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------- TPC-H Q8
@register(
    "tpch_q8",
    """
WITH base AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           AS rev_cents,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE p.p_type = 'ECONOMY'
    AND r.r_name = 'ASIA'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01')
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev_cents ELSE 0 END)
            AS BIGINT) AS nation_cents,
       CAST(sum(rev_cents) AS BIGINT) AS total_cents,
       round(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev_cents ELSE 0 END)
             * 1.0 / sum(rev_cents), 6) AS mkt_share
FROM base GROUP BY o_year
""",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: NATION_2's share of ASIA's
    ECONOMY-part import revenue per year. Eight tables, two independent
    dim lineages resolving on the same fact row (order→customer→nation→
    region gives the market; supplier→nation gives the competitor) —
    the same two-lineage shape as tpch_q7. Every dim chain is broadcast
    (part pruned to one type first, nation⋈region pre-joined driver-free
    before broadcasting); the only big-big edge is lineitem⋈orders on
    the orderkey (date filter pushed to the orders scan shrinks the
    build side). Cents-integerized revenue; the share is one final
    division per year row."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    # market lineage: nations inside ASIA (25x5 dim-dim join, broadcast)
    asia_nations = n.join(
        F.broadcast(r.where(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("mkt_nationkey"))
    # customers in the market
    mkt_cust = c.join(
        F.broadcast(asia_nations),
        F.col("c_nationkey") == F.col("mkt_nationkey"),
    ).select("c_custkey")
    # orders in the window placed by market customers
    o_win = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(mkt_cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").cast("int").alias("o_year"))
    )
    # supplier lineage: suppkey -> nation name (100x25, broadcast)
    supp_nation = s.join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    econ_parts = p.where(F.col("p_type") == "ECONOMY").select("p_partkey")
    base = (
        li.select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
            .alias("rev_cents"),
        )
        .join(F.broadcast(econ_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(o_win, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    nat = F.when(F.col("supp_nation") == "NATION_2", F.col("rev_cents")).otherwise(0)
    agg = base.groupBy("o_year").agg(
        F.sum(nat).alias("nation_cents"),
        F.sum("rev_cents").alias("total_cents"),
    )
    return agg.select(
        "o_year",
        "nation_cents",
        "total_cents",
        F.round(F.col("nation_cents") / F.col("total_cents"), 6).alias(
            "mkt_share"
        ),
    )


# ----------------------------------------------------- TPC-H Q2 (adapted)
@register(
    "tpch_q2",
    """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         CAST(min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT))
              AS BIGINT) AS unit_cents
  FROM lineitem GROUP BY 1, 2),
eur AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'),
tgt AS (SELECT p_partkey, p_name FROM part
        WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'),
offers AS (
  SELECT t.p_partkey, t.p_name, e.s_suppkey, e.s_name, e.s_acctbal,
         e.n_name, c.unit_cents,
         min(c.unit_cents) OVER (PARTITION BY t.p_partkey) AS best_cents
  FROM cost c
  JOIN tgt t ON c.l_partkey = t.p_partkey
  JOIN eur e ON c.l_suppkey = e.s_suppkey)
SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_name,
       s_suppkey, unit_cents AS cost_cents
FROM offers WHERE unit_cents = best_cents
ORDER BY s_acctbal DESC, nation, s_name, p_partkey, s_suppkey
LIMIT 100
""",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier, adapted to this schema (no
    partsupp table — TESTDATA.md), so the per-(part, supplier) unit cost
    is DERIVED from the fact: min observed cents-integerized unit price
    over that pair's lineitems. For every size-10-to-20 LARGE part, emit the
    EUROPE supplier(s) offering the cheapest unit cost. Shape at 100 TB:
    one hash agg collapses lineitem to the (part, supplier) cost grid —
    the only full-fact pass; the part filter and the supplier→nation→
    region lineage are both broadcast prunes of that grid, and the
    per-part minimum is a window over the already-tiny filtered frame
    (partitioned by p_partkey, so it rides the existing key
    distribution; the correlated-subquery formulation of the spec would
    re-scan per row). Full-key ORDER + LIMIT keeps the top-100
    deterministic under ties."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    cost = (
        li.select(
            "l_partkey",
            "l_suppkey",
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100)
            .cast("bigint")
            .alias("unit_cents_row"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit_cents_row").alias("unit_cents"))
    )
    eur = (
        s.join(
            F.broadcast(n.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(r.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    tgt = p.where(F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")).select(
        "p_partkey", "p_name"
    )
    from pyspark.sql import Window

    offers = (
        cost.join(F.broadcast(tgt), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eur), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn(
            "best_cents",
            F.min("unit_cents").over(Window.partitionBy("p_partkey")),
        )
    )
    return (
        offers.where(F.col("unit_cents") == F.col("best_cents"))
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            "s_suppkey",
            F.col("unit_cents").alias("cost_cents"),
        )
        .orderBy(
            F.desc("s_acctbal"), "nation", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(100)
    )


# ----------------------------------------------------- TPC-H Q9 (adapted)
@register(
    "tpch_q9",
    """
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
""",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-type profit by supplier nation and order
    year, adapted to this schema (no partsupp, so profit has no
    supplycost term — it is discounted revenue over the name-matched
    parts). Shape: the part-name filter prunes a broadcast dim BEFORE
    touching the fact (substring LIKE can't reach the parquet scan, but
    the dim is tiny and the semi-join effect shrinks lineitem early);
    supplier→nation is the second broadcast lineage; the single big-big
    edge is the orderkey join for the year, feeding a (25 nations × ~7
    years) hash agg — partial aggregation makes the final shuffle a few
    hundred rows regardless of input scale."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    red_parts = p.where(F.col("p_name").like("%red%")).select("p_partkey")
    supp_nat = s.join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    return (
        li.select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
            .alias("profit_row"),
        )
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            o.select("o_orderkey", F.year("o_orderdate").cast("int").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("profit_row").alias("profit_cents"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------- TPC-H Q11 (adapted)
@register(
    "tpch_q11",
    """
WITH val AS (
  SELECT l.l_partkey AS p_partkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY 1)
SELECT p_partkey, value_cents
FROM val
WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM val)
ORDER BY value_cents DESC, p_partkey
""",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style important stock, adapted (no partsupp: a part's
    held value for one nation's suppliers is the cents-integerized
    extendedprice total of their lineitems). Keep parts whose value
    exceeds 0.1% of the nation's grand total. The threshold is computed
    as INTEGER arithmetic (value*1000 > total) so the cut is exact in
    both engines — no float fraction at the boundary. Shape: one
    broadcast-semi prune of the fact to one nation's suppliers (4% of
    rows), one partkey hash agg, then the scalar grand total returns as
    a 1-row broadcast crossJoin filter over the agg output (the q15
    pattern — never a single-partition window)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nat_supp = s.join(
        F.broadcast(n.where(F.col("n_name") == "NATION_3")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    val = (
        li.select(
            "l_partkey",
            "l_suppkey",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("v_row"),
        )
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum("v_row").alias("value_cents"))
    )
    total = val.agg(F.sum("value_cents").alias("total_cents"))
    return (
        val.join(
            F.broadcast(total),
            F.col("value_cents") * 1000 > F.col("total_cents"),
        )
        .select("p_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "p_partkey")
    )


# ---------------------------------------------------- TPC-H Q16 (adapted)
@register(
    "tpch_q16",
    """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#12'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 9, 15, 23, 35, 44, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier-count by part attribute, adapted (no
    partsupp: a supplier "offers" a part iff a lineitem pairs them; the
    spec's complaint-supplier exclusion becomes the negative-balance
    suppliers — the schema's only supplier-quality signal). Shape: the
    brand/type/size prune is a broadcast dim; the exclusion list is a
    broadcast ANTI join (NOT IN over a key-only frame — null-safe
    because s_suppkey is a key column); count(DISTINCT suppkey) runs as
    Spark's two-phase distinct-expand agg, partials map-side, so the
    shuffle carries (brand, type, size, suppkey) pairs — already
    near-distinct — not raw fact rows."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    tgt = p.where(
        (F.col("p_brand") != "Brand#12")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 15, 23, 35, 44, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(tgt), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------- TPC-H Q20 (adapted)
@register(
    "tpch_q20",
    """
WITH shipped AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
    AND l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
  GROUP BY 1, 2),
dominant AS (
  SELECT DISTINCT l_suppkey FROM (
    SELECT l_suppkey, qty,
           sum(qty) OVER (PARTITION BY l_partkey) AS total_qty
    FROM shipped) t
  WHERE qty * 2 > total_qty)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_12'
  AND s.s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s.s_suppkey
""",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style excess-availability suppliers, adapted (no
    partsupp availqty: a supplier qualifies if, for some blue% part,
    they shipped MORE THAN HALF of that part's 1997 total — the
    dominant-shipper formulation of the spec's "more than half my
    stock" rule). Quantities are integral in this schema, so qty*2 >
    total is an exact integer cut. Shape: date + part-name prunes
    (name via broadcast semi) shrink the fact before ONE (part,
    supplier) hash agg; the per-part total is a window over that agg
    output — a second exchange, but on the already-aggregated frame
    (≤ one row per (part, supplier) pair, negligible next to the fact
    scan); the surviving supplier keys distinct down to ≤|suppliers|
    rows and broadcast-semi into the one-nation supplier dim."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    from pyspark.sql import Window

    blue = p.where(F.col("p_name").like("blue%")).select("p_partkey")
    shipped = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(blue), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
    )
    dominant = (
        shipped.withColumn(
            "total_qty", F.sum("qty").over(Window.partitionBy("l_partkey"))
        )
        .where(F.col("qty") * 2 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(
            F.broadcast(n.where(F.col("n_name") == "NATION_12")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(dominant),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ----------------------------------------------------- TPC-H Q4 (adapted)
@register(
    "tpch_q4",
    """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority check, adapted (no l_commitdate /
    l_receiptdate in this schema: "late" = shipped more than 30 days
    after the order date): priority counts for one quarter's orders with
    at least one late line. The CORRELATED-EXISTS completion of the
    simpler `orders_priority_semi` shape — the correlation
    (``l_shipdate > o_orderdate + 30d``) rides the semi join as its
    residual condition, so the plan is still one equi-semi-join on the
    orderkey: date filter pushed to the orders scan, semi short-circuits
    on first late line, never a join-then-distinct. Both sides shuffle
    on the orderkey at 100 TB; AQE demotes the quarter slice to
    broadcast when it fits."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o_q = o.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    late = li.select("l_orderkey", "l_shipdate")
    return (
        o_q.join(
            late,
            (o_q.o_orderkey == late.l_orderkey)
            & (
                late.l_shipdate
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# ------------------------------------------------- unresolved errors (anti)
@register(
    "events_unresolved_errors",
    """
SELECT e.event_id, e.user_id, e.ts
FROM events e
WHERE e.event_type = 'error'
  AND NOT EXISTS (SELECT 1 FROM events f
                  WHERE f.user_id = e.user_id
                    AND f.ts > e.ts
                    AND f.ts <= e.ts + INTERVAL 30 MINUTE)
ORDER BY e.event_id
""",
)
def q_events_unresolved_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch anti twin of the streaming absence job
    (`streaming/pipeline.py::start_unmatched_errors_stream_job`): error
    events with NO same-user activity in the following 30 minutes — the
    dead-letter / unresolved-incident report. Composition of existing
    operators, not a new join: the bucketed interval join
    (`operators/temporal.py::range_join`) finds the RESOLVED error ids
    (bounded candidates, never a BNLJ), then errors LEFT ANTI that
    ≤|errors|-row frame on the event id. Equivalent to
    ``events_error_followups`` filtered to ``n_follow = 0`` but without
    materialising the pair counts."""
    from data_harvesting_spark.operators.temporal import range_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    resolved = (
        range_join(
            errors,
            ev.select("user_id", "ts"),
            on=["user_id"],
            lower_us=0,
            upper_us=30 * 60 * 1_000_000,
        )
        .select(F.col("l_event_id").alias("event_id"))
        .distinct()
    )
    return (
        errors.join(resolved, "event_id", "left_anti")
        .select("event_id", "user_id", "ts")
        .orderBy("event_id")
    )
