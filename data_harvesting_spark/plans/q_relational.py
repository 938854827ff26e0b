"""Relational catalog queries over the TPC-H-ish tables + events stream —
the general OLAP surface (scan pushdown, broadcast joins, windowed aggs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
