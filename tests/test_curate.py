"""Flagship curate pipeline: unit semantics + DuckDB oracle parity."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_ORACLE, SF_SMOKE, duck_on_sf


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return (
        pdf[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )


def test_curate_semantics_on_fixture(spark, transcripts_df):
    from data_harvesting_spark.config import HarvestConfig
    from data_harvesting_spark.operators.curate import curate

    out = curate(transcripts_df, HarvestConfig()).toPandas()
    assert len(out) > 0
    # every pair: response after call, same conversation
    assert (out["response_turn_idx"] > out["call_turn_idx"]).all()
    # cap honored
    per_conv = out.groupby("conv_id")["example_idx"].agg(["min", "max", "count"])
    assert (per_conv["count"] <= 100).all()
    assert (per_conv["min"] == 0).all()
    # example_idx dense per conv
    assert (per_conv["max"] == per_conv["count"] - 1).all()
    # no empty texts survive
    assert (out["call_text"].str.strip().str.len() > 0).all()
    assert (out["response_text"].str.strip().str.len() > 0).all()
    # orphan-call conversations emit nothing: orphan recipe has a call but
    # no response turn at all → conv absent unless another pair exists
    # long_session conv capped at exactly 100
    long_convs = out.groupby("conv_id").size()
    assert long_convs.max() <= 100


def test_curate_dedup_idempotent(spark, transcripts_df):
    """Property: duplicate injection does not change curated output."""
    from data_harvesting_spark.config import HarvestConfig
    from data_harvesting_spark.operators.curate import curate

    base = curate(transcripts_df, HarvestConfig()).toPandas()
    # re-inject exact duplicates of every turn with higher turn_idx
    dup = transcripts_df.selectExpr(
        "conv_id", "cast(turn_idx + 100000 as int) as turn_idx", "role",
        "text", "tool", "ts"
    )
    doubled = transcripts_df.unionByName(dup)
    out = curate(doubled, HarvestConfig()).toPandas()
    cols = ["conv_id", "call_turn_idx", "response_turn_idx", "tool",
            "call_text", "response_text"]
    lhs = _canon(base[cols])
    rhs = _canon(out[cols])
    pd.testing.assert_frame_equal(lhs, rhs)


def test_curate_order_independence(spark, transcripts_df):
    """Property: shuffled input order ⇒ identical curated output."""
    from data_harvesting_spark.config import HarvestConfig
    from data_harvesting_spark.operators.curate import curate

    base = _canon(curate(transcripts_df, HarvestConfig()).toPandas())
    shuffled = transcripts_df.orderBy("text").repartition(7)
    out = _canon(curate(shuffled, HarvestConfig()).toPandas())
    pd.testing.assert_frame_equal(base, out)


@pytest.mark.parametrize("name", ["curate_pairs"])
def test_oracle_parity(spark, name):
    """Spark result == DuckDB oracle on sf0.01 (driver-style check)."""
    from data_harvesting_spark.plans import catalog

    builder = catalog.spark_queries()[name]
    sql = catalog.oracle_queries()[name]
    got = _canon(builder(spark, SF_ORACLE).toPandas())
    want = _canon(duck_on_sf(sql, SF_ORACLE))
    # align dtypes (duckdb int32 vs spark int32 etc.)
    for c in want.columns:
        if want[c].dtype != got[c].dtype:
            want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)


def test_single_exchange_plan(spark, transcripts_df):
    """Pin the scale-critical plan shape: ONE shuffle, ZERO joins.

    The pipeline repartitions once on conv_id; every window key is a
    superset of conv_id, so HashPartitioning(conv_id) satisfies each
    window's ClusteredDistribution — any regression that reintroduces an
    exchange or a join is a scale bug (see BENCH.md).
    """
    import re

    from data_harvesting_spark.config import HarvestConfig
    from data_harvesting_spark.operators.curate import curate

    plan = (
        curate(transcripts_df, HarvestConfig())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"\bExchange ", plan)) == 1, plan
    assert not re.search(r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin", plan)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) >= {"conv_id", "example_idx", "call_text"}


def test_kernel_equals_declarative_curate(spark, transcripts_df):
    """Cross-validation: the pandas session kernel (curate_sessions with an
    effectively-infinite gap → one session per conversation) and the
    declarative Catalyst pipeline (curate) are independent implementations
    of the same semantics — they must emit identical pair sets."""
    from data_harvesting_spark.config import HarvestConfig
    from data_harvesting_spark.operators.curate import curate
    from data_harvesting_spark.operators.curate_sessions import curate_sessions

    cfg = HarvestConfig(session_gap="9000 hours")
    cols = ["conv_id", "example_idx", "call_turn_idx", "response_turn_idx",
            "tool", "call_text", "response_text"]
    a = _canon(curate(transcripts_df, cfg).toPandas()[cols])
    b = _canon(curate_sessions(transcripts_df, cfg).toPandas()[cols])
    pd.testing.assert_frame_equal(a, b)


def test_hot_conversation_skew_correctness(spark):
    """north_rule skew posture: one conversation carrying ~50k turns (vs
    1k conversations of 20) runs through the flagship plan and produces
    the exact capped output — the hot key must not break or mis-cap."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_harvesting_spark.config import HarvestConfig
    from data_harvesting_spark.operators.curate import curate

    base = (
        spark.range(0, 70_000, 1, 8)
        .withColumn(
            "conv_id",
            F.when(F.col("id") < 50_000, F.lit("conv-hot")).otherwise(
                F.concat(F.lit("conv-"), (F.col("id") % 1000))
            ),
        )
        .withColumn(
            "turn_idx",
            F.row_number().over(Window.partitionBy("conv_id").orderBy("id"))
            .cast("int") - 1,
        )
        .withColumn(
            "role",
            F.when(F.col("turn_idx") % 2 == 0, "assistant").otherwise("tool"),
        )
        .withColumn("tool", F.lit("search"))
        .withColumn("text", F.concat(F.lit("t"), F.col("id")))
        .withColumn("ts", F.timestamp_seconds(F.lit(1767225600) + F.col("turn_idx")))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
    out = curate(base, HarvestConfig()).toPandas()
    hot = out[out["conv_id"] == "conv-hot"]
    # alternating call/response with unique texts → a pair per call turn,
    # capped at 100, densely numbered
    assert len(hot) == 100
    assert sorted(hot["example_idx"]) == list(range(100))
    # non-hot conversations also emit (9 pairs each for 20 turns) — spot check
    assert (out[out["conv_id"] != "conv-hot"].groupby("conv_id").size() > 0).any()


def test_curate_keyed_single_exchange_plan(spark, transcripts_df):
    """The session-keyed variant (streaming foreachBatch path) keeps the
    same scale-critical shape: one shuffle, zero joins — window_start in
    every key is a refinement of conv_id, so HashPartitioning(conv_id)
    still satisfies all clustering requirements."""
    import re

    from pyspark.sql import functions as F

    from data_harvesting_spark.config import HarvestConfig
    from data_harvesting_spark.operators.curate import curate_keyed

    sess = transcripts_df.withColumn("window_start", F.lit("2026-01-01").cast("timestamp"))
    plan = (
        curate_keyed(sess, HarvestConfig())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"\bExchange ", plan)) == 1, plan
    assert not re.search(r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin", plan)


def test_curate_empty_input(spark):
    """Empty transcripts produce an empty curated frame with the right
    schema — no crash anywhere in the window stack."""
    from data_harvesting_spark.config import HarvestConfig
    from data_harvesting_spark.operators.curate import curate
    from data_harvesting_spark.operators.curate_sessions import curate_sessions
    from data_harvesting_spark.schema import TRANSCRIPT_SCHEMA

    empty = spark.createDataFrame([], schema=TRANSCRIPT_SCHEMA)
    out = curate(empty, HarvestConfig())
    assert out.count() == 0
    assert "example_idx" in out.columns
    assert curate_sessions(empty, HarvestConfig()).count() == 0


def test_curate_keyed_sessionized_single_exchange_plan(spark, transcripts_df):
    """The FULL sessionize → curate_keyed stack (the session-window
    runner's per-batch body) must also be ONE shuffle, ZERO joins in
    conversation scope (the constant-window_start variant above pins the
    curate_keyed half alone): the
    up-front repartition(conv_id) satisfies the session-keyed dedup agg,
    the per-tool windows, AND the conversation-scope cap window (all key
    supersets or equal), so no further exchange may appear."""
    import re

    from pyspark.sql import functions as F

    from data_harvesting_spark.config import HarvestConfig
    from data_harvesting_spark.operators.curate import curate_keyed
    from data_harvesting_spark.operators.sessionize import sessionize

    sess = sessionize(transcripts_df, gap_seconds=1800).select(
        "conv_id", "window_start", "turn_idx", "role", "text", "tool", "ts"
    )
    # count exchanges of curate_keyed ON TOP of an already-clustered input
    # (sessionize itself shuffles once on conv_id; its output partitioning
    # must be reused by everything downstream)
    plan = (
        curate_keyed(sess, HarvestConfig())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"\bExchange ", plan)) == 1, plan
    assert not re.search(r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin", plan)
