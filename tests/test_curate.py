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
