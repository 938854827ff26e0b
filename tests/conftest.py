from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from data_harvesting_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_df(spark):
    """Engine-generated fixture transcripts (FIXTURES.md shapes)."""
    from data_harvesting_spark.generator import generate_transcripts
    from data_harvesting_spark.schema import TRANSCRIPT_SCHEMA

    pdf = generate_transcripts(n_convs=60, seed=42)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def duck_on_sf(sql: str, sf_dir: str):
    """Run oracle SQL with driver-style registered views over sf parquet."""
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()
