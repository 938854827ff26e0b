"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship curate query on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator for the
DuckDB side-by-side correctness gate (see data_harvesting_spark/plans/catalog.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from data_harvesting_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.spark_queries()["curate_pairs"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible query."""
    return catalog.oracle_queries()
