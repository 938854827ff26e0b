"""Dimension mapping / translation / bucketing operators (J1, J2, P13, P14).

Reference equivalents:
- J2 cross-model class mapping (`projects/helmet/helmet_project.py:57-102`):
  name-keyed id remap between models → broadcast hash join against a tiny
  dimension table (never a shuffle).
- P13 label translation (`utils/TranslateObject.py:1-23`): chained if-renames
  → CASE WHEN chain (constant-folded by Catalyst).
- P14 HLS→color bucketing (`utils/ColorDetector.py:122-189`): numeric range
  bucketing → nested CASE WHEN.
- J1 multi-model merge (`condition.py:54-61`): union of enrichment passes on
  the same key space, canonical labels from pass 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

# P13 — the reference's translate table, re-keyed for tools
# (`utils/TranslateObject.py` renames person→pedestrian, truck→lorry, ...).
TOOL_TRANSLATIONS = {
    "search": "web_search",
    "browser": "web_browse",
    "python": "code_exec",
    "calculator": "math_eval",
    "sql": "db_query",
}


def translate_tool(col: str = "tool") -> Column:
    """CASE WHEN chain; unknown names pass through unchanged."""
    expr = None
    c = F.col(col)
    for src, dst in TOOL_TRANSLATIONS.items():
        expr = F.when(c == src, dst) if expr is None else expr.when(c == src, dst)
    return expr.otherwise(c)


def tool_dimension(spark) -> DataFrame:
    """J2 — tiny dimension table for broadcast mapping."""
    rows = [(k, v, i) for i, (k, v) in enumerate(sorted(TOOL_TRANSLATIONS.items()))]
    return spark.createDataFrame(rows, "tool string, canonical string, tool_id int")


def remap_tools_broadcast(transcripts: DataFrame, dim: DataFrame) -> DataFrame:
    """J2 — broadcast hash join against the mapping dimension; misses keep
    null canonical (reference returns None on miss,
    `projects/helmet/helmet_project.py:102`)."""
    return transcripts.join(F.broadcast(dim), "tool", "left")


def bucketize(col: Column | str, edges: list[float], labels: list[str]) -> Column:
    """P14 — numeric range bucketing as a nested CASE WHEN.
    len(labels) == len(edges) + 1; edges ascending; bucket i is
    (edges[i-1], edges[i]]."""
    assert len(labels) == len(edges) + 1
    c = F.col(col) if isinstance(col, str) else col
    expr = F.when(c <= edges[0], labels[0])
    for i in range(1, len(edges)):
        expr = expr.when(c <= edges[i], labels[i])
    return expr.otherwise(labels[-1])


def multi_enricher_union(transcripts: DataFrame, dim: DataFrame) -> DataFrame:
    """J1 — two enrichment passes over the same turns, unioned; pass 0 is
    canonical (reference merges N models' boxes with model-0 labels,
    `condition.py:54-61`)."""
    pass0 = transcripts.select(
        "conv_id", "turn_idx", F.lit(0).alias("enricher"),
        F.col("tool").alias("label"),
    ).where(F.col("label").isNotNull())
    pass1 = (
        remap_tools_broadcast(transcripts, dim)
        .select(
            "conv_id", "turn_idx", F.lit(1).alias("enricher"),
            F.col("canonical").alias("label"),
        )
        .where(F.col("label").isNotNull())
    )
    return pass0.unionByName(pass1)
