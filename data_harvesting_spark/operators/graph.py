"""Distributed graph analytics over similarity graphs — triangle
counting by degree orientation.

Triangles measure local clustering density: in a near-duplicate pair
graph (docs = nodes, near-dup decisions = edges) a high triangle count
around a doc means it sits inside a tight duplicate CLIQUE rather than
a chain of borderline pairs — the signal dedup QA uses to distinguish
template families from hash-collision noise. Completes the graph
family beside PageRank (plans/q_transcripts.py) and connected
components (operators/dedup.py).

Algorithm (Suri & Vassilvitskii 2011 / Cohen 2009 MapReduce triangle
counting): orient every undirected edge from its lower-(degree, id)
endpoint to the higher one. The orientation is acyclic and each
triangle has exactly ONE node with out-degree 2 in it (its
lowest-ranked corner), so joining the oriented wedge set (u→v1, u→v2,
rank v1 < rank v2) back against the oriented edges (v1→v2) counts each
triangle exactly once. Max out-degree after orientation is O(sqrt m),
which is what bounds the wedge blowup on hub nodes — the whole point
of orienting by degree instead of id.

Scale posture: two shuffled joins (wedges on u, closing edges on the
(v1, v2) pair) + one count aggregate — never an unoriented
neighborhood self-join, whose wedge count on a hub is O(deg^2) with no
sqrt bound. All arithmetic is exact integers.

Reference parity: the reference has no graph surface; the analog is
the duplicate-detection confidence sweep
(`/root/reference/services/harvest_service.py:166-214`) whose output
this measures the structure of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_counts(
    edges: DataFrame, a: str = "doc_a", b: str = "doc_b"
) -> DataFrame:
    """Per-node triangle participation counts over an undirected simple
    graph given as unique (a < b) edge rows. Returns ``(doc_id,
    n_triangles)`` for every node in at least one triangle; each
    triangle contributes 1 to each of its three corners.

    The edge list and the oriented edge list are eagerly
    localCheckpoint'ed (the ``assign_components`` precedent,
    operators/dedup.py): degree join, wedge self-join, and closing join
    all scan the SAME materialized edges instead of re-expanding the
    upstream pair-mining subtree once per reference — at 100 TB the
    oriented edge list is the artifact you persist once and probe
    threefold."""
    e = edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
    e = e.localCheckpoint(eager=True)
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    g = e.join(
        deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    # total order: rank(x) = (degree(x), x); orient low -> high
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = g.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(
            a_first,
            F.struct(F.col("db").alias("d"), F.col("b").alias("n")),
        )
        .otherwise(F.struct(F.col("da").alias("d"), F.col("a").alias("n")))
        .alias("rv"),
    )
    o = o.localCheckpoint(eager=True)
    w1 = o.select("u", F.col("v").alias("v1"), F.col("rv").alias("r1"))
    w2 = o.select("u", F.col("v").alias("v2"), F.col("rv").alias("r2"))
    wedges = (
        w1.join(w2, "u")
        .where(F.col("r1") < F.col("r2"))
        .select("u", "v1", "v2")
    )
    closing = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tris = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    corners = tris.select(
        F.explode(F.array("u", "v1", "v2")).alias("doc_id")
    )
    return corners.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
