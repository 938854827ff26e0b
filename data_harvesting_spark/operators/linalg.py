"""Distributed linear-algebra primitives over embedding columns.

Power iteration for the top principal component, expressed as the
classic distributed allreduce loop: every pass over the data is a Spark
aggregation (map-side partial sums, one 64-key shuffle), and the only
driver-side state is the current d-vector estimate — exactly the shape
MLlib's RowMatrix/ARPACK drivers use, and the only shape that works when
the matrix is 100 TB tall but d is small. No per-row Python anywhere:
the per-row dot product is a JVM ``aggregate(zip_with(...))`` expression
riding the scan.

Reference provenance: the reference's embedding post-processing is the
per-object color-centroid step (`/root/reference/utils/ColorDetector.py:
93-119`); PCA-whitening of embedding batches is its training-data analog
(dominant-direction extraction instead of dominant-color).

Scale notes (n rows × d dims, d ≪ n, e.g. d=64):
- The centered matrix is NEVER materialized wide: centering folds into
  the same ``zip_with`` expression, so each iteration is one scan of the
  raw vectors + one d-key hash aggregate (partial aggregation makes the
  shuffle O(partitions × d), independent of n).
- Driver traffic per iteration is 2·d doubles (collect w, broadcast v) —
  the allreduce pattern; nothing row-shaped ever reaches the driver.
- Fixed iteration count, deterministic init (uniform 1/√d) → identical
  results under retry/replay, and the whole loop is SQL-unrollable,
  which is what the catalog oracle does.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_with(vec_col: str, coeffs: list[float]):
    """JVM column: dot(vec, coeffs) — aggregate(zip_with(·,·,*)) keeps the
    whole product inside whole-stage codegen."""
    lit = F.array(*[F.lit(float(c)) for c in coeffs])
    return F.aggregate(
        F.zip_with(F.col(vec_col), lit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, y: acc + y,
    )


def pca_power_top(
    emb: DataFrame, vec_col: str = "v", n_iter: int = 3
) -> DataFrame:
    """Top principal component of ``emb[vec_col]`` via ``n_iter`` power-
    iteration steps: v ← normalize(Cov·v), Cov·v computed matrix-free as
    (1/n)·Σᵢ xcᵢ·(xcᵢ·v) with xc the mean-centered rows.

    Deterministic: init v₀ = 1/√d (uniform), fixed ``n_iter``, so the
    result is a pure function of the input — replay/retry safe, and the
    catalog oracle unrolls the identical arithmetic in SQL.

    Returns one row per dimension: (dim_idx int, pc1 double, eigval
    double), pc1 sign-fixed so the largest-|w| dimension is positive
    (eigenvectors are sign-ambiguous; both engines pick the same sign),
    eigval = ‖Cov·v_{last}‖ (the power-iteration eigenvalue estimate).
    All but the final step collect only the d-vector (the allreduce);
    the final step's normalization and sign fix stay in Spark so the
    returned DataFrame is computed by the engine end to end.
    """
    first = emb.select(F.col(vec_col).alias("v")).first()
    if first is None:
        raise ValueError("pca_power_top: empty input")
    d = len(first["v"])

    stats = emb.select(
        F.count(F.lit(1)).alias("n"),
        *[F.avg(F.element_at(vec_col, i + 1)).alias(f"m{i}") for i in range(d)],
    ).first()
    n = stats["n"]
    mu = [float(stats[f"m{i}"]) for i in range(d)]

    mu_lit = F.array(*[F.lit(m) for m in mu])
    xc = emb.select(
        F.zip_with(F.col(vec_col), mu_lit, lambda a, b: a - b).alias("xc")
    )

    v = [1.0 / math.sqrt(d)] * d
    w_df = None
    for it in range(n_iter):
        # one scan: s = xc·v rides the row, then a d-key hash aggregate
        w_df = (
            xc.select(_dot_with("xc", v).alias("s"), F.posexplode("xc").alias("dim", "val"))
            .groupBy("dim")
            .agg((F.sum(F.col("val") * F.col("s")) / F.lit(float(n))).alias("w"))
        )
        if it < n_iter - 1:
            rows = w_df.collect()  # d doubles — the allreduce step
            w = [0.0] * d
            for r in rows:
                w[r["dim"]] = r["w"]
            nrm = math.sqrt(sum(c * c for c in w))
            v = [c / nrm for c in w]

    norm_df = w_df.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    sgn_df = (
        w_df.orderBy(F.abs(F.col("w")).desc(), F.col("dim").asc())
        .limit(1)
        .select(F.when(F.col("w") < 0, -1.0).otherwise(1.0).alias("sgn"))
    )
    return (
        w_df.crossJoin(F.broadcast(norm_df))
        .crossJoin(F.broadcast(sgn_df))
        .select(
            F.col("dim").cast("int").alias("dim_idx"),
            F.round(F.col("sgn") * F.col("w") / F.col("nrm"), 6).alias("pc1"),
            F.round("nrm", 6).alias("eigval"),
        )
    )
