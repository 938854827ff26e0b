"""A12 — per-group KMeans aggregate (the "expensive vectorized enrichment"
slot).

Reference: elbow-method KMeans over an object's pixels produces dominant
color centroids (`/root/reference/utils/ColorDetector.py:93-119,203-232`,
params `utils/VariableClass.py:56-63`). Graft analog: dominant embedding
centroids per group — KMeans over each group's vectors via
``applyInPandas`` (one Arrow batch per group, numpy-vectorized Lloyd's
iterations; no sklearn in this container, and the kernel is ~20 lines).

Scale notes: ``applyInPandas`` shuffles once on the group key; each group's
vectors must fit one executor's memory — callers with giant groups should
pre-sample per group (``rate_sample``-style) before clustering, which is
the reference's own shape (it clusters one object's cropped pixels, not
the full frame). Deterministic: fixed seed per group derived from the
group key, fixed iteration count (no data-dependent convergence test), so
resume/replay produce identical centroids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "group_key string, cluster_id int, n_members long, centroid array<double>, "
    "inertia double"
)


def _kmeans_numpy(x: np.ndarray, k: int, seed: int, n_iter: int = 20):
    """Plain Lloyd's: deterministic init (evenly-spaced by norm order),
    fixed iterations. Returns (labels, centroids, inertia)."""
    n = len(x)
    k = min(k, n)
    order = np.argsort(np.linalg.norm(x, axis=1), kind="stable")
    centroids = x[order[np.linspace(0, n - 1, k).astype(int)]].copy()
    labels = np.zeros(n, dtype=int)
    for _ in range(n_iter):
        d2 = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        labels = d2.argmin(axis=1)
        for j in range(k):
            m = labels == j
            if m.any():
                centroids[j] = x[m].mean(axis=0)
    inertia = float(((x - centroids[labels]) ** 2).sum())
    return labels, centroids, inertia


def _elbow_select(
    x: np.ndarray, k_min: int, k_max: int, seed: int, n_iter: int = 20
) -> tuple[int, dict]:
    """Elbow selection returning the chosen k AND the fits computed along
    the way (so callers never re-fit the winner). See ``elbow_k``."""
    k_hi = min(k_max, len(x))
    if k_hi <= k_min:
        k = max(1, min(k_min, len(x)))
        return k, {k: _kmeans_numpy(x, k, seed, n_iter)}
    ks = list(range(k_min, k_hi + 1))
    fits = {k: _kmeans_numpy(x, k, seed, n_iter) for k in ks}
    inertias = [float(fits[k][2]) for k in ks]
    i0, i1 = inertias[0], inertias[-1]
    if i0 <= i1 or i0 == 0:
        return k_min, fits
    best_k, best_d = ks[0], -1.0
    for k, inr in zip(ks, inertias):
        # vertical distance below the chord, on a normalized inertia scale
        chord = i0 + (i1 - i0) * (k - ks[0]) / (ks[-1] - ks[0])
        d = (chord - inr) / i0
        if d > best_d:
            best_k, best_d = k, d
    return best_k, fits


def elbow_k(
    x: np.ndarray,
    k_min: int = 1,
    k_max: int = 8,
    seed: int = 42,
    n_iter: int = 20,
) -> int:
    """Elbow-method k selection (reference semantics: KMeans over
    min_clusters..max_clusters, pick the inertia-curve knee —
    `/root/reference/utils/ColorDetector.py:93-119` via
    ColorPrediction.find_main_colors).

    Deterministic knee: the k whose (k, inertia) point lies farthest below
    the chord from (k_min, inertia_min) to (k_max, inertia_max). Degenerate
    curves (flat inertia — e.g. identical points) fall back to k_min.
    """
    return _elbow_select(x, k_min, k_max, seed, n_iter)[0]


def cluster_groups(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    k: int = 4,
    seed: int = 42,
    k_mode: str = "fixed",
    k_min: int = 1,
    k_max: int = 8,
    n_iter: int = 20,
    order_col: str | None = None,
) -> DataFrame:
    """Per-group KMeans: one row per (group, cluster) with centroid +
    member count + total inertia — the A4/A5 "dominant mode" shape over
    continuous vectors. ``k_mode='elbow'`` selects k per group by the
    deterministic elbow over [k_min, k_max] (reference semantics);
    ``'fixed'`` uses ``k``. ``order_col`` (e.g. a row id) pre-sorts each
    group so the norm-order init breaks exact-norm ties deterministically
    — required when the result must be engine-reproducible (the unrolled
    SQL oracle); without it ties fall back to Arrow arrival order."""

    sel = [F.col(group_col), F.col(vec_col)] + (
        [F.col(order_col)] if order_col else []
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        key = str(pdf[group_col].iloc[0])
        if order_col is not None:
            pdf = pdf.sort_values(order_col, kind="mergesort")
        x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        if k_mode == "elbow":
            kk, fits = _elbow_select(x, k_min, k_max, seed, n_iter)
            labels, centroids, inertia = fits[kk]  # reuse the elbow's fit
        else:
            labels, centroids, inertia = _kmeans_numpy(x, k, seed, n_iter)
        rows = []
        for j in range(len(centroids)):
            m = labels == j
            if not m.any():
                continue
            rows.append(
                {
                    "group_key": key,
                    "cluster_id": j,
                    "n_members": int(m.sum()),
                    "centroid": centroids[j].tolist(),
                    "inertia": inertia,
                }
            )
        return pd.DataFrame(rows)

    return (
        df.select(*sel)
        .groupBy(group_col)
        .applyInPandas(fit, schema=_OUT_SCHEMA)
    )
