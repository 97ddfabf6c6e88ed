"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — one scan, JVM-side dot products
(F.aggregate/zip_with), a single top-k (orderBy + limit is optimized to
TakeOrdered: per-partition heap, no full sort shuffle).

Scale path: IVF-style coarse quantization — assign every vector to its
nearest of C centroids (one scan), search only the probed cells.  The
centroids come from a deterministic sample k-means run on the driver
(sample ≪ data; the assignment pass is pure Column math inlined as
literals, i.e. an implicit broadcast).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jesse_spark.operators.dedup import _dot, _norm


def _unit(vec: list[float]) -> list[float]:
    a = np.asarray(vec, dtype=np.float64)
    n = np.linalg.norm(a)
    return (a / n).tolist() if n > 0 else a.tolist()


def brute_force_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: (id, cosine), descending."""
    q = F.lit(_unit(query)).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    cos = (_dot(v, q) / _norm(v)).alias("cosine")
    return (
        df.select(F.col(id_col).alias("id"), cos)
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str,
    *,
    n_cells: int = 16,
    sample: int = 2048,
    iters: int = 10,
    seed: int = 42,
) -> list[list[float]]:
    """Tiny driver-side k-means on a deterministic sample (sort-by-id
    sample keeps it reproducible across parallelism levels)."""
    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias("v"))
        .limit(sample)
        .collect()
    )
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        d = X @ C.T
        assign = np.argmax(d, axis=1)
        for c in range(len(C)):
            m = X[assign == c]
            if len(m):
                v = m.mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C.tolist()


def _cell_assignment(vec: Column, centroids: list[list[float]]) -> Column:
    """argmax cell id as a Column expression (centroids inlined)."""
    v = vec.cast("array<double>")
    scores = F.array(*[_dot(v, F.lit(c).cast("array<double>")) for c in centroids])
    return F.array_position(scores, F.array_max(scores)) - 1


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    *,
    centroids: list[list[float]],
    n_probe: int = 4,
    k: int = 10,
) -> DataFrame:
    """Search only the n_probe cells nearest the query.  The cell filter
    prunes before the expensive full-dimension dot product; on a
    cell-partitioned (bucketed) table it becomes partition pruning."""
    qu = np.asarray(_unit(query))
    C = np.asarray(centroids)
    order = np.argsort(-(C @ qu))[:n_probe]
    probe = [int(i) for i in order]
    cell = _cell_assignment(F.col(vec_col), centroids)
    q = F.lit(list(qu)).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    return (
        df.withColumn("_cell", cell)
        .filter(F.col("_cell").isin(probe))
        .select(F.col(id_col).alias("id"), (_dot(v, q) / _norm(v)).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )
