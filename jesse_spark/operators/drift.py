"""Distribution drift between two table snapshots (north_star; no jesse
analog — SURVEY.md §2.5).

Numeric columns: two-sample Kolmogorov-Smirnov statistic + Population
Stability Index computed from ``approxQuantile`` histograms — each side
is ONE sketch pass; the statistic itself is driver-side math over ≤ a
few hundred bin edges (tiny, never a distributed op).

Categorical columns: PSI over the two frequency tables (one groupBy
each, joined on category).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-6


def _hist(df: DataFrame, col: str, edges: list[float]) -> list[float]:
    """Bucket counts via ONE aggregate of width_bucket-style CASE —
    no shuffle beyond the single-row agg."""
    bucket = F.lit(0)
    for i, e in enumerate(edges):
        bucket = bucket + (F.col(col) > F.lit(e)).cast("int")
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    out = [0.0] * (len(edges) + 1)
    for r in counts:
        out[min(int(r["bucket"]), len(edges))] = float(r["n"])
    return out


def numeric_drift(
    a: DataFrame,
    b: DataFrame,
    col: str,
    *,
    bins: int = 20,
    rel_err: float = 0.001,
) -> dict:
    """Returns {'ks': float, 'psi': float, 'bins': int}.

    Bin edges come from the pooled approxQuantile sketch of side A (the
    baseline snapshot), so both sides are bucketed identically."""
    probs = [i / bins for i in range(1, bins)]
    edges = a.stat.approxQuantile(col, probs, rel_err)
    edges = sorted(set(edges))
    ha = _hist(a, col, edges)
    hb = _hist(b, col, edges)
    ta, tb = sum(ha) or 1.0, sum(hb) or 1.0
    pa = [x / ta for x in ha]
    pb = [x / tb for x in hb]
    # KS = max |CDF_a - CDF_b| over the shared bin grid
    ks, ca, cb = 0.0, 0.0, 0.0
    for x, y in zip(pa, pb):
        ca += x
        cb += y
        ks = max(ks, abs(ca - cb))
    psi = sum(
        (x - y) * math.log((x + _EPS) / (y + _EPS)) for x, y in zip(pa, pb)
    )
    return {"ks": ks, "psi": psi, "bins": len(edges) + 1}


def categorical_psi(a: DataFrame, b: DataFrame, col: str) -> float:
    """PSI over category frequency tables (one groupBy per side; the
    join is over #categories rows — broadcast)."""
    fa = a.groupBy(F.col(col).alias("cat")).agg(F.count(F.lit(1)).alias("na"))
    fb = b.groupBy(F.col(col).alias("cat")).agg(F.count(F.lit(1)).alias("nb"))
    rows = fa.join(fb, on="cat", how="full_outer").fillna(0).collect()
    ta = sum(r["na"] for r in rows) or 1.0
    tb = sum(r["nb"] for r in rows) or 1.0
    return sum(
        (r["na"] / ta - r["nb"] / tb)
        * math.log((r["na"] / ta + _EPS) / (r["nb"] / tb + _EPS))
        for r in rows
    )
