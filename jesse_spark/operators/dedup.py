"""Deduplication operators for training-data pipelines.

No jesse analog (its uniqueItems is per-array); these are the
table-scale dedup family a 100 TB corpus needs.  All of them are pure
DataFrame plans built from JVM-side expressions — the MinHash/SimHash
signatures are higher-order-function expressions over shingle arrays,
never Python loops.

Scale notes:
- exact dedup shuffles one (hash, id) pair per row with map-side
  combine; the full text never shuffles.
- MinHash-LSH shuffles one (band, band_hash, id) triple per row per
  band (b × n rows of a few bytes), then joins only within buckets —
  the classic sub-quadratic near-dup plan.
- candidate verification (exact Jaccard) touches only candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# normalization + shingling (shared by minhash / jaccard / fingerprint)
# ---------------------------------------------------------------------------
def normalized(text: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def shingles(text: Column, k: int = 5) -> Column:
    """Distinct character k-shingles as an array<string> — built with
    sequence+transform (JVM, no UDF).

    NOTE: ``substr(i, k)`` on a UTF8String seeks from the start (O(i)),
    so naive shingling is O(n²) per row.  Prefer :func:`with_shingles`,
    which stages a char array and slices it (O(n·k))."""
    t = normalized(text)
    n = F.greatest(F.length(t) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: t.substr(i, F.lit(k)))
    )


def with_shingles(df: DataFrame, text_col: str, *, k: int = 5,
                  mode: str = "char", out: str = "sh") -> DataFrame:
    """Stage shingles as a column: char array first (one split per
    row), then O(k) slices — avoids both the O(n²) substr seek and
    CollapseProject re-evaluation."""
    if mode == "token":
        return df.withColumn(out, token_shingles(F.col(text_col), max(k // 2, 2)))
    d = df.withColumn("_chars", F.split(normalized(F.col(text_col)), ""))
    n = F.greatest(F.size(F.col("_chars")) - (k - 1), F.lit(1))
    d = d.withColumn(
        out,
        F.array_distinct(F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws("", F.slice(F.col("_chars"), i, k)),
        )),
    )
    return d.drop("_chars")


def token_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams."""
    toks = F.split(F.trim(normalized(text)), " ")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), cnt - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


# ---------------------------------------------------------------------------
# 1. exact dedup
# ---------------------------------------------------------------------------
def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical (post-normalization) texts:
    (text_hash, dup_count, ids).  Shuffles (hash, id) only."""
    h = F.md5(normalized(F.col(text_col))).alias("text_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"),
             F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.col("dup_count") > 1)
    )


def drop_exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the min-id representative of each text group — one shuffle
    on the text hash (row_number over hash window)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(normalized(F.col(text_col)))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# 2. MinHash + LSH banding
# ---------------------------------------------------------------------------
def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       *, num_perm: int = 64, k: int = 5,
                       shingle_mode: str = "char") -> DataFrame:
    """(id, sig: array<int>) — num_perm minhashes.  Each "permutation"
    j is the murmur3 hash seeded by j (F.hash(x, lit(j))) — min over
    the shingle set.  Pure JVM expression tree.

    IMPORTANT plan shape: shingling and the signature are materialized
    in SEPARATE projections.  The shingle array is an expensive
    expression referenced num_perm times; keeping it behind a
    projection boundary stops CollapseProject from re-inlining (and
    thus re-evaluating) it once per permutation."""
    sh = with_shingles(df.select(F.col(id_col).alias("id"), F.col(text_col)),
                       text_col, k=k, mode=shingle_mode).select("id", "sh")
    return sh.select(
        "id",
        F.array(*[
            F.array_min(F.transform(F.col("sh"), lambda s, j=j: F.hash(s, F.lit(j))))
            for j in range(num_perm)
        ]).alias("sig"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    shingle_mode: str = "char",
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b, band votes).

    rows_per_band = num_perm // bands; two docs collide when one full
    band of their signatures matches.  Plan: project shingles → project
    signature → explode bands → groupBy (band, band_hash) → self-pair
    inside buckets."""
    assert num_perm % bands == 0
    r = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, num_perm=num_perm, k=k,
                              shingle_mode=shingle_mode)
    banded = sigs.select(
        "id",
        F.posexplode(
            F.array(*[
                F.xxhash64(F.concat_ws(",", *[
                    F.element_at(F.col("sig"), b * r + i + 1).cast("string")
                    for i in range(r)
                ]))
                for b in range(bands)
            ])
        ).alias("band", "band_hash"),
    )
    buckets = (
        banded.groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
        # cap pathological buckets (all-identical spam): 1k ids → 500k pairs
        .withColumn("ids", F.slice("ids", 1, 1000))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size("ids") - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, F.size("ids")),
                        lambda j: F.struct(
                            F.element_at(F.col("ids"), i).alias("id_a"),
                            F.element_at(F.col("ids"), j).alias("id_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("band_votes"))
    )


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.7,
    k: int = 5,
    shingle_mode: str = "char",
) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs only (two broadcast-able
    joins against the shingle projection)."""
    sh = with_shingles(df.select(F.col(id_col).alias("id"), F.col(text_col)),
                       text_col, k=k, mode=shingle_mode).select("id", "sh")
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    j = (
        candidates.join(a, "id_a").join(b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard", F.col("inter") / F.col("uni"))
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# 3. SimHash (64-bit) + hamming candidates
# ---------------------------------------------------------------------------
def simhash64(text: Column) -> Column:
    """64-bit SimHash of the token set: per bit, sum +1/-1 token votes;
    bit set when the sum is positive.  Built as one aggregate over the
    token array (JVM)."""
    toks = F.array_distinct(F.split(F.trim(normalized(text)), " "))
    # per-token 64-bit hash → per-bit vote vector, summed via aggregate
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda b: F.when(
                    F.call_function(
                        "shiftright", F.xxhash64(t), b.cast("int")
                    ).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(-1).cast("long")),
            ),
            lambda x, y: x + y,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(0), F.lit(63)),
            lambda v, b: F.when(
                v > 0,
                F.call_function("shiftleft", F.lit(1).cast("long"), b.cast("int")),
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_candidates(df: DataFrame, text_col: str, id_col: str,
                       *, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4 × 16-bit
    chunks (pigeonhole: hamming ≤ 3 ⇒ at least one chunk identical),
    bucket-join on (chunk_idx, chunk), verify exact hamming ≤ k via
    bit_count(xor)."""
    sh = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sim"))
    chunks = sh.select(
        "id", "sim",
        F.posexplode(F.array(*[
            F.shiftright(F.col("sim"), 16 * i).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ])).alias("chunk_idx", "chunk"),
    )
    a = chunks.select(F.col("id").alias("id_a"), F.col("sim").alias("sim_a"),
                      "chunk_idx", "chunk")
    b = chunks.select(F.col("id").alias("id_b"), F.col("sim").alias("sim_b"),
                      "chunk_idx", "chunk")
    pairs = (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )
    return pairs


# ---------------------------------------------------------------------------
# 4. embedding cosine near-dup (LSH over random hyperplanes)
# ---------------------------------------------------------------------------
def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature against fixed random hyperplanes (generated
    once on the driver with a fixed seed, inlined as literals —
    effectively a broadcast of the projection matrix)."""
    bits = [
        F.when(_dot(vec, F.lit(p).cast("array<double>")) >= 0, F.lit(1)).otherwise(F.lit(0))
        for p in planes
    ]
    sig = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        sig = sig.bitwiseOR(F.shiftleft(b.cast("long"), i))
    return sig


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    dim: int,
    n_planes: int = 16,
    min_cosine: float = 0.95,
    seed: int = 42,
) -> DataFrame:
    """Bucket by hyperplane signature, exact cosine within buckets."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).tolist()
    sig = hyperplane_signature(F.col(vec_col).cast("array<double>"), planes)
    tagged = df.select(F.col(id_col).alias("id"),
                       F.col(vec_col).cast("array<double>").alias("v"),
                       sig.alias("bucket"))
    a = tagged.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "bucket")
    b = tagged.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
        .distinct()
    )
