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
        # same staging discipline as char mode: materialize the token
        # array behind a projection boundary so each n-gram slice is
        # O(n-gram) over a bound attribute.  Inlining token_shingles
        # directly re-evaluates the full regexp_replace+split chain for
        # EVERY position (the split sits inside the transform lambda) —
        # O(len²) per row, measured 2.5-3.5 s over 50k docs at sf1.0
        # for what is a ~0.3 s linear pass.
        n_gram = max(k // 2, 2)
        d = df.withColumn("_toks", F.split(F.trim(normalized(F.col(text_col))), " "))
        cnt = F.greatest(F.size(F.col("_toks")) - (n_gram - 1), F.lit(1))
        d = d.withColumn(
            out,
            F.array_distinct(F.transform(
                F.sequence(F.lit(0), cnt - 1),
                lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, n_gram)),
            )),
        )
        return d.drop("_toks")
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


def hashed_shingles(df: DataFrame, text_col: str, *, k: int = 5,
                    mode: str = "char", out: str = "shh") -> DataFrame:
    """Distinct xxhash64'd shingles as ``array<long>`` — the slices are
    hashed DIRECTLY (``xxhash64(slice(parts, i, n))``) instead of built
    into strings first, skipping the per-position concat_ws allocation
    and distinct-ing longs instead of strings (~25% cheaper, measured
    at sf1.0).  For consumers that only compare shingle SETS (jaccard —
    a count ratio), this is equivalent to hashing the string form:
    slice ↔ string is 1-1 (tokens contain no separator; char elements
    are single chars), so set sizes and intersections match unless two
    distinct shingles collide in 64 bits (~1e-16 per pair).  NOT for
    minhash_signatures, whose ``hash(string, i)`` values are pinned
    bit-for-bit.

    Null/empty texts keep the string formulation's degenerate set: the
    split is coalesced to ``[""]``, so every such doc yields the same
    single-element set (mirroring concat_ws(NULL) → "")."""
    if mode == "token":
        n_gram = max(k // 2, 2)
        d = df.withColumn("_parts", F.coalesce(
            F.split(F.trim(normalized(F.col(text_col))), " "),
            F.array(F.lit(""))))
        cnt = F.greatest(F.size(F.col("_parts")) - (n_gram - 1), F.lit(1))
        hashed = F.transform(
            F.sequence(F.lit(0), cnt - 1),
            lambda i: F.xxhash64(F.slice(F.col("_parts"), i + 1, n_gram)))
    else:
        d = df.withColumn("_parts", F.coalesce(
            F.split(normalized(F.col(text_col)), ""), F.array(F.lit(""))))
        n = F.greatest(F.size(F.col("_parts")) - (k - 1), F.lit(1))
        hashed = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.xxhash64(F.slice(F.col("_parts"), i, k)))
    return d.withColumn(out, F.array_distinct(hashed)).drop("_parts")


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
def exact_duplicates(df: DataFrame, text_col: str, id_col: str, *,
                     max_ids: int = 100) -> DataFrame:
    """Groups of byte-identical (post-normalization) texts:
    (text_hash, dup_count, min_id, ids).  Shuffles (hash, id) only.

    ``ids`` is a bounded SAMPLE (the ``max_ids`` smallest ids), not the
    full membership: a degenerate corpus where billions of rows share
    one hash must not materialize them all in a single aggregation
    buffer.  Membership is capped BEFORE aggregation via a row_number
    window (the window sort spills to disk; a collect_list buffer does
    not), so executor memory stays bounded no matter how hot the group."""
    from pyspark.sql import Window

    w = Window.partitionBy("text_hash").orderBy("id")
    tagged = (
        df.select(F.md5(normalized(F.col(text_col))).alias("text_hash"),
                  F.col(id_col).alias("id"))
        .withColumn("_rn", F.row_number().over(w))
    )
    return (
        tagged.groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"),
             F.min("id").alias("min_id"),
             F.sort_array(F.collect_list(
                 F.when(F.col("_rn") <= max_ids, F.col("id")))).alias("ids"))
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
# shared: capped bucket → pair explosion
# ---------------------------------------------------------------------------
def bucket_pairs(buckets: DataFrame, ids_col: str = "ids") -> DataFrame:
    """Explode a bucketed id-list column into ordered (id_a < id_b)
    pairs.  The caller is expected to have capped the list (slice) so a
    pathological hot bucket cannot go quadratic — this is the one shape
    shared by every LSH family (MinHash bands, SimHash chunks,
    hyperplane buckets)."""
    ids = F.col(ids_col)
    return buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size(ids) - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, F.size(ids)),
                        lambda j: F.struct(
                            F.element_at(ids, i).alias("id_a"),
                            F.element_at(ids, j).alias("id_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")


def _capped_id_buckets(tagged: DataFrame, key_cols: list[str], *,
                       max_bucket: int) -> DataFrame:
    """Bucket key → sorted id list of AT MOST max_bucket ids.

    Membership is capped BEFORE the aggregation: a row_number window
    over the bucket key (ordered by id — keeps the survivor set the
    deterministic min ids) filtered to ``<= max_bucket``, then the
    bounded collect.  The window's sort is spillable; an uncapped
    ``collect_list`` buffer on a degenerate hot bucket (billions of
    identical texts → one bucket) is a single-reducer OOM at 100 TB."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy("id")
    capped = tagged.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_bucket)
    return (
        capped.groupBy(*key_cols)
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )


def capped_bucket_pairs(tagged: DataFrame, key_cols: list[str], *,
                        max_bucket: int) -> DataFrame:
    """Ordered (id_a < id_b) pairs of ids sharing a bucket key, capped
    at ``max_bucket`` members per bucket — the codegen formulation of
    ``bucket_pairs(_capped_id_buckets(...))``.

    Same cap discipline (row_number window ordered by id keeps the
    deterministic min-id survivors), but pairs come from a within-bucket
    self-join with ``id_a < id_b`` instead of collect_list + nested
    transform/explode: the pair loop runs in whole-stage codegen rather
    than interpreted HOF lambdas, and the collect_list aggregation
    buffer disappears.  SHUFFLE_MERGE hint: spillable, never broadcast
    (bucket membership scales with the corpus).  Pair-set equality with
    the exploded formulation is pinned by tests/test_dedup_similarity.py
    and was verified at 735k (minhash, sf1.0) and 14.3M (hyperplane,
    10x-duplicated corpus) pair volumes — at the 14.3M volume this is
    ~2.4x faster; the ~400M-pair regime where AQE-coalesced SMJ pairing
    degenerated (see minhash_lsh_candidates) only arises with a true
    multi-permutation signature, which no caller ships."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy("id")
    capped = tagged.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_bucket).drop("_rn")
    x = capped.select(*key_cols, F.col("id").alias("id_a"))
    y = capped.select(*key_cols, F.col("id").alias("id_b"))
    return (
        x.hint("SHUFFLE_MERGE").join(y, key_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# 2. MinHash + LSH banding
# ---------------------------------------------------------------------------
def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       *, num_perm: int = 64, k: int = 5,
                       shingle_mode: str = "char") -> DataFrame:
    """(id, sig: array<int>) — the signature every round since r1 has
    shipped, computed once instead of num_perm times.

    HISTORICAL SEMANTICS, KEPT BIT-FOR-BIT (r6 finding): the original
    implementation passed a TWO-argument lambda
    (``lambda s, j=j: F.hash(s, F.lit(j))``) to ``F.transform``, so the
    second parameter was bound to the ELEMENT INDEX, shadowing the
    intended permutation id — every "permutation" evaluated the same
    ``min over shingles of hash(shingle, position)``, i.e. the
    signature is one positional min-hash repeated ``num_perm`` times.
    Every downstream surface (banding, capped buckets, verified pair
    sets, the DuckDB oracles, BENCH history) pins the pair sets this
    signature produces, and a true multi-permutation MinHash changes
    the candidate volume by ~two orders of magnitude at sf1.0 (every
    r=1 band of a duplicate cluster collides → ~400M raw pairs vs ~19M)
    — a recall/cost redesign that belongs to a build round, not an
    optimization round.  r6 therefore computes the single min ONCE
    (2-arg transform, explicit) and array_repeats it, which is
    expression-for-expression what the old code evaluated after CSE.
    """
    from jesse_spark.session import ensure_parallelism

    df = ensure_parallelism(df)  # hash-heavy per-row stage: use all cores
    sh = with_shingles(df.select(F.col(id_col).alias("id"), F.col(text_col)),
                       text_col, k=k, mode=shingle_mode).select("id", "sh")
    m = F.array_min(F.transform(F.col("sh"), lambda s, i: F.hash(s, i)))
    return sh.select("id", F.array_repeat(m, num_perm).alias("sig"))


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
    band of their signatures matches (with the historical repeated
    signature — see minhash_signatures — all bands carry the same
    value, so collision ⇔ equal positional min-hash).  Plan: project
    shingles → signature → explode bands → groupBy (band, band_hash) →
    self-pair inside capped buckets via :func:`capped_bucket_pairs`
    (codegen self-join).  CAUTION for a future true multi-permutation
    signature: at that candidate volume (~400M raw pairs at sf1.0) AQE
    coalesces the small bucket shuffle before the join explodes it and
    the vote aggregation falls back to sort-and-spill (measured >120 s
    in r6) — re-tune banding or disable coalescing for that regime
    before reusing this pairing."""
    assert num_perm % bands == 0
    r = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, num_perm=num_perm, k=k,
                              shingle_mode=shingle_mode)
    # Because the signature is one value repeated (see
    # minhash_signatures), every band's hash is identical, every band's
    # capped bucket holds the same member set in the same order, and a
    # pair therefore survives in ALL bands or NONE.  One bucket pass
    # over band 0 with band_votes = bands is bit-identical to exploding
    # all ``bands`` copies (r6: cuts the banding window from
    # bands×n rows to n and the HOF pair stream by the same factor;
    # equality with the exploded formulation is pinned by
    # tests/test_dedup_similarity.py).
    banded = sigs.select(
        "id",
        F.xxhash64(F.concat_ws(",", *[
            F.element_at(F.col("sig"), i + 1).cast("string")
            for i in range(r)
        ])).alias("band_hash"),
    )
    # cap pathological buckets (all-identical spam): 1k ids → 500k pairs
    return (
        capped_bucket_pairs(banded, ["band_hash"], max_bucket=1000)
        .groupBy("id_a", "id_b")
        .agg((F.count(F.lit(1)) * bands).alias("band_votes"))
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
    joins against the shingle projection).

    r6, two per-pair cost cuts:
    - |A∪B| is computed as |A|+|B|−|A∩B| (exact — the shingle arrays
      are array_distinct'd), removing the array_union set build;
    - the intersect runs over xxhash64'd shingles (array<long>), not
      the strings: long equality/hashing beats per-element UTF8String
      work and the joined rows carry ~8 bytes per shingle instead of
      the text.  Jaccard is a count ratio, so the value is unchanged
      unless two DISTINCT shingles of one pair collide in 64 bits
      (p ≈ n²/2·2⁻⁶⁴ ≈ 1e-16 per pair; output equality with the
      string-set formulation is verified against the DuckDB oracle on
      every correctness SF and pinned old-vs-new at sf1.0).  Late r6:
      the hashes come straight off the staged slices
      (:func:`hashed_shingles` — no per-position string build), ~25%
      off each side's projection; set equality with the string form is
      pinned by test."""
    from jesse_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    shh = hashed_shingles(
        df.select(F.col(id_col).alias("id"), F.col(text_col)),
        text_col, k=k, mode=shingle_mode).select(
        "id", F.col("shh"), F.size("shh").alias("sz"))
    a = shh.select(F.col("id").alias("id_a"), F.col("shh").alias("sh_a"),
                   F.col("sz").alias("_sz_a"))
    b = shh.select(F.col("id").alias("id_b"), F.col("shh").alias("sh_b"),
                   F.col("sz").alias("_sz_b"))
    j = (
        candidates.join(a, "id_a").join(b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.col("_sz_a") + F.col("_sz_b") - F.col("inter"))
        .withColumn("jaccard", F.col("inter") / F.col("uni"))
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# 3. SimHash (64-bit) + hamming candidates
# ---------------------------------------------------------------------------
def simhash64(text: Column, *, hash_fn: str = "md5") -> Column:
    """64-bit SimHash of the token set: per bit, sum +1/-1 token votes;
    bit set when the sum is positive.  Built as one aggregate over the
    token array (JVM).

    ``hash_fn``:
    - ``"md5"`` (default): bit b of a token's 64-bit hash is bit
      ``b % 4`` of hex digit ``b // 4`` of ``md5(token)``.  md5 is
      available in every engine, so the whole simhash — and therefore
      the near-dup pair set — is reproducible in ANSI SQL (the DuckDB
      oracle recomputes it bit-for-bit).
    - ``"xxhash64"``: one xxhash64 per token (cheapest; Spark-only).
    """
    toks = F.array_distinct(F.split(F.trim(normalized(text)), " "))
    if hash_fn == "xxhash64":
        tok_bits = F.transform(
            toks,
            lambda t: F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda b: F.call_function(
                    "shiftright", F.xxhash64(t), b.cast("int")
                ).bitwiseAND(F.lit(1)).cast("int"),
            ),
        )
    else:
        # 16 hex digits → 4 bits each (literal shifts keep this in
        # whole-stage codegen; one md5 per token, evaluated once)
        tok_bits = F.transform(
            toks,
            lambda t: F.flatten(
                F.transform(
                    F.transform(
                        F.slice(F.split(F.md5(t), ""), 1, 16),
                        lambda c: F.conv(c, 16, 10).cast("int"),
                    ),
                    lambda d: F.array(*[
                        F.shiftright(d, s).bitwiseAND(F.lit(1)) for s in range(4)
                    ]),
                )
            ),
        )
    # per-token bit vector → per-bit ±1 vote vector, summed via aggregate
    votes = F.aggregate(
        tok_bits,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, bits: F.zip_with(
            acc, bits, lambda x, y: x + 2 * y.cast("long") - 1
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


def _simhash_md5_exploded(df: DataFrame, text_col: str,
                          id_col: str) -> DataFrame:
    """(id, sim) via explode + 64 scalar conditional sums — bit-for-bit
    :func:`simhash64` with ``hash_fn="md5"`` (pinned by test), ~30%
    faster: per token the column expression built two 64-element bit
    arrays plus a fold allocation, while this path computes 4 chunk
    ints from the md5 hex and lets a codegen HashAggregate keep the 64
    vote counters (bit b = bit ``4*(3-(b//4)%4)+b%4`` of chunk
    ``b//16``, i.e. bit b%4 of hex digit b//4 — the documented md5 bit
    mapping).  explode_outer dodges InferFiltersFromGenerate cloning
    the token expression into a pre-repartition single-task filter;
    null texts are dropped up front (their null signature could never
    produce a pair: null chunks match nothing downstream)."""
    toks = F.array_distinct(F.split(F.trim(normalized(F.col(text_col))), " "))
    t = (df.filter(F.col(text_col).isNotNull())
         .select(F.col(id_col).alias("id"), F.explode_outer(toks).alias("tok")))
    m = F.md5(F.col("tok"))
    t = t.select("id", *[
        F.conv(F.substring(m, 4 * c + 1, 4), 16, 10).cast("long").alias(f"_v{c}")
        for c in range(4)])
    aggs = [F.count(F.lit(1)).alias("_cnt")]
    for b in range(64):
        c, j = b // 16, (b // 4) % 4
        sh = 4 * (3 - j) + b % 4
        aggs.append(F.sum(F.shiftright(F.col(f"_v{c}"), sh)
                          .bitwiseAND(F.lit(1))).alias(f"_s{b}"))
    g = t.groupBy("id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(64):
        # vote_b = 2*ones_b - n_tokens; bit set when vote > 0
        sim = sim.bitwiseOR(
            F.when(F.col(f"_s{b}") * 2 > F.col("_cnt"),
                   F.lit(1 << b if b < 63 else -(1 << 63)).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return g.select("id", sim.alias("sim"))


def simhash_candidates(df: DataFrame, text_col: str, id_col: str,
                       *, max_hamming: int = 3, max_bucket: int = 1000,
                       hash_fn: str = "md5") -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4 × 16-bit
    chunks (pigeonhole: hamming ≤ 3 ⇒ at least one chunk identical),
    bucket on (chunk_idx, chunk), pair within capped buckets, verify
    exact hamming ≤ k via bit_count(xor).

    Buckets are capped at ``max_bucket`` ids (same discipline as the
    MinHash path): a degenerate corpus where thousands of near-empty
    texts collapse onto one chunk value stays bounded instead of going
    quadratic."""
    from jesse_spark.session import ensure_parallelism

    df = ensure_parallelism(df)  # 64-bit vote aggregate is CPU-heavy
    if hash_fn == "md5":
        sh = _simhash_md5_exploded(df, text_col, id_col)
    else:
        sh = df.select(F.col(id_col).alias("id"),
                       simhash64(F.col(text_col), hash_fn=hash_fn).alias("sim"))
    # carry sim (8 bytes) through the bucket rows: the signature is the
    # expensive expression — computing it once and shuffling it beats
    # joining the full table back twice for verification
    chunks = sh.select(
        "id", "sim",
        F.posexplode(F.array(*[
            F.shiftright(F.col("sim"), 16 * i).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ])).alias("chunk_idx", "chunk"),
    )
    # cap membership pre-aggregation (spillable window, bounded buffer —
    # the survivor set stays the deterministic min ids; Spark's
    # WindowGroupLimit pushes the row_number cap below the exchange)
    from pyspark.sql import Window

    w = Window.partitionBy("chunk_idx", "chunk").orderBy("id")
    capped = (chunks.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= max_bucket).drop("_rn"))
    # pair generation: a within-bucket SELF-JOIN instead of
    # collect_list + nested-transform explode.  The join's pair loop
    # runs in whole-stage codegen with the hamming filter inlined
    # (~2.3x at sf1.0: 6.5 s -> 2.9 s over 24M candidate pairs),
    # whereas higher-order-function lambdas are interpreted per pair
    # and materialize every candidate struct.  SHUFFLE_MERGE keeps the
    # pair loop spillable and off the broadcast path at 100 TB (the
    # capped bucket table scales with the corpus; both sides share one
    # exchange subtree, which AQE reuses at runtime).
    xor = F.col("sim_a").bitwiseXOR(F.col("sim_b"))
    a = capped.select("chunk_idx", "chunk", F.col("id").alias("id_a"),
                      F.col("sim").alias("sim_a"))
    b = capped.select("chunk_idx", "chunk", F.col("id").alias("id_b"),
                      F.col("sim").alias("sim_b"))
    return (
        a.hint("SHUFFLE_MERGE").join(b.hint("SHUFFLE_MERGE"),
                                     ["chunk_idx", "chunk"])
        .filter((F.col("id_a") < F.col("id_b"))
                & (F.bit_count(xor) <= max_hamming))
        .select("id_a", "id_b", F.bit_count(xor).alias("hamming"))
        .distinct()
    )


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


def hyperplane_buckets(vec: Column, planes_flat: Column,
                       n_tables: int, n_planes: int, dim: int) -> Column:
    """All tables' sign-bit buckets at once: ``array<long>`` of length
    ``n_tables``.  ``planes_flat`` is the row-major T×P×dim plane
    tensor as one flat array<double> column — shipped as a broadcast
    1-row DataFrame by the caller, NOT inlined as literals (16k lit()
    elements cost ~8 s of py4j driver time, and the unrolled per-plane
    expression tree costs seconds of janino compile).  Each plane is a
    runtime ``slice``; the dots run as ``aggregate`` loops, keeping
    whole-stage codegen small and the stage embarrassingly parallel."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_tables - 1)),
        lambda t: F.aggregate(
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            F.lit(0).cast("long"),
            lambda acc, p: acc.bitwiseOR(
                F.when(
                    _dot(vec, F.slice(planes_flat,
                                      (t * n_planes + p) * dim + 1, dim)) >= 0,
                    F.call_function("shiftleft", F.lit(1).cast("long"),
                                    p.cast("int")),
                ).otherwise(F.lit(0).cast("long"))
            ),
        ),
    )


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 16,
    min_cosine: float = 0.95,
    seed: int = 42,
    max_bucket: int = 2000,
) -> DataFrame:
    """Multi-table hyperplane LSH: ``n_tables`` independent sign-bit
    signatures of ``n_planes`` bits each; a pair is a candidate when it
    collides in ANY table (recall 1-(1-p^n_planes)^n_tables for
    per-plane agreement p = 1 - θ/π), then verified with exact cosine.

    Candidate rows carry ids only; vectors join back for verification —
    at 100 TB the bucket shuffle is (table, bucket, id) triples, never
    the embeddings.

    r6: the T·P sign-bit dot products per vector run as ONE numpy
    matmul per Arrow batch inside a pandas UDF (guide §4.2: hand whole
    batches to vectorized native code) instead of T·P interpreted
    aggregate/slice expressions per row — 2.9 s → ~0.4 s for the
    signature stage at sf1.0.  The plane tensor ships in the UDF
    closure (T·P·dim doubles, ~16 KB).  Sign stability: bucket bits
    flip only if a dot crosses 0 between numpy's and the JVM's
    summation order (|Δ| ≲ 1e-13 relative); the measured minimum |dot|
    on the fixture embeddings is ≥ 2e-10 across every SF, and the
    final output is re-verified with exact cosine either way.
    Malformed rows (null / wrong dimension) keep the old expression
    semantics: an all-zero bucket array."""
    import numpy as np
    import pandas as pd

    from jesse_spark.session import ensure_parallelism

    rng = np.random.default_rng(seed)
    tables = rng.standard_normal((n_tables, n_planes, dim))
    planes = tables.reshape(n_tables * n_planes, dim)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    def _hp_buckets_fn(vs):
        arrs = vs.tolist()
        out = [[0] * n_tables] * len(arrs)
        ok = [i for i, a in enumerate(arrs)
              if a is not None and len(a) == dim
              and not any(x is None for x in a)]
        if ok:
            x = np.asarray([arrs[i] for i in ok], dtype=np.float64)
            signs = (x @ planes.T) >= 0.0
            buckets = (signs.reshape(len(ok), n_tables, n_planes)
                       * weights).sum(axis=-1)
            for j, i in enumerate(ok):
                out[i] = [int(b) for b in buckets[j]]
        return pd.Series(out)

    # no type hints (module-level `from __future__ import annotations`
    # stringifies them, which the pandas-UDF type inferencer rejects);
    # the plain-function form defaults to a scalar series->series UDF
    _hp_buckets = F.pandas_udf(_hp_buckets_fn, returnType="array<long>")

    base = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"))
    sigs = base.select(
        "id",
        F.posexplode(_hp_buckets(F.col("v"))).alias("table_idx", "bucket"),
    )
    cand = capped_bucket_pairs(
        sigs, ["table_idx", "bucket"], max_bucket=max_bucket
    ).distinct()
    a = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .withColumn("cosine", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )
