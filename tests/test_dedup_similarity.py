"""Dedup family + ANN similarity operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jesse_spark.operators.dedup import (
    embedding_near_duplicates,
    exact_duplicates,
    drop_exact_duplicates,
    jaccard_verify,
    minhash_lsh_candidates,
    simhash_candidates,
)
from jesse_spark.operators.similarity import (
    brute_force_topk,
    build_ivf_index,
    ivf_search,
    ivf_topk,
    ivf_topk_exact,
    train_ivf_centroids,
    train_ivf_index,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm windowsill in the afternoon sun every single day"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    # 0/1: exact dups (modulo case/space); 2: near-dup of 0; 3-9: distinct
    rows.append((0, BASE))
    rows.append((1, BASE.upper() + "  "))
    rows.append((2, BASE.replace("lazy", "sleepy")))
    words = ["alpha bravo charlie delta echo foxtrot golf hotel india",
             "one morning the spaceship landed quietly behind the old barn",
             "financial markets closed higher after the announcement today",
             "recipe calls for flour sugar butter eggs vanilla and patience",
             "the committee voted unanimously to postpone the decision",
             "quantum entanglement cannot transmit information faster",
             "her garden grows tomatoes peppers basil and several herbs"]
    for i in range(3, 10):
        rows.append((i, words[i - 3] + f" unique tail {i}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    groups = exact_duplicates(docs, "text", "doc_id").collect()
    assert len(groups) == 1 and groups[0]["ids"] == [0, 1]
    kept = drop_exact_duplicates(docs, "text", "doc_id")
    assert kept.count() == 9  # one of the pair dropped
    assert kept.filter(F.col("doc_id") == 0).count() == 1


def test_exact_dedup_hot_group_bounded(spark):
    """100k identical texts in one group: the aggregation buffer must
    stay bounded — dup_count is exact, but the ids sample is capped at
    max_ids (membership filtered via spillable row_number BEFORE the
    collect; VERDICT r2 what's-wrong #1)."""
    rows = [(i, "exactly the same text") for i in range(100_000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    g = exact_duplicates(df, "text", "doc_id", max_ids=50).collect()
    assert len(g) == 1
    assert g[0]["dup_count"] == 100_000
    assert g[0]["min_id"] == 0
    assert g[0]["ids"] == list(range(50))


def test_minhash_hot_bucket_bounded(spark):
    """10k identical short texts: every band bucket collapses; the
    pre-aggregation cap keeps candidate pairs ≤ C(cap, 2) with min-id
    survivors instead of C(10k, 2)."""
    rows = [(i, "buy cheap pills now fast") for i in range(10_000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cand = minhash_lsh_candidates(df, "text", "doc_id", num_perm=16, bands=4,
                                  shingle_mode="token")
    # monkeypatch-free check: default cap is 1000 → ≤ C(1000,2) pairs
    pairs = cand.select("id_a", "id_b").collect()
    assert 0 < len(pairs) <= 1000 * 999 // 2
    assert max(max(r["id_a"], r["id_b"]) for r in pairs) < 1000


def test_hashed_shingles_set_equivalent_to_string_shingles(spark):
    """late r6 pins: hashed_shingles (xxhash64 of the staged slices)
    preserves shingle-SET structure — per-doc sizes and all pairwise
    intersection counts equal the string formulation's, including the
    degenerate null/empty/single-token docs and unicode — so jaccard
    over the hashed sets is bit-equal to jaccard over string sets."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from jesse_spark.operators.dedup import hashed_shingles, with_shingles

    rows = [(0, None), (1, ""), (2, "   "), (3, "one"),
            (4, "one two"), (5, "one two three one two"),
            (6, "One  Two THREE one two"),  # normalizes to overlap 5's
            (7, "héllo wörld héllo wörld again"), (8, "héllo wörld"),
            (9, "a b a b a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for mode in ("token", "char"):
        strs = {r["doc_id"]: set(r["sh"]) for r in with_shingles(
            df, "text", k=5, mode=mode, out="sh").select("doc_id", "sh")
            .collect()}
        hshs = {r["doc_id"]: set(r["shh"]) for r in hashed_shingles(
            df, "text", k=5, mode=mode).select("doc_id", "shh").collect()}
        for i in strs:
            assert len(strs[i]) == len(hshs[i]), (mode, i)
        for i, j in combinations(sorted(strs), 2):
            assert len(strs[i] & strs[j]) == len(hshs[i] & hshs[j]), \
                (mode, i, j)


def test_capped_bucket_pairs_equals_exploded_formulation(spark):
    """r6 pins: the codegen self-join pairing (capped_bucket_pairs)
    emits exactly the pair set of the historical collect_list +
    nested-transform explode, on multi-column bucket keys and with the
    cap binding (min-id survivors)."""
    import random

    from jesse_spark.operators.dedup import (_capped_id_buckets,
                                             bucket_pairs,
                                             capped_bucket_pairs)

    rng = random.Random(7)
    # 6 buckets across 2 key columns; one hot bucket of 40 ids (cap 10
    # binds), singleton buckets (emit nothing), ids inserted unsorted
    rows = [(t, b, i) for t in range(2) for b in range(3)
            for i in rng.sample(range(1000), {0: 40, 1: 7, 2: 1}[b])]
    rng.shuffle(rows)
    tagged = spark.createDataFrame(
        rows, "table_idx int, bucket int, id long")
    want = sorted(map(tuple, bucket_pairs(_capped_id_buckets(
        tagged, ["table_idx", "bucket"], max_bucket=10))
        .select("id_a", "id_b").collect()))
    have = sorted(map(tuple, capped_bucket_pairs(
        tagged, ["table_idx", "bucket"], max_bucket=10)
        .select("id_a", "id_b").collect()))
    assert want == have and len(have) == 2 * (10 * 9 // 2 + 7 * 6 // 2)
    assert all(a < b for a, b in have)


def test_minhash_candidates_match_exploded_band_formulation(spark):
    """r6 pins: (1) minhash_signatures reproduces the historical
    repeated positional-min signature bit-for-bit (the pre-r6 2-arg
    lambda bound the permutation id to the element index), and (2) the
    single-bucket-pass candidates equal the full bands-exploded
    formulation, band_votes included."""
    from pyspark.sql import functions as F

    from jesse_spark.operators.dedup import (_capped_id_buckets,
                                             bucket_pairs,
                                             minhash_signatures,
                                             with_shingles)
    from jesse_spark.session import ensure_parallelism

    rows = [(i, f"some shared text plus token{i % 7} and token{i % 3}")
            for i in range(300)] + [(900, "utterly different content here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    num_perm, bands, r = 32, 32, 1

    # (1) signature == historical expression (2-arg lambda: index wins)
    sh = with_shingles(
        ensure_parallelism(df).select(F.col("doc_id").alias("id"), "text"),
        "text", k=5, mode="token").select("id", "sh")
    legacy = sh.select("id", F.array(*[
        F.array_min(F.transform(F.col("sh"),
                                lambda s, j=j: F.hash(s, F.lit(j))))
        for j in range(num_perm)]).alias("sig"))
    got = minhash_signatures(df, "text", "doc_id", num_perm=num_perm,
                             shingle_mode="token")
    assert {r_["id"]: list(r_["sig"]) for r_ in legacy.collect()} == \
           {r_["id"]: list(r_["sig"]) for r_ in got.collect()}

    # (2) candidates == bands-exploded formulation over the same sigs
    banded = got.select("id", F.posexplode(F.array(*[
        F.xxhash64(F.concat_ws(",", *[
            F.element_at(F.col("sig"), b * r + i + 1).cast("string")
            for i in range(r)]))
        for b in range(bands)])).alias("band", "band_hash"))
    exploded = (bucket_pairs(
        _capped_id_buckets(banded, ["band", "band_hash"], max_bucket=1000))
        .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("band_votes")))
    want = {(r_["id_a"], r_["id_b"]): r_["band_votes"]
            for r_ in exploded.collect()}
    from jesse_spark.operators.dedup import minhash_lsh_candidates

    have = {(r_["id_a"], r_["id_b"]): r_["band_votes"]
            for r_ in minhash_lsh_candidates(
                df, "text", "doc_id", num_perm=num_perm, bands=bands,
                shingle_mode="token").collect()}
    assert want == have and len(have) > 0


def test_minhash_lsh_finds_near_dup(docs):
    cand = minhash_lsh_candidates(docs, "text", "doc_id", num_perm=32, bands=16)
    verified = jaccard_verify(cand, docs, "text", "doc_id", threshold=0.6)
    pairs = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert (0, 2) in pairs or (0, 1) in pairs
    # unrelated docs never verify
    assert all(a in (0, 1, 2) and b in (0, 1, 2) for a, b in pairs)


def test_simhash_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"])
             for r in simhash_candidates(docs, "text", "doc_id",
                                         max_hamming=6).collect()}
    assert (0, 1) in pairs or (0, 2) in pairs
    assert not any(a >= 3 or b >= 3 for a, b in pairs)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    # 20 = near-dup of 0
    rows.append((20, [float(x) for x in base[0] + rng.standard_normal(16) * 0.01]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_near_dups(vectors):
    pairs = embedding_near_duplicates(vectors, "embedding", "vec_id",
                                      dim=16, n_planes=8,
                                      min_cosine=0.99).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 20)}


def test_brute_force_topk_matches_numpy(vectors):
    rows = vectors.collect()
    X = np.array([r["embedding"] for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    q = X[0]
    cos = (X @ q) / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    exp = set(ids[np.argsort(-cos)[:5]].tolist())
    got = {r["id"] for r in
           brute_force_topk(vectors, "embedding", "vec_id", list(q), k=5).collect()}
    assert got == exp


def test_simhash_bucket_cap_bounded(spark):
    """10k near-identical short texts collapse onto the same simhash
    chunks; the bucket cap must keep the pair explosion bounded (here
    ≤ C(64,2)·4 pairs, not C(10k,2) ≈ 5·10^7)."""
    rows = [(i, "spam spam spam buy now") for i in range(10_000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = simhash_candidates(df, "text", "doc_id", max_hamming=3, max_bucket=64)
    n = out.count()
    assert 0 < n <= 64 * 63 // 2
    # survivors are the min ids (deterministic cap)
    ids = {r["id_a"] for r in out.collect()} | {r["id_b"] for r in out.collect()}
    assert max(ids) < 64


def test_simhash_exploded_sig_matches_column_expression(spark):
    """r6 pins: the explode + conditional-sum md5 signature is
    bit-for-bit simhash64(hash_fn='md5'), including empty strings and
    unicode tokens."""
    from jesse_spark.operators.dedup import (_simhash_md5_exploded,
                                             simhash64)

    rows = [(0, "the quick brown fox"), (1, ""), (2, "  spaced   out  "),
            (3, "тест слово при über naïve"), (4, "one"),
            (5, "a a a repeated a tokens a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {r["doc_id"]: r["sim"] for r in df.select(
        "doc_id", simhash64(F.col("text"), hash_fn="md5").alias("sim")).collect()}
    got = {r["id"]: r["sim"]
           for r in _simhash_md5_exploded(df, "text", "doc_id").collect()}
    assert want == got


def test_simhash_hash_fns_agree_on_clear_dups(docs):
    for fn in ("md5", "xxhash64"):
        pairs = {(r["id_a"], r["id_b"])
                 for r in simhash_candidates(docs, "text", "doc_id",
                                             max_hamming=6, hash_fn=fn).collect()}
        assert (0, 1) in pairs


def test_embedding_near_dups_multi_table_recall(spark):
    """50 random vectors + 5 seeded near-dups; the multi-table LSH must
    recover every seeded pair and nothing else at cosine ≥ 0.99."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((50, 32))
    rows = [(i, [float(x) for x in base[i]]) for i in range(50)]
    expected = set()
    for i in range(0, 50, 10):
        rows.append((100 + i, [float(x) for x in
                               base[i] + rng.standard_normal(32) * 0.02]))
        expected.add((i, 100 + i))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["id_a"], r["id_b"])
             for r in embedding_near_duplicates(
                 df, "embedding", "vec_id", dim=32, n_planes=8, n_tables=16,
                 min_cosine=0.99).collect()}
    assert pairs == expected


def test_ivf_exact_equals_brute_force(vectors):
    """Bound-based IVF is exact by construction — equality with brute
    force must hold for any k and any (deterministic) centroids."""
    rows = vectors.orderBy("vec_id").collect()
    q = rows[3]["embedding"]
    cents, radii = train_ivf_index(vectors, "embedding", "vec_id", n_cells=4,
                                   sample=32)
    for k in (1, 3, 7):
        got = [(r["id"], round(r["cosine"], 9)) for r in
               ivf_topk_exact(vectors, "embedding", "vec_id", q,
                              centroids=cents, radii=radii, k=k).collect()]
        exp = [(r["id"], round(r["cosine"], 9)) for r in
               brute_force_topk(vectors, "embedding", "vec_id", q, k=k).collect()]
        assert got == exp


def test_ivf_index_search_equals_brute_force(vectors):
    """The cached-assignment index path must stay exact — equal to
    brute force for any k — and reuse one persisted projection."""
    rows = vectors.orderBy("vec_id").collect()
    q = rows[5]["embedding"]
    idx = build_ivf_index(vectors, "embedding", "vec_id", n_cells=4, sample=32)
    try:
        assert idx.assigned.is_cached
        for k in (1, 4, 9):
            got = [(r["id"], round(r["cosine"], 9)) for r in
                   ivf_search(idx, q, k=k).collect()]
            exp = [(r["id"], round(r["cosine"], 9)) for r in
                   brute_force_topk(vectors, "embedding", "vec_id", q, k=k).collect()]
            assert got == exp
        # index agrees with the uncached trainer on centroids + radii
        cents, radii = train_ivf_index(vectors, "embedding", "vec_id",
                                       n_cells=4, sample=32)
        assert idx.centroids == cents
        assert [round(r, 12) for r in idx.radii] == [round(r, 12) for r in radii]
    finally:
        idx.unpersist()


def test_train_ivf_deterministic_under_partitioning(vectors):
    a = train_ivf_centroids(vectors, "embedding", "vec_id", n_cells=4, sample=16)
    b = train_ivf_centroids(vectors.repartition(7), "embedding", "vec_id",
                            n_cells=4, sample=16)
    assert a == b


def test_ivf_topk_recall(vectors):
    rows = vectors.collect()
    q = rows[0]["embedding"]
    cents = train_ivf_centroids(vectors, "embedding", n_cells=4, sample=32)
    got = {r["id"] for r in
           ivf_topk(vectors, "embedding", "vec_id", q,
                    centroids=cents, n_probe=4, k=3).collect()}
    # n_probe == n_cells → exhaustive → exact top-3
    exp = {r["id"] for r in
           brute_force_topk(vectors, "embedding", "vec_id", q, k=3).collect()}
    assert got == exp
