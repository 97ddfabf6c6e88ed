"""One-shot scale-up smoke (VERDICT r4 advice #6): run every driver
query once at an sf1-equivalent corpus (10x sf0.1, built by
tools/make_sf.py) to catch constants that only bite at scale — bucket
caps, AQE thresholds, broadcast limits — and oracle-check the queries
whose DuckDB oracle is linear.  Quadratic all-pairs oracles
(minhash/simhash/embedding near-dups, exact top-k) are run
Spark-side only; their oracles are O(n^2) by design and exist to prove
small-SF correctness, not to scale.

Not a benchmark: single rep, wall times are indicative only.  Writes
BENCH/SF1.md.

Usage: python tools/scale_smoke.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod  # noqa: E402
from tools.check_oracles import canon  # noqa: E402

# oracles skipped at scale, with the reason recorded in the report
ORACLE_SKIPS = {
    "minhash_near_dups": "O(n^2) exact all-pairs Jaccard oracle",
    "simhash_near_dups": "O(n^2) all-pairs hamming oracle",
    "embedding_near_dups": "O(n^2) all-pairs cosine oracle",
    "embed_topk": "O(n^2) brute-force cosine oracle",
    "ivf_topk": "O(n^2) brute-force cosine oracle",
    "stats_quantiles": ("exact-regime oracle is bounded by design: "
                        "supplier n=10k > sketch k=4096, so the KLL "
                        "answer is (correctly) approximate here"),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jesse_spark_sf1"
    if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
        from tools.make_sf import make_sf

        print(f"building {sf_dir} (10x /root/testdata/sf0.1)...")
        make_sf("/root/testdata/sf0.1", sf_dir, 10)

    from jesse_spark.session import get_spark

    spark = get_spark("sf1-smoke", master="local[32]",
                      shuffle_partitions=64)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    counts = {t: con.sql(f"SELECT count(*) FROM {t}").fetchone()[0]
              for t in entrymod.TABLES}

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    lines = []
    failures = 0
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            if name in oracles and name not in ORACLE_SKIPS:
                got = df.toPandas()
                n = len(got)
            else:
                n = df.count()
                got = None
            wall = time.monotonic() - t0
        except Exception as exc:
            failures += 1
            lines.append((name, None, None, f"SPARK ERROR: {exc}"))
            print(f"FAIL {name}: {exc}")
            continue
        status = "ran"
        if got is not None:
            exp = con.sql(oracles[name]).df()
            if sorted(got.columns) != sorted(exp.columns) or \
                    len(got) != len(exp) or \
                    not canon(got).equals(canon(exp)):
                failures += 1
                status = "ORACLE MISMATCH"
            else:
                status = "oracle ok"
        elif name in ORACLE_SKIPS:
            status = f"rows-only ({ORACLE_SKIPS[name]})"
        else:
            status = "rows-only"
        lines.append((name, n, wall, status))
        print(f"{name}: {n} rows, {wall:.2f}s, {status}")
    spark.stop()

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "SF1.md"), "w") as f:
        f.write("# sf1 scale-up smoke (single rep, not a benchmark)\n\n")
        f.write(f"Corpus: {sf_dir} = 10x sf0.1 via tools/make_sf.py "
                "(key-offset replication, RI preserved per copy).\n\n")
        f.write("Row counts: " + ", ".join(
            f"{t}={n}" for t, n in counts.items()) + "\n\n")
        f.write(
            "Note: key-offset replication keeps payloads verbatim, so "
            "every document/embedding has M-1 exact duplicates — the "
            "ADVERSARIAL case for near-dup banding (pair counts scale "
            "~M^2 per original). The capped-bucket plans completing "
            "here is the point of the smoke.\n\n")
        f.write("| query | rows | wall (s) | status |\n|---|---|---|---|\n")
        for name, n, wall, status in lines:
            w = f"{wall:.2f}" if wall is not None else "-"
            f.write(f"| {name} | {n} | {w} | {status} |\n")
        f.write(f"\nFailures: {failures}\n")
    print(f"\n{len(qs) - failures}/{len(qs)} ok — wrote BENCH/SF1.md")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
