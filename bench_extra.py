"""Extra measurement harness for optimization work (guide §1.4).

NOT part of the driver contract — bench.py stays the frozen
measurement surface.  This file exists so per-query isolation runs,
noop-sink timings and .explain("formatted") captures don't touch
bench.py.

Usage:
    python bench_extra.py time  <query> [query ...]   # min-of-N noop walls
    python bench_extra.py plan  <query> [query ...]   # print formatted plan
    python bench_extra.py all                         # every query once

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
     BENCH_EXTRA_REPS (default 3).
"""

from __future__ import annotations

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def get_spark():
    from jesse_spark.session import get_spark as gs

    spark = gs("bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def warm(spark) -> None:
    import __spark_entry__ as entrymod

    for t in entrymod.TABLES:
        _noop(spark.read.parquet(f"{SF_DIR}/{t}.parquet"))


def main() -> None:
    import __spark_entry__ as entrymod

    mode, names = sys.argv[1], sys.argv[2:]
    qs = entrymod.queries()
    if mode == "all":
        names = list(qs)
    spark = get_spark()
    warm(spark)
    for name in names:
        fn = qs[name]
        if mode == "plan":
            print(f"===== {name} =====")
            fn(spark, SF_DIR).explain(mode="formatted")
        elif mode in ("time", "all"):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            walls = []
            for _ in range(REPS):
                t0 = time.time()
                _noop(fn(spark, SF_DIR))
                walls.append(round(time.time() - t0, 3))
            print(f"{name}: min={min(walls)} walls={walls}")
            spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
