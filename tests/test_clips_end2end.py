"""Golden-output test: injected violations recovered exactly
(FIXTURES.md §1.2)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jesse_spark.plans.pipeline import run_full_suite
from jesse_spark.sources.fixtures import clips_df, codecs_df, expected_violations

N = 600


@pytest.fixture(scope="module")
def suite(spark):
    clips = clips_df(spark, N)
    return run_full_suite(clips, codecs_df(spark))


def test_goldens_recovered_exactly(suite):
    got = suite.violations.select("clip_id", "constraint", "path").toPandas()
    exp = expected_violations(N)
    gset = set(map(tuple, got.values.tolist()))
    eset = set(map(tuple, exp.values.tolist()))
    assert gset == eset, (sorted(eset - gset)[:5], sorted(gset - eset)[:5])


def test_verdicts_consistent(suite):
    v = suite.verdicts.agg(
        F.sum("rows").alias("rows"), F.sum("invalid_rows").alias("bad")).head()
    assert v["rows"] == N
    # invalid rows = rows with ≥1 row-level violation (kinds 0-4,6)
    exp_bad = len([i for i in range(N)
                   if (i % 50 == 7) and ((i // 50) % 8) in (0, 1, 2, 3, 4, 6)])
    assert v["bad"] == exp_bad


def test_clean_table_is_clean(spark):
    """A defect-free slice (indices with no injection) has zero violations."""
    clips = clips_df(spark, 7)   # rows 0-6: before the first injected defect
    res = run_full_suite(clips, codecs_df(spark))
    assert res.violations.count() == 0


def test_generation_deterministic(spark):
    a = clips_df(spark, 50).orderBy("clip_id").toPandas()
    b = clips_df(spark, 50, partitions=7).orderBy("clip_id").toPandas()
    pd.testing.assert_frame_equal(a, b)
