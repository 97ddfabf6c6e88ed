"""allowed_errors budget + per-element array violation paths."""

from pyspark.sql import functions as F

from jesse_spark.compiler import compile_checks
from jesse_spark.plans.validate import array_violation_rows, with_violations


def test_allowed_errors_budget(spark):
    # one row violating 3 keywords; budget 1 keeps 2 violations (proof
    # of exceedance, jesse_error.erl:71-78)
    df = spark.createDataFrame([("XX", -5)], "name string, n int")
    schema = {"type": "object", "properties": {
        "name": {"type": "string", "minLength": 5, "pattern": "^[a-z]+$"},
        "n": {"type": "integer", "minimum": 0},
    }}
    checks = compile_checks(schema, df.schema, null_is_absent=True)
    full = with_violations(df, checks).head()
    assert len(full["violations"]) == 3
    capped = with_violations(df, checks, allowed_errors=1).head()
    assert len(capped["violations"]) == 2
    assert not capped["valid"]


def test_array_violation_rows_have_indices(spark):
    df = spark.createDataFrame(
        [(1, [3, -1, 7, -9]), (2, [1, 2])], "id long, xs array<int>")
    rows = array_violation_rows(
        df, "xs", {"type": "integer", "minimum": 0}, ["id"]).collect()
    got = {(r["id"], r["path"], r["observed"]) for r in rows}
    assert got == {(1, "/xs/1", "-1"), (1, "/xs/3", "-9")}


def test_array_violation_rows_nested(spark):
    df = spark.createDataFrame(
        [(1, [{"v": 5}, {"v": -2}])],
        "id long, xs array<struct<v:int>>")
    rows = array_violation_rows(
        df, "xs", {"type": "object", "properties": {"v": {"minimum": 0}}},
        ["id"]).collect()
    assert [(r["path"], r["constraint"]) for r in rows] == [("/xs/1/v", "not_in_range")]
