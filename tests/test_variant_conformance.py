"""Conformance through the DYNAMIC (variant) compiler.

Every typed-suite case re-runs with the instance carried as
``parse_json(<instance>)`` — schema-on-read, per-row type dispatch,
like the reference.  Verdicts must match the typed suite except where
the typed deviation (null property ≡ absent) legitimately differs:
in variant mode ``{"a": null}`` really contains a null-valued property
(exactly jesse's semantics), so those expectations are overridden.

Plus heterogeneous cases a static column can't hold at all.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from jesse_spark.variant_compiler import compile_variant_checks
from tests.test_conformance import CASES, D3, D4, D6


def run_variant_case(spark, schema, data, expect_valid: bool):
    df = spark.createDataFrame([(json.dumps(data),)], "j string")
    checks = compile_variant_checks(schema)
    row = df.select(F.array_compact(F.array(*[
        F.when(~F.coalesce(c.pred(F.parse_json(F.col("j"))), F.lit(False)),
               F.lit(c.constraint)) for c in checks
    ])).alias("codes")).head()
    codes = list(row["codes"])
    if expect_valid:
        assert codes == [], f"expected valid, got {codes}"
    else:
        assert codes, "expected invalid, got valid"


def _key(schema, data):
    return (json.dumps(schema, sort_keys=True), json.dumps(data))


# typed-mode cases whose verdict differs under real null-property
# semantics (variant mode matches jesse; typed mode treats null as absent)
OVERRIDES = {
    _key({**D4, "properties": {"a": {"type": "integer", "minimum": 5}}},
         {"a": None}): False,            # a IS present, null fails type
    _key({**D4, "properties": {"a": {}}, "additionalProperties": False},
         {"a": 1, "b": None}): False,    # b IS an extra property
    _key({**D4, "dependencies": {"a": ["b"]}},
         {"a": 1, "b": None}): True,     # b IS present
    _key({**D4, "dependencies": {"a": {"required": ["b"]}}},
         {"a": 1, "b": None}): True,
    _key({**D4, "type": "object", "required": ["b"],
          "properties": {"a": {"type": "integer"}, "b": {"type": "integer"}}},
         {"a": 1, "b": None}): False,    # required satisfied but b:null fails type
    _key({**D3, "type": "object",
          "properties": {"a": {"type": "integer", "required": True},
                         "b": {"type": "integer", "required": True}}},
         {"a": 1, "b": None}): False,
    # parse_json canonicalizes 1.0 to DECIMAL(1,0): the draft4 textual
    # int/float distinction is unrecoverable post-parse, so variant-mode
    # draft4 `integer` behaves like draft6 (zero-fraction accepted)
    _key({**D4, "type": "integer"}, 1.0): True,
}

VARIANT_CASES = [
    (schema, data,
     OVERRIDES.get(_key(schema, data), expected is True))
    for schema, data, expected in CASES
]


@pytest.mark.parametrize("schema,data,expect_valid", VARIANT_CASES,
                         ids=[f"v{i}" for i in range(len(VARIANT_CASES))])
def test_variant_conformance(spark, schema, data, expect_valid):
    run_variant_case(spark, schema, data, expect_valid)


# heterogeneous instances a static Spark column cannot hold
HETERO_CASES = [
    ({**D4, "items": {"type": "integer"}}, [1, "x"], False),
    ({**D4, "items": {"type": ["integer", "string"]}}, [1, "x"], True),
    ({**D4, "uniqueItems": True}, [1, 1.0], False),          # 1 == 1.0
    ({**D4, "uniqueItems": True}, [1, "1"], True),           # number ≠ string
    ({**D4, "uniqueItems": True}, [[1], [1]], False),
    ({**D4, "uniqueItems": True}, [{"a": 1}, {"a": 1}], False),
    ({**D4, "uniqueItems": True}, [{"a": 1}, {"a": 2}], True),
    ({**D4, "type": ["string", "integer"]}, "x", True),
    ({**D4, "type": ["string", "integer"]}, [1], False),
    ({**D6, "contains": {"minimum": 5}}, [1, "x", 9], True),
    # "x" VALIDATES against {minimum:5} (type-guarded no-op) → contains ok
    ({**D6, "contains": {"minimum": 5}}, [1, "x"], True),
    ({**D6, "contains": {"type": "integer", "minimum": 5}}, [1, "x"], False),
    ({**D6, "contains": {"type": "integer", "minimum": 5}}, [1, "x", 9], True),
    ({**D4, "items": [{"type": "integer"}, {"type": "string"}],
      "additionalItems": {"type": "boolean"}}, [5, "x", True], True),
    ({**D4, "items": [{"type": "integer"}, {"type": "string"}],
      "additionalItems": {"type": "boolean"}}, [5, "x", 3], False),
    ({**D4, "properties": {"a": {"properties": {"b": {"minimum": 5}}}}},
     {"a": {"b": 3}}, False),
    ({**D4, "properties": {"a": {"properties": {"b": {"minimum": 5}}}}},
     {"a": {"b": 7}}, True),
    ({**D6, "const": {"a": 1}}, {"a": 1}, True),
    ({**D6, "const": {"a": 1}}, {"a": 2}, False),
    ({**D4, "anyOf": [{"type": "string"}, {"type": "integer", "minimum": 5}]},
     7, True),
    ({**D4, "anyOf": [{"type": "string"}, {"type": "integer", "minimum": 5}]},
     3, False),
    ({**D4, "oneOf": [{"type": "integer"}, {"minimum": 5}]}, 3, True),
    ({**D4, "oneOf": [{"type": "integer"}, {"minimum": 5}]}, 7, False),
    # anyOf + oneOf on one schema (closure-rebinding regression)
    ({**D4, "anyOf": [{"minimum": 10}, {"maximum": 3}],
      "oneOf": [{"multipleOf": 5}, {"multipleOf": 1}]}, 5, False),
    ({**D4, "anyOf": [{"minimum": 4}], "oneOf": [{"multipleOf": 5}]}, 5, True),
    # mixed-type property bags via real maps
    ({**D4, "patternProperties": {"^n_": {"type": "integer"}}},
     {"n_a": 1, "n_b": "x"}, False),
    ({**D4, "maxProperties": 2}, {"a": 1, "b": "x", "c": None}, False),
    ({**D6, "propertyNames": {"pattern": "^[ab]$"}}, {"a": 1, "b": [1]}, True),
    ({**D6, "propertyNames": {"pattern": "^[ab]$"}}, {"a": 1, "zz": 1}, False),
    # deep nesting through arrays of objects
    ({**D4, "items": {"properties": {"x": {"type": "integer"}},
                      "required": ["x"]}},
     [{"x": 1}, {"x": 2}], True),
    ({**D4, "items": {"properties": {"x": {"type": "integer"}},
                      "required": ["x"]}},
     [{"x": 1}, {"y": 2}], False),
]


@pytest.mark.parametrize("schema,data,expect_valid", HETERO_CASES,
                         ids=[f"h{i}" for i in range(len(HETERO_CASES))])
def test_heterogeneous(spark, schema, data, expect_valid):
    run_variant_case(spark, schema, data, expect_valid)


# order-insensitive deep equality (jesse_lib.erl:218-261, 147-197) —
# JSON text is parsed with keys in the GIVEN order, so these cases pin
# that reordered keys still compare equal at every nesting level
DEEP_EQ_VARIANT = [
    ({**D4, "enum": [{"a": 1, "b": 2}]}, {"b": 2, "a": 1}, True),
    ({**D6, "const": {"a": 1, "b": [1, {"c": 2, "d": 3}]}},
     {"b": [1, {"d": 3, "c": 2}], "a": 1}, True),
    ({**D4, "enum": [{"a": 1}]}, {"a": 1, "z": 0}, False),   # extra key
    ({**D4, "enum": [{"a": 1}]}, {"a": 1.0}, True),          # 1 == 1.0 nested
    ({**D4, "enum": [[{"a": 1, "b": 2}]]}, [{"b": 2, "a": 1}], True),
    # uniqueItems: reordered objects ARE duplicates
    ({**D4, "uniqueItems": True}, [{"a": 1, "b": 2}, {"b": 2, "a": 1}], False),
    ({**D4, "uniqueItems": True}, [{"a": 1, "b": 2}, {"a": 1, "b": 3}], True),
    ({**D4, "uniqueItems": True},
     [{"o": {"x": 1, "y": 2}}, {"o": {"y": 2, "x": 1}}], False),  # nested
    ({**D4, "uniqueItems": True}, [{"a": 1}, {"a": 1.0}], False),  # 1 == 1.0
]


@pytest.mark.parametrize("schema,data,expect_valid", DEEP_EQ_VARIANT,
                         ids=[f"dq{i}" for i in range(len(DEEP_EQ_VARIANT))])
def test_deep_equality_variant(spark, schema, data, expect_valid):
    run_variant_case(spark, schema, data, expect_valid)


def test_anyof_branch_detail_variant(spark):
    """Total anyOf failure surfaces the shortest-error branch's own
    violation codes (jesse_validator_draft4.erl:1365-1373)."""
    import json as _j

    from pyspark.sql import functions as F

    schema = {**D4, "anyOf": [{"type": "string"},
                              {"type": "integer", "minimum": 5}]}
    checks = compile_variant_checks(schema)
    df = spark.createDataFrame([(_j.dumps(3),)], "j string")
    row = df.select(F.array_compact(F.array(*[
        F.when(~F.coalesce(c.pred(F.parse_json(F.col("j"))), F.lit(False)),
               F.lit(c.constraint)) for c in checks
    ])).alias("codes")).head()
    # branch 0 fails 1 check (wrong_type), branch 1 fails 1 (not_in_range);
    # first-shortest = branch 0 → wrong_type detail
    assert sorted(set(row["codes"])) == ["any_schemas_not_valid", "wrong_type"]


# mirrored from the reference's extra regression corpus
# (test/jesse_tests_draft4_SUITE_data/extra/) — variant mode, incl. the
# bignum case a typed column cannot hold
EXTRA_VARIANT = [
    # uniqueItemsExtra.json:7-10 — bignums compared exactly, not as doubles
    ({**D4, "uniqueItems": True},
     [123456789012345678901234567890, 123456789012345678901234567891], True),
    ({**D4, "uniqueItems": True},
     [123456789012345678901234567890, 123456789012345678901234567890], False),
    # bignum enum/const: exact comparison
    ({**D6, "const": 123456789012345678901234567890},
     123456789012345678901234567890, True),
    ({**D6, "const": 123456789012345678901234567890},
     123456789012345678901234567891, False),
    # itemsExtra.json
    ({**D4, "type": "array", "items": [{}, {}, {}], "additionalItems": False},
     [1, 2], True),
    ({**D4, "type": "array", "items": [{}, {}, {}], "additionalItems": False},
     [1, 2, 3, 4], False),
    # unicodePatternProperties.json
    ({**D4, "patternProperties": {"^á": {}}, "additionalProperties": False},
     {"ármányos": 2}, True),
    ({**D4, "patternProperties": {"^á": {}}, "additionalProperties": False},
     {"élmény": 2}, False),
    # jesse draft6 `examples` QUIRK (D6:157-165)
    ({**D6, "examples": [1, 2]}, [9], True),
    ({**D6, "examples": [1, 2]}, 9, False),
]


@pytest.mark.parametrize("schema,data,expect_valid", EXTRA_VARIANT,
                         ids=[f"x{i}" for i in range(len(EXTRA_VARIANT))])
def test_reference_extras_variant(spark, schema, data, expect_valid):
    run_variant_case(spark, schema, data, expect_valid)


def test_nested_anyof_detail_cap_propagates(spark):
    """anyof_detail_max reaches anyOf groups BELOW the schema root in
    variant mode — _child() and the $ref sub-Ctx forward it (ADVICE r3:
    the child ctx silently reverted to the default cap)."""
    import warnings

    nested = {"$schema": "http://json-schema.org/draft-04/schema#",
              "properties": {"p": {"anyOf": [
                  {"minimum": i, "maximum": i} for i in range(10)
              ]}}}
    # 20 branch checks: above a cap of 3, below the default of 24 — the
    # warning only fires if the lowered cap actually propagated down.
    with pytest.warns(UserWarning, match="anyOf branch detail dropped"):
        compile_variant_checks(nested, anyof_detail_max=3)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        compile_variant_checks(nested, anyof_detail_max=100)
