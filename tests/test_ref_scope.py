"""$ref base-URI scope combination (jesse_state.erl:308-390).

Relative refs resolve against the current ``$id`` scope, the scope
changes when descending into a subschema with its own ``$id``
(jesse_state.erl:176-196 set_current_schema), and a ref that crosses
into a loaded document continues resolving inside that document (the
remote-document switch at jesse_state.erl:230-241).  Exercised by the
reference's remote-ref suites (jesse_tests_draft4_SUITE.erl:138-147).

Every case runs through BOTH compilers (typed + variant).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jesse_spark.compiler import compile_checks
from jesse_spark.errors import SchemaError
from jesse_spark.schema.parser import SchemaRegistry, combine_id
from jesse_spark.variant_compiler import compile_variant_checks

D6 = {"$schema": "http://json-schema.org/draft-06/schema#"}
BASE = "http://example.com/root.json"


# ---------------------------------------------------------------------------
# combine_id unit semantics (jesse_state.erl:308-390)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("base,ref,expected", [
    (None, "http://a/b.json", "http://a/b.json"),          # absolute wins
    ("http://a/x.json", "http://b/y.json", "http://b/y.json"),
    (None, "rel.json", "rel.json"),                         # no scope: as-is
    ("http://a/dir/x.json", "#/defs/p", "http://a/dir/x.json#/defs/p"),
    ("http://a/dir/x.json#old", "#new", "http://a/dir/x.json#new"),
    ("http://a/dir/x.json", "sib.json", "http://a/dir/sib.json"),
    ("http://a/dir/x.json", "../up.json", "http://a/up.json"),
    ("http://a/dir/x.json", "./same.json", "http://a/dir/same.json"),
    ("https://a/d/x.json", "y.json", "https://a/d/y.json"),
    ("file:///tmp/d/x.json", "y.json", "file:///tmp/d/y.json"),
    ("file:///tmp/d/x.json", "../y.json", "file:///tmp/y.json"),
    ("http://a/x.json", None, "http://a/x.json"),           # undefined ref
    # base with no path: dirname collapses to the bare scheme, like the
    # reference's filename:dirname (combine_relative_id2 "http:" clause)
    ("http://a", "y.json", "http://y.json"),
])
def test_combine_id(base, ref, expected):
    assert combine_id(base, ref) == expected


# ---------------------------------------------------------------------------
# fixture registry: a 3-document schema universe under one http base
# ---------------------------------------------------------------------------
def make_registry() -> SchemaRegistry:
    reg = SchemaRegistry()
    reg.add({**D6, "$id": "http://example.com/sibling.json",
             "type": "integer", "minimum": 10})
    reg.add({**D6, "$id": "http://example.com/nested/leaf.json",
             "type": "integer", "multipleOf": 2})
    reg.add({**D6, "$id": "http://example.com/defs.json",
             "definitions": {
                 "positive": {"type": "integer", "minimum": 1},
                 # a ref INSIDE the loaded doc, relative to ITS scope
                 "chained": {"$ref": "sibling.json"},
             }})
    return reg


# (root-schema, instance-long, expect_valid) triples; every root carries
# $id BASE so relative refs combine against it
REF_CASES = [
    # 1. relative ref under a base $id
    ({**D6, "$id": BASE, "$ref": "sibling.json"}, 15, True),
    ({**D6, "$id": BASE, "$ref": "sibling.json"}, 5, False),
    # 2. pointer into a loaded document
    ({**D6, "$id": BASE, "$ref": "defs.json#/definitions/positive"}, 3, True),
    ({**D6, "$id": BASE, "$ref": "defs.json#/definitions/positive"}, 0, False),
    # 3. ref chain crossing documents: root → defs.json → sibling.json
    #    (the inner "sibling.json" resolves against defs.json's scope)
    ({**D6, "$id": BASE, "$ref": "defs.json#/definitions/chained"}, 12, True),
    ({**D6, "$id": BASE, "$ref": "defs.json#/definitions/chained"}, 9, False),
    # 4. scope change in a subschema: the allOf member's $id moves the
    #    scope to nested/inner.json, so leaf.json resolves under nested/
    ({**D6, "$id": BASE,
      "allOf": [{"$id": "nested/inner.json", "$ref": "leaf.json"}]}, 4, True),
    ({**D6, "$id": BASE,
      "allOf": [{"$id": "nested/inner.json", "$ref": "leaf.json"}]}, 3, False),
    # 5. ../ canonicalization out of a nested scope
    ({**D6, "$id": "http://example.com/a/b/root.json",
      "$ref": "../../sibling.json"}, 11, True),
    # 6. local #-pointer still resolves against the CURRENT root even
    #    under a combined scope
    ({**D6, "$id": BASE,
      "definitions": {"pos": {"type": "integer", "minimum": 1}},
      "$ref": "#/definitions/pos"}, 2, True),
    ({**D6, "$id": BASE,
      "definitions": {"pos": {"type": "integer", "minimum": 1}},
      "$ref": "#/definitions/pos"}, 0, False),
]


@pytest.mark.parametrize("schema,value,expect_valid", REF_CASES,
                         ids=[f"typed{i}" for i in range(len(REF_CASES))])
def test_ref_scope_typed(spark, schema, value, expect_valid):
    reg = make_registry()
    checks = compile_checks(schema, T.LongType(), registry=reg)
    df = spark.createDataFrame([(value,)], "value long")
    row = df.select(F.array_compact(F.array(*[
        F.when(~F.coalesce(c.pred(F.col("value")), F.lit(False)),
               F.lit(c.constraint)) for c in checks
    ])).alias("codes")).head()
    assert (list(row["codes"]) == []) is expect_valid


@pytest.mark.parametrize("schema,value,expect_valid", REF_CASES,
                         ids=[f"var{i}" for i in range(len(REF_CASES))])
def test_ref_scope_variant(spark, schema, value, expect_valid):
    reg = make_registry()
    checks = compile_variant_checks(schema, registry=reg)
    df = spark.createDataFrame([(json.dumps(value),)], "j string")
    row = df.select(F.array_compact(F.array(*[
        F.when(~F.coalesce(c.pred(F.parse_json(F.col("j"))), F.lit(False)),
               F.lit(c.constraint)) for c in checks
    ])).alias("codes")).head()
    assert (list(row["codes"]) == []) is expect_valid


def test_unresolvable_relative_ref_raises(spark):
    reg = make_registry()
    schema = {**D6, "$id": BASE, "$ref": "missing.json"}
    with pytest.raises(SchemaError):
        compile_checks(schema, T.LongType(), registry=reg)
