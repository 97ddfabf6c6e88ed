"""Dynamic-typing compiler: JSON-Schema keywords over VariantType.

The typed compiler (jesse_spark.compiler) resolves type guards at
compile time against a static Spark schema.  The reference, however, is
schema-on-read — type is discovered per value at validation time
(jesse_lib.erl:92-110) — and the JSON-Schema-Test-Suite exercises
heterogeneous instances (mixed-type arrays, schemas applied to
anything).  This module compiles the SAME keyword semantics against a
``VariantType`` column, with **runtime** type dispatch via
``schema_of_variant`` — the engine's faithful rendering of jesse's
dynamic dispatch, still 100% JVM-side expressions.

Semantics notes (mirroring the reference):
- a keyword type-guarded in jesse (e.g. ``minimum`` only
  ``if is_number(Value)``, jesse_validator_draft4.erl:149-158) becomes
  ``WHEN is_number THEN check ELSE true``;
- numeric equality is value-based: 1 == 1.0 (jesse_lib.erl:177-181
  normalizes numbers to float before comparing);
- SQL NULL variant = absent (property missing); variant-encoded null =
  JSON ``null`` (a real value of type null) — exactly the distinction
  jesse gets from its proplists;
- deep equality for enum/const is structural (per-key, recursive) and
  uniqueItems canonicalizes with SORTED object keys at every level —
  both order-INsensitive for object properties, order-sensitive for
  arrays, 1 == 1.0, matching jesse_lib.erl:218-261 / 147-197 (the
  uniqueItems canonicalization is depth-bounded at ``_CANON_DEPTH``).
"""

from __future__ import annotations

import json as _json
import re as _pyre
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jesse_spark.compiler import (
    _num_bound,
    _scoped,
    _validate_pattern,
    _warn_anyof_detail_dropped,
    _warn_ref_unroll,
    _REF_EXPANSION_BUDGET,
    Builder,
    Check,
    Ctx,
    MAX_REF_DEPTH,
    _format_pred,
    _reduce_and,
    _reduce_or,
)
from jesse_spark.errors import ErrorCodes as E
from jesse_spark.errors import SchemaError
from jesse_spark.schema.parser import (
    DRAFT3,
    DRAFT4,
    DRAFT6,
    SchemaRegistry,
    detect_draft,
    hoist_ref,
    normalize_schema,
)

_DECIMAL0 = r"^DECIMAL\(\d+,0\)$"


# ---------------------------------------------------------------------------
# runtime type predicates
# ---------------------------------------------------------------------------
def _vt(v: Column) -> Column:
    return F.schema_of_variant(v)


def is_string(v: Column) -> Column:
    return _vt(v) == "STRING"


def is_boolean(v: Column) -> Column:
    return _vt(v) == "BOOLEAN"


def is_null(v: Column) -> Column:
    return _vt(v) == "VOID"


def is_number(v: Column) -> Column:
    t = _vt(v)
    return (t == "BIGINT") | (t == "DOUBLE") | (t == "FLOAT") | t.startswith("DECIMAL")


def is_integer(v: Column, draft: int) -> Column:
    """draft4: an integer value.  parse_json CANONICALIZES zero-fraction
    decimals (``1.0`` → DECIMAL(1,0), same as ``1`` → BIGINT scale-0),
    so the draft4 textual int/float distinction is unrecoverable and
    variant-mode draft4 ``integer`` accepts 1.0 — the documented
    deviation (ARCHITECTURE.md; test_variant_conformance OVERRIDES).
    draft6 accepts zero-fraction numbers by spec
    (jesse_validator_draft6.erl:341-359), so the drafts converge here.

    Bignums past DECIMAL(38,0) parse as DOUBLE, where the textual
    int/float distinction is unrecoverable; every double at magnitude
    ≥ 2^63 is mathematically integral and jesse (Erlang bignums,
    optional/bignum.json) calls the integer-written form an integer, so
    those count as draft4 integers too (documented deviation: a float
    WRITTEN as 1e60 also passes — jesse would reject it)."""
    t = _vt(v)
    num = as_num(v)
    strict = ((t == "BIGINT") | t.rlike(_DECIMAL0)
              | ((t == "DOUBLE") & (F.abs(num) >= F.lit(float(2 ** 63)))
                 & (F.round(num) == num)))
    if draft < DRAFT6:
        return strict
    # round(x) == x, not floor (LONG overflow past 2^63) and not
    # pmod (tiny negatives collapse to 0.0)
    return strict | (is_number(v) & (F.round(num) == num))


def is_array(v: Column) -> Column:
    return _vt(v).startswith("ARRAY")


def is_object(v: Column) -> Column:
    return _vt(v).startswith("OBJECT")


def as_num(v: Column) -> Column:
    return F.try_variant_get(v, "$", "double")




def as_str(v: Column) -> Column:
    return F.try_variant_get(v, "$", "string")


def as_bool(v: Column) -> Column:
    return F.try_variant_get(v, "$", "boolean")


def as_map(v: Column) -> Column:
    return v.cast("map<string,variant>")


def as_arr(v: Column) -> Column:
    return v.cast("array<variant>")


def _present(m: Column, name: str) -> Column:
    """Property present (may still be JSON null)."""
    return F.map_contains_key(m, F.lit(name))


def _type_name_pred(v: Column, name: Any, ctx: Ctx) -> Column:
    if isinstance(name, dict):
        if ctx.draft != DRAFT3:
            raise SchemaError(E.WRONG_TYPE_SPECIFICATION, name)
        return compile_variant_pred(name, ctx=_child(ctx))(v)
    if name == "string":
        return is_string(v)
    if name == "number":
        return is_number(v)
    if name == "integer":
        return is_integer(v, ctx.draft)
    if name == "boolean":
        return is_boolean(v)
    if name == "object":
        return is_object(v)
    if name == "array":
        return is_array(v)
    if name == "null":
        return is_null(v)
    if name == "any":
        return F.lit(True)
    raise SchemaError(E.WRONG_TYPE_SPECIFICATION, name)


def _enum_value_pred(v: Column, val: Any) -> Column:
    """Deep structural equality against a Python JSON literal:
    order-INsensitive for object properties (per-key comparison),
    order-sensitive for arrays, numerics value-based (1 == 1.0) —
    jesse's is_equal (jesse_lib.erl:218-261)."""
    if val is None:
        return is_null(v)
    if isinstance(val, bool):
        return is_boolean(v) & (as_bool(v) == F.lit(val))
    if isinstance(val, (int, float)):
        if isinstance(val, int) and abs(val) > 2 ** 53:
            # bignum: double comparison would collide neighbors —
            # compare the exact decimal rendering (jesse bignums are
            # arbitrary-precision, uniqueItemsExtra.json:7-10)
            return is_number(v) & (
                F.try_variant_get(v, "$", "decimal(38,0)").cast("string")
                == F.lit(str(val)))
        return is_number(v) & (as_num(v) == F.lit(float(val)))
    if isinstance(val, str):
        return is_string(v) & (as_str(v) == F.lit(val))
    if isinstance(val, list):
        arr = as_arr(v)
        body = is_array(v) & (F.size(arr) == len(val))
        for i, x in enumerate(val):
            body = body & F.coalesce(_enum_value_pred(F.get(arr, i), x), F.lit(False))
        return body
    if isinstance(val, dict):
        m = as_map(v)
        body = is_object(v) & (F.size(F.map_keys(m)) == len(val))
        for k, x in val.items():
            body = (body & F.map_contains_key(m, F.lit(k))
                    & F.coalesce(_enum_value_pred(F.element_at(m, F.lit(k)), x),
                                 F.lit(False)))
        return body
    raise SchemaError("schema_invalid", f"unsupported enum value {val!r}")


_CANON_DEPTH = 6  # bounded recursion for canonical rendering


def _elem_canonical(e: Column, depth: int = _CANON_DEPTH) -> Column:
    """Normalization for uniqueItems equality (jesse_lib.erl:147-197
    normalize_and_sort): numbers to double string (1 == 1.0), object
    keys SORTED at every level (order-insensitive), arrays in order.
    Beyond ``depth`` nesting falls back to to_json (order-sensitive) —
    a documented bound, like MAX_REF_DEPTH."""
    if depth <= 0:
        return F.to_json(e)
    # numbers: integral values render via exact decimal(38,0) so that
    # 1 == 1.0 (both "1") AND bignums beyond double's 2^53 stay distinct
    # (uniqueItemsExtra.json:7-10 "big integers are compared correctly");
    # non-integral (or >38-digit overflow) falls back to double text
    # integrality via round(x) == x: floor(double) returns LONG and
    # overflows beyond 2^63 (the bignum range), and pmod(x, 1.0)
    # collapses tiny negatives to exactly 0.0 (x + 1.0 rounds to 1.0)
    num = F.when(
        F.round(as_num(e)) == as_num(e),
        F.coalesce(F.try_variant_get(e, "$", "decimal(38,0)").cast("string"),
                   as_num(e).cast("string")),
    ).otherwise(as_num(e).cast("string"))
    entries = F.array_sort(
        F.map_entries(as_map(e)),
        lambda a, b: F.when(a.getField("key") < b.getField("key"), F.lit(-1))
        .when(a.getField("key") > b.getField("key"), F.lit(1))
        .otherwise(F.lit(0)),
    )
    obj = F.concat(
        F.lit("{"),
        F.array_join(
            F.transform(entries, lambda ent: F.concat(
                F.lit('"'),
                F.regexp_replace(F.regexp_replace(ent.getField("key"),
                                                  r"\\", r"\\\\"),
                                 '"', '\\\\"'),
                F.lit('":'),
                _elem_canonical(ent.getField("value"), depth - 1))),
            ","),
        F.lit("}"))
    arr = F.concat(
        F.lit("["),
        F.array_join(F.transform(as_arr(e),
                                 lambda x: _elem_canonical(x, depth - 1)), ","),
        F.lit("]"))
    return (F.when(is_number(e), num)
            .when(is_object(e), obj)
            .when(is_array(e), arr)
            .otherwise(F.to_json(e)))


def _child(ctx: Ctx) -> Ctx:
    from dataclasses import replace

    return replace(ctx)


def _guard(cond: Column, body: Column) -> Column:
    """Type-guarded keyword: inapplicable type → valid (jesse no-op)."""
    return F.when(cond, body).otherwise(F.lit(True))


# ---------------------------------------------------------------------------
# the compiler
# ---------------------------------------------------------------------------
def compile_variant_checks(
    schema: Any,
    *,
    registry: SchemaRegistry | None = None,
    draft: int | None = None,
    null_is_absent: bool = False,
    anyof_detail_max: int | None = None,
    ref_unroll_max: int | None = None,
    pattern_lint: bool = True,
    _ctx: Ctx | None = None,
    _path: str = "",
) -> list[Check]:
    if _ctx is None:
        _ctx = Ctx(draft=detect_draft(schema) if draft is None else draft,
                   registry=registry, root=schema,
                   anyof_detail_max=anyof_detail_max,
                   ref_unroll_max=ref_unroll_max,
                   pattern_lint=pattern_lint)
    ctx = _ctx
    schema = normalize_schema(schema, ctx.draft)
    ctx = _scoped(ctx, schema)
    schema = hoist_ref(schema)

    checks: list[Check] = []

    def add(constraint: str, pred: Builder, path: str = "",
            observed: Builder | None = None) -> None:
        checks.append(Check(constraint, _path + path, pred,
                            observed or (lambda v: F.to_json(v))))

    def sub_pred(sub: Any) -> Builder:
        return compile_variant_pred(sub, ctx=_child(ctx))

    # ---- $ref -----------------------------------------------------------
    if "$ref" in schema:
        reg = ctx.registry or SchemaRegistry()
        target, new_root, new_scope = reg.resolve_ref(
            schema["$ref"], ctx.root, scope=ctx.scope)
        # recursive refs: bounded unroll with a fail-closed check at the
        # budget — same policy and rationale as compiler.py's $ref
        # branch (ref_seen holds the node objects themselves so CPython
        # id reuse can't fool the revisit count)
        if sum(1 for t in ctx.ref_seen if t is target) >= ctx.unroll_max:
            _warn_ref_unroll(ctx.unroll_max)
            return [Check(E.REF_UNROLL_EXCEEDED, _path,
                          lambda v: F.lit(False), lambda v: F.to_json(v))]
        if len({id(t) for t in ctx.ref_seen}) >= MAX_REF_DEPTH:
            raise SchemaError("schema_unsupported",
                              f"$ref chain deeper than {MAX_REF_DEPTH}")
        ctx.ref_expansions[0] += 1
        if ctx.ref_expansions[0] > _REF_EXPANSION_BUDGET:
            raise SchemaError(
                "schema_unsupported",
                f"$ref expansion exceeds {_REF_EXPANSION_BUDGET} nodes "
                "(a schema with many refs per level grows ~k^unroll); "
                "lower ref_unroll_max to bound the inlined plan")
        new_draft = (ctx.draft if new_root is ctx.root
                     else detect_draft(new_root, default=ctx.draft))
        from dataclasses import replace

        sub = replace(ctx, draft=new_draft, root=new_root,
                      scope=new_scope, ref_seen=ctx.ref_seen + (target,))
        return compile_variant_checks(target, null_is_absent=null_is_absent,
                                      _ctx=sub, _path=_path)

    # ---- type / disallow --------------------------------------------------
    if "type" in schema:
        decl = schema["type"]
        names = decl if isinstance(decl, list) else [decl]
        add(E.WRONG_TYPE,
            lambda v, ns=names: _reduce_or([_type_name_pred(v, n, ctx) for n in ns]))
    if ctx.draft == DRAFT3 and "disallow" in schema:
        decl = schema["disallow"]
        names = decl if isinstance(decl, list) else [decl]
        add(E.NOT_ALLOWED,
            lambda v, ns=names: ~_reduce_or([_type_name_pred(v, n, ctx) for n in ns]))

    # ---- enum / const -------------------------------------------------------
    if "enum" in schema:
        vals = schema["enum"]
        if not isinstance(vals, list):
            raise SchemaError("schema_invalid", vals)
        add(E.NOT_IN_ENUM,
            lambda v, vs=vals: _reduce_or([_enum_value_pred(v, x) for x in vs]))
    if ctx.draft >= DRAFT6 and "const" in schema:
        add(E.NOT_IN_ENUM,
            lambda v, x=schema["const"]: _enum_value_pred(v, x))

    # ---- numeric ---------------------------------------------------------------
    if "minimum" in schema:
        m = _num_bound(schema["minimum"])
        excl = ctx.draft <= DRAFT4 and schema.get("exclusiveMinimum") is True
        add(E.NOT_IN_RANGE, lambda v, m=m, e=excl: _guard(
            is_number(v), (as_num(v) > m) if e else (as_num(v) >= m)))
    if "maximum" in schema:
        m = _num_bound(schema["maximum"])
        excl = ctx.draft <= DRAFT4 and schema.get("exclusiveMaximum") is True
        add(E.NOT_IN_RANGE, lambda v, m=m, e=excl: _guard(
            is_number(v), (as_num(v) < m) if e else (as_num(v) <= m)))
    if ctx.draft >= DRAFT6:
        for kw, op in (("exclusiveMinimum", "gt"), ("exclusiveMaximum", "lt")):
            b = schema.get(kw)
            if isinstance(b, (int, float)) and not isinstance(b, bool):
                b = _num_bound(b)
                add(E.NOT_IN_RANGE, lambda v, b=b, op=op: _guard(
                    is_number(v),
                    (as_num(v) > b) if op == "gt" else (as_num(v) < b)))
    kw = "divisibleBy" if ctx.draft == DRAFT3 else "multipleOf"
    if kw in schema:
        k = schema[kw]
        code = E.NOT_DIVISIBLE if ctx.draft == DRAFT3 else E.NOT_MULTIPLE_OF
        if not isinstance(k, (int, float)) or isinstance(k, bool):
            raise SchemaError(E.NOT_MULTIPLE_OF, k)
        if k == 0 and ctx.draft == DRAFT3:
            add(code, lambda v: _guard(is_number(v), F.lit(False)))
        elif k <= 0:
            raise SchemaError("wrong_multiple_of", k)
        else:
            # jesse's float-tolerant formula (jesse_validator_draft4.erl:1019-1029)
            add(code, lambda v, k=float(k): _guard(
                is_number(v),
                (as_num(v) / k - F.floor(as_num(v) / k)) * k == F.lit(0.0)))

    # ---- string ------------------------------------------------------------------
    if "minLength" in schema:
        n = schema["minLength"]
        add(E.WRONG_LENGTH, lambda v, n=n: _guard(is_string(v), F.length(as_str(v)) >= n))
    if "maxLength" in schema:
        n = schema["maxLength"]
        add(E.WRONG_LENGTH, lambda v, n=n: _guard(is_string(v), F.length(as_str(v)) <= n))
    if "pattern" in schema:
        p = schema["pattern"]
        _validate_pattern(p, ctx)
        add(E.NO_MATCH, lambda v, p=p: _guard(is_string(v), as_str(v).rlike(p)))
    if "format" in schema and ctx.draft != DRAFT3:
        fp = _format_pred(schema["format"], ctx)
        add(E.WRONG_FORMAT, lambda v, fp=fp: _guard(is_string(v), fp(as_str(v))))

    # ---- examples (draft6) -------------------------------------------------
    # jesse QUIRK reproduced faithfully: the instance must be an array
    # when the schema carries `examples` (jesse_validator_draft6.erl:
    # 157-165 checks is_array(Value); the spec calls it annotation)
    if ctx.draft >= DRAFT6 and "examples" in schema:
        add(E.NOT_ARRAY, lambda v: is_array(v))

    # ---- object -----------------------------------------------------------------
    props: dict = schema.get("properties", {}) or {}
    pattern_props: dict = schema.get("patternProperties", {}) or {}

    req: list[str] = []
    if ctx.draft >= DRAFT4:
        r = schema.get("required")
        if r is not None:
            if not isinstance(r, list):
                raise SchemaError("wrong_required_array", r)
            req = list(r)
    else:
        req = [n for n, s in props.items()
               if isinstance(s, dict) and s.get("required") is True]
    for name in req:
        add(E.MISSING_REQUIRED_PROPERTY,
            lambda v, n=name: _guard(is_object(v), _present(as_map(v), n)),
            observed=lambda v, n=name: F.lit(n))

    # per-keyword code granularity preserved through the recursion —
    # a failing {"properties": {"a": {"minLength": 1}}} reports
    # wrong_length at /a, not a collapsed not_schema_valid, exactly as
    # the typed compiler and jesse's error reports do
    # (jesse_validator_draft4.erl check_value recursion)
    for name, sub in props.items():
        for sc in compile_variant_checks(sub, _ctx=_child(ctx)):
            add(sc.constraint,
                (lambda n, p: lambda v: _guard(
                    is_object(v) & _present(as_map(v), n),
                    p(F.element_at(as_map(v), F.lit(n)))))(name, sc.pred),
                path=f"/{name}{sc.path}",
                observed=(lambda n, o: lambda v:
                          o(F.element_at(as_map(v), F.lit(n))))(
                              name, sc.observed))

    # patternProperties: same inner-code preservation as properties —
    # one forall per inner keyword check over the matching entries
    for pat, sub in pattern_props.items():
        _validate_pattern(pat, ctx)
        for sc in compile_variant_checks(sub, _ctx=_child(ctx)):
            add(sc.constraint,
                (lambda p, sp: lambda v: _guard(is_object(v), F.forall(
                    F.filter(F.map_entries(as_map(v)),
                             lambda e: e.getField("key").rlike(p)),
                    lambda e: sp(e.getField("value")))))(pat, sc.pred),
                path=f"/*{sc.path}")

    addl = schema.get("additionalProperties")
    if addl is not None and addl is not True:
        names = list(props.keys())
        pats = list(pattern_props.keys())

        def extra_keys(v: Column) -> Column:
            def is_extra(k: Column) -> Column:
                e = ~k.isin(*names) if names else F.lit(True)
                for p in pats:
                    e = e & ~k.rlike(p)
                return e
            return F.filter(F.map_keys(as_map(v)), is_extra)

        if addl is False:
            add(E.NO_EXTRA_PROPERTIES_ALLOWED,
                lambda v: _guard(is_object(v), F.size(extra_keys(v)) == 0),
                observed=lambda v: F.to_json(extra_keys(v)))
        else:
            # schema form: inner keyword codes survive over the extras
            for sc in compile_variant_checks(addl, _ctx=_child(ctx)):
                add(sc.constraint,
                    (lambda sp: lambda v: _guard(is_object(v), F.forall(
                        extra_keys(v),
                        lambda k: sp(F.element_at(as_map(v), k)))))(sc.pred),
                    path=f"/*{sc.path}")

    if ctx.draft >= DRAFT6 and "propertyNames" in schema:
        # names are plain strings → reuse the TYPED string compiler;
        # inner codes propagate (jesse_validator_draft6.erl:424-436)
        from jesse_spark.compiler import compile_checks as _typed_checks

        for sc in _typed_checks(schema["propertyNames"], T.StringType(),
                                null_is_absent=False, _ctx=_child(ctx),
                                _path=""):
            add(sc.constraint,
                (lambda sp: lambda v: _guard(
                    is_object(v),
                    F.forall(F.map_keys(as_map(v)), lambda k: sp(k))))(
                        sc.pred),
                path=f"/*{sc.path}")

    for kw2, code, le in (("maxProperties", E.TOO_MANY_PROPERTIES, True),
                          ("minProperties", E.TOO_FEW_PROPERTIES, False)):
        if ctx.draft >= DRAFT4 and kw2 in schema:
            n = schema[kw2]
            if not isinstance(n, int) or isinstance(n, bool) or n < 0:
                raise SchemaError("wrong_%s_properties" % ("max" if le else "min"), n)
            add(code, lambda v, n=n, le=le: _guard(
                is_object(v),
                (F.size(F.map_keys(as_map(v))) <= n) if le
                else (F.size(F.map_keys(as_map(v))) >= n)))

    deps = schema.get("dependencies")
    if isinstance(deps, dict):
        for name, dep in deps.items():
            if isinstance(dep, list):
                for d in dep:
                    add(E.MISSING_DEPENDENCY, lambda v, n=name, d=d: _guard(
                        is_object(v) & _present(as_map(v), n),
                        _present(as_map(v), d)),
                        observed=lambda v, d=d: F.lit(d))
            elif isinstance(dep, str) and ctx.draft == DRAFT3:
                add(E.MISSING_DEPENDENCY, lambda v, n=name, d=dep: _guard(
                    is_object(v) & _present(as_map(v), n),
                    _present(as_map(v), d)),
                    observed=lambda v, d=dep: F.lit(d))
            else:
                # schema form: inner codes propagate, like the typed
                # compiler (jesse_validator_draft4.erl:653-661)
                for sc in compile_variant_checks(dep, _ctx=_child(ctx)):
                    add(sc.constraint,
                        (lambda n, sp: lambda v: _guard(
                            is_object(v) & _present(as_map(v), n),
                            sp(v)))(name, sc.pred),
                        path=sc.path, observed=sc.observed)

    # ---- array -----------------------------------------------------------------
    items = schema.get("items")
    if items is not None:
        if isinstance(items, list):
            # tuple form: inner keyword codes survive at /<i>, like the
            # typed compiler's recursion (compiler.py items tuple form)
            for i, sub in enumerate(items):
                for sc in compile_variant_checks(sub, _ctx=_child(ctx)):
                    add(sc.constraint,
                        (lambda i, p: lambda v: _guard(
                            is_array(v) & (F.size(as_arr(v)) > i),
                            p(F.get(as_arr(v), i))))(i, sc.pred),
                        path=f"/{i}{sc.path}",
                        observed=(lambda i, o: lambda v:
                                  o(F.get(as_arr(v), i)))(i, sc.observed))
            adl = schema.get("additionalItems")
            if adl is False:
                n = len(items)
                add(E.NO_EXTRA_ITEMS_ALLOWED, lambda v, n=n: _guard(
                    is_array(v), F.size(as_arr(v)) <= n))
            elif isinstance(adl, (dict, bool)) and adl is not True:
                ap = sub_pred(adl)
                n = len(items)
                add(E.NOT_SCHEMA_VALID, lambda v, n=n, ap=ap: _guard(
                    is_array(v), F.forall(
                        F.slice(as_arr(v), n + 1,
                                F.greatest(F.size(as_arr(v)) - n, F.lit(0))),
                        lambda x: ap(x))))
        else:
            # single-schema form: one forall per inner keyword check so
            # the element's own violation code surfaces at /*
            for sc in compile_variant_checks(items, _ctx=_child(ctx)):
                add(sc.constraint,
                    (lambda p: lambda v: _guard(
                        is_array(v),
                        F.forall(as_arr(v), lambda x: p(x))))(sc.pred),
                    path=f"/*{sc.path}")

    if "minItems" in schema:
        n = schema["minItems"]
        add(E.WRONG_SIZE, lambda v, n=n: _guard(is_array(v), F.size(as_arr(v)) >= n))
    if "maxItems" in schema:
        n = schema["maxItems"]
        add(E.WRONG_SIZE, lambda v, n=n: _guard(is_array(v), F.size(as_arr(v)) <= n))
    if schema.get("uniqueItems") is True:
        add(E.NOT_UNIQUE, lambda v: _guard(
            is_array(v),
            F.size(F.array_distinct(
                F.transform(as_arr(v), lambda x: _elem_canonical(x))))
            == F.size(as_arr(v))))
    if ctx.draft >= DRAFT6 and "contains" in schema:
        cp = sub_pred(schema["contains"])
        add(E.VALIDATION_ALWAYS_FAILS, lambda v, cp=cp: _guard(
            is_array(v), F.exists(as_arr(v), lambda x: cp(x))))

    # ---- combinators ------------------------------------------------------------
    if ctx.draft >= DRAFT4:
        if "allOf" in schema:
            subs = schema["allOf"]
            if not isinstance(subs, list) or not subs:
                raise SchemaError("wrong_all_of_schema_array", subs)
            ps = [sub_pred(s) for s in subs]
            add(E.ALL_SCHEMAS_NOT_VALID,
                lambda v, ps=ps: _reduce_and([p(v) for p in ps]))
        if "anyOf" in schema:
            subs = schema["anyOf"]
            if not isinstance(subs, list) or not subs:
                raise SchemaError("wrong_any_of_schema_array", subs)
            branch_checks = [
                compile_variant_checks(s, _ctx=_child(ctx)) for s in subs
            ]
            ps = [
                (lambda bc: (lambda v: _reduce_and([c.pred(v) for c in bc])
                             if bc else F.lit(True)))(bc)
                for bc in branch_checks
            ]
            add(E.ANY_SCHEMAS_NOT_VALID,
                lambda v, ps=ps: _reduce_or([p(v) for p in ps]))
            # shortest-error-branch detail (jesse_validator_draft4.erl:
            # 1156-1179 + shortest/2 :1365-1373): when every branch
            # fails, surface the first fewest-failures branch's codes.
            # Capped like the typed compiler: O((B·C)²) expression cost;
            # the drop is warned, not silent
            n_branch_checks = sum(len(bc) for bc in branch_checks)
            if any(branch_checks) and n_branch_checks > ctx.detail_max:
                _warn_anyof_detail_dropped(n_branch_checks, ctx.detail_max)
            if any(branch_checks) and n_branch_checks <= ctx.detail_max:

                def _best_idx(v: Column) -> Column:
                    per_branch = []
                    for bc in branch_checks:
                        cnt = F.lit(0)
                        for c in bc:
                            cnt = cnt + (~F.coalesce(c.pred(v), F.lit(False))).cast("int")
                        per_branch.append(cnt)
                    fc = F.array(*per_branch)
                    return F.array_position(fc, F.array_min(fc)) - 1

                any_ok = lambda v, ps=ps: _reduce_or([p(v) for p in ps])  # noqa: E731
                for i, bc in enumerate(branch_checks):
                    for sc in bc:
                        add(sc.constraint,
                            (lambda i=i, p=sc.pred: lambda v:
                             any_ok(v) | (_best_idx(v) != i)
                             | F.coalesce(p(v), F.lit(False)))(),
                            path=sc.path,
                            observed=sc.observed)
        if "oneOf" in schema:
            subs = schema["oneOf"]
            if not isinstance(subs, list) or not subs:
                raise SchemaError("wrong_one_of_schema_array", subs)
            ps = [sub_pred(s) for s in subs]

            def cnt(v: Column, ps=ps) -> Column:
                c = F.lit(0)
                for p in ps:
                    c = c + F.coalesce(p(v), F.lit(False)).cast("int")
                return c
            add(E.NOT_ONE_SCHEMA_VALID, lambda v: cnt(v) >= 1)
            add(E.MORE_THAN_ONE_SCHEMA_VALID, lambda v: cnt(v) <= 1)
        if "not" in schema:
            p = sub_pred(schema["not"])
            add(E.NOT_SCHEMA_VALID, lambda v, p=p: ~F.coalesce(p(v), F.lit(False)))
    if ctx.draft == DRAFT3 and "extends" in schema:
        subs = schema["extends"]
        subs = subs if isinstance(subs, list) else [subs]
        ps = [sub_pred(s) for s in subs]
        add(E.ALL_SCHEMAS_NOT_VALID,
            lambda v, ps=ps: _reduce_and([p(v) for p in ps]))

    # ---- null/absent wrapper ----------------------------------------------------
    # a SQL-null variant is an ABSENT value: every check passes (absent
    # properties are skipped, jesse_validator_draft4.erl:380-400)
    return [Check(c.constraint, c.path,
                  (lambda pred: lambda v: F.when(v.isNull(), F.lit(True))
                   .otherwise(pred(v)))(c.pred),
                  c.observed)
            for c in checks]


def compile_variant_pred(
    schema: Any,
    *,
    registry: SchemaRegistry | None = None,
    draft: int | None = None,
    ctx: Ctx | None = None,
) -> Builder:
    if ctx is None:
        ctx = Ctx(draft=detect_draft(schema) if draft is None else draft,
                  registry=registry, root=schema)
    cs = compile_variant_checks(schema, _ctx=ctx)
    if not cs:
        return lambda v: F.lit(True)
    return lambda v: _reduce_and([c.pred(v) for c in cs])
