"""Violation codes — parity with jesse's data-error atoms.

The reference defines its error vocabulary as Erlang atoms in
src/jesse_schema_validator.hrl:123-150 (data errors) and :104-121
(schema errors).  We reuse the exact atom names as violation-code
strings so that violation rows `(clip_id, constraint, path, observed)`
are comparable with jesse's `{data_invalid, Schema, ErrorType, Value,
Path}` 5-tuples (src/jesse_error.erl:39-48, 85-92).
"""

from __future__ import annotations


class ErrorCodes:
    # data errors (jesse_schema_validator.hrl:123-150)
    MISSING_REQUIRED_PROPERTY = "missing_required_property"
    MISSING_DEPENDENCY = "missing_dependency"
    NO_MATCH = "no_match"
    NO_EXTRA_PROPERTIES_ALLOWED = "no_extra_properties_allowed"
    NO_EXTRA_ITEMS_ALLOWED = "no_extra_items_allowed"
    NOT_ALLOWED = "not_allowed"
    NOT_UNIQUE = "not_unique"
    NOT_IN_ENUM = "not_in_enum"
    NOT_IN_RANGE = "not_in_range"
    NOT_DIVISIBLE = "not_divisible"
    NOT_ARRAY = "not_array"
    WRONG_TYPE = "wrong_type"
    WRONG_SIZE = "wrong_size"
    WRONG_LENGTH = "wrong_length"
    WRONG_FORMAT = "wrong_format"
    TOO_MANY_PROPERTIES = "too_many_properties"
    TOO_FEW_PROPERTIES = "too_few_properties"
    ALL_SCHEMAS_NOT_VALID = "all_schemas_not_valid"
    ANY_SCHEMAS_NOT_VALID = "any_schemas_not_valid"
    NOT_MULTIPLE_OF = "not_multiple_of"
    NOT_ONE_SCHEMA_VALID = "not_one_schema_valid"
    MORE_THAN_ONE_SCHEMA_VALID = "more_than_one_schema_valid"
    NOT_SCHEMA_VALID = "not_schema_valid"
    VALIDATION_ALWAYS_FAILS = "validation_always_fails"
    EXTERNAL = "external"
    WRONG_TYPE_SPECIFICATION = "wrong_type_specification"
    # engine-level (table checks; no jesse analog — north_star additions)
    SCHEMA_NOT_FOUND = "schema_not_found"  # RI violation code (FIXTURES.md §1.2)
    DRIFT = "distribution_drift"
    # fail-closed verdict for instances nested deeper than the
    # recursive-$ref unroll budget (jesse resolves refs lazily and has
    # no analog; plan inlining must bound the expansion)
    REF_UNROLL_EXCEEDED = "ref_unroll_exceeded"


class SchemaError(Exception):
    """Raised at compile time for invalid schemas.

    jesse raises `{schema_invalid, Schema, Error}`
    (src/jesse_error.erl:51-60); we fail plan compilation on the driver
    instead — an invalid schema should never reach the cluster.
    """

    def __init__(self, code: str, detail: object = None):
        self.code = code
        self.detail = detail
        super().__init__(f"schema_invalid: {code}: {detail!r}")
