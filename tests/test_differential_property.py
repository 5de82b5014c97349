"""Property-based differential testing: for randomized rule schemas and
records, the vectorized batch engine must agree with the row oracle on
the pass bit and per-field error codes."""

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from nacc_form_validator_ray.engine import BatchValidator, CompiledSchema
from nacc_form_validator_ray.rowval import RecordValidator

FIELDS = ["f_int", "f_float", "f_str"]

int_rule = st.fixed_dictionaries(
    {"type": st.just("integer")},
    optional={
        "nullable": st.booleans(),
        "min": st.integers(-5, 5),
        "max": st.integers(-5, 10),
        "allowed": st.lists(st.integers(-3, 8), min_size=1, max_size=5),
        "forbidden": st.lists(st.integers(-3, 8), min_size=1, max_size=3),
        "filled": st.booleans(),
    })

float_rule = st.fixed_dictionaries(
    {"type": st.just("float")},
    optional={
        "nullable": st.booleans(),
        "min": st.floats(-5, 5, allow_nan=False),
        "max": st.floats(-5, 10, allow_nan=False),
        "compare_with": st.one_of(
            st.fixed_dictionaries({
                "comparator": st.sampled_from(["==", "!=", "<", "<=",
                                               ">", ">="]),
                "base": st.one_of(st.integers(-3, 3),
                                  st.just("f_int")),
            }),
            # adjusted comparisons incl. the op=abs null-adjustment
            # semantics (round-1 ADVICE #4)
            st.fixed_dictionaries({
                "comparator": st.sampled_from(["==", "!=", "<", "<=",
                                               ">", ">="]),
                "base": st.one_of(st.integers(-3, 3),
                                  st.just("f_int")),
                "op": st.sampled_from(["+", "-", "abs"]),
                "adjustment": st.one_of(st.integers(-2, 2),
                                        st.just("f_int")),
            })),
    })

str_rule = st.fixed_dictionaries(
    {"type": st.just("string")},
    optional={
        "nullable": st.booleans(),
        "allowed": st.lists(st.sampled_from(["a", "b", "c"]), min_size=1,
                            max_size=3),
        "regex": st.sampled_from([r"^[abc]+$", r"^a.*", r"[0-9]+"]),
        "filled": st.booleans(),
    })

schema_strategy = st.fixed_dictionaries({
    "f_int": int_rule,
    "f_float": float_rule,
    "f_str": str_rule,
})

# CSV-shaped and WRONGLY-TYPED values are first-class: string digits
# must cast, unparsable strings must fail the type rule identically in
# both engines, and non-strings under string-typed fields must fail the
# string type rule (round-1 ADVICE #1/#2 bug classes)
value_int = st.one_of(st.none(), st.integers(-6, 12),
                      st.sampled_from(["3", "-1", "x", "2.0", ""]))
value_float = st.one_of(st.none(), st.floats(-6, 12, allow_nan=False),
                        st.sampled_from(["1.5", "-2", "abc", ""]))
value_str = st.one_of(st.none(),
                      st.sampled_from(["a", "b", "c", "abc", "zz", "42",
                                       ""]),
                      st.integers(-2, 3), st.booleans(),
                      st.floats(-2, 2, allow_nan=False))

records_strategy = st.lists(
    st.fixed_dictionaries({"f_int": value_int, "f_float": value_float,
                           "f_str": value_str}),
    min_size=1, max_size=25)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(schema=schema_strategy, records=records_strategy)
def test_batch_matches_row_oracle(schema, records):
    compiled = CompiledSchema(schema, strict=False)
    bv = BatchValidator(compiled, collect="codes")
    df = pd.DataFrame.from_records(records).astype(object)
    df = df.where(pd.notna(df), None)
    _, result = bv.validate_frame(df)

    rv = RecordValidator(schema, allow_unknown=True, clock=compiled.clock)
    batch_codes = {}
    for i, f, c in zip(result.row_idx, result.fields, result.codes):
        batch_codes.setdefault(i, set()).add((f, c))
    for i, rec in enumerate(records):
        cst = rv.cast_record(dict(rec))
        passed = rv.validate(cst)
        row_codes = {(e.field, e.code) for e in rv.error_entries}
        assert bool(result.passed[i]) == passed, \
            (rec, schema, batch_codes.get(i), row_codes)
        assert batch_codes.get(i, set()) == row_codes, (rec, schema)


compat_schema_strategy = st.fixed_dictionaries({
    "cond": st.fixed_dictionaries({"type": st.just("integer"),
                                   "nullable": st.just(True)}),
    "dep": st.fixed_dictionaries(
        {"type": st.just("integer"), "nullable": st.just(True),
         "compatibility": st.lists(st.fixed_dictionaries({
             "if": st.fixed_dictionaries({
                 "cond": st.fixed_dictionaries({
                     "allowed": st.lists(st.integers(0, 3), min_size=1,
                                         max_size=2)})}),
             "then": st.sampled_from([
                 {"dep": {"nullable": False}},
                 {"dep": {"nullable": True, "filled": False}},
                 {"dep": {"allowed": [1, 2]}},
             ]),
         }), min_size=1, max_size=2)}),
})

compat_records = st.lists(
    st.fixed_dictionaries({
        "cond": st.one_of(st.none(), st.integers(0, 4)),
        "dep": st.one_of(st.none(), st.integers(0, 4)),
    }), min_size=1, max_size=20)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(schema=compat_schema_strategy, records=compat_records)
def test_compatibility_batch_matches_row_oracle(schema, records):
    compiled = CompiledSchema(schema, strict=False)
    bv = BatchValidator(compiled, collect="codes")
    df = pd.DataFrame.from_records(records).astype(object)
    df = df.where(pd.notna(df), None)
    _, result = bv.validate_frame(df)
    rv = RecordValidator(schema, allow_unknown=True, clock=compiled.clock)
    for i, rec in enumerate(records):
        passed = rv.validate(rv.cast_record(dict(rec)))
        assert bool(result.passed[i]) == passed, (rec, schema)
