"""Differential tests: the vectorized batch engine must agree with the
row-level oracle (pass bit + error codes per field) on randomized records."""

import random

import numpy as np
import pandas as pd
import pytest

from nacc_form_validator_ray.engine import (BatchValidator, CompiledSchema)
from nacc_form_validator_ray.rowval import RecordValidator


def run_both(schema, records, strict=False, **compiled_kw):
    """Run batch + row engines; return (batch_result, row_outcomes)."""
    compiled = CompiledSchema(schema, strict=strict, **compiled_kw)
    bv = BatchValidator(compiled, collect="codes")
    df = pd.DataFrame.from_records(records)
    cframe, result = bv.validate_frame(df)

    rv = RecordValidator(schema, allow_unknown=not strict,
                         clock=compiled.clock)
    row_outcomes = []
    for rec in records:
        cst = rv.cast_record({k: v for k, v in rec.items()})
        passed = rv.validate(cst)
        row_outcomes.append((passed, rv.error_entries))
    return result, row_outcomes


def assert_parity(schema, records, strict=False, **kw):
    result, rows = run_both(schema, records, strict=strict, **kw)
    batch_codes = {}
    for i, f, c in zip(result.row_idx, result.fields, result.codes):
        batch_codes.setdefault(i, set()).add((f, c))
    for i, (passed, entries) in enumerate(rows):
        assert result.passed[i] == passed, (
            f"row {i}: batch={result.passed[i]} row={passed} "
            f"rec={records[i]} batch_codes={batch_codes.get(i)} "
            f"row_codes={[(e.field, hex(e.code)) for e in entries]}")
        row_codes = {(e.field, e.code) for e in entries}
        assert batch_codes.get(i, set()) == row_codes, (
            f"row {i}: rec={records[i]} batch={batch_codes.get(i)} "
            f"row={row_codes}")


F3_SCHEMA = {
    "adcid": {"type": "integer", "required": True, "min": 0, "max": 68},
    "prevenrl": {"type": "integer", "required": True, "allowed": [0, 1, 9]},
    "oldadcid": {
        "type": "integer",
        "nullable": True,
        "anyof": [{"min": 0, "max": 68}, {"allowed": [-1]}],
        "compatibility": [
            {"index": 0, "if": {"prevenrl": {"allowed": [1]}},
             "then": {"oldadcid": {"nullable": False}}},
            {"index": 1, "if": {"prevenrl": {"allowed": [0, 9]}},
             "then": {"oldadcid": {"nullable": True, "filled": False}}},
        ],
        "logic": {"formula": {"!=": [{"var": "oldadcid"},
                                     {"var": "adcid"}]}},
    },
    "mode": {"type": "integer", "nullable": True, "allowed": [1, 2, 3]},
    "rmreason": {
        "nullable": True,
        "type": "integer",
        "compatibility": [
            {"if": {"mode": {"allowed": [2]}},
             "then": {"rmreason": {"nullable": False}}},
            {"if": {"mode": {"allowed": [1, 3]}},
             "then": {"rmreason": {"nullable": True, "filled": False}}},
        ],
        "allowed": [1, 2, 3, 4, 5],
    },
}


def test_f3_compatibility_parity_random():
    rng = random.Random(42)
    records = []
    for _ in range(300):
        records.append({
            "adcid": rng.choice([None, -5, 0, 10, 68, 70]),
            "prevenrl": rng.choice([None, 0, 1, 9, 5]),
            "oldadcid": rng.choice([None, -1, -3, 0, 10, 68, 99]),
            "mode": rng.choice([None, 1, 2, 3, 7]),
            "rmreason": rng.choice([None, 1, 3, 5, 9]),
        })
    assert_parity(F3_SCHEMA, records)


def test_string_cast_inputs_parity():
    """String-valued records (the CSV path) including cast failures."""
    rng = random.Random(7)
    records = []
    for _ in range(200):
        records.append({
            "adcid": rng.choice(["", "0", "42", "70", "hello", "-1"]),
            "prevenrl": rng.choice(["", "0", "1", "9", "3", "x"]),
            "oldadcid": rng.choice(["", "-1", "5", "99", "1e2"]),
            "mode": rng.choice(["", "1", "2", "3"]),
            "rmreason": rng.choice(["", "2", "6"]),
        })
    assert_parity(F3_SCHEMA, records)


GDS_KEYS = ["satis", "dropact", "empty", "bored", "spirits", "afraid",
            "happy", "helpless", "stayhome", "memprob", "wondrful",
            "wrthless", "energy", "hopeless", "better"]


def test_gds_parity_random():
    schema = {k: {"required": True, "type": "integer", "allowed": [0, 1, 9]}
              for k in GDS_KEYS}
    schema["gds"] = {
        "required": True, "type": "integer",
        "anyof": [{"min": 0, "max": 15}, {"allowed": [88]}],
        "compute_gds": list(GDS_KEYS),
    }
    schema["nogds"] = {"nullable": True, "type": "integer",
                       "allowed": [0, 1]}
    rng = random.Random(11)
    records = []
    for _ in range(300):
        rec = {k: rng.choice([0, 1, 9]) for k in GDS_KEYS}
        rec["gds"] = rng.choice([0, 5, 12, 15, 88, 20])
        rec["nogds"] = rng.choice([None, 0, 1])
        records.append(rec)
    assert_parity(schema, records)


def test_compare_with_parity_random():
    schema = {
        "base_value": {"type": "integer", "required": True,
                       "nullable": True},
        "adjustment_value": {"type": "integer", "nullable": True},
        "test_var": {
            "type": "integer", "required": True, "nullable": True,
            "compare_with": {"comparator": "==", "base": "base_value",
                             "adjustment": "adjustment_value", "op": "+"},
        },
        "waist1": {
            "type": "float", "nullable": True,
            "compare_with": {"comparator": "<=", "base": "waist2",
                             "op": "abs", "adjustment": 0.5},
        },
        "waist2": {"type": "float", "nullable": True},
        "h": {
            "type": "float", "nullable": True,
            "compare_with": {"comparator": "<=", "base": "hbase",
                             "base_decimal": "hdec", "op": "abs",
                             "adjustment": 5},
        },
        "hbase": {"type": "float", "nullable": True},
        "hdec": {"type": "float", "nullable": True},
    }
    rng = random.Random(3)
    records = []
    for _ in range(400):
        records.append({
            "base_value": rng.choice([None, 0, 3, 5]),
            "adjustment_value": rng.choice([None, -3, 0, 2]),
            "test_var": rng.choice([None, 0, 5, 7]),
            "waist1": rng.choice([None, 4.4, 5.0, 5.3]),
            "waist2": rng.choice([None, 4.5, 5.0, 5.55]),
            "h": rng.choice([None, 60.0, 65.5]),
            "hbase": rng.choice([None, 60.0, 65.0]),
            "hdec": rng.choice([None, 0.0, 9.0]),
        })
    assert_parity(schema, records)


def test_logic_vector_parity():
    schema = {
        "raceasian": {"type": "integer", "nullable": True, "allowed": [1]},
        "raceblack": {"type": "integer", "nullable": True, "allowed": [1]},
        "raceaian": {
            "type": "integer", "nullable": True, "allowed": [1],
            "logic": {"formula": {"or": [
                {"==": [1, {"var": "raceaian"}]},
                {"==": [1, {"var": "raceasian"}]},
                {"==": [1, {"var": "raceblack"}]},
            ]}},
        },
    }
    rng = random.Random(5)
    records = [{
        "raceasian": rng.choice([None, 1, 2]),
        "raceblack": rng.choice([None, 1, 0]),
        "raceaian": rng.choice([None, 1, 3]),
    } for _ in range(200)]
    assert_parity(schema, records)


def test_minmax_current_year_parity():
    schema = {
        "birthyr": {"type": "integer", "nullable": True, "min": 1850,
                    "max": "current_year"},
    }
    records = [{"birthyr": v}
               for v in (None, 1800, 1850, 1999, 2024, 2030, 3000)]
    assert_parity(schema, records)


def test_date_formatting_minmax_parity(date_constraint):
    schema = {
        "frmdate": {
            "type": "string", "nullable": True, "formatting": "date",
            "regex": date_constraint,
            "min": "2012/01/01", "max": "02/02/2024",
        }
    }
    records = [{"frmdate": v} for v in
               (None, "2024/02/02", "01/01/2012", "06/09/2019",
                "2011/12/31", "01/01/2011", "2024/03/03", "13/13/2020",
                "hello")]
    assert_parity(schema, records)


def test_typed_parquet_like_input():
    """Numeric/datetime pandas dtypes take the zero-loop fast path."""
    schema = {
        "qty": {"type": "float", "required": True, "min": 0, "max": 100},
        "flag": {"type": "string", "allowed": ["A", "N", "R"]},
    }
    df = pd.DataFrame({
        "qty": np.array([5.0, -2.0, 200.0, 50.0]),
        "flag": ["A", "N", "X", "R"],
    })
    compiled = CompiledSchema(schema, strict=False)
    bv = BatchValidator(compiled)
    _, result = bv.validate_frame(df)
    assert list(result.passed) == [True, False, False, True]
    codes = {(i, f): c for i, f, c in
             zip(result.row_idx, result.fields, result.codes)}
    assert codes[(1, "qty")] == 0x42
    assert codes[(2, "qty")] == 0x43
    assert codes[(2, "flag")] == 0x44


def test_full_collect_messages_match_row_oracle():
    compiled = CompiledSchema(F3_SCHEMA, strict=False)
    bv = BatchValidator(compiled, collect="full")
    records = [
        {"adcid": 0, "prevenrl": 1, "oldadcid": None, "mode": 2,
         "rmreason": 1},
        {"adcid": 0, "prevenrl": 0, "oldadcid": 1, "mode": 1,
         "rmreason": 9},
    ]
    df = pd.DataFrame.from_records(records)
    _, result = bv.validate_frame(df)
    rv = RecordValidator(F3_SCHEMA, allow_unknown=True, clock=compiled.clock)
    for i, rec in enumerate(records):
        rv.validate(rv.cast_record(dict(rec)))
        expected = sorted((e.field, e.code, e.message)
                          for e in rv.error_entries)
        got = sorted((f, c, m) for j, f, c, m in
                     zip(result.row_idx, result.fields, result.codes,
                         result.messages) if j == i)
        assert got == expected


def test_anyof_child_with_divergent_type_goes_row_path():
    """A type declared inside an anyof child that differs from the
    field's dtype must still be enforced (row path)."""
    schema = {
        "v": {"nullable": True,
              "anyof": [{"type": "string", "allowed": ["x"]},
                        {"type": "integer", "min": 100}]},
    }
    records = [{"v": "x"}, {"v": 150}, {"v": 5}, {"v": "y"}, {"v": None}]
    assert_parity(schema, records)


def test_compat_cond_with_divergent_type_goes_row_path():
    schema = {
        "a": {"type": "integer", "nullable": True},
        "b": {"type": "integer", "nullable": True,
              "compatibility": [{
                  "if": {"a": {"type": "string"}},
                  "then": {"b": {"nullable": False}}}]},
    }
    # `a` is an int, so the if-clause's string type check always fails
    # -> then never enforced
    records = [{"a": 1, "b": None}, {"a": None, "b": None},
               {"a": 2, "b": 3}]
    assert_parity(schema, records)


def test_score_variables_vector_parity():
    schema = {
        "total": {
            "type": "integer", "required": True, "nullable": True,
            "function": {
                "name": "score_variables",
                "args": {
                    "mode": "correct",
                    "scoring_key": {"val1": 1, "val2": 2, "val3": 3},
                    "logic": {"formula": {"==": [
                        {"var": "total"}, {"var": "__total_sum"}]}},
                },
            },
        },
        "val1": {"type": "integer", "nullable": True},
        "val2": {"type": "integer", "nullable": True},
        "val3": {"type": "integer", "nullable": True},
    }
    from nacc_form_validator_ray.engine import CompiledSchema
    assert "total" in CompiledSchema(schema, strict=False).vector_fields
    rng = random.Random(9)
    records = [{
        "total": rng.choice([None, 0, 1, 2, 3, 5]),
        "val1": rng.choice([None, 1, 5]),
        "val2": rng.choice([None, 2, 0]),
        "val3": rng.choice([None, 3, -7]),
    } for _ in range(300)]
    assert_parity(schema, records)


def test_compare_age_vector_parity(date_constraint):
    schema = {
        "frmdate": {
            "type": "string", "nullable": True, "formatting": "date",
            "regex": date_constraint,
            "compare_age": {"comparator": ">=", "birth_year": "birthyr",
                            "birth_month": "birthmo",
                            "compare_to": ["behage", 0]},
        },
        "birthmo": {"type": "integer", "nullable": True, "min": 1,
                    "max": 12},
        "birthyr": {"type": "integer", "nullable": True},
        "behage": {"type": "integer", "nullable": True},
    }
    from nacc_form_validator_ray.engine import CompiledSchema
    assert "frmdate" in CompiledSchema(schema, strict=False).vector_fields
    rng = random.Random(17)
    records = [{
        "frmdate": rng.choice([None, "2024/02/02", "01/15/2020",
                               "garbage"]),
        "birthmo": rng.choice([None, 1, 6, 12]),
        "birthyr": rng.choice([None, 1950, 2000, 2024]),
        "behage": rng.choice([None, 0, 24, 50, 90]),
    } for _ in range(300)]
    assert_parity(schema, records)


def test_vocab_checks_vectorized_with_bulk_datastore():
    from nacc_form_validator_ray.datastore import InMemoryDatastore
    schema = {
        "drug": {"type": "integer", "nullable": True,
                 "function": {"name": "check_rxcui"}},
        "adcid": {"type": "integer", "nullable": True,
                  "function": {"name": "check_adcid"}},
        "oldadcid": {"type": "integer", "nullable": True,
                     "function": {"name": "check_adcid",
                                  "args": {"own": False}}},
    }
    ds = InMemoryDatastore("p", "o", valid_rxcui=set(range(50)),
                           own_adcid=0, valid_adcids={0, 2, 5, 8, 10})
    compiled = CompiledSchema(schema, strict=False)
    assert set(compiled.vector_fields) == {"drug", "adcid", "oldadcid"}
    bv = BatchValidator(compiled, datastore=ds, collect="codes")
    assert set(bv.vector_fields) == {"drug", "adcid", "oldadcid"}

    rng = random.Random(23)
    records = [{
        "drug": rng.choice([None, 0, 1, 49, 50, -1, 100]),
        "adcid": rng.choice([None, 0, 1, 5]),
        "oldadcid": rng.choice([None, 0, 2, 10, 20]),
    } for _ in range(200)]

    df = pd.DataFrame.from_records(records).astype(object)
    df = df.where(pd.notna(df), None)
    _, result = bv.validate_frame(df)
    rv = RecordValidator(schema, allow_unknown=True, datastore=ds,
                         clock=compiled.clock)
    batch_codes = {}
    for i, f, c in zip(result.row_idx, result.fields, result.codes):
        batch_codes.setdefault(i, set()).add((f, c))
    for i, rec in enumerate(records):
        passed = rv.validate(rv.cast_record(dict(rec)))
        row_codes = {(e.field, e.code) for e in rv.error_entries}
        assert bool(result.passed[i]) == passed, (rec,)
        assert batch_codes.get(i, set()) == row_codes, (rec,)


def test_vocab_checks_fall_back_without_bulk_datastore():
    from nacc_form_validator_ray.datastore import InMemoryDatastore
    from datetime import date
    schema = {
        "drug": {"type": "integer", "nullable": True,
                 "function": {"name": "check_rxcui"}},
    }
    # date windows -> no bulk vocabulary -> row path
    ds = InMemoryDatastore("p", "o", valid_rxcui={1, 2},
                           rxcui_date_window={1: (date(2020, 1, 1),
                                                  None)})
    bv = BatchValidator(CompiledSchema(schema, strict=False),
                        datastore=ds)
    assert "drug" in bv.row_fields and "drug" not in bv.vector_fields
    df = pd.DataFrame({"drug": [1, 2, 9]}).astype(object)
    _, result = bv.validate_frame(df)
    assert list(result.passed) == [True, True, False]


def test_compare_with_current_sentinels_parity():
    from datetime import datetime
    from nacc_form_validator_ray.utils import Clock
    schema = {
        "yr": {"type": "integer", "nullable": True,
               "compare_with": {"comparator": "<=",
                                "base": "current_year"}},
        "mo": {"type": "integer", "nullable": True,
               "compare_with": {"comparator": "<=",
                                "base": "current_month"}},
        "dy": {"type": "integer", "nullable": True,
               "compare_with": {"comparator": "<",
                                "base": "current_day"}},
    }
    records = [{"yr": y, "mo": m, "dy": d}
               for y in (None, 2020, 2026, 2030)
               for m in (None, 7, 8, 9)
               for d in (None, 16, 17, 18)]
    assert_parity(schema, records,
                  clock=Clock(datetime(2026, 8, 17)))
