"""Additional reference-parity scenarios: logic formulas over sibling
fields, sum checks, multiplicative/divisive compare_with adjustments,
datetime formatting bounds, string ignore_empty."""

from datetime import datetime

import pytest

from nacc_form_validator_ray.datastore import InMemoryDatastore
from nacc_form_validator_ray.rowval import RecordValidator


def test_logic_or_equality_sib_fields(make_validator):
    schema = {f"sib{i}yob": {"type": "integer", "nullable": True}
              for i in range(1, 6)}
    schema["ftdsibby"] = {
        "type": "integer", "required": True,
        "logic": {"formula": {"or": [
            {"<=": [{"var": "ftdsibby"}, {"var": "sib1yob"}]},
            {"==": [{"var": "ftdsibby"}, {"var": "sib2yob"}]},
            {"==": [{"var": "ftdsibby"}, {"var": "sib3yob"}]},
            {"==": [{"var": "ftdsibby"}, {"var": "sib4yob"}]},
            {"==": [{"var": "ftdsibby"}, {"var": "sib5yob"}]},
        ]}},
    }
    nv = make_validator(schema)
    assert nv.validate({"ftdsibby": 2000, "sib1yob": 2000})
    assert nv.validate({"ftdsibby": 2000, "sib5yob": 2000})
    assert nv.validate({"ftdsibby": 2000, "sib1yob": None,
                        "sib2yob": None, "sib3yob": 2000})
    assert not nv.validate({"ftdsibby": 2000, "sib1yob": 1990,
                            "sib2yob": 1991, "sib3yob": 1992,
                            "sib4yob": 1993, "sib5yob": 1994})
    assert nv.errors == {
        "ftdsibby": [
            "error in formula evaluation - value 2000 does not satisfy "
            "the specified formula"
        ]
    }
    assert not nv.validate({"ftdsibby": 2000})


def test_logic_sum(make_validator):
    schema = {
        "var1": {"type": "integer"},
        "var2": {"type": "integer"},
        "var3": {"type": "integer"},
        "total": {"type": "integer",
                  "logic": {"formula": {"==": [
                      {"var": "total"},
                      {"+": [{"var": "var1"}, {"var": "var2"},
                             {"var": "var3"}]}]}}},
    }
    nv = make_validator(schema)
    assert nv.validate({"total": 10, "var1": 5, "var2": 3, "var3": 2})
    assert nv.validate({"total": 10, "var1": 20, "var2": -5, "var3": -5})
    assert not nv.validate({"total": 9, "var1": 5, "var2": 3, "var3": 2})


def test_logic_count_exact_ignores_blanks(make_validator):
    schema = {f"var{i}": {"type": "integer", "nullable": True}
              for i in range(1, 5)}
    schema["target"] = {
        "type": "integer", "required": True,
        "logic": {"formula": {"==": [
            {"var": "target"},
            {"count_exact": [1, {"var": "var1"}, {"var": "var2"},
                             {"var": "var3"}, {"var": "var4"}]}]}},
    }
    nv = make_validator(schema)
    assert nv.validate({"target": 2, "var1": 1, "var2": 0, "var3": 1,
                        "var4": None})
    assert nv.validate({"target": 0, "var1": None, "var2": None,
                        "var3": None, "var4": None})
    assert not nv.validate({"target": 3, "var1": 1, "var2": 0,
                            "var3": 1, "var4": None})


def test_compare_with_multiplicative_and_divisive(make_validator):
    schema = {
        "base": {"type": "integer", "required": True},
        "double_it": {"type": "integer", "required": True,
                      "compare_with": {"comparator": "==", "base": "base",
                                       "adjustment": 2, "op": "*"}},
        "half_it": {"type": "float", "required": True,
                    "compare_with": {"comparator": "==", "base": "base",
                                     "adjustment": 2, "op": "/"}},
    }
    nv = make_validator(schema)
    assert nv.validate({"base": 10, "double_it": 20, "half_it": 5.0})
    assert not nv.validate({"base": 10, "double_it": 21, "half_it": 5.0})
    assert nv.errors == {
        "double_it": [
            "input value doesn't satisfy the condition "
            "double_it == base * 2"
        ]
    }
    assert not nv.validate({"base": 10, "double_it": 20, "half_it": 4.0})


def test_datetime_formatting_minmax(make_validator):
    schema = {
        "stamp": {"type": "string", "formatting": "datetime",
                  "min": "2020-01-01 00:00:00",
                  "max": "2020-12-31 23:59:59"},
    }
    nv = make_validator(schema)
    assert nv.validate({"stamp": "2020-06-15 12:00:00"})
    assert not nv.validate({"stamp": "2019-12-31 23:59:59"})
    assert nv.errors == {"stamp": ["min value is 2020-01-01 00:00:00"]}
    assert not nv.validate({"stamp": "2021-01-01 00:00:00"})
    assert nv.errors == {"stamp": ["max value is 2020-12-31 23:59:59"]}


def test_temporal_ignore_empty_as_string():
    """ignore_empty accepts a single field name (normalized to a list)."""
    ds = InMemoryDatastore(
        "pid", "visit",
        records={"P1": [
            {"visit": 1, "score": None},
            {"visit": 2, "score": 4},
        ]})
    schema = {
        "pid": {"type": "string"},
        "visit": {"type": "integer"},
        "score": {
            "type": "integer", "nullable": True,
            "temporalrules": [{
                "ignore_empty": "score",
                "previous": {"score": {"allowed": [4]}},
                "current": {"score": {"forbidden": [9]}},
            }],
        },
    }
    nv = RecordValidator(schema, primary_key="pid", datastore=ds)
    # previous nonempty of visit 3 is visit 2 (score=4) -> current rule
    assert not nv.validate({"pid": "P1", "visit": 3, "score": 9})
    nv.reset_record_cache()
    assert nv.validate({"pid": "P1", "visit": 3, "score": 5})
    # before visit 1 there is no nonempty history -> pass through
    nv.reset_record_cache()
    assert nv.validate({"pid": "P1", "visit": 1, "score": 9})


def test_compare_with_current_month_day(make_validator):
    from nacc_form_validator_ray.utils import Clock
    clock = Clock(datetime(2026, 8, 17))
    schema = {
        "mo": {"type": "integer", "required": True,
               "compare_with": {"comparator": "<=",
                                "base": "current_month"}},
        "dy": {"type": "integer", "required": True,
               "compare_with": {"comparator": "<=",
                                "base": "current_day"}},
    }
    nv = make_validator(schema, clock=clock)
    assert nv.validate({"mo": 8, "dy": 17})
    assert not nv.validate({"mo": 9, "dy": 17})
    assert not nv.validate({"mo": 8, "dy": 18})


def test_ftdsnrat_ratio_guarded_division(make_validator):
    """The C2F ftdsnrat stack: compatibility guarded by a count_exact
    formula that prevents divide-by-zero, then a ratio equality check
    (condensed from the reference's hardest compatibility test)."""
    schema = {
        "ftdhaird": {"nullable": True, "type": "integer",
                     "allowed": [0, 1]},
        "ftdspit": {"nullable": True, "type": "integer",
                    "allowed": [0, 1]},
        "ftdnose": {"nullable": True, "type": "integer",
                    "allowed": [0, 1]},
        "ftdsnrat": {
            "nullable": True, "type": "float",
            "anyof": [{"min": 0.0, "max": 3.0}, {"allowed": [88.88]}],
            "compatibility": [
                {"index": 0, "if_op": "and",
                 "if": {
                     "ftdhaird": {"allowed": [0, 1]},
                     "ftdspit": {"allowed": [0, 1]},
                     "ftdnose": {"allowed": [0, 1]},
                     "ftdsnrat": {"logic": {"formula": {"and": [
                         {"!=": [0, {"count_exact": [
                             0, {"var": "ftdhaird"}, {"var": "ftdspit"},
                             {"var": "ftdnose"}]}]},
                         {"!=": [0, {"count_exact": [
                             1, {"var": "ftdhaird"}, {"var": "ftdspit"},
                             {"var": "ftdnose"}]}]},
                     ]}}},
                 },
                 "then": {"ftdsnrat": {"logic": {"formula": {"==": [
                     {"var": "ftdsnrat"},
                     {"/": [
                         {"count_exact": [1, {"var": "ftdhaird"},
                                          {"var": "ftdspit"},
                                          {"var": "ftdnose"}]},
                         {"count_exact": [0, {"var": "ftdhaird"},
                                          {"var": "ftdspit"},
                                          {"var": "ftdnose"}]},
                     ]}]}}}}},
                {"index": 2, "if_op": "and",
                 "if": {"ftdhaird": {"allowed": [0]},
                        "ftdspit": {"allowed": [0]},
                        "ftdnose": {"allowed": [0]}},
                 "then": {"ftdsnrat": {"allowed": [88.88]}}},
            ],
        },
    }
    nv = make_validator(schema)
    assert nv.validate({"ftdsnrat": 88.88, "ftdhaird": 0, "ftdspit": 0,
                        "ftdnose": 0})
    assert nv.validate({"ftdsnrat": 88.88, "ftdhaird": None,
                        "ftdspit": None, "ftdnose": None})
    assert nv.validate({"ftdsnrat": 2.0, "ftdhaird": 1, "ftdspit": 1,
                        "ftdnose": 0})
    assert nv.validate({"ftdsnrat": 0.5, "ftdhaird": 0, "ftdspit": 1,
                        "ftdnose": 0})
    assert not nv.validate({"ftdsnrat": 0.0, "ftdhaird": 0,
                            "ftdspit": 0, "ftdnose": 0})
    assert nv.errors == {
        "ftdsnrat": [
            "('ftdsnrat', ['unallowed value 0.0']) for if {'ftdhaird': "
            "{'allowed': [0]}, 'ftdspit': {'allowed': [0]}, 'ftdnose': "
            "{'allowed': [0]}} then {'ftdsnrat': {'allowed': [88.88]}} "
            "- compatibility rule no: 2"
        ]
    }


def test_compare_age_invalid_comparison_type(date_constraint,
                                             make_validator):
    """Comparing an age against a non-numeric field raises TypeError in
    compare_values -> code 0x3004 with the error text."""
    schema = {
        "frmdate": {
            "type": "string", "formatting": "date",
            "regex": date_constraint,
            "compare_age": {"comparator": ">=", "birth_year": "birthyr",
                            "compare_to": "label"},
        },
        "birthyr": {"type": "integer"},
        "label": {"type": "string"},
    }
    nv = make_validator(schema)
    assert not nv.validate({"frmdate": "2024/02/02", "birthyr": 1950,
                            "label": "hello"})
    msgs = nv.errors["frmdate"]
    assert len(msgs) == 1
    assert msgs[0].startswith("Error in comparing label to age at "
                              "frmdate (")
    assert "not supported between instances of 'float' and 'str'" \
        in msgs[0]
