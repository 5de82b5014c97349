"""Conformance tests for the custom rule families: compatibility, logic,
compare_with, compare_age, compute_gds, score_variables. Expected error
shapes mirror the reference suite."""

import pytest

from nacc_form_validator_ray.utils import Clock
from datetime import datetime


# ------------------------------------------------------------ compatibility


def test_compatibility_if_then(make_validator):
    schema = {
        "mode": {"required": True, "type": "integer", "allowed": [1, 2, 3]},
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
    nv = make_validator(schema)
    for i in range(1, 6):
        assert nv.validate({"mode": 2, "rmreason": i})
    assert nv.validate({"mode": 1, "rmreason": None})
    assert nv.validate({"mode": 3, "rmreason": None})

    assert not nv.validate({"mode": 2, "rmreason": 9})
    assert nv.errors == {"rmreason": ["unallowed value 9"]}
    assert not nv.validate({"mode": 2, "rmreason": None})
    assert nv.errors == {
        "rmreason": [
            "('rmreason', ['null value not allowed']) for if {'mode': "
            "{'allowed': [2]}} then {'rmreason': {'nullable': False}} "
            "- compatibility rule no: 0"
        ]
    }
    assert not nv.validate({"mode": 3, "rmreason": 1})
    assert nv.errors == {
        "rmreason": [
            "('rmreason', ['must be empty']) for if {'mode': "
            "{'allowed': [1, 3]}} then {'rmreason': {'nullable': True, "
            "'filled': False}} - compatibility rule no: 1"
        ]
    }
    # allowed error sorts before the compatibility error (rule-name order)
    assert not nv.validate({"mode": 1, "rmreason": 9})
    assert nv.errors == {
        "rmreason": [
            "unallowed value 9",
            "('rmreason', ['must be empty']) for if {'mode': "
            "{'allowed': [1, 3]}} then {'rmreason': {'nullable': True, "
            "'filled': False}} - compatibility rule no: 1",
        ]
    }


def test_compatibility_if_or_multiple_variables(make_validator):
    schema = {
        "majordep": {"type": "integer", "required": True,
                     "allowed": [0, 1, 2, 9]},
        "otherdep": {"type": "integer", "required": True,
                     "allowed": [0, 1, 2, 9]},
        "deprtreat": {
            "type": "integer", "nullable": True, "allowed": [0, 1],
            "compatibility": [{
                "if_op": "OR",
                "if": {"majordep": {"allowed": [1]},
                       "otherdep": {"allowed": [1]}},
                "then": {"deprtreat": {"nullable": False}},
            }],
        },
    }
    nv = make_validator(schema)
    assert nv.validate({"majordep": 0, "otherdep": 2, "deprtreat": None})
    assert nv.validate({"majordep": 1, "otherdep": 2, "deprtreat": 1})
    assert nv.validate({"majordep": 9, "otherdep": 1, "deprtreat": 0})
    assert not nv.validate({"majordep": 1, "otherdep": 2, "deprtreat": None})
    assert nv.errors == {
        "deprtreat": [
            "('deprtreat', ['null value not allowed']) for if {'majordep': "
            "{'allowed': [1]}, 'otherdep': {'allowed': [1]}} then "
            "{'deprtreat': {'nullable': False}} - compatibility rule no: 0"
        ]
    }


def test_compatibility_then_or_collects_both_errors_reversed(make_validator):
    """then_op=or failing collects errors from every branch; equal-rule
    errors surface in reverse insertion order (cerberus sort quirk)."""
    schema = {
        "bevhall": {"type": "integer", "nullable": True},
        "beahall": {"type": "integer", "nullable": True},
        "hall": {
            "type": "integer", "required": True,
            "compatibility": [
                {"index": 0, "then_op": "or",
                 "if": {"hall": {"allowed": [1]}},
                 "then": {"bevhall": {"allowed": [1]},
                          "beahall": {"allowed": [1]}}},
                {"index": 1, "then_op": "and",
                 "if": {"hall": {"allowed": [0]}},
                 "then": {"bevhall": {"allowed": [0]},
                          "beahall": {"allowed": [0]}}},
            ],
        },
    }
    nv = make_validator(schema)
    assert nv.validate({"hall": 1, "bevhall": 1, "beahall": 0})
    assert nv.validate({"hall": 1, "bevhall": 0, "beahall": 1})
    assert nv.validate({"hall": 5, "bevhall": 3, "beahall": 3})
    assert nv.validate({"hall": 1, "bevhall": 1, "beahall": None})
    assert nv.validate({"hall": 0, "bevhall": 0, "beahall": 0})

    assert not nv.validate({"hall": 1, "bevhall": 0, "beahall": 0})
    assert nv.errors == {
        "hall": [
            "('beahall', ['unallowed value 0']) for if {'hall': {'allowed': "
            "[1]}} then {'bevhall': {'allowed': [1]}, 'beahall': {'allowed': "
            "[1]}} - compatibility rule no: 0",
            "('bevhall', ['unallowed value 0']) for if {'hall': {'allowed': [1]}} "
            "then {'bevhall': {'allowed': [1]}, 'beahall': {'allowed': [1]}} "
            "- compatibility rule no: 0",
        ]
    }
    assert not nv.validate({"hall": 0, "bevhall": 0, "beahall": 1})
    assert nv.errors == {
        "hall": [
            "('beahall', ['unallowed value 1']) for if {'hall': {'allowed': "
            "[0]}} then {'bevhall': {'allowed': [0]}, 'beahall': {'allowed': "
            "[0]}} - compatibility rule no: 1"
        ]
    }
    assert not nv.validate({"hall": 0, "bevhall": None, "beahall": None})
    assert nv.errors == {
        "hall": [
            "('bevhall', ['null value not allowed']) for if {'hall': {'allowed': "
            "[0]}} then {'bevhall': {'allowed': [0]}, 'beahall': {'allowed': "
            "[0]}} - compatibility rule no: 1"
        ]
    }


def test_compatibility_else_clause(make_validator):
    schema = {
        "var2": {"type": "integer", "required": True},
        "var1": {
            "type": "integer", "required": True,
            "compatibility": [{
                "index": 0,
                "if": {"var1": {"allowed": [1]}},
                "then": {"var2": {"allowed": [2]}},
                "else": {"var2": {"allowed": [3, 4, 5]}},
            }],
        },
    }
    nv = make_validator(schema)
    for i in range(3, 6):
        assert nv.validate({"var1": 0, "var2": i})
    assert nv.validate({"var1": 1, "var2": 2})
    assert not nv.validate({"var1": 0, "var2": 8})
    assert nv.errors == {
        "var1": [
            "('var2', ['unallowed value 8']) for if {'var1': {'allowed': "
            "[1]}} else {'var2': {'allowed': [3, 4, 5]}} "
            "- compatibility rule no: 0"
        ]
    }
    assert not nv.validate({"var1": 1, "var2": 3})
    assert nv.errors == {
        "var1": [
            "('var2', ['unallowed value 3']) for if {'var1': {'allowed': [1]}} "
            "then {'var2': {'allowed': [2]}} - compatibility rule no: 0"
        ]
    }


def test_compatibility_else_or_multiple_conditions(make_validator):
    schema = {
        "var2": {"type": "integer", "nullable": True},
        "var3": {"type": "integer", "nullable": True},
        "var1": {
            "type": "integer", "required": True,
            "compatibility": [{
                "index": 0, "else_op": "or",
                "if": {"var1": {"allowed": [1]}},
                "then": {"var2": {"allowed": [2]}},
                "else": {"var2": {"allowed": [3, 4, 5]},
                         "var3": {"allowed": [9]}},
            }],
        },
    }
    nv = make_validator(schema)
    for i in range(3, 6):
        assert nv.validate({"var1": 0, "var2": i, "var3": None})
    assert nv.validate({"var1": 0, "var2": None, "var3": 9})
    assert nv.validate({"var1": 1, "var2": 2, "var3": None})

    assert not nv.validate({"var1": 0, "var2": 8, "var3": None})
    assert nv.errors == {
        "var1": [
            "('var3', ['null value not allowed']) for if {'var1': {'allowed': [1]}} "
            "else {'var2': {'allowed': [3, 4, 5]}, 'var3': {'allowed': [9]}} "
            "- compatibility rule no: 0",
            "('var2', ['unallowed value 8']) for if {'var1': {'allowed': [1]}} "
            "else {'var2': {'allowed': [3, 4, 5]}, 'var3': {'allowed': [9]}} "
            "- compatibility rule no: 0",
        ]
    }


def test_compatibility_nested_logic_and_anyof(make_validator):
    schema = {
        "menarche": {
            "nullable": True, "type": "integer",
            "anyof": [{"min": 5, "max": 25}, {"allowed": [88, 99]}],
        },
        "nomensage": {
            "nullable": True, "type": "integer",
            "compatibility": [
                {"index": 0,
                 "if": {"menarche": {"anyof": [{"min": 5, "max": 25},
                                               {"allowed": [99]}]}},
                 "then": {"nomensage": {"nullable": False}}},
                {"index": 1,
                 "if": {"menarche": {"nullable": True,
                                     "anyof": [{"nullable": True,
                                                "filled": False},
                                               {"allowed": [88]}]}},
                 "then": {"nomensage": {"nullable": True, "filled": False}}},
            ],
            "anyof": [{"min": 10, "max": 70}, {"allowed": [88, 99]}],
        },
    }
    nv = make_validator(schema)
    for i in range(5, 26):
        assert nv.validate({"menarche": i, "nomensage": 20})
    assert nv.validate({"menarche": 99, "nomensage": 99})
    assert nv.validate({"menarche": None, "nomensage": None})
    assert nv.validate({"menarche": 88, "nomensage": None})
    assert not nv.validate({"menarche": 5, "nomensage": None})
    assert not nv.validate({"menarche": 99, "nomensage": None})
    assert not nv.validate({"menarche": 88, "nomensage": 10})
    assert not nv.validate({"menarche": None, "nomensage": 10})


# ------------------------------------------------------------------- logic


def test_logic_or_over_nullable_fields(make_validator):
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
    nv = make_validator(schema)
    assert nv.validate({"raceasian": 1})
    assert nv.validate({"raceblack": 1})
    assert nv.validate({"raceaian": 1, "raceasian": None, "raceblack": None})
    assert nv.validate({"raceaian": None, "raceasian": 1, "raceblack": 1})
    assert not nv.validate({"raceaian": None, "raceasian": None,
                            "raceblack": None})
    assert nv.errors == {
        "raceaian": [
            "error in formula evaluation - value None does not satisfy "
            "the specified formula"
        ]
    }
    assert not nv.validate({"raceaian": None})
    assert nv.errors == {
        "raceaian": [
            "error in formula evaluation - value None does not satisfy "
            "the specified formula"
        ]
    }


def test_logic_and(make_validator):
    schema = {
        "a": {"type": "integer", "nullable": True},
        "b": {"type": "integer", "nullable": True},
        "c": {
            "type": "integer", "nullable": True,
            "logic": {"formula": {"and": [
                {"==": [1, {"var": "a"}]},
                {"==": [1, {"var": "b"}]},
            ]}},
        },
    }
    nv = make_validator(schema)
    assert nv.validate({"a": 1, "b": 1, "c": 5})
    assert not nv.validate({"a": 1, "b": None, "c": 5})


def test_logic_custom_errmsg(make_validator):
    schema = {
        "v": {"type": "integer", "nullable": True,
              "logic": {"formula": {">": [{"var": "v"}, 0]},
                        "errmsg": "v must be positive"}},
    }
    nv = make_validator(schema)
    assert nv.validate({"v": 3})
    assert not nv.validate({"v": -1})
    assert nv.errors == {
        "v": ["error in formula evaluation - v must be positive"]
    }


# ------------------------------------------------------------ compare_with


def test_compare_with_current_year(make_validator):
    clock = Clock(datetime(2026, 8, 1))
    schema = {
        "birthyr": {"type": "integer", "required": True, "min": 1850,
                    "compare_with": {"comparator": "<=",
                                     "base": "current_year"}},
        "birthyradj": {"type": "integer", "required": True, "min": 1850,
                       "compare_with": {"comparator": "<=",
                                        "base": "current_year",
                                        "adjustment": 15, "op": "-"}},
    }
    nv = make_validator(schema, clock=clock)
    assert nv.validate({"birthyr": 2000, "birthyradj": 2000})
    assert not nv.validate({"birthyr": 1800, "birthyradj": 1800})
    assert nv.errors == {
        "birthyr": ["min value is 1850"],
        "birthyradj": ["min value is 1850"],
    }
    assert not nv.validate({"birthyr": 2038, "birthyradj": 2000})
    assert nv.errors == {
        "birthyr":
        ["input value doesn't satisfy the condition birthyr <= current_year"]
    }
    assert not nv.validate({"birthyr": 2023, "birthyradj": 2023})
    assert nv.errors == {
        "birthyradj": [
            "input value doesn't satisfy the condition birthyradj <= "
            "current_year - 15"
        ]
    }


def test_compare_with_hardcoded_base(make_validator):
    nv = make_validator({
        "test_var": {"type": "integer", "required": True,
                     "compare_with": {"comparator": ">", "base": 0}}
    })
    assert nv.validate({"test_var": 5})
    assert not nv.validate({"test_var": -1})
    assert nv.errors == {
        "test_var": ["input value doesn't satisfy the condition test_var > 0"]
    }
    assert not nv.validate({"test_var": 0})


def test_compare_with_field_adjustment(make_validator):
    nv = make_validator({
        "base_value": {"type": "integer", "required": True},
        "adjustment_value": {"type": "integer", "required": True},
        "test_var": {"type": "integer", "required": True,
                     "compare_with": {"comparator": "==", "base": "base_value",
                                      "adjustment": "adjustment_value",
                                      "op": "+"}},
    })
    assert nv.validate({"test_var": 5, "base_value": 3,
                        "adjustment_value": 2})
    assert nv.validate({"test_var": 5, "base_value": 8,
                        "adjustment_value": -3})
    assert not nv.validate({"test_var": 5, "base_value": 5,
                            "adjustment_value": 2})
    assert nv.errors == {
        "test_var": [
            "input value doesn't satisfy the condition "
            "test_var == base_value + adjustment_value"
        ]
    }


def test_compare_with_abs(make_validator):
    nv = make_validator({
        "waist1": {"type": "float", "required": True,
                   "compare_with": {"comparator": "<=", "base": "waist2",
                                    "op": "abs", "adjustment": 0.5}},
        "waist2": {"type": "float", "required": True},
    })
    for w2 in (5, 5.5, 5.25, 4.5, 4.75):
        assert nv.validate({"waist1": 5, "waist2": w2})
    for w2 in (4.4, 5.55):
        assert not nv.validate({"waist1": 5, "waist2": w2})
        assert nv.errors == {
            "waist1": [
                "input value doesn't satisfy the condition "
                "abs(waist1 - waist2) <= 0.5"
            ]
        }


def test_compare_with_base_decimal(make_validator):
    schema = {
        "new_height": {"type": "float", "required": True,
                       "compare_with": {"comparator": "<=",
                                        "base": "prev_height",
                                        "base_decimal": "prev_heigdec",
                                        "op": "abs", "adjustment": 5}},
        "prev_height": {"type": "float"},
        "prev_heigdec": {"type": "float", "nullable": True},
    }
    nv = make_validator(schema)
    assert nv.validate({"new_height": 65.5, "prev_height": 60,
                        "prev_heigdec": 9})
    assert not nv.validate({"new_height": 60, "prev_height": 65,
                            "prev_heigdec": 9})
    assert nv.errors == {
        "new_height": [
            "input value doesn't satisfy the condition "
            "abs(new_height - prev_height) <= 5"
        ]
    }
    assert nv.validate({"new_height": 65.5, "prev_height": 65,
                        "prev_heigdec": 0})
    # without the decimal merge the boundary flips
    del schema["new_height"]["compare_with"]["base_decimal"]
    nv = make_validator(schema)
    assert not nv.validate({"new_height": 65.5, "prev_height": 60})
    assert nv.validate({"new_height": 60, "prev_height": 65})


def test_compare_with_null_base_field(make_validator):
    nv = make_validator({
        "test_var": {"type": "integer", "required": True,
                     "compare_with": {"comparator": ">", "base": "other"}},
        "other": {"type": "integer", "nullable": True},
    })
    assert not nv.validate({"test_var": 5, "other": None})
    assert nv.errors == {
        "test_var": [
            "input value doesn't satisfy the condition test_var > other"
        ]
    }


# ------------------------------------------------------------- compare_age


def test_compare_age(date_constraint, make_validator):
    schema = {
        "frmdate": {
            "type": "string", "formatting": "date", "regex": date_constraint,
            "compare_age": {"comparator": ">=", "birth_year": "birthyr",
                            "birth_month": "birthmo",
                            "compare_to": "behage"},
        },
        "birthmo": {"type": "integer", "min": 1, "max": 12},
        "birthyr": {"type": "integer"},
        "behage": {"type": "integer"},
    }
    nv = make_validator(schema)
    assert nv.validate({"frmdate": "2024/02/02", "birthmo": 6,
                        "birthyr": 1950, "behage": 50})
    assert nv.validate({"frmdate": "2024/02/02", "birthmo": 2,
                        "birthyr": 2024, "behage": 0})
    assert not nv.validate({"frmdate": "2024/02/02", "birthmo": 1,
                            "birthyr": 2024, "behage": 50})
    assert nv.errors == {
        "frmdate": [
            "input value behage doesn't satisfy the condition: "
            "age at frmdate >= behage"
        ]
    }


def test_compare_age_list_and_null_skip(date_constraint, make_validator):
    schema = {
        "frmdate": {
            "type": "string", "formatting": "date", "regex": date_constraint,
            "nullable": True,
            "compare_age": {"comparator": ">=", "birth_year": "birthyr",
                            "birth_month": "birthmo",
                            "compare_to": ["behage", "cogage", 0]},
        },
        "birthmo": {"type": "integer", "min": 1, "max": 12},
        "birthyr": {"type": "integer"},
        "behage": {"type": "integer"},
        "cogage": {"type": "integer"},
    }
    nv = make_validator(schema)
    assert nv.validate({"frmdate": "2024/02/02", "birthmo": 6,
                        "birthyr": 1950, "behage": 50, "cogage": 40})
    # a null date value drops compare_age entirely (nullable override)
    assert nv.validate({"frmdate": None, "birthmo": 6, "birthyr": 1950,
                        "behage": 50, "cogage": 40})
    assert not nv.validate({"frmdate": "2024/02/02", "birthmo": 6,
                            "birthyr": 1950, "behage": 90, "cogage": 40})


def test_compare_age_invalid_birth_components(date_constraint,
                                              make_validator):
    schema = {
        "frmdate": {
            "type": "string", "formatting": "date", "regex": date_constraint,
            "compare_age": {"comparator": ">=", "birth_year": "birthyr",
                            "compare_to": "behage"},
        },
        "birthyr": {"type": "integer", "nullable": True},
        "behage": {"type": "integer"},
    }
    nv = make_validator(schema)
    assert not nv.validate({"frmdate": "2024/02/02", "birthyr": None,
                            "behage": 50})
    assert nv.errors == {
        "frmdate": [
            "Cannot compute birth date, one or more components empty or "
            "malformed"
        ]
    }


# -------------------------------------------------------------- compute_gds

GDS_KEYS = ["satis", "dropact", "empty", "bored", "spirits", "afraid",
            "happy", "helpless", "stayhome", "memprob", "wondrful",
            "wrthless", "energy", "hopeless", "better"]


@pytest.fixture
def gds_nv(make_validator):
    schema = {k: {"required": True, "type": "integer", "allowed": [0, 1, 9]}
              for k in GDS_KEYS}
    schema["gds"] = {
        "required": True, "type": "integer",
        "anyof": [{"min": 0, "max": 15}, {"allowed": [88]}],
        "compute_gds": list(GDS_KEYS),
    }
    schema["nogds"] = {"nullable": True, "type": "integer",
                       "allowed": [0, 1]}
    return make_validator(schema)


def gds_record(**over):
    rec = {k: 1 for k in GDS_KEYS}
    rec.update({"gds": 15, "nogds": None})
    rec.update(over)
    return rec


def test_gds_all_answered(gds_nv):
    assert gds_nv.validate(gds_record())
    assert gds_nv.validate(gds_record(satis=0, gds=14))
    assert not gds_nv.validate(gds_record(gds=5))
    assert gds_nv.errors == {
        "gds": ["incorrect GDS score 5, expected value 15 - GDS rule no: 2"]
    }


def test_gds_nogds_is_1(gds_nv):
    # errors surface in reverse emission order (rule-equal sort)
    assert not gds_nv.validate(gds_record(nogds=1))
    assert gds_nv.errors == {
        "gds": [
            "If GDS not attempted (nogds=1), there cannot be >=12 questions "
            "with valid scores - GDS rule no: 1",
            "If GDS not attempted (nogds=1), total GDS score should be 88 - "
            "GDS rule no: 0",
        ]
    }
    assert not gds_nv.validate(gds_record(nogds=1, gds=88))
    assert gds_nv.errors == {
        "gds": [
            "If GDS not attempted (nogds=1), there cannot be >=12 questions "
            "with valid scores - GDS rule no: 1"
        ]
    }
    # < 12 valid answers passes with nogds=1 and gds=88
    rec = gds_record(nogds=1, gds=88)
    for k in GDS_KEYS[:4]:
        rec[k] = 9
    assert gds_nv.validate(rec)


def test_gds_prorated(gds_nv):
    # 3 unanswered, 12 answered: prorated = sum + (sum/12)*3
    rec = gds_record(satis=9, dropact=9, empty=9)
    rec["gds"] = 15  # 12 + (12/12)*3
    assert gds_nv.validate(rec)
    rec["gds"] = 14
    assert not gds_nv.validate(rec)
    assert gds_nv.errors == {
        "gds": [
            "incorrect prorated GDS score 14, expected value 15 "
            "- GDS rule no: 3"
        ]
    }


def test_gds_prorated_rounding(gds_nv):
    # 3 unanswered, score 5 of 12 -> 5 + (5/12)*3 = 6.25 -> rounds to 6
    rec = gds_record(satis=9, dropact=9, empty=9)
    for k in ["bored", "spirits", "afraid", "happy", "helpless"]:
        rec[k] = 1
    for k in ["stayhome", "memprob", "wondrful", "wrthless", "energy",
              "hopeless", "better"]:
        rec[k] = 0
    rec["gds"] = 6
    assert gds_nv.validate(rec)


def test_gds_too_few_valid(gds_nv):
    rec = gds_record()
    for k in GDS_KEYS[:4]:
        rec[k] = 9
    rec["gds"] = 11
    assert not gds_nv.validate(rec)
    assert gds_nv.errors == {
        "gds": [
            "If GDS attempted (nogds = 0 or blank), at least 12 "
            "questions need to have valid scores - GDS rule no: 4"
        ]
    }


# ---------------------------------------------------------- score_variables


@pytest.fixture
def score_schema():
    return {
        "total": {
            "type": "integer", "required": True,
            "function": {
                "name": "score_variables",
                "args": {
                    "mode": "correct",
                    "scoring_key": {"val1": 1, "val2": 2, "val3": 3},
                    "logic": {"formula": {"==": [{"var": "total"},
                                                 {"var": "__total_sum"}]}},
                },
            },
        },
        "val1": {"type": "integer", "nullable": True},
        "val2": {"type": "integer", "nullable": True},
        "val3": {"type": "integer", "nullable": True},
    }


def test_score_variables_correct(make_validator, score_schema):
    nv = make_validator(score_schema)
    assert nv.validate({"total": 3, "val1": 1, "val2": 2, "val3": 3})
    assert nv.validate({"total": 1, "val1": 5, "val2": 2, "val3": -7})
    assert nv.validate({"total": 0, "val1": 5, "val2": 0, "val3": -7})
    # skip when any key missing/blank
    assert nv.validate({"total": 5})
    assert nv.validate({"total": 5, "val1": 5, "val3": 4})
    assert not nv.validate({"total": 10, "val1": 1, "val2": 2, "val3": 3})
    assert nv.errors == {
        "total": ["Provided value 10 does not match the expected score"]
    }


def test_score_variables_incorrect_mode(make_validator, score_schema):
    score_schema["total"]["function"]["args"]["mode"] = "incorrect"
    nv = make_validator(score_schema)
    assert nv.validate({"total": 3, "val1": 3, "val2": 1, "val3": 2})
    assert nv.validate({"total": 0, "val1": 1, "val2": 2, "val3": 3})
    assert not nv.validate({"total": 3, "val1": 1, "val2": 2, "val3": 3})
    assert nv.errors == {
        "total": ["Provided value 3 does not match the expected score"]
    }


def test_score_variables_custom_calc_var(make_validator, score_schema):
    score_schema["total"]["function"]["args"]["calc_var_name"] = "subtractor"
    score_schema["total"]["function"]["args"]["mode"] = "incorrect"
    score_schema["total"]["function"]["args"]["logic"] = {
        "formula": {"==": [{"var": "total"},
                           {"-": [5, {"var": "subtractor"}]}]}
    }
    nv = make_validator(score_schema)
    assert nv.validate({"total": 2, "val1": 3, "val2": 1, "val3": 2})
    assert nv.validate({"total": 5, "val1": 1, "val2": 2, "val3": 3})
    assert not nv.validate({"total": 3, "val1": 1, "val2": 2, "val3": 3})


def test_score_variables_bad_calc_var_name(make_validator, score_schema):
    score_schema["total"]["function"]["args"]["calc_var_name"] = "total"
    nv = make_validator(score_schema)
    with pytest.raises(ValueError) as e:
        nv.validate({"total": 3, "val1": 1, "val2": 2, "val3": 3})
    assert str(e.value) == \
        "total already exists in record, cannot use as calc_var_name"


def test_two_failing_compatibility_rules_reverse_order(make_validator):
    """Two failing clauses of the SAME rule surface in reverse emission
    order (cerberus's equal-schema-path sort quirk)."""
    schema = {
        "a": {"type": "integer", "nullable": True},
        "v": {"type": "integer", "nullable": True,
              "compatibility": [
                  {"index": 0, "if": {"a": {"allowed": [1]}},
                   "then": {"v": {"allowed": [10]}}},
                  {"index": 1, "if": {"a": {"allowed": [1]}},
                   "then": {"v": {"allowed": [20]}}},
              ]},
    }
    nv = make_validator(schema)
    assert not nv.validate({"a": 1, "v": 5})
    msgs = nv.errors["v"]
    assert "rule no: 1" in msgs[0]
    assert "rule no: 0" in msgs[1]


def test_anyof_nested_dict_sits_after_its_message(make_validator):
    schema = {
        "v": {"type": "integer", "nullable": True,
              "allowed": [1, 2, 3, 100],
              "anyof": [{"min": 0, "max": 10}, {"allowed": [99]}]},
    }
    nv = make_validator(schema)
    assert not nv.validate({"v": 50})
    msgs = nv.errors["v"]
    # 'allowed' sorts before 'anyof'; the child-error dict follows the
    # anyof message immediately
    assert msgs[0] == "unallowed value 50"
    assert msgs[1] == "no definitions validate"
    assert isinstance(msgs[2], dict)
    assert msgs[2]["anyof definition 0"] == ["max value is 10"]


def test_multiple_compatibility_blank_chain(make_validator):
    """Reference test_multiple_compatibility: filled-state of one field
    dictates the other in both directions."""
    schema = {
        "enrlgenoth": {"type": "integer", "nullable": True,
                       "allowed": [1]},
        "enrlgenothx": {
            "type": "string", "nullable": True,
            "compatibility": [
                {"index": 0, "if": {"enrlgenoth": {"allowed": [1]}},
                 "then": {"enrlgenothx": {"nullable": False}}},
                {"index": 1,
                 "if": {"enrlgenoth": {"nullable": True,
                                       "filled": False}},
                 "then": {"enrlgenothx": {"nullable": True,
                                          "filled": False}}},
            ],
        },
    }
    nv = make_validator(schema)
    assert nv.validate({"enrlgenoth": 1, "enrlgenothx": "somevalue"})
    assert nv.validate({"enrlgenoth": None, "enrlgenothx": None})
    assert nv.validate({})
    assert not nv.validate({"enrlgenoth": 1, "enrlgenothx": None})
    assert nv.errors == {
        "enrlgenothx": [
            "('enrlgenothx', ['null value not allowed']) for if "
            "{'enrlgenoth': {'allowed': [1]}} then {'enrlgenothx': "
            "{'nullable': False}} - compatibility rule no: 0"
        ]
    }
    assert not nv.validate({"enrlgenoth": None,
                            "enrlgenothx": "somevalue"})
    assert nv.errors == {
        "enrlgenothx": [
            "('enrlgenothx', ['must be empty']) for if {'enrlgenoth': "
            "{'nullable': True, 'filled': False}} then {'enrlgenothx': "
            "{'nullable': True, 'filled': False}} - compatibility "
            "rule no: 1"
        ]
    }


def test_compatibility_then_multiple_blank_and(make_validator):
    """If parentvar is blank then var1..var3 must be blank; the AND walk
    reports the FIRST failing then-field."""
    schema = {
        "parentvar": {"type": "integer", "nullable": True},
        "var3": {"type": "integer", "nullable": True},
        "var2": {"type": "integer", "nullable": True},
        "var1": {
            "type": "integer", "nullable": True,
            "compatibility": [{
                "if": {"parentvar": {"nullable": True,
                                     "filled": False}},
                "then": {"var1": {"nullable": True, "filled": False},
                         "var2": {"nullable": True, "filled": False},
                         "var3": {"nullable": True, "filled": False}},
            }],
        },
    }
    nv = make_validator(schema)
    assert nv.validate({"parentvar": None, "var1": None, "var2": None,
                        "var3": None})
    assert nv.validate({"parentvar": 0, "var1": 1, "var2": 2, "var3": 3})
    assert nv.validate({"parentvar": 0, "var1": None, "var2": 2,
                        "var3": None})
    assert not nv.validate({"parentvar": None, "var1": 1, "var2": None,
                            "var3": None})
    assert "('var1', ['must be empty'])" in nv.errors["var1"][0]
    # the failing field named in the message is var3, but the error is
    # attributed to var1 (the field carrying the rule)
    assert not nv.validate({"parentvar": None, "var1": None,
                            "var2": None, "var3": 1})
    assert "('var3', ['must be empty'])" in nv.errors["var1"][0]


def test_compatibility_if_null_condition_fails_cleanly(make_validator):
    """A null value in a required if-field simply fails the if clause
    (reference test_compatibility_multiple_resulting_options_or tail)."""
    schema = {
        "majdepdx": {"type": "integer", "nullable": True},
        "depd": {
            "type": "integer", "required": True,
            "compatibility": [{
                "index": 0,
                "if": {"depd": {"allowed": [1]}},
                "then": {"majdepdx": {"allowed": [0, 2]}},
            }],
        },
    }
    nv = make_validator(schema)
    assert not nv.validate({"depd": None, "majdepdx": 5})
    assert nv.errors == {"depd": ["null value not allowed"]}
