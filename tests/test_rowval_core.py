"""Conformance tests for the record validator core: dtype compilation, cast
semantics, and the Cerberus-style built-in rules. Expected outputs mirror
the reference suite (tests/test_nacc_validator.py, test_rules_cerberus.py)."""

from datetime import date, datetime

import pytest

from nacc_form_validator_ray.rowval import (RecordValidator,
                                            ValidationException)


def test_dtype_map(nv):
    assert nv.dtypes == {
        "dummy_int": "int",
        "dummy_str": "str",
        "dummy_float": "float",
        "dummy_boolean": "bool",
        "dummy_date": "date",
        "dummy_datetime": "datetime",
    }


def test_cast_record_valid(nv):
    record = {
        "dummy_int": "10",
        "dummy_str": "hello",
        "dummy_float": "1.2345",
        "dummy_boolean": "1",
        "dummy_date": "01-01-2000",
        "dummy_datetime": "2000-01-01",
    }
    assert nv.cast_record(record) == {
        "dummy_int": 10,
        "dummy_str": "hello",
        "dummy_float": 1.2345,
        "dummy_boolean": True,
        "dummy_date": date(2000, 1, 1),
        "dummy_datetime": datetime(2000, 1, 1),
    }


def test_cast_record_invalid_passthrough(nv):
    """Cast failures keep the original value; '' becomes None; missing
    schema fields are injected as None."""
    record = {
        "dummy_int": "hello",
        "dummy_float": "world",
        "dummy_boolean": "",
        "dummy_date": "invalid date",
        "dummy_datetime": "invalid datetime",
    }
    assert nv.cast_record(record) == {
        "dummy_int": "hello",
        "dummy_str": None,
        "dummy_float": "world",
        "dummy_boolean": None,
        "dummy_date": "invalid date",
        "dummy_datetime": "invalid datetime",
    }


def test_formatting_on_non_string_is_system_error(nv):
    with pytest.raises(ValidationException):
        nv._rule_formatting(None, "invalid_field", None)
    with pytest.raises(ValidationException):
        nv._rule_formatting(None, "dummy_int", None)
    assert nv.sys_errors == {
        "invalid_field":
        ["formatting definition not supported for non string types"],
        "dummy_int":
        ["formatting definition not supported for non string types"],
    }


# ---------------------------------------------------------------- builtins


def test_required(make_validator):
    nv = make_validator({"dummy_var": {"required": True, "type": "string"}})
    assert nv.validate({"dummy_var": "hello"})
    assert not nv.validate({})
    assert nv.errors == {"dummy_var": ["required field"]}


def test_nullable(make_validator):
    nv = make_validator({"dummy_var": {"nullable": True, "type": "string"}})
    assert nv.validate({"dummy_var": "hello"})
    assert nv.validate({"dummy_var": None})
    assert nv.validate({})


def test_minmax(make_validator):
    nv = make_validator(
        {"dummy_var": {"type": "integer", "required": True, "min": 0,
                       "max": 10}})
    for i in range(0, 10):
        assert nv.validate({"dummy_var": i})
    assert not nv.validate({"dummy_var": 11})
    assert nv.errors == {"dummy_var": ["max value is 10"]}
    assert not nv.validate({"dummy_var": -1})
    assert nv.errors == {"dummy_var": ["min value is 0"]}
    assert not nv.validate({"dummy_var": None})
    assert nv.errors == {"dummy_var": ["null value not allowed"]}


def test_minmax_date_formatting(date_constraint, make_validator):
    nv = make_validator({
        "frmdate": {
            "type": "string",
            "formatting": "date",
            "regex": date_constraint,
            "min": "2012/01/01",
            "max": "02/02/2024",
        }
    })
    assert nv.validate({"frmdate": "2024/02/02"})
    assert nv.validate({"frmdate": "01/01/2012"})
    assert nv.validate({"frmdate": "06/09/2019"})

    assert not nv.validate({"frmdate": "2011/12/31"})
    assert nv.errors == {"frmdate": ["min value is 2012/01/01"]}
    assert not nv.validate({"frmdate": "01/01/2011"})
    assert nv.errors == {"frmdate": ["min value is 2012/01/01"]}
    assert not nv.validate({"frmdate": "2024/03/03"})
    assert nv.errors == {"frmdate": ["max value is 02/02/2024"]}


def test_minmax_date_iso_bound(date_constraint, make_validator):
    nv = make_validator({
        "frmdate": {
            "type": "string",
            "formatting": "date",
            "regex": date_constraint,
            "min": "2017-06-01",
        }
    })
    assert not nv.validate({"frmdate": "05/01/2017"})
    assert nv.errors == {"frmdate": ["min value is 2017-06-01"]}


def test_regex(make_validator):
    pattern = "^(00[6-9]|0[1-9]\\d|[1-9]\\d{2})$"
    nv = make_validator(
        {"zip": {"type": "string", "nullable": True, "regex": pattern}})
    for ok in ("006", "012", "999"):
        assert nv.validate({"zip": ok})
    for bad in ("6", "12", "1000"):
        assert not nv.validate({"zip": bad})
        assert nv.errors == {
            "zip": [f"value does not match regex '{pattern}'"]
        }


def test_anyof_error_shape(make_validator):
    nv = make_validator({
        "dummy_var": {
            "type": "integer",
            "required": True,
            "anyof": [{"min": 0, "max": 10}, {"allowed": [99]}],
        }
    })
    for i in range(0, 10):
        assert nv.validate({"dummy_var": i})
    assert nv.validate({"dummy_var": 99})
    assert not nv.validate({"dummy_var": 100})
    assert nv.errors == {
        "dummy_var": [
            "no definitions validate",
            {
                "anyof definition 0": ["max value is 10"],
                "anyof definition 1": ["unallowed value 100"],
            },
        ]
    }
    assert not nv.validate({"dummy_var": -1})
    assert nv.errors == {
        "dummy_var": [
            "no definitions validate",
            {
                "anyof definition 0": ["min value is 0"],
                "anyof definition 1": ["unallowed value -1"],
            },
        ]
    }


def test_allowed_and_untyped_fields(make_validator):
    nv = make_validator({"testvar": {"allowed": [1, "hello"]}})
    assert nv.validate({"testvar": 1})
    assert nv.validate({"testvar": "hello"})
    assert not nv.validate({"testvar": 2})
    assert nv.errors == {"testvar": ["unallowed value 2"]}
    assert not nv.validate({"testvar": "1"})
    assert nv.errors == {"testvar": ["unallowed value 1"]}
    assert not nv.validate({"testvar": None})
    assert nv.errors == {"testvar": ["null value not allowed"]}


def test_integer_vs_float_membership(make_validator):
    """allowed/forbidden match across int/float representations."""
    for allowed, forbidden in ([99, 88], [99.0, 88.0]):
        nv = make_validator({
            "testvar": {"type": "float", "allowed": [allowed],
                        "forbidden": [forbidden]}
        })
        assert nv.validate({"testvar": 99})
        assert nv.validate({"testvar": 99.0})
        assert not nv.validate({"testvar": 88})
        assert not nv.validate({"testvar": 88.0})


def test_type_failure_drops_remaining_rules(make_validator):
    nv = make_validator(
        {"v": {"type": "integer", "min": 0, "max": 10, "nullable": False}})
    assert not nv.validate({"v": "hello"})
    assert nv.errors == {"v": ["must be of integer type"]}


def test_multi_type_union(make_validator):
    nv = make_validator({"v": {"type": ["integer", "float"]}})
    assert nv.validate({"v": 5})
    assert nv.validate({"v": 5.5})
    assert not nv.validate({"v": "5"})


def test_unknown_field_strict_vs_allow_unknown():
    strict = RecordValidator({"a": {"type": "integer"}}, allow_unknown=False)
    assert not strict.validate({"a": 1, "b": 2})
    assert strict.errors == {"b": ["unknown field"]}
    loose = RecordValidator({"a": {"type": "integer"}}, allow_unknown=True)
    assert loose.validate({"a": 1, "b": 2})


def test_meta_errmsg_override(make_validator):
    nv = make_validator({
        "v": {"type": "integer", "min": 5,
              "meta": {"errmsg": "value must be at least 5"}}
    })
    assert not nv.validate({"v": 1})
    assert nv.errors == {"v": ["v: value must be at least 5"]}


def test_lots_of_rules(make_validator):
    """The oldadcid stack: anyof + compatibility + logic on one field."""
    schema = {
        "adcid": {"type": "integer", "required": True, "min": 0, "max": 68},
        "prevenrl": {"type": "integer", "required": True,
                     "allowed": [0, 1, 9]},
        "oldadcid": {
            "type": "integer",
            "nullable": True,
            "anyof": [{"min": 0, "max": 68}, {"allowed": [-1]}],
            "compatibility": [
                {"index": 0,
                 "if": {"prevenrl": {"allowed": [1]}},
                 "then": {"oldadcid": {"nullable": False}}},
                {"index": 1,
                 "if": {"prevenrl": {"allowed": [0, 9]}},
                 "then": {"oldadcid": {"nullable": True, "filled": False}}},
            ],
            "logic": {"formula": {"!=": [{"var": "oldadcid"},
                                         {"var": "adcid"}]}},
        },
    }
    nv = make_validator(schema)

    assert nv.validate({"adcid": 0, "prevenrl": 1, "oldadcid": -1})
    assert nv.validate({"adcid": 0, "prevenrl": 1, "oldadcid": 10})
    assert nv.validate({"adcid": 0, "prevenrl": 0, "oldadcid": None})
    assert nv.validate({"adcid": 0, "prevenrl": 9, "oldadcid": None})

    assert not nv.validate({"adcid": 0, "prevenrl": 1, "oldadcid": None})
    assert nv.errors == {
        "oldadcid": [
            "('oldadcid', ['null value not allowed']) for if {'prevenrl': "
            "{'allowed': [1]}} then {'oldadcid': {'nullable': False}} "
            "- compatibility rule no: 0"
        ]
    }
    assert not nv.validate({"adcid": 0, "prevenrl": 0, "oldadcid": 1})
    assert nv.errors == {
        "oldadcid": [
            "('oldadcid', ['must be empty']) for if {'prevenrl': {'allowed': "
            "[0, 9]}} then {'oldadcid': {'nullable': True, 'filled': False}} "
            "- compatibility rule no: 1"
        ]
    }
    assert not nv.validate({"adcid": 0, "prevenrl": 1, "oldadcid": 0})
    assert nv.errors == {
        "oldadcid": [
            "error in formula evaluation - value 0 does not satisfy the "
            "specified formula"
        ]
    }


def test_bool_cast_quirk(nv):
    """bool('0') is True (reference cast semantics: any non-empty string
    is truthy; '' -> None)."""
    assert nv.cast_record({"dummy_boolean": "0"}) ["dummy_boolean"] is True
    assert nv.cast_record({"dummy_boolean": "false"})["dummy_boolean"] \
        is True
    assert nv.cast_record({"dummy_boolean": ""})["dummy_boolean"] is None
