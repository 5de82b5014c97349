"""Conformance tests for value-level semantics (normative tables from the
reference's tests/test_utils.py — None ordering and float tolerance)."""

from datetime import date, datetime

import pytest

from nacc_form_validator_ray.utils import (Clock, compare_values, parse_date,
                                           parse_datetime)


def test_parse_date_yearfirst_disambiguation():
    assert parse_date("2012/01/02") == date(2012, 1, 2)
    assert parse_date("2012-01-02") == date(2012, 1, 2)
    assert parse_date("01/02/2012") == date(2012, 1, 2)  # month first
    assert parse_date("01-02-2012") == date(2012, 1, 2)
    assert parse_datetime("2000-01-01") == datetime(2000, 1, 1)


def test_parse_date_errors():
    with pytest.raises(ValueError):
        parse_date(5)
    with pytest.raises(ValueError):
        parse_date(None)
    with pytest.raises(ValueError):
        parse_date("hello world")


@pytest.mark.parametrize("cmp,a,b,expected", [
    # None-ordering table (normative)
    ("==", None, None, True),
    ("==", None, 5, False),
    ("!=", None, None, False),
    ("!=", 5, None, True),
    ("<", None, 5, True),
    ("<", 5, None, False),
    (">", None, 5, False),
    (">", 5, None, True),
    ("<=", None, 5, True),
    ("<=", 5, None, False),
    (">=", None, 5, False),
    (">=", 5, None, True),
    ("<", None, None, False),
    (">", None, None, False),
    ("<=", None, None, True),
    (">=", None, None, True),
    # float tolerance table (abs_tol=1e-2)
    ("==", 1.33, 1.333333, True),
    ("==", 1.3, "1.333333", False),
    ("==", 1.33, 1.4, False),
    ("==", "1.33", "1.2", False),
    ("==", 1.33, 1.34, False),
    ("==", "3", 1.0, False),
    ("!=", 1.33, 1.333333, False),
    ("!=", 1.3, "1.333333", True),
    ("!=", 1.33, 1.4, True),
    ("!=", "1.33", "1.2", True),
    ("!=", 1.33, 1.34, True),
    ("!=", "3", 1.0, True),
    ("!=", "3", "hello", True),
    ("==", 2.5, "hello", False),
    # plain comparisons
    ("<", 5, 10, True),
    (">=", 10, 10, True),
    ("<=", "abc", "abd", True),
])
def test_compare_values_table(cmp, a, b, expected):
    assert compare_values(cmp, a, b) is expected


def test_compare_values_bad_comparator():
    with pytest.raises(TypeError):
        compare_values("*", 5, 10)
    with pytest.raises(TypeError):
        compare_values("+", None, None)


def test_compare_values_type_errors_propagate():
    with pytest.raises(TypeError):
        compare_values("<", 5, datetime(2000, 1, 1))
    with pytest.raises(TypeError):
        compare_values("<", "01/01/2000", datetime(2000, 1, 1))


def test_clock_freezing():
    frozen = Clock(datetime(2020, 6, 1, 12, 0))
    assert frozen.today() == date(2020, 6, 1)
    assert frozen.now() == datetime(2020, 6, 1, 12, 0)
    live = Clock()
    assert abs((live.now() - datetime.now()).total_seconds()) < 5
