"""Conformance tests for the jsonLogic dialect (reference json_logic.py and
tests/test_rules_logic.py semantics)."""

import pytest

from nacc_form_validator_ray.json_logic import json_logic


@pytest.mark.parametrize("expr,data,expected", [
    # soft equality: string coercion, bool identity, numeric tolerance
    ({"==": [1, 1.0]}, {}, True),
    ({"==": [1, "1"]}, {}, True),
    ({"==": [1.33, 1.333333]}, {}, True),
    ({"==": [1.33, 1.35]}, {}, False),
    ({"==": [None, None]}, {}, True),
    ({"==": [None, 0]}, {}, False),
    ({"==": [True, 1]}, {}, True),
    ({"===": [1, 1.0]}, {}, False),
    ({"===": [1, 1]}, {}, True),
    ({"!==": [1, "1"]}, {}, True),
    # None-aware ordering
    ({"<": [None, 5]}, {}, True),
    ({"<": [5, None]}, {}, False),
    ({"<": [None, None]}, {}, False),
    ({"<": [1, 2, 3]}, {}, True),         # chainable between
    ({"<": [1, 5, 3]}, {}, False),
    ({"<=": [1, 1, 3]}, {}, True),
    ({">": [5, None]}, {}, True),
    ({">=": [5, 5.001]}, {}, True),       # tolerant equality folds in
    # boolean ops return operand values (JS style)
    ({"and": [1, 2]}, {}, 2),
    ({"and": [0, 2]}, {}, 0),
    ({"or": [0, 3]}, {}, 3),
    ({"or": [False, None]}, {}, None),
    ({"!": [True]}, {}, False),
    ({"!!": [0]}, {}, False),
    ({"?:": [True, "a", "b"]}, {}, "a"),
    ({"if": [False, "a", True, "b", "c"]}, {}, "b"),
    ({"if": [False, "a"]}, {}, None),
    # arithmetic with string coercion
    ({"+": [1, "2", 3.5]}, {}, 6.5),
    ({"-": [10, "3"]}, {}, 7),
    ({"-": [4]}, {}, -4),
    ({"*": [2, "3"]}, {}, 6.0),
    ({"/": [7, 2]}, {}, 3.5),
    ({"%": [7, 3]}, {}, 1),
    ({"min": [3, 1, 2]}, {}, 1),
    ({"max": [3, 1, 2]}, {}, 3),
    # string / array
    ({"cat": ["a", 1, "b"]}, {}, "a1b"),
    ({"in": ["a", ["a", "b"]]}, {}, True),
    ({"in": ["a", 5]}, {}, False),
    ({"merge": [[1, 2], 3, [4]]}, {}, [1, 2, 3, 4]),
    # data access
    ({"var": "x"}, {"x": 42}, 42),
    ({"var": "a.b"}, {"a": {"b": 7}}, 7),
    ({"var": ["missing_key", "fallback"]}, {}, "fallback"),
    ({"missing": ["a", "b"]}, {"a": 1}, ["b"]),
    ({"missing_some": [1, ["a", "b"]]}, {"a": 1}, []),
    ({"missing_some": [2, ["a", "b", "c"]]}, {"a": 1}, ["b", "c"]),
    # dialect aggregates
    ({"count": [1, 0, None, "x"]}, {}, 2),
    ({"count_exact": [0, 0, 1, 0]}, {}, 2),
    # scalars evaluate to themselves
    (5, {}, 5),
    (None, {}, None),
    ("abc", {}, "abc"),
])
def test_json_logic_table(expr, data, expected):
    assert json_logic(expr, data) == expected


def test_unknown_operator_raises():
    with pytest.raises(ValueError):
        json_logic({"frobnicate": [1]}, {})


def test_count_exact_arity():
    with pytest.raises(ValueError):
        json_logic({"count_exact": [1]}, {})


def test_nested_formula_over_document():
    # the C2F ftdsnrat pattern: ratio of counts with divide-by-zero guard
    doc = {"ftdhaird": 1, "ftdspit": 1, "ftdnose": 0, "ftdsnrat": 2.0}
    guard = {"and": [
        {"!=": [0, {"count_exact": [0, {"var": "ftdhaird"},
                                    {"var": "ftdspit"}, {"var": "ftdnose"}]}]},
        {"!=": [0, {"count_exact": [1, {"var": "ftdhaird"},
                                    {"var": "ftdspit"}, {"var": "ftdnose"}]}]},
    ]}
    ratio = {"==": [{"var": "ftdsnrat"},
                    {"/": [{"count_exact": [1, {"var": "ftdhaird"},
                                            {"var": "ftdspit"},
                                            {"var": "ftdnose"}]},
                           {"count_exact": [0, {"var": "ftdhaird"},
                                            {"var": "ftdspit"},
                                            {"var": "ftdnose"}]}]}]}
    assert json_logic(guard, doc)
    assert json_logic(ratio, doc)
    doc_all_null = {"ftdhaird": None, "ftdspit": None, "ftdnose": None}
    assert not json_logic(guard, doc_all_null)
