"""A from-scratch jsonLogic evaluator.

Implements the public jsonLogic specification (https://jsonlogic.com) with
the dialect extensions the rule language relies on (reference
json_logic.py:193-252, itself derived from the MIT json-logic-py project):

* ``==``/``!=`` are *soft*: strings compare stringly, bools boolean-ly, and
  numerics compare with ``abs_tol=1e-2``.
* ``<``/``<=``/``>``/``>=`` are None-aware (``None`` sorts first) and
  chainable (``{"<": [1, x, 10]}`` = between).
* ``count`` (truthy count) and ``count_exact`` (count equal to first arg)
  are dialect aggregates.

An expression is a nested dict ``{op: [args...]}``; ``{"var": "name"}``
reads from the data record (dotted paths supported). Scalars evaluate to
themselves.
"""

from __future__ import annotations

import logging
import math
from typing import Any, Callable, Dict

logger = logging.getLogger(__name__)


def _soft_eq(a: Any, b: Any) -> bool:
    if isinstance(a, str) or isinstance(b, str):
        return str(a) == str(b)
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) is bool(b)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return math.isclose(float(a), float(b), abs_tol=1e-2)
    return a == b


def _hard_eq(a: Any, b: Any) -> bool:
    return type(a) is type(b) and a == b


def _lt(a: Any, b: Any, *rest: Any) -> bool:
    if a is None and b is None:
        return False
    if a is None:
        return True
    if b is None:
        return False
    # exact-type test on purpose: bools stay bools (jsonLogic convention)
    if type(a) in (int, float) or type(b) in (int, float):
        try:
            a, b = float(a), float(b)
        except TypeError:
            return False
    return a < b and (not rest or _lt(b, *rest))


def _lte(a: Any, b: Any, *rest: Any) -> bool:
    return (_lt(a, b) or _soft_eq(a, b)) and (not rest or _lte(b, *rest))


def _num(x: Any) -> Any:
    if isinstance(x, str):
        return float(x) if "." in x else int(x)
    return x


def _if(*args: Any) -> Any:
    i = 0
    while i + 1 < len(args):
        if args[i]:
            return args[i + 1]
        i += 2
    return args[-1] if len(args) % 2 else None


def _and(*args: Any) -> Any:
    result: Any = True
    for a in args:
        result = result and a
    return result


def _or(*args: Any) -> Any:
    result: Any = False
    for a in args:
        result = result or a
    return result


def _mul(*args: Any) -> Any:
    result: Any = 1
    for a in args:
        result = result * float(a)
    return result


def _merge(*args: Any) -> list:
    out: list = []
    for a in args:
        out.extend(a) if isinstance(a, (list, tuple)) else out.append(a)
    return out


def _count_exact(*args: Any) -> int:
    if len(args) < 2:
        raise ValueError(
            "count_exact needs a base and at least 1 value to compare to")
    return sum(1 for x in args[1:] if x == args[0])


OPS: Dict[str, Callable[..., Any]] = {
    "==": _soft_eq,
    "===": _hard_eq,
    "!=": lambda a, b: not _soft_eq(a, b),
    "!==": lambda a, b: not _hard_eq(a, b),
    "<": _lt,
    "<=": _lte,
    ">": lambda a, b: _lt(b, a),
    ">=": lambda a, b: _lt(b, a) or _soft_eq(a, b),
    "!": lambda a: not a,
    "!!": bool,
    "%": lambda a, b: a % b,
    "and": _and,
    "or": _or,
    "?:": lambda a, b, c: b if a else c,
    "if": _if,
    "log": lambda a: (logger.info(a), a)[1],
    "in": lambda a, b: a in b if hasattr(b, "__contains__") else False,
    "cat": lambda *a: "".join(str(x) for x in a),
    "+": lambda *a: sum(_num(x) for x in a),
    "-": lambda *a: -_num(a[0]) if len(a) == 1 else _num(a[0]) - _num(a[1]),
    "*": _mul,
    "/": lambda a, b=None: a if b is None else float(a) / float(b),
    "min": lambda *a: min(a),
    "max": lambda *a: max(a),
    "merge": _merge,
    "count": lambda *a: sum(1 for x in a if x),
    "count_exact": _count_exact,
}


def _get_var(data: Any, path: Any, default: Any = None) -> Any:
    try:
        for key in str(path).split("."):
            try:
                data = data[key]
            except TypeError:
                data = data[int(key)]
    except (KeyError, TypeError, ValueError):
        return default
    return data


def _missing(data: Any, *names: Any) -> list:
    sentinel = object()
    if names and isinstance(names[0], list):
        names = names[0]
    return [n for n in names if _get_var(data, n, sentinel) is sentinel]


def _missing_some(data: Any, min_required: int, names: list) -> list:
    if min_required < 1:
        return []
    absent = _missing(data, names)
    if len(names) - len(absent) >= min_required:
        return []
    return absent


def json_logic(expr: Any, data: Any = None) -> Any:
    """Evaluate a jsonLogic expression against ``data``.

    Raises ``ValueError`` for unknown operators (reported as a FORMULA
    error by the ``logic`` rule).
    """
    if expr is None or not isinstance(expr, dict):
        return expr
    data = data or {}

    op = next(iter(expr.keys()))
    raw_args = expr[op]
    if not isinstance(raw_args, (list, tuple)):
        raw_args = [raw_args]
    args = [json_logic(a, data) for a in raw_args]

    if op == "var":
        return _get_var(data, *args)
    if op == "missing":
        return _missing(data, *args)
    if op == "missing_some":
        return _missing_some(data, *args)
    if op not in OPS:
        raise ValueError(f"Unrecognized operation {op}")
    return OPS[op](*args)


# reference-compatible alias (json_logic.py:255)
jsonLogic = json_logic
