"""Value-level helpers: date parsing, tolerant comparison, frozen clock.

Semantics are normative and match the reference engine
(/root/reference/nacc_form_validator/utils.py:14-122 and its semantics tests
tests/test_utils.py:170-210): None-ordering follows the jsonLogic convention
(``None < x`` is true, ``x < None`` false, ``None <= None`` true) and numeric
equality is tolerant to ``abs_tol=1e-2``. These quirks are load-bearing for
keep/drop parity and must not be "fixed".
"""

from __future__ import annotations

import math
import re
from datetime import date, datetime
from typing import Any, Optional

from dateutil import parser as du_parser

#: values matching YYYY-MM-DD / YYYY/MM/DD are parsed year-first; anything
#: else (e.g. MM/DD/YYYY) is parsed month-first (reference utils.py:28-34).
_YEARFIRST_RE = re.compile(r"^\d{4}[-/]\d{2}[-/]\d{2}$")


class DateParseError(ValueError):
    """Raised when a value cannot be parsed as a date/datetime."""


def parse_date(value: Any) -> date:
    """Parse ``value`` into a ``date``.

    Non-string input raises ``ValueError``; unparsable strings raise
    :class:`DateParseError`.
    """
    return parse_datetime(value).date()


def parse_datetime(value: Any) -> datetime:
    """Parse ``value`` into a ``datetime`` with year-first disambiguation."""
    if not isinstance(value, str):
        raise ValueError(
            f'"convert to date" not supported for non string value {value}')
    yearfirst = bool(_YEARFIRST_RE.match(value))
    try:
        return du_parser.parse(value, yearfirst=yearfirst)
    except (ValueError, TypeError, OverflowError) as err:
        raise DateParseError(str(err)) from err


# The reference dispatches conversion functions by name
# (``convert_to_{formatting}``, nacc_validator.py:473-478); keep the same
# public names for rule files relying on ``formatting: date|datetime``.
convert_to_date = parse_date
convert_to_datetime = parse_datetime


def to_float_or_none(value: Any) -> Optional[float]:
    try:
        return float(value)
    except (TypeError, ValueError):
        return None


_COMPARATORS = ("==", "!=", "<=", ">=", "<", ">")


def compare_values(comparator: str, value: Any, base_value: Any) -> bool:
    """Tolerant, None-aware binary comparison.

    Truth table for nulls (normative, reference utils.py:85-95):
    both None -> True only for ``==``/``<=``/``>=``; one None -> True for
    ``!=``; value None -> True only for ``<``/``<=``; base None -> False for
    ``<``/``<=`` else True. Numeric ``==``/``!=`` use ``abs_tol=1e-2``.
    """
    if comparator not in _COMPARATORS:
        raise TypeError(f"Unrecognized comparator: {comparator}")

    if value is None and base_value is None:
        return comparator in ("<=", "==", ">=")
    if ((value is None) != (base_value is None)) and comparator == "!=":
        return True
    if value is None:
        return comparator in ("<", "<=")
    if base_value is None:
        return comparator not in ("<", "<=")

    fv, fb = to_float_or_none(value), to_float_or_none(base_value)
    if fv is not None and fb is not None:
        close = math.isclose(fv, fb, abs_tol=1e-2)
        if comparator == "==":
            return close
        if comparator == "!=":
            return not close

    if comparator == "==":
        return value == base_value
    if comparator == "!=":
        return value != base_value
    if comparator == ">=":
        return value >= base_value
    if comparator == ">":
        return value > base_value
    if comparator == "<=":
        return value <= base_value
    return value < base_value


class Clock:
    """A freezable "now".

    The reference calls ``datetime.now()`` inside rules
    (nacc_validator.py:375-385, 520, 557); a distributed run must freeze one
    timestamp at job start so every worker/retry/resume sees the same
    ``current_date``/``current_year``. Pipelines construct a frozen Clock on
    the driver and ship it inside the compiled rule program.
    """

    def __init__(self, frozen: Optional[datetime] = None):
        self._frozen = frozen

    @classmethod
    def frozen_now(cls) -> "Clock":
        return cls(datetime.now())

    def now(self) -> datetime:
        return self._frozen if self._frozen is not None else datetime.now()

    def today(self) -> date:
        return self.now().date()
