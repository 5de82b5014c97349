"""Error codes, message catalogue and the per-record error vector.

Every rule violation is reported as an :class:`ErrorEntry` carrying a stable
integer code plus a formatted human-readable message. The custom hex codes
(0x1000-0x4001) are a public data contract shared with the reference engine
(/root/reference/nacc_form_validator/errors.py:24-55); the low codes are the
well-known Cerberus error-handler codes the reference inherits
(required/nullable/type/min/max/allowed/regex/anyof). Codes must never be
renumbered — downstream QC systems key on them.

In the Ray Data engine the error vector is an Arrow
``list<struct<field:string, code:int32, message:string>>`` column appended to
every record batch; ``passed`` is derived as "error vector empty".
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import pyarrow as pa


class Codes:
    """Stable error codes.

    Low codes mirror the public Cerberus BasicErrorHandler codes; hex codes
    >= 0x1000 mirror the reference's ErrorDefs.
    """

    # document / field level built-ins
    REQUIRED = 0x02
    UNKNOWN_FIELD = 0x03
    NOT_NULLABLE = 0x23
    BAD_TYPE = 0x24
    REGEX_MISMATCH = 0x41
    MIN_VALUE = 0x42
    MAX_VALUE = 0x43
    UNALLOWED_VALUE = 0x44
    FORBIDDEN_VALUE = 0x46
    ANYOF = 0x93

    # custom rule codes (reference errors.py:24-55)
    CURR_DATE_MAX = 0x1000
    CURR_YEAR_MAX = 0x1001
    INVALID_DATE_MAX = 0x1002
    CURR_DATE_MIN = 0x1003
    CURR_YEAR_MIN = 0x1004
    INVALID_DATE_MIN = 0x1005
    FILLED_TRUE = 0x1006
    FILLED_FALSE = 0x1007
    COMPATIBILITY = 0x1008
    COMPATIBILITY_ELSE = 0x1009
    TEMPORAL = 0x2000
    NO_PRIMARY_KEY = 0x2001
    NO_PREV_VISIT = 0x2002
    FORMULA = 0x2003
    CHECK_GDS_1 = 0x2004
    CHECK_GDS_2 = 0x2005
    CHECK_GDS_3 = 0x2006
    CHECK_GDS_4 = 0x2007
    CHECK_GDS_5 = 0x2008
    COMPARE_WITH = 0x2009
    COMPARE_WITH_PREV = 0x3000
    RXCUI = 0x3001
    AGE_DATE_CONVERSION = 0x3002
    COMPARE_AGE = 0x3003
    COMPARE_AGE_INVALID_COMPARISON = 0x3004
    TEMPORAL_SWAPPED = 0x3005
    ADCID_NOT_MATCH = 0x3006
    ADCID_NOT_VALID = 0x3007
    SCORING_INVALID = 0x3008
    INVALID_BIRTH_DATES = 0x3009
    RXCUI_DATE_CONVERSION = 0x4000
    RXCUI_DATED = 0x4001


#: code -> format string. ``{0}..{n}`` are positional info args; ``{value}``
#: and ``{constraint}`` are filled from the error context. Text matches the
#: reference catalogue (errors.py:81-155) so formatted messages are
#: byte-identical.
MESSAGES: Dict[int, str] = {
    Codes.REQUIRED: "required field",
    Codes.UNKNOWN_FIELD: "unknown field",
    Codes.NOT_NULLABLE: "null value not allowed",
    Codes.BAD_TYPE: "must be of {constraint} type",
    Codes.REGEX_MISMATCH: "value does not match regex '{constraint}'",
    Codes.MIN_VALUE: "min value is {constraint}",
    Codes.MAX_VALUE: "max value is {constraint}",
    Codes.UNALLOWED_VALUE: "unallowed value {value}",
    Codes.FORBIDDEN_VALUE: "unallowed value {value}",
    Codes.ANYOF: "no definitions validate",
    Codes.CURR_DATE_MAX: "cannot be greater than current date {0}",
    Codes.CURR_YEAR_MAX: "cannot be greater than current year {0}",
    Codes.INVALID_DATE_MAX: "max date/year comparison error - {0}",
    Codes.CURR_DATE_MIN: "cannot be less than current date {0}",
    Codes.CURR_YEAR_MIN: "cannot be less than current year {0}",
    Codes.INVALID_DATE_MIN: "min date/year comparison error - {0}",
    Codes.FILLED_TRUE: "cannot be empty",
    Codes.FILLED_FALSE: "must be empty",
    Codes.COMPATIBILITY:
    "{1} for if {2} then {3} - compatibility rule no: {0}",
    Codes.COMPATIBILITY_ELSE:
    "{1} for if {2} else {3} - compatibility rule no: {0}",
    Codes.TEMPORAL:
    "{1} for if {2} in {4} visit then {3} in current visit - "
    "temporal rule no: {0}",
    Codes.NO_PRIMARY_KEY:
    "primary key variable {0} not set in current visit data",
    Codes.NO_PREV_VISIT:
    "failed to retrieve the {0} visit, cannot proceed with validation",
    Codes.FORMULA: "error in formula evaluation - {0}",
    Codes.CHECK_GDS_1:
    "If GDS not attempted (nogds=1), total GDS score should be 88 "
    "- GDS rule no: {0}",
    Codes.CHECK_GDS_2:
    "If GDS not attempted (nogds=1), there cannot be >=12 questions "
    "with valid scores - GDS rule no: {0}",
    Codes.CHECK_GDS_3:
    "incorrect GDS score {1}, expected value {2} - GDS rule no: {0}",
    Codes.CHECK_GDS_4:
    "incorrect prorated GDS score {1}, expected value {2} - GDS rule no: {0}",
    Codes.CHECK_GDS_5:
    "If GDS attempted (nogds = 0 or blank), at least 12 questions need "
    "to have valid scores - GDS rule no: {0}",
    Codes.COMPARE_WITH: "input value doesn't satisfy the condition {0}",
    Codes.COMPARE_WITH_PREV:
    "failed to retrieve record for {1} visit, cannot proceed with "
    "validation {0}",
    Codes.RXCUI: "Drug ID {0} is not a valid RXCUI",
    Codes.AGE_DATE_CONVERSION: "failed to convert value {0} to a date: {1}",
    Codes.COMPARE_AGE: "input value {0} doesn't satisfy the condition: {1}",
    Codes.COMPARE_AGE_INVALID_COMPARISON:
    "Error in comparing {0} to age at {1} ({2}): {3}",
    Codes.TEMPORAL_SWAPPED:
    "{1} for if {3} in current visit then {2} in {4} visit - "
    "temporal rule no: {0}",
    Codes.ADCID_NOT_MATCH:
    "Provided ADCID {0} does not match your center's ADCID",
    Codes.ADCID_NOT_VALID:
    "Provided ADCID {0} is not in the valid list of ADCIDs",
    Codes.SCORING_INVALID: "Provided value {0} does not match the expected score",
    Codes.INVALID_BIRTH_DATES:
    "Cannot compute birth date, one or more components empty or malformed",
    Codes.RXCUI_DATE_CONVERSION: "failed to convert value {0} to a date: {1}",
    Codes.RXCUI_DATED:
    "Drug ID {0} is not a valid RXCUI for the target date {1}",
}


def format_message(code: int,
                   info: Tuple[Any, ...] = (),
                   constraint: Any = None,
                   field: str = "",
                   value: Any = None) -> str:
    """Render the catalogue message for ``code``."""
    fmt = MESSAGES.get(code, "{0}")
    return fmt.format(*info, constraint=constraint, field=field, value=value)


@dataclass(frozen=True)
class ErrorEntry:
    """One violation in a record's error vector."""

    field: str
    code: int
    rule: str
    message: str

    def as_dict(self) -> Dict[str, Any]:
        return {
            "field": self.field,
            "code": self.code,
            "rule": self.rule,
            "message": self.message,
        }


#: Arrow type of the per-record error vector column.
ERROR_STRUCT = pa.struct([
    pa.field("field", pa.string()),
    pa.field("code", pa.int32()),
    pa.field("rule", pa.string()),
    pa.field("message", pa.string()),
])
ERRORS_TYPE = pa.list_(ERROR_STRUCT)


def errors_to_messages(entries: List[ErrorEntry]) -> Dict[str, List[Any]]:
    """Group formatted messages by field (the reference's ``errors`` shape)."""
    out: Dict[str, List[Any]] = {}
    for e in entries:
        out.setdefault(e.field, []).append(e.message)
    return out


class ErrorTreeNode:
    """Per-field node: ``node.errors`` is the list of ErrorEntry."""

    __slots__ = ("errors",)

    def __init__(self):
        self.errors: List[ErrorEntry] = []


class DocumentErrorTree:
    """Dict-like per-field view of one record's error vector — the API
    analog of ``cerberus.errors.DocumentErrorTree`` that the reference's
    ``validate_record`` returns (quality_check.py:97-134):
    ``tree[field].errors`` yields the field's ValidationError-like
    entries, ``tree[field]`` is None when the field has none. Integer
    indexing and iteration fall through to the FLAT entry list, so the
    same object serves as the Arrow-friendly coded error vector."""

    def __init__(self, entries: List[ErrorEntry]):
        self.entries: List[ErrorEntry] = list(entries)
        self._fields: Dict[str, ErrorTreeNode] = {}
        for e in self.entries:
            self._fields.setdefault(e.field,
                                    ErrorTreeNode()).errors.append(e)

    def __getitem__(self, key):
        if isinstance(key, int):
            return self.entries[key]
        return self._fields.get(key)

    def __contains__(self, field) -> bool:
        return field in self._fields

    def __iter__(self):
        return iter(self.entries)

    def __len__(self) -> int:
        return len(self.entries)

    def keys(self):
        return self._fields.keys()
