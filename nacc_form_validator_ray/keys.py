"""Schema vocabulary for the rule language.

The rule language is schema-as-data: a ``Dict[field, rule-dict]`` loaded
from JSON/YAML. The key names below are the shared, public data format of
the reference engine (see /root/reference/nacc_form_validator/keys.py:4-43)
and are kept verbatim so existing rule files run unchanged on this engine.
"""


class K:
    """JSON schema attribute labels (rule-file vocabulary)."""

    TYPE = "type"
    REQUIRED = "required"
    NULLABLE = "nullable"
    ALLOWED = "allowed"
    FORBIDDEN = "forbidden"
    MIN = "min"
    MAX = "max"
    ANYOF = "anyof"
    REGEX = "regex"
    FILLED = "filled"
    COMPATIBILITY = "compatibility"
    TEMPORALRULES = "temporalrules"
    LOGIC = "logic"
    FUNCTION = "function"
    COMPUTE_GDS = "compute_gds"
    COMPARE_WITH = "compare_with"
    COMPARE_AGE = "compare_age"

    OP = "op"
    IF_OP = "if_op"
    THEN_OP = "then_op"
    ELSE_OP = "else_op"
    IF = "if"
    THEN = "then"
    ELSE = "else"
    META = "meta"
    ERRMSG = "errmsg"
    ORDERBY = "orderby"
    CONSTRAINTS = "constraints"
    PREV_OP = "prev_op"
    CURR_OP = "curr_op"
    CURRENT = "current"
    PREVIOUS = "previous"
    CRR_DATE = "current_date"
    CRR_YEAR = "current_year"
    CRR_MONTH = "current_month"
    CRR_DAY = "current_day"
    PREV_RECORD = "previous_record"
    FORMULA = "formula"
    INDEX = "index"
    FORMATTING = "formatting"
    COMPARATOR = "comparator"
    BASE = "base"
    BASE_DECIMAL = "base_decimal"
    ADJUST = "adjustment"
    IGNORE_EMPTY = "ignore_empty"
    BIRTH_MONTH = "birth_month"
    BIRTH_DAY = "birth_day"
    BIRTH_YEAR = "birth_year"
    COMPARE_TO = "compare_to"
    SWAP_ORDER = "swap_order"
    FUNCTION_NAME = "name"
    FUNCTION_ARGS = "args"
    INITIAL_RECORD = "initial_record"


# Alias matching the reference's public name so rule-authoring code that
# imports ``SchemaDefs`` keeps working.
SchemaDefs = K
