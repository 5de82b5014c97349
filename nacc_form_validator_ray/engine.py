"""Vectorized batch rule engine.

Evaluates a compiled rule schema over pandas/Arrow batches inside
``Dataset.map_batches``. The reference validates record-at-a-time
(quality_check.py:97-134); here the same semantics run column-wise:

* **cast stage** — vectorized equivalent of ``cast_record``
  (nacc_validator.py:207-257): ``"" -> null``, dtype casts with
  keep-original-on-failure, missing schema fields injected as null.
* **vector rules** — nullable/type/allowed/forbidden/min/max/regex/filled/
  anyof/compatibility/logic/compare_with/compute_gds evaluated as numpy
  boolean masks over whole columns.
* **row fallback** — fields using rules the vector path cannot express
  (``function``, temporal lookups, exotic jsonLogic) and rows with cast
  failures are re-evaluated by the exact row validator (rowval.py), which
  is also the differential-testing oracle for the vector path.

Violation *detection* is fully vectorized; exact error *messages* for the
nested combinators (compatibility/anyof/logic) are produced by re-running
the row validator on just the violating rows — at web scale violations are
sparse, so message formatting stays off the hot path.
"""

from __future__ import annotations

import re
from datetime import date, datetime
from typing import Any, Dict, List, Mapping, Optional, Tuple

import numpy as np
import pandas as pd

from nacc_form_validator_ray import utils
from nacc_form_validator_ray.datastore import Datastore
from nacc_form_validator_ray.errors import Codes, format_message
from nacc_form_validator_ray.keys import K
from nacc_form_validator_ray.rowval import (RecordValidator,
                                            build_dtype_map)

# rules the vector path can evaluate as masks
VECTOR_RULES = frozenset({
    "type", "required", "nullable", "allowed", "forbidden", "min", "max",
    "regex", "filled", "anyof", "compatibility", "logic", "compare_with",
    "compute_gds", "formatting", "meta", "function", "compare_age",
})

#: jsonLogic operators the vector compiler supports
VECTOR_LOGIC_OPS = frozenset({
    "var", "==", "!=", "<", "<=", ">", ">=", "and", "or", "!", "!!",
    "+", "-", "*", "count", "count_exact", "if", "?:", "min", "max",
    # "/" is deliberately row-profiled: the reference raises
    # ZeroDivisionError (sys_failure) on a zero divisor, which the
    # float-vector path would silently turn into inf (json_logic.py:/)
})


def schema_is_temporal(rules: Any) -> bool:
    """True if a rule tree touches previous/initial records."""
    if isinstance(rules, Mapping):
        for key, value in rules.items():
            if key == K.TEMPORALRULES:
                return True
            if key in (K.PREV_RECORD, K.INITIAL_RECORD) and value:
                return True
            if schema_is_temporal(value):
                return True
    elif isinstance(rules, (list, tuple)):
        return any(schema_is_temporal(v) for v in rules)
    return False


def split_schema(
        schema: Mapping[str, Mapping[str, Any]]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Split into (local, temporal) field groups. Temporal fields need the
    per-subject groupby stage; local fields are embarrassingly parallel."""
    local, temporal = {}, {}
    for field, rules in schema.items():
        (temporal if schema_is_temporal(rules) else local)[field] = rules
    return local, temporal


def _collect_strings(node: Any, out: set) -> None:
    if isinstance(node, str):
        out.add(node)
    elif isinstance(node, Mapping):
        for k, v in node.items():
            _collect_strings(k, out)
            _collect_strings(v, out)
    elif isinstance(node, (list, tuple)):
        for v in node:
            _collect_strings(v, out)


def _logic_vectorizable(expr: Any) -> bool:
    if not isinstance(expr, Mapping):
        return True
    op = next(iter(expr)) if expr else None
    if op not in VECTOR_LOGIC_OPS:
        return False
    args = expr[op]
    if not isinstance(args, (list, tuple)):
        args = [args]
    return all(_logic_vectorizable(a) for a in args)


def _child_type_consistent(field: str, rules: Mapping[str, Any],
                           dtypes: Dict[str, str]) -> bool:
    """A type declared inside an anyof child / condition set is only
    vector-safe when it matches the field's own dtype — otherwise the
    vector path (which checks types via the cast mask) would miss the
    child's independent type failure."""
    declared = rules.get(K.TYPE)
    if declared is None:
        return True
    from nacc_form_validator_ray.rowval import TYPE_TAGS
    names = declared if isinstance(declared, list) else [declared]
    return dtypes.get(field) in {TYPE_TAGS.get(t) for t in names}


def _conds_vectorizable(conds: Mapping[str, Any],
                        dtypes: Dict[str, str]) -> bool:
    # nested compare_with inside condition sets goes to the row path —
    # its string/mixed-type comparison semantics aren't worth vectorizing
    return all(
        K.COMPARE_WITH not in r
        and _child_type_consistent(f, r, dtypes)
        and _field_vectorizable(f, r, dtypes)
        for f, r in conds.items())


def _compare_with_vectorizable(field: str, constraint: Mapping[str, Any],
                               dtypes: Dict[str, str]) -> bool:
    """Vector compare_with covers numeric fields against numeric bases;
    everything else (string comparison, date bases, temporal records) uses
    the row path."""
    if constraint.get(K.PREV_RECORD) or constraint.get(K.INITIAL_RECORD):
        return False
    if dtypes.get(field) not in ("int", "float"):
        return False

    def operand_ok(key, allow_none=False):
        if key is None:
            return allow_none
        if isinstance(key, bool):
            return False
        if isinstance(key, (int, float)):
            return True
        if key in (K.CRR_YEAR, K.CRR_MONTH, K.CRR_DAY):
            return True
        if key == K.CRR_DATE:
            return False
        return dtypes.get(key) in ("int", "float")

    return operand_ok(constraint.get(K.BASE)) and \
        operand_ok(constraint.get(K.BASE_DECIMAL), allow_none=True) and \
        operand_ok(constraint.get(K.ADJUST), allow_none=True)


def _field_vectorizable(field: str, rules: Mapping[str, Any],
                        dtypes: Dict[str, str]) -> bool:
    for name, constraint in rules.items():
        if name not in VECTOR_RULES:
            return False
        if name == K.ANYOF:
            if not all(_child_type_consistent(field, c, dtypes)
                       and _field_vectorizable(field, c, dtypes)
                       for c in constraint):
                return False
        elif name == K.COMPATIBILITY:
            for c in constraint:
                for clause in (K.IF, K.THEN, K.ELSE):
                    sub = c.get(clause)
                    if sub is not None and \
                            not _conds_vectorizable(sub, dtypes):
                        return False
        elif name == K.LOGIC:
            if not _logic_vectorizable(constraint.get(K.FORMULA)):
                return False
        elif name == K.COMPARE_WITH:
            if not _compare_with_vectorizable(field, constraint, dtypes):
                return False
        elif name == K.FUNCTION:
            if not _score_variables_vectorizable(constraint):
                return False
        elif name == K.COMPARE_AGE:
            if not _compare_age_vectorizable(field, constraint, dtypes):
                return False
    return True


def _compare_age_vectorizable(field: str, constraint: Mapping[str, Any],
                              dtypes: Dict[str, str]) -> bool:
    """Vector compare_age needs a string date field, integer-typed birth
    components, and numeric compare_to targets."""
    if dtypes.get(field) != "str":
        return False

    def birth_ok(key):
        if isinstance(key, bool):
            return False
        if isinstance(key, int):
            return True
        return dtypes.get(key) == "int"

    if not birth_ok(constraint.get(K.BIRTH_YEAR)):
        return False
    for slot in (K.BIRTH_MONTH, K.BIRTH_DAY):
        if slot in constraint and not birth_ok(constraint[slot]):
            return False
    targets = constraint.get(K.COMPARE_TO)
    if isinstance(targets, (str, int)):
        targets = [targets]
    if not isinstance(targets, list):
        return False
    for t in targets:
        if isinstance(t, bool):
            return False
        if isinstance(t, (int, float)):
            continue
        if dtypes.get(t) not in ("int", "float"):
            return False
    return True


def _score_variables_vectorizable(constraint: Mapping[str, Any]) -> bool:
    """Vectorizable function plug-ins: score_variables (horizontal count
    + formula), undated check_rxcui and check_adcid (broadcast-set
    membership — the datastore must also expose its vocabulary in bulk,
    checked at BatchValidator construction)."""
    name = constraint.get(K.FUNCTION_NAME)
    args = constraint.get(K.FUNCTION_ARGS, {})
    if name == "score_variables":
        return _logic_vectorizable(args.get("logic", {}).get(K.FORMULA))
    if name == "check_rxcui":
        return args.get("target_date_field") is None
    if name == "check_adcid":
        return True
    return False


class CompiledSchema:
    """Driver-side compilation of a rule schema: dtype map, local/temporal
    split, vector/row field profile. Small and picklable — captured by the
    map_batches callables and shipped once per worker."""

    def __init__(self,
                 schema: Mapping[str, Mapping[str, Any]],
                 pk_field: Optional[str] = None,
                 orderby: Optional[str] = None,
                 strict: bool = True,
                 clock: Optional[utils.Clock] = None):
        self.schema = dict(schema)
        self.pk_field = pk_field
        self.orderby = orderby
        self.strict = strict
        # freeze "now" at compile time so every worker/retry/resume agrees
        # on current_date/current_year (reference calls datetime.now() per
        # rule, nacc_validator.py:375-385)
        self.clock = clock or utils.Clock.frozen_now()
        self.dtypes = build_dtype_map(schema)
        self.local_schema, self.temporal_schema = split_schema(self.schema)
        self.vector_fields: Dict[str, Any] = {}
        self.row_fields: Dict[str, Any] = {}
        for field, rules in self.local_schema.items():
            if _field_vectorizable(field, rules, self.dtypes):
                self.vector_fields[field] = rules
            else:
                self.row_fields[field] = rules
        # bad `formatting` attachments are definition errors; surface them
        # at compile time instead of per record (nacc_validator.py:393-417)
        for field, rules in self.schema.items():
            if K.FORMATTING in rules and self.dtypes.get(field) != "str":
                raise ValueError(
                    f"formatting definition not supported for non string "
                    f"types (field '{field}')")
        # every string mentioned anywhere in the rule tree (keys, operand
        # names, ...) — a superset of the columns rules can touch. Columns
        # outside this set skip the cast stage entirely.
        self.referenced: set = set()
        _collect_strings(self.schema, self.referenced)

    @property
    def has_temporal(self) -> bool:
        return bool(self.temporal_schema)


# ---------------------------------------------------------------- casting


_INT_RE = re.compile(r"^\s*[+-]?\d+\s*$")


def _parse_date_column(values: np.ndarray, as_datetime: bool) -> np.ndarray:
    """Parse an object column of date strings with the reference's
    year-first disambiguation. Fast strptime paths cover the two canonical
    layouts; stragglers fall back to dateutil."""
    ser = pd.Series(values, dtype=object)
    str_mask = np.array([isinstance(v, str) for v in values], dtype=bool)
    out = np.full(len(values), None, dtype=object)
    if str_mask.any():
        sub = ser[str_mask]
        yearfirst = sub.str.match(utils._YEARFIRST_RE.pattern, na=False)
        for fmt_mask, fmts in ((yearfirst, ("%Y-%m-%d", "%Y/%m/%d")),
                               (~yearfirst, ("%m/%d/%Y", "%m-%d-%Y"))):
            idx = sub.index[fmt_mask]
            if not len(idx):
                continue
            remaining = sub.loc[idx]
            parsed = pd.Series(pd.NaT, index=idx)
            for fmt in fmts:
                todo = parsed.isna()
                if not todo.any():
                    break
                parsed[todo] = pd.to_datetime(remaining[todo], format=fmt,
                                              errors="coerce")
            for i in idx:
                p = parsed.loc[i]
                if p is pd.NaT or pd.isna(p):
                    try:
                        out[i] = (utils.parse_datetime(ser.iloc[i])
                                  if as_datetime else
                                  utils.parse_date(ser.iloc[i]))
                    except (ValueError, TypeError):
                        out[i] = None
                else:
                    out[i] = p.to_pydatetime() if as_datetime else p.date()
    return out


class BatchCaster:
    """Vectorized ``cast_record``. Produces object columns holding casted
    Python values plus a per-field ``cast_ok`` mask (False where the value
    could not be cast and passed through as its original — those rows fail
    the type rule downstream, nacc_validator.py:243-251)."""

    def __init__(self, compiled: CompiledSchema):
        self.compiled = compiled

    def cast_frame(
            self, df: pd.DataFrame
    ) -> Tuple[pd.DataFrame, Dict[str, np.ndarray]]:
        n = len(df)
        out = {}
        cast_ok: Dict[str, np.ndarray] = {}
        for col in df.columns:
            if col not in self.compiled.referenced:
                # no rule can see this column — pass through untouched
                out[col] = df[col].reset_index(drop=True)
                continue
            dtype = self.compiled.dtypes.get(col)
            src = df[col]
            fast = self._fast_cast(src, dtype)
            if fast is not None:
                values, ok = fast
            else:
                values = src.to_numpy(dtype=object, copy=True)
                # normalize pandas NaN/NaT and "" to None
                null = pd.isna(pd.Series(values, dtype=object)).to_numpy()
                null |= np.array([isinstance(v, str) and v == ""
                                  for v in values], dtype=bool)
                values[null] = None
                ok = np.ones(n, dtype=bool)
                if dtype == "str":
                    # reference cast_record has no str branch: a non-string
                    # value stays uncast and fails the 'string' type rule
                    # (nacc_validator.py:228-251 + Cerberus BAD_TYPE).
                    # infer_dtype is one C pass; the per-value loop runs
                    # only for genuinely mixed columns
                    from pandas.api.types import infer_dtype
                    if infer_dtype(values, skipna=True) not in ("string",
                                                                "empty"):
                        ok = np.array(
                            [v is None or isinstance(v, str)
                             for v in values], dtype=bool)
                elif dtype:
                    values, ok = self._cast_column(values, null, dtype)
                ok = ok | null
            out[col] = values
            cast_ok[col] = ok
        for field in self.compiled.schema:
            if field not in out:
                out[field] = np.full(n, None, dtype=object)
                cast_ok[field] = np.ones(n, dtype=bool)
        frame = pd.DataFrame(out, copy=False)
        return frame, cast_ok

    def _fast_cast(self, src: pd.Series,
                   dtype: Optional[str]) -> Optional[Tuple[np.ndarray,
                                                           np.ndarray]]:
        """Zero-surprise vectorized paths for columns whose physical type
        already matches (the norm for Parquet inputs) — no per-value loop."""
        n = len(src)
        kind = src.dtype.kind
        ones = np.ones(n, dtype=bool)
        if kind in "iu":
            if dtype in (None, "int"):
                return src.to_numpy(dtype=object), ones
            if dtype == "float":
                return src.astype(np.float64).to_numpy(dtype=object), ones
            return None
        if kind == "f":
            null = src.isna().to_numpy()
            if dtype == "int":
                filled = src.fillna(0).astype(np.int64)
                values = filled.to_numpy(dtype=object)
                values[null] = None
                return values, ones
            if dtype in (None, "float"):
                values = src.to_numpy(dtype=object)
                values[null] = None
                return values, ones
            return None
        if kind == "b":
            if dtype in (None, "bool"):
                return src.to_numpy(dtype=object), ones
            return None
        if kind == "M":
            null = src.isna().to_numpy()
            if dtype == "date":
                values = np.array(src.dt.date, dtype=object)
            elif dtype == "datetime":
                values = np.array(src.dt.to_pydatetime(), dtype=object)
            elif dtype is None:
                # pd.Timestamp IS a datetime — rules treat it natively,
                # skip the costly per-value conversion for untyped columns
                values = src.to_numpy(dtype=object)
            else:
                return None  # e.g. str-typed field fed timestamps
            values[null] = None
            return values, ones
        return None

    def _cast_column(self, values: np.ndarray, null: np.ndarray,
                     dtype: str) -> Tuple[np.ndarray, np.ndarray]:
        n = len(values)
        ok = np.ones(n, dtype=bool)
        todo = ~null
        if not todo.any():
            return values, ok
        if dtype in ("int", "float", "bool"):
            for i in np.flatnonzero(todo):
                v = values[i]
                try:
                    if dtype == "int":
                        if isinstance(v, bool):
                            values[i] = int(v)
                        elif isinstance(v, int):
                            pass
                        elif isinstance(v, float):
                            values[i] = int(v)
                        elif isinstance(v, str) and _INT_RE.match(v):
                            values[i] = int(v)
                        else:
                            values[i] = int(v)  # raises for bad strings
                    elif dtype == "float":
                        values[i] = float(v)
                    else:
                        values[i] = bool(v)
                except (ValueError, TypeError):
                    ok[i] = False
        elif dtype in ("date", "datetime"):
            str_like = np.array([isinstance(v, str) for v in values],
                                dtype=bool) & todo
            parsed = _parse_date_column(values, dtype == "datetime") \
                if str_like.any() else np.full(n, None, dtype=object)
            for i in np.flatnonzero(todo):
                v = values[i]
                if isinstance(v, str):
                    p = parsed[i]
                    if p is None:
                        ok[i] = False
                    else:
                        values[i] = p
                elif isinstance(v, datetime):
                    values[i] = v if dtype == "datetime" else v
                elif isinstance(v, date):
                    pass
                elif isinstance(v, pd.Timestamp):
                    values[i] = (v.to_pydatetime() if dtype == "datetime"
                                 else v.date())
                else:
                    ok[i] = False
        return values, ok


# ------------------------------------------------------- mask primitives


def _numeric_view(values: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(float64 array with NaN, is_numeric mask) for an object column."""
    ser = pd.to_numeric(pd.Series(values, dtype=object), errors="coerce")
    arr = ser.to_numpy(dtype=np.float64)
    return arr, ~np.isnan(arr)


def _scalar_for_bound(bound: Any) -> Optional[float]:
    if isinstance(bound, bool):
        return None
    if isinstance(bound, (int, float)):
        return float(bound)
    return None


class VectorEvaluator:
    """Evaluates vector-profiled fields as boolean violation masks."""

    def __init__(self, compiled: CompiledSchema,
                 vocab: Optional[Dict[str, Any]] = None):
        self.compiled = compiled
        self.clock = compiled.clock
        self.vocab = vocab or {}
        self._regex_cache: Dict[str, Any] = {}

    # -- public -----------------------------------------------------------

    def field_violations(
            self, field: str, rules: Mapping[str, Any], df: pd.DataFrame,
            cast_ok: Dict[str, np.ndarray]
    ) -> List[Tuple[str, int, np.ndarray]]:
        """[(rule_name, code, mask)] for one top-level field."""
        n = len(df)
        values = df[field].to_numpy(dtype=object) if field in df \
            else np.full(n, None, dtype=object)
        null = np.array([v is None for v in values], dtype=bool)
        ok = cast_ok.get(field, np.ones(n, dtype=bool))
        results: List[Tuple[str, int, np.ndarray]] = []

        nullable = rules.get(K.NULLABLE, False)
        if not nullable:
            mask = null.copy()
            if mask.any():
                results.append(("nullable", Codes.NOT_NULLABLE, mask))

        live = ~null  # rows where value rules apply
        type_fail = live & ~ok
        if K.TYPE in rules and type_fail.any():
            results.append(("type", Codes.BAD_TYPE, type_fail))
        live = live & ok

        for name, constraint in rules.items():
            if name in (K.TYPE, K.NULLABLE, K.REQUIRED, K.META,
                        K.FORMATTING):
                continue
            handler = getattr(self, f"_v_{name}", None)
            if handler is None:
                continue
            for rule_name, code, mask in handler(field, constraint, rules,
                                                 df, values, null, live):
                if mask.any():
                    results.append((rule_name, code, mask))
        return results

    def conds_pass_mask(self, conds: Mapping[str, Any], op: str,
                        df: pd.DataFrame,
                        cast_ok: Dict[str, np.ndarray]) -> np.ndarray:
        """Pass mask for a compatibility/temporal condition set."""
        n = len(df)
        op = op.upper()
        acc = np.ones(n, dtype=bool) if op != "OR" else np.zeros(n,
                                                                 dtype=bool)
        for field, rules in conds.items():
            fail = np.zeros(n, dtype=bool)
            for _rule, _code, mask in self.field_violations(
                    field, rules, df, cast_ok):
                fail |= mask
            if op == "OR":
                acc |= ~fail
            else:
                acc &= ~fail
        return acc

    # -- builtin value rules ----------------------------------------------

    def _v_allowed(self, field, constraint, rules, df, values, null, live):
        isin = pd.Series(values, dtype=object).isin(constraint).to_numpy()
        yield "allowed", Codes.UNALLOWED_VALUE, live & ~isin

    def _v_forbidden(self, field, constraint, rules, df, values, null, live):
        isin = pd.Series(values, dtype=object).isin(constraint).to_numpy()
        yield "forbidden", Codes.FORBIDDEN_VALUE, live & isin

    def _v_regex(self, field, constraint, rules, df, values, null, live):
        anchored = constraint if constraint.endswith("$") else \
            constraint + "$"
        str_mask = np.array([isinstance(v, str) for v in values],
                            dtype=bool)
        matched = np.ones(len(values), dtype=bool)
        if str_mask.any():
            # match only the string subset: pandas' .str accessor raises
            # on mixed object columns, and the reference's regex rule
            # ignores non-strings anyway (rowval._rule_regex:343)
            matched[str_mask] = pd.Series(
                values[str_mask], dtype=object).str.match(
                anchored, na=True).to_numpy(dtype=bool)
        yield "regex", Codes.REGEX_MISMATCH, live & str_mask & ~matched

    def _v_filled(self, field, constraint, rules, df, values, null, live):
        if constraint:
            yield "filled", Codes.FILLED_TRUE, null.copy()
        else:
            yield "filled", Codes.FILLED_FALSE, ~null

    # -- min / max ---------------------------------------------------------

    def _bound_masks(self, kind, field, bound, rules, df, values, null,
                     live):
        is_max = kind == "max"
        dtype = self.compiled.dtypes.get(field)
        fmt = rules.get(K.FORMATTING)
        today = self.clock.today()

        if bound in (K.CRR_DATE, K.CRR_YEAR):
            # compare value-as-date against frozen now
            # (nacc_validator.py:495-566)
            if dtype == "str" or fmt:
                as_date = _parse_date_column(values, False)
            elif dtype in ("date", "datetime"):
                as_date = np.array(
                    [v.date() if isinstance(v, datetime) else v
                     for v in values], dtype=object)
            elif dtype == "int" and bound == K.CRR_YEAR:
                as_date = np.array(
                    [date(int(v), 1, 1)
                     if isinstance(v, int) and not isinstance(v, bool)
                     and 1 <= v <= 9999 else None for v in values],
                    dtype=object)
            else:
                as_date = np.full(len(values), None, dtype=object)
            invalid = live & np.array([d is None for d in as_date],
                                      dtype=bool)
            code_invalid = (Codes.INVALID_DATE_MAX if is_max
                            else Codes.INVALID_DATE_MIN)
            if invalid.any():
                yield kind, code_invalid, invalid
            if bound == K.CRR_DATE:
                viol = np.array(
                    [d is not None and
                     ((d > today) if is_max else (d < today))
                     for d in as_date], dtype=bool)
                code = Codes.CURR_DATE_MAX if is_max else Codes.CURR_DATE_MIN
            else:
                viol = np.array(
                    [d is not None and
                     ((d.year > today.year) if is_max else
                      (d.year < today.year)) for d in as_date], dtype=bool)
                code = Codes.CURR_YEAR_MAX if is_max else Codes.CURR_YEAR_MIN
            yield kind, code, live & viol
            return

        code = Codes.MAX_VALUE if is_max else Codes.MIN_VALUE
        if fmt in ("date", "datetime"):
            try:
                bound_cmp = (utils.parse_datetime(bound) if fmt == "datetime"
                             else utils.parse_date(bound))
            except (ValueError, TypeError):
                bound_cmp = None
            as_date = _parse_date_column(values, fmt == "datetime")
            parse_fail = live & np.array([d is None for d in as_date],
                                         dtype=bool)
            code_invalid = (Codes.INVALID_DATE_MAX if is_max
                            else Codes.INVALID_DATE_MIN)
            if parse_fail.any():
                yield kind, code_invalid, parse_fail
            if bound_cmp is not None:
                viol = np.array(
                    [d is not None and
                     ((d > bound_cmp) if is_max else (d < bound_cmp))
                     for d in as_date], dtype=bool)
                yield kind, code, live & viol
            return

        scalar = _scalar_for_bound(bound)
        if scalar is not None:
            num, is_num = _numeric_view(values)
            with np.errstate(invalid="ignore"):
                viol = (num > scalar) if is_max else (num < scalar)
            viol = np.where(is_num, viol, False)
            # non-numeric values vs numeric bound -> TypeError in the
            # reference, silently passes (cerberus catches TypeError)
            str_vals = np.array([isinstance(v, str) for v in values],
                                dtype=bool)
            viol &= ~str_vals
            yield kind, code, live & viol
        else:
            # string bound: plain python comparison on matching types
            viol = np.zeros(len(values), dtype=bool)
            for i in np.flatnonzero(live):
                try:
                    viol[i] = (values[i] > bound) if is_max \
                        else (values[i] < bound)
                except TypeError:
                    viol[i] = False
            yield kind, code, viol

    def _v_min(self, field, constraint, rules, df, values, null, live):
        yield from self._bound_masks("min", field, constraint, rules, df,
                                     values, null, live)

    def _v_max(self, field, constraint, rules, df, values, null, live):
        yield from self._bound_masks("max", field, constraint, rules, df,
                                     values, null, live)

    # -- combinators -------------------------------------------------------

    def _v_anyof(self, field, constraint, rules, df, values, null, live):
        n = len(df)
        any_pass = np.zeros(n, dtype=bool)
        for child in constraint:
            child_rules = dict(child)
            if K.TYPE not in child_rules and K.TYPE in rules:
                child_rules[K.TYPE] = rules[K.TYPE]
            fail = np.zeros(n, dtype=bool)
            for _r, _c, mask in self.field_violations(
                    field, child_rules, df,
                    {field: np.ones(n, dtype=bool)}):
                fail |= mask
            any_pass |= ~fail
        yield "anyof", Codes.ANYOF, live & ~any_pass

    def _v_compatibility(self, field, constraint, rules, df, values, null,
                         live):
        n = len(df)
        ones = {f: np.ones(n, dtype=bool) for f in df.columns}
        for c in constraint:
            if_mask = self.conds_pass_mask(c[K.IF],
                                           c.get(K.IF_OP, "AND"), df, ones)
            then_fail = ~self.conds_pass_mask(c[K.THEN],
                                              c.get(K.THEN_OP, "AND"), df,
                                              ones)
            viol = if_mask & then_fail
            yield "compatibility", Codes.COMPATIBILITY, viol
            else_conds = c.get(K.ELSE)
            if else_conds:
                else_fail = ~self.conds_pass_mask(
                    else_conds, c.get(K.ELSE_OP, "AND"), df, ones)
                yield "compatibility", Codes.COMPATIBILITY_ELSE, \
                    ~if_mask & else_fail

    # -- logic -------------------------------------------------------------

    def _v_logic(self, field, constraint, rules, df, values, null, live):
        result = self._eval_logic(constraint[K.FORMULA], df)
        truthy = self._truthiness(result, len(df))
        yield "logic", Codes.FORMULA, ~truthy

    def _truthiness(self, result: Any, n: int) -> np.ndarray:
        if isinstance(result, np.ndarray):
            if result.dtype == object:
                return np.array([bool(v) for v in result], dtype=bool)
            if result.dtype == bool:
                return result
            return ~np.isnan(result) & (result != 0)
        return np.full(n, bool(result))

    def _eval_logic(self, expr: Any, df: pd.DataFrame) -> Any:
        """Vector jsonLogic: returns a scalar or an object/float ndarray."""
        if not isinstance(expr, Mapping):
            return expr
        op = next(iter(expr))
        args = expr[op]
        if not isinstance(args, (list, tuple)):
            args = [args]
        n = len(df)
        if op == "var":
            name = args[0]
            if name in df.columns:
                return df[name].to_numpy(dtype=object)
            return np.full(n, args[1] if len(args) > 1 else None,
                           dtype=object)
        vals = [self._eval_logic(a, df) for a in args]

        def col(x):
            return x if isinstance(x, np.ndarray) else \
                np.full(n, x, dtype=object)

        if op in ("==", "!="):
            eq = self._soft_eq_vec(col(vals[0]), col(vals[1]))
            return eq if op == "==" else ~eq
        if op in ("<", "<=", ">", ">="):
            out = self._less_chain(op, [col(v) for v in vals])
            return out
        if op == "and":
            acc = col(vals[0])
            for v in vals[1:]:
                vc = col(v)
                t = self._truthiness(acc, n)
                acc = np.where(t, vc, acc)
            return acc
        if op == "or":
            acc = col(vals[0])
            for v in vals[1:]:
                vc = col(v)
                t = self._truthiness(acc, n)
                acc = np.where(t, acc, vc)
            return acc
        if op == "!":
            return ~self._truthiness(col(vals[0]), n)
        if op == "!!":
            return self._truthiness(col(vals[0]), n)
        if op in ("?:", "if"):
            if op == "?:":
                cond, a, b = vals
                return np.where(self._truthiness(col(cond), n), col(a),
                                col(b))
            acc = np.full(n, None, dtype=object)
            decided = np.zeros(n, dtype=bool)
            i = 0
            while i + 1 < len(vals):
                t = self._truthiness(col(vals[i]), n) & ~decided
                acc = np.where(t, col(vals[i + 1]), acc)
                decided |= t
                i += 2
            if len(vals) % 2:
                acc = np.where(~decided, col(vals[-1]), acc)
            return acc
        if op in ("+", "-", "*", "min", "max"):
            nums = [pd.to_numeric(pd.Series(col(v), dtype=object),
                                  errors="coerce").to_numpy(np.float64)
                    for v in vals]
            with np.errstate(invalid="ignore", divide="ignore"):
                if op == "+":
                    return sum(nums)
                if op == "-":
                    return -nums[0] if len(nums) == 1 else nums[0] - nums[1]
                if op == "*":
                    out = np.ones(n)
                    for m in nums:
                        out = out * m
                    return out
                if op == "min":
                    return np.nanmin(np.vstack(nums), axis=0)
                return np.nanmax(np.vstack(nums), axis=0)
        if op == "count":
            acc = np.zeros(n)
            for v in vals:
                acc += self._truthiness(col(v), n)
            return acc
        if op == "count_exact":
            base = col(vals[0])
            acc = np.zeros(n)
            for v in vals[1:]:
                acc += self._hard_eq_vec(base, col(v))
            return acc
        raise ValueError(f"Unrecognized operation {op}")

    def _soft_eq_vec(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        n = len(a)
        out = np.zeros(n, dtype=bool)
        an = pd.to_numeric(pd.Series(a, dtype=object), errors="coerce") \
            .to_numpy(np.float64)
        bn = pd.to_numeric(pd.Series(b, dtype=object), errors="coerce") \
            .to_numpy(np.float64)
        for i in range(n):
            av, bv = _pyval(a[i]), _pyval(b[i])
            if isinstance(av, str) or isinstance(bv, str):
                out[i] = str(av) == str(bv)
            elif isinstance(av, bool) or isinstance(bv, bool):
                out[i] = bool(av) is bool(bv)
            elif not np.isnan(an[i]) and not np.isnan(bn[i]):
                out[i] = abs(an[i] - bn[i]) <= 1e-2
            else:
                out[i] = av == bv
        return out

    def _hard_eq_vec(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.array([_pyval(a[i]) == _pyval(b[i])
                         for i in range(len(a))], dtype=bool)

    def _less_chain(self, op: str, cols: List[np.ndarray]) -> np.ndarray:
        n = len(cols[0])
        acc = np.ones(n, dtype=bool)
        for a, b in zip(cols, cols[1:]):
            step = np.zeros(n, dtype=bool)
            for i in range(n):
                av, bv = _pyval(a[i]), _pyval(b[i])
                if op == "<":
                    step[i] = _py_less(av, bv)
                elif op == "<=":
                    step[i] = _py_less(av, bv) or _py_soft_eq(av, bv)
                elif op == ">":
                    step[i] = _py_less(bv, av)
                else:
                    step[i] = _py_less(bv, av) or _py_soft_eq(av, bv)
            acc &= step
        return acc

    # -- compare_with ------------------------------------------------------

    def _v_compare_with(self, field, constraint, rules, df, values, null,
                        live):
        comparator = constraint[K.COMPARATOR]
        base = constraint[K.BASE]
        base_decimal = constraint.get(K.BASE_DECIMAL)
        adjustment = constraint.get(K.ADJUST)
        operator = constraint.get(K.OP)
        n = len(df)

        def resolve(key) -> Tuple[np.ndarray, np.ndarray]:
            """(float64 array, null mask) for a rule operand."""
            if key == K.CRR_YEAR:
                v = float(self.clock.today().year)
                return np.full(n, v), np.zeros(n, dtype=bool)
            if key == K.CRR_MONTH:
                return np.full(n, float(self.clock.today().month)), \
                    np.zeros(n, dtype=bool)
            if key == K.CRR_DAY:
                return np.full(n, float(self.clock.today().day)), \
                    np.zeros(n, dtype=bool)
            if isinstance(key, str) and key in df.columns:
                col = df[key].to_numpy(dtype=object)
                num = pd.to_numeric(pd.Series(col, dtype=object),
                                    errors="coerce").to_numpy(np.float64)
                isnull = np.array([v is None for v in col], dtype=bool)
                return num, isnull
            if isinstance(key, (int, float)) and not isinstance(key, bool):
                return np.full(n, float(key)), np.zeros(n, dtype=bool)
            # unresolvable literal -> treated as value itself (string); the
            # numeric compare then raises in the reference -> violation
            return np.full(n, np.nan), np.zeros(n, dtype=bool)

        base_val, base_null = resolve(base)
        if base_decimal:
            dec_val, dec_null = resolve(base_decimal)
            add = (~dec_null) & ~np.isnan(dec_val) & (dec_val != 0)
            base_val = np.where(add, base_val + dec_val / 10.0, base_val)

        value_num = pd.to_numeric(pd.Series(values, dtype=object),
                                  errors="coerce").to_numpy(np.float64)
        value_null = null

        adjusted = base_val
        eff_value = value_num
        eff_b_null = base_null
        trouble = np.zeros(n, dtype=bool)
        # TRUTHINESS gate, exactly like the reference
        # (nacc_validator.py:1165): a falsy adjustment (0, "") means NO
        # adjustment, not an adjustment of zero
        if adjustment and operator:
            adj_val, adj_null = resolve(adjustment)
            with np.errstate(divide="ignore", invalid="ignore"):
                if operator == "+":
                    adjusted = base_val + adj_val
                elif operator == "-":
                    adjusted = base_val - adj_val
                elif operator == "*":
                    adjusted = base_val * adj_val
                elif operator == "/":
                    adjusted = base_val / adj_val
                elif operator == "abs":
                    eff_value = np.abs(value_num - base_val)
                    adjusted = adj_val
                    # `abs(None - base)` raises in the reference -> error
                    trouble |= value_null
            if operator == "abs":
                # the reference assigns adjusted_value = adjustment with NO
                # arithmetic (nacc_validator compare_with abs branch), so a
                # None adjustment flows into compare_values' base-None
                # semantics instead of raising
                eff_b_null = adj_null
            else:
                # a null adjustment operand raises TypeError in the reference
                trouble |= np.isnan(adjusted)

        ok_mask = _vec_compare(comparator, eff_value, value_null, adjusted,
                               eff_b_null)
        viol = (~ok_mask | trouble) & ~base_null
        # base null -> unconditional COMPARE_WITH error
        #   (nacc_validator.py:1154-1158)
        yield "compare_with", Codes.COMPARE_WITH, viol | base_null

    # ------------------------------------------------------ compare_age

    def _v_compare_age(self, field, constraint, rules, df, values, null,
                       live):
        """Vectorized compare_age (nacc_validator.py:1229-1335): parse
        the date column once, assemble birth dates with
        pd.to_datetime(dict) (NaT == the reference's INVALID_BIRTH_DATES
        path), compute age in days/365.25, compare against every
        target. Null values were already dropped by the nullable
        override (rowval NULL_DROPPED includes compare_age)."""
        comparator = constraint[K.COMPARATOR]
        targets = constraint[K.COMPARE_TO]
        if isinstance(targets, (str, int)):
            targets = [targets]
        n = len(df)

        parsed = _parse_date_column(values, False)
        parse_fail = live & np.array([d is None for d in parsed],
                                     dtype=bool)
        if parse_fail.any():
            yield "compare_age", Codes.AGE_DATE_CONVERSION, parse_fail
        ok_rows = live & ~parse_fail

        def component(key, default):
            if key is None:
                key = default
            if isinstance(key, int) and not isinstance(key, bool):
                return (np.full(n, key, dtype=np.float64),
                        np.zeros(n, dtype=bool))
            col = df[key] if key in df.columns else \
                pd.Series([None] * n)
            isnull = pd.isna(col).to_numpy()
            vals = pd.to_numeric(col, errors="coerce") \
                .to_numpy(np.float64)
            # non-integral components are INVALID in the reference
            # (formatted with :02d); int-typed columns hold integers
            bad = ~isnull & (np.isnan(vals) | (vals != np.floor(vals)))
            return vals, isnull | bad

        by, by_bad = component(constraint.get(K.BIRTH_YEAR), None)
        bm, bm_bad = component(constraint.get(K.BIRTH_MONTH), 1)
        bd, bd_bad = component(constraint.get(K.BIRTH_DAY), 1)
        comp_bad = by_bad | bm_bad | bd_bad
        birth = pd.to_datetime(
            pd.DataFrame({"year": np.where(comp_bad, 2000, by),
                          "month": np.where(comp_bad, 1, bm),
                          "day": np.where(comp_bad, 1, bd)}),
            errors="coerce")
        birth_bad = ok_rows & (comp_bad | birth.isna().to_numpy())
        if birth_bad.any():
            yield "compare_age", Codes.INVALID_BIRTH_DATES, birth_bad
        ok_rows = ok_rows & ~birth_bad

        value_days = np.full(n, np.nan)
        idx = np.flatnonzero(ok_rows)
        if len(idx):
            as_ts = pd.to_datetime(
                pd.Series([parsed[i] for i in idx]), errors="coerce")
            value_days[idx] = as_ts.to_numpy("datetime64[D]") \
                .astype(np.int64)
        birth_days = birth.to_numpy("datetime64[D]").astype(np.int64) \
            .astype(np.float64)
        age = (value_days - birth_days) / 365.25

        for target in targets:
            if isinstance(target, (int, float)) and \
                    not isinstance(target, bool):
                tvals = np.full(n, float(target))
                tnull = np.zeros(n, dtype=bool)
            else:
                col = df[target] if target in df.columns else \
                    pd.Series([None] * n)
                tnull = pd.isna(col).to_numpy()
                tvals = pd.to_numeric(col, errors="coerce") \
                    .to_numpy(np.float64)
            cmp_ok = _vec_compare(comparator, age,
                                  np.zeros(n, dtype=bool), tvals, tnull)
            yield "compare_age", Codes.COMPARE_AGE, ok_rows & ~cmp_ok

    # ------------------------------------------------- score_variables

    def _v_function(self, field, constraint, rules, df, values, null,
                    live):
        """Vectorized score_variables: horizontal correct/incorrect count
        + logic formula over the computed total (the only function
        plug-in the profiler admits; nacc_validator.py:1362-1435)."""
        name = constraint.get(K.FUNCTION_NAME)
        if name in ("check_rxcui", "check_adcid"):
            yield from self._v_vocab_check(name, field, constraint, df,
                                           values, null)
            return
        args = constraint.get(K.FUNCTION_ARGS, {})
        mode = args.get("mode")
        scoring_key = args.get("scoring_key", {})
        logic = args.get("logic", {})
        calc = args.get("calc_var_name", "__total_sum")
        n = len(df)
        if calc in df.columns:
            raise ValueError(
                f"{calc} already exists in record, cannot use "
                "as calc_var_name")
        total = np.zeros(n, dtype=np.int64)
        skip = np.zeros(n, dtype=bool)
        for key, correct_value in scoring_key.items():
            if key in df.columns:
                col = df[key]
                key_null = pd.isna(col).to_numpy()
                eq = col.eq(correct_value).fillna(False).to_numpy(bool)
            else:
                key_null = np.ones(n, dtype=bool)
                eq = np.zeros(n, dtype=bool)
            skip |= key_null
            hit = eq if mode == "correct" else ~eq
            total += hit.astype(np.int64)
        df2 = df.copy()
        df2[calc] = total
        truthy = self._truthiness(
            self._eval_logic(logic.get(K.FORMULA), df2), n)
        yield "function", Codes.SCORING_INVALID, ~truthy & ~skip

    def _v_vocab_check(self, name, field, constraint, df, values, null):
        """Broadcast-set membership: the datastore's bulk vocabulary is
        loaded once per validator (BatchValidator ships it with the
        stage) and checked with np.isin (nacc_validator.py:1185-1227,
        1337-1360)."""
        n = len(df)
        num = pd.to_numeric(pd.Series(values, dtype=object),
                            errors="coerce").to_numpy(np.float64)
        if name == "check_rxcui":
            vocab = self.vocab.get("rxcui")
            # blank / 0 means "no RXCUI code" and is skipped
            live = ~null & ~np.isnan(num) & (num != 0)
            member = np.isin(num, np.fromiter(vocab, dtype=np.float64,
                                              count=len(vocab)))
            yield "function", Codes.RXCUI, live & ~member
            return
        own = constraint.get(K.FUNCTION_ARGS, {}).get("own", True)
        own_adcid, valid = self.vocab.get("adcid")
        # unlike rxcui there is NO blank skip: a null ADCID fails the
        # membership check (nacc_validator.py:1337-1360)
        if own:
            ok = ~np.isnan(num) & (num == float(own_adcid)) \
                if own_adcid is not None else np.zeros(n, dtype=bool)
            yield "function", Codes.ADCID_NOT_MATCH, ~ok
        else:
            member = np.isin(num, np.fromiter(
                valid, dtype=np.float64, count=len(valid))) \
                if valid else np.zeros(n, dtype=bool)
            yield "function", Codes.ADCID_NOT_VALID, ~member

    # -- compute_gds -------------------------------------------------------

    def _v_compute_gds(self, field, constraint, rules, df, values, null,
                       live):
        n = len(df)
        valid_count = np.zeros(n)
        total = np.zeros(n)
        for key in constraint:
            if key in df.columns:
                col = pd.to_numeric(pd.Series(df[key].to_numpy(dtype=object),
                                              dtype=object),
                                    errors="coerce").to_numpy(np.float64)
                is01 = (col == 0) | (col == 1)
                valid_count += is01
                total += np.where(is01, col, 0)
        nogds = np.zeros(n)
        if "nogds" in df.columns:
            nogds = pd.to_numeric(pd.Series(df["nogds"].to_numpy(object),
                                            dtype=object),
                                  errors="coerce").to_numpy(np.float64)
        nogds1 = nogds == 1
        value_num = pd.to_numeric(pd.Series(values, dtype=object),
                                  errors="coerce").to_numpy(np.float64)

        with np.errstate(invalid="ignore", divide="ignore"):
            yield "compute_gds", Codes.CHECK_GDS_1, \
                nogds1 & ~(value_num == 88)
            yield "compute_gds", Codes.CHECK_GDS_2, \
                nogds1 & (valid_count >= 12)
            all_answered = ~nogds1 & (valid_count == 15)
            yield "compute_gds", Codes.CHECK_GDS_3, \
                all_answered & (total != value_num)
            some = ~nogds1 & (valid_count < 15) & (15 - valid_count <= 3)
            raw = total + (total / np.maximum(valid_count, 1)) * \
                (15 - valid_count)
            prorated = np.floor(raw + 0.5)
            yield "compute_gds", Codes.CHECK_GDS_4, \
                some & (prorated != value_num)
            not_nogds = np.isnan(nogds) | (nogds == 0)
            yield "compute_gds", Codes.CHECK_GDS_5, \
                ~nogds1 & not_nogds & (valid_count < 12)


def _pyval(v):
    """numpy scalars (np.bool_, np.int64, ...) -> native python values so
    the JS-style type dispatch (isinstance bool/str/int) behaves like the
    row evaluator."""
    return v.item() if isinstance(v, np.generic) else v


def _py_less(a, b) -> bool:
    if a is None and b is None:
        return False
    if a is None:
        return True
    if b is None:
        return False
    if type(a) in (int, float) or type(b) in (int, float):
        try:
            a, b = float(a), float(b)
        except (TypeError, ValueError):
            return False
    try:
        return a < b
    except TypeError:
        return False


def _py_soft_eq(a, b) -> bool:
    from nacc_form_validator_ray.json_logic import _soft_eq
    return _soft_eq(a, b)


def _vec_compare(cmp: str, a: np.ndarray, a_null: np.ndarray, b: np.ndarray,
                 b_null: np.ndarray) -> np.ndarray:
    """Vectorized utils.compare_values over float arrays + null masks."""
    with np.errstate(invalid="ignore"):
        # tolerance applies ONLY to ==/!= (utils.compare_values:97-106);
        # ordered comparisons are exact — unlike jsonLogic's <=/>=
        close = np.abs(a - b) <= 1e-2
        if cmp == "==":
            core = close
        elif cmp == "!=":
            core = ~close
        elif cmp == "<":
            core = a < b
        elif cmp == "<=":
            core = a <= b
        elif cmp == ">":
            core = a > b
        else:
            core = a >= b
    both = a_null & b_null
    only_a = a_null & ~b_null
    only_b = ~a_null & b_null
    out = core.copy()
    out[both] = cmp in ("<=", "==", ">=")
    if cmp == "!=":
        out[only_a | only_b] = True
    else:
        out[only_a] = cmp in ("<", "<=")
        out[only_b] = cmp not in ("<", "<=")
    return out


# ------------------------------------------------------------ orchestration

#: codes whose message template needs no positional info — formattable
#: directly from (constraint, field, value) in "codes" mode
_SIMPLE_MESSAGE_CODES = frozenset({
    Codes.REQUIRED, Codes.UNKNOWN_FIELD, Codes.NOT_NULLABLE, Codes.BAD_TYPE,
    Codes.REGEX_MISMATCH, Codes.MIN_VALUE, Codes.MAX_VALUE,
    Codes.UNALLOWED_VALUE, Codes.FORBIDDEN_VALUE, Codes.ANYOF,
    Codes.FILLED_TRUE, Codes.FILLED_FALSE,
})


class BatchResult:
    """Validation result for one batch."""

    __slots__ = ("passed", "sys_failure", "n_errors", "row_idx", "fields",
                 "codes", "rules", "messages")

    def __init__(self, n: int):
        self.passed = np.ones(n, dtype=bool)
        self.sys_failure = np.zeros(n, dtype=bool)
        self.n_errors = np.zeros(n, dtype=np.int32)
        self.row_idx: List[int] = []
        self.fields: List[str] = []
        self.codes: List[int] = []
        self.rules: List[str] = []
        self.messages: List[str] = []

    def add(self, row: int, field: str, code: int, rule: str,
            message: str) -> None:
        self.passed[row] = False
        self.n_errors[row] += 1
        self.row_idx.append(row)
        self.fields.append(field)
        self.codes.append(code)
        self.rules.append(rule)
        self.messages.append(message)

    def errors_column(self) -> List[List[Dict[str, Any]]]:
        """Per-row ``list<struct>`` error vectors."""
        out: List[List[Dict[str, Any]]] = [[] for _ in range(len(self.passed))]
        for i in range(len(self.row_idx)):
            out[self.row_idx[i]].append({
                "field": self.fields[i],
                "code": self.codes[i],
                "rule": self.rules[i],
                "message": self.messages[i],
            })
        return out


class BatchValidator:
    """Validate pandas batches against a compiled schema.

    ``collect`` levels:
      * ``"none"``  — only passed/sys_failure/n_errors (fastest).
      * ``"codes"`` — plus the coded error vector, vector-formatted
        messages where cheap, empty string otherwise.
      * ``"full"``  — exact reference messages: violating rows found by the
        vector masks are re-validated per-field by the row oracle.
    """

    def __init__(self, compiled: CompiledSchema,
                 datastore: Optional[Datastore] = None,
                 collect: str = "codes"):
        self.compiled = compiled
        self.datastore = datastore
        self.collect = collect
        self.caster = BatchCaster(compiled)
        # vocabulary-backed function rules are vector-capable only when
        # the datastore hands over its vocabulary in bulk
        vocab: Dict[str, Any] = {}
        if datastore is not None:
            rx = datastore.rxcui_vocabulary()
            if rx is not None:
                vocab["rxcui"] = rx
            ad = datastore.adcid_vocabulary()
            if ad is not None:
                vocab["adcid"] = ad
        self.vector_fields = dict(compiled.vector_fields)
        self.row_fields = dict(compiled.row_fields)
        for f, rules in list(self.vector_fields.items()):
            fn = rules.get(K.FUNCTION, {})
            name = fn.get(K.FUNCTION_NAME) if fn else None
            if (name == "check_rxcui" and "rxcui" not in vocab) or \
                    (name == "check_adcid" and "adcid" not in vocab):
                self.row_fields[f] = self.vector_fields.pop(f)
        self.vector = VectorEvaluator(compiled, vocab=vocab)
        self._full_rv: Optional[RecordValidator] = None
        self._rowfields_rv: Optional[RecordValidator] = None
        self._field_rvs: Dict[str, RecordValidator] = {}

    # -- row-validator factories (compiled once, reused per batch) ---------

    def _full_row_validator(self) -> RecordValidator:
        if self._full_rv is None:
            self._full_rv = RecordValidator(
                self.compiled.local_schema,
                allow_unknown=True,
                primary_key=self.compiled.pk_field,
                datastore=self.datastore,
                clock=self.compiled.clock)
        return self._full_rv

    def _rowfields_validator(self) -> Optional[RecordValidator]:
        if not self.row_fields:
            return None
        if self._rowfields_rv is None:
            self._rowfields_rv = RecordValidator(
                self.row_fields,
                allow_unknown=True,
                primary_key=self.compiled.pk_field,
                datastore=self.datastore,
                parent_dtypes=self.compiled.dtypes,
                clock=self.compiled.clock)
        return self._rowfields_rv

    def _field_validator(self, field: str) -> RecordValidator:
        rv = self._field_rvs.get(field)
        if rv is None:
            rv = RecordValidator(
                {field: self.compiled.local_schema[field]},
                allow_unknown=True,
                primary_key=self.compiled.pk_field,
                datastore=self.datastore,
                parent_dtypes=self.compiled.dtypes,
                clock=self.compiled.clock)
            self._field_rvs[field] = rv
        return rv

    # -- main entry --------------------------------------------------------

    def validate_frame(self, df: pd.DataFrame) -> Tuple[pd.DataFrame,
                                                        BatchResult]:
        n = len(df)
        cframe, cast_ok = self.caster.cast_frame(df)
        result = BatchResult(n)

        # rows with cast failures take the exact row path wholesale
        needs_row = np.zeros(n, dtype=bool)
        for field in self.compiled.dtypes:
            if field in cast_ok:
                needs_row |= ~cast_ok[field]

        # unknown columns under strict mode
        if self.compiled.strict:
            for col in df.columns:
                if col not in self.compiled.schema:
                    msg = format_message(Codes.UNKNOWN_FIELD)
                    for i in range(n):
                        result.add(i, col, Codes.UNKNOWN_FIELD, "unknown",
                                   msg)

        # vector fields
        vec_rows = ~needs_row
        field_viol_rows: Dict[str, np.ndarray] = {}
        for field, rules in self.vector_fields.items():
            any_viol = np.zeros(n, dtype=bool)
            for rule, code, mask in self.vector.field_violations(
                    field, rules, cframe, cast_ok):
                mask = mask & vec_rows
                if not mask.any():
                    continue
                any_viol |= mask
                if self.collect == "none":
                    result.passed[mask] = False
                    result.n_errors[mask] += 1
                elif self.collect == "codes":
                    values = cframe[field].to_numpy(dtype=object)
                    cheap = code in _SIMPLE_MESSAGE_CODES
                    for i in np.flatnonzero(mask):
                        msg = format_message(code, (), rules.get(rule),
                                             field, values[i]) if cheap \
                            else ""
                        result.add(int(i), field, code, rule, msg)
            field_viol_rows[field] = any_viol

        # exact messages: re-validate violating rows per field
        if self.collect == "full":
            # drop the coarse vector entries; rebuild from the row oracle
            result = BatchResult(n)
            if self.compiled.strict:
                for col in df.columns:
                    if col not in self.compiled.schema:
                        msg = format_message(Codes.UNKNOWN_FIELD)
                        for i in range(n):
                            result.add(i, col, Codes.UNKNOWN_FIELD,
                                       "unknown", msg)
            records = None
            for field, any_viol in field_viol_rows.items():
                rows = np.flatnonzero(any_viol & vec_rows)
                if not len(rows):
                    continue
                if records is None:
                    records = cframe.to_dict("records")
                rv = self._field_validator(field)
                for i in rows:
                    rv.validate(records[i])
                    for e in rv.error_entries:
                        result.add(int(i), e.field, e.code, e.rule,
                                   e.message)

        # row-profiled fields on all vector rows
        rv = self._rowfields_validator()
        if rv is not None:
            records = cframe.to_dict("records")
            for i in np.flatnonzero(vec_rows):
                try:
                    rv.reset_record_cache()
                    rv.validate(records[i])
                    for e in rv.error_entries:
                        result.add(int(i), e.field, e.code, e.rule,
                                   e.message)
                except Exception:
                    result.sys_failure[i] = True
                    result.passed[i] = False

        # cast-failure rows: full row path on the ORIGINAL values
        if needs_row.any():
            frv = self._full_row_validator()
            raw = df.to_dict("records")
            for i in np.flatnonzero(needs_row):
                rec = {k: (None if pd.isna(v) or v == "" else v)
                       for k, v in raw[i].items()}
                try:
                    frv.reset_record_cache()
                    frv.validate(frv.cast_record(rec))
                    for e in frv.error_entries:
                        result.add(int(i), e.field, e.code, e.rule,
                                   e.message)
                except Exception:
                    result.sys_failure[i] = True
                    result.passed[i] = False

        return cframe, result
