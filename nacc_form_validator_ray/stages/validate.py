"""Dataset-level validation stages.

``validate_dataset`` is the bulk equivalent of the reference's CSV loop
(docs/validate_csv_records.py:90-100), recast as a streaming Ray Data
pipeline::

    read_parquet → map_batches(ValidateStage)          # local rules
                 → groupby(pk).map_groups(temporal)    # only if needed
                 → write_parquet / filter / aggregate

Appended columns: ``passed: bool``, ``sys_failure: bool``,
``n_errors: int32``, ``errors: list<struct<field,code,rule,message>>`` —
the per-document error-code vector.

Scale notes:
* ValidateStage is a callable class: the compiled schema ships once per
  actor (``__init__``), batches stream through ``__call__`` zero-copy
  until the pandas conversion.
* Only schemas with temporal rules pay a shuffle, and it is ONE shuffle
  on the primary key; everything else is embarrassingly parallel.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Mapping, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from nacc_form_validator_ray.datastore import Datastore
from nacc_form_validator_ray.engine import (BatchValidator, CompiledSchema)
from nacc_form_validator_ray.errors import ERRORS_TYPE

RESULT_COLUMNS = ("passed", "sys_failure", "n_errors", "errors")


def _errors_array(errors: List[List[Dict[str, Any]]]) -> pa.Array:
    return pa.array(errors, type=ERRORS_TYPE)


class ValidateStage:
    """map_batches callable: local (non-temporal) rule evaluation.

    Stateful-stage pattern: rule compilation happens once per actor in
    ``__init__``; ``__call__`` is pure batch work.
    """

    def __init__(self,
                 compiled: CompiledSchema,
                 datastore_factory: Optional[Callable[[], Datastore]] = None,
                 collect: str = "codes",
                 keep_input_columns: bool = True):
        datastore = datastore_factory() if datastore_factory else None
        self.validator = BatchValidator(compiled, datastore=datastore,
                                        collect=collect)
        self.collect = collect
        self.keep_input_columns = keep_input_columns

    def __call__(self, batch) -> pa.Table:
        if isinstance(batch, pa.Table):
            # zero-copy hot path: only the columns the rule program can
            # reference are converted to pandas; payload columns (text,
            # html, urls) never leave Arrow
            referenced = [c for c in batch.column_names
                          if c in self.validator.compiled.referenced]
            pdf = batch.select(referenced).to_pandas() if referenced \
                else pd.DataFrame(index=range(batch.num_rows))
            _, result = self.validator.validate_frame(pdf)
            table = batch if self.keep_input_columns else pa.table({})
        else:
            _, result = self.validator.validate_frame(batch)
            if self.keep_input_columns:
                table = pa.Table.from_pandas(batch, preserve_index=False)
            else:
                table = pa.table({})
        arrays = {
            "passed": pa.array(result.passed),
            "sys_failure": pa.array(result.sys_failure),
            "n_errors": pa.array(result.n_errors, type=pa.int32()),
        }
        if self.collect != "none":
            arrays["errors"] = _errors_array(result.errors_column())
        for name, arr in arrays.items():
            table = table.append_column(name, arr)
        # stray pandas metadata makes downstream schema-dedup hashing
        # noisy; the schema itself is all that matters
        return table.replace_schema_metadata(None)


class TemporalGroupValidator:
    """Per-subject-group temporal validation.

    Replaces the reference's Datastore point-lookups
    (datastore.py:42-104) with a group-local lag: the group IS the
    subject's full history, sorted by ``orderby``; the "previous record"
    is simply the preceding row. One ``groupby(pk)`` shuffle replaces
    per-record warehouse round-trips.

    Determinism note: rows within a subject must be uniquely ordered by
    ``orderby`` — ties fall back to the incoming block order, which is not
    stable across runs of a distributed shuffle.
    """

    def __init__(self, compiled: CompiledSchema,
                 datastore_factory: Optional[Callable[[], Datastore]] = None):
        self.compiled = compiled
        # vocabulary checks (rxcui/adcid) may still need a datastore
        self.vocab_datastore = (datastore_factory()
                                if datastore_factory else None)
        self._validator = None

    def _get_validator(self, datastore: Datastore):
        from nacc_form_validator_ray.rowval import RecordValidator
        if self._validator is None:
            self._validator = RecordValidator(
                self.compiled.temporal_schema,
                allow_unknown=True,
                primary_key=self.compiled.pk_field,
                datastore=datastore,
                parent_dtypes=self.compiled.dtypes,
                clock=self.compiled.clock)
        else:
            self._validator.datastore = datastore
        return self._validator

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        from nacc_form_validator_ray.rowval import ValidationException

        compiled = self.compiled
        orderby = compiled.orderby
        group = group.sort_values(orderby, kind="stable") \
            if orderby in group.columns else group
        records = group.to_dict("records")
        # normalize pandas NaN to None for rule semantics
        records = [{k: (None if _isna(v) else v) for k, v in r.items()}
                   for r in records]

        history = _GroupHistory(compiled.pk_field, orderby, records,
                                self.vocab_datastore)
        rv = self._get_validator(history)

        n = len(records)
        passed = np.ones(n, dtype=bool)
        sysf = np.zeros(n, dtype=bool)
        n_errors = np.zeros(n, dtype=np.int64)
        errors: List[List[Dict[str, Any]]] = [[] for _ in range(n)]
        for i, rec in enumerate(records):
            history.current_idx = i
            try:
                rv.reset_record_cache()
                rv._initial_records.clear()
                ok = rv.validate(rv.cast_record(dict(rec)))
                passed[i] = ok
                for e in rv.error_entries:
                    errors[i].append(e.as_dict())
                    n_errors[i] += 1
            except ValidationException:
                sysf[i] = True
                passed[i] = False

        out = group.copy()
        if "passed" in out.columns:
            out["passed"] = out["passed"].to_numpy(dtype=bool) & passed
            out["sys_failure"] = \
                out["sys_failure"].to_numpy(dtype=bool) | sysf
            out["n_errors"] = \
                out["n_errors"].to_numpy() + n_errors
            if "errors" in out.columns:
                merged = []
                for prev, new in zip(out["errors"].tolist(), errors):
                    prev = list(prev) if prev is not None else []
                    merged.append(prev + new)
                out["errors"] = merged
        else:
            out["passed"] = passed
            out["sys_failure"] = sysf
            out["n_errors"] = n_errors.astype(np.int32)
            out["errors"] = errors
        return out


def _isna(v: Any) -> bool:
    try:
        return v is None or (np.isscalar(v) and pd.isna(v)) or v is pd.NaT
    except (TypeError, ValueError):
        return False


class _GroupHistory(Datastore):
    """Datastore over a subject group's sorted rows. ``current_idx`` is set
    before validating each row; earlier rows are the history."""

    def __init__(self, pk_field, orderby, records, vocab=None):
        super().__init__(pk_field, orderby)
        self.records = records
        self.current_idx = 0
        self.vocab = vocab

    def get_previous_record(self, current_record):
        i = self.current_idx
        return dict(self.records[i - 1]) if i > 0 else None

    def get_previous_nonempty_record(self, current_record,
                                     ignore_empty_fields):
        for j in range(self.current_idx - 1, -1, -1):
            if all(self.records[j].get(f) is not None
                   for f in ignore_empty_fields):
                return dict(self.records[j])
        return None

    def get_initial_record(self, current_record):
        return dict(self.records[0]) if self.records else None

    def is_valid_rxcui(self, drugid, target_date=None):
        if self.vocab is None:
            raise NotImplementedError("no RXCUI vocabulary configured")
        return self.vocab.is_valid_rxcui(drugid, target_date)

    def is_valid_adcid(self, adcid, own):
        if self.vocab is None:
            raise NotImplementedError("no ADCID list configured")
        return self.vocab.is_valid_adcid(adcid, own)


def validate_dataset(ds,
                     schema: Mapping[str, Mapping[str, Any]],
                     pk_field: Optional[str] = None,
                     orderby: Optional[str] = None,
                     strict: bool = False,
                     collect: str = "codes",
                     datastore_factory: Optional[Callable[[], Datastore]]
                     = None,
                     batch_size: int = 4096,
                     concurrency: Optional[Any] = None,
                     clock=None):
    """Apply a rule schema to a Dataset; returns it with result columns.

    The temporal groupby stage runs only when the schema needs it.
    """
    compiled = CompiledSchema(schema, pk_field=pk_field, orderby=orderby,
                              strict=strict, clock=clock)
    # arrow in / arrow out: ValidateStage converts only rule-referenced
    # columns to pandas internally
    kwargs: Dict[str, Any] = {"batch_format": "pyarrow",
                              "batch_size": batch_size}
    ctor = {
        "compiled": compiled,
        "datastore_factory": datastore_factory,
        "collect": collect,
    }
    if concurrency is not None:
        # actor pool: schema compiled once per actor
        ds = ds.map_batches(ValidateStage, fn_constructor_kwargs=ctor,
                            concurrency=concurrency, **kwargs)
    else:
        # stateless tasks: the stage instance (small) ships with each task
        ds = ds.map_batches(ValidateStage(**ctor), **kwargs)
    if compiled.has_temporal:
        if not pk_field or not orderby:
            raise ValueError(
                "temporal rules require pk_field and orderby")
        from nacc_form_validator_ray.stages.partition import grouped_apply
        tgv = TemporalGroupValidator(compiled, datastore_factory)
        fast_specs = temporal_fast_specs(compiled)
        vectorized = VectorTemporalPartition(compiled, fast_specs) \
            if fast_specs else None

        # ONE hash exchange on the primary key; subjects are grouped
        # inside each partition, so Ray-level overhead is per partition,
        # not per subject. Simple compare_with-previous/initial schemas
        # take the fully vectorized shift/ffill path.
        def temporal_partition(part: pd.DataFrame) -> pd.DataFrame:
            if vectorized is not None and all(
                    pd.api.types.is_numeric_dtype(part[c])
                    for s in fast_specs
                    for c in (s["field"], s["base"])):
                return vectorized(part)
            out = [tgv(group) for _, group in
                   part.groupby(pk_field, sort=False, dropna=False)]
            return pd.concat(out, ignore_index=True)

        ds = grouped_apply(ds, [pk_field], temporal_partition,
                           num_partitions=64)
    return ds


# ------------------------------------------------- vectorized temporal


def temporal_fast_specs(compiled: CompiledSchema):
    """Profile the temporal schema for the vectorized fast path.

    Covered: fields whose rules are only {type (numeric), nullable,
    required, compare_with previous_record/initial_record} with a plain
    numeric field base (no adjustment/base_decimal). Anything else —
    temporalrules clauses, ignore_empty-less subtleties aside — keeps the
    exact row path. Returns a list of specs or None.
    """
    from nacc_form_validator_ray.keys import K
    specs = []
    for field, rules in compiled.temporal_schema.items():
        if set(rules) - {K.TYPE, K.NULLABLE, K.REQUIRED, K.COMPARE_WITH}:
            return None
        cw = rules.get(K.COMPARE_WITH)
        if not cw:
            return None
        prev = bool(cw.get(K.PREV_RECORD))
        initial = bool(cw.get(K.INITIAL_RECORD))
        if prev == initial:  # exactly one mode
            return None
        if cw.get(K.ADJUST) is not None or cw.get(K.BASE_DECIMAL):
            return None
        base = cw.get(K.BASE)
        if not isinstance(base, str):
            return None
        if compiled.dtypes.get(field) not in ("int", "float") or \
                compiled.dtypes.get(base) not in ("int", "float"):
            return None
        specs.append({
            "field": field,
            "base": base,
            "comparator": cw[K.COMPARATOR],
            "prev": prev,
            "ignore_empty": bool(cw.get(K.IGNORE_EMPTY, False)),
            "nullable": bool(rules.get(K.NULLABLE, False)),
        })
    return specs or None


class VectorTemporalPartition:
    """Whole-partition vectorized temporal evaluation: group-wise shifts
    and forward-fills replace the per-record previous/initial lookups, so
    a partition of thousands of subjects costs numpy kernels instead of
    per-row Python. Rows with a falsy primary key (reference: treated as
    'pk not set') get their exact two-error vector directly."""

    def __init__(self, compiled: CompiledSchema, specs):
        from nacc_form_validator_ray.errors import Codes, format_message
        self.compiled = compiled
        self.specs = specs
        self.codes = Codes
        self.fmt = format_message

    def __call__(self, part: pd.DataFrame) -> pd.DataFrame:
        from nacc_form_validator_ray.engine import _vec_compare
        from nacc_form_validator_ray.errors import Codes

        compiled = self.compiled
        pk, orderby = compiled.pk_field, compiled.orderby
        part = part.sort_values([pk, orderby], kind="stable") \
            .reset_index(drop=True)
        n = len(part)
        grouped = part.groupby(pk, sort=False, dropna=False)

        pk_vals = part[pk]
        falsy_pk = (pk_vals.isna() |
                    ~pk_vals.fillna(0).astype(bool)).to_numpy()

        passed = np.ones(n, dtype=bool)
        n_errors = np.zeros(n, dtype=np.int64)
        errors: List[List[Dict[str, Any]]] = [[] for _ in range(n)]

        def add_error(idx, field, code, rule, message):
            passed[idx] = False
            n_errors[idx] += 1
            errors[idx].append({"field": field, "code": int(code),
                                "rule": rule, "message": message})

        for spec in self.specs:
            field, base = spec["field"], spec["base"]
            visit_type = "previous" if spec["prev"] else "initial"
            comparison_str = (f"{field} {spec['comparator']} {base} "
                             f"({visit_type} record)")
            msg_fail = self.fmt(Codes.COMPARE_WITH, (comparison_str,))
            msg_noprev = self.fmt(Codes.COMPARE_WITH_PREV,
                                  (comparison_str, visit_type))

            value = pd.to_numeric(part[field], errors="coerce") \
                .to_numpy(np.float64)
            value_null = part[field].isna().to_numpy()

            if spec["nullable"] is False:
                for i in np.flatnonzero(value_null):
                    add_error(i, field, Codes.NOT_NULLABLE, "nullable",
                              self.fmt(Codes.NOT_NULLABLE))

            base_series = pd.to_numeric(part[base], errors="coerce")
            if spec["prev"]:
                if spec["ignore_empty"]:
                    shifted = base_series.groupby(
                        part[pk], sort=False, dropna=False).shift(1)
                    base_vals = shifted.groupby(
                        part[pk], sort=False, dropna=False).ffill()
                else:
                    base_vals = base_series.groupby(
                        part[pk], sort=False, dropna=False).shift(1)
            else:
                # the subject's literal first value, INCLUDING null
                # (groupby.first/transform('first') skip NaN, which would
                # silently repair a null initial record)
                pk_shifted = pk_vals.shift(1)
                first_mask = (pk_vals != pk_shifted) & ~(
                    pk_vals.isna() & pk_shifted.isna())
                if len(first_mask):
                    first_mask.iloc[0] = True
                base_vals = base_series.where(first_mask).groupby(
                    part[pk], sort=False, dropna=False).ffill()
            base_np = base_vals.to_numpy(np.float64)
            base_null = np.isnan(base_np)

            ok = _vec_compare(spec["comparator"], value, value_null,
                              base_np, base_null)
            if spec["prev"] and spec["ignore_empty"]:
                # no nonempty history -> pass through validation
                viol = ~ok & ~base_null
                missing = np.zeros(n, dtype=bool)
            else:
                viol = ~ok & ~base_null
                missing = base_null
            viol &= ~falsy_pk
            missing = missing & ~falsy_pk

            code_missing = Codes.COMPARE_WITH_PREV if spec["prev"] \
                else Codes.COMPARE_WITH
            msg_missing = msg_noprev if spec["prev"] else msg_fail
            for i in np.flatnonzero(missing):
                add_error(i, field, code_missing, "compare_with",
                          msg_missing)
            for i in np.flatnonzero(viol):
                add_error(i, field, Codes.COMPARE_WITH, "compare_with",
                          msg_fail)

            # falsy pk: NO_PRIMARY_KEY (attributed to the base field,
            # reference nacc_validator.py:281-284 via field=base) + the
            # missing-record compare error
            msg_nopk = self.fmt(Codes.NO_PRIMARY_KEY, (pk,))
            for i in np.flatnonzero(falsy_pk):
                add_error(i, base, Codes.NO_PRIMARY_KEY, "temporalrules",
                          msg_nopk)
                if not (spec["prev"] and spec["ignore_empty"]):
                    # with ignore_empty the reference passes through when
                    # no record is retrievable (nacc_validator.py:1141)
                    add_error(i, field, code_missing, "compare_with",
                              msg_missing)

        out = part
        if "passed" in out.columns:
            out["passed"] = out["passed"].to_numpy(dtype=bool) & passed
            out["n_errors"] = out["n_errors"].to_numpy() + n_errors
            if "errors" in out.columns:
                merged = []
                for prev, new in zip(out["errors"].tolist(), errors):
                    prev = list(prev) if prev is not None else []
                    merged.append(prev + new)
                out["errors"] = merged
        else:
            out["passed"] = passed
            out["sys_failure"] = np.zeros(n, dtype=bool)
            out["n_errors"] = n_errors.astype(np.int32)
            out["errors"] = errors
        return out
