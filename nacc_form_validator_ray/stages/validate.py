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
        return table


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

        # ONE hash exchange on the primary key; subjects are grouped
        # inside each partition with a pandas groupby, so Ray-level
        # overhead is per partition, not per subject
        def temporal_partition(part: pd.DataFrame) -> pd.DataFrame:
            out = [tgv(group) for _, group in
                   part.groupby(pk_field, sort=False, dropna=False)]
            return pd.concat(out, ignore_index=True)

        ds = grouped_apply(ds, [pk_field], temporal_partition,
                           num_partitions=64)
    return ds
