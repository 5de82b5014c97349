"""Record-at-a-time quality-check facade.

API-compatible with the reference's ``QualityCheck``
(/root/reference/nacc_form_validator/quality_check.py:17-134): construct
with (pk_field, schema, strict, datastore) and call ``validate_record`` to
get the ``(passed, sys_failure, errors, error_entries)`` result tuple.

This is the convenience surface for single records; bulk validation should
go through the Ray Data pipeline (pipelines/validate.py), which evaluates
the same compiled rules over Arrow batches.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from nacc_form_validator_ray.datastore import Datastore
from nacc_form_validator_ray.errors import DocumentErrorTree
from nacc_form_validator_ray.rowval import RecordValidator, ValidationException
from nacc_form_validator_ray.utils import Clock


class QualityCheckException(Exception):
    """Raised if something goes wrong while loading rule definitions."""


class QualityCheck:
    """Compile a rule schema once and validate records against it."""

    def __init__(self,
                 pk_field: str,
                 schema: Dict[str, Dict[str, Any]],
                 strict: bool = True,
                 datastore: Optional[Datastore] = None,
                 clock: Optional[Clock] = None):
        self.__pk_field = pk_field
        self.__schema = schema
        if datastore and pk_field != datastore.pk_field:
            raise QualityCheckException(
                f"Mismatched primary key fields - {pk_field}, "
                f"{datastore.pk_field}")
        try:
            self.__validator = RecordValidator(
                schema,
                allow_unknown=not strict,
                primary_key=pk_field,
                datastore=datastore,
                clock=clock,
            )
        except (TypeError, RuntimeError) as error:
            raise QualityCheckException(f"Schema Error - {error}") from error

    @property
    def pk_field(self) -> str:
        return self.__pk_field

    @property
    def schema(self) -> Dict[str, Dict[str, Any]]:
        return self.__schema

    @property
    def validator(self) -> RecordValidator:
        return self.__validator

    def validate_record(
        self, record: Dict[str, Any]
    ) -> Tuple[bool, bool, Dict[str, List[Any]],
               Optional[DocumentErrorTree]]:
        """Cast then validate one record.

        Returns (passed, sys_failure, errors-by-field, error tree). The
        last element mirrors the reference's cerberus
        ``DocumentErrorTree`` (``tree[field].errors``; None on system
        failure, quality_check.py:125-134) while also behaving as the
        flat coded error vector (integer indexing / iteration).
        """
        cst_record = self.validator.cast_record(dict(record))
        sys_failure = False
        passed = False
        try:
            self.validator.reset_sys_errors()
            self.validator.reset_record_cache()
            passed = self.validator.validate(cst_record, normalize=False)
        except ValidationException:
            sys_failure = True

        if sys_failure:
            errors: Dict[str, List[Any]] = dict(self.validator.sys_errors)
            tree: Optional[DocumentErrorTree] = None
        else:
            errors = self.validator.errors
            tree = DocumentErrorTree(self.validator.error_entries)
        return passed, sys_failure, errors, tree
