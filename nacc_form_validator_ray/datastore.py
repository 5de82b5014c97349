"""Longitudinal lookup surface (the "Datastore" extension point).

The reference exposes per-subject temporal lookups and reference-set
membership checks through an abstract ``Datastore``
(/root/reference/nacc_form_validator/datastore.py:10-136). In the Ray Data
engine the *production* path never performs point lookups: the temporal
stage shuffles once on the primary key (``groupby(pk).map_groups``) and
builds a tiny :class:`InMemoryDatastore` per subject group from the group's
own sorted history (see stages/temporal.py). The ABC is kept so users can
still plug a warehouse for record-at-a-time validation.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from bisect import bisect_left, bisect_right
from datetime import date
from typing import Any, Dict, List, Optional


class Datastore(ABC):
    """Abstract lookup surface for longitudinal and vocabulary checks."""

    def __init__(self, pk_field: str, orderby: str):
        self.__pk_field = pk_field
        self.__orderby = orderby

    @property
    def pk_field(self) -> str:
        return self.__pk_field

    @property
    def orderby(self) -> str:
        return self.__orderby

    @abstractmethod
    def get_previous_record(
            self, current_record: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        """The record immediately preceding ``current_record`` in the
        subject's ``orderby``-sorted history (as-of lag)."""

    @abstractmethod
    def get_previous_nonempty_record(
            self, current_record: Dict[str, Any],
            ignore_empty_fields: List[str]) -> Optional[Dict[str, Any]]:
        """Previous record restricted to history rows where every field in
        ``ignore_empty_fields`` is non-null."""

    @abstractmethod
    def get_initial_record(
            self, current_record: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        """The subject's first record."""

    def get_uds_ivp_record(
            self, current_record: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        """The initial-visit packet, if the module distinguishes one."""
        return None

    def is_valid_rxcui(self,
                       drugid: int,
                       target_date: Optional[date] = None) -> bool:
        """Drug-ID vocabulary membership, optionally date-qualified."""
        raise NotImplementedError

    def is_valid_adcid(self, adcid: int, own: bool) -> bool:
        """Center-ID membership (own center or valid list)."""
        raise NotImplementedError

    # Optional bulk-vocabulary surface: implementations that can hand
    # their whole vocabulary over enable the batch engine's vectorized
    # isin() membership path instead of per-record calls. Return None
    # to decline (e.g. date-qualified vocabularies).

    def rxcui_vocabulary(self) -> Optional[frozenset]:
        return None

    def adcid_vocabulary(self):
        """(own_adcid, frozenset(valid_adcids)) or None."""
        return None


class InMemoryDatastore(Datastore):
    """Datastore over an in-memory per-subject history.

    Used by the temporal groupby stage (one instance per subject group,
    history = the group's other rows) and by tests. Semantics follow the
    reference's conformance implementation
    (tests/test_nacc_validator_datastore.py:47-102): the current record is
    positioned in the ``orderby``-sorted history and its predecessor
    returned; the initial record is the first stored row.
    """

    def __init__(self,
                 pk_field: str,
                 orderby: str,
                 records: Optional[Dict[str, List[Dict[str, Any]]]] = None,
                 valid_rxcui: Optional[set] = None,
                 rxcui_date_window: Optional[Dict[int, tuple]] = None,
                 own_adcid: Optional[int] = None,
                 valid_adcids: Optional[set] = None):
        super().__init__(pk_field, orderby)
        self._db: Dict[str, List[Dict[str, Any]]] = {}
        for key, recs in (records or {}).items():
            self._db[key] = sorted(recs, key=lambda r: r[orderby])
        self._valid_rxcui = valid_rxcui
        self._rxcui_date_window = rxcui_date_window or {}
        self._own_adcid = own_adcid
        self._valid_adcids = valid_adcids

    def add_record(self, record: Dict[str, Any]) -> None:
        key = record[self.pk_field]
        history = self._db.setdefault(key, [])
        idx = bisect_left([r[self.orderby] for r in history],
                          record[self.orderby])
        history.insert(idx, record)

    def _predecessor(self, history: List[Dict[str, Any]],
                     current_record: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        # stable-sort-append semantics: a history row with an equal orderby
        # value counts as the predecessor (reference test datastore :47-66)
        order_val = current_record[self.orderby]
        idx = bisect_right([r[self.orderby] for r in history], order_val)
        return dict(history[idx - 1]) if idx > 0 else None

    def get_previous_record(
            self, current_record: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        history = self._db.get(current_record.get(self.pk_field))
        if history is None:
            return None
        return self._predecessor(history, current_record)

    def get_previous_nonempty_record(
            self, current_record: Dict[str, Any],
            ignore_empty_fields: List[str]) -> Optional[Dict[str, Any]]:
        history = self._db.get(current_record.get(self.pk_field))
        if history is None:
            return None
        filtered = [
            r for r in history
            if all(r.get(f) is not None for f in ignore_empty_fields)
        ]
        return self._predecessor(filtered, current_record)

    def get_initial_record(
            self, current_record: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        history = self._db.get(current_record.get(self.pk_field))
        return dict(history[0]) if history else None

    def is_valid_rxcui(self,
                       drugid: int,
                       target_date: Optional[date] = None) -> bool:
        if self._valid_rxcui is None:
            raise NotImplementedError("no RXCUI vocabulary configured")
        if drugid not in self._valid_rxcui:
            return False
        if target_date is not None and drugid in self._rxcui_date_window:
            start, end = self._rxcui_date_window[drugid]
            if (start is not None and target_date < start) or \
                    (end is not None and target_date > end):
                return False
        return True

    def is_valid_adcid(self, adcid: int, own: bool) -> bool:
        if own:
            if self._own_adcid is None:
                raise NotImplementedError("no own ADCID configured")
            return adcid == self._own_adcid
        if self._valid_adcids is None:
            raise NotImplementedError("no ADCID list configured")
        return adcid in self._valid_adcids

    def rxcui_vocabulary(self) -> Optional[frozenset]:
        """Full undated RXCUI set, or None when date windows apply
        (dated checks stay record-at-a-time)."""
        if self._valid_rxcui is None or self._rxcui_date_window:
            return None
        return frozenset(self._valid_rxcui)

    def adcid_vocabulary(self):
        if self._own_adcid is None and self._valid_adcids is None:
            return None
        return (self._own_adcid, frozenset(self._valid_adcids or ()))
