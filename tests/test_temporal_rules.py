"""Conformance tests for temporal rules / datastore lookups, mirroring the
reference suite (tests/test_nacc_validator_datastore.py) over an
InMemoryDatastore seeded with the same history."""

from datetime import date

import pytest

from nacc_form_validator_ray.datastore import InMemoryDatastore
from nacc_form_validator_ray.rowval import RecordValidator


def make_ds():
    return InMemoryDatastore(
        pk_field="patient_id",
        orderby="visit_num",
        records={
            "PatientID1": [
                {"visit_num": 1, "taxes": 8, "birthyr": "1950",
                 "birthmo": None, "birthdy": 27},
                {"visit_num": 3, "taxes": 0, "birthyr": "1950",
                 "birthmo": 6, "birthdy": 9},
            ]
        },
        valid_rxcui=set(range(50)),
        rxcui_date_window={i: (date(2026, 1, 1), date(2026, 1, 1))
                           for i in range(50)},
        own_adcid=0,
        valid_adcids={0, 2, 5, 8, 10},
    )


def make_nv(schema):
    return RecordValidator(schema, allow_unknown=False,
                           primary_key="patient_id", datastore=make_ds())


@pytest.fixture
def taxes_schema():
    return {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "taxes": {
            "type": "integer",
            "temporalrules": [{
                "index": 0,
                "previous": {"taxes": {"allowed": [0]}},
                "current": {"taxes": {"forbidden": [8]}},
            }],
        },
    }


def test_temporal_check(taxes_schema):
    nv = make_nv(taxes_schema)
    assert nv.validate({"patient_id": "PatientID1", "visit_num": 4,
                        "taxes": 1})
    assert not nv.validate({"patient_id": "PatientID1", "visit_num": 4,
                            "taxes": 8})
    assert nv.errors == {
        "taxes": [
            "('taxes', ['unallowed value 8']) for if {'taxes': {'allowed': [0]}} "
            "in previous visit then {'taxes': {'forbidden': [8]}} in current "
            "visit - temporal rule no: 0"
        ]
    }


def test_temporal_check_swap_order(taxes_schema):
    taxes_schema["taxes"]["temporalrules"][0]["swap_order"] = True
    nv = make_nv(taxes_schema)
    assert nv.validate({"patient_id": "PatientID1", "visit_num": 4,
                        "taxes": 1})
    # 8 fails the current condition, so validation is skipped
    assert nv.validate({"patient_id": "PatientID1", "visit_num": 4,
                        "taxes": 8})
    nv.reset_record_cache()
    # previous of visit 2 is visit 1 (taxes=8, not allowed [0])
    assert not nv.validate({"patient_id": "PatientID1", "visit_num": 2,
                            "taxes": 1})
    assert nv.errors == {
        "taxes": [
            "('taxes', ['unallowed value 8']) for if {'taxes': {'forbidden': [8]}} "
            "in current visit then {'taxes': {'allowed': [0]}} in previous "
            "visit - temporal rule no: 0"
        ]
    }


def test_temporal_no_prev_visit(taxes_schema):
    nv = make_nv(taxes_schema)
    assert not nv.validate({"patient_id": "PatientID1", "visit_num": 0,
                            "taxes": 1})
    assert nv.errors == {
        "taxes": [
            "failed to retrieve the previous visit, cannot proceed with "
            "validation"
        ]
    }


def test_temporal_unknown_subject_no_prev(taxes_schema):
    nv = make_nv(taxes_schema)
    assert not nv.validate({"patient_id": "NoSuchPatient", "visit_num": 2,
                            "taxes": 1})
    assert nv.errors == {
        "taxes": [
            "failed to retrieve the previous visit, cannot proceed with "
            "validation"
        ]
    }


def test_temporal_previous_nonempty_passthrough():
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthmo": {
            "type": "integer",
            "temporalrules": [{
                "index": 0,
                "ignore_empty": ["birthmo", "birthdy"],
                "previous": {"birthmo": {"nullable": False},
                             "birthdy": {"nullable": False}},
                "current": {"birthmo": {"nullable": False}},
            }],
        },
    }
    nv = make_nv(schema)
    # previous nonempty of visit 4 is visit 3 (birthmo=6, birthdy=9)
    assert nv.validate({"patient_id": "PatientID1", "visit_num": 4,
                        "birthmo": 6})
    # no nonempty record before visit 2 -> pass through
    nv.reset_record_cache()
    assert nv.validate({"patient_id": "PatientID1", "visit_num": 2,
                        "birthmo": 6})


def test_compare_with_previous_record():
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthyr": {
            "type": "integer",
            "compare_with": {"comparator": "==", "base": "birthyr",
                             "previous_record": True},
        },
    }
    nv = make_nv(schema)
    # previous record's birthyr arrives as "1950" and is cast to int
    assert nv.validate({"patient_id": "PatientID1", "visit_num": 4,
                        "birthyr": 1950})
    assert not nv.validate({"patient_id": "PatientID1", "visit_num": 4,
                            "birthyr": 2000})
    assert nv.errors == {
        "birthyr": [
            "input value doesn't satisfy the condition "
            "birthyr == birthyr (previous record)"
        ]
    }
    nv.reset_record_cache()
    assert nv.validate({"patient_id": "PatientID1", "visit_num": 2,
                        "birthyr": 1950})


def test_compare_with_previous_nonempty_ignore_empty():
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthmo": {
            "type": "integer",
            "compare_with": {"comparator": "==", "base": "birthmo",
                             "previous_record": True, "ignore_empty": True},
        },
    }
    nv = make_nv(schema)
    assert nv.validate({"patient_id": "PatientID1", "visit_num": 4,
                        "birthmo": 6})
    nv.reset_record_cache()
    assert nv.validate({"patient_id": "PatientID1", "visit_num": 2,
                        "birthmo": 6})


def test_compare_with_previous_missing_not_ignored():
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthmo": {
            "type": "integer",
            "compare_with": {"comparator": "==", "base": "birthmo",
                             "previous_record": True},
        },
    }
    nv = make_nv(schema)
    nv.reset_record_cache()
    # previous of visit 2 is visit 1 whose birthmo is None
    assert not nv.validate({"patient_id": "PatientID1", "visit_num": 2,
                            "birthmo": 6})
    assert nv.errors == {
        "birthmo": [
            "failed to retrieve record for previous visit, cannot proceed "
            "with validation birthmo == birthmo (previous record)"
        ]
    }


def test_compare_with_initial_record():
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthdy": {
            "type": "integer",
            "compare_with": {"comparator": "==", "base": "birthdy",
                             "initial_record": True},
        },
    }
    nv = make_nv(schema)
    assert nv.validate({"patient_id": "PatientID1", "visit_num": 1,
                        "birthdy": 27})
    assert not nv.validate({"patient_id": "PatientID1", "visit_num": 3,
                            "birthdy": 30})
    assert nv.errors == {
        "birthdy": [
            "input value doesn't satisfy the condition "
            "birthdy == birthdy (initial record)"
        ]
    }


def test_temporal_initial_record():
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthdy": {
            "type": "integer",
            "temporalrules": [{
                "index": 0,
                "initial_record": True,
                "previous": {"birthdy": {"allowed": [27]}},
                "current": {"birthdy": {"allowed": [30]}},
            }],
        },
    }
    nv = make_nv(schema)
    assert nv.validate({"patient_id": "PatientID1", "visit_num": 3,
                        "birthdy": 30})
    assert not nv.validate({"patient_id": "PatientID1", "visit_num": 3,
                            "birthdy": 27})
    assert nv.errors == {
        "birthdy": [
            "('birthdy', ['unallowed value 27']) for if {'birthdy': "
            "{'allowed': [27]}} in initial visit then {'birthdy': "
            "{'allowed': [30]}} in current visit - temporal rule no: 0"
        ]
    }


def test_temporal_nested_compare_with_previous():
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthyr": {
            "type": "integer",
            "temporalrules": [{
                "index": 0,
                "previous": {"birthyr": {"forbidden": [-1]}},
                "current": {"birthyr": {"compare_with": {
                    "comparator": "==", "base": "birthyr",
                    "previous_record": True}}},
            }],
        },
    }
    nv = make_nv(schema)
    assert nv.validate({"patient_id": "PatientID1", "visit_num": 4,
                        "birthyr": 1950})
    assert not nv.validate({"patient_id": "PatientID1", "visit_num": 4,
                            "birthyr": 1951})
    assert nv.errors == {
        "birthyr": [
            "('birthyr', [\"input value doesn't satisfy the condition "
            "birthyr == birthyr (previous record)\"]) for "
            "if {'birthyr': {'forbidden': [-1]}} in previous visit "
            "then {'birthyr': {'compare_with': {'comparator': '==', "
            "'base': 'birthyr', 'previous_record': True}}} in current visit "
            "- temporal rule no: 0"
        ]
    }


def test_nested_compatibility_temporal_compare_with():
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthyr": {
            "type": "integer",
            "nullable": True,
            "compatibility": [{
                "index": 0,
                "if": {"birthyr": {"min": 1000, "max": 2025}},
                "then": {"birthyr": {"temporalrules": [{
                    "index": 0,
                    "previous": {"birthyr": {"min": 1000, "max": 2025}},
                    "current": {"birthyr": {"compare_with": {
                        "comparator": ">=", "base": "birthyr",
                        "previous_record": True}}},
                }]}},
            }],
        },
    }
    nv = make_nv(schema)
    for yr, ok in ((1950, True), (1980, True), (1940, False)):
        record = nv.cast_record({"patient_id": "PatientID1", "visit_num": 4,
                                 "birthyr": yr})
        assert nv.validate(record) is ok


def test_no_primary_key_value(taxes_schema):
    nv = make_nv(taxes_schema)
    assert not nv.validate({"patient_id": None, "visit_num": 4, "taxes": 1})
    assert nv.errors == {
        "patient_id": ["null value not allowed"],
        "taxes": [
            "failed to retrieve the previous visit, cannot proceed with "
            "validation",
            "primary key variable patient_id not set in current visit data",
        ],
    }


def test_datastore_not_set_raises_sys_error(taxes_schema):
    from nacc_form_validator_ray.rowval import ValidationException
    nv = RecordValidator(taxes_schema, primary_key="patient_id")
    with pytest.raises(ValidationException):
        nv.validate({"patient_id": "P1", "visit_num": 1, "taxes": 1})
    assert nv.sys_errors == {
        "taxes": ["Datastore not set, cannot validate temporal rules"]
    }


# ------------------------------------------------------------ vocabularies


def test_check_rxcui():
    schema = {"drug": {"type": "integer",
                       "function": {"name": "check_rxcui"}}}
    nv = make_nv(schema)
    for i in range(1, 50):
        assert nv.validate({"drug": i})
    assert nv.validate({"drug": 0})  # 0 = "no RXCUI code" is skipped
    assert not nv.validate({"drug": -1})
    assert nv.errors == {"drug": ["Drug ID -1 is not a valid RXCUI"]}
    assert not nv.validate({"drug": 100})
    assert nv.errors == {"drug": ["Drug ID 100 is not a valid RXCUI"]}


def test_check_rxcui_dated():
    schema = {
        "drug": {"type": "integer",
                 "function": {"name": "check_rxcui",
                              "args": {"target_date_field": "visitdate"}}},
        "visitdate": {"type": "string"},
    }
    nv = make_nv(schema)
    assert nv.validate({"drug": 24, "visitdate": "2026-01-01"})
    assert not nv.validate({"drug": 3, "visitdate": "2025-01-01"})
    assert nv.errors == {
        "drug":
        ["Drug ID 3 is not a valid RXCUI for the target date 2025-01-01"]
    }
    assert not nv.validate({"drug": 3, "visitdate": "hello world"})
    assert nv.errors == {
        "drug": [
            "failed to convert value hello world to a date: "
            "Unknown string format: hello world"
        ]
    }


def test_check_adcid():
    schema = {
        "adcid": {"type": "integer", "function": {"name": "check_adcid"}},
        "oldadcid": {"type": "integer",
                     "function": {"name": "check_adcid",
                                  "args": {"own": False}}},
    }
    nv = make_nv(schema)
    assert nv.validate({"adcid": 0})
    assert nv.validate({"oldadcid": 10})
    assert not nv.validate({"adcid": 1})
    assert nv.errors == {
        "adcid": ["Provided ADCID 1 does not match your center's ADCID"]
    }
    assert not nv.validate({"oldadcid": 20})
    assert nv.errors == {
        "oldadcid": ["Provided ADCID 20 is not in the valid list of ADCIDs"]
    }


def test_temporal_with_current_year_in_prev_conditions():
    """min/max with the current_year sentinel evaluated against the
    PREVIOUS record (reference test_nacc_validator_datastore.py:706-760)."""
    from nacc_form_validator_ray.utils import Clock
    from datetime import datetime
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthyr": {
            "type": "integer",
            "temporalrules": [{
                "index": 0,
                "previous": {"birthyr": {"min": 0,
                                         "max": "current_year"}},
                "current": {"birthyr": {"compare_with": {
                    "comparator": "==", "base": "birthyr",
                    "previous_record": True}}},
            }],
        },
    }
    nv = RecordValidator(schema, allow_unknown=False,
                         primary_key="patient_id", datastore=make_ds(),
                         clock=Clock(datetime(2026, 8, 17)))
    assert nv.validate({"patient_id": "PatientID1", "visit_num": 4,
                        "birthyr": 1950})
    assert not nv.validate({"patient_id": "PatientID1", "visit_num": 4,
                            "birthyr": 1949})
    assert nv.errors == {
        "birthyr": [
            '(\'birthyr\', ["input value doesn\'t satisfy the condition '
            'birthyr == birthyr (previous record)"]) for if {\'birthyr\': '
            "{'min': 0, 'max': 'current_year'}} in previous visit then "
            "{'birthyr': {'compare_with': {'comparator': '==', 'base': "
            "'birthyr', 'previous_record': True}}} in current visit - "
            'temporal rule no: 0'
        ]
    }


def test_uds_ivp_record_default_and_inmemory():
    """get_uds_ivp_record: base ABC declines (None, reference
    datastore.py default); InMemoryDatastore surfaces the subject's
    initial-visit packet when configured."""
    ds = make_ds()
    rec = {"patient_id": "PatientID1", "visit_num": 9}
    assert ds.get_uds_ivp_record(rec) is None
