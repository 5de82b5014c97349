"""Shared fixtures. Ray is initialised once per pytest session."""

import pytest

import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def make_validator():
    from nacc_form_validator_ray.rowval import RecordValidator

    def _make(schema, **kwargs):
        return RecordValidator(schema, allow_unknown=False, **kwargs)

    return _make


@pytest.fixture
def nv(make_validator):
    """Validator over the six-dtype dummy schema (FIXTURES.md F1)."""
    schema = {
        "dummy_int": {"nullable": True, "type": "integer"},
        "dummy_str": {"nullable": True, "type": "string"},
        "dummy_float": {"nullable": True, "type": "float"},
        "dummy_boolean": {"nullable": True, "type": "boolean"},
        "dummy_date": {"nullable": True, "type": "date", "max": 3000},
        "dummy_datetime": {"nullable": True, "type": "datetime"},
    }
    return make_validator(schema)


@pytest.fixture(scope="session")
def date_constraint():
    """MM/DD/YYYY or YYYY/MM/DD."""
    return ("(^(0[1-9]|1[0-2])[-/](0[1-9]|[12][0-9]|3[01])[-/](\\d{4})$)|"
            "(^(\\d{4})[-/](0[1-9]|1[0-2])[-/](0[1-9]|[12][0-9]|3[01])$)")
