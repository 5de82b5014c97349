"""Sources: format-dispatched readers with column pruning."""

from nacc_form_validator_ray.sources.readers import read_any

__all__ = ["read_any"]
