"""Run state: per-partition lineage manifests, rule-hit metrics, resume."""
