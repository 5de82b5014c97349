"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library code it uses) initializes or shuts down
Ray. ``queries()`` exposes every implemented operator from SURVEY.md §2
plus the web-scale training-data operators; ``oracle_sql()`` carries the
DuckDB twin for each SQL-expressible entry (column names and dtypes
match — verified by scripts/check_oracle.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline smoke: web-text quality filter over the sf0.001
    documents table (signals → langid → rule-schema keep/drop with
    per-document error-code vectors → PII scrub)."""
    import ray.data as rd

    from nacc_form_validator_ray.pipelines.quality_filter import \
        build_quality_pipeline
    from nacc_form_validator_ray.pipelines.queries import DOC_RULES
    from nacc_form_validator_ray.utils import Clock

    from nacc_form_validator_ray.stages.perplexity import \
        train_ngram_model

    ds = rd.read_parquet(f"{SF0001}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])
    model = train_ngram_model(ds)
    out = build_quality_pipeline(ds, rules=DOC_RULES,
                                 clock=Clock.frozen_now(),
                                 ppl_model=model)
    return out.select_columns(["doc_id", "lang", "lang_pred", "log_ppl",
                               "passed", "n_errors", "n_redactions",
                               "scrubbed_text"])


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2 + dedup /
    similarity / text-analysis / multimodal operators)."""
    from nacc_form_validator_ray.pipelines.queries import all_queries
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY query — no rows-only entries
    remain (LSH/fingerprint/multimodal/pretrain/IVF paths all run on
    integer-exact or grid-quantized arithmetic their twins reproduce).
    The flagship page pipelines get hard oracles over the persisted
    deterministic page table (materialized here so the SQL runs no
    matter the query/oracle execution order; the driver's gate runs at
    sf0.01), and the IVF twin embeds the persisted centroid model as
    literals."""
    from nacc_form_validator_ray.pipelines.queries import (
        all_oracle_sql, flagship_oracles)
    out = all_oracle_sql()
    out.update(flagship_oracles("/root/testdata/sf0.01"))
    return out
