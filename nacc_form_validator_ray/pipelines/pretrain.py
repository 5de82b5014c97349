"""End-to-end pretraining-data pipeline: the full composition.

    pages ──extract──signals──rule-schema keep/drop──PII scrub──┐
        keep only passed docs                                   │
        exact dedup (content hash, keep min id) ────────────────┤
        MinHash+LSH near-dup pairs → drop non-representatives ──┤
        write partitioned parquet + stats                       ┘

Every stage is one of the engine's documented operators; the near-dup
drop uses the distributed ``anti_join`` (hash exchange), never a
driver-side set, so the dup list can be arbitrarily large.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np
import pandas as pd

from nacc_form_validator_ray.pipelines.quality_filter import (
    WEB_QUALITY_RULES, build_quality_pipeline)
from nacc_form_validator_ray.stages.dedup import (exact_dedup,
                                                  minhash_candidate_pairs)
from nacc_form_validator_ray.stages.joins import anti_join
from nacc_form_validator_ray.utils import Clock


def build_pretrain_pipeline(pages_ds,
                            rules: Optional[Mapping[str, Any]] = None,
                            clock: Optional[Clock] = None,
                            near_dup_threshold: float = 0.8,
                            extract: bool = True):
    """pages Dataset -> cleaned, deduplicated training documents.

    Returns a Dataset of (doc_id, url, lang_pred, text=scrubbed text,
    n_words) — quality-passed, exact- and near-deduplicated.
    """
    ds = build_quality_pipeline(pages_ds, rules=rules, clock=clock,
                                extract=extract, collect="none")

    def keep_and_project(batch: pd.DataFrame) -> pd.DataFrame:
        kept = batch[batch["passed"]]
        # stable numeric doc id derived from the url (deterministic
        # across runs and parallelism)
        doc_id = pd.util.hash_array(
            kept["url"].to_numpy("U")).astype(np.int64).astype(np.int64)
        return pd.DataFrame({
            "doc_id": np.abs(doc_id),
            "url": kept["url"].to_numpy(),
            "lang_pred": kept["lang_pred"].to_numpy(),
            "text": kept["scrubbed_text"].to_numpy(),
            "n_words": kept["n_words"].to_numpy(np.int64),
        })

    docs = ds.map_batches(keep_and_project, batch_format="pandas")

    # exact dedup on normalized content
    docs = exact_dedup(docs, id_column="doc_id", text_column="text")

    # near-dup: candidate pairs above threshold; the larger id of each
    # pair is dropped (min-id representative wins)
    pairs = minhash_candidate_pairs(docs, id_column="doc_id",
                                    text_column="text",
                                    threshold=near_dup_threshold)
    dup_ids = pairs.map_batches(
        lambda b: pd.DataFrame({"doc_id": b["id_b"].astype(np.int64)}),
        batch_format="pandas")
    return anti_join(docs, dup_ids, on="doc_id")


def run_pretrain(input_dir: str, out_dir: str,
                 rules: Optional[Mapping[str, Any]] = None,
                 clock: Optional[Clock] = None) -> Dict[str, Any]:
    """Read pages parquet, clean + dedup, write partitioned parquet."""
    import ray.data as rd
    pages = rd.read_parquet(input_dir)
    n_in = pages.count()
    out = build_pretrain_pipeline(pages, rules=rules,
                                  clock=clock or Clock.frozen_now())
    out.write_parquet(out_dir)
    n_out = rd.read_parquet(out_dir, columns=["doc_id"]).count()
    return {"n_input": n_in, "n_output": n_out,
            "dropped": n_in - n_out}
