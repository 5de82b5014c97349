"""Deterministic stratified sampling (domain reweighting).

``stratified_sample`` keeps each row with a per-GROUP rate — the domain
mixing step of a pretraining pipeline ("wikipedia at 0.9, common crawl
at 0.1") — decided by a pure hash of the row id, so the sample is
reproducible across runs, batch sizes and cluster sizes (unlike
``Dataset.random_sample``) and needs no shuffle at all: one stateless
``map_batches`` filter.

Decision rule, all integer arithmetic mod P31 (the repo's SQL-twin
hash family): keep row iff

    ((A * (id mod P31) + B) mod P31) mod den  <  threshold(group)

With explicit ``rates`` the threshold is ``floor(rate * den)``; without
rates each group gets the pseudo-random rate ``charfold(group) mod den``
— the self-contained demo mode whose DuckDB twin
(pipelines/queries.SQL_STRATIFIED_SAMPLE) is generated from the same
constants.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from nacc_form_validator_ray.stages.dedup import (P31, TOKEN_FOLD_MULT,
                                                  _fold_hash_strings)

SAMPLE_A, SAMPLE_B = 1103515245, 12345


def stratified_sample(ds, group_column: str, id_column: str,
                      rates: Optional[Dict[str, float]] = None,
                      default_rate: float = 0.0, den: int = 1 << 16):
    """Filter ``ds`` to a per-group deterministic sample. See module
    docstring for the decision rule."""
    import pyarrow as pa
    import pyarrow.compute as pc

    den = int(den)
    fixed = None
    if rates is not None:
        fixed = {g: int(np.floor(r * den)) for g, r in rates.items()}
        fixed_default = int(np.floor(default_rate * den))

    def keep(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_column]).astype(np.int64)
        h = (SAMPLE_A * (ids % P31) + SAMPLE_B) % P31 % den
        grp = batch[group_column]
        grp = grp.combine_chunks() if isinstance(
            grp, pa.ChunkedArray) else grp
        enc = pc.dictionary_encode(grp)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        if fixed is not None:
            dict_vals = enc.dictionary.to_pylist()
            thr_by_code = np.array(
                [fixed.get(v, fixed_default) for v in dict_vals],
                dtype=np.int64)
        else:
            thr_by_code = _fold_hash_strings(
                enc.dictionary, TOKEN_FOLD_MULT) % den
        return batch.filter(pa.array(h < thr_by_code[codes]))

    return ds.map_batches(keep, batch_format="pyarrow")
