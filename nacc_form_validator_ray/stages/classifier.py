"""Broadcast-weights document quality classifier (LR-style inference).

The 100-TB pattern this stage demonstrates: a trained model's weights
are shipped to the cluster ONCE (``ray.put``), each actor loads them in
``__init__``, and every batch is scored with vectorized kernels — the
same shape a real fastText / CCNet quality classifier (reference
analog: the rule-dictionary keep/drop decision in
``nacc_validator.py``) would use, with the weight file swapped in for
the literals below.

Oracle discipline: features are exact integers computed by the SAME
RE2 kernels DuckDB uses (`pyarrow.compute.count_substring_regex` vs
``len(regexp_extract_all(...))``), weights are integers on a 2^10
grid, and the logit is a pure int64 dot product — every score is
bit-identical to the generated SQL twin.
"""

from __future__ import annotations

import numpy as np

# Deterministic stand-in for trained weights, quantized to a 2^10 grid
# (a real model would be loaded from a checkpoint and quantized the
# same way; the inference path would not change).  Feature order:
# bias, n_chars, n_words, n_digits, n_upper.
LR_WEIGHTS_Q10 = {
    "bias": -2048,      # -2.0
    "n_chars": -1,      # slight length penalty per char
    "n_words": 24,      # longer prose is higher quality
    "n_digits": -48,    # digit-heavy pages penalized
    "n_upper": -12,     # SHOUTING penalized
}

FEATURE_RE = {
    "n_words": r"\S+",
    "n_digits": "[0-9]",
    "n_upper": "[A-Z]",
}


class LRScorer:
    """Actor-pool batch scorer: weights resolved once per actor in
    ``__init__`` (from an object-store ref when given), batches scored
    with Arrow RE2 kernels + one int64 dot product."""

    def __init__(self, weights: dict | None = None, weights_ref=None,
                 text_column: str = "text", id_column: str = "doc_id"):
        if weights_ref is not None:
            import ray
            weights = ray.get(weights_ref)
        self.w = dict(LR_WEIGHTS_Q10 if weights is None else weights)
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc
        txt = batch[self.text_column]
        feats = {"n_chars": pc.utf8_length(txt).to_numpy(
            zero_copy_only=False).astype(np.int64)}
        for name, rx in FEATURE_RE.items():
            feats[name] = pc.count_substring_regex(txt, rx) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        logit = np.full(len(txt), np.int64(self.w["bias"]))
        for name, f in feats.items():
            logit = logit + np.int64(self.w[name]) * f
        return pa.table({
            self.id_column: batch[self.id_column],
            "n_chars": feats["n_chars"],
            "n_words": feats["n_words"],
            "logit_q10": logit,
            "keep": logit >= 0,
        })


def score_documents(ds, weights: dict | None = None,
                    text_column: str = "text",
                    id_column: str = "doc_id", batch_size: int = 4096,
                    concurrency=(1, 8)):
    """Score every document with the broadcast-weights classifier.

    Weights ride the object store once (``ray.put``) and are fetched in
    each actor's constructor — never re-shipped per batch."""
    import ray
    ref = ray.put(dict(LR_WEIGHTS_Q10 if weights is None else weights))
    return ds.map_batches(
        LRScorer,
        fn_constructor_kwargs=dict(weights_ref=ref,
                                   text_column=text_column,
                                   id_column=id_column),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
