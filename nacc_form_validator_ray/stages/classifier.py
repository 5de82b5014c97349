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
        # null text scores as empty text (lr_train and the SQL twin's
        # coalesce do the same) — without this, utf8_length's null
        # propagates to NaN and .astype(int64) makes garbage logits
        txt = pc.fill_null(batch[self.text_column], "")
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


#: fixed-point grids for exact distributed training
_TRAIN_GRID = float(1 << 20)
#: dyadic feature scaling (exact float shifts): keeps every product in
#: the training loop inside float64's 52-bit exact-integer window
_FEAT_SCALE = {"bias": 1.0, "n_chars": 2.0 ** -10,
               "n_words": 2.0 ** -7, "n_digits": 2.0 ** -7,
               "n_upper": 2.0 ** -7}
_FEATURES = ["bias", "n_chars", "n_words", "n_digits", "n_upper"]


def _q20(x):
    """Quantize to the 2^-20 grid (floor(x*S + 0.5)/S, half-up) —
    the engine/DuckDB shared rounding convention."""
    return np.floor(np.asarray(x, dtype=np.float64) * _TRAIN_GRID
                    + 0.5) / _TRAIN_GRID


def lr_train(ds, label_fn=None, text_column: str = "text",
             label_column: str = "lang", positive: str = "en",
             iterations: int = 5, lr: float = 2.0 ** -4):
    """Distributed hard-sigmoid logistic-regression training with a
    bit-exact arithmetic contract (the TRAINING counterpart of
    :class:`LRScorer`'s broadcast-weights inference).

    Per round: every batch computes its gradient PARTIAL — features
    are the scorer's exact-integer RE2 counts, dyadically scaled
    (2^-10/2^-7 shifts); the activation is the hard sigmoid
    ``clamp(0.25*z + 0.5, 0, 1)`` (piecewise linear — exact on both
    engines, unlike exp) quantized to the 2^-20 grid; the residual ×
    feature products then carry <=30 fraction bits, so every partial
    sum is EXACT float64 integer-grid arithmetic, order-independent
    across batches and partitions. The driver merges partials (one
    tiny pull per round), steps ``w -= lr * g / n`` (one
    correctly-rounded divide) and re-quantizes weights to the grid —
    bit-identical to the DuckDB twin's chained per-iteration CTEs.

    Returns the weight table: (feature, weight) rows in feature order.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    w = np.zeros(len(_FEATURES), dtype=np.float64)
    scale = np.array([_FEAT_SCALE[f] for f in _FEATURES])

    def grad_partials(weights):
        wref = ray.put(weights)

        def run(batch: "pa.Table") -> "pa.Table":
            wv = ray.get(wref)
            txt = batch[text_column]
            if isinstance(txt, pa.ChunkedArray):
                txt = txt.combine_chunks()
            n = len(txt)
            X = np.empty((n, len(_FEATURES)), dtype=np.float64)
            X[:, 0] = 1.0
            X[:, 1] = pc.utf8_length(pc.fill_null(txt, "")).to_numpy(
                zero_copy_only=False)
            for j, name in enumerate(_FEATURES[2:], start=2):
                X[:, j] = pc.count_substring_regex(
                    pc.fill_null(txt, ""),
                    FEATURE_RE[name]).to_numpy(zero_copy_only=False)
            X *= scale
            y = pc.equal(pc.fill_null(batch[label_column], ""),
                         positive).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            z = X @ wv
            act = _q20(np.clip(0.25 * z + 0.5, 0.0, 1.0))
            r = act - y
            g = r @ X
            out = {"n": pa.array([np.float64(n)])}
            for j, name in enumerate(_FEATURES):
                out[f"g_{name}"] = pa.array([g[j]])
            return pa.table(out)

        return ds.map_batches(run, batch_format="pyarrow")

    for _ in range(iterations):
        parts = grad_partials(w)
        tot = np.zeros(len(_FEATURES) + 1, dtype=np.float64)
        for b in parts.iter_batches(batch_format="pyarrow",
                                    batch_size=4096):
            tot[0] += float(np.sum(
                b["n"].to_numpy(zero_copy_only=False)))
            for j, name in enumerate(_FEATURES):
                tot[j + 1] += float(np.sum(
                    b[f"g_{name}"].to_numpy(zero_copy_only=False)))
        n_docs = tot[0]
        w = _q20(w - lr * (tot[1:] / n_docs))

    return rd.from_arrow(pa.table({
        "feature": pa.array(_FEATURES, pa.string()),
        "weight": pa.array(w),
    }))
