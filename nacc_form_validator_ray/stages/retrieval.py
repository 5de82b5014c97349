"""Keyword retrieval over the document corpus (BM25 top-k).

The lexical counterpart of stages/similarity.knn_bruteforce: score every
document against a broadcast query-term set with BM25 and return the
global top-k. Two streaming passes, both with bounded exchanges:

1. corpus stats — per-batch partials of (df per query term, doc count,
   token count); bounded by ``len(query_terms) + 2`` values per batch,
   merged by addition on the driver (the _merge_partials pattern).
2. scoring — idf table rides the closure (a handful of floats), each
   batch computes its docs' scores vectorized off the shared
   dictionary-encoded token stream and emits only its LOCAL top-k;
   the driver merges ``k x blocks`` rows.

HARD oracle: per-term scores are quantized to the 2^-20 grid
(stages/perplexity.LOGP_SCALE convention) so the per-doc sum is exact
dyadic arithmetic; idf uses driver-side ``math.log`` (libm — the same
``ln`` DuckDB calls, the perplexity precedent) and every other float op
is a correctly-rounded IEEE add/mul/div evaluated in the SAME
association order as the SQL twin (pipelines/queries._sql_bm25_search).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

#: fixed-point quantum for per-term BM25 scores (2^-20)
SCORE_SCALE = float(1 << 20)


def bm25_corpus_stats(ds, query_terms: Sequence[str],
                      text_column: str = "text") -> dict:
    """One streaming pass: ``{"n_docs", "total_toks", "df": {term: n}}``
    over the ``[a-z0-9]+`` token stream. Exact (each doc lives in
    exactly one batch)."""
    import pyarrow as pa
    from nacc_form_validator_ray.stages.text_signals import \
        arrow_token_codes

    terms = sorted(set(query_terms))
    t_arr = pa.array(terms, type=pa.string())

    def partial(batch: pa.Table) -> dict:
        import pyarrow.compute as pc
        col = batch[text_column]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        codes, dictionary, tok_doc, n_tokens = arrow_token_codes(
            arr, include_digits=True)
        df = np.zeros(len(terms), dtype=np.int64)
        total = int(n_tokens.sum()) if dictionary is not None else 0
        if dictionary is not None:
            t_codes = pc.index_in(t_arr,
                                  value_set=dictionary).to_pylist()
            for i, code in enumerate(t_codes):
                if code is not None:
                    df[i] = len(np.unique(tok_doc[codes == code]))
        n_docs = np.zeros(len(terms), dtype=np.int64)
        tot = np.zeros(len(terms), dtype=np.int64)
        if len(terms):
            n_docs[0] = batch.num_rows
            tot[0] = total
        return {"term": np.asarray(terms, dtype=object), "df": df,
                "n_docs": n_docs, "total_toks": tot}

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("term")["df"].sum()
    return {"n_docs": int(parts["n_docs"].sum()),
            "total_toks": int(parts["total_toks"].sum()),
            "df": {t: int(agg.get(t, 0)) for t in terms}}


def bm25_idf(n_docs: int, df: int) -> float:
    """Quantized BM25+ idf: ln((N - df + 0.5)/(df + 0.5) + 1), floored
    to the 2^-20 grid — always positive, SQL-identical."""
    x = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    return math.floor(x * SCORE_SCALE + 0.5) / SCORE_SCALE


def bm25_topk(ds, query_terms: Sequence[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              id_column: str = "doc_id", text_column: str = "text"):
    """Global BM25 top-k (doc_id, score, rank) for one query. Docs
    matching no term (score 0) are excluded; ties break on doc_id
    ascending — both rules mirrored by the SQL twin."""
    import pandas as pd
    import pyarrow as pa
    from nacc_form_validator_ray.stages.text_signals import \
        arrow_token_codes

    terms = sorted(set(query_terms))
    stats = bm25_corpus_stats(ds, terms, text_column)
    if stats["n_docs"] == 0:
        return pd.DataFrame({id_column: np.empty(0, dtype=np.int64),
                             "score": np.empty(0, dtype=np.float64),
                             "rank": np.empty(0, dtype=np.int64)})
    idf = np.array([bm25_idf(stats["n_docs"], stats["df"][t])
                    for t in terms])
    avgdl = float(stats["total_toks"]) / float(stats["n_docs"])
    t_arr = pa.array(terms, type=pa.string())
    one_minus_b, kp1 = 1.0 - b, k1 + 1.0

    def score(batch: pa.Table) -> dict:
        import pyarrow.compute as pc
        col = batch[text_column]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        ids = np.asarray(batch[id_column]).astype(np.int64)
        empty = {id_column: np.empty(0, dtype=np.int64),
                 "score": np.empty(0, dtype=np.float64)}
        codes, dictionary, tok_doc, n_tokens = arrow_token_codes(
            arr, include_digits=True)
        if dictionary is None:
            return empty
        n = len(ids)
        dl = n_tokens.astype(np.float64)
        # association order mirrored EXACTLY by the SQL twin
        inner = one_minus_b + b * (dl / avgdl)
        total = np.zeros(n, dtype=np.float64)
        t_codes = pc.index_in(t_arr,
                              value_set=dictionary).to_pylist()
        for i, code in enumerate(t_codes):
            if code is None:
                continue
            tf = np.bincount(tok_doc[codes == code],
                             minlength=n).astype(np.float64)
            hit = tf > 0
            s = ((idf[i] * tf[hit]) * kp1) / (tf[hit] + k1 * inner[hit])
            total[hit] += np.floor(s * SCORE_SCALE + 0.5) / SCORE_SCALE
        hit = total > 0.0
        ids, total = ids[hit], total[hit]
        if len(ids) > k:  # local top-k: score desc, id asc
            order = np.lexsort((ids, -total))[:k]
            ids, total = ids[order], total[order]
        return {id_column: ids, "score": total}

    local = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    local = local.sort_values(["score", id_column],
                              ascending=[False, True],
                              kind="stable").head(k)
    local["rank"] = np.arange(1, len(local) + 1, dtype=np.int64)
    return local.reset_index(drop=True)
