"""Mergeable sketches for corpus-scale statistics.

``count_min_estimates`` — corpus-scale token-frequency estimation via
a count-min sketch. The exchange is the d×w counter grid — FIXED size
regardless of vocabulary or corpus — merged by addition; estimates for
a broadcast probe vocabulary are read off the merged grid
(min over the d hashed cells). The hash family is the repo's
deterministic mod-P31 affine family over the char-fold token hash, so
the DuckDB twin (pipelines/queries.SQL_HEAVY_HITTERS) rebuilds the
identical grid in SQL and the estimates match bit-for-bit. At 100 TB
the per-batch partial is pre-reduced to the sparse nonzero cells of a
local dense grid (vocabulary-in-batch cost), and the driver-side merge
is bounded by d×w rows — no per-token exchange ever happens.

``grouped_histogram_quantiles`` — approximate grouped quantiles via a
fixed-width histogram sketch. The exact grouped quantile
(pipelines/queries.q_event_value_quantiles) exchanges every value; the
sketch exchanges only (group, bin, count) partials — bounded by
``groups x bins`` regardless of corpus size, and mergeable by addition,
which is what survives 100 TB. The estimate is the LOWER EDGE of the
first bin whose cumulative count reaches ``ceil(q * total)`` — a
deterministic integer rule, so the DuckDB twin
(pipelines/queries.SQL_HIST_QUANTILES) reproduces it bit-for-bit.
Accuracy is ±bin_width by construction; pick the width from the value
scale (log-width bins are one map away).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def grouped_histogram_quantiles(ds, group_column: str,
                                value_column: str,
                                qs: Sequence[float],
                                bin_width: float,
                                num_partitions: int = 16):
    """(group, q, rank, bin, est) per requested quantile. See module
    docstring for the estimator contract."""
    import pyarrow as pa
    from nacc_form_validator_ray.stages.partition import (grouped_agg_sum,
                                                          grouped_apply)
    qs = [float(q) for q in qs]

    def partial(batch: pa.Table) -> dict:
        import pyarrow.compute as pc
        vals = np.asarray(batch[value_column], dtype=np.float64)
        bins = np.floor(vals / bin_width).astype(np.int64)
        grp = batch[group_column]
        grp = grp.combine_chunks() if isinstance(
            grp, pa.ChunkedArray) else grp
        enc = pc.dictionary_encode(grp)
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # per-batch pre-aggregation: one packed (code, bin) bincount
        shift = max(int(bins.max() - bins.min() + 1).bit_length(), 1) \
            if len(bins) else 1
        base = bins.min() if len(bins) else 0
        key = (codes << shift) | (bins - base)
        uk, cnt = np.unique(key, return_counts=True)
        u_codes = uk >> shift
        u_bins = (uk & ((1 << shift) - 1)) + base
        gvals = enc.dictionary.take(
            pa.array(u_codes, type=pa.int64())) \
            .to_numpy(zero_copy_only=False)
        return {group_column: gvals,
                "bin": u_bins,
                "cnt": cnt.astype(np.int64)}

    totals = grouped_agg_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_column, "bin"], ["cnt"], num_partitions=num_partitions)

    def finalize(part) -> dict:
        grp = np.asarray(part[group_column])
        bins = np.asarray(part["bin"]).astype(np.int64)
        cnt = np.asarray(part["cnt"]).astype(np.int64)
        import pandas as pd
        out_g, out_q, out_rank, out_bin = [], [], [], []
        # factorize for a sortable key (codes are partition-local and
        # only order the loop; output carries the original values)
        gcodes = pd.factorize(grp)[0]
        order = np.lexsort((bins, gcodes))
        grp, bins, cnt = grp[order], bins[order], cnt[order]
        gfirst = np.ones(len(grp), dtype=bool)
        gfirst[1:] = grp[1:] != grp[:-1]
        starts = np.flatnonzero(gfirst)
        ends = np.append(starts[1:], len(grp))
        for s, e in zip(starts, ends):
            c = np.cumsum(cnt[s:e])
            total = int(c[-1])
            for q in qs:
                rank = int(np.ceil(q * total)) or 1
                idx = int(np.searchsorted(c, rank))
                out_g.append(grp[s])
                out_q.append(q)
                out_rank.append(rank)
                out_bin.append(bins[s + idx])
        return {group_column: np.asarray(out_g),
                "q": np.asarray(out_q, dtype=np.float64),
                "rank": np.asarray(out_rank, dtype=np.int64),
                "bin": np.asarray(out_bin, dtype=np.int64),
                "est": np.asarray(out_bin, dtype=np.float64)
                * bin_width}

    return grouped_apply(totals, [group_column], finalize,
                         num_partitions=num_partitions,
                         fn_format="pyarrow")


def cms_params(depth: int, seed: int = 29):
    """The d affine constants (a, b) with 1 <= a < P31, 0 <= b < P31 —
    shared by the engine and the generated SQL twin (the minhash_params
    convention, stages/dedup.py)."""
    from nacc_form_validator_ray.stages.dedup import P31
    rng = np.random.RandomState(seed)
    a = rng.randint(1, P31, size=depth).astype(np.int64)
    b = rng.randint(0, P31, size=depth).astype(np.int64)
    return a, b


def count_min_estimates(ds, probe_tokens: Sequence[str],
                        text_column: str = "text",
                        depth: int = 4, width: int = 2048,
                        seed: int = 29):
    """Count-min frequency estimates for ``probe_tokens`` over the
    ``[a-z0-9]+`` token stream of ``text_column``.

    Shape: one stateless map_batches emits the SPARSE nonzero cells of
    a per-batch dense d×w grid (token counts come from the shared
    dictionary-encode, hashes run over the batch vocabulary only);
    the bounded (row, cell) partials merge by addition on the driver
    (<= d*w rows per batch); probe estimates are a tiny local min over
    d cells. Returns a pandas DataFrame (token, est) sorted by token.

    Estimates overcount on collisions, never undercount — the CMS
    guarantee; with the default 4x2048 grid the expected bias at probe
    time is corpus_tokens/width per row, min'd over 4 rows.
    """
    import pyarrow as pa
    from nacc_form_validator_ray.stages.dedup import (P31,
                                                      _fold_hash_strings)
    from nacc_form_validator_ray.stages.text_signals import \
        arrow_token_codes

    d, w = int(depth), int(width)
    a, b = cms_params(d, seed)

    def partial(batch: pa.Table) -> dict:
        col = batch[text_column]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        codes, dictionary, _, _ = arrow_token_codes(
            arr, include_digits=True)
        if dictionary is None:
            return {"row": np.empty(0, dtype=np.int64),
                    "cell": np.empty(0, dtype=np.int64),
                    "cnt": np.empty(0, dtype=np.int64)}
        cnt_per_tok = np.bincount(codes,
                                  minlength=len(dictionary)) \
            .astype(np.int64)
        h = _fold_hash_strings(dictionary)
        grid = np.zeros((d, w), dtype=np.int64)
        for r in range(d):
            cells = (a[r] * h + b[r]) % P31 % w
            np.add.at(grid[r], cells, cnt_per_tok)
        rows, cells = np.nonzero(grid)
        return {"row": rows.astype(np.int64),
                "cell": cells.astype(np.int64),
                "cnt": grid[rows, cells]}

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # bounded merge: <= d*w distinct (row, cell) keys total
    import pandas as pd
    grid_df = partials.to_pandas().groupby(
        ["row", "cell"], as_index=False)["cnt"].sum()
    grid = np.zeros((d, w), dtype=np.int64)
    grid[grid_df["row"].to_numpy(), grid_df["cell"].to_numpy()] = \
        grid_df["cnt"].to_numpy()
    probes = sorted(set(probe_tokens))
    ph = _fold_hash_strings(np.array(probes, dtype=object))
    ests = np.min(
        np.stack([grid[r, (a[r] * ph + b[r]) % P31 % w]
                  for r in range(d)]), axis=0)
    return pd.DataFrame({"token": probes,
                         "est": ests.astype(np.int64)})
