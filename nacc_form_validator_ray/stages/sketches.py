"""Mergeable sketches for corpus-scale statistics.

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
