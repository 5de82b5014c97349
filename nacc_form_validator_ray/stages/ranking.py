"""Global total-order operators: distributed rank / row_number / ntile.

Reference scope: the reference engine orders its error reports and
validation outputs deterministically (nacc_form_validator's sorted error
aggregation); at web scale the analogous primitive is assigning every
row its GLOBAL position under a total order — curriculum ordering by a
quality score, percentile tiers, sorted exports — without ever pulling
the data to one place.

The shape is one RANGE exchange (stages/partition.ranged_exchange):

1. sample the routing column per block (tiny, bounded driver transfer)
   and pick P-1 order-statistic boundaries — boundaries only steer load
   balance, never results;
2. route rows by ``searchsorted(boundaries, value)`` — every row with
   the same routing value lands in one partition, so ties never straddle
   a boundary and inter-partition order is strict;
3. each partition sorts locally (pyarrow C kernels) and adds
   ``offset + arange`` where the offset is the exact number of rows in
   lower (or higher, when descending) partitions — computed from the
   exchange's own per-partition row counts, so the global rank needs NO
   second pass and NO driver-side data.

Skew note: all rows sharing one routing value are co-located (the same
requirement SQL window semantics impose); a single value holding a
worker's memory worth of rows needs a pre-aggregated or bucketed plan
instead.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from nacc_form_validator_ray.stages.partition import ranged_exchange

#: per-block cap on sampled routing values (bounds the driver transfer)
SAMPLE_PER_BLOCK = 512


def sample_boundaries(ds, col: str, num_partitions: int,
                      sample_per_block: int = SAMPLE_PER_BLOCK) \
        -> np.ndarray:
    """P-1 ascending range boundaries from a strided per-block sample.

    The sample rides a lean one-column projection; the driver sees at
    most ``sample_per_block`` values per block. Duplicate order
    statistics are dropped (they would only create empty partitions).
    """
    def sample(batch):
        v = batch[col].to_numpy(zero_copy_only=False)
        step = max(1, len(v) // sample_per_block)
        return {col: v[::step]}

    samp_ds = ds.select_columns([col]).map_batches(
        sample, batch_format="pyarrow")
    vals = np.sort(np.concatenate(
        [b[col].to_numpy(zero_copy_only=False)
         for b in samp_ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None)] or
        [np.empty(0)]))
    if not len(vals):
        return vals[:0]
    idx = (np.arange(1, num_partitions) * len(vals)) // num_partitions
    return np.unique(vals[idx])


def global_rank(ds, key_col: str, tie_cols: Sequence[str] = (),
                descending: bool = False, num_partitions: int = 64,
                rank_col: str = "rank", ntile: Optional[int] = None,
                ntile_col: str = "tile"):
    """Append each row's 1-based global rank under
    ``ORDER BY key_col [DESC], tie_cols...`` (ROW_NUMBER semantics:
    ties are broken by ``tie_cols``, which should make the order
    strict for a deterministic result).

    ``ntile=k`` additionally appends the exact SQL ``NTILE(k)`` bucket
    (first ``n % k`` buckets get ``ceil(n/k)`` rows), derived
    arithmetically from the rank and the exchange's exact row total.

    ``descending`` orders the RANK only; routing stays ascending and the
    per-partition offset counts rows in HIGHER partitions instead.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    boundaries = sample_boundaries(ds, key_col, num_partitions)
    direction = "descending" if descending else "ascending"
    sort_keys = [(key_col, direction)] + \
        [(t, "ascending") for t in tie_cols]

    def extra(p: int, totals: np.ndarray) -> dict:
        offset = int(totals[p + 1:].sum()) if descending \
            else int(totals[:p].sum())
        return {"offset": offset, "total": int(totals.sum())}

    def rank_part(part: "pa.Table", offset: int, total: int) \
            -> "pa.Table":
        idx = pc.sort_indices(part, sort_keys=sort_keys)
        out = part.take(idx)
        r = offset + 1 + np.arange(out.num_rows, dtype=np.int64)
        out = out.append_column(rank_col, pa.array(r, pa.int64()))
        if ntile:
            out = out.append_column(
                ntile_col, pa.array(_ntile_of_rank(r, total, ntile),
                                    pa.int64()))
        return out

    return ranged_exchange(ds, key_col, boundaries, rank_part,
                           fn_format="pyarrow", extra_fn=extra)


def running_total(ds, order_col: str, value_col: str,
                  tie_cols: Sequence[str] = (),
                  num_partitions: int = 64,
                  out_col: str = "running"):
    """Exact global running total —
    ``SUM(value) OVER (ORDER BY order_col, tie_cols)`` — in ONE range
    exchange: the split tasks return per-partition int64 sums alongside
    the row counts, so each reducer adds the exact aggregate of all
    lower partitions to its local cumsum. ``value_col`` must be int64
    (fixed-point for monetary/float quantities): integer addition is
    associative, so the partition-wise offset is bit-identical to a
    sequential scan — the property a float column would not have.

    ``order_col, tie_cols`` should form a strict order (SQL's default
    RANGE frame then coincides with ROWS)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    boundaries = sample_boundaries(ds, order_col, num_partitions)
    sort_keys = [(order_col, "ascending")] + \
        [(t, "ascending") for t in tie_cols]

    def extra(p: int, totals: np.ndarray) -> dict:
        return {"offset": int(totals[:p, 1].sum())}

    def cum_part(part: "pa.Table", offset: int) -> "pa.Table":
        out = part.take(pc.sort_indices(part, sort_keys=sort_keys))
        v = out[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        run = offset + np.cumsum(v)
        return out.append_column(out_col, pa.array(run, pa.int64()))

    return ranged_exchange(ds, order_col, boundaries, cum_part,
                           fn_format="pyarrow", extra_fn=extra,
                           agg_cols=[value_col])


def write_sorted(ds, key_col: str, path: str,
                 tie_cols: Sequence[str] = (),
                 num_partitions: int = 64):
    """Globally sorted, resumable parquet export.

    One range exchange; each reducer sorts its value range locally and
    writes ``part-<i>.parquet`` (zero-padded so lexicographic file
    order IS the global sort order — a reader concatenating the files
    in name order streams the corpus fully sorted). Returns the
    manifest as a pandas DataFrame: one row per written partition with
    ``file, rows, key_min, key_max, offset`` (offset = rows in lower
    partitions, i.e. the global rank of the file's first row). A
    failed run reruns only partitions whose file is missing — the
    boundaries are data-dependent but the CONTENT of the sorted stream
    is not, so re-exports are value-identical.

    Resume contract: a rerun must see the SAME input (same files, same
    read parallelism) so the deterministic boundary sample reproduces
    the same partition layout; point a changed input at a fresh
    directory instead.
    """
    import os
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    boundaries = sample_boundaries(ds, key_col, num_partitions)
    sort_keys = [(key_col, "ascending")] + \
        [(t, "ascending") for t in tie_cols]
    pad = len(str(len(boundaries)))

    def extra(p: int, totals: np.ndarray) -> dict:
        return {"part_index": p, "offset": int(totals[:p].sum())}

    def write_part(part: "pa.Table", part_index: int, offset: int) \
            -> "pa.Table":
        out = part.take(pc.sort_indices(part, sort_keys=sort_keys))
        fname = f"part-{part_index:0{pad}d}.parquet"
        fpath = os.path.join(path, fname)
        if not os.path.exists(fpath):  # resume: skip finished parts
            pq.write_table(out, fpath + ".tmp")
            os.replace(fpath + ".tmp", fpath)
        keys = out[key_col]
        return pa.table({
            "file": pa.array([fname]),
            "rows": pa.array([out.num_rows], pa.int64()),
            "key_min": keys.slice(0, 1),
            "key_max": keys.slice(out.num_rows - 1, 1),
            "offset": pa.array([offset], pa.int64()),
        })

    manifest = ranged_exchange(ds, key_col, boundaries, write_part,
                               fn_format="pyarrow", extra_fn=extra) \
        .to_pandas()
    return manifest.sort_values("file").reset_index(drop=True)


def _ntile_of_rank(rank: np.ndarray, n: int, k: int) -> np.ndarray:
    """Exact SQL NTILE(k) bucket from 1-based ranks over n rows: the
    first ``n % k`` buckets hold ``n//k + 1`` rows, the rest ``n//k``."""
    size, rem = divmod(n, k)
    boundary = rem * (size + 1)
    low = (rank - 1) // (size + 1) + 1
    if size == 0:
        return low.astype(np.int64)
    high = rem + (rank - 1 - boundary) // size + 1
    return np.where(rank <= boundary, low, high).astype(np.int64)
