"""Hash-partitioned grouped execution.

``groupby(key).map_groups(fn)`` pays a Python-function call and pandas
slice per GROUP — ruinous when keys are fine-grained (LSH buckets,
(user, window) pairs, content hashes). The scalable pattern used across
this engine instead shuffles once on ``hash(key) % P`` and runs ONE
vectorized callable per partition, which performs the per-key logic with
pandas/numpy group-bys internally. All rows of a key land in the same
partition, so results are exact; P bounds Python overhead and maps
directly onto multi-node hash exchanges.

Skew note: a pathologically hot key cannot be split below one partition —
salt upstream (pre-aggregate per batch) before this exchange when a key
can exceed a worker's memory.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np
import pandas as pd

PART_COL = "__part"


def _hash_cols(batch: pd.DataFrame, key_cols: Sequence[str]) -> np.ndarray:
    h = np.zeros(len(batch), dtype=np.uint64)
    for k in key_cols:
        col = batch[k].to_numpy()
        if col.dtype == object:
            hk = pd.util.hash_array(col.astype("U"))
        else:
            hk = pd.util.hash_array(col)
        h = h * np.uint64(1_000_003) + hk.astype(np.uint64)
    return h


def grouped_apply(ds, key_cols: Sequence[str],
                  fn: Callable[[pd.DataFrame], pd.DataFrame],
                  num_partitions: int = 64):
    """One shuffle on hash(keys) % P, then ``fn`` once per partition.

    ``fn`` receives every row of each key it sees (exactness) and must do
    its own per-key grouping vectorized (pandas groupby / lexsort runs).
    """
    keys = list(key_cols)

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[PART_COL] = (_hash_cols(batch, keys)
                           % np.uint64(num_partitions)).astype(np.int64)
        return batch

    def run(group: pd.DataFrame) -> pd.DataFrame:
        return fn(group.drop(columns=[PART_COL]))

    return ds.map_batches(add_part, batch_format="pandas") \
        .groupby(PART_COL).map_groups(run, batch_format="pandas")


def grouped_agg_sum(ds, key_cols: Sequence[str],
                    sum_cols: Sequence[str],
                    num_partitions: int = 64):
    """Exact grouped sums via partition-level pandas aggregation."""

    def agg(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby(list(key_cols), as_index=False)[
            list(sum_cols)].sum()

    return grouped_apply(ds, key_cols, agg,
                         num_partitions=num_partitions)


def run_boundaries(sort_keys: List[np.ndarray]):
    """lexsort rows by the given key arrays; return (order, run_starts)
    where runs are maximal equal-key spans in sorted order."""
    order = np.lexsort(tuple(reversed(sort_keys)))
    n = len(order)
    if n == 0:
        return order, np.empty(0, dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in sort_keys:
        s = k[order]
        change[1:] |= s[1:] != s[:-1]
    starts = np.flatnonzero(change)
    return order, starts


def write_bucketed(ds, key_cols: Sequence[str], path: str,
                   num_buckets: int = 64) -> None:
    """Write parquet partitioned by ``bucket = hash(keys) % B``.

    This persists CO-LOCATION: every row of a key lives under one
    ``__bucket=<i>/`` directory, so later stages that need per-key logic
    on the same key read bucket-by-bucket and pay NO further exchange —
    the "pick one partitioning key and reuse it across stages" pattern.
    One bucket directory per hash slice also makes reruns resumable at
    bucket granularity."""
    keys = list(key_cols)

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__bucket"] = (_hash_cols(batch, keys)
                             % np.uint64(num_buckets)).astype(np.int64)
        return batch

    ds.map_batches(add_bucket, batch_format="pandas") \
        .write_parquet(path, partition_cols=["__bucket"])


def bucketed_grouped_apply(path: str,
                           fn: Callable[[pd.DataFrame], pd.DataFrame],
                           num_buckets: int = 64):
    """``grouped_apply`` over a ``write_bucketed`` directory WITHOUT a
    shuffle: each bucket is read as one partition (its rows are already
    co-located on disk) and ``fn`` runs once per bucket. Returns the
    union Dataset of all bucket results."""
    import os
    import ray.data as rd

    datasets = []
    for i in range(num_buckets):
        bdir = os.path.join(path, f"__bucket={i}")
        if not os.path.isdir(bdir):
            continue
        # a bucket spans several files (one per writer task): coalesce
        # to ONE block so fn sees the whole bucket — this concat is
        # bucket-local, not an all-to-all exchange
        bds = rd.read_parquet(bdir).repartition(1)
        datasets.append(bds.map_batches(
            lambda part: fn(part.drop(columns=["__bucket"],
                                      errors="ignore")),
            batch_format="pandas", batch_size=None))
    if not datasets:
        raise FileNotFoundError(f"no bucket directories under {path}")
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out
