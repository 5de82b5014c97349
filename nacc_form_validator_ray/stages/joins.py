"""Distributed joins beyond broadcast lookups.

``asof_join`` — the classic time-series join (each left row picks the
nearest earlier/later right row within its key). Both sides are tagged,
unioned, and hash-exchanged ONCE on the key; inside each partition the
sides are split, sorted, and joined with ``pd.merge_asof`` (vectorized).
The partitioning assumption: all rows of one key fit in one partition —
salt/sub-range upstream if a single key's history exceeds worker memory.

``range_join_bucketed`` — inequality joins (left.lo <= right.v < left.hi)
via bucketing the value domain: each right row lands in one bucket, each
left interval is replicated to the buckets it overlaps, and candidate
pairs are verified inside the bucket partition.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

from nacc_form_validator_ray.stages.partition import grouped_apply

_SIDE = "__side"


def asof_join(left_ds, right_ds, by: str, on: str,
              direction: str = "backward",
              allow_exact_matches: bool = False,
              right_columns: Optional[List[str]] = None,
              suffix: str = "_right",
              num_partitions: int = 64):
    """As-of join: for every left row, the right row with the greatest
    ``on`` <= (backward) / smallest >= (forward) the left ``on``, within
    the same ``by`` key. Returns left columns + suffixed right columns.
    """

    left_cols = list(left_ds.schema().names)
    rcols = right_columns if right_columns is not None else \
        [c for c in right_ds.schema().names if c not in (by, on)]
    all_cols = left_cols + [c for c in [by, on] + rcols
                            if c not in left_cols]

    def tag(side):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            for c in all_cols:
                if c not in batch.columns:
                    batch[c] = None
            batch[_SIDE] = side
            return batch[all_cols + [_SIDE]]
        return fn

    lt = left_ds.map_batches(tag(0), batch_format="pandas")
    rt = right_ds.map_batches(tag(1), batch_format="pandas")

    def join_partition(part: pd.DataFrame) -> pd.DataFrame:
        left = part[part[_SIDE] == 0][left_cols].sort_values(on)
        right = part[part[_SIDE] == 1][[by, on] + rcols] \
            .sort_values(on)
        right[on] = right[on].astype(left[on].dtype)
        out = pd.merge_asof(left, right,
                            on=on, by=by, direction=direction,
                            suffixes=("", suffix),
                            allow_exact_matches=allow_exact_matches)
        return out

    return grouped_apply(lt.union(rt), [by], join_partition,
                         num_partitions=num_partitions)


def range_join_bucketed(left_ds, right_ds, lo: str, hi: str, value: str,
                        bucket_width: float,
                        num_partitions: int = 64):
    """Pairs (left, right) where ``left.lo <= right.value < left.hi``.

    Buckets the value domain with ``bucket_width``; left intervals are
    replicated to every bucket they overlap (document the width so
    replication stays bounded: width ≈ typical interval length).
    """

    left_cols = list(left_ds.schema().names)
    right_cols = list(right_ds.schema().names)
    all_cols = left_cols + [c for c in right_cols
                            if c not in left_cols]

    def _align(batch: pd.DataFrame, side: int) -> pd.DataFrame:
        for c in all_cols:
            if c not in batch.columns:
                batch[c] = None
        batch[_SIDE] = side
        return batch[all_cols + ["__bucket", _SIDE]]

    def left_buckets(batch: pd.DataFrame) -> pd.DataFrame:
        lo_b = np.floor(batch[lo].to_numpy(np.float64) / bucket_width) \
            .astype(np.int64)
        hi_b = np.floor(batch[hi].to_numpy(np.float64) / bucket_width) \
            .astype(np.int64)
        reps = np.maximum(hi_b - lo_b + 1, 0)
        idx = np.repeat(np.arange(len(batch)), reps)
        out = batch.iloc[idx].reset_index(drop=True)
        buckets = np.concatenate(
            [np.arange(a, b + 1) for a, b in zip(lo_b, hi_b)]) \
            if len(batch) else np.empty(0, dtype=np.int64)
        out["__bucket"] = buckets.astype(np.int64)
        return _align(out, 0)

    def right_buckets(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__bucket"] = np.floor(
            batch[value].to_numpy(np.float64) / bucket_width
        ).astype(np.int64)
        return _align(batch, 1)

    lt = left_ds.map_batches(left_buckets, batch_format="pandas")
    rt = right_ds.map_batches(right_buckets, batch_format="pandas")

    def join_partition(part: pd.DataFrame) -> pd.DataFrame:
        left = part[part[_SIDE] == 0][left_cols + ["__bucket"]]
        right = part[part[_SIDE] == 1][right_cols + ["__bucket"]]
        merged = left.merge(right, on="__bucket",
                            suffixes=("", "_right"))
        if not len(merged):
            return merged.drop(columns=["__bucket"], errors="ignore")
        keep = (merged[lo] <= merged[value]) & \
            (merged[value] < merged[hi])
        return merged[keep].drop(columns=["__bucket"]) \
            .drop_duplicates()

    return grouped_apply(lt.union(rt), ["__bucket"], join_partition,
                         num_partitions=num_partitions)


def hash_join(left_ds, right_ds, on, how: str = "inner",
              right_columns: Optional[List[str]] = None,
              suffix: str = "_right",
              num_partitions: int = 64):
    """General distributed hash equi-join for two LARGE tables.

    Both sides are tagged, unioned, and hash-exchanged ONCE on the join
    key(s); each partition then runs a vectorized ``pd.merge``. Use this
    for fact-to-fact joins where neither side fits a broadcast dict (the
    round-1 ship_delay/segment_revenue anti-pattern); keep broadcast
    lookups for true dimensions (nation/region). ``on`` must name
    column(s) present in both sides (rename upstream in a lean
    map_batches if they differ). ``how`` is "inner" or "left".

    Partitioning assumption: all rows of one key value fit in one
    partition — salt hot keys upstream when a single key's rows exceed
    worker memory.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type: {how}")
    keys = [on] if isinstance(on, str) else list(on)
    left_cols = list(left_ds.schema().names)
    rcols = right_columns if right_columns is not None else \
        [c for c in right_ds.schema().names if c not in keys]
    all_cols = left_cols + [c for c in keys + rcols
                            if c not in left_cols]

    def tag(side, keep):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch[keep].copy()
            for c in all_cols:
                if c not in batch.columns:
                    batch[c] = None
            batch[_SIDE] = side
            return batch[all_cols + [_SIDE]]
        return fn

    lt = left_ds.map_batches(tag(0, left_cols), batch_format="pandas")
    rt = right_ds.map_batches(tag(1, keys + rcols),
                              batch_format="pandas")

    def join_partition(part: pd.DataFrame) -> pd.DataFrame:
        left = part[part[_SIDE] == 0][left_cols]
        right = part[part[_SIDE] == 1][keys + rcols]
        # the None-filled tag columns degrade to object dtype through
        # the union; restore proper dtypes on the joined output
        return left.merge(right, on=keys, how=how,
                          suffixes=("", suffix)).infer_objects()

    return grouped_apply(lt.union(rt), keys, join_partition,
                         num_partitions=num_partitions)


def anti_join(left_ds, keys_ds, on: str, num_partitions: int = 64):
    """Distributed anti join: left rows whose ``on`` value does NOT
    appear in ``keys_ds``. One hash exchange on the key; no broadcast —
    works when the key set is too large to ship to every worker (the
    broadcast-Bloom variant in the guide is the small-side shortcut)."""
    left_cols = list(left_ds.schema().names)

    def tag_left(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[_SIDE] = 0
        return batch

    def tag_keys(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({on: batch[on]})
        for c in left_cols:
            if c not in out.columns:
                out[c] = None
        out[_SIDE] = 1
        return out[left_cols + [_SIDE]]

    lt = left_ds.map_batches(tag_left, batch_format="pandas")
    kt = keys_ds.map_batches(tag_keys, batch_format="pandas")

    def filter_partition(part: pd.DataFrame) -> pd.DataFrame:
        banned = set(part.loc[part[_SIDE] == 1, on])
        left = part[part[_SIDE] == 0]
        return left[~left[on].isin(banned)][left_cols]

    return grouped_apply(lt.union(kt), [on], filter_partition,
                         num_partitions=num_partitions)
