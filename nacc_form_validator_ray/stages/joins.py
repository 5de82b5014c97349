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

    lschema, rschema = left_ds.schema(), right_ds.schema()
    left_cols = list(lschema.names)
    rcols = right_columns if right_columns is not None else \
        [c for c in rschema.names if c not in (by, on)]
    all_cols = left_cols + [c for c in [by, on] + rcols
                            if c not in left_cols]
    types = _arrow_types(rschema)
    types.update(_arrow_types(lschema))

    # Arrow-native tag/union: typed null padding, no pandas boxing on
    # the exchange (the per-partition merge_asof below still runs
    # pandas — that is the per-GROUP callable, not a shuffle hop)
    lt = left_ds.map_batches(_tag_arrow(all_cols, types, left_cols, 0),
                             batch_format="pyarrow")
    rt = right_ds.map_batches(
        _tag_arrow(all_cols, types, [by, on] + rcols, 1),
        batch_format="pyarrow")

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

    import pyarrow as pa

    lschema, rschema = left_ds.schema(), right_ds.schema()
    left_cols = list(lschema.names)
    right_cols = list(rschema.names)
    all_cols = left_cols + [c for c in right_cols
                            if c not in left_cols]
    types = _arrow_types(rschema)
    types.update(_arrow_types(lschema))

    def _align(batch: "pa.Table", bucket: np.ndarray,
               present, side: int) -> "pa.Table":
        n = batch.num_rows
        present = set(present)
        arrays = []
        for c in all_cols:
            if c in present:
                col = batch[c]
                arrays.append(col.combine_chunks() if isinstance(
                    col, pa.ChunkedArray) else col)
            else:
                arrays.append(pa.nulls(n, type=types[c]))
        arrays.append(pa.array(bucket.astype(np.int64)))
        arrays.append(pa.array(np.full(n, side, dtype=np.int8)))
        return pa.Table.from_arrays(
            arrays, names=all_cols + ["__bucket", _SIDE])

    def left_buckets(batch: "pa.Table") -> "pa.Table":
        lo_b = np.floor(np.asarray(batch[lo], dtype=np.float64)
                        / bucket_width).astype(np.int64)
        hi_b = np.floor(np.asarray(batch[hi], dtype=np.float64)
                        / bucket_width).astype(np.int64)
        reps = np.maximum(hi_b - lo_b + 1, 0)
        idx = np.repeat(np.arange(batch.num_rows), reps)
        out = batch.take(idx)
        buckets = np.concatenate(
            [np.arange(a, b + 1) for a, b in zip(lo_b, hi_b)]) \
            if batch.num_rows else np.empty(0, dtype=np.int64)
        return _align(out, buckets, left_cols, 0)

    def right_buckets(batch: "pa.Table") -> "pa.Table":
        buckets = np.floor(np.asarray(batch[value], dtype=np.float64)
                           / bucket_width).astype(np.int64)
        return _align(batch, buckets, right_cols, 1)

    lt = left_ds.map_batches(left_buckets, batch_format="pyarrow")
    rt = right_ds.map_batches(right_buckets, batch_format="pyarrow")

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


def _arrow_types(schema) -> dict:
    """name -> pyarrow DataType from a Ray schema, normalizing numpy
    dtypes (pandas-block upstreams) to Arrow; numpy ``object`` columns
    are assumed to hold strings (the only object payload this engine
    ships)."""
    import pyarrow as pa
    out = {}
    for name, t in zip(schema.names, schema.types):
        if isinstance(t, pa.DataType):
            out[name] = t
        else:
            dt = np.dtype(t)
            out[name] = pa.string() if dt.kind == "O" \
                else pa.from_numpy_dtype(dt)
    return out


def _tag_arrow(all_cols, types, keep, side):
    """Arrow tag fn: project to the shared union schema with TYPED null
    columns for the absent side (a pandas None column degrades to object
    dtype and boxes every value; typed Arrow nulls cost a bitmap)."""
    import pyarrow as pa

    keep_set = set(keep)

    def fn(batch: "pa.Table") -> "pa.Table":
        n = batch.num_rows
        arrays = []
        for c in all_cols:
            if c in keep_set and c in batch.column_names:
                col = batch[c]
                arrays.append(col.combine_chunks()
                              if isinstance(col, pa.ChunkedArray)
                              else col)
            else:
                arrays.append(pa.nulls(n, type=types[c]))
        arrays.append(pa.array(np.full(n, side, dtype=np.int8)))
        return pa.Table.from_arrays(arrays, names=all_cols + [_SIDE])
    return fn


def hash_join(left_ds, right_ds, on, how: str = "inner",
              right_columns: Optional[List[str]] = None,
              suffix: str = "_right",
              num_partitions: int = 64):
    """General distributed hash equi-join for two LARGE tables.

    Both sides are tagged, unioned, and hash-exchanged ONCE on the join
    key(s) — Arrow-native end-to-end: the partition tag hashes Arrow
    buffers zero-copy and each partition runs ``pyarrow.Table.join``
    (Acero's C++ hash join), so string payloads never pay
    Arrow→pandas→Arrow object boxing on the exchange (round-2 VERDICT
    perf finding). Use this for fact-to-fact joins where neither side
    fits a broadcast dict; keep broadcast lookups for true dimensions
    (nation/region). ``on`` must name column(s) present in both sides
    (rename upstream in a lean map_batches if they differ). ``how`` is
    "inner", "left" or "full" (full outer: unmatched rows of EITHER
    side survive with the other side's columns null — each key lives
    in exactly one partition, so per-partition full outer composes to
    the global full outer).

    Partitioning assumption: all rows of one key value fit in one
    partition — salt hot keys upstream when a single key's rows exceed
    worker memory.
    """
    if how not in ("inner", "left", "full"):
        raise ValueError(f"unsupported join type: {how}")
    keys = [on] if isinstance(on, str) else list(on)
    lschema, rschema = left_ds.schema(), right_ds.schema()
    left_cols = list(lschema.names)
    rcols = right_columns if right_columns is not None else \
        [c for c in rschema.names if c not in keys]
    all_cols = left_cols + [c for c in keys + rcols
                            if c not in left_cols]
    types = _arrow_types(rschema)
    types.update(_arrow_types(lschema))

    lt = left_ds.map_batches(
        _tag_arrow(all_cols, types, left_cols, 0),
        batch_format="pyarrow")
    rt = right_ds.map_batches(
        _tag_arrow(all_cols, types, keys + rcols, 1),
        batch_format="pyarrow")

    def join_partition(part):
        import pyarrow.compute as pc
        side = part[_SIDE]
        left = part.filter(pc.equal(side, 0)).select(left_cols)
        right = part.filter(pc.equal(side, 1)).select(keys + rcols)
        join_type = {"inner": "inner", "left": "left outer",
                     "full": "full outer"}[how]
        return left.join(right, keys=keys, join_type=join_type,
                         right_suffix=suffix)

    return grouped_apply(lt.union(rt), keys, join_partition,
                         num_partitions=num_partitions,
                         fn_format="pyarrow")


def anti_join(left_ds, keys_ds, on: str, num_partitions: int = 64):
    """Distributed anti join: left rows whose ``on`` value does NOT
    appear in ``keys_ds``. One Arrow-native hash exchange on the key; no
    broadcast — works when the key set is too large to ship to every
    worker (the broadcast-Bloom variant in the guide is the small-side
    shortcut)."""
    lschema = left_ds.schema()
    left_cols = list(lschema.names)
    types = _arrow_types(lschema)

    lt = left_ds.map_batches(
        _tag_arrow(left_cols, types, left_cols, 0),
        batch_format="pyarrow")
    kt = keys_ds.map_batches(
        _tag_arrow(left_cols, types, [on], 1),
        batch_format="pyarrow")

    def filter_partition(part):
        import pyarrow.compute as pc
        side = part[_SIDE]
        banned = part.filter(pc.equal(side, 1))[on].combine_chunks()
        left = part.filter(pc.equal(side, 0))
        keep = pc.invert(pc.is_in(left[on], value_set=banned))
        return left.filter(keep).select(left_cols)

    return grouped_apply(lt.union(kt), [on], filter_partition,
                         num_partitions=num_partitions,
                         fn_format="pyarrow")


def semi_join(left_ds, keys_ds, on: str, num_partitions: int = 64):
    """Distributed semi join (SQL ``EXISTS``): left rows whose ``on``
    value DOES appear in ``keys_ds`` — each left row at most once,
    however many key matches exist. Same single Arrow-native hash
    exchange as ``anti_join`` (the two differ only in the final mask);
    duplicate keys cost nothing beyond exchange volume, so callers
    should still pre-dedup the key side per batch as a combiner."""
    lschema = left_ds.schema()
    left_cols = list(lschema.names)
    types = _arrow_types(lschema)

    lt = left_ds.map_batches(
        _tag_arrow(left_cols, types, left_cols, 0),
        batch_format="pyarrow")
    kt = keys_ds.map_batches(
        _tag_arrow(left_cols, types, [on], 1),
        batch_format="pyarrow")

    def filter_partition(part):
        import pyarrow.compute as pc
        side = part[_SIDE]
        wanted = part.filter(pc.equal(side, 1))[on].combine_chunks()
        left = part.filter(pc.equal(side, 0))
        keep = pc.is_in(left[on], value_set=wanted)
        return left.filter(keep).select(left_cols)

    return grouped_apply(lt.union(kt), [on], filter_partition,
                         num_partitions=num_partitions,
                         fn_format="pyarrow")
