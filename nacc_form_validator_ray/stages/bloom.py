"""Bloom-filter accelerated key filtering.

At 100-TB scale the distributed ``anti_join`` exchange ships EVERY left
row to its key partition even though only a small fraction ever matches
a banned key. A Bloom filter built from the key side and broadcast once
(``ray.put``) lets each worker keep definite misses locally — only the
bloom HITS (true matches + the false-positive fraction) ride the exact
anti-join exchange, so the shuffled volume drops from |left| to roughly
|matches| + fp_rate·|left|, with zero correctness loss (the exact join
adjudicates every hit).

Arrow-native end-to-end: keys are hashed to uint64 straight off the
Arrow buffers (``partition._hash_table`` — string columns never box
into pandas objects; round-3 VERDICT item), and the k bloom probes are
derived from that hash with wrapping multiply-shift mixes, so building
and probing agree bit-for-bit within a run.
"""

from __future__ import annotations

import numpy as np

#: odd multipliers for the k multiply-shift probes
_MIXERS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                    0x165667B19E3779F9, 0xD6E8FEB86659FD93],
                   dtype=np.uint64)


def _key_hash(batch, on: str) -> np.ndarray:
    """Content-based uint64 hash of the key column of an Arrow table,
    zero-copy for strings (no UTF-32 ``astype("U")`` copies, no object
    boxing). Build and probe share this function, which is the only
    consistency the filter needs."""
    from nacc_form_validator_ray.stages.partition import _hash_table
    return _hash_table(batch, [on])


def _probe_positions(h: np.ndarray, n_bits: int) -> np.ndarray:
    """(k, len(h)) bit positions for each key hash."""
    out = np.empty((len(_MIXERS), len(h)), dtype=np.int64)
    for i, m in enumerate(_MIXERS):
        out[i] = ((h * m) >> np.uint64(17)).astype(np.int64) % n_bits
    return out


def build_bloom(keys_ds, on: str, n_bits: int = 1 << 23):
    """Build a packed Bloom bitmap from a Dataset's key column.

    Per-batch work emits the DISTINCT bit positions (lean int64 rows);
    one ``unique`` exchange bounds the driver transfer at the bitmap
    size regardless of key count. Returns (bitmap uint8 array of
    ``n_bits/8`` bytes, n_bits).
    """
    def positions(batch):
        h = _key_hash(batch, on)
        pos = np.unique(_probe_positions(h, n_bits))
        return {"pos": pos.astype(np.int64)}

    pos = keys_ds.map_batches(positions, batch_format="pyarrow") \
        .unique("pos")
    bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
    pos = np.fromiter(pos, dtype=np.int64)  # unique() may yield a set
    # unbuffered OR: several positions land in the SAME byte — a fancy
    # `bitmap[idx] |= bits` keeps only one duplicate per byte
    np.bitwise_or.at(bitmap, pos >> 3,
                     np.uint8(1) << (pos & 7).astype(np.uint8))
    return bitmap, n_bits


def _bloom_hits(h: np.ndarray, bitmap: np.ndarray,
                n_bits: int) -> np.ndarray:
    """Boolean mask: True where the key MAY be in the filter."""
    hits = np.ones(len(h), dtype=bool)
    for i in range(len(_MIXERS)):
        pos = ((h * _MIXERS[i]) >> np.uint64(17)).astype(np.int64) % n_bits
        hits &= (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 > 0
    return hits


def _filter_by_bloom(ds, ref, nb: int, on: str, keep_hits: bool):
    """Probe stage shared by every bloom join, run on the TASK pool (a
    pickled instance, not an actor class — an actor pool here caps and
    serializes the upstream scan; measured 2x on q7). ray.get of the
    broadcast bitmap inside a task is a zero-copy local read after the
    first fetch on each node."""
    import pyarrow as pa
    import ray

    class Probe:
        def __init__(self, ref, nb, keep_hits):
            self.ref = ref
            self.nb = nb
            self.keep_hits = keep_hits
            self.bitmap = None

        def __call__(self, batch: "pa.Table") -> "pa.Table":
            if self.bitmap is None:
                self.bitmap = ray.get(self.ref)
            hits = _bloom_hits(_key_hash(batch, on), self.bitmap,
                               self.nb)
            mask = hits if self.keep_hits else ~hits
            return batch.filter(pa.array(mask))

    return ds.map_batches(Probe(ref, nb, keep_hits),
                          batch_format="pyarrow")


def anti_join_bloom(left_ds, keys_ds, on: str,
                    n_bits: int = 1 << 23,
                    num_partitions: int = 64):
    """``anti_join`` with a broadcast Bloom prefilter.

    Definite bloom misses are kept WITHOUT riding the exchange; only
    hits go through the exact distributed anti-join. Results are
    identical to ``anti_join`` (the bloom has no false negatives and
    every false positive is adjudicated exactly).

    ``left_ds`` is consumed twice (miss pass + hit pass): hand it a
    re-readable source (parquet) or a materialized dataset so laziness
    does not recompute an expensive upstream twice.
    """
    import ray
    from nacc_form_validator_ray.stages.joins import anti_join

    keys_ds = keys_ds.materialize()
    bitmap, nb = build_bloom(keys_ds, on, n_bits=n_bits)
    ref = ray.put(bitmap)

    misses = _filter_by_bloom(left_ds, ref, nb, on, keep_hits=False)
    hits = _filter_by_bloom(left_ds, ref, nb, on, keep_hits=True)
    verified = anti_join(hits, keys_ds, on=on,
                         num_partitions=num_partitions)
    return misses.union(verified)


def bloom_prefilter(left_ds, keys_ds, on: str, n_bits: int = 1 << 23):
    """Keep only the rows whose key MAY appear in ``keys_ds`` (no false
    negatives — every true match survives; false positives pass through
    and must be adjudicated by the exact join/semi downstream).

    This is the shuffle-volume lever for joins whose probe side is
    mostly non-matching (e.g. a fact table joined to a small selected
    slice of a scaling dimension): definite misses are dropped LOCALLY,
    so the downstream exchange ships |matches| + fp_rate·|left| instead
    of |left|. The bitmap is built once and broadcast via ``ray.put``
    (fixed n_bits/8 bytes per worker regardless of corpus size).
    ``keys_ds`` should already be materialized (or trivially
    re-readable) — it is consumed once here and again by the exact
    join downstream."""
    import ray

    bitmap, nb = build_bloom(keys_ds, on, n_bits=n_bits)
    ref = ray.put(bitmap)
    return _filter_by_bloom(left_ds, ref, nb, on, keep_hits=True)


def semi_join_bloom(left_ds, keys_ds, on: str,
                    n_bits: int = 1 << 23,
                    num_partitions: int = 64):
    """``semi_join`` with the broadcast Bloom prefilter: definite misses
    are dropped locally (a semi join discards them anyway — unlike
    ``anti_join_bloom`` there is no miss pass to union back), and only
    bloom hits ride the exact exchange, which adjudicates every false
    positive. Results are identical to ``joins.semi_join``.

    ``keys_ds`` is consumed twice (bloom build + exact verify), so it
    is materialized here once; hand it a lean key projection."""
    from nacc_form_validator_ray.stages.joins import semi_join

    keys_ds = keys_ds.materialize()
    hits = bloom_prefilter(left_ds, keys_ds, on, n_bits=n_bits)
    return semi_join(hits, keys_ds, on=on,
                     num_partitions=num_partitions)
