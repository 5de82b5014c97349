"""Distributed k-means (Lloyd) with a bit-exact arithmetic contract.

The third iterative-training operator on the engine's fabric (after
hard-sigmoid LR training and the Pregel PageRank/HITS family), in the
same scale shape: the model (k×d centroid matrix — tiny) is broadcast
per round, every batch computes its assignment and a (k, d+1) PARTIAL
(component sums + counts), and the driver k-way merges the partials —
no grouped exchange is needed because the reduced state is
model-sized, not data-sized.

Exactness contract (what makes the DuckDB twin bit-identical):

* components quantized to ``floor(x * 2^12 + 0.5)`` int64 — the same
  grid the IVF twin uses; float32 parquet values promote to float64
  identically on both engines, so the quantized integers agree.
* assignment is ``argmin_c (c·c - 2 x·c)`` in int64 (the ``x·x`` term
  is constant per row); magnitudes stay < 2^40, so DuckDB's DOUBLE
  ``list_dot_product`` is exact too. Ties break to the LOWEST centroid
  id on both sides (np.argmin / ``ORDER BY dist, cid``).
* the update is per-component ``floor(sum / count)``: with |sum| <
  2^53 and 1/count ≫ one double ulp, ``floor`` of the correctly
  rounded double quotient equals exact integer floor division, so
  numpy's ``//`` and SQL's ``floor(sum::DOUBLE / n)`` agree.
* initial centroids are the quantized vectors of the k SMALLEST ids
  (deterministic; SQL: ``ORDER BY vec_id LIMIT k``); an empty cluster
  keeps its previous centroid.
"""

from __future__ import annotations

import numpy as np

#: component quantization scale (2^12, shared with the IVF twin)
QUANT_BITS = 12


def _quantize(mat: np.ndarray) -> np.ndarray:
    return np.floor(mat.astype(np.float64) * float(1 << QUANT_BITS)
                    + 0.5).astype(np.int64)


def _init_centroids(ds, vec_column: str, id_column: str, k: int):
    """Quantized vectors of the k smallest ids: each batch contributes
    its local k smallest (lean), the driver keeps the global k."""
    from nacc_form_validator_ray.stages.similarity import \
        _matrix_from_arrow

    def local(batch):
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        keep = np.argsort(ids, kind="stable")[:k]
        X = _matrix_from_arrow(batch[vec_column])
        return {id_column: ids[keep], "__v": list(X[keep])}

    cand = ds.map_batches(local, batch_format="pyarrow")
    ids, vecs = [], []
    for b in cand.iter_batches(batch_format="pyarrow",
                               batch_size=None):
        ids.append(b[id_column].to_numpy(zero_copy_only=False))
        from nacc_form_validator_ray.stages.similarity import \
            _matrix_from_arrow as mfa
        vecs.append(mfa(b["__v"]))
    ids = np.concatenate(ids)
    X = np.concatenate(vecs, axis=0)
    order = np.argsort(ids, kind="stable")[:k]
    return _quantize(X[order])


def kmeans_fit(ds, vec_column: str = "embedding",
               id_column: str = "vec_id", k: int = 8,
               iterations: int = 3):
    """Run ``iterations`` Lloyd rounds; return ``(cents, counts)`` —
    the quantized int64 ``(k, d)`` centroid matrix AFTER the last
    update and each cluster's size in the last ASSIGNMENT (0 for a
    cluster that emptied and kept its previous centroid). The matrix is
    model-sized (tiny) — downstream stages broadcast it with
    ``ray.put`` (semdedup's assignment pass does exactly that)."""
    import pyarrow as pa
    import ray
    from nacc_form_validator_ray.stages.similarity import \
        _matrix_from_arrow

    cents = _init_centroids(ds, vec_column, id_column, k)
    if cents.shape[0] == 0:
        raise ValueError("kmeans_fit: dataset holds no vectors")
    # fewer vectors than k: clamp so counts/live stay aligned with the
    # centroid matrix instead of raising IndexError downstream
    k = cents.shape[0]
    d = cents.shape[1]

    def partials_for(weights: np.ndarray):
        wref = ray.put(weights)

        def run(batch: "pa.Table") -> "pa.Table":
            C = ray.get(wref)
            if batch.num_rows == 0:
                return pa.table({
                    "cid": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(np.zeros(k, dtype=np.int64)),
                    "s": pa.array(list(np.zeros((k, d),
                                                dtype=np.int64))),
                })
            X = _quantize(_matrix_from_arrow(batch[vec_column]))
            # argmin_c (c·c - 2 x·c); ties -> lowest cid (np.argmin)
            dist = (C * C).sum(axis=1)[None, :] - 2 * (X @ C.T)
            a = np.argmin(dist, axis=1)
            sums = np.zeros((k, d), dtype=np.int64)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "cid": pa.array(np.arange(k, dtype=np.int64)),
                "n": pa.array(counts),
                "s": pa.array(list(sums)),
            })

        return ds.map_batches(run, batch_format="pyarrow")

    counts = np.zeros(k, dtype=np.int64)
    for _ in range(iterations):
        sums = np.zeros((k, d), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for b in partials_for(cents).iter_batches(
                batch_format="pyarrow", batch_size=None):
            cid = b["cid"].to_numpy(zero_copy_only=False)
            counts[cid] += b["n"].to_numpy(zero_copy_only=False)
            sums[cid] += _matrix_from_arrow(b["s"]).astype(np.int64)
        live = counts > 0
        cents = cents.copy()
        cents[live] = sums[live] // counts[live, None]

    return cents, counts


def kmeans_train(ds, vec_column: str = "embedding",
                 id_column: str = "vec_id", k: int = 8,
                 iterations: int = 3):
    """``kmeans_fit`` reshaped as a Dataset of ``(cid, dim, cval,
    n_members)`` rows — the exchangeable model artifact."""
    import pyarrow as pa
    import ray.data as rd

    cents, counts = kmeans_fit(ds, vec_column, id_column, k, iterations)
    k, d = cents.shape
    cid = np.repeat(np.arange(k, dtype=np.int64), d)
    return rd.from_arrow(pa.table({
        "cid": pa.array(cid),
        "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
        "cval": pa.array(cents.reshape(-1)),
        "n_members": pa.array(np.repeat(counts, d)),
    }))
