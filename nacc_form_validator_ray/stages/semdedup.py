"""SemDeDup — semantic deduplication via k-means partitioning
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540).

The published recipe: cluster the corpus embeddings with k-means, then
compare vectors ONLY within their cluster and drop all but one member
of every near-duplicate group. Clustering turns the quadratic global
pair space into k independent quadratic-in-cluster-size problems —
exactly a hash-exchange shape (the cluster id is the partition key).

Scale shape (100 TB):

* the k-means model is trained by :func:`~.kmeans.kmeans_fit` (per-batch
  ``(k, d+1)`` partials, driver k-way merge — the model is tiny and the
  data is never exchanged during training);
* the final centroid matrix is broadcast ONCE with ``ray.put``; one
  ``map_batches`` pass assigns every vector its cluster id;
* one hash exchange on ``cid`` co-locates each cluster; the quantized
  vectors ride the exchange as ``list<int32>`` — half the wire bytes
  of int64, and the exchange IS the dominant cost of SemDeDup at
  100 TB (the within-cluster comparison needs the vectors themselves).
  Components are range-checked per batch (|x| < 2^31/2^12 = 524288 —
  generous for any embedding space) and widened back to int64 before
  the exact distance matmul;
* within a cluster, every member is compared against the
  ``max_anchors`` SMALLEST-id members only (one bounded
  ``n × anchors`` integer matmul per cluster) — the same degenerate-
  bucket cap the MinHash/SimHash stages use, mirrored in the SQL twin
  via ``row_number() <= max_anchors``.

Exactness contract (same grid as stages/kmeans.py): components are
``floor(x * 2^12 + 0.5)`` int64, pair distance is the quantized squared
L2 ``|a|^2 + |b|^2 - 2 a·b`` — with 64 dims and |component| < 2^13
every term stays below 2^32, exact in int64 and in DuckDB's DOUBLE
``list_dot_product``. A member is DROPPED when any smaller-id anchor in
its cluster sits within ``dist2_threshold``; ``dup_of`` is the SMALLEST
such anchor id (deterministic across partitionings), -1 for kept rows.

On L2 vs cosine: the paper applies cosine similarity to NORMALIZED
embeddings, where ``1 - cos = ||a - b||^2 / 2`` — thresholding squared
L2 on the quantized grid is the same decision rule, division-free and
bit-reproducible.
"""

from __future__ import annotations

import numpy as np

from nacc_form_validator_ray.stages.kmeans import _quantize, kmeans_fit


def semdedup(ds, vec_column: str = "embedding",
             id_column: str = "vec_id", k: int | None = None,
             iterations: int = 3,
             dist2_threshold: int = 20_000_000,
             max_anchors: int = 4096,
             num_partitions: int = 16):
    """Return a Dataset of ``(vec_id, cid, kept, dup_of)`` — one row per
    input vector; ``kept`` is False for members whose cluster holds a
    smaller-id vector within ``dist2_threshold`` (quantized squared L2),
    ``dup_of`` that smallest anchor id (-1 when kept).

    ``k=None`` derives the cluster count from the corpus size with the
    sqrt rule (``similarity.derive_ivf_params``) — one metadata-cheap
    ``count()``; the memory contract is that an expected cluster
    (~N/k = sqrt(N) vectors) fits one reducer's heap, and ``max_anchors``
    caps the per-cluster matmul width regardless."""
    import pyarrow as pa
    import ray

    from nacc_form_validator_ray.stages.partition import hash_exchange
    from nacc_form_validator_ray.stages.similarity import \
        _matrix_from_arrow

    if k is None:
        from nacc_form_validator_ray.stages.similarity import \
            derive_ivf_params
        k, _ = derive_ivf_params(ds.count())
    cents, _ = kmeans_fit(ds, vec_column, id_column, k, iterations)
    wref = ray.put(cents)

    def assign(batch: "pa.Table") -> "pa.Table":
        C = ray.get(wref)
        X = _quantize(_matrix_from_arrow(batch[vec_column]))
        # argmin_c (c·c - 2 x·c); ties -> lowest cid (np.argmin)
        dist = (C * C).sum(axis=1)[None, :] - 2 * (X @ C.T)
        if len(X) and np.abs(X).max() >= np.int64(1) << 31:
            raise ValueError(
                "semdedup wire format is int32: quantized component "
                f"magnitude {np.abs(X).max()} >= 2^31 (raw |x| must "
                "stay below 2^19)")
        return pa.table({
            id_column: batch[id_column],
            "cid": pa.array(np.argmin(dist, axis=1).astype(np.int64)),
            "__v": pa.array(list(X.astype(np.int32))),
        })

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def dedupe(part: "pa.Table") -> dict:
        ids = part[id_column].to_numpy(zero_copy_only=False)
        cid = part["cid"].to_numpy(zero_copy_only=False)
        X = _matrix_from_arrow(part["__v"]).astype(np.int64)
        order = np.lexsort((ids, cid))
        ids, cid, X = ids[order], cid[order], X[order]
        dup_of = np.full(len(ids), -1, dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, cid[1:] != cid[:-1]])
        ends = np.r_[starts[1:], len(cid)]
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            V = X[s:e]                       # ascending vec_id
            na = (V * V).sum(axis=1)
            A = V[:min(n, max_anchors)]
            # d2[i, j] = |v_i - a_j|^2, exact int64
            d2 = na[:, None] + na[None, :len(A)] - 2 * (V @ A.T)
            hit = d2 <= dist2_threshold
            # anchors must be strictly smaller-id than the member:
            # anchor j is row j of the sorted cluster
            hit &= np.arange(len(A))[None, :] < \
                np.minimum(np.arange(n), max_anchors)[:, None]
            any_hit = hit.any(axis=1)
            first = np.argmax(hit, axis=1)
            dup_of[s:e][any_hit] = ids[s:e][first[any_hit]]
        return {id_column: ids, "cid": cid,
                "kept": dup_of < 0, "dup_of": dup_of}

    return hash_exchange(assigned, ["cid"], dedupe,
                         num_partitions=num_partitions,
                         fn_format="pyarrow")


def knn_join(ds, vec_column: str = "embedding",
             id_column: str = "vec_id", k: int = 8,
             iterations: int = 3, top_k: int = 3,
             max_anchors: int = 4096,
             num_partitions: int = 16,
             n_probe: int = 1):
    """Cluster-partitioned kNN similarity self-join: for EVERY vector,
    its ``top_k`` nearest neighbors (quantized squared L2, ties on the
    smaller neighbor id) found IVF-style — each vector is INDEXED in
    its single nearest k-means cell, and as a QUERY probes its
    ``n_probe`` nearest cells. Same fabric as :func:`semdedup`:
    exact-integer Lloyd fit, broadcast centroids, one assignment pass
    (each vector ships once per probed cell, int32 components), ONE
    hash exchange on the cell id, one bounded ``queries × anchors``
    integer matmul per cell. Candidate sets from different probed
    cells are DISJOINT (a neighbor is indexed in exactly one cell), so
    the ``n_probe > 1`` merge is a plain per-query top-k with no dedup
    — one more lean exchange on the query id. Anchors are each cell's
    ``max_anchors`` smallest-id members (the twin mirrors the cap with
    ``row_number() <= max_anchors``).

    Returns ``(vec_id, rank, neighbor_id, dist2)`` with rank 1-based;
    vectors whose probed cells hold no other member emit no rows.
    """
    import pyarrow as pa
    import ray

    from nacc_form_validator_ray.stages.partition import hash_exchange
    from nacc_form_validator_ray.stages.similarity import \
        _matrix_from_arrow

    if n_probe < 1 or n_probe > k:
        raise ValueError("need 1 <= n_probe <= k")
    cents, _ = kmeans_fit(ds, vec_column, id_column, k, iterations)
    wref = ray.put(cents)

    def assign(batch: "pa.Table") -> "pa.Table":
        C = ray.get(wref)
        X = _quantize(_matrix_from_arrow(batch[vec_column]))
        dist = (C * C).sum(axis=1)[None, :] - 2 * (X @ C.T)
        if len(X) and np.abs(X).max() >= np.int64(1) << 31:
            raise ValueError("knn_join wire format is int32: "
                             "|quantized component| must stay < 2^31")
        # stable argsort: ties between cells break to the lower cid,
        # matching the twin's ORDER BY dist, cid
        probes = np.argsort(dist, axis=1, kind="stable")[:, :n_probe]
        n = len(X)
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        Xw = X.astype(np.int32)
        return pa.table({
            id_column: pa.array(np.repeat(ids, n_probe)),
            "cid": pa.array(probes.reshape(-1).astype(np.int64)),
            # member in the NEAREST cell only (probe rank 0)
            "__m": pa.array(np.tile(np.arange(n_probe) == 0, n)),
            "__v": pa.array(list(np.repeat(Xw, n_probe, axis=0))),
        })

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def topk(part: "pa.Table") -> dict:
        ids = part[id_column].to_numpy(zero_copy_only=False)
        cid = part["cid"].to_numpy(zero_copy_only=False)
        member = part["__m"].to_numpy(zero_copy_only=False)
        X = _matrix_from_arrow(part["__v"]).astype(np.int64)
        order = np.lexsort((ids, cid))
        ids, cid, member, X = ids[order], cid[order], \
            member[order], X[order]
        out_id, out_rank, out_nbr, out_d2 = [], [], [], []
        starts = np.flatnonzero(np.r_[True, cid[1:] != cid[:-1]])
        ends = np.r_[starts[1:], len(cid)]
        for s, e in zip(starts, ends):
            mem = member[s:e]
            if not mem.any():
                continue
            Q, qid = X[s:e], ids[s:e]            # every row queries
            A = X[s:e][mem]                      # id-ascending members
            aid = ids[s:e][mem]
            m = min(len(A), max_anchors)
            A, aid = A[:m], aid[:m]
            nq = (Q * Q).sum(axis=1)
            na = (A * A).sum(axis=1)
            d2 = nq[:, None] + na[None, :] - 2 * (Q @ A.T)
            # exclude self (by id — a query row need not be a member
            # row here) with a sentinel that sorts LAST
            d2 = np.where(qid[:, None] == aid[None, :],
                          np.int64(1) << 62, d2)
            kk_max = min(top_k, m)
            sel = np.argsort(d2, axis=1, kind="stable")[:, :kk_max]
            d2s = np.take_along_axis(d2, sel, axis=1)
            valid = d2s < (np.int64(1) << 61)
            per_row = valid.sum(axis=1)
            out_id.append(np.repeat(qid, per_row))
            out_rank.append(np.tile(np.arange(1, kk_max + 1,
                                              dtype=np.int64),
                                    (len(Q), 1))[valid])
            out_nbr.append(aid[sel][valid])
            out_d2.append(d2s[valid])
        if not out_id:
            return {id_column: np.empty(0, np.int64),
                    "rank": np.empty(0, np.int64),
                    "neighbor_id": np.empty(0, np.int64),
                    "dist2": np.empty(0, np.int64)}
        return {id_column: np.concatenate(out_id),
                "rank": np.concatenate(out_rank),
                "neighbor_id": np.concatenate(out_nbr),
                "dist2": np.concatenate(out_d2)}

    cells = hash_exchange(assigned, ["cid"], topk,
                          num_partitions=num_partitions,
                          fn_format="pyarrow")
    if n_probe == 1:
        return cells

    def merge(part: "pa.Table") -> dict:
        ids = part[id_column].to_numpy(zero_copy_only=False)
        nbr = part["neighbor_id"].to_numpy(zero_copy_only=False)
        d2 = part["dist2"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nbr, d2, ids))
        ids, nbr, d2 = ids[order], nbr[order], d2[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        pos = np.arange(len(ids)) - np.repeat(
            starts, np.diff(np.r_[starts, len(ids)]))
        keep = pos < top_k
        return {id_column: ids[keep],
                "rank": (pos[keep] + 1).astype(np.int64),
                "neighbor_id": nbr[keep], "dist2": d2[keep]}

    return hash_exchange(cells, [id_column], merge,
                         num_partitions=num_partitions,
                         fn_format="pyarrow")
