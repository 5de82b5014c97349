"""Training-sequence packing: the manifest a pretraining dataloader
consumes.

``pack_sequences`` assigns every document's token stream a contiguous
range in a single global token axis (documents concatenated in
``doc_id`` order) and splits that axis into fixed-length sequences.
The output is the PACK MANIFEST — one row per (document, sequence)
span — not the token arrays themselves: at 100-TB scale the manifest is
what ships to the loader, which gathers token ids lazily per sequence.

Distributed prefix-sum shape (no driver-side scan of the corpus):

1. lean pass: (doc_id, n_tokens) per document via the shared packed-run
   tokenizer — the text column never leaves the first map;
2. bucket pass: one ``grouped_agg_sum`` over ``doc_id // bucket_size``
   produces per-bucket token totals — a table with #buckets rows (the
   only thing the driver ever holds; pick ``bucket_size`` so
   max(doc_id)/bucket_size stays ~1e6 at full scale. Dense sequential
   ids are assumed; for hashed 60-bit ids, rank them first);
3. the driver computes the exclusive cumsum of bucket totals (tiny) and
   broadcasts it; each bucket's documents are co-located by ONE hash
   exchange (``grouped_apply``), sorted by doc_id, and their global
   offsets are bucket_base + local exclusive cumsum;
4. span explosion is fully vectorized: a document starting at global
   offset ``o`` with ``n`` tokens covers sequences ``o//L ..
   (o+n-1)//L``; each span row carries (doc_start, seq_start, length).

Every quantity is exact integer arithmetic, so the DuckDB twin
(pipelines/queries.SQL_PACK_SEQUENCES) reproduces the manifest
bit-for-bit with a window cumsum + ``unnest(range(...))``.
"""

from __future__ import annotations

import numpy as np


def pack_sequences(ds, seq_len: int = 2048, id_column: str = "doc_id",
                   text_column: str = "text",
                   bucket_size: int = 1 << 14,
                   num_partitions: int = 32):
    """Build the (doc_id, seq_id, doc_start, seq_start, n_tokens_span)
    packing manifest. See module docstring for the distributed shape."""
    import pyarrow as pa
    import ray
    from nacc_form_validator_ray.stages.partition import (grouped_agg_sum,
                                                          grouped_apply)
    from nacc_form_validator_ray.stages.text_signals import \
        arrow_token_codes

    def count_tokens(batch: pa.Table) -> dict:
        col = batch[text_column]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        _, _, _, n_tokens = arrow_token_codes(arr)
        ids = batch[id_column].to_numpy().astype(np.int64, copy=False)
        return {id_column: ids,
                "n_tokens": n_tokens.astype(np.int64),
                "__bucket": ids // bucket_size}

    counts = ds.map_batches(count_tokens, batch_format="pyarrow")

    bucket_tot = grouped_agg_sum(counts, ["__bucket"], ["n_tokens"],
                                 num_partitions=num_partitions) \
        .to_pandas()
    if len(bucket_tot):
        b_ids = bucket_tot["__bucket"].to_numpy().astype(np.int64)
        b_sum = bucket_tot["n_tokens"].to_numpy().astype(np.int64)
        order = np.argsort(b_ids)
        b_ids, b_sum = b_ids[order], b_sum[order]
        base = np.zeros(len(b_ids), dtype=np.int64)
        base[1:] = np.cumsum(b_sum)[:-1]
    else:
        b_ids = base = np.empty(0, dtype=np.int64)
    base_ref = ray.put((b_ids, base))

    L = int(seq_len)

    def explode(part) -> dict:
        bb_ids, bb_base = ray.get(base_ref)
        ids = part[id_column].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = part["n_tokens"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bk = part["__bucket"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        empty = {id_column: np.empty(0, dtype=np.int64),
                 "seq_id": np.empty(0, dtype=np.int64),
                 "doc_start": np.empty(0, dtype=np.int64),
                 "seq_start": np.empty(0, dtype=np.int64),
                 "n_tokens_span": np.empty(0, dtype=np.int64)}
        if not len(ids):
            return empty
        # the partition holds whole buckets; offsets are bucket base +
        # within-bucket exclusive cumsum in doc_id order
        order = np.lexsort((ids, bk))
        ids, n, bk = ids[order], n[order], bk[order]
        csum = np.cumsum(n)
        excl = np.concatenate(([0], csum[:-1]))
        bfirst = np.ones(len(bk), dtype=bool)
        bfirst[1:] = bk[1:] != bk[:-1]
        # rebase each bucket run to zero, then add its global base
        run_excl_at_start = excl[bfirst]
        o = excl - np.repeat(run_excl_at_start, np.diff(
            np.append(np.flatnonzero(bfirst), len(bk))))
        o = o + np.repeat(bb_base[np.searchsorted(bb_ids, bk[bfirst])],
                          np.diff(np.append(np.flatnonzero(bfirst),
                                            len(bk))))
        nz = n > 0
        ids, n, o = ids[nz], n[nz], o[nz]
        if not len(ids):
            return empty
        s0 = o // L
        s1 = (o + n - 1) // L
        n_spans = (s1 - s0 + 1).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(ids)), n_spans)
        # span j of its doc -> global sequence id
        span_j = np.arange(len(doc_idx), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n_spans)[:-1])), n_spans)
        seq = s0[doc_idx] + span_j
        g_start = np.maximum(o[doc_idx], seq * L)
        g_end = np.minimum(o[doc_idx] + n[doc_idx], (seq + 1) * L)
        return {id_column: ids[doc_idx],
                "seq_id": seq,
                "doc_start": g_start - o[doc_idx],
                "seq_start": g_start - seq * L,
                "n_tokens_span": g_end - g_start}

    return grouped_apply(counts, ["__bucket"], explode,
                         num_partitions=num_partitions,
                         fn_format="pyarrow")


def select_token_budget(ds, budget: int, score_column: str,
                        id_column: str = "doc_id",
                        text_column: str = "text",
                        score_bucket: int = 1,
                        num_partitions: int = 32):
    """Greedy corpus selection under a token budget: keep whole
    documents in (score DESC, id ASC) order while the running token
    total stays within ``budget`` — the standard
    best-data-first selection step of a pretraining pipeline.

    Same distributed prefix-sum shape as ``pack_sequences``, but the
    global order is score-descending: the exchange bucket is
    ``-(score // score_bucket)`` (monotone in the keep order, coarsened
    by ``score_bucket`` so the driver-held bucket table stays small at
    scale), buckets are co-located with one hash exchange, and each
    partition finishes the cumsum locally from the broadcast bucket
    bases. A document is kept iff ``excl_cumsum + n_tokens <= budget``
    (whole documents only). Exact integer arithmetic — the DuckDB
    window twin (pipelines/queries.SQL_SELECT_BUDGET) matches
    bit-for-bit. Scores must be integers (quantize floats first)."""
    import pyarrow as pa
    import ray
    from nacc_form_validator_ray.stages.partition import (grouped_agg_sum,
                                                          grouped_apply)
    from nacc_form_validator_ray.stages.text_signals import \
        arrow_token_codes

    def project(batch: pa.Table) -> dict:
        col = batch[text_column]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        _, _, _, n_tokens = arrow_token_codes(arr)
        ids = np.asarray(batch[id_column]).astype(np.int64)
        score = np.asarray(batch[score_column]).astype(np.int64)
        return {id_column: ids, "score": score,
                "n_tokens": n_tokens.astype(np.int64),
                "__bucket": -(score // score_bucket)}

    counts = ds.map_batches(project, batch_format="pyarrow")

    bucket_tot = grouped_agg_sum(counts, ["__bucket"], ["n_tokens"],
                                 num_partitions=num_partitions) \
        .to_pandas()
    if len(bucket_tot):
        b_ids = bucket_tot["__bucket"].to_numpy().astype(np.int64)
        b_sum = bucket_tot["n_tokens"].to_numpy().astype(np.int64)
        order = np.argsort(b_ids)  # ascending bucket == descending score
        b_ids, b_sum = b_ids[order], b_sum[order]
        base = np.zeros(len(b_ids), dtype=np.int64)
        base[1:] = np.cumsum(b_sum)[:-1]
    else:
        b_ids = base = np.empty(0, dtype=np.int64)
    base_ref = ray.put((b_ids, base))
    budget = int(budget)

    def keep(part) -> dict:
        bb_ids, bb_base = ray.get(base_ref)
        ids = np.asarray(part[id_column]).astype(np.int64)
        sc = np.asarray(part["score"]).astype(np.int64)
        n = np.asarray(part["n_tokens"]).astype(np.int64)
        bk = np.asarray(part["__bucket"]).astype(np.int64)
        empty = {id_column: np.empty(0, dtype=np.int64),
                 "score": np.empty(0, dtype=np.int64),
                 "n_tokens": np.empty(0, dtype=np.int64),
                 "cum_tokens": np.empty(0, dtype=np.int64)}
        if not len(ids):
            return empty
        order = np.lexsort((ids, -sc, bk))
        ids, sc, n, bk = ids[order], sc[order], n[order], bk[order]
        csum = np.cumsum(n)
        excl = np.concatenate(([0], csum[:-1]))
        bfirst = np.ones(len(bk), dtype=bool)
        bfirst[1:] = bk[1:] != bk[:-1]
        runs = np.diff(np.append(np.flatnonzero(bfirst), len(bk)))
        o = excl - np.repeat(excl[bfirst], runs) \
            + np.repeat(bb_base[np.searchsorted(bb_ids, bk[bfirst])],
                        runs)
        mask = o + n <= budget
        return {id_column: ids[mask], "score": sc[mask],
                "n_tokens": n[mask], "cum_tokens": (o + n)[mask]}

    return grouped_apply(counts, ["__bucket"], keep,
                         num_partitions=num_partitions,
                         fn_format="pyarrow")


def shuffle_manifest(ds, id_column: str = "doc_id",
                     bucket_shift: int = 16,
                     num_partitions: int = 32):
    """Deterministic global shuffle as a MANIFEST: (id, shuffle_pos)
    where ``shuffle_pos`` is the row's rank under the pseudo-random
    order ``key = (A*(id mod P31) + B) mod P31`` (ties broken by id).

    This is how a 100-TB corpus gets shuffled for training: payloads
    never move — the loader reads the manifest and gathers. Third
    instance of the bucketed distributed prefix-sum (``pack_sequences``,
    ``select_token_budget``): bucket = key >> bucket_shift (monotone in
    the order, <= P31/2^shift buckets on the driver), per-bucket counts
    exchange once, each partition ranks its co-located buckets locally.
    Integer-exact; DuckDB twin is row_number() over the same key
    (pipelines/queries.SQL_SHUFFLE_MANIFEST)."""
    import pyarrow as pa
    import ray
    from nacc_form_validator_ray.stages.partition import (grouped_agg_sum,
                                                          grouped_apply)
    from nacc_form_validator_ray.stages.sampling import (SAMPLE_A,
                                                         SAMPLE_B)
    P31 = 2 ** 31 - 1

    def project(batch: pa.Table) -> dict:
        ids = np.asarray(batch[id_column]).astype(np.int64)
        key = (SAMPLE_A * (ids % P31) + SAMPLE_B) % P31
        return {id_column: ids, "__key": key,
                "__bucket": key >> bucket_shift,
                "__one": np.ones(len(ids), dtype=np.int64)}

    keyed = ds.map_batches(project, batch_format="pyarrow")

    bucket_tot = grouped_agg_sum(keyed, ["__bucket"], ["__one"],
                                 num_partitions=num_partitions) \
        .to_pandas()
    if len(bucket_tot):
        b_ids = bucket_tot["__bucket"].to_numpy().astype(np.int64)
        b_cnt = bucket_tot["__one"].to_numpy().astype(np.int64)
        order = np.argsort(b_ids)
        b_ids, b_cnt = b_ids[order], b_cnt[order]
        base = np.zeros(len(b_ids), dtype=np.int64)
        base[1:] = np.cumsum(b_cnt)[:-1]
    else:
        b_ids = base = np.empty(0, dtype=np.int64)
    base_ref = ray.put((b_ids, base))

    def rank(part) -> dict:
        bb_ids, bb_base = ray.get(base_ref)
        ids = np.asarray(part[id_column]).astype(np.int64)
        key = np.asarray(part["__key"]).astype(np.int64)
        bk = np.asarray(part["__bucket"]).astype(np.int64)
        if not len(ids):
            return {id_column: np.empty(0, dtype=np.int64),
                    "shuffle_pos": np.empty(0, dtype=np.int64)}
        order = np.lexsort((ids, key, bk))
        ids, key, bk = ids[order], key[order], bk[order]
        local = np.arange(len(ids), dtype=np.int64)
        bfirst = np.ones(len(bk), dtype=bool)
        bfirst[1:] = bk[1:] != bk[:-1]
        runs = np.diff(np.append(np.flatnonzero(bfirst), len(bk)))
        local = local - np.repeat(local[bfirst], runs)
        pos = local + np.repeat(
            bb_base[np.searchsorted(bb_ids, bk[bfirst])], runs)
        return {id_column: ids, "shuffle_pos": pos}

    return grouped_apply(keyed, ["__bucket"], rank,
                         num_partitions=num_partitions,
                         fn_format="pyarrow")


def waterfill_cap(totals: "np.ndarray", budget: int) -> int:
    """Exact-integer water-filling level: the largest integer cap ``c``
    with ``sum_s min(T_s, c) <= budget``.

    With totals sorted ascending (T_1 <= .. <= T_K, prefix P_i), the
    optimum is ``max_{i: P_i <= B} (B - P_i) // (K - i)`` over segments
    i in [0, K): every candidate is feasible (the segment formula
    upper-bounds the true allocation off-segment on BOTH sides) and the
    optimum's own segment attains it — so one max, no search. The
    DuckDB twin (pipelines/curation) evaluates the identical formula
    with window functions."""
    t = np.sort(np.asarray(totals, dtype=np.int64))
    if len(t) == 0:
        return 0
    pfx = np.concatenate(([0], np.cumsum(t)[:-1]))  # P_i, i = 0..K-1
    k_rem = len(t) - np.arange(len(t))              # K - i
    ok = pfx <= budget
    if not ok.any():
        return 0
    return int(((budget - pfx[ok]) // k_rem[ok]).max())


def source_token_waterfill(ds, budget_den: int = 2,
                           id_column: str = "doc_id",
                           source_column: str = "source",
                           text_column: str = "text",
                           bucket_size: int = 1 << 14,
                           num_partitions: int = 32):
    """Per-source token-budget allocation by water-filling: cap every
    source at the same level ``c*`` chosen so the total kept tokens
    stay within ``budget = total_tokens // budget_den`` — the standard
    pretraining-mix balancer (big sources are clipped, small sources
    survive whole).

    Distributed shape (same bucketed prefix-sum as
    ``select_token_budget``, partitioned by source):

    1. lean pass: per-batch (source, doc_id-bucket) token sums — the
       text column never leaves the first map;
    2. ONE (source, bucket) ``grouped_agg_sum``; the driver holds
       sources x buckets rows, solves ``c*`` via :func:`waterfill_cap`
       (exact ints), and broadcasts per-(source, bucket) exclusive
       bases;
    3. ONE (source, bucket) co-location exchange: local doc_id sort,
       global within-source cumsum = base + local cumsum, keep rule
       ``cum <= c*`` (whole documents only).

    Returns the full per-document manifest (doc_id, source, n_tokens,
    cum_tokens, kept) as a streaming Dataset."""
    import pyarrow as pa
    import ray
    from nacc_form_validator_ray.stages.partition import (grouped_agg_sum,
                                                          grouped_apply)
    from nacc_form_validator_ray.stages.text_signals import \
        arrow_token_codes

    def project(batch: pa.Table) -> dict:
        col = batch[text_column]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        _, _, _, n_tokens = arrow_token_codes(arr)
        ids = np.asarray(batch[id_column]).astype(np.int64)
        src = np.asarray(batch[source_column]).astype(object)
        return {id_column: ids, "source": src,
                "n_tokens": n_tokens.astype(np.int64),
                "__bucket": ids // bucket_size}

    counts = ds.map_batches(project, batch_format="pyarrow")

    bucket_tot = grouped_agg_sum(counts, ["source", "__bucket"],
                                 ["n_tokens"],
                                 num_partitions=num_partitions) \
        .to_pandas()
    if bucket_tot.empty:
        cap = 0
        base_map = {}
    else:
        bucket_tot = bucket_tot.sort_values(["source", "__bucket"])
        per_source = bucket_tot.groupby("source")["n_tokens"].sum()
        budget = int(per_source.sum()) // int(budget_den)
        cap = waterfill_cap(per_source.to_numpy(np.int64), budget)
        excl = bucket_tot.groupby("source")["n_tokens"].cumsum() \
            - bucket_tot["n_tokens"]
        base_map = dict(zip(
            zip(bucket_tot["source"], bucket_tot["__bucket"]),
            excl.astype(np.int64)))
    base_ref = ray.put((base_map, cap))

    def keep(part) -> dict:
        bases, c = ray.get(base_ref)
        ids = np.asarray(part[id_column]).astype(np.int64)
        src = np.asarray(part["source"]).astype(object)
        n = np.asarray(part["n_tokens"]).astype(np.int64)
        bk = np.asarray(part["__bucket"]).astype(np.int64)
        if not len(ids):
            return {id_column: np.empty(0, dtype=np.int64),
                    "source": np.empty(0, dtype=object),
                    "n_tokens": np.empty(0, dtype=np.int64),
                    "cum_tokens": np.empty(0, dtype=np.int64),
                    "kept": np.empty(0, dtype=bool)}
        order = np.lexsort((ids, bk, src))
        ids, src, n, bk = ids[order], src[order], n[order], bk[order]
        csum = np.cumsum(n)
        excl = np.concatenate(([0], csum[:-1]))
        first = np.ones(len(ids), dtype=bool)
        first[1:] = (src[1:] != src[:-1]) | (bk[1:] != bk[:-1])
        starts = np.flatnonzero(first)
        runs = np.diff(np.append(starts, len(ids)))
        base = np.repeat(
            np.array([bases[(src[i], bk[i])] for i in starts],
                     dtype=np.int64), runs)
        cum = base + (excl - np.repeat(excl[first], runs)) + n
        return {id_column: ids, "source": src, "n_tokens": n,
                "cum_tokens": cum, "kept": cum <= c}

    return grouped_apply(counts, ["source", "__bucket"], keep,
                         num_partitions=num_partitions)
