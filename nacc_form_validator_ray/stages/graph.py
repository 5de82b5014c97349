"""Host-graph PageRank over the web link structure — an iterative
distributed graph operator in fixed-point integer arithmetic.

Rank propagation is the classic power iteration, but every quantity is
an exact int64 so the DuckDB twin (chained CTEs, one per iteration)
reproduces the result bit-for-bit:

* ranks are scaled by ``2**40``; the initial rank is ``SCALE // n``;
* the teleport term is ``((SCALE // n) * 15) // 100`` (damping 0.85);
* each edge contributes ``(85 * r_src) // (100 * outdeg_src)``
  (one floor division — numpy ``//`` == DuckDB ``//`` on positive
  ints). 85 * SCALE < 2**47, far inside int64.

Dangling mass is NOT redistributed (hosts with no outbound edge keep
only their teleport term) — deterministic on both sides and the usual
choice for boilerplate-scale host graphs.

Scale shape (Pregel-style: edges static, vertex state moves): hosts are
interned to dense int ids once, the lean (src_id, dst_id) edge table is
materialized ONCE and never re-shuffled; per iteration the rank vector
(int64, one slot per host — the genuinely small side: ~10^8 hosts for
10^12 pages, <1 GB) is broadcast via ``ray.put`` and each edge batch
pre-aggregates its contributions by dst id before ONE tiny grouped-sum
exchange. Re-shuffling the edge table every iteration (the naive
join-per-round formulation) costs P-times more exchange traffic and was
measured 10-40x slower at 120k pages. Assumption to document at larger
vertex universes: the rank vector must fit in worker/driver memory —
shard the id space and run the loop per shard if it cannot.
"""

from __future__ import annotations

import numpy as np

#: fixed-point scale for rank values
PR_SCALE = 1 << 40
HOST_RE = r"^(?i:https?)://([^/?#]+)"


def _gather_hosts(nodes) -> "np.ndarray":
    """Sorted dense host universe from a distinct-host exchange; safe
    on an EMPTY corpus (np.concatenate over zero batches raises, and a
    downstream ``PR_SCALE // n_nodes`` would divide by zero — the
    schemaless-empty trap's graph-shaped cousin)."""
    batches = [b["host"].to_numpy(zero_copy_only=False)
               for b in nodes.iter_batches(batch_format="pyarrow",
                                           batch_size=65536)]
    if not batches:
        return np.array([], dtype=object)
    return np.sort(np.concatenate(batches))


def _host_of(url_arr, pc):
    """Normalized host of a url column: lowercase, strip www./ports."""
    import pyarrow as pa
    parts = pc.extract_regex(pc.fill_null(url_arr, ""),
                             r"^(?i:https?)://(?P<hp>[^/?#]+)")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    host = pc.utf8_lower(pc.struct_field(parts, "hp"))
    host = pc.replace_substring_regex(host, r"^www\.", "")
    host = pc.replace_substring_regex(host, r":(443|80)$", "")
    return pc.fill_null(host, "")


def inlink_stats(ds, url_column: str = "url",
                 links_column: str = "links",
                 num_partitions: int = 32):
    """Per-host inlink statistics over the link graph: total inbound
    link count and number of distinct linking hosts, restricted (like
    :func:`host_pagerank`) to targets that are themselves page hosts.

    Scale shape: the map pass pre-aggregates (src, dst) pairs per batch
    (combiner), ONE hash exchange on dst merges them, and the known-host
    restriction rides the same exchange (node rows tagged with a null
    src) — no join and no second exchange. Output: ``host``,
    ``n_inlinks`` (int64), ``n_src_hosts`` (int64).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from nacc_form_validator_ray.stages.partition import (grouped_apply,
                                                           pa_grouped_agg)

    def edge_pairs(batch: "pa.Table") -> "pa.Table":
        src = _host_of(batch[url_column], pc)
        links = batch[links_column]
        if isinstance(links, pa.ChunkedArray):
            links = links.combine_chunks()
        counts = pc.list_value_length(links).to_numpy() \
            .astype(np.int64, copy=False)
        dst = _host_of(pc.list_flatten(links), pc)
        src_rep = src.take(pa.array(np.repeat(
            np.arange(len(batch), dtype=np.int64), counts)))
        pairs = pa_grouped_agg(
            pa.table({"src": src_rep, "host": dst}),
            ["src", "host"], [([], "count_all")], ["cnt"])
        # node rows: src=null marks "this dst is a known page host"
        nodes = pc.unique(src)
        return pa.concat_tables([
            pairs,
            pa.table({"src": pa.nulls(len(nodes), pa.string()),
                      "host": nodes,
                      "cnt": pa.nulls(len(nodes), pa.int64())})])

    def per_host(part: "pa.Table") -> "pa.Table":
        src = part["src"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        is_node = pc.is_null(src).to_numpy(zero_copy_only=False)
        known = pc.unique(part["host"].filter(pa.array(is_node)))
        edges = part.filter(pa.array(~is_node))
        edges = edges.filter(pc.is_in(edges["host"], value_set=known))
        agg = pa_grouped_agg(
            edges, ["host"],
            [("cnt", "sum"), ("src", "count_distinct")],
            ["n_inlinks", "n_src_hosts"])
        # known hosts with zero inlinks still get a row
        missing = known.filter(pc.invert(
            pc.is_in(known, value_set=agg["host"].combine_chunks())))
        zero = pa.table({
            "host": missing,
            "n_inlinks": pa.array(
                np.zeros(len(missing), dtype=np.int64)),
            "n_src_hosts": pa.array(
                np.zeros(len(missing), dtype=np.int64))})
        return pa.concat_tables([agg, zero])

    return grouped_apply(ds.map_batches(edge_pairs,
                                        batch_format="pyarrow"),
                         ["host"], per_host,
                         num_partitions=num_partitions,
                         fn_format="pyarrow")


def outlink_stats(ds, url_column: str = "url",
                  links_column: str = "links",
                  num_partitions: int = 32):
    """Per-host OUTLINK statistics — the outlink-diversity / SEO-spam
    profile mirroring :func:`inlink_stats`: total outbound links whose
    target is itself a known page host, distinct target hosts,
    self-link count (target == source) and the diversity ratio
    ``n_dst_hosts / n_outlinks`` (0.0 for hosts with no qualifying
    outlinks).

    Scale shape: pass 1 pre-aggregates (src, dst, cnt) per batch and
    exchanges on DST, where the known-host restriction is
    partition-local (node rows ride the same exchange, exactly like
    inlink_stats — the check never needs a broadcast host set); the
    surviving lean (src, dst, cnt) rows plus one presence marker per
    known host then ride a SECOND lean exchange on SRC for the rollup.
    Both exchanges carry host-level rows only, never page payloads.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from nacc_form_validator_ray.stages.partition import (grouped_apply,
                                                          pa_grouped_agg)

    def edge_pairs(batch: "pa.Table") -> "pa.Table":
        src = _host_of(batch[url_column], pc)
        links = batch[links_column]
        if isinstance(links, pa.ChunkedArray):
            links = links.combine_chunks()
        counts = pc.list_value_length(links).to_numpy() \
            .astype(np.int64, copy=False)
        dst = _host_of(pc.list_flatten(links), pc)
        src_rep = src.take(pa.array(np.repeat(
            np.arange(len(batch), dtype=np.int64), counts)))
        pairs = pa_grouped_agg(
            pa.table({"src": src_rep, "dst": dst}),
            ["src", "dst"], [([], "count_all")], ["cnt"])
        nodes = pc.unique(src)
        return pa.concat_tables([
            pairs,
            pa.table({"src": pa.nulls(len(nodes), pa.string()),
                      "dst": nodes,
                      "cnt": pa.nulls(len(nodes), pa.int64())})])

    def per_dst(part: "pa.Table") -> "pa.Table":
        src = part["src"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        is_node = pc.is_null(src).to_numpy(zero_copy_only=False)
        known = pc.unique(part["dst"].filter(pa.array(is_node)))
        edges = part.filter(pa.array(~is_node))
        edges = edges.filter(pc.is_in(edges["dst"], value_set=known))
        merged = pa_grouped_agg(edges, ["src", "dst"],
                                [("cnt", "sum")], ["cnt"])
        # presence markers: every known host must reach the src
        # exchange even with zero qualifying outlinks
        return pa.concat_tables([
            merged,
            pa.table({"src": known,
                      "dst": pa.nulls(len(known), pa.string()),
                      "cnt": pa.nulls(len(known), pa.int64())})])

    def per_src(part: "pa.Table") -> "pa.Table":
        dst = part["dst"]
        if isinstance(dst, pa.ChunkedArray):
            dst = dst.combine_chunks()
        is_marker = pc.is_null(dst).to_numpy(zero_copy_only=False)
        hosts = pc.unique(part["src"].filter(pa.array(is_marker)))
        edges = part.filter(pa.array(~is_marker))
        is_self = pc.equal(edges["src"], edges["dst"])
        cnt = edges["cnt"]
        if isinstance(cnt, pa.ChunkedArray):
            cnt = cnt.combine_chunks()
        cnt_np = cnt.to_numpy(zero_copy_only=False).astype(np.int64)
        self_np = np.where(
            is_self.combine_chunks().to_numpy(zero_copy_only=False)
            if isinstance(is_self, pa.ChunkedArray)
            else is_self.to_numpy(zero_copy_only=False),
            cnt_np, np.int64(0))
        agg = pa_grouped_agg(
            pa.table({"src": edges["src"], "cnt": pa.array(cnt_np),
                      "one": np.ones(edges.num_rows, dtype=np.int64),
                      "self": pa.array(self_np)}),
            ["src"],
            [("cnt", "sum"), ("one", "sum"), ("self", "sum")],
            ["n_outlinks", "n_dst_hosts", "n_self"])
        missing = hosts.filter(pc.invert(
            pc.is_in(hosts, value_set=agg["src"].combine_chunks())))
        zeros = np.zeros(len(missing), dtype=np.int64)
        agg = pa.concat_tables([agg, pa.table({
            "src": missing, "n_outlinks": pa.array(zeros),
            "n_dst_hosts": pa.array(zeros), "n_self": pa.array(zeros)})])
        n_out = agg["n_outlinks"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n_dst = agg["n_dst_hosts"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        div = np.where(n_out > 0, n_dst / np.maximum(n_out, 1.0), 0.0)
        return agg.rename_columns(
            ["host", "n_outlinks", "n_dst_hosts", "n_self"]) \
            .append_column("diversity", pa.array(div))

    pass1 = grouped_apply(ds.map_batches(edge_pairs,
                                         batch_format="pyarrow"),
                          ["dst"], per_dst,
                          num_partitions=num_partitions,
                          fn_format="pyarrow")
    return grouped_apply(pass1, ["src"], per_src,
                         num_partitions=num_partitions,
                         fn_format="pyarrow")


def host_pagerank(ds, url_column: str = "url",
                  links_column: str = "links",
                  iterations: int = 5, num_partitions: int = 32,
                  history: dict | None = None):
    """PageRank over the host graph induced by ``links``.

    Nodes are the distinct (normalized) hosts of the page URLs; edges
    are (page host -> link host) with multiplicity, restricted to link
    targets that are themselves page hosts. Returns a Dataset with
    ``host``, the fixed-point ``rank_fp`` (int64, scale 2**40) and the
    float ``rank`` (``rank_fp / 2**40`` — one correctly-rounded IEEE
    division, bit-identical in the SQL twin).
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from nacc_form_validator_ray.stages.partition import (grouped_agg_sum,
                                                          grouped_apply)

    def edge_project(batch: "pa.Table") -> "pa.Table":
        src = _host_of(batch[url_column], pc)
        links = batch[links_column]
        if isinstance(links, pa.ChunkedArray):
            links = links.combine_chunks()
        counts = pc.list_value_length(links).to_numpy() \
            .astype(np.int64, copy=False)
        flat = pc.list_flatten(links)
        dst = _host_of(flat, pc)
        src_rep = src.take(pa.array(np.repeat(
            np.arange(len(batch), dtype=np.int64), counts)))
        return pa.table({"src": src_rep, "dst": dst})

    edges_raw = ds.map_batches(edge_project, batch_format="pyarrow")

    def src_project(batch: "pa.Table") -> "pa.Table":
        # per-batch distinct (combiner) so the exchange moves hosts,
        # not pages
        h = pc.unique(_host_of(batch[url_column], pc))
        return pa.table({"host": h})

    def distinct_hosts(part: "pa.Table") -> "pa.Table":
        return pa.TableGroupBy(part, ["host"]).aggregate([])

    nodes = grouped_apply(ds.map_batches(src_project,
                                         batch_format="pyarrow"),
                          ["host"], distinct_hosts,
                          num_partitions=num_partitions,
                          fn_format="pyarrow").materialize()
    # intern hosts to dense ids (sorted for determinism). The host
    # universe is the bounded dimension side — broadcast once.
    hosts = _gather_hosts(nodes)
    n_nodes = int(len(hosts))
    if n_nodes == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "host": pa.array([], pa.string()),
            "rank_fp": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64())}))
    host_index = pd.Index(hosts)
    idx_ref = ray.put(host_index)

    # lean integer edge table, built ONCE: (src_id, dst_id) with dst
    # restricted to known hosts. Out-degree counts ALL outbound links
    # (mass to external hosts is lost, like mass to dangling hosts).
    def to_ids(batch: "pa.Table") -> "pa.Table":
        index = ray.get(idx_ref)
        src = index.get_indexer(
            batch["src"].to_numpy(zero_copy_only=False))
        dst = index.get_indexer(
            batch["dst"].to_numpy(zero_copy_only=False))
        keep = dst >= 0
        # carry per-batch out-degree partials (over ALL links) as
        # side rows (dst_id = -1) so one exchange yields global degrees
        uid, cnt = np.unique(src, return_counts=True)
        return pa.table({
            "src_id": pa.array(np.concatenate([src[keep], uid])),
            "dst_id": pa.array(np.concatenate(
                [dst[keep], np.full(len(uid), -1, dtype=np.int64)])),
            "cnt": pa.array(np.concatenate(
                [np.zeros(int(keep.sum()), dtype=np.int64), cnt])),
        })

    tagged = edges_raw.map_batches(to_ids,
                                   batch_format="pyarrow").materialize()

    import pyarrow.compute as _pc

    def only_edges(batch: "pa.Table") -> "pa.Table":
        m = _pc.not_equal(batch["dst_id"], pa.scalar(-1))
        return batch.filter(m).select(["src_id", "dst_id"])

    def only_deg(batch: "pa.Table") -> "pa.Table":
        m = _pc.equal(batch["dst_id"], pa.scalar(-1))
        return batch.filter(m).select(["src_id", "cnt"])

    edges = tagged.map_batches(only_edges,
                               batch_format="pyarrow").materialize()
    deg_rows = grouped_agg_sum(
        tagged.map_batches(only_deg, batch_format="pyarrow"),
        ["src_id"], ["cnt"], num_partitions=num_partitions)
    outdeg = np.zeros(n_nodes, dtype=np.int64)
    for b in deg_rows.iter_batches(batch_format="pyarrow",
                                   batch_size=65536):
        outdeg[b["src_id"].to_numpy(zero_copy_only=False)] = \
            b["cnt"].to_numpy(zero_copy_only=False)

    r_init = PR_SCALE // n_nodes
    teleport = (r_init * 15) // 100
    ranks = np.full(n_nodes, r_init, dtype=np.int64)
    deg_ref = ray.put(outdeg)

    for _it in range(iterations):
        rank_ref = ray.put(ranks)

        def contrib(batch: "pa.Table") -> "pa.Table":
            r = ray.get(rank_ref)
            d = ray.get(deg_ref)
            src = batch["src_id"].to_numpy(zero_copy_only=False)
            dst = batch["dst_id"].to_numpy(zero_copy_only=False)
            part = (85 * r[src]) // (100 * d[src])
            # per-batch combiner: sum by dst before the exchange
            order = np.argsort(dst, kind="stable")
            sd = dst[order]
            starts = np.flatnonzero(
                np.concatenate(([True], sd[1:] != sd[:-1])))
            sums = np.add.reduceat(part[order], starts) \
                if len(sd) else np.empty(0, dtype=np.int64)
            return pa.table({"dst_id": pa.array(sd[starts]),
                             "part": pa.array(sums)})

        # partials are already per-batch combined; the final merge is a
        # k-way add into the bounded rank vector on the driver (the
        # lr_train gradient-merge pattern). A grouped exchange here
        # costs a full sort barrier per round for the same exact sums —
        # measured ~1.4 s/round of pure overhead at 120k pages. Switch
        # back to grouped_agg_sum if sum(distinct dst per batch) ever
        # exceeds driver memory.
        nxt = np.full(n_nodes, teleport, dtype=np.int64)
        for b in edges.map_batches(contrib, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=65536):
            np.add.at(nxt,
                      b["dst_id"].to_numpy(zero_copy_only=False),
                      b["part"].to_numpy(zero_copy_only=False))
        ranks = nxt
        if history is not None:
            # intermediate fixed-point snapshots (host order == the
            # sorted ``hosts`` array == the returned row order) — the
            # convergence audit reads round k and k+1 from ONE run
            # instead of paying a second full pipeline
            history[_it + 1] = ranks.copy()

    final = pa.table({
        "host": pa.array(hosts),
        "rank_fp": pa.array(ranks),
        "rank": pa.array(ranks.astype(np.float64) / float(PR_SCALE)),
    })
    import ray.data as rd
    return rd.from_arrow(final)


def host_hits(ds, url_column: str = "url",
              links_column: str = "links",
              iterations: int = 5, num_partitions: int = 32):
    """HITS hubs/authorities over the host graph (Kleinberg 1999), in
    exact int64 fixed-point arithmetic like :func:`host_pagerank`.

    Per round: ``a[dst] = sum(h[src])`` over edges, max-normalized as
    ``a // ceil(max(a)/SCALE)`` (the ceil-divisor form — multiplying
    by SCALE first would overflow int64); then ``h[src] =
    sum(a[dst])``, normalized the same way. Every operation is an
    integer sum or floor division, so the DuckDB twin (two grouped
    sums + two scalar maxes per round, chained CTEs) is bit-identical.
    Normalizing by the max (not the L2 norm) keeps the recurrence in
    pure integers; hosts with no edges hold 0.

    Scale shape: identical to pagerank — edge-id table built once,
    hub/authority vectors broadcast per half-step, per-batch combining
    into one tiny grouped-sum exchange each.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from nacc_form_validator_ray.stages.partition import grouped_apply

    def edge_project(batch: "pa.Table") -> "pa.Table":
        src = _host_of(batch[url_column], pc)
        links = batch[links_column]
        if isinstance(links, pa.ChunkedArray):
            links = links.combine_chunks()
        counts = pc.list_value_length(links).to_numpy() \
            .astype(np.int64, copy=False)
        flat = pc.list_flatten(links)
        dst = _host_of(flat, pc)
        src_rep = src.take(pa.array(np.repeat(
            np.arange(len(batch), dtype=np.int64), counts)))
        return pa.table({"src": src_rep, "dst": dst})

    def src_project(batch: "pa.Table") -> "pa.Table":
        return pa.table({"host": pc.unique(
            _host_of(batch[url_column], pc))})

    def distinct_hosts(part: "pa.Table") -> "pa.Table":
        return pa.TableGroupBy(part, ["host"]).aggregate([])

    nodes = grouped_apply(ds.map_batches(src_project,
                                         batch_format="pyarrow"),
                          ["host"], distinct_hosts,
                          num_partitions=num_partitions,
                          fn_format="pyarrow").materialize()
    hosts = _gather_hosts(nodes)
    n_nodes = int(len(hosts))
    if n_nodes == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "host": pa.array([], pa.string()),
            "auth_fp": pa.array([], pa.int64()),
            "hub_fp": pa.array([], pa.int64()),
            "auth": pa.array([], pa.float64()),
            "hub": pa.array([], pa.float64())}))
    host_index = pd.Index(hosts)
    idx_ref = ray.put(host_index)

    def to_ids(batch: "pa.Table") -> "pa.Table":
        index = ray.get(idx_ref)
        src = index.get_indexer(
            batch["src"].to_numpy(zero_copy_only=False))
        dst = index.get_indexer(
            batch["dst"].to_numpy(zero_copy_only=False))
        keep = dst >= 0
        return pa.table({"src_id": pa.array(src[keep]),
                         "dst_id": pa.array(dst[keep])})

    edges = ds.map_batches(
        edge_project, batch_format="pyarrow").map_batches(
        to_ids, batch_format="pyarrow").materialize()

    def push(vec: np.ndarray, key: str, out: str) -> np.ndarray:
        """sum vec[key] into out-side slots via one combined exchange."""
        ref = ray.put(vec)

        def contrib(batch: "pa.Table") -> "pa.Table":
            v = ray.get(ref)
            kk = batch[key].to_numpy(zero_copy_only=False)
            oo = batch[out].to_numpy(zero_copy_only=False)
            part = v[kk]
            order = np.argsort(oo, kind="stable")
            so = oo[order]
            starts = np.flatnonzero(
                np.concatenate(([True], so[1:] != so[:-1])))
            sums = np.add.reduceat(part[order], starts) \
                if len(so) else np.empty(0, dtype=np.int64)
            return pa.table({"id": pa.array(so[starts]),
                             "val": pa.array(sums)})

        # driver-side k-way merge of the per-batch-combined partials
        # (see host_pagerank's loop for the rationale and scale note)
        nxt = np.zeros(n_nodes, dtype=np.int64)
        for b in edges.map_batches(contrib, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=65536):
            np.add.at(nxt,
                      b["id"].to_numpy(zero_copy_only=False),
                      b["val"].to_numpy(zero_copy_only=False))
        return nxt

    def norm(v: np.ndarray) -> np.ndarray:
        # max-normalize via a ceil divisor: v // ceil(max/SCALE).
        # (v * SCALE) // max would overflow int64 — raw sums reach
        # ~indegree * SCALE ~ 2^57 here
        m = int(v.max()) if len(v) else 0
        if m <= 0:
            return v
        d = (m + PR_SCALE - 1) // PR_SCALE
        return v // d

    auth = np.full(n_nodes, PR_SCALE, dtype=np.int64)
    hub = np.full(n_nodes, PR_SCALE, dtype=np.int64)
    for _ in range(iterations):
        auth = norm(push(hub, "src_id", "dst_id"))
        hub = norm(push(auth, "dst_id", "src_id"))

    final = pa.table({
        "host": pa.array(hosts),
        "auth_fp": pa.array(auth),
        "hub_fp": pa.array(hub),
        "auth": pa.array(auth.astype(np.float64) / float(PR_SCALE)),
        "hub": pa.array(hub.astype(np.float64) / float(PR_SCALE)),
    })
    import ray.data as rd
    return rd.from_arrow(final)


def _canonical_edge_frame(t, url_column: str, links_column: str,
                          with_orientation: bool = False):
    """Per-batch canonical host-edge builder shared by every graph
    operator: flatten links, host-normalize both sides, drop
    self-loops, lex-canonicalize to ``(a < b)``, local dedup. With
    ``with_orientation`` the original direction survives as a ``fwd``
    flag (``src < dst``) so reciprocal-pair detection can ride the
    same canonical key."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    links = t[links_column]
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    flat = pc.list_flatten(links)
    parent = pc.list_parent_indices(links).to_numpy(
        zero_copy_only=False)
    src_all = _host_of(t[url_column], pc) \
        .to_numpy(zero_copy_only=False)
    dst = _host_of(flat, pc).to_numpy(zero_copy_only=False)
    src = src_all[parent]
    keep = src != dst
    src, dst = src[keep], dst[keep]
    a = np.where(src < dst, src, dst)
    b = np.where(src < dst, dst, src)
    cols = {"a": a, "b": b}
    if with_orientation:
        cols["fwd"] = src < dst
    return pd.DataFrame(cols).drop_duplicates()


def _host_edge_list(ds, url_column: str, links_column: str,
                    num_partitions: int):
    """Distinct undirected host edge list ``(a < b)`` of the link
    graph: per-batch :func:`_canonical_edge_frame`, then ONE (a, b)
    exchange for global distinctness. Materialized once (lean: two
    string columns) — shared by every multi-pass graph algorithm
    (triangles, k-core)."""
    from nacc_form_validator_ray.stages.partition import grouped_apply

    return grouped_apply(
        ds.map_batches(
            lambda t: _canonical_edge_frame(t, url_column,
                                            links_column),
            batch_format="pyarrow"),
        ["a", "b"], lambda part: part.drop_duplicates(),
        num_partitions=num_partitions).materialize()


def host_triangles(ds, url_column: str = "url",
                   links_column: str = "links",
                   num_partitions: int = 32,
                   orientation: str = "lex"):
    """Distributed triangle counting over the HOST link graph — the
    "forward" node-iterator algorithm (Schank & Wagner 2005) in three
    hash exchanges, strings end-to-end (exact — vertex ids are the
    normalized hosts themselves, so no hash-collision risk against
    the SQL twin). Host level, not page level: the fixture's page
    graph is structurally bipartite (messy source URLs link to clean
    doc URLs that never source links), so it has zero triangles by
    construction; hosts interlink freely:

    1. edge build: pages flat-map to undirected canonical edges
       ``(a, b) = (min, max)`` (self-loops dropped, per-batch local
       dedup), then ONE (a, b) exchange makes the edge set E distinct;
       E is materialized once (lean: two string columns) because the
       algorithm consumes it twice.
    2. triad generation: ONE exchange groups E by the smaller endpoint
       ``a``; each partition emits, per vertex, all neighbor pairs
       ``(x < y)`` from a's adjacency — each triangle {p<q<r} is
       generated exactly once, as the pair (q, r) from p.
    3. verify: candidates and E ride ONE side-tagged (x, y) exchange;
       a candidate counts iff its pair is an edge. Partitions emit
       int64 count partials; the driver sums O(partitions) scalars.

    Skew note: with the default ``orientation="lex"`` the triad volume
    from vertex ``a`` is deg⁺(a)² where deg⁺ counts LARGER neighbors
    only — a hub that is lexicographically smaller than most neighbors
    can blow up. ``orientation="degree"`` directs every edge from its
    (degree, name)-smaller endpoint (one extra counting exchange +
    a broadcast degree table), bounding total triad volume at
    O(E^1.5); the triangle count is identical (each triangle's
    order-minimal vertex emits it exactly once under either total
    order). Returns {n_edges, n_triangles}."""
    import pandas as pd

    from nacc_form_validator_ray.stages.partition import grouped_apply

    edges = _host_edge_list(ds, url_column, links_column,
                            num_partitions)
    n_edges = edges.count()
    if n_edges == 0:
        # an edgeless graph yields schemaless empty exchanges — short-
        # circuit to the (0, 0) row the SQL twin produces
        return pd.DataFrame({"n_edges": [np.int64(0)],
                             "n_triangles": [np.int64(0)]})

    if orientation == "degree":
        # the skew upgrade: orient each edge from its (degree, name)-
        # smaller endpoint, so triad volume per vertex is bounded by
        # its degree-ordered out-degree (O(E^1.5) total). Degrees come
        # from per-batch combiners + one vertex exchange; the table is
        # host-universe-sized (the module's documented small side, as
        # with the PageRank rank vector) and broadcasts via ray.put.
        import ray
        from nacc_form_validator_ray.stages.partition import \
            grouped_agg_sum

        def deg_partial(part: pd.DataFrame) -> pd.DataFrame:
            both = pd.concat([part["a"], part["b"]])
            vc = both.value_counts()
            return pd.DataFrame({"v": vc.index.to_numpy(object),
                                 "deg": vc.to_numpy(np.int64)})

        deg = grouped_agg_sum(
            edges.map_batches(deg_partial, batch_format="pandas"),
            ["v"], ["deg"], num_partitions=num_partitions).to_pandas()
        deg_ref = ray.put(dict(zip(deg["v"], deg["deg"])))

        def orient(part: pd.DataFrame) -> pd.DataFrame:
            d = ray.get(deg_ref)
            da = part["a"].map(d).to_numpy(np.int64)
            db = part["b"].map(d).to_numpy(np.int64)
            a = part["a"].to_numpy(object)
            b = part["b"].to_numpy(object)
            a_first = (da < db) | ((da == db) & (a < b))
            return pd.DataFrame({
                "u": np.where(a_first, a, b),
                "w": np.where(a_first, b, a)})

        directed = edges.map_batches(orient, batch_format="pandas")
        triad_key = "u"
    else:
        directed = edges.map_batches(
            lambda p: p.rename(columns={"a": "u", "b": "w"}),
            batch_format="pandas")
        triad_key = "u"

    def triads(part: pd.DataFrame) -> pd.DataFrame:
        xs, ys = [], []
        for _, g in part.groupby("u", sort=False):
            nb = np.sort(g["w"].to_numpy())
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            xs.append(nb[i])
            ys.append(nb[j])
        if not xs:
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object),
                                 "side": pd.Series([], dtype=np.int8)})
        # emitted pairs are lex-sorted (nb is), matching E's (a < b)
        return pd.DataFrame({"a": np.concatenate(xs),
                             "b": np.concatenate(ys),
                             "side": np.int8(0)})

    cands = grouped_apply(directed, [triad_key], triads,
                          num_partitions=num_partitions)

    def tag_edges(part: pd.DataFrame) -> pd.DataFrame:
        part = part.copy()
        part["side"] = np.int8(1)
        return part

    tagged_edges = edges.map_batches(tag_edges, batch_format="pandas")

    def count_matches(part: pd.DataFrame) -> pd.DataFrame:
        e = part.loc[part["side"] == 1, ["a", "b"]]
        c = part.loc[part["side"] == 0, ["a", "b"]]
        if len(e) == 0 or len(c) == 0:
            return pd.DataFrame({"n": pd.Series([0], dtype=np.int64)})
        merged = c.merge(e.drop_duplicates(), on=["a", "b"],
                         how="inner")
        return pd.DataFrame({"n": pd.Series([len(merged)],
                                            dtype=np.int64)})

    partials = grouped_apply(cands.union(tagged_edges), ["a", "b"],
                             count_matches,
                             num_partitions=num_partitions)
    n_tri = int(partials.to_pandas()["n"].sum())
    return pd.DataFrame({"n_edges": [np.int64(n_edges)],
                         "n_triangles": [np.int64(n_tri)]})


def host_clustering(ds, url_column: str = "url",
                    links_column: str = "links",
                    num_partitions: int = 32):
    """Per-host LOCAL clustering coefficient over the host link graph:
    ``2 * n_tri(v) / (deg(v) * (deg(v) - 1))`` (0.0 for deg < 2).

    Same forward node-iterator core as :func:`host_triangles`, but the
    verify phase attributes each confirmed triangle {p, q, r} to ALL
    THREE vertices (the triad candidate carries its generating vertex
    ``p`` through the side-tagged exchange), so the exchanges stay the
    same three plus one (vertex, n_tri) count merge and one degree
    count — five lean string-keyed exchanges total, no per-vertex
    neighborhood intersection.

    Float discipline: the coefficient is ONE correctly-rounded double
    division of two exact int64 products, mirrored verbatim in the SQL
    twin (pipelines/mining.sql_host_clustering). Returns one row per
    host (including triangle-free and isolated-in-edge-list hosts):
    ``(host, degree, n_tri, clustering)``."""
    import pandas as pd

    from nacc_form_validator_ray.stages.partition import (grouped_agg_sum,
                                                          grouped_apply)

    edges = _host_edge_list(ds, url_column, links_column,
                            num_partitions)
    empty = pd.DataFrame({
        "host": pd.Series([], dtype=object),
        "degree": pd.Series([], dtype=np.int64),
        "n_tri": pd.Series([], dtype=np.int64),
        "clustering": pd.Series([], dtype=np.float64)})
    if edges.count() == 0:
        return empty

    def deg_partial(part: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([part["a"], part["b"]])
        vc = both.value_counts()
        return pd.DataFrame({"host": vc.index.to_numpy(object),
                             "degree": vc.to_numpy(np.int64)})

    deg = grouped_agg_sum(
        edges.map_batches(deg_partial, batch_format="pandas"),
        ["host"], ["degree"], num_partitions=num_partitions).to_pandas()

    def triads(part: pd.DataFrame) -> pd.DataFrame:
        ps, xs, ys = [], [], []
        for p, g in part.groupby("a", sort=False):
            nb = np.sort(g["b"].to_numpy())
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            ps.append(np.full(len(i), p, dtype=object))
            xs.append(nb[i])
            ys.append(nb[j])
        if not xs:
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object),
                                 "p": pd.Series([], dtype=object),
                                 "side": pd.Series([], dtype=np.int8)})
        return pd.DataFrame({"a": np.concatenate(xs),
                             "b": np.concatenate(ys),
                             "p": np.concatenate(ps),
                             "side": np.int8(0)})

    cands = grouped_apply(edges, ["a"], triads,
                          num_partitions=num_partitions)

    def tag_edges(part: pd.DataFrame) -> pd.DataFrame:
        part = part.copy()
        part["p"] = ""          # schema-align with candidates
        part["side"] = np.int8(1)
        return part

    tagged = edges.map_batches(tag_edges, batch_format="pandas")

    def vertex_partial(part: pd.DataFrame) -> pd.DataFrame:
        e = part.loc[part["side"] == 1, ["a", "b"]]
        c = part.loc[part["side"] == 0, ["a", "b", "p"]]
        out = pd.DataFrame({"host": pd.Series([], dtype=object),
                            "n_tri": pd.Series([], dtype=np.int64)})
        if len(e) == 0 or len(c) == 0:
            return out
        hit = c.merge(e.drop_duplicates(), on=["a", "b"], how="inner")
        if not len(hit):
            return out
        verts = pd.concat([hit["p"], hit["a"], hit["b"]])
        vc = verts.value_counts()
        return pd.DataFrame({"host": vc.index.to_numpy(object),
                             "n_tri": vc.to_numpy(np.int64)})

    tri_partials = grouped_apply(cands.union(tagged), ["a", "b"],
                                 vertex_partial,
                                 num_partitions=num_partitions)
    tri = grouped_agg_sum(tri_partials, ["host"], ["n_tri"],
                          num_partitions=num_partitions).to_pandas()
    if "host" not in tri.columns:   # all-empty exchange loses schema
        tri = pd.DataFrame({"host": pd.Series([], dtype=object),
                            "n_tri": pd.Series([], dtype=np.int64)})
    out = deg.merge(tri, on="host", how="left")
    nt = out["n_tri"].fillna(0).to_numpy(np.int64)
    dg = out["degree"].to_numpy(np.int64)
    denom = dg * (dg - 1)
    cc = np.zeros(len(out), dtype=np.float64)
    nz = denom > 0
    cc[nz] = (2 * nt[nz]) / denom[nz]
    return pd.DataFrame({"host": out["host"].to_numpy(object),
                         "degree": dg, "n_tri": nt,
                         "clustering": cc}) \
        .sort_values("host", kind="stable").reset_index(drop=True)


def host_kcore(ds, k: int = 4, rounds: int = 6,
               url_column: str = "url", links_column: str = "links",
               num_partitions: int = 32):
    """k-core of the host link graph by iterative peeling — the OTHER
    iterative-graph fixpoint shape (vertex REMOVAL, not value
    propagation): per round, drop every vertex with fewer than ``k``
    LIVE neighbors until stable.

    Exactly ``rounds`` peels run (peeling is idempotent once
    converged), so the DuckDB twin — the same fixed chain of
    MATERIALIZED CTEs — is bit-identical without cross-engine
    termination-detection parity. The fixture converges in 2-3 rounds;
    raise ``rounds`` for deeper graphs (degeneracy peels can need more)
    — both sides take it as a parameter.

    Scale shape mirrors host_pagerank: the distinct undirected host
    edge list is built by ONE (a, b) exchange and materialized once;
    each round broadcasts the live-host set (the module's documented
    small side) via ``ray.put``, edge batches emit per-batch live-
    degree partials, and the driver merges O(hosts) counters — no
    per-round exchange at all. Returns a DataFrame {host} of k-core
    members (sorted)."""
    import pandas as pd
    import ray

    edges = _host_edge_list(ds, url_column, links_column,
                            num_partitions)

    live_ref = None  # round 0: every vertex is live

    def degree_partial(part: pd.DataFrame) -> pd.DataFrame:
        if live_ref is not None:
            live = ray.get(live_ref)
            ok = part["a"].isin(live) & part["b"].isin(live)
            part = part.loc[ok]
        vc = pd.concat([part["a"], part["b"]]).value_counts()
        return pd.DataFrame({"host": vc.index.to_numpy(object),
                             "deg": vc.to_numpy(np.int64)})

    live = frozenset()
    for rnd in range(rounds):
        partials = edges.map_batches(degree_partial,
                                     batch_format="pandas").to_pandas()
        # a fully-peeled round yields all-empty blocks, whose pandas
        # conversion loses the schema — that IS the empty core
        if partials.empty or "host" not in partials.columns:
            live = frozenset()
        else:
            deg = partials.groupby("host")["deg"].sum()
            live = frozenset(deg.index[deg >= k])
        if rnd < rounds - 1:  # the final live set has no reader
            live_ref = ray.put(live)

    # explicit object dtype: an empty core would otherwise infer
    # float64 and break dtype parity with the VARCHAR twin
    return pd.DataFrame({"host": pd.Series(sorted(live),
                                           dtype=object)})


def host_bfs(ds, rounds: int = 6,
             url_column: str = "url", links_column: str = "links",
             num_partitions: int = 32):
    """Single-source BFS levels over the undirected host link graph —
    the reachability/shortest-path member of the graph family (beside
    PageRank/HITS value propagation, k-core peeling, triangles).

    Source = the lexicographically smallest host among edge endpoints
    (deterministic and SQL-expressible). Each round broadcasts the
    (visited -> level) map and the current frontier via ``ray.put``
    (hosts are this module's documented small side); edge batches emit
    their frontier neighbors minus the visited set; the driver merges
    O(new hosts) rows and assigns the round's level. An empty frontier
    ends the walk — idempotent for the DuckDB twin, whose fixed
    MATERIALIZED-CTE chain likewise adds nothing once the frontier
    drains. Returns {host, dist} for hosts within ``rounds`` hops.

    Scale shape mirrors host_kcore: the lean edge list is materialized
    ONCE by a single (a, b) exchange; each round is one broadcast + one
    map pass + a driver merge of per-batch-unique new hosts — no
    per-round exchange."""
    import pandas as pd
    import ray

    edges = _host_edge_list(ds, url_column, links_column,
                            num_partitions)

    def min_partial(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return pd.DataFrame({"h": pd.Series([], dtype=object)})
        return pd.DataFrame({"h": pd.Series(
            [min(part["a"].min(), part["b"].min())], dtype=object)})

    empty = pd.DataFrame({"host": pd.Series([], dtype=object),
                          "dist": pd.Series([], dtype=np.int64)})
    mins = edges.map_batches(min_partial,
                             batch_format="pandas").to_pandas()
    if mins.empty or "h" not in mins.columns:
        return empty

    dist = {mins["h"].min(): 0}
    for rnd in range(1, rounds + 1):
        frontier = frozenset(h for h, d in dist.items()
                             if d == rnd - 1)
        if not frontier:
            break
        ref = ray.put((frozenset(dist), frontier))

        def expand(part: pd.DataFrame, ref=ref) -> pd.DataFrame:
            seen, front = ray.get(ref)
            na = part.loc[part["a"].isin(front), "b"]
            nb = part.loc[part["b"].isin(front), "a"]
            new = [h for h in pd.unique(pd.concat([na, nb]))
                   if h not in seen]
            return pd.DataFrame({"host": pd.Series(new, dtype=object)})

        found = edges.map_batches(expand,
                                  batch_format="pandas").to_pandas()
        if found.empty or "host" not in found.columns:
            continue
        for h in pd.unique(found["host"]):
            dist.setdefault(h, rnd)

    hosts = sorted(dist)
    return pd.DataFrame({
        "host": pd.Series(hosts, dtype=object),
        "dist": pd.Series([dist[h] for h in hosts], dtype=np.int64)})


def host_components(ds, rounds: int = 6,
                    url_column: str = "url", links_column: str = "links",
                    num_partitions: int = 32):
    """Connected components of the undirected host link graph by
    min-label propagation WITH pointer jumping — the label-convergence
    member of the graph family (vs. BFS's single-source levels).

    Update rule, identical on both engines, per round::

        lbl'(v) = least(lbl(v), min_{u in N(v)} lbl(u), lbl(lbl(v)))

    The third term is one pointer-jump (labels are always vertex names
    — the min of vertex names is a vertex name — so ``lbl(lbl(v))`` is
    always defined), which turns the linear-diameter plain propagation
    into O(log d) convergence (Shiloach-Vishkin-style shortcutting).
    Exactly ``rounds`` rounds run on BOTH engines: the update is
    idempotent at the fixpoint, so parity never depends on
    termination detection, and the partial fixpoint is bit-identical
    even before convergence. The vertex set is page hosts UNION edge
    endpoints (external link targets form components too).

    Scale shape mirrors host_kcore: the lean undirected edge list is
    built by ONE (a, b) exchange and materialized once; each round
    broadcasts the label map (hosts are this module's documented small
    side) via ``ray.put``, edge batches emit per-batch (host,
    min-neighbor-label) partials, and the driver merges O(hosts) rows
    — no per-round exchange. Returns {host, component} (component =
    the lexicographically smallest reachable host after ``rounds``
    shortcutted rounds), sorted by host."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    edges = _host_edge_list(ds, url_column, links_column,
                            num_partitions)

    def page_hosts(t: "pa.Table") -> pd.DataFrame:
        h = _host_of(t[url_column], pc).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"h": pd.unique(pd.Series(h, dtype=object))})

    hosts_df = ds.map_batches(page_hosts,
                              batch_format="pyarrow").to_pandas()
    edges_df_heads = edges.map_batches(
        lambda p: pd.DataFrame({
            "h": pd.unique(pd.concat([p["a"], p["b"]], ignore_index=True))
        }) if len(p) else pd.DataFrame({"h": pd.Series([], dtype=object)}),
        batch_format="pandas").to_pandas()
    vs: list = []
    for frame in (hosts_df, edges_df_heads):
        if not frame.empty and "h" in frame.columns:
            vs.extend(frame["h"].tolist())
    vertices = sorted(set(vs))
    lbl = {v: v for v in vertices}

    for _ in range(rounds):
        ref = ray.put(lbl)

        def nbr_min(part: pd.DataFrame, ref=ref) -> pd.DataFrame:
            if part.empty:
                return pd.DataFrame({"host": pd.Series([], dtype=object),
                                     "m": pd.Series([], dtype=object)})
            cur = ray.get(ref)
            la = part["a"].map(cur)
            lb = part["b"].map(cur)
            cand = pd.DataFrame({
                "host": pd.concat([part["a"], part["b"]],
                                  ignore_index=True),
                "m": pd.concat([lb, la], ignore_index=True)})
            # per-batch combiner: one row per host
            return cand.groupby("host", as_index=False)["m"].min()

        partials = edges.map_batches(nbr_min,
                                     batch_format="pandas").to_pandas()
        nbr = {}
        if not partials.empty and "host" in partials.columns:
            nbr = partials.groupby("host")["m"].min().to_dict()
        lbl = {v: min(l, nbr.get(v, l), lbl[l])
               for v, l in lbl.items()}

    return pd.DataFrame({
        "host": pd.Series(vertices, dtype=object),
        "component": pd.Series([lbl[v] for v in vertices],
                               dtype=object)})


def host_label_propagation(ds, rounds: int = 4,
                           url_column: str = "url",
                           links_column: str = "links",
                           num_partitions: int = 32):
    """Community detection on the undirected host link graph by
    SYNCHRONOUS label propagation (Raghavan et al. 2007, public) with
    a deterministic tie-break. Update rule, identical on both engines,
    per round::

        lbl'(v) = argmax_l |{u in N(v) : lbl(u) = l}|
                  (tie -> lexicographically smallest l);
                  lbl(v) if v has no neighbors

    Exactly ``rounds`` rounds run on BOTH engines — synchronous LPA
    can oscillate on bipartite structure, so parity comes from the
    fixed round count (same contract as :func:`host_components`), not
    from termination detection.

    Scale shape mirrors host_components: the lean undirected edge
    list is materialized once; each round broadcasts the label map
    via ``ray.put``, edge batches emit per-batch (host, label, count)
    partials, and the driver computes the O(hosts)-row mode — no
    per-round exchange. Returns {host, community} sorted by host."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    edges = _host_edge_list(ds, url_column, links_column,
                            num_partitions)

    def page_hosts(t):
        h = _host_of(t[url_column], pc).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"h": pd.unique(pd.Series(h, dtype=object))})

    hosts_df = ds.map_batches(page_hosts,
                              batch_format="pyarrow").to_pandas()
    heads = edges.map_batches(
        lambda p: pd.DataFrame({
            "h": pd.unique(pd.concat([p["a"], p["b"]],
                                     ignore_index=True))
        }) if len(p) else pd.DataFrame({"h": pd.Series([], dtype=object)}),
        batch_format="pandas").to_pandas()
    vs: list = []
    for frame in (hosts_df, heads):
        if not frame.empty and "h" in frame.columns:
            vs.extend(frame["h"].tolist())
    vertices = sorted(set(vs))
    lbl = {v: v for v in vertices}

    for _ in range(rounds):
        ref = ray.put(lbl)

        def nbr_counts(part: pd.DataFrame, ref=ref) -> pd.DataFrame:
            if part.empty:
                return pd.DataFrame({"host": pd.Series([], dtype=object),
                                     "l": pd.Series([], dtype=object),
                                     "c": pd.Series([], dtype=np.int64)})
            cur = ray.get(ref)
            la = part["a"].map(cur)
            lb = part["b"].map(cur)
            cand = pd.DataFrame({
                "host": pd.concat([part["a"], part["b"]],
                                  ignore_index=True),
                "l": pd.concat([lb, la], ignore_index=True)})
            out = cand.groupby(["host", "l"], as_index=False).size() \
                .rename(columns={"size": "c"})
            out["c"] = out["c"].astype(np.int64)
            return out

        partials = edges.map_batches(nbr_counts,
                                     batch_format="pandas").to_pandas()
        if partials.empty or "host" not in partials.columns:
            break
        cnt = partials.groupby(["host", "l"], as_index=False)["c"].sum()
        # mode with min-label tie-break: sort by (count desc, label asc)
        cnt = cnt.sort_values(["host", "c", "l"],
                              ascending=[True, False, True])
        winner = cnt.drop_duplicates("host").set_index("host")["l"]
        lbl = {v: winner.get(v, l) for v, l in lbl.items()}

    return pd.DataFrame({
        "host": pd.Series(vertices, dtype=object),
        "community": pd.Series([lbl[v] for v in vertices],
                               dtype=object)})


def mutual_host_links(ds, url_column: str = "url",
                      links_column: str = "links",
                      num_partitions: int = 32):
    """Reciprocal host pairs of the DIRECTED link graph: (a, b) with
    a < b where host a links host b AND host b links host a — the
    mutual-citation signal (link-farm detection uses exactly this).

    ONE exchange: batches emit locally-distinct directed edges tagged
    with their orientation against the canonical (min, max) key; the
    partition dedups directed edges globally (same canonical pair
    always lands together) and keeps pairs with both orientations.
    Returns {a, b} sorted."""
    import pandas as pd

    from nacc_form_validator_ray.stages.partition import grouped_apply

    def both_ways(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype=object),
                              "b": pd.Series([], dtype=object)})
        if part.empty:
            return empty
        part = part.drop_duplicates(["a", "b", "fwd"])
        g = part.groupby(["a", "b"], as_index=False)["fwd"].nunique()
        out = g.loc[g["fwd"] == 2, ["a", "b"]]
        return out if len(out) else empty

    return grouped_apply(
        ds.map_batches(
            lambda t: _canonical_edge_frame(t, url_column,
                                            links_column,
                                            with_orientation=True),
            batch_format="pyarrow"),
        ["a", "b"], both_ways, num_partitions=num_partitions)


def host_degree_assortativity(ds, url_column: str = "url",
                              links_column: str = "links",
                              num_partitions: int = 32) -> "pd.DataFrame":
    """Degree assortativity coefficient of the undirected host graph
    (Newman 2002): the Pearson correlation of (deg u, deg v) over every
    edge counted in BOTH directions — positive means hubs link hubs,
    negative means hub-and-spoke (the typical web shape).

    Exact-moments discipline (repo convention): degrees are exact ints
    (driver merge of per-batch endpoint counts over the ONE-exchange
    distinct edge list), the degree vector is broadcast via ``ray.put``,
    edge batches emit int64 moment partials (n, Σx, Σxx, Σxy — x/y
    symmetric so Σy = Σx, Σyy = Σxx), the driver merges them in
    arbitrary-precision Python ints, and r is ONE deterministic double
    expression with INTEGER zero-variance guards pinned to 0.0 (same
    rationale as value_regression_events). Returns one row
    {n_pairs, assortativity}."""
    import pandas as pd
    import ray

    edges = _host_edge_list(ds, url_column, links_column,
                            num_partitions)

    def degree_partial(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return pd.DataFrame({"host": pd.Series([], dtype=object),
                                 "deg": pd.Series([], dtype=np.int64)})
        vc = pd.concat([part["a"], part["b"]]).value_counts()
        return pd.DataFrame({"host": vc.index.to_numpy(object),
                             "deg": vc.to_numpy(np.int64)})

    partials = edges.map_batches(degree_partial,
                                 batch_format="pandas").to_pandas()
    if partials.empty or "host" not in partials.columns:
        return pd.DataFrame({"n_pairs": pd.Series([0], dtype=np.int64),
                             "assortativity": pd.Series([0.0])})
    deg = partials.groupby("host")["deg"].sum().to_dict()
    ref = ray.put(deg)

    def moment_partial(part: pd.DataFrame, ref=ref) -> pd.DataFrame:
        d = ray.get(ref)
        if part.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64)
                 for c in ["n", "sx", "sxx", "sxy"]})
        du = part["a"].map(d).to_numpy(np.int64)
        dv = part["b"].map(d).to_numpy(np.int64)
        # both directions: x gets du and dv once each
        return pd.DataFrame({
            "n": [2 * len(part)],
            "sx": [int(du.sum() + dv.sum())],
            "sxx": [int((du * du).sum() + (dv * dv).sum())],
            "sxy": [int(2 * (du * dv).sum())]})

    m = edges.map_batches(moment_partial,
                          batch_format="pandas").to_pandas()
    n = int(sum(int(v) for v in m["n"]))
    sx = sum(int(v) for v in m["sx"])
    sxx = sum(int(v) for v in m["sxx"])
    sxy = sum(int(v) for v in m["sxy"])
    if n == 0 or n * sxx - sx * sx == 0:
        r = 0.0
    else:
        num = float(n) * float(sxy) - float(sx) * float(sx)
        den = (float(n) * float(sxx) - float(sx) * float(sx))
        r = num / den
    return pd.DataFrame({"n_pairs": pd.Series([n], dtype=np.int64),
                         "assortativity": pd.Series([r])})


def host_reciprocity(ds, url_column: str = "url",
                     links_column: str = "links",
                     num_partitions: int = 32) -> "pd.DataFrame":
    """Link reciprocity of the directed host graph: the fraction of
    undirected host pairs with edges in BOTH directions — the global
    scalar behind mutual_host_links (link-farm corpora score high).
    ONE canonical-pair exchange carrying orientation flags; each
    partition emits a 2-int partial (pairs seen, mutual pairs); the
    driver sum and the ratio division are exact. Empty graphs return
    the defined (0, 0, 0.0) row."""
    import pandas as pd

    from nacc_form_validator_ray.stages.partition import grouped_apply

    def count_part(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return pd.DataFrame({
                "n_pairs": pd.Series([], dtype=np.int64),
                "n_mutual": pd.Series([], dtype=np.int64)})
        part = part.drop_duplicates(["a", "b", "fwd"])
        g = part.groupby(["a", "b"])["fwd"].nunique()
        return pd.DataFrame({
            "n_pairs": [np.int64(len(g))],
            "n_mutual": [np.int64(int((g == 2).sum()))]})

    parts = grouped_apply(
        ds.map_batches(
            lambda t: _canonical_edge_frame(t, url_column,
                                            links_column,
                                            with_orientation=True),
            batch_format="pyarrow"),
        ["a", "b"], count_part,
        num_partitions=num_partitions).to_pandas()
    if parts.empty or "n_pairs" not in parts.columns:
        n_pairs = n_mutual = 0
    else:
        n_pairs = int(parts["n_pairs"].sum())
        n_mutual = int(parts["n_mutual"].sum())
    rec = (float(n_mutual) / float(n_pairs)) if n_pairs else 0.0
    return pd.DataFrame({
        "n_pairs": pd.Series([n_pairs], dtype=np.int64),
        "n_mutual": pd.Series([n_mutual], dtype=np.int64),
        "reciprocity": pd.Series([rec], dtype=np.float64)})
