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

Scale shape: the edge table is built once (lean: two host strings per
edge), out-degrees ride one grouped sum, and every iteration is one
distributed hash join (ranks onto edges by src) plus one grouped-sum
exchange (contributions by dst, union-ed with the per-node teleport
rows so no left join is needed). At 10^12 documents the host universe
is ~10^8 — the rank table stays exchange-sized, never driver-sized.
"""

from __future__ import annotations

import numpy as np

#: fixed-point scale for rank values
PR_SCALE = 1 << 40
HOST_RE = r"^(?i:https?)://([^/?#]+)"


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


def host_pagerank(ds, url_column: str = "url",
                  links_column: str = "links",
                  iterations: int = 5, num_partitions: int = 32):
    """PageRank over the host graph induced by ``links``.

    Nodes are the distinct (normalized) hosts of the page URLs; edges
    are (page host -> link host) with multiplicity, restricted to link
    targets that are themselves page hosts. Returns a Dataset with
    ``host``, the fixed-point ``rank_fp`` (int64, scale 2**40) and the
    float ``rank`` (``rank_fp / 2**40`` — one correctly-rounded IEEE
    division, bit-identical in the SQL twin).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from nacc_form_validator_ray.stages.joins import hash_join
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

    def src_project(batch: "pa.Table") -> "pa.Table":
        return pa.table({"host": _host_of(batch[url_column], pc)})

    edges_raw = ds.map_batches(edge_project, batch_format="pyarrow")

    def distinct_hosts(part: "pa.Table") -> "pa.Table":
        return pa.TableGroupBy(part, ["host"]).aggregate([])

    nodes = grouped_apply(ds.map_batches(src_project,
                                         batch_format="pyarrow"),
                          ["host"], distinct_hosts,
                          num_partitions=num_partitions,
                          fn_format="pyarrow").materialize()
    n_nodes = nodes.count()
    r_init = PR_SCALE // n_nodes
    teleport = (r_init * 15) // 100

    # out-degree counts ALL outbound links (mass to external hosts is
    # lost, like mass to dangling hosts)
    def deg_partial(batch: "pa.Table") -> "pa.Table":
        g = pa.TableGroupBy(batch.select(["src"]), ["src"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["src", "outdeg"])

    outdeg = grouped_agg_sum(
        edges_raw.map_batches(deg_partial, batch_format="pyarrow"),
        ["src"], ["outdeg"], num_partitions=num_partitions)

    # keep only edges whose target is a known host; attach outdeg once
    def tag_dst(batch: "pa.Table") -> "pa.Table":
        return batch.rename_columns(["src", "host"])

    edges_in = hash_join(edges_raw.map_batches(
        tag_dst, batch_format="pyarrow"), nodes, on=["host"],
        num_partitions=num_partitions)

    def back(batch: "pa.Table") -> "pa.Table":
        return batch.rename_columns(["src", "dst"])

    edges = hash_join(edges_in.map_batches(back, batch_format="pyarrow"),
                      outdeg, on=["src"],
                      num_partitions=num_partitions).materialize()

    def init_rank(batch: "pa.Table") -> "pa.Table":
        return batch.append_column(
            "r", pa.array(np.full(batch.num_rows, r_init,
                                  dtype=np.int64)))

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow")

    def tele_rows(batch: "pa.Table") -> "pa.Table":
        return pa.table({
            "host": batch["host"],
            "part": pa.array(np.full(batch.num_rows, teleport,
                                     dtype=np.int64))})

    for _ in range(iterations):
        def rank_as_src(batch: "pa.Table") -> "pa.Table":
            return batch.rename_columns(["src", "r"])

        contribs = hash_join(
            edges, ranks.map_batches(rank_as_src,
                                     batch_format="pyarrow"),
            on=["src"], num_partitions=num_partitions)

        def contrib(batch: "pa.Table") -> "pa.Table":
            r = batch["r"].to_numpy().astype(np.int64, copy=False)
            d = batch["outdeg"].to_numpy().astype(np.int64, copy=False)
            part = (85 * r) // (100 * d)
            return pa.table({"host": batch["dst"],
                             "part": pa.array(part)})

        parts = contribs.map_batches(contrib, batch_format="pyarrow") \
            .union(nodes.map_batches(tele_rows, batch_format="pyarrow"))
        summed = grouped_agg_sum(parts, ["host"], ["part"],
                                 num_partitions=num_partitions)

        def as_rank(batch: "pa.Table") -> "pa.Table":
            return batch.rename_columns(["host", "r"])

        ranks = summed.map_batches(as_rank,
                                   batch_format="pyarrow").materialize()

    def final(batch: "pa.Table") -> "pa.Table":
        r = batch["r"].to_numpy().astype(np.int64, copy=False)
        return pa.table({"host": batch["host"],
                         "rank_fp": pa.array(r),
                         "rank": pa.array(r.astype(np.float64)
                                          / float(PR_SCALE))})

    return ranks.map_batches(final, batch_format="pyarrow")
