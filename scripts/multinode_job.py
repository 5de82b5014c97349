"""Workload entrypoint for the simulated multi-node scaling runs.

Runs INSIDE an already-started `ray start` cluster: attaches with
``ray.init(address="auto")`` (the container lacks ray[default]/aiohttp,
so `ray job submit`'s HTTP job server cannot start — a driver process
attaching to the head's GCS is the same execution path minus the HTTP
layer: tasks are scheduled across the cluster's raylets and exchanges
cross per-node object stores).

Workloads (the round-4 verdict's requested set): the flagship
quality-filter over the cached page corpus, the pretrain composition
(filter -> scrub -> exact dedup -> near dedup), and three
exchange-heavy registry lines (q3_shipping_priority, dup_ngram_spans,
host_pagerank) over an sf dir.

Prints ONE JSON line and writes it to --out. Evidence fields:
``nodes`` (alive node count), ``nodes_used_flagship`` (distinct node
ids that executed flagship map tasks — proof the work actually spread
across node boundaries rather than staying on one raylet).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def probe_nodes_used(pages_path: str) -> int:
    """Distinct raylet node ids that execute a map over the corpus."""
    import ray
    import ray.data as rd

    def nid(b):
        import pyarrow as pa
        import ray as r
        return pa.table(
            {"node": [r.get_runtime_context().get_node_id()]})

    ds = rd.read_parquet(pages_path, columns=["url"]) \
        .map_batches(nid, batch_format="pyarrow")
    return len(ds.unique("node"))


def probe_cross_node_transfer(mib: int = 64) -> dict:
    """Definitive object-store-boundary proof: a task PINNED to one
    worker node produces a `mib`-MiB block; a task pinned to a
    DIFFERENT node consumes it. The consume can only succeed via an
    object-manager transfer between the two plasma stores. Returns the
    two node ids and the transfer wall time."""
    import time as _t

    import numpy as np
    import ray
    from ray.util.scheduling_strategies import (
        NodeAffinitySchedulingStrategy)

    cpu_nodes = [n["NodeID"] for n in ray.nodes()
                 if n["Alive"] and n["Resources"].get("CPU")]
    if len(cpu_nodes) < 2:
        return {"skipped": "needs >=2 cpu nodes"}

    @ray.remote(num_cpus=1)
    def produce(nbytes: int):
        return np.zeros(nbytes, dtype=np.uint8)

    @ray.remote(num_cpus=1)
    def consume(arr):
        import ray as r
        return (int(arr.sum()),
                r.get_runtime_context().get_node_id())

    ref = produce.options(scheduling_strategy=
                          NodeAffinitySchedulingStrategy(
                              cpu_nodes[0], soft=False)) \
        .remote(mib * 2**20)
    ray.wait([ref])  # block is sealed in node 0's plasma store
    t0 = _t.perf_counter()
    s, consumer_node = ray.get(
        consume.options(scheduling_strategy=
                        NodeAffinitySchedulingStrategy(
                            cpu_nodes[1], soft=False)).remote(ref))
    dt = _t.perf_counter() - t0
    return {"mib": mib, "producer_node": cpu_nodes[0][:12],
            "consumer_node": consumer_node[:12],
            "crossed_nodes": consumer_node != cpu_nodes[0],
            "transfer_plus_consume_sec": round(dt, 3),
            "checksum_ok": s == 0}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-dir", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--label", default="")
    ap.add_argument("--skip-sf", action="store_true",
                    help="only the page-corpus workloads (flagship, "
                         "pretrain)")
    ap.add_argument("--flagship-only", action="store_true",
                    help="drop pretrain from the workload set (big-"
                         "corpus runs where pretrain would dominate "
                         "wall time)")
    ap.add_argument("--big", action="store_true",
                    help="exchange-heavy operators at corpus scale "
                         "(exact dedup, line dedup, host pagerank) "
                         "instead of the default workload set")
    args = ap.parse_args()

    import ray
    ray.init(address="auto", logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    alive = [n for n in ray.nodes() if n["Alive"]]
    cpus = int(ray.cluster_resources().get("CPU", 0))

    # bench reads GRAFT_BENCH_PAGES at import time — set it first so
    # bench.pages_dir() resolves to the orchestrator's cached corpus
    os.environ["GRAFT_BENCH_PAGES"] = \
        os.path.basename(args.pages_dir).split("_")[1]
    import bench
    from nacc_form_validator_ray.pipelines.pretrain import \
        build_pretrain_pipeline
    from nacc_form_validator_ray.stages.dedup import reclaim_pin_dirs

    def flagship() -> int:
        return bench.run_quality_filter_pages(args.sf_dir)

    def pretrain() -> int:
        import ray.data as rd
        pages = rd.read_parquet(args.pages_dir)
        n = build_pretrain_pipeline(pages).count()
        reclaim_pin_dirs()
        return n

    def pages_docs():
        """(doc_id, text) over the page corpus — the dedup contract's
        id comes from the url md5-prefix convention."""
        import pyarrow as pa
        import ray.data as rd

        from nacc_form_validator_ray.stages.dedup import md5_prefix60

        def add_id(t):
            return pa.table({
                "doc_id": pa.array(
                    md5_prefix60(t["url"].combine_chunks())),
                "text": t["text"].combine_chunks()})

        return rd.read_parquet(args.pages_dir,
                               columns=["url", "text"]) \
            .map_batches(add_id, batch_format="pyarrow")

    def exact_dedup_pages() -> int:
        from nacc_form_validator_ray.stages.dedup import exact_dedup
        n = exact_dedup(pages_docs(), pin="none").count()
        reclaim_pin_dirs()
        return n

    def line_dedup_pages() -> int:
        from nacc_form_validator_ray.stages.dedup import line_dedup
        return line_dedup(pages_docs()).count()

    def host_pagerank_links() -> int:
        import ray.data as rd

        from nacc_form_validator_ray.stages.graph import host_pagerank
        link_dir = args.pages_dir.replace("pages_", "linkpages_") \
            + "_v2"
        ds = rd.read_parquet(link_dir, columns=["url", "links"])
        return host_pagerank(ds).count()

    if args.big:
        workloads = {"exact_dedup_pages": exact_dedup_pages,
                     "line_dedup_pages": line_dedup_pages,
                     "host_pagerank_links": host_pagerank_links}
    elif args.flagship_only:
        workloads = {"quality_filter_pages": flagship}
    else:
        workloads = {"quality_filter_pages": flagship,
                     "pretrain_pages": pretrain}
    if not args.skip_sf and not args.big and not args.flagship_only:
        import __ray_entry__ as entrymod
        qs = entrymod.queries()

        def consume(name):
            def run() -> int:
                r = qs[name](args.sf_dir)
                if hasattr(r, "iter_batches"):
                    return sum(
                        b.num_rows for b in r.iter_batches(
                            batch_size=8192, batch_format="pyarrow"))
                return len(r)
            return run

        for name in ("q3_shipping_priority", "dup_ngram_spans",
                     "host_pagerank"):
            workloads[name] = consume(name)

    timings, rows = {}, {}
    n_pages = 0
    for name, fn in workloads.items():
        best = None
        for _ in range(max(args.reps, 1)):
            t0 = time.perf_counter()
            n = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            rows[name] = int(n)
        timings[name] = round(best, 3)
        if name == "quality_filter_pages":
            n_pages = rows[name]

    result = {
        "metric": "multinode cluster workload seconds (best-of-%d)"
                  % max(args.reps, 1),
        "label": args.label,
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "sf": args.sf_dir,
        "pages_dir": args.pages_dir,
        "num_cpus": cpus,
        "nodes": len(alive),
        "nodes_with_cpu": len([n for n in alive
                               if n["Resources"].get("CPU")]),
        "nodes_used_flagship": probe_nodes_used(args.pages_dir),
        "cross_node_transfer": probe_cross_node_transfer(),
        "pages": n_pages,
        "docs_per_sec": round(
            n_pages / timings["quality_filter_pages"], 1)
        if timings.get("quality_filter_pages") else None,
    }
    line = json.dumps(result)
    with open(args.out, "w") as f:
        f.write(line + "\n")
    print(line)
    ray.shutdown()


if __name__ == "__main__":
    main()
