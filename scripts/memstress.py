"""Memory-pressure stress run (round-4 VERDICT item 2).

Generates the largest deterministic page corpus the box tolerates
(default 5M pages, ~6.5 GB parquet — several times a deliberately
small object store) and runs the flagship quality filter AND the full
pretrain composition end-to-end under a CONSTRAINED object store
(default 4 GB), so streaming execution must run with backpressure and
object spilling active rather than holding the corpus in plasma.

Evidence captured per pipeline: wall time, docs/s, and the cluster's
own spill/restore counters (ray's memory_summary) — proving the
100×-scale claim's core mechanism (blocks stream through a bounded
store and spill to disk) on a real run, not by design argument.

Usage: python scripts/memstress.py [--pages 5000000]
                                   [--object-store-gb 4]
Writes MEMSTRESS_r05.json at the repo root and prints one JSON line.
"""

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def spill_stats() -> dict:
    """Spill/restore counters parsed from the raylet's own session
    logs (debug_state.txt + raylet.out). ray's memory_summary API
    needs grpcio, which this container does not ship; the raylet's
    periodically-dumped state file carries the same cumulative
    counters."""
    import glob

    import ray
    try:
        session = ray._private.worker._global_node \
            .get_session_dir_path()
    except Exception:
        session = "/tmp/ray/ray/session_latest"
    out = {"session": os.path.basename(session)}
    ds = os.path.join(session, "logs", "debug_state.txt")
    if os.path.exists(ds):
        txt = open(ds).read()
        for key, pat in (
                ("cumulative_spill_requests",
                 r"cumulative spill requests: (\d+)"),
                ("bytes_currently_spilled",
                 r"num bytes currently spilled: (\d+)"),
                ("bytes_pending_spill",
                 r"num bytes pending spill: (\d+)"),
                ("restored_bytes", r"cumulative restored bytes: (\d+)"),
                ("restore_requests",
                 r"cumulative restore requests: (\d+)")):
            m = re.search(pat, txt)
            if m:
                out[key] = int(m.group(1))
    for raylet in glob.glob(os.path.join(session, "logs",
                                         "raylet*.out")):
        for line in open(raylet, errors="replace"):
            m = re.search(r"Spilled (\d+) MiB, (\d+) objects", line)
            if m:
                out["spilled_mib"] = int(m.group(1))
                out["spilled_objects"] = int(m.group(2))
            m = re.search(r"Restored (\d+) MiB, (\d+) objects", line)
            if m:
                out["restored_mib"] = int(m.group(1))
                out["restored_objects"] = int(m.group(2))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=5_000_000)
    ap.add_argument("--object-store-gb", type=float, default=4.0)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "MEMSTRESS_r05.json"))
    args = ap.parse_args()

    os.environ["GRAFT_BENCH_PAGES"] = str(args.pages)
    import ray
    ray.init(address="local", num_cpus=args.cpus,
             object_store_memory=int(args.object_store_gb * 2**30),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import bench

    t0 = time.perf_counter()
    corpus = bench.pages_dir(args.pages)
    gen_sec = round(time.perf_counter() - t0, 1)
    corpus_bytes = sum(
        os.path.getsize(os.path.join(corpus, f))
        for f in os.listdir(corpus)
        if os.path.isfile(os.path.join(corpus, f)))

    result = {
        "metric": "memory-pressure stress: flagship + pretrain over "
                  f"{args.pages} pages with a "
                  f"{args.object_store_gb:g} GiB object store",
        "unit": "sec",
        "pages": args.pages,
        "corpus_parquet_gb": round(corpus_bytes / 2**30, 2),
        "object_store_gb": args.object_store_gb,
        "num_cpus": args.cpus,
        "gen_sec": gen_sec,
        "queries": {},
    }

    # 1) flagship quality filter, streamed to a count sink
    t0 = time.perf_counter()
    n = bench.run_quality_filter_pages("/root/testdata/sf0.1")
    sec = round(time.perf_counter() - t0, 1)
    result["queries"]["quality_filter_pages"] = sec
    result["flagship_docs_per_sec"] = round(n / sec, 1)
    result["flagship_pages"] = n
    result["spill_after_flagship"] = spill_stats()

    # 2) full pretrain composition with stage checkpoints to disk
    import shutil
    out_dir = "/tmp/nfvr_memstress_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    from nacc_form_validator_ray.pipelines.pretrain import run_pretrain
    t0 = time.perf_counter()
    stats = run_pretrain(corpus, out_dir, resume=False)
    sec = round(time.perf_counter() - t0, 1)
    result["queries"]["pretrain_pages"] = sec
    result["pretrain_stats"] = {k: v for k, v in stats.items()
                                if isinstance(v, (int, float, str))}
    result["pretrain_docs_per_sec"] = round(args.pages / sec, 1)
    result["spill_after_pretrain"] = spill_stats()
    shutil.rmtree(out_dir, ignore_errors=True)

    result["value"] = round(sum(result["queries"].values()), 1)
    line = json.dumps(result)
    with open(args.out, "w") as f:
        f.write(line + "\n")
    print(line)
    ray.shutdown()


if __name__ == "__main__":
    main()
