"""Simulated multi-node N -> 4N scaling sweep with REAL node boundaries.

Stands up a same-box Ray cluster — `ray start --head --num-cpus=0` plus
k resource-limited worker processes (`ray start --address=...
--num-cpus=4 --object-store-memory=...`, each with its own raylet AND
its own plasma object store) — then runs scripts/multinode_job.py
against it in a fresh driver process. Every exchange between blocks on
different workers crosses a real object-store/object-manager boundary
(localhost TCP), unlike the single-session `bench.py --scaling` proxy
where all workers share one plasma store.

The criterion pair is 2 worker nodes vs 8 worker nodes at 4 CPUs each
(N -> 4N nodes, fixed per-node shape). Configs are INTERLEAVED across
repeats (2n, 8n, 2n, 8n, ...) so this microVM's minute-scale speed
drift cannot bias one side; each config keeps its per-workload best.

`ray job submit` itself needs the ray[default] dashboard/job server
(aiohttp), which this container does not ship and cannot pip-install —
the job is therefore launched as a separate OS process that attaches
via ``ray.init(address="auto")``, which exercises the identical
scheduling/transfer path (GCS -> raylets -> per-node plasma).

Usage: python scripts/multinode_scaling.py [--pages 960000] [--reps 2]
Writes MULTINODE_r05.json at the repo root and prints one JSON line.

WARNING: the cluster teardown between repeats is ``ray stop --force``,
which kills EVERY Ray process on the box — do not run this while any
other local Ray session (pytest, bench, a notebook) is alive.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEAD_PORT = 6379


def sh(cmd, env=None, timeout=600):
    return subprocess.run(cmd, capture_output=True, text=True,
                          env=env, timeout=timeout)


def stop_cluster():
    sh(["ray", "stop", "--force"])
    time.sleep(2)


def start_cluster(n_workers: int, cpus_per_worker: int,
                  obj_store_bytes: int) -> None:
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    r = sh(["ray", "start", "--head", f"--port={HEAD_PORT}",
            "--num-cpus=0", "--object-store-memory=2000000000",
            "--disable-usage-stats"], env=env)
    if r.returncode != 0:
        raise RuntimeError(f"head start failed: {r.stderr[-2000:]}")
    for i in range(n_workers):
        wenv = dict(env, RAY_TMPDIR=f"/tmp/ray_worker_{i}")
        r = sh(["ray", "start", f"--address=127.0.0.1:{HEAD_PORT}",
                f"--num-cpus={cpus_per_worker}",
                f"--object-store-memory={obj_store_bytes}",
                "--disable-usage-stats"], env=wenv)
        if r.returncode != 0:
            raise RuntimeError(
                f"worker {i} start failed: {r.stderr[-2000:]}")
    # wait until every worker raylet has registered
    deadline = time.time() + 60
    import re
    while time.time() < deadline:
        out = sh(["ray", "status"], env=env).stdout
        m = re.findall(r"^ 1 node_", out, re.M)
        if len(m) >= n_workers + 1:
            return
        time.sleep(1)
    raise RuntimeError("cluster did not reach expected node count")


def ensure_fixture(pages: int) -> str:
    path = f"/tmp/nfvr_bench/pages_{pages}_42"
    if not os.path.exists(os.path.join(path, "_DONE")) or \
            not os.path.exists(os.path.join(path, "_ppl_model.json")):
        env = dict(os.environ, GRAFT_BENCH_PAGES=str(pages),
                   PYTHONPATH=REPO)
        code = ("import bench; bench._init_ray(32); "
                "bench._ppl_model(bench.pages_dir()); "
                "import ray; ray.shutdown()")
        r = sh([sys.executable, "-c", code], env=env, timeout=1800)
        if r.returncode != 0:
            raise RuntimeError(f"fixture gen failed: {r.stderr[-2000:]}")
    return path


def run_job(pages_dir: str, sf_dir: str, label: str, reps: int,
            skip_sf: bool, big: bool = False,
            flagship_only: bool = False) -> dict:
    out = f"/tmp/multinode_{label}.json"
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("RAY_ADDRESS", None)
    cmd = [sys.executable, os.path.join(REPO, "scripts/multinode_job.py"),
           "--pages-dir", pages_dir, "--sf-dir", sf_dir,
           "--out", out, "--label", label, "--reps", str(reps)]
    if skip_sf:
        cmd.append("--skip-sf")
    if big:
        cmd.append("--big")
    if flagship_only:
        cmd.append("--flagship-only")
    r = sh(cmd, env=env, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(
            f"job {label} failed:\n{r.stdout[-1500:]}\n{r.stderr[-3000:]}")
    return json.load(open(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=960_000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2,
                    help="outer interleaved cluster repeats")
    ap.add_argument("--job-reps", type=int, default=2,
                    help="inner best-of repeats per workload")
    ap.add_argument("--cpus-per-worker", type=int, default=4)
    ap.add_argument("--workers-low", type=int, default=2)
    ap.add_argument("--workers-high", type=int, default=8)
    ap.add_argument("--skip-sf", action="store_true")
    ap.add_argument("--big", action="store_true",
                    help="exchange-heavy corpus-scale workload set")
    ap.add_argument("--flagship-only", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "MULTINODE_r05.json"))
    args = ap.parse_args()

    headline = "exact_dedup_pages" if args.big \
        else "quality_filter_pages"
    pages_dir = ensure_fixture(args.pages)
    lo_label = f"{args.workers_low}nodes"
    hi_label = f"{args.workers_high}nodes"
    factor = args.workers_high / args.workers_low
    configs = [(lo_label, args.workers_low),
               (hi_label, args.workers_high)]
    best: dict = {}

    for rep in range(max(args.reps, 1)):
        for label, n_workers in configs:
            stop_cluster()
            start_cluster(n_workers, args.cpus_per_worker,
                          obj_store_bytes=3_000_000_000)
            try:
                res = run_job(pages_dir, args.sf_dir,
                              f"{label}_rep{rep}", args.job_reps,
                              args.skip_sf, args.big,
                              args.flagship_only)
            finally:
                stop_cluster()
            if label not in best or \
                    res["queries"][headline] < \
                    best[label]["queries"][headline]:
                keep, drop = res, best.get(label)
            else:
                keep, drop = best[label], res
            # per-workload best across interleaved reps
            if drop is not None:
                for k, v in drop["queries"].items():
                    if v < keep["queries"].get(k, float("inf")):
                        keep["queries"][k] = v
            best[label] = keep
            print(f"[rep {rep}] {label}: "
                  f"{json.dumps(res['queries'])}", file=sys.stderr)

    lo, hi = best[lo_label], best[hi_label]
    # headline throughput basis: pages for the flagship set (pages
    # counted by the run), wall-time ratio for the --big operator set
    denom_lo = lo["pages"] or 1
    denom_hi = hi["pages"] or 1
    tp_lo = denom_lo / lo["queries"][headline]
    tp_hi = denom_hi / hi["queries"][headline]
    queries = {}
    for label, res in best.items():
        for k, v in res["queries"].items():
            queries[f"{k}_{label}"] = v
    per_wl_eff = {}
    for k in lo["queries"]:
        if k in hi["queries"] and hi["queries"][k] > 0:
            per_wl_eff[k] = round(
                lo["queries"][k] / (factor * hi["queries"][k]), 3)
    result = {
        "metric": f"{headline} scaling efficiency, "
                  f"{args.workers_low} -> {args.workers_high} "
                  "worker NODES "
                  f"({args.cpus_per_worker} cpus + own object store "
                  "each, fresh clusters, interleaved reps)",
        "value": round(tp_hi / (factor * tp_lo), 3),
        "unit": "efficiency",
        "queries": {
            **queries,
            f"docs_per_sec_{lo_label}": round(tp_lo, 1),
            f"docs_per_sec_{hi_label}": round(tp_hi, 1),
            **{f"efficiency_{k}": v for k, v in per_wl_eff.items()},
        },
        "sf": args.sf_dir,
        "pages": lo["pages"],
        "num_cpus": args.workers_high * args.cpus_per_worker,
        "nodes_low": lo["nodes"], "nodes_high": hi["nodes"],
        "nodes_used_flagship_low": lo["nodes_used_flagship"],
        "nodes_used_flagship_high": hi["nodes_used_flagship"],
        "launch": "driver-attach (ray job submit needs ray[default]; "
                  "see module docstring)",
    }
    line = json.dumps(result)
    with open(args.out, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
