"""Worker-node failure drill on the simulated multi-node cluster.

Starts head + 3 worker nodes (4 cpus + own plasma store each), launches
the flagship quality filter over the 960k-page corpus as a separate
driver process, then SIGKILLs one worker node's raylet mid-run. The
job must complete with the SAME row count as an undisturbed run: the
flagship is a map-only pipeline over parquet input, so Ray reschedules
the dead node's tasks on the survivors and recomputes any lost blocks
from lineage — the recovery story a fixed-size production cluster
leans on when a node drops.

The same drill matters for the checkpointed compositions
(run_pretrain / run_quality_filter): their _DONE-marker stages make a
DRIVER death resumable; this script evidences the WORKER death path.

Usage: python scripts/multinode_fault.py [--pages 960000]
Writes FAULT_r05.json at the repo root and prints one JSON line.
WARNING: uses `ray stop --force` — do not run alongside other local
Ray sessions.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from multinode_scaling import (ensure_fixture, start_cluster,  # noqa: E402
                               stop_cluster)

JOB = """
import os, sys, time, json
sys.path.insert(0, {repo!r})
os.environ["GRAFT_BENCH_PAGES"] = {pages!r}
import ray
ray.init(address="auto", logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import bench
t0 = time.perf_counter()
n = bench.run_quality_filter_pages("/root/testdata/sf0.1")
print("JOBRESULT", json.dumps({{"rows": n,
                               "sec": round(time.perf_counter()-t0, 2),
                               "nodes_alive": len([x for x in ray.nodes()
                                                   if x["Alive"]])}}))
ray.shutdown()
"""


def worker_raylet_pids() -> list:
    """PIDs of every WORKER node's raylet. All nodes share the head's
    session dir; worker raylets are distinguished by their numbered
    socket (``sockets/raylet.1``, ``.2``, ... — the head's is the bare
    ``sockets/raylet``)."""
    import re

    out = subprocess.run(["pgrep", "-af", "raylet"], capture_output=True,
                         text=True).stdout
    pids = []
    for line in out.splitlines():
        if "raylet/raylet " in line and re.search(
                r"--raylet_socket_name=\S*raylet\.\d+", line):
            pids.append(int(line.split()[0]))
    return pids


def run_leg(pages_dir: str, pages: int, kill_after: float | None):
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.Popen(
        [sys.executable, "-c", JOB.format(repo=REPO, pages=str(pages))],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env)
    killed_pid = None
    if kill_after is not None:
        time.sleep(kill_after)
        victims = worker_raylet_pids()
        if victims:
            killed_pid = victims[-1]
            os.kill(killed_pid, signal.SIGKILL)
    out, _ = proc.communicate(timeout=900)
    line = [ln for ln in out.splitlines() if ln.startswith("JOBRESULT")]
    if proc.returncode != 0 or not line:
        raise RuntimeError(f"job failed (rc={proc.returncode}):\n"
                           f"{out[-3000:]}")
    res = json.loads(line[0].split(" ", 1)[1])
    res["killed_raylet_pid"] = killed_pid
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=960_000)
    ap.add_argument("--kill-after", type=float, default=8.0,
                    help="seconds into the job to SIGKILL one worker "
                         "raylet")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "FAULT_r05.json"))
    args = ap.parse_args()

    pages_dir = ensure_fixture(args.pages)

    stop_cluster()
    start_cluster(3, 4, obj_store_bytes=3_000_000_000)
    try:
        baseline = run_leg(pages_dir, args.pages, kill_after=None)
    finally:
        stop_cluster()

    start_cluster(3, 4, obj_store_bytes=3_000_000_000)
    try:
        faulted = run_leg(pages_dir, args.pages,
                          kill_after=args.kill_after)
    finally:
        stop_cluster()

    result = {
        "metric": "flagship rows after SIGKILL of one of 3 worker "
                  "raylets mid-run vs undisturbed run",
        "value": int(faulted["rows"]),
        "unit": "rows",
        "pages": args.pages,
        "baseline": baseline,
        "faulted": faulted,
        "rows_match": faulted["rows"] == baseline["rows"],
        "survived_node_loss": faulted["nodes_alive"]
        < baseline["nodes_alive"],
        "slowdown_x": round(faulted["sec"] / baseline["sec"], 2),
    }
    line = json.dumps(result)
    with open(args.out, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
