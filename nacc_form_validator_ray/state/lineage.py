"""Per-partition lineage manifests and rule-hit metrics.

Resumability contract (SURVEY.md §4): the output layout is
partition-deterministic — one ``part=<i>/`` parquet directory per input
fragment group, plus ``_lineage/part-<i>.json`` recording the input
fragments, row counts, keep counts and per-(field, code) rule-hit
counters. A rerun skips every partition whose manifest exists and removes
half-written partition directories before reprocessing, so a killed job
resumes mid-dataset without duplicating or dropping rows. Partitioning is
derived from INPUT fragments, not from runtime block boundaries, so it is
stable under Ray's dynamic scheduling.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timezone
from typing import Any, Dict, List, Optional


def lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def manifest_path(out_dir: str, part: int) -> str:
    return os.path.join(lineage_dir(out_dir), f"part-{part}.json")


def partition_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part}")


def completed_parts(out_dir: str) -> List[int]:
    ldir = lineage_dir(out_dir)
    if not os.path.isdir(ldir):
        return []
    parts = []
    for name in os.listdir(ldir):
        if name.startswith("part-") and name.endswith(".json"):
            parts.append(int(name[len("part-"):-len(".json")]))
    return sorted(parts)


def clean_incomplete(out_dir: str, all_parts: List[int]) -> List[int]:
    """Remove partition dirs without a manifest; return parts still to do."""
    done = set(completed_parts(out_dir))
    todo = []
    for part in all_parts:
        if part in done:
            continue
        pdir = partition_dir(out_dir, part)
        if os.path.isdir(pdir):
            shutil.rmtree(pdir)
        todo.append(part)
    return todo


def write_manifest(out_dir: str,
                   part: int,
                   input_fragments: List[str],
                   n_rows: int,
                   n_kept: int,
                   rule_hits: Dict[str, int],
                   extra: Optional[Dict[str, Any]] = None) -> str:
    """Atomically write the partition manifest (write + rename)."""
    os.makedirs(lineage_dir(out_dir), exist_ok=True)
    payload = {
        "part": part,
        "input_fragments": sorted(input_fragments),
        "n_rows": int(n_rows),
        "n_kept": int(n_kept),
        "rule_hits": {k: int(v) for k, v in sorted(rule_hits.items())},
        "completed_at": datetime.now(timezone.utc).isoformat(),
    }
    if extra:
        payload.update(extra)
    path = manifest_path(out_dir, part)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return path


def read_manifests(out_dir: str) -> List[Dict[str, Any]]:
    return [json.load(open(manifest_path(out_dir, p)))
            for p in completed_parts(out_dir)]


def aggregate_metrics(out_dir: str) -> Dict[str, Any]:
    """Roll the per-partition manifests up into run-level metrics."""
    totals: Dict[str, Any] = {"n_rows": 0, "n_kept": 0, "rule_hits": {},
                              "n_parts": 0}
    for m in read_manifests(out_dir):
        totals["n_parts"] += 1
        totals["n_rows"] += m["n_rows"]
        totals["n_kept"] += m["n_kept"]
        for key, cnt in m.get("rule_hits", {}).items():
            totals["rule_hits"][key] = \
                totals["rule_hits"].get(key, 0) + cnt
    return totals


def stage_checkpoint(build, ckpt_dir: Optional[str], name: str):
    """Stage-level checkpoint for the report/audit query tier
    (round-4 VERDICT item 9, extending run_pretrain's _DONE-marker
    pattern to composed queries).

    ``build`` is a zero-arg callable returning a ray.data Dataset.
    With ``ckpt_dir=None`` it is called through unchanged (no IO —
    the default registry/driver path). With a directory, the stage's
    output is written once to ``ckpt_dir/name/`` parquet with a
    ``_DONE`` marker and every rerun streams it back from disk instead
    of recomputing the upstream — so a killed multi-stage report
    resumes from its last completed stage. Half-written stage dirs
    (no marker) are wiped before reproducing.
    """
    if ckpt_dir is None:
        return build()
    import ray.data as rd

    d = os.path.join(ckpt_dir, name)
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(ckpt_dir, exist_ok=True)
        build().write_parquet(d)
        with open(marker, "w") as f:
            f.write("ok")
    return rd.read_parquet(d)
