"""Format-dispatched Dataset readers.

The reference ingests CSV dict-rows (docs/validate_csv_records.py:90-100);
this engine reads Parquet (preferred: column pruning + row-group
pushdown), CSV and JSON(L) into the same Dataset shape. ``columns`` prunes
at the read for Parquet and right after it for row-oriented formats.
"""

from __future__ import annotations

import os
from typing import List, Optional


def read_any(path: str, columns: Optional[List[str]] = None,
             **kwargs):
    """Read a file or directory into a Dataset based on its extension.

    Directories are assumed to hold one format (sniffed from the first
    data file). Parquet gets ``columns`` pushed into the read; CSV/JSON
    are projected right after.
    """
    import ray.data as rd

    fmt = _detect_format(path)
    if fmt == "parquet":
        return rd.read_parquet(path, columns=columns, **kwargs)
    if fmt == "csv":
        ds = rd.read_csv(path, **kwargs)
    elif fmt == "json":
        ds = rd.read_json(path, **kwargs)
    else:
        raise ValueError(f"cannot detect a supported format for {path}")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def _detect_format(path: str) -> str:
    candidates = [path]
    if os.path.isdir(path):
        candidates = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if not f.startswith(("_", ".")))
    for p in candidates:
        lower = p.lower()
        if lower.endswith((".parquet", ".pq")):
            return "parquet"
        if lower.endswith(".csv"):
            return "csv"
        if lower.endswith((".json", ".jsonl", ".ndjson")):
            return "json"
    return "unknown"
