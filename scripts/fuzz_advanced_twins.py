"""Randomized differential sweep over the advanced-analytics twins
(pipelines/advanced.py): skyline, grouped mode, column profiling, HLL
registers, fuzzy ed<=1 join, hourly gap fill, key-skew top-k, per-user
quartiles, journey mining, rolling WAU, embedding Gram, Markov
transitions.

Each round generates adversarial random tables (tied prices/sizes,
duplicate and empty names, null event types, vocabularies that may lack
'purchase' entirely, tiny and skewed user ranges) into a /tmp dir and
compares every ADV query against its DuckDB twin on the same files.

Usage: FUZZ_SEED=123 FUZZ_ROUNDS=5 PYTHONPATH=/root/repo \
    python scripts/fuzz_advanced_twins.py
"""
import os
import shutil
import sys
import tempfile

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import ray  # noqa: E402

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

from nacc_form_validator_ray.pipelines.advanced import (  # noqa: E402
    ADV_ORACLE_SQL, ADV_QUERIES)

rng = np.random.default_rng(int(os.environ.get("FUZZ_SEED", "4242")))
ROUNDS = int(os.environ.get("FUZZ_ROUNDS", "5"))


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype(np.int64)
        elif str(df[c].dtype) == "float32":
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


def gen_tables(d: str) -> None:
    n_ev = int(rng.integers(20, 1500))
    n_users = int(rng.integers(1, 40))
    vocab = list(rng.choice(
        ["click", "view", "purchase", "signup", "error", "a", "bb"],
        size=int(rng.integers(1, 6)), replace=False))
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 21 * 86_400_000_000,
                             n_ev).astype("timedelta64[us]")
    types = rng.choice(np.array(vocab, dtype=object), n_ev)
    null_mask = rng.random(n_ev) < 0.05
    types = np.where(null_mask, None, types)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array(
            rng.integers(0, n_users, n_ev).astype(np.int64)),
        "event_type": pa.array(list(types), type=pa.string()),
        "value": pa.array(
            np.round(rng.normal(0, 40, n_ev), 3).astype(np.float64)),
        "props": pa.array(["{}"] * n_ev)}),
        os.path.join(d, "events.parquet"))

    n_cust = int(rng.integers(2, 120))
    alpha = list("abcd")
    names = []
    for _ in range(n_cust):
        L = int(rng.integers(0, 7))
        names.append("".join(rng.choice(alpha, L)))
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array(names, type=pa.string())}),
        os.path.join(d, "customer.parquet"))

    n_part = int(rng.integers(1, 400))
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_retailprice": pa.array(
            (rng.integers(-40, 40, n_part) / 4.0).astype(np.float64)),
        "p_size": pa.array(
            rng.integers(0, 8, n_part).astype(np.int32),
            type=pa.int32())}),
        os.path.join(d, "part.parquet"))

    n_vec = int(rng.integers(1, 200))
    dim = int(rng.integers(2, 9))
    emb = rng.uniform(-1, 1, (n_vec, dim)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n_vec, dtype=np.int64)),
        "embedding": pa.array(list(emb),
                              type=pa.list_(pa.float32())),
        "label": pa.array(
            rng.integers(0, 3, n_vec).astype(np.int32),
            type=pa.int32())}),
        os.path.join(d, "embeddings.parquet"))


def main() -> int:
    bad = 0
    for rnd in range(ROUNDS):
        d = tempfile.mkdtemp(prefix="fuzz_adv_")
        gen_tables(d)
        con = duckdb.connect()
        for t in ("events", "customer", "part", "embeddings"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
        for name, fn in sorted(ADV_QUERIES.items()):
            got = fn(d)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
            want = con.sql(ADV_ORACLE_SQL[name]).df()
            g, w = canon(got), canon(want)
            if (len(g) != len(w) or list(g.columns) != list(w.columns)
                    or not g.equals(w)):
                bad += 1
                print(f"MISMATCH {name} round={rnd} dir={d}")
                print("ray:", g.head(4).to_dict("records"))
                print("sql:", w.head(4).to_dict("records"))
                continue
        con.close()
        if bad == 0:
            shutil.rmtree(d, ignore_errors=True)
        print(f"round {rnd}: {'clean' if bad == 0 else f'{bad} bad'}")
    print("FUZZ", "FAIL" if bad else "PASS")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
