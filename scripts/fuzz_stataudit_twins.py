"""Randomized differential sweep over the batch-32/33/34 stataudit
twins: zipf_slope_by_source, markov_entropy_events,
silhouette_embeddings, cosine_null_histogram, trigram_backoff_ppl_docs,
next_word_accuracy_by_source, char_entropy_by_source, churn_by_week,
keep_rate_by_ppl_decile — adversarial documents / events / embeddings
fixtures (null/empty text, zero-[a-z] docs, repeated tokens, duplicate
and zero vectors, non-dense vec_ids, bursty week gaps) against the
DuckDB oracles. Sources ride non-null (the documents contract the
batch-31 hapax kernel also assumes). FUZZ_SEED env overrides the seed.
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
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

from nacc_form_validator_ray.pipelines.queries import (  # noqa: E402
    ORACLE_SQL, QUERIES)

DOC_NAMES = ["zipf_slope_by_source", "trigram_backoff_ppl_docs",
             "next_word_accuracy_by_source", "char_entropy_by_source"]
EVT_NAMES = ["markov_entropy_events", "churn_by_week"]
EMB_NAMES = ["silhouette_embeddings", "cosine_null_histogram"]
#: the composed calibration query re-trains a bigram LM per trial —
#: run it on a subset of rounds
SLOW_DOC_NAMES = ["keep_rate_by_ppl_decile"]


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


def cmp(name, got, want, ctx):
    g, w = canon(got), canon(want)
    if len(g) != len(w) or list(g.columns) != list(w.columns) \
            or not g.equals(w):
        print(f"MISMATCH {name} {ctx}: rows {len(g)} vs {len(w)}")
        print("ray:", g.head(5).to_dict("records"))
        print("sql:", w.head(5).to_dict("records"))
        return 1
    print(f"ok {name} {ctx} rows={len(g)}")
    return 0


rng = np.random.default_rng(int(os.environ.get("FUZZ_SEED", "20260820")))
pool = ["the", "a", "of", "and", "to", "data", "ray", "filter",
        "quality", "token", "zipf", "entropy", "spam", "spam",
        "xx", "yy", "zz"]

fails = 0
rounds = int(os.environ.get("FUZZ_ROUNDS", "6"))
for trial in range(rounds):
    tmp = tempfile.mkdtemp(prefix="fuzz_stat_")

    # ---- documents ----
    nd = int(rng.integers(2, 120))
    texts = []
    for i in range(nd):
        shape = int(rng.integers(0, 7))
        if shape == 0:
            texts.append(None)
        elif shape == 1:
            texts.append("")
        elif shape == 2:          # zero-[a-z]
            texts.append("123 456 !!! 789")
        elif shape == 3:          # single repeated token
            texts.append(" ".join([str(rng.choice(pool))] *
                                  int(rng.integers(1, 40))))
        else:
            texts.append(" ".join(
                str(w) for w in rng.choice(
                    pool, size=int(rng.integers(1, 80)))))
    docs = pd.DataFrame({
        "doc_id": np.arange(nd, dtype=np.int64),
        "text": pd.array(texts, dtype=object),
        "lang": pd.array(["en"] * nd, dtype=object),
        "source": pd.array([f"src{int(rng.integers(0, 3))}"
                            for _ in range(nd)], dtype=object),
        "n_chars": np.int64([len(t) if t else 0 for t in texts])})
    docs.to_parquet(f"{tmp}/documents.parquet")

    # ---- events ----
    ne = int(rng.integers(2, 400))
    base = pd.Timestamp("2024-01-01").value // 1000
    ts_us = base + rng.integers(0, 6 * 604_800_000_000, size=ne)
    events = pd.DataFrame({
        "event_id": np.arange(ne, dtype=np.int64),
        "ts": pd.to_datetime(ts_us, unit="us"),
        "user_id": rng.integers(0, 12, size=ne).astype(np.int64),
        "event_type": pd.array(
            [None if rng.random() < 0.05 else
             str(rng.choice(["click", "view", "purchase", "signup"]))
             for _ in range(ne)], dtype=object),
        "value": rng.random(ne),
        "props": pd.array(["{}"] * ne, dtype=object)})
    events.to_parquet(f"{tmp}/events.parquet")

    # ---- embeddings ----
    nv = int(rng.integers(1, 40))
    dim = int(rng.integers(2, 9))
    V = rng.normal(size=(nv, dim)) * 0.3
    if nv >= 2 and rng.random() < 0.5:
        V[nv - 1] = V[0]                     # duplicate vector
    if rng.random() < 0.3:
        V[int(rng.integers(0, nv))] = 0.0    # zero vector
    ids = np.sort(rng.choice(np.arange(nv * 2), size=nv,
                             replace=False)).astype(np.int64) \
        if rng.random() < 0.3 else np.arange(nv, dtype=np.int64)
    pq.write_table(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * nv, pa.int32())}),
        f"{tmp}/embeddings.parquet")

    con = duckdb.connect()
    for t in ["documents", "events", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp}/{t}.parquet')")
    names = DOC_NAMES + EVT_NAMES + EMB_NAMES
    if trial % 3 == 0:
        names = names + SLOW_DOC_NAMES
    for qname in names:
        got = QUERIES[qname](tmp)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        want = con.sql(ORACLE_SQL[qname]).df()
        fails += cmp(qname, got, want,
                     f"trial={trial} nd={nd} ne={ne} nv={nv}")
    con.close()
    shutil.rmtree(tmp)

print("FAILS:", fails)
ray.shutdown()
sys.exit(1 if fails else 0)
