"""Randomized differential sweep over the round-3-continued twins:
knn_join (incl. multi-probe + binding anchor caps), kn_perplexity,
token_entropy, q13, orders_rollup, daily_activity_full, dsir_select."""
import sys, duckdb
import numpy as np, pandas as pd, pyarrow as pa
import ray, ray.data as rd
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from nacc_form_validator_ray.pipelines.queries import (
    sql_knn_join_embeddings, sql_knn_join_probe2, SQL_KN_PERPLEXITY_DOCS,
    SQL_TOKEN_ENTROPY_DOCS, SQL_Q13_CUSTOMER_DISTRIBUTION,
    SQL_ORDERS_ROLLUP, SQL_DAILY_ACTIVITY_FULL,
    QUERIES)
from nacc_form_validator_ray.stages.semdedup import knn_join
from nacc_form_validator_ray.stages.perplexity import KNScorer, train_kn_model

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object: df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int","uint","Int")): df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)

def cmp(name, got, want, ctx):
    g, w = canon(got), canon(want)
    if len(g) != len(w) or list(g.columns) != list(w.columns) or not g.equals(w):
        print(f"MISMATCH {name} {ctx}: rows {len(g)} vs {len(w)}")
        print("ray:", g.head(4).to_dict("records"))
        print("sql:", w.head(4).to_dict("records"))
        return 1
    print(f"ok {name} {ctx} rows={len(g)}")
    return 0

fails = 0
import os
rng = np.random.default_rng(int(os.environ.get("FUZZ_SEED", "777")))

# --- knn_join with BINDING caps and multi-probe
for trial in range(8):
    n = int(rng.integers(10, 250)); d = int(rng.integers(2, 24))
    k = int(rng.integers(1, 7)); iters = int(rng.integers(1, 4))
    top_k = int(rng.integers(1, 6)); cap = int(rng.choice([2, 3, 9, 4096]))
    n_probe = int(rng.integers(1, k + 1))
    vecs = (rng.normal(scale=rng.uniform(0.05, 2.0), size=(n, d))).astype(np.float32)
    tbl = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl).repartition(int(rng.integers(1, 7)))
    got = knn_join(ds, k=k, iterations=iters, top_k=top_k, max_anchors=cap,
                   num_partitions=int(rng.integers(1, 9)), n_probe=n_probe).to_pandas()
    con = duckdb.connect(); con.register("emb", tbl)
    con.sql("CREATE VIEW embeddings AS SELECT * FROM emb")
    sql = sql_knn_join_probe2(k=k, iterations=iters, top_k=top_k,
                              n_probe=n_probe, max_anchors=cap)
    want = con.sql(sql).df()
    fails += cmp("knn_join", got, want,
                 f"n={n} d={d} k={k} it={iters} tk={top_k} cap={cap} p={n_probe}")

# --- kn_perplexity on adversarial doc shapes
words = np.array(["aa","bb","cc","dd","ee","ff","gg","hh"])
for trial in range(6):
    nd = int(rng.integers(3, 150))
    docs = []
    for i in range(nd):
        shape = rng.integers(0, 5)
        if shape == 0: docs.append("")
        elif shape == 1: docs.append(str(rng.choice(words)))
        elif shape == 2: docs.append(" ".join([str(rng.choice(words))] * int(rng.integers(2, 20))))
        else: docs.append(" ".join(rng.choice(words, size=rng.integers(2, 25))))
    df = pd.DataFrame({"doc_id": np.arange(nd, dtype=np.int64), "text": docs})
    model = train_kn_model(rd.from_pandas(df).repartition(int(rng.integers(1, 5))))
    got = rd.from_pandas(df).repartition(int(rng.integers(1, 5))).map_batches(
        KNScorer, fn_constructor_kwargs={"model": model},
        batch_format="pyarrow", concurrency=2).to_pandas()[
        ["doc_id", "log_ppl", "ppl_tokens", "unseen_bigrams"]]
    con = duckdb.connect(); con.register("documents", df)
    want = con.sql(SQL_KN_PERPLEXITY_DOCS).df()
    fails += cmp("kn_ppl", got, want, f"nd={nd}")

# --- token_entropy, q13, rollup, daily, dsir_select via QUERIES on a synthesized sf dir
import os, tempfile, shutil
for trial in range(4):
    tmp = tempfile.mkdtemp(prefix="fuzz_sf_")
    nd = int(rng.integers(5, 200))
    docs = pd.DataFrame({
        "doc_id": np.arange(nd, dtype=np.int64),
        "text": [" ".join(rng.choice(words, size=rng.integers(0, 40))) for _ in range(nd)],
        "lang": ["en"] * nd,
        "source": [f"src{rng.integers(0, 3)}" for _ in range(nd)],
        "n_chars": np.zeros(nd, dtype=np.int64)})
    no = int(rng.integers(5, 300)); nc = int(rng.integers(3, 80)); ne = int(rng.integers(5, 400))
    orders = pd.DataFrame({
        "o_orderkey": np.arange(no, dtype=np.int64),
        "o_custkey": rng.integers(0, nc + 5, size=no).astype(np.int64),  # some custkeys absent from customer
        "o_orderstatus": ["O"] * no,
        "o_totalprice": np.round(rng.uniform(1, 1000, size=no), 2),
        "o_orderdate": pd.to_datetime("1995-01-01") + pd.to_timedelta(rng.integers(0, 1200, size=no), unit="D"),
        "o_orderpriority": rng.choice(["1-URGENT","3-MEDIUM","5-LOW"], size=no)})
    cust = pd.DataFrame({"c_custkey": np.arange(nc, dtype=np.int64),
                         "c_name": [f"c{i}" for i in range(nc)],
                         "c_nationkey": np.zeros(nc, dtype=np.int64),
                         "c_acctbal": np.zeros(nc), "c_mktsegment": ["B"] * nc})
    events = pd.DataFrame({
        "event_id": np.arange(ne, dtype=np.int64),
        "ts": pd.to_datetime("1995-06-01") + pd.to_timedelta(rng.integers(0, 900, size=ne), unit="D"),
        "user_id": rng.integers(0, 50, size=ne).astype(np.int64),
        "event_type": ["x"] * ne, "value": rng.uniform(0, 10, size=ne), "props": ["{}"] * ne})
    docs.to_parquet(f"{tmp}/documents.parquet")
    orders.to_parquet(f"{tmp}/orders.parquet")
    cust.to_parquet(f"{tmp}/customer.parquet")
    events.to_parquet(f"{tmp}/events.parquet")
    con = duckdb.connect()
    for t in ("documents","orders","customer","events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{t}.parquet')")
    for qname, sql in (("token_entropy_docs", SQL_TOKEN_ENTROPY_DOCS),
                       ("q13_customer_distribution", SQL_Q13_CUSTOMER_DISTRIBUTION),
                       ("orders_rollup", SQL_ORDERS_ROLLUP),
                       ("daily_activity_full", SQL_DAILY_ACTIVITY_FULL),
                       ("dsir_weights", None), ("dsir_select", None)):
        from nacc_form_validator_ray.pipelines.queries import ORACLE_SQL
        got = QUERIES[qname](tmp)
        if hasattr(got, "to_pandas"): got = got.to_pandas()
        want = con.sql(ORACLE_SQL[qname]).df()
        fails += cmp(qname, got, want, f"trial={trial}")
    shutil.rmtree(tmp)

print("FAILS:", fails)
ray.shutdown()
