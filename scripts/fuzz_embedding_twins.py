"""Ad-hoc fuzz: semdedup + dsir vs DuckDB twins on random data, random
partitionings and parameters (the per-round fuzz-sweep ritual)."""
import sys, duckdb
import numpy as np, pandas as pd, pyarrow as pa
import ray, ray.data as rd
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from nacc_form_validator_ray.pipelines.queries import (
    sql_semdedup_embeddings, SQL_DSIR_WEIGHTS)
from nacc_form_validator_ray.stages.semdedup import semdedup
from nacc_form_validator_ray.stages.importance import (
    ImportanceScorer, train_importance_model)

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object: df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)

import os
rng = np.random.default_rng(int(os.environ.get("FUZZ_SEED", "99")))
fails = 0
for trial in range(12):
    n = int(rng.integers(20, 400)); d = int(rng.integers(2, 40))
    k = int(rng.integers(1, min(9, n)))
    iters = int(rng.integers(1, 4)); reps = int(rng.integers(1, 9))
    # mix spread and clumped vectors so drops occur
    base = rng.normal(scale=rng.uniform(0.05, 2.0), size=(n, d))
    dup_idx = rng.integers(0, n, size=n // 5)
    base[-len(dup_idx):] = base[dup_idx] + rng.normal(scale=1e-5, size=(len(dup_idx), d))
    vecs = base.astype(np.float32)
    thr = int(rng.integers(1, 10**rng.integers(1, 9)))
    cap = int(rng.choice([2, 7, 64, 4096]))
    tbl = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl).repartition(reps)
    got = canon(semdedup(ds, k=k, iterations=iters, dist2_threshold=thr,
                         max_anchors=cap, num_partitions=int(rng.integers(1, 17))).to_pandas())
    con = duckdb.connect()
    con.register("emb", tbl)
    con.sql("CREATE VIEW embeddings AS SELECT * FROM emb")
    want = canon(con.sql(sql_semdedup_embeddings(k=k, iterations=iters,
                 dist2_threshold=thr, max_anchors=cap)).df())
    if not got.equals(want):
        fails += 1
        print("SEMDEDUP MISMATCH", trial, n, d, k, iters, thr, cap)
        merged = got.merge(want, on="vec_id", suffixes=("_ray","_sql"))
        print(merged[(merged.kept_ray!=merged.kept_sql)|(merged.dup_of_ray!=merged.dup_of_sql)].head())
    else:
        ndrop = int((~got['kept']).sum())
        print(f"semdedup trial {trial}: ok n={n} d={d} k={k} it={iters} thr={thr} cap={cap} drops={ndrop}")

words = np.array([f"w{i}" for i in range(120)] + ["zzz", "qq", "foo"])
for trial in range(8):
    nd = int(rng.integers(5, 300)); reps = int(rng.integers(1, 9))
    texts = [" ".join(rng.choice(words, size=rng.integers(0, 60))) for _ in range(nd)]
    srcs = [f"s{rng.integers(0, 4)}" for _ in range(nd)]
    tgt = f"s{rng.integers(0, 4)}"
    tbl = pa.table({"doc_id": pa.array(np.arange(nd, dtype=np.int64)),
                    "text": pa.array(texts, pa.string()),
                    "source": pa.array(srcs, pa.string())})
    ds = rd.from_arrow(tbl).repartition(reps)
    model = train_importance_model(ds, select_column="source", select_value=tgt)
    got = ds.map_batches(ImportanceScorer, fn_constructor_kwargs={"model": model},
                         batch_format="pyarrow", concurrency=2).to_pandas()
    got = canon(got[["doc_id", "dsir_weight", "dsir_tokens"]])
    con = duckdb.connect(); con.register("docs", tbl)
    con.sql("CREATE VIEW documents AS SELECT * FROM docs")
    want = canon(con.sql(SQL_DSIR_WEIGHTS.replace("'src0'", f"'{tgt}'")).df())
    same = (got["doc_id"].equals(want["doc_id"])
            and (got["dsir_tokens"].to_numpy() == want["dsir_tokens"].to_numpy()).all()
            and (got["dsir_weight"].to_numpy() == want["dsir_weight"].to_numpy()).all())
    if not same:
        fails += 1
        print("DSIR MISMATCH", trial, nd, tgt)
        m = got.merge(want, on="doc_id", suffixes=("_ray","_sql"))
        bad = m[m.dsir_weight_ray != m.dsir_weight_sql]
        print(bad.head())
    else:
        print(f"dsir trial {trial}: ok n={nd} tgt={tgt} reps={reps}")
# --- knn label agreement (composes SQL_KNN; labels must be the real
# fixture's integer dtype, which the mining fuzzer's string labels
# can't provide)
import os as _os
import tempfile as _tf

import pyarrow.parquet as _pq

from nacc_form_validator_ray.pipelines.queries import ORACLE_SQL as _OS
from nacc_form_validator_ray.pipelines.queries import QUERIES as _Q

for trial in range(8):
    n = int(rng.integers(1, 120)); d = int(rng.integers(2, 16))
    vecs = rng.normal(scale=rng.uniform(0.1, 2.0),
                      size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 4, size=n).astype(np.int32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})
    tmp = _tf.mkdtemp(prefix="fuzz_knnlab_")
    _pq.write_table(tbl, _os.path.join(tmp, "embeddings.parquet"))
    got = canon(_Q["knn_label_agreement"](tmp))
    con = duckdb.connect(); con.register("emb", tbl)
    con.sql("CREATE VIEW embeddings AS SELECT * FROM emb")
    want = canon(con.sql(_OS["knn_label_agreement"]).df())
    if len(got) != len(want) or not got.equals(want):
        fails += 1
        print("KNN_LABEL MISMATCH", trial, n, d)
        print(got.head(4).to_dict("records"))
        print(want.head(4).to_dict("records"))
    else:
        print(f"knn_label trial {trial}: ok n={n} d={d} rows={len(got)}")

print("FAILS:", fails)
ray.shutdown()
import sys as _sys
_sys.exit(1 if fails else 0)
