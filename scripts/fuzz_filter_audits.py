"""Randomized differential sweep over the batch-18 filter-audit twins:
rule_cooccurrence_docs, keep_rate_by_length, langid_mismatch_by_source,
fertility_by_source, scrub_volume_by_source — adversarial documents
tables (null text/lang/source, empty strings, PII-bearing strings,
zero-[a-z] docs, mixed-language stopword soups, repetitive 3-gram
spam) against the DuckDB oracles. FUZZ_SEED env overrides the seed."""
import os
import shutil
import sys
import tempfile

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")

from nacc_form_validator_ray.pipelines.queries import (  # noqa: E402
    ORACLE_SQL, QUERIES)
from nacc_form_validator_ray.stages.text_signals import (  # noqa: E402
    STOPWORDS)

NAMES = ["rule_cooccurrence_docs", "keep_rate_by_length",
         "langid_mismatch_by_source", "fertility_by_source",
         "scrub_volume_by_source"]


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


rng = np.random.default_rng(int(os.environ.get("FUZZ_SEED", "20260819")))

# word pool: stopwords from every bank (drives lang_pred through all
# argmax arms) + content words + digits/symbols (zero-[a-z] docs)
pool = []
for lang, bank in STOPWORDS.items():
    pool.extend(list(bank)[:8])
pool += ["alpha", "bravo", "charlie", "delta", "quantization",
         "tokenizer", "99", "4242", "!!", "===", "été",
         "中文"]
pii = ["mail me at bob@example.com now",
       "ssn 123-45-6789 leaked",
       "call 415-555-0199 or 650-555-0123",
       "card 4242 4242 4242 4242 expires",
       "ip 10.0.0.1 logged you damn fool"]

fails = 0
for trial in range(int(os.environ.get("FUZZ_ROUNDS", "8"))):
    tmp = tempfile.mkdtemp(prefix="fuzz_audit_")
    nd = int(rng.integers(3, 220))
    texts, langs, sources = [], [], []
    for i in range(nd):
        shape = int(rng.integers(0, 8))
        if shape == 0:
            texts.append(None)
        elif shape == 1:
            texts.append("")
        elif shape == 2:
            texts.append(str(rng.choice(pii)))
        elif shape == 3:  # repetitive 3-gram spam
            texts.append(" ".join([str(rng.choice(pool))] *
                                  int(rng.integers(3, 60))))
        elif shape == 4:  # zero-[a-z] doc
            texts.append("123 456 !!! 789")
        else:
            texts.append(" ".join(
                str(w) for w in rng.choice(
                    pool, size=int(rng.integers(1, 120)))))
        langs.append(None if rng.random() < 0.1 else
                     str(rng.choice(["en", "es", "de", "fr", "zh",
                                     "xx"])))
        sources.append(None if rng.random() < 0.1 else
                       f"src{int(rng.integers(0, 4))}")
    docs = pd.DataFrame({
        "doc_id": np.arange(nd, dtype=np.int64),
        "text": pd.array(texts, dtype=object),
        "lang": pd.array(langs, dtype=object),
        "source": pd.array(sources, dtype=object),
        "n_chars": np.int64([len(t) if t else 0 for t in texts])})
    docs.to_parquet(f"{tmp}/documents.parquet")
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp}/documents.parquet')")
    for qname in NAMES:
        got = QUERIES[qname](tmp)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        want = con.sql(ORACLE_SQL[qname]).df()
        fails += cmp(qname, got, want, f"trial={trial} nd={nd}")
    con.close()
    shutil.rmtree(tmp)

print("FAILS:", fails)
ray.shutdown()
sys.exit(1 if fails else 0)
