"""Randomized differential sweep over the mining twins
(pipelines/mining.py): priority sampling, correlation matrix, unpivot
profile, in-window pairs, activation delay, Gini diversity, gap
histogram, co-purchase pairs, skip-grams, langid confusion, plus the
linked-page family (containment, host caps, URL structure, components,
mutual links, assortativity) over randomized page tables.

Adversarial shapes per round: empty tables, zero/negative measures,
duplicate timestamps, null event types and langs, messy URLs (scheme
case, www/ports, missing scheme -> '' host), self-links, boilerplate
text repeated across pages, tied priorities.

Usage: FUZZ_SEED=123 FUZZ_ROUNDS=5 PYTHONPATH=/root/repo \
    python scripts/fuzz_mining_twins.py
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

import nacc_form_validator_ray.pipelines.queries as Q  # noqa: E402
from nacc_form_validator_ray.pipelines.mining import (  # noqa: E402
    MIN_LINKED_SQL, MIN_ORACLE_SQL, MIN_QUERIES)

rng = np.random.default_rng(int(os.environ.get("FUZZ_SEED", "4242")))
ROUNDS = int(os.environ.get("FUZZ_ROUNDS", "5"))

WORDS = np.array(["the", "and", "cat", "dog", "alpha", "beta",
                  "gamma", "la", "que", "der", "und", "zz",
                  # BAD_PHRASES vocabulary (bad_phrase_docs needs
                  # random adjacency to form real phrase hits)
                  "table", "scan", "hash", "join", "sort", "merge",
                  "key", "order",
                  # sentence terminators / unicode (sentence_stats +
                  # the tokenizer's non-ASCII fallback path)
                  "end.", "huh?!", "a.b.c", "...", "¡sí", "Énd."],
                 dtype=object)


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


def _text(n_words_max=40):
    k = int(rng.integers(0, n_words_max))
    return " ".join(rng.choice(WORDS, k)) if k else ""


def gen_tables(d: str) -> None:
    # documents
    n_doc = int(rng.integers(0, 400))
    doc_id = np.sort(rng.choice(np.arange(1, 5000, dtype=np.int64),
                                n_doc, replace=False))
    langs = rng.choice(np.array(["en", "es", "de", None], dtype=object),
                       n_doc)
    texts = [_text() for _ in range(n_doc)]
    # force exact-duplicate classes (source_priority_dedup needs
    # cross-source dup groups; whitespace variants hit the normalizer)
    for i in range(n_doc):
        if i and rng.random() < 0.15:
            j = int(rng.integers(0, i))
            texts[i] = texts[j] + (" " if rng.random() < 0.5 else "")
    sources = rng.choice(np.array(["s", "web", "wiki", "cc"],
                                  dtype=object), n_doc)
    pq.write_table(pa.table({
        "doc_id": pa.array(doc_id),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(list(langs), type=pa.string()),
        "source": pa.array(list(sources), type=pa.string()),
        "n_chars": pa.array(
            rng.integers(0, 700, n_doc).astype(np.int64))}),
        os.path.join(d, "documents.parquet"))

    # lineitem (zero rows sometimes; negatives stress the grid floor)
    n_li = int(rng.integers(0, 800))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(
            rng.integers(0, max(n_li // 3, 1), n_li).astype(np.int64)),
        "l_partkey": pa.array(
            rng.integers(0, 40, n_li).astype(np.int64)),
        "l_quantity": pa.array(
            rng.integers(-5, 50, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(
            rng.uniform(-100, 90000, n_li), 2).astype(np.float64)),
        "l_discount": pa.array(np.round(
            rng.integers(0, 11, n_li) / 100.0, 2).astype(np.float64)),
        "l_tax": pa.array(np.round(
            rng.integers(0, 9, n_li) / 100.0, 2).astype(np.float64)),
        "l_shipdate": pa.array(
            np.datetime64("2023-01-01T00:00:00", "us")
            + (rng.integers(0, 400, n_li)
               * 86_400_000_000).astype("timedelta64[us]"),
            type=pa.timestamp("us"))}),
        os.path.join(d, "lineitem.parquet"))

    # orders (ties in dates/counts/totals stress the NTILE tie-break)
    n_ord = int(rng.integers(0, 500))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(
            rng.integers(1, max(n_ord // 4, 2), n_ord)
            .astype(np.int64)),
        "o_orderdate": pa.array(
            np.datetime64("2023-01-01T00:00:00", "us")
            + (rng.integers(0, 90, n_ord)
               * 86_400_000_000).astype("timedelta64[us]"),
            type=pa.timestamp("us")),
        "o_totalprice": pa.array(np.round(
            rng.uniform(-50, 30000, n_ord), 2).astype(np.float64)),
        "o_orderstatus": pa.array(["O"] * n_ord),
        "o_orderpriority": pa.array(["1-URGENT"] * n_ord)}),
        os.path.join(d, "orders.parquet"))

    # embeddings (fixed small dim; occasionally empty table)
    n_emb = int(rng.integers(0, 200))
    dim = 8
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(
            [rng.standard_normal(dim).astype(np.float32).tolist()
             for _ in range(n_emb)],
            type=pa.list_(pa.float32())),
        "label": pa.array(["x"] * n_emb)}),
        os.path.join(d, "embeddings.parquet"))

    # part (coarse price grid -> heavy dense-rank ties)
    n_pt = int(rng.integers(0, 300))
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(n_pt, dtype=np.int64)),
        "p_name": pa.array(["p"] * n_pt),
        "p_brand": pa.array([f"B{i}" for i in
                             rng.integers(0, 6, n_pt)]),
        "p_type": pa.array(["t"] * n_pt),
        "p_size": pa.array(
            rng.integers(1, 9, n_pt).astype(np.int32)),
        "p_retailprice": pa.array(np.round(
            rng.integers(-3, 8, n_pt) / 1.0
            + rng.integers(0, 3, n_pt) / 4.0, 2)
            .astype(np.float64))}),
        os.path.join(d, "part.parquet"))

    # customer / nation / region (sparse keys -> natural FK orphans;
    # nationkeys deliberately exceed the nation table's range)
    n_cust = int(rng.integers(0, 120))
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.sort(rng.choice(
            np.arange(1, 400, dtype=np.int64), n_cust,
            replace=False))),
        "c_name": pa.array(["c"] * n_cust),
        "c_nationkey": pa.array(
            rng.integers(0, 8, n_cust).astype(np.int32)),
        "c_mktsegment": pa.array(["BUILDING"] * n_cust)}),
        os.path.join(d, "customer.parquet"))
    n_nat = int(rng.integers(0, 6))
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int32)),
        "n_name": pa.array([f"N{i}" for i in range(n_nat)]),
        "n_regionkey": pa.array(
            rng.integers(0, 2, n_nat).astype(np.int32))}),
        os.path.join(d, "nation.parquet"))
    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(2, dtype=np.int32)),
        "r_name": pa.array(["R0", "R1"])}),
        os.path.join(d, "region.parquet"))

    # events (duplicate ts on purpose; null types)
    n_ev = int(rng.integers(0, 1200))
    n_users = int(rng.integers(1, 30))
    base = np.datetime64("2024-01-01T00:00:00", "us")
    raw = rng.integers(0, 10 * 86_400_000_000, n_ev)
    dup = rng.random(n_ev) < 0.2
    raw[dup] = (raw[dup] // 1_000_000) * 1_000_000  # force ties
    ts = base + raw.astype("timedelta64[us]")
    types = rng.choice(np.array(
        ["click", "view", "purchase", "signup", "error"],
        dtype=object), n_ev)
    types = np.where(rng.random(n_ev) < 0.05, None, types)
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

    # linked pages: messy urls, self/external links, boilerplate text
    n_pg = int(rng.integers(0, 150))
    hosts = [f"h{i}.com" for i in range(int(rng.integers(1, 8)))]
    boiler = _text(12)
    urls, links, texts = [], [], []
    for i in range(n_pg):
        h = rng.choice(hosts)
        scheme = rng.choice(["https://", "HTTP://", "http://WWW.", ""])
        port = rng.choice(["", ":80", ":443"])
        q = rng.choice(["", "?utm=x", "?a=1&b=2"])
        urls.append(f"{scheme}{h}{port}/p/{i}{q}")
        k = int(rng.integers(0, 4))
        links.append([f"https://{rng.choice(hosts)}/x/{j}"
                      for j in range(k)])
        sep = rng.choice([" ", "\n"])  # newline boiler => shared LINES
        texts.append((boiler + sep) * int(rng.integers(0, 3))
                     + _text(25))
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(1, n_pg + 1, dtype=np.int64)),
        "url": pa.array(urls, type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
        "links": pa.array(links, type=pa.list_(pa.string()))}),
        os.path.join(d, "linkpages.parquet"))


#: mining queries fuzzable over the standard tables
TABLE_QUERIES = ["priority_sample_docs", "corr_matrix_lineitem",
                 "unpivot_lineitem_measures", "event_pairs_within_hour",
                 "time_to_first_purchase", "user_type_gini",
                 "gap_histogram_events", "copurchase_part_pairs",
                 "skipgram_counts", "langid_confusion",
                 "dedup_cluster_sizes", "minhash_verify_pairs",
                 "pack_efficiency", "pareto_revenue_cut",
                 "next_word_top1", "value_percent_rank_events",
                 "weighted_median_price", "mad_outliers_events",
                 "session_length_histogram", "hll_estimate_users",
                 "top_terms_per_lang", "sentence_stats_docs",
                 "rule_attribution_docs", "token_length_histogram",
                 "customer_rfm", "daily_count_delta",
                 "embedding_dim_minmax", "monthly_revenue_ma3",
                 "bad_phrase_docs", "cusum_max_events",
                 "dense_rank_top_prices", "embedding_norm_histogram",
                 "late_events_audit", "source_priority_dedup",
                 "inverted_index_prefix", "distinctive_terms",
                 "benford_order_totals", "fk_orphans",
                 "nation_revenue_share", "daily_anomaly_events",
                 "burst_users", "top2_gap_per_type",
                 "length_outlier_docs", "dedup_survivors_by_source",
                 "oov_rate_by_source", "frame_dedup",
                 "kmv_type_overlap"]
#: linked-page family (twins are path-parameterized)
LINKED_QUERIES = ["containment_pairs_pages", "cap_docs_per_host",
                  "url_structure_stats", "host_components",
                  "mutual_host_links", "host_degree_assortativity",
                  "host_boilerplate_frac", "query_param_keys",
                  "host_reciprocity", "host_clustering",
                  "cross_host_dup_report", "host_cocitation",
                  "dangling_hosts", "host_lang_gini",
                  "flesch_pages", "host_neighbor_jaccard",
                  "outlink_stats", "tld_keep_rate",
                  "pagerank_convergence"]


def compare(name, got, want, rnd, d):
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    g, w = canon(got), canon(want)
    if len(g) == 0 and len(w) == 0:
        return True  # empty-vs-empty: schemaless pandas conversion
    if (len(g) != len(w) or list(g.columns) != list(w.columns)
            or not g.equals(w)):
        print(f"MISMATCH {name} round={rnd} dir={d}")
        print("ray:", g.head(4).to_dict("records"))
        print("sql:", w.head(4).to_dict("records"))
        return False
    return True


def main() -> int:
    bad = 0
    oracle = dict(MIN_ORACLE_SQL)
    # these are registered at queries.py's bottom (they wrap SQL
    # constants owned by that module)
    for k in ("langid_confusion", "dedup_cluster_sizes",
              "minhash_verify_pairs", "pack_efficiency",
              "session_length_histogram", "hll_estimate_users",
              "rule_attribution_docs", "kmv_type_overlap"):
        oracle[k] = Q.ORACLE_SQL[k]
    for rnd in range(ROUNDS):
        d = tempfile.mkdtemp(prefix="fuzz_min_")
        gen_tables(d)
        con = duckdb.connect()
        for t in ("documents", "lineitem", "events", "orders",
                  "embeddings", "part", "customer", "nation",
                  "region"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
        clean = True
        for name in TABLE_QUERIES:
            fn = MIN_QUERIES.get(name) or Q.QUERIES[name]
            got = fn(d)
            want = con.sql(oracle[name]).df()
            clean &= compare(name, got, want, rnd, d)
        lp = os.path.join(d, "linkpages.parquet")
        orig = Q._linked_pages_path
        Q._linked_pages_path = lambda sf: lp
        try:
            for name in LINKED_QUERIES:
                got = MIN_QUERIES[name](d)
                want = con.sql(MIN_LINKED_SQL[name](
                    lp, sql_url_norm=Q._SQL_URL_NORM)).df()
                clean &= compare(name, got, want, rnd, d)
        finally:
            Q._linked_pages_path = orig
        con.close()
        if not clean:
            bad += 1
        else:
            shutil.rmtree(d, ignore_errors=True)
        print(f"round {rnd}: {'clean' if clean else 'BAD'}")
    print("FUZZ", "FAIL" if bad else "PASS")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
