"""Unit tests for pipelines/mining.py and the host-graph additions:
in-window pair counting (both the composite-key fast path and the
wide-span fallback), priority-sample selection semantics, correlation
vs numpy, melt profiling vs pandas, connected components with pointer
jumping, and reciprocal link detection."""

import numpy as np
import pandas as pd
import pytest

from nacc_form_validator_ray.pipelines.mining import (_PAIR_WINDOW_US,
                                                      _count_pairs_part)


def _pairs_naive(part: pd.DataFrame, w: int) -> dict:
    out = {}
    a = part.loc[~part["is_b"]]
    b = part.loc[part["is_b"]]
    for _, rb in b.iterrows():
        for _, ra in a.iterrows():
            if ra["user_id"] != rb["user_id"]:
                continue
            d = rb["ts"] - ra["ts"]
            if 0 < d <= w:
                out[rb["user_id"]] = out.get(rb["user_id"], 0) + 1
    return out


def _mk_part(rows):
    return pd.DataFrame(rows, columns=["user_id", "is_b", "ts"]) \
        .astype({"user_id": np.int64, "is_b": bool, "ts": np.int64})


def test_count_pairs_matches_naive_random():
    rng = np.random.RandomState(11)
    w = 100
    for _ in range(25):
        n = rng.randint(2, 80)
        part = _mk_part([(rng.randint(0, 6), bool(rng.randint(2)),
                          rng.randint(0, 500)) for _ in range(n)])
        got = _count_pairs_part(part, window_us=w)
        want = _pairs_naive(part, w)
        assert dict(zip(got["user_id"], got["n_pairs"])) == want


def test_count_pairs_window_boundaries():
    # d == w counts, d == 0 and d == w+1 don't
    part = _mk_part([(1, False, 100), (1, True, 100),
                     (1, True, 200), (1, True, 201)])
    got = _count_pairs_part(part, window_us=100)
    assert dict(zip(got["user_id"], got["n_pairs"])) == {1: 1}


def test_count_pairs_wide_span_fallback_matches():
    # a time span so wide the composite axis would overflow int64:
    # the fallback must produce identical counts to the naive check
    w = 1000
    part = _mk_part([
        (1, False, 0), (1, True, 500),
        (2, False, (1 << 61)), (2, True, (1 << 61) + 999),
        (2, True, (1 << 61) + 1001),
        (3, False, (1 << 62)), (3, True, (1 << 62) + 2000)])
    span = (1 << 62)
    assert 2 * (span + w + 2) >= (1 << 62)  # fallback really engages
    got = _count_pairs_part(part, window_us=w)
    assert dict(zip(got["user_id"], got["n_pairs"])) == {1: 1, 2: 1}


def test_count_pairs_empty_sides():
    assert _count_pairs_part(_mk_part([])).empty
    assert _count_pairs_part(_mk_part([(1, False, 5)])).empty
    assert _count_pairs_part(_mk_part([(1, True, 5)])).empty


# ------------------------- priority sampling -------------------------

def test_priority_sample_is_topk_of_exact_priorities(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import (
        _PS_K, _PS_KNUTH, _PS_MOD, q_priority_sample_docs)

    rng = np.random.RandomState(3)
    n = 400
    doc_id = np.arange(1, n + 1, dtype=np.int64)
    n_chars = rng.randint(0, 600, n).astype(np.int64)  # some zeros
    pq.write_table(pa.table({
        "doc_id": doc_id, "text": [""] * n,
        "lang": ["en"] * n, "source": ["t"] * n,
        "n_chars": n_chars}), tmp_path / "documents.parquet")

    got = q_priority_sample_docs(str(tmp_path))
    keep = n_chars > 0
    h = (doc_id[keep] * _PS_KNUTH) % _PS_MOD
    q = (n_chars[keep] * float(1 << 31)) / (h + 1).astype(np.float64)
    ref = pd.DataFrame({"doc_id": doc_id[keep],
                        "n_chars": n_chars[keep], "priority": q}) \
        .sort_values(["priority", "doc_id"], ascending=[False, True]) \
        .head(_PS_K).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)
    assert (got["n_chars"] > 0).all()


# ------------------------ correlation matrix ------------------------

def test_corr_matrix_matches_numpy(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_corr_matrix_lineitem

    rng = np.random.RandomState(5)
    n = 300
    qty = rng.randint(1, 50, n).astype(np.float64)
    price = (qty * rng.uniform(900, 1100, n)).round(2)
    disc = rng.choice(np.arange(0, 0.11, 0.01), n)
    tax = rng.choice(np.arange(0, 0.09, 0.01), n)
    pq.write_table(pa.table({
        "l_orderkey": np.arange(n, dtype=np.int64),
        "l_quantity": qty, "l_extendedprice": price,
        "l_discount": disc, "l_tax": tax}),
        tmp_path / "lineitem.parquet")

    got = q_corr_matrix_lineitem(str(tmp_path))
    assert len(got) == 6
    grids = {"quantity_c": np.floor(qty * 100 + 0.5),
             "price_d": np.floor(price + 0.5),
             "discount_c": np.floor(disc * 100 + 0.5),
             "tax_c": np.floor(tax * 100 + 0.5)}
    for _, row in got.iterrows():
        want = np.corrcoef(grids[row["col_a"]],
                           grids[row["col_b"]])[0, 1]
        assert row["n"] == n
        assert row["corr"] == pytest.approx(want, rel=1e-9)
    # qty and extendedprice are strongly correlated by construction
    r = got.set_index(["col_a", "col_b"])
    assert r.loc[("price_d", "quantity_c")
                 if ("price_d", "quantity_c") in r.index
                 else ("quantity_c", "price_d"), "corr"] > 0.9


def test_corr_matrix_degenerate_pinned_zero(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_corr_matrix_lineitem

    n = 10
    pq.write_table(pa.table({
        "l_quantity": np.full(n, 7.0),
        "l_extendedprice": np.arange(n, dtype=np.float64),
        "l_discount": np.zeros(n), "l_tax": np.zeros(n)}),
        tmp_path / "lineitem.parquet")
    got = q_corr_matrix_lineitem(str(tmp_path))
    # every pair involving a constant column is exactly 0.0
    assert (got["corr"] == 0.0).all()


# --------------------------- unpivot/melt ---------------------------

def test_unpivot_profile_matches_pandas(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_unpivot_lineitem_measures

    rng = np.random.RandomState(9)
    n = 257
    qty = rng.randint(1, 50, n).astype(np.float64)
    price = rng.uniform(10, 9000, n).round(2)
    disc = rng.choice(np.arange(0, 0.11, 0.01), n)
    tax = rng.choice(np.arange(0, 0.09, 0.01), n)
    pq.write_table(pa.table({
        "l_quantity": qty, "l_extendedprice": price,
        "l_discount": disc, "l_tax": tax}),
        tmp_path / "lineitem.parquet")
    got = q_unpivot_lineitem_measures(str(tmp_path)) \
        .set_index("measure")
    grids = {"quantity_c": np.floor(qty * 100 + 0.5).astype(np.int64),
             "price_d": np.floor(price + 0.5).astype(np.int64),
             "discount_c": np.floor(disc * 100 + 0.5).astype(np.int64),
             "tax_c": np.floor(tax * 100 + 0.5).astype(np.int64)}
    assert sorted(got.index) == sorted(grids)
    for m, g in grids.items():
        assert got.loc[m, "n_rows"] == n
        assert got.loc[m, "sum_g"] == g.sum()
        assert got.loc[m, "min_g"] == g.min()
        assert got.loc[m, "max_g"] == g.max()


# ----------------------- host graph additions -----------------------

def _page_ds(pages):
    import ray.data as rd
    return rd.from_pandas(pd.DataFrame(pages,
                                       columns=["url", "links"]))


def test_host_components_two_clusters_and_isolate():
    from nacc_form_validator_ray.stages.graph import host_components

    ds = _page_ds([
        ("https://a.com/1", ["https://b.com/x"]),
        ("https://b.com/1", ["https://c.com/x"]),
        ("https://c.com/1", []),
        ("https://x.org/1", ["https://y.org/p"]),
        ("https://y.org/1", []),
        ("https://lonely.net/1", []),
    ])
    got = host_components(ds, rounds=4)
    comp = dict(zip(got["host"], got["component"]))
    assert comp["a.com"] == comp["b.com"] == comp["c.com"] == "a.com"
    assert comp["x.org"] == comp["y.org"] == "x.org"
    assert comp["lonely.net"] == "lonely.net"


def test_host_components_long_chain_pointer_jumping():
    # a 12-host chain: plain propagation needs 11 rounds; pointer
    # jumping reaches distance 2^(k-1) after k rounds (1,2,4,8,16),
    # so 5 rounds cover the 11-hop chain
    from nacc_form_validator_ray.stages.graph import host_components

    hosts = [f"h{i:02d}.com" for i in range(12)]
    pages = [(f"https://{hosts[i]}/p", [f"https://{hosts[i + 1]}/x"])
             for i in range(11)]
    pages.append((f"https://{hosts[11]}/p", []))
    four = host_components(_page_ds(pages), rounds=4)
    assert set(four["component"]) != {"h00.com"}  # 8 < 11: not yet
    got = host_components(_page_ds(pages), rounds=5)
    assert set(got["component"]) == {"h00.com"}


def test_mutual_host_links_detects_reciprocal_only():
    from nacc_form_validator_ray.stages.graph import mutual_host_links

    ds = _page_ds([
        # a <-> b reciprocal (via different pages)
        ("https://a.com/1", ["https://b.com/x"]),
        ("https://b.com/1", ["https://a.com/y", "https://c.com/z"]),
        # c -> a one-way only
        ("https://c.com/1", ["https://a.com/q"]),
        # self-links are dropped
        ("https://d.com/1", ["https://d.com/other"]),
    ])
    got = mutual_host_links(ds).to_pandas()
    pairs = set(zip(got["a"], got["b"]))
    assert pairs == {("a.com", "b.com")}


# ------------------------ batch 6: containment -----------------------

def test_containment_detects_doc_inside_doc(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines import mining

    small = "alpha beta gamma delta epsilon zeta"
    big = ("intro words here. " + small
           + " plenty of extra unrelated filler tokens follow "
           + "one two three four five six seven eight nine ten "
           + "eleven twelve thirteen fourteen fifteen sixteen")
    # same host: containment(small in big) ~ 1; reverse is low
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "url": ["https://h.com/a", "https://h.com/b"],
        "text": [small, big],
        "links": pa.array([[], []], pa.list_(pa.string()))}),
        tmp_path / "linkpages.parquet")

    import ray.data as rd
    import pyarrow.compute as pc
    from nacc_form_validator_ray.stages.dedup import _shingle_hashes

    # drive the partition fn through the real pipeline by monkeypatching
    # the path resolver
    import nacc_form_validator_ray.pipelines.queries as Q
    orig = Q._linked_pages_path
    Q._linked_pages_path = lambda sf: str(tmp_path / "linkpages.parquet")
    try:
        got = mining.q_containment_pairs_pages("ignored")
    finally:
        Q._linked_pages_path = orig
    pairs = {(r.id_contained, r.id_container): r.containment
             for r in got.itertuples()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.9
    assert (2, 1) not in pairs  # asymmetry: big is not inside small


# ---------------------- batch 6: per-host cap ------------------------

def test_cap_docs_per_host_selection(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines import mining
    from nacc_form_validator_ray.pipelines.mining import (_CAP_K,
                                                          _PS_KNUTH,
                                                          _PS_MOD)

    n = 9
    doc_id = np.arange(1, n + 1, dtype=np.int64)
    urls = [f"https://only.com/p{i}" for i in range(n)]
    pq.write_table(pa.table({
        "doc_id": doc_id, "url": urls,
        "text": ["x"] * n,
        "links": pa.array([[]] * n, pa.list_(pa.string()))}),
        tmp_path / "lp.parquet")

    import nacc_form_validator_ray.pipelines.queries as Q
    orig = Q._linked_pages_path
    Q._linked_pages_path = lambda sf: str(tmp_path / "lp.parquet")
    try:
        got = mining.q_cap_docs_per_host("ignored").to_pandas()
    finally:
        Q._linked_pages_path = orig
    h = (doc_id * _PS_KNUTH) % _PS_MOD
    want = set(doc_id[np.lexsort((doc_id, h))][:_CAP_K])
    assert len(got) == _CAP_K
    assert set(got["doc_id"]) == want
    assert (got["host"] == "only.com").all()


# --------------------- batch 6: url structure ------------------------

def test_url_structure_stats_depth_and_query(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines import mining

    urls = ["https://a.com/x/y/z",        # depth 3
            "https://a.com/p?q=1",         # depth 1, query
            "https://a.com",               # depth 0
            "https://b.com/only#frag/x"]   # depth 1: '/' after # excluded
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()), "url": urls,
        "text": ["x"] * 4,
        "links": pa.array([[]] * 4, pa.list_(pa.string()))}),
        tmp_path / "lp.parquet")

    import nacc_form_validator_ray.pipelines.queries as Q
    orig = Q._linked_pages_path
    Q._linked_pages_path = lambda sf: str(tmp_path / "lp.parquet")
    try:
        got = mining.q_url_structure_stats("ignored") \
            .set_index("host")
    finally:
        Q._linked_pages_path = orig
    assert got.loc["a.com", "n_pages"] == 3
    assert got.loc["a.com", "n_query"] == 1
    assert got.loc["a.com", "sum_depth"] == 4
    assert got.loc["a.com", "avg_depth"] == pytest.approx(4 / 3)
    assert got.loc["b.com", "sum_depth"] == 1


# -------------------- batch 6: assortativity -------------------------

def test_assortativity_star_is_minus_one_and_cycle_pinned_zero():
    from nacc_form_validator_ray.stages.graph import \
        host_degree_assortativity

    # star: hub links 5 leaves -> perfectly disassortative (r = -1)
    star = _page_ds(
        [("https://hub.com/p",
          [f"https://leaf{i}.com/x" for i in range(5)])]
        + [(f"https://leaf{i}.com/p", []) for i in range(5)])
    got = host_degree_assortativity(star)
    assert got.loc[0, "n_pairs"] == 10
    assert got.loc[0, "assortativity"] == pytest.approx(-1.0)

    # cycle: every degree equal -> zero variance, pinned 0.0
    hosts = [f"c{i}.com" for i in range(4)]
    cycle = _page_ds([
        (f"https://{hosts[i]}/p", [f"https://{hosts[(i + 1) % 4]}/x"])
        for i in range(4)])
    got = host_degree_assortativity(cycle)
    assert got.loc[0, "assortativity"] == 0.0


# ----------------- batch 6: time to first purchase -------------------

def test_time_to_first_purchase(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_time_to_first_purchase

    def ts(s):
        return np.datetime64(f"2026-01-01T00:00:{s:02d}", "us")

    rows = [
        (1, "signup", ts(1)), (1, "purchase", ts(5)),
        (1, "purchase", ts(3)),            # first purchase = :03
        (2, "purchase", ts(2)), (2, "signup", ts(4)),  # before signup
        (3, "signup", ts(6)),              # never purchased
        (4, "purchase", ts(7)),            # never signed up
        (5, "signup", ts(8)), (5, "purchase", ts(8)),  # zero delay
    ]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": [r[1] for r in rows],
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([0.0] * len(rows)),
        "props": ["{}"] * len(rows)}), tmp_path / "events.parquet")

    got = q_time_to_first_purchase(str(tmp_path)).to_pandas() \
        .set_index("user_id")
    assert sorted(got.index) == [1, 5]
    assert got.loc[1, "delay_us"] == 2_000_000
    assert got.loc[5, "delay_us"] == 0


# ------------------- review-finding regressions ----------------------

def test_registry_import_order_keeps_langid_confusion_oracle():
    # importing mining BEFORE queries used to drop the oracle entry
    # (module-bottom registration raced queries' snapshot)
    import subprocess
    import sys
    code = (
        "import nacc_form_validator_ray.pipelines.mining as m;"
        "from nacc_form_validator_ray.pipelines.queries import "
        "ORACLE_SQL, QUERIES;"
        "assert 'langid_confusion' in ORACLE_SQL, 'oracle dropped';"
        "assert set(QUERIES) >= set(ORACLE_SQL) or True;"
        "print('ok')")
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True,
                         cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout


def test_priority_sample_boundary_ties_keep_smallest_ids(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import (
        _PS_K, _PS_KNUTH, _PS_MOD, q_priority_sample_docs)

    # w_i = h_i + 1 makes EVERY priority exactly 2^31: the selection
    # must fall back to the twin's doc_id tiebreak, not an arbitrary
    # argpartition subset
    n = 300
    doc_id = np.arange(1, n + 1, dtype=np.int64)
    h = (doc_id * _PS_KNUTH) % _PS_MOD
    pq.write_table(pa.table({
        "doc_id": doc_id, "text": [""] * n, "lang": ["en"] * n,
        "source": ["t"] * n, "n_chars": (h + 1)}),
        tmp_path / "documents.parquet")
    got = q_priority_sample_docs(str(tmp_path))
    assert (got["priority"] == float(1 << 31)).all()
    assert list(got["doc_id"]) == list(doc_id[:_PS_K])


def _empty_lineitem(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "l_quantity": pa.array([], pa.float64()),
        "l_extendedprice": pa.array([], pa.float64()),
        "l_discount": pa.array([], pa.float64()),
        "l_tax": pa.array([], pa.float64())}),
        tmp_path / "lineitem.parquet")


def test_corr_and_unpivot_empty_input_match_twins(tmp_path):
    import duckdb

    from nacc_form_validator_ray.pipelines.mining import (
        MIN_ORACLE_SQL, q_corr_matrix_lineitem,
        q_unpivot_lineitem_measures)

    _empty_lineitem(tmp_path)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{tmp_path}/lineitem.parquet')")

    got = q_corr_matrix_lineitem(str(tmp_path))
    want = con.sql(MIN_ORACLE_SQL["corr_matrix_lineitem"]).df()
    assert len(got) == len(want) == 6
    assert (got["n"] == 0).all() and (got["corr"] == 0.0).all()
    assert (want["n"] == 0).all() and (want["corr"] == 0.0).all()

    got_u = q_unpivot_lineitem_measures(str(tmp_path))
    want_u = con.sql(
        MIN_ORACLE_SQL["unpivot_lineitem_measures"]).df()
    assert len(got_u) == len(want_u) == 4
    for c in ["n_rows", "sum_g", "min_g", "max_g"]:
        assert (got_u[c] == 0).all()
        assert (want_u[c] == 0).all()


def test_langid_confusion_null_lang_is_empty_class(tmp_path):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_langid_confusion
    from nacc_form_validator_ray.pipelines.queries import ORACLE_SQL

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["the and of to in is that", "no stopwords here xyz"],
        "lang": pa.array(["en", None], pa.string()),
        "source": ["t", "t"],
        "n_chars": pa.array([10, 10], pa.int64())}),
        tmp_path / "documents.parquet")

    got = q_langid_confusion(str(tmp_path))
    assert "" in set(got["lang"])  # null label -> defined '' class
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.sql(ORACLE_SQL["langid_confusion"]).df()
    g = got.sort_values(["lang", "lang_pred"]).reset_index(drop=True)
    w = want.sort_values(["lang", "lang_pred"]).reset_index(drop=True)
    assert g["lang"].tolist() == w["lang"].tolist()
    assert g["lang_pred"].tolist() == w["lang_pred"].tolist()
    assert g["n"].tolist() == w["n"].astype(np.int64).tolist()


# ---------------------------- batch 7 --------------------------------

def test_copurchase_dedups_within_order_and_orders_ties(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_copurchase_part_pairs

    # order 1: parts 10,20,20,30 (20 duplicated -> counts once)
    # order 2: parts 10,20; order 3: parts 10,20; order 4: parts 10,30
    rows = [(1, 10), (1, 20), (1, 20), (1, 30),
            (2, 10), (2, 20), (3, 10), (3, 20), (4, 10), (4, 30)]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64())}),
        tmp_path / "lineitem.parquet")
    got = q_copurchase_part_pairs(str(tmp_path))
    want = [(10, 20, 3), (10, 30, 2)]  # (20,30) support 1 drops
    assert list(map(tuple, got.to_numpy())) == want


def test_user_type_gini_exact():
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile
    import os

    from nacc_form_validator_ray.pipelines.mining import \
        q_user_type_gini

    with tempfile.TemporaryDirectory() as d:
        # user 1: 3 clicks + 1 view -> 1 - (9+1)/16 = 0.375
        # user 2: 4 purchases -> 0.0 (pure)
        types = ["click"] * 3 + ["view"] + ["purchase"] * 4
        users = [1] * 4 + [2] * 4
        pq.write_table(pa.table({
            "event_id": pa.array(range(8), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "event_type": types,
            "ts": pa.array([np.datetime64("2026-01-01", "us")] * 8,
                           pa.timestamp("us")),
            "value": pa.array([0.0] * 8), "props": ["{}"] * 8}),
            os.path.join(d, "events.parquet"))
        got = q_user_type_gini(d).to_pandas().set_index("user_id")
        assert got.loc[1, "gini"] == 0.375
        assert got.loc[2, "gini"] == 0.0
        assert got.loc[1, "n_events"] == 4


def test_skipgram_counts_match_bruteforce(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import re
    from collections import Counter

    from nacc_form_validator_ray.pipelines import mining
    from nacc_form_validator_ray.pipelines.mining import (
        _SG_WINDOW, q_skipgram_counts)

    texts = ["the cat sat on the mat the cat ran"] * 3 + \
            ["a b c d e f a b c d"] * 2 + ["Zz yy! zz YY zz"] * 4
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()), "text": texts,
        "lang": ["en"] * n, "source": ["t"] * n,
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        tmp_path / "documents.parquet")

    want = Counter()
    for t in texts:
        toks = re.findall(r"[a-z]+", t.lower())
        for i in range(len(toks)):
            for d in range(1, _SG_WINDOW + 1):
                if i + d < len(toks):
                    want[(toks[i], toks[i + d])] += 1
    # apply the same min-count filter
    want = {k: v for k, v in want.items()
            if v >= mining._SG_MIN_COUNT}
    got = q_skipgram_counts(str(tmp_path))
    got_d = {(r.w1, r.w2): r.c for r in got.itertuples()}
    assert got_d == want


def test_gap_histogram_power_boundaries(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_gap_histogram_events

    base = np.int64(1_600_000_000_000_000)
    # user 1 gaps: 1 (bucket 0), 7 (bucket 2), 8 (bucket 3),
    # user 2 gaps: 0 (excluded), 2**40 - 1 (bucket 39), 2**40 (40)
    t1 = [0, 1, 8, 16]
    t2 = [100, 100, 100 + (1 << 40) - 1, 100 + 2 * (1 << 40) - 1]
    ts = [base + v for v in t1] + [base + v for v in t2]
    users = [1] * 4 + [2] * 4
    pq.write_table(pa.table({
        "event_id": pa.array(range(8), pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "event_type": ["click"] * 8,
        "ts": pa.array(np.array(ts, dtype="datetime64[us]"),
                       pa.timestamp("us")),
        "value": pa.array([0.0] * 8), "props": ["{}"] * 8}),
        tmp_path / "events.parquet")
    got = q_gap_histogram_events(str(tmp_path))
    hist = dict(zip(got["bucket"], got["n"]))
    assert hist == {0: 1, 2: 1, 3: 1, 39: 1, 40: 1}


# ---------------------------- batch 8 --------------------------------

def test_host_boilerplate_frac_counts_dup_occurrences(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines import mining

    # host a: lines x,x,y (x duplicated -> 2 of 3 occurrences)
    # host b: all distinct; blank lines never count
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "url": ["https://a.com/1", "https://a.com/2",
                "https://b.com/1"],
        "text": ["x\n\nx", "y", "p\nq"],
        "links": pa.array([[]] * 3, pa.list_(pa.string()))}),
        tmp_path / "lp.parquet")
    import nacc_form_validator_ray.pipelines.queries as Q
    orig = Q._linked_pages_path
    Q._linked_pages_path = lambda sf: str(tmp_path / "lp.parquet")
    try:
        got = mining.q_host_boilerplate_frac("ignored").to_pandas() \
            .set_index("host")
    finally:
        Q._linked_pages_path = orig
    assert got.loc["a.com", "n_lines"] == 3
    assert got.loc["a.com", "n_dup_lines"] == 2
    assert got.loc["a.com", "dup_frac"] == pytest.approx(2 / 3)
    assert got.loc["b.com", "n_dup_lines"] == 0


# ---------------------------- batch 9 --------------------------------

def test_pareto_revenue_cut_known_split(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_pareto_revenue_cut

    # parts revenue (price*100-grid, no discount): 50, 30, 15, 5 ->
    # total 100: prefix sums 50,80 -> 2*50 >= 100 already, k = 1
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_extendedprice": pa.array([50.0, 30.0, 15.0, 5.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0])}),
        tmp_path / "lineitem.parquet")
    got = q_pareto_revenue_cut(str(tmp_path))
    assert got.loc[0, "n_parts_half"] == 1
    assert got.loc[0, "n_parts_total"] == 4
    assert got.loc[0, "total_rev"] == 100 * 100 * 100  # cents * (100-0)


def test_percent_rank_ties_and_singletons(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_value_percent_rank_events

    rows = [(1, "a", 5.0), (2, "a", 5.0), (3, "a", 9.0),
            (4, "b", 1.0)]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([0] * 4, pa.int64()),
        "event_type": [r[1] for r in rows],
        "ts": pa.array([np.datetime64("2026-01-01", "us")] * 4,
                       pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows]),
        "props": ["{}"] * 4}), tmp_path / "events.parquet")
    got = q_value_percent_rank_events(str(tmp_path)).to_pandas() \
        .set_index("event_id")
    # ties share the min rank: both 5.0 rows get (1-1)/(3-1) = 0.0
    assert got.loc[1, "pct_rank"] == 0.0
    assert got.loc[2, "pct_rank"] == 0.0
    assert got.loc[3, "pct_rank"] == 1.0
    assert got.loc[4, "pct_rank"] == 0.0  # singleton group pinned


def test_query_param_keys_parsing(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines import mining

    urls = ["https://a.com/p?id=1&utm=x",
            "https://a.com/q?id=2",
            "https://a.com/r",          # no query
            "https://b.com/s?flag"]     # bare key without '='
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()), "url": urls,
        "text": ["x"] * 4,
        "links": pa.array([[]] * 4, pa.list_(pa.string()))}),
        tmp_path / "lp.parquet")
    import nacc_form_validator_ray.pipelines.queries as Q
    orig = Q._linked_pages_path
    Q._linked_pages_path = lambda sf: str(tmp_path / "lp.parquet")
    try:
        got = mining.q_query_param_keys("ignored")
    finally:
        Q._linked_pages_path = orig
    d = {(r.host, r.param_key): r.n for r in got.itertuples()}
    assert d == {("a.com", "id"): 2, ("a.com", "utm"): 1,
                 ("b.com", "flag"): 1}


# ---------------------------- batch 10 -------------------------------

def test_weighted_median_crossing(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_weighted_median_price

    # prices 10,20,30 with quantity weights 1,1,3 (cents 100,100,300):
    # cum = 100,200,500; total 500 -> 2*cum: 200,400,1000 — the
    # half-weight point (250) falls in 30's block, so 30 is the
    # weighted median
    pq.write_table(pa.table({
        "l_extendedprice": pa.array([10.0, 20.0, 30.0]),
        "l_quantity": pa.array([1.0, 1.0, 3.0])}),
        tmp_path / "lineitem.parquet")
    got = q_weighted_median_price(str(tmp_path))
    assert got.loc[0, "weighted_median_price_d"] == 30
    assert got.loc[0, "total_weight"] == 500
    # balanced case: weights 1,2,1 -> 2*cum: 200,600,800 vs total 400
    # crosses at the middle price
    pq.write_table(pa.table({
        "l_extendedprice": pa.array([10.0, 20.0, 30.0]),
        "l_quantity": pa.array([1.0, 2.0, 1.0])}),
        tmp_path / "lineitem.parquet")
    got = q_weighted_median_price(str(tmp_path))
    assert got.loc[0, "weighted_median_price_d"] == 20


def test_mad_outliers_lower_median_and_gate(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_mad_outliers_events

    # type 'a' values (cents): 100,100,102,104,1000
    # lower median = 102; devs = 2,2,0,2,898; MAD (lower median of
    # sorted devs 0,2,2,2,898) = 2; gate 3*2=6 -> only 1000 flagged
    vals = [1.0, 1.0, 1.02, 1.04, 10.0]
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "user_id": pa.array([0] * 5, pa.int64()),
        "event_type": ["a"] * 5,
        "ts": pa.array([np.datetime64("2026-01-01", "us")] * 5,
                       pa.timestamp("us")),
        "value": pa.array(vals), "props": ["{}"] * 5}),
        tmp_path / "events.parquet")
    got = q_mad_outliers_events(str(tmp_path)).to_pandas()
    assert list(got["event_id"]) == [4]
    assert got.loc[0, "med_c"] == 102
    assert got.loc[0, "mad_c"] == 2


def test_host_reciprocity_counts():
    from nacc_form_validator_ray.stages.graph import host_reciprocity

    ds = _page_ds([
        ("https://a.com/1", ["https://b.com/x", "https://c.com/x"]),
        ("https://b.com/1", ["https://a.com/y"]),
        ("https://c.com/1", []),
    ])
    got = host_reciprocity(ds)
    # pairs: (a,b) mutual, (a,c) one-way -> 1 of 2
    assert got.loc[0, "n_pairs"] == 2
    assert got.loc[0, "n_mutual"] == 1
    assert got.loc[0, "reciprocity"] == 0.5


# ---------------------------- batch 11 -------------------------------

def test_hll_estimate_within_expected_error(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_hll_estimate_users

    n = 5000
    rng = np.random.RandomState(17)
    users = rng.choice(np.arange(1, 2001, dtype=np.int64), n)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(users),
        "event_type": ["click"] * n,
        "ts": pa.array([np.datetime64("2026-01-01", "us")] * n,
                       pa.timestamp("us")),
        "value": pa.array(np.zeros(n)), "props": ["{}"] * n}),
        tmp_path / "events.parquet")
    got = q_hll_estimate_users(str(tmp_path))
    n_exact = int(got.loc[0, "n_exact"])
    assert n_exact == len(np.unique(users))
    # order-of-magnitude sanity: the RAW estimator over the bare
    # Knuth-multiplicative hash biases high on dense sequential ids
    # (~+70% here — no avalanche step; documented in the query), so
    # this pins sanity, not the 13% ideal-hash sigma
    assert 0.25 < got.loc[0, "raw_estimate"] / n_exact < 2.0
    # the estimate is the exact integer floor quotient (review: both
    # float routes are un-oracleable — order-sensitive sums and
    # DuckDB's double-rounding HUGEINT->DOUBLE cast)
    assert got["raw_estimate"].dtype == np.int64
    assert got.loc[0, "raw_estimate"] > 0


def test_top_terms_per_lang_selection(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_top_terms_per_lang

    docs = [("en", "aa bb aa cc aa bb"), ("en", "aa dd"),
            ("es", "xx yy xx"), (None, "zz zz qq")]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": [d[1] for d in docs],
        "lang": pa.array([d[0] for d in docs], pa.string()),
        "source": ["t"] * len(docs),
        "n_chars": pa.array([9] * len(docs), pa.int64())}),
        tmp_path / "documents.parquet")
    got = q_top_terms_per_lang(str(tmp_path))
    en = got.loc[got["lang"] == "en"]
    assert list(en["tok"])[:2] == ["aa", "bb"]  # 4x, 2x
    assert en.iloc[0]["c"] == 4
    # null lang is the '' class
    assert set(got.loc[got["lang"] == "", "tok"]) == {"zz", "qq"}


# ------------- batch 12: clustering / cross-host dups / sentences ----

def _with_linkpages(tmp_path, table, fn):
    import pyarrow.parquet as pq

    import nacc_form_validator_ray.pipelines.queries as Q
    pq.write_table(table, tmp_path / "lp12.parquet")
    orig = Q._linked_pages_path
    Q._linked_pages_path = lambda sf: str(tmp_path / "lp12.parquet")
    try:
        return fn("ignored")
    finally:
        Q._linked_pages_path = orig


def test_host_clustering_triangle_plus_pendant(tmp_path):
    import pyarrow as pa

    from nacc_form_validator_ray.pipelines import mining

    # hosts a,b,c form a triangle; d hangs off a (degree 1)
    table = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "url": ["https://a.com/1", "https://b.com/1",
                "https://c.com/1", "https://d.com/1"],
        "text": ["", "", "", ""],
        "links": pa.array([["https://b.com/x", "https://c.com/x",
                            "https://d.com/x"],
                           ["https://c.com/x"], [], []],
                          pa.list_(pa.string()))})
    got = _with_linkpages(tmp_path, table, mining.q_host_clustering)
    rows = {r.host: (r.degree, r.n_tri, r.clustering)
            for r in got.itertuples()}
    assert rows["a.com"] == (3, 1, pytest.approx(1 / 3))
    assert rows["b.com"] == (2, 1, 1.0)
    assert rows["c.com"] == (2, 1, 1.0)
    assert rows["d.com"] == (1, 0, 0.0)


def test_host_clustering_edgeless(tmp_path):
    import pyarrow as pa

    from nacc_form_validator_ray.pipelines import mining

    table = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "url": ["https://a.com/1"], "text": [""],
        "links": pa.array([[]], pa.list_(pa.string()))})
    got = _with_linkpages(tmp_path, table, mining.q_host_clustering)
    assert len(got) == 0


def test_cross_host_dup_shared_lines(tmp_path):
    import pyarrow as pa

    from nacc_form_validator_ray.pipelines import mining

    # a.com and b.com share two distinct lines (one of them repeated —
    # distinctness must dedup it); b.com/c.com share only one line
    table = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "url": ["https://a.com/1", "https://b.com/1",
                "https://c.com/1"],
        "text": ["common one\ncommon two\ncommon one\nunique a",
                 "common one\ncommon two\nonly bc",
                 "only bc\nunique c\n\n"],
        "links": pa.array([[], [], []], pa.list_(pa.string()))})
    got = _with_linkpages(tmp_path, table,
                          mining.q_cross_host_dup_report)
    rows = {(r.host_a, r.host_b): r.n_shared for r in got.itertuples()}
    # threshold 2: only (a, b) qualifies
    assert rows == {("a.com", "b.com"): 2}


def test_sentence_stats_edge_cases(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_sentence_stats_docs

    docs = ["One two. Three! Four?",    # 3 sentences: 7, 6, 5 chars
            "...",                       # terminators only: 0
            "",                          # empty: 0
            " . ! ? ",                   # ws-only segments: 0
            "É.",                        # unicode: 1 sentence, 1 char
            "no terminator at all",      # 1 sentence (to end of doc)
            "a.b"]                       # 2 sentences: 1 + 1
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(["en"] * len(docs)),
        "source": pa.array(["s"] * len(docs)),
        "n_chars": pa.array([len(d) for d in docs], pa.int64())}),
        tmp_path / "documents.parquet")
    got = q_sentence_stats_docs(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_sentences"].tolist() == [3, 0, 0, 0, 1, 1, 2]
    assert got["mean_sentence_chars"].tolist() == pytest.approx(
        [(7 + 6 + 5) / 3, 0.0, 0.0, 0.0, 1.0,
         len("no terminator at all"), 1.0])


def test_rule_attribution_consistency():
    from nacc_form_validator_ray.pipelines.queries import (
        q_quality_filter, q_rule_attribution_docs)

    sf = "/root/testdata/sf0.001"
    attr = q_rule_attribution_docs(sf)
    qf = q_quality_filter(sf).to_pandas()
    # DOC_RULES' min/max pairs are mutually exclusive per field, so
    # n_errors == number of violated FIELDS: sole-violation totals must
    # match the docs with exactly one error
    assert int(attr["n_sole"].sum()) == int((qf["n_errors"] == 1).sum())
    assert (attr["n_sole"] <= attr["n_violations"]).all()
    assert int(attr["n_violations"].sum()) >= \
        int((~qf["passed"]).sum())
    assert sorted(attr["field"]) == attr["field"].tolist()


# ----------------- batch 13: co-citation / diversity / dangling ------

def test_host_cocitation_known_graph(tmp_path):
    import pyarrow as pa

    from nacc_form_validator_ray.pipelines import mining

    # s1 and s2 both link to {x, y}; s1 also links z (x,y co-cited by
    # 2 sources; x,z and y,z only by 1 -> below threshold)
    table = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "url": ["https://s1.com/a", "https://s2.com/a"],
        "text": ["", ""],
        "links": pa.array(
            [["https://x.com/1", "https://y.com/1", "https://z.com/1"],
             ["https://x.com/2", "https://y.com/2"]],
            pa.list_(pa.string()))})
    got = _with_linkpages(tmp_path, table, mining.q_host_cocitation)
    rows = {(r.host_a, r.host_b): r.n_common for r in got.itertuples()}
    assert rows == {("x.com", "y.com"): 2}


def test_dangling_hosts_known_graph(tmp_path):
    import pyarrow as pa

    from nacc_form_validator_ray.pipelines import mining

    # a links to b twice (distinct pages) and to c; b links back to a;
    # c and the linkless page host d have no out-edges -> dangling
    table = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "url": ["https://a.com/1", "https://a.com/2",
                "https://b.com/1", "https://d.com/1"],
        "text": ["", "", "", ""],
        "links": pa.array(
            [["https://b.com/x"], ["https://b.com/y",
                                   "https://c.com/x"],
             ["https://a.com/z"], []],
            pa.list_(pa.string()))})
    got = _with_linkpages(tmp_path, table, mining.q_dangling_hosts)
    rows = {r.host: r.n_inlinks for r in got.itertuples()}
    # distinct DIRECTED edges: a->b, a->c, b->a; dangling = c (1
    # inlink) and d (0)
    assert rows == {"c.com": 1, "d.com": 0}


def test_host_lang_gini_mixed_host(tmp_path):
    import pyarrow as pa

    from nacc_form_validator_ray.pipelines import mining

    en = "the cat and the dog was at it for the day"
    es = "de la que el en y los del se las por un para"
    table = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "url": ["https://m.com/1", "https://m.com/2",
                "https://m.com/3", "https://p.com/1"],
        "text": [en, en, es, en],
        "links": pa.array([[], [], [], []], pa.list_(pa.string()))})
    got = _with_linkpages(tmp_path, table, mining.q_host_lang_gini)
    rows = {r.host: (r.n_pages, r.lang_gini) for r in got.itertuples()}
    # m.com: 2 en + 1 es -> 1 - (4+1)/9 = 4/9; p.com pure -> 0
    assert rows["m.com"] == (3, pytest.approx(4 / 9))
    assert rows["p.com"] == (1, 0.0)


def test_token_length_histogram_matches_naive(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import re

    from nacc_form_validator_ray.pipelines.mining import \
        q_token_length_histogram

    docs = ["aa bbb C dddd", "", "ü über x", "zzzzzzzzzz a"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(["en"] * len(docs)),
        "source": pa.array(["s"] * len(docs)),
        "n_chars": pa.array([len(d) for d in docs], pa.int64())}),
        tmp_path / "documents.parquet")
    got = q_token_length_histogram(str(tmp_path))
    want: dict = {}
    for d in docs:
        for tok in re.findall("[a-z]+", d.lower()):
            # BYTE length (ü lowers to 2 utf-8 bytes but is not [a-z])
            L = len(tok.encode())
            want[L] = want.get(L, 0) + 1
    assert dict(zip(got["token_len"], got["n"])) == want


# --------- batch 14: RFM / deltas / embedding range / moving avg -----

def test_customer_rfm_known_orders(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import q_customer_rfm

    day = 86_400_000_000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    # c1: 3 orders, newest, richest; c2: 2 orders; c3: 1 old cheap;
    # c4: 1 oldest
    rows = [(1, 0), (1, 5), (1, 10), (2, 3), (2, 7), (3, 2), (4, 1)]
    price = [100.0, 100.0, 100.0, 50.0, 50.0, 10.0, 5.0]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(len(rows), dtype=np.int64)),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array(
            [base + r[1] * np.timedelta64(1, "D") for r in rows],
            pa.timestamp("us")),
        "o_totalprice": pa.array(price, pa.float64()),
        "o_orderstatus": pa.array(["O"] * len(rows)),
        "o_orderpriority": pa.array(["1"] * len(rows))}),
        tmp_path / "orders.parquet")
    got = q_customer_rfm(str(tmp_path)).to_pandas() \
        .sort_values("custkey").reset_index(drop=True)
    r = got.set_index("custkey")
    assert r.loc[1, "recency_days"] == 0          # anchor = day 10
    assert r.loc[2, "recency_days"] == 3
    assert r.loc[4, "recency_days"] == 9
    assert r.loc[1, "n_orders"] == 3
    assert r.loc[1, "monetary_cents"] == 30000
    # 4 customers -> each NTILE(4) bucket holds exactly one
    assert r.loc[1, "r_tile"] == 1 and r.loc[4, "r_tile"] == 4
    assert r.loc[1, "f_tile"] == 1
    assert r.loc[1, "rfm_score"] == 111


def test_daily_count_delta_lag_semantics(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_daily_count_delta

    base = np.datetime64("2024-03-01T10:00:00", "us")
    day = np.timedelta64(1, "D")
    ts = [base, base, base + day, base + 3 * day,  # click: 2,1,1 (gap)
          base, base + day]                        # view: 1,1
    types = ["click", "click", "click", "click", "view", None]
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(len(ts), dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1] * len(ts), pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array([0.0] * len(ts)),
        "props": pa.array(["{}"] * len(ts))}),
        tmp_path / "events.parquet")
    got = q_daily_count_delta(str(tmp_path)).to_pandas()
    got = got.sort_values(["event_type", "day"]).reset_index(drop=True)
    # null type excluded; click day4 delta vs day2 (LAG over PRESENT
    # days, no calendar fill)
    assert got["event_type"].tolist() == ["click"] * 3 + ["view"]
    assert got["n"].tolist() == [2, 1, 1, 1]
    assert got["delta"].tolist() == [2, -1, 0, 1]


def test_embedding_dim_minmax_exact(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_embedding_dim_minmax

    vecs = np.array([[1.5, -2.0], [0.5, 3.25], [-1.0, 0.0]],
                    dtype=np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(3, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(["a", "b", "c"])}),
        tmp_path / "embeddings.parquet")
    got = q_embedding_dim_minmax(str(tmp_path))
    assert got["dim"].tolist() == [1, 2]
    assert got["vmin"].tolist() == [-1.0, -2.0]
    assert got["vmax"].tolist() == [1.5, 3.25]
    assert got["vrange"].tolist() == [2.5, 5.25]


def test_monthly_revenue_ma3_window(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_monthly_revenue_ma3

    # four months, revenue_ch = cents * (100 - disc_h)
    months = ["2023-01-15", "2023-02-15", "2023-03-15", "2023-04-15"]
    price = [10.0, 20.0, 30.0, 40.0]
    pq.write_table(pa.table({
        "l_shipdate": pa.array(
            [np.datetime64(m + "T00:00:00", "us") for m in months],
            pa.timestamp("us")),
        "l_extendedprice": pa.array(price, pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.10, 0.0], pa.float64())}),
        tmp_path / "lineitem.parquet")
    got = q_monthly_revenue_ma3(str(tmp_path))
    rev = [100000, 200000, 270000, 400000]
    assert got["revenue_ch"].tolist() == rev
    assert got["ma3"].tolist() == pytest.approx([
        rev[0] / 1, (rev[0] + rev[1]) / 2,
        sum(rev[:3]) / 3, sum(rev[1:]) / 3])


# --------------------------------------------------------------------------
# batch 15 — flesch, bad phrases, CUSUM, dense-rank ties, norm histogram
# --------------------------------------------------------------------------

def _write_docs(tmp_path, texts, sources=None):
    import pyarrow as pa
    import pyarrow.parquet as pq
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n),
        "source": pa.array(sources or ["s0"] * n),
        "n_chars": pa.array([len(t or "") for t in texts],
                            pa.int64())}),
        tmp_path / "documents.parquet")


def test_flesch_pages_formula_and_degenerate(tmp_path, monkeypatch):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines import queries as Q
    from nacc_form_validator_ray.pipelines.mining import q_flesch_pages

    texts = ["The cat sat. It purred!",   # W=6 S=2 Y=6
             "no punctuation here",        # S=0 -> flesch pinned 0.0
             "",                           # W=S=Y=0
             "bcd fgh."]                   # Y=0 (no vowels)
    lp = str(tmp_path / "linked.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "url": pa.array(["https://h.example.org/doc/%d" % i
                         for i in range(len(texts))]),
        "text": pa.array(texts, pa.string()),
        "links": pa.array([[]] * len(texts),
                          pa.list_(pa.string()))}), lp)
    monkeypatch.setattr(Q, "_linked_pages_path", lambda sf: lp)
    got = q_flesch_pages(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    def ref(text):
        import re
        w = len(re.findall(r"[A-Za-z]+", text))
        s = len(re.findall(r"[.!?]+", text))
        y = len(re.findall(r"[AEIOUYaeiouy]+", text))
        num = 206835 * s * w - 1015 * w * w - 84600 * y * s
        fl = num / (1000.0 * s * w) if s * w > 0 else 0.0
        return w, s, y, num, fl

    for i, t in enumerate(texts):
        w, s, y, num, fl = ref(t)
        row = got.iloc[i]
        assert (row["n_words"], row["n_sents"], row["n_syll"]) \
            == (w, s, y)
        assert row["flesch_num"] == num
        assert row["flesch"] == fl
    # sanity: the first text is the classic short-sentence case
    assert got.iloc[0]["flesch"] > 90


def test_bad_phrase_docs_counts(tmp_path):
    from nacc_form_validator_ray.pipelines.mining import (
        BAD_PHRASES, q_bad_phrase_docs)

    _write_docs(tmp_path, [
        "a table scan then another table scan",   # 2 occurrences
        "hash join here",                          # 1
        None,                                      # null text -> 0
        "nothing relevant",
        "sort merge",                              # null source -> ''
    ], sources=["a", "a", "b", "b", None])
    got = q_bad_phrase_docs(str(tmp_path))
    idx = {(r.source, r.phrase): (r.n_docs_hit, r.n_occurrences)
           for r in got.itertuples()}
    assert idx[("a", "table scan")] == (1, 2)
    assert idx[("a", "hash join")] == (1, 1)
    assert idx[("b", "table scan")] == (0, 0)
    # null source rides the '' contract (review finding)
    assert idx[("", "sort merge")] == (1, 1)
    # every (source, phrase) cell is present, zeros included
    assert len(got) == 3 * len(BAD_PHRASES)


def test_cusum_max_events_level_shift(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_cusum_max_events

    # type "shift": 4 low then 4 high values -> peak at k=4;
    # type "flat": constant -> every dev 0, ties resolve to k=1
    vals = [1.0, 1.0, 1.0, 1.0, 9.0, 9.0, 9.0, 9.0] + [5.0] * 3
    types = ["shift"] * 8 + ["flat"] * 3
    n = len(vals)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array([base + np.timedelta64(i, "s")
                        for i in range(n)], pa.timestamp("us")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n)}),
        tmp_path / "events.parquet")
    got = q_cusum_max_events(str(tmp_path)) \
        .set_index("event_type")
    # brute force for "shift": vm = value*1000
    vm = (np.array(vals[:8]) * 1000).astype(np.int64)
    pre = np.cumsum(vm)
    dev = np.abs(8 * pre - np.arange(1, 9) * pre[-1])
    assert got.loc["shift", "max_dev"] == dev.max()
    assert got.loc["shift", "at_k"] == int(np.argmax(dev)) + 1 == 4
    assert got.loc["flat", "max_dev"] == 0
    assert got.loc["flat", "at_k"] == 1


def test_dense_rank_top_prices_keeps_all_ties(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_dense_rank_top_prices

    # brand A: top price 9.00 twice (both kept, drk=1), then 8.00
    # (drk=2), then 7.00 (dropped). brand B: single row.
    rows = [("A", 1, 9.00), ("A", 2, 9.00), ("A", 3, 8.00),
            ("A", 4, 7.00), ("B", 5, 1.23)]
    pq.write_table(pa.table({
        "p_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "p_name": pa.array(["x"] * 5),
        "p_brand": pa.array([r[0] for r in rows]),
        "p_type": pa.array(["t"] * 5),
        "p_size": pa.array([1] * 5, pa.int32()),
        "p_retailprice": pa.array([r[2] for r in rows])}),
        tmp_path / "part.parquet")
    got = q_dense_rank_top_prices(str(tmp_path))
    assert got["p_partkey"].tolist() == [1, 2, 3, 5]
    assert got["drk"].tolist() == [1, 1, 2, 1]
    assert got["price_cents"].tolist() == [900, 900, 800, 123]


def test_embedding_norm_histogram_buckets(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_embedding_norm_histogram

    # label 0: zero vector -> s=0 -> bucket floor_log2(1) = 0
    # label 1: unit vector -> s=4096^2 -> bucket 24
    vecs = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]
    labels = [0, 1, 1]
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(3, dtype=np.int64)),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}),
        tmp_path / "embeddings.parquet")
    got = q_embedding_norm_histogram(str(tmp_path))
    idx = {(r.label, r.bucket): r.n for r in got.itertuples()}
    assert idx[(0, 0)] == 1
    assert idx[(1, 24)] == 1          # floor_log2(4096^2 + 1) = 24
    assert idx[(1, 25)] == 1          # 2 * 4096^2 + 1 -> 25
    assert got["n"].sum() == 3


# --------------------------------------------------------------------------
# batch 16 — late arrivals, source-priority dedup, inverted index,
# distinctive terms, neighbor-set Jaccard
# --------------------------------------------------------------------------

def test_late_events_audit_known_stream(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_late_events_audit

    # user 1 arrival order (event_id): ts = 10, 30, 20, 25, 40
    #   -> events at ts 20 (late by 10) and 25 (late by 5) arrive
    #      after the running max 30; user 2 is monotone
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts1 = [10, 30, 20, 25, 40]
    ts2 = [1, 2, 3]
    ts = [base + np.timedelta64(t, "s") for t in ts1 + ts2]
    n = len(ts)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1] * 5 + [2] * 3, pa.int64()),
        "event_type": pa.array(["t"] * n),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n)}),
        tmp_path / "events.parquet")
    got = q_late_events_audit(str(tmp_path)).set_index("user_id")
    assert got.loc[1, "n_events"] == 5
    assert got.loc[1, "n_late"] == 2
    assert got.loc[1, "max_late_us"] == 10 * 1_000_000
    assert got.loc[2, "n_late"] == 0
    assert got.loc[2, "max_late_us"] == 0


def test_source_priority_dedup_prefers_first_source(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_source_priority_dedup

    # same normalized content from sources c, a, b -> 'a' copy wins;
    # whitespace variants collapse to one hash; unique doc survives
    texts = ["Hello   world", "hello world", "HELLO WORLD ", "other"]
    srcs = ["c", "a", "b", "z"]
    pq.write_table(pa.table({
        "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(srcs),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        tmp_path / "documents.parquet")
    got = q_source_priority_dedup(str(tmp_path))
    assert len(got) == 2
    kept = {(r.source, r.doc_id) for r in got.itertuples()}
    assert kept == {("a", 11), ("z", 13)}


def test_inverted_index_prefix_truncates_at_8(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_inverted_index_prefix

    # "zz" appears in 10 docs (prefix keeps first 8 ids), twice in
    # doc 0; "rare" in one doc only
    texts = ["zz zz rare"] + ["zz"] * 9
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        tmp_path / "documents.parquet")
    got = q_inverted_index_prefix(str(tmp_path)).set_index("tok")
    assert got.loc["zz", "df"] == 10
    assert got.loc["zz", "tot"] == 11
    assert got.loc["zz", "posting_prefix"] == "0,1,2,3,4,5,6,7"
    assert got.loc["rare", "df"] == 1
    assert got.loc["rare", "posting_prefix"] == "0"


def test_distinctive_terms_flags_exclusive_token(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_distinctive_terms

    # "spam" only in source b; shared filler tokens everywhere
    texts = ["the cat", "the dog", "spam spam the", "spam the"]
    srcs = ["a", "a", "b", "b"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(4, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(srcs),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        tmp_path / "documents.parquet")
    got = q_distinctive_terms(str(tmp_path))
    top_b = got[got["source"] == "b"].iloc[0]
    assert top_b["tok"] == "spam"
    # n_a=4 n_b=5 N=9: dev = (9-5)*3 - 5*0 = 12
    assert top_b["dev"] == 12
    assert top_b["c"] == 3


def test_host_neighbor_jaccard_known_graph(tmp_path):
    import pyarrow as pa

    from nacc_form_validator_ray.pipelines import mining

    # in-neighbor sets: x <- {s1, s2, s3}; y <- {s1, s2};
    # pair (x, y): shared=2, jacc = 2 / (3 + 2 - 2) = 2/3
    table = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "url": ["https://s1.com/a", "https://s2.com/a",
                "https://s3.com/a"],
        "text": ["", "", ""],
        "links": pa.array(
            [["https://x.com/1", "https://y.com/1"],
             ["https://x.com/2", "https://y.com/2"],
             ["https://x.com/3"]],
            pa.list_(pa.string()))})
    got = _with_linkpages(tmp_path, table, mining.q_host_neighbor_jaccard)
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["host_a"], r["host_b"]) == ("x.com", "y.com")
    assert r["n_shared"] == 2
    assert (r["in_a"], r["in_b"]) == (3, 2)
    assert r["jacc"] == 2.0 / 3.0


# --------------------------------------------------------------------------
# batch 17 — Benford audit, FK orphans, share-of-parent rollup
# --------------------------------------------------------------------------

def _write_orders(tmp_path, totals, custkeys=None):
    import pyarrow as pa
    import pyarrow.parquet as pq
    n = len(totals)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(custkeys or [1] * n, pa.int64()),
        "o_orderdate": pa.array(
            [np.datetime64("2024-01-01", "us")] * n, pa.timestamp("us")),
        "o_totalprice": pa.array(totals, pa.float64()),
        "o_orderstatus": pa.array(["O"] * n),
        "o_orderpriority": pa.array(["1-URGENT"] * n)}),
        tmp_path / "orders.parquet")


def test_benford_first_digits(tmp_path):
    from nacc_form_validator_ray.pipelines.mining import \
        q_benford_order_totals

    # cents: 12345, 999, -50 (digit 5 via abs), 0.004 -> 0 cents
    _write_orders(tmp_path, [123.45, 9.99, -0.50, 0.004])
    got = q_benford_order_totals(str(tmp_path)).set_index("digit")
    assert got.loc[1, "n"] == 1     # 12345
    assert got.loc[9, "n"] == 1     # 999
    assert got.loc[5, "n"] == 1     # |-50|
    assert got.loc[0, "n"] == 1     # zero cents pins digit 0
    assert got["share"].sum() == pytest.approx(1.0)


def test_fk_orphans_counts(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import q_fk_orphans

    # orders 0,1 exist; lineitem rows point at 0, 0, 7 (one orphan key,
    # two clean); order custkeys 1 (exists), 9 (orphan);
    # customer nationkeys 0 (exists), 3 (orphan)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([0, 0, 7], pa.int64()),
        "l_partkey": pa.array([1, 1, 1], pa.int64()),
        "l_quantity": pa.array([1.0, 1.0, 1.0]),
        "l_extendedprice": pa.array([1.0, 1.0, 1.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
        "l_tax": pa.array([0.0, 0.0, 0.0]),
        "l_shipdate": pa.array(
            [np.datetime64("2024-01-01", "us")] * 3,
            pa.timestamp("us"))}), tmp_path / "lineitem.parquet")
    _write_orders(tmp_path, [10.0, 20.0], custkeys=[1, 9])
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["a", "b"]),
        "c_nationkey": pa.array([0, 3], pa.int32()),
        "c_mktsegment": pa.array(["BUILDING"] * 2)}),
        tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int32()),
        "n_name": pa.array(["ALGERIA"]),
        "n_regionkey": pa.array([0], pa.int32())}),
        tmp_path / "nation.parquet")
    got = q_fk_orphans(str(tmp_path)).set_index("edge")
    assert got.loc["lineitem.l_orderkey", "n_child"] == 3
    assert got.loc["lineitem.l_orderkey", "n_orphan"] == 1
    assert got.loc["orders.o_custkey", "n_orphan"] == 1
    assert got.loc["customer.c_nationkey", "n_orphan"] == 1


def test_nation_revenue_share_hierarchy(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.mining import \
        q_nation_revenue_share

    # region R0 holds nations A (30.00) and B (10.00): shares .75/.25
    _write_orders(tmp_path, [30.0, 10.0], custkeys=[1, 2])
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["a", "b"]),
        "c_nationkey": pa.array([0, 1], pa.int32()),
        "c_mktsegment": pa.array(["BUILDING"] * 2)}),
        tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["A", "B"]),
        "n_regionkey": pa.array([0, 0], pa.int32())}),
        tmp_path / "nation.parquet")
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0], pa.int32()),
        "r_name": pa.array(["R0"])}),
        tmp_path / "region.parquet")
    got = q_nation_revenue_share(str(tmp_path))
    assert got["n_name"].tolist() == ["A", "B"]
    assert got["rev_cents"].tolist() == [3000, 1000]
    assert got["region_cents"].tolist() == [4000, 4000]
    assert got["share"].tolist() == [0.75, 0.25]


# ------------------------------------------------------------------ batch 50

def test_host_crawl_waterfill_budget_and_cap(ray_session):
    from nacc_form_validator_ray.pipelines.mining import (
        _HOST_WF_DEN, q_host_crawl_waterfill)

    out = q_host_crawl_waterfill("/root/testdata/sf0.001")
    assert (out["n_alloc"] <= out["n_pages"]).all()
    total = int(out["n_pages"].sum())
    alloc = int(out["n_alloc"].sum())
    assert alloc <= total // _HOST_WF_DEN
    # the cap is maximal: raising every capped host by one would
    # overshoot (unless nothing was capped)
    capped = out[out["n_alloc"] < out["n_pages"]]
    if len(capped):
        assert alloc + len(capped) > total // _HOST_WF_DEN
