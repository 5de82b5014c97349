"""Crafted-input tests for the web-cleaning and host-graph operators.

The driver tables carry no messy URLs or multi-line text, so these
tests build adversarial rows directly (boundary punctuation, utm
params in every position, dangling hosts, rank sinks) and check the
engine both against hand-computed expectations and against the DuckDB
SQL twins over a crafted parquet file.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nacc_form_validator_ray.pipelines.queries import (
    sql_c4_filter_pages, sql_host_pagerank, sql_url_normalize_pages)
from nacc_form_validator_ray.stages.graph import PR_SCALE, host_pagerank
from nacc_form_validator_ray.stages.webclean import (c4_line_filter,
                                                     normalize_urls)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


# ------------------------------------------------------------ C4 filter


def test_c4_line_rules():
    docs = [
        # 3 good lines -> kept document, text = the good lines only
        "the quick brown fox jumps high.\n"
        "short line\n"
        "every good sentence ends with punctuation!\n"
        "Enable JavaScript to continue browsing here.\n"
        "does this line have five words?",
        # only 2 good lines -> dropped (min_kept_lines=3)
        "one two three four five six.\nseven eight nine ten eleven!",
        # lorem ipsum anywhere -> dropped even with good lines
        "alpha beta gamma delta epsilon zeta.\n"
        "lorem ipsum dolor sit amet today.\n"
        "eta theta iota kappa lambda mu.",
        # curly brace -> dropped
        "function f() { return 1; }\n"
        "alpha beta gamma delta epsilon zeta.\n"
        "eta theta iota kappa lambda mu.\n"
        "nu xi omicron pi rho sigma.",
        # empty text
        "",
    ]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}))
    out = c4_line_filter(ds).to_pandas().set_index("doc_id").sort_index()

    assert out.loc[0, "keep"]
    assert out.loc[0, "n_lines"] == 5 and out.loc[0, "n_kept"] == 3
    assert out.loc[0, "text"] == (
        "the quick brown fox jumps high.\n"
        "every good sentence ends with punctuation!\n"
        "does this line have five words?")
    assert not out.loc[1, "keep"] and out.loc[1, "n_kept"] == 2
    # lorem-ipsum doc: lines survive but document is dropped
    assert not out.loc[2, "keep"] and out.loc[2, "n_kept"] == 3
    assert not out.loc[3, "keep"] and out.loc[3, "n_kept"] == 3
    assert not out.loc[4, "keep"] and out.loc[4, "n_kept"] == 0
    assert out.loc[4, "text"] == ""


def test_c4_filter_vs_duckdb_crafted(tmp_path):
    rng = np.random.RandomState(7)
    words = ["alpha", "beta", "gamma", "javascript", "lorem", "ipsum",
             "{x}", "end."]
    docs = []
    for _ in range(60):
        lines = [" ".join(rng.choice(words, rng.randint(0, 9)))
                 + rng.choice(["", ".", "!", "?", '"'])
                 for _ in range(rng.randint(0, 7))]
        docs.append("\n".join(lines))
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})
    path = os.path.join(tmp_path, "pages.parquet")
    df.to_parquet(path)
    eng = c4_line_filter(rd.read_parquet(path)).to_pandas()
    sql = duckdb.sql(sql_c4_filter_pages(path)).df()
    pd.testing.assert_frame_equal(_canon(eng), _canon(sql),
                                  check_dtype=False)


# --------------------------------------------------------- URL normalize


def test_url_normalization_rules():
    urls = [
        "HTTP://WWW.Example.COM:80/a/b/?utm_source=x#frag",
        "https://example.com:443/a/b",
        "https://example.com/a/b/",
        "http://example.com/a/b?id=3&utm_campaign=z",
        "https://sub.example.com/a/b",
        None,
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(urls), dtype=np.int64)),
        "url": pa.array(urls, type=pa.string())}))
    out = normalize_urls(ds).to_pandas().set_index("doc_id").sort_index()
    # rows 0-2 all canonicalize to the same url
    assert out.loc[0, "norm_url"] == "https://example.com/a/b"
    assert out.loc[1, "norm_url"] == "https://example.com/a/b"
    assert out.loc[2, "norm_url"] == "https://example.com/a/b"
    assert out.loc[3, "norm_url"] == "https://example.com/a/b?id=3"
    assert out.loc[4, "norm_url"] == "https://sub.example.com/a/b"
    # min-id representative election within the duplicate group
    assert bool(out.loc[0, "is_canonical"])
    assert not bool(out.loc[1, "is_canonical"])
    assert not bool(out.loc[2, "is_canonical"])
    assert bool(out.loc[3, "is_canonical"])


def test_url_normalize_vs_duckdb_crafted(tmp_path):
    rng = np.random.RandomState(11)
    hosts = ["a.com", "WWW.A.com", "b.org:443", "c.net"]
    urls = []
    for i in range(80):
        h = hosts[rng.randint(len(hosts))]
        scheme = "http" if rng.rand() < 0.5 else "https"
        path = f"/p/{rng.randint(5)}" + ("/" if rng.rand() < 0.4 else "")
        q = ["", "?utm_source=s", "?id=1&utm_medium=m",
             "?utm_x=1&id=2"][rng.randint(4)]
        f = "#top" if rng.rand() < 0.3 else ""
        urls.append(f"{scheme}://{h}{path}{q}{f}")
    df = pd.DataFrame({"doc_id": np.arange(len(urls), dtype=np.int64),
                       "url": urls})
    path = os.path.join(tmp_path, "urls.parquet")
    df.to_parquet(path)
    eng = normalize_urls(rd.read_parquet(path)).to_pandas()
    sql = duckdb.sql(sql_url_normalize_pages(path)).df()
    pd.testing.assert_frame_equal(_canon(eng), _canon(sql),
                                  check_dtype=False)


# ------------------------------------------------------------- PageRank


def _ref_pagerank(pages, iterations=5):
    """Driver-side fixed-point reference: same integer recurrence."""
    import re

    def host(u):
        m = re.match(r"^https?://([^/?#]+)", u or "")
        h = (m.group(1) if m else "").lower()
        h = re.sub(r"^www\.", "", h)
        return re.sub(r":(443|80)$", "", h)

    nodes = sorted({host(u) for u, _ in pages})
    n = len(nodes)
    outdeg, edges = {}, []
    for u, links in pages:
        s = host(u)
        for lk in links:
            outdeg[s] = outdeg.get(s, 0) + 1
        for lk in links:
            d = host(lk)
            if d in set(nodes):
                edges.append((s, d))
    r = {h: PR_SCALE // n for h in nodes}
    tele = ((PR_SCALE // n) * 15) // 100
    for _ in range(iterations):
        nxt = {h: tele for h in nodes}
        for s, d in edges:
            nxt[d] += (85 * r[s]) // (100 * outdeg[s])
        r = nxt
    return r


def test_host_pagerank_crafted():
    # hub -> {a, b}; a -> hub; b dangling; external target ignored;
    # c isolated (teleport only)
    pages = [
        ("https://hub.com/1", ["https://a.com/x", "https://b.com/y"]),
        ("http://WWW.A.com/2", ["https://hub.com/z",
                                "https://offsite.example/x"]),
        ("https://b.com:443/3", []),
        ("https://c.com/4", []),
    ]
    ds = rd.from_arrow(pa.table({
        "url": pa.array([u for u, _ in pages]),
        "links": pa.array([l for _, l in pages],
                          type=pa.list_(pa.string()))}))
    out = host_pagerank(ds, num_partitions=4).to_pandas() \
        .set_index("host")["rank_fp"].to_dict()
    assert out == _ref_pagerank(pages)
    # isolated host holds exactly the 5x-compounded teleport floor
    assert out["c.com"] < out["hub.com"]


def test_host_pagerank_vs_duckdb_crafted(tmp_path):
    rng = np.random.RandomState(3)
    rows = []
    for i in range(50):
        h = f"h{rng.randint(8)}.com"
        links = [f"https://h{rng.randint(10)}.com/d/{rng.randint(9)}"
                 for _ in range(rng.randint(0, 5))]
        rows.append((f"https://{h}/doc/{i}", links))
    path = os.path.join(tmp_path, "linked.parquet")
    pa.parquet.write_table(pa.table({
        "url": pa.array([u for u, _ in rows]),
        "links": pa.array([l for _, l in rows],
                          type=pa.list_(pa.string()))}), path)
    eng = host_pagerank(rd.read_parquet(path)).to_pandas()
    sql = duckdb.sql(sql_host_pagerank(path)).df()
    pd.testing.assert_frame_equal(_canon(eng), _canon(sql),
                                  check_dtype=False)
    # float rank is the single correctly-rounded division of rank_fp
    np.testing.assert_array_equal(
        eng["rank"].to_numpy(),
        eng["rank_fp"].to_numpy().astype(np.float64) / float(PR_SCALE))


# ------------------------------------------------ inlink / dup spans


def test_inlink_stats_crafted():
    from nacc_form_validator_ray.stages.graph import inlink_stats
    pages = [
        ("https://a.com/1", ["https://b.com/x", "https://b.com/y",
                             "https://offsite.example/z"]),
        ("https://b.com/2", ["https://b.com/self", "https://a.com/p"]),
        ("https://c.com/3", ["https://b.com/q"]),
    ]
    ds = rd.from_arrow(pa.table({
        "url": pa.array([u for u, _ in pages]),
        "links": pa.array([l for _, l in pages],
                          type=pa.list_(pa.string()))}))
    out = inlink_stats(ds, num_partitions=4).to_pandas() \
        .set_index("host").sort_index()
    # b.com: 2 links from a, 1 self-link, 1 from c -> 4 inlinks, 3 srcs
    assert out.loc["b.com", "n_inlinks"] == 4
    assert out.loc["b.com", "n_src_hosts"] == 3
    assert out.loc["a.com", "n_inlinks"] == 1
    assert out.loc["a.com", "n_src_hosts"] == 1
    # c.com has no inlinks but is still reported
    assert out.loc["c.com", "n_inlinks"] == 0
    assert out.loc["c.com", "n_src_hosts"] == 0
    # offsite target is not a page host -> no row
    assert "offsite.example" not in out.index


def test_dup_ngram_spans_crafted():
    from nacc_form_validator_ray.stages.dedup import dup_ngram_spans
    docs = [
        # docs 0/1 share "alpha beta gamma delta" -> two overlapping
        # dup 3-grams at pos 0,1: coverage = min(3,1)+3 = 4 tokens
        "alpha beta gamma delta uniqueza tailza hereza",
        "alpha beta gamma delta uniquezb tailzb herezb",
        # within-doc repetition only -> NOT duplicated (needs >=2 docs)
        "spam ham eggs spam ham eggs spam ham eggs",
        # no tokens at all
        "12345 !!!",
        # shares nothing
        "totally different words everywhere now",
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs)}))
    out = dup_ngram_spans(ds, k=3, min_docs=2, num_partitions=4) \
        .to_pandas().set_index("doc_id").sort_index()
    for d in (0, 1):
        assert out.loc[d, "n_tokens"] == 7
        assert out.loc[d, "n_shingles"] == 5
        assert out.loc[d, "n_dup"] == 2
        assert out.loc[d, "dup_cov"] == 4
        assert out.loc[d, "dup_frac"] == 4.0 / 7.0
    assert out.loc[2, "n_dup"] == 0 and out.loc[2, "dup_cov"] == 0
    assert out.loc[3, "n_tokens"] == 0 and out.loc[3, "dup_frac"] == 0.0
    assert out.loc[4, "n_dup"] == 0


def test_dup_ngram_spans_hashed_matches_exact():
    """The 100-TB variant (hash exchange + exact-string verify pass)
    must return the same rows as the exact-string exchange."""
    from nacc_form_validator_ray.stages.dedup import dup_ngram_spans
    rng = np.random.RandomState(11)
    words = ["alpha", "beta", "gamma", "delta", "ep", "zeta", "eta"]
    docs = [" ".join(rng.choice(words, rng.randint(0, 15)))
            for _ in range(120)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs)}))
    exact = dup_ngram_spans(ds, k=3, min_docs=2, num_partitions=4,
                            via="exact").to_pandas()
    hashed = dup_ngram_spans(ds, k=3, min_docs=2, num_partitions=4,
                             via="hashed").to_pandas()
    pd.testing.assert_frame_equal(_canon(exact), _canon(hashed),
                                  check_dtype=False)


def test_dup_ngram_spans_vs_duckdb_crafted(tmp_path):
    from nacc_form_validator_ray.stages.dedup import dup_ngram_spans
    from nacc_form_validator_ray.pipelines.queries import \
        sql_dup_ngram_spans
    rng = np.random.RandomState(5)
    words = ["a", "bb", "ccc", "dd", "e", "fff", "gg"]
    docs = [" ".join(rng.choice(words, rng.randint(0, 12)))
            for _ in range(80)]
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})
    path = os.path.join(tmp_path, "docs.parquet")
    df.to_parquet(path)
    eng = dup_ngram_spans(rd.read_parquet(path), k=3,
                          min_docs=2).to_pandas()
    sql = duckdb.sql(sql_dup_ngram_spans(path)).df()
    pd.testing.assert_frame_equal(_canon(eng), _canon(sql),
                                  check_dtype=False)


# ----------------------------------------- composed cleaning pipelines


def test_web_clean_pages_composition(tmp_path):
    from nacc_form_validator_ray.pipelines.queries import \
        sql_web_clean_pages
    from nacc_form_validator_ray.stages.joins import hash_join
    from nacc_form_validator_ray.stages.webclean import (c4_line_filter,
                                                         normalize_urls)
    good = ("alpha beta gamma delta epsilon zeta.\n"
            "eta theta iota kappa lambda mu.\n"
            "nu xi omicron pi rho sigma.")
    rows = [
        # two crawls of the same canonical url: only doc 0 survives
        (0, "https://a.com/x", good),
        (1, "https://A.com/x/", good),
        # passes C4 but unique url
        (2, "http://b.com/y?utm_source=z", good),
        # canonical but fails C4
        (3, "https://c.com/z", "short.\nlines only here."),
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "url", "text"])
    path = os.path.join(tmp_path, "lp.parquet")
    df.to_parquet(path)
    urls = rd.read_parquet(path, columns=["doc_id", "url"])
    canon = normalize_urls(urls).filter(expr="is_canonical") \
        .select_columns(["doc_id", "norm_url"])
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    kept = hash_join(docs, canon, on=["doc_id"])
    out = c4_line_filter(kept.select_columns(["doc_id", "text"]))
    out = out.map_batches(lambda b: b.filter(b["keep"]),
                          batch_format="pyarrow").to_pandas()
    assert sorted(out["doc_id"]) == [0, 2]
    sql = duckdb.sql(sql_web_clean_pages(path)).df()
    assert sorted(sql["doc_id"]) == [0, 2]
    assert set(sql["norm_url"]) == {"https://a.com/x",
                                    "https://b.com/y"}


def test_domain_filter_crafted(tmp_path):
    from nacc_form_validator_ray.pipelines.queries import \
        sql_domain_filter_docs
    good = ("alpha beta gamma delta epsilon zeta.\n"
            "eta theta iota kappa lambda mu.\n"
            "nu xi omicron pi rho sigma.")
    bad = "short."
    rows = []
    # goodhost: 3/3 keep; badhost: 1 good doc among 4 -> rate 0.25,
    # its passing doc must flip to dropped
    for i in range(3):
        rows.append((i, f"https://goodhost.com/{i}", good))
    rows.append((3, "https://badhost.com/0", good))
    for i in range(4, 7):
        rows.append((i, f"https://badhost.com/{i}", bad))
    df = pd.DataFrame(rows, columns=["doc_id", "url", "text"])
    path = os.path.join(tmp_path, "lp.parquet")
    df.to_parquet(path)
    sql = duckdb.sql(sql_domain_filter_docs(path)).df() \
        .set_index("doc_id").sort_index()
    assert bool(sql.loc[3, "doc_keep"]) and not bool(sql.loc[3, "keep"])
    assert bool(sql.loc[0, "keep"])
    assert sql.loc[3, "host_keep_rate"] == 0.25


def test_url_blocklist_rules_and_order(tmp_path):
    from nacc_form_validator_ray.pipelines.queries import \
        sql_url_blocklist
    from nacc_form_validator_ray.stages.webclean import \
        url_blocklist_filter
    urls = [
        "https://ok.com/article",
        "https://fun.com/XXX-zone",            # adult (case-folded)
        "https://play.com/casino/poker",       # gambling
        "https://shop.com/x?click_id=99",      # tracker
        "https://shop.com/x?a=1&affiliate=b",  # tracker (& position)
        "https://bit.ly/abc",                  # shortener
        "https://spam.com/adult-casino",       # adult wins (rule order)
        None,
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(urls), dtype=np.int64),
                       "url": urls})
    path = os.path.join(tmp_path, "u.parquet")
    df.to_parquet(path)
    eng = url_blocklist_filter(rd.read_parquet(path)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert not eng.loc[0, "blocked"]
    assert eng.loc[1, "block_rule"] == "adult"
    assert eng.loc[2, "block_rule"] == "gambling"
    assert eng.loc[3, "block_rule"] == "tracker"
    assert eng.loc[4, "block_rule"] == "tracker"
    assert eng.loc[5, "block_rule"] == "shortener"
    assert eng.loc[6, "block_rule"] == "adult"
    assert not eng.loc[7, "blocked"] and eng.loc[7, "block_rule"] == ""
    sql = duckdb.sql(sql_url_blocklist(path)).df()
    pd.testing.assert_frame_equal(
        _canon(eng.reset_index()), _canon(sql), check_dtype=False)


def test_normalize_text_unicode_crafted():
    from nacc_form_validator_ray.stages.webclean import normalize_text
    import unicodedata
    # decomposed e + combining acute must compose to the same norm_text
    # as the precomposed form
    decomposed = "Café   du  Monde"
    precomposed = "Café du Monde"
    docs = [decomposed, precomposed, "  \t tabs\nand\nnewlines  ", ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs)}))
    out = normalize_text(ds).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "norm_text"] == out.loc[1, "norm_text"] \
        == "café du monde"
    assert out.loc[0, "norm_chars"] == 13
    assert out.loc[2, "norm_text"] == "tabs and newlines"
    assert out.loc[3, "norm_text"] == "" and out.loc[3, "norm_chars"] == 0
    # DuckDB twin agrees on the unicode inputs
    from nacc_form_validator_ray.pipelines.queries import \
        SQL_NORMALIZE_TEXT_DOCS
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})
    con = duckdb.connect()
    con.register("documents", df)
    sql = con.sql(SQL_NORMALIZE_TEXT_DOCS).df()
    pd.testing.assert_frame_equal(
        _canon(out.reset_index()), _canon(sql), check_dtype=False)


def test_incremental_ingest_semantics(tmp_path, monkeypatch):
    # existing corpus (even ids) holds /a and /b; delta (odd ids)
    # recrawls /a (drop), adds /c twice (one representative) and /d
    from nacc_form_validator_ray.pipelines import queries as Q
    rows = [
        (0, "https://h.com/a"),
        (2, "https://h.com/b"),
        (1, "https://H.com/a/"),        # dup of existing /a -> dropped
        (3, "https://h.com/c?utm_source=x"),
        (5, "https://h.com/c"),          # same canonical as 3
        (7, "https://h.com/d#frag"),
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "url"])
    df["text"] = "x"
    df["links"] = [[] for _ in rows]
    path = os.path.join(tmp_path, "lp.parquet")
    df.to_parquet(path)
    monkeypatch.setattr(Q, "_linked_pages_path", lambda sf: path)
    out = Q.q_incremental_ingest("ignored").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [3, 7]
    assert set(out["norm_url"]) == {"https://h.com/c",
                                    "https://h.com/d"}
    sql = duckdb.sql(Q.sql_incremental_ingest(path)).df()
    pd.testing.assert_frame_equal(_canon(out), _canon(sql),
                                  check_dtype=False)


def test_host_hits_crafted(tmp_path):
    from nacc_form_validator_ray.pipelines.queries import sql_host_hits
    from nacc_form_validator_ray.stages.graph import host_hits
    # star: hub.com links to a,b,c; a,b,c link back to hub.com
    pages = [
        ("https://hub.com/1", ["https://a.com/x", "https://b.com/x",
                               "https://c.com/x"]),
        ("https://a.com/1", ["https://hub.com/y"]),
        ("https://b.com/1", ["https://hub.com/y"]),
        ("https://c.com/1", ["https://hub.com/y"]),
        ("https://iso.com/1", []),
    ]
    path = os.path.join(tmp_path, "lp.parquet")
    pa.parquet.write_table(pa.table({
        "url": pa.array([u for u, _ in pages]),
        "links": pa.array([l for _, l in pages],
                          type=pa.list_(pa.string()))}), path)
    out = host_hits(rd.read_parquet(path), num_partitions=4) \
        .to_pandas().set_index("host")
    # hub.com tops both scores up to fixed-point floor rounding (the
    # ceil-divisor normalization can leave it one quantum below the
    # symmetric leaves); isolated host scores 0
    assert out.loc["hub.com", "hub_fp"] >= out["hub_fp"].max() - 2
    assert out.loc["hub.com", "auth_fp"] >= out["auth_fp"].max() - 2
    assert out.loc["iso.com", "hub_fp"] == 0
    assert out.loc["iso.com", "auth_fp"] == 0
    # a/b/c are symmetric
    assert len({out.loc[h, "auth_fp"] for h in
                ("a.com", "b.com", "c.com")}) == 1
    sql = duckdb.sql(sql_host_hits(path)).df()
    pd.testing.assert_frame_equal(
        _canon(out.reset_index()), _canon(sql), check_dtype=False)


def test_host_triangles_crafted_graph():
    """K4 on hosts a,b,c,d (4 triangles) plus a pendant edge d-e and a
    duplicate/multi-edge (must not double count) and a self-link
    (dropped)."""
    import ray.data as rd
    from nacc_form_validator_ray.stages.graph import host_triangles
    hosts = ["a.com", "b.com", "c.com", "d.com", "e.com"]
    links = {
        "a.com": ["b.com", "c.com", "d.com", "a.com"],  # self dropped
        "b.com": ["c.com", "d.com", "c.com"],           # dup edge
        "c.com": ["d.com"],
        "d.com": ["e.com"],
        "e.com": [],
    }
    df = pd.DataFrame({
        "url": [f"https://{h}/p{i}" for i, h in enumerate(hosts)],
        "links": [[f"https://{t}/x" for t in links[h]] for h in hosts],
    })
    out = host_triangles(rd.from_pandas(df))
    assert out["n_edges"].iloc[0] == 7   # K4 (6) + d-e
    assert out["n_triangles"].iloc[0] == 4


def test_host_triangles_zero_on_bipartite():
    import ray.data as rd
    from nacc_form_validator_ray.stages.graph import host_triangles
    df = pd.DataFrame({
        "url": [f"https://l{i}.com/p" for i in range(4)],
        "links": [[f"https://r{j}.com/x" for j in range(3)]
                  for _ in range(4)],
    })
    out = host_triangles(rd.from_pandas(df))
    assert out["n_edges"].iloc[0] == 12
    assert out["n_triangles"].iloc[0] == 0


def test_host_triangles_degree_orientation_same_count():
    """The degree-ordered orientation (skew path) must count exactly
    the same triangles as the lexicographic default — on a graph with
    a lexicographically-small hub ('a-hub.com' links everything)."""
    import ray.data as rd
    from nacc_form_validator_ray.stages.graph import host_triangles
    spokes = [f"s{i}.com" for i in range(8)]
    df = pd.DataFrame({
        "url": ["https://a-hub.com/p"] +
               [f"https://{s}/p" for s in spokes],
        "links": [[f"https://{s}/x" for s in spokes]] +
                 [[f"https://s{(i+1) % 8}.com/x"] for i in range(8)],
    })
    lex = host_triangles(rd.from_pandas(df), orientation="lex")
    deg = host_triangles(rd.from_pandas(df), orientation="degree")
    assert lex["n_triangles"].iloc[0] == deg["n_triangles"].iloc[0] > 0
    assert lex["n_edges"].iloc[0] == deg["n_edges"].iloc[0]


def test_host_kcore_crafted_cascade():
    """K5 plus a pendant chain hanging off it: the chain peels away in
    CASCADING rounds (t3 -> t2 -> t1 each become sub-k only after their
    child is removed), leaving exactly the K5 as the 4-core."""
    import ray.data as rd
    from nacc_form_validator_ray.stages.graph import host_kcore
    core = [f"c{i}.com" for i in range(5)]
    rows = []
    for i, h in enumerate(core):
        rows.append((f"https://{h}/p",
                     [f"https://{t}/x" for t in core if t != h]))
    # chain: c0 - t1 - t2 - t3
    rows.append(("https://t1.com/p", ["https://c0.com/x",
                                      "https://t2.com/x"]))
    rows.append(("https://t2.com/p", ["https://t3.com/x"]))
    rows.append(("https://t3.com/p", []))
    df = pd.DataFrame(rows, columns=["url", "links"])
    out = host_kcore(rd.from_pandas(df), k=4, rounds=6)
    assert sorted(out["host"]) == sorted(core)
    # k larger than any degree -> empty core
    out2 = host_kcore(rd.from_pandas(df), k=10, rounds=4)
    assert len(out2) == 0


def test_host_triangles_edgeless_graph_returns_zero_row():
    """Self-loops only / empty links: the exchanges are all-empty and
    schemaless — the engine must still return the twin's (0, 0) row."""
    import ray.data as rd
    from nacc_form_validator_ray.stages.graph import host_triangles
    df = pd.DataFrame({
        "url": ["https://a.com/p", "https://b.com/p"],
        "links": [["https://a.com/x"], []],
    })
    out = host_triangles(rd.from_pandas(df))
    assert out["n_edges"].iloc[0] == 0
    assert out["n_triangles"].iloc[0] == 0


def test_host_kcore_empty_core_keeps_object_dtype():
    import ray.data as rd
    from nacc_form_validator_ray.stages.graph import host_kcore
    df = pd.DataFrame({
        "url": ["https://a.com/p", "https://b.com/p"],
        "links": [["https://b.com/x"], []],
    })
    out = host_kcore(rd.from_pandas(df), k=5, rounds=3)
    assert len(out) == 0
    assert out["host"].dtype == object


def test_host_bfs_crafted_levels():
    """Path a - b - c - d plus an unreachable island x - y: levels
    count from the lexicographically smallest host; the island never
    appears."""
    import ray.data as rd
    from nacc_form_validator_ray.stages.graph import host_bfs
    df = pd.DataFrame({
        "url": ["https://a.com/p", "https://b.com/p",
                "https://c.com/p", "https://x.com/p"],
        "links": [["https://b.com/x"], ["https://c.com/x"],
                  ["https://d.com/x"], ["https://y.com/x"]],
    })
    out = host_bfs(rd.from_pandas(df), rounds=6)
    got = dict(zip(out["host"], out["dist"]))
    assert got == {"a.com": 0, "b.com": 1, "c.com": 2, "d.com": 3}


def test_host_bfs_rounds_cap_and_empty_graph():
    import ray.data as rd
    from nacc_form_validator_ray.stages.graph import host_bfs
    df = pd.DataFrame({
        "url": [f"https://h{i}.com/p" for i in range(5)],
        "links": [[f"https://h{i+1}.com/x"] for i in range(4)] + [[]],
    })
    out = host_bfs(rd.from_pandas(df), rounds=2)
    assert out["dist"].max() == 2 and len(out) == 3
    # edgeless graph (self-loop only) -> empty frame, stable dtypes
    df2 = pd.DataFrame({"url": ["https://a.com/p"],
                        "links": [["https://a.com/x"]]})
    out2 = host_bfs(rd.from_pandas(df2))
    assert len(out2) == 0 and out2["dist"].dtype == "int64"


# ------------------------------------------------------------------ batch 37

def test_lpa_mode_tiebreak_prefers_smallest_label():
    """The synchronous LPA winner is (count DESC, label ASC) — a 1-1
    neighbor-label tie must pick the lexicographically smaller one."""
    import pandas as pd

    cnt = pd.DataFrame({"host": ["x", "x", "y"],
                        "l": ["b", "a", "z"],
                        "c": [1, 1, 3]})
    cnt = cnt.sort_values(["host", "c", "l"],
                          ascending=[True, False, True])
    winner = cnt.drop_duplicates("host").set_index("host")["l"]
    assert winner["x"] == "a" and winner["y"] == "z"


def test_lpa_isolated_host_keeps_own_label(ray_session):
    """A page whose host never appears in any edge keeps itself as its
    community after every round."""
    import pyarrow as pa
    import ray.data as rd

    from nacc_form_validator_ray.stages.graph import \
        host_label_propagation

    t = pa.table({
        "url": ["http://a.example.org/1", "http://b.example.org/1",
                "http://lonely.example.org/1"],
        "links": [["http://b.example.org/x"], ["http://a.example.org/y"],
                  []],
    })
    out = host_label_propagation(rd.from_arrow(t), rounds=3)
    got = dict(zip(out["host"], out["community"]))
    assert got["lonely.example.org"] == "lonely.example.org"
    # the a<->b pair oscillates or converges, but stays inside {a, b}
    assert got["a.example.org"] in {"a.example.org", "b.example.org"}


def test_robots_precedence_longest_prefix_then_deny():
    """Rule precedence: longest prefix first, deny before allow on
    equal length, lowest rule id last — matches the twin's window."""
    rules = [(0, "*", "/doc", False), (1, "*", "/doc/12", True),
             (2, "*", "/doc/12", False)]
    order = sorted(rules, key=lambda r: (-len(r[2]), r[3], r[0]))
    # /doc/12 ties on length between rules 1 (allow) and 2 (deny):
    # deny (False) sorts first
    assert [r[0] for r in order] == [2, 1, 0]


def test_strip_html_arrow_real_markup():
    """Generic extractor on genuinely messy markup (not the webgen
    envelope): script/style bodies vanish entirely, comments vanish,
    tags become separators, the six entities decode (&amp; last so
    '&amp;lt;' yields literal '&lt;'), whitespace collapses."""
    import pyarrow as pa

    from nacc_form_validator_ray.stages.webclean import strip_html_arrow

    html = [
        "<html><head><title>T</title>"
        "<script type='x'>var a = '<p>sneaky</p>';</script>"
        "<style>.c { color: red }</style></head>"
        "<body><!-- hidden -->\n<div class='x'>Hello\n"
        "<b>world</b></div> &amp;lt; &quot;q&#39;s&quot; &nbsp; "
        "a&lt;b&gt;c</body></html>",
        None,
        "plain, no markup",
        "<p>unclosed",
    ]
    out = strip_html_arrow(pa.array(html, pa.string())).to_pylist()
    assert out[0] == "T Hello world &lt; \"q's\" a<b>c"
    assert out[1] == ""
    assert out[2] == "plain, no markup"
    assert out[3] == "unclosed"


def test_strip_html_arrow_binary_input_matches_envelope():
    """On the webgen envelope the generic extractor yields the title
    plus the body — a strict superset of the envelope stripper's
    byte-identical body text."""
    import pyarrow as pa

    from nacc_form_validator_ray.pipelines.webgen import (HTML_PREFIX,
                                                          HTML_SUFFIX)
    from nacc_form_validator_ray.stages.webclean import strip_html_arrow

    body = "the quick brown fox"
    html = HTML_PREFIX + body.encode() + HTML_SUFFIX
    out = strip_html_arrow(pa.array([html], pa.binary())).to_pylist()
    assert out == ["page " + body]
