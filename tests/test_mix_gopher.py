"""Unit tests for the Gopher quality gate and temperature mixing
(end-to-end oracle parity runs in scripts/check_oracle.py)."""

import numpy as np
import pandas as pd


def test_gopher_gate_discriminates_on_fixture():
    from nacc_form_validator_ray.pipelines.queries import \
        q_gopher_quality_docs
    df = q_gopher_quality_docs("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    # both outcomes occur (word-count and stop-word gates fire)
    assert 0 < df["passed"].sum() < len(df)
    # integer cross-multiplication gates recompute identically here
    recomputed = ((df.word_count >= 30) & (df.word_count <= 100_000)
                  & (3 * df.word_count <= df.nonspace_chars)
                  & (df.nonspace_chars <= 10 * df.word_count)
                  & (10 * df.symbol_count <= df.word_count)
                  & (5 * df.alpha_words >= 4 * df.word_count)
                  & (df.stop_hits >= 2)).astype(np.int64)
    assert (recomputed.to_numpy() == df["passed"].to_numpy()).all()


def test_gopher_symbol_and_alpha_legs_fire_on_crafted_text():
    import pyarrow as pa
    import pyarrow.compute as pc
    txt = pa.array(["ok words here", "### ... ### ...", "123 456 789"])
    sym = (pc.count_substring_regex(txt, "#").to_numpy()
           + pc.count_substring_regex(txt, r"\.\.\.").to_numpy())
    alpha = pc.count_substring_regex(
        txt, r"\S*[A-Za-z]\S*").to_numpy()
    assert list(sym) == [0, 8, 0]
    assert list(alpha) == [3, 0, 0]


def test_gopher_signals_differential_on_adversarial_text():
    """The fixture has no symbols/digits/uppercase, so the symbol and
    alpha legs never fire there — this differential proves the engine's
    pyarrow RE2 kernels and the twin's DuckDB RE2 functions agree on
    text that exercises every leg (#, ..., digits-only words, unicode,
    tabs/newlines, trailing whitespace)."""
    import random

    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc

    rng = random.Random(7)
    vocab = ["the", "a", "and", "of", "to", "in", "is", "it", "spark",
             "merge", "x1", "##", "...", "a#b", "1.2.3", "...word",
             "w...", "#tag", "12345", "mixedCASE", "Ω", "-", "_",
             "e.g."]
    docs = []
    for _ in range(400):
        n = rng.randint(0, 60)
        s = " ".join(rng.choice(vocab) for _ in range(n))
        if rng.random() < 0.3:
            s += "   "
        if rng.random() < 0.2:
            s += "\t\nx"
        docs.append(s)
    txt = pa.array(docs)
    stops = ("the", "a", "and", "of", "to", "in", "is", "it")

    wc = pc.count_substring_regex(txt, r"\S+").to_numpy() \
        .astype(np.int64)
    nonspace = pc.utf8_length(
        pc.replace_substring_regex(txt, r"\s+", "")).to_numpy() \
        .astype(np.int64)
    alpha = pc.count_substring_regex(txt, r"\S*[A-Za-z]\S*") \
        .to_numpy().astype(np.int64)
    sym = (pc.count_substring_regex(txt, "#").to_numpy()
           .astype(np.int64)
           + pc.count_substring_regex(txt, r"\.\.\.").to_numpy()
           .astype(np.int64))
    stop = np.zeros(len(docs), dtype=np.int64)
    for w in stops:
        stop += pc.match_substring_regex(txt, rf"\b{w}\b") \
            .to_numpy(zero_copy_only=False)

    con = duckdb.connect()
    con.register("docs", pa.table({
        "i": pa.array(range(len(docs))), "text": txt}))
    stop_sql = " + ".join(
        f"(CASE WHEN regexp_matches(text,'\\b{w}\\b') "
        "THEN 1 ELSE 0 END)" for w in stops)
    df = con.execute(f"""
        SELECT i, len(regexp_extract_all(text,'\\S+')) wc,
               length(regexp_replace(text,'\\s+','','g')) ns,
               len(regexp_extract_all(text,'\\S*[A-Za-z]\\S*')) al,
               len(regexp_extract_all(text,'#'))
                 + len(regexp_extract_all(text,'\\.\\.\\.')) sym,
               {stop_sql} st
        FROM docs ORDER BY i""").df()
    for eng, col in [(wc, "wc"), (nonspace, "ns"), (alpha, "al"),
                     (sym, "sym"), (stop, "st")]:
        assert (eng == df[col].to_numpy().astype(np.int64)).all(), col


def test_temperature_quota_math_upweights_small_sources():
    # alpha=0.5: quotas proportional to sqrt(count) — the small source
    # gets a larger share than its raw proportion
    counts = {"big": 900, "small": 100}
    k_total = sum(counts.values()) // 5          # 200
    w = {s: int(np.floor(np.sqrt(n))) for s, n in counts.items()}
    w_sum = sum(w.values())                      # 30 + 10 = 40
    quota = {s: (k_total * wi) // w_sum for s, wi in w.items()}
    assert quota == {"big": 150, "small": 50}
    # raw-proportional would have been 180/20; sqrt softens to 150/50
    assert quota["small"] / k_total > counts["small"] / 1000


def test_temperature_mix_selects_exact_quota_per_lang():
    from nacc_form_validator_ray.pipelines.queries import \
        q_temperature_mix_sample
    out = q_temperature_mix_sample("/root/testdata/sf0.001").to_pandas()
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    n = dict(con.execute(
        "SELECT lang, count(*) FROM documents GROUP BY 1").fetchall())
    k_total = sum(n.values()) // 5
    w = {s: int(np.floor(np.sqrt(c))) for s, c in n.items()}
    w_sum = sum(w.values())
    got = out.groupby("lang").size().to_dict()
    for lang, c in n.items():
        assert got.get(lang, 0) == (k_total * w[lang]) // w_sum
    # deterministic: re-running yields the same ids
    again = q_temperature_mix_sample(
        "/root/testdata/sf0.001").to_pandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])
