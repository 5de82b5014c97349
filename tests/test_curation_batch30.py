"""Batch-30: source KL divergence, rule-vs-classifier kappa, term
burstiness, cross-source near-dup matrix."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts, sources=None, langs=None):
    tmp_path.mkdir(parents=True, exist_ok=True)
    n = len(texts)
    sources = sources if sources is not None else ["s"] * n
    langs = langs if langs is not None else ["en"] * n
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) if t else 0 for t in texts],
                            pa.int64())}), tmp_path / "documents.parquet")
    return str(tmp_path)


def _oracle(sf_dir, name):
    from nacc_form_validator_ray.pipelines.curation import CUR_ORACLE_SQL
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    return con.execute(CUR_ORACLE_SQL[name]).df()


# ------------------------------------------------------------------- KL


def test_kl_single_source_is_zero(tmp_path):
    """One source: p_s == p_corpus for every token, so every grid log
    is exactly 0 and KL must be exactly 0.0."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_source_kl_divergence
    d = _write_docs(tmp_path, ["aa bb bb cc", "cc cc dd"])
    out = q_source_kl_divergence(d)
    assert len(out) == 1
    assert int(out.loc[0, "n_tokens"]) == 7
    assert float(out.loc[0, "kl_bits"]) == 0.0


def test_kl_disjoint_sources(tmp_path):
    """Two sources with disjoint vocab of equal mass: each source's
    tokens are twice as likely in-source as in-corpus, so KL = 1 bit
    exactly (log2(2) lands on the grid)."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_source_kl_divergence
    d = _write_docs(tmp_path, ["aa aa bb bb", "cc cc dd dd"],
                    sources=["s1", "s2"])
    out = q_source_kl_divergence(d).set_index("source")
    assert float(out.loc["s1", "kl_bits"]) == 1.0
    assert float(out.loc["s2", "kl_bits"]) == 1.0


def test_kl_matches_twin(tmp_path):
    from nacc_form_validator_ray.pipelines.curation import \
        q_source_kl_divergence
    d = _write_docs(tmp_path,
                    ["the cat sat", "the the dog", "frog frog frog",
                     "the cat ran far away", ""],
                    sources=["a", "a", "b", "b", "c"])
    out = q_source_kl_divergence(d)
    ora = _oracle(d, "source_kl_divergence")
    # source "c" holds only an empty doc: zero tokens -> no row on
    # either engine (sum over an empty term set)
    assert set(out["source"]) == set(ora["source"]) == {"a", "b"}
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True),
        ora.reset_index(drop=True), check_dtype=False)


# ---------------------------------------------------------------- kappa


def test_kappa_counts_and_formula():
    from nacc_form_validator_ray.pipelines.curation import \
        q_rule_classifier_kappa
    out = q_rule_classifier_kappa(SF)
    n = int(out.loc[0, "n"])
    tp, fp = int(out.loc[0, "tp"]), int(out.loc[0, "fp"])
    tn, fn = int(out.loc[0, "tn"]), int(out.loc[0, "fn"])
    assert tp + fp + tn + fn == n == 500
    e = (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)
    assert float(out.loc[0, "po"]) == (tp + tn) / n
    assert float(out.loc[0, "pe"]) == e / (n * n)
    if n * n != e:
        assert float(out.loc[0, "kappa"]) == \
            (n * (tp + tn) - e) / (n * n - e)
    assert -1.0 <= float(out.loc[0, "kappa"]) <= 1.0


# ----------------------------------------------------------- burstiness


def test_burstiness_poisson_vs_bursty(tmp_path):
    """'uni' once in each of 4 docs -> VMR = 0 (constant count);
    'bur' 4 times inside one doc -> VMR = (4*16-16)/(4*4) = 3.0."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_term_burstiness
    d = _write_docs(tmp_path, ["uni bur bur bur bur", "uni", "uni",
                               "uni"])
    out = q_term_burstiness(d).set_index("tok")
    assert int(out.loc["uni", "c"]) == 4
    assert int(out.loc["uni", "sum_sq"]) == 4
    assert float(out.loc["uni", "vmr"]) == 0.0
    assert int(out.loc["bur", "c"]) == 4
    assert int(out.loc["bur", "sum_sq"]) == 16
    assert float(out.loc["bur", "vmr"]) == 3.0


def test_burstiness_topk_tiebreak(tmp_path):
    """More than K tokens with equal counts: selection must be
    (c DESC, tok ASC) — identical to the twin's ORDER BY ... LIMIT."""
    from nacc_form_validator_ray.pipelines.curation import (
        _BURST_K, q_term_burstiness)
    import itertools
    letters = "abcdefghij"
    toks = ["w" + a + b for a, b in
            itertools.islice(itertools.product(letters, letters),
                             _BURST_K + 10)]
    d = _write_docs(tmp_path, [" ".join(toks)])
    out = q_term_burstiness(d)
    assert len(out) == _BURST_K
    assert list(out["tok"]) == sorted(toks)[:_BURST_K]
    ora = _oracle(d, "term_burstiness")
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  ora.reset_index(drop=True),
                                  check_dtype=False)


# ------------------------------------------------------- source matrix


def test_source_leakage_matrix_cross_feed(tmp_path):
    """Two near-identical docs in different sources must produce a
    cross-source cell; the self-duplicate inside one source lands on
    the diagonal."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_source_leakage_matrix
    boiler = ("the quick brown fox jumps over the lazy dog and then "
              "runs far away into the deep green forest tonight")
    d = _write_docs(tmp_path,
                    [boiler, boiler + " extra", "totally different "
                     "words about completely other topics here now",
                     boiler + " extra"],
                    sources=["feedA", "feedB", "feedA", "feedB"])
    out = q_source_leakage_matrix(d)
    ora = _oracle(d, "source_leakage_matrix")
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  ora.reset_index(drop=True),
                                  check_dtype=False)
    cells = {(r["source_a"], r["source_b"]): int(r["n_pairs"])
             for _, r in out.iterrows()}
    assert any(a != b for (a, b) in cells), cells


# ------------------------------------------------------------------ batch 36

def test_pq_rhu_signed_matches_sql_identity():
    """Round-half-up integer mean on signed sums: numpy's flooring //
    must equal the SQL twin's CASE over truncating division."""
    import numpy as np

    from nacc_form_validator_ray.pipelines.curation import _pq_rhu

    def sql_side(s, n):
        num, den = 2 * s + n, 2 * n
        if num >= 0:
            return num // den     # truncation == floor when num >= 0
        return -((-num + den - 1) // den)

    rng = np.random.RandomState(0)
    s = rng.randint(-10_000, 10_000, size=500).astype(np.int64)
    n = rng.randint(1, 40, size=500).astype(np.int64)
    got = _pq_rhu(s, n)
    want = np.array([sql_side(int(a), int(b)) for a, b in zip(s, n)])
    assert (got == want).all()
    # halfway cases round UP (toward +inf) on both engines
    assert _pq_rhu(np.array([3]), np.array([2]))[0] == 2      # 1.5 -> 2
    assert _pq_rhu(np.array([-3]), np.array([2]))[0] == -1    # -1.5 -> -1


def test_pq_assign_tie_breaks_to_smallest_code():
    import numpy as np

    from nacc_form_validator_ray.pipelines.curation import _pq_assign

    q = np.array([[0, 0]], dtype=np.int64)
    cents = np.array([[1, 0], [0, 1]], dtype=np.int64)  # both d2 = 1
    codes = np.array([3, 7], dtype=np.int64)
    assert _pq_assign(q, cents, codes)[0] == 3


def test_pq_codebook_covers_all_subspaces_and_is_grid_exact(tmp_path):
    """End-to-end over a tiny synthetic embeddings table: every
    subspace appears, cluster sizes sum to n per subspace, and each
    centroid equals the round-half-up mean of its members."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.curation import (
        _PQ_M, _pq_codebook_df)

    rng = np.random.RandomState(11)
    n, d = 40, 64
    emb = rng.uniform(-1, 1, size=(n, d)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                  "embedding": pa.array(list(emb),
                                        pa.list_(pa.float32())),
                  "label": pa.array(np.zeros(n, np.int32))})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    cb = _pq_codebook_df(str(tmp_path))
    assert set(cb["sub"]) == set(range(1, _PQ_M + 1))
    per_sub_n = cb.groupby(["sub", "dim"])["n"].sum()
    assert (per_sub_n == n).all()
    assert cb["comp"].abs().max() <= 4096 + 1


# ------------------------------------------------------------------ batch 39

def test_distinct_ngram_ratio_small_fixture(ray_session, tmp_path):
    """A source that repeats one bigram forever scores far lower than
    a source of fresh bigrams, and counts are exact."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.curation import \
        q_distinct_ngram_ratio

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "source": ["loop", "loop", "fresh", "fresh"],
        "text": ["spam ham spam ham spam ham",      # bigrams: 5 total
                 "spam ham spam ham",               # 3 total
                 "one two three four",              # 3 distinct
                 "five six seven eight"],           # 3 distinct
        "lang": ["en"] * 4,
        "n_chars": np.array([26, 17, 18, 20], dtype=np.int64),
    })
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    out = q_distinct_ngram_ratio(str(tmp_path)).set_index("source")
    # loop: bigrams (spam,ham)x5? -> "spam ham" 5, "ham spam" 3 -> 8
    # total, 2 distinct
    assert out.loc["loop", "n_total"] == 8
    assert out.loc["loop", "n_distinct"] == 2
    assert out.loc["fresh", "n_total"] == 6
    assert out.loc["fresh", "n_distinct"] == 6
    assert out.loc["fresh", "distinct_ppm"] == 1_000_000
    assert out.loc["loop", "distinct_ppm"] == 250_000


def test_quantile_normalize_strict_less_and_tie_semantics(ray_session,
                                                          tmp_path):
    """Quantile = #strictly-smaller * 1e6 // (n-1): ties share a
    quantile; min is 0; max is 1e6 when unique."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.curation import \
        q_quantile_normalize_docs

    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "source": ["s"] * 5,
        "text": ["x"] * 5,
        "lang": ["en"] * 5,
        "n_chars": np.array([10, 10, 20, 30, 40], dtype=np.int64),
    })
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    out = q_quantile_normalize_docs(str(tmp_path)).to_pandas() \
        .sort_values("doc_id")
    q = out["quantile_ppm"].tolist()
    assert q[0] == q[1] == 0              # tied minimum
    assert q[2] == 2 * 1_000_000 // 4     # 2 strictly smaller of n-1=4
    assert q[4] == 1_000_000              # unique maximum


# ------------------------------------------------------------------ batch 40

def test_topic_router_argmax_tie_and_fallback(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.curation import \
        q_topic_route_docs

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "source": ["s"] * 4,
        # doc0: 2 relational vs 1 streaming; doc1: 1-1 tie ->
        # 'commerce' < 'relational' wins; doc2: no lexicon word;
        # doc3: streaming only
        "text": ["table query stream",
                 "customer join",
                 "zzz yyy xxx",
                 "spark window window"],
        "lang": ["en"] * 4,
        "n_chars": np.array([18, 13, 11, 19], dtype=np.int64),
    })
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    out = q_topic_route_docs(str(tmp_path)).to_pandas() \
        .sort_values("doc_id")
    assert out["topic"].tolist() == \
        ["relational", "commerce", "other", "streaming"]
    assert out["hits"].tolist() == [2, 1, 0, 3]


# ------------------------------------------------------------------ batch 41

def test_corpus_checksum_is_partition_invariant(ray_session, tmp_path):
    """XOR and wrapped-sum checksums must be identical under any
    repartitioning — that is the whole point of the operator."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.curation import \
        q_corpus_checksum_by_shard

    rng = np.random.RandomState(4)
    n = 200
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [f"doc {i} " + "w" * int(rng.randint(1, 50))
                 for i in range(n)],
        "source": ["s"] * n, "lang": ["en"] * n,
        "n_chars": np.full(n, 10, dtype=np.int64),
    })
    t = pa.Table.from_pandas(docs, preserve_index=False)
    d1 = tmp_path / "a"; d1.mkdir()
    d2 = tmp_path / "b"; d2.mkdir()
    pq.write_table(t, str(d1 / "documents.parquet"))
    # reversed row order, different file layout
    pq.write_table(t.take(list(range(n - 1, -1, -1))),
                   str(d2 / "documents.parquet"))
    a = q_corpus_checksum_by_shard(str(d1))
    b = q_corpus_checksum_by_shard(str(d2))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 16 and (a["n_docs"].sum() == n)


# ------------------------------------------------------------------ batch 42

def test_bm25_rerank_is_permutation_of_candidates(ray_session):
    """The rerank must output exactly the BM25 top-k doc set with both
    rank columns forming permutations of 1..k."""
    import numpy as np

    from nacc_form_validator_ray.pipelines.curation import q_bm25_rerank
    from nacc_form_validator_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rer = q_bm25_rerank(sf)
    bm = QUERIES["bm25_search"](sf)
    import pandas as pd
    bm = bm if isinstance(bm, pd.DataFrame) else bm.to_pandas()
    assert set(rer["doc_id"].astype(np.int64)) \
        == set(bm["doc_id"].astype(np.int64))
    k = len(rer)
    assert sorted(rer["cos_rank"]) == list(range(1, k + 1))
    assert sorted(rer["bm25_rank"]) == list(range(1, k + 1))


def test_sample_estimate_inverse_probability_exactness(ray_session,
                                                       tmp_path):
    """tokens_est must be exactly DEN x the sampled token mass and the
    sample decision must follow the mod-P31 hash family."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.curation import (
        _EST_DEN, q_sample_estimate_audit)
    from nacc_form_validator_ray.stages.dedup import P31
    from nacc_form_validator_ray.stages.sampling import (SAMPLE_A,
                                                         SAMPLE_B)

    n = 64
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": ["s"] * n,
        "text": [" ".join(["w"] * (i + 1)) for i in range(n)],
        "lang": ["en"] * n,
        "n_chars": np.full(n, 5, dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    out = q_sample_estimate_audit(str(tmp_path))
    ids = docs["doc_id"].to_numpy()
    in_s = ((SAMPLE_A * (ids % P31) + SAMPLE_B) % P31) % _EST_DEN == 0
    want_exact = int((ids + 1).sum())
    want_est = int(_EST_DEN * (ids + 1)[in_s].sum())
    assert int(out["tokens_exact"].iloc[0]) == want_exact
    assert int(out["tokens_est"].iloc[0]) == want_est


# ------------------------------------------------------------------ batch 43

def test_first_touch_attribution_window_and_tie_rules(ray_session,
                                                      tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.curation import \
        q_first_touch_attribution

    base = pd.Timestamp("2025-06-01 12:00:00")
    h = pd.Timedelta(hours=1)
    rows = [
        # user 1: view 2h before purchase -> attributed 'view'
        (1, 1, base - 2 * h, "view"),
        (2, 1, base, "purchase"),
        # user 2: touch 25h before -> outside window -> 'direct'
        (3, 2, base - 25 * h, "click"),
        (4, 2, base, "purchase"),
        # user 3: touch at EXACTLY -24h -> inclusive -> 'signup'
        (5, 3, base - 24 * h, "signup"),
        (6, 3, base, "purchase"),
        # user 4: same-ts tie, smaller event_id counts as prior
        (7, 4, base, "click"),
        (8, 4, base, "purchase"),
        # user 5: purchase then later view: view after -> 'direct'
        (9, 5, base, "purchase"),
        (10, 5, base + h, "view"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type"])
    df["value"] = 0.0
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = q_first_touch_attribution(str(tmp_path)) \
        .set_index("attributed")["n_purchases"]
    assert out.to_dict() == {"click": 1, "direct": 2, "signup": 1,
                             "view": 1}


# ------------------------------------------------------------------ batch 44

def test_triplet_negative_never_collides(ray_session):
    from nacc_form_validator_ray.pipelines.curation import \
        q_triplet_mining

    out = q_triplet_mining("/root/testdata/sf0.001")
    assert len(out) == 50
    assert (out["negative_id"] != out["anchor_id"]).all()
    assert (out["negative_id"] != out["positive_id"]).all()
    assert out["negative_id"].between(0, 499).all()


def test_k_anonymity_counts_small_groups_exactly(ray_session,
                                                 tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.curation import \
        q_k_anonymity_audit

    base = pd.Timestamp("2025-06-01 10:00:00")
    # 6 events in one QI group (not small), 2 in another (small)
    rows = []
    for i in range(6):
        rows.append((i, 1, base, "view", 50.0))
    for i in range(2):
        rows.append((10 + i, 1, base, "view", 250.0))
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type", "value"])
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = q_k_anonymity_audit(str(tmp_path)).set_index("event_type")
    assert out.loc["view", "n_groups"] == 2
    assert out.loc["view", "n_small_groups"] == 1
    assert out.loc["view", "n_exposed_events"] == 2


# ------------------------------------------------------------------ batch 45

def test_prune_audit_clustered_beats_arrival(ray_session):
    """Sort-clustering must never reduce the skippable+full shard
    count vs arrival order, and per-layout totals must agree."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_rowgroup_prune_audit

    out = q_rowgroup_prune_audit("/root/testdata/sf0.001")
    per = out.groupby("layout")[["n_rows"]].sum()
    assert per.loc["arrival", "n_rows"] == per.loc["clustered",
                                                   "n_rows"]
    def prunable(layout):
        sel = (out["layout"] == layout) & \
            out["class"].isin(["skippable", "full"])
        return int(out.loc[sel, "n_shards"].sum())
    assert prunable("clustered") >= prunable("arrival")
    assert prunable("clustered") > 0


def test_threshold_solve_hits_target_rate(ray_session):
    from nacc_form_validator_ray.pipelines.curation import (
        _THRESH_TARGET_PPM, q_threshold_solve_keep_rate)

    out = q_threshold_solve_keep_rate("/root/testdata/sf0.001")
    row = out.iloc[0]
    assert row["keep_ppm"] <= _THRESH_TARGET_PPM
    # minimality: threshold - 1 would keep too many
    assert row["n_kept"] >= 0 and row["n_total"] > 0


# ------------------------------------------------------------------ batch 49

def test_decontam_flags_eval_docs_and_their_duplicates(ray_session,
                                                       tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.curation import \
        q_benchmark_decontam

    eval_text = "alpha beta gamma delta epsilon zeta"
    docs = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [eval_text, "one two three four five six",
                 "seven eight nine ten eleven twelve",
                 "thirteen fourteen fifteen sixteen seventeen eighteen",
                 "nineteen twenty one two three four",
                 # doc 5 copies an eval 5-gram -> contaminated
                 "noise alpha beta gamma delta epsilon noise",
                 # doc 6 shares only a 4-gram -> clean
                 "alpha beta gamma delta other words here",
                 "totally unrelated content goes right here"],
        "source": ["s"] * 8, "lang": ["en"] * 8,
        "n_chars": np.full(8, 30, dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    out = q_benchmark_decontam(str(tmp_path)).set_index("doc_id")
    assert bool(out.loc[0, "contaminated"])     # eval doc self-hits
    assert bool(out.loc[5, "contaminated"])     # verbatim 5-gram copy
    assert not bool(out.loc[6, "contaminated"])  # 4-gram only
    assert not bool(out.loc[7, "contaminated"])


# -------------------------------------------------- review-round regressions

def test_ivm_cutoff_splits_fixture_non_trivially(ray_session):
    """The cutoff must fall inside the fixture's time span so both the
    base and delta legs are exercised (review finding)."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_ivm_merge_counts

    out = q_ivm_merge_counts("/root/testdata/sf0.001")
    assert int(out["base_n"].sum()) > 0
    assert int(out["delta_n"].sum()) > 0
    assert (out["merged_n"] == out["base_n"] + out["delta_n"]).all()
    assert (out["merged_sum_c"]
            == out["base_sum_c"] + out["delta_sum_c"]).all()


def test_k_anonymity_negative_value_band_trunc(ray_session, tmp_path):
    """Negative event values must band by TRUNCATING division (the
    DuckDB // rule), not numpy floor (review finding)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.curation import \
        q_k_anonymity_audit

    base = pd.Timestamp("2025-06-01 10:00:00")
    df = pd.DataFrame({
        "event_id": np.arange(2, dtype=np.int64),
        "user_id": np.array([1, 1], dtype=np.int64),
        "ts": [base, base],
        "event_type": ["refund", "refund"],
        "value": [-50.0, 50.0],   # trunc: both band 0 -> ONE group
        "props": ["{}"] * 2})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = q_k_anonymity_audit(str(tmp_path))
    assert int(out["n_groups"].iloc[0]) == 1


def test_threshold_solve_returns_minimal_integer(ray_session,
                                                 tmp_path):
    """With a value gap, the solve must return prev_value + 1, not the
    next observed value (review finding)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.curation import \
        q_threshold_solve_keep_rate

    # 60 docs at 100 chars, 40 at 500: target 60% -> threshold 101
    n = 100
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["x"] * n, "source": ["s"] * n, "lang": ["en"] * n,
        "n_chars": np.array([100] * 60 + [500] * 40, dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    out = q_threshold_solve_keep_rate(str(tmp_path)).iloc[0]
    assert int(out["threshold"]) == 101
    assert int(out["n_kept"]) == 40


def test_triplet_negative_sentinel_on_two_vector_corpus(ray_session,
                                                        tmp_path):
    """A 2-vector corpus cannot have a non-colliding negative: both
    engines must emit the -1 sentinel instead of hanging (review
    finding)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.curation import \
        q_triplet_mining

    emb = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.9, 0.1]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0], pa.int32())})
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
    out = q_triplet_mining(str(tmp_path)).sort_values("anchor_id")
    assert out["negative_id"].tolist() == [-1, -1]
