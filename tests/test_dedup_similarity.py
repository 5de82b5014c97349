"""Tests for dedup (exact / MinHash-LSH / SimHash / blocked Jaccard),
similarity search, and multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from nacc_form_validator_ray.stages.dedup import (MinHasher, SimHasher,
                                                  blocked_jaccard_pairs,
                                                  exact_dedup,
                                                  minhash_candidate_pairs,
                                                  propagate_labels,
                                                  simhash_candidate_pairs)
from nacc_form_validator_ray.stages.similarity import (hyperplane_lsh_pairs,
                                                       knn_bruteforce)


def make_docs():
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight looking for food "
            "while the moon rises slowly over the quiet hills")
    docs = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base + " extra"},            # near-dup of 0
        {"doc_id": 2, "text": base},                       # exact dup of 0
        {"doc_id": 3, "text": "completely different words about database "
                              "query engines and vectorized execution "
                              "plans with columnar storage formats"},
        {"doc_id": 4, "text": "another unrelated document mentioning "
                              "mountains rivers valleys glaciers and "
                              "long hiking trails in the north"},
    ]
    return pd.DataFrame(docs)


def test_exact_dedup():
    df = make_docs()
    out = exact_dedup(rd.from_pandas(df)).to_pandas()
    kept = sorted(out["doc_id"])
    assert 2 not in kept           # exact dup of 0 dropped
    assert {0, 1, 3, 4} <= set(kept)


def test_minhash_estimates_jaccard():
    df = make_docs()
    sig = MinHasher(k=256).signatures(df["text"])
    est_01 = (sig[0] == sig[1]).mean()
    est_02 = (sig[0] == sig[2]).mean()
    est_03 = (sig[0] == sig[3]).mean()
    assert est_02 == 1.0
    assert est_01 > 0.7
    assert est_03 < 0.2


def test_minhash_lsh_pairs_dataset():
    df = make_docs()
    pairs = minhash_candidate_pairs(rd.from_pandas(df),
                                    threshold=0.7).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(pairs["id_a"],
                                              pairs["id_b"])}
    assert (0, 2) in found
    assert (0, 1) in found
    assert (1, 2) in found
    assert not any(3 in p or 4 in p for p in found)


def test_simhash_pairs():
    df = make_docs()
    sims = SimHasher().simhash(df["text"])
    assert sims[0] == sims[2]
    pairs = simhash_candidate_pairs(rd.from_pandas(df),
                                    max_hamming=3).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(pairs["id_a"],
                                              pairs["id_b"])}
    assert (0, 2) in found


def test_blocked_jaccard():
    df = make_docs()
    df["block"] = 0
    pairs = blocked_jaccard_pairs(rd.from_pandas(df), "block",
                                  threshold=0.5).to_pandas()
    by_pair = {(int(a), int(b)): j for a, b, j in
               zip(pairs["id_a"], pairs["id_b"], pairs["jaccard"])}
    assert by_pair[(0, 2)] == 1.0
    assert by_pair[(0, 1)] > 0.8


def test_blocked_jaccard_bucket_boundary_pair():
    """Round-3 VERDICT #4: a 63-token vs 64-token near-dup pair sits
    in adjacent length buckets (width 64) — the adjacent-bucket
    emission must still compare it, exactly once."""
    toks = [f"w{i}" for i in range(64)]
    a = " ".join(toks[:63])          # 63 tokens -> bucket 0
    b = " ".join(toks)               # 64 tokens -> bucket 1
    df = pd.DataFrame({
        "doc_id": np.array([10, 11], dtype=np.int64),
        "text": [a, b],
        "block": np.zeros(2, dtype=np.int64),
    })
    pairs = blocked_jaccard_pairs(rd.from_pandas(df), "block",
                                  threshold=0.5,
                                  length_bucket=64).to_pandas()
    # shingles of a are a subset of b's: jaccard = 61/62
    assert len(pairs) == 1  # found once, claimed by ONE partition
    assert pairs.iloc[0]["id_a"] == 10 and pairs.iloc[0]["id_b"] == 11
    assert abs(pairs.iloc[0]["jaccard"] - 61 / 62) < 1e-12


def test_propagate_labels_transitive():
    ids = rd.from_pandas(pd.DataFrame({"doc_id": [0, 1, 2, 3, 4, 5]}))
    # chain 0-1, 1-2, and isolated pair 4-5
    pairs = rd.from_pandas(pd.DataFrame({
        "id_a": [0, 1, 4], "id_b": [1, 2, 5]}))
    labels = propagate_labels(pairs, ids, rounds=3).to_pandas()
    lab = dict(zip(labels["doc_id"], labels["cluster"]))
    assert lab[0] == lab[1] == lab[2] == 0
    assert lab[3] == 3
    assert lab[4] == lab[5] == 4


def test_knn_bruteforce_exact():
    rng = np.random.RandomState(0)
    vecs = rng.normal(size=(200, 16))
    df = pd.DataFrame({"vec_id": np.arange(200),
                       "embedding": list(vecs)})
    queries = vecs[:3]
    out = knn_bruteforce(rd.from_pandas(df).repartition(4), queries,
                         query_ids=[0, 1, 2], k=5).to_pandas()
    # exact answer by full matmul
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = nv[:3] @ nv.T
    for q in range(3):
        order = np.argsort(-sims[q], kind="stable")
        expect = [i for i in order if i != q][:5]
        got = out[out["query_id"] == q].sort_values("rank")
        assert got["neighbor_id"].tolist() == expect
        assert np.allclose(got["cosine"].to_numpy(),
                           sims[q][expect], atol=1e-12)


def test_hyperplane_lsh_finds_near_duplicates():
    rng = np.random.RandomState(1)
    base = rng.normal(size=(50, 16))
    near = base[:5] + rng.normal(scale=0.01, size=(5, 16))
    vecs = np.vstack([base, near])
    df = pd.DataFrame({"vec_id": np.arange(55), "embedding": list(vecs)})
    pairs = hyperplane_lsh_pairs(rd.from_pandas(df), dim=16,
                                 n_planes=8, threshold=0.99).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(pairs["id_a"],
                                              pairs["id_b"])}
    hits = sum((i, 50 + i) in found for i in range(5))
    assert hits >= 4  # LSH recall with 8 planes should catch nearly all


def test_multimodal_plumbing():
    from nacc_form_validator_ray.stages.multimodal import (DecodeImage,
                                                           FrameSampler,
                                                           ImageFeatures)
    df = pd.DataFrame({
        "media_id": [0, 1],
        "payload": [b"\x01\x02" * 600, b"\x07\x08" * 900],
    })
    decoded = DecodeImage(size=(8, 8))(df)
    assert decoded["image"].iloc[0].shape == (8, 8, 3)
    # deterministic across calls
    again = DecodeImage(size=(8, 8))(df)
    assert (decoded["image"].iloc[0] == again["image"].iloc[0]).all()
    feats = ImageFeatures()(decoded)
    assert feats["image_features"].iloc[0].shape == (14,)
    frames = FrameSampler(frame_bytes=256, every_nth=2)(df)
    assert set(frames.columns) == {"media_id", "frame_index",
                                   "frame_payload"}
    assert (frames["frame_index"] % 2 == 0).all()
    assert len(frames[frames["media_id"] == 0]) > 0


def test_ivf_knn_recall_vs_bruteforce():
    from nacc_form_validator_ray.stages.similarity import ivf_knn
    rng = np.random.RandomState(2)
    # clustered vectors so IVF lists are meaningful
    centers = rng.normal(size=(6, 16)) * 3
    vecs = np.vstack([c + rng.normal(scale=0.4, size=(60, 16))
                      for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(len(vecs)),
                       "embedding": list(vecs)})
    queries = vecs[:4]
    exact = knn_bruteforce(rd.from_pandas(df), queries,
                           query_ids=[0, 1, 2, 3], k=10).to_pandas()
    approx = ivf_knn(rd.from_pandas(df).repartition(4), queries,
                     query_ids=[0, 1, 2, 3], k=10, n_centroids=6,
                     n_probe=3).to_pandas()
    recalls = []
    for q in range(4):
        e = set(exact[exact.query_id == q]["neighbor_id"])
        a = set(approx[approx.query_id == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.9


def test_line_dedup_crafted_and_duckdb_parity():
    """line_dedup on docs WITH real line structure (the synthetic
    corpus has no newlines, so the driver's gate only exercises the
    degenerate whole-text-as-one-line path)."""
    import duckdb
    from nacc_form_validator_ray.pipelines.queries import \
        SQL_LINE_DEDUP_DOCS
    from nacc_form_validator_ray.stages.dedup import line_dedup
    rng = np.random.RandomState(3)
    boiler = ["all rights reserved", "click here to subscribe", ""]
    docs = []
    for i in range(60):
        lines = [f"unique line {i}-{j}"
                 for j in range(rng.randint(1, 5))]
        for b in boiler:
            if rng.rand() < 0.5:
                lines.insert(rng.randint(0, len(lines) + 1), b)
        docs.append("\n".join(lines))
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "text": docs})
    out = line_dedup(rd.from_pandas(df).repartition(4),
                     min_docs=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    sql = con.sql(SQL_LINE_DEDUP_DOCS).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["doc_id", "text", "n_lines_dropped"]], sql,
        check_dtype=False)
    assert out["n_lines_dropped"].sum() > 0
    joined = "\n".join(out["text"])
    assert "all rights reserved" not in joined
    assert "unique line 0-0" in joined


def test_ivf_model_persistence_identical(tmp_path):
    """train_ivf_model → save → load must reproduce the inline-fit
    results bit-for-bit (VERDICT r2 #10: train once, reuse per run)."""
    from nacc_form_validator_ray.stages.similarity import (
        ivf_knn, save_ivf_model, train_ivf_model)
    rng = np.random.RandomState(5)
    centers = rng.normal(size=(4, 8)) * 3
    vecs = np.vstack([c + rng.normal(scale=0.3, size=(40, 8))
                      for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(len(vecs)),
                       "embedding": list(vecs)})
    ds = rd.from_pandas(df).repartition(3)
    queries, qids = vecs[:3], [0, 1, 2]
    inline = ivf_knn(ds, queries, qids, k=5, n_centroids=4,
                     n_probe=2).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    path = str(tmp_path / "ivf.json")
    save_ivf_model(train_ivf_model(ds, n_centroids=4), path)
    loaded = ivf_knn(ds, queries, qids, k=5, n_centroids=4, n_probe=2,
                     model_path=path).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(inline, loaded)


def test_audio_features_stub():
    from nacc_form_validator_ray.stages.multimodal import AudioFeatures
    rng = np.random.RandomState(0)
    pcm = (rng.normal(scale=0.2, size=4000) * 32767).astype("<i2")
    df = pd.DataFrame({"media_id": [0, 1],
                       "payload": [pcm.tobytes(), b""]})
    out = AudioFeatures()(df)
    f0 = out["audio_features"].iloc[0]
    assert f0.shape == (9,)
    assert f0[:8].mean() > 0.1          # energy present
    assert (out["audio_features"].iloc[1] == 0).all()
    again = AudioFeatures()(df)
    assert (again["audio_features"].iloc[0] == f0).all()


def test_asof_join_matches_pandas():
    from nacc_form_validator_ray.stages.joins import asof_join
    rng = np.random.RandomState(4)
    left = pd.DataFrame({
        "k": rng.randint(0, 5, 60),
        "t": rng.randint(0, 1000, 60).astype("int64"),
        "lv": np.arange(60),
    })
    right = pd.DataFrame({
        "k": rng.randint(0, 5, 40),
        "t": rng.randint(0, 1000, 40).astype("int64"),
        "rv": np.arange(40) * 10,
    })
    out = asof_join(rd.from_pandas(left).repartition(3),
                    rd.from_pandas(right).repartition(2),
                    by="k", on="t").to_pandas()
    expect = pd.merge_asof(
        left.sort_values("t"), right.sort_values("t"), on="t", by="k",
        direction="backward", allow_exact_matches=False,
        suffixes=("", "_right"))
    out = out.sort_values("lv").reset_index(drop=True)
    expect = expect.sort_values("lv").reset_index(drop=True)
    assert out["lv"].tolist() == expect["lv"].tolist()
    assert out["rv"].fillna(-1).tolist() == \
        expect["rv"].fillna(-1).tolist()


def test_range_join_bucketed():
    from nacc_form_validator_ray.stages.joins import range_join_bucketed
    left = pd.DataFrame({"iid": [0, 1, 2],
                         "lo": [0.0, 10.0, 5.0],
                         "hi": [5.0, 20.0, 15.0]})
    right = pd.DataFrame({"pid": np.arange(30),
                          "val": np.linspace(0, 25, 30)})
    out = range_join_bucketed(rd.from_pandas(left),
                              rd.from_pandas(right),
                              lo="lo", hi="hi", value="val",
                              bucket_width=4.0).to_pandas()
    expect = set()
    for _, l in left.iterrows():
        for _, r in right.iterrows():
            if l["lo"] <= r["val"] < l["hi"]:
                expect.add((int(l["iid"]), int(r["pid"])))
    got = {(int(a), int(b)) for a, b in zip(out["iid"], out["pid"])}
    assert got == expect


def test_minhash_signatures_content_deterministic_across_batches():
    """Signatures must depend on document CONTENT only — batch-local
    token coding would miss every near-dup pair spanning a batch
    boundary (round-2 regression)."""
    from nacc_form_validator_ray.stages.dedup import MinHasher
    mh = MinHasher()
    doc = ("the quick brown fox jumps over the lazy dog again and "
           "again for testing purposes")
    s1 = mh.signatures(pd.Series(["unrelated filler words", doc]))[1]
    s2 = mh.signatures(pd.Series([doc, "other content entirely"]))[0]
    assert (s1 == s2).all()
    near = mh.signatures(pd.Series([doc + " extra"]))[0]
    assert (s1 == near).mean() > 0.5  # near-dup still collides


def test_hash_join_inner_and_left():
    import ray.data as rd
    from nacc_form_validator_ray.stages.joins import hash_join
    left = pd.DataFrame({"k": [1, 2, 3, 4], "lv": ["a", "b", "c", "d"]})
    right = pd.DataFrame({"k": [2, 3, 3, 5], "rv": [20, 30, 31, 50]})
    inner = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                      on="k", num_partitions=4).to_pandas() \
        .sort_values(["k", "rv"]).reset_index(drop=True)
    expect = left.merge(right, on="k").sort_values(["k", "rv"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(inner, expect)
    lj = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                   on="k", how="left", num_partitions=4).to_pandas() \
        .sort_values(["k", "rv"]).reset_index(drop=True)
    assert len(lj) == 5 and lj["rv"].isna().sum() == 2


def test_hash_join_full_outer():
    import ray.data as rd
    from nacc_form_validator_ray.stages.joins import hash_join
    left = pd.DataFrame({"k": [1, 2, 3, 4], "lv": ["a", "b", "c", "d"]})
    right = pd.DataFrame({"k": [2, 3, 3, 5], "rv": [20, 30, 31, 50]})
    fj = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                   on="k", how="full", num_partitions=4).to_pandas() \
        .sort_values(["k", "rv"]).reset_index(drop=True)
    expect = left.merge(right, on="k", how="outer") \
        .sort_values(["k", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(fj, expect, check_dtype=False)
    # unmatched rows of BOTH sides survive
    assert set(fj["k"]) == {1, 2, 3, 4, 5}
    assert fj["lv"].isna().sum() == 1 and fj["rv"].isna().sum() == 2


def test_hash_join_multi_key():
    import ray.data as rd
    from nacc_form_validator_ray.stages.joins import hash_join
    left = pd.DataFrame({"a": [1, 1, 2], "b": ["x", "y", "x"],
                         "lv": [10, 11, 12]})
    right = pd.DataFrame({"a": [1, 2], "b": ["y", "x"],
                          "rv": [100, 200]})
    out = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    on=["a", "b"], num_partitions=4).to_pandas() \
        .sort_values("lv").reset_index(drop=True)
    assert out["lv"].tolist() == [11, 12]
    assert out["rv"].tolist() == [100, 200]


def test_anti_join_bloom_matches_plain_anti_join():
    import ray.data as rd
    from nacc_form_validator_ray.stages.joins import anti_join
    from nacc_form_validator_ray.stages.bloom import anti_join_bloom
    rng = np.random.RandomState(5)
    left = pd.DataFrame({
        "k": rng.randint(0, 5000, size=3000).astype(np.int64),
        "payload": np.arange(3000),
    })
    keys = pd.DataFrame({"k": rng.choice(5000, size=400,
                                         replace=False).astype(np.int64)})
    plain = anti_join(rd.from_pandas(left), rd.from_pandas(keys),
                      on="k", num_partitions=8).to_pandas() \
        .sort_values("payload").reset_index(drop=True)
    bloom = anti_join_bloom(rd.from_pandas(left).materialize(),
                            rd.from_pandas(keys), on="k",
                            n_bits=1 << 16,
                            num_partitions=8).to_pandas() \
        .sort_values("payload").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        bloom[["k", "payload"]], plain[["k", "payload"]],
        check_dtype=False)
    expect = left[~left["k"].isin(keys["k"])]
    assert len(plain) == len(expect)


def test_anti_join_bloom_string_keys():
    import ray.data as rd
    from nacc_form_validator_ray.stages.bloom import anti_join_bloom
    left = pd.DataFrame({"u": [f"https://h/{i}" for i in range(200)]})
    keys = pd.DataFrame({"u": [f"https://h/{i}" for i in range(0, 200,
                                                              7)]})
    out = anti_join_bloom(rd.from_pandas(left).materialize(),
                          rd.from_pandas(keys), on="u",
                          n_bits=1 << 14, num_partitions=4).to_pandas()
    expect = left[~left["u"].isin(keys["u"])]
    assert sorted(out["u"]) == sorted(expect["u"])


def test_semi_join_bloom_matches_plain_semi_join():
    """A tiny bitmap (high fp rate) forces false positives through the
    prefilter — the exact semi join must adjudicate every one."""
    import ray.data as rd
    from nacc_form_validator_ray.stages.bloom import semi_join_bloom
    from nacc_form_validator_ray.stages.joins import semi_join
    rng = np.random.RandomState(11)
    left = pd.DataFrame({
        "k": rng.randint(0, 5000, size=3000).astype(np.int64),
        "payload": np.arange(3000),
    })
    keys = pd.DataFrame({"k": rng.choice(5000, size=300,
                                         replace=False).astype(np.int64)})
    plain = semi_join(rd.from_pandas(left), rd.from_pandas(keys),
                      on="k", num_partitions=8).to_pandas() \
        .sort_values("payload").reset_index(drop=True)
    bloom = semi_join_bloom(rd.from_pandas(left).materialize(),
                            rd.from_pandas(keys), on="k",
                            n_bits=1 << 10,  # ~26% fp rate
                            num_partitions=8).to_pandas() \
        .sort_values("payload").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        bloom[["k", "payload"]], plain[["k", "payload"]],
        check_dtype=False)
    expect = left[left["k"].isin(keys["k"])]
    assert len(plain) == len(expect)


def test_bloom_prefilter_never_drops_a_match():
    import ray.data as rd
    from nacc_form_validator_ray.stages.bloom import bloom_prefilter
    left = pd.DataFrame({"u": [f"https://h/{i}" for i in range(500)]})
    keys = pd.DataFrame({"u": [f"https://h/{i}" for i in range(0, 500,
                                                               13)]})
    hits = bloom_prefilter(rd.from_pandas(left).materialize(),
                           rd.from_pandas(keys), on="u",
                           n_bits=1 << 12).to_pandas()
    assert set(keys["u"]) <= set(hits["u"])


def test_bucketed_write_then_shuffle_free_grouped_apply(tmp_path):
    """write_bucketed persists key co-location; bucketed_grouped_apply
    then matches grouped_apply's result with NO further exchange."""
    import ray.data as rd
    from nacc_form_validator_ray.stages.partition import (
        bucketed_grouped_apply, grouped_apply, write_bucketed)
    rng = np.random.RandomState(2)
    df = pd.DataFrame({
        "k": rng.randint(0, 40, size=2000).astype(np.int64),
        "v": rng.randint(0, 100, size=2000).astype(np.int64),
    })

    def per_key_sum(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("k", as_index=False)["v"].sum()

    path = str(tmp_path / "bucketed")
    write_bucketed(rd.from_pandas(df).repartition(6), ["k"], path,
                   num_buckets=8)
    fast = bucketed_grouped_apply(path, per_key_sum, num_buckets=8) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    ref = grouped_apply(rd.from_pandas(df), ["k"], per_key_sum,
                        num_partitions=8).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, ref, check_dtype=False)
    # each key appears in exactly one bucket result
    assert fast["k"].is_unique


def test_exact_dedup_default_pin_never_materializes(tmp_path, monkeypatch):
    """Round-2 VERDICT: the composable dedup API must not pin the full
    text-bearing corpus in the object store by default — the default
    pin="parquet" spills to disk and streams, so Dataset.materialize is
    never called on the broadcast drop path."""
    calls = []
    orig = rd.Dataset.materialize

    def spy(self, *a, **k):
        calls.append(self)
        return orig(self, *a, **k)

    monkeypatch.setattr(rd.Dataset, "materialize", spy)
    df = make_docs()
    out = exact_dedup(rd.from_pandas(df), drop_via="broadcast",
                      pin_dir=str(tmp_path / "pin")).to_pandas()
    # write_parquet materializes its own Write plan internally (tiny
    # write-result metadata, streamed to disk) — what must NEVER happen
    # is a materialize of a non-write (block-pinning) dataset
    pinning = [c for c in calls if not str(c).startswith("Write")]
    assert not pinning
    assert 2 not in set(out["doc_id"])


def test_auto_pin_dir_reclaimed_after_consumption():
    """Round-4 VERDICT item 4: an auto-created pin="parquet" spill dir
    must be reclaimable once the returned dataset is consumed — a
    long-lived driver must not leak a corpus-sized /tmp dir per
    invocation until interpreter exit."""
    import os

    from nacc_form_validator_ray.stages import dedup as dd

    before = list(dd._PIN_DIRS)
    out = exact_dedup(rd.from_pandas(make_docs())).to_pandas()
    assert 2 not in set(out["doc_id"])
    created = [d for d in dd._PIN_DIRS if d not in before]
    assert created and all(os.path.isdir(d) for d in created)
    assert dd.reclaim_pin_dirs() >= len(created)
    assert not any(os.path.exists(d) for d in created)
    assert not dd._PIN_DIRS


def test_exact_dedup_pin_modes_agree(tmp_path):
    df = make_docs()
    out_parquet = exact_dedup(rd.from_pandas(df),
                              pin_dir=str(tmp_path / "p1")).to_pandas()
    out_memory = exact_dedup(rd.from_pandas(df),
                             pin="memory").to_pandas()
    a = out_parquet.sort_values("doc_id").reset_index(drop=True)
    b = out_memory.sort_values("doc_id").reset_index(drop=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()


def test_pretrain_default_pin_materializes_only_lean_sets(tmp_path,
                                                          monkeypatch):
    """build_pretrain_pipeline's default path may materialize only LEAN
    id-only datasets (the banned list under drop_via='auto'), never the
    text-bearing corpus."""
    from nacc_form_validator_ray.pipelines.pretrain import \
        build_pretrain_pipeline
    from nacc_form_validator_ray.pipelines.webgen import generate_pages

    calls = []
    orig = rd.Dataset.materialize

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        if not str(self).startswith("Write"):  # see test above
            calls.append(set(out.schema().names))
        return out

    monkeypatch.setattr(rd.Dataset, "materialize", spy)
    pages = generate_pages(120, seed=11)
    out = build_pretrain_pipeline(pages,
                                  pin_dir=str(tmp_path / "pin"))
    n = out.count()
    assert n > 0
    for cols in calls:
        assert "text" not in cols and "scrubbed_text" not in cols, \
            f"full corpus materialized: {cols}"


def test_dup_ngram_auto_routes_and_matches(tmp_path):
    """via='auto' must pick exact on a boilerplate-heavy corpus and
    hashed on a unique-text corpus, and in BOTH cases return rows
    identical to both pinned paths (cost-based exchange selection is
    a performance decision, never a semantic one)."""
    import pyarrow as pa
    import ray.data as rd

    from nacc_form_validator_ray.stages import dedup as D

    def rows(ds_via):
        return sorted(map(tuple, ds_via.to_pandas().to_numpy().tolist()))

    # high-dup: the same boilerplate sentence on every doc
    boiler = [("the quick brown fox jumps over the lazy dog number %d"
               % i) + " shared boilerplate tail appears everywhere"
              for i in range(60)]
    # low-dup: globally unique ALPHABETIC token streams (the corpus
    # tokenizer is [a-z]+ — digits would split every token into the
    # same letter runs and fake a 100% dup rate)
    import string

    def alpha(n):
        s = ""
        while True:
            s += string.ascii_lowercase[n % 26]
            n //= 26
            if n == 0:
                return s

    uniq = [" ".join(alpha(i * 997 + j * 31 + 7) + alpha(j + i * 53)
                     for j in range(30))
            for i in range(60)]
    from nacc_form_validator_ray.stages import partition as P
    for texts, expect_key in ((boiler, "s"), (uniq, "h")):
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts)})
        ds = rd.from_arrow(t).repartition(3)
        # spy on the exchange key: the exact path's first grouped
        # exchange is keyed on the shingle STRING column "s", the
        # hashed path's on the 62-bit key column "h" — which one ran
        # IS the routing decision
        seen = []
        orig_ga = P.grouped_apply

        def spy(ds_, key_cols, *a, **kw):
            seen.append(tuple(key_cols))
            return orig_ga(ds_, key_cols, *a, **kw)

        P.grouped_apply = spy
        try:
            got_auto = rows(D.dup_ngram_spans(ds, k=3, min_docs=2,
                                              via="auto",
                                              num_partitions=4))
        finally:
            P.grouped_apply = orig_ga
        assert (expect_key,) in seen, (expect_key, seen)
        got_exact = rows(D.dup_ngram_spans(
            rd.from_arrow(t).repartition(3), k=3, min_docs=2,
            via="exact", num_partitions=4))
        got_hashed = rows(D.dup_ngram_spans(
            rd.from_arrow(t).repartition(3), k=3, min_docs=2,
            via="hashed", num_partitions=4))
        assert got_auto == got_exact == got_hashed
    assert 0.0 < D.AUTO_EXACT_THRESHOLD < 1.0
