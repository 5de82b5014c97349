"""Sequence-packing manifest: distributed bucketed prefix-sum vs a
serial reference, plus manifest invariants."""

import numpy as np
import pandas as pd
import ray.data as rd

from nacc_form_validator_ray.stages.pack import pack_sequences


def _reference_manifest(df: pd.DataFrame, L: int) -> pd.DataFrame:
    """Serial single-process oracle."""
    rows = []
    off = 0
    for r in df.sort_values("doc_id").itertuples():
        n = len([t for t in r.text.lower().split() if t.isalpha()])
        # crude but adequate for pure [a-z ]+ fixtures
        if n:
            for seq in range(off // L, (off + n - 1) // L + 1):
                g0 = max(off, seq * L)
                g1 = min(off + n, (seq + 1) * L)
                rows.append((r.doc_id, seq, g0 - off, g0 - seq * L,
                             g1 - g0))
        off += n
    return pd.DataFrame(rows, columns=["doc_id", "seq_id", "doc_start",
                                       "seq_start", "n_tokens_span"])


def test_pack_sequences_matches_serial_reference():
    rng = np.random.RandomState(9)
    words = ["alpha", "beta", "gamma", "delta"]
    df = pd.DataFrame({
        # sparse non-contiguous ids across several buckets (bucket=8)
        "doc_id": np.array([3, 9, 17, 21, 40, 41, 77, 100, 101, 130],
                           dtype=np.int64),
        "text": [" ".join(rng.choice(words, size=rng.randint(0, 30)))
                 for _ in range(10)],
    })
    df.loc[4, "text"] = ""  # empty doc contributes nothing
    out = pack_sequences(rd.from_pandas(df).repartition(3), seq_len=16,
                         bucket_size=8, num_partitions=4).to_pandas() \
        .sort_values(["doc_id", "seq_id"]).reset_index(drop=True)
    ref = _reference_manifest(df, 16) \
        .sort_values(["doc_id", "seq_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # invariants: every doc's spans tile [0, n) contiguously; every
    # sequence except the last is exactly full
    for doc, g in out.groupby("doc_id"):
        g = g.sort_values("seq_id")
        assert g["doc_start"].iloc[0] == 0
        assert (g["doc_start"].to_numpy()[1:]
                == (g["doc_start"] + g["n_tokens_span"])
                .to_numpy()[:-1]).all()
        assert (g["seq_id"].to_numpy()[1:]
                - g["seq_id"].to_numpy()[:-1] == 1).all()
    fill = out.groupby("seq_id")["n_tokens_span"].sum()
    assert (fill.iloc[:-1] == 16).all()


def test_pack_sequences_parallelism_invariance():
    rng = np.random.RandomState(4)
    words = ["one", "two", "three"]
    df = pd.DataFrame({
        "doc_id": np.arange(50, dtype=np.int64),
        "text": [" ".join(rng.choice(words, size=rng.randint(1, 40)))
                 for _ in range(50)],
    })
    a = pack_sequences(rd.from_pandas(df).repartition(1), seq_len=32,
                       num_partitions=2).to_pandas() \
        .sort_values(["doc_id", "seq_id"]).reset_index(drop=True)
    b = pack_sequences(rd.from_pandas(df).repartition(7), seq_len=32,
                       num_partitions=5).to_pandas() \
        .sort_values(["doc_id", "seq_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_select_token_budget_greedy_and_invariant():
    from nacc_form_validator_ray.stages.pack import select_token_budget
    rng = np.random.RandomState(6)
    words = ["aa", "bb", "cc"]
    df = pd.DataFrame({
        "doc_id": np.arange(80, dtype=np.int64),
        "text": [" ".join(rng.choice(words, size=rng.randint(1, 20)))
                 for _ in range(80)],
        "score": rng.randint(0, 10, size=80).astype(np.int64),
    })
    out = select_token_budget(rd.from_pandas(df).repartition(5),
                              budget=150, score_column="score",
                              num_partitions=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # budget respected
    assert out["n_tokens"].sum() <= 150
    assert out["cum_tokens"].max() <= 150
    # prefix-cut contract: the kept set is the maximal PREFIX of whole
    # docs in (score DESC, id) order whose full cumsum fits — the first
    # non-fitting doc ends the selection (its tokens still count toward
    # every later doc's exclusive cumsum, so nothing after fits either)
    kept = set(out["doc_id"])
    order = df.assign(
        n=[len(t.split()) for t in df["text"]]).sort_values(
        ["score", "doc_id"], ascending=[False, True])
    run, cutting = 0, False
    for r in order.itertuples():
        run += r.n
        if cutting or run > 150:
            cutting = True
            assert r.doc_id not in kept, r
        else:
            assert r.doc_id in kept, r
    # parallelism invariance
    out2 = select_token_budget(rd.from_pandas(df).repartition(1),
                               budget=150, score_column="score",
                               num_partitions=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_stratified_sample_rates_and_determinism():
    from nacc_form_validator_ray.stages.sampling import stratified_sample
    df = pd.DataFrame({
        "doc_id": np.arange(4000, dtype=np.int64),
        "source": np.repeat(["wiki", "cc", "forum", "code"], 1000),
    })
    rates = {"wiki": 0.9, "cc": 0.1, "forum": 0.5}
    out = stratified_sample(rd.from_pandas(df).repartition(4),
                            group_column="source", id_column="doc_id",
                            rates=rates, default_rate=0.0).to_pandas()
    got = out.groupby("source").size()
    assert "code" not in got.index          # default_rate=0 drops all
    assert 800 < got["wiki"] <= 1000        # ~0.9
    assert 40 < got["cc"] < 180             # ~0.1
    assert 380 < got["forum"] < 620         # ~0.5
    # determinism across partitionings
    out2 = stratified_sample(rd.from_pandas(df).repartition(11),
                             group_column="source", id_column="doc_id",
                             rates=rates, default_rate=0.0).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True))


def test_shuffle_manifest_is_permutation_and_invariant():
    from nacc_form_validator_ray.stages.pack import shuffle_manifest
    ids = np.array([5, 99, 1000, 7, 123456, 42, 0, 2**40], dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids})
    out = shuffle_manifest(rd.from_pandas(df).repartition(3),
                           num_partitions=4).to_pandas()
    # a permutation of 0..n-1 covering every id exactly once
    assert sorted(out["shuffle_pos"]) == list(range(len(ids)))
    assert set(out["doc_id"]) == set(ids)
    out2 = shuffle_manifest(rd.from_pandas(df).repartition(1),
                            num_partitions=7).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_histogram_quantile_sketch_accuracy_and_merge():
    from nacc_form_validator_ray.stages.sketches import \
        grouped_histogram_quantiles
    rng = np.random.RandomState(8)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b"], 5000),
        "v": np.concatenate([rng.normal(100, 30, 5000),
                             rng.exponential(50, 5000)]),
    })
    out = grouped_histogram_quantiles(
        rd.from_pandas(df).repartition(6), "g", "v",
        qs=(0.5, 0.9), bin_width=4.0).to_pandas()
    for g in ["a", "b"]:
        vals = df[df.g == g]["v"]
        for q in [0.5, 0.9]:
            est = out[(out.g == g) & (out.q == q)]["est"].iloc[0]
            true = np.quantile(vals, q)
            assert abs(est - true) <= 8.0, (g, q, est, true)
    # parallelism invariance (the sketch merges by addition)
    out2 = grouped_histogram_quantiles(
        rd.from_pandas(df).repartition(1), "g", "v",
        qs=(0.5, 0.9), bin_width=4.0).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["g", "q"]).reset_index(drop=True),
        out2.sort_values(["g", "q"]).reset_index(drop=True))


# ------------------------------------------------------------------ batch 38

def test_waterfill_cap_matches_brute_force():
    """The segment-max closed form equals the brute-force maximum cap
    over random totals and budgets."""
    import numpy as np

    from nacc_form_validator_ray.stages.pack import waterfill_cap

    rng = np.random.RandomState(7)
    for _ in range(200):
        k = rng.randint(1, 8)
        t = rng.randint(0, 50, size=k).astype(np.int64)
        budget = int(rng.randint(0, int(t.sum()) + 20))
        got = waterfill_cap(t, budget)
        # brute force: alloc is monotone in c, so scan
        def alloc(c):
            return int(np.minimum(t, c).sum())
        assert alloc(got) <= budget
        assert alloc(got + 1) > budget or got >= int(t.max())


def test_waterfill_cap_edges():
    import numpy as np

    from nacc_form_validator_ray.stages.pack import waterfill_cap

    assert waterfill_cap(np.array([], dtype=np.int64), 100) == 0
    assert waterfill_cap(np.array([10], dtype=np.int64), 0) == 0
    # full corpus fits: cap >= max total keeps everything
    assert waterfill_cap(np.array([5, 10], dtype=np.int64), 15) >= 10


def test_source_token_waterfill_keeps_prefix_per_source(ray_session):
    """Within each source the kept set is a doc_id-prefix under the
    cap; cum_tokens is the exact within-source running total."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from nacc_form_validator_ray.stages.pack import source_token_waterfill

    rng = np.random.RandomState(3)
    n = 120
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": np.where(np.arange(n) % 3 == 0, "big", "small"),
        "text": [" ".join(["tok"] * int(k))
                 for k in rng.randint(1, 30, size=n)],
    })
    out = source_token_waterfill(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
        budget_den=2, bucket_size=16, num_partitions=4).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == n
    for _, g in out.groupby("source"):
        g = g.sort_values("doc_id")
        assert (g["cum_tokens"].to_numpy()
                == g["n_tokens"].cumsum().to_numpy()).all()
        kept = g["kept"].to_numpy()
        # prefix property: once dropped, never kept again
        assert not (~kept[:-1] & kept[1:]).any()
