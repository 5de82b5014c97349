"""Unit tests for the round-4 relational adds: semi_join, tf-idf
top-terms ranking, and the grouping-sets cube (the randomized surface
rides the oracle twins; scripts/check_oracle.py q4_order_priority,
q10_returned_items, tfidf_topterms, events_cube)."""

import numpy as np
import pandas as pd
import ray.data as rd


def test_semi_join_basic_and_duplicate_keys():
    from nacc_form_validator_ray.stages.joins import semi_join
    left = pd.DataFrame({"k": [1, 2, 3, 4, 4],
                         "v": ["a", "b", "c", "d", "e"]})
    # duplicate + unknown keys on the key side: each left row at most once
    keys = pd.DataFrame({"k": [2, 4, 4, 9]})
    out = semi_join(rd.from_pandas(left), rd.from_pandas(keys),
                    on="k", num_partitions=4).to_pandas() \
        .sort_values(["k", "v"]).reset_index(drop=True)
    assert out["k"].tolist() == [2, 4, 4]
    assert out["v"].tolist() == ["b", "d", "e"]


def test_semi_join_empty_key_side():
    from nacc_form_validator_ray.stages.joins import semi_join
    left = pd.DataFrame({"k": [1, 2], "v": ["a", "b"]})
    keys = pd.DataFrame({"k": pd.array([], dtype="int64")})
    out = semi_join(rd.from_pandas(left), rd.from_pandas(keys),
                    on="k", num_partitions=2).to_pandas()
    assert len(out) == 0


def test_semi_vs_anti_partition_left():
    """semi(left) + anti(left) == left, rowwise, on a random input."""
    from nacc_form_validator_ray.stages.joins import anti_join, semi_join
    rng = np.random.RandomState(7)
    left = pd.DataFrame({"k": rng.randint(0, 40, 300),
                         "v": np.arange(300, dtype=np.int64)})
    keys = pd.DataFrame({"k": rng.randint(0, 60, 50)})
    s = semi_join(rd.from_pandas(left), rd.from_pandas(keys),
                  on="k", num_partitions=8).to_pandas()
    a = anti_join(rd.from_pandas(left), rd.from_pandas(keys),
                  on="k", num_partitions=8).to_pandas()
    both = pd.concat([s, a]).sort_values("v").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        both, left.sort_values("v").reset_index(drop=True))
    kset = set(keys["k"])
    assert set(s["k"]).issubset(kset)
    assert not (set(a["k"]) & kset)


def test_tfidf_topterms_ranking_and_ties(tmp_path):
    """Crafted corpus: rare terms outrank frequent ones; ties break to
    the lexically smaller term; rank never exceeds 3."""
    from nacc_form_validator_ray.pipelines.queries import \
        q_tfidf_topterms
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            "zebra zebra the the the",   # zebra rare+repeated -> top
            "the apple",                 # tie on tf/df -> apple first
            "the banana apple",
            "the",                       # single common term
        ],
        "lang": ["en"] * 4,
        "source": ["s"] * 4,
        "n_chars": np.zeros(4, dtype=np.int64),
    })
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    out = q_tfidf_topterms(str(tmp_path)).to_pandas() \
        .sort_values(["doc_id", "term_rank"]).reset_index(drop=True)
    d0 = out[out["doc_id"] == 0]
    assert d0.iloc[0]["term"] == "zebra"  # tf=2, df=1 beats the (tf=3, df=4)
    d1 = out[out["doc_id"] == 1]
    # apple (df=2) outranks the (df=4) at tf=1; both present
    assert d1["term"].tolist() == ["apple", "the"]
    assert (out["term_rank"] <= 3).all()
    assert out[out["doc_id"] == 3]["term"].tolist() == ["the"]


def test_events_cube_grains_consistent(tmp_path):
    """The four grains must re-sum exactly: total == sum(per-type) ==
    sum(per-dow) == sum(fine)."""
    from nacc_form_validator_ray.pipelines.queries import q_events_cube
    rng = np.random.RandomState(3)
    n = 500
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 20 * 86400, n), unit="s"),
        "user_id": rng.randint(0, 40, n).astype(np.int64),
        "event_type": rng.choice(["click", "view", "buy"], n),
        "value": rng.rand(n) * 100,
        "props": ["{}"] * n,
    })
    ev.to_parquet(tmp_path / "events.parquet", index=False)
    out = q_events_cube(str(tmp_path))
    fine = out[(out["event_type"] != "ALL") & (out["dow"] != -1)]
    per_type = out[(out["event_type"] != "ALL") & (out["dow"] == -1)]
    per_dow = out[(out["event_type"] == "ALL") & (out["dow"] != -1)]
    total = out[(out["event_type"] == "ALL") & (out["dow"] == -1)]
    assert len(total) == 1 and total["n_events"].iloc[0] == n
    for grain in (fine, per_type, per_dow):
        assert grain["n_events"].sum() == n
        assert grain["total_cents"].sum() == total["total_cents"].iloc[0]
    # dow derivation: 2024-01-01 was a Monday -> dow 1 under 0=Sunday
    jan1 = (pd.Timestamp("2024-01-01").value // 10**9 // 86400 + 4) % 7
    assert jan1 == 1
