"""Crafted-input tests for the round-3 windowed/inference operators.

The driver tables are tie-light, so these build adversarial events
(duplicate timestamps, single-event users, user runs split across
batches) and verify against independent pandas computations.
"""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 25, n).astype(np.int64),
        # coarse seconds → LOTS of (user, ts) ties
        "ts": pd.to_datetime(
            rng.integers(0, 500, n) * 1_000_000_000 + 1_600_000_000
            * 1_000_000_000, unit="ns").astype("datetime64[us]"),
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": rng.normal(0, 10, n).round(3),
        "props": [""] * n,
    })
    d = tmp_path_factory.mktemp("ev")
    df.to_parquet(os.path.join(d, "events.parquet"))
    return str(d)


def test_rolling_window_matches_pandas(ray_session, events_dir):
    from nacc_form_validator_ray.pipelines.queries import \
        q_rolling_user_stats
    got = q_rolling_user_stats(events_dir).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    df = pd.read_parquet(f"{events_dir}/events.parquet")
    df["cents"] = np.floor(df["value"] * 100 + 0.5).astype(np.int64)
    df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    g = df.groupby("user_id", sort=False)["cents"]
    exp = pd.DataFrame({
        "event_id": df["event_id"].to_numpy(),
        "roll_n": g.rolling(5, min_periods=1).count().to_numpy()
        .astype(np.int64),
        "roll_cents": g.rolling(5, min_periods=1).sum().to_numpy()
        .astype(np.int64),
    }).sort_values("event_id").reset_index(drop=True)
    assert (got["roll_n"].to_numpy() == exp["roll_n"].to_numpy()).all()
    assert (got["roll_cents"].to_numpy()
            == exp["roll_cents"].to_numpy()).all()
    assert np.array_equal(
        got["roll_avg"].to_numpy(),
        exp["roll_cents"].to_numpy() / exp["roll_n"].to_numpy())


def test_latest_events_argmax(ray_session, events_dir):
    from nacc_form_validator_ray.pipelines.queries import q_latest_events
    got = q_latest_events(events_dir).to_pandas() \
        .sort_values(["user_id", "event_type"]).reset_index(drop=True)

    df = pd.read_parquet(f"{events_dir}/events.parquet")
    # argmax by (ts, event_id) — event_id breaks the many ts ties
    df = df.sort_values(["user_id", "event_type", "ts", "event_id"],
                        kind="stable")
    exp = df.drop_duplicates(["user_id", "event_type"], keep="last") \
        .sort_values(["user_id", "event_type"]).reset_index(drop=True)
    assert (got["event_id"].to_numpy()
            == exp["event_id"].to_numpy()).all()
    assert np.array_equal(got["value"].to_numpy(),
                          exp["value"].to_numpy())
    # every (user, type) present exactly once
    assert got.duplicated(["user_id", "event_type"]).sum() == 0


def test_lr_scorer_broadcast_and_determinism(ray_session):
    import ray
    import ray.data as rd
    from nacc_form_validator_ray.stages.classifier import (LR_WEIGHTS_Q10,
                                                           LRScorer,
                                                           score_documents)
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["A good long sentence about things.",
                 "12345 67890 000", "", "SHOUTING IN CAPS",
                 "normal prose with several plain words here",
                 "x"],
    })
    ds = rd.from_pandas(docs)
    out = score_documents(ds).to_pandas().sort_values("doc_id")
    # direct single-batch application == distributed result
    import pyarrow as pa
    direct = LRScorer()(pa.Table.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id")
    assert (out["logit_q10"].to_numpy()
            == direct["logit_q10"].to_numpy()).all()
    assert (out["keep"].to_numpy() == direct["keep"].to_numpy()).all()
    # custom weights ride the object store ref, not the default table
    ref = ray.put({**LR_WEIGHTS_Q10, "bias": 10**9})
    all_keep = ds.map_batches(
        LRScorer, fn_constructor_kwargs=dict(weights_ref=ref),
        batch_format="pyarrow", concurrency=(1, 2)).to_pandas()
    assert all_keep["keep"].all()


def test_label_centroids_exact(ray_session):
    import ray.data as rd
    from nacc_form_validator_ray.pipelines.queries import \
        q_label_centroids
    got = q_label_centroids("/root/testdata/sf0.001").to_pandas()
    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    M = np.floor(np.stack([np.asarray(v, dtype=np.float64)
                           for v in emb["embedding"]]) * 4096.0 + 0.5) \
        .astype(np.int64)
    lab = emb["label"].to_numpy().astype(np.int64)
    for label in np.unique(lab):
        rows = M[lab == label]
        sub = got[got["label"] == label].sort_values("dim")
        assert (sub["comp_sum"].to_numpy() == rows.sum(axis=0)).all()
        assert (sub["n"].to_numpy() == len(rows)).all()


def test_lr_train_matches_duckdb_and_learns():
    import duckdb
    import re
    from nacc_form_validator_ray.pipelines.queries import _sql_lr_train
    from nacc_form_validator_ray.stages.classifier import lr_train
    rng = np.random.RandomState(17)
    docs, langs = [], []
    for _ in range(200):
        docs.append(" ".join(rng.choice(
            ["Word", "x9", "THE", "apple", "42!"], rng.randint(0, 30))))
        langs.append(rng.choice(["en", "de"], p=[0.5, 0.5]))
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": docs, "lang": langs})
    eng = lr_train(rd.from_pandas(df).repartition(4)).to_pandas()
    con = duckdb.connect()
    con.register("documents", df)
    sql = con.sql(_sql_lr_train(5)).df()
    # bit-exact: grid arithmetic is order-independent across the 4
    # partitions
    assert list(eng["feature"]) == list(sql["feature"])
    np.testing.assert_array_equal(eng["weight"].to_numpy(),
                                  sql["weight"].to_numpy())
    assert (eng["weight"].to_numpy() != 0).any()


def test_lr_train_separates_trivial_labels():
    # label == presence of digits; n_digits weight must move positive
    # relative to the others after a few rounds
    from nacc_form_validator_ray.stages.classifier import lr_train
    rows = []
    for i in range(120):
        if i % 2:
            rows.append((i, "numbers 123 456 789 here", "en"))
        else:
            rows.append((i, "pure prose with no numerals", "xx"))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    out = lr_train(rd.from_pandas(df), iterations=8).to_pandas() \
        .set_index("feature")["weight"]
    assert out["n_digits"] > 0
