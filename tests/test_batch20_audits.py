"""Batch-20 audits: runner-up gaps (ties, single-distinct omission),
per-source length outliers (integer-bounds vs float definition), kNN
label agreement on a hand-built geometry, and dedup survivorship."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_top2_gap_ties_and_single_distinct(tmp_path):
    from nacc_form_validator_ray.pipelines.mining import \
        q_top2_gap_per_type
    rows = [("a", 5.0), ("a", 5.0), ("a", 3.5),   # tie on max
            ("b", 1.0), ("b", 1.0),               # single distinct -> out
            ("c", 2.0), ("c", -4.0), ("c", 0.5),
            (None, 9.0)]                          # null type -> out
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(["2020-01-01"] * n)
                       .astype("datetime64[us]")),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "event_type": pa.array([r[0] for r in rows]),
        "value": pa.array([r[1] for r in rows]),
        "props": pa.array(["{}"] * n)}), tmp_path / "events.parquet")
    out = q_top2_gap_per_type(str(tmp_path)).set_index("event_type")
    assert sorted(out.index) == ["a", "c"]
    assert out.loc["a", "max_value"] == 5.0
    assert out.loc["a", "second_value"] == 3.5
    assert out.loc["a", "gap"] == 1.5
    assert out.loc["c", "max_value"] == 2.0
    assert out.loc["c", "second_value"] == 0.5


def test_length_outlier_bounds_match_float_definition(tmp_path):
    from nacc_form_validator_ray.pipelines.mining import \
        q_length_outlier_docs
    rng = np.random.default_rng(5)
    lens = list(rng.integers(90, 110, size=50)) + [500, 12]
    n = len(lens)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["x" * 3] * n),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array(np.asarray(lens, dtype=np.int64))}),
        tmp_path / "documents.parquet")
    out = q_length_outlier_docs(str(tmp_path))
    x = np.asarray(lens, dtype=np.float64)
    want = np.flatnonzero((x - x.mean()) ** 2 > 4 * x.var())
    assert out["doc_id"].tolist() == want.tolist()
    assert 500 in out["n_chars"].tolist()


def test_knn_label_agreement_geometry(tmp_path):
    """Two tight clusters: queries inside a cluster must be predicted
    with the cluster's label; one mislabeled vector must come out
    correct=False."""
    from nacc_form_validator_ray.pipelines.mining import \
        q_knn_label_agreement
    rng = np.random.default_rng(3)
    a = rng.normal(0, 0.01, size=(10, 4)) + np.array([5, 0, 0, 0])
    b = rng.normal(0, 0.01, size=(10, 4)) + np.array([0, 5, 0, 0])
    vecs = np.vstack([a, b]).astype(np.float32)
    labels = np.array([0] * 10 + [1] * 10, dtype=np.int32)
    labels[3] = 1  # mislabeled: geometry says 0
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(20, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}),
        tmp_path / "embeddings.parquet")
    out = q_knn_label_agreement(str(tmp_path)).set_index("query_id")
    # queries are vec_id < 10 (cluster a): every prediction is 0
    assert (out["label_pred"] == 0).all()
    assert not out.loc[3, "correct"]
    assert out.drop(index=3)["correct"].all()


def test_dedup_survivors_by_source(tmp_path):
    from nacc_form_validator_ray.pipelines.mining import \
        q_dedup_survivors_by_source
    texts = ["same page", "same  page ", "unique one", "same page",
             "unique two"]
    srcs = ["s1", "s2", "s1", "s1", "s2"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(5, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 5),
        "source": pa.array(srcs),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        tmp_path / "documents.parquet")
    out = q_dedup_survivors_by_source(str(tmp_path)).set_index("source")
    # hash group {0,1,3} (ws-normalized): min doc_id 0 (s1) survives
    assert out.loc["s1", "n_docs"] == 3
    assert out.loc["s1", "n_survivors"] == 2  # doc 0 + doc 2
    assert out.loc["s2", "n_docs"] == 2
    assert out.loc["s2", "n_survivors"] == 1  # doc 4 only
    assert out.loc["s2", "dup_rate"] == 0.5
