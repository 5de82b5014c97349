"""Batch-22: PCA power iteration, SQ8 quantization audit, MMR
diversity selection, dyadic EWMA — semantic unit tests on hand-built
fixtures (the bit-exact oracle sweep covers the twin parity)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_embeddings(tmp_path, vecs, labels=None):
    tmp_path.mkdir(parents=True, exist_ok=True)
    n = len(vecs)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels if labels is not None else [0] * n,
                          pa.int32())}),
        tmp_path / "embeddings.parquet")
    return str(tmp_path)


def _write_events(tmp_path, rows):
    """rows: list of (event_id, ts_us, event_type, value)."""
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([float(r[3]) for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())}),
        tmp_path / "events.parquet")
    return str(tmp_path)


# ------------------------------------------------------------------ PCA


def test_pca_finds_dominant_axis(tmp_path):
    """Vectors spread along axis 0 with tiny axis-1 noise: the power
    iteration must put (in magnitude) the full grid weight on dim 1."""
    from nacc_form_validator_ray.pipelines.curation import (
        _PCA_SCALE, q_pca_power_embeddings)
    vecs = [(1.0, 0.01), (-1.0, 0.02), (0.9, -0.01), (-0.8, 0.0)]
    d = _write_embeddings(tmp_path, vecs)
    out = q_pca_power_embeddings(d).set_index("dim")
    assert abs(out.loc[1, "component"]) == _PCA_SCALE
    assert abs(out.loc[2, "component"]) < _PCA_SCALE // 10


def test_pca_matches_numpy_eigvector():
    """On the real fixture the integer iteration must align with the
    float eigensolve (cosine > 0.99 up to sign)."""
    import duckdb

    from nacc_form_validator_ray.pipelines.advanced import \
        q_embedding_gram
    from nacc_form_validator_ray.pipelines.curation import \
        q_pca_power_embeddings

    g = q_embedding_gram(SF)
    d = int(g["j"].max())
    G = np.zeros((d, d))
    for i, j, s in zip(g["i"], g["j"], g["sum_xy"]):
        G[i - 1, j - 1] = s
        G[j - 1, i - 1] = s
    _, evec = np.linalg.eigh(G)
    top = evec[:, -1]
    mine = q_pca_power_embeddings(SF)["component"].to_numpy(np.float64)
    cos = abs(mine @ top) / (np.linalg.norm(mine) * np.linalg.norm(top))
    assert cos > 0.99


# ------------------------------------------------------------------ SQ8


def test_sq8_exact_on_two_levels(tmp_path):
    """Components at exactly min/max quantize with ZERO error; a
    midpoint lands half a level away."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_sq8_quant_error
    # dim1: {0, 1} -> codes 0/255, zero error.
    # dim2: {0, 0.5, 1} -> midpoint code round(127.5)=128 (half-up);
    #   err_255 = |255*(v-mn) - code*rng| with v-mn=2048, rng=4096:
    #   |255*2048 - 128*4096| = 2048
    d = _write_embeddings(tmp_path, [(0.0, 0.0), (1.0, 0.5), (1.0, 1.0)])
    out = q_sq8_quant_error(d).set_index("dim")
    assert out.loc[1, "sum_abs_err_255"] == 0
    assert out.loc[2, "max_abs_err_255"] == 2048
    assert out.loc[2, "mean_abs_err"] == 2048 / (3 * 255)


def test_sq8_constant_dim_zero_error(tmp_path):
    from nacc_form_validator_ray.pipelines.curation import \
        q_sq8_quant_error
    d = _write_embeddings(tmp_path, [(0.25, 1.0), (0.25, 2.0)])
    out = q_sq8_quant_error(d).set_index("dim")
    assert out.loc[1, "mn"] == out.loc[1, "mx"]
    assert out.loc[1, "sum_abs_err_255"] == 0
    assert out.loc[1, "mean_abs_err"] == 0.0


# ------------------------------------------------------------------ MMR


def test_mmr_penalizes_near_duplicates(tmp_path):
    """Three candidates: two nearly identical high-relevance vectors
    and one orthogonal-ish lower-relevance vector. Plain top-2 by
    relevance would take the twins; MMR must take one twin then the
    diverse vector."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_mmr_select_embeddings
    vecs = [
        (1.0, 0.5),     # vec 0: the relevance anchor
        (1.0, 0.4),     # vec 1: top rel (1.2)
        (0.99, 0.4),    # vec 2: near-dup of vec 1 (rel 1.19,
                        #   sim-to-1 1.15 -> mmr score 0.04)
        (0.1, 1.0),     # vec 3: diverse (rel 0.6, sim-to-1 0.5
                        #   -> mmr score 0.10 > 0.04)
    ]
    d = _write_embeddings(tmp_path, vecs)
    out = q_mmr_select_embeddings(d)
    assert out["vec_id"].tolist()[:2] == [1, 3]
    # pool exhausts at 3 candidates < K: early stop, no padding
    assert len(out) == 3
    assert out["rank"].tolist() == [1, 2, 3]


def test_mmr_missing_anchor_empty(tmp_path):
    """No vec_id = 0 row -> empty result with stable schema."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_mmr_select_embeddings
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.table({
        "vec_id": pa.array([5, 6], pa.int64()),
        "embedding": pa.array([[1.0], [2.0]], pa.list_(pa.float32())),
        "label": pa.array([0, 0], pa.int32())}),
        tmp_path / "embeddings.parquet")
    out = q_mmr_select_embeddings(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["rank", "vec_id", "score"]


# ----------------------------------------------------------------- EWMA


def test_ewma_head_normalization(tmp_path):
    """First rows use only the weights present: ewma_1 = x_1,
    ewma_2 = (2*x_2 + x_1) / 3, ewma_3 = (4*x_3 + 2*x_2 + x_1) / 7."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_ewma_value_events
    rows = [(1, 1_000_000, "click", 1.0),
            (2, 2_000_000, "click", 4.0),
            (3, 3_000_000, "click", 2.0)]
    d = _write_events(tmp_path, rows)
    out = q_ewma_value_events(d).sort_values("event_id")
    got = out["ewma"].tolist()
    assert got[0] == 100.0
    assert got[1] == (2 * 400 + 100) / 3
    assert got[2] == (4 * 200 + 2 * 400 + 100) / 7


def test_ewma_window_truncates_at_16(tmp_path):
    """Row 17 of a constant-then-spike stream: the spike at row 1 has
    fallen out of the 16-row window, so the ewma is exactly the
    constant."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_ewma_value_events
    rows = [(1, 1_000_000, "t", 999.0)]
    rows += [(i, i * 1_000_000, "t", 5.0) for i in range(2, 18)]
    d = _write_events(tmp_path, rows)
    out = q_ewma_value_events(d).sort_values("event_id")
    assert out.iloc[-1]["ewma"] == 500.0  # cents of 5.0
    # row 16 still sees the spike -> strictly above the constant
    assert out.iloc[-2]["ewma"] > 500.0


def test_ewma_types_independent(tmp_path):
    """Streams of different event types never mix."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_ewma_value_events
    rows = [(1, 1_000_000, "a", 1.0), (2, 2_000_000, "b", 9.0),
            (3, 3_000_000, "a", 1.0), (4, 4_000_000, "b", 9.0)]
    d = _write_events(tmp_path, rows)
    out = q_ewma_value_events(d)
    a = out[out["event_type"] == "a"]["ewma"]
    b = out[out["event_type"] == "b"]["ewma"]
    assert (a == 100.0).all()
    assert (b == 900.0).all()
