"""SemDeDup and DSIR importance weighting: determinism across
partitionings, known-answer drop behavior, and the grid-exactness
contract that backs their DuckDB twins."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from nacc_form_validator_ray.stages.importance import (
    ImportanceScorer, train_importance_model)
from nacc_form_validator_ray.stages.semdedup import semdedup


def _emb_ds(vecs: np.ndarray, reps: int):
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    return rd.from_arrow(tbl).repartition(reps)


def test_semdedup_drops_near_duplicates_to_smallest_id():
    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 8)).astype(np.float32)
    # rows 37..39 are byte-identical to rows 3..5 -> must drop, with
    # dup_of pointing at the SMALLEST qualifying cluster-mate
    vecs = np.concatenate([base[:37], base[3:6]], axis=0)
    out = semdedup(_emb_ds(vecs, 3), k=4, iterations=2,
                   dist2_threshold=10, num_partitions=4) \
        .to_pandas().set_index("vec_id").sort_index()
    assert not out.loc[37, "kept"] and out.loc[37, "dup_of"] == 3
    assert not out.loc[38, "kept"] and out.loc[38, "dup_of"] == 4
    assert not out.loc[39, "kept"] and out.loc[39, "dup_of"] == 5
    assert out["kept"].sum() == 37
    assert (out.loc[out["kept"], "dup_of"] == -1).all()


def test_semdedup_partitioning_invariance():
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(200, 12)).astype(np.float32)
    # threshold wide enough that real in-cluster drops occur
    a = semdedup(_emb_ds(vecs, 1), k=5, iterations=3,
                 dist2_threshold=300_000_000, num_partitions=2) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = semdedup(_emb_ds(vecs, 9), k=5, iterations=3,
                 dist2_threshold=300_000_000, num_partitions=16) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (~a["kept"]).sum() > 0  # the threshold actually fires


def test_semdedup_twin_exact_on_large_magnitude_vectors():
    """Round-3 fuzz regression: DuckDB resolves FLOAT * DOUBLE as FLOAT,
    so a quantize lambda without CAST(x AS DOUBLE) yields FLOAT[] lists
    and list_dot_product accumulates in float32 — at |component| ~ 8 the
    norms reach ~1e9 where float32's ulp is 64, and a true d2 = 2 pair
    silently missed the threshold. The twins now cast; this locks it."""
    import duckdb

    from nacc_form_validator_ray.pipelines.queries import \
        sql_semdedup_embeddings
    rng = np.random.default_rng(5)
    vecs = rng.normal(scale=2.0, size=(60, 31)).astype(np.float32)
    vecs[59] = vecs[7]  # exact dup at large magnitude
    ds = _emb_ds(vecs, 4)
    got = semdedup(ds, k=2, iterations=2, dist2_threshold=71,
                   num_partitions=4).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert not got.loc[59, "kept"] and got.loc[59, "dup_of"] == 7
    con = duckdb.connect()
    tbl = pa.table({
        "vec_id": pa.array(np.arange(60, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    con.register("emb", tbl)
    con.sql("CREATE VIEW embeddings AS SELECT * FROM emb")
    want = con.sql(sql_semdedup_embeddings(
        k=2, iterations=2, dist2_threshold=71)).df() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want[["vec_id", "cid", "kept", "dup_of"]],
        check_dtype=False)


def _doc_ds(texts, sources, reps: int):
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(sources, pa.string()),
    })
    return rd.from_arrow(tbl).repartition(reps)


def test_dsir_weights_favor_target_vocabulary():
    texts = (["quantum flux capacitor"] * 5
             + ["mundane filler words here"] * 20)
    sources = ["tgt"] * 5 + ["raw"] * 20
    ds = _doc_ds(texts, sources, 3)
    model = train_importance_model(ds, select_column="source",
                                   select_value="tgt")
    scored = ds.map_batches(
        ImportanceScorer, fn_constructor_kwargs={"model": model},
        batch_format="pyarrow", concurrency=1).to_pandas() \
        .set_index("doc_id")
    # target-domain docs must outscore the raw filler docs
    assert scored.loc[0, "dsir_weight"] > scored.loc[10, "dsir_weight"]
    assert scored.loc[0, "dsir_tokens"] == 3


def test_dsir_weights_partitioning_invariant_bitwise():
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
             for _ in range(120)]
    sources = [("tgt" if i % 7 == 0 else "raw") for i in range(120)]
    outs = []
    for reps in (1, 11):
        ds = _doc_ds(texts, sources, reps)
        model = train_importance_model(ds, select_column="source",
                                       select_value="tgt")
        df = ds.map_batches(
            ImportanceScorer, fn_constructor_kwargs={"model": model},
            batch_format="pyarrow", concurrency=2).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        outs.append(df[["doc_id", "dsir_weight", "dsir_tokens"]])
    # grid-quantized ratios -> per-doc sums are EXACT dyadic floats:
    # bit-identical regardless of partitioning and summation order
    assert (outs[0]["dsir_weight"].to_numpy()
            == outs[1]["dsir_weight"].to_numpy()).all()
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_knn_join_matches_bruteforce_within_cells():
    from nacc_form_validator_ray.stages.kmeans import _quantize, kmeans_fit
    from nacc_form_validator_ray.stages.semdedup import knn_join
    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(80, 10)).astype(np.float32)
    ds = _emb_ds(vecs, 5)
    out = knn_join(ds, k=3, iterations=2, top_k=4,
                   num_partitions=4).to_pandas() \
        .sort_values(["vec_id", "rank"]).reset_index(drop=True)
    # brute-force reference: same assignment, exhaustive in-cell top-k
    cents, _ = kmeans_fit(_emb_ds(vecs, 1), k=3, iterations=2)
    X = _quantize(np.stack(list(vecs)).astype(np.float64))
    a = np.argmin((cents * cents).sum(1)[None, :] - 2 * (X @ cents.T),
                  axis=1)
    rows = []
    for i in range(len(X)):
        cell = np.flatnonzero(a == a[i])
        cand = [(int(((X[i] - X[j]) ** 2).sum()), j)
                for j in cell if j != i]
        for r, (d2, j) in enumerate(sorted(cand)[:4], start=1):
            rows.append((i, r, j, d2))
    ref = pd.DataFrame(rows, columns=["vec_id", "rank", "neighbor_id",
                                      "dist2"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_knn_join_topk_exceeding_cell_size():
    """top_k larger than a cell emits only the real neighbors (the
    self-distance sentinel must never leak as a neighbor row)."""
    from nacc_form_validator_ray.stages.semdedup import knn_join
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(7, 4)).astype(np.float32)
    out = knn_join(_emb_ds(vecs, 2), k=2, iterations=1, top_k=50,
                   num_partitions=2).to_pandas()
    # every (vec, neighbor) pair is distinct and never self
    assert (out["vec_id"] != out["neighbor_id"]).all()
    assert out["dist2"].max() < (1 << 61)
    per = out.groupby("vec_id").size()
    # each vector sees exactly |cell|-1 neighbors
    total_cells = out.groupby("vec_id")["neighbor_id"].nunique()
    assert (per == total_cells).all()
    assert per.sum() == len(out)


def test_knn_join_probe2_improves_recall():
    """n_probe=2 must recover strictly more (or equal) true neighbors
    than n_probe=1 and never regress a query's rank-1 distance."""
    from nacc_form_validator_ray.stages.semdedup import knn_join
    rng = np.random.default_rng(29)
    vecs = rng.normal(size=(150, 8)).astype(np.float32)
    ds = _emb_ds(vecs, 4)
    p1 = knn_join(ds, k=6, iterations=2, top_k=2, n_probe=1,
                  num_partitions=4).to_pandas()
    p2 = knn_join(ds, k=6, iterations=2, top_k=2, n_probe=2,
                  num_partitions=4).to_pandas()
    b1 = p1[p1["rank"] == 1].set_index("vec_id")["dist2"]
    b2 = p2[p2["rank"] == 1].set_index("vec_id")["dist2"]
    common = b1.index.intersection(b2.index)
    assert (b2.loc[common] <= b1.loc[common]).all()
    assert len(p2) >= len(p1)
    # disjoint-candidate merge: no duplicate (query, neighbor) pairs
    assert not p2.duplicated(["vec_id", "neighbor_id"]).any()


def test_dsir_max_vocab_cut_preserves_kept_ratios():
    """Binding max_vocab drops tail tokens to the unseen path but keeps
    the frequent tokens' ratios identical (denominators use full-corpus
    totals computed before the cut)."""
    texts = ["alpha alpha alpha beta beta rare1",
             "alpha beta beta gamma rare2"]
    ds = _doc_ds(texts, ["tgt", "raw"], 1)
    full = train_importance_model(ds, select_column="source",
                                  select_value="tgt")
    cut = train_importance_model(ds, select_column="source",
                                 select_value="tgt", max_vocab=3)
    assert len(cut["logratio"]) == 3
    for tok, lr in cut["logratio"].items():
        assert lr == full["logratio"][tok], tok
    assert cut["oov_logratio"] == full["oov_logratio"]


def test_derive_ivf_params_sqrt_rule():
    from nacc_form_validator_ray.stages.similarity import \
        derive_ivf_params
    nc, ss = derive_ivf_params(1_000_000)
    assert nc == 1000 and ss == 256_000
    nc, ss = derive_ivf_params(10)       # tiny corpus: floor at 4
    assert nc == 4 and ss == 4096
    nc, ss = derive_ivf_params(10 ** 12)  # huge: both capped
    assert nc == 65536 and ss == 1 << 20
    # explicit values pass through untouched
    assert derive_ivf_params(10 ** 9, 16, 4096) == (16, 4096)
