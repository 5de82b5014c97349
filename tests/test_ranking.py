"""Global rank / ntile: exactness under ties, skew, and tiny inputs."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from nacc_form_validator_ray.stages.ranking import (_ntile_of_rank,
                                                    global_rank)


def _truth_rank(df, descending):
    return df.sort_values(["k", "id"],
                          ascending=[not descending, True]) \
        .reset_index(drop=True)


@pytest.mark.parametrize("descending", [False, True])
def test_global_rank_matches_pandas(descending):
    rng = np.random.default_rng(13)
    n = 4000
    # HEAVY ties: only 17 distinct key values, so ties straddle any
    # naive boundary choice — the routing contract must co-locate them
    df = pd.DataFrame({"k": rng.integers(0, 17, n).astype(np.int64),
                       "id": np.arange(n, dtype=np.int64)})
    ds = rd.from_pandas(df.sample(frac=1, random_state=1)) \
        .repartition(6)
    out = global_rank(ds, "k", tie_cols=["id"], descending=descending,
                      num_partitions=8).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    truth = _truth_rank(df, descending)
    assert (out["rank"].to_numpy() == np.arange(1, n + 1)).all()
    assert (out["k"].to_numpy() == truth["k"].to_numpy()).all()
    assert (out["id"].to_numpy() == truth["id"].to_numpy()).all()


@pytest.mark.parametrize("n,k", [(1000, 7), (5, 100), (64, 64),
                                 (1, 1), (997, 10)])
def test_ntile_formula_matches_duckdb(n, k):
    ranks = np.arange(1, n + 1, dtype=np.int64)
    got = _ntile_of_rank(ranks, n, k)
    truth = duckdb.sql(
        f"SELECT NTILE({k}) OVER (ORDER BY r) AS t "
        f"FROM (SELECT unnest(range(1, {n + 1})) AS r)"
    ).fetchnumpy()["t"]
    assert (got == truth.astype(np.int64)).all()


def test_global_rank_single_value_column():
    """Every row shares ONE key value: a single partition must hold all
    of them, and ranks are still the full 1..n (ties broken by id)."""
    n = 500
    df = pd.DataFrame({"k": np.zeros(n, dtype=np.int64),
                       "id": np.arange(n, dtype=np.int64)})
    out = global_rank(rd.from_pandas(df).repartition(4), "k",
                      tie_cols=["id"], num_partitions=8).to_pandas()
    out = out.sort_values("rank")
    assert (out["rank"].to_numpy() == np.arange(1, n + 1)).all()
    assert (out["id"].to_numpy() == np.arange(n)).all()


def test_global_rank_with_ntile_column():
    rng = np.random.default_rng(3)
    n = 1200
    df = pd.DataFrame({"k": rng.integers(0, 10_000, n),
                       "id": np.arange(n, dtype=np.int64)})
    out = global_rank(rd.from_pandas(df).repartition(5), "k",
                      tie_cols=["id"], num_partitions=8,
                      ntile=13).to_pandas().sort_values("rank")
    # tiles are non-decreasing in rank order and sized per SQL NTILE
    sizes = out.groupby("tile").size()
    assert sizes.index.tolist() == list(range(1, 14))
    big, small = -(-n // 13), n // 13
    assert set(sizes) <= {big, small}
    assert (sizes == big).sum() == n % 13


def test_running_total_matches_sequential_scan():
    from nacc_form_validator_ray.stages.ranking import running_total
    rng = np.random.default_rng(29)
    n = 3000
    # duplicate order keys + negative values: routing must co-locate
    # equal keys and the offset math must hold under sign changes
    df = pd.DataFrame({
        "t": rng.integers(0, 400, n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64),
        "v": rng.integers(-500, 500, n).astype(np.int64),
    })
    ds = rd.from_pandas(df.sample(frac=1, random_state=2)) \
        .repartition(6)
    out = running_total(ds, "t", "v", tie_cols=["id"],
                        num_partitions=16, out_col="cum") \
        .to_pandas().sort_values(["t", "id"]).reset_index(drop=True)
    truth = df.sort_values(["t", "id"]).reset_index(drop=True)
    assert (out["cum"].to_numpy()
            == np.cumsum(truth["v"].to_numpy())).all()


def test_write_sorted_global_order_and_resume(tmp_path):
    from nacc_form_validator_ray.stages.ranking import write_sorted
    import pyarrow.parquet as pq
    import glob
    import os

    rng = np.random.default_rng(41)
    n = 2500
    df = pd.DataFrame({"k": rng.integers(0, 10_000, n),
                       "id": np.arange(n, dtype=np.int64)})
    ds = rd.from_pandas(df.sample(frac=1, random_state=5)) \
        .repartition(5)
    out_dir = str(tmp_path / "sorted")
    man = write_sorted(ds, "k", out_dir, tie_cols=["id"],
                       num_partitions=8)
    assert man["rows"].sum() == n
    assert (man["offset"].to_numpy()
            == np.concatenate(([0], np.cumsum(man["rows"])[:-1]))).all()
    files = sorted(glob.glob(out_dir + "/part-*.parquet"))
    got = pd.concat([pq.read_table(f).to_pandas() for f in files],
                    ignore_index=True)
    truth = df.sort_values(["k", "id"]).reset_index(drop=True)
    assert (got["k"].to_numpy() == truth["k"].to_numpy()).all()
    assert (got["id"].to_numpy() == truth["id"].to_numpy()).all()
    # resume: drop one part file, rerun — only it is rewritten,
    # content of the re-exported stream is value-identical
    victim = files[len(files) // 2]
    os.remove(victim)
    mtimes = {f: os.path.getmtime(f) for f in files if f != victim}
    man2 = write_sorted(ds, "k", out_dir, tie_cols=["id"],
                        num_partitions=8)
    assert man2["rows"].sum() == n
    got2 = pd.concat(
        [pq.read_table(f).to_pandas()
         for f in sorted(glob.glob(out_dir + "/part-*.parquet"))],
        ignore_index=True)
    assert (got2["k"].to_numpy() == truth["k"].to_numpy()).all()
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m, f"{f} was rewritten"
