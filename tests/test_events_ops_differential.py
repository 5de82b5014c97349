"""Randomized differentials for the round-4 events operators —
hopping windows, JSON props extraction, exact-moments regression —
against their own SQL twins on adversarial in-memory frames (garbage
JSON, degenerate groups, sub-second timestamps) that the fixture
never produces. The per-batch combiner logic is replicated inline so
these run without Ray; the distributed path is covered by the oracled
queries."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from nacc_form_validator_ray.pipelines.queries import (
    HOP_STRIDE_S, HOP_WINDOW_S, SQL_HOPPING_WINDOW_EVENTS,
    SQL_JSON_PROPS_STATS, SQL_VALUE_REGRESSION_EVENTS)


def _rand_events(seed: int, n: int = 400) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    props_pool = ['{"k": %d}' % k for k in rng.randint(0, 999, 20)] + \
        ["not json", "", '{"j": 5}', '{"k": }']
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        # sub-second microsecond timestamps across hop boundaries
        "ts": pd.to_datetime(
            rng.randint(0, 10**7, n) * 1_000_003, unit="us"),
        "user_id": rng.randint(0, 20, n).astype(np.int64),
        "event_type": rng.choice(["a", "b", "zero_var"], n),
        "value": np.round(rng.randn(n) * 100, 2),
        "props": rng.choice(props_pool, n),
    })


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


def test_hopping_window_differential():
    for seed in (0, 1, 2):
        df = _rand_events(seed)
        k = HOP_WINDOW_S // HOP_STRIDE_S
        ts_s = df["ts"].astype("datetime64[us]").astype(np.int64) \
            // 1_000_000
        base = (ts_s // HOP_STRIDE_S) * HOP_STRIDE_S
        cents = np.floor(df["value"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        idx = np.repeat(np.arange(len(df)), k)
        starts = np.repeat(base.to_numpy(), k) - np.tile(
            np.arange(k, dtype=np.int64) * HOP_STRIDE_S, len(df))
        eng = pd.DataFrame({
            "window_start": starts,
            "event_type": df["event_type"].to_numpy()[idx],
            "n_events": 1, "value_cents": cents[idx]}) \
            .groupby(["window_start", "event_type"],
                     as_index=False).sum()
        con = duckdb.connect()
        con.register("events", df)
        sql = con.execute(SQL_HOPPING_WINDOW_EVENTS).df()
        pd.testing.assert_frame_equal(_canon(eng), _canon(sql),
                                      check_dtype=False)


def test_json_props_differential_on_garbage():
    for seed in (3, 4):
        df = _rand_events(seed)
        t = pa.Table.from_pandas(df[["event_type", "props"]])
        ext = pc.extract_regex(t["props"], r'"k": (?P<k>\d+)')
        kcol = pc.fill_null(
            pc.cast(pc.struct_field(ext, "k"), pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        eng = pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "sum_k": kcol, "max_k": kcol, "n_events": 1}) \
            .groupby("event_type", as_index=False).agg(
            sum_k=("sum_k", "sum"), max_k=("max_k", "max"),
            n_events=("n_events", "sum"))
        con = duckdb.connect()
        con.register("events", df)
        sql = con.execute(SQL_JSON_PROPS_STATS).df()
        pd.testing.assert_frame_equal(_canon(eng), _canon(sql),
                                      check_dtype=False)


def test_regression_differential_with_zero_variance_group():
    for seed in (5, 6):
        df = _rand_events(seed)
        # force a group where every x is identical (all garbage JSON)
        df.loc[df["event_type"] == "zero_var", "props"] = "no json"
        t = pa.Table.from_pandas(df[["event_type", "props", "value"]])
        ext = pc.extract_regex(t["props"], r'"k": (?P<k>\d+)')
        x = pc.fill_null(
            pc.cast(pc.struct_field(ext, "k"), pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        y = np.floor(df["value"].to_numpy(np.float64) * 100
                     + 0.5).astype(np.int64)
        m = pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "n": 1, "sum_x": x, "sum_y": y, "sum_xx": x * x,
            "sum_xy": x * y, "sum_yy": y * y}) \
            .groupby("event_type", as_index=False).sum()
        n = m["n"].to_numpy(np.float64)
        sx = m["sum_x"].to_numpy(np.float64)
        sy = m["sum_y"].to_numpy(np.float64)
        sxx = m["sum_xx"].to_numpy(np.float64)
        sxy = m["sum_xy"].to_numpy(np.float64)
        syy = m["sum_yy"].to_numpy(np.float64)
        num = n * sxy - sx * sy
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        ni = m["n"].to_numpy(np.int64)
        sxi = m["sum_x"].to_numpy(np.int64)
        syi = m["sum_y"].to_numpy(np.int64)
        zx = ni * m["sum_xx"].to_numpy(np.int64) - sxi * sxi == 0
        zy = ni * m["sum_yy"].to_numpy(np.int64) - syi * syi == 0
        with np.errstate(divide="ignore", invalid="ignore"):
            m["slope"] = np.where(zx, 0.0, num / denx)
            m["intercept"] = np.where(
                zx, 0.0, (sy - m["slope"].to_numpy() * sx) / n)
            m["pearson_r"] = np.where(zx | zy, 0.0,
                                      num / np.sqrt(denx * deny))
        con = duckdb.connect()
        con.register("events", df)
        sql = con.execute(SQL_VALUE_REGRESSION_EVENTS).df()
        assert (sql.loc[sql["event_type"] == "zero_var",
                        ["slope", "intercept", "pearson_r"]]
                .to_numpy() == 0.0).all()
        pd.testing.assert_frame_equal(_canon(m), _canon(sql),
                                      check_dtype=False)
