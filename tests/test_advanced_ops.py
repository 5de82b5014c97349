"""Unit tests for pipelines/advanced.py: skyline dominance semantics,
exact integer floor-log2, HLL estimate accuracy, and the fuzzy-join
building blocks (deletion-neighborhood completeness, exact ed<=1
verification)."""

import numpy as np
import pandas as pd
import pytest

from nacc_form_validator_ray.pipelines.advanced import (_deletion_keys,
                                                        _floor_log2_u64,
                                                        _skyline_keep,
                                                        _verify_ed1,
                                                        hll_estimate)


# ----------------------------- skyline ------------------------------

def _skyline_naive(price, size):
    n = len(price)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if (price[j] <= price[i] and size[j] >= size[i]
                    and (price[j] < price[i] or size[j] > size[i])):
                keep[i] = False
                break
    return keep


def test_skyline_matches_naive_random():
    rng = np.random.RandomState(7)
    for _ in range(20):
        n = rng.randint(1, 60)
        price = rng.randint(0, 12, n).astype(np.int64)
        size = rng.randint(0, 12, n).astype(np.int64)
        got = _skyline_keep(price, size)
        want = _skyline_naive(price, size)
        np.testing.assert_array_equal(got, want)


def test_skyline_duplicates_survive_together():
    # two identical non-dominated points: neither dominates the other
    price = np.array([5, 5, 9], dtype=np.int64)
    size = np.array([9, 9, 9], dtype=np.int64)
    np.testing.assert_array_equal(_skyline_keep(price, size),
                                  [True, True, False])


def test_skyline_anticorrelated_chain_all_survive():
    # a strict staircase: every point is on the frontier
    price = np.arange(10, dtype=np.int64)
    size = np.arange(10, dtype=np.int64)  # bigger price, bigger size
    assert _skyline_keep(price, size).all()


def test_skyline_empty():
    assert len(_skyline_keep(np.array([], dtype=np.int64),
                             np.array([], dtype=np.int64))) == 0


# --------------------------- floor log2 -----------------------------

def test_floor_log2_exact_at_power_boundaries():
    # float log2 rounds 2^57 - 1 up; the integer path must not
    vals = []
    for k in (1, 2, 5, 31, 52, 53, 54, 57):
        vals += [2 ** k - 1, 2 ** k, 2 ** k + 1]
    w = np.array(vals, dtype=np.uint64)
    got = _floor_log2_u64(w)
    want = np.array([len(bin(int(v))) - 3 for v in vals],
                    dtype=np.int64)  # '0b1...' -> floor log2
    np.testing.assert_array_equal(got, want)


# ------------------------------ HLL ---------------------------------

def test_hll_estimate_within_tolerance():
    from nacc_form_validator_ray.pipelines.advanced import \
        q_hll_user_registers
    sf = "/root/testdata/sf0.001"
    regs = q_hll_user_registers(sf)
    import duckdb
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{sf}/events.parquet')").fetchone()[0]
    est = hll_estimate(regs)
    assert abs(est - exact) / exact < 0.35, (est, exact)


def test_hll_registers_merge_invariance():
    """Register tables are max-mergeable: two half-streams merged give
    the full-stream registers."""
    from nacc_form_validator_ray.pipelines.advanced import (HLL_M,
                                                            HLL_MULT,
                                                            _HLL_WBITS)

    def regs_of(ids):
        h = ids.astype(np.uint64) * np.uint64(HLL_MULT)
        bucket = (h & np.uint64(HLL_M - 1)).astype(np.int64)
        w = h >> np.uint64(6)
        rho = np.where(w == 0, np.int64(_HLL_WBITS + 1),
                       np.int64(_HLL_WBITS) - _floor_log2_u64(w))
        reg = np.zeros(HLL_M, dtype=np.int64)
        np.maximum.at(reg, bucket, rho)
        return reg

    rng = np.random.RandomState(3)
    ids = rng.randint(0, 10 ** 9, 5000).astype(np.int64)
    full = regs_of(ids)
    merged = np.maximum(regs_of(ids[:2500]), regs_of(ids[2500:]))
    np.testing.assert_array_equal(full, merged)


# --------------------------- fuzzy join -----------------------------

def _ed(a: str, b: str) -> int:
    # classic DP, reference implementation for the tests only
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            cur = min(d[j] + 1, d[j - 1] + 1,
                      prev + (a[i - 1] != b[j - 1]))
            prev, d[j] = d[j], cur
    return d[lb]


def test_verify_ed1_cases():
    a = np.array(["abc", "abc", "abc", "abc", "ab", "", "a", "xyz",
                  "ab"], dtype=object)
    b = np.array(["abc", "abd", "ab", "abcd", "abx", "a", "", "abc",
                  "ba"], dtype=object)
    ed = _verify_ed1(a, b)
    assert list(ed) == [0, 1, 1, 1, 1, 1, 1, 2, 2]


def test_verify_ed1_matches_dp_random():
    rng = np.random.RandomState(11)
    alpha = "ab"
    pairs = []
    for _ in range(400):
        la = rng.randint(0, 6)
        lb = rng.randint(0, 6)
        a = "".join(rng.choice(list(alpha)) for _ in range(la))
        b = "".join(rng.choice(list(alpha)) for _ in range(lb))
        pairs.append((a, b))
    na = np.array([p[0] for p in pairs], dtype=object)
    nb = np.array([p[1] for p in pairs], dtype=object)
    got = _verify_ed1(na, nb)
    for (a, b), g in zip(pairs, got):
        want = _ed(a, b)
        if want <= 1:
            assert g == want, (a, b, g, want)
        else:
            assert g == 2, (a, b, g)


def test_deletion_keys_no_false_negatives():
    """Any two strings within edit distance 1 must share at least one
    (variant length, key) bucket — the candidate-generation soundness
    property the exchange relies on."""
    rng = np.random.RandomState(5)
    words = []
    for _ in range(120):
        L = rng.randint(1, 7)
        words.append("".join(rng.choice(list("abc"))
                             for _ in range(L)))
    words = list(dict.fromkeys(words))
    names = np.array(words, dtype=object)
    ids = np.arange(len(words), dtype=np.int64)
    vlen, vkey, vid = _deletion_keys(names, ids)
    buckets = {}
    for l, k, i in zip(vlen, vkey, vid):
        buckets.setdefault((l, k), set()).add(int(i))
    for i in range(len(words)):
        for j in range(i + 1, len(words)):
            if _ed(words[i], words[j]) <= 1:
                assert any(i in s and j in s
                           for s in buckets.values()), \
                    (words[i], words[j])


def test_fuzzy_pipeline_variable_lengths(tmp_path):
    """End-to-end over a synthetic table with variable-length names:
    deletions, substitutions, exact duplicates, and far pairs."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    # ASCII only: DuckDB levenshtein counts BYTES, the engine counts
    # codepoints — identical on ASCII (the operator's documented grid)
    names = ["alpha", "alpa", "alphq", "beta", "betas", "gamma",
             "gamma", "delta", "delt", "dolt", "x", "", "y"]
    t = pa.table({"c_custkey": pa.array(range(len(names)),
                                        type=pa.int64()),
                  "c_name": pa.array(names, type=pa.string())})
    d = tmp_path / "fz"
    d.mkdir()
    pq.write_table(t, str(d / "customer.parquet"))

    from nacc_form_validator_ray.pipelines.advanced import \
        q_fuzzy_name_pairs
    got = q_fuzzy_name_pairs(str(d)).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM "
            f"read_parquet('{d}/customer.parquet')")
    from nacc_form_validator_ray.pipelines.advanced import \
        SQL_FUZZY_NAME_PAIRS
    want = con.sql(SQL_FUZZY_NAME_PAIRS).df() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"id_a": np.int64, "id_b": np.int64,
                    "ed": np.int64}),
        want.astype({"id_a": np.int64, "id_b": np.int64,
                     "ed": np.int64}))


# ------------------------- gap fill / ntile --------------------------

def test_gap_fill_zero_hours_and_rolling(tmp_path):
    """Synthetic events with a guaranteed 3-hour hole: the filled axis
    is contiguous, hole hours carry 0, and the trailing 24h total
    matches a brute-force window."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = np.datetime64("2024-01-01T00:00:00", "us")
    hrs = [0, 1, 5, 5, 5, 30]
    ts = [base + np.timedelta64(h, "h") for h in hrs]
    t = pa.table({
        "event_id": pa.array(range(len(hrs)), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array([1] * len(hrs), type=pa.int64()),
        "event_type": pa.array(["purchase"] * len(hrs)),
        "value": pa.array([1.0] * len(hrs)),
        "props": pa.array(["{}"] * len(hrs))})
    d = tmp_path / "gf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))

    from nacc_form_validator_ray.pipelines.advanced import \
        q_gap_fill_hourly_purchases
    out = q_gap_fill_hourly_purchases(str(d))
    assert len(out) == 31                      # hours 0..30 inclusive
    assert (np.diff(out["hr"].to_numpy()) == 1).all()
    n = out["n"].to_numpy()
    assert n[0] == 1 and n[5] == 3 and n[2] == 0 and n[30] == 1
    want_24h = [n[max(0, i - 23):i + 1].sum() for i in range(31)]
    np.testing.assert_array_equal(out["n_24h"].to_numpy(), want_24h)


def test_user_quartile_formula_matches_ntile_semantics():
    """The arithmetic tile assignment matches SQL NTILE: first n%k
    tiles get ceil(n/k) rows, including groups smaller than k."""
    import duckdb
    rng = np.random.RandomState(2)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 9, n).astype(np.int64),
        "value_c": rng.randint(0, 50, n).astype(np.int64)})
    want = duckdb.sql("""
        SELECT event_id,
               CAST(ntile(4) OVER (PARTITION BY user_id
                                   ORDER BY value_c, event_id)
                    AS BIGINT) AS tile
        FROM df ORDER BY event_id""").df()

    uid = df["user_id"].to_numpy()
    val = df["value_c"].to_numpy()
    eid = df["event_id"].to_numpy()
    order = np.lexsort((eid, val, uid))
    u_s, e_s = uid[order], eid[order]
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = u_s[1:] != u_s[:-1]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, n))
    grp_start = np.repeat(starts, sizes)
    gsz = np.repeat(sizes, sizes).astype(np.int64)
    r = np.arange(n, dtype=np.int64) - grp_start
    k = np.int64(4)
    q, rem = gsz // k, gsz % k
    cut = rem * (q + 1)
    tile = np.where(r < cut, r // (q + 1),
                    rem + (r - cut) // np.maximum(q, 1)) + 1
    got = pd.DataFrame({"event_id": e_s, "tile": tile}) \
        .sort_values("event_id").reset_index(drop=True)
    np.testing.assert_array_equal(got["tile"].to_numpy(),
                                  want["tile"].to_numpy())


def test_rolling_wau_counts_each_user_once_per_window(tmp_path):
    """A user active twice in one window still counts once; windows
    slide per-day; only observed days are emitted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = np.datetime64("2024-03-01T12:00:00", "us")
    rows = [  # (day offset, user)
        (0, 1), (0, 1), (1, 2), (8, 1), (8, 3)]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array([base + np.timedelta64(d, "D")
                        for d, _ in rows], type=pa.timestamp("us")),
        "user_id": pa.array([u for _, u in rows], type=pa.int64()),
        "event_type": pa.array(["click"] * len(rows)),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows))})
    d = tmp_path / "wau"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))

    from nacc_form_validator_ray.pipelines.advanced import \
        q_rolling_active_users
    out = q_rolling_active_users(str(d))
    day0 = int(np.datetime64("2024-03-01").astype(
        "datetime64[D]").astype(np.int64))
    got = dict(zip(out["day"] - day0, out["wau"]))
    # observed days: 0, 1, 8. windows: d0={u1}, d1={u1,u2},
    # d8={u1(day8),u3,u2(day1 in window? 8-6=2 no)} -> {1,3} + u2? day1
    # is outside [2..8] -> {1,3}=2... but u1 day0 also outside; u1
    # counted via day8 activity.
    assert got == {0: 1, 1: 2, 8: 2}
    assert set(out["day"] - day0) == {0, 1, 8}


def test_event_type_ops_tolerate_null_types(tmp_path):
    """The three event_type operators and the profiler share the
    null contract: null-typed events are excluded (profiled columns
    report them as nulls instead of garbage) and every output still
    matches its DuckDB twin."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = np.datetime64("2024-05-01T00:00:00", "us")
    types = ["click", None, "view", "click", None, "buy"]
    t = pa.table({
        "event_id": pa.array(range(6), type=pa.int64()),
        "ts": pa.array([base + np.timedelta64(i, "h")
                        for i in range(6)], type=pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2, 2], type=pa.int64()),
        "event_type": pa.array(types, type=pa.string()),
        "value": pa.array([1.0] * 6),
        "props": pa.array(["{}"] * 6)})
    d = tmp_path / "nulls"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))

    from nacc_form_validator_ray.pipelines.advanced import (
        ADV_ORACLE_SQL, ADV_QUERIES)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')")
    for name in ("top_event_type_per_user", "top_user_journeys",
                 "event_type_transitions", "column_profile_events"):
        got = ADV_QUERIES[name](str(d))
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        want = con.sql(ADV_ORACLE_SQL[name]).df()
        cols = sorted(got.columns)
        got = got[cols].astype(str).sort_values(cols) \
            .reset_index(drop=True)
        want = want[cols].astype(str).sort_values(cols) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want), name
