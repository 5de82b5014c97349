"""Advanced analytics operators: dominance (Pareto skyline), grouped
mode, table profiling, HyperLogLog registers, and an edit-distance
fuzzy join.

Each operator follows the repo's contract: a Ray-Data-native pipeline
(combiner partials + at most one lean hash exchange) paired with a
DuckDB oracle producing identical column names, dtypes and values.
These extend the engine beyond the reference's rule-validation surface
(reference: nacc-form-validator `quality_check.py` has no relational
analytics at all) into the standard warehouse/curation toolkit a
100-TB corpus pipeline needs.

Registered into the main registry by ``pipelines/queries.py`` (same
mechanism as the TPC-H remainder in ``pipelines/tpch.py``).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

ADV_QUERIES: Dict[str, object] = {}
ADV_ORACLE_SQL: Dict[str, str] = {}


def _rd():
    import ray.data as rd
    return rd


# --------------------------------------------------------------------------
# Pareto frontier (skyline / dominance) over part
# --------------------------------------------------------------------------

_I64_MIN = np.iinfo(np.int64).min


def _skyline_keep(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D skyline: minimize ``price``,
    maximize ``size``; duplicates of a non-dominated point all survive
    (neither dominates the other).

    Vectorized: sort by price, compute the inclusive running max of
    size at each distinct-price group end; a point is dominated iff a
    strictly cheaper point has size >= its own (d1) or a
    no-more-expensive point has size strictly greater (d2)."""
    n = len(price)
    if n == 0:
        return np.zeros(0, dtype=bool)
    o = np.argsort(price, kind="stable")
    p_s, s_s = price[o], size[o]
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = False
    new_grp[1:] = p_s[1:] != p_s[:-1]
    gidx = np.cumsum(new_grp)
    grp_last = np.append(np.flatnonzero(new_grp) - 1, n - 1)
    cmax = np.maximum.accumulate(s_s)
    grp_max = cmax[grp_last]                       # inclusive, per group
    d2 = grp_max[gidx] > s_s
    prev_max = np.where(gidx > 0,
                        grp_max[np.maximum(gidx - 1, 0)], _I64_MIN)
    d1 = prev_max >= s_s
    keep = np.zeros(n, dtype=bool)
    keep[o] = ~(d1 | d2)
    return keep


def q_pareto_parts(sf_dir: str) -> pd.DataFrame:
    """Pareto frontier (skyline) of the part table: parts not dominated
    on (cheaper-or-equal price, larger-or-equal size, strict in one) —
    the dominance operator behind multi-objective data selection
    (e.g. quality-vs-cost curation cuts).

    Distributed shape: the skyline of a union is contained in the
    union of per-batch skylines, so each batch emits its LOCAL skyline
    (vectorized sort + running max, no pairwise scan) and the driver
    applies the same filter once to the bounded union — no exchange at
    all. Local-skyline size is O(log n) expected for independently
    distributed objectives; anti-correlated objectives can inflate the
    partials (documented bound: worst case the whole batch), which is
    inherent to skyline cardinality, not the plan."""
    import pyarrow as pa

    ds = _rd().read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_retailprice", "p_size"])

    def local_skyline(t: "pa.Table") -> pd.DataFrame:
        price = np.floor(
            t["p_retailprice"].to_numpy(zero_copy_only=False) * 100
            + 0.5).astype(np.int64)
        size = t["p_size"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keys = t["p_partkey"].to_numpy(zero_copy_only=False)
        keep = _skyline_keep(price, size)
        return pd.DataFrame({"p_partkey": keys[keep],
                             "price_c": price[keep],
                             "p_size": size[keep]})

    cand = ds.map_batches(local_skyline,
                          batch_format="pyarrow").to_pandas()
    if cand.empty:
        return pd.DataFrame({
            "p_partkey": pd.Series([], dtype=np.int64),
            "price_c": pd.Series([], dtype=np.int64),
            "p_size": pd.Series([], dtype=np.int64)})
    keep = _skyline_keep(cand["price_c"].to_numpy(np.int64),
                         cand["p_size"].to_numpy(np.int64))
    out = cand.loc[keep].sort_values("p_partkey", kind="stable")
    return out.reset_index(drop=True)


SQL_PARETO_PARTS = """
WITH pts AS (
  SELECT p_partkey,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(p_size AS BIGINT) AS p_size
  FROM part)
SELECT p.p_partkey, p.price_c, p.p_size
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.price_c <= p.price_c AND q.p_size >= p.p_size
    AND (q.price_c < p.price_c OR q.p_size > p.p_size))
"""

ADV_QUERIES["pareto_parts"] = q_pareto_parts
ADV_ORACLE_SQL["pareto_parts"] = SQL_PARETO_PARTS


# --------------------------------------------------------------------------
# Grouped mode: most frequent event type per user
# --------------------------------------------------------------------------

def q_top_event_type_per_user(sf_dir: str) -> pd.DataFrame:
    """Grouped MODE: each user's most frequent event type (ties to the
    lexicographically smallest type) with its count — the categorical
    summary aggregate (SQL's ``mode()``) done the pre-aggregated way.

    Per-batch combiners reduce the stream to (user, type, n) partials
    — at most |users|x|types| rows per batch — then ONE hash exchange
    on user_id co-locates each user's partials for the vectorized
    argmax (sort + drop_duplicates, no per-user loop)."""
    from nacc_form_validator_ray.stages.partition import grouped_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        # null-typed events are excluded by contract (the twin filters
        # them too); pandas groupby drops NaN keys, dropna makes it
        # explicit
        g = df.groupby(["user_id", "event_type"], as_index=False,
                       sort=False, dropna=True).size()
        return g.rename(columns={"size": "n_events"})

    def pick_mode(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["user_id", "event_type"],
                         as_index=False)["n_events"].sum()
        g = g.sort_values(["user_id", "n_events", "event_type"],
                          ascending=[True, False, True], kind="stable")
        out = g.drop_duplicates("user_id", keep="first")
        return pd.DataFrame({
            "user_id": out["user_id"].to_numpy(np.int64),
            "top_type": out["event_type"].to_numpy(object),
            "n_events": out["n_events"].to_numpy(np.int64)})

    return grouped_apply(
        ds.map_batches(partial_counts, batch_format="pandas"),
        ["user_id"], pick_mode, num_partitions=16)


SQL_TOP_EVENT_TYPE = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events
  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY user_id
      ORDER BY n_events DESC, event_type) AS rn
  FROM c)
SELECT user_id, event_type AS top_type, n_events FROM r WHERE rn = 1
"""

ADV_QUERIES["top_event_type_per_user"] = q_top_event_type_per_user
ADV_ORACLE_SQL["top_event_type_per_user"] = SQL_TOP_EVENT_TYPE


# --------------------------------------------------------------------------
# Column profiling (data-quality describe) over events
# --------------------------------------------------------------------------

def _profile_views(t) -> Dict[str, tuple]:
    """Canonical per-column views of an events batch: (int64 values or
    object strings, null mask). Value rides the cent grid, ts as epoch
    micros — the repo's bit-stable numeric contract."""
    views = {}
    for col in ("event_id", "user_id"):
        c = t[col]
        mask = (c.is_null().to_numpy(zero_copy_only=False)
                if c.null_count > 0 else None)
        vals = c.to_numpy(zero_copy_only=False)
        if mask is not None:
            # null ids surface as NaN floats; zero them before the
            # int cast so garbage never reaches min/distinct
            vals = np.where(mask, 0, vals)
        views[col] = (vals.astype(np.int64), mask)
    ty = t["event_type"]
    ty_null = ty.null_count > 0
    views["event_type"] = (
        ty.to_numpy(zero_copy_only=False),
        ty.is_null().to_numpy(zero_copy_only=False) if ty_null
        else None)
    val = t["value"]
    vmask = (val.is_null().to_numpy(zero_copy_only=False)
             if val.null_count > 0 else None)
    v = val.to_numpy(zero_copy_only=False).astype(np.float64)
    if vmask is not None:
        v = np.where(vmask, 0.0, v)
    views["value_c"] = (np.floor(v * 100 + 0.5).astype(np.int64),
                        vmask)
    ts = t["ts"]
    tmask = (ts.is_null().to_numpy(zero_copy_only=False)
             if ts.null_count > 0 else None)
    tv = ts.to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").view(np.int64)
    if tmask is not None:
        tv = np.where(tmask, np.int64(0), tv)
    views["ts_us"] = (tv, tmask)
    return views


def q_column_profile_events(sf_dir: str) -> pd.DataFrame:
    """Table profiling (the warehouse ``DESCRIBE``/data-quality scan):
    per column of the events table — row count, null count, EXACT
    distinct count, min and max (rendered as VARCHAR so one schema
    covers numeric and string columns).

    Two bounded passes: (1) count/null/min/max ride per-batch
    combiner partials (5 rows per batch) merged on the driver; (2) the
    exact distinct count melts each batch to its LOCAL per-column
    unique values and runs ONE hash exchange on (col, value) — the
    exchange carries the sum of per-batch distincts, never the raw
    stream, and the result is per-partition counts (25 rows each). At
    100 TB the distinct pass is the honest distributed shape (identical
    to the exact-dedup decision exchange); KMV/HLL sketches
    (distinct_users_kmv, hll_user_registers) are the bounded-state
    alternative when approximation is acceptable."""
    import pyarrow as pa

    from nacc_form_validator_ray.stages.partition import grouped_apply

    # consumed twice (stats pass + distinct pass): each consumption
    # re-executes the pruned streaming read — the 100-TB shape (a
    # mid-pipeline materialize would pin the table in the object store)
    ds = _rd().read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value", "ts"])

    def stats_partial(t: "pa.Table") -> pd.DataFrame:
        rows = []
        n = t.num_rows
        for col, (vals, mask) in _profile_views(t).items():
            n_null = int(mask.sum()) if mask is not None else 0
            valid = vals if mask is None else vals[~mask]
            if vals.dtype == object:
                mn_s = min(valid) if len(valid) else None
                mx_s = max(valid) if len(valid) else None
                rows.append((col, n, n_null, np.iinfo(np.int64).max,
                             _I64_MIN, mn_s, mx_s))
            else:
                mn = int(valid.min()) if len(valid) \
                    else np.iinfo(np.int64).max
                mx = int(valid.max()) if len(valid) else _I64_MIN
                rows.append((col, n, n_null, mn, mx, None, None))
        return pd.DataFrame(rows, columns=[
            "col", "n", "n_null", "min_i", "max_i", "min_s", "max_s"])

    def melt_unique(t: "pa.Table") -> pd.DataFrame:
        frames = []
        for col, (vals, mask) in _profile_views(t).items():
            valid = vals if mask is None else vals[~mask]
            if valid.dtype != object:
                u = np.unique(valid).astype("U")
            else:
                u = np.unique(valid.astype("U"))
            frames.append(pd.DataFrame({
                "col": np.full(len(u), col, dtype=object),
                "v": u.astype(object)}))
        return pd.concat(frames, ignore_index=True)

    def count_distinct(part: pd.DataFrame) -> pd.DataFrame:
        g = part.drop_duplicates().groupby("col", as_index=False).size()
        return pd.DataFrame({"col": g["col"].to_numpy(object),
                             "nd": g["size"].to_numpy(np.int64)})

    stats = ds.map_batches(stats_partial,
                           batch_format="pyarrow").to_pandas()
    nd_parts = grouped_apply(
        ds.map_batches(melt_unique, batch_format="pyarrow"),
        ["col", "v"], count_distinct, num_partitions=16).to_pandas()

    # None-filtering object min/max: a batch whose string column is
    # all-null emits min_s=None, and pandas' object min cannot mix the
    # NaN it becomes with real strings (groups here are 5 x blocks
    # rows, so the Python filter is free)
    def _omin(s):
        v = [x for x in s if isinstance(x, str)]
        return min(v) if v else None

    def _omax(s):
        v = [x for x in s if isinstance(x, str)]
        return max(v) if v else None

    merged = stats.groupby("col", as_index=False).agg(
        n_rows=("n", "sum"), n_null=("n_null", "sum"),
        min_i=("min_i", "min"), max_i=("max_i", "max"),
        min_s=("min_s", _omin), max_s=("max_s", _omax))
    nd = nd_parts.groupby("col", as_index=False)["nd"].sum() \
        if not nd_parts.empty and "col" in nd_parts.columns \
        else pd.DataFrame({"col": [], "nd": []})
    merged = merged.merge(nd, on="col", how="left")
    merged["nd"] = merged["nd"].fillna(0).astype(np.int64)

    is_str = merged["min_s"].notna().to_numpy()
    has_valid = (merged["n_rows"] > merged["n_null"]).to_numpy()
    min_int = merged["min_i"].to_numpy(np.int64).astype("U") \
        .astype(object)
    max_int = merged["max_i"].to_numpy(np.int64).astype("U") \
        .astype(object)
    merged["min_v"] = np.where(
        has_valid,
        np.where(is_str, merged["min_s"].to_numpy(object), min_int),
        None)
    merged["max_v"] = np.where(
        has_valid,
        np.where(is_str, merged["max_s"].to_numpy(object), max_int),
        None)
    out = merged[["col", "n_rows", "n_null", "nd", "min_v", "max_v"]] \
        .rename(columns={"nd": "n_distinct"}) \
        .sort_values("col", kind="stable").reset_index(drop=True)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["n_null"] = out["n_null"].astype(np.int64)
    return out


SQL_COLUMN_PROFILE_EVENTS = """
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c,
         epoch_us(ts) AS ts_us
  FROM events)
SELECT 'event_id' AS col, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
       CAST(min(event_id) AS VARCHAR) AS min_v,
       CAST(max(event_id) AS VARCHAR) AS max_v FROM e
UNION ALL
SELECT 'user_id', count(*), count(*) - count(user_id),
       count(DISTINCT user_id),
       CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
FROM e
UNION ALL
SELECT 'event_type', count(*), count(*) - count(event_type),
       count(DISTINCT event_type),
       min(event_type), max(event_type) FROM e
UNION ALL
SELECT 'value_c', count(*), count(*) - count(value_c),
       count(DISTINCT value_c),
       CAST(min(value_c) AS VARCHAR), CAST(max(value_c) AS VARCHAR)
FROM e
UNION ALL
SELECT 'ts_us', count(*), count(*) - count(ts_us),
       count(DISTINCT ts_us),
       CAST(min(ts_us) AS VARCHAR), CAST(max(ts_us) AS VARCHAR)
FROM e
"""

ADV_QUERIES["column_profile_events"] = q_column_profile_events
ADV_ORACLE_SQL["column_profile_events"] = SQL_COLUMN_PROFILE_EVENTS


# --------------------------------------------------------------------------
# HyperLogLog registers over event users
# --------------------------------------------------------------------------

HLL_M = 64                      # 2^6 buckets
HLL_MULT = 6364136223846793005  # Knuth MMIX LCG multiplier (public)
_HLL_WBITS = 58                 # 64 - 6 bucket bits


def _floor_log2_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized floor(log2(w)) for uint64 (w > 0 positions;
    w == 0 rows return 0 and must be masked by the caller). Float
    log2 would round 2^k - 1 up across the power boundary for
    k > 53, so this stays in integer space (6-step binary search)."""
    r = np.zeros(w.shape, dtype=np.int64)
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        r[big] += s
        v[big] >>= np.uint64(s)
    return r


def q_hll_user_registers(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog sketch (Flajolet et al. 2007) of distinct event
    users, exposed as its REGISTER TABLE — (bucket, max leading-zero
    rank) — the mergeable fixed-size state every engine's
    approx_count_distinct carries. 64 buckets; hash is the Knuth
    multiplicative mix mod 2^64, bucket = low 6 bits, rank rho =
    position of the highest set bit in the remaining 58 (all exact
    integer arithmetic, so the DuckDB twin reproduces every register
    bit-for-bit via HUGEINT mod/div and bin()-length).

    Scale shape: each batch folds to a 64-cell partial (np.maximum.at)
    — the exchange IS the sketch, never the ids; the driver max-merges
    O(64 x blocks) rows. The estimate itself is a driver-side formula
    over 64 integers (tested against the exact count in pytest); the
    registers are the query output because they are the artifact a
    multi-day ingest would persist and merge."""
    import pyarrow as pa

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id"])

    def partial_regs(t: "pa.Table") -> pd.DataFrame:
        ids = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        idx, reg = hll_fold_registers(ids)
        return pd.DataFrame({"bucket": idx, "rho": reg})

    parts = ds.map_batches(partial_regs,
                           batch_format="pyarrow").to_pandas()
    if parts.empty or "bucket" not in parts.columns:
        return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                             "rho": pd.Series([], dtype=np.int64)})
    out = parts.groupby("bucket", as_index=False)["rho"].max()
    return out.sort_values("bucket", kind="stable") \
        .reset_index(drop=True)


def hll_fold_registers(ids: np.ndarray):
    """Fold a uint64 id array into its HIT register cells:
    (bucket_idx, rho) arrays — the per-batch combiner shared by the
    register query and the estimate query's fused single pass."""
    with np.errstate(over="ignore"):
        h = ids * np.uint64(HLL_MULT)
    bucket = (h & np.uint64(HLL_M - 1)).astype(np.int64)
    w = h >> np.uint64(6)
    rho = np.where(w == 0, np.int64(_HLL_WBITS + 1),
                   np.int64(_HLL_WBITS) - _floor_log2_u64(w))
    reg = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(reg, bucket, rho)
    hit = np.zeros(HLL_M, dtype=bool)
    hit[bucket] = True
    idx = np.flatnonzero(hit)
    return idx.astype(np.int64), reg[idx]


def hll_estimate(registers: pd.DataFrame, m: int = HLL_M) -> float:
    """Driver-side HLL estimate from the register table (alpha_64 =
    0.709; small-range linear-counting correction below 2.5m)."""
    reg = np.zeros(m, dtype=np.int64)
    reg[registers["bucket"].to_numpy(np.int64)] = \
        registers["rho"].to_numpy(np.int64)
    est = 0.709 * m * m / np.sum(np.power(2.0, -reg.astype(float)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


SQL_HLL_USER_REGISTERS = f"""
WITH h AS (
  SELECT CAST((CAST(user_id AS HUGEINT) * {HLL_MULT})
              % 18446744073709551616 AS HUGEINT) AS hv
  FROM events),
b AS (
  SELECT CAST(hv % {HLL_M} AS BIGINT) AS bucket,
         CAST(hv // {HLL_M} AS BIGINT) AS w
  FROM h)
SELECT bucket,
       CAST(max(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                     ELSE {_HLL_WBITS + 1} - length(bin(w)) END)
            AS BIGINT) AS rho
FROM b GROUP BY bucket
"""

ADV_QUERIES["hll_user_registers"] = q_hll_user_registers
ADV_ORACLE_SQL["hll_user_registers"] = SQL_HLL_USER_REGISTERS


# --------------------------------------------------------------------------
# Edit-distance <= 1 fuzzy self-join over customer names
# --------------------------------------------------------------------------

_ED_P31 = 2_147_483_647
_ED_M1, _ED_M2 = 131, 137


def _deletion_keys(names: np.ndarray, ids: np.ndarray):
    """Deletion-neighborhood candidate keys: for every string emit the
    string itself plus each single-character deletion, keyed by
    (variant length, 62-bit double char-fold). Two strings within
    edit distance 1 ALWAYS share a variant (substitution: delete the
    differing position from both; deletion: the shorter string IS a
    variant of the longer; equality: the identity variant), so the
    bucketing has no false negatives; fold collisions only add
    candidates that exact verification removes.

    Vectorized per length group: prefix folds P[i] = fold(s[:i]) and
    weighted suffix sums S[i] = fold(s[i:]) give every deletion's fold
    as P[i] * M^(L-1-i) + S[i+1] in O(L) column operations — no
    per-row Python, no variant strings built."""
    out_len, out_key, out_id = [], [], []
    lens = np.array([len(s) for s in names], dtype=np.int64)
    for L in np.unique(lens):
        sel = lens == L
        grp_ids = ids[sel]
        n = int(sel.sum())
        if L == 0:
            out_len.append(np.zeros(n, np.int64))
            out_key.append(np.zeros(n, np.int64))
            out_id.append(grp_ids)
            continue
        mat = np.array([s for s in names[sel]], dtype=f"U{L}") \
            .view(np.uint32).reshape(n, L).astype(np.int64)
        keys = None
        for m_idx, mult in enumerate((_ED_M1, _ED_M2)):
            pows = np.empty(L + 1, dtype=np.int64)
            pows[0] = 1
            for j in range(1, L + 1):
                pows[j] = (pows[j - 1] * mult) % _ED_P31
            pre = np.zeros((n, L + 1), dtype=np.int64)
            for j in range(L):
                pre[:, j + 1] = (pre[:, j] * mult + mat[:, j]) % _ED_P31
            suf = np.zeros((n, L + 1), dtype=np.int64)
            for j in range(L - 1, -1, -1):
                suf[:, j] = (mat[:, j] * pows[L - 1 - j]
                             + suf[:, j + 1]) % _ED_P31
            # deletion at i: fold = pre[i] * M^(L-1-i) + suf[i+1]
            dels = (pre[:, :L] * pows[L - 1::-1][None, :]
                    + suf[:, 1:]) % _ED_P31
            full = pre[:, L:]                     # identity variant
            fold = np.concatenate([dels, full], axis=1)
            if m_idx == 0:
                keys = fold << np.int64(31)
            else:
                keys = keys | fold
        vlen = np.concatenate([
            np.full((n, L), L - 1, dtype=np.int64),
            np.full((n, 1), L, dtype=np.int64)], axis=1)
        out_len.append(vlen.ravel())
        out_key.append(keys.ravel())
        out_id.append(np.repeat(grp_ids, L + 1))
    return (np.concatenate(out_len), np.concatenate(out_key),
            np.concatenate(out_id))


def _verify_ed1(name_a: np.ndarray, name_b: np.ndarray) -> np.ndarray:
    """Exact edit distance for candidate pairs, vectorized per
    (len_a, len_b) group; returns ed in {0, 1} or 2 meaning 'more than
    1' (dropped by the caller). Only equal-length (substitution) and
    off-by-one-length (deletion) groups can pass."""
    n = len(name_a)
    ed = np.full(n, 2, dtype=np.int64)
    la = np.array([len(s) for s in name_a], dtype=np.int64)
    lb = np.array([len(s) for s in name_b], dtype=np.int64)
    for (ga, gb) in {(int(a), int(b))
                     for a, b in zip(la, lb) if abs(a - b) <= 1}:
        sel = np.flatnonzero((la == ga) & (lb == gb))
        if len(sel) == 0:
            continue
        if ga == gb:
            if ga == 0:
                ed[sel] = 0
                continue
            A = np.array([name_a[i] for i in sel], dtype=f"U{ga}") \
                .view(np.uint32).reshape(len(sel), ga)
            B = np.array([name_b[i] for i in sel], dtype=f"U{gb}") \
                .view(np.uint32).reshape(len(sel), gb)
            mism = (A != B).sum(axis=1)
            ed[sel[mism == 0]] = 0
            ed[sel[mism == 1]] = 1
        else:
            # orient: X = longer (L+1 chars), Y = shorter (L chars)
            if ga > gb:
                xs, ys, L = [name_a[i] for i in sel], \
                    [name_b[i] for i in sel], gb
            else:
                xs, ys, L = [name_b[i] for i in sel], \
                    [name_a[i] for i in sel], ga
            if L == 0:
                ed[sel] = 1          # one char vs empty
                continue
            X = np.array(xs, dtype=f"U{L + 1}").view(np.uint32) \
                .reshape(len(sel), L + 1)
            Y = np.array(ys, dtype=f"U{L}").view(np.uint32) \
                .reshape(len(sel), L)
            pre_mism = X[:, :L] != Y
            k = np.where(pre_mism.any(axis=1),
                         pre_mism.argmax(axis=1), L)
            suf_mism = X[:, 1:] != Y
            last = np.where(suf_mism.any(axis=1),
                            L - 1 - suf_mism[:, ::-1].argmax(axis=1),
                            -1)
            ok = last < k
            ed[sel[ok]] = 1
    return ed


def q_fuzzy_name_pairs(sf_dir: str) -> pd.DataFrame:
    """Fuzzy self-join: customer-name pairs within edit distance 1 —
    the entity-resolution / spelling-variant dedup operator (exact
    Levenshtein semantics, candidate generation by deletion
    neighborhoods as in SymSpell-style spell indexes).

    Shape: a map pass emits each name's L+1 deletion-variant KEYS
    (62-bit folds — variant strings are never materialized, so the
    exchange payload is (len, key, id, name) with names only as the
    verify payload); ONE hash exchange on the variant key buckets
    candidates; in-bucket pair emission; a second lean exchange on
    (id_a, id_b) dedups pairs found via multiple variants and runs the
    EXACT vectorized edit-distance verify. The O(N^2) work never
    happens — only same-bucket pairs are compared — and the DuckDB
    twin is the plain quadratic levenshtein join. Distance is counted
    over CODEPOINTS; DuckDB's levenshtein counts bytes, so the twin is
    bit-identical on ASCII data (which the fixture is)."""
    import pyarrow as pa

    from nacc_form_validator_ray.stages.partition import grouped_apply

    ds = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_name"])

    def emit_variants(t: "pa.Table") -> pd.DataFrame:
        names = t["c_name"].to_numpy(zero_copy_only=False)
        ids = t["c_custkey"].to_numpy(zero_copy_only=False)
        name_by_id = pd.Series(names, index=ids)
        vlen, vkey, vid = _deletion_keys(names, ids)
        return pd.DataFrame({
            "vlen": vlen, "vkey": vkey, "cid": vid,
            "name": name_by_id.loc[vid].to_numpy(object)})

    def bucket_pairs(part: pd.DataFrame) -> pd.DataFrame:
        from nacc_form_validator_ray.stages.partition import \
            run_boundaries
        vlen = part["vlen"].to_numpy(np.int64)
        vkey = part["vkey"].to_numpy(np.int64)
        ids = part["cid"].to_numpy(np.int64)
        names = part["name"].to_numpy(object)
        order, starts = run_boundaries([vlen, vkey])
        ends = np.append(starts[1:], len(order))
        pa_, pb_, na_, nb_ = [], [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            idx = order[s:e]
            uniq, first_pos = np.unique(ids[idx], return_index=True)
            if len(uniq) < 2:
                continue
            idx = idx[first_pos]
            ai, bi = np.triu_indices(len(idx), k=1)
            pa_.append(ids[idx][ai])
            pb_.append(ids[idx][bi])
            na_.append(names[idx][ai])
            nb_.append(names[idx][bi])
        if not pa_:
            # a typed empty Arrow table: an empty pandas object column
            # converts to Arrow null and trips block-schema unification
            import pyarrow as _pa
            return _pa.table({
                "id_a": _pa.array([], type=_pa.int64()),
                "id_b": _pa.array([], type=_pa.int64()),
                "name_a": _pa.array([], type=_pa.string()),
                "name_b": _pa.array([], type=_pa.string())})
        return pd.DataFrame({
            "id_a": np.concatenate(pa_), "id_b": np.concatenate(pb_),
            "name_a": np.concatenate(na_),
            "name_b": np.concatenate(nb_)})

    def dedup_verify(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop_duplicates(["id_a", "id_b"], keep="first")
        if part.empty:
            return pd.DataFrame({
                "id_a": pd.Series([], dtype=np.int64),
                "id_b": pd.Series([], dtype=np.int64),
                "ed": pd.Series([], dtype=np.int64)})
        ed = _verify_ed1(part["name_a"].to_numpy(object),
                         part["name_b"].to_numpy(object))
        keep = ed <= 1
        return pd.DataFrame({
            "id_a": part["id_a"].to_numpy(np.int64)[keep],
            "id_b": part["id_b"].to_numpy(np.int64)[keep],
            "ed": ed[keep]})

    cands = grouped_apply(
        ds.map_batches(emit_variants, batch_format="pyarrow"),
        ["vlen", "vkey"], bucket_pairs, num_partitions=32)
    return grouped_apply(cands, ["id_a", "id_b"], dedup_verify,
                         num_partitions=16)


SQL_FUZZY_NAME_PAIRS = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS ed
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""

ADV_QUERIES["fuzzy_name_pairs"] = q_fuzzy_name_pairs
ADV_ORACLE_SQL["fuzzy_name_pairs"] = SQL_FUZZY_NAME_PAIRS


# --------------------------------------------------------------------------
# Time-series gap fill + trailing window over the event stream
# --------------------------------------------------------------------------

def q_gap_fill_hourly_purchases(sf_dir: str) -> pd.DataFrame:
    """Time-series densification: hourly purchase counts with EVERY
    hour between the first and last purchase present (gap hours
    zero-filled), plus the trailing 24-hour rolling total — the
    monitoring/feature-engineering op plain grouped aggregation can't
    express (missing slots simply don't exist in the grouped output).

    Shape: per-batch (hour, n) combiner partials ride to the driver
    (the merge is CALENDAR-sized — hours in the observed range — no
    matter how many events), the zero-filled axis is one np.arange,
    and the rolling sum is a cumsum difference. At 100 TB the heavy
    side stays in the combiners; only bounded (hour, count) rows
    move."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sel = df.loc[df["event_type"] == "purchase", "ts"]
        hr = (sel.to_numpy().astype("datetime64[us]").view(np.int64)
              // np.int64(3_600_000_000))
        u, c = np.unique(hr, return_counts=True)
        return pd.DataFrame({"hr": u, "n": c.astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty or "hr" not in parts.columns:
        return pd.DataFrame({"hr": pd.Series([], dtype=np.int64),
                             "n": pd.Series([], dtype=np.int64),
                             "n_24h": pd.Series([], dtype=np.int64)})
    g = parts.groupby("hr")["n"].sum()
    lo, hi = int(g.index.min()), int(g.index.max())
    axis = np.arange(lo, hi + 1, dtype=np.int64)
    n = np.zeros(len(axis), dtype=np.int64)
    n[g.index.to_numpy(np.int64) - lo] = g.to_numpy(np.int64)
    cum = np.cumsum(n)
    n_24h = cum - np.concatenate([np.zeros(min(24, len(cum)),
                                           dtype=np.int64),
                                  cum[:-24] if len(cum) > 24 else
                                  np.zeros(0, dtype=np.int64)])
    return pd.DataFrame({"hr": axis, "n": n, "n_24h": n_24h})


SQL_GAP_FILL_HOURLY = """
WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hr,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
cal AS (
  SELECT unnest(generate_series((SELECT min(hr) FROM h),
                                (SELECT max(hr) FROM h))) AS hr),
f AS (
  SELECT cal.hr, CAST(coalesce(h.n, 0) AS BIGINT) AS n
  FROM cal LEFT JOIN h ON cal.hr = h.hr)
SELECT hr, n,
       CAST(sum(n) OVER (ORDER BY hr
                         ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_24h
FROM f
"""

ADV_QUERIES["gap_fill_hourly_purchases"] = q_gap_fill_hourly_purchases
ADV_ORACLE_SQL["gap_fill_hourly_purchases"] = SQL_GAP_FILL_HOURLY


# --------------------------------------------------------------------------
# Key-skew report: exact distributed top-k by frequency
# --------------------------------------------------------------------------

SKEW_TOP_K = 10


def q_key_skew_report(sf_dir: str) -> pd.DataFrame:
    """Partition-key skew diagnosis: the ``SKEW_TOP_K`` heaviest
    user_id keys of the event stream with exact counts and permille
    share — the report an engineer reads before choosing exchange keys
    (the engine's ``isolate_heavy_frac`` consumes exactly this
    signal). heavy_hitters is the sketched estimate; this is the exact
    distributed top-k-by-frequency.

    Shape: per-batch (key, n) combiners, ONE hash exchange on key for
    the global sums, per-partition LOCAL top-k (lean k rows each), and
    a k x P driver merge with the deterministic (n DESC, key) tie
    order. Total row count comes from parquet metadata (no extra
    pass)."""
    from nacc_form_validator_ray.stages.partition import grouped_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id"])
    total = ds.count()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(df["user_id"].to_numpy(np.int64),
                         return_counts=True)
        return pd.DataFrame({"key": u, "n": c.astype(np.int64)})

    def local_topk(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("key", as_index=False)["n"].sum()
        g = g.sort_values(["n", "key"], ascending=[False, True],
                          kind="stable")
        return g.head(SKEW_TOP_K)

    cand = grouped_apply(
        ds.map_batches(partial, batch_format="pandas"),
        ["key"], local_topk, num_partitions=16).to_pandas()
    cand = cand.sort_values(["n", "key"], ascending=[False, True],
                            kind="stable").head(SKEW_TOP_K)
    n = cand["n"].to_numpy(np.int64)
    return pd.DataFrame({
        "key": cand["key"].to_numpy(np.int64),
        "n": n,
        "permille": n * np.int64(1000) // np.int64(max(total, 1))})


SQL_KEY_SKEW_REPORT = f"""
WITH c AS (
  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM events)
SELECT key, n, CAST(n * 1000 // total AS BIGINT) AS permille
FROM c, t
ORDER BY n DESC, key
LIMIT {SKEW_TOP_K}
"""

ADV_QUERIES["key_skew_report"] = q_key_skew_report
ADV_ORACLE_SQL["key_skew_report"] = SQL_KEY_SKEW_REPORT


# --------------------------------------------------------------------------
# Per-group NTILE: value quartiles within each user's events
# --------------------------------------------------------------------------

def q_user_value_quartiles(sf_dir: str) -> pd.DataFrame:
    """Per-GROUP NTILE(4): each event's value quartile WITHIN its
    user's history — the grouped variant of the global ntile_docs
    (SQL: NTILE(4) OVER (PARTITION BY user_id ORDER BY value_c,
    event_id)). ONE user_id hash exchange, then a single lexsort per
    partition assigns every user's tiles arithmetically (the first
    n%k tiles hold ceil(n/k) rows) — no per-user loop."""
    from nacc_form_validator_ray.stages.partition import grouped_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "user_id": df["user_id"].to_numpy(np.int64),
            "value_c": np.floor(df["value"].to_numpy(np.float64) * 100
                                + 0.5).astype(np.int64)})
        return out

    def assign(part: pd.DataFrame) -> pd.DataFrame:
        uid = part["user_id"].to_numpy(np.int64)
        val = part["value_c"].to_numpy(np.int64)
        eid = part["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, val, uid))
        u_s, v_s, e_s = uid[order], val[order], eid[order]
        new = np.empty(len(u_s), dtype=bool)
        if len(u_s):
            new[0] = True
            new[1:] = u_s[1:] != u_s[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(u_s)))
        grp_start = np.repeat(starts, sizes)
        n = np.repeat(sizes, sizes).astype(np.int64)
        r = np.arange(len(u_s), dtype=np.int64) - grp_start
        k = np.int64(4)
        q, rem = n // k, n % k
        cut = rem * (q + 1)
        tile = np.where(r < cut, r // (q + 1),
                        rem + (r - cut) // np.maximum(q, 1))
        return pd.DataFrame({"event_id": e_s, "user_id": u_s,
                             "value_c": v_s,
                             "tile": (tile + 1).astype(np.int64)})

    return grouped_apply(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], assign, num_partitions=16)


SQL_USER_VALUE_QUARTILES = """
WITH e AS (
  SELECT event_id, user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
  FROM events)
SELECT event_id, user_id, value_c,
       CAST(ntile(4) OVER (PARTITION BY user_id
                           ORDER BY value_c, event_id) AS BIGINT)
           AS tile
FROM e
"""

ADV_QUERIES["user_value_quartiles"] = q_user_value_quartiles
ADV_ORACLE_SQL["user_value_quartiles"] = SQL_USER_VALUE_QUARTILES


# --------------------------------------------------------------------------
# Journey-prefix funnel mining (grouped ordered string_agg + top-k)
# --------------------------------------------------------------------------

JOURNEY_PREFIX = 3
JOURNEY_TOP_K = 20


def q_top_user_journeys(sf_dir: str) -> pd.DataFrame:
    """Journey pattern mining: each user's first ``JOURNEY_PREFIX``
    event types joined in time order ('click>view>purchase'), counted
    across users, top ``JOURNEY_TOP_K`` paths — the ordered
    string_agg family (grouped concatenation in a deterministic
    order) plus funnel-prefix analytics.

    ONE user_id hash exchange; inside each partition a single lexsort
    ranks every user's events, the prefix rows are picked by
    group-relative rank (no per-user loop until the inherently
    output-sized string joins), and only (journey, count) partials —
    bounded by users per partition — reach the driver's top-k
    merge."""
    from nacc_form_validator_ray.stages.partition import grouped_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def journeys(part: pd.DataFrame) -> pd.DataFrame:
        # null-typed events are excluded BEFORE ranking (contract
        # shared with the twin's WHERE; a None would crash the join)
        part = part[part["event_type"].notna()]
        uid = part["user_id"].to_numpy(np.int64)
        ts = part["ts"].to_numpy().astype("datetime64[us]") \
            .view(np.int64)
        eid = part["event_id"].to_numpy(np.int64)
        typ = part["event_type"].to_numpy(object)
        order = np.lexsort((eid, ts, uid))
        u_s, t_s = uid[order], typ[order]
        new = np.empty(len(u_s), dtype=bool)
        if len(u_s) == 0:
            return pd.DataFrame({
                "journey": pd.Series([], dtype=object),
                "n_users": pd.Series([], dtype=np.int64)})
        new[0] = True
        new[1:] = u_s[1:] != u_s[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(u_s)))
        r = np.arange(len(u_s)) - np.repeat(starts, sizes)
        sel = r < JOURNEY_PREFIX
        j = pd.DataFrame({"u": u_s[sel], "t": t_s[sel]}) \
            .groupby("u", sort=False)["t"].agg(">".join)
        g = j.value_counts()
        return pd.DataFrame({"journey": g.index.to_numpy(object),
                             "n_users": g.to_numpy(np.int64)})

    parts = grouped_apply(ds, ["user_id"], journeys,
                          num_partitions=16).to_pandas()
    if parts.empty or "journey" not in parts.columns:
        return pd.DataFrame({"journey": pd.Series([], dtype=object),
                             "n_users": pd.Series([], dtype=np.int64)})
    g = parts.groupby("journey", as_index=False)["n_users"].sum()
    g = g.sort_values(["n_users", "journey"],
                      ascending=[False, True], kind="stable")
    return g.head(JOURNEY_TOP_K).reset_index(drop=True)


SQL_TOP_USER_JOURNEYS = f"""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type IS NOT NULL),
j AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY rn) AS journey
  FROM r WHERE rn <= {JOURNEY_PREFIX} GROUP BY user_id)
SELECT journey, CAST(count(*) AS BIGINT) AS n_users
FROM j GROUP BY 1
ORDER BY n_users DESC, journey
LIMIT {JOURNEY_TOP_K}
"""

ADV_QUERIES["top_user_journeys"] = q_top_user_journeys
ADV_ORACLE_SQL["top_user_journeys"] = SQL_TOP_USER_JOURNEYS


# --------------------------------------------------------------------------
# Rolling 7-day active users (sliding-window COUNT DISTINCT)
# --------------------------------------------------------------------------

WAU_WINDOW = 7


def q_rolling_active_users(sf_dir: str) -> pd.DataFrame:
    """Rolling weekly-active-users: for every OBSERVED day, the exact
    count of distinct users active in the trailing ``WAU_WINDOW``-day
    window — the sliding-window COUNT(DISTINCT) no plain window
    function expresses (DuckDB's twin needs a range self-join).

    Shape: ONE hash exchange on user_id co-locates each user's
    activity, so global (day, user) dedup, the 7x window expansion
    and the (window-day, user) dedup are all partition-local; only
    per-partition (day, n) partials — calendar x partitions rows —
    reach the driver, which sums them and intersects with the
    observed-day set (a tiny per-batch unique pre-pass). The heavy
    stream is touched twice, streaming both times."""
    from nacc_form_validator_ray.stages.partition import grouped_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    US_PER_DAY = np.int64(86_400_000_000)

    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].to_numpy().astype("datetime64[us]")
               .view(np.int64) // US_PER_DAY)
        return pd.DataFrame({"day": np.unique(day)})

    observed = np.unique(
        ds.map_batches(day_partial, batch_format="pandas")
        .to_pandas()["day"].to_numpy(np.int64))

    def window_counts(part: pd.DataFrame) -> pd.DataFrame:
        uid = part["user_id"].to_numpy(np.int64)
        day = (part["ts"].to_numpy().astype("datetime64[us]")
               .view(np.int64) // US_PER_DAY)
        du = pd.DataFrame({"u": uid, "d": day}).drop_duplicates()
        k = np.arange(WAU_WINDOW, dtype=np.int64)
        wday = (du["d"].to_numpy(np.int64)[:, None] + k).ravel()
        wu = np.repeat(du["u"].to_numpy(np.int64), WAU_WINDOW)
        wdu = pd.DataFrame({"d": wday, "u": wu}).drop_duplicates()
        g = wdu.groupby("d", as_index=False).size()
        return pd.DataFrame({"day": g["d"].to_numpy(np.int64),
                             "wau": g["size"].to_numpy(np.int64)})

    parts = grouped_apply(ds, ["user_id"], window_counts,
                          num_partitions=16).to_pandas()
    if parts.empty or "day" not in parts.columns:
        return pd.DataFrame({"day": pd.Series([], dtype=np.int64),
                             "wau": pd.Series([], dtype=np.int64)})
    g = parts.groupby("day", as_index=False)["wau"].sum()
    g = g[g["day"].isin(observed)]
    return g.sort_values("day", kind="stable").reset_index(drop=True)


SQL_ROLLING_ACTIVE_USERS = f"""
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
  FROM events),
cal AS (SELECT DISTINCT day FROM du)
SELECT cal.day, CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau
FROM cal JOIN du
  ON du.day BETWEEN cal.day - {WAU_WINDOW - 1} AND cal.day
GROUP BY cal.day
"""

ADV_QUERIES["rolling_active_users"] = q_rolling_active_users
ADV_ORACLE_SQL["rolling_active_users"] = SQL_ROLLING_ACTIVE_USERS


# --------------------------------------------------------------------------
# Exact embedding Gram matrix (the PCA / whitening precursor)
# --------------------------------------------------------------------------

GRAM_QUANT = 4096  # 2^12 — the repo's embedding quantization grid


def q_embedding_gram(sf_dir: str) -> pd.DataFrame:
    """Exact second-moment (Gram) matrix of the embeddings table on
    the repo's 2^12 quantization grid — the distributed precursor of
    PCA/whitening/covariance estimation: X^T X as d(d+1)/2 integer
    cells (centering needs only the per-dim sums label_centroids
    already computes; the eigensolve is a driver-side O(d^3) afterthought
    on 64x64 numbers).

    Shape: each batch contributes ONE d x d int64 matmul (V^T V) — the
    partial is always d(d+1)/2 rows no matter how many vectors — and
    the driver sums O(cells x blocks) rows. No exchange at all; this
    is the vector-space sibling of value_regression_events'
    exact-moments combiners. Bound: the driver merge is
    O(d^2 x blocks) rows (d = 64 here -> 2080 cells, the repo's
    low-cardinality-merge class); past d ~ 512 or very large block
    counts, route the partials through one (i, j) grouped exchange
    first — same result, d^2 total rows on the driver."""
    import pyarrow as pa

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])

    def gram_partial(t: "pa.Table") -> pd.DataFrame:
        from nacc_form_validator_ray.stages.similarity import \
            _matrix_from_arrow
        x = _matrix_from_arrow(t["embedding"])
        if x.shape[0] == 0:
            return pd.DataFrame({"i": pd.Series([], dtype=np.int64),
                                 "j": pd.Series([], dtype=np.int64),
                                 "sum_xy": pd.Series([],
                                                     dtype=np.int64)})
        d = x.shape[1]
        v = np.floor(x * GRAM_QUANT + 0.5).astype(np.int64)
        m = v.T @ v
        iu, ju = np.triu_indices(d)
        return pd.DataFrame({"i": (iu + 1).astype(np.int64),
                             "j": (ju + 1).astype(np.int64),
                             "sum_xy": m[iu, ju]})

    parts = ds.map_batches(gram_partial,
                           batch_format="pyarrow").to_pandas()
    if parts.empty or "i" not in parts.columns:
        return pd.DataFrame({"i": pd.Series([], dtype=np.int64),
                             "j": pd.Series([], dtype=np.int64),
                             "sum_xy": pd.Series([], dtype=np.int64)})
    g = parts.groupby(["i", "j"], as_index=False)["sum_xy"].sum()
    return g.sort_values(["i", "j"], kind="stable") \
        .reset_index(drop=True)


SQL_EMBEDDING_GRAM = f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(floor(unnest(embedding) * {GRAM_QUANT} + 0.5)
              AS BIGINT) AS v
  FROM embeddings)
SELECT a.i, b.i AS j, CAST(sum(a.v * b.v) AS BIGINT) AS sum_xy
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2
"""

ADV_QUERIES["embedding_gram"] = q_embedding_gram
ADV_ORACLE_SQL["embedding_gram"] = SQL_EMBEDDING_GRAM


# --------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov chain)
# --------------------------------------------------------------------------

def q_event_type_transitions(sf_dir: str) -> pd.DataFrame:
    """First-order Markov transition counts over each user's
    time-ordered event stream: how often type A is IMMEDIATELY
    followed by type B within the same user — the sequence-analytics
    op behind next-action prediction features (the LAG family's
    aggregate counterpart).

    ONE user_id hash exchange; inside each partition a single lexsort
    orders every user's events, adjacent same-user positions form the
    transition pairs (one shifted comparison — no per-user loop), and
    only (from, to, n) partials — at most |types|^2 rows each — reach
    the driver merge."""
    from nacc_form_validator_ray.stages.partition import grouped_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def transitions(part: pd.DataFrame) -> pd.DataFrame:
        # null-typed events excluded before adjacency (twin contract)
        part = part[part["event_type"].notna()]
        uid = part["user_id"].to_numpy(np.int64)
        ts = part["ts"].to_numpy().astype("datetime64[us]") \
            .view(np.int64)
        eid = part["event_id"].to_numpy(np.int64)
        typ = part["event_type"].to_numpy(object)
        if len(uid) < 2:
            return pd.DataFrame({
                "from_type": pd.Series([], dtype=object),
                "to_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64)})
        order = np.lexsort((eid, ts, uid))
        u_s, t_s = uid[order], typ[order]
        same = u_s[1:] == u_s[:-1]
        g = pd.DataFrame({"from_type": t_s[:-1][same],
                          "to_type": t_s[1:][same]}) \
            .groupby(["from_type", "to_type"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    parts = grouped_apply(ds, ["user_id"], transitions,
                          num_partitions=16).to_pandas()
    if parts.empty or "from_type" not in parts.columns:
        return pd.DataFrame({
            "from_type": pd.Series([], dtype=object),
            "to_type": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64)})
    g = parts.groupby(["from_type", "to_type"], as_index=False)["n"] \
        .sum()
    g["n"] = g["n"].astype(np.int64)
    return g.sort_values(["from_type", "to_type"], kind="stable") \
        .reset_index(drop=True)


SQL_EVENT_TYPE_TRANSITIONS = """
WITH r AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type IS NOT NULL)
SELECT prev AS from_type, event_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM r WHERE prev IS NOT NULL
GROUP BY 1, 2
"""

ADV_QUERIES["event_type_transitions"] = q_event_type_transitions
ADV_ORACLE_SQL["event_type_transitions"] = SQL_EVENT_TYPE_TRANSITIONS
