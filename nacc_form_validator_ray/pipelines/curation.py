"""Curation / numerics operators, batch 22: a distributed PCA power
iteration, an int8 scalar-quantization error audit, MMR diversity
selection, and dyadic EWMA smoothing.

Same contract as ``pipelines/advanced.py`` / ``pipelines/mining.py``:
every operator is a Ray-Data-native pipeline (per-batch combiners +
at most one lean hash exchange, or a bounded driver-side model loop
like kmeans/PageRank) paired with a DuckDB oracle that reproduces
column names, dtypes and values bit-for-bit.

Float discipline (repo convention, see pipelines/mining.py): every
double that crosses the oracle boundary is ONE correctly-rounded IEEE
division over exactly-converted integers — never libm transcendentals.
Integer-division discipline (new here): DuckDB's ``//`` TRUNCATES
toward zero while Python's floors toward -inf, so every quotient in
this module is arranged over NON-NEGATIVE operands (where the two
agree) — negative numerators go through the explicit
``-((-a + b - 1) // b)`` floor identity on BOTH engines.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd

CUR_QUERIES: Dict[str, object] = {}
CUR_ORACLE_SQL: Dict[str, str] = {}

#: linked-page queries registered here get their path-parameterized
#: twins through queries.flagship_oracles (same as MIN_LINKED_SQL)
CUR_LINKED_SQL: Dict[str, object] = {}


def _rd():
    import ray.data as rd
    return rd


# --------------------------------------------------------------------------
# PCA power iteration over the embedding Gram matrix
# --------------------------------------------------------------------------

#: quantization grid shared with the embedding family (advanced.GRAM_QUANT)
_PCA_SCALE = 4096
#: fixed power-iteration budget — like host_pagerank's 5 rounds, a fixed
#: chain keeps both engines on the identical arithmetic path. 64 rounds
#: reach cosine > 0.999 against the float eigensolve on the fixture's
#: narrow eigengap (top-2 ratio ~1.07 -> ~0.93^k decay); each twin
#: stage is a 3-CTE pass over d = 64 rows, so the chain stays cheap
_PCA_ROUNDS = 64


def _floor_div_signed(w: int, m: int) -> int:
    """floor(w * _PCA_SCALE / m) with m > 0, written over NON-NEGATIVE
    truncating divisions only, so DuckDB's ``//`` (truncation) and this
    expression agree sign-for-sign (module docstring)."""
    if w >= 0:
        return (w * _PCA_SCALE) // m
    return -(((-w) * _PCA_SCALE + m - 1) // m)


def q_pca_power_embeddings(sf_dir: str) -> pd.DataFrame:
    """Top principal direction of the embedding second-moment (Gram)
    matrix by ``_PCA_ROUNDS`` fixed power iterations — the distributed
    eigensolve behind PCA whitening / spectral embedding-quality audits
    (a corpus whose top component explains most of the Gram mass has
    collapsed embeddings).

    Exactness: the Gram matrix is the bit-exact integer
    ``embedding_gram`` (2^12 grid); the iteration runs on the driver in
    arbitrary-precision Python ints, renormalizing each round to the
    same grid with the explicit floor identity of the module docstring,
    so every intermediate is an integer both engines reproduce (the
    twin's HUGEINT CTE chain mirrors round for round).

    Scale shape: the ONLY distributed work is the Gram pass — one
    d x d int64 matmul per batch, d(d+1)/2 cells per partial, no
    exchange (see embedding_gram's bound note for d >~ 512). The
    iteration itself is O(rounds x d^2) driver arithmetic on 64x64
    numbers — the bounded-model-state pattern shared with kmeans and
    bpe_merges."""
    from nacc_form_validator_ray.pipelines.advanced import \
        q_embedding_gram

    g = q_embedding_gram(sf_dir)
    empty = pd.DataFrame({"dim": pd.Series([], dtype=np.int64),
                          "component": pd.Series([], dtype=np.int64)})
    if g.empty:
        return empty
    d = int(g["j"].max())
    G: List[List[int]] = [[0] * d for _ in range(d)]
    for i, j, s in zip(g["i"].to_numpy(np.int64),
                       g["j"].to_numpy(np.int64),
                       g["sum_xy"].to_numpy(np.int64)):
        G[i - 1][j - 1] = int(s)
        G[j - 1][i - 1] = int(s)
    v: List[int] = [1] * d
    for _ in range(_PCA_ROUNDS):
        w = [sum(G[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        if m == 0:
            v = w
            continue
        v = [_floor_div_signed(x, m) for x in w]
    return pd.DataFrame({"dim": np.arange(1, d + 1, dtype=np.int64),
                         "component": np.array(v, dtype=np.int64)})


def _sql_pca_power() -> str:
    from nacc_form_validator_ray.pipelines.advanced import \
        SQL_EMBEDDING_GRAM
    sql = f"""WITH gram AS MATERIALIZED ({SQL_EMBEDDING_GRAM}),
gs AS MATERIALIZED (SELECT i, j, sum_xy FROM gram
       UNION ALL
       SELECT j AS i, i AS j, sum_xy FROM gram WHERE i <> j),
v0 AS MATERIALIZED (SELECT DISTINCT i AS dim, CAST(1 AS HUGEINT) AS val FROM gs)"""
    for t in range(1, _PCA_ROUNDS + 1):
        p = t - 1
        sql += f""",
w{t} AS MATERIALIZED (SELECT gs.i AS dim,
                sum(CAST(gs.sum_xy AS HUGEINT) * v{p}.val) AS w
         FROM gs JOIN v{p} ON gs.j = v{p}.dim GROUP BY gs.i),
m{t} AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w{t}),
v{t} AS MATERIALIZED (SELECT dim,
                CASE WHEN m{t}.m = 0 THEN w
                     WHEN w >= 0 THEN (w * {_PCA_SCALE}) // m{t}.m
                     ELSE -(((-w) * {_PCA_SCALE} + m{t}.m - 1) // m{t}.m)
                END AS val
         FROM w{t}, m{t})"""
    sql += (f"\nSELECT dim, CAST(val AS BIGINT) AS component "
            f"FROM v{_PCA_ROUNDS} ORDER BY dim")
    return sql


CUR_QUERIES["pca_power_embeddings"] = q_pca_power_embeddings
CUR_ORACLE_SQL["pca_power_embeddings"] = _sql_pca_power()


# --------------------------------------------------------------------------
# int8 scalar-quantization error audit
# --------------------------------------------------------------------------

#: int8 code range (0..255) — the standard SQ8 ANN storage format
_SQ8_LEVELS = 255


def q_sq8_quant_error(sf_dir: str) -> pd.DataFrame:
    """Per-dimension int8 scalar-quantization reconstruction audit —
    the report read before shipping an SQ8-compressed ANN index
    (per-dim min/max derive the scale/offset; the error says whether
    255 levels are enough or the dim needs per-cluster ranges).

    Semantics: components live on the repo 2^12 grid; codes are
    round-half-up ``(v - mn) * 255 / rng`` (exact: ``((v - mn) * 510 +
    rng) // (2 * rng)`` over non-negative ints); the error is the
    EXACT integer ``|255 * (v - mn) - code * rng|`` — the absolute
    reconstruction error scaled by 255 (grid units x 255), so no
    division happens until the single mean readout.

    Scale shape: pass 1 reduces to d-row (mn, mx) partials per batch
    (driver-merged); pass 2 broadcasts the 2d ints in the batch-fn
    closure and emits d-row (n, sum_err, max_err) partials — both
    passes stream, the driver merge is Python-int exact at any row
    count."""
    import pyarrow as pa

    from nacc_form_validator_ray.stages.similarity import \
        _matrix_from_arrow

    empty = pd.DataFrame({
        "dim": pd.Series([], dtype=np.int64),
        "mn": pd.Series([], dtype=np.int64),
        "mx": pd.Series([], dtype=np.int64),
        "n": pd.Series([], dtype=np.int64),
        "sum_abs_err_255": pd.Series([], dtype=np.int64),
        "max_abs_err_255": pd.Series([], dtype=np.int64),
        "mean_abs_err": pd.Series([], dtype=np.float64)})

    def _quant(t: "pa.Table") -> np.ndarray:
        x = _matrix_from_arrow(t["embedding"])
        return np.floor(x * _PCA_SCALE + 0.5).astype(np.int64)

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])

    def minmax_partial(t: "pa.Table") -> pd.DataFrame:
        v = _quant(t)
        if v.shape[0] == 0:
            return pd.DataFrame({"dim": pd.Series([], dtype=np.int64),
                                 "mn": pd.Series([], dtype=np.int64),
                                 "mx": pd.Series([], dtype=np.int64)})
        d = v.shape[1]
        return pd.DataFrame({"dim": np.arange(1, d + 1, dtype=np.int64),
                             "mn": v.min(axis=0), "mx": v.max(axis=0)})

    mm = ds.map_batches(minmax_partial, batch_format="pyarrow") \
        .to_pandas()
    if mm.empty or "dim" not in mm.columns:
        return empty
    mm = mm.groupby("dim", as_index=False) \
        .agg(mn=("mn", "min"), mx=("mx", "max")).sort_values("dim")
    mn = mm["mn"].to_numpy(np.int64)
    rng = (mm["mx"] - mm["mn"]).to_numpy(np.int64)

    def err_partial(t: "pa.Table") -> pd.DataFrame:
        v = _quant(t)
        if v.shape[0] == 0:
            return pd.DataFrame({
                "dim": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "s": pd.Series([], dtype=np.int64),
                "mx": pd.Series([], dtype=np.int64)})
        d = v.shape[1]
        off = v - mn[None, :]
        # round-half-up code over non-negative ints; rng==0 dims get
        # code 0 / err 0 by construction (off == 0 everywhere)
        den = np.where(rng > 0, 2 * rng, 1)
        code = (off * (2 * _SQ8_LEVELS) + rng[None, :]) // den[None, :]
        err = np.abs(off * _SQ8_LEVELS - code * rng[None, :])
        return pd.DataFrame({
            "dim": np.arange(1, d + 1, dtype=np.int64),
            "n": np.full(d, v.shape[0], dtype=np.int64),
            "s": err.sum(axis=0),
            "mx": err.max(axis=0)})

    parts = ds.map_batches(err_partial, batch_format="pyarrow") \
        .to_pandas()
    if parts.empty or "dim" not in parts.columns:
        return empty
    rows = []
    for dim, grp in parts.groupby("dim", sort=True):
        # Python-int merge: exact at any row count
        n = sum(int(x) for x in grp["n"])
        s = sum(int(x) for x in grp["s"])
        mxe = max(int(x) for x in grp["mx"])
        i = int(dim) - 1
        rows.append((int(dim), int(mn[i]), int(mn[i] + rng[i]), n, s,
                     mxe, float(s) / float(n * _SQ8_LEVELS)))
    return pd.DataFrame(rows, columns=[
        "dim", "mn", "mx", "n", "sum_abs_err_255", "max_abs_err_255",
        "mean_abs_err"]).astype({
            "dim": np.int64, "mn": np.int64, "mx": np.int64,
            "n": np.int64, "sum_abs_err_255": np.int64,
            "max_abs_err_255": np.int64, "mean_abs_err": np.float64})


CUR_QUERIES["sq8_quant_error"] = q_sq8_quant_error
CUR_ORACLE_SQL["sq8_quant_error"] = f"""
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS dim,
         CAST(floor(unnest(embedding) * {_PCA_SCALE} + 0.5) AS BIGINT)
             AS v
  FROM embeddings),
mm AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM q GROUP BY dim),
e AS (
  SELECT q.dim, mm.mn, mm.mx,
         CASE WHEN mm.mx = mm.mn THEN 0
              ELSE abs((q.v - mm.mn) * {_SQ8_LEVELS}
                       - (((q.v - mm.mn) * {2 * _SQ8_LEVELS}
                           + (mm.mx - mm.mn))
                          // (2 * (mm.mx - mm.mn)))
                         * (mm.mx - mm.mn))
         END AS err
  FROM q JOIN mm ON q.dim = mm.dim)
SELECT dim, mn, mx, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(err) AS BIGINT) AS sum_abs_err_255,
       CAST(max(err) AS BIGINT) AS max_abs_err_255,
       CAST(CAST(sum(err) AS BIGINT) AS DOUBLE)
           / CAST(count(*) * {_SQ8_LEVELS} AS DOUBLE) AS mean_abs_err
FROM e GROUP BY dim, mn, mx
"""


# --------------------------------------------------------------------------
# MMR (maximal marginal relevance) diversity selection
# --------------------------------------------------------------------------

#: selection budget; relevance anchor is the vec_id = 0 vector
_MMR_K = 8


def q_mmr_select_embeddings(sf_dir: str) -> pd.DataFrame:
    """Greedy maximal-marginal-relevance selection of ``_MMR_K``
    vectors (Carbonell & Goldstein 1998) — the diversity-aware data
    SELECTION operator (pure top-k by relevance picks near-duplicates;
    MMR penalizes each candidate by its similarity to what's already
    chosen). lambda = 1/2, so the argmax reduces to the INTEGER score
    ``rel(i) - max_{j in S} sim(i, j)`` on the 2^12 grid (the common
    factor cancels); relevance anchors on the vec_id = 0 vector,
    candidates are all other vectors.

    Scale shape: k passes over the corpus, each broadcasting the
    (<= k) x d selected matrix in the batch-fn closure; every batch
    emits ONE local-best row (argmax score, tiebreak min vec_id,
    carrying its quantized vector), the driver reduces blocks-many
    candidates — no exchange at all. The twin is a k-stage chained-CTE
    greedy (same pattern as bpe_merges' merge chain)."""
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.stages.similarity import \
        _matrix_from_arrow

    empty = pd.DataFrame({"rank": pd.Series([], dtype=np.int64),
                          "vec_id": pd.Series([], dtype=np.int64),
                          "score": pd.Series([], dtype=np.int64)})
    anchor = pq.read_table(f"{sf_dir}/embeddings.parquet",
                           columns=["embedding"],
                           filters=[("vec_id", "==", 0)])
    if anchor.num_rows == 0:
        return empty
    qv = np.floor(_matrix_from_arrow(anchor["embedding"])[0]
                  * _PCA_SCALE + 0.5).astype(np.int64)

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    selected: List[tuple] = []   # (vec_id, quantized np vector)
    out_rows = []
    for rank in range(1, _MMR_K + 1):
        sel_ids = np.array([i for i, _ in selected], dtype=np.int64)
        smat = (np.stack([v for _, v in selected])
                if selected else None)

        def local_best(t, _sel_ids=sel_ids, _smat=smat):
            ids = t["vec_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            x = np.floor(_matrix_from_arrow(t["embedding"])
                         * _PCA_SCALE + 0.5).astype(np.int64)
            keep = ids != 0
            if len(_sel_ids):
                keep &= ~np.isin(ids, _sel_ids)
            if not keep.any():
                return pd.DataFrame({
                    "vec_id": pd.Series([], dtype=np.int64),
                    "score": pd.Series([], dtype=np.int64),
                    "vec": pd.Series([], dtype=object)})
            ids, x = ids[keep], x[keep]
            score = x @ qv
            if _smat is not None:
                score = score - (x @ _smat.T).max(axis=1)
            b = np.lexsort((ids, -score))[0]
            return pd.DataFrame({"vec_id": [ids[b]],
                                 "score": [score[b]],
                                 "vec": [x[b].tolist()]})

        cand = ds.map_batches(local_best, batch_format="pyarrow") \
            .to_pandas()
        if cand.empty or "vec_id" not in cand.columns or not len(cand):
            break
        cand = cand.sort_values(["score", "vec_id"],
                                ascending=[False, True], kind="stable")
        top = cand.iloc[0]
        selected.append((int(top["vec_id"]),
                         np.array(top["vec"], dtype=np.int64)))
        out_rows.append((rank, int(top["vec_id"]), int(top["score"])))
    if not out_rows:
        return empty
    return pd.DataFrame(out_rows, columns=["rank", "vec_id", "score"]) \
        .astype({"rank": np.int64, "vec_id": np.int64,
                 "score": np.int64})


def _sql_mmr() -> str:
    sql = f"""WITH qv AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(floor(unnest(embedding) * {_PCA_SCALE} + 0.5) AS BIGINT)
             AS v
  FROM embeddings),
rel AS MATERIALIZED (SELECT e.vec_id, CAST(sum(e.v * q.v) AS BIGINT) AS rel
        FROM qv e JOIN qv q ON e.i = q.i AND q.vec_id = 0
        WHERE e.vec_id <> 0 GROUP BY e.vec_id),
pick1 AS MATERIALIZED (SELECT vec_id, rel AS score FROM rel
          ORDER BY score DESC, vec_id LIMIT 1),
sel1 AS MATERIALIZED (SELECT vec_id FROM pick1)"""
    for t in range(2, _MMR_K + 1):
        p = t - 1
        sql += f""",
ms{t} AS MATERIALIZED (SELECT va AS vec_id, max(dp) AS msim FROM (
    SELECT e.vec_id AS va, s.vec_id AS vs,
           CAST(sum(e.v * s.v) AS BIGINT) AS dp
    FROM qv e JOIN qv s ON e.i = s.i
    WHERE s.vec_id IN (SELECT vec_id FROM sel{p})
      AND e.vec_id <> 0
      AND e.vec_id NOT IN (SELECT vec_id FROM sel{p})
    GROUP BY 1, 2) GROUP BY va),
pick{t} AS MATERIALIZED (SELECT r.vec_id, CAST(r.rel - m.msim AS BIGINT) AS score
            FROM rel r JOIN ms{t} m ON r.vec_id = m.vec_id
            ORDER BY score DESC, r.vec_id LIMIT 1),
sel{t} AS MATERIALIZED (SELECT vec_id FROM sel{p}
           UNION ALL SELECT vec_id FROM pick{t})"""
    parts = [f"SELECT CAST({t} AS BIGINT) AS rank, vec_id, score "
             f"FROM pick{t}" for t in range(1, _MMR_K + 1)]
    sql += "\n" + "\nUNION ALL\n".join(parts)
    return sql


CUR_QUERIES["mmr_select_embeddings"] = q_mmr_select_embeddings
CUR_ORACLE_SQL["mmr_select_embeddings"] = _sql_mmr()


# --------------------------------------------------------------------------
# dyadic EWMA smoothing over the event stream
# --------------------------------------------------------------------------

#: window length; weights are 2^(W-1-lag) — alpha = 1/2 exponential decay
_EWMA_W = 16


def q_ewma_value_events(sf_dir: str) -> pd.DataFrame:
    """Exponentially-weighted moving average of each event type's value
    stream — the standard monitoring smoother (EWMA control charts;
    trend lines that favor the recent signal). Weights are the DYADIC
    ladder 2^(W-1-lag) over the last ``_EWMA_W`` events (most recent
    weight ~ 1/2 of the mass, alpha = 1/2), so the weighted sum is an
    exact int64 and the EWMA is ONE correctly-rounded division by the
    exact denominator ``2^W - 2^(W-m)`` (m = available window rows —
    partial heads are normalized over the weights actually present).

    Scale shape: ONE hash exchange on event_type, then per-partition
    vectorized work — lexsort by (ts, event_id) and an int64
    ``np.convolve`` with the 16-tap kernel per type run (no per-row
    loop). Hot types are bounded by the window: a salted variant would
    only need the trailing W rows of the previous shard."""
    from nacc_form_validator_ray.stages.partition import grouped_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "event_type",
                                     "value"])
    kernel = (np.int64(1) << np.arange(_EWMA_W - 1, -1, -1,
                                       dtype=np.int64))

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby("event_type", sort=False):
            g = g.sort_values(["ts", "event_id"], kind="stable")
            x = np.floor(g["value"].to_numpy(np.float64) * 100 + 0.5) \
                .astype(np.int64)
            num = np.convolve(x, kernel)[:len(x)]
            m = np.minimum(np.arange(len(x), dtype=np.int64) + 1,
                           _EWMA_W)
            den = (np.int64(1) << np.int64(_EWMA_W)) \
                - (np.int64(1) << (_EWMA_W - m))
            out.append(pd.DataFrame({
                "event_id": g["event_id"].to_numpy(np.int64),
                "event_type": g["event_type"].to_numpy(),
                "value_c": x,
                "ewma": num.astype(np.float64)
                / den.astype(np.float64)}))
        if not out:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype=np.int64),
                "event_type": pd.Series([], dtype=str),
                "value_c": pd.Series([], dtype=np.int64),
                "ewma": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    res = grouped_apply(ds, ["event_type"], part,
                        num_partitions=16).to_pandas()
    if res.empty or "event_id" not in res.columns:
        return pd.DataFrame({
            "event_id": pd.Series([], dtype=np.int64),
            "event_type": pd.Series([], dtype=str),
            "value_c": pd.Series([], dtype=np.int64),
            "ewma": pd.Series([], dtype=np.float64)})
    return res


CUR_QUERIES["ewma_value_events"] = q_ewma_value_events
CUR_ORACLE_SQL["ewma_value_events"] = f"""
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT a.event_id, a.event_type, a.value_c,
       CAST(CAST(sum(b.value_c
                     * (CAST(1 AS BIGINT)
                        << ({_EWMA_W - 1} - (a.rn - b.rn))))
                 AS BIGINT) AS DOUBLE)
       / CAST((CAST(1 AS BIGINT) << {_EWMA_W})
              - (CAST(1 AS BIGINT)
                 << ({_EWMA_W} - least(a.rn, {_EWMA_W})))
              AS DOUBLE) AS ewma
FROM v a JOIN v b
  ON a.event_type = b.event_type
 AND b.rn BETWEEN a.rn - {_EWMA_W - 1} AND a.rn
GROUP BY a.event_id, a.event_type, a.value_c, a.rn
"""
