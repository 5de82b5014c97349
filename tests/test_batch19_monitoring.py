"""Batch-19 monitoring operators: exact-σ daily anomalies vs a naive
oracle, burst windows vs a per-user naive sweep (incl. duplicate
timestamps and the composite-overflow fallback), outlink stats on a
hand-built graph, and TLD keep-rate grouping on a multi-TLD fixture."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_events(tmp_path, users, tss):
    n = len(users)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(tss).astype("datetime64[us]")),
        "user_id": pa.array(np.asarray(users, dtype=np.int64)),
        "event_type": pa.array(["x"] * n),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n)}),
        tmp_path / "events.parquet")
    return str(tmp_path)


def test_daily_anomaly_exact_sigma(tmp_path):
    from nacc_form_validator_ray.pipelines.mining import \
        q_daily_anomaly_events
    # 9 quiet days of 10 events, one day of 100: only the spike flags
    tss, users = [], []
    base = pd.Timestamp("2021-03-01")
    for d in range(10):
        k = 100 if d == 7 else 10
        for i in range(k):
            tss.append(base + pd.Timedelta(days=d, seconds=i))
            users.append(i % 3)
    out = q_daily_anomaly_events(_write_events(tmp_path, users, tss))
    assert len(out) == 10
    assert out["n_events"].sum() == len(tss)
    flagged = out.loc[out["is_anomaly"], "n_events"].tolist()
    assert flagged == [100]
    # exact integer test against the float definition
    n = out["n_events"].to_numpy(np.float64)
    mu, var = n.mean(), n.var()
    want = (n - mu) ** 2 > 4 * var
    assert out["is_anomaly"].tolist() == want.tolist()


def _naive_burst(users, tss, w_s):
    df = pd.DataFrame({"u": users, "t": pd.to_datetime(tss)})
    out = {}
    for u, g in df.groupby("u"):
        t = g["t"].to_numpy("datetime64[us]").astype(np.int64)
        best = 0
        for x in t:
            best = max(best, int(((t >= x) &
                                  (t <= x + w_s * 1_000_000)).sum()))
        out[int(u)] = best
    return out


def test_burst_users_vs_naive_random(tmp_path):
    from nacc_form_validator_ray.pipelines.mining import (_BURST_WINDOW_S,
                                                          q_burst_users)
    rng = np.random.default_rng(99)
    n = 400
    users = rng.integers(0, 12, size=n)
    base = pd.Timestamp("2022-01-01").value // 1000
    tss = pd.to_datetime(
        base + rng.integers(0, 5 * 86_400, size=n) * 1_000_000,
        unit="us")
    # ~10% of events pile onto one identical timestamp (several per
    # user), exercising RANGE-frame peer semantics in both engines
    tss = tss.where(rng.random(n) > 0.1, tss[0])
    got = q_burst_users(_write_events(tmp_path, users, tss)) \
        .to_pandas().set_index("user_id")["max_burst"].to_dict()
    want = _naive_burst(users, tss, _BURST_WINDOW_S)
    assert got == want


def test_burst_users_overflow_fallback(tmp_path):
    """A timestamp span wide enough that codes*span overflows int64
    must route through the per-segment fallback and stay exact."""
    from nacc_form_validator_ray.pipelines.mining import (_BURST_WINDOW_S,
                                                          q_burst_users)
    rng = np.random.default_rng(7)
    users, tss = [], []
    # ~250-year span in us ~ 7.9e15; with all 1200 users forced into
    # ONE partition codes[-1]*span ~ 9.5e18 > int64_max//2, so the
    # composite guard trips and the per-segment fallback runs
    for u in range(1200):
        for _ in range(int(rng.integers(1, 4))):
            users.append(u)
            tss.append(pd.Timestamp("1700-01-01")
                       + pd.Timedelta(days=int(rng.integers(0, 365 * 250)),
                                      seconds=int(rng.integers(0, 86400))))
    got = q_burst_users(_write_events(tmp_path, users, tss),
                        num_partitions=1) \
        .to_pandas().set_index("user_id")["max_burst"].to_dict()
    want = _naive_burst(users, tss, _BURST_WINDOW_S)
    assert got == want


def test_outlink_stats_known_graph(tmp_path):
    import ray.data as rd

    from nacc_form_validator_ray.stages.graph import outlink_stats
    # a.com -> b.com, b.com, a.com(self), ext.com (unknown -> dropped)
    # b.com -> a.com ; c.com -> (nothing)
    t = pa.table({
        "url": ["https://a.com/x", "https://b.com/y", "https://c.com/z"],
        "links": pa.array([
            ["https://b.com/1", "https://b.com/2", "https://a.com/3",
             "https://ext.com/4"],
            ["https://a.com/5"],
            []], pa.list_(pa.string()))})
    out = outlink_stats(rd.from_arrow(t).repartition(2),
                        num_partitions=4).to_pandas() \
        .set_index("host").sort_index()
    assert out.loc["a.com", "n_outlinks"] == 3  # ext.com dropped
    assert out.loc["a.com", "n_dst_hosts"] == 2
    assert out.loc["a.com", "n_self"] == 1
    assert out.loc["a.com", "diversity"] == 2 / 3
    assert out.loc["b.com", "n_outlinks"] == 1
    assert out.loc["b.com", "n_self"] == 0
    assert out.loc["c.com", "n_outlinks"] == 0
    assert out.loc["c.com", "diversity"] == 0.0


def test_tld_keep_rate_groups_multiple_tlds(tmp_path, monkeypatch):
    import nacc_form_validator_ray.pipelines.queries as Q
    from nacc_form_validator_ray.pipelines.mining import q_tld_keep_rate
    keep_text = ("This line has five good words here.\n"
                 "Another fine long sentence ends properly.\n"
                 "A third keeping line also ends well.")
    drop_text = "short\nlines\nonly"
    lp = str(tmp_path / "linkpages.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(4, dtype=np.int64)),
        "url": ["https://x.com/a", "https://y.com/b",
                "https://z.org/c", "https://w.net/d"],
        "text": [keep_text, drop_text, keep_text, keep_text],
        "links": pa.array([[], [], [], []], pa.list_(pa.string()))}),
        lp)
    monkeypatch.setattr(Q, "_linked_pages_path", lambda sf: lp)
    out = q_tld_keep_rate("ignored").set_index("tld")
    assert sorted(out.index) == ["com", "net", "org"]
    assert out.loc["com", "n_pages"] == 2
    assert out.loc["com", "n_kept"] == 1
    assert out.loc["com", "keep_rate"] == 0.5
    assert out.loc["org", "keep_rate"] == 1.0


def test_pagerank_convergence_columns():
    from nacc_form_validator_ray.pipelines.mining import \
        q_pagerank_convergence
    out = q_pagerank_convergence(SF)
    assert list(out.columns) == ["host", "rank_fp_4", "rank_fp_5",
                                 "delta_fp", "delta"]
    assert (out["delta_fp"] >= 0).all()
    # exact single-division contract
    assert (out["delta"].to_numpy()
            == out["delta_fp"].to_numpy(np.float64) / 2 ** 40).all()


def test_empty_linked_corpus_graph_guards(tmp_path, monkeypatch):
    """Empty linked-page corpus: pagerank / HITS / the convergence
    audit return pinned-schema empty results instead of crashing on
    np.concatenate-of-nothing or PR_SCALE // 0 (review finding — the
    fuzz generator emits n_pg=0 fixtures)."""
    import ray.data as rd

    import nacc_form_validator_ray.pipelines.queries as Q
    from nacc_form_validator_ray.pipelines.mining import \
        q_pagerank_convergence
    from nacc_form_validator_ray.stages.graph import (host_hits,
                                                      host_pagerank)
    lp = str(tmp_path / "linkpages.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "url": pa.array([], pa.string()),
        "text": pa.array([], pa.string()),
        "links": pa.array([], pa.list_(pa.string()))}), lp)
    # ray 2.49's Dataset.to_pandas() drops columns on a zero-row
    # dataset, so the schema contract is asserted at the Dataset level
    pr = host_pagerank(rd.read_parquet(lp))
    assert pr.schema().names == ["host", "rank_fp", "rank"]
    assert pr.count() == 0
    ht = host_hits(rd.read_parquet(lp))
    assert "auth_fp" in ht.schema().names and ht.count() == 0
    monkeypatch.setattr(Q, "_linked_pages_path", lambda sf: lp)
    cv = q_pagerank_convergence("ignored")
    assert len(cv) == 0
    assert list(cv.columns) == ["host", "rank_fp_4", "rank_fp_5",
                                "delta_fp", "delta"]
