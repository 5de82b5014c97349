"""Sessionization unit tests: crafted gaps, timestamp ties, multi-user
interleaving (the oracle twin covers the randomized surface;
scripts/check_oracle.py user_sessions)."""

import numpy as np
import pandas as pd
import ray.data as rd

from nacc_form_validator_ray.stages.sessions import sessionize


def _events(rows):
    return pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "ts": pd.to_datetime([r[0] for r in rows]),
        "user_id": np.array([r[1] for r in rows], dtype=np.int64),
        "value": np.array([r[2] for r in rows], dtype=np.float64),
    })


def test_sessionize_gap_boundaries():
    df = _events([
        ("2024-01-01 00:00:00", 1, 1.00),
        ("2024-01-01 00:29:59", 1, 2.00),   # 29:59 gap -> same session
        ("2024-01-01 01:00:00", 1, 4.00),   # 30:01 gap -> new session
        ("2024-01-01 01:30:00", 1, 8.00),   # exactly 30:00 -> SAME
    ])
    out = sessionize(rd.from_pandas(df), num_partitions=4).to_pandas() \
        .sort_values("session_seq").reset_index(drop=True)
    assert out["session_seq"].tolist() == [1, 2]
    assert out["n_events"].tolist() == [2, 2]
    assert out["value_cents"].tolist() == [300, 1200]
    assert out.loc[0, "duration_us"] == 29 * 60 * 1_000_000 + 59_000_000
    assert str(out.loc[1, "session_start"]) == "2024-01-01 01:00:00"


def test_sessionize_tie_and_interleaved_users():
    df = _events([
        ("2024-01-01 00:00:00", 1, 1.0),
        ("2024-01-01 00:00:00", 2, 1.0),    # user 2 interleaved
        ("2024-01-01 00:00:00", 1, 1.0),    # ts tie: event_id orders
        ("2024-01-01 02:00:00", 2, 1.0),    # user 2 second session
    ])
    out = sessionize(rd.from_pandas(df), num_partitions=4).to_pandas()
    u1 = out[out["user_id"] == 1]
    u2 = out[out["user_id"] == 2].sort_values("session_seq")
    assert len(u1) == 1 and u1.iloc[0]["n_events"] == 2
    assert u2["session_seq"].tolist() == [1, 2]
    assert u2["n_events"].tolist() == [1, 1]


def test_sessionize_session_seq_resets_per_user():
    rows = []
    for u in (5, 9):
        for k in range(3):  # 3 sessions per user, 1 h apart
            rows.append((pd.Timestamp("2024-01-01")
                         + pd.Timedelta(hours=k), u, 1.0))
    df = _events(rows)
    out = sessionize(rd.from_pandas(df), num_partitions=4).to_pandas()
    for u in (5, 9):
        assert sorted(out[out["user_id"] == u]["session_seq"]) == \
            [1, 2, 3]


def test_hopping_window_replication_invariant():
    """Every event is covered by EXACTLY W/H hopping windows: for any
    second s with b = s//H*H, each start b - i*H (i in [0, W/H)) covers
    s, and no other hop boundary does."""
    import numpy as np
    W, H = 3600, 900
    k = W // H
    rng = np.random.RandomState(0)
    s = rng.randint(0, 10**9, size=1000).astype(np.int64)
    base = (s // H) * H
    starts = np.repeat(base, k) - \
        np.tile(np.arange(k, dtype=np.int64) * H, len(s))
    srep = np.repeat(s, k)
    assert ((starts <= srep) & (srep < starts + W)).all()
    # exhaustive cross-check on a small grid: count of covering starts
    for sec in [0, 1, 899, 900, 3599, 3600, 12345]:
        covering = [st for st in range((sec // H) * H - 10 * H,
                                       sec + H, H)
                    if st <= sec < st + W]
        assert len(covering) == k
