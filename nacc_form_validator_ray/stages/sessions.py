"""Sessionization: gap-based event sessions per user.

The classic streaming-window operator (reference analog: the
get_previous_record temporal machinery in ``datastore.py`` — both are
"order a subject's history, then walk adjacent rows"; web analog: user
browse sessions over a clickstream). Scale shape: ONE hash exchange on
``user_id`` (a subject's whole history must co-locate, exactly like the
temporal rule stage), then fully vectorized session assignment inside
each partition — lexsort, one int64 gap diff, cumsum of boundaries,
``reduceat`` aggregates. No per-session Python.

Exactness contract with the DuckDB twin
(pipelines/queries.sql_user_sessions): ordering is (user_id, ts,
event_id) — event_id breaks timestamp ties deterministically; the gap
test is an exact integer comparison on epoch microseconds; per-session
value totals ride a cents grid (``floor(value*100 + 0.5)`` int64), and
``duration_us`` is an exact int64 difference.
"""

from __future__ import annotations

import numpy as np

#: session gap threshold: a new session starts when the time since the
#: user's previous event exceeds this many microseconds (30 min)
DEFAULT_GAP_US = 30 * 60 * 1_000_000


def sessionize(ds, user_column: str = "user_id",
               ts_column: str = "ts", id_column: str = "event_id",
               value_column: str = "value",
               gap_us: int = DEFAULT_GAP_US,
               num_partitions: int = 32):
    """Dataset of per-session rows: ``(user_id, session_seq,
    session_start, session_end, n_events, value_cents, duration_us)``.

    ``session_seq`` is 1-based per user in time order. Input rows need
    (user, ts, id, value); extra columns are ignored (prune upstream
    with ``columns=[...]`` at the read).
    """
    import pyarrow as pa

    from nacc_form_validator_ray.stages.partition import grouped_apply

    def sessions(part: "pa.Table") -> "pa.Table":
        u = part[user_column].to_numpy(zero_copy_only=False)
        ts = part[ts_column].to_numpy(zero_copy_only=False)
        tsi = ts.astype("datetime64[us]").view(np.int64)
        eid = part[id_column].to_numpy(zero_copy_only=False)
        vc = np.floor(part[value_column].to_numpy(zero_copy_only=False)
                      * 100.0 + 0.5).astype(np.int64)

        empty = pa.table({
            user_column: pa.array([], pa.int64()),
            "session_seq": pa.array([], pa.int64()),
            "session_start": pa.array([], pa.timestamp("us")),
            "session_end": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64()),
            "value_cents": pa.array([], pa.int64()),
            "duration_us": pa.array([], pa.int64()),
        })
        n = len(u)
        if n == 0:
            return empty
        order = np.lexsort((eid, tsi, u))
        su, st, sv = u[order], tsi[order], vc[order]
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = su[1:] != su[:-1]
        news = new_user.copy()
        news[1:] |= (st[1:] - st[:-1]) > gap_us
        starts = np.flatnonzero(news)
        counts = np.diff(np.append(starts, n))
        # per-user 1-based session sequence: global session index minus
        # the index of the user's first session
        sid = np.cumsum(news) - 1              # per-row global session
        sess_user_start = np.repeat(sid[new_user],
                                    np.diff(np.append(
                                        np.flatnonzero(new_user), n)))
        seq_per_row = sid - sess_user_start + 1
        s_start = st[starts]
        s_end = st[starts + counts - 1]
        return pa.table({
            user_column: pa.array(su[starts]),
            "session_seq": pa.array(seq_per_row[starts]),
            "session_start": pa.array(s_start.view("datetime64[us]")),
            "session_end": pa.array(s_end.view("datetime64[us]")),
            "n_events": pa.array(counts.astype(np.int64)),
            "value_cents": pa.array(np.add.reduceat(sv, starts)),
            "duration_us": pa.array(s_end - s_start),
        })

    return grouped_apply(ds, [user_column], sessions,
                         num_partitions=num_partitions,
                         fn_format="pyarrow")
