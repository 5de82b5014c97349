"""Batch-31: duplicated-span runs, hapax ratio, epoch-schedule planner,
daily-count autocorrelation, link rot after the C4 filter."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts, sources=None):
    tmp_path.mkdir(parents=True, exist_ok=True)
    n = len(texts)
    sources = sources if sources is not None else ["s"] * n
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) if t else 0 for t in texts],
                            pa.int64())}), tmp_path / "documents.parquet")
    return str(tmp_path)


def _write_linkpages(tmp_path, rows):
    """rows: list of (doc_id, url, text, links)."""
    tmp_path.mkdir(parents=True, exist_ok=True)
    path = tmp_path / "linkpages.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "url": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "links": pa.array([r[3] for r in rows],
                          pa.list_(pa.string()))}), path)
    return str(path)


def _write_events(tmp_path, ts_list):
    tmp_path.mkdir(parents=True, exist_ok=True)
    n = len(ts_list)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(ts_list), pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array(np.zeros(n), pa.float64()),
        "props": pa.array(["{}"] * n, pa.string())}),
        tmp_path / "events.parquet")
    return str(tmp_path)


def _patched_linked(path):
    import nacc_form_validator_ray.pipelines.queries as Q

    class _Ctx:
        def __enter__(self):
            self._orig = Q._linked_pages_path
            Q._linked_pages_path = lambda sf: path
            return self

        def __exit__(self, *a):
            Q._linked_pages_path = self._orig
    return _Ctx()


# ------------------------------------------------ dup_span_runs

def test_dup_span_runs_finds_shared_sentence(tmp_path):
    """A 6-token sentence shared between two same-host pages is a run
    of 4 shingles -> max_run_tokens == 6; the same sentence on another
    host must NOT pair across hosts."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_dup_span_runs
    sent = "the quick brown fox jumps high"
    path = _write_linkpages(tmp_path, [
        (1, "https://a.com/x", "totally unrelated opener words here\n"
            + sent, []),
        (2, "https://a.com/y", sent + "\nsome other closing filler "
            "tokens entirely different", []),
        (3, "https://b.com/z", sent, []),
    ])
    with _patched_linked(path):
        out = q_dup_span_runs("ignored")
    pairs = {(int(r.id_a), int(r.id_b)): int(r.max_run_tokens)
             for r in out.itertuples()}
    assert pairs == {(1, 2): 6}


def test_dup_span_runs_short_span_excluded(tmp_path):
    """A shared 4-token span is only 2 consecutive shingles — below
    the 3-shingle minimum, so no pair is emitted."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_dup_span_runs
    span = "red green blue sky"
    path = _write_linkpages(tmp_path, [
        (1, "https://a.com/x", "one two three " + span, []),
        (2, "https://a.com/y", span + " four five six", []),
    ])
    with _patched_linked(path):
        out = q_dup_span_runs("ignored")
    assert len(out) == 0


def test_dup_span_runs_reports_longest_run(tmp_path):
    """Two shared spans of different lengths: the per-pair report is
    the LONGEST one (8 tokens beats 5)."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_dup_span_runs
    long = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    short = "uno dos tres cuatro cinco"  # 5 tokens
    path = _write_linkpages(tmp_path, [
        (1, "https://a.com/x", long + "\nfiller one\n" + short, []),
        (2, "https://a.com/y", short + "\nother filler\n" + long, []),
    ])
    with _patched_linked(path):
        out = q_dup_span_runs("ignored")
    assert len(out) == 1
    assert int(out.iloc[0]["max_run_tokens"]) == 8


# ------------------------------------------------ hapax ratio

def test_hapax_ratio_counts(tmp_path):
    from nacc_form_validator_ray.pipelines.curation import \
        q_hapax_ratio_by_source
    d = _write_docs(tmp_path, ["aa bb aa cc"])
    out = q_hapax_ratio_by_source(d)
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r["n_tokens"]) == 4
    assert int(r["n_distinct"]) == 3
    assert int(r["n_hapax"]) == 2      # bb, cc
    assert float(r["hapax_share"]) == 2.0 / 3.0


def test_hapax_merges_across_docs(tmp_path):
    """'aa' once in each of two docs of the SAME source has corpus
    count 2 — not a hapax; per-batch counting alone would get this
    wrong."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_hapax_ratio_by_source
    d = _write_docs(tmp_path, ["aa", "aa bb"])
    out = q_hapax_ratio_by_source(d)
    r = out.iloc[0]
    assert int(r["n_distinct"]) == 2
    assert int(r["n_hapax"]) == 1      # only bb


def test_hapax_per_source_isolation(tmp_path):
    """The same token in two DIFFERENT sources is a hapax in each."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_hapax_ratio_by_source
    d = _write_docs(tmp_path, ["zz", "zz"], sources=["s1", "s2"])
    out = q_hapax_ratio_by_source(d).set_index("source")
    assert int(out.loc["s1", "n_hapax"]) == 1
    assert int(out.loc["s2", "n_hapax"]) == 1


# ------------------------------------------------ epoch schedule

def test_epoch_schedule_math(tmp_path):
    from nacc_form_validator_ray.pipelines.curation import (
        _EPOCH_BUDGET, q_epoch_schedule)
    d = _write_docs(tmp_path,
                    ["aa " * 10, "bb " * 20, "cc " * 40],
                    sources=["s1", "s2", "s3"])
    out = q_epoch_schedule(d).set_index("source")
    base, rem = _EPOCH_BUDGET // 3, _EPOCH_BUDGET % 3
    assert int(out.loc["s1", "budget_share"]) == base + (1 if rem >= 1
                                                         else 0)
    assert int(out.loc["s3", "budget_share"]) == base
    assert int(out["budget_share"].sum()) == _EPOCH_BUDGET
    # epochs: share*1e6 // available
    assert int(out.loc["s2", "epochs_ppm"]) == \
        (int(out.loc["s2", "budget_share"]) * 1_000_000) // 20


def test_epoch_schedule_skips_empty_source(tmp_path):
    from nacc_form_validator_ray.pipelines.curation import \
        q_epoch_schedule
    d = _write_docs(tmp_path, ["aa bb", "123 456"],
                    sources=["s1", "s2"])  # s2 has no [a-z]+ tokens
    out = q_epoch_schedule(d)
    assert list(out["source"]) == ["s1"]
    assert int(out.iloc[0]["budget_share"]) == 1_000_000


# ------------------------------------------------ ACF

def test_acf_alternating_series(tmp_path):
    """Daily counts [2,0,2,0,2]: lag-1 ACF is exactly -96/120 = -0.8
    and lag-2 is 68/120 by the exact integer formula."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_acf_daily_events
    ts = (["2024-01-01 03:00", "2024-01-01 14:00"]
          + ["2024-01-03 05:00", "2024-01-03 06:00"]
          + ["2024-01-05 07:00", "2024-01-05 23:00"])
    d = _write_events(tmp_path, ts)
    out = q_acf_daily_events(d).set_index("lag_k")
    assert float(out.loc[1, "acf"]) == -96.0 / 120.0
    assert float(out.loc[2, "acf"]) == 68.0 / 120.0
    # lags beyond the 5-day series are absent
    assert set(out.index) == {1, 2, 3, 4}


def test_acf_constant_series_is_empty(tmp_path):
    """A constant daily series has zero variance — no defined ACF."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_acf_daily_events
    d = _write_events(tmp_path, ["2024-01-01 01:00", "2024-01-02 01:00",
                                 "2024-01-03 01:00"])
    out = q_acf_daily_events(d)
    assert len(out) == 0


# ------------------------------------------------ link rot

_KEPT_TEXT = ("this line has at least five words.\n"
              "another line with plenty of words here.\n"
              "a third qualifying line of normal prose text.")


def test_link_rot_after_filter(tmp_path):
    from nacc_form_validator_ray.pipelines.curation import \
        q_link_rot_after_filter
    path = _write_linkpages(tmp_path, [
        (0, "https://t.com/doc/0", _KEPT_TEXT, []),
        (1, "https://t.com/doc/1", "short", []),  # dropped by C4
        (2, "https://src.com/page", _KEPT_TEXT,
         ["https://t.com/doc/0", "https://t.com/doc/1"]),
    ])
    with _patched_linked(path):
        out = q_link_rot_after_filter("ignored")
    assert list(out["src_host"]) == ["src.com"]
    r = out.iloc[0]
    assert int(r["n_links"]) == 2
    assert int(r["n_rot"]) == 1
    assert float(r["rot_rate"]) == 0.5


def test_link_rot_unparseable_target_dropped(tmp_path):
    """A link that does not end in /doc/<id> contributes no edge."""
    from nacc_form_validator_ray.pipelines.curation import \
        q_link_rot_after_filter
    path = _write_linkpages(tmp_path, [
        (0, "https://t.com/doc/0", _KEPT_TEXT, []),
        (1, "https://src.com/page", _KEPT_TEXT,
         ["https://t.com/doc/0", "https://t.com/about"]),
    ])
    with _patched_linked(path):
        out = q_link_rot_after_filter("ignored")
    assert int(out.iloc[0]["n_links"]) == 1
    assert int(out.iloc[0]["n_rot"]) == 0
