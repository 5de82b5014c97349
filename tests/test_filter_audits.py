"""Batch-18 filter-audit reports: rule co-occurrence consistency with
the quality filter's error counts, keep-rate calibration totals,
per-source langid drift, BPE fertility passthrough, and scrub volume
semantics on hand-built fixtures."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_rule_cooccurrence_consistency():
    from nacc_form_validator_ray.pipelines.queries import (
        q_quality_filter, q_rule_attribution_docs,
        q_rule_cooccurrence_docs)
    co = q_rule_cooccurrence_docs(SF)
    attr = q_rule_attribution_docs(SF).set_index("field")
    qf = q_quality_filter(SF).to_pandas()
    # all 10 unordered pairs pinned, in sorted order
    assert len(co) == 10
    assert (co["field_a"] < co["field_b"]).all()
    # a pair's overlap can't exceed either field's violation count
    for _, r in co.iterrows():
        cap = min(attr.loc[r["field_a"], "n_violations"],
                  attr.loc[r["field_b"], "n_violations"])
        assert r["n_both"] <= cap
    # min/max arms are mutually exclusive per field, so n_errors ==
    # violated-field count: sum over pairs == sum over docs C(e, 2)
    e = qf["n_errors"].to_numpy(dtype=np.int64)
    assert int(co["n_both"].sum()) == int((e * (e - 1) // 2).sum())


def test_keep_rate_by_length_totals():
    from nacc_form_validator_ray.pipelines.queries import (
        q_keep_rate_by_length, q_quality_filter)
    kr = q_keep_rate_by_length(SF)
    qf = q_quality_filter(SF).to_pandas()
    assert int(kr["n_docs"].sum()) == len(qf)
    assert int(kr["n_kept"].sum()) == int(qf["passed"].sum())
    assert (kr["bucket"].diff().dropna() > 0).all()  # sorted, distinct
    assert ((kr["keep_rate"] >= 0) & (kr["keep_rate"] <= 1)).all()
    got = kr["n_kept"].to_numpy(np.float64) / kr["n_docs"].to_numpy(
        np.float64)
    assert (kr["keep_rate"].to_numpy() == got).all()


def test_langid_mismatch_matches_rowwise():
    from nacc_form_validator_ray.pipelines.queries import (
        q_langid, q_langid_mismatch_by_source)
    got = q_langid_mismatch_by_source(SF)
    pred = q_langid(SF).to_pandas()[["doc_id", "lang_pred"]]
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang", "source"])
    j = docs.merge(pred, on="doc_id")
    j = j.assign(m=(j["lang"].fillna("") != j["lang_pred"])
                 .astype(np.int64), src=j["source"].fillna(""))
    want = j.groupby("src", as_index=False) \
        .agg(n_docs=("doc_id", "size"), n_mismatch=("m", "sum")) \
        .sort_values("src").reset_index(drop=True)
    assert got["n_docs"].tolist() == want["n_docs"].tolist()
    assert got["n_mismatch"].tolist() == want["n_mismatch"].tolist()


def test_fertility_passthrough_matches_per_doc_encode(tmp_path):
    """fertility_by_source (source passed through bpe_encode) must
    equal the per-doc bpe_encode_docs output re-grouped by source —
    two different plumbing paths over the same arithmetic."""
    from nacc_form_validator_ray.pipelines.queries import (
        q_bpe_encode_docs, q_fertility_by_source)
    fert = q_fertility_by_source(SF)
    per_doc = q_bpe_encode_docs(SF).to_pandas()
    src = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "source"])
    want = per_doc.merge(src, on="doc_id").groupby(
        "source", as_index=False)[["n_words", "n_subwords"]].sum() \
        .sort_values("source").reset_index(drop=True)
    assert fert["n_words"].tolist() == want["n_words"].tolist()
    assert fert["n_subwords"].tolist() == want["n_subwords"].tolist()
    assert ((fert["fertility"] >= 1.0) | (fert["n_words"] == 0)).all()


def test_fertility_zero_word_source(tmp_path):
    """A source whose every doc has no [a-z]+ words must still appear,
    with zeros and fertility pinned to 0.0 (the LEFT-JOIN contract)."""
    from nacc_form_validator_ray.pipelines.queries import \
        q_fertility_by_source
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(4, dtype=np.int64)),
        "text": pa.array(["the cat sat", "the the the",
                          "123 456 !!!", None]),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["words", "words", "numeric", "numeric"]),
        "n_chars": pa.array([11, 11, 11, 0], pa.int64())}),
        tmp_path / "documents.parquet")
    out = q_fertility_by_source(str(tmp_path))
    assert out["source"].tolist() == ["numeric", "words"]
    nz = out.set_index("source")
    assert nz.loc["numeric", "n_words"] == 0
    assert nz.loc["numeric", "n_subwords"] == 0
    assert nz.loc["numeric", "fertility"] == 0.0
    assert nz.loc["words", "n_words"] == 6
    assert nz.loc["words", "fertility"] >= 1.0


def test_scrub_volume_semantics(tmp_path):
    """Hand-built PII fixture: touched counts, redaction totals and the
    net char delta (original minus scrubbed lengths) per source."""
    from nacc_form_validator_ray.pipelines.queries import \
        q_scrub_volume_by_source
    from nacc_form_validator_ray.stages.scrub import Scrubber
    texts = ["mail bob@example.com twice: a@b.co",
             "clean text with no pii at all",
             None]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(3, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["dirty", "clean", "clean"]),
        "n_chars": pa.array([len(t) if t else 0 for t in texts],
                            pa.int64())}),
        tmp_path / "documents.parquet")
    out = q_scrub_volume_by_source(str(tmp_path)).set_index("source")
    assert out.loc["clean", "n_touched"] == 0
    assert out.loc["clean", "n_redactions"] == 0
    assert out.loc["clean", "chars_removed"] == 0
    assert out.loc["clean", "n_docs"] == 2
    assert out.loc["dirty", "n_touched"] == 1
    assert out.loc["dirty", "n_redactions"] == 2
    # net delta equals recomputing through the stage itself
    sc = Scrubber()
    t = sc(pa.table({"text": pa.array([texts[0]])}))
    delta = len(texts[0]) - len(t["scrubbed_text"][0].as_py())
    assert out.loc["dirty", "chars_removed"] == delta


def test_null_text_contract_quality_filter(tmp_path):
    """Null text ≡ empty text across the quality-filter twins (the
    batch-18 fuzz finding): both engines must agree on flags for a
    null-text document rather than NULL-dropping it from FILTERs."""
    import duckdb

    from nacc_form_validator_ray.pipelines.queries import (
        ORACLE_SQL, q_quality_filter, q_rule_cooccurrence_docs)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(3, dtype=np.int64)),
        "text": pa.array([None, "", "the and of to in a is was"]),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["s"] * 3),
        "n_chars": pa.array([0, 0, 25], pa.int64())}),
        tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path}/documents.parquet')")
    got = q_quality_filter(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = con.sql(ORACLE_SQL["quality_filter_docs"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_errors"].tolist() == want["n_errors"].tolist()
    # null and empty text produce IDENTICAL error vectors
    assert got.loc[0, "n_errors"] == got.loc[1, "n_errors"]
    co = q_rule_cooccurrence_docs(str(tmp_path))
    wco = con.sql(ORACLE_SQL["rule_cooccurrence_docs"]).df()
    m = co.merge(wco, on=["field_a", "field_b"], suffixes=("", "_w"))
    assert (m["n_both"] == m["n_both_w"]).all()
