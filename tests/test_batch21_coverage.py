"""Batch-21: OOV vocabulary coverage (exact top-K ties), KMV overlap
estimator vs exact sets, and cross-document frame dedup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts, sources=None):
    n = len(texts)
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(sources if sources is not None
                           else ["s"] * n, pa.string()),
        "n_chars": pa.array([len(t) if t else 0 for t in texts],
                            pa.int64())}), tmp_path / "documents.parquet")
    return str(tmp_path)


def test_oov_rate_known_vocab(tmp_path, monkeypatch):
    import nacc_form_validator_ray.pipelines.mining as M
    monkeypatch.setattr(M, "_OOV_VOCAB_K", 2)
    # corpus counts: aa x5, bb x3, cc x1 -> vocab (K=2) = {aa, bb}
    d = _write_docs(tmp_path,
                    ["aa aa bb cc", "aa aa bb", "aa bb"],
                    ["s1", "s1", "s2"])
    out = M.q_oov_rate_by_source(d).set_index("source")
    assert out.loc["s1", "n_tokens"] == 7
    assert out.loc["s1", "n_oov"] == 1            # the single cc
    assert out.loc["s2", "n_oov"] == 0
    assert out.loc["s1", "oov_rate"] == 1 / 7


def test_oov_topk_tie_determinism(tmp_path, monkeypatch):
    """Two tokens tied at the k-th count: the lexicographically
    smaller one enters the vocabulary in BOTH engines."""
    import duckdb

    import nacc_form_validator_ray.pipelines.mining as M
    from nacc_form_validator_ray.pipelines.queries import ORACLE_SQL
    monkeypatch.setattr(M, "_OOV_VOCAB_K", 2)
    d = _write_docs(tmp_path, ["aa aa zz yy", "zz yy"])  # zz == yy == 2
    out = M.q_oov_rate_by_source(d)
    # vocab = {aa, yy} (yy < zz): oov = both zz occurrences
    assert out["n_oov"].tolist() == [2]
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{d}/documents.parquet')")
    sql = ORACLE_SQL["oov_rate_by_source"].replace("LIMIT 256",
                                                   "LIMIT 2")
    want = con.sql(sql).df()
    assert want["n_oov"].tolist() == [2]


def test_kmv_overlap_consistency():
    from nacc_form_validator_ray.pipelines.mining import \
        q_kmv_type_overlap
    out = q_kmv_type_overlap(SF)
    r = out.iloc[0]
    assert r["exact_intersection"] <= min(r["exact_a"], r["exact_b"])
    assert 0.0 <= r["exact_jaccard"] <= 1.0
    # union sketch can never estimate below either side's k-th bound
    assert r["est_union"] >= max(r["est_a"], r["est_b"]) - r["k"]
    # with KMV_K=64 >> 15 distinct users the sketch is exact
    assert r["est_a"] == r["exact_a"]
    assert r["est_intersection"] == r["exact_intersection"]


def test_frame_dedup_known_frames(tmp_path):
    from nacc_form_validator_ray.pipelines.mining import q_frame_dedup
    shared = "S" * 256          # frame 0 shared by docs 0 and 1
    t0 = shared + "A" * 300
    t1 = shared + "B" * 300
    t2 = "C" * 600              # unique frames only
    d = _write_docs(tmp_path, [t0, t1, t2])
    out = q_frame_dedup(d).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["frame_text"] == shared
    assert out.iloc[0]["n_docs"] == 2
    assert out.iloc[0]["n_occurrences"] == 2

def test_frame_dedup_unicode_null_and_empty(tmp_path):
    """Review regressions: (1) a multibyte char straddling the 256-char
    frame boundary must neither crash nor diverge from the char-based
    twin; (2) NULL text rides the null=='' contract in BOTH engines;
    (3) an empty corpus still returns the three typed columns."""
    import duckdb

    from nacc_form_validator_ray.pipelines.mining import q_frame_dedup
    from nacc_form_validator_ray.pipelines.queries import ORACLE_SQL

    shared = "x" * 255 + "é"    # 256 CHARS; 257 utf-8 bytes
    texts = [shared + "y" * 1200, shared + "z" * 1200, None, ""]
    d = _write_docs(tmp_path, texts)
    got = q_frame_dedup(d).to_pandas() \
        .sort_values("frame_text").reset_index(drop=True)
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{d}/documents.parquet')")
    want = con.sql(ORACLE_SQL["frame_dedup"]).df() \
        .sort_values("frame_text").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert shared in set(got["frame_text"])          # the straddler
    assert "" in set(got["frame_text"])              # null == ''

    # empty corpus: the result BLOCKS keep the three typed columns
    # (Ray 2.49's to_pandas flattens any zero-row dataset to a bare
    # DataFrame, so the schema contract is asserted on schema())
    e = _write_docs(tmp_path / "e2", [])
    out = q_frame_dedup(e)
    sch = out.schema()
    assert sch is not None and sorted(sch.names) == \
        ["frame_text", "n_docs", "n_occurrences"]
    assert out.count() == 0
