"""Hypothesis differential: the round-3 text operators vs their DuckDB
twins on randomized ASCII corpora with real line structure (the driver
tables have no newlines, so these paths need adversarial inputs).

Derandomized at a modest example count for CI; crank ``max_examples``
ad hoc for the per-round fuzz sweep ritual.
"""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings, strategies as st

from nacc_form_validator_ray.pipelines.queries import (
    SQL_LINE_DEDUP_DOCS, SQL_REPETITION_DOCS)
from nacc_form_validator_ray.stages.dedup import line_dedup
from nacc_form_validator_ray.stages.text_signals import RepetitionSignals

WORDS = ["data", "the", "alpha", "beta", "x", "spam", "ham", "copy"]

line_st = st.lists(st.sampled_from(WORDS), min_size=0, max_size=6) \
    .map(" ".join)
doc_st = st.lists(line_st, min_size=0, max_size=8).map("\n".join)
corpus_st = st.lists(doc_st, min_size=1, max_size=12)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


@settings(max_examples=25, deadline=None, derandomize=True)
@given(docs=corpus_st)
def test_repetition_signals_vs_duckdb(docs):
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})
    eng = RepetitionSignals()(df.copy())[
        ["doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
         "top_2gram_char_frac", "repetitive"]]
    con = duckdb.connect()
    con.register("documents", df)
    sql = con.sql(SQL_REPETITION_DOCS).df()
    pd.testing.assert_frame_equal(_canon(eng), _canon(sql),
                                  check_dtype=False)


@settings(max_examples=15, deadline=None, derandomize=True)
@given(docs=corpus_st)
def test_line_dedup_vs_duckdb(docs):
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})
    out = line_dedup(rd.from_pandas(df).repartition(2),
                     min_docs=2).to_pandas()
    con = duckdb.connect()
    con.register("documents", df)
    sql = con.sql(SQL_LINE_DEDUP_DOCS).df()
    pd.testing.assert_frame_equal(
        _canon(out[["doc_id", "text", "n_lines_dropped"]]),
        _canon(sql), check_dtype=False)


def test_chunk_documents_edges_and_duckdb():
    from nacc_form_validator_ray.pipelines.queries import SQL_CHUNK_DOCS
    from nacc_form_validator_ray.stages.text_signals import \
        chunk_documents
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "",                                # no chunks
            "one",                             # single short chunk
            " ".join(["tok"] * 64),            # exactly one full chunk
            " ".join(["tok"] * 65),            # boundary +1 -> 2 chunks
            " ".join(f"w{i}" for i in range(200)),   # several chunks
            None,                              # null text -> no chunks
        ]})
    out = chunk_documents(rd.from_pandas(df).repartition(2),
                          chunk_tokens=64, stride=48).to_pandas()
    assert set(out[out.doc_id == 2]["chunk_id"]) == {0}
    assert set(out[out.doc_id == 3]["chunk_id"]) == {0, 1}
    assert 0 not in set(out["doc_id"][out.doc_id.isin([0, 5])])
    row = out[(out.doc_id == 3) & (out.chunk_id == 1)].iloc[0]
    assert row["start_tok"] == 48 and row["n_tok"] == 17
    # w-numbered doc: chunk texts recompose the token stream exactly
    con = duckdb.connect()
    con.register("documents", df)
    sql = con.sql(SQL_CHUNK_DOCS.replace("lower(coalesce(text, ''))",
                                         "lower(coalesce(text, ''))")) \
        .df()
    pd.testing.assert_frame_equal(_canon(out), _canon(sql),
                                  check_dtype=False)
