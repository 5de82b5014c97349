"""Regression tests for the round-1 ADVICE findings: each reproduces the
reported divergence and asserts the batch/vector path now matches the
row-level oracle (and the reference semantics it encodes)."""

import numpy as np
import pandas as pd

import ray.data as rd

from nacc_form_validator_ray.engine import (BatchValidator, CompiledSchema)
from nacc_form_validator_ray.errors import Codes
from nacc_form_validator_ray.rowval import RecordValidator
from nacc_form_validator_ray.stages.validate import validate_dataset

from tests.test_batch_engine import assert_parity


# -- ADVICE #1: string-typed field fed non-string values -----------------


def test_string_type_rejects_non_string_values():
    schema = {"name": {"type": "string", "nullable": True}}
    # integer Parquet column under a string-typed field: the reference
    # leaves the value uncast and Cerberus's 'string' type rule fails it
    df = pd.DataFrame({"name": pd.array([123, 456, None],
                                        dtype="Int64")})
    compiled = CompiledSchema(schema)
    bv = BatchValidator(compiled, collect="codes")
    _, result = bv.validate_frame(df)
    assert list(result.passed) == [False, False, True]
    codes = set(zip(result.row_idx, result.codes))
    assert (0, Codes.BAD_TYPE) in codes and (1, Codes.BAD_TYPE) in codes


def test_string_type_object_column_mixed_parity():
    schema = {"name": {"type": "string", "nullable": True}}
    records = [{"name": "ok"}, {"name": 7}, {"name": 1.5},
               {"name": None}, {"name": True}]
    assert_parity(schema, records)


def test_string_type_timestamp_column_fails():
    schema = {"ts": {"type": "string", "nullable": True}}
    df = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01", None])})
    compiled = CompiledSchema(schema)
    _, result = BatchValidator(compiled).validate_frame(df)
    assert list(result.passed) == [False, True]


# -- ADVICE #2: temporalrules fast path on uncast (string) columns -------


def _taxes_schema():
    return {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "taxes": {
            "type": "integer",
            "temporalrules": [{
                "index": 0,
                "previous": {"taxes": {"allowed": [0]}},
                "current": {"taxes": {"forbidden": [8]}},
            }],
        },
    }


def test_temporalrules_string_input_takes_cast_path():
    # integer-typed field delivered as STRINGS (CSV-shaped input): the
    # vector fast path must not evaluate raw values
    df = pd.DataFrame({
        "patient_id": ["p1", "p1", "p2", "p2"],
        "visit_num": ["1", "2", "1", "2"],
        "taxes": ["0", "8", "1", "8"],
    })
    out = validate_dataset(rd.from_pandas(df), _taxes_schema(),
                           pk_field="patient_id", orderby="visit_num") \
        .to_pandas().sort_values(["patient_id", "visit_num"])
    # p1 visit2: prev taxes==0 and current==8 -> TEMPORAL violation
    flat = [e["code"] for errs in out["errors"] for e in (errs or [])]
    assert Codes.TEMPORAL in flat
    by = out.set_index(["patient_id", "visit_num"])["passed"]
    assert not by[("p1", "2")]
    assert by[("p2", "2")]  # prev taxes==1 -> condition not met


def test_temporalrules_numeric_input_same_answer_as_string_input():
    df_num = pd.DataFrame({
        "patient_id": ["p1", "p1", "p2", "p2"],
        "visit_num": [1, 2, 1, 2],
        "taxes": [0, 8, 1, 8],
    })
    df_str = df_num.astype({"visit_num": str, "taxes": str})
    out_n = validate_dataset(rd.from_pandas(df_num), _taxes_schema(),
                             pk_field="patient_id", orderby="visit_num") \
        .to_pandas().sort_values(["patient_id", "visit_num"])
    out_s = validate_dataset(rd.from_pandas(df_str), _taxes_schema(),
                             pk_field="patient_id", orderby="visit_num") \
        .to_pandas().sort_values(["patient_id", "visit_num"])
    assert out_n["passed"].tolist() == out_s["passed"].tolist()
    assert out_n["n_errors"].tolist() == out_s["n_errors"].tolist()


# -- ADVICE #3: vector jsonLogic '/' on a zero divisor -------------------


def test_division_by_zero_is_sys_failure():
    schema = {
        "a": {"type": "integer"},
        "b": {"type": "integer"},
        "ratio_check": {
            "type": "integer", "nullable": True,
            "logic": {"formula": {">": [{"/": [{"var": "a"},
                                               {"var": "b"}]}, 1]}},
        },
    }
    df = pd.DataFrame({"a": [10, 10], "b": [2, 0],
                       "ratio_check": [1, 1]})
    compiled = CompiledSchema(schema)
    _, result = BatchValidator(compiled).validate_frame(df)
    assert bool(result.passed[0])
    assert not bool(result.passed[1])
    assert bool(result.sys_failure[1])  # reference: ZeroDivisionError


# -- ADVICE #4: compare_with op=abs with a null adjustment ---------------


def test_compare_with_abs_null_adjustment_parity():
    # reference: adjusted_value = adjustment verbatim, so a None
    # adjustment hits compare_values' base-None branch (passes for
    # ==, !=, >, >=; fails for <, <=)
    for comparator in ["==", "!=", "<", "<=", ">", ">="]:
        schema = {
            "val": {"type": "integer", "nullable": True},
            "base": {"type": "integer", "nullable": True},
            "adj": {"type": "integer", "nullable": True},
            "checked": {
                "type": "integer", "nullable": True,
                "compare_with": {
                    "comparator": comparator,
                    "base": "base",
                    "op": "abs",
                    "adjustment": "adj",
                },
            },
        }
        records = [
            {"val": 1, "base": 5, "adj": None, "checked": 7},
            {"val": 1, "base": 5, "adj": 2, "checked": 7},
            {"val": 1, "base": 5, "adj": 2, "checked": 4},
        ]
        assert_parity(schema, records)


# -- ADVICE #5: pretrain doc ids must be unique per row ------------------


def test_pretrain_doc_id_unique_for_duplicate_urls():
    from nacc_form_validator_ray.pipelines.pretrain import \
        _keep_and_project
    batch = pd.DataFrame({
        "passed": [True, True, True],
        "url": ["https://h/x", "https://h/x", "https://h/y"],
        "warc_ts": pd.to_datetime(["2025-01-01", "2025-06-01",
                                   "2025-01-01"]),
        "lang_pred": ["en", "en", "en"],
        "scrubbed_text": ["first crawl", "second crawl", "other"],
        "n_words": [2, 2, 1],
    })
    import pyarrow as pa
    out = _keep_and_project(pa.Table.from_pandas(batch))
    assert len(set(out["doc_id"].to_pylist())) == 3  # recrawl != same id


def test_pretrain_duplicate_url_keeps_one_representative(tmp_path):
    """Two byte-identical recrawls of one url: exact dedup must keep
    exactly one copy, not drop both (round-1 ADVICE #5)."""
    from nacc_form_validator_ray.stages.dedup import exact_dedup
    from nacc_form_validator_ray.pipelines.pretrain import \
        _keep_and_project
    text = ("data market system report world science music house water "
            "light story engine model garden river street paper window "
            * 6)
    batch = pd.DataFrame({
        "passed": [True] * 3,
        "url": ["https://h/x", "https://h/x", "https://h/y"],
        "warc_ts": pd.to_datetime(["2025-01-01", "2025-06-01",
                                   "2025-01-01"]),
        "lang_pred": ["en"] * 3,
        "scrubbed_text": [text, text, text + " different tail words"],
        "n_words": [10] * 3,
    })
    import pyarrow as pa
    docs = rd.from_arrow(_keep_and_project(pa.Table.from_pandas(batch)))
    out = exact_dedup(docs, id_column="doc_id",
                      text_column="text").to_pandas()
    assert sorted(out["url"]) == ["https://h/x", "https://h/y"]


# -- VERDICT #4: label propagation must converge on long chains ----------


def test_propagate_labels_chain_converges():
    from nacc_form_validator_ray.stages.dedup import propagate_labels
    ids = pd.DataFrame({"doc_id": np.arange(1, 9, dtype=np.int64)})
    # chain 1~2~3~4~5~6 (diameter 5) + isolated 7, 8
    pairs = pd.DataFrame({
        "id_a": np.array([1, 2, 3, 4, 5], dtype=np.int64),
        "id_b": np.array([2, 3, 4, 5, 6], dtype=np.int64),
    })
    out = propagate_labels(rd.from_pandas(pairs), rd.from_pandas(ids),
                           num_partitions=4).to_pandas() \
        .sort_values("doc_id")
    assert out["cluster"].tolist() == [1, 1, 1, 1, 1, 1, 7, 8]


def test_byte_run_tokenizer_matches_arrow_regex_split_on_unicode():
    """The byte-run tokenizer must be byte-for-byte equivalent to the
    round-1 formulation (split_pattern_regex(utf8_lower, '[^a-z]+'),
    empties dropped) including on multibyte/case-folding edge cases
    (KELVIN K -> k, dotted I, combining marks)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from nacc_form_validator_ray.stages.text_signals import \
        arrow_token_codes
    texts = ["", "plain ascii words", "Kİ mixed KELVIN K x",
             "café straße", "日本 ok",
             "a\tb\nc\x0b\x0c d", "UPPER lower 012 mixed!",
             "Kaİb"]
    arr = pa.array(texts, type=pa.string())
    toks_old = pc.split_pattern_regex(pc.utf8_lower(arr),
                                      pattern="[^a-z]+")
    old = [[t for t in toks_old[i].as_py() if t]
           for i in range(len(texts))]
    codes, dic, tok_doc, n_tokens = arrow_token_codes(arr)
    new = [[] for _ in texts]
    vocab = dic.to_pylist()
    for c, d in zip(codes, tok_doc):
        new[d].append(vocab[c])
    assert old == new
    assert n_tokens.tolist() == [len(x) for x in old]


def test_kmeans_fewer_vectors_than_k():
    """Round-3 ADVICE: k > dataset size used to IndexError in the
    centroid update (counts/live sized k vs an (m<k, d) matrix)."""
    from nacc_form_validator_ray.stages.kmeans import kmeans_fit
    df = pd.DataFrame({
        "vec_id": np.arange(3, dtype=np.int64),
        "embedding": [np.array([1.0, 0.0], dtype=np.float32),
                      np.array([0.0, 1.0], dtype=np.float32),
                      np.array([1.0, 1.0], dtype=np.float32)],
    })
    cents, counts = kmeans_fit(rd.from_pandas(df), k=8, iterations=2)
    assert cents.shape[0] == 3 == len(counts)
    assert counts.sum() == 3


def test_lr_scorer_null_text_scores_as_empty():
    """Round-3 ADVICE: a null text row made utf8_length propagate null
    -> NaN -> INT64_MIN garbage logits; it must score like ''."""
    from nacc_form_validator_ray.stages.classifier import score_documents
    df = pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": pd.array([None, ""], dtype="string"),
    })
    out = score_documents(rd.from_pandas(df)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[0, "logit_q10"] == out.loc[1, "logit_q10"]
    assert out.loc[0, "n_chars"] == 0


def test_grouped_agg_sum_names_not_positions():
    """Round-3 ADVICE: aggregate outputs must be selected by their
    generated names, never positionally."""
    import pyarrow as pa
    from nacc_form_validator_ray.stages.partition import pa_grouped_agg
    t = pa.table({"k": [1, 1, 2], "v": [10, 20, 5], "w": [1, 2, 3]})
    out = pa_grouped_agg(t, ["k"], [("v", "sum"), ("w", "sum"),
                                    ([], "count_all")],
                         ["v", "w", "n"])
    d = {r["k"]: r for r in out.to_pylist()}
    assert d[1]["v"] == 30 and d[1]["w"] == 3 and d[1]["n"] == 2
    assert d[2]["v"] == 5 and d[2]["w"] == 3 and d[2]["n"] == 1
