"""BPE trainer: hand-computed merges on the classic Sennrich-style
corpus, plus a DuckDB differential on a random corpus."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from nacc_form_validator_ray.pipelines.queries import _sql_bpe_merges
from nacc_form_validator_ray.stages.bpe import bpe_merges


def _corpus(word_freq):
    words = []
    for w, c in word_freq.items():
        words += [w] * c
    return " ".join(words)


def test_bpe_hand_computed():
    # Sennrich et al. example vocabulary (no end-of-word marker):
    # low:5 lower:2 newest:6 widest:3
    text = _corpus({"low": 5, "lower": 2, "newest": 6, "widest": 3})
    ds = rd.from_pandas(pd.DataFrame({"text": [text]}))
    out = bpe_merges(ds, n_merges=5, num_partitions=4).to_pandas()
    got = list(zip(out["pair"], out["merged"], out["c"]))
    assert got == [
        (".e.s.", ".es.", 9),   # e-s:9 ties s-t:9, '.e.s.' < '.s.t.'
        (".es.t.", ".est.", 9),
        (".l.o.", ".lo.", 7),   # l-o:7 ties o-w:7
        (".lo.w.", ".low.", 7),
        (".e.w.", ".ew.", 6),   # ties n-e and w-est at 6
    ]
    assert list(out["rank"]) == [1, 2, 3, 4, 5]


def test_bpe_overlapping_pair_merge():
    # 'aaaa' -> pairs (a,a)x3; greedy left-to-right merges offsets
    # 0 and 2 (reference semantics): [a,a,a,a] -> [aa,aa], so round 2
    # merges (aa,aa)
    ds = rd.from_pandas(pd.DataFrame({"text": ["aaaa aaaa aaaa"]}))
    out = bpe_merges(ds, n_merges=2, num_partitions=2).to_pandas()
    assert list(out["pair"]) == [".a.a.", ".aa.aa."]
    assert list(out["c"]) == [9, 3]


def test_bpe_odd_run_greedy():
    # [a,a,a] merges once (positions 0-1), leaving [aa, a] — the
    # run-parity rule; a naive "replace all matches" would be wrong
    ds = rd.from_pandas(pd.DataFrame({"text": ["aaa aaa"]}))
    out = bpe_merges(ds, n_merges=2, num_partitions=2).to_pandas()
    assert list(out["pair"])[0] == ".a.a."
    assert list(out["c"])[0] == 4  # 2 pairs per 'aaa' x 2 words
    # round 2: each word is [aa, a] -> best pair (aa, a) with c=2
    assert list(out["pair"])[1] == ".a.aa." or \
        list(out["pair"])[1] == ".aa.a."
    assert list(out["c"])[1] == 2


def test_bpe_prefix_collision_regression():
    # round-3 ADVICE: substring-replace BPE let pattern '.a.b' match
    # '.a.bc' (symbol 'b' a proper prefix of 'bc'); list merges must
    # only merge FULL symbols: applying (a, b) to 'abc' gives
    # [ab, c] (2 subwords), never [abc]
    from nacc_form_validator_ray.stages.bpe import bpe_encode
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": ["abc", "ab"]}))
    out = bpe_encode(ds, [(".a.b.", ".ab.")]).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[0, "n_subwords"] == 2  # [ab, c]
    assert out.loc[1, "n_subwords"] == 1  # [ab]


def test_bpe_vs_duckdb_random():
    rng = np.random.RandomState(13)
    # 'aa'/'aaa' force delimiter-adjacent repeat merges — the greedy
    # run-parity rule must agree between numpy and the SQL twin
    syll = ["ba", "na", "to", "ri", "ku", "zez", "aa", "aaa"]
    docs = []
    for _ in range(40):
        words = ["".join(rng.choice(syll, rng.randint(1, 4)))
                 for _ in range(rng.randint(0, 30))]
        docs.append(" ".join(words))
    df = pd.DataFrame({"text": docs})
    eng = bpe_merges(rd.from_pandas(df), n_merges=8,
                     num_partitions=4).to_pandas()
    con = duckdb.connect()
    con.register("documents", df)
    sql = con.sql(_sql_bpe_merges(8)).df()
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), sql.reset_index(drop=True),
        check_dtype=False)


def test_bpe_encode_counts():
    from nacc_form_validator_ray.stages.bpe import bpe_encode
    # after (e,s): newest = n-e-w-es-t (5 symbols);
    # after (es,t): n-e-w-est (4 symbols)
    merges = [(".e.s.", ".es."), (".es.t.", ".est.")]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["newest widest", "no pairs here", ""]}))
    out = bpe_encode(ds, merges).to_pandas().set_index("doc_id") \
        .sort_index()
    # newest: n,e,w,est = 4; widest: w,i,d,est = 4
    assert out.loc[0, "n_words"] == 2
    assert out.loc[0, "n_chars"] == 12
    assert out.loc[0, "n_subwords"] == 8
    # untouched words keep one symbol per char
    assert out.loc[1, "n_subwords"] == out.loc[1, "n_chars"] == 11
    assert out.loc[2, "n_words"] == 0 and out.loc[2, "n_subwords"] == 0


def test_bpe_encode_vs_duckdb_random():
    from nacc_form_validator_ray.stages.bpe import bpe_encode, bpe_merges
    from nacc_form_validator_ray.pipelines.queries import \
        _sql_bpe_encode_docs
    rng = np.random.RandomState(21)
    syll = ["re", "do", "mi", "fa", "sol"]
    docs = [" ".join("".join(rng.choice(syll, rng.randint(1, 4)))
                     for _ in range(rng.randint(0, 20)))
            for _ in range(50)]
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})
    m = bpe_merges(rd.from_pandas(df), n_merges=6,
                   num_partitions=4).to_pandas()
    eng = bpe_encode(rd.from_pandas(df),
                     list(zip(m["pair"], m["merged"]))).to_pandas()
    con = duckdb.connect()
    con.register("documents", df)
    sql = con.sql(_sql_bpe_encode_docs(6)).df()
    key = lambda d: d.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(eng), key(sql),
                                  check_dtype=False)
