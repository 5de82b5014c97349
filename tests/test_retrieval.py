"""BM25 ranking invariants beyond the oracle gate."""

import numpy as np
import pandas as pd
import ray.data as rd


def test_bm25_ranks_relevant_docs_first():
    from nacc_form_validator_ray.stages.retrieval import bm25_topk
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "cat cat cat dog",              # high tf for 'cat'
            "cat " + "filler " * 200,       # long doc penalized
            "dog dog dog",                  # only 'dog'
            "bird song morning",            # no match -> excluded
            "",                             # empty -> excluded
            None,                           # null -> excluded
        ]})
    out = bm25_topk(rd.from_pandas(df).repartition(3), ["cat", "dog"],
                    k=10)
    assert list(out.columns) == ["doc_id", "score", "rank"]
    assert set(out["doc_id"]) == {0, 1, 2}
    # doc 0 matches both terms with high tf and short length
    assert out.iloc[0]["doc_id"] == 0 and out.iloc[0]["rank"] == 1
    # length normalization: doc 1's lone 'cat' in 201 tokens scores
    # below doc 2's concentrated 'dog'
    s = out.set_index("doc_id")["score"]
    assert s[2] > s[1]
    # batching invariance (quantized per-term scores sum exactly)
    out1 = bm25_topk(rd.from_pandas(df).repartition(1), ["cat", "dog"],
                     k=10)
    pd.testing.assert_frame_equal(out, out1)
