"""Perplexity stage: distributed training, actor-style loading, scoring."""

import json

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from nacc_form_validator_ray.stages.perplexity import (PerplexityScorer,
                                                       save_model,
                                                       train_ngram_model)


@pytest.fixture(scope="module")
def corpus():
    rows = [{"doc_id": i,
             "text": "the cat sat on the mat " * (2 + i % 3)}
            for i in range(40)]
    rows += [{"doc_id": 100 + i,
              "text": "zyx qwv jkl mno pqr stu " * 3} for i in range(10)]
    return pd.DataFrame(rows)


def test_train_and_score(corpus):
    model = train_ngram_model(rd.from_pandas(corpus))
    assert model["total_tokens"] > 0
    assert "the" in model["logp"]
    scorer = PerplexityScorer(model=model)
    out = scorer(corpus.copy())
    # in-domain docs score far lower perplexity than the rare-token docs
    common = out[out.doc_id < 100]["log_ppl"].mean()
    rare = out[out.doc_id >= 100]["log_ppl"].mean()
    assert common < rare
    assert (out["oov_count"] == 0).all()  # trained on same corpus
    # unseen tokens count as OOV and raise perplexity
    novel = scorer(pd.DataFrame({"text": ["entirely unseen blorbish"]}))
    assert novel["oov_count"].iloc[0] >= 2
    assert novel["log_ppl"].iloc[0] > common


def test_model_roundtrip_and_determinism(tmp_path, corpus):
    model = train_ngram_model(rd.from_pandas(corpus))
    path = tmp_path / "model.json"
    save_model(model, str(path))
    s1 = PerplexityScorer(model_path=str(path))
    s2 = PerplexityScorer(model=model)
    a = s1(corpus.copy())["log_ppl"].to_numpy()
    b = s2(corpus.copy())["log_ppl"].to_numpy()
    assert np.array_equal(a, b)


def test_scoring_in_dataset_pipeline(corpus):
    model = train_ngram_model(rd.from_pandas(corpus))
    ds = rd.from_pandas(corpus).repartition(4)
    out = ds.map_batches(PerplexityScorer, fn_constructor_kwargs={
        "model": model}, batch_format="pandas",
        concurrency=2).to_pandas()
    assert len(out) == len(corpus)
    assert "log_ppl" in out.columns
