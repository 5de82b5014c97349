"""Real-model seam integration tests (round-3 VERDICT #6).

The container has no fastText / KenLM, but the engine's stateful
stages must prove their swap points work: a user-supplied artifact
file loads through the actor ``__init__`` path (once per actor, via
``fn_constructor_kwargs``) and drives per-batch scoring.
"""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_langid_loads_fasttext_wordlist_through_actor_init(tmp_path):
    from nacc_form_validator_ray.stages.text_signals import LangId

    bank = tmp_path / "langid.ftz.txt"
    bank.write_text(
        "__label__xx zorp blick frumious\n"
        "__label__yy wibble zorp\n"          # zorp is shared
        "__label__xx galumph\n"              # labels accumulate
    )
    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["zorp blick galumph prose", "wibble wibble zorp",
                 "nothing matches here"],
    })
    out = rd.from_pandas(df).map_batches(
        LangId, fn_constructor_kwargs={"bank_path": str(bank)},
        batch_format="pandas", concurrency=(1, 2),
    ).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "lang_pred"] == "xx"   # 3 xx hits vs 1 yy
    assert out.loc[1, "lang_pred"] == "yy"   # 3 yy hits vs 1 xx
    assert out.loc[2, "lang_pred"] == "und"  # no bank hit


def test_langid_wordlist_label_order_breaks_ties(tmp_path):
    from nacc_form_validator_ray.stages.text_signals import LangId

    bank = tmp_path / "banks.txt"
    bank.write_text("__label__aa shared\n__label__bb shared\n")
    df = pd.DataFrame({"text": ["shared words only"]})
    out = rd.from_pandas(df).map_batches(
        LangId(bank_path=str(bank)),
        batch_format="pandas").to_pandas()
    # both banks score 1: first-appearance label wins
    assert out.loc[0, "lang_pred"] == "aa"


def test_perplexity_loads_kenlm_arpa_through_actor_init(tmp_path):
    import math
    from nacc_form_validator_ray.stages.perplexity import (
        PerplexityScorer, load_arpa_unigram)

    arpa = tmp_path / "toy.arpa"
    arpa.write_text(
        "\\data\\\n"
        "ngram 1=4\n"
        "\n"
        "\\1-grams:\n"
        "-0.5\tthe\t-0.30103\n"
        "-1.0\tcat\n"
        "-2.0\tsat\n"
        "-3.0\t<unk>\n"
        "\\end\\\n"
    )
    model = load_arpa_unigram(str(arpa))
    assert model["oov_logp"] == -3.0 * math.log(10.0)
    assert set(model["logp"]) == {"the", "cat", "sat"}

    df = pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": ["the cat sat", "qqqq zzzz"],
    })
    out = rd.from_pandas(df).map_batches(
        PerplexityScorer,
        fn_constructor_kwargs={"arpa_path": str(arpa)},
        batch_format="pandas", concurrency=(1, 2),
    ).to_pandas().set_index("doc_id").sort_index()
    ln10 = math.log(10.0)
    expect0 = -(-0.5 - 1.0 - 2.0) * ln10 / 3
    assert abs(out.loc[0, "log_ppl"] - expect0) < 1e-12
    expect1 = 3.0 * ln10  # two OOV tokens at <unk>'s prob
    assert abs(out.loc[1, "log_ppl"] - expect1) < 1e-12
    assert out.loc[1, "oov_count"] == 2


def test_ft_model_path_gate_raises_without_fasttext():
    """When the fasttext library is absent the real-model seam must
    fail loudly at actor construction, not mid-batch."""
    from nacc_form_validator_ray.stages.text_signals import LangId

    try:
        import fasttext  # noqa: F401
        pytest.skip("fasttext present; gate test not applicable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="fasttext"):
        LangId(ft_model_path="/nonexistent/model.bin")


def test_kenlm_path_gate_raises_without_kenlm():
    from nacc_form_validator_ray.stages.perplexity import \
        PerplexityScorer

    try:
        import kenlm  # noqa: F401
        pytest.skip("kenlm present; gate test not applicable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="kenlm"):
        PerplexityScorer(kenlm_path="/nonexistent/model.arpa")


def test_langid_real_fasttext_model(tmp_path):
    """Runs only where the actual fasttext library exists: train a tiny
    supervised model in its REAL binary format and drive it through
    the LangId actor seam (round-4 VERDICT item 7)."""
    fasttext = pytest.importorskip("fasttext")
    from nacc_form_validator_ray.stages.text_signals import LangId

    train = tmp_path / "train.txt"
    train.write_text(
        "\n".join(["__label__xx zorp blick frumious galumph"] * 50
                  + ["__label__yy wibble wobble flumph quux"] * 50))
    model = fasttext.train_supervised(
        str(train), epoch=20, dim=16, minCount=1)
    path = tmp_path / "langid.bin"
    model.save_model(str(path))

    df = pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": ["zorp blick galumph", "wibble wobble quux"]})
    out = rd.from_pandas(df).map_batches(
        LangId, fn_constructor_kwargs={"ft_model_path": str(path)},
        batch_format="pandas", concurrency=(1, 2),
    ).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "lang_pred"] == "xx"
    assert out.loc[1, "lang_pred"] == "yy"
    assert (out["stop_ratio"] > 0).all()


def test_perplexity_real_kenlm_model(tmp_path):
    """Runs only where the actual kenlm library exists: load a real
    ARPA through kenlm.Model and check the scorer agrees with the
    hand-computed ARPA math on the engine's log_ppl convention."""
    kenlm = pytest.importorskip("kenlm")  # noqa: F841
    from nacc_form_validator_ray.stages.perplexity import \
        PerplexityScorer

    arpa = tmp_path / "toy.arpa"
    arpa.write_text(
        "\\data\\\n"
        "ngram 1=4\n"
        "\n"
        "\\1-grams:\n"
        "-0.5\tthe\t0.0\n"
        "-1.0\tcat\t0.0\n"
        "-2.0\tsat\t0.0\n"
        "-3.0\t<unk>\t0.0\n"
        "\\end\\\n")
    df = pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": ["the cat sat", "qqqq zzzz"]})
    out = rd.from_pandas(df).map_batches(
        PerplexityScorer,
        fn_constructor_kwargs={"kenlm_path": str(arpa)},
        batch_format="pandas", concurrency=(1, 2),
    ).to_pandas().set_index("doc_id").sort_index()
    ln10 = math.log(10.0)
    assert abs(out.loc[0, "log_ppl"]
               - (-(-0.5 - 1.0 - 2.0) * ln10 / 3)) < 1e-9
    assert out.loc[1, "oov_count"] == 2
