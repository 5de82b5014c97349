"""Vectorized text-signal stages for the web-text quality filter.

Each stage is a ``map_batches`` callable that appends signal columns to a
pandas batch; regexes are compiled once per actor in ``__init__``
(stateful-stage pattern — the analog of the reference compiling its rule
schema once per QualityCheck, quality_check.py:74-95). All hot loops are
pandas/numpy C kernels:

* counting signals use ``Series.str.count`` with compiled regexes;
* n-gram repetition uses factorize + bit-packed rolling keys + bincount —
  no Python loop over rows;
* language ID is stopword-hit counting per language, argmax with a fixed
  deterministic tie order.

Every signal is defined so an ANSI-SQL oracle can recompute it exactly
(same regex dialect, same tie-breaks) — the driver's DuckDB correctness
gate relies on this.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

#: deterministic stopword banks (small on purpose: they are part of the
#: public contract with the SQL oracle, not a model)
STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was",
           "for", "with", "as", "his", "on", "be", "at", "by", "had"],
    "es": ["de", "la", "que", "el", "en", "y", "los", "del", "se", "las",
           "por", "un", "para", "con", "una", "su", "al", "lo"],
    "de": ["der", "die", "und", "den", "von", "zu", "das", "mit", "sich",
           "des", "auf", "ist", "im", "dem", "nicht", "ein", "eine",
           "als"],
    "fr": ["le", "et", "les", "des", "une", "du", "est", "pour", "qui",
           "dans", "par", "plus", "pas", "au", "sur", "ne", "se", "ce"],
    "zh": ["shi", "bu", "wo", "zai", "you", "ta", "zhe", "zhong", "da",
           "lai", "shang", "guo", "dao", "shuo", "men", "ni", "hao",
           "ma"],
}

#: fixed language priority for argmax tie-breaking (first wins on >=)
LANG_ORDER: List[str] = ["en", "es", "de", "fr", "zh"]

#: token regexes shared with the SQL oracle (RE2-compatible: no lookaround)
WORD_RE = r"[A-Za-z]+"
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def stopword_pattern(lang: str) -> str:
    return r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"


class TextStats:
    """Length / composition / repetition signals (C4 + Gopher style).

    Appends: n_chars_sig, n_words, mean_word_len, alpha_ratio,
    digit_ratio, symbol_ratio, bpe_token_count, rep_3gram_ratio.
    """

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.word_re = re.compile(WORD_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.text_column].fillna("")
        n_chars = text.str.len().to_numpy(np.int64)
        n_words = text.str.count(r"\S+").to_numpy(np.int64)
        n_alpha = text.str.count(r"[A-Za-z]").to_numpy(np.int64)
        n_digit = text.str.count(r"[0-9]").to_numpy(np.int64)
        n_space = text.str.count(r"\s").to_numpy(np.int64)
        n_nonspace = n_chars - n_space
        safe_chars = np.maximum(n_chars, 1)
        safe_words = np.maximum(n_words, 1)

        batch = batch.copy()
        batch["n_chars_sig"] = n_chars
        batch["n_words"] = n_words
        batch["mean_word_len"] = n_nonspace / safe_words
        batch["alpha_ratio"] = n_alpha / safe_chars
        batch["digit_ratio"] = n_digit / safe_chars
        batch["symbol_ratio"] = \
            (n_chars - n_alpha - n_digit - n_space) / safe_chars
        batch["bpe_token_count"] = \
            text.str.count(BPE_TOKEN_RE).to_numpy(np.int64)
        total, distinct = self._rep_3gram_counts(text)
        has = total > 0
        ratio = np.zeros(len(text), dtype=np.float64)
        ratio[has] = 1.0 - distinct[has] / total[has]
        batch["rep_3gram_total"] = total
        batch["rep_3gram_distinct"] = distinct
        batch["rep_3gram_ratio"] = ratio
        return batch

    def _rep_3gram_counts(self, text: pd.Series):
        """(total 3-grams, distinct 3-grams) per doc — integer-exact, so
        the SQL oracle can reproduce them bit-for-bit."""
        n = len(text)
        total = np.zeros(n, dtype=np.int64)
        distinct = np.zeros(n, dtype=np.int64)
        token_lists = text.str.lower().str.findall(self.word_re)
        lens = token_lists.str.len().to_numpy(np.int64)
        if lens.sum() == 0:
            return total, distinct
        flat = np.concatenate(
            [np.asarray(t, dtype=object) if t else
             np.empty(0, dtype=object) for t in token_lists])
        codes, uniques = pd.factorize(pd.Series(flat, dtype=object))
        doc_id = np.repeat(np.arange(n, dtype=np.int64), lens)
        m = len(codes)
        if m < 3 or len(uniques) >= (1 << 21):
            if len(uniques) >= (1 << 21):
                raise ValueError("batch vocabulary too large for 3-gram "
                                 "packing; lower batch_size")
            return total, distinct
        c0 = codes[:-2].astype(np.int64)
        c1 = codes[1:-1].astype(np.int64)
        c2 = codes[2:].astype(np.int64)
        same_doc = doc_id[:-2] == doc_id[2:]
        keys = (c0 << 42) | (c1 << 21) | c2
        g_doc = doc_id[:-2][same_doc]
        g_key = keys[same_doc]
        total = np.bincount(g_doc, minlength=n)
        uniq_pairs = np.unique(np.stack([g_doc, g_key], axis=1), axis=0)
        distinct = np.bincount(uniq_pairs[:, 0], minlength=n)
        return total.astype(np.int64), distinct.astype(np.int64)


class LangId:
    """Stopword-bank language identifier.

    Appends: ``lang_pred`` (argmax of per-language stopword hits over the
    fixed LANG_ORDER; 'und' when no bank scores > 0) and ``stop_ratio``
    (winning bank's hits / n_words). The production analog is a fastText
    model in the same actor-pool shape — swap ``__call__``'s scorer, keep
    the plumbing.
    """

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.patterns = {lang: stopword_pattern(lang)
                         for lang in LANG_ORDER}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.text_column].fillna("").str.lower()
        n = len(batch)
        counts = np.zeros((len(LANG_ORDER), n), dtype=np.int64)
        for i, lang in enumerate(LANG_ORDER):
            counts[i] = text.str.count(self.patterns[lang]) \
                .to_numpy(np.int64)
        best_idx = counts.argmax(axis=0)  # first max wins = LANG_ORDER
        best = counts.max(axis=0)
        pred = np.array(LANG_ORDER, dtype=object)[best_idx]
        pred[best == 0] = "und"
        n_words = batch["n_words"].to_numpy(np.int64) if "n_words" in batch \
            else text.str.count(r"\S+").to_numpy(np.int64)
        batch = batch.copy()
        for i, lang in enumerate(LANG_ORDER):
            batch[f"sw_{lang}"] = counts[i]
        batch["lang_pred"] = pred
        batch["stop_ratio"] = best / np.maximum(n_words, 1)
        return batch


class Fingerprint:
    """Document fingerprints.

    * ``fingerprint_md5`` — md5 hex of whitespace-normalized lowercased
      text (exact-dup key; identical to DuckDB
      ``md5(lower(regexp_replace(text,'\\s+',' ','g')))``).
    * ``fingerprint_winnow`` — min rolling-5-gram hash (winnowing-style
      content fingerprint; no SQL analog, rows-only check).
    """

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.norm_re = re.compile(r"\s+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import hashlib
        text = batch[self.text_column].fillna("")
        norm = text.str.replace(self.norm_re, " ", regex=True) \
            .str.strip().str.lower()
        batch = batch.copy()
        batch["fingerprint_md5"] = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm]
        # winnow: min 64-bit hash over character 5-grams
        winnow = np.zeros(len(batch), dtype=np.uint64)
        for i, t in enumerate(norm):
            if len(t) < 5:
                winnow[i] = np.uint64(
                    int.from_bytes(
                        hashlib.md5(t.encode()).digest()[:8], "big"))
                continue
            arr = np.frombuffer(t.encode("utf-8", "ignore"),
                                dtype=np.uint8)
            h = (arr[:-4].astype(np.uint64) * np.uint64(2654435761) ^
                 arr[1:-3].astype(np.uint64) * np.uint64(40503) ^
                 arr[2:-2].astype(np.uint64) * np.uint64(69069) ^
                 arr[3:-1].astype(np.uint64) * np.uint64(123457) ^
                 arr[4:].astype(np.uint64))
            winnow[i] = h.min()
        batch["fingerprint_winnow"] = winnow
        return batch
