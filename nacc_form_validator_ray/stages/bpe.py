"""Distributed BPE tokenizer training (Sennrich et al., 2016: "Neural
Machine Translation of Rare Words with Subword Units").

The corpus-scale work — counting word types — is ONE distributed
exchange of per-batch token-count partials. The merge loop then runs on
the word-FREQUENCY table, which is vocabulary-bounded (the same bounded
side this engine already pulls for the unigram perplexity model and the
PMI vocabulary): every real-world BPE trainer performs the merge loop
on the word-count dictionary, not the raw corpus, so this is the honest
100-TB shape — the corpus is streamed exactly once.

Exactness contract with the DuckDB twin: word sequences are encoded as
dot-prefixed symbol strings (``the`` -> ``.t.h.e``) so that a pair
(a, b) is the literal substring ``.a.b`` and merging is a plain
non-overlapping left-to-right ``replace`` — identical semantics in
pyarrow ``replace_substring``, Python ``str.replace`` and DuckDB
``replace``. Pair selection is (count DESC, pattern ASC) — byte-wise
string order on both sides. No end-of-word marker (documented
simplification; adding one is a representation change on both sides).
"""

from __future__ import annotations

import numpy as np

def word_counts(ds, text_column: str = "text",
                num_partitions: int = 32):
    """Distributed word-type frequency table: per-batch token count
    partials (dictionary codes + bincount, no Python loop) merged by
    ONE grouped-sum exchange. Returns a Dataset of (word, cnt)."""
    import pyarrow as pa

    from nacc_form_validator_ray.stages.partition import grouped_agg_sum
    from nacc_form_validator_ray.stages.text_signals import \
        arrow_token_codes

    def partials(batch: "pa.Table") -> "pa.Table":
        text = batch[text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        codes, dictionary, _, _ = arrow_token_codes(text)
        if dictionary is None:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        c = np.bincount(codes, minlength=len(dictionary))
        return pa.table({"word": dictionary,
                         "cnt": pa.array(c.astype(np.int64))})

    return grouped_agg_sum(ds.map_batches(partials,
                                          batch_format="pyarrow"),
                           ["word"], ["cnt"],
                           num_partitions=num_partitions)


def _pair_stats(seqs, cnt: np.ndarray):
    """(pat, c) arrays of adjacent-symbol pairs over all dotted
    sequences, count-weighted — vectorized via one flat split.
    ``pat`` is the literal merge pattern ``.a.b``."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    parts = pc.split_pattern(seqs, ".")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    lens = pc.list_value_length(parts).to_numpy() \
        .astype(np.int64, copy=False)
    flat = pc.list_flatten(parts)
    n = len(flat)
    if n == 0:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    owner = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    # element i pairs with i+1 when both belong to the same word and
    # neither is the leading empty element (position 0 of each word)
    idx = np.arange(n - 1, dtype=np.int64)
    valid = (owner[:-1] == owner[1:]) & (idx != starts[owner[:-1]])
    idx = idx[valid]
    left = flat.take(pa.array(idx))
    right = flat.take(pa.array(idx + 1))
    # join(['', left, right], sep='.') -> '.<left>.<right>'
    empty = pa.array(np.full(len(idx), "", dtype=object), pa.string())
    pat = pc.binary_join_element_wise(empty, left, right, ".")
    w = cnt[owner[:-1][valid]]
    codes, uniques = pd.factorize(pat.to_numpy(zero_copy_only=False))
    csum = np.bincount(codes, weights=w).astype(np.int64)
    pats = np.asarray(uniques, dtype=object)
    return pats, csum


def bpe_merges(ds, text_column: str = "text", n_merges: int = 10,
               num_partitions: int = 32):
    """Learn ``n_merges`` BPE merge rules over the corpus.

    Returns a Dataset with ``rank`` (1-based merge order), ``pair``
    (the dotted pattern ``.a.b``), ``merged`` (``.ab``) and ``c`` (the
    weighted pair count at selection time).

    Scale shape: one corpus exchange (word counts); the merge loop runs
    driver-side on the vocabulary-bounded frequency table with
    vectorized pair counting (factorize + bincount) and Arrow
    ``replace_substring`` merges — the same bounded-state pattern as
    the perplexity unigram model and k-means centroids.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    vocab = word_counts(ds, text_column=text_column,
                        num_partitions=num_partitions)
    words, cnts = [], []
    for b in vocab.iter_batches(batch_format="pyarrow",
                                batch_size=65536):
        words.append(b["word"].combine_chunks()
                     if isinstance(b["word"], pa.ChunkedArray)
                     else b["word"])
        cnts.append(b["cnt"].to_numpy(zero_copy_only=False))
    if not words:
        return rd.from_arrow(pa.table({
            "rank": pa.array([], pa.int64()),
            "pair": pa.array([], pa.string()),
            "merged": pa.array([], pa.string()),
            "c": pa.array([], pa.int64())}))
    wordarr = pa.concat_arrays(words)
    cnt = np.concatenate(cnts).astype(np.int64)
    # '.t.h.e' encoding: prefix every character with a dot
    seqs = pc.replace_substring_regex(wordarr, "(.)", r".\1")

    out_rank, out_pair, out_merged, out_c = [], [], [], []
    for k in range(1, n_merges + 1):
        pats, csum = _pair_stats(seqs, cnt)
        if not len(pats):
            break
        best = np.lexsort((pats.astype("U"), -csum))[0]
        pat = str(pats[best])
        rep = "." + pat[1:].replace(".", "", 1)  # '.a.b' -> '.ab'
        out_rank.append(k)
        out_pair.append(pat)
        out_merged.append(rep)
        out_c.append(int(csum[best]))
        seqs = pc.replace_substring(seqs, pat, rep)
    return rd.from_arrow(pa.table({
        "rank": pa.array(np.array(out_rank, dtype=np.int64)),
        "pair": pa.array(out_pair, pa.string()),
        "merged": pa.array(out_merged, pa.string()),
        "c": pa.array(np.array(out_c, dtype=np.int64)),
    }))


def bpe_encode(ds, merges, id_column: str = "doc_id",
               text_column: str = "text"):
    """Apply learned BPE merges to the corpus and report per-document
    subword statistics: ``n_words`` ([a-z]+ tokens), ``n_chars``
    (alphabetic characters) and ``n_subwords`` (symbols after applying
    ``merges`` in rank order).

    ``merges`` is the (pair, merged) list from :func:`bpe_merges`
    (broadcast-sized: one small list). Scale shape: map-only — merges
    are applied to each batch's word DICTIONARY (unique words), not to
    every token occurrence, so the replace cost is vocabulary-bounded
    per batch; per-token subword counts are gathered by dictionary code
    and summed per document with one bincount.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from nacc_form_validator_ray.stages.text_signals import \
        arrow_token_codes

    rules = [(str(p), str(r)) for p, r in merges]

    def encode(batch: "pa.Table") -> "pa.Table":
        text = batch[text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = batch.num_rows
        codes, dictionary, tok_doc, n_tokens = arrow_token_codes(text)
        if dictionary is None:
            z = pa.array(np.zeros(n, dtype=np.int64))
            return pa.table({id_column: batch[id_column],
                             "n_words": z, "n_chars": z,
                             "n_subwords": z})
        seq = pc.replace_substring_regex(dictionary, "(.)", r".\1")
        for pat, rep in rules:
            seq = pc.replace_substring(seq, pat, rep)
        sub_per_word = pc.count_substring(seq, ".").to_numpy() \
            .astype(np.int64, copy=False)
        chars_per_word = pc.utf8_length(dictionary).to_numpy() \
            .astype(np.int64, copy=False)
        n_sub = np.bincount(tok_doc, weights=sub_per_word[codes],
                            minlength=n).astype(np.int64)
        n_chr = np.bincount(tok_doc, weights=chars_per_word[codes],
                            minlength=n).astype(np.int64)
        return pa.table({
            id_column: batch[id_column],
            "n_words": pa.array(n_tokens.astype(np.int64)),
            "n_chars": pa.array(n_chr),
            "n_subwords": pa.array(n_sub),
        })

    return ds.map_batches(encode, batch_format="pyarrow")
