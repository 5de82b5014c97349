"""Web-corpus cleaning operators: C4-style heuristic line/document
filtering and URL canonicalization.

Both operators are pure ``map_batches`` stages over zero-copy Arrow
batches — no exchange is needed for the line filter (every rule is
document-local), and URL dedup rides ONE hash exchange on the
normalized key. All regexes are RE2-class (no lookaround) and are the
SAME regex engine DuckDB uses, so the SQL twins in
``pipelines/queries.py`` reproduce the byte-exact outputs.

Reference anchor: the C4 heuristics (terminal punctuation, >=5-word
lines, "javascript" line drop, lorem-ipsum / curly-brace document
drop) follow the published C4 cleaning recipe (Raffel et al., 2020);
the keep/drop decision surface mirrors the reference validator's
rule-vector semantics (reference: nacc_form_validator/quality_check.py
error-vector shape) recast as line-level web rules.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

#: ordered URL-normalization regex chain, applied to the FULL url first
#: (fragment strip, utm-param removal, separator repair, slash trims).
#: Each entry is (pattern, replacement); replacements are global. The
#: DuckDB twin applies the identical chain via regexp_replace(..., 'g').
URL_RULES: List[Tuple[str, str]] = [
    (r"#.*$", ""),            # fragment
    (r"utm_[^&#]*&", ""),     # utm_ param followed by another param
    (r"[?&]utm_[^&#]*$", ""),  # utm_ param in final position
    (r"/\?", "?"),            # trailing path slash before a query
    (r"/$", ""),              # trailing slash
]

#: host part: lowercase, strip leading www., strip default ports
HOST_RULES: List[Tuple[str, str]] = [
    (r"^www\.", ""),
    (r":(443|80)$", ""),
]

_URL_SPLIT = r"^(?i:https?)://(?P<hostport>[^/?#]+)(?P<rest>.*)$"


def c4_line_filter(ds, id_column: str = "doc_id",
                   text_column: str = "text",
                   min_words: int = 5, min_kept_lines: int = 3,
                   passthrough=()):
    """C4-style heuristic cleaning: keep a line iff it has >=
    ``min_words`` whitespace-delimited words AND ends in terminal
    punctuation (``. ! ? "``) AND does not mention "javascript"
    (case-insensitive); drop the whole document iff fewer than
    ``min_kept_lines`` lines survive OR the raw text contains
    "lorem ipsum" (case-insensitive) or a ``{``.

    Output per document: id, ``n_lines``, ``n_kept``, ``keep`` flag and
    the cleaned ``text`` (kept lines rejoined with '\\n', computed for
    dropped documents too so downstream stages can audit the cut).

    Scale shape: document-local rules only — a single map_batches pass,
    no exchange; line masks are RE2 kernel calls over the flat line
    array and reassembly is the packed-buffer gather shared with
    ``line_dedup``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from nacc_form_validator_ray.stages.dedup import (_split_lines_arrow,
                                                      reassemble_lines)

    def run(batch: "pa.Table") -> "pa.Table":
        text = batch[text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = batch.num_rows
        flat, counts, line_doc = _split_lines_arrow(text)
        n_words = pc.count_substring_regex(flat, r"\S+").to_numpy() \
            .astype(np.int64, copy=False)
        punct = pc.match_substring_regex(flat, r'[.!?"]$').to_numpy(
            zero_copy_only=False)
        js = pc.match_substring(pc.utf8_lower(flat),
                                "javascript").to_numpy(
            zero_copy_only=False)
        kept = (n_words >= min_words) & punct & ~js
        new_text, kept_per_doc = reassemble_lines(flat, line_doc, kept, n)
        lorem = pc.match_substring(pc.utf8_lower(text),
                                   "lorem ipsum").to_numpy(
            zero_copy_only=False)
        brace = pc.match_substring(text, "{").to_numpy(
            zero_copy_only=False)
        keep = (kept_per_doc >= min_kept_lines) & ~lorem & ~brace
        out = pa.table({
            id_column: batch[id_column],
            "n_lines": pa.array(counts),
            "n_kept": pa.array(kept_per_doc),
            "keep": pa.array(keep),
            text_column: new_text,
        })
        # carry extra columns through so downstream stages need no
        # re-join to recover them
        for col in passthrough:
            out = out.append_column(col, batch[col])
        return out

    return ds.map_batches(run, batch_format="pyarrow", batch_size=4096)


def _normalize_url_array(url, pc):
    """Apply the normalization chain to an Arrow string array; returns
    the canonical form ``https://<host><rest>``. Inputs without an
    http(s) scheme get host '' and an unchanged rest — exactly what
    the SQL twin's regexp_extract/regexp_replace produce on no-match,
    so garbage rows agree byte-for-byte instead of diverging to null."""
    import pyarrow as pa
    u = pc.fill_null(url, "")
    for pat, rep in URL_RULES:
        u = pc.replace_substring_regex(u, pat, rep)
    parts = pc.extract_regex(u, _URL_SPLIT)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    host = pc.utf8_lower(pc.fill_null(
        pc.struct_field(parts, "hostport"), ""))
    for pat, rep in HOST_RULES:
        host = pc.replace_substring_regex(host, pat, rep)
    # no-match rows keep the whole (rule-chained) url as their rest
    rest = pc.if_else(pc.is_valid(parts),
                      pc.fill_null(pc.struct_field(parts, "rest"), ""),
                      u)
    return pc.binary_join_element_wise(
        pa.array(["https://"] * len(u)), host, rest, "")


def normalize_urls(ds, id_column: str = "doc_id",
                   url_column: str = "url", num_partitions: int = 32):
    """URL canonicalization + duplicate-URL resolution: strip fragment,
    utm_* tracking params and trailing slashes, lowercase the host,
    drop a leading ``www.`` and default ports, coerce the scheme to
    https — then mark, per canonical URL, the row with the smallest id
    as ``is_canonical`` (the representative a recrawl dedup would keep).

    Scale shape: the normalization itself is a document-local Arrow
    RE2 pass; canonical-representative election is ONE hash exchange on
    ``norm_url`` (grouped min broadcast back within the partition).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from nacc_form_validator_ray.stages.partition import grouped_apply

    def add_norm(batch: "pa.Table") -> "pa.Table":
        url = batch[url_column]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        return batch.append_column("norm_url",
                                   _normalize_url_array(url, pc))

    ds = ds.map_batches(add_norm, batch_format="pyarrow",
                        batch_size=4096)

    def elect(part: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc2
        gb = pa.TableGroupBy(part.select(["norm_url", id_column]),
                             ["norm_url"]).aggregate([(id_column, "min")])
        joined = part.join(gb, keys=["norm_url"])
        flag = pc2.equal(joined[id_column],
                         joined[f"{id_column}_min"])
        return joined.select(
            [id_column, url_column, "norm_url"]).append_column(
            "is_canonical", flag)

    return grouped_apply(ds, ["norm_url"], elect,
                         num_partitions=num_partitions,
                         fn_format="pyarrow")


#: default URL blocklist rules (RE2, applied to the lowercased url) —
#: the adult/spam/tracker URL-keyword filtering stage of CC pipelines.
#: Ordered: the FIRST matching rule is reported.
URL_BLOCKLIST = [
    ("adult", r"(xxx|porn|adult)"),
    ("gambling", r"(casino|poker|betting)"),
    ("tracker", r"[?&](click_?id|affiliate)="),
    ("shortener", r"^https?://(bit\.ly|t\.co|tinyurl\.com)/"),
]


def url_blocklist_filter(ds, url_column: str = "url",
                         rules=None):
    """Flag documents whose URL matches a blocklist rule: adds
    ``blocked`` (bool) and ``block_rule`` (first matching rule name,
    '' when clean). Rules are (name, RE2-pattern) pairs evaluated on
    the lowercased URL in order.

    Scale shape: map-only; the rule list is broadcast-sized and each
    rule is ONE vectorized Arrow RE2 kernel call per batch — no
    per-row Python. The SQL twin runs the identical patterns through
    DuckDB's RE2, so flags match byte-for-byte.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    ruleset = list(rules) if rules is not None else list(URL_BLOCKLIST)

    def run(batch: "pa.Table") -> "pa.Table":
        url = batch[url_column]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        low = pc.utf8_lower(pc.fill_null(url, ""))
        n = len(low)
        blocked = np.zeros(n, dtype=bool)
        rule = np.full(n, "", dtype=object)
        for name, pat in ruleset:
            m = pc.match_substring_regex(low, pat).to_numpy(
                zero_copy_only=False)
            newly = m & ~blocked
            rule[newly] = name
            blocked |= m
        return batch.append_column(
            "blocked", pa.array(blocked)).append_column(
            "block_rule", pa.array(rule, pa.string()))

    return ds.map_batches(run, batch_format="pyarrow")


def normalize_text(ds, id_column: str = "doc_id",
                   text_column: str = "text"):
    """Canonical text normalization for dedup/matching keys: Unicode
    NFC composition, full case-folding via ``utf8_lower``, whitespace
    runs collapsed to one space, edges trimmed. Adds ``norm_text`` and
    its character count ``norm_chars``.

    Map-only Arrow pass with an ASCII fast path: pure-ASCII strings
    (detected zero-copy: utf8 char count == byte count) are NFC-
    invariant, so ``unicodedata.normalize`` runs only on the non-ASCII
    minority (pyarrow's ``utf8_normalize`` does NOT compose — NFC of a
    decomposed string comes back unchanged in Arrow 16, so it cannot
    match DuckDB). The DuckDB twin chains ``nfc_normalize -> lower ->
    regexp_replace('\\s+',' ','g') -> trim`` — NFC (not NFKC) because
    DuckDB exposes only NFC, and both regex engines are RE2 so the
    collapse is byte-identical.
    """
    import unicodedata

    import pyarrow as pa
    import pyarrow.compute as pc

    def run(batch: "pa.Table") -> "pa.Table":
        text = batch[text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        s = pc.fill_null(text, "")
        non_ascii = pc.not_equal(pc.utf8_length(s),
                                 pc.binary_length(s))
        if pc.any(non_ascii).as_py():
            idx = np.flatnonzero(
                non_ascii.to_numpy(zero_copy_only=False))
            fixed = pa.array(
                [unicodedata.normalize("NFC", s[int(i)].as_py())
                 for i in idx], pa.string())
            np_s = s.to_numpy(zero_copy_only=False).copy()
            np_s[idx] = fixed.to_numpy(zero_copy_only=False)
            s = pa.array(np_s, pa.string())
        s = pc.utf8_lower(s)
        s = pc.replace_substring_regex(s, r"\s+", " ")
        s = pc.utf8_trim(s, " ")
        return pa.table({
            id_column: batch[id_column],
            "norm_text": s,
            "norm_chars": pc.utf8_length(s).cast(pa.int64()),
        })

    return ds.map_batches(run, batch_format="pyarrow")


#: html entity decode chain, applied AFTER tag removal; '&amp;' is
#: decoded last (standard order — else '&amp;lt;' would double-decode)
_HTML_ENTITIES = (("&nbsp;", " "), ("&quot;", '"'), ("&#39;", "'"),
                  ("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&"))

#: script/style bodies + comments in ONE RE2 alternation (no
#: backreferences in RE2, hence the spelled-out pair); shared verbatim
#: with the DuckDB twin
_HTML_BLOCK_RE = (r"(?is)<script[^>]*>.*?</script>"
                  r"|<style[^>]*>.*?</style>"
                  r"|<!--.*?-->")


def strip_html_arrow(arr):
    """Generic HTML -> text extraction entirely in Arrow RE2 kernels
    (the engine-agnostic counterpart of the webgen envelope stripper:
    no fixture knowledge, works on arbitrary markup). Steps, each
    mirrored verbatim by the DuckDB twin's regexp_replace chain (same
    RE2 engine, same patterns — RE2 has no backreferences, so script
    and style blocks are two separate non-greedy (?is) patterns):

    1. drop <script>/<style> blocks and <!-- comments --> (ONE fused
       alternation pass — measured 4.5 s -> fewer full-buffer scans
       over the 120k-page bench corpus vs three separate passes)
    2. every remaining tag -> ' '
    3. decode the six common entities (&amp; last)
    4. collapse whitespace, trim

    Accepts a binary or string array; binary casts through utf-8
    validation. Nulls extract as ''.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.string())
    t = pc.fill_null(arr, "")
    # every replace pass rebuilds the batch's full utf-8 buffer, so
    # passes are gated on a cheap find-only scan: markup without
    # scripts/comments skips the block pass, text without '&' skips
    # all six entity passes (identical output — a skipped pass would
    # have replaced nothing)
    if pc.any(pc.match_substring_regex(
            t, r"(?i)<script|<style|<!--")).as_py():
        t = pc.replace_substring_regex(t, _HTML_BLOCK_RE, " ")
    t = pc.replace_substring_regex(t, r"(?s)<[^>]*>", " ")
    if pc.any(pc.match_substring(t, "&")).as_py():
        for ent, rep in _HTML_ENTITIES:
            t = pc.replace_substring(t, ent, rep)
    # whitespace collapse via split+join (pure C++ kernels, measured
    # 4x faster than the RE2 '\s+' replace on prose where nearly every
    # word boundary is a match). ascii_split_whitespace's separator
    # set is [\t\n\v\f\r ]; the twin collapses the IDENTICAL explicit
    # class (RE2's \s excludes \v, so the twin must not use \s).
    # Leading/trailing runs become one empty token -> one edge space
    # after the join -> gone after the trim.
    t = pc.binary_join(pc.ascii_split_whitespace(t), " ")
    return pc.utf8_trim(t, " ")


class HtmlStrip:
    """map_batches stage: ``html`` (binary/string) -> generic extracted
    ``text`` + ``n_chars``. Stateless Arrow-kernel work — the actor
    shape exists so a swapped-in REAL extractor (trafilatura etc.) can
    hold its model/config per actor, same seam contract as
    pipelines.quality_filter.ExtractText."""

    def __init__(self, html_column: str = "html",
                 text_column: str = "text"):
        self.html_column = html_column
        self.text_column = text_column

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc
        text = strip_html_arrow(batch[self.html_column])
        out = batch.drop_columns([self.html_column])
        out = out.append_column(self.text_column, text)
        return out.append_column(
            "n_chars", pc.utf8_length(text).cast(pa.int64()))
