"""Deterministic synthetic Common-Crawl-style page table (FIXTURES.md F7).

Schema per BASELINE.json input_hint: ``url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string``.

Properties engineered for the pipeline under test:

* every value derives from ``(seed, doc_index)`` only — byte-identical
  text per url across runs, processes, and parallelism levels (the
  per-row invariant the driver checks);
* Zipfian host distribution (host-level skew for the salted groupby);
* controlled doc-length / symbol-ratio / 3-gram-repetition mixtures with
  known keep/drop labels for the heuristic rules;
* seeded PII (emails, phones, SSNs) for the scrubber;
* a fraction of near-duplicate documents (suffix-mutated copies of an
  earlier doc) for MinHash/exact dedup.

Generation is itself a Ray pipeline: ``ray.data.range(n)`` →
``map_batches(PageGenerator)`` — no driver-side loop, scales to any n.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Dict, Optional

import numpy as np
import pandas as pd

from nacc_form_validator_ray.stages.text_signals import STOPWORDS

#: content-word pools per language (deterministic, disjoint-ish)
_CONTENT = {
    "en": ["data", "market", "system", "report", "world", "science",
           "music", "house", "water", "light", "story", "engine",
           "model", "garden", "river", "street", "paper", "window"],
    "es": ["datos", "mercado", "sistema", "informe", "mundo", "ciencia",
           "musica", "casa", "agua", "luz", "historia", "motor"],
    "de": ["daten", "markt", "system", "bericht", "welt", "wissenschaft",
           "musik", "haus", "wasser", "licht", "geschichte", "motor"],
    "fr": ["donnees", "marche", "systeme", "rapport", "monde", "science",
           "musique", "maison", "eau", "lumiere", "histoire", "moteur"],
    "zh": ["shuju", "shichang", "xitong", "baogao", "shijie", "kexue",
           "yinyue", "fangzi", "shui", "guang", "gushi", "yinqing"],
}
_LANGS = list(_CONTENT)

HTML_PREFIX = b"<html><head><title>page</title></head><body><p>"
HTML_SUFFIX = b"</p></body></html>"


def extract_text(html: bytes) -> str:
    """Deterministic text extraction from the synthetic HTML envelope.

    Byte-identity contract: ``extract_text(html) == text`` for every
    generated page — the stand-in for a real HTML boilerplate stripper
    (which this container cannot host)."""
    body = html[len(HTML_PREFIX):-len(HTML_SUFFIX)]
    return body.decode("utf-8")


class PageGenerator:
    """map_batches callable over ``ray.data.range``: id -> page row."""

    def __init__(self, seed: int = 42, n_hosts: int = 1000,
                 dup_fraction: float = 0.1):
        self.seed = seed
        self.n_hosts = n_hosts
        self.dup_fraction = dup_fraction
        self.base_ts = datetime(2025, 1, 1)

    def _gen_text(self, rng: np.random.RandomState, lang: str,
                  quality_roll: float) -> str:
        sw = STOPWORDS[lang]
        content = _CONTENT[lang]
        if quality_roll < 0.08:
            n_words = int(rng.randint(3, 40))        # too short -> drop
        elif quality_roll < 0.12:
            n_words = int(rng.randint(2000, 4000))   # too long -> drop
        else:
            n_words = int(rng.randint(60, 400))
        words = []
        for _ in range(n_words):
            if rng.rand() < 0.42:
                words.append(sw[rng.randint(len(sw))])
            else:
                words.append(content[rng.randint(len(content))])
        if 0.12 <= quality_roll < 0.17:
            # heavy 3-gram repetition -> drop
            tri = words[:3] if len(words) >= 3 else ["a", "b", "c"]
            words = tri * max(n_words // 3, 20)
        text = " ".join(words)
        if 0.17 <= quality_roll < 0.22:
            # symbol spam -> drop
            text = text + " " + ("@#$%^&*" * max(len(text) // 24, 8))
        if rng.rand() < 0.15:
            text += f" contact user{rng.randint(10_000)}@example.com"
        if rng.rand() < 0.08:
            text += (f" call {rng.randint(100, 999)}-"
                     f"{rng.randint(100, 999)}-{rng.randint(1000, 9999)}")
        if rng.rand() < 0.03:
            text += (f" ssn {rng.randint(100, 999)}-"
                     f"{rng.randint(10, 99)}-{rng.randint(1000, 9999)}")
        return text

    def _doc(self, doc_id: int) -> Dict:
        rng = np.random.RandomState(self.seed * 1_000_003 + doc_id)
        # Zipf host skew, clipped to the host universe
        host_rank = min(int(rng.zipf(1.3)), self.n_hosts) - 1
        host = f"host{host_rank}.example.org"
        lang = _LANGS[int(rng.randint(len(_LANGS)))] \
            if rng.rand() > 0.6 else "en"
        quality_roll = float(rng.rand())
        if doc_id > 10 and rng.rand() < self.dup_fraction:
            # near-duplicate of an earlier doc: same text + tiny suffix
            src = int(rng.randint(max(doc_id - 1000, 0), doc_id))
            src_rng = np.random.RandomState(self.seed * 1_000_003 + src)
            _ = src_rng.zipf(1.3)
            src_lang = _LANGS[int(src_rng.randint(len(_LANGS)))] \
                if src_rng.rand() > 0.6 else "en"
            src_roll = float(src_rng.rand())
            text = self._gen_text(src_rng, src_lang, src_roll)
            if rng.rand() < 0.5:
                text = text + " extra"
            lang = src_lang
        else:
            text = self._gen_text(rng, lang, quality_roll)
        ts = self.base_ts + timedelta(seconds=int(doc_id) % 31_536_000)
        return {
            "url": f"https://{host}/doc/{doc_id}",
            "warc_ts": ts,
            "html": HTML_PREFIX + text.encode("utf-8") + HTML_SUFFIX,
            "text": text,
            "lang": lang,
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        return pd.DataFrame([self._doc(int(i)) for i in ids])


def generate_pages(n_docs: int, seed: int = 42, n_hosts: int = 1000,
                   parallelism: Optional[int] = None,
                   dup_fraction: float = 0.1):
    """Build the page Dataset via distributed generation."""
    import ray.data as rd
    ds = rd.range(n_docs, override_num_blocks=parallelism)
    return ds.map_batches(PageGenerator(seed=seed, n_hosts=n_hosts,
                                        dup_fraction=dup_fraction),
                          batch_format="pandas", batch_size=2048)


#: boilerplate lines seeded into linked pages (C4-style line-filter prey)
_BOILERPLATE = ["all rights reserved", "privacy policy and terms",
                "subscribe to our newsletter"]
_TERMINAL = [".", "!", "?"]


class LinkedPageGenerator:
    """Deterministic messy-web fixture (FIXTURES.md F8): multi-line text
    with C4-filterable structure, denormalized URLs (casing, www, default
    ports, utm params, fragments, trailing slashes) and an outbound
    ``links`` list column for host-graph algorithms.

    Every value derives from ``(seed, doc_id)`` only — byte-identical
    across runs and parallelism levels, so the Ray operators and their
    DuckDB twins read identical rows from the cached parquet."""

    def __init__(self, n_docs: int, seed: int = 42, n_hosts: int = 200):
        self.n_docs = n_docs
        self.seed = seed
        self.n_hosts = n_hosts

    def _url(self, rng: np.random.RandomState, doc_id: int) -> str:
        host_rank = min(int(rng.zipf(1.3)), self.n_hosts) - 1
        base = f"host{host_rank}.example.org"
        v = int(rng.randint(4))
        host = [base, base.upper(), "www." + base,
                ("www." + base).upper()][v]
        scheme = "http" if rng.rand() < 0.3 else "https"
        port = ""
        if rng.rand() < 0.2:
            port = ":443" if scheme == "https" else ":80"
        # 25% reuse an earlier path -> genuine canonical-url collisions
        path_doc = doc_id
        if rng.rand() < 0.25 and doc_id > 0:
            path_doc = int(rng.randint(0, max(1, int(doc_id * 0.8) + 1)))
        path = f"/doc/{path_doc}"
        # ~10% carry a URL-blocklist-matching path segment (adult /
        # gambling keywords) so url_blocklist_filter has real prey
        if rng.rand() < 0.10:
            path += ["/casino", "/xxx-gallery", "/poker",
                     "/adult-videos"][int(rng.randint(4))]
        if rng.rand() < 0.3:
            path += "/"
        q = float(rng.rand())
        if q < 0.15:
            query = f"?utm_source=feed{rng.randint(5)}"
        elif q < 0.25:
            query = f"?id={rng.randint(50)}&utm_campaign=c{rng.randint(5)}"
        elif q < 0.35:
            query = f"?utm_medium=m{rng.randint(5)}&id={rng.randint(50)}"
        elif q < 0.45:
            query = f"?id={rng.randint(50)}"
        else:
            query = ""
        frag = f"#sec{rng.randint(9)}" if rng.rand() < 0.2 else ""
        return f"{scheme}://{host}{port}{path}{query}{frag}"

    def _text(self, rng: np.random.RandomState) -> str:
        pool = _CONTENT["en"] + STOPWORDS["en"]
        lines = []
        for _ in range(int(rng.randint(3, 13))):
            r = float(rng.rand())
            if r < 0.08:
                lines.append("enable javascript to view this site")
                continue
            if r < 0.14:
                lines.append(_BOILERPLATE[int(rng.randint(
                    len(_BOILERPLATE)))])
                continue
            n_words = int(rng.randint(2, 16))
            words = [pool[int(rng.randint(len(pool)))]
                     for _ in range(n_words)]
            line = " ".join(words)
            if rng.rand() < 0.6:
                line += _TERMINAL[int(rng.randint(len(_TERMINAL)))]
            lines.append(line)
        if rng.rand() < 0.07:
            lines.insert(int(rng.randint(len(lines) + 1)),
                         "lorem ipsum dolor sit amet.")
        if rng.rand() < 0.07:
            lines.append("function f() { return 1; }")
        return "\n".join(lines)

    def _links(self, rng: np.random.RandomState) -> list:
        out = []
        for _ in range(int(rng.randint(0, 7))):
            tr = min(int(rng.zipf(1.3)), self.n_hosts) - 1
            td = int(rng.randint(0, self.n_docs))
            out.append(f"https://host{tr}.example.org/doc/{td}")
        return out

    def _doc(self, doc_id: int) -> Dict:
        rng = np.random.RandomState(
            self.seed * 1_000_003 + doc_id + 7_777_777)
        return {
            "doc_id": doc_id,
            "url": self._url(rng, doc_id),
            "text": self._text(rng),
            "links": self._links(rng),
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        return pd.DataFrame([self._doc(int(i)) for i in ids])


def generate_linked_pages(n_docs: int, seed: int = 42,
                          n_hosts: int = 200,
                          parallelism: Optional[int] = None):
    """Build the linked-page Dataset via distributed generation."""
    import ray.data as rd
    ds = rd.range(n_docs, override_num_blocks=parallelism)
    return ds.map_batches(
        LinkedPageGenerator(n_docs=n_docs, seed=seed, n_hosts=n_hosts),
        batch_format="pandas", batch_size=2048)


def ensure_linked_pages_parquet(
        n_docs: int, seed: int = 42,
        cache_dir: str = "/tmp/nacc_pages_cache") -> str:
    """Cache the deterministic linked-page table (same atomic-write
    contract as ``ensure_pages_parquet``)."""
    import os
    import tempfile
    path = os.path.join(cache_dir, f"linkpages_n{n_docs}_s{seed}_v2.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(cache_dir, exist_ok=True)
    gen = LinkedPageGenerator(n_docs=n_docs, seed=seed)
    df = pd.DataFrame([gen._doc(i) for i in range(n_docs)])
    fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".parquet")
    os.close(fd)
    df.to_parquet(tmp)
    os.replace(tmp, path)
    return path


def ensure_pages_parquet(n_docs: int, seed: int = 42,
                         cache_dir: str = "/tmp/nacc_pages_cache") -> str:
    """Write the deterministic page table to a cached parquet file and
    return its path — WITHOUT Ray (row values derive from (seed, doc_id)
    only, so this is byte-identical to ``generate_pages`` output).

    This file is the shared ground the flagship pipelines and their
    DuckDB oracles both read: the driver may run the SQL twin before or
    after the Ray query, so both ``oracle_sql()`` and the query ensure
    the file exists. Writes are atomic (tmp + rename) so concurrent
    ensures are safe."""
    import os
    import tempfile
    path = os.path.join(cache_dir, f"pages_n{n_docs}_s{seed}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(cache_dir, exist_ok=True)
    gen = PageGenerator(seed=seed)
    df = pd.DataFrame([gen._doc(i) for i in range(n_docs)])
    df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
    fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".parquet")
    import os as _os
    _os.close(fd)
    df.to_parquet(tmp)
    _os.replace(tmp, path)
    return path
