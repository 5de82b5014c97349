"""Regex PII / toxicity scrubber.

The web analog of the reference's ``regex`` rule bank
(docs/data-quality-rule-definition-guidelines.md:230-244): a compiled set
of patterns applied per batch with ``Series.str.replace`` /
``Series.str.count`` (C-speed, no row loop). Patterns are RE2-compatible
(no lookaround) so the DuckDB oracle can run the byte-identical
replacement with ``regexp_replace(..., 'g')``.

Appends: ``scrubbed_text`` plus per-category redaction counts
(``n_email``, ``n_phone``, ``n_ssn``, ``n_ipv4``, ``n_toxic``) and the
total ``n_redactions``. Scrubbing is deterministic and idempotent —
byte-identical output per input text across runs and parallelism levels.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

#: (name, pattern, replacement) applied IN ORDER — order is part of the
#: contract (an email scrub must not leave digits for the phone scrub).
PII_PATTERNS: List[Tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn",
     r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
     "<SSN>"),
    ("phone",
     r"\b\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
     "<PHONE>"),
    ("ipv4",
     r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
]

#: deterministic toxicity blocklist (stand-in for a model-backed scorer;
#: the actor-pool plumbing is identical for a real classifier)
TOXIC_WORDS: List[str] = ["badword", "slur1", "slur2", "toxicterm"]
TOXIC_PATTERN = r"\b(" + "|".join(TOXIC_WORDS) + r")\b"
TOXIC_REPLACEMENT = "<TOXIC>"


class Scrubber:
    """map_batches callable: compile the pattern bank once per actor."""

    def __init__(self,
                 text_column: str = "text",
                 output_column: str = "scrubbed_text",
                 patterns: Optional[List[Tuple[str, str, str]]] = None,
                 scrub_toxic: bool = True):
        self.text_column = text_column
        self.output_column = output_column
        specs = patterns if patterns is not None else PII_PATTERNS
        self.compiled = [(name, re.compile(pat), repl)
                         for name, pat, repl in specs]
        self.toxic = re.compile(TOXIC_PATTERN) if scrub_toxic else None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.text_column].fillna("")
        batch = batch.copy()
        total = np.zeros(len(batch), dtype=np.int64)
        for name, pattern, repl in self.compiled:
            hits = text.str.count(pattern).to_numpy(np.int64)
            batch[f"n_{name}"] = hits
            total += hits
            text = text.str.replace(pattern, repl, regex=True)
        if self.toxic is not None:
            hits = text.str.count(self.toxic).to_numpy(np.int64)
            batch["n_toxic"] = hits
            total += hits
            text = text.str.replace(self.toxic, TOXIC_REPLACEMENT,
                                    regex=True)
        batch[self.output_column] = text
        batch["n_redactions"] = total
        return batch
