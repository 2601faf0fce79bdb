"""Text analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, fingerprinting.

All are row-local -> expressed as vectorized ``map_batches`` stages
(``batch_format="pyarrow"`` where pyarrow.compute has the kernel). The
language-ID stage is a callable class (actor pool) so stopword tables and
compiled regexes are built once per actor, mirroring the engine's stateful-
stage pattern (reference analog: the cached lookup stage,
src/utils/cache_manager.py — state loaded once, reused per batch).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"

# tiny, deterministic stopword tables for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"},
    "fr": {"le", "la", "les", "et", "est", "une", "un", "pas", "pour", "que"},
    "es": {"el", "la", "los", "y", "es", "una", "un", "no", "con", "para"},
}


def add_token_count(t: pa.Table, col: str = "text") -> pa.Table:
    """tokens = number of maximal non-whitespace runs (oracle:
    len(list_filter(regexp_split_to_array(text,'\\s+'), x -> x != '')))."""
    n = pc.count_substring_regex(t[col], TOKEN_RE)
    return t.append_column("n_tokens", pc.cast(n, pa.int64()))


def add_quality_metrics(t: pa.Table, col: str = "text") -> pa.Table:
    """Deterministic quality-score components (reference analog: derived
    per-row scalars like GC content, bio_rules.py:216-227/312-319 — here as
    pure Arrow kernels, no Python apply)."""
    text = t[col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"), pa.int64())
    n_digit = pc.cast(pc.count_substring_regex(text, "[0-9]"), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, "[!?.,;:]"), pa.int64())
    n_space = pc.cast(pc.count_substring_regex(text, "[ ]"), pa.int64())
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    alpha_ratio = pc.round(
        pc.divide(pc.cast(n_alpha, pa.float64()), pc.cast(denom, pa.float64())),
        ndigits=6,
    )
    out = t
    for name, arr in [
        ("n_chars", n_chars), ("n_alpha", n_alpha), ("n_digit", n_digit),
        ("n_punct", n_punct), ("n_space", n_space), ("alpha_ratio", alpha_ratio),
    ]:
        out = out.append_column(name, arr)
    return out


class LangId:
    """Stopword-vote language heuristic (actor-pool stage; tables built once
    per actor). Returns 'und' when no stopword hits."""

    def __init__(self):
        import re

        self.word = re.compile(r"[a-zà-ÿäöüß]+")
        self.tables = {k: frozenset(v) for k, v in STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def classify(s: str) -> str:
            words = self.word.findall(s.lower()[:2000])
            best, best_n = "und", 0
            for lang, tab in self.tables.items():
                hits = sum(1 for w in words if w in tab)
                if hits > best_n:
                    best, best_n = lang, hits
            return best

        batch["lang_pred"] = batch["text"].map(classify)
        return batch


def add_fingerprint(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Document fingerprint = md5 hex of the raw text (oracle: md5(text))."""
    batch["fingerprint"] = [
        hashlib.md5(s.encode("utf-8")).hexdigest() for s in batch[col]
    ]
    return batch


def rolling_hashes(text: str, window: int = 16, base: int = 257,
                   mod: int = (1 << 61) - 1) -> np.ndarray:
    """Polynomial rolling hash over a sliding character window (public
    Rabin-Karp scheme) — building block for content-defined fingerprints."""
    b = text.encode("utf-8", errors="ignore")
    n = len(b)
    if n < window:
        return np.zeros(0, dtype=np.uint64)
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.object_)
    h = 0
    out = []
    power = pow(base, window - 1, mod)
    for i, c in enumerate(arr):
        h = (h * base + int(c)) % mod
        if i >= window - 1:
            out.append(h)
            h = (h - int(arr[i - window + 1]) * power) % mod
    return np.array(out, dtype=np.uint64)
