"""Text-analysis kernels for training-data pipelines (system-prompt scope):
token counting, language ID, quality scoring, document fingerprinting.

All are vectorized per-batch functions over the ``documents`` table
(doc_id, text, lang, source, n_chars) meant for ``map_batches``; the
SQL-checkable ones define their semantics to be DuckDB-expressible so the
driver's oracle can verify them (queries.py)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .hashing import md5_hex, stable_hash64

_WORD_RE = re.compile(r"\S+")
# BPE-ish subword split: letter runs, digit runs, single punctuation
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

STOPWORDS = {"the", "a", "an", "and", "or", "of", "in", "on", "for", "with",
             "to", "is", "was", "at", "by", "it", "as", "be", "are"}

# tiny n-gram language-ID heuristic: characteristic function words per lang
_LANG_MARKERS = {
    "en": {"the", "and", "of", "with", "for", "report", "survey"},
    "de": {"der", "die", "das", "und", "mit", "für", "bericht"},
    "es": {"el", "la", "los", "de", "con", "para", "informe"},
    "fr": {"le", "la", "les", "et", "avec", "pour", "rapport"},
}


def token_count_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """whitespace tokens + BPE-ish subword tokens per row.

    n_tokens == DuckDB ``length(regexp_extract_all(text, '\\S+'))`` and
    n_subwords == length with the _BPE_RE pattern — SQL-checkable."""
    texts = batch[col].to_pylist()
    n_tok = [len(_WORD_RE.findall(t or "")) for t in texts]
    n_sub = [len(_BPE_RE.findall(t or "")) for t in texts]
    return batch.append_column(
        "n_tokens", pa.array(n_tok, pa.int64())).append_column(
        "n_subwords", pa.array(n_sub, pa.int64()))


def quality_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Length/punct/stopword quality signals (vectorized; heuristics are
    standard web-corpus filters, e.g. C4/Gopher rules — public)."""
    texts = batch[col].to_pylist()
    n_chars, punct_ratio, stop_ratio, mean_wlen = [], [], [], []
    for t in texts:
        t = t or ""
        words = _WORD_RE.findall(t)
        n = len(t)
        n_chars.append(n)
        punct_ratio.append(
            sum(not ch.isalnum() and not ch.isspace() for ch in t)
            / max(1, n))
        stop_ratio.append(
            sum(w.lower() in STOPWORDS for w in words) / max(1, len(words)))
        mean_wlen.append(sum(len(w) for w in words) / max(1, len(words)))
    qual = (np.minimum(np.array(n_chars) / 200.0, 1.0)
            * (1.0 - np.array(punct_ratio))
            * (0.5 + np.minimum(np.array(stop_ratio) * 2.0, 0.5)))
    return (batch
            .append_column("punct_ratio",
                           pa.array(punct_ratio, pa.float64()))
            .append_column("stopword_ratio",
                           pa.array(stop_ratio, pa.float64()))
            .append_column("mean_word_len",
                           pa.array(mean_wlen, pa.float64()))
            .append_column("quality", pa.array(qual, pa.float64())))


def langid_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Marker-word language ID → ``lang_pred`` (en/de/es/fr or 'und')."""
    texts = batch[col].to_pylist()
    preds = []
    for t in texts:
        words = set(w.lower() for w in _WORD_RE.findall(t or "")[:200])
        best, best_n = "und", 0
        for lang in sorted(_LANG_MARKERS):
            n = len(words & _LANG_MARKERS[lang])
            if n > best_n:
                best, best_n = lang, n
        preds.append(best)
    return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def fingerprint_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Content fingerprint: md5 hex of whitespace-normalized lowercased text
    (== DuckDB ``md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))`` after
    trim — SQL-checkable)."""
    texts = batch[col].to_pylist()
    fps = [md5_hex(" ".join((t or "").lower().split())) for t in texts]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """64-bit hashes of word k-shingles (for MinHash / Jaccard)."""
    words = [w.lower() for w in _WORD_RE.findall(text or "")]
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i:i + k])
                    for i in range(len(words) - k + 1)]
    return np.array(sorted({stable_hash64(s) for s in shingles}),
                    dtype=np.int64)
