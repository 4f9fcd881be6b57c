"""Alias-dictionary + context-embedding entity linker (SURVEY.md §2 A3/A4).

Reference-equivalent role: the reference's gazetteer/dictionary lookup,
generalized per the north star to "alias-dictionary + context-embedding
entity-link scoring". Fully deterministic:

- alias dict: surface → [(entity_id, prior)] from vocab.alias_rows()
- context encoder: signed hashed bag-of-words into R^64 (feature hashing with
  a crc32 sign hash — the classic "hashing trick", public), L2-normalized
- entity profile embedding: encoder(canonical-surface words + signature words)
- score(candidate) = 0.2 * prior + cosine(context, profile); argmax, ties
  broken by ascending entity_id
- surfaces absent from the dict link to NIL (entity_id "NIL:<lower surface>")
  so unlinked mentions still canonicalize by normalized surface

The same ``Linker`` class is instantiated once per Ray actor (state built in
``__init__``) and once in the refimpl oracle.
"""

from __future__ import annotations

import zlib

import numpy as np

from .vocab import BASE, Universe

EMB_DIM = 64
CTX_WINDOW = 8  # tokens on each side of a mention


def embed_words(words: list[str]) -> np.ndarray:
    """Signed hashed BoW → unit vector in R^64 (zero vector if no words)."""
    v = np.zeros(EMB_DIM, dtype=np.float32)
    for w in words:
        lw = w.lower()
        idx = zlib.crc32(b"emb=" + lw.encode()) % EMB_DIM
        sgn = 1.0 if zlib.crc32(b"sgn=" + lw.encode()) & 1 else -1.0
        v[idx] += sgn
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def build_alias_index(uni: Universe = BASE
                      ) -> dict[str, list[tuple[str, float]]]:
    idx: dict[str, list[tuple[str, float]]] = {}
    for surface, eid, prior in uni.alias_rows():
        idx.setdefault(surface, []).append((eid, prior))
    for surface in idx:
        idx[surface].sort()
    return idx


def build_entity_profiles(uni: Universe = BASE) -> dict[str, np.ndarray]:
    return {
        e.eid: embed_words(e.canonical.split() + e.signature)
        for e in uni.entities
    }


class Linker:
    """Stateful linker; construct once, call per mention."""

    def __init__(self, uni: Universe = BASE) -> None:
        self.alias = build_alias_index(uni)
        self.profiles = build_entity_profiles(uni)
        self._wcache: dict[str, tuple[int, float]] = {}

    def _embed(self, words: list[str]) -> np.ndarray:
        """== embed_words, with the per-word (bucket, sign) crc32 pair
        memoized — identical output, heavy-tailed word reuse."""
        v = np.zeros(EMB_DIM, dtype=np.float32)
        cache = self._wcache
        for w in words:
            lw = w.lower()
            e = cache.get(lw)
            if e is None:
                e = (zlib.crc32(b"emb=" + lw.encode()) % EMB_DIM,
                     1.0 if zlib.crc32(b"sgn=" + lw.encode()) & 1 else -1.0)
                cache[lw] = e
            v[e[0]] += e[1]
        n = float(np.linalg.norm(v))
        return v / n if n > 0 else v

    def link(self, surface: str, context_words: list[str]
             ) -> tuple[str, float]:
        """(entity_id, score) for one mention surface in context."""
        cands = self.alias.get(surface)
        if not cands:
            return "NIL:" + surface.lower(), 0.0
        ctx = self._embed(context_words)
        best_id, best_score = "", -1e9
        for eid, prior in cands:
            cos = float(np.dot(ctx, self.profiles[eid]))
            score = 0.2 * prior + cos
            if score > best_score + 1e-12 or \
                    (abs(score - best_score) <= 1e-12 and eid < best_id):
                best_id, best_score = eid, score
        return best_id, round(best_score, 6)


def context_words(tokens: list[str], tok_start: int, tok_end: int,
                  window: int = CTX_WINDOW) -> list[str]:
    lo = max(0, tok_start - window)
    hi = min(len(tokens), tok_end + window)
    return tokens[lo:tok_start] + tokens[tok_end:hi]
