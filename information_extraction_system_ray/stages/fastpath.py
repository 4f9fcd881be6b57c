"""Vectorized annotate-path kernels — same semantics as the refimpl
primitives (spans_from_tags / extract_triples / Linker._embed /
FeatureHasher.hash_tokens), re-expressed over numpy so the per-page Python
work in the FusedAnnotator hot loop shrinks to dict lookups.

Exactness contract: every function here is BIT-IDENTICAL to its refimpl
counterpart (float adds happen in the same order; hashes come from the same
crc32 entries) — asserted in tests/test_fastpath.py and transitively by the
flagship mention/triple golden tests. refimpl stays the simple readable
oracle; this module is the engine's hot path.
"""

from __future__ import annotations

import numpy as np

from refimpl.crf import N_FEATS, FeatureHasher, _h
from refimpl.linker import EMB_DIM, Linker
from refimpl.triples import _MAX_GAP, _PHRASE_LOOKUP
from refimpl.vocab import BIO_LABELS

# tag-id lookup tables derived from BIO_LABELS (never assume odd/even ids)
_IS_B = np.array([lab.startswith("B-") for lab in BIO_LABELS])
_IS_I = np.array([lab.startswith("I-") for lab in BIO_LABELS])
_TYPE_ID = np.array([(["O"] + sorted({l[2:] for l in BIO_LABELS if "-" in l})
                      ).index(lab[2:] if "-" in lab else "O")
                     for lab in BIO_LABELS])
_TYPE_NAMES = ["O"] + sorted({l[2:] for l in BIO_LABELS if "-" in l})


def spans_from_tags_fast(offsets: list, tag_ids) -> list:
    """== refimpl.triples.spans_from_tags, vectorized: span starts are B
    positions; each extends through the following I run of the same type
    (an I not preceded by a matching B/I attaches to nothing, exactly as
    the sequential scan closes on it)."""
    t = np.asarray(tag_ids, dtype=np.int64)
    n = t.size
    if n == 0:
        return []
    typ = _TYPE_ID[t]
    is_b = _IS_B[t]
    is_i = _IS_I[t]
    prev_typ = np.empty_like(typ)
    prev_typ[0] = -1
    prev_typ[1:] = typ[:-1]
    cont = is_i & (typ == prev_typ)          # position continues a span
    stop_idx = np.flatnonzero(~cont)          # positions that break a run
    starts = np.flatnonzero(is_b)
    pos = np.searchsorted(stop_idx, starts + 1)
    ends = np.where(pos < len(stop_idx),
                    stop_idx[np.minimum(pos, len(stop_idx) - 1)], n)
    return [(int(s), int(e), offsets[s][0], offsets[e - 1][1],
             _TYPE_NAMES[typ[s]])
            for s, e in zip(starts, ends)]


def triples_from_spans(text: str, tokens: list, spans: list) -> list:
    """== refimpl.triples.extract_triples, minus the duplicated
    spans_from_tags call (the annotator already computed the spans)."""
    out: list[dict] = []
    for k in range(len(spans) - 1):
        s_ts, s_te, s_cs, s_ce, s_ty = spans[k]
        o_ts, o_te, o_cs, o_ce, o_ty = spans[k + 1]
        gap = o_ts - s_te
        if gap < 1 or gap > _MAX_GAP:
            continue
        phrase = " ".join(t.lower() for t in tokens[s_te:o_ts])
        hit = _PHRASE_LOOKUP.get(phrase)
        if hit is None:
            continue
        pid, st, ot = hit
        if s_ty != st or o_ty != ot:
            continue
        out.append({
            "subj": text[s_cs:s_ce],
            "pred": pid,
            "obj": text[o_cs:o_ce],
            "subj_start": s_cs, "subj_end": s_ce,
            "obj_start": o_cs, "obj_end": o_ce,
            "conf": 1.0,
        })
    return out


class BatchLinker(Linker):
    """Linker with page-batched context embedding: all of a page's
    linkable mentions embed through ONE ``np.add.at`` scatter (unbuffered →
    adds apply in the same order as the sequential loop → bit-identical
    float32 vectors), then score per candidate as before."""

    def link_page(self, text: str, tokens: list, spans: list) -> list:
        """[(entity_id, score)] per span, refimpl-identical."""
        from refimpl.linker import CTX_WINDOW

        n_tok = len(tokens)
        results: list = [None] * len(spans)
        need: list[tuple[int, list]] = []     # (span index, candidates)
        cache = self._wcache

        # (idx, sgn) once per TOKEN — a token participates in several
        # overlapping span contexts; the per-span work below is then pure
        # numpy slicing. The (row, idx, sgn) sequence fed to np.add.at is
        # byte-identical to the old per-word loop (same order: lo..ts then
        # te..hi per span, spans in order), so vectors stay bit-exact.
        tok_idx = np.empty(n_tok, dtype=np.int64)
        tok_sgn = np.empty(n_tok, dtype=np.float32)
        for i, w in enumerate(tokens):
            lw = w.lower()
            e = cache.get(lw)
            if e is None:
                import zlib
                e = (zlib.crc32(b"emb=" + lw.encode()) % EMB_DIM,
                     1.0 if zlib.crc32(b"sgn=" + lw.encode()) & 1
                     else -1.0)
                cache[lw] = e
            tok_idx[i] = e[0]
            tok_sgn[i] = e[1]

        rows_l, idxs_l, sgns_l = [], [], []
        for si, (ts, te, cs, ce, _ty) in enumerate(spans):
            surface = text[cs:ce]
            cands = self.alias.get(surface)
            if not cands:
                results[si] = ("NIL:" + surface.lower(), 0.0)
                continue
            row = len(need)
            need.append((si, cands))
            lo = max(0, ts - CTX_WINDOW)
            hi = min(n_tok, te + CTX_WINDOW)
            n_ctx = (ts - lo) + (hi - te)
            if n_ctx:
                rows_l.append(np.full(n_ctx, row, dtype=np.int64))
                idxs_l.append(tok_idx[lo:ts])
                idxs_l.append(tok_idx[te:hi])
                sgns_l.append(tok_sgn[lo:ts])
                sgns_l.append(tok_sgn[te:hi])
        if not need:
            return results
        M = np.zeros((len(need), EMB_DIM), dtype=np.float32)
        if rows_l:
            np.add.at(M, (np.concatenate(rows_l), np.concatenate(idxs_l)),
                      np.concatenate(sgns_l))
        for row, (si, cands) in enumerate(need):
            v = M[row]
            nrm = float(np.sqrt(np.dot(v, v)))
            ctx = v / nrm if nrm > 0 else v
            best_id, best_score = "", -1e9
            for eid, prior in cands:
                cos = float(np.dot(ctx, self.profiles[eid]))
                score = 0.2 * prior + cos
                if score > best_score + 1e-12 or \
                        (abs(score - best_score) <= 1e-12
                         and eid < best_id):
                    best_id, best_score = eid, score
            results[si] = (best_id, round(best_score, 6))
        return results


class FastHasher(FeatureHasher):
    """hash_tokens with the per-position work vectorized: token-local
    feature columns come from ONE fancy-index into a growing entry matrix;
    the prev/next/prev-shape columns are shifts of the same matrix; only the
    bigram column still walks positions (one dict get each). Entry values
    come from FeatureHasher._token_entry ⇒ hashes identical by
    construction."""

    _ENTRY_W = 14          # token-local entry width (== len(_token_entry))

    def __init__(self, gaz: frozenset | None = None) -> None:
        super().__init__(gaz)
        self._ids: dict[str, int] = {}
        self._E = np.empty((1024, self._ENTRY_W), dtype=np.int32)
        self._h_bos_pv = _h("pv=<BOS>")
        self._h_eos_nx = _h("nx=<EOS>")
        self._h_bos_psh = _h("psh=<BOS>")

    def _id_of(self, w: str) -> int:
        i = self._ids.get(w)
        if i is None:
            i = len(self._ids)
            if i >= self._E.shape[0]:
                self._E = np.concatenate(
                    [self._E, np.empty_like(self._E)], axis=0)
            self._E[i] = self._token_entry(w)
            self._ids[w] = i
        return i

    def hash_tokens(self, tokens: list) -> np.ndarray:
        n = len(tokens)
        out = np.empty((n, N_FEATS), dtype=np.int32)
        if n == 0:
            return out
        ids = np.fromiter((self._id_of(w) for w in tokens),
                          dtype=np.int64, count=n)
        E = self._E
        out[:, 0:9] = E[ids, 0:9]
        out[0, 9] = self._h_bos_pv
        out[1:, 9] = E[ids[:-1], 9]            # pv=<prev lower>
        out[n - 1, 10] = self._h_eos_nx
        out[:-1, 10] = E[ids[1:], 10]          # nx=<next lower>
        out[0, 11] = self._h_bos_psh
        out[1:, 11] = E[ids[:-1], 11]          # psh=<prev shape>
        out[:, 13:15] = E[ids, 12:14]          # pos=, gaz= (token-local)
        big = self._big
        bigram = self._bigram
        out[0, 12] = _h("big=<BOS>|" + tokens[0].lower())
        for i in range(1, n):
            k = (tokens[i - 1], tokens[i])
            v = big.get(k)
            out[i, 12] = bigram(*k) if v is None else v
        return out
