"""Pattern triple extractor: BIO-tagged token sequence → (subj, pred, obj).

Reference-equivalent role: the reference assembles tagged spans into
structured records (SURVEY.md §2 M6); generalized here to open triples per
the north star ("pattern/dependency triple extraction into (subj, pred, obj)
Arrow structs"). Deterministic rules over the closed predicate lexicon
(vocab.PREDICATES):

for each ADJACENT pair of mentions (no mention between them) whose gap is
1–4 tokens, if the lowercased gap tokens joined by single spaces equal a
predicate phrase and the (subj_type, obj_type) signature matches, emit one
triple. Shared by refimpl oracle and the Ray triple_extract stage.
"""

from __future__ import annotations

from .vocab import BIO_LABELS, PREDICATES

_PHRASE_LOOKUP = {
    phrase: (pid, st, ot) for pid, (phrase, st, ot) in PREDICATES.items()
}
_MAX_GAP = 4


def spans_from_tags(tokens: list[str], offsets: list[tuple[int, int]],
                    tag_ids) -> list[tuple[int, int, int, int, str]]:
    """Contiguous B-X/I-X runs → (tok_start, tok_end, char_start, char_end,
    etype). tok_end exclusive."""
    spans = []
    cur_start = -1
    cur_type = ""
    for i, tid in enumerate(list(tag_ids) + [0]):
        lab = BIO_LABELS[int(tid)] if i < len(tag_ids) else "O"
        if lab.startswith("B-"):
            if cur_start >= 0:
                spans.append((cur_start, i, offsets[cur_start][0],
                              offsets[i - 1][1], cur_type))
            cur_start, cur_type = i, lab[2:]
        elif lab.startswith("I-") and cur_type == lab[2:] and cur_start >= 0:
            continue
        else:
            if cur_start >= 0:
                spans.append((cur_start, i, offsets[cur_start][0],
                              offsets[i - 1][1], cur_type))
            cur_start, cur_type = -1, ""
    return spans


def extract_triples(text: str, tokens: list[str],
                    offsets: list[tuple[int, int]], tag_ids) -> list[dict]:
    """One dict per extracted triple (subj/pred/obj + char spans + conf)."""
    spans = spans_from_tags(tokens, offsets, tag_ids)
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
