"""Single-process end-to-end oracle pipeline + golden-fixture generation.

Runs the exact reference semantics (strip → tokenize → CRF tag → triple
extract → link → union-find canonicalize → nodes/edges) sequentially over a
GoldPage corpus. The Ray Data engine is tested against these outputs:
byte-identical ``extracted.text`` per url (BASELINE.json:15) and triple
P/R ≥ 0.95 (BASELINE.json:14) — see tests/test_flagship.py.
"""

from __future__ import annotations

import hashlib

import numpy as np

from . import SEED
from .crf import hash_features, train_perceptron, viterbi_batch
from .htmlstrip import strip_html
from .linker import Linker, context_words
from .pagegen import GoldPage, gen_pages
from .tokenizer import tokenize
from .triples import extract_triples, spans_from_tags
from .unionfind import UnionFind
from .vocab import BY_ID, LABEL_TO_ID, TYPE_TO_BI


def extracted_text(html: bytes, text: str | None) -> str:
    """The per-url byte-equality unit: provided text wins, else strip html."""
    return text if text is not None else strip_html(html)


def gold_tag_ids(page: GoldPage, tokens: list[str],
                 offsets: list[tuple[int, int]]) -> np.ndarray:
    """BIO tag ids for a page's token sequence from its gold mention spans."""
    tags = np.zeros(len(tokens), dtype=np.int64)  # O
    for m in page.mentions:
        first = True
        for i, (s, e) in enumerate(offsets):
            if s >= m.start and e <= m.end:
                b, inner = TYPE_TO_BI[m.etype]
                tags[i] = LABEL_TO_ID[b if first else inner]
                first = False
    return tags


def build_training_sequences(n_pages: int = 300, seed: int = SEED + 1):
    """(hashed_feats, gold_tags) per page from a held-apart training corpus
    (different seed than any eval fixture)."""
    seqs = []
    for page in gen_pages(n_pages, seed=seed):
        toks, offs = tokenize(page.text)
        if not toks:
            continue
        seqs.append((hash_features(toks), gold_tag_ids(page, toks, offs)))
    return seqs


_MODEL_CACHE: tuple[np.ndarray, np.ndarray] | None = None


def get_model(fixture_path: str | None = None):
    """Trained CRF weights; loads tests/fixtures/crf_weights.npz if present,
    else trains reproducibly (fixed corpus + epochs)."""
    global _MODEL_CACHE
    if _MODEL_CACHE is not None:
        return _MODEL_CACHE
    if fixture_path is None:
        import os
        cand = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "tests", "fixtures", "crf_weights.npz")
        fixture_path = cand if os.path.exists(cand) else None
    if fixture_path is not None:
        from .crf import load_model
        _MODEL_CACHE = load_model(fixture_path)
    else:
        _MODEL_CACHE = train_perceptron(build_training_sequences(), epochs=5)
    return _MODEL_CACHE


def process_page(url: str, text: str, W: np.ndarray, T: np.ndarray,
                 linker: Linker, hasher=None) -> dict:
    """Tag one page and derive mentions, triples, links (reference control
    flow, SURVEY.md §3.1 step 2). ``hasher`` overrides the global
    FeatureHasher (scaled universes pass one built with their gazetteer)."""
    tokens, offsets = tokenize(text)
    if not tokens:
        return {"url": url, "mentions": [], "triples": []}
    feats = (hasher.hash_tokens(tokens) if hasher is not None
             else hash_features(tokens))
    tag_ids = viterbi_batch([feats], W, T)[0]
    spans = spans_from_tags(tokens, offsets, tag_ids)
    mentions = []
    for (ts, te, cs, ce, ty) in spans:
        eid, score = linker.link(text[cs:ce], context_words(tokens, ts, te))
        mentions.append({"start": cs, "end": ce, "surface": text[cs:ce],
                         "label": ty, "entity_id": eid, "link_score": score})
    span_by_char = {(m["start"], m["end"]): m for m in mentions}
    triples = []
    for t in extract_triples(text, tokens, offsets, tag_ids):
        sm = span_by_char[(t["subj_start"], t["subj_end"])]
        om = span_by_char[(t["obj_start"], t["obj_end"])]
        t["subj_entity_id"] = sm["entity_id"]
        t["obj_entity_id"] = om["entity_id"]
        triples.append(t)
    return {"url": url, "mentions": mentions, "triples": triples}


def canonicalize(linked_mentions: list[dict]) -> dict[str, str]:
    """entity_id -> cluster id via union-find over observed (surface, entity)
    co-links: two entities sharing a linked surface merge; cluster id = min
    member entity_id (surface nodes are prefixed so they never win)."""
    uf = UnionFind()
    for m in linked_mentions:
        uf.union("s::" + m["surface"].lower(), m["entity_id"])
    comp = uf.components()
    return {x: c for x, c in comp.items() if not x.startswith("s::")}


def run_oracle(pages: list[GoldPage], uni=None) -> dict:
    """Full single-process pipeline → dict of plain-Python tables.
    ``uni`` (vocab.Universe) scales the entity universe: the linker's
    alias dict/profiles and the hasher's gazetteer derive from it; the
    CRF weights stay the fixture model (same as the Ray engine)."""
    from .crf import FeatureHasher
    from .vocab import BASE

    uni = uni or BASE
    W, T = get_model()
    linker = Linker(uni)
    hasher = None if uni.is_base else FeatureHasher(gaz=uni.gazetteer())
    extracted, mention_rows, triple_rows = [], [], []
    for p in pages:
        text = extracted_text(p.html, p.text if p.text_provided else None)
        extracted.append({
            "url": p.url, "text": text,
            "text_sha256": hashlib.sha256(text.encode()).digest(),
        })
        if p.lang != "en":
            continue  # language filter before tagging (SURVEY.md §2 M4)
        res = process_page(p.url, text, W, T, linker, hasher)
        for m in res["mentions"]:
            mention_rows.append({"url": p.url, **m})
        for t in res["triples"]:
            triple_rows.append({"url": p.url, **t})

    cluster = canonicalize(mention_rows)

    def cid(eid: str) -> str:
        return cluster.get(eid, eid)

    # nodes
    agg: dict[str, dict] = {}
    for m in mention_rows:
        c = cid(m["entity_id"])
        a = agg.setdefault(c, {"aliases": set(), "n_mentions": 0})
        a["aliases"].add(m["surface"])
        a["n_mentions"] += 1
    nodes = []
    for c in sorted(agg):
        e = uni.by_id.get(c)
        canonical = e.canonical if e else c.removeprefix("NIL:")
        nodes.append({"entity_id": c, "canonical_surface": canonical,
                      "aliases": sorted(agg[c]["aliases"]),
                      "n_mentions": agg[c]["n_mentions"]})
    # edges
    eagg: dict[tuple[str, str, str], dict] = {}
    for t in triple_rows:
        k = (cid(t["subj_entity_id"]), t["pred"], cid(t["obj_entity_id"]))
        a = eagg.setdefault(k, {"n_support": 0, "urls": set()})
        a["n_support"] += 1
        a["urls"].add(t["url"])
    edges = [{"subj_id": k[0], "pred": k[1], "obj_id": k[2],
              "n_support": v["n_support"],
              "sample_urls": sorted(v["urls"])[:5]}
             for k, v in sorted(eagg.items())]
    return {"extracted": extracted, "mentions": mention_rows,
            "triples": triple_rows, "nodes": nodes, "edges": edges}
