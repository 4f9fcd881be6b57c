"""Deterministic synthesizer for the ``pages`` input table + gold annotations.

Implements FIXTURES.md §1–§2: Common-Crawl-shaped rows
(url, warc_ts, html:binary, text, lang) built from an entity sentence grammar
so that (a) HTML stripping is non-trivial but byte-reproducible, (b) every
page carries a known gold mention / triple / link set, (c) one ORG surface
("Wikipedia") takes ~30% of ORG slots to create head-entity skew.

All randomness uses ``random.Random`` seeded from (SEED, row index) so any
slice of the corpus can be regenerated independently and in parallel —
exactly what the Ray-side synthetic reader needs at bench scale.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from . import SEED
from .htmlstrip import strip_html_str
from .vocab import (BASE, ENTITIES, FILLER, HOT_ORG, ORGS, PERSONS, PLACES,
                    PREDICATES, Entity, Universe)

LANGS = ["en", "de", "es", "fr", "zh"]
EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00 in µs


@dataclass
class Mention:
    start: int          # char offset into the page's stripped text
    end: int
    surface: str
    etype: str          # PER | ORG | LOC
    entity_id: str      # gold entity


@dataclass
class GoldPage:
    url: str
    warc_ts_us: int
    html: bytes
    text: str                      # refimpl-stripped text (ground truth)
    text_provided: bool            # False -> pages.text is null
    lang: str
    mentions: list[Mention] = field(default_factory=list)
    # (subj mention idx, pred id, obj mention idx)
    triples: list[tuple[int, str, int]] = field(default_factory=list)


def _pick_entity(rng: random.Random, etype: str,
                 uni: Universe = BASE) -> Entity:
    if uni.is_base:
        # base path kept draw-for-draw identical (golden fixtures)
        if etype == "PER":
            return rng.choice(PERSONS)
        if etype == "LOC":
            return rng.choice(PLACES)
        # ORG with head-entity skew: ~30% of slots go to HOT_ORG
        if rng.random() < 0.30:
            return HOT_ORG
        return rng.choice(ORGS)
    # scaled universe: Zipf(1) rank pick (P(rank k) ∝ 1/(k+1)) so the
    # head-entity skew the north star mandates survives at every scale —
    # base entities occupy the head ranks, synthesized entities the tail
    if etype == "ORG" and rng.random() < 0.30:
        return uni.hot_org
    pool = uni.pool(etype)
    n = len(pool)
    return pool[min(int(n ** rng.random()) - 1, n - 1)]


def _alias(rng: random.Random, e: Entity) -> str:
    # canonical surface 60% of the time, shorter variants otherwise
    r = rng.random()
    if r < 0.6 or len(e.aliases) == 1:
        return e.aliases[0]
    return e.aliases[1 + rng.randrange(len(e.aliases) - 1)]


@dataclass
class Sentence:
    text: str
    mentions: list[tuple[int, int, str, str, str]]  # start,end,surface,etype,eid
    triples: list[tuple[int, str, int]]             # mention-index pairs


def gen_sentence(rng: random.Random, entity_rate: float = 0.65,
                 uni: Universe = BASE) -> Sentence:
    """One sentence: triple sentence (45%), mention-only (20%), filler."""
    r = rng.random()
    if r < entity_rate - 0.20:  # triple sentence
        pid = rng.choice(sorted(PREDICATES))
        phrase, st, ot = PREDICATES[pid]
        subj, obj = _pick_entity(rng, st, uni), _pick_entity(rng, ot, uni)
        while obj.eid == subj.eid:
            obj = _pick_entity(rng, ot, uni)
        s_surf, o_surf = _alias(rng, subj), _alias(rng, obj)
        sig = rng.sample(subj.signature, 2) + rng.sample(obj.signature, 2)
        parts: list[str] = []
        mentions: list[tuple[int, int, str, str, str]] = []
        pos = 0

        def emit(tok: str) -> None:
            nonlocal pos
            if parts:
                parts.append(" ")
                pos += 1
            parts.append(tok)
            pos += len(tok)

        emit(s_surf)
        mentions.append((pos - len(s_surf), pos, s_surf, subj.etype, subj.eid))
        for w in phrase.split():
            emit(w)
        emit(o_surf)
        mentions.append((pos - len(o_surf), pos, o_surf, obj.etype, obj.eid))
        for w in ["amid", "the", sig[0], sig[1], sig[2], sig[3], "season"]:
            emit(w)
        text = "".join(parts) + "."
        return Sentence(text, mentions, [(0, pid, 1)])
    if r < entity_rate:  # mention-only sentence
        e = _pick_entity(rng, rng.choice(["PER", "ORG", "LOC"]), uni)
        surf = _alias(rng, e)
        sig = rng.sample(e.signature, 2)
        tail = rng.sample(FILLER, 3)
        text = (f"{surf} spoke about the {sig[0]} {sig[1]} during "
                f"{tail[0]} {tail[1]} {tail[2]}.")
        return Sentence(text, [(0, len(surf), surf, e.etype, e.eid)], [])
    words = [rng.choice(FILLER) for _ in range(rng.randrange(6, 11))]
    return Sentence(" ".join(words) + ".", [], [])


_NAV = ("<nav><a href=\"/\">home</a> &middot; <a href=\"/about\">about"
        "</a> &middot; sitemap</nav>")
_FOOTER = ("<footer>&copy; 2024 example press &mdash; all rights "
           "reserved &amp; archived</footer>")
_SCRIPT = "<script>var q=window.q||[];q.push(['track','%d']);</script>"


def gen_page(i: int, seed: int = SEED, uni: Universe = BASE) -> GoldPage:
    """Deterministically synthesize page ``i`` (independent of other pages).

    ``uni`` selects the entity universe (vocab.scaled_universe); the base
    universe path is draw-for-draw identical to round 4 so every golden
    fixture regenerates byte-exact."""
    rng = random.Random(seed * 1_000_003 + i)
    lang = LANGS[rng.randrange(len(LANGS))] if rng.random() < 0.35 else "en"
    url = f"https://site{i % 97}.example/{lang}/p{i}"

    paragraphs: list[list[Sentence]] = []
    n_par = rng.randrange(3, 9)
    for _ in range(n_par):
        n_sent = rng.randrange(2, 7)
        # entity sentences only on English pages (language-filter fixture)
        rate = 0.65 if lang == "en" else 0.0
        paragraphs.append([gen_sentence(rng, rate, uni)
                           for _ in range(n_sent)])

    # assemble stripped text + global mention offsets
    mentions: list[Mention] = []
    triples: list[tuple[int, str, int]] = []
    par_texts: list[str] = []
    pos = 0
    for par in paragraphs:
        sent_texts = []
        for s in par:
            base = pos + sum(len(t) + 1 for t in sent_texts)
            for (st, en, surf, etype, eid) in s.mentions:
                mentions.append(Mention(base + st, base + en, surf, etype, eid))
            m0 = len(mentions) - len(s.mentions)
            for (si, pid, oi) in s.triples:
                triples.append((m0 + si, pid, m0 + oi))
            sent_texts.append(s.text)
        ptxt = " ".join(sent_texts)
        par_texts.append(ptxt)
        pos += len(ptxt) + 1  # the "\n" joiner

    text = "\n".join(par_texts)

    # wrap into HTML; inline <em> wraps whole sentences only, so stripping's
    # tag→space + whitespace collapse reproduces ``text`` byte-exactly
    html_pars = []
    for par in paragraphs:
        spans = []
        for s in par:
            if rng.random() < 0.25:
                spans.append(f"<em>{s.text}</em>")
            elif rng.random() < 0.15:
                spans.append(f"<b>{s.text}</b>")
            else:
                spans.append(s.text)
        html_pars.append("<p>" + " ".join(spans) + "</p>")
    title = f"page {i} <!-- id:{i} -->"
    html = (
        f"<html><head><title>{title}</title><style>p{{margin:0}}</style>"
        f"{_SCRIPT % i}</head><body>{_NAV}"
        + "".join(html_pars)
        + f"{_FOOTER}</body></html>"
    )

    page = GoldPage(
        url=url,
        warc_ts_us=EPOCH_US + i * 137_000_000,
        html=html.encode("utf-8"),
        text=text,
        text_provided=rng.random() < 0.5,
        lang=lang,
        mentions=mentions,
        triples=triples,
    )
    # invariant check is cheap enough to keep always-on during generation
    assert strip_html_str(html) == text, f"strip mismatch on page {i}"
    return page


def gen_pages(n: int, seed: int = SEED,
              uni: Universe = BASE) -> list[GoldPage]:
    return [gen_page(i, seed, uni) for i in range(n)]


def pages_arrow(pages: list[GoldPage]):
    """pages table as a pyarrow.Table in the mandated input schema."""
    import pyarrow as pa

    return pa.table({
        "url": pa.array([p.url for p in pages], pa.string()),
        "warc_ts": pa.array([p.warc_ts_us for p in pages],
                            pa.timestamp("us")),
        "html": pa.array([p.html for p in pages], pa.binary()),
        "text": pa.array([p.text if p.text_provided else None for p in pages],
                         pa.string()),
        "lang": pa.array([p.lang for p in pages], pa.string()),
    })
