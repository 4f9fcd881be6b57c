"""Round-5 scalable entity universe (r4 VERDICT "Next round" #1).

The flagship KG must GROW with the corpus: ``vocab.scaled_universe(n)``
extends the base 95 entities deterministically, and the whole pipeline
(pagegen → gazetteer features → linker → node canon lookup) threads the
scalar ``n_entities`` through. Three contracts:

1. Base identity — scaled_universe(None/95) IS the base universe, its
   alias_rows/gazetteer are bit-identical to the module-level round-4
   versions, so every golden fixture stays valid.
2. Determinism + uniqueness — a scaled universe is a pure function of n;
   ids/canonicals/alias name words are unique and never collide with the
   base vocabulary.
3. Ray↔oracle parity at scale — the Ray flagship over a scaled-universe
   corpus matches refimpl.run_oracle exactly (mentions, triples, nodes,
   edges), and the KG is corpus-proportional (node count ≫ the constant
   104 of round 4).
"""

import pytest


def test_scaled_universe_base_identity():
    from refimpl import crf
    from refimpl.vocab import (BASE, ENTITIES, alias_rows,
                               scaled_universe)

    assert scaled_universe(None) is BASE
    assert scaled_universe(95) is BASE
    assert scaled_universe(10) is BASE
    assert BASE.entities == ENTITIES
    assert BASE.alias_rows() == alias_rows()
    assert BASE.gazetteer() == crf._GAZ
    assert BASE.hot_org.canonical == "Wikipedia"


def test_scaled_universe_determinism_and_uniqueness():
    from refimpl.vocab import BASE, _BASE_WORDS, scaled_universe

    u1 = scaled_universe(600)
    u2 = scaled_universe(600)
    assert u1 is u2  # lru-cached pure function
    assert len(u1.entities) == 600
    # base kept verbatim (per type pool; `entities` concatenates pools)
    assert u1.persons[:40] == BASE.persons
    assert u1.orgs[:30] == BASE.orgs
    assert u1.places[:25] == BASE.places

    ids = [e.eid for e in u1.entities]
    assert len(set(ids)) == 600
    canon = [e.canonical for e in u1.entities]
    assert len(set(canon)) == 600
    extras = u1.persons[40:] + u1.orgs[30:] + u1.places[25:]
    assert len(extras) == 600 - 95
    # synthesized name words never collide with base vocabulary words
    for e in extras:
        name_word = e.canonical.split()[-1] if e.etype == "PER" \
            else e.canonical.split()[0]
        assert name_word.lower() not in _BASE_WORDS, e.canonical
    # every extra has ≥2 aliases and a 5-word signature like the base
    for e in extras:
        assert len(e.aliases) >= 2 and len(e.signature) == 5
    # monotone growth: a larger universe extends a smaller one
    # (Entity has no __eq__; compare by fields)
    def key(e):
        return (e.eid, e.etype, e.canonical, e.aliases, e.signature)

    u3 = scaled_universe(300)
    for big, small in ((u1.persons, u3.persons), (u1.orgs, u3.orgs),
                       (u1.places, u3.places)):
        assert [key(e) for e in big[:len(small)]] == \
            [key(e) for e in small]


def test_scaled_pagegen_skew_and_determinism():
    """Zipf pick: base entities occupy the head ranks; pages regenerate
    identically; the base-universe path is untouched (drawn-for-draw)."""
    from collections import Counter

    from refimpl.pagegen import gen_page, gen_pages
    from refimpl.vocab import scaled_universe

    uni = scaled_universe(400)
    pages = gen_pages(60, uni=uni)
    again = gen_pages(60, uni=uni)
    assert [p.html for p in pages] == [p.html for p in again]
    assert [p.text for p in pages] == [p.text for p in again]

    c = Counter(m.entity_id for p in pages for m in p.mentions)
    extras_seen = sum(1 for eid in c if len(eid) > 8)  # 6-digit extras
    assert extras_seen > 20, c  # the tail is really sampled
    # head skew: Wikipedia (hot org) stays the top org
    orgs = Counter({k: v for k, v in c.items() if k.startswith("ORG")})
    assert orgs.most_common(1)[0][0] == "ORG_000"

    # the base path is byte-identical with and without the uni kwarg
    p_default = gen_page(7)
    from refimpl.vocab import BASE
    p_base = gen_page(7, uni=BASE)
    assert p_default.html == p_base.html
    assert p_default.mentions == p_base.mentions


@pytest.mark.usefixtures("ray_session")
def test_scaled_flagship_matches_oracle_and_grows():
    """Ray annotate+build_graph at n_entities=300 over 250 pages ==
    refimpl.run_oracle with the same universe — exact mention/triple/node/
    edge parity (the P/R≥0.95 gate holds at equality), and the node table
    is corpus-proportional, not the round-4 constant ~104."""
    from refimpl.oracle import run_oracle
    from refimpl.pagegen import gen_pages
    from refimpl.vocab import scaled_universe

    from information_extraction_system_ray.pipelines.flagship import (
        annotate, build_graph)
    from information_extraction_system_ray.sources.pages import synth_pages
    from information_extraction_system_ray.stages.graph import \
        explode_list_struct

    N_PAGES, N_ENT = 250, 300
    uni = scaled_universe(N_ENT)
    gold = run_oracle(gen_pages(N_PAGES, uni=uni), uni=uni)

    ann = annotate(synth_pages(N_PAGES, n_entities=N_ENT,
                               override_num_blocks=8),
                   num_parts=8, concurrency=(1, 2),
                   n_entities=N_ENT).materialize()

    got_m = set()
    got_t = set()
    for b in ann.iter_batches(batch_format="pyarrow"):
        t = explode_list_struct(b, "mentions", ["url"])
        for r in t.to_pylist():
            got_m.add((r["url"], r["start"], r["end"], r["surface"],
                       r["label"], r["entity_id"]))
        t = explode_list_struct(b, "triples", ["url"])
        for r in t.to_pylist():
            got_t.add((r["url"], r["subj"], r["pred"], r["obj"],
                       r["subj_entity_id"], r["obj_entity_id"]))
    gold_m = {(m["url"], m["start"], m["end"], m["surface"], m["label"],
               m["entity_id"]) for m in gold["mentions"]}
    gold_t = {(t["url"], t["subj"], t["pred"], t["obj"],
               t["subj_entity_id"], t["obj_entity_id"])
              for t in gold["triples"]}
    assert got_m == gold_m
    assert got_t == gold_t

    g = build_graph(ann, n_entities=N_ENT)
    nodes = g["nodes"].to_pandas()
    edges = g["edges"].to_pandas()

    gold_nodes = {(n["entity_id"], n["canonical_surface"],
                   tuple(n["aliases"]), n["n_mentions"])
                  for n in gold["nodes"]}
    got_nodes = {(r.entity_id, r.canonical_surface, tuple(r.aliases),
                  r.n_mentions) for r in nodes.itertuples()}
    assert got_nodes == gold_nodes

    gold_edges = {(e["subj_id"], e["pred"], e["obj_id"], e["n_support"],
                   tuple(e["sample_urls"])) for e in gold["edges"]}
    got_edges = {(r.subj_id, r.pred, r.obj_id, r.n_support,
                  tuple(r.sample_urls)) for r in edges.itertuples()}
    assert got_edges == gold_edges

    # the KG grew with the universe: far beyond the constant ~104
    assert len(nodes) > 180, len(nodes)
