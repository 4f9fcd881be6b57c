"""End-to-end parity: Ray flagship vs refimpl golden fixtures (tiny corpus).

Gates from BASELINE.md: byte-identical extracted text per url; triple
P/R ≥ 0.95 vs the oracle; identical canonicalized nodes/edges tables.
"""

import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def flagship_result(ray_session, fixdir):
    import ray.data as rd

    from information_extraction_system_ray.pipelines.flagship import \
        run_flagship

    pages = rd.read_parquet(os.path.join(fixdir, "pages_tiny.parquet"))
    # autoscaling (1, 2): a fixed pool of 2+2 actors would reserve all 4
    # session CPUs and starve the stateless stages (SURVEY.md §4 sizing)
    return run_flagship(pages, num_parts=8, concurrency=(1, 2))


def test_extracted_byte_identity(ray_session, fixdir):
    import ray.data as rd

    from information_extraction_system_ray.stages.strip import extract_text

    pages = rd.read_parquet(os.path.join(fixdir, "pages_tiny.parquet"))
    got = extract_text(pages, num_parts=8).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    gold = pq.read_table(
        os.path.join(fixdir, "gold_extracted_tiny.parquet")).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(gold["url"])
    assert list(got["text"]) == list(gold["text"])          # byte identity
    assert [bytes(x) for x in got["text_sha256"]] == \
        [bytes(x) for x in gold["text_sha256"]]


def test_triples_pr_gate(flagship_result, fixdir):
    from information_extraction_system_ray.stages.graph import \
        explode_list_struct

    ann = flagship_result["annotated"]
    got = set()
    for b in ann.iter_batches(batch_format="pyarrow"):
        t = explode_list_struct(b, "triples", ["url"])
        for r in t.select(["url", "subj", "pred", "obj"]).to_pylist():
            got.add((r["url"], r["subj"], r["pred"], r["obj"]))
    gold_t = pq.read_table(os.path.join(fixdir, "gold_triples_tiny.parquet"))
    gold = {(r["url"], r["subj"], r["pred"], r["obj"])
            for r in gold_t.to_pylist()}
    tp = len(got & gold)
    precision = tp / len(got)
    recall = tp / len(gold)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # same engine semantics ⇒ should actually be exact
    assert got == gold


def test_mentions_match_golden(flagship_result, fixdir):
    from information_extraction_system_ray.stages.graph import \
        explode_list_struct

    ann = flagship_result["annotated"]
    got = set()
    for b in ann.iter_batches(batch_format="pyarrow"):
        t = explode_list_struct(b, "mentions", ["url"])
        for r in t.to_pylist():
            got.add((r["url"], r["start"], r["end"], r["surface"],
                     r["label"], r["entity_id"]))
    gold_t = pq.read_table(os.path.join(fixdir, "gold_mentions_tiny.parquet"))
    gold = {(r["url"], r["start"], r["end"], r["surface"], r["label"],
             r["entity_id"]) for r in gold_t.to_pylist()}
    assert got == gold


def _norm_nodes(df):
    df = df.copy()
    df["aliases"] = df["aliases"].map(list)
    return df.sort_values("entity_id").reset_index(drop=True)


def test_nodes_edges_match_golden(flagship_result, fixdir):
    nodes = _norm_nodes(flagship_result["nodes"].to_pandas())
    gold_nodes = _norm_nodes(pq.read_table(
        os.path.join(fixdir, "gold_nodes_tiny.parquet")).to_pandas())
    assert nodes.to_dict("records") == gold_nodes.to_dict("records")

    edges = flagship_result["edges"].to_pandas()
    edges["sample_urls"] = edges["sample_urls"].map(list)
    gold_edges = pq.read_table(
        os.path.join(fixdir, "gold_edges_tiny.parquet")).to_pandas()
    gold_edges["sample_urls"] = gold_edges["sample_urls"].map(list)
    assert edges.to_dict("records") == gold_edges.to_dict("records")


def test_distributed_cc_matches_driver_uf(ray_session, flagship_result):
    """Force the label-propagation path and require identical clusters."""
    from information_extraction_system_ray.stages.canonicalize import (
        connected_components, connected_components_driver,
        mention_entity_edges)

    ann = flagship_result["annotated"]
    edges = mention_entity_edges(ann).materialize()
    want = connected_components_driver(edges)
    got = connected_components(edges, driver_threshold=0, num_partitions=4)
    assert got == want


def test_dataset_cluster_path_matches_golden(ray_session, flagship_result,
                                             fixdir):
    """driver_threshold=0 forces the full Dataset path — cluster labels stay
    a Dataset and nodes/edges attach them by co-partitioned shuffle, never a
    driver dict — and the outputs must equal the broadcast-dict path's
    goldens exactly."""
    import ray.data as rd

    from information_extraction_system_ray.pipelines.flagship import \
        build_graph

    ann = flagship_result["annotated"]
    g = build_graph(ann, driver_threshold=0)
    assert isinstance(g["cluster"], rd.Dataset)

    nodes = _norm_nodes(g["nodes"].to_pandas())
    gold_nodes = _norm_nodes(pq.read_table(
        os.path.join(fixdir, "gold_nodes_tiny.parquet")).to_pandas())
    assert nodes.to_dict("records") == gold_nodes.to_dict("records")

    edges = g["edges"].to_pandas()
    edges["sample_urls"] = edges["sample_urls"].map(list)
    gold_edges = pq.read_table(
        os.path.join(fixdir, "gold_edges_tiny.parquet")).to_pandas()
    gold_edges["sample_urls"] = gold_edges["sample_urls"].map(list)
    assert edges.to_dict("records") == gold_edges.to_dict("records")


def test_kg_predicate_stats_matches_pandas_recomputation(ray_session):
    """kg_predicate_stats equals an independent pandas recomputation
    (count/sum/nunique per predicate) over the same materialized edge
    table — which is itself byte-golden-tested above."""
    import pandas as pd

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = e.queries()["kg_predicate_stats"](sf).to_pandas()

    edges = e.queries()["kg_graph"](sf).to_pandas()
    want = (edges.groupby("pred")
            .agg(n_edges=("pred", "size"),
                 n_support=("n_support", "sum"),
                 n_subjects=("subj_id", "nunique"),
                 n_objects=("obj_id", "nunique"))
            .reset_index().sort_values("pred").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, want.astype({"n_edges": "int64", "n_support": "int64",
                          "n_subjects": "int64", "n_objects": "int64"}))


def test_kg_wl_fingerprint_matches_pandas(ray_session):
    """kg_wl_fingerprint equals an independent single-process WL
    recomputation (degree-pair seed, 2 refinement rounds over sorted
    (dir, pred, neighbor-label) multisets, md5-hex8) over the same
    byte-golden edge table."""
    import hashlib

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = e.queries()["kg_wl_fingerprint"](sf).to_pandas()

    edges = e.queries()["kg_graph"](sf).to_pandas()
    adj: dict = {}
    for r in edges.itertuples():
        adj.setdefault(r.subj_id, []).append(("o", r.pred, r.obj_id))
        adj.setdefault(r.obj_id, []).append(("i", r.pred, r.subj_id))
    lbl = {}
    for node, nbrs in adj.items():
        out_c = sum(1 for d, _, _ in nbrs if d == "o")
        in_c = sum(1 for d, _, _ in nbrs if d == "i")
        lbl[node] = f"{out_c}/{in_c}"
    for _ in range(2):
        nxt = {}
        for node, nbrs in adj.items():
            parts = sorted(f"{d}:{p}:{lbl[v]}" for d, p, v in nbrs)
            sig = lbl[node] + "|" + ",".join(parts)
            nxt[node] = hashlib.md5(sig.encode()).hexdigest()[:8]
        lbl = nxt
    from collections import Counter
    hist = Counter(lbl.values())
    want = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(got["wl2_label"], got["n_nodes"])) == \
        [(k, v) for k, v in want]


def test_kg_ntriples_format_and_cover(ray_session):
    """kg_ntriples lines are exactly '<urn:g:S> <urn:g:p:P> <urn:g:O> .'
    for the lexicographically-first 50 edges of the same edge table."""
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = e.queries()["kg_ntriples"](sf).to_pandas()["line"].tolist()

    edges = e.queries()["kg_graph"](sf).to_pandas()
    want = sorted(
        f"<urn:g:{r.subj_id}> <urn:g:p:{r.pred}> <urn:g:{r.obj_id}> ."
        for r in edges.itertuples())[:50]
    assert got == want


def test_kg_twohop_patterns_matches_pandas(ray_session):
    """kg_twohop_patterns equals the pandas merge-on-middle-entity
    recomputation over the same edge table."""
    import pandas as pd

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = e.queries()["kg_twohop_patterns"](sf).to_pandas()

    edges = e.queries()["kg_graph"](sf).to_pandas()
    l = edges[["obj_id", "pred"]].rename(
        columns={"obj_id": "mid", "pred": "p1"})
    r = edges[["subj_id", "pred"]].rename(
        columns={"subj_id": "mid", "pred": "p2"})
    want = (l.merge(r, on="mid").groupby(["p1", "p2"])
            .size().reset_index(name="n_paths")
            .sort_values(["n_paths", "p1", "p2"],
                         ascending=[False, True, True])
            .head(25).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, want.astype({"n_paths": "int64"}), check_dtype=False)


def test_kg_reciprocity_matches_pandas(ray_session):
    """kg_reciprocity equals the pandas swap-merge recomputation over
    the same edge table."""
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = e.queries()["kg_reciprocity"](sf)

    edges = e.queries()["kg_graph"](sf).to_pandas()
    pairs = edges[["subj_id", "obj_id"]].drop_duplicates()
    fwd = set(zip(pairs["subj_id"], pairs["obj_id"]))
    n_recip = sum((d, s) in fwd for s, d in fwd)
    assert int(got["n_pairs"].iloc[0]) == len(fwd)
    assert int(got["n_reciprocal"].iloc[0]) == n_recip
    assert int(got["reciprocity_ppm"].iloc[0]) == \
        n_recip * 1_000_000 // max(len(fwd), 1)


def test_kg_complete_entities_matches_pandas(ray_session):
    """kg_complete_entities equals the pandas division recomputation."""
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = e.queries()["kg_complete_entities"](sf)

    edges = e.queries()["kg_graph"](sf).to_pandas()
    top3 = (edges.groupby("pred").size().reset_index(name="n")
            .sort_values(["n", "pred"], ascending=[False, True])
            .head(3)["pred"].tolist())
    req = sorted(top3)
    cov = (edges[edges["pred"].isin(req)][["subj_id", "pred"]]
           .drop_duplicates().groupby("subj_id").size())
    full = sorted(cov[cov == len(req)].index)
    assert int(got["n_complete"].iloc[0]) == len(full)
    assert got["required_preds"].iloc[0] == ",".join(req)
    assert got["first_entities"].iloc[0] == \
        ",".join(map(str, full[:10]))


def test_kg_scc_matches_tarjan(ray_session):
    """kg_scc equals a pure-Python Tarjan SCC size histogram over the
    same directed (subj_id, obj_id) edge table."""
    import collections
    import sys

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = e.queries()["kg_scc"](sf).to_pandas()

    edges = e.queries()["kg_graph"](sf).to_pandas()
    pairs = edges[["subj_id", "obj_id"]].drop_duplicates()
    adj, nodes = {}, set()
    for s, d in zip(pairs["subj_id"], pairs["obj_id"]):
        adj.setdefault(s, []).append(d)
        nodes.update((s, d))
    sys.setrecursionlimit(100000)
    idx, low, onstk, stk = {}, {}, set(), []
    sizes, cnt = [], [0]

    def strong(x):
        idx[x] = low[x] = cnt[0]
        cnt[0] += 1
        stk.append(x)
        onstk.add(x)
        for y in adj.get(x, []):
            if y not in idx:
                strong(y)
                low[x] = min(low[x], low[y])
            elif y in onstk:
                low[x] = min(low[x], idx[y])
        if low[x] == idx[x]:
            n = 0
            while True:
                w = stk.pop()
                onstk.discard(w)
                n += 1
                if w == x:
                    break
            sizes.append(n)

    for n in sorted(nodes):
        if n not in idx:
            strong(n)
    want = collections.Counter(sizes)
    assert {r["scc_size"]: r["n_sccs"]
            for _, r in got.iterrows()} == dict(want)


def test_kg_ontology_audit_matches_pandas(ray_session):
    """kg_ontology_audit equals a pandas recomputation with the same
    KG_ONTOLOGY over the same edge table."""
    import numpy as np
    import pandas as pd

    import __ray_entry__ as e
    from information_extraction_system_ray.queries import KG_ONTOLOGY

    sf = "/root/testdata/sf0.001"
    got = e.queries()["kg_ontology_audit"](sf).to_pandas() \
        .set_index("pred").sort_index()

    edges = e.queries()["kg_graph"](sf).to_pandas()

    def ty(x):
        return "NIL" if x.startswith("NIL:") else x.split("_")[0]

    st = edges["subj_id"].map(ty)
    ot = edges["obj_id"].map(ty)
    nil = (st == "NIL") | (ot == "NIL")
    dom_ok = [t in KG_ONTOLOGY.get(p, (frozenset(), frozenset()))[0]
              for p, t in zip(edges["pred"], st)]
    rng_ok = [t in KG_ONTOLOGY.get(p, (frozenset(), frozenset()))[1]
              for p, t in zip(edges["pred"], ot)]
    df = pd.DataFrame({
        "pred": edges["pred"],
        "n_edges": 1,
        "n_conforming": (~nil & np.array(dom_ok)
                         & np.array(rng_ok)).astype(int),
        "n_domain_viol": (~nil & ~np.array(dom_ok)).astype(int),
        "n_range_viol": (~nil & ~np.array(rng_ok)).astype(int),
        "n_unresolved": nil.astype(int)})
    want = df.groupby("pred").sum().sort_index()
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))


def test_kg_nil_clusters_and_conflicts_match_pandas(ray_session):
    """kg_nil_clusters == pandas surface-key grouping of the NIL nodes;
    kg_functional_conflicts == pandas multi-object detection on the
    functional predicates."""
    import pandas as pd

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"

    nodes = e.queries()["kg_nodes"](sf)
    if not isinstance(nodes, pd.DataFrame):
        nodes = nodes.to_pandas()
    nil = nodes[nodes["entity_id"].str.startswith("NIL:")].copy()
    nil["key"] = nil["canonical_surface"].str.lower() \
        .str.replace(r"[^a-z0-9]", "", regex=True)
    want = (nil.groupby("key")
            .agg(n_members=("entity_id", "size"),
                 n_mentions=("n_mentions", "sum"),
                 members=("entity_id",
                          lambda s: "|".join(sorted(s))))
            .reset_index().rename(columns={"key": "surface_key"})
            .sort_values(["n_mentions", "surface_key"],
                         ascending=[False, True]).head(20)
            .reset_index(drop=True))
    got = e.queries()["kg_nil_clusters"](sf).to_pandas() \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["surface_key", "n_members", "n_mentions", "members"]],
        want[["surface_key", "n_members", "n_mentions", "members"]],
        check_dtype=False)

    edges = e.queries()["kg_graph"](sf).to_pandas()
    f = edges[edges["pred"].isin(["born_in", "headquartered_in"])]
    rows = []
    for (p, s), g in f.groupby(["pred", "subj_id"]):
        by_obj = g.groupby("obj_id")["n_support"].sum() \
            .sort_values(ascending=False)
        if len(by_obj) >= 2:
            rows.append((p, s, len(by_obj), int(by_obj.iloc[0]),
                         int(by_obj.iloc[1])))
    want2 = pd.DataFrame(rows, columns=["pred", "subj_id", "n_objects",
                                        "top_support",
                                        "second_support"]) \
        .sort_values(["n_objects", "pred", "subj_id"],
                     ascending=[False, True, True]).head(20) \
        .reset_index(drop=True)
    got2 = e.queries()["kg_functional_conflicts"](sf).to_pandas() \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)


def test_kg_domain_yield_matches_pandas(ray_session):
    """kg_domain_yield's vectorized offset-diff counting equals a
    pandas explode-recompute over the same annotated corpus."""
    import re

    import pandas as pd

    import __ray_entry__ as e
    from information_extraction_system_ray.queries import _kg_run, kg_domain_yield

    sf = "/root/testdata/sf0.001"
    got = kg_domain_yield(sf).to_pandas().set_index("domain")

    ann = _kg_run(sf)["annotated"].to_pandas()
    rows = []
    for _, r in ann.iterrows():
        m = re.match(r"https?://([^/]+)/", r["url"])
        dom = m.group(1) if m else "?"
        ments = r["mentions"]
        nil = sum(1 for mm in ments
                  if str(mm["entity_id"]).startswith("NIL:"))
        rows.append((dom, 1, len(ments), nil, len(r["triples"])))
    df = (pd.DataFrame(rows, columns=["domain", "pages", "mentions",
                                      "nil", "triples"])
          .groupby("domain").sum())
    assert set(got.index) == set(df.index)
    for dom, r in df.iterrows():
        g = got.loc[dom]
        p, m = int(r["pages"]), int(r["mentions"])
        assert int(g["n_pages"]) == p
        assert int(g["n_mentions"]) == m
        assert int(g["n_triples"]) == int(r["triples"])
        assert int(g["mentions_per_page_milli"]) == \
            (2000 * m + p) // (2 * p)
        assert int(g["nil_rate_ppm"]) == \
            int(r["nil"]) * 1_000_000 // max(1, m)
