"""Distributed PageRank vs a dense numpy reference (dangling nodes,
parallel edges, hubs). Both sides run the SAME number of power-iteration
rounds from the same uniform start, so they agree to float tolerance
without needing full convergence (each Ray round is seconds of shuffle
overhead)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

_ITERS = 8


def _numpy_pagerank(edges, nodes, damping=0.85, iters=_ITERS):
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    for s, d in edges:
        M[idx[d], idx[s]] += 1.0
    deg = M.sum(axis=0)
    out = deg > 0
    M[:, out] /= deg[out]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[~out].sum()
        r = (1 - damping) / n + damping * (M @ r + dangling / n)
    return {nodes[i]: r[i] for i in range(n)}


def _run(ray_session, edge_list, max_iters=_ITERS, tol=0.0):
    import ray.data as rd

    from information_extraction_system_ray.stages.pagerank import pagerank

    df = pd.DataFrame(edge_list, columns=["src", "dst"])
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(4)
    out = pagerank(ds, max_iters=max_iters, tol=tol,
                   num_partitions=4).to_pandas()
    return dict(zip(out["node"], out["rank"]))


def test_pagerank_simple_cycle_uniform(ray_session):
    # uniform IS the fixpoint → tol triggers after one round
    got = _run(ray_session, [("a", "b"), ("b", "c"), ("c", "a")],
               max_iters=50, tol=1e-12)
    for v in got.values():
        assert abs(v - 1 / 3) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_matches_numpy_with_dangling_and_hubs(ray_session):
    rng = np.random.default_rng(13)
    nodes = [f"n{i}" for i in range(40)]
    edges = []
    for _ in range(160):
        s = nodes[int(rng.integers(0, 40))]
        # hub: 30% of links point at n0
        d = "n0" if rng.random() < 0.3 else nodes[int(rng.integers(0, 40))]
        if s != d:
            edges.append((s, d))
    # guaranteed dangling node (in-links only)
    edges = [e for e in edges if e[0] != "n39"] + [("n1", "n39")]

    got = _run(ray_session, edges)
    univ = sorted({x for e in edges for x in e})
    want = _numpy_pagerank(edges, univ)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    assert abs(sum(got.values()) - 1.0) < 1e-6
    # the hub outranks everyone
    assert got["n0"] == max(got.values())


def test_pagerank_parallel_edges_weight_links(ray_session):
    # two parallel a→b edges vs one a→c: b inherits more of a's mass
    got = _run(ray_session, [("a", "b"), ("a", "b"), ("a", "c"),
                             ("b", "a"), ("c", "a")], max_iters=6)
    assert got["b"] > got["c"]


# ---------------------------------------------------------------------------
# HITS (stages/hits.py) — same contract style: distributed == dense numpy
# reference, identical iteration count, 1e-9 gate
# ---------------------------------------------------------------------------

def _run_hits(edge_list, iters=6):
    import ray.data as rd

    from information_extraction_system_ray.stages.hits import hits

    df = pd.DataFrame(edge_list, columns=["src", "dst"])
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(4)
    out = hits(ds, iters=iters, num_partitions=4).to_pandas()
    return {r.node: (r.hub, r.auth) for r in out.itertuples()}


def test_hits_matches_numpy_reference(ray_session):
    from information_extraction_system_ray.stages.hits import hits_reference

    rng = np.random.default_rng(29)
    nodes = [f"n{i}" for i in range(30)]
    edges = []
    for _ in range(150):
        s = nodes[int(rng.integers(0, 30))]
        # authority hub: 25% of links point at n0
        d = "n0" if rng.random() < 0.25 else nodes[int(rng.integers(0, 30))]
        if s != d:
            edges.append((s, d))
    got = _run_hits(edges)
    want = hits_reference(edges, iters=6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k][0] - want[k][0]) < 1e-9, ("hub", k)
        assert abs(got[k][1] - want[k][1]) < 1e-9, ("auth", k)
    # the in-link magnet is the top authority
    assert got["n0"][1] == max(v[1] for v in got.values())


def test_hits_bipartite_separates_hubs_from_authorities(ray_session):
    # h1/h2 only point, a1/a2 are only pointed at — hub and authority
    # mass must land on disjoint node sets
    edges = [("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("h2", "a2"),
             ("h2", "a2")]  # parallel edge weights h2's endorsement
    got = _run_hits(edges, iters=8)
    assert got["h1"][1] == 0.0 and got["h2"][1] == 0.0
    assert got["a1"][0] == 0.0 and got["a2"][0] == 0.0
    assert got["h2"][0] > got["h1"][0]       # extra link ⇒ stronger hub
    assert got["a2"][1] > got["a1"][1]
    # L2 normalization holds on each side
    assert abs(sum(v[0] ** 2 for v in got.values()) - 1.0) < 1e-9
    assert abs(sum(v[1] ** 2 for v in got.values()) - 1.0) < 1e-9


def test_hits_layout_invariance(ray_session):
    import ray.data as rd

    from information_extraction_system_ray.stages.hits import hits

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    t = pa.Table.from_pandas(df, preserve_index=False)
    one = {r.node: (r.hub, r.auth)
           for r in hits(rd.from_arrow(t).repartition(1), iters=5,
                         num_partitions=2).to_pandas().itertuples()}
    many = {r.node: (r.hub, r.auth)
            for r in hits(rd.from_arrow(t).repartition(5), iters=5,
                          num_partitions=3).to_pandas().itertuples()}
    assert set(one) == set(many)
    for k in one:
        assert abs(one[k][0] - many[k][0]) < 1e-12, k
        assert abs(one[k][1] - many[k][1]) < 1e-12, k


# ---------------------------------------------------------------------------
# personalized PageRank (seeded teleport) — same dense numpy contract
# ---------------------------------------------------------------------------

def _numpy_ppr(edges, nodes, seeds, damping=0.85, iters=_ITERS):
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    for s, d in edges:
        M[idx[d], idx[s]] += 1.0
    deg = M.sum(axis=0)
    out = deg > 0
    M[:, out] /= deg[out]
    sv = np.zeros(n)
    present = [s for s in seeds if s in idx]
    for s in present:
        sv[idx[s]] = 1.0 / len(set(seeds))
    r = sv.copy()
    for _ in range(iters):
        dangling = r[~out].sum()
        r = (1 - damping) * sv + damping * dangling * sv + damping * (M @ r)
    return {nodes[i]: r[i] for i in range(n)}


def test_personalized_pagerank_matches_numpy(ray_session):
    import ray.data as rd

    from information_extraction_system_ray.stages.pagerank import pagerank

    rng = np.random.default_rng(41)
    nodes = [f"n{i}" for i in range(25)]
    edges = []
    for _ in range(120):
        s = nodes[int(rng.integers(0, 25))]
        d = nodes[int(rng.integers(0, 25))]
        if s != d:
            edges.append((s, d))
    seeds = ["n0", "n1"]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(4)
    got = {r["node"]: r["rank"]
           for r in pagerank(ds, max_iters=_ITERS, tol=0.0,
                             num_partitions=4, seeds=seeds).take_all()}
    univ = sorted({x for e in edges for x in e})
    want = _numpy_ppr(edges, univ, seeds)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    # teleport concentrates mass near the seeds: each seed outranks
    # the median node
    med = float(np.median(list(got.values())))
    assert got["n0"] > med and got["n1"] > med


def test_ppr_unreachable_component_gets_zero(ray_session):
    import ray.data as rd

    from information_extraction_system_ray.stages.pagerank import pagerank

    # two disjoint cycles; seeding in one must leave the other at 0
    edges = [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = {r["node"]: r["rank"]
           for r in pagerank(ds, max_iters=6, tol=0.0, num_partitions=2,
                             seeds=["a"]).take_all()}
    assert got["x"] == 0.0 and got["y"] == 0.0
    assert got["a"] > 0.0 and got["b"] > 0.0
    assert abs(sum(got.values()) - 1.0) < 1e-9   # no dangling: mass kept
