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
