"""Union-find / connected-components properties (SURVEY.md §5 items 5-6)."""

import random

from hypothesis import given, settings, strategies as st

from refimpl.unionfind import UnionFind


def _uf_clusters(edges):
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return uf.components()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                max_size=60), st.randoms())
def test_unionfind_permutation_invariant(pairs, rnd):
    edges = [(f"n{a:02d}", f"n{b:02d}") for a, b in pairs]
    base = _uf_clusters(edges)
    shuffled = edges[:]
    rnd.shuffle(shuffled)
    assert _uf_clusters(shuffled) == base


def test_unionfind_min_label():
    uf = UnionFind()
    uf.union("c", "b")
    uf.union("x", "y")
    uf.union("b", "a")
    comp = uf.components()
    assert comp["c"] == "a" and comp["b"] == "a" and comp["a"] == "a"
    assert comp["x"] == "x" and comp["y"] == "x"


def test_distributed_cc_random_graphs(ray_session):
    """Label propagation == driver union-find on random bipartite graphs."""
    import pyarrow as pa
    import ray.data as rd

    from information_extraction_system_ray.stages.canonicalize import (
        connected_components_distributed, _uf_components_from_iter)

    rng = random.Random(7)
    for trial in range(3):
        edges = sorted({
            (f"s::{rng.randrange(20)}", f"E_{rng.randrange(15):03d}")
            for _ in range(40)
        })
        ds = rd.from_arrow(pa.table({
            "src": [e[0] for e in edges], "dst": [e[1] for e in edges],
        })).repartition(4)
        want = _uf_components_from_iter(
            [pa.table({"src": [e[0] for e in edges],
                       "dst": [e[1] for e in edges]})])
        labels = connected_components_distributed(ds, num_partitions=2)
        got = {r["node"]: r["label"]
               for r in labels.iter_rows()}
        assert got == want


def test_skewed_hot_key_partial_dedup(ray_session, fixdir):
    """Head-entity skew fixture: the hot surface ("Wikipedia", ~30% of ORG
    slots) must collapse to ONE distinct edge; per-batch partial dedup bounds
    what any reducer sees (SURVEY.md §4 skew)."""
    import os

    import ray.data as rd

    from information_extraction_system_ray.stages.canonicalize import \
        mention_entity_edges

    ann_pages = rd.read_parquet(os.path.join(fixdir, "pages_tiny.parquet"))
    from information_extraction_system_ray.pipelines.flagship import annotate
    ann = annotate(ann_pages, num_parts=8, concurrency=(1, 2))
    edges = mention_entity_edges(ann).to_pandas()
    # distinct edge set contains the hot surface exactly once per entity
    hot = edges[edges["src"] == "s::wikipedia"]
    assert len(hot) == len(hot.drop_duplicates())
    assert 1 <= len(hot) <= 3  # hot surface collapses to O(candidates) edges


def test_distributed_cc_hot_hub_large(ray_session):
    """VERDICT r2 next-#8: force the DISTRIBUTED path on a larger
    synthetic graph with a ~30%-hot hub surface and assert exact parity
    with the driver union-find plus bounded convergence (the
    ``max_rounds`` guard doubles as the wall-time bound — star + short
    chains keep the diameter small, so label propagation must converge
    in a handful of rounds, not drift toward the 50-round ceiling)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from information_extraction_system_ray.stages.canonicalize import (
        _uf_components_from_iter, connected_components_distributed)

    rng = np.random.default_rng(3)
    n = 100_000
    hot = int(n * 0.3)
    hub_dst = np.char.add("E_", rng.integers(0, 20_000, hot).astype(str))
    src_hot = np.full(hot, "s::hub")
    rest = n - hot
    a = rng.integers(0, 40_000, rest)
    src_r = np.char.add("s::", a.astype(str))
    dst_r = np.char.add(
        "E_", ((a * 7 + rng.integers(0, 3, rest)) % 20_000).astype(str))
    t = pa.table({
        "src": pa.array(np.concatenate([src_hot, src_r])),
        "dst": pa.array(np.concatenate([hub_dst, dst_r]))})

    labels = connected_components_distributed(
        rd.from_arrow(t).repartition(8), num_partitions=8, max_rounds=12)
    lab = labels.to_pandas()
    want = _uf_components_from_iter([t])
    got = dict(zip(lab["node"], lab["label"]))
    assert got == want
