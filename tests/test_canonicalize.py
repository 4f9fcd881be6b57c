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
