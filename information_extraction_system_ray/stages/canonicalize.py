"""G2 — distributed canonicalization (SURVEY.md §2.5 G2, §7 hard parts).

Semantics (shared with refimpl.oracle.canonicalize): build the bipartite
graph of observed (surface-node, entity-node) co-links and take connected
components; a component's cluster id is the lexicographic MIN member entity
id (surface nodes carry an "s::" prefix so they never win). Min-label ids
make clustering permutation-invariant — required for resume/rerun equality.

Scale design:
- the 10^12-row mention stream is collapsed to the DISTINCT edge set with a
  per-batch partial dedup BEFORE the shuffle (the combiner pattern): the head
  entity ("Wikipedia"-scale hubs) contributes at most one edge per batch per
  alias, so no reducer sees the raw hot-key volume.
- components over the distinct edges: driver union-find when the edge set is
  provably small (streamed via iter_batches, bounded memory), else iterated
  distributed min-label propagation (hash-join labels onto edges, propagate
  min across each edge, groupby-min per node) until fixpoint — 2 joins + 1
  groupby per round over the (small) distinct-edge set, rounds bounded by
  component diameter (star-shaped here ⇒ a handful).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Min

from refimpl.unionfind import UnionFind


def _explode_mention_edges(batch: pa.Table) -> pa.Table:
    lst = batch["mentions"]
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = pc.list_flatten(lst)
    surf = pc.utf8_lower(pc.struct_field(flat, "surface"))
    src = pc.binary_join_element_wise(
        pa.array(["s::"] * len(surf), pa.string()), surf, "")
    dst = pc.struct_field(flat, "entity_id")
    t = pa.table({"src": src, "dst": dst})
    # per-batch partial dedup: the combiner that defuses head-entity skew
    return t.group_by(["src", "dst"]).aggregate([]).select(["src", "dst"])


def partial_mention_edges(annotated: ray.data.Dataset) -> ray.data.Dataset:
    """annotated(mentions=list<struct>) → per-batch-deduped (src, dst) edges.
    NOT globally distinct — union-find tolerates duplicates, so the driver
    path consumes this directly and skips a whole shuffle; only the
    distributed label-propagation path needs the global distinct."""
    return annotated.map_batches(_explode_mention_edges,
                                 batch_format="pyarrow")


def distinct_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Global distinct over (already partially-collapsed) edges (shuffle)."""
    return (edges.groupby(["src", "dst"]).aggregate(Count())
            .select_columns(["src", "dst"]))


def mention_entity_edges(annotated: ray.data.Dataset) -> ray.data.Dataset:
    """annotated(mentions=list<struct>) → distinct (src, dst) edge Dataset."""
    return distinct_edges(partial_mention_edges(annotated))


def _uf_components_from_iter(edge_batches) -> dict[str, str]:
    uf = UnionFind()
    for b in edge_batches:
        for s, d in zip(b["src"].to_pylist(), b["dst"].to_pylist()):
            uf.union(s, d)
    return uf.components()


_COMBINE_PARTS = 16


def _distinct_batch(t: pa.Table) -> pa.Table:
    return t.group_by(["src", "dst"]).aggregate([]).select(["src", "dst"])


def second_level_dedup(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Coalesce (no shuffle) + per-block distinct: every block of the
    partial edge stream repeats the same hot pairs, so this collapses the
    driver-bound volume ~blocks/_COMBINE_PARTS× for the cost of a narrow
    map — no sort-shuffle needed because union-find doesn't require GLOBAL
    distinctness, just less duplication."""
    return edges.repartition(_COMBINE_PARTS).map_batches(
        _distinct_batch, batch_format="pyarrow")


def connected_components_driver(edges: ray.data.Dataset) -> dict[str, str]:
    """Small-edge-set path: stream distinct edges to the driver union-find."""
    comp = _uf_components_from_iter(
        edges.iter_batches(batch_size=65536, batch_format="pyarrow"))
    return {k: v for k, v in comp.items() if not k.startswith("s::")}


def _rename(ds: ray.data.Dataset, mapping: dict[str, str]) -> ray.data.Dataset:
    return ds.rename_columns(mapping)


def connected_components_distributed(
        edges: ray.data.Dataset, *, num_partitions: int = 16,
        max_rounds: int = 50) -> ray.data.Dataset:
    """Min-label propagation over (src, dst) edges → Dataset(node, label).

    Each round:  L'[x] = min(L[x], min_{(x,y) in E} L[y])  for both edge
    directions, via two hash joins + a groupby-min; stop when no label
    changed. Deterministic (min is order-free).
    """
    edges = edges.materialize()
    nodes = (edges.select_columns(["src"]).rename_columns({"src": "node"})
             .union(edges.select_columns(["dst"])
                    .rename_columns({"dst": "node"}))
             .groupby("node").aggregate(Count())
             .select_columns(["node"]))
    labels = nodes.map_batches(
        lambda b: pa.table({"node": b["node"], "label": b["node"]}),
        batch_format="pyarrow").materialize()

    for _ in range(max_rounds):
        with_src = edges.join(
            _rename(labels, {"node": "src", "label": "src_lbl"}),
            join_type="inner", num_partitions=num_partitions, on=("src",))
        both = with_src.join(
            _rename(labels, {"node": "dst", "label": "dst_lbl"}),
            join_type="inner", num_partitions=num_partitions, on=("dst",))
        both = both.materialize()
        msgs_to_dst = both.map_batches(
            lambda b: pa.table({"node": b["dst"], "cand": b["src_lbl"]}),
            batch_format="pyarrow")
        msgs_to_src = both.map_batches(
            lambda b: pa.table({"node": b["src"], "cand": b["dst_lbl"]}),
            batch_format="pyarrow")
        self_msgs = labels.map_batches(
            lambda b: pa.table({"node": b["node"], "cand": b["label"]}),
            batch_format="pyarrow")
        new_labels = (msgs_to_dst.union(msgs_to_src, self_msgs)
                      .groupby("node")
                      .aggregate(Min("cand", alias_name="label"))
                      .materialize())
        changed = (new_labels.join(
            _rename(labels, {"label": "old"}), join_type="inner",
            num_partitions=num_partitions, on=("node",))
            .map_batches(
                lambda b: pa.table({"chg": pc.cast(
                    pc.not_equal(b["label"], b["old"]), pa.int64())}),
                batch_format="pyarrow")
            .sum("chg"))
        labels = new_labels
        if not changed:
            break
    else:
        raise RuntimeError("label propagation did not converge "
                           f"in {max_rounds} rounds")
    return labels


def connected_components(edges: ray.data.Dataset, *,
                         driver_threshold: int = 2_000_000,
                         num_partitions: int = 16,
                         distinct: bool = True) -> dict[str, str]:
    """entity_id → cluster id. Uses the driver union-find under
    ``driver_threshold`` edge rows, else distributed label propagation (then
    collects the entity→cluster map, which is ≤ #entities rows — the small
    output of the wide computation).

    ``edges`` may contain duplicate rows (pass distinct=False): the driver
    union-find absorbs them for free, so the flagship feeds PARTIAL-deduped
    edges straight in and skips the global-distinct shuffle entirely on the
    driver path; the distributed path inserts it (label-prop cost scales
    with edge rows, so there it pays for itself)."""
    edges = edges.materialize()  # count() + downstream reuse: execute ONCE
    n = edges.count()
    if n <= driver_threshold:
        if not distinct and n > 100_000:
            edges = second_level_dedup(edges)
        return connected_components_driver(edges)
    if not distinct:
        edges = distinct_edges(edges)
    labels = connected_components_distributed(
        edges, num_partitions=num_partitions)
    out: dict[str, str] = {}
    for b in labels.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for node, lbl in zip(b["node"].to_pylist(), b["label"].to_pylist()):
            if not node.startswith("s::"):
                out[node] = lbl
    return out
