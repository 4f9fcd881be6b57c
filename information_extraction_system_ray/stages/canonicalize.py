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
  provably small (streamed via iter_batches, bounded memory), else the
  Pregel-style shard-actor min-label propagation in stages/pregel.py —
  edges hash-partition once into actor memory, rounds exchange only
  changed-label minima, rounds bounded by component diameter
  (star-shaped here ⇒ a handful).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count

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


def connected_components_distributed(
        edges: ray.data.Dataset, *, num_partitions: int = 16,
        max_rounds: int = 50) -> ray.data.Dataset:
    """Min-label propagation over (src, dst) edges → Dataset(node, label):
    L'[x] = min(L[x], min_{(x,y)∈E} L[y]) per round, both directions,
    until no label changes. Deterministic (min is order-free).

    Round-3 implementation: the generic Pregel shard-actor ring in
    stages/pregel.py (mode="minlabel") — edges hash-partition ONCE into
    per-shard actor memory, rounds exchange only changed-label minima
    shard→shard via object-store refs. 8× faster than the r2 per-round
    groupby formulation at 10⁶ edges (445 s → 55 s, ~1.7 s/round); see
    pregel.py for the full design + partitioning assumption."""
    from .pregel import run_propagation

    return run_propagation(edges, mode="minlabel",
                           num_partitions=num_partitions,
                           max_rounds=max_rounds)


def cluster_labels(edges: ray.data.Dataset, *,
                   driver_threshold: int = 2_000_000,
                   num_partitions: int = 16,
                   distinct: bool = True
                   ) -> "dict[str, str] | ray.data.Dataset":
    """entity_id → cluster id, as a driver DICT under ``driver_threshold``
    edge rows (union-find fast path; streamed, bounded memory), else as a
    DATASET(node, label) from distributed label propagation — above the
    threshold nothing entity-sized ever lands on the driver; downstream
    attaches cluster ids with :func:`attach_labels` instead of a broadcast
    dict (a KG at 10^12 pages can hold 10^9+ entities).

    ``edges`` may contain duplicate rows (pass distinct=False). The path
    chooser compares the DISTINCT pair count against the threshold — CC
    complexity is a function of distinct edges, not raw mention volume
    (r5 fix: at sf1 the corpus-proportional mention stream is ~3.6M rows
    collapsing to ~5k distinct pairs; choosing on raw rows sent the
    flagship to 52 s of label propagation where the global-distinct
    shuffle + driver union-find takes ~3 s. At true web scale the
    distinct pair set itself grows past the threshold and the
    distributed path still engages — the criterion is now the right
    quantity). Small raw inputs skip even the distinct shuffle: the
    union-find absorbs duplicates for free."""
    edges = edges.materialize()  # count() + downstream reuse: execute ONCE
    n = edges.count()
    if n <= driver_threshold:
        # raw volume already driver-sized: the union-find absorbs
        # duplicates for free, so only a narrow per-block dedup runs
        if not distinct and n > 100_000:
            edges = second_level_dedup(edges)
        return connected_components_driver(edges)
    if not distinct:
        # global distinct (skinny 2-column shuffle) collapses the
        # duplicate-heavy mention stream to the real edge set, then the
        # path RE-chooses on the count that CC complexity actually
        # depends on
        edges = distinct_edges(edges).materialize()
        n = edges.count()
        if n <= driver_threshold:
            return connected_components_driver(edges)
    labels = connected_components_distributed(
        edges, num_partitions=num_partitions)
    # drop surface nodes — only entity→cluster rows flow downstream
    return labels.map_batches(
        lambda t: t.filter(pc.invert(pc.starts_with(t["node"], "s::"))),
        batch_format="pyarrow")


def connected_components(edges: ray.data.Dataset, *,
                         driver_threshold: int = 2_000_000,
                         num_partitions: int = 16,
                         distinct: bool = True) -> dict[str, str]:
    """Dict-contract wrapper over :func:`cluster_labels` (tests / callers
    that need the map in memory; the output is ≤ #entities rows — the small
    output of the wide computation)."""
    res = cluster_labels(edges, driver_threshold=driver_threshold,
                         num_partitions=num_partitions, distinct=distinct)
    if isinstance(res, dict):
        return res
    out: dict[str, str] = {}
    for b in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
        out.update(zip(b["node"].to_pylist(), b["label"].to_pylist()))
    return out


def attach_labels(ds: ray.data.Dataset, labels: ray.data.Dataset,
                  key_col: str, *,
                  num_partitions: int = 16) -> ray.data.Dataset:
    """Replace ``ds[key_col]`` with its cluster label from
    ``labels(node, label)`` — identity where no label exists — WITHOUT any
    driver-side dict: both sides are hash-co-partitioned on the key and one
    vectorized lookup runs per partition (the same union+groupby
    co-partition trick label propagation uses; Ray hash joins would spawn
    per-partition aggregator actors instead).

    Output schema == input schema (key values rewritten), pinned explicitly
    so empty / label-free partitions can't drift block schemas."""
    import pandas as pd

    schema = ds.schema().base_schema
    names = list(schema.names)
    out_schema = pa.schema([(n, schema.field(n).type) for n in names])
    key_idx = names.index(key_col)

    def _part(t: pa.Table, col: str) -> pa.Array:
        h = pd.util.hash_pandas_object(
            pd.Series(t[col].to_pandas()), index=False) % num_partitions
        return pa.array(h.to_numpy(), pa.int64())

    def tag_data(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in names}
        cols["_lab"] = pa.nulls(len(t), pa.string())
        cols["_apart"] = _part(t, key_col)
        return pa.table(cols)

    def tag_lab(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {c: (t["node"] if c == key_col
                    else pa.nulls(n, schema.field(c).type)) for c in names}
        cols["_lab"] = t["label"]
        cols["_apart"] = _part(t, "node")
        return pa.table(cols)

    def fix(part: pa.Table) -> pa.Table:
        is_lab = pc.is_valid(part["_lab"])
        lab = part.filter(is_lab)
        data = part.filter(pc.invert(is_lab))
        if data.num_rows == 0:
            return out_schema.empty_table()
        # only this partition's own labels — never the whole map
        lut = dict(zip(lab[key_col].to_pylist(), lab["_lab"].to_pylist()))
        mapped = pa.array([lut.get(k, k)
                           for k in data[key_col].to_pylist()], pa.string())
        out = data.drop_columns(["_lab", "_apart"]) \
            .set_column(key_idx, key_col, mapped)
        return out.cast(out_schema)

    return (ds.map_batches(tag_data, batch_format="pyarrow")
            .union(labels.map_batches(tag_lab, batch_format="pyarrow"))
            .groupby("_apart")
            .map_groups(fix, batch_format="pyarrow"))
