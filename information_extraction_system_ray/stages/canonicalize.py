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


@ray.remote(num_cpus=0)
class _CCShard:
    """One hash partition of the bidirectional edge list, held in actor
    memory ACROSS rounds (the Pregel worker pattern — the one piece of
    state Ray Data cannot express: persistent partitioning between
    iterations). Edges ship to their shard exactly once; every round
    exchanges only per-destination MIN label candidates of nodes whose
    label changed (delta pushing), so round cost decays as the
    propagation converges instead of re-shipping the edge list."""

    def __init__(self, pid: int, num_parts: int) -> None:
        self.pid = pid
        self.P = num_parts
        self._pend_nodes: "list[np.ndarray]" = []
        self._pend_others: "list[np.ndarray]" = []
        self.outbox: "dict[int, tuple]" = {}
        self.inbox: "list[tuple]" = []

    def add_edges(self, nodes, others) -> None:
        self._pend_nodes.append(np.asarray(nodes, dtype=object))
        self._pend_others.append(np.asarray(others, dtype=object))

    def build(self) -> int:
        import pandas as pd
        if self._pend_nodes:
            df = pd.DataFrame({
                "node": np.concatenate(self._pend_nodes),
                "other": np.concatenate(self._pend_others),
            }).drop_duplicates()
        else:
            df = pd.DataFrame({"node": np.array([], dtype=object),
                               "other": np.array([], dtype=object)})
        self._pend_nodes = self._pend_others = None
        self.nodes, inv = np.unique(df["node"].to_numpy(),
                                    return_inverse=True)
        self.edge_src = inv.astype(np.int64)
        self.edge_dst = df["other"].to_numpy()
        self.dst_part = (pd.util.hash_pandas_object(
            df["other"], index=False) % self.P).to_numpy().astype(np.int64)
        self.labels = self.nodes.copy()
        self.changed = np.ones(len(self.nodes), dtype=bool)
        return int(len(self.nodes))

    def push(self) -> None:
        import pandas as pd
        self.outbox = {}
        if len(self.edge_src) == 0:
            return
        m = self.changed[self.edge_src]
        if not m.any():
            return
        df = pd.DataFrame({"dst": self.edge_dst[m],
                           "cand": self.labels[self.edge_src[m]],
                           "p": self.dst_part[m]})
        # per-destination min BEFORE the exchange (combiner: a hub node
        # receives one candidate per shard, not one per edge)
        g = df.groupby(["p", "dst"], sort=False)["cand"].min().reset_index()
        for p, sub in g.groupby("p", sort=False):
            self.outbox[int(p)] = (sub["dst"].to_numpy(),
                                   sub["cand"].to_numpy())

    def take_outbox(self, dest: int):
        return self.outbox.get(dest)

    def recv(self, payload) -> None:
        if payload is not None:
            self.inbox.append(payload)

    def apply(self) -> int:
        import pandas as pd
        self.changed[:] = False
        if not self.inbox:
            return 0
        dst = np.concatenate([p[0] for p in self.inbox])
        cand = np.concatenate([p[1] for p in self.inbox])
        self.inbox = []
        g = pd.DataFrame({"dst": dst, "cand": cand}) \
            .groupby("dst", sort=False)["cand"].min()
        # every destination exists in this shard: edges are bidirectional,
        # so any node referenced as dst also appears as a node row in its
        # own hash partition (self.nodes is np.unique → sorted)
        idx = np.searchsorted(self.nodes, g.index.to_numpy())
        best = g.to_numpy()
        better = best < self.labels[idx]
        if better.any():
            self.labels[idx[better]] = best[better]
            self.changed[idx[better]] = True
        return int(better.sum())

    def labels_table(self) -> pa.Table:
        return pa.table({"node": pa.array(self.nodes, pa.string()),
                         "label": pa.array(self.labels, pa.string())})


def connected_components_distributed(
        edges: ray.data.Dataset, *, num_partitions: int = 16,
        max_rounds: int = 50) -> ray.data.Dataset:
    """Min-label propagation over (src, dst) edges → Dataset(node, label):
    L'[x] = min(L[x], min_{(x,y)∈E} L[y]) per round, both directions,
    until no label changes. Deterministic (min is order-free).

    Round-3 rewrite as a PREGEL-STYLE ACTOR RING (_CCShard): the r2
    formulation expressed each round as two Ray Data sort-shuffles over a
    union of the edge and label lists — correct, but it re-shipped the
    edge list every round (~44 s/round at 10⁶ edges) because a Dataset
    cannot keep a partitioning alive between iterations. This is the
    documented raw-actor escape hatch (system prompt: "a shared mutable
    index"): edges hash-partition ONCE into per-shard actor memory, and a
    round is push (per-destination min of changed labels, combiner
    applied shard-side) → P×P outbox handoff (object store refs — the
    driver never touches payloads) → apply (vectorized searchsorted min).
    Round cost is proportional to the still-changing frontier, the
    classic Pregel decay. Rounds bound: component diameter ≤ max_rounds.

    Partitioning assumption (documented per SURVEY §4): a shard holds its
    hash partition of the DISTINCT bidirectional edge set in memory —
    size ≈ 2·|E|/P; pick num_partitions so that holds per node. The
    driver holds only per-round changed COUNTS. Shards are declared
    ``num_cpus=0`` (coordinator-style): at most P push/apply calls run at
    once and each is a short vectorized burst, so they self-throttle,
    and reserving whole CPUs for P=16 shards would deadlock small
    clusters (e.g. the 4-CPU test fixture) against the routing tasks."""
    import pandas as pd

    P = num_partitions
    shards = [_CCShard.remote(p, P) for p in range(P)]

    def route(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays([t["src"].combine_chunks(),
                                 t["dst"].combine_chunks()])
        other = pa.concat_arrays([t["dst"].combine_chunks(),
                                  t["src"].combine_chunks()])
        narr = node.to_numpy(zero_copy_only=False)
        oarr = other.to_numpy(zero_copy_only=False)
        part = (pd.util.hash_pandas_object(
            pd.Series(narr), index=False) % P).to_numpy()
        refs = []
        for p in range(P):
            m = part == p
            if m.any():
                refs.append(shards[p].add_edges.remote(narr[m], oarr[m]))
        ray.get(refs)       # delivery barrier before the task completes
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    try:
        # ships every edge to its shard exactly once
        edges.map_batches(route, batch_format="pyarrow").materialize()
        ray.get([s.build.remote() for s in shards])

        for _ in range(max_rounds):
            ray.get([s.push.remote() for s in shards])
            recvs = []
            for q in range(P):
                for p in range(P):
                    # ref-to-ref handoff: payloads move shard→shard via
                    # the object store, never through the driver
                    recvs.append(shards[p].recv.remote(
                        shards[q].take_outbox.remote(p)))
            ray.get(recvs)
            changed = sum(ray.get([s.apply.remote() for s in shards]))
            if changed == 0:
                break
        else:
            raise RuntimeError("label propagation did not converge "
                               f"in {max_rounds} rounds")
        tables = [t for t in ray.get(
            [s.labels_table.remote() for s in shards]) if t.num_rows]
        if not tables:
            tables = [pa.schema([("node", pa.string()),
                                 ("label", pa.string())]).empty_table()]
        return ray.data.from_arrow(tables)
    finally:
        for s in shards:
            ray.kill(s)


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
