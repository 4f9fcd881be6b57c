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


def connected_components_distributed(
        edges: ray.data.Dataset, *, num_partitions: int = 16,
        max_rounds: int = 50) -> ray.data.Dataset:
    """Min-label propagation over (src, dst) edges → Dataset(node, label).

    Each round: L'[x] = min(L[x], min_{(x,y) in E} L[y]) for both edge
    directions; stop when no label changed. Deterministic (min is
    order-free).

    JOIN-FREE formulation: Ray hash joins spawn aggregator actors per call,
    which made a join-per-round design ~25 s/round regardless of data size.
    Instead each round is a UNION of the bidirectional edge list with the
    label list, co-partitioned by hash(node), where one vectorized pandas
    pass per partition (a) resolves each node's current label and pushes it
    along its edges, then (b) takes the per-node min of pushed candidates
    and flags changes — two sort-shuffles of (node, cand) strings per
    round, no actors, no joins. Rounds are bounded by component diameter.

    This is the FALLBACK for edge sets too big for one machine: it re-ships
    the edge list every round (Ray Data has no persistent partitioning), so
    prefer raising ``driver_threshold`` as far as driver memory allows
    (~50M distinct edges ≈ 10 GB heap ≈ tens of seconds of union-find) —
    the mention-edge set after the partial-dedup combiner is ≤
    #surfaces × #entities, orders of magnitude below the page count.
    """
    import pandas as pd

    from ..functions.lineage import snapshot

    P = num_partitions

    def _with_part(col: str):
        def add(t: pa.Table) -> pa.Table:
            part = (pd.util.hash_pandas_object(
                pd.Series(t[col].to_pandas()), index=False) % P).to_numpy()
            return t.append_column("part", pa.array(part, pa.int64()))
        return add

    def bidir(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays([t["src"].combine_chunks(),
                                 t["dst"].combine_chunks()])
        other = pa.concat_arrays([t["dst"].combine_chunks(),
                                  t["src"].combine_chunks()])
        return pa.table({"node": node, "other": other})

    bi = edges.map_batches(bidir, batch_format="pyarrow") \
        .map_batches(_with_part("node"), batch_format="pyarrow") \
        .materialize()

    def init_labels(part: pd.DataFrame) -> pd.DataFrame:
        nodes = part["node"].drop_duplicates()
        return pd.DataFrame({"node": nodes, "label": nodes})

    labels = (bi.groupby("part").map_groups(init_labels,
                                            batch_format="pandas")
              .map_batches(_with_part("node"), batch_format="pyarrow")
              .materialize())

    def push(part: pd.DataFrame) -> pd.DataFrame:
        lab = part[part["other"].isna()]
        ed = part[part["other"].notna()]
        labmap = lab.groupby("node", sort=False)["label"].min()
        # every node carries a label row (init covers all; each round
        # re-emits all nodes), so .map never misses
        out_node = pd.concat([ed["other"], lab["node"]], ignore_index=True)
        out_cand = pd.concat([ed["node"].map(labmap),
                              lab["node"].map(labmap)], ignore_index=True)
        is_old = np.zeros(len(out_node), dtype=np.int8)
        is_old[len(ed):] = 1
        return pd.DataFrame({"node": out_node, "cand": out_cand,
                             "is_old": is_old})

    def mins(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("node", sort=False)
        new = g["cand"].min()
        old = part[part["is_old"] == 1].set_index("node")["cand"]
        chg = (new < old.reindex(new.index)).astype("int64")
        return pd.DataFrame({"node": new.index, "label": new.to_numpy(),
                             "chg": chg.to_numpy()})

    for _ in range(max_rounds):
        lab_rows = labels.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "other": pa.nulls(len(t), pa.string()),
                                "label": t["label"],
                                "part": t["part"]}),
            batch_format="pyarrow")
        bi_rows = bi.map_batches(
            lambda t: pa.table({"node": t["node"], "other": t["other"],
                                "label": pa.nulls(len(t), pa.string()),
                                "part": t["part"]}),
            batch_format="pyarrow")
        pushed = (bi_rows.union(lab_rows)
                  .groupby("part").map_groups(push, batch_format="pandas")
                  .map_batches(_with_part("node"), batch_format="pyarrow"))
        # snapshot: drop stats ancestry + coalesce blocks each round —
        # both compound across rounds otherwise (functions/lineage.py)
        st2 = snapshot(pushed.groupby("part").map_groups(
            mins, batch_format="pandas"), num_blocks=P)
        changed = st2.sum("chg")
        labels = snapshot(st2.map_batches(
            lambda t: t.drop_columns(["chg"]), batch_format="pyarrow")
            .map_batches(_with_part("node"), batch_format="pyarrow"),
            num_blocks=P)
        if not changed:
            break
    else:
        raise RuntimeError("label propagation did not converge "
                           f"in {max_rounds} rounds")
    return labels.map_batches(lambda t: t.drop_columns(["part"]),
                              batch_format="pyarrow")


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
