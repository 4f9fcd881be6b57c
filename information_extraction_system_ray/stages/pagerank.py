"""Distributed PageRank over the KG edge table — graph analytics on the
materialized (subj → obj) edges (Page et al. 1999, public).

JOIN-FREE formulation (same pattern as canonicalize.py label propagation:
Ray hash joins spawn aggregator actors per call, so each round is instead a
UNION of edge rows with rank rows, co-partitioned by hash(node), with one
vectorized pandas pass per partition):

- setup (once): out-degree per source is attached to every edge through one
  co-partitioned pass (a groupby combiner feeds it), the edge list is
  partitioned by SOURCE and materialized — a node's rank row and all its
  out-edges land in the same partition every round — and every rank row
  carries a STATIC ``dang`` flag (node has no out-edges).
- per round, ONE pipelined execution: scatter (each partition resolves its
  local ranks and pushes rank[src]/deg along its edges) flows lazily into
  gather (contributions union'd with the rank rows, partitioned by target
  node, summed, re-ranked rank' = (1-d)/N + d·(in_sum + dangling/N));
  gather also emits |Δ| and the NEXT round's dangling mass (rank·dang) so
  ONE ``sum()`` reduce per round yields both scalars — the per-execution
  executor overhead (~1.5 s on this host) is paid twice per round, not
  five times.

Per round: two sort-shuffles of skinny (node, value) rows inside one
execution + one scalar reduce. Nothing node-sized ever lands on the driver.
Skewed in-degree hubs ("wikipedia.org"-scale) cost one pandas groupby row
per partition, not a Python task per node.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

from ..functions.arrowutil import to_arrow
from ..functions.lineage import snapshot


def _with_part(col: str, num_partitions: int):
    def add(t: pa.Table) -> pa.Table:
        part = (pd.util.hash_pandas_object(
            pd.Series(t[col].to_pandas()), index=False)
            % num_partitions).to_numpy()
        return t.append_column("part", pa.array(part, pa.int64()))
    return add


def pagerank(edges: ray.data.Dataset, *, damping: float = 0.85,
             max_iters: int = 30, tol: float = 1e-8,
             num_partitions: int = 8,
             seeds: "list | None" = None) -> ray.data.Dataset:
    """edges(src, dst) [duplicates allowed — parallel edges weight the
    link] → Dataset(node, rank); ranks sum to 1.

    ``seeds`` switches to PERSONALIZED PageRank (random walk with
    restart): the teleport distribution concentrates uniformly on the
    seed set instead of all nodes — both the (1−d) restart mass and the
    dangling redistribution land only on seeds, and the walk starts at
    the seed distribution. Implemented as a per-node teleport value
    ``sv`` carried on the rank rows (uniform 1/N when seeds is None, so
    the classic path is the same code); seeds absent from the graph are
    ignored (their restart mass is lost — caller contract). The seed
    set is a driver-side list: PPR seed sets are query-sized (a handful
    of entities), never corpus-sized."""
    P = num_partitions
    seed_set = None if seeds is None else frozenset(seeds)

    # ---- setup: out-degrees, node universe ----
    deg = (edges.groupby("src").aggregate(Count(alias_name="deg"))
           .rename_columns({"src": "node"}))

    def bidir_nodes(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        u = pc.unique(pa.chunked_array(list(t["src"].chunks)
                                       + list(t["dst"].chunks)))
        return pa.table({"node": u})

    nodes = (edges.map_batches(bidir_nodes, batch_format="pyarrow")
             .groupby("node").aggregate(Count())
             .select_columns(["node"]))

    # one co-partitioned pass builds BOTH per-round inputs: the deg-carrying
    # edge list (keyed by src) and the dang-flagged initial rank rows
    mix_schema = pa.schema([("node", pa.string()), ("dst", pa.string()),
                            ("deg", pa.int64()), ("kind", pa.int8()),
                            ("part", pa.int64())])

    def tag(kind: int, node_col: str, dst_col: str | None = None,
            deg_col: str | None = None):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            return pa.table({
                "node": t[node_col],
                "dst": t[dst_col] if dst_col else pa.nulls(n, pa.string()),
                "deg": t[deg_col] if deg_col else pa.nulls(n, pa.int64()),
                "kind": pa.array([kind] * n, pa.int8()),
                "part": t["part"],
            }).cast(mix_schema)
        return fn

    edge_schema = pa.schema([("node", pa.string()), ("dst", pa.string()),
                             ("deg", pa.int64()), ("part", pa.int64())])
    rank_schema = pa.schema([("node", pa.string()), ("rank", pa.float64()),
                             ("dang", pa.int8()), ("sv", pa.float64()),
                             ("part", pa.int64())])

    mixed = (edges.map_batches(_with_part("src", P), batch_format="pyarrow")
             .map_batches(tag(0, "src", dst_col="dst"),
                          batch_format="pyarrow")
             .union(deg.map_batches(_with_part("node", P),
                                    batch_format="pyarrow")
                    .map_batches(tag(1, "node", deg_col="deg"),
                                 batch_format="pyarrow"))
             .union(nodes.map_batches(_with_part("node", P),
                                      batch_format="pyarrow")
                    .map_batches(tag(2, "node"), batch_format="pyarrow")))

    import pyarrow.compute as pc

    mixed = mixed.materialize()     # consumed by both setup splits
    n_nodes = int(mixed.map_batches(
        lambda t: pa.table({"n": pa.array(
            [int(pc.sum(pc.cast(pc.equal(t["kind"], 2), pa.int64()))
                 .as_py() or 0)], pa.int64())}),
        batch_format="pyarrow").sum("n") or 0)
    if n_nodes == 0:
        return ray.data.from_arrow(pa.schema(
            [("node", pa.string()), ("rank", pa.float64())]).empty_table())
    r0 = 1.0 / n_nodes

    def split_edges(part: pd.DataFrame) -> pa.Table:
        degs = part[part["kind"] == 1]
        es = part[part["kind"] == 0].copy()
        if not len(es):
            return edge_schema.empty_table()
        dmap = dict(zip(degs["node"], degs["deg"]))
        es["deg"] = es["node"].map(dmap).astype("int64")
        return to_arrow(es[["node", "dst", "deg", "part"]], edge_schema)

    sv_seed = (1.0 / len(seed_set)) if seed_set else 0.0

    def split_ranks(part: pd.DataFrame, _r0=r0) -> pa.Table:
        degs = part[part["kind"] == 1]
        ns = part[part["kind"] == 2].copy()
        if not len(ns):
            return rank_schema.empty_table()
        if seed_set is None:
            ns["sv"] = _r0                    # classic: uniform teleport
        else:
            ns["sv"] = np.where(ns["node"].isin(seed_set),
                                sv_seed, 0.0)
        ns["rank"] = ns["sv"]                 # walk starts at teleport
        ns["dang"] = (~ns["node"].isin(set(degs["node"]))).astype("int8")
        return to_arrow(ns[["node", "rank", "dang", "sv", "part"]],
                        rank_schema)

    edges_p = (mixed.groupby("part")
               .map_groups(split_edges, batch_format="pandas")
               .materialize())
    ranks = (mixed.groupby("part")
             .map_groups(split_ranks, batch_format="pandas")
             .materialize())
    dang_mass = float(ranks.map_batches(
        lambda t: pa.table({"m": pa.array(
            t["dang"].to_numpy(zero_copy_only=False).astype(np.float64)
            * t["rank"].to_numpy(zero_copy_only=False))}),
        batch_format="pyarrow").sum("m") or 0.0)

    # ---- iteration ----
    mixr_schema = pa.schema([("node", pa.string()), ("dst", pa.string()),
                             ("deg", pa.int64()), ("rank", pa.float64()),
                             ("dang", pa.int8()), ("sv", pa.float64()),
                             ("part", pa.int64())])
    contrib_schema = pa.schema([("dst", pa.string()),
                                ("contrib", pa.float64()),
                                ("rank", pa.float64()),
                                ("dang", pa.int8()), ("sv", pa.float64()),
                                ("part", pa.int64())])
    out_schema = pa.schema([("node", pa.string()), ("rank", pa.float64()),
                            ("dang", pa.int8()), ("sv", pa.float64()),
                            ("chg", pa.float64()),
                            ("dangm", pa.float64()), ("part", pa.int64())])

    def tag_edge_r(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"node": t["node"], "dst": t["dst"],
                         "deg": t["deg"],
                         "rank": pa.nulls(n, pa.float64()),
                         "dang": pa.nulls(n, pa.int8()),
                         "sv": pa.nulls(n, pa.float64()),
                         "part": t["part"]}).cast(mixr_schema)

    def tag_rank_r(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"node": t["node"],
                         "dst": pa.nulls(n, pa.string()),
                         "deg": pa.nulls(n, pa.int64()),
                         "rank": t["rank"], "dang": t["dang"],
                         "sv": t["sv"],
                         "part": t["part"]}).cast(mixr_schema)

    def scatter(part: pd.DataFrame) -> pa.Table:
        rk = part[part["rank"].notna()]
        es = part[part["dst"].notna()]
        frames = []
        if len(es):
            rmap = dict(zip(rk["node"], rk["rank"]))
            contrib = (es["node"].map(rmap).to_numpy(dtype=np.float64)
                       / es["deg"].to_numpy(dtype=np.float64))
            frames.append(pd.DataFrame({
                "dst": es["dst"].to_numpy(), "contrib": contrib,
                "rank": np.nan, "dang": pd.array([None] * len(es),
                                                 dtype="Int8"),
                "sv": np.nan}))
        if len(rk):
            frames.append(pd.DataFrame({
                "dst": rk["node"].to_numpy(),
                "contrib": np.nan,
                "rank": rk["rank"].to_numpy(),
                "dang": rk["dang"].astype("Int8").to_numpy(),
                "sv": rk["sv"].to_numpy(dtype=np.float64)}))
        if not frames:
            return contrib_schema.empty_table()
        df = pd.concat(frames, ignore_index=True)
        df["part"] = (pd.util.hash_pandas_object(df["dst"], index=False)
                      % P).astype("int64")
        return to_arrow(df, contrib_schema)

    base_mult = 1.0 - damping       # restart mass lands on sv per node

    for _ in range(max_iters):
        dang_mult = damping * dang_mass   # dangling mass re-teleports

        def gather(part: pd.DataFrame, _dm=dang_mult) -> pa.Table:
            me = part[part["rank"].notna()]       # this partition's nodes
            cs = part[part["contrib"].notna()]
            if not len(me):
                return out_schema.empty_table()
            in_sum = (cs.groupby("dst", sort=False)["contrib"].sum()
                      if len(cs) else pd.Series(dtype="float64"))
            sv = me["sv"].to_numpy(dtype=np.float64)
            new = (base_mult * sv + _dm * sv + damping
                   * me["dst"].map(in_sum).fillna(0.0)
                   .to_numpy(dtype=np.float64))
            old = me["rank"].to_numpy(dtype=np.float64)
            dang = me["dang"].to_numpy(dtype=np.int8)
            return to_arrow(pd.DataFrame({
                "node": me["dst"].to_numpy(), "rank": new, "dang": dang,
                "sv": sv,
                "chg": np.abs(new - old), "dangm": new * dang,
                "part": me["part"].to_numpy()}), out_schema)

        # ONE execution: scatter flows lazily into gather (no mid-round
        # materialize barrier beyond the two sort-shuffles themselves);
        # snapshot drops stats ancestry + coalesces the per-partition
        # blocks so neither compounds across rounds (functions/lineage.py)
        st = snapshot(
            edges_p.map_batches(tag_edge_r, batch_format="pyarrow")
            .union(ranks.map_batches(tag_rank_r, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(scatter, batch_format="pandas")
            .groupby("part")
            .map_groups(gather, batch_format="pandas"),
            num_blocks=P)
        sums = st.sum(["chg", "dangm"])
        delta = float(sums["sum(chg)"] or 0.0)
        dang_mass = float(sums["sum(dangm)"] or 0.0)
        ranks = st
        if delta < tol:
            break

    return ranks.map_batches(
        lambda t: t.select(["node", "rank"]), batch_format="pyarrow")
