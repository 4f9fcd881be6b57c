"""Pregel-style shard-actor propagation — the generic machinery behind
the round-3 connected-components rewrite, factored out so every
fixpoint-propagation operator shares it (CC min-label, BFS min-distance,
weighted single-source shortest paths in the min-plus semiring; any
monotone min-semiring fits).

Why raw actors (the documented Dataset-API escape hatch): a Ray Dataset
cannot keep a partitioning alive between iterations, so the r2
formulations re-shipped the edge list through 2 sort-shuffles every
round (~44 s/round at 10⁶ edges). Here the bidirectional edge list
hash-partitions ONCE into per-shard actor memory; a round is

  push   — per-destination MIN over candidates from nodes whose value
           changed last round (frontier delta + shard-side combiner:
           a hub receives ≤ one candidate per shard, not per edge),
  handoff — P×P outbox moves shard→shard as object-store refs (the
           driver never touches payloads, only per-round counts),
  apply  — vectorized searchsorted + min per shard.

Round cost decays with the still-changing frontier (classic Pregel).
Partitioning assumption (SURVEY §4): a shard holds ≈ 2·|E|/P edges in
memory — size num_partitions to the cluster. Shards are ``num_cpus=0``
coordinators: at most P short vectorized calls run at once, and
reserving whole CPUs would deadlock small clusters against the routing
tasks (seen on the 4-CPU test fixture).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote(num_cpus=0)
class PropagationShard:
    """One hash partition of the bidirectional edge list, held across
    rounds. ``mode``: "minlabel" (CC — values start as the node's own
    id, min-label wins), "bfs" (values start unset except ``source``
    at 0; candidates are value+1; min wins), "sssp" (min-plus over
    int64 weights), or "longest" (round 4: DIRECTED max-plus — every
    node starts at level 0, candidates are value+1 pushed along
    forward edges only, MAX wins; on a DAG this converges in depth
    rounds and yields the longest-path level of every node — the DAG
    layering / critical-path primitive. A cycle never converges, so
    the max_rounds raise doubles as cycle detection)."""

    def __init__(self, pid: int, num_parts: int, mode: str = "minlabel",
                 source=None, node_type: "pa.DataType | None" = None
                 ) -> None:
        if mode not in ("minlabel", "bfs", "sssp", "longest",
                        "minlabel_directed"):
            raise ValueError(f"unknown mode {mode!r}")
        self.pid = pid
        self.P = num_parts
        self.mode = mode
        self.source = source
        # pinned output type so EMPTY shards emit the same schema as
        # full ones — required now that result blocks feed
        # from_arrow_refs directly (heterogeneous null-typed blocks
        # would poison the Dataset schema)
        self.node_type = node_type or pa.string()
        self._pend_nodes: "list[np.ndarray]" = []
        self._pend_others: "list[np.ndarray]" = []
        self._pend_weights: "list[np.ndarray]" = []
        self._pend_fwd: "list[np.ndarray]" = []
        self.outbox: "dict[int, tuple]" = {}
        self.inbox: "list[tuple]" = []

    def add_edges(self, nodes, others, weights=None, fwd=None) -> None:
        self._pend_nodes.append(np.asarray(nodes))
        self._pend_others.append(np.asarray(others))
        if weights is not None:
            self._pend_weights.append(np.asarray(weights, np.int64))
        if fwd is not None:
            self._pend_fwd.append(np.asarray(fwd, bool))

    def build(self) -> int:
        import pandas as pd
        weighted = self.mode == "sssp"
        directed = self.mode in ("longest", "minlabel_directed")
        if self._pend_nodes:
            df = pd.DataFrame({
                "node": np.concatenate(self._pend_nodes),
                "other": np.concatenate(self._pend_others),
            })
            if weighted:
                # parallel edges keep their MIN weight (the only one a
                # shortest path can use)
                df["w"] = np.concatenate(self._pend_weights)
                df = df.groupby(["node", "other"], sort=False)["w"] \
                    .min().reset_index()
            elif directed:
                # reverse "ghost" rows exist only so every endpoint owns
                # a node slot in its hash partition; push walks fwd rows
                df["fwd"] = np.concatenate(self._pend_fwd)
                df = df.groupby(["node", "other"], sort=False)["fwd"] \
                    .max().reset_index()
            else:
                df = df.drop_duplicates()
        else:
            df = pd.DataFrame({"node": np.array([], dtype=object),
                               "other": np.array([], dtype=object),
                               "w": np.array([], dtype=np.int64),
                               "fwd": np.array([], dtype=bool)})
        self._pend_nodes = self._pend_others = None
        self._pend_weights = self._pend_fwd = None
        self.nodes, inv = np.unique(df["node"].to_numpy(),
                                    return_inverse=True)
        keep = df["fwd"].to_numpy() if directed \
            else np.ones(len(df), dtype=bool)
        self.edge_src = inv.astype(np.int64)[keep]
        self.edge_dst = df["other"].to_numpy()[keep]
        self.edge_w = df["w"].to_numpy()[keep] if weighted else None
        self.dst_part = (pd.util.hash_pandas_object(
            df["other"], index=False) % self.P).to_numpy() \
            .astype(np.int64)[keep]
        n = len(self.nodes)
        # Local-fixpoint split (round 4): for the FIXPOINT modes
        # (convergence-defined results — not BFS, whose hop count IS
        # the semantics via the truncation contract), edges whose dst
        # lives in THIS shard relax in-memory to a local fixpoint
        # inside apply(); only cross-shard edges pay ring rounds. The
        # global round count drops from the graph's path depth to its
        # CROSS-SHARD depth — the win that made part_dag_levels and
        # scc practical (a 100-deep chain inside one shard was 100
        # rings before, 0 after). A dst with dst_part == pid is always
        # present in self.nodes (route ships both directions, ghosts
        # included), so the searchsorted index is total.
        self.local_fix = self.mode in ("minlabel", "minlabel_directed",
                                       "longest", "sssp")
        if self.local_fix:
            is_local = self.dst_part == self.pid
            self.l_src = self.edge_src[is_local]
            self.l_dst_idx = np.searchsorted(
                self.nodes, self.edge_dst[is_local]).astype(np.int64)
            self.l_w = self.edge_w[is_local] if weighted else None
            self.r_src = self.edge_src[~is_local]
            self.r_dst = self.edge_dst[~is_local]
            self.r_w = self.edge_w[~is_local] if weighted else None
            self.r_part = self.dst_part[~is_local]
            self.edge_src = self.edge_dst = None
            self.edge_w = self.dst_part = None
        else:
            self.r_src, self.r_dst = self.edge_src, self.edge_dst
            self.r_w, self.r_part = self.edge_w, self.dst_part
        if self.mode in ("minlabel", "minlabel_directed"):
            self.values = self.nodes.copy()
            self.changed = np.ones(n, dtype=bool)
        elif self.mode == "longest":          # every node is a source
            self.values = np.zeros(n, dtype=np.int64)
            self.changed = np.ones(n, dtype=bool)
        else:                                 # bfs / sssp: -1 = unreached
            self.values = np.full(n, -1, dtype=np.int64)
            self.changed = np.zeros(n, dtype=bool)
            i = int(np.searchsorted(self.nodes, self.source)) if n else 0
            if n and i < n and self.nodes[i] == self.source:
                self.values[i] = 0
                self.changed[i] = True
        self._relax_local()       # settle shard-internal paths pre-round-1
        return n

    def _relax_local(self) -> None:
        """In-shard relaxation to fixpoint over local-destination edges
        (fixpoint modes only). Improvements accumulate into
        ``self.changed`` so the next push() forwards them across
        shards; the sweep frontier is separate so settled-but-unpushed
        nodes stay marked. Bellman-Ford bounds sweeps at |nodes| for
        min-plus/min-label; exceeding it in max-plus means an in-shard
        CYCLE — raise (the distributed counterpart raises via
        max_rounds)."""
        import pandas as pd
        if not getattr(self, "local_fix", False) or len(self.l_src) == 0:
            return
        frontier = self.changed.copy()
        sweeps = 0
        while frontier.any():
            m = frontier[self.l_src]
            if not m.any():
                return
            cand = self.values[self.l_src[m]]
            if self.mode == "longest":
                cand = cand + 1
            elif self.mode == "sssp":
                cand = cand + self.l_w[m]
            g = pd.DataFrame({"i": self.l_dst_idx[m], "c": cand}) \
                .groupby("i", sort=False)["c"] \
                .agg("max" if self.mode == "longest" else "min")
            idx = g.index.to_numpy()
            best = g.to_numpy()
            cur = self.values[idx]
            if self.mode == "sssp":
                better = (cur == -1) | (best < cur)
            elif self.mode == "longest":
                better = best > cur
            else:
                better = best < cur
            frontier = np.zeros(len(self.nodes), dtype=bool)
            if better.any():
                self.values[idx[better]] = best[better]
                frontier[idx[better]] = True
                self.changed[idx[better]] = True
            sweeps += 1
            if sweeps > len(self.nodes) + 1:
                raise RuntimeError(
                    f"{self.mode}: local relaxation did not settle in "
                    f"|nodes| sweeps"
                    + (" — in-shard cycle" if self.mode == "longest"
                       else ""))

    def push(self) -> None:
        import pandas as pd
        self.outbox = {}
        if len(self.r_src) == 0:
            return
        m = self.changed[self.r_src]
        if not m.any():
            return
        cand = self.values[self.r_src[m]]
        if self.mode in ("bfs", "longest"):
            cand = cand + 1
        elif self.mode == "sssp":             # min-plus semiring
            cand = cand + self.r_w[m]
        df = pd.DataFrame({"dst": self.r_dst[m], "cand": cand,
                           "p": self.r_part[m]})
        # per-destination min/max BEFORE the exchange (combiner)
        agg = "max" if self.mode == "longest" else "min"
        g = df.groupby(["p", "dst"], sort=False)["cand"] \
            .agg(agg).reset_index()
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
            .groupby("dst", sort=False)["cand"] \
            .agg("max" if self.mode == "longest" else "min")
        # every destination exists in this shard: edges are
        # bidirectional, so any dst also appears as a node row in its
        # own hash partition (self.nodes is np.unique → sorted)
        idx = np.searchsorted(self.nodes, g.index.to_numpy())
        best = g.to_numpy()
        cur = self.values[idx]
        if self.mode in ("bfs", "sssp"):
            better = (cur == -1) | (best < cur)
        elif self.mode == "longest":
            better = best > cur
        else:
            better = best < cur
        if better.any():
            self.values[idx[better]] = best[better]
            self.changed[idx[better]] = True
            self._relax_local()   # spread arrivals to the local fixpoint
        return int(self.changed.sum())

    def result_table(self) -> pa.Table:
        if self.mode == "minlabel":
            return pa.table({
                "node": pa.array(self.nodes.tolist(), pa.string()),
                "label": pa.array(self.values.tolist(), pa.string())})
        if self.mode == "minlabel_directed":
            return pa.table({
                "node": pa.array(self.nodes.tolist(), self.node_type),
                "label": pa.array(self.values.tolist(), self.node_type)})
        keep = self.values >= 0
        return pa.table({
            "node": pa.array(self.nodes[keep].tolist(), self.node_type),
            "dist": pa.array(self.values[keep], pa.int64())})


def run_propagation(edges: ray.data.Dataset, *, mode: str,
                    src_col: str = "src", dst_col: str = "dst",
                    weight_col: "str | None" = None,
                    source=None, num_partitions: int = 16,
                    max_rounds: int = 50) -> ray.data.Dataset:
    """Route → build → rounds → collect, over (src_col, dst_col) edges.
    Returns Dataset(node, label) for "minlabel", Dataset(node, dist)
    (reachable nodes only) for "bfs" and "sssp" (the weighted min-plus
    semiring over ``weight_col`` int64 costs, undirected), and
    Dataset(node, dist) = longest-path level of EVERY node for
    "longest" (directed max-plus over a DAG; raises on cycles), and
    Dataset(node, label) = min id with a DIRECTED PATH to the node
    (self included) for "minlabel_directed" — the forward/backward
    reachability half of SCC trim-and-intersect
    (graphops.scc_labels)."""
    import pandas as pd

    if mode == "sssp" and weight_col is None:
        raise ValueError("sssp requires weight_col")
    P = num_partitions
    node_type = edges.schema().base_schema.field(src_col).type
    shards = [PropagationShard.remote(p, P, mode, source, node_type)
              for p in range(P)]

    def route(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays([t[src_col].combine_chunks(),
                                 t[dst_col].combine_chunks()])
        other = pa.concat_arrays([t[dst_col].combine_chunks(),
                                  t[src_col].combine_chunks()])
        narr = node.to_numpy(zero_copy_only=False)
        oarr = other.to_numpy(zero_copy_only=False)
        warr = farr = None
        if weight_col is not None:
            w1 = t[weight_col].combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            warr = np.concatenate([w1, w1])   # both directions, same cost
        if mode in ("longest", "minlabel_directed"):  # flag the fwd half
            half = t.num_rows
            farr = np.zeros(2 * half, dtype=bool)
            farr[:half] = True
        part = (pd.util.hash_pandas_object(
            pd.Series(narr), index=False) % P).to_numpy()
        refs = []
        for p in range(P):
            m = part == p
            if m.any():
                refs.append(shards[p].add_edges.remote(
                    narr[m], oarr[m],
                    warr[m] if warr is not None else None,
                    farr[m] if farr is not None else None))
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
            # mode-dependent max_rounds semantics: BFS's cap is a
            # TRUNCATION contract (distances ≤ max_rounds are exact —
            # round k only ever assigns distance k); min-label / sssp /
            # longest left unconverged would be silently WRONG
            # labels/distances (and for "longest" a non-converging run
            # means the input graph has a CYCLE), so all three raise
            if mode in ("minlabel", "sssp", "longest",
                        "minlabel_directed"):
                raise RuntimeError(
                    f"{mode} propagation did not converge "
                    f"in {max_rounds} rounds")
        # VERDICT r3 item #4: shard result tables become Dataset blocks
        # as object-store REFS — node labels never land on the driver
        # (for CC over a web graph that table is corpus-sized). The
        # wait (fetch_local=False) is only a completion barrier so the
        # finally-kill below can't race the result tasks; every shard
        # emits the same pinned schema, empty or not.
        refs = [s.result_table.remote() for s in shards]
        ray.wait(refs, num_returns=len(refs), fetch_local=False)
        return ray.data.from_arrow_refs(refs)
    finally:
        for s in shards:
            ray.kill(s)
