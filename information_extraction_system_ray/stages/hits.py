"""Distributed HITS hubs/authorities over the KG edge table (Kleinberg
1999, public) — the second classic link-analysis score next to PageRank
(stages/pagerank.py): "pages that point at good things" (hubs) vs "pages
good things point at" (authorities).

JOIN-FREE formulation, same pattern as pagerank.py: Ray hash joins spawn
aggregator actors per call, so each step is instead a UNION of edge rows
with score rows, co-partitioned by ``hash(node) % P``, with one
vectorized pandas pass per partition. Because BOTH edge copies key their
partition by an endpoint's ``hash(node) % P``, the single score table
(part = hash(node) % P) co-locates with ``edges_by_src`` for the
authority push and with ``edges_by_dst`` for the hub push.

ONE pipelined execution per FULL round: the textbook iteration
normalizes the authority vector between the two half-steps, but that
scale cancels analytically — ``A(â) = A(a_raw)/‖a_raw‖`` — so the hub
push can run on the RAW authority values and both L2 norms come out of
a single two-column reduce at round end; the only scale that must enter
the pipeline is the PREVIOUS round's hub norm, a driver scalar. Four
sort-shuffles of skinny (node, value) rows per round inside one lazy
execution + one scalar reduce; the per-execution executor overhead
(~1.5 s on this host) is paid once per round, not four times.

Parallel edges weight the link, exactly as in pagerank.py. Nothing
node-sized lands on the driver; in-degree hubs cost one pandas groupby
row per partition, not a Python task per node.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.arrowutil import to_arrow
from ..functions.lineage import snapshot


def hits(edges: ray.data.Dataset, *, iters: int = 15,
         num_partitions: int = 8) -> ray.data.Dataset:
    """edges(src, dst) → Dataset(node, hub, auth); each score vector is
    L2-normalized. Fixed iteration count (HITS converges geometrically;
    tests gate parity vs the dense numpy reference below at 1e-9)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    P = num_partitions

    def with_part(col):
        def add(t: pa.Table) -> pa.Table:
            part = (pd.util.hash_pandas_object(
                pd.Series(t[col].to_pandas()), index=False)
                % P).to_numpy()
            return t.append_column("part", pa.array(part, pa.int64()))
        return add

    def bidir_nodes(t: pa.Table) -> pa.Table:
        u = pc.unique(pa.chunked_array(list(t["src"].chunks)
                                       + list(t["dst"].chunks)))
        return pa.table({"node": u})

    nodes = (edges.map_batches(bidir_nodes, batch_format="pyarrow")
             .groupby("node").aggregate(Count())
             .select_columns(["node"]))

    edge_schema = pa.schema([("src", pa.string()), ("dst", pa.string()),
                             ("part", pa.int64())])
    score_schema = pa.schema([("node", pa.string()), ("hub", pa.float64()),
                              ("auth", pa.float64()), ("part", pa.int64())])

    e_by_src = (edges.map_batches(with_part("src"), batch_format="pyarrow")
                .map_batches(lambda t: t.cast(edge_schema),
                             batch_format="pyarrow").materialize())
    e_by_dst = (edges.map_batches(with_part("dst"), batch_format="pyarrow")
                .map_batches(lambda t: t.cast(edge_schema),
                             batch_format="pyarrow").materialize())

    def init_scores(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"node": t["node"],
                         "hub": pa.array([1.0] * n, pa.float64()),
                         "auth": pa.array([0.0] * n, pa.float64()),
                         "part": t["part"]}).cast(score_schema)

    scores = (nodes.map_batches(with_part("node"), batch_format="pyarrow")
              .map_batches(init_scores, batch_format="pyarrow")
              .materialize())
    if scores.count() == 0:
        return ray.data.from_arrow(pa.schema(
            [("node", pa.string()), ("hub", pa.float64()),
             ("auth", pa.float64())]).empty_table())

    # mixed row: edge (dst non-null) | score (node non-null)
    mix_schema = pa.schema([("src", pa.string()), ("dst", pa.string()),
                            ("node", pa.string()), ("hub", pa.float64()),
                            ("auth", pa.float64()), ("part", pa.int64())])
    # contribution row: is_score=0 carries contrib; =1 carries the score
    con_schema = pa.schema([("node", pa.string()),
                            ("contrib", pa.float64()),
                            ("hub", pa.float64()), ("auth", pa.float64()),
                            ("is_score", pa.int8()), ("part", pa.int64())])
    out_schema = pa.schema([("node", pa.string()), ("hub", pa.float64()),
                            ("auth", pa.float64()), ("sq_a", pa.float64()),
                            ("sq_h", pa.float64()), ("part", pa.int64())])

    def tag_edge(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"src": t["src"], "dst": t["dst"],
                         "node": pa.nulls(n, pa.string()),
                         "hub": pa.nulls(n, pa.float64()),
                         "auth": pa.nulls(n, pa.float64()),
                         "part": t["part"]}).cast(mix_schema)

    def tag_score(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"src": pa.nulls(n, pa.string()),
                         "dst": pa.nulls(n, pa.string()),
                         "node": t["node"], "hub": t["hub"],
                         "auth": t["auth"],
                         "part": t["part"]}).cast(mix_schema)

    def mk_scatter(push_from: str, push_val: str, scale: float):
        other = "dst" if push_from == "src" else "src"

        def scatter(part: pd.DataFrame) -> pa.Table:
            sc = part[part["node"].notna()]
            es = part[part["dst"].notna()]
            frames = []
            if len(es):
                vmap = dict(zip(sc["node"], sc[push_val]))
                contrib = (es[push_from].map(vmap)
                           .to_numpy(dtype=np.float64) * scale)
                frames.append(pd.DataFrame({
                    "node": es[other].to_numpy(), "contrib": contrib,
                    "hub": np.nan, "auth": np.nan,
                    "is_score": np.zeros(len(es), dtype=np.int8)}))
            if len(sc):
                frames.append(pd.DataFrame({
                    "node": sc["node"].to_numpy(), "contrib": np.nan,
                    "hub": sc["hub"].to_numpy(dtype=np.float64),
                    "auth": sc["auth"].to_numpy(dtype=np.float64),
                    "is_score": np.ones(len(sc), dtype=np.int8)}))
            if not frames:
                return con_schema.empty_table()
            df = pd.concat(frames, ignore_index=True)
            df["part"] = (pd.util.hash_pandas_object(df["node"],
                                                     index=False)
                          % P).astype("int64")
            return to_arrow(df, con_schema)

        return scatter

    def mk_gather(out_col: str):
        def gather(part: pd.DataFrame) -> pa.Table:
            me = part[part["is_score"] == 1]
            cs = part[part["is_score"] == 0]
            if not len(me):
                return score_schema.empty_table()
            in_sum = (cs.groupby("node", sort=False)["contrib"].sum()
                      if len(cs) else pd.Series(dtype="float64"))
            new = (me["node"].map(in_sum).fillna(0.0)
                   .to_numpy(dtype=np.float64))
            cols = {"node": me["node"].to_numpy(),
                    "hub": me["hub"].to_numpy(dtype=np.float64),
                    "auth": me["auth"].to_numpy(dtype=np.float64),
                    "part": me["part"].to_numpy()}
            cols[out_col] = new
            return to_arrow(pd.DataFrame(cols), score_schema)
        return gather

    def add_sq(t: pa.Table) -> pa.Table:
        a = t["auth"].to_numpy(zero_copy_only=False)
        h = t["hub"].to_numpy(zero_copy_only=False)
        return pa.table({"node": t["node"], "hub": t["hub"],
                         "auth": t["auth"],
                         "sq_a": pa.array(a * a, pa.float64()),
                         "sq_h": pa.array(h * h, pa.float64()),
                         "part": t["part"]}).cast(out_schema)

    scale_hub = 1.0
    s_a = 1.0
    for _ in range(iters):
        # ONE execution: auth push (ĥ = hub·scale_hub along src→dst) →
        # gather auth_raw → hub push (auth_raw along dst→src, the
        # between-step normalization cancels) → gather hub_raw → sq
        st = snapshot(
            e_by_src.map_batches(tag_edge, batch_format="pyarrow")
            .union(scores.map_batches(tag_score, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(mk_scatter("src", "hub", scale_hub),
                        batch_format="pandas")
            .groupby("part")
            .map_groups(mk_gather("auth"), batch_format="pandas")
            .map_batches(tag_score, batch_format="pyarrow")
            .union(e_by_dst.map_batches(tag_edge, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(mk_scatter("dst", "auth", 1.0),
                        batch_format="pandas")
            .groupby("part")
            .map_groups(mk_gather("hub"), batch_format="pandas")
            .map_batches(add_sq, batch_format="pyarrow"),
            num_blocks=P)
        sums = st.sum(["sq_a", "sq_h"])
        ss_a = float(sums["sum(sq_a)"] or 0.0)
        ss_h = float(sums["sum(sq_h)"] or 0.0)
        s_a = 1.0 / math.sqrt(ss_a) if ss_a > 0 else 0.0
        scale_hub = 1.0 / math.sqrt(ss_h) if ss_h > 0 else 0.0
        scores = st.map_batches(
            lambda t: t.select(["node", "hub", "auth", "part"]),
            batch_format="pyarrow")

    def finalize(t: pa.Table, _sh=scale_hub, _sa=s_a) -> pa.Table:
        hub = t["hub"].to_numpy(zero_copy_only=False) * _sh
        auth = t["auth"].to_numpy(zero_copy_only=False) * _sa
        return pa.table({"node": t["node"],
                         "hub": pa.array(hub, pa.float64()),
                         "auth": pa.array(auth, pa.float64())})

    return scores.map_batches(finalize, batch_format="pyarrow")


def hits_reference(edges: "list[tuple[str, str]]",
                   iters: int = 15) -> "dict[str, tuple[float, float]]":
    """Dense numpy HITS oracle with the IDENTICAL iteration contract
    (raw hub push scaled by the previous round's hub norm, raw auth
    push unscaled, norms applied at read time). Test-only."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    ix = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n), dtype=np.float64)
    for u, v in edges:
        A[ix[u], ix[v]] += 1.0
    hub = np.ones(n)
    auth = np.zeros(n)
    s_h, s_a = 1.0, 1.0
    for _ in range(iters):
        auth = A.T @ (hub * s_h)
        hub = A @ auth
        ss_a = float((auth * auth).sum())
        ss_h = float((hub * hub).sum())
        s_a = 1.0 / math.sqrt(ss_a) if ss_a > 0 else 0.0
        s_h = 1.0 / math.sqrt(ss_h) if ss_h > 0 else 0.0
    return {nd: (hub[ix[nd]] * s_h, auth[ix[nd]] * s_a) for nd in nodes}
