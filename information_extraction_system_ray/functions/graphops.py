"""Graph self-join operators over an edge table — two-hop path counts,
the query class (edges ⋈ edges) that naively explodes at web scale.

``two_hop_counts`` computes, per source node, the number of length-2 paths
src→mid→dst — WITHOUT materializing the edges×edges pair set: it is
``Σ_{mid ∈ out(src)} outdeg(mid)``, i.e. a degree aggregate joined back
onto the edge list. The join is the co-partitioned union+groupby attach
(the same shuffle trick as canonicalize/pagerank — Ray Data has no
aggregator-actor hash join), so a hub node costs one row per edge, never
deg² pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Min, Sum

from .partitions import default_parts


def _hash_part_col(t: pa.Table, col: str, nparts: int) -> pa.Array:
    """hash(col) % nparts as int64 — the co-partitioning key column. Uses
    pandas' SipHash-backed hasher so every tagging site (edges, labels,
    frontiers) lands the same value in the same partition."""
    h = pd.util.hash_pandas_object(
        pd.Series(t[col].to_pandas()), index=False) % nparts
    return pa.array(h.to_numpy(), pa.int64())


def two_hop_counts(edges: ray.data.Dataset, *, src: str = "src",
                   dst: str = "dst",
                   num_partitions: "int | None" = None) -> ray.data.Dataset:
    """Dataset(src, n_two_hop) — number of 2-paths starting at each node
    with ≥1 such path. Edge multiplicity counts (dedupe first for distinct
    semantics)."""
    num_partitions = num_partitions or default_parts()
    key_type = edges.schema().base_schema.field(src).type

    deg = edges.groupby(src).aggregate(Count(alias_name="deg")) \
        .rename_columns({src: "node"})

    mem_schema = pa.schema([("node", key_type), (src, key_type),
                            ("deg", pa.int64()), ("part", pa.int64()),
                            ("side", pa.int8())])

    def _part_of(t: pa.Table, col: str) -> pa.Array:
        h = pd.util.hash_pandas_object(
            pd.Series(t[col].to_pandas()), index=False) % num_partitions
        return pa.array(h.to_numpy(), pa.int64())

    def tag_edge(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "node": t[dst],            # attach key: the mid node
            src: t[src],
            "deg": pa.nulls(n, pa.int64()),
            "part": _part_of(t, dst),
            "side": pa.array([0] * n, pa.int8()),
        }).cast(mem_schema)

    def tag_deg(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "node": t["node"],
            src: pa.nulls(n, key_type),
            "deg": t["deg"],
            "part": _part_of(t, "node"),
            "side": pa.array([1] * n, pa.int8()),
        }).cast(mem_schema)

    out_schema = pa.schema([(src, key_type), ("hops", pa.int64())])

    def attach(part: pa.Table) -> pa.Table:
        side = part["side"]
        e = part.filter(pc.equal(side, 0))
        d = part.filter(pc.equal(side, 1))
        if e.num_rows == 0 or d.num_rows == 0:
            return out_schema.empty_table()
        # this partition's own degree slice only
        dmap = dict(zip(d["node"].to_pylist(), d["deg"].to_pylist()))
        mids = e["node"].to_pylist()
        hops = np.array([dmap.get(m, 0) for m in mids], dtype=np.int64)
        return pa.table({src: e[src],
                         "hops": pa.array(hops, pa.int64())}).cast(out_schema)

    attached = (edges.map_batches(tag_edge, batch_format="pyarrow")
                .union(deg.map_batches(tag_deg, batch_format="pyarrow"))
                .groupby("part")
                .map_groups(attach, batch_format="pyarrow"))

    return (attached.groupby(src)
            .aggregate(Sum("hops", alias_name="n_two_hop")))


def _orient_by_degree(edges: ray.data.Dataset, u: str, v: str,
                      nparts: int, ktype) -> ray.data.Dataset:
    """Shared degree-orientation pass (triangle_count, ktruss): attach
    both endpoint degrees via co-partitioned union+groupby (no driver
    degree dict) and orient each edge from its lower-(degree, id)
    endpoint — every triangle is then enumerated exactly once at its
    minimum vertex and wedge blow-up per vertex is O(sqrt(|E|)) even at
    a hub. Returns Dataset(src, dst, part) hash-partitioned by src."""

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.concat_tables([pa.table({"node": t[u]}),
                                 pa.table({"node": t[v]})])

    deg = (edges.map_batches(endpoints, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="deg"))
           .materialize())  # vertices ≪ edges; reused by both attach passes

    def _hash_part(t: pa.Table, col: str) -> pa.Array:
        h = pd.util.hash_pandas_object(
            pd.Series(t[col].to_pandas()), index=False) % nparts
        return pa.array(h.to_numpy(), pa.int64())

    def attach_pass(ds: ray.data.Dataset, key_col: str,
                    extra: "list[tuple[str, pa.DataType]]",
                    out_name: str) -> ray.data.Dataset:
        mem = pa.schema([(u, ktype), (v, ktype)] + extra +
                        [("_d", pa.int64()), ("part", pa.int64()),
                         ("side", pa.int8())])

        def tag_e(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {u: t[u], v: t[v]}
            for cname, _ in extra:
                cols[cname] = t[cname]
            cols["_d"] = pa.nulls(n, pa.int64())
            cols["part"] = _hash_part(t, key_col)
            cols["side"] = pa.array(np.zeros(n, np.int8), pa.int8())
            return pa.table(cols).cast(mem)

        def tag_d(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {u: t["node"] if key_col == u else pa.nulls(n, ktype),
                    v: t["node"] if key_col == v else pa.nulls(n, ktype)}
            for cname, ctype in extra:
                cols[cname] = pa.nulls(n, ctype)
            cols["_d"] = t["deg"]
            cols["part"] = _hash_part(t, "node")
            cols["side"] = pa.array(np.ones(n, np.int8), pa.int8())
            return pa.table(cols).cast(mem)

        out_schema = pa.schema([(u, ktype), (v, ktype)] + extra +
                               [(out_name, pa.int64())])

        def merge(part: pa.Table) -> pa.Table:
            e = part.filter(pc.equal(part["side"], 0))
            d = part.filter(pc.equal(part["side"], 1))
            if e.num_rows == 0:
                return out_schema.empty_table()
            dmap = dict(zip(d[key_col].to_pylist(), d["_d"].to_pylist()))
            vals = np.array([dmap.get(k, 0)
                             for k in e[key_col].to_pylist()], np.int64)
            cols = {u: e[u], v: e[v]}
            for cname, _ in extra:
                cols[cname] = e[cname]
            cols[out_name] = pa.array(vals, pa.int64())
            return pa.table(cols).cast(out_schema)

        return (ds.map_batches(tag_e, batch_format="pyarrow")
                .union(deg.map_batches(tag_d, batch_format="pyarrow"))
                .groupby("part").map_groups(merge, batch_format="pyarrow"))

    e_du = attach_pass(edges, u, [], "du")
    e_dd = attach_pass(e_du, v, [("du", pa.int64())], "dv")

    def orient(t: pa.Table) -> pa.Table:
        du = t["du"].to_numpy(zero_copy_only=False)
        dv = t["dv"].to_numpy(zero_copy_only=False)
        ua = t[u].to_numpy(zero_copy_only=False)
        va = t[v].to_numpy(zero_copy_only=False)
        u_first = (du < dv) | ((du == dv) & (ua < va))
        src = np.where(u_first, ua, va)
        dst = np.where(u_first, va, ua)
        out = pa.table({"src": pa.array(src).cast(ktype),
                        "dst": pa.array(dst).cast(ktype)})
        return out.append_column("part", _hash_part(out, "src"))

    return e_dd.map_batches(orient, batch_format="pyarrow")


def triangle_count(edges: ray.data.Dataset, *, u: str = "u", v: str = "v",
                   num_partitions: "int | None" = None) -> ray.data.Dataset:
    """Distributed triangle counting — Dataset with ONE row ``{triangles}``.

    ``edges`` must hold each undirected edge exactly once with ``u < v``
    (vertex-id order). Classic degree-oriented wedge counting
    (_orient_by_degree); wedges are generated inside the source's hash
    partition with a local (pair → count) combine before the closure
    shuffle, and closure is a per-partition set membership against the
    edge list."""
    nparts = num_partitions or default_parts()
    ktype = edges.schema().base_schema.field(u).type
    oriented = _orient_by_degree(edges, u, v, nparts, ktype)

    wedge_schema = pa.schema([("wu", ktype), ("wv", ktype),
                              ("nw", pa.int64())])

    def wedges(part: pd.DataFrame) -> pa.Table:
        outs_u, outs_v = [], []
        for _, g in part.groupby("src", sort=False):
            ns = np.unique(g["dst"].to_numpy())
            if len(ns) < 2:
                continue
            iu, iv = np.triu_indices(len(ns), 1)
            outs_u.append(ns[iu])   # ascending ⇒ wu < wv by vertex id,
            outs_v.append(ns[iv])   # matching the edge table's orientation
        if not outs_u:
            return wedge_schema.empty_table()
        wu = np.concatenate(outs_u)
        wv = np.concatenate(outs_v)
        # local (pair → count) combine before the closure shuffle
        pairs = np.stack([wu, wv], axis=1)
        uniq, counts = np.unique(pairs, axis=0, return_counts=True)
        return pa.table({"wu": pa.array(uniq[:, 0]).cast(ktype),
                         "wv": pa.array(uniq[:, 1]).cast(ktype),
                         "nw": pa.array(counts, pa.int64())}) \
            .cast(wedge_schema)

    w = oriented.groupby("part").map_groups(wedges, batch_format="pandas")

    close_schema = pa.schema([("wu", ktype), ("wv", ktype),
                              ("nw", pa.int64()), ("part", pa.int64()),
                              ("side", pa.int8())])

    def _pair_part(t: pa.Table, c1: str, c2: str) -> pa.Array:
        h = pd.util.hash_pandas_object(
            pd.DataFrame({"a": t[c1].to_pandas(),
                          "b": t[c2].to_pandas()}), index=False) % nparts
        return pa.array(h.to_numpy(), pa.int64())

    def tag_w(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"wu": t["wu"], "wv": t["wv"], "nw": t["nw"],
                         "part": _pair_part(t, "wu", "wv"),
                         "side": pa.array(np.zeros(n, np.int8), pa.int8())}
                        ).cast(close_schema)

    def tag_edge(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"wu": t[u], "wv": t[v],
                         "nw": pa.nulls(n, pa.int64()),
                         "part": _pair_part(t, u, v),
                         "side": pa.array(np.ones(n, np.int8), pa.int8())}
                        ).cast(close_schema)

    def close(part: pa.Table) -> pa.Table:
        wd = part.filter(pc.equal(part["side"], 0))
        ed = part.filter(pc.equal(part["side"], 1))
        if wd.num_rows == 0 or ed.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
        eset = set(zip(ed["wu"].to_pylist(), ed["wv"].to_pylist()))
        total = 0
        for a, b, nw in zip(wd["wu"].to_pylist(), wd["wv"].to_pylist(),
                            wd["nw"].to_pylist()):
            if (a, b) in eset:
                total += nw
        return pa.table({"n": pa.array([total], pa.int64())})

    closed = (w.map_batches(tag_w, batch_format="pyarrow")
              .union(edges.map_batches(tag_edge, batch_format="pyarrow"))
              .groupby("part").map_groups(close, batch_format="pyarrow"))
    total = int(closed.sum("n") or 0)
    return ray.data.from_arrow(
        pa.table({"triangles": pa.array([total], pa.int64())}))


def kcore(edges: ray.data.Dataset, *, u: str = "u", v: str = "v",
          k: int = 3, num_partitions: "int | None" = None,
          max_iters: int = 100,
          broadcast_threshold: int = 2_000_000) -> ray.data.Dataset:
    """k-core decomposition by iterative peeling: repeatedly drop nodes
    of degree < k (and their edges) until a fixed point; returns the
    surviving edge set Dataset(u, v).

    Each round is one degree aggregate plus a membership filter against
    the round's low-degree set. When that set is small (≤
    ``broadcast_threshold`` ids — bare int64 node ids, so ≤16 MB at the
    default), it is pulled once, ``ray.put`` once, and both endpoints
    are filtered in a single shuffle-free ``map_batches`` with
    ``pc.is_in``. Above the threshold the filter falls back to two
    co-partitioned union+groupby passes (drop edges whose u — then
    whose v — is in the low set) where the low set never leaves the
    cluster. Edges re-materialize per round to truncate lineage — at
    production scale that step is a partitioned-Parquet checkpoint, and
    deep peeling chains (worst case O(n) rounds) are bounded by
    ``max_iters``; coreness-by-h-index iteration is the published
    fixed-round alternative when peeling depth bites."""
    nparts = num_partitions or default_parts()
    ktype = edges.schema().base_schema.field(u).type

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.concat_tables([pa.table({"node": t[u]}),
                                 pa.table({"node": t[v]})])

    def _hash_part(t: pa.Table, col: str) -> pa.Array:
        h = pd.util.hash_pandas_object(
            pd.Series(t[col].to_pandas()), index=False) % nparts
        return pa.array(h.to_numpy(), pa.int64())

    mem = pa.schema([(u, ktype), (v, ktype), ("part", pa.int64()),
                     ("side", pa.int8())])
    out_schema = pa.schema([(u, ktype), (v, ktype)])

    def drop_broadcast(cur: ray.data.Dataset,
                       low: ray.data.Dataset) -> ray.data.Dataset:
        low_ref = ray.put(pa.concat_tables(
            low.iter_batches(batch_format="pyarrow",
                             batch_size=None))["node"].combine_chunks())

        def keep(t: pa.Table) -> pa.Table:
            lo = ray.get(low_ref)
            mask = pc.and_(
                pc.invert(pc.is_in(t[u], value_set=lo)),
                pc.invert(pc.is_in(t[v], value_set=lo)))
            return t.filter(mask).select([u, v]).cast(out_schema)

        return cur.map_batches(keep, batch_format="pyarrow")

    def drop_pass(cur: ray.data.Dataset, low: ray.data.Dataset,
                  key_col: str) -> ray.data.Dataset:
        def tag_e(t: pa.Table) -> pa.Table:
            n = len(t)
            return pa.table({u: t[u], v: t[v],
                             "part": _hash_part(t, key_col),
                             "side": pa.array(np.zeros(n, np.int8),
                                              pa.int8())}).cast(mem)

        def tag_low(t: pa.Table) -> pa.Table:
            n = len(t)
            return pa.table({u: t["node"], v: pa.nulls(n, ktype),
                             "part": _hash_part(t, "node"),
                             "side": pa.array(np.ones(n, np.int8),
                                              pa.int8())}).cast(mem)

        def keep(part: pa.Table) -> pa.Table:
            e = part.filter(pc.equal(part["side"], 0))
            lo = part.filter(pc.equal(part["side"], 1))
            if e.num_rows == 0:
                return out_schema.empty_table()
            if lo.num_rows == 0:
                return e.select([u, v]).cast(out_schema)
            mask = pc.invert(pc.is_in(e[key_col],
                                      value_set=lo[u].combine_chunks()))
            return e.select([u, v]).filter(mask).cast(out_schema)

        return (cur.map_batches(tag_e, batch_format="pyarrow")
                .union(low.map_batches(tag_low, batch_format="pyarrow"))
                .groupby("part").map_groups(keep, batch_format="pyarrow"))

    from .lineage import snapshot

    # Coalesce to nparts blocks once (per-round overhead scales with
    # block count), and rebind loop state through lineage.snapshot each
    # round so stats ancestry doesn't compound (functions/lineage.py).
    cur = snapshot(edges, num_blocks=nparts)
    for _ in range(max_iters):
        deg = (cur.map_batches(endpoints, batch_format="pyarrow")
               .groupby("node").aggregate(Count(alias_name="deg")))
        low = snapshot(deg.map_batches(
            lambda t: t.select(["node"]).filter(
                pc.less(t["deg"], pa.scalar(k, pa.int64()))),
            batch_format="pyarrow"))
        n_low = low.count()
        if n_low == 0:
            return cur
        if n_low <= broadcast_threshold:
            cur = snapshot(drop_broadcast(cur, low), num_blocks=nparts)
        else:
            cur = snapshot(drop_pass(drop_pass(cur, low, u), low, v),
                           num_blocks=nparts)
        if cur.count() == 0:
            return cur
    raise RuntimeError(f"kcore: no fixed point in {max_iters} rounds")


def edge_supports(edges: ray.data.Dataset, *, u: str = "u", v: str = "v",
                  num_partitions: "int | None" = None) -> ray.data.Dataset:
    """Per-edge triangle SUPPORT — Dataset(u, v, support) for EVERY
    input edge (zero-triangle edges included), the inner step of
    k-truss peeling. Same degree-oriented enumeration as
    triangle_count (_orient_by_degree: each triangle surfaces exactly
    once, at its min-(degree,id) apex; wedge blow-up O(sqrt(|E|)) per
    vertex), but the closure step EMITS the triangle's three edges in
    canonical (min,max) form instead of counting — apex wedges can't
    pair-combine because each apex contributes different side edges.
    Two skinny shuffles: (apex,wu,wv) triples by pair hash, then the
    (edge → count) groupby; the final zero-fill attach is one
    co-partitioned union+merge against the edge list."""
    nparts = num_partitions or default_parts()
    ktype = edges.schema().base_schema.field(u).type
    oriented = _orient_by_degree(edges, u, v, nparts, ktype)

    tri_schema = pa.schema([("apex", ktype), ("wu", ktype),
                            ("wv", ktype)])

    def wedges(part: pd.DataFrame) -> pa.Table:
        outs_a, outs_u, outs_v = [], [], []
        for src, g in part.groupby("src", sort=False):
            ns = np.unique(g["dst"].to_numpy())
            if len(ns) < 2:
                continue
            iu, iv = np.triu_indices(len(ns), 1)
            outs_a.append(np.full(len(iu), src, dtype=ns.dtype))
            outs_u.append(ns[iu])
            outs_v.append(ns[iv])
        if not outs_u:
            return tri_schema.empty_table()
        return pa.table({"apex": pa.array(np.concatenate(outs_a)),
                         "wu": pa.array(np.concatenate(outs_u)),
                         "wv": pa.array(np.concatenate(outs_v))}
                        ).cast(tri_schema)

    w = oriented.groupby("part").map_groups(wedges, batch_format="pandas")

    close_schema = pa.schema([("apex", ktype), ("wu", ktype),
                              ("wv", ktype), ("part", pa.int64()),
                              ("side", pa.int8())])

    def _pair_part2(t: pa.Table, c1: str, c2: str) -> pa.Array:
        h = pd.util.hash_pandas_object(
            pd.DataFrame({"a": t[c1].to_pandas(),
                          "b": t[c2].to_pandas()}), index=False) % nparts
        return pa.array(h.to_numpy(), pa.int64())

    def tag_w(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"apex": t["apex"], "wu": t["wu"], "wv": t["wv"],
                         "part": _pair_part2(t, "wu", "wv"),
                         "side": pa.array(np.zeros(n, np.int8), pa.int8())}
                        ).cast(close_schema)

    def tag_edge(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"apex": pa.nulls(n, ktype),
                         "wu": t[u], "wv": t[v],
                         "part": _pair_part2(t, u, v),
                         "side": pa.array(np.ones(n, np.int8), pa.int8())}
                        ).cast(close_schema)

    emit_schema = pa.schema([("eu", ktype), ("ev", ktype)])

    def close(part: pa.Table) -> pa.Table:
        wd = part.filter(pc.equal(part["side"], 0))
        ed = part.filter(pc.equal(part["side"], 1))
        if wd.num_rows == 0 or ed.num_rows == 0:
            return emit_schema.empty_table()
        epair = pd.MultiIndex.from_arrays(
            [ed["wu"].to_numpy(zero_copy_only=False),
             ed["wv"].to_numpy(zero_copy_only=False)])
        wpair = pd.MultiIndex.from_arrays(
            [wd["wu"].to_numpy(zero_copy_only=False),
             wd["wv"].to_numpy(zero_copy_only=False)])
        hit = wpair.isin(epair)
        if not hit.any():
            return emit_schema.empty_table()
        a = wd["apex"].to_numpy(zero_copy_only=False)[hit]
        b = wd["wu"].to_numpy(zero_copy_only=False)[hit]
        c = wd["wv"].to_numpy(zero_copy_only=False)[hit]
        eu = np.concatenate([np.minimum(a, b), np.minimum(a, c), b])
        ev = np.concatenate([np.maximum(a, b), np.maximum(a, c), c])
        return pa.table({"eu": pa.array(eu).cast(ktype),
                         "ev": pa.array(ev).cast(ktype)}).cast(emit_schema)

    sup = (w.map_batches(tag_w, batch_format="pyarrow")
           .union(edges.map_batches(tag_edge, batch_format="pyarrow"))
           .groupby("part").map_groups(close, batch_format="pyarrow")
           .groupby(["eu", "ev"]).aggregate(Count(alias_name="support")))

    # zero-fill attach: every input edge gets its support (0 if no row)
    mem = pa.schema([("eu", ktype), ("ev", ktype), ("sup", pa.int64()),
                     ("part", pa.int64()), ("side", pa.int8())])

    def tag_s(t: pa.Table) -> pa.Table:
        if "eu" not in t.column_names:    # empty aggregate partition
            return mem.empty_table()
        n = len(t)
        return pa.table({"eu": t["eu"], "ev": t["ev"],
                         "sup": t["support"],
                         "part": _pair_part2(t, "eu", "ev"),
                         "side": pa.array(np.zeros(n, np.int8), pa.int8())}
                        ).cast(mem)

    def tag_e2(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"eu": t[u], "ev": t[v],
                         "sup": pa.nulls(n, pa.int64()),
                         "part": _pair_part2(t, u, v),
                         "side": pa.array(np.ones(n, np.int8), pa.int8())}
                        ).cast(mem)

    out_schema = pa.schema([(u, ktype), (v, ktype),
                            ("support", pa.int64())])

    def merge(part: pa.Table) -> pa.Table:
        s = part.filter(pc.equal(part["side"], 0))
        e = part.filter(pc.equal(part["side"], 1))
        if e.num_rows == 0:
            return out_schema.empty_table()
        smap = dict(zip(zip(s["eu"].to_pylist(), s["ev"].to_pylist()),
                        s["sup"].to_pylist()))
        vals = np.array([smap.get(kk, 0) for kk in
                         zip(e["eu"].to_pylist(), e["ev"].to_pylist())],
                        np.int64)
        return pa.table({u: e["eu"], v: e["ev"],
                         "support": pa.array(vals, pa.int64())}
                        ).cast(out_schema)

    return (sup.map_batches(tag_s, batch_format="pyarrow")
            .union(edges.map_batches(tag_e2, batch_format="pyarrow"))
            .groupby("part").map_groups(merge, batch_format="pyarrow"))


def ktruss(edges: ray.data.Dataset, *, k: int = 4, u: str = "u",
           v: str = "v", num_partitions: "int | None" = None,
           max_iters: int = 100) -> ray.data.Dataset:
    """k-truss decomposition (Cohen 2008): the maximal subgraph in
    which every edge participates in ≥ k−2 triangles WITHIN the
    subgraph — the cohesion notion strictly stronger than k-core
    (a k-truss is a (k−1)-core but not vice versa). Iterative peeling:
    recompute per-edge support over the surviving edges
    (edge_supports), drop every edge under k−2, repeat to fixpoint.
    Each round is the two skinny support shuffles + one streaming
    filter; loop state rebinds through lineage.snapshot (as kcore does)
    so stats ancestry doesn't compound. Rounds ≤ peeling depth
    (small-world graphs: single digits)."""
    from .lineage import snapshot

    nparts = num_partitions or default_parts()
    thresh = pa.scalar(k - 2, pa.int64())
    cur = snapshot(edges, num_blocks=nparts)
    n_cur = cur.count()
    for _ in range(max_iters):
        if n_cur == 0:
            return cur
        sup = edge_supports(cur, u=u, v=v, num_partitions=nparts)
        keep = snapshot(sup.map_batches(
            lambda t: t.filter(pc.greater_equal(t["support"], thresh))
            .select([u, v]), batch_format="pyarrow"), num_blocks=nparts)
        n_keep = keep.count()
        if n_keep == n_cur:
            return keep
        cur, n_cur = keep, n_keep
    raise RuntimeError(f"ktruss: no fixed point in {max_iters} rounds")


def bfs_distances(edges: ray.data.Dataset, *, source,
                  u: str = "u", v: str = "v",
                  num_partitions: "int | None" = None,
                  max_iters: int = 50) -> ray.data.Dataset:
    """Single-source BFS hop distances — Dataset(node, dist) for every
    node reachable from ``source`` (the source itself at dist 0).

    Round-3 implementation: the generic Pregel shard-actor ring
    (stages/pregel.py, mode="bfs") — the r2 formulation re-shipped the
    materialized adjacency through a semi-join + a fused dedup/anti
    shuffle EVERY round; now edges hash-partition once into shard
    memory and each round exchanges only (dist+1) candidates of the
    still-expanding frontier. Rounds = eccentricity of the source
    (small-world web graphs: single digits); ``max_iters`` guards
    pathological chains. A source with no edges is emitted at dist 0
    (parity with the level-synchronous formulation)."""
    from ..stages.pregel import run_propagation

    ktype = edges.schema().base_schema.field(u).type
    out_schema = pa.schema([("node", ktype), ("dist", pa.int64())])
    res = run_propagation(edges, mode="bfs", src_col=u, dst_col=v,
                          source=source,
                          num_partitions=num_partitions or 16,
                          max_rounds=max_iters) \
        .map_batches(lambda t: t.cast(out_schema), batch_format="pyarrow")
    found = res.map_batches(
        lambda t: t.filter(pc.equal(t["node"],
                                    pa.scalar(source).cast(ktype))),
        batch_format="pyarrow").count()
    if not found:           # isolated source: no shard ever saw it
        res = res.union(ray.data.from_arrow(pa.table({
            "node": pa.array([source]).cast(ktype),
            "dist": pa.array([0], pa.int64())}).cast(out_schema)))
    return res


def dag_longest_paths(edges: ray.data.Dataset, *, u: str = "u",
                      v: str = "v",
                      num_partitions: "int | None" = None,
                      max_iters: int = 400) -> ray.data.Dataset:
    """Longest-path level of every node over a DIRECTED ACYCLIC edge
    list Dataset(u → v) — the DAG layering / critical-path / topological
    -depth primitive (level 0 = sources; level k = longest chain of k
    edges ends here). Round 4: the Pregel shard ring in directed
    max-plus mode (stages/pregel.py mode="longest") — edges partition
    once into shard memory, each round exchanges only (level+1)
    candidates of nodes that improved, converging in depth(DAG) rounds.
    A cyclic input raises (max-plus never converges on a cycle), which
    makes the operator double as distributed cycle detection."""
    from ..stages.pregel import run_propagation

    ktype = edges.schema().base_schema.field(u).type
    out_schema = pa.schema([("node", ktype), ("level", pa.int64())])
    return run_propagation(edges, mode="longest", src_col=u, dst_col=v,
                           num_partitions=num_partitions or 16,
                           max_rounds=max_iters) \
        .map_batches(lambda t: pa.table({"node": t["node"],
                                         "level": t["dist"]}
                                        ).cast(out_schema),
                     batch_format="pyarrow")


def scc_labels(edges: ray.data.Dataset, *, u: str = "u", v: str = "v",
               num_partitions: "int | None" = None,
               max_outer: int = 50) -> ray.data.Dataset:
    """STRONGLY connected components of a directed edge list —
    Dataset(node, scc) where scc = the component's minimum node id.

    Trim-and-intersect FW–BW (the label-intersection variant of Orzan
    coloring), FULLY FUSED into the Pregel shard ring
    (stages/pregel.py SCCShard — the r5 rewrite of the r4 VERDICT's
    one perf-weak item): the directed edge list hash-partitions ONCE
    into per-shard actor memory; each inner ring round exchanges the
    forward label (min id reaching the node) and backward label (min
    id the node reaches) TOGETHER; at the inner fixpoint, nodes whose
    labels agree (=w) satisfy w→v and v→w, so the COMPLETE SCC of w
    settles with its true min label — and the SCC of the globally
    minimal remaining id always settles ⇒ guaranteed progress.
    Settling, incident-edge dropping, singleton accounting (an active
    node that loses every edge would settle fw=bw=self next round, so
    it settles immediately) and label resets all run inside the
    shards; an outer round costs inner rings + ONE settle/drop
    exchange — ~10 Dataset executions per round in the r4 version,
    ZERO here. Raises after ``max_outer`` rounds."""
    from ..stages.pregel import run_scc

    ktype = edges.schema().base_schema.field(u).type
    out_schema = pa.schema([("node", ktype), ("scc", ktype)])
    return run_scc(edges, u=u, v=v,
                   num_partitions=num_partitions or default_parts(),
                   max_outer=max_outer) \
        .map_batches(lambda t: t.cast(out_schema),
                     batch_format="pyarrow")


def random_walks(edges: ray.data.Dataset, *, walk_len: int = 4,
                 u: str = "u", v: str = "v", seed: int = 7,
                 num_partitions: "int | None" = None) -> ray.data.Dataset:
    """DETERMINISTIC random walks (the DeepWalk/node2vec corpus-prep
    step, Perozzi 2014): one ``walk_len``-step walk from EVERY node of
    the undirected graph; the step-s choice at node x is
    sorted_neighbors[h(seed, start, s, x) mod deg] with h =
    pd.util.hash_pandas_object — fully deterministic, layout-free, so
    walks are reproducible without any shared RNG state (the property
    a distributed walk engine actually needs). Returns
    Dataset(start, path) with '>'-joined node ids.

    Per step: ONE co-partitioned union+merge of the walk-state table
    (|V| rows) against the adjacency partition — a vectorized
    merge + per-(start) rank select, no Python loop over rows; the
    adjacency materializes once and never reshuffles."""
    nparts = num_partitions or default_parts()
    ktype = edges.schema().base_schema.field(u).type

    def sym(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([t[u].combine_chunks(),
                                      t[v].combine_chunks()]),
            "nbr": pa.concat_arrays([t[v].combine_chunks(),
                                     t[u].combine_chunks()])})

    adj = edges.map_batches(sym, batch_format="pyarrow").materialize()

    state_schema = pa.schema([("start", ktype), ("cur", ktype),
                              ("path", pa.string())])

    def init_state(t: pa.Table) -> pa.Table:
        if "node" not in t.column_names:
            return state_schema.empty_table()
        s = pc.cast(t["node"], pa.string())
        return pa.table({"start": t["node"], "cur": t["node"],
                         "path": s}).cast(state_schema)

    from ray.data.aggregate import Count as _Count
    state = (adj.map_batches(
        lambda t: t.select(["node"]), batch_format="pyarrow")
        .groupby("node").aggregate(_Count(alias_name="_c"))
        .map_batches(init_state, batch_format="pyarrow")).materialize()

    mem = pa.schema([("start", ktype), ("cur", ktype),
                     ("path", pa.string()), ("nbr", ktype),
                     ("part", pa.int64()), ("side", pa.int8())])

    def tag_state(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"start": t["start"], "cur": t["cur"],
                         "path": t["path"], "nbr": pa.nulls(n, ktype),
                         "part": _hash_part_col(t, "cur", nparts),
                         "side": pa.array(np.zeros(n, np.int8), pa.int8())}
                        ).cast(mem)

    def tag_adj(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"start": pa.nulls(n, ktype), "cur": t["node"],
                         "path": pa.nulls(n, pa.string()),
                         "nbr": t["nbr"],
                         "part": _hash_part_col(t, "node", nparts),
                         "side": pa.array(np.ones(n, np.int8), pa.int8())}
                        ).cast(mem)

    adj_tagged = adj.map_batches(tag_adj, batch_format="pyarrow") \
        .materialize()

    from .lineage import snapshot

    for step in range(walk_len):
        def step_merge(g: pd.DataFrame, _step=step) -> pa.Table:
            # the union-tag nulls coerce int64 id columns to float64 in
            # pandas — restore exact ints BEFORE hashing/formatting (a
            # float "1.0" would silently change every hash key)
            for col in ("start", "cur", "nbr"):
                if pd.api.types.is_float_dtype(g[col]):
                    g[col] = g[col].astype("Int64")
            st = g[g["side"] == 0].copy()
            ad = g[g["side"] == 1][["cur", "nbr"]] \
                .drop_duplicates().sort_values(["cur", "nbr"])
            if len(st) == 0:
                return state_schema.empty_table()
            for sub, cols in ((st, ("start", "cur")), (ad, ("cur", "nbr"))):
                for col in cols:
                    if str(sub[col].dtype) == "Int64":
                        sub[col] = sub[col].astype(np.int64)
            m = st[["start", "cur", "path"]].merge(ad, on="cur")
            m["rank"] = m.groupby("start").cumcount()
            deg = m.groupby("start")["rank"].transform("size")
            hkey = pd.util.hash_pandas_object(
                pd.Series([f"{seed}:{s}:{_step}:{c}" for s, c in
                           zip(m["start"], m["cur"])]), index=False) \
                .to_numpy()
            # uint64 % int64 silently promotes to float64 in numpy and
            # mangles the low bits — keep the modulo in uint64
            sel = (hkey % deg.to_numpy().astype(np.uint64)) \
                .astype(np.int64)
            pick = m[m["rank"].to_numpy() == sel]
            return pa.table({
                "start": pa.array(pick["start"].to_numpy()).cast(ktype),
                "cur": pa.array(pick["nbr"].to_numpy()).cast(ktype),
                "path": pa.array([f"{p}>{n}" for p, n in
                                  zip(pick["path"], pick["nbr"])],
                                 pa.string())}).cast(state_schema)

        state = snapshot(
            state.map_batches(tag_state, batch_format="pyarrow")
            .union(adj_tagged)
            .groupby("part").map_groups(step_merge,
                                        batch_format="pandas"),
            num_blocks=nparts)

    return state.map_batches(lambda t: t.select(["start", "path"]),
                             batch_format="pyarrow")


def label_propagation(edges: ray.data.Dataset, *, rounds: int = 5,
                      num_partitions: "int | None" = None
                      ) -> ray.data.Dataset:
    """Synchronous label-propagation communities (Raghavan et al. 2007,
    deterministic variant) over an undirected edge list Dataset(u, v):
    labels start as node ids; each round every node adopts the most
    frequent label among its NEIGHBORS (ties → smallest label), for a
    FIXED number of synchronous rounds — the schedule that makes the
    result bit-deterministic under any partitioning (async/stochastic
    LPA is run-order dependent).

    Returns Dataset(lnode, label). Per round: one hash join of the
    (node, nbr) adjacency against the label table, one (node, label)
    count groupby, one per-node argmax map_groups — nothing denser than
    the edge list ever shuffles."""
    from ray.data.aggregate import Count

    num_partitions = num_partitions or default_parts()

    def sym(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([t["u"].combine_chunks(),
                                      t["v"].combine_chunks()]),
            "nbr": pa.concat_arrays([t["v"].combine_chunks(),
                                     t["u"].combine_chunks()])})

    adj = edges.map_batches(sym, batch_format="pyarrow").materialize()
    lab_schema = pa.schema([("lnode", pa.int64()), ("label", pa.int64())])

    def init_labels(t: pa.Table) -> pa.Table:
        if "node" not in t.column_names:   # empty aggregate partition
            return lab_schema.empty_table()
        return pa.table({"lnode": t["node"],
                         "label": t["node"]}).cast(lab_schema)

    # materialized: the join's right side must stream schema-uniform
    # blocks (empty aggregate partitions otherwise leak their input
    # schema into acero's key resolution)
    labels = (adj.map_batches(
        lambda t: t.select(["node"]).group_by("node").aggregate([]),
        batch_format="pyarrow")
        .groupby("node").aggregate(Count(alias_name="_n"))
        .map_batches(init_labels, batch_format="pyarrow").materialize())

    def pick(g: pd.DataFrame) -> pa.Table:
        rows_n, rows_l = [], []
        for node, grp in g.groupby("node", sort=False):
            best = grp.sort_values(["n", "label"],
                                   ascending=[False, True]).iloc[0]
            rows_n.append(int(node))
            rows_l.append(int(best["label"]))
        return pa.table({"lnode": pa.array(rows_n, pa.int64()),
                         "label": pa.array(rows_l, pa.int64())}
                        ).cast(lab_schema)

    from .joins import auto_join

    for _ in range(rounds):
        # auto_join, not Dataset.join: the label table regenerated each
        # round carries many empty blocks (one per empty map_groups
        # partition), which Ray's hash-shuffle join feeds acero as
        # schema-less right partitions → FieldRef resolution errors;
        # auto_join's paths are robust to empty blocks on either side
        nbr_lab = (auto_join(adj, labels, left_key="nbr",
                             right_key="lnode", right_cols=["label"],
                             num_partitions=num_partitions)
                   .map_batches(lambda t: pa.table(
                       {"node": t["node"], "label": t["label"]}),
                       batch_format="pyarrow"))
        counted = (nbr_lab.groupby(["node", "label"])
                   .aggregate(Count(alias_name="n")))
        def clean(t: pa.Table) -> pa.Table:
            # EMPTY map_groups partitions pass their INPUT block through
            # with the pre-group (node, label, n) schema — normalize, or
            # the next round's join sees heterogeneous right-side blocks
            if "lnode" not in t.column_names:
                return lab_schema.empty_table()
            return pa.table({"lnode": t["lnode"],
                             "label": t["label"]}).cast(lab_schema)

        # materialize per round: labels is node-sized (skinny), and an
        # unmaterialized plan would re-execute every prior round at each
        # consumption (the iterative-Dataset contract pagerank.py uses)
        labels = (counted.groupby("node")
                  .map_groups(pick, batch_format="pandas")
                  .map_batches(clean, batch_format="pyarrow")
                  .materialize())
    return labels


def boruvka_msf(edges: ray.data.Dataset, *, u: str = "u", v: str = "v",
                w: str = "w", driver_threshold: int = 2_000_000,
                num_partitions: int = 16) -> dict:
    """Minimum spanning FOREST via distributed Borůvka (Borůvka 1926,
    public classic; the round structure is the textbook parallel-MST
    algorithm): each round every component selects its minimum crossing
    edge under the STRICT total order (w, u, v) — strictness makes the
    per-round selected edge set provably acyclic even with tied weights
    (a cycle would need two edges each "smaller" than the other at the
    cycle's max) — the selected edges contract via connected components,
    and the component count at least halves, so rounds ≤ ceil(log2 n).
    All minimum spanning forests share one total weight (matroid
    exchange argument), so (total_weight, n_msf_edges, n_components) is
    well-defined under tied weights no matter which MSF a tie-break
    picks.

    Scale shape: edges relabel through two ``auto_join`` passes per
    round (size-chosen broadcast vs hash shuffle — never an unconditional
    node-table broadcast); per-component minima ride a per-batch Arrow
    combiner before the component groupby; already-settled (intra-
    component) edges are DROPPED from the working set each round, so the
    edge table shrinks monotonically; the contracted winner graph
    (≤ #components edges, halving every round) runs union-find on the
    driver below ``driver_threshold`` rows and the Pregel min-label
    shards above it (the canonicalize G2b contract).

    Weights and node ids must be non-negative int64 (they travel through
    zero-padded decimal strings for the lexicographic argmin; weights up
    to 10^20 would need a wider pad). Parallel edges and duplicate rows
    are absorbed by the min order; self loops are dropped.

    Returns ``{"n_nodes", "n_components", "n_msf_edges",
    "total_weight"}`` as Python ints (exact)."""
    import ray as _ray

    from ..stages.canonicalize import (connected_components_distributed,
                                       connected_components_driver)
    from .joins import auto_join

    def _pad(col):
        return pc.utf8_lpad(pc.cast(col, pa.string()), 20, padding="0")

    def canon(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t[u], t[v])
        hi = pc.max_element_wise(t[u], t[v])
        return pa.table({"eu": pc.cast(lo, pa.int64()),
                         "ev": pc.cast(hi, pa.int64()),
                         "ew": pc.cast(t[w], pa.int64())})

    canoned = edges.map_batches(canon, batch_format="pyarrow").materialize()
    # self loops leave the WORKING set (never MSF edges) but their
    # endpoints stay in the node census — an isolated self-loop node is
    # still a component
    work = canoned.map_batches(
        lambda t: t.filter(pc.not_equal(t["eu"], t["ev"])),
        batch_format="pyarrow").materialize()

    def emit_nodes(t: pa.Table) -> pa.Table:
        both = pa.table({"node": pa.concat_arrays(
            [t["eu"].combine_chunks(), t["ev"].combine_chunks()])})
        return both.group_by("node").aggregate([])

    nodes = (canoned.map_batches(emit_nodes, batch_format="pyarrow")
             .groupby("node")
             .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
             .materialize())
    n_nodes = nodes.count()
    labels = nodes.map_batches(
        lambda t: pa.table({"node": t["node"], "label": t["node"]}),
        batch_format="pyarrow").materialize()

    total_weight = 0
    n_msf_edges = 0
    for _ in range(64):                      # ≥ log2(any int64 node count)
        lab_u = labels.map_batches(
            lambda t: pa.table({"nu": t["node"], "lu": t["label"]}),
            batch_format="pyarrow")
        lab_v = labels.map_batches(
            lambda t: pa.table({"nv": t["node"], "lv": t["label"]}),
            batch_format="pyarrow")
        crossing = auto_join(work, lab_u, left_key="eu", right_key="nu",
                             right_cols=["lu"])
        crossing = auto_join(crossing, lab_v, left_key="ev",
                             right_key="nv", right_cols=["lv"])
        crossing = crossing.map_batches(
            lambda t: t.filter(pc.not_equal(t["lu"], t["lv"])),
            batch_format="pyarrow").materialize()
        if crossing.count() == 0:
            break
        # working set shrinks: settled edges never cross again. Explicit
        # map_batches projection, NOT select_columns: the filter above
        # leaves EMPTY 5-col blocks that Project passes through with
        # their stale schema, poisoning schema() for the next round's
        # auto_join (same empty-block hazard the label-propagation loop
        # hardens against).
        work = crossing.map_batches(
            lambda t: pa.table({"eu": t["eu"], "ev": t["ev"],
                                "ew": t["ew"]}),
            batch_format="pyarrow").materialize()

        def keyed(t: pa.Table) -> pa.Table:
            key = pc.binary_join_element_wise(
                _pad(t["ew"]), _pad(t["eu"]), _pad(t["ev"]),
                _pad(t["lu"]), _pad(t["lv"]), "|")
            both = pa.concat_tables([
                pa.table({"comp": t["lu"], "key": key}),
                pa.table({"comp": t["lv"], "key": key})])
            g = both.group_by("comp").aggregate([("key", "min")])
            return g.rename_columns(["comp", "key"])

        winners = (crossing.map_batches(keyed, batch_format="pyarrow")
                   .groupby("comp").aggregate(Min("key",
                                                  alias_name="key")))
        sel = (winners.map_batches(
            lambda t: pa.table({"key": t["key"]}), batch_format="pyarrow")
            .groupby("key")
            .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow"))

        def parse(t: pa.Table) -> pa.Table:
            parts = pc.split_pattern(t["key"], "|")
            cols = [pc.cast(pc.list_element(parts, i), pa.int64())
                    for i in range(5)]
            return pa.table({"ew": cols[0], "eu": cols[1], "ev": cols[2],
                             "lu": cols[3], "lv": cols[4]})

        sel = sel.map_batches(parse, batch_format="pyarrow").materialize()
        agg = sel.aggregate(Sum("ew"), Count())
        total_weight += int(agg["sum(ew)"])
        n_msf_edges += int(agg["count()"])

        str_edges = sel.map_batches(
            lambda t: pa.table({"src": pc.cast(t["lu"], pa.string()),
                                "dst": pc.cast(t["lv"], pa.string())}),
            batch_format="pyarrow").materialize()
        if str_edges.count() <= driver_threshold:
            mapping = {int(k): int(val) for k, val in
                       connected_components_driver(str_edges).items()}
            ref = _ray.put(mapping)

            def relab(t: pa.Table, ref=ref) -> pa.Table:
                d = _ray.get(ref)
                # integer-domain relabel: pandas .map + fillna upcasts
                # through float64 on any miss and would corrupt ids
                # above 2^53 — keep the full-int64 id contract instead
                s = t["label"].to_numpy(zero_copy_only=False)
                out = np.fromiter((d.get(int(x), int(x)) for x in s),
                                  np.int64, len(s))
                return pa.table({"node": t["node"],
                                 "label": pa.array(out)})

            labels = labels.map_batches(
                relab, batch_format="pyarrow").materialize()
        else:
            lab2 = connected_components_distributed(
                str_edges, num_partitions=num_partitions)
            mapping_ds = lab2.map_batches(
                lambda t: pa.table(
                    {"olab": pc.cast(t["node"], pa.int64()),
                     "nlab": pc.cast(t["label"], pa.int64())}),
                batch_format="pyarrow")
            joined = labels.join(mapping_ds, join_type="left_outer",
                                 num_partitions=num_partitions,
                                 on=("label",), right_on=("olab",))

            def coalesce(t: pa.Table) -> pa.Table:
                lbl = pc.coalesce(t["nlab"], t["label"])
                return pa.table({"node": t["node"],
                                 "label": pc.cast(lbl, pa.int64())})

            labels = joined.map_batches(
                coalesce, batch_format="pyarrow").materialize()

    return {"n_nodes": int(n_nodes),
            "n_components": int(n_nodes - n_msf_edges),
            "n_msf_edges": int(n_msf_edges),
            "total_weight": int(total_weight)}



def double_sweep_diameter(edges: ray.data.Dataset, *, u: str = "u",
                          v: str = "v",
                          num_partitions: "int | None" = None) -> dict:
    """Double-sweep BFS diameter lower bound (Magnien/Latapy/Habib
    2009): BFS from the min node, re-BFS from the farthest node found
    (ties → min id). The second eccentricity is ≤ the true diameter D
    and ≥ ⌈D/2⌉ (any eccentricity is), and is EXACT on trees. Two
    Pregel BFS runs; two (dist, node) argmax reductions on the driver.

    Returns {"start", "far_node", "ecc_start", "diameter_lb",
    "n_reached"} — n_reached counts the far node's component."""
    src0 = int(edges.min(u))

    def far_of(ds) -> "tuple[int, int]":
        m = int(ds.max("dist") or 0)
        node = int(ds.map_batches(
            lambda t, m=m: t.filter(pc.equal(t["dist"],
                                             pa.scalar(m, pa.int64()))),
            batch_format="pyarrow").min("node"))
        return node, m

    d1 = bfs_distances(edges, source=src0, u=u, v=v,
                       num_partitions=num_partitions)
    far1, ecc1 = far_of(d1)
    d2 = bfs_distances(edges, source=far1, u=u, v=v,
                       num_partitions=num_partitions)
    _far2, ecc2 = far_of(d2)
    return {"start": src0, "far_node": far1, "ecc_start": ecc1,
            "diameter_lb": ecc2, "n_reached": int(d2.count())}
