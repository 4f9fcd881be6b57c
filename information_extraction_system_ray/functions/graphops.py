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
from ray.data.aggregate import Count, Sum

from .partitions import default_parts


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
