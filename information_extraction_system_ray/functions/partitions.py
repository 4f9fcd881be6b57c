"""Cluster-size-derived shuffle partition counts.

Every hash-partitioned operator in this repo (window, asof, range join,
semi/anti join, dedup pair buckets, graph merge) takes a
``num_partitions``; a fixed constant is right for a 32-CPU test node but
starves a 256-node cluster (too few reducers) or drowns a laptop in tiny
tasks (too many). ``default_parts()`` resolves the count LAZILY at operator
call time from the live cluster: ~1 hash partition per CPU, floored so
small clusters still get enough parallelism to overlap stages, capped so a
driver-side per-partition merge never sees an absurd task count.

Callers that pass an explicit ``num_partitions`` are untouched — all
outputs are partition-count invariant (property-tested), so this is purely
a physical-plan knob.
"""

from __future__ import annotations


def default_parts(min_parts: int = 16, per_cpu: float = 1.0,
                  max_parts: int = 2048) -> int:
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 0)) \
            if ray.is_initialized() else 0
    except Exception:
        cpus = 0
    return max(min_parts, min(max_parts, int(cpus * per_cpu)))


def compaction_plan(files, *, target_bytes: int,
                    file_col: str = "file_id", size_col: str = "bytes"):
    """Small-file COMPACTION planner — first-fit-decreasing bin packing
    of a file manifest into ≤ ``target_bytes`` output bins (the
    maintenance operation every table format runs to keep file counts
    sane; FFD guarantees ≤ 11/9·OPT + 6/9 bins, Johnson 1973). Returns
    Dataset(file_id, bytes, bin_id).

    Scale contract: the input is FILE METADATA (one row per file, not
    per record — ~10⁵ rows for 100 TB at 1 GB files), so the inherently
    sequential FFD scan runs in ONE map_groups task over the manifest;
    only the manifest ever moves. Deterministic: files sort by
    (-bytes, file_id); an oversized file gets its own bin. Bin ids are
    assigned in creation order."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    out_schema = pa.schema([("file_id", pa.int64()), ("bytes", pa.int64()),
                            ("bin_id", pa.int64())])

    def ffd(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([size_col, file_col],
                          ascending=[False, True], kind="mergesort")
        sizes = g[size_col].to_numpy(np.int64)
        remaining: "list[int]" = []     # residual capacity per bin
        assign = np.empty(len(sizes), np.int64)
        for i, s in enumerate(sizes):
            for b, cap in enumerate(remaining):
                if s <= cap:
                    remaining[b] = cap - s
                    assign[i] = b
                    break
            else:
                assign[i] = len(remaining)
                remaining.append(max(target_bytes - int(s), 0))
        return pa.table({"file_id": pa.array(g[file_col].to_numpy(np.int64)),
                         "bytes": pa.array(sizes),
                         "bin_id": pa.array(assign)}).cast(out_schema)

    def const_key(t: pa.Table) -> pa.Table:
        return t.append_column("_k", pa.array([0] * t.num_rows, pa.int8()))

    return (files.map_batches(const_key, batch_format="pyarrow")
            .groupby("_k").map_groups(ffd, batch_format="pandas"))
