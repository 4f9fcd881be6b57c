"""Upsert / latest-wins merge — the CDC-compaction operator (SCD type 1):
given a base snapshot and an update stream with a version column, keep ONE
row per key, the highest version, updates beating base on ties.

Distributed plan: tag side, union, hash-partition on the key, one
vectorized per-partition sort + head(1) per key (grouping by PARTITION —
same pattern as dedup_pages_by_url, which is this operator specialized to
url/warc_ts). Output schema == input schema; deterministic for any block
order because (version, side) is a total order per key when the caller's
version column is unique per (key, side) — otherwise ties break on the
sorted remaining columns.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from .arrowutil import to_arrow
from .partitions import default_parts


def upsert(base: ray.data.Dataset, updates: ray.data.Dataset, *,
           key_cols: list[str], version_col: str,
           num_partitions: "int | None" = None) -> ray.data.Dataset:
    num_partitions = num_partitions or default_parts()
    schema = base.schema().base_schema
    names = list(schema.names)
    out_schema = pa.schema([(n, schema.field(n).type) for n in names])

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            df = t.select(key_cols).to_pandas()
            key = df[key_cols[0]].astype(str)
            for k in key_cols[1:]:
                key = key + "\x00" + df[k].astype(str)
            part = pd.util.hash_pandas_object(key, index=False) \
                % num_partitions
            return (t.append_column("_upart",
                                    pa.array(part.to_numpy(), pa.int64()))
                    .append_column("_uside",
                                   pa.array([side] * len(t), pa.int8())))
        return fn

    def pick(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(key_cols + [version_col, "_uside"],
                          ascending=[True] * len(key_cols) + [False, False],
                          kind="mergesort")
        out = g.groupby(key_cols, sort=False).head(1)
        return to_arrow(out[names], out_schema)

    return (base.map_batches(tag(0), batch_format="pyarrow")
            .union(updates.map_batches(tag(1), batch_format="pyarrow"))
            .groupby("_upart")
            .map_groups(pick, batch_format="pandas"))
