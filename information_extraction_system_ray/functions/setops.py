"""SQL set operations over whole rows — INTERSECT / EXCEPT (distinct
semantics), the §2.7 set-op family beyond union/distinct.

Distributed plan: both sides are collapsed to DISTINCT rows per batch (the
combiner), tagged with a side bit, hash-partitioned on the full row key
through ONE union+groupby, and a vectorized pandas merge per partition
keeps rows present in both (INTERSECT) or left-only (EXCEPT). Each
partition sees only its own key slice — no side needs to fit anywhere.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from .arrowutil import to_arrow
from .partitions import default_parts


def _set_op(left: ray.data.Dataset, right: ray.data.Dataset,
            keep_both: bool,
            num_partitions: "int | None" = None) -> ray.data.Dataset:
    num_partitions = num_partitions or default_parts()
    schema = left.schema().base_schema
    names = list(schema.names)
    out_schema = pa.schema([(n, schema.field(n).type) for n in names])

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.group_by(names).aggregate([])  # per-batch distinct
            df = t.to_pandas()
            key = df[names[0]].astype(str)
            for n in names[1:]:
                key = key + "\x00" + df[n].astype(str)
            part = pd.util.hash_pandas_object(key, index=False) \
                % num_partitions
            return (t.append_column("_spart",
                                    pa.array(part.to_numpy(), pa.int64()))
                    .append_column("_sside",
                                   pa.array([side] * len(t), pa.int8())))
        return fn

    def resolve(g: pd.DataFrame) -> pa.Table:
        l = g[g["_sside"] == 0][names].drop_duplicates()
        r = g[g["_sside"] == 1][names].drop_duplicates()
        if keep_both:
            out = l.merge(r, on=names, how="inner")
        else:
            out = l.merge(r, on=names, how="left", indicator=True)
            out = out[out["_merge"] == "left_only"][names]
        return to_arrow(out[names], out_schema)

    return (left.map_batches(tag(0), batch_format="pyarrow")
            .union(right.map_batches(tag(1), batch_format="pyarrow"))
            .groupby("_spart")
            .map_groups(resolve, batch_format="pandas"))


def intersect_distinct(left: ray.data.Dataset, right: ray.data.Dataset,
                       num_partitions: "int | None" = None
                       ) -> ray.data.Dataset:
    """SQL ``INTERSECT``: distinct rows present in BOTH inputs (schemas
    must match)."""
    return _set_op(left, right, keep_both=True,
                   num_partitions=num_partitions)


def except_distinct(left: ray.data.Dataset, right: ray.data.Dataset,
                    num_partitions: "int | None" = None) -> ray.data.Dataset:
    """SQL ``EXCEPT``: distinct left rows absent from right."""
    return _set_op(left, right, keep_both=False,
                   num_partitions=num_partitions)
