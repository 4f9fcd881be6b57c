"""Grouped collection aggregates — collect_set / string_agg, the missing
"gather the group's values into one cell" operator class (SQL
``string_agg(DISTINCT v ORDER BY v)`` / Spark ``collect_set``).

Scale pattern: per-batch DISTINCT (key, value) pairs (the combiner — the
shuffle then carries at most |keys|×|distinct values| rows per block, not
the raw stream), one groupby on the pair for global dedup, then a per-key
sorted assembly. Deterministic: output order inside a cell is the sorted
value order, never arrival order.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from .arrowutil import to_arrow


def collect_set_sorted(ds: ray.data.Dataset, *, key: str, value: str,
                       sep: "str | None" = "|") -> ray.data.Dataset:
    """Dataset(key, values) where ``values`` is the group's DISTINCT
    ``value`` items sorted ascending — joined with ``sep`` into one string
    (SQL ``string_agg(DISTINCT ...)``; hash-stable scalar cell), or a
    ``list<string>`` column when ``sep`` is None."""
    key_type = ds.schema().base_schema.field(key).type

    def distinct_pairs(t: pa.Table) -> pa.Table:
        return t.select([key, value]).group_by([key, value]).aggregate([])

    from ray.data.aggregate import Count
    pairs = (ds.map_batches(distinct_pairs, batch_format="pyarrow")
             .groupby([key, value]).aggregate(Count(alias_name="_n"))
             .select_columns([key, value]))

    if sep is None:
        out_schema = pa.schema([(key, key_type),
                                ("values", pa.list_(pa.string()))])
    else:
        out_schema = pa.schema([(key, key_type), ("values", pa.string())])

    def assemble(g: pd.DataFrame) -> pa.Table:
        agg = (g.sort_values(value)
               .groupby(key, sort=False)[value]
               .agg(lambda s: sep.join(s) if sep is not None else list(s))
               .rename("values").reset_index())
        return to_arrow(agg, out_schema)

    return pairs.groupby(key).map_groups(assemble, batch_format="pandas")
