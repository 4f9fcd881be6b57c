"""Reshape operators — UNPIVOT/melt (SURVEY §2.12 round-3 widening).

``melt`` is the inverse of the pivot family (queries.py G12): wide value
columns become (variable, value) rows. Pure per-batch Arrow — one take +
concat per value column, no shuffle, no Python loop over rows; output is
``len(value_cols) ×`` input rows, streamed block by block (never
materialized wide)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def melt(ds: ray.data.Dataset, *, id_cols: "list[str]",
         value_cols: "list[str]", var_name: str = "variable",
         value_name: str = "value",
         value_type: "pa.DataType" = None) -> ray.data.Dataset:
    """SQL ``UNPIVOT`` (pandas ``melt``): one output row per (input row,
    value column). ``value_type`` defaults to the common cast target
    float64; all value columns must cast to it losslessly enough for the
    caller's purposes (the SQL UNION ALL oracle applies the same cast)."""
    vt = value_type or pa.float64()

    def _melt(t: pa.Table) -> pa.Table:
        pieces = []
        for c in value_cols:
            cols = {k: t[k] for k in id_cols}
            cols[var_name] = pa.array([c] * len(t), pa.string())
            cols[value_name] = pc.cast(t[c], vt)
            pieces.append(pa.table(cols))
        if not pieces:
            return pa.table({k: t[k] for k in id_cols})
        return pa.concat_tables(pieces)

    return ds.map_batches(_melt, batch_format="pyarrow")
