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


def union_by_name(a: ray.data.Dataset, b: ray.data.Dataset
                  ) -> ray.data.Dataset:
    """DuckDB ``UNION ALL BY NAME`` semantics — the schema-evolution
    union: the output schema is the union of both inputs' columns (a's
    order, then b's new columns); columns missing on one side pad with
    typed nulls. Same-name columns must agree on type (no silent
    coercion — schema drift should fail loudly, not corrupt).

    Per-batch pad + native ``Dataset.union`` — zero shuffle, streams."""
    sa, sb = a.schema().base_schema, b.schema().base_schema
    types: "dict[str, pa.DataType]" = {}
    names: "list[str]" = []
    for s in (sa, sb):
        for f in s:
            if f.name in types:
                if types[f.name] != f.type:
                    raise ValueError(
                        f"union_by_name type conflict on {f.name!r}: "
                        f"{types[f.name]} vs {f.type}")
            else:
                types[f.name] = f.type
                names.append(f.name)

    def pad(t: pa.Table) -> pa.Table:
        n = len(t)
        have = set(t.column_names)
        return pa.table({c: (t[c] if c in have else pa.nulls(n, types[c]))
                         for c in names})

    return a.map_batches(pad, batch_format="pyarrow").union(
        b.map_batches(pad, batch_format="pyarrow"))
