"""Explicit-output-schema helpers (VERDICT r1 rule: every stage that builds
its output in pandas must end by casting to a declared Arrow schema, so block
schemas stay identical across empty / one-sided / non-empty partitions and
int64/timestamp columns never drift to float64/timestamp[s])."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def to_arrow(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    """Convert a pandas frame to an Arrow table with EXACTLY ``schema``
    (column order, names, types), stripping pandas metadata so Ray's block
    schema unification sees one stable schema."""
    if len(df) == 0:
        return schema.empty_table()
    return (pa.Table.from_pandas(df[schema.names], schema=schema,
                                 preserve_index=False)
            .replace_schema_metadata(None))
