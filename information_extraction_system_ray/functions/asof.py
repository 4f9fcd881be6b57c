"""As-of (nearest-prior) join — an operator Ray Data lacks (SURVEY.md §2.4).

For each left row, attach the greatest right timestamp ≤ the left timestamp
within the same key (backward as-of semantics, == DuckDB ``ASOF JOIN``).

Distributed plan: both sides are projected onto one superset schema (nulls
for the absent side's columns), tagged, and hash-partitioned by the join
KEY — the partitioning assumption this operator relies on: all rows of a
key land in one partition; no time-range partitioning is needed because the
right side is re-sorted inside each partition. One vectorized
``pandas.merge_asof`` runs per partition. Output values are the matched
right TIMESTAMP (not an arbitrary right row id), so results are
deterministic under timestamp ties. Left and right column names must be
disjoint.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .partitions import default_parts

_RTS = "_asof_rts"


def asof_join_backward(left: ray.data.Dataset, right: ray.data.Dataset, *,
                       left_by: str, right_by: str,
                       left_ts: str, right_ts: str,
                       out_col: str = "matched_ts",
                       num_partitions: "int | None" = None,
                       direction: str = "backward",
                       tolerance: "pd.Timedelta | None" = None,
                       allow_exact_matches: bool = True
                       ) -> ray.data.Dataset:
    """Inner as-of join; returns the LEFT columns + ``out_col`` (matched
    right timestamp). Unmatched left rows are dropped.

    ``direction`` 'backward' (greatest right ts ≤ left ts, default, ==
    DuckDB ASOF JOIN) or 'forward' (smallest right ts ≥ left ts);
    ``tolerance`` bounds the match distance; ``allow_exact_matches=False``
    makes the comparison strict — pandas ``merge_asof`` semantics, which
    is the per-partition kernel."""
    num_partitions = num_partitions or default_parts()
    lschema = left.schema()
    left_cols = list(lschema.names)
    ltypes = {n: lschema.base_schema.field(n).type for n in left_cols}
    rts_type = right.schema().base_schema.field(right_ts).type
    rby_type = right.schema().base_schema.field(right_by).type
    # alias the right key when it collides with ANY left column name
    # (self-joins: left_by == right_by) — otherwise tag_left's typed-null
    # padding would overwrite the left key column in the superset schema
    rby_col = right_by if right_by not in left_cols else "_asof_rby"

    def _part_of(col_vals: pd.Series) -> pa.Array:
        return pa.array((pd.util.hash_pandas_object(col_vals, index=False)
                         % num_partitions).to_numpy(), pa.int64())

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in left_cols}
        n = len(t)
        cols[rby_col] = pa.nulls(n, rby_type)
        cols[_RTS] = pa.nulls(n, rts_type)
        cols["part"] = _part_of(pd.Series(t[left_by].to_pandas()))
        cols["side"] = pa.array([0] * n, pa.int8())
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {c: pa.nulls(n, ltypes[c]) for c in left_cols}
        cols[rby_col] = t[right_by]
        cols[_RTS] = t[right_ts]
        cols["part"] = _part_of(pd.Series(t[right_by].to_pandas()))
        cols["side"] = pa.array([1] * n, pa.int8())
        return pa.table(cols)

    left_t = left.map_batches(tag_left, batch_format="pyarrow")
    # right side travels with only (key, ts) — payload never shuffles
    right_t = right.map_batches(
        lambda t: pa.table({right_by: t[right_by], right_ts: t[right_ts]}),
        batch_format="pyarrow").map_batches(tag_right,
                                            batch_format="pyarrow")

    # Every partition (including empty / one-sided ones) emits blocks of
    # EXACTLY this schema — the union's typed-null padding must never leak
    # into the output as pandas float64 / timestamp[s] drift.
    out_schema = pa.schema([(c, ltypes[c]) for c in left_cols]
                           + [(out_col, rts_type)])

    def merge(part: pa.Table) -> pa.Table:
        # Split sides in ARROW: the left slice has no nulls in its own
        # columns, so the pandas conversion below keeps int64 int64.
        side = part["side"]
        l = part.filter(pc.equal(side, 0)).select(left_cols)
        r = part.filter(pc.equal(side, 1)).select([rby_col, _RTS])
        if l.num_rows == 0 or r.num_rows == 0:
            return out_schema.empty_table()
        ldf = l.to_pandas().sort_values(left_ts, kind="mergesort")
        rdf = (r.to_pandas().rename(columns={_RTS: out_col})
               .sort_values(out_col, kind="mergesort"))
        m = pd.merge_asof(ldf, rdf, left_on=left_ts, right_on=out_col,
                          left_by=left_by, right_by=rby_col,
                          direction=direction, tolerance=tolerance,
                          allow_exact_matches=allow_exact_matches)
        m = m.dropna(subset=[out_col])           # inner semantics
        m = m[left_cols + [out_col]]
        return (pa.Table.from_pandas(m, schema=out_schema,
                                     preserve_index=False)
                .replace_schema_metadata(None))

    return (left_t.union(right_t)
            .groupby("part")
            .map_groups(merge, batch_format="pyarrow"))
