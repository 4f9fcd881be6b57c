"""Range (interval) join — an operator Ray Data lacks (SURVEY.md §2.4
family; same gap class as the as-of join in asof.py).

For each left row, count right rows with an equal key whose timestamp falls
in ``[left_ts + lo, left_ts + hi)`` — the "events within N days of the
order" query every engine plans as equi-join + range filter. Left-join
semantics: every left row survives, unmatched ones with count 0.

Distributed plan (mirrors asof_join_backward): the right side is projected
to skinny (key, ts) BEFORE the shuffle — payload never moves — and both
sides are hash-partitioned by the join key (the partitioning assumption:
all rows of a key land in one partition). Inside a partition the counts are
computed per key with two ``np.searchsorted`` calls over that key's sorted
right timestamps — one numpy call per KEY, not per row, and candidate pairs
are never materialized, so a head key (wikipedia.org-scale hub) costs
O(rows·log) time and O(rows) memory, not O(left×right).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .partitions import default_parts

_RTS = "_rj_rts"


def range_join_count(left: ray.data.Dataset, right: ray.data.Dataset, *,
                     left_by: str, right_by: str,
                     left_ts: str, right_ts: str,
                     lo: pd.Timedelta, hi: pd.Timedelta,
                     count_col: str = "n_matches",
                     num_partitions: "int | None" = None
               ) -> ray.data.Dataset:
    """LEFT columns + ``count_col`` = #right rows with ``right_by ==
    left_by`` and ``right_ts`` in ``[left_ts + lo, left_ts + hi)``."""
    num_partitions = num_partitions or default_parts()
    lschema = left.schema()
    left_cols = list(lschema.names)
    ltypes = {n: lschema.base_schema.field(n).type for n in left_cols}
    rby_type = right.schema().base_schema.field(right_by).type
    rts_type = right.schema().base_schema.field(right_ts).type
    lo_us = int(lo / pd.Timedelta(microseconds=1))
    hi_us = int(hi / pd.Timedelta(microseconds=1))

    def _part_of(col_vals: pd.Series) -> pa.Array:
        return pa.array((pd.util.hash_pandas_object(col_vals, index=False)
                         % num_partitions).to_numpy(), pa.int64())

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in left_cols}
        n = len(t)
        cols[right_by] = pa.nulls(n, rby_type)
        cols[_RTS] = pa.nulls(n, rts_type)
        cols["part"] = _part_of(pd.Series(t[left_by].to_pandas()))
        cols["side"] = pa.array([0] * n, pa.int8())
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {c: pa.nulls(n, ltypes[c]) for c in left_cols}
        cols[right_by] = t[right_by]
        cols[_RTS] = t[right_ts]
        cols["part"] = _part_of(pd.Series(t[right_by].to_pandas()))
        cols["side"] = pa.array([1] * n, pa.int8())
        return pa.table(cols)

    left_t = left.map_batches(tag_left, batch_format="pyarrow")
    right_t = right.map_batches(
        lambda t: pa.table({right_by: t[right_by], right_ts: t[right_ts]}),
        batch_format="pyarrow").map_batches(tag_right,
                                            batch_format="pyarrow")

    out_schema = pa.schema([(c, ltypes[c]) for c in left_cols]
                           + [(count_col, pa.int64())])

    def merge(part: pa.Table) -> pa.Table:
        # split sides in Arrow so the left slice's own columns never see
        # the union's typed-null padding (r1 schema-stability rule)
        side = part["side"]
        l = part.filter(pc.equal(side, 0)).select(left_cols)
        if l.num_rows == 0:
            return out_schema.empty_table()
        r = part.filter(pc.equal(side, 1)).select([right_by, _RTS])
        counts = np.zeros(l.num_rows, dtype=np.int64)
        if r.num_rows:
            # normalize any timestamp unit (ns from pandas, us from
            # parquet) to MICROSECONDS before the integer view — lo/hi
            # are in us
            def _us(col: pa.ChunkedArray) -> np.ndarray:
                if pa.types.is_timestamp(col.type):
                    col = col.cast(pa.timestamp("us"))
                return col.cast(pa.int64()).to_numpy(zero_copy_only=False)

            rby = r[right_by].to_numpy(zero_copy_only=False)
            rts = _us(r[_RTS])
            order = np.lexsort((rts, rby))
            rby, rts = rby[order], rts[order]
            lby = l[left_by].to_numpy(zero_copy_only=False)
            lts = _us(l[left_ts])
            # one searchsorted pair per KEY over that key's sorted ts run
            key_lo = np.searchsorted(rby, lby, side="left")
            key_hi = np.searchsorted(rby, lby, side="right")
            for key in np.unique(lby[key_lo < key_hi]):
                lmask = lby == key
                s, e = key_lo[lmask][0], key_hi[lmask][0]
                run = rts[s:e]
                counts[lmask] = (np.searchsorted(run, lts[lmask] + hi_us,
                                                 side="left")
                                 - np.searchsorted(run, lts[lmask] + lo_us,
                                                   side="left"))
        return pa.table(
            {**{c: l[c] for c in left_cols},
             count_col: pa.array(counts, pa.int64())}).cast(out_schema)

    return (left_t.union(right_t)
            .groupby("part")
            .map_groups(merge, batch_format="pyarrow"))
