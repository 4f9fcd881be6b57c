"""Window operators — per-key row_number / rank and running aggregates,
absent from Ray Data (SURVEY.md §2 gap flagged in VERDICT r1 "What's
missing" #4).

Distributed plan (the partitioning assumption both operators rely on): all
rows of a key land in one partition via a hash-partitioned groupby on
``hash(key) % num_partitions`` — grouping by PARTITION, not per key, so one
vectorized pandas pass runs per partition instead of one Python call per
key. Window semantics are partition-local (sort within partition, groupby
cumcount/cumsum), so no global sort is needed; skewed keys are bounded by
the largest single key's row count, the same bound any engine's window
operator has.

Output schemas are pinned explicitly (arrowutil.to_arrow) per the r1
schema-stability rule: int64 keys and timestamp columns must survive the
pandas pass bit-exact.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from .arrowutil import to_arrow
from .partitions import default_parts


def _hash_part(series: pd.Series, num_partitions: int) -> pd.Series:
    return pd.util.hash_pandas_object(series, index=False) % num_partitions


def _key_series(df: pd.DataFrame, keys: list[str]) -> pd.Series:
    s = df[keys[0]].astype(str)
    for k in keys[1:]:
        s = s + "\x00" + df[k].astype(str)
    return s


def _changed_vs_prev(part: pd.DataFrame, cols: "list[str]") -> pd.Series:
    """Null-aware "this row differs from the previous" over composite
    columns. Plain ``.ne(shift(1))`` treats NaN != NaN, so tied NULL
    order values got distinct ranks — diverging from SQL's
    nulls-are-peers tie rule (ADVICE r2, window.py:269). Here
    NULL == NULL for tie purposes; the first row always counts as
    changed (it starts the first tie group)."""
    changed = pd.Series(False, index=part.index)
    for c in cols:
        s = part[c]
        prev = s.shift(1)
        changed |= s.ne(prev) & ~(s.isna() & prev.isna())
    if len(changed):
        changed.iloc[0] = True
    return changed


def row_number(ds: ray.data.Dataset, *, keys: list[str],
               order_by: list[str], descending: "bool | list[bool]" = False,
               out_col: str = "rn",
               num_partitions: "int | None" = None
               ) -> ray.data.Dataset:
    """Adds a 1-based per-key row number ordered by ``order_by`` (ties must
    be broken by including a unique column in ``order_by`` — same contract
    as SQL ``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY ...)``)."""
    if isinstance(descending, bool):
        descending = [descending] * len(order_by)
    ascending = [not d for d in descending]

    num_partitions = num_partitions or default_parts()
    schema = ds.schema().base_schema
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names]
        + [(out_col, pa.int64())])

    def tag(t: pa.Table) -> pa.Table:
        part = _hash_part(_key_series(t.select(keys).to_pandas(), keys),
                          num_partitions)
        return t.append_column("_wpart",
                               pa.array(part.to_numpy(), pa.int64()))

    def number(part: pd.DataFrame) -> pa.Table:
        part = part.sort_values(order_by, ascending=ascending,
                                kind="mergesort")
        part[out_col] = part.groupby(keys, sort=False).cumcount() + 1
        return to_arrow(part.drop(columns=["_wpart"]), out_schema)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_wpart")
            .map_groups(number, batch_format="pandas"))


def topk_per_key(ds: ray.data.Dataset, k: int, *, keys: list[str],
                 order_by: list[str],
                 descending: "bool | list[bool]" = True,
                 out_col: str = "rn",
                 num_partitions: "int | None" = None
               ) -> ray.data.Dataset:
    """The k best rows per key (with their rank) — ``row_number`` + filter,
    the "latest N events per user"-style query."""
    import pyarrow.compute as pc

    numbered = row_number(ds, keys=keys, order_by=order_by,
                          descending=descending, out_col=out_col,
                          num_partitions=num_partitions)
    return numbered.map_batches(
        lambda t: t.filter(pc.less_equal(t[out_col], k)),
        batch_format="pyarrow")


def sessionize(ds: ray.data.Dataset, *, keys: list[str], ts_col: str,
               order_by: list[str], gap,
               out_col: str = "session_id",
               num_partitions: "int | None" = None
               ) -> ray.data.Dataset:
    """Per-key session assignment (the classic event-stream windowed
    operator): a new session starts at a key's first event or when the gap
    from the previous event exceeds ``gap`` (a ``pd.Timedelta`` for
    timestamp columns, a number otherwise). ``out_col`` is the 1-based
    per-key session counter — identical to SQL
    ``SUM(new_session) OVER (PARTITION BY keys ORDER BY order_by)`` over a
    ``LAG(ts)`` gap test. ``order_by`` must start with ``ts_col`` and
    include a unique tie-break column."""
    num_partitions = num_partitions or default_parts()
    schema = ds.schema().base_schema
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names]
        + [(out_col, pa.int64())])

    def tag(t: pa.Table) -> pa.Table:
        part = _hash_part(_key_series(t.select(keys).to_pandas(), keys),
                          num_partitions)
        return t.append_column("_wpart",
                               pa.array(part.to_numpy(), pa.int64()))

    def assign(part: pd.DataFrame) -> pa.Table:
        part = part.sort_values(order_by, kind="mergesort")
        grp = part.groupby(keys, sort=False)
        prev = grp[ts_col].shift(1)
        new_sess = prev.isna() | ((part[ts_col] - prev) > gap)
        part[out_col] = new_sess.astype("int64") \
            .groupby([part[k] for k in keys], sort=False).cumsum()
        return to_arrow(part.drop(columns=["_wpart"]), out_schema)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_wpart")
            .map_groups(assign, batch_format="pandas"))


def lag_column(ds: ray.data.Dataset, col: str, *, keys: list[str],
               order_by: list[str], periods: int = 1,
               out_col: str = "lag",
               num_partitions: "int | None" = None
               ) -> ray.data.Dataset:
    """Per-key lagged value of ``col`` in ``order_by`` order — SQL
    ``LAG(col, periods) OVER (PARTITION BY keys ORDER BY ...)``; the first
    ``periods`` rows of each key get a typed null. ``order_by`` must include
    a unique tie-break column for deterministic output."""
    num_partitions = num_partitions or default_parts()
    schema = ds.schema().base_schema
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names]
        + [(out_col, schema.field(col).type)])

    def tag(t: pa.Table) -> pa.Table:
        part = _hash_part(_key_series(t.select(keys).to_pandas(), keys),
                          num_partitions)
        return t.append_column("_wpart",
                               pa.array(part.to_numpy(), pa.int64()))

    def shift(part: pd.DataFrame) -> pa.Table:
        part = part.sort_values(order_by, kind="mergesort")
        part[out_col] = part.groupby(keys, sort=False)[col].shift(periods)
        return to_arrow(part.drop(columns=["_wpart"]), out_schema)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_wpart")
            .map_groups(shift, batch_format="pandas"))


def running_sum(ds: ray.data.Dataset, value_col: str, *, keys: list[str],
                order_by: list[str], out_col: str = "running",
                num_partitions: "int | None" = None
               ) -> ray.data.Dataset:
    """Per-key running (cumulative) sum of ``value_col`` in ``order_by``
    order — SQL ``SUM(v) OVER (PARTITION BY keys ORDER BY ... ROWS UNBOUNDED
    PRECEDING)``. Use an integer value column for bit-exact results (float
    accumulation order is deterministic here, but cross-engine rounding is
    not)."""
    num_partitions = num_partitions or default_parts()
    schema = ds.schema().base_schema
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names]
        + [(out_col, schema.field(value_col).type)])

    def tag(t: pa.Table) -> pa.Table:
        part = _hash_part(_key_series(t.select(keys).to_pandas(), keys),
                          num_partitions)
        return t.append_column("_wpart",
                               pa.array(part.to_numpy(), pa.int64()))

    def accumulate(part: pd.DataFrame) -> pa.Table:
        part = part.sort_values(order_by, kind="mergesort")
        part[out_col] = part.groupby(keys, sort=False)[value_col].cumsum()
        return to_arrow(part.drop(columns=["_wpart"]), out_schema)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_wpart")
            .map_groups(accumulate, batch_format="pandas"))


def rolling_sum(ds: ray.data.Dataset, value_col: str, *, keys: list[str],
                order_by: list[str], window: int,
                out_col: str = "rolling",
                count_col: "str | None" = None,
                num_partitions: "int | None" = None) -> ray.data.Dataset:
    """Per-key SLIDING-window sum of the last ``window`` rows (current row
    inclusive) in ``order_by`` order — SQL ``SUM(v) OVER (PARTITION BY keys
    ORDER BY ... ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``. Use an
    integer value column for cross-engine bit-exactness. ``count_col``
    additionally emits the window's row count (= min(pos, window)), so a
    rolling AVG is one exact float64 division downstream — no second
    window pass."""
    num_partitions = num_partitions or default_parts()
    schema = ds.schema().base_schema
    extra = [(out_col, schema.field(value_col).type)]
    if count_col:
        extra.append((count_col, pa.int64()))
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names] + extra)

    def tag(t: pa.Table) -> pa.Table:
        part = _hash_part(_key_series(t.select(keys).to_pandas(), keys),
                          num_partitions)
        return t.append_column("_wpart",
                               pa.array(part.to_numpy(), pa.int64()))

    def roll(part: pd.DataFrame) -> pa.Table:
        part = part.sort_values(order_by, kind="mergesort")
        # windowed sum as cumsum(i) - cumsum(i-window): stays in the value
        # column's own dtype — pandas .rolling() accumulates in float64
        # with a sliding add/subtract that drifts by ±1 ulp on long
        # integer streams
        gkeys = [part[k] for k in keys]
        cum = part.groupby(gkeys, sort=False)[value_col].cumsum()
        prev = cum.groupby(gkeys, sort=False).shift(window)
        part[out_col] = cum - prev.fillna(0).astype(part[value_col].dtype)
        if count_col:
            pos = part.groupby(gkeys, sort=False).cumcount() + 1
            part[count_col] = pos.clip(upper=window).astype("int64")
        return to_arrow(part.drop(columns=["_wpart"]), out_schema)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_wpart")
            .map_groups(roll, batch_format="pandas"))


def dense_rank(ds: ray.data.Dataset, *, keys: list[str],
               order_by: list[str], descending: "bool | list[bool]" = False,
               out_col: str = "dr",
               num_partitions: "int | None" = None) -> ray.data.Dataset:
    """Per-key SQL ``DENSE_RANK() OVER (PARTITION BY keys ORDER BY ...)``:
    equal ``order_by`` tuples share a rank, the next distinct tuple gets
    rank+1. Value-deterministic (no tie-break column needed)."""
    num_partitions = num_partitions or default_parts()
    if isinstance(descending, bool):
        descending = [descending] * len(order_by)
    ascending = [not d for d in descending]

    schema = ds.schema().base_schema
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names]
        + [(out_col, pa.int64())])

    def tag(t: pa.Table) -> pa.Table:
        part = _hash_part(_key_series(t.select(keys).to_pandas(), keys),
                          num_partitions)
        return t.append_column("_wpart",
                               pa.array(part.to_numpy(), pa.int64()))

    def rank(part: pd.DataFrame) -> pa.Table:
        part = part.sort_values(keys + order_by,
                                ascending=[True] * len(keys) + ascending,
                                kind="mergesort").reset_index(drop=True)
        changed = _changed_vs_prev(part, list(keys) + list(order_by))
        gkeys = [part[k] for k in keys]
        part[out_col] = changed.astype("int64") \
            .groupby(gkeys, sort=False).cumsum()
        return to_arrow(part.drop(columns=["_wpart"]), out_schema)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_wpart")
            .map_groups(rank, batch_format="pandas"))


def rolling_sum_time(ds: ray.data.Dataset, value_col: str, *,
                     keys: list[str], ts_col: str, window,
                     out_col: str = "rolling",
                     num_partitions: "int | None" = None
                     ) -> ray.data.Dataset:
    """Per-key TIME-RANGE window sum: for each row, the sum of
    ``value_col`` over the key's rows with ``ts ∈ [row.ts − window,
    row.ts]`` — SQL ``SUM(v) OVER (PARTITION BY keys ORDER BY ts RANGE
    BETWEEN <window> PRECEDING AND CURRENT ROW)`` including the peer rule
    (ALL rows sharing the current ts are in frame). Computed per key as
    cumsum + two searchsorted — integer columns stay exact."""
    import numpy as np

    num_partitions = num_partitions or default_parts()
    schema = ds.schema().base_schema
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names]
        + [(out_col, schema.field(value_col).type)])
    win_us = int(window / pd.Timedelta(microseconds=1))

    def tag(t: pa.Table) -> pa.Table:
        part = _hash_part(_key_series(t.select(keys).to_pandas(), keys),
                          num_partitions)
        return t.append_column("_wpart",
                               pa.array(part.to_numpy(), pa.int64()))

    def roll(part: pd.DataFrame) -> pa.Table:
        part = part.sort_values(keys + [ts_col],
                                kind="mergesort").reset_index(drop=True)
        out = np.empty(len(part), dtype=np.int64)
        pos = 0
        for _, g in part.groupby(keys, sort=False):
            ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(
                np.int64)
            v = g[value_col].to_numpy()
            cum = np.concatenate([[0], np.cumsum(v)])
            start = np.searchsorted(ts, ts - win_us, side="left")
            end = np.searchsorted(ts, ts, side="right")  # peers in frame
            out[pos:pos + len(g)] = cum[end] - cum[start]
            pos += len(g)
        part[out_col] = out.astype(part[value_col].dtype)
        return to_arrow(part.drop(columns=["_wpart"]), out_schema)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_wpart")
            .map_groups(roll, batch_format="pandas"))


def percent_rank(ds: ray.data.Dataset, *, keys: list[str],
                 order_by: list[str],
                 descending: "bool | list[bool]" = False,
                 out_col: str = "pr",
                 num_partitions: "int | None" = None) -> ray.data.Dataset:
    """Per-key SQL ``PERCENT_RANK() OVER (PARTITION BY keys ORDER BY ...)``
    = (rank − 1) / (n − 1), where rank uses min-of-ties (SQL RANK) and n is
    the key's row count; a single-row key gets 0.0. Value-deterministic:
    both engines divide the same exact integers, so the float64 quotient is
    bit-identical — no rounding needed."""
    num_partitions = num_partitions or default_parts()
    if isinstance(descending, bool):
        descending = [descending] * len(order_by)
    ascending = [not d for d in descending]

    schema = ds.schema().base_schema
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names]
        + [(out_col, pa.float64())])

    def tag(t: pa.Table) -> pa.Table:
        part = _hash_part(_key_series(t.select(keys).to_pandas(), keys),
                          num_partitions)
        return t.append_column("_wpart",
                               pa.array(part.to_numpy(), pa.int64()))

    def pr(part: pd.DataFrame) -> pa.Table:
        grp = part.groupby(keys, sort=False)
        if len(order_by) == 1:
            r = grp[order_by[0]].rank(method="min",
                                      ascending=ascending[0])
        else:
            # composite ORDER BY: rank the lexicographic position. Sort,
            # then min-rank ties via the first-row-of-each-distinct-tuple
            # cumcount trick (mergesort keeps it deterministic).
            part = part.sort_values(
                keys + order_by,
                ascending=[True] * len(keys) + ascending,
                kind="mergesort").reset_index(drop=True)
            grp = part.groupby(keys, sort=False)
            pos = grp.cumcount() + 1
            changed = _changed_vs_prev(part, list(keys) + list(order_by))
            r = pos.where(changed).groupby(
                [part[k] for k in keys], sort=False).ffill()
        n = grp[order_by[0]].transform("size")
        import numpy as np
        out = np.where(n > 1,
                       (r.to_numpy(dtype="float64") - 1.0)
                       / (n.to_numpy(dtype="float64") - 1.0),
                       0.0)
        part = part.copy()
        part[out_col] = out
        return to_arrow(part.drop(columns=["_wpart"]), out_schema)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_wpart")
            .map_groups(pr, batch_format="pandas"))


def cume_dist(ds: ray.data.Dataset, *, keys: list[str],
              order_by: list[str],
              descending: "bool | list[bool]" = False,
              out_col: str = "cd",
              num_partitions: "int | None" = None) -> ray.data.Dataset:
    """Per-key SQL ``CUME_DIST() OVER (PARTITION BY keys ORDER BY ...)`` =
    max-of-ties rank / n (fraction of the key's rows ordered <= this one).
    Value-deterministic; both engines divide the same exact integers, so
    the float64 quotient is bit-identical."""
    num_partitions = num_partitions or default_parts()
    if isinstance(descending, bool):
        descending = [descending] * len(order_by)
    ascending = [not d for d in descending]

    schema = ds.schema().base_schema
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names]
        + [(out_col, pa.float64())])

    def cd(part: pd.DataFrame) -> pa.Table:
        if len(order_by) == 1:
            grp = part.groupby(keys, sort=False)
            r = grp[order_by[0]].rank(method="max",
                                      ascending=ascending[0])
            n = grp[order_by[0]].transform("size")
        else:
            # composite ORDER BY: sort, then max-of-ties = the last
            # position of each distinct tuple, broadcast back over the
            # tie group (mergesort keeps it deterministic).
            part = part.sort_values(
                keys + order_by,
                ascending=[True] * len(keys) + ascending,
                kind="mergesort").reset_index(drop=True)
            grp = part.groupby(keys, sort=False)
            pos = grp.cumcount() + 1
            changed = _changed_vs_prev(part, list(keys) + list(order_by))
            tie_id = changed.cumsum()
            r = pos.groupby(tie_id, sort=False).transform("max")
            n = grp[order_by[0]].transform("size")
        part = part.copy()
        part[out_col] = r.to_numpy(dtype="float64") \
            / n.to_numpy(dtype="float64")
        return to_arrow(part.drop(columns=["_wpart"]), out_schema)

    def tag(t: pa.Table) -> pa.Table:
        part = _hash_part(_key_series(t.select(keys).to_pandas(), keys),
                          num_partitions)
        return t.append_column("_wpart",
                               pa.array(part.to_numpy(), pa.int64()))

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_wpart")
            .map_groups(cd, batch_format="pandas"))


def fill_forward(ds: ray.data.Dataset, col: str, *, keys: list[str],
                 order_by: list[str], out_col: "str | None" = None,
                 num_partitions: "int | None" = None) -> ray.data.Dataset:
    """Per-key LOCF (last observation carried forward): nulls in ``col``
    take the most recent non-null value in ``order_by`` order — SQL
    ``LAST_VALUE(col IGNORE NULLS) OVER (PARTITION BY keys ORDER BY ...
    ROWS UNBOUNDED PRECEDING)``. Rows before the key's first observation
    stay null. Values pass through untouched (no arithmetic), so any
    dtype round-trips bit-exact."""
    num_partitions = num_partitions or default_parts()
    out_col = out_col or col
    schema = ds.schema().base_schema
    fields = [(n, schema.field(n).type) for n in schema.names]
    if out_col not in schema.names:
        fields.append((out_col, schema.field(col).type))
    out_schema = pa.schema(fields)

    def tag(t: pa.Table) -> pa.Table:
        part = _hash_part(_key_series(t.select(keys).to_pandas(), keys),
                          num_partitions)
        return t.append_column("_wpart",
                               pa.array(part.to_numpy(), pa.int64()))

    def locf(part: pd.DataFrame) -> pa.Table:
        part = part.sort_values(keys + order_by,
                                kind="mergesort").reset_index(drop=True)
        part[out_col] = part.groupby(keys, sort=False)[col].ffill()
        return to_arrow(part.drop(columns=["_wpart"]), out_schema)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_wpart")
            .map_groups(locf, batch_format="pandas"))


def ntile_per_key(ds: ray.data.Dataset, q: int, *, keys: list[str],
                  order_by: list[str],
                  descending: "bool | list[bool]" = False,
                  out_col: str = "tile",
                  num_partitions: "int | None" = None) -> ray.data.Dataset:
    """Per-key SQL ``NTILE(q) OVER (PARTITION BY keys ORDER BY ...)`` with
    SQL's exact uneven-split rule: the first ``n % q`` tiles get
    ``ceil(n/q)`` rows, the rest ``floor(n/q)`` — pure integer arithmetic
    on (row_number, key size), so both engines agree bit-for-bit. Ties
    must be broken by a unique column in ``order_by`` (same contract as
    row_number)."""
    import numpy as np

    num_partitions = num_partitions or default_parts()
    if isinstance(descending, bool):
        descending = [descending] * len(order_by)
    ascending = [not d for d in descending]

    schema = ds.schema().base_schema
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names]
        + [(out_col, pa.int64())])

    def tag(t: pa.Table) -> pa.Table:
        part = _hash_part(_key_series(t.select(keys).to_pandas(), keys),
                          num_partitions)
        return t.append_column("_wpart",
                               pa.array(part.to_numpy(), pa.int64()))

    def tile(part: pd.DataFrame) -> pa.Table:
        part = part.sort_values(keys + order_by,
                                ascending=[True] * len(keys) + ascending,
                                kind="mergesort").reset_index(drop=True)
        grp = part.groupby(keys, sort=False)
        rn = (grp.cumcount() + 1).to_numpy(dtype="int64")
        n = grp[order_by[0]].transform("size").to_numpy(dtype="int64")
        big, rem = n // q + (n % q > 0), n % q
        small = n // q
        cut = rem * big  # rows covered by the ceil-sized tiles
        in_big = rn <= cut
        b = np.where(
            in_big,
            (rn - 1) // np.maximum(big, 1) + 1,
            rem + (rn - 1 - cut) // np.maximum(small, 1) + 1)
        part[out_col] = b.astype("int64")
        return to_arrow(part.drop(columns=["_wpart"]), out_schema)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_wpart")
            .map_groups(tile, batch_format="pandas"))


def rank_per_key(ds: ray.data.Dataset, *, keys: list[str],
                 order_by: list[str],
                 descending: "bool | list[bool]" = False,
                 out_col: str = "rank",
                 num_partitions: "int | None" = None) -> ray.data.Dataset:
    """Per-key SQL ``RANK() OVER (PARTITION BY keys ORDER BY ...)`` —
    min-of-ties: equal tuples share the rank of their first row, the next
    distinct tuple jumps to its absolute position. Value-deterministic
    (no tie-break column needed). Filtering ``rank <= k`` downstream gives
    top-k WITH ties, unlike topk_per_key's exactly-k rows."""
    num_partitions = num_partitions or default_parts()
    if isinstance(descending, bool):
        descending = [descending] * len(order_by)
    ascending = [not d for d in descending]

    schema = ds.schema().base_schema
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names]
        + [(out_col, pa.int64())])

    def tag(t: pa.Table) -> pa.Table:
        part = _hash_part(_key_series(t.select(keys).to_pandas(), keys),
                          num_partitions)
        return t.append_column("_wpart",
                               pa.array(part.to_numpy(), pa.int64()))

    def rk(part: pd.DataFrame) -> pa.Table:
        if len(order_by) == 1:
            r = part.groupby(keys, sort=False)[order_by[0]] \
                .rank(method="min", ascending=ascending[0])
            part = part.copy()
            part[out_col] = r.astype("int64")
        else:
            part = part.sort_values(
                keys + order_by,
                ascending=[True] * len(keys) + ascending,
                kind="mergesort").reset_index(drop=True)
            grp = part.groupby(keys, sort=False)
            pos = grp.cumcount() + 1
            changed = _changed_vs_prev(part, list(keys) + list(order_by))
            r = pos.where(changed).groupby(
                [part[k] for k in keys], sort=False).ffill()
            part[out_col] = r.astype("int64")
        return to_arrow(part.drop(columns=["_wpart"]), out_schema)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_wpart")
            .map_groups(rk, batch_format="pandas"))


def densify_time(ds: ray.data.Dataset, *, keys: list[str],
                 bucket_col: str, value_cols: "dict[str, object]",
                 freq: str = "h",
                 num_partitions: "int | None" = None) -> ray.data.Dataset:
    """Time-series gap fill: for each key, emit one row per ``freq`` bucket
    between that key's min and max ``bucket_col`` (inclusive), carrying the
    key's observed rows and filling absent buckets with the constants in
    ``value_cols`` ({col: fill_value}). Input must already be one row per
    (key, bucket) — aggregate first. Output cardinality is keys x their own
    time span (never the global span), and each key densifies inside its
    hash partition — no global materialization."""
    num_partitions = num_partitions or default_parts()
    schema = ds.schema().base_schema
    out_schema = pa.schema([(n, schema.field(n).type)
                            for n in schema.names])

    def tag(t: pa.Table) -> pa.Table:
        part = _hash_part(_key_series(t.select(keys).to_pandas(), keys),
                          num_partitions)
        return t.append_column("_wpart",
                               pa.array(part.to_numpy(), pa.int64()))

    def dense(part: pd.DataFrame) -> pa.Table:
        part = part.drop(columns=["_wpart"])
        pieces = []
        for kv, sub in part.groupby(keys, sort=False):
            if not isinstance(kv, tuple):
                kv = (kv,)
            full = pd.DataFrame({bucket_col: pd.date_range(
                sub[bucket_col].min(), sub[bucket_col].max(), freq=freq)})
            for k, v in zip(keys, kv):
                full[k] = v
            merged = full.merge(sub, on=keys + [bucket_col], how="left")
            for c, fill in value_cols.items():
                merged[c] = merged[c].fillna(fill)
            pieces.append(merged)
        if not pieces:
            return out_schema.empty_table()
        return to_arrow(pd.concat(pieces, ignore_index=True), out_schema)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_wpart")
            .map_groups(dense, batch_format="pandas"))


def rolling_median(ds: ray.data.Dataset, value_col: str, *,
                   keys: list[str], order_by: list[str], window: int,
                   out_col: str = "rolling_med",
                   num_partitions: "int | None" = None
                   ) -> ray.data.Dataset:
    """Per-key sliding-window MEDIAN of the last ``window`` rows (current
    inclusive) — SQL ``median(v) OVER (... ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW)``. The order-statistic window: unlike the
    linear rolling_sum it cannot ride a cumsum, so each hash bucket pays
    a pandas rolling().median(). Feed an INTEGER value column: the only
    float an even-sized window produces is one exact half-sum, identical
    in both engines."""
    num_partitions = num_partitions or default_parts()
    schema = ds.schema().base_schema
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names]
        + [(out_col, pa.float64())])

    def tag(t: pa.Table) -> pa.Table:
        part = _hash_part(_key_series(t.select(keys).to_pandas(), keys),
                          num_partitions)
        return t.append_column("_wpart",
                               pa.array(part.to_numpy(), pa.int64()))

    def roll(part: pd.DataFrame) -> pa.Table:
        part = part.sort_values(order_by, kind="mergesort")
        gkeys = [part[k] for k in keys]
        med = (part.groupby(gkeys, sort=False)[value_col]
               .rolling(window, min_periods=1).median())
        # rolling-on-groupby returns (key..., original_index) — drop the
        # key levels and assign BY INDEX so values land on their rows
        med.index = med.index.droplevel(list(range(len(keys))))
        part[out_col] = med.astype("float64")
        return to_arrow(part.drop(columns=["_wpart"]), out_schema)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_wpart")
            .map_groups(roll, batch_format="pandas"))
