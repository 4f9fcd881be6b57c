"""Global (total-order) row numbering — SQL ``ROW_NUMBER() OVER (ORDER BY
...)`` with no PARTITION BY, an operator Ray Data lacks (``sort`` range-
partitions but exposes no block offsets).

Distributed plan (the Spark zipWithIndex-on-sorted recipe):

1. deterministic hash-sample of the sort key → range split points (driver
   holds only the sample, never the data);
2. every row is tagged with its range-partition id in one map_batches
   (searchsorted against the broadcast split points);
3. per-partition row counts (a ``num_partitions``-row aggregate) give each
   partition's global OFFSET on the driver;
4. one groupby(partition).map_groups sorts locally and adds
   ``offset + local_rank``.

Two streaming passes over the data, one tiny driver table — no full
materialization anywhere. Ties must be broken by including a unique column
in ``order_by`` (same contract as the per-key window operators).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .arrowutil import to_arrow
from .partitions import default_parts

_SAMPLES_PER_SPLIT = 200  # expected sample rows per range boundary


def _lex_ge(colvals: "list[np.ndarray]", split_vals: "list",
            ascending: "list[bool]") -> np.ndarray:
    """Vectorized lexicographic row >= split over the composite key,
    honoring per-key sort direction."""
    n = len(colvals[0])
    gt = np.zeros(n, bool)
    eq = np.ones(n, bool)
    for c, s, asc in zip(colvals, split_vals, ascending):
        c_gt = (c > s) if asc else (c < s)
        gt |= eq & c_gt
        eq &= (c == s)
    return gt | eq


def _range_tag(ds: ray.data.Dataset, order_by: "list[str]",
               ascending: "list[bool]", num_partitions: int,
               n_total: int) -> ray.data.Dataset:
    """Tag every row with its range-partition id ``_rpart`` from a
    deterministic hash-sample of the sort key.

    Splits normally come from the FIRST key alone (searchsorted fast
    path) — ties across a split are fine because partition assignment
    only needs a total PRE-order; the local sort settles the composite
    order. Skew guard (ADVICE r2, rank.py:63): when the sampled first
    key is so skewed that split points REPEAT (one dominant value would
    flood a single range partition, silently degrading the two-pass plan
    to one giant local sort), and a secondary order key exists, splits
    become (k0, k1) TUPLES compared lexicographically — still a valid
    pre-order of the composite sort, but the hot first-key run is now
    divided by the second key. Fully degenerate with no secondary key →
    an explicit RuntimeWarning that the partitioning collapsed."""
    import warnings

    k0 = order_by[0]
    keys = list(dict.fromkeys(order_by[:2]))
    mod = max(1, n_total // (num_partitions * _SAMPLES_PER_SPLIT))
    sample = (ds.select_columns(keys)
              .map_batches(
                  lambda t: t.filter(
                      (pd.util.hash_pandas_object(
                          pd.Series(t[k0].to_pandas()), index=False)
                       % mod == 0).to_numpy()),
                  batch_format="pyarrow")
              .to_pandas())
    asc0 = ascending[0]
    if len(sample) == 0:  # tiny input: single range partition
        mode, payload = "simple", np.array([])
    else:
        qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
        s0 = np.sort(sample[k0].to_numpy())
        idx = np.minimum((qs * len(s0)).astype(int), len(s0) - 1)
        splits = s0[idx]
        degenerate = len(splits) > 1 and len(np.unique(splits)) < len(splits)
        if degenerate and len(keys) > 1:
            samp = sample.sort_values(
                keys, ascending=ascending[:len(keys)], kind="mergesort")
            cidx = np.minimum((qs * len(samp)).astype(int), len(samp) - 1)
            mode = "composite"
            payload = [samp[c].to_numpy()[cidx] for c in keys]
        else:
            if degenerate and len(np.unique(splits)) == 1:
                warnings.warn(
                    f"range partitioning on {k0!r} collapsed (one dominant "
                    "value, no secondary order key to salt by); the local "
                    "sort will run as one giant partition", RuntimeWarning)
            mode, payload = "simple", splits
    splits_ref = ray.put((mode, payload))
    asc_keys = ascending[:len(keys)]

    def tag(t: pa.Table) -> pa.Table:
        m, sp = ray.get(splits_ref)
        if m == "composite":
            colvals = [t[c].to_numpy(zero_copy_only=False) for c in keys]
            pid = np.zeros(len(t), np.int64)
            for j in range(len(sp[0])):
                pid += _lex_ge(colvals, [s[j] for s in sp], asc_keys)
        else:
            vals = t[k0].to_numpy(zero_copy_only=False)
            if len(sp) == 0:
                pid = np.zeros(len(t), dtype=np.int64)
            elif asc0:
                pid = np.searchsorted(sp, vals,
                                      side="right").astype(np.int64)
            else:
                pid = (len(sp) - np.searchsorted(
                    sp, vals, side="left")).astype(np.int64)
        return t.append_column("_rpart", pa.array(pid, pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow")


def global_row_number(ds: ray.data.Dataset, *, order_by: list[str],
                      descending: "bool | list[bool]" = False,
                      out_col: str = "rn",
                      num_partitions: "int | None" = None
                      ) -> ray.data.Dataset:
    num_partitions = num_partitions or default_parts()
    if isinstance(descending, bool):
        descending = [descending] * len(order_by)
    ascending = [not d for d in descending]

    schema = ds.schema().base_schema
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names]
        + [(out_col, pa.int64())])

    n_total = ds.count()
    tagged = _range_tag(ds, order_by, ascending, num_partitions, n_total)

    # 3. per-partition counts → offsets (num_partitions rows on the driver)
    from ray.data.aggregate import Count
    counts = (tagged.groupby("_rpart")
              .aggregate(Count(alias_name="_n")).to_pandas()
              .sort_values("_rpart"))
    offs = np.zeros(num_partitions + 1, dtype=np.int64)
    np.add.at(offs, counts["_rpart"].to_numpy() + 1,
              counts["_n"].to_numpy())
    offsets = dict(enumerate(np.cumsum(offs)))
    offsets_ref = ray.put(offsets)

    def number(part: pd.DataFrame) -> pa.Table:
        off = ray.get(offsets_ref)[int(part["_rpart"].iloc[0])]
        part = part.sort_values(order_by, ascending=ascending,
                                kind="mergesort")
        part[out_col] = off + np.arange(1, len(part) + 1, dtype=np.int64)
        return to_arrow(part.drop(columns=["_rpart"]), out_schema)

    return (tagged.groupby("_rpart")
            .map_groups(number, batch_format="pandas"))


def ntile(ds: ray.data.Dataset, n: int, *, order_by: list[str],
          descending: "bool | list[bool]" = False,
          out_col: str = "tile",
          num_partitions: "int | None" = None) -> ray.data.Dataset:
    """SQL ``NTILE(n) OVER (ORDER BY ...)`` — derived from the global row
    number and the total count (first ``total % n`` tiles get the extra
    row, exactly SQL's split)."""
    numbered = global_row_number(ds, order_by=order_by,
                                 descending=descending, out_col="_grn",
                                 num_partitions=num_partitions)
    total = ds.count()
    base, extra = divmod(total, n)

    def to_tile(t: pa.Table) -> pa.Table:
        rn = t["_grn"].to_numpy(zero_copy_only=False) - 1
        cut = extra * (base + 1)
        tile = np.where(rn < cut,
                        rn // max(base + 1, 1),
                        extra + (rn - cut) // max(base, 1)) + 1
        return (t.drop(["_grn"])
                .append_column(out_col,
                               pa.array(tile.astype(np.int64), pa.int64())))

    return numbered.map_batches(to_tile, batch_format="pyarrow")


def global_running_sum(ds: ray.data.Dataset, value_col: str, *,
                       order_by: list[str],
                       descending: "bool | list[bool]" = False,
                       out_col: str = "cum",
                       num_partitions: "int | None" = None
                       ) -> ray.data.Dataset:
    """SQL ``SUM(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` —
    the global-total-order cumulative sum (sequence packing, global
    quota cuts). Same two-pass plan as ``global_row_number``, except the
    driver-side offset table carries per-range-partition SUMS instead of
    counts; the local pass sorts and adds offset + local cumsum. Ties
    must be broken by a unique column in ``order_by``.

    ``value_col`` must be an INTEGER column (ADVICE r2, rank.py:207):
    the cross-partition offsets and the local cumsum both accumulate in
    exact int64 so the result is order-free and hash-stable; floats
    would be silently truncated. Scale floats to integer units first
    (the repo-wide cents / micro-unit idiom)."""
    num_partitions = num_partitions or default_parts()
    if isinstance(descending, bool):
        descending = [descending] * len(order_by)
    ascending = [not d for d in descending]

    schema = ds.schema().base_schema
    vt = schema.field(value_col).type
    if not pa.types.is_integer(vt):
        raise ValueError(
            f"global_running_sum requires an integer value_col for exact "
            f"order-free accumulation; got {value_col}: {vt}. Scale to "
            "integer units (cents/micros) first.")
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names]
        + [(out_col, pa.int64())])

    n_total = ds.count()
    tagged = _range_tag(ds, order_by, ascending, num_partitions, n_total)

    from ray.data.aggregate import Sum
    sums = (tagged.groupby("_rpart")
            .aggregate(Sum(value_col, alias_name="_s")).to_pandas()
            .sort_values("_rpart"))
    offs = np.zeros(num_partitions + 1, dtype=np.int64)
    np.add.at(offs, sums["_rpart"].to_numpy() + 1,
              sums["_s"].to_numpy().astype(np.int64))
    offsets = dict(enumerate(np.cumsum(offs)))
    offsets_ref = ray.put(offsets)

    def cumsum(part: pd.DataFrame) -> pa.Table:
        off = ray.get(offsets_ref)[int(part["_rpart"].iloc[0])]
        part = part.sort_values(order_by, ascending=ascending,
                                kind="mergesort")
        part[out_col] = off + part[value_col].to_numpy(
            dtype=np.int64).cumsum()
        return to_arrow(part.drop(columns=["_rpart"]), out_schema)

    return (tagged.groupby("_rpart")
            .map_groups(cumsum, batch_format="pandas"))


def global_running_max(ds: ray.data.Dataset, value_col: str, *,
                       order_by: list[str],
                       descending: "bool | list[bool]" = False,
                       out_col: str = "cummax",
                       exclusive: bool = False,
                       num_partitions: "int | None" = None
                       ) -> ray.data.Dataset:
    """SQL ``MAX(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` —
    the global-total-order running maximum (streaming WATERMARKS: the
    max event time seen so far in arrival order). ``exclusive=True``
    ends the frame at ``1 PRECEDING`` (the watermark BEFORE the current
    row arrives); rows with no prior row emit null.

    Same two-pass plan as ``global_running_sum``: the driver-side offset
    table carries per-range-partition MAXES (|partitions| scalars, the
    only driver data), the local pass sorts and combines the exclusive
    cross-partition max with the in-partition running max. Integer
    ``value_col`` required — max is order-free, but the int64 sentinel
    (INT64_MIN = "nothing yet") must be exact."""
    num_partitions = num_partitions or default_parts()
    if isinstance(descending, bool):
        descending = [descending] * len(order_by)
    ascending = [not d for d in descending]

    schema = ds.schema().base_schema
    vt = schema.field(value_col).type
    if not pa.types.is_integer(vt):
        raise ValueError(
            f"global_running_max requires an integer value_col; got "
            f"{value_col}: {vt}. Cast timestamps to epoch integers first.")
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names]
        + [(out_col, pa.int64())])
    NEG = np.iinfo(np.int64).min

    n_total = ds.count()
    tagged = _range_tag(ds, order_by, ascending, num_partitions, n_total)

    from ray.data.aggregate import Max
    maxes = (tagged.groupby("_rpart")
             .aggregate(Max(value_col, alias_name="_m")).to_pandas()
             .sort_values("_rpart"))
    offs = np.full(num_partitions + 1, NEG, dtype=np.int64)
    np.maximum.at(offs, maxes["_rpart"].to_numpy() + 1,
                  maxes["_m"].to_numpy().astype(np.int64))
    offsets = dict(enumerate(np.maximum.accumulate(offs)))
    offsets_ref = ray.put(offsets)

    def cummax(part: pd.DataFrame) -> pa.Table:
        off = ray.get(offsets_ref)[int(part["_rpart"].iloc[0])]
        part = part.sort_values(order_by, ascending=ascending,
                                kind="mergesort")
        v = part[value_col].to_numpy(dtype=np.int64)
        run = np.maximum.accumulate(v)
        if exclusive:
            run = np.concatenate(([NEG], run[:-1]))
        m = np.maximum(run, off)
        part[out_col] = pd.array(np.where(m == NEG, 0, m), dtype="Int64")
        part.loc[m == NEG, out_col] = pd.NA
        return to_arrow(part.drop(columns=["_rpart"]), out_schema)

    return (tagged.groupby("_rpart")
            .map_groups(cummax, batch_format="pandas"))
