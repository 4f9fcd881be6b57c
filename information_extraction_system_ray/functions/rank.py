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

    # 1. split points from a deterministic hash-sample of the FIRST sort
    # key. The sample rate adapts to the input size (metadata count) so the
    # driver holds ~num_partitions×200 keys regardless of scale; ties
    # across a split are fine — partition assignment only needs a total
    # PRE-order, the local sort settles the composite order.
    k0 = order_by[0]
    n_total = ds.count()
    mod = max(1, n_total // (num_partitions * _SAMPLES_PER_SPLIT))
    sample = (ds.select_columns([k0])
              .map_batches(
                  lambda t: t.filter(
                      (pd.util.hash_pandas_object(
                          pd.Series(t[k0].to_pandas()), index=False)
                       % mod == 0).to_numpy()),
                  batch_format="pyarrow")
              .to_pandas())
    if len(sample) == 0:  # tiny input: single range partition
        splits = np.array([])
    else:
        qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
        splits = np.sort(sample[k0].to_numpy())[
            np.minimum((qs * len(sample)).astype(int), len(sample) - 1)]
    asc0 = ascending[0]
    splits_ref = ray.put(splits)

    def tag(t: pa.Table) -> pa.Table:
        sp = ray.get(splits_ref)
        vals = t[k0].to_numpy(zero_copy_only=False)
        if len(sp) == 0:
            pid = np.zeros(len(t), dtype=np.int64)
        elif asc0:
            pid = np.searchsorted(sp, vals, side="right").astype(np.int64)
        else:
            pid = (len(sp)
                   - np.searchsorted(sp, vals, side="left")).astype(np.int64)
        return t.append_column("_rpart", pa.array(pid, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

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
    must be broken by a unique column in ``order_by``."""
    num_partitions = num_partitions or default_parts()
    if isinstance(descending, bool):
        descending = [descending] * len(order_by)
    ascending = [not d for d in descending]

    schema = ds.schema().base_schema
    out_schema = pa.schema(
        [(n, schema.field(n).type) for n in schema.names]
        + [(out_col, pa.int64())])

    k0 = order_by[0]
    n_total = ds.count()
    mod = max(1, n_total // (num_partitions * _SAMPLES_PER_SPLIT))
    sample = (ds.select_columns([k0])
              .map_batches(
                  lambda t: t.filter(
                      (pd.util.hash_pandas_object(
                          pd.Series(t[k0].to_pandas()), index=False)
                       % mod == 0).to_numpy()),
                  batch_format="pyarrow")
              .to_pandas())
    if len(sample) == 0:
        splits = np.array([])
    else:
        qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
        splits = np.sort(sample[k0].to_numpy())[
            np.minimum((qs * len(sample)).astype(int), len(sample) - 1)]
    asc0 = ascending[0]
    splits_ref = ray.put(splits)

    def tag(t: pa.Table) -> pa.Table:
        sp = ray.get(splits_ref)
        vals = t[k0].to_numpy(zero_copy_only=False)
        if len(sp) == 0:
            pid = np.zeros(len(t), dtype=np.int64)
        elif asc0:
            pid = np.searchsorted(sp, vals, side="right").astype(np.int64)
        else:
            pid = (len(sp)
                   - np.searchsorted(sp, vals, side="left")).astype(np.int64)
        return t.append_column("_rpart", pa.array(pid, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

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
