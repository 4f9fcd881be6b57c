"""Distributed second-moment statistics — grouped variance / stddev and
Pearson correlation — via EXACT integer partial sums.

Why not Welford / streaming float moments: the driver's correctness gate
hashes values, and a parallel float reduction is order-dependent. Instead
both engines (Ray and the DuckDB oracle) accumulate the same integer
moments (n, Σx, Σx², Σxy …) with Ray's mergeable ``Sum``/``Count``
aggregates — integer addition commutes, so any merge order yields the same
sums — and apply ONE identical float expression at the end:

    var_samp = (Σx² − (Σx)²/n) / (n−1)
    corr     = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))

Scale note (100 TB): int64 Σx² overflows after ~9.2e18 / B² rows where B
bounds |x| — callers must pre-scale values to small integer units (counts,
basis points, whole dollars). With B ≤ 1e5 that is ~9e8 rows per GROUP;
beyond that, split each group's sum across salt buckets (functions/salted)
or widen to decimal128. The final expression is computed in float64 from
the exact sums, so both engines see bit-identical inputs and emit
bit-identical (then 4-dp-rounded) outputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum


def grouped_variance(ds: ray.data.Dataset, value_col: str, *,
                     keys: list[str], out_prefix: str = "") -> ray.data.Dataset:
    """Per-group sample variance + stddev of an INTEGER column.

    Emits ``{keys, n, <p>var_samp, <p>stddev_samp}`` with the float stats
    rounded to 4 dp. Groups with n == 1 emit null (SQL VAR_SAMP semantics).
    """
    p = out_prefix

    def prep(t: pa.Table) -> pa.Table:
        x = pc.cast(t[value_col], pa.int64())
        cols = {k: t[k] for k in keys}
        cols["_x"] = x
        cols["_x2"] = pc.multiply(x, x)
        return pa.table(cols)

    agg = (ds.map_batches(prep, batch_format="pyarrow")
           .groupby(keys)
           .aggregate(Count(alias_name="n"),
                      Sum("_x", alias_name="_sx"),
                      Sum("_x2", alias_name="_sx2")))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.float64)
        sx = t["_sx"].to_numpy().astype(np.float64)
        sx2 = t["_sx2"].to_numpy().astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            var = (sx2 - sx * sx / n) / (n - 1.0)
        var = np.round(var, 4)
        cols = {k: t[k] for k in keys}
        cols["n"] = t["n"]
        cols[p + "var_samp"] = pa.array(
            np.where(n > 1, var, np.nan), pa.float64(),
            mask=(n <= 1))
        cols[p + "stddev_samp"] = pa.array(
            np.where(n > 1, np.round(np.sqrt(np.maximum(var, 0.0)), 4),
                     np.nan), pa.float64(), mask=(n <= 1))
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_corr(ds: ray.data.Dataset, x_col: str, y_col: str, *,
                 keys: list[str], out_col: str = "corr") -> ray.data.Dataset:
    """Per-group Pearson correlation of two INTEGER columns, 4-dp rounded.

    Null when n < 2 or either side is constant (zero variance), matching
    SQL CORR. Cross-moment Σxy stays in int64 — callers bound |x|·|y| so
    Σxy < 2^63 (see module docstring); the n·Σxy term of the closed form
    is evaluated in float64 AFTER the exact integer reduction.
    """

    def prep(t: pa.Table) -> pa.Table:
        x = pc.cast(t[x_col], pa.int64())
        y = pc.cast(t[y_col], pa.int64())
        cols = {k: t[k] for k in keys}
        cols["_x"], cols["_y"] = x, y
        cols["_xy"] = pc.multiply(x, y)
        cols["_x2"] = pc.multiply(x, x)
        cols["_y2"] = pc.multiply(y, y)
        return pa.table(cols)

    agg = (ds.map_batches(prep, batch_format="pyarrow")
           .groupby(keys)
           .aggregate(Count(alias_name="n"),
                      Sum("_x", alias_name="_sx"),
                      Sum("_y", alias_name="_sy"),
                      Sum("_xy", alias_name="_sxy"),
                      Sum("_x2", alias_name="_sx2"),
                      Sum("_y2", alias_name="_sy2")))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.float64)
        sx = t["_sx"].to_numpy().astype(np.float64)
        sy = t["_sy"].to_numpy().astype(np.float64)
        sxy = t["_sxy"].to_numpy().astype(np.float64)
        sx2 = t["_sx2"].to_numpy().astype(np.float64)
        sy2 = t["_sy2"].to_numpy().astype(np.float64)
        vx = n * sx2 - sx * sx
        vy = n * sy2 - sy * sy
        bad = (n < 2) | (vx <= 0) | (vy <= 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = (n * sxy - sx * sy) / np.sqrt(vx * vy)
        cols = {k: t[k] for k in keys}
        cols["n"] = t["n"]
        cols[out_col] = pa.array(np.where(bad, np.nan, np.round(r, 4)),
                                 pa.float64(), mask=bad)
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_mode(ds: ray.data.Dataset, value_col: str, *,
                 keys: list[str], out_col: str = "mode",
                 count_col: str = "mode_n") -> ray.data.Dataset:
    """Per-group most-frequent value, ties broken by SMALLEST value (the
    deterministic tie rule both engines can express).

    Plan: one exact count per (keys, value) — the only shuffle, and its
    width is the distinct-combination count, not the row count — then a
    per-key argmax. The second stage groups by the ORIGINAL keys only; its
    input is already tiny (one row per distinct value per group).
    """
    counts = (ds.groupby(keys + [value_col])
              .aggregate(Count(alias_name="_cnt")))

    import pandas as pd

    from .arrowutil import to_arrow

    schema = ds.schema().base_schema
    out_schema = pa.schema(
        [(k, schema.field(k).type) for k in keys]
        + [(out_col, schema.field(value_col).type),
           (count_col, pa.int64())])

    def pick(part: pd.DataFrame) -> pa.Table:
        part = part.sort_values(["_cnt", value_col],
                                ascending=[False, True], kind="mergesort")
        top = part.groupby(keys, sort=False).head(1).rename(
            columns={value_col: out_col, "_cnt": count_col})
        return to_arrow(top, out_schema)

    return counts.groupby(keys).map_groups(pick, batch_format="pandas")


def pava_isotonic(sums: "np.ndarray", counts: "np.ndarray"
                  ) -> "tuple[np.ndarray, np.ndarray]":
    """Pool-Adjacent-Violators (Ayer et al. 1955; Barlow et al. 1972):
    the L2 isotonic (non-decreasing) fit of a weighted sequence given as
    per-position (sum, count). EXACT integer arithmetic — block means
    are kept as (Σy, n) rationals and compared by cross-multiplication,
    so there is no float boundary anywhere; the caller renders means at
    whatever fixed precision it wants. Returns per-position
    (block_sum, block_count) of the pooled block covering that position.

    Sequential by nature, but the ONLY place it runs in this repo is on
    calendar-bounded driver-side series (n = #days); the distributed
    part is the combiner reduce that produces (sums, counts)."""
    sums = [int(x) for x in sums]
    counts = [int(x) for x in counts]
    # stack of blocks: (sum, count, n_positions)
    st: "list[list[int]]" = []
    for s, c in zip(sums, counts):
        st.append([s, c, 1])
        # pool while mean(prev) > mean(top): s1/c1 > s2/c2 ⇔ s1·c2 > s2·c1
        while len(st) >= 2 and st[-2][0] * st[-1][1] > \
                st[-1][0] * st[-2][1]:
            s2, c2, k2 = st.pop()
            st[-1][0] += s2
            st[-1][1] += c2
            st[-1][2] += k2
    out_s = np.empty(len(sums), dtype=object)
    out_c = np.empty(len(sums), dtype=object)
    i = 0
    for s, c, k in st:
        for _ in range(k):
            out_s[i] = s
            out_c[i] = c
            i += 1
    return out_s, out_c
