"""Exact distributed quantiles over a (bounded-cardinality) value column.

Scale pattern: per-batch value_counts COMBINER → one groupby(value) sum →
the (value, count) histogram is the SMALL output of the wide computation
(distinct values ≪ rows — e.g. integer cents, token counts, scores at
fixed precision), so the final rank selection streams it to the driver.
For unbounded-cardinality doubles, quantize first (the caller picks the
precision — that IS the exactness contract at scale).

Selection semantics == DuckDB ``quantile_disc``: the element at 1-based
rank ``max(1, ceil(q * n))`` of the sorted values (verified empirically;
pinned by the oracle-checked query events_value_quantiles).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum


def value_histogram(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """Dataset(value, n) — global value counts with a per-batch combiner."""
    def partial(t: pa.Table) -> pa.Table:
        vc = pd.Series(t[col].to_pandas()).value_counts()
        return pa.table({
            "value": pa.array(vc.index.to_numpy()),
            "n_partial": pa.array(vc.to_numpy(), pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("value").aggregate(Sum("n_partial", alias_name="n")))


def exact_quantiles(ds: ray.data.Dataset, col: str,
                    qs: list[float]) -> pd.DataFrame:
    """DataFrame(q, value): discrete quantiles of ``ds[col]``."""
    hist = (value_histogram(ds, col).sort("value")
            .to_pandas())          # small: one row per distinct value
    counts = hist["n"].to_numpy()
    values = hist["value"].to_numpy()
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out = []
    for q in qs:
        if n == 0:
            out.append({"q": q, "value": None})
            continue
        rank = max(1, math.ceil(q * n))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out.append({"q": q, "value": values[idx]})
    return pd.DataFrame(out)


def exact_quantiles_cont(ds: ray.data.Dataset, col: str,
                         qs: list[float]) -> pd.DataFrame:
    """DataFrame(q, value): linearly interpolated quantiles — DuckDB
    ``quantile_cont`` / numpy 'linear' semantics: position ``h = q*(n-1)``
    over the sorted multiset, ``v[⌊h⌋] + (h-⌊h⌋)·(v[⌈h⌉]-v[⌊h⌋])``. Same
    histogram plan as :func:`exact_quantiles`; only the driver-side
    selection differs."""
    hist = (value_histogram(ds, col).sort("value")
            .to_pandas())
    counts = hist["n"].to_numpy()
    values = hist["value"].to_numpy()
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out = []
    for q in qs:
        if n == 0:
            out.append({"q": q, "value": None})
            continue
        h = q * (n - 1)
        i0, i1 = math.floor(h), math.ceil(h)
        v0 = values[int(np.searchsorted(cum, i0 + 1, side="left"))]
        v1 = values[int(np.searchsorted(cum, i1 + 1, side="left"))]
        out.append({"q": q, "value": float(v0) + (h - i0)
                    * (float(v1) - float(v0))})
    return pd.DataFrame(out)
