"""Vector-column aggregates over ``list<float>`` embedding columns.

Per-label centroids reduce each batch to (label, dim, int64 partial sum,
count) rows BEFORE the shuffle — shuffle width is |labels| x dim, never the
row count — then one bounded groupby merges partials. Cross-engine
exactness: float32 values are scaled to int64 micro-units with one
``round(double(x) * 1e6)`` (IEEE-identical in any engine), summed in exact
integer arithmetic (order-free), and divided once in float64. Overflow
budget: |x| <= 1e3 → 1e9 per element → int64 safely holds ~9e9 such
elements per (label, dim)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

_SCALE = 1_000_000.0


def label_centroids(ds: ray.data.Dataset, *, vec_col: str = "embedding",
                    label_col: str = "label") -> ray.data.Dataset:
    """Per-label mean vector, exploded to one row per (label, dim):
    columns (label int64, dim int64 1-based, centroid_micro float64 — micro-unit scale)."""

    def partial(t: pa.Table) -> pa.Table:
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False)
        n, total = len(t), len(flat)
        if n == 0 or total == 0:
            return pa.schema([("label", pa.int64()), ("dim", pa.int64()),
                              ("s", pa.int64()),
                              ("c", pa.int64())]).empty_table()
        d = total // n
        mat = np.round(flat.astype(np.float64) * _SCALE) \
            .astype(np.int64).reshape(n, d)
        labels = t[label_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, codes = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, codes, mat)
        counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    len(uniq)), pa.int64()),
            "s": pa.array(sums.ravel(), pa.int64()),
            "c": pa.array(np.repeat(counts, d), pa.int64()),
        })

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["label", "dim"])
              .aggregate(Sum("s", alias_name="s"),
                         Sum("c", alias_name="c")))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "label": pc.cast(t["label"], pa.int64()),
            "dim": pc.cast(t["dim"], pa.int64()),
            "centroid_micro": pc.divide(pc.cast(t["s"], pa.float64()),
                                  pc.cast(t["c"], pa.float64())),
        })

    return merged.map_batches(finish, batch_format="pyarrow")
