"""Distributed full-batch logistic regression over a Ray Dataset.

The quality-classifier trainer of LLM curation pipelines (fastText-style
filters in the GPT-3 / LLaMA data recipes), expressed Ray-Data-first:
each training iteration is ONE streaming map_batches pass emitting a
single k-vector of int64 micro-unit gradient partials per batch plus one
k-scalar global Sum aggregate — the corpus never moves, only k integers
per batch do. The feature table is materialized once up front (skinny:
k float64 columns + a label; at web scale it lives in the object store
and spills) so the T passes never re-read / re-featurize the raw corpus.

Determinism contract (refimpl/logreg.py, shared math): per-example
gradient contributions are rounded to integer micro-units BEFORE any
summation, so partials are int64 and the global sum is independent of
batch boundaries, block order, and parallelism — the trained weights are
bit-identical to the single-process reference loop (tested under
repartitioning in tests/test_logreg.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from refimpl.logreg import MICRO, grad_micro, sigmoid


def _matrix(t: pa.Table, xcols: "list[str]") -> np.ndarray:
    return np.column_stack(
        [t[c].to_numpy(zero_copy_only=False).astype(np.float64)
         for c in xcols])


def train_logreg(feats: ray.data.Dataset, n_features: int, *,
                 iters: int = 20, lr: float = 0.5
                 ) -> "tuple[np.ndarray, int]":
    """Train on a Dataset with float64 columns x0..x{k-1} and an int64
    label column y. Returns (weights, n_examples)."""
    import ray as _ray

    xcols = [f"x{j}" for j in range(n_features)]
    feats = feats.materialize()
    n = feats.count()
    w = np.zeros(n_features, dtype=np.float64)
    for _ in range(iters):
        w_ref = _ray.put(w.copy())

        def part(t: pa.Table, _wref=w_ref) -> pa.Table:
            ww = _ray.get(_wref)
            g = grad_micro(_matrix(t, xcols),
                           t["y"].to_numpy(zero_copy_only=False)
                           .astype(np.float64), ww)
            return pa.table({f"g{j}": pa.array([int(g[j])], pa.int64())
                             for j in range(n_features)})

        # one int64 k-vector row per BLOCK reaches the driver (bounded by
        # block count, not corpus size); summing those here beats a full
        # aggregate operator per iteration
        parts = feats.map_batches(part, batch_format="pyarrow").take_all()
        g = np.zeros(n_features, dtype=np.int64)
        for row in parts:
            for j in range(n_features):
                g[j] += row[f"g{j}"]
        w = w - lr * (g.astype(np.float64) / MICRO / n)
    return w, n


def score_counts(feats: ray.data.Dataset, w: np.ndarray
                 ) -> "tuple[int, int]":
    """(n_correct, n_total) for prediction sigmoid(x·w) > 0.5 — one more
    streaming pass, two int64 partial sums per batch."""
    import ray as _ray

    n_features = len(w)
    xcols = [f"x{j}" for j in range(n_features)]
    w_ref = _ray.put(np.asarray(w, dtype=np.float64))

    def part(t: pa.Table) -> pa.Table:
        ww = _ray.get(w_ref)
        pred = sigmoid(_matrix(t, xcols) @ ww) > 0.5
        y = t["y"].to_numpy(zero_copy_only=False).astype(bool)
        return pa.table({
            "correct": pa.array([int((pred == y).sum())], pa.int64()),
            "total": pa.array([len(y)], pa.int64())})

    s = feats.map_batches(part, batch_format="pyarrow").aggregate(
        Sum("correct", alias_name="correct"),
        Sum("total", alias_name="total"))
    return int(s["correct"]), int(s["total"])
