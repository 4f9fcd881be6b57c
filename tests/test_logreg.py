"""Distributed logistic-regression trainer (functions/logreg.py) vs the
single-process reference loop (refimpl/logreg.py).

The determinism contract under test: per-example micro-unit gradient
rounding makes the distributed weights BIT-IDENTICAL to the reference
under any partitioning — and the trainer actually learns (separable
synthetic data → high training accuracy)."""

import numpy as np
import pyarrow as pa

from information_extraction_system_ray.functions.logreg import (
    score_counts, train_logreg)
from refimpl.logreg import sigmoid, train_logreg_ref


def _synthetic(n=600, seed=3):
    rng = np.random.default_rng(seed)
    X = np.column_stack([np.ones(n), rng.normal(0, 1, n),
                         rng.normal(0, 1, n)])
    # separable-with-noise: true boundary x1 + 0.5*x2 > 0.2
    y = (X[:, 1] + 0.5 * X[:, 2] + rng.normal(0, 0.1, n) > 0.2) \
        .astype(np.int64)
    return X, y


def _feats_ds(X, y, nparts):
    import ray.data as rd

    t = pa.table({"x0": X[:, 0], "x1": X[:, 1], "x2": X[:, 2],
                  "y": pa.array(y, pa.int64())})
    return rd.from_arrow(t).repartition(nparts)


def test_distributed_matches_reference_bitwise(ray_session):
    X, y = _synthetic()
    want = train_logreg_ref(X, y, iters=6, lr=0.5)
    for nparts in (1, 7):
        w, n = train_logreg(_feats_ds(X, y, nparts), 3, iters=6, lr=0.5)
        assert n == len(X)
        # bit-identical, not allclose: int64 partials are associative
        assert np.array_equal(w, want), (w, want)


def test_trainer_learns_separable_data(ray_session):
    X, y = _synthetic()
    ds = _feats_ds(X, y, 4)
    w, _ = train_logreg(ds, 3, iters=25, lr=2.0)
    correct, total = score_counts(ds, w)
    assert total == len(X)
    assert correct / total >= 0.93
    # sanity on the reference side with the same weights
    pred = sigmoid(X @ w) > 0.5
    assert (pred == y.astype(bool)).sum() == correct


def test_docs_quality_logreg_query(ray_session):
    from information_extraction_system_ray.queries import docs_quality_logreg

    out = docs_quality_logreg("/root/testdata/sf0.001").to_pandas() \
        .set_index("param")["value_micro"]
    total = out["n_total"] // 1_000_000
    correct = out["n_correct"] // 1_000_000
    assert total == 500
    # the length label is learnable from word count: well above majority
    assert correct / total >= 0.9
