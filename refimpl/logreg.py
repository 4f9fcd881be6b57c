"""Single-process logistic-regression oracle (pure numpy).

The distributed trainer (information_extraction_system_ray/functions/
logreg.py) must be BIT-IDENTICAL to this loop under any partitioning —
the shared determinism contract is that every example's per-iteration
gradient contribution is rounded to integer MICRO-UNITS here, in one
place, and partial sums are int64 (order- and partition-independent by
associativity of integer addition). Full-batch gradient descent, fixed
iteration count — no line search, no float accumulation across examples.

This is the quality-classifier trainer shape of LLM curation pipelines
(fastText-style filters in the GPT-3 / LLaMA data recipes): train a tiny
linear model on weak-supervision labels, then score the corpus with it.
"""

from __future__ import annotations

import numpy as np

MICRO = 1_000_000


def sigmoid(z: np.ndarray) -> np.ndarray:
    # exp of float64 is IEEE-correctly-rounded per element on every
    # platform numpy targets here; per-example results are therefore
    # identical no matter which batch the example lands in
    return 1.0 / (1.0 + np.exp(-z))


def grad_micro(X: np.ndarray, y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Sum over examples of round((sigmoid(x·w) − y)·x · MICRO), int64.

    The rounding happens PER EXAMPLE (before any summation), so the sum
    is a sum of identical int64 terms regardless of batch boundaries."""
    r = sigmoid(X @ w) - y
    g = np.round(r[:, None] * X * MICRO).astype(np.int64)
    return g.sum(axis=0, dtype=np.int64)


def train_logreg_ref(X: np.ndarray, y: np.ndarray, *, iters: int = 20,
                     lr: float = 0.5) -> np.ndarray:
    """Reference trainer: the exact loop the distributed version runs."""
    n = len(X)
    w = np.zeros(X.shape[1], dtype=np.float64)
    for _ in range(iters):
        g = grad_micro(X, y.astype(np.float64), w)
        w = w - lr * (g.astype(np.float64) / MICRO / n)
    return w
