"""G1 — distributed per-label sequence-evaluation counts (SURVEY.md §2.5).

Reference-equivalent role: the reference's evaluator printed per-label
precision/recall/F1 from tp/fp/fn counts over tagged documents (SURVEY.md §5,
reconstructed). Here the counting is a vectorized per-batch partial (numpy
over the int8 tag arrays) followed by one tiny groupby — the classic
partial+final aggregate, so the shuffle moves L rows per block, not tokens.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from refimpl.vocab import BIO_LABELS


def _pair_counts(pred: np.ndarray, gold: np.ndarray,
                 n_labels: int) -> np.ndarray:
    """(n_labels, 3) tp/fp/fn token counts for one label set pair."""
    out = np.zeros((n_labels, 3), dtype=np.int64)
    for lab in range(n_labels):
        p = pred == lab
        g = gold == lab
        out[lab, 0] = int(np.count_nonzero(p & g))
        out[lab, 1] = int(np.count_nonzero(p & ~g))
        out[lab, 2] = int(np.count_nonzero(~p & g))
    return out


def evaluate_tags(tagged: ray.data.Dataset, *, pred_col: str = "tags",
                  gold_col: str = "gold_tags") -> pd.DataFrame:
    """Dataset with per-row int tag lists → per-label tp/fp/fn + P/R/F1.

    Returns a small pandas DataFrame (one row per BIO label) — the SMALL
    output of a wide computation, so collecting it is correct.
    """
    L = len(BIO_LABELS)

    def partial(batch: pa.Table) -> pa.Table:
        total = np.zeros((L, 3), dtype=np.int64)
        for p, g in zip(batch[pred_col].to_pylist(),
                        batch[gold_col].to_pylist()):
            total += _pair_counts(np.asarray(p), np.asarray(g), L)
        return pa.table({
            "label_id": pa.array(range(L), pa.int32()),
            "tp": pa.array(total[:, 0]), "fp": pa.array(total[:, 1]),
            "fn": pa.array(total[:, 2]),
        })

    agg = (tagged.map_batches(partial, batch_format="pyarrow")
           .groupby("label_id")
           .aggregate(Sum("tp", alias_name="tp"),
                      Sum("fp", alias_name="fp"),
                      Sum("fn", alias_name="fn"))
           .to_pandas().sort_values("label_id").reset_index(drop=True))
    agg["label"] = [BIO_LABELS[i] for i in agg["label_id"]]
    with np.errstate(invalid="ignore", divide="ignore"):
        p = agg["tp"] / (agg["tp"] + agg["fp"])
        r = agg["tp"] / (agg["tp"] + agg["fn"])
        f1 = 2 * p * r / (p + r)
    agg["precision"] = p.fillna(0.0)
    agg["recall"] = r.fillna(0.0)
    agg["f1"] = f1.fillna(0.0)
    return agg[["label_id", "label", "tp", "fp", "fn",
                "precision", "recall", "f1"]]
