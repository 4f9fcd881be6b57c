"""Composed k-fold train/evaluate cycle (SURVEY.md §3.1 step 3; VERDICT r1
"What's missing" #3): the reference's evaluation trains on k−1 folds and
scores the held-out fold, per fold.

Scale split: TRAINING is the small sequential part (the averaged perceptron
is inherently serial over its fixture-scale corpus — at web scale the
training corpus is a curated subsample, never the crawl), so the k models
train on the driver from deterministic fold subsets. SCORING is the wide
part: each fold's held-out pages are tagged by a distributed ``map_batches``
stage with the fold's weights broadcast via ``ray.put`` once (never per
batch), and per-label tp/fp/fn come from the same partial+groupby pattern as
functions/evaluate.py — one pass over the union of all folds, fold id
carried on the rows, so the k evaluations share one Ray pipeline instead of
running k sequential jobs.

Fold assignment is key-derived (page index mod k), never row-order —
required for resume/rerun equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from refimpl import SEED
from refimpl.crf import hash_features, train_perceptron, viterbi_batch
from refimpl.oracle import gold_tag_ids
from refimpl.pagegen import gen_page
from refimpl.tokenizer import tokenize
from refimpl.vocab import BIO_LABELS


def fold_of(i: int, k: int) -> int:
    return i % k


def train_fold_models(n_pages: int, k: int, *, seed: int = SEED + 1,
                      epochs: int = 5) -> list:
    """Model f is trained on every page whose fold != f (deterministic
    corpus + fixed order ⇒ reproducible weights)."""
    seqs: list[list] = [[] for _ in range(k)]
    for i in range(n_pages):
        page = gen_page(i, seed)
        toks, offs = tokenize(page.text)
        if not toks:
            continue
        seqs[fold_of(i, k)].append(
            (hash_features(toks), gold_tag_ids(page, toks, offs)))
    models = []
    for f in range(k):
        train = [s for g in range(k) if g != f for s in seqs[g]]
        models.append(train_perceptron(train, epochs=epochs))
    return models


def kfold_evaluate(n_pages: int = 200, k: int = 5, *,
                   seed: int = SEED + 1, epochs: int = 5,
                   num_blocks: int = 16) -> pd.DataFrame:
    """k-fold cross-validation → per-(fold, label) tp/fp/fn/P/R/F1 plus a
    micro-averaged ``fold=-1`` summary row per label."""
    models = train_fold_models(n_pages, k, seed=seed, epochs=epochs)
    models_ref = ray.put(models)
    L = len(BIO_LABELS)

    def score(batch: pa.Table) -> pa.Table:
        ms = ray.get(models_ref)
        counts = np.zeros((k, L, 3), dtype=np.int64)
        for i in batch["id"].to_pylist():
            page = gen_page(i, seed)
            toks, offs = tokenize(page.text)
            if not toks:
                continue
            f = fold_of(i, k)
            W, T = ms[f]
            pred = viterbi_batch([hash_features(toks)], W, T)[0]
            gold = gold_tag_ids(page, toks, offs)
            for lab in range(L):
                p = pred == lab
                g = gold == lab
                counts[f, lab, 0] += int(np.count_nonzero(p & g))
                counts[f, lab, 1] += int(np.count_nonzero(p & ~g))
                counts[f, lab, 2] += int(np.count_nonzero(~p & g))
        folds, labs = np.meshgrid(np.arange(k), np.arange(L),
                                  indexing="ij")
        return pa.table({
            "fold": pa.array(folds.ravel(), pa.int32()),
            "label_id": pa.array(labs.ravel(), pa.int32()),
            "tp": pa.array(counts[:, :, 0].ravel(), pa.int64()),
            "fp": pa.array(counts[:, :, 1].ravel(), pa.int64()),
            "fn": pa.array(counts[:, :, 2].ravel(), pa.int64()),
        })

    agg = (ray.data.range(n_pages, override_num_blocks=num_blocks)
           .map_batches(score, batch_format="pyarrow")
           .groupby(["fold", "label_id"])
           .aggregate(Sum("tp", alias_name="tp"),
                      Sum("fp", alias_name="fp"),
                      Sum("fn", alias_name="fn"))
           .to_pandas())

    total = (agg.groupby("label_id", as_index=False)[["tp", "fp", "fn"]]
             .sum().assign(fold=-1))
    out = (pd.concat([agg, total], ignore_index=True)
           .sort_values(["fold", "label_id"]).reset_index(drop=True))
    out["label"] = [BIO_LABELS[i] for i in out["label_id"]]
    with np.errstate(invalid="ignore", divide="ignore"):
        p = out["tp"] / (out["tp"] + out["fp"])
        r = out["tp"] / (out["tp"] + out["fn"])
        f1 = 2 * p * r / (p + r)
    out["precision"] = p.fillna(0.0)
    out["recall"] = r.fillna(0.0)
    out["f1"] = f1.fillna(0.0)
    return out[["fold", "label_id", "label", "tp", "fp", "fn",
                "precision", "recall", "f1"]]
