"""Distributed vocabulary / term-frequency operators — the n-gram counting
a training-data pipeline runs for vocabulary building and contamination
checks.

Scale pattern: per-batch COMBINER (one vectorized pandas value_counts per
Arrow batch — a "wikipedia"-scale head term contributes ONE row per batch,
not one per occurrence) → one global groupby over the collapsed
(term, partial-count) rows → optional top-k sort. The shuffle moves at most
|batch vocab| rows per batch, never token volume.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

_TERM_RE = re.compile(r"[A-Za-z0-9]+")


def term_counts(docs: ray.data.Dataset, *, text_col: str = "text",
                lowercase: bool = True,
                pattern: "re.Pattern | None" = None) -> ray.data.Dataset:
    """Dataset(term, n) — global term frequencies."""
    rex = pattern or _TERM_RE

    def partial(batch: pa.Table) -> pa.Table:
        terms: list[str] = []
        for t in batch[text_col].to_pylist():
            s = (t or "")
            if lowercase:
                s = s.lower()
            terms.extend(rex.findall(s))
        if not terms:
            return pa.table({"term": pa.array([], pa.string()),
                             "n_partial": pa.array([], pa.int64())})
        vc = pd.Series(terms).value_counts()
        return pa.table({
            "term": pa.array(vc.index.to_numpy(), pa.string()),
            "n_partial": pa.array(vc.to_numpy(), pa.int64()),
        })

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("n_partial", alias_name="n")))


def top_terms(docs: ray.data.Dataset, k: int = 50, *,
              text_col: str = "text") -> ray.data.Dataset:
    """Top-k terms by frequency, ties broken by term (ascending) so the
    result is deterministic — == SQL ORDER BY n DESC, term LIMIT k."""
    return (term_counts(docs, text_col=text_col)
            .sort(["n", "term"], descending=[True, False]).limit(k))
