"""Salted two-phase aggregation — head-key skew defusal (SURVEY.md §4).

A hot key ("wikipedia.org"-scale hub) lands on ONE reducer in a plain
groupby. Salting splits each key into S sub-keys for phase 1 (bounding any
reducer's input to ~1/S of the hot key), then a second groupby over the ≤S
partial rows per key restores exact semantics — valid for any associative,
commutative aggregate. tests/test_dedup.py proves salted == unsalted.

The flagship's canonicalization defuses the same skew earlier (per-batch
partial dedup collapses hot pairs before any shuffle); this utility is the
general-purpose form for aggregates that cannot pre-collapse.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum


def salted_group_sum(ds: ray.data.Dataset, key: str, *,
                     value: str | None = None,
                     num_salts: int = 16) -> ray.data.Dataset:
    """groupby(key) → (n, sum_<value>) computed via salted two-phase
    shuffle. Output columns: key, n[, sum_<value>] — identical to the
    unsalted groupby."""
    aggs1 = [Count(alias_name="n")]
    aggs2 = [Sum("n", alias_name="n")]
    if value is not None:
        aggs1.append(Sum(value, alias_name=f"sum_{value}"))
        aggs2.append(Sum(f"sum_{value}", alias_name=f"sum_{value}"))

    def add_salt(t: pa.Table) -> pa.Table:
        # deterministic positional salt (never RNG: reruns must agree); the
        # RESULT is salt-layout-independent because phase 2 merges all salts
        salt = pa.array(np.arange(len(t)) % num_salts, pa.int64())
        return t.append_column("salt", salt)

    phase1 = (ds.map_batches(add_salt, batch_format="pyarrow")
              .groupby([key, "salt"]).aggregate(*aggs1))
    return (phase1.groupby(key).aggregate(*aggs2))
