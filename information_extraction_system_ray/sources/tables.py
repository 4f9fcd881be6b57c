"""Pruned readers for the driver's Parquet tables (TESTDATA.md)."""

from __future__ import annotations

import math
import os

import pyarrow.parquet as pq
import ray.data


def read_table(sf_dir: str, name: str,
               columns: list[str] | None = None,
               rows_per_block: int = 200_000) -> ray.data.Dataset:
    """read_parquet with column pruning and data-sized parallelism.

    - columns: a read that loads all columns for a 2-column transform is
      wrong at 100 TB (SURVEY.md §4).
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
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=nblocks)
