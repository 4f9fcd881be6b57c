"""Pruned readers for the driver's Parquet tables (TESTDATA.md)."""

from __future__ import annotations

import os

import ray.data


def read_table(sf_dir: str, name: str,
               columns: list[str] | None = None) -> ray.data.Dataset:
    """read_parquet with column pruning — a read that loads all columns for a
    2-column transform is wrong at 100 TB (SURVEY.md §4)."""
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns)
