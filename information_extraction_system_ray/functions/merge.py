"""Distributed ``MERGE INTO`` (SQL:2003 / lakehouse upsert): apply a
change batch to a base table with WHEN MATCHED (update or delete) and
WHEN NOT MATCHED (insert) actions — the primitive behind Delta/Iceberg
``MERGE`` and every CDC-apply job.

Physical plan = three join legs over the existing join suite, all
key-partitioned and streaming:

- untouched base rows  → ``anti_join(base, source)``
- matched rows         → ``auto_join(base, source)`` + the caller's
  per-batch WHEN MATCHED kernel (update/delete logic, vectorized)
- new rows             → ``anti_join(source, base)`` + the caller's
  WHEN NOT MATCHED kernel

and one metadata-only union. Nothing lands on the driver; the join
chooser (functions/joins.py) flips matched-leg physical plans by build
size exactly as for any other join.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import ray.data

from .joins import anti_join, auto_join


def merge_into(base: ray.data.Dataset, source: ray.data.Dataset, *,
               on: str,
               when_matched: "Callable[[pa.Table], pa.Table]",
               when_not_matched: "Callable[[pa.Table], pa.Table] | None",
               source_cols: "list[str] | None" = None,
               num_partitions: "int | None" = None) -> ray.data.Dataset:
    """Returns the merged table in BASE's schema.

    ``when_matched`` receives per-batch Arrow tables of base columns +
    the requested ``source_cols`` (source key joined away; collisions
    follow auto_join's contract) and returns surviving rows in base
    schema — emit updated rows to UPDATE, drop rows to DELETE, return
    the batch unchanged for a no-op. ``when_not_matched`` receives
    source-schema batches of unmatched source rows and returns rows in
    base schema (return a zero-row base-schema table to skip inserts);
    pass ``None`` to ignore unmatched source rows entirely."""
    untouched = anti_join(base, source, left_key=on, right_key=on,
                          num_partitions=num_partitions)
    matched = auto_join(base, source, left_key=on, right_key=on,
                        right_cols=source_cols or [],
                        num_partitions=num_partitions) \
        .map_batches(when_matched, batch_format="pyarrow")
    out = untouched.union(matched)
    if when_not_matched is not None:
        inserts = anti_join(source, base, left_key=on, right_key=on,
                            num_partitions=num_partitions) \
            .map_batches(when_not_matched, batch_format="pyarrow")
        out = out.union(inserts)
    return out
