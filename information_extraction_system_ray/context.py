"""Execution-context tuning for the streaming executor (SURVEY.md §4)."""

from __future__ import annotations

from ray.data import DataContext

MiB = 1024 * 1024


def tune_context(quiet: bool = True,
                 target_max_block_size: int = 128 * MiB) -> DataContext:
    """Apply the engine's DataContext defaults.

    - default 128 MiB blocks: pages rows are fat (html binary) but blocks are
      split dynamically; post-strip stages carry text-only rows
    - order preservation off: every pipeline output is either keyed (sorted
      at the sink) or order-insensitive (aggregates), so the executor is free
      to reorder blocks for pipelining
    """
    ctx = DataContext.get_current()
    ctx.target_max_block_size = target_max_block_size
    ctx.execution_options.preserve_order = False
    if quiet:
        ctx.enable_progress_bars = False
    return ctx
