"""Pages source: Parquet reader + distributed deterministic synthesizer.

The flagship input is a Common-Crawl-shaped Parquet table
(url, warc_ts:timestamp[us], html:binary, text:string|null, lang) —
BASELINE.json input_hint. ``read_pages`` is a pruned ``read_parquet``;
``synth_pages`` generates the same corpus the refimpl oracle annotates,
distributed: page *i* depends only on (seed, i) (refimpl.pagegen), so
generation is a stateless ``map_batches`` over ``ray.data.range`` — no
driver-side materialization at any scale.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from refimpl import SEED
from refimpl.pagegen import gen_page


def read_pages(path: str, columns: list[str] | None = None,
               langs: list[str] | None = None) -> ray.data.Dataset:
    """Read a pages Parquet table, pruning columns/rows at the read."""
    import pyarrow.dataset as pads

    filt = pads.field("lang").isin(langs) if langs else None
    return ray.data.read_parquet(path, columns=columns, filter=filt)


def _gen_batch(batch: pa.Table, seed: int,
               n_entities: int | None = None) -> pa.Table:
    from refimpl.vocab import scaled_universe

    uni = scaled_universe(n_entities)   # lru-cached per worker
    ids = batch["id"].to_pylist()
    pages = [gen_page(i, seed, uni) for i in ids]
    return pa.table({
        "url": pa.array([p.url for p in pages], pa.string()),
        "warc_ts": pa.array([p.warc_ts_us for p in pages],
                            pa.timestamp("us")),
        "html": pa.array([p.html for p in pages], pa.binary()),
        "text": pa.array(
            [p.text if p.text_provided else None for p in pages],
            pa.string()),
        "lang": pa.array([p.lang for p in pages], pa.string()),
    })


def synth_pages(n: int, seed: int = SEED, *,
                override_num_blocks: int | None = None,
                n_entities: int | None = None) -> ray.data.Dataset:
    """Deterministic n-page corpus as a Dataset; parallel by construction.

    ``n_entities`` scales the entity universe (refimpl.vocab
    scaled_universe) so the KG grows with the corpus — r4 VERDICT #1; the
    scalar rides in fn_kwargs and each worker reconstructs the universe."""
    # ~2000 pages per block: enough blocks for full-width parallelism at
    # bench scale, but not so many that every downstream coalescing
    # repartition pays a 400-wide barrier (profiled: the graph phase's
    # repartitions were block-count-bound, not data-bound). Past 64
    # blocks, round DOWN to a multiple of 32 so the annotate actor-pool
    # waves pack exactly (r4 VERDICT #6: the 200-block tail wave ran 8
    # of 32 actors busy; 192 = 6 full waves measured ~3% faster and
    # flat across repeats)
    blocks = override_num_blocks or max(8, min(400, n // 2000 or 1))
    if override_num_blocks is None and blocks >= 64:
        blocks -= blocks % 32
    return ray.data.range(n, override_num_blocks=blocks).map_batches(
        _gen_batch, fn_kwargs={"seed": seed, "n_entities": n_entities},
        batch_format="pyarrow", batch_size=256,
    )
