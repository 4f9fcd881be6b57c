"""M1 — text extraction / boilerplate strip (SURVEY.md §2.2 M1).

Stateless ``map_batches`` over zero-copy Arrow batches. Per the north rule
the extracted text must be byte-identical per url to the reference semantics
(BASELINE.json:15): rows with a non-null ``text`` pass through unchanged;
null rows are derived from ``html`` with the shared ``refimpl.htmlstrip``
stripper (single implementation ⇒ identity by construction, verified against
golden fixtures in tests/test_flagship.py).

The fat ``html:binary`` column is dropped here — immediately after the only
stage that needs it — so everything downstream carries text-only rows
(SURVEY.md §7 "fat rows").
"""

from __future__ import annotations

import hashlib
import zlib

import pyarrow as pa
import ray.data

from refimpl.htmlstrip import strip_html
from refimpl.oracle import extracted_text


def _part_ids(urls: list[str], num_parts: int) -> list[int]:
    # stable partition id assigned at ingest (SURVEY.md §4 checkpoint/resume)
    return [zlib.crc32(u.encode()) % num_parts for u in urls]


def make_strip_batch(num_parts: int, with_sha: bool):
    def strip_batch(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        htmls = batch["html"]
        out_texts = [
            t if t is not None else strip_html(htmls[i].as_py())
            for i, t in enumerate(texts)
        ]
        cols: dict = {
            "url": batch["url"],
            "part_id": pa.array(_part_ids(urls, num_parts), pa.int32()),
            "lang": batch["lang"],
            "text": pa.array(out_texts, pa.string()),
        }
        if with_sha:
            cols["text_sha256"] = pa.array(
                [hashlib.sha256(t.encode()).digest() for t in out_texts],
                pa.binary())
        return pa.table(cols)

    return strip_batch


def extract_text(pages: ray.data.Dataset, *, num_parts: int = 64,
                 with_sha: bool = True,
                 batch_size: int = 128) -> ray.data.Dataset:
    """pages(url, warc_ts, html, text, lang) → extracted(url, part_id, lang,
    text[, text_sha256]).

    Small batch_size: html rows are fat; a batch × concurrency must fit in a
    worker heap (SURVEY.md §4 block sizing).
    """
    return pages.map_batches(
        make_strip_batch(num_parts, with_sha),
        batch_format="pyarrow", batch_size=batch_size,
    )


__all__ = ["extract_text", "make_strip_batch", "extracted_text"]
