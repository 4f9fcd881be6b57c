"""Document chunking — token-window splitting with overlap, the
training-data-prep operator that turns a documents table into a chunks
table (context-window-sized pieces for LLM training / embedding).

A pure per-batch flat map (no shuffle at all): each doc yields
``ceil((n - size) / (size - overlap)) + 1`` chunks of ``size`` whitespace
tokens with ``overlap`` tokens shared between neighbours; the final chunk
is the short remainder. Chunk TEXT is sliced on the original byte offsets
(regex token scan per doc — same cost class as the tokenizer stage), so
``" ".join``-style reconstruction artifacts never occur; chunk boundaries
land exactly on token boundaries of the source text.

Determinism: chunk_id is the 0-based window index — output is a pure
function of (doc, size, overlap), block-order independent.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from .text import _WORD_RE


def chunk_batch(batch: pa.Table, *, size: int, overlap: int,
                id_col: str = "doc_id", text_col: str = "text",
                with_text: bool = True) -> pa.Table:
    step = size - overlap
    out_id, out_ck, out_n, out_txt = [], [], [], []
    for did, text in zip(batch[id_col].to_pylist(),
                         batch[text_col].to_pylist()):
        spans = [m.span() for m in _WORD_RE.finditer(text or "")]
        n = len(spans)
        if n == 0:
            continue
        start = 0
        ck = 0
        while True:
            end = min(start + size, n)
            out_id.append(did)
            out_ck.append(ck)
            out_n.append(end - start)
            if with_text:
                out_txt.append(text[spans[start][0]:spans[end - 1][1]])
            if end >= n:
                break
            start += step
            ck += 1
    cols = {id_col: pa.array(out_id, pa.int64()),
            "chunk_id": pa.array(out_ck, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64())}
    if with_text:
        cols["chunk_text"] = pa.array(out_txt, pa.string())
    return pa.table(cols)


def chunk_documents(docs: ray.data.Dataset, *, size: int = 100,
                    overlap: int = 20, id_col: str = "doc_id",
                    text_col: str = "text",
                    with_text: bool = True) -> ray.data.Dataset:
    """Dataset(doc_id, chunk_id, n_tokens[, chunk_text]) — one row per
    token window. ``overlap < size`` required. Empty docs yield no rows."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    return docs.map_batches(
        chunk_batch,
        fn_kwargs={"size": size, "overlap": overlap, "id_col": id_col,
                   "text_col": text_col, "with_text": with_text},
        batch_format="pyarrow")
