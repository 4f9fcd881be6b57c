"""Raw-document ingestion — S1's second half (SURVEY.md §2.1): the reference
converts on-disk raw documents (.pdf/.doc/.docx/.html/.txt) into its text
corpus; here that is ``ray.data.read_binary_files`` → an actor-pool decode
stage emitting the SAME pages schema the flagship consumes
(url, warc_ts:timestamp[us], html:binary, text:string|null, lang), so an
ingested directory drops straight into ``run_flagship``.

Codec reality in this container (no parser libraries installed):
- ``.txt``  — REAL: utf-8 decode (errors → replacement chars).
- ``.html`` — REAL: bytes pass through as the ``html`` column with
  ``text=None``; the flagship's byte-identical stripper extracts the text,
  preserving the per-url byte-identity invariant.
- ``.pdf`` / ``.docx`` — REAL under ``decoder="real"`` (round 3): the
  pure-stdlib extractors in ``sources/pdftext.py`` (FlateDecode via
  zlib + a content-stream tokenizer; zipfile+ElementTree for docx).
  ``decoder="fake"`` keeps the deterministic stand-in for plumbing
  tests and for the unsupported cases.
- ``.doc`` — REAL under ``decoder="real"`` (round 4): the pure-stdlib
  OLE2 FAT/miniFAT walk + FIB piece-table extractor in
  ``sources/doctext.py``; fake-extracted under ``decoder="fake"``.

``warc_ts`` is derived deterministically from the content hash (ingest has
no crawl timestamp; determinism beats wall-clock for resume/rerun equality).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import ray.data

_TEXT_EXTS = {".txt", ".text", ".md"}
_HTML_EXTS = {".html", ".htm"}
_STUB_EXTS = {".pdf", ".doc", ".docx"}

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

# epoch anchor for derived timestamps: 2020-01-01T00:00:00Z in µs
_TS_BASE_US = 1_577_836_800_000_000


def _fake_extract(payload: bytes, ext: str) -> str:
    """Deterministic stand-in for a pdf/doc parser: emits a reproducible
    pseudo-document from the byte content (clearly fake; replaced wholesale
    when a real parser is available)."""
    dig = hashlib.sha256(payload).hexdigest()
    words = [dig[i:i + 6] for i in range(0, 48, 6)]
    return (f"[stub-extracted {ext[1:]} sha256:{dig[:16]}] "
            + " ".join(words) + ".")


def _naive_lang(text: str) -> str:
    """Marker-word language guess, same heuristic family as
    functions.text.langid_batch (kept dependency-free here)."""
    from ..functions.text import _LANG_MARKERS

    toks = set(text.lower().split())
    best, hits = "unk", 0
    for lang, markers in _LANG_MARKERS.items():
        h = len(toks & markers)
        if h > hits:
            best, hits = lang, h
    return best


class DecodeDocuments:
    """Actor stage: (path, bytes) rows → pages-schema rows. Extension
    dispatch + codecs are set up once per actor in __init__ (the stateful
    actor-pool pattern); __call__ is one pass over the Arrow batch."""

    def __init__(self, decoder: str = "fake") -> None:
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self._real = decoder == "real"
        from refimpl.htmlstrip import strip_html
        self._strip = strip_html
        if self._real:
            from .doctext import extract_doc_text
            from .pdftext import extract_docx_text, extract_pdf_text
            self._pdf = extract_pdf_text
            self._docx = extract_docx_text
            self._doc = extract_doc_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, tss, htmls, texts, langs = [], [], [], [], []
        for path, payload in zip(batch["path"].to_pylist(),
                                 batch["bytes"].to_pylist()):
            ext = os.path.splitext(path)[1].lower()
            dig = hashlib.sha256(payload).digest()
            ts = _TS_BASE_US + int.from_bytes(dig[:6], "big")
            if ext in _HTML_EXTS:
                html, text = payload, None
                lang_src = self._strip(payload)
            elif ext in _TEXT_EXTS:
                html, text = b"", payload.decode("utf-8", errors="replace")
                lang_src = text
            elif ext in _STUB_EXTS and self._real:
                # corrupt/truncated documents are a per-document DROP, not
                # a pipeline failure: at corpus scale a malformed pdf/doc
                # must never kill the ingest stage (the drop shows up in
                # stage metrics like any other skip)
                fn = {".pdf": self._pdf, ".docx": self._docx,
                      ".doc": self._doc}[ext]
                try:
                    html, text = b"", fn(payload)
                except Exception:
                    continue
                lang_src = text
            elif ext in _STUB_EXTS and not self._real:
                html, text = b"", _fake_extract(payload, ext)
                lang_src = text
            else:               # unknown extension, or .doc under "real":
                continue        # skip (drop shows up in stage metrics)
            urls.append("file://" + path)
            tss.append(ts)
            htmls.append(html)
            texts.append(text)
            langs.append(_naive_lang(lang_src))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }).cast(PAGES_SCHEMA)


def ingest_documents(path: str, *, decoder: str = "fake",
                     concurrency=(1, 4),
                     batch_size: int = 64) -> ray.data.Dataset:
    """Directory (or file list) of raw documents → pages-schema Dataset.

    ``read_binary_files`` streams (path, bytes) rows block-by-block — raw
    payloads never gather on the driver; decode runs in an actor pool sized
    by ``concurrency`` (documents are fat rows → small ``batch_size``)."""
    raw = ray.data.read_binary_files(path, include_paths=True)
    return raw.map_batches(
        DecodeDocuments, fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1.0)
