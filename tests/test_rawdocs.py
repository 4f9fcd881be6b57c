"""Raw-document ingestion (S1 second half): read_binary_files → actor-pool
decode → pages schema, byte-level semantics per extension."""

import os

import pytest


@pytest.fixture()
def doc_dir(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.txt").write_bytes("Hello plain text.\nSecond line.".encode())
    (d / "b.html").write_bytes(
        b"<html><head><title>x</title></head><body>"
        b"<p>Visible body text.</p><script>nope()</script></body></html>")
    (d / "c.pdf").write_bytes(b"%PDF-1.4 fake binary payload \x00\x01")
    (d / "ignored.xyz").write_bytes(b"unknown extension")
    return str(d)


def test_ingest_pages_schema_and_bytes(ray_session, doc_dir):
    from information_extraction_system_ray.sources.rawdocs import (
        PAGES_SCHEMA, _fake_extract, ingest_documents)
    from refimpl.htmlstrip import strip_html

    ds = ingest_documents(doc_dir, concurrency=(1, 2))
    rows = {os.path.basename(r["url"]): r for r in ds.take_all()}

    # unknown extension dropped; the three codecs present
    assert set(rows) == {"a.txt", "b.html", "c.pdf"}
    assert ds.schema().base_schema.equals(PAGES_SCHEMA)

    # .txt: REAL decode, byte-identical text, no html
    assert rows["a.txt"]["text"] == "Hello plain text.\nSecond line."
    assert bytes(rows["a.txt"]["html"]) == b""

    # .html: bytes pass through untouched (strip happens downstream)
    raw = open(os.path.join(doc_dir, "b.html"), "rb").read()
    assert bytes(rows["b.html"]["html"]) == raw
    assert rows["b.html"]["text"] is None

    # .pdf: deterministic stub extraction
    payload = open(os.path.join(doc_dir, "c.pdf"), "rb").read()
    assert rows["c.pdf"]["text"] == _fake_extract(payload, ".pdf")

    # ingested pages drop into the flagship stripper: html text extracted
    # byte-identically by the shared refimpl stripper
    from information_extraction_system_ray.stages.strip import extract_text

    ext = {os.path.basename(r["url"]): r
           for r in extract_text(ds, num_parts=4,
                                 with_sha=False).take_all()}
    assert ext["b.html"]["text"] == strip_html(raw)
    assert ext["a.txt"]["text"] == "Hello plain text.\nSecond line."


def test_ingest_deterministic_warc_ts(ray_session, doc_dir):
    from information_extraction_system_ray.sources.rawdocs import \
        ingest_documents

    a = {r["url"]: r["warc_ts"]
         for r in ingest_documents(doc_dir).take_all()}
    b = {r["url"]: r["warc_ts"]
         for r in ingest_documents(doc_dir).take_all()}
    assert a == b and len(a) == 3


def test_unknown_decoder_rejected(ray_session):
    from information_extraction_system_ray.sources.rawdocs import \
        DecodeDocuments

    with pytest.raises(ValueError):
        DecodeDocuments(decoder="textract")
