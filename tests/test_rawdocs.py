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


# ---------------------------------------------------------------------------
# OLE2 .doc extraction (VERDICT r3 item #9) — fixtures constructed from the
# MS-CFB / MS-DOC specs, never from real proprietary files
# ---------------------------------------------------------------------------

import struct as _struct

_SEC = 512
_MINI = 64
_END = 0xFFFFFFFE
_FREE = 0xFFFFFFFF


def _dir_entry(name, otype, start, size, child=0xFFFFFFFF):
    nb = name.encode("utf-16-le")
    e = bytearray(128)
    e[:len(nb)] = nb
    _struct.pack_into("<H", e, 64, len(nb) + 2)
    e[66] = otype
    e[67] = 1                                    # black
    _struct.pack_into("<III", e, 68, _FREE, _FREE, child)
    _struct.pack_into("<I", e, 116, start)
    _struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def _build_ole2(streams):
    """streams: [(name, bytes)] → minimal valid CFB container. Streams
    < 4096 bytes go through the mini stream + miniFAT; others through
    regular FAT chains."""
    def pad(b, k):
        return b + b"\x00" * (-len(b) % k)

    big = [(n, b) for n, b in streams if len(b) >= 4096]
    small = [(n, b) for n, b in streams if len(b) < 4096]

    mini_data, mini_fat, mini_starts = b"", [], {}
    for n, b in small:
        start = len(mini_data) // _MINI
        nsec = max(1, -(-len(b) // _MINI))
        mini_starts[n] = start
        mini_fat.extend(list(range(start + 1, start + nsec)) + [_END])
        mini_data += pad(b, _MINI)

    sectors, fat = [], []
    starts = {}

    def alloc(data):
        data = pad(data, _SEC)
        nsec = len(data) // _SEC
        first = len(sectors)
        for i in range(nsec):
            sectors.append(data[i * _SEC:(i + 1) * _SEC])
            fat.append(first + i + 1 if i < nsec - 1 else _END)
        return first

    for n, b in big:
        starts[n] = alloc(b)
    mini_start = alloc(mini_data) if mini_data else _END
    minifat_start = _END
    if mini_fat:
        mf = b"".join(_struct.pack("<I", v) for v in mini_fat)
        mf = pad(mf, _SEC).ljust(_SEC, b"\xff")
        minifat_start = alloc(
            mf + b"\xff" * (_SEC - len(mf)) if len(mf) < _SEC else mf)

    entries = [_dir_entry("Root Entry", 5, mini_start, len(mini_data),
                          child=1 if streams else _FREE)]
    for n, b in streams:
        s = starts[n] if len(b) >= 4096 else mini_starts[n]
        entries.append(_dir_entry(n, 2, s, len(b)))
    dir_start = alloc(b"".join(entries))
    fat_start = len(sectors)
    fat.append(0xFFFFFFFD)                       # the FAT sector itself
    assert len(fat) <= _SEC // 4, "test builder: one FAT sector only"
    fat_body = b"".join(_struct.pack("<I", v) for v in fat)
    fat_body += _struct.pack("<I", _FREE) * ((_SEC - len(fat_body)) // 4)
    sectors.append(fat_body)

    hdr = bytearray(512)
    hdr[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    _struct.pack_into("<HH", hdr, 24, 0x3E, 3)   # minor, major
    _struct.pack_into("<H", hdr, 28, 0xFFFE)     # little endian
    _struct.pack_into("<HH", hdr, 30, 9, 6)      # sector/mini shifts
    _struct.pack_into("<I", hdr, 44, 1)          # 1 FAT sector
    _struct.pack_into("<I", hdr, 48, dir_start)
    _struct.pack_into("<I", hdr, 56, 4096)       # mini cutoff
    _struct.pack_into("<I", hdr, 60, minifat_start)
    _struct.pack_into("<I", hdr, 64, 1 if mini_fat else 0)
    _struct.pack_into("<I", hdr, 68, _END)       # no DIFAT chain
    _struct.pack_into("<I", hdr, 72, 0)
    difat = [fat_start] + [_FREE] * 108
    _struct.pack_into("<109I", hdr, 76, *difat)
    return bytes(hdr) + b"".join(sectors)


def _build_doc(pieces, which_table=0, big=False):
    """pieces: [(text, compressed)] → .doc bytes. ``big`` pads streams
    past the 4096 mini cutoff to exercise the regular-FAT path."""
    word = bytearray(1024)
    _struct.pack_into("<HH", word, 0, 0xA5EC, 0x00C1)
    _struct.pack_into("<H", word, 0x0A, 0x0200 if which_table else 0)
    fcs = []
    for text, comp in pieces:
        off = len(word)
        if comp:
            fcs.append((off * 2) | 0x40000000)
            word.extend(text.encode("cp1252"))
        else:
            fcs.append(off)
            word.extend(text.encode("utf-16-le"))
    cps = [0]
    for text, _ in pieces:
        cps.append(cps[-1] + len(text))
    plc = b"".join(_struct.pack("<I", c) for c in cps) + \
        b"".join(_struct.pack("<HIH", 0, fc, 0) for fc in fcs)
    clx = b"\x01" + _struct.pack("<h", 2) + b"\x00\x00" \
        + b"\x02" + _struct.pack("<I", len(plc)) + plc   # Prc then Pcdt
    table = bytearray(64) + clx
    _struct.pack_into("<II", word, 418, 64, len(clx))
    if big:
        word.extend(b"\x00" * max(0, 4096 - len(word) + 1))
        table.extend(b"\x00" * max(0, 4096 - len(table) + 1))
    name = "1Table" if which_table else "0Table"
    return _build_ole2([("WordDocument", bytes(word)), (name, bytes(table))])


@pytest.mark.parametrize("which_table", [0, 1])
@pytest.mark.parametrize("big", [False, True])
def test_doc_extraction_paths(which_table, big):
    from information_extraction_system_ray.sources.doctext import (
        extract_doc_text)

    pieces = [("Hello legacy Word.\r", True),
              ("Uni—code piece. ", False),
              ("Fin\x07al.", True)]
    data = _build_doc(pieces, which_table=which_table, big=big)
    got = extract_doc_text(data)
    assert got == "Hello legacy Word.\nUni—code piece. Fin\nal."


def test_doc_rejections():
    from information_extraction_system_ray.sources.doctext import (
        extract_doc_text)

    with pytest.raises(ValueError, match="not an OLE2"):
        extract_doc_text(b"PK\x03\x04 not ole2")
    # valid container, bogus FIB magic
    data = bytearray(_build_doc([("x", True)]))
    # WordDocument data is the first regular sector in the mini stream;
    # corrupt via full-scan replace of the FIB magic
    i = bytes(data).find(b"\xec\xa5")
    data[i:i + 2] = b"\x00\x00"
    with pytest.raises(ValueError, match="no valid FIB"):
        extract_doc_text(bytes(data))


def test_doc_through_ingest_real(ray_session, tmp_path):
    """ingest_documents(decoder='real') extracts .doc text end-to-end."""
    from information_extraction_system_ray.sources.rawdocs import (
        ingest_documents)

    d = tmp_path / "docs"
    d.mkdir()
    (d / "legacy.doc").write_bytes(
        _build_doc([("Real legacy doc text here.", True)]))
    ds = ingest_documents(str(d), decoder="real", concurrency=(1, 2))
    rows = ds.take_all()
    assert len(rows) == 1
    assert rows[0]["text"] == "Real legacy doc text here."
    assert rows[0]["url"].endswith("legacy.doc")
