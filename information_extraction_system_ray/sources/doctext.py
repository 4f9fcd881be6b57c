"""Pure-stdlib legacy Word ``.doc`` text extraction (VERDICT r3 item #9 —
the last stubbed reference capability; same spirit as pdftext.py's
FlateDecode PDF path).

Two public formats compose the extractor, both fully documented:

- **OLE2 / CFB compound file** (MS-CFB): 512-byte header with a DIFAT →
  FAT sector chains; a directory of 128-byte entries; streams smaller
  than the mini-stream cutoff (4096) live in 64-byte mini sectors inside
  the root entry's mini stream, chained by the miniFAT. ``_CfbFile``
  walks all of it with ``struct`` only.
- **MS-DOC FIB + piece table**: the ``WordDocument`` stream starts with
  the FIB (magic 0xA5EC); flag bit 0x0200 at offset 0x0A selects the
  ``0Table``/``1Table`` stream; fcClx/lcbClx at FIB offsets 418/422
  locate the Clx in that table stream. The Clx's Pcdt (clxt=2) holds the
  PlcPcd piece table: n+1 character positions + n 8-byte PCDs. Each
  PCD's fc has bit 30 = fCompressed — set means 8-bit cp1252 text at
  byte offset (fc & 0x3FFFFFFF)/2, clear means UTF-16LE at fc — into the
  WordDocument stream. Pieces concatenate to the document text.

Tested against in-test-constructed .doc files (both table-stream flags,
both piece encodings, FAT and miniFAT stream placement) in
tests/test_rawdocs.py.
"""

from __future__ import annotations

import struct

_CFB_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_MAXREG = 0xFFFFFFFA


class _CfbFile:
    """Minimal OLE2/CFB reader: directory listing + stream extraction
    (regular FAT chains and miniFAT mini-stream chains)."""

    def __init__(self, data: bytes) -> None:
        if data[:8] != _CFB_SIG:
            raise ValueError("not an OLE2 compound file")
        self.data = data
        (self.sec_shift,) = struct.unpack_from("<H", data, 30)
        (self.mini_shift,) = struct.unpack_from("<H", data, 32)
        self.sec_size = 1 << self.sec_shift
        self.mini_size = 1 << self.mini_shift
        (self.n_fat,) = struct.unpack_from("<I", data, 44)
        (self.dir_start,) = struct.unpack_from("<I", data, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (self.minifat_start,) = struct.unpack_from("<I", data, 60)
        (self.n_minifat,) = struct.unpack_from("<I", data, 64)
        (self.difat_start,) = struct.unpack_from("<I", data, 68)
        (self.n_difat,) = struct.unpack_from("<I", data, 72)

        # DIFAT: 109 header entries, then chained DIFAT sectors
        difat = list(struct.unpack_from("<109I", data, 76))
        sec = self.difat_start
        for _ in range(self.n_difat):
            if sec >= _MAXREG:
                break
            raw = self._sector(sec)
            vals = struct.unpack(f"<{self.sec_size // 4}I", raw)
            difat.extend(vals[:-1])
            sec = vals[-1]
        self.fat: "list[int]" = []
        per = self.sec_size // 4
        for s in difat:
            if s >= _MAXREG:
                continue
            self.fat.extend(struct.unpack(f"<{per}I", self._sector(s)))

        self.entries = self._read_directory()
        root = self.entries[0]
        self.mini_stream = self._read_chain(root["start"], root["size"])
        self.minifat: "list[int]" = []
        sec = self.minifat_start
        for _ in range(self.n_minifat):
            if sec >= _MAXREG:
                break
            self.minifat.extend(
                struct.unpack(f"<{per}I", self._sector(sec)))
            sec = self.fat[sec]

    def _sector(self, idx: int) -> bytes:
        off = 512 + idx * self.sec_size
        return self.data[off:off + self.sec_size]

    def _read_chain(self, start: int, size: int) -> bytes:
        out, sec, guard = [], start, 0
        while sec < _MAXREG and guard <= len(self.fat):
            out.append(self._sector(sec))
            sec = self.fat[sec]
            guard += 1
        return b"".join(out)[:size]

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out, sec, guard = [], start, 0
        while sec < _MAXREG and guard <= len(self.minifat):
            off = sec * self.mini_size
            out.append(self.mini_stream[off:off + self.mini_size])
            sec = self.minifat[sec]
            guard += 1
        return b"".join(out)[:size]

    def _read_directory(self) -> "list[dict]":
        raw = self._read_chain(self.dir_start, 1 << 62)
        entries = []
        for off in range(0, len(raw) - 127, 128):
            (nlen,) = struct.unpack_from("<H", raw, off + 64)
            otype = raw[off + 66]
            if otype == 0 or nlen < 2:
                continue
            name = raw[off:off + max(0, nlen - 2)].decode(
                "utf-16-le", errors="replace")
            (start,) = struct.unpack_from("<I", raw, off + 116)
            (size,) = struct.unpack_from("<Q", raw, off + 120)
            if self.sec_size == 512:        # v3: high dword is unreliable
                size &= 0xFFFFFFFF
            entries.append({"name": name, "type": otype,
                            "start": start, "size": size})
        if not entries or entries[0]["type"] != 5:
            raise ValueError("OLE2 root directory entry missing")
        return entries

    def stream(self, name: str) -> bytes:
        for e in self.entries[1:]:
            if e["type"] == 2 and e["name"] == name:
                if e["size"] < self.mini_cutoff:
                    return self._read_mini_chain(e["start"], e["size"])
                return self._read_chain(e["start"], e["size"])
        raise KeyError(f"OLE2 stream {name!r} not found")


def _clean(text: str) -> str:
    """Word control characters → plain text: CR and cell/row marks become
    newlines, field/deletion control bytes drop, NBSP normalizes."""
    out = []
    for ch in text:
        if ch == "\r" or ch == "\x07" or ch == "\x0b":
            out.append("\n")
        elif ch == "\xa0":
            out.append(" ")
        elif ch >= " " or ch in "\n\t":
            out.append(ch)
    return "".join(out)


def extract_doc_text(data: bytes) -> str:
    """Legacy ``.doc`` bytes → document text via the FIB piece table."""
    cfb = _CfbFile(data)
    word = cfb.stream("WordDocument")
    if len(word) < 426 or struct.unpack_from("<H", word, 0)[0] != 0xA5EC:
        raise ValueError("WordDocument stream has no valid FIB")
    (flags,) = struct.unpack_from("<H", word, 0x0A)
    table_name = "1Table" if flags & 0x0200 else "0Table"
    fc_clx, lcb_clx = struct.unpack_from("<II", word, 418)
    if lcb_clx == 0:
        raise ValueError(".doc has an empty piece table (Clx)")
    table = cfb.stream(table_name)
    clx = table[fc_clx:fc_clx + lcb_clx]

    # walk Clx: Prc blocks (clxt=1, int16 size prefix) precede the Pcdt
    pos = 0
    while pos < len(clx) and clx[pos] == 1:
        (cb,) = struct.unpack_from("<h", clx, pos + 1)
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 2:
        raise ValueError("Clx has no Pcdt")
    (lcb,) = struct.unpack_from("<I", clx, pos + 1)
    plc = clx[pos + 5:pos + 5 + lcb]
    n = (lcb - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    pieces = []
    for i in range(n):
        fc_raw, = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * i + 2)
        n_chars = cps[i + 1] - cps[i]
        if fc_raw & 0x40000000:             # fCompressed: 8-bit cp1252
            off = (fc_raw & 0x3FFFFFFF) // 2
            pieces.append(word[off:off + n_chars].decode(
                "cp1252", errors="replace"))
        else:                               # UTF-16LE
            off = fc_raw
            pieces.append(word[off:off + 2 * n_chars].decode(
                "utf-16-le", errors="replace"))
    return _clean("".join(pieces))
