"""Pure-stdlib Apache Avro Object Container File codec (Avro spec 1.11,
"Object Container Files" + binary encoding sections — public). Flat
record schemas over long / double / string / boolean fields, ``null``
codec only; enough for tabular interchange with any Avro reader, in the
same spirit as the repo's other from-scratch codecs (pdftext.py,
mediacodec.py). Compressed codecs (deflate/snappy) are out of scope by
choice — the container's codec field rejects them loudly.

``write_avro(table, path)`` / ``read_avro(path | bytes) -> pa.Table``.
The 16-byte sync marker is derived deterministically from the schema so
identical inputs produce byte-identical files (repo determinism rule).
"""

from __future__ import annotations

import hashlib
import io
import json
import struct

import pyarrow as pa

_MAGIC = b"Obj\x01"

_ARROW_TO_AVRO = {
    pa.int64(): "long",
    pa.float64(): "double",
    pa.string(): "string",
    pa.bool_(): "boolean",
}


def _enc_long(n: int) -> bytes:
    """Zigzag varint (Avro 'long'). Python's arithmetic shift makes the
    textbook (n << 1) ^ (n >> 63) correct for any int64-range value."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_long(buf: memoryview, pos: int) -> "tuple[int, int]":
    shift = 0
    z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def _schema_json(schema: pa.Schema) -> str:
    fields = []
    for f in schema:
        if f.type not in _ARROW_TO_AVRO:
            raise ValueError(f"unsupported Avro field type {f.type} "
                             f"(flat long/double/string/boolean only)")
        fields.append({"name": f.name, "type": _ARROW_TO_AVRO[f.type]})
    return json.dumps({"type": "record", "name": "Row", "fields": fields},
                      sort_keys=True)


def write_avro(table: pa.Table, path: str, *,
               rows_per_block: int = 4096) -> int:
    """Serialize ``table`` as an Avro OCF at ``path``; returns rows."""
    sj = _schema_json(table.schema).encode()
    sync = hashlib.md5(b"ies-avro:" + sj).digest()     # deterministic
    buf = io.BytesIO()
    buf.write(_MAGIC)
    buf.write(_enc_long(2))                            # metadata map block
    for k, v in ((b"avro.schema", sj), (b"avro.codec", b"null")):
        buf.write(_enc_long(len(k)))
        buf.write(k)
        buf.write(_enc_long(len(v)))
        buf.write(v)
    buf.write(_enc_long(0))                            # map terminator
    buf.write(sync)

    cols = [table.column(i).to_pylist() for i in range(table.num_columns)]
    kinds = [_ARROW_TO_AVRO[f.type] for f in table.schema]
    n = table.num_rows
    for start in range(0, n, rows_per_block):
        stop = min(start + rows_per_block, n)
        body = bytearray()
        for i in range(start, stop):
            for c, kind in enumerate(kinds):
                v = cols[c][i]
                if kind == "long":
                    body += _enc_long(int(v))
                elif kind == "double":
                    body += struct.pack("<d", float(v))
                elif kind == "boolean":
                    body += b"\x01" if v else b"\x00"
                else:
                    raw = (v or "").encode()
                    body += _enc_long(len(raw)) + raw
        buf.write(_enc_long(stop - start))
        buf.write(_enc_long(len(body)))
        buf.write(bytes(body))
        buf.write(sync)
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    return n


def read_avro(src) -> pa.Table:
    """Parse an Avro OCF from a path or bytes back into a pa.Table."""
    raw = src if isinstance(src, (bytes, bytearray)) \
        else open(src, "rb").read()
    mv = memoryview(raw)
    if bytes(mv[:4]) != _MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta = {}
    while True:
        cnt, pos = _dec_long(mv, pos)
        if cnt == 0:
            break
        if cnt < 0:                      # negative count: size-prefixed
            _, pos = _dec_long(mv, pos)
            cnt = -cnt
        for _ in range(cnt):
            kl, pos = _dec_long(mv, pos)
            k = bytes(mv[pos:pos + kl]).decode()
            pos += kl
            vl, pos = _dec_long(mv, pos)
            meta[k] = bytes(mv[pos:pos + vl])
            pos += vl
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported Avro codec {codec!r} (null only)")
    schema = json.loads(meta["avro.schema"])
    kinds = [f["type"] for f in schema["fields"]]
    names = [f["name"] for f in schema["fields"]]
    sync = bytes(mv[pos:pos + 16])
    pos += 16

    data: "list[list]" = [[] for _ in names]
    total = len(mv)
    while pos < total:
        cnt, pos = _dec_long(mv, pos)
        size, pos = _dec_long(mv, pos)
        end = pos + size
        for _ in range(cnt):
            for c, kind in enumerate(kinds):
                if kind == "long":
                    v, pos = _dec_long(mv, pos)
                elif kind == "double":
                    v = struct.unpack_from("<d", mv, pos)[0]
                    pos += 8
                elif kind == "boolean":
                    v = mv[pos] == 1
                    pos += 1
                else:
                    ln, pos = _dec_long(mv, pos)
                    v = bytes(mv[pos:pos + ln]).decode()
                    pos += ln
                data[c].append(v)
        if pos != end:
            raise ValueError("Avro block size mismatch")
        if bytes(mv[pos:pos + 16]) != sync:
            raise ValueError("Avro sync marker mismatch")
        pos += 16

    arrow_types = {"long": pa.int64(), "double": pa.float64(),
                   "string": pa.string(), "boolean": pa.bool_()}
    return pa.table({nm: pa.array(col, arrow_types[kind])
                     for nm, kind, col in zip(names, kinds, data)})
