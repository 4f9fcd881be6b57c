"""XML source/sink — pure-stdlib ``xml.etree`` row-oriented table codec.

The interchange format every legacy enterprise feed still speaks (the
reference's ingestion layer accepted markup documents; this is the
table-shaped sibling of the HTML path). Layout::

    <table>
      <schema><field name="o_orderkey" type="int64"/>...</schema>
      <rows><row><o_orderkey>17</o_orderkey>...</row>...</rows>
    </table>

Types round-trip through the embedded schema element: int64, float64,
string, date32, timestamp_us, bool. NULL columns omit the cell element.
Writes are deterministic (no timestamps, attribute order fixed), so the
roundtrip oracle can compare exact values. One file per block — the
same resumable-shard layout as the Avro/ORC/IPC sinks.
"""

from __future__ import annotations

import calendar
import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import pyarrow as pa

# Conservative XML element-name rule (no colons — they'd be namespace
# prefixes): letters/underscore start, then letters/digits/_/./-.
_XML_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_.\-]*$")

_TYPES = {
    pa.int64(): "int64",
    pa.float64(): "float64",
    pa.string(): "string",
    pa.date32(): "date32",
    pa.timestamp("us"): "timestamp_us",
    pa.bool_(): "bool",
}
_BACK = {v: k for k, v in _TYPES.items()}


def _render(val, typ: str) -> str:
    if typ == "timestamp_us":
        # timezone-independent epoch micros: naive datetimes are UTC
        # by contract; val.timestamp() would read them in the host's
        # LOCAL zone and break the exact roundtrip whenever TZ != UTC
        if hasattr(val, "timetuple"):
            return str(calendar.timegm(val.timetuple()) * 1_000_000
                       + val.microsecond)
        return str(int(val))
    if typ == "date32":
        return val.isoformat()
    if typ == "bool":
        return "1" if val else "0"
    if typ == "float64":
        return repr(float(val))         # shortest exact float repr
    return str(val)


def write_xml(table: pa.Table, path: str) -> None:
    """Serialize ``table`` to ``path``. Unsupported Arrow types raise."""
    cols = []
    for f in table.schema:
        if f.type not in _TYPES:
            raise ValueError(f"xmlio: unsupported type {f.type} "
                             f"for column {f.name!r}")
        if not _XML_NAME.match(f.name):
            # column names become element tags — reject up front
            # instead of writing a file that only fails at read time
            raise ValueError(f"xmlio: column name {f.name!r} is not a "
                             "valid XML element name")
        cols.append((f.name, _TYPES[f.type]))
    parts = ["<table><schema>"]
    for name, typ in cols:
        parts.append(f'<field name="{escape(name)}" type="{typ}"/>')
    parts.append("</schema><rows>")
    data = [table.column(i).to_pylist() for i in range(table.num_columns)]
    for r in range(table.num_rows):
        parts.append("<row>")
        for c, (name, typ) in enumerate(cols):
            v = data[c][r]
            if v is None:
                continue
            parts.append(f"<{name}>{escape(_render(v, typ))}</{name}>")
        parts.append("</row>")
    parts.append("</rows></table>")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("".join(parts))


def read_xml(src) -> pa.Table:
    """Parse bytes/str/path produced by :func:`write_xml` back to an
    Arrow table with the original schema (typed via the embedded
    <schema> element)."""
    if isinstance(src, (bytes, bytearray, memoryview)):
        root = ET.fromstring(bytes(src).decode("utf-8"))
    elif isinstance(src, str) and src.lstrip().startswith("<"):
        root = ET.fromstring(src)
    else:
        root = ET.parse(src).getroot()
    fields = [(f.attrib["name"], f.attrib["type"])
              for f in root.find("schema")]
    cols: "dict[str, list]" = {n: [] for n, _ in fields}
    for row in root.find("rows"):
        seen = {cell.tag: cell.text or "" for cell in row}
        for name, typ in fields:
            if name not in seen:
                cols[name].append(None)
                continue
            txt = seen[name]
            if typ == "int64":
                cols[name].append(int(txt))
            elif typ == "float64":
                cols[name].append(float(txt))
            elif typ == "bool":
                cols[name].append(txt == "1")
            elif typ == "timestamp_us":
                cols[name].append(int(txt))
            elif typ == "date32":
                import datetime as _dt
                cols[name].append(_dt.date.fromisoformat(txt))
            else:
                cols[name].append(txt)
    arrays = []
    for name, typ in fields:
        at = _BACK[typ]
        if typ == "timestamp_us":
            arrays.append(pa.array(cols[name], pa.int64()).cast(at))
        else:
            arrays.append(pa.array(cols[name], at))
    return pa.table(dict(zip((n for n, _ in fields), arrays)))
