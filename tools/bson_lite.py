"""Minimal stdlib BSON reader — just enough of the spec to decode the
reference's shipped ``mongodump`` files (its only golden output; see
/root/reference/mongobackup/dump/clusterDatabase/*.bson) for the
document-structure parity test in tests/test_golden_docs.py.

Handles the element types those dumps actually contain (double,
string, embedded document, array, ObjectId, boolean, UTC datetime,
null, int32, int64) and fails loudly on anything else — this is a
test fixture reader, not a general BSON library.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Any


def _parse_doc(buf: bytes, pos: int) -> tuple[dict[str, Any], int]:
    (length,) = struct.unpack_from("<i", buf, pos)
    end = pos + length
    p = pos + 4
    doc: dict[str, Any] = {}
    while p < end - 1:
        etype = buf[p]
        p += 1
        nz = buf.index(b"\x00", p)
        name = buf[p:nz].decode("utf-8")
        p = nz + 1
        val: Any
        if etype == 0x01:  # double
            (val,) = struct.unpack_from("<d", buf, p)
            p += 8
        elif etype == 0x02:  # string
            (slen,) = struct.unpack_from("<i", buf, p)
            p += 4
            val = buf[p : p + slen - 1].decode("utf-8")
            p += slen
        elif etype in (0x03, 0x04):  # document / array
            val, p = _parse_doc(buf, p)
            if etype == 0x04:
                val = [val[str(i)] for i in range(len(val))]
        elif etype == 0x07:  # ObjectId
            val = buf[p : p + 12].hex()
            p += 12
        elif etype == 0x08:  # boolean
            val = bool(buf[p])
            p += 1
        elif etype == 0x09:  # UTC datetime (ms since epoch)
            (val,) = struct.unpack_from("<q", buf, p)
            p += 8
        elif etype == 0x0A:  # null
            val = None
        elif etype == 0x10:  # int32
            (val,) = struct.unpack_from("<i", buf, p)
            p += 4
        elif etype == 0x12:  # int64
            (val,) = struct.unpack_from("<q", buf, p)
            p += 8
        else:
            raise ValueError(f"unhandled BSON element type 0x{etype:02x}")
        doc[name] = val
    return doc, end


def load_bson(path: str | Path) -> list[dict[str, Any]]:
    """All documents in a mongodump .bson file (concatenated docs)."""
    buf = Path(path).read_bytes()
    docs: list[dict[str, Any]] = []
    pos = 0
    while pos < len(buf):
        d, pos = _parse_doc(buf, pos)
        docs.append(d)
    return docs


def key_paths(obj: Any, prefix: str = "") -> set[str]:
    """The set of dotted key paths in a (nested) document; array hops
    are flattened to ``[]`` so structure compares independently of
    element counts — e.g. ``list[].clusters[].radius``."""
    out: set[str] = set()
    if isinstance(obj, dict):
        for k, v in obj.items():
            path = f"{prefix}.{k}" if prefix else k
            out.add(path)
            out |= key_paths(v, path)
    elif isinstance(obj, list):
        for v in obj:
            out |= key_paths(v, prefix + "[]")
    return out
