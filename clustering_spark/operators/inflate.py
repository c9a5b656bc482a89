"""Decompression-bomb-safe zlib inflation shared by the binary
decoders (PNG IDAT, PDF FlateDecode). zlib's ~1000:1 ratio means a
few-MB crafted blob can force a multi-GB allocation if the output
budget is only checked AFTER ``zlib.decompress`` returns; inflating
through ``zlib.decompressobj`` with ``max_length`` bounds the
allocation itself, which is the actual "crafted blobs must not hold
a task hostage" contract the decoder modules state."""

from __future__ import annotations

import zlib


def bounded_inflate(
    data: bytes, budget: int, what: str = "deflate", wbits: int = 15
) -> bytes:
    """Inflate ``data``, never allocating more than ``budget`` output
    bytes (+1 for overflow detection). Raises ValueError when the
    stream is malformed, truncated, or would produce more than
    ``budget`` bytes. Trailing bytes after a complete stream are
    ignored, matching ``zlib.decompress``. ``wbits`` follows zlib's
    convention: 15 = zlib wrapper (the default), 31 = gzip wrapper,
    -15 = raw deflate (the three framings HTTP Content-Encoding
    actually ships)."""
    d = zlib.decompressobj(wbits)
    out = bytearray()
    buf = data
    try:
        while buf and not d.eof:
            chunk = d.decompress(buf, budget - len(out) + 1)
            out += chunk
            if len(out) > budget:
                raise ValueError(
                    f"{what} exceeds {budget}-byte inflate budget"
                )
            nxt = d.unconsumed_tail
            if not chunk and nxt == buf:
                break  # defensive: no progress, stop rather than spin
            buf = nxt
    except zlib.error as e:
        raise ValueError(f"bad {what} stream: {e}") from e
    if not d.eof:
        raise ValueError(f"{what} stream incomplete or truncated")
    return bytes(out)


__all__ = ["bounded_inflate"]
