"""Complete stdlib+numpy PNG decode (public PNG spec, RFC 2083 /
ISO 15948): every legal bit depth (1/2/4/8/16) and color type
(gray / RGB / palette / gray+alpha / RGBA), all five row filters,
and Adam7 interlacing — superseding the baseline-only `_png_decode`
gate in multimodal.py (which now delegates here). Conventions for
the 8-bit output contract shared with the JPEG/GIF/BMP/TIFF
decoders:

- sub-byte grayscale scales to full 8-bit range (v * 255 / (2^d-1));
- palette images resolve through PLTE to RGB (tRNS transparency is
  metadata for compositors, not curation — it is ignored, stated
  here);
- 16-bit samples keep the HIGH byte (the standard thumbnail/feature
  reduction; exact 16-bit fidelity is a renderer concern).

Pure-Python unfiltering is fixture/contract speed (same posture as
the JPEG/GIF entropy decoders — PIL routes production decode when
present); everything after unfiltering is vectorized numpy.

The reference system (ykursadkaya/Clustering) has no image surface;
this module belongs to the LLM-pipeline multimodal extension
(SURVEY.md "beyond the reference" set).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from clustering_spark.operators.inflate import bounded_inflate

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_VALID_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}
# Adam7 pass grid: (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

MAX_DECODE_PIXELS = 64 * 1024 * 1024


def _unfilter(raw: bytes, rpos: int, h: int, stride: int, fo: int):
    """Undo PNG row filters for ``h`` rows of ``stride`` bytes at
    ``rpos`` (each prefixed by its filter-type byte); ``fo`` is the
    left-neighbor byte offset (bytes per pixel, min 1). Returns
    (bytes, next_rpos)."""
    out = bytearray()
    prev = bytearray(stride)
    for _ in range(h):
        if rpos >= len(raw):
            raise ValueError("PNG image data truncated")
        ft = raw[rpos]
        row = bytearray(raw[rpos + 1 : rpos + 1 + stride])
        if len(row) < stride:
            raise ValueError("PNG image data truncated")
        rpos += 1 + stride
        if ft == 1:  # Sub
            for i in range(fo, stride):
                row[i] = (row[i] + row[i - fo]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = row[i - fo] if i >= fo else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - fo] if i >= fo else 0
                up = prev[i]
                c = prev[i - fo] if i >= fo else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = (
                    a if (pa <= pb and pa <= pc)
                    else (up if pb <= pc else c)
                )
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        out += row
        prev = row
    return bytes(out), rpos


def _rows_to_samples(
    rows: bytes, h: int, w: int, ch: int, depth: int
) -> np.ndarray:
    """(h, w, ch) uint8 array from unfiltered rows at any depth
    (sub-byte unpacked MSB-first; 16-bit keeps the high byte;
    sub-byte GRAY scaling happens in the caller — palette indices
    must stay raw)."""
    stride = (w * ch * depth + 7) // 8
    arr = np.frombuffer(rows, dtype=np.uint8).reshape(h, stride)
    if depth == 8:
        return arr[:, : w * ch].reshape(h, w, ch)
    if depth == 16:
        return arr[:, : w * ch * 2].reshape(h, w * ch, 2)[
            :, :, 0
        ].reshape(h, w, ch)
    bits = np.unpackbits(arr, axis=1)
    vals = np.zeros((h, stride * 8 // depth), dtype=np.uint8)
    for k in range(depth):
        vals = (vals << 1) | bits[:, k::depth][:, : vals.shape[1]]
    return vals[:, : w * ch].reshape(h, w, ch)


def decode_png(b: bytes) -> tuple[int, int, int, bytes]:
    """Decode any legal PNG. Returns ``(width, height, channels,
    samples)`` row-major top-down uint8 — the shared image-decoder
    contract. Raises ValueError on malformed streams."""
    if b[: len(PNG_MAGIC)] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, ihdr, plte = len(PNG_MAGIC), None, None
    idat = bytearray()
    while pos + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + clen]
        pos += 12 + clen  # len + type + data + crc
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    if color not in _CHANNELS or depth not in _VALID_DEPTHS[color]:
        raise ValueError(f"illegal PNG depth {depth}/color {color}")
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError("illegal PNG compression/filter/interlace")
    if w == 0 or h == 0:
        raise ValueError("bad PNG dimensions")
    if w * h > MAX_DECODE_PIXELS:
        raise ValueError("PNG exceeds decode pixel budget")
    ch = _CHANNELS[color]
    fo = max(1, depth * ch // 8)
    # the exact inflated size is known from the geometry — h filtered
    # rows of (stride + 1 filter byte), summed per pass under Adam7 —
    # so inflation is bounded BEFORE allocation (a 1x1 IHDR riding a
    # 200 MB-inflating IDAT is a bomb, not an image). The budget
    # carries a SMALL slack above the geometric count — libpng
    # tolerates modest trailing surplus with a warning, and sloppy
    # real-world encoders do emit a few extra bytes — but a stream
    # inflating past geometry+slack is a bomb, not slack, and still
    # raises; only the first `expected` bytes ever reach the
    # unfilter, so surplus can't change the image
    if interlace == 0:
        expected = h * ((w * ch * depth + 7) // 8 + 1)
    else:
        expected = sum(
            ph * ((pw * ch * depth + 7) // 8 + 1)
            for x0, y0, dx, dy in _ADAM7
            if (pw := (w - x0 + dx - 1) // dx) > 0
            and (ph := (h - y0 + dy - 1) // dy) > 0
        )
    slack = 64 + (expected >> 8)
    raw = bounded_inflate(
        bytes(idat), expected + slack, "PNG IDAT"
    )[:expected]

    img = np.zeros((h, w, ch), dtype=np.uint8)
    rpos = 0
    if interlace == 0:
        stride = (w * ch * depth + 7) // 8
        rows, rpos = _unfilter(raw, 0, h, stride, fo)
        img = _rows_to_samples(rows, h, w, ch, depth)
    else:
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass carries no bytes, per spec
            stride = (pw * ch * depth + 7) // 8
            rows, rpos = _unfilter(raw, rpos, ph, stride, fo)
            img[y0::dy, x0::dx] = _rows_to_samples(
                rows, ph, pw, ch, depth
            )

    if color == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG missing/odd PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if pal.shape[0] == 0:
            raise ValueError("empty PLTE")
        rgb = pal[np.minimum(img[:, :, 0], pal.shape[0] - 1)]
        return w, h, 3, np.ascontiguousarray(rgb).tobytes()
    if color == 0 and depth < 8:
        scale = 255 // ((1 << depth) - 1)
        img = (img * scale).astype(np.uint8)
    return w, h, ch, np.ascontiguousarray(img).tobytes()


# ------------------------------------------------------------ fixtures


def _filter_rows(
    pixels: np.ndarray, depth: int, ch: int, filter_type: int
) -> bytes:
    """Pack (ph, pw, ch) uint8 pixel values at ``depth`` into
    filtered rows (one filter byte + filtered data per row)."""
    ph, pw = pixels.shape[:2]
    if depth == 8:
        rows = pixels.reshape(ph, pw * ch)
    elif depth == 16:
        # v -> v * 257 (0xAB -> 0xABAB): the high byte round-trips
        # exactly; big-endian pairs built explicitly
        wide = pixels.reshape(ph, pw * ch).astype(np.uint16) * 257
        rows = np.empty((ph, pw * ch * 2), dtype=np.uint8)
        rows[:, 0::2] = (wide >> 8).astype(np.uint8)
        rows[:, 1::2] = (wide & 0xFF).astype(np.uint8)
    else:
        vals = pixels.reshape(ph, pw * ch)
        bits = np.zeros((ph, pw * ch * depth), dtype=np.uint8)
        for k in range(depth):
            bits[:, k::depth] = (vals >> (depth - 1 - k)) & 1
        pad = (-bits.shape[1]) % 8
        if pad:
            bits = np.pad(bits, ((0, 0), (0, pad)))
        rows = np.packbits(bits, axis=1)
    stride = rows.shape[1]
    fo = max(1, depth * ch // 8)
    out = bytearray()
    prev = bytes(stride)
    for r in range(ph):
        row = bytes(rows[r])
        enc = bytearray(row)
        if filter_type == 1:
            for i in range(stride - 1, fo - 1, -1):
                enc[i] = (row[i] - row[i - fo]) & 0xFF
        elif filter_type == 2:
            for i in range(stride):
                enc[i] = (row[i] - prev[i]) & 0xFF
        elif filter_type == 3:
            for i in range(stride):
                left = row[i - fo] if i >= fo else 0
                enc[i] = (row[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif filter_type == 4:
            for i in range(stride):
                a = row[i - fo] if i >= fo else 0
                up = prev[i]
                c = prev[i - fo] if i >= fo else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = (
                    a if (pa <= pb and pa <= pc)
                    else (up if pb <= pc else c)
                )
                enc[i] = (row[i] - pred) & 0xFF
        elif filter_type != 0:
            raise ValueError(f"unsupported filter {filter_type}")
        out.append(filter_type)
        out += enc
        prev = row
    return bytes(out)


def encode_png(
    arr: np.ndarray,
    color_type: int = 0,
    depth: int = 8,
    interlace: bool = False,
    filter_type: int = 0,
    palette: np.ndarray | None = None,
) -> bytes:
    """Deterministic PNG fixture for ANY legal depth/color/interlace
    combination: ``arr`` is (H, W) for 1-channel color types (gray or
    palette indices) or (H, W, ch) otherwise, values already in
    [0, 2^depth) for sub-byte forms (8-bit values for depth 16 —
    encoded as v*257). ``palette`` is an (n, 3) uint8 array for
    color type 3."""
    arr = np.asarray(arr, dtype=np.uint8)
    ch = _CHANNELS[color_type]
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.shape[2] != ch:
        raise ValueError(f"color type {color_type} wants {ch} channels")
    h, w = arr.shape[:2]
    raw = bytearray()
    if not interlace:
        raw += _filter_rows(arr, depth, ch, filter_type)
    else:
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            raw += _filter_rows(sub, depth, ch, filter_type)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color_type, 0, 0, int(interlace)
    )
    out = PNG_MAGIC + chunk(b"IHDR", ihdr)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG needs a palette")
        out += chunk(
            b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes()
        )
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


__all__ = ["decode_png", "encode_png", "PNG_MAGIC", "MAX_DECODE_PIXELS"]
