"""Stdlib+numpy BMP codec (Windows DIB, public layout): decode for
the families a crawl corpus actually contains — BITMAPINFOHEADER (and
the V4/V5 supersets) with 1/4/8-bit palette, 16-bit (555/565 via
bitfields), 24-bit BGR and 32-bit BGRA rows, bottom-up and top-down,
plus RLE8/RLE4 run-length compression — and an encoder so round-trips
pin the decoder with no binary assets.

BMP joins PNG/JPEG/GIF as the fourth codec-free image family: it is
the format header passes most often route as "legacy uncompressed",
and decoding it is table lookups and row flips — exactly the kind of
capability that should never hide behind a PIL gate.

Reference parity note: the reference system (ykursadkaya/Clustering)
has no image surface; this module belongs to the LLM-pipeline
multimodal extension (SURVEY.md "beyond the reference" set).
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"

# same decompression-bomb budget as the JPEG/GIF codecs
MAX_DECODE_PIXELS = 64 * 1024 * 1024

# the DIB header sizes Windows ever shipped — the sniff discriminator
_DIB_SIZES = (12, 40, 52, 56, 64, 108, 124)


def looks_like_bmp(b: bytes) -> bool:
    """Mixed-corpus sniff: 'BM' is only TWO bytes, so text starting
    with 'BM' (a sentence about BMWs) would false-positive on magic
    alone and surface as 'corrupt' instead of 'unknown'. Require a
    known DIB header size at offset 14 — the discriminator real BMP
    routers use."""
    return (
        len(b) >= 18
        and b[:2] == BMP_MAGIC
        and struct.unpack("<I", b[14:18])[0] in _DIB_SIZES
    )


def bmp_meta(b: bytes) -> tuple[int, int, int, int]:
    """(width, height, bits_per_pixel, compression) from the DIB
    header alone — the header-pass twin of _jpeg_dims/gif_meta.
    Height is returned as its magnitude (top-down BMPs store it
    negative). Raises ValueError on malformed headers."""
    if b[:2] != BMP_MAGIC:
        raise ValueError("not a BMP")
    if len(b) < 26:
        raise ValueError("truncated BMP header")
    (hdr_size,) = struct.unpack("<I", b[14:18])
    if hdr_size == 12:  # BITMAPCOREHEADER: 16-bit dims, no compression
        w, h, _planes, bpp = struct.unpack("<HHHH", b[18:26])
        return w, h, bpp, 0
    if len(b) < 34:
        raise ValueError("truncated BMP info header")
    w, h, _planes, bpp, comp = struct.unpack("<iiHHI", b[18:34])
    return w, abs(h), bpp, comp


def _decode_rle(data: bytes, w: int, h: int, four_bit: bool) -> np.ndarray:
    """RLE8/RLE4 decompression (the public BI_RLE layouts) into an
    (h, w) index array, rows in FILE order (bottom-up handled by the
    caller)."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    pos = 0
    n = len(data)
    while pos + 1 < n:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run
            if y >= h:
                raise ValueError("RLE run outside bitmap")
            end = min(x + cnt, w)
            if four_bit:
                pair = np.array([val >> 4, val & 0x0F], dtype=np.uint8)
                out[y, x:end] = np.tile(pair, (cnt + 1) // 2)[: end - x]
            else:
                out[y, x:end] = val
            x = end
            continue
        # cnt == 0: escape
        if val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return out
        elif val == 2:  # delta
            if pos + 1 >= n:
                raise ValueError("truncated RLE delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode: val literal pixels
            if y >= h:
                raise ValueError("RLE absolute run outside bitmap")
            if four_bit:
                nbytes = (val + 1) // 2
                lits = data[pos : pos + nbytes]
                if len(lits) < nbytes:
                    raise ValueError("truncated RLE literals")
                arr = np.frombuffer(lits, dtype=np.uint8)
                nib = np.empty(nbytes * 2, dtype=np.uint8)
                nib[0::2] = arr >> 4
                nib[1::2] = arr & 0x0F
                px = nib[:val]
                pos += nbytes + (nbytes & 1)  # word-aligned
            else:
                px = np.frombuffer(data[pos : pos + val], dtype=np.uint8)
                if len(px) < val:
                    raise ValueError("truncated RLE literals")
                pos += val + (val & 1)  # word-aligned
            end = min(x + val, w)
            out[y, x:end] = px[: end - x]
            x = end
    return out


def decode_bmp(b: bytes):
    """Decode a BMP. Returns ``(width, height, channels, samples)``
    row-major top-down uint8 — graymap when the palette is grayscale,
    RGB otherwise (alpha dropped from 32-bit) — matching
    jpeg.decode_baseline's contract. Raises ValueError on malformed
    streams and NotImplementedError for compressions outside
    BI_RGB/BI_RLE8/BI_RLE4/BI_BITFIELDS(16-bit)."""
    if b[:2] != BMP_MAGIC:
        raise ValueError("not a BMP")
    if len(b) < 34:
        raise ValueError("truncated BMP header")
    (data_off,) = struct.unpack("<I", b[10:14])
    (hdr_size,) = struct.unpack("<I", b[14:18])
    if hdr_size < 40:
        raise NotImplementedError(
            f"BMP header size {hdr_size} (CORE/OS2) not supported"
        )
    w, h_signed, _planes, bpp, comp = struct.unpack("<iiHHI", b[18:34])
    top_down = h_signed < 0
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    if w * h > MAX_DECODE_PIXELS:
        raise ValueError("BMP exceeds decode pixel budget")
    (n_colors,) = struct.unpack("<I", b[46:50]) if len(b) >= 50 else (0,)

    palette = None
    if bpp <= 8:
        n_pal = n_colors or (1 << bpp)
        pal_off = 14 + hdr_size
        raw = np.frombuffer(
            b[pal_off : pal_off + 4 * n_pal], dtype=np.uint8
        )
        if len(raw) < 4 * n_pal:
            raise ValueError("truncated BMP palette")
        palette = raw.reshape(n_pal, 4)[:, [2, 1, 0]]  # BGRA -> RGB

    if comp == 0:  # BI_RGB
        row_bytes = ((w * bpp + 31) // 32) * 4
        need = row_bytes * h
        data = b[data_off : data_off + need]
        if len(data) < need:
            raise ValueError("BMP pixel data truncated")
        rows = np.frombuffer(data, dtype=np.uint8).reshape(h, row_bytes)
        if bpp == 24:
            px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
            out = px
        elif bpp == 32:
            px = rows[:, : w * 4].reshape(h, w, 4)
            out = px[:, :, [2, 1, 0]]
        elif bpp == 8:
            out = palette[np.minimum(rows[:, :w], len(palette) - 1)]
        elif bpp == 4:
            nib = np.empty((h, row_bytes * 2), dtype=np.uint8)
            nib[:, 0::2] = rows >> 4
            nib[:, 1::2] = rows & 0x0F
            out = palette[np.minimum(nib[:, :w], len(palette) - 1)]
        elif bpp == 1:
            bits = np.unpackbits(rows, axis=1)
            out = palette[np.minimum(bits[:, :w], len(palette) - 1)]
        else:
            raise NotImplementedError(f"{bpp}-bit BI_RGB BMP")
    elif comp in (1, 2):  # BI_RLE8 / BI_RLE4
        if (comp == 1 and bpp != 8) or (comp == 2 and bpp != 4):
            raise ValueError("RLE compression/bpp mismatch")
        idx = _decode_rle(b[data_off:], w, h, four_bit=(comp == 2))
        out = palette[np.minimum(idx, len(palette) - 1)]
    elif comp == 3 and bpp == 16:  # BI_BITFIELDS
        masks = struct.unpack("<III", b[54:66]) if len(b) >= 66 else None
        if masks is None:
            raise ValueError("truncated BITFIELDS masks")
        row_bytes = ((w * 16 + 31) // 32) * 4
        need = row_bytes * h
        data = b[data_off : data_off + need]
        if len(data) < need:
            raise ValueError("BMP pixel data truncated")
        rows = np.frombuffer(data, dtype=np.uint8).reshape(h, row_bytes)
        vals = rows[:, : w * 2].reshape(h, w, 2)
        v = vals[:, :, 0].astype(np.uint32) | (
            vals[:, :, 1].astype(np.uint32) << 8
        )
        chans = []
        for m in masks:
            if m == 0:
                raise ValueError("zero BITFIELDS mask")
            shift = (m & -m).bit_length() - 1
            width_bits = int(m >> shift).bit_length()
            c = (v & m) >> shift
            # scale to 8 bits
            c = (c * 255) // ((1 << width_bits) - 1)
            chans.append(c.astype(np.uint8))
        out = np.stack(chans, axis=-1)
    else:
        raise NotImplementedError(
            f"BMP compression {comp} at {bpp} bpp not supported "
            "(BI_RGB, BI_RLE8, BI_RLE4, 16-bit BI_BITFIELDS are)"
        )

    if not top_down:  # file rows are bottom-up (RLE included)
        out = out[::-1]

    # grayscale palette (or equal channels) collapses to a graymap,
    # matching the PNG/JPEG contract of "1 channel when it IS gray"
    if out.ndim == 3 and out.shape[2] == 3 and bpp <= 8:
        if (out[:, :, 0] == out[:, :, 1]).all() and (
            out[:, :, 1] == out[:, :, 2]
        ).all():
            return w, h, 1, np.ascontiguousarray(out[:, :, 0]).tobytes()
    return w, h, 3, np.ascontiguousarray(out).tobytes()


def encode_bmp(
    arr: np.ndarray,
    bpp: int = 24,
    top_down: bool = False,
    rle: bool = False,
) -> bytes:
    """Deterministic BMP fixture: (H, W) gray (palette forms) or
    (H, W, 3) RGB (24/32-bit forms). ``rle=True`` emits BI_RLE8 from
    an 8-bit gray array (simple per-row run coding — decoder-spec
    compliant, not size-optimal)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if rle:
        if arr.ndim != 2:
            raise ValueError("RLE fixture takes an (H, W) index array")
        h, w = arr.shape
        payload = bytearray()
        for row in arr[::-1]:  # bottom-up file order
            x = 0
            while x < w:
                run = 1
                while x + run < w and row[x + run] == row[x] and run < 255:
                    run += 1
                payload += bytes([run, int(row[x])])
                x += run
            payload += b"\x00\x00"  # end of line
        payload += b"\x00\x01"  # end of bitmap
        palette = bytes(
            b for i in range(256) for b in (i, i, i, 0)
        )
        data_off = 14 + 40 + len(palette)
        hdr = BMP_MAGIC + struct.pack(
            "<IHHI", data_off + len(payload), 0, 0, data_off
        )
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(payload), 0, 0, 256, 0
        )
        return hdr + info + palette + bytes(payload)

    if arr.ndim == 2:
        h, w = arr.shape
        if bpp != 8:
            raise ValueError("gray fixtures use bpp=8")
        row_bytes = ((w * 8 + 31) // 32) * 4
        rows = np.zeros((h, row_bytes), dtype=np.uint8)
        rows[:, :w] = arr
        if not top_down:
            rows = rows[::-1]
        palette = bytes(b for i in range(256) for b in (i, i, i, 0))
        data_off = 14 + 40 + len(palette)
        payload = rows.tobytes()
        hdr = BMP_MAGIC + struct.pack(
            "<IHHI", data_off + len(payload), 0, 0, data_off
        )
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h if not top_down else -h, 1, 8,
            0, len(payload), 0, 0, 256, 0,
        )
        return hdr + info + palette + payload

    if arr.ndim == 3 and arr.shape[2] == 3:
        h, w = arr.shape[:2]
        if bpp == 24:
            row_bytes = ((w * 24 + 31) // 32) * 4
            rows = np.zeros((h, row_bytes), dtype=np.uint8)
            rows[:, : w * 3] = arr[:, :, ::-1].reshape(h, w * 3)
        elif bpp == 32:
            row_bytes = w * 4
            rows = np.zeros((h, row_bytes), dtype=np.uint8)
            px = np.zeros((h, w, 4), dtype=np.uint8)
            px[:, :, :3] = arr[:, :, ::-1]
            px[:, :, 3] = 255
            rows[:, :] = px.reshape(h, w * 4)
        else:
            raise ValueError("RGB fixtures use bpp=24 or 32")
        if not top_down:
            rows = rows[::-1]
        data_off = 14 + 40
        payload = rows.tobytes()
        hdr = BMP_MAGIC + struct.pack(
            "<IHHI", data_off + len(payload), 0, 0, data_off
        )
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h if not top_down else -h, 1, bpp,
            0, len(payload), 0, 0, 0, 0,
        )
        return hdr + info + payload

    raise ValueError("expected (H,W) gray or (H,W,3) RGB uint8 array")


__all__ = ["BMP_MAGIC", "bmp_meta", "decode_bmp", "encode_bmp"]
