"""Stdlib+numpy GIF codec (GIF87a/89a, CompuServe spec): first-frame
decode with global/local color tables, LZW decompression (variable
code width, clear/EOI, deferred-clear tolerance), and the 4-pass
interlace layout — plus an LZW encoder so fixtures round-trip with no
binary assets.

GIF joins baseline PNG (multimodal._png_decode) and baseline JPEG
(operators/jpeg.py) as the third codec-free image family: the classic
web-crawl image set (GIF/PNG/JPEG) now decodes without PIL, so header
routing, dHash perceptual dedup, and decode_image_meta cover it for
real. Animated GIFs decode their FIRST frame (the curation-relevant
one: dims, palette, perceptual hash); the frame count is surfaced by
the header pass, and full animation decode routes through PIL when
present, same contract as non-baseline JPEG.

Reference parity note: the reference system (ykursadkaya/Clustering)
has no image surface; this module belongs to the LLM-pipeline
multimodal extension (SURVEY.md "beyond the reference" set).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")

# decompression-bomb guard, same budget as jpeg.MAX_DECODE_PIXELS
MAX_DECODE_PIXELS = 64 * 1024 * 1024


class _SubBlockReader:
    """Concatenate GIF data sub-blocks (length-prefixed, 0-terminated)."""

    def __init__(self, b: bytes, pos: int):
        chunks = []
        while True:
            if pos >= len(b):
                raise ValueError("GIF sub-blocks run past end of file")
            n = b[pos]
            pos += 1
            if n == 0:
                break
            chunks.append(b[pos : pos + n])
            if len(chunks[-1]) < n:
                raise ValueError("truncated GIF sub-block")
            pos += n
        self.data = b"".join(chunks)
        self.end = pos


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF-variant LZW: LSB-first bit packing, variable width from
    min_code_size+1 up to 12 bits, CLEAR resets the table, EOI ends the
    stream. A full table with no CLEAR (deferred clear) keeps decoding
    without adding entries, as real-world encoders require."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"LZW minimum code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    # table: list of byte sequences; reset state
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev: int | None = None

    # streaming LSB-first bit accumulator: O(1) per code. (A whole-
    # stream int.from_bytes + shift would be O(stream) PER CODE —
    # quadratic on megabyte LZW streams.)
    acc = 0
    accbits = 0
    bytepos = 0
    n = len(data)
    while True:
        while accbits < code_size and bytepos < n:
            acc |= data[bytepos] << accbits
            accbits += 8
            bytepos += 1
        if accbits < code_size:
            break
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        accbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW code before table entry exists")
            out += table[code]
            prev = code
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = table[prev] + table[prev][:1]  # the cScSc case
        else:
            raise ValueError("LZW code beyond table")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("LZW output exceeds pixel budget")
        if len(table) < 4096:
            table.append(table[prev] + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = code
    # bitstream exhausted without EOI: tolerate (some writers omit it)
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW encoder, width-synchronized with _lzw_decode
    (encoder bumps width when the just-added entry's code reaches
    1 << code_size; emits CLEAR and resets when the table fills)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int):
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, code_size = fresh()
    emit(clear, code_size)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wk] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table, next_code, code_size = fresh()
        w = bytes([k])
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def gif_meta(b: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) from the block walk alone — no LZW
    decode (frame payloads are skipped sub-block-wise). The header-pass
    twin of _jpeg_dims: frame COUNT is the animated-vs-still routing
    signal."""
    if b[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    if len(b) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, _bg, _aspect = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    if packed & 0x80:  # global color table
        pos += 3 * (2 << (packed & 0x07))
    frames = 0
    while pos < len(b):
        block = b[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos = _SubBlockReader(b, pos + 2).end
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(b):
                raise ValueError("truncated image descriptor")
            ipacked = b[pos + 9]
            pos += 10
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            pos += 1  # LZW min code size
            pos = _SubBlockReader(b, pos).end
            frames += 1
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if frames == 0:
        raise ValueError("GIF has no image frames")
    return w, h, frames


def decode_gif(b: bytes):
    """Decode the FIRST frame of a GIF to ``(width, height, 3,
    samples)`` — row-major RGB uint8 bytes of the full logical screen
    (the frame is composited at its left/top offset onto the
    background-color canvas). Raises ValueError on malformed streams,
    matching jpeg.decode_baseline's contract."""
    if b[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    if len(b) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, bg_idx, _aspect = struct.unpack("<HHBBB", b[6:13])
    if sw == 0 or sh == 0:
        raise ValueError("zero-size GIF logical screen")
    if sw * sh > MAX_DECODE_PIXELS:
        raise ValueError("GIF exceeds decode pixel budget")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8)
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    while pos < len(b):
        block = b[pos]
        if block == 0x3B:
            break
        if block == 0x21:
            pos = _SubBlockReader(b, pos + 2).end
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 10 > len(b):
            raise ValueError("truncated image descriptor")
        left, top, fw, fh, ipacked = struct.unpack(
            "<HHHHB", b[pos + 1 : pos + 10]
        )
        pos += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8)
            if len(ct) < 3 * n:
                raise ValueError("truncated local color table")
            ct = ct.reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame has no color table")
        if fw == 0 or fh == 0 or fw * fh > MAX_DECODE_PIXELS:
            raise ValueError("degenerate GIF frame dims")
        min_code = b[pos]
        sb = _SubBlockReader(b, pos + 1)
        pixels = _lzw_decode(sb.data, min_code, fw * fh)
        if len(pixels) < fw * fh:
            raise ValueError(
                f"LZW underrun: {len(pixels)} of {fw * fh} pixels"
            )
        idx = np.frombuffer(
            bytes(pixels[: fw * fh]), dtype=np.uint8
        ).reshape(fh, fw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max()) >= len(ct):
            raise ValueError("GIF pixel index beyond color table")
        canvas_idx = np.full(
            (sh, sw), min(bg_idx, len(ct) - 1), dtype=np.uint8
        )
        y1, x1 = min(top + fh, sh), min(left + fw, sw)
        canvas_idx[top:y1, left:x1] = idx[: y1 - top, : x1 - left]
        rgb = ct[canvas_idx]
        return sw, sh, 3, rgb.tobytes()
    raise ValueError("GIF has no image frames")


def gif_frames(b: bytes, max_frames: int | None = None):
    """Iterate an animated GIF's frames: yields ``(frame_idx,
    delay_centiseconds, rgb_bytes)`` where ``rgb_bytes`` is the FULL
    logical-screen canvas after compositing the frame — Graphic
    Control Extension semantics honored (transparent pixels preserve
    the underlying canvas; disposal 2 restores the background after
    the frame shows; disposal 3 restores the pre-frame canvas).
    ``max_frames`` caps the fan-out like avi_frame_sample. Raises
    ValueError on malformed streams; a truncated tail stops after the
    last complete frame (the AVI/WARC salvage contract)."""
    if b[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    if len(b) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, bg_idx, _aspect = struct.unpack("<HHBBB", b[6:13])
    if sw == 0 or sh == 0 or sw * sh > MAX_DECODE_PIXELS:
        raise ValueError("bad GIF logical screen")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8)
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    bg_rgb = (
        gct[min(bg_idx, len(gct) - 1)]
        if gct is not None
        else np.zeros(3, np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    gce = None  # (disposal, delay_cs, transparent_idx)
    idx = 0
    while pos < len(b):
        block = b[pos]
        if block == 0x3B:
            return
        if block == 0x21:
            label = b[pos + 1] if pos + 1 < len(b) else None
            try:
                sb = _SubBlockReader(b, pos + 2)
            except ValueError:
                return  # truncated extension: salvage complete frames
            if label == 0xF9 and len(sb.data) >= 4:
                p, d_lo, d_hi, t_idx = sb.data[:4]
                gce = ((p >> 2) & 0x07, d_lo | (d_hi << 8),
                       t_idx if p & 1 else None)
            pos = sb.end
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 10 > len(b):
            return
        left, top, fw, fh, ipacked = struct.unpack(
            "<HHHHB", b[pos + 1 : pos + 10]
        )
        pos += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8)
            if len(ct) < 3 * n:
                return
            ct = ct.reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame has no color table")
        if fw == 0 or fh == 0 or fw * fh > MAX_DECODE_PIXELS:
            raise ValueError("degenerate GIF frame dims")
        min_code = b[pos]
        try:
            sb = _SubBlockReader(b, pos + 1)
            pixels = _lzw_decode(sb.data, min_code, fw * fh)
        except ValueError:
            return  # truncated frame: earlier frames already yielded
        if len(pixels) < fw * fh:
            return
        pos = sb.end
        pidx = np.frombuffer(
            bytes(pixels[: fw * fh]), dtype=np.uint8
        ).reshape(fh, fw)
        if ipacked & 0x40:
            pidx = _deinterlace(pidx)
        if int(pidx.max()) >= len(ct):
            raise ValueError("GIF pixel index beyond color table")
        disposal, delay_cs, t_idx = gce if gce else (0, 0, None)
        y1, x1 = min(top + fh, sh), min(left + fw, sw)
        sub = pidx[: y1 - top, : x1 - left]
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top:y1, left:x1]
        rgb = ct[sub]
        if t_idx is not None:
            opaque = sub != t_idx
            region[opaque] = rgb[opaque]
        else:
            region[...] = rgb
        yield idx, delay_cs, canvas.tobytes()
        if disposal == 2:
            canvas[top:y1, left:x1] = bg_rgb
        elif disposal == 3:
            canvas = saved
        gce = None
        idx += 1
        if max_frames is not None and idx >= max_frames:
            return


def encode_gif_animation(
    frames,
    delays_cs=10,
    transparent_index: int | None = None,
    disposal: int = 0,
) -> bytes:
    """Multi-frame GIF89a fixture: each element of ``frames`` is an
    (H, W) uint8 index array over the 256-level gray palette, drawn
    full-canvas. ``delays_cs`` is one int or a per-frame list;
    ``transparent_index``/``disposal`` apply to every frame's GCE.
    Exists so gif_frames' compositing rules are pinned without binary
    assets."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    if isinstance(delays_cs, int):
        delays_cs = [delays_cs] * len(frames)
    palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)
    out += palette.tobytes()
    for f, delay in zip(frames, delays_cs):
        if f.shape != (h, w):
            raise ValueError("all frames must share the canvas size")
        packed = (disposal & 0x07) << 2
        t_idx = 0
        if transparent_index is not None:
            packed |= 1
            t_idx = transparent_index
        out += bytes([0x21, 0xF9, 4, packed, delay & 0xFF,
                      (delay >> 8) & 0xFF, t_idx, 0])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        lzw = _lzw_encode(f.tobytes(), 8)
        out.append(8)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def encode_gif(
    arr: np.ndarray, interlace: bool = False, version: bytes = b"GIF89a"
) -> bytes:
    """Encode an ``(H, W)`` gray or ``(H, W, 3)`` RGB uint8 array as a
    single-frame GIF (real LZW, optional interlace). RGB input must
    use <= 256 distinct colors (GIF is palettized — quantization is a
    separate concern); gray input maps straight onto a 256-level
    palette."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        indices = arr
    elif arr.ndim == 3 and arr.shape[2] == 3:
        flat = arr.reshape(-1, 3)
        palette, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise ValueError(
                f"{len(palette)} distinct colors; GIF allows 256"
            )
        indices = inverse.astype(np.uint8).reshape(arr.shape[:2])
    else:
        raise ValueError("expected (H,W) gray or (H,W,3) RGB uint8 array")
    h, w = indices.shape
    # pad palette to a power-of-two size >= 2
    size_exp = max(1, int(len(palette) - 1).bit_length())
    padded = np.zeros((2 << (size_exp - 1), 3), dtype=np.uint8)
    padded[: len(palette)] = palette
    min_code = max(2, size_exp)

    if interlace:
        order = np.concatenate(
            [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
        )
        stream = indices[order].tobytes()
    else:
        stream = indices.tobytes()
    lzw = _lzw_encode(stream, min_code)

    out = bytearray()
    out += version
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_exp - 1), 0, 0)
    out += padded.tobytes()
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(min_code)
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # sub-block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


__all__ = ["GIF_MAGICS", "gif_meta", "decode_gif", "encode_gif"]
