"""Multimodal (image/audio/video) column plumbing for training-data
pipelines (beyond-reference scope).

Media travel as opaque ``binary`` columns with typed metadata; compute
happens in Arrow-batched ``mapInPandas`` stages so bytes never round-
trip row-at-a-time through Python. The heavy codecs (PIL/ffmpeg/...)
are NOT in this container, so the decode step is gated: if a real
decoder import fails, a clearly-marked deterministic FAKE decoder
handles the synthetic ``FAKE`` container format below — the Spark-side
plumbing (schemas, UDF signatures, batch shapes, partitioning) is real
and tested either way.

Synthetic container format (used by fixtures and the fake decoder):
``b"FAKE" + width:uint16-be + height:uint16-be + payload`` where the
payload is width*height bytes (one 8-bit channel). "Video" is a
concatenation of such frames.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FAKE"
HEADER_LEN = 8

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (3 = palette, unsupported without PLTE
# handling; everything else is raw samples)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

try:  # real decoder, if the environment has one
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _png_decode(b: bytes) -> tuple[int, int, int, bytes]:
    """REAL PNG decode on the stdlib+numpy alone — since round 12 the
    FULL spec surface (every depth 1-16, gray/RGB/palette/alpha,
    Adam7 interlace) via operators/png.decode_png; this wrapper keeps
    the historical call sites and name. Returns (width, height,
    channels, raw 8-bit samples, row-major)."""
    from clustering_spark.operators.png import decode_png

    return decode_png(b)


def _png_meta(b: bytes) -> tuple[int, int, float]:
    """(width, height, mean intensity over NON-ALPHA samples)."""
    w, h, ch, samples = _png_decode(b)
    if ch in (2, 4):  # gray+alpha / RGBA: drop the alpha channel
        keep = ch - 1
        total = sum(
            samples[i + c] for i in range(0, len(samples), ch) for c in range(keep)
        )
        n = (len(samples) // ch) * keep
    else:
        total, n = sum(samples), len(samples)
    return w, h, (total / n) if n else 0.0


JPEG_MAGIC = b"\xff\xd8"
# SOF0..SOF15 markers carry frame dimensions, EXCEPT the non-frame
# markers in the same range: DHT (C4), JPG (C8), DAC (CC)
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def _jpeg_dims(b: bytes) -> tuple[int, int, int, int]:
    """(width, height, components, sof_marker) from the SOF0/SOF2/...
    header of a JPEG — a marker-segment walk (ITU-T T.81 B.2.2), no
    entropy decode and no codec. Mirrors what ``identify``/EXIF readers
    do: dimensions are metadata, available natively even where pixel
    decode needs a real codec library. The SOF marker identifies the
    coding process — the router labels baseline-family streams (SOF0/1)
    differently from progressive (SOF2), an encoding-mix statistic a
    curation pipeline wants even though operators/jpeg decodes BOTH
    natively since round 12."""
    if b[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # T.81 B.1.1.2: any number of 0xFF FILL bytes may precede a
        # marker — skip them or the fill byte reads as the marker and
        # the walk jumps to a garbage segment length
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(b):
            break
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI before any SOF
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RST / TEM: bare
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        if marker in _JPEG_SOF:
            _prec, h, w, ncomp = struct.unpack(
                ">BHHB", b[pos + 4 : pos + 10]
            )
            return w, h, ncomp, marker
        if marker == 0xDA:  # SOS: entropy data follows, SOF was missed
            break
        pos += 2 + seglen
    raise ValueError("JPEG missing SOF header")


def _bmp_sniff(b: bytes) -> bool:
    from clustering_spark.operators.bmp import looks_like_bmp

    return looks_like_bmp(b)


_TIFF_MAGICS = (b"II*\x00", b"MM\x00*")


def _tiff_meta(b: bytes) -> tuple[int, int, int]:
    """(width, height, compression_code) from a TIFF's first IFD — a
    pure header walk (the public TIFF 6.0 baseline layout: byte-order
    magic, IFD offset, 12-byte tag entries with inline SHORT/LONG
    values). Dimensions and compression are the routing decision for
    the scanned-document corpora that ship as TIFF; pixel decode
    stays behind the PIL gate (LZW/CCITT/JPEG-in-TIFF need real
    codecs). Raises ValueError on malformed headers."""
    if b[:4] not in _TIFF_MAGICS:
        raise ValueError("not a TIFF")
    bo = "<" if b[:2] == b"II" else ">"
    if len(b) < 8:
        raise ValueError("truncated TIFF header")
    (ifd_off,) = struct.unpack(bo + "I", b[4:8])
    if ifd_off + 2 > len(b):
        raise ValueError("TIFF IFD offset past end of file")
    (n_entries,) = struct.unpack(bo + "H", b[ifd_off : ifd_off + 2])
    w = h = None
    comp = 1  # default: uncompressed
    for i in range(n_entries):
        at = ifd_off + 2 + 12 * i
        entry = b[at : at + 12]
        if len(entry) < 12:
            raise ValueError("truncated TIFF IFD")
        tag, typ, _count = struct.unpack(bo + "HHI", entry[:8])
        if typ == 3:  # SHORT, inline
            (val,) = struct.unpack(bo + "H", entry[8:10])
        elif typ == 4:  # LONG, inline
            (val,) = struct.unpack(bo + "I", entry[8:12])
        else:
            continue
        if tag == 256:
            w = val
        elif tag == 257:
            h = val
        elif tag == 259:
            comp = val
    if w is None or h is None:
        raise ValueError("TIFF IFD lacks ImageWidth/ImageLength")
    return w, h, comp


def make_tiff(width: int, height: int, compression: int = 1,
              big_endian: bool = False) -> bytes:
    """Deterministic header-only TIFF fixture (first IFD with dims +
    compression; no strips) for the header-pass tests."""
    bo = ">" if big_endian else "<"
    magic = b"MM\x00*" if big_endian else b"II*\x00"
    entries = [
        (256, 3, 1, width),
        (257, 3, 1, height),
        (259, 3, 1, compression),
    ]
    out = bytearray(magic + struct.pack(bo + "I", 8))
    out += struct.pack(bo + "H", len(entries))
    for tag, typ, count, val in entries:
        out += struct.pack(bo + "HHI", tag, typ, count)
        out += struct.pack(bo + "H", val) + b"\x00\x00"
    out += struct.pack(bo + "I", 0)  # no next IFD
    return bytes(out)


HEADER_META_SCHEMA = "id long, format string, width int, height int"


def image_header_meta(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Dimensions + container format from HEADERS alone — no pixel
    decode, no codec dependency: FAKE container, PNG (IHDR), JPEG
    (SOF marker walk). The cheap first pass of an image-curation
    pipeline (aspect/size filters, resolution buckets) that must work
    on 100 TB of mixed blobs before any decode stage runs; unknown
    formats surface as format='unknown' with NULL dims rather than
    failing the batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                fmt, w, h = "unknown", None, None
                if blob is None:
                    # NULL blob: degrade per row like any unknown
                    # format — bytes(None) would TypeError the batch
                    out.append(
                        {"id": rid, "format": fmt, "width": w, "height": h}
                    )
                    continue
                b = bytes(blob)
                try:
                    if b[:4] == MAGIC:
                        fmt = "fake"
                        w, h = _parse_header(b)
                    elif b[: len(PNG_MAGIC)] == PNG_MAGIC:
                        fmt = "png"
                        ihdr = b[16:24]  # fixed offset: IHDR is first
                        w, h = struct.unpack(">II", ihdr)
                    elif b[:2] == JPEG_MAGIC:
                        fmt = "jpeg"
                        w, h, _ncomp, sof = _jpeg_dims(b)
                        if sof not in (0xC0, 0xC1):
                            # encoding-mix label; both families decode
                            # natively via operators/jpeg (round 12)
                            fmt = "jpeg-progressive"
                    elif b[:6] in (b"GIF87a", b"GIF89a"):
                        from clustering_spark.operators.gif import gif_meta

                        w, h, n_frames = gif_meta(b)
                        # routing signal mirroring jpeg-progressive:
                        # stills decode natively (first frame IS the
                        # image); animations decode frame-wise via
                        # gif_frame_sample
                        fmt = "gif" if n_frames == 1 else "gif-animated"
                    elif _bmp_sniff(b):
                        from clustering_spark.operators.bmp import bmp_meta

                        fmt = "bmp"
                        w, h, _bpp, _comp = bmp_meta(b)
                    elif b[:4] in _TIFF_MAGICS:
                        fmt = "tiff"
                        w, h, _comp = _tiff_meta(b)
                except (ValueError, struct.error):
                    fmt, w, h = "corrupt", None, None
                out.append({"id": rid, "format": fmt, "width": w, "height": h})
            yield pd.DataFrame(
                out, columns=["id", "format", "width", "height"]
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, HEADER_META_SCHEMA
    )


def media_metadata(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Cheap native metadata — no decode: byte size and a sha256
    content hash (dedup key for exact binary duplicates). Stays
    JVM-side; safe at any scale."""
    return df.select(
        F.col(id_col),
        F.length(F.col(bin_col)).alias("n_bytes"),
        F.sha2(F.col(bin_col), 256).alias("content_sha256"),
    )


def _parse_header(b: bytes) -> tuple[int, int]:
    if b is None or len(b) < HEADER_LEN or b[:4] != MAGIC:
        raise ValueError("not a FAKE container")
    w, h = struct.unpack(">HH", b[4:8])
    return w, h


def _pil_meta(b: bytes) -> tuple[int, int, float]:
    """(width, height, mean_intensity) via PIL — the codec-backed
    branch of decode_image_meta; alpha dropped like _png_meta."""
    import io

    import numpy as np

    img = Image.open(io.BytesIO(b))
    w, h = img.size
    if img.mode not in ("L", "LA", "RGB", "RGBA"):
        # palette ('P'), bilevel ('1'), 16/32-bit ('I;16'/'I'), CMYK,
        # ...: normalize to 8-bit intensity channels FIRST — asarray on
        # a palette image yields raw palette INDICES and on 16-bit
        # images 0-65535 values, so the mean would be a plausible but
        # wrong statistic instead of an 8-bit intensity like _png_meta
        has_alpha = "A" in img.mode or "transparency" in img.info
        img = img.convert("RGBA" if has_alpha else "RGB")
    arr = np.asarray(img, dtype=np.float64)
    if arr.ndim == 3 and arr.shape[2] in (2, 4):
        arr = arr[:, :, :-1]  # drop alpha, like _png_meta
    return w, h, float(arr.mean()) if arr.size else 0.0


def _jpeg_meta(b: bytes) -> tuple[int, int, float]:
    """(width, height, mean_intensity) via the stdlib+numpy baseline
    JPEG decoder (operators/jpeg.decode_baseline) — the codec-free
    twin of _png_meta. Mean is over all channels (JPEG has no alpha)."""
    import numpy as np

    from clustering_spark.operators.jpeg import decode_baseline

    w, h, _ch, samples = decode_baseline(b)
    arr = np.frombuffer(samples, dtype=np.uint8)
    return w, h, float(arr.mean()) if arr.size else 0.0


def _gif_meta(b: bytes) -> tuple[int, int, float]:
    """(width, height, mean_intensity) via the stdlib+numpy GIF
    decoder (operators/gif.decode_gif, first frame) — the third
    codec-free family next to _png_meta and _jpeg_meta."""
    import numpy as np

    from clustering_spark.operators.gif import decode_gif

    w, h, _ch, samples = decode_gif(b)
    arr = np.frombuffer(samples, dtype=np.uint8)
    return w, h, float(arr.mean()) if arr.size else 0.0


def _bmp_meta_decode(b: bytes) -> tuple[int, int, float]:
    """(width, height, mean_intensity) via the stdlib+numpy BMP
    decoder (operators/bmp.decode_bmp) — the fourth codec-free image
    family next to PNG/JPEG/GIF."""
    import numpy as np

    from clustering_spark.operators.bmp import decode_bmp

    w, h, _ch, samples = decode_bmp(b)
    arr = np.frombuffer(samples, dtype=np.uint8)
    return w, h, float(arr.mean()) if arr.size else 0.0


def _tiff_pixel_meta(b: bytes) -> tuple[int, int, float]:
    """(width, height, mean_intensity) via the stdlib+numpy TIFF
    decoder (operators/tiff.decode_tiff) — the fifth codec-free image
    family; CCITT/JPEG-in-TIFF/tiled forms still raise their precise
    NotImplementedError for the PIL fallback to catch."""
    import numpy as np

    from clustering_spark.operators.tiff import decode_tiff

    w, h, _ch, samples = decode_tiff(b)
    arr = np.frombuffer(samples, dtype=np.uint8)
    return w, h, float(arr.mean()) if arr.size else 0.0


IMAGE_META_SCHEMA = "id long, width int, height int, n_pixels long, mean_intensity double"


def decode_image_meta(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Decode + feature-extract per image: (width, height, n_pixels,
    mean intensity). Arrow-batched mapInPandas — one Python roundtrip
    per BATCH of images, not per image.

    Formats, by magic bytes: the synthetic FAKE container (payload
    length validated — a truncated container fails loudly); REAL PNG
    via the stdlib decoder (``_png_decode`` → operators/png — the
    FULL spec surface since round 12: every depth, palette, Adam7
    interlace; no native codec needed); REAL JPEG via the stdlib+numpy decoder
    (``operators/jpeg.decode_baseline`` — baseline AND progressive,
    grayscale/YCbCr, any subsampling, restart markers), with
    lossless/arithmetic raising a precise NotImplementedError; any
    other format through PIL when the environment has it, else
    NotImplementedError (clearly a stub, never silently wrong). NULL
    blobs raise with a pointer to ``image_header_meta`` (the
    degrade-per-row pass).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None:
                    # decode is the STRICT stage: fail loudly with a
                    # clear message, not bytes(None)'s opaque TypeError
                    raise ValueError(
                        f"decode_image_meta: NULL image bytes for id "
                        f"{rid!r} — filter NULL blobs (or route through "
                        "image_header_meta, which degrades per row)"
                    )
                w, h, mean = _decode_meta_one(rid, bytes(blob))
                out.append(
                    {
                        "id": rid,
                        "width": w,
                        "height": h,
                        "n_pixels": w * h,
                        "mean_intensity": float(mean),
                    }
                )
            yield pd.DataFrame(out, columns=["id", "width", "height", "n_pixels", "mean_intensity"])

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, IMAGE_META_SCHEMA
    )


def _decode_meta_one(rid, b: bytes) -> tuple[int, int, float]:
    """The per-blob dispatch of decode_image_meta, module-level so
    tests can pin the PRECEDENCE (which decoder a given magic routes
    to, with and without PIL) driver-side against a stubbed _pil_meta
    — inside mapInPandas the chain runs in a worker subprocess where
    a monkeypatched module is invisible. Reads _HAVE_PIL at call
    time for the same reason."""
    if b[:4] == MAGIC:
        w, h = _parse_header(b)
        if len(b) < HEADER_LEN + w * h:
            # a truncated container must fail loudly like
            # _decode_gray's reshape does — a mean over the partial
            # payload would be silently wrong
            raise ValueError(
                f"FAKE container for id {rid!r} claims {w}x{h} but "
                f"carries only {len(b) - HEADER_LEN} payload bytes"
            )
        payload = b[HEADER_LEN : HEADER_LEN + w * h]
        return w, h, (sum(payload) / len(payload)) if payload else 0.0
    if b[: len(PNG_MAGIC)] == PNG_MAGIC:
        # round 12: the stdlib decoder covers the FULL PNG spec
        # surface (operators/png — every depth, palette, Adam7), so
        # no PIL fallback is needed; malformed PNGs fail loudly
        # (this is the strict stage)
        return _png_meta(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        # stdlib GIF decode (first frame), PIL not needed
        return _gif_meta(b)
    if _bmp_sniff(b):
        return _bmp_meta_decode(b)
    if b[:4] in _TIFF_MAGICS:
        # stdlib decoder for none/LZW/Deflate/PackBits/tiled/planar;
        # the remaining gated forms (old-style JPEG, exotic depths,
        # predictor-2-on-16-bit) fall back to PIL when present
        try:
            return _tiff_pixel_meta(b)
        except NotImplementedError:
            if not _HAVE_PIL:
                raise
            return _pil_meta(b)
    if _HAVE_PIL:
        return _pil_meta(b)
    if b[:2] == JPEG_MAGIC:
        # REAL pixel decode on the stdlib+numpy codec
        # (operators/jpeg, baseline + progressive) — lossless/
        # arithmetic variants still raise NotImplementedError with
        # the precise reason
        return _jpeg_meta(b)
    raise NotImplementedError(
        "no decoder for this image format in this environment; "
        "supported without codecs: the synthetic FAKE container, "
        "baseline 8-bit PNG, baseline sequential JPEG, and GIF"
    )


RESIZE_SCHEMA = "id long, width int, height int, image binary"


def resize_images(
    df: DataFrame, bin_col: str, id_col: str, out_w: int, out_h: int
) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h), Arrow-batched.

    Decodes via the same gate as ``decode_image_meta`` (FAKE
    container, baseline 8-bit PNG, baseline sequential JPEG — stdlib
    + numpy only) and re-emits each image in its ORIGINAL container
    format so resize composes with the other stages (a resized PNG is
    still a PNG; a resized JPEG is re-encoded as baseline JPEG with
    the Annex K tables; a resized FAKE frame still feeds
    ``sample_frames``). Vectorized numpy index-gather per image; the
    batch never leaves the task."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob)
                if b[:4] == MAGIC:
                    w, h = _parse_header(b)
                    arr = np.frombuffer(
                        b[HEADER_LEN : HEADER_LEN + w * h], dtype=np.uint8
                    ).reshape(h, w)[:, :, None]
                    ch = 1
                    fmt = "fake"
                elif b[: len(PNG_MAGIC)] == PNG_MAGIC:
                    w, h, ch, samples = _png_decode(b)
                    arr = np.frombuffer(samples, dtype=np.uint8).reshape(
                        h, w, ch
                    )
                    fmt = "png"
                elif b[:2] == JPEG_MAGIC:
                    from clustering_spark.operators.jpeg import (
                        decode_baseline,
                    )

                    w, h, ch, samples = decode_baseline(b)
                    arr = np.frombuffer(samples, dtype=np.uint8).reshape(
                        h, w, ch
                    )
                    fmt = "jpeg"
                elif b[:4] in _TIFF_MAGICS:
                    from clustering_spark.operators.tiff import decode_tiff

                    w, h, ch, samples = decode_tiff(b)
                    arr = np.frombuffer(samples, dtype=np.uint8).reshape(
                        h, w, ch
                    )
                    fmt = "tiff"
                else:
                    raise NotImplementedError(
                        "resize supports the FAKE container, baseline "
                        "8-bit PNG, baseline sequential JPEG, and TIFF "
                        "(none/LZW/PackBits) in this environment"
                    )
                # nearest-neighbor sample grid (pixel-center rule)
                ys = np.minimum(
                    ((np.arange(out_h) + 0.5) * h / out_h).astype(int), h - 1
                )
                xs = np.minimum(
                    ((np.arange(out_w) + 0.5) * w / out_w).astype(int), w - 1
                )
                resized = arr[ys][:, xs]
                if fmt == "fake":
                    payload = resized[:, :, 0].tobytes()
                    blob_out = (
                        MAGIC + struct.pack(">HH", out_w, out_h) + payload
                    )
                elif fmt == "jpeg":
                    from clustering_spark.operators.jpeg import (
                        encode_baseline,
                    )

                    blob_out = encode_baseline(
                        resized[:, :, 0] if ch == 1 else resized
                    )
                elif fmt == "tiff":
                    from clustering_spark.operators.tiff import encode_tiff

                    blob_out = encode_tiff(
                        resized[:, :, 0] if ch == 1 else resized,
                        compression="lzw",
                        predictor=True,
                    )
                else:
                    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
                    blob_out = make_png(
                        out_w, out_h, resized.tobytes(), color_type
                    )
                out.append(
                    {
                        "id": rid,
                        "width": out_w,
                        "height": out_h,
                        "image": blob_out,
                    }
                )
            yield pd.DataFrame(
                out, columns=["id", "width", "height", "image"]
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, RESIZE_SCHEMA
    )


FRAME_SCHEMA = "id long, frame_idx int, frame binary"


def sample_frames(
    df: DataFrame, bin_col: str, id_col: str, every_n: int = 2
) -> DataFrame:
    """Frame sampling for 'video' blobs: split the payload into frames
    (each its own FAKE container), keep every n-th. One input row fans
    out to ceil(frames / every_n) output rows — mapInPandas because the
    fan-out is data-dependent (an explode over a decoded structure)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None:
                    continue  # NULL blob: no frames, not a crash
                b = bytes(blob)
                pos, idx = 0, 0
                while pos + HEADER_LEN <= len(b) and b[pos : pos + 4] == MAGIC:
                    w, h = struct.unpack(">HH", b[pos + 4 : pos + 8])
                    end = pos + HEADER_LEN + w * h
                    if end > len(b):
                        # truncated tail: the header promises more
                        # payload than remains — emitting the short
                        # frame would crash resize/decode far from the
                        # corrupt source; drop it at the boundary
                        break
                    if idx % every_n == 0:
                        out.append(
                            {"id": rid, "frame_idx": idx, "frame": b[pos:end]}
                        )
                    pos, idx = end, idx + 1
            yield pd.DataFrame(out, columns=["id", "frame_idx", "frame"])

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, FRAME_SCHEMA
    )


def make_fake_image(width: int, height: int, fill: int) -> bytes:
    """Fixture helper: one FAKE container with constant intensity."""
    return MAGIC + struct.pack(">HH", width, height) + bytes([fill]) * (width * height)


def make_png(
    width: int,
    height: int,
    samples: bytes,
    color_type: int = 0,
    filter_type: int = 0,
) -> bytes:
    """Fixture helper: a REAL baseline 8-bit PNG (stdlib-only encode).
    ``samples`` is height*width*channels raw bytes; ``filter_type``
    applies the given PNG filter to every row (exercising the
    decoder's unfilter paths, not just filter 0)."""
    import zlib

    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    assert len(samples) == height * stride
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = samples[r * stride : (r + 1) * stride]
        enc = bytearray(row)
        if filter_type == 1:
            for i in range(stride - 1, ch - 1, -1):
                enc[i] = (row[i] - row[i - ch]) & 0xFF
        elif filter_type == 2:
            for i in range(stride):
                enc[i] = (row[i] - prev[i]) & 0xFF
        elif filter_type == 3:
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                enc[i] = (row[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif filter_type == 4:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                up = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                enc[i] = (row[i] - pred) & 0xFF
        elif filter_type != 0:
            raise ValueError(f"unsupported filter {filter_type}")
        raw.append(filter_type)
        raw += enc
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# ----------------------------------------------------- perceptual hash


def _apply_exif_orientation(gray, o: int):
    """Map stored pixels to the upright view per EXIF Orientation
    1-8 (PIL exif_transpose table: 2 flip-H, 3 rot180, 4 flip-V,
    5 transpose, 6 rotate 90 CW, 7 transverse, 8 rotate 90 CCW)."""
    import numpy as np

    if o == 2:
        return gray[:, ::-1]
    if o == 3:
        return gray[::-1, ::-1]
    if o == 4:
        return gray[::-1, :]
    if o == 5:
        return gray.T
    if o == 6:
        return np.rot90(gray, k=3)
    if o == 7:
        return gray.T[::-1, ::-1]
    if o == 8:
        return np.rot90(gray, k=1)
    return gray


def _decode_gray(b: bytes):
    """(H, W) float64 grayscale array for the codec-free formats (FAKE
    container, baseline 8-bit PNG, JPEG, GIF, BMP, TIFF); raises
    NotImplementedError for formats needing a real codec — the same
    gate as decode_image_meta."""
    import numpy as np

    if b[:4] == MAGIC:
        w, h = _parse_header(b)
        return (
            np.frombuffer(b[HEADER_LEN : HEADER_LEN + w * h], dtype=np.uint8)
            .reshape(h, w)
            .astype(np.float64)
        )
    if (
        b[: len(PNG_MAGIC)] == PNG_MAGIC
        or b[:2] == JPEG_MAGIC
        or b[:6] in (b"GIF87a", b"GIF89a")
        or b[:4] in _TIFF_MAGICS
        or _bmp_sniff(b)
    ):
        exif_o = 1
        if b[:2] == JPEG_MAGIC:
            from clustering_spark.operators.jpeg import (
                decode_baseline,
                exif_orientation,
            )

            w, h, ch, samples = decode_baseline(b)
            exif_o = exif_orientation(b)
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            from clustering_spark.operators.gif import decode_gif

            w, h, ch, samples = decode_gif(b)
        elif b[:4] in _TIFF_MAGICS:
            from clustering_spark.operators.tiff import decode_tiff

            w, h, ch, samples = decode_tiff(b)
        elif _bmp_sniff(b):
            from clustering_spark.operators.bmp import decode_bmp

            w, h, ch, samples = decode_bmp(b)
        else:
            w, h, ch, samples = _png_decode(b)
        arr = np.frombuffer(samples, dtype=np.uint8).reshape(h, w, ch)
        if ch in (2, 4):  # drop alpha (PNG only; JPEG has none)
            arr = arr[:, :, : ch - 1]
        # ITU-R BT.601 luma for color; identity for gray
        if arr.shape[2] == 3:
            gray = (
                0.299 * arr[:, :, 0]
                + 0.587 * arr[:, :, 1]
                + 0.114 * arr[:, :, 2]
            )
        else:
            gray = arr[:, :, 0].astype(np.float64)
        # EXIF orientation normalization (round 13): the same photo
        # shot in portrait STORES rotated — hashing the stored pixels
        # misses the duplicate. Only the perceptual path normalizes;
        # decode_image_meta keeps stored dims (the honest container
        # view). PIL exif_transpose conventions; np.rot90 is CCW.
        return _apply_exif_orientation(gray, exif_o)
    raise NotImplementedError(
        "dhash supports the FAKE container, baseline 8-bit PNG, "
        "baseline/progressive JPEG, GIF, BMP, and TIFF "
        "(none/LZW/PackBits) without codecs"
    )


def _dhash64(gray) -> int:
    """64-bit difference hash (public dHash scheme: resize to 9x8 by
    area-mean pooling, bit j = left pixel brighter than its right
    neighbor). Robust to re-encode / resize / brightness shifts; bit
    distance tracks perceptual distance."""
    import numpy as np

    h, w = gray.shape
    # area-mean resample to 9x8: split rows/cols into (almost) equal
    # bins — deterministic, no interpolation kernel dependency
    ys = (np.arange(9, dtype=np.int64) * h) // 8  # 9 edges over 8 rows
    xs = (np.arange(10, dtype=np.int64) * w) // 9
    ys = np.clip(ys, 0, h)
    xs = np.clip(xs, 0, w)
    small = np.empty((8, 9), dtype=np.float64)
    for r in range(8):
        r0, r1 = ys[r], max(ys[r + 1], ys[r] + 1)
        for c in range(9):
            c0, c1 = xs[c], max(xs[c + 1], xs[c] + 1)
            small[r, c] = gray[r0:r1, c0:c1].mean()
    bits = (small[:, :-1] > small[:, 1:]).reshape(-1)  # 64 bits
    weights = 1 << np.arange(64, dtype=np.uint64)
    return int(
        (bits.astype(np.uint64) * weights).sum(dtype=np.uint64).astype(np.int64)
    )


DHASH_SCHEMA = "id long, dhash long"


def image_dhash(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Per-image 64-bit perceptual dHash, Arrow-batched. The image
    analogue of simhash for text: hamming distance between hashes
    tracks visual similarity, so exact-duplicate AND near-duplicate
    (re-encoded, resized, brightness-shifted) images collide within a
    few bits while the raw bytes (and sha256) differ completely.

    Mixed-corpus contract (same as image_header_meta): blobs without a
    codec-free decoder (lossless/arithmetic JPEG, unknown formats,
    corrupt payloads) get a NULL dhash instead of failing the batch —
    a mixed 100 TB image table must degrade per row. JPEG (baseline
    AND progressive) and GIF decode for real (operators/jpeg,
    operators/gif), so perceptual dedup covers the common web-image
    cases. Pair with image_header_meta to count/route the undecodable
    residue."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                try:
                    # TypeError covers bytes(None): a NULL blob is
                    # undecodable residue, not a batch-killer
                    h = _dhash64(_decode_gray(bytes(blob)))
                except (NotImplementedError, ValueError, struct.error, TypeError):
                    h = None
                ids.append(rid)
                hashes.append(h)
            # nullable Int64, NOT a dict-records DataFrame: mixing None
            # with python ints infers float64, silently truncating any
            # hash whose set-bit span exceeds the 53-bit mantissa before
            # Arrow casts back to long (a few low bits lost — a wrong
            # perceptual hash that still looks plausible)
            yield pd.DataFrame(
                {"id": ids, "dhash": pd.array(hashes, dtype="Int64")}
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, DHASH_SCHEMA
    )


def image_neardup_pairs(
    df: DataFrame, bin_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Perceptual near-duplicate image pairs: dHash signatures + the
    SAME adaptive pigeonhole chunk equi-join and bit_count verify as
    text SimHash (``max_hamming + 1`` chunks guarantee a shared chunk
    for any pair within the radius — dedup.hamming_pair_search, the
    SAME shared block simhash_pairs runs, so a fix to the pair search
    applies to both). Image bytes never leave the scan: only (id,
    8-byte hash) rides the explode and the join. Undecodable blobs
    (NULL dhash from image_dhash) are excluded up front. Returns
    (id_a, id_b, hamming), id_a < id_b."""
    from clustering_spark.operators.dedup import hamming_pair_search

    sigs = (
        image_dhash(df, bin_col, id_col)
        .filter(F.col("dhash").isNotNull())
        .select(F.col("id").alias("__id"), F.col("dhash").alias("sig"))
    )
    return hamming_pair_search(sigs, max_hamming)


# ------------------------------------------------------------- audio


WAV_META_SCHEMA = (
    "id long, format string, n_channels int, sample_rate int, "
    "bits_per_sample int, n_frames long, duration_sec double"
)


def _wav_meta(b: bytes) -> tuple[str, int, int, int, int, float]:
    """Parse a RIFF/WAVE container's fmt + data chunks — headers only,
    no codec: stdlib struct over the chunk walk (the audio analogue of
    the native JPEG SOF parse). Returns (format, channels, rate, bits,
    frames, duration); raises ValueError on malformed containers.

    The chunk walk honors the RIFF spec's WORD alignment (odd-sized
    chunks are followed by a pad byte) and tolerates extra chunks
    (LIST/INFO, fact, cue) in any order. ``format`` names the codec
    family via audio_codec.WAV_FORMAT_NAMES ('wav-pcm', 'wav-float',
    'wav-ulaw', 'wav-alaw', 'wav-ima-adpcm'; WAVE_FORMAT_EXTENSIBLE
    resolves through its SubFormat GUID), else 'wav-other'. For
    block codecs (IMA ADPCM) ``n_frames`` counts real sample frames
    via the fmt chunk's wSamplesPerBlock, not blocks."""
    from clustering_spark.operators.audio_codec import (
        WAV_FORMAT_NAMES,
        _parse_fmt,
    )

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    fmt_code = channels = rate = bits = block_align = None
    samples_per_block = None
    fact_frames = None
    data_size = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (csize,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            fmt_code, channels, rate, block_align, bits = _parse_fmt(body)
            if fmt_code == 0x11 and len(body) >= 20:
                (samples_per_block,) = struct.unpack("<H", body[18:20])
        elif cid == b"fact" and len(body) >= 4:
            # spec-required for non-PCM formats: exact per-channel
            # frame count — the only correct duration for block codecs
            # whose final block is partial
            (fact_frames,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            # header may promise more than the blob carries (truncated
            # upload): measure what is actually present
            data_size = min(csize, len(b) - pos - 8)
        pos += 8 + csize + (csize & 1)  # odd chunks carry a pad byte
    if fmt_code is None or data_size is None:
        raise ValueError("missing fmt or data chunk")
    if channels == 0 or rate == 0 or block_align == 0:
        raise ValueError("degenerate fmt chunk")
    if fmt_code != 1 and fact_frames is not None:
        frames = fact_frames
    else:
        frames = data_size // block_align
        if samples_per_block:  # block codec: blocks x samples/block
            frames *= samples_per_block
    fmt = WAV_FORMAT_NAMES.get(fmt_code, "wav-other")
    return fmt, channels, rate, bits, frames, frames / rate


def audio_header_meta(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Per-blob audio-container header metadata — the cheap first
    pass of audio curation (duration/rate/channel filters,
    sample-rate buckets) that must run over 100 TB of mixed blobs
    before any decode. Covers every audio container the engine
    names: RIFF/WAVE (per-codec fmt walk), MP3 (frame-header walk +
    Xing/VBRI tags), FLAC (STREAMINFO) and Ogg Vorbis/Opus (id
    header + terminal granule) — ``n_frames`` is PCM sample frames
    under every format so downstream duration/size filters are
    format-agnostic; fields a format cannot know (MP3/Ogg bit depth)
    stay NULL. Same mixed-corpus contract as image_header_meta:
    blobs of no known audio container surface as format='unknown'
    (including non-WAVE RIFF forms — WEBP/AVI belong to
    media_header_meta), malformed ones as 'corrupt', NULL blobs as
    unknown — one bad row never fails a batch."""
    from clustering_spark.operators.mediafmt import (
        _flac_meta,
        _mp3_meta,
        _mp3_sniff,
        _ogg_meta,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "id", "format", "n_channels", "sample_rate",
            "bits_per_sample", "n_frames", "duration_sec",
        ]
        for pdf in it:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                row = dict.fromkeys(cols)
                row["id"], row["format"] = rid, "unknown"
                if blob is not None:
                    b = bytes(blob)
                    try:
                        # gate on the WAVE form type, not bare RIFF:
                        # WEBP images and AVI videos are RIFF too and
                        # must stay 'unknown' here (route them with
                        # media_header_meta)
                        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                            (
                                row["format"], row["n_channels"],
                                row["sample_rate"],
                                row["bits_per_sample"],
                                row["n_frames"], row["duration_sec"],
                            ) = _wav_meta(b)
                        elif b[:4] == b"fLaC":
                            (
                                row["format"], row["n_channels"],
                                row["sample_rate"],
                                row["bits_per_sample"],
                                row["n_frames"], row["duration_sec"],
                            ) = ("flac",) + _flac_meta(b)
                        elif b[:4] == b"OggS":
                            (
                                row["format"], row["n_channels"],
                                row["sample_rate"], row["n_frames"],
                                row["duration_sec"],
                            ) = _ogg_meta(b)
                        elif _mp3_sniff(b):
                            (
                                row["n_channels"], row["sample_rate"],
                                row["n_frames"], row["duration_sec"],
                            ) = _mp3_meta(b)
                            row["format"] = "mp3"
                    except (ValueError, struct.error):
                        row["format"] = "corrupt"
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, WAV_META_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "id long, rms double, peak double, zero_cross_rate double, "
    "spectral_centroid_hz double, spectral_bandwidth_hz double"
)


def audio_features(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Per-blob loudness/activity/spectral features over every WAV
    codec ``audio_codec.decode_wav_samples`` covers (integer PCM
    8/16/24/32, IEEE float, G.711 mu-law/A-law, IMA ADPCM,
    WAVE_FORMAT_EXTENSIBLE) — RMS, absolute peak (both normalized to
    [0, 1]), zero-crossing rate (sign flips per sample on the
    channel-mean signal), and the magnitude-spectrum centroid +
    bandwidth in Hz (one numpy rFFT over the same signal): the
    silence-gate / clipping-gate / tone-vs-noise signals of audio
    corpus curation, computed as ONE vectorized numpy pass per blob
    inside mapInPandas (Arrow batches; no row-at-a-time Python). A
    zero-energy signal has no spectral shape: centroid/bandwidth
    degrade to NULL while rms/peak stay 0. Blobs outside the decoder's
    codec set (MP3-in-WAV, proprietary ADPCMs, corrupt, NULL) degrade
    to NULL features — route them with audio_header_meta first."""
    import numpy as np

    from clustering_spark.operators.audio_codec import decode_wav_samples

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "id", "rms", "peak", "zero_cross_rate",
            "spectral_centroid_hz", "spectral_bandwidth_hz",
        ]
        for pdf in it:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                row = dict.fromkeys(cols)
                row["id"] = rid
                try:
                    b = bytes(blob)
                    frames, rate = decode_wav_samples(b)
                    if len(frames) > 0:
                        x = frames.mean(axis=1)
                        row["rms"] = float(np.sqrt((x**2).mean()))
                        row["peak"] = float(np.abs(x).max())
                        s = np.signbit(x)
                        row["zero_cross_rate"] = (
                            float((s[1:] != s[:-1]).mean())
                            if len(x) > 1
                            else 0.0
                        )
                        # spectral shape: centroid + bandwidth of the
                        # magnitude spectrum (rFFT of the mean signal;
                        # DC excluded so silence offsets don't read as
                        # 0 Hz tones). Pure sine at f -> centroid ~ f,
                        # bandwidth ~ 0; white noise -> centroid ~
                        # rate/4 with wide bandwidth.
                        mag = np.abs(np.fft.rfft(x))[1:]
                        total = float(mag.sum())
                        if total > 0:
                            freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)[1:]
                            cen = float((freqs * mag).sum() / total)
                            row["spectral_centroid_hz"] = cen
                            row["spectral_bandwidth_hz"] = float(
                                np.sqrt(
                                    (((freqs - cen) ** 2) * mag).sum() / total
                                )
                            )
                except (
                    NotImplementedError, ValueError,
                    struct.error, TypeError, AttributeError,
                ):
                    pass  # NULL features: undecodable residue, not a crash
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA
    )


AUDIO_FP_SCHEMA = "id long, afp long"

_AFP_RATE = 8000
_AFP_FRAME = 1024
_AFP_HOP = 512
_AFP_BANDS = 64  # one spectral-mask bit per band


def _audio_fp64(x, rate: int):
    """64-bit perceptual audio fingerprint of a mono float signal —
    a spectral-MASK hash from the published band-energy fingerprint
    family (Haitsma & Kalker 2002): resample to 8 kHz, Hann-windowed
    rFFT frames, 64 log-spaced band energies over 300-3500 Hz
    time-averaged over the clip, bit m = band m above the mean band
    energy. The mean threshold (rather than neighbor comparison) is
    what makes the hash stable on sparse spectra: most bands of tonal
    or speech-like audio sit on the noise floor, where adjacent-band
    ordering is a coin flip under codec noise, while 'above the
    clip-mean' is decided by orders of magnitude. Exactly invariant to
    volume and resampling, and empirically bit-identical across
    PCM16/PCM8/G.711/ADPCM re-encodes of the same content — the audio
    analogue of the image dHash, feeding the same pigeonhole hamming
    pair search. Returns None when the signal is shorter than one
    analysis frame (~128 ms) or has no spectral shape (silence)."""
    import numpy as np

    if rate != _AFP_RATE:
        n_out = int(round(len(x) * _AFP_RATE / rate))
        if n_out < 2:
            return None
        t_in = np.arange(len(x)) / rate
        t_out = np.arange(n_out) / _AFP_RATE
        x = np.interp(t_out, t_in, x)
    if len(x) < _AFP_FRAME:
        return None
    n_frames = 1 + (len(x) - _AFP_FRAME) // _AFP_HOP
    idx = (
        np.arange(_AFP_FRAME)[None, :]
        + _AFP_HOP * np.arange(n_frames)[:, None]
    )
    win = np.hanning(_AFP_FRAME)
    spec = np.abs(np.fft.rfft(x[idx] * win, axis=1)) ** 2
    if float(spec.sum()) == 0.0:
        return None  # silence has no spectral shape
    freqs = np.fft.rfftfreq(_AFP_FRAME, 1.0 / _AFP_RATE)
    edges = 300.0 * (3500.0 / 300.0) ** (
        np.arange(_AFP_BANDS + 1) / _AFP_BANDS
    )
    band_of = np.searchsorted(edges, freqs, side="right") - 1
    mean_spec = spec.mean(axis=0)  # time-average FIRST
    energy = np.zeros(_AFP_BANDS)
    valid = (band_of >= 0) & (band_of < _AFP_BANDS)
    np.add.at(energy, band_of[valid], mean_spec[valid])
    bits = energy > energy.mean()  # 64 spectral-mask bits
    weights = 1 << np.arange(64, dtype=np.uint64)
    return int(
        (bits.astype(np.uint64) * weights)
        .sum(dtype=np.uint64)
        .astype(np.int64)
    )


def audio_fingerprint(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Per-blob 64-bit perceptual audio fingerprint over every WAV
    codec decode_wav_samples covers. Mixed-corpus contract: blobs that
    don't decode (unknown codecs, corrupt, NULL), silent signals, and
    clips shorter than one analysis frame (~128 ms at 8 kHz) get a
    NULL fingerprint — degrade per row, never batch-fatal. The same
    recording re-encoded through a different codec / volume / sample
    rate lands bit-identical or within a few hamming bits, so audio
    near-dup composes with the SimHash/dHash pigeonhole machinery."""
    import numpy as np  # noqa: F401  (used via _audio_fp64)

    from clustering_spark.operators.audio_codec import decode_wav_samples

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fps = [], []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                fp = None
                try:
                    frames, rate = decode_wav_samples(bytes(blob))
                    if len(frames):
                        fp = _audio_fp64(frames.mean(axis=1), rate)
                except (
                    NotImplementedError, ValueError,
                    struct.error, TypeError,
                ):
                    pass
                ids.append(rid)
                fps.append(fp)
            # nullable Int64: None + int must not infer float64 (the
            # image_dhash truncation lesson — bit spans > 53 lose bits)
            yield pd.DataFrame(
                {"id": ids, "afp": pd.array(fps, dtype="Int64")}
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, AUDIO_FP_SCHEMA
    )


def audio_neardup_pairs(
    df: DataFrame, bin_col: str, id_col: str, max_hamming: int = 6
) -> DataFrame:
    """Perceptual near-duplicate audio pairs: fingerprints + the SAME
    pigeonhole chunk equi-join and bit_count verify the text SimHash
    and image dHash paths run (dedup.hamming_pair_search). Audio bytes
    never leave the scan — only (id, 8-byte fingerprint) rides the
    explode and the join. Returns (id_a, id_b, hamming), id_a < id_b."""
    from clustering_spark.operators.dedup import hamming_pair_search

    sigs = (
        audio_fingerprint(df, bin_col, id_col)
        .filter(F.col("afp").isNotNull())
        .select(F.col("id").alias("__id"), F.col("afp").alias("sig"))
    )
    return hamming_pair_search(sigs, max_hamming)


def make_wav(
    n_frames: int,
    sample_rate: int = 8000,
    n_channels: int = 1,
    amplitude: float = 0.5,
    freq_hz: float = 440.0,
    extra_chunk: bool = False,
) -> bytes:
    """Deterministic 16-bit PCM WAV fixture (stdlib only): a sine tone
    at ``freq_hz``. ``extra_chunk`` prepends an odd-sized LIST chunk
    before fmt to exercise the chunk walk's pad-byte handling."""
    import math

    frames = bytearray()
    for i in range(n_frames):
        v = int(amplitude * 32767 * math.sin(2 * math.pi * freq_hz * i / sample_rate))
        for _ in range(n_channels):
            frames += struct.pack("<h", v)
    block_align = 2 * n_channels
    fmt_body = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    chunks = b""
    if extra_chunk:
        odd = b"INFOx"  # 5 bytes: odd size forces a pad byte
        chunks += b"LIST" + struct.pack("<I", len(odd)) + odd + b"\x00"
    chunks += b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    chunks += b"data" + struct.pack("<I", len(frames)) + bytes(frames)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ------------------------------------------------------------- video


VIDEO_META_SCHEMA = (
    "id long, format string, major_brand string, n_tracks int, "
    "timescale long, duration_sec double"
)


def _iter_boxes(b: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for ISO-BMFF boxes in
    b[start:end] — 32-bit sizes, size==1 largesize (64-bit), size==0
    to-end-of-enclosure. Raises ValueError on structural nonsense."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", b[pos : pos + 4])
        btype = b[pos + 4 : pos + 8]
        body = pos + 8
        min_size = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack(">Q", b[pos + 8 : pos + 16])
            body = pos + 16
            # a largesize box carries a 16-byte header: a 64-bit size
            # of 8..15 would put body_end before body_start
            min_size = 16
        elif size == 0:
            size = end - pos
        if size < min_size or pos + size > end:
            raise ValueError("box overruns enclosure")
        yield btype, body, pos + size
        pos += size


def _mp4_meta(b: bytes) -> tuple[str, str | None, int, int | None, float | None]:
    """ISO-BMFF (MP4/MOV) metadata from the box structure alone — no
    codec: ftyp major brand, trak count, and mvhd timescale/duration
    (the video analogue of the JPEG SOF walk / WAV chunk walk)."""
    brand = None
    n_tracks = 0
    timescale = duration = None
    saw_moov = False
    for btype, s, e in _iter_boxes(b, 0, len(b)):
        if btype == b"ftyp" and e - s >= 4:
            brand = b[s : s + 4].decode("ascii", "replace").strip()
        elif btype == b"moov":
            saw_moov = True
            for ityp, is_, ie in _iter_boxes(b, s, e):
                if ityp == b"trak":
                    n_tracks += 1
                elif ityp == b"mvhd" and ie - is_ >= 4:
                    version = b[is_]
                    if version == 1 and ie - is_ >= 28 + 4:
                        timescale, duration = struct.unpack(
                            ">IQ", b[is_ + 20 : is_ + 32]
                        )
                    elif version == 0 and ie - is_ >= 20:
                        timescale, duration = struct.unpack(
                            ">II", b[is_ + 12 : is_ + 20]
                        )
    if brand is None and not saw_moov:
        raise ValueError("no ftyp or moov box — not ISO-BMFF")
    dur_sec = (
        duration / timescale
        if timescale not in (None, 0) and duration is not None
        else None
    )
    return "mp4", brand, n_tracks, timescale, dur_sec


def video_header_meta(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Per-blob video-container metadata — duration, track count,
    brand — from the container walk alone, no codec: ISO-BMFF
    (MP4/MOV box walk) and Matroska/WebM (EBML element walk; the
    ``major_brand``/``timescale`` columns are ISO-BMFF concepts and
    stay NULL there — DocType is what the ``format`` column carries,
    'webm' vs 'matroska'). Completes the image/audio/video header
    triple (image_header_meta, audio_header_meta) under the same
    mixed-corpus contract: blobs of no known video container surface
    as format='unknown', structurally broken ones as 'corrupt', NULL
    as unknown; one bad row never fails a batch. Frame extraction
    stays behind sample_frames (FAKE container) / avi_frame_sample /
    the honest codec gates — this stage is the header-only filter
    pass that runs over 100 TB first."""
    from clustering_spark.operators.mediafmt import _mkv_meta

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "id", "format", "major_brand", "n_tracks",
            "timescale", "duration_sec",
        ]
        for pdf in it:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                row = dict.fromkeys(cols)
                row["id"], row["format"] = rid, "unknown"
                if blob is not None:
                    b = bytes(blob)
                    # cheap sniff: ISO-BMFF files start with a box whose
                    # type is printable 4cc; require the common ftyp/moov
                    # openers before attempting the full walk
                    if len(b) >= 12 and b[4:8] in (
                        b"ftyp", b"moov", b"mdat", b"free", b"wide", b"skip",
                    ):
                        try:
                            (
                                row["format"], row["major_brand"],
                                row["n_tracks"], row["timescale"],
                                row["duration_sec"],
                            ) = _mp4_meta(b)
                        except (ValueError, struct.error):
                            row["format"] = "corrupt"
                    elif b[:4] == b"\x1aE\xdf\xa3":
                        try:
                            (
                                row["format"], row["n_tracks"],
                                _w, _h, row["duration_sec"],
                            ) = _mkv_meta(b)
                        except (ValueError, struct.error):
                            row["format"] = "corrupt"
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, VIDEO_META_SCHEMA
    )


def make_mp4(
    duration_sec: float = 2.0,
    timescale: int = 1000,
    n_tracks: int = 2,
    brand: bytes = b"isom",
    largesize_moov: bool = False,
    tracks: list[bytes] | None = None,
) -> bytes:
    """Deterministic minimal ISO-BMFF fixture (stdlib only): ftyp +
    moov(mvhd + trak boxes) + a tiny mdat. ``tracks`` supplies
    fully-populated trak boxes (make_mp4_track) in place of the
    ``n_tracks`` empty ones; ``largesize_moov`` wraps moov in a 64-bit
    largesize header to exercise that branch of the box walk."""

    def box(btype: bytes, body: bytes, largesize: bool = False) -> bytes:
        if largesize:
            return struct.pack(">I", 1) + btype + struct.pack(
                ">Q", 16 + len(body)
            ) + body
        return struct.pack(">I", 8 + len(body)) + btype + body

    mvhd = bytes([0]) + b"\x00\x00\x00" + b"\x00" * 8 + struct.pack(
        ">II", timescale, int(duration_sec * timescale)
    ) + b"\x00" * 80
    trak_boxes = (
        b"".join(tracks)
        if tracks is not None
        else b"".join(box(b"trak", b"") for _ in range(n_tracks))
    )
    moov_body = box(b"mvhd", mvhd) + trak_boxes
    return (
        box(b"ftyp", brand + struct.pack(">I", 0) + brand)
        + box(b"moov", moov_body, largesize=largesize_moov)
        + box(b"mdat", b"\x00" * 16)
    )


TRACK_STATS_SCHEMA = (
    "id long, track_idx int, handler string, n_samples long, "
    "duration_sec double, fps double, n_bytes long, bitrate_bps double"
)


def _mp4_track_stats(b: bytes):
    """Per-track sample-table statistics from the box structure alone
    — no codec: mdhd timescale/duration, hdlr type, stsz sample
    count/bytes. Yields (handler, n_samples, duration_sec, fps,
    n_bytes, bitrate_bps) per trak; fields degrade to None where the
    track omits a table (fps/bitrate need a positive duration)."""
    for btype, s, e in _iter_boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        for ityp, is_, ie in _iter_boxes(b, s, e):
            if ityp != b"trak":
                continue
            timescale = duration = None
            handler = None
            n_samples = n_bytes = None
            for mtyp, ms, me in _iter_boxes(b, is_, ie):
                if mtyp != b"mdia":
                    continue
                for dtyp, ds, de in _iter_boxes(b, ms, me):
                    if dtyp == b"mdhd" and de - ds >= 4:
                        ver = b[ds]
                        if ver == 1 and de - ds >= 32:
                            timescale, duration = struct.unpack(
                                ">IQ", b[ds + 20 : ds + 32]
                            )
                        elif ver == 0 and de - ds >= 24:
                            timescale, duration = struct.unpack(
                                ">II", b[ds + 12 : ds + 20]
                            )
                    elif dtyp == b"hdlr" and de - ds >= 12:
                        handler = b[ds + 8 : ds + 12].decode(
                            "ascii", "replace"
                        )
                    elif dtyp == b"minf":
                        for styp, ss, se in _iter_boxes(b, ds, de):
                            if styp != b"stbl":
                                continue
                            for ttyp, ts, te in _iter_boxes(b, ss, se):
                                if ttyp == b"stsz" and te - ts >= 12:
                                    size, cnt = struct.unpack(
                                        ">II", b[ts + 4 : ts + 12]
                                    )
                                    n_samples = cnt
                                    if size:
                                        n_bytes = size * cnt
                                    else:
                                        want = ts + 12 + 4 * cnt
                                        if want <= te:
                                            n_bytes = sum(
                                                struct.unpack(
                                                    f">{cnt}I",
                                                    b[ts + 12 : want],
                                                )
                                            )
            dur = (
                duration / timescale
                if timescale not in (None, 0) and duration is not None
                else None
            )
            fps = (
                n_samples / dur
                if dur and n_samples is not None
                else None
            )
            bps = 8.0 * n_bytes / dur if dur and n_bytes is not None else None
            yield handler, n_samples, dur, fps, n_bytes, bps


def video_track_stats(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Per-track ISO-BMFF sample statistics — handler type, sample
    count, duration, fps, payload bytes, bitrate — from mdhd/hdlr/stsz
    alone, codec-free: THE first-pass curation filters for a 100 TB
    video corpus (drop sub-1 fps slideshows, cap bitrate outliers,
    route audio-only containers) before any decoder runs. Same
    degrade contract as the other header passes: non-BMFF rows emit
    nothing, malformed BMFF emits one track_idx=-1 row with handler
    'corrupt'."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "id", "track_idx", "handler", "n_samples",
            "duration_sec", "fps", "n_bytes", "bitrate_bps",
        ]
        for pdf in it:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None:
                    continue
                b = bytes(blob)
                if not (
                    len(b) >= 12
                    and b[4:8]
                    in (b"ftyp", b"moov", b"mdat", b"free", b"wide", b"skip")
                ):
                    continue
                try:
                    for i, st_row in enumerate(_mp4_track_stats(b)):
                        handler, n, dur, fps, nb, bps = st_row
                        out.append(
                            {
                                "id": rid, "track_idx": i,
                                "handler": handler, "n_samples": n,
                                "duration_sec": dur, "fps": fps,
                                "n_bytes": nb, "bitrate_bps": bps,
                            }
                        )
                except (ValueError, struct.error):
                    out.append(
                        dict.fromkeys(cols)
                        | {"id": rid, "track_idx": -1, "handler": "corrupt"}
                    )
            yield pd.DataFrame(out, columns=cols)

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, TRACK_STATS_SCHEMA
    )


def make_mp4_track(
    handler: bytes = b"vide",
    n_samples: int = 50,
    sample_size: int = 1000,
    timescale: int = 25,
    duration: int = 50,
    uniform_stsz: bool = True,
) -> bytes:
    """One fully-populated trak box (mdhd + hdlr + minf/stbl/stsz) for
    video_track_stats fixtures. ``uniform_stsz=False`` emits the
    per-sample size-table form."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    mdhd = bytes(4) + bytes(8) + struct.pack(">II", timescale, duration) + bytes(4)
    hdlr = bytes(8) + handler + bytes(12)
    if uniform_stsz:
        stsz = bytes(4) + struct.pack(">II", sample_size, n_samples)
    else:
        stsz = bytes(4) + struct.pack(">II", 0, n_samples) + b"".join(
            struct.pack(">I", sample_size + i) for i in range(n_samples)
        )
    stbl = box(b"stsz", stsz)
    minf = box(b"stbl", stbl)
    mdia = box(b"mdhd", mdhd) + box(b"hdlr", hdlr) + box(b"minf", minf)
    return box(b"trak", box(b"mdia", mdia))


# ------------------------------------------- other RIFF forms (WEBP/AVI)


def _webp_dims(b: bytes) -> tuple[int, int]:
    """Canvas dimensions of a RIFF/WEBP image from its first chunk —
    header-only, no codec (the WEBP analogue of the JPEG SOF walk).
    Handles all three public layouts: 'VP8 ' (lossy frame header),
    'VP8L' (lossless 14-bit packed dims), 'VP8X' (extended, 24-bit
    canvas). Raises ValueError on anything malformed."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP container")
    if len(b) < 20:
        raise ValueError("WEBP missing first chunk")
    fourcc = b[12:16]
    (csize,) = struct.unpack("<I", b[16:20])
    body = b[20 : 20 + csize]
    if fourcc == b"VP8X":
        if len(body) < 10:
            raise ValueError("short VP8X chunk")
        w = int.from_bytes(body[4:7], "little") + 1
        h = int.from_bytes(body[7:10], "little") + 1
        return w, h
    if fourcc == b"VP8L":
        if len(body) < 5 or body[0] != 0x2F:
            raise ValueError("bad VP8L signature")
        bits = int.from_bytes(body[1:5], "little")
        return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
    if fourcc == b"VP8 ":
        # 3-byte frame tag, then the 9D 01 2A start code, then
        # 14-bit width/height in two uint16le (top 2 bits = scale)
        if len(body) < 10 or body[3:6] != b"\x9d\x01\x2a":
            raise ValueError("bad VP8 key-frame start code")
        w, h = struct.unpack("<HH", body[6:10])
        return w & 0x3FFF, h & 0x3FFF
    raise ValueError("unrecognized WEBP first chunk")


def _avi_meta(b: bytes) -> tuple[int, int, int, float | None]:
    """RIFF/'AVI ' main-header metadata (LIST hdrl → avih) — stream
    count, frame dims, and duration from TotalFrames × MicroSecPerFrame,
    codec-free. Returns (n_streams, width, height, duration_sec);
    raises ValueError when no avih chunk is present."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (csize,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + csize]
        if cid == b"LIST" and body[:4] == b"hdrl":
            sub = 4
            while sub + 8 <= len(body):
                sid = body[sub : sub + 4]
                (ssize,) = struct.unpack("<I", body[sub + 4 : sub + 8])
                sbody = body[sub + 8 : sub + 8 + ssize]
                if sid == b"avih":
                    if len(sbody) < 40:
                        raise ValueError("short avih chunk")
                    (
                        usec_per_frame, _maxbps, _pad, _flags,
                        total_frames, _init, n_streams, _sugg,
                        width, height,
                    ) = struct.unpack("<10I", sbody[:40])
                    dur = (
                        total_frames * usec_per_frame / 1e6
                        if usec_per_frame else None
                    )
                    return n_streams, width, height, dur
                sub += 8 + ssize + (ssize & 1)
        pos += 8 + csize + (csize & 1)
    raise ValueError("no avih header in AVI container")


def make_webp(width: int, height: int, variant: str = "VP8X") -> bytes:
    """Deterministic minimal RIFF/WEBP fixture (stdlib only) for the
    given dims in any of the three header layouts. Carries no pixel
    payload — exactly what the header pass must tolerate."""
    if variant == "VP8X":
        body = b"\x00\x00\x00\x00" + (width - 1).to_bytes(3, "little") + (
            height - 1
        ).to_bytes(3, "little")
    elif variant == "VP8L":
        bits = (width - 1) | ((height - 1) << 14)
        body = b"\x2f" + bits.to_bytes(4, "little")
    elif variant == "VP8 ":
        body = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack(
            "<HH", width, height
        )
    else:
        raise ValueError(f"unknown WEBP variant {variant!r}")
    chunk = variant.encode("ascii").ljust(4) + struct.pack(
        "<I", len(body)
    ) + body + (b"\x00" if len(body) & 1 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def make_avi(
    n_frames: int = 100,
    fps: float = 25.0,
    n_streams: int = 1,
    width: int = 320,
    height: int = 240,
) -> bytes:
    """Deterministic minimal RIFF/'AVI ' fixture: LIST hdrl with one
    avih main header (no stream lists, no movi payload)."""
    avih = struct.pack(
        "<14I",
        int(1e6 / fps), 0, 0, 0, n_frames, 0, n_streams, 0,
        width, height, 0, 0, 0, 0,
    )
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    lst = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    return b"RIFF" + struct.pack("<I", 4 + len(lst)) + b"AVI " + lst


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) & 1 else b""
    )


def make_avi_mjpeg(frames, fps: float = 25.0, in_rec_lists: bool = False) -> bytes:
    """Deterministic MJPEG AVI fixture: each element of ``frames`` is
    an (H, W) gray or (H, W, 3) RGB uint8 array, encoded to a real
    baseline JPEG (operators/jpeg.encode_baseline) and laid out as a
    '00dc' chunk in LIST movi, after a spec-shaped LIST hdrl (avih +
    strl with an 'MJPG'-handler strh and a BITMAPINFOHEADER strf).
    ``in_rec_lists=True`` wraps each frame chunk in a LIST 'rec '
    group — the interleaved layout some muxers emit — to exercise the
    extractor's recursive walk."""
    import numpy as np

    from clustering_spark.operators.jpeg import encode_baseline

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    avih = struct.pack(
        "<14I",
        int(1e6 / fps), 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, int(fps), 0, len(frames), 0, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    strl = b"LIST" + struct.pack(
        "<I", 4 + len(_riff_chunk(b"strh", strh)) + len(_riff_chunk(b"strf", strf))
    ) + b"strl" + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
    hdrl_body = b"hdrl" + _riff_chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = bytearray(b"movi")
    for f in frames:
        dc = _riff_chunk(b"00dc", encode_baseline(f))
        if in_rec_lists:
            dc = b"LIST" + struct.pack("<I", 4 + len(dc)) + b"rec " + dc
        movi_body += dc
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + bytes(movi_body)
    inner = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(inner)) + inner


def avi_video_frames(b: bytes):
    """Yield ``(frame_idx, payload_bytes)`` for the video-stream
    chunks ('##dc'/'##db') inside a RIFF/AVI LIST movi, descending
    into LIST 'rec ' interleave groups. Codec-agnostic at this layer —
    the payload is whatever the muxer wrote (JPEG bytes for MJPEG).
    Raises ValueError if the container is not RIFF/AVI; a truncated
    movi stops at the boundary (frames before the cut survive, the
    same salvage contract as read_warc)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")

    # iterative walk with an explicit stack: a crafted AVI nesting
    # thousands of LIST 'rec ' levels must not RecursionError the task
    # (untrusted crawl input). Each stack frame is (buffer, pos,
    # truncated_parent) — truncated LISTs still yield the frames they
    # actually carry (salvage), then stop their level.
    idx = 0
    stack: list[tuple[bytes, int]] = [(b[12:], 0)]
    while stack:
        buf, pos = stack.pop()
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (csize,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + csize]
            truncated = len(body) < csize
            if cid == b"LIST" and body[:4] in (b"movi", b"rec "):
                if truncated:
                    # descend into the partial LIST; its parent level
                    # ends here (frames before the cut survive)
                    stack.append((body[4:], 0))
                    break
                stack.append((buf, pos + 8 + csize + (csize & 1)))
                buf, pos = body[4:], 0
                continue
            if truncated:
                break  # truncated leaf chunk: stop at the boundary
            if (
                len(cid) == 4
                and cid[:2].isdigit()
                and cid[2:] in (b"dc", b"db")
            ):
                yield idx, body
                idx += 1
            pos += 8 + csize + (csize & 1)


AVI_FRAME_SCHEMA = (
    "id long, frame_idx int, width int, height int, "
    "mean_luma double, frame binary"
)


def avi_frame_sample(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    every_n: int = 1,
    max_frames: int | None = None,
) -> DataFrame:
    """Decode-and-sample MJPEG AVI video blobs: every n-th video chunk
    is decoded with the repo's own baseline JPEG codec and emitted as
    (id, frame_idx, width, height, mean_luma, frame) where ``frame``
    is the original JPEG bytes — directly consumable by image_dhash /
    resize_images / decode_image_meta, so video dedup composes with
    the image stages. ``max_frames`` caps the fan-out per blob (a
    long video should not explode a task).

    Mixed-corpus contract: a non-AVI or NULL blob yields no rows (use
    media_header_meta to route first); a frame whose payload is not a
    decodable baseline JPEG keeps its row with NULL width/height/
    mean_luma and the payload preserved — observable, never
    batch-fatal. This is honest MJPEG-only video decode: real codecs
    (H.264 & co) stay behind the NotImplementedError gate in
    decode_image_meta, but the MJPEG family — the one video codec that
    IS stdlib-decodable — now decodes for real."""
    import numpy as np

    from clustering_spark.operators.jpeg import decode_baseline

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "frame_idx", "width", "height", "mean_luma", "frame"]
        for pdf in it:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None:
                    continue
                b = bytes(blob)
                try:
                    frames = avi_video_frames(b)
                    taken = 0
                    for fidx, payload in frames:
                        if fidx % every_n:
                            continue
                        if max_frames is not None and taken >= max_frames:
                            break
                        row = {
                            "id": rid, "frame_idx": fidx,
                            "width": None, "height": None,
                            "mean_luma": None, "frame": payload,
                        }
                        try:
                            w, h, ch, samples = decode_baseline(payload)
                            arr = np.frombuffer(
                                samples, dtype=np.uint8
                            ).reshape(h, w, ch)
                            luma = (
                                0.299 * arr[:, :, 0]
                                + 0.587 * arr[:, :, 1]
                                + 0.114 * arr[:, :, 2]
                                if ch == 3
                                else arr[:, :, 0].astype(np.float64)
                            )
                            row["width"], row["height"] = w, h
                            row["mean_luma"] = float(luma.mean())
                        except (NotImplementedError, ValueError):
                            pass  # undecodable frame: observable NULLs
                        out.append(row)
                        taken += 1
                except ValueError:
                    continue  # not an AVI container: no frames
            yield pd.DataFrame(out, columns=cols)

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, AVI_FRAME_SCHEMA
    )


# Gray levels whose BT.601 luma on equal channels is EXACT in float64
# (0.299*v + 0.587*v + 0.114*v == v): the GIF gate family draws its
# pixels from this set so the decoded luma — decode_gif emits RGB, so
# _decode_gray applies the luma formula — is bit-identical to the
# palette index, keeping the dHash cell means integer-exact and the
# SQL oracle able to replay them (191 of 256 levels qualify).
EXACT_LUMAS = tuple(
    v for v in range(256) if 0.299 * v + 0.587 * v + 0.114 * v == float(v)
)


GIF_FRAME_SCHEMA = (
    "id long, frame_idx int, delay_cs int, width int, height int, "
    "mean_luma double, frame binary"
)


def gif_frame_sample(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    every_n: int = 1,
    max_frames: int | None = None,
) -> DataFrame:
    """Decode-and-sample animated-GIF blobs (the video-adjacent image
    family): every n-th composited frame — GCE transparency and
    disposal honored by operators/gif.gif_frames — emitted as (id,
    frame_idx, delay_cs, width, height, mean_luma, frame) with
    ``frame`` re-encoded as a baseline RGB PNG, directly consumable by
    image_dhash / decode_image_meta, so animation near-dup composes
    with the image stages exactly like avi_frame_sample's MJPEG
    frames. ``max_frames`` caps the per-blob fan-out. Non-GIF and NULL
    blobs yield no rows; a truncated animation keeps the frames before
    the cut (salvage contract)."""
    import numpy as np

    from clustering_spark.operators.gif import gif_frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "id", "frame_idx", "delay_cs", "width", "height",
            "mean_luma", "frame",
        ]
        for pdf in it:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None:
                    continue
                b = bytes(blob)
                try:
                    taken = 0
                    for fidx, delay, rgb in gif_frames(b):
                        if fidx % every_n:
                            continue
                        if max_frames is not None and taken >= max_frames:
                            break
                        # dims from the header (frames are full-canvas)
                        w, h = struct.unpack("<HH", b[6:10])
                        arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
                        luma = (
                            0.299 * arr[:, :, 0]
                            + 0.587 * arr[:, :, 1]
                            + 0.114 * arr[:, :, 2]
                        )
                        out.append(
                            {
                                "id": rid,
                                "frame_idx": fidx,
                                "delay_cs": delay,
                                "width": w,
                                "height": h,
                                "mean_luma": float(luma.mean()),
                                "frame": make_png(w, h, rgb, 2),
                            }
                        )
                        taken += 1
                except ValueError:
                    continue  # not a GIF / malformed header: no rows
            yield pd.DataFrame(out, columns=cols)

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, GIF_FRAME_SCHEMA
    )


def synthetic_media_blob(d: int) -> bytes:
    """Deterministic mixed-corpus blob for integer id ``d`` — the gate
    fixture generator behind the ``media_metadata`` oracle entry: the
    blob's header parameters are pure arithmetic in ``d`` (family =
    d % 10), so a SQL oracle can compute the fields media_header_meta
    must recover without ever parsing bytes (the same round-trip
    template pattern as strip_html's entity-escaped oracle). Keep the
    arithmetic in lock-step with SQL_MEDIA_METADATA in queries.py.

    Family 5 (round 12) is a REAL single-frame gray GIF: the oracle
    still computes dims and dHash from the construction arithmetic
    alone, but Spark can only match by actually LZW-decoding the GIF —
    the codec itself is on the hash gate, the same trick as fam 0's
    arithmetic pixels but through a real compressed format.

    Families 7-9 (round 12, later) gate the compressed-container
    header passes of operators/mediafmt.py: MP3 whose duration the
    router must recover through either the Xing tag or the full
    frame walk (the tag's presence itself varies arithmetically, so
    BOTH paths are hash-checked), FLAC via STREAMINFO bit unpacking,
    and Matroska/WebM via the EBML walk (DocType naming, dims,
    TimestampScale x Duration)."""
    fam = d % 10
    if fam == 7:
        from clustering_spark.operators.mediafmt import make_mp3

        # fam-7 ids are all odd (d ≡ 7 mod 10), so binary variety
        # must ride d // 10, not d % 2
        return make_mp3(
            n_frames=10 + d % 40,
            rate=(44100, 48000, 32000)[(d // 10) % 3],
            bitrate_kbps=128,
            mono=((d // 10) % 2 == 0),
            xing=((d // 3) % 2 == 0),
        )
    if fam == 8:
        from clustering_spark.operators.mediafmt import make_flac

        rate = (22050, 44100, 96000)[(d // 10) % 3]
        return make_flac(
            rate=rate,
            channels=1 + (d // 10) % 2,
            bits=16 + 8 * ((d // 3) % 2),
            total_samples=rate * (1 + d % 8),
        )
    if fam == 9:
        from clustering_spark.operators.mediafmt import make_mkv

        return make_mkv(
            doctype="webm" if (d // 10) % 2 else "matroska",
            duration_ms=250.0 * (1 + d % 12),
            video_dims=(16 + d % 300, 9 + (d // 5) % 200),
            n_audio_tracks=(d // 10) % 2,
        )
    if fam == 5:
        import numpy as np

        from clustering_spark.operators.gif import encode_gif

        w, h = 9 + d % 21, 8 + (d // 17) % 12
        y, x = np.mgrid[0:h, 0:w]
        idx = (7 * x + 13 * y + d) % len(EXACT_LUMAS)
        return encode_gif(
            np.asarray(EXACT_LUMAS, dtype=np.uint8)[idx]
        )
    if fam == 0:
        # patterned (not flat) FAKE image, dims >= 9x8 so the dHash
        # 9x8 area-mean grid has no empty/degenerate cells: pixel
        # (x, y) = (7x + 13y + d) mod 256 — pure arithmetic, so the
        # oracle can recompute the 64-bit dHash by enumerating pixels
        w, h = 9 + d % 24, 8 + (d // 31) % 16
        payload = bytes(
            (7 * x + 13 * y + d) % 256 for y in range(h) for x in range(w)
        )
        return MAGIC + struct.pack(">HH", w, h) + payload
    if fam == 1:
        import numpy as np

        from clustering_spark.operators.audio_codec import make_wav_ex

        # codec varies arithmetically so the ROUTER's codec naming and
        # the fact-chunk frame math are both on the hash gate: the
        # ADPCM members are SHORTER than one 505-sample block, so
        # data_size // block_align would report 0 frames — only the
        # spec's fact chunk yields the oracle's n. Payload is silence
        # (header fields are what the gate checks).
        n, ch = 100 + d % 100, 1 + d % 2
        codec = ("pcm16", "ulaw", "alaw", "ima-adpcm")[(d // 7) % 4]
        return make_wav_ex(np.zeros((n, ch)), 8000, codec)
    if fam == 2:
        # duration picked so duration/timescale is an exact double:
        # int((1+d%10)/2 * 1000) = 500*(1+d%10)
        return make_mp4(
            duration_sec=(1 + d % 10) / 2, timescale=1000,
            n_tracks=1 + d % 3,
        )
    if fam == 3:
        return make_webp(
            1 + d % 200, 1 + (d // 3) % 150,
            # d ≡ 3 (mod 6) here, so vary the layout on d // 6 (d % 3
            # would be constant) — dims are layout-independent, so the
            # oracle arithmetic is unaffected
            variant=("VP8X", "VP8L", "VP8 ")[(d // 6) % 3],
        )
    if fam == 4:
        # 25 fps × 25k frames → duration exactly k seconds
        return make_avi(
            n_frames=25 * (1 + d % 8), fps=25.0, n_streams=1 + d % 2
        )
    return b"blob-%d" % d  # unknown family: not a media container


# ------------------------------------------------- mixed-corpus router


MEDIA_HEADER_SCHEMA = (
    "id long, media_type string, format string, "
    "width int, height int, "
    "n_channels int, sample_rate int, audio_duration_sec double, "
    "n_tracks int, video_duration_sec double"
)


def media_header_meta(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """ONE header pass over a mixed image/audio/video blob column:
    sniff the container magic per row and run the matching codec-free
    parser (PNG/JPEG/GIF/BMP/TIFF/WEBP/FAKE image dims, RIFF/WAVE +
    MP3 + FLAC + Ogg Vorbis/Opus audio shape, ISO-BMFF + AVI +
    Matroska/WebM video shape), emitting a ``media_type`` routing
    column plus the union of the per-family fields (non-applicable
    fields NULL). This is the user-facing first pass over a 100 TB
    mixed table — one scan, one mapInPandas stage, instead of three
    family-specific passes each re-reading every blob. MP3 is sniffed
    LAST (its predicate is a frame-sync scan, not a magic string, so
    every magic-bearing family gets first claim). Same degrade
    contract as the family parsers: unknown/corrupt/NULL are values,
    never batch failures."""

    from clustering_spark.operators.mediafmt import (
        _flac_meta,
        _mkv_meta,
        _mp3_meta,
        _mp3_sniff,
        _ogg_meta,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "id", "media_type", "format", "width", "height",
            "n_channels", "sample_rate", "audio_duration_sec",
            "n_tracks", "video_duration_sec",
        ]
        for pdf in it:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                row = dict.fromkeys(cols)
                row["id"], row["media_type"], row["format"] = (
                    rid, "unknown", "unknown",
                )
                if blob is not None:
                    b = bytes(blob)
                    try:
                        if b[:4] == MAGIC:
                            row["media_type"], row["format"] = "image", "fake"
                            row["width"], row["height"] = _parse_header(b)
                        elif b[: len(PNG_MAGIC)] == PNG_MAGIC:
                            row["media_type"], row["format"] = "image", "png"
                            row["width"], row["height"] = struct.unpack(
                                ">II", b[16:24]
                            )
                        elif b[:2] == JPEG_MAGIC:
                            row["media_type"] = "image"
                            (
                                row["width"], row["height"], _nc, sof
                            ) = _jpeg_dims(b)
                            row["format"] = (
                                "jpeg"
                                if sof in (0xC0, 0xC1)
                                else "jpeg-progressive"
                            )
                        elif b[:6] in (b"GIF87a", b"GIF89a"):
                            from clustering_spark.operators.gif import (
                                gif_meta,
                            )

                            row["media_type"] = "image"
                            w, h, n_frames = gif_meta(b)
                            row["width"], row["height"] = w, h
                            row["format"] = (
                                "gif" if n_frames == 1 else "gif-animated"
                            )
                        elif _bmp_sniff(b):
                            from clustering_spark.operators.bmp import (
                                bmp_meta,
                            )

                            row["media_type"] = "image"
                            (
                                row["width"], row["height"], _bpp, _c
                            ) = bmp_meta(b)
                            row["format"] = "bmp"
                        elif b[:4] in _TIFF_MAGICS:
                            row["media_type"] = "image"
                            (
                                row["width"], row["height"], _c
                            ) = _tiff_meta(b)
                            row["format"] = "tiff"
                        elif b[:4] == b"RIFF":
                            # RIFF is a family, not a format: route on
                            # the form type at b[8:12] — WAVE is audio,
                            # WEBP an image, 'AVI ' a video; anything
                            # else (or a header too short to carry a
                            # form type) stays unknown/corrupt rather
                            # than masquerading as corrupt audio
                            form = b[8:12]
                            if form == b"WAVE":
                                row["media_type"] = "audio"
                                (
                                    row["format"], row["n_channels"],
                                    row["sample_rate"], _bits, _frames,
                                    row["audio_duration_sec"],
                                ) = _wav_meta(b)
                            elif form == b"WEBP":
                                row["media_type"] = "image"
                                row["format"] = "webp"
                                row["width"], row["height"] = _webp_dims(b)
                            elif form == b"AVI ":
                                row["media_type"] = "video"
                                row["format"] = "avi"
                                (
                                    row["n_tracks"], row["width"],
                                    row["height"],
                                    row["video_duration_sec"],
                                ) = _avi_meta(b)
                            elif len(b) < 12:
                                row["format"] = "corrupt"
                        elif len(b) >= 12 and b[4:8] in (
                            b"ftyp", b"moov", b"mdat", b"free", b"wide",
                            b"skip",
                        ):
                            row["media_type"] = "video"
                            (
                                row["format"], _brand, row["n_tracks"],
                                _ts, row["video_duration_sec"],
                            ) = _mp4_meta(b)
                        elif b[:4] == b"fLaC":
                            row["media_type"] = "audio"
                            row["format"] = "flac"
                            (
                                row["n_channels"], row["sample_rate"],
                                _bits, _total,
                                row["audio_duration_sec"],
                            ) = _flac_meta(b)
                        elif b[:4] == b"OggS":
                            row["media_type"] = "audio"
                            (
                                row["format"], row["n_channels"],
                                row["sample_rate"], _n,
                                row["audio_duration_sec"],
                            ) = _ogg_meta(b)
                        elif b[:4] == b"\x1aE\xdf\xa3":
                            row["media_type"] = "video"
                            (
                                row["format"], row["n_tracks"],
                                row["width"], row["height"],
                                row["video_duration_sec"],
                            ) = _mkv_meta(b)
                        elif b[:5] == b"%PDF-":
                            # documents route with type+format only;
                            # pages/encryption live in pdf_header_meta
                            # (running the full xref walk here would
                            # price every mixed scan at PDF cost)
                            row["media_type"] = "document"
                            row["format"] = "pdf"
                        elif b[:4] == b"PK\x03\x04":
                            from clustering_spark.operators.office import (
                                zip_kind,
                            )

                            # ZIP containers: docx/pptx/xlsx/epub are
                            # documents; an unrecognized archive stays
                            # format='zip' (an archive, not a doc)
                            row["media_type"] = "document"
                            row["format"] = zip_kind(b)
                        elif b[:5] == b"{\\rtf":
                            row["media_type"] = "document"
                            row["format"] = "rtf"
                        elif _mp3_sniff(b):
                            # last: the sync-scan sniff is the only
                            # non-magic predicate, so every
                            # magic-bearing family gets first claim
                            row["media_type"] = "audio"
                            row["format"] = "mp3"
                            (
                                row["n_channels"], row["sample_rate"],
                                _n, row["audio_duration_sec"],
                            ) = _mp3_meta(b)
                    except (ValueError, struct.error):
                        row["format"] = "corrupt"
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, MEDIA_HEADER_SCHEMA
    )
