"""Measure the pure-Python/numpy codec kernels' decode throughput so
the "contract-speed" posture in PERFORMANCE.md is a NUMBER, not a
shrug: each kernel decodes a deterministic fixture repeatedly and
reports decoded-output MB/s (min/median over reps — median is the
headline, min shows the noise floor). A 10x kernel slowdown in a
review batch should move these numbers, and the bounded floors in
tests/test_codec_throughput.py catch it.

Usage: python tools/codec_bench.py  -> one JSON line
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("CODEC_BENCH_REPS", "5"))


def _rng(seed: int = 7) -> np.random.Generator:
    return np.random.default_rng(seed)


def _timed(fn, out_bytes: int, reps: int = REPS) -> dict:
    samples = []
    fn()  # warm-up (tables, JIT-ish numpy paths)
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    mbs = [out_bytes / s / 1e6 for s in samples]
    return {
        "out_mb": round(out_bytes / 1e6, 3),
        "mb_per_s_median": round(statistics.median(mbs), 2),
        "mb_per_s_min": round(min(mbs), 2),
    }


def bench_all() -> dict[str, dict]:
    from clustering_spark.operators.ccitt import (
        decode_g4,
        encode_g4,
    )
    from clustering_spark.operators.gif import decode_gif, encode_gif
    from clustering_spark.operators.jpeg import (
        decode_baseline,
        encode_baseline,
        encode_progressive,
    )
    from clustering_spark.operators.pdf import extract_pdf_text, make_pdf
    from clustering_spark.operators.png import decode_png, encode_png
    from clustering_spark.operators.tiff import decode_tiff, encode_tiff

    rng = _rng()
    out: dict[str, dict] = {}

    # PNG: 512x512 gray, Paeth-filtered (the worst-case per-byte path)
    gray = rng.integers(0, 256, (512, 512), dtype=np.uint8)
    png_blob = encode_png(gray, filter_type=4)
    out["png_paeth_unfilter"] = _timed(
        lambda: decode_png(png_blob), gray.nbytes
    )

    # GIF: 512x512 gray -> palettized LZW (the pure-Python LZW loop)
    gif_blob = encode_gif(gray)
    out["gif_lzw"] = _timed(lambda: decode_gif(gif_blob), gray.nbytes)

    # TIFF LZW: same raster through the TIFF 6.0 LZW variant
    tif_blob = encode_tiff(gray, compression="lzw")
    out["tiff_lzw"] = _timed(lambda: decode_tiff(tif_blob), gray.nbytes)

    # TIFF PackBits (run-length; mixed runs/literals)
    pb_src = np.repeat(
        rng.integers(0, 256, (512, 64), dtype=np.uint8), 8, axis=1
    )
    pb_blob = encode_tiff(pb_src, compression="packbits")
    out["tiff_packbits"] = _timed(
        lambda: decode_tiff(pb_blob), pb_src.nbytes
    )

    # baseline JPEG: 256x256 RGB (entropy decode + IDCT)
    rgb = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    jb = encode_baseline(rgb)
    out["jpeg_baseline"] = _timed(lambda: decode_baseline(jb), rgb.nbytes)

    # progressive JPEG: same raster, default scan script
    jp = encode_progressive(rgb)
    out["jpeg_progressive"] = _timed(
        lambda: decode_baseline(jp), rgb.nbytes
    )

    # CCITT G4: 1728x256 bilevel fax page band (text-ish run structure)
    page = np.zeros((256, 1728), dtype=np.uint8)
    page[:, ::13] = 1
    page[::3, 100:200] = 1
    g4 = encode_g4(page)
    out["ccitt_g4"] = _timed(
        lambda: decode_g4(g4, 1728, 256), page.nbytes
    )

    # CCITT G3-2D (round 13): same band through the MR tagged rows
    from clustering_spark.operators.ccitt import (
        decode_g3_2d,
        encode_g3_2d,
    )

    g32 = encode_g3_2d(page, k=2)
    out["ccitt_g3_2d"] = _timed(
        lambda: decode_g3_2d(g32, 1728, 256), page.nbytes
    )

    # lossless JPEG (round 13): per-sample Huffman+predictor loop
    from clustering_spark.operators.jpeg import encode_lossless

    ll_src = rng.integers(0, 256, (128, 128), dtype=np.uint8)
    ll = encode_lossless(ll_src, predictor=4)
    out["jpeg_lossless"] = _timed(
        lambda: decode_baseline(ll), ll_src.nbytes
    )

    # TIFF Deflate (round 13): bounded_inflate path (zlib-speed)
    df_blob = encode_tiff(gray, compression="deflate")
    out["tiff_deflate"] = _timed(
        lambda: decode_tiff(df_blob), gray.nbytes
    )

    # PDF text: 40-page flate document through the xref + content walk
    pages = [
        f"Page {i}: " + " ".join(f"word{j}" for j in range(200))
        for i in range(40)
    ]
    pdf_blob = make_pdf(pages)
    text_bytes = sum(len(p) for p in pages)
    out["pdf_text_extract"] = _timed(
        lambda: extract_pdf_text(pdf_blob), text_bytes
    )

    return out


if __name__ == "__main__":
    print(json.dumps(bench_all()))
