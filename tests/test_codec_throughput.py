"""Bounded decode-throughput floors for the pure-Python codec
kernels (tools/codec_bench.py). The floors sit 5-10x below the
measured idle-box medians (PERFORMANCE.md round-13 table), so VM
jitter cannot trip them — but the complexity-class regressions they
exist for (the round-13 find: TIFF LZW's unbounded bignum bitbuf
made decode QUADRATIC, 0.01 MB/s vs 1.7 fixed — a 170x silent
slowdown that every correctness test passed) blow straight through
a 10x margin."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def rates():
    from tools import codec_bench

    codec_bench.REPS = 1  # floors, not medians — one timed rep each
    return codec_bench.bench_all()


# kernel -> MB/s floor (~5-10x under measured idle medians)
FLOORS = {
    "png_paeth_unfilter": 0.3,
    "gif_lzw": 0.15,
    "tiff_lzw": 0.15,
    "tiff_packbits": 1.5,
    "jpeg_baseline": 0.10,
    "jpeg_progressive": 0.05,
    "ccitt_g4": 0.4,
    "ccitt_g3_2d": 0.3,
    "jpeg_lossless": 0.02,
    "tiff_deflate": 3.0,
    "pdf_text_extract": 0.3,
}


@pytest.mark.parametrize("kernel", sorted(FLOORS))
def test_kernel_throughput_floor(rates, kernel):
    assert kernel in rates, f"codec_bench no longer measures {kernel}"
    got = rates[kernel]["mb_per_s_min"]
    assert got >= FLOORS[kernel], (
        f"{kernel} decodes at {got} MB/s, under the {FLOORS[kernel]}"
        " MB/s floor — a complexity-class regression, not jitter"
        " (floors sit 5-10x below idle-box medians)"
    )
