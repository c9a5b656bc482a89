"""bounded_inflate (operators/inflate.py): the shared allocation-
bounded zlib guard under PNG IDAT / PDF FlateDecode / TIFF Deflate.
"""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from clustering_spark.operators.inflate import bounded_inflate


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_exact_budget_roundtrips(data):
    assert bounded_inflate(zlib.compress(data), len(data)) == data


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=1, max_size=4096))
def test_one_byte_under_budget_raises(data):
    with pytest.raises(ValueError, match="budget"):
        bounded_inflate(zlib.compress(data), len(data) - 1)


def test_truncated_stream_raises():
    blob = zlib.compress(b"A" * 1000)
    with pytest.raises(ValueError, match="truncated"):
        bounded_inflate(blob[:-4], 2000)


def test_trailing_garbage_ignored_like_zlib_decompress():
    blob = zlib.compress(b"hello world")
    assert bounded_inflate(blob + b"garbage", 11) == b"hello world"


def test_garbage_input_is_value_error():
    with pytest.raises(ValueError, match="bad"):
        bounded_inflate(b"not a zlib stream at all", 100)


def test_bomb_never_allocates_past_budget():
    bomb = zlib.compress(b"\x00" * (64 * 1024 * 1024), 9)
    assert len(bomb) < 1024 * 1024
    with pytest.raises(ValueError, match="budget"):
        bounded_inflate(bomb, 1024)
