"""Perceptual audio fingerprint (multimodal._audio_fp64 /
audio_fingerprint / audio_neardup_pairs): the audio analogue of the
image dHash — spectral-mask bits over time-averaged log-spaced band
energies. Pins: exact invariance under volume / resample / every
covered codec re-encode, discrimination between different content,
NULL degrade, and the pigeonhole pair-search composition that finds
cross-codec duplicates in a mixed corpus.
"""

import numpy as np
import pytest

from clustering_spark.operators.audio_codec import (
    decode_wav_samples,
    make_wav_ex,
)
from clustering_spark.operators.multimodal import (
    _audio_fp64,
    audio_fingerprint,
    audio_neardup_pairs,
)


def _fp(blob: bytes):
    frames, rate = decode_wav_samples(blob)
    return _audio_fp64(frames.mean(axis=1), rate)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def _content(seed: int, n=16000, rate=8000):
    """Deterministic multi-tone 'content': a handful of random tones
    in the fingerprint's 300-3500 Hz analysis range."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    amps = rng.uniform(0.05, 0.2, 8)
    freqs = rng.uniform(300, 3400, 8)
    return sum(a * np.sin(2 * np.pi * f * t) for a, f in zip(amps, freqs))


class TestInvariance:
    def test_codec_reencodes_bit_identical(self):
        x = _content(1)
        ref = _fp(make_wav_ex(x, 8000, "pcm16"))
        for codec in ("pcm8", "pcm24", "float32", "ulaw", "alaw",
                      "ima-adpcm"):
            assert _ham(ref, _fp(make_wav_ex(x, 8000, codec))) <= 2, codec

    def test_volume_exactly_invariant(self):
        x = _content(2)
        ref = _fp(make_wav_ex(x, 8000, "pcm16"))
        for gain in (0.1, 0.5, 0.9):
            assert _fp(make_wav_ex(gain * x, 8000, "pcm16")) == ref

    def test_sample_rate_invariant(self):
        x = _content(3)
        t8 = np.arange(len(x)) / 8000
        x16 = np.interp(np.arange(2 * len(x)) / 16000, t8, x)
        ref = _fp(make_wav_ex(x, 8000, "pcm16"))
        assert _ham(ref, _fp(make_wav_ex(x16, 16000, "pcm16"))) <= 2

    def test_stereo_matches_mono(self):
        x = _content(4)
        mono = _fp(make_wav_ex(x, 8000, "pcm16"))
        stereo = _fp(make_wav_ex(np.stack([x, x], axis=1), 8000, "pcm16"))
        assert mono == stereo


class TestDiscrimination:
    def test_different_content_far_apart(self):
        fps = [_fp(make_wav_ex(_content(s), 8000, "pcm16"))
               for s in range(10, 16)]
        for i in range(len(fps)):
            for j in range(i + 1, len(fps)):
                assert _ham(fps[i], fps[j]) >= 8, (i, j)

    def test_noise_vs_tone_far_apart(self):
        rng = np.random.default_rng(7)
        noise = np.clip(0.3 * rng.standard_normal(16000), -1, 1)
        a = _fp(make_wav_ex(_content(20), 8000, "pcm16"))
        b = _fp(make_wav_ex(noise, 8000, "pcm16"))
        assert _ham(a, b) >= 10


class TestDegrade:
    def test_silence_and_short_are_none(self):
        assert _fp(make_wav_ex(np.zeros(8000), 8000, "pcm16")) is None
        assert _fp(make_wav_ex(_content(5)[:500], 8000, "pcm16")) is None


class TestSpark:
    def test_fingerprint_mixed_corpus(self, spark):
        x = _content(30)
        rows = [
            (1, bytearray(make_wav_ex(x, 8000, "pcm16"))),
            (2, bytearray(make_wav_ex(x, 8000, "ulaw"))),
            (3, bytearray(make_wav_ex(np.zeros(8000), 8000, "pcm16"))),
            (4, bytearray(b"not audio")),
            (5, None),
        ]
        df = spark.createDataFrame(rows, "id long, blob binary")
        got = {
            r["id"]: r["afp"]
            for r in audio_fingerprint(df, "blob", "id").collect()
        }
        assert got[1] is not None and _ham(got[1], got[2]) <= 2
        assert got[3] is None and got[4] is None and got[5] is None

    def test_neardup_pairs_find_cross_codec_duplicates(self, spark):
        xa, xb = _content(40), _content(41)
        rows = [
            (1, bytearray(make_wav_ex(xa, 8000, "pcm16"))),
            (2, bytearray(make_wav_ex(xa, 8000, "ima-adpcm"))),  # dup of 1
            (3, bytearray(make_wav_ex(0.5 * xa, 8000, "ulaw"))),  # dup of 1
            (4, bytearray(make_wav_ex(xb, 8000, "pcm16"))),  # distinct
            (5, bytearray(b"garbage")),
        ]
        df = spark.createDataFrame(rows, "id long, blob binary")
        pairs = {
            (r["id_a"], r["id_b"])
            for r in audio_neardup_pairs(df, "blob", "id").collect()
        }
        assert pairs == {(1, 2), (1, 3), (2, 3)}

    def test_int64_exactness_in_mixed_null_batches(self, spark):
        # same trap as image_dhash: None + wide int64 must not float64
        x = _content(50)
        blob = make_wav_ex(x, 8000, "pcm16")
        expect = _fp(blob)
        df = spark.createDataFrame(
            [(1, bytearray(blob)), (2, None)], "id long, blob binary"
        ).coalesce(1)
        got = {
            r["id"]: r["afp"]
            for r in audio_fingerprint(df, "blob", "id").collect()
        }
        assert got[1] == expect and got[2] is None
