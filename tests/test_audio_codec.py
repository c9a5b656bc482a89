"""WAV codec widening (operators/audio_codec.py): G.711 mu-law/A-law,
integer PCM 8/24/32, IEEE float, IMA ADPCM, WAVE_FORMAT_EXTENSIBLE —
round-trip pins through the module's own fixture encoders (no binary
test assets), G.711 table properties pinned against the public spec,
and the audio_features integration across codec families.
"""

import struct

import numpy as np
import pytest

from clustering_spark.operators.audio_codec import (
    ALAW_TABLE,
    ULAW_TABLE,
    decode_wav_samples,
    encode_alaw,
    encode_ulaw,
    make_wav_ex,
)


def _sine(n=4000, rate=8000, f=440.0, a=0.5):
    t = np.arange(n) / rate
    return a * np.sin(2 * np.pi * f * t)


class TestG711Tables:
    def test_ulaw_spec_properties(self):
        # max magnitude of the 16-bit expansion is 32124 (G.711 /
        # audioop scaling); the table is antisymmetric under the sign
        # bit and contains zero
        assert ULAW_TABLE.max() == 32124
        assert ULAW_TABLE.min() == -32124
        flipped = ULAW_TABLE[np.arange(256) ^ 0x80]
        assert (ULAW_TABLE == -flipped).all()
        assert 0 in ULAW_TABLE

    def test_alaw_spec_properties(self):
        assert ALAW_TABLE.max() == 32256
        assert ALAW_TABLE.min() == -32256
        flipped = ALAW_TABLE[np.arange(256) ^ 0x80]
        assert (ALAW_TABLE == -flipped).all()
        # A-law has no exact zero: smallest magnitude is 8
        assert np.abs(ALAW_TABLE).min() == 8

    @pytest.mark.parametrize(
        "table,encode", [(ULAW_TABLE, encode_ulaw), (ALAW_TABLE, encode_alaw)]
    )
    def test_encode_inverts_decode_exactly(self, table, encode):
        # every codeword's decoded value must re-encode to a codeword
        # with the SAME decoded value (codes may alias at +/-0)
        vals = table.astype(np.float64) / 32768.0
        codes = encode(vals)
        assert (table[codes] == table).all()

    @pytest.mark.parametrize("encode", [encode_ulaw, encode_alaw])
    def test_encode_is_nearest_quantizer(self, encode):
        # encode picks the codeword minimizing |error| — check against
        # a brute-force argmin on a sample grid
        table = ULAW_TABLE if encode is encode_ulaw else ALAW_TABLE
        xs = np.linspace(-1, 1, 997)
        got = table[encode(xs)]
        brute_err = np.abs(
            table[None, :] - np.clip(xs * 32768, -32768, 32767)[:, None]
        ).min(axis=1)
        got_err = np.abs(got - np.clip(xs * 32768, -32768, 32767))
        assert (got_err <= brute_err + 1e-9).all()


class TestRoundTrips:
    @pytest.mark.parametrize(
        "codec,tol",
        [
            ("pcm8", 1 / 120.0),
            ("pcm16", 1 / 30000.0),
            ("pcm24", 1e-6),
            ("pcm32", 1e-9),
            ("float32", 1e-7),
            ("float64", 0.0),
            ("ulaw", 0.02),   # companding noise at 0.5 amplitude
            ("alaw", 0.02),
        ],
    )
    def test_sine_roundtrip(self, codec, tol):
        x = _sine()
        y, rate = decode_wav_samples(make_wav_ex(x, 8000, codec))
        assert rate == 8000
        assert y.shape == (len(x), 1)
        assert np.abs(y[:, 0] - x).max() <= tol

    def test_ima_adpcm_roundtrip_steady_state(self):
        # the 4-bit predictor needs ~50 samples to adapt from index 0;
        # steady-state tracking error on a 440 Hz sine is a few percent
        x = _sine()
        y, rate = decode_wav_samples(make_wav_ex(x, 8000, "ima-adpcm"))
        assert rate == 8000
        n = len(x)
        assert np.abs(y[100:n, 0] - x[100:]).max() < 0.05

    def test_ima_adpcm_stereo_channel_separation(self):
        x = _sine(n=2048)
        xs = np.stack([x, -x], axis=1)
        y, _ = decode_wav_samples(make_wav_ex(xs, 8000, "ima-adpcm"))
        n = len(x)
        assert y.shape[1] == 2
        assert np.abs(y[100:n, 0] - x[100:]).max() < 0.05
        assert np.abs(y[100:n, 1] + x[100:]).max() < 0.05

    def test_stereo_pcm_interleave(self):
        x = _sine(n=1000)
        xs = np.stack([x, 0.25 * np.ones_like(x)], axis=1)
        y, _ = decode_wav_samples(make_wav_ex(xs, 8000, "pcm16"))
        assert np.abs(y[:, 0] - x).max() < 1e-3
        assert np.abs(y[:, 1] - 0.25).max() < 1e-3

    def test_extensible_resolves_subformat(self):
        x = _sine(n=500)
        for codec in ("pcm16", "float32", "ulaw"):
            y, _ = decode_wav_samples(
                make_wav_ex(x, 8000, codec, extensible=True)
            )
            assert np.abs(y[: len(x), 0] - x).max() < 0.02


class TestHonestGates:
    def test_unknown_format_code_raises_not_implemented(self):
        b = make_wav_ex(_sine(n=100), 8000, "pcm16")
        # format code 0x55 = MPEG Layer 3 in WAV: no stdlib decoder
        bad = b.replace(struct.pack("<H", 1), struct.pack("<H", 0x55), 1)
        with pytest.raises(NotImplementedError, match="0x0055"):
            decode_wav_samples(bad)

    def test_malformed_container_raises_value_error(self):
        with pytest.raises(ValueError):
            decode_wav_samples(b"RIFF\x00\x00\x00\x00JUNK")
        with pytest.raises(ValueError):
            decode_wav_samples(b"")

    def test_missing_data_chunk_raises(self):
        b = make_wav_ex(_sine(n=10), 8000, "pcm16")
        cut = b[: b.find(b"data")]
        with pytest.raises(ValueError, match="missing fmt or data"):
            decode_wav_samples(cut)

    def test_ima_bad_step_index_raises(self):
        b = make_wav_ex(_sine(n=100), 8000, "ima-adpcm")
        pos = b.find(b"data") + 8 + 2  # step-index byte of block 0
        bad = b[:pos] + bytes([200]) + b[pos + 1 :]
        with pytest.raises(ValueError, match="step index"):
            decode_wav_samples(bad)

    def test_ima_degenerate_block_align_raises(self):
        b = make_wav_ex(_sine(n=100), 8000, "ima-adpcm")
        fmt_at = b.find(b"fmt ") + 8
        # block_align lives at fmt body offset 12
        bad = b[: fmt_at + 12] + struct.pack("<H", 2) + b[fmt_at + 14 :]
        with pytest.raises(ValueError, match="block_align"):
            decode_wav_samples(bad)


class TestSparkIntegration:
    def test_features_across_codec_families(self, spark):
        import math

        from clustering_spark.operators.multimodal import audio_features

        x = _sine(n=8000, rate=8000, f=400.0, a=0.5)
        rows = [
            (1, bytearray(make_wav_ex(x, 8000, "ulaw"))),
            (2, bytearray(make_wav_ex(x, 8000, "alaw"))),
            (3, bytearray(make_wav_ex(x, 8000, "float32"))),
            (4, bytearray(make_wav_ex(x, 8000, "ima-adpcm"))),
            (5, bytearray(make_wav_ex(x, 8000, "pcm24"))),
            # mp3-in-wav: decodable header, honest NULL features
            (6, bytearray(
                make_wav_ex(x[:100], 8000, "pcm16").replace(
                    struct.pack("<H", 1), struct.pack("<H", 0x55), 1
                )
            )),
            (7, None),
        ]
        df = spark.createDataFrame(rows, "id long, blob binary")
        got = {
            r["id"]: r.asDict()
            for r in audio_features(df, "blob", "id").collect()
        }
        for rid in (1, 2, 3, 4, 5):
            assert abs(got[rid]["rms"] - 0.5 / math.sqrt(2)) < 0.02, rid
        # exact codecs: centroid pins tight on the tone
        for rid in (3, 5):
            assert abs(got[rid]["spectral_centroid_hz"] - 400.0) < 10.0, rid
            assert got[rid]["spectral_bandwidth_hz"] < 120.0, rid
        # companded codecs: broadband quantization noise pulls the
        # magnitude-weighted centroid up from the tone (400 Hz) toward
        # the white-noise expectation (rate/4 = 2000 Hz) — G.711's
        # ~38 dB SNR keeps it near the tone, IMA's 4 bits less so; the
        # pin is "tone dominant": centroid at least the tone, well
        # below noise-only
        for rid in (1, 2):
            assert 390.0 < got[rid]["spectral_centroid_hz"] < 800.0, rid
        assert 390.0 < got[4]["spectral_centroid_hz"] < 1600.0
        assert got[6]["rms"] is None
        assert got[7]["rms"] is None

    def test_header_meta_names_codec_families(self, spark):
        from clustering_spark.operators.multimodal import audio_header_meta

        x = _sine(n=2020)  # 4 full 505-sample IMA blocks
        rows = [
            (1, bytearray(make_wav_ex(x, 8000, "ulaw"))),
            (2, bytearray(make_wav_ex(x, 8000, "alaw"))),
            (3, bytearray(make_wav_ex(x, 8000, "float64"))),
            (4, bytearray(make_wav_ex(x, 8000, "ima-adpcm"))),
            (5, bytearray(make_wav_ex(x, 8000, "pcm16", extensible=True))),
        ]
        df = spark.createDataFrame(rows, "id long, blob binary")
        got = {
            r["id"]: r.asDict()
            for r in audio_header_meta(df, "blob", "id").collect()
        }
        assert got[1]["format"] == "wav-ulaw"
        assert got[2]["format"] == "wav-alaw"
        assert got[3]["format"] == "wav-float"
        assert got[4]["format"] == "wav-ima-adpcm"
        # block codec frame count uses wSamplesPerBlock, not blocks
        assert got[4]["n_frames"] == 2020
        # extensible resolves through the SubFormat GUID
        assert got[5]["format"] == "wav-pcm"
        assert got[5]["n_frames"] == 2020


def test_fact_chunk_gives_exact_frames_for_short_adpcm(spark):
    """Non-PCM WAVs carry a spec-required fact chunk with the exact
    per-channel frame count. For an ADPCM clip SHORTER than one block
    (505 samples), data_size // block_align is 0 — only the fact chunk
    yields the true count. This path is also on the media_metadata
    hash gate (fam-1 blobs vary their codec arithmetically)."""
    import numpy as np

    from clustering_spark.operators.multimodal import audio_header_meta

    blob = make_wav_ex(np.zeros(150), 8000, "ima-adpcm")
    assert b"fact" in blob
    df = spark.createDataFrame([(1, bytearray(blob))], "id long, blob binary")
    r = audio_header_meta(df, "blob", "id").collect()[0]
    assert r["format"] == "wav-ima-adpcm"
    assert r["n_frames"] == 150
    assert abs(r["duration_sec"] - 150 / 8000) < 1e-12
