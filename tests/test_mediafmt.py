"""Codec-free header parsers for the compressed web-media containers
(operators/mediafmt.py): MP3 frame walk + Xing, FLAC STREAMINFO, Ogg
Vorbis/Opus pages, Matroska/WebM EBML — pure-Python analytic pins
plus the Spark family passes and the mixed-corpus router over all
fourteen routed formats in ONE scan.
"""

from __future__ import annotations

import struct

import pytest

from clustering_spark.operators import multimodal as mm
from clustering_spark.operators.mediafmt import (
    _flac_meta,
    _mkv_meta,
    _mp3_first_frame,
    _mp3_meta,
    _mp3_sniff,
    _ogg_meta,
    make_flac,
    make_mkv,
    make_mp3,
    make_ogg_opus,
    make_ogg_vorbis,
)


class TestMp3:
    def test_cbr_walk_exact_duration(self):
        b = make_mp3(n_frames=30, rate=44100, bitrate_kbps=128)
        ch, rate, n, dur = _mp3_meta(b)
        assert (ch, rate, n) == (2, 44100, 30 * 1152)
        assert dur == pytest.approx(30 * 1152 / 44100)

    def test_xing_tag_preferred_over_walk(self):
        # the Xing frame count is authoritative even when the blob is
        # truncated mid-stream (the whole point of the VBR tag)
        b = make_mp3(
            n_frames=500, rate=48000, bitrate_kbps=64, mono=True,
            xing=True,
        )
        ch, rate, n, dur = _mp3_meta(b[: len(b) // 2])
        assert (ch, rate, n) == (1, 48000, 500 * 1152)

    def test_id3v2_skip_and_mpeg2_spf(self):
        b = make_mp3(
            n_frames=20, rate=22050, bitrate_kbps=32, mpeg2=True,
            id3_pad=300,
        )
        assert _mp3_first_frame(b) == 310  # 10-byte header + pad
        ch, rate, n, dur = _mp3_meta(b)
        assert n == 20 * 576  # MPEG2 layer III: 576 samples/frame
        assert dur == pytest.approx(20 * 576 / 22050)

    def test_truncated_final_frame_not_counted(self):
        b = make_mp3(n_frames=10)[:-50]
        assert _mp3_meta(b)[2] == 9 * 1152

    def test_id3v1_trailer_ends_walk_cleanly(self):
        b = make_mp3(n_frames=5) + b"TAG" + bytes(125)
        assert _mp3_meta(b)[2] == 5 * 1152

    def test_sniff_rejects_lone_sync_bytes(self):
        # a random binary with 0xFF FB somewhere must NOT route as
        # mp3: the sniff is anchored at byte 0 with a second-frame
        # confirmation
        assert not _mp3_sniff(b"\x00\xff\xfb\x90" + bytes(400))
        assert not _mp3_sniff(b"\xff\xfb\x90\x00" + b"garbage" * 60)
        assert _mp3_sniff(make_mp3(n_frames=2))
        assert _mp3_sniff(make_mp3(n_frames=3, id3_pad=64))

    def test_id3_without_frames_is_corrupt(self):
        b = b"ID3\x03\x00\x00\x00\x00\x00\x10" + bytes(600)
        with pytest.raises(ValueError):
            _mp3_meta(b)


class TestFlac:
    def test_streaminfo_fields(self):
        b = make_flac(
            rate=22050, channels=2, bits=16, total_samples=44100
        )
        assert _flac_meta(b) == (2, 22050, 16, 44100, 2.0)

    def test_unknown_total_samples_is_null_duration(self):
        assert _flac_meta(make_flac(total_samples=0))[4] is None

    def test_mono_24bit_96k(self):
        b = make_flac(
            rate=96000, channels=1, bits=24, total_samples=480000
        )
        assert _flac_meta(b) == (1, 96000, 24, 480000, 5.0)

    def test_missing_streaminfo_raises(self):
        with pytest.raises(ValueError):
            _flac_meta(b"fLaC" + bytes([0x84]) + b"\x00\x00\x02ab")

    def test_zero_rate_raises(self):
        blob = bytearray(make_flac())
        # zero out the 20 sample-rate bits (top of byte 18..20 of the
        # streaminfo body at offset 8 header bytes)
        packed = int.from_bytes(blob[8 + 10 : 8 + 18], "big")
        packed &= (1 << 44) - 1
        blob[8 + 10 : 8 + 18] = packed.to_bytes(8, "big")
        with pytest.raises(ValueError):
            _flac_meta(bytes(blob))


class TestOgg:
    def test_vorbis_duration_from_last_granule(self):
        b = make_ogg_vorbis(rate=44100, channels=2, n_samples=88200)
        assert _ogg_meta(b) == ("ogg-vorbis", 2, 44100, 88200, 2.0)

    def test_opus_preskip_subtracted_at_48k(self):
        b = make_ogg_opus(channels=1, preskip=312, n_samples=96000)
        assert _ogg_meta(b) == ("ogg-opus", 1, 48000, 96000, 2.0)

    def test_unknown_codec_is_ogg_other(self):
        from clustering_spark.operators.mediafmt import _ogg_page

        b = _ogg_page(b"\x7fFLAC rest", granule=0, htype=2) + _ogg_page(
            b"x", granule=1000, htype=4, seq=1
        )
        fmt, ch, rate, n, dur = _ogg_meta(b)
        assert fmt == "ogg-other"
        assert (ch, rate, n, dur) == (None, None, None, None)

    def test_truncated_page_raises(self):
        b = make_ogg_vorbis()
        with pytest.raises(ValueError):
            _ogg_meta(b[:-10])

    def test_second_stream_granules_ignored(self):
        # a muxed second logical stream (different serial) must not
        # contribute its granule to the first stream's duration
        from clustering_spark.operators.mediafmt import _ogg_page

        ident = (
            b"\x01vorbis" + struct.pack("<I", 0) + bytes([1])
            + struct.pack("<Iiii", 8000, 0, 0, 0) + b"\xb8\x01"
        )
        b = (
            _ogg_page(ident, granule=0, serial=1, htype=2)
            + _ogg_page(b"other", granule=999999, serial=2, seq=0)
            + _ogg_page(b"end", granule=16000, serial=1, htype=4, seq=1)
        )
        assert _ogg_meta(b) == ("ogg-vorbis", 1, 8000, 16000, 2.0)


class TestMkv:
    def test_webm_video_fields(self):
        b = make_mkv(
            doctype="webm", duration_ms=2000.0,
            video_dims=(320, 240), n_audio_tracks=1,
        )
        assert _mkv_meta(b) == ("webm", 2, 320, 240, 2.0)

    def test_matroska_unknown_segment_size(self):
        b = make_mkv(
            doctype="matroska", video_dims=None, n_audio_tracks=2,
            unknown_segment_size=True,
        )
        assert _mkv_meta(b) == ("matroska", 2, None, None, 2.0)

    def test_timestamp_scale_applied(self):
        # 100 us ticks: 5000 ticks -> 0.5 s
        b = make_mkv(duration_ms=5000.0, ts_scale=100_000)
        assert _mkv_meta(b)[4] == pytest.approx(0.5)

    def test_element_overrunning_parent_raises(self):
        b = bytearray(make_mkv())
        # corrupt the Info element's size vint to overrun Segment
        idx = bytes(b).find(b"\x15\x49\xa9\x66")
        b[idx + 4] = 0x41  # 2-byte vint, huge size
        b[idx + 5] = 0xFF
        with pytest.raises(ValueError):
            _mkv_meta(bytes(b))

    def test_deep_nesting_is_iterative_not_recursive(self):
        # TrackEntries nested 4000 deep (4x the default Python
        # recursion limit): must walk with the explicit stack
        from clustering_spark.operators.mediafmt import _evint

        body = b""
        for _ in range(4000):
            body = b"\xae" + _evint(len(body)) + body
        header = b"\x1aE\xdf\xa3" + bytes([0x80])
        blob = header + b"\x18\x53\x80\x67" + b"\x01" + b"\xff" * 7 + body
        fmt, n_tracks, w, h, dur = _mkv_meta(blob)
        assert n_tracks == 4000


class TestSparkStages:
    def test_audio_header_meta_mixed_corpus(self, spark):
        rows = [
            (1, mm.make_wav(8000, sample_rate=8000)),
            (2, make_mp3(n_frames=30, rate=44100, bitrate_kbps=128)),
            (3, make_flac(rate=22050, channels=2, total_samples=44100)),
            (4, make_ogg_vorbis(rate=44100, channels=2, n_samples=88200)),
            (5, make_ogg_opus(channels=1, preskip=0, n_samples=48000)),
            (6, b"fLaC broken"),
            (7, b"not audio at all"),
            (8, None),
        ]
        df = spark.createDataFrame(rows, "id long, blob binary")
        out = (
            mm.audio_header_meta(df, "blob", "id")
            .toPandas()
            .set_index("id")
        )
        assert out.loc[1, "format"] == "wav-pcm"
        assert out.loc[2, "format"] == "mp3"
        assert out.loc[2, "n_frames"] == 30 * 1152
        assert out.loc[3, "format"] == "flac"
        assert out.loc[3, "bits_per_sample"] == 16
        assert out.loc[4, "format"] == "ogg-vorbis"
        assert out.loc[4, "duration_sec"] == pytest.approx(2.0)
        assert out.loc[5, "format"] == "ogg-opus"
        assert out.loc[5, "duration_sec"] == pytest.approx(1.0)
        assert out.loc[6, "format"] == "corrupt"
        assert out.loc[7, "format"] == "unknown"
        assert out.loc[8, "format"] == "unknown"

    def test_video_header_meta_routes_mkv(self, spark):
        rows = [
            (1, mm.make_mp4(duration_sec=3.0)),
            (2, make_mkv(doctype="webm", duration_ms=1500.0)),
            (3, make_mkv(doctype="matroska", duration_ms=750.0)),
        ]
        df = spark.createDataFrame(rows, "id long, blob binary")
        out = (
            mm.video_header_meta(df, "blob", "id")
            .toPandas()
            .set_index("id")
        )
        assert out.loc[1, "format"] == "mp4"
        assert out.loc[2, "format"] == "webm"
        assert out.loc[2, "duration_sec"] == pytest.approx(1.5)
        assert out.loc[2, "n_tracks"] == 2
        assert out.loc[3, "format"] == "matroska"
        # ISO-BMFF concepts stay NULL on EBML containers
        assert out.loc[2, "major_brand"] is None

    def test_router_all_formats_one_scan(self, spark):
        import numpy as np

        from clustering_spark.operators.gif import encode_gif

        rows = [
            (1, mm.make_fake_image(4, 3, fill=10)),
            (2, mm.make_png(2, 2, bytes(4), color_type=0)),
            (3, mm.make_wav(4000, sample_rate=8000)),
            (4, mm.make_mp4(duration_sec=2.5)),
            (5, mm.make_webp(64, 48)),
            (6, encode_gif(np.zeros((2, 2), dtype=np.uint8))),
            (7, make_mp3(n_frames=10)),
            (8, make_flac(total_samples=22050, rate=22050)),
            (9, make_ogg_opus(preskip=0, n_samples=24000)),
            (10, make_mkv(doctype="webm", video_dims=(160, 90))),
            (11, b"nothing recognizable here"),
        ]
        df = spark.createDataFrame(rows, "id long, blob binary")
        out = (
            mm.media_header_meta(df, "blob", "id")
            .toPandas()
            .set_index("id")
        )
        assert out.loc[1, "media_type"] == "image"
        assert out.loc[3, "media_type"] == "audio"
        assert out.loc[5, "format"] == "webp"
        assert out.loc[6, "format"] == "gif"
        assert out.loc[7, "format"] == "mp3"
        assert out.loc[7, "media_type"] == "audio"
        assert out.loc[8, "format"] == "flac"
        assert out.loc[8, "audio_duration_sec"] == pytest.approx(1.0)
        assert out.loc[9, "format"] == "ogg-opus"
        assert out.loc[9, "audio_duration_sec"] == pytest.approx(0.5)
        assert out.loc[10, "format"] == "webm"
        assert (out.loc[10, "width"], out.loc[10, "height"]) == (160, 90)
        assert out.loc[10, "media_type"] == "video"
        assert out.loc[11, "format"] == "unknown"


class TestGateFamilies:
    """Lock-step pins for the round-12 gate families 7-9 of
    synthetic_media_blob: the parser must recover exactly the
    arithmetic the DuckDB oracle computes (the pytest twin of the
    media_metadata hash gate, failing fast without DuckDB)."""

    def test_mp3_family_arithmetic(self):
        from clustering_spark.operators.multimodal import (
            synthetic_media_blob,
        )

        for d in (7, 17, 27, 37, 107, 997):
            ch, rate, n, dur = _mp3_meta(synthetic_media_blob(d))
            assert rate == (44100, 48000, 32000)[(d // 10) % 3]
            assert ch == (1 if (d // 10) % 2 == 0 else 2)
            assert n == (10 + d % 40) * 1152
            assert dur == (10 + d % 40) * 1152 / rate

    def test_flac_family_arithmetic(self):
        from clustering_spark.operators.multimodal import (
            synthetic_media_blob,
        )

        for d in (8, 18, 28, 38, 108, 998):
            ch, rate, bits, total, dur = _flac_meta(
                synthetic_media_blob(d)
            )
            assert rate == (22050, 44100, 96000)[(d // 10) % 3]
            assert ch == 1 + (d // 10) % 2
            assert dur == float(1 + d % 8)

    def test_mkv_family_arithmetic(self):
        from clustering_spark.operators.multimodal import (
            synthetic_media_blob,
        )

        for d in (9, 19, 29, 39, 109, 999):
            fmt, n_tracks, w, h, dur = _mkv_meta(synthetic_media_blob(d))
            assert fmt == ("webm" if (d // 10) % 2 else "matroska")
            assert n_tracks == 1 + (d // 10) % 2
            assert (w, h) == (16 + d % 300, 9 + (d // 5) % 200)
            assert dur == (1 + d % 12) / 4.0


def test_mutation_fuzz_degrade_contract():
    """Seeded mutation fuzz over every fixture x every parser
    (truncate / flip / delete / insert): parsers must either return
    or raise ValueError/struct.error — never IndexError, OverflowError
    or a hang. The test_jpeg fuzz doctrine applied to the four
    compressed-container passes (a 3000-trial sweep ran clean at
    review time; 800 here keeps the suite fast)."""
    import random

    from clustering_spark.operators.mediafmt import _ogg_page  # noqa: F401

    rng = random.Random(0xC0FFEE)
    fixtures = [
        make_mp3(n_frames=12),
        make_mp3(n_frames=6, xing=True, id3_pad=64),
        make_flac(),
        make_ogg_vorbis(),
        make_ogg_opus(),
        make_mkv(),
        make_mkv(unknown_segment_size=True),
    ]
    parsers = [
        lambda b: _mp3_meta(b) if _mp3_sniff(b) else None,
        _flac_meta,
        _ogg_meta,
        _mkv_meta,
    ]
    for _ in range(800):
        base = bytearray(rng.choice(fixtures))
        op = rng.randrange(4)
        if op == 0 and len(base) > 2:
            base = base[: rng.randrange(1, len(base))]
        elif op == 1:
            for _ in range(rng.randrange(1, 8)):
                base[rng.randrange(len(base))] = rng.randrange(256)
        elif op == 2:
            i = rng.randrange(len(base))
            del base[i : i + rng.randrange(1, 30)]
        else:
            i = rng.randrange(len(base))
            base[i:i] = bytes(
                rng.randrange(256) for _ in range(rng.randrange(1, 20))
            )
        blob = bytes(base)
        for fn in parsers:
            try:
                fn(blob)
            except (ValueError, struct.error):
                pass


def test_ogg_flac_identification():
    """FLAC-in-Ogg: the BOS payload embeds a verbatim fLaC+STREAMINFO
    stream at offset 9; rate/channels come from the native FLAC
    parser, duration from the terminal granule like any Ogg."""
    from clustering_spark.operators.mediafmt import _ogg_page

    flac_head = make_flac(
        rate=48000, channels=2, total_samples=0, frame_bytes=0
    )
    bos = b"\x7fFLAC\x01\x00\x00\x00" + flac_head
    b = _ogg_page(bos, granule=0, htype=2) + _ogg_page(
        b"frames", granule=96000, htype=4, seq=1
    )
    assert _ogg_meta(b) == ("ogg-flac", 2, 48000, 96000, 2.0)


class TestOggChainedAndMultiplexed:
    """Round-13 review batch 34: the two real-crawl Ogg layouts
    beyond a single logical stream (RFC 3533 §2)."""

    def test_multiplexed_video_first_still_finds_audio(self):
        from clustering_spark.operators.mediafmt import (
            _ogg_meta,
            _ogg_page,
        )

        # grouped BOS pages: an unrecognized (video-ish) stream on
        # serial 1 FIRST, vorbis on serial 2 — then interleaved data
        theora_bos = b"\x80theora" + bytes(40)
        vorbis_bos = (
            b"\x01vorbis" + bytes(4) + bytes([2])
            + __import__("struct").pack("<Iiii", 44100, 0, 0, 0)
            + b"\xb8\x01"
        )
        blob = (
            _ogg_page(theora_bos, granule=0, serial=1, htype=2, seq=0)
            + _ogg_page(vorbis_bos, granule=0, serial=2, htype=2, seq=0)
            + _ogg_page(b"v" * 20, granule=300, serial=1, seq=1)
            + _ogg_page(b"a" * 20, granule=44100, serial=2, seq=1)
            + _ogg_page(b"a" * 20, granule=88200, serial=2, htype=4, seq=2)
        )
        fmt, ch, rate, n, dur = _ogg_meta(blob)
        assert (fmt, ch, rate, n) == ("ogg-vorbis", 2, 44100, 88200)
        assert dur == 2.0
        # the video serial's granules (a different clock!) never
        # leak into the audio duration

    def test_chained_streams_sum_durations(self):
        from clustering_spark.operators.mediafmt import (
            _ogg_meta,
            make_ogg_vorbis,
        )

        one = make_ogg_vorbis(rate=8000, channels=1, n_samples=8000)
        two = make_ogg_vorbis(rate=8000, channels=1, n_samples=4000)
        # chained = concatenated; the second chain reuses serial 1,
        # which real muxers avoid — give it a distinct serial by
        # patching the serial field of both its pages
        two = bytearray(two)
        i = 0
        while (i := two.find(b"OggS", i)) >= 0:
            two[i + 14 : i + 18] = (7).to_bytes(4, "little")
            i += 4
        fmt, ch, rate, n, dur = _ogg_meta(one + bytes(two))
        assert (fmt, ch, rate) == ("ogg-vorbis", 1, 8000)
        assert n == 12000 and dur == 1.5

    def test_chained_different_shape_not_summed(self):
        from clustering_spark.operators.mediafmt import (
            _ogg_meta,
            make_ogg_vorbis,
        )

        one = make_ogg_vorbis(rate=8000, channels=1, n_samples=8000)
        two = bytearray(
            make_ogg_vorbis(rate=44100, channels=2, n_samples=44100)
        )
        i = 0
        while (i := two.find(b"OggS", i)) >= 0:
            two[i + 14 : i + 18] = (9).to_bytes(4, "little")
            i += 4
        fmt, ch, rate, n, dur = _ogg_meta(one + bytes(two))
        # selected stream = first chain; the differently-shaped chain
        # cannot contribute samples to an 8 kHz mono total
        assert (fmt, ch, rate, n, dur) == ("ogg-vorbis", 1, 8000, 8000, 1.0)


class TestLoopTerminationPins:
    """Round-14 review batch 4: the container walks' progress
    guarantees, pinned against the crafted inputs that would exploit
    them — zero-payload pages, zero-size containers, lying tag
    sizes. Every case must terminate promptly in a value or a
    ValueError, never hang."""

    def test_ogg_zero_segment_pages_advance(self):
        from clustering_spark.operators.mediafmt import _ogg_pages

        # 200 pages with nsegs=0 (27-byte headers, no payload):
        # each still advances the cursor by its header size
        # OggS + version + htype + granule(8) + serial(4) + seq(4)
        # + crc(4) + nsegs(1) = 27 bytes
        page = (
            b"OggS" + b"\x00\x00" + struct.pack("<q", -1)
            + struct.pack("<I", 7) + b"\x00" * 8 + b"\x00"
        )
        assert len(page) == 27
        pages = list(_ogg_pages(page * 200))
        assert len(pages) == 200
        assert all(ps == pe for _h, _g, _s, ps, pe in pages)

    def test_ebml_zero_size_containers_terminate(self):
        from clustering_spark.operators.mediafmt import (
            _eel,
            _mkv_meta,
        )

        # EBML header then a Segment stuffed with zero-size cluster
        # containers: each push/pop must make progress
        seg_body = (b"\x1fC\xb6u" + b"\x80") * 300  # Cluster, size 0
        blob = (
            _eel(b"\x1aE\xdf\xa3", b"")
            + _eel(b"\x18S\x80g", seg_body)
        )
        fmt, n_tracks, w, h, dur = _mkv_meta(blob)
        assert fmt == "matroska" and n_tracks == 0

    def test_mp3_lying_id3_size_raises_not_scans_forever(self):
        from clustering_spark.operators.mediafmt import (
            _mp3_first_frame,
        )

        # syncsafe size claims ~256 MB on a 50-byte blob: the scan
        # window starts past EOF and must raise immediately
        blob = b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f" + b"\x00" * 40
        with pytest.raises(ValueError, match="sync"):
            _mp3_first_frame(blob)

    def test_mp3_all_sync_bytes_bounded_scan(self):
        import time

        from clustering_spark.operators.mediafmt import (
            _mp3_first_frame,
        )

        # 0xFF runs look like syncs but never confirm: the scan is
        # bounded by the window, not the blob
        blob = b"\xff" * 100_000
        t0 = time.time()
        try:
            _mp3_first_frame(blob)
        except ValueError:
            pass
        assert time.time() - t0 < 5.0
