"""Codec-free header parsers for the compressed web-audio/video
containers beyond the RIFF / ISO-BMFF families: MP3 (MPEG audio frame
walk + Xing/Info/VBRI tags), FLAC (STREAMINFO), Ogg (Vorbis/Opus
identification headers + terminal granule position), and
Matroska/WebM (EBML element walk).

These are the four highest-frequency media containers in a real web
crawl that the engine's mixed-corpus router (multimodal.
media_header_meta) did not yet name — a 100 TB curation pass needs
duration/rate/channel/dimension filters over them long before any
codec runs. Everything here parses container STRUCTURE only (frame
headers, metadata blocks, page headers, EBML elements), never the
entropy-coded payload, so each blob costs O(header bytes) — the same
posture as the JPEG SOF walk and the WAV chunk walk.

All formats are public specifications: ISO/IEC 11172-3 / 13818-3
(MPEG audio framing), the Xing/VBRI tag layouts, the FLAC format
spec (streaminfo bit packing), RFC 3533 (Ogg framing) + the Vorbis I
spec / RFC 7845 (Opus-in-Ogg), and the Matroska EBML spec (RFC 8794).
The reference repo has no media surface at all (SURVEY.md §7.6) —
this module is part of the beyond-reference multimodal block.

Degrade contract (shared with multimodal.py): parsers raise
ValueError on structural nonsense; the Spark stages map that to
format='corrupt' rows — one bad blob never fails a batch.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------- MP3

# bitrate tables in kbit/s, indexed [version-group][layer][idx];
# version-group 0 = MPEG1, 1 = MPEG2/2.5; idx 0 is the "free" format
# (frame size not derivable from the header -> unsupported), idx 15
# is forbidden by the spec.
_MP3_BITRATES = (
    (
        (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
         384, 416, 448),  # layer I
        (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
         256, 320, 384),  # layer II
        (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
         224, 256, 320),  # layer III
    ),
    (
        (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176,
         192, 224, 256),  # layer I
        (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
         128, 144, 160),  # layer II
        (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
         128, 144, 160),  # layer III
    ),
)
# sample-rate tables indexed [version bits][idx] (version bits:
# 0 = MPEG2.5, 2 = MPEG2, 3 = MPEG1; 1 is reserved)
_MP3_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def _mp3_frame_at(b: bytes, pos: int):
    """Decode one MPEG audio frame header at ``pos``. Returns
    (frame_size, sample_rate, samples_per_frame, n_channels, version
    bits) or None when the four bytes there are not a valid header
    (bad sync, reserved version/layer, free/forbidden bitrate,
    reserved sample rate)."""
    if pos + 4 > len(b):
        return None
    (h,) = struct.unpack(">I", b[pos : pos + 4])
    if h >> 21 != 0x7FF:
        return None
    ver = (h >> 19) & 3  # 0=MPEG2.5, 2=MPEG2, 3=MPEG1
    layer_bits = (h >> 17) & 3  # 1=III, 2=II, 3=I
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    pad = (h >> 9) & 1
    mode = (h >> 6) & 3  # 3 = single channel
    if ver == 1 or layer_bits == 0 or br_idx in (0, 15) or sr_idx == 3:
        return None
    layer = 4 - layer_bits  # 1, 2, 3
    vgroup = 0 if ver == 3 else 1
    bitrate = _MP3_BITRATES[vgroup][layer - 1][br_idx] * 1000
    rate = _MP3_RATES[ver][sr_idx]
    if layer == 1:
        spf = 384
        size = (12 * bitrate // rate + pad) * 4
    else:
        spf = 1152 if (layer == 2 or ver == 3) else 576
        size = spf // 8 * bitrate // rate + pad
    channels = 1 if mode == 3 else 2
    return size, rate, spf, channels, ver


def _id3v2_size(b: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 when absent). The
    28-bit size is sync-safe (7 bits per byte); bit 4 of the flags
    adds a 10-byte footer."""
    if len(b) < 10 or b[:3] != b"ID3":
        return 0
    flags = b[5]
    size = (
        (b[6] & 0x7F) << 21
        | (b[7] & 0x7F) << 14
        | (b[8] & 0x7F) << 7
        | (b[9] & 0x7F)
    )
    return 10 + size + (10 if flags & 0x10 else 0)


# how far past the ID3 tag we scan for the first frame sync — some
# encoders pad the gap; beyond this the blob is not worth trusting
_MP3_SYNC_WINDOW = 4096


def _mp3_first_frame(b: bytes) -> int:
    """Offset of the first trustworthy frame header: a valid header
    whose computed size lands either at end-of-blob or on ANOTHER
    valid header (sync confirmation — a lone 0xFFEx in random bytes
    does not survive this). Raises ValueError when none exists in
    the scan window."""
    start = _id3v2_size(b)
    end = min(len(b), start + _MP3_SYNC_WINDOW)
    for pos in range(start, end):
        fr = _mp3_frame_at(b, pos)
        if fr is None:
            continue
        nxt = pos + fr[0]
        if nxt >= len(b) or _mp3_frame_at(b, nxt) is not None:
            return pos
    raise ValueError("no MPEG audio frame sync")


def _mp3_sniff(b: bytes) -> bool:
    """Cheap router predicate: a leading ID3v2 tag, or a confirmed
    frame header at byte 0 (the strict two-frame rule of
    _mp3_first_frame, anchored to offset 0 so arbitrary binaries
    with an interior 0xFF byte never route here)."""
    if b[:3] == b"ID3":
        return True
    fr = _mp3_frame_at(b, 0)
    if fr is None:
        return False
    nxt = fr[0]
    return nxt >= len(b) or _mp3_frame_at(b, nxt) is not None


def _mp3_meta(b: bytes) -> tuple[int, int, int, float]:
    """(n_channels, sample_rate, n_samples, duration_sec) from the
    frame-header walk. A Xing/Info/VBRI tag in the first frame gives
    the frame count directly (the VBR case — and the tag frame
    itself carries no audio, so it is not double-counted); otherwise
    every frame header is visited (each frame's size comes from its
    OWN header, so bitrate-varying files without a tag still sum
    correctly) and a truncated final frame is not counted. Trailing
    non-frame bytes (an ID3v1 'TAG' trailer) end the walk cleanly."""
    pos = _mp3_first_frame(b)
    size, rate, spf, channels, ver = _mp3_frame_at(b, pos)
    # Xing/Info sits after the side-info block whose size depends on
    # version and channel count; VBRI sits at a fixed 32-byte offset
    side = (17 if channels == 1 else 32) if ver == 3 else (
        9 if channels == 1 else 17
    )
    tag_off = pos + 4 + side
    tag = b[tag_off : tag_off + 4]
    frames = None
    if tag in (b"Xing", b"Info"):
        (flags,) = struct.unpack(
            ">I", b[tag_off + 4 : tag_off + 8].ljust(4, b"\x00")
        )
        if flags & 1 and tag_off + 12 <= len(b):
            (frames,) = struct.unpack(">I", b[tag_off + 8 : tag_off + 12])
    elif b[pos + 36 : pos + 40] == b"VBRI" and pos + 36 + 18 <= len(b):
        (frames,) = struct.unpack(">I", b[pos + 36 + 14 : pos + 36 + 18])
    if frames is None:
        frames = 0
        while True:
            fr = _mp3_frame_at(b, pos)
            if fr is None or pos + fr[0] > len(b):
                break
            frames += 1
            pos += fr[0]
    n_samples = frames * spf
    return channels, rate, n_samples, n_samples / rate


def make_mp3(
    n_frames: int = 30,
    rate: int = 44100,
    bitrate_kbps: int = 128,
    mono: bool = False,
    xing: bool = False,
    id3_pad: int = 0,
    mpeg2: bool = False,
) -> bytes:
    """Deterministic spec-shaped MPEG Layer III fixture: ``n_frames``
    audio frames (payload bytes are arithmetic filler — the parsers
    never read them), optionally fronted by an ID3v2 tag of
    ``id3_pad`` content bytes and/or a Xing-tagged VBR header frame
    carrying the frame count."""
    ver = 2 if mpeg2 else 3
    vgroup = 0 if ver == 3 else 1
    br_idx = _MP3_BITRATES[vgroup][2].index(bitrate_kbps)
    sr_idx = _MP3_RATES[ver].index(rate)
    mode = 3 if mono else 0
    h = (
        0x7FF << 21 | ver << 19 | 1 << 17  # layer III
        | br_idx << 12 | sr_idx << 10 | 0 << 9 | mode << 6
    )
    header = struct.pack(">I", h)
    spf = 1152 if ver == 3 else 576
    size = spf // 8 * (bitrate_kbps * 1000) // rate
    out = bytearray()
    if id3_pad:
        out += b"ID3\x03\x00\x00" + bytes(
            [(id3_pad >> 21) & 0x7F, (id3_pad >> 14) & 0x7F,
             (id3_pad >> 7) & 0x7F, id3_pad & 0x7F]
        )
        out += bytes(i % 251 for i in range(id3_pad))
    if xing:
        side = (17 if mono else 32) if ver == 3 else (9 if mono else 17)
        frame = bytearray(header)
        frame += bytes(side)
        frame += b"Xing" + struct.pack(">II", 1, n_frames)
        frame += bytes(max(0, size - len(frame)))
        out += frame[:size]
    for i in range(n_frames):
        frame = bytearray(header)
        frame += bytes((i * 7 + j) % 251 for j in range(size - 4))
        out += frame
    return bytes(out)


# --------------------------------------------------------------- FLAC


def _flac_meta(b: bytes) -> tuple[int, int, int, int, float | None]:
    """(n_channels, sample_rate, bits_per_sample, total_samples,
    duration_sec) from the STREAMINFO metadata block. total_samples
    of 0 means 'unknown' per spec -> duration None. Raises
    ValueError on a missing/truncated STREAMINFO or a zero sample
    rate."""
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    while pos + 4 <= len(b):
        hdr = b[pos]
        btype = hdr & 0x7F
        size = int.from_bytes(b[pos + 1 : pos + 4], "big")
        body = b[pos + 4 : pos + 4 + size]
        if btype == 0:
            if len(body) < 34:
                raise ValueError("truncated STREAMINFO")
            packed = int.from_bytes(body[10:18], "big")
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bits = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            if rate == 0:
                raise ValueError("zero sample rate in STREAMINFO")
            return (
                channels, rate, bits, total,
                total / rate if total else None,
            )
        if hdr & 0x80:  # last-metadata-block flag, STREAMINFO unseen
            break
        pos += 4 + size
    raise ValueError("no STREAMINFO block")


def make_flac(
    rate: int = 22050,
    channels: int = 2,
    bits: int = 16,
    total_samples: int = 44100,
    frame_bytes: int = 64,
) -> bytes:
    """Deterministic FLAC fixture: the mandatory STREAMINFO block
    (marked last) followed by ``frame_bytes`` of arithmetic filler
    standing in for the audio frames the parser never touches."""
    packed = (
        rate << 44
        | (channels - 1) << 41
        | (bits - 1) << 36
        | total_samples
    )
    info = (
        struct.pack(">HH", 1024, 1024)  # min/max blocksize
        + b"\x00\x00\x00" * 2  # min/max framesize (unknown)
        + packed.to_bytes(8, "big")
        + bytes(16)  # md5 of the unencoded audio (unset)
    )
    return (
        b"fLaC"
        + bytes([0x80]) + len(info).to_bytes(3, "big") + info
        + bytes(i % 251 for i in range(frame_bytes))
    )


# ---------------------------------------------------------------- Ogg


def _ogg_pages(b: bytes):
    """Yield (header_type, granule, serial, payload_start,
    payload_end) for each Ogg page. Raises ValueError on lost sync
    or a page that overruns the blob."""
    pos = 0
    while pos + 27 <= len(b):
        if b[pos : pos + 4] != b"OggS":
            raise ValueError("lost Ogg page sync")
        htype = b[pos + 5]
        (granule,) = struct.unpack("<q", b[pos + 6 : pos + 14])
        (serial,) = struct.unpack("<I", b[pos + 14 : pos + 18])
        nsegs = b[pos + 26]
        lacing = b[pos + 27 : pos + 27 + nsegs]
        if len(lacing) < nsegs:
            raise ValueError("truncated lacing table")
        ps = pos + 27 + nsegs
        pe = ps + sum(lacing)
        if pe > len(b):
            raise ValueError("page overruns blob")
        yield htype, granule, serial, ps, pe
        pos = pe
    if pos != len(b):
        raise ValueError("trailing bytes after final page")


def _classify_ogg_stream(payload: bytes):
    """(fmt, channels, rate, preskip) for one logical stream's BOS
    payload — '\\x01vorbis' (rate/channels in the id header),
    'OpusHead' (channels + pre-skip; Opus granules are always 48 kHz,
    RFC 7845 §4), or FLAC-in-Ogg (the mapping spec: a verbatim
    fLaC+STREAMINFO stream at offset 9 = 5 magic + 1 major + 1 minor
    + 2 BE header count). None for unrecognized codecs (Theora,
    Speex, skeleton...)."""
    if payload[:7] == b"\x01vorbis" and len(payload) >= 16:
        channels = payload[11]
        (rate,) = struct.unpack("<I", payload[12:16])
        if rate == 0 or channels == 0:
            raise ValueError("degenerate vorbis id header")
        return "ogg-vorbis", channels, rate, 0
    if payload[:8] == b"OpusHead" and len(payload) >= 12:
        (preskip,) = struct.unpack("<H", payload[10:12])
        return "ogg-opus", payload[9], 48000, preskip
    if payload[:5] == b"\x7fFLAC" and len(payload) >= 51:
        ch_, rate_, _bits, _tot, _dur = _flac_meta(payload[9:])
        return "ogg-flac", ch_, rate_, 0
    return None


def _ogg_meta(b: bytes) -> tuple[str, int | None, int | None, int | None, float | None]:
    """(format, n_channels, sample_rate, n_samples, duration_sec)
    from the page walk. Round-13 review batch 34 extended this from
    first-stream-only to the two container layouts crawls actually
    carry (RFC 3533 §2):

    - MULTIPLEXED (grouped) streams — e.g. Theora video + Vorbis
      audio, every BOS page up front: each serial's first page is
      classified independently and the FIRST recognized audio stream
      is reported (first-page-only classification misfiled these as
      'ogg-other' whenever the video stream's BOS came first).
    - CHAINED streams — concatenated files sharing no pages (icecast
      rips): every stream with the SAME (codec, channels, rate) shape
      as the selected one contributes its PCM length, so duration is
      the chain total, not the first chain's. (A parallel multiplex
      of two same-shape audio streams would double-count; that layout
      is essentially unseen vs ubiquitous chaining, and the trade is
      stated here.)

    Unrecognized-only containers still surface as 'ogg-other' with
    NULL shape fields rather than failing: the container is valid
    Ogg."""
    streams: dict[int, dict] = {}
    order = 0
    for _htype, granule, serial, ps, pe in _ogg_pages(b):
        st = streams.get(serial)
        if st is None:
            st = streams[serial] = {
                "order": order,
                "cls": _classify_ogg_stream(b[ps:pe]),
                "last": None,
            }
            order += 1
        if granule >= 0:
            st["last"] = granule
    if not streams:
        raise ValueError("no Ogg pages")
    ordered = sorted(streams.values(), key=lambda s: s["order"])
    sel = next((s for s in ordered if s["cls"] is not None), None)
    if sel is None:
        return "ogg-other", None, None, None, None
    fmt, channels, rate, _ = sel["cls"]
    total = None
    for s in ordered:
        cls = s["cls"]
        if cls is None or cls[:3] != (fmt, channels, rate):
            continue
        if s["last"] is not None:
            n = max(0, s["last"] - cls[3])
            total = n if total is None else total + n
    dur = total / rate if total is not None and rate else None
    return fmt, channels, rate, total, dur


def _ogg_page(
    payload: bytes, granule: int, serial: int = 1, htype: int = 0,
    seq: int = 0,
) -> bytes:
    """One Ogg page around ``payload`` (<= 255*255 bytes). The CRC
    field is left zero: fixtures exercise structure, and the parser
    (like most scanners) does not checksum pages."""
    nfull, rem = divmod(len(payload), 255)
    lacing = bytes([255] * nfull + [rem])
    return (
        b"OggS\x00" + bytes([htype])
        + struct.pack("<qII", granule, serial, seq)
        + bytes(4)  # crc
        + bytes([len(lacing)]) + lacing + payload
    )


def make_ogg_vorbis(
    rate: int = 44100, channels: int = 2, n_samples: int = 88200
) -> bytes:
    """Deterministic Ogg/Vorbis fixture: BOS identification page +
    one EOS data page whose granule encodes the stream length."""
    ident = (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
        + struct.pack("<Iiii", rate, 0, 0, 0) + b"\xb8\x01"
    )
    body = bytes(i % 251 for i in range(48))
    return (
        _ogg_page(ident, granule=0, htype=2, seq=0)
        + _ogg_page(body, granule=n_samples, htype=4, seq=1)
    )


def make_ogg_opus(
    channels: int = 1, preskip: int = 312, n_samples: int = 96000
) -> bytes:
    """Deterministic Ogg/Opus fixture (RFC 7845 layout): OpusHead
    BOS page + EOS page whose granule is pre-skip + sample count at
    48 kHz."""
    head = (
        b"OpusHead\x01" + bytes([channels])
        + struct.pack("<HIh", preskip, 48000, 0) + b"\x00"
    )
    body = bytes(i % 251 for i in range(48))
    return (
        _ogg_page(head, granule=0, htype=2, seq=0)
        + _ogg_page(body, granule=preskip + n_samples, htype=4, seq=1)
    )


# ------------------------------------------------------ Matroska/WebM

_EBML_ROOT = 0x1A45DFA3
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACK_ENTRY = 0xAE
_MKV_VIDEO = 0xE0
_MKV_AUDIO = 0xE1
_MKV_DOCTYPE = 0x4282
_MKV_TS_SCALE = 0x2AD7B1
_MKV_DURATION = 0x4489
_MKV_PIXEL_W = 0xB0
_MKV_PIXEL_H = 0xBA
_MKV_CONTAINERS = {
    _EBML_ROOT, _MKV_SEGMENT, _MKV_INFO, _MKV_TRACKS,
    _MKV_TRACK_ENTRY, _MKV_VIDEO, _MKV_AUDIO,
}


def _ebml_id(b: bytes, pos: int) -> tuple[int, int]:
    """Read an EBML element ID (marker bit KEPT, per convention) at
    ``pos``; returns (id, next_pos)."""
    if pos >= len(b):
        raise ValueError("truncated EBML id")
    first = b[pos]
    if first == 0:
        raise ValueError("invalid EBML id")
    length = 1
    probe = 0x80
    while not (first & probe):
        probe >>= 1
        length += 1
    if length > 4 or pos + length > len(b):
        raise ValueError("truncated EBML id")
    return int.from_bytes(b[pos : pos + length], "big"), pos + length


def _ebml_size(b: bytes, pos: int) -> tuple[int | None, int]:
    """Read an EBML size vint (marker bit STRIPPED) at ``pos``;
    returns (size_or_None, next_pos) where None means the spec's
    unknown-size marker (all value bits set — legal for Segment in
    live captures)."""
    if pos >= len(b):
        raise ValueError("truncated EBML size")
    first = b[pos]
    if first == 0:
        raise ValueError("invalid EBML size")
    length = 1
    probe = 0x80
    while not (first & probe):
        probe >>= 1
        length += 1
    if length > 8 or pos + length > len(b):
        raise ValueError("truncated EBML size")
    val = first & (probe - 1)
    for i in range(1, length):
        val = val << 8 | b[pos + i]
    if val == (1 << (7 * length)) - 1:
        return None, pos + length
    return val, pos + length


def _mkv_meta(b: bytes) -> tuple[str, int, int | None, int | None, float | None]:
    """(format, n_tracks, width, height, duration_sec) from the EBML
    walk: DocType names the format ('webm' vs 'matroska' — the spec
    default when the header omits it), TrackEntry count under Tracks,
    the first video track's PixelWidth/PixelHeight, and Info's
    Duration (ticks) x TimestampScale (ns/tick, default 1e6). The
    walk is ITERATIVE over an explicit parent-end stack — crafted
    deep nesting cannot RecursionError a task (same contract as the
    AVI movi walk) — and an element overrunning its parent raises."""
    if b[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("not an EBML stream")
    doctype = "matroska"
    ts_scale = 1_000_000
    duration_ticks = None
    n_tracks = 0
    width = height = None
    pos = 0
    ends = [len(b)]
    while pos < len(b):
        while ends and pos >= ends[-1]:
            ends.pop()
        if not ends:
            break
        parent_end = ends[-1]
        eid, pos = _ebml_id(b, pos)
        size, pos = _ebml_size(b, pos)
        elem_end = parent_end if size is None else pos + size
        if elem_end > parent_end:
            raise ValueError("element overruns parent")
        if eid in _MKV_CONTAINERS:
            if eid == _MKV_TRACK_ENTRY:
                n_tracks += 1
            ends.append(elem_end)
            continue
        body = b[pos:elem_end]
        if eid == _MKV_DOCTYPE:
            doctype = body.split(b"\x00")[0].decode("ascii", "replace")
        elif eid == _MKV_TS_SCALE and body:
            ts_scale = int.from_bytes(body, "big")
        elif eid == _MKV_DURATION and len(body) in (4, 8):
            (duration_ticks,) = struct.unpack(
                ">f" if len(body) == 4 else ">d", body
            )
        elif eid == _MKV_PIXEL_W and body and width is None:
            width = int.from_bytes(body, "big")
        elif eid == _MKV_PIXEL_H and body and height is None:
            height = int.from_bytes(body, "big")
        pos = elem_end
    fmt = "webm" if doctype == "webm" else "matroska"
    dur = (
        duration_ticks * ts_scale / 1e9
        if duration_ticks is not None and ts_scale
        else None
    )
    return fmt, n_tracks, width, height, dur


def _evint(n: int) -> bytes:
    """Minimal EBML size vint for ``n`` (marker bit set)."""
    for length in range(1, 9):
        if n <= (1 << (7 * length)) - 2:
            return (n | 1 << (7 * length)).to_bytes(length, "big")
    raise ValueError("size too large for EBML vint")


def _eel(eid: bytes, body: bytes) -> bytes:
    """One EBML element: raw id bytes + minimal size vint + body."""
    return eid + _evint(len(body)) + body


def make_mkv(
    doctype: str = "webm",
    duration_ms: float = 2000.0,
    ts_scale: int = 1_000_000,
    video_dims: tuple[int, int] | None = (320, 240),
    n_audio_tracks: int = 1,
    unknown_segment_size: bool = False,
) -> bytes:
    """Deterministic Matroska/WebM fixture: EBML header (DocType) +
    Segment{Info{TimestampScale, Duration}, Tracks{TrackEntry...}}.
    ``unknown_segment_size`` writes the Segment with the spec's
    unknown-size marker (the live-capture layout)."""
    header = _eel(
        b"\x1aE\xdf\xa3", _eel(b"\x42\x82", doctype.encode("ascii"))
    )
    info = _eel(
        b"\x15\x49\xa9\x66",
        _eel(b"\x2a\xd7\xb1", ts_scale.to_bytes(8, "big").lstrip(b"\x00"))
        + _eel(b"\x44\x89", struct.pack(">d", duration_ms)),
    )
    entries = b""
    if video_dims is not None:
        w, h = video_dims
        entries += _eel(
            b"\xae",
            _eel(b"\x83", b"\x01")  # TrackType video
            + _eel(b"\x86", b"V_VP9")
            + _eel(
                b"\xe0",
                _eel(b"\xb0", w.to_bytes(2, "big"))
                + _eel(b"\xba", h.to_bytes(2, "big")),
            ),
        )
    for _ in range(n_audio_tracks):
        entries += _eel(
            b"\xae",
            _eel(b"\x83", b"\x02")  # TrackType audio
            + _eel(b"\x86", b"A_OPUS")
            + _eel(b"\xe1", _eel(b"\x9f", b"\x02")),
        )
    tracks = _eel(b"\x16\x54\xae\x6b", entries)
    body = info + tracks
    if unknown_segment_size:
        segment = b"\x18\x53\x80\x67" + b"\x01" + b"\xff" * 7 + body
    else:
        segment = _eel(b"\x18\x53\x80\x67", body)
    return header + segment
