"""WAV sample decoding beyond 16-bit PCM — the audio analogue of the
baseline-JPEG codec (operators/jpeg.py): close the "wav-other is
undecodable residue" gap for the codecs a real crawl corpus actually
contains, with public-spec, stdlib+numpy implementations.

Covered sample formats (all from public specifications):

- integer PCM at 8 (unsigned), 16, 24, 32 bits (RIFF/WAVE spec)
- IEEE float at 32/64 bits (WAVE_FORMAT_IEEE_FLOAT = 3)
- G.711 mu-law (WAVE_FORMAT_MULAW = 7) and A-law (= 6) — ITU-T G.711;
  decode tables generated from the segment/ mantissa bit layout,
  matching CPython's former ``audioop`` scaling (16-bit, max 32124 /
  32256)
- IMA/DVI ADPCM (WAVE_FORMAT_IMA_ADPCM = 0x11) — the public IMA
  algorithm (step/index tables), mono + stereo block layouts
- WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolved through the SubFormat GUID

Everything decodes to float64 in [-1, 1], shape ``(n_frames,
n_channels)``, which is what ``multimodal.audio_features`` consumes.
Encoders for every covered codec exist as fixture builders
(``make_wav_ex``) so round-trip tests pin the decode paths without any
binary test assets.

Scale note: G.711 and PCM/float decode are single numpy table-gathers /
views — scan speed. IMA ADPCM is a sequential predictor recursion per
channel; the nibble unpack and difference magnitudes are vectorized but
the predictor scan is a Python loop over samples (inherent to the
codec's feedback loop). That is decode-at-curation speed for typical
voice blobs, not a DSP kernel — stated here the same way jpeg.py
states its pure-Python entropy decoder.

Reference parity note: the reference system (ykursadkaya/Clustering)
has no audio surface at all; this module belongs to the LLM-pipeline
multimodal extension (SURVEY.md "beyond the reference" set).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- G.711

# Decode tables generated from the public G.711 bit layout.  Scaling
# matches the classic 16-bit expansion (audioop/G.711 reference code):
# mu-law peaks at 32124, A-law at 32256.


def _ulaw_decode_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int32)
    for u in range(256):
        c = ~u & 0xFF
        sign = c & 0x80
        exponent = (c >> 4) & 0x07
        mantissa = c & 0x0F
        sample = (((mantissa << 3) + 0x84) << exponent) - 0x84
        out[u] = -sample if sign else sample
    return out


def _alaw_decode_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int32)
    for a in range(256):
        c = a ^ 0x55
        sign = c & 0x80
        exponent = (c >> 4) & 0x07
        mantissa = c & 0x0F
        if exponent == 0:
            sample = (mantissa << 4) + 8
        else:
            sample = ((mantissa << 4) + 0x108) << (exponent - 1)
        out[a] = -sample if sign else sample
    return out


ULAW_TABLE = _ulaw_decode_table()
ALAW_TABLE = _alaw_decode_table()

# Encoders quantize to the NEAREST codeword by construction (binary
# search over the sorted decode table) instead of re-implementing the
# segment-search encoder — immune to the sign-convention off-by-ones
# that plague G.711 encode ports, and exactly inverts the decode table
# (decode(encode(decode(c))) == decode(c) for every codeword c).


def _nearest_codeword_encoder(table: np.ndarray):
    order = np.argsort(table, kind="stable")
    sorted_vals = table[order]

    def encode(samples: np.ndarray) -> np.ndarray:
        s = np.clip(
            np.asarray(samples, dtype=np.float64) * 32768.0, -32768, 32767
        )
        idx = np.searchsorted(sorted_vals, s)
        idx = np.clip(idx, 1, len(sorted_vals) - 1)
        left = sorted_vals[idx - 1]
        right = sorted_vals[idx]
        pick = np.where(np.abs(s - left) <= np.abs(s - right), idx - 1, idx)
        return order[pick].astype(np.uint8)

    return encode


encode_ulaw = _nearest_codeword_encoder(ULAW_TABLE)
encode_alaw = _nearest_codeword_encoder(ALAW_TABLE)

# ----------------------------------------------------------- IMA ADPCM

IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int32,
)
IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)


def _ima_decode_nibbles(nibbles: np.ndarray, pred: int, index: int) -> np.ndarray:
    """Run the IMA predictor recursion over a 1-D uint8 nibble array.
    The difference-magnitude algebra is exact integer per the spec:
    diff = (step*(2*mag+1)) >> 3 with mag = low 3 bits."""
    out = np.empty(len(nibbles), dtype=np.int32)
    step_table = IMA_STEP_TABLE
    index_table = IMA_INDEX_TABLE
    for i, nib in enumerate(nibbles):
        step = int(step_table[index])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        if nib & 8:
            diff = -diff
        pred = min(32767, max(-32768, pred + diff))
        out[i] = pred
        index = min(88, max(0, index + int(index_table[nib & 0x0F])))
    return out


def _ima_decode_block_mono(block: bytes) -> np.ndarray:
    if len(block) < 4:
        raise ValueError("short IMA ADPCM block")
    pred, index = struct.unpack("<hB", block[:3])
    if index > 88:
        raise ValueError(f"IMA step index {index} out of range")
    data = np.frombuffer(block[4:], dtype=np.uint8)
    nibbles = np.empty(len(data) * 2, dtype=np.uint8)
    nibbles[0::2] = data & 0x0F  # low nibble first (IMA/WAV layout)
    nibbles[1::2] = data >> 4
    return np.concatenate(
        ([np.int32(pred)], _ima_decode_nibbles(nibbles, pred, index))
    )


def _ima_decode_block_stereo(block: bytes) -> np.ndarray:
    """Stereo blocks carry a 4-byte header per channel, then the
    nibble stream in alternating 4-byte (8-nibble) groups: L-group,
    R-group, L-group, ... Returns (n, 2) int32."""
    if len(block) < 8:
        raise ValueError("short IMA ADPCM stereo block")
    chans = []
    for c in range(2):
        pred, index = struct.unpack("<hB", block[c * 4 : c * 4 + 3])
        if index > 88:
            raise ValueError(f"IMA step index {index} out of range")
        chans.append((pred, index))
    data = np.frombuffer(block[8:], dtype=np.uint8)
    n_groups = len(data) // 8  # truncate a ragged tail
    data = data[: n_groups * 8].reshape(n_groups, 2, 4)
    out = []
    for c, (pred, index) in enumerate(chans):
        raw = data[:, c, :].reshape(-1)
        nibbles = np.empty(len(raw) * 2, dtype=np.uint8)
        nibbles[0::2] = raw & 0x0F
        nibbles[1::2] = raw >> 4
        out.append(
            np.concatenate(
                ([np.int32(pred)], _ima_decode_nibbles(nibbles, pred, index))
            )
        )
    return np.stack(out, axis=1)


def _ima_encode_channel(
    samples: np.ndarray, block_samples: int
) -> list[bytes]:
    """Encode one channel of int32 samples (16-bit range) into IMA
    blocks of ``block_samples`` samples each (header sample + nibble
    payload). Returns the per-block payloads WITHOUT channel
    interleave (the caller lays out mono/stereo blocks)."""
    step_table = IMA_STEP_TABLE
    index_table = IMA_INDEX_TABLE
    blocks = []
    index = 0
    for start in range(0, len(samples), block_samples):
        chunk = samples[start : start + block_samples]
        pred = int(chunk[0])
        header = struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in chunk[1:]:
            step = int(step_table[index])
            delta = int(s) - pred
            nib = 0
            if delta < 0:
                nib = 8
                delta = -delta
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            # decoder-mirror update keeps encoder and decoder in sync
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            if nib & 8:
                diff = -diff
            pred = min(32767, max(-32768, pred + diff))
            index = min(88, max(0, index + int(index_table[nib])))
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)
        payload = bytes(
            (nibbles[i] & 0x0F) | (nibbles[i + 1] << 4)
            for i in range(0, len(nibbles), 2)
        )
        blocks.append(header + payload)
    return blocks


# ------------------------------------------------------- WAV container

#: format-code -> short name, for header metadata surfaces
WAV_FORMAT_NAMES = {
    1: "wav-pcm",
    3: "wav-float",
    6: "wav-alaw",
    7: "wav-ulaw",
    0x11: "wav-ima-adpcm",
}

_EXTENSIBLE = 0xFFFE


def _parse_fmt(body: bytes) -> tuple[int, int, int, int, int]:
    """(format_code, channels, rate, block_align, bits) from a fmt
    chunk body, resolving WAVE_FORMAT_EXTENSIBLE through the SubFormat
    GUID's leading 16-bit code (the public layout: cbSize >= 22, GUID
    at offset 24)."""
    if len(body) < 16:
        raise ValueError("short fmt chunk")
    code, channels, rate, _brate, block_align, bits = struct.unpack(
        "<HHIIHH", body[:16]
    )
    if code == _EXTENSIBLE:
        if len(body) < 26:
            raise ValueError("short WAVE_FORMAT_EXTENSIBLE fmt chunk")
        (code,) = struct.unpack("<H", body[24:26])
    return code, channels, rate, block_align, bits


def _wav_chunks(b: bytes):
    """Yield (chunk_id, body) over a RIFF/WAVE byte string, honoring
    WORD alignment. Raises ValueError if not RIFF/WAVE."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (csize,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        yield cid, b[pos + 8 : pos + 8 + csize]
        pos += 8 + csize + (csize & 1)


def decode_wav_samples(b: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAV blob's samples to float64 in [-1, 1], shape
    ``(n_frames, n_channels)``; returns ``(samples, sample_rate)``.

    Handles integer PCM 8/16/24/32, IEEE float 32/64, G.711 mu-law /
    A-law, and IMA ADPCM (mono/stereo); WAVE_FORMAT_EXTENSIBLE is
    resolved through its SubFormat. Raises ValueError on malformed
    containers and NotImplementedError for format codes outside this
    set (MP3-in-WAV, proprietary ADPCMs, ...) — the same honest-gate
    contract as jpeg.decode_baseline."""
    fmt = None
    data = None
    for cid, body in _wav_chunks(b):
        if cid == b"fmt " and fmt is None:
            fmt = _parse_fmt(body)
        elif cid == b"data" and data is None:
            data = body
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    code, ch, rate, block_align, bits = fmt
    if ch == 0 or rate == 0:
        raise ValueError("degenerate fmt chunk")

    if code == 1:  # integer PCM
        if bits == 8:  # unsigned, 128-centered
            x = (
                np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        elif bits == 16:
            x = np.frombuffer(
                data, dtype="<i2", count=len(data) // 2
            ).astype(np.float64) / 32768.0
        elif bits == 24:
            n = len(data) // 3
            raw = np.frombuffer(data, dtype=np.uint8, count=n * 3).reshape(
                n, 3
            )
            vals = (
                raw[:, 0].astype(np.int64)
                | (raw[:, 1].astype(np.int64) << 8)
                | (raw[:, 2].astype(np.int64) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(
                data, dtype="<i4", count=len(data) // 4
            ).astype(np.float64) / float(1 << 31)
        else:
            raise NotImplementedError(f"{bits}-bit integer PCM")
        n = (len(x) // ch) * ch
        return x[:n].reshape(-1, ch), rate

    if code == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4", count=len(data) // 4)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8", count=len(data) // 8)
        else:
            raise NotImplementedError(f"{bits}-bit IEEE float PCM")
        x = np.clip(x.astype(np.float64), -1.0, 1.0)
        n = (len(x) // ch) * ch
        return x[:n].reshape(-1, ch), rate

    if code in (6, 7):  # G.711: one byte per sample, table gather
        table = ALAW_TABLE if code == 6 else ULAW_TABLE
        codes = np.frombuffer(data, dtype=np.uint8)
        x = table[codes].astype(np.float64) / 32768.0
        n = (len(x) // ch) * ch
        return x[:n].reshape(-1, ch), rate

    if code == 0x11:  # IMA ADPCM
        if ch not in (1, 2):
            raise NotImplementedError(f"{ch}-channel IMA ADPCM")
        if block_align < 4 * ch:
            raise ValueError("IMA block_align smaller than its headers")
        out = []
        for start in range(0, len(data), block_align):
            block = data[start : start + block_align]
            if len(block) < 4 * ch:
                break  # ragged tail shorter than the headers: drop
            if ch == 1:
                out.append(_ima_decode_block_mono(block))
            else:
                out.append(_ima_decode_block_stereo(block))
        if not out:
            raise ValueError("no decodable IMA ADPCM blocks")
        x = np.concatenate(out, axis=0).astype(np.float64) / 32768.0
        return x.reshape(-1, ch) if ch > 1 else x.reshape(-1, 1), rate

    raise NotImplementedError(
        f"WAV format code 0x{code:04x} has no stdlib+numpy decoder here "
        "(route through a codec library when present)"
    )


# ------------------------------------------------------ fixture writer


def make_wav_ex(
    samples: np.ndarray,
    sample_rate: int = 8000,
    codec: str = "pcm16",
    extensible: bool = False,
    ima_block_samples: int = 505,
) -> bytes:
    """Deterministic WAV fixture for any covered codec. ``samples`` is
    float in [-1, 1], shape (n,) or (n, ch). ``codec`` in {pcm8,
    pcm16, pcm24, pcm32, float32, float64, ulaw, alaw, ima-adpcm}.
    ``extensible=True`` wraps the format code in WAVE_FORMAT_EXTENSIBLE
    (GUID subformat), exercising the 0xFFFE resolution path."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape

    def _i16(v: np.ndarray) -> np.ndarray:
        return np.clip(np.round(v * 32767.0), -32768, 32767).astype(np.int64)

    if codec == "pcm8":
        code, bits = 1, 8
        payload = (
            np.clip(np.round(x * 127.0) + 128, 0, 255)
            .astype(np.uint8)
            .reshape(-1)
            .tobytes()
        )
    elif codec == "pcm16":
        code, bits = 1, 16
        payload = _i16(x).astype("<i2").reshape(-1).tobytes()
    elif codec == "pcm24":
        code, bits = 1, 24
        vals = np.clip(
            np.round(x * float((1 << 23) - 1)), -(1 << 23), (1 << 23) - 1
        ).astype(np.int64).reshape(-1)
        vals = np.where(vals < 0, vals + (1 << 24), vals)
        raw = np.empty((len(vals), 3), dtype=np.uint8)
        raw[:, 0] = vals & 0xFF
        raw[:, 1] = (vals >> 8) & 0xFF
        raw[:, 2] = (vals >> 16) & 0xFF
        payload = raw.tobytes()
    elif codec == "pcm32":
        code, bits = 1, 32
        payload = (
            np.clip(
                np.round(x * float((1 << 31) - 1)),
                -(1 << 31),
                (1 << 31) - 1,
            )
            .astype("<i4")
            .reshape(-1)
            .tobytes()
        )
    elif codec == "float32":
        code, bits = 3, 32
        payload = x.astype("<f4").reshape(-1).tobytes()
    elif codec == "float64":
        code, bits = 3, 64
        payload = x.astype("<f8").reshape(-1).tobytes()
    elif codec == "ulaw":
        code, bits = 7, 8
        payload = encode_ulaw(x.reshape(-1)).tobytes()
    elif codec == "alaw":
        code, bits = 6, 8
        payload = encode_alaw(x.reshape(-1)).tobytes()
    elif codec == "ima-adpcm":
        code, bits = 0x11, 4
        ivals = _i16(x)
        per_chan = [
            _ima_encode_channel(ivals[:, c], ima_block_samples)
            for c in range(ch)
        ]
        if ch == 1:
            payload = b"".join(per_chan[0])
            block_align = 4 + (ima_block_samples - 1 + 1) // 2
        elif ch == 2:
            blocks = []
            for bl, br in zip(*per_chan):
                # headers first (L then R), then 4-byte groups interleaved
                dl, dr = bl[4:], br[4:]
                groups = bytearray(bl[:4] + br[:4])
                for off in range(0, max(len(dl), len(dr)), 4):
                    groups += dl[off : off + 4].ljust(4, b"\x00")
                    groups += dr[off : off + 4].ljust(4, b"\x00")
                blocks.append(bytes(groups))
            payload = b"".join(blocks)
            block_align = 8 + ((ima_block_samples - 1 + 7) // 8) * 8
        else:
            raise ValueError("ima-adpcm fixture supports 1-2 channels")
    else:
        raise ValueError(f"unknown codec {codec!r}")

    if codec != "ima-adpcm":
        block_align = ch * max(1, bits // 8)
    byte_rate = sample_rate * block_align

    if extensible:
        guid = struct.pack("<H", code) + bytes.fromhex(
            "0000000010008000" "00aa00389b71"
        )
        fmt_body = struct.pack(
            "<HHIIHHHHI",
            _EXTENSIBLE, ch, sample_rate, byte_rate, block_align, bits,
            22, bits, (1 << ch) - 1,
        ) + guid
    else:
        fmt_body = struct.pack(
            "<HHIIHH", code, ch, sample_rate, byte_rate, block_align, bits
        )
        if codec == "ima-adpcm":
            fmt_body += struct.pack("<HH", 2, ima_block_samples)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    inner = b"WAVE" + chunk(b"fmt ", fmt_body)
    if code != 1:
        # the spec REQUIRES a fact chunk for non-PCM formats: its
        # dwSampleLength is the exact per-channel frame count — the
        # only correct duration source for block codecs whose final
        # block is partial (data_size // block_align truncates it)
        inner += chunk(b"fact", struct.pack("<I", n))
    inner += chunk(b"data", payload)
    return b"RIFF" + struct.pack("<I", len(inner)) + inner


__all__ = [
    "ULAW_TABLE",
    "ALAW_TABLE",
    "IMA_STEP_TABLE",
    "IMA_INDEX_TABLE",
    "WAV_FORMAT_NAMES",
    "encode_ulaw",
    "encode_alaw",
    "decode_wav_samples",
    "make_wav_ex",
]
