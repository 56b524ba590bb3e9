"""From-scratch RIFF/WAVE PCM audio decoder.

Implements the WAVE container of the public RIFF spec (Microsoft/IBM
"Multimedia Programming Interface and Data Specifications 1.0" and
RFC 2361 wave format registry): RIFF header walk → ``fmt ``
chunk (PCM / IEEE-float / EXTENSIBLE) → ``data`` chunk → sample
decode to a normalized float32 waveform.  This gives the multimodal
audio stages (``ops/multimodal.py``) REAL waveform content, the same
way ``parsers/jpegdec.py`` gives the image stages real pixels — the
reference's audio path hands bytes to an external ASR service
(rag/app/audio.py:26, scoped out per BASELINE); the *decode* half is
plain public-format parsing and is implemented here because no audio
library exists in this container.

Scope (documented): WAVE_FORMAT_PCM (1) at 8/16/24/32 bits,
WAVE_FORMAT_IEEE_FLOAT (3) at 32/64 bits, WAVE_FORMAT_ALAW (6) and
WAVE_FORMAT_MULAW (7) per ITU-T G.711 (table-driven segment expansion,
decoded to the conventional 13/14-bit linear values shifted to the
16-bit grid), and WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping any of
those; any channel count; chunk walk tolerates extra chunks (LIST,
fact, cue) and odd-size padding.  Out of scope — ADPCM, GSM — raises
:class:`UnsupportedWav` so callers can degrade to the digest stand-in.

All sample conversion is vectorized numpy over the raw data chunk;
nothing walks samples in Python.

Normalization: integer PCM divides by 2^(bits-1) (8-bit is unsigned,
recentered first), floats pass through — so int16 value ``v`` decodes
to exactly ``v / 32768`` in float32, making integer summaries
(``round(x * 32768)``) lossless for oracle checks.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedWav(ValueError):
    """Well-formed WAVE outside the PCM/float subset."""


class BadWav(ValueError):
    """Malformed / truncated RIFF-WAVE data."""


_PCM = 1
_IEEE_FLOAT = 3
_ALAW = 6
_MULAW = 7
_EXTENSIBLE = 0xFFFE


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """256-entry byte → 16-bit-linear lookup tables for ITU-T G.711
    A-law and μ-law (segment/mantissa expansion per the spec tables;
    the expansion lands directly on the 16-bit grid — A-law spans
    ±32256 with byte 0x55 → −8, μ-law spans ±32124 with byte 0xFF
    → 0, the values every common decoder table pins)."""
    b = np.arange(256, dtype=np.int64)
    # A-law: toggle the even bits, then expand segment/quantization;
    # sign bit SET (after the toggle) encodes positive
    a = b ^ 0x55
    seg, mant = (a >> 4) & 0x7, a & 0xF
    mag = np.where(seg == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (seg - 1).clip(0))
    alaw = np.where(a & 0x80, mag, -mag)
    # μ-law: stored complemented; bias 0x84 rides through the shift;
    # sign bit SET (after the complement) encodes negative
    u = ~b & 0xFF
    seg, mant = (u >> 4) & 0x7, u & 0xF
    mag = (((mant << 3) + 0x84) << seg) - 0x84
    mulaw = np.where(u & 0x80, -mag, mag)
    return alaw.astype(np.int32), mulaw.astype(np.int32)


_ALAW_TABLE, _MULAW_TABLE = _g711_tables()

# first 2 bytes of the 16-byte SubFormat GUID carry the format tag
# (the remainder is the fixed ksmedia.h base GUID)
_KSDATA_BASE = bytes.fromhex("000000001000800000aa00389b71")


def _walk_chunks(data: bytes):
    """Yield (fourcc, payload) for each chunk after the RIFF/WAVE
    header, honoring the spec's 2-byte alignment padding."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise BadWav("not a RIFF/WAVE stream")
    pos, end = 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8:pos + 8 + size]
        if len(payload) < size:
            raise BadWav(f"truncated {fourcc!r} chunk")
        yield fourcc, payload
        pos += 8 + size + (size & 1)


def _parse_fmt(payload: bytes) -> tuple[int, int, int, int]:
    """``fmt `` chunk → (format_tag, n_channels, sample_rate, bits)."""
    if len(payload) < 16:
        raise BadWav("fmt chunk shorter than 16 bytes")
    tag, nch, rate, _brate, _align, bits = struct.unpack_from("<HHIIHH", payload)
    if tag == _EXTENSIBLE:
        # cbSize(2) + validBits(2) + channelMask(4) + SubFormat GUID(16)
        if len(payload) < 40:
            raise BadWav("EXTENSIBLE fmt chunk shorter than 40 bytes")
        (sub_tag,) = struct.unpack_from("<H", payload, 24)
        if payload[26:40] != _KSDATA_BASE:
            raise UnsupportedWav("non-ksmedia SubFormat GUID")
        tag = sub_tag
    if nch == 0 or rate == 0:
        raise BadWav("zero channels or sample rate")
    return tag, nch, rate, bits


def _decode_samples(raw: bytes, tag: int, bits: int) -> np.ndarray:
    """Raw data-chunk bytes → flat float32 array in [-1, 1)."""
    if tag == _PCM:
        if bits == 8:
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
            return (x - 128.0) / 128.0
        if bits == 16:
            x = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2")
            return x.astype(np.float32) / 32768.0
        if bits == 24:
            b = np.frombuffer(raw[: len(raw) // 3 * 3], dtype=np.uint8)
            b = b.reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            return v.astype(np.float32) / float(1 << 23)
        if bits == 32:
            x = np.frombuffer(raw[: len(raw) // 4 * 4], dtype="<i4")
            return (x.astype(np.float64) / float(1 << 31)).astype(np.float32)
        raise UnsupportedWav(f"PCM bit depth {bits}")
    if tag == _IEEE_FLOAT:
        if bits == 32:
            return np.frombuffer(raw[: len(raw) // 4 * 4], dtype="<f4").copy()
        if bits == 64:
            return np.frombuffer(raw[: len(raw) // 8 * 8], dtype="<f8").astype(np.float32)
        raise UnsupportedWav(f"float bit depth {bits}")
    if tag in (_ALAW, _MULAW):
        if bits != 8:
            raise UnsupportedWav(f"G.711 bit depth {bits}")
        table = _ALAW_TABLE if tag == _ALAW else _MULAW_TABLE
        return table[np.frombuffer(raw, dtype=np.uint8)].astype(np.float32) / 32768.0
    raise UnsupportedWav(f"wave format tag {tag}")


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → ``(waveform, sample_rate)``.

    ``waveform`` is float32 with shape ``(n_frames, n_channels)``;
    callers downmix as they see fit (``ops/multimodal.decode_audio``
    takes the channel mean).  Trailing bytes short of one full frame
    are dropped, matching common-reader behavior.
    """
    fmt = None
    raw = None
    for fourcc, payload in _walk_chunks(bytes(data)):
        if fourcc == b"fmt " and fmt is None:
            fmt = _parse_fmt(payload)
        elif fourcc == b"data" and raw is None:
            raw = payload
    if fmt is None:
        raise BadWav("missing fmt chunk")
    if raw is None:
        raise BadWav("missing data chunk")
    tag, nch, rate, bits = fmt
    flat = _decode_samples(raw, tag, bits)
    n_frames = len(flat) // nch
    return flat[: n_frames * nch].reshape(n_frames, nch), rate


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal WAVE_FORMAT_PCM 16-bit writer for in-pipeline payload
    synthesis (the oracle-checked real-decode queries build their
    corpus with this; the full multi-format encoder used to exercise
    the decoder's subsets lives test-side in ``tests/wavenc.py``).

    ``samples``: int16 array, 1-D (mono) or (n_frames, n_channels).
    """
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    nch = s.shape[1]
    raw = s.reshape(-1).tobytes()
    fmt = struct.pack("<HHIIHH", _PCM, nch, sample_rate,
                      sample_rate * nch * 2, nch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", len(body)) + body
