"""Test-side RIFF/WAVE encoder — exercises every subset of
ragflow_ray/parsers/wavdec.py with real encoded bytes (PCM 8/16/24/32,
IEEE float 32/64, WAVE_FORMAT_EXTENSIBLE, extra chunks, pad bytes).
Kept out of the library on purpose: the engine only needs the PCM16
writer (`wavdec.encode_wav_pcm16`) for payload synthesis."""

from __future__ import annotations

import struct

import numpy as np

_BASE_GUID = bytes.fromhex("000000001000800000aa00389b71")


def _pack_samples(x: np.ndarray, tag: int, bits: int) -> bytes:
    """float array in [-1, 1) → raw little-endian sample bytes."""
    flat = np.asarray(x, dtype=np.float64).reshape(-1)
    if tag == 1:  # PCM
        if bits == 8:
            return (np.round(flat * 128.0) + 128).clip(0, 255).astype(np.uint8).tobytes()
        if bits == 16:
            return np.round(flat * 32768.0).clip(-32768, 32767).astype("<i2").tobytes()
        if bits == 24:
            v = np.round(flat * float(1 << 23)).clip(-(1 << 23), (1 << 23) - 1).astype(np.int64)
            v = np.where(v < 0, v + (1 << 24), v)
            out = np.zeros((len(v), 3), dtype=np.uint8)
            out[:, 0] = v & 0xFF
            out[:, 1] = (v >> 8) & 0xFF
            out[:, 2] = (v >> 16) & 0xFF
            return out.tobytes()
        if bits == 32:
            return np.round(flat * float(1 << 31)).clip(-(1 << 31), (1 << 31) - 1).astype("<i4").tobytes()
    if tag == 3:  # IEEE float
        if bits == 32:
            return flat.astype("<f4").tobytes()
        if bits == 64:
            return flat.astype("<f8").tobytes()
    raise ValueError((tag, bits))


def encode_wav(
    x: np.ndarray,
    sample_rate: int = 8000,
    tag: int = 1,
    bits: int = 16,
    extensible: bool = False,
    extra_chunks: bool = False,
) -> bytes:
    """float samples (1-D mono or (frames, channels)) → WAVE bytes."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    nch = x.shape[1]
    raw = _pack_samples(x, tag, bits)
    align = nch * bits // 8
    if extensible:
        sub = struct.pack("<H", tag) + _BASE_GUID
        fmt = struct.pack("<HHIIHH", 0xFFFE, nch, sample_rate,
                          sample_rate * align, align, bits)
        fmt += struct.pack("<HHI", 22, bits, (1 << nch) - 1) + sub
    else:
        fmt = struct.pack("<HHIIHH", tag, nch, sample_rate,
                          sample_rate * align, align, bits)
    chunks = [b"fmt " + struct.pack("<I", len(fmt)) + fmt]
    if extra_chunks:
        # odd-sized LIST chunk before data: forces the pad-byte path
        info = b"INFOIART" + struct.pack("<I", 5) + b"nobod"
        chunks.append(b"LIST" + struct.pack("<I", len(info)) + info + b"\x00")
        chunks.append(b"fact" + struct.pack("<I", 4) + struct.pack("<I", x.shape[0]))
    chunks.append(b"data" + struct.pack("<I", len(raw)) + raw)
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_g711(x: np.ndarray, law: str) -> bytes:
    """float samples in [-1, 1) → G.711 bytes, by nearest-decoded-value
    quantization against the decoder's own table (an optimal encoder,
    written independently of any segment-search reference code)."""
    from ragflow_ray.parsers.wavdec import _ALAW_TABLE, _MULAW_TABLE

    table = _ALAW_TABLE if law == "alaw" else _MULAW_TABLE
    v = np.round(np.asarray(x, dtype=np.float64).reshape(-1) * 32768.0)
    return np.abs(table[None, :] - v[:, None]).argmin(axis=1).astype(np.uint8).tobytes()


def encode_wav_g711(x: np.ndarray, law: str, sample_rate: int = 8000) -> bytes:
    """float samples (1-D or (frames, channels)) → G.711 WAVE bytes."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    nch = x.shape[1]
    raw = encode_g711(x, law)
    tag = 6 if law == "alaw" else 7
    fmt = struct.pack("<HHIIHH", tag, nch, sample_rate, sample_rate * nch, nch, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", len(body)) + body
