"""RIFF/WAVE decoder (parsers/wavdec.py) against the test-side
encoder (tests/wavenc.py) — real encoded bytes, sample-level checks."""

from __future__ import annotations

import numpy as np
import pytest

from ragflow_ray.parsers.wavdec import (
    BadWav,
    UnsupportedWav,
    decode_wav,
    encode_wav_pcm16,
)
from tests.wavenc import encode_wav


def _sig(n, ch=1, seed=0):
    rs = np.random.RandomState(seed)
    return (rs.rand(n, ch) * 1.9 - 0.95).astype(np.float64)


class TestRoundtrip:
    def test_pcm16_mono_exact(self):
        # int16-grid inputs survive PCM16 encode/decode bit-exactly
        v = np.arange(-32768, 32768, 97, dtype=np.int64)
        x = v.astype(np.float64) / 32768.0
        wav, rate = decode_wav(encode_wav(x, sample_rate=44100, bits=16))
        assert rate == 44100 and wav.shape == (len(v), 1)
        assert (np.round(wav[:, 0] * 32768.0).astype(np.int64) == v).all()

    def test_pcm8(self):
        x = _sig(300, seed=1)
        wav, _ = decode_wav(encode_wav(x, tag=1, bits=8))
        assert np.abs(wav - x).max() <= 1 / 128 + 1e-7

    def test_pcm24(self):
        x = _sig(256, seed=2)
        wav, _ = decode_wav(encode_wav(x, tag=1, bits=24))
        assert np.abs(wav - x).max() <= 1 / (1 << 23) + 1e-6

    def test_pcm32(self):
        x = _sig(256, seed=3)
        wav, _ = decode_wav(encode_wav(x, tag=1, bits=32))
        assert np.abs(wav - x).max() <= 1e-6

    def test_float32_passthrough(self):
        x = _sig(128, seed=4)
        wav, _ = decode_wav(encode_wav(x, tag=3, bits=32))
        assert np.abs(wav - x.astype(np.float32)).max() == 0

    def test_float64(self):
        x = _sig(128, seed=5)
        wav, _ = decode_wav(encode_wav(x, tag=3, bits=64))
        assert np.abs(wav - x).max() <= 1e-6

    def test_stereo_interleave(self):
        x = _sig(200, ch=2, seed=6)
        wav, _ = decode_wav(encode_wav(x, bits=16))
        assert wav.shape == (200, 2)
        assert np.abs(wav - x).max() <= 1 / 32768 + 1e-7

    def test_five_channels(self):
        x = _sig(64, ch=5, seed=7)
        wav, _ = decode_wav(encode_wav(x, bits=16))
        assert wav.shape == (64, 5)

    def test_extensible_pcm16(self):
        x = _sig(100, ch=2, seed=8)
        wav, _ = decode_wav(encode_wav(x, bits=16, extensible=True))
        assert wav.shape == (100, 2)
        assert np.abs(wav - x).max() <= 1 / 32768 + 1e-7

    def test_extensible_float32(self):
        x = _sig(100, seed=9)
        wav, _ = decode_wav(encode_wav(x, tag=3, bits=32, extensible=True))
        assert np.abs(wav - x.astype(np.float32)).max() == 0

    def test_extra_chunks_and_padding(self):
        x = _sig(150, seed=10)
        wav, rate = decode_wav(encode_wav(x, sample_rate=22050, extra_chunks=True))
        assert rate == 22050 and wav.shape == (150, 1)
        assert np.abs(wav - x).max() <= 1 / 32768 + 1e-7

    def test_library_pcm16_writer_roundtrip(self):
        v = (np.arange(2048, dtype=np.int64) * 131 % 65536 - 32768).astype(np.int16)
        s = v.reshape(-1, 2)  # stereo
        wav, rate = decode_wav(encode_wav_pcm16(s, sample_rate=16000))
        assert rate == 16000 and wav.shape == s.shape
        assert (np.round(wav * 32768.0).astype(np.int64) == s).all()


class TestErrors:
    def test_not_riff(self):
        with pytest.raises(BadWav):
            decode_wav(b"OggS" + b"\x00" * 64)

    def test_truncated_chunk(self):
        good = encode_wav(_sig(50), bits=16)
        with pytest.raises(BadWav):
            decode_wav(good[:30])

    def test_missing_data_chunk(self):
        good = encode_wav(_sig(10), bits=16)
        # cut everything from the data chunk on, shrink RIFF size
        cut = good[: good.index(b"data")]
        import struct as _s
        fixed = b"RIFF" + _s.pack("<I", len(cut) - 8) + cut[8:]
        with pytest.raises(BadWav):
            decode_wav(fixed)

    def test_adpcm_unsupported(self):
        good = bytearray(encode_wav(_sig(10), bits=16))
        i = good.index(b"fmt ") + 8
        good[i:i + 2] = (2).to_bytes(2, "little")  # MS ADPCM tag
        with pytest.raises(UnsupportedWav):
            decode_wav(bytes(good))

    def test_pcm12_unsupported(self):
        good = bytearray(encode_wav(_sig(10), bits=16))
        i = good.index(b"fmt ") + 8 + 14
        good[i:i + 2] = (12).to_bytes(2, "little")
        with pytest.raises(UnsupportedWav):
            decode_wav(bytes(good))


class TestG711:
    """ITU-T G.711 A-law/μ-law: every one of the 512 table entries is
    cross-checked against the stdlib audioop implementation (an
    independent C decoder), plus spec-pinned known answers and
    roundtrips through real WAVE containers."""

    def test_tables_match_audioop(self):
        audioop = pytest.importorskip("audioop")
        from ragflow_ray.parsers.wavdec import _ALAW_TABLE, _MULAW_TABLE

        all_bytes = bytes(range(256))
        ref_a = np.frombuffer(audioop.alaw2lin(all_bytes, 2), dtype="<i2")
        ref_u = np.frombuffer(audioop.ulaw2lin(all_bytes, 2), dtype="<i2")
        assert (_ALAW_TABLE == ref_a.astype(np.int32)).all()
        assert (_MULAW_TABLE == ref_u.astype(np.int32)).all()

    def test_known_answers(self):
        from ragflow_ray.parsers.wavdec import _ALAW_TABLE, _MULAW_TABLE

        assert _ALAW_TABLE[0x55] == -8          # A-law "digital zero"
        assert _ALAW_TABLE[0xAA] == 32256       # positive full scale
        assert _MULAW_TABLE[0xFF] == 0          # μ-law zero
        assert _MULAW_TABLE[0x00] == -32124     # negative full scale
        assert _MULAW_TABLE[0x80] == 32124      # positive full scale

    @pytest.mark.parametrize("law", ["alaw", "mulaw"])
    def test_wav_roundtrip_within_quantization(self, law):
        from tests.wavenc import encode_wav_g711

        rs = np.random.RandomState(11)
        x = rs.rand(400) * 1.9 - 0.95
        wav, rate = decode_wav(encode_wav_g711(x, law))
        assert rate == 8000 and wav.shape == (400, 1)
        # top-segment step is 1024/32768; nearest-value encode halves it
        assert np.abs(wav[:, 0] - x).max() <= 513 / 32768

    def test_g711_stereo(self):
        from tests.wavenc import encode_wav_g711

        x = _sig(100, ch=2, seed=12)
        wav, _ = decode_wav(encode_wav_g711(x, "mulaw"))
        assert wav.shape == (100, 2)

    def test_g711_bad_bit_depth(self):
        from tests.wavenc import encode_wav_g711

        raw = bytearray(encode_wav_g711(_sig(10)[:, 0], "alaw"))
        i = raw.index(b"fmt ") + 8 + 14
        raw[i:i + 2] = (16).to_bytes(2, "little")
        with pytest.raises(UnsupportedWav):
            decode_wav(bytes(raw))
