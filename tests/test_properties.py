"""Property-based tests (hypothesis) for core invariants."""

import json
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from ragflow_ray.parsers.jsonp import parse_json
from ragflow_ray.parsers.txt import parse_txt
from ragflow_ray.text.delimiters import split_dropping_delimiters
from ragflow_ray.text.merge import greedy_merge
from ragflow_ray.text.tokens import token_count, truncate_tokens

TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Zs"), include_characters="\n。；！？"
    ),
    max_size=300,
)


class TestTokenCount:
    @given(TEXT)
    def test_non_negative(self, s):
        assert token_count(s) >= 0

    @given(TEXT, TEXT)
    def test_subadditive(self, a, b):
        assert token_count(a + b) <= token_count(a) + token_count(b)

    @given(TEXT)
    def test_deterministic(self, s):
        assert token_count(s) == token_count(s)

    @given(TEXT, st.integers(min_value=0, max_value=50))
    def test_truncate_respects_budget(self, s, k):
        t = truncate_tokens(s, k)
        assert token_count(t) <= k
        assert s.startswith(t)


class TestDelimiterSplit:
    @given(TEXT)
    def test_roundtrip_minus_delimiters(self, s):
        delims = "\n。；！？"
        joined = "".join(split_dropping_delimiters(s, delims))
        assert joined == re.sub(f"[{delims}]", "", s)

    @given(TEXT)
    def test_fragments_contain_no_delimiters(self, s):
        for frag in split_dropping_delimiters(s, "\n。"):
            # single-char delimiters never survive inside fragments
            assert "\n" not in frag and "。" not in frag


class TestTxtParser:
    @given(TEXT, st.integers(min_value=1, max_value=64))
    def test_roundtrip(self, s, budget):
        out = parse_txt(s, budget, "\n!?;。；！？")
        assert "".join(out) == re.sub(r"[\n!?;。；！？]", "", s)


class TestGreedyMerge:
    @given(st.lists(TEXT, max_size=12), st.integers(min_value=8, max_value=256))
    def test_roundtrip_without_tags(self, sections, budget):
        """With no position tags, concatenated chunks == concatenated
        sections minus the delimiters removed by oversized splits."""
        pairs = [(s, "") for s in sections]
        chunks = greedy_merge(pairs, budget, "\n。；！？")
        joined = "".join(chunks)
        # sections under budget keep their delimiters; oversized ones
        # lose them — joined text is the input with a subset of
        # delimiter chars removed
        original = "".join(sections)
        assert re.sub(r"[\n。；！？]", "", joined) == re.sub(r"[\n。；！？]", "", original)

    @given(st.lists(TEXT, min_size=1, max_size=12))
    def test_leading_seed_chunk(self, sections):
        chunks = greedy_merge([(s, "") for s in sections], 128)
        assert chunks[0] == ""


class TestJsonParser:
    @given(
        st.dictionaries(
            st.text(min_size=1, max_size=8),
            st.recursive(
                st.one_of(st.integers(), st.text(max_size=20), st.booleans()),
                # non-empty containers only: the splitter (like the
                # reference's langchain-derived original) silently drops
                # an empty dict/list when it has to recurse into it
                lambda inner: st.lists(inner, min_size=1, max_size=4)
                | st.dictionaries(
                    st.text(min_size=1, max_size=6), inner, min_size=1, max_size=4
                ),
                max_leaves=12,
            ),
            max_size=6,
        )
    )
    @settings(max_examples=40)
    def test_chunks_merge_back(self, obj):
        out = parse_json(json.dumps(obj), max_chunk_size=200)
        if not obj:
            assert out == []
            return

        def listify(data):
            if isinstance(data, dict):
                return {k: listify(v) for k, v in data.items()}
            if isinstance(data, list):
                return {str(i): listify(v) for i, v in enumerate(data)}
            return data

        def deep_merge(dst, src):
            for k, v in src.items():
                if k in dst and isinstance(dst[k], dict) and isinstance(v, dict):
                    deep_merge(dst[k], v)
                else:
                    dst[k] = v

        merged: dict = {}
        for c in out:
            deep_merge(merged, json.loads(c))
        assert merged == listify(obj)


class TestJsonSplitterTranscriptions:
    """The corpus_extract fixture derives the json family's chunk
    decomposition from its own transcription of the public langchain
    RecursiveJsonSplitter rule, written without importing
    parsers/jsonp.  Two independently-written transcriptions of one
    public spec must agree on ARBITRARY json and budgets — not just
    the rigid corpus shape the fixture build exercises."""

    @given(
        st.dictionaries(
            st.text(min_size=1, max_size=8),
            st.recursive(
                st.one_of(st.integers(), st.text(max_size=20),
                          st.booleans(), st.none()),
                lambda inner: st.lists(inner, min_size=1, max_size=4)
                | st.dictionaries(
                    st.text(min_size=1, max_size=6), inner,
                    min_size=1, max_size=4
                ),
                max_leaves=12,
            ),
            max_size=6,
        ),
        st.integers(min_value=8, max_value=400),
    )
    @settings(max_examples=60)
    def test_fixture_transcription_agrees_with_engine(self, obj, budget):
        from tools.make_extract_fixtures import split_json_like_spec

        assert split_json_like_spec(obj, budget) == parse_json(
            json.dumps(obj, ensure_ascii=False), budget
        )


class TestLevenshteinKernel:
    """ops.dedup._lev_bytes vs an independent classic DP and vs
    DuckDB's levenshtein() (byte semantics on unicode input)."""

    @staticmethod
    def _ref(a: bytes, b: bytes) -> int:
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            nd = [i] + [0] * len(b)
            for j in range(1, len(b) + 1):
                nd[j] = min(dp[j] + 1, nd[j - 1] + 1,
                            dp[j - 1] + (a[i - 1] != b[j - 1]))
            dp = nd
        return dp[len(b)]

    @given(st.binary(max_size=40), st.binary(max_size=40),
           st.integers(min_value=1, max_value=300))
    @settings(max_examples=150, deadline=None)
    def test_matches_reference_dp(self, a, b, cap):
        import numpy as np

        from ragflow_ray.ops.dedup import _lev_bytes

        got = _lev_bytes(np.frombuffer(a, dtype=np.uint8),
                         np.frombuffer(b, dtype=np.uint8), cap)
        assert got == min(self._ref(a, b), cap)

    @given(st.text(max_size=24), st.text(max_size=24))
    @settings(max_examples=40, deadline=None)
    def test_byte_semantics_match_duckdb(self, s, t):
        import duckdb
        import numpy as np

        from ragflow_ray.ops.dedup import _lev_bytes

        got = _lev_bytes(
            np.frombuffer(s.encode("utf-8"), dtype=np.uint8),
            np.frombuffer(t.encode("utf-8"), dtype=np.uint8), 1 << 30)
        want = duckdb.execute(
            "SELECT levenshtein(?, ?)", [s, t]).fetchone()[0]
        assert got == want


class TestCodecRoundtripProperties:
    """Property roundtrips for the session-7 codecs: any image/sample
    content must survive encode → from-scratch decode bit-exactly
    (all four containers are lossless in these forms)."""

    @given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32 - 1))
    @settings(max_examples=25, deadline=None)
    def test_bmp24_roundtrip(self, w, h, seed):
        import numpy as np

        from ragflow_ray.parsers.bmpdec import (decode_bmp,
                                                encode_bmp_rgb24)

        img = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp_rgb24(img)) == img).all()

    @given(st.integers(1, 10), st.integers(1, 10), st.integers(0, 2**32 - 1))
    @settings(max_examples=25, deadline=None)
    def test_tiff_rgb_roundtrip(self, w, h, seed):
        import numpy as np

        from ragflow_ray.parsers.tiffdec import (decode_tiff,
                                                 encode_tiff_rgb8)

        img = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_tiff(encode_tiff_rgb8(img)) == img).all()

    @given(st.binary(min_size=0, max_size=6000))
    @settings(max_examples=25, deadline=None)
    def test_tiff_lzw_roundtrip(self, raw):
        from ragflow_ray.parsers.tiffdec import _unlzw
        from tests.test_tiffdec import _lzw_encode

        assert _unlzw(_lzw_encode(raw), len(raw)) == raw

    @given(st.lists(st.integers(0, 255), min_size=1, max_size=6),
           st.integers(1, 60))
    @settings(max_examples=25, deadline=None)
    def test_avi_mjpeg_roundtrip(self, vals, fps):
        from ragflow_ray.parsers.avidec import (encode_avi_mjpeg,
                                                encode_jpeg_gray_uniform,
                                                parse_avi_mjpeg)

        frames = [encode_jpeg_gray_uniform(v) for v in vals]
        meta, got = parse_avi_mjpeg(
            encode_avi_mjpeg(frames, 16, 16, fps=fps))
        assert got == frames
        assert meta["n_frames"] == len(vals)
        assert meta["us_per_frame"] == 1_000_000 // fps

    @given(st.lists(st.integers(0, 255), min_size=1, max_size=5),
           st.integers(0, 2**32 - 1))
    @settings(max_examples=25, deadline=None)
    def test_gif_animation_roundtrip(self, vals, seed):
        import numpy as np

        from ragflow_ray.parsers.gifdec import (decode_gif_frames,
                                                encode_gif_gray_animation)

        rng = np.random.default_rng(seed)
        frames = [rng.integers(0, 256, (4, 4), dtype=np.uint8)
                  for _ in vals]
        delays = [int(v) for v in vals]
        meta, out = decode_gif_frames(
            encode_gif_gray_animation(frames, delays))
        assert meta["n_frames"] == len(frames)
        assert meta["delay_total_cs"] == sum(delays)
        for f, o in zip(frames, out):
            assert (o[:, :, 0] == f).all()
