"""Multimodal (binary-payload) stages.

The engine treats image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages
(decode / feature-extract / resize / frame-sample).  Four real
from-scratch codecs back the decode kernels: JPEG — baseline and
progressive — (the codec of the embedded PDF figures,
``parsers/jpegdec``), PNG (``parsers/pngdec``), GIF
(``parsers/gifdec``) and RIFF/WAVE PCM + G.711 (``parsers/wavdec``).
Codecs beyond those (JPEG 2000, WebP, MP3, …) need libraries absent from this
container, so for them ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless a deterministic fake decoder is
requested.  The Ray-side plumbing (schema, batch sizing for wide
rows, actor signature, output layout) is real and tested either way.

``media_payloads``/``media_features`` synthesize deterministic binary
payloads from the documents table and run the feature actor over them,
giving the multimodal path a DuckDB-checkable oracle (payload size,
md5 digest).  ``image_png_pool`` / ``audio_wav_frames`` go further:
they synthesize REAL PNG / WAV containers whose pixel / sample content
derives from the text's sha256 digest, run the actual decoders inside
the actor pool, and emit integer summaries DuckDB recomputes from the
same digest — so the real decode paths, not just the plumbing, are
oracle-checked end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# text-safe magic header so the DuckDB oracle can rebuild payloads
# with plain string concatenation
MAGIC = b"RFIMG1:"


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 array.

    Real path: JPEG (baseline and progressive) decodes through the
    from-scratch ``parsers/jpegdec`` implementation (ITU-T T.81
    sequential + Annex-G progressive Huffman — the codec of the
    embedded DCTDecode figures pdfbytes surfaces),
    PNG through the from-scratch ``parsers/pngdec`` (RFC 2083 inflate
    + unfilter), GIF through ``parsers/gifdec`` (LSB-first LZW), and
    pdfbytes' ``RFRAW1`` container (Flate/unfiltered 8-bit
    DeviceGray/DeviceRGB image XObjects) reshapes directly.
    Codecs beyond those (JPEG 2000, …) need libraries absent from this
    container — STUB.  With ``fake=True`` returns a deterministic 8×8
    gray image derived from the payload digest (stable across
    processes), which is what the fake-path oracled queries pin.
    """
    if not fake:
        if bytes(payload[:2]) == b"\xff\xd8":
            from ..parsers.jpegdec import decode_baseline_jpeg

            return decode_baseline_jpeg(bytes(payload))
        if bytes(payload[:7]) == b"RFRAW1:":
            # pdfbytes' raw container: Flate/unfiltered 8-bit
            # DeviceGray/DeviceRGB figure samples, already validated
            # against the declared geometry at extraction time
            b = bytes(payload)
            w = int.from_bytes(b[7:11], "big")
            h = int.from_bytes(b[11:15], "big")
            ncomp = b[15]
            arr = np.frombuffer(b[16:], dtype=np.uint8).reshape(h, w, ncomp)
            return np.repeat(arr, 3, axis=2) if ncomp == 1 else arr.copy()
        if bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n":
            from ..parsers.pngdec import decode_png

            return decode_png(bytes(payload))
        if bytes(payload[:6]) in (b"GIF87a", b"GIF89a"):
            from ..parsers.gifdec import decode_gif

            return decode_gif(bytes(payload))
        if bytes(payload[:2]) == b"BM":
            from ..parsers.bmpdec import decode_bmp

            return decode_bmp(bytes(payload))
        if bytes(payload[:4]) in (b"II*\x00", b"MM\x00*"):
            from ..parsers.tiffdec import decode_tiff

            return decode_tiff(bytes(payload))
        if bytes(payload[:2]) in (b"P4", b"P5", b"P6"):
            from ..parsers.pnmdec import decode_pnm

            return decode_pnm(bytes(payload))
        if len(payload) >= 18 and payload[1] in (0, 1) and (
                payload[2] in (1, 2, 3, 9, 10, 11)):
            # TGA has no magic; the header-shape check is the
            # conventional sniff (id/cmap/type triple)
            from ..parsers.tgadec import decode_tga

            return decode_tga(bytes(payload))
        raise NotImplementedError(
            "image codecs beyond JPEG/PNG/GIF/BMP/TIFF unavailable in "
            "this environment")
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer((digest * 6)[: 8 * 8 * 3], dtype=np.uint8)
    return arr.reshape(8, 8, 3).copy()


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an audio payload to a mono float32 waveform.

    Real path: RIFF/WAVE PCM, IEEE-float and G.711 A-law/μ-law decode
    through the from-scratch ``parsers/wavdec`` implementation
    (multi-channel streams downmix by channel mean); compressed codecs
    (MP3, AAC, …) need libraries absent from this container — STUB.
    ``fake=True`` returns the deterministic digest-derived waveform
    the fake-path oracled queries pin.
    """
    if not fake:
        if bytes(payload[:4]) == b"RIFF" and bytes(payload[8:12]) == b"WAVE":
            from ..parsers.wavdec import decode_wav

            frames, _rate = decode_wav(bytes(payload))
            if frames.shape[1] == 1:
                return frames[:, 0]
            return frames.mean(axis=1, dtype=np.float64).astype(np.float32)
        raise NotImplementedError(
            "audio codecs beyond RIFF/WAVE unavailable in this environment")
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * 32)[:1024], dtype=np.uint8)
    return (raw.astype(np.float32) - 127.5) / 127.5


class MediaFeatureStage:
    """Actor-pool stage for binary media rows.

    Small ``batch_size`` is mandatory here — rows are wide (binary
    payloads), so batch_size × concurrency must fit the worker heap
    (SURVEY.md §7.4 'wide records').
    """

    def __init__(self, fake_decode: bool = True):
        self.fake_decode = fake_decode

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sizes, digests, means = [], [], []
        for payload in batch["payload"]:
            payload = bytes(payload)
            sizes.append(len(payload))
            digests.append(hashlib.md5(payload).hexdigest())
            img = decode_image(payload, fake=self.fake_decode)
            means.append(int(img.mean() * 100))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "payload_bytes": pd.Series(sizes, dtype="int64"),
                "payload_md5": digests,
                "fake_pixel_mean_x100": pd.Series(means, dtype="int64"),
            }
        )


def media_payloads(sf_dir: str):
    """Synthesize a deterministic binary payload per document (the
    text bytes behind a magic header) — the stand-in for a real media
    column."""
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "payload": [MAGIC + t.encode() for t in batch["text"]],
            }
        )

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(build, batch_format="pandas")


def media_features(sf_dir: str, concurrency=None):
    """Payload → (size, md5, fake feature); oracled on size and md5."""
    ds = media_payloads(sf_dir)
    out = ds.map_batches(
        MediaFeatureStage,
        batch_format="pandas",
        batch_size=256,  # wide rows: keep batches small
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Integer mean-pool resize (H,W,3) → (out_h,out_w,3); input dims
    must be multiples of the output dims (the fake 8×8 path uses 4×4).
    Real interpolating resize needs the absent image libs — this is the
    deterministic kernel the actor stage runs on decoded arrays."""
    h, w, c = img.shape
    fh, fw = h // out_h, w // out_w
    pooled = img[: out_h * fh, : out_w * fw].reshape(out_h, fh, out_w, fw, c)
    return (pooled.sum(axis=(1, 3), dtype=np.int64) // (fh * fw)).astype(np.uint8)


class ImageResizeStage:
    """Actor-pool resize stage: decode → mean-pool → summary columns.

    Same batch-sizing discipline as :class:`MediaFeatureStage`; with a
    real codec the ``decode_image(fake=False)`` path drops in without
    touching the Ray plumbing.

    ``errors`` is the per-row fault policy (the ExtractStage
    discipline applied to media): ``"raise"`` (default — the oracled
    queries run over synthesized payloads that are valid by
    construction, so a failure there is a bug worth aborting on) or
    ``"skip"`` — a corrupt payload drops its row and bumps the
    stage's ``n_decode_errors`` counter instead of killing a
    100-TB job."""

    def __init__(self, out_h: int = 4, out_w: int = 4,
                 fake_decode: bool = True, errors: str = "raise"):
        self.out_h, self.out_w = out_h, out_w
        self.fake_decode = fake_decode
        self.errors = errors
        self.n_decode_errors = 0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, sums, digests = [], [], []
        for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
            try:
                img = decode_image(bytes(payload), fake=self.fake_decode)
                small = resize_image(img, self.out_h, self.out_w)
            except Exception:
                if self.errors != "skip":
                    raise
                self.n_decode_errors += 1
                continue
            ids.append(doc_id)
            sums.append(int(small.sum()))
            digests.append(hashlib.md5(small.tobytes()).hexdigest())
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "out_h": pd.Series([self.out_h] * len(ids), dtype="int64"),
                "out_w": pd.Series([self.out_w] * len(ids), dtype="int64"),
                "resized_sum": pd.Series(sums, dtype="int64"),
                "resized_md5": digests,
            }
        )


def media_resize(sf_dir: str, concurrency=None):
    """8×8 fake-decoded images → 4×4 mean-pooled summaries.

    ``resized_sum`` is exactly recomputable in SQL from the sha256
    digest bytes (the fake image is the digest repeated), which makes
    the resize **kernel** — not just the plumbing — oracle-checked."""
    out = media_payloads(sf_dir).map_batches(
        ImageResizeStage, batch_format="pandas", batch_size=256,
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


class AudioFrameSampleStage:
    """Actor-pool frame sampler: decode waveform → strided sample →
    summary columns (the video-frame-sampling shape, 1-D)."""

    def __init__(self, stride: int = 63, fake_decode: bool = True,
                 denorm: str = "u8"):
        self.stride = stride
        self.fake_decode = fake_decode
        # "u8" undoes the fake decoder's (x-127.5)/127.5 normalization;
        # "i16" undoes wavdec's PCM16 v/32768 (exact in float32, so the
        # recovered ints equal the encoded samples bit-for-bit)
        self.denorm = denorm

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        counts, sums = [], []
        for payload in batch["payload"]:
            wave = decode_audio(bytes(payload), fake=self.fake_decode)
            sampled = wave[:: self.stride]
            counts.append(len(sampled))
            # undo the float normalization for an integer-exact summary
            if self.denorm == "i16":
                raw = np.round(sampled.astype(np.float64) * 32768.0).astype(np.int64)
            else:
                raw = np.floor(sampled * 127.5 + 127.5 + 0.5).astype(np.int64)
            sums.append(int(raw.sum()))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_frames": pd.Series(counts, dtype="int64"),
                "frame_sum": pd.Series(sums, dtype="int64"),
            }
        )


def media_frame_sample(sf_dir: str, stride: int = 63, concurrency=None):
    """Strided frame sampling over the fake-decoded 1024-sample
    waveform; integer frame sums are SQL-recomputable from the digest."""
    out = media_payloads(sf_dir).map_batches(
        AudioFrameSampleStage, batch_format="pandas", batch_size=256,
        fn_constructor_kwargs={"stride": stride},
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


class ImagePHashStage:
    """Actor-pool perceptual-key stage: decode → mean-pool to 4×4 →
    emit the pooled pixel vector as the dedup key.  With a real codec
    the same mean-pool key clusters near-identical images (recompressed
    / slightly-edited copies collapse to one thumbnail); with the fake
    decoder it exercises the identical plan."""

    def __init__(self, out_h: int = 4, out_w: int = 4,
                 fake_decode: bool = True, quant_shift: int = 0):
        self.out_h, self.out_w = out_h, out_w
        self.fake_decode = fake_decode
        # perceptual coarseness: each pooled cell drops its low
        # ``quant_shift`` bits, so near-identical images land in one
        # bucket (shift 0 = the exact-thumbnail key)
        self.quant_shift = quant_shift

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        keys = []
        for payload in batch["payload"]:
            img = decode_image(bytes(payload), fake=self.fake_decode)
            small = resize_image(img, self.out_h, self.out_w)
            vals = small.flatten() >> self.quant_shift
            keys.append(",".join(str(int(v)) for v in vals))
        return pd.DataFrame({"doc_id": batch["doc_id"], "phash": keys})


def media_phash_dedup(sf_dir: str, concurrency=None):
    """Image near-dup groups by perceptual (downsampled-thumbnail) key:
    one row per distinct thumbnail — id-minimal keeper + member count.

    The canonical image-dedup plan at corpus scale: the decode+pool
    actor pool reduces each payload to a tiny key, and only the keys
    shuffle (one groupby with C-level Min/Count aggregates); payloads
    never move after the feature stage.  Oracled exactly: the pooled
    pixels are recomputed in SQL from the sha256 digest bytes (same
    derivation as the media_resize oracle)."""
    from ray.data.aggregate import Count, Min

    keys = media_payloads(sf_dir).map_batches(
        ImagePHashStage, batch_format="pandas", batch_size=256,
        concurrency=concurrency or 2,
    )
    df = (
        keys.groupby("phash")
        .aggregate(Min("doc_id", alias_name="keeper_doc_id"),
                   Count(alias_name="n_members"))
        .to_pandas()
        .sort_values("keeper_doc_id").reset_index(drop=True)
    )
    for c in ("keeper_doc_id", "n_members"):
        df[c] = df[c].astype("int64")
    return df[["keeper_doc_id", "n_members"]]


# ---------------------------------------------------------------------------
# real-codec oracle queries: synthesize actual PNG / WAV containers from
# digest bytes, decode them with the from-scratch decoders inside the actor
# pool, and emit integer summaries DuckDB recomputes from the same digest
# ---------------------------------------------------------------------------

def _digest_bytes(text: str, prefix: bytes) -> bytes:
    return hashlib.sha256(prefix + text.encode()).digest()


def _rgb_digest_payloads(sf_dir: str, prefix: bytes, encode):
    """Shared builder for the single-image RGB codec oracles: the 8×8
    image whose pixels are sha256(prefix+text) tiled to 192 bytes,
    pushed through ``encode`` — one derivation, many containers, so
    every such oracle shares the same SQL digest expansion."""
    from ..sources.readers import read_parquet_clean

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for t in batch["text"]:
            d = _digest_bytes(t, prefix)
            img = np.frombuffer((d * 6)[:192],
                                dtype=np.uint8).reshape(8, 8, 3)
            payloads.append(encode(img))
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "payload": payloads})

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(build, batch_format="pandas")


def png_payloads(sf_dir: str):
    """One REAL 8x8 RGB PNG per document, pixels = sha256('RFPNG1:'+text)
    digest tiled to 192 bytes (the same derivation the fake image path
    uses, so the existing SQL digest expansion recomputes the pixels)."""
    from ..parsers.pngdec import encode_png_rgb

    return _rgb_digest_payloads(sf_dir, b"RFPNG1:", encode_png_rgb)


def image_png_pool(sf_dir: str, concurrency=None):
    """REAL PNG decode, oracle-checked: encode → actor-pool
    ``decode_png`` → 4×4 mean-pool → ``resized_sum`` that DuckDB
    recomputes from the digest bytes (pixel-exact because PNG is
    lossless).  This pins the whole real image path — container build,
    from-scratch inflate+unfilter decode, pool kernel — not just the
    Ray plumbing."""
    out = png_payloads(sf_dir).map_batches(
        ImageResizeStage, batch_format="pandas", batch_size=256,
        fn_constructor_kwargs={"fake_decode": False},
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


def wav_payloads(sf_dir: str, n_samples: int = 1024):
    """One REAL mono PCM16 RIFF/WAVE per document; sample[i] =
    (db[i % 32] - 128) * 256 over the sha256('RFWAV1:'+text) digest
    bytes — every value sits on the int16 grid, so the float32 decode
    (v / 32768) is exact and SQL can recompute strided sums."""
    import ray.data as rd

    from ..parsers.wavdec import encode_wav_pcm16
    from ..sources.readers import read_parquet_clean

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        idx = np.arange(n_samples) % 32
        payloads = []
        for t in batch["text"]:
            db = np.frombuffer(_digest_bytes(t, b"RFWAV1:"), dtype=np.uint8)
            samples = ((db[idx].astype(np.int32) - 128) * 256).astype(np.int16)
            payloads.append(encode_wav_pcm16(samples, sample_rate=16000))
        return pd.DataFrame({"doc_id": batch["doc_id"], "payload": payloads})

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(build, batch_format="pandas")


def audio_wav_frames(sf_dir: str, stride: int = 63, concurrency=None):
    """REAL WAV decode, oracle-checked: encode PCM16 → actor-pool
    ``decode_wav`` → stride-63 frame sample → integer de-normalized
    ``frame_sum`` that DuckDB recomputes from the digest bytes."""
    out = wav_payloads(sf_dir).map_batches(
        AudioFrameSampleStage, batch_format="pandas", batch_size=256,
        fn_constructor_kwargs={"stride": stride, "fake_decode": False,
                               "denorm": "i16"},
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


def gif_payloads(sf_dir: str):
    """One REAL 8x8 GIF per document over a 256-level gray palette,
    indices = sha256('RFGIF1:'+text) digest tiled to 64 bytes."""
    import ray.data as rd

    from ..parsers.gifdec import encode_gif_gray
    from ..sources.readers import read_parquet_clean

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for t in batch["text"]:
            d = _digest_bytes(t, b"RFGIF1:")
            idx = np.frombuffer((d * 2)[:64], dtype=np.uint8).reshape(8, 8)
            payloads.append(encode_gif_gray(idx))
        return pd.DataFrame({"doc_id": batch["doc_id"], "payload": payloads})

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(build, batch_format="pandas")


def image_gif_pool(sf_dir: str, concurrency=None):
    """REAL GIF decode, oracle-checked: LZW encode → actor-pool
    ``decode_gif`` → 4×4 mean-pool → ``resized_sum`` that DuckDB
    recomputes from the digest bytes (lossless, so equality is
    exact; the gray palette makes all three channels equal)."""
    out = gif_payloads(sf_dir).map_batches(
        ImageResizeStage, batch_format="pandas", batch_size=256,
        fn_constructor_kwargs={"fake_decode": False},
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


def g711_payloads(sf_dir: str, n_samples: int = 1024):
    """One REAL μ-law RIFF/WAVE per document; compressed byte[i] =
    db[i % 32] over the sha256('RFULAW1:'+text) digest bytes, so the
    SQL oracle can recompute the G.711 segment expansion inline."""
    import struct

    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        idx = np.arange(n_samples) % 32
        fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)  # MULAW mono
        payloads = []
        for t in batch["text"]:
            db = np.frombuffer(_digest_bytes(t, b"RFULAW1:"), dtype=np.uint8)
            raw = db[idx].tobytes()
            body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(raw)) + raw)
            payloads.append(b"RIFF" + struct.pack("<I", len(body)) + body)
        return pd.DataFrame({"doc_id": batch["doc_id"], "payload": payloads})

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(build, batch_format="pandas")


def audio_g711_frames(sf_dir: str, stride: int = 63, concurrency=None):
    """REAL G.711 μ-law decode, oracle-checked: the actor pool expands
    each compressed byte through the from-scratch table, and DuckDB
    recomputes the segment expansion arithmetically (complement →
    segment/mantissa → ((mant·8+132)·2^seg)−132, signed) from the
    same digest bytes — the companded-domain math itself is pinned in
    SQL, not just the container plumbing."""
    out = g711_payloads(sf_dir).map_batches(
        AudioFrameSampleStage, batch_format="pandas", batch_size=256,
        fn_constructor_kwargs={"stride": stride, "fake_decode": False,
                               "denorm": "i16"},
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


_UNIFORM_JPEG_MEMO: dict = {}


def avi_payloads(sf_dir: str, n_frames: int = 8, width: int = 16,
                 height: int = 16, fps: int = 10):
    """One REAL MJPEG-in-AVI container per document: frame ``j`` is a
    uniform-gray baseline JPEG whose pixel value is
    ``db[(5·j) % 32]`` over the sha256('RFAVI1:'+text) digest bytes —
    uniform frames under all-ones quantization decode bit-exactly, so
    the SQL oracle recomputes the decoded content from the digest."""
    import ray.data as rd

    from ..parsers.avidec import encode_avi_mjpeg, encode_jpeg_gray_uniform
    from ..sources.readers import read_parquet_clean

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        # a uniform frame has only 256 possible pixel values: the
        # worker-process memo turns the per-doc JPEG encodes into
        # dict lookups (the repo's module-level-cache idiom)
        memo = _UNIFORM_JPEG_MEMO.setdefault((width, height), {})
        payloads = []
        for t in batch["text"]:
            db = _digest_bytes(t, b"RFAVI1:")
            frames = []
            for j in range(n_frames):
                v = db[(5 * j) % 32]
                f = memo.get(v)
                if f is None:
                    f = memo[v] = encode_jpeg_gray_uniform(
                        v, width, height)
                frames.append(f)
            payloads.append(encode_avi_mjpeg(frames, width, height, fps))
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "payload": payloads})

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(build, batch_format="pandas")


class VideoFrameSampleStage:
    """Actor-pool video stage: parse the AVI container, decode every
    ``stride``-th frame through the from-scratch JPEG decoder, emit
    container metadata + the integer sum of sampled frame means.
    Small ``batch_size`` is mandatory (wide binary rows, the
    MediaFeatureStage discipline); real decoders make this the
    canonical stateful-pool shape — codec state loads once per actor."""

    def __init__(self, stride: int = 3):
        self.stride = stride

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..parsers.avidec import decode_avi_gray_means

        width, height, n_frames, n_sampled, frame_sum = [], [], [], [], []
        for payload in batch["payload"]:
            out = decode_avi_gray_means(bytes(payload), stride=self.stride)
            width.append(out["width"])
            height.append(out["height"])
            n_frames.append(out["n_frames"])
            n_sampled.append(len(out["frame_means"]))
            frame_sum.append(sum(out["frame_means"]))
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "width": pd.Series(width, dtype="int64"),
            "height": pd.Series(height, dtype="int64"),
            "n_frames": pd.Series(n_frames, dtype="int64"),
            "n_sampled": pd.Series(n_sampled, dtype="int64"),
            "frame_sum": pd.Series(frame_sum, dtype="int64"),
        })


def video_mjpeg_frames(sf_dir: str, stride: int = 3, concurrency=None):
    """REAL video decode, oracle-checked end-to-end: synthesize an
    MJPEG AVI per document, parse the RIFF container (idx1-driven
    frame discovery with a sequential fallback), decode the sampled
    frames through ``parsers/jpegdec``, and emit integer summaries
    DuckDB recomputes from the same digest bytes — container walk,
    entropy decode, and the sampling plan all pinned, not just the
    Ray plumbing."""
    out = avi_payloads(sf_dir).map_batches(
        VideoFrameSampleStage, batch_format="pandas", batch_size=256,
        fn_constructor_kwargs={"stride": stride},
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


def bmp_payloads(sf_dir: str):
    """The shared RGB derivation under RFBMP1 through the BMP encoder
    (uncompressed, exact — same SQL expansion as the PNG oracle)."""
    from ..parsers.bmpdec import encode_bmp_rgb24

    return _rgb_digest_payloads(sf_dir, b"RFBMP1:", encode_bmp_rgb24)


def image_bmp_pool(sf_dir: str, concurrency=None):
    """REAL BMP decode, oracle-checked: encode the bottom-up 24-bit
    DIB → actor-pool ``decode_bmp`` (row flip, BGR swap, padding walk)
    → 4×4 mean-pool → ``resized_sum`` DuckDB recomputes from the
    digest bytes — the legacy-Office embedded-picture decode path."""
    out = bmp_payloads(sf_dir).map_batches(
        ImageResizeStage, batch_format="pandas", batch_size=256,
        fn_constructor_kwargs={"fake_decode": False},
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


def zcr_payloads(sf_dir: str, n_samples: int = 1024):
    """One REAL mono PCM16 RIFF/WAVE per document whose sample stream
    has period ``n_samples`` (not 32): sample[i] =
    ``(db[i % 32] XOR db[(i // 32) % 32] - 128) * 256`` over the
    sha256('RFZCR1:'+text) digest — the plain ``i % 32`` derivation
    would repeat every 32 samples and make every analysis window
    identical, a degenerate oracle."""
    from ..parsers.wavdec import encode_wav_pcm16
    from ..sources.readers import read_parquet_clean

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        i = np.arange(n_samples)
        payloads = []
        for t in batch["text"]:
            db = np.frombuffer(_digest_bytes(t, b"RFZCR1:"),
                               dtype=np.uint8).astype(np.int32)
            v = np.bitwise_xor(db[i % 32], db[(i // 32) % 32])
            samples = ((v - 128) * 256).astype(np.int16)
            payloads.append(encode_wav_pcm16(samples, sample_rate=16000))
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "payload": payloads})

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(build, batch_format="pandas")


class AudioEnergyZcrStage:
    """Actor-pool audio-analysis stage: decode → fixed windows →
    per-window energy (Σ s², exact int64 on the PCM16 grid) and
    zero-crossing count (strict sign flips between adjacent samples
    within a window) — the speech/music discrimination features a
    curation pipeline computes per clip, all integer so the oracle is
    exact."""

    def __init__(self, window: int = 128):
        self.window = window

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        w = self.window
        n_windows, tot_e, tot_z, max_e = [], [], [], []
        for payload in batch["payload"]:
            wave = decode_audio(bytes(payload), fake=False)
            s = np.round(wave.astype(np.float64) * 32768.0).astype(np.int64)
            nw = len(s) // w
            win = s[: nw * w].reshape(nw, w)
            energy = (win * win).sum(axis=1)
            flips = ((win[:, :-1] * win[:, 1:]) < 0).sum(axis=1)
            n_windows.append(nw)
            tot_e.append(int(energy.sum()))
            tot_z.append(int(flips.sum()))
            max_e.append(int(energy.max()) if nw else 0)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_windows": pd.Series(n_windows, dtype="int64"),
            "total_energy": pd.Series(tot_e, dtype="int64"),
            "total_zcr": pd.Series(tot_z, dtype="int64"),
            "max_window_energy": pd.Series(max_e, dtype="int64"),
        })


def audio_energy_zcr(sf_dir: str, window: int = 128, concurrency=None):
    """REAL audio feature extraction, oracle-checked: PCM16 decode
    through ``parsers/wavdec``, then windowed energy + zero-crossing
    features whose integer values DuckDB recomputes from the digest
    bytes — decode AND feature math pinned end-to-end."""
    out = zcr_payloads(sf_dir).map_batches(
        AudioEnergyZcrStage, batch_format="pandas", batch_size=256,
        fn_constructor_kwargs={"window": window},
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


def tiff_payloads(sf_dir: str):
    """The shared RGB derivation under RFTIF1 through the single-strip
    TIFF encoder (uncompressed, exact)."""
    from ..parsers.tiffdec import encode_tiff_rgb8

    return _rgb_digest_payloads(sf_dir, b"RFTIF1:", encode_tiff_rgb8)


def image_tiff_pool(sf_dir: str, concurrency=None):
    """REAL TIFF decode, oracle-checked: single-strip RGB encode →
    actor-pool ``decode_tiff`` (IFD walk, strip reassembly) → 4×4
    mean-pool → ``resized_sum`` DuckDB recomputes from the digest —
    the scanned-page-sidecar decode path."""
    out = tiff_payloads(sf_dir).map_batches(
        ImageResizeStage, batch_format="pandas", batch_size=256,
        fn_constructor_kwargs={"fake_decode": False},
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


_UNIFORM_GIF_MEMO: dict = {}


def gif_anim_payloads(sf_dir: str, n_frames: int = 6, size: int = 8):
    """One REAL animated GIF per document: frame ``j`` is the full
    ``size``×``size`` canvas filled with gray index
    ``db[(3·j) % 32]`` (sha256('RFGIFA1:'+text)), GCE delay
    ``10 + j`` centiseconds — lossless, so sampled frame means and
    the container's total delay are digest-recomputable."""
    from ..parsers.gifdec import encode_gif_gray_animation
    from ..sources.readers import read_parquet_clean

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        # uniform frames have 256 possible values: memoize the encoded
        # image block per (value, size) in the worker process (the
        # avi_payloads discipline) and only assemble the container
        from ..parsers.gifdec import (_gray_image_block, gce_bytes,
                                      gif_gray_header)

        memo = _UNIFORM_GIF_MEMO.setdefault(size, {})
        header = gif_gray_header(size, size)
        payloads = []
        for t in batch["text"]:
            db = _digest_bytes(t, b"RFGIFA1:")
            out = bytearray(header)
            for j in range(n_frames):
                v = db[(3 * j) % 32]
                blk = memo.get(v)
                if blk is None:
                    blk = memo[v] = _gray_image_block(
                        np.full((size, size), v, dtype=np.uint8))
                out += gce_bytes(10 + j)
                out += blk
            out.append(0x3B)
            payloads.append(bytes(out))
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "payload": payloads})

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(build, batch_format="pandas")


class GifFrameSampleStage:
    """Actor-pool animated-GIF stage: full frame walk (disposal,
    delays) through ``decode_gif_frames``, strided sample, integer
    frame-mean summaries."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..parsers.gifdec import decode_gif_frames

        n_frames, n_sampled, frame_sum, delay_cs = [], [], [], []
        for payload in batch["payload"]:
            meta, frames = decode_gif_frames(bytes(payload))
            sampled = frames[:: self.stride]
            means = [int(f.astype(np.int64).sum() // f.size)
                     for f in sampled]
            n_frames.append(meta["n_frames"])
            n_sampled.append(len(sampled))
            frame_sum.append(sum(means))
            delay_cs.append(meta["delay_total_cs"])
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_frames": pd.Series(n_frames, dtype="int64"),
            "n_sampled": pd.Series(n_sampled, dtype="int64"),
            "frame_sum": pd.Series(frame_sum, dtype="int64"),
            "delay_total_cs": pd.Series(delay_cs, dtype="int64"),
        })


def video_gif_frames(sf_dir: str, stride: int = 2, concurrency=None):
    """REAL animated-GIF decode, oracle-checked: the actor pool walks
    every frame (graphic-control extensions, compositing), samples at
    a stride, and DuckDB recomputes the sampled frame means AND the
    summed GCE delays from the digest bytes — the animation walk
    itself is pinned, not just frame 1."""
    out = gif_anim_payloads(sf_dir).map_batches(
        GifFrameSampleStage, batch_format="pandas", batch_size=256,
        fn_constructor_kwargs={"stride": stride},
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


def mixed_image_payloads(sf_dir: str):
    """A POLYGLOT image column: ``doc_id % 4`` picks the container —
    PNG, GIF, BMP or TIFF — with each type's established digest
    derivation, so one Dataset carries four real formats and the
    decode stage must dispatch on magic bytes per row (the shape of a
    scraped-web image column)."""
    from ..parsers.bmpdec import encode_bmp_rgb24
    from ..parsers.gifdec import encode_gif_gray
    from ..parsers.pngdec import encode_png_rgb
    from ..parsers.tiffdec import encode_tiff_rgb8
    from ..sources.readers import read_parquet_clean

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for doc_id, t in zip(batch["doc_id"], batch["text"]):
            kind = int(doc_id) % 4
            if kind == 0:
                d = _digest_bytes(t, b"RFPNG1:")
                img = np.frombuffer((d * 6)[: 192],
                                    dtype=np.uint8).reshape(8, 8, 3)
                payloads.append(encode_png_rgb(img))
            elif kind == 1:
                d = _digest_bytes(t, b"RFGIF1:")
                idx = np.frombuffer((d * 2)[:64],
                                    dtype=np.uint8).reshape(8, 8)
                payloads.append(encode_gif_gray(idx))
            elif kind == 2:
                d = _digest_bytes(t, b"RFBMP1:")
                img = np.frombuffer((d * 6)[: 192],
                                    dtype=np.uint8).reshape(8, 8, 3)
                payloads.append(encode_bmp_rgb24(img))
            else:
                d = _digest_bytes(t, b"RFTIF1:")
                img = np.frombuffer((d * 6)[: 192],
                                    dtype=np.uint8).reshape(8, 8, 3)
                payloads.append(encode_tiff_rgb8(img))
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "payload": payloads})

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(build, batch_format="pandas")


def image_mixed_pool(sf_dir: str, concurrency=None):
    """REAL polyglot decode, oracle-checked: four container formats in
    ONE column, the actor pool dispatching on magic bytes row by row
    (``decode_image``'s production shape); the SQL oracle recomputes
    each row's pooled pixels from the digest prefix its container type
    selects."""
    out = mixed_image_payloads(sf_dir).map_batches(
        ImageResizeStage, batch_format="pandas", batch_size=256,
        fn_constructor_kwargs={"fake_decode": False},
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


def ico_payloads(sf_dir: str):
    """One REAL favicon per document: ``doc_id % 2`` picks a PNG-entry
    (modern) or DIB-entry (legacy, doubled-height header + AND mask)
    ICO, each wrapping the 8×8 image from the RFICO1 digest
    derivation — both entry forms are lossless, one derivation serves
    both in SQL."""
    from ..parsers.bmpdec import encode_bmp_rgb24
    from ..parsers.icodec import encode_ico
    from ..parsers.pngdec import encode_png_rgb
    from ..sources.readers import read_parquet_clean

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for doc_id, t in zip(batch["doc_id"], batch["text"]):
            d = _digest_bytes(t, b"RFICO1:")
            img = np.frombuffer((d * 6)[:192],
                                dtype=np.uint8).reshape(8, 8, 3)
            inner = (encode_png_rgb(img) if int(doc_id) % 2 == 0
                     else encode_bmp_rgb24(img))
            payloads.append(encode_ico([inner]))
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "payload": payloads})

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(build, batch_format="pandas")


class IcoPoolStage:
    """Actor-pool favicon stage: ICO directory walk → inner PNG/DIB
    decode → mean-pool summary (the ImageResizeStage shape with the
    container unwrap in front)."""

    def __init__(self, out_h: int = 4, out_w: int = 4):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..parsers.icodec import decode_ico

        sums = []
        for payload in batch["payload"]:
            img = decode_ico(bytes(payload))
            small = resize_image(img, self.out_h, self.out_w)
            sums.append(int(small.sum()))
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "out_h": pd.Series([self.out_h] * len(batch), dtype="int64"),
            "out_w": pd.Series([self.out_w] * len(batch), dtype="int64"),
            "resized_sum": pd.Series(sums, dtype="int64"),
        })


def image_ico_pool(sf_dir: str, concurrency=None):
    """REAL favicon decode, oracle-checked: the ICO directory walk
    selects the entry, the inner PNG or legacy DIB (doubled-height
    header, AND mask) decodes through the existing from-scratch
    codecs, and DuckDB recomputes the pooled pixels from the shared
    digest derivation — both entry forms land on the same oracle."""
    out = ico_payloads(sf_dir).map_batches(
        IcoPoolStage, batch_format="pandas", batch_size=256,
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


def tiff_pages_payloads(sf_dir: str, n_pages: int = 3):
    """One REAL multi-page TIFF per document (the scanned-document
    IFD chain): page ``p`` is the 8×8 RGB image whose pixels are the
    sha256('RFTIFP1:'+text) digest ROTATED by ``p`` bytes, tiled to
    192 — a one-line SQL shift of the shared expansion."""
    from ..parsers.tiffdec import encode_tiff_rgb8_pages
    from ..sources.readers import read_parquet_clean

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for t in batch["text"]:
            d = _digest_bytes(t, b"RFTIFP1:")
            pages = []
            for p in range(n_pages):
                rot = d[p:] + d[:p]
                pages.append(np.frombuffer((rot * 6)[:192],
                                           dtype=np.uint8).reshape(8, 8, 3))
            payloads.append(encode_tiff_rgb8_pages(pages))
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "payload": payloads})

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(build, batch_format="pandas")


class TiffPagesStage:
    """Actor-pool multi-page stage: walk the IFD chain, mean-pool
    every page, emit per-document page count + summed pooled sums."""

    def __init__(self, out_h: int = 4, out_w: int = 4):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..parsers.tiffdec import decode_tiff_pages

        n_pages, pooled = [], []
        for payload in batch["payload"]:
            pages = decode_tiff_pages(bytes(payload))
            n_pages.append(len(pages))
            pooled.append(sum(
                int(resize_image(pg, self.out_h, self.out_w).sum())
                for pg in pages))
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_pages": pd.Series(n_pages, dtype="int64"),
            "pooled_sum": pd.Series(pooled, dtype="int64"),
        })


def tiff_multipage_pool(sf_dir: str, concurrency=None):
    """REAL multi-page TIFF decode, oracle-checked: the IFD-chain walk
    (next-IFD pointers, per-page strip reassembly) runs in the actor
    pool and DuckDB recomputes every page's pooled pixels from the
    rotated digest — the scanned-document ingestion shape."""
    out = tiff_pages_payloads(sf_dir).map_batches(
        TiffPagesStage, batch_format="pandas", batch_size=256,
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


def pnm_payloads(sf_dir: str):
    """The shared RGB derivation under RFPNM1 through the P6 encoder
    (raw raster, trivially lossless)."""
    from ..parsers.pnmdec import encode_ppm_rgb8

    return _rgb_digest_payloads(sf_dir, b"RFPNM1:", encode_ppm_rgb8)


def image_pnm_pool(sf_dir: str, concurrency=None):
    """REAL Netpbm decode, oracle-checked — the scanner-pipeline
    interchange format through the same pool/oracle shape."""
    out = pnm_payloads(sf_dir).map_batches(
        ImageResizeStage, batch_format="pandas", batch_size=256,
        fn_constructor_kwargs={"fake_decode": False},
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


def mixed_phash_dedup(sf_dir: str, concurrency=None):
    """Perceptual-key dedup OVER THE POLYGLOT COLUMN: the four-format
    payload stream (PNG/GIF/BMP/TIFF by doc_id) runs the phash actor
    pool — per-row magic dispatch, decode, 4×4 mean-pool key — and
    ONE groupby with C-level Min/Count aggregates clusters identical
    thumbnails; only keys shuffle, payloads never move after the
    feature stage.  Oracled exactly: DuckDB rebuilds each row's key
    string from the digest expansion its container type selects and
    groups the same way — the full decode+dedup composition pinned,
    across codecs, in one query."""
    from ray.data.aggregate import Count, Min

    keys = mixed_image_payloads(sf_dir).map_batches(
        ImagePHashStage, batch_format="pandas", batch_size=256,
        # 1x1 pool at 4-bit precision: the perceptual-BUCKETING end of
        # the phash spectrum (media_phash_dedup keeps the exact
        # 4x4 end) — real clusters form on this corpus
        fn_constructor_kwargs={"fake_decode": False, "out_h": 1,
                               "out_w": 1, "quant_shift": 4},
        concurrency=concurrency or 2,
    )
    df = (
        keys.groupby("phash")
        .aggregate(Min("doc_id", alias_name="keeper_doc_id"),
                   Count(alias_name="n_members"))
        .to_pandas()
        .sort_values("keeper_doc_id").reset_index(drop=True)
    )
    for c in ("keeper_doc_id", "n_members"):
        df[c] = df[c].astype("int64")
    return df[["keeper_doc_id", "n_members"]]


def tga_payloads(sf_dir: str):
    """The shared RGB derivation under RFTGA1 through the type-2 TGA
    encoder (uncompressed, lossless)."""
    from ..parsers.tgadec import encode_tga_rgb24

    return _rgb_digest_payloads(sf_dir, b"RFTGA1:", encode_tga_rgb24)


def image_tga_pool(sf_dir: str, concurrency=None):
    """REAL TGA decode, oracle-checked — header-shape sniff, BGR swap,
    bottom-up flip through the shared pool/oracle shape."""
    out = tga_payloads(sf_dir).map_batches(
        ImageResizeStage, batch_format="pandas", batch_size=256,
        fn_constructor_kwargs={"fake_decode": False},
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")


def pitch_payloads(sf_dir: str, n_samples: int = 1024):
    """PCM16 payloads under the RFPIT1 prefix with the period-1024
    xor derivation (the zcr_payloads construction — short-period
    streams would make every analysis window's autocorrelation
    identical)."""
    from ..parsers.wavdec import encode_wav_pcm16
    from ..sources.readers import read_parquet_clean

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        i = np.arange(n_samples)
        payloads = []
        for t in batch["text"]:
            db = np.frombuffer(_digest_bytes(t, b"RFPIT1:"),
                               dtype=np.uint8).astype(np.int32)
            v = np.bitwise_xor(db[i % 32], db[(i // 32) % 32])
            samples = ((v - 128) * 256).astype(np.int16)
            payloads.append(encode_wav_pcm16(samples, sample_rate=16000))
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "payload": payloads})

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(build, batch_format="pandas")


class AudioPitchStage:
    """Actor-pool pitch-analysis stage: per fixed window, the lag in
    [lag_lo, lag_hi) maximizing the raw autocorrelation
    ``r(k) = Σ s_i · s_{i+k}`` (ties → smallest lag) — the classic
    integer pitch detector, exact on the PCM16 grid so the oracle
    recomputes both the winning lags and the peak values."""

    def __init__(self, window: int = 256, lag_lo: int = 8,
                 lag_hi: int = 32):
        self.window, self.lag_lo, self.lag_hi = window, lag_lo, lag_hi

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        w, lo, hi = self.window, self.lag_lo, self.lag_hi
        n_windows, lag_sum, r_max = [], [], []
        for payload in batch["payload"]:
            wave = decode_audio(bytes(payload), fake=False)
            s = np.round(wave.astype(np.float64) * 32768.0).astype(np.int64)
            nw = len(s) // w
            win = s[: nw * w].reshape(nw, w)
            rr = np.stack([
                (win[:, : w - k] * win[:, k:]).sum(axis=1)
                for k in range(lo, hi)
            ], axis=1)                          # (nw, hi-lo)
            best = rr.argmax(axis=1)            # first max = min lag
            n_windows.append(nw)
            lag_sum.append(int((best + lo).sum()))
            r_max.append(int(rr.max(axis=1).sum()))
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_windows": pd.Series(n_windows, dtype="int64"),
            "best_lag_sum": pd.Series(lag_sum, dtype="int64"),
            "r_max_total": pd.Series(r_max, dtype="int64"),
        })


def audio_pitch_lags(sf_dir: str, concurrency=None):
    """REAL pitch analysis, oracle-checked: windowed integer
    autocorrelation over the PCM16 decode, with the per-window argmax
    lag (smallest-lag ties) and summed peak values recomputed by
    DuckDB from the digest bytes."""
    out = pitch_payloads(sf_dir).map_batches(
        AudioPitchStage, batch_format="pandas", batch_size=256,
        concurrency=concurrency or 2,
    )
    return out.sort("doc_id")
