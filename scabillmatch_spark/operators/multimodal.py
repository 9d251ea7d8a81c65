"""Multimodal column plumbing (north-star extension).

Images/audio/video ride as opaque ``binary`` columns with a typed metadata
struct. The Spark-side machinery — schemas, Arrow batching via mapInPandas,
partition sizing — is real and tested. Codecs come in two tiers:

- REAL decoders for the formats parsable with stdlib+numpy alone:
  PGM/PPM (P5/P6), uncompressed 8/24-bit BMP, WAV (stdlib ``wave``), and
  concatenated-PNM frame streams (the ``ffmpeg -f image2pipe`` wire
  format) for video-style frame sampling. Decode, nearest-neighbor
  resize, and re-encode are numpy end-to-end.
- STUBS for compressed formats (JPEG/PNG/MP4 need PIL/ffmpeg, absent in
  this environment): ``deterministic_fake=True`` derives plausible
  metadata from the content hash, ``False`` raises NotImplementedError.

Scale notes: binary payloads dominate row size — operators use mapInPandas
(streaming Arrow batches, no full-partition materialization) and never
shuffle the binary column unless the caller asks (metadata-only projections
drop it first).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("mean_px", T.DoubleType()),  # None when dims are faked
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as an opaque payload so the binary
    pipeline is exercisable on the driver's tables."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic fake of an image decode: dims derived from content hash."""
    h = hashlib.sha1(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


# ---------------------------------------------------------------------------
# Real codecs (stdlib + numpy): PNM (P5/P6), uncompressed BMP, WAV
# ---------------------------------------------------------------------------


def _parse_pnm_header(data: bytes, pos: int = 0):
    """Parse one P5/P6 header starting at ``pos`` -> (magic, w, h, maxval,
    raster_start) or None. Handles '#' comments and arbitrary whitespace per
    the netpbm spec."""
    if data[pos : pos + 2] not in (b"P5", b"P6"):
        return None
    magic = data[pos : pos + 2].decode()
    i, fields = pos + 2, []
    while len(fields) < 3 and i < len(data):
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment to end of line
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    if len(fields) < 3:
        return None
    i += 1  # exactly one whitespace byte before the raster
    w, h, maxval = fields
    return magic, w, h, maxval, i


def decode_image(data: bytes):
    """Real image decode for formats parsable without external libs ->
    (width, height, channels, pixels HxWxC uint8) or None if the payload is
    not PGM/PPM/uncompressed-BMP (JPEG/PNG need PIL — honestly stubbed)."""
    hdr = _parse_pnm_header(data)
    if hdr is not None:
        magic, w, h, _maxval, start = hdr
        ch = 1 if magic == "P5" else 3
        need = w * h * ch
        raster = np.frombuffer(data, dtype=np.uint8, count=need, offset=start)
        return w, h, ch, raster.reshape(h, w, ch)
    if data[:2] == b"BM" and len(data) >= 54:
        off, = struct.unpack_from("<I", data, 10)
        w, h_raw = struct.unpack_from("<ii", data, 18)
        bpp, = struct.unpack_from("<H", data, 28)
        comp, = struct.unpack_from("<I", data, 30)
        if comp != 0 or bpp not in (8, 24):
            return None
        h = abs(h_raw)
        ch = 1 if bpp == 8 else 3
        stride = (w * ch + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            data, dtype=np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
        if h_raw > 0:
            rows = rows[::-1]  # bottom-up storage
        if ch == 3:
            rows = rows[:, :, ::-1]  # BGR -> RGB
        return w, h, ch, np.ascontiguousarray(rows)
    return None


def encode_pnm(pixels: np.ndarray) -> bytes:
    """HxWx{1,3} uint8 -> PGM/PPM bytes (the re-encode side of resize)."""
    h, w, ch = pixels.shape
    magic = b"P5" if ch == 1 else b"P6"
    return magic + f" {w} {h} 255\n".encode() + pixels.tobytes()


def _resize_nearest(pixels: np.ndarray, max_side: int) -> np.ndarray:
    """Aspect-preserving nearest-neighbor downsample by index sampling —
    numpy-only, no interpolation lib."""
    h, w, _ = pixels.shape
    scale = min(1.0, max_side / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    yi = (np.arange(nh) * (h / nh)).astype(np.int64)
    xi = (np.arange(nw) * (w / nw)).astype(np.int64)
    return np.ascontiguousarray(pixels[yi][:, xi])


def decode_wav(data: bytes):
    """WAV metadata + samples via stdlib ``wave`` -> (n_channels,
    sample_rate, n_frames, samples int16 ndarray) or None if not RIFF/WAVE
    or not 16-bit PCM."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            if wf.getsampwidth() != 2:
                return None
            nch, rate, nfr = wf.getnchannels(), wf.getframerate(), wf.getnframes()
            samples = np.frombuffer(wf.readframes(nfr), dtype="<i2")
        return nch, rate, nfr, samples
    except wave.Error:
        return None


def extract_image_metadata(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Decode-and-measure over Arrow batches (mapInPandas).

    PGM/PPM/uncompressed-BMP payloads are REALLY decoded (dims from the
    header, mean_px from the raster). Other payloads fall back to the
    deterministic fake when allowed, else raise where PIL would be
    invoked — the batching, schema, and partition shape are identical
    either way."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                decoded = decode_image(data)
                if decoded is not None:
                    w, h, _ch, px = decoded
                    mean_px = float(px.mean())
                elif deterministic_fake:
                    w, h = _fake_decode_dims(data)
                    mean_px = None
                else:
                    raise NotImplementedError(
                        "compressed image decode (JPEG/PNG) requires PIL; "
                        "not available in this env"
                    )
                rows.append(
                    (int(mid), w, h, len(data), hashlib.sha1(data).hexdigest(), mean_px)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_bytes", "sha1", "mean_px"],
            )

    return media.select("media_id", "payload").mapInPandas(batches, IMAGE_META_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, max_side: int = 128, deterministic_fake: bool = True) -> DataFrame:
    """Aspect-preserving resize. PGM/PPM/BMP payloads get a REAL
    nearest-neighbor downsample (numpy index sampling) re-encoded as PNM;
    other payloads keep fake dims + passthrough payload (a PIL impl would
    re-encode the same way)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                decoded = decode_image(data)
                if decoded is not None:
                    _w, _h, _ch, px = decoded
                    small = _resize_nearest(px, max_side)
                    nh, nw, _ = small.shape
                    rows.append((int(mid), nw, nh, encode_pnm(small)))
                elif deterministic_fake:
                    w, h = _fake_decode_dims(data)
                    scale = min(1.0, max_side / max(w, h))
                    rows.append((int(mid), int(w * scale), int(h * scale), data))
                else:
                    raise NotImplementedError("compressed-image resize requires PIL")
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "payload"])

    return media.select("media_id", "payload").mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha1", T.StringType()),
    ]
)


def iter_pnm_frames(data: bytes):
    """Split a concatenated-PNM stream (``ffmpeg -f image2pipe`` wire
    format) into per-frame byte slices — a REAL frame demuxer for the one
    video container parsable without ffmpeg."""
    pos = 0
    while True:
        hdr = _parse_pnm_header(data, pos)
        if hdr is None:
            return
        magic, w, h, _maxval, start = hdr
        end = start + w * h * (1 if magic == "P5" else 3)
        if end > len(data):
            return
        yield data[pos:end]
        pos = end


def sample_video_frames(media: DataFrame, every_n: int = 10, deterministic_fake: bool = True) -> DataFrame:
    """Every-Nth-frame sampling (1:N fan-out through mapInPandas — the real
    shape of video pipelines). Concatenated-PNM payloads are REALLY
    demuxed; other containers fall back to the deterministic fake (mp4 et
    al. need ffmpeg)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                frames = list(iter_pnm_frames(data)) if data[:2] in (b"P5", b"P6") else None
                if frames:
                    for i in range(0, len(frames), every_n):
                        rows.append(
                            (int(mid), i, hashlib.sha1(frames[i]).hexdigest())
                        )
                elif deterministic_fake:
                    n_frames = 1 + len(data) % 50
                    for i in range(0, n_frames, every_n):
                        fh = hashlib.sha1(data + i.to_bytes(4, "big")).hexdigest()
                        rows.append((int(mid), i, fh))
                else:
                    raise NotImplementedError("compressed-video demux requires ffmpeg")
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha1"])

    return media.select("media_id", "payload").mapInPandas(batches, FRAME_SCHEMA)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def extract_audio_metadata(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Audio feature extraction: WAV (16-bit PCM) payloads are REALLY
    parsed via stdlib ``wave`` + numpy (channels/rate/frames/RMS); other
    formats fall back to hash-derived fake metadata or raise."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                decoded = decode_wav(data)
                if decoded is not None:
                    nch, rate, nfr, samples = decoded
                    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if len(samples) else 0.0
                    rows.append((int(mid), nch, rate, nfr, nfr / rate if rate else 0.0, rms))
                elif deterministic_fake:
                    h = hashlib.sha1(data).digest()
                    rate = 8000 * (1 + h[2] % 6)
                    nfr = len(data)
                    rows.append((int(mid), 1 + h[3] % 2, rate, nfr, nfr / rate, None))
                else:
                    raise NotImplementedError("compressed-audio decode requires ffmpeg")
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_channels", "sample_rate", "n_frames", "duration_s", "rms"],
            )

    return media.select("media_id", "payload").mapInPandas(batches, AUDIO_META_SCHEMA)
