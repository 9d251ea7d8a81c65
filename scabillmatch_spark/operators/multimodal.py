"""Multimodal column plumbing (north-star extension).

Images/audio/video ride as opaque ``binary`` columns with a typed metadata
struct. The Spark-side machinery — schemas, Arrow batching via mapInPandas,
partition sizing — is real and tested; the actual codec calls are STUBBED
(this environment has no image/audio libraries): ``deterministic_fake=True``
derives plausible metadata from the content hash, ``False`` raises
NotImplementedError where PIL/ffmpeg would be invoked.

Scale notes: binary payloads dominate row size — operators use mapInPandas
(streaming Arrow batches, no full-partition materialization) and never
shuffle the binary column unless the caller asks (metadata-only projections
drop it first).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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


def extract_image_metadata(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Decode-and-measure over Arrow batches (mapInPandas).

    Real deployments replace ``_fake_decode_dims`` with PIL.Image.open —
    the batching, schema, and partition shape stay identical."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real image decode requires PIL; not available in this env"
                )
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                w, h = _fake_decode_dims(data)
                rows.append(
                    (int(mid), w, h, len(data), hashlib.sha1(data).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "sha1"]
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
    """Resize stub: recomputes target dims (aspect-preserving); payload
    passthrough in fake mode (a real impl re-encodes)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not deterministic_fake:
                raise NotImplementedError("real resize requires PIL")
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                w, h = _fake_decode_dims(data)
                scale = min(1.0, max_side / max(w, h))
                rows.append((int(mid), int(w * scale), int(h * scale), data))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "payload"])

    return media.select("media_id", "payload").mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha1", T.StringType()),
    ]
)


def sample_video_frames(media: DataFrame, every_n: int = 10, deterministic_fake: bool = True) -> DataFrame:
    """Frame-sampling stub: emits one row per sampled frame (1:N fan-out
    through mapInPandas — the real shape of video pipelines)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not deterministic_fake:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = 1 + len(data) % 50
                for i in range(0, n_frames, every_n):
                    fh = hashlib.sha1(data + i.to_bytes(4, "big")).hexdigest()
                    rows.append((int(mid), i, fh))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha1"])

    return media.select("media_id", "payload").mapInPandas(batches, FRAME_SCHEMA)
