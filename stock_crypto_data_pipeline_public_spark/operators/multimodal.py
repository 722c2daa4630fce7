"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design per the north star: image/audio/video travel as ``binary`` columns
with typed metadata alongside; decode / feature-extraction runs as
Arrow-batched pandas transforms via ``mapInPandas`` (the only place Python
touches the data — everything else stays JVM-side).

The actual media *decode* is STUBBED: the container has no image/audio
libraries, so :func:`decode_features` raises ``NotImplementedError`` unless
``fake=True``, which derives deterministic pseudo-features (dimensions,
sample-rate) from the payload bytes. The Spark-side plumbing — schema,
binary handling, Arrow batch iteration, partition-preserving mapInPandas —
is real and tested.

Scale notes: binary payloads dominate row size; at 100 TB the media table
partitions by (media_type, date) and feature extraction is a map-only stage
(no shuffle) whose output is a narrow feature table — join features back by
id instead of carrying payloads through analytic plans.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the feature extractor (mapInPandas contract)
FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, width int, height int, "
    "sample_rate int, checksum string"
)


def attach_media(docs: DataFrame, media_type: str = "image/png") -> DataFrame:
    """Simulate a media table: utf-8 payload bytes + typed metadata columns.

    In production this is the parquet/iceberg table the ingestion wrote;
    the binary column is opaque to the engine either way.
    """
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
    )


def _fake_decode(media: bytes) -> tuple[int, int, int]:
    """Deterministic pseudo-decode: width/height/sample_rate from the
    payload digest. Placeholder for a real PIL/libav decode."""
    d = hashlib.md5(media).digest()
    width = 64 + d[0] % 192          # 64..255
    height = 64 + d[1] % 192
    sample_rate = 8000 + (d[2] % 5) * 8000
    return width, height, sample_rate


def decode_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``fake=False`` raises NotImplementedError inside the batch fn (no media
    libs in this environment) — the plumbing is exercised with fake=True.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/libav (not in container); "
                    "run with fake=True for deterministic pseudo-features"
                )
            # one digest per payload serves decode AND checksum
            digests = pdf["media"].map(lambda b: hashlib.md5(b))
            raw = digests.map(lambda d: d.digest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["media"].map(len).astype("int32"),
                    "width": raw.map(lambda d: 64 + d[0] % 192).astype("int32"),
                    "height": raw.map(lambda d: 64 + d[1] % 192).astype("int32"),
                    "sample_rate": raw.map(lambda d: 8000 + (d[2] % 5) * 8000).astype(
                        "int32"
                    ),
                    "checksum": digests.map(lambda d: d.hexdigest()),
                }
            )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


#: resize output: payload replaced by the resized rendition + new dims
RESIZE_SCHEMA = (
    "doc_id long, media_type string, media binary, width int, height int"
)


def resize_images(df: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Arrow-batched image resize: binary in → binary out, metadata updated.

    Map-only (no shuffle); output rows are smaller than input, so at scale
    this stage also repacks storage (write the rendition table partitioned
    like the source). ``fake=True`` emits a deterministic pseudo-rendition
    (digest-seeded bytes of size width*height//64) in place of a PIL resize.
    """

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = max(1, width * height // 64)
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL (not in container); "
                    "run with fake=True for deterministic pseudo-renditions"
                )
            def render(b: bytes) -> bytes:
                seed = hashlib.md5(b).digest()
                reps = target // len(seed) + 1
                return (seed * reps)[:target]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "media": pdf["media"].map(render),
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(shrink, schema=RESIZE_SCHEMA)


#: frame sampling: ONE video row explodes into MANY frame rows
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_ts_ms long, frame binary"


def sample_frames(df: DataFrame, n_frames: int = 4, fps: int = 30, fake: bool = False) -> DataFrame:
    """Video → evenly-spaced frame rows (the row-expanding multimodal shape).

    The output multiplies row count by ``n_frames`` — at scale, size input
    partitions so the *output* fits executor memory (maxPartitionBytes ÷
    n_frames), and write frames partitioned by (doc date, frame bucket).
    ``fake=True`` slices the payload into n_frames deterministic chunks in
    place of a libav keyframe decode.
    """

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires libav/ffmpeg (not in "
                    "container); run with fake=True for deterministic chunks"
                )
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                step = max(1, len(media) // n_frames)
                for i in range(n_frames):
                    chunk = media[i * step : (i + 1) * step] or media[-step:]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(int(i * (1000 / fps) * (len(media) // step or 1)))
                    out["frame"].append(chunk)
            yield pd.DataFrame(out)

    return df.mapInPandas(split, schema=FRAME_SCHEMA)
