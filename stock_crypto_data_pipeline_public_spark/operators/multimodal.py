"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design per the north star: image/audio/video travel as ``binary`` columns
with typed metadata alongside; decode / feature-extraction runs as
Arrow-batched pandas transforms via ``mapInPandas`` (the only place Python
touches the data — everything else stays JVM-side).

Codec-dependent decodes (PNG/JPEG via PIL, MP4 via libav) are STUBBED: the
container has no media libraries, so :func:`decode_features` raises
``NotImplementedError`` for those types unless ``fake=True``, which derives
deterministic pseudo-features (dimensions, sample-rate) from the payload
bytes. Two formats go through the REAL path with no external dependency:

- ``audio/wav`` — parsed with the stdlib ``wave`` module (RIFF header:
  frame rate, channel count, frame count)
- ``image/x-portable-pixmap`` — the PPM P6 header is parsed directly
  (width/height), and :func:`resize_images` does a REAL nearest-neighbor
  resample of the pixel plane in numpy

The Spark-side plumbing — schema, binary handling, Arrow batch iteration,
partition-preserving mapInPandas — is identical for real and fake paths.

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

#: output schema of the feature extractor (mapInPandas contract); the
#: audio fields (n_channels/n_samples/duration_ms) are null for images and
#: width/height null for audio — one narrow feature table for every modality
FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, width int, height int, "
    "sample_rate int, n_channels int, n_samples long, duration_ms long, "
    "checksum string"
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


def _decode_wav(b: bytes) -> dict:
    """REAL audio decode: stdlib ``wave`` parses the RIFF/PCM header."""
    import io
    import wave

    with wave.open(io.BytesIO(b)) as w:
        sr = w.getframerate()
        nc = w.getnchannels()
        ns = w.getnframes()
    return {
        "width": None,
        "height": None,
        "sample_rate": sr,
        "n_channels": nc,
        "n_samples": ns,
        "duration_ms": ns * 1000 // sr if sr else 0,
    }


def _decode_ppm(b: bytes) -> dict:
    """REAL image decode: parse the PPM P6 header (magic, width, height,
    maxval — whitespace-separated ASCII, '#' comments allowed)."""
    fields = _ppm_header_fields(b)
    w, h = int(fields[1]), int(fields[2])
    return {
        "width": w,
        "height": h,
        "sample_rate": None,
        "n_channels": 3,
        "n_samples": None,
        "duration_ms": None,
    }


def _ppm_header_fields(b: bytes) -> list[bytes]:
    """(magic, width, height, maxval) tokens of a P6 header; raises
    ValueError on anything that is not a PPM."""
    return _ppm_header(b)[0]


def _ppm_header(b: bytes) -> tuple[list[bytes], int]:
    """((magic, width, height, maxval), pixel_offset) of a P6 header. The
    offset is tracked DURING tokenization — re-finding field bytes with
    index() would mislocate the plane when a '#' comment contains a field's
    digits (e.g. '# 16' before width 16)."""
    fields: list[bytes] = []
    i = 0
    while len(fields) < 4:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i : i + 1] == b"#":  # comment to end of line
            while i < len(b) and b[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(b) and not b[i : i + 1].isspace():
            i += 1
        if start == i:
            raise ValueError("truncated PPM header")
        fields.append(b[start:i])
    if fields[0] != b"P6":
        raise ValueError(f"not a P6 PPM: magic={fields[0]!r}")
    # the pixel plane starts exactly one whitespace byte after maxval
    return fields, i + 1


def _ppm_pixel_offset(b: bytes) -> int:
    """Byte offset of the binary pixel plane: one whitespace after maxval."""
    return _ppm_header(b)[1]


def _decode_bmp(b: bytes) -> dict:
    """REAL image decode: parse the BMP file header + BITMAPINFOHEADER
    with stdlib ``struct`` (uncompressed BMP is pure fixed-offset fields —
    no codec). Height may be negative (top-down row order); the dimension
    is its magnitude."""
    import struct

    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError(f"not a BMP: magic={b[:2]!r}")
    dib_size = struct.unpack_from("<I", b, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    width, height = struct.unpack_from("<ii", b, 18)
    bitcount = struct.unpack_from("<H", b, 28)[0]
    return {
        "width": width,
        "height": abs(height),
        "sample_rate": None,
        "n_channels": bitcount // 8,
        "n_samples": None,
        "duration_ms": None,
    }


def decode_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``audio/wav`` and ``image/x-portable-pixmap`` payloads are decoded for
    REAL (stdlib wave / direct P6 header parse). Codec-dependent types
    (PNG/JPEG/MP4) raise NotImplementedError unless ``fake=True``, which
    substitutes deterministic digest-derived pseudo-features.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "doc_id", "media_type", "n_bytes", "width", "height",
                "sample_rate", "n_channels", "n_samples", "duration_ms",
                "checksum",
            )}
            for doc_id, mt, b in zip(pdf["doc_id"], pdf["media_type"], pdf["media"]):
                if mt == "audio/wav":
                    feat = _decode_wav(b)
                elif mt == "image/x-portable-pixmap":
                    feat = _decode_ppm(b)
                elif mt == "image/bmp":
                    feat = _decode_bmp(b)
                elif fake:
                    d = hashlib.md5(b).digest()
                    feat = {
                        "width": 64 + d[0] % 192,
                        "height": 64 + d[1] % 192,
                        "sample_rate": 8000 + (d[2] % 5) * 8000,
                        "n_channels": None,
                        "n_samples": None,
                        "duration_ms": None,
                    }
                else:
                    raise NotImplementedError(
                        f"real decode of {mt!r} requires PIL/libav (not in "
                        "container); only audio/wav, image/x-portable-"
                        "pixmap and image/bmp decode for real — run with "
                        "fake=True for deterministic pseudo-features"
                    )
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mt)
                rows["n_bytes"].append(len(b))
                rows["checksum"].append(hashlib.md5(b).hexdigest())
                for k, v in feat.items():
                    rows[k].append(v)
            pdf_out = pd.DataFrame(rows)
            for c, t in (
                ("n_bytes", "int32"), ("width", "Int32"), ("height", "Int32"),
                ("sample_rate", "Int32"), ("n_channels", "Int32"),
                ("n_samples", "Int64"), ("duration_ms", "Int64"),
            ):
                pdf_out[c] = pdf_out[c].astype(t)
            yield pdf_out

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


#: synthesized media table schema (same shape attach_media produces)
MEDIA_SCHEMA = "doc_id long, media binary, media_type string, n_bytes int"


def synthesize_wav(docs: DataFrame) -> DataFrame:
    """Deterministic REAL WAV clips, one per document: PCM-16 silence with
    sample rate / channels / frame count derived from (doc_id, text length)
    — every header field is a closed-form function of the source row, so a
    SQL oracle can predict what the real decode must report.

    sr = 8000 + (doc_id % 5)·4000; channels = 1 + doc_id % 2;
    frames = 100 + (len(text) % 400). The stdlib ``wave`` writer emits the
    standard 44-byte PCM header, so n_bytes = 44 + frames·channels·2.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "media": [], "media_type": [], "n_bytes": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                sr = int(8000 + (doc_id % 5) * 4000)
                nc = int(1 + doc_id % 2)
                ns = int(100 + (len(text or "") % 400))
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(nc)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    w.writeframes(b"\x00" * (ns * nc * 2))
                b = buf.getvalue()
                out["doc_id"].append(doc_id)
                out["media"].append(b)
                out["media_type"].append("audio/wav")
                out["n_bytes"].append(len(b))
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def synthesize_ppm(docs: DataFrame) -> DataFrame:
    """Deterministic REAL P6 PPM images, one per document:
    width = 8 + doc_id % 32, height = 8 + (len(text) % 32), pixel (x,y,c)
    = (x + 2y + 3c + doc_id) % 256 — closed-form, so header size and the
    decoded dimensions are SQL-predictable."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "media": [], "media_type": [], "n_bytes": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w = int(8 + doc_id % 32)
                h = int(8 + (len(text or "") % 32))
                x = np.arange(w)[None, :, None]
                y = np.arange(h)[:, None, None]
                c = np.arange(3)[None, None, :]
                px = ((x + 2 * y + 3 * c + int(doc_id)) % 256).astype(np.uint8)
                b = b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()
                out["doc_id"].append(doc_id)
                out["media"].append(b)
                out["media_type"].append("image/x-portable-pixmap")
                out["n_bytes"].append(len(b))
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def synthesize_bmp(docs: DataFrame) -> DataFrame:
    """Deterministic REAL 24-bit BMPs, one per document: width = 4 +
    doc_id % 16, height = 4 + (len(text) % 16); rows pad to 4-byte
    boundaries per the format, so n_bytes = 54 + ((3w + 3) // 4 · 4) · h —
    closed-form, SQL-predictable, and exercising a decode path (fixed-
    offset little-endian struct fields) that WAV/PPM do not."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "media": [], "media_type": [], "n_bytes": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w = int(4 + doc_id % 16)
                h = int(4 + (len(text or "") % 16))
                row = (3 * w + 3) // 4 * 4
                img = row * h
                head = struct.pack("<2sIHHI", b"BM", 54 + img, 0, 0, 54)
                dib = struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img, 2835, 2835, 0, 0
                )
                px = bytes(
                    (x + 2 * y + int(doc_id)) % 256
                    for y in range(h)
                    for x in range(row)
                )
                b = head + dib + px
                out["doc_id"].append(doc_id)
                out["media"].append(b)
                out["media_type"].append("image/bmp")
                out["n_bytes"].append(len(b))
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


#: resize output: payload replaced by the resized rendition + new dims
RESIZE_SCHEMA = (
    "doc_id long, media_type string, media binary, width int, height int"
)


def _resize_ppm(b: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resample of a P6 pixel plane (numpy)."""
    import numpy as np

    fields = _ppm_header_fields(b)
    w, h = int(fields[1]), int(fields[2])
    off = _ppm_pixel_offset(b)
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=off).reshape(h, w, 3)
    yi = np.arange(height) * h // height
    xi = np.arange(width) * w // width
    out = px[yi][:, xi]
    return b"P6\n%d %d\n255\n" % (width, height) + out.tobytes()


def resize_images(df: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Arrow-batched image resize: binary in → binary out, metadata updated.

    Map-only (no shuffle); output rows are smaller than input, so at scale
    this stage also repacks storage (write the rendition table partitioned
    like the source). ``image/x-portable-pixmap`` payloads get a REAL
    nearest-neighbor resample; other formats need PIL, so they raise unless
    ``fake=True`` (deterministic digest-seeded pseudo-rendition of size
    width*height//64).
    """

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = max(1, width * height // 64)

        def render_fake(b: bytes) -> bytes:
            seed = hashlib.md5(b).digest()
            reps = target // len(seed) + 1
            return (seed * reps)[:target]

        for pdf in batches:
            media = []
            for mt, b in zip(pdf["media_type"], pdf["media"]):
                if mt == "image/x-portable-pixmap":
                    media.append(_resize_ppm(b, width, height))
                elif fake:
                    media.append(render_fake(b))
                else:
                    raise NotImplementedError(
                        f"real resize of {mt!r} requires PIL (not in "
                        "container); only image/x-portable-pixmap resizes "
                        "for real — run with fake=True for pseudo-renditions"
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "media": media,
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
