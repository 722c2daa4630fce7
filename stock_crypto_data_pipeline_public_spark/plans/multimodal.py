"""Multimodal feature-extraction queries (rows-only checks — mapInPandas
pseudo-decode is not SQL-expressible; the md5 checksum column IS
SQL-checkable and gets its own oracle-backed query)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as M
from ..sources.tables import load_table
from .registry import query


# --------------------------------------------------------------------------
# m01 — binary payload → Arrow-batched feature extraction (mapInPandas) →
# per-media-type feature rollup. No oracle: the decode stub is Python-side.
# --------------------------------------------------------------------------
@query("m01_media_feature_rollup")
def m01_media_feature_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # single-file input = one scan task; spread BEFORE the Python stage so
    # the Arrow-batched decode runs on every core, not one
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    media = M.attach_media(docs)
    feats = M.decode_features(media, fake=True)
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("width").alias("min_width"),
        F.max("height").alias("max_height"),
        F.countDistinct("checksum").alias("n_distinct_payloads"),
    )


# --------------------------------------------------------------------------
# m02 — the SQL-checkable slice of the media path: payload byte length +
# md5 checksum computed JVM-side over the binary column.
# --------------------------------------------------------------------------
@query(
    "m02_media_checksums",
    oracle="""
    SELECT doc_id,
           strlen(text) AS n_bytes,
           md5(text)    AS checksum
    FROM documents
    """,
)
def m02_media_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = M.attach_media(docs)
    return media.select(
        "doc_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.md5("media").alias("checksum"),
    )


# --------------------------------------------------------------------------
# m03 — video frame sampling → per-frame-index rollup: the row-EXPANDING
# multimodal shape (n_frames output rows per input, Arrow-batched). Rows-
# only check like m01 (the chunking stub is Python-side); the plumbing —
# schema, batch shape, output partition sizing — is the real contract.
# --------------------------------------------------------------------------
@query("m03_frame_sample_rollup")
def m03_frame_sample_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = M.attach_media(docs, media_type="video/mp4")
    frames = M.sample_frames(media, n_frames=4, fake=True)
    return frames.groupBy("frame_idx").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("frame")).alias("total_bytes"),
        F.countDistinct("doc_id").alias("n_videos"),
        F.min("frame_ts_ms").alias("min_ts_ms"),
        F.max("frame_ts_ms").alias("max_ts_ms"),
    )
