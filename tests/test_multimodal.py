"""Multimodal plumbing tests: binary columns through Arrow-batched
decode / resize / frame-sample stages (operators/multimodal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from stock_crypto_data_pipeline_public_spark.operators import multimodal as M
from stock_crypto_data_pipeline_public_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return M.attach_media(load_table(spark, sf_dir, "documents").limit(50)).cache()


def test_decode_features_deterministic(spark, media):
    f1 = {r.doc_id: r for r in M.decode_features(media, fake=True).collect()}
    f2 = {r.doc_id: r for r in M.decode_features(media, fake=True).collect()}
    assert f1.keys() == f2.keys() and len(f1) == 50
    some = next(iter(f1))
    assert f1[some].checksum == f2[some].checksum
    assert 64 <= f1[some].width <= 255 and f1[some].sample_rate >= 8000


def test_real_decode_is_clearly_stubbed(media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        M.decode_features(media, fake=False).collect()


def test_resize_updates_payload_and_dims(media):
    out = M.resize_images(media, 128, 96, fake=True)
    rows = out.collect()
    assert len(rows) == 50
    target = 128 * 96 // 64
    assert all(len(r.media) == target and r.width == 128 and r.height == 96 for r in rows)
    # deterministic rendition
    again = {r.doc_id: bytes(r.media) for r in M.resize_images(media, 128, 96, fake=True).collect()}
    assert all(bytes(r.media) == again[r.doc_id] for r in rows)


def test_sample_frames_explodes_rows(media):
    frames = M.sample_frames(media, n_frames=4, fake=True)
    assert frames.count() == 50 * 4
    per_doc = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("frame_idx").alias("d")
    )
    assert per_doc.filter((F.col("n") != 4) | (F.col("d") != 4)).count() == 0
    # frame timestamps ascend within a doc
    one = frames.filter(F.col("doc_id") == frames.first().doc_id).orderBy("frame_idx").collect()
    ts = [r.frame_ts_ms for r in one]
    assert ts == sorted(ts)
