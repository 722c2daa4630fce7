"""Glyph-raster OCR operator (operators/ocr.py): font integrity, local
roundtrips through the real PNG codec, honest failure on non-raster
images, and the distributed render->OCR pipeline."""

from __future__ import annotations

import pytest

from stock_crypto_data_pipeline_public_spark.operators import ocr
from stock_crypto_data_pipeline_public_spark.operators.multimodal import _encode_png


def test_font_glyphs_pairwise_distinct_and_complete():
    vals = list(ocr.FONT_5X7.values())
    assert len(set(vals)) == len(vals), "two glyphs share a bitmap"
    assert set(ocr.FONT_5X7) == set(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 "
    )
    # every glyph fits the 5-bit cell
    assert all(0 <= r < 32 for rows in vals for r in rows)


@pytest.mark.parametrize(
    "text",
    [
        "HELLO WORLD 123",
        "",
        "mixed Case & punct!?",
        "x" * 200,  # truncation
        "   leading and trailing   ",
    ],
)
def test_png_roundtrip_exact(text):
    n = ocr.normalize_for_raster(text, 48)
    assert len(n) == 48
    png = _encode_png(ocr._render_raster(n))
    assert ocr.ocr_png_bytes(png) == n


def test_non_raster_png_raises_not_fabricates():
    import numpy as np

    # a real PNG that is NOT a glyph raster (wrong geometry)
    photo = _encode_png(np.full((16, 16, 3), 7, dtype=np.uint8))
    with pytest.raises(ValueError, match="glyph raster"):
        ocr.ocr_png_bytes(photo)
    # right geometry, junk pixels -> unrecognized cell, still honest
    junk = np.zeros((ocr.GLYPH_H, ocr.CELL_W, 3), dtype=np.uint8)
    junk[:, :, :] = 255
    with pytest.raises(ValueError, match="unrecognized glyph"):
        ocr.ocr_png_bytes(_encode_png(junk))


def test_normalization_matches_duckdb_rpad_chain():
    """The Python normalization must equal the m19 oracle's SQL chain
    char-for-char (incl. the ß->SS trap: filtering BEFORE uppercasing
    keeps both engines in pure ASCII)."""
    import duckdb

    con = duckdb.connect()
    for t in [None, "", "Hello, W0rld! ", "çafé ß 123", "tab\tnl\nmix", "ümlaut"]:
        sql = con.execute(
            "SELECT rpad(upper(substr(regexp_replace(coalesce(?,''),"
            " '[^A-Za-z0-9 ]', ' ', 'g'), 1, 48)), 48, ' ')",
            [t],
        ).fetchone()[0]
        assert sql == ocr.normalize_for_raster(t, 48), t


def test_jpeg_roundtrip_exact_through_lossy_codec():
    """Block-rendered glyphs survive the full T.81 encode/decode
    BIT-exactly (jpegcodec's evenness contract), so jpg OCR is exact."""
    import numpy as np

    from stock_crypto_data_pipeline_public_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    n = ocr.normalize_for_raster("Lossy? Not here 99", 24)
    gray = ocr._render_raster(n)[:, :, 0]
    even = np.where(gray > 0, 254, 0).astype(np.uint8)
    big = np.kron(even, np.ones((8, 8), np.uint8))
    payload = encode_jpeg(big)
    # bit-exact decode is the foundation the OCR stands on — assert it
    assert (decode_jpeg(payload)["raster"] == big).all()
    assert ocr.ocr_jpeg_bytes(payload) == n


def test_jpeg_non_raster_raises():
    import numpy as np

    from stock_crypto_data_pipeline_public_spark.operators.jpegcodec import encode_jpeg

    photo = encode_jpeg(np.full((32, 32), 100, dtype=np.uint8))
    with pytest.raises(ValueError, match="glyph raster"):
        ocr.ocr_jpeg_bytes(photo)


def test_distributed_render_then_ocr(spark):
    rows = [(1, "Alpha one"), (2, None), (3, "B" * 90), (4, "42!")]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(3)
    for render, n in ((ocr.render_text_png, 24), (ocr.render_text_jpeg, 12)):
        imgs = render(docs, n_chars=n)
        got = {r.doc_id: r.text for r in ocr.ocr_images(imgs).collect()}
        assert got == {
            doc_id: ocr.normalize_for_raster(text, n) for doc_id, text in rows
        }

def test_gap_column_ink_raises():
    """ADVICE r7: an image with valid glyph columns but ink in the
    inter-glyph gap column must raise, not be 'recognized'."""
    import numpy as np

    n = ocr.normalize_for_raster("OK", 2)
    px = ocr._render_raster(n)
    px[:, ocr.GLYPH_W, :] = 255  # light the first cell's gap column
    with pytest.raises(ValueError, match="gap"):
        ocr.ocr_png_bytes(_encode_png(px))


def test_unsupported_media_type_raises_explicitly(spark):
    """ADVICE r7: ocr_images dispatches on media_type explicitly — a GIF
    gets an 'unsupported media_type' error, not a wrong-codec decode
    failure."""
    rows = [(1, b"GIF89a...", "image/gif")]
    df = spark.createDataFrame(
        rows, "doc_id long, media binary, media_type string"
    )
    with pytest.raises(Exception, match="unsupported media_type"):
        ocr.ocr_images(df).collect()


def test_jpeg_non_constant_blocks_raise():
    """ADVICE r7 follow-through: a JPEG with glyph-shaped top-left block
    samples but non-constant interiors is not a rendered raster — the
    block-constancy check must raise instead of recognizing it."""
    import numpy as np

    from stock_crypto_data_pipeline_public_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    n = ocr.normalize_for_raster("OK", 2)
    gray = ocr._render_raster(n)[:, :, 0]
    even = np.where(gray > 0, 254, 0).astype(np.uint8)
    big = np.kron(even, np.ones((8, 8), np.uint8))
    # perturb one block interior with a large, quantization-surviving
    # checkerboard (single-pixel deltas die in the quantizer); keep the
    # top-left sample untouched so the downsample still looks glyph-like
    big = big.astype(np.int32)
    big[1:8, 1:8] += np.indices((7, 7)).sum(0) % 2 * 200 - 100
    big = np.clip(big, 0, 255).astype(np.uint8)
    payload = encode_jpeg(big)
    decoded = decode_jpeg(payload)["raster"]
    down = decoded[::8, ::8]
    # precondition: the decode must NOT be block-constant, or the test
    # proves nothing (lossy smoothing could flatten the perturbation)
    assert (decoded != np.kron(down, np.ones((8, 8), np.uint8))).any()
    with pytest.raises(ValueError, match="non-constant 8x8 blocks|unrecognized|gap"):
        ocr.ocr_jpeg_bytes(payload)
