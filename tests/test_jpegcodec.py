"""Baseline JPEG codec tests (operators/jpegcodec.py): the T.81 pipeline
— DCT, Annex-K quantization, zigzag, DC-differential + AC run-length
Huffman coding — round-trips through real entropy-coded bytes, and every
out-of-scope input (progressive, color, truncated) fails loudly.

The exactness contract the multimodal oracles lean on is tested as a
property here: a raster of 8x8-block-constant EVEN values decodes
BIT-EXACTLY (only the DC coefficient is nonzero and the Annex-K DC step
16 divides 8*(v-128) when v is even), while arbitrary rasters decode with
bounded error — JPEG is lossy, and the tests respect that.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from stock_crypto_data_pipeline_public_spark.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
)


def _block_raster(blocks: np.ndarray) -> np.ndarray:
    """Expand an (BH, BW) block-value grid to the (8*BH, 8*BW) raster."""
    return np.kron(blocks.astype(np.uint8), np.ones((8, 8), dtype=np.uint8))


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 6),
    st.integers(1, 6),
    st.integers(0, 10**9),
)
def test_block_constant_even_rasters_roundtrip_exactly(bw, bh, seed):
    """The oracle contract: ANY grid of even block values is lossless."""
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 128, size=(bh, bw), dtype=np.uint8) * 2
    raster = _block_raster(blocks)
    decoded = decode_jpeg(encode_jpeg(raster))
    assert decoded["width"] == 8 * bw and decoded["height"] == 8 * bh
    assert np.array_equal(decoded["raster"], raster)


def test_byte_stuffing_survives_ff_heavy_scans():
    """A scan dominated by large coefficients emits 0xFF bytes that must
    be stuffed (FF 00) on write and un-stuffed on read; a checkerboard of
    extreme even values maximizes entropy-coded density."""
    blocks = np.zeros((5, 7), dtype=np.uint8)
    blocks[::2, ::2] = 254
    blocks[1::2, 1::2] = 2
    raster = _block_raster(blocks)
    decoded = decode_jpeg(encode_jpeg(raster))
    assert np.array_equal(decoded["raster"], raster)


def test_arbitrary_raster_lossy_but_bounded():
    """Random noise is JPEG's worst case: decode must still reproduce
    dims exactly and pixels within the quantizer's energy budget."""
    rng = np.random.default_rng(7)
    raster = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    decoded = decode_jpeg(encode_jpeg(raster))
    assert decoded["raster"].shape == (37, 53)
    err = np.abs(decoded["raster"].astype(int) - raster.astype(int))
    assert err.mean() < 32  # Annex-K tables on noise: heavy but bounded

    # smooth content (the realistic case) stays within a few levels
    grad = np.clip(
        np.rint(np.linspace(0, 255, 64))[None, :] * np.ones((48, 1)), 0, 255
    ).astype(np.uint8)
    gerr = np.abs(
        decode_jpeg(encode_jpeg(grad))["raster"].astype(int) - grad.astype(int)
    )
    assert gerr.max() <= 8


def test_non_multiple_of_8_dims_pad_and_crop():
    """Encoder pads by edge replication; decoder crops back to SOF dims.
    A block-constant raster whose visible part is even-valued stays exact
    because replication keeps the padded blocks constant too."""
    raster = _block_raster(np.array([[10, 40], [100, 200]]))[:11, :13]
    decoded = decode_jpeg(encode_jpeg(raster))
    assert decoded["width"] == 13 and decoded["height"] == 11
    assert np.array_equal(decoded["raster"], raster)


def test_dc_differential_chains_across_blocks():
    """DC coding is differential: a long strictly-increasing block run
    exercises every positive diff size category; the reverse run the
    negative ones."""
    up = np.arange(0, 128, 2, dtype=np.uint8).reshape(1, 64) * 2
    for blocks in (up, up[:, ::-1]):
        raster = _block_raster(blocks)
        assert np.array_equal(decode_jpeg(encode_jpeg(raster))["raster"], raster)


def test_rejects_progressive_and_color_and_truncation():
    raster = _block_raster(np.array([[60]]))
    b = bytearray(encode_jpeg(raster))

    # flip SOF0 (FFC0) to progressive SOF2 (FFC2)
    i = bytes(b).index(b"\xff\xc0")
    prog = bytes(b[:i]) + b"\xff\xc2" + bytes(b[i + 2 :])
    with pytest.raises(ValueError, match="not baseline"):
        decode_jpeg(prog)

    # forge a 3-component SOF payload
    j = i + 4  # payload start (marker + length)
    forged = bytearray(b)
    forged[j + 5] = 3
    with pytest.raises(ValueError, match="unsupported"):
        decode_jpeg(bytes(forged))

    # truncated entropy data
    with pytest.raises(ValueError):
        decode_jpeg(bytes(b[:-8]))

    # not a JPEG at all
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_decompression_guard_on_forged_dims():
    """A tiny file claiming a giant raster must be refused before any
    allocation proportional to the claim."""
    b = bytearray(encode_jpeg(_block_raster(np.array([[60]]))))
    i = bytes(b).index(b"\xff\xc0")
    struct.pack_into(">HH", b, i + 5, 0xFFFF, 0xFFFF)
    with pytest.raises(ValueError, match="guard"):
        decode_jpeg(bytes(b))


def test_encoder_rejects_bad_shapes():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 8), dtype=np.uint8))


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_entropy_layer_is_exactly_lossless(h, w, seed):
    """JPEG's only loss is quantization: the entropy layer (RLE/ZRL/EOB,
    DC differential chains, Huffman, byte stuffing — and the LUT fast
    decoder) must be an EXACT inverse. For arbitrary rasters, the decoded
    image must equal the pure-numpy reference quantize->dequantize->IDCT
    path byte-for-byte, computed with the codec's own matrices and the
    SAME einsum evaluation order."""
    from stock_crypto_data_pipeline_public_spark.operators.jpegcodec import (
        QUANT_LUM,
        _DCT,
    )

    rng = np.random.default_rng(seed)
    raster = rng.integers(0, 256, size=(h, w), dtype=np.uint8)

    px = raster
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        px = np.pad(px, ((0, ph), (0, pw)), mode="edge")
    bh8, bw8 = px.shape[0] // 8, px.shape[1] // 8
    blocks = (px.astype(np.float64) - 128.0).reshape(bh8, 8, bw8, 8).transpose(0, 2, 1, 3)
    coeff = np.einsum("ij,byjk,lk->byil", _DCT, blocks, _DCT, optimize=True)
    q = np.rint(coeff / QUANT_LUM).astype(np.int64)
    deq = (q * QUANT_LUM).reshape(-1, 8, 8).astype(np.float64)
    idct = np.einsum("ji,bjk,kl->bil", _DCT, deq, _DCT, optimize=True) + 128.0
    ref = np.clip(np.rint(idct), 0, 255).astype(np.uint8)
    ref = (
        ref.reshape(bh8, bw8, 8, 8).transpose(0, 2, 1, 3)
        .reshape(bh8 * 8, bw8 * 8)[:h, :w]
    )

    decoded = decode_jpeg(encode_jpeg(raster))
    assert decoded["width"] == w and decoded["height"] == h
    assert np.array_equal(decoded["raster"], ref)


def test_lut_cache_is_bounded_lru():
    """ADVICE r7: per-image optimized DHTs from arbitrary user JPEGs must
    not grow _LUT_CACHE without bound in a long-lived executor worker."""
    from stock_crypto_data_pipeline_public_spark.operators import jpegcodec as jc

    jc._LUT_CACHE.clear()
    # synthesize > cap distinct (tiny) decode tables
    for i in range(jc._LUT_CACHE_MAX + 5):
        dec = {(8, i): i}  # one 8-bit code per fake table
        jc._decode_lut(dec)
    assert len(jc._LUT_CACHE) == jc._LUT_CACHE_MAX
    # LRU: a re-touched early entry survives the next eviction
    jc._LUT_CACHE.clear()
    tables = [{(8, i): i} for i in range(jc._LUT_CACHE_MAX)]
    for d in tables:
        jc._decode_lut(d)
    jc._decode_lut(tables[0])  # touch the oldest
    jc._decode_lut({(8, 99): 99})  # force one eviction
    key0 = tuple(sorted(tables[0].items()))
    key1 = tuple(sorted(tables[1].items()))
    assert key0 in jc._LUT_CACHE and key1 not in jc._LUT_CACHE
    jc._LUT_CACHE.clear()
