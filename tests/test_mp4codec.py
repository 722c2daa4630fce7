"""ISO-BMFF muxer/demuxer tests (operators/mp4codec.py): the box tree,
fixed-point dims, and the stts/stsc/stsz/stco sample walk are real —
every sampled byte span and timestamp must match what was muxed, and
malformed containers (bad box sizes, inconsistent sample tables,
truncation, forged counts) must refuse loudly rather than mis-read."""

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
from stock_crypto_data_pipeline_public_spark.operators.mp4codec import (
    encode_mp4,
    parse_mp4,
)


def _frames(n: int, seed: int = 0) -> list[bytes]:
    rng = np.random.default_rng(seed)
    return [bytes(rng.integers(0, 256, size=rng.integers(5, 200)).astype("u1")) for _ in range(n)]


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 12), st.integers(1, 10**6), st.integers(1, 1000))
def test_mux_demux_roundtrip_property(n, seed, dur_ms):
    """Every sample comes back byte-identical with its stts timestamp."""
    frames = _frames(n, seed)
    d = parse_mp4(encode_mp4(frames, 64, 48, frame_duration_ms=dur_ms))
    assert (d["width"], d["height"]) == (64, 48)
    assert d["n_samples"] == n and d["sample_format"] == "jpeg"
    assert d["duration_ms"] == n * dur_ms * 1000 // 1000
    for i, (ts, payload) in enumerate(d["samples"]):
        assert payload == frames[i]
        assert ts == i * dur_ms


def test_mjpeg_samples_decode_through_jpeg_codec():
    """The two real codec layers compose: demuxed samples are valid
    baseline JPEGs whose block-constant rasters decode exactly."""
    jf = []
    for f in range(4):
        blocks = (2 * (np.arange(6).reshape(2, 3) + f)).astype(np.uint8)
        jf.append(encode_jpeg(np.kron(blocks, np.ones((8, 8), dtype=np.uint8))))
    for i, (ts, payload) in enumerate(parse_mp4(encode_mp4(jf, 24, 16))["samples"]):
        dec = decode_jpeg(payload)
        assert (dec["width"], dec["height"]) == (24, 16)
        # block grid was arange(6)+f: sum = 64 * 2 * (0+1+..+5 + 6f)
        assert int(dec["raster"].sum()) == 64 * 2 * (15 + 6 * i)


def test_rejects_malformed_containers():
    b = encode_mp4(_frames(3), 32, 32)

    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4(b"\x00" * 32)

    # truncated: moov (written last) goes missing
    with pytest.raises(ValueError):
        parse_mp4(b[: len(b) // 2])

    # corrupt a box size inside moov to overflow its parent
    i = b.index(b"mvhd") - 4
    forged = bytearray(b)
    struct.pack_into(">I", forged, i, 1 << 30)
    with pytest.raises(ValueError, match="bad box size"):
        parse_mp4(bytes(forged))

    # forge stsz sample count beyond stts coverage
    i = b.index(b"stsz") + 4 + 4 + 4  # type + verflags + const_size
    forged = bytearray(b)
    struct.pack_into(">I", forged, i, 5)
    with pytest.raises(ValueError):
        parse_mp4(bytes(forged))

    # forge stco offset past end of file
    i = b.index(b"stco") + 4 + 4 + 4  # type + verflags + count
    forged = bytearray(b)
    struct.pack_into(">I", forged, i, len(b) - 1)
    with pytest.raises(ValueError, match="past end"):
        parse_mp4(bytes(forged))

    # sample-count guard refuses absurd claims before allocation
    i = b.index(b"stsz") + 4 + 4 + 4
    forged = bytearray(b)
    struct.pack_into(">I", forged, i, 1 << 24)
    with pytest.raises(ValueError):
        parse_mp4(bytes(forged))


def test_encoder_rejects_bad_inputs():
    with pytest.raises(ValueError, match="zero frames"):
        encode_mp4([], 8, 8)
    with pytest.raises(ValueError, match="dims"):
        encode_mp4([b"x"], 0, 8)


def test_multi_run_stts_timestamps():
    """A hand-spliced second stts run still resolves per-sample times —
    the demuxer accumulates deltas per run, not just one rate."""
    b = bytearray(encode_mp4(_frames(4, seed=3), 16, 16, frame_duration_ms=40))
    # rewrite stts payload: [2 samples @ 40ms, 2 samples @ 100ms]
    i = b.index(b"stts")
    old = bytes(b[i - 4 : i - 4 + struct.unpack_from(">I", b, i - 4)[0]])
    new_payload = struct.pack(">B3s", 0, b"\x00\x00\x00") + struct.pack(
        ">IIIII", 2, 2, 40, 2, 100
    )
    new = struct.pack(">I", 8 + len(new_payload)) + b"stts" + new_payload
    spliced = bytearray(bytes(b).replace(old, new))
    grow = len(new) - len(old)
    for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        j = spliced.index(tag) - 4
        struct.pack_into(">I", spliced, j, struct.unpack_from(">I", spliced, j)[0] + grow)
    ts = [t for t, _ in parse_mp4(bytes(spliced))["samples"]]
    assert ts == [0, 40, 80, 180]


def test_rejects_forged_run_counts():
    """A forged 4-byte stts/stsc run count must fail FAST (capped at the
    sample count), not spin through millions of zero-count or garbage runs
    before a later coverage check fires."""
    b = encode_mp4(_frames(3), 32, 32)

    # stts: run count far beyond the sample count
    i = b.index(b"stts") + 4 + 4  # type + verflags
    forged = bytearray(b)
    struct.pack_into(">I", forged, i, 1 << 28)
    with pytest.raises(ValueError, match="more stts runs"):
        parse_mp4(bytes(forged))

    # stts: a zero-count run is malformed per 14496-12
    forged = bytearray(b)
    struct.pack_into(">I", forged, i + 4, 0)  # first run's count
    with pytest.raises(ValueError, match="zero-count stts"):
        parse_mp4(bytes(forged))

    # stsc: run count beyond the sample count
    i = b.index(b"stsc") + 4 + 4
    forged = bytearray(b)
    struct.pack_into(">I", forged, i, 1 << 28)
    with pytest.raises(ValueError, match="more stsc runs"):
        parse_mp4(bytes(forged))

    # stco: chunk count beyond the sample count (chunks hold >= 1 sample
    # per 14496-12) — must fail BEFORE unpacking offsets or walking chunks,
    # the forged-count DoS class a constant-size stsz would otherwise feed
    i = b.index(b"stco") + 4 + 4
    forged = bytearray(b)
    struct.pack_into(">I", forged, i, 1 << 28)
    with pytest.raises(ValueError, match="more stco chunks"):
        parse_mp4(bytes(forged))


def test_rejects_non_increasing_stsc():
    """stsc first_chunk must be strictly increasing (14496-12) — the
    forward-pointer chunk walk depends on it, so an out-of-order table is
    refused rather than silently mis-resolved."""
    b = encode_mp4(_frames(4), 16, 16)
    i = b.index(b"stsc") + 4 + 4
    (n_stsc,) = struct.unpack_from(">I", b, i)
    if n_stsc < 2:
        # splice a duplicate-first_chunk second run after the first
        first, spc, sdi = struct.unpack_from(">III", b, i + 4)
        old_box_at = b.index(b"stsc") - 4
        (old_size,) = struct.unpack_from(">I", b, old_box_at)
        old = b[old_box_at : old_box_at + old_size]
        payload = (
            old[8:12]  # version+flags
            + struct.pack(">I", 2)
            + struct.pack(">III", first, spc, sdi)
            + struct.pack(">III", first, spc, sdi)  # same first_chunk: invalid
        )
        new = struct.pack(">I", 8 + len(payload)) + b"stsc" + payload
        spliced = bytearray(bytes(b).replace(old, new))
        grow = len(new) - len(old)
        for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
            j = spliced.index(tag) - 4
            struct.pack_into(
                ">I", spliced, j, struct.unpack_from(">I", spliced, j)[0] + grow
            )
        forged = bytes(spliced)
    else:
        forged_b = bytearray(b)
        # copy run 0's first_chunk onto run 1 → non-increasing
        struct.pack_into(">I", forged_b, i + 4 + 12, struct.unpack_from(">I", b, i + 4)[0])
        forged = bytes(forged_b)
    with pytest.raises(ValueError, match="not strictly increasing"):
        parse_mp4(forged)
