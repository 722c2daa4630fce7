"""Pure-Python baseline JPEG codec (grayscale, stdlib + numpy only).

The container has no PIL/libjpeg, so this module implements the baseline
sequential DCT process from the published JPEG specification (ITU-T T.81)
directly: 8x8 block splitting, the orthonormal 2D DCT, Annex-K luminance
quantization, zigzag ordering, DC differential + AC run-length coding, and
canonical Huffman entropy coding with the Annex-K "typical" tables. Scope
is the single-component (grayscale) baseline process — exactly what the
synthetic media pipeline emits — and the decoder raises a clear error on
anything outside it (progressive, multi-component, 12-bit) rather than
guessing.

Reference parity: the reference hands image decode to OpenCV
(scripts/chatbot/ocr_tools.py:26-56 `cv2.imread` in preprocess_image) and
names PNG/JPG/JPEG as its supported formats (ocr_tools.py:80-83); this
container has no cv2/PIL, so the decode is implemented from the published
spec instead — which also lets the Spark-side multimodal plumbing
(operators/multimodal.py) be oracle-gated on DECODED pixels, not just
container headers.

Exactness contract used by the oracles: JPEG is lossy in general, but a
block whose 64 samples share one EVEN value round-trips bit-exactly —
its only nonzero coefficient is DC = 8*(v-128), and the Annex-K DC
quantizer step is 16, which divides 8*(v-128) when v is even. The
synthesizers in multimodal.py emit block-constant rasters with even
values, so the decoded pixel sum is a closed form a SQL oracle can
predict while the full entropy-decode -> dequantize -> IDCT path still
runs for real.
"""

from __future__ import annotations

import struct
from collections import OrderedDict

import numpy as np

# Annex K.1 luminance quantization table (row-major 8x8).
QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# Zigzag scan: ZIGZAG[k] = linear (row-major) index of the k-th coefficient.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3 "typical" luminance Huffman tables: BITS (codes per length
# 1..16) and HUFFVAL in canonical order.
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix; F = C @ f @ C.T equals the
    T.81 FDCT (the 1/4·c(u)c(v) scaling folds into the orthonormal
    alpha(u)alpha(v))."""
    x = np.arange(8)
    u = np.arange(8)[:, None]
    c = np.cos((2 * x + 1) * u * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c * 0.5


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]):
    """(value -> (code, length), (length, code) -> value) canonical
    Huffman tables per T.81 C.2 (codes assigned in length order)."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            dec[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return enc, dec


_DC_ENC, _DC_DEC = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
_AC_ENC, _AC_DEC = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)


class _BitWriter:
    """MSB-first bit packer with JPEG byte stuffing (FF -> FF 00)."""

    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self._out.append(byte)
            if byte == 0xFF:
                self._out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def done(self) -> bytes:
        if self._n:
            # pad with 1-bits per the spec
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)
        return bytes(self._out)


class _BitReader:
    """MSB-first bit reader over entropy-coded data; un-stuffs FF 00 and
    stops (raises) at any real marker — baseline-without-restarts scope."""

    def __init__(self, data: bytes, pos: int) -> None:
        self._b = data
        self._pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self._pos >= len(self._b):
                raise ValueError("jpeg: entropy data truncated")
            byte = self._b[self._pos]
            self._pos += 1
            if byte == 0xFF:
                if self._pos >= len(self._b):
                    raise ValueError("jpeg: dangling FF in entropy data")
                nxt = self._b[self._pos]
                if nxt == 0x00:
                    self._pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"jpeg: unexpected marker FF{nxt:02X} inside scan "
                        "(restart intervals are out of scope)"
                    )
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, dec: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            if (length, code) in dec:
                return dec[(length, code)]
        raise ValueError("jpeg: invalid Huffman code in scan")


#: (frozen decode-table) -> (value_list, length_list) indexed by a 16-bit
#: peek — canonical-prefix fan-out per T.81 F.16's FAST path. Cached
#: module-level as a small LRU: our own encoder emits one fixed table
#: pair, but decode_jpeg is reachable from extract_text over arbitrary
#: user JPEGs whose per-image optimized DHTs would otherwise accumulate
#: multi-MB LUTs per distinct table in a long-lived executor worker.
_LUT_CACHE: "OrderedDict[tuple, tuple[list, list]]" = OrderedDict()
_LUT_CACHE_MAX = 8  # fixed tables need 4 (DC/AC luma+chroma)


def _decode_lut(dec: dict[tuple[int, int], int]) -> tuple[list, list]:
    key = tuple(sorted(dec.items()))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        _LUT_CACHE.move_to_end(key)
        return hit
    val = [0] * (1 << 16)
    ln = [0] * (1 << 16)
    for (length, code), v in dec.items():
        shift = 16 - length
        base = code << shift
        for i in range(base, base + (1 << shift)):
            val[i] = v
            ln[i] = length
    _LUT_CACHE[key] = (val, ln)
    if len(_LUT_CACHE) > _LUT_CACHE_MAX:
        _LUT_CACHE.popitem(last=False)
    return val, ln


class _FastBits:
    """MSB-first reader over UNSTUFFED entropy bytes: an int accumulator
    serves 16-bit peeks (LUT decode) and k-bit takes without per-bit calls.
    Truncation surfaces exactly like _BitReader's: a take() past the last
    real bit raises (peeks may see virtual zero padding — lookup only)."""

    __slots__ = ("d", "i", "acc", "nb")

    def __init__(self, d: bytes) -> None:
        self.d = d
        self.i = 0
        self.acc = 0
        self.nb = 0

    def _fill(self) -> None:
        d, i, n = self.d, self.i, len(self.d)
        acc, nb = self.acc, self.nb
        while nb <= 48 and i < n:
            acc = (acc << 8) | d[i]
            i += 1
            nb += 8
        self.acc, self.nb, self.i = acc, nb, i

    def peek16(self) -> int:
        if self.nb < 16:
            self._fill()
            if self.nb < 16:  # scan tail: pad for LOOKUP only
                return (self.acc << (16 - self.nb)) & 0xFFFF
        return (self.acc >> (self.nb - 16)) & 0xFFFF

    def take(self, k: int) -> int:
        if self.nb < k:
            self._fill()
            if self.nb < k:
                raise ValueError("jpeg: entropy data truncated")
        self.nb -= k
        v = (self.acc >> self.nb) & ((1 << k) - 1)
        self.acc &= (1 << self.nb) - 1
        return v


def _unstuff_scan(b: bytes, pos: int) -> bytes:
    """Entropy-coded bytes from ``pos`` to the first real marker, with
    FF 00 -> FF unstuffing; restart markers raise (same scope rule as
    _BitReader)."""
    import re

    m = re.search(rb"\xff(?:[^\x00]|$)", b[pos:])
    if m is None:
        seg = b[pos:]
    else:
        tail = m.group(0)
        if len(tail) == 1:
            raise ValueError("jpeg: dangling FF in entropy data")
        if 0xD0 <= tail[1] <= 0xD7:
            raise ValueError(
                f"jpeg: unexpected marker FF{tail[1]:02X} inside scan "
                "(restart intervals are out of scope)"
            )
        seg = b[pos : pos + m.start()]
    return seg.replace(b"\xff\x00", b"\xff")


def _magnitude(v: int) -> tuple[int, int]:
    """(size, bits) magnitude coding per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def encode_jpeg(raster: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 grayscale raster as a baseline JFIF JPEG.

    Edges of images whose dims are not multiples of 8 are padded by
    replication (the decoder crops back to the SOF0 dims).
    """
    px = np.asarray(raster)
    if px.ndim != 2:
        raise ValueError("encode_jpeg takes a 2-D grayscale raster")
    h, w = px.shape
    if not (0 < h <= 0xFFFF and 0 < w <= 0xFFFF):
        raise ValueError(f"jpeg: dims out of range: {w}x{h}")
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        px = np.pad(px, ((0, ph), (0, pw)), mode="edge")
    shifted = px.astype(np.float64) - 128.0

    # Batch FDCT: one einsum over every block at once (raster order) —
    # per-block numpy matmul calls dominated the old loop's wall time.
    bh8, bw8 = px.shape[0] // 8, px.shape[1] // 8
    blocks = shifted.reshape(bh8, 8, bw8, 8).transpose(0, 2, 1, 3)
    coeff = np.einsum("ij,byjk,lk->byil", _DCT, blocks, _DCT, optimize=True)
    q = np.rint(coeff / QUANT_LUM).astype(np.int64)
    zz_all = q.reshape(-1, 64)[:, ZIGZAG]  # (nblocks, 64) in zigzag order
    # per-block index of the last nonzero coefficient (0 if AC all zero)
    nz = zz_all != 0
    nz[:, 0] = True  # DC never terminates the scan early
    last_nz_all = 63 - np.argmax(nz[:, ::-1], axis=1)

    writer = _BitWriter()
    prev_dc = 0
    zz_list = zz_all.tolist()  # python ints: the RLE loop stays scalar
    for bi, zz in enumerate(zz_list):
        # DC: differential + size category
        diff = zz[0] - prev_dc
        prev_dc = zz[0]
        size, bits = _magnitude(diff)
        code, length = _DC_ENC[size]
        writer.put(code, length)
        if size:
            writer.put(bits, size)
        # AC: (run, size) symbols with ZRL/EOB
        last_nz = int(last_nz_all[bi])
        run = 0
        for k in range(1, last_nz + 1):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = _AC_ENC[0xF0]  # ZRL
                writer.put(code, length)
                run -= 16
            size, bits = _magnitude(v)
            code, length = _AC_ENC[(run << 4) | size]
            writer.put(code, length)
            writer.put(bits, size)
            run = 0
        if last_nz < 63:
            code, length = _AC_ENC[0x00]  # EOB
            writer.put(code, length)
    scan = writer.done()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    zz_quant = bytes(int(QUANT_LUM.ravel()[ZIGZAG[k]]) for k in range(64))
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + zz_quant)  # DQT: Pq=0, Tq=0
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")  # SOF0
    out += seg(0xC4, b"\x00" + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += seg(0xC4, b"\x10" + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    out += seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS: comp 1 -> DC0/AC0
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _parse_segments(b: bytes):
    """Yield (marker, payload_start, payload_len) for every marker segment
    up to SOS; returns (sof, dqt_tables, huff_tables, sos, scan_pos)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    sof = None
    sos = None
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI with no scan
            break
        (length,) = struct.unpack_from(">H", b, pos + 2)
        payload = b[pos + 4 : pos + 2 + length]
        if len(payload) != length - 2:
            raise ValueError("jpeg: truncated segment")
        if marker == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: only 8-bit quant tables supported")
                zz = np.frombuffer(payload, dtype=np.uint8, count=64, offset=i + 1)
                table = np.zeros(64, dtype=np.int32)
                table[ZIGZAG] = zz
                quant[tq] = table.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0x0F
                bits = list(payload[i + 1 : i + 17])
                n = sum(bits)
                vals = list(payload[i + 17 : i + 17 + n])
                _, dec = _canonical_codes(bits, vals)
                huff[(tc, th)] = dec
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential SOF
            sof = payload
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg: SOF marker FF{marker:02X} is not baseline sequential"
            )
        elif marker == 0xDA:
            sos = payload
            pos = pos + 2 + length
            break
        # APPn / COM / DRI etc.: skipped (DRI with nonzero interval would
        # surface as an unexpected RSTn in the bit reader)
        pos = pos + 2 + length
    if sof is None or sos is None:
        raise ValueError("jpeg: missing SOF0/SOS")
    return sof, quant, huff, sos, pos


def decode_jpeg(b: bytes) -> dict:
    """Decode a single-component baseline JPEG; returns
    {width, height, raster (h,w) uint8}. Multi-component (color) images
    raise — the pipeline's synthetic media is grayscale, and guessing at
    chroma upsampling without a conformance corpus would be dishonest.
    """
    sof, quant, huff, sos, pos = _parse_segments(b)
    precision, h, w, ncomp = struct.unpack_from(">BHHB", sof, 0)
    if precision != 8:
        raise ValueError(f"jpeg: {precision}-bit precision unsupported")
    if ncomp != 1:
        raise ValueError(
            f"jpeg: {ncomp}-component images unsupported (grayscale only)"
        )
    comp_id, sampling, tq = sof[6], sof[7], sof[8]
    if sampling != 0x11:
        raise ValueError("jpeg: subsampling on a 1-component image")
    if tq not in quant:
        raise ValueError(f"jpeg: missing quant table {tq}")
    ns = sos[0]
    if ns != 1 or sos[1] != comp_id:
        raise ValueError("jpeg: scan does not cover the single component")
    td, ta = sos[2] >> 4, sos[2] & 0x0F
    if (0, td) not in huff or (1, ta) not in huff:
        raise ValueError("jpeg: missing Huffman table for scan")
    dc_dec, ac_dec = huff[(0, td)], huff[(1, ta)]
    qtab = quant[tq].astype(np.float64)

    bw = (w + 7) // 8
    bh = (h + 7) // 8
    if bw * bh > 1 << 20:
        raise ValueError("jpeg: raster too large (decompression guard)")
    nblocks = bh * bw
    # entropy decode through the cached 16-bit LUTs over the unstuffed
    # scan — ~2 scalar ops per symbol instead of up to 16 per-bit calls
    dc_val, dc_len = _decode_lut(dc_dec)
    ac_val, ac_len = _decode_lut(ac_dec)
    bits = _FastBits(_unstuff_scan(b, pos))
    zz_all = np.zeros((nblocks, 64), dtype=np.float64)
    prev_dc = 0
    for bi in range(nblocks):
        zz = zz_all[bi]
        p = bits.peek16()
        length = dc_len[p]
        if length == 0:
            raise ValueError("jpeg: invalid Huffman code in scan")
        bits.take(length)
        size = dc_val[p]
        prev_dc += _extend(bits.take(size), size)
        zz[0] = prev_dc
        k = 1
        while k < 64:
            p = bits.peek16()
            length = ac_len[p]
            if length == 0:
                raise ValueError("jpeg: invalid Huffman code in scan")
            bits.take(length)
            rs = ac_val[p]
            run, size = rs >> 4, rs & 0x0F
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += run
            if k > 63:
                raise ValueError("jpeg: AC run past end of block")
            zz[k] = _extend(bits.take(size), size)
            k += 1
    # batch IDCT: one scatter + one einsum over every block (the old
    # per-block matmul pair dominated decode wall time)
    coeff = np.zeros((nblocks, 64), dtype=np.float64)
    coeff[:, ZIGZAG] = zz_all
    blocks = (
        np.einsum(
            "ji,bjk,kl->bil",
            _DCT,
            coeff.reshape(-1, 8, 8) * qtab,
            _DCT,
            optimize=True,
        )
        + 128.0
    )
    px = np.clip(np.rint(blocks), 0, 255).astype(np.uint8)
    out = (
        px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    )
    return {"width": w, "height": h, "raster": out[:h, :w]}
