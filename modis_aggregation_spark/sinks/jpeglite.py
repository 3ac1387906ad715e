"""Pure-Python JPEG codec (stdlib struct + numpy).

The dominant image format of any real multimodal training corpus; the
bundled PNG/GIF codecs cover lossless only.  This module implements the
DCT processes of the public ITU-T T.81 (1992) specification:

* ``decode_jpeg`` — baseline/extended sequential Huffman streams (SOF0/
  SOF1) AND progressive streams (SOF2, round 7 — Annex G spectral
  selection + successive approximation: interleaved/non-interleaved DC
  first and refinement passes, per-component AC first and refinement
  passes with EOB-run coding, per-scan restart intervals and table
  redefinition between scans), 8-bit samples, grayscale or 3-component
  YCbCr with arbitrary sampling factors 1-4 (4:4:4, 4:2:2, 4:2:0, ...),
  restart markers, JFIF and Adobe APP14 color handling.  The entropy
  scans are decoded in sequential Python passes (Huffman/bit streams
  are inherently serial) into per-component raster block grids;
  everything after — dequantize, IDCT, upsample, color convert — is
  batched numpy over all blocks at once.
* ``encode_jpeg`` — baseline sequential, grayscale or RGB as 4:4:4
  YCbCr, Annex K quantization tables scaled by the libjpeg quality
  formula, Annex K "typical" Huffman tables, optional restart interval;
  ``precision=12`` emits the extended sequential process (SOF1) from
  uint16 samples with flat Huffman tables covering the wider 12-bit
  categories.  12-bit decode is supported for SOF1 and SOF2 streams
  (Table F.1 category ranges; uint16 output).
* ``decode_jpeg`` / ``encode_jpeg_lossless`` — the LOSSLESS process
  (SOF3, Annex H, round 11): predictors 1-7, point transform,
  restart intervals, 2..16-bit samples, 1-4 components with arbitrary
  sampling factors on decode (encode is 1x1 interleaved); bit-exact
  round trip, uint8/uint16 output, no color transform (T.81 defines
  none for lossless; SOF3 producers store component-planar data).

Also supported (round 11): DNL-deferred image height (SOF height 0 +
the B.2.5 DNL segment after the scan) and 4-component CMYK/YCCK
decode+encode (Adobe APP14 transform 0/2, libjpeg conventions,
(H, W, 4) arrays — the declared transform is removed/applied; any
application-level Adobe inversion is the caller's business).

Arithmetic-coded (QM-coder, Annex D + F.1.4/F.2.1) DCT streams are
REAL (round 12): ``decode_jpeg`` handles sequential SOF9 and
progressive SOF10 scans (DC/AC first + refinement, DAC conditioning
L/U and Kx, restart intervals), ``encode_jpeg(arithmetic=True)``
emits SOF9 and ``encode_jpeg_progressive(arithmetic=True)`` emits
SOF10, all over the shared ``sinks/qmcoder.py`` Annex D coder (the
normative Table D.3 Qe state machine is published spec content).
Hierarchical (SOF5-7, SOF13-15) and arithmetic LOSSLESS (SOF11)
streams raise ``NotImplementedError`` — honest gates per repo rule 5,
not silent fallbacks.

Cross-validated in tests against the JVM's javax.imageio — a REAL,
independent production codec shipped with the JDK: imageio must decode
jpeglite's output within IDCT-rounding tolerance, and jpeglite must
decode imageio-encoded streams (including 4:2:0 chroma-subsampled ones)
likewise.  Reference parity note: the reference pipeline has no JPEG
surface (its media are HDF4 granules); this codec serves the
LLM-pipeline multimodal operators (``operators/multimodal.py``).
"""

from __future__ import annotations

import struct

import numpy as np

# Zig-zag index order (T.81 Figure 5): ZIGZAG[i] = raster position of the
# i-th coefficient in scan order.
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

# Annex K.1 luminance / K.2 chrominance quantization tables (raster order).
QT_LUMA = np.array(
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
    dtype=np.int64,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 "typical" Huffman tables: (BITS[1..16], HUFFVAL).
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# Orthonormal 8-point DCT-II basis: _DCT_T[u, x] = (c(u)/2) cos((2x+1)uπ/16),
# c(0)=1/√2.  The 2-D transform S = T · s · Tᵀ is exactly T.81 A.3.3's
# FDCT; the IDCT is s = Tᵀ · S · T.
_DCT_T = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _DCT_T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _x, _c


def _gate(what: str) -> NotImplementedError:
    return NotImplementedError(
        f"jpeglite implements the sequential (8/12-bit), progressive "
        f"and lossless Huffman processes and the sequential/progressive "
        f"arithmetic (QM-coded) processes of ITU-T T.81; {what} is "
        f"not implemented (honest gate — no silent fallback)"
    )


# ----------------------------------------------------------------- decode


class _HuffTable:
    """Canonical Huffman table from a DHT (BITS, HUFFVAL) pair, compiled
    to a flat 16-bit peek table: entry i holds (symbol, code_length) for
    every 16-bit window whose prefix is that code — one list index per
    decoded symbol instead of a bit-by-bit tree walk."""

    __slots__ = ("lookup16",)

    def __init__(self, bits: list[int], values: list[int]):
        lut: list = [None] * 65536
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                start = code << (16 - length)
                span = 1 << (16 - length)
                lut[start : start + span] = [(values[k], length)] * span
                code += 1
                k += 1
            code <<= 1
        if k != len(values):
            raise ValueError("DHT: BITS total != number of HUFFVAL symbols")
        self.lookup16 = lut


_HUFF_CACHE: dict[tuple[bytes, bytes], _HuffTable] = {}


def _huff_table(bits: list[int], values: list[int]) -> _HuffTable:
    """Memoized `_HuffTable` construction — the 64K-entry peek table
    costs ~0.5 ms to build, and real streams reuse a handful of tables
    (Annex K's four, or one encoder's fixed set) across every file."""
    key = (bytes(bits), bytes(values))
    t = _HUFF_CACHE.get(key)
    if t is None:
        t = _HuffTable(bits, values)
        if len(_HUFF_CACHE) < 512:
            _HUFF_CACHE[key] = t
    return t


# T.81 F.12 EXTEND as table lookups: v >= _EXT_HALF[s] keeps v, else
# v - _EXT_SUB[s]; s == 0 never reaches the tables (no magnitude bits).
_EXT_HALF = [1 << (s - 1) if s else 1 for s in range(17)]
_EXT_SUB = [(1 << s) - 1 for s in range(17)]


def _unstuff(seg: bytes) -> bytes:
    """Remove FF 00 byte stuffing, validating that every FF in the
    entropy segment IS stuffed (a bare FF xx is a stray marker)."""
    i = seg.find(b"\xff")
    while i != -1:
        if i + 1 >= len(seg) or seg[i + 1] != 0x00:
            nxt = seg[i + 1] if i + 1 < len(seg) else 0
            raise ValueError(f"unexpected marker FF{nxt:02X} inside entropy data")
        i = seg.find(b"\xff", i + 2)
    return seg.replace(b"\xff\x00", b"\xff")


class _BitReader:
    """MSB-first bit reader over an UNSTUFFED entropy-coded segment,
    refilled 4 bytes at a time; reads past the end yield 1-bits (T.81
    F.2.2.5 padding semantics)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        data, pos, n = self.data, self.pos, len(self.data)
        while self.nbits < need:
            if pos >= n:
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            take = min(4, n - pos)
            self.acc = (self.acc << (8 * take)) | int.from_bytes(
                data[pos : pos + take], "big"
            )
            self.nbits += 8 * take
            pos += take
        self.pos = pos

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill(n)
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: _HuffTable) -> int:
        if self.nbits < 16:
            self._fill(16)
        window = (self.acc >> (self.nbits - 16)) & 0xFFFF
        hit = table.lookup16[window]
        if hit is None:
            raise ValueError("invalid Huffman code in entropy data")
        sym, length = hit
        self.nbits -= length
        self.acc &= (1 << self.nbits) - 1
        return sym


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map an s-bit magnitude field to its signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _parse_segments(buf: bytes):
    """Yield (marker, payload, scan_data_or_None) for each segment up to
    and including each SOS's entropy-coded data."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(buf)
    while pos < n:
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        while pos < n and buf[pos] == 0xFF:  # fill bytes allowed
            pos += 1
        marker = buf[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            return
        if 0xD0 <= marker <= 0xD7:  # stray RST outside a scan
            continue
        (seglen,) = struct.unpack_from(">H", buf, pos)
        payload = buf[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDA:  # SOS: entropy data follows until next marker
            start = pos
            while True:  # hop FF to FF; skip stuffing (FF 00) and RSTs
                pos = buf.find(b"\xff", pos, n - 1)
                if pos == -1:
                    pos = n - 1
                    break
                nxt = buf[pos + 1]
                if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                    break
                pos += 2
            yield marker, payload, buf[start:pos]
        else:
            yield marker, payload, None


def _scan_segments(scan_data: bytes, restart_interval: int) -> list[bytes]:
    """Split entropy data on restart markers and unstuff each segment.
    Restart markers reset the DC predictors (and, in progressive scans,
    the EOB run) and byte-align the reader; FF D0-D7 can never be
    stuffing, which is always FF 00."""
    if restart_interval:
        import re as _re

        return [_unstuff(p) for p in _re.split(b"\xff[\xd0-\xd7]", scan_data)]
    return [_unstuff(scan_data)]


def _decode_seq_scan(segments, units, comps, sel, htables, ri):
    """Baseline/extended sequential scan: full-band Huffman decode of
    every unit (T.81 F.2). The bit reader is inlined as local ints (the
    `_BitReader` semantics exactly: MSB-first, 1-bit padding past the
    segment end) — this loop is the whole-file hot path and attribute
    dispatch per symbol costs ~3x."""
    tabs = {}
    for ci, c in enumerate(comps):
        if c["id"] in sel:
            td, ta = sel[c["id"]]
            if (0, td) not in htables or (1, ta) not in htables:
                raise ValueError("missing Huffman table referenced by SOS")
            tabs[ci] = (htables[(0, td)].lookup16, htables[(1, ta)].lookup16)
    u, n_units = 0, len(units)
    ext_half, ext_sub = _EXT_HALF, _EXT_SUB
    for seg in segments:
        data, npos = seg, len(seg)
        pos = acc = nbits = 0
        pred = {ci: 0 for ci in tabs}
        for _ in range(min(ri or (n_units - u), n_units - u)):
            for ci, row in units[u]:
                dc_lut, ac_lut = tabs[ci]
                # refill to >=32 bits: one Huffman code (<=16) plus its
                # magnitude field (<=16) never needs another refill
                if nbits < 32:
                    if pos + 4 <= npos:
                        acc = (acc << 32) | int.from_bytes(
                            data[pos : pos + 4], "big"
                        )
                        nbits += 32
                        pos += 4
                    else:
                        while nbits < 32:
                            acc = (acc << 8) | (
                                data[pos] if pos < npos else 0xFF
                            )
                            pos += 1
                            nbits += 8
                hit = dc_lut[(acc >> (nbits - 16)) & 0xFFFF]
                if hit is None:
                    raise ValueError("invalid Huffman code in entropy data")
                s_, length = hit
                if s_ > 15:
                    raise ValueError("invalid DC magnitude category")
                nbits -= length
                if s_:
                    nbits -= s_
                    v = (acc >> nbits) & ext_sub[s_]
                    pred[ci] += v if v >= ext_half[s_] else v - ext_sub[s_]
                acc &= (1 << nbits) - 1
                row[0] = pred[ci]
                k = 1
                while k < 64:
                    if nbits < 32:
                        if pos + 4 <= npos:
                            acc = (acc << 32) | int.from_bytes(
                                data[pos : pos + 4], "big"
                            )
                            nbits += 32
                            pos += 4
                        else:
                            while nbits < 32:
                                acc = (acc << 8) | (
                                    data[pos] if pos < npos else 0xFF
                                )
                                pos += 1
                                nbits += 8
                    hit = ac_lut[(acc >> (nbits - 16)) & 0xFFFF]
                    if hit is None:
                        raise ValueError(
                            "invalid Huffman code in entropy data"
                        )
                    rs, length = hit
                    nbits -= length
                    s_ = rs & 15
                    if s_ == 0:
                        acc &= (1 << nbits) - 1
                        if rs == 0xF0:
                            k += 16  # ZRL
                            continue
                        break  # EOB
                    k += rs >> 4
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    nbits -= s_
                    v = (acc >> nbits) & ext_sub[s_]
                    acc &= (1 << nbits) - 1
                    row[k] = v if v >= ext_half[s_] else v - ext_sub[s_]
                    k += 1
            u += 1
    if u != n_units:
        raise ValueError(f"scan ended after {u}/{n_units} MCUs")


def _decode_dc_first(segments, units, sel, comps, htables, al, ri):
    """Progressive first DC scan (T.81 G.1.2.1): DC diffs as in the
    sequential process, coefficient stored point-shifted left by Al."""
    tabs = {}
    for ci, c in enumerate(comps):
        if c["id"] in sel:
            td = sel[c["id"]][0]
            if (0, td) not in htables:
                raise ValueError("missing DC Huffman table referenced by SOS")
            tabs[ci] = htables[(0, td)]
    u, n_units = 0, len(units)
    luts = {ci: t.lookup16 for ci, t in tabs.items()}
    ext_half, ext_sub = _EXT_HALF, _EXT_SUB
    for seg in segments:
        data, npos = seg, len(seg)
        pos = acc = nbits = 0
        pred = {ci: 0 for ci in tabs}
        for _ in range(min(ri or (n_units - u), n_units - u)):
            for ci, row in units[u]:
                if nbits < 32:
                    if pos + 4 <= npos:
                        acc = (acc << 32) | int.from_bytes(
                            data[pos : pos + 4], "big"
                        )
                        nbits += 32
                        pos += 4
                    else:
                        while nbits < 32:
                            acc = (acc << 8) | (
                                data[pos] if pos < npos else 0xFF
                            )
                            pos += 1
                            nbits += 8
                hit = luts[ci][(acc >> (nbits - 16)) & 0xFFFF]
                if hit is None:
                    raise ValueError("invalid Huffman code in entropy data")
                s_, length = hit
                if s_ > 15:
                    raise ValueError("invalid DC magnitude category")
                nbits -= length
                if s_:
                    nbits -= s_
                    v = (acc >> nbits) & ext_sub[s_]
                    pred[ci] += v if v >= ext_half[s_] else v - ext_sub[s_]
                acc &= (1 << nbits) - 1
                row[0] = pred[ci] << al
            u += 1
    if u != n_units:
        raise ValueError(f"DC scan ended after {u}/{n_units} units")


def _decode_dc_refine(segments, units, al, ri):
    """Progressive DC refinement (T.81 G.1.2.1): one appended magnitude
    bit per block; no Huffman tables involved."""
    u, n_units = 0, len(units)
    p1 = 1 << al
    for seg in segments:
        rd = _BitReader(seg)
        for _ in range(min(ri or (n_units - u), n_units - u)):
            for _ci, row in units[u]:
                if rd.bits(1):
                    row[0] = int(row[0]) | p1
            u += 1
    if u != n_units:
        raise ValueError(f"DC refinement ended after {u}/{n_units} units")


def _decode_ac_first(segments, units, ss, se, al, ac_t, ri):
    """Progressive first AC scan (T.81 G.1.2.2): band [Ss..Se] of one
    component, EOB-run coded, values point-shifted left by Al. Bit
    reader inlined as locals (same `_BitReader` semantics) — this is
    the progressive-decode hot path."""
    u, n_units = 0, len(units)
    ac_lut = ac_t.lookup16
    ext_half, ext_sub = _EXT_HALF, _EXT_SUB
    for seg in segments:
        data, npos = seg, len(seg)
        pos = acc = nbits = 0
        eobrun = 0
        for _ in range(min(ri or (n_units - u), n_units - u)):
            (_ci, row) = units[u][0]
            if eobrun:
                eobrun -= 1
            else:
                k = ss
                while k <= se:
                    # one code (<=16) + max(r, s) bits (<=16) per symbol
                    if nbits < 32:
                        if pos + 4 <= npos:
                            acc = (acc << 32) | int.from_bytes(
                                data[pos : pos + 4], "big"
                            )
                            nbits += 32
                            pos += 4
                        else:
                            while nbits < 32:
                                acc = (acc << 8) | (
                                    data[pos] if pos < npos else 0xFF
                                )
                                pos += 1
                                nbits += 8
                    hit = ac_lut[(acc >> (nbits - 16)) & 0xFFFF]
                    if hit is None:
                        raise ValueError(
                            "invalid Huffman code in entropy data"
                        )
                    rs, length = hit
                    nbits -= length
                    r, s_ = rs >> 4, rs & 15
                    if s_ == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                nbits -= r
                                eobrun += (acc >> nbits) & ext_sub[r]
                            acc &= (1 << nbits) - 1
                            break
                        acc &= (1 << nbits) - 1
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("AC run past end of band")
                    nbits -= s_
                    v = (acc >> nbits) & ext_sub[s_]
                    acc &= (1 << nbits) - 1
                    row[k] = (
                        v if v >= ext_half[s_] else v - ext_sub[s_]
                    ) << al
                    k += 1
            u += 1
    if u != n_units:
        raise ValueError(f"AC scan ended after {u}/{n_units} units")


def _decode_ac_refine(segments, units, ss, se, al, ac_t, ri):
    """Progressive AC refinement (T.81 G.1.2.3): each already-nonzero
    coefficient in the band receives an appended magnitude bit as it is
    passed over; zero-history coefficients newly become ±2^Al as
    directed by the run/EOB structure."""
    u, n_units = 0, len(units)
    p1 = 1 << al

    def _correct(row, k):
        # append one magnitude bit to an already-nonzero coefficient
        if rd.bits(1):
            v = int(row[k])
            if abs(v) & p1 == 0:
                row[k] = v + p1 if v > 0 else v - p1

    for seg in segments:
        rd = _BitReader(seg)
        eobrun = 0
        for _ in range(min(ri or (n_units - u), n_units - u)):
            (_ci, row) = units[u][0]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = rd.huff(ac_t)
                    r, s_ = rs >> 4, rs & 15
                    newval = 0
                    if s_ == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += rd.bits(r)
                            break
                        # r == 15: ZRL — pass 16 zero-history positions
                    else:
                        if s_ != 1:
                            raise ValueError(
                                "AC refinement code with size > 1"
                            )
                        newval = p1 if rd.bits(1) else -p1
                    # advance past r zero-history coefficients, appending
                    # bits to nonzero-history ones passed on the way
                    while k <= se:
                        if row[k] != 0:
                            _correct(row, k)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        row[k] = newval
                    k += 1
            if eobrun:
                # EOB region: remaining nonzero coefficients in the band
                # still receive their appended bit
                while k <= se:
                    if row[k] != 0:
                        _correct(row, k)
                    k += 1
                eobrun -= 1
            u += 1
    if u != n_units:
        raise ValueError(f"AC refinement ended after {u}/{n_units} units")


def _decode_lossless_frame(frame, scans) -> np.ndarray:
    """Lossless (SOF3) frame decode — T.81 Annex H, process 14.

    Each sample's difference from its prediction is Huffman-coded like a
    DC coefficient (SSSS category + magnitude bits, Table H.2; SSSS=16
    means a difference of exactly 32768 with no extra bits), prediction
    selected by the scan's Ss field (1..7: Ra, Rb, Rc, Ra+Rb-Rc,
    Ra+((Rb-Rc)>>1), Rb+((Ra-Rc)>>1), (Ra+Rb)>>1), reconstruction modulo
    2^16 (H.1.2.1).  The first sample of a scan (and of each restart
    interval) predicts from 2^(P-Pt-1); the rest of that first line
    predicts from Ra; the first sample of every later line predicts from
    Rb (H.1.1).  Prediction never crosses a restart boundary (H.2.2), so
    restart intervals must cover whole sample/MCU lines — a mid-line
    restart (which no real encoder emits: it would leave 'the line
    above' spanning two independent intervals) raises ValueError.
    Output samples are shifted left by the point transform Pt (H.1.2.3).
    No color transform is applied — T.81 defines none for the lossless
    process, and real SOF3 producers (DNG, DICOM) store component-planar
    data, not YCbCr — multi-component frames return the planes stacked
    as (H, W, N), uint8 for P<=8 else uint16."""
    prec = frame["prec"]
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    if not all(1 <= c["h"] <= 4 and 1 <= c["v"] <= 4 for c in comps):
        raise ValueError("sampling factors out of the 1-4 range")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    # lossless data unit = ONE SAMPLE (T.81 A.2.2): MCU grid in samples
    mcux = -(-w // hmax)
    mcuy = -(-h // vmax)
    # per-component PADDED sample grid, rows of python ints (the entropy
    # loop is serial python; numpy only sees the assembled planes)
    grids = [
        [[0] * (mcux * c["h"]) for _ in range(mcuy * c["v"])] for c in comps
    ]
    pt_of = [None] * len(comps)
    ext_half, ext_sub = _EXT_HALF, _EXT_SUB

    for sel, ss, _se, _ah, al, scan_data, ri, tabs, _dac in scans:
        sel_comps = [ci for ci, c in enumerate(comps) if c["id"] in sel]
        if len(sel_comps) != len(sel):
            raise ValueError("SOS references a component not in the frame")
        if al >= prec:
            raise ValueError(
                f"point transform {al} >= sample precision {prec}"
            )
        luts = {}
        for ci in sel_comps:
            td = sel[comps[ci]["id"]][0]
            if (0, td) not in tabs:
                raise ValueError("missing Huffman table referenced by SOS")
            luts[ci] = tabs[(0, td)].lookup16
        for ci in sel_comps:
            if pt_of[ci] is not None and pt_of[ci] != al:
                raise ValueError(
                    "point transform differs between scans of one component"
                )
            pt_of[ci] = al
        default = 1 << (prec - al - 1)

        interleaved = len(sel_comps) > 1
        if interleaved:
            row_units, total_rows = mcux, mcuy
        else:
            cc = comps[sel_comps[0]]
            # non-interleaved scans cover the REAL (unpadded) grid
            row_units = -(-(w * cc["h"]) // hmax)
            total_rows = -(-(h * cc["v"]) // vmax)
        if ri:
            if ri % row_units:
                raise ValueError(
                    f"lossless restart interval {ri} is not a whole number "
                    f"of {row_units}-unit sample lines; prediction may not "
                    "cross a restart boundary (T.81 H.2.2), so mid-line "
                    "restarts are rejected"
                )
            rows_per_seg = ri // row_units
        else:
            rows_per_seg = total_rows
        segments = _scan_segments(scan_data, ri)
        need = -(-total_rows // rows_per_seg)
        if len(segments) != need:
            raise ValueError(
                f"lossless scan has {len(segments)} restart segments; the "
                f"declared interval implies {need}"
            )

        for si, seg in enumerate(segments):
            data, npos = seg, len(seg)
            pos = acc = nbits = 0

            def read_diff(lut):
                nonlocal pos, acc, nbits
                if nbits < 32:
                    if pos + 4 <= npos:
                        acc = (acc << 32) | int.from_bytes(
                            data[pos : pos + 4], "big"
                        )
                        nbits += 32
                        pos += 4
                    else:
                        while nbits < 32:
                            acc = (acc << 8) | (
                                data[pos] if pos < npos else 0xFF
                            )
                            pos += 1
                            nbits += 8
                hit = lut[(acc >> (nbits - 16)) & 0xFFFF]
                if hit is None:
                    raise ValueError("invalid Huffman code in entropy data")
                s_, length = hit
                nbits -= length
                if s_ == 16:  # T.81 Table H.2: diff is exactly 32768
                    acc &= (1 << nbits) - 1
                    return 32768
                if s_ > 16:
                    raise ValueError("invalid lossless difference category")
                if s_ == 0:
                    acc &= (1 << nbits) - 1
                    return 0
                nbits -= s_
                v = (acc >> nbits) & ext_sub[s_]
                acc &= (1 << nbits) - 1
                return v if v >= ext_half[s_] else v - ext_sub[s_]

            def sample(grid, y, x, y0, lut):
                row = grid[y]
                if y == y0:
                    px = default if x == 0 else row[x - 1]
                elif x == 0:
                    px = grid[y - 1][0]
                else:
                    ra = row[x - 1]
                    up = grid[y - 1]
                    if ss == 1:
                        px = ra
                    elif ss == 2:
                        px = up[x]
                    elif ss == 3:
                        px = up[x - 1]
                    elif ss == 4:
                        px = ra + up[x] - up[x - 1]
                    elif ss == 5:
                        px = ra + ((up[x] - up[x - 1]) >> 1)
                    elif ss == 6:
                        px = up[x] + ((ra - up[x - 1]) >> 1)
                    else:
                        px = (ra + up[x]) >> 1
                row[x] = (px + read_diff(lut)) & 0xFFFF

            r0 = si * rows_per_seg
            rows = range(r0, min(r0 + rows_per_seg, total_rows))
            if interleaved:
                layout = [
                    (ci, grids[ci], comps[ci]["h"], comps[ci]["v"], luts[ci])
                    for ci in sel_comps
                ]
                for my in rows:
                    for mx in range(mcux):
                        for _ci, grid, chh, cvv, lut in layout:
                            y0 = r0 * cvv
                            for bv in range(cvv):
                                for bh in range(chh):
                                    sample(
                                        grid, my * cvv + bv, mx * chh + bh,
                                        y0, lut,
                                    )
            else:
                ci = sel_comps[0]
                grid, lut = grids[ci], luts[ci]
                for y in rows:
                    for x in range(row_units):
                        sample(grid, y, x, r0, lut)

    # ---- assembly: crop real dims, point-transform shift, upsample ----
    out_dtype = np.uint8 if prec <= 8 else np.uint16
    planes = []
    for ci, c in enumerate(comps):
        if pt_of[ci] is None:
            raise ValueError(
                f"lossless frame component {c['id']} appears in no SOS"
            )
        cw = -(-(w * c["h"]) // hmax)
        chh = -(-(h * c["v"]) // vmax)
        plane = np.array(grids[ci], dtype=np.uint32)[:chh, :cw]
        if pt_of[ci]:
            plane = plane << pt_of[ci]
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1
        )
        planes.append(plane[:h, :w].astype(out_dtype))
    if len(planes) == 1:
        return planes[0]
    return np.stack(planes, -1)


def _arith_dc_decode(decode, dst, s0, low, up):
    """One DC difference (T.81 F.2.1.4 / Figures F.19, F.21-F.24):
    zero/sign decisions on the Da-conditioned 4-bin group at ``s0``,
    magnitude category up the X1.. ladder (bin 20+), magnitude bits on
    the shared bin at X+14.  Returns (diff, next conditioning group)."""
    if decode(dst, s0) == 0:
        return 0, 0
    sign = decode(dst, s0 + 1)
    st = s0 + 2 + sign
    m = decode(dst, st)
    if m:
        st = 20  # Table F.4: X1
        while decode(dst, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            st += 1
    # F.1.4.4.1.2: conditioning category for the NEXT block's DC
    if m < (1 << low) >> 1:
        ctx = 0
    elif m > (1 << up) >> 1:
        ctx = 12 + 4 * sign
    else:
        ctx = 4 + 4 * sign
    v = m
    st += 14  # the shared magnitude-bit bin
    mm = m
    while mm >> 1:
        mm >>= 1
        if decode(dst, st):
            v |= mm
    v += 1
    return (-v if sign else v), ctx


def _arith_ac_band(decode, dec_fixed, ast, row, ss, se, kx, shift):
    """AC coefficients of one block over the band [ss, se] (T.81
    F.2.1.4 / Figures F.20-F.24): per-index EOB decision at 3(k-1),
    zero/nonzero at +1, sign on the fixed equiprobable state,
    magnitude category at +2 then up the X2.. ladder based at 189
    (k <= Kx) or 217, magnitude bits on the shared bin at +14."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if decode(ast, st):
            return  # EOB
        while decode(ast, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC run past end of band")
        sign = dec_fixed()
        st += 2
        m = decode(ast, st)
        if m:
            if decode(ast, st):
                m <<= 1
                st = 189 if k <= kx else 217  # Table F.5: X2 ladders
                while decode(ast, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arithmetic AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            if decode(ast, st):
                v |= mm
        v += 1
        row[k] = (-v if sign else v) << shift
        k += 1


def _decode_seq_scan_arith(segments, units, comps, sel, dc_cond, ac_cond, ri):
    """Sequential arithmetic scan (SOF9, T.81 F.2.1.4): full-band QM
    decode of every unit.  Statistics areas, DC predictors and Da
    conditioning reset at restart boundaries (fresh decoder per
    segment); conditioning tables shared across components that
    reference the same DAC id, as the spec's per-table statistics
    areas require."""
    from .qmcoder import FIXED_BIN, QMDecoder, new_ac_stats, new_dc_stats

    params = {}
    for ci, c in enumerate(comps):
        if c["id"] in sel:
            td, ta = sel[c["id"]]
            low, up = dc_cond.get(td, (0, 1))
            params[ci] = (td, ta, low, up, ac_cond.get(ta, 5))
    fixed = bytearray([FIXED_BIN])
    u, n_units = 0, len(units)
    for seg in segments:
        dec = QMDecoder(seg)
        decode = dec.decode
        dc_stats, ac_stats = {}, {}
        for td, ta, *_ in params.values():
            dc_stats.setdefault(td, new_dc_stats())
            ac_stats.setdefault(ta, new_ac_stats())
        pred = {ci: 0 for ci in params}
        dc_ctx = {ci: 0 for ci in params}
        dec_fixed = lambda: decode(fixed, 0)  # noqa: E731
        for _ in range(min(ri or (n_units - u), n_units - u)):
            for ci, row in units[u]:
                td, ta, low, up, kx = params[ci]
                diff, dc_ctx[ci] = _arith_dc_decode(
                    decode, dc_stats[td], dc_ctx[ci], low, up
                )
                pred[ci] += diff
                row[0] = pred[ci]
                _arith_ac_band(
                    decode, dec_fixed, ac_stats[ta], row, 1, 63, kx, 0
                )
            u += 1
    if u != n_units:
        raise ValueError(f"scan ended after {u}/{n_units} MCUs")


def _decode_dc_first_arith(segments, units, sel, comps, dc_cond, al, ri):
    """Progressive first DC scan, arithmetic (T.81 G.2 over F.2.1.4):
    sequential DC decisions, coefficient stored point-shifted by Al."""
    from .qmcoder import QMDecoder, new_dc_stats

    params = {}
    for ci, c in enumerate(comps):
        if c["id"] in sel:
            td = sel[c["id"]][0]
            low, up = dc_cond.get(td, (0, 1))
            params[ci] = (td, low, up)
    u, n_units = 0, len(units)
    for seg in segments:
        dec = QMDecoder(seg)
        decode = dec.decode
        dc_stats = {}
        for td, *_ in params.values():
            dc_stats.setdefault(td, new_dc_stats())
        pred = {ci: 0 for ci in params}
        dc_ctx = {ci: 0 for ci in params}
        for _ in range(min(ri or (n_units - u), n_units - u)):
            for ci, row in units[u]:
                td, low, up = params[ci]
                diff, dc_ctx[ci] = _arith_dc_decode(
                    decode, dc_stats[td], dc_ctx[ci], low, up
                )
                pred[ci] += diff
                row[0] = pred[ci] << al
            u += 1
    if u != n_units:
        raise ValueError(f"DC scan ended after {u}/{n_units} MCUs")


def _decode_dc_refine_arith(segments, units, al, ri):
    """Progressive DC refinement, arithmetic: one equiprobable decision
    per block appends the next lower bit (T.81 G.2 / F.1.4.4.1.3)."""
    from .qmcoder import FIXED_BIN, QMDecoder

    fixed = bytearray([FIXED_BIN])
    u, n_units = 0, len(units)
    p1 = 1 << al
    for seg in segments:
        dec = QMDecoder(seg)
        for _ in range(min(ri or (n_units - u), n_units - u)):
            for _ci, row in units[u]:
                if dec.decode(fixed, 0):
                    row[0] |= p1
            u += 1
    if u != n_units:
        raise ValueError(f"DC scan ended after {u}/{n_units} MCUs")


def _decode_ac_first_arith(segments, units, ss, se, al, kx, ri):
    """Progressive first AC scan, arithmetic: the sequential AC band
    procedure over [Ss, Se] with values point-shifted by Al."""
    from .qmcoder import FIXED_BIN, QMDecoder, new_ac_stats

    fixed = bytearray([FIXED_BIN])
    u, n_units = 0, len(units)
    for seg in segments:
        dec = QMDecoder(seg)
        decode = dec.decode
        ast = new_ac_stats()
        dec_fixed = lambda: decode(fixed, 0)  # noqa: E731
        for _ in range(min(ri or (n_units - u), n_units - u)):
            for _ci, row in units[u]:
                _arith_ac_band(decode, dec_fixed, ast, row, ss, se, kx, al)
            u += 1
    if u != n_units:
        raise ValueError(f"AC scan ended after {u}/{n_units} MCUs")


def _decode_ac_refine_arith(segments, units, ss, se, al, kx, ri):
    """Progressive AC refinement, arithmetic (T.81 G.2.2 / jdarith
    conventions): per index — EOB decision only beyond the previous
    stages' last nonzero index; already-nonzero coefficients take one
    correction decision at +2; new coefficients take zero/nonzero at
    +1 then an equiprobable sign.  ``kx`` is unused by refinement (no
    magnitude ladder) but kept for signature symmetry."""
    from .qmcoder import FIXED_BIN, QMDecoder, new_ac_stats

    del kx
    fixed = bytearray([FIXED_BIN])
    u, n_units = 0, len(units)
    p1 = 1 << al
    m1 = -1 << al
    for seg in segments:
        dec = QMDecoder(seg)
        decode = dec.decode
        ast = new_ac_stats()
        for _ in range(min(ri or (n_units - u), n_units - u)):
            for _ci, row in units[u]:
                kex = se
                while kex > 0 and row[kex] == 0:
                    kex -= 1
                k = ss
                while k <= se:
                    st = 3 * (k - 1)
                    if k > kex and decode(ast, st):
                        break  # EOB
                    while True:
                        cur = row[k]
                        if cur:
                            if decode(ast, st + 2):
                                row[k] = cur + (m1 if cur < 0 else p1)
                            break
                        if decode(ast, st + 1):
                            row[k] = m1 if decode(fixed, 0) else p1
                            break
                        st += 3
                        k += 1
                        if k > se:
                            raise ValueError(
                                "arithmetic AC refinement past end of band"
                            )
                    k += 1
            u += 1
    if u != n_units:
        raise ValueError(f"AC scan ended after {u}/{n_units} MCUs")


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline-sequential or progressive JPEG → uint8 array,
    (H, W) for grayscale or (H, W, 3) RGB.

    Coefficients live in per-component PADDED raster block grids
    (mcuy·v × mcux·h blocks), so interleaved and non-interleaved scans
    address the same storage; the entropy passes are sequential Python
    (Huffman/bit streams are inherently serial) and everything after —
    dequantize, IDCT, upsample, color convert — is batched numpy over
    all blocks at once. Progressive streams (SOF2, T.81 Annex G:
    spectral selection + successive approximation, DC/AC first and
    refinement passes, EOB runs, per-scan restart intervals) decode
    into the same grids, one scan at a time."""
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    progressive = False
    restart_interval = 0
    adobe_transform: int | None = None
    scans = []  # (sel, ss, se, ah, al, data, ri, table-snapshot)

    arith = False
    dac_dc: dict[int, tuple[int, int]] = {}  # table id -> (L, U)
    dac_ac: dict[int, int] = {}  # table id -> Kx

    for marker, payload, scan_data in _parse_segments(bytes(buf)):
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            # SOF0/1 seq, SOF2 prog, SOF3 lossless (Huffman);
            # SOF9 seq, SOF10 prog (arithmetic, T.81 Annex D + F/G)
            prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            lossless = marker == 0xC3
            arith = marker in (0xC9, 0xCA)
            if lossless:
                if not 2 <= prec <= 16:
                    raise ValueError(
                        f"lossless JPEG precision {prec} outside T.81's 2..16"
                    )
            elif marker == 0xC0:
                if prec != 8:
                    raise ValueError(
                        f"baseline (SOF0) frame declares {prec}-bit precision; "
                        "T.81 baseline is 8-bit only"
                    )
            elif prec not in (8, 12):
                raise ValueError(
                    f"extended/progressive frame precision {prec}; T.81 "
                    "allows 8 or 12"
                )
            # h == 0 defers the line count to a DNL segment (B.2.5)
            if not 1 <= ncomp <= 4:
                raise ValueError(f"{ncomp}-component frame outside 1..4")
            progressive = marker in (0xC2, 0xCA)
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", payload, 1 + 5 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "prec": prec,
                     "lossless": lossless}
        elif marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
            raise _gate(f"SOF{marker - 0xC0} (hierarchical) coding")
        elif marker == 0xCB:
            raise _gate("SOF11 (arithmetic lossless) coding")
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            p = 0
            while p < len(payload):
                tc, tb = payload[p] >> 4, payload[p] & 15
                cs = payload[p + 1]
                p += 2
                if tc == 0:
                    low, up = cs & 15, cs >> 4
                    if not (0 <= low <= up <= 15):
                        raise ValueError(
                            f"DAC DC conditioning L={low} > U={up}"
                        )
                    dac_dc[tb] = (low, up)
                else:
                    if not 1 <= cs <= 63:
                        raise ValueError(f"DAC AC conditioning Kx={cs}")
                    dac_ac[tb] = cs
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq_, tq = payload[p] >> 4, payload[p] & 15
                p += 1
                if pq_ == 0:
                    tab = np.frombuffer(payload, np.uint8, 64, p).astype(np.int64)
                    p += 64
                else:
                    tab = np.frombuffer(payload, ">u2", 64, p).astype(np.int64)
                    p += 128
                # table arrives in zig-zag order; store raster order
                raster = np.empty(64, np.int64)
                raster[ZIGZAG] = tab
                qtables[tq] = raster
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 15
                bits = list(payload[p + 1 : p + 17])
                nval = sum(bits)
                values = list(payload[p + 17 : p + 17 + nval])
                htables[(tc, th)] = _huff_table(bits, values)
                p += 17 + nval
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDC:  # DNL: deferred line count (B.2.5)
            if frame is None or not scans:
                raise ValueError("DNL segment before the first scan")
            (nl,) = struct.unpack_from(">H", payload, 0)
            if nl == 0:
                raise ValueError("DNL declares zero lines")
            if frame["h"] == 0:
                frame["h"] = nl
        elif marker == 0xEE and payload[:5] == b"Adobe":  # APP14
            adobe_transform = payload[11]
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            sel = {}
            for i in range(ns):
                cs, tdta = struct.unpack_from(">BB", payload, 1 + 2 * i)
                sel[cs] = (tdta >> 4, tdta & 15)
            ss, se, ahl = struct.unpack_from(">BBB", payload, 1 + 2 * ns)
            ah, al = ahl >> 4, ahl & 15
            if frame is not None and frame["lossless"]:
                if not 1 <= ss <= 7 or se != 0 or ah != 0:
                    raise ValueError(
                        "lossless scan needs predictor Ss in 1..7, Se=0, "
                        f"Ah=0 (got Ss={ss}, Se={se}, Ah={ah})"
                    )
            elif not progressive and ((ss, se) != (0, 63) or ahl != 0):
                raise ValueError(
                    "sequential frame with non-full spectral selection"
                )
            # tables are mutable between scans (DHT/DAC/DRI may
            # interleave): snapshot the CURRENT tables + restart interval
            scans.append(
                (sel, ss, se, ah, al, scan_data, restart_interval,
                 dict(htables), (dict(dac_dc), dict(dac_ac)))
            )
            # NO early break on sequential frames: T.81 allows a
            # sequential frame to spread its components over several
            # scans (one SOS per component is a layout real encoders
            # emit) — keep collecting every scan to EOI

    if frame is None or not scans:
        raise ValueError("JPEG stream has no SOF/SOS")
    if frame["h"] == 0:
        raise ValueError(
            "SOF declares height 0 and no DNL segment follows the scan"
        )
    comps = frame["comps"]
    if not progressive:
        # every frame component must be entropy-coded by some scan;
        # a gap would silently IDCT to a flat 128 plane
        scanned = {cid for sel, *_ in scans for cid in sel}
        missing = [c["id"] for c in comps if c["id"] not in scanned]
        if missing:
            raise ValueError(
                f"sequential frame components {missing} appear in no SOS"
            )
    if frame["lossless"]:
        return _decode_lossless_frame(frame, scans)
    prec = frame["prec"]
    center = 1 << (prec - 1)
    maxval = (1 << prec) - 1
    out_dtype = np.uint8 if prec == 8 else np.uint16
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 4 and 1 <= c["v"] <= 4 for c in comps):
        raise ValueError("sampling factors out of the 1-4 range")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component zig-zag coefficient store: PADDED raster block grid,
    # one row per block at flat index by*(mcux*h) + bx
    coef = [
        np.zeros((mcuy * c["v"] * mcux * c["h"], 64), np.int64)
        for c in comps
    ]
    for c in comps:
        if c["tq"] not in qtables:
            raise ValueError(f"missing quantization table {c['tq']}")

    def _units(sel_comps: list[int]) -> list[list[tuple[int, np.ndarray]]]:
        """Decoding units in scan order: MCUs of interleaved blocks when
        the scan holds >1 component, single blocks over the component's
        REAL (unpadded) grid otherwise (T.81 A.2)."""
        if len(sel_comps) > 1:
            out = []
            for my in range(mcuy):
                for mx in range(mcux):
                    unit = []
                    for ci in sel_comps:
                        cc = comps[ci]
                        gw = mcux * cc["h"]
                        for bv in range(cc["v"]):
                            for bh in range(cc["h"]):
                                idx = (my * cc["v"] + bv) * gw + (
                                    mx * cc["h"] + bh
                                )
                                unit.append((ci, coef[ci][idx]))
                    out.append(unit)
            return out
        ci = sel_comps[0]
        cc = comps[ci]
        gw = mcux * cc["h"]
        # non-interleaved scans cover the component's REAL grid:
        # ceil(ceil(dim * sampling / max_sampling) / 8) blocks per axis
        cw = -(-(w * cc["h"]) // hmax)
        chh = -(-(h * cc["v"]) // vmax)
        nbw = -(-cw // 8)
        nbh = -(-chh // 8)
        return [
            [(ci, coef[ci][by * gw + bx])]
            for by in range(nbh)
            for bx in range(nbw)
        ]

    for sel, ss, se, ah, al, scan_data, ri, tabs, dac in scans:
        sel_comps = [ci for ci, c in enumerate(comps) if c["id"] in sel]
        if len(sel_comps) != len(sel):
            raise ValueError("SOS references a component not in the frame")
        units = _units(sel_comps)
        segments = _scan_segments(scan_data, ri)
        if not progressive:
            if arith:
                _decode_seq_scan_arith(
                    segments, units, comps, sel, dac[0], dac[1], ri
                )
            else:
                _decode_seq_scan(segments, units, comps, sel, tabs, ri)
            continue
        if ss == 0:  # DC scan (Se must be 0 in progressive)
            if se != 0:
                raise ValueError("progressive DC scan with Se != 0")
            if ah == 0:
                if arith:
                    _decode_dc_first_arith(
                        segments, units, sel, comps, dac[0], al, ri
                    )
                else:
                    _decode_dc_first(segments, units, sel, comps, tabs, al, ri)
            elif arith:
                _decode_dc_refine_arith(segments, units, al, ri)
            else:
                _decode_dc_refine(segments, units, al, ri)
        else:  # AC scan: exactly one component
            if len(sel_comps) != 1:
                raise ValueError("progressive AC scan with >1 component")
            ta = sel[comps[sel_comps[0]]["id"]][1]
            if arith:
                kx = dac[1].get(ta, 5)
                if ah == 0:
                    _decode_ac_first_arith(segments, units, ss, se, al, kx, ri)
                else:
                    _decode_ac_refine_arith(segments, units, ss, se, al, kx, ri)
                continue
            if (1, ta) not in tabs:
                raise ValueError("missing AC Huffman table referenced by SOS")
            if ah == 0:
                _decode_ac_first(segments, units, ss, se, al, tabs[(1, ta)], ri)
            else:
                _decode_ac_refine(segments, units, ss, se, al, tabs[(1, ta)], ri)

    # ---- batched dequantize + IDCT + assembly (numpy, all blocks) ----
    planes = []
    for ci, c in enumerate(comps):
        q = qtables[c["tq"]]
        blocks = np.zeros((coef[ci].shape[0], 64), np.float64)
        blocks[:, ZIGZAG] = coef[ci]  # zig-zag -> raster
        blocks *= q[np.newaxis, :]
        b8 = blocks.reshape(-1, 8, 8)
        # IDCT = A.T @ B @ A per block; fixed matmuls (einsum's per-call
        # path search costs more than the 8x8 contraction itself)
        pix = np.matmul(np.matmul(_DCT_T.T, b8), _DCT_T)
        pix = np.clip(np.round(pix) + center, 0, maxval)
        # raster-grid blocks -> component plane
        ch, cv = c["h"], c["v"]
        gy, gx = mcuy * cv, mcux * ch
        plane = pix.reshape(gy, gx, 8, 8).transpose(0, 2, 1, 3).reshape(
            gy * 8, gx * 8
        )
        # replicate-upsample to full resolution, crop to (h, w)
        plane = np.repeat(np.repeat(plane, vmax // cv, 0), hmax // ch, 1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0].astype(out_dtype)
    c0 = float(center)
    if len(planes) == 2:  # no defined color space: planes as stored
        return np.clip(
            np.round(np.stack(planes, -1)), 0, maxval
        ).astype(out_dtype)
    if len(planes) == 4:
        # CMYK/YCCK (libjpeg conventions): Adobe transform 2 is YCCK —
        # YCbCr-invert the first three planes and complement against
        # maxval, K passes through; transform 0 / no marker is CMYK as
        # stored.  Any application-level Adobe inversion is the
        # caller's business — we only remove the declared transform.
        if adobe_transform == 2:
            y, cb, cr, k = planes
            r = y + 1.402 * (cr - c0)
            g = y - 0.344136 * (cb - c0) - 0.714136 * (cr - c0)
            b = y + 1.772 * (cb - c0)
            cmyk = np.stack([maxval - r, maxval - g, maxval - b, k], -1)
        else:
            cmyk = np.stack(planes, -1)
        return np.clip(np.round(cmyk), 0, maxval).astype(out_dtype)
    # color: JFIF default is YCbCr; Adobe transform 0 means plain RGB
    if adobe_transform == 0:
        rgb = np.stack(planes, -1)
        return np.clip(np.round(rgb), 0, maxval).astype(out_dtype)
    y, cb, cr = planes
    r = y + 1.402 * (cr - c0)
    g = y - 0.344136 * (cb - c0) - 0.714136 * (cr - c0)
    b = y + 1.772 * (cb - c0)
    return np.clip(
        np.round(np.stack([r, g, b], -1)), 0, maxval
    ).astype(out_dtype)


# ----------------------------------------------------------------- encode


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _enc_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for encoding. Memoized — encoders reuse
    the same fixed tables (Annex K or `_flat_table`) for every file."""
    key = (bytes(bits), bytes(values))
    cached = _ENC_CACHE.get(key)
    if cached is not None:
        return cached
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    if len(_ENC_CACHE) < 512:
        _ENC_CACHE[key] = out
    return out


_ENC_CACHE: dict[tuple[bytes, bytes], dict[int, tuple[int, int]]] = {}


def _magnitude(v: int) -> tuple[int, int]:
    """(category s, s-bit field) for a signed DC diff / AC value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def quality_tables(quality: int = 75) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the libjpeg quality formula (public
    IJG code, jcparam.c) — quality 50 yields the unscaled tables."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255))
    return out[0], out[1]


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) -> (n_blocks, 8, 8) DCT coefs,
    blocks in raster order."""
    h, w = plane.shape
    b = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    # FDCT = A @ B @ A.T per block (see the matching matmul IDCT note)
    return np.matmul(np.matmul(_DCT_T, b), _DCT_T.T)


def _arith_encode_dc(code, dst, s0, diff, low, up):
    """Encode one DC difference (T.81 F.1.4.4.1 / Figures F.4, F.6-F.9);
    mirror of ``_arith_dc_decode``.  Returns the next conditioning
    group for this component."""
    if diff == 0:
        code(dst, s0, 0)
        return 0
    code(dst, s0, 1)
    sign = 0 if diff > 0 else 1
    code(dst, s0 + 1, sign)
    v = (diff if diff > 0 else -diff) - 1
    st = s0 + 2 + sign
    m = 0
    if v:
        code(dst, st, 1)
        m = 1
        st = 20  # Table F.4: X1
        v2 = v
        while v2 >> 1:
            v2 >>= 1
            code(dst, st, 1)
            m <<= 1
            st += 1
    code(dst, st, 0)
    if m < (1 << low) >> 1:
        ctx = 0
    elif m > (1 << up) >> 1:
        ctx = 12 + 4 * sign
    else:
        ctx = 4 + 4 * sign
    st += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        code(dst, st, 1 if v & mm else 0)
    return ctx


def _arith_encode_ac_band(code, enc_fixed, ast, zz, ss, se, kx):
    """Encode one block's AC band [ss, se] (T.81 F.1.4.4.2 / Figures
    F.5-F.9); mirror of ``_arith_ac_band``."""
    ke = se
    while ke >= ss and zz[ke] == 0:
        ke -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        code(ast, st, 0)  # not EOB yet
        while zz[k] == 0:
            code(ast, st + 1, 0)
            st += 3
            k += 1
        code(ast, st + 1, 1)
        v = zz[k]
        sign = 0 if v > 0 else 1
        enc_fixed(sign)
        if sign:
            v = -v
        v -= 1
        st += 2
        m = 0
        if v:
            code(ast, st, 1)
            m = 1
            v2 = v
            if v2 >> 1:
                v2 >>= 1
                code(ast, st, 1)
                m <<= 1
                st = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    code(ast, st, 1)
                    m <<= 1
                    st += 1
        code(ast, st, 0)
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            code(ast, st, 1 if v & mm else 0)
        k += 1
    if ke < se:
        code(ast, 3 * (k - 1), 1)  # EOB


def _stuff_ff(data: bytes) -> bytes:
    """JPEG byte stuffing: a zero byte after every 0xFF (B.1.1.5)."""
    return data.replace(b"\xff", b"\xff\x00")


def _encode_arith_entropy(qlists, comps, n_blocks, restart_interval) -> bytes:
    """QM-coded interleaved entropy data for a sequential (SOF9) scan;
    statistics, predictors and conditioning reset at restart markers,
    each segment flushed and stuffed independently."""
    from .qmcoder import FIXED_BIN, QMEncoder, new_ac_stats, new_dc_stats

    nc = len(comps)
    fixed = bytearray([FIXED_BIN])
    out = bytearray()

    def _fresh():
        enc = QMEncoder()
        dstats, astats = {}, {}
        for _, _, td, ta in comps:
            dstats.setdefault(td, new_dc_stats())
            astats.setdefault(ta, new_ac_stats())
        return enc, dstats, astats, [0] * nc, [0] * nc

    enc, dstats, astats, pred, dcctx = _fresh()
    rst = 0
    for t in range(n_blocks):
        if restart_interval and t and t % restart_interval == 0:
            out += _stuff_ff(enc.flush())
            out += bytes((0xFF, 0xD0 + (rst & 7)))
            rst += 1
            enc, dstats, astats, pred, dcctx = _fresh()
        code = enc.encode
        for ci in range(nc):
            _cid, _tq, td, ta = comps[ci]
            zz = qlists[ci][t]
            dc = zz[0]
            diff = dc - pred[ci]
            pred[ci] = dc
            dcctx[ci] = _arith_encode_dc(
                code, dstats[td], dcctx[ci], diff, 0, 1
            )
            _arith_encode_ac_band(
                code, lambda d: code(fixed, 0, d), astats[ta], zz, 1, 63, 5
            )
    out += _stuff_ff(enc.flush())
    return bytes(out)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 75,
    restart_interval: int = 0,
    precision: int = 8,
    cmyk_transform: int = 0,
    arithmetic: bool = False,
) -> bytes:
    """Encode uint8 (H, W) grayscale or (H, W, 3) RGB as a baseline
    sequential JPEG (grayscale single-component, or 4:4:4 YCbCr).

    ``precision=12`` encodes the T.81 EXTENDED sequential process
    (SOF1) from uint16 samples below 4096: level shift 2^11, the same
    Annex K quantizers, and flat Huffman tables covering the wider
    12-bit categories (DC SSSS 0..15, AC size 1..14 per Table F.1,
    which Annex K's 8-bit 'typical' tables do not).

    (H, W, 4) input is CMYK: four 4:4:4 components plus an Adobe APP14
    marker carrying ``cmyk_transform`` — 0 stores the planes as given,
    2 stores YCCK (forward YCbCr over the maxval-complemented CMY
    planes, K untouched; the libjpeg convention `decode_jpeg`
    inverts)."""
    img = np.asarray(img)
    if precision == 8:
        if img.dtype != np.uint8:
            raise ValueError("encode_jpeg wants uint8 at precision 8")
    elif precision == 12:
        if img.dtype != np.uint16:
            raise ValueError("encode_jpeg wants uint16 at precision 12")
        if img.size and int(img.max()) >> 12:
            raise ValueError("12-bit sample out of range")
    else:
        raise ValueError("DCT precision must be 8 or 12 (T.81)")
    if img.ndim == 2:
        gray = True
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        gray = False
    else:
        raise ValueError("encode_jpeg wants (H, W), (H, W, 3) or (H, W, 4)")
    cmyk = img.ndim == 3 and img.shape[2] == 4
    if cmyk_transform not in (0, 2):
        raise ValueError("cmyk_transform must be 0 (CMYK) or 2 (YCCK)")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qluma, qchroma = quality_tables(quality)

    # pad to 8×8 multiples by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    pad = [(0, ph - h), (0, pw - w)] + ([(0, 0)] if not gray else [])
    padded = np.pad(img.astype(np.float64), pad, mode="edge")

    center = float(1 << (precision - 1))
    maxv = float((1 << precision) - 1)
    if gray:
        planes = [padded - center]
        qts = [qluma]
        comps = [(1, 0, 0, 0)]  # (id, tq, td, ta)
    elif cmyk:
        c_, m_, ye, k_ = (padded[..., i] for i in range(4))
        if cmyk_transform == 2:  # YCCK: YCbCr over complemented CMY
            r, g, b = maxv - c_, maxv - m_, maxv - ye
            p0 = 0.299 * r + 0.587 * g + 0.114 * b
            p1 = -0.168736 * r - 0.331264 * g + 0.5 * b + center
            p2 = 0.5 * r - 0.418688 * g - 0.081312 * b + center
        else:
            p0, p1, p2 = c_, m_, ye
        planes = [p0 - center, p1 - center, p2 - center, k_ - center]
        qts = [qluma] * 4
        comps = [(1, 0, 0, 0), (2, 0, 0, 0), (3, 0, 0, 0), (4, 0, 0, 0)]
    else:
        r, g, b = padded[..., 0], padded[..., 1], padded[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + center
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + center
        planes = [y - center, cb - center, cr - center]
        qts = [qluma, qchroma, qchroma]
        comps = [(1, 0, 0, 0), (2, 1, 1, 1), (3, 1, 1, 1)]

    # quantized zig-zag coefficients per component (blocks in raster order,
    # which IS MCU order at 4:4:4 / single-component)
    qcoef = []
    for plane, qt in zip(planes, qts):
        f = _fdct_blocks(plane).reshape(-1, 64)
        qz = np.round(f / qt[np.newaxis, :]).astype(np.int64)
        qcoef.append(qz[:, ZIGZAG])  # raster -> zig-zag scan order

    out = bytearray(b"\xff\xd8")  # SOI
    if precision == 8 and not cmyk:
        # JFIF APP0 (JFIF is defined for 8-bit 1/3-component streams)
        out += (
            b"\xff\xe0"
            + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HHBB", 1, 1, 0, 0)
        )
    if cmyk:
        # Adobe APP14: version 100, flags 0, the color transform byte
        out += (
            b"\xff\xee"
            + struct.pack(">H", 14)
            + b"Adobe"
            + struct.pack(">HHHB", 100, 0, 0, cmyk_transform)
        )
    # DQT (zig-zag order on the wire)
    for tq, qt in enumerate(qts[:1] if (gray or cmyk) else qts[:2]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(v) for v in qt[ZIGZAG]
        )
    # SOF0 (baseline, 8-bit), SOF1 (extended sequential, 12-bit) or
    # SOF9 (arithmetic extended sequential, 8/12-bit)
    nc = len(comps)
    if arithmetic:
        sof = b"\xff\xc9"
    else:
        sof = b"\xff\xc0" if precision == 8 else b"\xff\xc1"
    out += sof + struct.pack(">HBHHB", 8 + 3 * nc, precision, h, w, nc)
    for cid, tq, _, _ in comps:
        out += struct.pack(">BBB", cid, 0x11, tq)  # h=v=1 (4:4:4)
    two_tables = not gray and not cmyk
    enc_tabs = {}
    if arithmetic:
        # DAC (B.2.4.3): the T.81 default conditioning, stated
        # explicitly — DC L=0/U=1 (Cs=0x10), AC Kx=5
        dac = [(0x00, 0x10), (0x10, 5)]
        if two_tables:
            dac += [(0x01, 0x10), (0x11, 5)]
        out += b"\xff\xcc" + struct.pack(">H", 2 + 2 * len(dac))
        for tctb, cs in dac:
            out += struct.pack(">BB", tctb, cs)
    elif precision == 8:
        # DHT: Annex K typical tables cover 8-bit categories only (DC
        # SSSS <= 11, AC size <= 10)
        hts = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
        if two_tables:
            hts += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    else:
        # 12-bit needs DC 0..15 and AC size 1..14 (Table F.1) — flat
        # canonical tables there
        dc12 = _flat_table(list(range(16)))
        ac12 = _flat_table(
            [0x00, 0xF0]
            + [(r << 4) | s for r in range(16) for s in range(1, 15)]
        )
        hts = [(0x00, dc12), (0x10, ac12)]
        if two_tables:
            hts += [(0x01, dc12), (0x11, ac12)]
    if not arithmetic:
        for tcth, (bits, values) in hts:
            out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tcth)
            out += bytes(bits) + bytes(values)
            enc_tabs[tcth] = _enc_table(bits, values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for cid, _, td, ta in comps:
        out += struct.pack(">BB", cid, (td << 4) | ta)
    out += struct.pack(">BBB", 0, 63, 0)

    # entropy-coded data: interleaved MCUs (one block per component).
    # The bit writer is inlined as local ints (same `_BitWriter`
    # semantics: MSB-first, FF 00 stuffing, 1-bit flush padding) and the
    # coefficient rows iterate as Python lists — this loop dominates
    # whole-file encode cost and numpy scalar reads per coefficient
    # cost ~3x.
    n_blocks = qcoef[0].shape[0]
    qlists = [q.tolist() for q in qcoef]
    if arithmetic:
        out += _encode_arith_entropy(qlists, comps, n_blocks,
                                     restart_interval)
        out += b"\xff\xd9"  # EOI
        return bytes(out)
    ctabs = [
        (enc_tabs[td], enc_tabs[0x10 | ta]) for _, _, td, ta in comps
    ]
    ebuf = bytearray()
    eappend = ebuf.append
    acc = nbits = 0
    pred = [0] * nc
    rst = 0
    for t in range(n_blocks):
        if restart_interval and t and t % restart_interval == 0:
            if nbits:  # flush: pad to byte with 1-bits (stuffed if FF)
                pad = 8 - nbits
                b = ((acc << pad) | ((1 << pad) - 1)) & 0xFF
                eappend(b)
                if b == 0xFF:
                    eappend(0)
                acc = nbits = 0
            eappend(0xFF)
            eappend(0xD0 + (rst & 7))
            rst += 1
            pred = [0] * nc
        for ci in range(nc):
            dc_tab, ac_tab = ctabs[ci]
            zz = qlists[ci][t]
            dc = zz[0]
            diff = dc - pred[ci]
            pred[ci] = dc
            if diff == 0:
                s = field = 0
            else:
                s = (diff if diff > 0 else -diff).bit_length()
                field = diff if diff >= 0 else diff + (1 << s) - 1
            code, ln = dc_tab[s]
            acc = (acc << (ln + s)) | (code << s) | field
            nbits += ln + s
            while nbits >= 8:
                nbits -= 8
                b = (acc >> nbits) & 0xFF
                eappend(b)
                if b == 0xFF:
                    eappend(0)
            acc &= (1 << nbits) - 1
            run = 0
            for k in range(1, 64):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tab[0xF0]  # ZRL
                    acc = (acc << ln) | code
                    nbits += ln
                    run -= 16
                s = (v if v > 0 else -v).bit_length()
                field = v if v >= 0 else v + (1 << s) - 1
                code, ln = ac_tab[(run << 4) | s]
                acc = (acc << (ln + s)) | (code << s) | field
                nbits += ln + s
                while nbits >= 8:
                    nbits -= 8
                    b = (acc >> nbits) & 0xFF
                    eappend(b)
                    if b == 0xFF:
                        eappend(0)
                acc &= (1 << nbits) - 1
                run = 0
            if run:
                code, ln = ac_tab[0x00]  # EOB
                acc = (acc << ln) | code
                nbits += ln
                while nbits >= 8:
                    nbits -= 8
                    b = (acc >> nbits) & 0xFF
                    eappend(b)
                    if b == 0xFF:
                        eappend(0)
                acc &= (1 << nbits) - 1
    if nbits:  # final flush: pad with 1-bits
        pad = 8 - nbits
        b = ((acc << pad) | ((1 << pad) - 1)) & 0xFF
        eappend(b)
        if b == 0xFF:
            eappend(0)
    out += ebuf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _flat_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """A valid canonical Huffman table with every symbol at 8 bits —
    deliberately non-optimal (fixture compression is irrelevant) but
    legal for any symbol set up to 255 entries, which Annex K's
    sequential AC tables are NOT for progressive EOBn symbols (0x10,
    0x20, … are undefined there)."""
    syms = sorted(set(symbols))
    if len(syms) > 255:
        raise ValueError("too many symbols for a flat 8-bit table")
    bits = [0] * 16
    bits[7] = len(syms)
    return bits, syms


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 50, arithmetic: bool = False
) -> bytes:
    """Encode uint8 (H, W) grayscale or (H, W, 3) RGB as a REAL
    progressive JPEG (SOF2, T.81 Annex G), 4:4:4, with the scan script

    1. DC first scan, interleaved, successive approximation Al=1
       (diff-coded over the point-transformed ``dc >> 1`` values);
    2. one AC first scan per component, Ss=1..Se=63, Al=0, EOB-RUN
       coded (all-zero-band blocks accumulate into EOBn symbols —
       the decoder path sequential streams never exercise);
    3. DC refinement scan, interleaved, Ah=1/Al=0 (one raw bit per
       block).

    DC uses the Annex K DC tables; each AC scan carries its own flat
    8-bit Huffman table because EOBn symbols don't exist in the Annex K
    sequential AC tables. Because Al=0 for the AC scans and the DC
    refinement restores the low DC bit exactly, decode reproduces the
    same quantized coefficients as the baseline encoder at the same
    quality — the exact-subspace fixtures (x65) stay exact through the
    progressive path (x88).

    ``arithmetic=True`` emits the SAME scan script as a progressive
    ARITHMETIC frame (SOF10, QM-coded per Annex D + G.2 over F.1.4):
    DAC conditioning replaces the Huffman tables (default L=0/U=1,
    Kx=5), the DC first scan codes point-transformed diffs through the
    adaptive DC decision tree, AC first scans run the F.1.4.4.2 band
    procedure (EOB decision per index — arithmetic coding has no EOBn
    run symbols), and the DC refinement scan is one equiprobable
    (fixed-state) decision per block."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive wants uint8")
    if img.ndim == 2:
        gray = True
    elif img.ndim == 3 and img.shape[2] == 3:
        gray = False
    else:
        raise ValueError("encode_jpeg_progressive wants (H, W) or (H, W, 3)")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qluma, qchroma = quality_tables(quality)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    pad = [(0, ph - h), (0, pw - w)] + ([(0, 0)] if not gray else [])
    padded = np.pad(img.astype(np.float64), pad, mode="edge")

    if gray:
        planes = [padded - 128.0]
        qts = [qluma]
        comps = [(1, 0)]  # (id, tq)
    else:
        r, g, b = padded[..., 0], padded[..., 1], padded[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qts = [qluma, qchroma, qchroma]
        comps = [(1, 0), (2, 1), (3, 1)]
    nc = len(comps)
    qcoef = []
    for plane, qt in zip(planes, qts):
        f = _fdct_blocks(plane).reshape(-1, 64)
        qz = np.round(f / qt[np.newaxis, :]).astype(np.int64)
        qcoef.append(qz[:, ZIGZAG])
    n_blocks = qcoef[0].shape[0]

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    for tq, qt in enumerate(qts[:1] if gray else qts[:2]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(v) for v in qt[ZIGZAG]
        )
    out += (b"\xff\xca" if arithmetic else b"\xff\xc2") + struct.pack(
        ">HBHHB", 8 + 3 * nc, 8, h, w, nc
    )
    for cid, tq in comps:
        out += struct.pack(">BBB", cid, 0x11, tq)  # 4:4:4

    def _dht(tcth: int, bits: list[int], values: list[int]) -> bytes:
        return (
            b"\xff\xc4"
            + struct.pack(">HB", 19 + len(values), tcth)
            + bytes(bits)
            + bytes(values)
        )

    def _sos(comp_sel: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
        seg = struct.pack(">HB", 6 + 2 * len(comp_sel), len(comp_sel))
        for cid, td, ta in comp_sel:
            seg += struct.pack(">BB", cid, (td << 4) | ta)
        seg += struct.pack(">BBB", ss, se, (ah << 4) | al)
        return b"\xff\xda" + seg

    if arithmetic:
        # DAC (B.2.4.3): default DC conditioning L=0/U=1 per td, one
        # AC table (Kx=5) shared by every AC scan
        dac = [(0x00, 0x10), (0x10, 5)]
        if not gray:
            dac.insert(1, (0x01, 0x10))
        out += b"\xff\xcc" + struct.pack(">H", 2 + 2 * len(dac))
        for tctb, cs in dac:
            out += struct.pack(">BB", tctb, cs)
        from .qmcoder import FIXED_BIN, QMEncoder, new_ac_stats, new_dc_stats

        fixed = bytearray([FIXED_BIN])

    # ---- scan 1: interleaved DC first, Al=1 ----
    if not arithmetic:
        out += _dht(0x00, *HUFF_DC_LUMA)
        if not gray:
            out += _dht(0x01, *HUFF_DC_CHROMA)
        dc_enc = [
            _enc_table(*(HUFF_DC_LUMA if ci == 0 else HUFF_DC_CHROMA))
            for ci in range(nc)
        ]
    out += _sos([(cid, 0 if i == 0 else 1, 0) for i, (cid, _) in enumerate(comps)],
                0, 0, 0, 1)
    if arithmetic:
        enc = QMEncoder()
        code = enc.encode
        dstats = {0: new_dc_stats()}
        if not gray:
            dstats[1] = new_dc_stats()
        pred = [0] * nc
        dcctx = [0] * nc
        for t in range(n_blocks):
            for ci in range(nc):
                v = int(qcoef[ci][t][0]) >> 1  # point transform (Al=1)
                dcctx[ci] = _arith_encode_dc(
                    code, dstats[0 if ci == 0 else 1], dcctx[ci],
                    v - pred[ci], 0, 1,
                )
                pred[ci] = v
        out += _stuff_ff(enc.flush())
    else:
        wr = _BitWriter()
        pred = [0] * nc
        for t in range(n_blocks):
            for ci in range(nc):
                v = int(qcoef[ci][t][0]) >> 1  # point transform (Al=1)
                s, field = _magnitude(v - pred[ci])
                pred[ci] = v
                code, ln = dc_enc[ci][s]
                wr.write(code, ln)
                if s:
                    wr.write(field, s)
        wr.flush()
        out += wr.out

    # ---- per-component AC first scans, Ss=1..63, Al=0, EOB-run coded ----
    for ci, (cid, _tq) in enumerate(comps):
        if arithmetic:
            # F.1.4.4.2 band procedure per block (per-index EOB
            # decisions; arithmetic coding has no EOBn run symbols)
            out += _sos([(cid, 0, 0)], 1, 63, 0, 0)
            enc = QMEncoder()
            code = enc.encode
            ast = new_ac_stats()
            enc_fixed = lambda d: code(fixed, 0, d)  # noqa: E731
            qlist = qcoef[ci].tolist()
            for t in range(n_blocks):
                _arith_encode_ac_band(
                    code, enc_fixed, ast, qlist[t], 1, 63, 5
                )
            out += _stuff_ff(enc.flush())
            continue
        events: list[tuple[int, int, int]] = []  # (symbol, extra, nbits)
        eobrun = 0

        def _flush_eob():
            nonlocal eobrun
            while eobrun:
                run = min(eobrun, 32767)
                r = run.bit_length() - 1  # 1<<r <= run
                events.append(((r << 4) | 0, run - (1 << r), r))
                eobrun -= run

        for t in range(n_blocks):
            zz = qcoef[ci][t]
            nz = [k for k in range(1, 64) if zz[k]]
            if not nz:
                eobrun += 1
                continue
            _flush_eob()
            k = 1
            for pos in nz:
                run = pos - k
                while run > 15:
                    events.append((0xF0, 0, 0))  # ZRL
                    run -= 16
                s, field = _magnitude(int(zz[pos]))
                events.append(((run << 4) | s, field, s))
                k = pos + 1
            if k <= 63:
                eobrun += 1  # this block's trailing zeros start a run
        _flush_eob()
        bits, values = _flat_table([sym for sym, _, _ in events] or [0x00])
        out += _dht(0x10 + ci, bits, values)
        enc = _enc_table(bits, values)
        out += _sos([(cid, 0, ci)], 1, 63, 0, 0)
        wr = _BitWriter()
        for sym, extra, nbits in events:
            code, ln = enc[sym]
            wr.write(code, ln)
            if nbits:
                wr.write(extra, nbits)
        wr.flush()
        out += wr.out

    # ---- final scan: interleaved DC refinement, Ah=1, Al=0 ----
    out += _sos([(cid, 0, 0) for cid, _ in comps], 0, 0, 1, 0)
    if arithmetic:
        # one equiprobable decision per block (F.1.4.4.1.3)
        enc = QMEncoder()
        for t in range(n_blocks):
            for ci in range(nc):
                enc.encode(fixed, 0, int(qcoef[ci][t][0]) & 1)
        out += _stuff_ff(enc.flush())
    else:
        wr = _BitWriter()
        for t in range(n_blocks):
            for ci in range(nc):
                wr.write(int(qcoef[ci][t][0]) & 1, 1)
        wr.flush()
        out += wr.out

    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_lossless(
    img: np.ndarray,
    predictor: int = 1,
    point_transform: int = 0,
    precision: int | None = None,
    restart_rows: int = 0,
) -> bytes:
    """Encode a REAL lossless JPEG (SOF3, T.81 Annex H, process 14).

    ``img`` is uint8 or uint16, (H, W) or (H, W, C) with 1-4 components
    (all coded 1x1, one interleaved scan — the layout DNG/DICOM
    producers emit).  ``precision`` defaults to 8 for uint8 and 16 for
    uint16 input and may be any of T.81's 2..16; every sample must be
    below 2^precision.  ``point_transform`` (Pt) drops that many low
    bits before prediction (decode shifts back, so round-trip equals
    ``img >> Pt << Pt``).  ``restart_rows`` > 0 emits an RSTn marker
    every that-many sample rows (DRI = rows x width MCUs — always a
    whole number of lines, per the H.2.2 prediction-boundary rule).
    Difference coding uses a single flat 8-bit Huffman table over the
    17 categories (fixture compression is irrelevant; the table is
    legal for any stream).  `decode_jpeg` round-trips bit-exactly."""
    img = np.asarray(img)
    if img.dtype not in (np.uint8, np.uint16):
        raise ValueError("encode_jpeg_lossless wants uint8 or uint16")
    if img.ndim == 2:
        arr = img[:, :, np.newaxis]
    elif img.ndim == 3 and 1 <= img.shape[2] <= 4:
        arr = img
    else:
        raise ValueError(
            "encode_jpeg_lossless wants (H, W) or (H, W, 1..4)"
        )
    h, w, nc = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if precision is None:
        precision = 8 if img.dtype == np.uint8 else 16
    if not 2 <= precision <= 16:
        raise ValueError("lossless precision must be in 2..16 (T.81)")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor (Ss) must be in 1..7")
    if not 0 <= point_transform < precision:
        raise ValueError("point transform must be in 0..precision-1")
    if int(arr.max()) >> precision:
        raise ValueError(
            f"sample {int(arr.max())} does not fit {precision}-bit precision"
        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xc3" + struct.pack(">HBHHB", 8 + 3 * nc, precision, h, w, nc)
    for ci in range(nc):
        out += struct.pack(">BBB", ci + 1, 0x11, 0)
    bits, values = _flat_table(list(range(17)))
    out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), 0x00)
    out += bytes(bits) + bytes(values)
    if restart_rows:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_rows * w)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += struct.pack(">BB", ci + 1, 0x00)
    out += struct.pack(">BBB", predictor, 0, point_transform)

    tab = _enc_table(bits, values)
    default = 1 << (precision - point_transform - 1)
    planes = [
        (arr[:, :, ci].astype(np.int64) >> point_transform).tolist()
        for ci in range(nc)
    ]
    ebuf = bytearray()
    eappend = ebuf.append
    acc = nbits = 0
    rst = 0
    y0 = 0  # first row of the current restart segment
    for y in range(h):
        if restart_rows and y and y % restart_rows == 0:
            if nbits:  # byte-align with 1-bit padding (stuffed if FF)
                pad = 8 - nbits
                b = ((acc << pad) | ((1 << pad) - 1)) & 0xFF
                eappend(b)
                if b == 0xFF:
                    eappend(0)
                acc = nbits = 0
            eappend(0xFF)
            eappend(0xD0 + (rst & 7))
            rst += 1
            y0 = y
        for x in range(w):
            for plane in planes:
                row = plane[y]
                if y == y0:
                    px = default if x == 0 else row[x - 1]
                elif x == 0:
                    px = plane[y - 1][0]
                else:
                    ra = row[x - 1]
                    up = plane[y - 1]
                    if predictor == 1:
                        px = ra
                    elif predictor == 2:
                        px = up[x]
                    elif predictor == 3:
                        px = up[x - 1]
                    elif predictor == 4:
                        px = ra + up[x] - up[x - 1]
                    elif predictor == 5:
                        px = ra + ((up[x] - up[x - 1]) >> 1)
                    elif predictor == 6:
                        px = up[x] + ((ra - up[x - 1]) >> 1)
                    else:
                        px = (ra + up[x]) >> 1
                d = (row[x] - px) & 0xFFFF
                if d == 32768:  # category 16: no magnitude bits (H.2)
                    code, ln = tab[16]
                    acc = (acc << ln) | code
                    nbits += ln
                else:
                    v = d - 65536 if d > 32768 else d
                    s_, field = _magnitude(v)
                    code, ln = tab[s_]
                    acc = (acc << (ln + s_)) | (code << s_) | field
                    nbits += ln + s_
                while nbits >= 8:
                    nbits -= 8
                    b = (acc >> nbits) & 0xFF
                    eappend(b)
                    if b == 0xFF:
                        eappend(0)
                acc &= (1 << nbits) - 1
    if nbits:
        pad = 8 - nbits
        b = ((acc << pad) | ((1 << pad) - 1)) & 0xFF
        eappend(b)
        if b == 0xFF:
            eappend(0)
    out += ebuf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def write_jpeg(path: str, img: np.ndarray, quality: int = 75) -> None:
    with open(path, "wb") as fh:
        fh.write(encode_jpeg(img, quality=quality))


def read_jpeg(path: str) -> np.ndarray:
    with open(path, "rb") as fh:
        return decode_jpeg(fh.read())
