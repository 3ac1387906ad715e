"""Pure-Python FLAC codec (stdlib struct/hashlib + numpy).

FLAC is the dominant LOSSLESS audio format of real multimodal corpora
(the WAV path covers raw PCM only).  This module implements the format
per the public IETF RFC 9639 / xiph.org specification:

* ``decode_flac`` — streams with any fixed or variable blocking, all
  frame-header block-size/sample-rate/sample-size encodings, channel
  assignments independent/left-side/right-side/mid-side, subframe types
  CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), wasted bits, Rice and
  Rice2 residual coding with partitions and escape codes, frame-header
  CRC-8 and frame CRC-16 verification, and the STREAMINFO MD5 check
  (for byte-aligned sample sizes).  Sample sizes 4-32 bit.
* ``encode_flac`` — fixed-blocking encoder: CONSTANT or best-of
  FIXED(0..max_fixed_order) subframes chosen per channel by
  sum-of-abs-residual — plus real LPC subframes when ``max_lpc_order``
  > 0 (Levinson-Durbin fit quantized to 12-bit integer coefficients
  with the decoder's exact shift arithmetic) — Rice parameters fitted
  per partition up to ``max_partition_order``, independent or
  left/right/mid-side stereo decorrelation, correct CRCs and
  STREAMINFO MD5.  ``decode_flac`` round-trips its output bit-exactly
  (FLAC is lossless).

Reserved subframe/residual codes and negative LPC shifts raise
``ValueError`` (malformed stream), not silence.  MP3 remains gated in
``operators/multimodal.py`` — a psychoacoustic DCT decoder is out of
reasonable pure-Python scope, while FLAC is integer-exact end to end.

Reference parity note: the reference pipeline has no audio surface (its
media are HDF4 granules); this codec serves the LLM-pipeline multimodal
operators (``operators/multimodal.py``, x112) next to the WAV path
(x62).  No FLAC binary exists in this container, so wire conventions
are pinned by hand-derived RFC 9639 vectors in tests/test_flaclite.py
(Rice zigzag, unary polarity, coded numbers, CRC polynomials,
byte-exact whole-stream encodes) plus parameter-sweep round-trips —
the sziplite/jpeglite standard.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ------------------------------------------------------------------ CRCs

# CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 (frame header)
_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

# CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0 (whole frame)
_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TABLE[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ------------------------------------------------- frame header tables

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# FIXED predictor coefficients by order (RFC 9639 §9.2.1): prediction of
# s[i] from previous samples; residual = s[i] - prediction.
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ------------------------------------------------------------ bit reader


class _Bits:
    """MSB-first bit reader tracking the byte position (frames re-align
    to byte boundaries and CRCs cover exact byte ranges)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        acc, nbits, pos, data = self.acc, self.nbits, self.pos, self.data
        while nbits < n:
            if pos >= len(data):
                raise ValueError("FLAC: bitstream truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= n
        v = (acc >> nbits) & ((1 << n) - 1)
        self.acc = acc & ((1 << nbits) - 1)
        self.nbits = nbits
        self.pos = pos
        return v

    def sread(self, n: int) -> int:
        """n-bit two's-complement signed read."""
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        """Count 0 bits until the terminating 1 bit."""
        q = 0
        while True:
            if self.nbits == 0:
                if self.pos >= len(self.data):
                    raise ValueError("FLAC: bitstream truncated in unary code")
                self.acc = self.data[self.pos]
                self.pos += 1
                self.nbits = 8
            if self.acc == 0:  # whole remainder is zeros
                q += self.nbits
                self.nbits = 0
                continue
            top = self.acc.bit_length()
            q += self.nbits - top
            self.nbits = top - 1
            self.acc &= (1 << self.nbits) - 1
            return q

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0


# ------------------------------------------------------------- decoder


def _read_coded_number(bits: _Bits) -> int:
    """The UTF-8-style frame/sample number (RFC 9639 §9.1.5)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0 or n > 6:
        raise ValueError("FLAC: malformed coded number")
    v = b0 & (0x3F >> n)
    for _ in range(n):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: malformed coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = bits.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("FLAC: partition order does not divide block size")
    out: list[int] = []
    for p in range(nparts):
        count = (blocksize >> po) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC: predictor order exceeds first partition")
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            if raw == 0:
                out.extend([0] * count)
            else:
                for _ in range(count):
                    out.append(bits.sread(raw))
            continue
        unary = bits.unary
        read = bits.read
        if param == 0:
            for _ in range(count):
                v = unary()
                out.append((v >> 1) ^ -(v & 1))
        else:
            for _ in range(count):
                v = (unary() << param) | read(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("FLAC: subframe header padding bit set")
    sftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC: wasted bits exceed sample size")
    if sftype == 0:  # CONSTANT
        samples = [bits.sread(eff)] * blocksize
    elif sftype == 1:  # VERBATIM
        samples = [bits.sread(eff) for _ in range(blocksize)]
    elif 8 <= sftype <= 12:  # FIXED order 0-4
        order = sftype - 8
        samples = [bits.sread(eff) for _ in range(order)]
        res = _decode_residual(bits, blocksize, order)
        coef = _FIXED_COEF[order]
        for r in res:
            pred = 0
            for j, c in enumerate(coef):
                pred += c * samples[-1 - j]
            samples.append(r + pred)
    elif sftype >= 32:  # LPC order 1-32
        order = (sftype & 31) + 1
        samples = [bits.sread(eff) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision code 1111")
        shift = bits.read(5)
        if shift >= 16:  # 5-bit two's complement: negative shift
            raise ValueError("FLAC: negative LPC shift")
        coef = [bits.sread(prec) for _ in range(order)]
        res = _decode_residual(bits, blocksize, order)
        for r in res:
            acc = 0
            for j in range(order):
                acc += coef[j] * samples[-1 - j]
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"FLAC: reserved subframe type {sftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a FLAC stream → (sample_rate, bits_per_sample, samples)
    with samples an int32 array of shape (n, channels).  Verifies the
    sync codes, both frame CRCs, and the STREAMINFO MD5 when the sample
    size is byte-aligned."""
    buf = bytes(buf)
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(buf):
            raise ValueError("FLAC: truncated metadata block header")
        hdr = buf[pos]
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + buf[pos + 1 : pos + 4])
        body = buf[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            if blen != 34:
                raise ValueError("FLAC: STREAMINFO must be 34 bytes")
            b = _Bits(body)
            info = {
                "min_bs": b.read(16), "max_bs": b.read(16),
                "min_fs": b.read(24), "max_fs": b.read(24),
                "rate": b.read(20),
                "channels": b.read(3) + 1,
                "bps": b.read(5) + 1,
                "total": b.read(36),
                "md5": body[18:34],
            }
        elif btype == 127:
            raise ValueError("FLAC: forbidden metadata block type 127")
        pos += 4 + blen
        if hdr & 0x80:  # last-metadata-block flag
            break
    if info is None:
        raise ValueError("FLAC: no STREAMINFO block")
    if info["rate"] == 0:
        raise ValueError("FLAC: STREAMINFO sample rate 0")

    channels = info["channels"]
    out: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(buf):
        frame_start = pos
        bits = _Bits(buf, pos)
        sync = bits.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"FLAC: bad frame sync at byte {frame_start}")
        if bits.read(1):
            raise ValueError("FLAC: reserved frame header bit set")
        _variable = bits.read(1)
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1):
            raise ValueError("FLAC: reserved frame header bit set")
        _num = _read_coded_number(bits)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code 0")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCK_SIZES[bs_code]
        if sr_code == 0:
            rate = info["rate"]
        elif sr_code == 12:
            rate = bits.read(8) * 1000
        elif sr_code == 13:
            rate = bits.read(16)
        elif sr_code == 14:
            rate = bits.read(16) * 10
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        else:
            rate = _SAMPLE_RATES[sr_code]
        if rate != info["rate"]:
            raise ValueError("FLAC: frame sample rate differs from STREAMINFO")
        if ss_code == 0:
            bps = info["bps"]
        elif ss_code == 3:
            raise ValueError("FLAC: reserved sample size code")
        else:
            bps = _SAMPLE_SIZES[ss_code]
        if ch_code < 8:
            nch, mode = ch_code + 1, "indep"
        elif ch_code == 8:
            nch, mode = 2, "left_side"
        elif ch_code == 9:
            nch, mode = 2, "right_side"
        elif ch_code == 10:
            nch, mode = 2, "mid_side"
        else:
            raise ValueError(f"FLAC: reserved channel assignment {ch_code}")
        if nch != channels:
            raise ValueError("FLAC: frame channel count differs from STREAMINFO")
        # CRC-8 covers the header bytes read so far
        if crc8(buf[frame_start : bits.pos]) != bits.read(8):
            raise ValueError("FLAC: frame header CRC-8 mismatch")

        chans = []
        for ci in range(nch):
            eff = bps
            if (mode in ("left_side", "mid_side") and ci == 1) or (
                mode == "right_side" and ci == 0
            ):
                eff = bps + 1  # the side channel carries one extra bit
            chans.append(_decode_subframe(bits, blocksize, eff))
        bits.align()
        if crc16(buf[frame_start : bits.pos]) != bits.read(16):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = bits.pos

        if mode == "indep":
            for ci in range(nch):
                out[ci].extend(chans[ci])
        elif mode == "left_side":
            left, side = chans
            out[0].extend(left)
            out[1].extend(l - s for l, s in zip(left, side))
        elif mode == "right_side":
            side, right = chans
            out[0].extend(r + s for s, r in zip(side, right))
            out[1].extend(right)
        else:  # mid_side
            mid, side = chans
            for m, s in zip(mid, side):
                total = (m << 1) | (s & 1)
                out[0].append((total + s) >> 1)
                out[1].append((total - s) >> 1)

    n = len(out[0])
    if info["total"] and n != info["total"]:
        raise ValueError(
            f"FLAC: decoded {n} samples, STREAMINFO declares {info['total']}"
        )
    samples = np.array(out, dtype=np.int64).T.reshape(n, channels)
    lo, hi = -(1 << (info["bps"] - 1)), (1 << (info["bps"] - 1)) - 1
    if n and (samples.min() < lo or samples.max() > hi):
        raise ValueError("FLAC: decoded sample exceeds declared sample size")
    if info["bps"] % 8 == 0 and info["md5"] != b"\x00" * 16:
        width = info["bps"] // 8
        raw = b"".join(
            int(v).to_bytes(width, "little", signed=True)
            for v in samples.reshape(-1)
        )
        if hashlib.md5(raw).digest() != info["md5"]:
            raise ValueError("FLAC: STREAMINFO MD5 mismatch on decoded audio")
    return info["rate"], info["bps"], samples.astype(np.int32)


def decode_flac_mono(buf: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, float64 mono samples in [-1, 1)) — channels
    downmixed by mean and scaled by 2^(bps-1), mirroring
    ``multimodal.decode_wav`` so WAV- and FLAC-borne audio feed the
    same feature math (both mappings exact in float64)."""
    rate, bps, samples = decode_flac(buf)
    arr = samples.astype(np.float64) / float(1 << (bps - 1))
    return rate, arr.mean(axis=1)


# ------------------------------------------------------------- encoder


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _coded_number(v: int) -> bytes:
    """UTF-8-style encoding of a frame/sample number (§9.1.5)."""
    if v < 0x80:
        return bytes([v])
    parts = []
    nbytes = 2
    # an nbytes-long code carries (7 - nbytes) + 6*(nbytes-1) payload bits
    while v >= (1 << (1 + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    for _ in range(nbytes - 1):
        parts.append(0x80 | (v & 0x3F))
        v >>= 6
    lead_mask = (0xFF00 >> nbytes) & 0xFF
    parts.append(lead_mask | v)
    return bytes(reversed(parts))


def _best_rice_param(residual: list[int], pbits: int = 4) -> int:
    """Smallest-cost Rice parameter (exact bit count per candidate)."""
    zz = [(-r << 1) - 1 if r < 0 else r << 1 for r in residual]
    best_p, best_cost = 0, None
    for p in range((1 << pbits) - 1):
        cost = sum((z >> p) + 1 + p for z in zz)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
        if best_cost <= len(zz) * (p + 2):  # cost can only grow past here
            break
    return best_p


def _rice_cost(zz: list[int], p: int) -> int:
    return sum((z >> p) + 1 + p for z in zz)


def _write_residual(
    w: _BitWriter, residual: list[int], blocksize: int, order: int,
    max_partition_order: int = 0,
) -> None:
    """Rice method 0 with a fitted partition order (each 2^po slice gets
    its own fitted parameter — the layout real encoders emit); escapes
    to verbatim if any zigzag value would need a quotient > 2^16."""
    zz = [(-r << 1) - 1 if r < 0 else r << 1 for r in residual]
    raw = 1 + max(
        ((r if r >= 0 else ~r).bit_length() for r in residual), default=1
    )
    p0 = _best_rice_param(residual)
    if zz and max(zz) >> p0 > (1 << 16) and raw <= 31:
        w.write(0, 2)
        w.write(0, 4)
        w.write(15, 4)  # escape to raw
        w.write(raw, 5)
        for r in residual:
            w.write(r & ((1 << raw) - 1), raw)
        return
    best = (4 + _rice_cost(zz, p0), 0, [p0])  # (bits, po, params)
    for po in range(1, max_partition_order + 1):
        nparts = 1 << po
        if blocksize % nparts or (blocksize >> po) <= order:
            break
        cost, params, off = 0, [], 0
        for p_i in range(nparts):
            count = (blocksize >> po) - (order if p_i == 0 else 0)
            zpart = zz[off : off + count]
            prm = _best_rice_param(residual[off : off + count])
            off += count
            if zpart and max(zpart) >> prm > (1 << 16):
                cost = None  # a partition would need escape; keep po 0
                break
            params.append(prm)
            cost += 4 + _rice_cost(zpart, prm)
        if cost is not None and cost < best[0]:
            best = (cost, po, params)
    _, po, params = best
    w.write(0, 2)   # method: Rice, 4-bit parameters
    w.write(po, 4)
    off = 0
    for p_i, prm in enumerate(params):
        count = (blocksize >> po) - (order if p_i == 0 else 0)
        w.write(prm, 4)
        for z in zz[off : off + count]:
            w.unary(z >> prm)
            if prm:
                w.write(z & ((1 << prm) - 1), prm)
        off += count


def _lpc_fit(chan: list[int], order: int, precision: int = 12):
    """Levinson-Durbin LPC fit quantized to ``precision``-bit integer
    coefficients with a power-of-two shift (the decoder's exact
    arithmetic).  Returns (qcoef, shift) or None when degenerate."""
    x = np.asarray(chan, dtype=np.float64)
    n = x.size
    if n <= order:
        return None
    autoc = np.array(
        [float(np.dot(x[: n - lag], x[lag:])) for lag in range(order + 1)]
    )
    if autoc[0] <= 0.0:
        return None
    err = autoc[0]
    lpc = np.zeros(order)
    for i in range(order):
        acc = autoc[i + 1] - float(np.dot(lpc[:i], autoc[i:0:-1][:i]))
        k = acc / err
        lpc[:i], lpc[i] = lpc[:i] - k * lpc[i - 1 :: -1][:i], k
        err *= 1.0 - k * k
        if err <= 0.0:
            return None
    cmax = float(np.max(np.abs(lpc)))
    if not np.isfinite(cmax) or cmax == 0.0:
        return None
    shift = precision - 1 - max(int(np.floor(np.log2(cmax))) + 1, 0)
    shift = max(0, min(shift, 31))
    lim = 1 << (precision - 1)
    qcoef = [
        int(min(max(round(c * (1 << shift)), -lim), lim - 1)) for c in lpc
    ]
    if all(c == 0 for c in qcoef):
        return None
    return qcoef, shift


def _lpc_residual(chan: list[int], qcoef: list[int], shift: int) -> list[int]:
    order = len(qcoef)
    out = []
    for i in range(order, len(chan)):
        acc = 0
        for j in range(order):
            acc += qcoef[j] * chan[i - 1 - j]
        out.append(chan[i] - (acc >> shift))
    return out


def _write_subframe(
    w: _BitWriter,
    chan: list[int],
    eff_bps: int,
    max_fixed_order: int,
    max_lpc_order: int = 0,
    max_partition_order: int = 0,
) -> None:
    n = len(chan)
    if n and all(s == chan[0] for s in chan):
        w.write(0, 1)
        w.write(0, 6)   # CONSTANT
        w.write(0, 1)
        w.write(chan[0] & ((1 << eff_bps) - 1), eff_bps)
        return
    best = None  # (cost, kind, order, res, extra)
    for order in range(min(max_fixed_order, 4, n - 1) + 1):
        coef = _FIXED_COEF[order]
        res = [
            chan[i] - sum(c * chan[i - 1 - j] for j, c in enumerate(coef))
            for i in range(order, n)
        ]
        cost = sum(abs(r) for r in res)
        if best is None or cost < best[0]:
            best = (cost, "fixed", order, res, None)
    if max_lpc_order:
        order = min(max_lpc_order, 32, n - 1)
        fit = _lpc_fit(chan, order) if order >= 1 else None
        if fit is not None:
            qcoef, shift = fit
            res = _lpc_residual(chan, qcoef, shift)
            cost = sum(abs(r) for r in res)
            if cost < best[0]:
                best = (cost, "lpc", order, res, (qcoef, shift))
    _, kind, order, res, extra = best
    w.write(0, 1)
    if kind == "fixed":
        w.write(8 + order, 6)
        w.write(0, 1)
        for i in range(order):
            w.write(chan[i] & ((1 << eff_bps) - 1), eff_bps)
    else:
        qcoef, shift = extra
        w.write(0b100000 | (order - 1), 6)
        w.write(0, 1)
        for i in range(order):
            w.write(chan[i] & ((1 << eff_bps) - 1), eff_bps)
        w.write(12 - 1, 4)  # precision 12
        w.write(shift, 5)
        for c in qcoef:
            w.write(c & 0xFFF, 12)
    _write_residual(w, res, n, order, max_partition_order)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16_000,
    bps: int = 16,
    block_size: int = 4096,
    stereo: str = "independent",
    max_fixed_order: int = 2,
    max_lpc_order: int = 0,
    max_partition_order: int = 0,
) -> bytes:
    """Encode int samples (n,) or (n, channels≤8) as a REAL FLAC stream
    (fixed blocking, CONSTANT/FIXED — plus LPC when ``max_lpc_order``
    > 0: Levinson-Durbin fit quantized to 12-bit coefficients — Rice
    residuals with a fitted partition order up to
    ``max_partition_order``; see the module docstring).  ``stereo``
    selects the decorrelation for 2-channel input: independent,
    left_side, right_side or mid_side."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, np.newaxis]
    if arr.ndim != 2 or not 1 <= arr.shape[1] <= 8:
        raise ValueError("encode_flac wants (n,) or (n, 1..8) samples")
    if not 4 <= bps <= 32:
        raise ValueError("bps must be in 4..32")
    if not 16 <= block_size <= 65535:
        raise ValueError("block_size must be in 16..65535")
    if not 1 <= sample_rate < (1 << 20):
        raise ValueError("sample_rate must fit STREAMINFO's 20 bits")
    n, channels = arr.shape
    if n == 0:
        raise ValueError("empty audio")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    a = arr.astype(np.int64)
    if a.min() < lo or a.max() > hi:
        raise ValueError(f"sample out of range for {bps}-bit encoding")
    if stereo not in ("independent", "left_side", "right_side", "mid_side"):
        raise ValueError(f"unknown stereo mode: {stereo!r}")
    if stereo != "independent" and channels != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")

    # ---- STREAMINFO ----
    md5 = hashlib.md5()
    if bps % 8 == 0:
        width = bps // 8
        md5.update(
            b"".join(
                int(v).to_bytes(width, "little", signed=True)
                for v in a.reshape(-1)
            )
        )
        digest = md5.digest()
    else:
        digest = b"\x00" * 16  # unset per spec when unknown
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + (34).to_bytes(3, "big")  # last block, STREAMINFO
    out += bytes(si.out) + digest

    ch_code = {
        "independent": channels - 1,
        "left_side": 8,
        "right_side": 9,
        "mid_side": 10,
    }[stereo]

    frame_no = 0
    for start in range(0, n, block_size):
        blk = a[start : start + block_size]
        bs = blk.shape[0]
        if stereo == "independent":
            chans = [blk[:, ci].tolist() for ci in range(channels)]
            effs = [bps] * channels
        else:
            left = blk[:, 0].astype(object)
            right = blk[:, 1].astype(object)
            side = (left - right).tolist()
            if stereo == "left_side":
                chans, effs = [left.tolist(), side], [bps, bps + 1]
            elif stereo == "right_side":
                chans, effs = [side, right.tolist()], [bps + 1, bps]
            else:
                mid = ((left + right) >> 1).tolist()
                chans, effs = [mid, side], [bps, bps + 1]

        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        if bs == block_size and block_size in _BS_CODE:
            bs_code, bs_extra = _BS_CODE[block_size], None
        elif bs <= 256:
            bs_code, bs_extra = 6, (bs - 1, 8)
        else:
            bs_code, bs_extra = 7, (bs - 1, 16)
        w.write(bs_code, 4)
        if sample_rate in _SR_CODE:
            sr_code, sr_extra = _SR_CODE[sample_rate], None
        elif sample_rate % 1000 == 0 and sample_rate // 1000 < 256:
            sr_code, sr_extra = 12, (sample_rate // 1000, 8)
        elif sample_rate < 65536:
            sr_code, sr_extra = 13, (sample_rate, 16)
        else:
            sr_code, sr_extra = 14, (sample_rate // 10, 16)
        w.write(sr_code, 4)
        w.write(ch_code, 4)
        w.write(_SS_CODE.get(bps, 0), 3)
        w.write(0, 1)
        for b in _coded_number(frame_no):
            w.write(b, 8)
        if bs_extra:
            w.write(*bs_extra)
        if sr_extra:
            w.write(*sr_extra)
        assert w.nbits == 0
        w.write(crc8(bytes(w.out)), 8)

        for chan, eff in zip(chans, effs):
            _write_subframe(
                w, chan, eff, max_fixed_order, max_lpc_order,
                max_partition_order,
            )
        w.align()
        w.write(crc16(bytes(w.out)), 16)
        out += bytes(w.out)
        frame_no += 1
    return bytes(out)


_BS_CODE = {v: k for k, v in _BLOCK_SIZES.items()}
_SR_CODE = {v: k for k, v in _SAMPLE_RATES.items()}
_SS_CODE = {v: k for k, v in _SAMPLE_SIZES.items()}
