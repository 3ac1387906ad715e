"""QM-coder — the binary arithmetic entropy coder of ITU-T T.81 Annex D.

Pure-Python implementation of the adaptive binary arithmetic coder used
by arithmetic-coded JPEG (SOF9/SOF10) and JBIG (T.82).  Everything here
derives from the published T.81 (1992) spec:

* ``QE_TABLE`` — Table D.3, the normative probability-estimation state
  machine: 113 adaptive states of (Qe, next-MPS, next-LPS, switch-MPS)
  plus the non-adaptive "fixed" state (index 113) T.81 uses for
  equiprobable decisions (AC coefficient signs, DC refinement bits);
  its Qe of 0x5A1D yields an effective 0.5 probability under
  renormalization.
* ``QMEncoder`` / ``QMDecoder`` — the CODE/DECODE procedures with
  conditional MPS/LPS exchange (Figures D.3-D.4, D.17-D.19), byte-level
  carry propagation via 0xFF stacking (D.1.6/BYTEOUT), CLEARBITS flush
  (D.1.8-D.1.9), and zero-byte regeneration past the end of data /
  at markers (D.2.6, the convention that lets encoders discard
  trailing zero bytes).

Register conventions are derived from first principles rather than
transcribed: the code string IS the binary fraction of a value inside
the final interval (T.81 D.2's definition), with A the 16-bit
normalized interval width, the MPS subinterval at the bottom and the
LPS at the top (swapped under conditional exchange when A - Qe < Qe).
The encoder keeps the interval base in a 27-bit register and emits a
9-bit (data + carry) quantity every 8 renormalizations; the decoder
keeps the 16-bit window V - base, which provably mirrors the encoder's
base updates (base += A-Qe  <=>  window -= A-Qe).

Byte stuffing (0x00 after 0xFF) is the CALLER's business — JPEG
applies it to entropy segments while other QM users do not — so
``QMEncoder.flush`` returns unstuffed bytes and ``QMDecoder`` expects
unstuffed input.

Validation story (honest): this container has no independent
arithmetic-JPEG codec (the JDK's javax.imageio decodes Huffman JPEG
only; PIL/libjpeg are absent), so external cross-validation is
impossible here.  Instead: (a) hand-traced flowchart vectors in
tests/test_jpeglite.py pin the first coding decisions against manual
Annex D arithmetic, (b) encode->decode round trips over randomized
decision sequences and contexts must be lossless, and (c) jpeglite's
arithmetic path must reproduce BIT-IDENTICAL DCT coefficients to its
independently validated Huffman path on the same image (the entropy
layer is the only moving part).

Reference parity note: the reference pipeline (MODIS_Aggregation) has
no JPEG surface at all; this serves the LLM-pipeline multimodal
operators (operators/multimodal.py, x65/x88/x110 queries).
"""

from __future__ import annotations

# Table D.3 — Qe value and probability-estimation state machine.
# Rows: (Qe, NMPS, NLPS, SWITCH).  Index 113 is the non-adaptive
# "fixed" 0.5-probability state (self-looping, never switches).
QE_TABLE = (
    (0x5A1D, 1, 1, 1),
    (0x2586, 2, 14, 0),
    (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0),
    (0x03D8, 5, 20, 0),
    (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0),
    (0x006F, 8, 28, 0),
    (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0),
    (0x000D, 11, 35, 0),
    (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0),
    (0x0001, 13, 12, 0),
    (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0),
    (0x2CF2, 17, 38, 0),
    (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0),
    (0x1182, 20, 42, 0),
    (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0),
    (0x072F, 23, 46, 0),
    (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0),
    (0x0303, 26, 51, 0),
    (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0),
    (0x0144, 29, 56, 0),
    (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0),
    (0x008A, 32, 60, 0),
    (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0),
    (0x003B, 35, 32, 0),
    (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1),
    (0x484C, 38, 64, 0),
    (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0),
    (0x261F, 41, 68, 0),
    (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0),
    (0x1518, 44, 72, 0),
    (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0),
    (0x0BFB, 47, 75, 0),
    (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0),
    (0x0706, 50, 79, 0),
    (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0),
    (0x040F, 53, 50, 0),
    (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0),
    (0x025C, 56, 53, 0),
    (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0),
    (0x0160, 59, 56, 0),
    (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0),
    (0x00CB, 62, 59, 0),
    (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0),
    (0x5B12, 65, 65, 1),
    (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0),
    (0x37D8, 68, 82, 0),
    (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0),
    (0x2379, 71, 86, 0),
    (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0),
    (0x174E, 74, 72, 0),
    (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0),
    (0x0F6B, 77, 74, 0),
    (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0),
    (0x0A40, 48, 77, 0),
    (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0),
    (0x438E, 83, 89, 0),
    (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0),
    (0x2EAE, 86, 92, 0),
    (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0),
    (0x5570, 89, 88, 1),
    (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0),
    (0x3E22, 92, 97, 0),
    (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0),
    (0x2E17, 86, 93, 0),
    (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0),
    (0x47E5, 98, 102, 0),
    (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0),
    (0x375E, 93, 99, 0),
    (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0),
    (0x4639, 104, 107, 0),
    (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1),
    (0x50E7, 107, 108, 0),
    (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0),
    (0x504F, 107, 111, 0),
    (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0),
    (0x59EB, 111, 112, 1),
    # index 113: the fixed (non-adaptive) equiprobable state
    (0x5A1D, 113, 113, 0),
)

FIXED_BIN = 113  # context byte value for the non-adaptive 0.5 state

# Contexts are single bytes: low 7 bits = state index, high bit = MPS.


class QMDecoder:
    """Annex D DECODE over one entropy segment (already unstuffed).

    ``data`` is the segment's bytes; past its end, zero bytes are
    regenerated (T.81's convention — encoders may discard trailing
    zeros, and a marker terminates the usable data).
    """

    __slots__ = ("_data", "_n", "_pos", "_bit", "_a", "_c")

    def __init__(self, data: bytes):
        self._data = data
        self._n = len(data)
        # INITDEC: A = 0x10000; the window C holds (V - base) over the
        # first 16 fraction bits of the code string.
        b0 = data[0] if self._n > 0 else 0
        b1 = data[1] if self._n > 1 else 0
        self._c = (b0 << 8) | b1
        self._pos = 2
        self._bit = 7  # next bit position within data[_pos]
        self._a = 0x10000

    def _next_bit(self) -> int:
        pos = self._pos
        if pos >= self._n:
            return 0
        bit = (self._data[pos] >> self._bit) & 1
        if self._bit == 0:
            self._bit = 7
            self._pos = pos + 1
        else:
            self._bit -= 1
        return bit

    def decode(self, stats: bytearray, i: int) -> int:
        """One binary decision under context ``stats[i]`` (D.2.4)."""
        sv = stats[i]
        qe, nmps, nlps, switch = QE_TABLE[sv & 0x7F]
        mps = sv >> 7
        a = self._a - qe
        c = self._c
        if c < a:
            if a & 0x8000:  # fast path: still normalized
                self._a = a
                return mps
            # MPS_EXCHANGE (Figure D.18)
            if a < qe:
                d = mps ^ 1
                stats[i] = ((mps << 7) ^ (switch << 7)) | nlps
            else:
                d = mps
                stats[i] = (mps << 7) | nmps
        else:
            # LPS_EXCHANGE (Figure D.19): the top subinterval
            c -= a
            if a < qe:
                d = mps
                stats[i] = (mps << 7) | nmps
            else:
                d = mps ^ 1
                stats[i] = ((mps << 7) ^ (switch << 7)) | nlps
            a = qe
        # RENORM_D (Figure D.20)
        nb = self._next_bit
        while True:
            a <<= 1
            c = (c << 1) | nb()
            if a & 0x8000:
                break
        self._a = a
        self._c = c
        return d


class QMEncoder:
    """Annex D CODE over one entropy segment; ``flush()`` returns the
    unstuffed code bytes (trailing zero bytes already discarded)."""

    __slots__ = ("_a", "_c", "_ct", "_buf", "_pending", "_stacked")

    def __init__(self):
        # INITENC: A = 0x10000, C = 0; the first byte is extracted
        # after 11 renormalizations (8 data bits + 3 spacer bits that
        # absorb carry between extractions).
        self._a = 0x10000
        self._c = 0
        self._ct = 11
        self._buf = bytearray()
        self._pending = -1  # last non-0xFF byte awaiting carry decision
        self._stacked = 0  # run of 0xFF bytes after it (carry-mutable)

    def _byteout(self) -> None:
        # Emit the 9-bit quantity at bits 19..27 of C; bit 27 set means
        # a carry into already-produced bytes, which can only ripple
        # through a run of 0xFF bytes — exactly the stacked run.
        t = self._c >> 19
        self._c &= 0x7FFFF
        if t == 0xFF:
            self._stacked += 1
            return
        buf = self._buf
        if t > 0xFF:  # carry: pending += 1, stacked 0xFFs become 0x00
            if self._pending >= 0:
                buf.append(self._pending + 1)
            elif self._stacked or buf or t != 0x100:
                # carry with no pending byte: can only happen before
                # any byte was produced, absorbed by the spacer bits
                raise AssertionError("QM carry out of an empty stream")
            buf.extend(b"\x00" * self._stacked)
            self._stacked = 0
            self._pending = t & 0xFF
        else:
            if self._pending >= 0:
                buf.append(self._pending)
            buf.extend(b"\xff" * self._stacked)
            self._stacked = 0
            self._pending = t
        return

    def encode(self, stats: bytearray, i: int, d: int) -> None:
        """Code decision ``d`` under context ``stats[i]`` (D.1.4)."""
        sv = stats[i]
        qe, nmps, nlps, switch = QE_TABLE[sv & 0x7F]
        mps = sv >> 7
        a = self._a - qe
        if d == mps:
            # CODEMPS (Figure D.4): bottom subinterval, no renorm while
            # still normalized
            if a & 0x10000 or a & 0x8000:
                self._a = a
                return
            if a < qe:  # conditional exchange: MPS takes the top
                self._c += a
                a = qe
            stats[i] = (mps << 7) | nmps
        else:
            # CODELPS (Figure D.3): top subinterval unless exchanged
            if a < qe:
                pass  # exchange: LPS keeps the bottom, width a
            else:
                self._c += a
                a = qe
            stats[i] = ((mps << 7) ^ (switch << 7)) | nlps
        # RENORME (Figure D.5)
        c, ct = self._c, self._ct
        while True:
            a <<= 1
            c <<= 1
            ct -= 1
            if ct == 0:
                self._c = c
                self._byteout()
                c = self._c
                ct = 8
            if a & 0x8000:
                break
        self._a = a
        self._c = c
        self._ct = ct

    def flush(self) -> bytes:
        """FLUSH (D.1.8-D.1.9): CLEARBITS, drain the register, drop
        trailing zero bytes (the decoder regenerates them)."""
        # CLEARBITS: largest low-bit-cleared base still inside the
        # interval [C, C + A)
        t = (self._c + self._a - 1) & ~0xFFFF
        self._c = t if t >= self._c else t + 0x8000
        # drain: align then extract the remaining three byte slots
        self._c <<= self._ct
        for _ in range(3):
            self._byteout()
            self._c <<= 8
        if self._pending >= 0:
            self._buf.append(self._pending)
            self._pending = -1
        self._buf.extend(b"\xff" * self._stacked)
        self._stacked = 0
        out = bytes(self._buf)
        return out.rstrip(b"\x00")


def new_dc_stats() -> bytearray:
    """One DC conditioning table's statistics area (T.81 Table F.4:
    49 bins — 5 Da-classification groups x 4, X1..X15, the shared
    magnitude-bit bins)."""
    return bytearray(49)


def new_ac_stats() -> bytearray:
    """One AC conditioning table's statistics area (T.81 Table F.5:
    3 bins per coefficient index k=1..63, then the two X2../M..
    ladders split at Kx — 245 bins)."""
    return bytearray(245)
