"""QM-coder (T.81 Annex D) unit tests.

Validation layers (module docstring of sinks/qmcoder.py):
(a) HAND-DERIVED flowchart vectors — the expected bytes below are
    computed by manual Annex D register arithmetic, traced step by
    step in the comments;
(b) lossless encode->decode round trips over randomized decision
    sequences, adaptive contexts, and the fixed equiprobable state,
    including identical probability-state evolution on both sides;
(c) the jpeglite integration tests (test_jpeglite.py) pin the
    arithmetic entropy layer against the independently-validated
    Huffman path on identical DCT coefficients.
"""

from __future__ import annotations

import numpy as np
import pytest

from modis_aggregation_spark.sinks.qmcoder import (
    FIXED_BIN,
    QE_TABLE,
    QMDecoder,
    QMEncoder,
    new_ac_stats,
    new_dc_stats,
)


# ---- Table D.3 structural invariants ----


def test_qe_table_structure():
    # 113 adaptive states + the fixed equiprobable state
    assert len(QE_TABLE) == 114
    for i, (qe, nmps, nlps, switch) in enumerate(QE_TABLE):
        assert 0 < qe <= 0x5B12, i
        assert 0 <= nmps < 114 and 0 <= nlps < 114, i
        assert switch in (0, 1), i
    # the six fast-attack states at the documented Qe values carry SWITCH
    switches = {i for i, row in enumerate(QE_TABLE) if row[3]}
    assert switches == {0, 14, 36, 64, 80, 88, 95, 105, 110, 112}
    # state 113 (fixed) self-loops and never switches MPS
    qe, nmps, nlps, switch = QE_TABLE[FIXED_BIN]
    assert (qe, nmps, nlps, switch) == (0x5A1D, 113, 113, 0)
    # terminal adaptive state 13 self-loops on MPS at the smallest Qe
    assert QE_TABLE[13][0] == 0x0001 and QE_TABLE[13][1] == 13


def test_stats_area_sizes():
    assert len(new_dc_stats()) == 49  # Table F.4
    assert len(new_ac_stats()) == 245  # Table F.5


# ---- (a) hand-derived Annex D vectors ----


def test_hand_vector_single_mps_is_empty():
    """CODE one MPS (d=0) on a fresh context, state 0 (Qe=0x5A1D):
    A = 0x10000 - 0x5A1D = 0xA5E3, bit 15 set -> no renormalization,
    C stays 0.  FLUSH: T = (0 + 0xA5E3 - 1) & ~0xFFFF = 0 >= C, so
    C = 0; every extracted byte is zero and trailing zeros are
    discarded -> empty code string.  The decoder regenerates zeros
    past the end: V window 0 < A - Qe -> MPS."""
    st = bytearray(1)
    enc = QMEncoder()
    enc.encode(st, 0, 0)
    assert enc.flush() == b""
    # no renormalization -> no estimation update
    assert st == bytearray(1)
    dec = QMDecoder(b"")
    assert dec.decode(bytearray(1), 0) == 0


def test_hand_vector_single_lps():
    """CODE one LPS (d=1) on a fresh context, state 0:
    A - Qe = 0xA5E3, not < Qe -> no exchange: C += 0xA5E3, A = Qe =
    0x5A1D; SWITCH=1 flips MPS to 1, state -> NLPS = 1.
    RENORME once: A = 0xB43A, C = 0x14BC6, CT = 10.
    FLUSH: T = (0x14BC6 + 0xB43A - 1) & ~0xFFFF = 0x10000 < C,
    so C = 0x18000; aligned left by CT=10 -> 0x6000000; the first
    BYTEOUT extracts bits 19.. = 0xC0, the rest are zeros ->
    code string is the single byte 0xC0."""
    st = bytearray(1)
    enc = QMEncoder()
    enc.encode(st, 0, 1)
    assert enc.flush() == b"\xc0"
    assert st[0] == (1 << 7) | 1  # MPS switched to 1, state NLPS=1
    # decoder mirror: C window = 0xC000 >= A - Qe = 0xA5E3 -> LPS
    std = bytearray(1)
    dec = QMDecoder(b"\xc0")
    assert dec.decode(std, 0) == 1
    assert std == st


def test_hand_vector_mps_then_lps_conditional_exchange():
    """CODE [MPS, LPS] on a fresh context — the second decision hits
    the CONDITIONAL EXCHANGE branch: after d=0, A = 0xA5E3 (no
    renorm); for d=1, A - Qe = 0x4BC6 < Qe = 0x5A1D, so the LPS takes
    the BOTTOM subinterval (no C add, width A - Qe).  C never leaves
    zero -> FLUSH emits all zeros -> EMPTY code string, yet the
    decoder must still return [0, 1] purely from interval widths:
    window 0 < 0xA5E3 -> MPS(0); then 0 < 0x4BC6 with A < Qe ->
    MPS_EXCHANGE -> LPS(1)."""
    st = bytearray(1)
    enc = QMEncoder()
    enc.encode(st, 0, 0)
    enc.encode(st, 0, 1)
    assert enc.flush() == b""
    std = bytearray(1)
    dec = QMDecoder(b"")
    assert dec.decode(std, 0) == 0
    assert dec.decode(std, 0) == 1
    assert std == st == bytearray([(1 << 7) | 1])


def test_hand_vector_lps_then_mps():
    """CODE [LPS, MPS]: after the LPS (C = 0x14BC6, A = 0xB43A,
    state 1, MPS=1) the MPS decision under Qe(1) = 0x2586 leaves
    A = 0x8EB4 normalized — same FLUSH arithmetic as the single-LPS
    vector -> 0xC0 again, but the DECODER must now consume two
    decisions: window 0xC000 -> LPS(1), then window 0x343A <
    A - Qe = 0x8EB4 -> fast-path MPS(1)."""
    st = bytearray(1)
    enc = QMEncoder()
    enc.encode(st, 0, 1)
    enc.encode(st, 0, 1)  # MPS is now 1 after the switch
    assert enc.flush() == b"\xc0"
    std = bytearray(1)
    dec = QMDecoder(b"\xc0")
    assert dec.decode(std, 0) == 1
    assert dec.decode(std, 0) == 1
    assert std == st


# ---- (b) round-trip properties ----


def _roundtrip(decisions, contexts, n_bins):
    enc = QMEncoder()
    enc_st = bytearray(n_bins)
    for cx, d in zip(contexts, decisions):
        enc.encode(enc_st, cx, d)
    data = enc.flush()
    dec = QMDecoder(data)
    dec_st = bytearray(n_bins)
    out = [dec.decode(dec_st, cx) for cx in contexts]
    return data, out, enc_st, dec_st


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roundtrip_random_decisions_and_state_parity(seed):
    rng = np.random.default_rng(seed)
    n = 5000
    contexts = rng.integers(0, 16, n).tolist()
    decisions = rng.integers(0, 2, n).tolist()
    data, out, enc_st, dec_st = _roundtrip(decisions, contexts, 16)
    assert out == decisions
    # both sides walked the identical estimation-state trajectory
    assert enc_st == dec_st


def test_roundtrip_skewed_compresses():
    """1% LPS rate must drive the estimator deep into the low-Qe
    states: the code string comes out far below 1 bit/decision."""
    rng = np.random.default_rng(3)
    n = 20000
    decisions = (rng.random(n) < 0.01).astype(int).tolist()
    contexts = [0] * n
    data, out, enc_st, dec_st = _roundtrip(decisions, contexts, 1)
    assert out == decisions
    assert enc_st == dec_st
    assert len(data) < n // 64  # < 0.125 bits per decision
    assert (enc_st[0] & 0x7F) > 8  # estimator actually adapted


def test_fixed_state_costs_one_bit():
    """The non-adaptive state must behave as p=0.5: n random decisions
    cost ~n bits and the context byte never changes."""
    rng = np.random.default_rng(4)
    n = 8192
    decisions = rng.integers(0, 2, n).tolist()
    st = bytearray([FIXED_BIN])
    enc = QMEncoder()
    for d in decisions:
        enc.encode(st, 0, d)
    data = enc.flush()
    assert st[0] == FIXED_BIN
    assert abs(len(data) - n // 8) <= n // 64
    dec = QMDecoder(data)
    std = bytearray([FIXED_BIN])
    assert [dec.decode(std, 0) for _ in range(n)] == decisions


def test_roundtrip_produces_and_survives_ff_bytes():
    """Byte-stuffing is the caller's business: the raw code string may
    legitimately contain 0xFF bytes (and carries across stacked 0xFF
    runs must resolve).  Find such a stream and round-trip it."""
    found = False
    for seed in range(50):
        rng = np.random.default_rng(seed)
        n = 2000
        contexts = rng.integers(0, 4, n).tolist()
        decisions = rng.integers(0, 2, n).tolist()
        data, out, enc_st, dec_st = _roundtrip(decisions, contexts, 4)
        assert out == decisions
        assert enc_st == dec_st
        if b"\xff" in data:
            found = True
    assert found


def test_decoder_zero_regeneration_past_markers():
    """T.81 D.2.6: decoders regenerate zero bytes past the end of the
    entropy segment, so a decoder handed ONLY the non-zero prefix of
    the code string must still reproduce every decision."""
    rng = np.random.default_rng(9)
    n = 512
    contexts = rng.integers(0, 8, n).tolist()
    decisions = rng.integers(0, 2, n).tolist()
    enc = QMEncoder()
    enc_st = bytearray(8)
    for cx, d in zip(contexts, decisions):
        enc.encode(enc_st, cx, d)
    data = enc.flush()  # flush already strips trailing zeros
    assert not data.endswith(b"\x00")
    dec = QMDecoder(data)
    dec_st = bytearray(8)
    assert [dec.decode(dec_st, cx) for cx in contexts] == decisions
