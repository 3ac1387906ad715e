"""flaclite codec: hand-derived RFC 9639 bitstream vectors + round trips.

No FLAC binary exists in this container, so the wire conventions (unary
polarity, Rice zigzag, coded numbers, CRC polynomials, subframe layouts)
are pinned by hand-assembled streams built with an INDEPENDENT bit/CRC
implementation in this file — the sziplite/jpeglite standard — plus
parameter-sweep round trips and the FLAC-vs-WAV feature equality the
x112 contract query relies on.
"""

import numpy as np
import pytest

from modis_aggregation_spark.sinks.flaclite import (
    decode_flac,
    decode_flac_mono,
    encode_flac,
)


# ---- independent bit/CRC helpers (bit-by-bit, no tables) ---------------


class _W:
    def __init__(self):
        self.bits = ""

    def w(self, v, n):
        self.bits += format(v & ((1 << n) - 1), f"0{n}b")

    def bytes(self):
        s = self.bits + "0" * (-len(self.bits) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _crc8_slow(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16_slow(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _streaminfo(bs, rate, channels, bps, total):
    w = _W()
    w.w(bs, 16)
    w.w(bs, 16)
    w.w(0, 24)
    w.w(0, 24)
    w.w(rate, 20)
    w.w(channels - 1, 3)
    w.w(bps - 1, 5)
    w.w(total, 36)
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + w.bytes() + b"\x00" * 16


def _frame_header_bits(w, bs_code, sr_code, ch_code, ss_code, frame_no=0):
    w.w(0b11111111111110, 14)
    w.w(0, 1)  # reserved
    w.w(0, 1)  # fixed blocking
    w.w(bs_code, 4)
    w.w(sr_code, 4)
    w.w(ch_code, 4)
    w.w(ss_code, 3)
    w.w(0, 1)  # reserved
    w.w(frame_no, 8)  # coded number < 0x80: one byte


def _finish_frame(w):
    """Byte-align, then append CRC-8 after the header is handled by the
    caller; here we close the frame with its CRC-16."""
    w.bits += "0" * (-len(w.bits) % 8)
    body = w.bytes()
    w2 = _W()
    w2.bits = w.bits
    w2.w(_crc16_slow(body), 16)
    return w2.bytes()


def _header_with_crc(w):
    assert len(w.bits) % 8 == 0
    hdr = w.bytes()
    w.w(_crc8_slow(hdr), 8)


# ---- hand vectors ------------------------------------------------------


def test_hand_vector_constant_subframe():
    """Mono 8-bit, one 4-sample frame, CONSTANT subframe holding -3:
    every field hand-assembled per RFC 9639."""
    w = _W()
    # block size code 6 = 8-bit (bs-1) follows; rate code 13 = 16-bit Hz
    _frame_header_bits(w, 6, 13, 0, 1)  # 1 channel, ss code 1 = 8-bit
    w.w(3, 8)  # block size 4 - 1
    w.w(1000, 16)  # 1000 Hz
    _header_with_crc(w)
    w.w(0, 1)  # subframe padding bit
    w.w(0, 6)  # CONSTANT
    w.w(0, 1)  # no wasted bits
    w.w(-3, 8)  # the constant, two's complement
    buf = _streaminfo(4, 1000, 1, 8, 4) + _finish_frame(w)
    rate, bps, samples = decode_flac(buf)
    assert (rate, bps) == (1000, 8)
    assert samples.shape == (4, 1)
    assert samples.reshape(-1).tolist() == [-3, -3, -3, -3]


def test_hand_vector_fixed1_rice():
    """FIXED order 1 with a Rice(param=1) residual, derived by hand:
    samples [10, 12, 11, 13] -> residuals [+2, -1, +2] -> zigzag
    [4, 1, 4] -> (q, r) = (2,0), (0,1), (2,0); unary q is q zeros then
    a one.  Pins zigzag mapping AND unary polarity."""
    w = _W()
    _frame_header_bits(w, 6, 13, 0, 1)
    w.w(3, 8)
    w.w(1000, 16)
    _header_with_crc(w)
    w.w(0, 1)
    w.w(8 + 1, 6)  # FIXED order 1
    w.w(0, 1)
    w.w(10, 8)  # warmup
    w.w(0, 2)  # residual method 0 (Rice, 4-bit params)
    w.w(0, 4)  # partition order 0
    w.w(1, 4)  # rice parameter 1
    w.bits += "001" + "0"  # zz=4: q=2 -> 001, rem 0
    w.bits += "1" + "1"    # zz=1: q=0 -> 1, rem 1
    w.bits += "001" + "0"  # zz=4
    buf = _streaminfo(4, 1000, 1, 8, 4) + _finish_frame(w)
    assert decode_flac(buf)[2].reshape(-1).tolist() == [10, 12, 11, 13]


def test_hand_vector_lpc_and_wasted_bits():
    """LPC order 1 with coefficient 4 and shift 2 (prediction == previous
    sample) plus ONE wasted bit: decoded samples are shifted left by the
    wasted count after prediction."""
    w = _W()
    _frame_header_bits(w, 6, 13, 0, 1)
    w.w(2, 8)  # block size 3
    w.w(1000, 16)
    _header_with_crc(w)
    w.w(0, 1)
    w.w(0b100000, 6)  # LPC order (0)+1 = 1
    w.w(1, 1)  # wasted bits flag
    w.bits += "1"  # unary 0 -> wasted = 1, effective bps = 7
    w.w(5, 7)  # warmup (in the shifted domain)
    w.w(4 - 1, 4)  # precision 4
    w.w(2, 5)  # shift 2
    w.w(4, 4)  # coefficient +4 -> pred = (4*prev) >> 2 = prev
    w.w(0, 2)  # Rice method 0
    w.w(0, 4)  # partition order 0
    w.w(0, 4)  # param 0
    w.bits += "001"  # zz=2 -> residual +1
    w.bits += "01"   # zz=1 -> residual -1
    buf = _streaminfo(3, 1000, 1, 8, 3) + _finish_frame(w)
    # shifted domain: 5, 6, 5 -> output <<1: 10, 12, 10
    assert decode_flac(buf)[2].reshape(-1).tolist() == [10, 12, 10]


def test_hand_vector_escape_partition():
    """Rice escape code (param 0b1111): 5-bit raw width follows, samples
    verbatim; width 0 means all-zero residuals."""
    w = _W()
    _frame_header_bits(w, 6, 13, 0, 1)
    w.w(3, 8)
    w.w(1000, 16)
    _header_with_crc(w)
    w.w(0, 1)
    w.w(8 + 0, 6)  # FIXED order 0 (residual == samples)
    w.w(0, 1)
    w.w(0, 2)
    w.w(0, 4)
    w.w(15, 4)  # escape
    w.w(6, 5)   # 6-bit raw residuals
    for v in (7, -8, 0, 31):
        w.w(v, 6)
    buf = _streaminfo(4, 1000, 1, 8, 4) + _finish_frame(w)
    assert decode_flac(buf)[2].reshape(-1).tolist() == [7, -8, 0, 31]


def test_hand_vector_reserved_subframe_rejected():
    w = _W()
    _frame_header_bits(w, 6, 13, 0, 1)
    w.w(0, 8)
    w.w(1000, 16)
    _header_with_crc(w)
    w.w(0, 1)
    w.w(2, 6)  # reserved type
    w.w(0, 1)
    buf = _streaminfo(1, 1000, 1, 8, 1) + _finish_frame(w)
    with pytest.raises(ValueError, match="reserved subframe"):
        decode_flac(buf)


# ---- encoder round trips ----------------------------------------------


def test_roundtrip_sweep():
    rng = np.random.default_rng(4)
    for bps in (8, 12, 16, 24):
        lim = 1 << (bps - 1)
        for n in (1, 16, 300, 1000):
            s = rng.integers(-lim, lim, n)
            buf = encode_flac(s, sample_rate=8000, bps=bps, block_size=256)
            rate, got_bps, out = decode_flac(buf)
            assert (rate, got_bps) == (8000, bps)
            assert np.array_equal(out[:, 0], s), (bps, n)


def test_roundtrip_stereo_modes_with_distinct_channels():
    rng = np.random.default_rng(6)
    left = np.cumsum(rng.integers(-100, 101, 900)).clip(-30000, 30000)
    right = np.cumsum(rng.integers(-100, 101, 900)).clip(-30000, 30000)
    st = np.stack([left, right], -1)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        out = decode_flac(
            encode_flac(st, sample_rate=44100, stereo=mode, block_size=192)
        )[2]
        assert np.array_equal(out, st), mode


def test_many_frames_coded_number():
    """>128 frames forces the multi-byte UTF-8-style frame number."""
    rng = np.random.default_rng(2)
    s = rng.integers(-1000, 1000, 16 * 140)
    buf = encode_flac(s, sample_rate=1000, block_size=16)
    assert np.array_equal(decode_flac(buf)[2][:, 0], s)


def test_crc_and_md5_detect_corruption():
    rng = np.random.default_rng(3)
    s = rng.integers(-20000, 20000, 500)
    buf = bytearray(encode_flac(s, sample_rate=8000))
    # flip a byte in the middle of the (single) frame's entropy data
    buf[-10] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(buf))
    # corrupt the STREAMINFO MD5 itself: frame CRCs pass, MD5 must catch
    buf2 = bytearray(encode_flac(s, sample_rate=8000))
    buf2[8 + 18] ^= 0xFF  # first MD5 byte (4 magic + 4 header + 18)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(buf2))


def test_truncated_stream_raises():
    s = np.arange(100)
    buf = encode_flac(s, sample_rate=8000)
    with pytest.raises(ValueError):
        decode_flac(buf[: len(buf) - 7])


def test_encoder_validation():
    with pytest.raises(ValueError, match="empty"):
        encode_flac(np.zeros((0,), int), sample_rate=8000)
    with pytest.raises(ValueError, match="range"):
        encode_flac(np.array([4000]), bps=8, sample_rate=8000)
    with pytest.raises(ValueError, match="stereo"):
        encode_flac(np.zeros((4, 1), int), stereo="left_side", sample_rate=10)
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFFxxxx")


def test_flac_wav_feature_parity(spark):
    """The x112 premise: the same dyadic samples through FLAC and
    through WAV produce IDENTICAL features (both paths are lossless and
    share the mono mapping)."""
    import pandas as pd

    from modis_aggregation_spark.operators import multimodal as M

    rng = np.random.default_rng(5)
    rows = []
    for i in range(10):
        b = rng.integers(0, 256, 320, dtype=np.uint8)
        ints = (b.astype(np.int64) - 128) << 8
        floats = (b.astype(np.float64) - 128.0) / 128.0
        wav = M.encode_wav(floats, sample_rate=8000)
        mode = [None, "independent", "left_side", "right_side", "mid_side"][i % 5]
        if mode is None:
            fl = encode_flac(ints, sample_rate=8000, block_size=64)
        else:
            fl = encode_flac(
                np.stack([ints, ints], -1), sample_rate=8000,
                block_size=64, stereo=mode,
            )
        rows.append((i, wav, fl))
    wav_df = spark.createDataFrame(
        pd.DataFrame({"id": [r[0] for r in rows], "payload": [r[1] for r in rows]})
    )
    flac_df = spark.createDataFrame(
        pd.DataFrame({"id": [r[0] for r in rows], "payload": [r[2] for r in rows]})
    )
    a = M.extract_audio_features(wav_df, decoder="wav").toPandas().sort_values("id")
    b = M.extract_audio_features(flac_df, decoder="flac").toPandas().sort_values("id")
    for col in ("sample_rate", "n_samples", "duration_sec", "rms", "zero_crossings"):
        assert a[col].tolist() == b[col].tolist(), col


def test_decode_flac_mono_downmix():
    l = np.array([100, -200, 300], dtype=np.int64)
    r = np.array([300, 200, -100], dtype=np.int64)
    buf = encode_flac(np.stack([l, r], -1), sample_rate=1000, block_size=16)
    sr, mono = decode_flac_mono(buf)
    exp = ((l + r) / 2.0) / 32768.0
    assert np.allclose(mono, exp, rtol=0, atol=0)


def test_lpc_and_partitioned_residual_roundtrip():
    """LPC subframes (Levinson-Durbin fit, 12-bit quantized
    coefficients) and partition orders > 0 round-trip bit-exactly and
    beat the FIXED encoding on tonal content."""
    rng = np.random.default_rng(17)
    t = np.arange(6000)
    s = (
        (20000 * np.sin(t * 0.02) + rng.normal(0, 80, 6000))
        .astype(np.int64)
        .clip(-32768, 32767)
    )
    b_fixed = encode_flac(s, sample_rate=16000)
    b_lpc = encode_flac(
        s, sample_rate=16000, max_lpc_order=8, max_partition_order=4
    )
    assert np.array_equal(decode_flac(b_lpc)[2][:, 0], s)
    assert len(b_lpc) < len(b_fixed)
    # the stream genuinely contains an LPC subframe (type 0b1xxxxx)
    # and a nonzero partition order — decoded above, so just re-check
    # against every stereo mode too
    st = np.stack([s[:4096], s[:4096] // 2 + 100], -1)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        buf = encode_flac(
            st, sample_rate=44100, stereo=mode, max_lpc_order=6,
            max_partition_order=3, block_size=1024,
        )
        assert np.array_equal(decode_flac(buf)[2], st), mode


def test_lpc_degenerate_inputs_fall_back():
    """Constant/short/noise-floor channels must fall back to
    CONSTANT/FIXED instead of emitting a degenerate LPC fit."""
    rng = np.random.default_rng(3)
    for s in (
        np.zeros(100, int),
        np.array([5] * 50 + [9] * 50),
        rng.integers(-2, 3, 64),
        np.array([7]),
    ):
        buf = encode_flac(
            s, sample_rate=100, max_lpc_order=8, max_partition_order=2,
            block_size=32,
        )
        assert np.array_equal(decode_flac(buf)[2][:, 0], s)
