"""sziplite — pure-Python SZIP / CCSDS 121.0 extended-Rice codec.

Proof pattern mirrors the round-8 N-bit work: hand-derived bitstream
vectors pin every bit convention (ID widths, FS polarity, zero-block
run semantics incl. ROS, reference-sample placement, second-extension
gamma packing) so the encoder and decoder cannot share a hidden wrong
convention; round-trips sweep the parameter space.  No szip/libaec
binary exists in this container, so C-library cross-validation is
impossible — these vectors ARE the contract (documented in the module
docstring)."""

import numpy as np
import pytest

from modis_aggregation_spark.sinks.sziplite import (
    SZ_EC_OPTION_MASK,
    SZ_LSB_OPTION_MASK,
    SZ_MSB_OPTION_MASK,
    SZ_NN_OPTION_MASK,
    SZ_RAW_OPTION_MASK,
    szip_decode,
    szip_encode,
)

EC = SZ_EC_OPTION_MASK | SZ_MSB_OPTION_MASK
NN = SZ_NN_OPTION_MASK | SZ_MSB_OPTION_MASK


def _bits(s: str) -> bytes:
    """Test-local MSB-first bit assembler (independent of the module's
    _BitWriter): '0'/'1' string -> zero-padded bytes."""
    s = s.replace(" ", "")
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def _fs(v: int) -> str:
    return "0" * v + "1"


def test_known_answer_split_k1_decode():
    """8-bit EC block, sample-splitting k=1 (ID=k+1=2 over 3 ID bits):
    FS-coded high parts then one LSB per sample."""
    samples = [3, 1, 4, 1, 5, 9, 2, 6]
    stream = "010" + "".join(_fs(v >> 1) for v in samples) + "".join(
        str(v & 1) for v in samples
    )
    got = szip_decode(_bits(stream), 8, 8, 8, 8, EC)
    assert list(got) == samples


def test_known_answer_zero_block_runs():
    # ROS (fs=4): the rest of the scanline's blocks are zero
    assert szip_decode(_bits("000 0 " + _fs(4)), 16, 8, 4, 16, EC) == b"\0" * 16
    # literal run (fs=3 -> 4 blocks)
    assert szip_decode(_bits("000 0 " + _fs(3)), 16, 8, 4, 16, EC) == b"\0" * 16
    # two scanlines of 8 -> two independent ROS runs
    two = _bits("000 0 " + _fs(4) + " 000 0 " + _fs(4))
    assert szip_decode(two, 16, 8, 4, 8, EC) == b"\0" * 16


def test_known_answer_nn_reference_split_k0():
    """NN mode: reference sample raw after the ID, then J-1 FS-coded
    mapped deltas.  [10, 11, 9, 9] maps to deltas [2, 3, 0]."""
    stream = "001" + "00001010" + _fs(2) + _fs(3) + _fs(0)
    got = szip_decode(_bits(stream), 4, 8, 4, 4, NN)
    assert list(got) == [10, 11, 9, 9]


def test_known_answer_second_extension():
    """SE (low-entropy ID + selector 1): J/2 gammas, gamma =
    (d1+d2)(d1+d2+1)/2 + d2.  [1,0,2,1] -> gammas 1, 7."""
    stream = "000" + "1" + _fs(1) + _fs(7)
    got = szip_decode(_bits(stream), 4, 8, 4, 4, EC)
    assert list(got) == [1, 0, 2, 1]


def test_known_answer_uncompressed():
    samples = [255, 0, 255, 128]
    stream = "111" + "".join(format(v, "08b") for v in samples)
    got = szip_decode(_bits(stream), 4, 8, 4, 4, EC)
    assert list(got) == samples


def test_known_answer_16bit_id_width():
    """n=16 uses 4 ID bits and 2-byte big-endian samples: uncompressed
    block of [258, 0] = ID '1111' + 2x16 raw bits."""
    stream = "1111" + format(258, "016b") + format(0, "016b")
    got = szip_decode(_bits(stream), 4, 16, 2, 2, EC)
    assert got == (258).to_bytes(2, "big") + b"\0\0"


def test_roundtrip_parameter_sweep():
    rng = np.random.default_rng(42)
    cases = [
        (8, 8, 13, NN), (8, 8, 13, EC),
        (8, 16, 64, NN), (16, 16, 37, NN),
        (16, 32, 128, EC), (32, 8, 9, NN),
        (8, 8, 16, NN | SZ_LSB_OPTION_MASK & ~SZ_MSB_OPTION_MASK),
    ]
    for n, J, pps, mask in cases:
        mask = (mask | SZ_MSB_OPTION_MASK) if not (mask & SZ_LSB_OPTION_MASK) else mask
        size = {8: 1, 16: 2, 32: 4}[n]
        for total in (1, pps - 1, pps, 3 * pps + 5):
            vals = rng.integers(0, 1 << min(n, 30), total, dtype=np.uint64)
            order = "<" if mask & SZ_LSB_OPTION_MASK else ">"
            raw = vals.astype(f"{order}u{size}").tobytes()
            enc = szip_encode(raw, n, J, pps, mask)
            assert szip_decode(enc, len(raw), n, J, pps, mask) == raw, (
                n, J, pps, mask, total,
            )


def test_roundtrip_smooth_data_compresses():
    """NN preprocessing on smooth data must actually compress — the
    whole point of Rice coding on imagery-like fields."""
    x = (1000 + 40 * np.sin(np.arange(4096) / 50.0)).astype(">u2")
    raw = x.tobytes()
    enc = szip_encode(raw, 16, 16, 256, NN)
    assert len(enc) < len(raw) / 2
    assert szip_decode(enc, len(raw), 16, 16, 256, NN) == raw


def test_roundtrip_int16_bit_patterns():
    """Signed int16 SDS round-trips via its raw bit patterns (szip has
    no signed mode; HDF4 hands it the type's bits)."""
    rng = np.random.default_rng(7)
    x = rng.integers(-30000, 30000, 500, dtype=np.int16).astype(">i2")
    raw = x.tobytes()
    enc = szip_encode(raw, 16, 16, 100, NN)
    assert szip_decode(enc, len(raw), 16, 16, 100, NN) == raw


def test_zero_run_capped_at_segment_boundary():
    """A zero run may not cross a 64-block segment: 65 zero blocks in
    one scanline must decode from ROS + a second run, and the encoder
    must emit exactly that shape."""
    raw = b"\0" * (65 * 8)
    enc = szip_encode(raw, 8, 8, 65 * 8, EC)
    assert szip_decode(enc, len(raw), 8, 8, 65 * 8, EC) == raw
    # first segment: ID(0000...) is 4 bits '0000'? n=8 -> 3+1; ROS fs=4;
    # second segment: one zero block, run reaches scanline end -> ROS
    assert enc == _bits("000 0 " + _fs(4) + " 000 0 " + _fs(4))


def test_validation_raises():
    with pytest.raises(ValueError, match="exactly one"):
        szip_encode(b"\0", 8, 8, 8, SZ_MSB_OPTION_MASK)
    with pytest.raises(ValueError, match="even"):
        szip_encode(b"\0", 8, 7, 8, EC)
    with pytest.raises(NotImplementedError, match="RAW"):
        szip_decode(b"", 8, 8, 8, 8, EC | SZ_RAW_OPTION_MASK)
    with pytest.raises(ValueError, match="truncated"):
        szip_decode(b"", 8, 8, 8, 8, EC)
    with pytest.raises(ValueError, match="exceeds bits_per_pixel"):
        szip_encode(bytes([255]), 4, 8, 8, EC)


def test_roundtrip_full_range_32bit():
    """32-bit samples near 2^32 (float bit patterns): the SE gamma is
    ~2^65 there — the assessment must use arbitrary-precision ints (an
    int64 wrap once chose SE with a wrapped gamma and emitted an
    astronomically long FS codeword)."""
    rng = np.random.default_rng(5)
    f32 = rng.normal(size=64).astype(">f4")
    raw = f32.tobytes()
    for mask in (EC, NN):
        enc = szip_encode(raw, 32, 16, 16, mask)
        assert szip_decode(enc, len(raw), 32, 16, 16, mask) == raw


def test_hdf5_szip_filter_chunk_decode():
    """hdf5lite's filter pipeline (round 11): the HDF5 szip filter
    (id 4) payload is a little-endian uint32 uncompressed size followed
    by the raw szip codestream; cd_values order is (options_mask,
    pixels_per_block, bits_per_pixel, pixels_per_scanline)."""
    import struct

    from modis_aggregation_spark.sinks.hdf5lite import _szip_filter_decode

    x = (500 + 20 * np.sin(np.arange(256) / 5.0)).astype(">u2")
    raw = x.tobytes()
    stream = szip_encode(raw, 16, 16, 32, NN)
    chunk = struct.pack("<I", len(raw)) + stream
    got = _szip_filter_decode(chunk, (NN, 16, 16, 32))
    assert got == raw
    with pytest.raises(ValueError, match="cd_values"):
        _szip_filter_decode(chunk, (NN, 16))
    with pytest.raises(ValueError, match="size word"):
        _szip_filter_decode(b"\x01", (NN, 16, 16, 32))
