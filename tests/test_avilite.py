"""avilite RIFF/AVI container codec + the real AVI frame-sampling path
in operators/multimodal.

The container walk is EXACT (byte-offset arithmetic); frame decode
goes through sinks/jpeglite, so frames built in the JPEG codec's exact
subspace (constant even-valued 8×8 blocks, quality 50) round-trip
bit-for-bit — every test compares exactly. jpeglite itself is
independently cross-validated against javax.imageio in
tests/test_jpeglite.py; these tests add the container layer."""

import struct

import numpy as np
import pytest

from modis_aggregation_spark.operators import multimodal as M
from modis_aggregation_spark.sinks.avilite import (
    avi_frame_payloads,
    decode_avi_frames,
    encode_avi_mjpeg,
    parse_avi_meta,
    write_avi_mjpeg,
)
from modis_aggregation_spark.sinks.jpeglite import encode_jpeg


def _exact_frames(n=4, seed=7, blocks=(2, 2)):
    """Frames in jpeglite's exact subspace: each 8×8 block constant and
    even-valued → quality-50 baseline JPEG decodes bit-for-bit."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        vals = (rng.integers(0, 128, blocks) * 2).astype(np.uint8)
        out.append(np.repeat(np.repeat(vals, 8, 0), 8, 1))
    return out


def test_roundtrip_bit_exact():
    frames = _exact_frames(5)
    payloads = [encode_jpeg(f, quality=50) for f in frames]
    avi = encode_avi_mjpeg(payloads, width=16, height=16, fps_num=30)
    meta, decoded, fps = decode_avi_frames(avi)
    assert fps == 30.0
    assert meta["total_frames"] == 5 and meta["n_movi_chunks"] == 5
    assert (meta["width"], meta["height"]) == (16, 16)
    assert len(decoded) == 5
    for orig, dec in zip(frames, decoded):
        assert np.array_equal(orig, dec)


def test_metadata_fields_and_fractional_fps():
    payloads = [encode_jpeg(f, quality=50) for f in _exact_frames(2)]
    avi = encode_avi_mjpeg(
        payloads, width=16, height=16, fps_num=30000, fps_den=1001
    )
    meta = parse_avi_meta(avi)
    (s,) = meta["streams"]
    assert s["fcc_type"] == "vids" and s["compression"] == "MJPG"
    assert s["fps"] == pytest.approx(29.97, abs=0.01)
    assert meta["usec_per_frame"] == round(1_000_000 * 1001 / 30000)
    assert meta["has_index"]


def test_word_alignment_pad_bytes():
    """Odd-sized JPEG payloads force the RIFF pad-byte path; the walk
    must still find every frame and the idx1 cross-check must agree."""
    frames = _exact_frames(6, seed=11)
    payloads = [encode_jpeg(f, quality=50) for f in frames]
    # ensure we actually have odd payloads in the mix
    assert any(len(p) % 2 for p in payloads)
    avi = encode_avi_mjpeg(payloads, width=16, height=16)
    _, got = avi_frame_payloads(avi)
    assert got == payloads


def test_non_mjpg_codec_gates():
    payloads = [encode_jpeg(_exact_frames(1)[0], quality=50)]
    avi = bytearray(encode_avi_mjpeg(payloads, width=16, height=16))
    for tag in (b"MJPG",):
        i = avi.find(tag)
        while i != -1:
            avi[i : i + 4] = b"XVID"
            i = avi.find(tag)
    meta = parse_avi_meta(bytes(avi))  # metadata still parses
    assert meta["streams"][0]["compression"] == "XVID"
    with pytest.raises(NotImplementedError, match="XVID"):
        avi_frame_payloads(bytes(avi))


def test_malformed_containers_raise():
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        parse_avi_meta(b"RIFX" + b"\x00" * 64)
    payloads = [encode_jpeg(_exact_frames(1)[0], quality=50)]
    good = encode_avi_mjpeg(payloads, width=16, height=16)
    # truncation: RIFF size now overruns
    with pytest.raises(ValueError, match="overrun"):
        parse_avi_meta(good[: len(good) // 2])
    # corrupt a chunk size so it overruns its parent
    bad = bytearray(good)
    i = bad.find(b"00dc")
    struct.pack_into("<I", bad, i + 4, 1 << 30)
    with pytest.raises(ValueError, match="overruns"):
        avi_frame_payloads(bytes(bad))
    # index count mismatch: drop the movi frame but keep idx1
    with pytest.raises(ValueError):
        # zero out the 00dc fourcc so the movi walk skips it
        tampered = bytearray(good)
        tampered[i : i + 4] = b"00xx"
        avi_frame_payloads(bytes(tampered))
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi_mjpeg([], width=16, height=16)
    with pytest.raises(ValueError, match="SOI"):
        encode_avi_mjpeg([b"not a jpeg"], width=16, height=16)


def test_write_avi_sink_rgb_and_dimension_check(tmp_path):
    rng = np.random.default_rng(3)
    vals = (rng.integers(0, 128, (2, 2)) * 2).astype(np.uint8)
    gray = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    p = str(tmp_path / "clip.avi")
    write_avi_mjpeg(p, [gray, gray], fps=12, quality=50)
    with open(p, "rb") as fh:
        meta, frames, fps = decode_avi_frames(fh.read())
    assert fps == 12.0 and len(frames) == 2
    assert np.array_equal(frames[0], gray)
    with pytest.raises(ValueError, match="fixed-dimension"):
        write_avi_mjpeg(p, [gray, gray[:8]], fps=12)


def test_sample_frames_avi_real_path(spark):
    """The Spark seam: every_n/n_frames semantics, typed metadata
    columns, raw RGB frame bytes — mirroring the GIF path contract."""
    frames = _exact_frames(5, seed=21)
    payloads = [encode_jpeg(f, quality=50) for f in frames]
    avi = encode_avi_mjpeg(payloads, width=16, height=16, fps_num=24)
    df = spark.createDataFrame(
        [(9, bytearray(avi))], "id LONG, payload BINARY"
    )
    out = M.sample_frames(df, every_n=2, n_frames=3, decoder="avi").collect()
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    for r in out:
        assert (r["height"], r["width"]) == (16, 16)
        assert r["fps"] == 24.0
        want = np.repeat(frames[r["frame_idx"]][:, :, None], 3, axis=2)
        got = np.frombuffer(r["frame"], np.uint8).reshape(16, 16, 3)
        assert np.array_equal(got, want)
        assert r["mean_pixel"] == pytest.approx(want.mean())
    # past-the-end sampling drops, never pads
    short = M.sample_frames(df, every_n=4, n_frames=3, decoder="avi").collect()
    assert [r["frame_idx"] for r in short] == [0, 4]
