"""giflite codec + the real GIF decode paths in operators/multimodal.

Decode is EXACT (LZW lossless + integer palette lookup), so every test
compares bit-for-bit; the independent-decoder check uses the JVM's
javax.imageio, the same mechanism that validates pnglite."""

import numpy as np
import pytest

from modis_aggregation_spark.operators import multimodal as M
from modis_aggregation_spark.sinks.giflite import (
    decode_gif,
    encode_gif,
    write_gif,
)


def _pal(n=16, seed=5):
    return np.random.default_rng(seed).integers(0, 256, (n, 3)).astype(np.uint8)


def test_roundtrip_indices_rgb_and_interlace():
    pal = _pal()
    rng = np.random.default_rng(1)
    f1 = rng.integers(0, 16, (10, 7)).astype(np.uint8)
    f2 = rng.integers(0, 16, (10, 7)).astype(np.uint8)
    frames, delays = decode_gif(encode_gif([f1, f2], palette=pal, delay_cs=4))
    assert delays == [4, 4]
    assert np.array_equal(frames[0], pal[f1])
    assert np.array_equal(frames[1], pal[f2])
    # interlaced stream de-interlaces to the same pixels
    fi, _ = decode_gif(encode_gif([f1], palette=pal, interlace=True))
    assert np.array_equal(fi[0], pal[f1])
    # RGB input builds its own palette
    rgb = pal[f1]
    fr, _ = decode_gif(encode_gif([rgb]))
    assert np.array_equal(fr[0], rgb)


def test_too_many_colors_raises():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="256"):
        encode_gif([img])


def test_disposal2_and_transparency_compositing():
    """A hand-built stream: frame 1 full, frame 2 a partial overlay with
    a transparent index and disposal 2 — composition must show frame 1
    under the hole, then restore the region to background."""
    import struct

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    base = np.full((4, 4), 1, dtype=np.uint8)  # all red
    head = encode_gif([base], palette=pal)
    assert head.endswith(b"\x3b")
    body = bytearray(head[:-1])  # strip trailer
    # overlay: 2x2 at (1,1): [[green, transparent], [transparent, green]]
    from modis_aggregation_spark.sinks.giflite import _lzw_encode, _sub_blocks

    overlay = np.array([[2, 0], [0, 2]], dtype=np.uint8)
    body += b"\x21\xf9\x04" + struct.pack("<BHB", (2 << 2) | 1, 5, 0) + b"\x00"
    body += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)
    body += bytes([2]) + _sub_blocks(_lzw_encode(overlay.ravel(), 2))
    # third frame: full base again, to see the disposal-2 restore applied
    body += b"\x21\xf9\x04" + struct.pack("<BHB", 1 << 2, 5, 0) + b"\x00"
    body += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
    body += bytes([2]) + _sub_blocks(_lzw_encode(base.ravel(), 2))
    body += b"\x3b"
    frames, delays = decode_gif(bytes(body))
    assert len(frames) == 3
    # frame 2: green at (1,1) and (2,2); red shows through the holes
    assert frames[1][1, 1].tolist() == [0, 255, 0]
    assert frames[1][2, 2].tolist() == [0, 255, 0]
    assert frames[1][1, 2].tolist() == [255, 0, 0]
    assert frames[1][2, 1].tolist() == [255, 0, 0]
    assert frames[2][1, 1].tolist() == [255, 0, 0]  # base redrawn on top


def test_disposal3_raises():
    import struct

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    base = np.zeros((2, 2), dtype=np.uint8)
    stream = bytearray(encode_gif([base], palette=pal)[:-1])
    from modis_aggregation_spark.sinks.giflite import _lzw_encode, _sub_blocks

    stream += b"\x21\xf9\x04" + struct.pack("<BHB", 3 << 2, 0, 0) + b"\x00"
    stream += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    stream += bytes([2]) + _sub_blocks(_lzw_encode(base.ravel(), 2))
    stream += b"\x3b"
    with pytest.raises(NotImplementedError, match="disposal method 3"):
        decode_gif(bytes(stream))


def test_bad_magic_raises(tmp_path):
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"JFIF....")


def test_gif_decodes_in_jvm_imageio(spark, tmp_path):
    """Cross-validation by an INDEPENDENT decoder: javax.imageio must
    read giflite's output with matching pixels."""
    rng = np.random.default_rng(9)
    img = ((rng.integers(0, 256, (6, 9, 3)) // 64) * 64).astype(np.uint8)
    p = str(tmp_path / "x.gif")
    write_gif(p, [img])
    jvm = spark.sparkContext._gateway.jvm
    d = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(p))
    assert d is not None and d.getWidth() == 9 and d.getHeight() == 6
    for y in range(6):
        for x in range(9):
            argb = d.getRGB(x, y) & 0xFFFFFFFF
            got = ((argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF)
            assert got == tuple(int(v) for v in img[y, x]), (x, y)


def test_sample_frames_gif_real_path(spark):
    pal = _pal(8)
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 8, (5, 4)).astype(np.uint8) for _ in range(5)]
    payload = encode_gif(frames, palette=pal, delay_cs=3)
    df = spark.createDataFrame([(7, bytearray(payload))], "id LONG, payload BINARY")
    out = M.sample_frames(df, every_n=2, n_frames=3, decoder="gif").collect()
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    for r in out:
        assert (r["height"], r["width"], r["delay_cs"]) == (5, 4, 3)
        want = pal[frames[r["frame_idx"]]]
        assert np.frombuffer(r["frame"], np.uint8).reshape(5, 4, 3).tolist() \
            == want.tolist()
        assert r["mean_pixel"] == pytest.approx(want.mean())
    # past-the-end indexes are dropped, not padded
    short = M.sample_frames(df, every_n=4, n_frames=3, decoder="gif").collect()
    assert [r["frame_idx"] for r in short] == [0, 4]
    with pytest.raises(ValueError, match="unknown frame decoder"):
        M.sample_frames(df, decoder="mp4").collect()


def test_decode_images_gif_first_frame(spark):
    pal = _pal(4)
    f1 = np.zeros((8, 8), dtype=np.uint8)
    f2 = np.full((8, 8), 3, dtype=np.uint8)
    payload = encode_gif([f1, f2], palette=pal)
    df = spark.createDataFrame([(1, bytearray(payload))], "id LONG, payload BINARY")
    out = M.decode_images(df, decoder="gif").collect()[0]
    want = np.repeat(np.repeat(pal[f1][None, 0, 0], 8, 0)[None], 8, 0)
    assert np.frombuffer(out["pixels"], np.uint8).reshape(8, 8, 3).tolist() \
        == np.broadcast_to(pal[0], (8, 8, 3)).tolist()
    assert out["mean_pixel"] == pytest.approx(float(pal[0].mean()))


def test_lzw_table_reset_roundtrip():
    """Frames large/noisy enough to push the LZW dictionary past 4096
    codes exercise the encoder's clear/reset branch and the decoder's
    table cap — both must stay bit-exact (also long repetitive runs,
    which build deep dictionary chains)."""
    rng = np.random.default_rng(0)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    noisy = rng.integers(0, 256, (120, 130)).astype(np.uint8)
    frames, _ = decode_gif(encode_gif([noisy], palette=pal))
    assert np.array_equal(frames[0], pal[noisy])
    runs = np.tile(np.arange(130, dtype=np.uint8) % 7, (120, 1))
    frames2, _ = decode_gif(encode_gif([runs], palette=pal))
    assert np.array_equal(frames2[0], pal[runs])


def test_oob_image_descriptor_raises():
    """A frame rectangle outside the logical screen is a malformed
    stream → named ValueError, not a numpy broadcast error."""
    import struct

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    base = np.zeros((2, 2), dtype=np.uint8)
    stream = bytearray(encode_gif([base], palette=pal)[:-1])
    from modis_aggregation_spark.sinks.giflite import _lzw_encode, _sub_blocks

    stream += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)  # 2x2 @ (1,1) on 2x2
    stream += bytes([2]) + _sub_blocks(_lzw_encode(base.ravel(), 2))
    stream += b"\x3b"
    with pytest.raises(ValueError, match="logical screen"):
        decode_gif(bytes(stream))
