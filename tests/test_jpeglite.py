"""jpeglite codec + the real JPEG decode path in operators/multimodal.

JPEG is lossy, so tests split into two regimes:

* the EXACT subspace — grayscale images whose 8×8 blocks are constant
  with even sample values: the DC coefficient 8·(v−128) divides the
  Annex-K DC quantizer (16 at quality 50) and every AC is zero, so
  baseline encode→decode is bit-exact.  This subspace is what the x65
  contract query uses, giving it a codec-free arithmetic oracle.
* the general path — tolerance-bounded comparisons, including
  cross-validation against the JVM's javax.imageio (an independent
  production codec) in BOTH directions, with 4:2:0 chroma-subsampled
  streams from the imageio side.
"""

import numpy as np
import pytest

from modis_aggregation_spark.operators import multimodal as M
from modis_aggregation_spark.sinks.jpeglite import (
    QT_LUMA,
    decode_jpeg,
    encode_jpeg,
    quality_tables,
)


def _const_block_gray(vals: np.ndarray) -> np.ndarray:
    """(by, bx) even-valued block grid -> (8by, 8bx) uint8 image."""
    return np.repeat(np.repeat(vals.astype(np.uint8), 8, 0), 8, 1)


def test_exact_subspace_roundtrip():
    rng = np.random.default_rng(0)
    vals = (rng.integers(0, 128, (3, 4)) * 2).astype(np.uint8)
    img = _const_block_gray(vals)
    out = decode_jpeg(encode_jpeg(img, quality=50))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.array_equal(out, img)


def test_exact_subspace_every_even_value():
    # all 128 even sample values in one 8x16-block image
    vals = np.arange(0, 256, 2, dtype=np.uint8).reshape(8, 16)
    img = _const_block_gray(vals)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=50)), img)


def test_smooth_roundtrip_tolerance():
    x = np.linspace(0, 255, 64)
    img = (np.add.outer(x, x) / 2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_rgb_roundtrip_and_odd_dims():
    img = np.zeros((23, 37, 3), np.uint8)
    img[..., 0] = np.linspace(10, 240, 37).astype(np.uint8)[None, :]
    img[..., 1] = np.linspace(20, 200, 23).astype(np.uint8)[:, None]
    img[..., 2] = 77
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (23, 37, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


def test_restart_interval_stream_identical_decode():
    x = np.linspace(0, 255, 48)
    img = (np.add.outer(x, x) / 2).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=3))
    assert np.array_equal(plain, rst)


def test_quality_tables_scale():
    q50_l, _ = quality_tables(50)
    assert np.array_equal(q50_l, QT_LUMA)  # quality 50 = unscaled Annex K
    q90_l, _ = quality_tables(90)
    assert (q90_l <= q50_l).all() and (q90_l >= 1).all()
    with pytest.raises(ValueError):
        quality_tables(0)


def test_bad_magic_and_bad_inputs():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG....")
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8), np.float64))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8, 2), np.uint8))


def test_truncated_scan_raises():
    img = _const_block_gray(np.full((2, 2), 100, np.uint8))
    data = bytearray(encode_jpeg(img, quality=50))
    # drop the EOI and most of the entropy data: bit reader pads with 1s,
    # which must NOT silently yield a valid 4-MCU scan
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data[: data.index(b"\xff\xda") + 10]))


# ---- cross-validation against javax.imageio (independent codec) ----


def _set_gray(jvm, img):
    BufferedImage = jvm.java.awt.image.BufferedImage
    h, w = img.shape
    bi = BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    ras = bi.getRaster()
    for r in range(h):
        for c in range(w):
            ras.setSample(c, r, 0, int(img[r, c]))
    return bi


def _s32(v: int) -> int:
    return v - (1 << 32) if v >= (1 << 31) else v


def test_imageio_decodes_jpeglite_gray(spark, tmp_path):
    """javax.imageio must decode jpeglite output within IDCT-rounding
    tolerance (raw raster samples — BufferedImage.getRGB would add a
    linear-gray→sRGB colorspace conversion)."""
    x = np.linspace(0, 255, 48)
    img = (np.add.outer(x, x) / 2).astype(np.uint8)
    p = str(tmp_path / "g.jpg")
    open(p, "wb").write(encode_jpeg(img, quality=95))
    jvm = spark.sparkContext._gateway.jvm
    d = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(p))
    assert d is not None and d.getWidth() == 48 and d.getHeight() == 48
    ras = d.getRaster()
    got = np.array(
        [[ras.getSample(c, r, 0) for c in range(48)] for r in range(48)]
    )
    assert np.abs(got - img.astype(int)).max() <= 2


def test_imageio_decodes_jpeglite_rgb(spark, tmp_path):
    img = np.zeros((16, 24, 3), np.uint8)
    img[..., 0] = np.linspace(10, 240, 24).astype(np.uint8)[None, :]
    img[..., 1] = np.linspace(20, 200, 16).astype(np.uint8)[:, None]
    img[..., 2] = 99
    p = str(tmp_path / "c.jpg")
    open(p, "wb").write(encode_jpeg(img, quality=95))
    jvm = spark.sparkContext._gateway.jvm
    d = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(p))
    assert d is not None
    got = np.zeros((16, 24, 3), int)
    for r in range(16):
        for c in range(24):
            argb = d.getRGB(c, r) & 0xFFFFFFFF
            got[r, c] = [(argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF]
    assert np.abs(got - img.astype(int)).max() <= 6


def test_jpeglite_decodes_imageio_gray(spark, tmp_path):
    x = np.linspace(0, 255, 48)
    img = (np.add.outer(x, x) / 2).astype(np.uint8)
    jvm = spark.sparkContext._gateway.jvm
    p = str(tmp_path / "jg.jpg")
    jvm.javax.imageio.ImageIO.write(_set_gray(jvm, img), "jpg", jvm.java.io.File(p))
    ours = decode_jpeg(open(p, "rb").read())
    assert ours.shape == (48, 48)
    assert np.abs(ours.astype(int) - img.astype(int)).max() <= 3


def test_jpeglite_decodes_imageio_rgb_420(spark, tmp_path):
    """imageio's default color writer emits 4:2:0 chroma subsampling
    (2×2 luma sampling factors) — the decoder's multi-block-MCU +
    upsample path, exercised against a production encoder."""
    img = np.zeros((24, 32, 3), np.uint8)
    img[..., 0] = np.linspace(10, 240, 32).astype(np.uint8)[None, :]
    img[..., 1] = np.linspace(20, 200, 24).astype(np.uint8)[:, None]
    img[..., 2] = 99
    jvm = spark.sparkContext._gateway.jvm
    BufferedImage = jvm.java.awt.image.BufferedImage
    bi = BufferedImage(32, 24, BufferedImage.TYPE_3BYTE_BGR)
    for r in range(24):
        for c in range(32):
            bi.setRGB(
                c, r,
                _s32(
                    (0xFF << 24)
                    | (int(img[r, c, 0]) << 16)
                    | (int(img[r, c, 1]) << 8)
                    | int(img[r, c, 2])
                ),
            )
    p = str(tmp_path / "jc.jpg")
    jvm.javax.imageio.ImageIO.write(bi, "jpg", jvm.java.io.File(p))
    # confirm the stream really is subsampled (luma sampling 0x22)
    data = open(p, "rb").read()
    sof = data.index(b"\xff\xc0")
    assert data[sof + 11] == 0x22, "imageio no longer writes 4:2:0?"
    ours = decode_jpeg(data)
    assert ours.shape == (24, 32, 3)
    diff = np.abs(ours.astype(int) - img.astype(int))
    # replicate-vs-fancy chroma upsampling differs most at gradients;
    # bound both the mean and the worst pixel
    assert diff.mean() <= 4 and diff.max() <= 16


def _write_imageio_progressive_gray(jvm, img, p):
    iw = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    param = iw.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    fos = jvm.javax.imageio.stream.FileImageOutputStream(jvm.java.io.File(p))
    iw.setOutput(fos)
    iw.write(None, jvm.javax.imageio.IIOImage(_set_gray(jvm, img), None, None), param)
    fos.close()


def test_jpeglite_decodes_imageio_progressive_gray(spark, tmp_path):
    """A REAL progressive stream written by a production encoder
    (imageio's default progressive scan script: spectral selection +
    successive approximation with AC refinement passes) must decode
    within IDCT-rounding tolerance — the round-7 un-gating of SOF2."""
    jvm = spark.sparkContext._gateway.jvm
    x = np.linspace(0, 255, 48)
    img = (np.add.outer(x, x) / 2).astype(np.uint8)
    p = str(tmp_path / "prog.jpg")
    _write_imageio_progressive_gray(jvm, img, p)
    data = open(p, "rb").read()
    assert b"\xff\xc2" in data  # really progressive (SOF2)
    ours = decode_jpeg(data)
    assert ours.shape == (48, 48)
    assert np.abs(ours.astype(int) - img.astype(int)).max() <= 3


def test_jpeglite_decodes_imageio_progressive_rgb_420(spark, tmp_path):
    """Progressive + 4:2:0 subsampling together: non-interleaved AC
    scans over the chroma components' REAL (unpadded) block grids —
    the geometry sequential streams never exercise."""
    jvm = spark.sparkContext._gateway.jvm
    img = np.zeros((24, 32, 3), np.uint8)
    img[..., 0] = np.linspace(10, 240, 32).astype(np.uint8)[None, :]
    img[..., 1] = np.linspace(20, 200, 24).astype(np.uint8)[:, None]
    img[..., 2] = 99
    BufferedImage = jvm.java.awt.image.BufferedImage
    bi = BufferedImage(32, 24, BufferedImage.TYPE_3BYTE_BGR)
    for r in range(24):
        for c in range(32):
            bi.setRGB(
                c, r,
                _s32(
                    (0xFF << 24)
                    | (int(img[r, c, 0]) << 16)
                    | (int(img[r, c, 1]) << 8)
                    | int(img[r, c, 2])
                ),
            )
    iw = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    param = iw.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    p = str(tmp_path / "prog_rgb.jpg")
    fos = jvm.javax.imageio.stream.FileImageOutputStream(jvm.java.io.File(p))
    iw.setOutput(fos)
    iw.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    fos.close()
    data = open(p, "rb").read()
    assert b"\xff\xc2" in data
    ours = decode_jpeg(data)
    assert ours.shape == (24, 32, 3)
    diff = np.abs(ours.astype(int) - img.astype(int))
    assert diff.mean() <= 4 and diff.max() <= 16


def test_imageio_decodes_jpeglite_progressive(spark, tmp_path):
    """The other direction: imageio (independent production codec) must
    decode OUR progressive streams — DC-first/AC-first-with-EOB-runs/
    DC-refine scan script, per-scan flat Huffman tables."""
    from modis_aggregation_spark.sinks.jpeglite import encode_jpeg_progressive

    jvm = spark.sparkContext._gateway.jvm
    x = np.linspace(0, 255, 48)
    img = (np.add.outer(x, x) / 2).astype(np.uint8)
    p = str(tmp_path / "ours_prog.jpg")
    open(p, "wb").write(encode_jpeg_progressive(img, quality=95))
    d = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(p))
    assert d is not None, "imageio rejected our progressive stream"
    ras = d.getRaster()
    got = np.array(
        [[ras.getSample(c, r, 0) for c in range(48)] for r in range(48)]
    )
    assert np.abs(got - img.astype(int)).max() <= 2


def test_progressive_roundtrip_equals_baseline():
    """At the same quality, the progressive scan script encodes the
    SAME quantized coefficients as the baseline encoder (Al=0 AC scans,
    DC low bit restored by the refinement pass) — decode must be
    bit-identical, including odd dimensions and RGB."""
    from modis_aggregation_spark.sinks.jpeglite import encode_jpeg_progressive

    rng = np.random.default_rng(3)
    for shape in [(48, 48), (24, 32, 3), (17, 23), (8, 8), (9, 15, 3)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=50))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=50))
        assert np.array_equal(base, prog), shape
    # smooth image -> long all-zero AC bands -> real EOB runs on the wire
    x = np.linspace(0, 255, 64)
    img = (np.add.outer(x, x) / 2).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, quality=50)),
        decode_jpeg(encode_jpeg_progressive(img, quality=50)),
    )


def test_progressive_exact_subspace():
    """Constant even-valued 8x8 blocks at quality 50 (the x65/x88 oracle
    subspace) survive the progressive path bit-exactly."""
    from modis_aggregation_spark.sinks.jpeglite import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    vals = (rng.integers(0, 128, (2, 2)) * 2).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(img, quality=50)), img
    )


def test_arithmetic_coding_still_gated():
    """SOF9 (arithmetic-coded sequential) stays an honest gate: flip a
    real baseline stream's SOF0 marker to SOF9."""
    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3).astype(np.uint8)
    data = bytearray(encode_jpeg(img, quality=75))
    sof = bytes(data).index(b"\xff\xc0")
    data[sof + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(data))


# ---- the Spark seam: decode_images(decoder="jpeg") ----


def test_decode_images_jpeg_real_path(spark):
    rng = np.random.default_rng(7)
    rows = []
    imgs = {}
    for i in range(6):
        vals = (rng.integers(0, 128, (2, 2)) * 2).astype(np.uint8)
        img = _const_block_gray(vals)
        imgs[i] = img
        rows.append((i, bytearray(encode_jpeg(img, quality=50))))
    df = spark.createDataFrame(rows, "id LONG, payload BINARY")
    out = {r["id"]: r for r in M.decode_images(df, decoder="jpeg").collect()}
    ridx = (np.arange(8) * 16) // 8
    for i, img in imgs.items():
        r = out[i]
        assert (r["height"], r["width"], r["channels"]) == (8, 8, 3)
        want = np.repeat(img[ridx][:, ridx][:, :, None], 3, axis=2)
        got = np.frombuffer(r["pixels"], np.uint8).reshape(8, 8, 3)
        # exact: constant even blocks survive the codec bit-for-bit
        assert np.array_equal(got, want)
        assert r["mean_pixel"] == pytest.approx(float(want.mean()))


def test_decode_images_jpeg_rejects_non_jpeg(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNGxxxx"))], "id LONG, payload BINARY"
    )
    with pytest.raises(Exception, match="non-JPEG"):
        M.decode_images(df, decoder="jpeg").collect()


def _multiscan_sequential_rgb(img, quality=75, drop_last_scan=False):
    """Build a VALID sequential (SOF0) JPEG that spreads its three
    components over three single-component scans — the T.81 layout the
    round-7 review found decode_jpeg silently mis-decoding (it used to
    stop after the first SOS). Reuses jpeglite's own encode pieces."""
    import struct as _struct

    from modis_aggregation_spark.sinks import jpeglite as J

    h, w = img.shape[:2]
    qluma, qchroma = J.quality_tables(quality)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(
        img.astype(np.float64), [(0, ph - h), (0, pw - w), (0, 0)],
        mode="edge",
    )
    r, g, b = padded[..., 0], padded[..., 1], padded[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [y - 128.0, cb - 128.0, cr - 128.0]
    qts = [qluma, qchroma, qchroma]
    qcoef = []
    for plane, qt in zip(planes, qts):
        f = J._fdct_blocks(plane).reshape(-1, 64)
        qz = np.round(f / qt[np.newaxis, :]).astype(np.int64)
        qcoef.append(qz[:, J.ZIGZAG])

    out = bytearray(b"\xff\xd8")
    for tq, qt in enumerate(qts[:2]):
        out += b"\xff\xdb" + _struct.pack(">HB", 67, tq) + bytes(
            int(v) for v in qt[J.ZIGZAG]
        )
    out += b"\xff\xc0" + _struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += _struct.pack(">BBB", cid, 0x11, tq)
    hts = [
        (0x00, J.HUFF_DC_LUMA), (0x10, J.HUFF_AC_LUMA),
        (0x01, J.HUFF_DC_CHROMA), (0x11, J.HUFF_AC_CHROMA),
    ]
    enc_tabs = {}
    for tcth, (bits, values) in hts:
        out += b"\xff\xc4" + _struct.pack(">HB", 19 + len(values), tcth)
        out += bytes(bits) + bytes(values)
        enc_tabs[tcth] = J._enc_table(bits, values)
    n_scans = 2 if drop_last_scan else 3
    for ci in range(n_scans):
        cid = ci + 1
        td, ta = (0x00, 0x10) if ci == 0 else (0x01, 0x11)
        out += b"\xff\xda" + _struct.pack(">HB", 8, 1)
        out += _struct.pack(">BB", cid, ((0 if ci == 0 else 1) << 4)
                            | (0 if ci == 0 else 1))
        out += _struct.pack(">BBB", 0, 63, 0)
        wr = J._BitWriter()
        pred = 0
        for t in range(qcoef[ci].shape[0]):
            zz = qcoef[ci][t]
            s, field = J._magnitude(int(zz[0]) - pred)
            pred = int(zz[0])
            code, ln = enc_tabs[td][s]
            wr.write(code, ln)
            if s:
                wr.write(field, s)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = enc_tabs[ta][0xF0]
                    wr.write(code, ln)
                    run -= 16
                s, field = J._magnitude(v)
                code, ln = enc_tabs[ta][(run << 4) | s]
                wr.write(code, ln)
                wr.write(field, s)
                run = 0
            if run:
                code, ln = enc_tabs[ta][0x00]
                wr.write(code, ln)
        wr.flush()
        out += wr.out
    out += b"\xff\xd9"
    return bytes(out)


def test_multiscan_sequential_decodes():
    """A sequential frame with one SOS per component must decode
    identically to the interleaved single-scan encoding of the same
    coefficients (round-7 review fix — previously silently grayscale)."""
    img = np.zeros((16, 24, 3), np.uint8)
    img[..., 0] = np.linspace(10, 240, 24).astype(np.uint8)[None, :]
    img[..., 1] = np.linspace(20, 200, 16).astype(np.uint8)[:, None]
    img[..., 2] = 99
    multi = decode_jpeg(_multiscan_sequential_rgb(img, quality=75))
    single = decode_jpeg(encode_jpeg(img, quality=75))
    assert np.array_equal(multi, single)


def test_multiscan_missing_component_raises():
    """A sequential frame whose scans never cover one component must
    raise, not IDCT the gap to a flat plane."""
    img = np.full((8, 8, 3), 120, np.uint8)
    data = _multiscan_sequential_rgb(img, drop_last_scan=True)
    with pytest.raises(ValueError, match="appear in no SOS"):
        decode_jpeg(data)
