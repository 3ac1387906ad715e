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


def test_sof9_arithmetic_matches_huffman_pixels():
    """Sequential arithmetic coding (SOF9, round 12): the entropy layer
    is the ONLY difference from the Huffman path, so decoding the
    arithmetic stream must reproduce the Huffman stream's pixels
    bit-for-bit — and the QM coder should compress tighter than the
    Annex K Huffman tables on noise."""
    rng = np.random.default_rng(12)
    for shape in [(8, 8), (24, 40), (16, 16, 3), (33, 17, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        ea = encode_jpeg(img, quality=75, arithmetic=True)
        eh = encode_jpeg(img, quality=75, arithmetic=False)
        assert b"\xff\xc9" in ea and b"\xff\xcc" in ea  # SOF9 + DAC
        assert b"\xff\xc4" not in ea  # no Huffman tables
        assert np.array_equal(decode_jpeg(ea), decode_jpeg(eh))
        assert len(ea) < len(eh)


def test_sof9_arithmetic_restart_intervals():
    """Restart markers reset the QM statistics, predictors, and DC
    conditioning on both sides; pixels must still match the Huffman
    path exactly."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    for ri in (1, 2, 5):
        ea = encode_jpeg(img, quality=75, restart_interval=ri,
                         arithmetic=True)
        eh = encode_jpeg(img, quality=75, restart_interval=ri)
        assert np.array_equal(decode_jpeg(ea), decode_jpeg(eh))


def test_sof9_arithmetic_12bit():
    """SOF9 is the arithmetic EXTENDED sequential process: 12-bit
    samples ride the same DC/AC decision trees (magnitude ladders just
    grow taller)."""
    rng = np.random.default_rng(14)
    img = rng.integers(0, 4096, size=(16, 16), dtype=np.uint16)
    ea = encode_jpeg(img, quality=90, precision=12, arithmetic=True)
    eh = encode_jpeg(img, quality=90, precision=12)
    da, dh = decode_jpeg(ea), decode_jpeg(eh)
    assert da.dtype == np.uint16
    assert np.array_equal(da, dh)


def test_sof9_arithmetic_cmyk():
    """4-component (CMYK) frames interleave four components per MCU
    through one shared conditioning table pair."""
    rng = np.random.default_rng(15)
    img = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    ea = encode_jpeg(img, quality=85, arithmetic=True)
    eh = encode_jpeg(img, quality=85)
    assert np.array_equal(decode_jpeg(ea), decode_jpeg(eh))


def test_sof9_arithmetic_default_conditioning_without_dac():
    """T.81 F.1.4.4.1.4: when no DAC segment arrives, decoders use the
    default conditioning (DC L=0/U=1, AC Kx=5) — which is exactly what
    the encoder declares, so stripping the DAC segment must not change
    a single pixel."""
    rng = np.random.default_rng(16)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    ea = bytearray(encode_jpeg(img, quality=75, arithmetic=True))
    i = bytes(ea).index(b"\xff\xcc")
    seg_len = (ea[i + 2] << 8) | ea[i + 3]
    stripped = bytes(ea[:i]) + bytes(ea[i + 2 + seg_len:])
    assert b"\xff\xcc" not in stripped
    assert np.array_equal(decode_jpeg(stripped), decode_jpeg(bytes(ea)))


def test_dac_conditioning_validation():
    """Malformed DAC parameters fail loudly: DC L > U and AC Kx
    outside 1..63 are spec violations (B.2.4.3 / Table B.6)."""
    img = np.zeros((8, 8), np.uint8)
    buf = bytearray(encode_jpeg(img, arithmetic=True))
    i = bytes(buf).index(b"\xff\xcc")
    bad_dc = bytearray(buf)
    bad_dc[i + 5] = 0x15  # Cs: L=5 (low nibble) > U=1 (high nibble)
    with pytest.raises(ValueError, match="DAC DC"):
        decode_jpeg(bytes(bad_dc))
    bad_ac = bytearray(buf)
    j = i + 6  # the (0x10, Kx) pair
    assert bad_ac[j] == 0x10
    bad_ac[j + 1] = 0
    with pytest.raises(ValueError, match="DAC AC"):
        decode_jpeg(bytes(bad_ac))


def test_sof10_progressive_arithmetic_matches_huffman():
    """Progressive arithmetic frames (SOF10): the multi-scan script
    (interleaved DC first Al=1, per-component AC first, DC refinement)
    through the QM coder must land on the same coefficients as the
    Huffman progressive writer — pixels identical."""
    from modis_aggregation_spark.sinks.jpeglite import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(17)
    for shape in [(8, 8), (16, 16), (40, 24, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        pa = encode_jpeg_progressive(img, quality=75, arithmetic=True)
        ph = encode_jpeg_progressive(img, quality=75)
        assert b"\xff\xca" in pa and b"\xff\xcc" in pa
        assert np.array_equal(decode_jpeg(pa), decode_jpeg(ph))
        assert len(pa) < len(ph)


def test_sof10_arithmetic_exact_subspace():
    """The x65/x88 exact subspace survives the arithmetic progressive
    path bit-for-bit (this is the property the x114 contract query
    rides)."""
    from modis_aggregation_spark.sinks.jpeglite import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(18)
    vals = (rng.integers(0, 128, (2, 2)) * 2).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(img, quality=50,
                                            arithmetic=True)), img
    )
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, quality=50, arithmetic=True)), img
    )


def _arith_encode_ac_refine(code, enc_fixed, ast, zz, ss, se, al):
    """Test-local mirror of _decode_ac_refine_arith (G.2.2 over
    F.1.4.4.2): correction decision per already-significant
    coefficient, significance+sign for newly-significant ones, EOB
    decisions only beyond the last previously-significant index."""
    p = al + 1
    kex = 0
    kend = 0
    for k in range(ss, se + 1):
        if abs(zz[k]) >> p:
            kex = k
        if abs(zz[k]) >> al:
            kend = k
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if k > kend:
                code(ast, st, 1)  # EOB
                return
            code(ast, st, 0)
        while True:
            v = abs(zz[k]) >> al
            if abs(zz[k]) >> p:  # already significant: correction bit
                code(ast, st + 2, v & 1)
                break
            if v:  # newly significant: significance then sign
                code(ast, st + 1, 1)
                enc_fixed(1 if zz[k] < 0 else 0)
                break
            code(ast, st + 1, 0)
            st += 3
            k += 1
        k += 1


def test_sof10_ac_refinement_arithmetic():
    """AC refinement scans (Ah>0) through the QM coder: hand-build a
    single-block SOF10 stream — DC first (Al=0), AC first (Al=1), AC
    refinement (Ah=1/Al=0) — with a flat quantization table, and check
    it decodes to the same pixels as the equivalent sequential SOF9
    stream carrying the full-precision coefficients."""
    import struct as _struct

    from modis_aggregation_spark.sinks.jpeglite import (
        _encode_arith_entropy,
        _stuff_ff,
    )
    from modis_aggregation_spark.sinks.qmcoder import (
        FIXED_BIN,
        QMEncoder,
        new_ac_stats,
        new_dc_stats,
    )

    # zig-zag coefficients: odd/even magnitudes, both signs, a value at
    # the band end — exercises correction bits, new significance below
    # and above kex, and the EOB decision
    zz = [0] * 64
    zz[0] = 5
    zz[1] = 3
    zz[2] = -3
    zz[5] = 1
    zz[9] = -1
    zz[20] = 7
    zz[63] = -2

    def seg(marker, payload):
        return bytes([0xFF, marker]) + _struct.pack(
            ">H", 2 + len(payload)
        ) + payload

    head = b"\xff\xd8"
    head += seg(0xDB, b"\x00" + bytes([1] * 64))  # flat DQT
    head += seg(0xCC, bytes([0x00, 0x10, 0x10, 5]))  # default DAC

    fixed = bytearray([FIXED_BIN])

    # --- progressive (SOF10) stream ---
    prog = bytearray(head)
    prog += seg(0xCA, _struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    # scan 1: DC first, Al=0
    prog += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    enc = QMEncoder()
    from modis_aggregation_spark.sinks.jpeglite import _arith_encode_dc

    _arith_encode_dc(enc.encode, new_dc_stats(), 0, zz[0], 0, 1)
    prog += _stuff_ff(enc.flush())
    # scan 2: AC first, Ss=1..63, Al=1 (point-transformed magnitudes)
    prog += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
    from modis_aggregation_spark.sinks.jpeglite import _arith_encode_ac_band

    shifted = [0] + [
        (abs(v) >> 1) * (1 if v >= 0 else -1) for v in zz[1:]
    ]
    enc = QMEncoder()
    _arith_encode_ac_band(
        enc.encode, lambda d: enc.encode(fixed, 0, d), new_ac_stats(),
        shifted, 1, 63, 5,
    )
    prog += _stuff_ff(enc.flush())
    # scan 3: AC refinement, Ah=1, Al=0
    prog += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
    enc = QMEncoder()
    _arith_encode_ac_refine(
        enc.encode, lambda d: enc.encode(fixed, 0, d), new_ac_stats(),
        zz, 1, 63, 0,
    )
    prog += _stuff_ff(enc.flush())
    prog += b"\xff\xd9"

    # --- equivalent sequential (SOF9) stream ---
    seq = bytearray(head)
    seq += seg(0xC9, _struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    seq += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0x00]))
    seq += _encode_arith_entropy([[zz]], [(1, 0, 0, 0)], 1, 0)
    seq += b"\xff\xd9"

    pix_prog = decode_jpeg(bytes(prog))
    pix_seq = decode_jpeg(bytes(seq))
    assert pix_prog.shape == (8, 8)
    assert np.array_equal(pix_prog, pix_seq)
    assert pix_seq.std() > 0  # the coefficients actually did something


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


# ---- lossless process (SOF3, T.81 Annex H — round 11) ----------------


def _bits_to_bytes(s: str) -> bytes:
    """MSB-first bit string -> bytes, 1-padded (T.81 flush), FF-stuffed."""
    s = s + "1" * (-len(s) % 8)
    raw = bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))
    return raw.replace(b"\xff", b"\xff\x00")


def _ll_category(diff_mod: int) -> tuple[int, str]:
    """(SSSS, magnitude-bit string) for a modulo-2^16 difference, per
    T.81 H.1.2.2 / Table H.2 — independent of jpeglite's encoder."""
    if diff_mod == 32768:
        return 16, ""
    v = diff_mod - 65536 if diff_mod > 32768 else diff_mod
    if v == 0:
        return 0, ""
    s = abs(v).bit_length()
    field = v if v >= 0 else v + (1 << s) - 1
    return s, format(field, f"0{s}b")


def _ll_headers(prec, h, w, comps, predictor, pt, sel_ids=None, ri=0):
    """SOI + SOF3 + flat DHT + optional DRI + SOS header bytes."""
    import struct as st

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc3" + st.pack(">HBHHB", 8 + 3 * len(comps), prec, h, w, len(comps))
    for cid, ch, cv in comps:
        out += st.pack(">BBB", cid, (ch << 4) | cv, 0)
    # flat table: 17 symbols, all 8-bit, canonical code == symbol value
    out += b"\xff\xc4" + st.pack(">HB", 19 + 17, 0x00)
    out += bytes([0, 0, 0, 0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0])
    out += bytes(range(17))
    if ri:
        out += b"\xff\xdd" + st.pack(">HH", 4, ri)
    ids = [c[0] for c in comps] if sel_ids is None else sel_ids
    out += b"\xff\xda" + st.pack(">HB", 6 + 2 * len(ids), len(ids))
    for cid in ids:
        out += st.pack(">BB", cid, 0x00)
    out += st.pack(">BBB", predictor, 0, pt)
    return out


def test_lossless_hand_vector_predictor1():
    """Hand-derived T.81 Annex H bitstream for a 3x2 8-bit image,
    predictor 1: first sample predicts from 2^(P-1)=128, rest of the
    first line from Ra, each later line start from Rb.  Both the
    encoder's bytes and the decoder's reconstruction are pinned against
    the independent derivation."""
    from modis_aggregation_spark.sinks.jpeglite import encode_jpeg_lossless

    img = np.array([[100, 101, 99], [50, 100, 200]], dtype=np.uint8)
    # (sample, prediction) pairs per H.1.1, derived by hand:
    preds = [128, 100, 101, 100, 50, 100]
    samp = [100, 101, 99, 50, 100, 200]
    bitstr = ""
    for s_, p_ in zip(samp, preds):
        cat, field = _ll_category((s_ - p_) & 0xFFFF)
        bitstr += format(cat, "08b") + field  # flat table: code == symbol
    expected = bytes(_ll_headers(8, 2, 3, [(1, 1, 1)], 1, 0)) + _bits_to_bytes(
        bitstr
    ) + b"\xff\xd9"
    assert encode_jpeg_lossless(img, predictor=1) == expected
    assert np.array_equal(decode_jpeg(expected), img)


def test_lossless_roundtrip_all_predictors_dtypes():
    """Bit-exact round trip over every predictor x {8, 12, 16}-bit."""
    from modis_aggregation_spark.sinks.jpeglite import encode_jpeg_lossless

    rng = np.random.default_rng(42)
    for pred in range(1, 8):
        g8 = rng.integers(0, 256, (11, 13), dtype=np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg_lossless(g8, pred)), g8)
        g12 = rng.integers(0, 4096, (7, 9), dtype=np.uint16)
        out12 = decode_jpeg(encode_jpeg_lossless(g12, pred, precision=12))
        assert out12.dtype == np.uint16 and np.array_equal(out12, g12)
        g16 = rng.integers(0, 65536, (5, 8, 3), dtype=np.uint16)
        out16 = decode_jpeg(encode_jpeg_lossless(g16, pred))
        assert np.array_equal(out16, g16)


def test_lossless_point_transform_and_restart():
    from modis_aggregation_spark.sinks.jpeglite import encode_jpeg_lossless

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (10, 6), dtype=np.uint8)
    buf = encode_jpeg_lossless(img, predictor=4, point_transform=3,
                               restart_rows=3)
    assert b"\xff\xd0" in buf  # real restart markers on the wire
    assert np.array_equal(decode_jpeg(buf), (img >> 3) << 3)
    # restart segments are prediction-independent: corrupting the first
    # segment's samples must not change the later segments (decode the
    # stream with the first entropy segment's bytes zeroed is invalid;
    # instead check segment count: 10 rows / 3 = 4 segments -> 3 RSTs)
    assert sum(buf.count(bytes([0xFF, 0xD0 + i])) for i in range(8)) == 3


def test_lossless_difference_32768_category16():
    """The extreme diff 32768 (category 16, no magnitude bits) round
    trips: alternating 0 / 32768 16-bit samples under predictor 1."""
    from modis_aggregation_spark.sinks.jpeglite import encode_jpeg_lossless

    img = np.array([[0, 32768, 0, 32768]], dtype=np.uint16)
    buf = encode_jpeg_lossless(img, predictor=1)
    assert np.array_equal(decode_jpeg(buf), img)


def test_lossless_noninterleaved_scans_hand_stream():
    """Two components coded in two single-component (non-interleaved)
    scans — a layout our encoder never emits — hand-assembled per the
    spec and checked against the hand-computed reconstruction."""
    comps = {1: [[10, 20], [30, 40]], 2: [[5, 6], [7, 8]]}
    out = bytearray(_ll_headers(8, 2, 2, [(1, 1, 1), (2, 1, 1)], 2, 0,
                                sel_ids=[1]))
    for cid in (1, 2):
        grid = comps[cid]
        bitstr = ""
        for y in range(2):
            for x in range(2):
                if y == 0:
                    px = 128 if x == 0 else grid[0][x - 1]
                elif x == 0:
                    px = grid[y - 1][0]
                else:
                    px = grid[y - 1][x]  # predictor 2: Rb
                cat, field = _ll_category((grid[y][x] - px) & 0xFFFF)
                bitstr += format(cat, "08b") + field
        if cid == 2:  # second SOS header between the scans
            import struct as st

            out += b"\xff\xda" + st.pack(">HB", 8, 1)
            out += st.pack(">BB", 2, 0x00) + st.pack(">BBB", 2, 0, 0)
        out += _bits_to_bytes(bitstr)
    out += b"\xff\xd9"
    dec = decode_jpeg(bytes(out))
    assert dec.shape == (2, 2, 2)
    assert np.array_equal(dec[..., 0], np.array(comps[1], np.uint8))
    assert np.array_equal(dec[..., 1], np.array(comps[2], np.uint8))


def test_lossless_subsampled_interleaved_hand_stream():
    """Interleaved lossless scan with MIXED sampling factors (comp 1 at
    2x2, comp 2 at 1x1 over a 4x4 frame): MCU order per T.81 A.2.3 is
    [c1:(2x2 block), c2:(1 sample)] per MCU — hand-assembled, decoded
    plane 2 must come back replicate-upsampled."""
    full = np.array(
        [[10, 12, 14, 16],
         [20, 22, 24, 26],
         [30, 32, 34, 36],
         [40, 42, 44, 46]], dtype=np.int64)
    small = np.array([[100, 110], [120, 130]], dtype=np.int64)
    # scan order: MCU(0,0): c1 (0,0)(0,1)(1,0)(1,1), c2 (0,0); MCU(0,1)...
    bitstr = ""
    g1 = np.zeros((4, 4), np.int64)
    g2 = np.zeros((2, 2), np.int64)

    def emit(grid, src, y, x):
        nonlocal bitstr
        if y == 0:
            px = 128 if x == 0 else grid[0][x - 1]
        elif x == 0:
            px = grid[y - 1][0]
        else:
            px = grid[y][x - 1]  # predictor 1: Ra
        cat, field = _ll_category(int(src[y][x] - px) & 0xFFFF)
        bitstr += format(cat, "08b") + field
        grid[y][x] = src[y][x]

    for my in range(2):
        for mx in range(2):
            for bv in range(2):
                for bh in range(2):
                    emit(g1, full, my * 2 + bv, mx * 2 + bh)
            emit(g2, small, my, mx)
    out = bytes(_ll_headers(8, 4, 4, [(1, 2, 2), (2, 1, 1)], 1, 0))
    out += _bits_to_bytes(bitstr) + b"\xff\xd9"
    dec = decode_jpeg(out)
    assert dec.shape == (4, 4, 2)
    assert np.array_equal(dec[..., 0], full.astype(np.uint8))
    up = np.repeat(np.repeat(small, 2, 0), 2, 1)
    assert np.array_equal(dec[..., 1], up.astype(np.uint8))


def test_lossless_midline_restart_rejected():
    """A DRI that is not a whole number of sample lines must raise —
    prediction may not cross a restart boundary (T.81 H.2.2), so a
    mid-line restart leaves 'the line above' ill-defined."""
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    from modis_aggregation_spark.sinks.jpeglite import encode_jpeg_lossless

    buf = bytearray(encode_jpeg_lossless(img, predictor=1, restart_rows=1))
    i = buf.find(b"\xff\xdd")
    assert i != -1
    buf[i + 4 : i + 6] = (3).to_bytes(2, "big")  # 4-wide rows, DRI=3
    with pytest.raises(ValueError, match="whole number"):
        decode_jpeg(bytes(buf))


def test_lossless_encoder_input_validation():
    from modis_aggregation_spark.sinks.jpeglite import encode_jpeg_lossless

    img = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(img, predictor=0)
    with pytest.raises(ValueError, match="point transform"):
        encode_jpeg_lossless(img, point_transform=8)
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg_lossless(img, precision=17)
    with pytest.raises(ValueError, match="fit"):
        encode_jpeg_lossless(np.full((2, 2), 9, np.uint8), precision=3)
    with pytest.raises(ValueError, match="uint8 or uint16"):
        encode_jpeg_lossless(np.zeros((2, 2), np.int32))


# ---- 12-bit extended sequential (SOF1) --------------------------------


def test_12bit_exact_subspace_bit_exact():
    """Constant 8x8 blocks with DC divisible by the quality-50 DC
    quantizer (16): 12-bit encode->decode is bit-exact, same argument
    as the 8-bit x65 subspace but at 2^11 level shift."""
    vals = np.array([[2048, 2064], [16, 4080]], dtype=np.uint16)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    out = decode_jpeg(encode_jpeg(img, quality=50, precision=12))
    assert out.dtype == np.uint16
    assert np.array_equal(out, img)


def test_12bit_smooth_roundtrip_tolerance():
    yy, xx = np.mgrid[0:24, 0:32]
    img = ((xx * 40 + yy * 25) % 3800).astype(np.uint16)
    img = np.minimum(img, 4095)
    out = decode_jpeg(encode_jpeg(img, quality=97, precision=12))
    err = np.abs(out.astype(np.int64) - img.astype(np.int64))
    # quantizer-scale reconstruction error, 16x the 8-bit budget
    assert float(err.mean()) < 48.0


def test_12bit_rgb_roundtrip_and_dtype():
    rng = np.random.default_rng(9)
    base = np.cumsum(rng.integers(0, 6, (16, 16)), axis=1) % 4000
    img = np.stack([base, (base + 500) % 4096, (base * 2) % 4096], -1)
    img = img.astype(np.uint16)
    out = decode_jpeg(encode_jpeg(img, quality=95, precision=12))
    assert out.dtype == np.uint16 and out.shape == img.shape
    err = np.abs(out.astype(np.int64) - img.astype(np.int64))
    assert float(err.mean()) < 64.0


def test_12bit_wrong_dtype_and_baseline_mislabel():
    with pytest.raises(ValueError, match="uint16"):
        encode_jpeg(np.zeros((8, 8), np.uint8), precision=12)
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8), np.uint16), precision=8)
    with pytest.raises(ValueError, match="8 or 12"):
        encode_jpeg(np.zeros((8, 8), np.uint8), precision=10)
    # a BASELINE (SOF0) frame declaring 12-bit precision is invalid T.81
    buf = bytearray(encode_jpeg(np.zeros((8, 8), np.uint16), precision=12))
    i = buf.find(b"\xff\xc1")
    buf[i + 1] = 0xC0
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(buf))


def test_hierarchical_and_arith_lossless_still_gated():
    """The remaining honest gates: hierarchical frames (SOF5-7 and the
    differential SOF13-15) and arithmetic LOSSLESS (SOF11) raise
    NotImplementedError.  SOF9/SOF10 are REAL since round 12."""
    buf = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = buf.find(b"\xff\xc0")
    for marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
        buf[i + 1] = marker
        with pytest.raises(NotImplementedError, match="hierarchical"):
            decode_jpeg(bytes(buf))
    buf[i + 1] = 0xCB
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(bytes(buf))


def test_decode_images_lossless_path(spark):
    """decode_images(decoder='jpeg') over lossless payloads: exact
    means straight from the source bytes (no quantization), varying the
    predictor per row."""
    import pandas as pd

    from modis_aggregation_spark.sinks.jpeglite import encode_jpeg_lossless

    rng = np.random.default_rng(5)
    rows = []
    for i in range(8):
        img = rng.integers(0, 256, (4, 4), dtype=np.uint8)
        rows.append((i, bytearray(encode_jpeg_lossless(img, predictor=i % 7 + 1)),
                     float(img.mean())))
    df = spark.createDataFrame(
        pd.DataFrame({"id": [r[0] for r in rows],
                      "payload": [bytes(r[1]) for r in rows]})
    )
    out = M.decode_images(df, decoder="jpeg", out_hw=(4, 4)).toPandas()
    out = out.sort_values("id").reset_index(drop=True)
    for i, (_, _, mean) in enumerate(rows):
        assert abs(out["mean_pixel"][i] - mean) < 1e-12


# ---- DNL-deferred height + 4-component CMYK/YCCK (round 11) -----------


def test_dnl_deferred_height():
    """SOF height 0 with a DNL segment after the scan (T.81 B.2.5) must
    decode identically to the plain-height stream."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (24, 16), dtype=np.uint8)
    buf = bytearray(encode_jpeg(img, quality=80))
    ref = decode_jpeg(bytes(buf))
    i = buf.find(b"\xff\xc0")
    assert buf[i + 5 : i + 7] == (24).to_bytes(2, "big")
    buf[i + 5 : i + 7] = b"\x00\x00"  # defer the height
    assert buf[-2:] == b"\xff\xd9"
    dnl = b"\xff\xdc" + (4).to_bytes(2, "big") + (24).to_bytes(2, "big")
    patched = bytes(buf[:-2]) + dnl + b"\xff\xd9"
    assert np.array_equal(decode_jpeg(patched), ref)
    # without the DNL the stream must be rejected, not guessed
    with pytest.raises(ValueError, match="DNL"):
        decode_jpeg(bytes(buf))


def test_cmyk_stored_roundtrip_exact_subspace():
    """4-component CMYK (Adobe transform 0): constant even-valued 8x8
    blocks per channel are bit-exact through encode->decode, and the
    stream carries a real APP14 marker."""
    rng = np.random.default_rng(8)
    vals = (rng.integers(0, 128, (2, 3, 4)) * 2).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    buf = encode_jpeg(img, quality=50)
    assert b"Adobe" in buf
    out = decode_jpeg(buf)
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_ycck_roundtrip_tolerance():
    """Adobe transform 2 (YCCK): encode complements CMY and runs the
    forward YCbCr; decode must invert both within DCT tolerance."""
    yy, xx = np.mgrid[0:16, 0:24]
    img = np.stack(
        [
            (xx * 9) % 256,
            (yy * 11) % 256,
            (xx * 3 + yy * 5) % 256,
            np.full_like(xx, 77),
        ],
        -1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, cmyk_transform=2))
    err = np.abs(out.astype(np.int64) - img.astype(np.int64))
    assert float(err.mean()) < 10.0
    # the K plane sees no color transform: tight per-pixel bound
    assert int(err[..., 3].max()) <= 4


def test_cmyk_bad_transform_rejected():
    img = np.zeros((8, 8, 4), np.uint8)
    with pytest.raises(ValueError, match="cmyk_transform"):
        encode_jpeg(img, cmyk_transform=1)


def test_sof9_custom_dac_conditioning():
    """NON-DEFAULT DAC conditioning (the values a foreign encoder may
    emit): hand-build SOF9 streams whose entropy data is coded with
    custom DC L/U classification thresholds and a custom AC Kx ladder
    split, declared in the DAC segment — pixels must equal the
    default-conditioned stream of the SAME coefficients (conditioning
    moves probabilities between contexts, never values)."""
    import struct as _struct

    from modis_aggregation_spark.sinks.jpeglite import (
        _arith_encode_ac_band,
        _arith_encode_dc,
        _stuff_ff,
    )
    from modis_aggregation_spark.sinks.qmcoder import (
        FIXED_BIN,
        QMEncoder,
        new_ac_stats,
        new_dc_stats,
    )

    rng = np.random.default_rng(99)
    # several blocks with spread-out coefficient magnitudes so the DC
    # classification actually lands in the small/large buckets
    blocks = []
    for t in range(6):
        zz = [0] * 64
        zz[0] = int(rng.integers(-200, 200))
        for k in rng.integers(1, 64, size=6):
            zz[int(k)] = int(rng.integers(-30, 30))
        blocks.append(zz)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + _struct.pack(
            ">H", 2 + len(payload)
        ) + payload

    def build(low, up, kx, declare):
        head = b"\xff\xd8"
        head += seg(0xDB, b"\x00" + bytes([1] * 64))
        if declare:
            head += seg(0xCC, bytes([0x00, (up << 4) | low, 0x10, kx]))
        out = bytearray(head)
        out += seg(0xC9, _struct.pack(">BHHB", 8, 8, 8 * len(blocks), 1)
                   + bytes([1, 0x11, 0]))
        out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0x00]))
        enc = QMEncoder()
        fixed = bytearray([FIXED_BIN])
        dst, ast = new_dc_stats(), new_ac_stats()
        pred, ctx = 0, 0
        for zz in blocks:
            diff = zz[0] - pred
            pred = zz[0]
            ctx = _arith_encode_dc(enc.encode, dst, ctx, diff, low, up)
            _arith_encode_ac_band(
                enc.encode, lambda d: enc.encode(fixed, 0, d), ast,
                zz, 1, 63, kx,
            )
        out += _stuff_ff(enc.flush())
        out += b"\xff\xd9"
        return bytes(out)

    base = decode_jpeg(build(0, 1, 5, declare=True))
    for low, up, kx in [(2, 4, 20), (0, 0, 1), (4, 15, 63), (1, 3, 10)]:
        got = decode_jpeg(build(low, up, kx, declare=True))
        assert np.array_equal(got, base), (low, up, kx)
    # and the spec-default stream decodes identically WITHOUT any DAC
    # segment (F.1.4.4.1.4 defaults)
    assert np.array_equal(decode_jpeg(build(0, 1, 5, declare=False)), base)
    # conditioning MISMATCH (coded with one, declared another) must
    # change pixels — proving the conditioning is actually honored,
    # not ignored
    coded_2_4_20 = build(2, 4, 20, declare=True)
    declared_only = bytearray(coded_2_4_20)
    i = bytes(declared_only).index(b"\xff\xcc")
    declared_only[i + 5] = 0x10  # claim L=0/U=1 over (2,4)-coded data
    declared_only[i + 7] = 5  # claim Kx=5 over 20-coded data
    mismatched = decode_jpeg(bytes(declared_only))
    assert not np.array_equal(mismatched, base)


def test_sof10_arithmetic_restart_segments():
    """Restart intervals inside progressive ARITHMETIC scans: the
    statistics areas, predictors, and conditioning reset per segment
    (fresh QM decoder per restart interval).  Hand-build a 6-block
    SOF10 stream — DC first scan with DRI=2 (three entropy segments
    separated by RST markers), AC left at zero — and check it decodes
    identically to the equivalent unsegmented stream."""
    import struct as _struct

    from modis_aggregation_spark.sinks.jpeglite import (
        _arith_encode_dc,
        _stuff_ff,
    )
    from modis_aggregation_spark.sinks.qmcoder import QMEncoder, new_dc_stats

    dcs = [40, -120, 7, 255, -1, 88]

    def seg(marker, payload):
        return bytes([0xFF, marker]) + _struct.pack(
            ">H", 2 + len(payload)
        ) + payload

    def build(ri):
        out = bytearray(b"\xff\xd8")
        out += seg(0xDB, b"\x00" + bytes([1] * 64))
        out += seg(0xCC, bytes([0x00, 0x10]))
        out += seg(0xCA, _struct.pack(">BHHB", 8, 8, 48, 1)
                   + bytes([1, 0x11, 0]))
        if ri:
            out += seg(0xDD, _struct.pack(">H", ri))
        out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))  # DC first Al=0
        entropy = bytearray()
        enc, dst, pred, ctx = QMEncoder(), new_dc_stats(), 0, 0
        rst = 0
        for t, dc in enumerate(dcs):
            if ri and t and t % ri == 0:
                entropy += _stuff_ff(enc.flush())
                entropy += bytes((0xFF, 0xD0 + (rst & 7)))
                rst += 1
                enc, dst, pred, ctx = QMEncoder(), new_dc_stats(), 0, 0
            ctx = _arith_encode_dc(enc.encode, dst, ctx, dc - pred, 0, 1)
            pred = dc
        entropy += _stuff_ff(enc.flush())
        out += entropy
        out += b"\xff\xd9"
        return bytes(out)

    plain = decode_jpeg(build(0))
    segmented = decode_jpeg(build(2))
    assert plain.shape == (8, 48)
    assert np.array_equal(plain, segmented)
    assert plain.std() > 0
