"""tifflite codec: spec vectors, round trips, and REAL cross-validation
against the JDK's javax.imageio TIFF plugin (an independent production
codec, available since JDK 9) in BOTH directions — stronger footing
than the round-trip-only codecs (flaclite/sziplite), matching the
png/gif/jpeg standard.
"""

import numpy as np
import pytest

from modis_aggregation_spark.sinks.tifflite import (
    decode_tiff,
    encode_tiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
)


# ---- hand-derived spec vectors ----------------------------------------


def test_packbits_spec_vector():
    """The TIFF 6.0 specification's own PackBits example."""
    encoded = bytes(
        [0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03, 0x80, 0x00,
         0x2A, 0x22, 0xF7, 0xAA]
    )
    expected = (
        b"\xaa\xaa\xaa\x80\x00\x2a\xaa\xaa\xaa\xaa\x80\x00\x2a\x22"
        + b"\xaa" * 10
    )
    assert packbits_decode(encoded, len(expected)) == expected
    # our encoder's output decodes to the same bytes (layout may differ)
    assert packbits_decode(packbits_encode(expected), len(expected)) == expected


def test_packbits_noop_and_bounds():
    # 0x80 is a noop; 0x00 = one literal byte, twice
    assert packbits_decode(b"\x80\x00A\x00B", 2) == b"AB"
    with pytest.raises(ValueError, match="past end"):
        packbits_decode(b"\x05AB", 6)


def test_lzw_hand_vector():
    """First codes of an LZW stream derived by hand: Clear(256) then
    literals at 9 bits — 256 is 0b100000000, 'A'(65) is 0b001000001 —
    and the decoder's strict first-code-after-clear rule."""
    bits = "100000000" + "001000001" + "001000001" + "100000001"  # C A A EOI
    s = bits + "0" * (-len(bits) % 8)
    data = bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))
    assert lzw_decode(data, 2) == b"AA"
    # a dynamic code immediately after Clear is malformed
    bad_bits = "100000000" + "100000010"  # Clear then code 258
    s = bad_bits + "0" * (-len(bad_bits) % 8)
    bad = bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))
    with pytest.raises(ValueError, match="first code"):
        lzw_decode(bad, 1)


def test_lzw_roundtrip_through_width_changes():
    rng = np.random.default_rng(4)
    for n in (1, 300, 5000, 60000, 300000):  # spans 9->12 bit + clears
        d = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert lzw_decode(lzw_encode(d), n) == d, n
        s = bytes((np.arange(n) % 13).astype(np.uint8))
        assert lzw_decode(lzw_encode(s), n) == s, n


# ---- container round trips --------------------------------------------


def test_tiff_roundtrip_sweep():
    rng = np.random.default_rng(3)
    for comp in ("none", "packbits", "lzw"):
        for pred in (1, 2):
            if pred == 2 and comp != "lzw":
                continue  # predictor is the LZW extension (section 14)
            for shape in [(13, 17), (9, 5, 3), (1, 1), (40, 33, 3)]:
                img = rng.integers(0, 256, shape, dtype=np.uint8)
                out = decode_tiff(
                    encode_tiff(img, compression=comp, predictor=pred,
                                rows_per_strip=4)
                )
                assert out.shape == img.shape
                assert np.array_equal(out, img), (comp, pred, shape)


def test_lzw_eoi_at_early_change_boundary():
    """Round-12 regression: the decoder ADDS a table entry for the
    final data code before reading EOI, so when that entry lands
    exactly on the early-change boundary (table size 511) the EOI must
    be written at the WIDENED width.  254 incompressible bytes hit the
    9->10 boundary precisely (257 + 254 = 511)."""
    from modis_aggregation_spark.sinks.tifflite import lzw_decode, lzw_encode

    for n in (253, 254, 255):
        data = bytes(range(n if n <= 256 else 256))[:n]
        assert lzw_decode(lzw_encode(data), n) == data


def test_tiff_tiled_planar_16bit_roundtrip_sweep():
    """Round-12 layouts: tiles (boundary-padded, cropped on placement),
    PlanarConfiguration=2 (plane-major chunk order), and 16-bit samples
    — every combination with every compression round-trips bit-exactly."""
    rng = np.random.default_rng(7)
    for dtype, hi in [(np.uint8, 256), (np.uint16, 65536)]:
        for shape in [(13, 21), (40, 40, 3), (17, 64)]:
            img = rng.integers(0, hi, size=shape).astype(dtype)
            for comp, pred in [("none", 1), ("packbits", 1), ("lzw", 2)]:
                for planar in (False, True):
                    for tile in (None, (16, 16), (32, 16)):
                        enc = encode_tiff(
                            img, compression=comp, predictor=pred,
                            planar=planar, tile=tile, rows_per_strip=5,
                        )
                        dec = decode_tiff(enc)
                        assert dec.dtype == img.dtype
                        assert np.array_equal(dec, img), (
                            dtype, shape, comp, pred, planar, tile,
                        )


def test_tiff_16bit_big_endian_decode():
    """16-bit samples honor the FILE byte order: hand-build a minimal
    big-endian (MM) stream with >u2 sample data and check the decoder
    reads the samples in MM order (a byte-order bug would scramble
    every value above 255)."""
    import struct as _s

    img = np.arange(16, dtype=np.uint16).reshape(4, 4) * 4097

    def seg_entries(entries):
        out = bytearray(_s.pack(">H", len(entries)))
        for tag, etype, count, val in entries:
            out += _s.pack(">HHI", tag, etype, count) + val
        out += _s.pack(">I", 0)
        return out

    pix = img.astype(">u2").tobytes()
    ifd = seg_entries([
        (256, 4, 1, _s.pack(">I", 4)),
        (257, 4, 1, _s.pack(">I", 4)),
        (258, 3, 1, _s.pack(">HH", 16, 0)),
        (259, 3, 1, _s.pack(">HH", 1, 0)),
        (262, 3, 1, _s.pack(">HH", 1, 0)),
        (273, 4, 1, _s.pack(">I", 8 + 2 + 12 * 10 + 4)),
        (277, 3, 1, _s.pack(">HH", 1, 0)),
        (278, 4, 1, _s.pack(">I", 4)),
        (279, 4, 1, _s.pack(">I", len(pix))),
        (284, 3, 1, _s.pack(">HH", 1, 0)),
    ])
    mm = b"MM\x00*" + _s.pack(">I", 8) + bytes(ifd) + pix
    out = decode_tiff(mm)
    assert out.dtype == np.uint16
    assert np.array_equal(out, img)


def test_tiff_predictor_compresses_gradients():
    smooth = np.repeat(np.arange(200, dtype=np.uint8)[None, :] % 251, 64, 0)
    plain = encode_tiff(smooth, compression="lzw", predictor=1)
    pred = encode_tiff(smooth, compression="lzw", predictor=2)
    assert np.array_equal(decode_tiff(pred), smooth)
    assert len(pred) < len(plain)


def test_tiff_validation_and_gates():
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"\x89PNG....")
    with pytest.raises(ValueError, match="uint8 or uint16"):
        encode_tiff(np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError, match="compression"):
        encode_tiff(np.zeros((4, 4), np.uint8), compression="jpeg")
    with pytest.raises(ValueError, match="only defined with LZW"):
        encode_tiff(np.zeros((4, 4), np.uint8), compression="packbits",
                    predictor=2)
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(np.zeros((4, 4), np.uint8), tile=(15, 16))
    # odd bit depths stay an honest gate, not a silent mis-read
    buf = bytearray(encode_tiff(np.zeros((4, 4), np.uint8)))
    i = buf.find((258).to_bytes(2, "little") + (3).to_bytes(2, "little"))
    assert i != -1
    buf[i + 8] = 4  # BitsPerSample 4
    with pytest.raises(NotImplementedError, match="bit depths"):
        decode_tiff(bytes(buf))
    # mixed per-channel depths too
    buf = bytearray(encode_tiff(np.zeros((4, 4, 3), np.uint16)))
    i = buf.find((258).to_bytes(2, "little") + (3).to_bytes(2, "little"))
    (bps_off,) = __import__("struct").unpack("<I", buf[i + 8 : i + 12])
    buf[bps_off] = 8  # first channel 8, others 16
    with pytest.raises(NotImplementedError, match="bit depths"):
        decode_tiff(bytes(buf))


def test_tiff_whiteiszero_inverted():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16
    buf = bytearray(encode_tiff(img))
    i = buf.find((262).to_bytes(2, "little") + (3).to_bytes(2, "little"))
    assert buf[i + 8] == 1  # BlackIsZero as written
    buf[i + 8] = 0  # declare WhiteIsZero
    assert np.array_equal(decode_tiff(bytes(buf)), 255 - img)


# ---- cross-validation against javax.imageio ---------------------------


def _jvm(spark):
    return spark.sparkContext._gateway.jvm


def _imageio_pixels(bi, h, w):
    out = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            rgb = bi.getRGB(x, y)
            out[y, x] = ((rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255)
    return out


def test_imageio_decodes_tifflite_all_variants(spark, tmp_path):
    """The JDK's production TIFF reader must reproduce our pixels
    bit-exactly for every compression x predictor variant (this is what
    pinned the LZW early-change convention: threshold 2^width on the
    encoder's next-code counter, one assignment ahead of the decoder)."""
    jvm = _jvm(spark)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    for comp, pred in (("none", 1), ("packbits", 1), ("lzw", 1), ("lzw", 2)):
        p = str(tmp_path / f"ours_{comp}_{pred}.tif")
        with open(p, "wb") as f:
            f.write(encode_tiff(img, compression=comp, predictor=pred,
                                rows_per_strip=7))
        bi = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(p))
        assert bi is not None, (comp, pred)
        assert np.array_equal(_imageio_pixels(bi, 40, 40), img), (comp, pred)


def test_tifflite_decodes_imageio(spark, tmp_path):
    """The other direction: we must decode imageio-written TIFFs —
    its default (uncompressed, big strips) and explicit LZW."""
    jvm = _jvm(spark)
    rng = np.random.default_rng(2)
    src = rng.integers(0, 256, (21, 33, 3), dtype=np.uint8)
    bi = jvm.java.awt.image.BufferedImage(
        33, 21, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    for y in range(21):
        for x in range(33):
            r, g, b = (int(v) for v in src[y, x])
            bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    p = str(tmp_path / "theirs.tif")
    jvm.javax.imageio.ImageIO.write(bi, "tiff", jvm.java.io.File(p))
    assert np.array_equal(decode_tiff(open(p, "rb").read()), src)
    iw = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    param = iw.getDefaultWriteParam()
    param.setCompressionMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("LZW")
    p2 = str(tmp_path / "theirs_lzw.tif")
    fos = jvm.javax.imageio.stream.FileImageOutputStream(jvm.java.io.File(p2))
    iw.setOutput(fos)
    iw.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    fos.close()
    assert np.array_equal(decode_tiff(open(p2, "rb").read()), src)


def test_imageio_decodes_tifflite_new_layouts(spark, tmp_path):
    """The JDK must read our round-12 layouts: tiled, planar, and
    16-bit grayscale (raster samples compared exactly — getRGB would
    quantize 16-bit data)."""
    jvm = _jvm(spark)
    rng = np.random.default_rng(21)
    rgb = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    cases = [
        ("tiled", dict(compression="lzw", tile=(16, 16))),
        ("planar", dict(compression="packbits", planar=True)),
        ("tiled_planar", dict(compression="none", tile=(16, 32),
                              planar=True)),
    ]
    for name, kw in cases:
        p = str(tmp_path / f"ours_{name}.tif")
        with open(p, "wb") as f:
            f.write(encode_tiff(rgb, **kw))
        bi = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(p))
        assert bi is not None, name
        assert np.array_equal(_imageio_pixels(bi, 40, 40), rgb), name
    # 16-bit gray via raster samples (predictor 1: the JDK reader
    # refuses 16-bit + horizontal differencing — its limitation, not
    # the spec's; 16-bit predictor-2 is covered by our round-trip sweep)
    g16 = rng.integers(0, 65536, (24, 31), dtype=np.uint16)
    p = str(tmp_path / "ours_16bit.tif")
    with open(p, "wb") as f:
        f.write(encode_tiff(g16, compression="lzw"))
    bi = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(p))
    assert bi is not None
    raster = bi.getRaster()
    got = np.array(
        [[raster.getSample(x, y, 0) for x in range(31)] for y in range(24)],
        dtype=np.uint16,
    )
    assert np.array_equal(got, g16)


def test_tifflite_decodes_imageio_tiled_and_16bit(spark, tmp_path):
    """The other direction: the JDK's writer producing TILED and 16-bit
    streams that we must decode."""
    jvm = _jvm(spark)
    rng = np.random.default_rng(22)
    src = rng.integers(0, 256, (21, 33, 3), dtype=np.uint8)
    bi = jvm.java.awt.image.BufferedImage(
        33, 21, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    for y in range(21):
        for x in range(33):
            r, g, b = (int(v) for v in src[y, x])
            bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    iw = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    param = iw.getDefaultWriteParam()
    param.setTilingMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setTiling(16, 16, 0, 0)
    p = str(tmp_path / "theirs_tiled.tif")
    fos = jvm.javax.imageio.stream.FileImageOutputStream(jvm.java.io.File(p))
    iw.setOutput(fos)
    iw.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    fos.close()
    assert np.array_equal(decode_tiff(open(p, "rb").read()), src)
    # 16-bit grayscale from the JDK
    g16 = rng.integers(0, 65536, (19, 23), dtype=np.uint16)
    bi16 = jvm.java.awt.image.BufferedImage(
        23, 19, jvm.java.awt.image.BufferedImage.TYPE_USHORT_GRAY
    )
    raster = bi16.getRaster()
    for y in range(19):
        for x in range(23):
            raster.setSample(x, y, 0, int(g16[y, x]))
    p2 = str(tmp_path / "theirs_16bit.tif")
    jvm.javax.imageio.ImageIO.write(bi16, "tiff", jvm.java.io.File(p2))
    out = decode_tiff(open(p2, "rb").read())
    assert out.dtype == np.uint16
    assert np.array_equal(out, g16)


def test_decode_images_tiff_path(spark):
    """decode_images(decoder='tiff'): lossless, so mean_pixel equals the
    source-byte mean; compression rotates per row."""
    import pandas as pd

    from modis_aggregation_spark.operators import multimodal as M

    rng = np.random.default_rng(5)
    rows = []
    variants = [("none", 1), ("packbits", 1), ("lzw", 1), ("lzw", 2)]
    for i in range(8):
        img = rng.integers(0, 256, (4, 4), dtype=np.uint8)
        comp, pred = variants[i % 4]
        rows.append((i, encode_tiff(img, compression=comp, predictor=pred),
                     float(img.mean())))
    df = spark.createDataFrame(
        pd.DataFrame({"id": [r[0] for r in rows],
                      "payload": [r[1] for r in rows]})
    )
    out = M.decode_images(df, decoder="tiff", out_hw=(4, 4)).toPandas()
    out = out.sort_values("id").reset_index(drop=True)
    for i, (_, _, mean) in enumerate(rows):
        assert abs(out["mean_pixel"][i] - mean) < 1e-12


def test_dhash_tiff_equals_dhash_of_same_pixels(spark):
    """dhash_images(decoder='tiff') must hash the DECODED pixels (a
    regression guard against the silent-fake fallback class): the hash
    of a TIFF payload equals the hash the png path produces for the
    identical image."""
    import pandas as pd

    from modis_aggregation_spark.operators import multimodal as M
    from modis_aggregation_spark.sinks.pnglite import encode_png

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 18, 3), dtype=np.uint8)
    tdf = spark.createDataFrame(
        pd.DataFrame({"id": [1], "payload": [encode_tiff(img, compression="lzw")]})
    )
    pdf_ = spark.createDataFrame(
        pd.DataFrame({"id": [1], "payload": [encode_png(img)]})
    )
    h_tiff = M.dhash_images(tdf, decoder="tiff").collect()[0]["dhash"]
    h_png = M.dhash_images(pdf_, decoder="png").collect()[0]["dhash"]
    assert h_tiff == h_png
