"""hdf5lite: the pure-Python classic-HDF5 reader/writer.

Reader ground truth: the reference repo's own sample outputs (read-only)
— ``output_final.hdf5`` written by h5py and
``MYD08_D3.A2008001CloudFraction.nc`` written by netCDF4/xarray — two
independent producers of the format. Writer: round-trip through the
validated reader, plus structural invariants (superblock, sorted symbol
table) checked byte-level.
"""

import os
import struct

import numpy as np
import pytest

from modis_aggregation_spark.sinks.hdf5lite import read_hdf5, write_hdf5

SAMPLES = "/root/reference/resources/data/sample_output_data"
H5PY_FILE = os.path.join(SAMPLES, "output_final.hdf5")
NC_FILE = os.path.join(SAMPLES, "MYD08_D3.A2008001CloudFraction.nc")

needs_samples = pytest.mark.skipif(
    not os.path.exists(H5PY_FILE), reason="reference samples not present"
)


@needs_samples
def test_reads_h5py_ground_truth():
    ds = read_hdf5(H5PY_FILE)
    cf = ds["CF"]
    assert cf.shape == (180, 360) and cf.dtype.np == np.dtype("<f8")
    assert 0.0 <= np.nanmin(cf.data) and np.nanmax(cf.data) <= 1.0
    assert 0.9 < np.isnan(cf.data).mean() < 1.0  # sample day is sparse
    lat = ds["lat_bnd"]
    assert lat.shape == (181,)
    assert lat.data[0] == -90 and lat.data[-1] == 90
    assert lat.attrs == {"units": "degrees", "long_name": "Latitude_boundaries"}
    assert ds["lon_bnd"].data[0] == -180 and ds["lon_bnd"].data[-1] == 179
    # vlen-string attribute decoded through the global heap
    assert cf.attrs["DIMENSION_LABELS"] == ["lat_bnd", "lon_bnd"]


@needs_samples
def test_reads_netcdf4_ground_truth():
    """The .nc sample is HDF5 inside, but from a different producer:
    v2 object headers, compact link messages, chunked layout."""
    ds = read_hdf5(NC_FILE)
    da = ds["__xarray_dataarray_variable__"]
    assert da.shape == (180, 360)
    assert 0.0 <= np.nanmin(da.data) and np.nanmax(da.data) <= 1.0
    assert ds["dim_0"].attrs["CLASS"] == "DIMENSION_SCALE"
    assert ds["dim_1"].shape == (360,)


def test_roundtrip_types_and_attrs(tmp_path):
    rng = np.random.default_rng(3)
    data = {
        "f8": (rng.standard_normal((7, 9)), {"scale_factor": 0.01, "n": 3}),
        "f4": (rng.standard_normal(11).astype("<f4"), {}),
        "i8": (rng.integers(-(2**40), 2**40, 13), {"_FillValue": -9999}),
        "i4": (rng.integers(-100, 100, (3, 4)).astype("<i4"),
               {"long_name": "small ints", "edges": np.arange(5.0)}),
        "scalarish": (np.array([1.5]), {"note": "x"}),
    }
    path = str(tmp_path / "rt.h5")
    write_hdf5(path, data)
    back = read_hdf5(path)
    assert sorted(back) == sorted(data)
    for name, (arr, attrs) in data.items():
        got = back[name]
        assert np.array_equal(got.data, np.asarray(arr)), name
        assert got.data.dtype == np.asarray(arr).dtype, name
        for k, v in attrs.items():
            if isinstance(v, np.ndarray):
                assert np.array_equal(got.attrs[k], v)
            else:
                assert got.attrs[k] == pytest.approx(v) if isinstance(v, float) \
                    else got.attrs[k] == v


def test_roundtrip_nan_and_many_datasets(tmp_path):
    # >8 datasets exercises the enlarged-leaf-K single-SNOD layout
    data = {f"var_{i:02d}": (np.full((4, 4), np.nan if i % 2 else i, dtype="<f8"), {})
            for i in range(20)}
    path = str(tmp_path / "many.h5")
    write_hdf5(path, data)
    back = read_hdf5(path)
    assert len(back) == 20
    assert np.isnan(back["var_01"].data).all()
    assert (back["var_02"].data == 2).all()


def test_writer_structural_invariants(tmp_path):
    path = str(tmp_path / "s.h5")
    write_hdf5(path, {"b": (np.arange(3.0), {}), "a": (np.arange(2), {})})
    buf = open(path, "rb").read()
    assert buf[:8] == b"\x89HDF\r\n\x1a\n"
    assert buf[8] == 0 and buf[13] == 8 and buf[14] == 8  # v0, 8/8 sizes
    eof = struct.unpack_from("<Q", buf, 40)[0]
    assert eof == len(buf)  # end-of-file address matches the file size
    assert b"TREE" in buf and b"SNOD" in buf and b"HEAP" in buf
    # symbol-table entries are name-sorted: "a" precedes "b" in the SNOD
    back = read_hdf5(path)
    assert list(back) == ["a", "b"]


# --------------------------------------------------------------------------
# pnglite
# --------------------------------------------------------------------------

def test_png_roundtrip_gray_rgb_rgba(tmp_path):
    from modis_aggregation_spark.sinks.pnglite import read_png, write_png

    rng = np.random.default_rng(5)
    for shape in [(9, 13), (9, 13, 3), (9, 13, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        p = str(tmp_path / f"t{len(shape)}.png")
        write_png(p, img)
        back = read_png(p)
        assert np.array_equal(back.reshape(img.shape), img)


def test_png_colorize_nan_transparent():
    from modis_aggregation_spark.sinks.pnglite import colorize

    v = np.array([[0.0, 0.5], [1.0, np.nan]])
    rgba = colorize(v, 0.0, 1.0)
    assert rgba.shape == (2, 2, 4)
    assert rgba[1, 1, 3] == 0 and rgba[0, 0, 3] == 255  # NaN transparent
    # ramp is monotone in red, anti-monotone in blue
    assert rgba[0, 0, 2] > rgba[1, 0, 2] and rgba[1, 0, 0] > rgba[0, 0, 0]


def test_export_png_writes_grid(spark, tmp_path):
    from modis_aggregation_spark.config import AggregationSpec
    from modis_aggregation_spark.sinks import writers
    from modis_aggregation_spark.sinks.pnglite import read_png

    df = spark.createDataFrame(
        [(0, 0, 0, 0.2), (1, 0, 1, None), (2, 1, 0, None), (3, 1, 1, 0.9)],
        "cell long, lat_idx int, lon_idx int, cf_mean double",
    )
    spec = AggregationSpec(lat_bounds=(-1.0, 1.0), lon_bounds=(-1.0, 1.0))
    out = writers.export_png(df, spec, str(tmp_path / "cf.png"))
    img = read_png(out)
    assert img.shape == (2, 2, 4)
    # occupied cells opaque, unoccupied transparent; north-up flip puts
    # lat_idx 1 in image row 0
    assert img[0, 1, 3] == 255 and img[1, 0, 3] == 255
    assert img[0, 0, 3] == 0 and img[1, 1, 3] == 0


def test_png_decodes_in_jvm_imageio(spark, tmp_path):
    """Cross-validation by an INDEPENDENT decoder: the JVM's
    javax.imageio must decode pnglite's output with matching pixels."""
    from modis_aggregation_spark.sinks.pnglite import write_png

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(5, 7, 4), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    jvm = spark.sparkContext._gateway.jvm
    decoded = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(p))
    assert decoded is not None, "ImageIO failed to decode pnglite output"
    assert decoded.getWidth() == 7 and decoded.getHeight() == 5
    for y in range(5):
        for x in range(7):
            argb = decoded.getRGB(x, y) & 0xFFFFFFFF
            a, r = (argb >> 24) & 0xFF, (argb >> 16) & 0xFF
            g, b = (argb >> 8) & 0xFF, argb & 0xFF
            assert (r, g, b, a) == tuple(int(v) for v in img[y, x]), (x, y)


def test_v2_filter_pipeline_message_parses():
    """Version-2 filter pipeline omits the Name Length field for filter
    ids < 256 — a spec-compliant v2 deflate message must parse to
    [(1, level)]."""
    from modis_aggregation_spark.sinks.hdf5lite import _Reader

    r = _Reader.__new__(_Reader)
    # ver=2, nfilters=1 | id=1 (deflate), flags=0, ncdv=1, cdv=[6]
    body = bytes([2, 1]) + struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6)
    r._decode_filters(body)
    assert r.filters == [(1, (6,))]  # full cd_values kept since round 11 (szip needs all four)
    # id >= 256 keeps the name-length field (unpadded name in v2)
    body = bytes([2, 1]) + struct.pack("<HHHH", 300, 2, 0, 1) + b"nm" \
        + struct.pack("<I", 9)
    r._decode_filters(body)
    assert r.filters == [(300, (9,))]


def test_fletcher32_verifies_and_rejects():
    from modis_aggregation_spark.sinks.hdf5lite import _Reader, _fletcher32

    payload = bytes(range(256)) * 3 + b"\x07"  # odd length
    good = payload + struct.pack("<I", _fletcher32(payload))
    r = _Reader.__new__(_Reader)
    r.filters = [(3, 0)]
    assert r._apply_filters(good, 0) == payload
    bad = bytearray(good)
    bad[5] ^= 0xFF
    with pytest.raises(ValueError, match="fletcher32"):
        r._apply_filters(bytes(bad), 0)


def test_hdf_decoder_requires_path(spark):
    """decoder=hdf is REAL since round 4 (sinks/hdf4lite.py); like
    decoder=hdf5 it must demand a granule directory rather than silently
    serving synthetic data from a 'real' path."""
    from modis_aggregation_spark.sources.granule_datasource import GranuleDataSource

    spark.dataSource.register(GranuleDataSource)
    with pytest.raises(Exception, match="path"):
        (
            spark.read.format("modis_granules")
            .option("granule_ids", "1")
            .option("decoder", "hdf")
            .load()
            .count()
        )


def test_png_without_ihdr_raises_value_error(tmp_path):
    from modis_aggregation_spark.sinks.pnglite import _SIG, _chunk, read_png

    p = tmp_path / "bad.png"
    p.write_bytes(_SIG + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IHDR"):
        read_png(str(p))
