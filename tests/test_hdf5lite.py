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
