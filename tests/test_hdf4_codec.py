"""hdf4lite codec + decoder=hdf scan path.

Proof pattern mirrors the round-3 HDF5 path (no HDF4 ground-truth file
exists in this environment): writer→reader round-trip at the byte level,
MYD06-style calibration decoded per the reference's HDF convention
(``(raw − add_offset) × scale_factor`` after fill→NaN, reference
``aggregate_functions.py:103-113``), and a real-file granule scan proven
row-identical to the in-memory fake decoder on identical content."""

import struct

import numpy as np
import pytest

from modis_aggregation_spark.sinks.hdf4lite import (
    MAGIC,
    H4Dataset,
    read_hdf4,
    read_hdf4_file_attrs,
    write_hdf4,
)


def test_roundtrip_dtypes_and_attrs(tmp_path):
    p = str(tmp_path / "t.hdf")
    rng = np.random.default_rng(3)
    arrs = {
        "f64": rng.normal(size=(4, 5)).astype(np.float64),
        "f32": rng.normal(size=(3,)).astype(np.float32),
        "i16": rng.integers(-1000, 1000, (2, 3, 4)).astype(np.int16),
        "u8": rng.integers(0, 255, (6,)).astype(np.uint8),
        "i32": rng.integers(-7, 7, (5, 2)).astype(np.int32),
    }
    write_hdf4(
        p,
        {
            k: (v, {"long_name": k, "rank": int(v.ndim)})
            for k, v in arrs.items()
        },
        file_attrs={"title": "roundtrip", "version": 4},
    )
    ds = read_hdf4(p)
    assert set(ds) == set(arrs)
    for k, v in arrs.items():
        assert ds[k].shape == v.shape
        assert ds[k].data.dtype == v.dtype
        assert np.array_equal(ds[k].data, v)
        assert ds[k].attrs["long_name"] == k
        assert ds[k].attrs["rank"] == v.ndim
    assert read_hdf4_file_attrs(p) == {"title": "roundtrip", "version": 4}


def test_myd06_style_calibration_attrs(tmp_path):
    """MYD06-shaped SDS: int16 raw + scale/offset/fill attributes survive
    the container and decode to the reference's calibrated values."""
    p = str(tmp_path / "myd06.hdf")
    raw = np.array([[100, -32768, 9500], [0, 11000, 42]], dtype=np.int16)
    write_hdf4(
        p,
        {
            "Cloud_Top_Pressure": (
                raw,
                {
                    "units": "hPa",
                    "long_name": "Cloud Top Pressure",
                    "scale_factor": 0.1,
                    "add_offset": 0.0,
                    "_FillValue": np.int16(-32768),
                    "valid_range": np.array([0, 11000], dtype=np.int32),
                },
            )
        },
    )
    d = read_hdf4(p)["Cloud_Top_Pressure"]
    assert d.data.dtype == np.int16 and np.array_equal(d.data, raw)
    a = d.attrs
    assert a["units"] == "hPa" and a["scale_factor"] == 0.1
    assert a["_FillValue"] == -32768 and list(a["valid_range"]) == [0, 11000]
    vals = d.data.astype(np.float64)
    vals[vals == a["_FillValue"]] = np.nan
    cal = (vals - a["add_offset"]) * a["scale_factor"]
    assert cal[0, 0] == pytest.approx(10.0)
    assert np.isnan(cal[0, 1])
    assert cal[1, 1] == pytest.approx(1100.0)


def test_special_element_tags_raise(tmp_path):
    """Extended tags (bit 0x4000: linked/compressed/chunked storage) must
    raise loudly — a guessed decode of layouts with no local ground truth
    would be worse than a gate (CLAUDE.md rule 5)."""
    p = tmp_path / "special.hdf"
    dd = struct.pack(">HHII", 702 | 0x4000, 1, 34, 4)
    p.write_bytes(MAGIC + struct.pack(">hI", 1, 0) + dd + b"\x00" * 4)
    with pytest.raises(NotImplementedError, match="special element"):
        read_hdf4(str(p))


def test_bad_magic_raises(tmp_path):
    p = tmp_path / "bad.hdf"
    p.write_bytes(b"\x89HDF\r\n")
    with pytest.raises(ValueError, match="magic"):
        read_hdf4(str(p))


def test_dfsd_fallback_names_from_label(tmp_path):
    """An NDG outside any Var0.0 vgroup (old DFSD API layout) is read and
    named from its DFTAG_SDL label."""
    import modis_aggregation_spark.sinks.hdf4lite as h4

    p = str(tmp_path / "old.hdf")
    arr = np.arange(6, dtype=np.float32).reshape(2, 3)
    elements = []
    nt = struct.pack(">BBBB", 1, 5, 32, 1)
    elements.append((h4.TAG_NT, 2, nt))
    sdd = struct.pack(">H", 2) + struct.pack(">2I", 2, 3)
    sdd += struct.pack(">HH", h4.TAG_NT, 2) * 3
    elements.append((h4.TAG_SDD, 2, sdd))
    elements.append((h4.TAG_SD, 2, arr.astype(">f4").tobytes()))
    elements.append((h4.TAG_SDL, 2, b"legacy_var\x00"))
    ndg = struct.pack(
        ">HHHHHH", h4.TAG_SDD, 2, h4.TAG_SD, 2, h4.TAG_SDL, 2
    )
    elements.append((h4.TAG_NDG, 2, ndg))
    ndd = len(elements)
    start = 4 + 6 + 12 * ndd
    dd, payload, pos = [], [], start
    for tag, ref, body in elements:
        dd.append(struct.pack(">HHII", tag, ref, pos, len(body)))
        payload.append(body)
        pos += len(body)
    with open(p, "wb") as fh:
        fh.write(MAGIC + struct.pack(">hI", ndd, 0) + b"".join(dd) + b"".join(payload))
    ds = read_hdf4(p)
    assert set(ds) == {"legacy_var"}
    assert np.array_equal(ds["legacy_var"].data, arr)


def test_hdf4_decoder_equals_fake_scan(spark, tmp_path):
    """decoder=hdf reads REAL HDF4 granule files (written by hdf4lite in
    the MYD06 container shape) and must equal the in-memory fake decoder
    row-for-row — the equivalence proof for the physical HDF4 decode
    path, same pattern as the round-3 decoder=hdf5 proof."""
    from modis_aggregation_spark.sources.granule_datasource import (
        GranuleDataSource,
        synth_granule,
        write_granule_hdf4,
    )

    spark.dataSource.register(GranuleDataSource)
    for gid in (7, 9):
        write_granule_hdf4(str(tmp_path), gid, ["ctp"], rows=12, cols=9)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    real = (
        spark.read.format("modis_granules")
        .option("granule_ids", "7,9")
        .option("decoder", "hdf")
        .option("path", str(tmp_path))
        .option("variables", "ctp")
        .load()
    )
    got = real.orderBy("granule_id", "i", "j").collect()
    want = []
    for gid in (7, 9):
        d = synth_granule(gid, ["ctp"], rows=12, cols=9)
        for r in range(d["lat"].size):
            want.append((gid, d["i"][r], d["j"][r], d["lat"][r], d["lon"][r],
                         d["cm_raw"][r], d["ctp"][r]))
    assert len(got) == len(want) == 2 * 12 * 9
    for g, w in zip(got, want):
        assert (g["granule_id"], g["i"], g["j"]) == (w[0], w[1], w[2])
        assert g["lat"] == w[3] and g["lon"] == w[4]  # float64 bit-exact
        assert g["cm_raw"] == w[5]
        if np.isnan(w[6]):
            assert g["ctp"] is None  # fill hole → NULL at the source
        else:
            assert g["ctp"] == w[6]


def test_hdf4_decoder_pushdown_prunes_files(spark, tmp_path):
    """granule_id pushdown must prune which FILES are opened — a missing
    file for a pruned id proves the partition never read it."""
    from modis_aggregation_spark.sources.granule_datasource import (
        GranuleDataSource,
        write_granule_hdf4,
    )

    spark.dataSource.register(GranuleDataSource)
    write_granule_hdf4(str(tmp_path), 3, ["ctp"], rows=6, cols=5)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("modis_granules")
        .option("granule_ids", "3,4")
        .option("decoder", "hdf")
        .option("path", str(tmp_path))
        .option("variables", "ctp")
        .load()
        .filter("granule_id = 3")
    )
    assert df.count() == 30


def test_oversized_attribute_raises_loudly(tmp_path):
    """Vdata field order/size are 16-bit in the container; a
    CoreMetadata-style multi-64KB attribute must raise OverflowError,
    not die inside struct.pack."""
    p = str(tmp_path / "big.hdf")
    with pytest.raises(OverflowError, match="16-bit"):
        write_hdf4(
            p, {"v": (np.zeros((2, 2)), {"meta": "x" * 70_000})}
        )
