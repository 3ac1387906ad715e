"""End-to-end plan tests: daily_grid, monthly reaggregation equivalence,
strict-compat quirks (Q1/Q2/Q5), packing rules (Q10), CLI."""

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.config import AggregationSpec, VariableSpec, JointHistSpec
from modis_aggregation_spark.operators import stats as ops_stats
from modis_aggregation_spark.plans.pipeline import daily_grid, reaggregate
from modis_aggregation_spark.sinks import writers

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")

SPEC = AggregationSpec(
    lat_bounds=(-20.0, 20.0),
    lon_bounds=(0.0, 35.0),
    variables=(
        VariableSpec(name="ctp", bin_edges=(0.0, 300.0, 600.0, 900.0, 1100.0)),
        VariableSpec(name="cee", bin_edges=(0.0, 0.5, 1.0)),
        VariableSpec(name="cloud_fraction_CM", bin_edges=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0)),
    ),
    joint_hists=(
        JointHistSpec(
            varname="ctp",
            joint_name="ctp_cee",
            partner_var="cee",
            joint_edges=(0.0, 0.5, 1.0),
        ),
    ),
)


@pytest.fixture(scope="module")
def grid(spark):
    pixels = spark.read.parquet(os.path.join(FIXTURES, "pixels.parquet"))
    granules = spark.read.parquet(os.path.join(FIXTURES, "granules.parquet"))
    return daily_grid(spark, SPEC, pixels, granules).cache()


def test_daily_grid_shape_and_columns(grid):
    assert grid.count() == SPEC.ncells
    cols = set(grid.columns)
    for want in (
        "cell", "lat_idx", "lon_idx",
        "ctp_min", "ctp_max", "ctp_sum", "ctp_count", "ctp_mean", "ctp_stddev",
        "ctp_hist", "ctp_cee_jhist",
        "cld_pix", "tot_pix", "cf_mean", "cf_min", "cf_max", "cf_std",
        "cf_hist", "grid_count",
    ):
        assert want in cols, want


def test_daily_grid_matches_component_operators(spark, grid):
    """The fused single-pass plan must agree with the individually
    oracle-checked component operators."""
    pixels = spark.read.parquet(os.path.join(FIXTURES, "pixels.parquet"))
    px = ops_stats.with_cloud_mask(ops_stats.with_cell(pixels, SPEC))
    ref_stats = {
        r["cell"]: r
        for r in ops_stats.cell_stats(px, ["ctp"]).collect()
        if r["ctp_count"] > 0
    }
    ref_cf = {r["cell"]: r for r in ops_stats.cloud_fraction(px).collect()}
    got = {r["cell"]: r for r in grid.filter(F.col("ctp_count") > 0).collect()}
    assert set(got) == set(ref_stats)
    for cell, r in got.items():
        e = ref_stats[cell]
        for stat in ("min", "max", "sum", "count", "mean"):
            assert r[f"ctp_{stat}"] == pytest.approx(e[f"ctp_{stat}"]), (cell, stat)
        assert r["cld_pix"] == ref_cf[cell]["cld_pix"]
        assert r["tot_pix"] == ref_cf[cell]["tot_pix"]


def test_histogram_total_equals_inrange_count(grid):
    rows = grid.filter(F.col("ctp_count") > 0).select("ctp_hist", "ctp_count").collect()
    for r in rows:
        # every in-range value lands in exactly one bucket
        assert sum(r["ctp_hist"]) <= r["ctp_count"]
    assert any(sum(r["ctp_hist"]) > 0 for r in rows)


def test_reaggregate_equals_direct(spark):
    """Partial/final equivalence (SURVEY §5.2.3): per-granule-group staged
    dailies re-merged == one-shot aggregation over everything."""
    pixels = spark.read.parquet(os.path.join(FIXTURES, "pixels.parquet"))
    granules = spark.read.parquet(os.path.join(FIXTURES, "granules.parquet"))
    direct = daily_grid(spark, SPEC, pixels, granules, densify_output=False)

    # stage per "day" (split granules by doy), then merge
    staged = []
    for doy in [r["doy"] for r in granules.select("doy").distinct().collect()]:
        ids = granules.filter(F.col("doy") == doy).select("granule_id")
        sub = pixels.join(ids, "granule_id", "left_semi")
        staged.append(
            daily_grid(spark, SPEC, sub, granules, densify_output=False)
            .withColumn("date", F.lit(str(doy)))
        )
    from functools import reduce
    merged = reaggregate(reduce(lambda a, b: a.unionByName(b), staged))

    d = {r["cell"]: r for r in direct.collect()}
    m = {r["cell"]: r for r in merged.collect()}
    assert set(d) == set(m)
    for cell in d:
        for col in ("ctp_min", "ctp_max", "ctp_sum", "ctp_count", "ctp_mean",
                    "ctp_stddev", "cld_pix", "tot_pix", "cf_mean"):
            a, b = d[cell][col], m[cell][col]
            if a is None or b is None:
                assert a == b, (cell, col)
            else:
                # stddev: direct uses Welford-style stddev_pop, the merge
                # path re-finalizes from Σv² (the reference's own formula,
                # aggregate_functions.py:711) — cancellation costs ~1e-8
                tol = 1e-6 if col.endswith("_stddev") else 1e-9
                assert a == pytest.approx(b, abs=tol), (cell, col)
        assert list(d[cell]["ctp_hist"]) == list(m[cell]["ctp_hist"])
        assert [list(x) for x in d[cell]["ctp_cee_jhist"]] == [
            list(x) for x in m[cell]["ctp_cee_jhist"]
        ]
        # merged per-granule CF std (re-finalized from cf_granule_* partials)
        # equals the direct daily stddev_pop over all granules
        a, b = d[cell]["cf_std"], m[cell]["cf_granule_stddev"]
        if a is None or b is None:
            assert (a is None) == (b is None or d[cell]["cf_granule_count"] == 0), cell
        else:
            assert a == pytest.approx(b, abs=1e-6), cell


def test_strict_compat_quirks(spark):
    pixels = spark.read.parquet(os.path.join(FIXTURES, "pixels.parquet"))
    granules = spark.read.parquet(os.path.join(FIXTURES, "granules.parquet"))
    compat_spec = AggregationSpec(
        lat_bounds=SPEC.lat_bounds,
        lon_bounds=SPEC.lon_bounds,
        variables=SPEC.variables,
        joint_hists=SPEC.joint_hists,
        strict_compat=True,
    )
    compat = daily_grid(spark, compat_spec, pixels, granules, densify_output=False)
    correct = daily_grid(spark, SPEC, pixels, granules, densify_output=False)

    crow = {r["cell"]: r for r in compat.collect()}
    orow = {r["cell"]: r for r in correct.collect()}

    # Q1: compat CF histogram is all zeros; correct mode actually bins
    assert all(sum(r["cf_hist"]) == 0 for r in crow.values())
    assert any(sum(r["cf_hist"]) > 0 for r in orow.values())

    # Q5: the compat counter counts (granule, variable-with-valid-data)
    # pairs + the CF call — inflated when >1 variable is valid, deflated
    # for granules contributing no valid data at all; it must diverge from
    # the clean distinct-granule count and never go negative
    assert all(r["grid_count_compat"] >= 0 for r in crow.values())
    assert any(r["grid_count_compat"] > r["grid_count"] for r in crow.values())

    # Q2: compat std uses ΣCLD²/ΣTOT — differs from per-granule fraction std
    diffs = [
        (crow[c]["cf_std"], orow[c]["cf_std"])
        for c in crow
        if crow[c]["cf_std"] is not None and orow[c]["cf_std"] is not None
    ]
    assert any(abs(a - b) > 1e-6 for a, b in diffs)

    # Q2 spot-check the compat formula on one cell, recomputed from pixels
    px = ops_stats.with_cloud_mask(ops_stats.with_cell(pixels, compat_spec))
    per_g = (
        px.groupBy("cell", "granule_id")
        .agg(
            F.sum(F.when(F.col("cm").between(0, 1), 1).otherwise(0)).alias("cld"),
            F.sum(F.when(F.col("cm").between(0, 3), 1).otherwise(0)).alias("tot"),
        )
        .collect()
    )
    target = next(c for c in crow if crow[c]["cf_std"] is not None)
    rows = [r for r in per_g if r["cell"] == target]
    scld = sum(r["cld"] for r in rows)
    stot = sum(r["tot"] for r in rows)
    scld2 = sum(r["cld"] ** 2 for r in rows)
    mean = scld / stot
    want = math.sqrt(max(scld2 / stot - mean * mean, 0.0))
    assert crow[target]["cf_std"] == pytest.approx(want, abs=1e-9)


def test_pack_values_truncation_and_fills():
    arr = np.array([[1.26, -1.26, np.nan, np.inf], [0.0, 2.99, -np.inf, 5.01]])
    packed = writers.pack_values(arr, scale=0.1, offset=0.0, fill=-9999, is_extreme=True)
    # 1.26/0.1 = 12.6 -> 12 (truncate); -12.6 -> -12 (toward zero)
    assert packed[0, 0] == 12
    assert packed[0, 1] == -12
    assert packed[0, 2] == -9999 and packed[0, 3] == -9999
    assert packed[1, 2] == -9999
    # non-extreme: inf is NOT caught (reference only guards min/max)
    p2 = writers.pack_values(np.array([np.inf]), 1.0, 0.0, -9999, is_extreme=False)
    assert p2[0] != -9999 or True  # astype on inf is platform-defined; just no crash


def test_pack_grid_and_axes(spark, grid):
    arrays = writers.grid_to_arrays(grid, SPEC)
    assert arrays["ctp_mean"].shape == (SPEC.nlat, SPEC.nlon)
    assert arrays["ctp_hist"].shape == (SPEC.nlat, SPEC.nlon, 4)
    assert arrays["ctp_cee_jhist"].shape == (SPEC.nlat, SPEC.nlon, 4, 2)
    packed = writers.pack_grid(arrays, SPEC)
    cf_packed, cf_attrs = packed["cf_mean"]
    assert cf_attrs["scale_factor"] == writers.CF_SCALE
    assert cf_attrs["_FillValue"] == writers.CF_FILL
    # empty cells -> fill
    assert (cf_packed == writers.CF_FILL).any()
    # CF datasets stay SCALED FLOATS (reference skips the int truncation for
    # Cloud_Fraction, aggregate_functions.py:438-445)
    assert cf_packed.dtype == np.float64
    occupied = cf_packed[cf_packed != writers.CF_FILL]
    assert occupied.size and not np.allclose(occupied, np.trunc(occupied))
    # counts stay raw ints
    cnt, _ = packed["tot_pix"]
    assert cnt.dtype == np.int64
    lat_bnd, lon_bnd = writers.axis_bounds(SPEC)
    assert lat_bnd[0] == -20.0 and lat_bnd[-1] == 20.0 and len(lat_bnd) == SPEC.nlat + 1


def test_export_hdf5_writes_real_file(spark, grid, tmp_path):
    """The physical MYD08-style HDF5 product is written even without
    h5py (hdf5lite fallback) and round-trips through the reader that is
    validated against the reference's own sample output."""
    from modis_aggregation_spark.sinks.hdf5lite import read_hdf5

    out = writers.export_hdf5(grid, SPEC, str(tmp_path / "l3.h5"))
    assert os.path.exists(out)
    back = read_hdf5(out)
    assert back["lat_bnd"].data[0] == SPEC.lat_bounds[0]
    assert back["lat_bnd"].attrs["long_name"] == "Latitude_boundaries"
    # packed datasets carry their scale/offset/fill attrs and int payloads
    arrays = writers.grid_to_arrays(grid, SPEC)
    packed = writers.pack_grid(arrays, SPEC)
    for name, (data, attrs) in packed.items():
        ds = back[name]
        assert np.array_equal(ds.data, data), name
        for k, v in attrs.items():
            got = ds.attrs[k]
            assert got == pytest.approx(v) if isinstance(v, float) else got == v
    # S13 guard still enforced
    with pytest.raises(FileExistsError):
        writers.export_hdf5(grid, SPEC, out)


def test_cli_end_to_end(spark, tmp_path):
    from modis_aggregation_spark.cli import main

    out = str(tmp_path / "cli_out")
    rc = main([
        "--pixels", os.path.join(FIXTURES, "pixels.parquet"),
        "--granules", os.path.join(FIXTURES, "granules.parquet"),
        "--output", out,
        "--lat0", "-20", "--lat1", "20", "--lon0", "0", "--lon1", "35",
        "--var", "ctp", "cee",
    ])
    assert rc == 0
    df = spark.read.parquet(out)
    assert df.count() == 40 * 35
    # S13 guard: second write without --overwrite must fail
    with pytest.raises(Exception):
        main([
            "--pixels", os.path.join(FIXTURES, "pixels.parquet"),
            "--granules", os.path.join(FIXTURES, "granules.parquet"),
            "--output", out,
            "--lat0", "-20", "--lat1", "20", "--lon0", "0", "--lon1", "35",
            "--var", "ctp",
        ])


def test_daily_grid_day_rules_null_measures(spark):
    """End-to-end day-definition path: running with end_doy/spill_doy must
    reduce counted measures (quadrant nulling) but never row counts."""
    pixels = spark.read.parquet(os.path.join(FIXTURES, "pixels.parquet"))
    granules = spark.read.parquet(os.path.join(FIXTURES, "granules.parquet"))
    plain = daily_grid(spark, SPEC, pixels, granules, densify_output=False)
    ruled = daily_grid(
        spark, SPEC, pixels, granules, end_doy=2, spill_doy=3, densify_output=False
    )
    p = {r["cell"]: r for r in plain.collect()}
    r_ = {r["cell"]: r for r in ruled.collect()}
    total_p = sum(x["ctp_count"] for x in p.values())
    total_r = sum(x["ctp_count"] for x in r_.values())
    assert total_r < total_p
    tot_p = sum(x["tot_pix"] for x in p.values())
    tot_r = sum(x["tot_pix"] for x in r_.values())
    assert tot_r < tot_p  # cm nulled too (CF path)


def test_daily_grid_empty_input(spark):
    """A region with zero surviving pixels still yields the full densified
    grid: counts 0, statistics NULL — never an empty frame or a crash."""
    pixels = spark.read.parquet(os.path.join(FIXTURES, "pixels.parquet"))
    granules = spark.read.parquet(os.path.join(FIXTURES, "granules.parquet"))
    spec = AggregationSpec(
        lat_bounds=(88.0, 89.0),  # fixture max lat is 86.6 — guaranteed empty
        lon_bounds=(100.0, 105.0),
        variables=(VariableSpec(name="ctp"),),
    )
    out = daily_grid(spark, spec, pixels, granules)
    rows = out.collect()
    assert len(rows) == spec.ncells == 5
    for r in rows:
        assert r["tot_pix"] == 0 and r["ctp_count"] == 0
        assert r["ctp_mean"] is None and r["cf_mean"] is None
