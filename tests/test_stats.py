"""Statistics semantics: NULL discipline, two-level CF, partial/final
equivalence (SURVEY §5.2 items 2-3, 5)."""

import math

import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.config import default_spec
from modis_aggregation_spark.operators import stats as ops


def _pixels(spark, rows):
    return spark.createDataFrame(
        rows, "granule_id long, lat double, lon double, cm_raw int, ctp double"
    )


def test_null_skipping_aggregates(spark):
    # one cell, values [10, 20, NULL] -> count 2, mean 15, std 5
    rows = [(1, 0.5, 0.5, 1, 10.0), (1, 0.5, 0.6, 1, 20.0), (2, 0.5, 0.7, 1, None)]
    spec = default_spec(lat_bounds=(0.0, 10.0), lon_bounds=(0.0, 10.0))
    df = ops.with_cell(_pixels(spark, rows), spec)
    out = ops.cell_stats(df, ["ctp"]).first()
    assert out.ctp_count == 2
    assert out.ctp_min == 10.0 and out.ctp_max == 20.0
    assert out.ctp_mean == 15.0
    assert abs(out.ctp_stddev - 5.0) < 1e-12
    assert out.ctp_sumsq == 500.0


def test_all_null_cell(spark):
    rows = [(1, 0.5, 0.5, 1, None), (1, 0.5, 0.6, 1, None)]
    spec = default_spec(lat_bounds=(0.0, 10.0), lon_bounds=(0.0, 10.0))
    out = ops.cell_stats(ops.with_cell(_pixels(spark, rows), spec), ["ctp"]).first()
    assert out.ctp_count == 0
    assert out.ctp_min is None and out.ctp_max is None and out.ctp_mean is None


def test_strict_bbox_bounds(spark):
    # pixels exactly on the boundary are EXCLUDED (quirk Q7)
    rows = [
        (1, 0.0, 5.0, 1, 1.0),   # lat == lat0 -> out
        (1, 10.0, 5.0, 1, 1.0),  # lat == lat1 -> out
        (1, 5.0, 0.0, 1, 1.0),   # lon == lon0 -> out
        (1, 5.0, 10.0, 1, 1.0),  # lon == lon1 -> out
        (1, 5.0, 5.0, 1, 1.0),   # interior -> in
    ]
    spec = default_spec(lat_bounds=(0.0, 10.0), lon_bounds=(0.0, 10.0))
    assert ops.with_cell(_pixels(spark, rows), spec).count() == 1


def test_cloud_fraction_ratio_of_sums(spark):
    # granule A: 1 cloudy of 2; granule B: 3 cloudy of 3
    # pixel-weighted CF = 4/5, NOT mean of (0.5, 1.0) = 0.75
    rows = [
        (1, 0.5, 0.5, 0b001, 1.0),  # cloudy
        (1, 0.5, 0.6, 0b111, 1.0),  # clear
        (2, 0.5, 0.7, 0b001, 1.0),
        (2, 0.5, 0.8, 0b011, 1.0),
        (2, 0.5, 0.9, 0b001, 1.0),
    ]
    spec = default_spec(lat_bounds=(0.0, 10.0), lon_bounds=(0.0, 10.0))
    df = ops.with_cloud_mask(ops.with_cell(_pixels(spark, rows), spec))
    cf = ops.cloud_fraction(df).first()
    assert cf.cld_pix == 4 and cf.tot_pix == 5
    assert abs(cf.cf_mean - 0.8) < 1e-12
    mm = ops.cloud_fraction_minmax(df).first()
    assert abs(mm.cf_min - 0.5) < 1e-12
    assert abs(mm.cf_max - 1.0) < 1e-12


def test_undetermined_cm_excluded(spark):
    # status bit 0 -> flag -1 -> excluded from both CLD and TOT
    rows = [(1, 0.5, 0.5, 0b000, 1.0), (1, 0.5, 0.6, 0b001, 1.0)]
    spec = default_spec(lat_bounds=(0.0, 10.0), lon_bounds=(0.0, 10.0))
    df = ops.with_cloud_mask(ops.with_cell(_pixels(spark, rows), spec))
    cf = ops.cloud_fraction(df).first()
    assert cf.tot_pix == 1 and cf.cld_pix == 1


@pytest.mark.parametrize("n_parts", [1, 7, 64])
def test_partial_final_equivalence(spark, n_parts):
    """Aggregating over 1 vs many partitions must agree — the property the
    reference's MPI/Dask merge encodes (MODIS_Aggregation_DASK.py:127-134)."""
    px = spark.read.parquet("fixtures/pixels.parquet").repartition(n_parts)
    spec = default_spec(lat_bounds=(-20.0, 20.0), lon_bounds=(0.0, 35.0))
    df = ops.with_cell(px, spec)
    out = {
        r.cell: (r.ctp_count, round(r.ctp_sum or 0, 6), r.ctp_min, r.ctp_max)
        for r in ops.cell_stats(df, ["ctp"]).collect()
    }
    if not hasattr(test_partial_final_equivalence, "_ref"):
        test_partial_final_equivalence._ref = out
    else:
        ref = test_partial_final_equivalence._ref
        assert set(out) == set(ref)
        for c in out:
            assert out[c][0] == ref[c][0]
            assert math.isclose(out[c][1], ref[c][1], abs_tol=1e-6)
            assert out[c][2] == ref[c][2] and out[c][3] == ref[c][3]


def test_grid_counts_distinct_granules(spark):
    rows = [(1, 0.5, 0.5, 1, 1.0), (1, 0.5, 0.6, 1, 2.0), (2, 0.5, 0.7, 1, 3.0)]
    spec = default_spec(lat_bounds=(0.0, 10.0), lon_bounds=(0.0, 10.0))
    out = ops.grid_counts(ops.with_cell(_pixels(spark, rows), spec)).first()
    assert out.grid_count == 2
