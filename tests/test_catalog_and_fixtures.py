"""Catalog parsing/pairing/spill-window tests + fixture determinism."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.sources import fixtures as fx
from modis_aggregation_spark.sources.catalog import (
    catalog_from_filenames,
    date_range_catalog,
    pair_granules,
)


def test_filename_parse(spark):
    df = spark.createDataFrame(
        [(0, "MYD06_L2.A2008032.1435.061.2008000000000.hdf")], "granule_id long, filename string"
    )
    r = catalog_from_filenames(df).first()
    assert r.product == "MYD06_L2"
    assert r.year == 2008 and r.doy == 32
    assert str(r.date) == "2008-02-01"
    assert r.hhmm == "1435" and r.hour == 14


def test_spill_window_counts(spark):
    cat = catalog_from_filenames(
        spark.read.parquet(str(fx.GRANULES_PATH)).select("granule_id", "filename")
    )
    win = date_range_catalog(cat, "2008-01-01", "2008-01-01")
    # day 1 (288 granules) + 3h of day 2 (36) per product, 2 products
    assert win.count() == (288 + 36) * 2
    # spill rows are only hours 0-2 of day 2
    spill = win.filter(F.col("doy") == 2)
    assert spill.count() == 36 * 2
    assert spill.agg(F.max("hour")).first()[0] == 2


def test_pairing_and_broken_catalog(spark):
    cat = catalog_from_filenames(
        spark.read.parquet(str(fx.GRANULES_PATH)).select("granule_id", "filename")
    )
    paired = pair_granules(cat)
    assert paired.count() == 612
    assert "geo_granule_id" in paired.columns

    broken = catalog_from_filenames(
        spark.read.parquet(str(fx.GRANULES_BROKEN_PATH)).select("granule_id", "filename")
    )
    with pytest.raises(ValueError, match="without MYD03 partner"):
        pair_granules(broken)


def test_year_boundary_spill(spark):
    # end date Dec 31: spill day is Jan 1 of the NEXT year
    df = spark.createDataFrame(
        [
            (0, "MYD06_L2.A2008366.2355.061.2008000000000.hdf"),  # Dec 31 2008 (leap)
            (1, "MYD06_L2.A2009001.0200.061.2008000000000.hdf"),  # Jan 1 2009, hour 2
            (2, "MYD06_L2.A2009001.0300.061.2008000000000.hdf"),  # hour 3 -> excluded
        ],
        "granule_id long, filename string",
    )
    win = date_range_catalog(catalog_from_filenames(df), "2008-12-31", "2008-12-31")
    got = sorted(r.granule_id for r in win.collect())
    assert got == [0, 1]


def test_fixture_determinism(tmp_path):
    """Regenerating fixtures must reproduce the committed bytes' content."""
    paths = fx.generate_fixtures(str(tmp_path))
    for name in ("granules", "pixels"):
        fresh = pq.read_table(paths[name])
        committed = pq.read_table(getattr(fx, f"{name.upper()}_PATH"))
        assert fresh.equals(committed), f"{name} fixture drifted"


def test_date_range_catalog_year_boundary(spark):
    """The 3-hour spill must cross the year boundary (the reference needs a
    special-case fixup for this, aggregate_functions.py:589-601; date
    arithmetic handles it declaratively here)."""
    from modis_aggregation_spark.sources.catalog import (
        catalog_from_filenames,
        date_range_catalog,
    )

    rows = []
    gid = 0
    for day, doy in (("2008", 366), ("2009", 1)):  # 2008 is a leap year
        for hour in range(5):
            gid += 1
            rows.append((gid, f"MYD06_L2.A{day}{doy:03d}.{hour:02d}30.061.x.hdf"))
    cat = catalog_from_filenames(
        spark.createDataFrame(rows, ["granule_id", "filename"])
    )
    # leap-year doy 366 resolves to Dec 31
    dates = {r["doy"]: str(r["date"]) for r in cat.collect()}
    assert dates[366] == "2008-12-31"
    assert dates[1] == "2009-01-01"

    windowed = date_range_catalog(cat, "2008-12-31", "2008-12-31", shift_hours=3)
    got = sorted((r["doy"], r["hour"]) for r in windowed.collect())
    # all 5 hours of Dec 31 + the first 3 hours of Jan 1 (the spill)
    assert got == [(1, 0), (1, 1), (1, 2), (366, 0), (366, 1), (366, 2), (366, 3), (366, 4)]


def test_pair_granules_happy_path(spark):
    from modis_aggregation_spark.sources.catalog import (
        catalog_from_filenames,
        pair_granules,
    )

    rows = []
    gid = 0
    for prod in ("MYD06_L2", "MYD03"):
        for hhmm in ("0000", "0005", "0010"):
            gid += 1
            rows.append((gid, f"{prod}.A2008001.{hhmm}.061.x.hdf"))
    cat = catalog_from_filenames(spark.createDataFrame(rows, ["granule_id", "filename"]))
    paired = pair_granules(cat)
    out = paired.collect()
    assert len(out) == 3
    assert all(r["product"] == "MYD06_L2" and r["geo_granule_id"] is not None for r in out)
    assert {r["hhmm"] for r in out} == {"0000", "0005", "0010"}
