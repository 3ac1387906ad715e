"""Grid-key projection: lat/lon → cell index.

Reference semantics (``MODIS_Aggregation/aggregate_functions.py:353-356``):
``idx_lat = int((lat - lat0) / d_lat)``, ``idx_lon = int((lon - lon0) / d_lon)``,
``cell = idx_lat * nlon + idx_lon`` (row-major). Because the bounding-box
filter uses strict inequalities (quirk Q7, ``:298``), all surviving pixels
have positive offsets, so int-truncation == floor; we use ``floor`` which is
also correct for any future non-strict region.

Out-of-range cells (possible only for pixels exactly at the upper bound,
already excluded by the strict filter) are guarded by the caller with the
cell-bounds filter (``:363``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lat_idx(lat: Column, lat0: float, d_lat: float) -> Column:
    return F.floor((lat - F.lit(lat0)) / F.lit(d_lat)).cast("int")


def lon_idx(lon: Column, lon0: float, d_lon: float) -> Column:
    return F.floor((lon - F.lit(lon0)) / F.lit(d_lon)).cast("int")


def cell_id(
    lat: Column,
    lon: Column,
    lat0: float,
    lon0: float,
    d_lat: float,
    d_lon: float,
    nlon: int,
) -> Column:
    """Row-major cell id = lat_idx * nlon + lon_idx, as LONG."""
    return (
        lat_idx(lat, lat0, d_lat).cast("long") * F.lit(nlon) + lon_idx(lon, lon0, d_lon)
    ).alias("cell")


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton / Z-order curve key: interleave the low ``bits`` bits of
    two non-negative cell indices (x gets the odd positions) — the
    standard data-clustering key for the pixel store's physical layout
    (SCALING.md §storage: sorting files by a space-filling curve gives
    regional queries parquet row-group min/max skipping in BOTH
    dimensions, where a (lat, lon) lexicographic sort only prunes on
    lat).  Pure integer bit arithmetic (shift/and/or), identical in any
    SQL engine, so layouts derived from it are engine-portable.

    Scale shape: map-only expression; cluster with
    ``repartitionByRange(n, zkey).sortWithinPartitions(zkey)`` at write
    time — a one-time range shuffle that buys every subsequent regional
    scan its pruning (tests/test_plan_regressions.py::
    test_zorder_layout_prunes_row_groups measures the differential)."""
    xl = x.cast("long")
    yl = y.cast("long")
    # Column.__or__ is logical OR in PySpark — bit math needs bitwiseOR
    acc = F.lit(0).cast("long")
    for b in range(bits):
        acc = acc.bitwiseOR(
            F.shiftleft(F.shiftright(xl, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yl, b).bitwiseAND(F.lit(1)), 2 * b)
        )
    return acc
