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
