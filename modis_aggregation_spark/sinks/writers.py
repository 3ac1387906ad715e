"""Sinks: canonical Parquet writer + HDF5 compatibility exporter.

The canonical sink is a Parquet result table ``cells(cell, lat_idx,
lon_idx, {var}_{stat} …)`` — queryable, splittable, schema-full. The HDF5
exporter reproduces the reference's MYD08-style output file
(``addGridEntry`` + writer loop, reference
``MODIS_Aggregation/aggregate_functions.py:413-453,724-757``) for users who
need the legacy format. The L3 grid is tiny (180×360 cells at 1°), so the
exporter's driver-side ``collect()`` is bounded at ~MBs regardless of input
scale — the only place the engine ever collects.

Packing rules replicated exactly (quirk Q10):
* floats pack as ``int(v / scale + offset)`` — TRUNCATION toward zero, not
  rounding (``:431,435``);
* ``±Inf`` → fill for min/max datasets (``:429-431``), NaN/NULL → fill for
  the rest (``:433-435``);
* counts and histograms stay raw integers (``:424-427``);
* cloud-fraction datasets are forced ``scale=1e-4, offset=0, fill=-9999``
  (``:438-444``).

h5py is not in this container: the numeric packing is pure NumPy (tested),
and the physical write goes through the bundled pure-Python classic-format
HDF5 writer (``hdf5lite`` — reader validated against the reference's own
h5py-produced sample file, writer round-trip-verified through it); h5py is
used instead when importable.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame

from modis_aggregation_spark.config import AggregationSpec

CF_SCALE = 1e-4
CF_OFFSET = 0.0
CF_FILL = -9999


def write_grid_parquet(df: DataFrame, path: str, overwrite: bool = False) -> None:
    """Canonical sink. Default refuses to overwrite — the reference's
    output-exists guard (S13, ``aggregate_functions.py:610-617``) is
    Spark's ``errorifexists`` mode."""
    df.write.mode("overwrite" if overwrite else "errorifexists").parquet(path)


def pack_values(
    values: np.ndarray,
    scale: float,
    offset: float,
    fill: int,
    is_extreme: bool = False,
) -> np.ndarray:
    """Pack a float array to int32 with the reference's truncation rules."""
    v = np.asarray(values, dtype=np.float64)
    # the reference guards Inf only on min/max datasets (:429-431) because
    # Inf can only arise there (untouched ±inf buffer init); mapping all
    # non-finite values to fill is equivalent and avoids UB int casts
    bad = ~np.isfinite(v)
    packed = np.zeros(v.shape, dtype=np.int32)
    ok = ~bad
    # astype(int) truncates toward zero — replicated exactly (Q10)
    packed[ok] = (v[ok] / scale + offset).astype(np.int32)
    packed[bad] = fill
    return packed


def _is_count_col(name: str) -> bool:
    return name.endswith(("_count", "_pix", "_hist", "_jhist")) or name in (
        "grid_count",
        "grid_count_compat",
    )


def _is_cf_col(name: str) -> bool:
    return name.startswith("cf_") and not name.endswith(("_hist", "_jhist"))


def grid_to_arrays(
    grid_df: DataFrame, spec: AggregationSpec
) -> dict[str, np.ndarray]:
    """Collect a DENSIFIED grid DataFrame into ``{name: ndarray}`` shaped
    ``[nlat, nlon]`` (histograms ``[nlat, nlon, bins]``; joint histograms
    ``[nlat, nlon, bx, by]``) — the reference's output layout (A16)."""
    nlat, nlon = spec.nlat, spec.nlon
    rows = grid_df.orderBy("cell").collect()
    if len(rows) != nlat * nlon:
        raise ValueError(
            f"grid must be densified: got {len(rows)} rows, want {nlat * nlon}"
        )
    out: dict[str, np.ndarray] = {}
    skip = {"cell", "lat_idx", "lon_idx"}
    for fname in grid_df.columns:
        if fname in skip:
            continue
        col = [r[fname] for r in rows]
        # detect array columns from the first NON-NULL value — cell 0 may be
        # an empty cell whose histogram is NULL after the densify left join
        first = next((c for c in col if c is not None), None)
        if isinstance(first, list):
            zero = np.zeros_like(np.asarray(first, dtype=np.float64))
            arr = np.array(
                [c if c is not None else zero for c in col], dtype=np.float64
            )
            out[fname] = arr.reshape((nlat, nlon) + arr.shape[1:])
        else:
            arr = np.array(
                [np.nan if c is None else float(c) for c in col], dtype=np.float64
            )
            out[fname] = arr.reshape(nlat, nlon)
    return out


def pack_grid(
    arrays: dict[str, np.ndarray], spec: AggregationSpec
) -> dict[str, tuple[np.ndarray, dict]]:
    """Apply the packing rules to every dataset; returns
    ``{name: (packed, attrs)}``. Counts/histograms pass through as int64."""
    out: dict[str, tuple[np.ndarray, dict]] = {}
    for name, arr in arrays.items():
        if _is_count_col(name):
            out[name] = (
                np.nan_to_num(arr, nan=0.0).astype(np.int64),
                {"units": "none", "_FillValue": 0},
            )
            continue
        if _is_cf_col(name):
            # the reference's Cloud_Fraction branch writes the SCALED values
            # as float64 WITHOUT the astype(int) truncation every other
            # dataset gets (``aggregate_functions.py:438-445``) — 0.123456
            # lands as 1234.56, not 1234
            v = np.asarray(arr, dtype=np.float64) / CF_SCALE + CF_OFFSET
            v[~np.isfinite(v)] = CF_FILL
            out[name] = (
                v,
                {
                    "scale_factor": CF_SCALE,
                    "add_offset": CF_OFFSET,
                    "_FillValue": CF_FILL,
                },
            )
            continue
        var = name.rsplit("_", 1)[0]
        try:
            vs = spec.variable(var)
            scale, offset, fill = vs.scale_factor, vs.add_offset, int(vs.fill_value)
        except KeyError:
            scale, offset, fill = 1.0, 0.0, -9999
        is_extreme = name.endswith(("_min", "_max"))
        out[name] = (
            pack_values(arr, scale, offset, fill, is_extreme),
            {
                "scale_factor": scale,
                "add_offset": offset,
                "_FillValue": fill,
            },
        )
    return out


def axis_bounds(spec: AggregationSpec) -> tuple[np.ndarray, np.ndarray]:
    """lat_bnd / lon_bnd cell-edge vectors (reference ``:746-757``)."""
    lat0, lat1 = spec.lat_bounds
    lon0, lon1 = spec.lon_bounds
    return (
        np.linspace(lat0, lat1, spec.nlat + 1),
        np.linspace(lon0, lon1, spec.nlon + 1),
    )


def export_netcdf_cfa(
    grid_df: DataFrame,
    spec: AggregationSpec,
    path: str,
    cf_col: str = "cf_mean",
    overwrite: bool = False,
) -> str:
    """Legacy ``cfa``-pipeline netCDF sink (S14/A18): a single cloud-
    fraction dataset on the grid, the shape of the reference's sample
    product ``resources/data/sample_output_data/
    MYD08_D3.A2008001CloudFraction.nc`` (180×360 DataArray written by the
    compiled-only ``cfa`` module's ``displayOutput``).

    With xarray present this writes a fully-attributed netCDF-4 file;
    without it (this container) it falls back to ``hdf5lite`` and emits
    the same HDF5-inside structure the sample product has — the data
    variable plus DIMENSION_SCALE-classed coordinate datasets — minus
    the netCDF4 reference-typed bookkeeping attrs (DIMENSION_LIST /
    REFERENCE_LIST), which generic HDF5 readers ignore."""
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(path)
    arrays = grid_to_arrays(grid_df.select("cell", "lat_idx", "lon_idx", cf_col), spec)
    lat_bnd, lon_bnd = axis_bounds(spec)
    centers = lambda b: (b[:-1] + b[1:]) / 2.0  # noqa: E731
    try:
        import xarray as xr
    except ImportError:
        from modis_aggregation_spark.sinks.hdf5lite import write_hdf5

        write_hdf5(
            path,
            {
                cf_col: (arrays[cf_col], {"_FillValue": float("nan")}),
                "lat": (
                    centers(lat_bnd),
                    {"CLASS": "DIMENSION_SCALE", "NAME": "lat",
                     "units": "degrees_north", "_Netcdf4Dimid": 0},
                ),
                "lon": (
                    centers(lon_bnd),
                    {"CLASS": "DIMENSION_SCALE", "NAME": "lon",
                     "units": "degrees_east", "_Netcdf4Dimid": 1},
                ),
            },
        )
        return path
    da = xr.DataArray(  # pragma: no cover - env-dependent
        arrays[cf_col],
        coords={"lat": centers(lat_bnd), "lon": centers(lon_bnd)},
        dims=("lat", "lon"),
    )
    da.to_netcdf(path)  # pragma: no cover - env-dependent
    return path


def export_png(
    grid_df: DataFrame,
    spec: AggregationSpec,
    path: str,
    value_col: str = "cf_mean",
    vmin: float = 0.0,
    vmax: float = 1.0,
    overwrite: bool = False,
) -> str:
    """Quick-look PNG of one grid variable (the reference's comparison-
    plot product family, ``resources/data/sample_output_data/*.png``)
    without PIL/matplotlib: pure-Python PNG encoder (``pnglite``),
    procedural blue→yellow ramp, NaN/unoccupied cells transparent. Rows
    are flipped so north is up. Driver-side and bounded by the grid size
    like every export here."""
    from modis_aggregation_spark.sinks.pnglite import colorize, write_png

    if os.path.exists(path) and not overwrite:
        raise FileExistsError(path)
    arrays = grid_to_arrays(grid_df.select("cell", "lat_idx", "lon_idx", value_col), spec)
    img = colorize(arrays[value_col][::-1, :], vmin, vmax)
    write_png(path, img)
    return path


def export_contour_png(
    grid_df: DataFrame,
    spec: AggregationSpec,
    path: str,
    value_col: str = "cf_mean",
    levels: int = 10,
    vmin: float | None = None,
    vmax: float | None = None,
    scale: int = 8,
    overwrite: bool = False,
) -> str:
    """Filled-contour quick-look of one grid variable — the legacy
    ``displayOutput`` product (cfa.pyc: ``contourf(cmap='jet')`` +
    ``savefig``; sample ``MYD08_D3.A2008001CloudFraction.png``), rendered
    matplotlib-free by ``sinks/contour.py`` (jet colormap, bilinear level
    bands, marching-squares iso-lines; NaN cells transparent). North-up
    like ``export_png``; driver-side and bounded by the grid size."""
    from modis_aggregation_spark.sinks.contour import render_contour_png

    if os.path.exists(path) and not overwrite:
        raise FileExistsError(path)
    arrays = grid_to_arrays(grid_df.select("cell", "lat_idx", "lon_idx", value_col), spec)
    png = render_contour_png(
        arrays[value_col][::-1, :], levels=levels, vmin=vmin, vmax=vmax, scale=scale
    )
    with open(path, "wb") as fh:
        fh.write(png)
    return path


def export_hdf5(
    grid_df: DataFrame,
    spec: AggregationSpec,
    path: str,
    overwrite: bool = False,
) -> str:
    """Write the MYD08-style HDF5 file (reference
    ``aggregate_functions.py:413-453,724-757``).

    Uses h5py when importable; otherwise writes the file with the
    bundled pure-Python classic-format writer (``hdf5lite`` — reader
    validated against the reference's own h5py-produced sample output,
    writer round-trip-verified through that reader), so the physical
    HDF5 product exists in h5py-free environments too."""
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(path)  # S13 output-exists guard
    arrays = grid_to_arrays(grid_df, spec)
    packed = pack_grid(arrays, spec)
    lat_bnd, lon_bnd = axis_bounds(spec)
    # one dataset->(array, attrs) plan shared by BOTH writers, so the file
    # contents cannot diverge by environment (the reference sample carries
    # units/long_name on the bounds vectors — both paths must too)
    out = {
        "lat_bnd": (lat_bnd, {"units": "degrees",
                              "long_name": "Latitude_boundaries"}),
        "lon_bnd": (lon_bnd, {"units": "degrees",
                              "long_name": "Longitude_boundaries"}),
    }
    for name, (data, attrs) in packed.items():
        out[name] = (data, attrs)
    try:
        import h5py
    except ImportError:
        from modis_aggregation_spark.sinks.hdf5lite import write_hdf5

        write_hdf5(path, out)
        return path
    with h5py.File(path, "w") as f:  # pragma: no cover - env-dependent
        for name, (data, attrs) in out.items():
            ds = f.create_dataset(name, data=data)
            for k, v in attrs.items():
                ds.attrs[k] = v
    return path
