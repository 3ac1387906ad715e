"""Result-grid comparison (J4) — the engine's executable version of the
reference's validation notebooks.

The reference validates against the official NASA MYD08 product by loading
both grids, applying identical unpack transforms, rounding to 4 decimals,
subtracting, and ratio-ing (``examples/result_comparison/
plot_comparison_abs.ipynb`` cells 3-7). Here that becomes a join of two
result tables on (lat_idx, lon_idx) with difference expressions — usable
in tests, CI gates, or ad-hoc product QA instead of notebook plots.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compare_grids(
    left: DataFrame,
    right: DataFrame,
    value_cols: Sequence[str],
    key_cols: Sequence[str] = ("lat_idx", "lon_idx"),
    round_dp: int = 4,
) -> DataFrame:
    """Cell-aligned comparison of two grids.

    For each value column emits ``{col}_l``, ``{col}_r``, ``{col}_absdiff``
    (|l−r| after round(4), matching the notebook), and ``{col}_ratio``
    (l/r, NULL where r is 0/NULL). Full outer join so cells present in only
    one grid surface as NULL rows rather than disappearing.
    """
    lsel = left.select(*key_cols, *[F.col(c).alias(f"{c}_l") for c in value_cols])
    rsel = right.select(*key_cols, *[F.col(c).alias(f"{c}_r") for c in value_cols])
    out = lsel.join(rsel, list(key_cols), "full_outer")
    for c in value_cols:
        lc, rc = F.col(f"{c}_l"), F.col(f"{c}_r")
        out = out.withColumn(
            f"{c}_absdiff", F.abs(F.round(lc, round_dp) - F.round(rc, round_dp))
        ).withColumn(f"{c}_ratio", lc / F.nullif(rc, F.lit(0)))
    return out


def max_abs_diff(cmp: DataFrame, value_cols: Sequence[str]) -> dict[str, float]:
    """Driver-side summary: max |diff| per column (NULL-safe, 0 if empty)."""
    row = cmp.agg(
        *[F.max(F.col(f"{c}_absdiff")).alias(c) for c in value_cols]
    ).first()
    return {c: (0.0 if row[c] is None else float(row[c])) for c in value_cols}


def load_product_hdf5(spark, path: str):
    """Load an exported MYD08-style product file (``export_hdf5``) back
    into a grid DataFrame — the inverse of the packing rules, exactly what
    the reference's comparison notebook does to each product before
    differencing (``plot_comparison_abs.ipynb`` cells 3-5: fill→NaN, then
    the MODIS unpack ``(raw − add_offset) × scale_factor``).

    Returns ``(df, (nlat, nlon))``: one row per grid cell with
    ``lat_idx``/``lon_idx`` keys and one DOUBLE column per 2-D dataset
    (counts, which pack raw with no calibration attrs, pass through
    unscaled; bounds vectors and >2-D histograms are skipped — the
    notebook compares the scalar-per-cell products). The grid is bounded
    (≤ 64,800 cells/variable at 1°), so the driver-side materialization
    is the documented ≤MB exception, same as every export."""
    import numpy as np

    from modis_aggregation_spark.sinks.hdf5lite import read_hdf5

    dsets = read_hdf5(path)
    grids: dict[str, np.ndarray] = {}
    shape = None
    for name, ds in dsets.items():
        if ds.data is None or ds.data.ndim != 2:
            continue
        if shape is None:
            shape = ds.data.shape
        elif ds.data.shape != shape:
            raise ValueError(
                f"dataset {name!r} shape {ds.data.shape} != grid {shape}"
            )
        vals = ds.data.astype(np.float64)
        fill = ds.attrs.get("_FillValue")
        scale = float(ds.attrs.get("scale_factor", 1.0))
        offset = float(ds.attrs.get("add_offset", 0.0))
        if "scale_factor" in ds.attrs:
            # calibrated dataset: fill is a sentinel outside the valid
            # range; counts (no scale attr) keep fill=0 as a REAL zero
            if fill is not None:
                vals[vals == float(fill)] = np.nan
            vals = (vals - offset) * scale
        grids[name] = vals
    if shape is None:
        raise ValueError(f"no 2-D grid datasets in {path}")
    nlat, nlon = shape
    cols = sorted(grids)
    rows = []
    for i in range(nlat):
        for j in range(nlon):
            rows.append(
                (i, j)
                + tuple(
                    None if np.isnan(grids[c][i, j]) else float(grids[c][i, j])
                    for c in cols
                )
            )
    schema = "lat_idx INT, lon_idx INT, " + ", ".join(
        f"{c} DOUBLE" for c in cols
    )
    return spark.createDataFrame(rows, schema), (nlat, nlon)


def compare_products(
    spark,
    left_path: str,
    right_path: str,
    value_cols: Sequence[str] | None = None,
    round_dp: int = 4,
):
    """Compare two exported product files cell-by-cell: load + unpack both
    (``load_product_hdf5``), then ``compare_grids`` on the requested
    columns (default: every 2-D dataset present in BOTH files). Returns
    ``(cmp_df, value_cols, (nlat, nlon))`` — the executable version of the
    reference's ``plot_comparison_abs.ipynb`` cells 3-7."""
    left, shape_l = load_product_hdf5(spark, left_path)
    right, shape_r = load_product_hdf5(spark, right_path)
    if shape_l != shape_r:
        raise ValueError(f"grid shapes differ: {shape_l} vs {shape_r}")
    keys = {"lat_idx", "lon_idx"}
    common = sorted((set(left.columns) & set(right.columns)) - keys)
    cols = list(value_cols) if value_cols else common
    missing = [c for c in cols if c not in common]
    if missing:
        raise ValueError(f"columns not in both products: {missing}")
    return compare_grids(left, right, cols, round_dp=round_dp), cols, shape_l


def diff_to_array(cmp: DataFrame, col: str, shape: tuple[int, int]):
    """Materialize one ``{col}_absdiff`` plane as a (nlat, nlon) float
    array (NaN where either side is missing) for quick-look rendering."""
    import numpy as np

    arr = np.full(shape, np.nan)
    for r in cmp.select("lat_idx", "lon_idx", f"{col}_absdiff").collect():
        if r[2] is not None:
            arr[r[0], r[1]] = r[2]
    return arr
