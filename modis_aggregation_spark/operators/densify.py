"""Grid densification (J3, M9): sparse per-cell aggregates → full grid.

The reference pre-allocates dense zero/inf-initialized buffers for EVERY
cell up front (``MODIS_Aggregation/aggregate_functions.py:538-563``); the
engine aggregates sparsely (hash agg touches only observed keys) and
densifies once, at the sink, with a generated cell dimension LEFT JOIN'd
against the aggregate — counts default to 0, statistics stay NULL for
empty cells (→ fill values in the exporter).

Scale: the cell dimension is ncells rows (64,800 at 1°) — always broadcast;
the join never shuffles the aggregate side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def cell_dimension(spark: SparkSession, nlat: int, nlon: int) -> DataFrame:
    """All (cell, lat_idx, lon_idx) for the grid — generated, never read."""
    return spark.range(nlat * nlon).select(
        F.col("id").alias("cell"),
        (F.col("id") / nlon).cast("int").alias("lat_idx"),
        (F.col("id") % nlon).cast("int").alias("lon_idx"),
    )


def densify(
    agg: DataFrame,
    nlat: int,
    nlon: int,
    zero_fill_cols: Sequence[str] = (),
) -> DataFrame:
    """LEFT JOIN the full cell dimension against a per-cell aggregate.

    ``zero_fill_cols`` (counts) are coalesced to 0; everything else keeps
    NULL on empty cells.
    """
    spark = agg.sparkSession
    dim = cell_dimension(spark, nlat, nlon)
    out = dim.join(F.broadcast(agg), "cell", "left")
    if zero_fill_cols:
        out = out.withColumns(
            {c: F.coalesce(F.col(c), F.lit(0)) for c in zero_fill_cols}
        )
    return out
