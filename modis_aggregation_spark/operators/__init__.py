"""Aggregation plan builders + large-scale extension operators."""

from modis_aggregation_spark.operators.stats import (
    cell_stats,
    cloud_fraction,
    cloud_fraction_minmax,
    grid_counts,
    with_cell,
)
from modis_aggregation_spark.operators.hist import hist_1d, hist_2d, hist_array
from modis_aggregation_spark.operators.densify import cell_dimension, densify

__all__ = [
    "cell_stats",
    "cloud_fraction",
    "cloud_fraction_minmax",
    "grid_counts",
    "with_cell",
    "hist_1d",
    "hist_2d",
    "hist_array",
    "cell_dimension",
    "densify",
]
