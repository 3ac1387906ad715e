"""Column-expression builders — every hot-path transform is a built-in
Catalyst expression (whole-stage codegen), never a Python UDF."""

from modis_aggregation_spark.functions.bits import bit_field, cloud_mask_flag
from modis_aggregation_spark.functions.grid import cell_id, lat_idx, lon_idx
from modis_aggregation_spark.functions.histogram import hist_bucket
from modis_aggregation_spark.functions.dayrules import day_definition_null

__all__ = [
    "bit_field",
    "cloud_mask_flag",
    "cell_id",
    "lat_idx",
    "lon_idx",
    "hist_bucket",
    "day_definition_null",
]
