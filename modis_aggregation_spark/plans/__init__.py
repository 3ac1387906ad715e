from modis_aggregation_spark.plans.pipeline import (  # noqa: F401
    daily_grid,
    prepare_pixels,
    reaggregate,
)
