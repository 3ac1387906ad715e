from modis_aggregation_spark.streaming.daily_stream import (  # noqa: F401
    stream_daily_grid,
    stream_pixels,
)
