from modis_aggregation_spark.sinks.writers import (  # noqa: F401
    export_hdf5,
    pack_values,
    write_grid_parquet,
)
