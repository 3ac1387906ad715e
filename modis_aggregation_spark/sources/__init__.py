"""Sources: granule catalog construction, MODIS-shaped fixtures, readers."""

from modis_aggregation_spark.sources.catalog import (
    catalog_from_filenames,
    date_range_catalog,
    pair_granules,
)
from modis_aggregation_spark.sources.fixtures import (
    FIXTURES_DIR,
    generate_fixtures,
    read_granules,
    read_pixels,
)

__all__ = [
    "catalog_from_filenames",
    "date_range_catalog",
    "pair_granules",
    "FIXTURES_DIR",
    "generate_fixtures",
    "read_granules",
    "read_pixels",
]
