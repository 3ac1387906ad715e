"""SQL surface: register the engine's tables as temp views so every query
runs through ``spark.sql`` unchanged.

All engine operators compile to stock Catalyst plans (SURVEY §3.4), so the
SQL surface is free — this module just standardizes view registration for
the star-schema tables, the MODIS fixtures, and any L3 result grid.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

STAR_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_star_schema(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Create temp views for the TPC-H-ish tables under ``sf_dir``."""
    out = []
    for t in tables or STAR_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(t)
            out.append(t)
    return out


def register_fixtures(spark: SparkSession, fixtures_dir: str) -> list[str]:
    """Create ``pixels`` / ``granules`` views for the MODIS fixtures."""
    out = []
    for t in ("pixels", "granules"):
        path = os.path.join(fixtures_dir, f"{t}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(t)
            out.append(t)
    return out


def register_grid(spark: SparkSession, grid: DataFrame, name: str = "l3_grid") -> str:
    grid.createOrReplaceTempView(name)
    return name
