"""modis_aggregation_spark — a PySpark-native Level-2 → Level-3 aggregation engine.

A brand-new engine with the query/data-processing capabilities of the
reference pipeline (big-data-lab-umbc/MODIS_Aggregation, surveyed in
/root/repo/SURVEY.md), re-expressed Spark-first:

* sources  — granule catalog + pixel readers (parquet fixtures natively;
             real HDF granules behind a Python Data Source stub)
* functions — scalar/column expression builders (bit decode, grid keys,
             histogram buckets with NumPy edge semantics, day-definition)
* operators — aggregation plan builders (per-cell statistics, histograms,
             cloud fraction, densification) plus the large-scale extension
             surface (dedup, similarity search, text analysis, multimodal)
* plans    — AggregationSpec → DataFrame pipeline assembly
* sinks    — parquet canonical sink + HDF5-compatible exporter
* streaming — Structured Streaming daily-grid mode

Everything hot-path is built-in Catalyst expressions (whole-stage codegen);
Python appears only in fixture generation, config parsing, and clearly-marked
Pandas-UDF extension operators.
"""

from modis_aggregation_spark.config import AggregationSpec, VariableSpec
from modis_aggregation_spark.session import get_spark

__all__ = ["AggregationSpec", "VariableSpec", "get_spark"]

__version__ = "0.1.0"
