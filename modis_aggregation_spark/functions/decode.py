"""Source decode expressions: fill→NULL and scale/offset (S4, S5, Q3).

Reference behavior:
* fill values become NaN at read (``MODIS_Aggregation/aggregate_functions.py:114``;
  cloud mask ``:144,152``) — the engine maps them to NULL instead so every
  built-in aggregate skips them (SURVEY §1.4).
* scale/offset: the reference reads through netCDF4 auto-scaling (which
  applies ``v·s + o``), reverts it with ``(v−o)/s`` and re-applies the HDF4
  convention ``(v−o)·s`` (``:136-138``, comment ``:103-105``) — a double
  transform that only works because of the auto-scaling (quirk Q3). The
  engine decodes RAW integers once: ``(raw − offset) · scale``.

All pure Catalyst expressions — constant-folded, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decode_raw(raw: Column, scale: float, offset: float, fill: float | int) -> Column:
    """Decode a raw packed value: fill → NULL, then (raw − offset) · scale.

    This is the single-application HDF4 convention the reference's double
    transform is equivalent to (Q3, documented divergence from the
    netCDF4-auto-scaling round-trip).
    """
    v = F.when(raw == F.lit(fill), F.lit(None)).otherwise(raw.cast("double"))
    return (v - F.lit(float(offset))) * F.lit(float(scale))


def reference_double_transform(
    autoscaled: Column, scale: float, offset: float, fill: float | int
) -> Column:
    """strict_compat replica of the reference's read path (Q3): given a
    netCDF4-AUTO-SCALED value ``v·s + o`` it computes ``((v−o)/s − o)·s``.

    Equal to ``decode_raw`` on the raw value whenever auto-scaling was in
    effect; exposed so compat tests can assert that equivalence.
    """
    v = F.when(autoscaled == F.lit(fill), F.lit(None)).otherwise(
        autoscaled.cast("double")
    )
    reverted = (v - F.lit(float(offset))) / F.lit(float(scale))
    return (reverted - F.lit(float(offset))) * F.lit(float(scale))


def null_fill(v: Column, fill: float | int) -> Column:
    """Plain fill→NULL for already-decoded columns (S4)."""
    return F.when(v == F.lit(fill), F.lit(None)).otherwise(v)
