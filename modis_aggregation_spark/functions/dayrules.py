"""'Definition of day' longitude-quadrant nulling (operator P4).

Reference semantics (``MODIS_Aggregation/aggregate_functions.py:317-350``;
spill-catalog setup ``:589-601``): the daily product for end-date D also
ingests the first ``shift_hour`` (=3) hours of day D+1, and corrects the
orbit gap/overlap by NULLing measures (not dropping rows) in longitude
quadrants, only for granules whose file hour < shift_hour:

* granule day == D   : null where lon ∈ [-180, -90] OR lon ∈ [0, 90]
* granule day == D+1 : null where lon ∈ [90, 180]  OR lon ∈ [-90, 0]

All bounds are INCLUSIVE (reference uses <=/>=). The cloud-mask column is
nulled too (it feeds the cloud-fraction path). NULLed values then fall out
of every NULL-skipping aggregate, reproducing the reference's NaN behavior
(see SURVEY §1.4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def day_definition_condition(
    lon: Column,
    granule_doy: Column,
    granule_hour: Column,
    end_doy: int,
    spill_doy: int,
    shift_hours: int = 3,
) -> Column:
    """Boolean column: True where a measure must be NULLed."""
    shifted = granule_hour < F.lit(shift_hours)
    day_d = (granule_doy == F.lit(end_doy)) & (
        ((lon >= -180) & (lon <= -90)) | ((lon >= 0) & (lon <= 90))
    )
    day_d1 = (granule_doy == F.lit(spill_doy)) & (
        ((lon >= 90) & (lon <= 180)) | ((lon >= -90) & (lon <= 0))
    )
    return shifted & (day_d | day_d1)


def day_definition_null(
    df: DataFrame,
    measure_cols: Sequence[str],
    end_doy: int,
    spill_doy: int,
    shift_hours: int = 3,
    lon_col: str = "lon",
    doy_col: str = "doy",
    hour_col: str = "hour",
) -> DataFrame:
    """NULL-out ``measure_cols`` on rows matching the day-definition rule."""
    cond = day_definition_condition(
        F.col(lon_col), F.col(doy_col), F.col(hour_col), end_doy, spill_doy, shift_hours
    )
    return df.withColumns(
        {c: F.when(cond, F.lit(None)).otherwise(F.col(c)) for c in measure_cols}
    )


def day_definition_sql(
    end_doy: int, spill_doy: int, shift_hours: int = 3, lon: str = "lon"
) -> str:
    """The nulling predicate as SQL text (for oracle queries)."""
    return (
        f"(hour < {shift_hours} AND ("
        f"(doy = {end_doy} AND (({lon} >= -180 AND {lon} <= -90) OR ({lon} >= 0 AND {lon} <= 90)))"
        f" OR "
        f"(doy = {spill_doy} AND (({lon} >= 90 AND {lon} <= 180) OR ({lon} >= -90 AND {lon} <= 0)))"
        f"))"
    )
