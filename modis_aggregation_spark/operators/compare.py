"""Result-grid comparison (J4) — the engine's executable version of the
reference's validation notebooks.

The reference validates against the official NASA MYD08 product by loading
both grids, applying identical unpack transforms, rounding to 4 decimals,
subtracting, and ratio-ing (``examples/result_comparison/
plot_comparison_abs.ipynb`` cells 3-7). Here that becomes a join of two
result tables on (lat_idx, lon_idx) with difference expressions — usable
in tests, CI gates, or ad-hoc product QA instead of notebook plots.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compare_grids(
    left: DataFrame,
    right: DataFrame,
    value_cols: Sequence[str],
    key_cols: Sequence[str] = ("lat_idx", "lon_idx"),
    round_dp: int = 4,
) -> DataFrame:
    """Cell-aligned comparison of two grids.

    For each value column emits ``{col}_l``, ``{col}_r``, ``{col}_absdiff``
    (|l−r| after round(4), matching the notebook), and ``{col}_ratio``
    (l/r, NULL where r is 0/NULL). Full outer join so cells present in only
    one grid surface as NULL rows rather than disappearing.
    """
    lsel = left.select(*key_cols, *[F.col(c).alias(f"{c}_l") for c in value_cols])
    rsel = right.select(*key_cols, *[F.col(c).alias(f"{c}_r") for c in value_cols])
    out = lsel.join(rsel, list(key_cols), "full_outer")
    for c in value_cols:
        lc, rc = F.col(f"{c}_l"), F.col(f"{c}_r")
        out = out.withColumn(
            f"{c}_absdiff", F.abs(F.round(lc, round_dp) - F.round(rc, round_dp))
        ).withColumn(f"{c}_ratio", lc / F.nullif(rc, F.lit(0)))
    return out


def max_abs_diff(cmp: DataFrame, value_cols: Sequence[str]) -> dict[str, float]:
    """Driver-side summary: max |diff| per column (NULL-safe, 0 if empty)."""
    row = cmp.agg(
        *[F.max(F.col(f"{c}_absdiff")).alias(c) for c in value_cols]
    ).first()
    return {c: (0.0 if row[c] is None else float(row[c])) for c in value_cols}
