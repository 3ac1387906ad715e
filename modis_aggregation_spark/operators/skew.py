"""Skew-resistant aggregation: two-phase salted groupBy.

AQE's skew-join handling covers joins, but a groupBy with heavy-hitter
keys (a boilerplate LSH bucket, a cell over a persistent storm system, a
hot user_id) still funnels every row of the hot key through one reduce
task. ``salted_agg`` splits each group into ``n_salts`` sub-groups
map-side, aggregates the sub-groups (full parallelism), and re-merges —
the classic two-round rewrite, valid for any set of ALGEBRAIC aggregates
(expressible as partial → merge → finalize).

At 100 TB this is the difference between one straggler task owning a hot
key's terabyte and 64 tasks each owning 1/64th of it. For the engine's own
cell aggregation the partial/final hash agg already does this implicitly;
``salted_agg`` exists for user-level aggregations whose partials are big
(collect_list-ish state, huge histograms) where map-side combine degrades.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# (partial_expr, merge_expr, finalize_expr) builders per supported stat.
# partial runs per (key, salt); merge re-aggregates per key; finalize is a
# plain projection.
_SUPPORTED = ("sum", "count", "min", "max", "avg", "stddev_pop")


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    stats: Sequence[str] = ("sum", "count", "avg"),
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation of ``value_col`` per ``group_cols``.

    Output columns are named ``{value_col}_{stat}`` and match the plain
    ``groupBy().agg()`` results exactly (avg/stddev re-derived from
    mergeable partials; stddev via the Σv² formula).
    """
    unknown = set(stats) - set(_SUPPORTED)
    if unknown:
        raise ValueError(f"unsupported stats for salted_agg: {sorted(unknown)}")
    v = F.col(value_col)
    salted = df.withColumn(
        "__salt", (F.xxhash64(F.monotonically_increasing_id()) % n_salts).cast("int")
    )
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        F.sum(v).alias("__s"),
        F.count(v).alias("__c"),
        F.min(v).alias("__mn"),
        F.max(v).alias("__mx"),
        F.sum(v * v).alias("__ss"),
    )
    merged = phase1.groupBy(*group_cols).agg(
        F.sum("__s").alias("__s"),
        F.sum("__c").alias("__c"),
        F.min("__mn").alias("__mn"),
        F.max("__mx").alias("__mx"),
        F.sum("__ss").alias("__ss"),
    )
    out_cols: list[Column] = [F.col(c) for c in group_cols]
    cnt = F.nullif(F.col("__c"), F.lit(0))
    for s in stats:
        name = f"{value_col}_{s}"
        if s == "sum":
            out_cols.append(F.col("__s").alias(name))
        elif s == "count":
            out_cols.append(F.col("__c").alias(name))
        elif s == "min":
            out_cols.append(F.col("__mn").alias(name))
        elif s == "max":
            out_cols.append(F.col("__mx").alias(name))
        elif s == "avg":
            out_cols.append((F.col("__s") / cnt).alias(name))
        elif s == "stddev_pop":
            m = F.col("__s") / cnt
            out_cols.append(
                F.when(
                    F.col("__c") > 0,
                    F.sqrt(F.greatest(F.col("__ss") / cnt - m * m, F.lit(0.0))),
                ).alias(name)
            )
    return merged.select(*out_cols)
