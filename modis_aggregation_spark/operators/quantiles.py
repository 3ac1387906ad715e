"""Scale-safe EXACT order statistics.

Spark's exact ``percentile()`` aggregate buffers an OpenHashMap of the
group's *distinct values* per aggregation buffer (ObjectHashAggregate —
see Spark's ``Percentile`` expression).  Over a bounded-cardinality
column (integer quantities, document lengths) that buffer is small and
the builtin is the right tool; over NEAR-UNIQUE DOUBLES the buffer
grows linearly with rows-per-group, so at 100 TB a hot group OOMs its
task — the round-10 VERDICT's last per-row-unbounded aggregation
buffer.

``group_percentiles`` computes the SAME type-7 (linear-interpolation)
percentiles with bounded memory, in ONE pass over the data: a
``row_number`` plus a partition ``count`` over the same window
partitioning (one exchange, one sort — WindowExec sorts with Spark's
spillable external sorter and buffers partitions in a spill-backed row
array, so memory stays flat no matter how many rows a group holds),
keeping ONLY the floor/ceil rank rows each requested percentile needs
and interpolating between them.

Exactness vs the builtin: both Spark's ``Percentile`` and DuckDB's
``quantile_cont`` compute ``rank = p * (n - 1)`` in double and return
``(ceil(rank) - rank) * x[floor] + (rank - floor(rank)) * x[ceil]``
(x 0-indexed in sort order).  The expressions below reproduce that
arithmetic operation-for-operation, so results are bit-identical to
the builtin — the oracle hash of a query rewritten onto this operator
does not move.  Ties in the sort order are harmless: tied positions
hold equal values by definition.

Reference behavior anchor: the reference's statistics path computes
grid aggregates with NumPy reductions (aggregate_functions.py:226-280);
percentile-threshold curation is part of the extension surface, not
the reference's, so the only contract here is the SQL-standard
``percentile_cont`` semantics both engines implement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["group_percentiles"]


def group_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: dict[str, float],
    discrete: bool = False,
) -> DataFrame:
    """One row per group: ``group_cols + [alias for alias in ps]`` with
    the exact type-7 percentile of ``value_col`` at each requested
    fraction — bit-identical to ``F.expr("percentile(v, p)")`` but with
    bounded (spill-backed) memory per task.

    NULL values are ignored (as the builtin does); a group whose values
    are ALL NULL is omitted from the output (the builtin would emit a
    NULL percentile — callers that need those groups can left-join this
    result back).  ``group_cols`` may be empty for a global percentile,
    at the cost of a single-partition sort — exact global order
    statistics have no cheaper shape; prefer a grouped call or
    ``approx_percentile`` at corpus scale.

    ``discrete=True`` switches to SQL-standard ``percentile_disc``
    semantics (the smallest value whose cumulative distribution
    reaches p: sorted 1-based index ``max(1, ceil(p * n))``, no
    interpolation — an actual member of the group), matching Spark's
    ``percentile_disc``; the arithmetic is one double multiply + ceil,
    reproducible verbatim in oracle SQL.
    """
    if not ps:
        raise ValueError("group_percentiles: ps must name at least one fraction")
    for a, p in ps.items():
        if not (0.0 <= float(p) <= 1.0):
            raise ValueError(f"group_percentiles: {a}={p} outside [0, 1]")

    vals = df.select(
        *group_cols, F.col(value_col).cast("double").alias("__v")
    ).where(F.col("__v").isNotNull())

    keys = [F.col(c) for c in group_cols]
    # both windows share the partition keys, so they plan over ONE
    # exchange + one (spillable) sort; the unordered count frame is
    # evaluated once per partition from the spill-backed row buffer
    w_rank = Window.partitionBy(*keys).orderBy("__v")
    w_all = Window.partitionBy(*keys)
    ranked = vals.select(
        *group_cols,
        "__v",
        F.row_number().over(w_rank).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )

    def _rank(p: float) -> Column:
        # double arithmetic identical to Percentile/quantile_cont:
        # one multiply of p by (n-1)
        return F.lit(float(p)) * (F.col("__n").cast("double") - F.lit(1.0))

    def _disc_rank(p: float) -> Column:
        # SQL-standard percentile_disc: 1-based index ceil(p * n),
        # clamped to 1 for p = 0
        return F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.lit(float(p)) * F.col("__n").cast("double")),
        )

    if discrete:
        keep = None
        for p in ps.values():
            hit = F.col("__rn") == _disc_rank(p)
            keep = hit if keep is None else (keep | hit)
        aggs = []
        for a, p in ps.items():
            aggs.append(
                F.min(
                    F.when(F.col("__rn") == _disc_rank(p), F.col("__v"))
                ).alias(a)
            )
        return ranked.where(keep).groupBy(*group_cols).agg(*aggs)

    keep = None
    for p in ps.values():
        r = _rank(p)
        hit = (F.col("__rn") == F.floor(r) + 1) | (F.col("__rn") == F.ceil(r) + 1)
        keep = hit if keep is None else (keep | hit)
    pruned = ranked.where(keep)

    aggs = [F.first("__n").alias("__n")]
    for a, p in ps.items():
        r = _rank(p)
        aggs.append(
            F.min(F.when(F.col("__rn") == F.floor(r) + 1, F.col("__v"))).alias(
                f"__lo_{a}"
            )
        )
        aggs.append(
            F.min(F.when(F.col("__rn") == F.ceil(r) + 1, F.col("__v"))).alias(
                f"__hi_{a}"
            )
        )
    grid = pruned.groupBy(*group_cols).agg(*aggs)

    outs = list(group_cols)
    for a, p in ps.items():
        r = F.lit(float(p)) * (F.col("__n").cast("double") - F.lit(1.0))
        lo, hi = F.col(f"__lo_{a}"), F.col(f"__hi_{a}")
        # (ceil - rank) * lo + (rank - floor) * hi, exactly as both
        # engines interpolate; ceil == floor collapses to the value
        interp = F.when(F.ceil(r) == F.floor(r), lo).otherwise(
            (F.ceil(r).cast("double") - r) * lo
            + (r - F.floor(r).cast("double")) * hi
        )
        outs.append(interp.alias(a))
    return grid.select(*outs)
