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
    discrete_ps: dict[str, float] | None = None,
) -> DataFrame:
    """One row per group: ``group_cols + [alias for alias in ps]`` with
    the exact type-7 percentile of ``value_col`` at each requested
    fraction — bit-identical to ``F.expr("percentile(v, p)")`` but with
    bounded (spill-backed) memory per task.

    NULL values are ignored (as the builtin does); a group whose values
    are ALL NULL is omitted from the output (the builtin would emit a
    NULL percentile — callers that need those groups can left-join this
    result back).  ``group_cols`` may be empty for a global percentile:
    since round 12 that path is DISTRIBUTED too — the bucket +
    prefix-sum shape (the ``pack_sequences``/``seeded_shuffle``
    pattern): one skinny min/max/count pass fixes ``n_buckets``
    equal-width value ranges (a monotone map, so bucket order IS value
    order), a per-bucket exact count pass prefix-sums to cumulative
    offsets on the driver (≤ ``n_buckets`` rows — model-sized), each
    target global rank resolves to (bucket, local rank), and only the
    HIT buckets' rows are row_numbered (window partitioned BY BUCKET —
    never a single-partition global sort) and joined against the tiny
    broadcast selection table.  Exactness does not depend on bucket
    balance — counts are exact int64 and local ranks are exact — only
    the sort size per task does; NaNs route to a dedicated top bucket
    (they sort greatest, as in the builtin), and a degenerate width
    (all values equal, or infinite endpoints) collapses to one bucket,
    which is still correct (the per-bucket sort spills).

    ``discrete=True`` switches to SQL-standard ``percentile_disc``
    semantics (the smallest value whose cumulative distribution
    reaches p: sorted 1-based index ``max(1, ceil(p * n))``, no
    interpolation — an actual member of the group), matching Spark's
    ``percentile_disc``; the arithmetic is one double multiply + ceil,
    reproducible verbatim in oracle SQL.

    ``discrete_ps`` (global path only, round 12): additional
    percentile_disc fractions computed IN THE SAME three passes as the
    continuous ``ps`` — the disc targets just add selection rows, so a
    mixed cont+disc read costs one operator invocation instead of two
    full re-scans of the corpus.
    """
    if not ps:
        raise ValueError("group_percentiles: ps must name at least one fraction")
    for a, p in {**ps, **(discrete_ps or {})}.items():
        if not (0.0 <= float(p) <= 1.0):
            raise ValueError(f"group_percentiles: {a}={p} outside [0, 1]")
    if discrete_ps and set(discrete_ps) & set(ps):
        raise ValueError("group_percentiles: discrete_ps aliases collide with ps")

    vals = df.select(
        *group_cols, F.col(value_col).cast("double").alias("__v")
    ).where(F.col("__v").isNotNull())

    if not group_cols:
        return _global_percentiles(vals, ps, discrete, discrete_ps)
    if discrete_ps:
        raise ValueError(
            "group_percentiles: discrete_ps is only supported on the "
            "global (group_cols=[]) path; call twice for grouped reads"
        )

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


def _global_percentiles(
    vals: DataFrame,
    ps: dict[str, float],
    discrete: bool,
    discrete_ps: dict[str, float] | None = None,
    n_buckets: int = 1024,
) -> DataFrame:
    """Distributed EXACT global order statistics (round 12): bucket +
    prefix-sum + within-bucket rank selection.  See the
    ``group_percentiles`` docstring; ``vals`` is the non-NULL ``__v``
    projection.  Three skinny passes, no global sort, ≤ ``n_buckets``
    driver rows — the 100 TB shape."""
    import math

    spark = vals.sparkSession

    stats = vals.agg(
        F.count("__v").alias("n"),
        F.min(F.when(~F.isnan("__v"), F.col("__v"))).alias("lo"),
        F.max(F.when(~F.isnan("__v"), F.col("__v"))).alias("hi"),
    ).collect()[0]
    n = int(stats["n"])
    null_row = spark.range(1).select(
        *[
            F.lit(None).cast("double").alias(a)
            for a in {**ps, **(discrete_ps or {})}
        ]
    )
    if n == 0:
        # builtin parity: a global aggregate over no rows yields one
        # row of NULL percentiles
        return null_row

    lo, hi = stats["lo"], stats["hi"]
    width = None
    if lo is not None and hi is not None:
        w = (hi - lo) / float(n_buckets)
        if math.isfinite(w) and w > 0.0:
            width = w
    if width is None:
        # all values equal / all NaN / infinite endpoints: one value
        # bucket (correct — the per-bucket sort spills), NaNs on top
        bucket = F.when(F.isnan("__v"), F.lit(1)).otherwise(F.lit(0))
    else:
        bucket = (
            F.when(F.isnan("__v"), F.lit(n_buckets))
            .otherwise(
                F.least(
                    F.lit(n_buckets - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor((F.col("__v") - F.lit(lo)) / F.lit(width))
                        .cast("int"),
                    ),
                )
            )
        )
    bucketed = vals.select(bucket.alias("__b"), "__v")

    counts = {
        int(r["__b"]): int(r["cnt"])
        for r in bucketed.groupBy("__b").agg(F.count("__v").alias("cnt"))
        .collect()
    }
    cum = 0
    cum_before = {}  # bucket -> rows in all lower buckets
    for b in sorted(counts):
        cum_before[b] = cum
        cum += counts[b]

    def _locate(grank: int) -> tuple[int, int]:
        for b in sorted(counts):
            if grank <= cum_before[b] + counts[b]:
                return b, grank - cum_before[b]
        raise AssertionError(f"rank {grank} beyond {cum} rows")

    # resolve every needed global rank to (bucket, local rank); the
    # rank arithmetic mirrors the grouped path / the builtin exactly
    selections = []  # (slot, bucket, local_rank)
    disc_aliases = set(discrete_ps or {})
    all_ps = dict(ps)
    if discrete_ps:
        all_ps.update(discrete_ps)
    for a, p in all_ps.items():
        if discrete or a in disc_aliases:
            g = max(1, math.ceil(float(p) * float(n)))
            selections.append((f"d_{a}",) + _locate(g))
        else:
            r = float(p) * (float(n) - 1.0)
            glo, ghi = int(math.floor(r)) + 1, int(math.ceil(r)) + 1
            selections.append((f"lo_{a}",) + _locate(glo))
            selections.append((f"hi_{a}",) + _locate(ghi))

    hit = sorted({b for _, b, _ in selections})
    sel_df = spark.createDataFrame(
        selections, "slot STRING, __b INT, __rn BIGINT"
    )
    w_b = Window.partitionBy("__b").orderBy("__v")
    ranked = (
        bucketed.where(F.col("__b").isin(hit))
        .select("__b", "__v", F.row_number().over(w_b).alias("__rn"))
        .join(F.broadcast(sel_df), ["__b", "__rn"])
    )
    picked = ranked.agg(
        *[
            F.min(F.when(F.col("slot") == s, F.col("__v"))).alias(s)
            for s in sorted({s for s, _, _ in selections})
        ]
    )

    outs = []
    for a, p in all_ps.items():
        if discrete or a in disc_aliases:
            outs.append(F.col(f"d_{a}").alias(a))
            continue
        # interpolation arithmetic identical to the grouped path and
        # both engines' builtins: r = p * (n - 1) in double
        r = F.lit(float(p)) * (F.lit(float(n)) - F.lit(1.0))
        lo_c, hi_c = F.col(f"lo_{a}"), F.col(f"hi_{a}")
        interp = F.when(F.ceil(r) == F.floor(r), lo_c).otherwise(
            (F.ceil(r).cast("double") - r) * lo_c
            + (r - F.floor(r).cast("double")) * hi_c
        )
        outs.append(interp.alias(a))
    return picked.select(*outs)
