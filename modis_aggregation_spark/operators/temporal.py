"""Temporal joins: as-of (nearest-prior/next match) and banded range join.

Neither exists in the reference (its pairing is filename-keyed equality,
``MODIS_Aggregation/aggregate_functions.py:96-109``) or in stock Spark's
join menu; both are staples of event/feature pipelines (point-in-time
feature lookup, click→outcome attribution) and both degenerate into a
cartesian-per-key theta join if written naively. The implementations here
are the scale shapes:

- ``asof_join``: the union-marker + running ``last()`` window rewrite.
  ONE shuffle on the key column, no join at all — both sides are unioned,
  sorted per key by (ts, side), and the right payload is carried forward
  (or backward) by an ignore-nulls window. O(n log n) per key, resistant
  to the per-key row explosion a ``l.ts >= r.ts`` theta join produces.
- ``range_join_binned``: time-binned equi-join. Each left row probes only
  the ceil(span/bin)+1 bins its window can overlap, so the join is a plain
  hash equi-join on (key, bin) followed by an exact filter — never a
  BroadcastNestedLoopJoin. Bin width defaults to the window span, giving
  at most 2 probe bins per left row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PAYLOAD = "__asof_payload"
_SIDE = "__asof_side"
_BIN = "__range_bin"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] = "user_id",
    ts_col: str = "ts",
    right_cols: Sequence[str] = ("value",),
    direction: str = "backward",
    tolerance_sec: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (``backward``; ``forward`` = earliest with
    ``right.ts >= left.ts``) sharing the key column(s). Unmatched left
    rows keep NULLs (left-join semantics).

    Ties: an equal-timestamp right row DOES match (>= / <=, like DuckDB's
    ASOF). Among right rows sharing the extreme timestamp the window picks
    one nondeterministically — pre-aggregate the right side to one row per
    (key, ts) if the payload must be deterministic.

    Output: all left columns, then ``<ts_col><suffix>`` and
    ``<c><suffix>`` for each of ``right_cols``.

    Rows with NULL ``ts_col`` never match and are dropped from the right
    side (they would sort first and pollute the running last()).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)

    payload = F.struct(F.col(ts_col).alias(ts_col), *[F.col(c) for c in right_cols])
    # side sorts the right row BEFORE the left at equal ts for backward
    # (so last() sees it) and AFTER for forward (so first() sees it).
    r_side = 0 if direction == "backward" else 2
    r = (
        right.where(F.col(ts_col).isNotNull())
        .select(*keys, ts_col, payload.alias(_PAYLOAD))
        .withColumn(_SIDE, F.lit(r_side))
    )
    l = left.withColumn(_PAYLOAD, F.lit(None).cast(r.schema[_PAYLOAD].dataType)).withColumn(
        _SIDE, F.lit(1)
    )
    unioned = l.select(*left.columns, _PAYLOAD, _SIDE).unionByName(
        r.select(
            *keys,
            *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c)
              for c in left.columns if c not in keys and c != ts_col],
            ts_col,
            _PAYLOAD,
            _SIDE,
        ).select(*left.columns, _PAYLOAD, _SIDE)
    )

    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(_SIDE))
    if direction == "backward":
        frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carried = F.last(F.col(_PAYLOAD), ignorenulls=True).over(frame)
    else:
        frame = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carried = F.first(F.col(_PAYLOAD), ignorenulls=True).over(frame)

    matched = (
        unioned.withColumn(_PAYLOAD, carried)
        .where(F.col(_SIDE) == 1)
        .drop(_SIDE)
    )
    if tolerance_sec is not None:
        gap = F.abs(
            F.col(ts_col).cast("double") - F.col(_PAYLOAD)[ts_col].cast("double")
        )
        matched = matched.withColumn(
            _PAYLOAD, F.when(gap <= float(tolerance_sec), F.col(_PAYLOAD))
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col(_PAYLOAD)[ts_col].alias(f"{ts_col}{suffix}"))
    out_cols.extend(F.col(_PAYLOAD)[c].alias(f"{c}{suffix}") for c in right_cols)
    return matched.select(*out_cols)


def _epoch_us(c: Column) -> Column:
    # cast tolerates TIMESTAMP_NTZ inputs (raw parquet without the repo's
    # session normalization); NTZ is interpreted in the session time zone
    return F.unix_micros(c.cast("timestamp"))


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] = "user_id",
    ts_col: str = "ts",
    lower_sec: float = 0.0,
    upper_sec: float = 300.0,
    bin_sec: float | None = None,
) -> DataFrame:
    """All (left, right) pairs sharing the key with
    ``lower_sec <= right.ts - left.ts <= upper_sec`` (bounds inclusive;
    ``lower_sec`` may be negative for a window straddling the left event).

    Plan shape: right rows land in bin floor(ts/bin); each left row is
    exploded to the bins its [ts+lower, ts+upper] window overlaps
    (``sequence`` over bin ids — 2 bins when ``bin_sec`` is the default
    window span). The join is then a hash equi-join on (key, bin) plus an
    exact microsecond filter. Each qualifying pair appears exactly once:
    a right row occupies exactly one bin.

    Columns are suffixed ``_l`` / ``_r`` apart from the key column(s).
    """
    if upper_sec < lower_sec:
        raise ValueError("upper_sec must be >= lower_sec")
    keys = [on] if isinstance(on, str) else list(on)
    span_us = int(round((upper_sec - lower_sec) * 1e6))
    lower_us = int(round(lower_sec * 1e6))
    upper_us = int(round(upper_sec * 1e6))
    bin_us = int(round(bin_sec * 1e6)) if bin_sec is not None else max(span_us, 1)

    l_us = _epoch_us(F.col(f"{ts_col}_l"))
    lo_bin = F.floor((l_us + F.lit(lower_us)) / F.lit(bin_us))
    hi_bin = F.floor((l_us + F.lit(upper_us)) / F.lit(bin_us))
    lhs = (
        left.where(F.col(ts_col).isNotNull())
        .select(
            *keys,
            *[F.col(c).alias(f"{c}_l") for c in left.columns if c not in keys],
        )
        .withColumn(_BIN, F.explode(F.sequence(lo_bin, hi_bin)))
    )
    rhs = (
        right.where(F.col(ts_col).isNotNull())
        .select(
            *keys,
            *[F.col(c).alias(f"{c}_r") for c in right.columns if c not in keys],
        )
        .withColumn(_BIN, F.floor(_epoch_us(F.col(f"{ts_col}_r")) / F.lit(bin_us)))
    )
    delta = _epoch_us(F.col(f"{ts_col}_r")) - _epoch_us(F.col(f"{ts_col}_l"))
    return (
        lhs.join(rhs, on=[*keys, _BIN])
        .where((delta >= lower_us) & (delta <= upper_us))
        .drop(_BIN)
    )


def ewma(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    key_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Per-key exponentially-weighted moving average (adjusted form).

    ``ewma_i = Σ_{j≤i} x_j·β^(i−j) / Σ_{j≤i} β^(i−j)`` with ``β = 1−α``
    (pandas ``ewm(alpha).mean()`` with ``adjust=True``). Computed entirely
    JVM-side: one hash shuffle groups each key's series, ``sort_array``
    orders it by timestamp, and a higher-order ``transform`` evaluates the
    closed form per position. All exponents are NON-negative, so weights
    only decay (no overflow for arbitrarily long series) — the naive
    window-sum factorization ``β^i·Σ x_j·β^(−j)`` explodes at a few
    hundred rows and is deliberately avoided.

    O(n²) arithmetic per key (n = series length), O(n) state: correct for
    event-series in the thousands per key. For million-row keys, window
    the series by session/day first (the same bound every collect-based
    sessionizer in this repo documents).

    Returns one row per input observation:
    ``(key, pos, ts, value, ewma)`` with ``pos`` 1-based in ts order.
    No counterpart in the reference (its temporal axis is the
    file-per-granule catalog, ``aggregate_functions.py:96-109``).
    """
    beta = 1.0 - alpha
    series = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(ts_col).alias("ts"),
                                        F.col(value_col).alias("value")))
            ).alias("__s")
        )
    )
    vals = F.col("__s.value")
    n = F.size("__s")

    def _at(i):
        # Closed form at position i: weighted mean of the prefix 1..i.
        prefix = F.slice(vals, 1, i)
        num = F.aggregate(
            F.zip_with(
                prefix,
                F.sequence(F.lit(1), i),
                lambda x, j: x * F.pow(F.lit(beta), (i - j).cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        den = F.aggregate(
            F.transform(
                F.sequence(F.lit(1), i),
                lambda j: F.pow(F.lit(beta), (i - j).cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return num / den

    rows = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.element_at(F.col("__s"), i)["ts"].alias("ts"),
            F.element_at(F.col("__s"), i)["value"].alias("value"),
            _at(i).alias("ewma"),
        ),
    )
    out = series.select("key", F.explode(rows).alias("__r"))
    return out.select(
        "key",
        F.col("__r.pos").alias("pos"),
        F.col("__r.ts").alias("ts"),
        F.col("__r.value").alias("value"),
        F.col("__r.ewma").alias("ewma"),
    )


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    key_col: str,
    threshold: float = 2.0,
) -> DataFrame:
    """Per-group z-score outlier flagging: ``|x − μ_k| / σ_k > threshold``.

    Two-phase shape: a partial+final hash agg computes (μ, σ_pop) per key
    (≤ |keys| rows), which joins back to the events — Spark broadcasts it
    when small, AQE decides otherwise; no window over the full table, so
    no per-key sort and no single-task hot key. Rows in groups with σ = 0
    or a single observation are never outliers (z is NULL there).

    Returns the input columns plus ``mean_v``, ``std_v``, ``z`` for the
    flagged rows only.
    """
    stats = df.groupBy(F.col(key_col)).agg(
        F.avg(F.col(value_col)).alias("mean_v"),
        F.stddev_pop(F.col(value_col)).alias("std_v"),
    )
    z = (F.col(value_col) - F.col("mean_v")) / F.nullif(F.col("std_v"), F.lit(0.0))
    return (
        df.join(stats, key_col)
        .withColumn("z", z)
        .where(F.abs(F.col("z")) > threshold)
    )


def resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_col: str,
    bucket_seconds: int = 3600,
    gap_fill: bool = True,
) -> DataFrame:
    """Time-bucket resampling with per-key gap filling — the hypertable
    rollup primitive (``time_bucket`` + ``generate_series`` in timescale
    dialects).

    One hash aggregation produces (key, bucket, avg/count); gap filling
    generates each key's full bucket range from its own min/max (a
    ``sequence``+``explode`` over the per-key agg — rows generated are
    O(span/bucket) per key, no global calendar scan) and left-joins the
    observed buckets back. Missing buckets carry NULL ``avg_v`` /
    ``n = 0``.

    Scale: both shuffles are keyed on (key[, bucket]) — skinny aggregate
    rows, never raw events; the generated side is derived from the ≤|keys|
    row summary. Reference has no time axis beyond the granule catalog
    (aggregate_functions.py:96-109).
    """
    bucket = F.floor(
        _epoch_us(F.col(ts_col)) / F.lit(int(bucket_seconds) * 1_000_000)
    ).alias("bucket")
    agg = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"), bucket)
        .agg(
            F.avg(F.col(value_col)).alias("avg_v"),
            F.count(F.col(value_col)).alias("n"),
        )
    )
    if not gap_fill:
        return agg
    spans = agg.groupBy("key").agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    grid = spans.select(
        "key", F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("bucket")
    )
    return grid.join(agg, ["key", "bucket"], "left").select(
        "key", "bucket", "avg_v", F.coalesce("n", F.lit(0)).alias("n")
    )


def interpolate_linear(
    resampled: DataFrame,
    key_col: str = "key",
    bucket_col: str = "bucket",
    value_col: str = "avg_v",
) -> DataFrame:
    """Linear interpolation of NULL buckets between observed neighbors.

    Two ignore-nulls window passes per key (last-before carrying value AND
    bucket forward, first-after carrying them backward), then the closed
    form ``prev + (next − prev)·(t − t_prev)/(t_next − t_prev)``. Buckets
    before the first / after the last observation stay NULL (no
    extrapolation). Window state is one row — safe for arbitrarily long
    keys. Adds ``interp_v``; observed buckets keep their value.
    """
    w_back = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    observed_b = F.when(v.isNotNull(), F.col(bucket_col))
    prev_v = F.last(v, ignorenulls=True).over(w_back)
    prev_b = F.last(observed_b, ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    next_b = F.first(observed_b, ignorenulls=True).over(w_fwd)
    frac = (F.col(bucket_col) - prev_b) / (next_b - prev_b)
    interp = F.when(v.isNotNull(), v).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * frac,
        )
    )
    return resampled.withColumn("interp_v", interp)
