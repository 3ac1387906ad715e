"""Stream-stream joins (Structured Streaming).

The reference has no streaming surface at all (batch HDF4 in, HDF5 out);
an event pipeline feeding a training corpus does: impressions⋈clicks,
request⋈response pairing, media-arrival⋈metadata-arrival. Spark's
stream-stream inner join requires BOTH sides watermarked plus a time-range
join condition — that pair is what lets the state store evict: a buffered
left row can be dropped once the right watermark passes ``left.ts +
upper_bound``, so per-key state is bounded by (interval + watermark) of
event-time, not by stream length. That bound is the entire 100 TB story
here: without the time-range condition Spark must buffer both streams
forever and refuses the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    interval_sec: int = 3600,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked interval join: pair each left event with right events
    of the same key within ``[left.ts, left.ts + interval_sec]``.

    Both inputs may be streaming (the canonical stream-stream case) or
    batch (same plan, no state). Non-key columns are disambiguated with
    ``l_``/``r_`` prefixes; the watermark is declared on the renamed
    timestamp columns so it survives into the join.

    Determinism note: rows later than the watermark get dropped from the
    state store, so a finite replay (availableNow over unordered files)
    only equals the batch join when the watermark covers the full
    event-time span of the data. Production deployments want the opposite
    — a tight watermark, trading exactly-batch completeness for bounded
    state.
    """
    l = left.select(
        F.col(on),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c != on],
    ).withWatermark(f"l_{ts_col}", watermark)
    r = right.select(
        F.col(on).alias("__rk"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != on],
    ).withWatermark(f"r_{ts_col}", watermark)
    cond = (
        (F.col(on) == F.col("__rk"))
        & (F.col(f"r_{ts_col}") >= F.col(f"l_{ts_col}"))
        & (
            F.col(f"r_{ts_col}")
            <= F.col(f"l_{ts_col}")
            + F.expr(f"INTERVAL {int(interval_sec)} SECONDS")
        )
    )
    return l.join(r, cond, how).drop("__rk")
