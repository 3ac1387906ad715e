"""Streaming per-key anomaly detection (running z-score) via
``applyInPandasWithState``.

The observability half of an event pipeline: score every event against
the RUNNING history of its key — mean/variance of all PRIOR events in
event-time order — and flag |z| above a threshold. Windowed
aggregations can't express this (the frame is "everything before me",
per event, continuously); it is the canonical per-key state machine, so
it rides the same stateful-operator seam as sessionize_stream.

State per key is three numbers — ``(n, sum_cents, sumsq_cents)`` —
CONSTANT size regardless of stream length: the whole design point at
100 TB, where keys live for months. Emission is append-mode and purely
data-driven (every input event emits exactly one scored row; nothing
depends on watermark timing or timeouts), which makes the streaming
output deterministically equal to the batch window rewrite — the s13
oracle compares it to a DuckDB running-frame twin value-for-value.

Determinism contract (same discipline as DSIR's integer staging):
values are staged to exact integer cents before any accumulation, so
the running sums are exact no matter the batch boundaries; mean,
variance and z are then derived with a FIXED sequence of IEEE-double
ops — ``mean = S/n``, ``var = max((Q - (S*S)/n)/n, 0)``,
``z = (v - mean)/sqrt(var)`` — that the SQL twin repeats verbatim, so
both engines round identically at every step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STREAM_ANOMALY_SCHEMA = (
    "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, value_cents BIGINT, "
    "n_prior BIGINT, z DOUBLE, is_anomaly BOOLEAN"
)
_STATE_SCHEMA = "n BIGINT, s BIGINT, q BIGINT"


def zscore_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    min_history: int = 5,
    threshold: float = 3.0,
    watermark: str = "1 hour",
):
    """Score each event's value against its key's running history.

    ``z`` is NULL until ``min_history`` prior events exist (or when the
    prior variance is 0); ``is_anomaly`` is ``|z| > threshold`` (NULL z
    → false). Events are processed in (ts, id) order within each key;
    state is the exact integer (count, sum, sum-of-squares) of all
    events seen so far.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import numpy as np

        (user,) = key
        rows = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col])
            # HALF_UP (round half away from zero), matching the batch
            # rewrite's F.round and the DuckDB twin — numpy's default
            # round is half-to-even and would stage x.125-style dyadic
            # values to a DIFFERENT cent than the other two engines
            v100 = pdf[value_col].to_numpy() * 100.0
            cents = (np.sign(v100) * np.floor(np.abs(v100) + 0.5)).astype(
                "int64"
            )
            rows.extend(
                zip(
                    pdf[id_col].to_numpy(),
                    ts,
                    cents,
                )
            )
        if not rows:
            return
        rows.sort(key=lambda r: (r[1], r[0]))
        n, s, q = state.get if state.exists else (0, 0, 0)
        out = {k: [] for k in (
            "user_id", "event_id", "ts", "value_cents", "n_prior", "z",
            "is_anomaly",
        )}
        for eid, ts, v in rows:
            z = None
            if n >= min_history:
                # stage the exact integer sums through double EXACTLY as
                # the SQL twin does (cast first, then multiply), so both
                # engines perform the identical IEEE op sequence
                sd = float(s)
                mean = sd / n
                var = max((float(q) - sd * sd / n) / n, 0.0)
                if var > 0.0:
                    z = (float(v) - mean) / var**0.5
            out["user_id"].append(user)
            out["event_id"].append(int(eid))
            out["ts"].append(ts)
            out["value_cents"].append(int(v))
            out["n_prior"].append(n)
            out["z"].append(z)
            out["is_anomaly"].append(bool(z is not None and abs(z) > threshold))
            n += 1
            s += int(v)
            q += int(v) * int(v)
        state.update((n, s, q))
        yield pd.DataFrame(out)

    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            fn,
            outputStructType=STREAM_ANOMALY_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def zscore_batch(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    min_history: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """The batch window rewrite of ``zscore_stream`` — identical output
    by construction (same integer staging, same IEEE op sequence), used
    for backfills and as the streaming path's differential check. One
    shuffle on the key; running frames are
    ``ROWS UNBOUNDED PRECEDING .. 1 PRECEDING`` ordered by (ts, id)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cents = F.round(F.col(value_col) * 100.0, 0).cast("long")
    staged = events.select(
        F.col(key_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.col(ts_col).alias("ts"),
        cents.alias("value_cents"),
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum("value_cents").over(w)
    q = F.sum(F.col("value_cents") * F.col("value_cents")).over(w)
    scored = staged.select(
        "user_id", "event_id", "ts", "value_cents",
        F.coalesce(n, F.lit(0)).alias("n_prior"),
        s.alias("__s"), q.alias("__q"),
    )
    mean = F.col("__s").cast("double") / F.col("n_prior")
    var = F.greatest(
        (
            F.col("__q").cast("double")
            - F.col("__s").cast("double") * F.col("__s").cast("double")
            / F.col("n_prior")
        )
        / F.col("n_prior"),
        F.lit(0.0),
    )
    z = F.when(
        (F.col("n_prior") >= min_history) & (var > 0.0),
        (F.col("value_cents") - mean) / F.sqrt(var),
    )
    return scored.select(
        "user_id", "event_id", "ts", "value_cents", "n_prior",
        z.alias("z"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_anomaly"),
    )
