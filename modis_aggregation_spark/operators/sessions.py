"""Sessionization: gap-based event sessions, batch and streaming.

Batch: the classic window rewrite — ``lag(ts)`` per user, new-session flag
on gap > timeout, running sum of flags = session id. Pure Catalyst, one
shuffle on user_id (SQL-expressible, oracle-checked as r16).

Streaming: ``applyInPandasWithState`` keeps an open session per user and
emits sessions as they close — the engine's demonstration of a custom
stateful streaming operator for semantics that windowed aggregation can't
express (data-driven gaps rather than fixed windows). Spark 4's
``session_window`` covers the common case; the stateful form is the
template for arbitrary per-key state machines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign ``session_id`` (0-based per user) by inactivity gap.

    Deterministic given a total order: pass tie-breaker ``order_cols``
    (e.g. event_id) for equal timestamps.
    """
    order = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_sec = gap_minutes * 60.0
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull()
        | (F.col(ts_col).cast("double") - prev.cast("double") > gap_sec),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-session summary: start/end/duration/event count."""
    s = sessionize(events, user_col, ts_col, gap_minutes, order_cols)
    return s.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.max(F.col(ts_col)).cast("double")
            - F.min(F.col(ts_col)).cast("double")
        ).alias("duration_sec"),
        F.count(F.lit(1)).alias("n_events"),
    )


STREAM_SESSION_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, "
    "duration_sec DOUBLE, n_events BIGINT"
)
_STATE_SCHEMA = "start DOUBLE, last DOUBLE, n BIGINT"


def sessionize_stream(
    events_stream: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
):
    """Streaming sessionizer via ``applyInPandasWithState``.

    Emits one row per CLOSED session (closed by a later event beyond the
    gap, or by state timeout once the watermark passes). State per user is
    the open session's (start, last, count) — constant size per key.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_sec = gap_minutes * 60.0

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        sessions = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                sessions.append((user, start, last, last - start, n))
                state.remove()
        else:
            ts = []
            for pdf in pdfs:
                ts.extend(float(t.timestamp()) for t in pd.to_datetime(pdf[ts_col]))
            ts.sort()
            if ts:
                if state.exists:
                    start, last, n = state.get
                else:
                    start, last, n = ts[0], ts[0], 0
                for t in ts:
                    if t - last > gap_sec:
                        sessions.append((user, start, last, last - start, n))
                        start, n = t, 0
                    last = max(last, t)
                    n += 1
                state.update((start, last, n))
                # a straggler key's (last + gap) can already be behind the
                # watermark — Spark rejects past timeouts, so clamp forward
                timeout_ms = int((last + gap_sec) * 1000)
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(timeout_ms, wm + 1))
        if sessions:
            import numpy as np

            def to_us(vals):  # exact microseconds → safe ns→us Arrow cast
                return pd.to_datetime(
                    np.round(np.asarray(vals) * 1e6).astype("int64"), unit="us", utc=True
                )

            yield pd.DataFrame(
                {
                    "user_id": [s[0] for s in sessions],
                    "session_start": to_us([s[1] for s in sessions]),
                    "session_end": to_us([s[2] for s in sessions]),
                    "duration_sec": [s[3] for s in sessions],
                    "n_events": [s[4] for s in sessions],
                }
            )

    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=STREAM_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: float | None = None,
    within_micros: int | None = None,
) -> DataFrame:
    """Ordered-funnel matching (MATCH_RECOGNIZE-lite, round 11): for
    each user, the earliest completion of the ordered pattern
    ``steps[0] < steps[1] < ...`` (strictly increasing timestamps —
    the classic greedy funnel, which is optimal: matching each step to
    its EARLIEST admissible event never excludes a later completion).
    Returns one row per user who reached step 1:
    ``(user, step_1_ts, ..., step_k_ts, depth)`` with NULL timestamps
    past the reached depth.  ``within_seconds`` additionally requires
    every matched step to land within that horizon of the user's FIRST
    step-1 event (first-touch anchoring, the standard analytics-tool
    semantic; a step outside the horizon truncates the funnel there).
    ``within_micros`` is the same horizon in EXACT integer microseconds
    (``unix_micros`` compare — rule 3b: use it when the output feeds a
    cross-engine oracle; the seconds form goes through a double cast).
    Sliding-anchor matching — "any step-1 event may start the window" —
    is a different, quadratic problem this operator does not claim.

    Scale shape: step i is one filtered aggregation
    ``min(ts) WHERE type = step_i AND ts > prev_step_ts`` — k
    hash-aggregations and k-1 joins ALL keyed on the user column, so
    Catalyst reuses one hash-partitioning across every stage (a single
    logical shuffle of the filtered event stream per step, no
    re-exchange between steps — plan-locked) and per-user state is one
    timestamp, never a collected event array.  At 100 TB the funnel
    costs k filtered scans; nothing buffers a user's history.
    """
    if not steps:
        raise ValueError("funnel_steps needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    u, ts, et = F.col(user_col), F.col(ts_col), F.col(type_col)

    cur = (
        events.filter(et == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("step_1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(et == step)
            .select(user_col, ts.alias("__ts"))
            .join(cur.select(user_col, f"step_{i-1}_ts"), user_col)
            .filter(F.col("__ts") > F.col(f"step_{i-1}_ts"))
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"step_{i}_ts"))
        )
        cur = cur.join(nxt, user_col, "left")
    if within_seconds is not None and within_micros is not None:
        raise ValueError("pass within_seconds OR within_micros, not both")
    if within_seconds is not None or within_micros is not None:
        # matched step timestamps are strictly increasing, so nulling
        # every step past the horizon automatically truncates the
        # funnel at the first violation — no cascade needed
        if within_micros is not None:
            horizon = F.unix_micros(F.col("step_1_ts")) + F.lit(
                int(within_micros)
            )
            for i in range(2, len(steps) + 1):
                c = F.col(f"step_{i}_ts")
                cur = cur.withColumn(
                    f"step_{i}_ts",
                    F.when(F.unix_micros(c) <= horizon, c),
                )
        else:
            horizon = F.col("step_1_ts").cast("double") + F.lit(
                float(within_seconds)
            )
            for i in range(2, len(steps) + 1):
                c = F.col(f"step_{i}_ts")
                cur = cur.withColumn(
                    f"step_{i}_ts",
                    F.when(c.cast("double") <= horizon, c),
                )
    depth = F.lit(1)
    for i in range(2, len(steps) + 1):
        depth = depth + F.when(F.col(f"step_{i}_ts").isNotNull(), 1).otherwise(0)
    return cur.select(
        user_col,
        *[f"step_{i}_ts" for i in range(1, len(steps) + 1)],
        depth.cast("int").alias("depth"),
    )


FUNNEL_STATE_FMT = "stage INT, {}"


def funnel_stream(
    events_stream: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    watermark: str = "1 hour",
):
    """STREAMING ordered-funnel matching — ``funnel_steps`` as a per-user
    state machine over ``applyInPandasWithState`` (the zscore_stream /
    sessionize_stream seam): state is the current stage plus one int64
    microsecond timestamp per matched step (CONSTANT size — never an
    event buffer), advanced greedily in (ts, type) order; a user EMITS
    EXACTLY ONCE, on completing the final step, with every step
    timestamp.  Emission is append-mode and purely data-driven, so the
    stream output equals the batch ``funnel_steps`` rows at full depth
    — the s25 oracle compares value-for-value.

    Ordering contract: greedy matching needs each user's events in
    event-time order ACROSS micro-batches (within a batch the operator
    sorts).  Feed time-partitioned sources (the s25 pattern); handling
    watermark-bounded disorder would need buffering this operator
    deliberately does not do (documented, not silent).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if not steps:
        raise ValueError("funnel_stream needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    k = len(steps)
    out_schema = f"{user_col} BIGINT, " + ", ".join(
        f"step_{i}_ts TIMESTAMP" for i in range(1, k + 1)
    )
    state_schema = FUNNEL_STATE_FMT.format(
        ", ".join(f"t{i} BIGINT" for i in range(1, k + 1))
    )
    step_of = {s: i for i, s in enumerate(steps)}  # 0-based next-stage

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        rows = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col])
            for t, et in zip(ts, pdf[type_col]):
                if et in step_of:
                    rows.append((t, et))
        if not rows:
            return
        rows.sort(key=lambda r: r[0])
        if state.exists:
            st = list(state.get)
        else:
            st = [0] + [None] * k
        stage = st[0]
        for t, et in rows:
            if stage >= k:
                break  # already completed; emit-once
            if step_of[et] != stage:
                continue
            t_us = t.value // 1000
            if stage > 0 and t_us <= st[stage]:
                continue  # strictly increasing timestamps
            st[stage + 1] = t_us
            stage += 1
            if stage == k:
                yield pd.DataFrame(
                    {
                        user_col: [user],
                        **{
                            f"step_{i}_ts": [
                                pd.Timestamp(st[i] * 1000)
                            ]
                            for i in range(1, k + 1)
                        },
                    }
                )
                break
        st[0] = stage
        state.update(tuple(st))

    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
