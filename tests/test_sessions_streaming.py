"""Stateful streaming sessionization (applyInPandasWithState): every
session the stream emits must be exactly a session the batch rewrite
produces on the same closed input."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.operators.sessions import (
    session_stats,
    sessionize_stream,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_src"))
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # naive micros read as NTZ; session pins UTC, so the cast keeps
        # the wall clock and watermarks get the TIMESTAMP they require
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    df.select("event_id", "user_id", "ts").repartition(4, "user_id").write.mode(
        "overwrite"
    ).parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_stream_sessions_subset_of_batch(spark, events_dir, tmp_path):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = sessionize_stream(stream, gap_minutes=360.0, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = spark.sql("select * from stream_sessions").collect()
    assert len(streamed) > 50  # sessions actually closed and were emitted

    batch = session_stats(
        spark.read.parquet(events_dir), gap_minutes=360.0
    ).collect()
    batch_keys = {
        (r["user_id"], round(r["session_start"].timestamp(), 3),
         round(r["session_end"].timestamp(), 3), r["n_events"])
        for r in batch
    }
    for r in streamed:
        key = (
            r["user_id"],
            round(r["session_start"].timestamp(), 3),
            round(r["session_end"].timestamp(), 3),
            r["n_events"],
        )
        assert key in batch_keys, key


# ---- ordered-funnel matching (r60, round 11) ---------------------------


def _ts(s):
    from datetime import datetime, timezone

    return datetime(2024, 1, 1, tzinfo=timezone.utc).replace(
        tzinfo=None
    ) + __import__("datetime").timedelta(seconds=s)


def test_funnel_basic_and_edges(spark):
    """Hand-built sequences: full completion, partial depth, strict
    ordering (equal timestamps do NOT advance), events before step 1
    ignored, and users with no step-1 event absent entirely."""
    from modis_aggregation_spark.operators.sessions import funnel_steps

    rows = [
        # user 1: clean A(10) B(20) C(30), plus a decoy B(5) before A
        (1, _ts(5), "B"), (1, _ts(10), "A"), (1, _ts(20), "B"), (1, _ts(30), "C"),
        # user 2: A then C only -> depth 1 (B missing truncates)
        (2, _ts(10), "A"), (2, _ts(40), "C"),
        # user 3: A and B SAME timestamp -> strict > fails, depth 1
        (3, _ts(10), "A"), (3, _ts(10), "B"),
        # user 4: no A at all -> absent from output
        (4, _ts(1), "B"), (4, _ts(2), "C"),
        # user 5: earliest-admissible: A(10), B(50), but also B(15);
        # greedy must take B(15) so C(20) completes
        (5, _ts(10), "A"), (5, _ts(50), "B"), (5, _ts(15), "B"), (5, _ts(20), "C"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        r["user_id"]: r
        for r in funnel_steps(df, ["A", "B", "C"]).collect()
    }
    assert set(out) == {1, 2, 3, 5}
    assert out[1]["depth"] == 3 and out[1]["step_3_ts"] == _ts(30)
    assert out[2]["depth"] == 1 and out[2]["step_2_ts"] is None
    assert out[3]["depth"] == 1
    assert out[5]["depth"] == 3 and out[5]["step_2_ts"] == _ts(15)
    # step_1 is the FIRST step-1 event even with earlier other types
    assert out[1]["step_1_ts"] == _ts(10)


def test_funnel_within_horizon_truncates_ordered(spark):
    """First-touch horizon: steps outside step_1 + within_seconds are
    nulled; since matched timestamps strictly increase, nulling past
    the horizon truncates the funnel at the first violation."""
    from modis_aggregation_spark.operators.sessions import funnel_steps

    rows = [
        # B at +100 is outside the 50 s horizon -> depth stops at 1
        (1, _ts(0), "A"), (1, _ts(100), "B"), (1, _ts(110), "C"),
        # fully inside
        (2, _ts(0), "A"), (2, _ts(10), "B"), (2, _ts(20), "C"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        r["user_id"]: r
        for r in funnel_steps(
            df, ["A", "B", "C"], within_seconds=50
        ).collect()
    }
    assert out[1]["depth"] == 1
    assert out[1]["step_2_ts"] is None and out[1]["step_3_ts"] is None
    assert out[2]["depth"] == 3


def test_funnel_validation(spark):
    from modis_aggregation_spark.operators.sessions import funnel_steps

    df = spark.createDataFrame([(1, _ts(0), "A")], ["user_id", "ts", "event_type"])
    import pytest

    with pytest.raises(ValueError, match="at least one"):
        funnel_steps(df, [])
    with pytest.raises(ValueError, match="distinct"):
        funnel_steps(df, ["A", "A"])
