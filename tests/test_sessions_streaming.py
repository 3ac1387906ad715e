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
