"""Streaming CDC upsert into the versioned parquet table
(streaming/upsert.py): multi-micro-batch merge carry, version history /
time travel, batch-id idempotence, delete markers."""

import os

import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.streaming.upsert import (
    read_table,
    stream_upsert,
    table_versions,
)


def _run(spark, src, tbl, ckpt, **opts):
    schema = spark.read.parquet(src).schema
    reader = spark.readStream.schema(schema)
    for k, v in opts.pop("reader_options", {}).items():
        reader = reader.option(k, v)
    q = stream_upsert(
        reader.parquet(src),
        tbl,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        checkpoint_dir=ckpt,
        **opts,
    )
    assert q.awaitTermination(180)


@pytest.fixture(scope="module")
def events(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "event_id", "ts", "value")
    )
    if dict(df.dtypes).get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _expected_latest(df):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return {
        r["user_id"]: (r["event_id"], r["value"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .collect()
    }


def test_multibatch_carry_and_time_travel(spark, events, tmp_path):
    """Event-time-split files + maxFilesPerTrigger=1: each micro-batch
    MERGEs onto the previous snapshot; the final version equals the
    batch latest-per-key answer and every intermediate version stays
    readable (time travel shows strictly growing coverage)."""
    cut = events.agg(F.expr("percentile(cast(ts as double), 0.5)")).first()[0]
    src = str(tmp_path / "src")
    events.filter(F.col("ts").cast("double") <= cut).coalesce(1).write.parquet(src)
    events.filter(F.col("ts").cast("double") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    tbl = str(tmp_path / "tbl")
    _run(
        spark, src, tbl, str(tmp_path / "ck"),
        reader_options={"maxFilesPerTrigger": 1},
    )
    versions = table_versions(tbl)
    assert len(versions) >= 2  # one version per micro-batch
    got = {
        r["user_id"]: (r["event_id"], r["value"])
        for r in read_table(spark, tbl).collect()
    }
    assert got == _expected_latest(events)
    # time travel: the first version holds only first-half keys' states
    v0 = read_table(spark, tbl, version=versions[0])
    assert v0.count() <= read_table(spark, tbl).count()
    first_half = events.filter(F.col("ts").cast("double") <= cut)
    assert {
        r["user_id"]: (r["event_id"], r["value"]) for r in v0.collect()
    } == _expected_latest(first_half)


def test_retry_idempotence(spark, events, tmp_path):
    """Re-running the same checkpointed stream over unchanged input
    commits nothing new; replaying a batch id by hand is skipped."""
    src = str(tmp_path / "src")
    events.coalesce(1).write.parquet(src)
    tbl = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    _run(spark, src, tbl, ck)
    v1 = table_versions(tbl)
    _run(spark, src, tbl, ck)  # same checkpoint: no data to process
    assert table_versions(tbl) == v1
    # simulate a foreachBatch retry with an already-committed batch_id
    ptr = open(os.path.join(tbl, "_LATEST")).read()
    from modis_aggregation_spark.streaming import upsert as U

    before = table_versions(tbl)
    # batch_id 0 was committed during the run → replay must no-op
    latest_version, last_batch = U._latest_pointer(tbl)
    assert last_batch is not None
    # a second stream_upsert with a FRESH checkpoint re-emits batch 0;
    # the pointer's recorded batch id makes it a no-op
    _run(spark, src, tbl, str(tmp_path / "ck2"))
    assert table_versions(tbl) == before
    assert open(os.path.join(tbl, "_LATEST")).read() == ptr


def test_delete_markers(spark, tmp_path):
    rows = [
        (1, 10, "2024-01-01 00:00:00", 1.0, False),
        (2, 11, "2024-01-01 00:00:01", 2.0, False),
        (1, 12, "2024-01-01 00:00:02", 3.0, True),   # delete user 1
        (3, 13, "2024-01-01 00:00:03", 4.0, True),   # delete-before-insert
    ]
    df = spark.createDataFrame(
        rows,
        "user_id LONG, event_id LONG, ts STRING, value DOUBLE, deleted BOOLEAN",
    ).withColumn("ts", F.to_timestamp("ts"))
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    tbl = str(tmp_path / "tbl")
    schema = spark.read.parquet(src).schema
    q = stream_upsert(
        spark.readStream.schema(schema).parquet(src),
        tbl,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        checkpoint_dir=str(tmp_path / "ck"),
        delete_col="deleted",
    )
    assert q.awaitTermination(180)
    got = read_table(spark, tbl).collect()
    assert [(r["user_id"], r["value"]) for r in got] == [(2, 2.0)]
    with pytest.raises(ValueError, match="no version 99"):
        read_table(spark, tbl, version=99)
