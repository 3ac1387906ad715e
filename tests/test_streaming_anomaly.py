"""Streaming running z-score anomaly detection (streaming/anomaly.py):
the stream output must equal the batch window rewrite value-for-value —
including across micro-batch boundaries when files arrive in event-time
order — and the z math must follow the documented integer-staged IEEE
sequence."""

import math
import shutil

import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.streaming.anomaly import (
    zscore_batch,
    zscore_stream,
)


def _run_stream(spark, src_dir, ckpt, name, **options):
    schema = spark.read.parquet(src_dir).schema
    reader = spark.readStream.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    stream = reader.parquet(src_dir)
    out = zscore_stream(stream, min_history=3, threshold=2.0)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    return {
        r["event_id"]: r for r in spark.sql(f"select * from {name}").collect()
    }


@pytest.fixture(scope="module")
def events(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "user_id", "ts", "value")
    )
    if dict(df.dtypes).get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def test_stream_equals_batch_single_batch(spark, events, tmp_path):
    src = str(tmp_path / "src")
    events.repartition(4, "user_id").write.parquet(src)
    got = _run_stream(spark, src, str(tmp_path / "ck"), "anom_single")
    want = {
        r["event_id"]: r
        for r in zscore_batch(
            spark.read.parquet(src), min_history=3, threshold=2.0
        ).collect()
    }
    assert set(got) == set(want) and len(got) == 1000
    n_anom = 0
    for eid, g in got.items():
        w = want[eid]
        assert (g["n_prior"], g["value_cents"]) == (w["n_prior"], w["value_cents"])
        assert g["z"] == w["z"], eid  # bit-exact, not approx
        assert g["is_anomaly"] == w["is_anomaly"]
        n_anom += g["is_anomaly"]
    assert n_anom > 0  # the threshold actually fires somewhere


def test_state_carries_across_microbatches(spark, events, tmp_path):
    """Files split by event-time halves + maxFilesPerTrigger=1: the
    second batch's scores must reflect state accumulated in the first —
    equality with the batch rewrite proves the carry."""
    cut = events.agg(F.expr("percentile(cast(ts as double), 0.5)")).first()[0]
    src = str(tmp_path / "parts")
    a = events.filter(F.col("ts").cast("double") <= cut)
    b = events.filter(F.col("ts").cast("double") > cut)
    a.coalesce(1).write.parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)
    got = _run_stream(
        spark, src, str(tmp_path / "ck2"), "anom_multi",
        maxFilesPerTrigger=1,
    )
    want = {
        r["event_id"]: r
        for r in zscore_batch(events, min_history=3, threshold=2.0).collect()
    }
    assert len(got) == len(want)
    late = [eid for eid, g in got.items() if g["n_prior"] > 0]
    assert late  # scores with history exist
    for eid, g in got.items():
        assert g["z"] == want[eid]["z"], eid


def test_z_math_and_min_history(spark):
    """Hand-computed: key with values 1,2,3 (cents 100,200,300) then a
    probe of 10.00 — n_prior=3, mean=200, var=(140000-120000)/3,
    z=(1000-200)/sqrt(...); earlier events carry NULL z."""
    rows = [
        (i, 7, f"2024-01-01 00:0{i}:00", v)
        for i, v in [(0, 1.0), (1, 2.0), (2, 3.0), (3, 10.0)]
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ts STRING, value DOUBLE"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_id"]: r for r in zscore_batch(df, min_history=3).collect()}
    assert out[0]["z"] is None and out[1]["z"] is None and out[2]["z"] is None
    s, q, n = 600.0, 140000.0, 3
    var = (q - s * s / n) / n
    assert out[3]["z"] == pytest.approx((1000.0 - 200.0) / math.sqrt(var))
    assert out[3]["is_anomaly"]  # z ≈ 9.8 > 3
    # zero-variance history yields NULL z even past min_history
    flat = spark.createDataFrame(
        [(i, 8, f"2024-01-01 00:0{i}:00", 5.0) for i in range(5)],
        "event_id LONG, user_id LONG, ts STRING, value DOUBLE",
    ).withColumn("ts", F.to_timestamp("ts"))
    fo = {r["event_id"]: r for r in zscore_batch(flat, min_history=3).collect()}
    assert fo[4]["z"] is None and not fo[4]["is_anomaly"]
