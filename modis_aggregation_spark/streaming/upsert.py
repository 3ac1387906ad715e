"""Streaming CDC upsert sink: foreachBatch + MERGE into a versioned
parquet table.

The missing sink half of the streaming surface (s1-s13 aggregate, join,
dedup, sessionize, screen and score — into memory/parquet appends): a
change stream maintaining a keyed TABLE needs per-batch MERGE semantics,
which Spark's file sinks don't provide. The standard production answer
is ``foreachBatch`` (micro-batch exactly-once: Spark retries a failed
batch with the same batch_id) wrapping a table format's MERGE — here
the engine's own ``operators/merge.merge_upsert`` writing a VERSIONED
parquet table:

    <dir>/v<N>/...parquet     immutable snapshots
    <dir>/_LATEST             pointer file (atomic os.replace swap)

Each micro-batch reduces to its newest row per key (event-time +
tie-break order, so intra-batch order is deterministic), MERGEs into
the current snapshot, writes the next version, then swaps the pointer —
readers always see a complete snapshot, writers never mutate one, and
old versions remain readable (time travel / reproducible training-set
pinning). Batch-id idempotence: a retried batch_id finds the pointer
already advanced past it and skips (the exactly-once contract).

Cross-batch determinism contract: the final table equals the batch
``latest row per key`` answer whenever each key's rows arrive in
event-time order across batches (within a batch, order is handled);
the s14 oracle runs the single-batch case and
tests/test_stream_upsert.py proves the multi-batch carry with
time-split files, mirroring the s13 methodology.

At scale: MERGE is one full-outer join per micro-batch on the key —
shuffle bounded by |table| + |batch|; with the table bucketed by key
the exchange drops to the batch side only. Version dirs are immutable,
so object-store writes are safe without rename semantics (write, then
swap one small pointer object).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modis_aggregation_spark.operators.merge import merge_upsert


def _latest_pointer(table_dir: str) -> tuple[int, str | None]:
    ptr = os.path.join(table_dir, "_LATEST")
    if not os.path.exists(ptr):
        return -1, None
    with open(ptr) as fh:
        content = fh.read().strip()
    n, _, batch = content.partition(":")
    return int(n), (batch or None)


def read_table(spark, table_dir: str, version: int | None = None) -> DataFrame:
    """Read a snapshot of the versioned table (latest by default —
    time travel by passing an explicit version number)."""
    if version is None:
        version, _ = _latest_pointer(table_dir)
    if version < 0:
        raise ValueError(f"{table_dir} has no committed version")
    path = os.path.join(table_dir, f"v{version}")
    if not os.path.isdir(path):
        raise ValueError(f"{table_dir} has no version {version}")
    return spark.read.parquet(path)


def table_versions(table_dir: str) -> list[int]:
    """All committed (readable) versions, ascending."""
    latest, _ = _latest_pointer(table_dir)
    return [
        int(d[1:])
        for d in sorted(os.listdir(table_dir))
        if d.startswith("v") and d[1:].isdigit() and int(d[1:]) <= latest
    ]


def _batch_latest(
    batch: DataFrame, key_cols: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def stream_upsert(
    stream: DataFrame,
    table_dir: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    checkpoint_dir: str,
    delete_col: str | None = None,
    trigger_available_now: bool = True,
):
    """Run the stream into the versioned table; returns the started
    StreamingQuery. Each micro-batch: newest-row-per-key reduction →
    MERGE with the current snapshot → write v(N+1) → atomic pointer
    swap recording the batch id (idempotent on retry)."""
    spark = stream.sparkSession
    keys, order = list(key_cols), list(order_cols)

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        os.makedirs(table_dir, exist_ok=True)
        current, last_batch = _latest_pointer(table_dir)
        if last_batch is not None and int(last_batch) >= batch_id:
            return  # retried batch already committed — exactly-once
        latest = _batch_latest(batch, keys, order)
        if current < 0:
            merged = latest
            if delete_col is not None:
                # no target yet: a delete-marked row simply never lands
                merged = merged.where(
                    ~F.coalesce(F.col(delete_col), F.lit(False))
                ).drop(delete_col)
        else:
            target = read_table(spark, table_dir, current)
            # merge_upsert's unique-target-keys precondition (ADVICE
            # r12) holds by construction here: v0 is a _batch_latest
            # output (one row per key) and every later version is a
            # merge_upsert result — (anti-joined keeps) ∪ (one source
            # row per key) can never duplicate a key across versions
            merged = merge_upsert(target, latest, keys, delete_col=delete_col)
        nxt = current + 1
        out = os.path.join(table_dir, f"v{nxt}")
        merged.write.mode("overwrite").parquet(out)
        tmp = os.path.join(table_dir, f"_LATEST.{os.getpid()}.tmp")
        with open(tmp, "w") as fh:
            fh.write(f"{nxt}:{batch_id}")
        os.replace(tmp, os.path.join(table_dir, "_LATEST"))

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
