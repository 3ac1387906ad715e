"""Lake-style MERGE (upsert) and SCD2 history rewrite as pure DataFrame ops.

The reference has no table-maintenance surface (its outputs are
write-once HDF5 grids, ``MODIS_Aggregation/aggregate_functions.py:413``);
an analytics engine feeding a training pipeline needs one: reference
tables (dedup fingerprints, quality scores, split assignments) are
updated incrementally. Without Delta/Iceberg in the environment, MERGE
semantics are expressed as a join + coalesce over the snapshot — the same
logical plan those formats execute, minus the transaction log.

Scale shape: one shuffle join on the merge key. At lake scale you bound
the rewrite, not the join — partition the snapshot on a stable key range,
semi-join source→target partitions first, and rewrite only affected
partitions via dynamic partition overwrite (demonstrated in
``streaming/daily_stream.py::write_daily_grids``). The source side is
usually ≪ target: broadcast it below the auto-broadcast threshold.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE INTO target USING source: matched rows take ALL source
    values (whole-row upsert), unmatched source rows insert, unmatched
    target rows are kept. If ``delete_col`` names a boolean source
    column, matched rows with it true are deleted instead (the column is
    not emitted).

    Schemas must agree on the non-key columns being merged; the output
    column order is the target's. Target keys must be unique (the MERGE
    precondition every lake format enforces): a matched target row is
    replaced by its source row, so duplicate target keys would collapse
    to one surviving row per matching source row.

    Shape (round 12): anti-join + union instead of the previous
    full-outer join — because matched rows take ALL source values, the
    output is exactly (target rows whose key has no source row) ∪
    (non-deleted source rows). The anti side carries only the source
    KEYS, so when source ≪ target (the normal MERGE regime) the plan is
    a broadcast anti hash join with ZERO shuffles, where the full-outer
    form shuffled and sorted both whole snapshots even for a 1-row
    source. Row-for-row identical to the join+coalesce form for unique
    target keys (incl. NULL source values — the union branch carries
    the source row wholesale, which is what the whole-row-upsert CASE
    produced).
    """
    keys = list(key_cols)
    data_cols = [c for c in target.columns if c not in keys]
    s = source
    if delete_col is None:
        s = s.withColumn("__del", F.lit(False))
    else:
        s = s.withColumn("__del", F.coalesce(F.col(delete_col), F.lit(False)))
    # keys of EVERY source row (deletes included) knock out the matched
    # target rows; non-deleted source rows are the replacement/insert set
    kept = target.join(s.select(*keys), on=keys, how="left_anti")
    upserts = s.where(~F.col("__del")).select(*keys, *data_cols)
    return kept.select(*target.columns).unionByName(
        upserts.select(*target.columns)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Change-data-capture between two snapshots of the same table: emit
    one row per changed key with ``op`` ∈ {'I','U','D'} (insert / update /
    delete, from old→new) plus the new-side values for inserts/updates and
    the old-side values for deletes.

    ``compare_cols`` defaults to all non-key columns shared by both
    sides; an update is any key present in both snapshots whose compared
    columns differ (NULL-safe, via ``<=>`` equality per column).

    Scale shape: one full-outer shuffle join co-partitioned on the key —
    the same single-shuffle bound as :func:`merge_upsert`; unchanged keys
    are dropped before any downstream work. This is the batch equivalent
    of a Delta/Iceberg change feed when no transaction log exists.
    """
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c not in keys and c in new.columns
        ]
    cmp_cols = list(compare_cols)
    o = old.select(
        *keys,
        *[F.col(c).alias(f"__o_{c}") for c in cmp_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"__n_{c}") for c in cmp_cols],
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, on=keys, how="full_outer")
    same = F.lit(True)
    for c in cmp_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(~same, F.lit("U"))
    )
    return (
        joined.withColumn("op", op)
        .where(F.col("op").isNotNull())
        .select(
            *keys,
            "op",
            *[
                # deletes carry the old values; inserts/updates the new
                F.when(F.col("op") == "D", F.col(f"__o_{c}"))
                .otherwise(F.col(f"__n_{c}"))
                .alias(c)
                for c in cmp_cols
            ],
        )
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "effective_ts",
    current_col: str = "is_current",
    end_col: str = "end_ts",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the current version of
    each updated key (set ``end_ts`` to the update's timestamp, clear
    ``is_current``) and append the update as the new open version.

    ``history`` carries (keys…, attrs…, effective_ts, end_ts,
    is_current); ``updates`` carries (keys…, attrs…, effective_ts).
    Untouched keys pass through unchanged. One shuffle join on the key —
    same bound as :func:`merge_upsert`.
    """
    keys = list(key_cols)
    upd_keys = updates.select(
        *keys, F.col(ts_col).alias("__new_ts")
    ).dropDuplicates(keys)
    closed = (
        history.join(upd_keys, on=keys, how="left")
        .withColumn(
            end_col,
            F.when(
                F.col(current_col) & F.col("__new_ts").isNotNull(),
                F.col("__new_ts"),
            ).otherwise(F.col(end_col)),
        )
        .withColumn(
            current_col,
            F.col(current_col) & F.col("__new_ts").isNull(),
        )
        .drop("__new_ts")
    )
    opened = updates.withColumn(
        end_col, F.lit(None).cast(dict(history.dtypes)[end_col])
    ).withColumn(current_col, F.lit(True))
    return closed.unionByName(opened.select(*history.columns))


def compact_parquet(
    spark,
    src_path: str,
    dest_path: str,
    target_file_mb: int = 128,
) -> dict:
    """Small-files compaction: rewrite a parquet directory into files of
    ~``target_file_mb`` — the other half of lake maintenance next to
    MERGE (streaming sinks and incremental upserts accrete KB-size files
    whose per-file open/footer cost eventually dominates scans).

    Sizing is from the SOURCE's actual on-disk bytes (not row counts, so
    compression ratio is respected). Writes to ``dest_path`` — never in
    place (a failed in-place rewrite loses data; callers swap paths or
    re-point the catalog after success, which is exactly what
    Delta/Iceberg's rewrite-data-files action does atomically).

    Returns {files_before, files_after, bytes, rows}.
    """
    import math
    import os

    for p in (src_path, dest_path):
        scheme = p.split("://", 1)[0] if "://" in p else ""
        if scheme not in ("", "file"):
            raise ValueError(
                f"compact_parquet sizes files via the local filesystem; "
                f"got non-local URI {p!r}. For object stores (s3/hdfs/abfs) "
                f"use the table format's rewrite-data-files action or size "
                f"via the Hadoop FileSystem API."
            )
    src_path = src_path.removeprefix("file://")
    dest_path = dest_path.removeprefix("file://")

    before = [
        os.path.join(r, f)
        for r, _, fs in os.walk(src_path)
        for f in fs
        if f.endswith(".parquet")
    ]
    total_bytes = sum(os.path.getsize(f) for f in before)
    n_out = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    rows = df.count()
    df.repartition(n_out).write.mode("errorifexists").parquet(dest_path)
    after = [
        os.path.join(r, f)
        for r, _, fs in os.walk(dest_path)
        for f in fs
        if f.endswith(".parquet")
    ]
    return {
        "files_before": len(before),
        "files_after": len(after),
        "bytes": total_bytes,
        "rows": rows,
    }
