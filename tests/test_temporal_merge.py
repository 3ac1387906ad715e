"""Temporal joins (as-of, banded range), MERGE/SCD2, chunking, stratified
sampling."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.operators import curation as C
from modis_aggregation_spark.operators.merge import merge_upsert, scd2_apply
from modis_aggregation_spark.operators.temporal import asof_join, range_join_binned


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows, cols=("user_id", "ts", "v")):
    return spark.createDataFrame(rows, list(cols))


# ---------------------------------------------------------------- as-of join

LEFT = [
    (1, _ts("2024-01-01 10:00:00"), 100.0),
    (1, _ts("2024-01-01 12:00:00"), 101.0),
    (2, _ts("2024-01-01 09:00:00"), 200.0),
]
RIGHT = [
    (1, _ts("2024-01-01 09:30:00"), 1.0),
    (1, _ts("2024-01-01 10:00:00"), 2.0),  # equal ts -> must match (>=)
    (1, _ts("2024-01-01 11:00:00"), 3.0),
    (2, _ts("2024-01-01 23:00:00"), 4.0),  # only AFTER user 2's left row
]


def test_asof_backward(spark):
    out = asof_join(
        _events(spark, LEFT), _events(spark, RIGHT, ("user_id", "ts", "r")),
        on="user_id", ts_col="ts", right_cols=("r",),
    )
    got = {(r["user_id"], r["v"]): r["r_r"] for r in out.collect()}
    assert got[(1, 100.0)] == 2.0   # equal-ts right row wins over 09:30
    assert got[(1, 101.0)] == 3.0   # latest prior
    assert got[(2, 200.0)] is None  # nothing prior -> NULL, row kept


def test_asof_forward_and_tolerance(spark):
    out = asof_join(
        _events(spark, LEFT), _events(spark, RIGHT, ("user_id", "ts", "r")),
        on="user_id", ts_col="ts", right_cols=("r",), direction="forward",
    )
    got = {(r["user_id"], r["v"]): r["r_r"] for r in out.collect()}
    assert got[(1, 100.0)] == 2.0   # equal ts matches forward too
    assert got[(1, 101.0)] is None  # nothing at/after 12:00 for user 1
    assert got[(2, 200.0)] == 4.0
    tol = asof_join(
        _events(spark, LEFT), _events(spark, RIGHT, ("user_id", "ts", "r")),
        on="user_id", ts_col="ts", right_cols=("r",), direction="forward",
        tolerance_sec=3600.0,
    )
    got = {(r["user_id"], r["v"]): r["r_r"] for r in tol.collect()}
    assert got[(2, 200.0)] is None  # 14h gap > 1h tolerance -> nulled


def test_asof_single_shuffle_plan(spark):
    out = asof_join(
        _events(spark, LEFT), _events(spark, RIGHT, ("user_id", "ts", "r")),
        on="user_id", ts_col="ts", right_cols=("r",),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # the rewrite must not plan an actual join


# ----------------------------------------------------------- range join

def test_range_join_binned_matches_naive(spark):
    left = _events(spark, LEFT)
    right = _events(spark, RIGHT, ("user_id", "ts", "r"))
    for lo, hi, bins in [(0.0, 7200.0, None), (-1800.0, 1800.0, None),
                         (0.0, 7200.0, 600.0)]:
        got = {
            (r["user_id"], r["v_l"], r["r_r"])
            for r in range_join_binned(
                left, right, on="user_id", ts_col="ts",
                lower_sec=lo, upper_sec=hi, bin_sec=bins,
            ).collect()
        }
        naive = {
            (l[0], l[2], rr[2])
            for l in LEFT for rr in RIGHT
            if l[0] == rr[0] and lo <= (rr[1] - l[1]).total_seconds() <= hi
        }
        assert got == naive, (lo, hi, bins)


def test_range_join_no_nested_loop(spark):
    out = range_join_binned(
        _events(spark, LEFT), _events(spark, RIGHT, ("user_id", "ts", "r")),
        on="user_id", ts_col="ts", lower_sec=0.0, upper_sec=3600.0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ----------------------------------------------------------------- merge

def test_merge_upsert_update_insert_keep_delete(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "x"]
    )
    source = spark.createDataFrame(
        [(2, "B", None, False), (4, "d", 40.0, False), (3, None, 99.0, True)],
        "k long, s string, x double, dead boolean",
    )
    out = {r["k"]: (r["s"], r["x"]) for r in
           merge_upsert(target, source, ["k"], delete_col="dead").collect()}
    assert out == {
        1: ("a", 10.0),    # untouched
        2: ("B", None),    # whole-row upsert takes the NULL source value
        4: ("d", 40.0),    # insert
    }                      # 3 deleted


def test_scd2_apply(spark):
    hist = spark.createDataFrame(
        [(1, 10.0, _ts("2024-01-01 00:00:00"), None, True),
         (1, 5.0, _ts("2023-01-01 00:00:00"), _ts("2024-01-01 00:00:00"), False),
         (2, 20.0, _ts("2024-01-01 00:00:00"), None, True)],
        "k long, x double, effective_ts timestamp, end_ts timestamp, is_current boolean",
    )
    upd = spark.createDataFrame(
        [(1, 11.0, _ts("2024-06-01 00:00:00"))],
        "k long, x double, effective_ts timestamp",
    )
    rows = scd2_apply(hist, upd, ["k"]).collect()
    assert len(rows) == 4
    cur = {r["k"]: r["x"] for r in rows if r["is_current"]}
    assert cur == {1: 11.0, 2: 20.0}
    closed = [r for r in rows if r["k"] == 1 and r["x"] == 10.0]
    assert closed[0]["end_ts"] == _ts("2024-06-01 00:00:00")
    assert not closed[0]["is_current"]
    # already-closed history rows are untouched
    old = [r for r in rows if r["k"] == 1 and r["x"] == 5.0]
    assert old[0]["end_ts"] == _ts("2024-01-01 00:00:00")


def test_snapshot_diff_insert_update_delete_nullsafe(spark):
    from modis_aggregation_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (5, "e", 50.0)],
        "k long, s string, x double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),      # unchanged -> dropped
         (2, "b", None),      # NULL == NULL -> unchanged
         (3, "c", None),      # value -> NULL is an update
         (4, "d", 40.0)],     # insert; 5 deleted
        "k long, s string, x double",
    )
    got = {r["k"]: (r["op"], r["s"], r["x"]) for r in
           snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        3: ("U", "c", None),
        4: ("I", "d", 40.0),
        5: ("D", "e", 50.0),  # deletes carry the old values
    }


# ----------------------------------------------------- chunking / sampling

def test_chunk_documents_cover_and_overlap(spark):
    text = "abcdefghij" * 10  # 100 chars
    df = spark.createDataFrame([(1, text), (2, ""), (3, "xy")], ["doc_id", "text"])
    out = C.chunk_documents(df, size=40, overlap=10)
    rows = sorted(
        ((r["id"], r["chunk_id"], r["chunk_text"]) for r in out.collect())
    )
    by_doc = {}
    for i, c, t in rows:
        by_doc.setdefault(i, []).append((c, t))
    # doc 1: starts 0,30,60,90 -> 4 chunks; consecutive chunks overlap by 10
    assert [c for c, _ in by_doc[1]] == [0, 1, 2, 3]
    assert all(
        by_doc[1][i][1][-10:] == by_doc[1][i + 1][1][:10]
        for i in range(len(by_doc[1]) - 2)  # last chunk may be short
    )
    assert "".join(t for _, t in by_doc[1])[:40] == text[:40]
    assert by_doc[2] == [(0, "")]   # empty doc -> one empty chunk
    assert by_doc[3] == [(0, "xy")]
    with pytest.raises(ValueError):
        C.chunk_documents(df, size=10, overlap=10)


def test_stratified_sample_deterministic_subset(spark):
    df = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("src"),
    )
    kept = C.stratified_sample(df, "src", "doc_id", {"a": 0.5, "b": 0.1})
    ids = {r["doc_id"] for r in kept.collect()}
    # deterministic: same call keeps the same set
    assert ids == {r["doc_id"] for r in kept.collect()}
    # subset property: sampling a filtered corpus keeps the same survivors
    sub = C.stratified_sample(
        df.filter(F.col("doc_id") < 1000), "src", "doc_id", {"a": 0.5, "b": 0.1}
    )
    assert {r["doc_id"] for r in sub.collect()} == {i for i in ids if i < 1000}
    # fractions roughly honored per stratum
    n_a = sum(1 for i in ids if i % 2 == 0)
    n_b = len(ids) - n_a
    assert 0.4 < n_a / 2500 < 0.6
    assert 0.05 < n_b / 2500 < 0.16


def test_compact_parquet_small_files(spark, tmp_path):
    from modis_aggregation_spark.operators.merge import compact_parquet

    src = str(tmp_path / "frag")
    dest = str(tmp_path / "compacted")
    # 40 tiny files
    spark.range(4000).repartition(40).write.parquet(src)
    stats = compact_parquet(spark, src, dest, target_file_mb=128)
    assert stats["files_before"] == 40
    assert stats["files_after"] == 1  # 40 tiny files fit one target file
    assert stats["rows"] == 4000
    # content survives exactly
    assert (
        spark.read.parquet(dest).selectExpr("sum(id)").first()[0]
        == 4000 * 3999 // 2
    )
    # never clobbers an existing destination
    import pytest as _pytest

    with _pytest.raises(Exception):
        compact_parquet(spark, src, dest)


def test_compact_parquet_rejects_object_store_uris(spark, tmp_path):
    from modis_aggregation_spark.operators.merge import compact_parquet

    with pytest.raises(ValueError, match="non-local URI"):
        compact_parquet(spark, "s3a://bucket/frag", str(tmp_path / "out"))
    with pytest.raises(ValueError, match="non-local URI"):
        compact_parquet(
            spark, str(tmp_path / "frag"), "hdfs://nn/compacted"
        )
