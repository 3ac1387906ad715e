"""functions/materialize.shared_frame — the round-13 routing of every
share-site materialization through one cluster-configurable helper
(docs/SCALING.md §round-13): default localCheckpoint, conf-switchable to
persist (lineage kept — executor loss recomputes) without code changes,
and routed operators still compute identical results under either mode."""

import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.functions.materialize import (
    CONF_KEY,
    shared_frame,
)


@pytest.fixture
def _restore_mode(spark):
    yield
    spark.conf.unset(CONF_KEY)


def _base(spark):
    return spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    ).groupBy("k").agg(F.sum("v").alias("s"))


def test_default_mode_is_local_checkpoint(spark):
    out = shared_frame(_base(spark))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan  # lineage truncated
    assert out.count() == 7


def test_persist_mode_keeps_lineage(spark, _restore_mode):
    spark.conf.set(CONF_KEY, "persist")
    out = shared_frame(_base(spark))
    try:
        plan = out._jdf.queryExecution().withCachedData().toString()
        assert "InMemoryRelation" in plan
        assert "LogicalRDD" not in plan  # lineage NOT truncated
        assert out.count() == 7
    finally:
        out.unpersist()


def test_routed_operator_identical_under_persist(spark, _restore_mode):
    """A routed share-site operator (bm25: per-doc state consumed by the
    stats aggregate AND the scoring projection) returns identical rows
    under both mechanisms."""
    from modis_aggregation_spark.operators.tfidf import bm25

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} alpha") for i in range(40)],
        "doc_id LONG, text STRING",
    )
    local_rows = sorted(
        (r["doc_id"], round(r["score"], 12))
        for r in bm25(docs, ["alpha", "doc3"]).collect()
    )
    spark.conf.set(CONF_KEY, "persist")
    persist_rows = sorted(
        (r["doc_id"], round(r["score"], 12))
        for r in bm25(docs, ["alpha", "doc3"]).collect()
    )
    assert local_rows == persist_rows
