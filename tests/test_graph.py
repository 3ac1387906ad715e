"""Graph operators: fixed-iteration PageRank + degrees."""

import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.operators.graph import degrees, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_degrees(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3)])
    got = {r["id"]: (r["out_degree"], r["in_degree"]) for r in degrees(e).collect()}
    assert got == {1: (2, 0), 2: (1, 1), 3: (0, 2)}


def test_pagerank_two_node_cycle_is_fixed_point(spark):
    # symmetric cycle: rank 1.0 is the exact fixed point at any iteration
    e = _edges(spark, [(1, 2), (2, 1)])
    got = {r["id"]: r["rank"] for r in pagerank(e, iterations=4).collect()}
    assert got[1] == pytest.approx(1.0, abs=1e-12)
    assert got[2] == pytest.approx(1.0, abs=1e-12)


def test_pagerank_star_matches_hand_computation(spark):
    # 3 leaves -> center; leaves have no inbound mass
    e = _edges(spark, [(1, 0), (2, 0), (3, 0)])
    r = {row["id"]: row["rank"] for row in pagerank(e, iterations=1).collect()}
    assert r[1] == pytest.approx(0.15)
    assert r[0] == pytest.approx(0.15 + 0.85 * 3.0)
    r2 = {row["id"]: row["rank"] for row in pagerank(e, iterations=2).collect()}
    # center's 2nd round: leaves now carry 0.15 each, dangling center drops
    assert r2[0] == pytest.approx(0.15 + 0.85 * 3 * 0.15)


def test_pagerank_deduplicates_edges(spark):
    e = _edges(spark, [(1, 2), (1, 2), (1, 3)])
    r = {row["id"]: row["rank"] for row in pagerank(e, iterations=1).collect()}
    # duplicate (1,2) must not double 2's inbound mass: out(1)=2, so each
    # target gets 0.5
    assert r[2] == pytest.approx(0.15 + 0.85 * 0.5)
    assert r[3] == pytest.approx(0.15 + 0.85 * 0.5)
