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


def test_sf01_components_match_union_find(spark):
    """Independent sf0.1 oracle for the three queries whose DuckDB twin
    (recursive-CTE closure over DuckDB-recomputed n-gram pairs) is the
    documented sf0.1 cost ceiling: the SAME Spark pair graph reduced by a
    driver-side union-find — a from-scratch non-Spark implementation —
    must agree with Spark's iterative connected components AND with the
    dedup_by_pairs survivor set. The pair graph at sf0.1 is small (~260
    edges), so the independent check is exact and cheap."""
    from modis_aggregation_spark.operators.dedup import (
        connected_components,
        dedup_by_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.1,
        max_token_freq=1_000_000_000,
    ).localCheckpoint()
    edges = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    assert edges, "fixture should produce near-dup pairs"

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    # min-id labels: find() with min-root union already yields min ids
    got = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == want

    kept = {r["doc_id"] for r in dedup_by_pairs(
        docs, pairs, "doc_id", exact_components=True
    ).select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    in_graph = set(want)
    survivors_in_graph = {x for x in in_graph if want[x] == x}
    assert kept == (all_ids - in_graph) | survivors_in_graph
