"""Curation operators: deterministic splits, winnowing fingerprints,
embedding quantization."""

import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.operators import curation as C

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "The  quick\tbrown fox jumps over the lazy dog"),  # same after norm
    (3, "the quick brown fox jumps over the lazy cat"),    # near-dup
    (4, "zzqqkkxx vvbbnnmm ppooiiuu yyttrrww 0011223344 55667788"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_hash_split_deterministic_and_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in C.hash_split(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in C.hash_split(df, "doc_id").collect()}
    assert a == b
    # subsetting the corpus must not reassign surviving documents
    sub = df.filter(F.col("doc_id") % 3 == 0)
    c = {r["doc_id"]: r["split"] for r in C.hash_split(sub, "doc_id").collect()}
    assert all(a[k] == v for k, v in c.items())
    # roughly the requested proportions
    from collections import Counter

    n = Counter(a.values())
    assert 0.7 < n["train"] / 2000 < 0.9
    assert 0.05 < n["val"] / 2000 < 0.15
    assert 0.05 < n["test"] / 2000 < 0.15
    # different salt -> different assignment for at least some ids
    d = {r["doc_id"]: r["split"] for r in C.hash_split(df, "doc_id", salt=99).collect()}
    assert any(a[k] != d[k] for k in a)


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing guarantees: any shared substring of length >= k+w-1
    yields at least one shared fingerprint; identical docs share ALL."""
    k, w = 5, 4
    fps = {
        r["id"]: set()
        for r in C.winnow_fingerprints(_docs(spark), k=k, w=w).select("id").collect()
    }
    for r in C.winnow_fingerprints(_docs(spark), k=k, w=w).collect():
        fps[r["id"]].add(r["fp"])
    assert fps[1] == fps[2]  # identical after whitespace normalization
    assert fps[1] & fps[3]   # long shared prefix -> shared fingerprints
    assert not (fps[1] & fps[4])  # disjoint content


def test_winnow_pairs(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_fps"]
        for r in C.winnow_pairs(_docs(spark), min_shared=2).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert all(4 not in p for p in pairs)


def test_quantize_roundtrip_error_bound(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [3.0, 2.0, -3.0, 1.5])],
        "vec_id long, embedding array<double>",
    )
    scale, codes = C.quantize_embedding(F.col("embedding"), bits=8)
    out = df.select("vec_id", scale.alias("s"), codes.alias("q"), "embedding").collect()
    for r in out:
        assert max(abs(q) for q in r["q"]) == 127  # max-abs element saturates
        for v, q in zip(r["embedding"], r["q"]):
            deq = q * r["s"] / 127
            assert abs(deq - v) <= r["s"] / 127 / 2 + 1e-12  # half-step bound


def test_quantize_zero_vector_yields_nulls(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], "vec_id long, embedding array<double>")
    _, codes = C.quantize_embedding(F.col("embedding"))
    row = df.select(codes.alias("q")).first()
    assert row["q"] == [None, None]
