"""Adversarial partition-layout parity for every float-valued
golden-keyed query (VERDICT round 6 item 3): the round-6 driver proved a
result can pass value-exact under one partitioning and hash-fail under
another (x75), so each golden whose values flow through a distributed
computation is re-run here under 1, 7, and 32 partitions and must be
bit-identical.

Inventory of golden-keyed queries and why each is (or is here proven)
layout-invariant:

- x75 kmeans  — exact int64 micros staging; covered in
  test_kmeans_distributed.py (incl. a planted 0.0005-boundary case).
- x77/x78 unigram — exact integer-micro M-step; word-level invariance in
  test_unigram_tokenizer.py; corpus-level sweep here.
- x70/x71 BPE — integer pair counts with fixed (count desc, pair asc)
  tie-break; sweep here.
- x90/x91 WordPiece — exact integer counts, one IEEE-division score per
  candidate with lexicographic tie-break; swept in
  test_wordpiece.py::test_layout_invariance.
- r9b HLL++ — per-value register hashes, element-wise-max merge; sweep
  here.
- x9/x56/x57 centroids & PQ codebooks — driver-side sample taken via a
  TOTAL order (orderBy unique vec_id + limit) then serial numpy; the
  distributed part is only the top-k sort, swept here.
- x79/x80/x86 dHash & audio fingerprints, x69 deflate lengths,
  x61/x64/x65/x67/x68/x73 codec decodes — per-row bit-exact functions of
  the payload (map-only, no cross-row reduction): layout cannot reorder
  arithmetic, nothing to sweep.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
LAYOUTS = (1, 7, 32)


def _read(spark, table):
    return spark.read.parquet(f"{SF}/{table}.parquet")


def test_pq_codebooks_layout_invariant(spark):
    from modis_aggregation_spark.operators.similarity import pq_codebooks

    emb = _read(spark, "embeddings")
    outs = [
        pq_codebooks(
            emb.repartition(p), m=8, k=16, sample_rows=2000, seed=5,
            order_col="vec_id",
        )
        for p in LAYOUTS
    ]
    for o in outs[1:]:
        assert o.shape == outs[0].shape
        assert np.array_equal(o, outs[0])  # bit-exact, not approx


def test_kmeans_centroids_layout_invariant(spark):
    from modis_aggregation_spark.operators.similarity import kmeans_centroids

    emb = _read(spark, "embeddings")
    outs = [
        kmeans_centroids(
            emb.repartition(p), nlist=16, sample_rows=2000, seed=5,
            order_col="vec_id",
        )
        for p in LAYOUTS
    ]
    for o in outs[1:]:
        assert np.array_equal(o, outs[0])


def test_hll_approx_distinct_layout_invariant(spark):
    orders = _read(spark, "orders")
    outs = [
        sorted(
            (r["o_orderstatus"], r["approx_custkeys"])
            for r in orders.repartition(p)
            .groupBy("o_orderstatus")
            .agg(F.approx_count_distinct("o_custkey").alias("approx_custkeys"))
            .collect()
        )
        for p in LAYOUTS
    ]
    assert outs[0] == outs[1] == outs[2]


def test_bpe_train_layout_invariant(spark):
    from modis_aggregation_spark.operators.tokenizer import bpe_train

    docs = _read(spark, "documents")
    outs = [
        sorted(
            (r["rank"], r["left"], r["right"], r["pair_count"])
            for r in bpe_train(
                docs.repartition(p), "text", num_merges=8
            ).collect()
        )
        for p in LAYOUTS
    ]
    assert outs[0] == outs[1] == outs[2]


def test_unigram_train_layout_invariant(spark):
    from modis_aggregation_spark.operators.tokenizer import unigram_train

    docs = _read(spark, "documents")
    outs = [
        sorted(
            (r["rank"], r["piece"], r["count_micro"], r["prob"])
            for r in unigram_train(
                docs.repartition(p), "text",
                seed_multi=48, vocab_size=32, num_iters=2,
            ).collect()
        )
        for p in LAYOUTS
    ]
    assert outs[0] == outs[1] == outs[2]
