"""Distributed Lloyd k-means (operators/similarity.kmeans_train):
partition-layout invariance (the property the per-iteration centroid
quantization buys), agreement with a plain sequential reference, and
model-shape/empty-cluster semantics."""

import numpy as np
import pytest

from modis_aggregation_spark.operators import similarity as S


def _blobs(n_per=40, k=3, d=6, seed=4):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, (k, d))
    rows = []
    # interleave ids across blobs so init (k smallest ids) seeds one
    # centroid per blob
    for j in range(n_per):
        for ci in range(k):
            rows.append(
                (j * k + ci, (centers[ci] + rng.normal(0, 0.5, d)).tolist())
            )
    return rows


def _seq_kmeans(rows, k, iters=5, q=3):
    """Sequential reference with the same spec (init = k smallest ids,
    per-update 3-decimal quantization, empty keeps centroid)."""
    vecs = [np.asarray(v, dtype=np.float64) for _, v in sorted(rows)]
    cents = [np.round(v, q) for v in vecs[:k]]
    for _ in range(iters):
        sums = [np.zeros_like(cents[0]) for _ in range(k)]
        counts = [0] * k
        for x in vecs:
            ci = int(
                np.argmin([((x - c) ** 2).sum() for c in cents])
            )
            sums[ci] += x
            counts[ci] += 1
        cents = [
            np.round(sums[ci] / counts[ci], q) if counts[ci] else cents[ci]
            for ci in range(k)
        ]
    sizes = [0] * k
    for x in vecs:
        sizes[int(np.argmin([((x - c) ** 2).sum() for c in cents]))] += 1
    return cents, sizes


def test_matches_sequential_reference(spark):
    rows = _blobs()
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = {
        (r["list_id"], r["pos"]): (r["val"], r["size"])
        for r in S.kmeans_train(df, k=3, iters=5).collect()
    }
    cents, sizes = _seq_kmeans(rows, k=3)
    for ci in range(3):
        for pos in range(6):
            val, size = got[(ci, pos)]
            assert val == cents[ci][pos], (ci, pos)
            assert size == sizes[ci]
    # well-separated blobs: every cluster ends up with one blob
    assert sorted(sizes) == [40, 40, 40]


def test_partition_layout_invariance(spark):
    """The same corpus through 1, 3, and 16 partitions must learn the
    bit-identical model — distributed sum jitter is absorbed by the
    per-iteration quantization."""
    rows = _blobs(n_per=50, k=4, d=5, seed=9)
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    outs = []
    for parts in (1, 3, 16):
        out = S.kmeans_train(df.repartition(parts), k=4, iters=4)
        outs.append(
            sorted(
                (r["list_id"], r["pos"], r["val"], r["size"])
                for r in out.collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_empty_cluster_keeps_centroid(spark):
    """An init vector far from all data keeps its (quantized) initial
    centroid with size 0 instead of NaN-ing out."""
    rows = [(0, [1000.0, 1000.0])] + [
        (i, [float(i % 3), 0.25]) for i in range(1, 30)
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = S.kmeans_train(df, k=2, iters=3).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["list_id"], {})[r["pos"]] = (
            r["val"], r["size"],
        )
    # cluster 0 initialized at the outlier (vec_id 0) captures only it
    assert by_cluster[0][0][0] == 1000.0
    assert by_cluster[0][0][1] == 1
    assert by_cluster[1][0][1] == 29
    # float32 inputs are cast, not rejected
    df32 = df.selectExpr("vec_id", "cast(embedding as array<float>) embedding")
    out32 = S.kmeans_train(df32, k=2, iters=3)
    assert out32.count() == 4  # k * d rows


def test_model_shape_and_quantization(spark):
    rows = _blobs(n_per=10, k=2, d=4, seed=2)
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = S.kmeans_train(df, k=2, iters=2).collect()
    assert len(out) == 2 * 4
    for r in out:
        assert r["val"] == pytest.approx(round(r["val"], 3), abs=0)
