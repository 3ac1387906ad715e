"""Distributed Lloyd k-means (operators/similarity.kmeans_train):
partition-layout invariance (the property the exact integer staging
buys — round 7, after the round-6 driver hash-fail proved rounding a
float sum is NOT layout-invariant), agreement with a plain sequential
reference under the same integer contract, and model-shape /
empty-cluster semantics."""

import math

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
    """Sequential reference under the SAME exact-integer contract as the
    operator (init = k smallest ids quantized to the 10^-q grid,
    per-element micros = floor(x*1e6 + 0.5), exact int sums, new
    centroid = (2s + n*sub)//(2*n*sub) grid units, empty keeps
    centroid)."""
    scale, sub = 10 ** q, 10 ** (6 - q)
    vecs = [np.asarray(v, dtype=np.float64) for _, v in sorted(rows)]
    micros = [
        [math.floor(float(x) * 1_000_000.0 + 0.5) for x in v] for v in vecs
    ]
    cents_q = [
        [math.floor(float(x) * scale + 0.5) for x in v] for v in vecs[:k]
    ]
    for _ in range(iters):
        cents = [np.array(c, dtype=np.float64) / scale for c in cents_q]
        sums = [[0] * len(cents_q[0]) for _ in range(k)]
        counts = [0] * k
        for x, xm in zip(vecs, micros):
            ci = int(
                np.argmin([((x - c) ** 2).sum() for c in cents])
            )
            sums[ci] = [s + m for s, m in zip(sums[ci], xm)]
            counts[ci] += 1
        for ci in range(k):
            if counts[ci]:
                den = counts[ci] * sub
                cents_q[ci] = [(2 * s + den) // (2 * den) for s in sums[ci]]
    cents = [np.array(c, dtype=np.float64) / scale for c in cents_q]
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


def test_boundary_sums_layout_invariant(spark):
    """Adversarial case reproducing the round-6 driver hash-fail class:
    a cluster whose per-coordinate mean lands EXACTLY on a 0.0005
    rounding boundary (64 members, 32 at 0.001 + 32 at 0.002 → mean
    0.0015). Rounding a distributed float sum flips x.xxx5 cases with
    the partial-sum order; the exact integer staging must give the
    identical half-up answer (0.002) under 1, 7, and 32 partitions,
    matching the sequential integer-contract reference."""
    rows = [(0, [0.001] * 4), (1, [10.0] * 4)]
    for i in range(2, 65):  # 63 more cluster-A members: 31×0.001, 32×0.002
        v = 0.001 if i <= 32 else 0.002
        rows.append((i, [v] * 4))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    cents, sizes = _seq_kmeans(rows, k=2, iters=3)
    assert cents[0][0] == 0.002  # the boundary rounded half-up, not truncated
    outs = []
    for parts in (1, 7, 32):
        out = S.kmeans_train(df.repartition(parts), k=2, iters=3)
        outs.append(
            sorted(
                (r["list_id"], r["pos"], r["val"], r["size"])
                for r in out.collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]
    got = {(li, pos): val for li, pos, val, _ in outs[0]}
    for ci in range(2):
        for pos in range(4):
            assert got[(ci, pos)] == cents[ci][pos], (ci, pos)


def test_partition_layout_invariance(spark):
    """The same corpus through 1, 3, and 16 partitions must learn the
    bit-identical model — distributed sums are staged as exact int64
    micros, so no layout can perturb them."""
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
