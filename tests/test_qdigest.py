"""q-digest mergeable quantile sketch (operators/screening.py, round 12).

Validation: layout invariance (the sketch is a canonical function of
the input multiset — the property that justified q-digest over
KLL/GK), the Shrivastava et al. size and rank-error bounds against
exact order statistics, monoid laws of the merge, and the loud
universe gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.operators import screening as S

U_BITS = 10
K = 32


def _corpus(seed=1, n=8000):
    rng = np.random.default_rng(seed)
    # mixed distribution: uniform + a heavy spike + a skewed tail
    vals = np.concatenate([
        rng.integers(0, 1 << U_BITS, n // 2),
        np.full(n // 4, 37),
        (rng.exponential(40, n // 4)).astype(int).clip(0, (1 << U_BITS) - 1),
    ])
    groups = rng.choice(["a", "b", "c"], len(vals))
    return list(zip(groups.tolist(), [int(v) for v in vals]))


def test_qdigest_layout_invariant(spark):
    rows = _corpus()
    ref = None
    for parts in (1, 7, 32):
        df = spark.createDataFrame(rows, "g STRING, v INT").repartition(parts)
        d = S.qdigest_sketch(df, "v", ["g"], U_BITS, K)
        got = sorted(map(tuple, d.collect()))
        if ref is None:
            ref = got
        assert got == ref, parts


def test_qdigest_size_and_rank_bounds(spark):
    """Digest size O(k·u) per group; for every probe x the true rank
    of x is within [rank_lb, rank_lb + u·t]."""
    rows = _corpus(seed=2)
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    df = spark.createDataFrame(rows, "g STRING, v INT").repartition(7)
    d = S.qdigest_sketch(df, "v", ["g"], U_BITS, K)
    sizes = {r["g"]: r["cnt"] for r in
             d.groupBy("g").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for g, c in sizes.items():
        assert c <= 3 * K * U_BITS, (g, c)
    probes = [0, 1, 37, 100, 250, 511, 777, 1023]
    rk = {(r["g"], r["probe"]): (r["rank_lb"], r["n"])
          for r in S.qdigest_ranks(d, ["g"], probes, U_BITS).collect()}
    for (g, x), (lb, n) in rk.items():
        true = int((pdf[pdf.g == g].v <= x).sum())
        t = max(1, n // K)
        assert 0 <= true - lb <= U_BITS * t, (g, x, true - lb, U_BITS * t)


def test_qdigest_quantile_rank_error(spark):
    """Quantile estimates: the true rank of the estimate is within
    u·t of the target rank (the digest guarantee, tested end-to-end
    against exact order statistics)."""
    rows = _corpus(seed=3)
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    df = spark.createDataFrame(rows, "g STRING, v INT")
    d = S.qdigest_sketch(df, "v", ["g"], U_BITS, K)
    ps = {"q10": 0.1, "q50": 0.5, "q90": 0.9, "q99": 0.99}
    out = S.qdigest_quantiles(d, ["g"], ps, U_BITS).collect()
    for r in out:
        g = r["g"]
        sub = np.sort(pdf[pdf.g == g].v.to_numpy())
        n = len(sub)
        t = max(1, n // K)
        for a, p in ps.items():
            target = max(1, int(np.ceil(p * n)))
            est = r[a]
            # rank window covered by value est (ties included)
            rank_lo = int(np.searchsorted(sub, est, side="left")) + 1
            rank_hi = int(np.searchsorted(sub, est, side="right"))
            dist = 0 if rank_lo <= target <= rank_hi else min(
                abs(target - rank_lo), abs(target - rank_hi)
            )
            assert dist <= U_BITS * t, (g, a, est, target, dist)


def test_qdigest_merge_monoid(spark):
    """Merge = cell-wise sum + canonical recompress: commutative,
    rollup-equivalent (day sketches -> total over coarser keys), and
    the merged digest still meets the (doubled) rank bound."""
    rows = _corpus(seed=4)
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    third = len(rows) // 3
    parts = [rows[:third], rows[third:2 * third], rows[2 * third:]]
    ds = [
        S.qdigest_sketch(
            spark.createDataFrame(p, "g STRING, v INT"), "v", ["g"],
            U_BITS, K,
        ).localCheckpoint()
        for p in parts
    ]
    m123 = S.qdigest_merge(
        ds[0].unionByName(ds[1]).unionByName(ds[2]), ["g"], U_BITS, K
    )
    m321 = S.qdigest_merge(
        ds[2].unionByName(ds[1]).unionByName(ds[0]), ["g"], U_BITS, K
    )
    a = sorted(map(tuple, m123.collect()))
    assert a == sorted(map(tuple, m321.collect()))
    # totals are exact regardless of compression
    ns = {r["g"]: r["n"] for r in
          m123.groupBy("g").agg(F.sum("cnt").alias("n")).collect()}
    want = pdf.groupby("g").size().to_dict()
    assert ns == want
    probes = [37, 512]
    rk = {(r["g"], r["probe"]): (r["rank_lb"], r["n"])
          for r in S.qdigest_ranks(m123, ["g"], probes, U_BITS).collect()}
    for (g, x), (lb, n) in rk.items():
        true = int((pdf[pdf.g == g].v <= x).sum())
        t = max(1, n // K)
        # merging compressed digests can add one level of uncertainty
        # per input digest; 2·u·t is a safe audited envelope
        assert 0 <= true - lb <= 2 * U_BITS * t, (g, x, true - lb)


def test_qdigest_merge_equals_rebuild_totals(spark):
    """A merged digest answers rank queries consistently with a digest
    built from the full data (both within their bounds); leaf-level
    tables merge EXACTLY (sum monoid, no compression drift)."""
    rows = _corpus(seed=5)
    df = spark.createDataFrame(rows, "g STRING, v INT")
    half = len(rows) // 2
    l1 = S.qdigest_leaves(
        spark.createDataFrame(rows[:half], "g STRING, v INT"), "v", ["g"],
        U_BITS,
    )
    l2 = S.qdigest_leaves(
        spark.createDataFrame(rows[half:], "g STRING, v INT"), "v", ["g"],
        U_BITS,
    )
    summed = l1.unionByName(l2).groupBy("g", "cell").agg(
        F.sum("cnt").alias("cnt")
    )
    full = S.qdigest_leaves(df, "v", ["g"], U_BITS)
    assert sorted(map(tuple, summed.collect())) == sorted(
        map(tuple, full.collect())
    )
    # and compressing the summed leaves == the one-shot sketch
    a = S.qdigest_compress(summed, ["g"], U_BITS, K)
    b = S.qdigest_sketch(df, "v", ["g"], U_BITS, K)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_qdigest_universe_gate(spark):
    """Out-of-universe and fractional values raise loudly — no silent
    clamping (rule 5)."""
    df = spark.createDataFrame([("a", 5000)], "g STRING, v INT")
    with pytest.raises(Exception, match="out of universe"):
        S.qdigest_sketch(df, "v", ["g"], universe_bits=10).collect()
    df2 = spark.createDataFrame([("a", -1)], "g STRING, v INT")
    with pytest.raises(Exception, match="out of universe"):
        S.qdigest_sketch(df2, "v", ["g"], universe_bits=10).collect()
    df3 = spark.createDataFrame([("a", 1.5)], "g STRING, v DOUBLE")
    with pytest.raises(Exception, match="out of universe"):
        S.qdigest_sketch(df3, "v", ["g"], universe_bits=10).collect()
    with pytest.raises(ValueError, match="universe_bits"):
        S.qdigest_leaves(df, "v", ["g"], universe_bits=30)


def test_qdigest_global_group(spark):
    """Empty group_cols: one global digest."""
    rows = _corpus(seed=6)
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    df = spark.createDataFrame(rows, "g STRING, v INT")
    d = S.qdigest_sketch(df, "v", [], U_BITS, K)
    assert d.columns == ["cell", "cnt"]
    n = d.agg(F.sum("cnt")).collect()[0][0]
    assert n == len(rows)
    q = S.qdigest_quantiles(d, [], {"q50": 0.5}, U_BITS).collect()[0]
    sub = np.sort(pdf.v.to_numpy())
    target = max(1, int(np.ceil(0.5 * n)))
    t = max(1, n // K)
    rank_lo = int(np.searchsorted(sub, q["q50"], side="left")) + 1
    rank_hi = int(np.searchsorted(sub, q["q50"], side="right"))
    assert rank_lo - U_BITS * t <= target <= rank_hi + U_BITS * t
