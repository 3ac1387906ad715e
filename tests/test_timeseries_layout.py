"""EWMA / z-score outliers (operators/temporal.py), Z-order layout keys
(functions/layout.py), A-ES weighted sampling and content-defined chunking
(operators/curation.py)."""

import math
import re

import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.functions.layout import zorder_key
from modis_aggregation_spark.operators.curation import (
    cdc_chunks,
    weighted_sample,
    weighted_sample_keys,
)
from modis_aggregation_spark.operators.temporal import ewma, zscore_outliers


# ---------------------------------------------------------------- EWMA


def test_ewma_matches_pandas_adjusted(spark):
    pd = pytest.importorskip("pandas")
    rows = [(1, float(i), v) for i, v in enumerate([10.0, 20.0, 5.0, 5.0, 40.0])]
    rows += [(2, float(i), v) for i, v in enumerate([1.0, 1.0, 1.0])]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = ewma(df, "v", "ts", "k", alpha=0.4).orderBy("key", "pos").collect()
    for key in (1, 2):
        vals = [r.value for r in out if r.key == key]
        got = [r.ewma for r in out if r.key == key]
        ref = pd.Series(vals).ewm(alpha=0.4, adjust=True).mean().tolist()
        assert got == pytest.approx(ref, abs=1e-12)


def test_ewma_single_point_and_tie_order(spark):
    # one observation → ewma == value; duplicate ts ties break by value
    df = spark.createDataFrame(
        [(1, 0.0, 7.0), (2, 1.0, 3.0), (2, 1.0, 1.0)], ["k", "ts", "v"]
    )
    out = {(r.key, r.pos): (r.value, r.ewma) for r in ewma(df, "v", "ts", "k").collect()}
    assert out[(1, 1)] == (7.0, 7.0)
    # (ts, value) sort puts value 1.0 first deterministically
    assert out[(2, 1)][0] == 1.0 and out[(2, 2)][0] == 3.0


def test_ewma_pandas_engine_matches_sql_engine(spark):
    rows = [(1, float(i), v) for i, v in enumerate([10.0, 20.0, 5.0, 5.0, 40.0])]
    rows += [(2, float(i), v) for i, v in enumerate([1.0, 2.0, 3.0])]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    a = {(r.key, r.pos): r.ewma
         for r in ewma(df, "v", "ts", "k", alpha=0.4).collect()}
    b = {(r.key, r.pos): r.ewma
         for r in ewma(df, "v", "ts", "k", alpha=0.4, engine="pandas").collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)
    with pytest.raises(ValueError, match="engine"):
        ewma(df, "v", "ts", "k", engine="nope")


def test_ewma_partitioned_engine_matches_both(spark):
    """The distributed prefix-scan engine must value-match the sql and
    pandas engines (1e-9 rel — stitching reassociates float ops) on a
    multi-key series, including pos/ts/value identity."""
    import numpy as np

    rng = np.random.default_rng(3)
    n = 5000
    rows = [
        (int(k), float(t), float(v))
        for k, t, v in zip(
            rng.integers(0, 4, n), rng.random(n) * 1e5, rng.normal(0, 1, n)
        )
    ]
    df = spark.createDataFrame(rows, "k LONG, ts DOUBLE, v DOUBLE")
    frames = {
        e: ewma(df, "v", "ts", "k", alpha=0.3, engine=e)
        .orderBy("key", "pos")
        .collect()
        for e in ("sql", "pandas", "partitioned")
    }
    base = frames["sql"]
    for e in ("pandas", "partitioned"):
        other = frames[e]
        assert len(other) == len(base) == n
        for r, s in zip(base, other):
            assert (r.key, r.pos, r.ts, r.value) == (s.key, s.pos, s.ts, s.value)
            assert s.ewma == pytest.approx(r.ewma, rel=1e-9)


def test_ewma_partitioned_hot_key_spans_partitions(spark):
    """The engine's reason to exist: ONE key range-split across many
    partitions — no task holds the series. Verifies the split really
    happened (>1 segment) and the stitched tail equals pandas."""
    from modis_aggregation_spark.operators.temporal import _ewma_partitioned

    pd = pytest.importorskip("pandas")
    n = 20_000
    df = spark.range(n).select(
        F.lit(1).alias("k"),
        F.col("id").cast("double").alias("ts"),
        (F.sin(F.col("id").cast("double")) * 10.0).alias("v"),
    )
    out = (
        _ewma_partitioned(df, "v", "ts", "k", alpha=0.3, num_partitions=8)
        .orderBy("pos")
        .collect()
    )
    assert len(out) == n
    assert [r.pos for r in out] == list(range(1, n + 1))
    ref = pd.Series([r.value for r in out]).ewm(alpha=0.3, adjust=True).mean()
    for pos in (0, 1, 63, 64, n // 2, n - 1):
        assert out[pos].ewma == pytest.approx(ref.iloc[pos], rel=1e-9)


def test_ewma_segment_scan_matches_sequential():
    """The vectorized two-level scan must equal the plain sequential
    recurrence from an arbitrary starting state."""
    import numpy as np

    from modis_aggregation_spark.operators.temporal import _ewma_segment_scan

    rng = np.random.default_rng(0)
    for n in (1, 63, 64, 65, 1000):
        x = rng.normal(0, 1, n)
        num0, den0 = rng.uniform(0, 5), rng.uniform(0, 5)
        nums, dens = _ewma_segment_scan(x, num0, den0, 0.7)
        sn, sd = num0, den0
        for i in range(n):
            sn = 0.7 * sn + x[i]
            sd = 0.7 * sd + 1.0
            assert nums[i] == pytest.approx(sn, rel=1e-12)
            assert dens[i] == pytest.approx(sd, rel=1e-12)


def test_ewma_linear_complexity_50k_single_key(spark):
    """Scale regression: the pre-round-4 closed form was O(n²) arithmetic
    per key (2.5e9 pow() calls at n=50k — minutes); the recurrence fold
    must push a 50k-row single-key series through in seconds. The answer
    is cross-checked against pandas at both ends of the series."""
    import time

    pd = pytest.importorskip("pandas")
    n = 50_000
    df = spark.range(n).select(
        F.lit(1).alias("k"),
        F.col("id").cast("double").alias("ts"),
        (F.sin(F.col("id").cast("double")) * 10.0).alias("v"),
    )
    t0 = time.monotonic()
    out = (
        ewma(df, "v", "ts", "k", alpha=0.3)
        .orderBy("pos")
        .select("pos", "value", "ewma")
        .collect()
    )
    wall = time.monotonic() - t0
    assert len(out) == n
    assert wall < 30.0, f"50k-row EWMA took {wall:.1f}s — quadratic regression?"
    ref = (
        pd.Series([r.value for r in out]).ewm(alpha=0.3, adjust=True).mean()
    )
    for pos in (0, 1, 2, n // 2, n - 1):
        assert out[pos].ewma == pytest.approx(ref.iloc[pos], abs=1e-9)


def test_zscore_outliers_flags_only_extremes(spark):
    rows = [("a", float(v)) for v in [10, 11, 9, 10, 10, 50]] + [("b", 5.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = zscore_outliers(df, "v", "k", threshold=2.0).collect()
    assert [(r.k, r.v) for r in out] == [("a", 50.0)]
    # singleton group: std 0 → z NULL → never flagged (no row for 'b')


# ------------------------------------------------------------- Z-order


def _spread(v):
    v &= 0xFFFF
    for s, m in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        v = (v | (v << s)) & m
    return v


def test_zorder_key_matches_bit_reference(spark):
    df = spark.createDataFrame(
        [(i, float(i * 7 % 13), float(i * 3 % 11)) for i in range(50)],
        ["id", "x", "y"],
    )
    rows = zorder_key(df, "x", "y").collect()
    xs = [r.x for r in rows]
    ys = [r.y for r in rows]
    xmin, xmax, ymin, ymax = min(xs), max(xs), min(ys), max(ys)

    def q(v, lo, hi):
        if hi == lo:
            return 0
        return max(0, min(65535, math.floor((v - lo) / (hi - lo) * 65535)))

    for r in rows:
        ref = (_spread(q(r.y, ymin, ymax)) << 1) | _spread(q(r.x, xmin, xmax))
        assert r.zkey == ref


def test_zorder_key_clusters_neighbors(spark):
    # points on a 4x4 grid: the 2x2 sub-squares must occupy contiguous
    # quarters of the Morton range (the locality property layout relies on)
    pts = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)], ["id", "x", "y"]
    )
    rows = {(r.x, r.y): r.zkey for r in zorder_key(df, "x", "y").collect()}
    ranked = sorted(pts, key=lambda p: rows[(float(p[0]), float(p[1]))])
    first_quarter = set(ranked[:4])
    assert first_quarter == {(0, 0), (1, 0), (0, 1), (1, 1)}


# ---------------------------------------------- weighted sampling (A-ES)


def test_weighted_sample_deterministic_and_weight_biased(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        # ids < 100 get 100x the weight of the rest
        F.when(F.col("id") < 100, 1000.0).otherwise(10.0).alias("w"),
    )
    a = [r.doc_id for r in weighted_sample(df, 50, "w").collect()]
    b = [r.doc_id for r in weighted_sample(df, 50, "w").collect()]
    assert a == b  # deterministic
    heavy = sum(1 for d in a if d < 100)
    # heavy ids are 10% of the corpus but 100x weighted → dominate the sample
    assert heavy > 25
    c = [r.doc_id for r in weighted_sample(df, 50, "w", salt=7).collect()]
    assert a != c  # salt changes the draw


def test_weighted_sample_keys_null_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)], ["doc_id", "w"]
    )
    keyed = {r.doc_id: r.rk for r in weighted_sample_keys(df, "w").collect()}
    assert keyed[1] is not None
    assert keyed[2] is None and keyed[3] is None and keyed[4] is None
    assert [r.doc_id for r in weighted_sample(df, 10, "w").collect()] == [1]


# ------------------------------------------- content-defined chunking


def _py_cdc(text, k=5, D=32, ml=8):
    norm = re.sub(r"\s+", " ", text.lower())
    n = len(norm)
    ng = max(n - (k - 1), 1)
    hs = []
    for i in range(1, ng + 1):
        s = 0
        for j in range(k):
            idx = i - 1 + j
            s += (ord(norm[idx]) if idx < n else 0) * (257 ** (k - 1 - j))
        hs.append(s)
    bounds = []
    for i in (i for i in range(1, len(hs) + 1) if hs[i - 1] % D == 0):
        if (bounds[-1] if bounds else 0) <= i - ml:
            bounds.append(i)
    starts = [1] + [b + 1 for b in bounds if b + 1 <= n]
    out = []
    for j, s0 in enumerate(starts):
        e = (starts[j + 1] - 1) if j + 1 < len(starts) else n
        c = norm[s0 - 1 : e]
        hh = 0
        for ch in c[:5]:
            hh = hh * 257 + ord(ch)
        out.append((j + 1, hh * 1000003 + len(c), len(c)))
    return out


def test_cdc_chunks_match_reference_and_reassemble(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog " * 5),
        (2, "a b c"),
        (3, "x" * 100),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {
        (r.id, r.chunk_idx): (r.chunk_hash, r.chunk_len)
        for r in cdc_chunks(df).collect()
    }
    ref = {}
    for doc_id, text in texts:
        for idx, h, ln in _py_cdc(text):
            ref[(doc_id, idx)] = (h, ln)
    assert got == ref
    # chunk lengths reassemble to the normalized doc length
    for doc_id, text in texts:
        norm_len = len(re.sub(r"\s+", " ", text.lower()))
        total = sum(v[1] for k, v in got.items() if k[0] == doc_id)
        assert total == norm_len


def test_cdc_chunks_shift_resistant(spark):
    # prefix insertion changes early chunks but the tail chunks realign —
    # the property fixed-size blocking lacks
    base = "the quick brown fox jumps over the lazy dog " * 10
    df = spark.createDataFrame(
        [(1, base), (2, "INSERTED PREFIX " + base)], ["doc_id", "text"]
    )
    rows = cdc_chunks(df).collect()
    h1 = {r.chunk_hash for r in rows if r.id == 1}
    h2 = {r.chunk_hash for r in rows if r.id == 2}
    # most distinct content chunks survive the shift (only the boundary
    # chunk touching the inserted prefix may differ)
    assert len(h1 & h2) >= len(h1) - 1 >= 1


# ------------------------------------------ resample / interpolate / LM


def test_resample_gap_fill_and_interpolate(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 30), 10.0),
        (1, dt.datetime(2024, 1, 1, 0, 45), 20.0),  # bucket 0: avg 15
        # buckets 1, 2 missing
        (1, dt.datetime(2024, 1, 1, 3, 10), 45.0),  # bucket 3
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    from modis_aggregation_spark.operators.temporal import (
        interpolate_linear,
        resample,
    )

    out = {
        r.bucket - 473352: (r.avg_v, r.n, r.interp_v)
        for r in interpolate_linear(resample(df, "ts", "v", "k", 3600)).collect()
    }
    assert out[0] == (15.0, 2, 15.0)
    assert out[1] == (None, 0, 25.0)  # 15 + (45-15)*1/3
    assert out[2] == (None, 0, 35.0)
    assert out[3] == (45.0, 1, 45.0)


def test_triangles_small_graph(spark):
    # square 1-2-3-4 with diagonal 1-3 → triangles (1,2,3) and (1,3,4);
    # edges given in mixed orientation with a duplicate and a self-loop
    edges = [(1, 2), (3, 2), (3, 4), (4, 1), (1, 3), (3, 1), (2, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    from modis_aggregation_spark.operators.graph import triangles

    got = sorted((r.a, r.b, r.c) for r in triangles(df).collect())
    assert got == [(1, 2, 3), (1, 3, 4)]


def test_bigram_lm_hand_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")], ["doc_id", "text"]
    )
    from modis_aggregation_spark.operators.tfidf import bigram_lm

    # pairs: (a,b)x2 + (b,a) + (a,b) + (b,c); vocab {a,b,c}; doc 3 excluded
    out = {(r.w1, r.w2): (r.c12, r.c1, r.p) for r in bigram_lm(df, k_smooth=0.5).collect()}
    assert out[("a", "b")][0] == 3 and out[("a", "b")][1] == 3
    assert out[("b", "a")][0] == 1 and out[("b", "a")][1] == 2
    assert out[("b", "c")][0] == 1
    v = 3.0
    assert out[("a", "b")][2] == (3 + 0.5) / (3 + 0.5 * v)
    assert out[("b", "c")][2] == (1 + 0.5) / (2 + 0.5 * v)


def test_ewma_null_values_dropped_identically_both_engines(spark):
    """NULL observations are skipped (repo missingness rule), and BOTH
    engines must agree — the round-4 review found the SQL engine
    poisoning every position after a NULL while pandas skipped it."""
    rows = [(1, 0.0, 10.0), (1, 1.0, None), (1, 2.0, 30.0), (1, 3.0, None)]
    df = spark.createDataFrame(rows, "k int, ts double, v double")
    a = {(r.pos): (r.ts, r.value, r.ewma)
         for r in ewma(df, "v", "ts", "k", alpha=0.5).collect()}
    b = {(r.pos): (r.ts, r.value, r.ewma)
         for r in ewma(df, "v", "ts", "k", alpha=0.5, engine="pandas").collect()}
    assert set(a) == set(b) == {1, 2}          # NULL rows dropped, re-numbered
    assert a[1][0] == b[1][0] == 0.0 and a[2][0] == b[2][0] == 2.0
    for p in a:
        assert a[p][2] == pytest.approx(b[p][2], abs=1e-12)
    # adjusted EWMA over [10, 30] with alpha=.5: (0.5*10·... ) second pos:
    # (30 + 0.5*10)/(1 + 0.5) = 23.333...
    assert a[2][2] == pytest.approx(35.0 / 1.5)


def test_cdc_chunks_hypothesis_differential(spark):
    """cdc_chunks' numpy path (round 8) vs the tests' independent
    pure-Python reference on random ASCII texts — random lengths
    straddling every edge (empty after norm, < k, < min_len, long)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(list("ab x.\t"))

    @given(texts=st.lists(st.text(alphabet, max_size=120), min_size=1, max_size=8))
    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def run(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        got = {
            (r.id, r.chunk_idx): (r.chunk_hash, r.chunk_len)
            for r in cdc_chunks(df).collect()
        }
        ref = {}
        for doc_id, t in rows:
            if not re.sub(r"\s+", " ", t.lower()):
                continue
            for idx, h, ln in _py_cdc(t):
                ref[(doc_id, idx)] = (h, ln)
        assert got == ref

    run()


def test_winnow_hypothesis_differential(spark):
    """winnow_fingerprints' numpy path vs the Catalyst expression twin
    on random texts (includes whitespace runs and non-ASCII)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from modis_aggregation_spark.operators.curation import (
        _winnow_fps_hof,
        winnow_fingerprints,
    )

    alphabet = st.sampled_from(list("abc \tzé"))

    @given(texts=st.lists(st.text(alphabet, max_size=80), min_size=1, max_size=6))
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def run(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        a = {(r.id, r.fp) for r in winnow_fingerprints(df).collect()}
        b = {(r.id, r.fp) for r in _winnow_fps_hof(df).collect()}
        assert a == b

    run()
