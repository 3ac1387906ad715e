"""operators/quantiles.py — scale-safe exact order statistics.

The operator's whole contract is (a) BIT-IDENTICAL results to the
builtin exact ``percentile()`` (so rewritten contract queries keep
their oracle hashes) and (b) no per-group distinct-value buffer in the
plan (locked in test_plan_regressions.py).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.operators.quantiles import group_percentiles


def _builtin(spark, df, group, col, ps):
    aggs = [
        F.expr(f"percentile({col}, {p!r})").alias(a) for a, p in ps.items()
    ]
    return {
        tuple(r[g] for g in group): [r[a] for a in ps]
        for r in df.groupBy(*group).agg(*aggs).collect()
    }


def test_group_percentiles_bit_identical_to_builtin(spark):
    """Near-unique doubles (the scale-killer case for the builtin's
    OpenHashMap buffer), skewed group sizes, ties, and a singleton
    group: every requested fraction must match the builtin to the LAST
    BIT — the interpolation arithmetic is reproduced op-for-op."""
    rng = np.random.default_rng(7)
    rows = []
    for g, n in (("a", 997), ("b", 40), ("c", 1), ("d", 256)):
        vals = rng.normal(loc=100.0, scale=37.0, size=n)
        if g == "d":  # heavy ties
            vals = np.round(vals / 10.0) * 10.0
        rows += [(g, float(v)) for v in vals]
    rows += [("a", None), ("b", None)]  # NULLs are ignored
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE").repartition(7)
    ps = {"p0": 0.0, "q25": 0.25, "med": 0.5, "p90": 0.9, "p100": 1.0}
    got = {
        (r["g"],): [r[a] for a in ps]
        for r in group_percentiles(df, ["g"], "v", ps).collect()
    }
    want = _builtin(spark, df, ["g"], "v", ps)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k  # exact float equality, not approx


def test_group_percentiles_global_and_validation(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(11)], "v DOUBLE"
    )
    out = group_percentiles(df, [], "v", {"med": 0.5, "p90": 0.9}).collect()
    assert len(out) == 1
    assert out[0]["med"] == 5.0
    assert out[0]["p90"] == 9.0
    with pytest.raises(ValueError, match="at least one"):
        group_percentiles(df, [], "v", {})
    with pytest.raises(ValueError, match="outside"):
        group_percentiles(df, [], "v", {"bad": 1.5})


def test_group_percentiles_all_null_group_omitted(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", None)], "g STRING, v DOUBLE"
    )
    out = {r["g"]: r["med"] for r in
           group_percentiles(df, ["g"], "v", {"med": 0.5}).collect()}
    assert out == {"a": 1.5}


def test_group_percentiles_discrete_matches_builtin(spark):
    """discrete=True implements SQL-standard percentile_disc (smallest
    value whose CDF reaches p — an actual group member): must equal
    Spark's builtin percentile_disc exactly, including the p=0 clamp
    and even/odd group sizes."""
    rng = np.random.default_rng(3)
    rows = [("a", float(v)) for v in rng.normal(size=101)]
    rows += [("b", float(v)) for v in rng.normal(size=64)]
    rows += [("c", 7.0)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE").repartition(5)
    ps = {"p0": 0.0, "q25": 0.25, "med": 0.5, "p90": 0.9, "p100": 1.0}
    got = {
        (r["g"],): [r[a] for a in ps]
        for r in group_percentiles(df, ["g"], "v", ps, discrete=True).collect()
    }
    aggs = [
        F.expr(f"percentile_disc({p!r}) WITHIN GROUP (ORDER BY v)").alias(a)
        for a, p in ps.items()
    ]
    want = {
        (r["g"],): [r[a] for a in ps]
        for r in df.groupBy("g").agg(*aggs).collect()
    }
    assert got == want


def test_global_percentiles_distributed_parity_1_7_32(spark):
    """Round-12 distributed global path (bucket + prefix-sum): results
    bit-identical to the builtin at every partitioning, cont and disc."""
    rng = np.random.default_rng(12)
    vals = [float(v) for v in rng.normal(100, 25, 2001)] + [None]
    ps = {"p0": 0.0, "q25": 0.25, "med": 0.5, "p95": 0.95, "p100": 1.0}
    for parts in (1, 7, 32):
        df = spark.createDataFrame(
            [(v,) for v in vals], "v DOUBLE"
        ).repartition(parts)
        got = group_percentiles(df, [], "v", ps).collect()[0].asDict()
        ref = df.agg(
            *[F.expr(f"percentile(v, {p!r})").alias(a) for a, p in ps.items()]
        ).collect()[0].asDict()
        assert got == ref, parts
        gd = group_percentiles(df, [], "v", ps, discrete=True).collect()[0]
        rd = df.agg(*[
            F.expr(f"percentile_disc({p!r}) WITHIN GROUP (ORDER BY v)")
            .alias(a) for a, p in ps.items()
        ]).collect()[0]
        assert gd.asDict() == rd.asDict(), parts


def test_global_percentiles_degenerate_and_special_values(spark):
    """Empty input, all-NULL, all-equal (zero bucket width), NaN
    routing, and infinite endpoints all match the builtin."""
    import math as _m

    cases = {
        "empty": [],
        "all_null": [None, None],
        "single": [42.0],
        "all_equal": [7.0] * 100,
        "with_nan": [1.0, 2.0, float("nan"), 3.0],
        "with_inf": [1.0, float("inf"), 2.0, float("-inf")],
    }
    for name, data in cases.items():
        df = spark.createDataFrame([(v,) for v in data], "v DOUBLE")
        got = group_percentiles(
            df, [], "v", {"med": 0.5, "p90": 0.9}
        ).collect()[0].asDict()
        ref = df.agg(
            F.expr("percentile(v, 0.5)").alias("med"),
            F.expr("percentile(v, 0.9)").alias("p90"),
        ).collect()[0].asDict()
        for k in ref:
            same = got[k] == ref[k] or (
                isinstance(got[k], float) and isinstance(ref[k], float)
                and _m.isnan(got[k]) and _m.isnan(ref[k])
            )
            assert same, (name, k, got[k], ref[k])


def test_global_percentiles_no_single_partition_sort(spark):
    """Plan lock: the global path must never plan a single-partition
    global sort or an unpartitioned window — the within-bucket
    row_number windows over __b are the only sorts."""
    df = spark.createDataFrame(
        [(float(i),) for i in range(500)], "v DOUBLE"
    ).repartition(8)
    out = group_percentiles(df, [], "v", {"med": 0.5, "p99": 0.99})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(__b" in plan  # bucket-partitioned window
    # no unpartitioned window (spec starting directly at the order key)
    assert "windowspecdefinition(__v" not in plan
    # no global sort: every Sort node must be bucket-local
    for line in plan.splitlines():
        if "Sort [" in line:
            assert "__b" in line, line
        if "rangepartitioning(" in line:
            raise AssertionError(f"global sort exchange planned: {line}")


def test_global_percentiles_mixed_discrete_ps(spark):
    """Round-12 fused read: discrete_ps fractions computed in the same
    three passes as the continuous ones — values identical to two
    separate calls and to the builtins; validation on collisions and
    on the grouped path."""
    rng = np.random.default_rng(63)
    vals = [float(v) for v in rng.normal(50, 9, 999)]
    df = spark.createDataFrame([(v,) for v in vals], "v DOUBLE").repartition(7)
    got = group_percentiles(
        df, [], "v", {"q25": 0.25, "q50": 0.5}, discrete_ps={"d90": 0.9}
    ).collect()[0].asDict()
    ref = df.agg(
        F.expr("percentile(v, 0.25)").alias("q25"),
        F.expr("percentile(v, 0.5)").alias("q50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)").alias("d90"),
    ).collect()[0].asDict()
    assert got == ref
    with pytest.raises(ValueError, match="collide"):
        group_percentiles(df, [], "v", {"a": 0.5}, discrete_ps={"a": 0.9})
    with pytest.raises(ValueError, match="global"):
        group_percentiles(
            df, ["v"], "v", {"a": 0.5}, discrete_ps={"b": 0.9}
        )
