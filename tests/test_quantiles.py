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
