"""Data-quality constraint checking (operators/quality.py)."""

from pyspark.sql import functions as F

from modis_aggregation_spark.operators.quality import (
    check_constraints,
    referential_orphans,
)


def test_check_constraints_one_pass_counts(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None), (4, 99.0)], "id long, v double"
    )
    out = {
        r["rule"]: (r["total"], r["violations"], r["pass_rate"])
        for r in check_constraints(
            df,
            {
                "v_nonneg": F.col("v") >= 0,          # NULL row counts as violation
                "v_not_null": F.col("v").isNotNull(),
                "id_positive": F.col("id") > 0,
            },
        ).collect()
    }
    assert out["v_nonneg"] == (4, 2, 0.5)       # -3 and NULL
    assert out["v_not_null"] == (4, 1, 0.75)
    assert out["id_positive"] == (4, 0, 1.0)
    # one scan: the plan has exactly one aggregate over the source
    plan = check_constraints(
        df, {"a": F.col("v") >= 0, "b": F.col("id") > 0}
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LocalRelation") <= 1


def test_referential_orphans_anti_join(spark):
    child = spark.createDataFrame(
        [(1, "x"), (2, "y"), (5, "z"), (None, "n")], "fk long, payload string"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    got = sorted(
        r["payload"]
        for r in referential_orphans(child, parent, {"fk": "pk"}).collect()
    )
    assert got == ["n", "z"]
