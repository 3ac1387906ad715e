"""spark.sql surface + catalog hour-coverage validation."""

import os

import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.sources.catalog import (
    catalog_from_filenames,
    validate_hour_coverage,
)
from modis_aggregation_spark.sql import register_fixtures, register_star_schema

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)
SF = "/root/testdata/sf0.001"


def test_sql_views_match_dataframe_results(spark):
    registered = register_star_schema(spark, SF)
    assert "lineitem" in registered and "orders" in registered
    sql_res = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 6) AS sum_qty, count(*) AS n
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    df_res = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
        .collect()
    )
    assert [tuple(r) for r in sql_res] == [tuple(r) for r in df_res]


def test_sql_views_fixtures_and_grid(spark):
    registered = register_fixtures(spark, FIXTURES)
    assert registered == ["pixels", "granules"]
    n = spark.sql(
        "SELECT count(*) FROM pixels p JOIN granules g USING (granule_id)"
    ).first()[0]
    assert n == spark.table("pixels").count()


def test_validate_hour_coverage(spark):
    # complete 2-day x 24-hour synthetic catalog
    full = spark.sql(
        "SELECT explode(sequence(DATE '2008-01-01', DATE '2008-01-02')) AS date"
    ).crossJoin(spark.range(24).select(F.col("id").cast("int").alias("hour")))
    validate_hour_coverage(full, "2008-01-01", "2008-01-02")  # no raise

    gappy = full.filter(~((F.col("date") == "2008-01-02") & (F.col("hour") == 13)))
    with pytest.raises(ValueError, match="missing") as exc:
        validate_hour_coverage(gappy, "2008-01-01", "2008-01-02")
    assert "2008-01-02T13" in str(exc.value)

    # fixture day 3 is the 3-hour spill only — a window including it as a
    # full day must report the 21 missing hours
    cat = catalog_from_filenames(
        spark.read.parquet(os.path.join(FIXTURES, "granules.parquet"))
    )
    validate_hour_coverage(cat, "2008-01-01", "2008-01-02")  # days 1-2 complete
    with pytest.raises(ValueError, match="missing"):
        validate_hour_coverage(cat, "2008-01-01", "2008-01-03")


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing co-locates join keys: a self-join of a table bucketed by
    the join key must plan without an Exchange on either side."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    (
        li.write.mode("overwrite")
        .option("path", str(tmp_path / "li_bucketed"))  # external: keep out of cwd
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path so the assertion targets
        # hash-partitioning exchanges, not broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t = spark.table("li_bucketed")
        agg_a = t.groupBy("l_orderkey").count()
        joined = agg_a.join(t.select("l_orderkey", "l_quantity"), "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "Bucketed: true" in plan
        assert joined.count() == t.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
