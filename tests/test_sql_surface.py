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


def test_modis_cf_pipeline_as_pure_sql(spark):
    """The MODIS daily CF grid expressed as one spark.sql string must match
    the operator pipeline — every engine operator is a stock Catalyst
    construct, so the SQL surface is first-class (SURVEY §3.4)."""
    from modis_aggregation_spark.config import default_spec
    from modis_aggregation_spark.operators import stats as ops_stats

    register_fixtures(spark, FIXTURES)
    sql_res = {
        r["cell"]: (r["cld_pix"], r["tot_pix"], r["cf_mean"])
        for r in spark.sql(
            """
            WITH px AS (
              SELECT CAST(FLOOR((lat - -20.0) / 1.0) AS BIGINT) * 35
                       + CAST(FLOOR((lon - 0.0) / 1.0) AS BIGINT) AS cell,
                     CASE WHEN (cm_raw & 1) = 0 THEN -1
                          ELSE (cm_raw & 7) >> 1 END AS cm
              FROM pixels
              WHERE lat > -20 AND lat < 20 AND lon > 0 AND lon < 35
            )
            SELECT cell,
                   sum(CASE WHEN cm BETWEEN 0 AND 1 THEN 1 ELSE 0 END) AS cld_pix,
                   sum(CASE WHEN cm BETWEEN 0 AND 3 THEN 1 ELSE 0 END) AS tot_pix,
                   sum(CASE WHEN cm BETWEEN 0 AND 1 THEN 1 ELSE 0 END)
                     / nullif(sum(CASE WHEN cm BETWEEN 0 AND 3 THEN 1 ELSE 0 END), 0)
                     AS cf_mean
            FROM px GROUP BY cell
            """
        ).collect()
    }
    spec = default_spec(lat_bounds=(-20.0, 20.0), lon_bounds=(0.0, 35.0))
    px = ops_stats.with_cloud_mask(
        ops_stats.with_cell(spark.table("pixels"), spec)
    )
    op_res = {
        r["cell"]: (r["cld_pix"], r["tot_pix"], r["cf_mean"])
        for r in ops_stats.cloud_fraction(px).collect()
    }
    assert sql_res == op_res and len(sql_res) > 1000
