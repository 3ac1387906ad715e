"""Physical-plan regression tests: the perf posture (pushdown, pruning,
broadcast, partial aggregation) must not silently regress."""

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = entry.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_m2_scan_pushdown_and_pruning(spark):
    plan = _plan(spark, "m2_cell_stats")
    assert "PushedFilters: [IsNotNull(lat), IsNotNull(lon), GreaterThan(lat,-20.0)" in plan
    assert "ReadSchema: struct<lat:double,lon:double,ctp:double>" in plan
    assert "partial_min" in plan and "partial_stddev_pop" in plan  # map-side partials
    assert plan.count("Exchange hashpartitioning") == 1  # exactly one shuffle


def test_r3_joins_all_broadcast(spark):
    plan = _plan(spark, "r3_join_chain")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    # date filter pushed into the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_m9_densify_broadcasts_aggregate(spark):
    plan = _plan(spark, "m9_densify")
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1  # only the agg shuffle


def test_r1_projection_pruned(spark):
    plan = _plan(spark, "r1_filter_project")
    # only the five needed lineitem columns are read
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double," in plan


def test_m13_single_pass_staging(spark):
    """Monthly reagg must stage per-day partials in ONE pass over the
    pixels (round 1 unioned a plan branch per day: 51 redundant scans)."""
    plan = _plan(spark, "m13_monthly_reagg")
    assert plan.count("pixels.parquet") == 1  # one scan, branches reused
    assert plan.count("Exchange hashpartitioning") <= 3  # (cell,doy) stage + cell merge
    assert "SortMergeJoin" not in plan
