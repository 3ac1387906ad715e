"""Capture .explain("formatted") for the bench queries into plans/r<N>/.

Usage: python tools/capture_plans.py <suffix> [slot ...]

Writes plans/r$SPARK_GRAFT_ROUND/<slot>_<suffix>.txt for each bench slot
(default round: 13; default slots: all).  The same DataFrame construction
as bench.py, so the captured plan is the one the bench times (initial AQE
plan, isFinalPlan=false).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    REPO, "plans", "r" + os.environ.get("SPARK_GRAFT_ROUND", "13")
)


def bench_frames(spark):
    """name -> lazily-built DataFrame, mirroring bench.py exactly."""
    import __spark_entry__ as entry
    from modis_aggregation_spark.config import (
        AggregationSpec,
        JointHistSpec,
        VariableSpec,
    )
    from modis_aggregation_spark.functions.text import (
        c4_clean,
        gopher_quality,
        pii_scrub,
    )
    from modis_aggregation_spark.operators import dedup as ops_dedup
    from modis_aggregation_spark.plans.pipeline import daily_grid

    qs = entry.queries()
    frames = {
        "q_m2_stats": lambda: qs["m2_cell_stats"](spark, SF_DIR),
        "q_hist_1d": lambda: qs["m5_hist_1d"](spark, SF_DIR),
        "q_tpch_q1": lambda: qs["r2_tpch_q1"](spark, SF_DIR),
        "q_join_chain": lambda: qs["r3_join_chain"](spark, SF_DIR),
        "q_window_topk": lambda: qs["r6_rownum_topk"](spark, SF_DIR),
        "q_dedup": lambda: qs["r11_dedup_exact"](spark, SF_DIR),
        "q_text_profile": lambda: qs["x2_text_stats"](spark, SF_DIR),
        "q_cosine_topk": lambda: qs["x7_cosine_topk"](spark, SF_DIR),
        "q_asof_join": lambda: qs["r25_asof_join"](spark, SF_DIR),
        "q_merge_upsert": lambda: qs["r27_merge_upsert"](spark, SF_DIR),
        "q_bm25": lambda: qs["x42_bm25"](spark, SF_DIR),
        "q_resample": lambda: qs["x48_resample_interp"](spark, SF_DIR),
        "q_triangles": lambda: qs["x49_triangles"](spark, SF_DIR),
        "q_dup_spans": lambda: qs["x51_dup_spans"](spark, SF_DIR),
        "q_lm_score": lambda: qs["x53_lm_score"](spark, SF_DIR),
        "q_editdist_join": lambda: qs["x54_editdist_join"](spark, SF_DIR),
        "q_cf_grid": lambda: qs["m9_densify"](spark, SF_DIR),
    }

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    frames["q_minhash_sigs"] = lambda: ops_dedup.minhash_signatures(
        docs, "text", "doc_id"
    )
    frames["q_minhash_lsh"] = lambda: ops_dedup.minhash_lsh_pairs(
        signatures=ops_dedup.minhash_signatures(docs, "text", "doc_id"),
        threshold=0.5,
    )
    frames["q_screen"] = lambda: pii_scrub(
        gopher_quality(c4_clean(docs, min_sentences=1))
    )

    spec = AggregationSpec(
        lat_bounds=(-20.0, 20.0),
        lon_bounds=(0.0, 35.0),
        variables=(
            VariableSpec(name="ctp", bin_edges=(0.0, 300.0, 600.0, 900.0, 1100.0)),
            VariableSpec(name="cee", bin_edges=(0.0, 0.5, 1.0)),
            VariableSpec(name="cloud_fraction_CM", bin_edges=(0.0, 0.5, 1.0)),
        ),
        joint_hists=(JointHistSpec("ctp", "ctp_cee", "cee", (0.0, 0.5, 1.0)),),
    )
    px = spark.read.parquet(os.path.join(REPO, "fixtures", "pixels.parquet"))
    gr = spark.read.parquet(os.path.join(REPO, "fixtures", "granules.parquet"))
    frames["q_daily_grid_full"] = lambda: daily_grid(spark, spec, px, gr)
    return frames


def main() -> None:
    from modis_aggregation_spark import get_spark

    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("capture_plans")
    for name, build in bench_frames(spark).items():
        if only and name not in only:
            continue
        df = build()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
