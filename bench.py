"""Benchmark harness — prints ONE JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], timing each with a
full-materialization action (noop write — computes everything, sinks
nothing). Proxy-baseline metrics per BASELINE.md:

* q_m2_stats      — full per-cell statistics over the pixel fixture (M2)
* q_cf_grid       — end-to-end daily cloud-fraction grid incl. parquet sink
* q_tpch_q1       — R2 grouped aggregation on lineitem
* q_join_chain    — R3 broadcast join chain
* q_window_topk   — R6 row_number top-3 per customer
* q_hist_1d       — M5 per-cell histogram
* q_dedup         — R11 windowed exact dedup on events
* q_asof_join     — R25 as-of join (union-marker window rewrite) on events
* q_merge_upsert  — R27 MERGE snapshot rewrite on orders
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    import __spark_entry__ as entry
    from modis_aggregation_spark import get_spark

    spark = get_spark("bench")
    qs = entry.queries()

    bench_queries = {
        "q_m2_stats": qs["m2_cell_stats"],
        "q_hist_1d": qs["m5_hist_1d"],
        "q_tpch_q1": qs["r2_tpch_q1"],
        "q_join_chain": qs["r3_join_chain"],
        "q_window_topk": qs["r6_rownum_topk"],
        "q_dedup": qs["r11_dedup_exact"],
        "q_text_profile": qs["x2_text_stats"],
        "q_cosine_topk": qs["x7_cosine_topk"],
        "q_asof_join": qs["r25_asof_join"],
        "q_merge_upsert": qs["r27_merge_upsert"],
        "q_bm25": qs["x42_bm25"],
        "q_resample": qs["x48_resample_interp"],
        "q_triangles": qs["x49_triangles"],
        "q_dup_spans": qs["x51_dup_spans"],
        "q_lm_score": qs["x53_lm_score"],
        "q_editdist_join": qs["x54_editdist_join"],
        # round 8: the tokenizer-train family (x70/x77/x90) is the
        # heaviest operator group in the repo and was previously
        # invisible to the driver bench; WordPiece is the newest and
        # slowest of the three (8 iterative merge rounds, two skinny
        # aggs + a 1-row argmax collect per round)
        "q_tokenizer_train": qs["x90_wordpiece_train"],
    }

    # JVM/codegen warmup on a trivial plan
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # fixed no-op calibration slot (round-10 VERDICT item 8): a
    # data-independent, code-independent pure-JVM codegen loop whose
    # only variable is the host — future rounds normalize tenancy
    # multipliers against this instead of re-litigating bench noise
    # with worktree A/Bs.  Reported OUTSIDE queries/total so historic
    # totals stay comparable.
    calib = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(256_000_000, numPartitions=32).selectExpr(
            "sum(xxhash64(id) % 1000003)"  # bounded: no ANSI long overflow
        ).collect()
        calib = min(calib, time.perf_counter() - t0)
    calibration_sec = round(calib, 3)

    timings: dict[str, float] = {}
    for name, fn in bench_queries.items():
        best = float("inf")
        for _ in range(3):  # best-of-3: shed JIT/GC + VM-steal noise on tiny inputs
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # MinHash LSH in its bulk-pipeline shape: the signatures table is the
    # reusable corpus artifact — built and materialized ONCE (timed as
    # q_minhash_sigs), then the banded join + verification runs over the
    # cached table (q_minhash_lsh). Round 1 timed both fused, which
    # re-shingled the corpus inside the pair plan.
    from modis_aggregation_spark.operators import dedup as ops_dedup

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    sigs = ops_dedup.minhash_signatures(docs, "text", "doc_id").persist()
    t0 = time.perf_counter()
    sigs.count()
    timings["q_minhash_sigs"] = round(time.perf_counter() - t0, 3)
    best = float("inf")
    for _ in range(3):  # best-of-3 (round 7): r6 showed 4-7% no-change drift at best-of-2
        t0 = time.perf_counter()
        ops_dedup.minhash_lsh_pairs(signatures=sigs, threshold=0.5).write.format(
            "noop"
        ).mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    timings["q_minhash_lsh"] = round(best, 3)
    sigs.unpersist()

    # one-pass corpus quality screen (C4 line rules + Gopher battery +
    # staged PII scrub) — the map-only narrow stage of the curation family
    from modis_aggregation_spark.functions.text import (
        c4_clean,
        gopher_quality,
        pii_scrub,
    )

    best = float("inf")
    for _ in range(3):  # best-of-3 (round 7): r6 showed 4-7% no-change drift at best-of-2
        t0 = time.perf_counter()
        pii_scrub(gopher_quality(c4_clean(docs, min_sentences=1))).write.format(
            "noop"
        ).mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    timings["q_screen"] = round(best, 3)

    # end-to-end CF grid including a real parquet sink
    out = tempfile.mkdtemp(prefix="bench_cf_")
    try:
        best = float("inf")
        for _ in range(3):  # best-of-3 (round 7): r6 showed 4-7% no-change drift at best-of-2
            t0 = time.perf_counter()
            qs["m9_densify"](spark, SF_DIR).write.mode("overwrite").parquet(out)
            best = min(best, time.perf_counter() - t0)
        timings["q_cf_grid"] = round(best, 3)
    finally:
        shutil.rmtree(out, ignore_errors=True)

    # flagship: the fused daily_grid plan (all stats + histograms + joint
    # hist + CF + grid counts, densified) over the pixel fixture
    from modis_aggregation_spark.config import (
        AggregationSpec,
        JointHistSpec,
        VariableSpec,
    )
    from modis_aggregation_spark.plans.pipeline import daily_grid

    spec = AggregationSpec(
        lat_bounds=(-20.0, 20.0),
        lon_bounds=(0.0, 35.0),
        variables=(
            VariableSpec(name="ctp", bin_edges=(0.0, 300.0, 600.0, 900.0, 1100.0)),
            VariableSpec(name="cee", bin_edges=(0.0, 0.5, 1.0)),
            VariableSpec(name="cloud_fraction_CM", bin_edges=(0.0, 0.5, 1.0)),
        ),
        joint_hists=(
            JointHistSpec("ctp", "ctp_cee", "cee", (0.0, 0.5, 1.0)),
        ),
    )
    repo = os.path.dirname(os.path.abspath(__file__))
    px = spark.read.parquet(os.path.join(repo, "fixtures", "pixels.parquet"))
    gr = spark.read.parquet(os.path.join(repo, "fixtures", "granules.parquet"))
    best = float("inf")
    for _ in range(3):  # best-of-3 (round 7): r6 showed 4-7% no-change drift at best-of-2
        t0 = time.perf_counter()
        daily_grid(spark, spec, px, gr).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    timings["q_daily_grid_full"] = round(best, 3)

    total = round(sum(timings.values()), 3)
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "bench_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "calibration_sec": calibration_sec,
                "sf": _sf(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
