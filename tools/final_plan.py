"""Execute a bench slot with the noop sink and print the FINAL adaptive
plan (post-AQE, with ReusedExchange/ReusedSubquery visible) plus wall time.

Usage: python tools/final_plan.py <slot> [repeats]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# tools/ on the path BEFORE the sibling import (ADVICE r12: the import
# used to precede this insert and only worked because `python
# tools/final_plan.py` auto-prepends the script dir — -m or an import
# from elsewhere broke)
sys.path.insert(0, os.path.join(REPO, "tools"))

from capture_plans import bench_frames  # noqa: E402


def main() -> None:
    from modis_aggregation_spark import get_spark

    slot = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("final_plan")
    frames = bench_frames(spark)
    build = frames[slot]

    spark.range(1_000_000).selectExpr("sum(id)").collect()

    best = float("inf")
    df = None
    for _ in range(repeats):
        # build INSIDE the timed region, exactly as bench.py times fn():
        # eager localCheckpoints inside query builders are part of the cost
        t0 = time.perf_counter()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"=== {slot}: best-of-{repeats} {best:.3f}s ===")
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    print(plan[:20000])
    spark.stop()


if __name__ == "__main__":
    main()
