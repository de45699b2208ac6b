"""Focused optimization profiler: time + capture plans for named queries.

Usage:  python scripts/opt_profile.py [--runs N] [--tag TAG] [--sf DIR]
                                      [--no-plan] name [name ...]

For each named headline/registry query: run bench._run_once min-of-N
(noop sink, cold cache per run — the bench methodology exactly), and
write ``plans/r14/<name>_<tag>.txt`` with the .explain("formatted")
output. Prints one JSON line with per-query [min, median, max] plus the
three ambient sentinels so every A/B carries its own ambient evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from console_datagen_spark.caching import release_all_cache_slots  # noqa: E402
from console_datagen_spark.plans import all_queries  # noqa: E402
from console_datagen_spark.session import get_spark  # noqa: E402

PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "plans", "r15")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default=None, help="suffix for the plan file")
    ap.add_argument("--sf", default=None)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--no-sentinel", action="store_true")
    args = ap.parse_args()
    if args.sf:
        bench.SF_DIR = args.sf

    spark = get_spark(
        app_name="opt-profile",
        extra_conf={"spark.driver.memory": os.environ.get(
            "SPARK_GRAFT_BENCH_DRIVER_MEM", "8g")},
    )
    registry = all_queries()
    registry["q1_scan_count"].spark(spark, bench.SF_DIR).count()  # warm
    if any(n == "ivfpq_index_probe" for n in args.names):
        bench._prepare_ivfpq_index(spark)
    if any(n == "layout_pruned_read" for n in args.names):
        bench._prepare_curve_store(spark)

    out: dict = {"sf_dir": bench.SF_DIR, "box_start": bench._box_snapshot()}
    if not args.no_sentinel:
        # min-of-3 like bench.py — a single cold run measures JIT/worker
        # startup, not ambient (first profile run read 2.6x high)
        out["sentinel_codegen"] = round(
            min(bench._run_sentinel(spark) for _ in range(3)), 3)
        out["sentinel_shuffle"] = round(
            min(bench._run_sentinel_shuffle(spark) for _ in range(3)), 3)
        out["sentinel_write"] = round(
            min(bench._run_sentinel_write(spark) for _ in range(3)), 3)

    for name in args.names:
        spark.sparkContext.setJobDescription(f"opt-profile: {name}")
        samples = []
        for _ in range(args.runs):
            samples.append(round(bench._run_once(spark, registry, name), 3))
            release_all_cache_slots()
        out[name] = sorted(samples)
        if not args.no_plan and name not in bench.SPECIAL:
            os.makedirs(PLANS_DIR, exist_ok=True)
            df = registry[name].spark(spark, bench.SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            suffix = f"_{args.tag}" if args.tag else ""
            with open(os.path.join(PLANS_DIR, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)
            release_all_cache_slots()
        spark.sparkContext.setJobDescription(None)

    out["box_end"] = bench._box_snapshot()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
