"""Clean-sentinel A/B for the two unattributed r13 bench regressions
(VERDICT r13 'Next round' #2): dedup_lsh_sampled (1.64 -> 4.36 s min,
TIGHT spread, untouched code) and dedup_components_lss (intra-run spread
7.3 -> 18.0 s). min-of-5 at sf0.1 with all three sentinels + /proc/loadavg
so the verdict's 'clean ambient' precondition is checkable in the output.

Usage: python scripts/ab_regressions.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
# time kept out: bench._run_once owns the timer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from console_datagen_spark.caching import release_all_cache_slots  # noqa: E402
from console_datagen_spark.plans import all_queries  # noqa: E402
from console_datagen_spark.session import get_spark  # noqa: E402

QUERIES = sys.argv[1:] or [
    "sim_topk_brute",  # control: stable r12->r13
    "dedup_lsh_sampled",
    "dedup_components_lss",
]
RUNS = 5


def _loadavg() -> list[float]:
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def main() -> None:
    spark = get_spark(
        app_name="ab-regressions",
        extra_conf={"spark.driver.memory": "8g"},
    )
    registry = all_queries()
    registry["q1_scan_count"].spark(spark, bench.SF_DIR).count()
    out: dict[str, object] = {"loadavg_start": _loadavg()}
    out["sentinel_codegen"] = [
        round(bench._run_sentinel(spark), 3) for _ in range(3)
    ]
    out["sentinel_shuffle"] = [
        round(bench._run_sentinel_shuffle(spark), 3) for _ in range(3)
    ]
    out["sentinel_write"] = [
        round(bench._run_sentinel_write(spark), 3) for _ in range(3)
    ]
    for name in QUERIES:
        samples = []
        for _ in range(RUNS):
            samples.append(round(bench._run_once(spark, registry, name), 3))
            release_all_cache_slots()
        out[name] = sorted(samples)
    out["loadavg_end"] = _loadavg()
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
