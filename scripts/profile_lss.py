"""Ad-hoc profiler for the dedup_components_lss 10x scale leg (r8 #1).

Generates the scale probe's corpora at the given scales, times the
registered query end-to-end, the upstream pair pipeline alone, and the
LSS kernel per round (operators.components_lss.last_lss_round_stats),
with REST shuffle metrics per phase. Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root: console_datagen_spark
sys.path.insert(0, _HERE)  # scripts/: makes scale_probe importable even
# when this file is loaded as a module (python auto-prepends the script
# dir only under `python scripts/profile_lss.py`)

import scale_probe as SP  # noqa: E402


def main() -> int:
    from console_datagen_spark.operators.components_lss import (
        dup_components_lss,
        last_lss_round_stats,
    )
    from console_datagen_spark.plans.scale_extras import _minhash_pairs
    from console_datagen_spark.session import get_spark

    scales = [int(x) for x in (sys.argv[1:] or ["3", "10"])]
    spark = get_spark(
        app_name="lss-profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "50000",
            "spark.driver.memory": "16g",
        },
    )
    m = SP.Meter(spark)
    out = {}
    # warm-up at the smallest scale (discarded)
    warm = SP.materialize(spark, scales[0])
    dup_components_lss(_minhash_pairs(spark, warm)).write.format(
        "noop"
    ).mode("overwrite").save()
    for s in scales:
        sf_dir = SP.materialize(spark, s)
        rec = {}
        t, sh, n = m.run(lambda: _minhash_pairs(spark, sf_dir).count())
        rec["pairs_only"] = {"sec": t, "n_pairs": n, **sh}

        def _full():
            labels = dup_components_lss(_minhash_pairs(spark, sf_dir))
            labels.write.format("noop").mode("overwrite").save()

        t, sh, _ = m.run(_full)
        rec["full_query"] = {"sec": t, **sh}
        rec["rounds"] = last_lss_round_stats()
        out[f"x{s}"] = rec
        print(json.dumps({f"x{s}": rec}), flush=True)
    print("===FINAL===")
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
