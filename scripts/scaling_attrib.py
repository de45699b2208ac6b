"""Scaling attribution for the heavy join/shuffle queries (VERDICT r14 #7).

At sf0.1, ~92% of the headline is bound by the per-query session floor
(scan/register + job scheduling), so the driver's 8-vs-32-core leg cannot
measure operator parallelism for the dedup/graph family. This probe runs
the heaviest documents/embeddings-only headline queries at a 10x corpus
(scale_probe's deterministic generators: 50k docs with the crawl-shaped
near-dup families, 20k embeddings) under local[32] and local[8] child
sessions, min-of-N each, and writes SCALING_r15.json with the ratios —
the artifact where the family's 8/32 ratio moves off ~1.0 if the
operators genuinely parallelize.

Usage:
  python scripts/scaling_attrib.py            # parent: materialize + run
  python scripts/scaling_attrib.py --child 32 /dir q1,q2   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALE = int(os.environ.get("SPARK_GRAFT_ATTRIB_SCALE", "10"))
RUNS = int(os.environ.get("SPARK_GRAFT_ATTRIB_RUNS", "2"))
DIR = f"/tmp/scale_probe/x{SCALE}"

QUERIES = [
    "dedup_minhash_pairs",
    "dedup_keepers_capped",
    "dedup_components_lss",
    "dedup_prefix_filter_pairs",
    "graph_pagerank_dups",
    "graph_triangles",
    "sample_split_leakage",
    "dedup_embedding",
    "dedup_semantic_kmeans",
    "text_perplexity_kn",
    "pipeline_select_compose",
    "pipeline_end_to_end",
    "sample_kcenter",
    "text_langid_ngram",
]


def child(cores: int, sf_dir: str, names: list[str]) -> None:
    from console_datagen_spark.caching import release_all_cache_slots
    from console_datagen_spark.plans import all_queries
    from console_datagen_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-attrib-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.driver.memory": "12g"},
    )
    registry = all_queries()
    # warm: JVM + parquet footers
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    out = {}
    for name in names:
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            registry[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
            release_all_cache_slots()
        out[name] = sorted(samples)
    print("CHILD_JSON:" + json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3], sys.argv[4].split(","))
        return
    if not os.path.exists(f"{DIR}/documents.parquet"):
        from console_datagen_spark.session import get_spark
        from scripts.scale_probe import materialize

        spark = get_spark(app_name="scaling-attrib-gen")
        materialize(spark, SCALE)
        spark.stop()
    results: dict = {"scale": SCALE, "base": "sf0.1 row counts", "runs": RUNS}
    for cores in (32, 8):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cores),
             DIR, ",".join(QUERIES)],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("CHILD_JSON:")]
        if not line:
            print(proc.stdout[-2000:], proc.stderr[-2000:])
            sys.exit(1)
        results[f"cores{cores}"] = json.loads(line[0][len("CHILD_JSON:"):])
    results["ratio_8_over_32"] = {
        q: round(results["cores8"][q][0] / results["cores32"][q][0], 2)
        for q in QUERIES
    }
    with open(os.path.join(REPO, "SCALING_r15.json"), "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(json.dumps(results["ratio_8_over_32"], indent=1))


if __name__ == "__main__":
    main()
