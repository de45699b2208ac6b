"""SparkSession factory.

Local-mode defaults are tuned for the test harness (local[32], 128 GiB box);
on a real cluster every one of these is overridable via ``extra_conf`` or
spark-submit --conf. Shuffle partitions default to the local core count —
at 100 TB you'd raise this to ~2-4x the executor-core total (AQE coalesces
the excess at runtime, so over-provisioning is the safe direction).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "console-datagen-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    AQE is on: runtime partition coalescing + skew-join splitting are the
    first line of defense for the 100 TB target (skewed join keys get split
    without hand-salting; tiny shuffle partitions get merged).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{DEFAULT_CPUS}]")
    # local mode = single JVM: the driver heap is the only memory knob.
    # Empirically the JVM default outperforms large explicit heaps here
    # (big heaps triggered multi-x GC regressions on this box); set
    # SPARK_GRAFT_DRIVER_MEM to override when a workload truly needs it.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOT set here: adaptive.coalescePartitions.initialPartitionNum.
        # A wide initial shuffle (8x cores) is the right call when data
        # outgrows execution memory — the 100x scale probe sets it in
        # its own conf — but it is a DATA-PROPORTIONAL knob, not an
        # engine default: measured at sf0.1, iterative plans that
        # localCheckpoint per round (pagerank/LSS) materialize every
        # initial partition before AQE can coalesce, 3-4x'ing their
        # wall time (graph_pagerank_dups 5.1 s -> 14.9-21.7 s A/B'd in
        # one session). Deployments size it with the cluster/input, the
        # same way they size shuffle.partitions.
        #
        # collect_list/collect_set-class (TypedImperative) aggregates
        # run in ObjectHashAggregateExec, whose sort-based fallback
        # triggers at a default of 128 DISTINCT KEYS per task — a
        # per-doc/per-vector groupBy degenerates into a sort of the
        # whole task input at key #129. 256k keys of ~600 B buffers is
        # ~150 MB/task worst case — a real hash-agg bound, not a sort.
        # r12 A/B (suspected of the r11 pipeline_pack_sequences +61%):
        # interleaved 6x6 at sf0.1 in one warmed session gives median
        # 0.593 s at the 128 default vs 0.564 s at 262144 — this knob is
        # innocent (marginally FASTER on that query) and the regression
        # was ambient: r10/r11 driver spread maxima matched (0.589 vs
        # 0.594) while only the fast runs differed.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
                str(262_144))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if driver_mem:
        builder = builder.config("spark.driver.memory", driver_mem)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply the session-level settings the declared queries rely on.

    The driver harness passes us its own SparkSession; timestamps in the
    fixtures are naive (no zone), so all DATE/YEAR derivations must run
    under UTC to match the DuckDB oracle regardless of host timezone.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Current fixtures store ts as parquet timestamp[us] without the UTC
    # flag (Spark 4 reads TIMESTAMP_NTZ; catalog casts to TIMESTAMP under
    # this UTC session). Legacy fixture generations used TIMESTAMP(NANOS),
    # which Spark 4 refuses outright — keep nanosAsLong so those read as
    # raw longs and the catalog's ns→µs truncation branch (matching
    # DuckDB's TIMESTAMP_NS handling, FIXTURES.md D3) still fires.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # runtime-settable halves of get_spark's scale defaults, applied so
    # driver-owned sessions get them too (rationale in get_spark): argmax
    # aggregates must not degenerate into fanout sorts at 128 keys/task
    try:
        spark.conf.set(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            "262144",
        )
    except Exception:
        pass  # static-only in some builds; get_spark sessions already set it
    return spark
