"""Output compaction: size-aware repartitioning for writes.

Small-file explosion is the classic failure of large pipelines: a 1000-
task stage writing a partitioned table emits 1000 tiny files per
partition, and downstream scans drown in open() overhead. Compaction
estimates the frame's serialized size and coalesces/repartitions so each
output file lands near ``target_mb``.

Estimation order (cheapest first):
1. Catalyst's optimized-plan ``sizeInBytes`` statistic — free: it is
   derived from scan relation sizes (parquet footers) and per-operator
   selectivity, so no job runs at all. This is what a 100 TB write
   should use; an extra full input pass just to pick a file count is an
   unacceptable cost at that scale.
2. Sample fallback — only when the statistic is the "unknown" sentinel
   (Catalyst reports ``spark.sql.defaultSizeInBytes`` = Long.MaxValue-ish
   when it has no idea, e.g. plans over ``createDataFrame`` locals):
   bounded count + JSON-width sample, the old behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Catalyst returns spark.sql.defaultSizeInBytes for relations it cannot
# statist; treat anything in that magnitude class as "unknown" (the
# default is Long.MaxValue = 2^63-1; any real frame is far below 2^60)
_UNKNOWN_SIZE_FLOOR = 1 << 60


def plan_size_in_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes statistic for ``df``'s optimized plan.

    Returns None when the statistic is the unknown sentinel (or the
    internal API is unavailable) — callers fall back to sampling. Runs
    ZERO jobs: the number comes from file-scan metadata and operator
    estimates already held by the driver.
    """
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        raw = stats.sizeInBytes()
        # py4j converts scala.math.BigInt to a Python int when it fits;
        # very large sentinels can surface as a JavaObject — stringify then
        size = raw if isinstance(raw, int) else int(raw.toString())
    except Exception:
        return None
    if size <= 0 or size >= _UNKNOWN_SIZE_FLOOR:
        return None
    return size


def estimate_bytes(df: DataFrame, sample_rows: int = 1000) -> int:
    """Approximate in-memory bytes — plan statistic first, sample fallback."""
    stat = plan_size_in_bytes(df)
    if stat is not None:
        return stat
    n = df.count()
    if n == 0:
        return 0
    sample = df.limit(sample_rows)
    # serialized JSON length is a stable, schema-agnostic width proxy
    width = (
        sample.select(
            F.avg(F.length(F.to_json(F.struct(*df.columns)))).alias("w")
        ).first()["w"]
        or 0
    )
    return int(n * width)


def compact_for_write(
    df: DataFrame,
    target_mb: float = 128,
    compression_ratio: float = 0.3,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Repartition so each output file ends up near target_mb on disk.

    The plan statistic is already on-disk (parquet footer) bytes, so it
    maps to output size directly; only the in-memory sample estimate
    needs ``compression_ratio`` applied.
    """
    stat = plan_size_in_bytes(df)
    est = stat if stat is not None else estimate_bytes(df) * compression_ratio
    target_bytes = max(1, int(target_mb * 1024 * 1024))
    n_files = max(1, -(-int(est) // target_bytes))
    if partition_cols:
        # spread within each output partition value
        return df.repartition(n_files, *partition_cols)
    return df.repartition(n_files)


def compact_batch_store(
    spark,
    path: str,
    partition_col: str = "_batch",
    keep_last: int = 8,
    consolidated: int = -1,
    cluster_cols: list[str] | None = None,
) -> dict:
    """Fold a streaming ingest store's accumulated per-batch partitions
    into one consolidated partition — the maintenance job every
    append-per-micro-batch layout needs (streaming/dedup_stream.py
    writes one ``_batch=<id>`` directory per micro-batch; after 10^4
    batches the listing + footer overhead of 10^4 directories dominates
    every probe even when each holds a single file).

    Folds every ``partition_col`` value older than the newest
    ``keep_last`` batch ids into ``consolidated`` (merging with a prior
    consolidated partition) and deletes the folded directories. The
    newest ``keep_last`` are left alone because foreachBatch's
    at-least-once contract may replay them: a replayed batch overwrites
    its own partition (the idempotence recipe), which must not resurrect
    rows that were already folded. Only fold batches old enough that the
    stream's checkpoint has committed past them.

    ``cluster_cols``: extra partition columns of the store (e.g. the
    band index's ``bucket``); the consolidated write is repartitioned by
    them so each (cluster, consolidated) directory gets ONE file.

    Returns {"folded_batches": n, "rows": n} telemetry. The rewrite runs
    as one batch job between stream triggers — a deployment schedules it
    like any OPTIMIZE job, with the store offline to writers or fenced
    by a manifest swap.
    """
    import shutil

    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    batches = sorted(
        r[0] for r in df.select(partition_col).distinct().collect()
    )
    live = {b for b in batches if b != consolidated}
    fold = sorted(live)[: max(0, len(live) - keep_last)]
    if not fold:
        return {"folded_batches": 0, "rows": 0}
    old = df.where(F.col(partition_col).isin(fold + [consolidated]))
    merged = old.withColumn(partition_col, F.lit(consolidated))
    if cluster_cols:
        merged = merged.repartition(*[F.col(c) for c in cluster_cols])
    else:
        merged = merged.repartition(1)
    n_rows = merged.count()
    tmp = f"{path}__compact_tmp"
    part_cols = [*(cluster_cols or []), partition_col]
    merged.write.mode("overwrite").partitionBy(*part_cols).parquet(tmp)
    # swap: drop the folded (and old consolidated) dirs, move the new
    # consolidated partitions in. Directory layout is
    # [cluster=.../]partition_col=value, so walk the tmp tree.
    import os

    def _rel_partition_dirs(root: str) -> list[str]:
        out = []
        for dirpath, dirnames, filenames in os.walk(root):
            base = os.path.basename(dirpath)
            if base.startswith(f"{partition_col}="):
                out.append(os.path.relpath(dirpath, root))
                dirnames.clear()
        return out

    for rel in _rel_partition_dirs(path):
        val = rel.split(f"{partition_col}=")[-1]
        if val == str(consolidated) or any(
            val == str(b) for b in fold
        ):
            shutil.rmtree(os.path.join(path, rel), ignore_errors=True)
    for rel in _rel_partition_dirs(tmp):
        dst = os.path.join(path, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.move(os.path.join(tmp, rel), dst)
    shutil.rmtree(tmp, ignore_errors=True)
    return {"folded_batches": len(fold), "rows": n_rows}
