"""On-disk curve-clustered layout with a min/max manifest — the real
data-skipping loop.

``layout_zorder`` / ``layout_hilbert_ab`` certify the layout *decision*
logically; this module makes it physical, the way a Delta/Iceberg
``OPTIMIZE ZORDER`` deployment works:

1. ``write_curve_layout``: bucket every row by the top bits of a
   space-filling-curve value (caller supplies the curve column — Morton
   via ``plans/layout._morton_sql`` or Hilbert via the unrolled fold),
   write parquet ``partitionBy(bucket)`` so each bucket is its own
   directory, and write a tiny **manifest** parquet next to it:
   per-bucket row count + min/max envelope of every clustered dimension.
   The manifest is the file-skipping metadata layer (what Delta keeps in
   the transaction log, Iceberg in manifest files). The manifest is
   derived FROM THE WRITTEN FILES (``spark.read.parquet(path)``), not by
   re-evaluating the input plan — so a nondeterministic or shifting
   upstream can never produce envelopes that disagree with the parquet
   on disk, and the (possibly expensive) upstream pipeline runs exactly
   once.
2. ``pruned_read``: evaluate a conjunctive range predicate against the
   manifest and read ONLY the surviving buckets. Two modes:
   - default: a driver-side manifest read (B rows, B = bucket count)
     derives the bucket list and the ``bucket IN (...)`` filter lands in
     the scan's PartitionFilters, so pruned directories are never opened.
   - ``broadcast_manifest=True``: the surviving buckets stay a DataFrame
     joined to the scan (broadcast left-semi on the partition column), so
     nothing is collected to the driver and Spark's dynamic partition
     pruning skips the pruned directories at runtime — the mode to use
     when B is 10^6+ manifest rows.
   min/max envelope semantics guarantee no false negatives (a bucket
   whose envelope misses the predicate cannot hold a matching row), so
   pruned-read == full-scan-filter exactly in both modes — asserted in
   tests/test_layout_store.py.

At 100 TB the manifest stays tiny (one row per bucket) and scan cost
drops by the measured skipping factor of the layout (7.6-7.9x for the
bench predicate — see layout_hilbert_ab).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

MANIFEST_DIR = "_manifest"
# 0-row parquet carrying the DATA schema (incl. the bucket column):
# Spark's file listing hides _-prefixed dirs, so a store whose every
# bucket is empty has no schema source — reads of an empty store would
# throw UNABLE_TO_INFER_SCHEMA without this marker.
SCHEMA_DIR = "_schema"


def _write_schema_marker(spark: SparkSession, path: str, schema) -> None:
    spark.createDataFrame([], schema).repartition(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/{SCHEMA_DIR}")


def write_curve_layout(
    df: DataFrame,
    path: str,
    curve: Column,
    dims: list[str],
    n_buckets: int = 32,
    curve_bits: int = 32,
    manifest_mode: str = "footer",
    direct_threshold: int | None = 50_000,
) -> None:
    """Cluster ``df`` into ``n_buckets`` directories by the top bits of
    ``curve`` and write the per-bucket min/max manifest over ``dims``.

    One action for the data (partitionBy write); the manifest then
    derives FROM THE WRITTEN FILES — never by re-evaluating the input
    plan — so a nondeterministic upstream can never produce envelopes
    that disagree with the parquet on disk. The bucket width is the CEIL
    division of the curve's 2^curve_bits domain so the max curve value
    lands in bucket n_buckets-1, and the bucket id is true integer
    division (SQL ``DIV``), exact for any ``curve_bits``.

    Write-task shape (r8 verdict #3): buckets are RANGE-batched into
    ~defaultParallelism write tasks (``bucket DIV batch``), so #tasks is
    the cluster's task budget, never #buckets — each task writes a
    contiguous run of bucket directories and every bucket still lands in
    exactly one task => one file per bucket at ANY bucket count.

    ``manifest_mode="footer"`` (default) aggregates the parquet FOOTER
    statistics of the written files (distributed pyarrow metadata reads
    via mapInPandas — no data pages touched), the Iceberg-manifest shape:
    measured 2x faster than the scan mode at 10^4 buckets and linear in
    file count with a tiny constant. Parquet min/max stats are exact for
    the integer/float dims this store clusters; the kernel raises loudly
    if a file lacks stats. ``manifest_mode="scan"`` keeps the column-
    pruned data read (the right mode for dim types without reliable
    footer stats, e.g. legacy binary).

    REGIME ROUTING (r13, closes the red 10^4->10^5 write-ratio gate at
    its owner): at ``n_buckets >= direct_threshold`` the store is
    metadata-bound — Spark's dynamic-partition committer pays a
    ~50 ms-class per-file constant (temp file + rename + job-commit
    walk) that scales WITH BUCKET COUNT, not data volume (remeasured
    under a near-clean 1.6 s write sentinel: 446-635 s at 10^5 buckets
    / 2 M rows, i.e. >= 12.9x the 10^4 cost for 10x the buckets — a
    real superlinearity, not ambient). Those writes delegate to
    :func:`write_curve_layout_direct` (per-task pyarrow files + in-pass
    manifest — same directory layout, manifest and schema-marker
    contract, parity pinned file-for-file in tests/test_layout_store):
    17.4 s at the same leg. Pass ``direct_threshold=None`` to force the
    generic writer (e.g. for the footer-stats manifest as an
    independent verification pass); the DATA-bound regime (few buckets,
    GBs each) stays on the built-in writer, which streams with one open
    file and can spill.
    """
    if direct_threshold is not None and n_buckets >= direct_threshold:
        # ADVICE r13: the direct writer produces its manifest in-pass
        # (no footer/scan distinction), so a caller pinning a specific
        # manifest_mode must not be silently re-routed onto a different
        # manifest-production strategy — make them choose explicitly.
        if manifest_mode != "footer":
            raise ValueError(
                f"manifest_mode={manifest_mode!r} is not available in the "
                f"direct-writer regime (n_buckets={n_buckets} >= "
                f"direct_threshold={direct_threshold}); pass "
                "direct_threshold=None to keep the generic writer"
            )
        write_curve_layout_direct(
            df, path, curve=curve, dims=dims,
            n_buckets=n_buckets, curve_bits=curve_bits,
        )
        return
    domain = 1 << curve_bits
    width = -(-domain // n_buckets)
    clustered = (
        df.withColumn("_curve", curve.cast("long"))
        .withColumn("bucket", F.expr(f"_curve DIV CAST({width} AS BIGINT)"))
        .drop("_curve")
    )
    # shuffle by RANGE-batched bucket groups BEFORE the partitionBy
    # write: unshuffled, every write task emits a file into every bucket
    # directory it sees — writers x buckets files (~320k files measured
    # at 10^4 buckets / 32 tasks). Hash-by-bucket fixed that but left
    # #tasks pinned to spark.sql.shuffle.partitions with buckets strewn
    # randomly across tasks; range batching keeps each task writing a
    # contiguous bucket run (one open parquet writer at a time under the
    # dynamic-partition sort) — measured 23.6 -> 17.4 s at 10^4 buckets.
    spark = df.sparkSession
    n_tasks = max(spark.sparkContext.defaultParallelism, 1)
    batch = max(1, -(-n_buckets // n_tasks))
    clustered = clustered.repartition(
        n_tasks, F.expr(f"bucket DIV CAST({batch} AS BIGINT)")
    )
    clustered.write.mode("overwrite").partitionBy("bucket").parquet(path)
    if manifest_mode == "footer":
        manifest = _footer_stats_manifest(spark, path, clustered.schema, dims)
    else:
        # read back with the known schema: an empty input writes zero
        # data files and schema inference would throw
        # UNABLE_TO_INFER_SCHEMA; the explicit schema makes the empty
        # store (and its empty manifest) valid
        written = spark.read.schema(clustered.schema).parquet(path)
        manifest = written.groupBy(
            F.col("bucket").cast("long").alias("bucket")
        ).agg(
            F.count("*").alias("n_rows"),
            *[
                agg
                for d in dims
                for agg in (F.min(d).alias(f"min_{d}"), F.max(d).alias(f"max_{d}"))
            ],
        )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/{MANIFEST_DIR}")
    _write_schema_marker(spark, path, clustered.schema)


def _footer_stats_manifest(spark, path: str, schema, dims: list[str]) -> DataFrame:
    """Per-bucket manifest from parquet FOOTER statistics: list the data
    files, fan the paths out, and read only footers (pyarrow metadata)
    in an Arrow-batched kernel — row counts and min/max envelopes without
    touching a single data page.

    The listing is a driver-side walk (what any parquet scan's driver
    does); a deployment with a transactional store (Delta/Iceberg) would
    instead collect these stats at commit time from the writer — this
    function is that commit step for a plain-parquet store. min/max per
    row group come straight from the footer and are exact for the
    integer dims used here; the kernel raises if a footer lacks stats
    rather than emitting a wrong envelope.
    """
    import os

    files = []
    for root, dirs, fs in os.walk(path):
        # prune by exact component name, never substring: a parent path
        # that happens to CONTAIN "_manifest" (e.g. a pytest tmp dir
        # named after a test) must not suppress the whole walk
        dirs[:] = [d for d in dirs if d not in (MANIFEST_DIR, SCHEMA_DIR)]
        files.extend(
            os.path.join(root, f) for f in fs if f.endswith(".parquet")
        )
    dim_types = {f.name: f.dataType.simpleString() for f in schema.fields}
    out_schema = "bucket bigint, n_rows bigint, " + ", ".join(
        f"min_{d} {dim_types[d]}, max_{d} {dim_types[d]}" for d in dims
    )
    empty = spark.createDataFrame([], out_schema)
    if not files:
        return empty

    def kernel(batches):
        import re

        import pandas as pd
        import pyarrow.parquet as pq

        cols = ["bucket", "n_rows"] + [
            c for d in dims for c in (f"min_{d}", f"max_{d}")
        ]
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                names = [md.schema.column(i).name for i in range(md.num_columns)]
                # LAST match: a store rooted at a path that itself
                # contains 'bucket=' must not key the envelope to the
                # root's number (same hazard _manifest's os.walk guards)
                rec = {
                    "bucket": int(re.findall(r"bucket=(-?\d+)", p)[-1]),
                    "n_rows": md.num_rows,
                }
                for d in dims:
                    ci = names.index(d)
                    mns, mxs = [], []
                    for g in range(md.num_row_groups):
                        st = md.row_group(g).column(ci).statistics
                        if st is None or not st.has_min_max:
                            raise ValueError(
                                f"no footer min/max for {d} in {p}; "
                                "use manifest_mode='scan'"
                            )
                        mns.append(st.min)
                        mxs.append(st.max)
                    rec[f"min_{d}"] = min(mns)
                    rec[f"max_{d}"] = max(mxs)
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    n_tasks = max(spark.sparkContext.defaultParallelism * 2, 1)
    paths = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(min(n_tasks, len(files)))
    stats = paths.mapInPandas(kernel, schema=out_schema)
    # one file per bucket is the normal layout, but appends/multi-file
    # buckets still merge correctly through this agg
    return stats.groupBy("bucket").agg(
        F.sum("n_rows").alias("n_rows"),
        *[
            a
            for d in dims
            for a in (
                F.min(f"min_{d}").alias(f"min_{d}"),
                F.max(f"max_{d}").alias(f"max_{d}"),
            )
        ],
    )


def write_curve_layout_direct(
    df: DataFrame,
    path: str,
    curve: Column,
    dims: list[str],
    n_buckets: int = 32,
    curve_bits: int = 32,
) -> None:
    """Direct-writer variant of ``write_curve_layout`` for the
    MANY-TINY-BUCKETS regime (10^5-10^6+ buckets, a few KB each).

    Spark's dynamic-partition writer pays a per-file constant that
    dominates when files are tiny: parquet writer open/close plus the
    committer's temp-file + rename per bucket — measured ~51 ms of
    task-thread time per file at 10^5 buckets (160 s data write for 2 M
    rows). This writer replaces that generic path with what a
    purpose-built store writer (Delta/Iceberg-style) does: each task
    writes its buckets' parquet files DIRECTLY to their final
    ``bucket=N/`` directories via pyarrow (no temp, no rename, no
    job-commit walk) and emits the per-bucket manifest row from the same
    in-hand data — write + manifest in ONE pass, no footer re-read.
    Measured (local[32], BENCH_scale layout_direct): 10^5 buckets / 2 M
    rows in 17.4 s (vs 166 s for the generic writer) and 10^6 buckets /
    4 M rows in 121 s — vs ~40 min projected for the generic writer,
    whose 10^4->10^5 curve was already only barely sublinear. Task retry
    is idempotent (deterministic file names + contents), and each attempt
    writes a per-attempt temp file then os.replace()s it into place —
    atomic on POSIX — so concurrent attempts (speculative execution, a
    zombie task racing its retry) can never interleave bytes in a final
    file. A KILLED attempt's stranded dot-prefixed
    ``.part-*.attempt-N.tmp`` (readers skip dot-files, so correctness
    is never affected) is reclaimed at two points: the overwrite's
    rmtree sweeps the whole store at write start, and each attempt
    sweeps OLDER attempts' tmps from every bucket it writes — a retry
    deterministically rewrites its predecessor's buckets, so a
    completed job strands nothing (only a job-level abort can, and that
    store is incomplete until its next overwrite anyway). Deleting an
    in-flight lower-id twin's tmp (speculation) at worst fails that
    twin's os.replace — the winning attempt has already installed
    byte-identical contents; on a cluster
    the path must be a shared POSIX filesystem, or swap the pq.write_table
    call for one with an fsspec filesystem for object storage.

    Read the 10^6-bucket store with ``pruned_read(...,
    paths_from_manifest=True)``: the full-listing modes make the driver
    walk every bucket directory (wedged >20 min at 10^6 in measurement);
    the manifest-planned scan lists only survivors (8.4 s incl. the
    manifest read, 3.8k of 10^6 dirs).

    Memory shape: each task buffers its partition in pandas to group by
    bucket, so this mode is for metadata-bound stores where a task's
    bucket range is small (tiny buckets by definition). For the
    DATA-bound regime (few buckets, GBs each) keep ``write_curve_layout``:
    the built-in writer streams with one open file and can spill.

    The written files carry normal parquet footer stats, so
    ``_footer_stats_manifest`` remains usable as an independent
    verification pass; ``pruned_read`` works unchanged (hive-style
    ``bucket=N`` partition discovery, data files do not contain the
    partition column)."""
    import os
    import shutil

    spark = df.sparkSession
    domain = 1 << curve_bits
    width = -(-domain // n_buckets)
    clustered = (
        df.withColumn("_curve", curve.cast("long"))
        .withColumn("bucket", F.expr(f"_curve DIV CAST({width} AS BIGINT)"))
        .drop("_curve")
    )
    n_tasks = max(spark.sparkContext.defaultParallelism, 1)
    batch = max(1, -(-n_buckets // n_tasks))
    clustered = clustered.repartition(
        n_tasks, F.expr(f"bucket DIV CAST({batch} AS BIGINT)")
    )
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    schema = clustered.schema
    dim_types = {f.name: f.dataType.simpleString() for f in schema.fields}
    manifest_schema = "bucket bigint, n_rows bigint, " + ", ".join(
        f"min_{d} {dim_types[d]}, max_{d} {dim_types[d]}" for d in dims
    )

    def kernel(batches):
        import os

        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        # ONE pandas->Arrow conversion per task, then zero-copy slices
        # per bucket: a per-group from_pandas costs ~10 ms even for a
        # 20-row frame and dominated the first cut of this writer.
        pdf = pdf.sort_values("bucket", kind="stable", ignore_index=True)
        buckets = pdf["bucket"].to_numpy()
        table = pa.Table.from_pandas(
            pdf.drop(columns=["bucket"]), preserve_index=False
        )
        uniq, starts = np.unique(buckets, return_index=True)
        ends = np.append(starts[1:], len(buckets))
        # vectorized per-bucket envelopes (one groupby, not B aggs)
        env = pdf.groupby("bucket", sort=True)[list(dims)].agg(["min", "max"])
        # Concurrent attempts (speculation / a zombie task racing its
        # retry) must never interleave bytes in a final file: write to a
        # per-attempt temp name, then os.replace (atomic on POSIX) —
        # the last complete attempt wins with identical deterministic
        # contents.
        from pyspark import TaskContext

        tc = TaskContext.get()
        attempt = tc.taskAttemptId() if tc is not None else 0
        rows = []
        for b, s, e in zip(uniq, starts, ends):
            d = f"{path}/bucket={int(b)}"
            os.makedirs(d, exist_ok=True)
            # sweep tmps stranded by OLDER attempts of this bucket's
            # task (a kill between write_table and os.replace): attempt
            # ids are globally monotone, so anything below ours is a
            # predecessor — never a live speculative twin we'd race
            # (deleting one anyway only fails its replace; contents are
            # byte-identical).
            for stale in os.listdir(d):
                if stale.startswith(".part-") and stale.endswith(".tmp"):
                    try:
                        sid = int(stale.rsplit("attempt-", 1)[1][:-4])
                    except (IndexError, ValueError):
                        sid = -1
                    if sid < attempt:
                        try:
                            os.remove(os.path.join(d, stale))
                        except FileNotFoundError:
                            pass
            tmp = f"{d}/.part-00000.parquet.attempt-{attempt}.tmp"
            pq.write_table(table.slice(s, e - s), tmp)
            os.replace(tmp, f"{d}/part-00000.parquet")
            rec = {"bucket": int(b), "n_rows": int(e - s)}
            for dim in dims:
                rec[f"min_{dim}"] = env.loc[b, (dim, "min")]
                rec[f"max_{dim}"] = env.loc[b, (dim, "max")]
            rows.append(rec)
        yield pd.DataFrame(rows)

    manifest = clustered.mapInPandas(kernel, schema=manifest_schema)
    # repartition(1), NOT coalesce(1): coalesce collapses the UPSTREAM
    # kernel to a single task (the whole store written on one thread —
    # measured 172 s vs 13 s at 10^5 buckets); repartition inserts a
    # shuffle so the kernel keeps full parallelism and only the tiny
    # manifest rows funnel into the single writer task.
    manifest.repartition(1).write.mode("overwrite").parquet(
        f"{path}/{MANIFEST_DIR}"
    )
    _write_schema_marker(spark, path, schema)


def _survivor_filter(ranges: dict[str, tuple[int, int]]) -> Column:
    """Envelope test: NOT (max < lo OR min > hi) per dimension; a
    surviving bucket MAY hold matches, a pruned one CANNOT (no false
    negatives)."""
    cond = F.lit(True)
    for d, (lo, hi) in ranges.items():
        cond = cond & (F.col(f"max_{d}") >= lo) & (F.col(f"min_{d}") <= hi)
    return cond


def candidate_buckets(
    spark: SparkSession, path: str, ranges: dict[str, tuple[int, int]]
) -> list[int]:
    """Buckets whose min/max envelope intersects every (lo, hi) range —
    driver-side: the manifest is one row per bucket. For huge manifests
    prefer ``pruned_read(..., broadcast_manifest=True)``, which never
    materializes this list."""
    m = spark.read.parquet(f"{path}/{MANIFEST_DIR}")
    return sorted(
        r.bucket for r in m.where(_survivor_filter(ranges)).select("bucket").collect()
    )


def pruned_read(
    spark: SparkSession,
    path: str,
    ranges: dict[str, tuple[int, int]],
    broadcast_manifest: bool = False,
    paths_from_manifest: bool = False,
) -> DataFrame:
    """Read only manifest-surviving buckets, then apply the exact
    predicate.

    Default mode collects the survivor list (O(buckets) driver memory)
    so the ``bucket IN (...)`` filter prunes partition directories at
    plan time. ``broadcast_manifest=True`` instead broadcast-left-semi
    joins the survivors to the scan on the partition column — dynamic
    partition pruning skips the pruned directories at runtime with zero
    driver-side materialization.

    BOTH of those still make Spark's file index LIST the whole store
    (partition discovery walks every ``bucket=N`` directory before any
    pruning applies) — measured as the wall at 10^6 buckets, where the
    single-threaded driver listing of ~10^6 directories wedges for tens
    of minutes. ``paths_from_manifest=True`` is the 10^6+ mode: the scan
    is CONSTRUCTED from the manifest's surviving bucket list (explicit
    ``bucket=N`` paths + ``basePath``), so the driver lists only the
    surviving directories — O(survivors), not O(buckets). This is
    exactly how a table format reads at scale: Iceberg/Delta never list
    the store, they plan files straight from manifest metadata."""
    if paths_from_manifest:
        cands = candidate_buckets(spark, path, ranges)
        if not cands:
            # zero survivors: plan a limit(0) over ONE manifest-known
            # bucket (never list the store). A store with NO buckets at
            # all has no data file to infer a schema from (Spark hides
            # the _-prefixed dirs), so the writers leave a 0-row
            # _schema marker parquet exactly for this case.
            m = spark.read.parquet(f"{path}/{MANIFEST_DIR}").select("bucket")
            first = m.limit(1).collect()
            if not first:
                # the marker carries `bucket` as a BIGINT data column,
                # but the normal branch infers it from the bucket=N dirs
                # as INT — cast so BOTH branches return one schema and
                # unions over empty/non-empty stores line up.
                df = (
                    spark.read.parquet(f"{path}/{SCHEMA_DIR}")
                    .withColumn("bucket", F.col("bucket").cast("int"))
                    .limit(0)
                )
                for d, (lo, hi) in ranges.items():
                    df = df.where(F.col(d).between(lo, hi))
                return df
            cands, limit0 = [first[0].bucket], True
        else:
            limit0 = False
        df = spark.read.option("basePath", path).parquet(
            *[f"{path}/bucket={b}" for b in cands]
        )
        if limit0:
            df = df.limit(0)
        for d, (lo, hi) in ranges.items():
            df = df.where(F.col(d).between(lo, hi))
        return df
    df = spark.read.parquet(path)
    if broadcast_manifest:
        surv = (
            spark.read.parquet(f"{path}/{MANIFEST_DIR}")
            .where(_survivor_filter(ranges))
            .select(F.col("bucket").cast(dict(df.dtypes)["bucket"]).alias("bucket"))
        )
        df = df.join(F.broadcast(surv), "bucket", "left_semi")
    else:
        cands = candidate_buckets(spark, path, ranges)
        df = df.where(F.col("bucket").isin(cands))
    for d, (lo, hi) in ranges.items():
        df = df.where(F.col(d).between(lo, hi))
    return df
