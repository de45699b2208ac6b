"""On-disk curve layout + manifest pruning: pruned read == full filter,
and the bucket filter lands in PartitionFilters."""

from __future__ import annotations

from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views
from console_datagen_spark.operators.layout_store import (
    candidate_buckets,
    pruned_read,
    write_curve_layout,
)
from console_datagen_spark.plans.layout import _morton_sql

RANGES = {"ok16": (4096, 8191), "pk16": (4096, 8191)}


def _scaled(spark, sf_dir):
    li = register_views(spark, sf_dir, ("lineitem",))["lineitem"]
    ext = li.agg(
        (F.max("l_orderkey") + 1).alias("mok"), (F.max("l_partkey") + 1).alias("mpk")
    )
    return li.crossJoin(F.broadcast(ext)).select(
        F.expr("CAST(CAST(l_orderkey AS BIGINT) * 65536 DIV mok AS BIGINT)").alias(
            "ok16"
        ),
        F.expr("CAST(CAST(l_partkey AS BIGINT) * 65536 DIV mpk AS BIGINT)").alias(
            "pk16"
        ),
    )


def test_pruned_read_equals_full_filter(spark, sf_dir, tmp_path):
    base = _scaled(spark, sf_dir)
    path = str(tmp_path / "zstore")
    write_curve_layout(
        base,
        path,
        curve=F.expr(_morton_sql("ok16", "pk16", "spark")),
        dims=["ok16", "pk16"],
    )
    got = pruned_read(spark, path, RANGES)
    want = base
    for d, (lo, hi) in RANGES.items():
        want = want.where(F.col(d).between(lo, hi))
    assert got.count() == want.count()

    # pruning must actually bite AND never false-negative
    cands = candidate_buckets(spark, path, RANGES)
    assert 0 < len(cands) < 32

    # the bucket IN-list must reach the scan as a partition filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_broadcast_manifest_matches_collected_mode(spark, sf_dir, tmp_path):
    """broadcast_manifest=True must return exactly the same rows without
    collecting the survivor list to the driver; the semi join on the
    partition column lets dynamic partition pruning skip directories."""
    base = _scaled(spark, sf_dir)
    path = str(tmp_path / "zstore3")
    write_curve_layout(
        base,
        path,
        curve=F.expr(_morton_sql("ok16", "pk16", "spark")),
        dims=["ok16", "pk16"],
    )
    collected = pruned_read(spark, path, RANGES)
    joined = pruned_read(spark, path, RANGES, broadcast_manifest=True)
    a = collected.groupBy("ok16", "pk16").count()
    b = joined.groupBy("ok16", "pk16").count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # runtime pruning (DPP) must target the partition column
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_manifest_describes_written_files_not_input_plan(spark, tmp_path):
    """A nondeterministic upstream (rand-keyed) must still yield a
    manifest consistent with the parquet on disk: every row's dims fall
    inside its own bucket's envelope."""
    df = spark.range(0, 2000).select(
        (F.abs(F.hash((F.rand(seed=7) * 1e9).cast("long"))) % 65536).alias("ok16"),
        (F.col("id") * 32).alias("pk16"),
    )
    path = str(tmp_path / "zstore_nd")
    write_curve_layout(
        df,
        path,
        curve=F.expr(_morton_sql("ok16", "pk16", "spark")),
        dims=["ok16", "pk16"],
    )
    data = spark.read.parquet(path)
    mani = spark.read.parquet(f"{path}/_manifest")
    joined = data.join(mani, "bucket")
    bad = joined.where(
        (F.col("ok16") < F.col("min_ok16"))
        | (F.col("ok16") > F.col("max_ok16"))
        | (F.col("pk16") < F.col("min_pk16"))
        | (F.col("pk16") > F.col("max_pk16"))
    )
    assert bad.count() == 0
    assert mani.agg(F.sum("n_rows")).first()[0] == data.count()


def test_manifest_is_hidden_from_data_scans(spark, sf_dir, tmp_path):
    """The _manifest dir must not leak rows into a plain read (leading
    underscore = hidden to the file index, the _delta_log convention)."""
    base = _scaled(spark, sf_dir)
    path = str(tmp_path / "zstore2")
    write_curve_layout(
        base,
        path,
        curve=F.expr(_morton_sql("ok16", "pk16", "spark")),
        dims=["ok16", "pk16"],
    )
    assert spark.read.parquet(path).count() == base.count()


def test_elevated_bucket_count_dpp_and_one_file_per_bucket(spark, tmp_path):
    """The 10^4-bucket regime, shrunk to CI size (512 buckets): the
    broadcast-manifest read must prune via DYNAMIC partition pruning on
    the partition column (not a full scan + post-filter), and the write
    must emit ONE data file per bucket regardless of writer count — the
    scale probe measured writers x buckets files (~320k at 10^4/32)
    before write_curve_layout clustered on bucket ahead of the
    partitioned write."""
    import glob
    import os

    n_buckets = 512
    base = spark.range(0, 60_000, 1, 16).selectExpr(
        "CAST(pmod(hash('x', id), 65536) AS BIGINT) AS ok16",
        "CAST(pmod(hash('y', id), 65536) AS BIGINT) AS pk16",
    )
    path = str(tmp_path / "bigstore")
    write_curve_layout(
        base,
        path,
        curve=F.expr(_morton_sql("ok16", "pk16", "spark")),
        dims=["ok16", "pk16"],
        n_buckets=n_buckets,
    )
    bucket_dirs = glob.glob(os.path.join(path, "bucket=*"))
    assert len(bucket_dirs) > 256  # the hash fill actually spans buckets
    files_per_bucket = [
        len(glob.glob(os.path.join(d, "part-*.parquet"))) for d in bucket_dirs
    ]
    assert max(files_per_bucket) == 1, (
        f"bucket with {max(files_per_bucket)} files — the pre-write "
        "clustering regressed (writers x buckets small-file explosion)"
    )

    joined = pruned_read(spark, path, RANGES, broadcast_manifest=True)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    full = spark.read.parquet(path)
    for d, (lo, hi) in RANGES.items():
        full = full.where(F.col(d).between(lo, hi))
    assert joined.count() == full.count()


def test_write_curve_layout_empty_input(spark, tmp_path):
    """An empty input produces a valid (empty) store + manifest instead
    of UNABLE_TO_INFER_SCHEMA on the manifest read-back."""
    base = spark.range(0).selectExpr(
        "CAST(id AS BIGINT) AS ok16", "CAST(id AS BIGINT) AS pk16"
    )
    path = str(tmp_path / "empty_store")
    write_curve_layout(
        base,
        path,
        curve=F.expr(_morton_sql("ok16", "pk16", "spark")),
        dims=["ok16", "pk16"],
    )
    # the manifest exists and certifies zero buckets -> every range
    # predicate prunes everything without touching data files
    assert candidate_buckets(spark, path, RANGES) == []


def test_direct_writer_parity_with_spark_writer(spark, sf_dir, tmp_path):
    """write_curve_layout_direct (the many-tiny-buckets pyarrow path)
    must produce byte-equivalent stores: same data rows, same manifest
    envelopes, same pruned reads in both modes — and its data files must
    not contain the partition column (hive-style dirs carry it)."""
    from console_datagen_spark.operators.layout_store import (
        write_curve_layout_direct,
    )

    base = _scaled(spark, sf_dir)
    p_std = str(tmp_path / "std")
    p_dir = str(tmp_path / "direct")
    curve = F.expr(_morton_sql("ok16", "pk16", "spark"))
    write_curve_layout(base, p_std, curve=curve, dims=["ok16", "pk16"],
                       n_buckets=64)
    write_curve_layout_direct(base, p_dir, curve=curve,
                              dims=["ok16", "pk16"], n_buckets=64)

    m_std = {tuple(r) for r in spark.read.parquet(f"{p_std}/_manifest").collect()}
    m_dir = {tuple(r) for r in spark.read.parquet(f"{p_dir}/_manifest").collect()}
    assert m_std == m_dir and len(m_dir) > 0

    d_std = sorted(map(tuple, spark.read.parquet(p_std).collect()))
    d_dir = sorted(map(tuple, spark.read.parquet(p_dir).collect()))
    assert d_std == d_dir

    for bm in (False, True):
        n_std = pruned_read(spark, p_std, RANGES, broadcast_manifest=bm).count()
        n_dir = pruned_read(spark, p_dir, RANGES, broadcast_manifest=bm).count()
        assert n_std == n_dir

    # partition column must come from the directory name, not the file
    import glob

    import pyarrow.parquet as pq

    f = glob.glob(f"{p_dir}/bucket=*/part-00000.parquet")[0]
    assert "bucket" not in pq.ParquetFile(f).schema_arrow.names


def test_direct_writer_sweeps_stranded_tmp_files(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r11 verdict #7: a task kill between write_table and os.replace
    strands a dot-prefixed ``.part-*.attempt-N.tmp``. Readers must
    exclude it, and a rewrite must reclaim it through BOTH sweeps: the
    overwrite's rmtree at write start, and the kernel's older-attempt
    sweep (exercised here with rmtree disabled, the within-job retry
    shape where the store dir survives)."""
    import glob
    import os

    from console_datagen_spark.operators.layout_store import (
        write_curve_layout_direct,
    )

    base = _scaled(spark, sf_dir)
    path = str(tmp_path / "direct_sweep")
    curve = F.expr(_morton_sql("ok16", "pk16", "spark"))
    write_curve_layout_direct(
        base, path, curve=curve, dims=["ok16", "pk16"], n_buckets=64
    )
    rows_clean = spark.read.parquet(path).count()

    bucket_dir = os.path.dirname(
        glob.glob(f"{path}/bucket=*/part-00000.parquet")[0]
    )
    stale = os.path.join(bucket_dir, ".part-00000.parquet.attempt-0.tmp")
    with open(stale, "wb") as f:
        f.write(b"not parquet")  # a torn write: partial bytes, no footer

    # correctness is unaffected: dot-files are invisible to every read
    assert spark.read.parquet(path).count() == rows_clean
    assert pruned_read(spark, path, RANGES).count() > 0

    # kernel sweep: rewrite with the start-of-write rmtree disabled
    # (simulates the retry-within-one-job shape — the bucket dir and
    # the predecessor attempt's wreck both survive to kernel time)
    import shutil as _shutil

    monkeypatch.setattr(_shutil, "rmtree", lambda *a, **k: None)
    write_curve_layout_direct(
        base, path, curve=curve, dims=["ok16", "pk16"], n_buckets=64
    )
    monkeypatch.undo()
    assert not os.path.exists(stale)  # attempt-0 < any live attempt id
    assert spark.read.parquet(path).count() == rows_clean

    # start-of-write sweep: plant again, rewrite normally — rmtree takes
    # the whole store including the wreck
    with open(stale, "wb") as f:
        f.write(b"not parquet")
    write_curve_layout_direct(
        base, path, curve=curve, dims=["ok16", "pk16"], n_buckets=64
    )
    assert not os.path.exists(stale)
    assert spark.read.parquet(path).count() == rows_clean


def test_direct_writer_footer_manifest_agrees(spark, sf_dir, tmp_path):
    """The direct writer's in-pass manifest must equal an independent
    footer-statistics pass over the files it wrote (the two manifest
    derivations cross-check each other)."""
    from console_datagen_spark.operators.layout_store import (
        _footer_stats_manifest,
        write_curve_layout_direct,
    )

    base = _scaled(spark, sf_dir)
    path = str(tmp_path / "direct_fm")
    write_curve_layout_direct(
        base, path, curve=F.expr(_morton_sql("ok16", "pk16", "spark")),
        dims=["ok16", "pk16"], n_buckets=64,
    )
    written = spark.read.parquet(path)
    footer = _footer_stats_manifest(spark, path, written.schema,
                                    ["ok16", "pk16"])
    m_pass = {tuple(r) for r in spark.read.parquet(f"{path}/_manifest").collect()}
    m_foot = {tuple(r) for r in footer.collect()}
    assert m_pass == m_foot


def test_paths_from_manifest_mode_parity(spark, sf_dir, tmp_path):
    """paths_from_manifest=True (the 10^6-bucket read path: scan planned
    from manifest metadata, only surviving dirs listed) must return
    exactly the rows of the full-listing modes, with the partition
    column intact via basePath."""
    from console_datagen_spark.operators.layout_store import (
        write_curve_layout_direct,
    )

    base = _scaled(spark, sf_dir)
    path = str(tmp_path / "pfm")
    write_curve_layout_direct(
        base, path, curve=F.expr(_morton_sql("ok16", "pk16", "spark")),
        dims=["ok16", "pk16"], n_buckets=64,
    )
    got = pruned_read(spark, path, RANGES, paths_from_manifest=True)
    assert "bucket" in got.columns  # basePath keeps the partition column
    want = pruned_read(spark, path, RANGES)  # full-listing mode
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # empty survivor set must yield an empty frame, not a crash
    none = pruned_read(
        spark, path, {"ok16": (70000, 70001)}, paths_from_manifest=True
    )
    assert none.count() == 0


def test_direct_writer_empty_store_reads_empty(spark, tmp_path):
    """A store whose input was empty has no data files (Spark hides the
    _-prefixed dirs); the _schema marker must make paths_from_manifest
    return an EMPTY frame with the data schema instead of
    UNABLE_TO_INFER_SCHEMA."""
    from console_datagen_spark.operators.layout_store import (
        write_curve_layout_direct,
    )

    base = spark.range(0).selectExpr(
        "id", "id AS ok16", "id AS pk16"
    )
    path = str(tmp_path / "empty_direct")
    write_curve_layout_direct(
        base, path, curve=F.col("ok16"), dims=["ok16", "pk16"], n_buckets=16
    )
    got = pruned_read(spark, path, RANGES, paths_from_manifest=True)
    assert got.count() == 0
    assert set(got.columns) == {"id", "ok16", "pk16", "bucket"}
    # the empty branch must return the SAME dtypes as a non-empty read
    # (partition-inferred int for bucket), not the marker's bigint
    assert dict(got.dtypes)["bucket"] == "int"


def test_generic_writer_delegates_high_bucket_regime(spark, sf_dir, tmp_path):
    """r13: write_curve_layout routes n_buckets >= direct_threshold to
    the direct per-task pyarrow writer (the dynamic-partition
    committer's per-file constant is superlinear in bucket count —
    remeasured under a near-clean write sentinel). Delegated stores
    carry the direct writer's deterministic file names and the same
    manifest/read contract; direct_threshold=None forces the generic
    path."""
    import glob

    base = _scaled(spark, sf_dir)
    curve = F.expr(_morton_sql("ok16", "pk16", "spark"))

    p_del = str(tmp_path / "delegated")
    write_curve_layout(base, p_del, curve=curve, dims=["ok16", "pk16"],
                       n_buckets=64, direct_threshold=64)
    # the direct writer's signature file name (generic writes part-*-uuid)
    assert glob.glob(f"{p_del}/bucket=*/part-00000.parquet")

    p_gen = str(tmp_path / "forced_generic")
    write_curve_layout(base, p_gen, curve=curve, dims=["ok16", "pk16"],
                       n_buckets=64, direct_threshold=None)
    assert not glob.glob(f"{p_gen}/bucket=*/part-00000.parquet")

    m_del = {tuple(r) for r in spark.read.parquet(f"{p_del}/_manifest").collect()}
    m_gen = {tuple(r) for r in spark.read.parquet(f"{p_gen}/_manifest").collect()}
    assert m_del == m_gen and len(m_del) > 0
    n_del = pruned_read(spark, p_del, RANGES).count()
    n_gen = pruned_read(spark, p_gen, RANGES).count()
    assert n_del == n_gen


def test_delegation_rejects_non_default_manifest_mode(spark, sf_dir, tmp_path):
    import pytest

    """ADVICE r13: the direct writer builds its manifest in-pass, so a
    caller pinning manifest_mode='scan'/'footer-variant' must get a loud
    error when routed to it, not a silent strategy change."""
    base = _scaled(spark, sf_dir)
    curve = F.expr(_morton_sql("ok16", "pk16", "spark"))
    with pytest.raises(ValueError, match="manifest_mode"):
        write_curve_layout(
            base, str(tmp_path / "x"), curve=curve, dims=["ok16", "pk16"],
            n_buckets=64, manifest_mode="scan", direct_threshold=64,
        )
    # the same mode below the threshold still works
    write_curve_layout(
        base, str(tmp_path / "ok"), curve=curve, dims=["ok16", "pk16"],
        n_buckets=8, manifest_mode="scan", direct_threshold=64,
    )
