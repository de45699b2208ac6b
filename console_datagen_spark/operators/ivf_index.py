"""Persistent IVF index: partition-pruned approximate nearest neighbor.

The in-memory IVF operator (similarity.ivf_topk) recomputes assignments
per query. At 100 TB you build the index ONCE and persist it partitioned
by cluster id; a probe then reads only the probed clusters' partitions —
Spark's partition pruning turns the scan into O(corpus/k · nprobe).

Layout: parquet partitioned by ``cluster`` with columns
(vec_id, v double[], nrm). Probing broadcasts the query vectors, prunes
partitions with a ``cluster IN (...)`` predicate (visible as
PartitionFilters in the scan), and runs the same ranked top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.vector import dot
from .similarity import assign_clusters, with_norm


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    centroid_mod: int = 25,
    centroid_source: DataFrame | None = None,
) -> None:
    """Assign clusters and persist partitioned-by-cluster parquet.

    ``centroid_source``: see ``assign_clusters`` — pass the full corpus
    frame when building from a subset that will later be appended to.
    """
    assigned = assign_clusters(embeddings, centroid_mod, centroid_source)
    (
        assigned.select("vec_id", "v", "nrm", "cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(path)
    )


def probe_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 3,
    nprobe_clusters: list[int] | None = None,
) -> DataFrame:
    """Top-k neighbors for each query from the persisted index.

    ``queries``: (query_id, qv double[], qn, cluster) — e.g. from
    ``assign_clusters`` on the query batch. When ``nprobe_clusters`` is
    None, each query probes its own cluster (nprobe=1) via an equi-join
    on the partition column, which Spark prunes to the matching
    directories (dynamic partition pruning / join pushdown).
    """
    index = spark.read.parquet(path)
    if nprobe_clusters is not None:
        index = index.where(F.col("cluster").isin(nprobe_clusters))
    scored = (
        index.join(F.broadcast(queries), "cluster")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    )


def query_vectors(embeddings: DataFrame, max_query_id: int, centroid_mod: int = 25) -> DataFrame:
    """Build the probe-side frame (query_id, qv, qn, cluster)."""
    assigned = assign_clusters(embeddings, centroid_mod)
    return assigned.where(F.col("vec_id") < max_query_id).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "cluster",
    )


def _pack_codes(
    vectors: DataFrame,
    centroid_mod: int,
    centroid_source: DataFrame | None,
) -> DataFrame:
    from .similarity import pq_codebook, pq_encode

    assigned = assign_clusters(vectors, centroid_mod, centroid_source).select(
        "vec_id", "cluster"
    )
    cb = (
        pq_codebook(centroid_source) if centroid_source is not None else None
    )
    packed = (
        pq_encode(vectors, codebook=cb)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("j"), F.col("code")))),
                lambda s: s.getField("code"),
            ).alias("codes")
        )
    )
    return packed.join(assigned, "vec_id")


CENTROIDS_DIR = "_centroids"
CODEBOOK_DIR = "_codebook"


def build_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    centroid_mod: int = 25,
    centroid_source: DataFrame | None = None,
) -> None:
    """Persist the FULL at-scale ANN index: cluster-partitioned parquet of
    PQ codes — 8 small ints per vector instead of 64 floats, so the index
    is ~21x smaller than the raw corpus and a probe reads only the probed
    clusters' partitions of a tiny file. Layout:
    (vec_id, codes array<int>) partitioned by ``cluster``, plus two
    sidecars (underscore-hidden from data scans, the _manifest
    convention): ``_centroids`` (cid, cv, cn — the coarse quantizer) and
    ``_codebook`` (code, j, cv — the PQ subquantizers). Persisting the
    quantizers is what makes the index self-contained: a probe reads
    ONLY probed code partitions + the tiny sidecars + its own query
    vectors — before r9 every probe re-derived both quantizers from a
    full corpus scan, which is why the scale probe's rows-read exponent
    tracked corpus size.

    ``centroid_source``: pins BOTH the coarse centroids and the PQ
    codebook to a fixed frame — pass the full corpus when building from a
    subset that ``append_to_ivfpq_index`` will later extend."""
    (
        _pack_codes(embeddings, centroid_mod, centroid_source)
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(path)
    )
    from .similarity import pq_codebook

    base = centroid_source if centroid_source is not None else embeddings
    cent = with_norm(base).where(
        F.pmod(F.col("vec_id"), F.lit(centroid_mod)) == 0
    ).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cent.coalesce(1).write.mode("overwrite").parquet(f"{path}/{CENTROIDS_DIR}")
    pq_codebook(base).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{CODEBOOK_DIR}"
    )


def append_to_ivfpq_index(
    new_vectors: DataFrame,
    path: str,
    centroid_source: DataFrame,
    centroid_mod: int = 25,
) -> None:
    """Incremental PQ-index maintenance: encode ONLY the new batch with
    the PINNED coarse centroids AND PQ codebook from ``centroid_source``,
    append its partitions. Both quantizers must stay fixed across appends
    — drifting codebooks would make old codes and new distance tables
    disagree. Same ingest economics as ``append_to_ivf_index``: the
    existing index is never re-read or re-written."""
    (
        _pack_codes(new_vectors, centroid_mod, centroid_source)
        .write.mode("append")
        .partitionBy("cluster")
        .parquet(path)
    )


def probe_ivfpq_index(
    spark: SparkSession,
    path: str,
    embeddings: DataFrame,
    max_query_id: int = 20,
    k: int = 5,
    centroid_mod: int = 25,
    nprobe: int = 2,
) -> DataFrame:
    """ADC top-k from the persisted PQ index, reading only the probed
    clusters' partitions (PartitionFilters in the scan). Distances come
    from the broadcast query-to-code tables; corpus vectors are never
    read. With the index's quantizer sidecars (any index built since r9)
    the probe's total input is O(probed codes + nlist + queries): the
    coarse centroids and the PQ codebook come from the sidecar parquets
    and ``embeddings`` is touched only for the vec_id < max_query_id
    query rows (pushed-down range filter). Indexes persisted before the
    sidecars existed fall back to deriving both from ``embeddings``."""
    from pyspark.errors import AnalysisException

    from .similarity import _adc_topk, coarse_probes, pq_dtable

    try:
        # missing sidecar paths raise here (schema resolution is eager)
        centroids = spark.read.parquet(f"{path}/{CENTROIDS_DIR}")
        codebook = spark.read.parquet(f"{path}/{CODEBOOK_DIR}")
    except AnalysisException:
        centroids, codebook = None, None

    # k-row collect (queries x nprobe, the same O(small) class as IVF
    # centroids); the collected rows seed BOTH the static IN-list that
    # prunes the parquet scan at plan time (PartitionFilters) AND the
    # broadcast probe frame, so the centroid-scoring job runs once
    probe_rows = coarse_probes(
        embeddings, max_query_id, centroid_mod, nprobe, centroids=centroids
    ).collect()
    probes = spark.createDataFrame(probe_rows, "query_id LONG, cluster LONG")
    probe_clusters = sorted({r.cluster for r in probe_rows})
    index = spark.read.parquet(path).where(F.col("cluster").isin(probe_clusters))

    long_codes = index.select(
        "vec_id", "cluster", F.posexplode("codes").alias("j", "code")
    )
    scored = (
        long_codes.join(F.broadcast(probes), "cluster")
        .where(F.col("vec_id") != F.col("query_id"))
        .join(
            F.broadcast(pq_dtable(embeddings, max_query_id, codebook=codebook)),
            ["query_id", "j", "code"],
        )
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("qd").alias("adist"))
    )
    return _adc_topk(scored, k)


def append_to_ivf_index(
    new_vectors: DataFrame, path: str, centroid_source: DataFrame, centroid_mod: int = 25
) -> None:
    """Incremental index maintenance: assign ONLY the new batch against the
    EXISTING centroid set and append its partitions — the corpus already
    in the index is never re-read or re-written (at 100 TB a rebuild per
    ingest batch is the difference between minutes and days).

    ``centroid_source`` supplies the centroid vectors (the original
    corpus frame, or any frame containing the centroid rows): centroids
    must stay FIXED across appends or cluster assignments drift between
    index generations and probes would miss old rows.
    """
    assigned = assign_clusters(new_vectors, centroid_mod, centroid_source)
    (
        assigned.select("vec_id", "v", "nrm", "cluster")
        .write.mode("append")
        .partitionBy("cluster")
        .parquet(path)
    )
