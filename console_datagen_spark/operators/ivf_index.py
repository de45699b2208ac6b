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
    embeddings: DataFrame, path: str, centroid_mod: int = 25
) -> None:
    """Assign clusters and persist partitioned-by-cluster parquet."""
    assigned = assign_clusters(embeddings, centroid_mod)
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


def build_ivfpq_index(
    embeddings: DataFrame, path: str, centroid_mod: int = 25
) -> None:
    """Persist the FULL at-scale ANN index: cluster-partitioned parquet of
    PQ codes — 8 small ints per vector instead of 64 floats, so the index
    is ~64x smaller than the raw corpus and a probe reads only the probed
    clusters' partitions of a tiny file. Layout:
    (vec_id, codes array<int>) partitioned by ``cluster``."""
    from .similarity import PQ_CODES, _pq_sqdist, _pq_subvectors

    assigned = assign_clusters(embeddings, centroid_mod).select(
        "vec_id", "cluster"
    )
    sub = _pq_subvectors(embeddings)
    cb = sub.where(F.col("vec_id") < PQ_CODES).select(
        F.col("vec_id").cast("int").alias("code"), "j", F.col("sv").alias("cv")
    )
    enc_w = Window.partitionBy("vec_id", "j").orderBy("d", "code")
    encoded = (
        sub.join(F.broadcast(cb), "j")
        .select("vec_id", "j", "code", _pq_sqdist(F.col("sv"), F.col("cv")).alias("d"))
        .withColumn("rn", F.row_number().over(enc_w))
        .where(F.col("rn") == 1)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("j"), F.col("code")))),
                lambda s: s.getField("code"),
            ).alias("codes")
        )
    )
    (
        encoded.join(assigned, "vec_id")
        .write.mode("overwrite")
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
    read — the probe touches the 4-byte codes only."""
    from .similarity import PQ_CODES, _pq_sqdist, _pq_subvectors

    n = with_norm(embeddings)
    cent = n.where(F.pmod(F.col("vec_id"), F.lit(centroid_mod)) == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    qbase = n.where(F.col("vec_id") < max_query_id).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    qscored = qbase.join(F.broadcast(cent)).select(
        "query_id",
        "cid",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
    )
    qw = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cid"))
    probes = (
        qscored.withColumn("rn", F.row_number().over(qw))
        .where(F.col("rn") <= nprobe)
        .select("query_id", F.col("cid").alias("cluster"))
    )
    # k-row collect (queries x nprobe) -> static IN-list so the parquet
    # scan prunes partitions at plan time (PartitionFilters), the same
    # O(small) collect class as IVF centroids
    probe_clusters = [r.cluster for r in probes.select("cluster").distinct().collect()]
    index = spark.read.parquet(path).where(F.col("cluster").isin(probe_clusters))

    sub = _pq_subvectors(embeddings)
    cb = sub.where(F.col("vec_id") < PQ_CODES).select(
        F.col("vec_id").cast("int").alias("code"), "j", F.col("sv").alias("cv")
    )
    qsub = _pq_subvectors(
        embeddings.where(F.col("vec_id") < max_query_id), id_col="query_id"
    )
    dtable = qsub.join(F.broadcast(cb), "j").select(
        "query_id", "j", "code", _pq_sqdist(F.col("sv"), F.col("cv")).alias("qd")
    )
    long_codes = index.select(
        "vec_id", "cluster", F.posexplode("codes").alias("j", "code")
    )
    scored = (
        long_codes.join(F.broadcast(probes), "cluster")
        .where(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(dtable), ["query_id", "j", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("qd").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "adist")
    )
