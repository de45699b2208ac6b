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
