"""Stream-static enrichment joins (beyond-reference streaming surface).

The canonical training-data-pipeline shape: a stream of incoming items
joined against a static reference corpus (dim tables, dedup fingerprint
sets, quality allowlists). Spark plans a broadcast join per micro-batch —
no stream-side shuffle, and the static side can be refreshed by re-reading
per batch in foreachBatch if it changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enrich_stream(
    stream: DataFrame,
    static: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Join a streaming frame against a broadcast static frame."""
    return stream.join(F.broadcast(static), on, how)


def filter_known_duplicates(
    stream: DataFrame,
    fingerprints: DataFrame,
    content_col: str = "text",
) -> DataFrame:
    """Drop stream rows whose content hash is in a static fingerprint set.

    The static side carries one column ``fp`` (md5 hex). Anti-join is
    broadcast: the stream never shuffles.
    """
    withfp = stream.withColumn("fp", F.md5(F.col(content_col)))
    return withfp.join(F.broadcast(fingerprints), "fp", "left_anti").drop("fp")
