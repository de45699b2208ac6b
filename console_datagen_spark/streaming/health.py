"""Snapshot-diff progress/health analytics (SURVEY §3.3; reference
CounterProgressCheck.java:37-130).

The reference's entire analytics surface is one dashboard query over the
counter table: join the previous snapshot against current counters, derive
per-partition last-activity, then aggregate
{currentCount, inactivePartitions, earliestActivity, latestActivity,
status}. Here it is as declarative DataFrame algebra:

- J1 snapshot equi-join on (cluster, topic, partition);
- J3 left join + coalesce for partitions with no recorded activity;
- A3/A4/A5 global sum, min/max, conditional count;
- W1/W2 staleness tiers + 5-minute inactivity window.

All broadcast-joinable (counter cardinality = topics × partitions), so at
scale this is a cheap side query over the streaming counter sink.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, functions as F

STALE_DEBUG_MIN = 3  # CounterProgressCheck.java:20-23
STALE_INFO_MIN = 4
STALE_WARN_MIN = 5  # ≥ 5 min without progress ⇒ partition inactive


def activity_from_snapshots(
    prev: DataFrame,
    cur: DataFrame,
    prev_activity: DataFrame | None,
    now: datetime,
    startup: datetime,
) -> DataFrame:
    """Per-partition last-activity update (CounterProgressCheck.java:43-77).

    prev/cur: (cluster, topic, partition, count) snapshots.
    prev_activity: (cluster, topic, partition, last_update) or None.
    A partition's last_update moves to ``now`` iff its count increased;
    otherwise it keeps its previous value, defaulting to startup (J3).
    """
    joined = (
        prev.select(
            "cluster", "topic", "partition", F.col("count").alias("prev_count")
        )
        .join(
            cur.select(
                "cluster", "topic", "partition", F.col("count").alias("cur_count")
            ),
            ["cluster", "topic", "partition"],
            "inner",
        )
    )
    if prev_activity is not None:
        joined = joined.join(
            prev_activity, ["cluster", "topic", "partition"], "left"
        )
    else:
        joined = joined.withColumn("last_update", F.lit(None).cast("timestamp"))
    return joined.select(
        "cluster",
        "topic",
        "partition",
        F.col("cur_count").alias("count"),
        F.when(F.col("cur_count") > F.col("prev_count"), F.lit(now))
        .otherwise(F.coalesce(F.col("last_update"), F.lit(startup)))
        .alias("last_update"),
    )


def staleness_tier(now: datetime):
    """W1: DEBUG/INFO/WARN ladder over minutes since last update."""
    mins = (F.lit(now).cast("long") - F.col("last_update").cast("long")) / 60.0
    return (
        F.when(mins >= STALE_WARN_MIN, "WARN")
        .when(mins >= STALE_INFO_MIN, "INFO")
        .when(mins >= STALE_DEBUG_MIN, "DEBUG")
        .otherwise("OK")
    )


def health_summary(activity: DataFrame, now: datetime) -> DataFrame:
    """The reference's 4-aggregate dashboard row (CPC:80-124).

    Returns one row: (current_count, inactive_partitions,
    earliest_activity, latest_activity, status).
    """
    inactive = (
        F.col("last_update").cast("long")
        < F.lit(now).cast("long") - STALE_WARN_MIN * 60
    )
    return activity.agg(
        F.sum("count").alias("current_count"),
        F.sum(F.when(inactive, 1).otherwise(0)).alias("inactive_partitions"),
        F.min("last_update").alias("earliest_activity"),
        F.max("last_update").alias("latest_activity"),
    ).select(
        "*",
        F.when(F.col("inactive_partitions") == 0, "UP")
        .otherwise("DOWN")
        .alias("status"),
    )


def utcnow() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


def render_health_response(checks: list[tuple[str, "DataFrame"]]) -> dict:
    """Render the reference's health-endpoint JSON shape.

    The reference serves SmallRye-style {status, checks:[{name, status,
    data}]} from /q/health (Producer/ConsumerProgressCheck.java:27-29 +
    CounterProgressCheck.java:116-124). Each input pair is (check name,
    one-row health_summary frame); overall status is UP iff every check
    is UP.
    """
    out_checks = []
    for name, summary in checks:
        row = summary.first()
        data = {
            "currentCount": row.current_count,
            "inactivePartitions": row.inactive_partitions,
            "earliestActivity": (
                row.earliest_activity.isoformat() if row.earliest_activity else None
            ),
            "latestActivity": (
                row.latest_activity.isoformat() if row.latest_activity else None
            ),
        }
        out_checks.append({"name": name, "status": row.status, "data": data})
    overall = "UP" if all(c["status"] == "UP" for c in out_checks) else "DOWN"
    return {"status": overall, "checks": out_checks}
