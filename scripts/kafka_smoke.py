"""Live-broker smoke test for the Kafka surface (S1/S2/S5-S9).

The test container has no Kafka broker and no spark-sql-kafka jar, so the
Kafka paths are certified by fake-client unit tests (tests/test_admin.py,
tests/test_kafka_io.py) and the spool-backed share-group suite. This
script is the documented path to exercise them against a REAL broker —
run it from any host that has one:

    spark-submit \
      --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0 \
      scripts/kafka_smoke.py --bootstrap localhost:9092

(match the kafka connector version to the installed pyspark; `pip install
kafka-python` for the admin-DDL half — the script degrades gracefully
without it).

What it does, mirroring the reference's lifecycle
(DataGenerator.java:237-348 init, 507-526 produce, 395-409 consume):

1. S9  probe the cluster (admin describe_cluster);
2. S5  create a console-datagen topic with the reference's segment
       configs (10 MiB / 10 min);
3. S1  produce N deterministic records through the engine's generator
       (writeStream.format("kafka"), base64 payloads, round-robin topics);
4. S2  read them back (batch Kafka source), run the S4 envelope
       projection + counter aggregation, and assert the per-partition
       counts sum to N;
5. S6/S7 delete the topic (retry frontier) and stale groups.

Exit 0 = every stage passed against the live broker.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bootstrap", default="localhost:9092")
    ap.add_argument("--records", type=int, default=10_000)
    ap.add_argument("--partitions", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from console_datagen_spark.naming import GROUP_ID_PREFIX
    from console_datagen_spark.sources.admin import (
        TopicLifecycle,
        make_kafka_admin,
    )
    from console_datagen_spark.sources.generator import generate_batch
    from console_datagen_spark.sources.kafka_io import (
        envelope,
        kafka_batch_source,
    )
    from console_datagen_spark.streaming.counters import count_records

    spark = SparkSession.builder.appName("console-datagen-kafka-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    topic = f"console_datagen_smoke_{int(time.time())}"

    # -- S9 + S5 (admin DDL; skipped if kafka-python absent) ----------------
    admin = make_kafka_admin(args.bootstrap)
    lifecycle = None
    if admin is not None:
        lifecycle = TopicLifecycle(admin)
        print("S9 cluster:", lifecycle.cluster_id())
        lifecycle.create_topics([topic], partitions=args.partitions)
        print(f"S5 created {topic} ({args.partitions} partitions)")
    else:
        print("kafka-python absent: relying on broker auto-create for", topic)

    # -- S1 produce ---------------------------------------------------------
    records = generate_batch(spark, args.records)
    (
        records.select(
            F.col("key_json").cast("binary").alias("key"),
            F.col("value_json").cast("binary").alias("value"),
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", args.bootstrap)
        .option("topic", topic)
        .save()
    )
    print(f"S1 produced {args.records} records")

    # -- S2 consume + S4 envelope + counter agg -----------------------------
    consumed = kafka_batch_source(spark, args.bootstrap, [topic])
    counts = count_records(envelope(consumed), cluster="smoke").collect()
    total = sum(r["count"] for r in counts)
    print("S2/S4 per-partition counts:", {(r.topic, r.partition): r["count"] for r in counts})
    assert total == args.records, f"consumed {total} != produced {args.records}"

    # -- S6/S7 cleanup ------------------------------------------------------
    if lifecycle is not None:
        remaining = lifecycle.delete_topics_with_retry([topic])
        assert not remaining, f"undeleted: {remaining}"
        stale = lifecycle.delete_stale_groups()
        print(f"S6 deleted {topic}; S7 removed {len(stale)} stale "
              f"{GROUP_ID_PREFIX}* groups")

    print("SMOKE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
