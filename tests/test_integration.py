"""End-to-end streaming composition (SURVEY §3): generate → persist →
consume → count → truncate-trigger → health, all through public APIs."""

import time

from pyspark.sql import functions as F

from console_datagen_spark.streaming.counters import counting_sink
from console_datagen_spark.streaming.generator_stream import records_stream
from console_datagen_spark.streaming.listener import install_health_listener
from console_datagen_spark.streaming.stateful import stateful_counts


def test_full_pipeline(spark, tmp_path):
    board, listener = install_health_listener(spark)
    try:
        # 1. produce one burst of generated records to the "broker" stand-in
        produced_dir = tmp_path / "wire"
        rec = records_stream(spark, micro_batch=True, num_partitions=2)
        q1 = (
            rec.writeStream.format("parquet")
            .option("path", str(produced_dir))
            .option("checkpointLocation", str(tmp_path / "c1"))
            .queryName("producer")
            .trigger(availableNow=True)
            .start()
        )
        q1.awaitTermination(90)
        produced = spark.read.parquet(str(produced_dir))
        n_produced = produced.count()
        assert n_produced > 0

        # 2. consume: envelope projection with synthetic partitions/offsets
        stream = spark.readStream.schema(produced.schema).parquet(
            str(produced_dir)
        )
        envelope = stream.select(
            "topic",
            F.pmod(F.xxhash64("key"), F.lit(2)).cast("int").alias("partition"),
            (F.pmod(F.xxhash64("value"), F.lit(1000))).alias("offset"),
        )

        # 3. counting sink with a low truncation depth → callback must fire
        truncations = []
        q2 = (
            counting_sink(
                envelope,
                cluster="it",
                on_truncate=truncations.extend,
                max_topic_depth=50,
                query_name="counter_sink",
            )
            .option("checkpointLocation", str(tmp_path / "c2"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(90)
        assert truncations, "offset depth 0..999 >= 50 must trigger truncation"
        assert {"topic", "partition", "truncate_before"} <= set(truncations[0])

        # 4. stateful threshold counter over the same stream
        emitted = []
        q3 = (
            stateful_counts(envelope)
            .writeStream.foreachBatch(lambda b, _: emitted.extend(b.collect()))
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "c3"))
            .queryName("stateful_counter")
            .trigger(availableNow=True)
            .start()
        )
        q3.awaitTermination(90)
        counted = sum(r.delta for r in emitted)
        assert counted == n_produced  # every produced record counted once

        # 5. the listener health board saw all three queries succeed
        deadline = time.time() + 20
        while time.time() < deadline:
            snap = board.snapshot()
            named = {h.name for h in snap.values()}
            done = {"producer", "counter_sink", "stateful_counter"} <= named and all(
                not h.active for h in snap.values()
            )
            if done:
                break
            time.sleep(0.5)
        summary = board.summary()
        assert summary["failed"] == 0
        assert {h.name for h in board.snapshot().values()} >= {
            "producer",
            "counter_sink",
            "stateful_counter",
        }
    finally:
        spark.streams.removeListener(listener)
