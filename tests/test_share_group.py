"""S3 share-group emulation: lease/ack semantics + S2-identical counting.

Certifies the VERDICT-requested parity: a fake (spool) share client
driven through the poll/ack loop produces per-record acknowledgement and
the same per-(topic, partition) counts as the classic S2 topology. Only
the wire protocol (KIP-932, Java-only) remains N/A.
"""

import time

import pytest

from console_datagen_spark.sources.share_group import (
    ACCEPT,
    RELEASE,
    FileSpoolShareClient,
    ShareGroupStreamReader,
)

FACTORY = "console_datagen_spark.sources.share_group:FileSpoolShareClient"


def _spool(tmp_path, n=10, topics=("t0", "t1", "t2"), lease_ms=30_000):
    client = FileSpoolShareClient(str(tmp_path / "spool"), lease_ms=lease_ms)
    client.offer(
        {
            "topic": topics[i % len(topics)],
            "partition": i % 2,
            "offset": i // len(topics),
            "key": f"k{i}",
            "value": f"v{i}",
            "timestamp_ms": 1_700_000_000_000 + i,
        }
        for i in range(n)
    )
    return client


# ---- client semantics (pure Python, no Spark) ------------------------------


def test_poll_leases_each_record_to_one_consumer(tmp_path):
    a = _spool(tmp_path, n=6)
    b = FileSpoolShareClient(str(tmp_path / "spool"))
    got_a = a.poll(4)
    got_b = b.poll(10)  # only the 2 unleased records remain available
    keys_a = {(r.topic, r.partition, r.offset) for r in got_a}
    keys_b = {(r.topic, r.partition, r.offset) for r in got_b}
    assert len(got_a) == 4 and len(got_b) == 2
    assert not keys_a & keys_b  # share-group invariant: no double delivery


def test_accept_settles_release_redelivers(tmp_path):
    c = _spool(tmp_path, n=2)
    first = c.poll(2)
    c.acknowledge(first[0].delivery_id, ACCEPT)
    c.acknowledge(first[1].delivery_id, RELEASE)
    again = c.poll(10)
    # the accepted record is gone for good; the released one comes back
    assert [(r.topic, r.partition, r.offset) for r in again] == [
        (first[1].topic, first[1].partition, first[1].offset)
    ]
    # double-settling a delivery is an error (lease is gone)
    with pytest.raises(KeyError):
        c.acknowledge(first[0].delivery_id, ACCEPT)


def test_wrecked_lock_is_reclaimed_not_wedged(tmp_path):
    """r11 ADVICE: a crash between lock creation (O_CREAT|O_EXCL) and
    the lease-JSON dump leaves an empty .lock; a valid lock always
    holds complete JSON, so an unparseable one must be treated as stale
    (reclaim + deliver) — not returned-None forever, which would wedge
    the record permanently with no expiry-based escape."""
    import os

    c = _spool(tmp_path, n=2)
    spool = str(tmp_path / "spool")
    names = sorted(
        n for n in os.listdir(spool) if n.endswith(".json")
    )
    # plant crash wrecks: one empty lock, one truncated-JSON lock
    with open(os.path.join(spool, names[0] + ".lock"), "w"):
        pass
    with open(os.path.join(spool, names[1] + ".lock"), "w") as f:
        f.write('{"delivery_id": "abc", "expi')
    got = c.poll(10)
    assert len(got) == 2  # both records delivered, neither wedged
    # and the reclaim consumed the wreck: the new locks are valid JSON
    import json

    for n in names:
        with open(os.path.join(spool, n + ".lock")) as f:
            assert json.load(f)["expires_ms"] > 0


def test_expired_lease_is_reclaimed(tmp_path):
    c = _spool(tmp_path, n=1, lease_ms=50)
    held = c.poll(1)
    assert held and c.poll(1) == []  # leased: invisible to further polls
    time.sleep(0.06)
    again = c.poll(1)  # lease expired without ack -> redelivered
    assert [(r.topic, r.offset) for r in again] == [(held[0].topic, held[0].offset)]


def test_stale_ack_refused_after_reclaim(tmp_path):
    """An ack for an expired lease that another consumer has re-leased
    must NOT settle the record (broker InvalidRecordStateException
    analog) — otherwise a slow first consumer could delete a record the
    second consumer is mid-processing."""
    from console_datagen_spark.sources.share_group import StaleLeaseError

    slow = _spool(tmp_path, n=1, lease_ms=50)
    held = slow.poll(1)
    time.sleep(0.06)  # lease lapses
    fast = FileSpoolShareClient(str(tmp_path / "spool"))
    reclaimed = fast.poll(1)
    assert len(reclaimed) == 1
    with pytest.raises(StaleLeaseError):
        slow.acknowledge(held[0].delivery_id, ACCEPT)
    # the record is still the fast consumer's to settle
    fast.acknowledge(reclaimed[0].delivery_id, ACCEPT)
    assert fast.pending() == 0


def test_close_releases_held_leases(tmp_path):
    c = _spool(tmp_path, n=3)
    c.poll(3)
    c.close()
    fresh = FileSpoolShareClient(str(tmp_path / "spool"))
    assert len(fresh.poll(10)) == 3  # nothing stranded behind live leases


# ---- reader: per-record ack at the micro-batch commit boundary -------------


def _reader(tmp_path, max_poll=100, lease_ms=30_000):
    import json

    return ShareGroupStreamReader(
        {
            "client_factory": FACTORY,
            "client_kwargs": json.dumps(
                {"spool_dir": str(tmp_path / "spool"), "lease_ms": lease_ms}
            ),
            "max_poll_records": str(max_poll),
        }
    )


def test_reader_acks_only_committed_records(tmp_path):
    client = _spool(tmp_path, n=6)
    r = _reader(tmp_path, max_poll=4)
    it1, off1 = r.read(r.initialOffset())
    rows1 = list(it1)  # read returns an iterator (Spark prefetch contract)
    assert len(rows1) == 4 and off1 == {"seq": 4}
    # nothing committed yet -> nothing settled
    assert client.pending() == 6
    r.commit(off1)
    assert client.pending() == 2  # exactly the 4 committed records acked
    rows2, off2 = r.read(off1)
    r.commit(off2)
    assert client.pending() == 0


def test_uncommitted_records_redeliver_after_crash(tmp_path):
    _spool(tmp_path, n=3)
    r = _reader(tmp_path, lease_ms=50)
    it, off = r.read(r.initialOffset())
    rows = list(it)
    assert len(rows) == 3
    # crash before commit: a new reader (new leases after expiry) sees all 3
    time.sleep(0.06)
    r2 = _reader(tmp_path)
    it2, off2 = r2.read(r2.initialOffset())
    rows2 = list(it2)
    assert sorted(x[:3] for x in rows2) == sorted(x[:3] for x in rows)
    r2.commit(off2)
    it3, _ = r2.read(off2)
    assert list(it3) == []


def test_read_between_offsets_replays_buffer(tmp_path):
    _spool(tmp_path, n=5)
    r = _reader(tmp_path)
    it, off = r.read(r.initialOffset())
    rows = list(it)
    replay = list(r.readBetweenOffsets({"seq": 1}, {"seq": 4}))
    assert replay == rows[1:4]


# ---- Spark end-to-end: S3 counting == S2 counting --------------------------


def test_share_group_counts_match_classic_topology(spark, tmp_path):
    """The emulated share source feeds count_records (the S2 topology)
    unchanged and yields identical per-(topic, partition) counts."""
    import json

    from console_datagen_spark.sources.kafka_io import share_group_source
    from console_datagen_spark.streaming.counters import count_records

    records = [
        {
            "topic": f"t{i % 3}",
            "partition": i % 2,
            "offset": i,
            "key": f"k{i}",
            "value": f"v{i}",
            "timestamp_ms": 1_700_000_000_000 + i,
        }
        for i in range(60)
    ]
    FileSpoolShareClient(str(tmp_path / "spool")).offer(records)

    stream = share_group_source(
        spark,
        client_factory=FACTORY,
        # lease must outlive batch+commit latency or records redeliver
        # (at-least-once) and counts legitimately exceed the S2 result;
        # 300s >> the test's runtime makes the comparison exact
        client_kwargs={"spool_dir": str(tmp_path / "spool"), "lease_ms": 300_000},
        max_poll_records=25,  # force multiple micro-batches
    )
    q = (
        count_records(stream, cluster="share")
        .writeStream.format("memory")
        .queryName("share_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    # Spark acks batch N's records at source.commit(N), which fires only
    # once a LATER batch completes — so first drain to the final batch...
    probe = FileSpoolShareClient(str(tmp_path / "spool"))
    deadline = time.time() + 120
    while probe.pending() > 10 and time.time() < deadline:
        time.sleep(0.2)
    # ...then push one flush record: its batch forces commit of the last
    # real batch, proving per-record ack for all 60 originals
    probe.offer(
        [{"topic": "flush", "partition": 0, "offset": 0, "key": None,
          "value": None, "timestamp_ms": 1_700_000_000_000}]
    )
    while probe.pending() > 1 and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(30)

    got = {
        (r.topic, r.partition): r["count"]
        for r in spark.sql("SELECT * FROM share_counts").collect()
    }
    got.pop(("flush", 0), None)  # scaffolding, not part of the comparison
    # S2 reference result: the same counting over a static frame
    batch = spark.createDataFrame(
        [(x["topic"], x["partition"], x["offset"]) for x in records],
        "topic STRING, partition INT, offset BIGINT",
    )
    want = {
        (r.topic, r.partition): r["count"]
        for r in count_records(batch, cluster="share").collect()
    }
    assert got == want

    # all 60 original records individually settled; at most the flush
    # record (whose own commit needs yet another batch) may remain leased
    assert probe.pending() <= 1


def test_share_group_source_without_factory_documents_na(spark):
    from console_datagen_spark.sources.kafka_io import share_group_source

    with pytest.raises(NotImplementedError, match="wire protocol"):
        share_group_source(spark)


# ---- partitioned reader: driver leases metadata, executors read payloads ---


def test_lease_batch_metadata_only(tmp_path):
    from console_datagen_spark.sources.share_group import LeaseRef

    a = _spool(tmp_path, n=6)
    refs = a.lease_batch(4)
    assert len(refs) == 4 and all(isinstance(r, LeaseRef) for r in refs)
    # filename-derived metadata matches what poll() reads from payloads
    b = FileSpoolShareClient(str(tmp_path / "spool"))
    rest = b.poll(10)
    assert len(rest) == 2  # leases exclude records from other consumers
    keys_a = {(r.topic, r.partition, r.offset) for r in refs}
    keys_b = {(r.topic, r.partition, r.offset) for r in rest}
    assert not keys_a & keys_b
    # topic names containing dashes still parse (partition/offset are the
    # LAST two filename segments)
    c = FileSpoolShareClient(str(tmp_path / "spool2"))
    c.offer([{"topic": "my-dashed-topic", "partition": 3, "offset": 17,
              "key": None, "value": "x", "timestamp_ms": 0}])
    (ref,) = c.lease_batch(1)
    assert (ref.topic, ref.partition, ref.offset) == ("my-dashed-topic", 3, 17)


def _preader(tmp_path, max_poll=100, lease_ms=30_000):
    import json

    from console_datagen_spark.sources.share_group import (
        ShareGroupPartitionedReader,
    )

    return ShareGroupPartitionedReader(
        {
            "client_factory": FACTORY,
            "client_kwargs": json.dumps(
                {"spool_dir": str(tmp_path / "spool"), "lease_ms": lease_ms}
            ),
            "max_poll_records": str(max_poll),
        }
    )


def test_partitioned_reader_splits_by_topic_partition(tmp_path):
    from console_datagen_spark.sources.share_group import read_spooled_rows

    client = _spool(tmp_path, n=12)  # 3 topics x 2 partitions
    r = _preader(tmp_path)
    start = r.initialOffset()
    end = r.latestOffset()
    assert end == {"seq": 12}
    splits = r.partitions(start, end)
    # one split per (topic, partition) -- per-partition lease accounting
    assert sorted((s.topic, s.partition) for s in splits) == [
        ("t0", 0), ("t0", 1), ("t1", 0), ("t1", 1), ("t2", 0), ("t2", 1),
    ]
    rows = [row for s in splits for row in read_spooled_rows(s)]
    assert len(rows) == 12
    # payload metadata agrees with the split assignment
    for s in splits:
        for row in read_spooled_rows(s):
            assert (row[0], row[1]) == (s.topic, s.partition)
    # nothing settled until commit
    assert client.pending() == 12
    r.commit(end)
    assert client.pending() == 0


def test_partitioned_reader_pickles_without_client_state(tmp_path):
    """Spark ships the reader to executors for read(); the pickled copy
    must exclude the client and lease table (a socket-holding wire client
    must never be forced through serialization)."""
    import pickle

    _spool(tmp_path, n=4)
    r = _preader(tmp_path)
    end = r.latestOffset()
    splits = r.partitions(r.initialOffset(), end)
    # make the driver-side client un-picklable, as a real wire client
    # holding a socket would be
    r._client._socket = __import__("threading").Lock()
    clone = pickle.loads(pickle.dumps(r))
    assert clone._client is None and clone._batches == {}
    # the executor-side copy still serves reads from its split argument
    rows = [row for s in splits for row in clone.read(s)]
    assert len(rows) == 4
    # driver instance unaffected: commit still settles its leases
    del r._client._socket
    r.commit(end)


def test_partitioned_reader_commit_respects_batch_boundaries(tmp_path):
    client = _spool(tmp_path, n=6)
    r = _preader(tmp_path, max_poll=4)
    o0 = r.initialOffset()
    o1 = r.latestOffset()  # leases 4
    o2 = r.latestOffset()  # leases remaining 2
    assert (o1, o2) == ({"seq": 4}, {"seq": 6})
    # Spark plans each micro-batch range before committing it
    assert sum(len(s.records) for s in r.partitions(o0, o1)) == 4
    assert sum(len(s.records) for s in r.partitions(o1, o2)) == 2
    r.commit(o1)  # settles only batch 1's four records
    assert client.pending() == 2
    r.commit(o2)
    assert client.pending() == 0


def test_partitioned_reader_crash_redelivers(tmp_path):
    _spool(tmp_path, n=3, lease_ms=50)
    r = _preader(tmp_path, lease_ms=50)
    r.latestOffset()  # leases all 3, then the "driver dies" -- no commit
    time.sleep(0.06)
    r2 = _preader(tmp_path)
    end = r2.latestOffset()
    assert end == {"seq": 3}  # expired leases redelivered as new deliveries
    # replaying the dead driver's range yields the empty sentinel split
    splits = r2.partitions({"seq": 90}, {"seq": 93})
    assert len(splits) == 1 and splits[0].records == []
    # serving the batch then committing settles it
    r2.partitions(r2.initialOffset(), end)
    r2.commit(end)
    probe = FileSpoolShareClient(str(tmp_path / "spool"))
    assert probe.pending() == 0


def test_partitioned_source_counts_match_classic_topology(spark, tmp_path):
    """End-to-end through Spark: the partition-parallel share source feeds
    count_records unchanged and matches the S2 batch result, with every
    record individually settled."""
    from console_datagen_spark.sources.kafka_io import (
        share_group_source_partitioned,
    )
    from console_datagen_spark.streaming.counters import count_records

    records = [
        {
            "topic": f"t{i % 3}",
            "partition": i % 2,
            "offset": i,
            "key": f"k{i}",
            "value": f"v{i}",
            "timestamp_ms": 1_700_000_000_000 + i,
        }
        for i in range(60)
    ]
    FileSpoolShareClient(str(tmp_path / "spool")).offer(records)

    stream = share_group_source_partitioned(
        spark,
        client_factory=FACTORY,
        client_kwargs={"spool_dir": str(tmp_path / "spool"), "lease_ms": 300_000},
        max_poll_records=25,  # force multiple micro-batches
    )
    q = (
        count_records(stream, cluster="share")
        .writeStream.format("memory")
        .queryName("share_counts_part")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    probe = FileSpoolShareClient(str(tmp_path / "spool"))
    deadline = time.time() + 120
    while probe.pending() > 10 and time.time() < deadline:
        time.sleep(0.2)
    probe.offer(
        [{"topic": "flush", "partition": 0, "offset": 10**6, "key": None,
          "value": None, "timestamp_ms": 1_700_000_000_000}]
    )
    while probe.pending() > 1 and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(30)

    got = {
        (r.topic, r.partition): r["count"]
        for r in spark.sql("SELECT * FROM share_counts_part").collect()
    }
    got.pop(("flush", 0), None)
    batch = spark.createDataFrame(
        [(x["topic"], x["partition"], x["offset"]) for x in records],
        "topic STRING, partition INT, offset BIGINT",
    )
    want = {
        (r.topic, r.partition): r["count"]
        for r in count_records(batch, cluster="share").collect()
    }
    assert got == want
    assert probe.pending() <= 1


def test_partitioned_reader_commit_releases_unserved_batches(tmp_path):
    """Restart-misalignment guard: a batch that was leased but never
    served via partitions() must be RELEASED (requeued) by commit, never
    ACCEPT-acked — committing ranges the rebuilt reader never delivered
    would otherwise silently drop records (at-least-once violation)."""
    client = _spool(tmp_path, n=4)
    r = _preader(tmp_path)
    end = r.latestOffset()  # leases all 4; partitions() never called
    assert end == {"seq": 4}
    r.commit(end)
    # nothing was delivered, so nothing may be settled: all 4 records
    # must still be in the spool and immediately re-leasable
    assert client.pending() == 4
    fresh = FileSpoolShareClient(str(tmp_path / "spool"))
    assert len(fresh.poll(10)) == 4

    # the normal path still settles: serve, then commit
    r2 = _preader(tmp_path)
    fresh.close()  # release the probe's leases first
    end2 = r2.latestOffset()
    r2.partitions(r2.initialOffset(), end2)
    r2.commit(end2)
    assert client.pending() == 0
