"""S3: Kafka share-group (queue semantics) emulation.

The reference's share-group consumers (DataGenerator.java:172-180) run
the exact same loop as its classic consumers — poll, then count each
record per (topic, partition) (DataGenerator.java:537-546) — the only
difference is the client: ``KafkaShareConsumer`` gives queue semantics
(each record is *leased* to at most one consumer in the group, must be
acknowledged per-record, and is redelivered if released or the lease
expires). No Spark primitive and no mainstream Python client speaks the
share-group wire protocol (KIP-932 is Java-only as of Kafka 4.x), so
this module emulates the *semantics* behind a narrow client protocol and
plugs them into Spark through the Python DataSource API:

- ``ShareClient`` protocol — ``poll`` / ``acknowledge`` / ``close``,
  the per-record-ack surface KafkaShareConsumer exposes. A real
  wire-protocol client can be dropped in unchanged when one exists; that
  wire gap is the ONLY remaining N/A.
- ``FileSpoolShareClient`` — a working lease-based client over a spool
  directory (each record one JSON file; poll takes a lease, ACCEPT
  deletes, RELEASE or lease expiry requeues). This is the test double
  AND a usable local transport.
- ``ShareGroupStreamReader`` / ``ShareGroupDataSource`` — a
  ``SimpleDataSourceStreamReader`` bridging poll/ack to micro-batches:
  records polled in ``read`` stay leased (buffered for replay via
  ``readBetweenOffsets``) until Spark *commits* the batch, at which
  point every record in the batch is acknowledged ACCEPT — per-record
  ack aligned with Spark's own durability boundary. A crash before
  commit leaves the records unacknowledged, so the broker (or spool)
  redelivers them: at-least-once, the same contract the reference's
  implicit-ack poll loop has.

Downstream, the stream carries the standard envelope (topic, partition,
offset, timestamp), so ``streaming.counters.count_records`` — the S2
topology — consumes it unchanged; the parity test certifies identical
counting semantics.

Scale: share groups exist to fan a queue out to many workers. Two reader
shapes are provided:

- ``ShareGroupStreamReader`` (format ``kafka_share``): the simple
  driver-side poll loop — records AND payloads flow through the driver.
  Right shape for the reference's workload (counting acks).
- ``ShareGroupPartitionedReader`` (format ``kafka_share_partitioned``):
  the scale shape. The DRIVER does per-partition lease accounting only
  (``lease_batch`` takes leases from filename metadata without reading
  payloads — O(records) driver metadata, zero payload bytes), groups the
  leases by Kafka (topic, partition) into ``InputPartition`` splits, and
  EXECUTORS read the payloads in parallel (``read`` runs distributed).
  Acks still settle at the micro-batch commit boundary on the driver —
  the same lease-accounting split Spark's built-in Kafka source uses
  (driver plans offset ranges, executors fetch). Only the KIP-932 wire
  protocol remains N/A; a wire client exposing ``lease_batch`` semantics
  (acquire returning record metadata) drops in unchanged — it does NOT
  need to be picklable: the reader's ``__getstate__`` strips the client
  and lease table from the copy Spark pickles to executors for ``read``.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Iterable, Protocol

SHARE_SCHEMA = (
    "topic STRING, partition INT, offset BIGINT, "
    "key STRING, value STRING, timestamp TIMESTAMP"
)


@dataclass(frozen=True)
class ShareRecord:
    """One leased record. ``delivery_id`` identifies the lease (NOT the
    Kafka offset — share groups may redeliver the same offset under a new
    lease)."""

    delivery_id: str
    topic: str
    partition: int
    offset: int
    key: str | None
    value: str | None
    timestamp_ms: int


@dataclass(frozen=True)
class LeaseRef:
    """A lease WITHOUT its payload — what the driver tracks in the
    partitioned reader. Metadata comes from the spool filename (or, for a
    wire client, the acquire response); the payload is read
    executor-side."""

    delivery_id: str
    path: str
    topic: str
    partition: int
    offset: int


# acknowledge types, KafkaShareConsumer.acknowledge(record, AcknowledgeType)
ACCEPT = "accept"    # done, never redeliver
RELEASE = "release"  # give back for immediate redelivery
REJECT = "reject"    # poison: drop without processing (broker archives it)


class StaleLeaseError(KeyError):
    """Ack refused: the lease expired and the record was re-leased (or
    settled) by another consumer. Mirrors the broker's
    InvalidRecordStateException — acking a record you no longer hold must
    not settle someone else's delivery. The record will be (or was)
    redelivered: at-least-once."""


class ShareClient(Protocol):
    """The narrow surface of KafkaShareConsumer the engine needs."""

    def poll(self, max_records: int) -> list[ShareRecord]:
        """Lease up to ``max_records`` available records."""
        ...

    def acknowledge(self, delivery_id: str, ack_type: str = ACCEPT) -> None:
        """Settle one leased record."""
        ...

    def close(self) -> None: ...


class FileSpoolShareClient:
    """Share-group semantics over a spool directory.

    Layout: ``<dir>/<name>.json`` is an available record;
    ``<dir>/<name>.json.lock`` marks it leased (lock file holds the
    lease's delivery_id + expiry). ACCEPT deletes record+lock, RELEASE
    deletes only the lock (requeue), expiry makes the lock stale so a
    later poll re-leases the record. ``os.O_CREAT | os.O_EXCL`` lock
    creation makes concurrent consumers race-safe on one filesystem —
    each record is held by at most one consumer, the share-group
    invariant.
    """

    ARCHIVE_DIR = "_archive"

    def __init__(
        self,
        spool_dir: str,
        lease_ms: int = 30_000,
        max_delivery_count: int = 5,
        clock=time.time,
    ):
        """``max_delivery_count`` mirrors the broker's
        ``group.share.delivery.count.limit`` (KIP-932 default 5): each
        acquisition increments the record's delivery count (persisted in
        a ``.dc`` sidecar so it survives release/expiry); a record that
        has already been delivered ``max_delivery_count`` times is
        ARCHIVED (moved to ``_archive/``, never redelivered) instead of
        re-leased — the broker's poison-record parking. ``clock`` is
        injectable (seconds, ``time.time`` signature) so conformance
        tests drive lock expiry deterministically."""
        self._dir = spool_dir
        self._lease_ms = lease_ms
        self._max_dc = max_delivery_count
        self._clock = clock
        os.makedirs(os.path.join(spool_dir, self.ARCHIVE_DIR), exist_ok=True)
        self._held: dict[str, str] = {}  # delivery_id -> record path

    # -- producer side (test/local harness) --------------------------------
    def offer(self, records: Iterable[dict]) -> None:
        """Spool records (dicts with topic/partition/offset/key/value/
        timestamp_ms) — the stand-in for broker appends."""
        for rec in records:
            name = f"{rec['topic']}-{rec['partition']}-{rec['offset']}.json"
            tmp = os.path.join(self._dir, f".{name}.tmp")
            with open(tmp, "w") as f:
                json.dump(rec, f)
            os.replace(tmp, os.path.join(self._dir, name))

    # -- consumer side ------------------------------------------------------
    def _try_lease(self, name: str, now: float) -> tuple[str, str] | None:
        """Race-safe lease attempt on one spool record; returns
        (delivery_id, path) or None if the record is held elsewhere or
        was archived (delivery-count cap)."""
        path = os.path.join(self._dir, name)
        lock = path + ".lock"
        if os.path.exists(lock):
            stale = False
            try:
                with open(lock) as f:
                    held = json.load(f)
                stale = held.get("expires_ms", 0) <= now
            except ValueError:
                # a VALID lock always holds complete JSON (the holder
                # writes it before returning), so an empty/unparseable
                # lock is a crash wreck from the window between lock
                # creation and the lease dump — reclaim it rather than
                # wedging the record forever (r11 ADVICE). The
                # microsecond mid-write race this opens is plain
                # at-least-once redelivery, which lease expiry already
                # produces.
                stale = True
            except OSError:
                return None  # vanished mid-check: another consumer acted
            if not stale:
                return None  # live lease elsewhere
            try:
                os.remove(lock)  # stale/wrecked lease: reclaim
            except FileNotFoundError:
                pass  # lost the reclaim race; fall through to O_EXCL
        delivery_id = uuid.uuid4().hex
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return None  # another consumer won the race
        # holding the lock makes the delivery-count read/increment
        # single-writer: a record already delivered max times is parked
        # (KIP-932 delivery-count limit), everything else increments
        dc = self._delivery_count(path)
        if dc >= self._max_dc:
            os.close(fd)  # raw fd from os.open is not GC'd — don't leak
            self._archive(path, lock)
            return None
        with open(path + ".dc", "w") as f:
            f.write(str(dc + 1))
        with os.fdopen(fd, "w") as f:
            json.dump(
                {"delivery_id": delivery_id, "expires_ms": now + self._lease_ms},
                f,
            )
        return delivery_id, path

    def _delivery_count(self, path: str) -> int:
        try:
            with open(path + ".dc") as f:
                return int(f.read().strip() or 0)
        except (OSError, ValueError):
            return 0

    def _archive(self, path: str, lock: str) -> None:
        """Park a record for good: moved to ``_archive/`` (the broker
        archives rejected / delivery-capped records rather than deleting
        them), sidecars removed."""
        dest = os.path.join(
            self._dir, self.ARCHIVE_DIR, os.path.basename(path)
        )
        try:
            os.replace(path, dest)
        except FileNotFoundError:
            pass
        for p in (lock, path + ".dc"):
            try:
                os.remove(p)
            except FileNotFoundError:
                pass

    def poll(self, max_records: int) -> list[ShareRecord]:
        out: list[ShareRecord] = []
        now = self._clock() * 1000
        for name in sorted(os.listdir(self._dir)):
            if len(out) >= max_records:
                break
            if not name.endswith(".json"):
                continue
            leased = self._try_lease(name, now)
            if leased is None:
                continue
            delivery_id, path = leased
            try:
                with open(path) as f:
                    rec = json.load(f)
            except (OSError, ValueError):
                os.remove(path + ".lock")
                continue
            self._held[delivery_id] = path
            out.append(
                ShareRecord(
                    delivery_id=delivery_id,
                    topic=rec["topic"],
                    partition=int(rec["partition"]),
                    offset=int(rec["offset"]),
                    key=rec.get("key"),
                    value=rec.get("value"),
                    timestamp_ms=int(rec.get("timestamp_ms", 0)),
                )
            )
        return out

    def lease_batch(self, max_records: int) -> list[LeaseRef]:
        """Lease up to ``max_records`` WITHOUT reading payloads — the
        driver-side half of the partitioned reader. Topic/partition/offset
        parse from the spool filename (``{topic}-{partition}-{offset}.json``,
        topic may itself contain dashes — partition/offset are the last two
        segments), so the driver touches O(records) filenames and zero
        payload bytes; executors read the payloads."""
        out: list[LeaseRef] = []
        now = self._clock() * 1000
        for name in sorted(os.listdir(self._dir)):
            if len(out) >= max_records:
                break
            if not name.endswith(".json"):
                continue
            try:
                topic, p, off = name[:-5].rsplit("-", 2)
                partition, offset = int(p), int(off)
            except ValueError:
                continue  # not a spool record
            leased = self._try_lease(name, now)
            if leased is None:
                continue
            delivery_id, path = leased
            self._held[delivery_id] = path
            out.append(LeaseRef(delivery_id, path, topic, partition, offset))
        return out

    def acknowledge(self, delivery_id: str, ack_type: str = ACCEPT) -> None:
        path = self._held.pop(delivery_id, None)
        if path is None:
            raise KeyError(f"unknown or already-settled delivery {delivery_id}")
        lock = path + ".lock"
        # ownership check: if the lease expired and another consumer
        # re-leased (lock rewritten with a new delivery_id) or settled
        # (lock gone) the record, this ack is stale and must not touch it.
        # An EXPIRED-but-unclaimed lease is equally stale: the broker
        # enforces the acquisition-lock timeout server-side and refuses
        # late acks whether or not the record was re-acquired yet (the
        # stale lock stays for the next poll to reclaim — same outcome
        # as the broker's automatic return to Available).
        try:
            with open(lock) as f:
                held = json.load(f)
            if held.get("delivery_id") != delivery_id:
                raise StaleLeaseError(delivery_id)
            if held.get("expires_ms", 0) <= self._clock() * 1000:
                raise StaleLeaseError(delivery_id)
        except (OSError, ValueError):
            raise StaleLeaseError(delivery_id) from None
        if ack_type == ACCEPT:
            # settled for good
            for p in (path, lock, path + ".dc"):
                try:
                    os.remove(p)
                except FileNotFoundError:
                    pass
        elif ack_type == REJECT:
            # poison record: ARCHIVED broker-side (KIP-932), not deleted —
            # never redelivered, but inspectable
            self._archive(path, lock)
        elif ack_type == RELEASE:
            try:
                os.remove(lock)  # record becomes available again
            except FileNotFoundError:
                pass
        else:
            raise ValueError(f"unknown ack type {ack_type!r}")

    def close(self) -> None:
        # release everything still held — poll-loop shutdown must not
        # strand leases until expiry (KafkaShareConsumer.close does this)
        for delivery_id in list(self._held):
            try:
                self.acknowledge(delivery_id, RELEASE)
            except StaleLeaseError:
                pass  # already expired+reclaimed elsewhere: nothing to free

    def pending(self) -> int:
        """Records not yet settled (available + leased) — test hook."""
        return sum(1 for n in os.listdir(self._dir) if n.endswith(".json"))

    def archived(self) -> list[str]:
        """Parked record names (rejected or delivery-capped) — test hook."""
        return sorted(os.listdir(os.path.join(self._dir, self.ARCHIVE_DIR)))


def _load_factory(path: str):
    """'pkg.mod:callable' -> the callable (DataSource options are strings,
    so the client is injected by importable name, like a format class)."""
    mod_name, _, attr = path.partition(":")
    if not attr:
        raise ValueError(
            f"client_factory must be 'module:callable', got {path!r}"
        )
    import importlib

    return getattr(importlib.import_module(mod_name), attr)


# deferred: pyspark.sql.datasource imports are grouped here so the pure
# client half of the module stays importable without a Spark session
from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class ShareGroupStreamReader(SimpleDataSourceStreamReader):
    """poll/ack loop → micro-batches.

    Offsets are local delivery sequence numbers (share groups have no
    consumer-visible position — the queue is the position). Records stay
    leased AND buffered between ``read`` and ``commit``:

    - ``read``: poll up to ``max_poll_records``, assign sequence ids,
      buffer.
    - ``readBetweenOffsets``: replay from the buffer (failure recovery
      within an uncommitted range).
    - ``commit(end)``: acknowledge ACCEPT every buffered record below
      ``end`` — the per-record ack, batched at Spark's durability
      boundary. Crash before commit ⇒ nothing acked ⇒ broker redelivers
      (at-least-once, exactly like the reference's implicit-ack loop).
    """

    def __init__(self, options: dict):
        factory_path = options.get("client_factory")
        if not factory_path:
            raise ValueError(
                "kafka_share requires .option('client_factory', 'module:callable')"
            )
        kwargs = json.loads(options.get("client_kwargs", "{}"))
        self._client: ShareClient = _load_factory(factory_path)(**kwargs)
        self._max_poll = int(options.get("max_poll_records", 500))
        self._seq = 0
        self._buffer: dict[int, ShareRecord] = {}

    def initialOffset(self) -> dict:
        return {"seq": 0}

    @staticmethod
    def _row(rec: ShareRecord) -> tuple:
        from datetime import datetime, timezone

        ts = datetime.fromtimestamp(rec.timestamp_ms / 1000, tz=timezone.utc)
        return (rec.topic, rec.partition, rec.offset, rec.key, rec.value, ts)

    def read(self, start: dict):
        # contract: returns (ITERATOR of tuples, end offset) — Spark's
        # prefetch cache calls next() on it; a plain list raises TypeError
        lo = start["seq"]
        if lo < self._seq:
            # replay of a half-committed range: serve the buffer
            rows = [
                self._row(self._buffer[s]) for s in range(lo, self._seq)
                if s in self._buffer
            ]
            return iter(rows), {"seq": self._seq}
        recs = self._client.poll(self._max_poll)
        rows = []
        for rec in recs:
            self._buffer[self._seq] = rec
            rows.append(self._row(rec))
            self._seq += 1
        return iter(rows), {"seq": self._seq}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            self._row(self._buffer[s])
            for s in range(start["seq"], end["seq"])
            if s in self._buffer
        )

    def commit(self, end: dict) -> None:
        for s in [s for s in self._buffer if s < end["seq"]]:
            try:
                self._client.acknowledge(self._buffer.pop(s).delivery_id, ACCEPT)
            except StaleLeaseError:
                # lease outlived by a slow batch: the record was reclaimed
                # and will be redelivered under a new lease — at-least-once,
                # same as a share consumer whose acquisition lock lapsed.
                # Size lease_ms > max batch+commit latency to avoid this.
                pass


class ShareGroupDataSource(DataSource):
    """``kafka_share`` — register with
    ``spark.dataSource.register(ShareGroupDataSource)`` and read with
    ``readStream.format("kafka_share").option("client_factory", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "kafka_share"

    def schema(self) -> str:
        return SHARE_SCHEMA

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return ShareGroupStreamReader(self.options)


@dataclass
class SharePartitionSplit(InputPartition):
    """One Kafka (topic, partition)'s leased records for one micro-batch.
    Carries paths + metadata only — executors read the payloads."""

    topic: str
    partition: int
    records: list  # [(path, offset)], lease held by the driver


def read_spooled_rows(split: "SharePartitionSplit"):
    """Executor-side payload read for one split (module-level so the
    closure pickles without the reader/client state)."""
    from datetime import datetime, timezone

    for path, offset in split.records:
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            # settled/expired underneath us (lease lapsed mid-batch): skip —
            # the record redelivers under a new lease, at-least-once
            continue
        ts = datetime.fromtimestamp(
            int(rec.get("timestamp_ms", 0)) / 1000, tz=timezone.utc
        )
        yield (
            rec["topic"],
            int(rec["partition"]),
            int(rec["offset"]),
            rec.get("key"),
            rec.get("value"),
            ts,
        )


class ShareGroupPartitionedReader(DataSourceStreamReader):
    """The scale shape: driver-side lease ACCOUNTING, executor-side DATA.

    Per micro-batch:

    - ``latestOffset`` (driver): ``lease_batch`` acquires up to
      ``max_poll_records`` leases — filename metadata only, no payload
      bytes through the driver — and records them against the batch's
      sequence range.
    - ``partitions`` (driver): group that range's leases by Kafka
      (topic, partition) into one ``InputPartition`` per partition — the
      per-partition lease accounting the Java client keeps internally.
    - ``read`` (EXECUTORS): each split reads its own payloads in
      parallel; aggregation continues distributed downstream.
    - ``commit`` (driver): acknowledge ACCEPT every lease in ranges below
      ``end`` — per-record ack at Spark's durability boundary, exactly
      like the simple reader.

    Crash before commit: the in-memory lease table dies with the driver,
    the leases expire, the spool redelivers — at-least-once. After a
    restart the rebuilt reader's sequence numbers restart at 0 while
    Spark's checkpoint carries the old high-water mark, so batch ranges
    can misalign with the stored lease table; commit therefore only
    ACCEPTs batches that ``partitions`` actually served to Spark, and
    RELEASEs (requeues) any unserved batch falling below the commit
    offset — a record is either delivered-then-acked or redelivered,
    never silently dropped.
    """

    def __init__(self, options: dict):
        factory_path = options.get("client_factory")
        if not factory_path:
            raise ValueError(
                "kafka_share_partitioned requires "
                ".option('client_factory', 'module:callable')"
            )
        kwargs = json.loads(options.get("client_kwargs", "{}"))
        self._client = _load_factory(factory_path)(**kwargs)
        if not hasattr(self._client, "lease_batch"):
            raise ValueError(
                "partitioned share reader needs a client with lease_batch() "
                "(metadata-only acquire); use format 'kafka_share' for "
                "poll-based clients"
            )
        self._max_poll = int(options.get("max_poll_records", 500))
        self._seq = 0
        # {(lo, hi): ([LeaseRef], served)} for every uncommitted batch
        self._batches: dict[tuple[int, int], tuple[list[LeaseRef], bool]] = {}

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def latestOffset(self) -> dict:
        leases = self._client.lease_batch(self._max_poll)
        lo, hi = self._seq, self._seq + len(leases)
        if leases:
            self._batches[(lo, hi)] = (leases, False)
            self._seq = hi
        return {"seq": self._seq}

    def partitions(self, start: dict, end: dict):
        by_tp: dict[tuple[str, int], list] = {}
        for (lo, hi), (leases, _served) in self._batches.items():
            if lo >= start["seq"] and hi <= end["seq"]:
                self._batches[(lo, hi)] = (leases, True)
                for ref in leases:
                    by_tp.setdefault((ref.topic, ref.partition), []).append(
                        (ref.path, ref.offset)
                    )
        if not by_tp:
            # empty batch, or a post-restart replay of a range whose leases
            # died with the previous driver (records will redeliver)
            return [SharePartitionSplit("", -1, [])]
        return [
            SharePartitionSplit(t, p, recs)
            for (t, p), recs in sorted(by_tp.items())
        ]

    def __getstate__(self):
        # Spark pickles the READER to executors so read() can run there,
        # but read() only uses its split argument — exclude the client
        # and the lease table from the executor payload. This is also
        # what makes the "wire client drops in unchanged" claim true: a
        # socket-holding client never needs to be picklable, because only
        # the driver-resident instance ever touches self._client.
        state = self.__dict__.copy()
        state["_client"] = None
        state["_batches"] = {}
        return state

    def read(self, partition: SharePartitionSplit):
        return read_spooled_rows(partition)

    def commit(self, end: dict) -> None:
        keep: dict[tuple[int, int], tuple[list[LeaseRef], bool]] = {}
        for (lo, hi), (leases, served) in self._batches.items():
            if hi > end["seq"]:
                keep[(lo, hi)] = (leases, served)
                continue
            # served batches settle for good; an unserved batch below the
            # commit offset (range misalignment after a restart) must NOT
            # be accepted — release it so the records redeliver
            ack = ACCEPT if served else RELEASE
            for ref in leases:
                try:
                    self._client.acknowledge(ref.delivery_id, ack)
                except StaleLeaseError:
                    pass  # lease lapsed mid-batch: redelivers, at-least-once
        self._batches = keep

    def stop(self) -> None:
        self._client.close()


class SharePartitionedDataSource(DataSource):
    """``kafka_share_partitioned`` — the partition-parallel share source:
    ``spark.dataSource.register(SharePartitionedDataSource)``, then
    ``readStream.format("kafka_share_partitioned")`` with the same
    ``client_factory`` / ``client_kwargs`` / ``max_poll_records`` options
    as ``kafka_share``."""

    @classmethod
    def name(cls) -> str:
        return "kafka_share_partitioned"

    def schema(self) -> str:
        return SHARE_SCHEMA

    def streamReader(self, schema) -> DataSourceStreamReader:
        return ShareGroupPartitionedReader(self.options)
