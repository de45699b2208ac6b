"""Pluggable generator via the Python DataSource API (Spark 4).

``spark.read.format("console_datagen")`` / ``readStream.format(...)`` —
the same deterministic records as sources/generator.py (a pure function
of the row id), exposed through Spark's user-defined data source surface
so the generator composes like any built-in source: schema inference,
``.option()`` configuration, partition-parallel batch reads, and
micro-batch streaming with durable offsets.

The pure-SQL generator (sources/generator.py) remains the throughput
path — its expressions run inside whole-stage codegen, while a Python
data source crosses the Arrow boundary per batch. This source exists for
the *API surface* (a user can point existing ``spark.read`` plumbing at
it) and is verified byte-identical to the SQL path in
tests/test_datasource.py, so the two can't drift.

Reference parity: the record shape follows DataGenerator.java:455-535
(key/value JSON, headers, round-robin topic) exactly as documented in
sources/generator.py.
"""

from __future__ import annotations

import base64
import hashlib
import json
from collections.abc import Iterator, Sequence
from dataclasses import dataclass
from datetime import date, datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..naming import all_topic_names
from .generator import (
    ANIMALS,
    BEER_NAMES,
    BEER_STYLES,
    CITIES,
    COUNTRIES,
    FIRST_NAMES,
    GEN_EPOCH,
    LAST_NAMES,
    PAYLOAD_BYTES,
    REGIONS,
    SEED,
    STREETS,
)

SCHEMA = (
    "record_id BIGINT, key_json STRING, value_json STRING, "
    "topic STRING, h_country STRING, h_animal STRING"
)

_EPOCH = datetime.strptime(GEN_EPOCH, "%Y-%m-%d %H:%M:%S")
_BIRTH_BASE = date(1960, 1, 1)


def _pick(words: Sequence[str], prime: int, off: int, i: int) -> str:
    return words[(i * prime + off) % len(words)]


def _hash_digits(fmt: str, tag: str, mods: list[int], i: int) -> str:
    h = hashlib.md5(f"{tag}:{i}".encode()).hexdigest()
    vals = tuple(int(h[6 * j : 6 * j + 6], 16) % m for j, m in enumerate(mods))
    return fmt % vals


def _payload(seed: int, i: int) -> str:
    blocks = "".join(
        hashlib.sha256(f"{seed}:{i}:{j}".encode()).hexdigest()
        for j in range((PAYLOAD_BYTES + 31) // 32)
    )
    raw = bytes.fromhex(blocks[: PAYLOAD_BYTES * 2])
    return base64.b64encode(raw).decode()


def _compact(obj: dict) -> str:
    return json.dumps(obj, separators=(",", ":"))


def gen_row(i: int, topics: list[str], seed: int = SEED) -> tuple:
    """One generated record — field-for-field the SQL expressions of
    generator.gen_select_exprs, in Python (verified byte-identical)."""
    key = {
        "storeId": _hash_digits("%03d-%02d-%04d", "store", [1000, 100, 10000], i),
        "operatorId": _hash_digits("%03d-%02d-%04d", "op", [1000, 100, 10000], i),
        "messageId": _hash_digits("%03d-%02d-%04d", "msg", [1000, 100, 10000], i),
    }
    value = {
        "timestamp": (_EPOCH + timedelta(seconds=i)).strftime("%Y-%m-%dT%H:%M:%SZ"),
        "user": {
            "lastName": _pick(LAST_NAMES, 79, 71, i),
            "firstName": _pick(FIRST_NAMES, 83, 73, i),
            "birthDate": (
                _BIRTH_BASE + timedelta(days=(i * 17 + 5) % 18250)
            ).isoformat()
            + "T00:00:00Z",
            "address": {
                "number": str((i * 41 + 31) % 9999 + 1),
                "street": _pick(STREETS, 43, 37, i),
                "city": _pick(CITIES, 47, 41, i),
                "region": _pick(REGIONS, 53, 43, i),
                "postalCode": "%05d" % ((i * 59 + 47) % 100000),
            },
            "favoriteBeers": [
                {
                    "name": _pick(BEER_NAMES, 61, 53, i),
                    "style": _pick(BEER_STYLES, 67, 59, i),
                },
                {
                    "name": _pick(BEER_NAMES, 71, 61, i),
                    "style": _pick(BEER_STYLES, 73, 67, i),
                },
            ],
        },
        "payload": _payload(seed, i),
    }
    return (
        i,
        _compact(key),
        _compact(value),
        topics[i % len(topics)],
        _pick(COUNTRIES, 89, 79, i),
        _pick(ANIMALS, 97, 83, i),
    )


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class _Options:
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numpartitions", 8))
        self.seed = int(options.get("seed", SEED))
        self.rows_per_batch = int(options.get("rowsperbatch", 100))
        topics = options.get("topics")
        self.topics = (
            topics.split(",") if topics else all_topic_names(1, 1, 1, 1)
        )


class DatagenBatchReader(DataSourceReader):
    def __init__(self, opts: _Options):
        self._o = opts

    def partitions(self) -> Sequence[InputPartition]:
        o = self._o
        per = max(1, -(-o.n // o.num_partitions))  # ceil division
        return [
            _RangePartition(lo, min(lo + per, o.n))
            for lo in range(0, o.n, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        o = self._o
        for i in range(partition.start, partition.end):
            yield gen_row(i, o.topics, o.seed)


class DatagenStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream of the same records: the offset is simply the
    next record id, so restarts resume exactly (offsets are durable in
    the checkpoint — same replayability contract as the rate source)."""

    def __init__(self, opts: _Options):
        self._o = opts

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        # materialized (not a generator): the driver pickles the prefetched
        # rows into its offset cache for replay on failure
        o = self._o
        lo = start["next"]
        hi = lo + o.rows_per_batch
        rows = [gen_row(i, o.topics, o.seed) for i in range(lo, hi)]
        return rows, {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        o = self._o
        return [
            gen_row(i, o.topics, o.seed) for i in range(start["next"], end["next"])
        ]


class DatagenDataSource(DataSource):
    """``console_datagen`` — register with
    ``spark.dataSource.register(DatagenDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "console_datagen"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return DatagenBatchReader(_Options(self.options))

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return DatagenStreamReader(_Options(self.options))


# ---- counter sink (write side of the Python DataSource API) ---------------
#
# The reference counts every produced record in the send callback and
# keeps a per-(topic, partition) running map (DataGenerator.java:512-520,
# 548-551). The DataSourceStreamWriter protocol has the same shape:
# executors return a WriterCommitMessage per task, the driver's commit()
# folds them — so the counter state lives where the reference's did (the
# driver), fed by distributed acks, with abort() discarding failed
# batches. Delivery to the log is effectively-once: a crash between sink
# commit and checkpoint write re-delivers the batch, and commit() skips
# batch_ids already present in the log, so readers see one line per batch
# without having to dedup themselves.

from pyspark.sql.datasource import (  # noqa: E402  (grouped with writer)
    DataSourceStreamWriter,
    WriterCommitMessage,
)


@dataclass
class CountMessage(WriterCommitMessage):
    counts: dict  # (topic -> rows written by this task)


class CounterStreamWriter(DataSourceStreamWriter):
    """Counts rows per topic; commit() appends one JSON line per batch to
    ``path`` (the durable counter log a health check can tail)."""

    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("console_datagen_counter sink requires .option('path')")

    def write(self, rows) -> CountMessage:
        counts: dict = {}
        for r in rows:
            t = r["topic"] if "topic" in r.__fields__ else "_all"
            counts[t] = counts.get(t, 0) + 1
        return CountMessage(counts=counts)

    def commit(self, messages, batchId: int) -> None:
        import json as _json
        import os as _os

        # idempotent by batch_id: a crash between this append and the
        # checkpoint write makes Structured Streaming re-run the batch,
        # and re-committing the same id must not produce a second line
        if _os.path.exists(self._path):
            with open(self._path) as f:
                for line in f:
                    try:
                        if _json.loads(line).get("batch_id") == batchId:
                            return
                    except ValueError:
                        continue
        total: dict = {}
        for m in messages:
            if m is None:
                continue
            for t, n in m.counts.items():
                total[t] = total.get(t, 0) + n
        with open(self._path, "a") as f:
            f.write(_json.dumps({"batch_id": batchId, "counts": total}) + "\n")

    def abort(self, messages, batchId: int) -> None:
        # failed batch: counts are discarded, never logged — replay will
        # re-deliver the same batch_id
        pass


class DatagenCounterSink(DataSource):
    """``console_datagen_counter`` — register with
    ``spark.dataSource.register(DatagenCounterSink)`` and use as
    ``writeStream.format("console_datagen_counter").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "console_datagen_counter"

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return CounterStreamWriter(self.options)
