"""StreamingQueryListener → connectivity/progress health (SURVEY §2.1 S9).

The reference's AdminConnectivityCheck counts reachable clusters and the
progress checks diff counter snapshots (AdminConnectivityCheck.java:27-54).
In Spark, liveness/progress of each streaming query arrives for free via
the listener bus; this module accumulates the latest progress per query
and renders the same UP/DOWN style summary the health endpoint serves.
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class QueryHealth:
    query_id: str
    name: str | None
    batches_seen: int = 0
    rows_seen: int = 0
    last_batch_rows: int = 0
    active: bool = True
    error: str | None = None


@dataclass
class HealthBoard:
    """Thread-safe latest-state per streaming query."""

    _lock: threading.Lock = field(default_factory=threading.Lock)
    queries: dict[str, QueryHealth] = field(default_factory=dict)

    def snapshot(self) -> dict[str, QueryHealth]:
        with self._lock:
            return dict(self.queries)

    def summary(self) -> dict:
        snap = self.snapshot()
        active = [q for q in snap.values() if q.active and q.error is None]
        return {
            "queries": len(snap),
            "active": len(active),
            "failed": sum(1 for q in snap.values() if q.error),
            "total_rows": sum(q.rows_seen for q in snap.values()),
            "status": "UP" if snap and len(active) == len(snap) else "DOWN",
        }


class ProgressHealthListener(StreamingQueryListener):
    """Feeds a HealthBoard from the listener bus."""

    def __init__(self, board: HealthBoard):
        self.board = board

    def onQueryStarted(self, event):  # noqa: N802
        with self.board._lock:
            self.board.queries[str(event.id)] = QueryHealth(
                query_id=str(event.id), name=event.name
            )

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        rows = p.numInputRows if hasattr(p, "numInputRows") else (
            json.loads(p.json).get("numInputRows", 0)
        )
        with self.board._lock:
            q = self.board.queries.setdefault(
                str(p.id), QueryHealth(query_id=str(p.id), name=p.name)
            )
            q.batches_seen += 1
            q.last_batch_rows = int(rows or 0)
            q.rows_seen += int(rows or 0)

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        with self.board._lock:
            q = self.board.queries.get(str(event.id))
            if q is not None:
                q.active = False
                q.error = str(event.exception) if event.exception else None


def install_health_listener(spark: SparkSession) -> tuple[HealthBoard, ProgressHealthListener]:
    board = HealthBoard()
    listener = ProgressHealthListener(board)
    spark.streams.addListener(listener)
    return board, listener
