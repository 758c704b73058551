"""Async event/stats surface for streaming queries — the Spark-native
form of the reference's `Events()` channel and periodic StatsBatch
(SURVEY.md §2A A14/A15: /root/reference/batchproducer/event.go:4-22,
batchproducer.go:58-66 + :458-470, surfaced via sink.go:107-109).

The reference pushes errors and stats to the caller on Go channels; a
Spark engine gets the same decoupled observability from a
``StreamingQueryListener``: the scheduler calls back off the query
thread with progress (rows/sec, batch durations, state-store metrics)
and termination (incl. exception) events. :class:`EngineEventLog`
retains them thread-safely and distills the reference's StatsBatch
fields.

Scale: listener callbacks run on the driver only and see per-batch
AGGREGATED metrics (constant size regardless of executor count) — the
same "stats, not data" contract as the reference's StatReceiver.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class StreamStats:
    """The reference's StatsBatch fields, distilled per snapshot
    (batchproducer.go:58-66 — buffer size ≙ none here; errors, sent,
    dropped map to exception events and sink row counts)."""

    n_progress_events: int = 0
    rows_in: int = 0
    rows_written: int = 0
    errors: list = field(default_factory=list)


class EngineEventLog(StreamingQueryListener):
    """Collects started/progress/terminated events for all queries on
    the session; ``stats()`` returns a point-in-time summary.

    Register with ``spark.streams.addListener(log)``; remove with
    ``removeListener``. Multiple queries multiplex into one log, like
    the reference's per-topic fan-in (sink.go:96-100).
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.started: list = []
        self.progress: list = []
        self.terminated: list = []

    # StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.started.append((event.id, event.name))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            self.progress.append(
                {
                    "id": str(p.id),
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "sink_rows": getattr(p.sink, "numOutputRows", -1),
                }
            )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self.terminated.append((event.id, event.exception))

    # Reference-shaped summary -----------------------------------------
    def stats(self) -> StreamStats:
        with self._lock:
            return StreamStats(
                n_progress_events=len(self.progress),
                rows_in=sum(p["numInputRows"] for p in self.progress),
                rows_written=sum(
                    p["sink_rows"] for p in self.progress if p["sink_rows"] >= 0
                ),
                errors=[e for _, e in self.terminated if e],
            )
