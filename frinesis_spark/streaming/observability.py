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
same "stats, not data" contract as the reference's StatReceiver. The
retained event lists are BOUNDED (``deque(maxlen=...)``) with running
counters carrying the exact totals, so a listener left registered
across a long session cannot grow driver memory without limit — the
reference's Events channel is likewise a bounded buffer
(event.go / the channel's capacity), not an unbounded log.
"""

from __future__ import annotations

import threading
from collections import deque
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener

# Retained events per category. Totals (rows in/written, progress
# count) are running counters and stay exact past the horizon; the
# deques only bound the per-event detail kept for inspection.
_EVENT_RETENTION = 1024


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
    the reference's per-topic fan-in (sink.go:96-100). Event detail
    retention is bounded at ``_EVENT_RETENTION`` per category
    (r9 review wave 2: a long-lived listener previously accumulated
    every micro-batch's progress dict forever); ``stats()`` totals
    come from running counters and remain exact regardless.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.started: deque = deque(maxlen=_EVENT_RETENTION)
        self.progress: deque = deque(maxlen=_EVENT_RETENTION)
        self.terminated: deque = deque(maxlen=_EVENT_RETENTION)
        self._n_progress = 0
        self._rows_in = 0
        self._rows_written = 0

    # StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.started.append((event.id, event.name))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        sink_rows = getattr(p.sink, "numOutputRows", -1)
        with self._lock:
            self.progress.append(
                {
                    "id": str(p.id),
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "sink_rows": sink_rows,
                }
            )
            self._n_progress += 1
            self._rows_in += p.numInputRows
            if sink_rows >= 0:
                self._rows_written += sink_rows

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self.terminated.append((event.id, event.exception))

    # Reference-shaped summary -----------------------------------------
    def stats(self) -> StreamStats:
        with self._lock:
            return StreamStats(
                n_progress_events=self._n_progress,
                rows_in=self._rows_in,
                rows_written=self._rows_written,
                errors=[e for _, e in self.terminated if e],
            )
