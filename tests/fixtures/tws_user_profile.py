"""RETIRED (r9): transformWithStateInPandas reference implementation.

Kept as a fixture, not a registered operator: the TWS worker protocol
requires ``google.protobuf``, which this container has lacked for
eight straight rounds (r9 final check: `import google.protobuf` fails
and a filesystem search finds no wheel or site-packages copy to
vendor; installing packages is out of scope for this environment).
``stream_user_profile`` (frinesis_spark/streaming/stateful.py)
carries the same semantics on ``applyInPandasWithState`` and is
driver-verified. If a future environment ships protobuf, move this
module back to ``frinesis_spark/streaming/tws.py``, register
``stream_tws_user_profile``, and reuse the batch GROUP BY oracle from
``stream_user_profile``.

Original module docstring follows.
"""

"""Arbitrary stateful operator on the ``transformWithStateInPandas``
API (Spark 4): per-user activity profile with TYPED state variables.

Where ``applyInPandasWithState`` (streaming/stateful.py) gives one
flat state tuple, transformWithState is the successor surface the
engine also exposes: named typed state (ValueState / MapState here),
per-variable TTL support, timers, and RocksDB-backed state — the API
shape for long-lived 100 TB streaming state (RocksDB spills state to
local disk + changelog-checkpoints instead of holding it on-heap).

``stream_tws_user_profile`` tracks, per user: total events
(ValueState), max event value (ValueState), and per-event-type counts
(MapState — a keyed sub-map no flat tuple expresses cleanly). The
bounded one-batch replay emits exactly one row per user, equal to the
batch GROUP BY the oracle runs.

Scale: state is O(users × event types); events shuffle once on
user_id; RocksDB keeps the working set off-heap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from frinesis_spark.streaming.runner import events_stream, run_append_to_files

_OUTPUT_SCHEMA = (
    "user_id long, n_events long, n_types long, max_value double"
)


class _UserProfile(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("n_events", "n long")
        self._maxv = handle.getValueState("max_value", "v double")
        self._types = handle.getMapState("type_counts", "t string", "n long")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n = self._count.get()[0] if self._count.exists() else 0
        maxv = self._maxv.get()[0] if self._maxv.exists() else float("-inf")
        for pdf in rows:
            n += len(pdf)
            maxv = max(maxv, float(pdf["value"].max()))
            for t, c in pdf["event_type"].value_counts().items():
                prev = (
                    self._types.getValue((t,))[0]
                    if self._types.containsKey((t,))
                    else 0
                )
                self._types.updateValue((t,), (prev + int(c),))
        self._count.update((n,))
        self._maxv.update((maxv,))
        n_types = sum(1 for _ in self._types.keys())
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_events": n,
                    "n_types": n_types,
                    "max_value": maxv,
                }
            ]
        )

    def close(self) -> None:
        pass


def q_stream_tws_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # transformWithState requires the RocksDB state store provider.
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = events_stream(spark, sf_dir).select(
        "user_id", "event_type", "value"
    )
    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_UserProfile(),
        outputStructType=_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
    return run_append_to_files(out)


# OPTIONAL MODULE — not part of the registered driver surface.
#
# transformWithStateInPandas drives its Python worker over a
# protobuf-based protocol, and ``google.protobuf`` has been
# unimportable in this container for six consecutive rounds (probed
# each round; see BUILDLOG r2–r7), which crashes the
# TransformWithStateInPySpark driver worker at query start. Per the
# r6 verdict the query is DEMOTED from the registry (registry.py no
# longer imports this module), so the registered surface carries no
# evidence-free entries. The operator remains fully implemented and
# importable: the ``applyInPandasWithState`` sibling
# (``stream_user_profile``, streaming/stateful.py) carries the same
# semantics in the driver contract, and ``tests/test_tws.py`` runs
# this path end-to-end (env-gated on HAVE_TWS_DEPS) wherever the
# dependency is healthy. The test's reference oracle SQL lives with
# the test (tests/test_tws.py) — this module ships no registry-shaped
# dead weight (r7 verdict item 7).
try:
    from google.protobuf import descriptor  # noqa: F401

    HAVE_TWS_DEPS = True
except ImportError:  # pragma: no cover - environment-dependent
    HAVE_TWS_DEPS = False

