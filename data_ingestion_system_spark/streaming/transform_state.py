"""Arbitrary stateful streaming on Spark 4's transformWithStateInPandas.

The reference's cross-batch state is a PK set held in process memory
(reference: src/ingestion/pipeline.py:201-216); `streaming/stateful.py`
already re-expresses per-key profiles on applyInPandasWithState. This
module is the same profile operator on the NEW StatefulProcessor API —
the engine's forward path for custom stateful operators, because it adds
what the old API cannot express:

  * typed composite state: a ValueState profile + a MapState of
    per-event-type counts (the old API pickles one opaque tuple),
  * native state TTL (``ttlDurationMs``) — idle keys are evicted by the
    state store itself instead of hand-rolled timeout handling,
  * the RocksDB state store, which spills to disk — at 100 TB of keys,
    per-executor state no longer has to fit on the JVM heap.

The processor class is defined inside a factory so cloudpickle
serializes it BY VALUE (executors may not have this package on
PYTHONPATH — same reasoning as multimodal.columns).

Environment note: executing this operator needs ``google.protobuf``
(the Python worker ↔ JVM state-server wire format). The build container
lacks it, so tests/test_transform_state.py asserts plan construction and
schema here and gates the runtime round-trip behind an import probe —
the documented pattern for optional-dependency operators in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("top_event_type", StringType()),
        StructField("n_event_types", LongType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def make_profile_processor(ttl_ms: int | None = None):
    """StatefulProcessor: ValueState (n, total) + MapState {event_type: n},
    emitting the refreshed profile for each key touched in a batch."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n_events long, total_value double", ttlDurationMs=ttl_ms
            )
            self._by_type = handle.getMapState(
                "by_type", "event_type string", "n long", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                for etype, cnt in pdf.groupby("event_type").size().items():
                    # MapState.getValue returns the value ROW as a tuple
                    prev = (
                        self._by_type.getValue((etype,))[0]
                        if self._by_type.containsKey((etype,))
                        else 0
                    )
                    self._by_type.updateValue((etype,), (int(prev) + int(cnt),))
            self._totals.update((n, total))
            counts = {k[0]: v[0] for k, v in self._by_type.iterator()}
            if ttl_ms is not None:
                # re-touch EVERY map entry whenever the key is active:
                # _totals refreshes its TTL each batch, and a map entry
                # whose event_type stopped appearing would otherwise
                # expire independently — leaving n_events/total_value
                # including events whose by-type count vanished
                # (sum(by_type) < n_events reads as corruption). With
                # the full touch, the whole profile expires together,
                # only after the KEY has been idle past the TTL.
                for etype, cnt in counts.items():
                    self._by_type.updateValue((etype,), (int(cnt),))
            top = max(sorted(counts), key=lambda k: counts[k]) if counts else None
            yield _pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "top_event_type": [top],
                    "n_event_types": [len(counts)],
                }
            )

        def close(self) -> None:
            pass

    return ProfileProcessor()


def user_profiles_tws(events_stream: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """groupBy(user_id) → transformWithStateInPandas profile stream.
    Requires the RocksDB state store provider (set by run helpers/tests):
    transformWithState state lives off-heap and spills to disk.

    Spark only permits state TTL under ProcessingTime time mode, so the
    mode is derived from ``ttl_ms`` rather than hardcoded — a non-None TTL
    with timeMode="None" fails at operator execution."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_profile_processor(ttl_ms),
        outputStructType=PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )
