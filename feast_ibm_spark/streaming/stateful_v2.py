"""Custom stateful streaming via the Spark 4 state API v2
(``transformWithStateInPandas`` + ``StatefulProcessor``).

ENVIRONMENT-GATED (like the feast e2e pair and the Avro source): the v2
runtime's driver worker speaks protobuf to the JVM state server
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``) and the build
container ships NO ``google.protobuf`` (and the standing rule forbids
``pip install``). The operator below is complete and its test
(``tests/test_streaming.py::test_state_api_v2_user_profile``) runs the
full drained-vs-batch comparison the moment the image ever ships
protobuf — until then it skips with the import error, exactly the feast
pattern. The v1 kernel (``stateful.py``) remains the exercised custom
state surface; re-check each round.

``applyInPandasWithState`` (streaming/stateful.py) carries ONE opaque
state tuple per key; the v2 API is the successor surface Spark 4 ships
for production stateful pipelines: a handle exposing MULTIPLE named,
individually-typed state variables per key (ValueState / ListState /
MapState), native TTL on each, timers in processing or event time, and
schema evolution of state between job versions. Same execution model —
state lives in the executor state store keyed by the grouping columns,
one shuffle per micro-batch — so everything the engine documents about
state scale (RocksDB provider, watermark GC) applies unchanged.

First operator: ``streaming_user_profile`` — continuous per-user
ingestion stats (event count, exact cent total, DISTINCT event-type
count). The distinct count is why v2 fits: the type universe lives in a
per-key ``MapState`` (set semantics, incrementally maintained, no
re-scan), while the counters sit in a separate ``ValueState`` —
two independently-updated state variables under one key, which the v1
API would force into one repacked tuple.

Determinism contract for the bounded drain: every emitted update is a
MONOTONE snapshot (n_events strictly increases per key), so whatever
the micro-batch layout, the post-drain rn=1-by-max-n_events row per key
equals the final state — batching can change HOW MANY updates appear in
the update-mode sink, never the final row the query returns.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROFILE_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_cents", LongType()),
        StructField("n_types", LongType()),
    ]
)

_COUNTER_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)
_SEEN_KEY_SCHEMA = StructType([StructField("t", StringType())])
_SEEN_VAL_SCHEMA = StructType([StructField("one", IntegerType())])


class UserProfileProcessor(StatefulProcessor):
    """Two state variables per user: counters (ValueState) + the seen
    event-type set (MapState keyed by the type string)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counters = handle.getValueState("counters", _COUNTER_SCHEMA)
        self._seen = handle.getMapState(
            "seen_types", _SEEN_KEY_SCHEMA, _SEEN_VAL_SCHEMA
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        n, cents = 0, 0
        if self._counters.exists():
            n, cents = self._counters.get()
        for pdf in rows:
            n += len(pdf)
            cents += int(pdf["cents"].sum())
            for t in pdf["event_type"].unique():
                self._seen.updateValue((str(t),), (1,))
        self._counters.update((n, cents))
        n_types = sum(1 for _ in self._seen.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_cents": [cents],
                "n_types": [n_types],
            }
        )

    def close(self) -> None:
        pass


def streaming_user_profile(events: DataFrame) -> DataFrame:
    """Continuous per-user profile over a stream with columns
    (user_id, cents, event_type). Update-mode emission; see the module
    docstring's monotone-snapshot determinism contract."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=PROFILE_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )
