"""Arbitrary stateful streaming via transformWithStateInPandas (Spark 4).

The successor API to ``applyInPandasWithState`` (see ``stateful.py`` for
the classic form): state is declared as named, typed handles (ValueState /
ListState / MapState) instead of one packed tuple, each handle can carry
its own TTL (the bounded-store story — no timeout dance required), and
timers are first-class. Schema evolution and the RocksDB state store work
per-handle, which is what you want when a 100 TB/forever stream accretes
per-key state: each key's footprint is a few fixed-width values with
TTL-based eviction, so the store is bounded by *active* keys.

Operator here: per-user lifetime totals (ValueState) plus per-event-type
counts (MapState), emitted on every micro-batch touch. The MapState is
rendered as a sorted ``k:v`` string so output is deterministic regardless
of map iteration order.

Reference surface: the reference's pipeline is stateless daily batch
(/root/reference/dags/etl_pipeline.py:34-35); this operator is part of the
streaming-twin tier that replaces its cron re-computation with incremental
state.

Runtime requirements: transformWithStateInPandas speaks a protobuf-based
state-server protocol, so the Python workers need ``google.protobuf``
(bundled with standard Spark distributions; absent in this test
container — the test suite skips accordingly), and the operator only
supports the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass =
...state.RocksDBStateStoreProvider``).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.stateful_processor import TimerValues

OUTPUT_SCHEMA = (
    "user_id long, n_events long, value_sum double, type_counts string"
)


class UserTotalsProcessor(StatefulProcessor):
    """Per-user lifetime totals + per-event-type counters.

    ``ttl_ms`` (optional) bounds the state store: any key untouched for
    that long is evicted by the engine — no timer bookkeeping in user
    code, unlike the applyInPandasWithState form.
    """

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n_events long, value_sum double", self._ttl_ms
        )
        self._by_type = handle.getMapState(
            "by_type", "etype string", "cnt long", self._ttl_ms
        )

    def handleInputRows(
        self,
        key: Tuple[Any, ...],
        rows: Iterator[pd.DataFrame],
        timerValues: "TimerValues",
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            for etype, cnt in pdf["event_type"].value_counts().items():
                prev = (
                    self._by_type.getValue((etype,))[0]
                    if self._by_type.containsKey((etype,))
                    else 0
                )
                self._by_type.updateValue((etype,), (prev + int(cnt),))
        self._totals.update((n, total))
        counts = sorted(
            (k[0], v[0]) for k, v in self._by_type.iterator()
        )
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "value_sum": [total],
                "type_counts": [",".join(f"{k}:{v}" for k, v in counts)],
            }
        )

    def close(self) -> None:
        pass


def user_totals_tws(
    events: DataFrame,
    *,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-user lifetime totals on the transformWithStateInPandas API.

    Same semantics as ``stateful.user_lifetime_totals`` (one row per user
    per micro-batch touch, state carried across batches and restarts via
    the checkpoint) plus per-event-type counts from a MapState handle.
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
