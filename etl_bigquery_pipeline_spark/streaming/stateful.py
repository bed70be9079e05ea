"""Custom stateful streaming operator via applyInPandasWithState.

When built-in windows/session_window can't express the state machine (user
lifetime aggregates, fraud counters, per-entity models), this is the
sanctioned escape hatch: per-key state lives in the state store, batches
arrive as Arrow-backed pandas frames, and a processing-time timeout lets
idle keys be finalized and evicted.

Operator here: per-user lifetime counters (event count, value sum, last
event time) — emitted on every update, with state dropped after
``idle_timeout_ms`` of inactivity so the store is bounded by *active*
users, not all users ever seen. That eviction is what makes per-key state
survive a 100 TB/forever stream.

Implementation note: all state mutations (update + setTimeoutDuration)
happen BEFORE the output rows are yielded — the framework may finalize the
group once the generator is exhausted, so trailing mutations after the
last yield can wedge the micro-batch.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, value_sum double, last_ts timestamp, evicted boolean"
)
STATE_SCHEMA = "n_events long, value_sum double, last_ts_us long"


def user_lifetime_totals(
    events: DataFrame,
    *,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Stateful per-user lifetime aggregate over a stream.

    Emits one row per user per micro-batch touch. With ``idle_timeout_ms``
    set, a final row with evicted=true fires once the user has been idle
    past the timeout and the state is dropped (bounded store).

    Timeout caveat: ProcessingTimeTimeout requires a continuously
    triggering query — under availableNow/processAllAvailable harnesses
    the engine keeps scheduling batches to service timeouts and the run
    never settles. Default is therefore NoTimeout (state kept until the
    query dies); enable eviction only with a processingTime trigger.
    """

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "value_sum": [total],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                    "evicted": [True],
                }
            )
            return

        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last_us = max(last_us, int(pdf["ts"].max().value // 1000))
        state.update((n, total, last_us))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "value_sum": [total],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
                "evicted": [False],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
