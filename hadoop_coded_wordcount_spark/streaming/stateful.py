"""Custom stateful streaming operator — ``applyInPandasWithState``.

Windowed aggregations (streaming/windows.py) cover the declarative state
Spark manages for you; this module is the escape hatch the brief names for
operators whose state machine Spark can't express: per-key arbitrary state
mutated batch-by-batch, Arrow-transferred to Python.

The demonstration operator keeps a running per-user profile (event count,
value sum, last event time) across micro-batches — the skeleton any
sessionization/feature-accumulation/entity-resolution state machine drops
into.

Scale posture: state lives in the state store keyed by user_id — one
shuffle per batch on the key, state size O(|active keys|), not O(events).
The timeout hook (`GroupStateTimeout`) is how production pipelines expire
idle keys; the test pins NoTimeout semantics (state lives forever) because
that is deterministically checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_user_totals", "running_user_totals_v2"]

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, value_sum double, batches_seen bigint"
)
STATE_SCHEMA = "n bigint, vsum double, batches bigint"


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, vsum, batches = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        vsum += float(pdf["value"].sum())
    batches += 1
    state.update((n, vsum, batches))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "value_sum": [vsum],
            "batches_seen": [batches],
        }
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Cumulative per-user totals, updated every micro-batch the user
    appears in. Output mode must be ``update``."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_totals_v2(stream: DataFrame) -> DataFrame:
    """The same running-totals state machine on the Spark 4
    ``transformWithStateInPandas`` API (state v2): typed state handles
    (``getValueState`` here; list/map state and per-key timers exist on
    the same handle) replace the single packed tuple, and TTL is a state
    property instead of a group-level timeout conf.

    Kept semantically identical to :func:`running_user_totals` so the two
    APIs are directly comparable in tests; requires the RocksDB state
    store provider (enforced by Spark for state v2). Runtime dependency:
    the state-v2 Python<->JVM protocol is protobuf-based, so EXECUTION
    needs ``google.protobuf`` installed (plan construction does not);
    the execution test skips where it is absent.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n bigint, vsum double, batches bigint"
            )

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            prev = self._state.get()
            n, vsum, batches = prev if prev is not None else (0, 0.0, 0)
            for pdf in rows:
                n += len(pdf)
                vsum += float(pdf["value"].sum())
            batches += 1
            self._state.update((n, vsum, batches))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "value_sum": [vsum],
                    "batches_seen": [batches],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=Totals(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
