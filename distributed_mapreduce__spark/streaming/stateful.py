"""Custom stateful streaming operator via ``applyInPandasWithState``
(north-star: "applyInPandasWithState for custom stateful operators").

``user_running_stats`` maintains per-user lifetime counters across
micro-batches — the shape of a streaming feature store (running counts /
sums / last-seen): state the built-in windowed aggregates can't express
(no window, no expiry — a true running profile).

Scale: state lives in the state store keyed by user; each micro-batch
touches only the keys present in the batch. Unbounded-lifetime state
needs a timeout policy in production (here: NoTimeout, bounded key
domain); use ``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.
setTimeoutDuration`` to evict idle users.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
        T.StructField("last_event_us", T.LongType()),
    ]
)

# State tuple: (n_events, total_value_cents, last_event_us). Values are
# integers (cents / epoch-µs) so cross-batch accumulation stays exact.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _update_user(
    key: tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # per-ROW cents so accumulation is exact (each value is a 2-dp
        # double; ×100 rounds to the true integer) — batch-level sums of
        # doubles would drift vs the batch-mode oracle
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        batch_last = pdf["ts"].max()
        last_us = max(last_us, int(batch_last.value // 1_000))  # ns → µs
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value_cents": [cents],
            "last_event_us": [last_us],
        }
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Per-user lifetime counters, updated each micro-batch; emits the
    current running totals for every user seen in the batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
