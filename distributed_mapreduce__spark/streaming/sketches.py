"""Streaming heavy hitters: Misra–Gries state across micro-batches.

The batch operator (operators/sketches.key_counts) answers "which keys
dominate the corpus" with bounded memory; this is its streaming
sibling — "which domains / templates are dominating the stream RIGHT
NOW" — without retaining the stream. Misra–Gries is natively a one-pass
stream algorithm, so the cross-batch state update IS the algorithm
(the identical ``_mg_ingest`` fold the batch pass uses per partition):

- the key space is hash-sharded (``stable_bucket``) into ``n_shards``
  groups; each shard holds ONE Misra–Gries summary of ``width``
  counters in the state store — O(n_shards · width) total state, fixed
  for the life of the stream, independent of distinct keys seen;
- every key maps to exactly one shard, so the per-shard MG bound
  applies to that key's WHOLE stream: after any batch,
  ``est_count ∈ [true − shard_total/width, true]``, and every key with
  true count > shard_total/width is guaranteed present (the same
  completeness contract the batch front door honors);
- each micro-batch emits the shard's current candidates with their
  estimate and the shard's ``max_undercount`` (total/width) — the
  consumer thresholds against ``est_count + max_undercount`` for
  no-false-negative alerting.

Unlike the batch path there is no exact recount (the stream is gone);
estimates carry the stated bound instead. For exact counts over a
bounded window, use the windowed aggregations in streaming/windows.py.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.hashing import stable_bucket
from ..operators.sketches import _mg_ingest

if TYPE_CHECKING:
    import pandas as pd

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("max_undercount", T.LongType()),
    ]
)

# One MG summary per shard: parallel key/count arrays + the shard's
# total item count (the undercount denominator).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("total", T.LongType()),
    ]
)


def _make_update(width: int):
    def update(
        key: tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.exists:
            keys, counts, total = state.get
            counters = dict(zip(keys, counts))
        else:
            counters, total = {}, 0
        for pdf in pdfs:
            vc = pdf["__hh_key"].value_counts()
            total += int(vc.sum())
            counters = _mg_ingest(
                counters, ((v, int(c)) for v, c in vc.items()), width
            )
        state.update((list(counters), [int(c) for c in counters.values()], total))
        bound = total // width
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(counters),
                "key": list(counters),
                "est_count": [int(c) for c in counters.values()],
                "max_undercount": [bound] * len(counters),
            }
        )

    return update


def streaming_heavy_hitters(
    stream: DataFrame,
    key: Column | str,
    width: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """Per-micro-batch heavy-hitter candidates over an unbounded
    stream: (shard, key, est_count, max_undercount), outputMode
    'update' (a shard re-emits its summary whenever a batch touches
    it).

    State is O(n_shards · width) forever; ``width`` trades memory for
    the undercount bound exactly as in the batch operator."""
    c = F.col(key) if isinstance(key, str) else key
    keyed = stream.select(
        stable_bucket(c.cast("string"), n_shards).alias("__hh_shard"),
        c.cast("string").alias("__hh_key"),
    )
    return keyed.groupBy("__hh_shard").applyInPandasWithState(
        _make_update(width),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
