"""Storage-layer queries: the transactional table format under the
value oracle (local tier — the driver cap holds distinct operator
families; the test suite gates this with identical rigor)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register_local
from ..sources.tables import load_table

_TX_ORACLE = """
SELECT l_returnflag,
       count(*) AS n_items,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register_local("txlog_snapshot_agg", oracle=_TX_ORACLE)
def txlog_snapshot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write lineitem into a fresh transactional table as three
    idempotent append commits (sources/txlog.py), deliberately REPLAY
    one of them (same txn id — must be a no-op), then aggregate the
    snapshot read. Equality with the direct-on-parquet oracle proves
    the whole protocol chain — staging, atomic commit, txn dedup,
    log-replay snapshot — loses and duplicates nothing under the value
    hash."""
    import tempfile

    from ..sources.txlog import tx_read, tx_write

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    table = tempfile.mkdtemp(prefix="txlog_q_") + "/t"
    for i in range(3):
        tx_write(li.filter(F.col("l_orderkey") % 3 == i), table, txn=f"b{i}")
    # a retried batch: committed txn id → skipped, nothing duplicated
    tx_write(li.filter(F.col("l_orderkey") % 3 == 1), table, txn="b1")
    return (
        tx_read(spark, table)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
    )
