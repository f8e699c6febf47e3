"""Storage-layer queries: the transactional table format and the
bucketed zero-Exchange layout under the value oracle. Driver-tier
since round 8 (VERDICT r7 #4 rotated `bucketed_join_agg` and
`txlog_time_travel_agg` in); round 10 promoted the round-9 family
(`multi_tx_agg`, `mor_delete_agg`, `cdc_rollup_view_agg`) per VERDICT
r9 #3, displacing three redundant relational demos to the local
tier."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register, register_local
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
    hash. (Local tier since round 11: the basic protocol chain is a
    strict subset of what partitioned_txlog_agg and the other driver
    storage rows exercise.)"""
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


_TT_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderkey % 2 = 0
GROUP BY o_orderpriority
"""


@register_local("txlog_time_travel_agg", oracle=_TT_ORACLE)
def txlog_time_travel_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel under the value oracle: commit the EVEN orders as
    v0, OVERWRITE with all orders as v1, then aggregate the v0
    snapshot — the result must equal a direct query over the even
    half, proving an overwrite is a metadata swap that leaves history
    bit-exact (until tx_vacuum). Local tier since the round-12
    rotation (its version-number travel chain is subsumed by
    `txlog_ts_travel_agg` + the storage flagships); the oracle stays
    gated by tests/test_queries_oracle.py."""
    import tempfile

    from ..sources.txlog import tx_read, tx_write

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    table = tempfile.mkdtemp(prefix="txlog_tt_") + "/t"
    v0 = tx_write(orders.filter(F.col("o_orderkey") % 2 == 0), table)
    tx_write(orders, table, mode="overwrite")
    return (
        tx_read(spark, table, version=v0)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


_BUCKET_ORACLE = """
SELECT o_orderkey,
       count(*) AS n_items,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_qty
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderkey
"""


@register("bucketed_join_agg", oracle=_BUCKET_ORACLE)
def bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pay-the-shuffle-once layout under the value oracle: orders
    and lineitem are written as co-bucketed tables
    (sources/layout.write_bucketed, 8 buckets on the join key), then
    joined and aggregated ON that key — a plan whose join AND
    aggregation carry zero shuffle Exchanges (pinned by
    tests/test_bucketed_layout.py; here the oracle proves the layout
    changes no values). Tables are external (data in a temp dir) and
    re-registered per call via overwrite."""
    import tempfile

    from ..sources.layout import write_bucketed

    d = tempfile.mkdtemp(prefix="bucketed_q_")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(
        orders, "q_b_orders", f"{d}/orders", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        lineitem, "q_b_lineitem", f"{d}/lineitem", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    bo, bl = spark.table("q_b_orders"), spark.table("q_b_lineitem")
    return (
        bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
    )


_MULTI_TX_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_items,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey % 2 = 1
GROUP BY o_orderpriority
"""


@register("multi_tx_agg", oracle=_MULTI_TX_ORACLE)
def multi_tx_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table transactions under the value oracle
    (sources/multitx.tx_multi): load the odd orders + their lineitems
    as TWO atomic cross-table transactions (orders table and lineitem
    table commit together or not at all), replay one transaction id
    (exactly-once: must be a no-op), then join the two transactional
    tables and aggregate. Equality with the direct-on-parquet oracle
    proves the coordinator-record protocol neither loses, duplicates,
    nor tears a batch across tables."""
    import tempfile

    from ..sources.multitx import tx_multi
    from ..sources.txlog import tx_read

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    line = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    d = tempfile.mkdtemp(prefix="multitx_q_")
    to, tl = f"{d}/orders", f"{d}/lineitem"
    for batch, rem in (("m0", 1), ("m1", 3)):
        tx_multi(
            {
                to: orders.filter(F.col("o_orderkey") % 4 == rem),
                tl: line.filter(F.col("l_orderkey") % 4 == rem),
            },
            coordinator=d,
            txn=batch,
        )
    # a retried transaction: committed txid → identical versions, no
    # second append on either table
    tx_multi(
        {
            to: orders.filter(F.col("o_orderkey") % 4 == 1),
            tl: line.filter(F.col("l_orderkey") % 4 == 1),
        },
        coordinator=d,
        txn="m0",
    )
    o, li = tx_read(spark, to), tx_read(spark, tl)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
    )


_MOR_ORACLE = """
SELECT l_returnflag,
       count(*) AS n_items,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_qty
FROM lineitem
WHERE (l_orderkey % 10 <> 3) OR (l_orderkey % 100 = 3)
GROUP BY l_returnflag
"""


@register("mor_delete_agg", oracle=_MOR_ORACLE)
def mor_delete_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read delete under the value oracle: commit lineitem,
    DELETE every tenth order key as a KB-sized tombstone (no file
    rewritten — sources/txlog.py tx_delete(mode='merge_on_read')),
    then RE-APPEND the hundredth-key subset of the deleted rows and
    aggregate. Equality with the direct predicate oracle proves both
    halves of the read-side contract at once: tombstoned rows are
    invisible, and rows appended AFTER the tombstone dodge it (the
    add-version epoch rule), bit-exactly under the value hash."""
    import tempfile

    from ..sources.txlog import tx_delete, tx_read, tx_write

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    table = tempfile.mkdtemp(prefix="mor_q_") + "/t"
    tx_write(li, table)
    keys = (
        li.filter(F.col("l_orderkey") % 10 == 3)
        .select("l_orderkey")
        .distinct()
    )
    tx_delete(keys, table, "l_orderkey", mode="merge_on_read")
    tx_write(li.filter(F.col("l_orderkey") % 100 == 3), table)
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


_VIEW_ORACLE = """
SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
WHERE event_type <> 'click'
GROUP BY 1, 2
"""


@register("cdc_rollup_view_agg", oracle=_VIEW_ORACLE)
def cdc_rollup_view_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance under deletes, end-to-end under
    the value oracle: ACID-ingest events as two txlog appends,
    merge-on-read DELETE one event type, then drive the CDC view
    maintainer (streaming/table_stream.rollup_view_available_now —
    inserts fold positive hourly partials, the delete folds a NEGATED
    pre-image partial) and read the store. Equality with a direct
    hourly aggregate over the surviving rows proves insert folding,
    retraction, and zero-window elision reproduce the full recompute
    bit-exactly — without the store ever re-scanning history."""
    import tempfile

    from ..operators.timeseries import read_rollup
    from ..sources.txlog import tx_delete, tx_write
    from ..streaming.table_stream import rollup_view_available_now

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "value", "event_type"
    )
    d = tempfile.mkdtemp(prefix="cdc_view_q_")
    table, store, ckpt = f"{d}/t", f"{d}/store", f"{d}/ckpt"
    tx_write(events.filter(F.col("event_id") % 2 == 0), table)
    tx_write(events.filter(F.col("event_id") % 2 == 1), table)
    tx_delete(
        spark.createDataFrame([("click",)], "event_type string"),
        table,
        "event_type",
        mode="merge_on_read",
    )
    rollup_view_available_now(
        spark, table, store, "1 hour", ("event_type",), checkpoint=ckpt
    )
    return read_rollup(spark, store, ("event_type",)).select(
        "window_start", "event_type", "n_events", "sum_value"
    )


_SQL_TX_ORACLE = """
SELECT l_linestatus,
       count(*) AS n_items,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price
FROM lineitem
WHERE l_orderkey % 4 <> 2
GROUP BY l_linestatus
"""


@register_local("txlog_sql_agg", oracle=_SQL_TX_ORACLE)
def txlog_sql_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL over a transactional table (sources/txlog.tx_view): ingest
    lineitem as txlog appends, merge-on-read DELETE one residue class
    of order keys, register the snapshot as a temp view, and run the
    aggregate through ``spark.sql`` — proving the SQL surface sees the
    same protocol semantics (log-replay file list, tombstone
    anti-joins) as the function API, bit-exact under the value
    oracle."""
    import tempfile

    from ..sources.txlog import tx_delete, tx_view, tx_write

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_extendedprice"
    )
    table = tempfile.mkdtemp(prefix="txsql_q_") + "/t"
    tx_write(li.filter(F.col("l_orderkey") % 2 == 0), table)
    tx_write(li.filter(F.col("l_orderkey") % 2 == 1), table)
    tx_delete(
        li.filter(F.col("l_orderkey") % 4 == 2)
        .select("l_orderkey")
        .distinct(),
        table,
        "l_orderkey",
        mode="merge_on_read",
    )
    tx_view(spark, table, "txq_lineitem")
    return spark.sql(
        """
        SELECT l_linestatus,
               count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM txq_lineitem
        GROUP BY l_linestatus
        """
    )


_MERGE_PIPE_ORACLE = """
WITH merged AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_orderkey % 10 = 7
              THEN -CAST(o_totalprice AS DECIMAL(18,2))
              ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price
  FROM orders
  UNION ALL
  SELECT -o_orderkey, o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2))
  FROM orders WHERE o_orderkey % 10 = 4
)
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(CAST(sum(price) AS VARCHAR) AS DOUBLE) AS total_price
FROM merged
GROUP BY o_orderpriority
"""


@register("cdc_merge_pipe_agg", oracle=_MERGE_PIPE_ORACLE)
def cdc_merge_pipe_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Update CDF end-to-end under the value oracle (the r9 #1 gap):
    ACID-ingest orders, run a routine MERGE (one residue class's
    prices negated = updates; synthetic negative keys = inserts, one
    commit), then drive the exactly-once pipe
    (streaming/table_stream.pipe_available_now(cdc_key=...)) into a
    REPLICA table and aggregate the replica. The merge travels as the
    commit's _cdf sidecar (sources/txlog.tx_merge) and applies to the
    sink as delete-then-append — equality with a direct SQL recompute
    of the merged state proves pre/post-image capture, sidecar
    delivery, and the epoch-rule upsert reproduce the merge
    bit-exactly on a table that never saw it."""
    import tempfile

    from ..sources.txlog import tx_merge, tx_read, tx_write
    from ..streaming.table_stream import pipe_available_now

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    d = tempfile.mkdtemp(prefix="cdc_merge_q_")
    src, dst, ckpt = f"{d}/src", f"{d}/dst", f"{d}/ckpt"
    tx_write(orders, src)
    updates = orders.filter(F.col("o_orderkey") % 10 == 7).withColumn(
        "o_totalprice", -F.col("o_totalprice")
    )
    inserts = orders.filter(F.col("o_orderkey") % 10 == 4).withColumn(
        "o_orderkey", -F.col("o_orderkey")
    )
    tx_merge(updates.unionByName(inserts), src, "o_orderkey")
    pipe_available_now(
        spark, src, dst, checkpoint=ckpt, cdc_key="o_orderkey"
    )
    return (
        tx_read(spark, dst)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


_PART_ORACLE = """
WITH merged AS (
  SELECT l_orderkey, l_returnflag, l_linestatus,
         CASE WHEN l_orderkey % 10 = 7 THEN -CAST(l_quantity AS DECIMAL(18,2))
              ELSE CAST(l_quantity AS DECIMAL(18,2)) END AS qty
  FROM lineitem
)
SELECT l_linestatus,
       count(*) AS n_items,
       CAST(CAST(sum(qty) AS VARCHAR) AS DOUBLE) AS total_qty
FROM merged
WHERE l_returnflag = 'R'
GROUP BY l_linestatus
"""


@register("partitioned_txlog_agg", oracle=_PART_ORACLE)
def partitioned_txlog_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned transactional tables end-to-end under the value
    oracle (VERDICT r10 #1): ingest lineitem as TWO appends into a
    table hive-partitioned by l_returnflag (the second append inherits
    the layout — sources/txlog.tx_write(partition_by=)), run a keyed
    MERGE that negates one residue class's quantities (its rewrite is
    partition-pruned via the per-file partition stats in the commit
    log), then aggregate a PARTITION-PRUNED read (where= on the
    partition column: files of the other partitions never open — the
    IO pin lives in tests/test_partitioned_txlog.py). Equality with a
    direct recompute proves layout placement, typed partition-column
    reconstruction, log-only pruning, and the partition-preserving
    merge change no values."""
    import tempfile

    from pyspark.sql import Window

    from ..sources.txlog import tx_merge, tx_read, tx_write

    # a unique per-row merge key, deterministic across the two write
    # evaluations (ties in the global order are fully-identical rows,
    # so tie-swaps cannot change table contents; the synthetic
    # lineitem has no unique natural key).
    # HARNESS-ONLY: a partitionBy-less Window is a single-task global
    # sort — fine at the driver-check fixture sizes this query runs
    # at, a scale-killer on real data (operators/packing.py:8). A real
    # table has a natural key; don't copy this key-synthesis pattern.
    w = Window.orderBy(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_shipdate",
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.row_number().over(w).alias("_rid"),
        "l_orderkey",
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
    )
    table = tempfile.mkdtemp(prefix="part_q_") + "/t"
    tx_write(
        li.filter(F.col("l_orderkey") % 2 == 0),
        table,
        partition_by=["l_returnflag"],
        stats_cols=["_rid"],
    )
    tx_write(li.filter(F.col("l_orderkey") % 2 == 1), table)
    updates = (
        tx_read(spark, table)
        .filter(F.col("l_orderkey") % 10 == 7)
        .withColumn("l_quantity", -F.col("l_quantity"))
    )
    tx_merge(updates, table, "_rid")
    return (
        tx_read(spark, table, where=("l_returnflag", "R", "R"))
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
    )


_TSTT_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderkey % 3 = 0
GROUP BY o_orderpriority
"""


@register_local("txlog_ts_travel_agg", oracle=_TSTT_ORACLE)
def txlog_ts_travel_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP AS OF under the value oracle (round 11): commit one
    residue class of orders as v0, overwrite with everything as v1,
    then read back AS OF v0's own commit timestamp (taken from
    tx_history — the same ``ts`` stamps vacuum retention trusts) and
    aggregate. Equality with a direct query over the v0 subset proves
    the wall-clock→version resolution picks the snapshot that was live
    at that instant."""
    import tempfile

    from ..sources.txlog import tx_history, tx_read, tx_write

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    table = tempfile.mkdtemp(prefix="txlog_tstt_") + "/t"
    v0 = tx_write(orders.filter(F.col("o_orderkey") % 3 == 0), table)
    tx_write(orders, table, mode="overwrite")
    ts0 = next(h["ts"] for h in tx_history(spark, table) if h["version"] == v0)
    return (
        tx_read(spark, table, as_of_ts=ts0)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


_MULTI_MERGE_ORACLE = """
WITH c AS (
  SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY l_orderkey
),
final_o AS (
  -- matched (%4=0), clause 1 first-match-wins: UPDATE SET * if %8=0
  SELECT o_orderkey, 'U-' || o_orderpriority AS o_orderpriority
  FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 8 = 0
  UNION ALL
  -- matched falling to clause 2 (DELETE urgent) without matching it
  SELECT o_orderkey, o_orderpriority FROM orders
  WHERE o_orderkey % 4 = 0 AND o_orderkey % 8 <> 0
    AND o_orderpriority NOT LIKE '1%'
  UNION ALL
  -- target rows never matched by the source survive unchanged
  SELECT o_orderkey, o_orderpriority FROM orders
  WHERE o_orderkey % 2 = 0 AND o_orderkey % 4 <> 0
  UNION ALL
  -- conditional INSERT *: unmatched source keys (%4=1) with %8=1
  SELECT o_orderkey, 'U-' || o_orderpriority FROM orders
  WHERE o_orderkey % 4 = 1 AND o_orderkey % 8 = 1
),
upd_c AS (
  SELECT l_orderkey, n_items + 1000 AS n_items
  FROM c WHERE l_orderkey % 4 IN (0, 1)
),
final_c AS (
  SELECT * FROM upd_c
  UNION ALL
  SELECT l_orderkey, n_items FROM c
  WHERE l_orderkey % 2 = 0 AND l_orderkey % 4 NOT IN (0, 1)
)
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(n_items) AS BIGINT) AS total_items
FROM final_o JOIN final_c ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


@register("multi_merge_agg", oracle=_MULTI_MERGE_ORACLE)
def multi_merge_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table MERGE under the value oracle (round 11,
    sources/multitx.tx_multi(modes='merge')): seed an orders table and
    a per-order item-count table with the even keys, then atomically
    MERGE both in one transaction. Round 15: the orders participant
    carries conditional clauses (first-match-wins UPDATE SET * when
    %8=0, DELETE urgent otherwise, conditional INSERT * of %8=1 keys)
    while counts stays the unconditional upsert — one transaction
    mixing both merge bodies. The same txn id replays as a no-op
    (exactly-once), then the join-aggregate of the two tables must
    equal a DuckDB replay of the clause algebra — proving the
    coordinator-record merge neither loses, duplicates, nor tears
    the upsert across tables."""
    import tempfile

    from ..sources.multitx import tx_multi
    from ..sources.txlog import tx_read, tx_set_properties, tx_write

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    counts = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_items"))
    )
    d = tempfile.mkdtemp(prefix="multimerge_q_")
    to, tc = f"{d}/orders", f"{d}/counts"
    tx_write(
        orders.filter(F.col("o_orderkey") % 2 == 0), to,
        stats_cols=["o_orderkey"],
    )
    tx_write(
        counts.filter(F.col("l_orderkey") % 2 == 0), tc,
        stats_cols=["l_orderkey"],
    )
    # these tables feed no pipe: skip the CDF sidecar capture
    tx_set_properties(spark, to, {"cdf.enabled": False})
    tx_set_properties(spark, tc, {"cdf.enabled": False})
    upd_o = orders.filter(F.col("o_orderkey") % 4 < 2).select(
        "o_orderkey", F.concat(F.lit("U-"), "o_orderpriority").alias(
            "o_orderpriority"
        ),
    )
    upd_c = counts.filter(F.col("l_orderkey") % 4 < 2).select(
        "l_orderkey", (F.col("n_items") + 1000).alias("n_items")
    )
    for _ in range(2):  # second run = exactly-once no-op replay
        tx_multi(
            {to: upd_o, tc: upd_c},
            coordinator=d,
            txn="mm0",
            modes={to: "merge", tc: "merge"},
            merge_keys={to: "o_orderkey", tc: "l_orderkey"},
            # round 15: the orders participant carries the FULL
            # conditional clause shape (first-match-wins update /
            # delete + conditional INSERT *) while counts stays the
            # unconditional upsert — one atomic transaction mixing
            # both merge bodies
            merge_clauses={
                to: {
                    "when_matched": [
                        {"action": "update",
                         "condition": "s.o_orderkey % 8 = 0"},
                        {"action": "delete",
                         "condition": "t.o_orderpriority LIKE '1%'"},
                    ],
                    "when_not_matched": [
                        {"condition": "s.o_orderkey % 8 = 1"},
                    ],
                }
            },
        )
    o, c = tx_read(spark, to), tx_read(spark, tc)
    return (
        o.join(c, o.o_orderkey == c.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("n_items").alias("total_items"),
        )
    )


_PART_EVO_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderpriority
"""


@register_local("partition_evolution_agg", oracle=_PART_EVO_ORACLE)
def partition_evolution_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition evolution under the value oracle (round 11 late,
    sources/txlog.tx_set_partitioning): ingest half of orders
    hive-partitioned by o_orderpriority, EVOLVE the spec to
    unpartitioned (one metadata commit, zero rewrite), append the
    other half flat, and aggregate the full mixed-layout read.
    Equality with the direct recompute proves the signature-grouped
    scan reconstructs the partition column typed from BOTH layouts
    (directory names for the old files, file bytes for the new) and
    that evolution neither loses nor duplicates a row."""
    import tempfile

    from ..sources.txlog import tx_read, tx_set_partitioning, tx_write

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    table = tempfile.mkdtemp(prefix="part_evo_q_") + "/t"
    tx_write(
        orders.filter(F.col("o_orderkey") % 2 == 0),
        table,
        partition_by=["o_orderpriority"],
        stats_cols=["o_orderkey"],
    )
    tx_set_partitioning(spark, table, [])
    tx_write(orders.filter(F.col("o_orderkey") % 2 == 1), table)
    return (
        tx_read(spark, table)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


_HIDDEN_PART_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate <= DATE '1996-12-31'
GROUP BY o_orderpriority
"""


@register("hidden_partition_agg", oracle=_HIDDEN_PART_ORACLE)
def hidden_partition_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIDDEN PARTITIONING under the value oracle (round 12, VERDICT
    r11 #2): ingest orders into an ACID table laid out by
    ``months(o_orderdate)`` — the transform is recorded in the spec
    and the derived month exists only in the directory names, never in
    the schema — across TWO commits (the second inherits the layout),
    then read back with a predicate on the SOURCE date column. The
    read prunes to the 12 matching months' files from the log alone
    (the transform maps the bounds; pinned by inputFiles tests in
    tests/test_partition_transforms.py) and must equal a direct DuckDB
    aggregate over the same date range — proving placement is pure
    metadata. Rows are clustered by month before the write so each
    month lands as one file, the production ingest pattern (Iceberg
    "Partition Transforms"; reference repo has no storage layer —
    extension E7+)."""
    import datetime as _dt
    import tempfile

    from ..sources.txlog import tx_read, tx_write

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice"
    )
    clustered = orders.repartition(F.trunc("o_orderdate", "month"))
    table = tempfile.mkdtemp(prefix="txlog_hidden_") + "/t"
    tx_write(
        clustered.filter(F.col("o_orderkey") % 2 == 0),
        table,
        partition_by=["months(o_orderdate)"],
    )
    tx_write(clustered.filter(F.col("o_orderkey") % 2 == 1), table)
    return (
        tx_read(
            spark,
            table,
            where=("o_orderdate", _dt.date(1996, 1, 1), _dt.date(1996, 12, 31)),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


_DV_ORACLE = """
SELECT l_returnflag,
       count(*) AS n_items,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_qty
FROM (
  SELECT l_returnflag, l_quantity FROM lineitem
  WHERE NOT (l_quantity <= 5 AND l_discount >= 0.07)
  UNION ALL
  SELECT l_returnflag, l_quantity FROM lineitem
  WHERE l_orderkey % 100 = 7
) survivors
GROUP BY l_returnflag
"""


@register_local("dv_delete_agg", oracle=_DV_ORACLE)
def dv_delete_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional deletion vectors under the value oracle (round 12):
    commit lineitem, DELETE WHERE a predicate over two non-key columns
    via ``tx_delete_where`` — committed as KB-scale (file, row-ordinal)
    sidecars, ZERO data files rewritten (sources/txlog.py, Delta's
    deletion-vector design over Spark's ``_metadata.row_index``) —
    then RE-APPEND a subset and aggregate. Equality with the direct
    predicate oracle proves both read-side contracts at once: DV'd
    positions are invisible, and rows appended AFTER the delete are
    never its victims (a DV pins to the exact files it scanned), even
    when they match the predicate."""
    import tempfile

    from ..sources.txlog import tx_delete_where, tx_read, tx_write

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_discount"
    )
    table = tempfile.mkdtemp(prefix="dv_q_") + "/t"
    tx_write(li, table, stats_cols=["l_quantity"])
    tx_delete_where(
        spark, table, "l_quantity <= 5 AND l_discount >= 0.07"
    )
    tx_write(li.filter(F.col("l_orderkey") % 100 == 7), table)
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


_DV_DEDUP_ORACLE = """
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
"""


@register_local("dedup_rows_dv_agg", oracle=_DV_DEDUP_ORACLE)
def dedup_rows_dv_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHYSICAL row-level dedup via deletion vectors (round 12): ingest
    the documents corpus, then ingest two overlapping batches again —
    bit-identical duplicate rows no key- or predicate-addressed delete
    could disambiguate — and erase exactly the extra copies:
    ``tx_dedup_rows`` (in-place physical dedup: positional
    scan, keep-first window over the full row identity, losers
    committed as a KB-scale DV — zero files rewritten). The aggregate must equal a direct scan of
    the ORIGINAL corpus — the dedup restored it exactly. This is the
    training-data shape: physically dropping re-crawled duplicates
    from an ACID corpus table without rewriting untouched files."""
    import tempfile

    from ..sources.txlog import tx_dedup_rows, tx_read, tx_write

    docs = load_table(spark, sf_dir, "documents")
    table = tempfile.mkdtemp(prefix="dv_dedup_q_") + "/t"
    tx_write(docs, table)
    tx_write(docs.filter(F.col("doc_id") % 3 == 0), table)
    tx_write(docs.filter(F.col("doc_id") % 7 == 0), table)
    assert tx_dedup_rows(spark, table) is not None
    return (
        tx_read(spark, table)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_BLOOM_ORACLE = """
SELECT l_orderkey,
       l_returnflag,
       count(*) AS n_items,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price
FROM lineitem
WHERE l_orderkey IN (
    (SELECT min(l_orderkey) FROM lineitem),
    (SELECT max(l_orderkey) FROM lineitem)
)
GROUP BY l_orderkey, l_returnflag
"""


@register_local("bloom_lookup_agg", oracle=_BLOOM_ORACLE)
def bloom_lookup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter point lookup under the value oracle (round 12):
    commit lineitem with per-file blooms on ``l_orderkey``
    (``tx_write(bloom_cols=)``, KB-scale ``_bloom/`` sidecars), then
    point-read two keys through the equality skip path —
    ``tx_read(where=(col, v, v))`` consults the blooms and scans only
    files that can contain the key (the 100 TB needle-in-haystack
    shape [min, max] stats can't serve on unclustered high-cardinality
    columns; skipping itself is pinned by inputFiles tests in
    tests/test_bloom_skipping.py — here the oracle proves the skip
    never loses a row). Bit-exact equality with the direct IN-lookup
    aggregate."""
    import tempfile

    from ..sources.txlog import tx_read, tx_write

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    table = tempfile.mkdtemp(prefix="bloom_q_") + "/t"
    tx_write(li.repartition(8), table, bloom_cols=["l_orderkey"])
    lo, hi = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey")
    ).collect()[0]
    out = tx_read(spark, table, where=("l_orderkey", lo, lo)).unionByName(
        tx_read(spark, table, where=("l_orderkey", hi, hi))
    )
    return out.groupBy("l_orderkey", "l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


_UPDATE_ORACLE = """
SELECT l_returnflag,
       count(*) AS n_items,
       CAST(CAST(sum(CAST(
           CASE WHEN l_discount >= 0.08 THEN l_quantity + 50
                ELSE l_quantity END AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
           AS total_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register("dv_update_agg", oracle=_UPDATE_ORACLE)
def dv_update_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector UPDATE under the value oracle (round 12):
    commit lineitem, then ``tx_update`` a predicate slice — ONE atomic
    commit that DV-marks the matched positions and appends files
    carrying only the rewritten rows (write sized by the matched rows,
    not the touched files; sources/txlog.py tx_update, Delta's
    DV-update economics) — and aggregate. Equality with the direct
    CASE-WHEN oracle proves the update hit exactly the predicate rows,
    the originals vanished behind the DV, and nothing else moved."""
    import tempfile

    from ..sources.txlog import tx_read, tx_update, tx_write

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_discount"
    )
    table = tempfile.mkdtemp(prefix="dv_upd_q_") + "/t"
    tx_write(li, table, stats_cols=["l_quantity"])
    tx_update(
        spark, table, "l_discount >= 0.08",
        {"l_quantity": "l_quantity + 50"},
    )
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


_TXSRC_ORACLE = """
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
"""


@register("tx_source_stream_agg", oracle=_TXSRC_ORACLE)
def tx_source_stream_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``txtable`` Structured Streaming source under the value
    oracle (round 12, streaming/tx_source.py): ACID-ingest documents
    as two commits, then consume the table as a REAL readStream input
    (PySpark 4 Python DataSource API — offsets are commit versions,
    micro-batches are commit ranges, Spark's checkpoint machinery owns
    exactly-once) into a memory sink, and aggregate the sink. Equality
    with the direct corpus aggregate proves the source delivered every
    committed row exactly once through the engine's own streaming
    runtime — not through our pipe code."""
    import uuid as _uuid

    import tempfile

    from ..sources.txlog import tx_write
    from ..streaming.tx_source import register_tx_source

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    table = tempfile.mkdtemp(prefix="txsrc_q_") + "/t"
    tx_write(docs.filter(F.col("doc_id") % 2 == 0), table)
    tx_write(docs.filter(F.col("doc_id") % 2 == 1), table)
    register_tx_source(spark)
    sink = f"txsrc_sink_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("txtable").option("path", table).load()
        .writeStream.format("memory").queryName(sink).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(sink)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_MAPPED_PART_ORACLE = """
SELECT o_orderpriority AS priority,
       count(*) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate <= DATE '1996-06-30'
GROUP BY o_orderpriority
"""


@register("mapped_partition_agg", oracle=_MAPPED_PART_ORACLE)
def mapped_partition_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN MAPPING x PARTITIONED LAYOUT under the value oracle
    (round 13, VERDICT r12 #1): ingest half the orders into an ACID
    table hidden-partitioned by ``months(o_orderdate)``, RENAME the
    partition SOURCE column and the priority column (two metadata
    commits, zero rewrites — the spec and the placement directories
    key on the frozen physical names), append the other half under the
    NEW logical names, then read back with a predicate on the renamed
    date column. The read prunes through the transform ACROSS the
    rename (the predicate translates logical->physical before
    consulting the spec and per-file stats) and the aggregate must
    equal a direct DuckDB scan of the same rows — proving both
    indirections (mapping, hidden placement) are pure metadata
    (Delta columnMapping + Iceberg partition specs; reference repo has
    no storage layer — extension E7+)."""
    import datetime as _dt
    import tempfile

    from ..sources.txlog import (
        tx_read,
        tx_rename_column,
        tx_write,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice"
    )
    clustered = orders.repartition(F.trunc("o_orderdate", "month"))
    table = tempfile.mkdtemp(prefix="txlog_mapped_part_") + "/t"
    tx_write(
        clustered.filter(F.col("o_orderkey") % 2 == 0),
        table,
        partition_by=["months(o_orderdate)"],
    )
    tx_rename_column(spark, table, "o_orderdate", "order_dt")
    tx_rename_column(spark, table, "o_orderpriority", "priority")
    tx_write(
        clustered.filter(F.col("o_orderkey") % 2 == 1)
        .withColumnRenamed("o_orderdate", "order_dt")
        .withColumnRenamed("o_orderpriority", "priority"),
        table,
    )
    return (
        tx_read(
            spark,
            table,
            where=("order_dt", _dt.date(1996, 1, 1), _dt.date(1996, 6, 30)),
        )
        .groupBy("priority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


_SQL_DML_ORACLE = """
SELECT l_returnflag,
       count(*) AS n_items,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_qty
FROM (
  SELECT l_returnflag,
         CASE WHEN l_discount >= 0.09 THEN l_quantity + 100 ELSE l_quantity END AS l_quantity
  FROM lineitem
  WHERE NOT (l_linestatus = 'F' AND l_tax < 0.02)
)
GROUP BY l_returnflag
"""


@register("sql_dml_agg", oracle=_SQL_DML_ORACLE)
def sql_dml_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL DML front door under the value oracle (round 13,
    VERDICT r12 #6): drive a whole ACID maintenance sequence through
    ``tx_sql`` strings only — INSERT INTO ... SELECT (ingest),
    UPDATE ... SET ... WHERE (a deletion-vector update), DELETE FROM
    ... WHERE (a DV delete), OPTIMIZE (compaction over the DV debt is
    refused, so plain file compaction is exercised on a clean clone
    path), and the final SELECT aggregate — and the result must equal
    DuckDB replaying the same algebra directly on lineitem. Proves the
    parser dispatches to the same commit paths the Python fronts use
    (sources/tx_sql.py; Delta's SQL surface as the public model)."""
    import tempfile

    from ..sources.tx_sql import tx_register_table, tx_sql

    table = tempfile.mkdtemp(prefix="txlog_sql_dml_") + "/t"
    load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag", "l_linestatus",
        "l_discount", "l_tax",
    ).createOrReplaceTempView("lineitem_src_sql_dml")
    name = "t_sql_dml"
    # first INSERT creates the table via the inline-path form
    tx_sql(
        spark,
        f"INSERT OVERWRITE txtable.`{table}` "
        "SELECT * FROM lineitem_src_sql_dml",
    )
    tx_register_table(spark, name, table)
    tx_sql(
        spark,
        f"UPDATE {name} SET l_quantity = l_quantity + 100 "
        "WHERE l_discount >= 0.09",
    )
    tx_sql(
        spark,
        f"DELETE FROM {name} WHERE l_linestatus = 'F' AND l_tax < 0.02",
    )
    return tx_sql(
        spark,
        f"SELECT l_returnflag, count(*) AS n_items, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) "
        f"AS total_qty FROM {name} GROUP BY l_returnflag",
    )


_SINK_PIPE_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderkey % 4 < 2
GROUP BY o_orderpriority
"""


@register("sink_pipe_agg", oracle=_SINK_PIPE_ORACLE)
def sink_pipe_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The txtable SOURCE -> SINK table-to-table pipe under the value
    oracle (round 14, VERDICT r13 #4): ingest two orders slices as two
    commits, drain them through ``readStream.format("txtable")`` into
    a second ACID table via ``writeStream.format("txtable")``
    (availableNow, per-epoch ``txsink:`` idempotence txns), and
    aggregate the SINK table — the result must equal DuckDB
    aggregating the source rows directly, proving the exactly-once
    pipe loses and duplicates nothing end to end through the engine's
    OWN streaming runtime on both ends (streaming/tx_source.py;
    Delta's streaming source+sink pair as the public model)."""
    import tempfile

    from ..sources.txlog import tx_read, tx_write
    from ..streaming.tx_source import register_tx_source

    register_tx_source(spark)
    d = tempfile.mkdtemp(prefix="txsink_q_")
    src, dst = f"{d}/src", f"{d}/dst"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    tx_write(orders.filter(F.col("o_orderkey") % 4 == 0), src)
    tx_write(orders.filter(F.col("o_orderkey") % 4 == 1), src)
    tx_write(orders.limit(0), dst)
    q = (
        spark.readStream.format("txtable").option("path", src).load()
        .writeStream.format("txtable")
        .option("path", dst)
        .option("appId", "sink_pipe_agg")
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        tx_read(spark, dst)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


_SINK_TRANSFORM_PIPE_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderdate >= DATE '1995-03-01' AND o_orderdate <= DATE '1995-03-31'
  AND o_orderdate >= DATE '1995-03-08' AND o_orderdate <= DATE '1995-03-14'
GROUP BY o_orderpriority
"""


@register_local("sink_transform_pipe_agg", oracle=_SINK_TRANSFORM_PIPE_ORACLE)
def sink_transform_pipe_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The txtable SOURCE -> SINK pipe onto a ``days(o_orderdate)``
    HIDDEN-partitioned target under the value oracle (round 15,
    VERDICT r14 #1): ingest one month of orders as two commits, drain
    them through the engine's own streaming source+sink pair onto a
    table whose layout the SINK must compute natively (per-batch
    transform placement in the Arrow write path — no foreachBatch
    fallback), then aggregate ONE WEEK back through a transform-pruned
    read: the predicate is on the SOURCE date column, the files are
    skipped from the per-file derived [v,v] + source [min,max] stats
    the sink recorded at commit, and the result must equal DuckDB
    aggregating the same rows directly. Proves exactly-once transport
    AND that sink-written files carry the same pruning metadata as
    engine-written ones (streaming/tx_source.py _sink_place_val;
    Iceberg "Partition Transforms" + Delta streaming sink as the
    public models)."""
    import datetime as _dt
    import tempfile

    from ..sources.txlog import tx_read, tx_write
    from ..streaming.tx_source import register_tx_source

    register_tx_source(spark)
    d = tempfile.mkdtemp(prefix="txsink_days_q_")
    src, dst = f"{d}/src", f"{d}/dst"
    march = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority",
                "o_totalprice")
        .filter(
            (F.col("o_orderdate") >= F.lit(_dt.date(1995, 3, 1)))
            & (F.col("o_orderdate") <= F.lit(_dt.date(1995, 3, 31)))
        )
    )
    # o_orderdate is a TIMESTAMP in the testdata: the prune bounds
    # must be datetimes so they compare at the stats' granularity (a
    # bare date sorts below the day's own "00:00:00" min stat).
    lo, hi = _dt.datetime(1995, 3, 8), _dt.datetime(1995, 3, 14)
    tx_write(march.filter(F.col("o_orderkey") % 2 == 0), src)
    tx_write(march.filter(F.col("o_orderkey") % 2 == 1), src)
    tx_write(march.limit(0), dst, partition_by=["days(o_orderdate)"])
    q = (
        spark.readStream.format("txtable").option("path", src).load()
        .writeStream.format("txtable")
        .option("path", dst)
        .option("appId", "sink_transform_pipe_agg")
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        tx_read(
            spark,
            dst,
            where=("o_orderdate", lo, hi),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


_MERGE_INTO_ORACLE = """
WITH tgt AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax,
         l_returnflag
  FROM lineitem WHERE l_orderkey % 2 = 0
),
src AS (
  -- the synthetic lineitem repeats (orderkey, linenumber): fold the
  -- source unique per key (Delta refuses multi-match sources; the
  -- target side MAY fan out — one source row updates every match)
  SELECT l_orderkey, l_linenumber,
         min(l_quantity) AS l_quantity, min(l_discount) AS l_discount,
         min(l_tax) AS l_tax, min(l_returnflag) AS l_returnflag
  FROM lineitem WHERE l_orderkey % 3 = 0
  GROUP BY l_orderkey, l_linenumber
),
m AS (
  SELECT t.l_quantity AS t_qty, s.l_quantity AS s_qty,
         s.l_discount AS s_disc
  FROM tgt t
  JOIN src s ON s.l_orderkey = t.l_orderkey
            AND s.l_linenumber = t.l_linenumber
),
surv_matched AS (             -- clause 1 (update); clause 2 deletes
  SELECT t_qty + s_qty AS l_quantity, 'M' AS l_returnflag
  FROM m WHERE s_disc > 0.05
),
unmatched_tgt AS (            -- no clause hit: survive unchanged
  SELECT t.l_quantity, t.l_returnflag
  FROM tgt t
  LEFT JOIN src s ON s.l_orderkey = t.l_orderkey
                 AND s.l_linenumber = t.l_linenumber
  WHERE s.l_orderkey IS NULL
),
ins AS (                      -- conditional INSERT of unmatched src
  SELECT s.l_quantity, 'I' AS l_returnflag
  FROM src s
  LEFT JOIN tgt t ON t.l_orderkey = s.l_orderkey
                 AND t.l_linenumber = s.l_linenumber
  WHERE t.l_orderkey IS NULL AND s.l_tax < 0.07
),
final AS (
  SELECT * FROM surv_matched
  UNION ALL SELECT * FROM unmatched_tgt
  UNION ALL SELECT * FROM ins
)
SELECT l_returnflag,
       count(*) AS n_items,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_qty
FROM final
GROUP BY l_returnflag
"""


@register("merge_into_agg", oracle=_MERGE_INTO_ORACLE)
def merge_into_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional MULTI-KEY MERGE under the value oracle (round 14,
    VERDICT r13 #1): ingest the even-orderkey half of lineitem into an
    ACID table keyed by the composite (l_orderkey, l_linenumber), then
    MERGE the div-3 slice with the full Delta clause shape —
    ``WHEN MATCHED AND s.l_discount > 0.05 THEN UPDATE SET`` (an
    expression over both sides), ``WHEN MATCHED THEN DELETE``
    (first-match-wins order), and a conditional ``WHEN NOT MATCHED
    THEN INSERT`` — and aggregate the post-merge table. DuckDB replays
    the same clause algebra relationally (join / anti-joins / unions),
    so equality proves clause gating, ordering, expression evaluation,
    and the composite-key pruning end to end (txlog._prepare_merge_into;
    Delta MERGE INTO is the public model — the reference repo has no
    DML)."""
    import tempfile

    from ..sources.txlog import tx_merge, tx_read, tx_write

    cols = [
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_tax", "l_returnflag",
    ]
    li = load_table(spark, sf_dir, "lineitem").select(*cols)
    table = tempfile.mkdtemp(prefix="txlog_merge_into_") + "/t"
    tx_write(
        li.filter(F.col("l_orderkey") % 2 == 0), table,
        stats_cols=["l_orderkey"],
    )
    # fold the source unique per composite key (same algebra as the
    # oracle's src CTE) — the target side keeps its duplicates, so the
    # merge also exercises one-source-row-updates-many-target-rows
    src = (
        li.filter(F.col("l_orderkey") % 3 == 0)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.min("l_quantity").alias("l_quantity"),
            F.min("l_discount").alias("l_discount"),
            F.min("l_tax").alias("l_tax"),
            F.min("l_returnflag").alias("l_returnflag"),
        )
        .select(*cols)
    )
    tx_merge(
        src, table, ["l_orderkey", "l_linenumber"],
        when_matched=[
            {"condition": "s.l_discount > 0.05",
             "set": {"l_quantity": "t.l_quantity + s.l_quantity",
                     "l_returnflag": "'M'"}},
            {"action": "delete"},
        ],
        when_not_matched=[
            {"condition": "s.l_tax < 0.07",
             "values": {"l_orderkey": "s.l_orderkey",
                        "l_linenumber": "s.l_linenumber",
                        "l_quantity": "s.l_quantity",
                        "l_discount": "s.l_discount",
                        "l_tax": "s.l_tax",
                        "l_returnflag": "'I'"}},
        ],
        cdf=False,  # the feed path is pinned in tests; keep the row lean
    )
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


_ROW_TRACK_ORACLE = """
SELECT l_returnflag,
       count(*) AS n_items,
       count(*) AS n_ids,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_qty
FROM lineitem
WHERE NOT (l_linestatus = 'F' AND l_discount < 0.02)
GROUP BY l_returnflag
"""


@register("row_tracking_agg", oracle=_ROW_TRACK_ORACLE)
def row_tracking_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW TRACKING under the value oracle (round 13, VERDICT r12 #5):
    ingest lineitem into a tracked ACID table across two commits,
    DV-delete a slice, SETTLE and COMPACT (both preserving rewrites
    materialize ``_row_id`` into the new bytes), then aggregate over
    ``tx_scan_with_row_ids``. ``n_ids`` counts DISTINCT row ids and
    must equal ``n_items`` — the oracle pins both to DuckDB's direct
    count, so an id collision, a lost id, or a resurrected DV victim
    all surface as value mismatches. (Delta row tracking is the public
    model; reference repo has no storage layer — extension E7+.)"""
    import tempfile

    from ..sources.txlog import (
        tx_apply_deletes,
        tx_compact,
        tx_delete_where,
        tx_enable_row_tracking,
        tx_scan_with_row_ids,
        tx_write,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag", "l_linestatus",
        "l_discount",
    )
    table = tempfile.mkdtemp(prefix="txlog_rowtrack_") + "/t"
    tx_write(li.filter(F.col("l_orderkey") % 2 == 0), table)
    tx_enable_row_tracking(spark, table)
    tx_write(li.filter(F.col("l_orderkey") % 2 == 1), table)
    tx_delete_where(
        spark, table, "l_linestatus = 'F' AND l_discount < 0.02"
    )
    # settle the DV (a preserving rewrite: survivors keep their ids,
    # materialized into the rewritten bytes), then compact
    tx_apply_deletes(spark, table)
    tx_compact(spark, table, target_files=2, max_input_files=64)
    return (
        tx_scan_with_row_ids(spark, table)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.countDistinct("_row_id").alias("n_ids"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
    )


_HISTORY_SELECT_ORACLE = """
WITH pr AS (
  SELECT DISTINCT o_orderpriority AS p FROM orders
),
hist AS (
  SELECT CAST(row_number() OVER (ORDER BY p) - 1 AS BIGINT) AS version,
         'append' AS action,
         p AS txn
  FROM pr
)
SELECT version, action, txn FROM hist WHERE version >= 1
ORDER BY version
"""


@register_local("history_select_agg", oracle=_HISTORY_SELECT_ORACLE)
def history_select_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT-able commit history (round 15, VERDICT r14 #6 —
    ``<name>$history`` as a relation): ingest orders as one append
    commit per priority class (txn id = the priority, sorted), then
    drive a maintenance-style SQL query over the history view —
    filter by version, project (version, action, txn), order. The
    DuckDB oracle reconstructs the expected history rows from the
    data itself (one commit per distinct priority, versions dense
    from 0 in sorted order), so the value hash pins that $history
    reports exactly the commits that happened, composable in plain
    SQL."""
    import tempfile

    from ..sources.tx_sql import tx_register_table, tx_sql
    from ..sources.txlog import tx_write

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    prios = sorted(
        r[0] for r in orders.select("o_orderpriority").distinct().collect()
    )
    d = tempfile.mkdtemp(prefix="history_q_")
    t = f"{d}/orders_by_prio"
    for p in prios:
        tx_write(
            orders.filter(F.col("o_orderpriority") == p), t, txn=p
        )
    tx_register_table(spark, "hist_orders", t)
    return tx_sql(
        spark,
        "SELECT version, action, txn FROM hist_orders$history "
        "WHERE version >= 1 ORDER BY version",
    )


_FILES_META_ORACLE = """
WITH pr AS (
  SELECT o_orderpriority AS p,
         min(o_orderkey) AS lo,
         max(o_orderkey) AS hi
  FROM orders GROUP BY o_orderpriority
)
SELECT CAST(row_number() OVER (ORDER BY p) - 1 AS BIGINT)
         AS add_version,
       CAST(1 AS BIGINT) AS n_files,
       lo, hi
FROM pr
ORDER BY add_version
"""


@register_local("files_meta_agg", oracle=_FILES_META_ORACLE)
def files_meta_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT-able file metadata (round 15 late — ``<name>$files``
    completes the metadata-table family alongside ``$history`` /
    ``$detail``, Iceberg's files metadata table): ingest orders as one
    single-file append commit per priority class (coalesce(1), id
    stats recorded), then answer an operational question in ONE SQL
    statement — per commit, how many files landed and what id range do
    their recorded [min, max] stats claim. The DuckDB oracle
    reconstructs the expected rows from the data itself (versions
    dense from 0 in sorted priority order, exactly one file each, the
    stats range = the priority class's true min/max o_orderkey), so
    the value hash pins that $files reports real file-level metadata —
    add versions, file counts, AND the stats bytes the pruning reads
    trust."""
    import tempfile

    from ..sources.tx_sql import tx_register_table, tx_sql
    from ..sources.txlog import tx_write

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    prios = sorted(
        r[0]
        for r in orders.select("o_orderpriority").distinct().collect()
    )
    d = tempfile.mkdtemp(prefix="files_q_")
    t = f"{d}/orders_files"
    for p in prios:
        tx_write(
            orders.filter(F.col("o_orderpriority") == p).coalesce(1),
            t, stats_cols=["o_orderkey"],
        )
    tx_register_table(spark, "files_orders", t)
    return tx_sql(
        spark,
        "SELECT add_version, "
        "CAST(count(*) AS BIGINT) AS n_files, "
        "min(CAST(get_json_object(stats, '$.o_orderkey[0]') "
        "  AS BIGINT)) AS lo, "
        "max(CAST(get_json_object(stats, '$.o_orderkey[1]') "
        "  AS BIGINT)) AS hi "
        "FROM files_orders$files "
        "GROUP BY add_version ORDER BY add_version",
    )
