"""SparkSession factory with scale-aware defaults.

The reference's runtime (master/master.go scheduler, phase barrier,
straggler re-execution — SURVEY.md §2.3) is Spark's scheduler here; this
module only encodes *configuration*: AQE for runtime re-planning (skew
joins, partition coalescing), speculative execution (R4 parity: the
reference re-dispatches tasks in-progress >10 s, master/master.go:111-117),
and shuffle-partition sizing.

Scale notes (100 TB design): the knobs below are expressed relative to
cluster size, not hardcoded for the local test box. On a 1000-executor
cluster you would raise ``spark.sql.shuffle.partitions`` to ~2-3× total
cores (AQE coalesces down), keep AQE + skew-join on, and keep the
broadcast threshold at tens of MB so dimension tables (region/nation/
supplier/part in the star schema) always broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Worker-thread count for local mode; env-overridable by the driver."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = "distributed_mapreduce__spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    - AQE on (coalesce + skew join): replaces hand-tuned partition counts
      at runtime; essential at 100 TB where static tuning is impossible.
    - Speculation on: straggler mitigation (reference R4,
      master/master.go:111-117 re-dispatches slow tasks after 10 s).
    - UTC session timezone: deterministic timestamp semantics and parity
      with the DuckDB oracle (naive-UTC timestamps).
    - Arrow enabled: fast pandas interchange for the Pandas-UDF operators.
    """
    cpus = default_parallelism()
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.speculation", "true")
        .config("spark.speculation.multiplier", "3")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Local-fixture knob: the test parquet files are ~1-20 MB, so the
        # default 128 MB split yields ONE scan partition and serializes
        # the map stage. 4 MB splits let row groups parallelize. On a
        # real cluster with TB-scale inputs, raise this back to 128 MB+.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def get_spark() -> SparkSession:
    """Active session if one exists, else a fresh default-configured one."""
    active = SparkSession.getActiveSession()
    return active if active is not None else build_session()
