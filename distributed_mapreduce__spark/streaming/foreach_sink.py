"""Exactly-once batch sink for streaming queries via ``foreachBatch``.

Structured Streaming guarantees at-least-once delivery of micro-batches
to ``foreachBatch`` after failures: a batch can be REPLAYED with the same
``batch_id``. Exactly-once therefore means an idempotent writer — here,
one output directory per batch id, written with overwrite, so a replay
rewrites identical data instead of duplicating it. (The same pattern
backs MERGE-into-Delta sinks; plain parquet makes it dependency-free.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_stream_exactly_once(
    df: DataFrame, out_dir: str, checkpoint_dir: str, query_name: str = "eo_sink"
):
    """Start the stream writing each micro-batch to
    ``{out_dir}/batch_id=N`` idempotently; returns the StreamingQuery.

    The checkpoint ties batch ids to source offsets — a restart resumes
    from the last committed batch and any replayed batch overwrites its
    own directory (no dupes, no loss)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        )

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def read_sink(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read everything the exactly-once sink has committed."""
    return spark.read.option("basePath", out_dir).parquet(out_dir + "/batch_id=*")
