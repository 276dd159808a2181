"""Streaming sinks: exactly-once parquet output via ``foreachBatch``
(north star §6 streaming extension — the operational side of Structured
Streaming: checkpointed progress + idempotent writes = end-to-end
exactly-once even though ``foreachBatch`` itself is at-least-once).

The pattern: each micro-batch lands in a ``batch_id=N`` subdirectory with
``mode("overwrite")``. A replayed batch (failure between the write and the
checkpoint commit) overwrites its own directory instead of appending
duplicates; the checkpoint dir carries the read offsets, so a restarted
query resumes after the last committed batch. Readers see the union of the
batch directories as one partitioned dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def write_stream_idempotent(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start a ``foreachBatch`` parquet sink whose writes are idempotent
    under micro-batch replay (overwrite-by-batch-id). Returns the running
    query; callers ``awaitTermination()``."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_output(spark: SparkSession, path: str) -> DataFrame:
    """Read the idempotent sink's output back as one dataset (batch_id is a
    partition column; drop it unless auditing batch lineage)."""
    return spark.read.option("basePath", path).parquet(f"{path}/batch_id=*")
