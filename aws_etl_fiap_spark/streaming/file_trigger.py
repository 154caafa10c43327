"""File-arrival processing (reference S9): S3 ObjectCreated -> Lambda ->
start_job_run (glue_starter_lambda_function.py:5-35) becomes a Structured
Streaming file source.

Semantics mapping:
- "new object under raw/ triggers the transform" -> ``readStream`` on the
  raw directory: Spark tracks processed files in checkpointed state, so each
  arriving file is processed exactly once — the dedup/bookkeeping the
  Lambda+Glue pair never had (the reference re-scans ALL of raw/ on every
  event and overwrites everything, b3_transform.py:241 + SURVEY §3 EP2).
- ``Trigger.AvailableNow`` gives the batch-job flavor: drain everything
  pending, then stop — i.e. the daily-cron run — while the same code with a
  processing-time trigger is the always-on tail.

At scale: file listing is the bottleneck for huge directories — set
``maxFilesPerTrigger`` to bound micro-batch size, and keep raw/ partitioned
by arrival date so the tracker's namespace stays shallow.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def stream_from_directory(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming scan of a parquet directory (the raw/ layer)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def process_available_files(
    stream_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    out_path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
) -> None:
    """Drain all pending files through ``transform`` into a parquet sink and
    stop (Trigger.AvailableNow) — one "event-driven job run".

    ``foreachBatch`` applies an arbitrary batch transform (including
    aggregations/windows not allowed in append-mode streaming) per
    micro-batch, mirroring "Lambda starts the transform job over the new
    data".
    """

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        out = transform(batch_df)
        writer = out.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out_path)

    (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
