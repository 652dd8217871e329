"""Structured Streaming equivalents of the reference's pull-based streams.

Reference mechanisms → Spark (SURVEY.md §2.10):
- `streamData(callback)` (src/file_data_loader.cpp:146-173) and the
  chunked-callback pipeline (:175-217) → `readStream` + `foreachBatch`.
- `follow` tail -f mode (src/multi_file_reader.h:16) → the file source
  already globs a directory and picks up new files per trigger.
- the producer/worker/consumer queue with memory watermarks
  (src/file_data_loader.cpp:297-349) → micro-batch scheduling +
  `maxFilesPerTrigger` backpressure.

Event-time windows get real watermarks here (the reference's "watermarks"
are queue *memory* watermarks, src/file_data_loader.h:172-178 — it has no
late-data story at all).

Template mining in a stream uses the assign-only path against a
pre-mined catalog (broadcast), keeping micro-batches stateless; full
streaming mining would need applyInPandasWithState and is deliberately
out of v1 scope (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators.drain import assign_templates, with_shard_key


def stream_lines(spark: SparkSession, path: str, schema: str, fmt: str = "json") -> DataFrame:
    """Tail a directory of files as a stream (follow-mode equivalent)."""
    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", 8)
    return reader.json(path) if fmt == "json" else reader.text(path)


def windowed_template_counts(
    assigned: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time windowed per-template counts with late-data watermark."""
    return (
        assigned.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "template_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "template_id", "n")
    )


def stream_pipeline(
    stream_df: DataFrame,
    catalogs: dict[str, list[list[str]]],
    out_path: str,
    checkpoint: str,
    cfg: PipelineConfig | None = None,
    trigger_available_now: bool = True,
):
    """Micro-batch parse+assign → append sink. Returns the StreamingQuery.

    `catalogs` comes from a batch `mine_catalog` run (mine offline on a
    sample/backfill, assign online — the standard production split)."""
    cfg = cfg or PipelineConfig()

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        keyed = with_shard_key(batch_df, cfg)
        assigned = assign_templates(keyed, catalogs, cfg).drop("salt", "shard_key")
        # exactly-once sink: foreachBatch is at-least-once (a batch that
        # fails after its write is retried with the same batch_id), so the
        # write must be an idempotent REPLACE of this batch's partition —
        # dynamic partition overwrite on _batch_id, not a blind append
        (
            assigned.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )

    writer = stream_df.writeStream.foreachBatch(handle).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
