"""Structured Streaming front-end for the extraction engine.

The reference is a batch + at-least-once job queue (inngest events trigger
enrichment, ``apps/web/app/api/pdfs/file-upload/route.ts:69-74`` ->
``apps/web/lib/inngest/functions.ts:17-43``); it has no true streaming. The
north rule therefore requires a *batch* job with checkpointed resume (see
janet_spark/checkpoint.py). This module is the additional streaming-native
path: the same per-turn extraction stage (stateless, Arrow-vectorized) run
as an incremental Structured Streaming job, where Spark's file-source
checkpoint takes the place of the batch lineage anti-join —
``Trigger.AvailableNow`` drains exactly the files not yet processed and
stops, which is the reference's queue-consumer semantics
(``functions.ts:21-23``) without the queue.

At cluster scale the same code points at a continuously-arriving landing
directory (or Kafka source) with a processing-time trigger; extraction being
stateless means no state store growth — only the windowed aggregation below
carries state, bounded by its watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from janet_spark.extract.udfs import EXTRACT_OUTPUT_DDL, extract_turns_iter

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def read_transcript_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream over a transcript landing directory. Schema is
    pinned (streaming sources cannot infer), matching input_hint."""
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )


def incremental_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Incremental extraction: drain all unprocessed files, extract, append
    to parquet, stop. Re-running after new files land processes ONLY the new
    files (exactly-once via the stream checkpoint) — the streaming analog of
    the batch resume anti-join (rename.ts:61-64)."""
    stream = read_transcript_stream(spark, input_dir)
    extracted = stream.mapInPandas(extract_turns_iter, schema=EXTRACT_OUTPUT_DDL)
    return (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_turn_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> StreamingQuery:
    """Stateful demo: per-conversation tumbling-window turn counts with an
    event-time watermark bounding state (late rows beyond the watermark are
    dropped; on-time aggregates emit once finalized — append mode)."""
    stream = read_transcript_stream(spark, input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "conv_id",
            "n_turns",
            "n_chars",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
