"""The flagship extraction pipeline, end to end.

Spark shape (SURVEY.md §3.1):

    read -> resume anti-join vs lineage -> skew census -> salted
    repartition by hash(conv_id) -> mapInPandas(extract) -> [write
    per-bucket + lineage, two-phase]  -> window-ordered reassembly

Matches the reference's batch rename driver (``apps/legacy/rename.ts:51-106``)
stage for stage: manifest load, backup, anti-join work list, per-item
process, two-phase rename, manifest upsert — except the per-file sequential
loop becomes partition-parallel extraction over Arrow batches.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from janet_spark import checkpoint as ckpt
from janet_spark.extract.udfs import EXTRACT_OUTPUT_DDL, extract_turns_iter
from janet_spark.partitioning import (
    DEFAULT_SALT_BUCKETS,
    DEFAULT_SKEW_THRESHOLD,
    detect_skewed_convs,
    partition_bucket,
    salted_repartition,
)
from janet_spark.reassemble import reassemble_conversations

N_CHECKPOINT_BUCKETS = 32


def extract_only(
    transcripts: DataFrame,
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    num_partitions: int | None = None,
    detect_skew: bool = True,
) -> DataFrame:
    """Pure transformation: transcripts -> per-turn extraction output.
    No I/O, no checkpointing — composable into queries and tests."""
    skewed = detect_skewed_convs(transcripts, skew_threshold) if detect_skew else []
    salted = salted_repartition(transcripts, skewed, salt_buckets, num_partitions)
    return salted.mapInPandas(extract_turns_iter, schema=EXTRACT_OUTPUT_DDL)


def run_job(
    spark: SparkSession,
    transcripts: DataFrame,
    output_path: str,
    run_id: str | None = None,
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    n_buckets: int = N_CHECKPOINT_BUCKETS,
    fail_after_n_buckets: int | None = None,
) -> dict:
    """Checkpointed batch run: resumable, two-phase-committed, with
    per-bucket lineage. Returns a summary dict (also written as the run's
    manifest)."""
    run_id = run_id or ckpt.new_run_id()
    started = datetime.now(timezone.utc)

    work = transcripts.withColumn("part_bucket", partition_bucket("conv_id", n_buckets))
    done = ckpt.completed_buckets(spark, output_path)
    work = ckpt.resume_filter(work, done)

    skewed = detect_skewed_convs(work, skew_threshold)
    salted = salted_repartition(
        work.select("conv_id", "turn_idx", "role", "text", "tool", "ts"),
        skewed,
        salt_buckets,
    )
    extracted = salted.mapInPandas(extract_turns_iter, schema=EXTRACT_OUTPUT_DDL)
    extracted = extracted.withColumn(
        "part_bucket", partition_bucket("conv_id", n_buckets)
    )

    staging = f"{output_path}/_staging_{run_id}"
    (
        extracted.write.mode("overwrite")
        .partitionBy("part_bucket")
        .parquet(staging)
    )

    # per-bucket stats for lineage (cheap: metadata-ish agg over the staged
    # output; at cluster scale this is a column-pruned scan of two ints).
    # Schema is pinned: a fully-resumed rerun stages zero rows and inference
    # would fail on the empty dir.
    stats_rows = (
        spark.read.schema(extracted.schema).parquet(staging)
        .groupBy("part_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.col("ok").cast("long")).alias("n_ok"),
        )
        .collect()
    )
    bucket_stats = {
        int(r["part_bucket"]): {
            "n_turns": r["n_turns"],
            "n_ok": r["n_ok"],
            "started_at": started,
        }
        for r in stats_rows
    }

    ckpt.backup_manifest(
        output_path,
        run_id,
        {
            "run_id": run_id,
            "phase": "pre-commit",
            "resumed_skipping_buckets": sorted(done),
            "skewed_convs": skewed,
            "buckets_staged": sorted(bucket_stats),
            "started_at": started,
        },
    )
    committed = ckpt.commit_staged(
        spark, output_path, staging, run_id, bucket_stats, fail_after_n_buckets
    )
    summary = {
        "run_id": run_id,
        "phase": "committed",
        "buckets_committed": committed,
        "resumed_skipping_buckets": sorted(done),
        "skewed_convs": skewed,
        "n_turns": int(sum(s["n_turns"] for s in bucket_stats.values())),
        "started_at": started,
        "finished_at": datetime.now(timezone.utc),
    }
    ckpt.backup_manifest(output_path, run_id, summary)
    return summary


def read_output(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.parquet(ckpt.data_dir(output_path))


def full_pipeline(
    spark: SparkSession, transcripts: DataFrame, output_path: str, **kw
) -> DataFrame:
    """run_job + conversation-level reassembly of the committed output."""
    run_job(spark, transcripts, output_path, **kw)
    return reassemble_conversations(read_output(spark, output_path))
