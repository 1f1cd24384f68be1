"""The flagship extraction pipeline, end to end.

Spark shape (SURVEY.md §3.1):

    read -> resume anti-join vs lineage -> mapInPandas(extract) as a NARROW
    map over the scan -> bucket repartition -> [write per-bucket + lineage,
    two-phase] -> two-level window-ordered reassembly

Matches the reference's batch rename driver (``apps/legacy/rename.ts:51-106``)
stage for stage: manifest load, backup, anti-join work list, per-item
process, two-phase rename, manifest upsert — except the per-file sequential
loop becomes partition-parallel extraction over Arrow batches.

Scale notes:

* Extraction is row-local, so it runs as a narrow map directly over the
  file scan — NO pre-shuffle. Parallelism and balance come from input
  splits (``spark.sql.files.maxPartitionBytes``), which are uniform by
  construction; a skewed conversation costs nothing here because no stage
  groups by conv_id yet. Measured on this 32-core box, dropping the
  pre-extract repartition removed a full input-sized shuffle and most of
  the system-CPU burn that capped 8->32-core scaling.
* Skew handling lives where keys first meet: the write path buckets by
  ``pmod(xxhash64(conv_id), n_buckets)`` with a conv-level write salt, and
  reassembly uses a two-level chunked concat (contiguous ``turn_idx div
  CHUNK`` ranges — order-preserving salting; see reassemble.py).
* The explicit salted pre-partition (``partitioning.salted_repartition``)
  remains available via ``pre_partition=True`` for operators that DO need
  conv co-location before a per-group stage; results are identical either
  way (tested).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from janet_spark import checkpoint as ckpt
from janet_spark.extract.text_rules import spark_canonicalize_sql
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
# files written per checkpoint bucket: spreads a bucket's write across
# several reducers (and yields multiple parquet files per bucket dir)
WRITE_SALT = 4

# Whitespace code points where Python's str.strip() and Java's \s disagree
# (FS/GS/RS/US, NEL, NBSP, ogham, en-quad..hair space, line/para sep,
# narrow NBSP, math space, ideographic space). Rows containing any of these
# route to the Python branch so span trim offsets stay byte-identical.
_EXOTIC_WS_RE = (
    "[\u001c-\u001f\u0085\u00a0\u1680\u2000-\u200a"
    "\u2028\u2029\u202f\u205f\u3000]"
)


# text that canonicalizes to empty == text of only whitespace/separator
# chars (the rule table only removes/replaces whitespace and maps ligatures
# to letters, so nothing else can vanish) — checked with one cheap regex
# instead of evaluating the full canonicalizer chain per row.
_WS_ONLY_RE = (
    "^[\\s\u001c-\u001f\u0085\u00a0\u1680\u2000-\u200a"
    "\u2028\u2029\u202f\u205f\u3000]*$"
)


def _needs_python(col: str = "text"):
    """Rows the JVM fast path cannot handle: null / whitespace-only
    (tool-JSON fallback), potential HTML ('<'), or exotic whitespace
    (span-trim parity)."""
    return (
        F.col(col).isNull()
        | F.col(col).contains("<")
        | F.col(col).rlike(_WS_ONLY_RE)
        | F.col(col).rlike(_EXOTIC_WS_RE)
    )


def _jvm_plain_extract(df: DataFrame) -> DataFrame:
    """The plain-text extraction branch as pure Spark SQL expressions —
    whole-stage codegen, no Arrow round trip. Semantics identical to the
    pandas plain path in extract/udfs.py: canonicalize (same generated rule
    table, Spark dialect) + span = trimmed extent of the raw payload."""
    canon = F.expr(spark_canonicalize_sql("text"))
    start = (
        F.length("text") - F.length(F.regexp_replace("text", r"^\s+", ""))
    ).cast("int")
    end = F.length(F.regexp_replace("text", r"\s+$", "")).cast("int")
    return df.select(
        "conv_id",
        "turn_idx",
        "role",
        "ts",
        canon.alias("extracted_text"),
        F.array(
            F.struct(
                start.alias("start"), end.alias("end"), F.lit("plain").alias("kind")
            )
        ).alias("spans"),
        F.lit(1).cast("int").alias("blocks_kept"),
        F.lit(0).cast("int").alias("blocks_dropped"),
        F.lit(1).cast("int").alias("span_count"),
        F.lit(True).alias("ok"),
    )


def extract_only(
    transcripts: DataFrame,
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    num_partitions: int | None = None,
    detect_skew: bool = False,
    pre_partition: bool = False,
    jvm_fast_path: bool = False,
) -> DataFrame:
    """Pure transformation: transcripts -> per-turn extraction output.
    No I/O, no checkpointing — composable into queries and tests.

    Default is the narrow plan (map over the scan) through the Arrow-batched
    pandas UDF. ``jvm_fast_path=True`` instead extracts plain-text rows with
    pure Spark SQL expressions (generated canonicalizer, trimmed span
    extents) and sends only HTML/fallback/exotic-whitespace rows to the UDF
    — tested byte-identical, but MEASURED SLOWER on this box (39.0s vs
    26.5s on a 1.9M-turn clean input at 16 cores): Spark's UTF8String
    replace/regexp chain allocates a copy per rule per row, where the
    masked pandas canonicalizer rewrites only rows each rule matches. Kept
    as the documented alternative — on a JVM with cheaper string handling
    or a remote-shuffle cluster the routing flips. ``pre_partition=True``
    inserts the explicit hash(conv_id)+salt repartition first — same
    results, one extra shuffle."""
    if pre_partition:
        skewed = (
            detect_skewed_convs(transcripts, skew_threshold) if detect_skew else []
        )
        src = salted_repartition(transcripts, skewed, salt_buckets, num_partitions)
    elif num_partitions:
        src = transcripts.repartition(num_partitions)
    else:
        src = transcripts
    if not jvm_fast_path:
        return src.mapInPandas(extract_turns_iter, schema=EXTRACT_OUTPUT_DDL)
    needs_py = _needs_python("text")
    py = src.filter(needs_py).mapInPandas(extract_turns_iter, schema=EXTRACT_OUTPUT_DDL)
    jvm = _jvm_plain_extract(src.filter(~needs_py))
    return jvm.unionByName(py)


def run_job(
    spark: SparkSession,
    transcripts: DataFrame,
    output_path: str,
    run_id: str | None = None,
    n_buckets: int = N_CHECKPOINT_BUCKETS,
    write_salt: int = WRITE_SALT,
    fail_after_n_buckets: int | None = None,
) -> dict:
    """Checkpointed batch run: resumable, two-phase-committed, with
    per-bucket lineage. Returns a summary dict (also written as the run's
    manifest)."""
    run_id = run_id or ckpt.new_run_id()
    started = datetime.now(timezone.utc)

    # refuse to resume with a different bucketing (wrong-space anti-join),
    # and clear staging remnants from crashed prior runs
    ckpt.check_bucket_config(output_path, n_buckets)
    ckpt.clean_stale_staging(output_path, run_id)

    work = transcripts.withColumn("part_bucket", partition_bucket("conv_id", n_buckets))
    done = ckpt.completed_buckets(spark, output_path)
    work = ckpt.resume_filter(work, done)

    # fully-resumed rerun: nothing to stage — skip the write entirely
    # (Observation.get has no metrics row when zero tasks ran, and an empty
    # staged write would commit nothing anyway). isEmpty() short-circuits
    # on the first row found, so this probe is cheap at any scale.
    if work.isEmpty():
        summary = {
            "run_id": run_id,
            "phase": "committed",
            "buckets_committed": [],
            "resumed_skipping_buckets": sorted(done),
            "n_turns": 0,
            "started_at": started,
            "finished_at": datetime.now(timezone.utc),
        }
        ckpt.backup_manifest(output_path, run_id, summary)
        return summary

    extracted = extract_only(
        work.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    ).withColumn("part_bucket", partition_bucket("conv_id", n_buckets))

    # per-bucket stats ride the write job itself via observe() — no second
    # scan over the staged output (at 100 TB the old re-read was a full
    # extra pass). Observation metrics are global aggregates, so the
    # per-bucket split is pivoted into 2*n_buckets conditional sums —
    # bounded by the constant bucket count, merged map-side like any
    # partial agg. CAVEAT: accumulator-backed metrics drop FAILED task
    # attempts but can double-count under SPECULATIVE execution (two
    # successful attempts of one task), so when speculation is on we fall
    # back to the exact post-write aggregation — stats feed lineage
    # reporting only (resume keys off row presence, never these counts),
    # but they should still be exact whenever the engine can promise it.
    speculative = (
        spark.conf.get("spark.speculation", "false").lower() == "true"
    )
    from pyspark.sql import Observation

    obs = Observation(f"bucket_stats_{run_id}")
    metric_exprs = []
    for b in range(n_buckets):
        metric_exprs.append(
            F.sum(F.when(F.col("part_bucket") == b, 1).otherwise(0)).alias(f"t{b}")
        )
        metric_exprs.append(
            F.sum(
                F.when(F.col("part_bucket") == b, F.col("ok").cast("long")).otherwise(0)
            ).alias(f"o{b}")
        )

    staging = f"{output_path}/_staging_{run_id}"
    to_write = extracted if speculative else extracted.observe(obs, *metric_exprs)
    (
        to_write
        # one shuffle keyed on (bucket, conv-salt): co-locates each bucket
        # into at most WRITE_SALT files while keeping a conversation in one
        # file; replaces the old full-input pre-extract shuffle
        .repartition(
            F.col("part_bucket"),
            F.pmod(F.xxhash64("conv_id"), F.lit(write_salt)),
        )
        # sort within each write task: costs one in-memory sort per
        # reducer, buys (a) tight per-row-group min/max stats on conv_id,
        # so downstream point reads of one conversation prune row groups
        # instead of scanning the bucket, and (b) better RLE/dict
        # compression from clustered conv_id/turn_idx runs. part_bucket
        # leads the sort keys: dynamic-partition writes require ordering
        # by the partition column, and providing it here means the writer
        # reuses THIS sort instead of injecting its own (which would
        # discard the conv_id/turn_idx clustering).
        .sortWithinPartitions("part_bucket", "conv_id", "turn_idx")
        .write.mode("overwrite")
        .partitionBy("part_bucket")
        .parquet(staging)
    )

    def exact_bucket_stats() -> dict:
        # exact fallback: one column-pruned pass over the staged output
        stats_rows = (
            spark.read.schema(extracted.schema)
            .parquet(staging)
            .groupBy("part_bucket")
            .agg(
                F.count(F.lit(1)).alias("n_turns"),
                F.sum(F.col("ok").cast("long")).alias("n_ok"),
            )
            .collect()
        )
        return {
            int(r["part_bucket"]): {
                "n_turns": int(r["n_turns"]),
                "n_ok": int(r["n_ok"]),
                "started_at": started,
            }
            for r in stats_rows
        }

    if speculative:
        bucket_stats = exact_bucket_stats()
    else:
        metrics = obs.get  # blocks until the write action reports
        # sums are NULL when zero rows flowed -> `or 0`
        bucket_stats = {
            b: {
                "n_turns": int(metrics[f"t{b}"] or 0),
                "n_ok": int(metrics[f"o{b}"] or 0),
                "started_at": started,
            }
            for b in range(n_buckets)
            if int(metrics[f"t{b}"] or 0) > 0
        }
        # Speculation isn't the only way accumulator metrics double-count:
        # a STAGE RE-ATTEMPT (e.g. shuffle fetch failure on a real cluster)
        # re-runs already-successful tasks and their observe() sums merge
        # twice. Cross-check the observed total against the staged row
        # count — parquet count() is metadata-only (footer row counts, no
        # data scan), so this probe is cheap at any scale — and fall back
        # to the exact per-bucket aggregation on any mismatch. Resume is
        # unaffected either way (it keys off row presence, not counts);
        # this keeps the lineage stats exact whenever they are published.
        observed_total = sum(s["n_turns"] for s in bucket_stats.values())
        staged_total = spark.read.schema(extracted.schema).parquet(staging).count()
        if observed_total != staged_total:
            bucket_stats = exact_bucket_stats()

    ckpt.backup_manifest(
        output_path,
        run_id,
        {
            "run_id": run_id,
            "phase": "pre-commit",
            "resumed_skipping_buckets": sorted(done),
            "buckets_staged": sorted(bucket_stats),
            "started_at": started,
        },
    )
    committed = ckpt.commit_staged(
        output_path, staging, run_id, bucket_stats, fail_after_n_buckets
    )
    summary = {
        "run_id": run_id,
        "phase": "committed",
        "buckets_committed": committed,
        "resumed_skipping_buckets": sorted(done),
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
