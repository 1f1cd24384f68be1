"""SparkSession factory with scale-oriented defaults.

Tuned for the target workload (wide string payloads through Arrow-batched
pandas UDFs, shuffle-heavy joins/windows):

* AQE on (runtime re-plan, skew-join backstop to our explicit salting),
* Arrow transfer on, with a bounded records-per-batch so long `text`
  payloads don't blow executor memory (SURVEY.md §7 "hard parts" #6),
* shuffle partitions sized for the local[32] sandbox; on a real cluster
  this is overridden via spark-submit --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
# Arrow batch sizing: turns are ~0.3-5 KB of text, so 16384 rows ~= 5-80 MB
# per batch — large enough to amortize the JVM<->Python socket syscalls and
# per-batch pandas fixed costs that dominate at high parallelism, small
# enough to keep worker memory bounded (SURVEY.md §7 hard part #6; at a
# pathological 10 KB/turn a batch is ~160 MB, still fine per worker).
# MEASURED on the 3.94M-turn bench input (best-of-2, fresh JVM each):
#   16 cores: 4096 -> 29.3 s, 8192 -> 23.8 s, 16384 -> 22.4 s, 32768 -> 29.0 s
#   32 cores: 8192 -> 21.0 s, 16384 -> 17.4 s (226k turns/s)
# 32768 regresses (worker memory pressure/locality), so 16384 is the knee.
ARROW_MAX_RECORDS_PER_BATCH = 16384
# Split size for file scans: the extraction stage is a NARROW map over the
# scan (no pre-shuffle), so scan splits ARE its parallelism. 32 MB splits
# give local[32] >= 32 tasks even on a ~1.5 GB input; on a real cluster this
# also bounds per-task Arrow buffering for wide text rows.
FILES_MAX_PARTITION_BYTES = str(32 * 1024 * 1024)


def build_session(
    app_name: str = "janet-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's defaults applied."""
    master = master or os.environ.get("JANET_SPARK_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.sql.files.maxPartitionBytes", FILES_MAX_PARTITION_BYTES)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("JANET_SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_for_session(spark: SparkSession) -> None:
    """Apply the engine's runtime-settable defaults to an externally created
    session (the driver hands us one in ``__spark_entry__``)."""
    runtime = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": str(
            ARROW_MAX_RECORDS_PER_BATCH
        ),
        "spark.sql.files.maxPartitionBytes": FILES_MAX_PARTITION_BYTES,
        "spark.sql.session.timeZone": "UTC",
    }
    for k, v in runtime.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - read-only conf on some builds
            pass
