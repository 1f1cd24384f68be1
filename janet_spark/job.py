"""spark-submit entrypoint for the extraction pipeline.

    spark-submit --py-files janet_spark.zip janet_spark/job.py \
        --input /path/to/transcripts_parquet \
        --output /path/to/output \
        [--skew-threshold 1000] [--salt-buckets 16] [--n-buckets 256]

On a real cluster the input/output would be Iceberg tables
(`spark.read.table` / `MERGE INTO`); the parquet layout used here keeps the
same commit ordering and the same resume contract (see checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="transcripts parquet dir / table")
    p.add_argument("--output", required=True, help="output root (data + lineage)")
    p.add_argument("--skew-threshold", type=int, default=1000)
    p.add_argument("--salt-buckets", type=int, default=16)
    p.add_argument("--n-buckets", type=int, default=256)
    p.add_argument("--run-id", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from janet_spark.pipeline import run_job
    from janet_spark.session import tune_for_session

    spark = SparkSession.builder.appName("janet-extract").getOrCreate()
    tune_for_session(spark)

    t0 = time.time()
    transcripts = spark.read.parquet(args.input)
    summary = run_job(
        spark,
        transcripts,
        args.output,
        run_id=args.run_id,
        skew_threshold=args.skew_threshold,
        salt_buckets=args.salt_buckets,
        n_buckets=args.n_buckets,
    )
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "run_id": summary["run_id"],
                "n_turns": summary["n_turns"],
                "elapsed_sec": round(elapsed, 2),
                "turns_per_sec": round(summary["n_turns"] / elapsed, 1),
                "buckets_committed": len(summary["buckets_committed"]),
                "resumed_skipping": len(summary["resumed_skipping_buckets"]),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
