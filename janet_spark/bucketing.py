"""Bucketed-table co-located joins — the shuffle-free join path at scale.

At 100 TB the dominant cost of a repeated fact-to-fact join (e.g. the
extraction output joined back to the raw transcript table on conv_id, or
candidate-pair tables joined to shingle tables on doc_id) is the shuffle of
BOTH sides on every query. Spark's answer is bucketing: write each table
``bucketBy(n, key)`` once, and every subsequent equi-join or aggregation on
that key reads co-located buckets with NO Exchange on either side — the
sort/merge happens per-bucket, pipelined with the scan.

These helpers wrap the two decisions that make bucketing work in practice:

* both sides MUST use the same bucket count (else Spark falls back to
  shuffling the mismatched side; ``spark.sql.bucketing.coalesceBucketsInJoin``
  can bridge 2x ratios, not arbitrary ones);
* the bucket column must be the join key exactly (bucket pruning and the
  no-Exchange guarantee are per-column, not per-expression).

This maps the reference's content-addressed blob layout
(``apps/legacy/src/utils/file.ts`` naming by hash) onto Spark's physical
layout: the hash is the placement function, computed once at write time.
Verified by tests/test_round2_ops.py::test_bucketed_join_no_shuffle, which
asserts the joined plan contains zero Exchange operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 32
) -> None:
    """Persist `df` as a bucketed+sorted managed table on `key`. The sort
    within buckets makes the later join a zero-sort merge as well."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. With matching
    layouts Catalyst plans SortMergeJoin with NO Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)
