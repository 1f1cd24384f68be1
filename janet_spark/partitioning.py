"""Explicit partitioning + skew salting for the extraction pipeline.

The north rule requires turns repartitioned by ``hash(conv_id)`` with
explicit salting of skewed conversations. Rationale: a conversation with
10^4+ turns concentrated in one hash partition serializes its extraction
(the reference has the same shape — a 100-page PDF is still one request, its
pages fanned out with ``Promise.all``,
``apps/ocr/src/controllers/ocr-controller.ts:104-118``).

Extraction is per-turn (row-local), so salting is semantically free here;
ordering is restored by the final reassembly window (W1), which is the LAST
shuffle of the pipeline by design (SURVEY.md §7 hard part #3). AQE skew-join
handling stays enabled as a backstop.

At 100 TB the skew census is a cheap count over one string column (column
pruning keeps the scan narrow); the skewed-id set is tiny by definition
(heavy hitters), so it broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SKEW_THRESHOLD = 1_000
DEFAULT_SALT_BUCKETS = 16


def detect_skewed_convs(
    df: DataFrame, threshold: int = DEFAULT_SKEW_THRESHOLD
) -> list[str]:
    """Conversation ids with more than `threshold` turns (heavy hitters).

    Partial aggregation (map-side combine) makes this a narrow pre-shuffle
    count; only (conv_id, count) pairs above threshold reach the driver.
    """
    rows = (
        df.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .filter(F.col("n_turns") > threshold)
        .select("conv_id")
        .collect()
    )
    return [r[0] for r in rows]


def salted_repartition(
    df: DataFrame,
    skewed_convs: list[str],
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition by (conv_id, salt) where salt spreads only the skewed
    conversations across `salt_buckets` buckets (pmod(xxhash64(turn_idx))),
    leaving uniform conversations co-located."""
    if skewed_convs:
        salt = F.when(
            F.col("conv_id").isin(skewed_convs),
            F.pmod(F.xxhash64(F.col("turn_idx")), F.lit(salt_buckets)),
        ).otherwise(F.lit(0))
    else:
        salt = F.lit(0)
    salted = df.withColumn("_salt", salt.cast("int"))
    if num_partitions:
        out = salted.repartition(num_partitions, F.col("conv_id"), F.col("_salt"))
    else:
        out = salted.repartition(F.col("conv_id"), F.col("_salt"))
    return out.drop("_salt")


def partition_bucket(col_name: str = "conv_id", n_buckets: int = 32):
    """Stable content-based bucket id — the checkpoint/lineage unit. Based
    on the data (xxhash64 of conv_id), not on physical task ids, so resume
    survives different parallelism levels between runs.

    NULL keys coalesce to '' first: xxhash64(NULL) is NULL, which would
    route those rows to a `part_bucket=__HIVE_DEFAULT_PARTITION__` dir the
    commit loop cannot parse (and the resume anti-filter's non-null-safe
    isin would re-drop them every run) — degenerate rows still deserve a
    real bucket and a lineage row."""
    return F.pmod(
        F.xxhash64(F.coalesce(F.col(col_name), F.lit(""))), F.lit(n_buckets)
    ).cast("int")
