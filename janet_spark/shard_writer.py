"""Deterministic training-shard materialization.

`corpus_shuffle` (queries_text) defines the training ORDER — a seeded md5
permutation with contiguous shard ranges. This module makes that order
physical: one parquet file per shard, rows inside each file already in
shuffle order, so a training loader streams shards sequentially with zero
further sorting. Reshuffling for a new epoch = a new seed = a new output
directory; the input is never rewritten.

Scale shape (the part that must survive 100 TB):
- the global rank is NEVER a single-partition sort: ranks come from 256
  md5-prefix blocks ranked locally plus a broadcast 256-row prefix sum
  of block counts (`shuffle_ranked`, shared with the oracle-checked
  query so the two cannot drift);
- the write repartitions by shard id, so each task holds whole shards
  and `partitionBy("shard")` emits exactly one file per shard; in-file
  order comes from sortWithinPartitions, a per-task sort bounded by
  shard_size rows;
- the only driver-side value is max(shard) — one long.

Production runs wrap this in the same staged-commit contract as
pipeline.run_job (write to a staging dir, atomic rename on success);
kept separate here so the ordering logic is testable on its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def shuffle_ranked(
    docs: DataFrame, seed: str, shard_size: int, key_col: str = "doc_id"
) -> DataFrame:
    """All input columns plus (shuffle_rank, shard) under the seeded-md5
    permutation. Ordering by (blk, skey) equals ordering by skey because
    the block is a prefix of the key; the unpartitioned offsets window is
    bounded by the 256-value block alphabet, not the corpus."""
    key = F.md5(F.concat_ws(":", F.lit(seed), F.col(key_col)))
    blocked = docs.withColumn("__skey", key).withColumn(
        "__blk", F.substring("__skey", 1, 2)
    )
    wb = Window.partitionBy("__blk").orderBy("__skey")
    ranked = blocked.withColumn("__in_blk", F.row_number().over(wb))
    counts = blocked.groupBy("__blk").agg(F.count(F.lit(1)).alias("__n"))
    wo = Window.orderBy("__blk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(wo), F.lit(0))
    )
    return (
        ranked.join(F.broadcast(offsets.select("__blk", "__off")), "__blk")
        .withColumn(
            "shuffle_rank", (F.col("__off") + F.col("__in_blk") - 1).cast("long")
        )
        .withColumn(
            "shard", F.floor(F.col("shuffle_rank") / F.lit(shard_size)).cast("long")
        )
        .drop("__skey", "__blk", "__in_blk", "__off")
    )


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    seed: str = "ep0",
    shard_size: int = 100_000,
) -> int:
    """Write `docs` as training shards under ``out_dir/shard=N/``; returns
    the number of shards written. One file per shard, rows in shuffle
    order within the file (parquet preserves task row order)."""
    ranked = shuffle_ranked(docs, seed, shard_size)
    max_shard = ranked.agg(F.max("shard")).collect()[0][0]
    if max_shard is None:  # empty input: zero shards, nothing to write
        return 0
    n_shards = int(max_shard) + 1
    (
        ranked.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_rank")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    return n_shards
