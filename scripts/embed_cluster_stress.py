"""Embedding-clustering stress: kmeans_assign + semdedup + semantic
decontamination at 80k vectors.

Corpus: sf0.1 embeddings (2,000 x 64-dim) replicated x40 with remapped
vec_ids (80,000 vectors) — every original becomes a 40-clique of IDENTICAL vectors
(cosine 1.0), which makes the semantics sharply checkable at scale:

* kmeans_assign must put all REPL replicas of a vector in the SAME cluster
  (identical inputs, deterministic tie-break);
* semdedup's drop-if-dominated rule must keep AT MOST ONE vector per
  replica group, and when a keeper exists it must be the group's MIN id
  (the min either survives, or is dominated by a lower-id near-dup from
  another group — in which case it dominates its whole clique and the
  group keeps nothing).

Usage: python scripts/embed_cluster_stress.py [sf_dir]
(writes BENCH/embed_cluster_stress.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPL = 40


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = "/tmp/embed_cluster_stress"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_base = emb.count()
    k = spark.range(REPL).select(F.col("id").alias("k"))
    (
        emb.crossJoin(k)
        .select(
            (F.col("vec_id") + F.col("k") * 1_000_000).alias("vec_id"),
            "embedding",
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/embeddings.parquet")
    )
    n_docs = n_base * REPL
    print(f"corpus: {n_docs} vectors ({n_base} originals x {REPL})")

    from janet_spark.queries_extra import q_kmeans_assign, q_semdedup

    results: dict = {"n_vectors": n_docs, "replication": REPL, "ops": {}}
    for name, fn in [("kmeans_assign", q_kmeans_assign), ("semdedup", q_semdedup)]:
        times = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, out_dir).agg(
                F.count(F.lit(1)),
                F.sum(F.xxhash64("vec_id", "cluster").cast("double")),
            ).collect()
            times.append(round(time.time() - t0, 2))
        results["ops"][name] = {"cold_s": times[0], "warm_s": times[1]}
        print(f"{name}: cold={times[0]}s warm={times[1]}s")

    checks: dict[str, int] = {}

    km = q_kmeans_assign(spark, out_dir).withColumn(
        "orig", F.col("vec_id") % 1_000_000
    )
    n_groups_split = (
        km.groupBy("orig")
        .agg(F.countDistinct("cluster").alias("nc"))
        .filter(F.col("nc") > 1)
        .count()
    )
    assert n_groups_split == 0, f"{n_groups_split} replica groups split"
    checks["replica_groups_share_cluster"] = 1

    sd = q_semdedup(spark, out_dir).withColumn("orig", F.col("vec_id") % 1_000_000)
    per_group = (
        sd.groupBy("orig")
        .agg(
            F.sum(F.col("keep").cast("int")).alias("n_keep"),
            F.min(F.when(F.col("keep"), F.col("vec_id"))).alias("kept_id"),
            F.min("vec_id").alias("min_id"),
        )
        .collect()
    )
    assert all(r["n_keep"] <= 1 for r in per_group), "replica clique kept >1"
    bad = [r for r in per_group if r["n_keep"] == 1 and r["kept_id"] != r["min_id"]]
    assert not bad, f"keeper is not the group min: {bad[:3]}"
    n_kept = sum(r["n_keep"] for r in per_group)
    assert 0 < n_kept <= n_base
    checks["at_most_one_keeper_per_clique"] = 1
    checks["keeper_is_group_min"] = 1
    checks["n_keepers"] = int(n_kept)
    # --- decontaminate_semantic at 80k: the eval slice is vec_id % 13 ==
    # 0 over REMAPPED ids, so every eval vector has 39+ identical twins
    # among the training rows (cosine 1.0) — each MUST be flagged with
    # sim == 1.0; and no eval id may appear on the removal list.
    from janet_spark.queries_text import _SEMDECON_MOD, q_decontaminate_semantic

    times = []
    for _ in range(2):
        t0 = time.time()
        q_decontaminate_semantic(spark, out_dir).agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64("vec_id", "eval_id").cast("double")),
        ).collect()
        times.append(round(time.time() - t0, 2))
    results["ops"]["decontaminate_semantic"] = {
        "cold_s": times[0], "warm_s": times[1]
    }
    print(f"decontaminate_semantic: cold={times[0]}s warm={times[1]}s")

    ds = q_decontaminate_semantic(spark, out_dir).persist()
    assert ds.filter(F.col("vec_id") % _SEMDECON_MOD == 0).count() == 0
    # training twins of eval vectors: identical embedding, different id —
    # every one flagged at sim 1.0
    eval_origs = (
        spark.read.parquet(f"{out_dir}/embeddings.parquet")
        .filter(F.col("vec_id") % _SEMDECON_MOD == 0)
        .select((F.col("vec_id") % 1_000_000).alias("orig"))
        .distinct()
    )
    twins = (
        spark.read.parquet(f"{out_dir}/embeddings.parquet")
        .filter(F.col("vec_id") % _SEMDECON_MOD != 0)
        .withColumn("orig", F.col("vec_id") % 1_000_000)
        .join(eval_origs, "orig", "left_semi")
    )
    n_twins = twins.count()
    missed = twins.join(ds.filter(F.col("sim") == 1.0), "vec_id", "left_anti").count()
    assert missed == 0, f"{missed} identical twins of eval vectors not flagged"
    checks["eval_twins_flagged_at_1"] = int(n_twins)
    ds.unpersist()

    results["checks"] = checks

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/embed_cluster_stress.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
