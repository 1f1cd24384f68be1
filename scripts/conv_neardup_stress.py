"""Scale/skew stress for conversation-grain near-dup mining
(janet_spark/conversations.py::conv_neardup_frame).

Corpus: the sf0.1 derived transcripts replicated x20 under fresh conv_ids
(every base conversation becomes a 20-copy EXACT clique -> C(20,2)=190
jaccard-1.0 pairs each, ~10^6 verified pairs total — the dense-dup load),
plus PLANTED near-duplicates (one word edited in turn 0 of the first
N_PLANT base conversations with >= MIN_PLANT_TURNS turns — a one-word
edit in a >=81-word conversation moves <= 5 of ~72 distinct shingles, so
Jaccard >= ~0.87 and the planted copy MUST pair with every replica of
its original), plus ONE
10^6-turn conversation (the signing fold must stay bounded: per-turn
signatures min-combine map-side; the mega conversation never concatenates
and — all its turns unique — must pair with nothing).

Hard asserts (not eyeballed):
- every planted near-dup pairs with ALL 20 replicas of its original, at
  jaccard >= 0.8 but < 1.0 (it is a near dup, not an exact one);
- jaccard-1.0 pair count >= sum over exact-text cliques of C(n,2)
  (every exact clique fully discovered through the band join);
- the mega conversation appears in no pair;
- no pair BELOW the 0.8 threshold is emitted (verify stage filters).

After the pair phase, `clustering_phase` runs conv_dedup_fuzzy over the
same corpus (connected components over the ~10^6 mined pairs / 100k
nodes) with its own hard asserts: no replica family splits across
clusters, every cluster's keeper is its min conv_id (cross-family merges
via document-level near-dups are legal), exactly one keep=True per
cluster, and every planted near-dup is clustered with its replicas.

Writes BENCH/conv_neardup_stress.json with timings + pair counts.

Usage: python scripts/conv_neardup_stress.py   (local[32], ~1.4M+10^6 turns)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, ".data")
INPUT = os.path.join(DATA, "conv_neardup_stress_input")
RESULT = os.path.join(REPO, "BENCH", "conv_neardup_stress.json")

REP = 20
MEGA_TURNS = 1_000_000
N_PLANT = 200
MIN_PLANT_TURNS = 6  # sf0.1 convs top out at 7 turns; >=6 turns (>=81
# words, ~72 distinct shingles) keeps the one-word edit at Jaccard >=0.87


def materialize(spark, sf_dir: str) -> list[str]:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from janet_spark.derive import derived_transcripts

    base = derived_transcripts(spark, sf_dir)
    replicated = (
        base.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(REP))))
        .withColumn(
            "conv_id",
            F.concat(
                F.col("conv_id"), F.lit("-r"), F.lpad(F.col("rep").cast("string"), 2, "0")
            ),
        )
        .drop("rep")
    )
    # planted near dups: first N_PLANT base convs with >= MIN_PLANT_TURNS
    # turns, first word of turn 0 replaced
    sizes = base.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    plant_ids = [
        r.conv_id
        for r in sizes.filter(F.col("n") >= MIN_PLANT_TURNS)
        .orderBy("conv_id")
        .limit(N_PLANT)
        .collect()
    ]
    planted = (
        base.join(
            spark.createDataFrame([(c,) for c in plant_ids], "conv_id string"),
            "conv_id",
            "left_semi",
        )
        .withColumn(
            "text",
            F.when(
                F.col("turn_idx") == 0,
                F.concat(F.lit("tweaked"), F.expr("substring(text, instr(text, ' '))")),
            ).otherwise(F.col("text")),
        )
        .withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("-nd")))
    )
    mega = spark.range(MEGA_TURNS).select(
        F.lit("zzz-mega").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("mega turn content "), F.col("id").cast("string")).alias("text"),
        F.lit("").alias("tool"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
    )
    replicated.unionByName(planted).unionByName(mega).repartition(64).write.mode(
        "overwrite"
    ).parquet(INPUT)
    return plant_ids


def clustering_phase(spark, tr, results: dict) -> None:
    """Clustering tail at stress scale: conv_dedup_fuzzy over the ~10^6
    mined pairs (connected components over 100k nodes). Hard asserts:
    every replica family lands in ONE cluster, the keeper of every
    cluster is the cluster-wide min conv_id (cross-family merges via
    document-level near-dups are legal — the rep is then the min over
    the MERGED cluster), and each planted near-dup is clustered with its
    replicas, never as a singleton."""
    import time as _time

    from pyspark.sql import functions as F

    from janet_spark.conversations import conv_dedup_fuzzy_frame

    t0 = _time.time()
    clusters = conv_dedup_fuzzy_frame(tr).persist()
    n_rows = clusters.count()
    results["cluster_s"] = round(_time.time() - t0, 2)
    results["n_clustered_convs"] = n_rows

    # one cluster per replica family (replicas share the base prefix)
    base = clusters.withColumn("base_id", F.substring("conv_id", 1, 11))
    split = (
        base.groupBy("base_id")
        .agg(F.countDistinct("cluster_rep").alias("n_reps"))
        .filter(F.col("n_reps") != 1)
        .count()
    )
    assert split == 0, f"{split} replica families split across clusters"
    # keeper rule: the rep IS the min conv_id of its whole cluster
    wrong_rep = (
        clusters.groupBy("cluster_rep")
        .agg(F.min("conv_id").alias("min_member"))
        .filter(F.col("cluster_rep") != F.col("min_member"))
        .count()
    )
    assert wrong_rep == 0, wrong_rep
    # exactly one keep=True per cluster
    multi_keep = (
        clusters.groupBy("cluster_rep")
        .agg(F.sum(F.col("keep").cast("int")).alias("k"))
        .filter(F.col("k") != 1)
        .count()
    )
    assert multi_keep == 0, multi_keep
    # every planted -nd conv clusters WITH its replicas (size >= 21)
    nd_rows = clusters.filter(F.col("conv_id").endswith("-nd"))
    results["n_planted_clustered"] = nd_rows.count()
    lonely = nd_rows.filter(F.col("cluster_size") < 21).count()
    assert lonely == 0, f"{lonely} planted near-dups without their replicas"
    clusters.unpersist()


def main() -> int:
    from pyspark.sql import functions as F

    from janet_spark.conversations import conv_neardup_frame, conversation_signatures

    from janet_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(DATA, exist_ok=True)
    spark = build_session("conv-neardup-stress", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    plant_ids = materialize(spark, sf_dir)
    assert len(plant_ids) == N_PLANT, len(plant_ids)
    tr = spark.read.parquet(INPUT)
    n_turns = tr.count()
    results = {"n_turns": n_turns, "n_planted": len(plant_ids), "cpus": 32}

    t0 = time.time()
    pairs = conv_neardup_frame(tr).persist()
    n_pairs = pairs.count()
    results["mine_s"] = round(time.time() - t0, 2)
    results["n_pairs"] = n_pairs
    print(f"mined {n_pairs} pairs in {results['mine_s']}s over {n_turns} turns")

    # --- threshold: nothing below 0.8 ---
    below = pairs.filter(F.col("jaccard") < 0.8).count()
    assert below == 0, below

    # --- mega conversation pairs with nothing ---
    mega_pairs = pairs.filter(
        (F.col("c1") == "zzz-mega") | (F.col("c2") == "zzz-mega")
    ).count()
    assert mega_pairs == 0, mega_pairs

    # --- every planted near dup pairs with ALL 20 replicas of its base,
    #     strictly below 1.0 ---
    nd = pairs.filter(
        F.col("c1").endswith("-nd") | F.col("c2").endswith("-nd")
    ).collect()
    by_plant: dict[str, list] = {}
    for r in nd:
        pid, other = (r.c1, r.c2) if r.c1.endswith("-nd") else (r.c2, r.c1)
        by_plant.setdefault(pid, []).append((other, r.jaccard))
    missing = []
    for base_id in plant_ids:
        pid = base_id + "-nd"
        partners = by_plant.get(pid, [])
        reps = {o for o, _ in partners if o.startswith(base_id + "-r")}
        if len(reps) != REP:
            missing.append((pid, len(reps)))
        for o, j in partners:
            if o.startswith(base_id + "-r"):
                assert 0.8 <= j < 1.0, (pid, o, j)
    assert not missing, missing[:5]
    results["planted_recall"] = f"{len(plant_ids) - len(missing)}/{len(plant_ids)} x {REP} replicas"

    # --- exact cliques fully discovered: jaccard-1.0 pairs >= sum C(n,2)
    #     over exact-signature cliques ---
    sig = conversation_signatures(tr)
    clique_pairs = (
        sig.groupBy("conv_sig")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p"))
        .collect()[0]["p"]
    )
    ones = pairs.filter(F.col("jaccard") == 1.0).count()
    assert ones >= int(clique_pairs), (ones, clique_pairs)
    results["pairs_at_1"] = ones
    results["exact_clique_pairs"] = int(clique_pairs)

    pairs.unpersist()
    clustering_phase(spark, tr, results)
    os.makedirs(os.path.dirname(RESULT), exist_ok=True)
    with open(RESULT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", RESULT)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())

