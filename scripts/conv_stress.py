"""Scale/skew stress for the conversation-grain curation suite.

Corpus: the sf0.1 derived transcripts replicated x20 under fresh conv_ids
(so every original conversation becomes an exact 20-copy duplicate clique
— conv_dedup must find ALL of them and keep exactly one per clique) plus
ONE 10^6-turn conversation (the signature's two-level chunking must bound
reducer state: the mega conversation contributes ~977 level-1 chunk rows
of 32 bytes each, never a 10^6-element concat on one reducer).

Checks (hard asserts, not eyeballed):
- conv_dedup: every replica clique has n_copies == 20, the keeper is the
  clique's min conv_id, and the mega conversation survives as a singleton
  with exactly 10^6 turns in its signature aggregate.
- conv_budget_truncate: kept_words <= BUDGET_WORDS for every conversation
  (prefix semantics can never overshoot).
- conv_quality_gate: at most one survivor per duplicate clique.
- tool_call_validate: the invalid count equals the number of tool turns
  synthesized unterminated (turn_idx % 9 == 8), recomputed directly from
  the corpus.

Writes BENCH/conv_stress.json with cold/warm timings per operator.

Usage: python scripts/conv_stress.py   (local[32], ~1.4M turns)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, ".data")
INPUT = os.path.join(DATA, "conv_stress_input")
RESULT = os.path.join(REPO, "BENCH", "conv_stress.json")

REP = 20
MEGA_TURNS = 1_000_000


def materialize(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

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
    mega = spark.range(MEGA_TURNS).select(
        F.lit("zzz-mega").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("mega turn content "), F.col("id").cast("string")).alias(
            "text"
        ),
        F.lit("").alias("tool"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
    )
    replicated.unionByName(mega).repartition(64).write.mode("overwrite").parquet(
        INPUT
    )


def timed(label: str, results: dict, fn) -> None:
    times = []
    for _ in range(2):
        t0 = time.time()
        rows = fn()
        times.append(round(time.time() - t0, 2))
    results["ops"][label] = {"rows": rows, "cold_s": times[0], "warm_s": times[1]}
    print(label, results["ops"][label])


def main() -> int:
    from pyspark.sql import functions as F

    from janet_spark.conversations import (
        BUDGET_WORDS,
        conv_budget_frame,
        conv_dedup_frame,
        conv_loss_mask_frame,
        conv_pack_frame,
        conv_quality_gate_frame,
        conv_stats_frame,
        conv_training_pipeline_frame,
        tool_call_validate_frame,
    )
    from janet_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(DATA, exist_ok=True)
    spark = build_session("conv-stress", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    materialize(spark, sf_dir)
    tr = spark.read.parquet(INPUT)
    n_turns = tr.count()
    n_base_convs = tr.filter(~F.col("conv_id").startswith("zzz")).select(
        "conv_id"
    ).distinct().count()
    results = {"n_turns": n_turns, "n_convs": n_base_convs + 1, "cpus": 32, "ops": {}}
    print("corpus:", results["n_turns"], "turns,", results["n_convs"], "convs")

    # force full execution via xxhash sum (count() alone lets Catalyst
    # prune aggregates; summing a hash of every output value defeats it)
    def force(df) -> int:
        cols = [F.xxhash64(c).cast("double") for c in df.columns]
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(sum(cols, F.lit(0.0))).alias("h"),
        ).collect()[0]
        return int(row["n"])

    timed("conv_dedup", results, lambda: force(conv_dedup_frame(tr)))
    timed("conv_stats", results, lambda: force(conv_stats_frame(tr)))
    timed(
        "conv_budget_truncate", results, lambda: force(conv_budget_frame(tr))
    )
    timed(
        "tool_call_validate", results, lambda: force(tool_call_validate_frame(tr))
    )
    timed(
        "conv_quality_gate", results, lambda: force(conv_quality_gate_frame(tr))
    )
    # the stress corpus's conv_ids are suffixed (-rNN) / synthetic
    # (zzz-mega), so supply an explicit pack ordinal: doc ordinal x100 +
    # replica, mega last
    ordinal = F.when(F.col("conv_id") == "zzz-mega", F.lit(10_000_000)).otherwise(
        F.substring("conv_id", 6, 6).cast("long") * 100
        + F.substring("conv_id", 14, 2).cast("long")
    )
    timed("conv_pack", results, lambda: force(conv_pack_frame(tr, ordinal)))
    timed(
        "conv_training_pipeline",
        results,
        lambda: force(conv_training_pipeline_frame(tr, ordinal)),
    )
    timed(
        "conv_loss_mask",
        results,
        lambda: force(conv_loss_mask_frame(tr, ordinal)),
    )

    checks: dict[str, int] = {}

    # dedup invariants. sf0.1's documents table itself contains a few
    # duplicate texts (4992 distinct of 5000), and identical docs derive
    # identical transcripts — so a clique's size is REP x (number of source
    # docs sharing that text), and the group count is distinct-texts + 1.
    n_distinct_texts = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg(F.countDistinct("text").alias("d"))
        .collect()[0]["d"]
    )
    dd = conv_dedup_frame(tr).cache()
    cliques = dd.filter(~F.col("conv_id").startswith("zzz"))
    bad_copies = cliques.filter(
        (F.col("n_copies") % REP != 0) | (F.col("n_copies") < REP)
    ).count()
    assert bad_copies == 0, f"{bad_copies} cliques with n_copies not a multiple of {REP}"
    merged_cliques = cliques.filter(F.col("n_copies") > REP).count()
    # keeper must be the min conv_id of its clique: replicas are suffixed
    # -r01..-r20, so every keeper ends with -r01
    non_min = cliques.filter(~F.col("conv_id").endswith("-r01")).count()
    assert non_min == 0, non_min
    mega = dd.filter(F.col("conv_id") == "zzz-mega").collect()
    assert len(mega) == 1 and mega[0]["n_copies"] == 1
    assert mega[0]["n_turns"] == MEGA_TURNS, mega[0]["n_turns"]
    n_groups = dd.count()
    dd.unpersist()
    assert n_groups == n_distinct_texts + 1, (n_groups, n_distinct_texts)
    checks["dedup_cliques_multiple_of_rep"] = 1
    checks["dedup_groups_equal_distinct_texts_plus_mega"] = n_groups
    checks["dedup_cross_doc_merged_cliques"] = merged_cliques
    checks["dedup_keeper_is_clique_min"] = 1
    checks["mega_conv_signature_turns"] = MEGA_TURNS

    # budget truncation can never overshoot
    over = (
        conv_budget_frame(tr)
        .filter(F.col("kept_words") > BUDGET_WORDS)
        .count()
    )
    assert over == 0, over
    checks["budget_never_overshoots"] = 1

    # quality gate: at most one survivor per clique (signature dedup holds
    # through the composed plan)
    survivors = conv_quality_gate_frame(tr)
    n_surv = survivors.count()
    assert n_surv <= n_groups, (n_surv, n_groups)
    checks["gate_at_most_one_per_clique"] = 1
    checks["gate_survivors"] = n_surv

    # tool-call validation: invalid == synthesized-unterminated, recomputed
    # independently from the raw corpus
    expected_invalid = tr.filter(
        (F.col("role") == "tool") & (F.col("turn_idx") % 9 == 8)
    ).count()
    got_invalid = (
        tool_call_validate_frame(tr).agg(F.sum("n_invalid").alias("s")).collect()[0]["s"]
    )
    assert got_invalid == expected_invalid, (got_invalid, expected_invalid)
    checks["invalid_equals_unterminated_synthesis"] = int(got_invalid)

    # packing: exact equivalence with the sequential scan, verified in
    # pandas over all 100k conversations (cheap at one row per conv)
    packed = (
        conv_pack_frame(tr, ordinal)
        .withColumn("ord", ordinal)
        .orderBy("ord")
        .toPandas()
    )
    assert len(packed) == results["n_convs"], len(packed)
    cum = packed["n_tokens"].cumsum().shift(fill_value=0)
    assert (packed["seq_id"] == cum // 512).all()
    assert (packed["seq_offset"] == cum % 512).all()
    mega_row = packed[packed["conv_id"] == "zzz-mega"].iloc[0]
    assert int(mega_row["n_tokens"]) == int(
        tr.filter(F.col("conv_id") == "zzz-mega")
        .agg(F.sum(F.size(F.split("text", " "))))
        .collect()[0][0]
    )
    checks["pack_matches_sequential_scan_100k"] = 1
    checks["pack_mega_tokens"] = int(mega_row["n_tokens"])

    results["checks"] = checks
    os.makedirs(os.path.dirname(RESULT), exist_ok=True)
    with open(RESULT, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", RESULT)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
