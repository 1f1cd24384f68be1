"""Scale/skew stress for the dialogue-structure suite (janet_spark/dialogue.py).

Corpus: the sf0.1 derived transcripts replicated x20 under fresh conv_ids,
with the FIRST replica (-r01) truncated by its last turn wherever the
conversation has >= 2 turns — so every multi-turn -r01 copy is an exact
PROPER PREFIX of its 19 longer siblings and `conv_branch_dedup` must drop
precisely those — plus ONE 10^6-turn conversation with cycling roles (the
skew probe: prefix signatures are one window pass, the sft_examples context
lookup must stay a bounded banded join, never a conv-keyed cross join).

Hard asserts (not eyeballed):
- conv_branch_dedup: every planted (truncated multi-turn -r01) proper
  prefix is dropped; the mega conversation survives; every drop BEYOND the
  planted set is independently re-verified by raw-text comparison against
  a strictly longer conversation (which doubles as a hash-collision
  false-drop audit of the summed-md5 signatures).
- conv_prefix_stats: output bounded by the depth cap; the replica cliques
  show up as >= REP-way shared prefixes at depth 1.
- sft_examples: on the mega conversation every example keeps <= MAX_CTX_TURNS
  context turns and <= BUDGET_WORDS context words (the banded join's
  correctness under extreme conversation length).
- conv_merge_roles: output has no consecutive same-role turns in any
  conversation (the repair actually repairs).
- conv_tail_truncate: kept_words <= BUDGET_WORDS unless the pinned first
  turn alone exceeds it.
- best_of_n / preference_pairs: the truncated -r01 copy scores strictly
  lower than its full siblings, so it can never be chosen; rejected != chosen.
- conv_decontaminate: the mega conversation's unique grams hit nothing.

Writes BENCH/dialogue_stress.json with cold/warm timings per operator.

Usage: python scripts/dialogue_stress.py   (local[32], ~1.4M+10^6 turns)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, ".data")
INPUT = os.path.join(DATA, "dialogue_stress_input")
RESULT = os.path.join(REPO, "BENCH", "dialogue_stress.json")

REP = 20
MEGA_TURNS = 1_000_000
MEGA_ID = "conv-999998-mega"  # numeric src id parses; 999998 % 11 != 0 (train)


def materialize(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from janet_spark.derive import derived_transcripts

    base = derived_transcripts(spark, sf_dir)
    n_turns = F.count(F.lit(1)).over(Window.partitionBy("conv_id"))
    replicated = (
        base.withColumn("n_turns", n_turns)
        .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(REP))))
        # replica 1 loses its last turn when the conversation has >= 2:
        # an exact proper prefix of replicas 2..REP
        .filter(
            ~(
                (F.col("rep") == 1)
                & (F.col("n_turns") >= 2)
                & (F.col("turn_idx") == F.col("n_turns") - 1)
            )
        )
        .withColumn(
            "conv_id",
            F.concat(
                F.col("conv_id"),
                F.lit("-r"),
                F.lpad(F.col("rep").cast("string"), 2, "0"),
            ),
        )
        .drop("rep", "n_turns")
    )
    mega = spark.range(MEGA_TURNS).select(
        F.lit(MEGA_ID).alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.col("id") % 3).cast("int") + 1,
        ).alias("role"),
        F.concat(F.lit("mega turn content "), F.col("id").cast("string")).alias(
            "text"
        ),
        F.lit("").alias("tool"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
    )
    replicated.unionByName(mega).repartition(64).write.mode("overwrite").parquet(
        INPUT
    )


def timed(label: str, results: dict, fn) -> int:
    times, rows = [], 0
    for _ in range(2):
        t0 = time.time()
        rows = fn()
        times.append(round(time.time() - t0, 2))
    results["ops"][label] = {"rows": rows, "cold_s": times[0], "warm_s": times[1]}
    print(label, results["ops"][label])
    return rows


def main() -> int:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from janet_spark.conversations import BUDGET_WORDS
    from janet_spark.dialogue import (
        MAX_CTX_TURNS,
        best_of_n_frame,
        conv_branch_dedup_frame,
        conv_decontaminate_frame,
        conv_lang_consistency_frame,
        conv_merge_roles_frame,
        conv_prefix_stats_frame,
        conv_tail_truncate_frame,
        preference_pairs_frame,
        prompt_safe_split_frame,
        sft_examples_frame,
        turn_boilerplate_frame,
    )
    from janet_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(DATA, exist_ok=True)
    spark = build_session(
        "dialogue-stress", master="local[32]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")

    materialize(spark, sf_dir)
    tr = spark.read.parquet(INPUT)
    n_turns = tr.count()
    results = {"n_turns": n_turns, "mega_turns": MEGA_TURNS, "cpus": 32, "ops": {}}
    print("corpus:", n_turns, "turns")

    def force(df) -> int:
        cols = [F.xxhash64(c).cast("double") for c in df.columns]
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(sum(cols, F.lit(0.0))).alias("h"),
        ).collect()[0]
        return int(row["n"])

    timed("conv_prefix_stats", results, lambda: force(conv_prefix_stats_frame(tr)))
    timed("conv_branch_dedup", results, lambda: force(conv_branch_dedup_frame(tr)))
    timed("conv_merge_roles", results, lambda: force(conv_merge_roles_frame(tr)))
    timed("conv_tail_truncate", results, lambda: force(conv_tail_truncate_frame(tr)))
    timed("turn_boilerplate", results, lambda: force(turn_boilerplate_frame(tr)))
    timed("best_of_n", results, lambda: force(best_of_n_frame(tr)))
    timed("preference_pairs", results, lambda: force(preference_pairs_frame(tr)))
    timed("sft_examples", results, lambda: force(sft_examples_frame(tr)))
    timed(
        "conv_lang_consistency",
        results,
        lambda: force(conv_lang_consistency_frame(tr)),
    )
    timed(
        "conv_decontaminate", results, lambda: force(conv_decontaminate_frame(tr))
    )
    timed("prompt_safe_split", results, lambda: force(prompt_safe_split_frame(tr)))

    checks: dict[str, int] = {}

    # --- branch dedup: exactly the multi-turn -r01 copies are dropped ----
    kept = conv_branch_dedup_frame(tr).select("conv_id")
    all_convs = tr.select("conv_id").distinct()
    dropped = all_convs.exceptAll(kept)
    n_turns_per = tr.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    # expected: every -r01 conv whose ORIGINAL had >= 2 turns (i.e. the
    # truncated copy still exists and is a proper prefix of -r02..-r20)
    expected_dropped = (
        n_turns_per.filter(F.col("conv_id").endswith("-r02") & (F.col("n") >= 2))
        .select(
            F.concat(F.substring("conv_id", 1, 11), F.lit("-r01")).alias("conv_id")
        )
    )
    n_dropped = dropped.count()
    n_expected = expected_dropped.count()
    n_missed = expected_dropped.exceptAll(dropped).count()
    checks["branch_dedup_dropped"] = n_dropped
    checks["branch_dedup_planted"] = n_expected
    # every PLANTED proper prefix must be dropped
    assert n_missed == 0, n_missed
    assert kept.filter(F.col("conv_id") == MEGA_ID).count() == 1

    # The corpus also contains NATURAL proper prefixes (one document's
    # word sequence extending another's), so `dropped` may exceed the
    # planted set. Verify every excess drop independently by RAW TEXT —
    # there must exist a strictly longer conversation whose leading turns
    # equal the dropped conversation verbatim. This doubles as a
    # hash-collision false-drop audit (the operator uses summed md5
    # signatures; this check uses the actual strings).
    excess = dropped.exceptAll(expected_dropped)
    n_excess = excess.count()
    checks["branch_dedup_natural"] = n_excess
    assert n_excess < 50_000, n_excess  # sanity: excess stays corpus-shaped
    if n_excess:
        from janet_spark.reassemble import _ordered_concat

        SEP = "\x1f"
        exc_turns = tr.join(F.broadcast(excess), "conv_id")
        exc_full = exc_turns.groupBy("conv_id").agg(
            _ordered_concat("turn_idx", "text", SEP).alias("full_text"),
            F.count(F.lit(1)).alias("n"),
        )
        exc0 = exc_turns.filter(F.col("turn_idx") == 0).select(
            F.col("conv_id").alias("e_conv"), F.col("text").alias("t0")
        )
        cand0 = tr.filter(F.col("turn_idx") == 0).select(
            F.col("conv_id").alias("c_conv"), F.col("text").alias("t0")
        )
        pairs = (
            exc0.join(cand0, "t0")
            .filter(F.col("e_conv") != F.col("c_conv"))
            .join(
                exc_full.select(
                    F.col("conv_id").alias("e_conv"), "full_text", "n"
                ),
                "e_conv",
            )
            .select("e_conv", "c_conv", "full_text", "n")
        )
        cand_prefix = (
            pairs.join(
                tr.select(
                    F.col("conv_id").alias("c_conv"), "turn_idx", "text"
                ),
                "c_conv",
            )
            .filter(F.col("turn_idx") < F.col("n"))
            .groupBy("e_conv", "c_conv", "full_text", "n")
            .agg(
                _ordered_concat("turn_idx", "text", SEP).alias("cand_text"),
                F.count(F.lit(1)).alias("c_n_lead"),
            )
        )
        cand_len = tr.groupBy(F.col("conv_id").alias("c_conv")).agg(
            F.count(F.lit(1)).alias("c_n")
        )
        verified = (
            cand_prefix.join(cand_len, "c_conv")
            .filter(
                (F.col("c_n") > F.col("n"))
                & (F.col("c_n_lead") == F.col("n"))
                & (F.col("cand_text") == F.col("full_text"))
            )
            .select("e_conv")
            .distinct()
            .count()
        )
        assert verified == n_excess, (verified, n_excess)

    # --- prefix stats: bounded by the depth cap; replica cliques visible --
    ps = conv_prefix_stats_frame(tr)
    assert ps.filter(F.col("depth") > 64).count() == 0
    top = ps.filter(F.col("depth") == 1).agg(F.max("n_convs")).collect()[0][0]
    checks["prefix_depth1_max_clique"] = int(top)
    assert top >= REP, top

    # --- sft_examples on the mega conversation: bounded context ----------
    mega_ex = sft_examples_frame(tr.filter(F.col("conv_id") == MEGA_ID))
    bad = mega_ex.filter(
        (F.col("n_ctx_turns") > MAX_CTX_TURNS)
        | (F.col("ctx_words") > BUDGET_WORDS)
    ).count()
    n_mega_ex = mega_ex.count()
    checks["mega_sft_examples"] = n_mega_ex
    assert bad == 0 and n_mega_ex > 0, (bad, n_mega_ex)

    # --- merge_roles: no consecutive same-role turns remain --------------
    merged = conv_merge_roles_frame(tr)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    n_adjacent = (
        merged.withColumn("prev", F.lag("role").over(w))
        .filter(F.col("prev") == F.col("role"))
        .count()
    )
    assert n_adjacent == 0, n_adjacent

    # --- tail truncate: budget respected unless the pin alone exceeds it -
    tt = conv_tail_truncate_frame(tr)
    first_words = tr.filter(F.col("turn_idx") == 0).select(
        "conv_id",
        F.when(F.col("text") == "", F.lit(0))
        .otherwise(F.size(F.split("text", " ")))
        .alias("fw"),
    )
    over = (
        tt.join(first_words, "conv_id")
        .filter(
            (F.col("kept_words") > BUDGET_WORDS) & (F.col("fw") <= BUDGET_WORDS)
        )
        .count()
    )
    assert over == 0, over

    # --- best_of_n / preference_pairs: truncated copy never wins ---------
    # a -r01 winner whose -r02 sibling is LONGER is a truncated copy that
    # beat its strictly-higher-scoring full siblings — impossible
    bon = best_of_n_frame(tr)
    r01_winners = (
        bon.filter(F.col("conv_id").endswith("-r01"))
        .join(n_turns_per, "conv_id")
        .select(
            F.concat(F.substring("conv_id", 1, 11), F.lit("-r02")).alias(
                "conv_id"
            ),
            F.col("n").alias("winner_n"),
        )
    )
    n_truncated_winners = (
        r01_winners.join(n_turns_per, "conv_id")
        .filter(F.col("n") > F.col("winner_n"))
        .count()
    )
    assert n_truncated_winners == 0, n_truncated_winners
    pp = preference_pairs_frame(tr)
    assert pp.filter(F.col("chosen_conv") == F.col("rejected_conv")).count() == 0

    # --- decontaminate: mega grams are unique, never flagged -------------
    dec = conv_decontaminate_frame(tr)
    assert dec.filter(F.col("conv_id") == MEGA_ID).count() == 0

    # --- prompt_safe_split: one side per prompt_sig -----------------------
    straddle = (
        prompt_safe_split_frame(tr)
        .groupBy("prompt_sig")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddle == 0, straddle

    results["checks"] = checks
    with open(RESULT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", RESULT)
    print(json.dumps(checks))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
