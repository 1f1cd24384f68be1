"""Verify-tail bound stress (round-3 verdict #4): a hot bucket whose
REPRESENTATIVE is a 10^6-turn conversation.

The star expansion of such a bucket emits one candidate pair
(mega, member) per member; the exact-Jaccard verify joins each candidate
against both sides' full shingle tables, so every candidate fans out
against the mega conversation's ~10^6 shingle rows — per-pair cost
O(|shingles(rep)|), ~3x10^8 join-input rows for a 300-member bucket.
The estimated-Jaccard prefilter (conversations._sig_prefilter) kills
those candidates with 64-element signature arithmetic instead: a bucket
member shares one band (4 components) with the rep, so its estimate sits
near 0.06 — 5 sigma below anything that could verify at the 0.8 bar.

This script PLANTS that exact candidate set (the star expansion a hot
bucket with the mega conversation as min-id rep produces, by
construction of conv_neardup_frame) plus genuine near-dup candidates,
then runs the shared verify tail WITH and WITHOUT the prefilter:

hard asserts
- pair outputs are IDENTICAL (the estimator is only a conservative
  prefilter — no behavior change);
- with the prefilter, every mega-star candidate dies before the shingle
  join (the mega conversation leaves the candidate-conv set entirely),
  so the verify-side shingle table is bounded by the GENUINE candidates'
  sizes — published as shingle_rows_{with,without}_prefilter.

Writes BENCH/conv_verify_prefilter_stress.json.

Usage: python scripts/conv_verify_prefilter_stress.py [--fast]  (local[32])

--fast (the acceptance battery's --stress tier) skips the WITHOUT-prefilter
baseline leg — the ~6 min unbounded shape whose cost is the very thing the
prefilter removes — and asserts against the PLANTED truth instead: the
corpus is constructed, so the exact expected pair set (the N_NEARDUP
genuine pairs), the mega conversation's departure from the candidate set,
and the bounded shingle fan-out are all checkable without re-running the
unbounded baseline. The full A/B (output identity vs the no-prefilter run)
remains the default mode for evidence refreshes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULT = os.path.join(REPO, "BENCH", "conv_verify_prefilter_stress.json")

MEGA_TURNS = 1_000_000
N_STAR = 300  # hot-bucket members starred against the mega representative
N_NEARDUP = 50  # genuine near-dup pairs that must survive both runs


def build_corpus(spark):
    from pyspark.sql import functions as F

    mega = spark.range(MEGA_TURNS).select(
        F.lit("aaa-mega").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("mega turn content "), F.col("id").cast("string")).alias(
            "text"
        ),
        F.lit("").alias("tool"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
    )
    # 300 bucket members: 6 distinct-content turns each (nothing like the
    # mega conversation; the star candidates exist because the BUCKET put
    # them together, which is exactly the degenerate-band scenario)
    members = (
        spark.range(N_STAR)
        .select(
            F.concat(F.lit("hot-"), F.lpad(F.col("id").cast("string"), 4, "0")).alias(
                "conv_id"
            ),
            F.col("id").alias("m"),
            F.explode(F.sequence(F.lit(0), F.lit(5))).alias("turn_idx"),
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.concat(
                F.lit("member "),
                F.col("m").cast("string"),
                F.lit(" says unique thing number "),
                F.col("turn_idx").cast("string"),
                F.lit(" about topic alpha beta gamma delta epsilon zeta eta"),
            ).alias("text"),
            F.lit("").alias("tool"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("turn_idx")).alias("ts"),
        )
    )
    # genuine near-dups: pairs (nd-i-a, nd-i-b) differing by one word in
    # one of six 12-word turns -> Jaccard well above 0.8
    base_words = (
        "the quick brown fox jumps over a lazy dog near the riverbank "
        "while birds sing softly in morning light across quiet fields"
    )
    nd = (
        spark.range(N_NEARDUP)
        .select(
            F.col("id").alias("i"),
            F.explode(F.array(F.lit("a"), F.lit("b"))).alias("side"),
        )
        .select(
            F.concat(
                F.lit("nd-"), F.lpad(F.col("i").cast("string"), 3, "0"),
                F.lit("-"), F.col("side"),
            ).alias("conv_id"),
            F.col("i"),
            F.col("side"),
            F.explode(F.sequence(F.lit(0), F.lit(5))).alias("turn_idx"),
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.when(
                (F.col("side") == "b") & (F.col("turn_idx") == 0),
                F.concat(
                    F.lit("tweaked "),
                    F.lit(base_words),
                    F.lit(" variant "),
                    F.col("i").cast("string"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit("intro "),
                    F.lit(base_words),
                    F.lit(" variant "),
                    F.col("i").cast("string"),
                    F.lit(" turn "),
                    F.col("turn_idx").cast("string"),
                )
            )
            .alias("text"),
            F.lit("").alias("tool"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("turn_idx")).alias("ts"),
        )
    )
    return mega.unionByName(members).unionByName(nd)


def main() -> int:
    from pyspark.sql import functions as F

    from janet_spark.conversations import (
        _conv_shingle_df,
        _conv_verify_candidates,
        _sig_prefilter,
        conv_sig_df,
    )
    from janet_spark.session import build_session

    spark = build_session(
        "conv-verify-prefilter-stress", master="local[32]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")

    tr = build_corpus(spark).repartition(64).persist()
    n_turns = tr.count()

    # the star expansion a hot bucket with rep=aaa-mega emits, plus the
    # genuine candidates LSH banding would surface for the nd pairs
    star = spark.range(N_STAR).select(
        F.lit("aaa-mega").alias("c1"),
        F.concat(F.lit("hot-"), F.lpad(F.col("id").cast("string"), 4, "0")).alias(
            "c2"
        ),
    )
    genuine = spark.range(N_NEARDUP).select(
        F.concat(
            F.lit("nd-"), F.lpad(F.col("id").cast("string"), 3, "0"), F.lit("-a")
        ).alias("c1"),
        F.concat(
            F.lit("nd-"), F.lpad(F.col("id").cast("string"), 3, "0"), F.lit("-b")
        ).alias("c2"),
    )
    candidates = star.unionByName(genuine).persist()
    n_cand = candidates.count()

    sigs = conv_sig_df(tr).persist()
    sigs.count()

    fast = "--fast" in sys.argv
    results = {"n_turns": n_turns, "n_candidates": n_cand, "cpus": 32,
               "mode": "fast" if fast else "full"}

    def shingle_rows(cand):
        convs = (
            cand.select(F.col("c1").alias("conv_id"))
            .unionByName(cand.select(F.col("c2").alias("conv_id")))
            .distinct()
        )
        return _conv_shingle_df(
            tr.join(convs, "conv_id", "left_semi")
        ).count()

    # --- WITHOUT prefilter: the unbounded shape (skipped in --fast) ---
    if not fast:
        t0 = time.time()
        base_pairs = _conv_verify_candidates(tr, candidates).collect()
        results["verify_s_without_prefilter"] = round(time.time() - t0, 2)
        results["shingle_rows_without_prefilter"] = shingle_rows(candidates)

    # --- WITH prefilter ---
    t0 = time.time()
    pref_pairs = _conv_verify_candidates(tr, candidates, sigs=sigs).collect()
    results["verify_s_with_prefilter"] = round(time.time() - t0, 2)
    surviving = _sig_prefilter(candidates.distinct(), sigs).persist()
    results["candidates_after_prefilter"] = surviving.count()
    results["shingle_rows_with_prefilter"] = shingle_rows(surviving)

    # hard assert 1: identical pair output (full mode; in --fast the
    # planted truth below IS the expected output)
    if not fast:
        assert sorted(map(tuple, base_pairs)) == sorted(map(tuple, pref_pairs)), (
            len(base_pairs),
            len(pref_pairs),
        )
    results["n_pairs"] = len(pref_pairs)
    # hard assert 2: every genuine near-dup survived end-to-end
    assert len(pref_pairs) == N_NEARDUP, len(pref_pairs)
    # hard assert 3: the mega representative left the candidate set, so
    # its 10^6 shingles never reach the intersection join
    mega_left = surviving.filter(
        (F.col("c1") == "aaa-mega") | (F.col("c2") == "aaa-mega")
    ).count()
    assert mega_left == 0, mega_left
    if fast:
        # bounded fan-out vs the planted corpus itself: the surviving
        # candidates' shingle table must exclude the mega conversation's
        # ~10^6 rows (it alone dwarfs everything else in the corpus)
        assert results["shingle_rows_with_prefilter"] < MEGA_TURNS / 100, results
    else:
        assert (
            results["shingle_rows_with_prefilter"]
            < results["shingle_rows_without_prefilter"] / 100
        ), results

    os.makedirs(os.path.dirname(RESULT), exist_ok=True)
    out_path = RESULT.replace(".json", "_fast.json") if fast else RESULT
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
