"""Curation-suite stress run: scale + skew evidence for the round-3
curation operators, the analog of the LSH dense-dup run recorded in
BENCH/BASELINE.md.

Corpus: sf0.1 documents (5,000) replicated x40 with remapped doc_ids
(200,000 docs, ~10M words), plus two planted adversaries:
  - a HOT boilerplate chunk (one exact 8-word phrase prepended to every
    20th doc -> ~10,000 carriers) — stresses the chunk census and the
    broadcast shared set;
  - a MEGA doc of 100,000 words (20x the next largest) — stresses the
    per-row gram/chunk array builders and the per-doc rebuild.

Each operator runs cold then warm (same session); invariants asserted:
the hot chunk is dropped from every carrier, the mega doc rebuilds and
packs, row counts scale exactly 40x where expected.

Usage: python scripts/curation_stress.py [sf_dir]  (writes
BENCH/curation_stress.json)
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
HOT = "the quick brown fox jumps over lazy dogs"  # exactly 8 words
# exactly 10 words = one full substring_dedup gram; prepended to every
# 10th base doc (~20k carriers after replication) it is ONE census/join
# key carrying 20k rows — the hot-key case AQE skew splitting absorbs
HOT10 = "zeta omega prime quark lepton boson gluon photon muon tau"
# mojibake tail for unicode_clean: repaired forms must appear post-clean
MOJI = " cafÃ© â€” donâ€™t"


def build_corpus(spark, sf_dir: str, out_dir: str) -> int:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = docs.count()
    k = spark.range(REPL).select(F.col("id").alias("k"))
    # all the when() predicates key on the ORIGINAL doc_id, so every
    # replica of a base doc gets the same planted dirt — the corpus stays
    # pure cross-doc duplication, which the collapse invariants rely on
    big = (
        docs.crossJoin(k)
        .select(
            (F.col("doc_id") + F.col("k") * 1_000_000).alias("doc_id"),
            F.when(
                F.col("doc_id") % 20 == 0, F.concat(F.lit(HOT + " "), F.col("text"))
            )
            .when(
                F.col("doc_id") % 10 == 5, F.concat(F.lit(HOT10 + " "), F.col("text"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 1_000_000 % 13 == 7,
                F.concat(F.col("text"), F.lit(MOJI)),
            ).otherwise(F.col("text")),
        )
    )
    mega_words = " ".join(
        ["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 10_000
    )
    mega = spark.createDataFrame(
        [(99_000_000, mega_words, "en", "mega", len(mega_words))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    big.unionByName(mega).repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    return n_base * REPL + 1


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = "/tmp/curation_stress"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_docs = build_corpus(spark, sf_dir, out_dir)
    print(f"corpus: {n_docs} docs")

    from janet_spark.queries_text import (
        q_chunk_dedup,
        q_corpus_shuffle,
        q_curation_pipeline_v2,
        q_decontaminate,
        q_lm_score,
        q_pack_examples,
        q_quality_repetition,
        q_sequence_pack,
        q_substring_dedup,
        q_unicode_clean,
    )

    results: dict = {"n_docs": n_docs, "replication": REPL, "ops": {}}
    checks: dict[str, int] = {}
    for name, fn in [
        ("quality_repetition", q_quality_repetition),
        ("chunk_dedup", q_chunk_dedup),
        ("decontaminate", q_decontaminate),
        ("lm_score", q_lm_score),
        ("sequence_pack", q_sequence_pack),
        ("curation_pipeline_v2", q_curation_pipeline_v2),
        ("substring_dedup", q_substring_dedup),
        ("unicode_clean", q_unicode_clean),
        ("corpus_shuffle", q_corpus_shuffle),
        ("pack_examples", q_pack_examples),
    ]:
        times = []
        rows = 0
        for _ in range(2):
            t0 = time.time()
            out = fn(spark, out_dir)
            # count() alone lets Catalyst join-eliminate whole branches
            # (substring_dedup's rebuild is a unique-keyed left join that
            # vanishes under count, measuring 0.5s instead of the real
            # 22s) — and count(col) on non-nullable columns rewrites to
            # count(1), so it is no forcer either. sum(xxhash64(*cols))
            # depends on every output VALUE and defeats both rewrites.
            rows = (
                out.agg(
                    F.count(F.lit(1)),
                    F.sum(F.xxhash64(*out.columns).cast("double")),
                )
                .collect()[0][0]
            )
            times.append(round(time.time() - t0, 2))
        results["ops"][name] = {"rows": rows, "cold_s": times[0], "warm_s": times[1]}
        print(f"{name}: rows={rows} cold={times[0]}s warm={times[1]}s")

    # invariants
    cd = q_chunk_dedup(spark, out_dir)
    hot_left = cd.filter(F.col("clean_text").contains(HOT)).count()
    assert hot_left == 0, f"hot chunk survived in {hot_left} docs"
    mega = cd.filter(F.col("doc_id") == 99_000_000).collect()[0]
    assert mega["n_chunks_kept"] + mega["n_chunks_dropped"] == 12_500
    checks["hot_chunk_dropped_everywhere"] = 1
    checks["mega_doc_chunks"] = 12_500

    packed = q_sequence_pack(spark, out_dir)
    n_seqs = packed.agg(F.max("seq_id")).collect()[0][0]
    checks["n_packed_sequences"] = int(n_seqs) + 1  # seq_id is 0-based

    # a 40x-replicated corpus is PURE cross-doc duplication: every grid
    # chunk appears in 40 docs, so the composed pipeline must classify
    # the whole corpus as boilerplate and emit nothing — the correct
    # answer, asserted as a semantic invariant rather than a surprise
    v2_rows = results["ops"]["curation_pipeline_v2"]["rows"]
    assert v2_rows == 0, f"replicated corpus should fully collapse, got {v2_rows}"
    checks["replicated_corpus_collapses_to_zero"] = 1

    # substring_dedup on a 40x-replicated corpus: every >=10-word doc is
    # pure cross-doc duplication and must empty out entirely; the hot
    # 10-gram (one key, ~20k carriers) must vanish from every carrier;
    # the mega doc is WITHIN-doc repetition only and must be kept whole
    sd = q_substring_dedup(spark, out_dir)
    hot10_left = sd.filter(F.col("clean_text").contains(HOT10)).count()
    assert hot10_left == 0, f"hot 10-gram survived in {hot10_left} docs"
    mega_sd = sd.filter(F.col("doc_id") == 99_000_000).collect()[0]
    assert mega_sd["n_words_removed"] == 0, mega_sd["n_words_removed"]
    emptied = sd.filter(F.col("clean_text") == "").count()
    assert emptied >= int(0.95 * n_docs), f"only {emptied}/{n_docs} emptied"
    checks["hot_10gram_dropped_everywhere"] = 1
    checks["mega_doc_within_dup_kept_whole"] = 1
    checks["substring_emptied_docs"] = emptied

    # unicode_clean: exactly the planted mojibake carriers change, and the
    # repaired forms come out; everything else rides the ASCII fast path
    uc = q_unicode_clean(spark, out_dir)
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected_moji = docs0.filter(F.col("doc_id") % 13 == 7).count() * REPL
    changed = uc.filter(F.col("was_changed")).count()
    assert changed == expected_moji, (changed, expected_moji)
    repaired = uc.filter(
        F.col("clean_text").contains("café")
        & F.col("clean_text").contains("don’t")
    ).count()
    assert repaired == expected_moji, (repaired, expected_moji)
    checks["mojibake_carriers_repaired"] = changed

    # corpus_shuffle: a valid permutation at 200k docs, bounded shards
    cs = q_corpus_shuffle(spark, out_dir)
    agg = cs.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("shuffle_rank").alias("nd"),
        F.max("shuffle_rank").alias("mx"),
    ).collect()[0]
    assert agg["n"] == n_docs and agg["nd"] == n_docs and agg["mx"] == n_docs - 1
    max_shard = (
        cs.groupBy("shard").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_shard <= 100, max_shard
    checks["shuffle_permutation_valid_200k"] = 1

    # pack_examples: token conservation (every doc token lands in exactly
    # one sequence) and contiguous seq ids; the mega doc's 100k tokens
    # must appear in full
    pe = q_pack_examples(spark, out_dir)
    agg2 = pe.agg(
        F.sum("n_tokens").alias("tok"),
        F.sum("n_docs").alias("docs"),
        F.max("seq_id").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert agg2["docs"] == n_docs
    # ids can have gaps (a straddling doc skips the windows it covers)
    # but never exceed the token total's window count; the max id bounds
    # total tokens from below
    assert agg2["n"] <= agg2["mx"] + 1
    assert agg2["tok"] >= 512 * agg2["mx"]
    # docs stay whole: the 100k-word mega doc lands in ONE sequence,
    # which therefore carries at least its 100k+ tokens
    max_seq_tok = pe.agg(F.max("n_tokens")).collect()[0][0]
    assert max_seq_tok >= 100_000, max_seq_tok
    checks["mega_doc_packs_whole"] = 1
    checks["pack_examples_token_conservation"] = int(agg2["tok"])
    results["checks"] = checks

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/curation_stress.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "ops"}))
    print("wrote BENCH/curation_stress.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
