"""Distributed BPE tokenizer TRAINING — the full greedy loop at corpus
scale, not just one census round (`bpe_pair_census` is round one of
this loop).

The frozen merges table the engine ships (extract/bpe_merges.py) was
trained by the driver-side scripts/train_bpe.py; this module trains the
SAME table with Spark doing the heavy lifting, so a 100 TB corpus can
grow its own tokenizer:

* ONE corpus pass builds the weighted vocabulary (map-side-combinable
  word census — output is vocabulary-sized, ~sqrt(corpus) by Heaps'
  law). Everything after runs on the vocab frame; the corpus is never
  rescanned.
* The segmented form of each word is a column (' c h a r s ') that each
  accepted merge rewrites with ONE all-occurrences left-to-right
  ``replace()`` — exactly the apply semantics of extract/bpe.py and its
  SQL renderings, so training and application can never disagree.
* Per round: explode adjacent token pairs of the DISTINCT vocabulary
  weighted by word frequency, aggregate, and collect ONE row (the
  greedy argmax with the trainer's tie-break: highest count, then
  lexicographically smallest ``a\\x00b`` — ASCII-only tokens make Spark
  and Python string order identical).
* 48 chained replace() projections deepen the logical plan linearly;
  the vocab frame is localCheckpoint()ed every few rounds — the same
  lineage-cut discipline connected_components uses (SURVEY §10.5).

Determinism: no RNG anywhere; equal-frequency ties break
lexicographically, so the distributed trainer reproduces
scripts/train_bpe.py bit-for-bit (pytest-pinned at sf0.001; the frozen
sf0.01/48 table equality is recorded in BENCH/BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CHECKPOINT_EVERY = 8  # lineage cut cadence for the chained replaces


def _vocab_of_words(words: DataFrame) -> DataFrame:
    """(word, freq, seg) from a one-column (word) frame of corpus word
    OCCURRENCES: the weighted vocabulary with each word's initial
    character segmentation. The one corpus-sized stage."""
    vocab = (
        words.filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # Spark's split(word, '') emits a trailing '' element; trim it away
    seg = F.concat(
        F.lit(" "), F.trim(F.array_join(F.split(F.col("word"), ""), " ")), F.lit(" ")
    )
    return vocab.select("word", "freq", seg.alias("seg"))


def corpus_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted vocabulary of the documents table (the original 48-merge
    training corpus)."""
    from janet_spark.extract.bpe import TOKEN_SPLIT
    from janet_spark.queries_relational import t

    docs = t(spark, sf_dir, "documents")
    return _vocab_of_words(
        docs.select(
            F.explode(
                F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), TOKEN_SPLIT)
            ).alias("word")
        )
    )


def union_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted vocabulary of the FULL engine corpus: document text plus
    customer entity names — the production-size training input (the
    synthetic document prose tops out at a 31-word vocabulary, ~107
    possible merges; entity names contribute ~15k distinct digit-heavy
    tokens, exactly the numeric-identifier mass a real tokenizer must
    compress, lifting merge capacity past 100k)."""
    from janet_spark.extract.bpe import TOKEN_SPLIT
    from janet_spark.queries_relational import t

    docs = t(spark, sf_dir, "documents").select(
        F.explode(
            F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), TOKEN_SPLIT)
        ).alias("word")
    )
    names = t(spark, sf_dir, "customer").select(
        F.explode(
            F.split(F.lower(F.coalesce(F.col("c_name"), F.lit(""))), TOKEN_SPLIT)
        ).alias("word")
    )
    return _vocab_of_words(docs.unionByName(names))


def train_bpe_distributed(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = 48,
    vocab: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Greedy BPE merges over the corpus vocabulary, Spark-side. Returns
    the ordered merges list (the tokenizer artifact). Driver state per
    round = one (pair, count) row. Pass `vocab` (word, freq, seg) to
    train over a different corpus than the documents table."""
    if vocab is None:
        vocab = corpus_vocab(spark, sf_dir)
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        # token array materialized as a column BEFORE the lambda touches
        # it (the inline-split-in-transform quadratic; SURVEY §10.12)
        tokv = vocab.select(
            "freq", F.split(F.trim(F.col("seg")), " ").alias("__toks")
        ).filter(F.size("__toks") >= 2)
        pairs = tokv.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__toks) - 1), "
                    "i -> concat(element_at(__toks, i), chr(0), "
                    "element_at(__toks, i + 1)))"
                )
            ).alias("pair"),
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["pair"].split("\x00")
        merges.append((a, b))
        vocab = vocab.withColumn(
            "seg", F.expr(f"replace(seg, ' {a} {b} ', ' {a}{b} ')")
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges
