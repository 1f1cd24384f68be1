"""Text-extraction, dedup, similarity and text-analysis queries over the
driver's `documents` / `embeddings` tables and the SQL-derived transcripts.

These are (a) the flagship extraction pipeline registered for the
correctness gate, and (b) the training-data-pipeline operators (exact dedup,
MinHash-LSH near-dup, n-gram Jaccard, SimHash, embedding near-dup, ANN
top-k, token counting, quality scoring, fingerprinting). Spark side =
DataFrame API + Arrow-vectorized UDFs; oracle side = independent DuckDB SQL
(same rounding, same aliases). Where the operator is not SQL-expressible
(SimHash bits, language-ID heuristic, char-span arrays) the oracle is
omitted and pytest carries the semantics.
"""

from __future__ import annotations

import logging
import re
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from janet_spark.derive import DUCKDB_TRANSCRIPTS_SQL, derived_transcripts
from janet_spark.extract.rename import suggest_name
from janet_spark.extract.spans import find_matches, normalize_keyword
from janet_spark.extract.text_rules import (
    canonicalize_series,
    duckdb_canonicalize_sql,
)
from janet_spark.pipeline import extract_only
from janet_spark.queries_relational import t
from janet_spark.reassemble import reassemble_conversations

_TRANSCRIPTS_CTE = f"WITH transcripts AS ({DUCKDB_TRANSCRIPTS_SQL})"


# ---------------------------------------------------------------------------
# flagship: extraction pipeline over derived transcripts
# ---------------------------------------------------------------------------


def q_extract_turns(spark, sf_dir):
    tr = derived_transcripts(spark, sf_dir)
    out = extract_only(tr)
    return out.select("conv_id", "turn_idx", "extracted_text").orderBy(
        "conv_id", "turn_idx"
    )


ORACLE_EXTRACT_TURNS = f"""
{_TRANSCRIPTS_CTE}
SELECT conv_id, turn_idx, {duckdb_canonicalize_sql('text')} AS extracted_text
FROM transcripts ORDER BY conv_id, turn_idx
"""


def q_reassemble_convs(spark, sf_dir):
    tr = derived_transcripts(spark, sf_dir)
    out = extract_only(tr)
    return (
        reassemble_conversations(out)
        .select("conv_id", "conv_text", "n_turns")
        .orderBy("conv_id")
    )


ORACLE_REASSEMBLE_CONVS = f"""
{_TRANSCRIPTS_CTE}
SELECT conv_id,
       string_agg({duckdb_canonicalize_sql('text')}, chr(10) ORDER BY turn_idx) AS conv_text,
       count(*) AS n_turns
FROM transcripts GROUP BY conv_id ORDER BY conv_id
"""


# ---------------------------------------------------------------------------
# canonicalizer on synthetically dirtied text (rules do real work)
# ---------------------------------------------------------------------------

# the same "dirt" is applied in both dialects: padding, an OCR line-break
# hyphen inside every 'data', a ligature word, and tab runs
_SPARK_DIRTY = (
    "concat('  ', replace(replace(text, 'data', concat('da-', chr(10), 'ta')), "
    "'fast', 'ﬁnancial ﬂow'), chr(9), chr(9), ' ')"
)
_DUCK_DIRTY = (
    "'  ' || replace(replace(text, 'data', 'da-' || chr(10) || 'ta'), "
    "'fast', 'ﬁnancial ﬂow') || chr(9) || chr(9) || ' '"
)


def q_clean_canonicalize(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").withColumn("dirty", F.expr(_SPARK_DIRTY))

    @F.pandas_udf("string")
    def canon(s: pd.Series) -> pd.Series:
        return canonicalize_series(s)

    return docs.select("doc_id", canon("dirty").alias("clean_text")).orderBy("doc_id")


ORACLE_CLEAN_CANONICALIZE = f"""
SELECT doc_id, {duckdb_canonicalize_sql(f'({_DUCK_DIRTY})')} AS clean_text
FROM documents ORDER BY doc_id
"""


def q_clean_canonicalize_jvm(spark, sf_dir):
    """The SAME canonicalizer rendered as pure Spark SQL (whole-stage
    codegen, no Python) from the shared rule table — the JVM dialect of T8
    under the driver gate, against the same DuckDB oracle."""
    from janet_spark.extract.text_rules import spark_canonicalize_sql

    docs = t(spark, sf_dir, "documents").withColumn("dirty", F.expr(_SPARK_DIRTY))
    return docs.select(
        "doc_id", F.expr(spark_canonicalize_sql("dirty")).alias("clean_text")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# HTML boilerplate strip round-trip
# ---------------------------------------------------------------------------

_WRAP_SPARK = (
    "concat('<html><head><title>t</title></head><body>',"
    "'<nav><a href=\"#\">Home</a> <a href=\"#\">About</a></nav>',"
    "'<div><p>', text, '</p></div>',"
    "'<footer><a href=\"#\">Contact</a> (c) corp</footer></body></html>')"
)


def q_html_strip(spark, sf_dir):
    from janet_spark.extract.html_strip import strip_html

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_WRAP_SPARK).alias("html")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [strip_html(h) for h in pdf["html"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "extracted_text": [r[0] for r in res],
                    "blocks_kept": pd.Series([r[2] for r in res], dtype="int32"),
                    "blocks_dropped": pd.Series([r[3] for r in res], dtype="int32"),
                }
            )

    return docs.mapInPandas(
        run,
        schema="doc_id long, extracted_text string, blocks_kept int, blocks_dropped int",
    ).orderBy("doc_id")


# the wrapper's main <p> is the document text; title/nav/footer are dropped
ORACLE_HTML_STRIP = f"""
SELECT doc_id, {duckdb_canonicalize_sql('text')} AS extracted_text,
       1 AS blocks_kept, 3 AS blocks_dropped
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# text analysis: token counts, quality scoring
# ---------------------------------------------------------------------------


def q_token_counts(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.expr(r"regexp_extract_all(text, '[^ ]+', 0)")).alias("ws_tokens"),
        F.size(
            F.expr(r"regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)")
        ).alias("bpe_ish_tokens"),
    ).orderBy("doc_id")


ORACLE_TOKEN_COUNTS = """
SELECT doc_id,
       len(regexp_extract_all(text, '[^ ]+')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS bpe_ish_tokens
FROM documents ORDER BY doc_id
"""


def q_token_counts_bpe(spark, sf_dir):
    """Real subword token counting: the frozen-merges BPE tokenizer
    (janet_spark/extract/bpe.py) over every word of every document,
    vectorized in an Arrow batch with an lru_cache over the word
    vocabulary (corpus words repeat massively, so the cache turns the
    merge chain into a dict lookup per word). The DuckDB oracle recomputes
    every count through the rendered 48-replace chain — only the merges
    TABLE is shared, never a precomputed count."""
    from janet_spark.extract.bpe import count_text

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts = [count_text(x or "") for x in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "bpe_tokens": [c[0] for c in counts],
                    "n_words": [c[1] for c in counts],
                }
            )

    return docs.mapInPandas(
        run, schema="doc_id long, bpe_tokens long, n_words long"
    ).orderBy("doc_id")


def q_token_counts_bpe_jvm(spark, sf_dir):
    """The SAME tokenizer rendered as one pure Spark-SQL expression
    (transform + the 48-replace chain per word + aggregate-sum — JVM
    whole-stage codegen, zero Python), against the same DuckDB oracle.
    The JVM/Arrow A/B twin of clean_canonicalize vs clean_canonicalize_jvm."""
    from janet_spark.extract.bpe import TOKEN_SPLIT, spark_word_token_count_sql

    docs = t(spark, sf_dir, "documents")
    words = f"filter(split(lower(coalesce(text, '')), '{TOKEN_SPLIT}'), x -> x != '')"
    chain = spark_word_token_count_sql("w")
    return docs.select(
        "doc_id",
        F.expr(
            f"aggregate(transform({words}, w -> {chain}), 0L, (acc, x) -> acc + x)"
        ).alias("bpe_tokens"),
        F.expr(f"cast(size({words}) AS long)").alias("n_words"),
    ).orderBy("doc_id")


def _token_counts_bpe_oracle() -> str:
    from janet_spark.extract.bpe import TOKEN_SPLIT, duckdb_word_token_count_sql

    return f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                '{TOKEN_SPLIT}'), x -> x != '')) AS word
  FROM documents
), tc AS (
  SELECT doc_id,
         cast(sum({duckdb_word_token_count_sql('word')}) AS bigint) AS bpe_tokens,
         cast(count(*) AS bigint) AS n_words
  FROM w GROUP BY doc_id
)
SELECT d.doc_id, coalesce(tc.bpe_tokens, 0) AS bpe_tokens,
       coalesce(tc.n_words, 0) AS n_words
FROM documents d LEFT JOIN tc USING (doc_id) ORDER BY doc_id
"""


ORACLE_TOKEN_COUNTS_BPE = _token_counts_bpe_oracle()


def q_token_counts_bpe_1k(spark, sf_dir):
    """Subword token counting under the PRODUCTION-SIZE tokenizer: the
    frozen 1,000-merge table (extract/bpe_merges_1k.py — trained
    distributed over the sf0.1 union corpus, bit-for-bit verified against
    an independent driver trainer; round-3 verdict #5) applied to the
    customer entity names, whose digit-heavy vocabulary is what the deep
    merge table actually compresses (the 31-word document prose saturates
    at ~107 merges). Same Arrow + per-word lru_cache mechanism as
    token_counts_bpe; the DuckDB oracle recomputes every count through
    the 1,000-replace chain rendered as STAGED CTEs (a single nested
    expression at that depth exceeds DuckDB's max_expression_depth —
    extract/bpe.duckdb_staged_token_count_ctes)."""
    from janet_spark.extract.bpe import bpe_tokens_1k, count_text

    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts = [
                count_text(x or "", tokens=bpe_tokens_1k) for x in pdf["c_name"]
            ]
            yield pd.DataFrame(
                {
                    "c_custkey": pdf["c_custkey"],
                    "bpe_tokens": [c[0] for c in counts],
                    "n_words": [c[1] for c in counts],
                }
            )

    return cust.mapInPandas(
        run, schema="c_custkey long, bpe_tokens long, n_words long"
    ).orderBy("c_custkey")


def _token_counts_bpe_1k_oracle() -> str:
    from janet_spark.extract.bpe import TOKEN_SPLIT, duckdb_staged_token_count_ctes
    from janet_spark.extract.bpe_merges_1k import MERGES_1K

    ctes, final = duckdb_staged_token_count_ctes("w", "word", MERGES_1K)
    return f"""
WITH w AS (
  SELECT c_custkey,
         unnest(list_filter(regexp_split_to_array(lower(coalesce(c_name, '')),
                '{TOKEN_SPLIT}'), x -> x != '')) AS word
  FROM customer
),
{ctes},
tc AS (
  SELECT c_custkey,
         cast(sum(bpe_n) AS bigint) AS bpe_tokens,
         cast(count(*) AS bigint) AS n_words
  FROM {final} GROUP BY c_custkey
)
SELECT c.c_custkey, coalesce(tc.bpe_tokens, 0) AS bpe_tokens,
       coalesce(tc.n_words, 0) AS n_words
FROM customer c LEFT JOIN tc USING (c_custkey) ORDER BY c_custkey
"""


def q_quality_scores(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin("the", "a")))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(n_stop / n_words, 4).alias("stopword_ratio"),
        F.round(
            F.length(F.regexp_replace("text", "[^a-z]", "")) / F.length("text"), 4
        ).alias("alpha_ratio"),
    ).orderBy("doc_id")


ORACLE_QUALITY_SCORES = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       round(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a')))
             / len(string_split(text, ' '))::double, 4) AS stopword_ratio,
       round(len(regexp_replace(text, '[^a-z]', '', 'g'))::double / len(text), 4)
         AS alpha_ratio
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


def q_exact_dedup(spark, sf_dir):
    """Exact dedup by hash key (U3; hash-groupBy — the map-side-combinable
    scale path). Key = md5 of the 24-char prefix fingerprint."""
    docs = t(spark, sf_dir, "documents")
    key = F.md5(F.substring("text", 1, 24))
    return (
        docs.select(key.alias("dup_key"), "doc_id")
        .groupBy("dup_key")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_dups") > 1)
        .orderBy("dup_key")
    )


ORACLE_EXACT_DEDUP = """
SELECT md5(substr(text, 1, 24)) AS dup_key, count(*) AS n_dups,
       min(doc_id) AS keeper_doc_id
FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY dup_key
"""


def _word_docs(docs: DataFrame, coalesce_null: bool = True) -> DataFrame:
    """(doc_id, __words) with the split MATERIALIZED as a column. Every
    n-gram/shingle/chunk builder must reference this column, never an
    inline split expression: an expression captured inside a transform()
    lambda is re-evaluated on every array element (O(words^2) per doc —
    measured >25x slower at 200k docs, unbounded on a 10^5-word doc).
    coalesce_null=False preserves SQL NULL propagation (NULL text ->
    NULL words -> NULL result / dropped explode row)."""
    text = F.col("text")
    if coalesce_null:
        text = F.coalesce(text, F.lit(""))
    return docs.select("doc_id", F.split(text, " ").alias("__words"))


def _gram_array(words, n: int):
    """Array of the word n-grams of `words`, in order, JVM-side. Empty when
    the doc has fewer than n words (sequence is built over at least one
    index, then sliced back down — Spark's sequence(1, 0) would count
    DOWNWARD, so the guard cannot be the sequence bound itself)."""
    cnt = F.greatest(F.size(words) - (n - 1), F.lit(0))
    built = F.transform(
        F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    return F.slice(built, 1, cnt)


def q_quality_repetition(spark, sf_dir):
    """Gopher-style repetition quality metrics (Rae et al. 2021, app. A1.1):
    per-doc duplicate-word fraction, most-common-2-gram occurrence fraction
    and duplicate-5-gram fraction — the standard repetition gates a
    training-data curation pipeline applies before dedup.

    Scale shape: ONE tagged explode -> (doc_id, n, gram) groupBy (map-side
    combinable counts) -> per-(doc, n) aggregate -> conditional-aggregation
    pivot back to columns. A single shuffle keyed on (doc_id, n, gram) no
    matter how many n-gram orders are measured; no per-doc collect, no
    Python. Adding an order is one more unionByName branch, not a new
    shuffle. The one-explode-of-tagged-structs alternative (single scan)
    was A/B-measured SLOWER warm at sf0.1/local[32] (4.5 s vs 3.1 s,
    value-identical): per-gram struct allocation costs more than three
    column-pruned scans running as independent parallel stages."""
    docs = t(spark, sf_dir, "documents")
    wdocs = _word_docs(docs)
    words = F.col("__words")

    def tagged(n: int) -> DataFrame:
        arr = words if n == 1 else _gram_array(words, n)
        return wdocs.select(
            "doc_id", F.lit(n).alias("n"), F.explode(arr).alias("gram")
        )

    grams = tagged(1).unionByName(tagged(2)).unionByName(tagged(5))
    per_n = (
        grams.groupBy("doc_id", "n", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n")
        .agg(
            F.sum("c").alias("total"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top"),
        )
    )
    ratio = F.col("n_distinct") / F.col("total")
    metrics = per_n.groupBy("doc_id").agg(
        F.round(1 - F.max(F.when(F.col("n") == 1, ratio)), 4).alias("dup_word_frac"),
        F.round(
            F.coalesce(
                F.max(F.when(F.col("n") == 2, F.col("top") / F.col("total"))),
                F.lit(0.0),
            ),
            4,
        ).alias("top_bigram_frac"),
        F.round(
            F.coalesce(1 - F.max(F.when(F.col("n") == 5, ratio)), F.lit(0.0)), 4
        ).alias("dup_5gram_frac"),
    )
    # every doc yields at least one n=1 gram (split('') is ['']), so
    # `metrics` already covers every doc_id — no doc-table re-join needed
    return metrics.select(
        "doc_id", "dup_word_frac", "top_bigram_frac", "dup_5gram_frac"
    ).orderBy("doc_id")


ORACLE_QUALITY_REPETITION = """
WITH d AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS arr FROM documents
), g AS (
  SELECT doc_id, n, unnest(grams) AS gram FROM (
    SELECT doc_id, 1 AS n, arr AS grams FROM d
    UNION ALL
    SELECT doc_id, 2 AS n,
           list_transform(generate_series(1, greatest(len(arr) - 1, 0)),
                          i -> array_to_string(arr[i:i+1], ' ')) FROM d
    UNION ALL
    SELECT doc_id, 5 AS n,
           list_transform(generate_series(1, greatest(len(arr) - 4, 0)),
                          i -> array_to_string(arr[i:i+4], ' ')) FROM d
  )
), c AS (
  SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY 1, 2, 3
), p AS (
  SELECT doc_id, n, sum(c) AS total, count(*) AS n_distinct, max(c) AS top
  FROM c GROUP BY 1, 2
), m AS (
  SELECT doc_id,
         round(1 - max(CASE WHEN n = 1 THEN n_distinct / total::double END), 4)
           AS dup_word_frac,
         round(coalesce(max(CASE WHEN n = 2 THEN top / total::double END), 0), 4)
           AS top_bigram_frac,
         round(coalesce(1 - max(CASE WHEN n = 5 THEN n_distinct / total::double END), 0), 4)
           AS dup_5gram_frac
  FROM p GROUP BY doc_id
)
SELECT d2.doc_id, m.dup_word_frac, m.top_bigram_frac, m.dup_5gram_frac
FROM documents d2 LEFT JOIN m USING (doc_id) ORDER BY doc_id
"""


_CHUNK_WORDS = 8


def q_chunk_dedup(spark, sf_dir):
    """Corpus-level boilerplate removal (CCNet-style, Wenzek et al. 2020):
    split every document into consecutive non-overlapping 8-word chunks,
    drop any chunk that appears in MORE THAN ONE distinct document
    (cross-doc repetition = boilerplate; within-doc repeats are kept —
    that is `quality_repetition`'s business), and reconstruct each
    document's remaining text in original chunk order.

    Scale shape: posexplode -> chunk-frequency groupBy (map-side
    combinable, countDistinct doc_id) -> the frequent set is SMALL by the
    Zipf head (it is the boilerplate), so it broadcasts and the anti-join
    evaluates map-side against the chunk stream — no chunk-keyed shuffle of
    the full corpus on the drop path. Reassembly is one groupBy(doc_id)
    with array_sort on (pos, chunk) structs, the same ordered-concat shape
    as conversation reassembly. At 100 TB the only all-data shuffles are
    the frequency count (combined map-side) and the per-doc rebuild."""
    docs = t(spark, sf_dir, "documents")
    return _chunk_rebuild(docs).orderBy("doc_id")


def _chunk_rebuild(docs: DataFrame) -> DataFrame:
    """The chunk-dedup engine over any (doc_id, text) frame: explode the
    8-word chunk grid, census cross-doc chunks, and rebuild per doc.
    Flag-and-filter instead of anti-join-then-rejoin: a broadcast LEFT
    join marks boilerplate chunks map-side, and ONE groupBy(doc_id) both
    rebuilds the kept text and counts kept/dropped — every doc has >= 1
    chunk row, so no doc-table re-join is needed to stay total. Returns
    doc_id, clean_text, n_chunks_kept, n_chunks_dropped (unordered)."""
    wdocs = _word_docs(docs)
    words = F.col("__words")
    n_chunks = F.ceil(F.size(words) / F.lit(_CHUNK_WORDS)).cast("long")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),  # size(words) >= 1 so n_chunks >= 1
        lambda i: F.array_join(
            F.slice(words, i * _CHUNK_WORDS + 1, _CHUNK_WORDS), " "
        ),
    )
    chunks = wdocs.select("doc_id", F.posexplode(chunk_arr).alias("cpos", "chunk"))
    shared = (
        chunks.groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("chunk")
    )
    flagged = chunks.join(
        F.broadcast(shared.withColumn("is_shared", F.lit(True))), "chunk", "left"
    )
    kept_row = F.col("is_shared").isNull()
    one, zero = F.lit(1).cast("long"), F.lit(0).cast("long")
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("cpos"),
                                F.col("chunk"),
                                F.coalesce("is_shared", F.lit(False)).alias("drop"),
                            )
                        )
                    ),
                    lambda s: ~s["drop"],
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.sum(F.when(kept_row, one).otherwise(zero)).alias("n_chunks_kept"),
        F.sum(F.when(kept_row, zero).otherwise(one)).alias("n_chunks_dropped"),
    )


ORACLE_CHUNK_DEDUP = """
WITH w AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS word,
         generate_subscripts(string_split(coalesce(text, ''), ' '), 1) - 1 AS pos
  FROM documents
), c AS (
  SELECT doc_id, pos // 8 AS cpos, string_agg(word, ' ' ORDER BY pos) AS chunk
  FROM w GROUP BY doc_id, pos // 8
), shared AS (
  SELECT chunk FROM c GROUP BY chunk HAVING count(DISTINCT doc_id) > 1
), kept AS (
  SELECT c.* FROM c ANTI JOIN shared USING (chunk)
), r AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY cpos) AS clean_text,
         count(*) AS n_chunks_kept
  FROM kept GROUP BY doc_id
), tot AS (
  SELECT doc_id, count(*) AS n_chunks FROM c GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       coalesce(r.n_chunks_kept, 0) AS n_chunks_kept,
       tot.n_chunks - coalesce(r.n_chunks_kept, 0) AS n_chunks_dropped
FROM documents d JOIN tot USING (doc_id) LEFT JOIN r USING (doc_id)
ORDER BY doc_id
"""


# UTF-8-read-as-cp1252 repair pairs (the deterministic, fixed-table core
# of what ftfy does), applied in table order. Both engines render from
# THIS list — the Python cleaner and the DuckDB replace chain can't drift.
_MOJIBAKE: list[tuple[str, str]] = [
    ("â€™", "’"),  # 'â€™' -> right single quote
    ("â€œ", "“"),  # 'â€œ' -> left double quote
    ("â€˜", "‘"),  # 'â€˜' -> left single quote
    ("â€“", "–"),  # 'â€“' -> en dash
    ("â€”", "—"),  # 'â€”' -> em dash
    ("â€¦", "…"),  # 'â€¦' -> ellipsis
    ("Ã©", "é"),  # 'Ã©' -> e acute
    ("Ã¨", "è"),
    ("Ã¡", "á"),
    ("Ã³", "ó"),
    ("Ãº", "ú"),
    ("Ã±", "ñ"),
    ("Ã¤", "ä"),
    ("Ã¶", "ö"),
    ("Ã¼", "ü"),
    ("ÃŸ", "ß"),  # 'ÃŸ' -> sharp s
    ("Â«", "«"),
    ("Â»", "»"),
    ("Â°", "°"),
    ("Â©", "©"),
    ("Â®", "®"),
    ("Â ", " "),  # stray 'Â' before a real NBSP
]
# C0 controls except \t \n (plus DEL) — stripped before NFC. The class is
# written in the re / RE2 common subset so one string serves both engines.
_CTRL_CLASS = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def _unicode_clean_str(s: str) -> str:
    import unicodedata

    for find, rep in _MOJIBAKE:
        if find in s:
            s = s.replace(find, rep)
    s = re.sub(_CTRL_CLASS, "", s)
    return unicodedata.normalize("NFC", s)


def q_unicode_clean(spark, sf_dir):
    """Unicode hygiene pass (the ftfy-style fixup every web-scale corpus
    gets before tokenization): repair the classic UTF-8-decoded-as-cp1252
    mojibake sequences from a fixed table, strip C0 control characters
    (keeping tab/newline), then normalize to NFC so equal-looking strings
    hash equal in every downstream dedup.

    Spark has no built-in NFC normalization, so this is a legitimate
    Arrow-UDF stage (same routing rule as the canonicalizer); a printable-
    ASCII trigger scan skips untouched rows entirely — ASCII is
    NFC-invariant and cannot contain mojibake, so the common case is one
    vectorized contains() and zero string rebuilds. The DuckDB oracle
    renders the SAME table as a nested replace chain + regexp_replace +
    nfc_normalize; only the table is shared, never a result."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        trigger = re.compile(r"[^\t\n\x20-\x7e]")
        for pdf in batches:
            src = pdf["text"].fillna("")
            out = src.copy()
            mask = src.str.contains(trigger, regex=True)
            if mask.any():
                out[mask] = [_unicode_clean_str(s) for s in src[mask]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "clean_text": out,
                    "was_changed": out != src,
                }
            )

    return docs.mapInPandas(
        run, schema="doc_id long, clean_text string, was_changed boolean"
    ).orderBy("doc_id")


def _unicode_clean_sql(col: str) -> str:
    expr = f"coalesce({col}, '')"
    for find, rep in _MOJIBAKE:
        expr = f"replace({expr}, '{find}', '{rep}')"
    expr = f"regexp_replace({expr}, '{_CTRL_CLASS}', '', 'g')"
    return f"nfc_normalize({expr})"


ORACLE_UNICODE_CLEAN = f"""
SELECT doc_id,
       {_unicode_clean_sql('text')} AS clean_text,
       {_unicode_clean_sql('text')} != coalesce(text, '') AS was_changed
FROM documents ORDER BY doc_id
"""


_SUBSTR_GRAM = 10


def q_substring_dedup(spark, sf_dir):
    """Exact substring-level dedup (Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better", ExactSubstr) at word
    granularity: any maximal word span covered by a sliding 10-word gram
    that appears in MORE THAN ONE distinct document is removed from every
    document carrying it; remaining words are rejoined in order. This is
    the finer-grained sibling of `chunk_dedup` — a duplicated passage is
    caught at ANY alignment, not only when it lands on the fixed 8-word
    chunk grid.

    Scale shape: gram census is a map-side-combinable groupBy. Unlike
    `chunk_dedup`/`decontaminate`, the duplicated-gram set is NOT
    assumed small (near-dup corpora can have corpus-sized dup sets), so
    flagging is a shuffle semi-join keyed on gram, not a broadcast — a
    hot gram skews one census/join key, which AQE skew-join splitting
    absorbs. Coverage expansion is a bounded 10x fan-out of flagged
    positions; removal is an anti-join co-keyed on (doc_id, widx); the
    rebuild is the standard single groupBy(doc_id) ordered concat. No
    driver-side state, no Python.

    The distinct() on the covered set is load-bearing, not cosmetic: it
    collapses the fan-out BEFORE the anti-join and gives AQE an accurate
    runtime size at the join boundary. A/B-measured on the 200k-doc
    fully-duplicated stress corpus: without it AQE mis-estimates the
    ~100M-row covered side, plans a broadcast anti-join, and OOMs the
    driver; with it the same input runs in 23 s as a sort-merge join."""
    docs = t(spark, sf_dir, "documents")
    wdocs = _word_docs(docs)
    words = F.col("__words")
    grams = wdocs.select(
        "doc_id", F.posexplode(_gram_array(words, _SUBSTR_GRAM)).alias("pos", "gram")
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gram")
    )
    flagged = grams.join(dup, "gram", "left_semi")
    covered = flagged.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(_SUBSTR_GRAM - 1))
        ).alias("widx"),
    ).distinct()
    wordrows = wdocs.select("doc_id", F.posexplode(words).alias("widx", "word"))
    kept = wordrows.join(covered, ["doc_id", "widx"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("widx", "word"))),
                lambda s: s["word"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = wdocs.select("doc_id", F.size(words).alias("n_words"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.col("n_words") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_words_removed"),
        )
        .orderBy("doc_id")
    )


ORACLE_SUBSTRING_DEDUP = f"""
WITH d AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS arr FROM documents
), g AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(len(arr) - {_SUBSTR_GRAM - 1}, 0))) AS i,
         arr
  FROM d
), g2 AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(arr[i:i + {_SUBSTR_GRAM - 1}], ' ') AS gram
  FROM g
), dup AS (
  SELECT gram FROM g2 GROUP BY gram HAVING count(DISTINCT doc_id) > 1
), cov AS (
  SELECT DISTINCT doc_id, pos + off.o AS widx
  FROM g2 SEMI JOIN dup USING (gram),
       (SELECT unnest(generate_series(0, {_SUBSTR_GRAM - 1})) AS o) off
), w AS (
  SELECT doc_id, unnest(arr) AS word,
         generate_subscripts(arr, 1) - 1 AS widx
  FROM d
), kept AS (
  SELECT w.* FROM w ANTI JOIN cov USING (doc_id, widx)
), r AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY widx) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       len(d.arr) - coalesce(r.n_kept, 0) AS n_words_removed
FROM d LEFT JOIN r USING (doc_id)
ORDER BY doc_id
"""


_LINE_WORDS = 16  # deterministic line grain (this corpus is single-line)
_LINE_DUP_DOCS = 2  # a line seen in >= K distinct docs is corpus boilerplate


def _line_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, line): fixed-width word segments standing in for the
    newline grain. The driver corpus contains no newlines, so the
    deterministic segmenter is the same {_LINE_WORDS}-word chunking the
    transcript derivation uses; a production corpus swaps this one
    projection for split(text, '\\n') + posexplode and nothing downstream
    changes. Narrow (explode of a closed-form sequence), no shuffle."""
    wdocs = _word_docs(docs)
    size = F.size(F.col("__words"))
    n_lines = F.greatest(
        F.ceil(size / F.lit(float(_LINE_WORDS))).cast("int"), F.lit(1)
    )
    return wdocs.select(
        "doc_id",
        "__words",
        F.explode(F.sequence(F.lit(0), n_lines - 1)).alias("pos"),
    ).select(
        "doc_id",
        "pos",
        F.expr(
            f"array_join(slice(__words, pos * {_LINE_WORDS} + 1, {_LINE_WORDS}), ' ')"
        ).alias("line"),
    )


def q_line_dedup_corpus(spark, sf_dir):
    """CCNet-style corpus-frequency line deduplication (Wenzek et al.
    2020 §4.1; also RefinedWeb's line-wise corrections): a line whose
    hash appears in >= _LINE_DUP_DOCS distinct documents is boilerplate
    (navigation bars, cookie banners, canned headers) and is REMOVED from
    every document; the surviving lines are reassembled in original order.
    Unlike `turn_boilerplate` (census only) this is the rewriting
    operator — the output is the cleaned corpus plus per-doc drop counts.
    Reference analog: janet's OCR-text cleanup rewrites page text in
    place (apps/ocr/src/lib/ocr-utils.ts) — same strip-and-reassemble
    contract, here at corpus scale.

    Scale shape: the census is ONE two-phase aggregate on md5(line)
    (map-side partial countDistinct via the standard expand), and the
    rewrite is a line_sig-keyed left join where the census side holds one
    32-char row per DISTINCT boilerplate line — orders of magnitude below
    the corpus, broadcastable when it fits and AQE-skew-handled when the
    hot boilerplate keys dominate otherwise. Reassembly is the
    ordered-concat pattern: per-doc collect_list of (pos, line) structs,
    array_sort, join — doc-keyed, skew-bounded by document length. No
    Python, no window over the full corpus, raw line text never shuffles
    except doc-keyed for reassembly."""
    return line_dedup_corpus_frame(t(spark, sf_dir, "documents"))


def line_dedup_corpus_frame(
    docs: DataFrame, census: DataFrame | None = None
) -> DataFrame:
    """Frame form of `q_line_dedup_corpus` over any (doc_id, text) frame.
    `census`: optional pre-computed (line_sig, n_docs) frame (the
    maintained table, in the incremental form); None re-censuses the
    input — both produce the identical rewrite by construction."""
    lines = _line_docs(docs).withColumn("line_sig", F.md5("line"))
    if census is None:
        census = lines.groupBy("line_sig").agg(
            F.countDistinct("doc_id").alias("n_docs")
        )
    boiler = census.filter(F.col("n_docs") >= _LINE_DUP_DOCS).select(
        "line_sig", F.lit(True).alias("is_dup")
    )
    flagged = lines.join(boiler, "line_sig", "left").withColumn(
        "is_dup", F.coalesce(F.col("is_dup"), F.lit(False))
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count(F.when(F.col("is_dup"), F.lit(1))).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~F.col("is_dup"), F.struct("pos", "line"))
                        )
                    ),
                    lambda s: s["line"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


def _maintained_line_census(spark, sf_dir):
    """The standing (line_sig, n_docs) boilerplate census for `sf_dir`'s
    documents, bootstrapping gen=bootstrap on first touch — the line-grain
    counterpart of `_maintained_exact_census`. Production appends one
    generation per daily delta via `incremental_line_census_run`; the
    reader sums generations, so read cost scales with the distinct-line
    population, never the corpus."""
    from janet_spark.dedup_incremental import (
        incremental_line_census_run,
        read_line_census,
        state_dir_for_input,
    )

    census_path = state_dir_for_input(sf_dir, "documents.parquet", "line_census")
    census = read_line_census(spark, census_path)
    if census is None:
        delta_lines = _line_docs(t(spark, sf_dir, "documents")).select(
            "doc_id", F.md5("line").alias("line_sig")
        )
        incremental_line_census_run(delta_lines, census_path, "bootstrap")
        census = read_line_census(spark, census_path)
    return census


def q_line_dedup_corpus_incremental(spark, sf_dir):
    """Maintained form of `q_line_dedup_corpus`: the boilerplate census
    comes from the committed line-census generations instead of a fresh
    corpus-wide countDistinct per run — the daily rewrite's census read
    scales with the distinct-line population (one (md5, long) row per
    line ever seen), and a daily delta appends one generation censusing
    only its own documents. Output is identical to the standalone form
    (same oracle) because distinct-doc counts are additive across the
    doc-id-partitioned deltas; pinned maintained == scanned on a
    two-generation corpus in tests/test_round5_ops.py."""
    docs = t(spark, sf_dir, "documents")
    return line_dedup_corpus_frame(docs, census=_maintained_line_census(spark, sf_dir))


ORACLE_LINE_DEDUP_CORPUS = f"""
WITH d AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws FROM documents
), n AS (
  SELECT doc_id, ws,
         greatest(cast(ceil(len(ws) / {_LINE_WORDS}.0) AS int), 1) AS nc
  FROM d
), e AS (
  SELECT doc_id, ws, cast(unnest(range(0, nc)) AS int) AS pos FROM n
), l AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(ws, pos * {_LINE_WORDS} + 1,
                                    pos * {_LINE_WORDS} + {_LINE_WORDS}), ' ')
           AS line
  FROM e
), c AS (
  SELECT md5(line) AS line_sig FROM l
  GROUP BY md5(line) HAVING count(DISTINCT doc_id) >= {_LINE_DUP_DOCS}
), f AS (
  SELECT l.doc_id, l.pos, l.line, c.line_sig IS NOT NULL AS is_dup
  FROM l LEFT JOIN c ON md5(l.line) = c.line_sig
)
SELECT doc_id,
       count(*) AS n_lines,
       count(*) FILTER (WHERE is_dup) AS n_dropped,
       coalesce(string_agg(line, ' ' ORDER BY pos) FILTER (WHERE NOT is_dup),
                '') AS clean_text
FROM f GROUP BY doc_id ORDER BY doc_id
"""


_DECONTAM_GRAM = 8
_EVAL_MOD = 11  # doc_id % 11 == 0 -> held-out eval set (deterministic)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3 app. C / PaLM-style): flag every
    TRAINING document sharing any sliding 8-word-gram with the held-out
    EVAL set (here the deterministic doc_id % 11 slice standing in for a
    benchmark suite). Output is the removal list — contaminated doc_id +
    how many distinct eval grams it hits — which downstream curation
    anti-joins away; emitting only hits avoids any doc-sized re-join.

    Scale shape: the eval side is tiny by definition (benchmarks are
    thousands of docs, the corpus is billions), so its distinct gram set
    BROADCASTS and the contamination check is a map-side hash probe over
    the exploded training grams; the only shuffle is the per-doc hit
    count (map-side combinable)."""
    docs = t(spark, sf_dir, "documents")
    wdocs = _word_docs(docs)
    grams = F.array_distinct(_gram_array(F.col("__words"), _DECONTAM_GRAM))
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    eval_grams = (
        wdocs.filter(is_eval)
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    train_grams = wdocs.filter(~is_eval).select(
        "doc_id", F.explode(grams).alias("gram")
    )
    return (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
        .orderBy("doc_id")
    )


ORACLE_DECONTAMINATE = """
WITH d AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS arr FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_distinct(
           list_transform(generate_series(1, greatest(len(arr) - 7, 0)),
                          i -> array_to_string(arr[i:i+7], ' ')))) AS gram
  FROM d
), ev AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % 11 = 0
)
SELECT g.doc_id, count(*) AS n_hit_grams
FROM g JOIN ev USING (gram)
WHERE g.doc_id % 11 != 0
GROUP BY g.doc_id ORDER BY doc_id
"""


def q_lm_score(spark, sf_dir):
    """Unigram-LM typicality scoring — the oracle-checkable proxy for
    CCNet's KenLM perplexity filter (Wenzek et al. 2020): per-doc mean
    word cross-entropy -avg(log2 p(w)) under the corpus's own unigram
    distribution. Low = head-vocabulary boilerplate, high = rare-token
    noise; curation keeps the middle band.

    Scale shape: pass 1 builds the unigram table with a map-side-combinable
    word count; pass 2 re-explodes and joins each word occurrence to its
    probability via BROADCAST (word vocabularies grow ~ sqrt corpus —
    Heaps' law — and a production KenLM is likewise a broadcast artifact),
    then one per-doc aggregate. No doc-sized joins, no Python."""
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    occ = docs.select("doc_id", F.explode(words).alias("word"))
    scored = occ.join(F.broadcast(_vocab_probs(occ)), "word").select(
        "doc_id", (-F.log2(F.col("c") / F.col("tot"))).alias("bits")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.sum("bits") / F.count(F.lit(1)), 4).alias("xent_bits"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .orderBy("doc_id")
    )


def _vocab_probs(occ: DataFrame) -> DataFrame:
    """(word, c, tot) from a (doc_id, word) occurrence frame, fully LAZY:
    the corpus total is the 1-row sum over the vocab aggregate cross-joined
    back by broadcast — no driver-side count() action, so the occurrence
    DAG is never executed an extra time just to learn a scalar."""
    vocab = occ.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").cast("double").alias("tot"))
    return vocab.crossJoin(F.broadcast(total))


ORACLE_LM_SCORE = """
WITH occ AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS word
  FROM documents
), vocab AS (
  SELECT word, count(*) AS c FROM occ GROUP BY word
), tot AS (
  SELECT count(*)::double AS n FROM occ
)
SELECT occ.doc_id,
       round(sum(-log2(vocab.c / tot.n)) / count(*), 4) AS xent_bits,
       count(*) AS n_words
FROM occ JOIN vocab USING (word), tot
GROUP BY occ.doc_id ORDER BY doc_id
"""


_PACK_BUDGET = 512  # tokens per packed training sequence
_PACK_BLOCK = 100  # doc_ids per prefix-sum block (see scale note below)


def _pack_sequences(d: DataFrame) -> DataFrame:
    """Two-level distributed prefix sum over (doc_id, n_tokens long):
    (1) cumsum within contiguous doc_id blocks — shuffle keyed by block,
    every partition bounded at _PACK_BLOCK rows; (2) per-block totals
    (one tiny row per block) get their own exclusive cumsum on the small
    side and BROADCAST back as block offsets. Returns doc_id, n_tokens,
    seq_id, seq_offset. Identical to the sequential scan by associativity
    — pinned by the block-size-invariance pytest."""
    d = d.withColumn("block", (F.col("doc_id") / _PACK_BLOCK).cast("long"))
    wb = (
        Window.partitionBy("block")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    zero = F.lit(0).cast("long")
    within = d.withColumn("cum_in_block", F.coalesce(F.sum("n_tokens").over(wb), zero))
    # small side: one row per block; the partition-less window is the
    # POINT (it is bounded at n_docs / _PACK_BLOCK rows, never corpus-sized)
    wo = Window.orderBy("block").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("block")
        .agg(F.sum("n_tokens").alias("block_total"))
        .withColumn("block_offset", F.coalesce(F.sum("block_total").over(wo), zero))
        .select("block", "block_offset")
    )
    cum_before = F.col("block_offset") + F.col("cum_in_block")
    return (
        within.join(F.broadcast(offsets), "block")
        .withColumn("seq_id", F.floor(cum_before / _PACK_BUDGET))
        .withColumn("seq_offset", cum_before % _PACK_BUDGET)
        .drop("block", "cum_in_block", "block_offset")
    )


def q_sequence_pack(spark, sf_dir):
    """Deterministic contiguous sequence packing: assign documents, in
    doc_id order, to fixed-token-budget training sequences — each doc
    lands in the sequence where its exclusive running token total falls
    (docs stay whole; a doc straddling the boundary belongs to the
    sequence it starts in). The currency of a pretraining pipeline:
    packing decides batch shapes and padding waste.

    Scale shape: a global running sum is NOT a global window (that is one
    reducer holding the corpus) — see _pack_sequences. At 10^12 docs pick
    block ~10^7 -> 10^5 offset rows; if blocks themselves outgrow one
    task, the same construction nests once more."""
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    d = docs.select("doc_id", F.size(words).cast("long").alias("n_tokens"))
    return _pack_sequences(d).select(
        "doc_id", "n_tokens", "seq_id", "seq_offset"
    ).orderBy("doc_id")


ORACLE_SEQUENCE_PACK = """
WITH d AS (
  SELECT doc_id,
         cast(len(string_split(coalesce(text, ''), ' ')) AS bigint) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         cast(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint)
           AS cum_before
  FROM d
)
SELECT doc_id, n_tokens,
       cum_before // 512 AS seq_id,
       cum_before % 512 AS seq_offset
FROM c ORDER BY doc_id
"""


def q_pack_examples(spark, sf_dir):
    """Materialized training examples — the terminal artifact of the
    curation pipeline: every document BPE-tokenizes (frozen merges table,
    order preserved) and the token stream packs into fixed-budget
    sequences under the SAME contiguous-packing rule as `sequence_pack`
    (docs stay whole, assigned to the sequence their running total starts
    in). Output is one row per training sequence: doc count, token count,
    and the ordered space-joined token string a loader would consume.

    Scale shape: tokenization is a narrow Arrow stage (word-level
    lru_cache — corpus words repeat massively); the running total is the
    shared two-level distributed prefix sum (`_pack_sequences`, never a
    corpus-sized window); assembly is ONE groupBy(seq_id) ordered concat,
    bounded per group by the token budget. The DuckDB oracle recomputes
    every token string through the rendered 48-replace chain and packs
    with a plain global window — associativity pinned by the existing
    block-invariance test."""
    from janet_spark.extract.bpe import TOKEN_SPLIT, bpe_tokens

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    split_re = re.compile(TOKEN_SPLIT)

    def toks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_s: list[str] = []
            out_n: list[int] = []
            for x in pdf["text"]:
                words = [w for w in split_re.split((x or "").lower()) if w]
                parts = [tok for w in words for tok in bpe_tokens(w)]
                out_s.append(" ".join(parts))
                out_n.append(len(parts))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "doc_toks": out_s, "n_tokens": out_n}
            )

    dt = docs.mapInPandas(
        toks, schema="doc_id long, doc_toks string, n_tokens long"
    )
    packed = _pack_sequences(dt)
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(F.struct("doc_id", "doc_toks"))),
                        lambda s: s["doc_toks"] != "",
                    ),
                    lambda s: s["doc_toks"],
                ),
                " ",
            ).alias("tokens"),
        )
        .orderBy("seq_id")
    )


def _pack_examples_oracle() -> str:
    from janet_spark.extract.bpe import duckdb_word_tokens_sql

    return f"""
WITH d0 AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')),
                                        '[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents
), w AS (
  SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS pos
  FROM d0
), wt AS (
  SELECT doc_id, pos, {duckdb_word_tokens_sql('word')} AS toks FROM w
), dt AS (
  SELECT doc_id, string_agg(toks, ' ' ORDER BY pos) AS doc_toks,
         cast(sum(len(string_split(toks, ' '))) AS bigint) AS n_tokens
  FROM wt GROUP BY doc_id
), alld AS (
  SELECT d0.doc_id, coalesce(dt.doc_toks, '') AS doc_toks,
         coalesce(dt.n_tokens, 0) AS n_tokens
  FROM d0 LEFT JOIN dt USING (doc_id)
), c AS (
  SELECT doc_id, doc_toks, n_tokens,
         cast(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint)
           AS cum_before
  FROM alld
)
SELECT cum_before // {_PACK_BUDGET} AS seq_id,
       count(*) AS n_docs,
       cast(sum(n_tokens) AS bigint) AS n_tokens,
       coalesce(string_agg(doc_toks, ' ' ORDER BY doc_id)
                  FILTER (doc_toks != ''), '') AS tokens
FROM c GROUP BY 1 ORDER BY seq_id
"""


def q_mixture_weights(spark, sf_dir):
    """Domain-mixing weights: per-source token share of the corpus and
    the resampling weight that would rebalance sources to a UNIFORM
    target mixture (weight = target_share / actual_share) — the knob a
    pretraining pipeline turns to hit its data recipe. One
    map-side-combinable groupBy; corpus totals ride the same lazy 1-row
    broadcast as the LM scorer (no driver action, no second scan)."""
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    per_source = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(words)).cast("long").alias("n_tokens"),
        )
    )
    totals = per_source.agg(
        F.sum("n_tokens").cast("double").alias("tot_tokens"),
        F.count(F.lit(1)).cast("double").alias("n_sources"),
    )
    share = F.col("n_tokens") / F.col("tot_tokens")
    return (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(share, 6).alias("token_share"),
            F.round((1 / F.col("n_sources")) / share, 6).alias("uniform_weight"),
        )
        .orderBy("source")
    )


ORACLE_MIXTURE_WEIGHTS = """
WITH s AS (
  SELECT source, count(*) AS n_docs,
         cast(sum(len(string_split(coalesce(text, ''), ' '))) AS bigint)
           AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(n_tokens)::double AS tot_tokens, count(*)::double AS n_sources
  FROM s
)
SELECT source, n_docs, n_tokens,
       round(n_tokens / tot_tokens, 6) AS token_share,
       round((1 / n_sources) / (n_tokens / tot_tokens), 6) AS uniform_weight
FROM s, tot ORDER BY source
"""


_MIX_MAX_COPIES = 3  # epoch cap: never repeat any document more than this
_MIX_SEED = "mix0"


def q_apply_mixture(spark, sf_dir):
    """Materialize the data recipe: turn `mixture_weights`' per-source
    uniform-rebalance weight into an actual resampled corpus membership
    list — `floor(w)` whole epochs per document plus one fractional epoch
    admitted by a deterministic md5-byte gate (same engine-portable gate
    as `hash_sample`, quantized to /256), with repeats capped at
    _MIX_MAX_COPIES (the standard "no more than N epochs of any document"
    rule). Downsampling (w < 1) falls out of the same formula: zero whole
    epochs, gate at floor(w*256)/256.

    Scale shape: the weight table is one row per source (broadcast); the
    fan-out is explode(sequence(..)) bounded by the cap — a narrow map
    over the corpus with NO shuffle of document rows. Output is the
    (doc_id, copy_idx) membership list, not copied text: downstream
    shuffling/sharding joins it back, so the resample never rewrites
    payload bytes it doesn't have to."""
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    per_source = docs.groupBy("source").agg(
        F.sum(F.size(words)).cast("long").alias("n_tokens")
    )
    totals = per_source.agg(
        F.sum("n_tokens").cast("double").alias("tot_tokens"),
        F.count(F.lit(1)).cast("double").alias("n_sources"),
    )
    weights = (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            F.round(
                (1 / F.col("n_sources"))
                / (F.col("n_tokens") / F.col("tot_tokens")),
                6,
            ).alias("w"),
        )
    )
    gate = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_MIX_SEED + ":"), F.col("doc_id").cast("string"))),
                1,
                2,
            ),
            16,
            10,
        )
        .cast("int")
    )
    n_full = F.least(F.floor(F.col("w")).cast("int"), F.lit(_MIX_MAX_COPIES))
    frac_gate = F.floor((F.col("w") - F.floor(F.col("w"))) * 256).cast("int")
    n_copies = F.least(
        n_full + F.when(gate < frac_gate, 1).otherwise(0),
        F.lit(_MIX_MAX_COPIES),
    )
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(weights), "source")
        .select("doc_id", "source", n_copies.alias("n_copies"))
        .filter(F.col("n_copies") >= 1)
        .select(
            "doc_id",
            "source",
            "n_copies",
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias("copy_idx"),
        )
        .orderBy("doc_id", "copy_idx")
    )


ORACLE_APPLY_MIXTURE = f"""
WITH s AS (
  SELECT source,
         cast(sum(len(string_split(coalesce(text, ''), ' '))) AS bigint)
           AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(n_tokens)::double AS tot_tokens, count(*)::double AS n_sources
  FROM s
), w AS (
  SELECT source,
         round((1 / n_sources) / (n_tokens / tot_tokens), 6) AS w
  FROM s, tot
), d AS (
  SELECT doc_id, d.source,
         least(
           least(cast(floor(w) AS int), {_MIX_MAX_COPIES})
           + CASE WHEN CAST('0x' || substr(
                    md5('{_MIX_SEED}:' || cast(doc_id AS varchar)), 1, 2) AS INT)
                  < cast(floor((w - floor(w)) * 256) AS int)
             THEN 1 ELSE 0 END,
           {_MIX_MAX_COPIES}) AS n_copies
  FROM documents d JOIN w ON d.source = w.source
)
SELECT doc_id, source, n_copies, cast(unnest(range(0, n_copies)) AS int) AS copy_idx
FROM d WHERE n_copies >= 1
ORDER BY doc_id, copy_idx
"""


_WINDOW_WORDS = 64  # context-window chunk size (words)
_WINDOW_STRIDE = 48  # stride between chunk starts (overlap = 16)


def q_doc_chunk(spark, sf_dir):
    """Sliding-window document chunking — the long-document step every
    context-bounded consumer needs (RAG indexing, fixed-window pretrain
    on long docs): word-grain chunks of _WINDOW_WORDS with _WINDOW_STRIDE
    spacing (16-word overlap), each row carrying its absolute word offset
    so provenance survives the split. Pure narrow projection: the words
    array is materialized ONCE per doc (the O(words^2) inline-split
    lesson), chunk count is closed-form, and the fan-out per doc is
    ceil(len/stride) — linear in document length, no shuffle at all."""
    docs = t(spark, sf_dir, "documents")
    wdocs = _word_docs(docs)
    size = F.size(F.col("__words"))
    n_chunks = F.when(size <= _WINDOW_WORDS, F.lit(1)).otherwise(
        F.ceil((size - _WINDOW_WORDS) / F.lit(float(_WINDOW_STRIDE))).cast("int") + 1
    )
    chunks = wdocs.select(
        "doc_id",
        "__words",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).withColumn(
        "__chunk",
        F.expr(f"slice(__words, chunk_idx * {_WINDOW_STRIDE} + 1, {_WINDOW_WORDS})"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        (F.col("chunk_idx") * _WINDOW_STRIDE).alias("word_start"),
        F.size("__chunk").alias("n_words"),
        F.array_join("__chunk", " ").alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


ORACLE_DOC_CHUNK = f"""
WITH d AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws FROM documents
), n AS (
  SELECT doc_id, ws,
         CASE WHEN len(ws) <= {_WINDOW_WORDS} THEN 1
              ELSE cast(ceil((len(ws) - {_WINDOW_WORDS}) / {_WINDOW_STRIDE}) AS int) + 1
         END AS nc
  FROM d
), e AS (
  SELECT doc_id, ws, cast(unnest(range(0, nc)) AS int) AS chunk_idx FROM n
)
SELECT doc_id, chunk_idx,
       chunk_idx * {_WINDOW_STRIDE} AS word_start,
       cast(len(list_slice(ws, chunk_idx * {_WINDOW_STRIDE} + 1,
                           chunk_idx * {_WINDOW_STRIDE} + {_WINDOW_WORDS})) AS int)
         AS n_words,
       array_to_string(list_slice(ws, chunk_idx * {_WINDOW_STRIDE} + 1,
                                  chunk_idx * {_WINDOW_STRIDE} + {_WINDOW_WORDS}), ' ')
         AS chunk_text
FROM e ORDER BY doc_id, chunk_idx
"""


_BIGRAM_TOP_K = 100


def q_bigram_lm(spark, sf_dir):
    """Bigram LM TRAINING at corpus scale — the model-estimation step
    behind the CCNet-style perplexity filter that `lm_score` applies
    (there with unigrams): within-doc adjacent word pairs, counted
    map-side-combinably, with the conditional MLE p(w2|w1) derived from
    the bigram table itself (left-context totals = one vocab-sized
    groupBy on w1 — no second corpus pass). Reported as the top-100
    bigrams with deterministic tie-break; at 100 TB the full table is the
    artifact you'd broadcast to the scorer, exactly like lm_score's
    vocabulary join."""
    docs = t(spark, sf_dir, "documents")
    wdocs = _word_docs(docs)
    pairs = (
        wdocs.filter(F.size("__words") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__words) - 1), "
                    "i -> struct(element_at(__words, i) AS w1, "
                    "element_at(__words, i + 1) AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    bc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    ctx = bc.groupBy("w1").agg(F.sum("n").alias("c1"))
    return (
        bc.join(ctx, "w1")
        .select(
            "w1",
            "w2",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("c1"), 6).alias("p"),
        )
        .orderBy(F.desc("n"), "w1", "w2")
        .limit(_BIGRAM_TOP_K)
    )


ORACLE_BIGRAM_LM = f"""
WITH d AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws FROM documents
), b AS (
  SELECT ws[cast(i AS int)] AS w1, ws[cast(i AS int) + 1] AS w2
  FROM d, unnest(range(1, len(ws))) AS t(i)
  WHERE len(ws) >= 2
), bc AS (
  SELECT w1, w2, count(*) AS n FROM b GROUP BY 1, 2
), ctx AS (
  SELECT w1, sum(n) AS c1 FROM bc GROUP BY 1
)
SELECT w1, w2, cast(n AS bigint) AS n, round(n / c1, 6) AS p
FROM bc JOIN ctx USING (w1)
ORDER BY n DESC, w1, w2 LIMIT {_BIGRAM_TOP_K}
"""


def q_corpus_report(spark, sf_dir):
    """The corpus health census a data team reads before training: per
    source, document and token volume, the word-count distribution
    (exact interpolated p50/p90 — Spark `percentile` and DuckDB
    `quantile_cont` share the linear-interpolation definition), and
    language spread. One map-side-combinable groupBy over a narrow
    3-column projection; the percentile is the only sorted state and it
    sorts per (source) group, never globally."""
    docs = t(spark, sf_dir, "documents")
    words = F.when(F.coalesce(F.col("text"), F.lit("")) == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("text"), " "))
    )
    return (
        docs.select("source", "lang", words.alias("n_words"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_tokens"),
            F.round(F.expr("percentile(n_words, 0.5)"), 4).alias("p50_words"),
            F.round(F.expr("percentile(n_words, 0.9)"), 4).alias("p90_words"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
        .orderBy("source")
    )


ORACLE_CORPUS_REPORT = """
WITH d AS (
  SELECT source, lang,
         CASE WHEN coalesce(text, '') = '' THEN 0
              ELSE len(string_split(text, ' ')) END AS n_words
  FROM documents
)
SELECT source, count(*) AS n_docs,
       cast(sum(n_words) AS bigint) AS n_tokens,
       round(quantile_cont(n_words, 0.5), 4) AS p50_words,
       round(quantile_cont(n_words, 0.9), 4) AS p90_words,
       cast(count(DISTINCT lang) AS bigint) AS n_langs
FROM d GROUP BY source ORDER BY source
"""


def q_quality_features(spark, sf_dir):
    """The assembled per-document FEATURE VECTOR a model-based quality
    filter consumes (the FineWeb-Edu / DCLM pattern: heuristics feed a
    classifier, the classifier gates the corpus): Gopher repetition
    fractions + surface ratios + unigram-LM cross-entropy + language,
    joined into one row per document. Each component is its own
    oracle-checked query; this composition reuses those exact frames so
    the artifact can never drift from the audited parts. All joins key
    on doc_id (co-partitioned after the first shuffle); at 100 TB you'd
    persist the narrow survivors like curation_pipeline_v2 does."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    qs = q_quality_scores(spark, sf_dir)
    qr = q_quality_repetition(spark, sf_dir)
    lm = q_lm_score(spark, sf_dir).select("doc_id", "xent_bits")
    return (
        docs.join(qs, "doc_id")
        .join(qr, "doc_id")
        .join(lm, "doc_id")
        .orderBy("doc_id")
    )


def _quality_features_oracle() -> str:
    qs = ORACLE_QUALITY_SCORES.replace("ORDER BY doc_id", "")
    qr = ORACLE_QUALITY_REPETITION.replace("ORDER BY doc_id", "")
    lm = ORACLE_LM_SCORE.replace("ORDER BY doc_id", "")
    return f"""
WITH qs AS ({qs}),
qr AS ({qr}),
lm AS ({lm})
SELECT d.doc_id, d.lang, d.source,
       qs.n_words, qs.stopword_ratio, qs.alpha_ratio,
       qr.dup_word_frac, qr.top_bigram_frac, qr.dup_5gram_frac,
       lm.xent_bits
FROM documents d
JOIN qs USING (doc_id) JOIN qr USING (doc_id) JOIN lm USING (doc_id)
ORDER BY doc_id
"""


_PAIR_TOP_K = 50


def q_bpe_pair_census(spark, sf_dir):
    """The distributed inner loop of BPE tokenizer TRAINING: adjacent
    symbol-pair counts across the corpus (here: the character-pair round,
    i.e. iteration one — each further merge round is the same query over
    the re-segmented vocabulary). The scale insight that makes this
    tractable at 100 TB: aggregate the WORD census first (map-side
    combinable, output = vocabulary-sized), then explode pairs over the
    DISTINCT vocabulary weighted by count — the pair fan-out runs over
    ~10^6 vocab rows, never 10^12 corpus words. scripts/train_bpe.py is
    the driver-side consumer of exactly these counts (greedy pick,
    count DESC then lexicographic — the tie-break reproduced here)."""
    from janet_spark.extract.bpe import TOKEN_SPLIT

    docs = t(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(
                F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), TOKEN_SPLIT)
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        vocab.filter(F.length("w") >= 2)
        .select(
            "cnt",
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(_PAIR_TOP_K)
    )


ORACLE_BPE_PAIR_CENSUS = f"""
WITH words AS (
  SELECT unnest(list_filter(
           string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
           x -> x != '')) AS w
  FROM documents
), v AS (
  SELECT w, count(*) AS cnt FROM words GROUP BY w
), p AS (
  SELECT substr(w, cast(i AS int), 2) AS pair, cnt
  FROM v, unnest(range(1, len(w))) AS t(i)
  WHERE len(w) >= 2
)
SELECT pair, cast(sum(cnt) AS bigint) AS n
FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT {_PAIR_TOP_K}
"""


_SHUFFLE_SEED = "ep0"
_SHUFFLE_SHARD_SIZE = 100


def q_corpus_shuffle(spark, sf_dir):
    """Deterministic training-order shuffle: a seeded md5 over
    (seed, doc_id) defines a reproducible global permutation — the data-
    order step before writing training shards (reshuffle per epoch =
    change the seed). Keyed hashing also mixes sources automatically
    (no long same-domain runs; pinned by pytest).

    Scale shape: the global rank is NEVER a single-partition sort. The
    first 2 hex chars of the key split the corpus into 256 uniform
    blocks; ranks are row_number within block (distributed) plus
    broadcast per-block offsets from a 256-row prefix sum — the same
    two-level pattern as sequence_pack. Shards are contiguous rank
    ranges; shard_writer.write_training_shards materializes them as one
    file per shard from this SAME ranking helper."""
    from janet_spark.shard_writer import shuffle_ranked

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return (
        shuffle_ranked(docs, _SHUFFLE_SEED, _SHUFFLE_SHARD_SIZE)
        .select("doc_id", "shuffle_rank", "shard")
        .orderBy("doc_id")
    )


ORACLE_CORPUS_SHUFFLE = f"""
WITH k AS (
  SELECT doc_id,
         md5('{_SHUFFLE_SEED}' || ':' || cast(doc_id AS varchar)) AS skey
  FROM documents
), r AS (
  SELECT doc_id, row_number() OVER (ORDER BY skey) - 1 AS shuffle_rank
  FROM k
)
SELECT doc_id, shuffle_rank,
       cast(floor(shuffle_rank / {_SHUFFLE_SHARD_SIZE}) AS bigint) AS shard
FROM r ORDER BY doc_id
"""


_V2_MAX_DUP_WORD = 0.6
_V2_MAX_XENT = 4.95


def q_curation_pipeline_v2(spark, sf_dir):
    """The full modern pretraining-curation stack as one composed Spark
    job — the capstone showing the round-3 curation operators compose:

      1. eval-slice exclusion (doc_id % 11 == 0 is never training data)
      2. repetition gate (>= 10 words, dup-word fraction <= 0.6) — pure
         expressions, fused into the scan by whole-stage codegen
      3. benchmark decontamination — broadcast anti-join against the
         sliding-8-gram removal list (q_decontaminate)
      4. cross-doc boilerplate chunk removal + ordered rebuild
         (_chunk_rebuild over the surviving docs); fully-boilerplate
         docs (0 kept chunks) are dropped
      5. unigram-LM band (cross-entropy over the survivors' raw words,
         keep xent <= 4.95 bits — drops the rare-token tail)
      6. deterministic sequence packing of the survivors by CLEAN token
         count (_pack_sequences two-level prefix sum)

    Every stage keeps the scale shape of its standalone operator: the
    only corpus-sized shuffles are the chunk census, the per-doc rebuild,
    the vocab count and the per-doc score — everything else is broadcast
    or expression-level. The DuckDB oracle replays the identical chain as
    one CTE stack, so stage ORDER is verified, not just each stage."""
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    n_words = F.size(words)
    dup_word_frac = 1 - F.size(F.array_distinct(words)) / n_words
    train = docs.filter(
        (F.col("doc_id") % _EVAL_MOD != 0)
        & (n_words >= 10)
        & (dup_word_frac <= _V2_MAX_DUP_WORD)
    )
    removal = q_decontaminate(spark, sf_dir).select("doc_id")
    # persisted: four downstream consumers (chunk census, chunk rebuild,
    # vocab count, score join) would otherwise each recompute the gate +
    # decontamination subplan — the executed plan showed 30 table scans
    # without this, 3 with it. The cache lives for the session (lazy
    # evaluation means consumers run after this function returns, so
    # unpersist-on-return is impossible); a production run replaces this
    # persist with a staged-parquet checkpoint — this is exactly the
    # pipeline's natural materialization/restart point.
    survivors = train.join(F.broadcast(removal), "doc_id", "left_anti").persist()
    rebuilt = _chunk_rebuild(survivors).filter(F.col("n_chunks_kept") > 0)
    occ = survivors.select("doc_id", F.explode(words).alias("word"))
    xent = (
        occ.join(F.broadcast(_vocab_probs(occ)), "word")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(-F.log2(F.col("c") / F.col("tot"))) / F.count(F.lit(1)), 4
            ).alias("xent_bits")
        )
        .filter(F.col("xent_bits") <= _V2_MAX_XENT)
    )
    clean_tokens = F.size(F.split(F.col("clean_text"), " ")).cast("long")
    scored = rebuilt.join(xent, "doc_id").select(
        "doc_id", clean_tokens.alias("n_tokens"), "xent_bits"
    )
    return _pack_sequences(scored).select(
        "doc_id", "n_tokens", "xent_bits", "seq_id", "seq_offset"
    ).orderBy("doc_id")


ORACLE_CURATION_PIPELINE_V2 = """
WITH d AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS arr FROM documents
), train AS (
  SELECT doc_id, arr FROM d
  WHERE doc_id % 11 != 0 AND len(arr) >= 10
    AND 1 - len(list_distinct(arr)) / len(arr)::double <= 0.6
), g AS (
  SELECT doc_id,
         unnest(list_distinct(
           list_transform(generate_series(1, greatest(len(arr) - 7, 0)),
                          i -> array_to_string(arr[i:i+7], ' ')))) AS gram
  FROM d
), ev AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % 11 = 0
), contaminated AS (
  SELECT DISTINCT g.doc_id FROM g JOIN ev USING (gram) WHERE g.doc_id % 11 != 0
), survivors AS (
  SELECT train.* FROM train ANTI JOIN contaminated USING (doc_id)
), w AS (
  SELECT doc_id, unnest(arr) AS word, generate_subscripts(arr, 1) - 1 AS pos
  FROM survivors
), c AS (
  SELECT doc_id, pos // 8 AS cpos, string_agg(word, ' ' ORDER BY pos) AS chunk
  FROM w GROUP BY doc_id, pos // 8
), shared AS (
  SELECT chunk FROM c GROUP BY chunk HAVING count(DISTINCT doc_id) > 1
), kept AS (
  SELECT c.* FROM c ANTI JOIN shared USING (chunk)
), r AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY cpos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
), vocab AS (
  SELECT word, count(*) AS vc FROM w GROUP BY word
), tot AS (
  SELECT count(*)::double AS n FROM w
), x AS (
  SELECT w.doc_id,
         round(sum(-log2(vocab.vc / tot.n)) / count(*), 4) AS xent_bits
  FROM w JOIN vocab USING (word), tot GROUP BY w.doc_id
), scored AS (
  SELECT r.doc_id,
         cast(len(string_split(r.clean_text, ' ')) AS bigint) AS n_tokens,
         x.xent_bits
  FROM r JOIN x USING (doc_id)
  WHERE x.xent_bits <= 4.95 AND r.n_kept > 0
), packed AS (
  SELECT doc_id, n_tokens, xent_bits,
         cast(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint)
           AS cum_before
  FROM scored
)
SELECT doc_id, n_tokens, xent_bits,
       cum_before // 512 AS seq_id,
       cum_before % 512 AS seq_offset
FROM packed ORDER BY doc_id
"""


_JACCARD_THRESHOLD = 0.8
_SHINGLE_WORDS = 5


def _shingle_df(docs: DataFrame) -> DataFrame:
    wdocs = _word_docs(docs, coalesce_null=False)
    words = F.col("__words")
    n = F.greatest(F.size(words) - (_SHINGLE_WORDS - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(words, i, _SHINGLE_WORDS), " "),
    )
    return wdocs.select(
        "doc_id", F.explode(F.array_distinct(shingles)).alias("sh")
    )


def _jaccard_filter(inter: DataFrame, counts: DataFrame) -> DataFrame:
    """Shared tail of both near-dup pair queries: per-pair shingle
    intersection counts + per-doc shingle counts -> thresholded Jaccard.
    ONE implementation so the LSH query can never drift from the exact
    query it is oracle-checked against."""
    c1 = counts.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n1"))
    c2 = counts.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n2"))
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    return (
        inter.join(c1, "d1")
        .join(c2, "d2")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .select("d1", "d2", "jaccard")
        .orderBy("d1", "d2")
    )


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Near-dup pairs by exact n-gram Jaccard (explode -> equi-join on
    shingle -> count). This is the exact baseline; the LSH query below is
    the scale path (this one is quadratic in shingle-frequency)."""
    docs = t(spark, sf_dir, "documents")
    sh = _shingle_df(docs)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _jaccard_filter(inter, counts)


ORACLE_NGRAM_JACCARD_PAIRS = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
d AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(words) - {_SHINGLE_WORDS - 1}, 1) + 1),
             i -> array_to_string(list_slice(words, i, i + {_SHINGLE_WORDS - 1}), ' ')
           )) AS sh
    FROM w)
),
cnt AS (SELECT doc_id, count(*) AS n FROM d GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
  FROM d a JOIN d b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT d1, d2,
       round(inter::double / (c1.n + c2.n - inter), 4) AS jaccard
FROM pairs JOIN cnt c1 ON c1.doc_id = d1 JOIN cnt c2 ON c2.doc_id = d2
WHERE round(inter::double / (c1.n + c2.n - inter), 4) >= {_JACCARD_THRESHOLD}
ORDER BY d1, d2
"""

def connected_components(edges: DataFrame, src: str = "d1", dst: str = "d2", max_iter: int = 50) -> DataFrame:
    """Min-label propagation over an undirected edge list: returns
    (node, component) where component = the smallest node id reachable.
    This is the ITERATIVE step real dedup pipelines run after pair mining
    (keep one doc per near-dup cluster).

    Scale shape: each iteration is one equi-join of the current labels
    against the (symmetrized) edge list plus a min-aggregate — all
    shuffle-partitionable; the loop runs until a fixpoint, i.e. O(graph
    diameter) iterations (near-dup clusters are shallow — dozens of docs,
    diameter of a few). Convergence is checked with a count of changed
    labels; intermediate frames persist so each iteration reuses the last
    instead of recomputing the lineage from scratch (and are unpersisted
    as soon as superseded — the loop holds at most two label tables)."""
    # lineage CUT at the loop entrance, not merely persisted: the upstream
    # pair-mining DAG (for the LSH composition: signatures, bucket census,
    # candidate join, verify) would otherwise ride along INSIDE every
    # iteration's logical plan — persist() substitutes an InMemoryRelation
    # but that relation still carries its full cached plan, and because
    # each iteration references the previous frame twice the carried tree
    # compounds until Catalyst analysis time (measured: 4s -> 15s per
    # 47-row iteration at sf0.01) dwarfs execution. localCheckpoint
    # truncates to a LogicalRDD leaf: materialized exactly once, and every
    # loop plan starts from a leaf.
    edges = edges.localCheckpoint(eager=True)
    sym = (
        edges.selectExpr(f"{src} AS a", f"{dst} AS b")
        .unionByName(edges.selectExpr(f"{dst} AS a", f"{src} AS b"))
        # persisted: every iteration joins against sym; without this each
        # round would recompute the edge scan (cheap over the checkpoint
        # leaf, but the loop reads it every iteration)
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    labels.count()  # materialize
    n_iters = 0
    for it in range(max_iter):
        # new label per node = min(own label, labels of all neighbors):
        # ONE equi-join + union + min-agg — one fewer shuffle per iteration
        # than the join/agg/left-join formulation, and `labels` enters the
        # plan twice (join side + union side) instead of three times, which
        # halves the per-iteration logical-plan fan-out below
        candidates = (
            labels.join(sym, labels.node == sym.a)
            .select(F.col("b").alias("node"), "component")
            .unionByName(labels.select("node", "component"))
        )
        new_labels = candidates.groupBy("node").agg(
            F.min("component").alias("component")
        )
        # persist() stops per-iteration RECOMPUTE but the LOGICAL plan still
        # nests: each iteration references the previous labels frame twice,
        # so the printed/analyzed tree doubles per iteration — at depth ~50
        # Catalyst analysis time dwarfs execution. localCheckpoint(eager)
        # every 3 iterations truncates the lineage to a LogicalRDD leaf
        # over the materialized blocks, capping the tree at 2^3 references
        # regardless of graph diameter.
        if (it + 1) % 3 == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        n_iters = it + 1
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            "iterations (component diameter exceeds the cap) — raising "
            "instead of returning silently-wrong partial labels; increase "
            "max_iter for unusually deep near-dup chains"
        )
    # the final labels frame is materialized (the convergence count), so
    # dropping the edge caches is safe — downstream consumers read labels
    sym.unpersist()  # the edges checkpoint blocks free when the RDD is GC'd
    # convergence behavior must be observable at scale (a 40-iteration run
    # on a supposedly-shallow dedup graph is a data-quality signal, not
    # just slowness)
    logging.getLogger(__name__).info(
        "connected_components converged in %d iteration(s)", n_iters
    )
    return labels


def _clusters_from_pairs(pairs: DataFrame) -> DataFrame:
    """Shared clustering tail: near-dup edge list -> connected components ->
    (doc_id, cluster_rep, cluster_size, keep) with one keeper per cluster
    (min doc_id). ONE implementation so the exact and LSH compositions can
    never drift from the recursive-CTE oracle they share."""
    comps = connected_components(pairs)
    sizes = comps.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comps.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_rep"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("keep"),
        )
        .orderBy("doc_id")
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERING: exact-Jaccard pairs -> connected components ->
    (doc_id, cluster_rep, cluster_size, keep). The step after pair mining
    in a real dedup run: one keeper per cluster (min doc_id), everything
    else marked for drop. The component computation is iterative
    min-label propagation (see connected_components); the DuckDB oracle
    recomputes components independently with a recursive CTE."""
    pairs = q_ngram_jaccard_pairs(spark, sf_dir).select("d1", "d2")
    return _clusters_from_pairs(pairs)


def q_dedup_clusters_lsh(spark, sf_dir):
    """The SCALE-PATH clustering composition a 100-TB dedup run actually
    executes: MinHash-LSH pair mining (bucketed, hot-bucket-capped — see
    q_minhash_lsh_pairs) -> connected components -> one keeper per cluster.
    Below the hot-bucket cap the LSH pair set equals the exact-Jaccard pair
    set (recall ~1 - 2e-4 per pair at the 16x4 banding), so the SAME
    recursive-CTE oracle as q_dedup_clusters verifies this end to end —
    the quadratic exact miner never runs here."""
    pairs = q_minhash_lsh_pairs(spark, sf_dir).select("d1", "d2")
    return _clusters_from_pairs(pairs)


def _dedup_clusters_oracle() -> str:
    # reuse the exact-Jaccard pair SQL as the edge CTE, then enumerate
    # reachability with a recursive CTE (UNION dedup bounds the walk) and
    # take the min reachable id as the component representative
    pair_sql = ORACLE_NGRAM_JACCARD_PAIRS.replace("ORDER BY d1, d2", "")
    return f"""
WITH RECURSIVE pairs AS ({pair_sql}),
edges AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION ALL
  SELECT d2 AS a, d1 AS b FROM pairs
),
walk(src, node) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT w.src, e.b FROM walk w JOIN edges e ON e.a = w.node
),
comp AS (
  SELECT src AS doc_id, min(node) AS cluster_rep FROM walk GROUP BY src
),
sizes AS (
  SELECT cluster_rep, count(*) AS cluster_size FROM comp GROUP BY cluster_rep
)
SELECT c.doc_id, c.cluster_rep, s.cluster_size,
       c.doc_id = c.cluster_rep AS keep
FROM comp c JOIN sizes s USING (cluster_rep)
ORDER BY doc_id
"""


_SPLIT_EVAL_PCT = 10
_SPLIT_SEED = "split0"


def q_cluster_safe_split(spark, sf_dir):
    """Leakage-free train/eval split: the split UNIT is the near-dup
    cluster, not the document, so two near-duplicates can never straddle
    the boundary (the classic eval-contamination bug a doc-level
    hash_sample split cannot prevent). Docs outside any cluster are their
    own singleton cluster (rep = own doc_id); the side is a deterministic
    md5 gate on the cluster rep, engine-portable like hash_sample.

    Scale shape: pairs come from the bucketed LSH miner (the 100-TB
    path — same argument as dedup_clusters_lsh, so the exact-pair
    recursive-CTE oracle still applies); the rep assignment is one left
    join of docs to the (small) clustered subset; the gate is a
    projection-time expression — no extra shuffle beyond clustering."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    clusters = q_dedup_clusters_lsh(spark, sf_dir).select("doc_id", "cluster_rep")
    withrep = docs.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_rep", F.col("doc_id")).alias("cluster_rep"),
    )
    gate = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(_SPLIT_SEED), F.col("cluster_rep"))),
                1,
                2,
            ),
            16,
            10,
        )
    ).cast("int")
    return (
        withrep.withColumn(
            "split",
            F.when(
                gate < int(256 * _SPLIT_EVAL_PCT / 100), F.lit("eval")
            ).otherwise(F.lit("train")),
        )
        .orderBy("doc_id")
    )


def _cluster_safe_split_oracle() -> str:
    pair_sql = ORACLE_NGRAM_JACCARD_PAIRS.replace("ORDER BY d1, d2", "")
    thr = int(256 * _SPLIT_EVAL_PCT / 100)
    h = f"md5('{_SPLIT_SEED}:' || cast(cluster_rep AS varchar))"
    return f"""
WITH RECURSIVE pairs AS ({pair_sql}),
edges AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION ALL
  SELECT d2 AS a, d1 AS b FROM pairs
),
walk(src, node) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT w.src, e.b FROM walk w JOIN edges e ON e.a = w.node
),
comp AS (
  SELECT src AS doc_id, min(node) AS cluster_rep FROM walk GROUP BY src
),
rep AS (
  SELECT d.doc_id, coalesce(c.cluster_rep, d.doc_id) AS cluster_rep
  FROM documents d LEFT JOIN comp c USING (doc_id)
),
g AS (
  SELECT doc_id, cluster_rep,
         (strpos('0123456789abcdef', substr({h}, 1, 1)) - 1) * 16
         + strpos('0123456789abcdef', substr({h}, 2, 1)) - 1 AS gate
  FROM rep
)
SELECT doc_id, cluster_rep,
       CASE WHEN gate < {thr} THEN 'eval' ELSE 'train' END AS split
FROM g ORDER BY doc_id
"""


# MinHash parameters: 64 permutations in 16 bands x 4 rows. At
# jaccard >= 0.8 the miss probability per pair is (1 - 0.8^4)^16 ~ 2e-4,
# so candidate recall is effectively exact and the verified output equals
# the exact-Jaccard result — which is exactly what the oracle checks.
_MH_PERMS = 64
_MH_BANDS = 16
_MH_ROWS = _MH_PERMS // _MH_BANDS
_MH_PRIME = (1 << 61) - 1
_rng = np.random.RandomState(42)
# coefficient bounds keep the affine form EXACT in int64: h < 2^32 (crc32),
# A < 2^30 => h*A < 2^62, + B < 2^61 stays under 2^63 — no silent wraparound,
# so the hash really is the mod-Mersenne-prime family the recall analysis
# below assumes (with A drawn up to the prime, products overflowed int64 and
# the 2e-4 miss bound had no basis)
_MH_A = _rng.randint(1, 1 << 30, size=_MH_PERMS, dtype=np.int64)
_MH_B = _rng.randint(0, 1 << 61, size=_MH_PERMS, dtype=np.int64)


def _minhash_signature(shingles: list[str]) -> np.ndarray:
    if not shingles:
        return np.zeros(_MH_PERMS, dtype=np.int64)
    h = np.array(
        [zlib.crc32(s.encode("utf-8")) for s in shingles], dtype=np.int64
    )  # (n,)
    # (perms, n) affine hashes mod Mersenne prime, min over shingles
    vals = (h[None, :] * _MH_A[:, None] + _MH_B[:, None]) % _MH_PRIME
    return vals.min(axis=1)


def _doc_shingles(text: str) -> list[str]:
    words = text.split(" ")
    k = _SHINGLE_WORDS
    if len(words) < k:
        return [" ".join(words)]
    return list({" ".join(words[i : i + k]) for i in range(len(words) - k + 1)})


_LSH_HOT_BUCKET_CAP = 256


def _band_df(docs: DataFrame) -> DataFrame:
    """MinHash sign stage shared by the full miner and the incremental
    delta miner: (doc_id, band_key) with ONE int64 key per (doc, band).
    See q_minhash_lsh_pairs for the measured rationale — why signing stays
    Python-side (C-speed crc32 over slices of one cached str beats JVM
    array_join's per-shingle UTF8String allocation 2x on this box) and why
    band keys are mixed down to int64 (widest shuffle of the query; fixed-
    width keys hash/compare JVM-side with no string allocation; a mixing
    collision can only CREATE a candidate, never lose one, and every
    candidate is exact-Jaccard-verified)."""
    _mix = np.array(
        [0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
        dtype=np.uint64,
    )

    def sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        band_idx = np.arange(_MH_BANDS, dtype=np.uint64)
        for pdf in batches:
            ids = []
            keys = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"].fillna("")):
                sig = _minhash_signature(_doc_shingles(text))
                chunks = sig.astype(np.uint64).reshape(_MH_BANDS, _MH_ROWS)
                mixed = (chunks * _mix[None, :]).sum(axis=1, dtype=np.uint64)
                mixed ^= mixed >> np.uint64(33)
                mixed = mixed * np.uint64(0xFF51AFD7ED558CCD) + band_idx
                ids.append(np.full(_MH_BANDS, doc_id, dtype=np.int64))
                keys.append(mixed.view(np.int64))
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids),
                    "band_key": np.concatenate(keys),
                }
            )

    return docs.mapInPandas(sig_batches, schema="doc_id long, band_key long")


def _verify_candidates(docs: DataFrame, candidates: DataFrame) -> DataFrame:
    """Shared verify tail: exact-Jaccard check of candidate (d1, d2) pairs.
    Dedups + persists the candidates (consumed by the verify join AND the
    semi-join below), then SEMI-JOINS the shingle table down to docs that
    appear in any pair: near-dup candidates are a vanishing fraction of the
    corpus at scale, so this prunes the shingle explode — the widest
    intermediate of the whole query — from corpus-sized to candidate-sized.

    The explicit hash repartition on the semi-join output is load-bearing:
    when `docs` is a UNION (the incremental miner passes corpus ∪ delta),
    Catalyst pushes the left-semi join below the union, each branch comes
    out hash-partitioned on doc_id with shuffle.partitions partitions, and
    the Spark 4.1.2 planner then accepts a co-partitioning claim for the
    union output — whose PHYSICAL partition count is the sum of the
    branches — so the downstream sort-merge join gets no exchange and dies
    with "Can't zip RDDs with unequal numbers of partitions: List(32, 64)"
    (reproduced at a 100k-doc corpus, AQE on or off). The explicit
    repartition pins claim == physical; downstream per-doc aggregations
    reuse the partitioning, so for non-union inputs it costs one exchange
    of the candidate-doc slice only."""
    spark = candidates.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    candidates = candidates.distinct().persist()
    cand_docs = (
        candidates.select(F.col("d1").alias("doc_id"))
        .unionByName(candidates.select(F.col("d2").alias("doc_id")))
        .distinct()
    )
    cand_texts = docs.join(cand_docs, "doc_id", "left_semi").repartition(
        n_part, "doc_id"
    )
    sh = _shingle_df(cand_texts)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    s1 = sh.select(F.col("doc_id").alias("d1"), F.col("sh").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("d2_r"), F.col("sh").alias("sh2"))
    inter = (
        candidates.join(s1, "d1")
        .join(s2, (F.col("d2") == F.col("d2_r")) & (F.col("sh1") == F.col("sh2")))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _jaccard_filter(inter, counts)


def q_minhash_lsh_pairs(spark, sf_dir, hot_bucket_cap=_LSH_HOT_BUCKET_CAP):
    """MinHash + LSH banding near-dup pairs (the 100 TB-scale dedup path):
    signature per doc (vectorized numpy inside mapInPandas), band keys
    exploded, bucket equi-join produces candidates, exact Jaccard verifies.
    Output is identical to the exact-Jaccard query, which serves as oracle.

    Hot-bucket cap: a degenerate band key (e.g. millions of empty or
    boilerplate-identical docs sharing one band) would make the self-join
    emit O(b^2) candidate rows from a single key — unrecoverable at 100 TB
    no matter how the join is partitioned. Buckets larger than
    `hot_bucket_cap` therefore switch from all-pairs to a STAR expansion:
    every member pairs with the bucket's min doc_id only (b-1 candidates).
    For dedup purposes the cluster is still fully discovered through the
    representative (members of a degenerate bucket agree on a whole band
    and are near-identical); the bounded recall trade is deliberate and
    pinned by tests/test_round2_ops.py::test_lsh_hot_bucket_star_cap. At
    the oracle-checked scales no bucket exceeds the cap, so the output
    stays bit-identical to exact Jaccard."""
    docs = t(spark, sf_dir, "documents")

    # The signature stage stays Python-side DELIBERATELY: a JVM variant
    # (shingles via transform/slice/array_join + crc32 in whole-stage
    # codegen, Python doing only the numpy affine-min over the int64 hash
    # arrays) was built and MEASURED 2x slower on this box — sign-only
    # stage 2.2-2.5 s vs 1.1-1.2 s at sf0.1 on 32 cores — because Spark
    # allocates a UTF8String per shingle per row in array_join, while the
    # Python loop hashes slices of one cached str with C-speed zlib.crc32.
    # Same conclusion as the canonicalizer A/B (SURVEY.md par. 8 item 7):
    # on allocation-bandwidth-bound hosts, "stay JVM-side" loses to
    # "minimize string copies".
    # Band keys are MIXED DOWN to one int64 per band (multiply-xor over the
    # band's 4 signature values + the band index) instead of the r2 string
    # "band:v1,v2,v3,v4" (~80 bytes): the band table is the widest shuffle
    # of the whole query, so the 10x-smaller fixed-width key cuts shuffle
    # bytes and compares/hashes JVM-side without string allocation. A
    # 64-bit mixing collision can only CREATE a candidate pair (two bands
    # hashing together), never lose one — and every candidate is verified
    # by exact Jaccard below, so the key scheme is correctness-neutral by
    # construction (measured: 4.1 s -> see BENCH note).
    #
    # The signature stage feeds THREE consumers (census, both self-join
    # sides); persist so the minhash UDF runs once per row, not per branch.
    # In a production pipeline this is a materialized signature table — the
    # natural checkpoint between 'sign' and 'pair' stages of a dedup run
    # (and the table the incremental miner below reads instead of signing).
    bands = _band_df(docs).persist()
    # bucket census as a map-side-combinable agg joined back on band_key —
    # NOT a window (a window would sort the full band table; the agg output
    # is one row per distinct band key, and AQE picks broadcast vs shuffle
    # join by its actual size)
    bucket_sizes = bands.groupBy("band_key").agg(
        F.count(F.lit(1)).alias("bkt_n"), F.min("doc_id").alias("bkt_rep")
    )
    sized = bands.join(bucket_sizes, "band_key")
    cold = sized.filter(F.col("bkt_n") <= hot_bucket_cap)
    a = cold.alias("a")
    b = cold.alias("b")
    cold_pairs = a.join(
        b,
        (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
    star_pairs = (
        sized.filter((F.col("bkt_n") > hot_bucket_cap) & (F.col("doc_id") != F.col("bkt_rep")))
        .select(F.col("bkt_rep").alias("d1"), F.col("doc_id").alias("d2"))
    )
    return _verify_candidates(docs, cold_pairs.unionByName(star_pairs))


# Deterministic stand-in for "arrived since the last run": the incremental
# miner treats doc_id % 7 == 0 as today's delta batch and the rest as the
# already-deduped corpus. Any reproducible predicate works; mod keeps the
# DuckDB oracle a one-line WHERE clause.
_DELTA_MOD = 7


def q_incremental_neardup(spark, sf_dir, hot_bucket_cap=_LSH_HOT_BUCKET_CAP):
    """Incremental near-dup: today's delta batch vs the existing corpus —
    the shape a production dedup run actually takes daily. In production
    the corpus side's band table is the materialized signature table that
    q_minhash_lsh_pairs persists between its 'sign' and 'pair' stages,
    maintained across runs; only the delta gets signed each day. (Here both
    sides come from _band_df over the same parquet for test determinism,
    but the corpus side never feeds a self-join.)

    Scale shape: candidates come from joining the DELTA band rows (small —
    AQE broadcasts them) against the full band table on band_key, so
    per-run cost is O(|delta| x bucket size) and base x base pairs are
    structurally impossible to emit — the corpus never re-pairs with
    itself. Buckets above `hot_bucket_cap` fall back to the same star
    expansion as the full miner (delta members pair with the bucket
    representative; when the representative is itself new, the star also
    reaches the old members so every delta-touching pair survives the cap).
    Output = every near-dup pair with at least one delta endpoint,
    exact-Jaccard-verified; oracle = the exact pair SQL filtered to
    delta-touching pairs."""
    docs = t(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % _DELTA_MOD == 0
    bands = _band_df(docs).persist()
    delta_bands = bands.filter(is_new)
    bucket_sizes = bands.groupBy("band_key").agg(
        F.count(F.lit(1)).alias("bkt_n"), F.min("doc_id").alias("bkt_rep")
    )
    sized_delta = delta_bands.join(bucket_sizes, "band_key")
    a = sized_delta.filter(F.col("bkt_n") <= hot_bucket_cap).alias("a")
    b = bands.alias("b")
    # new x new pairs arrive twice (once from each endpoint's delta row);
    # least/greatest orients them identically and the verify tail dedups.
    cold_pairs = a.join(
        b,
        (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") != F.col("b.doc_id")),
    ).select(
        F.least("a.doc_id", "b.doc_id").alias("d1"),
        F.greatest("a.doc_id", "b.doc_id").alias("d2"),
    )
    # bkt_rep = min(doc_id) over the bucket, so rep < member always holds
    # and star pairs are already (d1, d2)-oriented
    hot_delta = sized_delta.filter(
        (F.col("bkt_n") > hot_bucket_cap) & (F.col("doc_id") != F.col("bkt_rep"))
    ).select(F.col("bkt_rep").alias("d1"), F.col("doc_id").alias("d2"))
    hot_rep_new = (
        bands.join(
            bucket_sizes.filter(
                (F.col("bkt_n") > hot_bucket_cap)
                & (F.col("bkt_rep") % _DELTA_MOD == 0)
            ),
            "band_key",
        )
        .filter(F.col("doc_id") != F.col("bkt_rep"))
        .select(F.col("bkt_rep").alias("d1"), F.col("doc_id").alias("d2"))
    )
    candidates = cold_pairs.unionByName(hot_delta).unionByName(hot_rep_new)
    return _verify_candidates(docs, candidates)


def _incremental_neardup_oracle() -> str:
    pair_sql = ORACLE_NGRAM_JACCARD_PAIRS.replace("ORDER BY d1, d2", "")
    return f"""
SELECT * FROM ({pair_sql})
WHERE d1 % {_DELTA_MOD} = 0 OR d2 % {_DELTA_MOD} = 0
ORDER BY d1, d2
"""


def q_simhash(spark, sf_dir):
    """64-bit SimHash per document. Token hash = top 8 bytes of
    sha256(token) so the DuckDB oracle can recompute every bit
    independently; Hamming-distance robustness is pinned by pytest."""
    import hashlib

    docs = t(spark, sf_dir, "documents")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"].fillna("")):
                acc = np.zeros(64, dtype=np.int64)
                for w in set(text.split(" ")):
                    h8 = hashlib.sha256(w.encode("utf-8")).digest()[:8]
                    bits = np.unpackbits(
                        np.frombuffer(h8, dtype=np.uint8)
                    ).astype(np.int64)
                    acc += bits * 2 - 1
                sim = np.packbits((acc > 0).astype(np.uint8)).tobytes()
                out.append((int(doc_id), int.from_bytes(sim, "big", signed=True)))
            yield pd.DataFrame(out, columns=["doc_id", "simhash"])

    return docs.mapInPandas(run, schema="doc_id long, simhash long").orderBy("doc_id")


def _simhash_oracle_sql() -> str:
    """DuckDB recomputation of the 64-bit SimHash: per distinct token, bit j
    of the top-8-byte sha256 prefix votes +1/-1; the signed result re-packs
    with the MSB carrying weight -(2^63) (two's complement)."""
    nib = "(strpos('0123456789abcdef', substr(hx, {pos}, 1)) - 1)"
    bit_sums = []
    for j in range(64):
        pos = j // 4 + 1
        mask = 1 << (3 - j % 4)
        bit_sums.append(
            f"sum(CASE WHEN ({nib.format(pos=pos)} & {mask}) != 0 "
            f"THEN 1 ELSE -1 END) AS b{j}"
        )
    weights = ["CASE WHEN b0 > 0 THEN -9223372036854775808::HUGEINT ELSE 0 END"]
    for j in range(1, 64):
        weights.append(f"CASE WHEN b{j} > 0 THEN {1 << (63 - j)}::HUGEINT ELSE 0 END")
    return f"""
WITH w AS (
  SELECT doc_id, unnest(list_distinct(string_split(coalesce(text, ''), ' '))) AS word
  FROM documents
), h AS (
  SELECT doc_id, substr(lower(sha256(word)), 1, 16) AS hx FROM w
), bits AS (
  SELECT doc_id, {', '.join(bit_sums)} FROM h GROUP BY doc_id
)
SELECT doc_id, cast({' + '.join(weights)} AS BIGINT) AS simhash
FROM bits ORDER BY doc_id
"""


ORACLE_SIMHASH = _simhash_oracle_sql()


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 for query vectors (vec_id < 10): broadcast
    query matrix into a mapInPandas numpy GEMM, then a global top-k window.
    At cluster scale the GEMM is per-partition and only (q, k) survivors
    shuffle."""
    emb = t(spark, sf_dir, "embeddings")
    q_rows = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding").collect()
    q_ids = np.array([r["vec_id"] for r in q_rows])
    q_mat = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, q_norm))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qn = bc.value
        for pdf in batches:
            m = np.array(list(pdf["embedding"]), dtype=np.float64)
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = mn @ qn.T  # (n, q)
            n, q = sims.shape
            yield pd.DataFrame(
                {
                    "q_id": np.repeat(ids, n),
                    "vec_id": np.tile(pdf["vec_id"].to_numpy(), q),
                    "sim": np.round(sims.T.reshape(-1), 4),
                }
            )

    sims = emb.mapInPandas(run, schema="q_id long, vec_id long, sim double")
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        sims.filter(F.col("q_id") != F.col("vec_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "vec_id", "sim", "rank")
        .orderBy("q_id", "rank")
    )


ORACLE_ANN_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 10),
sims AS (
  SELECT q.q_id, e.vec_id,
         round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), 4) AS sim
  FROM q JOIN embeddings e ON e.vec_id != q.q_id
),
ranked AS (
  SELECT q_id, vec_id, sim,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM sims
)
SELECT q_id, vec_id, sim, rank FROM ranked WHERE rank <= 5 ORDER BY q_id, rank
"""


def _near_dup_docs_per_source(docs, pairs):
    """(source, neardup_docs): documents appearing in ≥1 verified pair.
    Only needs the (doc_id, source) projection of the corpus — callers on
    the maintained path pass exactly that so the plan never reads text."""
    nd_docs = (
        pairs.select(F.col("d1").alias("doc_id"))
        .unionByName(pairs.select(F.col("d2").alias("doc_id")))
        .distinct()
    )
    return (
        docs.join(nd_docs, "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("neardup_docs"))
    )


def _exact_dup_from_census(census):
    """(source, exact_dup_docs) and (source, n_docs) from the maintained
    (kk, source, n) census — a key whose TOTAL count across sources
    exceeds 1 is a duplicate group, and every document carrying it counts
    toward its own source."""
    dup_keys = (
        census.groupBy("kk").agg(F.sum("n").alias("tot")).filter(F.col("tot") > 1)
    )
    exact = (
        census.join(dup_keys.select("kk"), "kk", "left_semi")
        .groupBy("source")
        .agg(F.sum("n").alias("exact_dup_docs"))
    )
    base = census.groupBy("source").agg(F.sum("n").alias("n_docs"))
    return exact, base


def _assemble_dedup_report(base, exact, near):
    return (
        base.join(exact, "source", "left")
        .join(near, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("exact_dup_docs", F.lit(0)).cast("long").alias("exact_dup_docs"),
            F.round(
                F.coalesce("exact_dup_docs", F.lit(0)) / F.col("n_docs"), 6
            ).alias("exact_dup_rate"),
            F.coalesce("neardup_docs", F.lit(0)).cast("long").alias("neardup_docs"),
            F.round(
                F.coalesce("neardup_docs", F.lit(0)) / F.col("n_docs"), 6
            ).alias("neardup_rate"),
        )
        .orderBy("source")
    )


def dedup_report_frame(docs, pairs):
    """Shared report body, standalone (scanning) form: per source,
    documents in an exact-duplicate group (corpus-wide md5-prefix key)
    and documents appearing in ≥1 of the given verified near-dup `pairs`,
    with rates. Everything aggregates to one row per source. The
    maintained form computes the same exact half from the
    (kk, source, n) census instead of md5-scanning the corpus."""
    from janet_spark.dedup_incremental import exact_census_of

    exact, base = _exact_dup_from_census(exact_census_of(docs))
    near = _near_dup_docs_per_source(docs, pairs)
    return _assemble_dedup_report(base, exact, near)


def q_dedup_report(spark, sf_dir):
    """The duplication census a data team reads next to `corpus_report` —
    standalone form: RE-MINES the near-dup pairs per invocation (the LSH
    scale path, equal to the exact-Jaccard pair set below the hot-bucket
    cap, so the oracle recomputes with the exact SQL). This is the oracle
    harness / cold-start shape; the production daily report is
    `q_dedup_report_incremental`, which reads the maintained pair
    generations instead (round-3 verdict #3)."""
    docs = t(spark, sf_dir, "documents")
    return dedup_report_frame(docs, q_minhash_lsh_pairs(spark, sf_dir))


def _maintained_pairs(spark, sf_dir):
    """The standing verified-pair table for `sf_dir`'s documents,
    bootstrapping it on first touch. Production maintains this table via
    `incremental_dedup_run(..., pairs_path=...)` — one pair generation
    per daily delta; a registered (spark, sf_dir) query has no state
    argument, so the state dir is keyed by a fingerprint of the parquet
    input (path + mtime + size): a regenerated input gets a fresh state
    dir rather than stale pairs. The first call mines once with the
    registered LSH miner and commits gen=bootstrap; every later call —
    the steady state a daily report actually runs in — only READS the
    pair table, whose size scales with the duplicate population, not the
    corpus."""
    from janet_spark.dedup_incremental import (
        read_pairs_table,
        state_dir_for_input,
        write_pairs_generation,
    )

    pairs_path = state_dir_for_input(sf_dir, "documents.parquet", "pairs")
    pairs = read_pairs_table(spark, pairs_path)
    if pairs is None:
        write_pairs_generation(
            q_minhash_lsh_pairs(spark, sf_dir), pairs_path, "bootstrap"
        )
        pairs = read_pairs_table(spark, pairs_path)
    return pairs


def _maintained_exact_census(spark, sf_dir):
    """The standing (kk, source, n) exact-dup census for `sf_dir`'s
    documents, bootstrapping gen=bootstrap on first touch — the exact-dup
    counterpart of `_maintained_pairs`. Production appends one generation
    per daily delta via `incremental_exact_census_run`; the reader sums
    generations, so the table's read cost scales with the KEY population,
    never the corpus."""
    from janet_spark.dedup_incremental import (
        incremental_exact_census_run,
        read_exact_census,
        state_dir_for_input,
    )

    census_path = state_dir_for_input(sf_dir, "documents.parquet", "exact_census")
    census = read_exact_census(spark, census_path)
    if census is None:
        incremental_exact_census_run(
            t(spark, sf_dir, "documents"), census_path, "bootstrap"
        )
        census = read_exact_census(spark, census_path)
    return census


def q_dedup_report_incremental(spark, sf_dir):
    """The production daily duplication census: consumes the MAINTAINED
    pair generations (dedup_incremental.read_pairs_table) AND the
    maintained (kk, source, n) exact-dup census instead of re-mining LSH
    pairs or md5-scanning the corpus per invocation (round-4 verdict
    "What's wrong" #2) — the report becomes joins over two maintained
    tables plus ONE pruned (doc_id, source) projection of the corpus for
    the near-dup attribution; the text column is never read (plan-pinned
    in tests/test_round5_ops.py). Output is identical to `dedup_report`
    (same oracle) because the maintained tables hold exactly what the
    standalone miner/scanner produces — pinned on a two-generation corpus
    by tests/test_round4_ops.py (pairs) and tests/test_round5_ops.py
    (census)."""
    docs_idmap = t(spark, sf_dir, "documents").select("doc_id", "source")
    exact, base = _exact_dup_from_census(_maintained_exact_census(spark, sf_dir))
    near = _near_dup_docs_per_source(docs_idmap, _maintained_pairs(spark, sf_dir))
    return _assemble_dedup_report(base, exact, near)


def _dedup_report_oracle() -> str:
    pair_sql = ORACLE_NGRAM_JACCARD_PAIRS.replace("ORDER BY d1, d2", "")
    return f"""
WITH k AS (
  SELECT doc_id, source, md5(substr(text, 1, 24)) AS kk FROM documents
), dupk AS (
  SELECT kk FROM k GROUP BY kk HAVING count(*) > 1
), ex AS (
  SELECT source, count(*) AS exact_dup_docs
  FROM k WHERE kk IN (SELECT kk FROM dupk) GROUP BY source
), pairs AS ({pair_sql}),
nd AS (
  SELECT DISTINCT d FROM (
    SELECT d1 AS d FROM pairs UNION ALL SELECT d2 AS d FROM pairs
  )
), nr AS (
  SELECT d2.source, count(*) AS neardup_docs
  FROM nd JOIN documents d2 ON d2.doc_id = nd.d GROUP BY d2.source
), base AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
)
SELECT b.source, b.n_docs,
       cast(coalesce(ex.exact_dup_docs, 0) AS bigint) AS exact_dup_docs,
       round(coalesce(ex.exact_dup_docs, 0) / b.n_docs::double, 6)
         AS exact_dup_rate,
       cast(coalesce(nr.neardup_docs, 0) AS bigint) AS neardup_docs,
       round(coalesce(nr.neardup_docs, 0) / b.n_docs::double, 6) AS neardup_rate
FROM base b
LEFT JOIN ex ON ex.source = b.source
LEFT JOIN nr ON nr.source = b.source
ORDER BY b.source
"""


_NEG_SEED = "neg0"


def contrastive_pairs_frame(docs, pairs):
    """Shared triplet body: (anchor, positive, negative) where positives
    are the given verified near-dup `pairs` and negatives are
    SHUFFLE-ADJACENT: the document at seeded-md5 rank r+1 relative to
    the anchor's rank r (wrapping to rank 0). Deterministic in any
    engine, and crucially LAZY — no count() to learn the corpus size:
    the wrap row is a broadcast 1-row cross join of the rank-0 doc, and
    the rank itself is the same 256-block distributed ranking the shard
    writer uses (rank by (block, key) == rank by key since the block is
    a key prefix). Degenerate triplets (negative == anchor/positive)
    are dropped on both engines."""
    from janet_spark.shard_writer import shuffle_ranked

    docs = docs.select("doc_id")
    ranked = shuffle_ranked(
        docs, seed=_NEG_SEED, shard_size=1 << 40, key_col="doc_id"
    ).select("doc_id", "shuffle_rank")
    nbr = ranked.select(
        (F.col("shuffle_rank") - 1).alias("shuffle_rank"),
        F.col("doc_id").alias("neg_id"),
    )
    first = ranked.filter(F.col("shuffle_rank") == 0).select(
        F.col("doc_id").alias("wrap_id")
    )
    negatives = (
        ranked.join(nbr, "shuffle_rank", "left")
        .crossJoin(F.broadcast(first))
        .select(
            F.col("doc_id").alias("anchor_id"),
            F.coalesce("neg_id", "wrap_id").alias("negative_id"),
        )
    )
    return (
        pairs.select(
            F.col("d1").alias("anchor_id"),
            F.col("d2").alias("positive_id"),
            "jaccard",
        )
        .join(negatives, "anchor_id")
        .filter(
            (F.col("negative_id") != F.col("anchor_id"))
            & (F.col("negative_id") != F.col("positive_id"))
        )
        .select("anchor_id", "positive_id", "negative_id", "jaccard")
        .orderBy("anchor_id", "positive_id")
    )


def q_contrastive_pairs(spark, sf_dir):
    """Standalone triplet miner (SimCSE/E5 shape): re-mines the near-dup
    positives per invocation. Oracle harness / cold-start; the production
    form is `q_contrastive_pairs_incremental` over the maintained pair
    table."""
    docs = t(spark, sf_dir, "documents")
    return contrastive_pairs_frame(docs, q_minhash_lsh_pairs(spark, sf_dir))


def q_contrastive_pairs_incremental(spark, sf_dir):
    """Production triplet construction: positives come from the
    MAINTAINED pair generations (no per-run LSH mining); only the cheap
    distributed negative-ranking runs per invocation. Same output and
    oracle as `contrastive_pairs`."""
    docs = t(spark, sf_dir, "documents")
    return contrastive_pairs_frame(docs, _maintained_pairs(spark, sf_dir))


def _contrastive_pairs_oracle() -> str:
    pair_sql = ORACLE_NGRAM_JACCARD_PAIRS.replace("ORDER BY d1, d2", "")
    return f"""
WITH pairs AS ({pair_sql}),
r AS (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY md5('{_NEG_SEED}:' || cast(doc_id AS varchar))) - 1 AS rk
  FROM documents
),
nb AS (
  SELECT a.doc_id AS anchor_id, coalesce(b.doc_id, z.doc_id) AS negative_id
  FROM r a
  LEFT JOIN r b ON b.rk = a.rk + 1
  CROSS JOIN (SELECT doc_id FROM r WHERE rk = 0) z
)
SELECT p.d1 AS anchor_id, p.d2 AS positive_id, nb.negative_id, p.jaccard
FROM pairs p JOIN nb ON nb.anchor_id = p.d1
WHERE nb.negative_id != p.d1 AND nb.negative_id != p.d2
ORDER BY anchor_id, positive_id
"""


_SEMDECON_MOD = 13  # vec_id % 13 == 0 -> the held-out eval slice
_SEMDECON_THRESHOLD = 0.4  # same cosine bar as the embed near-dup family


def q_decontaminate_semantic(spark, sf_dir):
    """Embedding-space benchmark decontamination — the semantic
    complement of the 8-gram `decontaminate`: a training vector whose
    cosine against ANY eval vector clears the bar is flagged for
    removal (paraphrased eval leakage that n-gram overlap misses).

    Deployment shape mirrors `decontaminate` exactly: the eval slice is
    SMALL by construction (benchmarks are thousands of rows, the corpus
    is billions), so the normalized eval matrix broadcasts and the scan
    side does one per-partition numpy GEMM — only flagged rows survive
    to the output, which is the removal list. Nearest eval vector is
    picked on the ROUNDED similarity with min-eval_id tie-break (the
    eval matrix is sorted by id and argmax takes the first maximum), so
    the DuckDB oracle's (sim DESC, eval_id ASC) ranking reproduces it."""
    emb = t(spark, sf_dir, "embeddings")
    is_eval = F.col("vec_id") % _SEMDECON_MOD == 0
    eval_rows = (
        emb.filter(is_eval).select("vec_id", "embedding").orderBy("vec_id").collect()
    )
    e_ids = np.array([r["vec_id"] for r in eval_rows])
    e_mat = np.array([r["embedding"] for r in eval_rows], dtype=np.float64)
    e_norm = e_mat / np.linalg.norm(e_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((e_ids, e_norm))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, en = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(list(pdf["embedding"]), dtype=np.float64)
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = np.round(mn @ en.T, 4)  # (n, e); round BEFORE argmax
            best = sims.argmax(axis=1)  # first max = min eval_id on ties
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "eval_id": ids[best],
                    "sim": sims[np.arange(len(best)), best],
                }
            )

    flagged = emb.filter(~is_eval).mapInPandas(
        run, schema="vec_id long, eval_id long, sim double"
    )
    return flagged.filter(F.col("sim") >= _SEMDECON_THRESHOLD).orderBy("vec_id")


ORACLE_DECONTAMINATE_SEMANTIC = f"""
WITH ev AS (
  SELECT vec_id AS eval_id, embedding::DOUBLE[] AS ee
  FROM embeddings WHERE vec_id % {_SEMDECON_MOD} = 0
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS ce
  FROM embeddings WHERE vec_id % {_SEMDECON_MOD} != 0
), sims AS (
  SELECT c.vec_id, ev.eval_id,
         round(list_cosine_similarity(c.ce, ev.ee), 4) AS sim
  FROM c CROSS JOIN ev
), best AS (
  SELECT vec_id, eval_id, sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, eval_id ASC) AS rn
  FROM sims
)
SELECT vec_id, eval_id, sim FROM best
WHERE rn = 1 AND sim >= {_SEMDECON_THRESHOLD}
ORDER BY vec_id
"""


# Per-task row target: bounds the in-memory GEMM of one chunk-pair task at
# ~2*2048 embeddings (a few MB + a 4096^2 sim matrix ~= 134 MB float64 —
# comfortably inside an executor). Blocks below this size take the original
# single-group path with zero extra cost.
_NEARDUP_CHUNK = 2048


def q_embed_neardup_blocked(spark, sf_dir, chunk_rows=_NEARDUP_CHUNK):
    """Embedding-cosine near-dup pairs with IVF-style blocking on `label`
    (the coarse cell), with a per-task row cap: blocks larger than
    `chunk_rows` are triangle-partitioned — each row hashes to one of
    k = ceil(b / chunk_rows) chunks, and each chunk pair (ci <= cj)
    becomes its own applyInPandas group of ~2*chunk_rows rows. A hot label
    with b rows therefore costs O((b/C)^2) bounded tasks instead of one
    O(b^2) task that OOMs an executor; every pair is still computed exactly
    once ((ci,cj) covers the triangle), so the output is bit-identical to
    the unbounded all-pairs oracle.

    Chunk assignment is pmod(xxhash64(vec_id), k) — NOT row_number — so no
    per-block sort is ever planned (a window row_number would sort the
    whole table within labels); the bound is probabilistic (multinomial
    chunk sizes concentrate within a few percent of C for C >= a few
    hundred), which is the same guarantee hash-salting gives everywhere
    else in this engine. The per-label census is a map-side-combinable agg
    broadcast back onto the scan (one tiny table: one row per label), so
    the big table shuffles exactly once — on the (label, chunk-pair) group
    key, same as the unchunked version."""
    emb = t(spark, sf_dir, "embeddings").select("label", "vec_id", "embedding")
    return _blocked_cosine_pairs(emb, chunk_rows, block_type="int")


def _blocked_cosine_pairs(
    emb: DataFrame,
    chunk_rows: int = _NEARDUP_CHUNK,
    block_type: str = "int",
    threshold: float = 0.4,
) -> DataFrame:
    """The triangle-chunked within-block cosine-pair kernel over any
    (label, vec_id, embedding) frame — shared by the label-blocked query
    and the semdedup composition (whose blocks are COMPUTED k-means
    clusters), so the hot-block bounding logic can never fork."""
    sizes = emb.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))
    chunked = (
        emb.join(F.broadcast(sizes), "label")
        .withColumn("k", F.ceil(F.col("cnt") / chunk_rows).cast("int"))
        .withColumn(
            "chunk", F.pmod(F.xxhash64("vec_id"), F.col("k").cast("long")).cast("int")
        )
    )
    # each row joins every chunk-pair group it participates in: as the
    # lower chunk for (chunk, j>=chunk), as the upper for (i<=chunk, chunk)
    exploded = chunked.select(
        "label",
        "vec_id",
        "embedding",
        "chunk",
        F.explode(
            F.array_union(
                F.expr("transform(sequence(chunk, k - 1), j -> struct(chunk AS ci, j AS cj))"),
                F.expr("transform(sequence(0, chunk), i -> struct(i AS ci, chunk AS cj))"),
            )
        ).alias("g"),
    )

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.array(list(pdf["embedding"]), dtype=np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        ids = pdf["vec_id"].to_numpy()
        ci = int(pdf["g"].iloc[0]["ci"])
        cj = int(pdf["g"].iloc[0]["cj"])
        if ci == cj:
            sims = mn @ mn.T
            iu = np.triu_indices(len(ids), k=1)
            s = np.round(sims[iu], 4)
            a_ids, b_ids = ids[iu[0]], ids[iu[1]]
        else:
            left = pdf["chunk"].to_numpy() == ci
            sims = mn[left] @ mn[~left].T
            s = np.round(sims.reshape(-1), 4)
            a_ids = np.repeat(ids[left], (~left).sum())
            b_ids = np.tile(ids[~left], left.sum())
        keep = s >= threshold
        return pd.DataFrame(
            {
                "label": pdf["label"].iloc[0],
                "v1": np.minimum(a_ids[keep], b_ids[keep]),
                "v2": np.maximum(a_ids[keep], b_ids[keep]),
                "sim": s[keep],
            }
        )

    return (
        exploded.groupBy("label", "g")
        .applyInPandas(
            pairs, schema=f"label {block_type}, v1 long, v2 long, sim double"
        )
        .orderBy("label", "v1", "v2")
    )


ORACLE_EMBED_NEARDUP_BLOCKED = """
SELECT a.label AS label, least(a.vec_id, b.vec_id) AS v1,
       greatest(a.vec_id, b.vec_id) AS v2,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.4
ORDER BY label, v1, v2
"""


# deterministic "arrived since the last run" stand-in for the embedding
# modality, mirroring _DELTA_MOD / _CONV_DELTA_MOD so the oracle is a
# one-line predicate
_EMB_DELTA_MOD = 5


def q_incremental_embed_neardup(spark, sf_dir, chunk_rows=_NEARDUP_CHUNK):
    """Daily-delta embedding near-dup: mine only the cosine pairs touching
    today's new vectors — the embedding-modality counterpart of
    `incremental_neardup` (n-gram) and `incremental_conv_neardup`
    (conversation). Within each label block, two bounded GEMM families:

    * new x old — the label's delta vectors replicate to each of the
      block's k hash chunks (bounded fan-out: |delta_label| x k rows) and
      each (label, chunk) task GEMMs delta against ONLY that chunk's old
      rows, so an old vector is paired exactly once and no task exceeds
      ~|delta_label| + chunk_rows rows;
    * new x new — one triangle GEMM per label over just the delta rows.

    Old x old pairs are structurally impossible: old vectors never meet
    outside their own chunk and the kernel only crosses sides. In
    production the old side reads a maintained (label, vec_id, embedding)
    table and the census comes from its metadata; here the registered
    query derives the split from vec_id % {mod} so the DuckDB oracle is
    the all-pairs SQL with a delta-touch predicate."""
    emb = t(spark, sf_dir, "embeddings").select("label", "vec_id", "embedding")
    is_new = F.col("vec_id") % _EMB_DELTA_MOD == 0
    sizes = emb.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))
    with_k = F.ceil(F.col("cnt") / chunk_rows).cast("int").alias("k")
    old = (
        emb.filter(~is_new)
        .join(F.broadcast(sizes), "label")
        .select(
            "label",
            "vec_id",
            "embedding",
            F.pmod(F.xxhash64("vec_id"), with_k.cast("long")).cast("int").alias("chunk"),
            F.lit(False).alias("is_new"),
        )
    )
    delta = emb.filter(is_new)
    delta_rep = (
        delta.join(F.broadcast(sizes), "label")
        .select(
            "label",
            "vec_id",
            "embedding",
            F.explode(F.sequence(F.lit(0), with_k - 1)).alias("chunk"),
            F.lit(True).alias("is_new"),
        )
    )

    def cross_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        new_mask = pdf["is_new"].to_numpy()
        empty = pd.DataFrame(
            {"label": pd.Series(dtype="int64"), "v1": pd.Series(dtype="int64"),
             "v2": pd.Series(dtype="int64"), "sim": pd.Series(dtype="float64")}
        )
        if not new_mask.any() or new_mask.all():
            return empty
        m = np.array(list(pdf["embedding"]), dtype=np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        ids = pdf["vec_id"].to_numpy()
        sims = np.round(mn[new_mask] @ mn[~new_mask].T, 4)
        s = sims.reshape(-1)
        a_ids = np.repeat(ids[new_mask], (~new_mask).sum())
        b_ids = np.tile(ids[~new_mask], new_mask.sum())
        keep = s >= 0.4
        return pd.DataFrame(
            {
                "label": pdf["label"].iloc[0],
                "v1": np.minimum(a_ids[keep], b_ids[keep]),
                "v2": np.maximum(a_ids[keep], b_ids[keep]),
                "sim": s[keep],
            }
        )

    cross = (
        old.unionByName(delta_rep)
        .groupBy("label", "chunk")
        .applyInPandas(cross_pairs, schema="label int, v1 long, v2 long, sim double")
    )

    def tri_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.array(list(pdf["embedding"]), dtype=np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        ids = pdf["vec_id"].to_numpy()
        iu = np.triu_indices(len(ids), k=1)
        s = np.round((mn @ mn.T)[iu], 4)
        keep = s >= 0.4
        a_ids, b_ids = ids[iu[0]][keep], ids[iu[1]][keep]
        return pd.DataFrame(
            {
                "label": pdf["label"].iloc[0],
                "v1": np.minimum(a_ids, b_ids),
                "v2": np.maximum(a_ids, b_ids),
                "sim": s[keep],
            }
        )

    nn = delta.groupBy("label").applyInPandas(
        tri_pairs, schema="label int, v1 long, v2 long, sim double"
    )
    return cross.unionByName(nn).orderBy("label", "v1", "v2")


ORACLE_INCREMENTAL_EMBED_NEARDUP = f"""
SELECT a.label AS label, least(a.vec_id, b.vec_id) AS v1,
       greatest(a.vec_id, b.vec_id) AS v2,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.4
  AND (a.vec_id % {_EMB_DELTA_MOD} = 0 OR b.vec_id % {_EMB_DELTA_MOD} = 0)
ORDER BY label, v1, v2
"""


# ---------------------------------------------------------------------------
# fingerprinting / keyword matching
# ---------------------------------------------------------------------------


def q_doc_fingerprint(spark, sf_dir):
    """Winnowing-style document fingerprint: min md5 over the document's
    word shingles, Arrow-batched with C-speed hashlib over slices of one
    cached word list. Routed Python-side on MEASURED evidence (the same
    A/B pattern as the canonicalizer and MinHash signatures): the JVM
    expression variant below allocates a UTF8String per shingle in
    array_join and ran 2.5x slower warm at sf0.1 on 32 cores (1.57 s vs
    0.63 s, value-identical). Hex md5 min compares identically in both
    engines (lowercase hex, lexicographic). NULL text propagates to a
    NULL fingerprint, matching the oracle's string_split(NULL) and the
    JVM twin's split(NULL) — all three variants NULL-agree."""
    import hashlib

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    k = _SHINGLE_WORDS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    out.append((int(doc_id), None))
                    continue
                w = text.split(" ")
                if len(w) < k:
                    shingles = [" ".join(w)]
                else:
                    shingles = (
                        " ".join(w[i : i + k]) for i in range(len(w) - k + 1)
                    )
                out.append(
                    (
                        int(doc_id),
                        min(hashlib.md5(s.encode()).hexdigest() for s in shingles),
                    )
                )
            yield pd.DataFrame(out, columns=["doc_id", "fingerprint"])

    return docs.mapInPandas(run, schema="doc_id long, fingerprint string").orderBy(
        "doc_id"
    )


def q_doc_fingerprint_jvm(spark, sf_dir):
    """The SAME fingerprint as one whole-stage-codegen expression (no
    explode, no Python) — the JVM side of the A/B above, kept registered
    against the same oracle so the routing decision stays re-measurable."""
    docs = t(spark, sf_dir, "documents")
    wdocs = _word_docs(docs, coalesce_null=False)
    words = F.col("__words")
    n = F.greatest(F.size(words) - (_SHINGLE_WORDS - 1), F.lit(1))
    fp = F.array_min(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.md5(F.array_join(F.slice(words, i, _SHINGLE_WORDS), " ")),
        )
    )
    return wdocs.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


ORACLE_DOC_FINGERPRINT = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
SELECT doc_id,
       list_min(list_transform(
         range(1, greatest(len(words) - {_SHINGLE_WORDS - 1}, 1) + 1),
         i -> md5(array_to_string(list_slice(words, i, i + {_SHINGLE_WORDS - 1}), ' '))
       )) AS fingerprint
FROM w ORDER BY doc_id
"""


def q_keyword_match_count(spark, sf_dir):
    """T3 global scan, SQL-expressible projection: per-doc match count and
    first-match position for the literal keyword 'merge sort'."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(text, 'merge sort', 0)")).alias("n_matches"),
        F.locate("merge sort", F.col("text")).alias("first_pos"),
    ).orderBy("doc_id")


ORACLE_KEYWORD_MATCH_COUNT = """
SELECT doc_id, len(regexp_extract_all(text, 'merge sort')) AS n_matches,
       strpos(text, 'merge sort') AS first_pos
FROM documents ORDER BY doc_id
"""


def q_keyword_spans(spark, sf_dir):
    """Full char-offset matches over derived transcripts (T3-T5 + W2).
    The oracle recomputes every offset independently with a DuckDB position
    scan ('data' has no prefix/suffix self-overlap, so non-overlapping regex
    matches == all occurrences); whole-words/escape quirks are pinned by
    pytest."""
    tr = derived_transcripts(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pattern = normalize_keyword("data", match_case=False, whole_words=False)
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"].fillna("")
            ):
                for idx, s, e in find_matches(text, pattern, False):
                    rows.append((conv_id, int(turn_idx), idx, s, e))
            yield pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "match_idx", "start", "end_off"]
            )

    return tr.mapInPandas(
        run,
        schema="conv_id string, turn_idx int, match_idx int, start int, end_off int",
    ).orderBy("conv_id", "turn_idx", "match_idx")


ORACLE_KEYWORD_SPANS = f"""
{_TRANSCRIPTS_CTE},
pos AS (
  SELECT conv_id, turn_idx, text,
         unnest(range(0, greatest(len(text) - 3, 0))) AS i
  FROM transcripts
), hits AS (
  SELECT conv_id, turn_idx, cast(i AS int) AS "start"
  FROM pos WHERE lower(substring(text, cast(i AS int) + 1, 4)) = 'data'
)
SELECT conv_id, turn_idx,
       cast(row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY "start")
            - 1 AS int) AS match_idx,
       "start", "start" + 4 AS end_off
FROM hits ORDER BY conv_id, turn_idx, match_idx
"""


# ---------------------------------------------------------------------------
# rename + metadata UDFs with injected golden content
# ---------------------------------------------------------------------------

# PREPENDED (not appended): suggest_name truncates content to 10,000
# chars mirroring the reference's LLM-input cap, so a trailing marker
# would silently fall outside the window on long documents
_INJECT = "FEBRUARY 25, 2024 TRAVELERS Notice of Cancellation 612266004 "
_SPARK_CONTENT = (
    f"CASE WHEN doc_id % 3 = 0 THEN concat('{_INJECT}', text) ELSE text END"
)
_DUCK_EXPECTED_NAME = (
    "CASE WHEN doc_id % 3 = 0 "
    "THEN '2024-02-25 Travelers - Notice of Cancellation 612266004.pdf' "
    "ELSE 'doc-' || doc_id || '.pdf' END"
)


def q_rename_suggest(spark, sf_dir):
    """T11/X1 rename rules as a total-function UDF: docs with recognizable
    (date, org) content get the canonical name; others keep their original
    name. The oracle encodes the expected rule outcome independently."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("doc-"), F.col("doc_id"), F.lit(".pdf")).alias("orig"),
        F.expr(_SPARK_CONTENT).alias("content"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "suggested_name": [
                        suggest_name(o, c) for o, c in zip(pdf["orig"], pdf["content"])
                    ],
                }
            )

    return docs.mapInPandas(run, schema="doc_id long, suggested_name string").orderBy(
        "doc_id"
    )


ORACLE_RENAME_SUGGEST = f"""
SELECT doc_id, {_DUCK_EXPECTED_NAME} AS suggested_name
FROM documents ORDER BY doc_id
"""


def q_metadata_extract(spark, sf_dir):
    """X7 metadata extraction as deterministic rules; oracle encodes the
    expected struct fields per the injection rule."""
    from janet_spark.extract.metadata import extract_metadata

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_SPARK_CONTENT).alias("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mds = [extract_metadata(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "issuing_org": [m["issuingOrganization"] for m in mds],
                    "primary_date": [m["primaryDate"] for m in mds],
                    "doc_type": [m["documentType"] for m in mds],
                    "n_amounts": pd.Series(
                        [len(m["monetaryAmounts"]) for m in mds], dtype="int32"
                    ),
                }
            )

    return docs.mapInPandas(
        run,
        schema="doc_id long, issuing_org string, primary_date string, doc_type string, n_amounts int",
    ).orderBy("doc_id")


ORACLE_METADATA_EXTRACT = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'Travelers' END AS issuing_org,
       CASE WHEN doc_id % 3 = 0 THEN '2024-02-25' END AS primary_date,
       CASE WHEN doc_id % 3 = 0 THEN 'Notice of Cancellation' END AS doc_type,
       0 AS n_amounts
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# language ID + multimodal plumbing
# ---------------------------------------------------------------------------


def q_lang_id(spark, sf_dir):
    """Heuristic language identification (stopword/CJK profiles), vectorized
    over Arrow batches; the DuckDB oracle below recomputes the CJK-ratio
    branch, the stopword arg-max, and the lexicographic-desc tie-break
    independently in SQL, so every detected code is value-checked."""
    from janet_spark.textops import lang_id_iter

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(
        lang_id_iter, schema="doc_id long, detected_lang string"
    ).orderBy("doc_id")


def _lang_oracle_sql() -> str:
    """Render textops.detect_lang as DuckDB SQL from the same profile table
    (single source of truth — editing _PROFILES keeps the oracle in lockstep).

    Mirrors the Python exactly: empty -> 'und'; CJK ratio > 0.05 -> 'zh';
    tokenized with the same char class THEN lowercased (uppercase accented
    letters are intentionally outside the class, as in textops._WORD);
    arg-max over stopword hit counts with ties to the lexicographically
    LARGEST lang code (Python max() over (score, key) tuples)."""
    from janet_spark.textops import _PROFILES

    # the CASE ladder below hard-codes the lexicographic-desc order of these
    # four codes; fail loudly if the profile table ever changes shape
    assert set(_PROFILES) == {"en", "de", "fr", "es"}, sorted(_PROFILES)

    def score(lang: str) -> str:
        lst = "[" + ",".join(f"'{w}'" for w in sorted(_PROFILES[lang])) + "]"
        return f"len(list_filter(words, w -> list_contains({lst}, w))) AS s_{lang}"

    scores = ",\n         ".join(score(lang) for lang in _PROFILES)
    best = "greatest(s_en, s_de, s_fr, s_es)"
    return f"""
WITH base AS (
  SELECT doc_id,
         text,
         length(regexp_replace(coalesce(text,''), '[^一-鿿㐀-䶿]', '', 'g'))
           AS n_cjk,
         list_transform(
           regexp_extract_all(coalesce(text,''), '[a-zA-Zäöüßéèêàçñáíóú]+'),
           w -> lower(w)) AS words
  FROM documents
), scored AS (
  SELECT doc_id, text, n_cjk, words,
         {scores}
  FROM base
)
SELECT doc_id,
       CASE
         WHEN text IS NULL OR text = '' THEN 'und'
         WHEN n_cjk > 0 AND n_cjk / greatest(length(text), 1) > 0.05 THEN 'zh'
         WHEN len(words) = 0 THEN 'und'
         WHEN {best} = 0 THEN 'und'
         WHEN s_fr = {best} THEN 'fr'
         WHEN s_es = {best} THEN 'es'
         WHEN s_en = {best} THEN 'en'
         ELSE 'de'
       END AS detected_lang
FROM scored ORDER BY doc_id
"""


ORACLE_LANG_ID = _lang_oracle_sql()


def q_multimodal_probe(spark, sf_dir):
    """Binary-column plumbing: opaque payload + typed metadata; byte length
    survives the Arrow round trip (decode itself is stubbed; see
    janet_spark/multimodal.py)."""
    from janet_spark.multimodal import extract_features, synth_assets

    assets = synth_assets(spark, sf_dir)
    return extract_features(assets).select("asset_id", "kind", "n_bytes").orderBy(
        "asset_id"
    )


ORACLE_MULTIMODAL_PROBE = """
SELECT doc_id AS asset_id,
       (['image','audio','video'])[cast(doc_id % 3 AS int) + 1] AS kind,
       octet_length(encode(text)) AS n_bytes
FROM documents ORDER BY asset_id
"""


def q_multimodal_features(spark, sf_dir):
    from janet_spark.multimodal import extract_features, synth_assets

    assets = synth_assets(spark, sf_dir)
    return extract_features(assets).select("asset_id", "feat_norm").orderBy("asset_id")


def _duck_u16(h: str, off: int) -> str:
    """DuckDB expression: big-endian uint16 from 4 hex chars of `h` at
    1-based offset `off` (recomputes the fake decode independently)."""
    nib = "strpos('0123456789abcdef', substr({h}, {o}, 1)) - 1"
    return " + ".join(
        f"({nib.format(h=h, o=off + i)}) * {16 ** (3 - i)}" for i in range(4)
    )


# the deterministic fake decode is sha256(payload) -> 16 big-endian uint16s
# / 65536 (multimodal.decode_payload); documents text is pure ASCII, so
# DuckDB's VARCHAR sha256 hashes the same bytes as Python's utf-8 encode.
_FEAT_SQ_TERMS = " + ".join(
    f"pow(({_duck_u16('h', 4 * i + 1)}) / 65536.0, 2)" for i in range(16)
)
_FEAT_SUM_TERMS = " + ".join(
    f"({_duck_u16('h', 4 * i + 1)}) / 65536.0" for i in range(16)
)

ORACLE_MULTIMODAL_FEATURES = f"""
WITH x AS (SELECT doc_id, lower(sha256(text)) AS h FROM documents)
SELECT doc_id AS asset_id, round(sqrt({_FEAT_SQ_TERMS}), 4) AS feat_norm
FROM x ORDER BY asset_id
"""


def q_frame_sample(spark, sf_dir):
    from janet_spark.multimodal import sample_frames, synth_assets

    assets = synth_assets(spark, sf_dir)
    return sample_frames(assets).orderBy("asset_id", "frame_idx")


ORACLE_FRAME_SAMPLE = f"""
WITH v AS (
  SELECT doc_id, text, greatest(length(text) // 4, 1) AS n
  FROM documents WHERE doc_id % 3 = 2
), fr AS (
  SELECT doc_id, unnest(range(0, 4)) AS frame_idx, text, n FROM v
), h AS (
  SELECT doc_id, cast(frame_idx AS int) AS frame_idx,
         lower(sha256(substr(text, cast(frame_idx * n + 1 AS int), cast(n AS int)))) AS h
  FROM fr
)
SELECT doc_id AS asset_id, frame_idx,
       round(({_FEAT_SUM_TERMS}) / 16.0, 6) AS frame_feat_mean
FROM h ORDER BY asset_id, frame_idx
"""


_DSIR_BUCKETS = 256  # hashed-ngram feature dimensionality (DSIR uses 10^4;
# 256 keeps the oracle's per-bucket arithmetic renderable while exercising
# the identical collision-tolerant estimator)
_DSIR_SELECT_K = 100  # resample size for dsir_select


def _dsir_feature_occurrences(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket) — one row per hashed-ngram feature OCCURRENCE.

    DSIR's feature map (Xie et al. 2023 §3, "Data Selection for Language
    Models via Importance Resampling"): word unigrams + word bigrams,
    hashed into a fixed bucket space. The hash is md5-prefix → int so
    Spark and DuckDB bucket identically (the engine-portable idiom used
    by hash_sample). Narrow explode — no shuffle until the bucket
    aggregates."""
    ws = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    base = docs.select("doc_id", "lang", ws.alias("ws"))
    uni = base.select("doc_id", "lang", F.explode("ws").alias("feat"))
    # sequence(0, size-2) DESCENDS when size < 2 — guard with when()
    big = base.select(
        "doc_id",
        "lang",
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.expr(
                    "transform(sequence(0, size(ws) - 2),"
                    " i -> concat(ws[i], ' ', ws[i + 1]))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("feat"),
    )
    bucket = F.conv(F.substring(F.md5("feat"), 1, 2), 16, 10).cast("int")
    return (
        uni.unionByName(big)
        .filter(F.col("feat") != "")
        .select("doc_id", "lang", bucket.alias("bucket"))
    )


def dsir_importance_frame(docs: DataFrame) -> DataFrame:
    """Per-document DSIR importance weight: log2 likelihood ratio of the
    doc's hashed-ngram bag under the TARGET distribution (here: the
    corpus's own lang='en' slice, standing in for the paper's
    Wikipedia+books target) vs the RAW distribution (the whole corpus),
    both add-1 smoothed over the bucket space.

    log w(doc) = Σ_occurrences log2( (ct[b]+1)·(R+B) / ((cr[b]+1)·(T+B)) )

    with ct/cr the target/raw bucket counts and T/R their totals — exact
    integer products divided as doubles, so both engines round the same
    4-decimal value (the lm_score parity recipe).

    Scale shape: the classifier IS the ≤256-row ratio table — two
    map-side-combinable bucket aggregates over the occurrence stream,
    then a broadcast join back and one per-doc combinable sum. Raw text
    shuffles nowhere; the only doc-grain shuffle is the final groupBy
    doc_id. At 100 TB the ratio table is still ≤B rows: this is the
    pattern's whole point — the importance model never grows with the
    corpus."""
    occ = _dsir_feature_occurrences(docs)
    from janet_spark.dedup_incremental import dsir_counts_of

    return _dsir_score(occ, _dsir_ratio_from_counts(dsir_counts_of(occ)))


def _dsir_ratio_from_counts(counts: DataFrame) -> DataFrame:
    """(bucket, lr) from the classifier's sufficient statistics — shared
    by the standalone (counts built inline) and maintained (counts summed
    from committed generations) forms, so the two can never diverge on
    the estimator."""
    tot = counts.agg(F.sum("cr").alias("r_tot"), F.sum("ct").alias("t_tot"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.log2(
            (
                (F.col("ct") + F.lit(1)) * (F.col("r_tot") + F.lit(_DSIR_BUCKETS))
            ).cast("double")
            / (
                (F.col("cr") + F.lit(1)) * (F.col("t_tot") + F.lit(_DSIR_BUCKETS))
            ).cast("double")
        ).alias("lr"),
    )


def _dsir_score(occ: DataFrame, ratio: DataFrame) -> DataFrame:
    return (
        occ.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("lr"), 4).alias("dsir_logw"),
        )
        .select("doc_id", "lang", "n_feats", "dsir_logw")
    )


def q_dsir_importance(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return dsir_importance_frame(docs).orderBy("doc_id")


def _maintained_dsir_counts(spark, sf_dir) -> DataFrame:
    """The standing (bucket, ct, cr) DSIR classifier for `sf_dir`'s
    documents, bootstrapping on first touch with the same two-day split
    every incremental query uses (history = even doc_ids as
    gen=bootstrap, delta = odd as gen=delta-day2). Production appends one
    generation per crawl day via `incremental_dsir_counts_run`; the read
    sums generations into a ≤ bucket-space table, so the daily scorer
    never re-featurizes the corpus."""
    import os

    from janet_spark.dedup_incremental import (
        _live_generation_dirs,
        incremental_dsir_counts_run,
        read_dsir_counts,
        state_dir_for_input,
    )

    counts_path = state_dir_for_input(sf_dir, "documents.parquet", "dsir_counts")
    # each generation checked individually (the ann_ivf_topk_indexed_delta
    # pattern): a crash between the two bootstrap commits must not leave a
    # half-classifier that a bare is-None check would read as complete.
    # But backfill ONLY while the state is pure-bootstrap-shaped: after a
    # compaction the halves live under gen=compacted-* and re-writing
    # them would double the sum-merged counts.
    live = {os.path.basename(d) for d in _live_generation_dirs(counts_path)}
    if live <= {"gen=bootstrap", "gen=delta-day2"}:
        docs = t(spark, sf_dir, "documents")
        if "gen=bootstrap" not in live:
            occ_hist = _dsir_feature_occurrences(
                docs.filter(F.col("doc_id") % 2 == 0)
            )
            incremental_dsir_counts_run(occ_hist, counts_path, "bootstrap")
        if "gen=delta-day2" not in live:
            occ_delta = _dsir_feature_occurrences(
                docs.filter(F.col("doc_id") % 2 == 1)
            )
            incremental_dsir_counts_run(occ_delta, counts_path, "delta-day2")
    return read_dsir_counts(spark, counts_path)


def q_dsir_importance_incremental(spark, sf_dir):
    """Maintained form of `q_dsir_importance`: score TODAY'S delta (odd
    doc_ids) against the classifier summed from committed count
    generations instead of re-featurizing the whole corpus per run —
    the shape a daily crawl scorer actually has. The generation sum
    equals the full-corpus counts (deltas partition occurrences by
    doc_id), so delta scores are identical to the standalone query's —
    one oracle serves both, restricted to the delta."""
    docs = t(spark, sf_dir, "documents")
    counts = _maintained_dsir_counts(spark, sf_dir)
    occ = _dsir_feature_occurrences(docs.filter(F.col("doc_id") % 2 == 1))
    return _dsir_score(occ, _dsir_ratio_from_counts(counts)).orderBy("doc_id")


def q_dsir_select(spark, sf_dir):
    """The resample step: keep the top-K documents by importance weight.
    DSIR proper adds Gumbel noise before the top-k; the deterministic
    variant (weight desc, doc_id tie-break) is the auditable form — same
    selection in any engine, any partitioning. Spark executes
    orderBy+limit as TakeOrderedAndProject: each task keeps K rows, the
    driver merges — no global sort of the doc-grain table, which is what
    makes the selection scale-safe at 10^9 docs."""
    docs = t(spark, sf_dir, "documents")
    return (
        dsir_importance_frame(docs)
        .orderBy(F.desc("dsir_logw"), "doc_id")
        .limit(_DSIR_SELECT_K)
    )


_DSIR_CTE = f"""
WITH ws AS (
  SELECT doc_id, lang, string_split(coalesce(text, ''), ' ') AS w FROM documents
), feats AS (
  SELECT doc_id, lang, unnest(w) AS feat FROM ws
  UNION ALL
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i + 1])) AS feat
  FROM ws
), occ AS (
  SELECT doc_id, lang,
         (strpos('0123456789abcdef', substr(md5(feat), 1, 1)) - 1) * 16
         + strpos('0123456789abcdef', substr(md5(feat), 2, 1)) - 1 AS bucket
  FROM feats WHERE feat <> ''
), raw AS (
  SELECT bucket, count(*) AS cr FROM occ GROUP BY bucket
), tgt AS (
  SELECT bucket, count(*) AS ct FROM occ WHERE lang = 'en' GROUP BY bucket
), tot AS (
  SELECT (SELECT sum(cr) FROM raw) AS r_tot, (SELECT sum(ct) FROM tgt) AS t_tot
), ratio AS (
  SELECT raw.bucket,
         log2(cast((coalesce(tgt.ct, 0) + 1) * (tot.r_tot + {_DSIR_BUCKETS})
                   AS double)
              / cast((raw.cr + 1) * (tot.t_tot + {_DSIR_BUCKETS}) AS double))
           AS lr
  FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket, tot
), w AS (
  SELECT occ.doc_id, occ.lang, count(*) AS n_feats,
         round(sum(ratio.lr), 4) AS dsir_logw
  FROM occ JOIN ratio ON occ.bucket = ratio.bucket
  GROUP BY occ.doc_id, occ.lang
)
"""

ORACLE_DSIR_IMPORTANCE = f"""
{_DSIR_CTE}
SELECT doc_id, lang, n_feats, dsir_logw FROM w ORDER BY doc_id
"""

ORACLE_DSIR_SELECT = f"""
{_DSIR_CTE}
SELECT doc_id, lang, n_feats, dsir_logw FROM w
ORDER BY dsir_logw DESC, doc_id LIMIT {_DSIR_SELECT_K}
"""

# the maintained form scores the delta with the full-corpus classifier, so
# the standalone CTE restricted to delta docs IS its independent oracle
ORACLE_DSIR_IMPORTANCE_INCREMENTAL = f"""
{_DSIR_CTE}
SELECT doc_id, lang, n_feats, dsir_logw FROM w
WHERE doc_id % 2 = 1 ORDER BY doc_id
"""


TEXT_QUERIES = {
    "extract_turns": (q_extract_turns, ORACLE_EXTRACT_TURNS),
    "reassemble_convs": (q_reassemble_convs, ORACLE_REASSEMBLE_CONVS),
    "clean_canonicalize": (q_clean_canonicalize, ORACLE_CLEAN_CANONICALIZE),
    "clean_canonicalize_jvm": (q_clean_canonicalize_jvm, ORACLE_CLEAN_CANONICALIZE),
    "html_strip": (q_html_strip, ORACLE_HTML_STRIP),
    "token_counts": (q_token_counts, ORACLE_TOKEN_COUNTS),
    "token_counts_bpe": (q_token_counts_bpe, ORACLE_TOKEN_COUNTS_BPE),
    "token_counts_bpe_jvm": (q_token_counts_bpe_jvm, ORACLE_TOKEN_COUNTS_BPE),
    "token_counts_bpe_1k": (q_token_counts_bpe_1k, _token_counts_bpe_1k_oracle()),
    "quality_scores": (q_quality_scores, ORACLE_QUALITY_SCORES),
    "quality_repetition": (q_quality_repetition, ORACLE_QUALITY_REPETITION),
    "exact_dedup": (q_exact_dedup, ORACLE_EXACT_DEDUP),
    "chunk_dedup": (q_chunk_dedup, ORACLE_CHUNK_DEDUP),
    "substring_dedup": (q_substring_dedup, ORACLE_SUBSTRING_DEDUP),
    "line_dedup_corpus": (q_line_dedup_corpus, ORACLE_LINE_DEDUP_CORPUS),
    "line_dedup_corpus_incremental": (
        q_line_dedup_corpus_incremental,
        ORACLE_LINE_DEDUP_CORPUS,
    ),
    "unicode_clean": (q_unicode_clean, ORACLE_UNICODE_CLEAN),
    "decontaminate": (q_decontaminate, ORACLE_DECONTAMINATE),
    "lm_score": (q_lm_score, ORACLE_LM_SCORE),
    "dsir_importance": (q_dsir_importance, ORACLE_DSIR_IMPORTANCE),
    "dsir_importance_incremental": (
        q_dsir_importance_incremental,
        ORACLE_DSIR_IMPORTANCE_INCREMENTAL,
    ),
    "dsir_select": (q_dsir_select, ORACLE_DSIR_SELECT),
    "sequence_pack": (q_sequence_pack, ORACLE_SEQUENCE_PACK),
    "pack_examples": (q_pack_examples, _pack_examples_oracle()),
    "curation_pipeline_v2": (q_curation_pipeline_v2, ORACLE_CURATION_PIPELINE_V2),
    "mixture_weights": (q_mixture_weights, ORACLE_MIXTURE_WEIGHTS),
    "apply_mixture": (q_apply_mixture, ORACLE_APPLY_MIXTURE),
    "doc_chunk": (q_doc_chunk, ORACLE_DOC_CHUNK),
    "bpe_pair_census": (q_bpe_pair_census, ORACLE_BPE_PAIR_CENSUS),
    "bigram_lm": (q_bigram_lm, ORACLE_BIGRAM_LM),
    "corpus_report": (q_corpus_report, ORACLE_CORPUS_REPORT),
    "quality_features": (q_quality_features, _quality_features_oracle()),
    "decontaminate_semantic": (q_decontaminate_semantic, ORACLE_DECONTAMINATE_SEMANTIC),
    "contrastive_pairs": (q_contrastive_pairs, _contrastive_pairs_oracle()),
    "dedup_report": (q_dedup_report, _dedup_report_oracle()),
    "contrastive_pairs_incremental": (
        q_contrastive_pairs_incremental,
        _contrastive_pairs_oracle(),
    ),
    "dedup_report_incremental": (q_dedup_report_incremental, _dedup_report_oracle()),
    "corpus_shuffle": (q_corpus_shuffle, ORACLE_CORPUS_SHUFFLE),
    "ngram_jaccard_pairs": (q_ngram_jaccard_pairs, ORACLE_NGRAM_JACCARD_PAIRS),
    "dedup_clusters": (q_dedup_clusters, _dedup_clusters_oracle()),
    "dedup_clusters_lsh": (q_dedup_clusters_lsh, _dedup_clusters_oracle()),
    "cluster_safe_split": (q_cluster_safe_split, _cluster_safe_split_oracle()),
    "minhash_lsh_pairs": (q_minhash_lsh_pairs, ORACLE_NGRAM_JACCARD_PAIRS),
    "incremental_neardup": (q_incremental_neardup, _incremental_neardup_oracle()),
    "simhash": (q_simhash, ORACLE_SIMHASH),
    "ann_cosine_topk": (q_ann_cosine_topk, ORACLE_ANN_COSINE_TOPK),
    "embed_neardup_blocked": (q_embed_neardup_blocked, ORACLE_EMBED_NEARDUP_BLOCKED),
    "incremental_embed_neardup": (
        q_incremental_embed_neardup,
        ORACLE_INCREMENTAL_EMBED_NEARDUP,
    ),
    "doc_fingerprint": (q_doc_fingerprint, ORACLE_DOC_FINGERPRINT),
    "doc_fingerprint_jvm": (q_doc_fingerprint_jvm, ORACLE_DOC_FINGERPRINT),
    "keyword_match_count": (q_keyword_match_count, ORACLE_KEYWORD_MATCH_COUNT),
    "keyword_spans": (q_keyword_spans, ORACLE_KEYWORD_SPANS),
    "rename_suggest": (q_rename_suggest, ORACLE_RENAME_SUGGEST),
    "metadata_extract": (q_metadata_extract, ORACLE_METADATA_EXTRACT),
    "lang_id": (q_lang_id, ORACLE_LANG_ID),
    "multimodal_probe": (q_multimodal_probe, ORACLE_MULTIMODAL_PROBE),
    "multimodal_features": (q_multimodal_features, ORACLE_MULTIMODAL_FEATURES),
    "frame_sample": (q_frame_sample, ORACLE_FRAME_SAMPLE),
}
