"""Conversation-level curation operators over the SQL-derived transcripts.

The engine's payload is multi-turn transcripts (BASELINE.json input_hint:
``conv_id, turn_idx, role, text, tool, ts``), so curation has to work at
the *conversation* grain, not just the document grain the ``queries_text``
suite covers: a training pipeline dedupes whole conversations, gates them
on dialogue-shape quality, truncates them to a token budget, and validates
tool-call payloads (the reference's tolerant-JSON chain,
``apps/web/lib/server/pdf.ts:13-35``, applied per tool turn).

Every operator here is oracle-checked: the transcript table is derived in
SQL independently on both sides (see ``janet_spark.derive``) and each query
carries an equivalent DuckDB rendering.

Scale notes (100 TB / 10^12 turns):
- ``conv_dedup`` signatures are built with the same two-level chunked
  aggregation as conversation reassembly: per-turn md5 -> per-1024-turn
  chunk md5 -> conversation md5, so no reducer ever materialises a whole
  skewed conversation's concatenation (a 10^6-turn conversation contributes
  ~31 KB at level 2, not 32 MB at level 1).
- every per-conversation aggregate and window below partitions on
  ``conv_id`` — one shuffle each, reusable across the composed gate.
- the tool-call validator is an Arrow-batched pandas UDF (the tolerant
  parse chain is regex+json, not expressible as a built-in); everything
  else is pure JVM-side expressions.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from janet_spark.derive import DUCKDB_TRANSCRIPTS_SQL, derived_transcripts
from janet_spark.extract.metadata import tolerant_json_parse
from janet_spark.reassemble import _ordered_concat

_CTE = f"WITH transcripts AS ({DUCKDB_TRANSCRIPTS_SQL})"

# per-turn word count, identical semantics both dialects: the derived text
# is single-spaced by construction, and an empty text counts 0 words (both
# engines report split('') as a 1-element [''], so the guard is explicit).
# Column exprs are built lazily — module import must not require a session.
def _words():
    return F.when(F.col("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("text"), " "))
    )


_DUCK_WORDS = "CASE WHEN text = '' THEN 0 ELSE len(string_split(text, ' ')) END"

SIG_CHUNK = 1024  # turns per level-1 signature chunk


# ---------------------------------------------------------------------------
# conv_dedup: exact conversation-level dedup by order-sensitive signature
# ---------------------------------------------------------------------------


def conversation_signatures(tr: DataFrame, chunk: int = SIG_CHUNK) -> DataFrame:
    """(conv_id, conv_sig, n_turns): an order-sensitive content signature
    per conversation. Two-level chunked so skewed conversations never
    concatenate in one reducer (cf. reassemble.py's chunked concat)."""
    lvl1 = (
        tr.withColumn(
            "thash",
            F.md5(F.concat(F.col("turn_idx").cast("string"), F.lit(":"), F.col("text"))),
        )
        .withColumn("chk", F.floor(F.col("turn_idx") / F.lit(chunk)).cast("int"))
        .groupBy("conv_id", "chk")
        .agg(
            F.md5(_ordered_concat("turn_idx", "thash", "")).alias("chash"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return lvl1.groupBy("conv_id").agg(
        F.md5(_ordered_concat("chk", "chash", "")).alias("conv_sig"),
        F.sum("n").alias("n_turns"),
    )


def conv_dedup_frame(tr: DataFrame) -> DataFrame:
    """Exact whole-conversation dedup: two conversations are duplicates iff
    they have identical (turn_idx, text) sequences. Keeps the minimum
    conv_id per signature group (deterministic winner)."""
    sig = conversation_signatures(tr)
    return (
        sig.groupBy("conv_sig")
        .agg(
            F.min("conv_id").alias("conv_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("n_turns").alias("n_turns"),
        )
        .select("conv_id", "conv_sig", "n_copies", "n_turns")
        .orderBy("conv_id")
    )


def q_conv_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conv_dedup_frame(derived_transcripts(spark, sf_dir))


ORACLE_CONV_DEDUP = f"""
{_CTE},
lvl1 AS (
  SELECT conv_id, turn_idx // {SIG_CHUNK} AS chk,
         md5(string_agg(md5(cast(turn_idx AS varchar) || ':' || text),
                        '' ORDER BY turn_idx)) AS chash,
         count(*) AS n
  FROM transcripts GROUP BY conv_id, turn_idx // {SIG_CHUNK}
), sig AS (
  SELECT conv_id, md5(string_agg(chash, '' ORDER BY chk)) AS conv_sig,
         cast(sum(n) AS bigint) AS n_turns
  FROM lvl1 GROUP BY conv_id
)
SELECT min(conv_id) AS conv_id, conv_sig, count(*) AS n_copies,
       min(n_turns) AS n_turns
FROM sig GROUP BY conv_sig ORDER BY conv_id
"""


# ---------------------------------------------------------------------------
# conv_stats: dialogue-shape metrics per conversation
# ---------------------------------------------------------------------------


def conv_stats_frame(tr: DataFrame) -> DataFrame:
    """Per-conversation dialogue statistics: turn counts by role, word
    totals, empties, and wall-clock span — the raw material every
    conversation-level quality gate filters on. One groupBy = one shuffle
    keyed on conv_id."""
    return (
        tr.withColumn("words", _words())
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
            F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias(
                "n_assistant"
            ),
            F.sum(F.when(F.col("role") == "tool", 1).otherwise(0)).alias("n_tool"),
            F.sum("words").alias("n_words"),
            F.sum(F.when(F.col("text") == "", 1).otherwise(0)).alias("n_empty"),
            F.round(F.avg("words"), 6).alias("avg_words"),
            (
                (
                    F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
                ) / F.lit(60)
            )
            .cast("long")
            .alias("duration_min"),
        )
        .orderBy("conv_id")
    )


def q_conv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conv_stats_frame(derived_transcripts(spark, sf_dir))


ORACLE_CONV_STATS = f"""
{_CTE}
SELECT conv_id,
       count(*) AS n_turns,
       cast(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS bigint) AS n_user,
       cast(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS bigint) AS n_assistant,
       cast(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS bigint) AS n_tool,
       cast(sum({_DUCK_WORDS}) AS bigint) AS n_words,
       cast(sum(CASE WHEN text = '' THEN 1 ELSE 0 END) AS bigint) AS n_empty,
       round(avg({_DUCK_WORDS}), 6) AS avg_words,
       date_diff('second', min(ts), max(ts)) // 60 AS duration_min
FROM transcripts GROUP BY conv_id ORDER BY conv_id
"""


# ---------------------------------------------------------------------------
# conv_budget_truncate: longest turn-prefix under a token budget
# ---------------------------------------------------------------------------

BUDGET_WORDS = 96  # six full turns of the derived 16-word chunks


def conv_budget_frame(tr: DataFrame) -> DataFrame:
    """Context-budget truncation: keep the longest prefix of turns (in
    turn_idx order) whose cumulative word count fits BUDGET_WORDS —
    the standard way a trainer fits a conversation into a context window
    without splitting mid-turn. Window and groupBy share the conv_id
    partitioning (single shuffle)."""
    tr = tr.withColumn("words", _words())
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    cum = tr.withColumn("cum_words", F.sum("words").over(w))
    kept = F.col("cum_words") <= F.lit(BUDGET_WORDS)
    return (
        cum.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("total_turns"),
            F.sum(kept.cast("int")).alias("kept_turns"),
            F.sum(F.when(kept, F.col("words")).otherwise(0)).alias("kept_words"),
        )
        .withColumn(
            "truncated", (F.col("kept_turns") < F.col("total_turns")).cast("int")
        )
        .orderBy("conv_id")
    )


def q_conv_budget_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conv_budget_frame(derived_transcripts(spark, sf_dir))


ORACLE_CONV_BUDGET_TRUNCATE = f"""
{_CTE},
cum AS (
  SELECT conv_id, {_DUCK_WORDS} AS words,
         sum({_DUCK_WORDS}) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS cum_words
  FROM transcripts
)
SELECT conv_id,
       count(*) AS total_turns,
       cast(sum(CASE WHEN cum_words <= {BUDGET_WORDS} THEN 1 ELSE 0 END) AS bigint) AS kept_turns,
       cast(sum(CASE WHEN cum_words <= {BUDGET_WORDS} THEN words ELSE 0 END) AS bigint) AS kept_words,
       CASE WHEN sum(CASE WHEN cum_words <= {BUDGET_WORDS} THEN 1 ELSE 0 END)
                 < count(*) THEN 1 ELSE 0 END AS truncated
FROM cum GROUP BY conv_id ORDER BY conv_id
"""


# ---------------------------------------------------------------------------
# tool_call_validate: tolerant-JSON validation of tool payloads
# ---------------------------------------------------------------------------

# Deterministic tool payloads synthesised identically in both dialects on
# tool turns (turn_idx % 3 == 2, so turn_idx % 9 cycles 2 -> 5 -> 8):
#   % 9 == 2 : clean JSON object                      -> direct parse
#   % 9 == 5 : JSON embedded in prose                 -> regex-recovered
#   % 9 == 8 : unterminated object (no closing brace) -> unparseable
# The argument word is sanitised to [A-Za-z0-9] so JSON validity is decided
# by the payload's *structure*, not by stray quote characters in the data.

_SPARK_ARG = "regexp_replace(element_at(split(text, ' '), 1), '[^A-Za-z0-9]', '')"
_DUCK_ARG = "regexp_replace(string_split(text, ' ')[1], '[^A-Za-z0-9]', '', 'g')"

_SPARK_RAW = f"""
CASE
  WHEN turn_idx % 9 = 2 THEN concat('{{"name":"search","arg":"', {_SPARK_ARG}, '"}}')
  WHEN turn_idx % 9 = 5 THEN concat('tool output: {{"name":"lookup","arg":"', {_SPARK_ARG}, '"}} rc=0')
  ELSE concat('{{"name": ', {_SPARK_ARG})
END
"""

_DUCK_RAW = f"""
CASE
  WHEN turn_idx % 9 = 2 THEN '{{"name":"search","arg":"' || {_DUCK_ARG} || '"}}'
  WHEN turn_idx % 9 = 5 THEN 'tool output: {{"name":"lookup","arg":"' || {_DUCK_ARG} || '"}} rc=0'
  ELSE '{{"name": ' || {_DUCK_ARG}
END
"""


def _validate_tool_batch():
    """Arrow-batched tolerant-JSON validation UDF. `valid` = the
    reference's fallback chain (direct parse, else outermost-{...} regex
    extract) produced a dict; `recovered` = it needed the fallback."""

    @F.pandas_udf("valid int, recovered int")
    def validate(raw: pd.Series) -> pd.DataFrame:
        valid = []
        recovered = []
        for r in raw:
            try:
                direct = isinstance(json.loads(r), dict)
            except (ValueError, TypeError):
                direct = False
            parsed = tolerant_json_parse(r)
            ok = parsed is not None
            valid.append(1 if ok else 0)
            recovered.append(1 if ok and not direct else 0)
        return pd.DataFrame({"valid": valid, "recovered": recovered})

    return validate


def tool_call_validate_frame(tr: DataFrame) -> DataFrame:
    """Per-conversation tool-call hygiene: run the reference's tolerant
    JSON chain (apps/web/lib/server/pdf.ts:13-35) over every tool turn's
    payload and report valid / regex-recovered / unparseable counts —
    what a pipeline uses to drop conversations with broken tool traces.
    The oracle recomputes validity independently with DuckDB json_valid
    over the same raw strings."""
    tool_turns = (
        tr.filter(F.col("role") == "tool")
        .withColumn("raw", F.expr(_SPARK_RAW))
        .withColumn("v", _validate_tool_batch()(F.col("raw")))
    )
    return (
        tool_turns.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_tool_calls"),
            F.sum(F.col("v.valid")).alias("n_valid"),
            F.sum(F.col("v.recovered")).alias("n_recovered"),
            (F.count(F.lit(1)) - F.sum(F.col("v.valid"))).alias("n_invalid"),
        )
        .orderBy("conv_id")
    )


def q_tool_call_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tool_call_validate_frame(derived_transcripts(spark, sf_dir))


ORACLE_TOOL_CALL_VALIDATE = f"""
{_CTE},
tool_turns AS (
  SELECT conv_id, {_DUCK_RAW} AS raw
  FROM transcripts WHERE role = 'tool'
), v AS (
  SELECT conv_id,
         CASE WHEN json_valid(raw)
                   OR json_valid(regexp_extract(raw, '\\{{[\\s\\S]*\\}}'))
              THEN 1 ELSE 0 END AS valid,
         CASE WHEN NOT json_valid(raw)
                   AND json_valid(regexp_extract(raw, '\\{{[\\s\\S]*\\}}'))
              THEN 1 ELSE 0 END AS recovered
  FROM tool_turns
)
SELECT conv_id, count(*) AS n_tool_calls, cast(sum(valid) AS bigint) AS n_valid,
       cast(sum(recovered) AS bigint) AS n_recovered,
       cast(count(*) - sum(valid) AS bigint) AS n_invalid
FROM v GROUP BY conv_id ORDER BY conv_id
"""


# ---------------------------------------------------------------------------
# conv_quality_gate: composed conversation-level curation filter
# ---------------------------------------------------------------------------

MIN_TURNS = 3
MIN_AVG_WORDS = 8.0


def conv_quality_gate_frame(tr: DataFrame) -> DataFrame:
    """Composed conversation gate in ONE plan: shape filter (enough turns,
    dense-enough turns, no empty turns) AND exact-duplicate removal (only
    the min-conv_id copy of each signature group survives). Both branches
    aggregate on conv_id, so the join of stats with dedup keepers reuses
    the conv_id hash partitioning instead of introducing a third shuffle
    shape."""
    stats = (
        tr.withColumn("words", _words())
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("words").alias("n_words"),
            F.avg("words").alias("avg_words"),
            F.sum(F.when(F.col("text") == "", 1).otherwise(0)).alias("n_empty"),
        )
        .filter(
            (F.col("n_turns") >= MIN_TURNS)
            & (F.col("avg_words") >= MIN_AVG_WORDS)
            & (F.col("n_empty") == 0)
        )
    )
    keepers = (
        conversation_signatures(tr)
        .groupBy("conv_sig")
        .agg(F.min("conv_id").alias("conv_id"))
        .select("conv_id")
    )
    return (
        stats.join(keepers, "conv_id", "left_semi")
        .select("conv_id", "n_turns", "n_words")
        .orderBy("conv_id")
    )


def q_conv_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conv_quality_gate_frame(derived_transcripts(spark, sf_dir))


ORACLE_CONV_QUALITY_GATE = f"""
{_CTE},
stats AS (
  SELECT conv_id, count(*) AS n_turns, cast(sum({_DUCK_WORDS}) AS bigint) AS n_words,
         avg({_DUCK_WORDS}) AS avg_words,
         cast(sum(CASE WHEN text = '' THEN 1 ELSE 0 END) AS bigint) AS n_empty
  FROM transcripts GROUP BY conv_id
), lvl1 AS (
  SELECT conv_id, turn_idx // {SIG_CHUNK} AS chk,
         md5(string_agg(md5(cast(turn_idx AS varchar) || ':' || text),
                        '' ORDER BY turn_idx)) AS chash
  FROM transcripts GROUP BY conv_id, turn_idx // {SIG_CHUNK}
), sig AS (
  SELECT conv_id, md5(string_agg(chash, '' ORDER BY chk)) AS conv_sig
  FROM lvl1 GROUP BY conv_id
), keepers AS (
  SELECT min(conv_id) AS conv_id FROM sig GROUP BY conv_sig
)
SELECT s.conv_id, s.n_turns, s.n_words
FROM stats s SEMI JOIN keepers k ON s.conv_id = k.conv_id
WHERE s.n_turns >= {MIN_TURNS} AND s.avg_words >= {MIN_AVG_WORDS}
      AND s.n_empty = 0
ORDER BY s.conv_id
"""


CONV_QUERIES = {
    "conv_dedup": (q_conv_dedup, ORACLE_CONV_DEDUP),
    "conv_stats": (q_conv_stats, ORACLE_CONV_STATS),
    "conv_budget_truncate": (q_conv_budget_truncate, ORACLE_CONV_BUDGET_TRUNCATE),
    "tool_call_validate": (q_tool_call_validate, ORACLE_TOOL_CALL_VALIDATE),
    "conv_quality_gate": (q_conv_quality_gate, ORACLE_CONV_QUALITY_GATE),
}


# ---------------------------------------------------------------------------
# conv_pack: pack whole conversations into fixed-budget training sequences
# ---------------------------------------------------------------------------


def _conv_ordinal():
    """Numeric pack order parsed from the derived conv_id ('conv-' +
    zero-padded doc_id), so the shared two-level distributed prefix sum
    (`_pack_sequences`, queries_text.py) can block on it. Zero-padding
    makes lexical conv_id order equal numeric order at these scales; a
    production table would carry an explicit long ordinal column and the
    frame cores accept any frame that already has one."""
    return F.substring(F.col("conv_id"), 6, 10).cast("long")


def _apply_ordinal(sized: DataFrame, ordinal) -> DataFrame:
    """Attach the long pack-order column `doc_id`. `ordinal` may be a
    column expression over conv_id (default: the derived-id parse) or a
    (conv_id, ord:long) DataFrame — the production contract where the
    table carries an explicit DENSE ordinal (sparse ordinals, e.g. a raw
    hash, would make the prefix-sum block table corpus-sized; see
    sft_job.run_sft_job for the scheme-agnostic dense ranking)."""
    if isinstance(ordinal, DataFrame):
        return sized.join(
            ordinal.select("conv_id", F.col("ord").cast("long").alias("doc_id")),
            "conv_id",
        )
    ordinal = _conv_ordinal() if ordinal is None else ordinal
    return sized.withColumn("doc_id", ordinal)


def conv_pack_frame(tr: DataFrame, ordinal=None) -> DataFrame:
    """Assign whole conversations, in pack-order, to fixed-token-budget
    training sequences — the conversation-grain analog of sequence_pack:
    a conversation lands in the sequence where its exclusive running word
    total starts, and is never split. Totals are one conv_id groupBy; the
    running total is the shared two-level distributed prefix sum (never a
    corpus-sized window).

    `ordinal` is the long pack-order column expression OR a
    (conv_id, ord) DataFrame (see _apply_ordinal); defaults to the
    derived-conv_id parse. A caller whose conv_ids do not follow the
    derived scheme MUST supply one — the parse yields NULL otherwise,
    which would collapse the prefix-sum blocking."""
    from janet_spark.queries_text import _pack_sequences

    totals = (
        tr.withColumn("words", _words())
        .groupBy("conv_id")
        .agg(F.sum("words").cast("long").alias("n_tokens"))
    )
    d = _apply_ordinal(totals, ordinal).select("conv_id", "doc_id", "n_tokens")
    return (
        _pack_sequences(d)
        .select("conv_id", "n_tokens", "seq_id", "seq_offset")
        .orderBy("conv_id")
    )


def q_conv_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conv_pack_frame(derived_transcripts(spark, sf_dir))


ORACLE_CONV_PACK = f"""
{_CTE},
totals AS (
  SELECT conv_id, cast(sum({_DUCK_WORDS}) AS bigint) AS n_tokens
  FROM transcripts GROUP BY conv_id
), c AS (
  SELECT conv_id, n_tokens,
         cast(coalesce(sum(n_tokens) OVER (ORDER BY conv_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint)
           AS cum_before
  FROM totals
)
SELECT conv_id, n_tokens,
       cum_before // 512 AS seq_id,
       cum_before % 512 AS seq_offset
FROM c ORDER BY conv_id
"""


# ---------------------------------------------------------------------------
# conv_training_pipeline: gate -> budget-truncate -> pack, ONE plan
# ---------------------------------------------------------------------------


def _pipeline_parts(tr: DataFrame, ordinal=None):
    """Shared internals of the composed pipeline: returns
    (kept_turns, packed) where kept_turns carries the budget-surviving
    turns with their within-conversation cumulative word totals, and
    packed is one row per gate-surviving conversation with its sequence
    assignment. conv_loss_mask builds on the SAME instances (including
    the persisted narrow frame), so composing it adds no extra corpus
    scans beyond the pipeline's two."""
    from janet_spark.queries_text import _pack_sequences

    # two of the three corpus-sized consumers (shape stats and the
    # truncation window) need only (conv_id, turn_idx, words) — persist
    # THAT narrow projection (no text column, a fraction of the input
    # width) and let the signature branch scan the source once itself:
    # 2 pruned scans total instead of 3, and the cache stays small.
    # Measured A/B/C at 1.4M turns (cold): no persist 5.7s / wide persist
    # 10.2s / narrow persist 7.1s — locally a page-cached parquet re-scan
    # is nearly free so no-persist "wins", but at 100 TB the extra
    # corpus pass is the dominant cost and the narrow persist (or its
    # production form, a staged-parquet checkpoint of the narrow frame —
    # same discipline as curation_pipeline_v2's survivor persist) is the
    # right trade. The wide persist is measured strictly worse at every
    # scale: it caches the text column nobody downstream reads.
    words = tr.select(
        "conv_id", "turn_idx", "role", _words().alias("words")
    ).persist()
    stats = words.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.avg("words").alias("avg_words"),
        # text == '' <=> words == 0 (the _words guard maps '' to 0 and any
        # non-empty text to >= 1), so the narrow frame suffices
        F.sum(F.when(F.col("words") == 0, 1).otherwise(0)).alias("n_empty"),
    )
    passing = stats.filter(
        (F.col("n_turns") >= MIN_TURNS)
        & (F.col("avg_words") >= MIN_AVG_WORDS)
        & (F.col("n_empty") == 0)
    ).select("conv_id")
    keepers = (
        conversation_signatures(tr)
        .groupBy("conv_sig")
        .agg(F.min("conv_id").alias("conv_id"))
        .select("conv_id")
    )
    survivors = passing.join(keepers, "conv_id", "left_semi")

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    kept_turns = words.withColumn("cum_words", F.sum("words").over(w)).filter(
        F.col("cum_words") <= BUDGET_WORDS
    )
    kept = kept_turns.groupBy("conv_id").agg(
        F.sum("words").cast("long").alias("kept_words")
    )
    sized = survivors.join(kept, "conv_id")
    d = _apply_ordinal(sized, ordinal).select(
        "conv_id", "doc_id",
        F.col("kept_words").alias("n_tokens"),
    )
    packed = _pack_sequences(d).select(
        "conv_id",
        F.col("n_tokens").alias("kept_words"),
        "seq_id",
        "seq_offset",
    )
    return kept_turns, packed


def conv_training_pipeline_frame(tr: DataFrame, ordinal=None) -> DataFrame:
    """The composed transcripts-in, training-sequences-out chain at
    conversation grain, in ONE Spark plan: (1) quality gate (shape filter
    + exact-dedup keeper semi-join), (2) context-budget prefix truncation
    of every surviving conversation, (3) contiguous packing of the kept
    word totals into fixed 512-token training sequences via the shared
    distributed prefix sum. Every per-conversation stage keys on conv_id,
    so the gate, truncation, and totals reuse one partitioning; only the
    tiny block-offset side of the pack broadcasts.

    A surviving conversation whose FIRST turn alone overflows the budget
    keeps zero turns and drops out of the pack (inner join) — the same
    whole-unit rule the packers use."""
    _, packed = _pipeline_parts(tr, ordinal)
    return packed.orderBy("conv_id")


def q_conv_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conv_training_pipeline_frame(derived_transcripts(spark, sf_dir))


# the composed pipeline's CTE chain, shared verbatim with the loss-mask
# oracle below so the two renderings cannot drift
_PIPE_CTES = f"""
{_CTE},
stats AS (
  SELECT conv_id, count(*) AS n_turns, avg({_DUCK_WORDS}) AS avg_words,
         sum(CASE WHEN text = '' THEN 1 ELSE 0 END) AS n_empty
  FROM transcripts GROUP BY conv_id
), lvl1 AS (
  SELECT conv_id, turn_idx // {SIG_CHUNK} AS chk,
         md5(string_agg(md5(cast(turn_idx AS varchar) || ':' || text),
                        '' ORDER BY turn_idx)) AS chash
  FROM transcripts GROUP BY conv_id, turn_idx // {SIG_CHUNK}
), sig AS (
  SELECT conv_id, md5(string_agg(chash, '' ORDER BY chk)) AS conv_sig
  FROM lvl1 GROUP BY conv_id
), keepers AS (
  SELECT min(conv_id) AS conv_id FROM sig GROUP BY conv_sig
), survivors AS (
  SELECT s.conv_id FROM stats s SEMI JOIN keepers k ON s.conv_id = k.conv_id
  WHERE s.n_turns >= {MIN_TURNS} AND s.avg_words >= {MIN_AVG_WORDS}
        AND s.n_empty = 0
), cum AS (
  SELECT conv_id, turn_idx, role, {_DUCK_WORDS} AS words,
         sum({_DUCK_WORDS}) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS cum_words
  FROM transcripts
), kept AS (
  SELECT conv_id, cast(sum(words) AS bigint) AS kept_words
  FROM cum WHERE cum_words <= {BUDGET_WORDS} GROUP BY conv_id
), sized AS (
  SELECT v.conv_id, k.kept_words
  FROM survivors v JOIN kept k ON v.conv_id = k.conv_id
), c AS (
  SELECT conv_id, kept_words,
         cast(coalesce(sum(kept_words) OVER (ORDER BY conv_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint)
           AS cum_before
  FROM sized
)"""

ORACLE_CONV_TRAINING_PIPELINE = f"""{_PIPE_CTES}
SELECT conv_id, kept_words,
       cum_before // 512 AS seq_id,
       cum_before % 512 AS seq_offset
FROM c ORDER BY conv_id
"""


# ---------------------------------------------------------------------------
# conv_loss_mask: assistant-turn token spans inside packed sequences
# ---------------------------------------------------------------------------


def conv_loss_mask_frame(tr: DataFrame, ordinal=None) -> DataFrame:
    """SFT loss masking: for every ASSISTANT turn in the kept prefix of a
    gate-surviving conversation, the token span it occupies inside its
    packed training sequence — the artifact a trainer needs to compute
    loss on assistant tokens only. Span positions are relative to the
    conversation's sequence start (seq_offset + exclusive within-conv
    running total); a straddling conversation's spans index past the
    512 boundary by design (conversations pack whole).

    One extra window + one conv_id equi-join on top of the composed
    pipeline — no new shuffle key shapes, and the pipeline's persisted
    narrow frame is shared (no extra corpus scan)."""
    kept_turns, packed = _pipeline_parts(tr, ordinal)
    asst = kept_turns.withColumn(
        "within_start", F.col("cum_words") - F.col("words")
    ).filter(F.col("role") == "assistant")
    start = (F.col("seq_offset") + F.col("within_start")).cast("long")
    return (
        asst.join(packed.select("conv_id", "seq_id", "seq_offset"), "conv_id")
        .select(
            "conv_id",
            "turn_idx",
            "seq_id",
            start.alias("tok_start"),
            (start + F.col("words")).cast("long").alias("tok_end"),
        )
        .orderBy("conv_id", "turn_idx")
    )


def q_conv_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conv_loss_mask_frame(derived_transcripts(spark, sf_dir))


ORACLE_CONV_LOSS_MASK = f"""{_PIPE_CTES},
kept_turns AS (
  SELECT conv_id, turn_idx, role, words,
         cum_words - words AS within_start
  FROM cum WHERE cum_words <= {BUDGET_WORDS}
)
SELECT k.conv_id, k.turn_idx, c.cum_before // 512 AS seq_id,
       cast(c.cum_before % 512 + k.within_start AS bigint) AS tok_start,
       cast(c.cum_before % 512 + k.within_start + k.words AS bigint) AS tok_end
FROM kept_turns k JOIN c ON k.conv_id = c.conv_id
WHERE k.role = 'assistant'
ORDER BY k.conv_id, k.turn_idx
"""

CONV_QUERIES["conv_pack"] = (q_conv_pack, ORACLE_CONV_PACK)
CONV_QUERIES["conv_training_pipeline"] = (
    q_conv_training_pipeline,
    ORACLE_CONV_TRAINING_PIPELINE,
)
CONV_QUERIES["conv_loss_mask"] = (q_conv_loss_mask, ORACLE_CONV_LOSS_MASK)


# ---------------------------------------------------------------------------
# conv_neardup: fuzzy whole-conversation near-dup pairs (MinHash LSH at the
# conversation grain, no conversation-sized strings anywhere)
# ---------------------------------------------------------------------------
#
# `conv_dedup` above catches EXACT duplicates (order-sensitive signature);
# real agent corpora also carry near-duplicates — re-runs with tweaked
# phrasing, re-ingested sessions with edited turns. Those need set-
# similarity, and at 10^12 turns the doc-grain trick of "concat the
# conversation, then minhash the string" is exactly what the skew notes
# forbid (a 10^6-turn conversation = a 50 MB reducer row). The identity
# minhash(A ∪ B) = elementwise_min(minhash(A), minhash(B)) makes the
# concat unnecessary: per-TURN signatures (bounded rows) fold into the
# conversation signature through an associative, map-side-combinable MIN
# aggregation. Shingles are WITHIN-turn word 5-grams (a turn shorter than
# 5 words contributes itself) — the contract the DuckDB oracle recomputes.

_CONV_LSH_HOT_BUCKET_CAP = 256


def _conv_shingle_df(tr: DataFrame) -> DataFrame:
    """(conv_id, sh): the conversation's DISTINCT within-turn shingle set.
    Words are materialized as a column before any lambda references them
    (the O(words^2) inline-split lesson from the curation stress)."""
    from janet_spark.queries_text import _SHINGLE_WORDS

    tw = tr.select("conv_id", F.split(F.coalesce(F.col("text"), F.lit("")), " ").alias("__ws"))
    ws = F.col("__ws")
    n = F.greatest(F.size(ws) - (_SHINGLE_WORDS - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(ws, i, _SHINGLE_WORDS), " "),
    )
    return (
        tw.select("conv_id", F.explode(F.array_distinct(shingles)).alias("sh"))
        .distinct()
    )


def conv_sig_df(tr: DataFrame) -> DataFrame:
    """(conv_id, sig): conversation-grain 64-permutation MinHash
    signatures. Stage 1 computes per-turn signatures and folds them
    WITHIN each Arrow batch (partial elementwise min per conversation
    seen in the batch); stage 2 is a conv_id groupBy of 64 MIN
    aggregates — map-side combinable, so a 10^6-turn conversation
    reduces to one 64-long row without shuffling its text."""
    import numpy as np
    import pandas as pd

    from janet_spark.queries_text import (
        _MH_PERMS,
        _doc_shingles,
        _minhash_signature,
    )

    def partial_sigs(batches):
        for pdf in batches:
            by: dict = {}
            for cid, text in zip(pdf["conv_id"], pdf["text"].fillna("")):
                sig = _minhash_signature(_doc_shingles(text))
                cur = by.get(cid)
                by[cid] = sig if cur is None else np.minimum(cur, sig)
            yield pd.DataFrame(
                {"conv_id": list(by), "sig": [s.tolist() for s in by.values()]}
            )

    partial = tr.select("conv_id", "text").mapInPandas(
        partial_sigs, schema="conv_id string, sig array<long>"
    )
    return partial.groupBy("conv_id").agg(
        F.array(
            *[F.min(F.col("sig")[i]) for i in range(_MH_PERMS)]
        ).alias("sig")
    )


def conv_band_df(tr: DataFrame, sigs: DataFrame | None = None) -> DataFrame:
    """(conv_id, band_key): conversation-grain MinHash banding over
    `conv_sig_df` signatures (pass `sigs` to reuse an already-persisted
    signature frame). Each band's 4 values mix down to one int64 key
    (same multiply-xor scheme and rationale as queries_text._band_df:
    collisions only ADD candidates, and every candidate is
    exact-verified)."""
    import numpy as np
    import pandas as pd

    from janet_spark.queries_text import _MH_BANDS, _MH_ROWS

    combined = conv_sig_df(tr) if sigs is None else sigs

    _mix = np.array(
        [0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
        dtype=np.uint64,
    )

    def mix_bands(batches):
        band_idx = np.arange(_MH_BANDS, dtype=np.uint64)
        for pdf in batches:
            ids, keys = [], []
            for cid, sig in zip(pdf["conv_id"], pdf["sig"]):
                chunks = np.asarray(sig, dtype=np.int64).astype(np.uint64).reshape(
                    _MH_BANDS, _MH_ROWS
                )
                mixed = (chunks * _mix[None, :]).sum(axis=1, dtype=np.uint64)
                mixed ^= mixed >> np.uint64(33)
                mixed = mixed * np.uint64(0xFF51AFD7ED558CCD) + band_idx
                ids.extend([cid] * _MH_BANDS)
                keys.append(mixed.view(np.int64))
            yield pd.DataFrame(
                {
                    "conv_id": ids,
                    "band_key": np.concatenate(keys) if keys else np.array([], dtype=np.int64),
                }
            )

    return combined.mapInPandas(mix_bands, schema="conv_id string, band_key long")


def conv_neardup_frame(
    tr: DataFrame, hot_bucket_cap: int = _CONV_LSH_HOT_BUCKET_CAP
) -> DataFrame:
    """Near-duplicate conversation pairs (c1 < c2, Jaccard >= threshold
    over the conversations' within-turn shingle sets), mined by LSH
    banding and verified by DISTRIBUTED exact Jaccard — the verify stage
    never materializes a conversation either: candidate pairs join the
    candidate-restricted shingle table per side, so intersection counting
    is a per-pair-bounded equi-join, and set sizes are one count per
    conversation. Hot buckets fall back to the same star expansion as the
    doc-grain miner. The signatures persist once and serve both the band
    keys and the verify tail's estimated-Jaccard prefilter."""
    sigs = conv_sig_df(tr).persist()
    bands = conv_band_df(tr, sigs=sigs).persist()
    bucket_sizes = bands.groupBy("band_key").agg(
        F.count(F.lit(1)).alias("bkt_n"), F.min("conv_id").alias("bkt_rep")
    )
    sized = bands.join(bucket_sizes, "band_key")
    cold = sized.filter(F.col("bkt_n") <= hot_bucket_cap)
    a = cold.alias("a")
    b = cold.alias("b")
    cold_pairs = a.join(
        b,
        (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.conv_id") < F.col("b.conv_id")),
    ).select(F.col("a.conv_id").alias("c1"), F.col("b.conv_id").alias("c2"))
    star_pairs = (
        sized.filter(
            (F.col("bkt_n") > hot_bucket_cap) & (F.col("conv_id") != F.col("bkt_rep"))
        )
        .select(F.col("bkt_rep").alias("c1"), F.col("conv_id").alias("c2"))
    )
    return _conv_verify_candidates(
        tr, cold_pairs.unionByName(star_pairs), sigs=sigs
    )


# Estimated-Jaccard prefilter margin (round-3 verdict #4): a candidate is
# killed before the exact intersection join when its SIGNATURE-estimated
# Jaccard (fraction of agreeing MinHash components) falls more than this
# margin below the verify threshold. At 64 permutations the estimator's
# std at J=0.8 is sqrt(.8*.2/64) = 0.05, so 0.25 is a 5-sigma guard: a
# TRUE >=0.8 pair estimates below 0.55 with probability ~1e-6 — the
# filter is conservative, the exact join still decides every survivor,
# and the pair output is unchanged (pinned by the oracle gate and the
# planted-hot-bucket stress). What it buys: per-pair verify cost is
# O(|shingles(conv)|), so a hot bucket whose REPRESENTATIVE is a
# mega-conversation would fan every star candidate out against ~10^7
# shingle rows; the estimator kills those candidates with 64-element
# array arithmetic instead.
_CONV_EST_MARGIN = 0.25


def _sig_prefilter(candidates: DataFrame, sigs: DataFrame) -> DataFrame:
    from janet_spark.queries_text import _JACCARD_THRESHOLD, _MH_PERMS

    g1 = sigs.select(F.col("conv_id").alias("c1"), F.col("sig").alias("__s1"))
    g2 = sigs.select(F.col("conv_id").alias("c2"), F.col("sig").alias("__s2"))
    est = (
        F.expr("size(filter(zip_with(__s1, __s2, (a, b) -> a = b), x -> x))")
        / F.lit(_MH_PERMS)
    )
    return (
        candidates.join(g1, "c1")
        .join(g2, "c2")
        .filter(est >= F.lit(_JACCARD_THRESHOLD - _CONV_EST_MARGIN))
        .select("c1", "c2")
    )


def _conv_verify_candidates(
    tr: DataFrame, candidates: DataFrame, sigs: DataFrame | None = None
) -> DataFrame:
    """Shared distributed exact-Jaccard verify tail for the full and
    incremental conversation miners (one implementation, same reasons as
    queries_text._verify_candidates): candidate pairs dedup + persist,
    shingle explode restricted to candidate conversations via semi-join
    with an explicit conv_id repartition (the Spark 4.1.2 union
    co-partitioning pin), intersection counted by joining candidates to
    each side — per-pair bounded, never a shingle-keyed self-join.
    With `sigs` (conv_id, sig), candidates first pass the conservative
    estimated-Jaccard prefilter (see _CONV_EST_MARGIN), bounding the
    fan-out on mega-conversation representatives."""
    from janet_spark.queries_text import _JACCARD_THRESHOLD

    spark = candidates.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    candidates = candidates.distinct()
    if sigs is not None:
        candidates = _sig_prefilter(candidates, sigs)
    candidates = candidates.persist()

    cand_convs = (
        candidates.select(F.col("c1").alias("conv_id"))
        .unionByName(candidates.select(F.col("c2").alias("conv_id")))
        .distinct()
    )
    cand_turns = tr.join(cand_convs, "conv_id", "left_semi").repartition(
        n_part, "conv_id"
    )
    sh = _conv_shingle_df(cand_turns)
    counts = sh.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_sh"))
    s1 = sh.select(F.col("conv_id").alias("c1"), F.col("sh").alias("sh1"))
    s2 = sh.select(F.col("conv_id").alias("c2_r"), F.col("sh").alias("sh2"))
    inter = (
        candidates.join(s1, "c1")
        .join(s2, (F.col("c2") == F.col("c2_r")) & (F.col("sh1") == F.col("sh2")))
        .groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    n1 = counts.select(F.col("conv_id").alias("c1"), F.col("n_sh").alias("n1"))
    n2 = counts.select(F.col("conv_id").alias("c2"), F.col("n_sh").alias("n2"))
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    return (
        inter.join(n1, "c1")
        .join(n2, "c2")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .select("c1", "c2", "jaccard")
        .orderBy("c1", "c2")
    )


def q_conv_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conv_neardup_frame(derived_transcripts(spark, sf_dir))


def _oracle_conv_neardup() -> str:
    from janet_spark.queries_text import _JACCARD_THRESHOLD, _SHINGLE_WORDS

    k = _SHINGLE_WORDS
    return f"""
{_CTE}, tw AS (
  SELECT conv_id, string_split(coalesce(text, ''), ' ') AS ws FROM transcripts
), tsh AS (
  SELECT conv_id,
         unnest(CASE WHEN len(ws) < {k} THEN [array_to_string(ws, ' ')]
                ELSE list_transform(range(1, len(ws) - {k - 1} + 1),
                       i -> array_to_string(list_slice(ws, i, i + {k - 1}), ' '))
                END) AS sh
  FROM tw
), s AS (
  SELECT DISTINCT conv_id, sh FROM tsh
), c AS (
  SELECT conv_id, count(*) AS n FROM s GROUP BY conv_id
), i AS (
  SELECT a.conv_id AS c1, b.conv_id AS c2, count(*) AS inter
  FROM s a JOIN s b ON a.sh = b.sh AND a.conv_id < b.conv_id
  GROUP BY 1, 2
)
SELECT c1, c2,
       round(inter::double / (ca.n + cb.n - inter), 4) AS jaccard
FROM i JOIN c ca ON i.c1 = ca.conv_id JOIN c cb ON i.c2 = cb.conv_id
WHERE round(inter::double / (ca.n + cb.n - inter), 4) >= {_JACCARD_THRESHOLD}
ORDER BY c1, c2
"""


CONV_QUERIES["conv_neardup"] = (q_conv_neardup, _oracle_conv_neardup())


# ---------------------------------------------------------------------------
# conv_dedup_fuzzy: near-dup pairs -> clusters -> one keeper per cluster
# ---------------------------------------------------------------------------


def conv_dedup_fuzzy_frame(tr: DataFrame) -> DataFrame:
    """The conversation-grain analog of `dedup_clusters_lsh` — what a
    production transcript-dedup run executes after `conv_neardup` mines
    pairs: connected components over the near-dup edge list, one keeper
    per cluster (min conv_id), everything else marked for drop. Reuses
    queries_text._clusters_from_pairs verbatim (same min-label
    propagation with localCheckpoint lineage cuts, same keeper rule) so
    the doc-grain and conversation-grain compositions can never drift."""
    from janet_spark.queries_text import _clusters_from_pairs

    pairs = conv_neardup_frame(tr).select(
        F.col("c1").alias("d1"), F.col("c2").alias("d2")
    )
    return _clusters_from_pairs(pairs).select(
        F.col("doc_id").alias("conv_id"),
        "cluster_rep",
        "cluster_size",
        "keep",
    )


def q_conv_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conv_dedup_fuzzy_frame(derived_transcripts(spark, sf_dir))


def _oracle_conv_dedup_fuzzy() -> str:
    pair_sql = _oracle_conv_neardup().replace("ORDER BY c1, c2", "")
    return f"""
WITH RECURSIVE pairs AS ({pair_sql}),
edges AS (
  SELECT c1 AS a, c2 AS b FROM pairs
  UNION ALL
  SELECT c2 AS a, c1 AS b FROM pairs
),
walk(src, node) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT w.src, e.b FROM walk w JOIN edges e ON e.a = w.node
),
comp AS (
  SELECT src AS conv_id, min(node) AS cluster_rep FROM walk GROUP BY src
),
sizes AS (
  SELECT cluster_rep, count(*) AS cluster_size FROM comp GROUP BY cluster_rep
)
SELECT c.conv_id, c.cluster_rep, s.cluster_size,
       c.conv_id = c.cluster_rep AS keep
FROM comp c JOIN sizes s USING (cluster_rep)
ORDER BY conv_id
"""


CONV_QUERIES["conv_dedup_fuzzy"] = (q_conv_dedup_fuzzy, _oracle_conv_dedup_fuzzy())


# ---------------------------------------------------------------------------
# incremental_conv_neardup: daily delta vs corpus at conversation grain
# ---------------------------------------------------------------------------

# deterministic stand-in for "arrived since the last run": conversations
# whose derived numeric ordinal % 7 == 0 are today's batch (mirrors
# queries_text._DELTA_MOD so the oracle is a one-line predicate)
_CONV_DELTA_MOD = 7


def _conv_is_new():
    return F.substring(F.col("conv_id"), 6, 10).cast("long") % _CONV_DELTA_MOD == 0


def incremental_conv_neardup_frame(
    tr: DataFrame, hot_bucket_cap: int = _CONV_LSH_HOT_BUCKET_CAP
) -> DataFrame:
    """The daily production shape of conversation dedup: mine only the
    near-dup pairs touching today's delta conversations. Delta band rows
    join the FULL band table (in production: the maintained signature
    table — 16 int64 keys per conversation, four orders of magnitude
    smaller than transcript text), so per-run cost is O(|delta| × bucket
    size) and base×base pairs are structurally impossible. Hot buckets
    keep the star expansion, with the rep-is-new branch so no
    delta-touching pair is lost to the cap (same three-branch shape as
    queries_text.q_incremental_neardup). Verify tail shared with the
    full miner (_conv_verify_candidates) so the two can never drift."""
    is_new = _conv_is_new()
    sigs = conv_sig_df(tr).persist()
    bands = conv_band_df(tr, sigs=sigs).persist()
    delta_bands = bands.filter(is_new)
    bucket_sizes = bands.groupBy("band_key").agg(
        F.count(F.lit(1)).alias("bkt_n"), F.min("conv_id").alias("bkt_rep")
    )
    sized_delta = delta_bands.join(bucket_sizes, "band_key")
    a = sized_delta.filter(F.col("bkt_n") <= hot_bucket_cap).alias("a")
    b = bands.alias("b")
    # new x new pairs arrive twice (once per endpoint's delta row);
    # least/greatest orients them identically and the verify tail dedups
    cold_pairs = a.join(
        b,
        (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.conv_id") != F.col("b.conv_id")),
    ).select(
        F.least("a.conv_id", "b.conv_id").alias("c1"),
        F.greatest("a.conv_id", "b.conv_id").alias("c2"),
    )
    hot_delta = sized_delta.filter(
        (F.col("bkt_n") > hot_bucket_cap) & (F.col("conv_id") != F.col("bkt_rep"))
    ).select(F.col("bkt_rep").alias("c1"), F.col("conv_id").alias("c2"))
    rep_is_new = (
        F.substring(F.col("bkt_rep"), 6, 10).cast("long") % _CONV_DELTA_MOD == 0
    )
    hot_rep_new = (
        bands.join(
            bucket_sizes.filter((F.col("bkt_n") > hot_bucket_cap) & rep_is_new),
            "band_key",
        )
        .filter(F.col("conv_id") != F.col("bkt_rep"))
        .select(F.col("bkt_rep").alias("c1"), F.col("conv_id").alias("c2"))
    )
    candidates = cold_pairs.unionByName(hot_delta).unionByName(hot_rep_new)
    return _conv_verify_candidates(tr, candidates, sigs=sigs)


def q_incremental_conv_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return incremental_conv_neardup_frame(derived_transcripts(spark, sf_dir))


def _oracle_incremental_conv_neardup() -> str:
    pair_sql = _oracle_conv_neardup().replace("ORDER BY c1, c2", "")
    new = (
        f"CAST(substr({{col}}, 6) AS BIGINT) % {_CONV_DELTA_MOD} = 0"
    )
    return f"""
WITH pairs AS ({pair_sql})
SELECT c1, c2, jaccard FROM pairs
WHERE {new.format(col='c1')} OR {new.format(col='c2')}
ORDER BY c1, c2
"""


CONV_QUERIES["incremental_conv_neardup"] = (
    q_incremental_conv_neardup,
    _oracle_incremental_conv_neardup(),
)
