"""Window-ordered conversation reassembly (operators W1 + A1).

The reference sorts async page results by pageIndex before concatenation so
output is deterministic regardless of task completion order
(``apps/search/src/useSearch.ts:146-149``); page texts join with ``'\\n'``
(``apps/legacy/src/services/pdf.ts:150-156``). Here: turns reassemble under
``(conv_id, turn_idx)`` ordering — the pipeline's LAST shuffle, restoring
order after any upstream salting.

Scale design — TWO-LEVEL ordered concat. A single
``groupBy(conv_id).collect_list`` puts a whole conversation in one group;
at 10^12-turn scale a skewed 10^6-turn conversation would serialize (and
OOM) its reducer. Instead turns first aggregate per ``(conv_id,
turn_idx div CHUNK)`` — contiguous turn ranges, so chunk order IS turn
order — then the per-chunk strings (already concatenated, far fewer rows)
merge per conversation ordered by chunk index. Both aggregations are
map-side combinable; the skewed conversation's work spreads across
``n_turns / CHUNK`` reducers in level 1 and its level-2 group holds only
chunk-count rows. This is the reassembly-side salting the north rule asks
for: the salt is ``turn_idx div CHUNK``, chosen contiguous so ordering
survives the split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGE_JOIN = "\n"  # pdf.ts page join contract

# turns per level-1 chunk: a chunk of KB-sized turns is a few MB of string —
# comfortably one reducer's work; a 10^6-turn conversation becomes ~244
# level-1 groups instead of one.
REASSEMBLE_CHUNK = 4096


def _ordered_concat(key_col: str, text_col: str, sep: str):
    return F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col(key_col), F.col(text_col).alias("t")))
            ),
            lambda s: s.getField("t"),
        ),
        sep,
    )


def reassemble_conversations(
    extracted: DataFrame,
    text_col: str = "extracted_text",
    sep: str = PAGE_JOIN,
    chunk: int = REASSEMBLE_CHUNK,
) -> DataFrame:
    """One row per conversation: turns concatenated in turn_idx order, plus
    rollup metrics (A2/A5 analogs). Two-level chunked concat (see module
    docstring) so no single reducer ever holds a whole skewed conversation.
    """
    lvl1 = (
        extracted.withColumn(
            "_chunk", F.floor(F.col("turn_idx") / F.lit(chunk)).cast("int")
        )
        .groupBy("conv_id", "_chunk")
        .agg(
            _ordered_concat("turn_idx", text_col, sep).alias("_chunk_text"),
            F.count(F.lit(1)).alias("_n_turns"),
            F.sum(F.col("blocks_kept")).alias("_blocks_kept"),
            F.sum(F.col("blocks_dropped")).alias("_blocks_dropped"),
            F.sum(F.col("span_count")).alias("_span_count"),
            F.min(F.col("ok").cast("int")).alias("_all_ok"),
        )
    )
    return lvl1.groupBy("conv_id").agg(
        _ordered_concat("_chunk", "_chunk_text", sep).alias("conv_text"),
        F.sum("_n_turns").alias("n_turns"),
        F.sum("_blocks_kept").alias("blocks_kept"),
        F.sum("_blocks_dropped").alias("blocks_dropped"),
        F.sum("_span_count").alias("span_count"),
        F.min("_all_ok").alias("all_ok"),
    )
