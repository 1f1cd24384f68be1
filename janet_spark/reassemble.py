"""Window-ordered conversation reassembly (operators W1 + A1).

The reference sorts async page results by pageIndex before concatenation so
output is deterministic regardless of task completion order
(``apps/search/src/useSearch.ts:146-149``); page texts join with ``'\\n'``
(``apps/legacy/src/services/pdf.ts:150-156``). Here: turns reassemble under
``(conv_id, turn_idx)`` ordering — the pipeline's LAST shuffle, restoring
order after any salting upstream.

Implementation note (scale): ``groupBy + sort_array(collect_list(struct))``
is one shuffle with map-side partial aggregation, and the sort happens
per-group after the shuffle — strictly cheaper than a window + distinct.
A 10^4-turn conversation of KB-sized turns is ~10 MB in one group: fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGE_JOIN = "\n"  # pdf.ts page join contract


def reassemble_conversations(
    extracted: DataFrame,
    text_col: str = "extracted_text",
    sep: str = PAGE_JOIN,
) -> DataFrame:
    """One row per conversation: turns concatenated in turn_idx order, plus
    rollup metrics (A2/A5 analogs)."""
    return (
        extracted.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("turn_idx"), F.col(text_col).alias("t")))
                    ),
                    lambda s: s.getField("t"),
                ),
                sep,
            ).alias("conv_text"),
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.col("blocks_kept")).alias("blocks_kept"),
            F.sum(F.col("blocks_dropped")).alias("blocks_dropped"),
            F.sum(F.col("span_count")).alias("span_count"),
            F.min(F.col("ok").cast("int")).alias("all_ok"),
        )
    )
