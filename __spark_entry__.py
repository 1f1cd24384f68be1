"""Driver contract for the spark-graft builder (PySpark target).

`entry` runs the flagship extraction pipeline (derived transcripts ->
salted repartition -> Arrow-batched extraction UDF -> window-ordered
reassembly) at sf0.001. `queries()` registers every implemented operator
from SURVEY.md §2 plus the training-data-pipeline operators; `oracle_sql()`
returns the independent DuckDB SQL for each SQL-expressible one.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


# The driver records the FIRST 50 registry entries in CORRECTNESS_r{N}.json;
# queries past the cap are verified out-of-band via
# `scripts/check_oracles.py <sf_dir> <names...>` (full-registry run
# committed as ORACLE_CHECK_r{N}.json). Exposure therefore ROTATES per
# round. Round-4 rotation: (a) the 4 queries new this round, then (b)
# every query NEVER recorded by any driver run (r1∪r2∪r3 covered 102 of
# the registry; the 25 below close the gap), then (c) the queries whose
# only driver record is oldest (r1-only, then r2). After this round's
# gate, every registered query has at least one driver-recorded green row.
_PRIORITY = [
    # (a) new in round 4
    "prefix_search",
    "suggest_search",
    "incremental_embed_neardup",
    "ann_ivf_topk_indexed",
    "dedup_report_incremental",
    "contrastive_pairs_incremental",
    "token_counts_bpe_1k",
    # (b) never driver-recorded before this round
    "dedup_clusters_lsh",
    "doc_fingerprint_jvm",
    "quality_repetition",
    "chunk_dedup",
    "decontaminate",
    "lm_score",
    "sequence_pack",
    "curation_pipeline_v2",
    "mixture_weights",
    "disjunctive_upsert",
    "label_array_filter",
    "flaky_enrichment",
    "asof_join",
    "range_join_banded",
    "pii_scrub",
    "hash_sample",
    "image_header_probe",
    "authorized_events",
    "curation_pipeline",
    "event_type_pivot",
    "set_ops_users",
    "lateral_top_orders",
    "stratified_sample",
    "unpivot_doc_stats",
    "rank_functions",
    # (c) oldest driver record: r1-only...
    "match_navigation",
    "rollup_revenue",
    # ...then r2 (not recorded in r3)
    "ann_cosine_topk",
    "ann_ivf_topk",
    "broadcast_brand_revenue",
    "canonical_rename_sql",
    "clean_canonicalize",
    "clean_canonicalize_jvm",
    "customer_order_fulljoin",
    "dedup_clusters",
    "distinct_users",
    "doc_fingerprint",
    "embed_neardup_blocked",
    "exact_dedup",
    "extract_turns",
    "frame_sample",
    "fs_safe_timestamp",
    "html_strip",
    "json_props_histogram",
    "keyword_match_count",
]


def _registry():
    from janet_spark.conversations import CONV_QUERIES
    from janet_spark.dialogue import DIALOGUE_QUERIES
    from janet_spark.queries_extra import EXTRA_QUERIES
    from janet_spark.queries_relational import RELATIONAL_QUERIES
    from janet_spark.queries_text import TEXT_QUERIES
    from janet_spark.search import SEARCH_QUERIES

    merged: dict[str, tuple] = {}
    merged.update(RELATIONAL_QUERIES)
    merged.update(TEXT_QUERIES)
    merged.update(EXTRA_QUERIES)
    merged.update(SEARCH_QUERIES)
    merged.update(CONV_QUERIES)
    merged.update(DIALOGUE_QUERIES)
    reg: dict[str, tuple] = {}
    for name in _PRIORITY:
        if name in merged:
            reg[name] = merged[name]
    for name, entry in merged.items():
        if name not in reg:
            reg[name] = entry
    return reg


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline + conversation reassembly at
    sf0.001; driver checks rows > 0 and a stable schema."""
    from janet_spark.derive import derived_transcripts
    from janet_spark.pipeline import extract_only
    from janet_spark.reassemble import reassemble_conversations
    from janet_spark.session import tune_for_session

    tune_for_session(spark)
    transcripts = derived_transcripts(spark, SF0001)
    extracted = extract_only(transcripts)
    return reassemble_conversations(extracted).select(
        "conv_id", "conv_text", "n_turns", "blocks_kept", "blocks_dropped", "all_ok"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + training-data
    ops). Each callable takes (spark, sf_dir) and returns a DataFrame with
    columns aliased identically to the oracle SQL."""
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (omitted for non-SQL-expressible
    operators: simhash bit manipulation, char-span offset arrays)."""
    return {name: sql for name, (_fn, sql) in _registry().items() if sql is not None}
