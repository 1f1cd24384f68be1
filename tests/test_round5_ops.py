"""Round-5 additions: ADVICE fixes (replay idempotency, pair-table
compaction distinctness), PNG decode, the parameterized search facade,
incremental IVF index maintenance, and the maintained exact-dup census."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_conv_sig_read_dedups_replayed_generation(spark, tmp_path):
    """Round-4 advice: an orchestrator replaying a run whose signature
    generation already committed lands the same conv_ids twice; the read
    must dedup so banding/census/prefilter never see doubled rows, and a
    replayed full run must not change the mined pair set."""
    from janet_spark.conversations import conv_neardup_frame
    from janet_spark.dedup_incremental import (
        incremental_conv_dedup_run,
        read_conv_pairs_table,
        read_conv_signature_table,
    )
    from janet_spark.derive import derived_transcripts

    tr = derived_transcripts(spark, "/root/testdata/sf0.001")
    ordinal = F.substring(F.col("conv_id"), 6, 10).cast("long")
    day1 = tr.filter(ordinal % 2 == 0)
    day2 = tr.filter(ordinal % 2 == 1)
    empty = spark.createDataFrame(
        [],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    sig = str(tmp_path / "conv_sigs")
    pairs_path = str(tmp_path / "conv_pairs")

    incremental_conv_dedup_run(spark, sig, day1, empty, pairs_path=pairs_path)
    # replay day 1 (crash after the sig commit, before the run was
    # recorded): same conv_ids land under a second generation id
    incremental_conv_dedup_run(spark, sig, day1, empty, pairs_path=pairs_path)
    incremental_conv_dedup_run(spark, sig, day2, day1, pairs_path=pairs_path)

    sigs = read_conv_signature_table(spark, sig)
    n_convs = tr.select("conv_id").distinct().count()
    assert sigs.count() == n_convs  # deduped on read despite the replay
    maintained = {
        (r.c1, r.c2, r.jaccard)
        for r in read_conv_pairs_table(spark, pairs_path).collect()
    }
    batch = {(r.c1, r.c2, r.jaccard) for r in conv_neardup_frame(tr).collect()}
    assert maintained == batch and maintained


def test_compact_pairs_table_distinct_squeezes_retry_duplicates(spark, tmp_path):
    """Round-4 advice: pair generations are NOT disjoint (a retry
    re-commits identical pairs under a new generation id), so pair-table
    compaction must distinct the union rather than bake the duplicates
    into the compacted generation."""
    from janet_spark.dedup_incremental import (
        PAIRS_SCHEMA,
        _write_generation,
        compact_generations,
        read_pairs_table,
    )

    pairs = str(tmp_path / "pairs")
    day1 = spark.createDataFrame([(1, 2, 0.9), (3, 4, 0.8)], PAIRS_SCHEMA)
    _write_generation(day1, pairs, "run-1000-day")
    # the retry: identical pairs re-committed under a new generation
    _write_generation(day1, pairs, "run-1001-retry")
    day2 = spark.createDataFrame([(5, 6, 0.7)], PAIRS_SCHEMA)
    _write_generation(day2, pairs, "run-1002-day")
    _write_generation(
        spark.createDataFrame([(7, 8, 0.6)], PAIRS_SCHEMA), pairs, "run-1003-day"
    )

    before = sorted(
        (r.d1, r.d2, r.jaccard)
        for r in read_pairs_table(spark, pairs).collect()
    )
    summary = compact_generations(
        spark, pairs, PAIRS_SCHEMA, keep_latest=1, distinct=True
    )
    assert summary["compacted"] and summary["n_absorbed"] == 3
    # the compacted generation holds the DISTINCT union: 3 pairs, not 5
    assert summary["rows"] == 3
    gens = [d for d in os.listdir(pairs) if "compacted-" in d]
    assert len(gens) == 1
    raw = spark.read.schema(PAIRS_SCHEMA).parquet(os.path.join(pairs, gens[0]))
    assert raw.count() == 3  # duplicates squeezed out on disk, not just on read
    after = sorted(
        (r.d1, r.d2, r.jaccard)
        for r in read_pairs_table(spark, pairs).collect()
    )
    assert after == before


def test_state_dir_env_override(tmp_path, monkeypatch):
    """JANET_SPARK_STATE_DIR points maintained state at a durable root
    instead of the world-shared OS temp dir."""
    from janet_spark.dedup_incremental import state_dir_for_input

    d = state_dir_for_input("/root/testdata/sf0.001", "documents.parquet", "x")
    assert d.startswith(os.path.join("/tmp", "janet_spark_state")) or (
        "janet_spark_state" in d
    )
    monkeypatch.setenv("JANET_SPARK_STATE_DIR", str(tmp_path / "durable"))
    d2 = state_dir_for_input("/root/testdata/sf0.001", "documents.parquet", "x")
    assert d2.startswith(str(tmp_path / "durable"))
    assert os.path.basename(d2) == os.path.basename(d)  # fingerprint unchanged
