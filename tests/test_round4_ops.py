"""Round-4 operator tests: search-as-you-type prefix semantics,
maintained-generation report constructors, and generation compaction."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def test_prefix_search_semantics(spark):
    """The Meili prefix rule, pinned case by case: the last term expands
    to every vocabulary word it prefixes (damped 0.5), non-last terms are
    whole-word only, a last term matching nothing contributes nothing,
    and a COMPLETE last word scores exact-only — never additionally as
    its own prefix."""
    from pyspark.sql import functions as F

    from janet_spark.queries_relational import t
    from janet_spark.search import (
        _PREFIX_QUERIES,
        _index_relations,
        _tokens,
        q_prefix_search,
    )

    rows = q_prefix_search(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {1, 2, 3, 4}

    docs = t(spark, SF, "documents")
    vocab = {
        r["tok"]
        for r in docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
        .distinct()
        .collect()
    }
    s_words = {w for w in vocab if w.startswith("s")}
    assert len(s_words) >= 5  # "merge s" genuinely multi-expands

    # q1 "merge s": every returned doc matches 'merge' or an s-word
    # (src7/en tenant); brute-force the expected doc set
    tenant = docs.filter((F.col("source") == "src7") & (F.col("lang") == "en"))
    expected_docs = {
        r["doc_id"]
        for r in tenant.select(
            "doc_id", F.explode(_tokens(F.col("text"))).alias("tok")
        )
        .filter(F.col("tok").isin(list(s_words | {"merge"})))
        .select("doc_id")
        .distinct()
        .collect()
    }
    got_docs = {r["doc_id"] for r in by_q[1]}
    assert got_docs <= expected_docs and got_docs

    # q4 "window" (complete word): identical to plain BM25 ranked search
    # for the single exact term — the word must NOT double-score as its
    # own prefix. Reuse the ranked_search machinery on the same queries.
    from janet_spark.search import _BM25_K1, _BM25_B, _TOP_K  # noqa: F401

    tf, dl, stats, df_t = _index_relations(docs)
    n_docs, avgdl = stats.collect()[0]
    df_window = {r["tok"]: r["df"] for r in df_t.collect()}["window"]
    import math

    idf = math.log(1.0 + (n_docs - df_window + 0.5) / (df_window + 0.5))
    w_docs = (
        tf.filter(
            (F.col("tok") == "window")
            & (F.col("source") == "src12")
            & (F.col("lang") == "en")
        )
        .join(dl, "doc_id")
        .collect()
    )
    expected_scores = {
        r["doc_id"]: round(
            idf
            * r["tf"]
            * (_BM25_K1 + 1)
            / (
                r["tf"]
                + _BM25_K1 * ((1 - _BM25_B) + _BM25_B * r["dl"] / avgdl)
            ),
            4,
        )
        for r in w_docs
    }
    got_scores = {r["doc_id"]: r["score"] for r in by_q[4]}
    for doc_id, score in got_scores.items():
        assert score == pytest.approx(expected_scores[doc_id], abs=1e-4)

    # q2 "spark data pipe": 'pipe' prefixes nothing in this vocabulary,
    # so results equal the two-term query — every hit contains spark/data
    hit2 = {r["doc_id"] for r in by_q[2]}
    tenant2 = docs.filter((F.col("source") == "src18") & (F.col("lang") == "en"))
    sd_docs = {
        r["doc_id"]
        for r in tenant2.select(
            "doc_id", F.explode(_tokens(F.col("text"))).alias("tok")
        )
        .filter(F.col("tok").isin(["spark", "data"]))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert hit2 <= sd_docs and hit2

    assert all(len(v) <= 10 for v in by_q.values())


def test_conv_verify_prefilter_conservative_and_bounding(spark):
    """Round-3 verdict #4: the estimated-Jaccard prefilter must (a) never
    change the verify tail's output, and (b) kill a hot-bucket star
    candidate against a huge representative BEFORE its shingles reach the
    intersection join."""
    from pyspark.sql import functions as F

    from janet_spark.conversations import (
        _conv_verify_candidates,
        _sig_prefilter,
        conv_sig_df,
    )
    from janet_spark.derive import derived_transcripts

    tr = derived_transcripts(spark, "/root/testdata/sf0.001")
    # a "mega" representative: 2000 unique turns under one conv_id
    mega = spark.range(2000).select(
        F.lit("aaa-mega").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("mega content "), F.col("id").cast("string")).alias("text"),
        F.lit("").alias("tool"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
    )
    corpus = tr.unionByName(mega)
    sigs = conv_sig_df(corpus).persist()

    # candidates: every sf0.001 conversation starred against the mega rep
    # (what a degenerate bucket with rep=aaa-mega would emit), plus real
    # same-corpus candidate pairs that carry the genuine near-dup signal
    convs = tr.select("conv_id").distinct()
    star = convs.select(
        F.lit("aaa-mega").alias("c1"), F.col("conv_id").alias("c2")
    )
    from janet_spark.conversations import conv_band_df

    bands = conv_band_df(corpus, sigs=sigs)
    a, b = bands.alias("a"), bands.alias("b")
    genuine = a.join(
        b,
        (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.conv_id") < F.col("b.conv_id")),
    ).select(F.col("a.conv_id").alias("c1"), F.col("b.conv_id").alias("c2"))
    candidates = star.unionByName(genuine)

    base = {tuple(r) for r in _conv_verify_candidates(corpus, candidates).collect()}
    pref = {
        tuple(r)
        for r in _conv_verify_candidates(corpus, candidates, sigs=sigs).collect()
    }
    assert pref == base and base  # conservative: no behavior change

    surviving = _sig_prefilter(candidates.distinct(), sigs)
    assert (
        surviving.filter(
            (F.col("c1") == "aaa-mega") | (F.col("c2") == "aaa-mega")
        ).count()
        == 0
    )  # the mega rep's shingles never reach the intersection join


def test_maintained_pairs_report_equals_remined_two_generations(spark, tmp_path):
    """Round-3 verdict #3: the production report constructors consume the
    maintained pair generations. Build the pair table the production way —
    two daily incremental runs (day 1: first half as the delta against an
    empty corpus; day 2: second half against the day-1 corpus), each
    committing its pairs as a generation — and pin that the report over
    the maintained table equals the report that re-mines from scratch."""
    from pyspark.sql import functions as F

    from janet_spark.dedup_incremental import (
        incremental_dedup_run,
        read_pairs_table,
    )
    from janet_spark.queries_relational import t
    from janet_spark.queries_text import (
        dedup_report_frame,
        q_dedup_report,
        q_minhash_lsh_pairs,
    )

    sf = "/root/testdata/sf0.001"
    docs = t(spark, sf, "documents").select("doc_id", "text")
    day1 = docs.filter(F.col("doc_id") % 2 == 0)
    day2 = docs.filter(F.col("doc_id") % 2 == 1)
    sig = str(tmp_path / "sigs")
    pairs_path = str(tmp_path / "pairs")

    empty = spark.createDataFrame([], "doc_id long, text string")
    incremental_dedup_run(spark, sig, day1, empty, pairs_path=pairs_path)
    incremental_dedup_run(spark, sig, day2, day1, pairs_path=pairs_path)

    maintained = read_pairs_table(spark, pairs_path)
    mined = q_minhash_lsh_pairs(spark, sf)
    m = {(r.d1, r.d2, r.jaccard) for r in maintained.collect()}
    b = {(r.d1, r.d2, r.jaccard) for r in mined.collect()}
    assert m == b and m  # the union of daily generations IS the batch set

    full_docs = t(spark, sf, "documents")
    got = [
        tuple(r)
        for r in dedup_report_frame(full_docs, maintained).collect()
    ]
    want = [tuple(r) for r in q_dedup_report(spark, sf).collect()]
    assert got == want
