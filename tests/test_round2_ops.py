"""Round-2 operator tests: fixed-k IVF centroids, bounded near-dup block
tasks (hot-label triangle partitioning), the reference's full keyword
normalization semantics (empty-keyword sentinels, RegExp passthrough,
dialect divergence), multi-keyword single-pass search, and the disjunctive
OR-key upsert's equivalence to the reference's sequential find-and-replace.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# IVF: centroid count is a constant, independent of table size
# ---------------------------------------------------------------------------


def test_ivf_centroid_count_fixed(spark):
    from janet_spark.queries_extra import _IVF_K, ivf_centroids
    from janet_spark.queries_relational import t

    emb = t(spark, SF, "embeddings")
    small = ivf_centroids(emb)
    assert len(small) == _IVF_K

    # simulate a 5x bigger table: centroid count must NOT grow
    bigger = emb.unionByName(
        emb.select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        )
    )
    big = ivf_centroids(bigger)
    assert len(big) == _IVF_K


# ---------------------------------------------------------------------------
# near-dup triangle partitioning: hot block, bounded tasks, exact output
# ---------------------------------------------------------------------------


def test_embed_neardup_hot_block_bounded(spark, tmp_path):
    # one deliberately hot label (120 rows) next to a small one; chunk cap 16
    # => the hot block must split into ceil(120/16)=8 chunks / 36 chunk-pair
    # tasks, and the pair set must equal the brute-force all-pairs answer.
    rng = np.random.RandomState(7)
    n_hot, n_cold, dim = 120, 9, 8
    rows = []
    for i in range(n_hot):
        rows.append((1, i, rng.randn(dim).astype(float).tolist()))
    for i in range(n_cold):
        rows.append((2, 1000 + i, rng.randn(dim).astype(float).tolist()))
    pdf = pd.DataFrame(rows, columns=["label", "vec_id", "embedding"])
    path = str(tmp_path / "emb")
    spark.createDataFrame(
        pdf, "label int, vec_id long, embedding array<float>"
    ).write.parquet(path + "/embeddings.parquet")

    from janet_spark.queries_text import q_embed_neardup_blocked

    got = (
        q_embed_neardup_blocked(spark, path, chunk_rows=16)
        .toPandas()
        .sort_values(["label", "v1", "v2"])
        .reset_index(drop=True)
    )

    # brute-force oracle in numpy
    expect = []
    for label in (1, 2):
        sub = pdf[pdf.label == label].reset_index(drop=True)
        m = np.array(list(sub["embedding"]), dtype=np.float64)
        # mirror the float32 parquet round trip the Spark path reads
        m = m.astype(np.float32).astype(np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(mn @ mn.T, 4)
        ids = sub["vec_id"].to_numpy()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= 0.4:
                    expect.append(
                        (label, min(ids[i], ids[j]), max(ids[i], ids[j]), sims[i, j])
                    )
    exp = (
        pd.DataFrame(expect, columns=["label", "v1", "v2", "sim"])
        .sort_values(["label", "v1", "v2"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got.astype({"label": "int64", "v1": "int64", "v2": "int64"}),
        exp.astype({"label": "int64", "v1": "int64", "v2": "int64"}),
        check_exact=False,
        atol=1e-9,
    )


# ---------------------------------------------------------------------------
# T2: empty-keyword sentinels, RegExp passthrough, dialect divergence
# ---------------------------------------------------------------------------


def test_empty_keyword_search_dialect_matches_spaces():
    from janet_spark.extract.spans import find_matches, normalize_single_keyword

    nk = normalize_single_keyword("", dialect="search")
    assert nk.keyword == "" and nk.pattern.pattern == " " and not nk.whole_words
    # the sentinel matches literal spaces, NOT zero-width everywhere
    matches = find_matches("a b c", nk.pattern, nk.whole_words)
    assert [(s, e) for _, s, e in matches] == [(1, 2), (3, 4)]


def test_empty_keyword_web_dialect_zero_width():
    from janet_spark.extract.spans import find_matches, normalize_single_keyword

    nk = normalize_single_keyword("", dialect="web")
    assert nk.pattern.pattern == ""
    # `new RegExp("", "g")` matches zero-width at every position incl. EOS —
    # the deliberate divergence between the web and search apps
    matches = find_matches("ab", nk.pattern, nk.whole_words)
    assert [(s, e) for _, s, e in matches] == [(0, 0), (1, 1), (2, 2)]


def test_regexp_passthrough_preserves_pattern_and_flags():
    from janet_spark.extract.spans import normalize_single_keyword

    rx = re.compile(r"so?rt", re.IGNORECASE)
    nk = normalize_single_keyword(rx)
    assert nk.pattern is rx  # used verbatim, no escaping, no padding
    assert nk.keyword == r"so?rt"
    assert not nk.whole_words
    nk2 = normalize_single_keyword(rx, whole_words=True)
    assert nk2.whole_words and nk2.pattern is rx  # flag set, still no padding


def test_flag_keyword_dict_with_overrides():
    from janet_spark.extract.spans import normalize_single_keyword

    nk = normalize_single_keyword(
        {"keyword": "a.b", "match_case": False}, match_case=True, whole_words=True
    )
    # explicit args override the dict (normalizeKeyword.ts:52-57)
    assert nk.pattern.pattern == r"\ a\.b\ " or nk.pattern.pattern == " a\\.b "
    assert nk.pattern.flags & re.IGNORECASE == 0
    assert nk.whole_words


# ---------------------------------------------------------------------------
# multi-keyword single pass: per-keyword ordinals over one scan
# ---------------------------------------------------------------------------


def test_multi_keyword_spans_per_keyword_ordinals(spark, tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["sort the data then sort the tree data"],
        }
    )
    path = str(tmp_path / "docs")
    spark.createDataFrame(docs).write.parquet(path + "/documents.parquet")
    from janet_spark.queries_extra import q_multi_keyword_spans

    out = q_multi_keyword_spans(spark, path).toPandas()
    by_kw = {
        k: list(zip(g["match_idx"], g["start"]))
        for k, g in out.groupby("keyword")
    }
    assert by_kw["sort"] == [(0, 0), (1, 19)]
    assert by_kw["data"] == [(0, 9), (1, 33)]
    assert by_kw["tree"] == [(0, 28)]


# ---------------------------------------------------------------------------
# LSH hot-bucket cap: degenerate band key -> star expansion, O(b) candidates
# ---------------------------------------------------------------------------


def test_lsh_hot_bucket_star_cap(spark, tmp_path):
    # 40 identical docs (every band key degenerate, bucket size 40) plus two
    # distinct near-dup docs; cap=10 forces the star path for the hot
    # cluster while the near-dup pair still arrives via the cold path.
    same = "alpha beta gamma delta epsilon zeta eta theta " * 4
    near_a = "one two three four five six seven eight nine ten eleven twelve"
    near_b = "one two three four five six seven eight nine ten eleven twelve!"
    rows = [(i, same) for i in range(40)]
    rows += [(100, near_a), (101, near_a), (200, near_b)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    path = str(tmp_path / "docs")
    spark.createDataFrame(pdf).write.parquet(path + "/documents.parquet")

    from janet_spark.queries_text import q_minhash_lsh_pairs

    out = q_minhash_lsh_pairs(spark, path, hot_bucket_cap=10).toPandas()
    hot = out[out.d1 < 100]
    # star: every hot member pairs with the representative (min doc_id=0)
    # only — 39 pairs, NOT 40*39/2=780
    assert len(hot) == 39
    assert set(hot["d1"]) == {0}
    assert set(hot["d2"]) == set(range(1, 40))
    assert (hot["jaccard"] == 1.0).all()
    # cold path unaffected: the identical near-dup pair survives
    assert {(100, 101)} <= set(zip(out["d1"], out["d2"]))


# ---------------------------------------------------------------------------
# lineage dir mixing Spark-written (INT96 ts) and pyarrow-written files
# ---------------------------------------------------------------------------


def test_mixed_lineage_writers_resume(spark, tmp_path):
    from datetime import datetime, timezone

    from janet_spark import checkpoint as ckpt

    out = str(tmp_path / "out")
    ldir = ckpt.lineage_dir(out)

    # generation 1: a Spark job wrote the lineage file (INT96 timestamps,
    # Spark's default parquet physical type) — the pre-round-2 layout
    now = datetime.now(timezone.utc)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        spark.createDataFrame(
            [("run-old", 3, "success", None, 10, 10, now, now)],
            ckpt.LINEAGE_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(ldir)
    finally:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")

    # generation 2: the pyarrow fast path appends (timestamp[us, UTC])
    ckpt.write_lineage(
        out,
        [
            {
                "run_id": "run-new",
                "part_bucket": 7,
                "status": "success",
                "error": None,
                "n_turns": 5,
                "n_ok": 5,
                "started_at": now,
                "finished_at": now,
            }
        ],
    )

    # resume must see both generations through one mixed-schema read
    assert ckpt.completed_buckets(spark, out) == {3, 7}


# ---------------------------------------------------------------------------
# small-files compaction: verify-then-swap, content preserved, count shrinks
# ---------------------------------------------------------------------------


def test_compaction_merges_small_files_and_preserves_rows(spark, tmp_path):
    from janet_spark.compaction import compact_dir, dir_parquet_stats

    path = str(tmp_path / "frag")
    # 40 tiny appends -> 40+ small files
    for i in range(40):
        spark.range(i * 10, i * 10 + 10).selectExpr(
            "id", "concat('row-', id) AS s"
        ).coalesce(1).write.mode("append").parquet(path)
    before_files, _ = dir_parquet_stats(path)
    assert before_files >= 40
    before = {
        (r["id"], r["s"]) for r in spark.read.parquet(path).collect()
    }

    # a 1 MB target => everything fits in one file
    summary = compact_dir(spark, path, target_file_mb=1)
    assert summary["compacted"]
    assert summary["n_files_after"] < before_files
    assert summary["rows"] == 400
    after = {(r["id"], r["s"]) for r in spark.read.parquet(path).collect()}
    assert after == before
    # idempotent: second call is a no-op
    again = compact_dir(spark, path, target_file_mb=1)
    assert not again["compacted"]

    # guard: refuses a partitioned root (would flatten the layout)
    import pytest as _pytest

    part_root = str(tmp_path / "rooted")
    spark.range(100).selectExpr("id", "id % 3 AS p").write.partitionBy(
        "p"
    ).parquet(part_root)
    with _pytest.raises(ValueError, match="leaf partition"):
        compact_dir(spark, part_root, target_file_mb=1)


# ---------------------------------------------------------------------------
# PII scrub on text that actually contains PII (the sf corpus has none,
# so the oracle row alone would be vacuous) + as-of join edge semantics
# ---------------------------------------------------------------------------


def test_pii_scrub_redacts_and_counts(spark, tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "contact a.user+tag@example.co.uk or +1-555-123-4567 now",
                "twice: x@y.io and z@w.dev, phone (555) 987 6543",
                "no pii here",
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [10, 10, 10],
        }
    )
    path = str(tmp_path / "docs")
    spark.createDataFrame(docs).write.parquet(path + "/documents.parquet")
    from janet_spark.queries_extra import q_pii_scrub

    out = q_pii_scrub(spark, path).toPandas().set_index("doc_id")
    assert out.loc[1, "scrubbed"] == "contact <EMAIL> or <PHONE> now"
    assert out.loc[1, "n_emails"] == 1 and out.loc[1, "n_phones"] == 1
    assert out.loc[2, "scrubbed"] == "twice: <EMAIL> and <EMAIL>, phone <PHONE>"
    assert out.loc[2, "n_emails"] == 2 and out.loc[2, "n_phones"] == 1
    assert out.loc[3, "scrubbed"] == "no pii here"
    assert out.loc[3, "n_emails"] == 0 and out.loc[3, "n_phones"] == 0


def test_asof_join_inclusive_at_equal_ts(spark, tmp_path):
    # an order exactly AT the event timestamp must match ('at or before'),
    # and an event before any order must yield nulls
    path = str(tmp_path / "d")
    ts = pd.to_datetime
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": [ts("2024-01-10"), ts("2024-01-05"), ts("2023-12-01")],
            "user_id": [7, 7, 7],
            "event_type": ["click"] * 3,
            "value": [0.0] * 3,
            "props": [""] * 3,
        }
    )
    od = pd.DataFrame(
        {
            "o_orderkey": [100, 200],
            "o_custkey": [7, 7],
            "o_orderstatus": ["F", "F"],
            "o_totalprice": [10.0, 20.0],
            "o_orderdate": [ts("2024-01-05"), ts("2024-01-01")],
            "o_orderpriority": ["1", "1"],
        }
    )
    spark.createDataFrame(ev).write.parquet(path + "/events.parquet")
    spark.createDataFrame(od).write.parquet(path + "/orders.parquet")
    from janet_spark.queries_extra import q_asof_join

    out = q_asof_join(spark, path).toPandas().set_index("event_id")
    assert out.loc[1, "o_orderkey"] == 100  # latest before 01-10
    assert out.loc[2, "o_orderkey"] == 100  # order AT event ts matches
    assert pd.isna(out.loc[3, "o_orderkey"])  # no order yet -> null


# ---------------------------------------------------------------------------
# partition pruning: a date-partitioned layout + an equality filter must
# scan ONLY the matching partition directories
# ---------------------------------------------------------------------------


def test_partition_pruning_scans_only_matching_dirs(spark, tmp_path):
    path = str(tmp_path / "by_day")
    df = spark.range(3000).selectExpr(
        "id",
        "concat('2024-01-0', cast(id % 5 + 1 AS string)) AS day",
        "id * 2 AS v",
    )
    df.write.partitionBy("day").mode("overwrite").parquet(path)

    q = spark.read.parquet(path).filter(F.col("day") == "2024-01-03").select("id", "v")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the day predicate must prune at the directory level, not post-scan
    assert "PartitionFilters" in plan and "2024-01-03" in plan, plan
    import re as _re

    m = _re.search(r"partition count[:=]?\s*(\d+)", plan, _re.I)
    if m:  # Spark prints the pruned partition count in the scan node
        assert int(m.group(1)) == 1, plan
    assert q.count() == 600


# ---------------------------------------------------------------------------
# bucketed co-located join: zero Exchange on either side
# ---------------------------------------------------------------------------


def test_bucketed_join_no_shuffle(spark, tmp_path):
    from janet_spark.bucketing import bucketed_join, write_bucketed

    convs = spark.range(500).selectExpr(
        "concat('conv-', id) AS conv_id", "id % 7 AS meta"
    )
    turns = spark.range(2000).selectExpr(
        "concat('conv-', id % 500) AS conv_id", "cast(id AS int) AS turn_idx"
    )
    write_bucketed(convs, "t_convs_bkt", "conv_id", n_buckets=8)
    write_bucketed(turns, "t_turns_bkt", "conv_id", n_buckets=8)
    # force the shuffle-join path (tiny test tables would broadcast, and a
    # BroadcastExchange would mask what we're demonstrating: at 100 TB
    # neither side broadcasts, and bucketing is what removes the shuffle)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_convs_bkt", "t_turns_bkt", "conv_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the whole point: co-located buckets, no shuffle on either side
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_convs_bkt")
        spark.sql("DROP TABLE IF EXISTS t_turns_bkt")


# ---------------------------------------------------------------------------
# C4/C5/X4/X5: retry loop, backoff schedule, timeout race, tolerant map
# ---------------------------------------------------------------------------


def test_retry_backoff_schedule_matches_reference():
    from janet_spark.resilience import RetryPolicy, call_with_retries

    calls = []
    slept = []

    def flaky():
        calls.append(1)
        if len(calls) < 4:
            raise RuntimeError("boom")
        return "done"

    out = call_with_retries(
        flaky,
        policy=RetryPolicy(max_retries=3, base_delay=1.0, timeout=None),
        sleep=slept.append,
        jitter=lambda: 0.25,
    )
    assert out == "done"
    assert len(calls) == 4  # 3 retries AFTER the first attempt
    # baseDelay * 2^(retries-1) + jitter  ->  1.25, 2.25, 4.25
    assert slept == [1.25, 2.25, 4.25]


def test_retry_exhaustion_reraises():
    import pytest as _pytest

    from janet_spark.resilience import RetryPolicy, call_with_retries

    def always_fails():
        raise ValueError("permanent")

    with _pytest.raises(ValueError, match="permanent"):
        call_with_retries(
            always_fails,
            policy=RetryPolicy(max_retries=2, timeout=None),
            sleep=lambda _s: None,
        )


def test_attempt_timeout_races_not_cancels():
    import time as _time

    from janet_spark.resilience import (
        AttemptTimeout,
        RetryPolicy,
        call_with_retries,
    )

    state = {"finished": False}

    def slow():
        _time.sleep(0.5)
        state["finished"] = True
        return "late"

    with pytest.raises(AttemptTimeout):
        call_with_retries(
            slow,
            policy=RetryPolicy(max_retries=0, timeout=0.05),
            sleep=lambda _s: None,
        )
    _time.sleep(0.6)
    # Promise.race semantics: the losing attempt ran to completion
    assert state["finished"]


def test_hung_call_does_not_poison_later_elements():
    import time as _time

    from janet_spark.resilience import RetryPolicy, tolerant_map

    hung = {"started": 0}

    def svc(x):
        if x == "hang":
            hung["started"] += 1
            _time.sleep(30)  # far beyond the timeout; thread is abandoned
            return "late"
        return x.upper()

    t0 = _time.time()
    out = tolerant_map(
        ["a", "hang", "b", "c"],
        svc,
        policy=RetryPolicy(max_retries=1, timeout=0.05),
        sleep=lambda _s: None,
    )
    elapsed = _time.time() - t0
    # the hung element fails by timeout; every LATER element still succeeds
    # promptly instead of queueing behind the stuck worker
    assert out[0] == ("A", True, None)
    assert out[1][1] is False and "AttemptTimeout" in out[1][2]
    assert out[2] == ("B", True, None)
    assert out[3] == ("C", True, None)
    assert hung["started"] == 2  # first attempt + 1 retry, both abandoned
    assert elapsed < 5


def test_tolerant_map_mixed_outcomes():
    from janet_spark.resilience import RetryPolicy, tolerant_map

    attempts = {}

    def svc(x):
        a = attempts.get(x, 0)
        attempts[x] = a + 1
        if x == "dead":
            raise RuntimeError("down")
        if x == "flaky" and a < 2:
            raise RuntimeError("transient")
        return x.upper()

    out = tolerant_map(
        ["good", "flaky", "dead"],
        svc,
        policy=RetryPolicy(max_retries=3, timeout=None),
        sleep=lambda _s: None,
    )
    assert out[0] == ("GOOD", True, None)
    assert out[1] == ("FLAKY", True, None)
    assert out[2][0] is None and out[2][1] is False and "down" in out[2][2]
    assert attempts == {"good": 1, "flaky": 3, "dead": 4}


# ---------------------------------------------------------------------------
# J3: batch OR-key upsert == the reference's sequential find-and-replace
# ---------------------------------------------------------------------------


def _sequential_upsert(base: list[dict], updates: list[dict]) -> list[dict]:
    """The reference's loop (file.ts:41-49): find first row matching on
    either key, replace in place, else append."""
    rows = [dict(r) for r in base]
    for u in updates:
        for i, r in enumerate(rows):
            if r["old_name"] == u["old_name"] or r["new_name"] == u["new_name"]:
                rows[i] = dict(u)
                break
        else:
            rows.append(dict(u))
    return rows


def test_disjunctive_upsert_matches_sequential_reference(spark):
    # distinct-keyed updates (the batch MERGE precondition): set-equivalence
    # between the distributed anti-join-chain and the sequential loop
    base = [
        {"old_name": f"doc-{i}.pdf", "new_name": f"renamed-{i}.pdf", "gen": 1}
        for i in range(6)
    ]
    updates = [
        {"old_name": "doc-2.pdf", "new_name": "renamed-99.pdf", "gen": 2},  # old hit
        {"old_name": "doc-77.pdf", "new_name": "renamed-4.pdf", "gen": 2},  # new hit
        {"old_name": "doc-88.pdf", "new_name": "renamed-88.pdf", "gen": 2},  # append
    ]
    expect = sorted(
        (
            (r["old_name"], r["new_name"], r["gen"])
            for r in _sequential_upsert(base, updates)
        )
    )

    b = spark.createDataFrame(pd.DataFrame(base))
    u = spark.createDataFrame(pd.DataFrame(updates))
    survivors = b.join(
        F.broadcast(u.select("old_name")), "old_name", "left_anti"
    ).join(F.broadcast(u.select("new_name")), "new_name", "left_anti")
    got = sorted(
        (r["old_name"], r["new_name"], r["gen"])
        for r in survivors.select("old_name", "new_name", "gen").unionByName(u).collect()
    )
    assert got == expect


# ---------------------------------------------------------------------------
# format round-trips: the transcript schema survives csv/json/orc/parquet
# with adversarial text payloads (newlines, quotes, commas, unicode)
# ---------------------------------------------------------------------------


def test_transcript_format_roundtrips(spark, tmp_path):
    from janet_spark.sources import read_transcripts, write_transcripts

    from datetime import datetime

    ts = datetime(2024, 1, 1, 0, 0, 0, 123456)
    rows = [
        ("c-1", 0, "user", 'line1\nline2, "quoted", comma', "", ts),
        ("c-1", 1, "assistant", "tabs\tand\tunicode: ﬁñ中文", '{"output":"x"}', ts),
        ("c-2", 0, "user", "", None, ts),
        ("c-2", 1, "end", None, "", ts),
    ]
    src = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    want = sorted(map(tuple, src.collect()))
    for fmt in ("parquet", "orc", "json", "csv"):
        p = str(tmp_path / fmt)
        write_transcripts(src, p, format=fmt)
        back = read_transcripts(spark, p, format=fmt)
        got = sorted(map(tuple, back.collect()))
        # csv cannot distinguish null from empty string (both serialize
        # empty) — normalize that one lossy case, assert the rest exact
        if fmt == "csv":
            norm = lambda t: tuple("" if v is None else v for v in t)
            assert [norm(t) for t in got] == [norm(t) for t in want], fmt
        else:
            assert got == want, fmt


# ---------------------------------------------------------------------------
# connected components: chain, clique, isolated pair — exact labels
# ---------------------------------------------------------------------------


def test_connected_components_known_graph(spark):
    from janet_spark.queries_text import connected_components

    # components: chain {1-2-3-4}, triangle {10,11,12}, pair {20,21}
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (21, 20)],
        "d1 long, d2 long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_whole_words_zero_width_pattern_terminates():
    # a passthrough RegExp that can match zero-width, combined with
    # whole_words=True, must terminate (regression: the whole_words branch
    # lacked the zero-width guard and looped forever)
    from janet_spark.extract.spans import find_matches, normalize_single_keyword

    nk = normalize_single_keyword(re.compile("a*"), whole_words=True)
    matches = find_matches("bbb", nk.pattern, nk.whole_words)
    assert len(matches) == 4  # zero-width at 0,1,2,3 — and it RETURNED


def test_read_transcripts_casts_wider_parquet_types(spark, tmp_path):
    # a producer that wrote turn_idx as bigint must still load onto the
    # int32 contract (cast-projection, not reader-schema coercion — the
    # latter is a hard parquet read error)
    from janet_spark.sources import read_transcripts

    p = str(tmp_path / "wide")
    spark.range(5).selectExpr(
        "concat('c', id) AS conv_id",
        "id AS turn_idx",  # bigint
        "'user' AS role",
        "concat('t', id) AS text",
        "'' AS tool",
        "timestamp'2024-01-01' AS ts",
    ).write.parquet(p)
    df = read_transcripts(spark, p, format="parquet")
    assert dict(df.dtypes)["turn_idx"] == "int"
    assert df.count() == 5

    # missing contract column fails loudly
    import pytest as _pytest

    p2 = str(tmp_path / "missing")
    spark.range(3).selectExpr("concat('c', id) AS conv_id").write.parquet(p2)
    with _pytest.raises(ValueError, match="missing transcript columns"):
        read_transcripts(spark, p2, format="parquet")


# ---------------------------------------------------------------------------
# checkpoint robustness: null conv_id, n_buckets pin, stale staging cleanup
# ---------------------------------------------------------------------------


def test_run_job_handles_null_conv_id(spark, tmp_path):
    from datetime import datetime

    from janet_spark.pipeline import read_output, run_job

    ts = datetime(2024, 1, 1)
    rows = [
        ("c-1", 0, "user", "hello world", "", ts),
        (None, 0, "user", "orphan row", "", ts),  # degenerate but real
        ("c-2", 0, "user", "more text", "", ts),
    ]
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = str(tmp_path / "out")
    s = run_job(spark, tr, out, n_buckets=4)
    assert s["n_turns"] == 3  # the null-key row committed, not crashed on
    assert read_output(spark, out).count() == 3


def test_run_job_rejects_changed_n_buckets(spark, tmp_path):
    import pytest as _pytest

    from janet_spark.pipeline import run_job
    from janet_spark.synthetic import make_transcripts

    pdf, _ = make_transcripts(n_convs=10, base_turns=4)
    tr = spark.createDataFrame(pdf)
    out = str(tmp_path / "out")
    run_job(spark, tr, out, n_buckets=8)
    with _pytest.raises(ValueError, match="n_buckets"):
        run_job(spark, tr, out, n_buckets=16)


def test_stale_staging_cleaned_on_next_run(spark, tmp_path):
    import os

    from janet_spark.pipeline import run_job
    from janet_spark.synthetic import make_transcripts

    pdf, _ = make_transcripts(n_convs=10, base_turns=4)
    tr = spark.createDataFrame(pdf)
    out = str(tmp_path / "out")
    # crashed run leaves staging behind
    with pytest.raises(RuntimeError, match="injected"):
        run_job(spark, tr, out, n_buckets=8, fail_after_n_buckets=2)
    stale = [d for d in os.listdir(out) if d.startswith("_staging_")]
    assert stale  # remnant exists
    # the resume run clears it and completes
    run_job(spark, tr, out, n_buckets=8)
    assert not [d for d in os.listdir(out) if d.startswith("_staging_")]


# ---------------------------------------------------------------------------
# rename/metadata library semantics on realistic text (review regressions)
# ---------------------------------------------------------------------------


def test_vocab_matching_respects_word_boundaries():
    from janet_spark.extract.rename import extract_org, suggest_name

    # 'irs' inside 'first' / 'citi' inside 'city' must NOT match
    assert extract_org("My first visit to the city went well") is None
    assert extract_org("a notice from the IRS arrived") == "IRS"
    # end-to-end: no (date, org) -> total-function fallback to original
    assert (
        suggest_name("a.pdf", "My first visit to the city on 2024-01-02, ref 1234567")
        == "a.pdf"
    )


def test_money_regex_handles_ungrouped_amounts():
    from janet_spark.extract.metadata import _MONEY

    assert _MONEY.findall("Total due $12345.67 and $1,500.00 and $75") == [
        "$12345.67",
        "$1,500.00",
        "$75",
    ]


def test_extract_date_validates_calendars():
    from janet_spark.extract.rename import extract_date

    assert extract_date("due 31/12/2024") == "2024-12-31"  # D/M/Y fallback
    assert extract_date("on 12/31/2024") == "2024-12-31"  # M/D/Y primary
    assert extract_date("February 31, 2024 nonsense") is None  # impossible day
    assert extract_date("bad iso 2024-13-45 here") is None
    assert extract_date("March 5, 2023") == "2023-03-05"


def test_connected_components_raises_on_nonconvergence(spark):
    import pytest as _pytest

    from janet_spark.queries_text import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "d1 long, d2 long"
    )
    # diameter 10 chain with max_iter=3 must raise, not return wrong labels
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=3)
