"""Conversation-level curation operators: behavior the sf tables can't
exercise (duplicate conversations, mid-conversation truncation, malformed
tool payloads) pinned on hand-built transcripts."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from janet_spark.conversations import (
    BUDGET_WORDS,
    conversation_signatures,
)

TS = datetime(2024, 1, 1)


def _tr(spark, rows):
    return spark.createDataFrame(
        [(c, i, r, t, "", TS) for (c, i, r, t) in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_signature_detects_exact_duplicates_and_only_those(spark):
    tr = _tr(
        spark,
        [
            ("a", 0, "user", "hello there"),
            ("a", 1, "assistant", "hi"),
            ("b", 0, "user", "hello there"),  # exact copy of a
            ("b", 1, "assistant", "hi"),
            ("c", 0, "user", "hello there"),  # same turn 0, different turn 1
            ("c", 1, "assistant", "hi!"),
            ("d", 1, "user", "hello there"),  # same texts, different turn_idx
            ("d", 2, "assistant", "hi"),
        ],
    )
    sig = {
        r["conv_id"]: r["conv_sig"]
        for r in conversation_signatures(tr).collect()
    }
    assert sig["a"] == sig["b"]
    assert sig["a"] != sig["c"]
    assert sig["a"] != sig["d"]  # order/index-sensitive


def test_signature_invariant_to_chunking(spark):
    rows = [("a", i, "user", f"turn {i}") for i in range(10)]
    tr = _tr(spark, rows)
    s1 = conversation_signatures(tr, chunk=3).collect()[0]["conv_sig"]
    s2 = conversation_signatures(tr, chunk=1024).collect()[0]["conv_sig"]
    # chunk boundaries change the grouping but not the signature inputs'
    # order, so different chunk sizes give different level-2 strings —
    # the signature is only comparable at a FIXED chunk size. Pin that
    # deliberate property: same chunk -> equal, and dedup always runs at
    # SIG_CHUNK so cross-run comparability holds.
    s1b = conversation_signatures(tr, chunk=3).collect()[0]["conv_sig"]
    assert s1 == s1b
    assert s1 != s2


def test_budget_truncate_prefix_semantics(spark):
    from janet_spark.conversations import q_conv_budget_truncate  # noqa: F401

    # hand-computed: words per turn 16,16,16,16,16,16,16 -> cum hits 96 at
    # turn 5 (6 turns kept), turn 6 pushed over budget
    tr = _tr(
        spark,
        [("a", i, "user", " ".join(["w"] * 16)) for i in range(7)],
    )
    from pyspark.sql.window import Window

    from janet_spark.conversations import _words

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    cum = tr.withColumn("words", _words()).withColumn(
        "cum", F.sum("words").over(w)
    )
    kept = cum.filter(F.col("cum") <= BUDGET_WORDS).count()
    assert kept == 6


def test_tool_call_validate_modes(spark):
    from janet_spark.conversations import _validate_tool_batch

    df = spark.createDataFrame(
        [
            ('{"name":"search","arg":"x"}',),  # clean -> valid, direct
            ('tool said {"name":"y"} done',),  # recoverable -> valid
            ('{"name": broken',),  # unterminated -> invalid
            ("not json at all",),  # no braces -> invalid
            ('[1, 2, 3]',),  # valid JSON but not a dict -> invalid
        ],
        "raw string",
    )
    out = df.withColumn("v", _validate_tool_batch()(F.col("raw"))).select(
        "v.valid", "v.recovered"
    )
    got = [(r["valid"], r["recovered"]) for r in out.collect()]
    assert got == [(1, 0), (1, 1), (0, 0), (0, 0), (0, 0)]


def test_conv_dedup_end_to_end_keeps_min_conv_id(spark, tmp_path):
    # write a documents.parquet with a duplicated text so the derived
    # transcripts contain duplicate conversations
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma", "en", "web", 16),
            (1, "alpha beta gamma", "en", "web", 16),  # dup of doc 0
            (2, "delta epsilon", "en", "web", 13),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from janet_spark.conversations import q_conv_dedup

    out = {r["conv_id"]: r for r in q_conv_dedup(spark, str(tmp_path)).collect()}
    assert set(out) == {"conv-000000", "conv-000002"}
    assert out["conv-000000"]["n_copies"] == 2
    assert out["conv-000002"]["n_copies"] == 1


def test_quality_gate_drops_duplicates_and_thin_convs(spark, tmp_path):
    long_text = " ".join(f"w{i}" for i in range(48))  # 3 turns of 16 words
    docs = spark.createDataFrame(
        [
            (0, long_text, "en", "web", len(long_text)),
            (1, long_text, "en", "web", len(long_text)),  # duplicate
            (2, "short", "en", "web", 5),  # 1 turn -> too few
            (3, " ".join(f"x{i}" for i in range(40)), "en", "web", 200),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from janet_spark.conversations import q_conv_quality_gate

    kept = [r["conv_id"] for r in q_conv_quality_gate(spark, str(tmp_path)).collect()]
    # conv 1 is a duplicate (loses to conv 0); conv 2 has 1 turn (< 3)
    assert kept == ["conv-000000", "conv-000003"]


def test_conv_pack_whole_conversation_assignment(spark, tmp_path):
    # three docs -> word totals 600, 100, 100: doc0 starts at 0 (seq 0,
    # straddles into seq 1 but stays whole), doc1 starts at 600 -> seq 1
    # offset 88, doc2 starts at 700 -> seq 1 offset 188
    docs = spark.createDataFrame(
        [
            (0, " ".join(["a"] * 600), "en", "web", 1),
            (1, " ".join(["b"] * 100), "en", "web", 1),
            (2, " ".join(["c"] * 100), "en", "web", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from janet_spark.conversations import q_conv_pack

    out = {r["conv_id"]: r for r in q_conv_pack(spark, str(tmp_path)).collect()}
    assert out["conv-000000"]["seq_id"] == 0
    assert out["conv-000000"]["seq_offset"] == 0
    assert out["conv-000001"]["seq_id"] == 1
    assert out["conv-000001"]["seq_offset"] == 88
    assert out["conv-000002"]["seq_id"] == 1
    assert out["conv-000002"]["seq_offset"] == 188


def test_conv_training_pipeline_composed_semantics(spark, tmp_path):
    long_a = " ".join(f"w{i}" for i in range(160))  # 10 turns, kept 96
    docs = spark.createDataFrame(
        [
            (0, long_a, "en", "web", 1),
            (1, long_a, "en", "web", 1),  # duplicate -> dropped
            (2, "tiny", "en", "web", 1),  # 1 turn -> gate-dropped
            (3, " ".join(f"x{i}" for i in range(64)), "en", "web", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from janet_spark.conversations import q_conv_training_pipeline

    rows = {
        r["conv_id"]: r
        for r in q_conv_training_pipeline(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {"conv-000000", "conv-000003"}
    # truncation caps at the 96-word budget (160 words -> 6 turns kept)
    assert rows["conv-000000"]["kept_words"] == 96
    assert rows["conv-000003"]["kept_words"] == 64
    # packing: conv 0 starts at 0; conv 3 starts at 96 (same seq 0)
    assert rows["conv-000000"]["seq_id"] == 0
    assert rows["conv-000000"]["seq_offset"] == 0
    assert rows["conv-000003"]["seq_id"] == 0
    assert rows["conv-000003"]["seq_offset"] == 96


def test_conv_loss_mask_spans(spark, tmp_path):
    # conv 0: 160 words -> 10 turns of 16; kept prefix = 6 turns (96 words);
    # assistant turns are turn_idx % 3 == 1 -> kept assistant turns 1 and 4
    # conv 3: 64 words -> 4 turns, all kept; assistant turn 1
    long_a = " ".join(f"w{i}" for i in range(160))
    docs = spark.createDataFrame(
        [
            (0, long_a, "en", "web", 1),
            (3, " ".join(f"x{i}" for i in range(64)), "en", "web", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from janet_spark.conversations import q_conv_loss_mask

    rows = [
        (r["conv_id"], r["turn_idx"], r["seq_id"], r["tok_start"], r["tok_end"])
        for r in q_conv_loss_mask(spark, str(tmp_path)).collect()
    ]
    # conv 0 packs at cum_before=0 -> seq 0 offset 0; its assistant turns
    # start within-conv at 16 (turn 1) and 64 (turn 4), each 16 words.
    # conv 3 packs at cum_before=96 -> seq 0 offset 96; assistant turn 1
    # starts within-conv at 16.
    assert rows == [
        ("conv-000000", 1, 0, 16, 32),
        ("conv-000000", 4, 0, 64, 80),
        ("conv-000003", 1, 0, 112, 128),
    ]


def test_conv_neardup_matches_bruteforce_and_partitioning(spark):
    """conv_neardup == brute-force exact Jaccard over the conversations'
    within-turn shingle sets (LSH recall + distributed verify exactness),
    and the per-batch signature fold is partition-invariant — the
    minhash(union) = min(minhash) identity that lets a skewed conversation
    sign without ever concatenating."""
    from itertools import combinations

    from janet_spark.conversations import conv_neardup_frame
    from janet_spark.queries_text import _JACCARD_THRESHOLD, _doc_shingles

    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a second turn with plenty of shared words across the variants",
        "closing remarks that stay identical in every near duplicate copy",
        "one more long turn so the shingle sets are big enough to matter",
    ]
    rows = []
    for i, text in enumerate(base):
        role = "user" if i % 2 == 0 else "assistant"
        rows.append(("orig", i, role, text))
        # near dup: one word edited in one turn
        edited = text.replace("second", "2nd") if "second" in text else text
        rows.append(("tweak", i, role, edited))
        # far: every turn rewritten
        rows.append(("other", i, role, f"completely different content number {i} here"))
    rows.append(("short", 0, "user", "tiny"))  # <5-word turn: shingle = itself
    tr = _tr(spark, rows)

    # brute force over union-of-turn shingle sets
    sets: dict = {}
    for c, _, _, t in rows:
        sets.setdefault(c, set()).update(_doc_shingles(t))
    expected = set()
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        jac = inter / (len(sets[a]) + len(sets[b]) - inter)
        if round(jac, 4) >= _JACCARD_THRESHOLD:
            expected.add((a, b))

    got = {(r.c1, r.c2) for r in conv_neardup_frame(tr).collect()}
    assert got == expected
    assert ("orig", "tweak") in got  # the planted near dup is found
    # partition-invariance: turns scattered across 7 partitions fold to
    # the same pairs (partial per-batch min == global min)
    got7 = {(r.c1, r.c2) for r in conv_neardup_frame(tr.repartition(7)).collect()}
    assert got7 == expected


def test_conv_dedup_fuzzy_keeps_min_per_cluster(spark):
    """Near-dup clusters keep exactly the min conv_id; transitive chains
    (a~b, b~c but a!~c directly) still land in ONE cluster."""
    from janet_spark.conversations import conv_dedup_fuzzy_frame

    # 20-word turns: 16 shingles each, 64 per conversation — a one-word
    # edit moves 5 shingles (j = 59/69 = 0.855 > 0.8) while a two-word
    # diff drops to 54/74 = 0.73 < 0.8, so the chain is transitive-only
    base = [
        "the quick brown fox jumps over the lazy dog again and again while"
        " everyone watches the show from the old porch",
        "a second turn with plenty of shared words across the variants that"
        " keeps the shingle sets wide enough for mining",
        "closing remarks that stay identical in every near duplicate copy"
        " because the ending boilerplate never changes between the reruns",
        "one more long turn so the shingle sets are big enough to matter"
        " when the verify stage computes exact jaccard",
    ]
    rows = []
    for i, text in enumerate(base):
        rows.append(("a-orig", i, "user", text))
        rows.append(("b-tweak", i, "user", text.replace("second", "2nd")))
        # chain link: near b-tweak (shares its edit) AND carries one more
        rows.append(
            ("c-chain", i, "user", text.replace("second", "2nd").replace("lazy", "idle"))
        )
        rows.append(("z-far", i, "user", f"entirely unrelated content row {i} here"))
    tr = _tr(spark, rows)
    out = {r.conv_id: r for r in conv_dedup_fuzzy_frame(tr).collect()}
    assert set(out) >= {"a-orig", "b-tweak", "c-chain"}
    assert "z-far" not in out  # never paired -> not in any cluster
    cluster = {out[c].cluster_rep for c in ("a-orig", "b-tweak", "c-chain")}
    assert cluster == {"a-orig"}  # one transitive cluster, min-id rep
    assert out["a-orig"].keep is True
    assert out["b-tweak"].keep is False and out["c-chain"].keep is False
    assert out["a-orig"].cluster_size == 3


def test_incremental_conv_neardup_is_delta_filtered_full(spark):
    """The daily incremental miner returns EXACTLY the full miner's pairs
    that touch a delta conversation — no base-only pair leaks in, no
    delta-touching pair is missed."""
    from janet_spark.conversations import (
        _CONV_DELTA_MOD,
        conv_neardup_frame,
        incremental_conv_neardup_frame,
    )
    from janet_spark.derive import derived_transcripts

    tr = derived_transcripts(spark, "/root/testdata/sf0.001")

    def is_new(cid: str) -> bool:
        return int(cid[5:]) % _CONV_DELTA_MOD == 0

    full = {(r.c1, r.c2, r.jaccard) for r in conv_neardup_frame(tr).collect()}
    expected = {t for t in full if is_new(t[0]) or is_new(t[1])}
    got = {
        (r.c1, r.c2, r.jaccard)
        for r in incremental_conv_neardup_frame(tr).collect()
    }
    assert got == expected
    assert got and got < full  # nontrivial and a strict subset


def test_conv_stats_duration_min_subminute_semantics(spark):
    """Round-3 advice: duration_min must mean floor(elapsed_seconds/60) in
    BOTH the Spark frame and the DuckDB oracle. The sf data is
    minute-aligned by construction, so this pins the divergence the gate
    can't see: 10:00:59 -> 10:01:01 is 0 elapsed minutes, not 1 crossed
    minute boundary."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from janet_spark.conversations import conv_stats_frame

    rows = pd.DataFrame(
        {
            "conv_id": ["c1", "c1"],
            "turn_idx": [0, 1],
            "role": ["user", "assistant"],
            "text": ["hi", "hello"],
            "tool": ["", ""],
            "ts": [
                dt.datetime(2026, 1, 1, 10, 0, 59),
                dt.datetime(2026, 1, 1, 10, 1, 1),
            ],
        }
    )
    tr = spark.createDataFrame(rows)
    got = conv_stats_frame(tr).collect()[0]["duration_min"]
    assert got == 0
    # the oracle's expression (conversations.ORACLE_CONV_STATS) agrees
    oracle = duckdb.sql(
        "SELECT date_diff('second', TIMESTAMP '2026-01-01 10:00:59',"
        " TIMESTAMP '2026-01-01 10:01:01') // 60"
    ).fetchone()[0]
    assert oracle == got == 0
