"""Dialogue-structure operators (janet_spark/dialogue.py): semantics the
sf tables can't pin — proper-prefix branch dedup vs exact duplicates,
role-run merging, suffix-keeping truncation with the first-turn pin,
cross-conversation boilerplate, and best-of-n / preference-pair ties —
exercised on hand-built transcripts."""

from __future__ import annotations

from datetime import datetime

from janet_spark.conversations import BUDGET_WORDS
from janet_spark.dialogue import (
    best_of_n_frame,
    conv_branch_dedup_frame,
    conv_merge_roles_frame,
    conv_prefix_stats_frame,
    conv_tail_truncate_frame,
    preference_pairs_frame,
    turn_boilerplate_frame,
)

TS = datetime(2024, 1, 1)


def _tr(spark, rows):
    return spark.createDataFrame(
        [(c, i, r, t, "", TS) for (c, i, r, t) in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_branch_dedup_drops_proper_prefixes_only(spark):
    tr = _tr(
        spark,
        [
            # long: the surviving continuation
            ("long", 0, "user", "fix the bug"),
            ("long", 1, "assistant", "looking"),
            ("long", 2, "assistant", "done"),
            # stub: proper prefix of long (turns 0..1) -> dropped
            ("stub", 0, "user", "fix the bug"),
            ("stub", 1, "assistant", "looking"),
            # twin: EXACT duplicate of long -> kept (proper means shorter)
            ("twin", 0, "user", "fix the bug"),
            ("twin", 1, "assistant", "looking"),
            ("twin", 2, "assistant", "done"),
            # fork: shares turn 0 but diverges at turn 1 -> kept
            ("fork", 0, "user", "fix the bug"),
            ("fork", 1, "assistant", "which bug?"),
            # solo: unrelated -> kept
            ("solo", 0, "user", "hello"),
        ],
    )
    kept = {r["conv_id"] for r in conv_branch_dedup_frame(tr).collect()}
    assert kept == {"long", "twin", "fork", "solo"}


def test_prefix_stats_counts_shared_prefixes_per_depth(spark):
    tr = _tr(
        spark,
        [
            ("a", 0, "user", "q"),
            ("a", 1, "assistant", "x"),
            ("b", 0, "user", "q"),
            ("b", 1, "assistant", "y"),
            ("c", 0, "user", "other"),
        ],
    )
    rows = conv_prefix_stats_frame(tr).collect()
    # only the depth-1 prefix "q" is shared (by a and b); depth-2 diverges
    assert len(rows) == 1
    assert rows[0]["depth"] == 1 and rows[0]["n_convs"] == 2


def test_merge_roles_folds_tool_and_merges_runs(spark):
    tr = _tr(
        spark,
        [
            ("a", 0, "user", "run ls"),
            ("a", 1, "assistant", "running"),
            ("a", 2, "tool", "file1 file2"),
            ("a", 3, "assistant", "two files"),
            ("a", 4, "user", "ok"),
            ("a", 5, "user", "thanks"),
        ],
    )
    out = conv_merge_roles_frame(tr).collect()
    got = [(r["turn_idx"], r["role"], r["text"], r["n_merged"]) for r in out]
    assert got == [
        (0, "user", "run ls", 1),
        # tool folds into the surrounding assistant block, texts in idx order
        (1, "assistant", "running file1 file2 two files", 3),
        (2, "user", "ok thanks", 2),
    ]


def test_tail_truncate_pins_first_turn_keeps_longest_suffix(spark):
    # words: turn0=2, turns 1..9 = 10 words each -> budget 96 leaves
    # 94 for the suffix -> longest fitting suffix is the last 9*10=90,
    # i.e. turns 1..9 all fit?  94//10 = 9 turns -> no gap. Make turn1
    # huge so it must be dropped: gap between turn0 and the kept tail.
    rows = [("a", 0, "user", "start here")]
    rows.append(("a", 1, "assistant", " ".join(["pad"] * 200)))  # over budget
    for i in range(2, 6):
        rows.append(("a", i, "assistant", " ".join(["w"] * 10)))
    tr = _tr(spark, rows)
    out = conv_tail_truncate_frame(tr).collect()[0]
    # turn0 (pinned, 2 words) + turns 2..5 (40 words) fit in 96; turn1 dropped
    assert out["total_turns"] == 6
    assert out["kept_turns"] == 5
    assert out["kept_words"] == 2 + 40
    assert out["has_gap"] == 1


def test_tail_truncate_first_turn_alone_over_budget_still_kept(spark):
    tr = _tr(spark, [("a", 0, "user", " ".join(["x"] * (BUDGET_WORDS + 50)))])
    out = conv_tail_truncate_frame(tr).collect()[0]
    assert out["kept_turns"] == 1 and out["has_gap"] == 0


def test_turn_boilerplate_requires_two_distinct_convs(spark):
    tr = _tr(
        spark,
        [
            ("a", 0, "system", "You are a helpful agent."),
            ("b", 0, "system", "You are a helpful agent."),
            ("b", 1, "user", "hi"),
            ("b", 2, "user", "hi"),  # repeats only within b -> not boilerplate
            ("c", 0, "user", "unique"),
            ("d", 0, "user", ""),
            ("e", 0, "user", ""),  # empty never counts
        ],
    )
    rows = turn_boilerplate_frame(tr).collect()
    assert len(rows) == 1
    assert rows[0]["sample_text"] == "You are a helpful agent."
    assert rows[0]["n_convs"] == 2 and rows[0]["n_occurrences"] == 2


def test_best_of_n_and_preference_pairs_tiebreaks(spark):
    tr = _tr(
        spark,
        [
            # group "same prompt": scores b2=6 > b1=4 = b3=4 (tie for worst)
            ("b1", 0, "user", "same prompt"),
            ("b1", 1, "assistant", "one two"),  # score 4
            ("b2", 0, "user", "same prompt"),
            ("b2", 1, "assistant", "one two three four"),  # score 6
            ("b3", 0, "user", "same prompt"),
            ("b3", 1, "assistant", "uno dos"),  # score 4
            # singleton group: best_of_n keeps it, preference_pairs drops it
            ("solo", 0, "user", "lonely prompt"),
        ],
    )
    best = {r["conv_id"]: r for r in best_of_n_frame(tr).collect()}
    assert set(best) == {"b2", "solo"}
    assert best["b2"]["n_candidates"] == 3 and best["b2"]["score"] == 6

    pairs = preference_pairs_frame(tr).collect()
    assert len(pairs) == 1
    p = pairs[0]
    # chosen = highest score; rejected tie (b1=b3=4) breaks to LARGEST id
    assert p["chosen_conv"] == "b2" and p["rejected_conv"] == "b3"
    assert p["chosen_score"] == 6 and p["rejected_score"] == 4


def test_preference_pairs_two_way_tie_yields_distinct_pair(spark):
    tr = _tr(
        spark,
        [
            ("x1", 0, "user", "p"),
            ("x1", 1, "assistant", "a b"),  # score 3
            ("x2", 0, "user", "p"),
            ("x2", 1, "assistant", "c d"),  # score 3 — full tie
        ],
    )
    p = preference_pairs_frame(tr).collect()[0]
    # chosen breaks to smallest id, rejected to largest -> never the same conv
    assert p["chosen_conv"] == "x1" and p["rejected_conv"] == "x2"


def test_sft_examples_budget_and_turn_cap(spark):
    from janet_spark.dialogue import MAX_CTX_TURNS, sft_examples_frame

    rows = [("a", 0, "user", "hello world")]  # 2 words
    rows.append(("a", 1, "user", " ".join(["big"] * 200)))  # over budget alone
    rows.append(("a", 2, "assistant", "blocked"))  # prev turn won't fit -> dropped
    rows.append(("a", 3, "user", "short question"))
    rows.append(("a", 4, "assistant", "short answer"))
    tr = _tr(spark, rows)
    out = {r["turn_idx"]: r for r in sft_examples_frame(tr).collect()}
    # turn 2's only admissible context (turn 1) exceeds the budget -> no row
    assert 2 not in out
    # turn 4's context walks back over turn 3 (2w) + turn 2 (1w) then stops
    # at turn 1 (200w, would blow the budget)
    assert out[4]["context_text"] == "blocked short question"
    assert out[4]["n_ctx_turns"] == 2 and out[4]["ctx_words"] == 3


def test_sft_examples_turn_cap_limits_context(spark):
    from janet_spark.conversations import BUDGET_WORDS
    from janet_spark.dialogue import MAX_CTX_TURNS, sft_examples_frame

    # 50 one-word turns then an assistant target: words fit (50 < 96) but
    # the turn cap keeps only the last MAX_CTX_TURNS
    rows = [("a", i, "user", f"w{i}") for i in range(50)]
    rows.append(("a", 50, "assistant", "target"))
    tr = _tr(spark, rows)
    out = sft_examples_frame(tr).filter("turn_idx = 50").collect()[0]
    assert out["n_ctx_turns"] == MAX_CTX_TURNS
    assert out["context_text"].split(" ")[0] == f"w{50 - MAX_CTX_TURNS}"


def test_conv_lang_consistency_flags_code_switching(spark):
    from janet_spark.dialogue import conv_lang_consistency_frame

    en = "the cat and the dog are in the house that was for it"
    de = "der hund und die katze ist nicht mit der maus von den"
    tr = _tr(
        spark,
        [
            ("mono", 0, "user", en),
            ("mono", 1, "assistant", en),
            ("mixed", 0, "user", en),
            ("mixed", 1, "assistant", de),
            ("mixed", 2, "user", en),
            ("und", 0, "user", "zzz qqq xxx"),
        ],
    )
    out = {r["conv_id"]: r for r in conv_lang_consistency_frame(tr).collect()}
    assert out["mono"]["majority_lang"] == "en"
    assert out["mono"]["lang_consistent"] == 1 and out["mono"]["n_langs"] == 1
    assert out["mixed"]["majority_lang"] == "en"  # 2 en vs 1 de
    assert out["mixed"]["lang_consistent"] == 0 and out["mixed"]["n_langs"] == 2
    assert out["und"]["majority_lang"] == "und"
    assert out["und"]["n_langs"] == 0 and out["und"]["lang_consistent"] == 1


def test_conv_lang_consistency_matches_python_detector(spark):
    """The rendered SQL ladder must agree with textops.detect_lang."""
    from janet_spark.dialogue import conv_lang_consistency_frame
    from janet_spark.textops import detect_lang

    texts = [
        "the cat and the dog",
        "der hund ist nicht da und",
        "le chat est dans la maison et",
        "el perro es una casa en la y",
        "",
        "汉字汉字汉字",
        "the der le el",  # cross-profile tie -> largest code wins
    ]
    tr = _tr(spark, [(f"c{i}", 0, "user", t) for i, t in enumerate(texts)])
    out = {
        r["conv_id"]: r["majority_lang"]
        for r in conv_lang_consistency_frame(tr).collect()
    }
    for i, t in enumerate(texts):
        want = detect_lang(t)
        assert out[f"c{i}"] == want, (t, out[f"c{i}"], want)


def test_conv_decontaminate_planted_contamination(spark):
    from janet_spark.dialogue import conv_decontaminate_frame

    eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    seven = "v1 v2 v3 v4 v5 v6 v7"
    tr = _tr(
        spark,
        [
            # conv-000011: source id 11 % 11 == 0 -> EVAL conversation
            ("conv-000011", 0, "user", f"intro {eight} outro"),
            ("conv-000011", 1, "assistant", seven),
            # training conv hits the eval 8-gram inside a longer turn
            ("conv-000001", 0, "user", f"padding {eight} more padding"),
            # training conv shares only a 7-gram -> NOT flagged
            ("conv-000002", 0, "user", f"{seven} different tail here x"),
            # clean training conv
            ("conv-000003", 0, "user", "totally unrelated text right here ok"),
        ],
    )
    out = {r["conv_id"]: r["n_hit_grams"] for r in conv_decontaminate_frame(tr).collect()}
    assert "conv-000001" in out and out["conv-000001"] >= 1
    assert "conv-000002" not in out
    assert "conv-000003" not in out
    assert "conv-000011" not in out  # eval convs are never in the removal list


def test_prompt_safe_split_groups_never_straddle(spark):
    from janet_spark.dialogue import prompt_safe_split_frame

    rows = []
    for g in range(100):  # 100 prompt groups x 3 sibling conversations
        for s in range(3):
            cid = f"conv-{g:04d}-{s}"
            rows.append((cid, 0, "user", f"shared prompt number {g}"))
            rows.append((cid, 1, "assistant", f"answer {g} {s}"))
    tr = _tr(spark, rows)
    out = prompt_safe_split_frame(tr).collect()
    sides = {}
    for r in out:
        sides.setdefault(r["prompt_sig"], set()).add(r["split"])
    assert len(out) == 300
    # every shared-prompt group lands entirely on one side
    assert all(len(s) == 1 for s in sides.values())
    # and with 100 groups the deterministic gate puts at least one on each side
    flat = {next(iter(s)) for s in sides.values()}
    assert flat == {"train", "eval"}


def test_chat_render_offsets_reconstruct_exactly(spark):
    """chat_render's absolute char offsets must index into the implied
    concatenation exactly: fragments abut with no gaps, target spans
    carve out just the turn text, and only assistant turns are targets."""
    from janet_spark.dialogue import chat_render_frame

    tr = _tr(
        spark,
        [
            ("c1", 0, "user", "fix the bug"),
            ("c1", 1, "assistant", "looking"),
            ("c1", 2, "tool", "grep output"),
            ("c1", 3, "assistant", ""),  # empty turn still renders
            ("c2", 0, "user", "hi"),
        ],
    )
    out = chat_render_frame(tr).collect()
    by_conv = {}
    for r in out:
        by_conv.setdefault(r.conv_id, []).append(r)
    for conv, rows in by_conv.items():
        rows.sort(key=lambda r: r.turn_idx)
        full = "".join(r.rendered for r in rows)
        pos = 0
        for r in rows:
            assert r.char_start == pos
            assert r.char_end == pos + len(r.rendered)
            assert full[r.char_start : r.char_end] == r.rendered
            # target span is exactly the raw turn text
            header = f"<|{r.role}|>"
            text = r.rendered[len(header) : len(r.rendered) - len("<|eot|>")]
            assert full[r.target_start : r.target_end] == text
            assert r.is_target == (r.role == "assistant")
            pos = r.char_end
    c1 = by_conv["c1"]
    assert "".join(r.rendered for r in c1).startswith("<|user|>fix the bug<|eot|>")
    # empty assistant turn: zero-width target span, header+eot only
    empty = c1[3]
    assert empty.target_start == empty.target_end
    assert empty.is_target


def test_conv_boilerplate_strip_reindexes_and_keeps_within_conv_repeats(spark):
    """A turn text recurring in >= 2 distinct conversations is stripped
    from all of them and survivors re-index densely (orig_turn_idx keeps
    provenance); the same text repeated twice WITHIN one conversation is
    not boilerplate; empty turns are never boilerplate."""
    from janet_spark.dialogue import conv_boilerplate_strip_frame

    rows = [
        # conv a: boiler at 0, unique at 1, boiler at 2
        ("a", 0, "user", "SYSTEM PROMPT", "", None),
        ("a", 1, "assistant", "unique answer a", "", None),
        ("a", 2, "tool", "CANNED BANNER", "", None),
        # conv b: shares both boiler texts
        ("b", 0, "user", "CANNED BANNER", "", None),
        ("b", 1, "assistant", "SYSTEM PROMPT", "", None),
        ("b", 2, "tool", "unique answer b", "", None),
        # conv c: repeats its own text twice (kept), plus an empty turn
        ("c", 0, "user", "only in c", "", None),
        ("c", 1, "assistant", "only in c", "", None),
        ("c", 2, "tool", "", "", None),
    ]
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = [
        (r.conv_id, r.turn_idx, r.orig_turn_idx, r.text)
        for r in conv_boilerplate_strip_frame(tr).collect()
    ]
    assert got == [
        ("a", 0, 1, "unique answer a"),
        ("b", 0, 2, "unique answer b"),
        ("c", 0, 0, "only in c"),
        ("c", 1, 1, "only in c"),
        ("c", 2, 2, ""),
    ]
