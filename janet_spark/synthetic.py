"""Deterministic synthetic transcript generator with golden expectations.

Implements FIXTURES.md §1: payload archetypes (plain / padded / OCR-artifact
/ HTML-boilerplate / tool-fallback / failure) with *independently
constructed* expected outputs — the expectation strings are written from the
contract spec, NOT by running the engine, so tests have teeth. Includes the
reference's golden strings (Travelers notice,
``apps/legacy/tests/services/pdf.test.ts:118-160``) and a skewed
conversation to exercise salting.

Rows are emitted in shuffled order (seeded) so stable-ordering reassembly is
actually tested (FIXTURES.md: "rows shuffled on disk").
"""

from __future__ import annotations

import random

import pandas as pd


def _archetype(cid: int, i: int) -> int:
    return (cid * 7 + i * 13) % 8


def make_transcripts(
    n_convs: int = 20,
    skew_turns: int = 200,
    base_turns: int = 8,
    seed: int = 42,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (transcripts, expected) pandas frames.

    transcripts: conv_id, turn_idx, role, text, tool, ts
    expected:    conv_id, turn_idx, extracted_text, ok, blocks_kept
    """
    rng = random.Random(seed)
    t_rows: list[dict] = []
    e_rows: list[dict] = []
    roles = ["user", "assistant", "tool"]
    base_ts = pd.Timestamp("2024-01-01T00:00:00Z")

    for cid in range(n_convs):
        conv_id = f"conv-{cid:06d}"
        n_turns = skew_turns if cid == 0 else base_turns + (cid % 5)
        for i in range(n_turns):
            role = roles[i % 3]
            ts = base_ts + pd.Timedelta(minutes=i)
            a = _archetype(cid, i)
            tool = ""
            if a == 0:  # plain
                text = f"Turn {i} of {conv_id}: the quick brown fox jumps."
                expected, ok, kept = text, True, 1
            elif a == 1:  # padded -> trim semantics (pdf.ts:158 text.trim())
                core = f"Padded turn {i} with content."
                text = f"   {core}  \n "
                expected, ok, kept = core, True, 1
            elif a == 2:  # OCR artifacts: dehyphenate + ligatures + spaces
                text = f"Your policy is can-\ncelled. ﬁnancial ﬂow   report {i}."
                expected = f"Your policy is cancelled. financial flow report {i}."
                ok, kept = True, 1
            elif a == 3:  # golden Travelers page (reference fixture strings)
                text = (
                    "Notice of Cancellation\nTRAVELERS\n"
                    f"Page {1 + i % 2}\nPolicy 612266004\nFEBRUARY 25, 2024"
                )
                expected, ok, kept = text, True, 1
            elif a == 4:  # HTML boilerplate around main content
                main1 = f"Main content {i} of {conv_id} with enough characters."
                main2 = "Your policy is cancelled effective FEBRUARY 25, 2024."
                text = (
                    '<html><head><title>Site</title></head><body>'
                    '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
                    f"<div><p>{main1}</p><p>{main2}</p></div>"
                    '<footer><a href="/c">Contact</a> (c) corp</footer></body></html>'
                )
                expected, ok, kept = f"{main1}\n{main2}", True, 2
            elif a == 5:  # empty text -> tool JSON fallback (pdf.ts:158-164)
                text = "  \n "
                tool = (
                    '{"name": "ocr", "output": "Page 1\\n\\nNotice of Can-\\ncellation TRAVELERS"}'
                )
                expected = "Page 1\n\nNotice of Cancellation TRAVELERS"
                ok, kept = True, 1
            elif a == 6:  # prose-wrapped tool JSON (tolerant parse, T12)
                text = ""
                tool = (
                    'Result follows: {"name": "ocr", "output": "Travelers notice '
                    f'612266004 turn {i}"}} (end of output)'
                )
                expected = f"Travelers notice 612266004 turn {i}"
                ok, kept = True, 1
            else:  # both empty -> failed row (fileProcessor.ts:63-77)
                text, tool = "", ""
                expected, ok, kept = "", False, 0
            t_rows.append(
                dict(conv_id=conv_id, turn_idx=i, role=role, text=text, tool=tool, ts=ts)
            )
            e_rows.append(
                dict(
                    conv_id=conv_id,
                    turn_idx=i,
                    extracted_text=expected,
                    ok=ok,
                    blocks_kept=kept,
                )
            )

    rng.shuffle(t_rows)  # on-disk order must not matter
    t = pd.DataFrame(t_rows)
    t["turn_idx"] = t["turn_idx"].astype("int32")
    e = pd.DataFrame(e_rows)
    e["turn_idx"] = e["turn_idx"].astype("int32")
    return t, e


def expected_conversation_text(expected: pd.DataFrame) -> pd.DataFrame:
    """Golden conv-level reassembly: turn texts joined with '\\n' in
    turn_idx order (pdf.ts:150-156 page-join contract)."""
    e = expected.sort_values(["conv_id", "turn_idx"])
    g = (
        e.groupby("conv_id")["extracted_text"]
        .apply(lambda s: "\n".join(s))
        .reset_index()
        .rename(columns={"extracted_text": "conv_text"})
    )
    return g
