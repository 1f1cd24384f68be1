"""Keyword matching with character-span offsets (the reference's search
engine core, operators T1-T5 / W2 in SURVEY.md §2).

Semantics replicated exactly from the reference:

* regex-escape of keyword specials — ``apps/search/src/normalizeKeyword.ts:15``
* whole-words = SPACE-PADDING (``' kw '``), **not** ``\\b`` — it deliberately
  misses matches at string start/end — ``normalizeKeyword.ts:18``; the match
  span then trims the padding chars (``slice(1, -1)`` in
  ``apps/search/src/Highlights.tsx:222``), reproduced here as (start+1, end-1)
* match_case toggles the ignore-case flag (``g`` vs ``gi``,
  ``normalizeKeyword.ts:19``)
* global scan loop with a zero-width-match guard and match ordinal per text
  — ``apps/search/src/useSearch.ts:205-218``

`find_matches` is per-string; `match_batch` is the Arrow-batched driver used
by the pandas UDF (pattern compiled once per batch, not per row).
"""

from __future__ import annotations

import re

import pandas as pd


def normalize_keyword(keyword: str, match_case: bool, whole_words: bool) -> re.Pattern:
    """Compile a keyword to the reference's regex semantics."""
    escaped = re.escape(keyword)
    if whole_words:
        escaped = f" {escaped} "
    flags = 0 if match_case else re.IGNORECASE
    return re.compile(escaped, flags)


def find_matches(
    text: str, pattern: re.Pattern, whole_words: bool
) -> list[tuple[int, int, int]]:
    """All (match_idx, start, end) in `text`; end exclusive.

    whole-words spans trim the padding space on each side, mirroring the
    reference's slice(1, -1).
    """
    out: list[tuple[int, int, int]] = []
    idx = 0
    pos = 0
    while True:
        m = pattern.search(text, pos)
        if m is None:
            break
        start, end = m.span()
        if whole_words:
            # span trims the padding spaces (slice(1,-1)); the scan resumes
            # from the end of the FULL padded match (JS exec lastIndex), so
            # adjacent matches sharing one separator space are skipped —
            # the reference's quirk, replicated deliberately
            out.append((idx, start + 1, end - 1))
            pos = end
        else:
            out.append((idx, start, end))
            pos = end if end > start else end + 1  # zero-width guard
        idx += 1
    return out


def match_batch(
    texts: pd.Series, keyword: str, match_case: bool, whole_words: bool
) -> pd.Series:
    """Vectorized driver: list of {match_idx,start,end} dicts per row."""
    pattern = normalize_keyword(keyword, match_case, whole_words)
    filled = texts.fillna("")
    return filled.map(
        lambda t: [
            {"match_idx": i, "start": s, "end": e}
            for i, s, e in find_matches(t, pattern, whole_words)
        ]
    )
