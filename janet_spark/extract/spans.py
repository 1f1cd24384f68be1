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
from dataclasses import dataclass

import pandas as pd


def normalize_keyword(keyword: str, match_case: bool, whole_words: bool) -> re.Pattern:
    """Compile a keyword to the reference's regex semantics."""
    escaped = re.escape(keyword)
    if whole_words:
        escaped = f" {escaped} "
    flags = 0 if match_case else re.IGNORECASE
    return re.compile(escaped, flags)


@dataclass(frozen=True)
class NormalizedKeyword:
    """The reference's NormalizedKeyword record: source string, compiled
    pattern, and the whole-words flag the span trimmer consults."""

    keyword: str
    pattern: re.Pattern
    whole_words: bool


# the search app's empty-keyword sentinel (apps/search/src/constants.ts:11-16):
# `new RegExp('')` would compile to `(?:)` and match zero-width at every
# position, so the reference substitutes a single-space pattern instead.
EMPTY_KEYWORD_SEARCH = NormalizedKeyword(keyword="", pattern=re.compile(" "), whole_words=False)

# the web app's DIVERGENT sentinel (apps/web/lib/search-normalize-keyword.ts:20-24):
# it uses `new RegExp("", "g")` — the zero-width-everywhere pattern the search
# app deliberately avoids. Both are reproduced; tests pin the divergence.
EMPTY_KEYWORD_WEB = NormalizedKeyword(keyword="", pattern=re.compile(""), whole_words=False)


def normalize_single_keyword(
    keyword: "str | re.Pattern | dict",
    match_case: "bool | None" = None,
    whole_words: "bool | None" = None,
    dialect: str = "search",
) -> NormalizedKeyword:
    """Full `normalizeSingleKeyword` semantics
    (apps/search/src/normalizeKeyword.ts:27-58):

    * compiled-pattern passthrough — a RegExp input is used verbatim (its
      own flags win; NO whole-words padding is added), `whole_words`
      defaulting to False (normalizeKeyword.ts:28-33);
    * empty string -> the dialect's sentinel (search: `' '`,
      web: `''` — see EMPTY_KEYWORD_* above);
    * plain string -> escape + optional space padding + gi/g flags;
    * dict (FlagKeyword) -> explicit args override the dict's fields
      (normalizeKeyword.ts:52-57), then the flag path.
    """
    if isinstance(keyword, re.Pattern):
        return NormalizedKeyword(
            keyword=keyword.pattern, pattern=keyword, whole_words=bool(whole_words)
        )
    if isinstance(keyword, str):
        if keyword == "":
            return EMPTY_KEYWORD_SEARCH if dialect == "search" else EMPTY_KEYWORD_WEB
        mc = bool(match_case)
        ww = bool(whole_words)
        return NormalizedKeyword(
            keyword=keyword,
            pattern=normalize_keyword(keyword, mc, ww),
            whole_words=ww,
        )
    kw = dict(keyword)
    if match_case is not None:
        kw["match_case"] = match_case
    if whole_words is not None:
        kw["whole_words"] = whole_words
    mc = bool(kw.get("match_case"))
    ww = bool(kw.get("whole_words"))
    return NormalizedKeyword(
        keyword=kw["keyword"],
        pattern=normalize_keyword(kw["keyword"], mc, ww),
        whole_words=ww,
    )


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
        if pos > len(text):
            # Python clamps search(text, pos) to len(text), so a zero-width
            # pattern would re-match at EOS forever without this bound (JS
            # exec returns null once lastIndex passes the end)
            break
        m = pattern.search(text, pos)
        if m is None:
            break
        start, end = m.span()
        if whole_words:
            # span trims the padding spaces (slice(1,-1)); the scan resumes
            # from the end of the FULL padded match (JS exec lastIndex), so
            # adjacent matches sharing one separator space are skipped —
            # the reference's quirk, replicated deliberately. The zero-width
            # guard still applies: a passthrough RegExp with whole_words=True
            # can match zero-width, which would otherwise loop forever.
            # The trim only applies to a boundary char that IS the padding
            # space: a passthrough compiled pattern (never space-padded) with
            # whole_words=True would otherwise yield corrupted spans like
            # (start+1, end-1) on a short/zero-width match — padded-path
            # matches always start and end with a literal space, so their
            # spans are unchanged. end is clamped to >= start.
            s_trim = start + 1 if end > start and text[start] == " " else start
            e_trim = end - 1 if end > start and text[end - 1] == " " else end
            out.append((idx, s_trim, max(e_trim, s_trim)))
            pos = end if end > start else end + 1
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
