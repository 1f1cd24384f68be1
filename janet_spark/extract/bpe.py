"""Deterministic BPE-style subword tokenizer from a frozen merges table.

Token budgeting is the currency of a training-data pipeline; the r2
``token_counts`` operator approximated it with whitespace/regex splits.
This is the real subword path: a GPT-2-style ordered merges list
(``bpe_merges.py``, trained once by ``scripts/train_bpe.py`` and checked in
as data) applied over a character-split word.

Apply semantics — defined identically in BOTH engines, single source of
truth being ``MERGES``:

* a word becomes the space-separated character string ``" w o r d "``
  (sentinel spaces on each end);
* each merge ``(a, b)``, in table order, performs ONE left-to-right
  non-overlapping replace of ``" a b "`` with ``" ab "`` — exactly the
  semantics of both Python ``str.replace`` and DuckDB/Spark ``replace()``,
  which is what makes the DuckDB oracle a true independent recomputation
  (a rendered chain of 48 nested ``replace()`` calls, no Python anywhere);
* the token count is the number of space-separated chunks left.

The one place this deviates from canonical GPT-2 BPE: canonical BPE
re-scans for the best-ranked pair after every merge, so a merge can
retrigger an EARLIER rank; the single-pass-per-rank chain cannot. The
training loop (scripts/train_bpe.py) trains against THESE apply semantics,
so table and tokenizer are self-consistent; goldens in
tests/test_round3_ops.py pin the behavior.
"""

from __future__ import annotations

from functools import lru_cache

from janet_spark.extract.bpe_merges import MERGES

# same token split as the search module: lowercase alnum runs
TOKEN_SPLIT = "[^a-z0-9]+"


@lru_cache(maxsize=65536)
def bpe_tokens(word: str) -> tuple[str, ...]:
    """Subword tokens of one word under the frozen merges table."""
    s = " " + " ".join(word) + " "
    for a, b in MERGES:
        s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return tuple(s.split())


def count_text(text: str) -> tuple[int, int]:
    """(bpe_tokens, n_words) for a text under the shared word split."""
    import re

    words = [w for w in re.split(TOKEN_SPLIT, text.lower()) if w]
    return sum(len(bpe_tokens(w)) for w in words), len(words)


def duckdb_word_tokens_sql(word_col: str) -> str:
    """DuckDB expression: the space-joined BPE token STRING of
    `word_col` — the full merge chain rendered as nested single-pass
    replace() calls over the space-separated character string
    (string_split with '' splits to chars). Independent recomputation:
    only the MERGES table is shared."""
    expr = f"' ' || array_to_string(string_split({word_col}, ''), ' ') || ' '"
    for a, b in MERGES:
        expr = f"replace({expr}, ' {a} {b} ', ' {a}{b} ')"
    return f"trim({expr})"


def duckdb_word_token_count_sql(word_col: str) -> str:
    """DuckDB expression: BPE token count of `word_col` (the chunk count
    of the rendered token string)."""
    return f"len(string_split({duckdb_word_tokens_sql(word_col)}, ' '))"


def spark_word_token_count_sql(word_col: str) -> str:
    """The SAME chain rendered as Spark SQL (JVM whole-stage codegen, no
    Python) — Spark's split('', '') yields a trailing '' element, so the
    char join goes through regexp_replace instead."""
    expr = (
        f"concat(' ', trim(regexp_replace({word_col}, '(.)', '$1 ')), ' ')"
    )
    for a, b in MERGES:
        expr = f"replace({expr}, ' {a} {b} ', ' {a}{b} ')"
    return f"size(split(trim({expr}), ' '))"
