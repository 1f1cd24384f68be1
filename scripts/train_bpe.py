"""One-shot deterministic BPE training over the documents corpus vocabulary.

Emits the frozen merges table into janet_spark/extract/bpe_merges.py. The
apply semantics being trained for are EXACTLY the ones
janet_spark/extract/bpe.py implements (space-separated token string, one
single-pass left-to-right replace per merge, in table order), so training
re-tokenizes with that same procedure each round. Tie-break on equal pair
frequency is lexicographic (a, b) — fully deterministic, no RNG.

Usage: python scripts/train_bpe.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import collections
import sys

import duckdb


def tokenize(word: str, merges: list[tuple[str, str]]) -> list[str]:
    s = " " + " ".join(word) + " "
    for a, b in merges:
        s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return s.split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 48

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT tok, count(*) AS freq FROM (
          SELECT unnest(list_filter(
            regexp_split_to_array(lower(coalesce(text, '')), '[^a-z0-9]+'),
            x -> x != '')) AS tok
          FROM '{sf_dir}/documents.parquet')
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    vocab = {w: f for w, f in rows}
    print(f"vocabulary: {len(vocab)} words, {sum(vocab.values())} tokens")

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_freq: collections.Counter = collections.Counter()
        for word, freq in vocab.items():
            toks = tokenize(word, merges)
            for a, b in zip(toks, toks[1:]):
                pair_freq[(a, b)] += freq
        if not pair_freq:
            break
        # max by (freq, then lexicographically SMALLEST pair) — deterministic
        best = max(pair_freq.items(), key=lambda kv: (kv[1], [-ord(c) for c in "\x00".join(kv[0])]))
        merges.append(best[0])

    out = "janet_spark/extract/bpe_merges.py"
    with open(out, "w") as f:
        f.write(
            '"""Frozen BPE merges table (GPT-2-style ordered pair list).\n\n'
            "Generated once by scripts/train_bpe.py over the sf0.01 documents\n"
            "vocabulary (deterministic greedy training, lexicographic\n"
            "tie-break) and checked in as data — the tokenizer is a pure\n"
            "function of this table; retraining is never needed for\n"
            'correctness, only for compression quality on a new corpus.\n"""\n\n'
            "MERGES: list[tuple[str, str]] = [\n"
        )
        for a, b in merges:
            f.write(f"    ({a!r}, {b!r}),\n")
        f.write("]\n")
    print(f"wrote {len(merges)} merges to {out}")
    # show sample tokenizations
    for w in list(vocab)[:10]:
        print(f"  {w} -> {tokenize(w, merges)}")


if __name__ == "__main__":
    main()
