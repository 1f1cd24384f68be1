"""Production-size BPE training (round-3 verdict #5): 1,000 merges over
the sf0.1 UNION corpus (document text + customer entity names), trained
DISTRIBUTED via tokenizer_train.train_bpe_distributed and verified
bit-for-bit against an independent driver-side reference trainer before
the table is frozen into janet_spark/extract/bpe_merges_1k.py.

The reference trainer re-derives the vocabulary through DuckDB and runs
the greedy loop with INCREMENTALLY maintained pair counts (on each
accepted merge, only words containing the merged pattern update their
pair contributions) — an implementation that shares nothing with the
Spark trainer except the apply semantics (single-pass left-to-right
replace per merge, lexicographic tie-break), so agreement at every one
of the 1,000 ranks is a real cross-check, the same three-way discipline
as the 48-merge table.

Writes BENCH/bpe_1k_train.json with timings + the equality verdict.

Usage: python scripts/train_bpe_1k.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "janet_spark", "extract", "bpe_merges_1k.py")
RESULT = os.path.join(REPO, "BENCH", "bpe_1k_train.json")


def load_vocab(sf_dir: str) -> dict[str, int]:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT tok, count(*) AS freq FROM (
          SELECT unnest(list_filter(
            regexp_split_to_array(lower(coalesce(text, '')), '[^a-z0-9]+'),
            x -> x != '')) AS tok
          FROM '{sf_dir}/documents.parquet'
          UNION ALL
          SELECT unnest(list_filter(
            regexp_split_to_array(lower(coalesce(c_name, '')), '[^a-z0-9]+'),
            x -> x != '')) AS tok
          FROM '{sf_dir}/customer.parquet')
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    return dict(rows)


def reference_train(vocab: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Greedy BPE with incrementally maintained pair counts. Same apply
    semantics and tie-break as the Spark trainer; independent mechanism."""

    def pairs_of(s: str) -> collections.Counter:
        toks = s.split()
        return collections.Counter(zip(toks, toks[1:]))

    segs = {w: " " + " ".join(w) + " " for w in vocab}
    word_pairs = {w: pairs_of(s) for w, s in segs.items()}
    pc: collections.Counter = collections.Counter()
    for w, f in vocab.items():
        for k, c in word_pairs[w].items():
            pc[k] += c * f

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        live = [(k, n) for k, n in pc.items() if n > 0]
        if not live:
            break
        best = max(
            live,
            key=lambda kv: (kv[1], [-ord(c) for c in "\x00".join(kv[0])]),
        )[0]
        a, b = best
        merges.append(best)
        pat, rep = f" {a} {b} ", f" {a}{b} "
        for w, s in segs.items():
            if pat not in s:
                continue
            f = vocab[w]
            for k, c in word_pairs[w].items():
                pc[k] -= c * f
            segs[w] = s.replace(pat, rep)
            word_pairs[w] = pairs_of(segs[w])
            for k, c in word_pairs[w].items():
                pc[k] += c * f
    return merges


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from janet_spark.session import build_session
    from janet_spark.tokenizer_train import train_bpe_distributed, union_vocab

    spark = build_session("bpe-1k-train", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    vocab_df = union_vocab(spark, sf_dir)
    dist = train_bpe_distributed(spark, sf_dir, n_merges=n_merges, vocab=vocab_df)
    dist_s = round(time.time() - t0, 1)
    print(f"distributed: {len(dist)} merges in {dist_s}s")

    t0 = time.time()
    vocab = load_vocab(sf_dir)
    ref = reference_train(vocab, n_merges)
    ref_s = round(time.time() - t0, 1)
    print(f"reference: {len(ref)} merges in {ref_s}s over {len(vocab)} words")

    equal = dist == ref
    first_diff = next(
        (i for i, (x, y) in enumerate(zip(dist, ref)) if x != y),
        None if len(dist) == len(ref) else min(len(dist), len(ref)),
    )
    results = {
        "sf_dir": sf_dir,
        "n_merges": len(dist),
        "vocab_words": len(vocab),
        "distributed_train_s": dist_s,
        "reference_train_s": ref_s,
        "bit_for_bit_equal": equal,
        "first_divergence_rank": first_diff,
    }
    os.makedirs(os.path.dirname(RESULT), exist_ok=True)
    with open(RESULT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    assert equal, f"trainers diverged at rank {first_diff}"

    with open(OUT, "w") as f:
        f.write(
            '"""Frozen production-size BPE merges table (1,000 ordered pairs).\n\n'
            "Trained DISTRIBUTED (tokenizer_train.train_bpe_distributed) over the\n"
            "sf0.1 union corpus (documents text + customer entity names) by\n"
            "scripts/train_bpe_1k.py, which verifies the table bit-for-bit\n"
            "against an independent incremental driver-side trainer before\n"
            "freezing. Same apply semantics as the 48-merge table\n"
            '(extract/bpe.py); evidence in BENCH/bpe_1k_train.json.\n"""\n\n'
            "MERGES_1K: list[tuple[str, str]] = [\n"
        )
        for a, b in dist:
            f.write(f"    ({a!r}, {b!r}),\n")
        f.write("]\n")
    print(f"wrote {len(dist)} merges to {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
