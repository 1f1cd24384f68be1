"""Frozen BPE merges table (GPT-2-style ordered pair list).

Generated once by scripts/train_bpe.py over the sf0.01 documents
vocabulary (deterministic greedy training, lexicographic
tie-break) and checked in as data — the tokenizer is a pure
function of this table; retraining is never needed for
correctness, only for compression quality on a new corpus.
"""

MERGES: list[tuple[str, str]] = [
    ('e', 'r'),
    ('i', 'n'),
    ('o', 'w'),
    ('o', 'r'),
    ('s', 't'),
    ('m', 'er'),
    ('a', 't'),
    ('l', 'u'),
    ('a', 'r'),
    ('p', 'ar'),
    ('j', 'o'),
    ('jo', 'in'),
    ('a', 's'),
    ('as', 'h'),
    ('h', 'ash'),
    ('r', 'ow'),
    ('at', 'c'),
    ('atc', 'h'),
    ('b', 'atch'),
    ('a', 'n'),
    ('c', 'an'),
    ('s', 'can'),
    ('c', 'o'),
    ('c', 'u'),
    ('co', 'lu'),
    ('colu', 'm'),
    ('colum', 'n'),
    ('cu', 'st'),
    ('cust', 'o'),
    ('custo', 'mer'),
    ('f', 'i'),
    ('fi', 'l'),
    ('fil', 't'),
    ('filt', 'er'),
    ('a', 'l'),
    ('al', 'l'),
    ('m', 'all'),
    ('s', 'mall'),
    ('g', 'e'),
    ('l', 'ow'),
    ('mer', 'ge'),
    ('s', 'low'),
    ('c', 't'),
    ('ct', 'or'),
    ('d', 'er'),
    ('e', 'ctor'),
    ('or', 'der'),
    ('v', 'ector'),
]
