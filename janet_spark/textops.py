"""Language identification and related text-analysis heuristics.

Deterministic n-gram/stopword heuristic language-ID (no external models; the
reference has no language detection, but a training-data pipeline over
transcripts needs one). Operates vectorized over Arrow batches.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

# stopword profiles (distinctive words only; ambiguous ones like 'la'
# appear for every language that uses them)
_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of is in to it that was for are with".split()),
    "de": frozenset("der die das und ist nicht ein eine mit von zu den".split()),
    "fr": frozenset("le la les et est une dans pour que vous avec ne".split()),
    "es": frozenset("el la los las y es una en para que con por".split()),
}
_CJK = re.compile(r"[一-鿿㐀-䶿]")
_WORD = re.compile(r"[a-zA-Zäöüßéèêàçñáíóú]+")


def detect_lang(text: str) -> str:
    """Best-effort language code for `text`; 'und' when undecidable."""
    if not text:
        return "und"
    n_cjk = len(_CJK.findall(text))
    if n_cjk and n_cjk / max(len(text), 1) > 0.05:
        return "zh"
    words = [w.lower() for w in _WORD.findall(text)]
    if not words:
        return "und"
    scores = {
        lang: sum(1 for w in words if w in prof) for lang, prof in _PROFILES.items()
    }
    best = max(scores, key=lambda k: (scores[k], k))
    if scores[best] == 0:
        return "und"
    return best


def detect_lang_batch(texts: pd.Series) -> pd.Series:
    return texts.fillna("").map(detect_lang)


def lang_id_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: (doc_id, text) -> (doc_id, detected_lang)."""
    for pdf in batches:
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "detected_lang": detect_lang_batch(pdf["text"])}
        )
