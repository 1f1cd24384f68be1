"""Arrow-batched extraction UDFs — the engine's hot path.

``extract_turns`` is the Spark-facing mapInPandas stage reproducing the
reference's per-document driver (``processFile`` /
``extractTextFromPDF`` fallback chain, ``apps/legacy/src/services/pdf.ts:131-206``
and ``apps/ocr/src/controllers/ocr-controller.ts:33-208``) as a vectorized
batch transform:

1. HTML payloads -> tag-stack main-content strip (html_strip)
2. else non-empty text -> canonicalize (text_rules), span = trimmed extent
3. else -> fallback to the ``tool`` payload: tolerant JSON parse, take
   ``output``, OCR-normalize (the reference's empty-text OCR fallback,
   pdf.ts:158-164); both empty -> ok=false lineage signal
   (fileProcessor.ts:63-77)

No per-row Python on the dominant plain-text path: classification, trimming
offsets and canonicalization are pandas/C vectorized; only HTML rows and
fallback rows (rare by construction) take the per-string parser.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from janet_spark.extract.html_strip import (
    finish_blocks,
    looks_like_html,
    parse_blocks,
)
from janet_spark.extract.metadata import tolerant_json_parse
from janet_spark.extract.text_rules import canonicalize_series, canonicalize_str

# Spark-side schema of the extraction output (DDL string for mapInPandas).
EXTRACT_OUTPUT_DDL = (
    "conv_id string, turn_idx int, role string, ts timestamp, "
    "extracted_text string, "
    "spans array<struct<start:int,end:int,kind:string>>, "
    "blocks_kept int, blocks_dropped int, span_count int, ok boolean"
)

def extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Extract one Arrow batch. Input columns: conv_id, turn_idx, role,
    text, tool, ts. Output: EXTRACT_OUTPUT_DDL.

    Results accumulate in positional numpy arrays — scalar stores into
    ndarray slots, not pandas ``Series.__setitem__`` (profiled: ~160k
    per-element Series setitems cost ~25% of the whole batch on the
    HTML-heavy mix; ndarray stores make that overhead vanish)."""
    import numpy as np

    n = len(pdf)
    positions = {ix: i for i, ix in enumerate(pdf.index)}
    text = pdf["text"].fillna("").astype(str)
    tool = (
        pdf["tool"].fillna("").astype(str)
        if "tool" in pdf
        # substitute Series must carry the BATCH's index — the fallback
        # loop indexes it by pdf.index labels, not positions
        else pd.Series([""] * n, index=pdf.index)
    )

    extracted = np.full(n, "", dtype=object)
    spans: list[list[dict]] = [[] for _ in range(n)]
    kept = np.zeros(n, dtype="int32")
    dropped = np.zeros(n, dtype="int32")
    ok = np.zeros(n, dtype=bool)

    # cheap vectorized prefilter, exact per-row check only where '<' occurs
    maybe_html = text.str.contains("<", regex=False)
    html_mask = pd.Series(False, index=pdf.index)
    if maybe_html.any():
        html_mask.loc[maybe_html] = (
            text[maybe_html].map(looks_like_html).astype(bool)
        )
    html_mask = html_mask.astype(bool)

    # --- plain path (vectorized) ---
    plain_idx = pdf.index[(~html_mask).to_numpy()]
    if len(plain_idx):
        raw = text[plain_idx]
        canon = canonicalize_series(raw)
        nonempty = (canon.str.len() > 0).to_numpy()
        pe = plain_idx[nonempty]
        if len(pe):
            pe_pos = np.fromiter((positions[ix] for ix in pe), dtype=np.int64)
            extracted[pe_pos] = canon[nonempty].to_numpy()
            ok[pe_pos] = True
            kept[pe_pos] = 1
            starts = (raw[nonempty].str.len() - raw[nonempty].str.lstrip().str.len()).astype(int)
            ends = raw[nonempty].str.rstrip().str.len().astype(int)
            s_arr, e_arr = starts.to_numpy(), ends.to_numpy()
            for j, p in enumerate(pe_pos):
                spans[p] = [
                    {"start": int(s_arr[j]), "end": int(e_arr[j]), "kind": "plain"}
                ]
        # --- fallback path: empty text -> tool payload (rare) ---
        for ix in plain_idx[~nonempty]:
            raw_tool = tool[ix]
            obj = tolerant_json_parse(raw_tool)
            out = obj.get("output") if isinstance(obj, dict) else None
            if isinstance(out, str):
                out_clean = canonicalize_str(out)
            else:
                out_clean = ""
            pos = positions[ix]
            if out_clean:
                extracted[pos] = out_clean
                ok[pos] = True
                kept[pos] = 1
                blob_start = raw_tool.find("{")
                blob_end = raw_tool.rfind("}") + 1
                spans[pos] = [
                    {"start": int(blob_start), "end": int(blob_end), "kind": "ocr"}
                ]
            # else: ok stays False, empty output — failed-extraction row

    # --- html path: per-row tag-stack PARSE, but canonicalization of the
    # resulting blocks runs as ONE vectorized series pass over every block
    # of every HTML row in the batch (profiled: the per-block scalar
    # canonicalize inside strip_html was ~40% of batch time on the
    # HTML-heavy mix — ~5 regex subs per block with template re-parsing
    # per call; the series path is trigger-gated and C-vectorized) ---
    html_idx = pdf.index[html_mask.to_numpy()]
    if len(html_idx):
        parsed = [parse_blocks(text[ix]) for ix in html_idx]
        raw_blocks = ["".join(b.pieces) for blocks in parsed for b in blocks]
        canon_iter = iter(
            canonicalize_series(pd.Series(raw_blocks, dtype=object)).to_numpy()
            if raw_blocks
            else ()
        )
        for ix, blocks in zip(html_idx, parsed):
            texts = [next(canon_iter) for _ in blocks]
            t, sp, k, d = finish_blocks(blocks, texts)
            pos = positions[ix]
            extracted[pos] = t
            spans[pos] = [
                {"start": s, "end": e, "kind": kind} for s, e, kind in sp
            ]
            kept[pos] = k
            dropped[pos] = d
            ok[pos] = bool(t)

    out = pd.DataFrame(
        {
            "conv_id": pdf["conv_id"].to_numpy(),
            "turn_idx": pdf["turn_idx"].to_numpy().astype("int32"),
            "role": (
                pdf["role"].to_numpy() if "role" in pdf else np.full(n, "", dtype=object)
            ),
            "ts": pdf["ts"].to_numpy() if "ts" in pdf else np.full(n, None, dtype=object),
            "extracted_text": extracted,
            "spans": spans,
            "blocks_kept": kept,
            "blocks_dropped": dropped,
            "span_count": np.fromiter((len(s) for s in spans), dtype="int32", count=n),
            "ok": ok,
        }
    )
    return out


def extract_turns_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas entrypoint (iterator form keeps memory bounded at wide
    text payloads — SURVEY.md §7 hard part #6)."""
    for pdf in batches:
        if len(pdf):
            yield extract_batch(pdf)
