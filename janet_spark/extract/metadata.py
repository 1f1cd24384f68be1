"""Rule-based document-metadata extraction (operator X7 in SURVEY.md §2).

The reference extracts an ``EnhancedPdfMetadata`` struct with an LLM
(``apps/web/lib/server/pdf.ts:37-73``, schema at
``apps/web/lib/prompts/pdf-metadata.ts:93-105``); here the same struct is
populated by deterministic vocabulary/regex rules so fixtures are exact.
Includes the tolerant-JSON parse (T12, ``apps/web/lib/server/pdf.ts:13-35``).
"""

from __future__ import annotations

import json
import re

from janet_spark.extract.rename import (
    extract_date,
    extract_doctype,
    extract_org,
)

# grouped amounts first ($1,234.56), then ungrouped ($12345.67) — the old
# grouped-only pattern truncated '$12345.67' to '$123' via the \d{1,3} prefix
_MONEY = re.compile(r"\$\s?\d{1,3}(?:,\d{3})+(?:\.\d{2})?|\$\s?\d+(?:\.\d{2})?")
_JSON_BLOB = re.compile(r"\{[\s\S]*\}")


def tolerant_json_parse(raw: str | None) -> dict | None:
    """try JSON.parse; else regex-extract the outermost {...}; else None —
    byte-for-byte the reference's fallback chain (server/pdf.ts:13-35)."""
    if not raw:
        return None
    try:
        obj = json.loads(raw)
        return obj if isinstance(obj, dict) else None
    except (ValueError, TypeError):
        pass
    m = _JSON_BLOB.search(raw)
    if m:
        try:
            obj = json.loads(m.group(0))
            return obj if isinstance(obj, dict) else None
        except (ValueError, TypeError):
            return None
    return None


def extract_metadata(text: str) -> dict:
    """EnhancedPdfMetadata-shaped struct from cleaned text."""
    text = text or ""
    money = _MONEY.findall(text)
    doctype = extract_doctype(text)
    org = extract_org(text)
    date = extract_date(text)
    first_line = text.split("\n", 1)[0][:80] if text else None
    return {
        "documentType": doctype,
        "issuingOrganization": org,
        "primaryDate": date,
        "monetaryAmounts": money,
        "summary": first_line,
        "descriptiveTitle": (
            f"{org} {doctype}" if org and doctype else first_line
        ),
    }
