"""Classic-mode regex field extraction + canonical JSON (pure Python).

Semantics mirror /root/reference/src/pdf_parser/extractors/classic_extractor.py:
patterns compiled once with re.IGNORECASE (:54-57); per field, patterns tried
in order, first match wins, value = match.group(1).strip() (:112-116); fields
that fail to match are omitted (:90-92); unknown requested fields are skipped,
not errors (:86-88); empty/whitespace-only text is an error (:78-79).

JSON is rendered in-kernel with json.dumps(..., ensure_ascii=False) in config
insertion order, matching the persisted byte layout of
/root/reference/src/pdf_parser/database/extraction_repository.py:63. Spark's
to_json(MapType) cannot guarantee those bytes, so this stays Python-side.

Field extraction runs with Python `re` (not JVM regexp_extract) because the
patterns use re.I case folding and the Unicode class À-ž, whose JVM semantics
differ; the oracle SQL uses equivalent simple patterns where safe.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

from ..config import REGEX_FIELDS

__all__ = [
    "DataExtractionError", "compile_config", "extract_fields",
    "extract_fields_with_spans", "canonical_json", "DEFAULT_COMPILED",
]


class DataExtractionError(Exception):
    """Raised for empty input text or a bad pattern configuration."""


def compile_config(
    config: Optional[Dict[str, Dict[str, Any]]] = None,
) -> Dict[str, List["re.Pattern[str]"]]:
    """Compile the field config once (per driver / per worker import)."""
    if config is None:
        config = REGEX_FIELDS
    try:
        return {
            key: [re.compile(p, re.I) for p in spec["patterns"]]
            for key, spec in config.items()
        }
    except re.error as e:
        raise DataExtractionError(f"Regex compilation error: {e}")


DEFAULT_COMPILED = compile_config()


def _first_match(
    patterns: Sequence["re.Pattern[str]"], text: str
) -> Optional["re.Match[str]"]:
    for pat in patterns:
        try:
            m = pat.search(text)
        except Exception:
            continue  # bad pattern/runtime error: try the next alternative
        if m:
            return m
    return None


def extract_fields(
    text: str,
    fields: Optional[Sequence[str]] = None,
    compiled: Optional[Dict[str, List["re.Pattern[str]"]]] = None,
) -> Dict[str, str]:
    """First-match-wins field extraction; only matched fields in the result."""
    if not text or not text.strip():
        raise DataExtractionError("No text content to process")
    cfg = compiled if compiled is not None else DEFAULT_COMPILED
    keys = list(fields) if fields else list(cfg.keys())
    out: Dict[str, str] = {}
    for key in keys:
        if key not in cfg:
            continue  # unknown field: skip, never error
        m = _first_match(cfg[key], text)
        if m:
            value = m.group(1).strip()
            if value:
                out[key] = value
    return out


def extract_fields_with_spans(
    text: str,
    fields: Optional[Sequence[str]] = None,
    compiled: Optional[Dict[str, List["re.Pattern[str]"]]] = None,
) -> Tuple[Dict[str, str], List[Tuple[str, int, int]]]:
    """Like extract_fields, plus (field, start, end) char offsets of group(1)."""
    if not text or not text.strip():
        raise DataExtractionError("No text content to process")
    cfg = compiled if compiled is not None else DEFAULT_COMPILED
    keys = list(fields) if fields else list(cfg.keys())
    out: Dict[str, str] = {}
    spans: List[Tuple[str, int, int]] = []
    for key in keys:
        if key not in cfg:
            continue
        m = _first_match(cfg[key], text)
        if m:
            value = m.group(1).strip()
            if value:
                out[key] = value
                spans.append((key, m.start(1), m.end(1)))
    return out, spans


def canonical_json(data: Dict[str, Any]) -> str:
    """The persisted byte layout: ensure_ascii=False, insertion order."""
    return json.dumps(data, ensure_ascii=False)
