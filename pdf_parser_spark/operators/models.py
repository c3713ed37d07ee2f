"""Frozen model artifacts (sf0.01-trained LM + BPE; tools/freeze_models.py).

Loading reconstructs exactly the in-memory shapes the trainers return, so
`lm_quality_flags(df, load_frozen_lm())` scores identically to a fresh
train — asserted by tests — while staying constant across engines (the
DuckDB oracles embed the same frozen counts) and across benchmark runs.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

_HERE = os.path.dirname(os.path.abspath(__file__))
LM_PATH = os.path.join(_HERE, "frozen_lm_sf001.json")
BPE_PATH = os.path.join(_HERE, "frozen_bpe_sf001.json")

__all__ = ["LM_PATH", "BPE_PATH", "load_frozen_lm", "load_frozen_bpe"]


def load_frozen_lm() -> Tuple[Dict[str, int], Dict[str, int], int]:
    """(tri_counts, bi_counts, vocab) exactly as train_char_trigram_lm builds
    them: bigram counts and vocab are derived from the truncated trigram
    table, not counted independently (lm.py:50-56)."""
    with open(LM_PATH) as f:
        tri_counts: Dict[str, int] = json.load(f)["tri"]
    bi_counts: Dict[str, int] = {}
    vocab = set()
    for tri, c in tri_counts.items():
        bi_counts[tri[:2]] = bi_counts.get(tri[:2], 0) + c
        vocab.add(tri[2])
    return tri_counts, bi_counts, max(len(vocab), 1)


def load_frozen_bpe() -> List[Tuple[str, str]]:
    with open(BPE_PATH) as f:
        return [tuple(p) for p in json.load(f)["merges"]]
