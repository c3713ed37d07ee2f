"""Engine configuration: validation limits and classic-mode field patterns.

Values re-specified from the reference's behavior
(/root/reference/src/pdf_parser/config/config.py:22-45) so our output is
byte-identical on the shared semantics; everything here is plain public data.
"""

from __future__ import annotations

from typing import Dict, List

MAX_FILE_SIZE: int = 50 * 1024 * 1024  # reject documents above 50 MB
MIN_FILE_SIZE: int = 100               # reject documents below 100 bytes

# field -> (display name, ordered regex pattern alternatives).
# Patterns are applied with re.IGNORECASE; first match wins; group(1).strip().
REGEX_FIELDS: Dict[str, Dict[str, object]] = {
    "customer_name": {
        "display": "Customer Name",
        "patterns": [r"Customer Name[:\s]*([A-Za-zÀ-ž ,.'-]+)"],
    },
    "policy_number": {
        "display": "Policy Number",
        "patterns": [r"Policy Number[:\s]*([\w-]+)"],
    },
    "claim_amount": {
        "display": "Claim Amount",
        "patterns": [r"Claim Amount[:\s]*\$?([\d,]+\.\d{2})"],
    },
}


def field_keys() -> List[str]:
    return list(REGEX_FIELDS.keys())
