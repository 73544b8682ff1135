"""Text normalization applied before every regex/NER layer.

Semantics match reference ``src/preprocessor.py:39-80`` exactly (pinned by its
``tests/test_preprocessor.py``): None/NaN -> '', non-str coerced, Unicode NFKC
(so ① -> 1, ﬁ -> fi — PDFs and legacy systems), control chars stripped while
keeping \\n and \\t, whitespace runs collapsed to one space, ends stripped.
Digits, punctuation, case and accents are preserved: every downstream pattern
assumes this normal form.
"""

from __future__ import annotations

import math
import re
import unicodedata
from typing import Iterable, List, Optional

_CONTROL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_WS_RUN = re.compile(r"\s+")


def normalize_text(value: Optional[object]) -> str:
    """Normalize one raw value into the canonical detection form."""
    if value is None:
        return ""
    if isinstance(value, float) and math.isnan(value):
        return ""
    if not isinstance(value, str):
        value = str(value)
    value = unicodedata.normalize("NFKC", value)
    value = _CONTROL.sub("", value)
    value = _WS_RUN.sub(" ", value)
    return value.strip()


def normalize_many(values: Iterable[Optional[object]]) -> List[str]:
    """Vector form used inside ``map_batches`` bodies."""
    return [normalize_text(v) for v in values]
