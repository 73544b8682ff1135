"""Deterministic toxicity scoring + scrub (north-star capability).

The reference engine has no toxicity component; BASELINE.json's north_star
names "PII/toxicity scrub" explicitly, so this module supplies the scoring
kernel the Ray stage hosts. Real deployments would load a classifier
(Detoxify/Perspective-style) in the actor's ``__init__``; the container has no
model weights, so the scorer is a deterministic token-list match — the hosting
shape (state built once per actor, batches scored vectorized-per-row) is
identical, and the by-construction oracle in ``vigil_ray.queries`` can verify
it exactly.

Semantics:

- a token is toxic when its lowercased ``\\w+`` form is in :data:`TOXIC_TERMS`
  (punctuation never blocks a match, "Idiota," counts);
- a document is toxic when it has ``>= min_hits`` toxic tokens OR a toxic
  token ratio ``>= min_ratio`` (absolute floor catches injected abuse in long
  documents that a pure ratio would dilute);
- scrubbing masks each toxic token span with the scrub token, preserving all
  surrounding text byte-for-byte.
"""

from __future__ import annotations

import re
from typing import List, Tuple

# Mild, fixed EN+PT abuse vocabulary. Deterministic stand-in for a toxicity
# model's decision boundary; single lowercase word forms only.
TOXIC_TERMS = frozenset(
    {
        # en
        "idiot", "idiots", "stupid", "moron", "morons", "dumb", "scum",
        "loser", "losers", "trash", "garbage", "pathetic", "worthless",
        "hate", "hateful", "disgusting", "vile",
        # pt
        "idiota", "idiotas", "estúpido", "estúpida", "burro", "burra",
        "imbecil", "imbecis", "nojento", "nojenta", "desprezível",
        "odeio", "odiar", "lixo", "patético", "patética", "inútil",
        "desgraçado", "desgraçada", "miserável",
    }
)

_WORD = re.compile(r"\w+", re.UNICODE)


def _toxic_spans_scan(text: str) -> List[Tuple[int, int, str]]:
    """The spec scan: every ``\\w+`` token, lowered, probed against the term
    set, with original-text offsets."""
    return [
        (m.start(), m.end(), m.group())
        for m in _WORD.finditer(text)
        if m.group().lower() in TOXIC_TERMS
    ]


def toxic_spans(text: str) -> List[Tuple[int, int, str]]:
    """All toxic-token occurrences as ``(start, end, token)`` spans.

    Fast reject first: ``_WORD.findall`` over the char-wise-lowered text plus
    one C-speed ``frozenset.isdisjoint`` — no per-token ``.lower()`` calls, no
    match objects. Exactness: ``str.lower`` maps \\w→\\w and non-\\w→itself
    (uncased chars are fixed points), so token boundaries survive lowering;
    a token whose ``token.lower()`` equals a (pure-Latin) term lowers char-wise
    1:1 onto that term, which therefore appears verbatim as a token of
    ``text.lower()`` — disjoint proves the spec scan returns []. Expansion
    (İ→i+U+0307) and final-sigma context cases only produce non-term tokens on
    both paths. Pinned by the gated-vs-spec hypothesis differential in
    tests/test_toxicity.py."""
    if not text:
        return []
    if TOXIC_TERMS.isdisjoint(_WORD.findall(text.lower())):
        return []
    return _toxic_spans_scan(text)


def score_toxicity(
    text: str, min_hits: int = 2, min_ratio: float = 0.1
) -> Tuple[int, float, bool]:
    """``(n_tox, tox_ratio, is_toxic)`` for one document."""
    spans = toxic_spans(text)
    n_tox = len(spans)
    if n_tox == 0:
        return 0, 0.0, False
    n_words = len(text.split())
    ratio = round(n_tox / n_words, 6) if n_words else 0.0
    return n_tox, ratio, (n_tox >= min_hits or ratio >= min_ratio)


def scrub_toxic(text: str, token: str = "[TOXIC]") -> str:
    """Mask every toxic token span; replacements run right-to-left so earlier
    offsets stay valid."""
    spans = toxic_spans(text)
    if not spans:
        return text
    out = text
    for start, end, _ in reversed(spans):
        out = out[:start] + token + out[end:]
    return out
