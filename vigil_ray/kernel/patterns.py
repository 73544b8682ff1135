"""Structured-PII extraction: regex bank + anti-false-positive guards.

Detection semantics are a faithful re-implementation of the reference's
behavior (reference ``src/patterns.py``, pinned by its ``tests/test_patterns.py``):

- CPF formatted ``XXX.XXX.XXX-XX`` @0.95 and partial ``XXXXXXXXX-XX`` @0.90,
  deduplicated within a document by digit-normalized value, suppressed when a
  SEI/NUP/Processo/protocolo marker appears in the window
  ``text[pos-50 : pos+30]`` (reference src/patterns.py:158-187,256-268).
- CPF numeric (11 digits) only with an explicit "CPF" prefix, suppressed when a
  CDA/CNH/NIS/matrícula/RNE/PIS/PASEP marker appears in ``text[pos-30 : pos+15]``
  (reference src/patterns.py:189-201,270-282). No check-digit validation, by
  design (reference src/patterns.py:8-9).
- Email @0.95, no dedup (src/patterns.py:203-208).
- Phone in four variants tried in a fixed order — parenthesized @0.95,
  +55 international @0.95, context-prefixed @0.90, bare @0.80 — sharing one
  digit-normalized dedup set and a >=10-digit floor; the try order decides
  which surface form survives dedup (src/patterns.py:210-247).
- RG with explicit "RG" prefix @0.85 (src/patterns.py:249-254).
- Contextual signals (first-person / address / contact markers) at most one
  per family, fixed confidences 0.70/0.60/0.65 — metadata only, they never
  flip the document label (src/patterns.py:284-317).

New relative to the reference: every accepted match also reports its character
span, so the scrub stage can redact *all* occurrences (including value
duplicates that dedup removes from the detection list).

This module is import-time compiled: each Ray worker process pays regex
compilation once, mirroring the reference's compile-in-__init__ policy
(src/patterns.py:103-123) without per-batch cost.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple, Tuple

from vigil_ray.kernel.preprocess import fold_for_keywords


class Detection(NamedTuple):
    tipo: str
    valor: str
    conf: float
    start: int
    end: int

    def as_triple(self) -> Tuple[str, str, float]:
        """Reference-shaped (tipo, valor, confianca) tuple."""
        return (self.tipo, self.valor, self.conf)


_DIGITS_ONLY = re.compile(r"\D")
_DIGIT_RUNS = re.compile(r"\d+")

# --- structured PII ---------------------------------------------------------
RX_CPF_FMT = re.compile(r"\d{3}\.\d{3}\.\d{3}-\d{2}")
RX_CPF_PART = re.compile(r"\b\d{9}-\d{2}\b")
RX_CPF_NUM = re.compile(r"(?:CPF\s*[:\s]*)\b(\d{11})\b", re.IGNORECASE)
RX_EMAIL = re.compile(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", re.IGNORECASE)
RX_PHONE_PAREN = re.compile(r"\(\d{2}\)\s*\d{4,5}-?\d{4}")
RX_PHONE_INTL = re.compile(r"\+55\s*\(?\d{2}\)?\s*\d{4,5}[-\s]?\d{4}")
RX_PHONE_BARE = re.compile(r"\b\d{2}\s+\d{4,5}[-\s]?\d{4}\b")
RX_PHONE_CTX = re.compile(
    r"(?:fone|telefone|tel|celular|cel|contato|whatsapp|whats|zap)"
    r"\s*[:\s]*\(?\d{2}\)?[\s.-]?\d{4,5}[\s.-]?\d{4}",
    re.IGNORECASE,
)
RX_RG = re.compile(r"\bRG[:\s]*[\d.-]+", re.IGNORECASE)
# necessary-condition cover of RX_PHONE_CTX's keyword alternation: every
# alternative contains one of these literals (telefone ⊃ tel/fone,
# celular ⊃ cel, whatsapp ⊃ whats), so a folded text containing none of
# them provably cannot match — scan_document's literal guard set
_PHONE_CTX_WORDS = ("fone", "tel", "cel", "contato", "whats", "zap")

# --- north-star extensions beyond the reference bank (BASELINE.json
# north_star: "CPF/SSN, credit cards") -------------------------------------
# US SSN, strict AAA-GG-SSSS surface form; boundaries exclude longer digit
# runs (SEI/processo numbers use '/' and 5+-digit groups, so they can't match).
RX_SSN = re.compile(r"\b\d{3}-\d{2}-\d{4}\b")
# Credit-card candidate: 13-19 digits in space/hyphen groups. The lookbehind
# rejects starts inside a longer number, after '+' (intl phone) or '.'
# (formatted CPF); the lookahead rejects a following digit. Acceptance
# additionally requires a Luhn-valid 13-19 digit payload — unlike CPF, the
# north_star implies card *validation*, so accidental digit runs (protocol
# numbers, concatenated ids) are rejected arithmetically.
RX_CARD = re.compile(r"(?<![\d.+-])(?:\d[ -]?){12,18}\d(?![\d-])")


_CARD_SPLIT = re.compile(r"[ -]")


def _card_shape_ok(value: str) -> bool:
    """Separator-grouped candidates must be grouped like real cards
    (4-4-4-4, 4-6-5, 4-6-4 — first group of 4, later groups 4-6 digits);
    rejects processo/protocol numbers like ``00015-00568900`` that can pass
    Luhn by chance. Contiguous digit runs are shape-free."""
    groups = _CARD_SPLIT.split(value)
    if len(groups) == 1:
        return True
    return len(groups[0]) == 4 and all(len(g) in (4, 5, 6) for g in groups[1:])


def _card_accept(text: str, m: "re.Match") -> bool:
    digits = _DIGITS_ONLY.sub("", m.group())
    return (
        13 <= len(digits) <= 19
        and _card_shape_ok(m.group())
        and luhn_valid(digits)
        and not _in_sei_window(text, m.start())
    )


def luhn_valid(digits: str) -> bool:
    """Luhn mod-10 checksum over an all-digit string."""
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = ord(ch) - 48
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0

# --- anti-false-positive window guards -------------------------------------
RX_SEI_GUARDS = tuple(
    re.compile(p, re.IGNORECASE)
    for p in (
        r"(?:SEI|NUP)\s*(?:nº|n°|n\.?)?\s*[\d./-]+",
        r"(?:Processo|processo)\s*(?:nº|n°|n\.?)?\s*[\d./-]+",
        r"protocolo\s*(?:nº|n°|n\.?)?\s*[\d./-]+",
    )
)
RX_NOT_CPF_GUARDS = (
    re.compile(
        r"(?:CDA|CNH|NIS|matrícula|RNE|PIS|PASEP)\s*(?:nº|n°|n\.?)?\s*[:\s]*\d{11}",
        re.IGNORECASE,
    ),
)

# --- contextual-signal families (metadata only) -----------------------------
# Each family carries a literal pre-gate (first tuple slot after conf): the
# family regexes can only match when one of the anchor literals occurs. The
# gate is a tuple of ASCII-lowercase literals probed with `in` against ONE
# shared fold_for_keywords() copy — exactly re.IGNORECASE-equivalent (see
# preprocess.py; pinned by tests/test_properties.py's gate differential) and
# ~30× cheaper than an IGNORECASE alternation search per family. Never
# changes which documents match.
_CTX_FAMILIES = (
    (
        "contexto_1pessoa",
        "marcador_primeira_pessoa",
        0.70,
        ("meu", "minha", "sou", "chamo", "nome"),
        tuple(
            re.compile(p, re.IGNORECASE)
            for p in (
                r"(?:meu|minha)\s+(?:CPF|nome|RG|telefone|email|e-mail|celular|endereço)",
                r"(?:sou|chamo-me|nome\s+é)\s+[A-Z][a-záàâãéêíóôõúç]+\s+[A-Z]",
            )
        ),
    ),
    (
        "endereco",
        "marcador_endereco",
        0.60,
        (
            "moro", "resido", "residente", "rua", "avenida", "quadra",
            "conjunto", "bloco", "lote", "apartamento", "apt", "cep",
        ),
        tuple(
            re.compile(p, re.IGNORECASE)
            for p in (
                r"(?:moro|resido|residente)\s+(?:na?|em)",
                r"(?:rua|avenida|quadra|conjunto|bloco|lote|apartamento|apt\.?)\s+",
                r"CEP[:\s]*\d{5}-?\d{3}",
            )
        ),
    ),
    (
        "contato",
        "marcador_contato",
        0.65,
        ("contato", "whats", "zap", "fone", "telefone", "cel"),
        tuple(
            re.compile(p, re.IGNORECASE)
            for p in (
                r"(?:contato|WhatsApp|whatsapp|Whats|zap)\s*[:\s]*\(?\d",
                r"(?:fone|telefone|cel|celular)\s*[:\s]*\(?\d",
            )
        ),
    ),
)


def _in_sei_window(text: str, pos: int) -> bool:
    window = text[max(0, pos - 50) : pos + 30]
    return any(g.search(window) for g in RX_SEI_GUARDS)


def _in_not_cpf_window(text: str, pos: int) -> bool:
    window = text[max(0, pos - 30) : pos + 15]
    return any(g.search(window) for g in RX_NOT_CPF_GUARDS)


def find_cpf(text: str) -> List[Detection]:
    """Formatted + partial + context-numeric CPF with guards and dedup."""
    out: List[Detection] = []
    seen: set = set()
    for rx, conf in ((RX_CPF_FMT, 0.95), (RX_CPF_PART, 0.90)):
        for m in rx.finditer(text):
            key = _DIGITS_ONLY.sub("", m.group())
            if key in seen or _in_sei_window(text, m.start()):
                continue
            out.append(Detection("cpf", m.group(), conf, m.start(), m.end()))
            seen.add(key)
    for m in RX_CPF_NUM.finditer(text):
        if _in_not_cpf_window(text, m.start()):
            continue
        out.append(Detection("cpf", m.group(1), 0.90, m.start(1), m.end(1)))
    return out


def find_email(text: str) -> List[Detection]:
    return [
        Detection("email", m.group(), 0.95, m.start(), m.end())
        for m in RX_EMAIL.finditer(text)
    ]


def find_phone(text: str) -> List[Detection]:
    """Four phone variants sharing one dedup set; >=10 digits required."""
    out: List[Detection] = []
    seen: set = set()
    for rx, conf in (
        (RX_PHONE_PAREN, 0.95),
        (RX_PHONE_INTL, 0.95),
        (RX_PHONE_CTX, 0.90),
        (RX_PHONE_BARE, 0.80),
    ):
        for m in rx.finditer(text):
            digits = _DIGITS_ONLY.sub("", m.group())
            if len(digits) < 10 or digits in seen:
                continue
            out.append(Detection("telefone", m.group(), conf, m.start(), m.end()))
            seen.add(digits)
    return out


def find_rg(text: str) -> List[Detection]:
    return [
        Detection("rg", m.group(), 0.85, m.start(), m.end())
        for m in RX_RG.finditer(text)
    ]


def find_ssn(text: str) -> List[Detection]:
    return [
        Detection("ssn", m.group(), 0.95, m.start(), m.end())
        for m in RX_SSN.finditer(text)
    ]


def find_card(text: str) -> List[Detection]:
    """Luhn-validated card numbers, deduplicated by digit string."""
    out: List[Detection] = []
    seen: set = set()
    for m in RX_CARD.finditer(text):
        if not _card_accept(text, m):
            continue
        digits = _DIGITS_ONLY.sub("", m.group())
        if digits in seen:
            continue
        out.append(Detection("cartao", m.group(), 0.95, m.start(), m.end()))
        seen.add(digits)
    return out


def scan_document(text):
    """One pass over every structured pattern -> ``(detections, scrub_spans)``.

    ``detections`` is exactly :func:`find_structured` (reference dedup rules,
    reference layer order cpf -> email -> phone -> rg, src/patterns.py:125-156);
    ``scrub_spans`` is every guard-passing match *including value duplicates*
    -- dedup affects reporting only; a value repeated in two surface forms
    must still be masked at both spans. Single scan = the hot-path form used
    by the detect stage; the find_* wrappers below expose each list.
    """
    if not text:
        return [], []
    detections: List[Detection] = []
    spans: List[Detection] = []

    # Literal necessary-condition guards: each pattern below provably cannot
    # match unless its anchor character/keyword occurs, and a C-speed `in`
    # probe (~0.1 µs) replaces a full finditer scan (~13 µs) on the misses.
    # A guarded-out scan contributes no matches, so append order and the
    # shared dedup sets are untouched — pure optimization, pinned by the
    # scan-equals-wrappers property tests. Keyword guards probe the
    # fold_for_keywords() copy (exactly re.IGNORECASE-equivalent).
    has_hyphen = "-" in text
    low = fold_for_keywords(text)
    # exact \d-class digit count (Unicode Nd, same class the patterns use):
    # every CPF needs 11 digits, phones >=10 (the explicit per-match filter),
    # SSN 9, card 13 — a text with fewer digits provably cannot match, and
    # one \d+ run scan (~7 µs) skips the expensive card/phone scans on the
    # mostly-digit-free majority of a web corpus
    n_digits = sum(m.end() - m.start() for m in _DIGIT_RUNS.finditer(text))

    seen_cpf: set = set()
    if has_hyphen and n_digits >= 11:  # both CPF surface forms carry 11 digits
        cpf_layers = (
            ((RX_CPF_FMT, 0.95), (RX_CPF_PART, 0.90))
            if "." in text  # the formatted form also needs dots
            else ((RX_CPF_PART, 0.90),)
        )
        for rx, conf in cpf_layers:
            for m in rx.finditer(text):
                if _in_sei_window(text, m.start()):
                    continue
                d = Detection("cpf", m.group(), conf, m.start(), m.end())
                spans.append(d)
                key = _DIGITS_ONLY.sub("", m.group())
                if key not in seen_cpf:
                    detections.append(d)
                    seen_cpf.add(key)
    if n_digits >= 11 and "cpf" in low:
        for m in RX_CPF_NUM.finditer(text):
            if _in_not_cpf_window(text, m.start()):
                continue
            d = Detection("cpf", m.group(1), 0.90, m.start(1), m.end(1))
            spans.append(d)
            detections.append(d)

    if "@" in text:
        for m in RX_EMAIL.finditer(text):
            d = Detection("email", m.group(), 0.95, m.start(), m.end())
            spans.append(d)
            detections.append(d)

    seen_phone: set = set()
    phone_possible = n_digits >= 10  # the per-match filter needs 10 digits
    for rx, conf, hit in (
        (RX_PHONE_PAREN, 0.95, phone_possible and "(" in text),
        (RX_PHONE_INTL, 0.95, phone_possible and "+" in text),
        (RX_PHONE_CTX, 0.90, phone_possible and any(w in low for w in _PHONE_CTX_WORDS)),
        (RX_PHONE_BARE, 0.80, phone_possible),
    ):
        if not hit:
            continue
        for m in rx.finditer(text):
            digits = _DIGITS_ONLY.sub("", m.group())
            if len(digits) < 10:
                continue
            d = Detection("telefone", m.group(), conf, m.start(), m.end())
            spans.append(d)
            if digits not in seen_phone:
                detections.append(d)
                seen_phone.add(digits)

    if "rg" in low:
        for m in RX_RG.finditer(text):
            d = Detection("rg", m.group(), 0.85, m.start(), m.end())
            spans.append(d)
            detections.append(d)

    # north-star extension layers, appended after the reference's fixed order
    # so first-appearance type ordering is unchanged for reference inputs
    if has_hyphen and n_digits >= 9:
        for m in RX_SSN.finditer(text):
            d = Detection("ssn", m.group(), 0.95, m.start(), m.end())
            spans.append(d)
            detections.append(d)

    seen_card: set = set()
    if n_digits < 13:
        return detections, spans
    for m in RX_CARD.finditer(text):
        if not _card_accept(text, m):
            continue
        digits = _DIGITS_ONLY.sub("", m.group())
        d = Detection("cartao", m.group(), 0.95, m.start(), m.end())
        spans.append(d)
        if digits not in seen_card:
            detections.append(d)
            seen_card.add(digits)

    return detections, spans


def find_structured(text):
    """All structured PII: the reference's fixed layer order
    (cpf -> email -> phone -> rg; reference src/patterns.py:125-156) plus the
    north-star extension layers (ssn -> cartao) appended after it."""
    return scan_document(text)[0]


def find_scrub_spans(text):
    """Every guard-passing PII match *including value duplicates* -- the
    redaction set (see :func:`scan_document`)."""
    return scan_document(text)[1]


def find_contextual(text: str) -> List[Detection]:
    """At most one signal per family; fixed label + confidence per family."""
    if not text:
        return []
    out: List[Detection] = []
    low = fold_for_keywords(text)
    for tipo, label, conf, gate_words, guards in _CTX_FAMILIES:
        if not any(w in low for w in gate_words):
            continue
        for g in guards:
            m = g.search(text)
            if m:
                out.append(Detection(tipo, label, conf, m.start(), m.end()))
                break
    return out
