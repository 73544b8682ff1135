"""Property-based tests (hypothesis): kernel invariants under arbitrary text."""

from hypothesis import given, settings
from hypothesis import strategies as st

from vigil_ray.kernel.detector import (
    analyze_document,
    could_have_pii,
    detect_pii,
    scrub_text,
)
from vigil_ray.kernel.preprocess import normalize_text
from vigil_ray.kernel.quality import quality_features
from vigil_ray.kernel.textstats import count_ws_tokens

TEXTISH = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",)
    ),
    max_size=400,
)


@settings(max_examples=300, deadline=None)
@given(TEXTISH)
def test_prefilter_is_conservative(text):
    """could_have_pii(normalized)=False ⇒ detect_pii is provably empty."""
    clean = normalize_text(text)
    if clean and not could_have_pii(clean):
        res = detect_pii(text)
        assert res["contem_pii"] is False
        assert res["tipos_detectados"] == []


@settings(max_examples=200, deadline=None)
@given(TEXTISH)
def test_analyze_equals_layered(text):
    res, scrub = analyze_document(text)
    expected = detect_pii(text)
    assert res == expected
    clean = normalize_text(text)
    assert scrub == (scrub_text(clean) if expected["contem_pii"] else clean)


@settings(max_examples=200, deadline=None)
@given(TEXTISH)
def test_normalize_idempotent(text):
    once = normalize_text(text)
    assert normalize_text(once) == once


@settings(max_examples=200, deadline=None)
@given(TEXTISH)
def test_quality_features_bounded(text):
    f = quality_features(text)
    for key in (
        "symbol_to_word_ratio",
        "alpha_word_frac",
        "dup_line_frac",
        "top2gram_frac",
        "top3gram_frac",
        "dup5gram_frac",
    ):
        assert f[key] >= 0.0
    for key in ("alpha_word_frac", "dup_line_frac", "top2gram_frac",
                "top3gram_frac", "dup5gram_frac"):
        assert f[key] <= 1.0
    assert f["n_words"] == count_ws_tokens(text.strip() if text else "")


@settings(max_examples=150, deadline=None)
@given(TEXTISH)
def test_scrub_deterministic_and_detection_free(text):
    clean = normalize_text(text)
    a, b = scrub_text(clean), scrub_text(clean)
    assert a == b
    # structured PII never survives scrubbing
    from vigil_ray.kernel.patterns import find_scrub_spans

    for d in find_scrub_spans(a):
        # any remaining span must come from the placeholder text itself
        assert "[" in a or d.valor not in clean


@settings(max_examples=200, deadline=None)
@given(TEXTISH)
def test_toxicity_scrub_removes_all_hits(text):
    """After scrub_toxic, no toxic token remains, and clean text is
    byte-identical (the mask touches exactly the toxic spans)."""
    from vigil_ray.kernel.toxicity import score_toxicity, scrub_toxic, toxic_spans

    masked = scrub_toxic(text)
    assert toxic_spans(masked) == []
    assert score_toxicity(masked)[0] == 0
    if not toxic_spans(text):
        assert masked == text


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=10**17))
def test_luhn_check_digit_roundtrip(n):
    """For any digit prefix there is exactly one Luhn-valid check digit."""
    from vigil_ray.kernel.patterns import luhn_valid

    prefix = str(n)
    valid = [d for d in "0123456789" if luhn_valid(prefix + d)]
    assert len(valid) == 1


@settings(max_examples=100, deadline=None)
@given(TEXTISH)
def test_card_detection_only_luhn_valid(text):
    from vigil_ray.kernel.patterns import find_card, luhn_valid, _DIGITS_ONLY

    for d in find_card(text):
        digits = _DIGITS_ONLY.sub("", d.valor)
        assert 13 <= len(digits) <= 19 and luhn_valid(digits)
        assert text[d.start : d.end] == d.valor


# adversarial PII-shaped fragments: random unicode almost never produces the
# keyword-anchored templates (RG--, name-next-to-CPF, overlapping spans), so
# compose texts from the anchors the regex banks key on
_PII_FRAGMENTS = st.lists(
    st.sampled_from(
        [
            "RG", "rg", "CPF", "portador", "nome", "Maria Silva",
            "123.456.789-00", "12 3456-7890", "3456-7890", "12.345.678-9",
            "--", "..", ":", " ", ", ", "x", "(61)", "99999-8888",
            "user@example.test", "SSN", "123-45-6789",
        ]
    ),
    min_size=1,
    max_size=8,
).map(" ".join)


@settings(max_examples=300, deadline=None)
@given(_PII_FRAGMENTS)
def test_prefilter_conservative_on_pii_shaped(text):
    clean = normalize_text(text)
    if clean and not could_have_pii(clean):
        res = detect_pii(text)
        assert res["contem_pii"] is False, text


@settings(max_examples=300, deadline=None)
@given(_PII_FRAGMENTS)
def test_analyze_equals_layered_on_pii_shaped(text):
    res, scrub = analyze_document(text)
    assert res == detect_pii(text), text
    assert scrub == scrub_text(normalize_text(text)), text


def test_partial_overlap_never_leaks():
    """A span partially overlapping a kept one must extend the redacted
    region — its non-overlapped tail is detected PII and may not survive
    scrubbing (regression: 'RG 12 3456-7890' once left '3456-7890')."""
    res, scrub = analyze_document("RG 12 3456-7890")
    assert "telefone" in res["tipos_detectados"]
    assert "3456" not in scrub and "7890" not in scrub, scrub


def test_digit_free_rg_keeps_fused_path_equal():
    """RX_RG matches dots/hyphens alone; the prefilter must anchor on the
    keyword so the fused path cannot short-circuit (regression: 'RG--')."""
    res, scrub = analyze_document("RG--")
    assert res == detect_pii("RG--")
    assert res["contem_pii"] is True and scrub == "[RG]"
