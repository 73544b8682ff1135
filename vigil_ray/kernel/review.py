"""Human-review triage: flags uncertain detections for manual follow-up.

Per-document flat-map kernel mirroring reference ``src/human_review.py``:
score-threshold reasons (low < 0.80 → alta priority, 0.80..0.95 → baixa;
src/human_review.py:307-311), suspicious-context reasons for names only
(artistic/academic/journalistic/public-official/legal/authorship;
src/human_review.py:313-343), known-artist lookup with bidirectional substring
match (src/human_review.py:380-386), context-window excerpt extraction
(src/human_review.py:388-410), and duplicate consolidation keeping the
most-prioritary reason per (doc, lowercased value) (src/human_review.py:241-290).
Consolidation groups never span documents, so it runs inside the flat-map —
no shuffle needed (SURVEY.md §2.6 A5).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

from vigil_ray.config import ReviewConfig

# reason → (stable name, consolidation rank, default priority)
# rank: lower wins when the same (doc, value) pair carries several reasons.
REASON_RANK = {
    "contexto_artistico": 1,
    "contexto_academico": 2,
    "contexto_juridico": 3,
    "contexto_cargo_publico": 4,
    "score_medio": 5,
    "score_baixo": 6,
    "contexto_jornalistico": 7,
    "contexto_autoria": 8,
    "nome_unico": 9,
    "ambiguidade_institucional": 10,
}

PRIORITY_RANK = {"alta": 0, "media": 1, "baixa": 2}

REASON_EXPLANATIONS = {
    "score_baixo": (
        "Score de confiança do modelo NER abaixo do threshold. "
        "Maior chance de falso positivo."
    ),
    "score_medio": (
        "Score de confiança moderado. Provavelmente correto, mas vale verificar."
    ),
    "contexto_artistico": (
        "Texto contém referências a arte/patrimônio. "
        "Nome pode ser de artista, não dado pessoal do solicitante."
    ),
    "contexto_academico": (
        "Texto contém contexto acadêmico. "
        "Nome pode ser dado manifestamente público (LGPD Art. 7º, § 4º)."
    ),
    "contexto_jornalistico": (
        "Texto contém contexto jornalístico. "
        "LGPD não se aplica a fins jornalísticos (Art. 4º, II, a)."
    ),
    "contexto_cargo_publico": (
        "Nome de autoridade/cargo público detectado. "
        "Dados de agentes públicos são públicos por natureza."
    ),
    "contexto_juridico": (
        "Contexto jurídico detectado (OAB, advogado, juiz). "
        "Dados profissionais públicos, não dados pessoais sensíveis."
    ),
    "contexto_autoria": (
        "Contexto de autoria/referência bibliográfica. "
        "Nome pode ser de autor citado, não do solicitante."
    ),
    "nome_unico": (
        "Apenas primeiro nome detectado, sem sobrenome. "
        "Pode não permitir identificação direta."
    ),
    "ambiguidade_institucional": (
        "Nome pode ser institucional ou de pessoa física. "
        "Requer análise do contexto."
    ),
}

_CONTEXT_BANKS: Dict[str, Tuple[re.Pattern, ...]] = {
    "contexto_artistico": tuple(
        re.compile(p, re.IGNORECASE)
        for p in (
            r"\b(vitral|vitrais|mosaico|mosaicos|escultura|esculturas|afresco|afrescos)\b",
            r"\b(painéis?)\s+(artístico|de\s+arte|decorativo|azulejo)",
            r"\bpainéis\s+(?:de\s+)?[A-Z][a-záàâãéêíóôõúç]+",
            r"\b(obra|obras)\s+de\s+arte\b",
            r"\b(artista|artistas|pintor|pintores|escultor|escultores)\b",
            r"\bpatrimônio\s+(cultural|histórico|artístico|tombado)\b",
            r"\b(tombado|tombamento)\b",
            r"\bmuseu\s+(?:de\s+)?(?:arte|belas\s+artes)\b",
            r"\bgaleria\s+(?:de\s+)?arte\b",
            r"\b(lustre|lustres|luminária|luminárias)\s+(?:antiga|antigo|históric)",
        )
    ),
    "contexto_academico": tuple(
        re.compile(p, re.IGNORECASE)
        for p in (
            r"\b(pesquisador|pesquisadora|orientador|orientadora)\b",
            r"\b(prof\.|profa\.|professor|professora)\s+[A-Z]",
            r"\bDr\.?\s+[A-Z]",
            r"\bDoutora?\.?\s+[A-Z]",
            r"\b(mestrado|doutorado|tese|dissertação|pós-graduação)\b",
            r"\buniversidade\s+(?:de|do|da|federal|estadual|católica)\b",
            r"\bfaculdade\s+(?:de|do|da)\b",
            r"\binstituto\s+(?:brasileiro\s+de\s+)?(?:ensino|pesquisa|educação)\b",
            r"\b(artigo|publicação|pesquisa)\s+(?:científica|acadêmica)\b",
            r"\bprojeto\s+(?:de\s+)?(?:pesquisa|tcc|final)\b",
        )
    ),
    "contexto_jornalistico": tuple(
        re.compile(p, re.IGNORECASE)
        for p in (
            r"\b(segundo|conforme|de\s+acordo\s+com)\s+(?:a\s+)?(?:reportagem|matéria|notícia)\b",
            r"\b(publicado|publicada)\s+(?:no|na|em)\s+(?:jornal|revista|site)\b",
            r"\bfonte[:\s]+[A-Z]",
            r"\b(jornalista|repórter|colunista)\s+[A-Z]",
        )
    ),
    "contexto_cargo_publico": tuple(
        re.compile(p, re.IGNORECASE)
        for p in (
            r"\b(governador|governadora)\s+[A-Z]",
            r"\b(secretário|secretária)\s+(?:de\s+estado\s+)?[A-Z]",
            r"\b(ministro|ministra)\s+[A-Z]",
            r"\b(prefeito|prefeita)\s+[A-Z]",
            r"\b(deputado|deputada|senador|senadora)\s+[A-Z]",
            r"\b(presidente|vice-presidente)\s+[A-Z]",
            r"\bex-(?:governador|prefeito|ministro|presidente)\b",
        )
    ),
    "contexto_juridico": tuple(
        re.compile(p, re.IGNORECASE)
        for p in (
            r"\bOAB[/\s]?[A-Z]{2}[:\s]*\d+",
            r"\badvogado\s+[A-Z]",
            r"\badvogada\s+[A-Z]",
            r"\bprocurador\s+[A-Z]",
            r"\bdefensor\s+[A-Z]",
            r"\bjuiz\s+[A-Z]",
            r"\bjuíza\s+[A-Z]",
            r"\bdesembargador\s+[A-Z]",
        )
    ),
    "contexto_autoria": tuple(
        re.compile(p, re.IGNORECASE)
        for p in (
            r"\b(?:autor|autora|escrito\s+por)\s+[A-Z]",
            r"\bsegundo\s+[A-Z][a-záàâãéêíóôõúç]+\s+\(\d{4}\)",
            r"\b[A-Z][A-Z]+,\s+[A-Z][a-z]+\.\s+\(\d{4}\)",
            r"\bapud\s+[A-Z]",
            r"\bin:\s+[A-Z]",
        )
    ),
}

# reason → priority when triggered (reference src/human_review.py:313-343)
_CONTEXT_PRIORITY = {
    "contexto_artistico": "alta",
    "contexto_academico": "media",
    "contexto_jornalistico": "media",
    "contexto_cargo_publico": "baixa",
    "contexto_juridico": "baixa",
    "contexto_autoria": "baixa",
}

KNOWN_ARTISTS = (
    "athos bulcão", "athos bulsão", "burle marx", "roberto burle marx",
    "oscar niemeyer", "cândido portinari", "portinari", "di cavalcanti",
    "tarsila do amaral", "alfredo volpi", "marianne peretti", "gugon",
)


def _is_known_artist(name: str) -> bool:
    lowered = name.lower().strip()
    return any(a in lowered or lowered in a for a in KNOWN_ARTISTS)


def _excerpt(text: str, value: str, window: int) -> str:
    pos = text.lower().find(value.lower())
    if pos == -1:
        return text[: window * 2] + ("..." if len(text) > window * 2 else "")
    start = max(0, pos - window)
    end = min(len(text), pos + len(value) + window)
    piece = text[start:end]
    if start > 0:
        piece = "..." + piece
    if end < len(text):
        piece = piece + "..."
    return piece


def review_document(
    doc_id: str,
    text: str,
    detalhes: List[Tuple[str, str, float]],
    contem_pii: bool,
    cfg: ReviewConfig = ReviewConfig(),
) -> List[Dict[str, Any]]:
    """Produce 0..n consolidated review rows for one document."""
    if not contem_pii or not detalhes:
        return []
    rows: List[Dict[str, Any]] = []
    # the context banks scan TEXT only — hoist the six full-document regex
    # sweeps out of the per-detection loop (k nome detections would pay the
    # ~40-regex cascade k times in the flat-map hot path); computed lazily
    # so digit-only documents never pay them at all
    bank_hit: Dict[str, bool] = {}

    def _hit(ctx: str) -> bool:
        if ctx not in bank_hit:
            bank_hit[ctx] = any(p.search(text) for p in _CONTEXT_BANKS[ctx])
        return bank_hit[ctx]

    for tipo, valor, score in detalhes:
        reasons: List[Tuple[str, str]] = []
        if score < cfg.low_confidence_threshold:
            reasons.append(("score_baixo", "alta"))
        elif score < cfg.high_confidence_threshold:
            reasons.append(("score_medio", "baixa"))
        if tipo == "nome":
            if cfg.check_artistic_context:
                if _hit("contexto_artistico"):
                    reasons.append(("contexto_artistico", "alta"))
                if _is_known_artist(valor):
                    reasons.append(("contexto_artistico", "alta"))
            if cfg.check_academic_context and _hit("contexto_academico"):
                reasons.append(("contexto_academico", "media"))
            for ctx in (
                "contexto_jornalistico",
                "contexto_cargo_publico",
                "contexto_juridico",
                "contexto_autoria",
            ):
                if _hit(ctx):
                    reasons.append((ctx, _CONTEXT_PRIORITY[ctx]))
        for motivo, prioridade in reasons:
            rows.append(
                {
                    "id": doc_id,
                    "texto_trecho": _excerpt(text, valor, cfg.context_window),
                    "tipo_pii": tipo,
                    "valor_detectado": valor,
                    "score": score,
                    "motivo": motivo,
                    "prioridade": prioridade,
                    "explicacao": REASON_EXPLANATIONS.get(
                        motivo, "Verificação manual recomendada."
                    ),
                }
            )
    return _consolidate(rows)


def _consolidate(rows: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """One row per (doc, lowercased value); the lowest reason-rank wins."""
    if not rows:
        return rows
    best: Dict[Tuple[str, str], Dict[str, Any]] = {}
    for row in rows:
        key = (row["id"], row["valor_detectado"].lower())
        cur = best.get(key)
        if cur is None or REASON_RANK.get(row["motivo"], 99) < REASON_RANK.get(
            cur["motivo"], 99
        ):
            best[key] = row
    return list(best.values())
