"""Differential conformance: vigil_ray kernel vs the reference implementation.

Runs both engines over a battery of adversarial texts and asserts identical
(contem_pii, tipos_detectados, detalhes, confianca). Skipped automatically
when the read-only reference checkout is absent — the repo is standalone;
this is a belt-and-braces gate for the F1>=0.99 keep/drop target
(BASELINE.md), here tightened to exact equality.
"""

import os
import sys

import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")),
    reason="reference checkout not available",
)

BATTERY = [
    "O CPF do solicitante é 123.456.789-00.",
    "CPF: 111.222.333-44 e também 555.666.777-88",
    "CPF: 12345678900",
    "O número 12345678900 é um código qualquer.",
    "Processo SEI 00015-12345678/2026-01",
    "NUP 00015-12345678/2026-01",
    "Processo nº 56478.000012/2026-05",
    "CDA n. 08563214753",
    "CNH: 78945612378",
    "Nis: 98765432165",
    "documento 123456789-00 anexo",
    "CPF 123.456.789-00 repetido como 123456789-00",
    "Contato: joao@email.com",
    "Email: maria.silva@empresa.gov.br",
    "jose.silva+teste@email.com.br",
    "Emails: a@b.com e c@d.org",
    "Telefone: (11) 99999-8888",
    "Cel: (21) 987654321",
    "Fone: (61) 3333-4444",
    "WhatsApp: +55 11 99999-1234",
    "Contatos: (11) 99999-1111 e (21) 88888-2222",
    "ligue (61) 99999-8888 ou 61 99999 8888",
    "ligue (61) 99999-8888 ou +55 (61) 99999-8888",
    "whatsapp: 61 99999 8888",
    "ramal 12 3456-789",
    "RG: 12.345.678-9",
    "RG 1234567",
    "O órgão responsável informou",
    "Solicito informações sobre meu CPF",
    "O meu nome completo é informado abaixo",
    "Moro na Quadra 302 Norte",
    "CEP: 70000-000",
    "WhatsApp: (61) 99999",
    "CPF: 123.456.789-00, email: teste@email.com, tel: (11) 99999-0000",
    "Solicito informações sobre o processo administrativo.",
    "",
    "sob o CPF: 210.201.140-24, Júlio Cesar Alves solicitou",
    "Jorge Luiz Pereira, email netolemos@me.pe",
    "Telefone para contato: (54)99199-1000",
    "Conforme SEI 00015-01009853/2026-01, solicito",
    "CPF: 12345678908, nome João Lopes Ribeiro",
    "meu nome é João da Silva Pereira, obrigado",
    "O cidadão: Carlos Alberto Souza solicita acesso",
    "meu nome é João Silva. nome: JOÃO SILVA confirma",
    "Moro na Quadra 302 Norte e meu CPF ficou retido",
    "requerente: João Silva Santos, CPF 123.456.789-00, RG 1234567, "
    "email joao@mail.com, tel (61) 99999-8888",
    "A Secretaria de Estado do Distrito Federal informa",
    "servidora: Maria da Conceição Alves atendeu",
    "Dr João Silva, CPF 999.888.777-66",
    "número ① do processo ﬁm",
    "CPF: １２３.４５６.７８９-００",
    "  espaços \t múltiplos   e\x00controle  ",
    "vitrais e painéis Athos Bulcão na rodoviária, nome: Athos Bulcão",
    "Pesquisadora da Universidade de Brasília, nome: Ana Paula Lima",
    "texto 100kb " + ("palavra " * 12000) + " CPF 123.456.789-00 " + ("fim " * 12000),
]


@pytest.fixture(scope="module")
def reference_detector():
    sys.path.insert(0, REFERENCE)
    try:
        from src.detector import PIIDetector  # type: ignore
        yield PIIDetector(use_ner=False)
    finally:
        sys.path.remove(REFERENCE)
        for mod in [m for m in sys.modules if m == "src" or m.startswith("src.")]:
            del sys.modules[mod]


def test_detection_parity(reference_detector):
    from vigil_ray.kernel.detector import detect_pii

    for text in BATTERY:
        ref = reference_detector.detect(text)
        ours = detect_pii(text)
        assert ours["contem_pii"] == ref["contem_pii"], text[:80]
        assert ours["tipos_detectados"] == ref["tipos_detectados"], text[:80]
        assert ours["detalhes"] == ref["detalhes"], text[:80]
        assert ours["sinais_contextuais"] == ref["sinais_contextuais"], text[:80]
        assert ours["confianca"] == ref["confianca"], text[:80]


def test_golden_corpus_parity(reference_detector):
    """Differential equality over the reference's own 99-record golden sample
    (real FOI request texts, analise/resultado.csv) — the strongest
    real-data conformance check available without the NER model."""
    import csv

    from vigil_ray.kernel.detector import analyze_document, detect_pii

    path = os.path.join(REFERENCE, "analise", "resultado.csv")
    if not os.path.exists(path):
        pytest.skip("golden corpus not available")
    with open(path, encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 99
    for row in rows:
        text = row["Texto Mascarado"]
        ref = reference_detector.detect(text)
        ours = detect_pii(text)
        assert ours == ref, row["ID"]
        fused, _ = analyze_document(text)
        assert fused == ref, row["ID"]


def test_review_parity(reference_detector):
    sys.path.insert(0, REFERENCE)
    try:
        from src.human_review import analyze_for_review  # type: ignore

        from vigil_ray.kernel.review import review_document

        for text in BATTERY:
            ref_det = reference_detector.detect(text)
            ref_items = analyze_for_review("doc", text, ref_det)
            ours = review_document(
                "doc", text, ref_det["detalhes"], ref_det["contem_pii"]
            )
            ref_set = {
                (i.id, i.tipo_pii, i.valor_detectado, i.score, i.motivo.value,
                 i.prioridade.value, i.texto_trecho)
                for i in ref_items
            }
            our_set = {
                (r["id"], r["tipo_pii"], r["valor_detectado"], r["score"],
                 r["motivo"], r["prioridade"], r["texto_trecho"])
                for r in ours
            }
            assert our_set == ref_set, text[:80]
    finally:
        sys.path.remove(REFERENCE)
        for mod in [m for m in sys.modules if m == "src" or m.startswith("src.")]:
            del sys.modules[mod]
