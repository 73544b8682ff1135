"""Regex-kernel unit tests.

Ports the reference's operator-level semantics (reference
tests/test_patterns.py) onto the vigil_ray kernel API, plus span/scrub cases
the reference does not have.
"""

from vigil_ray.kernel import patterns as P


class TestCpf:
    def test_formatted(self):
        det = P.find_cpf("O CPF do solicitante é 123.456.789-00.")
        assert len(det) == 1
        assert det[0].tipo == "cpf"
        assert det[0].valor == "123.456.789-00"
        assert det[0].conf == 0.95

    def test_formatted_multiple(self):
        det = P.find_cpf("CPF: 111.222.333-44 e também 555.666.777-88")
        assert len(det) == 2

    def test_partial_form(self):
        det = P.find_cpf("documento 123456789-00 anexo")
        assert len(det) == 1
        assert det[0].conf == 0.90

    def test_numeric_with_context(self):
        det = P.find_cpf("CPF: 12345678900")
        assert len(det) == 1
        assert det[0].valor == "12345678900"

    def test_numeric_without_context_rejected(self):
        assert P.find_cpf("O número 12345678900 é um código qualquer.") == []

    def test_sei_context_suppressed(self):
        assert P.find_cpf("Processo SEI 00015-12345678/2026-01") == []
        assert P.find_cpf("NUP 00015-12345678/2026-01") == []
        assert P.find_cpf("Processo nº 56478.000012/2026-05") == []

    def test_not_cpf_documents(self):
        assert P.find_cpf("CDA n. 08563214753") == []
        assert P.find_cpf("CNH: 78945612378") == []
        assert P.find_cpf("Nis: 98765432165") == []

    def test_dedup_by_digits(self):
        # same CPF in formatted and partial form → one detection (first wins)
        det = P.find_cpf("CPF 123.456.789-00 repetido como 123456789-00")
        assert len(det) == 1
        assert det[0].valor == "123.456.789-00"


class TestEmail:
    def test_simple(self):
        det = P.find_email("Contato: joao@email.com")
        assert [d.valor for d in det] == ["joao@email.com"]
        assert det[0].conf == 0.95

    def test_subdomain(self):
        det = P.find_email("Email: maria.silva@empresa.gov.br")
        assert len(det) == 1 and "empresa.gov.br" in det[0].valor

    def test_plus_tag_and_digits(self):
        assert len(P.find_email("usuario123@dominio456.net")) == 1
        assert len(P.find_email("jose.silva+teste@email.com.br")) == 1

    def test_multiple(self):
        assert len(P.find_email("Emails: a@b.com e c@d.org")) == 2


class TestPhone:
    def test_mobile_hyphen(self):
        det = P.find_phone("Telefone: (11) 99999-8888")
        assert len(det) == 1 and "99999-8888" in det[0].valor
        assert det[0].conf == 0.95

    def test_mobile_no_hyphen(self):
        assert len(P.find_phone("Cel: (21) 987654321")) == 1

    def test_landline(self):
        assert len(P.find_phone("Fone: (61) 3333-4444")) == 1

    def test_international(self):
        assert len(P.find_phone("WhatsApp: +55 11 99999-1234")) >= 1

    def test_multiple(self):
        assert len(P.find_phone("Contatos: (11) 99999-1111 e (21) 88888-2222")) == 2

    def test_dedup_across_formats(self):
        # same digits with and without parens/hyphen → one detection; the
        # parenthesized variant is tried first, so it survives
        det = P.find_phone("ligue (61) 99999-8888 ou 61 99999 8888")
        assert len(det) == 1
        assert det[0].valor == "(61) 99999-8888"

    def test_intl_prefix_distinct_digits(self):
        # +55 form normalizes to 13 digits ≠ the 11-digit local form, so both
        # survive dedup (digit-string keying, reference semantics)
        det = P.find_phone("ligue (61) 99999-8888 ou +55 (61) 99999-8888")
        assert len(det) == 2

    def test_short_number_rejected(self):
        assert P.find_phone("ramal 12 3456-789") == []


class TestRg:
    def test_with_context(self):
        det = P.find_rg("RG: 12.345.678-9")
        assert len(det) == 1 and det[0].conf == 0.85

    def test_simple(self):
        assert len(P.find_rg("RG 1234567")) == 1

    def test_no_marker_no_hit(self):
        assert P.find_rg("O órgão responsável informou") == []


class TestContextual:
    def test_first_person(self):
        det = P.find_contextual("Solicito informações sobre meu CPF")
        assert any(d.tipo == "contexto_1pessoa" for d in det)

    def test_address(self):
        det = P.find_contextual("Moro na Quadra 302 Norte")
        assert any(d.tipo == "endereco" for d in det)

    def test_cep(self):
        det = P.find_contextual("CEP: 70000-000")
        assert any(d.tipo == "endereco" for d in det)

    def test_contact(self):
        det = P.find_contextual("WhatsApp: (61) 99999")
        assert any(d.tipo == "contato" for d in det)

    def test_one_per_family(self):
        det = P.find_contextual("meu CPF e meu nome, sou João Silva")
        assert len([d for d in det if d.tipo == "contexto_1pessoa"]) == 1


class TestFindStructured:
    def test_multi_type(self):
        text = "CPF: 123.456.789-00, email: teste@email.com, tel: (11) 99999-0000"
        tipos = {d.tipo for d in P.find_structured(text)}
        assert {"cpf", "email", "telefone"} <= tipos

    def test_clean_text(self):
        assert P.find_structured("Solicito informações sobre o processo.") == []

    def test_empty_and_none(self):
        assert P.find_structured("") == []
        assert P.find_structured(None) == []

    def test_real_sample_id7(self):
        text = "sob o CPF: 210.201.140-24, Júlio Cesar Alves solicitou"
        cpfs = [d for d in P.find_structured(text) if d.tipo == "cpf"]
        assert len(cpfs) == 1 and cpfs[0].valor == "210.201.140-24"

    def test_real_sample_id17(self):
        text = "Jorge Luiz Pereira, email netolemos@me.pe"
        emails = [d for d in P.find_structured(text) if d.tipo == "email"]
        assert len(emails) == 1 and emails[0].valor == "netolemos@me.pe"

    def test_real_sample_id10(self):
        text = "Telefone para contato: (54)99199-1000"
        assert len([d for d in P.find_structured(text) if d.tipo == "telefone"]) == 1

    def test_real_sample_sei(self):
        text = "Conforme SEI 00015-01009853/2026-01, solicito"
        assert [d for d in P.find_structured(text) if d.tipo == "cpf"] == []

    def test_real_sample_id85(self):
        text = "CPF: 12345678908, nome João Lopes Ribeiro"
        cpfs = [d for d in P.find_structured(text) if d.tipo == "cpf"]
        assert len(cpfs) == 1 and cpfs[0].valor == "12345678908"


class TestSpans:
    def test_spans_point_at_values(self):
        text = "CPF 123.456.789-00 e email a@b.com"
        for d in P.find_structured(text):
            assert text[d.start : d.end] == d.valor

    def test_scrub_spans_include_duplicates(self):
        text = "CPF 123.456.789-00 repetido como 123456789-00"
        assert len(P.find_cpf(text)) == 1          # reporting dedups
        assert len(P.find_scrub_spans(text)) == 2  # redaction does not


class TestSSN:
    def test_formatted_ssn(self):
        dets = [d for d in P.find_structured("my SSN: 123-45-6789 ok") if d.tipo == "ssn"]
        assert len(dets) == 1 and dets[0].valor == "123-45-6789" and dets[0].conf == 0.95

    def test_ssn_not_in_sei_number(self):
        text = "Conforme processo SEI 00015-12345678/2026-01 informado."
        assert [d for d in P.find_structured(text) if d.tipo == "ssn"] == []

    def test_ssn_span(self):
        text = "x 123-45-6789 y"
        d = P.find_ssn(text)[0]
        assert text[d.start : d.end] == d.valor


class TestCreditCard:
    def test_luhn(self):
        assert P.luhn_valid("4111111111111111")
        assert P.luhn_valid("5500005555555559")
        assert P.luhn_valid("378282246310005")     # 15-digit amex
        assert not P.luhn_valid("4111111111111112")

    def test_spaced_card_detected(self):
        dets = P.find_card("Cartão 4111 1111 1111 1111 cadastrado.")
        assert len(dets) == 1 and dets[0].conf == 0.95
        assert dets[0].valor == "4111 1111 1111 1111"

    def test_hyphenated_card_detected(self):
        assert len(P.find_card("card 4111-1111-1111-1111 end")) == 1

    def test_luhn_invalid_rejected(self):
        assert P.find_card("numero 4111 1111 1111 1112 fim") == []

    def test_phone_not_card(self):
        # 13-digit intl phone must not be mistaken for a card
        assert P.find_card("+55 11 98888-7777 e email a@b.test") == []

    def test_cpf_not_card(self):
        assert P.find_card("CPF: 12345678908 ok") == []

    def test_card_dedup_by_digits(self):
        dets = P.find_card("4111 1111 1111 1111 e 4111-1111-1111-1111")
        assert len(dets) == 1
        # but both spans are scrubbed
        spans = [d for d in P.find_scrub_spans("4111 1111 1111 1111 e 4111-1111-1111-1111") if d.tipo == "cartao"]
        assert len(spans) == 2

    def test_long_digit_run_not_card(self):
        assert P.find_card("id 123456789012345678901234 x") == []
