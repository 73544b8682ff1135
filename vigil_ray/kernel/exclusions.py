"""Institutional-name vocabulary and membership predicate.

This is *data*, not logic: the fixed vocabulary the reference ships for
filtering NER "person" hits that are actually public bodies, DF place names,
formal titles, legal terms or institutions (reference ``src/exclusions.py:17-189``).
Entries are stored lowercase and alphabetized; semantics of the predicate
follow reference ``src/exclusions.py:195-226`` exactly, including its
deliberate one-way substring rule: a candidate is institutional when it
*contains* a vocabulary term, but never because it is contained *in* one —
otherwise short real names ("Ana" ⊂ "Candangolândia", "Gama") would be
swallowed (pinned by reference ``tests/test_exclusions.py:46-84``).

At Ray scale this is a broadcast small side: the frozenset travels inside the
serialized kernel closure once per worker process, never per batch.
"""

from __future__ import annotations

INSTITUTIONAL_TERMS = frozenset(
    (
        # public bodies / government of the Federal District
        "banco de brasília", "brb", "caesb", "ceb", "cgdf", "cldf",
        "controladoria geral", "controladoria-geral", "corpo de bombeiros",
        "câmara legislativa", "cbmdf", "defensoria pública", "detran",
        "detran-df", "distrito federal", "gdf", "governo do distrito federal",
        "metrô-df", "ministério público", "mpdft", "novacap", "pcdf", "pmdf",
        "polícia civil", "polícia militar", "secretaria de educação",
        "secretaria de estado", "secretaria de fazenda", "secretaria de governo",
        "secretaria de saúde", "secretaria de segurança", "tcdf", "terracap",
        "tribunal de contas",
        # administrative regions of the DF
        "arniqueira", "asa norte", "asa sul", "brazlândia", "candangolândia",
        "ceilândia", "cruzeiro", "estrutural", "fercal", "gama", "itapoã",
        "jardim botânico", "lago norte", "lago sul", "núcleo bandeirante",
        "octogonal", "paranoá", "park way", "planaltina", "plano piloto",
        "pôr do sol", "recanto das emas", "riacho fundo", "samambaia",
        "santa maria", "scia", "sia", "sobradinho", "sol nascente", "sudoeste",
        "são sebastião", "taguatinga", "varjão", "vicente pires",
        "águas claras",
        # nearby geography and federal landmarks
        "cidade ocidental", "congresso nacional", "entorno do df",
        "esplanada dos ministérios", "formosa", "luziânia", "novo gama",
        "palácio da alvorada", "palácio do planalto", "planaltina de goiás",
        "praça dos três poderes", "stf", "stj", "superior tribunal de justiça",
        "supremo tribunal federal", "valparaíso",
        # formal titles and forms of address
        "excelentíssima", "excelentíssimo", "ilustres servidores",
        "ilustríssima", "ilustríssimo", "meritíssima", "meritíssimo",
        "prezadas senhoras", "prezados senhores", "senhor diretor",
        "senhor governador", "senhor presidente", "senhor secretário",
        "senhora diretora", "senhora governadora", "senhora presidente",
        "senhora secretária", "vossa excelência", "vossa senhoria",
        "vossas senhorias",
        # legal / technical terms
        "advocacia geral", "constituição da república", "constituição federal",
        "controle interno", "corregedoria", "código civil", "código de processo",
        "código penal", "gestão de riscos", "lai", "lei complementar",
        "lei de acesso", "lei de acesso à informação", "lei maria da penha",
        "lei orgânica", "ouvidoria geral", "procuradoria geral",
        "programa de integridade",
        # universities and schools
        "centro universitário", "escola de governo", "ifb", "iesb",
        "instituto federal", "unb", "ucb", "uniceub", "universidade católica",
        "universidade de brasília",
        # common systems / misc terms
        "concorrência pública", "diário oficial", "dodf", "e-sic", "fala.br",
        "nota fiscal", "portal da transparência", "pregão eletrônico", "sei",
        "sistema eletrônico", "tomada de preços",
    )
)


def is_institutional_name(name: str) -> bool:
    """True when ``name`` exactly equals or contains an institutional term."""
    if not name:
        return False
    lowered = name.lower().strip()
    if lowered in INSTITUTIONAL_TERMS:
        return True
    return any(term in lowered for term in INSTITUTIONAL_TERMS)
