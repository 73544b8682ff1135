"""KenLM-style character n-gram perplexity scorer (deterministic stand-in).

CCNet/Gopher pipelines score documents with a 5-gram KenLM model; the binary
model and its training corpus are unavailable here, so this module implements
the same *shape* of scorer from scratch: an interpolated character n-gram
language model (orders 1..N, Jelinek-Mercer interpolation with add-k floor)
trained once from an embedded seed corpus. Training happens in ``__init__`` of
the hosting actor (``vigil_ray.stages.quality.PerplexityScorer``) — once per
actor, never per batch — exactly how a real KenLM load would be hosted.

Deterministic: fixed corpus, fixed weights, no RNG.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List

# Seed text: plain descriptive English + Portuguese prose (authored here, no
# external data) — enough to separate "natural language" from gibberish or
# heavy repetition by character statistics.
SEED_CORPUS = """
the quick brown fox jumps over the lazy dog while the river flows quietly
through the valley and the morning light falls on the old stone bridge .
people walk along the market street buying bread fruit and fresh vegetables
from the farmers who arrive early with their carts full of goods . the
library opens at nine and students read books about history science and the
arts until the evening bells ring across the quiet town square . weather in
the region changes slowly from warm summer days to cold winter nights and
the families gather around the fire telling stories of the past . the
government published a report about public health education and transport
that describes how the city plans to improve services for all citizens .
a solicitação de acesso à informação foi registrada no sistema eletrônico e
o cidadão recebeu a resposta dentro do prazo legal estabelecido pela lei .
os servidores públicos analisaram o pedido com atenção e encaminharam os
documentos solicitados ao requerente conforme as normas do governo federal .
a universidade oferece cursos de graduação e pesquisa científica para
estudantes de todas as regiões do país durante o ano letivo . informações
sobre saúde educação e transporte público estão disponíveis no portal da
transparência para consulta de qualquer pessoa interessada nos dados .
"""

_ORDER = 4
_LAMBDAS = (0.1, 0.2, 0.3, 0.4)  # weights for orders 1..4, sum to 1
_ADD_K = 0.01


class CharLM:
    """Interpolated character n-gram LM; `score` returns per-char perplexity."""

    def __init__(self, corpus: str = SEED_CORPUS, order: int = _ORDER):
        self.order = order
        text = " ".join(corpus.split()).lower()
        self._grams: List[Counter] = [Counter() for _ in range(order)]
        self._ctx: List[Counter] = [Counter() for _ in range(order)]
        padded = ("~" * (order - 1)) + text
        for i in range(order - 1, len(padded)):
            for n in range(1, order + 1):
                if i - n + 1 < 0:
                    continue
                gram = padded[i - n + 1 : i + 1]
                self._grams[n - 1][gram] += 1
                self._ctx[n - 1][gram[:-1]] += 1
        self._vocab = set(text)
        self._vsize = max(len(self._vocab), 1)
        self._unigram_total = sum(self._grams[0].values())
        # (context+char) → log-prob memo: natural text reuses 4-grams heavily,
        # so scoring amortizes to ~1 dict hit per char. Capped to bound memory.
        self._memo: Dict[str, float] = {}
        self._memo_cap = 1_000_000

    def _prob(self, context: str, ch: str) -> float:
        p = 0.0
        for n in range(1, self.order + 1):
            gram = (context[-(n - 1):] if n > 1 else "") + ch
            ctx = gram[:-1]
            if n == 1:
                num = self._grams[0][gram] + _ADD_K
                den = self._unigram_total + _ADD_K * self._vsize
            else:
                num = self._grams[n - 1][gram] + _ADD_K
                den = self._ctx[n - 1][ctx] + _ADD_K * self._vsize
            p += _LAMBDAS[n - 1] * (num / den)
        return p

    def score(self, text: str) -> float:
        """Per-character perplexity of ``text`` under the model; 0.0 for empty."""
        if not text:
            return 0.0
        norm = " ".join(text.split()).lower()
        if not norm:
            return 0.0
        pad = "~" * (self.order - 1)
        seq = pad + norm
        log_sum = 0.0
        count = 0
        memo = self._memo
        log = math.log
        for i in range(self.order - 1, len(seq)):
            gram = seq[i - self.order + 1 : i + 1]
            lp = memo.get(gram)
            if lp is None:
                lp = log(self._prob(gram[:-1], gram[-1]))
                if len(memo) < self._memo_cap:
                    memo[gram] = lp
            log_sum += lp
            count += 1
        return round(math.exp(-log_sum / count), 4)

    def score_many(self, texts: List[str]) -> List[float]:
        return [self.score(t) for t in texts]


_cached: Dict[int, CharLM] = {}


def default_model() -> CharLM:
    """Process-level singleton (one build per worker, like the reference's
    module-level preprocessor cache, src/preprocessor.py:95-114)."""
    if _ORDER not in _cached:
        _cached[_ORDER] = CharLM()
    return _cached[_ORDER]
