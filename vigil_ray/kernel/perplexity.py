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

import numpy as np
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
        # (3-char left context, word, has-trailing-space) → (tuple of that
        # segment's per-gram log-probs, next left context). Natural text
        # reuses words heavily (Zipf), so scoring amortizes to ~1 dict hit
        # per WORD instead of per char; concatenating segment tuples in
        # document order reproduces the exact per-char lp sequence, so the
        # left-to-right float64 sum — and therefore the rounded perplexity —
        # is bit-identical to the scalar path (differential-tested in
        # tests/test_lm.py). Carrying the successor context in the memo value
        # removes the per-word string concat+slice on hits (32 → 19 µs/doc
        # measured). Capped like _memo.
        self._seg_memo: Dict[tuple, tuple] = {}
        self._seg_memo_cap = 500_000

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
        """Per-character perplexity of ``text`` under the model; 0.0 for empty.

        Scalar dict-memo path: on this class's small models a per-char dict
        hit beats numpy vectorization (np.unique sorts cost ~550 ns/element
        on weak-memory virtualized hosts, measured), so the scalar form is
        the default; :meth:`score_many` offers the batch-vectorized variant
        (identical per-gram log-probs) for hosts where sorting is cheap.
        """
        if not text:
            return 0.0
        norm = " ".join(text.split()).lower()
        if not norm:
            return 0.0
        return self._score_segments(norm)

    def _score_segments(self, norm: str) -> float:
        """Word-segment-memoized scoring of pre-normalized text.

        Partitions the padded gram stream into (left-context, word,
        trailing-space) segments — the grams inside a segment depend only on
        the word's characters and the exact ``order-1`` characters before it,
        so a (ctx, word, trail) key is a sound memo key even when the context
        spans several short preceding words. Bit-identical to
        :meth:`_score_scalar` (same lp sequence, same summation order);
        ~1.6× faster on natural text where words repeat across documents.
        """
        o = self.order
        seq = ("~" * (o - 1)) + norm
        words = norm.split(" ")
        memo = self._memo
        seg_memo = self._seg_memo
        lps: list = []
        ext = lps.extend
        log = math.log
        prob = self._prob
        pos = o - 1
        ctx = "~" * (o - 1)
        last = len(words) - 1
        for wi, w in enumerate(words):
            trail = wi != last
            key = (ctx, w, trail)
            entry = seg_memo.get(key)
            if entry is None:
                vals = []
                for j in range(len(w) + (1 if trail else 0)):
                    i = pos + j
                    g = seq[i - o + 1 : i + 1]
                    lp = memo.get(g)
                    if lp is None:
                        lp = log(prob(g[:-1], g[-1]))
                        if len(memo) < self._memo_cap:
                            memo[g] = lp
                    vals.append(lp)
                entry = (
                    tuple(vals),
                    (ctx + ((w + " ") if trail else w))[-(o - 1):],
                )
                if len(seg_memo) < self._seg_memo_cap:
                    seg_memo[key] = entry
            ext(entry[0])
            ctx = entry[1]
            pos += len(w) + 1
        return round(math.exp(-sum(lps) / len(lps)), 4)

    def _score_scalar(self, norm: str) -> float:
        """Dict-memo scalar scoring of pre-normalized text.

        The hot path is C-speed end to end: one slice comprehension builds
        the gram list, ``map(memo.get, grams)`` resolves the (overwhelmingly
        common) memo hits without per-char Python bytecode, and ``sum`` folds
        left-to-right float64 exactly like the per-char accumulator it
        replaced (~560 → ~130 ns/char measured). Misses fall back to the
        interpolated-probability chain per novel gram, identical values.
        """
        o = self.order
        seq = ("~" * (o - 1)) + norm
        grams = [seq[i - o + 1 : i + 1] for i in range(o - 1, len(seq))]
        memo = self._memo
        lps = list(map(memo.get, grams))
        if None in lps:
            log = math.log
            cap = self._memo_cap
            prob = self._prob
            for j, lp in enumerate(lps):
                if lp is None:
                    g = grams[j]
                    lp = memo.get(g)
                    if lp is None:
                        lp = log(prob(g[:-1], g[-1]))
                        if len(memo) < cap:
                            memo[g] = lp
                    lps[j] = lp
        return round(math.exp(-sum(lps) / len(lps)), 4)

    # fixed id base: gram codes must be stable across batches (a growing base
    # would re-code old grams and collide the memo). K**order must fit int64.
    _K = 1 << 15

    def score_many(self, texts: List[str]) -> List[float]:
        """Batch scoring with cross-document gram sharing.

        Gram log-probs are computed once per *batch-unique* gram (one
        ``np.unique`` over integer gram codes per batch) and memoized across
        batches, so the Python interpolation chain runs per novel gram, not
        per character. Numerically identical to the scalar path (same
        per-gram log-probs, float64 summation).
        """
        if not hasattr(self, "_char_ids"):
            self._char_ids: Dict[str, int] = {}
            self._vec_memo: Dict[int, float] = {}

        order = self.order
        pad = "~" * (order - 1)
        K = self._K
        cid = self._char_ids

        seqs = []          # (result_index, ids ndarray)
        out = [0.0] * len(texts)
        overflow = []      # result_index of docs needing the scalar fallback
        norms = {}
        for r, t in enumerate(texts):
            norm = " ".join(t.split()).lower() if t else ""
            if not norm:
                continue
            norms[r] = norm
            seq = pad + norm
            ids = np.empty(len(seq), dtype=np.int64)
            ok = True
            for i, ch in enumerate(seq):
                code = cid.get(ch)
                if code is None:
                    if len(cid) >= K:
                        ok = False
                        break
                    code = len(cid)
                    cid[ch] = code
                ids[i] = code
            if ok:
                seqs.append((r, ids))
            else:
                overflow.append(r)
        for r in overflow:
            out[r] = self._score_scalar(norms[r])
        if not seqs:
            return out

        gram_codes = []
        for _, ids in seqs:
            n = len(ids) - order + 1
            code = ids[:n].copy()
            for j in range(1, order):
                code = code * K + ids[j : n + j]
            gram_codes.append(code)
        all_codes = np.concatenate(gram_codes)
        uniq, inverse = np.unique(all_codes, return_inverse=True)

        memo = self._vec_memo
        id_char = {v: k for k, v in cid.items()}
        logs = np.empty(len(uniq), dtype=np.float64)
        for u in range(len(uniq)):
            code = int(uniq[u])
            lp = memo.get(code)
            if lp is None:
                chars = []
                c = code
                for _ in range(order):
                    chars.append(id_char[c % K])
                    c //= K
                gram = "".join(reversed(chars))
                lp = math.log(self._prob(gram[:-1], gram[-1]))
                if len(memo) < self._memo_cap:
                    memo[code] = lp
            logs[u] = lp

        per_gram = logs[inverse]
        pos = 0
        for (r, ids), codes in zip(seqs, gram_codes):
            n = len(codes)
            chunk = per_gram[pos : pos + n]
            # sequential left-to-right accumulation, SAME float-add order as
            # _score_scalar — numpy's pairwise sum could differ in the last
            # ulp and flip a round(...,4) boundary between the two paths
            s = 0.0
            for v in chunk:
                s += float(v)
            out[r] = round(math.exp(-s / n), 4)
            pos += n
        return out


_cached: Dict[int, CharLM] = {}


def default_model() -> CharLM:
    """Process-level singleton (one build per worker, like the reference's
    module-level preprocessor cache, src/preprocessor.py:95-114)."""
    if _ORDER not in _cached:
        _cached[_ORDER] = CharLM()
    return _cached[_ORDER]
