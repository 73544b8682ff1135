"""Language-ID + perplexity + heuristic-rule quality stage (actor pool).

The scorer holds per-actor state — the character-LM (trained once in
``__init__``, the KenLM-hosting pattern) and the langid profiles — so it runs
as an actor-pool ``map_batches`` stage: ``concurrency=N`` callable class,
setup once per actor, batches through ``__call__``. Appends::

    lang_pred, lang_score, ppl, n_words, mean_word_len, symbol_to_word_ratio,
    alpha_word_frac, dup_line_frac, top2gram_frac, top3gram_frac,
    dup5gram_frac, has_stopword, keep, drop_reasons

``keep``/``drop_reasons`` evaluate the Gopher/C4 rule gate
(``kernel.quality.quality_rules``) against the config thresholds.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from vigil_ray.config import PipelineConfig
from vigil_ray.kernel.langid import classify
from vigil_ray.kernel.perplexity import CharLM
from vigil_ray.kernel.quality import quality_features, quality_rules

_FEATURE_COLS = (
    ("n_words", pa.int64()),
    ("mean_word_len", pa.float64()),
    ("symbol_to_word_ratio", pa.float64()),
    ("alpha_word_frac", pa.float64()),
    ("dup_line_frac", pa.float64()),
    ("top2gram_frac", pa.float64()),
    ("top3gram_frac", pa.float64()),
    ("dup5gram_frac", pa.float64()),
    ("has_stopword", pa.bool_()),
)


class QualityScorer:
    """Actor-pool kernel: model built once per actor, applied per batch."""

    def __init__(self, cfg: Optional[PipelineConfig] = None):
        self.cfg = cfg or PipelineConfig()
        self.lm = CharLM()  # deterministic in-process "model load"

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.cfg.text_column).to_pylist()
        n = len(texts)
        cols = {name: [None] * n for name, _ in _FEATURE_COLS}
        lang_pred = [""] * n
        lang_score = [0.0] * n
        keep = [False] * n
        reasons: list = [[] for _ in range(n)]

        qcfg = self.cfg.quality
        score = self.lm.score
        ppl = [score(t or "") for t in texts]
        for i, raw in enumerate(texts):
            text = raw or ""
            feats = quality_features(text)
            lp, ls = classify(text)
            lang_pred[i], lang_score[i] = lp, ls
            for name, _ in _FEATURE_COLS:
                cols[name][i] = feats[name]
            keep[i], reasons[i] = quality_rules(feats, ls, ppl[i], qcfg)

        out = batch
        out = out.append_column("lang_pred", pa.array(lang_pred, pa.string()))
        out = out.append_column("lang_score", pa.array(lang_score, pa.float64()))
        out = out.append_column("ppl", pa.array(ppl, pa.float64()))
        for name, typ in _FEATURE_COLS:
            out = out.append_column(name, pa.array(cols[name], typ))
        out = out.append_column("keep", pa.array(keep, pa.bool_()))
        out = out.append_column(
            "drop_reasons", pa.array(reasons, pa.list_(pa.string()))
        )
        return out


def quality_stage(ds, cfg: Optional[PipelineConfig] = None, concurrency=None):
    """Actor-pool quality scoring stage."""
    cfg = cfg or PipelineConfig()
    return ds.map_batches(
        QualityScorer,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.quality_batch_size,
        concurrency=concurrency if concurrency is not None else (1, 8),
        num_cpus=1,
    )
