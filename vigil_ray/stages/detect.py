"""PII detection + scrub as one fused Ray Data stage.

One ``map_batches`` pass appends the full detection result *and* the scrubbed
text: normalization runs once per row, the candidate prefilter
(``kernel.detector.could_have_pii``) short-circuits rows that provably cannot
contain PII (most of a web corpus), and the regex cascade runs only on the
rest. Arrow in / Arrow out — list-of-struct columns round-trip through the
object store zero-copy.

This is the Ray shape of reference ``src/detector.py``'s layered ``detect``
(regex → names → contextual → build result), with the reference's per-row
error isolation (a poison row degrades to the empty result, never fails the
block; reference src/detector.py:378-395).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import pyarrow as pa

from vigil_ray.config import PipelineConfig
from vigil_ray.kernel.detector import analyze_document

DETAIL_TYPE = pa.list_(
    pa.struct(
        [
            ("tipo", pa.string()),
            ("valor", pa.string()),
            ("score", pa.float64()),
            ("metodo", pa.string()),
        ]
    )
)


def _detail_rows(triples, use_ner: bool) -> List[Dict[str, Any]]:
    # 'metodo' mirrors reference main.py:246: 'ner' for names (when a model
    # ran), 'regex' otherwise.
    return [
        {
            "tipo": t,
            "valor": v,
            "score": float(s),
            "metodo": "ner" if (t == "nome" and use_ner) else "regex",
        }
        for (t, v, s) in triples
    ]


class PiiDetectScrub:
    """Callable-class kernel for ``map_batches``. Stateless in data terms, but
    a class so the compiled-regex bank and config bind once per worker."""

    def __init__(self, cfg: Optional[PipelineConfig] = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.cfg.text_column).to_pylist()
        n = len(texts)
        contem = [False] * n
        tipos: List[List[str]] = [[] for _ in range(n)]
        detalhes: List[List[Dict[str, Any]]] = [[] for _ in range(n)]
        sinais: List[List[Dict[str, Any]]] = [[] for _ in range(n)]
        conf = [0.0] * n
        scrubbed = [""] * n

        emit = self.cfg.emit_details
        for i, raw in enumerate(texts):
            try:
                res, scrub = analyze_document(raw, self.cfg.scrub_token)
                scrubbed[i] = scrub
                if res["contem_pii"]:
                    contem[i] = True
                    tipos[i] = res["tipos_detectados"]
                    conf[i] = res["confianca"]
                    if emit:
                        detalhes[i] = _detail_rows(res["detalhes"], self.cfg.use_ner)
                        sinais[i] = _detail_rows(res["sinais_contextuais"], False)
            except Exception:  # noqa: BLE001 — poison row → empty result
                scrubbed[i] = ""

        out = (
            batch.append_column("contem_pii", pa.array(contem, pa.bool_()))
            .append_column("tipos_detectados", pa.array(tipos, pa.list_(pa.string())))
        )
        if emit:
            out = out.append_column("detalhes", pa.array(detalhes, DETAIL_TYPE))
            out = out.append_column(
                "sinais_contextuais", pa.array(sinais, DETAIL_TYPE)
            )
        return out.append_column("confianca", pa.array(conf, pa.float64())).append_column(
            "text_scrubbed", pa.array(scrubbed, pa.string())
        )


def detect_stage(ds, cfg: Optional[PipelineConfig] = None):
    """Append detection + scrub columns to a Dataset with a ``text`` column."""
    cfg = cfg or PipelineConfig()
    return ds.map_batches(
        PiiDetectScrub(cfg),
        batch_format="pyarrow",
        batch_size=cfg.detect_batch_size,
    )
