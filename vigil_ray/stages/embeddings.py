"""Embedding-column operators: quantization (and the normalization helpers
the ANN/dedup stages already use live in ``stages.ann``).

int8 symmetric per-vector quantization is the standard storage/serving
compression for embedding corpora (4× smaller than float32, 8× smaller than
float64): ``scale = 127 / max|x|``, ``q_i = round_half_away(x_i · scale)``.
Embarrassingly parallel — one vectorized ``map_batches`` pass, no shuffle.
Rounding is half-AWAY-from-zero to match SQL ``round()`` semantics so the
DuckDB oracle recomputes identical codes (numpy's default would be
banker's rounding — a silent off-by-one on .5 boundaries).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def quantize_embeddings(
    ds, id_col: str = "vec_id", vec_col: str = "embedding", as_string: bool = True
):
    """Per-vector symmetric int8 quantization. Output: (id, qvec, scale) —
    ``qvec`` comma-joined by default (driver-hash-stable across Arrow/pandas
    list representations), ``scale`` rounded to 6 dp. Zero vectors are
    dropped (no scale exists)."""

    def quant(batch: pa.Table) -> pa.Table:
        ids, qvecs, scales = [], [], []
        for vid, vec in zip(
            batch.column(id_col).to_pylist(), batch.column(vec_col).to_pylist()
        ):
            x = np.asarray(vec, dtype=np.float64)
            m = float(np.max(np.abs(x))) if len(x) else 0.0
            if m == 0.0:
                continue
            s = 127.0 / m
            q = _round_half_away(x * s).astype(np.int64)
            ids.append(vid)
            qvecs.append(",".join(str(int(v)) for v in q) if as_string else q.tolist())
            scales.append(round(s, 6))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "qvec": pa.array(
                    qvecs, pa.string() if as_string else pa.list_(pa.int64())
                ),
                "scale": pa.array(scales, pa.float64()),
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow")
