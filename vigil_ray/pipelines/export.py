"""Result sinks: parquet/CSV datasets + the JSON summary envelope.

Ray shape of the reference's writers (reference ``main.py:196-279``,
``src/human_review.py:459-535``): big outputs stream to partitioned
parquet/CSV via Dataset sinks; the JSON "envelope" (metadata + global stats)
becomes a small driver-side manifest computed from distributed aggregates —
never by materializing rows on the driver.
"""

from __future__ import annotations

import json
from datetime import datetime
from typing import Optional

from vigil_ray.stages.aggregates import pii_type_counts, summary_stats

ENGINE_VERSION = "vigil-ray-0.1.0"


def write_results(
    ds,
    out_dir: str,
    fmt: str = "parquet",
    input_path: str = "",
    summary_path: Optional[str] = None,
    timestamp: Optional[str] = None,
) -> dict:
    """Persist the detection dataset and return (optionally write) the JSON
    summary envelope — the reference's metadata/estatisticas JSON
    (main.py:214-275) built from distributed aggregates."""
    flat = ds
    for nested in ("detalhes", "sinais_contextuais"):
        if nested in ds.schema().names and fmt == "csv":
            flat = flat.drop_columns([nested])
    if fmt == "parquet":
        flat.write_parquet(out_dir)
    elif fmt == "csv":
        # list columns serialize comma-joined, mirroring main.py:185
        import pyarrow as pa
        import pyarrow.compute as pc

        def join_lists(batch: pa.Table) -> pa.Table:
            for col in ("tipos_detectados", "drop_reasons"):
                if col in batch.schema.names:
                    idx = batch.schema.get_field_index(col)
                    joined = pc.binary_join(batch.column(col), ", ")
                    batch = batch.set_column(idx, col, joined)
            return batch

        flat.map_batches(join_lists, batch_format="pyarrow").write_csv(out_dir)
    else:
        raise ValueError(f"unsupported format: {fmt}")

    stats = summary_stats(ds)
    per_type = {
        row["tipo"]: int(row["n"]) for row in pii_type_counts(ds).take_all()
    }
    envelope = {
        "metadata": {
            "versao": ENGINE_VERSION,
            "timestamp": timestamp or datetime(2026, 1, 1).isoformat(),
            "arquivo_entrada": input_path,
            "total_registros": stats["total"],
            "total_com_pii": stats["com_pii"],
        },
        "estatisticas": {
            "por_tipo": per_type,
            "percentual_com_pii": stats["pct_com_pii"],
        },
    }
    if summary_path:
        with open(summary_path, "w", encoding="utf-8") as f:
            json.dump(envelope, f, ensure_ascii=False, indent=2)
    return envelope


def write_review(review_ds, out_dir: str, fmt: str = "csv") -> None:
    """Review sink, priority-sorted upstream (stages/review.py)."""
    if fmt == "csv":
        review_ds.write_csv(out_dir)
    elif fmt == "json":
        review_ds.write_json(out_dir)
    elif fmt == "parquet":
        review_ds.write_parquet(out_dir)
    else:
        raise ValueError(f"unsupported format: {fmt}")
