"""Semi-structured (JSON sidecar) column extraction.

Web-crawl tables routinely carry a JSON string column next to the typed
columns (crawl metadata, page headers, extraction sidecars — here
``events.props``). The extraction operator turns ``$.path`` lookups into
typed columns WITHOUT a Python-level ``json.loads`` per row: each Arrow
batch is handed zero-copy to polars, whose ``str.json_path_match`` kernel
is a vectorized Rust JSON parser, and only the extracted column crosses
back into the Arrow batch. Malformed / missing JSON yields NULL (never an
exception), so one poisoned sidecar cannot kill a 100 TB run.

Scale shape: a stateless ``map_batches`` task stage — no shuffle, no
state, prunes to (key, json) columns at the read. The reference has no
semi-structured input (its loaders are XLSX/CSV/JSON-records,
`/root/reference/main.py:60-101`); this is a north-rule addition for
Common-Crawl-style tables.
"""

from __future__ import annotations

import pyarrow as pa


def json_path_extract(
    ds,
    col: str,
    path: str,
    out_col: str,
    dtype: pa.DataType = None,
):
    """Append ``out_col`` = JSONPath ``path`` extracted from string column
    ``col``. ``dtype=None`` keeps the raw string; an integer/float dtype
    casts vectorized (non-numeric → NULL, polars ``strict=False``)."""
    import polars as pl

    if dtype is not None and not (
        pa.types.is_integer(dtype) or pa.types.is_floating(dtype)
    ):
        raise ValueError(f"unsupported extraction dtype: {dtype}")

    def extract(batch: pa.Table) -> pa.Table:
        # hand ONLY the json column to polars (zero-copy); keep every other
        # column as its original Arrow array — no string round-trips
        expr = pl.col(col).str.json_path_match(path)
        if dtype is not None:
            target = pl.Int64 if pa.types.is_integer(dtype) else pl.Float64
            expr = expr.cast(target, strict=False)
        out = (
            pl.from_arrow(batch.select([col]))
            .select(expr.alias(out_col))
            .to_arrow()
        )
        arr = out.column(out_col)
        if dtype is not None:
            arr = arr.cast(dtype)
        else:
            arr = arr.cast(pa.string())  # polars emits large_string
        return batch.append_column(out_col, arr)

    return ds.map_batches(extract, batch_format="pyarrow")
