"""CSV / JSON document sources with the reference's tolerant semantics.

Reference parity (SURVEY.md §2.1): S2 — CSV with utf-8 → latin-1 encoding
fallback (reference main.py:93-98); S3 — JSON accepted as a top-level array
or as an object keyed by one of ``registros``/``data``/``resultados``
(reference main.py:99-131, src/constants.py:24). The reference's 100k-record
JSON cap is dropped: the streaming executor bounds memory instead.

These sources exist for small operational inputs (fixtures, label files,
review exports); the 100 TB path is parquet via ``readers.read_table``.
"""

from __future__ import annotations

import json
from typing import List

JSON_ARRAY_KEYS = ("registros", "data", "resultados")


def read_csv_tolerant(path: str):
    """CSV → Dataset, retrying as latin-1 when utf-8 decoding fails.

    Arrow's CSV reader does not raise on invalid utf-8 — it silently types
    the offending column as ``binary`` — so the fallback triggers on either
    an exception OR a binary-typed column in the result schema.
    """
    import pyarrow as pa
    import ray.data as rd
    from pyarrow import csv as pacsv

    def _latin1():
        return rd.read_csv(
            path, read_options=pacsv.ReadOptions(encoding="latin-1")
        )

    try:
        # eager: these are side-input files (eval truth, error reports) —
        # a LAZY dataset would defer mid-file decode errors past this try
        # and the fallback would never run (schema() samples one block)
        ds = rd.read_csv(path).materialize()
        schema = ds.schema()
        if any(
            pa.types.is_binary(t) or pa.types.is_large_binary(t)
            for t in schema.types
        ):
            return _latin1()
        return ds
    except Exception:  # noqa: BLE001 — undecodable as utf-8
        return _latin1()


def read_json_records(path: str):
    """JSON file (array, or object with a known array key) → Dataset."""
    import ray.data as rd

    with open(path, encoding="utf-8") as f:
        payload = json.load(f)
    records = _extract_records(payload)
    return rd.from_items(records)


def _extract_records(payload) -> List[dict]:
    if isinstance(payload, list):
        return payload
    if isinstance(payload, dict):
        for key in JSON_ARRAY_KEYS:
            value = payload.get(key)
            if isinstance(value, list):
                return value
    raise ValueError(
        "unsupported JSON shape: expected a top-level array or an object "
        f"with one of the keys {JSON_ARRAY_KEYS}"
    )


def read_xlsx(path: str, sheet: int = 0):
    """XLSX → Dataset (reference S1, main.py:91-92: pandas.read_excel).

    Import-gated: the xlsx engine (openpyxl) is not installed in this
    container, so absence raises a clear ImportError naming the dependency —
    the same declared-degrade policy as the NER model and media codecs. With
    openpyxl present this is pandas.read_excel → ``from_pandas`` (xlsx files
    are small operational inputs — label sheets, review exports — never the
    100 TB path).
    """
    try:
        import openpyxl  # noqa: F401 — the pandas xlsx engine
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "XLSX input needs openpyxl (pandas excel engine); install it at "
            "deployment or convert the sheet to CSV/parquet"
        ) from exc
    import pandas as pd
    import ray.data as rd

    return rd.from_pandas(pd.read_excel(path, sheet_name=sheet))
