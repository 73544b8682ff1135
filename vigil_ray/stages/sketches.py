"""Mergeable cardinality sketch: KMV (k-minimum-values) distinct count.

The training-data use case is approximate COUNT DISTINCT over a huge key
column (users, urls, hosts) without a full distinct shuffle: each block
contributes its k smallest *distinct* hash values (a few hundred bytes), the
partials merge associatively (k smallest of the union), and the estimate is
``(k-1) / h_(k)`` where ``h_(k)`` is the k-th smallest hash mapped into
(0, 1) (Bar-Yossef et al. 2002). With fewer than k distinct values the
sketch IS the value set, so the count is exact.

The hash is the first 8 bytes of md5 of the key's decimal string — chosen,
like the SimHash word hash, so a SQL oracle can recompute the identical
estimate (DuckDB md5 + hex cast), making the sketch exactly checkable
instead of "approximate, trust me".
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_U64 = float(1 << 64)


def kmv_hash(value) -> float:
    """Deterministic hash of a key into (0, 1]."""
    h = int.from_bytes(hashlib.md5(str(value).encode("utf-8")).digest()[:8], "big")
    return (h + 1) / _U64


def kmv_estimate(smallest: np.ndarray, k: int) -> float:
    """Estimate from the (sorted, distinct) k-smallest hash array."""
    if len(smallest) < k:
        return float(len(smallest))
    return (k - 1) / float(smallest[k - 1])


def kmv_distinct(ds, col: str, k: int = 64):
    """→ one-row table ``(n_distinct_est: double)``.

    Shape: per-batch partial (distinct hashes, k smallest) → global
    ``AggregateFn`` merge (k smallest of unions) — the shuffle moves at most
    k doubles per block, never the key column.
    """
    from ray.data.aggregate import AggregateFn

    def _partial(block) -> list:
        vals = (
            block.column(col).to_pylist()
            if isinstance(block, pa.Table)
            else list(block[col])
        )
        hs = sorted({kmv_hash(v) for v in vals})
        return hs[:k]

    def _merge(left: list, right: list) -> list:
        return sorted(set(left) | set(right))[:k]

    sketch = AggregateFn(
        init=lambda *a: [],
        merge=_merge,
        name="kmv",
        accumulate_block=lambda acc, block: _merge(acc, _partial(block)),
    )
    res = ds.aggregate(sketch)
    smallest = np.asarray(res["kmv"], dtype=np.float64)
    est = round(kmv_estimate(smallest, k), 6)
    return pa.table({"n_distinct_est": pa.array([est], pa.float64())})
