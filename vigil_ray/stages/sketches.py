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


def kmv_two_set(ds, col: str, type_col: str, type_a: str, type_b: str, k: int = 64):
    """KMV SET ALGEBRA in one pass: sketches for the keys of two event
    classes, their union (k smallest of the merged sketches — exactly the
    KMV of the set union), and the inclusion–exclusion intersection
    estimate ``|A∩B| ≈ estA + estB − estU``.

    → one-row table (est_a, est_b, est_union, est_intersection), each
    rounded to 6 dp; the md5 hashing keeps every number SQL-recomputable.
    One accumulator holds BOTH k-truncated sketches (2k doubles per block
    partial — the shuffle never sees the key column).
    """
    from ray.data.aggregate import AggregateFn

    def _partial(block) -> list:
        types = (
            block.column(type_col).to_pylist()
            if isinstance(block, pa.Table)
            else list(block[type_col])
        )
        vals = (
            block.column(col).to_pylist()
            if isinstance(block, pa.Table)
            else list(block[col])
        )
        ha = sorted({kmv_hash(v) for v, t in zip(vals, types) if t == type_a})[:k]
        hb = sorted({kmv_hash(v) for v, t in zip(vals, types) if t == type_b})[:k]
        return [ha, hb]

    def _merge(left: list, right: list) -> list:
        if not left:
            return right
        if not right:
            return left
        return [
            sorted(set(list(left[0])) | set(list(right[0])))[:k],
            sorted(set(list(left[1])) | set(list(right[1])))[:k],
        ]

    sketch = AggregateFn(
        init=lambda *a: [],
        merge=_merge,
        name="kmv2",
        accumulate_block=lambda acc, block: _merge(acc, _partial(block)),
    )
    res = ds.aggregate(sketch)
    ha, hb = (list(s) for s in res["kmv2"])
    hu = sorted(set(ha) | set(hb))[:k]
    est_a = kmv_estimate(np.asarray(ha), k)
    est_b = kmv_estimate(np.asarray(hb), k)
    est_u = kmv_estimate(np.asarray(hu), k)
    return pa.table(
        {
            "est_a": pa.array([round(est_a, 6)], pa.float64()),
            "est_b": pa.array([round(est_b, 6)], pa.float64()),
            "est_union": pa.array([round(est_u, 6)], pa.float64()),
            "est_intersection": pa.array(
                [round(est_a + est_b - est_u, 6)], pa.float64()
            ),
        }
    )


def kmv_grouped(ds, col: str, group_col: str, k: int = 64):
    """Per-GROUP approximate distinct count — ``COUNT(DISTINCT col) GROUP BY
    group_col`` as mergeable KMV sketches (the per-host / per-type
    cardinality profile a crawl audit runs).

    Shape: a map-side pass builds one k-truncated sketch per (block, group)
    — the shuffle moves ≤k doubles per group per block, never the key
    column — then a grouped ``AggregateFn`` merges sketches and a final
    vectorized pass turns each into the ``(k-1)/h_(k)`` estimate (exact
    below k distinct). md5 hashing keeps every number SQL-recomputable.

    → Dataset ``(group_col, n_distinct_est: double)``.
    """
    from ray.data.aggregate import AggregateFn

    def partial_batches(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col).to_pylist()
        vals = batch.column(col).to_pylist()
        acc: dict = {}
        for g, v in zip(groups, vals):
            acc.setdefault(g, set()).add(kmv_hash(v))
        gs = sorted(acc)
        return pa.table(
            {
                group_col: pa.array(gs, batch.column(group_col).type),
                "sketch": pa.array(
                    [sorted(acc[g])[:k] for g in gs], pa.list_(pa.float64())
                ),
            }
        )

    partials = ds.map_batches(partial_batches, batch_format="pyarrow")

    def _acc_block(acc: list, block) -> list:
        s = set(acc)
        lists = (
            block.column("sketch").to_pylist()
            if isinstance(block, pa.Table)
            else list(block["sketch"])
        )
        for lst in lists:
            s |= set(lst)
        return sorted(s)[:k]

    merge_sketches = AggregateFn(
        init=lambda g: [],
        merge=lambda a, b: sorted(set(a) | set(b))[:k],
        name="kmv",
        accumulate_block=_acc_block,
    )
    agg = partials.groupby(group_col).aggregate(merge_sketches)

    def finalize(batch: pa.Table) -> pa.Table:
        ests = [
            round(kmv_estimate(np.asarray(s, dtype=np.float64), k), 6)
            for s in batch.column("kmv").to_pylist()
        ]
        return pa.table(
            {
                group_col: batch.column(group_col),
                "n_distinct_est": pa.array(ests, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Count-Min sketch (point-frequency estimates)
# --------------------------------------------------------------------------

def cms_hash(row: int, value) -> int:
    """Bucket of ``value`` under hash row ``row`` — first 8 bytes of
    md5 of ``"{row}:{value}"``, reduced mod the sketch width. String-typed
    like :func:`kmv_hash` so a DuckDB oracle can recompute it
    (``CAST('0x' || substr(md5(...), 1, 16) AS UBIGINT) % width``)."""
    h = int.from_bytes(
        hashlib.md5(f"{row}:{value}".encode("utf-8")).digest()[:8], "big"
    )
    return h


def cms_point_counts(ds, col: str, probe_keys, depth: int = 4, width: int = 256):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) frequency estimates
    for a fixed probe-key set — the mergeable heavy-hitter / point-query
    counter a 10^12-row pipeline uses where an exact per-key groupby would
    shuffle the whole key column.

    Shape: each block folds its values into a ``depth×width`` int64 count
    matrix (per-block cost: one ``np.unique`` + ``depth`` md5 calls per
    DISTINCT value, then a vectorized scatter-add); the global
    ``AggregateFn`` merge is an elementwise matrix sum — the shuffle moves
    ``depth·width`` int64s per block (8 KiB at 4×256), never the key column.
    The estimate for key k is ``min_j M[j, h_j(k)]`` — an upper bound on the
    true count (collisions only add), within ``εN`` with the usual
    ``(ε, δ) = (e/width, e^-depth)`` guarantee.

    Exactly SQL-checkable (the KMV trick): the oracle rebuilds every
    bucket's collision sum from the exact per-key counts with the same md5
    bucket hash and takes the same min — see ``queries.py``
    ``events_cms_user_counts``.

    Returns a one-row-per-probe-key table ``(key: int64, est_count: int64)``
    ordered by key.
    """
    from ray.data.aggregate import AggregateFn

    size = depth * width

    def _fold(acc: np.ndarray, block) -> np.ndarray:
        vals = (
            block.column(col).to_numpy(zero_copy_only=False)
            if isinstance(block, pa.Table)
            else np.asarray(block[col])
        )
        uniq, counts = np.unique(vals, return_counts=True)
        mat = acc.reshape(depth, width)
        for v, c in zip(uniq.tolist(), counts.tolist()):
            for j in range(depth):
                mat[j, cms_hash(j, v) % width] += c
        return acc

    def _acc_block(acc: list, block) -> list:
        a = np.asarray(acc, dtype=np.int64)
        if a.size == 0:
            a = np.zeros(size, dtype=np.int64)
        return _fold(a, block).tolist()

    def _merge(left: list, right: list) -> list:
        if not left:
            return right
        if not right:
            return left
        return (
            np.asarray(left, dtype=np.int64) + np.asarray(right, dtype=np.int64)
        ).tolist()

    sketch = AggregateFn(
        init=lambda *a: [],
        merge=_merge,
        name="cms",
        accumulate_block=_acc_block,
    )
    res = ds.aggregate(sketch)
    mat = np.asarray(res["cms"], dtype=np.int64).reshape(depth, width)
    keys = sorted(int(k) for k in probe_keys)
    ests = [
        int(min(mat[j, cms_hash(j, k) % width] for j in range(depth)))
        for k in keys
    ]
    return pa.table(
        {
            col: pa.array(keys, pa.int64()),
            "est_count": pa.array(ests, pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# HyperLogLog (fixed 64-register) distinct count
# --------------------------------------------------------------------------

_HLL_M = 64          # registers (b = 6 index bits)
_HLL_REM_BITS = 58   # remaining hash bits scanned for the leading 1
_HLL_ALPHA = 0.709   # alpha_64 (Flajolet et al. 2007, table for m = 64)


def hll_parts(value) -> tuple:
    """(register index, rho) of one key: top 6 bits of the md5-derived
    64-bit hash pick the register; rho = 1-based position of the leftmost
    1 in the remaining 58 bits (59 when they are all zero). String-typed
    md5 like :func:`kmv_hash` so DuckDB can recompute it (``bin()`` gives
    the bit length for the leading-zero count)."""
    h = int.from_bytes(hashlib.md5(str(value).encode("utf-8")).digest()[:8], "big")
    idx = h >> _HLL_REM_BITS
    rem = h & ((1 << _HLL_REM_BITS) - 1)
    rho = (_HLL_REM_BITS + 1) - rem.bit_length() if rem else _HLL_REM_BITS + 1
    return idx, rho


def hll_distinct(ds, col: str):
    """→ one-row table ``(n_distinct_est: double)`` — HyperLogLog with 64
    registers, the constant-memory cardinality sketch whose registers merge
    by elementwise MAX (the property that makes it the warehouse-standard
    ``approx_count_distinct``).

    Shape: per-block partial = the 64-register max array (one md5 per
    DISTINCT value in the block); global ``AggregateFn`` merge = elementwise
    max — the shuffle moves 64 ints per block. The estimate (and its
    small-range linear-counting correction for E ≤ 2.5m with empty
    registers) is driver-side arithmetic over the 64 registers.

    Exactly SQL-checkable: the denominator ``Σ 2^(-M_j)`` is accumulated as
    the INTEGER ``Σ 2^(59-M_j)`` (Python int / DuckDB HUGEINT — exact and
    order-independent, where a float sum could round differently per
    addition order), and the final float expression is written identically
    on both sides (verified bit-equal on this host, including ``ln``).
    """
    from ray.data.aggregate import AggregateFn

    def _fold(acc: np.ndarray, block) -> np.ndarray:
        vals = (
            block.column(col).to_pylist()
            if isinstance(block, pa.Table)
            else list(block[col])
        )
        for v in set(vals):
            idx, rho = hll_parts(v)
            if rho > acc[idx]:
                acc[idx] = rho
        return acc

    def _acc_block(acc: list, block) -> list:
        a = np.asarray(acc, dtype=np.int64)
        if a.size == 0:
            a = np.zeros(_HLL_M, dtype=np.int64)
        return _fold(a, block).tolist()

    def _merge(left: list, right: list) -> list:
        if not left:
            return right
        if not right:
            return left
        return np.maximum(
            np.asarray(left, dtype=np.int64), np.asarray(right, dtype=np.int64)
        ).tolist()

    sketch = AggregateFn(
        init=lambda *a: [],
        merge=_merge,
        name="hll",
        accumulate_block=_acc_block,
    )
    regs = np.asarray(ds.aggregate(sketch)["hll"], dtype=np.int64)
    est = round(hll_estimate(regs), 6)
    return pa.table({"n_distinct_est": pa.array([est], pa.float64())})


def hll_estimate(regs: np.ndarray) -> float:
    """Estimate from the 64 registers — integer-exact denominator, then the
    one float expression mirrored verbatim by the SQL oracle."""
    m = _HLL_M
    # Σ 2^(-M_j) = S / 2^59 with S an exact (arbitrary-precision) integer
    s = sum(1 << (_HLL_REM_BITS + 1 - int(r)) for r in regs)
    e_raw = (
        _HLL_ALPHA * m * m * float(1 << (_HLL_REM_BITS + 1)) / float(s)
    )
    v = int(np.count_nonzero(regs == 0))
    if e_raw <= 2.5 * m and v > 0:
        import math

        return float(m) * math.log(float(m) / v)
    return e_raw
