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


def _seed_centroids(ds, k: int, id_col: str, vec_col: str):
    """Deterministic seed centroids: the quantized vectors of the ``k``
    smallest non-zero ids (no RNG). Returns ``(C, c_sq, cent_ids)`` —
    the k×dim int64 matrix, its per-row squared norms, and the seed ids."""
    head = ds.sort(id_col).limit(max(4 * k, 32)).take_all()
    cents, cent_ids = [], []
    for row in head:
        x = np.asarray(row[vec_col], dtype=np.float64)
        m = float(np.max(np.abs(x))) if len(x) else 0.0
        if m == 0.0:
            continue
        cents.append(_round_half_away(x * (127.0 / m)).astype(np.int64))
        cent_ids.append(int(row[id_col]))
        if len(cents) == k:
            break
    if len(cents) < k:
        raise ValueError(f"fewer than k={k} non-zero vectors in the head sample")
    C = np.stack(cents)  # k × dim
    return C, (C * C).sum(axis=1), np.asarray(cent_ids, np.int64)


def kmeans_assign_step(ds, k: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"):
    """One seeded Lloyd assignment step — the inner loop of distributed
    k-means, made EXACTLY checkable: vectors are int8-quantized first (the
    half-away rounding above, SQL-matched), so squared distances, argmin
    assignments and inertia are all integer arithmetic with no float
    reduction-order ambiguity between the engine and the oracle.

    Seed centroids = the quantized vectors of the ``k`` smallest non-zero
    ids (deterministic — no RNG). The k×dim int matrix is broadcast once
    with ``ray.put``; each batch computes distances by the
    ``‖x‖² − 2x·Cᵀ + ‖c‖²`` expansion (one numpy matmul), assigns argmin
    (ties → lowest centroid id), and emits ≤k partial (cell, n, inertia)
    rows; a k-sized groupby folds the partials. This is the scale shape of
    a full Lloyd iteration: the update step would divide the same partials'
    vector sums — nothing per-vector ever leaves the block.

    Returns (cell, n_members, inertia) for non-empty cells; cell is the
    seed centroid's id."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    # k smallest non-zero ids (margin for the zero-vector corner, asserted).
    # The centroid matrix ships as float64: int64 matmul has no BLAS kernel
    # (4× slower measured), and every distance term is an integer ≤ ~4·127²·dim
    # ≪ 2⁵³, so the float64 arithmetic is bit-exact.
    C, c_sq, cent_ids = _seed_centroids(ds, k, id_col, vec_col)
    cref = ray.put((C.astype(np.float64), c_sq.astype(np.float64), cent_ids))

    def partial(batch: pa.Table) -> pa.Table:
        Cm, csq, cids = ray.get(cref)
        qs = []
        for vec in batch.column(vec_col).to_pylist():
            x = np.asarray(vec, dtype=np.float64)
            m = float(np.max(np.abs(x))) if len(x) else 0.0
            if m == 0.0:
                continue
            qs.append(_round_half_away(x * (127.0 / m)))
        if not qs:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "n_members": pa.array([], pa.int64()),
                    "inertia": pa.array([], pa.int64()),
                }
            )
        X = np.stack(qs)  # float64 integer-valued; dists ≤ ~8e6 ≪ 2⁵³, exact
        d = (X * X).sum(axis=1)[:, None] - 2 * (X @ Cm.T) + csq[None, :]
        assign = np.argmin(d, axis=1)  # first occurrence = lowest cell index
        dmin = d[np.arange(len(qs)), assign]
        n = np.bincount(assign, minlength=len(cids))
        inertia = np.bincount(assign, weights=dmin, minlength=len(cids)).astype(
            np.int64
        )
        keep = n > 0
        return pa.table(
            {
                "cell": pa.array(cids[keep], pa.int64()),
                "n_members": pa.array(n[keep].astype(np.int64), pa.int64()),
                "inertia": pa.array(inertia[keep], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(
            Sum("n_members", alias_name="n_members"),
            Sum("inertia", alias_name="inertia"),
        )
    )


def semdedup(
    ds,
    k: int = 8,
    tau_num: int = 81,
    tau_den: int = 400,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-dup
    flagging over an embedding column — cluster, then compare only within
    clusters. Made EXACTLY oracle-checkable the same way as
    :func:`kmeans_assign_step`: vectors are int8-quantized (half-away
    rounding, SQL-matched), cluster assignment is the integer argmin against
    the k deterministic seed centroids (ties → lowest centroid id), and the
    cosine threshold τ is the rational τ² = tau_num/tau_den compared in
    integer arithmetic — ``dup(x) ⇔ ∃ y<x in x's cluster: x·y > 0 and
    tau_den·(x·y)² ≥ tau_num·(x·x)(y·y)`` (keep-earliest-id rule, the same
    keeper convention as the exact/minhash dedup family). |q| ≤ 127 and
    dim 64 bound every product below 2⁵³, so numpy int64, DuckDB BIGINT and
    the engine agree bit-for-bit.

    Ray shape: ONE broadcast of the k×dim centroid matrix (``ray.put``), a
    vectorized ``map_batches`` assign pass (no per-vector state leaves the
    block; the int8 codes travel as fixed-width 1-byte-per-dim binary, not
    Arrow lists), then ``groupby(cell).map_groups`` with one numpy matmul
    per cluster. Scale contract: per-cluster work/memory is O(|cell|²) —
    the SemDeDup paper's own design makes clusters small by choosing k
    proportional to n (k ≈ n/⟨target cluster size⟩); at corpus scale raise
    ``k`` exactly like the IVF index raises n_cells (≈√n), keeping each
    cluster a bounded fraction. The default k=8 matches the kmeans oracle's
    seed protocol at test scale.

    Returns (vec_id, cell, semdup) for every non-zero vector."""
    import ray

    C, c_sq, cent_ids = _seed_centroids(ds, k, id_col, vec_col)
    # every matmul below runs in float64 for the BLAS path (int64 matmul has
    # no BLAS kernel — 4× slower measured). Exactness holds because every
    # intermediate is an integer below 2⁵³: dots ≤ 127²·dim, and the τ²
    # comparison's products are guarded here. Callers with huge dims or
    # denominators must reduce the fraction.
    max_dot = 127 * 127 * C.shape[1]
    if max(tau_num, tau_den) * float(max_dot) ** 2 >= 2.0**53:
        raise ValueError(
            "tau fraction too coarse for exact float64 arithmetic at this "
            f"dim: reduce tau_num/tau_den (max_dot={max_dot})"
        )
    cref = ray.put((C.astype(np.float64), c_sq.astype(np.float64), cent_ids))

    def assign(batch: pa.Table) -> pa.Table:
        Cm, csq, cids = ray.get(cref)
        ids, qs = [], []
        for vid, vec in zip(
            batch.column(id_col).to_pylist(), batch.column(vec_col).to_pylist()
        ):
            x = np.asarray(vec, dtype=np.float64)
            m = float(np.max(np.abs(x))) if len(x) else 0.0
            if m == 0.0:
                continue  # no scale exists; the oracle's mx > 0 filter
            ids.append(int(vid))
            qs.append(_round_half_away(x * (127.0 / m)))
        if not qs:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "qvec": pa.array([], pa.binary()),
                }
            )
        X = np.stack(qs)  # float64 integer-valued — BLAS dgemm, exact ≤ 2⁵³
        d = (X * X).sum(axis=1)[:, None] - 2 * (X @ Cm.T) + csq[None, :]
        cell = cids[np.argmin(d, axis=1)]  # first occurrence = lowest cell id
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cell": pa.array(cell, pa.int64()),
                "qvec": pa.array(
                    [q.astype(np.int8).tobytes() for q in qs], pa.binary()
                ),
            }
        )

    def dedup_cell(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_col).to_pylist(), np.int64)
        order = np.argsort(ids)  # ids are unique — ascending-id scan order
        ids = ids[order]
        Q = np.stack(
            [
                np.frombuffer(b, dtype=np.int8).astype(np.float64)
                for b in group.column("qvec").to_pylist()
            ]
        )[order]
        # float64 BLAS; integer-exact under the 2⁵³ guard at entry. The
        # |cell|×|cell| similarity matrix is never materialized whole: rows
        # stream in blocks sized so each temp stays ≈64 MiB, so one skewed
        # mega-cell (weak head-id seeding can produce them) costs wall time
        # but bounded memory. dup(i) ⇔ ∃ j<i with the τ² test — identical to
        # the tril(any) form over the full matrix.
        n = len(ids)
        nrm = (Q * Q).sum(axis=1)
        dup = np.zeros(n, dtype=bool)
        col = np.arange(n)
        blk = max(128, (1 << 23) // max(n, 1))
        for lo in range(1, n, blk):  # row 0 has no earlier neighbor
            hi = min(lo + blk, n)
            D = Q[lo:hi] @ Q.T
            S = (D > 0) & (tau_den * D * D >= tau_num * np.outer(nrm[lo:hi], nrm))
            S &= col[None, :] < np.arange(lo, hi)[:, None]  # j < i only
            dup[lo:hi] = S.any(axis=1)
        cell = int(group.column("cell")[0].as_py())
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cell": pa.array([cell] * len(ids), pa.int64()),
                "semdup": pa.array(dup.tolist(), pa.bool_()),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(dedup_cell, batch_format="pyarrow")
    )
