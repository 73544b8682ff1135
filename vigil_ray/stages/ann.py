"""Approximate nearest-neighbor search over an embedding column.

Two paths:

- **Brute-force top-k** (the exactness baseline, see
  ``vigil_ray.queries.q_ann_cosine_top10``): broadcast the normalized query
  matrix via ``ray.put``, per-batch numpy matmul, per-batch top-k, global
  top-k via sort+limit. Exact and embarrassingly parallel — the per-batch
  top-k means the global sort sees ≤ k rows per block, not the corpus.
- **IVF (inverted-file) top-k** (the scale path): deterministic seeded
  k-means over a sample builds ``n_cells`` centroids; vectors are assigned to
  their nearest centroid (one ``map_batches``); a query probes only the
  ``n_probe`` nearest cells. At 10⁹+ vectors the cell assignment becomes the
  partition key (``groupby(cell)`` co-locates a cell's vectors) and queries
  touch n_probe/n_cells of the corpus. Recall is tested, not assumed
  (tests/test_ann.py pins recall@10 ≥ 0.9 on the fixture data).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def kmeans_fit(sample: np.ndarray, n_cells: int, n_iter: int = 10, seed: int = 42):
    """Plain deterministic Lloyd iterations (seeded init, fixed iteration
    count) — the stand-in for a faiss-style trained quantizer."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)
    centroids = sample[np.sort(idx)].copy()
    for _ in range(n_iter):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroid = members.mean(axis=0)
                norm = np.linalg.norm(centroid)
                if norm > 0:
                    centroids[c] = centroid / norm
    return centroids


def brute_force_topk(
    ds,
    query_vec: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact cosine top-k; result columns (vec_id, cos)."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    qref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        mat = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        cos = _normalize(mat) @ qv
        ids = np.asarray(batch.column(id_col).to_pylist())
        top = np.argsort(-cos)[:k]
        return pa.table(
            {
                id_col: pa.array(ids[top], pa.int64()),
                "cos": pa.array(cos[top], pa.float64()),
            }
        )

    per_batch = ds.map_batches(score, batch_format="pyarrow", batch_size=4096)
    return per_batch.sort(["cos", id_col], descending=[True, False]).limit(k)


def ivf_topk(
    ds,
    query_vec: np.ndarray,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 4096,
):
    """IVF approximate top-k: train on a head sample, scan only the probed
    cells. Returns (vec_id, cos) like the brute-force path."""
    import ray

    sample_rows = ds.limit(train_sample).to_pandas()
    sample = _normalize(np.asarray(sample_rows[vec_col].tolist(), dtype=np.float64))
    centroids = kmeans_fit(sample, n_cells)

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    probed = set(np.argsort(-(centroids @ q))[:n_probe].tolist())
    ref = ray.put((q, centroids, probed))

    def score(batch: pa.Table) -> pa.Table:
        qv, cents, cells = ray.get(ref)
        mat = _normalize(np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64))
        assign = np.argmax(mat @ cents.T, axis=1)
        mask = np.isin(assign, list(cells))
        if not mask.any():
            return pa.table(
                {id_col: pa.array([], pa.int64()), "cos": pa.array([], pa.float64())}
            )
        sub = mat[mask]
        ids = np.asarray(batch.column(id_col).to_pylist())[mask]
        cos = sub @ qv
        top = np.argsort(-cos)[:k]
        return pa.table(
            {
                id_col: pa.array(ids[top], pa.int64()),
                "cos": pa.array(cos[top], pa.float64()),
            }
        )

    per_batch = ds.map_batches(score, batch_format="pyarrow", batch_size=4096)
    return per_batch.sort(["cos", id_col], descending=[True, False]).limit(k)


def data_fingerprint(*paths: str) -> str:
    """Cheap source-data fingerprint (size + mtime per file) for index-cache
    validation — if the parquet at the same path is regenerated, the stamp
    changes and a stale persisted index is rebuilt instead of silently
    served."""
    import os

    parts = []
    for p in sorted(paths):
        st = os.stat(p)
        parts.append(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def ivf_index_if_valid(index_dir: str, fingerprint: str) -> bool:
    """True iff a COMPLETED persisted IVF build exists at ``index_dir`` whose
    embedded source stamp matches ``fingerprint`` — the cheap existence probe
    that lets a query route through the persisted index without triggering a
    build (the load-once-score-many discipline: build cost is paid by the
    indexing job, lookups only ever reuse)."""
    import os

    done = os.path.join(index_dir, "_DONE")
    if not os.path.exists(done):
        return False
    with open(done) as f:
        return f.read() == fingerprint


def ivf_build(
    ds,
    index_dir: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 4096,
    seed: int = 42,
    fingerprint: str = "",
):
    """Build a PERSISTED IVF index: train centroids on a sample, assign every
    vector to its nearest cell, and write the corpus as parquet PARTITIONED
    BY CELL (``index_dir/cell=N/``), plus the centroid table beside it.

    This is the piece the in-flight :func:`ivf_topk` lacks at scale: with the
    assignment persisted, a query READS only the ``n_probe`` probed cells'
    files (IO pruning via partition directories) instead of re-scanning and
    masking every block — queries touch n_probe/n_cells of the corpus bytes,
    and the index is resumable/reusable across queries and runs. Idempotent:
    an existing ``_DONE`` marker short-circuits the build — but only if the
    stamp stored in it matches ``fingerprint`` (see :func:`data_fingerprint`),
    so regenerated source data forces a rebuild rather than serving a stale
    index.
    """
    import os

    import pyarrow.parquet as pq
    import ray

    done = os.path.join(index_dir, "_DONE")
    if os.path.exists(done):
        with open(done) as f:
            stamp = f.read()
        if stamp == fingerprint:
            return _load_centroids(index_dir)
        # source data changed under the same path → invalidate
    if os.path.isdir(index_dir):
        # a partial failed build (no _DONE) would leave stale cell files that
        # a rebuild appends to → duplicated rows; start clean instead
        import shutil

        shutil.rmtree(index_dir)

    sample_rows = ds.limit(train_sample).to_pandas()
    sample = _normalize(np.asarray(sample_rows[vec_col].tolist(), dtype=np.float64))
    centroids = kmeans_fit(sample, n_cells, seed=seed)
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        mat = _normalize(
            np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        )
        cell = np.argmax(mat @ cents.T, axis=1)
        return batch.append_column("cell", pa.array(cell, pa.int64()))

    os.makedirs(index_dir, exist_ok=True)
    # co-locate each cell's rows before the partitioned write: without the
    # sort, every (write task × cell) combination emits its own file —
    # measured at ~77 tiny files PER CELL on a 200k-vector / 447-cell build,
    # where per-file open overhead made the pruned query SLOWER than a
    # brute-force scan (2.7 s vs 1.1 s). Sorted, a cell spans at most two
    # blocks → 1-2 files, and the same query reads ~4k× fewer files. The
    # sort is one corpus-wide exchange paid once at build time — the same
    # all-to-all any cell-clustered layout costs.
    ds.map_batches(assign, batch_format="pyarrow").sort("cell").write_parquet(
        index_dir, partition_cols=["cell"]
    )
    pq.write_table(
        pa.table(
            {
                "cell": pa.array(range(len(centroids)), pa.int64()),
                "centroid": pa.array(
                    [list(c) for c in centroids], pa.list_(pa.float64())
                ),
            }
        ),
        os.path.join(index_dir, "_centroids.parquet"),
    )
    with open(done, "w") as f:
        f.write(fingerprint)
    return centroids


def _load_centroids(index_dir: str) -> np.ndarray:
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(index_dir, "_centroids.parquet"))
    order = np.argsort(np.asarray(t.column("cell").to_pylist()))
    mat = np.asarray(t.column("centroid").to_pylist(), dtype=np.float64)
    return mat[order]


def ivf_query(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Query a persisted IVF index: read ONLY the probed cells' partition
    directories (no full-corpus scan), score per batch, global top-k."""
    import os

    import ray.data as rd

    centroids = _load_centroids(index_dir)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    # kmeans can leave empty cells (their stale centroids may still rank
    # nearest): walk the full centroid ranking and keep the n_probe NEAREST
    # NON-EMPTY cells, so an empty probed cell never silently shrinks the
    # probe budget or crashes read_parquet([]).
    ranked = np.argsort(-(centroids @ q)).tolist()
    files: list = []
    probed = 0
    for c in ranked:
        if probed >= n_probe:
            break
        d = os.path.join(index_dir, f"cell={c}")
        if not os.path.isdir(d):
            continue
        cell_files = [
            os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
        ]
        if cell_files:
            files.extend(cell_files)
            probed += 1
    if not files:
        raise FileNotFoundError(
            f"IVF index at {index_dir} has no populated cell partitions — "
            "rebuild the index (ivf_build)"
        )
    ds = rd.read_parquet(files, columns=[id_col, vec_col])
    return brute_force_topk(ds, q, k=k, id_col=id_col, vec_col=vec_col)
