"""Skew-aware hash join (hot-key replication).

A plain hash join partitions BOTH sides by key hash, so one hot key (a
celebrity user, a boilerplate domain, the empty-string language) lands every
one of its rows on a single reduce partition — at web scale that partition
becomes the job. The standard cure (the "salt hot keys" pattern the north
rule names) splits the join in two:

1. find the hot keys — here a deterministic 1-in-16 md5 row sample of the
   FACT side is counted (the sample shuffle is 1/16 of the key column; any
   hot-set choice is semantics-preserving, it only routes rows), top-k by
   sampled count, k driver-sized;
2. the dimension rows for hot keys (≤k rows) are broadcast once via
   ``ray.put`` and joined MAP-SIDE inside ``map_batches`` (no shuffle at all
   for the skewed traffic — strictly better than salting, which still
   shuffles every replica);
3. only the cold remainder pays the ordinary hash join, now with a bounded
   per-partition row count;
4. ``union`` of the two streams.

Inner-join semantics are exactly preserved (hot fact rows whose key is
missing from the dimension drop in the map-side lookup, like any inner
join). No reference analog; standard skew-join literature (e.g. Spark AQE
skew handling, Beame et al. PODS'14).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def skew_join(
    left,
    right,
    key: str,
    right_key: str,
    top_k: int = 16,
    sample_mod: int = 16,
    num_partitions: int = 8,
):
    """Inner-join ``left`` (large, possibly skewed fact) with ``right``
    (dimension) on ``key = right_key``; hot keys replicate map-side, cold
    keys hash-join. Returns left columns + right columns (minus
    ``right_key``)."""
    import ray
    import ray.data as rd

    from vigil_ray.stages.blocks import safe_join
    from vigil_ray.stages.corpus import sorted_group_sum

    # --- 1. hot-key detection on a deterministic row sample ---------------
    def sampled_keys(batch: pa.Table) -> pa.Table:
        ks = batch.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        # cheap deterministic row decimation: md5 of (key, row index within
        # batch) would not be stable across block layouts — sample on the
        # key value itself plus a row counter modulo; for hot-key DETECTION
        # sampling rows by position is fine (any subsample sees a hot key)
        pos = np.arange(len(ks))
        keep = pos % sample_mod == 0
        return pa.table(
            {
                key: pa.array(ks[keep], pa.int64()),
                "one": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
            }
        )

    counts = sorted_group_sum(
        left.select_columns([key]).map_batches(sampled_keys, batch_format="pyarrow"),
        [key],
        ["one"],
    )
    hot_rows = counts.sort("one", descending=True).limit(top_k).take_all()
    hot = {int(r[key]) for r in hot_rows}

    # --- 2. broadcast the hot slice of the dimension ----------------------
    right_cols = [c for c in right.schema().names if c != right_key]

    def is_hot_right(batch: pa.Table) -> pa.Table:
        ks = batch.column(right_key).combine_chunks().to_numpy(zero_copy_only=False)
        mask = np.isin(ks, np.fromiter(hot, dtype=np.int64, count=len(hot)))
        return batch.filter(pa.array(mask))

    hot_dim_rows = right.map_batches(is_hot_right, batch_format="pyarrow").take_all()
    hot_dim = {int(r[right_key]): tuple(r[c] for c in right_cols) for r in hot_dim_rows}
    hot_ref = ray.put(hot_dim)
    right_types = {
        n: t for n, t in zip(right.schema().names, right.schema().types)
    }

    # --- 3a. map-side join for the hot fact rows --------------------------
    def hot_mask(batch: pa.Table) -> np.ndarray:
        ks = batch.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        return np.isin(ks, np.fromiter(hot, dtype=np.int64, count=len(hot)))

    def join_hot(batch: pa.Table) -> pa.Table:
        mask = hot_mask(batch)
        sub = batch.filter(pa.array(mask))
        dim = ray.get(hot_ref)
        ks = sub.column(key).to_pylist()
        found = [k in dim for k in ks]
        # explicit bool type: an empty list would infer arrow's null type
        sub = sub.filter(pa.array(found, type=pa.bool_()))
        vals = [dim[k] for k, f in zip(ks, found) if f]
        for i, c in enumerate(right_cols):
            sub = sub.append_column(
                c, pa.array([v[i] for v in vals], right_types[c])
            )
        return sub

    hot_joined = left.map_batches(join_hot, batch_format="pyarrow")

    # --- 3b. ordinary hash join for the cold remainder --------------------
    def take_cold(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(~hot_mask(batch)))

    def cold_right(batch: pa.Table) -> pa.Table:
        ks = batch.column(right_key).combine_chunks().to_numpy(zero_copy_only=False)
        mask = ~np.isin(ks, np.fromiter(hot, dtype=np.int64, count=len(hot)))
        return batch.filter(pa.array(mask))

    cold_joined = safe_join(
        left.map_batches(take_cold, batch_format="pyarrow"),
        right.map_batches(cold_right, batch_format="pyarrow"),
        "inner",
        num_partitions=num_partitions,
        on=(key,),
        right_on=(right_key,),
    )

    # --- 4. union (explicit projection: the two branches must agree on
    # column order for the union to be well-formed) -------------------------
    out_cols = list(left.schema().names) + right_cols
    return hot_joined.select_columns(out_cols).union(
        cold_joined.select_columns(out_cols)
    )
