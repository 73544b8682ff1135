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

    # consumed three times (hot-key sample, hot map-join, cold remainder) —
    # pin once so the upstream lineage doesn't re-execute per consumer (the
    # _attach_pair_texts / connected_components precedent)
    left = left.materialize()

    # --- 1. hot-key detection on a deterministic row sample ---------------
    def sampled_keys(batch: pa.Table) -> pa.Table:
        col = batch.column(key).combine_chunks()
        # cheap deterministic row decimation: md5 of (key, row index within
        # batch) would not be stable across block layouts — sample on the
        # key value itself plus a row counter modulo; for hot-key DETECTION
        # sampling rows by position is fine (any subsample sees a hot key).
        # The key keeps its NATIVE type (int, string, ...) end to end.
        keep = np.flatnonzero(np.arange(len(col)) % sample_mod == 0)
        kept = col.take(pa.array(keep, pa.int64()))
        return pa.table(
            {
                key: kept,
                "one": pa.array(np.ones(len(kept), dtype=np.int64)),
            }
        )

    counts = sorted_group_sum(
        left.select_columns([key]).map_batches(sampled_keys, batch_format="pyarrow"),
        [key],
        ["one"],
    )
    hot_rows = counts.sort("one", descending=True).limit(top_k).take_all()
    hot_list = [r[key] for r in hot_rows]  # native-typed hot keys

    def _hot_set(col: pa.Array) -> pa.Array:
        import pyarrow.compute as pc

        return pc.is_in(col, value_set=pa.array(hot_list, type=col.type))

    # --- 2. broadcast the hot slice of the dimension ----------------------
    right_cols = [c for c in right.schema().names if c != right_key]

    def is_hot_right(batch: pa.Table) -> pa.Table:
        return batch.filter(_hot_set(batch.column(right_key).combine_chunks()))

    # collect the hot dim slice as ARROW (take_all() row-dicts would lose the
    # column types, and Dataset.schema().types yields numpy/python classes —
    # not pa.DataType — for pandas-backed inputs, which broke join_hot's
    # typed append under a from_pandas dimension)
    _hot_tbls = [
        t
        for t in ray.get(
            right.map_batches(is_hot_right, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows  # 0-row blocks can carry a degenerate empty schema
    ]
    hot_dim_tbl = pa.concat_tables(_hot_tbls) if _hot_tbls else None

    # --- 3a. map-side join for the hot fact rows --------------------------
    def hot_mask(batch: pa.Table) -> pa.Array:
        return _hot_set(batch.column(key).combine_chunks())

    hot_joined = None
    if hot_dim_tbl is not None:
        _hot_keys = hot_dim_tbl.column(right_key).to_pylist()
        _hot_cols = [hot_dim_tbl.column(c).to_pylist() for c in right_cols]
        hot_dim = {
            k: tuple(col[i] for col in _hot_cols) for i, k in enumerate(_hot_keys)
        }
        hot_ref = ray.put(hot_dim)
        right_types = {c: hot_dim_tbl.schema.field(c).type for c in right_cols}

        def join_hot(batch: pa.Table) -> pa.Table:
            sub = batch.filter(hot_mask(batch))
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
    # else: no hot key exists in the dimension — every hot fact row is
    # dropped by inner-join semantics, so the cold branch alone is the join

    # --- 3b. ordinary hash join for the cold remainder --------------------
    def take_cold(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.invert(hot_mask(batch)))

    def cold_right(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.invert(_hot_set(batch.column(right_key).combine_chunks()))
        )

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
    if hot_joined is None:
        return cold_joined.select_columns(out_cols)
    return hot_joined.select_columns(out_cols).union(
        cold_joined.select_columns(out_cols)
    )


def broadcast_join(
    left,
    right,
    key: str,
    right_key: str | None = None,
    how: str = "inner",
    max_broadcast_rows: int = 2_000_000,
):
    """Key-key join where ``right`` is KNOWN SMALL: the whole right side is
    materialized once, sorted by key, published to the object store with one
    ``ray.put``, and probed map-side inside ``map_batches`` with a vectorized
    ``np.searchsorted`` — zero shuffle, zero join-aggregator machinery.

    This is the "broadcast small sides" pattern: a Ray ``Dataset.join`` pays
    a fixed ~seconds of hash-shuffle aggregator setup per join regardless of
    data size (measured on this host — BASELINE.md), which dominates when
    both inputs are dimension-sized. The broadcast form is O(|right|) driver
    memory, so it is gated: if ``right`` exceeds ``max_broadcast_rows`` the
    call falls back to the ordinary partitioned hash join (``safe_join``) —
    at 10^12-row scale the gate, not the pattern, is what makes this safe.

    ``right`` keys must be unique (it is the dimension side of a key-key
    join); duplicate keys raise. ``how`` is ``"inner"`` or ``"left_outer"``
    (unmatched left rows keep nulls in the attached columns).
    """
    import pyarrow.compute as pc
    import ray

    from vigil_ray.stages.blocks import safe_join

    if how not in ("inner", "left_outer"):
        # the small-side probe implements exactly these two; letting any
        # other value through would silently run as left_outer here but as
        # `how` verbatim on the safe_join fallback — semantics must not
        # depend on which side of the size gate the input lands
        raise ValueError(
            f"broadcast_join: how must be 'inner' or 'left_outer', got {how!r}"
        )
    right_key = right_key or key
    mat = right.materialize()
    n_right = mat.count()
    if n_right > max_broadcast_rows:
        return safe_join(
            left, right, how, num_partitions=8, on=(key,), right_on=(right_key,)
        )

    refs = mat.to_arrow_refs()
    # keep 0-row blocks: an all-empty right side has Dataset schema None
    # (the known Ray 2.49 empty-materialize gap) but its Arrow blocks still
    # carry the schema the typed null columns need
    tables = [t for t in ray.get(refs) if t.num_columns]
    if not tables:
        raise ValueError(
            "broadcast_join: right side has no schema-bearing blocks; "
            "compact or supply a non-degenerate dimension table"
        )
    tbl = pa.concat_tables(tables).combine_chunks()
    if tbl.num_rows:
        order = pc.sort_indices(tbl, sort_keys=[(right_key, "ascending")])
        tbl = tbl.take(order)
    keys_np = tbl.column(right_key).to_numpy(zero_copy_only=False)
    if len(keys_np) > 1 and not (keys_np[1:] != keys_np[:-1]).all():
        raise ValueError(
            "broadcast_join: right side has duplicate keys in "
            f"{right_key!r}; it must be a unique-key dimension table"
        )
    value_tbl = tbl.drop_columns([right_key])
    ref = ray.put((keys_np, value_tbl))

    # probe must read the broadcast pair through `ref` ONLY — naming the
    # driver-side keys_np/value_tbl in the closure would serialize the whole
    # dimension table with the function per task, defeating the ray.put
    del keys_np, value_tbl, tbl, tables

    def probe(batch: pa.Table) -> pa.Table:
        rkeys, rvals = ray.get(ref)  # local zero-copy fetch after first call
        lk_col = batch.column(key).combine_chunks()
        null_np = pc.is_null(lk_col).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        if len(rkeys) and not pa.types.is_null(lk_col.type):
            if null_np.any():
                # searchsorted can't compare None against the key dtype
                # (TypeError on strings); probe nulls with a valid sentinel
                # and force them unmatched below — SQL null-key semantics
                # (inner drops the row, left_outer keeps it with null values)
                fv = rkeys[0]
                lk_col = pc.fill_null(
                    lk_col, fv.item() if hasattr(fv, "item") else fv
                )
            lk = lk_col.to_numpy(zero_copy_only=False)
            pos = np.searchsorted(rkeys, lk)
            pos_c = np.minimum(pos, len(rkeys) - 1)
            matched = (rkeys[pos_c] == lk) & ~null_np
        else:
            pos_c = np.zeros(n, dtype=np.int64)
            matched = np.zeros(n, dtype=bool)
        if how == "inner":
            out = batch.filter(pa.array(matched))
            idx = pa.array(pos_c[matched], pa.int64())
            for name in rvals.column_names:
                out = out.append_column(name, rvals.column(name).take(idx))
            return out
        # left_outer: attach values, null where unmatched
        out = batch
        idx = pa.array(pos_c, pa.int64())
        m = pa.array(matched)
        for name in rvals.column_names:
            col = rvals.column(name)
            taken = col.take(idx) if len(rkeys) else pa.nulls(n, col.type)
            out = out.append_column(
                name, pc.if_else(m, taken, pa.scalar(None, col.type))
            )
        return out

    return left.map_batches(probe, batch_format="pyarrow")
