"""Block-layout hygiene helpers.

A Ray ``sort()`` (and any materialize after skewed partitioning) can leave
EMPTY blocks, and ``map_batches`` passes an empty input block through
WITHOUT invoking the fn — the output then carries zero-column, schema-less
blocks. Most consumers (sort, union, aggregate, write) tolerate them, but
``Dataset.join``'s hash-shuffle aggregator does not: a partition whose
accumulated table lost its columns raises
``ArrowInvalid: No match ... for key field reference FieldRef.Name(...)``.

:func:`compact_blocks` is the valve: materialize and rebuild the dataset
from its non-empty blocks only (block-METADATA-sized driver work — the
blocks themselves are never fetched). Apply it to any sort-derived dataset
that feeds a join.
"""

from __future__ import annotations


def _blocks_with_meta(mat):
    """``(block_refs, metadata)`` of a materialized dataset.

    Prefers the private ``_plan._snapshot_bundle`` (zero work), falls back to
    the ``iter_internal_ref_bundles`` DeveloperAPI (metadata-only iteration),
    and returns ``(None, None)`` if a Ray upgrade renamed both — callers must
    then degrade gracefully instead of crashing every sorted primitive."""
    plan = getattr(mat, "_plan", None)
    bundle = getattr(plan, "_snapshot_bundle", None) if plan is not None else None
    if bundle is not None:
        return list(bundle.block_refs), list(bundle.metadata)
    try:
        refs, meta = [], []
        for rb in mat.iter_internal_ref_bundles():
            refs.extend(rb.block_refs)
            meta.extend(rb.metadata)
        return refs, meta
    except Exception:
        return None, None


def compact_blocks(ds):
    """Materialize ``ds`` and drop its empty blocks, so every remaining
    block carries the real schema (join-safe). Decision uses per-block
    metadata only; no block bytes move (already-materialized inputs pay
    nothing). If every block is empty the materialized dataset is returned
    unchanged (nothing to rescue — the caller sees the same empty result
    either way)."""
    import ray.data as rd
    from ray.data.dataset import MaterializedDataset

    mat = ds if isinstance(ds, MaterializedDataset) else ds.materialize()
    all_refs, meta = _blocks_with_meta(mat)
    if all_refs is None:  # a copied/derived MaterializedDataset can lack one
        mat = mat.materialize()
        all_refs, meta = _blocks_with_meta(mat)
    if all_refs is None:
        # Ray internals changed under us: degrade to the unmodified dataset.
        # Join-safety (the reason compact exists) is then down to Ray itself
        # having fixed the 0-row-first-block schema broadcast.
        return mat
    refs = [r for r, m in zip(all_refs, meta) if m.num_rows]
    if not refs or len(refs) == len(all_refs):
        return mat
    out = rd.from_arrow_refs(refs)
    # keep the source MaterializedDataset alive alongside the view: the
    # refs are owned by it, and from_arrow_refs does not take ownership
    out._compact_blocks_source = mat
    return out


def coalesce_blocks(ds, target_bytes: int = 64 << 20, min_blocks: int | None = None):
    """Materialize ``ds`` and repartition DOWN to ~``target_bytes`` blocks
    when the current layout is much finer. A Ray ``sort`` keys its sample +
    range-partition fan-out on the INPUT block count, so feeding it hundreds
    of KB-sized blocks (the shape every filter/union/aggregate chain leaves
    behind at test scale) costs seconds of pure scheduling — measured: a
    65k-row sort is 0.09 s at 8 blocks, 2.8 s at 256. At real scale blocks
    are already ≥ target size and this is metadata-only (no repartition).
    Decision uses block metadata; only a materialized concat-split moves.

    ``min_blocks`` floors the result so downstream per-block passes stay
    parallel — default = the session's CPU count (coalescing a stage whose
    per-block work is heavy to fewer blocks than workers trades scheduling
    seconds for an idle cluster; measured: simhash pair-gen 4.6 s at ~200
    blocks → 82 s at 4)."""
    from ray.data.dataset import MaterializedDataset

    if min_blocks is None:
        import ray

        min_blocks = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
    mat = ds if isinstance(ds, MaterializedDataset) else ds.materialize()
    refs, meta = _blocks_with_meta(mat)
    if refs is None:
        mat = mat.materialize()
        refs, meta = _blocks_with_meta(mat)
    if refs is None:
        return mat  # Ray internals changed: skip the coalesce (perf-only loss)
    n_blocks = len(refs)
    total = sum((m.size_bytes or 0) for m in meta)
    want = int(min(n_blocks, max(min_blocks, -(-total // target_bytes))))
    if want <= n_blocks // 2:
        return mat.repartition(want)
    return mat


def safe_join(left, right, join_type, *, num_partitions, on, right_on=None):
    """``Dataset.join`` with BOTH inputs compacted first.

    Ray's hash-shuffle join broadcasts each side's schema to the aggregator
    partitions only with the FIRST shuffle task it submits — and a 0-row
    first block returns early without sending anything, so every partition
    that then receives no rows of that side finalizes a zero-column table
    and ``pa.Table.join`` raises (``No match ... FieldRef``). Compacting
    removes every 0-row block, so the first streamed block always carries
    rows and the broadcast always lands.

    Costs a materialization of each side — use for model/candidate/label
    -sized inputs and for CHAINED joins (a join's own empty partitions emit
    0-row blocks); leave read-derived corpus streams on plain ``join`` and
    keep their lineage free of whole-block-emptying maps."""
    import pyarrow as pa
    import ray.data as rd

    left, right = compact_blocks(left), compact_blocks(right)
    if join_type == "inner" and (left.count() == 0 or right.count() == 0):
        # an all-empty side cannot be compacted into a row-carrying first
        # block, so the schema broadcast is unfixable — but an inner join
        # with an empty side is just an empty table with the joined schema
        # (left columns + right columns minus the right key columns)
        rkeys = set(right_on if right_on is not None else on)
        fields = []
        ls, rs = left.schema(), right.schema()
        for n, t in zip(ls.names, ls.types):
            fields.append((n, t))
        for n, t in zip(rs.names, rs.types):
            if n not in rkeys:
                fields.append((n, t))
        return rd.from_arrow(
            pa.table({n: pa.array([], t) for n, t in fields})
        )
    kwargs = {"join_type": join_type, "num_partitions": num_partitions, "on": on}
    if right_on is not None:
        kwargs["right_on"] = right_on
    return left.join(right, **kwargs)
