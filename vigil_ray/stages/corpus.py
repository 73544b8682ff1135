"""Training-corpus preparation operators (round-3 additions).

The operators a 100-TB web-text training pipeline needs BETWEEN cleaning and
training, each in its canonical distributed shape:

- :func:`segment_dedup` — C4-style cross-document segment-level dedup: the
  corpus keeps exactly the FIRST occurrence (min doc, then min position) of
  every W-word segment; documents are reassembled from their surviving
  segments. One shuffle on segment text + one small reassembly shuffle on
  doc — no joins, no driver materialization.
- :func:`prefix_scan` / :func:`pack_shards` / :func:`deterministic_shuffle`
  — a distributed ordered PREFIX SUM (two passes over pinned blocks with a
  block-offset barrier — inherent to any prefix computation), powering
  token/byte-budget shard packing (`sum(cost) OVER (ORDER BY id)`) and a
  seeded, reproducible global shuffle rank (`row_number() OVER (ORDER BY
  md5(id||seed))`).
- :func:`hash_split` — deterministic train/val/test assignment from a keyed
  md5 bucket; embarrassingly parallel, stable across runs and cluster sizes.
- :func:`bloom_anti_join` — "drop every row whose key is in the blocklist"
  at a scale where the blocklist itself is too big to broadcast exactly: a
  compact Bloom bitmap (built distributed, OR-reduced) is broadcast once;
  bloom-NEGATIVE rows pass immediately (no false negatives by construction),
  and only the bloom-positive sliver pays the exact ``left_anti`` hash join.
- :func:`group_quantile_filter` — "keep the top (1-q) quality slice PER
  group" via per-group value histograms (partial per batch, merged small),
  thresholds broadcast, one filter pass. Exact ``quantile_disc`` semantics.
- :func:`per_key_cap` — "at most K documents per source/domain": the
  collect-truncate aggregate (shuffle carries ≤K ids per key per block).

No reference analog (the reference is a single-machine PII detector); these
extend SURVEY.md §2 with the LLM-data-pipeline operator class the north rule
grades. Every operator here is exactly SQL-checkable and wired into
``vigil_ray.queries`` with a DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from vigil_ray.stages.blocks import compact_blocks


# --------------------------------------------------------------------------
# C4-style segment dedup
# --------------------------------------------------------------------------

def chunk_documents(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 50,
    stride: int = 40,
):
    """Context-window chunking: split each document into word windows of
    ``chunk_words`` every ``stride`` words (overlap = chunk_words − stride)
    — the 1→n explode that prepares long documents for a fixed-context
    model. Chunk starts are ``0, stride, 2·stride, …`` while start <
    n_words; the final window may be short. Pure per-row map (no shuffle,
    no state): output ``(id, chunk_id, n_words, chunk_text)`` streams at
    input parallelism, ~chunk_words/stride× the input rows.

    Whitespace-only documents produce no chunks (mirrors the SQL side's
    ``trim(text) <> ''`` guard)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, chunk_ids, n_words_out, texts_out = [], [], [], []
        for vid, text in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            words = (text or "").split()
            n = len(words)
            for ci, s in enumerate(range(0, n, stride)):
                piece = words[s : s + chunk_words]
                ids_out.append(vid)
                chunk_ids.append(ci)
                n_words_out.append(len(piece))
                texts_out.append(" ".join(piece))
        return pa.table(
            {
                id_col: pa.array(ids_out, batch.column(id_col).type),
                "chunk_id": pa.array(chunk_ids, pa.int64()),
                "n_words": pa.array(n_words_out, pa.int64()),
                "chunk_text": pa.array(texts_out, pa.string()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def canonicalize_urls(ds, url_col: str = "url", out_col: str = "canonical_url"):
    """Vectorized crawl-URL canonicalization (the CommonCrawl-style dedup
    key): strip ``#fragment``, strip every ``utm_*`` tracking param, force
    the https scheme, lowercase the host, drop a leading ``www.``, strip one
    trailing path slash. Pure ``pyarrow.compute`` RE2 kernels — zero Python
    per row, embarrassingly parallel (no shuffle).

    Tracking removal is PER SEGMENT, position-independent: a real param
    after a tracking param (``?utm_source=x&page=2``) survives as
    ``?page=2`` — three RE2 passes drop ``&utm_…`` segments anywhere, then
    repair a leading ``?utm_…&`` / lone ``?utm_…``. Non-tracking query
    params are PRESERVED — a ``?page=2`` URL is a distinct resource, not a
    duplicate.
    """

    def _norm(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = pc.cast(batch.column(url_col), pa.string())
        u = pc.replace_substring_regex(u, r"#.*$", "")
        u = pc.replace_substring_regex(u, r"&utm_[^&]*", "")
        u = pc.replace_substring_regex(u, r"\?utm_[^&]*&", "?")
        u = pc.replace_substring_regex(u, r"\?utm_[^&]*$", "")
        m = pc.extract_regex(
            u, r"^(?i:https?)://(?P<host>[^/]*)(?P<rest>.*)$"
        )
        host = pc.utf8_lower(pc.struct_field(m, "host"))
        host = pc.replace_substring_regex(host, r"^www\.", "")
        rest = pc.replace_substring_regex(pc.struct_field(m, "rest"), r"/$", "")
        canon = pc.binary_join_element_wise("https://", host, rest, "")
        # non-http(s) rows (schemeless, ftp, garbage) don't match the
        # extractor — keep their stripped raw string as the key instead of
        # collapsing them all into one null group downstream
        canon = pc.if_else(pc.is_valid(canon), canon, u)
        return batch.append_column(out_col, canon)

    return ds.map_batches(_norm, batch_format="pyarrow")


def url_dedup(ds, url_col: str = "url", id_col: str = "row_id"):
    """Exact dedup on the canonical URL: one row per canonical URL with the
    keeper (min ``id_col``) and the variant count. canonicalize (map-side,
    no shuffle) → :func:`sorted_group_agg` — the sort carries
    ``(canonical_url, id, 1)`` rows only; page bodies never move."""
    canon = canonicalize_urls(ds, url_col=url_col).select_columns(
        ["canonical_url", id_col]
    )

    def _one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "one", pa.array(np.ones(batch.num_rows, np.int64))
        )

    rows = canon.map_batches(_one, batch_format="pyarrow")
    return sorted_group_agg(
        rows,
        ["canonical_url"],
        [(id_col, "min", "keeper_row_id"), ("one", "sum", "n_variants")],
    )


def segment_dedup(ds, id_col: str = "doc_id", text_col: str = "text", seg_words: int = 10):
    """Cross-corpus segment-level dedup (the C4 recipe, segment = ``seg_words``
    whitespace words): every distinct segment string survives exactly once —
    in the document with the smallest id, at its smallest position there —
    and each document is rebuilt from its surviving segments in order.

    Distributed shape: explode (doc, idx, segment) → groupby(segment) keeps
    ONE winner row via a min-(doc, idx) accumulator (the shuffle's reduce
    side emits one row per distinct segment, nothing joins back) → reassemble
    with a collect-list aggregate keyed by doc. Documents whose every segment
    lost are dropped (they contributed nothing new to the corpus).
    """
    from ray.data.aggregate import AggregateFn

    def explode(batch: pa.Table) -> pa.Table:
        docs, idxs, segs = [], [], []
        for d, t in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            words = (t or "").split()
            for i in range(0, len(words), seg_words):
                docs.append(d)
                idxs.append(i // seg_words + 1)  # 1-based, matches SQL range()
                segs.append(" ".join(words[i : i + seg_words]))
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "seg_idx": pa.array(idxs, pa.int64()),
                "seg": pa.array(segs, pa.string()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    # winner per distinct segment = groupby-argmin on (doc_id, seg_idx):
    # the sorted-adjacency primitive (one native sort, no per-group
    # aggregate machinery — see sorted_group_min)
    kept = sorted_group_min(exploded, ["seg"], ["doc_id", "seg_idx"])

    # parts are encoded '000000000042\x1f<seg>' strings (zero-padded index
    # prefix sorts numerically): a homogeneous string list stays
    # Arrow-encodable in partial aggregate blocks — an (int, str) tuple
    # would fall back to pickled objects
    collect = AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: a + b,
        name="parts",
        accumulate_block=lambda acc, block: acc
        + [
            f"{i:012d}\x1f{s}"
            for i, s in zip(
                block.column("seg_idx").to_pylist(), block.column("seg").to_pylist()
            )
        ],
    )
    per_doc = kept.groupby("doc_id").aggregate(collect)

    def finish(batch: pa.Table) -> pa.Table:
        texts = [
            " ".join(p.split("\x1f", 1)[1] for p in sorted(parts))
            for parts in batch.column("parts").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text_dedup": pa.array(texts, pa.string()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")


def sorted_group_min(
    rows_ds,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    descending: Optional[Sequence[bool]] = None,
):
    """One row per distinct key: the row FIRST in the (key_cols + value_cols)
    sort order — the groupby-argmin/argmax primitive on the sorted-adjacency
    shape (see ``dedup.sorted_bucket_pairs``): Ray's groupby aggregate pays
    ~25 µs of machinery per group, a native sort does not.

    ``descending`` flags apply to the VALUE columns (keys always ascend), so
    e.g. ``descending=[True, False]`` on values (score, term) yields the
    per-key argmax-by-score with term tie-break.

    Sorting makes each run's FIRST row its winner, so interior runs reduce
    to a vectorized ``take(run_starts)``; only each block's first and last
    run (the ones that can straddle a boundary) defer their candidate row to
    the driver, which keeps the best per key across adjacent blocks — ≤2
    single rows per block, never buckets."""
    import ray.data as rd

    key_cols = list(key_cols)
    value_cols = list(value_cols)
    all_cols = key_cols + value_cols
    desc = [False] * len(key_cols) + list(
        descending if descending is not None else [False] * len(value_cols)
    )
    # compact: a sort leaves empty blocks that map_batches passes through as
    # zero-column join poison downstream (blocks.py); dropping them here is
    # free (the sort already materialized)
    from vigil_ray.stages.blocks import coalesce_blocks

    ds_sorted = compact_blocks(coalesce_blocks(rows_ds).sort(all_cols, descending=desc))

    from vigil_ray.stages.runs import run_starts as _run_starts_impl

    def _run_starts(batch) -> np.ndarray:
        return _run_starts_impl(batch, key_cols)

    def boundary_candidates(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # project the empty block too — a raw empty batch would carry a
            # different column set than the non-empty path's select()
            return batch.slice(0, 0).select(all_cols)
        starts = _run_starts(batch)
        picks = [int(starts[0])] if len(starts) == 1 else [int(starts[0]), int(starts[-1])]
        return batch.take(pa.array(picks, pa.int64())).select(all_cols)

    deferred = ds_sorted.map_batches(
        boundary_candidates, batch_format="pyarrow", batch_size=None
    ).take_all()

    value_desc = list(descending) if descending is not None else [False] * len(value_cols)

    def _order_key(v: tuple) -> tuple:
        # honor per-column descending in the driver merge; descending is
        # numeric-only (strings can't be negated — none of the callers need it)
        out = []
        for x, d in zip(v, value_desc):
            if d:
                if not isinstance(x, (int, float)):
                    raise TypeError("descending sorted_group_min values must be numeric")
                out.append(-x)
            else:
                out.append(x)
        return tuple(out)

    best: dict = {}
    for r in deferred:
        k = tuple(r[c] for c in key_cols)
        v = tuple(r[c] for c in value_cols)
        if k not in best or _order_key(v) < _order_key(best[k]):
            best[k] = v
    # build the driver rows with the sorted ds's exact column types
    schema = ds_sorted.schema()
    if schema is None or not deferred:
        # empty input (a fully empty materialized Dataset has no schema):
        # empty output, same (lack of) schema
        return ds_sorted
    types = {name: t for name, t in zip(schema.names, schema.types)}
    cols = {}
    keys_sorted = sorted(best)
    for i, c in enumerate(key_cols):
        cols[c] = pa.array([k[i] for k in keys_sorted], types[c])
    for j, c in enumerate(value_cols):
        cols[c] = pa.array([best[k][j] for k in keys_sorted], types[c])
    boundary_tbl = rd.from_arrow(pa.table(cols))

    def interior_mins(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(all_cols)
        starts = _run_starts(batch)
        inner = starts[1:-1]  # first and last run deferred
        return batch.take(pa.array(inner, pa.int64())).select(all_cols)

    inner = ds_sorted.map_batches(
        interior_mins, batch_format="pyarrow", batch_size=None
    )
    return boundary_tbl.union(inner)


def sorted_group_sum(rows_ds, key_cols: Sequence[str], sum_cols: Sequence[str]):
    """One row per distinct key with the int64 SUM of each ``sum_cols`` —
    thin wrapper over :func:`sorted_group_agg` (kept for its many call
    sites). Sums are integer-exact (int64 accumulate; callers with float
    costs should quantize first — the int path is what a token/byte budget
    needs)."""
    return sorted_group_agg(rows_ds, key_cols, [(c, "sum", c) for c in sum_cols])


_AGG_REDUCE = {"sum": np.add, "min": np.minimum, "max": np.maximum}


def sorted_group_agg(rows_ds, key_cols: Sequence[str], specs: Sequence[tuple]):
    """One row per distinct key with per-column reductions — the groupby
    primitive on the sorted-adjacency shape (see :func:`sorted_group_min`):
    a native sort + vectorized per-run ``np.{add,minimum,maximum}.reduceat``
    replaces the ~25 µs/group machinery of a hash aggregate. Interior runs
    are complete by construction; each block defers only its FIRST and LAST
    run's partials to the driver, which combines partials per key (a run
    spanning k blocks contributes k partials) — ≤2 rows per block, never
    row-sized.

    ``specs`` is a sequence of ``(col, op, out_name)`` with op in
    ``{"sum", "min", "max"}``; the same input col may appear under several
    ops/out names. ``sum`` accumulates int64 (integer-exact — quantize float
    costs first); ``min``/``max`` keep the column's native type (their
    partial merge is order-independent, so floats are exact too).
    """
    import ray.data as rd

    from vigil_ray.stages.runs import run_starts as _run_starts_impl

    key_cols = list(key_cols)
    specs = [tuple(s) for s in specs]
    for _, op, _out in specs:
        if op not in _AGG_REDUCE:
            raise ValueError(f"sorted_group_agg: unknown op {op!r}")
    from vigil_ray.stages.blocks import coalesce_blocks

    ds_sorted = compact_blocks(coalesce_blocks(rows_ds).sort(key_cols))  # see sorted_group_min

    def _out_type(batch: pa.Table, col: str, op: str):
        return pa.int64() if op == "sum" else batch.column(col).type

    def _run_aggs(batch: pa.Table):
        starts = _run_starts_impl(batch, key_cols)
        vals = []
        for c, op, _out in specs:
            arr = (
                batch.column(c)
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            if op == "sum":
                arr = arr.astype(np.int64)
            vals.append(_AGG_REDUCE[op].reduceat(arr, starts))
        return starts, vals

    def _rows(batch: pa.Table, starts, vals, idx) -> pa.Table:
        # keys keep the input column types (inference from .as_py() would
        # widen e.g. int32 keys to int64 and break the union's schema)
        cols = {
            c: pa.array(
                [batch.column(c)[int(starts[i])].as_py() for i in idx],
                batch.column(c).type,
            )
            for c in key_cols
        }
        for j, (c, op, out) in enumerate(specs):
            cols[out] = pa.array(
                [vals[j][i] for i in idx], _out_type(batch, c, op)
            )
        return pa.table(cols)

    def _empty(batch: pa.Table) -> pa.Table:
        cols = {c: pa.array([], batch.column(c).type) for c in key_cols}
        for c, op, out in specs:
            cols[out] = pa.array([], _out_type(batch, c, op))
        return pa.table(cols)

    def boundary_partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(batch)
        starts, vals = _run_aggs(batch)
        idx = [0] if len(starts) == 1 else [0, len(starts) - 1]
        return _rows(batch, starts, vals, idx)

    deferred = ds_sorted.map_batches(
        boundary_partials, batch_format="pyarrow", batch_size=None
    ).take_all()

    merged: dict = {}
    for r in deferred:
        k = tuple(r[c] for c in key_cols)
        acc = merged.get(k)
        if acc is None:
            merged[k] = [r[out] for _, _, out in specs]
        else:
            for j, (_, op, out) in enumerate(specs):
                if op == "sum":
                    acc[j] += r[out]
                elif op == "min":
                    acc[j] = min(acc[j], r[out])
                else:
                    acc[j] = max(acc[j], r[out])

    schema = ds_sorted.schema()
    if schema is None or not merged:
        # preserve the REAL column types on the empty path: downstream
        # unions/sorts against string-keyed tables break on a fabricated
        # int64 schema (sorted_group_min keeps the true schema the same way)
        if schema is not None:
            types = {name: t for name, t in zip(schema.names, schema.types)}
            key_t = {c: types[c] for c in key_cols}
            out_t = {
                out: (pa.int64() if op == "sum" else types[c])
                for c, op, out in specs
            }
        else:
            key_t = {c: pa.int64() for c in key_cols}
            out_t = {out: pa.int64() for _, _, out in specs}
        return rd.from_arrow(
            pa.table(
                {c: pa.array([], t) for c, t in key_t.items()}
                | {o: pa.array([], t) for o, t in out_t.items()}
            )
        )
    types = {name: t for name, t in zip(schema.names, schema.types)}
    keys_sorted = sorted(merged)
    cols = {
        c: pa.array([k[i] for k in keys_sorted], types[c])
        for i, c in enumerate(key_cols)
    }
    for j, (c, op, out) in enumerate(specs):
        cols[out] = pa.array(
            [merged[k][j] for k in keys_sorted],
            pa.int64() if op == "sum" else types[c],
        )
    boundary_tbl = rd.from_arrow(pa.table(cols))

    def interior_aggs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(batch)
        starts, vals = _run_aggs(batch)
        idx = list(range(1, len(starts) - 1))  # first and last run deferred
        return _rows(batch, starts, vals, idx)

    inner = ds_sorted.map_batches(
        interior_aggs, batch_format="pyarrow", batch_size=None
    )
    return boundary_tbl.union(inner)


# --------------------------------------------------------------------------
# distributed ordered prefix sum → shard packing, deterministic shuffle
# --------------------------------------------------------------------------

def prefix_scan(
    ds, sort_cols: Sequence[str], cost_col: Optional[str] = None, op: str = "sum"
):
    """Append ``cum_excl`` — the EXCLUSIVE running ``op`` ("sum" or "max") of
    ``cost_col`` (or the 0-based row rank when ``cost_col`` is None, sum
    only) in ``sort_cols`` order. First row gets 0 for sum, ``-inf`` for max
    (no preceding rows).

    The canonical two-phase distributed prefix scan:

    1. globally sort and PIN the block layout (``materialize`` — the barrier
       is inherent: no row can know its prefix before every earlier block's
       total exists);
    2. pass 1 reduces each block to one (first_key, block_total) row — a
       per-block scalar, collected to the driver (block-count-sized, never
       row-sized);
    3. exclusive block offsets (running sum / running max over blocks) are
       broadcast and pass 2 combines the in-block running scan, processing
       whole blocks (``batch_size=None``) so both passes see the identical
       layout. Sort keys must be unique (block offsets key on the first
       row's key values).
    """
    import ray

    if op not in ("sum", "max"):
        raise ValueError(f"unsupported prefix op: {op}")
    if op == "max" and not cost_col:
        raise ValueError("prefix max needs a cost column")

    # compact: drop the sort's empty blocks so neither pass sees
    # zero-column passthrough blocks (blocks.py) — layout stays pinned for
    # both passes (compaction happens once, before either map)
    from vigil_ray.stages.blocks import coalesce_blocks

    ds = compact_blocks(coalesce_blocks(ds).sort(list(sort_cols)))

    def _np(col) -> np.ndarray:
        return col.combine_chunks().to_numpy(zero_copy_only=False)

    # the SUM path stays integer-exact when costs are integers (a 100-TB
    # token/byte budget exceeds 2^53, where incremental float addition
    # diverges from the SQL window's one-shot sum); MAX never accumulates,
    # so float is fine there (values themselves must fit a double exactly)
    schema = ds.schema()
    col_types = (
        dict(zip(schema.names, schema.types)) if schema is not None else {}
    )
    int_exact = op == "sum" and (
        cost_col is None
        or (cost_col in col_types and pa.types.is_integer(col_types[cost_col]))
    )
    total_type = pa.int64() if int_exact else pa.float64()

    def block_total(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # a sorted materialize can leave empty blocks
            return batch.slice(0, 0).select(list(sort_cols)).append_column(
                "total", pa.array([], total_type)
            )
        if cost_col:
            vals = _np(batch.column(cost_col))
            total = np.max(vals) if op == "max" else np.sum(vals)
        else:
            total = batch.num_rows
        total = int(total) if int_exact else float(total)
        # the block's FIRST row carries the sort-key values natively (typed
        # columns, NOT a stringified key — a string sort of numeric keys
        # would order block offsets lexicographically and corrupt the scan)
        return batch.slice(0, 1).select(list(sort_cols)).append_column(
            "total", pa.array([total], total_type)
        )

    totals = ds.map_batches(
        block_total, batch_format="pyarrow", batch_size=None
    ).take_all()
    # driver work is O(number of blocks): order block offsets by first key
    totals.sort(key=lambda r: tuple(r[c] for c in sort_cols))
    offsets = {}
    run = (0 if int_exact else 0.0) if op == "sum" else float("-inf")
    for r in totals:
        offsets[tuple(r[c] for c in sort_cols)] = run
        run = run + r["total"] if op == "sum" else max(run, r["total"])
    off_ref = ray.put(offsets)

    cum_type = pa.int64() if int_exact else pa.float64()

    def add_prefix(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("cum_excl", pa.array([], cum_type))
        offs = ray.get(off_ref)
        key = tuple(batch.column(c)[0].as_py() for c in sort_cols)
        base = offs[key]
        if op == "max":
            vals = _np(batch.column(cost_col)).astype(np.float64)
            # exclusive running max: shift the inclusive accumulate right
            inc = np.maximum.accumulate(vals)
            cum = np.empty_like(inc)
            cum[0] = base
            if len(inc) > 1:
                cum[1:] = np.maximum(base, inc[:-1])
        elif cost_col:
            dtype = np.int64 if int_exact else np.float64
            costs = _np(batch.column(cost_col)).astype(dtype)
            cum = base + np.cumsum(costs) - costs
        else:
            cum = base + np.arange(
                batch.num_rows, dtype=np.int64 if int_exact else np.float64
            )
        return batch.append_column("cum_excl", pa.array(cum, cum_type))

    return ds.map_batches(add_prefix, batch_format="pyarrow", batch_size=None)


def grouped_prefix_scan(
    ds,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    cost_col: Optional[str] = None,
):
    """Append ``cum_excl`` — the EXCLUSIVE running sum of ``cost_col`` (or
    the 0-based row rank when ``cost_col`` is None) WITHIN each ``key_cols``
    partition, ordered by ``order_cols`` — the distributed form of
    ``sum(cost) OVER (PARTITION BY key ORDER BY ord)`` / ``row_number()``.

    Same two-phase shape as :func:`prefix_scan` (sort, pin the layout, one
    block-count-sized driver pass, identical-layout second pass), but the
    carry is PER KEY: after the global sort each key's rows are contiguous,
    so the only run in a block that can owe a carry from earlier blocks is
    its FIRST one, and the only run that can lend forward is its LAST —
    the driver walks the blocks in order keeping one (key, acc) pair.
    Unlike the collect-list window pattern (sessions / cumulative), no
    worker ever holds a whole key's history: a single key spanning the
    entire corpus streams through in block-sized pieces — this is the
    10^12-row window-analytic shape. Sums are integer-exact for integer
    costs. ``key_cols + order_cols`` must be row-unique (block offsets key
    on first-row values, as in prefix_scan).
    """
    import ray

    from vigil_ray.stages.blocks import coalesce_blocks
    from vigil_ray.stages.runs import run_starts as _run_starts_impl

    key_cols, order_cols = list(key_cols), list(order_cols)
    sort_cols = key_cols + order_cols
    ds = compact_blocks(coalesce_blocks(ds).sort(sort_cols))

    def _np(col) -> np.ndarray:
        return col.combine_chunks().to_numpy(zero_copy_only=False)

    schema = ds.schema()
    col_types = (
        dict(zip(schema.names, schema.types)) if schema is not None else {}
    )
    int_exact = cost_col is None or (
        cost_col in col_types and pa.types.is_integer(col_types[cost_col])
    )
    np_dtype = np.int64 if int_exact else np.float64
    cum_type = pa.int64() if int_exact else pa.float64()

    def _costs(batch: pa.Table) -> np.ndarray:
        if cost_col:
            return _np(batch.column(cost_col)).astype(np_dtype)
        return np.ones(batch.num_rows, dtype=np.int64)

    def block_edges(batch: pa.Table) -> pa.Table:
        # one row per block: the block id (first-row sort key, native types)
        # plus first-run / last-run keys and totals — the only runs that can
        # exchange carry across block boundaries
        if batch.num_rows == 0:
            t = batch.slice(0, 0).select(sort_cols)
            for name in ("first_total", "last_total"):
                t = t.append_column(name, pa.array([], cum_type))
            for c in key_cols:
                t = t.append_column(f"__last_{c}", batch.slice(0, 0).column(c))
            return t.append_column("single_run", pa.array([], pa.bool_()))
        starts = _run_starts_impl(batch, key_cols)
        costs = _costs(batch)
        first_end = int(starts[1]) if len(starts) > 1 else batch.num_rows
        first_total = costs[:first_end].sum()
        last_total = costs[int(starts[-1]):].sum()
        t = batch.slice(0, 1).select(sort_cols)
        t = t.append_column("first_total", pa.array([first_total], cum_type))
        t = t.append_column("last_total", pa.array([last_total], cum_type))
        # last run's key values ride along as extra columns
        for c in key_cols:
            t = t.append_column(
                f"__last_{c}", batch.slice(int(starts[-1]), 1).column(c)
            )
        return t.append_column(
            "single_run", pa.array([len(starts) == 1], pa.bool_())
        )

    edges = ds.map_batches(
        block_edges, batch_format="pyarrow", batch_size=None
    ).take_all()
    edges.sort(key=lambda r: tuple(r[c] for c in sort_cols))

    zero = 0 if int_exact else 0.0
    carries = {}
    prev_key, acc = None, zero
    for e in edges:
        first_key = tuple(e[c] for c in key_cols)
        block_id = tuple(e[c] for c in sort_cols)
        carry = acc if first_key == prev_key else zero
        carries[block_id] = carry
        if e["single_run"]:
            acc = carry + e["first_total"]
            prev_key = first_key
        else:
            acc = e["last_total"]
            prev_key = tuple(e[f"__last_{c}"] for c in key_cols)
    carry_ref = ray.put(carries)

    def add_scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("cum_excl", pa.array([], cum_type))
        costs = _costs(batch)
        starts = _run_starts_impl(batch, key_cols)
        excl = np.cumsum(costs) - costs
        lengths = np.diff(np.append(starts, batch.num_rows))
        # reset the running sum at each key run (vectorized per-run rebase)
        excl = excl - np.repeat(excl[starts], lengths)
        block_id = tuple(batch.column(c)[0].as_py() for c in sort_cols)
        carry = ray.get(carry_ref)[block_id]
        if carry:
            first_end = int(starts[1]) if len(starts) > 1 else batch.num_rows
            excl = excl.astype(np_dtype, copy=True)
            excl[:first_end] += carry
        return batch.append_column("cum_excl", pa.array(excl, cum_type))

    return ds.map_batches(add_scan, batch_format="pyarrow", batch_size=None)


def _resolve_value_type(ds, value_col: str):
    """The value column's Arrow type from the Dataset schema, with a float64
    fallback for null-typed / untyped columns. Pandas-backed blocks report
    NUMPY dtypes from ``ds.schema()`` (found by property test: an all-None
    object column is not a ``pa.DataType`` and ``pa.types.is_null`` raises),
    so non-Arrow entries are mapped via ``pa.from_numpy_dtype`` first."""
    schema = ds.schema()
    vtype = None
    if schema is not None:
        vtype = dict(zip(schema.names, schema.types)).get(value_col)
    if vtype is not None and not isinstance(vtype, pa.DataType):
        try:
            vtype = pa.from_numpy_dtype(vtype)
        except (TypeError, pa.lib.ArrowNotImplementedError):
            vtype = None
    if vtype is None or pa.types.is_null(vtype):
        vtype = pa.float64()
    return vtype


def grouped_fill_forward(
    ds,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "filled",
):
    """Append ``out_col`` — the last non-null ``value_col`` at or before each
    row WITHIN its ``key_cols`` partition, ordered by ``order_cols`` (LOCF /
    gap-fill imputation; SQL ``last_value(v IGNORE NULLS) OVER (PARTITION BY
    key ORDER BY ord ROWS UNBOUNDED PRECEDING)``). Rows before a key's first
    observation stay null.

    Same two-phase shape as :func:`grouped_prefix_scan`: global sort pins
    the layout, one block-count-sized driver walk threads the last-seen
    value across block boundaries (only a block's FIRST run can owe a value
    from earlier blocks), and an identical-layout second pass fills within
    blocks vectorized. No worker ever holds a key's history.
    ``key_cols + order_cols`` must be row-unique.
    """
    import pyarrow.compute as pc
    import ray

    from vigil_ray.stages.blocks import coalesce_blocks
    from vigil_ray.stages.runs import run_starts as _run_starts_impl

    key_cols, order_cols = list(key_cols), list(order_cols)
    sort_cols = key_cols + order_cols
    ds = compact_blocks(coalesce_blocks(ds).sort(sort_cols))

    # resolve the value type ONCE on the driver: an all-null block reports a
    # `null`-typed column (from_items / filtered inputs), and the fill pass
    # must emit one consistent type across blocks
    vtype_global = _resolve_value_type(ds, value_col)

    def _vcol(batch: pa.Table):
        import pyarrow.compute as _pc

        col = batch.column(value_col).combine_chunks()
        if pa.types.is_null(col.type):
            col = _pc.cast(col, vtype_global)
        return col

    def block_edges(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            t = batch.slice(0, 0).select(sort_cols)
            t = t.append_column("last_val", pa.nulls(0, vtype_global))
            for c in key_cols:
                t = t.append_column(f"__last_{c}", batch.slice(0, 0).column(c))
            return t.append_column("single_run", pa.array([], pa.bool_()))
        starts = _run_starts_impl(batch, key_cols)
        col = _vcol(batch)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        last_start = int(starts[-1])
        tail_valid = np.flatnonzero(valid[last_start:])
        # last non-null of the LAST run (None if the run is all-null: the
        # run STARTS in this block, so nothing earlier can exist for it)
        last_idx = (
            last_start + int(tail_valid[-1]) if len(tail_valid) else None
        )
        t = batch.slice(0, 1).select(sort_cols)
        t = t.append_column(
            "last_val",
            col.slice(last_idx, 1) if last_idx is not None
            else pa.nulls(1, vtype_global),
        )
        for c in key_cols:
            t = t.append_column(f"__last_{c}", batch.slice(last_start, 1).column(c))
        return t.append_column(
            "single_run", pa.array([len(starts) == 1], pa.bool_())
        )

    edges = ds.map_batches(
        block_edges, batch_format="pyarrow", batch_size=None
    ).take_all()
    edges.sort(key=lambda r: tuple(r[c] for c in sort_cols))

    carries = {}
    prev_key, acc = None, None
    for e in edges:
        first_key = tuple(e[c] for c in key_cols)
        block_id = tuple(e[c] for c in sort_cols)
        carries[block_id] = acc if first_key == prev_key else None
        if e["single_run"]:
            if e["last_val"] is not None:
                acc = e["last_val"]
            elif first_key != prev_key:
                acc = None
            prev_key = first_key
        else:
            acc = e["last_val"]
            prev_key = tuple(e[f"__last_{c}"] for c in key_cols)
    carry_ref = ray.put(carries)

    def fill(batch: pa.Table) -> pa.Table:
        vtype = vtype_global
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.nulls(0, vtype))
        col = _vcol(batch)
        n = batch.num_rows
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        starts = _run_starts_impl(batch, key_cols)
        lengths = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64)
        seen = np.maximum.accumulate(np.where(valid, pos, -1))
        run_start = np.repeat(starts, lengths)
        has_val = seen >= run_start  # an observation within this row's run
        taken = col.take(pa.array(np.maximum(seen, 0), pa.int64()))
        out = pc.if_else(pa.array(has_val), taken, pa.scalar(None, vtype))
        block_id = tuple(batch.column(c)[0].as_py() for c in sort_cols)
        carry = ray.get(carry_ref)[block_id]
        if carry is not None:
            first_end = int(starts[1]) if len(starts) > 1 else n
            head_gap = pa.array(~has_val[:first_end])
            head = pc.if_else(
                head_gap, pa.scalar(carry, vtype), out.slice(0, first_end)
            )

            def _plain(a):
                return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

            out = (
                pa.concat_arrays([_plain(head), _plain(out.slice(first_end))])
                if first_end < n
                else head
            )
        return batch.append_column(out_col, out)

    return ds.map_batches(fill, batch_format="pyarrow", batch_size=None)


def grouped_shift(
    ds,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    periods: int = 1,
    out_col: str = "shifted",
):
    """Append ``out_col`` — ``value_col`` shifted by one row WITHIN each
    ``key_cols`` partition in ``order_cols`` order: SQL ``lag(v, 1)``
    (``periods=1``) / ``lead(v, 1)`` (``periods=-1``) ``OVER (PARTITION BY
    key ORDER BY ord)``. The partition's edge row gets null. Only |1| is
    supported — a one-row shift needs only the ADJACENT block's edge row,
    so the driver walk stays block-count-sized.

    Same two-phase shape as :func:`grouped_fill_forward`: global sort pins
    the layout; an edges pass emits each block's first/last (key, value)
    row; the driver hands each block its neighbor's edge value when the run
    continues across the boundary; an identical-layout second pass shifts
    within blocks vectorized. No worker holds a key's history.
    ``key_cols + order_cols`` must be row-unique.
    """
    import pyarrow.compute as pc
    import ray

    from vigil_ray.stages.blocks import coalesce_blocks
    from vigil_ray.stages.runs import run_starts as _run_starts_impl

    if periods not in (1, -1):
        raise ValueError("grouped_shift supports periods=1 (lag) or -1 (lead)")
    key_cols, order_cols = list(key_cols), list(order_cols)
    sort_cols = key_cols + order_cols
    ds = compact_blocks(coalesce_blocks(ds).sort(sort_cols))

    vtype = _resolve_value_type(ds, value_col)

    def _vcol(batch: pa.Table):
        col = batch.column(value_col).combine_chunks()
        if pa.types.is_null(col.type):
            col = pc.cast(col, vtype)
        return col

    def block_edges(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            t = batch.slice(0, 0).select(sort_cols)
            t = t.append_column("first_val", pa.nulls(0, vtype))
            t = t.append_column("last_val", pa.nulls(0, vtype))
            for c in key_cols:
                t = t.append_column(f"__last_{c}", batch.slice(0, 0).column(c))
            return t
        col = _vcol(batch)
        n = batch.num_rows
        t = batch.slice(0, 1).select(sort_cols)  # block id = first-row sort tuple
        t = t.append_column("first_val", col.slice(0, 1))
        t = t.append_column("last_val", col.slice(n - 1, 1))
        for c in key_cols:
            t = t.append_column(f"__last_{c}", batch.slice(n - 1, 1).column(c))
        return t

    edges = ds.map_batches(
        block_edges, batch_format="pyarrow", batch_size=None
    ).take_all()
    edges.sort(key=lambda r: tuple(r[c] for c in sort_cols))

    # carry[block] = the neighbor-block value the block's edge row takes,
    # or None when the run does not continue across that boundary
    carries = {}
    for i, e in enumerate(edges):
        block_id = tuple(e[c] for c in sort_cols)
        first_key = tuple(e[c] for c in key_cols)
        last_key = tuple(e[f"__last_{c}"] for c in key_cols)
        if periods == 1:  # lag: row 0 takes the PREVIOUS block's last value
            prev = edges[i - 1] if i > 0 else None
            same = prev is not None and tuple(
                prev[f"__last_{c}"] for c in key_cols
            ) == first_key
            carries[block_id] = prev["last_val"] if same else None
        else:  # lead: last row takes the NEXT block's first value
            nxt = edges[i + 1] if i + 1 < len(edges) else None
            same = nxt is not None and tuple(nxt[c] for c in key_cols) == last_key
            carries[block_id] = nxt["first_val"] if same else None
    carry_ref = ray.put(carries)

    def _plain(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    def shift(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.nulls(0, vtype))
        col = _vcol(batch)
        n = batch.num_rows
        starts = _run_starts_impl(batch, key_cols)
        lengths = np.diff(np.append(starts, n))
        if periods == 1:
            idx = np.arange(n, dtype=np.int64) - 1
            bound = np.repeat(starts, lengths)  # run start per row
            has = idx >= bound
        else:
            idx = np.arange(n, dtype=np.int64) + 1
            bound = np.repeat(np.append(starts[1:], n), lengths)  # run end
            has = idx < bound
        taken = col.take(pa.array(np.clip(idx, 0, n - 1), pa.int64()))
        out = pc.if_else(pa.array(has), taken, pa.scalar(None, vtype))
        block_id = tuple(batch.column(c)[0].as_py() for c in sort_cols)
        carry = ray.get(carry_ref)[block_id]
        if carry is not None:
            patch = pa.array([carry], vtype)
            if periods == 1:
                out = (
                    pa.concat_arrays([patch, _plain(out.slice(1))])
                    if n > 1
                    else patch
                )
            else:
                out = (
                    pa.concat_arrays([_plain(out.slice(0, n - 1)), patch])
                    if n > 1
                    else patch
                )
        return batch.append_column(out_col, out)

    return ds.map_batches(shift, batch_format="pyarrow", batch_size=None)


def _grouped_rolling(
    ds,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    window: int,
    out_col: str,
    reduce_fn,
    out_type,
):
    """SQL ``median(v) OVER (PARTITION BY key ORDER BY ord ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW)`` — a per-row ORDER-STATISTIC
    window (nonlinear, unlike the prefix-scan sums), on the same two-phase
    sorted-block shape as :func:`grouped_shift`, generalized from a 1-row
    edge to a chained ≤(window−1)-row tail carry:

    1. global sort pins the layout; an edges pass emits each block's
       first/last key and the trailing ≤window−1 values of its LAST run;
    2. the driver walks blocks in order CHAINING tails — a run spanning
       many short blocks accumulates its true trailing values, and each
       block receives the carry its first run needs (≤window−1 values per
       block of driver state, never a key's history);
    3. an identical-layout second pass computes every row's trailing-window
       median fully vectorized: ``sliding_window_view`` over the
       carry-extended values, run-start masking, ``nanmedian``.

    Values must be integers (quantize first); medians of ≤``window`` ints
    are dyadic-exact doubles, so the result bit-matches a SQL ``median``
    window aggregate. ``key_cols + order_cols`` must be row-unique.
    """
    import pyarrow.compute as pc  # noqa: F401  (kept for parity with siblings)
    import ray

    from vigil_ray.stages.blocks import coalesce_blocks
    from vigil_ray.stages.runs import run_starts as _run_starts_impl

    key_cols, order_cols = list(key_cols), list(order_cols)
    sort_cols = key_cols + order_cols
    k_carry = window - 1
    ds = compact_blocks(coalesce_blocks(ds).sort(sort_cols))

    def block_edges(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            t = batch.slice(0, 0).select(sort_cols)
            t = t.append_column("tail", pa.array([], pa.list_(pa.int64())))
            for c in key_cols:
                t = t.append_column(f"__last_{c}", batch.slice(0, 0).column(c))
            return t
        n = batch.num_rows
        starts = _run_starts_impl(batch, key_cols)
        last_start = int(starts[-1])
        vals = (
            batch.column(value_col)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        tail = vals[max(last_start, n - k_carry) : n].tolist()
        t = batch.slice(0, 1).select(sort_cols)  # block id = first-row tuple
        t = t.append_column("tail", pa.array([tail], pa.list_(pa.int64())))
        for c in key_cols:
            t = t.append_column(f"__last_{c}", batch.slice(n - 1, 1).column(c))
        return t

    edges = ds.map_batches(
        block_edges, batch_format="pyarrow", batch_size=None
    ).take_all()
    edges.sort(key=lambda r: tuple(r[c] for c in sort_cols))

    carries = {}
    running: list = []
    prev_last_key = None
    for e in edges:
        block_id = tuple(e[c] for c in sort_cols)
        first_key = tuple(e[c] for c in key_cols)
        last_key = tuple(e[f"__last_{c}"] for c in key_cols)
        carries[block_id] = list(running) if first_key == prev_last_key else []
        tail = list(e["tail"])
        if first_key == last_key and first_key == prev_last_key:
            running = (running + tail)[-k_carry:]
        else:
            running = tail
        prev_last_key = last_key
    carry_ref = ray.put(carries)

    def med(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.nulls(0, out_type))
        n = batch.num_rows
        starts = _run_starts_impl(batch, key_cols)
        lengths = np.diff(np.append(starts, n))
        block_id = tuple(batch.column(c)[0].as_py() for c in sort_cols)
        carry = np.asarray(ray.get(carry_ref)[block_id], np.float64)
        off = len(carry)
        vals = (
            batch.column(value_col)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        ext = np.concatenate([carry, vals])
        run_start_ext = np.repeat(starts + off, lengths)
        run_start_ext[: lengths[0]] = 0  # first run reaches into the carry
        eext = np.concatenate([np.full(window - 1, np.nan), ext])
        win = np.lib.stride_tricks.sliding_window_view(eext, window)
        pos = np.arange(n, dtype=np.int64) + off
        w = win[pos].copy()
        elem_pos = pos[:, None] - (window - 1) + np.arange(window)[None, :]
        w[elem_pos < run_start_ext[:, None]] = np.nan
        out = reduce_fn(w)
        if pa.types.is_integer(out_type):
            out = out.astype(np.int64)
        return batch.append_column(out_col, pa.array(out, out_type))

    return ds.map_batches(med, batch_format="pyarrow", batch_size=None)


def grouped_rolling_median(
    ds,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    window: int = 5,
    out_col: str = "rolling_median",
):
    """Trailing-window MEDIAN per row — see :func:`_grouped_rolling` for
    the sorted-block two-phase shape (chained tail carry; no per-key
    state). Integer-quantized inputs make every ≤window-element median a
    dyadic-exact double."""
    return _grouped_rolling(
        ds,
        key_cols,
        order_cols,
        value_col,
        window,
        out_col,
        lambda w: np.nanmedian(w, axis=1),
        pa.float64(),
    )


def grouped_rolling_sum(
    ds,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    window: int = 5,
    out_col: str = "rolling_sum",
):
    """Trailing-window SUM per row (SQL ``ROWS BETWEEN window-1 PRECEDING
    AND CURRENT ROW``) on the same machinery — integer-exact for
    integer-quantized inputs."""
    return _grouped_rolling(
        ds,
        key_cols,
        order_cols,
        value_col,
        window,
        out_col,
        lambda w: np.nansum(w, axis=1),
        pa.int64(),
    )


def pack_shards(ds, id_col: str, cost_col: str, shard_size: int):
    """Greedy in-order shard packing: documents in ``id_col`` order are
    assigned to consecutive shards of ≈``shard_size`` cost units
    (tokens/bytes) — ``shard_id = floor(prefix_cost / shard_size)``, the
    exact SQL window form ``floor((sum(cost) OVER (ORDER BY id) - cost) /
    S)``. The pattern behind sequence-packing / fixed-budget output shards.
    """
    scanned = prefix_scan(ds, [id_col], cost_col=cost_col)

    def finish(batch: pa.Table) -> pa.Table:
        cum = batch.column("cum_excl").combine_chunks().to_numpy(zero_copy_only=False)
        if np.issubdtype(cum.dtype, np.integer):
            shard = cum // shard_size  # exact, no float round-trip
        else:
            shard = np.floor(cum / shard_size).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "shard_id": pa.array(shard.astype(np.int64), pa.int64()),
            }
        )

    return scanned.map_batches(finish, batch_format="pyarrow")


def deterministic_shuffle(ds, id_col: str, seed: int = 42):
    """Seeded, reproducible GLOBAL shuffle rank: order by ``md5(id:seed)``
    (uniform, deterministic, cluster-size-independent — the property a
    resumable training-data shuffle needs) and emit the 1-based rank via the
    distributed prefix scan. Output: (id, shuffle_rank)."""

    def key_of(batch: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(f"{v}:{seed}".encode()).hexdigest()
            for v in batch.column(id_col).to_pylist()
        ]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "shuffle_key": pa.array(keys, pa.string()),
            }
        )

    keyed = ds.map_batches(key_of, batch_format="pyarrow")
    scanned = prefix_scan(keyed, ["shuffle_key"])

    def finish(batch: pa.Table) -> pa.Table:
        rank = (
            batch.column("cum_excl").combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64) + 1
        return pa.table(
            {
                id_col: batch.column(id_col),
                "shuffle_rank": pa.array(rank, pa.int64()),
            }
        )

    return scanned.map_batches(finish, batch_format="pyarrow")


def per_group_rank(ds, group_col: str, id_col: str, seed: int = 7):
    """Seeded, reproducible WITHIN-GROUP shuffle rank (1-based): rank =
    row_number over md5(id:seed) partitioned by ``group_col`` — the
    per-source ordering a deterministic data-mixing schedule consumes.

    Built on the existing global machinery instead of a per-group scan:
    sort by (group, key) so groups are contiguous, take the GLOBAL prefix
    rank, and subtract each group's exclusive start offset (a
    groups-sized count table, driver-side — never row-sized). Output:
    (id, group, rank)."""

    def key_of(batch: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(f"{v}:{seed}".encode()).hexdigest()
            for v in batch.column(id_col).to_pylist()
        ]
        return pa.table(
            {
                id_col: batch.column(id_col),
                group_col: batch.column(group_col),
                "mix_key": pa.array(keys, pa.string()),
            }
        )

    keyed = ds.map_batches(key_of, batch_format="pyarrow")
    scanned = prefix_scan(keyed, [group_col, "mix_key"]).materialize()

    # exclusive start offset per group, in the same (lexicographic) group
    # order the sort used — groups-sized, not row-sized
    counts = sorted_group_sum(
        scanned.map_batches(
            lambda b: pa.table(
                {group_col: b.column(group_col), "one": pa.array([1] * b.num_rows, pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        [group_col],
        ["one"],
    ).take_all()
    counts.sort(key=lambda r: r[group_col])
    offsets, acc = {}, 0
    for r in counts:
        offsets[r[group_col]] = acc
        acc += r["one"]

    import ray

    oref = ray.put(offsets)

    def finish(batch: pa.Table) -> pa.Table:
        offs = ray.get(oref)
        glob = (
            batch.column("cum_excl").combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        starts = np.array(
            [offs[g] for g in batch.column(group_col).to_pylist()], dtype=np.int64
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                group_col: batch.column(group_col),
                "rank": pa.array(glob - starts + 1, pa.int64()),
            }
        )

    return scanned.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------------------
# deterministic train/val/test split
# --------------------------------------------------------------------------

def hash_split(
    ds,
    id_col: str,
    seed: int = 42,
    bounds: Tuple[int, int] = (80, 90),
    labels: Tuple[str, str, str] = ("train", "val", "test"),
    append: bool = False,
):
    """Stable split assignment: ``bucket = int(md5(id:seed)[:8], 16) % 100``;
    bucket < bounds[0] → train, < bounds[1] → val, else test. A pure
    embarrassingly-parallel map — the split of any document never depends on
    the rest of the corpus, so it is identical at any scale or parallelism.
    ``append=True`` keeps every input column (pipeline composition);
    default output is the bare (id, split) table.
    """

    def assign(batch: pa.Table) -> pa.Table:
        out = []
        for v in batch.column(id_col).to_pylist():
            bucket = int(hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:8], 16) % 100
            out.append(
                labels[0] if bucket < bounds[0] else labels[1] if bucket < bounds[1] else labels[2]
            )
        split = pa.array(out, pa.string())
        if append:
            return batch.append_column("split", split)
        return pa.table({id_col: batch.column(id_col), "split": split})

    return ds.map_batches(assign, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Bloom-filtered anti join
# --------------------------------------------------------------------------

_BLOOM_K = 4


def _vbloom_hashes(col) -> "tuple":
    """Two independent vectorized 64-bit hashes of an Arrow column (polars
    xxhash under two seeds); Kirsch-Mitzenmacher double hashing derives the
    K probe positions as ``h1 + i*h2`` (uint64 wraparound is deterministic
    on both the build and probe side).

    polars' hash is DTYPE-SENSITIVE: the same value hashes differently as
    int32 vs int64, so a width mismatch between the Bloom build side and the
    probe side would produce silent false NEGATIVES (blocklisted rows kept).
    Canonicalize numeric widths here — on BOTH sides symmetrically — before
    hashing: signed ints → int64, unsigned → uint64, floats → float64
    (string vs large_string both land on polars Utf8 already)."""
    import polars as pl
    import pyarrow.compute as pc
    import pyarrow.types as pat

    if isinstance(col, pa.Table):
        col = col.column(0)
    t = col.type
    if pat.is_unsigned_integer(t) and t != pa.uint64():
        col = pc.cast(col, pa.uint64())
    elif pat.is_signed_integer(t) and t != pa.int64():
        col = pc.cast(col, pa.int64())
    elif pat.is_floating(t) and t != pa.float64():
        col = pc.cast(col, pa.float64())
    s = pl.from_arrow(col)
    if isinstance(s, pl.DataFrame):  # from_arrow(Table) → DataFrame
        s = s.to_series(0)
    return s.hash(seed=11).to_numpy(), s.hash(seed=23).to_numpy()


def vbloom_build(keys_ds, key_col: str, m_bits: int = 1 << 20) -> np.ndarray:
    """Vectorized distributed Bloom build (same OR-reduce shape as
    :func:`bloom_build`, but numpy per batch — no per-row Python)."""

    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        if batch.num_rows:
            h1, h2 = _vbloom_hashes(batch.column(key_col))
            for i in range(_BLOOM_K):
                p = ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(
                    np.int64
                )
                np.bitwise_or.at(
                    bits, p >> 3, (1 << (p & 7)).astype(np.uint8)
                )
        return pa.table({"bitmap": pa.array([bits.tobytes()], pa.binary())})

    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in keys_ds.map_batches(partial, batch_format="pyarrow").take_all():
        bitmap |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return bitmap


def vbloom_mask(col, bits: np.ndarray, m_bits: int) -> np.ndarray:
    """Vectorized membership probe: bool mask of rows whose all-K bits are
    set (bloom-positive; no false negatives)."""
    h1, h2 = _vbloom_hashes(col)
    keep = np.ones(len(h1), dtype=bool)
    for i in range(_BLOOM_K):
        p = ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)
        keep &= (bits[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
    return keep


def _bloom_positions(key: int, m_bits: int) -> List[int]:
    h = hashlib.md5(str(key).encode()).digest()
    return [
        int.from_bytes(h[4 * i : 4 * i + 4], "big") % m_bits for i in range(_BLOOM_K)
    ]


def bloom_build(keys_ds, key_col: str, m_bits: int = 1 << 20) -> np.ndarray:
    """Distributed Bloom build: each batch of blocklist keys becomes a
    partial bitmap; partials are OR-reduced. The driver handles one
    ``m_bits/8``-byte array per BLOCK, never the keys themselves."""

    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        for v in batch.column(key_col).to_pylist():
            for p in _bloom_positions(v, m_bits):
                bits[p >> 3] |= 1 << (p & 7)
        return pa.table({"bitmap": pa.array([bits.tobytes()], pa.binary())})

    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in keys_ds.map_batches(partial, batch_format="pyarrow").take_all():
        bitmap |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return bitmap


# Bloom-positive sliver keys above this fall back to the left_anti Join
# (the gate aborts DURING driver collection, bounding driver memory).
_MAX_CONFIRM_BROADCAST = int(
    os.environ.get("GRAFT_CONFIRM_BROADCAST_KEYS", 2_000_000)
)


def bloom_anti_join(
    ds,
    keys_ds,
    key_col: str,
    blocklist_col: str,
    m_bits: int = 1 << 20,
    num_partitions: int = 8,
):
    """Rows of ``ds`` whose ``key_col`` is NOT in the blocklist.

    Scale shape: the Bloom bitmap (m_bits/8 bytes, e.g. 128 KiB for 10⁶
    slots) is broadcast once via ``ray.put``. Rows whose bits miss are
    DEFINITELY clean and stream straight through — no shuffle. Only the
    bloom-positive sliver (true members + ~(1-e^{-kn/m})^k false positives)
    pays the exact confirm, which is a BROADCAST SEMI, not a shuffle join:
    the sliver's distinct keys broadcast once (``ray.put``, size-gated at
    ``_MAX_CONFIRM_BROADCAST``), a shuffle-free ``pc.is_in`` scan of the
    blocklist emits only the intersection (≤ sliver-sized), and that
    confirmed set broadcasts back to filter the sliver — the Ray ``Join``
    operator's fixed per-run cost (~1.7 s measured at sf0.1) and its
    blocklist shuffle are both avoided. A sliver wider than the gate falls
    back to the exact ``left_anti`` hash join. Build and probe are
    vectorized (:func:`vbloom_build` / :func:`vbloom_mask` — polars xxhash
    + numpy bitmap ops, no per-row Python on the corpus).
    """
    import ray

    bitmap = vbloom_build(keys_ds, blocklist_col, m_bits)
    bref = ray.put(bitmap)

    def flag(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return batch.append_column("_bloom_hit", pa.array([], pa.bool_()))
        hit = vbloom_mask(batch.column(key_col), ray.get(bref), m_bits)
        return batch.append_column("_bloom_hit", pa.array(hit, pa.bool_()))

    def _take(want: bool):
        def f(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = batch.column("_bloom_hit")
            if not want:
                mask = pc.invert(mask)
            return batch.filter(mask).drop_columns(["_bloom_hit"])

        return f

    # materialized ONCE: the clean and candidate branches both consume it —
    # unpinned, the bloom probe AND the whole upstream lineage would run
    # twice, negating the operator's point
    flagged = ds.map_batches(flag, batch_format="pyarrow").materialize()
    clean = flagged.map_batches(_take(False), batch_format="pyarrow")
    candidates = flagged.map_batches(_take(True), batch_format="pyarrow")

    import pyarrow.compute as pc

    # sliver-sized driver reduce with EARLY ABORT: distinct bloom-positive
    # keys per batch stream to the driver; the running per-batch-unique
    # count (an upper bound on the distinct count) aborts to the Join
    # fallback BEFORE more than the gate's worth of keys ever accumulates
    # in driver memory — the gate bounds the collection, not just the
    # broadcast
    cand_uniq = candidates.map_batches(
        lambda b: pa.table({key_col: pc.unique(b.column(key_col))}),
        batch_format="pyarrow",
    )
    chunks, running, aborted = [], 0, False
    for b in cand_uniq.iter_batches(batch_format="pyarrow"):
        if not b.num_rows:
            continue
        chunks.append(b.column(key_col))
        running += b.num_rows
        if running > _MAX_CONFIRM_BROADCAST:
            aborted = True
            break

    if not aborted:
        if not chunks:
            return clean  # no bloom hits: nothing to confirm
        cand_keys = pc.unique(pa.chunked_array(chunks).combine_chunks())
        # null keys never match a blocklist entry (SQL left_anti semantics,
        # matching the Join fallback) — exclude them from the confirm set
        # so null-key sliver rows always survive
        nonnull_keys = pc.drop_null(cand_keys)
        if len(nonnull_keys) == 0:
            return clean.union(candidates)  # all bloom hits had null keys
        # is_in requires probe and value_set types to agree; the Join
        # fallback would coerce (int32 vs int64, string vs large_string),
        # so cast the broadcast sets to each probe column's type — and on
        # an un-coercible pair, abort to the Join rather than diverge
        key_typ = nonnull_keys.type
        _ksch = keys_ds.schema()
        blk_typ = _ksch.types[_ksch.names.index(blocklist_col)]
        try:
            probe_keys = (
                nonnull_keys
                if key_typ.equals(blk_typ)
                else nonnull_keys.cast(blk_typ)
            )
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            probe_keys = None
            aborted = True

    if not aborted:
        kref = ray.put(probe_keys)

        def hist_match(batch: pa.Table) -> pa.Table:
            ks = batch.column(blocklist_col)
            m = pc.is_in(ks, value_set=ray.get(kref))
            return pa.table({blocklist_col: pc.unique(ks.filter(m))})

        mchunks = [
            b.column(blocklist_col)
            for b in keys_ds.map_batches(
                hist_match, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        confirmed = (
            pc.drop_null(pc.unique(pa.chunked_array(mchunks).combine_chunks()))
            if mchunks
            else None
        )
        if confirmed is None or len(confirmed) == 0:
            return clean.union(candidates)  # every bloom hit was a false positive
        # confirmed values are images of key_col values, so the cast back
        # to the probe side's type is lossless
        if not confirmed.type.equals(key_typ):
            confirmed = confirmed.cast(key_typ)
        cref = ray.put(confirmed)

        def keep_unconfirmed(batch: pa.Table) -> pa.Table:
            # is_in(null, non-null set) = false → invert keeps null-key rows
            m = pc.is_in(batch.column(key_col), value_set=ray.get(cref))
            return batch.filter(pc.invert(m))

        verified = candidates.map_batches(
            keep_unconfirmed, batch_format="pyarrow"
        )
        return clean.union(verified)

    # candidates is filter-derived (0-row blocks where a block had no bloom
    # hits) — compact so the join's schema broadcast can't be lost (blocks.py)
    verified = compact_blocks(candidates).join(
        keys_ds.select_columns([blocklist_col]),
        join_type="left_anti",
        num_partitions=num_partitions,
        on=(key_col,),
        right_on=(blocklist_col,),
    )
    return clean.union(verified)


# --------------------------------------------------------------------------
# per-group quantile filter, per-key cap
# --------------------------------------------------------------------------

def group_quantile_filter(
    ds, group_col: str, value_col: str, q: float, keep: str = "ge"
):
    """Keep rows whose ``value_col`` is ≥ (``keep="ge"``, top slice) or ≤
    (``keep="le"``, bottom slice) the per-group q-quantile
    (``quantile_disc`` semantics: the value at 1-based position
    ``ceil(q·n)`` of the sorted group).

    Scale shape: per-(group, value) COUNT histograms are pre-combined per
    batch, merged in one small groupby (size = groups × distinct values —
    bounded for integer quality scores/lengths, documented assumption),
    thresholds derived on the driver from the histogram (never the rows) and
    broadcast into a single filter pass."""
    import math

    import ray
    from collections import Counter

    from ray.data.aggregate import Sum

    if keep not in ("ge", "le"):
        raise ValueError(f"keep must be 'ge' or 'le', got {keep!r}")

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter(
            zip(batch.column(group_col).to_pylist(), batch.column(value_col).to_pylist())
        )
        gs, vs, ns = [], [], []
        for (g, v), n in counts.items():
            gs.append(g)
            vs.append(v)
            ns.append(n)
        return pa.table(
            {
                group_col: pa.array(gs, batch.column(group_col).type),
                value_col: pa.array(vs, batch.column(value_col).type),
                "n_partial": pa.array(ns, pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, value_col])
        .aggregate(Sum("n_partial", alias_name="n"))
        .take_all()
    )
    by_group: dict = {}
    for r in hist:
        by_group.setdefault(r[group_col], []).append((r[value_col], r["n"]))
    thresholds = {}
    for g, pairs in by_group.items():
        pairs.sort()
        total = sum(n for _, n in pairs)
        target = math.ceil(q * total)
        cum = 0
        for v, n in pairs:
            cum += n
            if cum >= target:
                thresholds[g] = v
                break
    tref = ray.put(thresholds)

    def keep_rows(batch: pa.Table) -> pa.Table:
        th = ray.get(tref)
        groups = batch.column(group_col).to_pylist()
        vals = batch.column(value_col).to_pylist()
        if keep == "ge":
            mask = [v >= th[g] for g, v in zip(groups, vals)]
        else:
            mask = [v <= th[g] for g, v in zip(groups, vals)]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep_rows, batch_format="pyarrow")


def per_key_cap(ds, key_col: str, id_col: str, cap: int):
    """At most ``cap`` rows per key, keeping the smallest ids (the
    domain-cap / source-cap operator). Collect-truncate aggregate: the
    accumulator never holds more than ``cap`` ids, so the shuffle carries
    ≤cap ids per (block, key) — a hot key cannot explode the exchange.
    Output: (key, id) rows of the survivors."""
    from ray.data.aggregate import AggregateFn

    def _cap_ids(ids: list) -> list:
        if ids and not isinstance(ids[0], int):
            raise TypeError("per_key_cap ids must be int64 (explode emits int64)")
        return sorted(ids)[:cap]

    collect = AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: _cap_ids(a + b),
        name="kept",
        accumulate_block=lambda acc, block: _cap_ids(
            acc + block.column(id_col).to_pylist()
        ),
    )
    per_key = ds.groupby(key_col).aggregate(collect)

    def explode(batch: pa.Table) -> pa.Table:
        keys, ids = [], []
        for k, kept in zip(
            batch.column(key_col).to_pylist(), batch.column("kept").to_pylist()
        ):
            for i in kept:
                keys.append(k)
                ids.append(i)
        return pa.table(
            {
                key_col: pa.array(keys, batch.column(key_col).type),
                id_col: pa.array(ids, pa.int64()),
            }
        )

    return per_key.map_batches(explode, batch_format="pyarrow")


def per_group_weighted_sample(
    ds, group_col: str, id_col: str, weight_col: str, k: int, seed: int = 7
):
    """Deterministic weighted sample without replacement (Efraimidis–Spirakis
    exponential clocks): per group, the ``k`` rows with the smallest
    ``-ln(u)/w`` win, where ``u`` is the seeded md5-uniform of the id and
    ``w`` the row weight — each row is selected with probability ∝ weight.
    This is the data-mixing primitive (sample docs ∝ length / source weight)
    a training pipeline runs before packing.

    Scale shape: same collect-truncate accumulator as
    :func:`per_group_sample` — the shuffle carries ≤k (key, id) int pairs per
    (block, group). Keys are encoded as the IEEE-754 bit pattern of the
    positive double (order-preserving as int64, Arrow-encodable, and
    bit-reproducible by the SQL oracle up to libm ulp noise that only
    matters on exact key ties, which the md5 uniform makes negligible).

    Weights must be > 0 (raises on violation — a silent skip would bias the
    sample)."""
    import hashlib as _hl
    import math as _math
    import struct as _struct

    from ray.data.aggregate import AggregateFn

    def _key(vid, w) -> tuple:
        if not isinstance(vid, int):
            raise TypeError(
                f"per_group_weighted_sample ids must be int, got {type(vid).__name__}"
            )
        if not w or w <= 0:
            raise ValueError(f"weight must be > 0, got {w!r} for id {vid}")
        h = int(_hl.md5(f"{vid}:{seed}".encode()).hexdigest()[:16], 16)
        u = (h + 1) / 18446744073709551616.0
        clock = -_math.log(u) / w
        bits = _struct.unpack("<q", _struct.pack("<d", clock))[0]
        return (bits, vid)

    def _cap(items: list) -> list:
        return sorted(items)[:k]

    def _acc_block(acc, block):
        ids = block.column(id_col).to_pylist()
        ws = block.column(weight_col).to_pylist()
        return _cap(acc + [_key(v, w) for v, w in zip(ids, ws)])

    collect = AggregateFn(
        init=lambda g: [],
        merge=lambda a, b: _cap(a + b),
        name="sampled",
        accumulate_block=_acc_block,
    )
    per_group = ds.groupby(group_col).aggregate(collect)

    def explode(batch: pa.Table) -> pa.Table:
        groups, ids = [], []
        for g, kept in zip(
            batch.column(group_col).to_pylist(), batch.column("sampled").to_pylist()
        ):
            for _, vid in kept:
                groups.append(g)
                ids.append(int(vid))
        return pa.table(
            {
                group_col: pa.array(groups, batch.column(group_col).type),
                id_col: pa.array(ids, pa.int64()),
            }
        )

    return per_group.map_batches(explode, batch_format="pyarrow")


def per_group_sample(ds, group_col: str, id_col: str, k: int, seed: int = 7):
    """Deterministic reservoir-style sample: the ``k`` rows with the smallest
    ``md5(id:seed)`` per group — the distributed equivalent of a seeded
    uniform without-replacement sample per stratum, reproducible at any
    parallelism. Collect-truncate accumulator: the shuffle carries ≤k
    (hash, id) pairs per (block, group). Output: (group, id)."""
    import hashlib as _hl

    from ray.data.aggregate import AggregateFn

    def _key(v) -> str:
        # ids must be integers: the zero-padded suffix is the deterministic
        # tie-break that matches the SQL oracle's ORDER BY md5, id (20 digits
        # covers the full int64 range)
        if not isinstance(v, int):
            raise TypeError(f"per_group_sample ids must be int, got {type(v).__name__}")
        return f"{_hl.md5(f'{v}:{seed}'.encode()).hexdigest()}\x1f{v:020d}"

    def _cap(items: list) -> list:
        return sorted(items)[:k]

    collect = AggregateFn(
        init=lambda g: [],
        merge=lambda a, b: _cap(a + b),
        name="sampled",
        accumulate_block=lambda acc, block: _cap(
            acc + [_key(v) for v in block.column(id_col).to_pylist()]
        ),
    )
    per_group = ds.groupby(group_col).aggregate(collect)

    def explode(batch: pa.Table) -> pa.Table:
        groups, ids = [], []
        for g, kept in zip(
            batch.column(group_col).to_pylist(), batch.column("sampled").to_pylist()
        ):
            for enc in kept:
                groups.append(g)
                ids.append(int(enc.rsplit("\x1f", 1)[1]))
        return pa.table(
            {
                group_col: pa.array(groups, batch.column(group_col).type),
                id_col: pa.array(ids, pa.int64()),
            }
        )

    return per_group.map_batches(explode, batch_format="pyarrow")


def contamination_flags(
    ds,
    bench_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 5,
):
    """Benchmark DECONTAMINATION: flag corpus documents sharing any word
    ``ngram``-gram with a benchmark/eval set — the standard pre-training
    hygiene pass (eval contamination check).

    Scale shape: the benchmark side is small by nature (eval sets are KBs to
    MBs while the corpus is TBs), so its distinct n-gram HASHES are built
    distributed (per-batch partial sets, driver union — gram-count-sized)
    and broadcast ONCE via ``ray.put``; the corpus pass is an
    embarrassingly-parallel flag map. No shuffle touches corpus rows.
    Output: (id, contaminated: bool) for every corpus row.
    """
    import hashlib as _hl

    import ray

    def _grams(text: str) -> set:
        words = (text or "").split()
        return {
            " ".join(words[i : i + ngram]) for i in range(len(words) - ngram + 1)
        }

    def _hash(g: str) -> int:
        return int.from_bytes(
            _hl.md5(g.encode("utf-8")).digest()[:8], "big", signed=False
        )

    def bench_partial(batch: pa.Table) -> pa.Table:
        hs: set = set()
        for t in batch.column(text_col).to_pylist():
            hs.update(_hash(g) for g in _grams(t))
        return pa.table(
            {"h": pa.array(sorted(hs), pa.uint64())}
        )

    bench_hashes: set = set()
    for row in bench_ds.map_batches(bench_partial, batch_format="pyarrow").take_all():
        bench_hashes.add(row["h"])
    bref = ray.put(frozenset(bench_hashes))

    def flag(batch: pa.Table) -> pa.Table:
        bh = ray.get(bref)
        out = []
        for t in batch.column(text_col).to_pylist():
            out.append(any(_hash(g) in bh for g in _grams(t)))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "contaminated": pa.array(out, pa.bool_()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Cross-document shared-chunk duplicate pairs
# --------------------------------------------------------------------------

def chunk_dup_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 50,
    stride: int = 40,
    max_bucket: int = 2000,
):
    """Document pairs that share at least one IDENTICAL context-window chunk
    (:func:`chunk_documents` windows, md5 fingerprint per chunk) — the
    chunk-granular exact-duplicate detector that catches boilerplate blocks
    and partial copies whole-document hashing misses.

    Distributed shape: explode to (fp, doc) rows with per-batch local
    distinct (a doc repeating a chunk contributes one row), then the same
    sort + run-adjacency + boundary-reconciliation pair generator the LSH
    dedups use (``dedup.sorted_bucket_pairs`` — no per-group aggregate
    machinery, truncation counted and warned), then exact distinct pairs
    (``dedup._distinct_pairs``: vectorized local dedupe before one small
    groupby). Nothing corpus-sized reaches the driver.
    """
    import hashlib

    from vigil_ray.stages.dedup import _distinct_pairs, sorted_bucket_pairs

    chunks = chunk_documents(
        ds, id_col=id_col, text_col=text_col, chunk_words=chunk_words, stride=stride
    )

    def fps(batch: pa.Table) -> pa.Table:
        seen = set()
        out_fp: List[str] = []
        out_id: List[int] = []
        for d, t in zip(
            batch.column(id_col).to_pylist(),
            batch.column("chunk_text").to_pylist(),
        ):
            fp = hashlib.md5(t.encode("utf-8")).hexdigest()
            if (fp, d) not in seen:
                seen.add((fp, d))
                out_fp.append(fp)
                out_id.append(d)
        return pa.table(
            {
                "fp": pa.array(out_fp, pa.string()),
                id_col: pa.array(out_id, pa.int64()),
            }
        )

    rows = chunks.map_batches(fps, batch_format="pyarrow")

    from vigil_ray.stages.dedup import all_member_pairs

    cand = sorted_bucket_pairs(
        rows, ["fp"], [id_col], all_member_pairs, max_bucket, "chunk_dup_pairs"
    )
    return _distinct_pairs(cand)


# --------------------------------------------------------------------------
# Token-budget selection
# --------------------------------------------------------------------------

def token_budget_select(ds, id_col: str, score_col: str, cost_col: str, budget: int):
    """Quality-ordered corpus selection under a global token budget: take
    rows in ``score_col`` DESC (ties by ``id_col``) order while the running
    ``cost_col`` total stays ≤ ``budget`` — the "best N tokens" selection
    every fixed-budget training run makes.

    Distributed shape: one :func:`prefix_scan` (global sort on the negated
    score + two pinned passes with a block-offset barrier) then an
    embarrassingly-parallel filter on the inclusive running sum. The sum
    stays integer-exact for integer costs (a 100-TB token budget exceeds
    2^53). Output ``(id, cost, cum_tokens)`` — exactly the SQL window
    ``sum(cost) OVER (ORDER BY score DESC, id) <= budget``.
    """

    def neg(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "_neg_score", pc.negate(batch.column(score_col))
        )

    scanned = prefix_scan(
        ds.map_batches(neg, batch_format="pyarrow"),
        ["_neg_score", id_col],
        cost_col=cost_col,
    )

    def finish(batch: pa.Table) -> pa.Table:
        cost = batch.column(cost_col).combine_chunks().to_numpy(zero_copy_only=False)
        cum = (
            batch.column("cum_excl").combine_chunks().to_numpy(zero_copy_only=False)
            + cost
        )
        keep = cum <= budget
        return pa.table(
            {
                id_col: pa.array(
                    batch.column(id_col)
                    .combine_chunks()
                    .to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                cost_col: pa.array(cost[keep], pa.int64()),
                "cum_tokens": pa.array(cum[keep], pa.int64()),
            }
        )

    return scanned.map_batches(finish, batch_format="pyarrow")


# k-gram string → 32-bit fingerprint hash memo (Zipf-bounded like the other
# kernel memos; the md5 prefix matches the DuckDB '0x'||substr(md5(),1,8)
# idiom used by every hash-coupled oracle in this repo).
_WINNOW_MEMO: dict = {}
_WINNOW_MEMO_CAP = 1_000_000


def _winnow_hash(gram: str) -> int:
    h = _WINNOW_MEMO.get(gram)
    if h is None:
        import hashlib

        h = int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:8], 16)
        if len(_WINNOW_MEMO) < _WINNOW_MEMO_CAP:
            _WINNOW_MEMO[gram] = h
    return h


def winnow_fingerprints(
    ds,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct: bool = False,
):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
    SIGMOD — the MOSS algorithm) over word ``k``-grams: hash every k-gram,
    slide a window of ``w`` consecutive hashes, and select each window's
    RIGHTMOST minimum. The guarantee: any shared run of ≥ w+k−1 words
    between two documents shares at least one selected fingerprint.

    Selection is computed by the closed form ``L_p + R_p ≥ w−1`` where
    ``L_p`` counts consecutive predecessors with ``h ≥ h_p`` and ``R_p``
    consecutive successors with ``h > h_p`` (both capped at ``w−1``;
    the strict/non-strict split encodes the rightmost tie-break) —
    equivalent to enumerating every window (pinned by a brute-force
    hypothesis differential in tests/test_corpus.py), but one vectorized
    pass per document instead of O(g·w).

    Ray shape: a pure ``map_batches`` — no shuffle, no state; k-gram
    hashes come from a per-worker Zipf-capped md5 memo. Docs with fewer
    than ``w`` k-gram positions (no full window) emit nothing, exactly as
    the classic algorithm. Output: one row per selected (doc, position):
    ``(doc_id, pos, fp_hash)`` — or, with ``distinct=True``, one row per
    unique (doc, fp_hash) with ``pos`` = the smallest selected position.
    The dedup happens AT EMISSION, per document inside the map (a
    downstream block-local dedup would be unsound: Ray re-batches map
    inputs at ``batch_size`` boundaries, so one document's rows can
    straddle two batches)."""

    def fingerprints(batch: pa.Table) -> pa.Table:
        out_ids, out_pos, out_fp = [], [], []
        for did, text in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            words = (text or "").split()
            g = len(words) - k + 1
            if g < w:
                continue
            h = np.fromiter(
                (
                    _winnow_hash(" ".join(words[p : p + k]))
                    for p in range(g)
                ),
                dtype=np.int64,
                count=g,
            )
            # L: consecutive predecessors ≥ h_p; R: consecutive successors
            # > h_p — chained shifted comparisons, each capped at w−1
            L = np.zeros(g, dtype=np.int64)
            run = np.ones(g, dtype=bool)
            for j in range(1, w):
                cmp = np.zeros(g, dtype=bool)
                cmp[j:] = h[:-j] >= h[j:]
                run &= cmp
                L += run
            R = np.zeros(g, dtype=np.int64)
            run = np.ones(g, dtype=bool)
            for j in range(1, w):
                cmp = np.zeros(g, dtype=bool)
                cmp[:-j] = h[j:] > h[:-j]
                run &= cmp
                R += run
            sel = np.flatnonzero(L + R >= w - 1)
            if distinct:
                # first (smallest) selected position per unique hash —
                # np.unique returns the first occurrence index of each value
                # in the sorted-unique order
                _, first = np.unique(h[sel], return_index=True)
                sel = sel[np.sort(first)]
            out_ids.extend([int(did)] * len(sel))
            out_pos.extend(sel.tolist())
            out_fp.extend(h[sel].tolist())
        return pa.table(
            {
                id_col: pa.array(out_ids, pa.int64()),
                "pos": pa.array(out_pos, pa.int64()),
                "fp_hash": pa.array(out_fp, pa.int64()),
            }
        )

    return ds.map_batches(fingerprints, batch_format="pyarrow")


def winnow_match_pairs(
    ds,
    k: int = 3,
    w: int = 4,
    max_share: int = 10,
    max_bucket: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Cross-document matches from winnowing fingerprints — the second half
    of the MOSS pipeline: documents sharing selected fingerprints, ranked by
    how many DISTINCT fingerprints they share. Fingerprints selected in more
    than ``max_share`` documents are excluded whole (MOSS's own
    over-shared/boilerplate rule — template n-grams carry no plagiarism
    signal and would pair the entire corpus).

    Exactness of the exclusion under the block pre-cap: bucket members are
    already distinct docs (the (doc, fp) dedup below), so a bucket pre-capped
    to ``max_bucket`` members still has > ``max_share`` members whenever its
    TRUE size does (any ``max_bucket`` > ``max_share``) — the
    len-check excludes it correctly without ever seeing the full bucket.

    Ray shape: winnow map with at-emission (doc, fp) dedup (``distinct=True``
    — per document inside the map, sound under Ray's input re-batching) →
    ``sorted_bucket_pairs`` keyed on fp_hash (pair explosion bounded by
    max_share²/2 per bucket) → ``sorted_group_sum`` over the pair key (a
    hash-aggregate groupby paid ~25 µs of machinery per group — 5 s over
    the 198k distinct pairs at sf0.1; the sorted-adjacency reduceat form
    is the repo's standard replacement).
    Output: (a, b, n_shared) with a < b."""
    from vigil_ray.stages.dedup import all_member_pairs, sorted_bucket_pairs

    distinct = winnow_fingerprints(
        ds, k=k, w=w, id_col=id_col, text_col=text_col, distinct=True
    )

    def bounded_pairs(members: list) -> list:
        if len(members) > max_share:
            return []
        return all_member_pairs(members)

    pairs = sorted_bucket_pairs(
        distinct,
        ["fp_hash"],
        [id_col],
        bounded_pairs,
        max_bucket,
        "winnow_match_pairs",
    )

    def weight_one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n_shared", pa.array(np.ones(batch.num_rows, dtype=np.int64))
        )

    return sorted_group_sum(
        pairs.map_batches(weight_one, batch_format="pyarrow"),
        ["a", "b"],
        ["n_shared"],
    )
