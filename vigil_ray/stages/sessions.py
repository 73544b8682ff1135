"""Gap-based sessionization over the events log (streaming-shaped operator).

Ray Data has no event-time windows (SURVEY.md §2.8): the idiomatic expression
is to treat events as a partitioned log keyed by ``user_id``. The r3 form
runs on ONE global sort + a fragment-merge monoid — NO worker, aggregate, or
collected list ever holds a user's full history (the earlier collect-list
form assumed one user's history fits one aggregated row; this one has no
per-key state at all — driver state is O(blocks)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sessionize(ds, gap_minutes: int = 30):
    """→ (user_id, n_sessions, n_events, max_session_events).

    One global sort by (user_id, ts) pins each user's events contiguous;
    every block computes its runs' session segments VECTORIZED (a session
    starts at each run start and wherever the in-run gap exceeds the
    threshold). Interior runs — users entirely inside one block — emit
    final rows directly. Only each block's FIRST and LAST run defer a
    constant-size fragment ``(k sessions, n events, max, head len, tail
    len, first/last ts)`` to the driver, which folds adjacent fragments
    with the session-merge monoid: when the cross-boundary gap ≤ threshold
    the left tail session and right head session coalesce
    (``k₁+k₂−1``, ``max(m₁, m₂, tail₁+head₂)``). ≤2 fragments per block.

    Degenerate-tie caveat: fragments fold in (first_ts, last_ts) order;
    identical timestamps spanning 3+ blocks fold in arbitrary order among
    the ties, which is still correct because a 0 gap always merges.
    """
    import ray.data as rd

    from vigil_ray.stages.blocks import coalesce_blocks, compact_blocks
    from vigil_ray.stages.runs import run_starts as _run_starts_impl

    gap_us = gap_minutes * 60_000_000

    def to_us(batch: pa.Table) -> pa.Table:
        # normalize to microsecond int64 (a raw pandas datetime64[ns]
        # .astype(int64) would silently be nanoseconds)
        ts = pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": batch.column("user_id"), "ts_us": ts})

    base = ds.map_batches(to_us, batch_format="pyarrow")
    ds_sorted = compact_blocks(coalesce_blocks(base).sort(["user_id", "ts_us"]))

    def block_stats(batch: pa.Table) -> pa.Table:
        utype = batch.column("user_id").type
        if batch.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.nulls(0, utype),
                    "k": pa.nulls(0, pa.int64()),
                    "ne": pa.nulls(0, pa.int64()),
                    "mx": pa.nulls(0, pa.int64()),
                    "head": pa.nulls(0, pa.int64()),
                    "tail": pa.nulls(0, pa.int64()),
                    "first_ts": pa.nulls(0, pa.int64()),
                    "last_ts": pa.nulls(0, pa.int64()),
                    "is_frag": pa.nulls(0, pa.bool_()),
                }
            )
        ts = batch.column("ts_us").combine_chunks().to_numpy(zero_copy_only=False)
        n = batch.num_rows
        starts = _run_starts_impl(batch, ["user_id"])
        sess_start = np.empty(n, dtype=bool)
        sess_start[0] = True
        sess_start[1:] = (ts[1:] - ts[:-1]) > gap_us
        sess_start[starts] = True  # a new user always starts a session
        sess_starts = np.flatnonzero(sess_start)
        seg_len = np.diff(np.append(sess_starts, n))
        seg_run = np.searchsorted(starts, sess_starts, side="right") - 1
        nruns = len(starts)
        run_seg_first = np.searchsorted(seg_run, np.arange(nruns), side="left")
        k = np.diff(np.append(run_seg_first, len(sess_starts)))
        mx = np.maximum.reduceat(seg_len, run_seg_first)
        ne = np.diff(np.append(starts, n))
        head = seg_len[run_seg_first]
        tail = seg_len[np.append(run_seg_first[1:], len(seg_len)) - 1]
        is_frag = np.zeros(nruns, dtype=bool)
        is_frag[0] = True
        is_frag[-1] = True
        return pa.table(
            {
                "user_id": batch.column("user_id").take(
                    pa.array(starts, pa.int64())
                ),
                "k": pa.array(k, pa.int64()),
                "ne": pa.array(ne, pa.int64()),
                "mx": pa.array(mx, pa.int64()),
                "head": pa.array(head, pa.int64()),
                "tail": pa.array(tail, pa.int64()),
                "first_ts": pa.array(ts[starts], pa.int64()),
                "last_ts": pa.array(ts[np.append(starts[1:], n) - 1], pa.int64()),
                "is_frag": pa.array(is_frag),
            }
        )

    stats = ds_sorted.map_batches(
        block_stats, batch_format="pyarrow", batch_size=None
    ).materialize()  # one row per user-run: output-sized, computed once
    if stats.schema() is None:  # fully empty input
        return stats

    frags = stats.map_batches(
        lambda b: b.filter(b.column("is_frag")), batch_format="pyarrow"
    ).take_all()
    frags.sort(key=lambda r: (r["user_id"], r["first_ts"], r["last_ts"]))

    merged: list = []
    for f in frags:
        if merged and merged[-1]["user_id"] == f["user_id"]:
            p = merged[-1]
            if f["first_ts"] - p["last_ts"] <= gap_us:  # sessions coalesce
                joint = p["tail"] + f["head"]
                p["head"] = p["head"] if p["k"] > 1 else p["head"] + f["head"]
                p["tail"] = f["tail"] if f["k"] > 1 else p["tail"] + f["tail"]
                p["k"] = p["k"] + f["k"] - 1
                p["mx"] = max(p["mx"], f["mx"], joint)
            else:
                p["k"] += f["k"]
                p["tail"] = f["tail"]
                p["mx"] = max(p["mx"], f["mx"])
            p["ne"] += f["ne"]
            p["last_ts"] = f["last_ts"]
        else:
            merged.append(dict(f))

    utype = stats.schema().types[stats.schema().names.index("user_id")]
    boundary_tbl = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([m["user_id"] for m in merged], utype),
                "n_sessions": pa.array([m["k"] for m in merged], pa.int64()),
                "n_events": pa.array([m["ne"] for m in merged], pa.int64()),
                "max_session_events": pa.array(
                    [m["mx"] for m in merged], pa.int64()
                ),
            }
        )
    )

    def interior(batch: pa.Table) -> pa.Table:
        keep = pc.invert(batch.column("is_frag"))
        t = batch.filter(keep)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "n_sessions": t.column("k"),
                "n_events": t.column("ne"),
                "max_session_events": t.column("mx"),
            }
        )

    return boundary_tbl.union(
        stats.map_batches(interior, batch_format="pyarrow")
    )


def funnel_counts(ds, stages_types, user_col: str = "user_id", ts_col: str = "ts"):
    """Ordered funnel (sequential-pattern operator): how many users performed
    stage 1, then stage 2 strictly after their first stage-1 event, then
    stage 3 strictly after that, ... Per-user event histories are gathered
    with the collect-list aggregate (bounded by one user's history — the
    sessionize assumption) and each user's stage times resolve in one
    vectorized pass; global counts are partial sums. Returns a
    (stage, n_users) table in funnel order."""
    import pyarrow.compute as pc
    from ray.data.aggregate import AggregateFn, Sum

    type_code = {t: i for i, t in enumerate(stages_types)}

    def _pairs(block) -> list:
        ts = pc.cast(pc.cast(block.column(ts_col), pa.timestamp("us")), pa.int64())
        return [
            (t, type_code[e])
            for t, e in zip(ts.to_pylist(), block.column("event_type").to_pylist())
            if e in type_code
        ]

    collect = AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: a + b,
        name="evs",
        accumulate_block=lambda acc, block: acc + _pairs(block),
    )
    per_user = ds.groupby(user_col).aggregate(collect)
    n_stages = len(stages_types)

    def partial(batch: pa.Table) -> pa.Table:
        reached = [0] * n_stages
        for evs in batch.column("evs").to_pylist():
            by_code: dict = {}
            for t, c in (tuple(e) for e in evs):
                by_code.setdefault(c, []).append(t)
            cutoff = -1
            for s in range(n_stages):
                nxt = [t for t in by_code.get(s, ()) if t > cutoff]
                if not nxt:
                    break
                cutoff = min(nxt)
                reached[s] += 1
        return pa.table(
            {
                f"s{i}": pa.array([reached[i]], pa.int64())
                for i in range(n_stages)
            }
        )

    agg = per_user.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(f"s{i}", alias_name=f"s{i}") for i in range(n_stages)]
    )
    return pa.table(
        {
            "stage": pa.array(list(stages_types), pa.string()),
            "n_users": pa.array(
                [int(agg[f"s{i}"] or 0) for i in range(n_stages)], pa.int64()
            ),
        }
    )
