"""Event-time streaming windows with a watermark (custom-operator class).

A batch replay of the streaming-engine contract: events arrive in a defined
ARRIVAL order (here the synthetic stream order ``event_id``) with
out-of-order EVENT times; the watermark trails the maximum event-time seen
so far by ``lateness``; an event whose time is older than the watermark *at
its arrival* is dropped as late; accepted events aggregate into tumbling
event-time windows.

Distributed shape: the watermark is exactly an EXCLUSIVE RUNNING MAX of
event-time in arrival order — :func:`vigil_ray.stages.corpus.prefix_scan`
(op="max", two-phase block scan) computes it for every event without any
sequential actor; the lateness filter and the window aggregation are then
ordinary vectorized batch ops. The semantics are byte-equivalent to a
single-pass stateful stream consumer, but the computation parallelizes over
blocks — the shape a 100-TB replay/backfill needs (a true low-latency
ingest would swap the scan for a per-partition stateful actor holding only
its running max; the downstream stages are unchanged).

No reference analog; SQL oracle: ``max(ts) OVER (ORDER BY arrival ROWS
UNBOUNDED PRECEDING AND 1 PRECEDING)`` + a lateness predicate + time_bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

US_PER_MIN = 60_000_000


def watermark_windows(
    ds,
    ts_col: str = "ts",
    arrival_cols=("event_id",),
    key_col: str = "event_type",
    window_minutes: int = 60,
    lateness_minutes: int = 30,
):
    """Tumbling ``window_minutes`` event-time counts per ``key_col`` over the
    watermark-accepted events. ``arrival_cols`` defines the (unique) stream
    arrival order — pass a jittered/transport-delay column to model
    out-of-order delivery. Returns (key, window_start, n)."""
    from ray.data.aggregate import Sum

    from vigil_ray.stages.corpus import prefix_scan

    arrival_cols = list(arrival_cols)

    def to_us(batch: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")), pa.int64())
        cols = {c: batch.column(c) for c in arrival_cols}
        cols[key_col] = batch.column(key_col)
        cols["ts_us"] = ts
        return pa.table(cols)

    scanned = prefix_scan(
        ds.map_batches(to_us, batch_format="pyarrow"),
        arrival_cols,
        cost_col="ts_us",
        op="max",
    )

    late_us = lateness_minutes * US_PER_MIN
    win_us = window_minutes * US_PER_MIN

    def accept_and_window(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ts = batch.column("ts_us").combine_chunks().to_numpy(zero_copy_only=False)
        wm = batch.column("cum_excl").combine_chunks().to_numpy(zero_copy_only=False)
        # late iff a watermark exists (any prior event) and ts < wm - lateness
        ok = ~(np.isfinite(wm) & (ts.astype(np.float64) < wm - late_us))
        keys = batch.column(key_col).to_pylist()
        win = (ts // win_us) * win_us
        counts: Counter = Counter(
            (k, int(w)) for k, w, a in zip(keys, win, ok) if a
        )
        ks, ws, ns = [], [], []
        for (k, w), n in counts.items():
            ks.append(k)
            ws.append(w)
            ns.append(n)
        return pa.table(
            {
                key_col: pa.array(ks, pa.string()),
                "win_us": pa.array(ws, pa.int64()),
                "n_partial": pa.array(ns, pa.int64()),
            }
        )

    agg = (
        scanned.map_batches(accept_and_window, batch_format="pyarrow")
        .groupby([key_col, "win_us"])
        .aggregate(Sum("n_partial", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch.column(key_col),
                "window_start": pc.cast(
                    batch.column("win_us"), pa.timestamp("us")
                ),
                "n": batch.column("n"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def late_event_stats(
    ds,
    ts_col: str = "ts",
    arrival_cols=("event_id",),
    lateness_minutes: int = 30,
):
    """One-row (n_total, n_late) summary of the same watermark pass — the
    operational metric a streaming job exports."""
    from ray.data.aggregate import Sum

    from vigil_ray.stages.corpus import prefix_scan

    arrival_cols = list(arrival_cols)

    def to_us(batch: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")), pa.int64())
        cols = {c: batch.column(c) for c in arrival_cols}
        cols["ts_us"] = ts
        return pa.table(cols)

    scanned = prefix_scan(
        ds.map_batches(to_us, batch_format="pyarrow"),
        arrival_cols,
        cost_col="ts_us",
        op="max",
    )
    late_us = lateness_minutes * US_PER_MIN

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts_us").combine_chunks().to_numpy(zero_copy_only=False)
        wm = batch.column("cum_excl").combine_chunks().to_numpy(zero_copy_only=False)
        late = np.isfinite(wm) & (ts.astype(np.float64) < wm - late_us)
        return pa.table(
            {
                "n_total": pa.array([batch.num_rows], pa.int64()),
                "n_late": pa.array([int(late.sum())], pa.int64()),
            }
        )

    return scanned.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n_total", alias_name="n_total"), Sum("n_late", alias_name="n_late")
    )
