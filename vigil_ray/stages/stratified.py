"""Language-stratified aggregation with salted keys (skew handling).

Web corpora are heavily skewed by language (~half the corpus is one
language): a bare ``groupby("lang")`` sends the hot key's every row to one
reducer. The salted pattern here (north_rule requirement):

1. ``map_batches`` appends ``salt = hash(url) % n_salts`` and emits partial
   aggregates per ``(lang, salt)`` — n_salts× more keys, each ~1/n_salts of
   the hot key's volume;
2. ``groupby(lang, salt)`` reduces the partials (the skew-prone exchange,
   now balanced);
3. a final tiny ``groupby(lang)`` merges the salted partials.

For count/sum-shaped aggregates the partial pre-aggregation already collapses
volume, so salting matters when the per-group *work* is heavy (map_groups) —
the same two-phase shape applies; this module demonstrates it on the
numeric-stats case end-to-end.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from ray.data.aggregate import Sum


def stratified_lang_stats(
    ds,
    lang_col: str = "lang",
    value_col: str = "n_words",
    key_col: str = "url",
    n_salts: int = 8,
):
    """Per-language doc count + value sum via salted two-phase aggregation.

    Output: (lang, n_docs, sum_{value_col}) — deterministic (crc32 salt).
    """

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column(lang_col).to_pylist()
        keys = batch.column(key_col).to_pylist()
        values = batch.column(value_col).to_pylist()
        acc: dict = {}
        for lang, key, val in zip(langs, keys, values):
            salt = zlib.crc32(str(key).encode("utf-8")) % n_salts
            slot = (lang, salt)
            cur = acc.get(slot)
            if cur is None:
                acc[slot] = [1, val or 0]
            else:
                cur[0] += 1
                cur[1] += val or 0
        slots = sorted(acc)
        return pa.table(
            {
                lang_col: pa.array([s[0] for s in slots], pa.string()),
                "salt": pa.array([s[1] for s in slots], pa.int32()),
                "n_partial": pa.array([acc[s][0] for s in slots], pa.int64()),
                "sum_partial": pa.array([acc[s][1] for s in slots], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    salted = partials.groupby([lang_col, "salt"]).aggregate(
        Sum("n_partial", alias_name="n_salted"),
        Sum("sum_partial", alias_name="sum_salted"),
    )
    return salted.groupby(lang_col).aggregate(
        Sum("n_salted", alias_name="n_docs"),
        Sum("sum_salted", alias_name="sum_n_words"),
    )


def confidence_histogram(ds, conf_col: str = "confianca"):
    """A4 (reference scripts/analyze_errors.py:98-116): fixed-bin confidence
    histogram [0,.5,.6,.7,.8,.9,1.0] over PII-positive documents, computed as
    per-batch partial bin counts → global sum."""
    edges = (0.0, 0.5, 0.6, 0.7, 0.8, 0.9)

    def partial(batch: pa.Table) -> pa.Table:
        counts = [0] * len(edges)
        flags = batch.column("contem_pii").to_pylist()
        confs = batch.column(conf_col).to_pylist()
        for has, c in zip(flags, confs):
            if not has:
                continue
            for b in range(len(edges) - 1, -1, -1):
                if c >= edges[b]:
                    counts[b] += 1
                    break
        return pa.table(
            {
                "bin_low": pa.array(list(edges), pa.float64()),
                "n_partial": pa.array(counts, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("bin_low").aggregate(Sum("n_partial", alias_name="n"))
