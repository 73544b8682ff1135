"""Corpus-trained n-gram language-model stages.

The reference scores documents with a FIXED char-level LM
(`/root/reference/src/perplexity.py` analog lives in
:mod:`vigil_ray.kernel.perplexity`); these stages add the other half of a
KenLM-style workflow — TRAIN the model on the corpus itself, distributed,
then score every document under it:

* :func:`bigram_counts` — the "training" pass: global (w1, w2) → n12 and
  w → n1 count tables as *Datasets* (the model parameters stay distributed;
  at web scale an n-gram table is itself corpus-sized and must never be
  collected to the driver or broadcast whole — the same rule the tf-idf df
  join follows).
* :func:`corpus_bigram_ppl` — score each document with add-one-smoothed
  bigram perplexity by hash-JOINING the per-doc bigram rows against the
  count tables (two key-key joins), then a per-doc ``sorted_group_sum``.
* :func:`bigram_pmi_topk` — top-k collocations by pointwise mutual
  information over the same count tables.

All log-costs are quantized to integer micro-nats (``floor(x*1e6 + 0.5)``)
before summing, so the per-doc sums are integer-EXACT and independent of
accumulation order — the property that lets a DuckDB oracle reproduce the
engine's numbers bit-for-bit (CLAUDE.md: float sums are order-sensitive;
the int path is what a budget/score pipeline needs).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa


def _join_partitions() -> int:
    """Hash-join partition count sized to the session: each join operator
    runs a pool of shuffle-aggregator actors, and TWO chained joins with
    partition pools that each want every CPU deadlock a small session the
    same way two fixed actor pools do (CLAUDE.md; observed: 2×16-partition
    joins hang at num_cpus=4). Half the CPUs per join lets both pipeline."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus // 2)


def _doc_bigram_rows(ds, id_col: str, text_col: str):
    """Per-document bigram counts: one row per (doc, w1, w2) with its
    in-doc count ``c`` — the exploded table both the global count aggregate
    and the scoring join consume. Tokenization = lowercase whitespace split
    (identical to ``q_corpus_top_terms``). Docs with <2 words emit nothing."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, w1s, w2s, cs = [], [], [], []
        for vid, text in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            words = text.lower().split()
            if len(words) < 2:
                continue
            for (a, b), c in Counter(zip(words, words[1:])).items():
                ids.append(vid)
                w1s.append(a)
                w2s.append(b)
                cs.append(c)
        return pa.table(
            {
                id_col: pa.array(ids, batch.column(id_col).type),
                "w1": pa.array(w1s, pa.string()),
                "w2": pa.array(w2s, pa.string()),
                "c": pa.array(cs, pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def unigram_counts(ds, text_col: str = "text"):
    """Global token counts (w1, n1) — fully vectorized map side (Arrow
    lower → split → flatten → value_counts per block), merged by
    ``sorted_group_sum`` so the shuffle carries the vocabulary, never the
    corpus."""
    import pyarrow.compute as pc

    from vigil_ray.stages.corpus import sorted_group_sum

    def partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.utf8_split_whitespace(pc.utf8_lower(batch.column(text_col)))
        )
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat.combine_chunks())
        return pa.table(
            {
                "w1": vc.field("values"),
                "n1": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    return sorted_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"), ["w1"], ["n1"]
    )


def corpus_bigram_ppl(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Add-one-smoothed bigram perplexity of every document under the
    corpus's OWN bigram model, end-to-end distributed:

    1. explode per-doc bigram counts E = (id, w1, w2, c);
    2. global model tables B = (w1, w2, n12) and U = (w1, n1) via
       ``sorted_group_sum`` (vocabulary-sized, stay distributed);
    3. M = B ⋈ U on w1 (vocabulary-scale join) → one model table
       (w1, w2, n12, n1); then ONE corpus-scale join E ⋈ M on (w1, w2) —
       the corpus rows shuffle once, the model is never broadcast;
    4. per-row integer cost c·floor((ln(n1+V) − ln(n12+1))·1e6 + 0.5)
       (micro-nats), per-doc ``sorted_group_sum``, ppl = exp(mean).

    V (vocabulary size) is the one driver-side scalar (a count of the
    vocabulary table). Output: (id, n_bigrams, ppl) for every doc with ≥2
    words, ppl quantized half-up to 6 decimals."""
    from vigil_ray.stages.blocks import compact_blocks, safe_join
    from vigil_ray.stages.corpus import sorted_group_sum

    rows = _doc_bigram_rows(ds, id_col, text_col)
    # E feeds both the model aggregate and the scoring join — pin it so the
    # tokenize/explode lineage runs once (CLAUDE.md: multiply-consumed
    # lineages re-execute per consumer unless materialized). compact_blocks
    # (not plain materialize): every table below feeds a hash join, and
    # 0-row blocks break Ray's join schema broadcast (blocks.py).
    rows = compact_blocks(rows)
    bi = sorted_group_sum(
        rows.select_columns(["w1", "w2", "c"]).rename_columns({"c": "n12"}),
        ["w1", "w2"],
        ["n12"],
    )
    uni = compact_blocks(unigram_counts(ds, text_col))
    vocab = uni.count()

    # fold the unigram counts INTO the bigram table first (vocabulary-scale
    # join), so the corpus-scale rows shuffle through exactly ONE join
    model = safe_join(
        bi, uni, "inner", num_partitions=_join_partitions(), on=("w1",)
    )
    joined = safe_join(
        rows, model, "inner", num_partitions=_join_partitions(), on=("w1", "w2")
    )

    def cost(batch: pa.Table) -> pa.Table:
        n12 = batch.column("n12").combine_chunks().to_numpy(zero_copy_only=False)
        n1 = batch.column("n1").combine_chunks().to_numpy(zero_copy_only=False)
        c = batch.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        nll_micro = np.floor(
            (np.log(n1 + vocab) - np.log(n12 + 1)) * 1e6 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cost": pa.array(c * nll_micro, pa.int64()),
                "c": pa.array(c, pa.int64()),
            }
        )

    per_doc = sorted_group_sum(
        joined.map_batches(cost, batch_format="pyarrow"), [id_col], ["cost", "c"]
    )

    def finish(batch: pa.Table) -> pa.Table:
        tot = batch.column("cost").combine_chunks().to_numpy(zero_copy_only=False)
        n = batch.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        ppl = np.exp(tot / 1e6 / n)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_bigrams": pa.array(n, pa.int64()),
                "ppl": pa.array(np.floor(ppl * 1e6 + 0.5) / 1e6, pa.float64()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")


def bigram_pmi_topk(
    ds,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
):
    """Top-k collocations by PMI: ln((n12/Tb) / ((n1/Tu)·(n2/Tu))) over the
    distributed bigram/unigram count tables, restricted to bigrams with
    n12 ≥ ``min_count`` (the standard stability floor). The unigram table
    joins in twice (prefix then suffix word); totals Tb/Tu are two scalar
    aggregates. PMI is emitted as integer micro-nats (same floor-half-up
    quantization as :func:`corpus_bigram_ppl`) so the oracle compares
    integers, not floats. Output: (w1, w2, n12, pmi_micro), top-k by
    (pmi_micro desc, w1, w2)."""
    import pyarrow.compute as pc

    from vigil_ray.stages.blocks import compact_blocks, safe_join
    from vigil_ray.stages.corpus import sorted_group_sum

    rows = _doc_bigram_rows(ds, "doc_id", text_col)
    bi = compact_blocks(
        sorted_group_sum(
            rows.select_columns(["w1", "w2", "c"]).rename_columns({"c": "n12"}),
            ["w1", "w2"],
            ["n12"],
        )
    )
    uni = compact_blocks(unigram_counts(ds, text_col))

    t_bi = int(bi.sum("n12"))
    t_uni = int(uni.sum("n1"))

    frequent = bi.filter(expr=f"n12 >= {min_count}")
    # every table here is vocabulary-scale — safe_join's compaction is cheap
    # and required: chained joins emit 0-row blocks for empty partitions,
    # which break the next join's schema broadcast (blocks.py)
    j = safe_join(
        frequent, uni, "inner", num_partitions=_join_partitions(), on=("w1",)
    )
    uni2 = uni.map_batches(
        lambda b: pa.table({"w2": b.column("w1"), "n2": b.column("n1")}),
        batch_format="pyarrow",
    )
    j = safe_join(
        j, uni2, "inner", num_partitions=_join_partitions(), on=("w2",)
    )

    def score(batch: pa.Table) -> pa.Table:
        n12 = batch.column("n12").combine_chunks().to_numpy(zero_copy_only=False)
        n1 = batch.column("n1").combine_chunks().to_numpy(zero_copy_only=False)
        n2 = batch.column("n2").combine_chunks().to_numpy(zero_copy_only=False)
        pmi = np.log((n12 / t_bi) / ((n1 / t_uni) * (n2 / t_uni)))
        return pa.table(
            {
                "w1": batch.column("w1"),
                "w2": batch.column("w2"),
                "n12": pc.cast(batch.column("n12"), pa.int64()),
                "pmi_micro": pa.array(
                    np.floor(pmi * 1e6 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    scored = j.map_batches(score, batch_format="pyarrow")
    return scored.sort(["pmi_micro", "w1", "w2"], descending=[True, False, False]).limit(k)
