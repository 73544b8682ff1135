"""Corpus-level deduplication operators: exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine.

The reference has no cross-document dedup (SURVEY.md §2.7) — these are the
north-rule / training-data-pipeline capabilities, built Ray-Data-first:

- **exact**: content-hash column in ``map_batches`` → ``groupby(hash)`` keep
  min-key (see ``vigil_ray.queries.q_dedup_exact``). Shuffle moves
  (hash, id) pairs only.
- **MinHash-LSH**: per-batch vectorized numpy minhash signatures → explode to
  (band_id, band_hash, id) rows → ``groupby`` band buckets → candidate pairs
  → exact-Jaccard verification. The only shuffle carries band keys (16 bytes
  a row), never documents. b=32 bands × r=4 rows (128 perms): pair with
  Jaccard 0.89 is missed with p≈4e-14; spurious candidates are killed by the
  verify stage, so the output is deterministic.
- **SimHash**: 64-bit signature; 4×16-bit chunk banding finds candidates
  within Hamming distance ≤3 (pigeonhole: ≤3 differing bits leave ≥1 chunk
  intact).
- **embedding-cosine**: exact blockwise pair scan (each batch × broadcast
  matrix) — O(n²/B) per task, deterministic; at 10⁹+ vectors swap the
  broadcast for the IVF/LSH bucketing in ``vigil_ray.stages.ann``.

Verification needs document shingles; at these scales the small side is
broadcast via ``ray.put`` (read once per task). At 10¹²-document scale the
candidate pairs would instead hash-join back to the corpus on id — the
partitioning key (id) is already in place for that.
"""

from __future__ import annotations

import hashlib
from typing import List, Tuple

import numpy as np
import pyarrow as pa

_MERSENNE = (1 << 61) - 1
_N_PERM = 128
_BANDS = 32
_ROWS = _N_PERM // _BANDS

# fixed permutation parameters (deterministic; seeded generator)
_rng = np.random.RandomState(42)
_PERM_A = _rng.randint(1, _MERSENNE, size=_N_PERM, dtype=np.int64).astype(np.uint64)
_PERM_B = _rng.randint(0, _MERSENNE, size=_N_PERM, dtype=np.int64).astype(np.uint64)


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Stable 64-bit hashes of word n-gram shingles."""
    from vigil_ray.kernel.textstats import word_ngrams

    grams = word_ngrams(text, n)
    if not grams:
        return np.zeros(1, dtype=np.uint64)
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(
            hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest(), "big"
        )
    return out


def minhash_signature(text: str, n: int = 3) -> np.ndarray:
    """128-perm MinHash signature (uint64 vector)."""
    h = _shingle_hashes(text, n)
    # (s, p) permuted values; min over shingles. Modular arithmetic in object
    # ints is avoided: wrap-around multiplication is a valid universal hash.
    vals = h[:, None] * _PERM_A[None, :] + _PERM_B[None, :]
    return vals.min(axis=0)


def band_rows(vid: int, sig: np.ndarray) -> List[Tuple[int, int, int]]:
    """(band_id, band_hash, vid) rows for the LSH groupby."""
    rows = []
    for b in range(_BANDS):
        chunk = sig[b * _ROWS : (b + 1) * _ROWS]
        digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
        rows.append((b, int.from_bytes(digest, "big") >> 1, vid))
    return rows


def jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    from vigil_ray.kernel.textstats import word_ngrams

    sa, sb = set(word_ngrams(text_a, n)), set(word_ngrams(text_b, n))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (Charikar 2002)."""
    words = text.lower().split()
    if not words:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for w in words:
        h = int.from_bytes(
            hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "big"
        )
        bits = np.unpackbits(
            np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8)
        ).astype(np.int64)
        acc += bits * 2 - 1
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << (63 - i)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# --------------------------------------------------------------------------
# Ray stages
# --------------------------------------------------------------------------

def minhash_lsh_pairs(
    ds,
    id_col: str = "vid",
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket: int = 200,
):
    """Near-duplicate pairs (a < b, exact Jaccard ≥ threshold).

    ``max_bucket`` caps pair explosion from a degenerate bucket (e.g. the
    empty-text bucket); capped buckets are truncated to their first
    ``max_bucket`` members by id — log-worthy at scale, exact here.
    """
    import ray
    import pandas as pd

    def to_bands(batch: pa.Table) -> pa.Table:
        bids, bhashes, vids = [], [], []
        for vid, text in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            sig = minhash_signature(text or "")
            for b, h, v in band_rows(vid, sig):
                bids.append(b)
                bhashes.append(h)
                vids.append(v)
        return pa.table(
            {
                "band_id": pa.array(bids, pa.int32()),
                "band_hash": pa.array(bhashes, pa.int64()),
                "vid": pa.array(vids, pa.int64()),
            }
        )

    bands = ds.map_batches(to_bands, batch_format="pyarrow")

    # collect each bucket's member ids as ONE aggregated list row, then
    # explode pairs per batch — orders of magnitude cheaper than a pandas
    # map_groups call per bucket (measured: 18.5 s → sub-second at 23k
    # buckets; per-group UDF invocation costs ~1 ms each)
    from ray.data.aggregate import AggregateFn

    collect_vids = AggregateFn(
        init=lambda k: [],
        merge=lambda left, right: left + right,
        name="vids",
        accumulate_block=lambda acc, block: acc + block.column("vid").to_pylist(),
    )
    buckets = bands.groupby(["band_id", "band_hash"]).aggregate(collect_vids)

    def explode_pairs(batch: pa.Table) -> pa.Table:
        pa_, pb_ = [], []
        for vids in batch.column("vids").to_pylist():
            ids = sorted(vids)[:max_bucket]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pa_.append(ids[i])
                    pb_.append(ids[j])
        return pa.table(
            {"a": pa.array(pa_, pa.int64()), "b": pa.array(pb_, pa.int64())}
        )

    cand = buckets.map_batches(explode_pairs, batch_format="pyarrow")
    # distinct candidate pairs (same pair surfaces from several bands)
    cand = cand.groupby(["a", "b"]).count().select_columns(["a", "b"])

    texts_pdf = ds.select_columns([id_col, text_col]).to_pandas()
    texts_ref = ray.put(dict(zip(texts_pdf[id_col], texts_pdf[text_col])))

    def verify(batch: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)
        keep_a, keep_b = [], []
        for a, b in zip(batch.column("a").to_pylist(), batch.column("b").to_pylist()):
            if jaccard(texts.get(a, ""), texts.get(b, "")) >= threshold:
                keep_a.append(a)
                keep_b.append(b)
        return pa.table(
            {"a": pa.array(keep_a, pa.int64()), "b": pa.array(keep_b, pa.int64())}
        )

    return cand.map_batches(verify, batch_format="pyarrow")


def simhash_pairs(
    ds,
    id_col: str = "vid",
    text_col: str = "text",
    max_distance: int = 3,
    max_bucket: int = 200,
):
    """Pairs within Hamming distance ≤ max_distance via 4-chunk banding."""
    import ray
    import pandas as pd

    def to_chunks(batch: pa.Table) -> pa.Table:
        cids, chashes, vids, sigs = [], [], [], []
        for vid, text in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            sig = simhash64(text or "")
            for c in range(4):
                cids.append(c)
                chashes.append((sig >> (16 * c)) & 0xFFFF)
                vids.append(vid)
                sigs.append(sig - (1 << 63) if sig >= (1 << 63) else sig)
        return pa.table(
            {
                "chunk_id": pa.array(cids, pa.int32()),
                "chunk_hash": pa.array(chashes, pa.int32()),
                "vid": pa.array(vids, pa.int64()),
                "sig": pa.array(sigs, pa.int64()),
            }
        )

    chunks = ds.map_batches(to_chunks, batch_format="pyarrow")

    from ray.data.aggregate import AggregateFn

    collect_members = AggregateFn(
        init=lambda k: [],
        merge=lambda left, right: left + right,
        name="members",
        accumulate_block=lambda acc, block: acc
        + list(zip(block.column("vid").to_pylist(), block.column("sig").to_pylist())),
    )
    buckets = chunks.groupby(["chunk_id", "chunk_hash"]).aggregate(collect_members)

    def explode_pairs(batch: pa.Table) -> pa.Table:
        pa_, pb_ = [], []
        for members in batch.column("members").to_pylist():
            rows = sorted(tuple(m) for m in members)[:max_bucket]
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    va, sa = rows[i]
                    vb, sb = rows[j]
                    ua = sa + (1 << 64) if sa < 0 else sa
                    ub = sb + (1 << 64) if sb < 0 else sb
                    if hamming64(ua, ub) <= max_distance:
                        pa_.append(va)
                        pb_.append(vb)
        return pa.table(
            {"a": pa.array(pa_, pa.int64()), "b": pa.array(pb_, pa.int64())}
        )

    cand = buckets.map_batches(explode_pairs, batch_format="pyarrow")
    return cand.groupby(["a", "b"]).count().select_columns(["a", "b"])


def embedding_pairs(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
):
    """Exact cosine near-dup pairs (a < b, cos ≥ threshold): each batch scans
    against the broadcast normalized matrix. Deterministic and complete."""
    import ray

    pdf = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = pdf[id_col].to_numpy()
    mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    ref = ray.put((ids, mat / norms))

    def scan(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = np.asarray(batch.column(id_col).to_pylist())
        bmat = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        bnorms = np.linalg.norm(bmat, axis=1, keepdims=True)
        bnorms[bnorms == 0] = 1.0
        cos = (bmat / bnorms) @ all_mat.T
        keep_a, keep_b = [], []
        for r in range(cos.shape[0]):
            hits = np.where(cos[r] >= threshold)[0]
            for c in hits:
                if bids[r] < all_ids[c]:
                    keep_a.append(int(bids[r]))
                    keep_b.append(int(all_ids[c]))
        return pa.table(
            {"a": pa.array(keep_a, pa.int64()), "b": pa.array(keep_b, pa.int64())}
        )

    return ds.map_batches(scan, batch_format="pyarrow", batch_size=1024)
