"""Shared machinery for the sorted-adjacency operators
(``dedup.sorted_bucket_pairs``, ``corpus.sorted_group_min``): vectorized
key-run detection over a sorted, pinned block. Kept in ONE place so the
boundary-deferral protocol's invariants (run = maximal equal-key span; only
a block's first/last run can straddle a boundary) have a single definition.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa


def np_col(batch: pa.Table, c: str) -> np.ndarray:
    return batch.column(c).combine_chunks().to_numpy(zero_copy_only=False)


def run_starts(batch: pa.Table, key_cols: Sequence[str]) -> np.ndarray:
    """Indices where a new equal-key run begins (batch is sorted by
    key_cols; index 0 always starts a run)."""
    n = batch.num_rows
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in key_cols:
        k = np_col(batch, c)
        change[1:] |= k[1:] != k[:-1]
    return np.flatnonzero(change)


def run_bounds(batch: pa.Table, key_cols: Sequence[str]) -> List[Tuple[int, int]]:
    """(start, end) pairs of every equal-key run in the sorted batch."""
    starts = run_starts(batch, key_cols)
    ends = np.append(starts[1:], batch.num_rows)
    return list(zip(starts.tolist(), ends.tolist()))
