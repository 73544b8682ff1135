"""Byte-sized parquet reads.

Ray Data's default read parallelism is CPU-count-driven: a 65 KB table on a
32-cpu node becomes 64 blocks, and every downstream ``groupby``/``sort`` pays
a 64-partition all-to-all of near-empty blocks (~12 s of fixed overhead for a
500-row aggregate, measured). Sizing block count by *file bytes* instead makes
tiny tables one block (shuffles collapse to trivial) while 100 TB inputs still
get bytes/target blocks >> cluster cores — the scaling-correct layout.

``target_bytes`` is file (compressed) bytes per block; parquet expands ~3-5×
in memory, so 4 MiB/block ≈ 16-20 MiB Arrow blocks — small enough to keep map
stages elastic, large enough that per-task overhead is noise.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

DEFAULT_TARGET_BYTES = 4 << 20


def read_table(
    path: str,
    columns: Optional[Sequence[str]] = None,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_blocks: int = 1,
):
    import ray.data as rd

    try:
        size = os.path.getsize(path)
    except OSError:
        size = 0
    if size:
        blocks = max(min_blocks, math.ceil(size / target_bytes))
        return rd.read_parquet(path, columns=columns, override_num_blocks=blocks)
    return rd.read_parquet(path, columns=columns)
