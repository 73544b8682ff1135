"""Tolerant boolean normalization for label files.

Reference ``src/utils.py:13-29``: ground-truth CSVs encode booleans as
True/1/'sim'/'yes'/'s'/'y'/'verdadeiro' (and everything else is False).
Exposed both as a scalar and as a vectorized Arrow kernel for the evaluation
join (SURVEY.md §2.5 J3, §3.2).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TRUE_VALUES = frozenset(
    ["true", "1", "1.0", "sim", "yes", "s", "y", "verdadeiro"]
)


def normalize_boolean(value) -> bool:
    """Scalar form: any stringly-typed truthy encoding → bool."""
    return str(value).lower().strip() in TRUE_VALUES


def normalize_boolean_array(arr: pa.Array) -> pa.Array:
    """Vectorized Arrow form: cast → lower → trim → set membership."""
    as_str = pc.cast(arr, pa.string())
    lowered = pc.utf8_lower(pc.utf8_trim_whitespace(as_str))
    return pc.is_in(lowered, value_set=pa.array(sorted(TRUE_VALUES)))
