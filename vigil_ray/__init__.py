"""vigil_ray — a Ray-Data-native web-scale quality-filter / PII-scrub engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference engine ``iurileao-hub/vigil-pii-detector`` (see SURVEY.md), expressed
as composable ``ray.data.Dataset -> Dataset`` stages:

- ``vigil_ray.kernel``   — pure-Python per-document semantics (regex PII
  detection, normalization, name heuristics, quality scoring, scrubbing).
  No Ray imports: unit-testable and usable as a single-process oracle.
- ``vigil_ray.stages``   — Ray Data stages (``map_batches`` transforms, actor
  pools for stateful scorers, groupby/shuffle wide ops, dedup, ANN).
- ``vigil_ray.sources``  — readers and the deterministic pages synthesizer.
- ``vigil_ray.pipelines``— end-to-end pipeline compositions + lineage/resume.

Public kernel API mirrors the reference's programmatic surface
(reference ``src/__init__.py:23-38``): detector, patterns, preprocessor,
exclusions, review analysis.
"""

from vigil_ray.config import PipelineConfig
from vigil_ray.kernel.preprocess import normalize_text
from vigil_ray.kernel.detector import detect_pii, empty_result
from vigil_ray.kernel.exclusions import is_institutional_name

__all__ = [
    "PipelineConfig",
    "normalize_text",
    "detect_pii",
    "empty_result",
    "is_institutional_name",
]

__version__ = "0.1.0"
