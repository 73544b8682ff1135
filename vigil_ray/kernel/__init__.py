"""Pure-Python per-document kernel: no Ray imports anywhere in this package.

These functions define the exact transform semantics (what the reference
computes per document); ``vigil_ray.stages`` wraps them into Ray Data
``map_batches`` stages. Keeping them Ray-free gives a single-process oracle
for e2e equality tests (SURVEY.md §5)."""
