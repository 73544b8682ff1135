"""Ray Data stages: ``Dataset -> Dataset`` functions wrapping the kernel.

Every stage is a named, composable step (the idiomatic Ray Data pipeline
surface, SURVEY.md §2.9): stateless kernels run as task-based ``map_batches``;
model-holding scorers run as actor pools with setup in ``__init__``."""
