"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship quality-filter pipeline over sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator registry from
``vigil_ray.queries`` (one entry per implemented pipeline/operator from
SURVEY.md §2 plus the north-rule capabilities).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(nor in the vigil_ray library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    import ray.data as rd

    from vigil_ray.config import PipelineConfig
    from vigil_ray.pipelines.flagship import quality_filter
    from vigil_ray.sources.pages import synthesize_pages

    pages = synthesize_pages("/root/testdata/sf0.001")
    ds = rd.from_arrow(pages)
    return quality_filter(ds, PipelineConfig())


def queries() -> dict[str, Callable[[str], Any]]:
    from vigil_ray.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from vigil_ray.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
