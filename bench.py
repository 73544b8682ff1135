#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "docs": N, "docs_per_sec": N}

``--scaling``: runs the plain bench twice in fresh subprocesses at
RAY_GRAFT_CPUS=8 and =32 on the same input and reports both throughputs plus
scaling efficiency (the sandbox substitute for N-vs-4N-node clusters; see
BASELINE.md).

Env knobs:
    GRAFT_SF_DIR      input tables dir      (default /root/testdata/sf0.1)
    RAY_GRAFT_CPUS    ray.init num_cpus     (default 32)
    GRAFT_MULTIPLIER  pages amplification   (default 40 → ~200k docs at sf0.1)
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
MULTIPLIER = int(os.environ.get("GRAFT_MULTIPLIER", "40"))
PAGES_CACHE = f"/tmp/vigil_bench/pages_{os.path.basename(SF_DIR)}_x{MULTIPLIER}.parquet"


def _prepare_pages() -> str:
    """Synthesize (once, idempotent) the amplified pages parquet and warm the
    page cache so both scaling runs measure compute, not first-touch disk."""
    from vigil_ray.sources.pages import synthesize_pages

    os.makedirs(os.path.dirname(PAGES_CACHE), exist_ok=True)
    synthesize_pages(SF_DIR, multiplier=MULTIPLIER, out_path=PAGES_CACHE)
    with open(PAGES_CACHE, "rb") as f:  # warm OS page cache
        while f.read(1 << 24):
            pass
    return PAGES_CACHE


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from vigil_ray.config import PipelineConfig
    from vigil_ray.pipelines.flagship import quality_filter
    from vigil_ray.queries import queries as query_registry

    pages_path = _prepare_pages()
    cfg = PipelineConfig()
    timings: dict = {}

    # --- headline: full quality-filter pipeline, read → ... → write -------
    out_dir = f"/tmp/vigil_bench/out_{NUM_CPUS}"
    subprocess.run(["rm", "-rf", out_dir], check=False)
    t0 = time.perf_counter()
    ds = rd.read_parquet(pages_path)
    result = quality_filter(ds, cfg, quality_concurrency=(1, max(2, NUM_CPUS // 2)))
    result = result.drop_columns(["detalhes", "sinais_contextuais"])
    result.write_parquet(out_dir)
    headline = time.perf_counter() - t0
    n_docs = rd.read_parquet(out_dir, columns=["url"]).count()
    timings["quality_filter_full"] = round(headline, 3)

    # --- secondary pipelines over the driver's sf tables -------------------
    secondary = [
        "dedup_exact",
        "events_hourly",
        "ann_cosine_top10",
        "pages_type_counts",
    ]
    registry = query_registry()
    for name in secondary:
        t0 = time.perf_counter()
        res = registry[name](SF_DIR)
        if hasattr(res, "materialize"):
            res.materialize()
        timings[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "flagship quality-filter wall time (read→extract→quality→detect→scrub→write)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / headline, 1),
    }


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = one(8), one(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    return {
        "metric": "scaling efficiency (8 vs 32 cpus, same input)",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "docs": hi["docs"],
        "docs_per_sec_8": lo["docs_per_sec"],
        "docs_per_sec_32": hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
