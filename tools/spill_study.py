"""Memory-pressure evidence for the 100-TB design claim: run the
northstar pipeline with the object store capped far below the staged
input size, assert that it (a) completes, (b) actually spilled, and
(c) produces EXACTLY the same tile stats as the uncapped run.

At 100 TB the object store is always the scarce resource — streaming
execution must keep working when blocks have to spill to disk instead of
staying in plasma.  A single-node throughput number cannot show that;
this study does: the capped leg forces Ray's spill path while row/tile
parity against the uncapped leg proves the engine's answers do not
depend on whether its blocks lived in memory.

Usage: python tools/spill_study.py [rep] [object_store_mb]
Defaults: rep=8 (800k pages staged from sf0.1, ~2 GB parquet on disk),
object_store_mb=512.  Prints one JSON line per leg plus a final verdict
line; record the result in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _spilled_mb() -> float:
    """Total MB spilled this session, from Ray's own memory summary."""
    import re

    import ray

    try:
        from ray._private.internal_api import memory_summary

        s = memory_summary(stats_only=True)
    except Exception:
        return -1.0
    m = re.search(r"Spilled (\d+) MiB", s)
    return float(m.group(1)) if m else 0.0


def run_leg(pages_path: str, n_pages: int, object_store_mb: int | None) -> dict:
    import ray

    import bench

    kwargs = dict(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    if object_store_mb is not None:
        kwargs["object_store_memory"] = object_store_mb * 1024 * 1024
    ray.init(**kwargs)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_ratio = 0.9
    t0 = time.time()
    ns = bench.bench_northstar(pages_path, n_pages, NUM_CPUS)
    wall = time.time() - t0
    spilled = _spilled_mb()
    ray.shutdown()
    leg = {
        "object_store_mb": object_store_mb,
        "docs": n_pages,
        "sec": round(ns["sec"], 2),
        "docs_per_sec": round(ns["docs_per_sec"], 1),
        "entities": ns["entities"],
        "tiles": ns["tiles"],
        "spilled_mb": spilled,
    }
    print(json.dumps(leg), flush=True)
    return leg


def main():
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cap_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import ray

    import bench

    # stage once (uncapped session), then two fresh sessions per leg
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    pages_path, n_pages = bench.stage_pages(SF_DIR, rep)
    ray.shutdown()
    bench._wait_ray_drained()

    base = run_leg(pages_path, n_pages, None)
    bench._wait_ray_drained()
    capped = run_leg(pages_path, n_pages, cap_mb)

    parity = (
        base["entities"] == capped["entities"] and base["tiles"] == capped["tiles"]
    )
    verdict = {
        "study": "spill",
        "parity": parity,
        "capped_spilled_mb": capped["spilled_mb"],
        "forced_spill": capped["spilled_mb"] > 0,
        "slowdown_x": round(capped["sec"] / max(base["sec"], 1e-9), 2),
    }
    print(json.dumps(verdict), flush=True)
    if not parity:
        raise SystemExit("PARITY FAILURE: capped run changed results")


if __name__ == "__main__":
    main()
