"""Memory-pressure evidence for the 100-TB design claim.

Two workloads, each run uncapped and with the object store capped far
below the data volume, in fresh Ray sessions:

1. **northstar** (the headline pipeline): its only all-to-all carries
   pre-aggregated ``(cell, partial)`` rows, so under a tight cap the
   streaming executor absorbs the pressure with BACKPRESSURE — the run
   completes with little or no spill and byte-identical tile stats.
   That non-spill is the design claim: the pipeline never needs more
   plasma than a few in-flight blocks.
2. **rebucket** (full-payload re-bucketing): ``repartition(shuffle=True)``
   over the raw pages table INCLUDING the html column — the realistic
   worst case (re-partitioning raw data for resumable partitioned
   output) where every byte must cross the exchange.  With the staged
   input larger than the cap, Ray MUST spill; the study asserts the run
   completes, actually spilled, and reproduces the uncapped leg's exact
   row count and total html byte checksum.

At 100 TB the object store is always the scarce resource; a throughput
number on an idle host cannot show the engine survives plasma pressure —
this parity-under-forced-spill study does.

Usage: python tools/spill_study.py [rep] [object_store_mb]
Defaults: rep=200 (1M pages staged from sf0.1, ~744 MB parquet on disk,
several GB uncompressed in plasma), object_store_mb=512.  Prints one
JSON line per leg plus a final verdict line; record it in BASELINE.md.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _session_spilled_mb(session_dir: str) -> float:
    """Max 'Spilled N MiB' reported in this session's raylet log.

    The raylet logs a cumulative spill counter; the log outlives the
    spill files themselves (which are deleted as object refs drop).
    """
    total = 0.0
    for path in glob.glob(os.path.join(session_dir, "logs", "raylet*.out")):
        try:
            with open(path, errors="replace") as f:
                for line in f:
                    m = re.search(r"Spilled (\d+) MiB", line)
                    if m:
                        total = max(total, float(m.group(1)))
        except OSError:
            pass
    return total


def _fresh_session(object_store_mb: int | None):
    import ray

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
    session_dir = ray._private.worker._global_node.get_session_dir_path()
    return session_dir


def _finish_leg(name: str, session_dir: str, cap_mb, t0: float, stats: dict) -> dict:
    import ray

    wall = time.time() - t0
    spilled = _session_spilled_mb(session_dir)
    ray.shutdown()
    leg = {
        "leg": name,
        "object_store_mb": cap_mb,
        "sec": round(wall, 2),
        "spilled_mb": spilled,
        **stats,
    }
    print(json.dumps(leg), flush=True)
    return leg


def run_northstar_leg(pages_path: str, n_pages: int, cap_mb: int | None) -> dict:
    import bench

    session_dir = _fresh_session(cap_mb)
    t0 = time.time()
    ns = bench.bench_northstar(pages_path, n_pages, NUM_CPUS)
    return _finish_leg(
        "northstar",
        session_dir,
        cap_mb,
        t0,
        {"docs": n_pages, "entities": ns["entities"], "tiles": ns["tiles"]},
    )


def run_rebucket_leg(pages_path: str, cap_mb: int | None, n_buckets: int = 64) -> dict:
    """Full-payload all-to-all: every html byte crosses the exchange."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    session_dir = _fresh_session(cap_mb)
    t0 = time.time()
    ds = rd.read_parquet(pages_path).repartition(n_buckets, shuffle=True)

    def summarize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rows": pa.array([batch.num_rows], pa.int64()),
                "html_bytes": pa.array(
                    [pc.sum(pc.binary_length(batch["html"])).as_py() or 0],
                    pa.int64(),
                ),
            }
        )

    import pandas as pd

    parts = ds.map_batches(summarize, batch_format="pyarrow").to_pandas()
    stats = {
        "rows": int(parts["rows"].sum()),
        "html_bytes": int(parts["html_bytes"].sum()),
    }
    return _finish_leg("rebucket", session_dir, cap_mb, t0, stats)


def main():
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    cap_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import ray

    import bench

    # stage once (uncapped session), then fresh sessions per leg
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    pages_path, n_pages = bench.stage_pages(SF_DIR, rep)
    ray.shutdown()
    bench._wait_ray_drained()

    ns_base = run_northstar_leg(pages_path, n_pages, None)
    bench._wait_ray_drained()
    ns_cap = run_northstar_leg(pages_path, n_pages, cap_mb)
    bench._wait_ray_drained()
    rb_base = run_rebucket_leg(pages_path, None)
    bench._wait_ray_drained()
    rb_cap = run_rebucket_leg(pages_path, cap_mb)

    ns_parity = (
        ns_base["entities"] == ns_cap["entities"]
        and ns_base["tiles"] == ns_cap["tiles"]
    )
    rb_parity = (
        rb_base["rows"] == rb_cap["rows"]
        and rb_base["html_bytes"] == rb_cap["html_bytes"]
    )
    verdict = {
        "study": "spill",
        "northstar_parity": ns_parity,
        "northstar_capped_spill_mb": ns_cap["spilled_mb"],
        "northstar_slowdown_x": round(ns_cap["sec"] / max(ns_base["sec"], 1e-9), 2),
        "rebucket_parity": rb_parity,
        "rebucket_forced_spill": rb_cap["spilled_mb"] > 0,
        "rebucket_capped_spill_mb": rb_cap["spilled_mb"],
        "rebucket_slowdown_x": round(rb_cap["sec"] / max(rb_base["sec"], 1e-9), 2),
    }
    print(json.dumps(verdict), flush=True)
    if not (ns_parity and rb_parity):
        raise SystemExit("PARITY FAILURE: capped run changed results")
    if rb_cap["spilled_mb"] <= 0:
        raise SystemExit(
            "STUDY INVALID: capped rebucket leg did not spill — raise rep "
            "or lower the cap so the exchange exceeds the object store"
        )


if __name__ == "__main__":
    main()
