"""Two-cluster-size scaling study for the raster<->vector pipeline.

Runs the raster_roundtrip query (rasterize -> vectorize -> inventory,
__ray_entry__._q_raster_roundtrip) at sf0.1 in FRESH processes pinned to
8 and 32 physical cores (whole-session sched_setaffinity, the same
honest cluster-size emulation as bench.py --scaling), best-of-2 per
level, and reports both throughputs plus the N->4N scaling efficiency.

Usage:
  python tools/raster_scaling.py            # parent: runs both legs
  (child mode is selected via GRAFT_RASTER_CPUS, set by the parent)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _wait_ray_drained(timeout_s: float = 45.0) -> None:
    # ray.shutdown() returns before raylet/worker teardown completes; a
    # leg started while the prior session drains measures the drain
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        probe = subprocess.run(
            ["pgrep", "-fc", "raylet|ray::"], capture_output=True, text=True
        )
        if probe.stdout.strip() in ("", "0"):
            break
        time.sleep(1.0)
    time.sleep(2.0)


def child(nc: int) -> None:
    os.sched_setaffinity(0, set(range(nc)))
    import ray

    ray.init(
        address="local", num_cpus=nc, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as e

    # warm the pipeline code path once at tiny scale so the timed run
    # measures steady-state engine throughput, not imports/forks (falls
    # back to the measured dir when the tiny fixture is absent)
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    e.queries()["raster_roundtrip"](warm_dir).materialize()
    # rep grows the job (disjoint replica bands) until compute dominates
    # fixed stitch/scheduling overhead — the same methodology as
    # bench.py --scaling's GRAFT_SCALING_REP
    rep = int(os.environ.get("GRAFT_RASTER_REP", "4"))
    t0 = time.time()
    ds = e._q_raster_roundtrip(SF_DIR, rep=rep).materialize()
    sec = time.time() - t0
    rows = ds.count()
    ray.shutdown()
    print(json.dumps({"sec": round(sec, 3), "rows": rows,
                      "rows_per_sec": round(rows / sec, 1), "num_cpus": nc}))


def main() -> None:
    if os.environ.get("GRAFT_RASTER_CPUS"):
        child(int(os.environ["GRAFT_RASTER_CPUS"]))
        return
    results = {}
    for nc in (8, 32):
        env = dict(os.environ)
        env["GRAFT_RASTER_CPUS"] = str(nc)
        best = None
        for _attempt in range(2):
            _wait_ray_drained()
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                timeout=1800,
            )
            if proc.returncode != 0 or not proc.stdout.strip():
                sys.stderr.write(proc.stderr[-4000:])
                raise RuntimeError(f"child leg nc={nc} failed (rc={proc.returncode})")
            line = proc.stdout.strip().splitlines()[-1]
            r = json.loads(line)
            if best is None or r["sec"] < best["sec"]:
                best = r
        results[nc] = best
    t8, t32 = results[8]["rows_per_sec"], results[32]["rows_per_sec"]
    eff = (t32 / t8) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "raster_roundtrip scaling N=8 vs 4N=32 cpus",
                "value": round(eff, 3),
                "unit": "efficiency",
                "sf": SF_DIR,
                "rows": results[8]["rows"],
                "rows_per_sec_8": t8,
                "rows_per_sec_32": t32,
                "sec_8": results[8]["sec"],
                "sec_32": results[32]["sec"],
            }
        )
    )


if __name__ == "__main__":
    main()
