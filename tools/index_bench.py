"""HPRtree vs GridIndex build-side microbenchmark (r4 judge item 8).

Two admin-envelope regimes over the same probe workload:
  uniform       — evenly spread, similar sizes (the grid's home turf)
  heavy-tailed  — 95% of items clustered + lognormal sizes (a few items
                  hundreds of units wide).  Large items spam many grid
                  buckets, so the grid over-fetches candidates and pays
                  a Python build loop per covered cell; Hilbert packing
                  keeps node occupancy constant by construction.

HPRtree candidates are exact (no post bbox filter); Grid numbers include
the filter its callers must run.  Prints one JSON line.

    python tools/index_bench.py [--n N] [--probes M]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nettopologysuite_ray.geom.index import GridIndex, HPRtree


def bench(boxes: np.ndarray, qboxes: np.ndarray) -> dict:
    out = {}
    t0 = time.perf_counter()
    hp = HPRtree(boxes)
    t1 = time.perf_counter()
    hpi, hci = hp.query_boxes(qboxes)
    t2 = time.perf_counter()
    gi_t0 = time.perf_counter()
    gi = GridIndex(boxes)
    gi_t1 = time.perf_counter()
    pi, ci = gi.query_boxes(qboxes)
    bx = boxes[ci]
    keep = (
        (qboxes[pi, 0] <= bx[:, 2])
        & (qboxes[pi, 2] >= bx[:, 0])
        & (qboxes[pi, 1] <= bx[:, 3])
        & (qboxes[pi, 3] >= bx[:, 1])
    )
    gi_t2 = time.perf_counter()
    assert set(zip(hpi.tolist(), hci.tolist())) == set(
        zip(pi[keep].tolist(), ci[keep].tolist())
    )
    out["hpr_build_ms"] = round(1000 * (t1 - t0), 1)
    out["hpr_query_ms"] = round(1000 * (t2 - t1), 1)
    out["grid_build_ms"] = round(1000 * (gi_t1 - gi_t0), 1)
    out["grid_query_ms"] = round(1000 * (gi_t2 - gi_t1), 1)
    out["pairs"] = int(keep.sum())
    out["grid_raw_candidates"] = int(len(pi))
    out["grid_overfetch"] = round(len(pi) / max(int(keep.sum()), 1), 2)
    return out


def main() -> None:
    n = 20000
    m = 20000
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    if "--probes" in sys.argv:
        m = int(sys.argv[sys.argv.index("--probes") + 1])
    rng = np.random.default_rng(7)
    res = {"n_items": n, "n_probes": m}

    cx = rng.uniform(-5000, 5000, n)
    cy = rng.uniform(-2500, 2500, n)
    sz = rng.uniform(1, 30, n)
    boxes = np.column_stack([cx - sz, cy - sz, cx + sz, cy + sz])
    qx = rng.uniform(-5000, 5000, m)
    qy = rng.uniform(-2500, 2500, m)
    qboxes = np.column_stack([qx - 5, qy - 5, qx + 5, qy + 5])
    res["uniform"] = bench(boxes, qboxes)

    cx = np.where(rng.random(n) < 0.95, rng.uniform(0, 60, n), rng.uniform(-5000, 5000, n))
    cy = np.where(rng.random(n) < 0.95, rng.uniform(0, 30, n), rng.uniform(-2500, 2500, n))
    sz = np.exp(rng.normal(0, 2, n))
    boxes = np.column_stack([cx - sz, cy - sz, cx + sz, cy + sz])
    # probes split between the hotspot and the field
    qx = np.where(rng.random(m) < 0.5, rng.uniform(0, 60, m), rng.uniform(-5000, 5000, m))
    qy = np.where(rng.random(m) < 0.5, rng.uniform(0, 30, m), rng.uniform(-2500, 2500, m))
    qboxes = np.column_stack([qx - 2, qy - 2, qx + 2, qy + 2])
    res["heavy_tailed"] = bench(boxes, qboxes)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
