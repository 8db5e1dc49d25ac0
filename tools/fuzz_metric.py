"""Mass fuzz of the metric kernels against closed-form cross-operator
invariants (each check pits two independent kernels against each other,
so a frame-dependent failure in either surfaces as a disagreement):

  distance / nearest_points:
    - symmetry: distance(a,b) == distance(b,a) (ulp slack)
    - realization: |nearest_points(a,b)| == distance(a,b)
    - consistency: distance > slack implies disjoint (DE-9IM relate)
  hausdorff / frechet:
    - hausdorff(a,b) >= distance(a,b) - slack
    - hausdorff symmetric (it is the max of both directed passes)
    - frechet(a,b) >= hausdorff(a,b) - slack (discrete Frechet dominates
      discrete Hausdorff on the same vertex sets)
  maximum_inscribed_circle:
    - center strictly inside the polygon
    - radius agrees with the center's true clearance (distance to the
      boundary linework) within the refinement tolerance
    - radius positive for area-positive polygons
  concave_hull:
    - valid, contains every input point, area <= convex hull area
  MeasureIndexedLine (linear referencing with M):
    - extract_point(m) lies ON the line (distance ~0)
    - project(extract_point(m)) == m for strictly-increasing measures
    - extract_line(m0,m1) endpoints at measures m0/m1; its length <=
      total line length

Families reuse fuzz_constructive's generators; frames 0 / +1e7 / -3.7e7.

    python tools/fuzz_metric.py [--n N] [--seed S] [--offset X]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fuzz_constructive import _eps, make_geom

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom import extra
from nettopologysuite_ray.geom.hull import concave_hull
from nettopologysuite_ray.geom.linearref import MeasureIndexedLine
from nettopologysuite_ray.geom.predicates import intersects
from nettopologysuite_ray.geom.types import LINESTRING, POLYGON, Geom


def check_distance(a, b, problems):
    eps = max(_eps(a), _eps(b))
    slack = 1e3 * eps
    d1 = alg.distance(a, b)
    d2 = alg.distance(b, a)
    if abs(d1 - d2) > slack + 1e-12 * max(d1, 1.0):
        problems.append(f"distance asymmetry {d1} vs {d2}")
    p, q = alg.nearest_points(a, b)
    dr = float(np.hypot(p[0] - q[0], p[1] - q[1]))
    if abs(dr - d1) > slack + 1e-9 * max(d1, 1.0):
        problems.append(f"nearest_points gap {dr} != distance {d1}")
    if d1 > slack and intersects(a, b):
        problems.append(f"distance {d1} > 0 but intersects")
    h = alg.hausdorff(a, b)
    if h < d1 - slack - 1e-12 * max(d1, 1.0):
        problems.append(f"hausdorff {h} < distance {d1}")
    h2 = alg.hausdorff(b, a)
    if abs(h - h2) > slack + 1e-12 * max(h, 1.0):
        problems.append(f"hausdorff asymmetry {h} vs {h2}")
    if a.gtype == LINESTRING and b.gtype == LINESTRING:
        f = extra.frechet(a, b)
        if f < h - slack - 1e-12 * max(h, 1.0):
            problems.append(f"frechet {f} < hausdorff {h}")


def check_mic(g, problems):
    if g.gtype != POLYGON:
        return
    area = alg.area(g)
    if area <= 0:
        return
    tol = 1e-3
    (cx, cy), r = extra.maximum_inscribed_circle(g, tolerance=tol)
    if r <= 0:
        problems.append(f"MIC radius {r} for area {area}")
        return
    if alg.locate_point_in_rings(cx, cy, g.data) != alg.INTERIOR:
        problems.append("MIC center not interior")
        return
    segs = alg._geom_segments(g)
    true_r = float(alg.points_to_segments_distance(np.array([[cx, cy]]), segs)[0])
    eps = _eps(g)
    if abs(true_r - r) > 10 * tol + 1e3 * eps:
        problems.append(f"MIC radius {r} vs clearance {true_r}")


def check_concave(g, problems):
    pts = np.unique(g.all_coords(), axis=0)
    if len(pts) < 4:
        return
    ch = alg.convex_hull(g)
    if ch.gtype != POLYGON:
        return
    h = concave_hull(g, 0.3)
    if h.is_empty or h.gtype != POLYGON:
        return
    from nettopologysuite_ray.geom.validity import is_valid

    if not is_valid(h):
        problems.append("concave hull invalid")
        return
    for p in pts:
        if alg.locate_in_geom(float(p[0]), float(p[1]), h) == alg.EXTERIOR:
            problems.append(f"concave hull excludes {tuple(p)}")
            return
    eps = _eps(g)
    if alg.area(h) > alg.area(ch) * (1 + 1e-9) + 1e3 * eps:
        problems.append("concave hull area exceeds convex hull")


def check_linearref(rng, off, problems):
    n = int(rng.integers(2, 12))
    pts = np.cumsum(rng.uniform(-3, 3, (n, 2)), axis=0) + off
    seg = np.hypot(*(np.diff(pts, axis=0)).T)
    if (seg == 0).any():
        return
    total = float(seg.sum())
    if total == 0:
        return
    # strictly increasing measures, arbitrary scale/offset
    m = np.concatenate([[0.0], np.cumsum(rng.uniform(0.5, 2.0, n - 1))])
    m = m * rng.uniform(0.5, 3.0) + rng.uniform(-10, 10)
    line = Geom(LINESTRING, pts, extra={"dims": "M", "ords": m[:, None].copy()})
    mil = MeasureIndexedLine(line)
    eps = _eps(line)
    for _ in range(4):
        mm = float(rng.uniform(m[0], m[-1]))
        p = mil.extract_point(mm)
        px, py = float(p.data[0]), float(p.data[1])
        dmin = min(
            float(
                alg.point_segments_distance(
                    np.array([px]), np.array([py]),
                    np.array([pts[i, 0]]), np.array([pts[i, 1]]),
                    np.array([pts[i + 1, 0]]), np.array([pts[i + 1, 1]]),
                )[0]
            )
            for i in range(n - 1)
        )
        if dmin > 1e3 * eps:
            problems.append(f"extract_point off line by {dmin}")
            return
        m_back = mil.project(px, py)
        # measure slack: projection resolves position to ~eps of arc
        # length, scaled into measure units by the local dm/dlen
        m_slack = 1e-9 * (abs(m[-1] - m[0]) + 1.0) + 1e4 * eps * (
            abs(m[-1] - m[0]) / max(total, 1e-300) + 1.0
        )
        if abs(m_back - mm) > m_slack:
            problems.append(f"project(extract_point({mm})) = {m_back}")
            return
    m0, m1 = sorted(rng.uniform(m[0], m[-1], 2))
    sub = mil.extract_line(float(m0), float(m1))
    ms = sub.extra["ords"][:, 0] if sub.extra else None
    if ms is not None and len(ms):
        if abs(float(ms[0]) - m0) > 1e-9 * (abs(m0) + 1.0) + 1e3 * eps:
            problems.append(f"extract_line start measure {ms[0]} != {m0}")
        if abs(float(ms[-1]) - m1) > 1e-9 * (abs(m1) + 1.0) + 1e3 * eps:
            problems.append(f"extract_line end measure {ms[-1]} != {m1}")
    if alg.length(sub) > total * (1 + 1e-9) + 1e3 * eps:
        problems.append("extract_line longer than the line")


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
        a = make_geom(rng, args.offset)
        b = make_geom(rng, args.offset + float(rng.uniform(-5, 5)))
        problems = []
        try:
            check_distance(a, b, problems)
            check_mic(a, problems)
            check_concave(a, problems)
            check_linearref(rng, args.offset, problems)
        except Exception as e:  # noqa: BLE001 — fuzz harness records all
            problems.append(f"exception: {type(e).__name__}: {e}")
        if problems:
            fails.append({"i": i, "problems": problems, "ga": a.gtype, "gb": b.gtype})
            if len(fails) >= 5:
                break
        if (i + 1) % 200 == 0:
            print(f"  ... {i + 1}/{args.n}, {len(fails)} failures", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "metric-kernel invariant fuzz",
                "cases": args.n,
                "violations": len(fails),
                "fails": fails,
                "sec": round(time.time() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
