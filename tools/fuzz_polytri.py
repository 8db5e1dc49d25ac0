"""Mass fuzz of polygon triangulation and precision reduction against
closed-form invariants:

  polygon_triangulate / constrained_delaunay (reference
  Triangulate/Polygon/PolygonTriangulator.cs, ConstrainedDelaunayTriangulator.cs):
    - triangle count == n + 2h - 2 for a polygon with n distinct shell+
      hole vertices and h holes (Euler, ear-clipping count)
    - sum of triangle areas == polygon area (relative, perimeter-scaled)
    - every triangle centroid locates INSIDE the polygon
    - every triangle is strictly CCW (exact orientation)

  reduce_precision (reference Precision/GeometryPrecisionReducer.cs):
    - every output ordinate is ON the grid (exact multiple within 1 ulp)
    - output is valid
    - area drift bounded by perimeter x grid (snap moves each vertex
      by at most grid/sqrt(2) per axis)
    - idempotent: reducing again at the same scale is a no-op

Families: perturbed convex rings, radial stars, donuts (1-3 holes),
L-shapes; frames 0 / +1e7 / -3.7e7.  Usage:

    python tools/fuzz_polytri.py [--n N] [--seed S] [--offset X]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom.polytri import constrained_delaunay, polygon_triangulate
from nettopologysuite_ray.geom.precision import reduce_precision
from nettopologysuite_ray.geom.types import POLYGON, Geom
from nettopologysuite_ray.geom.validity import is_valid


def _ccw_ring(ring):
    if alg.ring_signed_area(ring) < 0:
        return ring[::-1].copy()
    return ring


def make_polygon(rng, off):
    fam = int(rng.integers(0, 4))
    if fam == 0:  # perturbed convex
        n = int(rng.integers(3, 30))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(5, 15)
        pts = np.column_stack([r * np.cos(ang), r * np.sin(ang)])
        pts += rng.normal(0, 0.02, pts.shape)
        ring = _ccw_ring(np.vstack([pts, pts[:1]]) + off)
        return Geom(POLYGON, [ring])
    if fam == 1:  # radial star
        n = int(rng.integers(4, 20))
        ang = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
        rad = np.where(
            np.arange(2 * n) % 2 == 0, rng.uniform(8, 15), rng.uniform(2, 6)
        )
        pts = np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])
        ring = _ccw_ring(np.vstack([pts, pts[:1]]) + off)
        return Geom(POLYGON, [ring])
    if fam == 2:  # donut with 1-3 square holes
        outer = np.array(
            [[-20.0, -20.0], [20.0, -20.0], [20.0, 20.0], [-20.0, 20.0], [-20.0, -20.0]]
        )
        rings = [outer + off]
        nh = int(rng.integers(1, 4))
        xs = rng.uniform(-14, 8, nh)
        ys = rng.uniform(-14, 8, nh)
        for k in range(nh):
            # disjoint holes: place on a coarse lattice to avoid overlap
            x0 = float(np.floor(xs[k] / 7.0) * 7.0 + 1.0)
            y0 = float(np.floor(ys[k] / 7.0) * 7.0 + 1.0)
            s = float(rng.uniform(1.0, 4.0))
            hole = np.array(
                [[x0, y0], [x0, y0 + s], [x0 + s, y0 + s], [x0 + s, y0], [x0, y0]]
            )
            rings.append(hole + off)
        # dedup holes landing on the same lattice cell
        seen = set()
        uniq = [rings[0]]
        for h in rings[1:]:
            key = (round(float(h[0, 0]), 6), round(float(h[0, 1]), 6))
            if key not in seen:
                seen.add(key)
                uniq.append(h)
        return Geom(POLYGON, uniq)
    # L-shape
    w = float(rng.uniform(5, 20))
    h = float(rng.uniform(5, 20))
    t = float(rng.uniform(1, min(w, h) - 0.5))
    ring = np.array(
        [[0.0, 0.0], [w, 0.0], [w, t], [t, t], [t, h], [0.0, h], [0.0, 0.0]]
    )
    return Geom(POLYGON, [_ccw_ring(ring) + off])


def check_triangulate(g, problems, fn, name):
    res = fn(g)
    tris = [c for c in res.flatten() if c.gtype == POLYGON]
    n = sum(len(r) - 1 for r in g.data)
    h = len(g.data) - 1
    expect = n + 2 * h - 2
    if len(tris) != expect:
        problems.append(f"{name}: {len(tris)} triangles, expected {expect}")
        return
    area = alg.area(g)
    eps = float(np.spacing(max(np.abs(g.all_coords()).max(), 1.0)))
    tot = 0.0
    sign = None
    for t in tris:
        ring = t.data[0]
        if len(ring) != 4:
            problems.append(f"{name}: non-triangle face ({len(ring) - 1} verts)")
            return
        o = alg.orient2d(
            ring[0][0], ring[0][1], ring[1][0], ring[1][1], ring[2][0], ring[2][1]
        )
        # the triangulator emits a CONSISTENT orientation (the engine's
        # convention is CW, matching its ported reference cases); the
        # invariant is nonzero + uniform, not a fixed handedness
        if o == 0:
            problems.append(f"{name}: exactly-degenerate triangle")
            return
        if sign is None:
            sign = o
        elif o != sign:
            problems.append(f"{name}: mixed triangle orientations")
            return
        tot += abs(alg.ring_signed_area(ring))
        cx = (ring[0][0] + ring[1][0] + ring[2][0]) / 3.0
        cy = (ring[0][1] + ring[1][1] + ring[2][1]) / 3.0
        if alg.locate_point_in_rings(cx, cy, g.data) == alg.EXTERIOR:
            problems.append(f"{name}: centroid outside polygon")
            return
    per = alg.length(g)
    if abs(tot - area) > 1e-9 * max(area, 1.0) + 8 * eps * per:
        problems.append(f"{name}: area {tot} != polygon {area}")


def check_reduce(g, problems, rng):
    scale = float(10.0 ** int(rng.integers(0, 3)))
    grid = 1.0 / scale
    r = reduce_precision(g, scale)
    if r.is_empty:
        return  # legitimately collapsed
    eps = float(np.spacing(max(np.abs(g.all_coords()).max(), 1.0)))
    c = r.all_coords()
    snapped = np.round(c * scale) / scale
    if np.abs(c - snapped).max() > 4 * eps:
        problems.append(f"reduce: ordinate off grid by {np.abs(c - snapped).max()}")
        return
    if not is_valid(r):
        problems.append("reduce: invalid output")
        return
    a0, a1 = alg.area(g), alg.area(r)
    band = alg.length(g) * grid + 8 * eps * alg.length(g) + grid * grid
    if abs(a1 - a0) > band:
        problems.append(f"reduce: area drift {a0} -> {a1} (band {band})")
        return
    r2 = reduce_precision(r, scale)
    if not r2.is_empty:
        # idempotence up to normalization: a second pass may reorder holes
        # (ring order is not semantically significant)
        if not alg.equals_exact(alg.normalize(r), alg.normalize(r2)):
            problems.append("reduce: not idempotent")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--offset", type=float, default=0.0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    fails = []
    skipped = 0
    for i in range(args.n):
        g = make_polygon(rng, args.offset)
        # ear clipping is specified for VALID polygons only (the reference
        # throws on self-intersecting input too); the perturbed-convex
        # family occasionally self-intersects — skip those
        if not is_valid(g):
            skipped += 1
            continue
        problems = []
        try:
            check_triangulate(g, problems, polygon_triangulate, "earclip")
            check_triangulate(g, problems, constrained_delaunay, "cdt")
            check_reduce(g, problems, rng)
        except Exception as e:  # noqa: BLE001 — fuzz harness records all
            problems.append(f"exception: {type(e).__name__}: {e}")
        if problems:
            fails.append({"i": i, "problems": problems, "rings": len(g.data)})
            if len(fails) >= 5:
                break
        if (i + 1) % 200 == 0:
            print(f"  ... {i + 1}/{args.n}, {len(fails)} failures", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "polytri/precision invariant fuzz",
                "cases": args.n,
                "skipped_invalid": skipped,
                "violations": len(fails),
                "fails": fails,
                "sec": round(time.time() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
