"""Mass fuzz of line dissolve and coverage simplify against exact
set/area identities:

  dissolve_lines (reference Dissolve/LineDissolver.cs):
    - the output's undirected segment multiset == the input's DISTINCT
      undirected segment set (exact tuple equality — dedup exactly once,
      no segment lost, none invented, none duplicated)
    - total output length == sum of distinct segment lengths (exact sum
      comparison with ulp-scaled slack)
    - maximality: no output endpoint joins exactly two chain ends of
      degree 2 in the segment graph (such a node must have been merged
      through)

  coverage_simplify (reference Coverage/CoverageSimplifier.cs):
    - per-cell area sum == exact grid extent area (shared borders move
      CONSISTENTLY between neighbours, so pairwise gains/losses cancel;
      densified collinear vertices vanish without area change at small
      tolerance)
    - coverage_validate finds no shared-by->2 violations post-simplify
    - inner_only=True keeps the coverage's outer envelope vertex set
      intact (outer boundary exact)

Families: randomized nx x ny rectangular grids with collinear
densification on every edge, random cell widths/heights; random-walk
line networks with duplicated and reversed segments; at
0 / +1e7 / -3.7e7 frames.  Usage:

    python tools/fuzz_lines.py [--n N] [--seed S] [--offset X]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom.coverage_simplify import coverage_simplify
from nettopologysuite_ray.geom.extra import coverage_validate, dissolve_lines
from nettopologysuite_ray.geom.types import MULTILINESTRING, POLYGON, Geom


def make_network(rng, off):
    """MultiLineString with shared, duplicated and reversed segments."""
    lines = []
    n_walks = int(rng.integers(2, 6))
    # a shared lattice of anchor points forces genuine junctions
    anchors = rng.integers(0, 6, size=(8, 2)).astype(float) * 3.0 + off
    for _ in range(n_walks):
        k = int(rng.integers(2, 7))
        idx = rng.integers(0, len(anchors), size=k)
        pts = anchors[idx]
        # drop consecutive duplicates
        keep = np.r_[True, (pts[1:] != pts[:-1]).any(axis=1)]
        pts = pts[keep]
        if len(pts) < 2:
            continue
        lines.append(pts.copy())
        if rng.random() < 0.4:  # duplicate, sometimes reversed
            lines.append(pts[::-1].copy() if rng.random() < 0.5 else pts.copy())
    if not lines:
        lines = [np.array([[0.0, 0.0], [1.0, 0.0]]) + off]
    return Geom(MULTILINESTRING, lines)


def _seg_set(arrs):
    out = set()
    for arr in arrs:
        for i in range(len(arr) - 1):
            a = (float(arr[i][0]), float(arr[i][1]))
            b = (float(arr[i + 1][0]), float(arr[i + 1][1]))
            if a != b:
                out.add((min(a, b), max(a, b)))
    return out


def check_dissolve(g, problems):
    res = dissolve_lines(g)
    in_segs = _seg_set([arr for c in g.flatten() for arr in c.coords_list()])
    out_arrs = [arr for c in res.flatten() for arr in c.coords_list()]
    out_list = []
    for arr in out_arrs:
        for i in range(len(arr) - 1):
            a = (float(arr[i][0]), float(arr[i][1]))
            b = (float(arr[i + 1][0]), float(arr[i + 1][1]))
            out_list.append((min(a, b), max(a, b)))
    if len(out_list) != len(set(out_list)):
        problems.append("dissolve: duplicate segment in output")
        return
    if set(out_list) != in_segs:
        problems.append(
            f"dissolve: segment set mismatch ({len(out_list)} out vs {len(in_segs)} in)"
        )
        return
    # maximality: chain ends meeting at a degree-2 node should have merged
    deg: dict = {}
    for a, b in in_segs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    end_count: dict = {}
    for arr in out_arrs:
        for p in ((float(arr[0][0]), float(arr[0][1])), (float(arr[-1][0]), float(arr[-1][1]))):
            end_count[p] = end_count.get(p, 0) + 1
    for p, c in end_count.items():
        if c == 2 and deg.get(p, 0) == 2:
            # two open chain ends at a pass-through node (a closed ring's
            # seam start==end counts twice at a degree-2 node — allowed)
            ring_seam = any(
                (float(arr[0][0]), float(arr[0][1])) == p
                and (float(arr[-1][0]), float(arr[-1][1])) == p
                for arr in out_arrs
            )
            if not ring_seam:
                problems.append(f"dissolve: unmerged pass-through node {p}")
                return


def make_grid(rng, off):
    nx = int(rng.integers(2, 5))
    ny = int(rng.integers(2, 5))
    xs = np.concatenate([[0.0], np.cumsum(rng.integers(2, 8, nx).astype(float))])
    ys = np.concatenate([[0.0], np.cumsum(rng.integers(2, 8, ny).astype(float))])

    def dens(p0, p1, k):
        """k exact collinear midpoints between p0 and p1 (integer frame)."""
        t = np.linspace(0.0, 1.0, k + 2)[:, None]
        return (np.array(p0)[None, :] * (1 - t) + np.array(p1)[None, :] * t)[:-1]

    cells = []
    for i in range(nx):
        for j in range(ny):
            x0, x1, y0, y1 = xs[i], xs[i + 1], ys[j], ys[j + 1]
            k = int(rng.integers(1, 4))
            ring = np.vstack(
                [
                    dens((x0, y0), (x1, y0), k),
                    dens((x1, y0), (x1, y1), k),
                    dens((x1, y1), (x0, y1), k),
                    dens((x0, y1), (x0, y0), k),
                    np.array([[x0, y0]]),
                ]
            )
            cells.append(Geom(POLYGON, [ring + off]))
    extent = float(xs[-1] * ys[-1])
    return cells, extent


def check_coverage(rng, off, problems):
    cells, extent = make_grid(rng, off)
    # tolerance below the smallest outer-corner VW area (>= 0.5 * 0.5^2 =
    # 0.125 at min cell dim 2 and k<=3 densification): corners survive and
    # the exact area identity holds for BOTH modes — only the zero-area
    # densified collinear vertices are removable.  (Higher tolerances
    # legitimately clip outer corners in inner_only=False, as the
    # reference's CoverageSimplifier does.)
    tol = float(rng.uniform(0.01, 0.1))
    for inner in (False, True):
        out = coverage_simplify(cells, tol, inner_only=inner)
        if len(out) != len(cells):
            problems.append(f"coverage: {len(out)} cells from {len(cells)}")
            return
        mx = max(abs(float(v)) for g in cells for arr in g.coords_list() for q in arr for v in q)
        eps = float(np.spacing(max(mx, 1.0)))
        tot = sum(alg.area(g) for g in out)
        per = sum(alg.length(g) for g in cells)
        if abs(tot - extent) > 1e-9 * extent + 8 * eps * per:
            problems.append(
                f"coverage(inner={inner}): area sum {tot} != extent {extent}"
            )
            return
        bad = coverage_validate(out)
        if bad:
            problems.append(f"coverage(inner={inner}): {len(bad)} shared->2 segments")
            return
        if inner:
            # outer boundary exact: the combined envelope must still span
            # the full extent
            envs = [alg.envelope(g) for g in out]
            minx = min(e[0] for e in envs)
            miny = min(e[1] for e in envs)
            maxx = max(e[2] for e in envs)
            maxy = max(e[3] for e in envs)
            if abs((maxx - minx) * (maxy - miny) - extent) > 1e-9 * extent + 8 * eps * per:
                problems.append("coverage(inner): outer envelope changed")
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
        problems = []
        try:
            g = make_network(rng, args.offset)
            check_dissolve(g, problems)
            check_coverage(rng, args.offset, problems)
        except Exception as e:  # noqa: BLE001 — fuzz harness records all
            problems.append(f"exception: {type(e).__name__}: {e}")
        if problems:
            fails.append({"i": i, "problems": problems})
            if len(fails) >= 5:
                break
        if (i + 1) % 200 == 0:
            print(f"  ... {i + 1}/{args.n}, {len(fails)} failures", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "dissolve/coverage invariant fuzz",
                "cases": args.n,
                "violations": len(fails),
                "fails": fails,
                "sec": round(time.time() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
