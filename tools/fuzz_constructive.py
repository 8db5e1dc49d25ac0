"""Mass fuzz of the constructive per-record kernels against closed-form
invariants (reference test semantics applied as properties, the way
fuzz_buffer applies BufferResultValidator):

  convex_hull:
    - valid, contains every input point (locate != exterior)
    - hull vertices are a subset of input points (exact match)
    - hull of hull == hull (idempotent, area-equal)
  minimum_bounding_circle (reference MinimumBoundingCircle.cs):
    - every input point within radius (+ulp slack) of the center
    - at least 2 input points ON the circle (within ulp slack) unless
      the input is a single point (r == 0)
  minimum_diameter (reference MinimumDiameter.cs):
    - width <= every direction's caliper width sampled at input-edge
      normals (the minimum over sampled directions can't beat it by
      more than float slack)
  simplify_dp / simplify_tp (reference DouglasPeucker/TopologyPreserving):
    - dp: every simplified vertex is an input vertex; result within
      Hausdorff tol of input (sampled directed check input->simplified)
    - tp: result valid, same component count, area within the
      perimeter x tol band of the input area
  densify (reference Densifier.cs):
    - no output segment longer than max_len (+ulp slack)
    - vertices lie ON the input segments; total length preserved
      (relative ulp-scaled slack)

Families: perturbed convex rings, concave radial stars, random walks,
Gaussian clusters, collinear runs; at 0 / +1e7 / -3.7e7 frames.  Usage:

    python tools/fuzz_constructive.py [--n N] [--seed S] [--offset X]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom.extra import minimum_bounding_circle, minimum_diameter
from nettopologysuite_ray.geom.types import LINESTRING, MULTIPOINT, POLYGON, Geom
from nettopologysuite_ray.geom.validity import is_valid


def make_geom(rng, off):
    fam = int(rng.integers(0, 5))
    if fam == 0:  # perturbed convex ring -> polygon
        n = int(rng.integers(3, 24))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(5, 15)
        pts = np.column_stack([r * np.cos(ang), r * np.sin(ang)])
        pts += rng.normal(0, 0.01, pts.shape)
        ring = np.vstack([pts, pts[:1]]) + off
        if alg.ring_signed_area(ring) < 0:
            ring = ring[::-1].copy()
        return Geom(POLYGON, [ring])
    if fam == 1:  # concave radial star
        n = int(rng.integers(4, 16))
        ang = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
        rad = np.where(np.arange(2 * n) % 2 == 0, rng.uniform(8, 15), rng.uniform(2, 6))
        pts = np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])
        ring = np.vstack([pts, pts[:1]]) + off
        if alg.ring_signed_area(ring) < 0:
            ring = ring[::-1].copy()
        return Geom(POLYGON, [ring])
    if fam == 2:  # random walk line
        n = int(rng.integers(2, 20))
        pts = np.cumsum(rng.uniform(-3, 3, (n, 2)), axis=0) + off
        return Geom(LINESTRING, pts)
    if fam == 3:  # gaussian cluster multipoint
        n = int(rng.integers(2, 30))
        pts = rng.normal(0, rng.uniform(0.1, 5.0), (n, 2)) + off
        return Geom(MULTIPOINT, [p for p in pts])
    # collinear run (degenerate hull)
    n = int(rng.integers(3, 10))
    t = np.sort(rng.uniform(0, 20, n))
    d = rng.uniform(-1, 1, 2)
    d /= max(np.hypot(*d), 1e-12)
    pts = t[:, None] * d + off
    return Geom(MULTIPOINT, [p for p in pts])


def _uniq_pts(g):
    return np.unique(g.all_coords(), axis=0)


def _eps(g):
    c = g.all_coords()
    mx = float(np.abs(c).max()) if len(c) else 1.0
    return float(np.spacing(max(mx, 1.0)))


def check_hull(g, problems):
    h = alg.convex_hull(g)
    pts = _uniq_pts(g)
    eps = _eps(g)
    if h.gtype == POLYGON:
        if not is_valid(h):
            problems.append("hull invalid")
            return
        for p in pts:
            if alg.locate_in_geom(float(p[0]), float(p[1]), h) == alg.EXTERIOR:
                problems.append(f"hull excludes input point {tuple(p)}")
                return
        hv = {tuple(q) for q in h.data[0][:-1]}
        inp = {tuple(q) for q in pts}
        if not hv.issubset(inp):
            problems.append("hull vertex not an input point")
        h2 = alg.convex_hull(h)
        a1, a2 = alg.area(h), alg.area(h2)
        if abs(a1 - a2) > 1e-12 * max(a1, 1.0) + 100 * eps * alg.length(h):
            problems.append(f"hull not idempotent: {a1} vs {a2}")


def check_mbc(g, problems):
    (cx, cy), r = minimum_bounding_circle(g)
    pts = _uniq_pts(g)
    eps = _eps(g)
    slack = 64 * eps + 1e-12 * max(r, 1.0)
    d = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
    if (d > r + slack).any():
        problems.append(f"point outside MBC by {float((d - r).max())}")
    if len(pts) >= 2:
        on = int((d >= r - 2 * np.sqrt(max(r, 1.0)) * np.sqrt(eps) - slack).sum())
        if on < 2:
            problems.append(f"only {on} support points on MBC (r={r})")


def check_min_diameter(g, problems):
    width, _seg = minimum_diameter(g)
    pts = _uniq_pts(g)
    eps = _eps(g)
    if len(pts) < 2:
        return
    # sampled caliper widths: project on normals of hull edges
    h = alg.convex_hull(g)
    if h.gtype != POLYGON:
        # degenerate hull: width must be ~0
        if width > 100 * eps:
            problems.append(f"collinear input but width={width}")
        return
    ring = h.data[0]
    best = None
    for i in range(len(ring) - 1):
        ex, ey = ring[i + 1][0] - ring[i][0], ring[i + 1][1] - ring[i][1]
        ll = float(np.hypot(ex, ey))
        if ll == 0:
            continue
        nx, ny = -ey / ll, ex / ll
        proj = pts[:, 0] * nx + pts[:, 1] * ny
        w = float(proj.max() - proj.min())
        best = w if best is None else min(best, w)
    # rotating-calipers minimum is over hull-edge normals exactly
    if best is not None and width > best + 1e-9 * max(best, 1.0) + 100 * eps:
        problems.append(f"min diameter {width} > sampled caliper {best}")


def _point_seg_dist(p, a, b):
    ab = b - a
    t = float(np.dot(p - a, ab) / max(float(np.dot(ab, ab)), 1e-300))
    t = min(1.0, max(0.0, t))
    q = a + t * ab
    return float(np.hypot(*(p - q)))


def check_simplify(g, problems):
    tol = 0.5
    eps = _eps(g)
    sd = alg.simplify_dp(g, tol)
    inp = {tuple(q) for q in g.all_coords()}
    for q in sd.all_coords():
        if tuple(q) not in inp:
            problems.append("dp introduced a new vertex")
            return
    # directed Hausdorff input->simplified within tol (+slack)
    for comp in g.flatten():
        arrs = comp.data if isinstance(comp.data, list) else [comp.data]
        for arr in arrs:
            arr = np.asarray(arr, dtype=float).reshape(-1, np.asarray(arr).shape[-1])[:, :2]
            segs = []
            for sc in sd.flatten():
                sarrs = sc.data if isinstance(sc.data, list) else [sc.data]
                for sa in sarrs:
                    sa = np.asarray(sa, dtype=float).reshape(-1, np.asarray(sa).shape[-1])[:, :2]
                    segs.extend((sa[i], sa[i + 1]) for i in range(len(sa) - 1))
            if not segs:
                continue
            # rings get 2x tol: the seam-endpoint removal pass (reference
            # DouglasPeuckerLineSimplifier ring handling) re-approximates
            # chains that were already within tol of the seam segments, so
            # the guarantee near the seam is additive (tol + tol)
            bound = (2.0 * tol if comp.gtype == POLYGON else tol) + 1000 * eps
            for p in arr:
                dmin = min(_point_seg_dist(p, a, b) for a, b in segs)
                if dmin > bound:
                    problems.append(f"dp Hausdorff breach {dmin}")
                    return
    if g.gtype == POLYGON:
        st = alg.simplify_tp(g, tol)
        if not st.is_empty:
            if not is_valid(st):
                problems.append("tp result invalid")
            na = alg.area(st)
            oa = alg.area(g)
            band = tol * alg.length(g) + 1000 * eps
            if abs(na - oa) > band:
                problems.append(f"tp area drift {oa} -> {na}")


def check_densify(g, problems):
    if g.dimension == 0:
        return
    max_len = 1.5
    eps = _eps(g)
    dd = alg.densify(g, max_len)
    lin = alg.length(g)
    lout = alg.length(dd)
    if abs(lin - lout) > 1e-12 * max(lin, 1.0) + 1000 * eps:
        problems.append(f"densify length drift {lin} -> {lout}")
    for comp in dd.flatten():
        arrs = comp.data if isinstance(comp.data, list) else [comp.data]
        for arr in arrs:
            arr = np.asarray(arr, dtype=float).reshape(-1, np.asarray(arr).shape[-1])[:, :2]
            if len(arr) < 2:
                continue
            seg = np.hypot(*(arr[1:] - arr[:-1]).T)
            if (seg > max_len + 1000 * eps).any():
                problems.append(f"densify segment {float(seg.max())} > {max_len}")
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
        g = make_geom(rng, args.offset)
        problems = []
        try:
            check_hull(g, problems)
            check_mbc(g, problems)
            check_min_diameter(g, problems)
            check_simplify(g, problems)
            check_densify(g, problems)
        except Exception as e:  # noqa: BLE001 — fuzz harness records all
            problems.append(f"exception: {type(e).__name__}: {e}")
        if problems:
            fails.append({"i": i, "problems": problems, "gtype": g.gtype})
            if len(fails) >= 5:
                break
        if (i + 1) % 200 == 0:
            print(f"  ... {i + 1}/{args.n}, {len(fails)} failures", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "constructive-kernel invariant fuzz",
                "cases": args.n,
                "violations": len(fails),
                "fails": fails,
                "sec": round(time.time() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
