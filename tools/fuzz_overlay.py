"""Mass fuzz of the binary-overlay inclusion-exclusion system.

Generates adversarial near-coincident pairs (integer-lattice rectangles
and rotated quads with ulp-scale perturbations — the family that found
the round-2 silent-loss bugs) and checks, for every pair:

    area(A) + area(B) == area(A∪B) + area(A∩B)
    area(A−B) + area(A∩B) == area(A)
    area(B−A) + area(A∩B) == area(B)
    area(AΔB) == area(A∪B) − area(A∩B)
    all results valid

Much higher throughput than the hypothesis suite (no shrinking
machinery); prints one JSON line.  Usage:

    python tools/fuzz_overlay.py [--n N] [--seed S]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom.overlay import overlay
from nettopologysuite_ray.geom.types import Geom
from nettopologysuite_ray.geom.validity import is_valid
from nettopologysuite_ray.geom.wkt import to_wkt


def make_pair(rng):
    x0, y0 = rng.integers(-5, 5, 2)
    w1, h1 = rng.integers(1, 5, 2)
    hole = None
    kind = rng.random()
    if kind < 0.25:
        # donut: hole at exact quarter-lattice offsets (strictly interior)
        hole = np.array(
            [
                (x0 + 0.25 * w1, y0 + 0.25 * h1),
                (x0 + 0.75 * w1, y0 + 0.25 * h1),
                (x0 + 0.75 * w1, y0 + 0.75 * h1),
                (x0 + 0.25 * w1, y0 + 0.75 * h1),
                (x0 + 0.25 * w1, y0 + 0.25 * h1),
            ],
            dtype=float,
        )
        shell = np.array(
            [(x0, y0), (x0 + w1, y0), (x0 + w1, y0 + h1), (x0, y0 + h1), (x0, y0)],
            dtype=float,
        )
        a = Geom("Polygon", [shell, hole])
    elif kind < 0.45:
        # rectilinear L: cut the NE quadrant out of the rectangle
        cx, cy = x0 + 0.5 * w1, y0 + 0.5 * h1
        a = Geom.polygon(
            [
                (x0, y0),
                (x0 + w1, y0),
                (x0 + w1, cy),
                (cx, cy),
                (cx, y0 + h1),
                (x0, y0 + h1),
            ]
        )
    elif kind < 0.5:
        # pinch donut: hole touches the shell at exactly one corner
        # (valid per OGC; stresses the touching-hole ring splitter)
        shell = np.array(
            [(x0, y0), (x0 + w1, y0), (x0 + w1, y0 + h1), (x0, y0 + h1), (x0, y0)],
            dtype=float,
        )
        hole = np.array(
            [
                (x0, y0),  # shared corner
                (x0 + 0.5 * w1, y0 + 0.25 * h1),
                (x0 + 0.25 * w1, y0 + 0.5 * h1),
                (x0, y0),
            ],
            dtype=float,
        )
        a = Geom("Polygon", [shell, hole])
    elif kind < 0.55:
        # nested tower: donut whose hole contains an island that is
        # itself a donut — four nested rings, quarter-lattice offsets
        d = np.array([x0, y0], dtype=float)
        w, h = 4.0 * w1, 4.0 * h1

        def rect(fx0, fy0, fx1, fy1):
            return np.array(
                [
                    d + [w * fx0, h * fy0],
                    d + [w * fx1, h * fy0],
                    d + [w * fx1, h * fy1],
                    d + [w * fx0, h * fy1],
                    d + [w * fx0, h * fy0],
                ]
            )

        a = Geom(
            "MultiPolygon",
            [
                [rect(0, 0, 1, 1), rect(0.125, 0.125, 0.875, 0.875)],
                [rect(0.25, 0.25, 0.75, 0.75), rect(0.375, 0.375, 0.625, 0.625)],
            ],
        )
    elif kind < 0.6:
        # multipolygon: two rects separated by a gap that is sometimes a
        # few ulps wide (near-touching components stress multi handling)
        gap = rng.choice([1.0, 3e-15])  # valid multipolygon: components stay disjoint
        x2 = x0 + w1 + gap
        w3, h3 = rng.integers(1, 5, 2)
        a = Geom(
            "MultiPolygon",
            [
                [np.array(
                    [(x0, y0), (x0 + w1, y0), (x0 + w1, y0 + h1), (x0, y0 + h1), (x0, y0)],
                    dtype=float,
                )],
                [np.array(
                    [(x2, y0), (x2 + w3, y0), (x2 + w3, y0 + h3), (x2, y0 + h3), (x2, y0)],
                    dtype=float,
                )],
            ],
        )
    else:
        a = Geom.polygon(
            [(x0, y0), (x0 + w1, y0), (x0 + w1, y0 + h1), (x0, y0 + h1)]
        )
    r = rng.random()
    if hole is not None and r < 0.2:
        # B exactly coincident with A's hole ring (shared-boundary stress)
        return a, Geom.polygon([tuple(p) for p in hole[:-1]])
    if hole is not None and r < 0.35:
        # B = island strictly inside A's hole, every vertex ulp-perturbed
        hx0, hy0 = x0 + 0.25 * w1, y0 + 0.25 * h1
        hw, hh = 0.5 * w1, 0.5 * h1
        ring = np.array(
            [
                (hx0 + 0.25 * hw, hy0 + 0.25 * hh),
                (hx0 + 0.75 * hw, hy0 + 0.25 * hh),
                (hx0 + 0.75 * hw, hy0 + 0.75 * hh),
                (hx0 + 0.25 * hw, hy0 + 0.75 * hh),
            ],
            dtype=float,
        )
        ring += rng.integers(-3, 4, ring.shape) * np.spacing(np.maximum(np.abs(ring), 1.0))
        return a, Geom.polygon([tuple(p) for p in ring])
    if hole is not None and r < 0.5:
        # B = another donut offset by a ulp-perturbed lattice shift:
        # hole-against-hole and hole-against-shell interactions
        dx = float(rng.integers(-2, 3))
        dy = float(rng.integers(-2, 3))
        sh = a.data[0] + [dx, dy]
        ho = a.data[1] + [dx, dy]
        sh = sh + rng.integers(-3, 4, sh.shape) * np.spacing(np.maximum(np.abs(sh), 1.0))
        ho = ho + rng.integers(-3, 4, ho.shape) * np.spacing(np.maximum(np.abs(ho), 1.0))
        sh[-1] = sh[0]
        ho[-1] = ho[0]
        return a, Geom("Polygon", [sh, ho])
    if r < 0.15:
        # B shares exactly one vertex with A (corner-touch), exact or
        # perturbed by a few ulps — classic point-contact degeneracy
        corner = np.array([x0 + w1, y0 + h1], dtype=float)
        w2, h2 = rng.integers(1, 5, 2)
        ring = np.array(
            [corner, corner + [w2, 0], corner + [w2, h2], corner + [0, h2]],
            dtype=float,
        )
        if rng.random() < 0.5:
            ring += rng.integers(-2, 3, ring.shape) * np.spacing(
                np.maximum(np.abs(ring), 1.0)
            )
        return a, Geom.polygon([tuple(p) for p in ring])
    if r < 0.25:
        # B glued to A's right edge sharing a PARTIAL collinear segment
        # (exact adjacency with an interior sub-interval boundary)
        ex = float(x0 + w1)
        fy0 = y0 + 0.25 * h1
        fy1 = y0 + 0.75 * h1
        w2 = float(rng.integers(1, 4))
        ring = np.array(
            [(ex, fy0), (ex + w2, fy0), (ex + w2, fy1), (ex, fy1)], dtype=float
        )
        if rng.random() < 0.5:
            ring += rng.integers(-2, 3, ring.shape) * np.spacing(
                np.maximum(np.abs(ring), 1.0)
            )
        return a, Geom.polygon([tuple(p) for p in ring])
    if r < 0.55:
        # lattice-aligned B, every vertex perturbed by a few ulps
        bx0, by0 = x0 + rng.integers(-2, 3), y0 + rng.integers(-2, 3)
        w2, h2 = rng.integers(1, 5, 2)
        ring = np.array(
            [(bx0, by0), (bx0 + w2, by0), (bx0 + w2, by0 + h2), (bx0, by0 + h2)],
            dtype=float,
        )
        ring += rng.integers(-3, 4, ring.shape) * np.spacing(np.maximum(np.abs(ring), 1.0))
    else:
        # quad rotated by an ulp-scale angle around a lattice point
        t = rng.choice([-1, 1]) * 10.0 ** rng.uniform(-16, -12)
        R = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
        w2, h2 = rng.integers(1, 5, 2)
        cx, cy = x0 + rng.integers(-1, 2), y0 + rng.integers(-1, 2)
        base = np.array(
            [[-w2, -h2], [w2, -h2], [w2, h2], [-w2, h2]], dtype=float
        ) / 2.0
        ring = base @ R.T + [cx, cy]
    return a, Geom.polygon([tuple(p) for p in ring])


def make_pair_r4(rng):
    """Round-4 families: needle slivers, subdivided shared edges,
    concave radial stars, and large-offset frames (1e7, absolute ulp
    ~1e-9: cancellation-heavy) — shapes the r2/r3 families never hit."""
    kind = rng.random()
    if kind < 0.25:
        # needle sliver crossing a lattice rect: width down to 1e-9
        x0, y0 = rng.integers(-5, 5, 2)
        w1, h1 = rng.integers(2, 6, 2)
        a = Geom.polygon(
            [(x0, y0), (x0 + w1, y0), (x0 + w1, y0 + h1), (x0, y0 + h1)]
        )
        wid = 10.0 ** rng.uniform(-9, -2)
        t = rng.uniform(0, 2 * np.pi)
        c = np.array([x0 + 0.5 * w1, y0 + 0.5 * h1])
        d = np.array([np.cos(t), np.sin(t)])
        n_ = np.array([-d[1], d[0]]) * wid
        L = 4.0 * max(w1, h1)
        ring = np.array([c - d * L - n_, c + d * L - n_, c + d * L + n_, c - d * L + n_])
        return a, Geom.polygon([tuple(p) for p in ring])
    if kind < 0.5:
        # shared edge subdivided: B's boundary puts K extra vertices on
        # A's right edge (exact or ulp-off the supporting line)
        x0, y0 = rng.integers(-5, 5, 2)
        w1, h1 = rng.integers(2, 6, 2)
        a = Geom.polygon(
            [(x0, y0), (x0 + w1, y0), (x0 + w1, y0 + h1), (x0, y0 + h1)]
        )
        ex = float(x0 + w1)
        k = int(rng.integers(2, 6))
        ys = np.sort(rng.uniform(y0, y0 + h1, k))
        edge_pts = [(ex, float(y)) for y in ys]
        if rng.random() < 0.5:
            edge_pts = [
                (ex + rng.integers(-2, 3) * np.spacing(max(abs(ex), 1.0)), y)
                for (ex_, y) in edge_pts
            ]
        w2 = float(rng.integers(1, 4))
        ring = [(ex, float(y0))] + edge_pts + [
            (ex, float(y0 + h1)),
            (ex + w2, float(y0 + h1)),
            (ex + w2, float(y0)),
        ]
        return a, Geom.polygon(ring)
    if kind < 0.75:
        # concave radial stars: two random stars, vertices at mixed radii
        def star(cx, cy, n_arms, r_lo, r_hi, phase):
            ang = phase + np.linspace(0, 2 * np.pi, 2 * n_arms, endpoint=False)
            rad = np.where(np.arange(2 * n_arms) % 2 == 0, r_hi, r_lo)
            pts = np.c_[cx + rad * np.cos(ang), cy + rad * np.sin(ang)]
            return Geom.polygon([tuple(p) for p in pts])

        cx, cy = rng.uniform(-3, 3, 2)
        a = star(cx, cy, int(rng.integers(3, 9)), rng.uniform(0.3, 1.0),
                 rng.uniform(1.5, 3.0), rng.uniform(0, np.pi))
        dx, dy = rng.uniform(-2, 2, 2)
        b = star(cx + dx, cy + dy, int(rng.integers(3, 9)),
                 rng.uniform(0.3, 1.0), rng.uniform(1.5, 3.0),
                 rng.uniform(0, np.pi))
        return a, b
    if kind < 0.85:
        # mixed-scale contrast: a unit-scale operand vs one 1e5-1e6x
        # smaller sitting on/near its boundary — relative-epsilon logic
        # must not treat the small operand as degenerate
        x0, y0 = (float(v) for v in rng.integers(-5, 5, 2))
        w1, h1 = (float(v) for v in rng.integers(1, 5, 2))
        a = Geom.polygon(
            [(x0, y0), (x0 + w1, y0), (x0 + w1, y0 + h1), (x0, y0 + h1)]
        )
        s = 10.0 ** rng.uniform(-6, -5)
        # center the small square on a boundary point, a corner, or
        # just inside
        anchor = rng.random()
        if anchor < 0.4:
            cx, cy = x0 + w1, y0 + rng.uniform(0, h1)  # right edge
        elif anchor < 0.7:
            cx, cy = x0 + w1, y0 + h1  # corner
        else:
            cx, cy = x0 + rng.uniform(0.2, 0.8) * w1, y0 + rng.uniform(0.2, 0.8) * h1
        b = Geom.polygon(
            [
                (cx - s, cy - s),
                (cx + s, cy - s),
                (cx + s, cy + s),
                (cx - s, cy + s),
            ]
        )
        return a, b
    # large-offset frame: lattice pair translated to ~1e7 where one ulp
    # is ~2e-9 — the r2 ulp-perturbation families at absolute scale
    off = rng.choice([1e7, -1e7, 3.7e7]) + rng.uniform(-1, 1)
    x0 = float(rng.integers(-5, 5)) + off
    y0 = float(rng.integers(-5, 5)) + off
    w1, h1 = rng.integers(1, 5, 2)
    a = Geom.polygon([(x0, y0), (x0 + w1, y0), (x0 + w1, y0 + h1), (x0, y0 + h1)])
    bx0 = x0 + rng.integers(-2, 3)
    by0 = y0 + rng.integers(-2, 3)
    w2, h2 = rng.integers(1, 5, 2)
    ring = np.array(
        [(bx0, by0), (bx0 + w2, by0), (bx0 + w2, by0 + h2), (bx0, by0 + h2)],
        dtype=float,
    )
    ring += rng.integers(-3, 4, ring.shape) * np.spacing(np.maximum(np.abs(ring), 1.0))
    return a, Geom.polygon([tuple(p) for p in ring])


def check(a, b):
    u = overlay(a, b, "union")
    i = overlay(a, b, "intersection")
    d = overlay(a, b, "difference")
    dr = overlay(b, a, "difference")
    s = overlay(a, b, "symdifference")
    aa, ab = alg.area(a), alg.area(b)
    au, ai, ad, adr, asym = (alg.area(g) for g in (u, i, d, dr, s))
    # identity-appropriate scales (a mixed-scale pair must check the
    # small-operand identities against the SMALL area, not the union's),
    # floored at arithmetic noise
    def tol(scale):
        return 1e-6 * scale + 1e-14 * max(aa, ab, 1.0)

    errs = []
    if abs((aa + ab) - (au + ai)) > tol(max(aa, ab)):
        errs.append("u+i")
    if abs((ad + ai) - aa) > tol(aa):
        errs.append("d+i")
    if abs((adr + ai) - ab) > tol(ab):
        errs.append("d'+i")
    if abs(asym - (au - ai)) > tol(max(aa, ab)):
        errs.append("sym")
    for name, g in (("u", u), ("i", i), ("d", d), ("dr", dr), ("s", s)):
        if not is_valid(g):
            errs.append(f"invalid:{name}")
    return errs


def main():
    n = 20000
    seed = 0
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])
    fam = make_pair_r4 if "--r4" in sys.argv else make_pair
    rng = np.random.default_rng(seed)
    t0 = time.time()
    bad = []
    for k in range(n):
        a, b = fam(rng)
        errs = check(a, b)
        if errs:
            bad.append({"k": k, "errs": errs, "a": to_wkt(a), "b": to_wkt(b)})
            if len(bad) >= 20:
                break
    out = {
        "metric": "overlay inclusion-exclusion fuzz",
        "pairs": k + 1,
        "violations": len(bad),
        "sec": round(time.time() - t0, 1),
        "pairs_per_sec": round((k + 1) / (time.time() - t0), 1),
    }
    print(json.dumps(out))
    for r in bad:
        print(json.dumps(r))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
