"""Mass fuzz of buffer against its metric invariants (no expected-output
corpus needed — the checks are the BufferResultMatcher criteria from the
reference, Operation/Buffer/Validate/BufferResultValidator.cs, applied as
closed-form properties):

  for d > 0:
    - result is valid and polygonal
    - result covers the input (every input vertex + edge midpoint locates
      inside or on the result)
    - every result-boundary vertex lies within [d*(1-tol), d*(1+tol)] of
      the input (round joins; mitred corners may exceed d by design)
    - area(result) >= area(input)
  for d < 0 (polygons):
    - result is valid, area(result) <= area(input)
    - every result vertex locates inside or on the input

Generator families: the overlay fuzz's perturbed rectangles / donuts /
L-shapes / rotated quads, random walks (linestrings), multipoints, and a
large-offset frame variant.  Usage:

    python tools/fuzz_buffer.py [--n N] [--seed S] [--offset X]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom.buffer import buffer
from nettopologysuite_ray.geom.types import Geom
from nettopologysuite_ray.geom.validity import is_valid
from nettopologysuite_ray.geom.wkt import to_wkt

from fuzz_overlay import make_pair  # reuse the adversarial area family


def make_line(rng, off):
    n = int(rng.integers(2, 10))
    pts = np.cumsum(rng.uniform(-3, 3, (n, 2)), axis=0) + off
    return Geom("LineString", pts)


def make_multipoint(rng, off):
    n = int(rng.integers(1, 6))
    pts = rng.uniform(-8, 8, (n, 2)) + off
    return Geom("MultiPoint", pts)


def _sample_input_points(g: Geom) -> np.ndarray:
    pts = []
    for c in g.flatten():
        arrs = c.data if isinstance(c.data, list) else [c.data]
        for a in arrs:
            a = np.asarray(a, dtype=float).reshape(-1, a.shape[-1])[:, :2]
            pts.append(a)
            if len(a) > 1:
                pts.append((a[:-1] + a[1:]) / 2.0)  # edge midpoints
    return np.vstack(pts) if pts else np.zeros((0, 2))


def _result_polys(res: Geom):
    return [c for c in res.flatten() if c.gtype == "Polygon"]


def _locate_many(pts: np.ndarray, res: Geom) -> np.ndarray:
    """Location of each point vs the polygonal result (−1 ext, 0 bnd, 1 int
    per locate_in_geom convention)."""
    return np.array([alg.locate_in_geom(float(p[0]), float(p[1]), res) for p in pts])


def check_one(g: Geom, d: float, quad_segs: int, join: str, cap: str):
    problems = []
    res = buffer(g, d, quad_segs=quad_segs, join=join, cap=cap)
    if res.is_empty:
        # flat/square caps on pure-point inputs legitimately produce
        # empty output in the reference (a point has no cap direction)
        if d > 0 and not g.is_empty and not (
            cap != "round" and g.dimension == 0
        ):
            problems.append("positive buffer came back empty")
        return problems, res
    if not is_valid(res):
        problems.append("result invalid")
        return problems, res
    tol = 0.012 * abs(d)  # quad_segs=8 chord sag is ~0.8% of d
    if d > 0:
        pts = _sample_input_points(g)
        if len(pts):
            loc = _locate_many(pts, res)
            if (loc < 0).any():
                bad = pts[loc < 0][0]
                problems.append(f"input point {tuple(bad)} outside positive buffer")
        if g.dimension == 2:
            a_in, a_out = alg.area(g), alg.area(res)
            if a_out < a_in - 1e-9 * max(a_in, 1.0):
                problems.append(f"area shrank: {a_in} -> {a_out}")
        if join == "round" and (cap == "round" or g.dimension == 2):
            # The distance band holds only for the fully-round style:
            # square caps place cap corners at d*sqrt(2), and flat/square
            # cap edges pass through the line endpoint (distance < d).
            # Polygon buffers take no caps, so only the join matters.
            # boundary vertices at distance ~d from the input
            for c in _result_polys(res):
                for ring in c.data:
                    ring = np.asarray(ring, dtype=float)[:, :2]
                    step = max(1, len(ring) // 24)  # sample, keep it cheap
                    for p in ring[::step]:
                        dd = alg.distance(Geom("Point", p[:2]), g)
                        if dd > d + tol or dd < d - tol:
                            # interior (hole) rings of line buffers can sit
                            # closer than d only if BELOW d — that is the
                            # real failure; above d means a stray lobe
                            problems.append(
                                f"boundary vertex at distance {dd} (d={d})"
                            )
                            break
                if problems:
                    break
    else:
        a_in, a_out = alg.area(g), alg.area(res)
        if a_out > a_in + 1e-9 * max(a_in, 1.0):
            problems.append(f"negative buffer grew area: {a_in} -> {a_out}")
        for c in _result_polys(res):
            ring = np.asarray(c.data[0], dtype=float)[:, :2]
            step = max(1, len(ring) // 16)
            loc = _locate_many(ring[::step], g)
            if (loc < 0).any():
                problems.append("negative-buffer vertex outside input")
                break
    return problems, res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--offset", type=float, default=0.0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    fails = []
    n_checked = 0
    for i in range(args.n):
        kind = rng.random()
        if kind < 0.5:
            a, b = make_pair(rng)
            g = a if rng.random() < 0.5 else b
            if args.offset:
                from nettopologysuite_ray.geom.transformer import transform_geometry

                g = transform_geometry(g, lambda c: c + args.offset)
        elif kind < 0.8:
            g = make_line(rng, args.offset)
        else:
            g = make_multipoint(rng, args.offset)
        d = float(rng.choice([0.05, 0.3, 1.0, 3.0]))
        if g.dimension == 2 and rng.random() < 0.4:
            d = -d
        join = "mitre" if rng.random() < 0.2 else "round"
        cap = str(rng.choice(["round", "flat", "square"]))
        try:
            problems, res = check_one(g, d, 8, join, cap)
        except Exception as e:  # noqa: BLE001
            problems = [f"exception: {type(e).__name__}: {e}"]
            res = None
        n_checked += 1
        if problems:
            fails.append(
                {
                    "i": i,
                    "d": d,
                    "join": join,
                    "cap": cap,
                    "problems": problems[:2],
                    "wkt": to_wkt(g)[:300],
                }
            )
            if len(fails) >= 8:
                break
    print(
        json.dumps(
            {
                "metric": "buffer invariant fuzz",
                "cases": n_checked,
                "violations": len(fails),
                "fails": fails[:8],
                "sec": round(time.time() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
