"""GeometryFixer fuzzer — port of the reference's
test/NetTopologySuite.Tests.NUnit.Performance/Performance/Geometries/
Utility/GeometryFixerFuzzer.cs generation strategy: random polygons with
0-9 random-ring holes, rings either uniform-random vertex chains
("line" family) or randomly-placed buffer circles ("circle" family),
over a 100x100 extent.

Invariants checked per case (stronger than the reference's validity-only
assert):
  1. fix_geometry(g) is valid;
  2. all result coordinates are finite;
  3. re-fixing the fixed geometry preserves validity and area to 1e-9
     relative (weak idempotence).

Usage: python tools/fuzz_fixer.py [--iters N] [--seed S] [--family line|circle|both]
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np

sys.path.insert(0, ".")

from nettopologysuite_ray.geom import algorithms as alg  # noqa: E402
from nettopologysuite_ray.geom.buffer import buffer as buffer_op  # noqa: E402
from nettopologysuite_ray.geom.extra import fix_geometry  # noqa: E402
from nettopologysuite_ray.geom.types import POINT, POLYGON, Geom  # noqa: E402
from nettopologysuite_ray.geom.validity import is_valid  # noqa: E402
from nettopologysuite_ray.geom.wkt import to_wkt  # noqa: E402

EXTENT = 100.0


def random_line_ring(rng: np.random.Generator, n: int) -> np.ndarray:
    pts = rng.random((n, 2)) * EXTENT
    return np.vstack([pts, pts[:1]])


def random_circle_ring(rng: np.random.Generator, n: int) -> np.ndarray:
    quad_segs = max(n // 4 + 1, 3)
    center = rng.random(2) * EXTENT
    radius = EXTENT * rng.random() / 2
    if radius <= 0.0:
        radius = 1.0
    circle = buffer_op(Geom(POINT, center), radius, quad_segs=quad_segs)
    return circle.data[0]


def random_poly(
    rng: np.random.Generator, family: str, num_points: int = 100, max_holes: int = 10
) -> Geom:
    num_holes = int(rng.integers(0, max_holes))
    n = num_points // (num_holes + 1)
    make = random_line_ring if family == "line" else random_circle_ring
    rings = [make(rng, max(n, 4)) for _ in range(num_holes + 1)]
    return Geom(POLYGON, rings)


def run(
    iters: int, seed: int, family: str, num_points: int = 100, max_holes: int = 10
) -> int:
    rng = np.random.default_rng(seed)
    fails = 0
    families = ["line", "circle"] if family == "both" else [family]
    for i in range(iters):
        fam = families[i % len(families)]
        g = random_poly(rng, fam, num_points=num_points, max_holes=max_holes)
        try:
            fixed = fix_geometry(g)
        except Exception as ex:  # noqa: BLE001
            print(f"[{i}] {fam}: EXCEPTION {type(ex).__name__}: {ex}")
            print(to_wkt(g))
            fails += 1
            continue
        problems = []
        if not is_valid(fixed):
            problems.append("fixed result invalid")
        coords = fixed.all_coords()
        if len(coords) and not np.isfinite(coords).all():
            problems.append("non-finite output coordinate")
        a1 = alg.area(fixed)
        refixed = fix_geometry(fixed)
        if not is_valid(refixed):
            problems.append("re-fixed result invalid")
        a2 = alg.area(refixed)
        if not math.isclose(a1, a2, rel_tol=1e-9, abs_tol=1e-9):
            problems.append(f"re-fix changed area {a1} -> {a2}")
        if problems:
            fails += 1
            print(f"[{i}] {fam}: {'; '.join(problems)}")
            print(to_wkt(g))
        if (i + 1) % 50 == 0:
            print(f"  ... {i + 1}/{iters}, {fails} failures", flush=True)
    print(f"done: {iters} iterations, {fails} failures")
    return fails


if __name__ == "__main__":
    # NOTE on scale: a 10-hole random-line polygon repairs into ~100
    # overlapping faces whose hole union/difference runs ~900 self-heal-
    # checked overlays (seconds per case) — the robustness tax is
    # deliberate (see COVERAGE.md overlay hardening), so the default
    # complexity here is smaller than the reference fuzzer's 100/10.
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("--family", choices=("line", "circle", "both"), default="both")
    ap.add_argument("--num-points", type=int, default=48)
    ap.add_argument("--max-holes", type=int, default=5)
    args = ap.parse_args()
    sys.exit(
        1
        if run(args.iters, args.seed, args.family, args.num_points, args.max_holes)
        else 0
    )
