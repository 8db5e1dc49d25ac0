"""Randomized parity fuzz for the distributed topology composition:
random integer linework → distributed_node → distributed_polygonize /
distributed_line_dissolve, compared against the in-process kernels run
on the brute-noded input.  Integer coordinates keep the robust
intersection kernel exact, so parity must be EXACT."""

import random

import numpy as np
import pyarrow as pa
import pytest

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom.algorithms import normalize
from nettopologysuite_ray.geom.construct import polygonize
from nettopologysuite_ray.geom.extra import dissolve_lines
from nettopologysuite_ray.geom.types import Geom
from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
from nettopologysuite_ray.geom.wkt import to_wkt


def _brute_node(lines):
    segs = set()
    for g in lines:
        for comp in g.flatten():
            for arr in comp.coords_list():
                for i in range(len(arr) - 1):
                    p0 = (float(arr[i, 0]), float(arr[i, 1]))
                    p1 = (float(arr[i + 1, 0]), float(arr[i + 1, 1]))
                    if p0 != p1:
                        segs.add((min(p0, p1), max(p0, p1)))
    segs = sorted(segs)
    splits = {s: set() for s in segs}
    for i in range(len(segs)):
        for j in range(i + 1, len(segs)):
            _kind, pts = alg.segment_intersection(
                segs[i][0], segs[i][1], segs[j][0], segs[j][1]
            )
            for pt in pts:
                pt = (float(pt[0]), float(pt[1]))
                for s in (segs[i], segs[j]):
                    if pt != s[0] and pt != s[1]:
                        splits[s].add(pt)
    out = set()
    for (s0, s1), pts in splits.items():
        dx, dy = s1[0] - s0[0], s1[1] - s0[1]
        # dominant axis + direction-consistent off-axis tiebreak (same
        # deterministic rule as stages/noding._resplit)
        axis = 0 if abs(dx) >= abs(dy) else 1
        o = 1 - axis
        rev = (dx if axis == 0 else dy) < 0
        revo = (dx if o == 0 else dy) < 0

        def _k(p, axis=axis, o=o, rev=rev, revo=revo):
            return (-p[axis] if rev else p[axis], -p[o] if revo else p[o])

        chain = [s0] + sorted(pts, key=_k) + [s1]
        for k in range(len(chain) - 1):
            if chain[k] != chain[k + 1]:
                out.add((min(chain[k], chain[k + 1]), max(chain[k], chain[k + 1])))
    return sorted(out)


def _random_lines(rng: random.Random, n: int, extent: int):
    """Random integer segments + a few rectangles (face makers)."""
    lines = []
    for _ in range(n):
        x0, y0 = rng.randint(0, extent), rng.randint(0, extent)
        x1, y1 = rng.randint(0, extent), rng.randint(0, extent)
        if (x0, y0) != (x1, y1):
            lines.append(
                Geom("LineString", np.array([(x0, y0), (x1, y1)], dtype=np.float64))
            )
    for _ in range(max(2, n // 4)):
        x, y = rng.randint(0, extent - 2), rng.randint(0, extent - 2)
        w = rng.randint(1, max(1, extent - x - 1))
        h = rng.randint(1, max(1, extent - y - 1))
        ring = [(x, y), (x + w, y), (x + w, y + h), (x, y + h), (x, y)]
        lines.append(Geom("LineString", np.array(ring, dtype=np.float64)))
    return lines


def _canon_line(arr):
    pts = [(float(p[0]), float(p[1])) for p in arr]
    if pts[0] == pts[-1]:
        body = pts[:-1]
        best = None
        for seq in (body, body[::-1]):
            for s in range(len(seq)):
                rot = tuple(seq[s:] + seq[:s])
                if best is None or rot < best:
                    best = rot
        return best + (best[0],)
    return tuple(min(pts, pts[::-1]))


@pytest.mark.parametrize("seed", [11, 23, 47, 61])
def test_node_polygonize_dissolve_fuzz(ray_session, seed):
    import ray.data as rd

    from nettopologysuite_ray.stages.linemerge import distributed_line_dissolve
    from nettopologysuite_ray.stages.noding import distributed_node
    from nettopologysuite_ray.stages.polygonize import distributed_polygonize

    rng = random.Random(seed)
    lines = _random_lines(rng, n=14, extent=20)
    cell = rng.choice([3.0, 5.0, 7.5])

    noded_kernel = [
        Geom("LineString", np.array([a, b], dtype=np.float64))
        for a, b in _brute_node(lines)
    ]
    exp_faces = sorted(
        to_wkt(normalize(p))
        for p in polygonize(Geom("GeometryCollection", noded_kernel)).data
    )
    exp_merge = sorted(
        _canon_line(arr)
        for comp in dissolve_lines(
            Geom("GeometryCollection", noded_kernel)
        ).flatten()
        for arr in comp.coords_list()
    )

    tbl = pa.table({"wkb": pa.array([to_wkb(l) for l in lines], type=pa.binary())})
    noded = distributed_node(rd.from_arrow(tbl), cell=cell).materialize()
    got_faces = sorted(
        to_wkt(normalize(from_wkb(r["face_wkb"])))
        for r in distributed_polygonize(noded, cell=cell).take_all()
    )
    assert got_faces == exp_faces, f"seed={seed} cell={cell}"
    got_merge = sorted(
        _canon_line(from_wkb(r["line_wkb"]).data)
        for r in distributed_line_dissolve(noded, cell=cell).take_all()
    )
    assert got_merge == exp_merge, f"seed={seed} cell={cell}"
