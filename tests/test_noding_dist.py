"""Distributed bulk noding == single-process brute force over the same
robust intersection kernel, plus composition with distributed polygonize
(raw crossing linework → node → faces == kernel polygonize of the
brute-noded input)."""

import numpy as np
import pyarrow as pa
import pytest

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom.types import Geom
from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb


def _seg(a, b):
    return Geom("LineString", np.array([a, b], dtype=np.float64))


def _path(pts):
    return Geom("LineString", np.array(pts, dtype=np.float64))


def _brute_node(lines):
    """Reference behavior in one process: canonical segments, all-pairs
    robust intersection, split, dedup identical outputs per parent."""
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
            kind, pts = alg.segment_intersection(
                segs[i][0], segs[i][1], segs[j][0], segs[j][1]
            )
            for pt in pts:
                pt = (float(pt[0]), float(pt[1]))
                for s in (segs[i], segs[j]):
                    if pt != s[0] and pt != s[1]:
                        splits[s].add(pt)
    out = set()  # canonical dedup: partially-overlapping collinear
    # parents share their overlap piece, which distributed_node emits
    # ONCE (its documented contract — downstream face assembly needs
    # each undirected edge exactly once; r4 added the global dedup stage
    # that enforces this across parents)
    for (s0, s1), pts in splits.items():
        dx, dy = s1[0] - s0[0], s1[1] - s0[1]
        axis = 0 if abs(dx) >= abs(dy) else 1
        rev = (dx if axis == 0 else dy) < 0
        chain = [s0] + sorted(pts, key=lambda p: p[axis], reverse=rev) + [s1]
        for k in range(len(chain) - 1):
            a, b = chain[k], chain[k + 1]
            if a != b:
                out.add((min(a, b), max(a, b)))
    return sorted(out)


def _dist_node(lines, cell):
    import ray.data as rd

    from nettopologysuite_ray.stages.noding import distributed_node

    tbl = pa.table({"wkb": pa.array([to_wkb(l) for l in lines], type=pa.binary())})
    rows = distributed_node(rd.from_arrow(tbl), cell=cell, as_wkb=False).take_all()
    return sorted(
        (
            (min((r["x0"], r["y0"]), (r["x1"], r["y1"]))),
            (max((r["x0"], r["y0"]), (r["x1"], r["y1"]))),
        )
        for r in rows
    )


CASES = [
    # X crossing at a non-vertex point, across tile lines
    ("cross", lambda: [_seg((0, 0), (10, 10)), _seg((0, 10), (10, 0))], 3.0),
    # many long lines crossing each other (star)
    (
        "star",
        lambda: [
            _seg((0, 5), (20, 5)),
            _seg((10, -5), (10, 15)),
            _seg((0, 0), (20, 10)),
            _seg((0, 10), (20, 0)),
        ],
        4.0,
    ),
    # collinear partial overlap: splits at the shared interval endpoints
    ("overlap", lambda: [_seg((0, 0), (10, 0)), _seg((5, 0), (15, 0))], 4.0),
    # T touch: endpoint on another segment's interior
    ("tee", lambda: [_seg((0, 0), (10, 0)), _seg((5, 0), (5, 7))], 3.0),
    # multi-vertex paths crossing
    (
        "paths",
        lambda: [
            _path([(0, 0), (5, 3), (10, 0), (15, 3)]),
            _path([(0, 3), (5, 0), (10, 3), (15, 0)]),
        ],
        2.5,
    ),
]


@pytest.mark.parametrize("name,mk,cell", CASES, ids=[c[0] for c in CASES])
def test_distributed_node_matches_brute(ray_session, name, mk, cell):
    lines = mk()
    exp = _brute_node(lines)
    got = _dist_node(lines, cell)
    assert got == exp, f"{name}: {len(got)} vs {len(exp)}"


def test_node_then_polygonize(ray_session):
    """Raw (un-noded) crossing linework → distributed_node →
    distributed_polygonize == kernel polygonize of the brute-noded
    input: the composition the 100-TB pipeline runs."""
    import ray.data as rd

    from nettopologysuite_ray.geom.algorithms import normalize
    from nettopologysuite_ray.geom.construct import polygonize
    from nettopologysuite_ray.geom.wkt import to_wkt
    from nettopologysuite_ray.stages.noding import distributed_node
    from nettopologysuite_ray.stages.polygonize import distributed_polygonize

    # two overlapping rectangles drawn as RAW closed paths (not noded)
    lines = [
        _path([(0, 0), (12, 0), (12, 8), (0, 8), (0, 0)]),
        _path([(6, 4), (18, 4), (18, 12), (6, 12), (6, 4)]),
    ]
    noded_kernel = [
        _seg(a, b) for a, b in _brute_node(lines)
    ]
    exp = sorted(
        to_wkt(normalize(p))
        for p in polygonize(Geom("GeometryCollection", noded_kernel)).data
    )
    tbl = pa.table({"wkb": pa.array([to_wkb(l) for l in lines], type=pa.binary())})
    noded = distributed_node(rd.from_arrow(tbl), cell=5.0)
    faces = distributed_polygonize(noded, cell=5.0).take_all()
    got = sorted(to_wkt(normalize(from_wkb(r["face_wkb"]))) for r in faces)
    assert got == exp
    assert len(got) == 3  # two lobes + the lens
