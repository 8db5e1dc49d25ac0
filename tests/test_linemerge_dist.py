"""Distributed line dissolve == in-process kernel (geom.extra.dissolve_lines)
on linework that crosses tile boundaries: chains through cells, junctions
splitting chains, duplicate segments across input rows, cycles, and
isolated dangles (legitimate lines here, unlike polygonize)."""

import numpy as np
import pyarrow as pa
import pytest

from nettopologysuite_ray.geom.extra import dissolve_lines
from nettopologysuite_ray.geom.types import Geom
from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb


def _seg(a, b):
    return Geom("LineString", np.array([a, b], dtype=np.float64))


def _path(pts):
    return Geom("LineString", np.array(pts, dtype=np.float64))


def _canon(arr):
    """Direction/rotation-free canonical form of a line's vertex list."""
    pts = [(float(p[0]), float(p[1])) for p in arr]
    if pts[0] == pts[-1]:  # closed: canonical rotation + direction
        body = pts[:-1]
        best = None
        for seq in (body, body[::-1]):
            for s in range(len(seq)):
                rot = tuple(seq[s:] + seq[:s])
                if best is None or rot < best:
                    best = rot
        return best + (best[0],)
    rev = pts[::-1]
    return tuple(min(pts, rev))


def _kernel(lines):
    out = dissolve_lines(Geom("GeometryCollection", list(lines)))
    return sorted(_canon(arr) for comp in out.flatten() for arr in comp.coords_list())


def _dist(lines, cell):
    import ray.data as rd

    from nettopologysuite_ray.stages.linemerge import distributed_line_dissolve

    tbl = pa.table({"wkb": pa.array([to_wkb(l) for l in lines], type=pa.binary())})
    rows = distributed_line_dissolve(
        rd.from_arrow(tbl), cell=cell
    ).take_all()
    return sorted(_canon(from_wkb(r["line_wkb"]).data) for r in rows)


CASES = [
    # long chain across many tiles + T-junction splitting it
    (
        "chain_T",
        lambda: [_path([(i, 0) for i in range(12)]), _seg((5, 0), (5, 3))],
        2.5,
    ),
    # duplicates from different input rows (global dedup through cells)
    (
        "dups",
        lambda: [
            _path([(0, 0), (4, 0), (8, 0)]),
            _path([(4, 0), (8, 0)]),  # duplicate sub-path
            _seg((8, 0), (12, 0)),
        ],
        3.0,
    ),
    # cycle crossing tiles + spur (spur survives: no pruning here)
    (
        "cycle_spur",
        lambda: [
            _path([(0, 0), (6, 0), (6, 6), (0, 6), (0, 0)]),
            _seg((6, 6), (10, 9)),
        ],
        4.0,
    ),
    # cross: four chains meeting at one junction on a tile corner
    (
        "cross",
        lambda: [
            _path([(-5, 0), (0, 0), (5, 0)]),
            _path([(0, -5), (0, 0), (0, 5)]),
        ],
        5.0,
    ),
    # two disjoint squares sharing a corner vertex (degree 4 there)
    (
        "fig8",
        lambda: [
            _path([(0, 0), (3, 0), (3, 3), (0, 3), (0, 0)]),
            _path([(3, 3), (6, 3), (6, 6), (3, 6), (3, 3)]),
        ],
        2.0,
    ),
]


@pytest.mark.parametrize("name,mk,cell", CASES, ids=[c[0] for c in CASES])
def test_distributed_dissolve_matches_kernel(ray_session, name, mk, cell):
    lines = mk()
    exp = _kernel(lines)
    got = _dist(lines, cell)
    assert got == exp, f"{name}: {len(got)} vs {len(exp)} lines"


def test_distributed_dissolve_cell_invariance(ray_session):
    lines = [
        _path([(i, (i * 3) % 5) for i in range(10)]),
        _seg((4, 1), (4, 8)),
        _seg((4, 8), (9, 8)),
        _path([(0, 0), (0, 7), (9, 8)]),
    ]
    exp = _kernel(lines)
    for cell in (2.0, 3.5, 50.0):
        assert _dist(lines, cell) == exp, f"cell={cell}"
