"""Distributed polygonize == in-process kernel, on linework that crosses
tile boundaries every way the phases must handle: plain grids, diagonal
splits, boundary-crossing faces, holes whose shell lives in another
phase, disconnected islands, dangle chains across cells, figure-8 and
theta graphs through shared vertices."""

import numpy as np
import pyarrow as pa
import pytest

from nettopologysuite_ray.geom.algorithms import normalize
from nettopologysuite_ray.geom.construct import polygonize
from nettopologysuite_ray.geom.types import Geom
from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
from nettopologysuite_ray.geom.wkt import to_wkt


def _seg(a, b):
    return Geom("LineString", np.array([a, b], dtype=np.float64))


def _ring_lines(pts):
    return [_seg(pts[i], pts[i + 1]) for i in range(len(pts) - 1)] + [
        _seg(pts[-1], pts[0])
    ]


def _kernel_faces(lines):
    gc = Geom("GeometryCollection", list(lines))
    out = polygonize(gc)
    return sorted(to_wkt(normalize(p)) for p in out.data)


def _dist_faces(lines, cell):
    import ray.data as rd

    from nettopologysuite_ray.stages.polygonize import distributed_polygonize

    tbl = pa.table({"wkb": pa.array([to_wkb(l) for l in lines], type=pa.binary())})
    faces = distributed_polygonize(
        rd.from_arrow(tbl), cell=cell, num_partitions=4
    ).take_all()
    return sorted(to_wkt(normalize(from_wkb(r["face_wkb"]))) for r in faces)


def _grid_lines(nx, ny, c=10.0, diag=None, drop=None):
    lines = []
    for i in range(nx):
        for j in range(ny):
            x, y = i * c, j * c
            if i + 1 < nx and (drop is None or not drop(i, j, "h")):
                lines.append(_seg((x, y), (x + c, y)))
            if j + 1 < ny and (drop is None or not drop(i, j, "v")):
                lines.append(_seg((x, y), (x, y + c)))
    if diag:
        for i in range(nx - 1):
            for j in range(ny - 1):
                if diag(i, j):
                    lines.append(_seg((i * c, j * c), ((i + 1) * c, (j + 1) * c)))
    return lines


CASES = [
    # plain 5x4 grid, tiles cut through every block (cell 7 vs spacing 10)
    ("grid", lambda: _grid_lines(5, 4), 7.0),
    # grid + diagonals in a hash pattern (triangle faces across tiles)
    ("diag", lambda: _grid_lines(5, 5, diag=lambda i, j: (i * 31 + j * 17) % 3 == 0), 8.0),
    # 2x2 superblock (interior streets removed) + floating island ring
    # inside it: island's CW outer ring must become the superblock's hole
    (
        "island",
        lambda: _grid_lines(
            5,
            5,
            drop=lambda i, j, d: (d == "v" and i == 2 and j in (1, 2))
            or (d == "h" and j == 2 and i in (1, 2)),
        )
        + _ring_lines([(22, 22), (28, 22), (28, 28), (22, 28)]),
        6.0,
    ),
    # figure-8: two squares sharing one vertex, split by a tile boundary
    (
        "fig8",
        lambda: _ring_lines([(0, 0), (10, 0), (10, 10), (0, 10)])
        + _ring_lines([(10, 10), (20, 10), (20, 20), (10, 20)]),
        9.0,
    ),
    # theta graph: two faces sharing a chord, crossing tiles
    (
        "theta",
        lambda: _ring_lines([(0, 0), (30, 0), (30, 20), (0, 20)])
        + [_seg((0, 0), (30, 20))],
        8.0,
    ),
    # dangles: a chain crossing several tiles + a spur off a face vertex
    (
        "dangles",
        lambda: _ring_lines([(0, 0), (10, 0), (10, 10), (0, 10)])
        + [_seg((10, 10), (25, 10)), _seg((25, 10), (40, 25)), _seg((0, 0), (-15, -3))],
        6.0,
    ),
    # nested: big ring, inner ring (hole), ring inside the hole (island
    # face) — all crossing tile lines
    (
        "nested",
        lambda: _ring_lines([(0, 0), (40, 0), (40, 40), (0, 40)])
        + _ring_lines([(8, 8), (32, 8), (32, 32), (8, 32)])
        + _ring_lines([(15, 15), (25, 15), (25, 25), (15, 25)]),
        11.0,
    ),
]


@pytest.mark.parametrize("name,mk,cell", CASES, ids=[c[0] for c in CASES])
def test_distributed_polygonize_matches_kernel(ray_session, name, mk, cell):
    lines = mk()
    exp = _kernel_faces(lines)
    got = _dist_faces(lines, cell)
    assert got == exp, f"{name}: {len(got)} vs {len(exp)} faces"


def test_distributed_polygonize_cell_size_invariance(ray_session):
    """Same faces whatever the tile size — boundary stitching does not
    depend on where the tile lines fall."""
    lines = _grid_lines(4, 4, diag=lambda i, j: (i + j) % 2 == 0)
    exp = _kernel_faces(lines)
    for cell in (5.0, 10.0, 35.0, 100.0):
        assert _dist_faces(lines, cell) == exp, f"cell={cell}"
