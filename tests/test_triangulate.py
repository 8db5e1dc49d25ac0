"""Delaunay / Voronoi tests: structural invariants + brute-force checks."""

import numpy as np

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom.triangulate import _in_circle, delaunay, delaunay_triangles, voronoi
from nettopologysuite_ray.geom.types import Geom
from nettopologysuite_ray.geom.wkt import from_wkt


def test_delaunay_square():
    g = from_wkt("MULTIPOINT ((0 0), (10 0), (10 10), (0 10))")
    tris, pts = delaunay_triangles(g)
    assert len(tris) == 2
    # triangulation covers the square exactly
    total = sum(
        abs(alg.ring_signed_area(np.array([pts[a], pts[b], pts[c], pts[a]])))
        for a, b, c in tris
    )
    assert abs(total - 100.0) < 1e-9


def test_delaunay_empty_circumcircles():
    """Delaunay property: no point strictly inside any triangle's circumcircle."""
    rng = np.random.default_rng(5)
    pts = rng.integers(0, 1000, size=(40, 2)).astype(float)
    g = Geom("MultiPoint", [p for p in pts])
    tris, P = delaunay_triangles(g)
    assert len(tris) >= 1
    # every input point covered by some triangle or on hull; area sums to hull area
    hull_area = alg.area(alg.convex_hull(g))
    total = sum(
        abs(alg.ring_signed_area(np.array([P[a], P[b], P[c], P[a]]))) for a, b, c in tris
    )
    assert abs(total - hull_area) < 1e-6 * max(hull_area, 1)
    for a, b, c in tris:
        for i in range(len(P)):
            if i in (a, b, c):
                continue
            assert (
                _in_circle(P[a][0], P[a][1], P[b][0], P[b][1], P[c][0], P[c][1], P[i][0], P[i][1])
                <= 0
            ), (a, b, c, i)


def test_voronoi_cells_partition_and_nearest():
    g = from_wkt("MULTIPOINT ((0 0), (10 0), (5 8), (2 4))")
    v = voronoi(g)
    cells = [c for c in v.flatten()]
    assert len(cells) == 4
    # each cell's interior point is nearest to exactly its own site
    pts = np.unique(g.all_coords(), axis=0)
    for cell in cells:
        ip = alg.interior_point(cell)
        d = np.hypot(pts[:, 0] - ip.data[0], pts[:, 1] - ip.data[1])
        owner = int(np.argmin(d))
        # the owning site must be inside-or-on this cell
        assert alg.locate_in_geom(pts[owner][0], pts[owner][1], cell) != alg.EXTERIOR


def test_delaunay_collinear_degenerate():
    g = from_wkt("MULTIPOINT ((0 0), (5 5), (10 10))")
    tris, _p = delaunay_triangles(g)
    assert tris == []  # no triangle from collinear points
    assert delaunay(g).is_empty
