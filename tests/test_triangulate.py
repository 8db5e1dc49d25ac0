"""Delaunay / Voronoi tests: structural invariants + brute-force checks."""

import numpy as np

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom.triangulate import _in_circle, delaunay, delaunay_triangles, voronoi
from nettopologysuite_ray.geom.types import MULTIPOINT, Geom
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


def test_voronoi_area_partition_random():
    rng = np.random.default_rng(42)
    pts = rng.uniform(0, 1000, size=(300, 2)).round(2)
    g = Geom(MULTIPOINT, [np.array([p]) for p in pts])
    v = voronoi(g)
    assert len(v.data) == len(np.unique(pts, axis=0))
    env = alg.envelope(g)
    w, h = env[2] - env[0], env[3] - env[1]
    tot = sum(alg.area(c) for c in v.data)
    assert abs(tot / ((2 * w) * (2 * h)) - 1.0) < 1e-9


def test_voronoi_collinear_sites():
    g = from_wkt("MULTIPOINT ((0 0), (10 0), (20 0), (30 0))")
    v = voronoi(g)
    cells = list(v.flatten())
    assert len(cells) == 4
    # collinear fallback: cells are vertical strips tiling the clip env
    tot = sum(alg.area(c) for c in cells)
    assert abs(tot - 60.0) < 1e-9  # clip env 60 wide x 1 tall (h -> 1.0)


def test_voronoi_explicit_clip_smaller_than_extent():
    g = from_wkt("MULTIPOINT ((0 0), (10 0), (5 8), (2 4), (100 100))")
    v = voronoi(g, clip_env=(0, 0, 12, 10))
    cells = list(v.flatten())
    # the far site's cell is clipped away or shrunk; cells tile the rect
    tot = sum(alg.area(c) for c in cells)
    assert abs(tot - 120.0) < 1e-9
    for c in cells:
        e = alg.envelope(c)
        assert e[0] >= -1e-12 and e[1] >= -1e-12
        assert e[2] <= 12 + 1e-12 and e[3] <= 10 + 1e-12


def test_delaunay_collinear_degenerate():
    g = from_wkt("MULTIPOINT ((0 0), (5 5), (10 10))")
    tris, _p = delaunay_triangles(g)
    assert tris == []  # no triangle from collinear points
    assert delaunay(g).is_empty


def _edge_set(g, nd=7):
    out = set()
    for comp in g.flatten():
        a = comp.all_coords()
        for i in range(len(a) - 1):
            p = (round(float(a[i, 0]), nd), round(float(a[i, 1]), nd))
            q = (round(float(a[i + 1, 0]), nd), round(float(a[i + 1, 1]), nd))
            out.add((min(p, q), max(p, q)))
    return out


def _segs_cross(e1, e2):
    from nettopologysuite_ray.geom import algorithms as alg

    (p0, p1), (q0, q1) = e1, e2
    o1 = alg.orient2d(*p0, *p1, *q0) * alg.orient2d(*p0, *p1, *q1)
    o2 = alg.orient2d(*q0, *q1, *p0) * alg.orient2d(*q0, *q1, *p1)
    return o1 < 0 and o2 < 0


def _check_conforming(got, expected_wkt):
    """Edge sets must match exactly, except for diagonal flips of EXACTLY
    cocircular quads (Delaunay ties — the reference QuadEdge engine and
    our Bowyer-Watson may break them differently; both are valid)."""
    from nettopologysuite_ray.geom.triangulate import _in_circle
    from nettopologysuite_ray.geom.wkt import from_wkt

    exp = _edge_set(from_wkt(expected_wkt))
    gs = _edge_set(got)
    missing = exp - gs
    extra = gs - exp
    assert len(missing) == len(extra), (missing, extra)
    for e in missing:
        mates = [x for x in extra if _segs_cross(e, x)]
        assert len(mates) == 1, (e, mates)
        (a, b), (c, d) = e, mates[0]
        assert _in_circle(*a, *c, *b, *d) == 0, (e, mates[0])


def test_conforming_delaunay_random():
    """reference: test/.../Triangulate/ConformingDelaunayTest.cs TestRandom
    — including the exact Steiner points the split-point finder creates."""
    from nettopologysuite_ray.geom.triangulate import conforming_delaunay_edges
    from nettopologysuite_ray.geom.wkt import from_wkt

    sites = from_wkt(
        "MULTIPOINT ((90 290), (120 250), (280 250), (200 200), (220 290), (170 320), (110 180), (70 140), (180 110), (210 80), (250 120))"
    )
    cons = from_wkt(
        "MULTILINESTRING ((130 160, 150 280, 200 250), (180 120, 240 230), (40 270, 90 220), (90 270, 130 290, 100 280, 140 310))"
    )
    got = conforming_delaunay_edges(sites, cons)
    # the reference's Steiner points appear verbatim
    vs = {tuple(p) for comp in got.flatten() for p in comp.all_coords()}
    for steiner in [
        (218.21656050955414, 190.06369426751593),
        (143.51351351351352, 241.0810810810811),
        (136.05405405405406, 196.32432432432432),
        (124.0, 298.0),
        (102.0, 276.0),
    ]:
        assert steiner in vs, steiner
    _check_conforming(
        got,
        "MULTILINESTRING ((220 290, 280 250), (170 320, 220 290), (170 320, 140 310), (90 290, 140 310), (90 290, 40 270), (70 140, 40 270), (70 140, 210 80), (210 80, 250 120), (280 250, 250 120), (250 120, 240 230), (280 250, 240 230), (240 230, 220 290), (200 250, 240 230), (220 290, 200 250), (150 280, 200 250), (220 290, 150 280), (170 320, 150 280), (140 310, 150 280), (130 290, 150 280), (130 290, 140 310), (130 290, 124 298), (140 310, 124 298), (90 290, 124 298), (100 280, 124 298), (90 290, 100 280), (90 270, 100 280), (90 290, 90 270), (90 270, 40 270), (90 220, 90 270), (40 270, 90 220), (90 220, 70 140), (110 180, 90 220), (70 140, 110 180), (110 180, 130 160), (70 140, 130 160), (180 110, 130 160), (70 140, 180 110), (180 110, 210 80), (180 110, 250 120), (180 110, 180 120), (250 120, 180 120), (180 120, 218.21656050955414 190.06369426751593), (250 120, 218.21656050955414 190.06369426751593), (240 230, 218.21656050955414 190.06369426751593), (200 200, 218.21656050955414 190.06369426751593), (200 200, 240 230), (200 200, 200 250), (200 200, 143.51351351351352 241.0810810810811), (200 250, 143.51351351351352 241.0810810810811), (150 280, 143.51351351351352 241.0810810810811), (120 250, 143.51351351351352 241.0810810810811), (120 250, 150 280), (120 250, 130 290), (120 250, 102 276), (130 290, 102 276), (100 280, 102 276), (100 280, 130 290), (90 270, 102 276), (120 250, 90 270), (120 250, 90 220), (120 250, 136.05405405405406 196.32432432432432), (136.05405405405406 196.32432432432432, 90 220), (136.05405405405406 196.32432432432432, 110 180), (130 160, 136.05405405405406 196.32432432432432), (200 200, 136.05405405405406 196.32432432432432), (130 160, 200 200), (200 200, 180 120), (130 160, 180 120), (143.51351351351352 241.0810810810811, 136.05405405405406 196.32432432432432))",
    )


def test_conforming_delaunay_polygon_with_hole():
    from nettopologysuite_ray.geom.triangulate import conforming_delaunay_edges
    from nettopologysuite_ray.geom.wkt import from_wkt

    sites = from_wkt("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    cons = from_wkt("LINESTRING (4 4, 6 4, 6 6, 4 6, 4 4)")
    got = conforming_delaunay_edges(sites, cons)
    _check_conforming(
        got,
        "MULTILINESTRING ((0 10, 10 10), (0 0, 0 10), (0 0, 10 0), (10 0, 10 10), (6 4, 10 0), (6 4, 10 10), (6 4, 6 6), (6 6, 10 10), (4 6, 6 6), (4 6, 10 10), (0 10, 4 6), (4 4, 4 6), (0 10, 4 4), (0 0, 4 4), (4 4, 10 0), (4 4, 6 4), (4 6, 6 4))",
    )
    # all constraint segments appear as edges (after splitting: here none)
    es = _edge_set(got)
    for seg in [((4.0, 4.0), (6.0, 4.0)), ((6.0, 4.0), (6.0, 6.0)), ((4.0, 6.0), (6.0, 6.0)), ((4.0, 4.0), (4.0, 6.0))]:
        assert seg in es
