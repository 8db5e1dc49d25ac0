"""Unit tests for the geometry kernel: codecs, algorithms, indexes, SFC keys."""

import numpy as np
import pytest

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom.hilbert import (
    hilbert_decode,
    hilbert_encode,
    morton_encode,
)
from nettopologysuite_ray.geom.index import GridIndex, STRtree, _env_dist
from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt

ROUND_TRIP = [
    "POINT (10 20)",
    "POINT EMPTY",
    "LINESTRING (0 0, 10 10, 20 0)",
    "LINESTRING EMPTY",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    "POLYGON EMPTY",
    "MULTIPOINT ((1 1), (2 2))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
    "GEOMETRYCOLLECTION EMPTY",
]


@pytest.mark.parametrize("wkt", ROUND_TRIP)
def test_wkt_wkb_round_trip(wkt):
    g = from_wkt(wkt)
    assert to_wkt(g) == wkt
    g2 = from_wkb(to_wkb(g))
    assert to_wkt(g2) == wkt


def test_wkt_alt_spellings():
    assert to_wkt(from_wkt("MULTIPOINT (1 1, 2 2)")) == "MULTIPOINT ((1 1), (2 2))"
    assert to_wkt(from_wkt("point(3.5 -4.25)")) == "POINT (3.5 -4.25)"
    # Z ordinates are carried through IO (round 2: out-of-band extra)
    assert to_wkt(from_wkt("POINT Z (1 2 3)")) == "POINT Z (1 2 3)"
    assert to_wkt(from_wkt("LINESTRING(0 0 5, 1 1 6)")) == "LINESTRING Z (0 0 5, 1 1 6)"


def test_wkb_big_endian():
    # hand-built big-endian point
    import struct

    buf = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 3.0, 4.0)
    assert to_wkt(from_wkb(buf)) == "POINT (3 4)"


POLY = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")


def test_area_length():
    assert alg.area(POLY) == 96.0
    assert alg.length(POLY) == 48.0
    assert alg.area(from_wkt("LINESTRING (0 0, 5 5)")) == 0.0


def test_locate():
    assert alg.locate_in_geom(5, 5, POLY) == alg.INTERIOR
    assert alg.locate_in_geom(3, 3, POLY) == alg.EXTERIOR  # inside hole
    assert alg.locate_in_geom(0, 0, POLY) == alg.BOUNDARY
    assert alg.locate_in_geom(2, 3, POLY) == alg.BOUNDARY  # hole edge
    assert alg.locate_in_geom(99, 99, POLY) == alg.EXTERIOR


def test_locate_vectorized_matches_scalar():
    rng = np.random.default_rng(7)
    pts = np.round(rng.uniform(-2, 12, (500, 2)) * 2) / 2  # hit edges sometimes
    vec = alg.locate_points_in_rings(pts, POLY.data)
    for i in range(len(pts)):
        assert vec[i] == alg.locate_in_geom(pts[i, 0], pts[i, 1], POLY)


def test_locate_on_line_mod2():
    ls = from_wkt("LINESTRING (0 0, 10 0)")
    assert alg.locate_in_geom(0, 0, ls) == alg.BOUNDARY
    assert alg.locate_in_geom(5, 0, ls) == alg.INTERIOR
    assert alg.locate_in_geom(5, 1, ls) == alg.EXTERIOR
    closed = from_wkt("LINESTRING (0 0, 10 0, 10 10, 0 0)")
    assert alg.locate_in_geom(0, 0, closed) == alg.INTERIOR  # closed: no boundary


def test_centroid():
    assert to_wkt(alg.centroid(from_wkt("MULTIPOINT ((10 10), (20 20))"))) == "POINT (15 15)"
    assert (
        to_wkt(alg.centroid(from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")))
        == "POINT (5 5)"
    )
    assert to_wkt(alg.centroid(from_wkt("POINT EMPTY"))) == "POINT EMPTY"


def test_convex_hull():
    h = alg.convex_hull(from_wkt("MULTIPOINT ((0 0), (10 0), (10 10), (0 10), (5 5))"))
    assert alg.equals_exact(
        alg.normalize(h), alg.normalize(from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"))
    )
    assert to_wkt(alg.convex_hull(from_wkt("POINT (3 3)"))) == "POINT (3 3)"
    assert (
        to_wkt(alg.convex_hull(from_wkt("MULTIPOINT ((0 0), (5 5), (10 10)))")))
        == "LINESTRING (0 0, 10 10)"
    )


def test_distance():
    assert alg.distance(from_wkt("POINT (20 5)"), POLY) == 10.0
    assert alg.distance(from_wkt("POINT (5 5)"), POLY) == 0.0
    assert alg.distance(from_wkt("LINESTRING (0 0, 1 1)"), from_wkt("LINESTRING (1 0, 0 1)")) == 0.0


def test_interior_point_inside():
    ip = alg.interior_point(POLY)
    assert alg.locate_in_geom(ip.data[0], ip.data[1], POLY) == alg.INTERIOR


def test_normalize_equivalence():
    a = from_wkt("POLYGON ((0 0, 140 0, 140 140, 0 140, 0 0))")
    b = from_wkt("POLYGON ((140 0, 0 0, 0 140, 140 140, 140 0))")
    assert alg.equals_exact(alg.normalize(a), alg.normalize(b))


def test_hilbert_bijective_and_adjacent():
    ix, iy = np.meshgrid(np.arange(16), np.arange(16))
    d = hilbert_encode(ix.ravel(), iy.ravel(), 4)
    assert sorted(d.tolist()) == list(range(256))
    x, y = hilbert_decode(np.arange(256), 4)
    steps = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (steps == 1).all()


def test_morton():
    assert morton_encode(np.array([3]), np.array([5]))[0] == 39


def test_strtree_query_and_knn():
    rng = np.random.default_rng(0)
    lo = rng.uniform(0, 100, (300, 2))
    boxes = np.hstack([lo, lo + rng.uniform(0.1, 3, (300, 2))])
    t = STRtree(boxes)
    q = (20.0, 20.0, 30.0, 30.0)
    got = set(t.query(*q).tolist())
    brute = set(
        np.nonzero(
            (boxes[:, 0] <= q[2])
            & (boxes[:, 2] >= q[0])
            & (boxes[:, 1] <= q[3])
            & (boxes[:, 3] >= q[1])
        )[0].tolist()
    )
    assert got == brute
    nn = t.nearest(50, 50, k=3)
    bd = sorted((_env_dist(boxes[i], 50, 50), i) for i in range(300))[:3]
    assert [i for _, i in nn] == [i for _, i in bd]


def test_grid_index_candidates_cover_truth():
    rng = np.random.default_rng(1)
    lo = rng.uniform(0, 100, (200, 2))
    boxes = np.hstack([lo, lo + 2.0])
    g = GridIndex(boxes)
    pts = rng.uniform(-5, 105, (500, 2))
    pi, ii = g.query_points(pts[:, 0], pts[:, 1])
    cand = set(zip(pi.tolist(), ii.tolist()))
    hits = (
        (boxes[None, :, 0] <= pts[:, 0][:, None])
        & (boxes[None, :, 2] >= pts[:, 0][:, None])
        & (boxes[None, :, 1] <= pts[:, 1][:, None])
        & (boxes[None, :, 3] >= pts[:, 1][:, None])
    )
    true_pairs = set(zip(*np.nonzero(hits)))
    assert true_pairs <= cand


def test_gml_kml_roundtrip():
    """GML2/GML3/KML IO (reference: IO/GML2/GMLWriter.cs:20,
    IO/KML/KMLReader.cs:16): every geometry type roundtrips exactly;
    the reader is dialect- and namespace-agnostic."""
    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.gml import from_gml, to_gml2, to_gml3
    from nettopologysuite_ray.geom.kml import from_kml, to_kml
    from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt

    cases = [
        "POINT (10 20)",
        "LINESTRING (0 0, 10 5, 20 0)",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
        "MULTIPOINT ((1 2), (3 4))",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), ((10 10, 15 10, 15 15, 10 15, 10 10)))",
        "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 2 2), POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0)))",
        "POINT (10.25 -3.5)",
    ]
    for w in cases:
        g = from_wkt(w)
        for enc, dec in ((to_gml2, from_gml), (to_gml3, from_gml), (to_kml, from_kml)):
            assert alg.equals_exact(dec(enc(g)), g), (enc.__name__, w)
    # GML2 dialect detail: comma-in-tuple coordinates
    assert "<gml:coordinates>0,0 10,5 20,0</gml:coordinates>" in to_gml2(from_wkt(cases[1]))
    # GML3 dialect: posList with flat ordinates
    assert "<gml:posList>0 0 10 5 20 0</gml:posList>" in to_gml3(from_wkt(cases[1]))
    # reader tolerates Placemark wrappers and z ordinates (dropped)
    doc = (
        '<kml xmlns="http://www.opengis.net/kml/2.2"><Placemark>'
        "<Point><coordinates>1,2,30</coordinates></Point></Placemark></kml>"
    )
    assert to_wkt(from_kml(doc)) == "POINT (1 2)"


def test_zm_roundtrip_wkt_wkb():
    """Z/M ordinates round-trip through WKT and WKB via the out-of-band
    Geom.extra record (reference: IO/WKBReader.cs:660-699 round-trips
    Z/M); operators remain 2-D and drop them."""
    from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
    from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt

    cases = [
        "POINT Z (1 2 3)",
        "POINT M (1 2 3)",
        "LINESTRING ZM (0 0 1 10, 1 1 2 20)",
        "POLYGON Z ((0 0 1, 1 0 2, 1 1 3, 0 0 1))",
        "MULTIPOINT Z ((10 10 1), (90 10 2))",
        "MULTILINESTRING Z ((0 0 1, 1 1 2), (2 2 3, 3 3 4))",
        "MULTIPOLYGON Z (((0 0 1, 1 0 2, 1 1 3, 0 0 1)))",
        "GEOMETRYCOLLECTION (POINT Z (1 2 3), LINESTRING (0 0, 1 1))",
    ]
    for w in cases:
        g = from_wkt(w)
        assert to_wkt(g) == w
        assert to_wkt(from_wkb(to_wkb(g))) == w
        b = to_wkb(g)
        assert to_wkb(from_wkb(b)) == b
    # untagged 3rd ordinate reads as Z
    assert to_wkt(from_wkt("POINT (1 2 3)")) == "POINT Z (1 2 3)"
    # ops drop Z (2-D kernel, documented)
    from nettopologysuite_ray.geom import algorithms as alg

    assert alg.area(from_wkt("POLYGON Z ((0 0 5, 2 0 5, 2 2 5, 0 0 5))")) == 2.0
