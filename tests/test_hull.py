"""ConcaveHull ports (reference:
test/NetTopologySuite.Tests.NUnit/Algorithm/Hull/ConcaveHullTest.cs)."""

import pytest

from nettopologysuite_ray.geom.hull import concave_hull
from nettopologysuite_ray.geom.predicates import equals_topo
from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt

WKT_SIMPLE = "MULTIPOINT ((14 18), (18 14), (15 6), (15 2), (5 5), (3 13), (8 14), (8 10), (16 8))"
WKT_CIRCLE = "MULTIPOINT ((90 20), (80 10), (45 5), (10 20), (20 10), (21 30), (40 20), (11 60), (20 70), (20 90), (40 80), (70 80), (80 60), (90 70), (80 90), (56 95), (95 45), (80 40), (70 20), (15 45), (5 40), (40 96), (60 15))"


def check(got, expected_wkt):
    exp = from_wkt(expected_wkt)
    assert equals_topo(got, exp), f"got {to_wkt(got)} expected {expected_wkt}"


LENGTH_CASES = [
    ("MULTIPOINT EMPTY", 70, "POLYGON EMPTY"),
    ("MULTIPOINT ((10 10), (10 10))", 70, "POINT (10 10)"),
    ("LINESTRING (10 10, 20 20, 30 30)", 70, "LINESTRING (10 10, 30 30)"),
    (
        "MULTIPOINT ((10 10), (90 10), (30 70))",
        70,
        "POLYGON ((10 10, 30 70, 90 10, 10 10))",
    ),
    (
        "MULTIPOINT ((10 10), (90 10), (30 70), (70 70), (50 60))",
        70,
        "POLYGON ((30 70, 70 70, 90 10, 50 60, 10 10, 30 70))",
    ),
    (
        "MULTIPOINT ((10 10), (90 10), (70 70), (50 60), (50 90), (40 70), (30 30))",
        0,
        "POLYGON ((10 10, 40 70, 50 90, 70 70, 90 10, 50 60, 30 30, 10 10))",
    ),
    (
        "MULTIPOINT ((10 10), (90 10), (70 70), (50 60), (50 90), (40 70), (30 30))",
        100,
        "POLYGON ((10 10, 40 70, 50 90, 70 70, 90 10, 10 10))",
    ),
    (
        WKT_SIMPLE,
        8,
        "POLYGON ((8 10, 5 5, 3 13, 8 14, 14 18, 18 14, 16 8, 15 2, 15 6, 8 10))",
    ),
]


@pytest.mark.parametrize("wkt,maxlen,expected", LENGTH_CASES)
def test_hull_by_length(wkt, maxlen, expected):
    got = concave_hull(from_wkt(wkt), max_edge_length=maxlen)
    if from_wkt(expected).is_empty:
        assert got.is_empty
    else:
        check(got, expected)


RATIO_CASES = [
    (
        "MULTIPOINT ((70 80), (80 90), (90 70), (50 80), (30 70), (20 40), (30 20), (50 10), (90 20), (40 50), (40 30), (41 67))",
        0.2,
        "POLYGON ((20 40, 30 70, 50 80, 80 90, 90 70, 70 80, 41 67, 40 50, 40 30, 90 20, 50 10, 30 20, 20 40))",
    ),
    (
        "MULTIPOINT ((10 90), (10 10), (90 10), (90 90), (40 40), (60 30), (30 70), (40 60), (60 50), (60 72), (47 66), (90 60))",
        0,
        "POLYGON ((30 70, 10 90, 60 72, 90 90, 90 60, 90 10, 60 30, 10 10, 40 40, 60 50, 47 66, 40 60, 30 70))",
    ),
    (
        "MULTIPOINT ((10 90), (10 10), (90 10), (90 90), (40 40), (60 30), (30 70), (40 60), (60 50), (60 72), (47 66), (90 60))",
        0.5,
        "POLYGON ((30 70, 10 90, 60 72, 90 90, 90 60, 90 10, 60 30, 10 10, 40 40, 30 70))",
    ),
    (
        "MULTIPOINT ((10 90), (10 10), (90 10), (90 90), (40 40), (60 30), (30 70), (40 60), (60 50), (60 72), (47 66), (90 60))",
        1,
        "POLYGON ((10 10, 10 90, 90 90, 90 60, 90 10, 10 10))",
    ),
    (
        "MULTIPOINT ((584245.72096874 7549593.72686167), (584251.71398371 7549594.01629478), (584242.72446125 7549593.58214511), (584230.73978847 7549592.9760418), (584233.73581213 7549593.13045099), (584236.7318358 7549593.28486019), (584239.72795377 7549593.43742855), (584227.74314188 7549592.83423486))",
        0.75,
        "POLYGON ((584227.74314188 7549592.83423486, 584239.72795377 7549593.43742855, 584242.72446125 7549593.58214511, 584245.72096874 7549593.72686167, 584251.71398371 7549594.01629478, 584230.73978847 7549592.9760418, 584227.74314188 7549592.83423486))",
    ),
]


@pytest.mark.parametrize("wkt,ratio,expected", RATIO_CASES)
def test_hull_by_length_ratio(wkt, ratio, expected):
    got = concave_hull(from_wkt(wkt), length_ratio=ratio)
    check(got, expected)


def test_hull_holes_circle():
    got = concave_hull(from_wkt(WKT_CIRCLE), max_edge_length=40, holes_allowed=True)
    check(
        got,
        "POLYGON ((20 90, 40 96, 56 95, 80 90, 90 70, 95 45, 90 20, 80 10, 45 5, 20 10, 10 20, 5 40, 11 60, 20 90), (20 70, 15 45, 40 20, 70 20, 80 40, 80 60, 70 80, 40 80, 20 70))",
    )


def test_hull_holes_circle0():
    got = concave_hull(from_wkt(WKT_CIRCLE), max_edge_length=0, holes_allowed=True)
    check(
        got,
        "POLYGON ((20 90, 40 96, 56 95, 70 80, 80 90, 90 70, 80 60, 95 45, 80 40, 70 20, 90 20, 80 10, 60 15, 45 5, 40 20, 40 80, 15 45, 21 30, 20 10, 10 20, 5 40, 11 60, 20 70, 20 90))",
    )


def test_alpha_simple():
    got = concave_hull(from_wkt(WKT_SIMPLE), alpha=4)
    check(
        got,
        "POLYGON ((5 5, 3 13, 8 14, 14 18, 18 14, 16 8, 8 10, 15 6, 15 2, 5 5))",
    )


def test_alpha_circle():
    got = concave_hull(from_wkt(WKT_CIRCLE), alpha=20)
    check(
        got,
        "POLYGON ((20 70, 20 90, 40 96, 56 95, 80 90, 90 70, 95 45, 90 20, 80 10, 60 15, 45 5, 20 10, 10 20, 5 40, 11 60, 20 70))",
    )


def test_alpha_with_holes_circle():
    got = concave_hull(from_wkt(WKT_CIRCLE), alpha=20, holes_allowed=True)
    check(
        got,
        "POLYGON ((20 90, 40 96, 56 95, 80 90, 90 70, 95 45, 90 20, 80 10, 60 15, 45 5, 20 10, 10 20, 5 40, 11 60, 20 70, 20 90), (40 80, 15 45, 21 30, 40 20, 70 20, 80 40, 80 60, 70 80, 40 80))",
    )


# -- ConcaveHullOfPolygons ports (reference:
# test/NetTopologySuite.Tests.NUnit/Algorithm/Hull/ConcaveHullOfPolygonsTest.cs)

from nettopologysuite_ray.geom.hull import concave_hull_of_polygons


CHP_TIGHT = [
    ("MULTIPOLYGON EMPTY", 1000, "POLYGON EMPTY"),
    (
        "POLYGON ((1 9, 5 8, 9 9, 4 4, 7 1, 2 1, 1 9))",
        1000,
        "POLYGON ((1 9, 5 8, 9 9, 4 4, 7 1, 2 1, 1 9))",
    ),
    (
        "MULTIPOLYGON (((100 200, 100 300, 150 250, 200 300, 200 200, 100 200)), ((100 100, 200 100, 150 50, 100 100)))",
        1000,
        "POLYGON ((100 100, 100 200, 100 300, 150 250, 200 300, 200 200, 200 100, 150 50, 100 100))",
    ),
    (
        "MULTIPOLYGON (((1 9, 5 8, 9 9, 9 6, 6 4, 4 4, 1 6, 1 9)), ((1 1, 4 3, 6 3, 9 1, 1 1)))",
        0,
        "MULTIPOLYGON (((1 9, 5 8, 9 9, 9 6, 6 4, 4 4, 1 6, 1 9)), ((1 1, 4 3, 6 3, 9 1, 1 1)))",
    ),
    (
        "MULTIPOLYGON (((1 9, 5 8, 9 9, 9 6, 6 4, 4 4, 1 6, 1 9)), ((1 1, 4 3, 6 3, 9 1, 1 1)))",
        2,
        "POLYGON ((6 3, 9 1, 1 1, 4 3, 4 4, 1 6, 1 9, 5 8, 9 9, 9 6, 6 4, 6 3))",
    ),
    (
        "MULTIPOLYGON (((1 9, 5 8, 9 9, 9 6, 6 4, 4 4, 1 6, 1 9)), ((1 1, 4 3, 6 3, 9 1, 1 1)))",
        6,
        "POLYGON ((1 1, 1 6, 1 9, 5 8, 9 9, 9 6, 9 1, 1 1))",
    ),
    (
        "MULTIPOLYGON (((1 5, 5 8, 5 5, 1 5)), ((5 1, 1 4, 5 4, 5 1)), ((6 8, 9 6, 7 5, 9 4, 6 1, 6 8)))",
        100,
        "POLYGON ((6 8, 9 6, 7 5, 9 4, 6 1, 5 1, 1 4, 1 5, 5 8, 6 8))",
    ),
]


@pytest.mark.parametrize("wkt,maxlen,expected", CHP_TIGHT)
def test_hull_of_polygons_tight(wkt, maxlen, expected):
    got = concave_hull_of_polygons(from_wkt(wkt), max_edge_length=maxlen, tight=True)
    exp = from_wkt(expected)
    if exp.is_empty:
        assert got.is_empty
    else:
        assert equals_topo(got, exp), f"got {to_wkt(got)}"


def test_hull_of_polygons_untight():
    got = concave_hull_of_polygons(
        from_wkt("POLYGON ((1 9, 5 8, 9 9, 4 4, 7 1, 2 1, 1 9))"), max_edge_length=1000
    )
    assert equals_topo(got, from_wkt("POLYGON ((1 9, 9 9, 7 1, 2 1, 1 9))")), to_wkt(got)
    got2 = concave_hull_of_polygons(
        from_wkt(
            "MULTIPOLYGON (((100 200, 100 300, 150 250, 200 300, 200 200, 100 200)), ((100 100, 200 100, 150 50, 100 100)))"
        ),
        max_edge_length=1000,
    )
    assert equals_topo(
        got2,
        from_wkt(
            "POLYGON ((100 100, 100 200, 100 300, 200 300, 200 200, 200 100, 150 50, 100 100))"
        ),
    ), to_wkt(got2)


WKT_P3C3 = "MULTIPOLYGON (((0 7, 4 10, 3 7, 5 6, 4 5, 0 7)), ((4 0, 0 2, 3 4, 5 3, 4 0)), ((9 10, 8 8, 10 9, 8 5, 10 3, 7 0, 6 3, 7 4, 7 6, 5 9, 9 10)))"


@pytest.mark.parametrize(
    "maxlen,expected",
    [
        (0, WKT_P3C3),
        (
            2,
            "POLYGON ((5 3, 4 0, 0 2, 3 4, 4 5, 0 7, 4 10, 5 9, 9 10, 8 8, 10 9, 8 5, 10 3, 7 0, 6 3, 5 3))",
        ),
        (
            4,
            "POLYGON ((4 0, 0 2, 3 4, 4 5, 0 7, 4 10, 5 9, 9 10, 8 8, 10 9, 8 5, 10 3, 7 0, 4 0))",
        ),
        (
            100,
            "POLYGON ((0 7, 4 10, 9 10, 8 8, 10 9, 8 5, 10 3, 7 0, 4 0, 0 2, 0 7))",
        ),
    ],
)
def test_hull_of_polygons_p3c3(maxlen, expected):
    got = concave_hull_of_polygons(from_wkt(WKT_P3C3), max_edge_length=maxlen, tight=True)
    assert equals_topo(got, from_wkt(expected)), to_wkt(got)


@pytest.mark.parametrize(
    "ratio,expected",
    [
        (0, WKT_P3C3),
        (
            0.2,
            "POLYGON ((5 9, 9 10, 10 9, 8 5, 10 3, 7 0, 6 3, 5 3, 4 0, 0 2, 3 4, 4 5, 0 7, 4 10, 5 9))",
        ),
        (
            0.5,
            "POLYGON ((5 9, 9 10, 10 9, 8 5, 10 3, 7 0, 4 0, 0 2, 3 4, 4 5, 0 7, 4 10, 5 9))",
        ),
        (1, "POLYGON ((9 10, 10 9, 10 3, 7 0, 4 0, 0 2, 0 7, 4 10, 9 10))"),
    ],
)
def test_hull_of_polygons_ratio(ratio, expected):
    got = concave_hull_of_polygons(from_wkt(WKT_P3C3), length_ratio=ratio)
    assert equals_topo(got, from_wkt(expected)), to_wkt(got)


WKT_P3H = "MULTIPOLYGON (((1 9, 5 9, 5 7, 3 7, 3 5, 1 5, 1 9)), ((1 4, 3 4, 3 2, 5 2, 5 0, 1 0, 1 4)), ((6 9, 8 9, 9 5, 8 0, 6 0, 6 2, 8 5, 6 7, 6 9)))"


@pytest.mark.parametrize(
    "maxlen,expected",
    [
        (0.9, WKT_P3H),
        (
            1,
            "POLYGON ((1 0, 1 4, 1 5, 1 9, 5 9, 6 9, 8 9, 9 5, 8 0, 6 0, 5 0, 1 0), (3 2, 5 2, 6 2, 8 5, 6 7, 5 7, 3 7, 3 5, 3 4, 3 2))",
        ),
        (
            9,
            "POLYGON ((6 9, 8 9, 9 5, 8 0, 6 0, 5 0, 1 0, 1 4, 1 5, 1 9, 5 9, 6 9))",
        ),
    ],
)
def test_hull_of_polygons_holes(maxlen, expected):
    got = concave_hull_of_polygons(
        from_wkt(WKT_P3H), max_edge_length=maxlen, holes_allowed=True
    )
    assert equals_topo(got, from_wkt(expected)), to_wkt(got)
