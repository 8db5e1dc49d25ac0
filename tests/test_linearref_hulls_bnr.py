"""Ports: LocationIndexedLine (reference:
test/.../LinearReferencing/LocationIndexedLineTest.cs),
PolygonHullSimplifier (test/.../Simplify/PolygonHullSimplifierTest.cs),
BoundaryNodeRule variants (test/.../Operation/Relate/
RelateBoundaryNodeRuleTest.cs)."""

import pytest

from nettopologysuite_ray.geom.linearref import LinearLocation, LocationIndexedLine
from nettopologysuite_ray.geom.predicates import equals_topo, relate
from nettopologysuite_ray.geom.ringhull import polygon_hull_simplifier
from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt


# -- LocationIndexedLine ----------------------------------------------------


def test_extract_line_multilinestring():
    g = from_wkt("MULTILINESTRING ((0 0, 10 10), (20 20, 30 30))")
    lil = LocationIndexedLine(g)
    r = lil.extract_line(LinearLocation(0, 0, 0.5), LinearLocation(1, 0, 0.5))
    assert to_wkt(r) == "MULTILINESTRING ((5 5, 10 10), (20 20, 25 25))"
    r2 = lil.extract_line(LinearLocation(0, 0, 1.0), LinearLocation(1, 0, 0.5))
    assert to_wkt(r2) == "MULTILINESTRING ((10 10, 10 10), (20 20, 25 25))"


def test_extract_point_offset():
    line = from_wkt("LINESTRING (0 0, 10 10, 10 10, 20 20)")
    lil = LocationIndexedLine(line)
    loc = lil.index_of((0.0, 0.0))
    assert lil.extract_point(loc, 1.0) == (
        -0.7071067811865475,
        0.7071067811865475,
    )
    assert lil.extract_point(loc, -1.0) == (
        0.7071067811865475,
        -0.7071067811865475,
    )


def test_index_of_after_and_indices_of():
    line = from_wkt("LINESTRING (0 0, 10 0, 20 0, 20 10)")
    lil = LocationIndexedLine(line)
    pt = (10.0, 0.0)
    loc1 = lil.index_of(pt)
    loc2 = lil.index_of_after(pt, loc1)
    assert loc1 < loc2
    assert lil.extract_point(loc1) == pt
    sub = from_wkt("LINESTRING (10 0, 20 0)")
    l0, l1 = lil.indices_of(sub)
    r = lil.extract_line(l0, l1)
    assert equals_topo(r, sub), to_wkt(r)
    # reversed extraction
    rrev = lil.extract_line(l1, l0)
    assert to_wkt(rrev) == "LINESTRING (20 0, 10 0)"


# -- PolygonHullSimplifier --------------------------------------------------

HULL_OUTER = [
    (
        "POLYGON ((30 90, 10 40, 40 10, 70 10, 90 30, 80 80, 70 40, 30 40, 50 50, 60 70, 30 90))",
        0,
        "POLYGON ((30 90, 80 80, 90 30, 70 10, 40 10, 10 40, 30 90))",
    ),
    (
        "POLYGON ((30 90, 10 40, 40 10, 70 10, 90 30, 80 80, 70 40, 30 40, 50 50, 60 70, 30 90))",
        0.8,
        "POLYGON ((30 90, 60 70, 80 80, 90 30, 70 10, 40 10, 10 40, 30 90))",
    ),
    (
        "POLYGON ((10 90, 40 60, 20 40, 40 20, 70 50, 40 30, 30 40, 60 70, 50 90, 90 90, 90 10, 10 10, 10 90))",
        0.5,
        "POLYGON ((10 90, 50 90, 90 90, 90 10, 10 10, 10 90))",
    ),
    (
        "POLYGON ((10 10, 10 90, 90 90, 90 50, 90 10, 50 10, 10 10))",
        0.4,
        "POLYGON ((10 10, 10 90, 90 90, 90 10, 10 10))",
    ),
    (
        "POLYGON ((50 100, 30 70, 0 50, 30 30, 50 0, 70 30, 100 50, 70 70, 50 100), (50 75, 40 50, 10 50, 36 35, 50 5, 65 35, 90 50, 60 60, 50 75))",
        0.1,
        "POLYGON ((50 100, 100 50, 50 0, 0 50, 50 100), (36 35, 50 5, 60 60, 36 35))",
    ),
]


@pytest.mark.parametrize("wkt,frac,expected", HULL_OUTER)
def test_hull_simplifier_outer(wkt, frac, expected):
    got = polygon_hull_simplifier(from_wkt(wkt), True, vertex_num_fraction=frac)
    assert equals_topo(got, from_wkt(expected)), to_wkt(got)


def test_hull_simplifier_inner():
    got = polygon_hull_simplifier(
        from_wkt(
            "POLYGON ((11 14, 2 31, 18 29, 25 17, 38 16, 29 5, 19 11, 11 0, 0 10, 11 14))"
        ),
        False,
        vertex_num_fraction=0.5,
    )
    assert equals_topo(
        got, from_wkt("POLYGON ((19 11, 29 5, 18 29, 2 31, 19 11))")
    ), to_wkt(got)


def test_hull_simplifier_inner_with_holes():
    got = polygon_hull_simplifier(
        from_wkt(
            "POLYGON ((70 300, 237 395, 145 296, 251 295, 320 40, 190 20, 60 60, 100 180, 70 300), (90 270, 100 220, 128 255, 180 270, 90 270), (110 160, 90 80, 180 90, 150 100, 110 160), (250 210, 160 200, 224 185, 250 160, 250 210))"
        ),
        False,
        vertex_num_fraction=0.1,
    )
    exp = from_wkt(
        "POLYGON ((70 300, 100 180, 60 60, 320 40, 251 295, 145 296, 70 300), (90 270, 180 270, 100 220, 90 270), (110 160, 180 90, 90 80, 110 160), (250 210, 250 160, 160 200, 250 210))"
    )
    assert equals_topo(got, exp), to_wkt(got)


def test_hull_simplifier_outer_multi():
    got = polygon_hull_simplifier(
        from_wkt(
            "MULTIPOLYGON (((50 50, 50 250, 100 253, 100 250, 100 300, 300 300, 200 200, 300 150, 300 50, 50 50), (180 200, 70 200, 70 70, 200 100, 280 70, 200 150, 180 200)), ((90 180, 160 180, 160 100, 125 139, 100 100, 90 180)), ((380 280, 310 280, 250 200, 310 230, 350 150, 380 280)))"
        ),
        True,
        vertex_num_fraction=0.1,
    )
    exp = from_wkt(
        "MULTIPOLYGON (((50 50, 50 250, 100 300, 300 300, 200 200, 300 150, 300 50, 50 50), (180 200, 70 200, 70 70, 200 100, 180 200)), ((90 180, 160 180, 160 100, 100 100, 90 180)), ((380 280, 350 150, 250 200, 310 280, 380 280)))"
    )
    assert equals_topo(got, exp), to_wkt(got)


def test_hull_simplifier_by_area_delta():
    wkt = "POLYGON ((30 90, 10 40, 40 10, 70 10, 90 30, 80 80, 70 40, 30 40, 50 50, 60 70, 30 90))"
    got = polygon_hull_simplifier(from_wkt(wkt), True, area_delta_ratio=0.1)
    exp = from_wkt(
        "POLYGON ((10 40, 30 90, 60 70, 50 50, 70 40, 80 80, 90 30, 70 10, 40 10, 10 40))"
    )
    assert equals_topo(got, exp), to_wkt(got)


# -- BoundaryNodeRule variants ----------------------------------------------

BNR_CASES = [
    (
        "MULTILINESTRING ((20 20, 100 100, 100 20, 20 100), (60 60, 60 140))",
        "LINESTRING (60 60, 20 60)",
        "endpoint",
        "FF1F00102",
    ),
    (
        "LINESTRING (20 20, 100 100, 100 20, 20 100)",
        "LINESTRING (60 60, 20 60)",
        "mod2",
        "F01FF0102",
    ),
    (
        "LINESTRING (20 20, 100 100, 100 20, 20 100)",
        "LINESTRING (60 60, 20 60)",
        "endpoint",
        "F01FF0102",
    ),
    (
        "MULTILINESTRING ((0 0, 10 10), (10 10, 20 20))",
        "LINESTRING (10 10, 20 0)",
        "endpoint",
        "FF1F00102",
    ),
    (
        "LINESTRING (20 100, 20 220, 120 100, 20 100)",
        "LINESTRING (20 20, 20 100)",
        "multivalent",
        "0F1FFF1F2",
    ),
    (
        "LINESTRING (20 100, 20 220, 120 100, 20 100)",
        "LINESTRING (20 20, 40 100)",
        "mod2",
        "F01FFF102",
    ),
    (
        "LINESTRING (20 100, 20 220, 120 100, 20 100)",
        "LINESTRING (20 20, 40 100)",
        "endpoint",
        "F01FF0102",
    ),
    (
        "POLYGON EMPTY",
        "LINESTRING (20 100, 20 220, 120 100, 20 100)",
        "mod2",
        "FFFFFF1F2",
    ),
    (
        "POLYGON EMPTY",
        "LINESTRING (20 100, 20 220, 120 100, 20 100)",
        "endpoint",
        "FFFFFF102",
    ),
    (
        "POLYGON EMPTY",
        "MULTILINESTRING ((0 0, 0 1), (0 1, 1 1, 1 0, 0 0))",
        "mod2",
        "FFFFFF1F2",
    ),
    (
        "POLYGON EMPTY",
        "MULTILINESTRING ((0 0, 0 1), (0 1, 1 1, 1 0, 0 0))",
        "endpoint",
        "FFFFFF102",
    ),
]


@pytest.mark.parametrize("a,b,rule,expected", BNR_CASES)
def test_boundary_node_rules(a, b, rule, expected):
    assert relate(from_wkt(a), from_wkt(b), rule=rule) == expected
