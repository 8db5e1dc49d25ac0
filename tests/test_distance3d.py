"""Ports of the reference's Distance3DOpTest.cs / WithinDistance3DTest.cs
(reference: test/NetTopologySuite.Tests.NUnit/Operation/Distance3D/)."""

import math

import pytest

from nettopologysuite_ray.geom.distance3d import (
    distance3d,
    is_within_distance3d,
    nearest_points3d,
)
from nettopologysuite_ray.geom.wkt import from_wkt


def check(wkt0, wkt1, expected, tol=1e-5):
    g0, g1 = from_wkt(wkt0), from_wkt(wkt1)
    assert distance3d(g0, g1) == pytest.approx(expected, abs=tol)
    assert distance3d(g1, g0) == pytest.approx(expected, abs=tol)


POLY_HOLE_FLAT = (
    "POLYGON ((100 200 0, 200 200 0, 200 100 0, 100 100 0, 100 200 0),"
    " (120 180 0, 180 180 0, 180 120 0, 120 120 0, 120 180 0))"
)
POLY_2HOLE_FLAT = (
    "POLYGON ((100 200 0, 200 200 0, 200 100 0, 100 100 0, 100 200 0),"
    " (110 110 0, 110 130 0, 130 130 0, 130 110 0, 110 110 0),"
    " (190 110 0, 170 110 0, 170 130 0, 190 130 0, 190 110 0))"
)


def test_empty():
    check("POINT EMPTY", "POINT EMPTY", 0)
    check("LINESTRING EMPTY", "POINT (0 0 0)", 0)
    check("MULTILINESTRING EMPTY", "POLYGON EMPTY", 0)
    check("MULTIPOLYGON EMPTY", "POINT (0 0 0)", 0)


def test_partially_empty():
    check("GEOMETRYCOLLECTION( MULTIPOINT (0 0 0), POLYGON EMPTY)", "POINT (0 1 0)", 1)
    check(
        "GEOMETRYCOLLECTION( MULTIPOINT (11 11 0), POLYGON EMPTY)",
        "GEOMETRYCOLLECTION( MULTIPOINT EMPTY, LINESTRING (10 10 0, 10 20 0 ))",
        1,
    )


def test_point_point():
    check("POINT (10 10 0 )", "POINT (20 20 0 )", 14.1421356)
    check("POINT (5 10 0 )", "POINT (15 20 0 )", 14.1421356)
    check("POINT (0 0 0 )", "POINT (0 0 1 )", 1)
    check("POINT (10 10 1 )", "POINT (11 11 2 )", 1.7320508075688772)
    check("POINT (10 10 0 )", "POINT (10 20 10 )", 14.142135623730951)


def test_point_seg():
    check("LINESTRING (10 10 0, 10 20 0 )", "POINT (20 15 0 )", 10)
    check("LINESTRING (0 0 0, 10 10 10 )", "POINT (5 5 5 )", 0)
    check("LINESTRING (10 10 10, 20 20 20 )", "POINT (11 11 10 )", 0.816496580927726)
    # robustness with large ordinates
    check("LINESTRING (0 0 0, 10000000 10000000 1 )", "POINT (9999999 9999999 .9999999 )", 0)
    check("LINESTRING (0 0 0, 10000000 10000000 1 )", "POINT (5000000 5000000 .5 )", 0)


def test_cross_segments():
    check("LINESTRING (0 0 0, 10 10 0 )", "LINESTRING (10 0 0, 0 10 0 )", 0)
    check("LINESTRING (0 0 10, 30 10 10 )", "LINESTRING (10 0 10, 0 10 10 )", 0)
    check("LINESTRING (0 0 0, 10 10 0 )", "LINESTRING (10 0 1, 0 10 1 )", 1)
    check("LINESTRING (0 0 0, 20 20 0 )", "LINESTRING (10 0 1, 0 10 1 )", 1)
    check("LINESTRING (20 10 20, 10 20 10 )", "LINESTRING (10 10 20, 20 20 10 )", 0)
    check(
        "LINESTRING (-10000 -10000 0, 10000 10000 1 )",
        "LINESTRING (-10000 -10000 1, 10000 10000 0 )",
        0,
    )


def test_t_and_parallel_segments():
    check("LINESTRING (10 10 0, 10 20 0 )", "LINESTRING (20 15 0, 25 15 0 )", 10)
    check("LINESTRING (10 10 0, 20 20 0 )", "LINESTRING (10 20 0, 20 30 0 )", 7.0710678118654755)
    check("LINESTRING (0 0 0, 1 0 0 )", "LINESTRING (0 0 1, 1 0 1 )", 1)
    check("LINESTRING (10 10 0, 20 10 0 )", "LINESTRING (10 20 10, 20 20 10 )", 14.142135623730951)
    check("LINESTRING (10 10 0, 20 20 0 )", "LINESTRING (10 20 10, 20 30 10 )", 12.24744871391589)


def test_line_line():
    check(
        "LINESTRING (0 1 2, 1 1 1, 1 0 2 )",
        "LINESTRING (0 0 0.1, .5 .5 0, 1 1 0, 1.5 1.5 0, 2 2 0 )",
        1,
    )
    check(
        "LINESTRING (10 10 20, 20 20 30, 20 20 1, 30 30 5 )",
        "LINESTRING (1 80 10, 0 39 5, 39 0 5, 80 1 20)",
        0.7071067811865476,
    )


def test_point_polygon():
    flat = "POLYGON ((100 200 0, 200 200 0, 200 100 0, 100 100 0, 100 200 0))"
    check("POINT (150 150 10)", flat, 10)
    check("POINT (150 150 -10)", flat, 10)
    # vertical polygon in the x=0 plane
    check("POINT (10 150 150)", "POLYGON ((0 100 200, 0 200 200, 0 200 100, 0 100 100, 0 100 200))", 10)
    check("POINT (150 150 0)", flat, 0)
    check("POINT (250 250 0)", flat, 70.71067811865476)
    check("POINT (200 200 0)", flat, 0)


def test_line_polygon():
    flat = "POLYGON ((100 200 0, 200 200 0, 200 100 0, 100 100 0, 100 200 0))"
    check("LINESTRING (150 150 0, 160 160 0)", flat, 0)
    check("LINESTRING (200 250 0, 260 260 0)", flat, 50)
    check("LINESTRING (200 200 0, 260 260 0)", flat, 0)
    check("LINESTRING (150 150 10, 150 150 -10)", flat, 0)
    check("LINESTRING (200 200 10, 260 260 100)", flat, 10)
    check("LINESTRING (200 200 0, 260 260 100)", flat, 0)


def test_polygon_holes():
    check("LINESTRING (150 150 10, 150 150 -10)", POLY_HOLE_FLAT, 30)
    check("LINESTRING (110 110 10, 110 110 -10)", POLY_HOLE_FLAT, 0)
    check("LINESTRING (130 130 10, 150 150 100)", POLY_HOLE_FLAT, 14.14213562373095)
    check("LINESTRING (120 180 0, 120 180 100)", POLY_HOLE_FLAT, 0)
    check("POINT (130 130 10)", POLY_HOLE_FLAT, 14.14213562373095)
    check("POINT (130 130 -10)", POLY_HOLE_FLAT, 14.14213562373095)
    check("POINT (110 110 100)", POLY_HOLE_FLAT, 100)


def test_polygon_polygon_linked_thru_holes():
    # distance requires all ring pairings, not just shells
    check(
        POLY_2HOLE_FLAT,
        "POLYGON ((120 120 -10, 120 120 100, 180 120 100, 180 120 -10, 120 120 -10))",
        0,
    )
    check(
        POLY_2HOLE_FLAT,
        "LINESTRING (120 120 -10, 120 120 100, 180 120 100, 180 120 -10, 120 120 -10)",
        10,
    )


def test_multi():
    check(
        "MULTIPOINT ((0 0 0), (0 0 100), (100 100 100))",
        "MULTIPOINT ((100 100 99), (50 50 50), (25 100 33))",
        1,
    )
    check(
        "MULTILINESTRING ((0 0 0, 10 10 10), (0 0 100, 25 25 25, 40 40 50), (100 100 100, 100 101 102))",
        "MULTILINESTRING ((100 100 99, 100 100 99), (100 102 102, 200 200 20), (25 100 33, 25 100 35))",
        1,
    )
    check(
        "MULTIPOLYGON ( ((120 120 -10, 120 120 100, 180 120 100, 180 120 -10, 120 120 -10)), ((120 200 -10, 120 200 190, 180 200 190, 180 200 -10, 120 200 -10)) )",
        "MULTIPOLYGON ( ((100 200 200, 200 200 200, 200 100 200, 100 100 200, 100 200 200)), ((100 200 210, 200 200 210, 200 100 210, 100 100 210, 100 200 210)) )",
        10,
    )
    check(
        "MULTILINESTRING ((0 0 0, 10 10 10), (0 0 100, 25 25 25, 40 40 50), (100 100 100, 100 101 101))",
        "MULTIPOINT ((100 100 99), (50 50 50), (25 100 33))",
        1,
    )


def test_nearest_and_within():
    np0, np1 = nearest_points3d(from_wkt("POINT (0 0 0)"), from_wkt("POINT (0 0 5)"))
    assert np0[:2] == (0, 0) and np1[:2] == (0, 0)
    assert np0[2] == 0 and np1[2] == 5
    assert is_within_distance3d(from_wkt("POINT (0 0 0)"), from_wkt("POINT (0 0 5)"), 5.0)
    assert not is_within_distance3d(
        from_wkt("POINT (0 0 0)"), from_wkt("POINT (0 0 5)"), 4.999
    )
    # 2D fallback when Z absent on either point
    assert distance3d(from_wkt("POINT (0 0)"), from_wkt("POINT (3 4 12)")) == pytest.approx(5.0)
