"""Ports of the reference's LineSegmentTest.cs + CoordinateArrays
utilities (reference: test/NetTopologySuite.Tests.NUnit/Geometries/
LineSegmentTest.cs, CoordinateArraysTest.cs)."""

import math

import numpy as np
import pytest

from nettopologysuite_ray.geom import segment as cs
from nettopologysuite_ray.geom.segment import LineSegment

ROOT2 = math.sqrt(2)


def test_projection_factor():
    seg = LineSegment(10, 0, 10, 0)
    assert math.isnan(seg.projection_factor((11, 0)))
    seg2 = LineSegment(10, 0, 20, 0)
    assert seg2.projection_factor((11, 0)) == 0.1


def test_line_intersection():
    cases = [
        (0, 0, 10, 10, 0, 10, 10, 0, 5, 5),
        (
            35613471.6165017, 4257145.306132293, 35613477.7705378, 4257160.528222711,
            35613477.77505724, 4257160.539653536, 35613479.85607389, 4257165.92369170,
            35613477.772841461, 4257160.5339209242,
        ),
    ]
    for p1x, p1y, p2x, p2y, q1x, q1y, q2x, q2y, ex, ey in cases:
        got = LineSegment(p1x, p1y, p2x, p2y).line_intersection(
            LineSegment(q1x, q1y, q2x, q2y)
        )
        assert math.dist(got, (ex, ey)) <= 1e-5
    assert LineSegment(0, 0, 10, 0).line_intersection(LineSegment(0, 1, 10, 1)) is None


def test_distance_perpendicular():
    cases = [
        (1, 1, 1, 3, 2, 4, 1),
        (1, 1, 1, 3, 0, 4, 1),
        (1, 1, 1, 3, 1, 4, 0),
        (1, 1, 2, 2, 4, 4, 0),
        (1, 1, 1, 1, 1, 2, 1),  # degenerate: point distance
    ]
    for x0, y0, x1, y1, px, py, exp in cases:
        assert LineSegment(x0, y0, x1, y1).distance_perpendicular(
            (px, py)
        ) == pytest.approx(exp, abs=1e-6)
    oriented = [
        (1, 1, 1, 3, 2, 4, -1),
        (1, 1, 1, 3, 0, 4, 1),
        (1, 1, 1, 3, 1, 4, 0),
        (1, 1, 2, 2, 4, 4, 0),
        (1, 1, 1, 1, 1, 2, 1),
    ]
    for x0, y0, x1, y1, px, py, exp in oriented:
        assert LineSegment(x0, y0, x1, y1).distance_perpendicular_oriented(
            (px, py)
        ) == pytest.approx(exp, abs=1e-6)


def test_offset_point_and_line():
    cases = [
        (0.0, ROOT2, -1, 1),
        (0.0, -ROOT2, 1, -1),
        (1.0, ROOT2, 9, 11),
        (0.5, ROOT2, 4, 6),
        (0.5, -ROOT2, 6, 4),
        (2.0, ROOT2, 19, 21),
        (2.0, -ROOT2, 21, 19),
        (2.0, 5 * ROOT2, 15, 25),
        (-2.0, 5 * ROOT2, -25, -15),
    ]
    seg = LineSegment(0, 0, 10, 10)
    for frac, off, ex, ey in cases:
        assert seg.point_along_offset(frac, off) == pytest.approx((ex, ey), abs=1e-6)
    o = seg.offset(ROOT2)
    assert o.p0 == pytest.approx((-1, 1), abs=1e-6)
    assert o.p1 == pytest.approx((9, 11), abs=1e-6)
    o = seg.offset(-ROOT2)
    assert o.p0 == pytest.approx((1, -1), abs=1e-6)
    assert o.p1 == pytest.approx((11, 9), abs=1e-6)
    with pytest.raises(ValueError):
        LineSegment(1, 1, 1, 1).point_along_offset(0.5, 1.0)


def test_reflect():
    assert LineSegment(0, 0, 10, 10).reflect((1, 2)) == pytest.approx((2, 1))
    assert LineSegment(0, 1, 10, 1).reflect((1, 2)) == pytest.approx((1, 0))


def test_orientation_index_and_misc():
    seg = LineSegment(0, 0, 10, 10)
    assert seg.orientation_index((10, 11)) == 1
    assert seg.orientation_index((11, 10)) == -1
    assert seg.orientation_index((5, 5)) == 0
    assert seg.mid_point == (5, 5)
    assert seg.length == pytest.approx(10 * ROOT2)
    assert seg.angle == pytest.approx(math.pi / 4)
    assert LineSegment(3, 4, 3, 9).is_vertical
    assert LineSegment(3, 4, 9, 4).is_horizontal
    assert LineSegment(5, 5, 0, 0).normalized() == LineSegment(0, 0, 5, 5)


def test_distance_closest_points_projection():
    a = LineSegment(0, 0, 10, 0)
    b = LineSegment(5, 5, 5, 1)
    assert a.distance(b) == pytest.approx(1.0)
    pa, pb = a.closest_points(b)
    assert pa == pytest.approx((5, 0))
    assert pb == pytest.approx((5, 1))
    x = LineSegment(0, 0, 10, 10)
    assert x.intersection(LineSegment(10, 0, 0, 10)) == pytest.approx((5, 5))
    assert x.intersection(LineSegment(20, 0, 30, 0)) is None
    assert x.closest_point((10, 0)) == pytest.approx((5, 5))
    assert a.project_point((3, 7)) == pytest.approx((3, 0))
    proj = a.project_segment(LineSegment(2, 3, 12, 4))
    assert proj.p0 == pytest.approx((2, 0))
    assert proj.p1 == pytest.approx((10, 0))
    assert a.project_segment(LineSegment(11, 1, 12, 1)) is None


def test_coordinate_arrays():
    ring = np.array([(0, 0), (5, 0), (5, 5), (0, 0)], dtype=float)
    assert cs.is_ring(ring)
    assert cs.is_ring(np.empty((0, 2)))
    assert not cs.is_ring(ring[:-1])
    dup = np.array([(0, 0), (1, 1), (1, 1), (2, 2)], dtype=float)
    assert cs.has_repeated_points(dup)
    assert not cs.has_repeated_points(ring)
    assert cs.remove_repeated_points(dup).tolist() == [[0, 0], [1, 1], [2, 2]]
    assert cs.reverse(ring).tolist() == ring[::-1].tolist()
    assert cs.min_coordinate(ring) == (0, 0)
    # scroll a ring to start at (5, 5), keeping closure
    rolled = cs.scroll(ring, (5, 5))
    assert rolled.tolist() == [[5, 5], [0, 0], [5, 0], [5, 5]]
    line = np.array([(0, 0), (1, 1), (2, 2)], dtype=float)
    assert cs.increasing_direction(line) == 1
    assert cs.increasing_direction(line[::-1]) == -1
    assert cs.increasing_direction(np.array([(1, 1)], dtype=float)) == 1
    assert cs.compare(line, line) == 0
    assert cs.compare(line, line[::-1]) == -1
    assert cs.compare(line[:2], line) == -1
    assert cs.point_not_in_list(line, line[:2]) == (2, 2)
    assert cs.point_not_in_list(line[:2], line) is None
