"""Ports of the reference's AngleTest.cs, TriangleTest.cs and
Vector2DTest.cs over geom/mathutil.py (reference:
test/NetTopologySuite.Tests.NUnit/Algorithm/AngleTest.cs,
Geometries/TriangleTest.cs, Mathematics/Vector2DTest.cs)."""

import math

import pytest

from nettopologysuite_ray.geom import mathutil as mu
from nettopologysuite_ray.geom.mathutil import Triangle, Vector2D

TOL = 1e-5


def test_angle():
    assert mu.angle((10, 0)) == pytest.approx(0.0, abs=TOL)
    assert mu.angle((10, 10)) == pytest.approx(math.pi / 4, abs=TOL)
    assert mu.angle((0, 10)) == pytest.approx(math.pi / 2, abs=TOL)
    assert mu.angle((-10, 10)) == pytest.approx(0.75 * math.pi, abs=TOL)
    assert mu.angle((-10, 0)) == pytest.approx(math.pi, abs=TOL)
    assert mu.angle((-10, -0.1)) == pytest.approx(-3.131592986903128, abs=TOL)
    assert mu.angle((-10, -10)) == pytest.approx(-0.75 * math.pi, abs=TOL)


def test_is_acute():
    assert mu.is_acute((10, 0), (0, 0), (5, 10)) is True
    assert mu.is_acute((10, 0), (0, 0), (5, -10)) is True
    assert mu.is_acute((10, 0), (0, 0), (10, 0)) is True
    assert mu.is_acute((10, 0), (0, 0), (-5, 10)) is False
    assert mu.is_acute((10, 0), (0, 0), (-5, -10)) is False


def test_normalize_positive():
    pi = math.pi
    cases = [
        (0.0, 0.0),
        (-0.5 * pi, 1.5 * pi), (-pi, pi), (-1.5 * pi, 0.5 * pi),
        (-2 * pi, 0.0), (-2.5 * pi, 1.5 * pi), (-3 * pi, pi), (-4 * pi, 0.0),
        (0.5 * pi, 0.5 * pi), (pi, pi), (1.5 * pi, 1.5 * pi),
        (2 * pi, 0.0), (2.5 * pi, 0.5 * pi), (3 * pi, pi), (4 * pi, 0.0),
    ]
    for ang, exp in cases:
        assert mu.normalize_positive(ang) == pytest.approx(exp, abs=TOL), ang


def test_normalize():
    pi = math.pi
    cases = [
        (0.0, 0.0),
        (-0.5 * pi, -0.5 * pi), (-pi, pi), (-1.5 * pi, 0.5 * pi),
        (-2 * pi, 0.0), (-2.5 * pi, -0.5 * pi), (-3 * pi, pi), (-4 * pi, 0.0),
        (0.5 * pi, 0.5 * pi), (pi, pi), (1.5 * pi, -0.5 * pi),
        (2 * pi, 0.0), (2.5 * pi, 0.5 * pi), (3 * pi, pi), (4 * pi, 0.0),
    ]
    for ang, exp in cases:
        assert mu.normalize(ang) == pytest.approx(exp, abs=TOL), ang


def test_interior_angle():
    p1, p2, p3 = (1, 2), (3, 2), (2, 1)
    assert mu.to_degrees(mu.interior_angle(p1, p2, p3)) == pytest.approx(45, abs=0.01)
    assert mu.to_degrees(mu.interior_angle(p2, p3, p1)) == pytest.approx(90, abs=0.01)
    assert mu.to_degrees(mu.interior_angle(p3, p1, p2)) == pytest.approx(45, abs=0.01)
    assert mu.to_degrees(mu.interior_angle(p3, p2, p1)) == pytest.approx(315, abs=0.01)
    assert mu.to_degrees(mu.interior_angle(p1, p3, p2)) == pytest.approx(270, abs=0.01)
    assert mu.to_degrees(mu.interior_angle(p2, p1, p3)) == pytest.approx(315, abs=0.01)


def test_interior_angle_sums_to_pi():
    import random

    rng = random.Random(1234)
    for i in range(100):
        pts = [(rng.random(), rng.random()) for _ in range(3)]
        if Triangle.is_ccw(*pts):
            pts = pts[::-1]  # interior_angle assumes CW rings
        s = (
            mu.interior_angle(pts[0], pts[1], pts[2])
            + mu.interior_angle(pts[1], pts[2], pts[0])
            + mu.interior_angle(pts[2], pts[0], pts[1])
        )
        assert s == pytest.approx(math.pi, abs=0.01), (i, pts)


def test_angle_bisector():
    assert mu.to_degrees(mu.bisector((0, 1), (0, 0), (1, 0))) == pytest.approx(45, abs=0.01)
    assert mu.to_degrees(mu.bisector((1, 1), (0, 0), (1, 0))) == pytest.approx(22.5, abs=0.01)
    assert mu.to_degrees(mu.bisector((-1, 1), (0, 0), (1, 0))) == pytest.approx(67.5, abs=0.01)
    assert mu.to_degrees(mu.bisector((0, -1), (0, 0), (1, 0))) == pytest.approx(-45, abs=0.01)
    assert mu.to_degrees(mu.bisector((-1, -1), (0, 0), (-1, 1))) == pytest.approx(180, abs=0.01)
    assert mu.to_degrees(mu.bisector((13, 10), (10, 10), (10, 20))) == pytest.approx(45, abs=0.01)


def test_sin_cos_snap():
    for angdeg in range(-720, 721):
        ang = mu.to_radians(angdeg)
        r_sin, r_cos = mu.sin_snap(ang), mu.cos_snap(ang)
        assert abs(r_sin - math.sin(ang)) < 5e-16
        assert abs(r_cos - math.cos(ang)) < 5e-16
        # exact zeros at multiples of 90 degrees
        if angdeg % 180 == 0:
            assert r_sin == 0.0
        if angdeg % 180 == 90:
            assert r_cos == 0.0


def test_angle_between_oriented():
    assert mu.angle_between_oriented((1, 0), (0, 0), (0, 1)) == pytest.approx(
        math.pi / 2, abs=TOL
    )
    assert mu.angle_between_oriented((0, 1), (0, 0), (1, 0)) == pytest.approx(
        -math.pi / 2, abs=TOL
    )
    assert mu.angle_between_oriented((1, 0), (0, 0), (-1, 0)) == pytest.approx(
        math.pi, abs=TOL
    )


# -- Triangle (reference: Geometries/TriangleTest.cs) ------------------------

def test_triangle_interpolate_z():
    v = [(1, 1, 0), (2, 1, 0), (1, 2, 10)]
    assert Triangle.interpolate_z((1.5, 1.5), *v) == pytest.approx(5, abs=TOL)
    assert Triangle.interpolate_z((1.2, 1.2), *v) == pytest.approx(2, abs=TOL)
    assert Triangle.interpolate_z((0, 0), *v) == pytest.approx(-10, abs=TOL)


def test_triangle_area_3d():
    assert Triangle.area_3d(
        (0, 0, 10), (100, 0, 110), (100, 100, 110)
    ) == pytest.approx(7071.067811865475, abs=TOL)
    assert Triangle.area_3d(
        (0, 0, 10), (100, 0, 10), (50, 100, 110)
    ) == pytest.approx(7071.067811865475, abs=TOL)


def test_triangle_area():
    cw = [(10, 10), (20, 20), (20, 10)]
    ccw = [(10, 10), (20, 10), (20, 20)]
    assert Triangle.signed_area(*cw) == pytest.approx(50, abs=TOL)
    assert Triangle.signed_area(*ccw) == pytest.approx(-50, abs=TOL)
    assert Triangle.area(*cw) == pytest.approx(50, abs=TOL)
    assert Triangle.area(*ccw) == pytest.approx(50, abs=TOL)


def test_triangle_circumcentre():
    assert Triangle.circumcentre((10, 10), (20, 20), (20, 10)) == pytest.approx(
        (15.0, 15.0)
    )
    assert Triangle.circumcentre((10, 10), (20, 10), (20, 20)) == pytest.approx(
        (15.0, 15.0)
    )
    assert Triangle.circumcentre((10, 10), (20, 10), (15, 20)) == pytest.approx(
        (15.0, 13.75)
    )
    assert Triangle.circumcentre_exact(
        (10, 10), (20, 10), (15, 20)
    ) == pytest.approx((15.0, 13.75))


def test_triangle_circumradius():
    for tri in [
        [(10, 10), (20, 20), (20, 10)],
        [(10, 10), (20, 10), (20, 20)],
        [(10, 10), (20, 10), (15, 20)],
    ]:
        cc = Triangle.circumcentre(*tri)
        r = Triangle.circumradius(*tri)
        for p in tri:
            assert math.hypot(p[0] - cc[0], p[1] - cc[1]) == pytest.approx(
                r, abs=1e-5
            )
    # degenerate (collinear) triangle: infinite circumradius
    assert Triangle.circumradius((0, 0), (5, 0), (10, 0)) == math.inf


def test_triangle_is_ccw_intersects_acute():
    assert Triangle.is_ccw((10, 10), (20, 10), (15, 20)) is True
    assert Triangle.is_ccw((10, 10), (15, 20), (20, 10)) is False
    tri = [(10, 10), (20, 10), (15, 20)]
    assert Triangle.intersects(*tri, (15, 15)) is True
    assert Triangle.intersects(*tri, (10, 10)) is True  # vertex
    assert Triangle.intersects(*tri, (15, 10)) is True  # edge
    assert Triangle.intersects(*tri, (0, 0)) is False
    assert Triangle.is_acute((10, 10), (20, 10), (15, 20)) is True
    assert Triangle.is_acute((10, 10), (20, 10), (10, 20)) is False  # right
    assert Triangle.is_acute((10, 10), (20, 10), (11, 12)) is False  # obtuse


def test_triangle_centres_and_lengths():
    tri = [(10, 10), (20, 20), (20, 10)]
    assert Triangle.centroid(*tri) == pytest.approx((50 / 3, 40 / 3))
    ic = Triangle.in_centre(*tri)
    # incentre is equidistant from all three sides; for this right
    # triangle r = (a + b - c) / 2 with legs 10,10 and hyp 10*sqrt(2)
    r = (10 + 10 - 10 * math.sqrt(2)) / 2
    assert ic == pytest.approx((20 - r, 10 + r), abs=1e-9)
    assert Triangle.length(*tri) == pytest.approx(20 + 10 * math.sqrt(2))
    assert Triangle.longest_side_length(*tri) == pytest.approx(10 * math.sqrt(2))
    # bisector from (10,10) hits (20, y) between the two other vertices
    bis = Triangle.angle_bisector((20, 20), (10, 10), (20, 10))
    assert bis[0] == pytest.approx(20.0)
    assert 10 < bis[1] < 20


def test_perpendicular_bisector_and_line_intersection():
    # circumcentre = intersection of two perpendicular bisectors
    tri = [(10, 10), (20, 10), (15, 20)]
    b1 = Triangle.perpendicular_bisector(tri[0], tri[1])
    b2 = Triangle.perpendicular_bisector(tri[1], tri[2])
    cc = mu.HCoordinate.from_points(b1, b2).get_coordinate()
    assert cc == pytest.approx(Triangle.circumcentre(*tri))
    assert mu.line_intersection((0, 0), (10, 10), (0, 10), (10, 0)) == pytest.approx(
        (5, 5)
    )
    with pytest.raises(ValueError):
        mu.line_intersection((0, 0), (10, 0), (0, 1), (10, 1))  # parallel


# -- Vector2D (reference: Mathematics/Vector2DTest.cs) -----------------------

def test_vector2d_ops():
    assert Vector2D.create(3, 4).length() == pytest.approx(5)
    assert Vector2D.create(3, 4).length_squared() == pytest.approx(25)
    z = Vector2D.create(0, 0)
    assert z.length() == 0
    assert (Vector2D.create(1, 2) + Vector2D.create(3, 4)) == Vector2D.create(4, 6)
    assert (-Vector2D.create(1, 2)) == Vector2D.create(-1, -2)
    assert (Vector2D.create(4, 6) - Vector2D.create(3, 4)) == Vector2D.create(1, 2)
    assert Vector2D.create(1, 2) * 3 == Vector2D.create(3, 6)
    assert Vector2D.create(3, 6).divide(3) == Vector2D.create(1, 2)
    assert Vector2D.create(2, 3).dot(Vector2D.create(4, 5)) == pytest.approx(23)
    n = Vector2D.create(3, 4).normalize()
    assert n.length() == pytest.approx(1)
    assert n == Vector2D.create(0.6, 0.8)
    assert Vector2D.create((1, 2), (4, 6)) == Vector2D.create(3, 4)


def test_vector2d_rotate():
    v = Vector2D.create(1, 0)
    r = v.rotate(math.pi / 2)
    assert r.x == pytest.approx(0, abs=1e-15)
    assert r.y == pytest.approx(1)
    assert v.rotate_by_quarter_circle(1) == Vector2D.create(0, 1)
    assert v.rotate_by_quarter_circle(2) == Vector2D.create(-1, 0)
    assert v.rotate_by_quarter_circle(3) == Vector2D.create(0, -1)
    assert v.rotate_by_quarter_circle(4) == Vector2D.create(1, 0)
    assert v.rotate_by_quarter_circle(-1) == Vector2D.create(0, -1)
    assert Vector2D.create(1, 1).is_parallel(Vector2D.create(3, 3))
    assert not Vector2D.create(1, 1).is_parallel(Vector2D.create(3, 4))
    assert Vector2D.create(1, 0).angle_to(Vector2D.create(0, 1)) == pytest.approx(
        math.pi / 2
    )
    assert Vector2D.create(1, 2).translate((10, 20)) == pytest.approx((11, 22))


# -- Vector3D (reference: Mathematics/Vector3DTest.cs) -----------------------

def test_vector3d_ops():
    from nettopologysuite_ray.geom.mathutil import Vector3D

    assert Vector3D.create(1, 2, 2).length() == pytest.approx(3)
    assert Vector3D.create((3, 4, 12)).length() == pytest.approx(13)
    assert (Vector3D(1, 2, 3) + Vector3D(4, 5, 6)) == Vector3D(5, 7, 9)
    assert (Vector3D(5, 7, 9) - Vector3D(4, 5, 6)) == Vector3D(1, 2, 3)
    assert Vector3D(1, 2, 3).dot(Vector3D(4, 5, 6)) == pytest.approx(32)
    c = Vector3D(1, 0, 0).cross(Vector3D(0, 1, 0))
    assert c == Vector3D(0, 0, 1)
    n = Vector3D(0, 3, 4).normalize()
    assert n.length() == pytest.approx(1)
    assert n == Vector3D(0, 0.6, 0.8)
    assert Vector3D.from_points((1, 1, 1), (2, 3, 4)) == Vector3D(1, 2, 3)
    assert Vector3D.dot4((0, 0, 0), (1, 0, 0), (0, 0, 0), (0, 1, 0)) == 0
    assert Vector3D.dot4((0, 0, 0), (1, 2, 3), (0, 0, 0), (4, 5, 6)) == 32


# ---------------------------------------------------------------------------
# affine toolbox — ports of the reference's
# Geometries/Utility/AffineTransformationBuilderTest.cs


def _run_ctl3(src, dest):
    from nettopologysuite_ray.geom.mathutil import (
        affine_apply,
        affine_from_control_vectors,
    )

    m = affine_from_control_vectors(src, dest)
    assert m is not None
    for s, d in zip(src, dest):
        got = affine_apply(m, *s)
        assert abs(got[0] - d[0]) < 5e-5 and abs(got[1] - d[1]) < 5e-5, (s, d, got)


def test_affine_builder_rotate_scale_translate_linear():
    _run_ctl3([(0, 0), (1, 0), (0, 1)], [(0, 0), (0, 1), (-1, 0)])  # rotate1
    _run_ctl3([(0, 0), (1, 0), (0, 1)], [(0, 0), (0, -1), (1, 0)])  # rotate2
    _run_ctl3([(0, 0), (1, 0), (0, 1)], [(0, 0), (2, 0), (0, 2)])   # scale1
    _run_ctl3([(0, 0), (1, 0), (0, 1)], [(5, 6), (6, 6), (5, 7)])   # translate1
    _run_ctl3([(0, 0), (1, 0), (0, 1)], [(0, 0), (0, 0), (5, 7)])   # linear1


def test_affine_builder_singular():
    from nettopologysuite_ray.geom.mathutil import affine_from_control_vectors

    assert affine_from_control_vectors(
        [(0, 0), (1, 1), (2, 2)], [(0, 0), (10, 10), (30, 30)]) is None
    assert affine_from_control_vectors(
        [(0, 0), (1, 1), (2, 2)], [(0, 0), (10, 10), (20, 20)]) is None
    assert affine_from_control_vectors(
        [(0, 0), (1, 1), (2, 2)], [(0, 0), (1, 2), (1, 3)]) is None


def test_affine_factory_one_and_two_vectors():
    from nettopologysuite_ray.geom.mathutil import (
        affine_apply,
        affine_from_control_vectors,
    )

    m = affine_from_control_vectors([(0, 0)], [(5, 6)])
    assert affine_apply(m, 0, 0) == (5.0, 6.0)
    for src, dest in (
        ([(0, 0), (1, 1)], [(5, 5), (6, 6)]),   # dual translation
        ([(0, 0), (1, 1)], [(5, 5), (6, 9)]),   # dual general
        ([(3, 2), (5, 2)], [(10, 0), (10, 4)]),  # src0 off-origin (deviation case)
    ):
        m = affine_from_control_vectors(src, dest)
        for s, d in zip(src, dest):
            got = affine_apply(m, *s)
            assert abs(got[0] - d[0]) < 5e-5 and abs(got[1] - d[1]) < 5e-5

    # zero-length source baseline is undefined
    assert affine_from_control_vectors([(1, 1), (1, 1)], [(0, 0), (2, 2)]) is None


def test_affine_builder_recovers_composites():
    from nettopologysuite_ray.geom.mathutil import (
        affine_compose,
        affine_reflection,
        affine_rotation,
        affine_scaling,
        affine_shear,
        affine_translation,
    )

    ctl = [(-10, -10), (10, 20), (10, -20)]
    # transform1: rotate(1) then translate(10,10) then scale(2,2)
    m1 = affine_rotation(1.0)
    m1 = affine_compose(affine_translation(10, 10), m1)
    m1 = affine_compose(affine_scaling(2, 2), m1)
    # transform2: rotate(3), translate(10,10), scale(2,10), shear(5,2),
    # reflect about (5,8)-(10,2)
    m2 = affine_rotation(3.0)
    m2 = affine_compose(affine_translation(10, 10), m2)
    m2 = affine_compose(affine_scaling(2, 10), m2)
    m2 = affine_compose(affine_shear(5, 2), m2)
    m2 = affine_compose(affine_reflection(5, 8, 10, 2), m2)
    from nettopologysuite_ray.geom.mathutil import affine_apply

    for m in (m1, m2):
        dest = [affine_apply(m, *p) for p in ctl]
        _run_ctl3(ctl, dest)


def test_affine_from_baselines():
    from nettopologysuite_ray.geom.mathutil import (
        AFFINE_IDENTITY,
        affine_apply,
        affine_from_baselines,
    )

    m = affine_from_baselines((0, 0), (2, 0), (1, 1), (1, 5))
    # src0 -> dest0; src1 -> dest1 (rotation + scale 2)
    assert all(abs(a - b) < 1e-12 for a, b in zip(affine_apply(m, 0, 0), (1, 1)))
    assert all(abs(a - b) < 1e-9 for a, b in zip(affine_apply(m, 2, 0), (1, 5)))
    assert affine_from_baselines((3, 3), (3, 3), (0, 0), (1, 1)) == AFFINE_IDENTITY
