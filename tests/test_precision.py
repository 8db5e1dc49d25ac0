"""GeometryPrecisionReducer ports (reference:
test/NetTopologySuite.Tests.NUnit/Precision/GeometryPrecisionReducerTest.cs)."""

import pytest

from nettopologysuite_ray.geom.precision import reduce_precision
from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt
from nettopologysuite_ray.stages.geometry import _compare

CASES = [
    (1, "POINT(1.1 4.9)", "POINT(1 5)"),
    (1, "MULTIPOINT( (1.1 4.9),(1.2 4.8), (3.3 6.6))", "MULTIPOINT((1 5), (1 5), (3 7))"),
    (1, "LINESTRING ( 0 0, 0 1.4 )", "LINESTRING (0 0, 0 1)"),
    (1, "LINESTRING( 1 1, 3 3, 9 9, 5.1 5, 2.1 2 )", "LINESTRING( 1 1, 3 3, 9 9, 5 5, 2 2 )"),
    (1, "LINESTRING( 1 1, 3 3, 3.1 3, 4 4, 4 4, 9 9 )", "LINESTRING (1 1, 3 3, 4 4, 9 9)"),
    (1, "LINESTRING ( 0 0, 0 .4 )", "LINESTRING EMPTY"),
    (1, "MULTILINESTRING ((0 0, 9 9), ( 0 0, 0 .4 ))", "LINESTRING  (0 0, 9 9)"),
    (1, "POLYGON (( 0 0, 0 1.4, 1.4 1.4, 1.4 0, 0 0 ))", "POLYGON (( 0 0, 0 1, 1 1, 1 0, 0 0 ))"),
    (1, "POLYGON (( 0 0, 0 .4, .4 .4, .4 0, 0 0 ))", "POLYGON EMPTY"),
    (1, "POLYGON (( 0 0, 0 1.4, .4 .4, .4 0, 0 0 ))", "POLYGON EMPTY"),
    (1, "POLYGON ((10 10, 100 100, 200 10.1, 300 10, 10 10))", "POLYGON ((10 10, 100 100, 200 10, 10 10))"),
    (
        1,
        "POLYGON ((10 10, 100 100, 200 10.1, 300 100, 400 10, 10 10))",
        "MULTIPOLYGON (((10 10, 100 100, 200 10, 10 10)), ((200 10, 300 100, 400 10, 200 10)))",
    ),
    (
        1,
        "MULTIPOLYGON (((1 9, 5 9, 5 1, 1 1, 1 9)), ((5.2 8.7, 9 8.7, 9 1, 5.2 1, 5.2 8.7)))",
        "POLYGON ((1 1, 1 9, 5 9, 9 9, 9 1, 5 1, 1 1))",
    ),
    (
        -100,
        "POLYGON ((100 120, 190 400, 485 398, 250 380, 400 100, 100 120))",
        "POLYGON ((200 400, 300 400, 400 100, 100 100, 200 400))",
    ),
    (
        1,
        "GEOMETRYCOLLECTION (POINT (1.1 2.2), MULTIPOINT ((1.1 2), (3.1 3.9)), LINESTRING (1 2.1, 3 3.9), MULTILINESTRING ((1 2, 3 4), (5 6, 7 8)), POLYGON ((2 2, -2 2, -2 -2, 2 -2, 2 2), (1 1, 1 -1, -1 -1, -1 1, 1 1)), MULTIPOLYGON (((2 2, -2 2, -2 -2, 2 -2, 2 2), (1 1, 1 -1, -1 -1, -1 1, 1 1)), ((7 2, 3 2, 3 -2, 7 -2, 7 2))))",
        "GEOMETRYCOLLECTION (POINT (1 2), MULTIPOINT ((1 2), (3 4)), LINESTRING (1 2, 3 4), MULTILINESTRING ((1 2, 3 4), (5 6, 7 8)), POLYGON ((2 2, -2 2, -2 -2, 2 -2, 2 2), (1 1, 1 -1, -1 -1, -1 1, 1 1)), MULTIPOLYGON (((2 2, -2 2, -2 -2, 2 -2, 2 2), (1 1, 1 -1, -1 -1, -1 1, 1 1)), ((7 2, 3 2, 3 -2, 7 -2, 7 2))))",
    ),
    (
        1,
        "GEOMETRYCOLLECTION (POINT (1.1 2.2), GEOMETRYCOLLECTION( POINT (1.1 2.2), LINESTRING (1 2.1, 3 3.9) ) )",
        "GEOMETRYCOLLECTION (POINT (1 2), GEOMETRYCOLLECTION( POINT (1 2), LINESTRING (1 2, 3 4) ) )",
    ),
]


@pytest.mark.parametrize("scale,wkt,expected", CASES)
def test_reduce_precision(scale, wkt, expected):
    got = reduce_precision(from_wkt(wkt), scale)
    assert _compare(to_wkt(got), expected), to_wkt(got)


@pytest.mark.parametrize(
    "scale,wkt,expected",
    [
        (
            1000000,
            "POLYGON ((-121.816901763 37.3285521, -121.817392418 37.328343575, -121.817876714 37.328137752, -121.818253966 37.327977421, -121.8184719 37.3278848, -121.816901763 37.3285521))",
            "POLYGON EMPTY",
        ),
        (
            -612,
            "POLYGON((3670939.6336634574 3396937.3777869204, 3670995.4715200397 3396926.0316904164, 3671077.280213823 3396905.4302639295, 3671203.8838707027 3396908.120176068, 3671334.962571111 3396904.8310892633, 3670037.299066126 3396904.8310892633, 3670037.299066126 3398075.9808747065, 3670939.6336634574 3396937.3777869204))",
            "POLYGON ((3670164 3396600, 3670164 3397824, 3670776 3397212, 3670776 3396600, 3670164 3396600))",
        ),
    ],
)
def test_reduce_precision_hot_pixel_cases(scale, wkt, expected):
    """Sliver total-collapse and self-crossing ring — resolved by the
    snap-rounded NG overlay path (hot-pixel noding)."""
    got = reduce_precision(from_wkt(wkt), scale)
    assert _compare(to_wkt(got), expected), to_wkt(got)


def test_reduce_precision_pointwise_and_keep_collapsed():
    g = from_wkt("LINESTRING ( 0 0, 0 .4 )")
    kept = reduce_precision(g, 1, remove_collapsed=False)
    assert to_wkt(kept) == "LINESTRING (0 0, 0 0)"
    pw = reduce_precision(from_wkt("LINESTRING( 1 1, 3 3, 9 9, 5.1 5, 2.1 2 )"), 1, pointwise=True)
    assert to_wkt(pw) == "LINESTRING (1 1, 3 3, 9 9, 5 5, 2 2)"
    sq = reduce_precision(from_wkt("POLYGON (( 0 0, 0 1.4, 1.4 1.4, 1.4 0, 0 0 ))"), 1, pointwise=True)
    assert to_wkt(sq) == "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"


# ---------------------------------------------------------------------------
# common-bits ops (reference: Precision/CommonBitsOpTest.cs + semantics)


def test_common_bits_op_matches_direct_intersection():
    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.overlay import overlay
    from nettopologysuite_ray.geom.precision import common_bits_op
    from nettopologysuite_ray.geom.wkt import from_wkt

    g0 = from_wkt("POLYGON ((210 210, 210 220, 220 220, 220 210, 210 210))")
    g1 = from_wkt("POLYGON ((225 225, 225 215, 215 215, 215 225, 225 225))")
    res = common_bits_op(g0, g1, "intersection")
    exp = overlay(g0, g1, "intersection")
    assert alg.equals_exact(alg.normalize(res), alg.normalize(exp))


def test_common_bits_remover_roundtrip_far_from_origin():
    from nettopologysuite_ray.geom.precision import CommonBitsRemover
    from nettopologysuite_ray.geom.wkt import from_wkt

    g = from_wkt(
        "POLYGON ((10000010 10000010, 10000020 10000010, "
        "10000020 10000020, 10000010 10000020, 10000010 10000010))"
    )
    rem = CommonBitsRemover()
    rem.add(g)
    cx, cy = rem.common_coordinate
    assert cx != 0.0 and cy != 0.0  # a large shared offset was detected
    small = rem.remove_common_bits(g)
    assert abs(small.all_coords()).max() < 1e7 / 2
    back = rem.add_common_bits(small)
    import numpy as np

    assert np.array_equal(back.all_coords(), g.all_coords())


def test_enhanced_precision_op_large_offset():
    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.precision import common_bits_op, enhanced_precision_op
    from nettopologysuite_ray.geom.wkt import from_wkt

    a = from_wkt(
        "POLYGON ((10000000 10000000, 10000004 10000000, "
        "10000004 10000004, 10000000 10000004, 10000000 10000000))"
    )
    b = from_wkt(
        "POLYGON ((10000002 10000002, 10000006 10000002, "
        "10000006 10000006, 10000002 10000006, 10000002 10000002))"
    )
    for fn in (common_bits_op, enhanced_precision_op):
        res = fn(a, b, "intersection")
        assert abs(alg.area(res) - 4.0) < 1e-6


def test_common_bits_negative_coordinates():
    """Negative ordinates have the sign bit set — the packed int64 is
    negative and must round-trip through the unsigned pack (used to
    raise struct.error, killing enhanced_precision_op on quadrant III)."""
    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.precision import CommonBitsRemover, common_bits_op
    from nettopologysuite_ray.geom.wkt import from_wkt

    a = from_wkt(
        "POLYGON ((-1000010 -2000010, -1000000 -2000010, "
        "-1000000 -2000000, -1000010 -2000000, -1000010 -2000010))"
    )
    b = from_wkt(
        "POLYGON ((-1000005 -2000005, -999995 -2000005, "
        "-999995 -1999995, -1000005 -1999995, -1000005 -2000005))"
    )
    rem = CommonBitsRemover()
    rem.add(a)
    cx, cy = rem.common_coordinate
    assert cx < 0 and cy < 0
    res = common_bits_op(a, b, "intersection")
    assert abs(alg.area(res) - 25.0) < 1e-6
