"""Ports of the reference's ElevationModelTest.cs + overlay_z sanity
(reference: test/NetTopologySuite.Tests.NUnit/Operation/OverlayNG/
ElevationModelTest.cs; OverlayNG.cs:437-459)."""

import math

import pytest

from nettopologysuite_ray.geom.elevation import ElevationModel, overlay_z
from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt


def check_elevation(wkts, *ords):
    gs = [from_wkt(w) for w in wkts]
    model = ElevationModel.create(gs[0], gs[1] if len(gs) > 1 else None)
    for i in range(0, len(ords), 3):
        x, y, z = ords[i], ords[i + 1], ords[i + 2]
        got = model.get_z(x, y)
        if math.isnan(z):
            assert math.isnan(got), (x, y)
        else:
            assert got == pytest.approx(z, abs=1e-5), (x, y)


def test_box():
    check_elevation(
        ["POLYGON Z ((1 6 50, 9 6 60, 9 4 50, 1 4 40, 1 6 50))"],
        0, 10, 50, 5, 10, 50, 10, 10, 60,
        0, 5, 50, 5, 5, 50, 10, 5, 50,
        0, 4, 40, 5, 4, 50, 10, 4, 50,
        0, 0, 40, 5, 0, 50, 10, 0, 50,
    )


def test_line():
    check_elevation(
        ["LINESTRING Z (0 0 0, 10 10 10)"],
        -1, 11, 5, 11, 11, 10,
        0, 10, 5, 5, 10, 5, 10, 10, 10,
        0, 5, 5, 5, 5, 5, 10, 5, 5,
        0, 0, 0, 5, 0, 5, 10, 0, 5,
        -1, -1, 0, 5, -1, 5, 11, -1, 5,
    )


def test_multi_line_and_two_lines():
    exp = [
        -1, 11, 4, 11, 11, 7,
        0, 10, 4, 5, 10, 4, 10, 10, 7,
        0, 5, 4, 5, 5, 4, 10, 5, 4,
        0, 0, 1, 5, 0, 4, 10, 0, 4,
        -1, -1, 1, 5, -1, 4, 11, -1, 4,
    ]
    check_elevation(["MULTILINESTRING Z ((0 0 0, 10 10 8), (1 2 2, 9 8 6))"], *exp)
    check_elevation(
        ["LINESTRING Z (0 0 0, 10 10 8)", "LINESTRING Z (1 2 2, 9 8 6)"], *exp
    )


def test_line_2d():
    check_elevation(["LINESTRING (0 0, 10 10)"], 5, 5, math.nan)


def test_line_horizontal_vertical():
    check_elevation(
        ["LINESTRING Z (0 5 0, 10 5 10)"],
        0, 10, 0, 5, 10, 5, 10, 10, 10,
        0, 5, 0, 5, 5, 5, 10, 5, 10,
        0, 0, 0, 5, 0, 5, 10, 0, 10,
    )
    check_elevation(
        ["LINESTRING Z (5 0 0, 5 10 10)"],
        0, 10, 10, 5, 10, 10, 10, 10, 10,
        0, 5, 5, 5, 5, 5, 10, 5, 5,
        0, 0, 0, 5, 0, 0, 10, 0, 0,
    )


def test_point_and_multipoint_same():
    check_elevation(
        ["POINT Z (5 5 5)"],
        0, 9, 5, 5, 9, 5, 9, 9, 5,
        0, 5, 5, 5, 5, 5, 9, 5, 5,
        0, 0, 5, 5, 0, 5, 9, 0, 5,
    )
    check_elevation(
        ["MULTIPOINT Z ((5 5 5), (5 5 9))"],
        0, 9, 7, 5, 9, 7, 9, 9, 7,
        0, 5, 7, 5, 5, 7, 9, 5, 7,
        0, 0, 7, 5, 0, 7, 9, 0, 7,
    )


def _zs(g):
    """(x, y, z) set over all vertices of a Z-bearing geometry."""
    from nettopologysuite_ray.geom.distance3d import (
        _component_coords3,
        _flatten_z,
    )

    out = set()
    for comp in _flatten_z(g):
        for arr in _component_coords3(comp):
            for x, y, z in arr:
                out.add((x, y, z))
    return out


def test_populate_z():
    model = ElevationModel.create(from_wkt("LINESTRING Z (0 0 0, 10 10 10)"), None)
    line = model.populate_z(from_wkt("LINESTRING (1 1, 9 9)"))
    assert _zs(line) == {(1, 1, 0), (9, 9, 10)}
    box = model.populate_z(from_wkt("POLYGON ((1 9, 9 9, 9 1, 1 1, 1 9))"))
    assert _zs(box) == {(1, 9, 5), (9, 9, 10), (9, 1, 5), (1, 1, 0)}
    # no-Z model: unchanged (still 2D)
    model2 = ElevationModel.create(from_wkt("LINESTRING (0 0, 10 10)"), None)
    g = from_wkt("POINT (5 5)")
    assert model2.populate_z(g) is g


def test_overlay_z():
    a = from_wkt("POLYGON Z ((0 0 10, 10 0 10, 10 10 10, 0 10 10, 0 0 10))")
    b = from_wkt("POLYGON Z ((5 5 20, 15 5 20, 15 15 20, 5 15 20, 5 5 20))")
    res = overlay_z(a, b, "intersection")
    zs = _zs(res)
    # input vertices carry their Z exactly; the new corners get model fill
    assert (5, 5, 20) in zs
    assert (10, 10, 10) in zs
    xy = {(x, y) for x, y, _z in zs}
    assert xy == {(5, 5), (10, 5), (10, 10), (5, 10)}
    assert all(not math.isnan(z) for _x, _y, z in zs)
    # 2D inputs stay 2D
    a2 = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    b2 = from_wkt("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
    res2 = overlay_z(a2, b2, "intersection")
    assert res2.extra is None
