"""GeometryFixer conformance — ports every case of the reference's
test/NetTopologySuite.Tests.NUnit/Geometries/Utility/GeometryFixerTest.cs
against nettopologysuite_ray.geom.extra.fix_geometry.

Comparison follows the reference's GeometryTestCase.CheckEqual: both
sides normalized, then exact-compared.  The Z cases additionally compare
the full (x, y, z) vertex sets (CheckEqualXYZ)."""

from __future__ import annotations

import numpy as np
import pytest

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom.extra import fix_geometry
from nettopologysuite_ray.geom.validity import is_valid
from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt


def check_fix(wkt, expected, keep_collapsed=False, keep_multi=True):
    g = from_wkt(wkt)
    fixed = fix_geometry(g, keep_collapsed=keep_collapsed, keep_multi=keep_multi)
    assert is_valid(fixed), f"fix({wkt!r}) invalid: {to_wkt(fixed)}"
    exp = from_wkt(expected)
    assert alg.equals_exact(alg.normalize(fixed), alg.normalize(exp)), (
        f"fix({wkt!r}) = {to_wkt(fixed)} != {expected}"
    )
    if fixed.gtype != exp.gtype and not (fixed.is_empty and exp.is_empty):
        # MULTI wrappers must match exactly (CheckEqual compares types)
        assert fixed.gtype == exp.gtype, f"{fixed.gtype} != {exp.gtype}"
    return fixed


def xyz_set(g):
    out = set()

    def walk(geom):
        if geom.extra is None:
            return
        from nettopologysuite_ray.geom.extra import _walk_ords

        for arr, ords in _walk_ords(geom):
            a = np.asarray(arr, dtype=np.float64).reshape(-1, 2)
            o = np.asarray(ords, dtype=np.float64).reshape(len(a), -1)
            for row, orow in zip(a, o):
                out.add((float(row[0]), float(row[1]), float(orow[0])))

    walk(g)
    return out


def check_fix_z(wkt, expected, keep_collapsed=False):
    g = from_wkt(wkt)
    fixed = fix_geometry(g, keep_collapsed=keep_collapsed)
    assert is_valid(fixed)
    exp = from_wkt(expected)
    assert alg.equals_exact(alg.normalize(fixed), alg.normalize(exp)), (
        f"fix({wkt!r}) = {to_wkt(fixed)} != {expected}"
    )
    assert xyz_set(fixed) == xyz_set(exp), (
        f"XYZ mismatch: {to_wkt(fixed)} vs {expected}"
    )


# ---------------------------------------------------------------- points

def test_point():
    check_fix("POINT (0 0)", "POINT (0 0)")


def test_point_nan():
    check_fix("POINT (0 NaN)", "POINT EMPTY")


def test_point_empty():
    check_fix("POINT EMPTY", "POINT EMPTY")


def test_point_inf():
    from nettopologysuite_ray.geom.types import POINT, Geom

    for y in (float("inf"), float("-inf")):
        fixed = fix_geometry(Geom(POINT, np.array([0.0, y])))
        assert fixed.gtype == POINT and fixed.is_empty


def test_multipoint_nan():
    check_fix("MULTIPOINT ((0 NaN))", "MULTIPOINT EMPTY")


def test_multipoint():
    check_fix("MULTIPOINT ((0 0), (1 1))", "MULTIPOINT ((0 0), (1 1))")


def test_multipoint_with_empty_keep_multi():
    check_fix("MULTIPOINT ((0 0), EMPTY)", "MULTIPOINT ((0 0))", keep_multi=True)


def test_multipoint_with_empty():
    check_fix("MULTIPOINT ((0 0), EMPTY)", "POINT (0 0)", keep_multi=False)


def test_multipoint_with_multi_empty():
    check_fix("MULTIPOINT (EMPTY, EMPTY)", "MULTIPOINT EMPTY")


# ----------------------------------------------------------------- lines

def test_linestring_empty():
    check_fix("LINESTRING EMPTY", "LINESTRING EMPTY")


def test_linestring_collapse():
    check_fix("LINESTRING (0 0, 1 NaN, 0 0)", "LINESTRING EMPTY")


def test_linestring_collapse_multiple_repeated():
    check_fix("LINESTRING (0 0, 0 0, 0 0)", "LINESTRING EMPTY")


def test_linestring_keep_collapse():
    check_fix("LINESTRING (0 0, 0 0, 0 0)", "POINT (0 0)", keep_collapsed=True)


def test_linestring_repeated():
    check_fix("LINESTRING (0 0, 0 0, 0 0, 0 0, 0 0, 1 1)", "LINESTRING (0 0, 1 1)")


def test_linestring_self_cross():
    check_fix("LINESTRING (0 0, 9 9, 9 5, 0 5)", "LINESTRING (0 0, 9 9, 9 5, 0 5)")


# ----------------------------------------------------------------- rings

def test_linearring_empty():
    check_fix("LINEARRING EMPTY", "LINEARRING EMPTY")


def test_linearring_collapse_point():
    check_fix("LINEARRING (0 0, 1 NaN, 0 0)", "LINEARRING EMPTY")


def test_linearring_collapse_line():
    check_fix("LINEARRING (0 0, 1 NaN, 1 0, 0 0)", "LINEARRING EMPTY")


def test_linearring_keep_collapse_point():
    check_fix("LINEARRING (0 0, 1 NaN, 0 0)", "POINT (0 0)", keep_collapsed=True)


def test_linearring_keep_collapse_line():
    check_fix(
        "LINEARRING (0 0, 1 NaN, 1 0, 0 0)",
        "LINESTRING (0 0, 1 0, 0 0)",
        keep_collapsed=True,
    )


def test_linearring_valid():
    check_fix(
        "LINEARRING (10 10, 10 90, 90 90, 90 10, 10 10)",
        "LINEARRING (10 10, 10 90, 90 90, 90 10, 10 10)",
    )


def test_linearring_flat():
    check_fix(
        "LINEARRING (10 10, 10 90, 90 90, 10 90, 10 10)",
        "LINESTRING (10 10, 10 90, 90 90, 10 90, 10 10)",
    )


def test_linearring_self_cross():
    check_fix(
        "LINEARRING (10 10, 10 90, 90 10, 90 90, 10 10)",
        "LINESTRING (10 10, 10 90, 90 10, 90 90, 10 10)",
    )


# --------------------------------------------------------- multilinestrings

def test_multilinestring_self_cross():
    check_fix(
        "MULTILINESTRING ((10 90, 90 10, 90 90), (90 50, 10 50))",
        "MULTILINESTRING ((10 90, 90 10, 90 90), (90 50, 10 50))",
    )


def test_multilinestring_with_collapse():
    check_fix(
        "MULTILINESTRING ((10 10, 90 90), (10 10, 10 10, 10 10))",
        "LINESTRING (10 10, 90 90)",
        keep_multi=False,
    )


def test_multilinestring_with_collapse_keep_multi():
    check_fix(
        "MULTILINESTRING ((10 10, 90 90), (10 10, 10 10, 10 10))",
        "MULTILINESTRING ((10 10, 90 90))",
        keep_multi=True,
    )


def test_multilinestring_keep_collapse():
    check_fix(
        "MULTILINESTRING ((10 10, 90 90), (10 10, 10 10, 10 10))",
        "GEOMETRYCOLLECTION (POINT (10 10), LINESTRING (10 10, 90 90))",
        keep_collapsed=True,
    )


def test_multilinestring_with_empty_keep_multi():
    check_fix(
        "MULTILINESTRING ((10 10, 90 90), EMPTY)",
        "MULTILINESTRING ((10 10, 90 90))",
        keep_multi=True,
    )


def test_multilinestring_with_empty():
    check_fix(
        "MULTILINESTRING ((10 10, 90 90), EMPTY)",
        "LINESTRING (10 10, 90 90)",
        keep_multi=False,
    )


def test_multilinestring_with_multi_empty():
    check_fix("MULTILINESTRING (EMPTY, EMPTY)", "MULTILINESTRING EMPTY")


# -------------------------------------------------------------- polygons

def test_polygon_empty():
    check_fix("POLYGON EMPTY", "POLYGON EMPTY")


def test_polygon_bowtie():
    check_fix(
        "POLYGON ((10 90, 90 10, 90 90, 10 10, 10 90))",
        "MULTIPOLYGON (((10 90, 50 50, 10 10, 10 90)), ((50 50, 90 90, 90 10, 50 50)))",
    )


def test_polygon_holes_zero_area_overlapping():
    check_fix(
        "POLYGON ((10 90, 90 90, 90 10, 10 10, 10 90), "
        "(80 70, 30 70, 30 20, 30 70, 80 70), "
        "(70 80, 70 30, 20 30, 70 30, 70 80))",
        "POLYGON ((90 90, 90 10, 10 10, 10 90, 90 90))",
    )


def test_polygon_pos_and_neg_overlap():
    check_fix(
        "POLYGON ((10 90, 50 90, 50 30, 70 30, 70 50, 30 50, 30 70, 90 70, "
        "90 10, 10 10, 10 90))",
        "POLYGON ((10 90, 50 90, 50 70, 90 70, 90 10, 10 10, 10 90), "
        "(50 50, 50 30, 70 30, 70 50, 50 50))",
    )


def test_holes_touching():
    check_fix(
        "POLYGON ((0 0, 0 5, 6 5, 6 0, 0 0), (3 1, 4 1, 4 2, 3 2, 3 1), "
        "(3 2, 1 4, 5 4, 4 2, 4 3, 3 2, 2 3, 3 2))",
        "MULTIPOLYGON (((0 0, 0 5, 6 5, 6 0, 0 0), "
        "(1 4, 2 3, 3 2, 3 1, 4 1, 4 2, 5 4, 1 4)), ((3 2, 4 3, 4 2, 3 2)))",
    )


def test_polygon_nan():
    check_fix(
        "POLYGON ((10 90, 90 NaN, 90 10, 10 10, 10 90))",
        "POLYGON ((10 10, 10 90, 90 10, 10 10))",
    )


def test_polygon_repeated():
    check_fix(
        "POLYGON ((10 90, 90 10, 90 10, 90 10, 90 10, 90 10, 10 10, 10 90))",
        "POLYGON ((10 10, 10 90, 90 10, 10 10))",
    )


def test_polygon_shell_collapse():
    check_fix(
        "POLYGON ((10 10, 10 90, 90 90, 10 90, 10 10), "
        "(20 80, 60 80, 60 40, 20 40, 20 80))",
        "POLYGON EMPTY",
    )


def test_polygon_shell_collapse_nan():
    check_fix("POLYGON ((10 10, 10 NaN, 90 NaN, 10 NaN, 10 10))", "POLYGON EMPTY")


def test_polygon_shell_keep_collapse_nan():
    check_fix(
        "POLYGON ((10 10, 10 NaN, 90 NaN, 10 NaN, 10 10))",
        "POINT (10 10)",
        keep_collapsed=True,
    )


def test_polygon_shell_keep_collapse():
    check_fix(
        "POLYGON ((10 10, 10 90, 90 90, 10 90, 10 10), "
        "(20 80, 60 80, 60 40, 20 40, 20 80))",
        "LINESTRING (10 10, 10 90, 90 90, 10 90, 10 10)",
        keep_collapsed=True,
    )


def test_polygon_hole_collapse():
    check_fix(
        "POLYGON ((10 90, 90 90, 90 10, 10 10, 10 90), "
        "(80 80, 20 80, 20 20, 20 80, 80 80))",
        "POLYGON ((10 10, 10 90, 90 90, 90 10, 10 10))",
    )


def test_polygon_hole_keep_collapse():
    check_fix(
        "POLYGON ((10 90, 90 90, 90 10, 10 10, 10 90), "
        "(80 80, 20 80, 20 20, 20 80, 80 80))",
        "POLYGON ((10 10, 10 90, 90 90, 90 10, 10 10))",
        keep_collapsed=True,
    )


def test_polygon_hole_overlap_and_outside_overlap():
    check_fix(
        "POLYGON ((50 90, 80 90, 80 10, 50 10, 50 90), "
        "(70 80, 90 80, 90 20, 70 20, 70 80), "
        "(40 80, 40 50, 0 50, 0 80, 40 80), "
        "(30 40, 10 40, 10 60, 30 60, 30 40), "
        "(60 70, 80 70, 80 30, 60 30, 60 70))",
        "MULTIPOLYGON (((10 40, 10 50, 0 50, 0 80, 40 80, 40 50, 30 50, 30 40, 10 40)), "
        "((70 80, 70 70, 60 70, 60 30, 70 30, 70 20, 80 20, 80 10, 50 10, "
        "50 90, 80 90, 80 80, 70 80)))",
    )


# ---------------------------------------------------------- multipolygons

def test_multipolygon_empty():
    check_fix("MULTIPOLYGON EMPTY", "MULTIPOLYGON EMPTY")


def test_multipolygon_multi_empty():
    check_fix("MULTIPOLYGON (EMPTY, EMPTY)", "MULTIPOLYGON EMPTY")


def test_multipolygon_with_empty_keep_multi():
    check_fix(
        "MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)), EMPTY)",
        "MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)))",
        keep_multi=True,
    )


def test_multipolygon_with_empty():
    check_fix(
        "MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)), EMPTY, "
        "((50 40, 80 40, 80 10, 50 10, 50 40)))",
        "MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)), "
        "((50 40, 80 40, 80 10, 50 10, 50 40)))",
    )


def test_multipolygon_with_collapse():
    check_fix(
        "MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)), "
        "((50 40, 50 40, 50 40, 50 40, 50 40)))",
        "POLYGON ((10 10, 10 40, 40 40, 40 10, 10 10))",
        keep_multi=False,
    )


def test_multipolygon_with_collapse_keep_multi():
    check_fix(
        "MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)), "
        "((50 40, 50 40, 50 40, 50 40, 50 40)))",
        "MULTIPOLYGON (((10 10, 10 40, 40 40, 40 10, 10 10)))",
        keep_multi=True,
    )


def test_multipolygon_keep_collapse():
    check_fix(
        "MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)), "
        "((50 40, 50 40, 50 40, 50 40, 50 40)))",
        "GEOMETRYCOLLECTION (POINT (50 40), POLYGON ((10 10, 10 40, 40 40, 40 10, 10 10)))",
        keep_collapsed=True,
    )


# -------------------------------------------------------------- collections

def test_gc_empty():
    check_fix("GEOMETRYCOLLECTION EMPTY", "GEOMETRYCOLLECTION EMPTY")


def test_gc_with_all_empty():
    # NOTE: this engine's WKT reader drops empty collection elements at
    # parse time, so both sides normalize to GEOMETRYCOLLECTION EMPTY
    # (the reference keeps the typed empties — a codec-level difference,
    # not a fixer difference).
    check_fix(
        "GEOMETRYCOLLECTION (POINT EMPTY, LINESTRING EMPTY, POLYGON EMPTY)",
        "GEOMETRYCOLLECTION (POINT EMPTY, LINESTRING EMPTY, POLYGON EMPTY)",
    )


def test_gc_keep_collapse():
    check_fix(
        "GEOMETRYCOLLECTION (LINESTRING ( 0 0, 0 0), POINT (1 1))",
        "GEOMETRYCOLLECTION (POINT (0 0), POINT (1 1))",
        keep_collapsed=True,
    )


# ----------------------------------------------------------------- Z cases

def test_polygon_z_bowtie():
    check_fix_z(
        "POLYGON Z ((10 90 1, 90 10 9, 90 90 9, 10 10 1, 10 90 1))",
        "MULTIPOLYGON Z (((10 10 1, 10 90 1, 50 50 5, 10 10 1)), "
        "((50 50 5, 90 90 9, 90 10 9, 50 50 5)))",
    )


def test_polygon_z_hole_overlap():
    check_fix_z(
        "POLYGON Z ((10 90 1, 60 90 6, 60 10 6, 10 10 1, 10 90 1), "
        "(20 80 2, 90 80 9, 90 20 9, 20 20 2, 20 80 2))",
        "POLYGON Z ((10 10 1, 10 90 1, 60 90 6, 60 80 6, 20 80 2, 20 20 2, "
        "60 20 6, 60 10 6, 10 10 1))",
    )


def test_multilinestring_z_keep_collapse():
    check_fix_z(
        "MULTILINESTRING Z ((10 10 1, 90 90 9), (10 10 1, 10 10 2, 10 10 3))",
        "GEOMETRYCOLLECTION Z (POINT (10 10 1), LINESTRING (10 10 1, 90 90 9))",
        keep_collapsed=True,
    )


# --------------------------------------------------- issue-852 regression

@pytest.mark.parametrize(
    "wkt",
    [
        "POLYGON ((42.565844354657436 -72.61247966084643, 42.56484510561062 "
        "-72.61202938126273, 42.56384585656381 -72.61247966084643, "
        "42.563637679679054 -72.61276108558623, 42.562055535354936 "
        "-72.61366164475362, 42.5631796905326 -72.61259223074235, "
        "42.565844354657436 -72.61214195115866, 42.566510520688645 "
        "-72.61259223074235, 42.565844354657436 -72.61247966084643))",
        "POLYGON ((50.69544005538049 4.587126197745181, 50.699035986722194 "
        "4.592752502415541, 50.699395579856365 4.592049214331746, "
        "50.699125885005735 4.590501980547397, 50.69867639358802 "
        "4.591064611014433, 50.69795720731968 4.591064611014433, "
        "50.69759761418551 4.590501980547397, 50.69759761418551 "
        "4.589376719613325, 50.69831680045385 4.588251458679252, "
        "50.69723802105134 4.586563567278144, 50.69579964851466 "
        "4.586563567278144, 50.69544005538049 4.587126197745181))",
    ],
)
def test_issue852(wkt):
    fixed = fix_geometry(from_wkt(wkt))
    assert is_valid(fixed)


# ------------------------------------------------ dimension consistency

def test_dimension_consistency():
    # 2d
    fix2d = fix_geometry(from_wkt(
        "POLYGON((0 0, 1 0.1, 1 1, 0.5 1, 0.5 1.5, 1 1, 1.5 1.5, 1.5 1, "
        "1 1, 1.5 0.5, 1 0.1, 2 0, 2 2, 0 2, 0 0))"
    ))
    assert is_valid(fix2d) and fix2d.extra is None

    # 3d: Z preserved
    fix3d = fix_geometry(from_wkt(
        "POLYGON Z ((10 90 1, 60 90 6, 60 10 6, 10 10 1, 10 90 1), "
        "(20 80 2, 90 80 9, 90 20 9, 20 20 2, 20 80 2))"
    ))
    assert is_valid(fix3d) and fix3d.extra["dims"] == "Z"

    # 2dm: M preserved
    fix2dm = fix_geometry(from_wkt(
        "POLYGON M ((10 90 1, 60 90 6, 60 10 6, 10 10 1, 10 90 1), "
        "(20 80 2, 90 80 9, 90 20 9, 20 20 2, 20 80 2))"
    ))
    assert is_valid(fix2dm) and fix2dm.extra["dims"] == "M"

    # 3dm: Z and M preserved
    fix3dm = fix_geometry(from_wkt(
        "POLYGON ZM ((10 90 1 4, 60 90 6 4, 60 10 6 4, 10 10 1 4, 10 90 1 4), "
        "(20 80 2 4, 90 80 9 4, 90 20 9 4, 20 20 2 4, 20 80 2 4))"
    ))
    assert is_valid(fix3dm) and fix3dm.extra["dims"] == "ZM"
    # every ring's ordinate rows are (N, 2)
    for arr, ords in __import__(
        "nettopologysuite_ray.geom.extra", fromlist=["_walk_ords"]
    )._walk_ords(fix3dm):
        assert np.asarray(ords).reshape(len(np.asarray(arr).reshape(-1, 2)), -1).shape[1] == 2


# ----------------------------------------------------------- fuzz guard

def test_fixer_fuzz_guard():
    """Pinned slice of tools/fuzz_fixer.py (the reference
    GeometryFixerFuzzer.cs port): random self-crossing polygons with
    random-ring holes repair to valid geometry and re-fixing preserves
    area.  Larger campaigns run offline (see COVERAGE.md)."""
    import sys

    sys.path.insert(0, ".")
    from tools.fuzz_fixer import run

    assert run(10, seed=202, family="both", num_points=14, max_holes=2) == 0
