"""Canonical geometry ordering (reference GeometryCompareToTest.cs ports +
the order-preserving byte key that makes ds.sort('geom_key') reproduce
reference CompareTo order distributively)."""

import numpy as np
import pytest

from nettopologysuite_ray.geom.compare import (
    compare_geoms,
    geometry_sort_key,
    sort_index,
    sort_key_batch,
)
from nettopologysuite_ray.geom.wkt import from_wkt

# GeometryTestData.cs fixtures
WKT_POINT = "POINT (10 10)"
WKT_LINESTRING = "LINESTRING (10 10, 20 20, 30 40)"
WKT_LINEARRING = "LINEARRING (10 10, 20 20, 30 40, 10 10)"
WKT_POLY = "POLYGON ((50 50, 50 150, 150 150, 150 50, 50 50))"
WKT_POLY_HOLE = (
    "POLYGON ((50 50, 50 150, 150 150, 150 50, 50 50), "
    "(70 70, 100 70, 100 100, 70 100, 70 70))"
)
WKT_MULTIPOINT = "MULTIPOINT ((10 10), (20 20))"
WKT_MULTILINESTRING = "MULTILINESTRING ((10 10, 20 20), (15 15, 30 15))"
WKT_MULTIPOLYGON = (
    "MULTIPOLYGON (((10 10, 10 20, 20 20, 20 15, 10 10)), "
    "((60 60, 70 70, 80 60, 60 60)))"
)
WKT_GC = "GEOMETRYCOLLECTION (POINT (10 10), POINT (30 30), LINESTRING (15 15, 20 20))"


def _sgn(x: int) -> int:
    return (x > 0) - (x < 0)


def check(exp: int, wa: str, wb: str):
    a, b = from_wkt(wa), from_wkt(wb)
    assert _sgn(compare_geoms(a, b)) == exp
    assert _sgn(compare_geoms(b, a)) == -exp
    ka, kb = geometry_sort_key(a), geometry_sort_key(b)
    got = (ka > kb) - (ka < kb)
    assert got == exp  # byte key reproduces the comparator


def test_points():
    check(-1, "POINT (0 0)", "POINT (1 0)")
    check(-1, "POINT (0 0)", "POINT (0 1)")
    check(1, "POINT (1 0)", "POINT (0 1)")


def test_lines():
    check(-1, "LINESTRING ( 0 0, 1 1, 0 1)", "LINESTRING ( 0 0, 1 1, 0 2)")


def test_polygon_to_polygon_with_hole():
    check(-1, WKT_POLY, WKT_POLY_HOLE)


def test_equal():
    for w in (WKT_POINT, WKT_LINESTRING, WKT_POLY, WKT_POLY_HOLE):
        check(0, w, w)


def test_type_ordering():
    seq = [
        WKT_POINT,
        WKT_MULTIPOINT,
        WKT_LINESTRING,
        WKT_LINEARRING,
        WKT_MULTILINESTRING,
        WKT_POLY,
        WKT_MULTIPOLYGON,
        WKT_GC,
    ]
    for wa, wb in zip(seq[:-1], seq[1:]):
        check(-1, wa, wb)
    assert [sort_index(from_wkt(w)) for w in seq] == list(range(8))


def test_empty_sorts_below_nonempty_same_type():
    check(-1, "POINT EMPTY", WKT_POINT)
    check(-1, "LINESTRING EMPTY", WKT_LINESTRING)
    check(-1, "POLYGON EMPTY", WKT_POLY)
    check(0, "POINT EMPTY", "POINT EMPTY")


def test_prefix_and_structure_cases():
    # shorter coordinate sequence sorts first
    check(-1, "LINESTRING (0 0, 1 1)", "LINESTRING (0 0, 1 1, 2 2)")
    # shorter collection sorts first
    check(-1, "MULTIPOINT ((1 1))", "MULTIPOINT ((1 1), (2 2))")
    # element boundary vs ring boundary: a's first polygon has no hole
    check(
        -1,
        "MULTIPOLYGON (((0 0, 0 1, 1 1, 0 0)), ((9 9, 9 10, 10 10, 9 9)))",
        "MULTIPOLYGON (((0 0, 0 1, 1 1, 0 0), "
        "(0.1 0.2, 0.2 0.3, 0.3 0.2, 0.1 0.2)))",
    )
    # negative ordinates (sign-flip encoding)
    check(-1, "POINT (-2 0)", "POINT (-1 0)")
    check(-1, "POINT (-1 0)", "POINT (0 0)")
    check(0, "POINT (-0 0)", "POINT (0 0)")


def test_key_order_matches_comparator_random():
    import functools
    import random

    rng = random.Random(11)
    geoms = []
    for _ in range(120):
        kind = rng.randrange(5)
        cs = lambda n: ", ".join(
            f"{rng.randint(-5, 5)} {rng.randint(-5, 5)}" for _ in range(n)
        )
        if kind == 0:
            geoms.append(from_wkt(f"POINT ({rng.randint(-5,5)} {rng.randint(-5,5)})"))
        elif kind == 1:
            geoms.append(from_wkt(f"LINESTRING ({cs(rng.randint(2, 4))})"))
        elif kind == 2:
            x, y = rng.randint(-5, 5), rng.randint(-5, 5)
            geoms.append(
                from_wkt(f"POLYGON (({x} {y}, {x+1} {y}, {x+1} {y+1}, {x} {y}))")
            )
        elif kind == 3:
            geoms.append(from_wkt(f"MULTIPOINT ({cs(rng.randint(1, 3))})"))
        else:
            geoms.append(from_wkt(f"LINEARRING (0 0, {rng.randint(1,5)} 0, 1 1, 0 0)"))
    by_cmp = sorted(geoms, key=functools.cmp_to_key(compare_geoms))
    by_key = sorted(geoms, key=geometry_sort_key)
    for u, v in zip(by_cmp, by_key):
        assert compare_geoms(u, v) == 0


def test_dataset_sort_by_geom_key(ray_session):
    import functools

    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb

    rng = np.random.default_rng(5)
    wkts = [
        f"POINT ({x} {y})" for x, y in rng.integers(-50, 50, size=(100, 2))
    ] + [
        f"LINESTRING ({x} {y}, {x+1} {y+2})"
        for x, y in rng.integers(-50, 50, size=(50, 2))
    ]
    geoms = [from_wkt(w) for w in wkts]
    ds = rd.from_arrow(
        pa.table({"wkb": pa.array([to_wkb(g) for g in geoms], type=pa.binary())})
    )
    out = (
        ds.map_batches(sort_key_batch, batch_format="pyarrow")
        .sort("geom_key")
        .take_all()
    )
    got = [from_wkb(r["wkb"]) for r in out]
    exp = sorted(geoms, key=functools.cmp_to_key(compare_geoms))
    for u, v in zip(exp, got):
        assert compare_geoms(u, v) == 0
