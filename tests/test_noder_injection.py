"""Pluggable noder / union-strategy injection (reference:
OverlayNG.cs:416 Noder property, Operation/Union/UnionStrategy.cs,
Noding/Snap/SnappingNoder.cs, Noding/SegmentExtractingNoder.cs)."""

import numpy as np

from nettopologysuite_ray.geom.overlay import (
    overlay,
    segment_extracting_noder,
    snapping_noder,
    union_all,
)
from nettopologysuite_ray.geom.types import Geom
from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt
from nettopologysuite_ray.geom.algorithms import area, normalize


def _sq(x0, y0, s):
    return from_wkt(
        f"POLYGON(({x0} {y0}, {x0+s} {y0}, {x0+s} {y0+s}, {x0} {y0+s}, {x0} {y0}))"
    )


def test_snapping_noder_matches_presnapped_overlay():
    a = from_wkt(
        "POLYGON((0.0001 0.0002, 10.0003 0.0001, 10.0002 10.0001, 0.0004 10.0002, 0.0001 0.0002))"
    )
    b = from_wkt(
        "POLYGON((5.0001 5.0003, 15.0002 5.0001, 15.0001 15.0004, 5.0003 15.0001, 5.0001 5.0003))"
    )
    from nettopologysuite_ray.geom.overlay import snap_to_grid

    got = overlay(a, b, "intersection", noder=snapping_noder(0.001))
    exp = overlay(snap_to_grid(a, 0.001), snap_to_grid(b, 0.001), "intersection")
    assert to_wkt(normalize(got)) == to_wkt(normalize(exp))
    assert abs(area(got) - 25.0) < 0.1


def test_segment_extracting_noder_line_overlay():
    a = from_wkt("LINESTRING(0 0, 5 0, 10 0)")
    b = from_wkt("LINESTRING(5 0, 5 5)")
    default = overlay(a, b, "union")
    noded = overlay(a, b, "union", noder=segment_extracting_noder())
    # same merged linework either way (the noder only pre-splits)
    assert to_wkt(normalize(noded)) == to_wkt(normalize(default))
    # areal inputs pass through the extracting noder unchanged
    sq = _sq(0, 0, 4)
    assert to_wkt(segment_extracting_noder()(sq)) == to_wkt(sq)


def test_union_strategy_injection():
    calls = {"n": 0}

    def counting_strategy(g0, g1):
        calls["n"] += 1
        return overlay(g0, g1, "union")

    squares = [_sq(i * 2, 0, 3) for i in range(5)]  # overlapping run
    got = union_all(squares, strategy=counting_strategy)
    exp = union_all(squares)
    assert calls["n"] == 4  # n-1 pairwise folds
    assert to_wkt(normalize(got)) == to_wkt(normalize(exp))
    assert abs(area(got) - area(exp)) < 1e-9
