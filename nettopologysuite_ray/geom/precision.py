"""GeometryPrecisionReducer (reference: Precision/GeometryPrecisionReducer.cs:45,
Operation/OverlayNG/PrecisionReducer.cs:18, UnaryUnionNG.cs:20).

Reduces coordinate precision to a PrecisionModel grid:
* points / lines: pointwise round + consecutive-duplicate removal; fully
  collapsed components are removed (or kept degenerate with
  remove_collapsed=False)
* polygonal geometry: fixed-precision self-union (snap-round noding via
  the overlay engine), which repairs rounding damage, merges components
  that become adjacent and drops collapses — the OverlayNG PrecisionReducer
  path
* pointwise=True skips all topology repair (PointwisePrecisionReducerTransformer)
"""

from __future__ import annotations

import numpy as np

from .overlay import _snap_arr
from .types import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
)


def _grid_of(scale: float) -> float:
    """PrecisionModel(scale): positive scale = 1/scale grid; the reference
    treats a negative scale as a grid SIZE directly (PrecisionModel.cs
    gridSize semantics used by TestGridsize/TestLargeGridsizeFail)."""
    s = float(scale)
    if s > 0:
        return 1.0 / s
    if s < 0:
        return -s
    raise ValueError("scale must be non-zero")


def _dedup_consecutive(arr: np.ndarray) -> np.ndarray:
    if len(arr) <= 1:
        return arr
    keep = np.ones(len(arr), dtype=bool)
    keep[1:] = (arr[1:] != arr[:-1]).any(axis=1)
    return arr[keep]


def reduce_precision(
    g: Geom,
    scale: float,
    remove_collapsed: bool = True,
    pointwise: bool = False,
) -> Geom:
    """reference: GeometryPrecisionReducer.Reduce (scale-factor precision
    model; see module docstring for the component rules)."""
    grid = _grid_of(scale)
    return _reduce(g, grid, remove_collapsed, pointwise)


def _reduce(g: Geom, grid: float, remove_collapsed: bool, pointwise: bool) -> Geom:
    t = g.gtype
    if t == GEOMETRYCOLLECTION:
        return Geom(
            GEOMETRYCOLLECTION,
            [_reduce(c, grid, remove_collapsed, pointwise) for c in g.data],
        )
    if t == POINT:
        if g.is_empty:
            return g
        return Geom(POINT, _snap_arr(g.data, grid))
    if t == MULTIPOINT:
        return Geom(MULTIPOINT, [_snap_arr(p, grid) for p in g.data])
    if t in (LINESTRING, MULTILINESTRING):
        parts = [g.data] if t == LINESTRING else list(g.data)
        out = []
        for ls in parts:
            arr = _snap_arr(ls, grid)
            if pointwise:
                out.append(arr)
                continue
            arr = _dedup_consecutive(arr)
            if len(arr) >= 2:
                out.append(arr)
            elif not remove_collapsed and len(arr) == 1:
                # degenerate collapsed line kept verbatim (reference keeps
                # the repeated-point line; rings keep 3 points)
                n = 3 if g.tag == "LinearRing" else 2
                out.append(np.repeat(arr, n, axis=0))
        if not out:
            return Geom.empty(LINESTRING)
        if len(out) == 1:
            return Geom(LINESTRING, out[0], tag=g.tag)
        return Geom(MULTILINESTRING, out)
    if t in (POLYGON, MULTIPOLYGON):
        if g.is_empty:
            return g
        if pointwise:
            snap_rings = lambda rings: [_snap_arr(r, grid) for r in rings]
            if t == POLYGON:
                return Geom(POLYGON, snap_rings(g.data))
            return Geom(MULTIPOLYGON, [snap_rings(rings) for rings in g.data])
        # fixed-precision self-union through the SNAP-ROUNDED NG overlay
        # (hot-pixel noding — reference PrecisionReducer uses OverlayNG):
        # repairs rounding damage, merges newly-adjacent parts, collapses
        # slivers whose edges re-route through each other's hot pixels
        from .overlay import overlay

        u = overlay(g, Geom.empty(POLYGON), "union", grid_size=grid, ng=True)
        polys = [c for c in u.flatten() if c.gtype == POLYGON]
        if not polys:
            return Geom.empty(POLYGON)
        if len(polys) == 1:
            return polys[0]
        return Geom(MULTIPOLYGON, [p.data for p in polys])
    raise ValueError(t)
