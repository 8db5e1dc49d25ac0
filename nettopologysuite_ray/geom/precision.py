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


# ---------------------------------------------------------------------------
# common-bits precision enhancement
# (reference: Precision/CommonBits.cs, CommonBitsRemover.cs:16,
#  CommonBitsOp.cs:18, EnhancedPrecisionOp.cs:14 — translate operands to a
#  common-bits origin, run the overlay, translate back)

import struct as _struct


def _d2bits(x: float) -> int:
    return _struct.unpack(">q", _struct.pack(">d", x))[0]


def _bits2d(b: int) -> float:
    # mask to unsigned then pack as Q: negative bit patterns (negative
    # doubles) masked to > 2^63-1 would overflow a signed '>q' pack
    return _struct.unpack(">d", _struct.pack(">Q", b & 0xFFFFFFFFFFFFFFFF))[0]


class CommonBits:
    """Maximum common most-significant bit prefix of a stream of doubles
    (Precision/CommonBits.cs); ``common`` is the double those shared bits
    represent (0.0 when sign/exponent differ)."""

    def __init__(self) -> None:
        self._first = True
        self._bits = 0

    def add(self, num: float) -> None:
        nb = _d2bits(num)
        if self._first:
            self._bits = nb
            self._first = False
            return
        if (nb >> 52) != (self._bits >> 52):
            self._bits = 0
            return
        count = 0
        for i in range(52, -1, -1):
            if ((nb >> i) & 1) != ((self._bits >> i) & 1):
                break
            count += 1
        count = min(count, 52)  # the hidden bit is not counted (ref cap)
        n_zero = 64 - (12 + count)
        self._bits &= ~((1 << n_zero) - 1)

    @property
    def common(self) -> float:
        return _bits2d(self._bits)


class CommonBitsRemover:
    """Computes the common coordinate offset of added geometries and
    translates geometries by it and back (CommonBitsRemover.cs:16)."""

    def __init__(self) -> None:
        self._cx = CommonBits()
        self._cy = CommonBits()

    def add(self, g: Geom) -> None:
        for x, y in g.all_coords():
            self._cx.add(float(x))
            self._cy.add(float(y))

    @property
    def common_coordinate(self) -> tuple[float, float]:
        return (self._cx.common, self._cy.common)

    def _translate(self, g: Geom, dx: float, dy: float) -> Geom:
        def tx(arr):
            a = np.asarray(arr, dtype=np.float64).reshape(-1, 2).copy()
            a[:, 0] += dx
            a[:, 1] += dy
            return a

        t = g.gtype
        if g.is_empty:
            return g
        if t == POINT:
            return Geom(t, tx(g.data)[0], tag=g.tag, extra=g.extra)
        if t == LINESTRING:
            return Geom(t, tx(g.data), tag=g.tag, extra=g.extra)
        if t == POLYGON:
            return Geom(t, [tx(r) for r in g.data], tag=g.tag, extra=g.extra)
        if t == MULTIPOINT:
            return Geom(t, [tx(p)[0] for p in g.data], tag=g.tag, extra=g.extra)
        if t == MULTILINESTRING:
            return Geom(t, [tx(ls) for ls in g.data], tag=g.tag, extra=g.extra)
        if t == MULTIPOLYGON:
            return Geom(
                t, [[tx(r) for r in rings] for rings in g.data], tag=g.tag, extra=g.extra
            )
        return Geom(t, [self._translate(c, dx, dy) for c in g.data], tag=g.tag)

    def remove_common_bits(self, g: Geom) -> Geom:
        cx, cy = self.common_coordinate
        if cx == 0.0 and cy == 0.0:
            return g
        return self._translate(g, -cx, -cy)

    def add_common_bits(self, g: Geom) -> Geom:
        cx, cy = self.common_coordinate
        if cx == 0.0 and cy == 0.0:
            return g
        return self._translate(g, cx, cy)


def common_bits_op(a: Geom, b: Geom, op: str, return_to_original: bool = True) -> Geom:
    """Overlay computed in common-bits-removed coordinates
    (CommonBitsOp.cs:18): both operands are translated so their shared
    high mantissa bits cancel, the op runs near the origin, and the
    result is translated back (unless return_to_original=False)."""
    from .overlay import overlay

    rem = CommonBitsRemover()
    rem.add(a)
    rem.add(b)
    ra = rem.remove_common_bits(a)
    rb = rem.remove_common_bits(b)
    res = overlay(ra, rb, op)
    return rem.add_common_bits(res) if return_to_original else res


def enhanced_precision_op(a: Geom, b: Geom, op: str) -> Geom:
    """EnhancedPrecisionOp.cs:14: try the plain overlay; on failure retry
    with common-bits removal."""
    from .overlay import overlay

    try:
        return overlay(a, b, op)
    except Exception:  # noqa: BLE001 - the reference catches all and retries
        return common_bits_op(a, b, op)
