"""Scalar geometry algorithms: the math kernels of the engine.

Re-creates the semantics of the reference's algorithm layer —
orientation (Algorithm/Orientation.cs via CGAlgorithmsDD.cs), ray-crossing
point location (Algorithm/RayCrossingCounter.cs:34), area/length
(Algorithm/Area.cs, Length.cs), centroid (Algorithm/Centroid.cs:37),
interior point (Algorithm/InteriorPoint.cs:29), convex hull
(Algorithm/ConvexHull.cs:20), distance (Operation/Distance/DistanceOp.cs:24),
Douglas-Peucker simplify (Simplify/DouglasPeuckerSimplifier.cs:29),
densify (Densify/Densifier.cs:27), discrete Hausdorff
(Algorithm/Distance/DiscreteHausdorffDistance.cs:53) — implemented fresh
on numpy arrays, with an exact-arithmetic fallback (Fraction) where the
reference uses double-double (Mathematics/DD.cs:69).

Location codes follow Geometries/Location.cs: 0=Interior, 1=Boundary,
2=Exterior (NONE = -1).
"""

from __future__ import annotations

from fractions import Fraction

import math
import numpy as np

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

INTERIOR = 0
BOUNDARY = 1
EXTERIOR = 2

# ---------------------------------------------------------------------------
# robust primitives


def orient2d(ax, ay, bx, by, cx, cy) -> int:
    """Sign of the cross product (b-a) x (c-a): +1 CCW, -1 CW, 0 collinear.
    Double filter with exact rational fallback (reference robustness via DD
    arithmetic: Algorithm/CGAlgorithmsDD.cs, Mathematics/DD.cs:69)."""
    detleft = (ax - cx) * (by - cy)
    detright = (ay - cy) * (bx - cx)
    det = detleft - detright
    if detleft > 0.0:
        if detright <= 0.0:
            return _sign(det)
        detsum = detleft + detright
    elif detleft < 0.0:
        if detright >= 0.0:
            return _sign(det)
        detsum = -detleft - detright
    else:
        return _sign(det)
    # error bound filter (Shewchuk's ccwerrboundA ~ 3.33e-16)
    errbound = 3.3306690621773724e-16 * detsum
    if det >= errbound or -det >= errbound:
        return _sign(det)
    # exact fallback
    d = (Fraction(ax) - Fraction(cx)) * (Fraction(by) - Fraction(cy)) - (
        Fraction(ay) - Fraction(cy)
    ) * (Fraction(bx) - Fraction(cx))
    return (d > 0) - (d < 0)


def _sign(v) -> int:
    return int(v > 0) - int(v < 0)


def on_segment(px, py, ax, ay, bx, by) -> bool:
    """True if point p lies on closed segment ab."""
    if orient2d(ax, ay, bx, by, px, py) != 0:
        return False
    return min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by)


def segment_intersection(p1, p2, q1, q2):
    """Classify intersection of segments p1p2 and q1q2.

    Returns (kind, pts) where kind is one of:
      'none'      — disjoint
      'point'     — single intersection point; pts = [(x, y)]
      'overlap'   — collinear overlap; pts = [(x0,y0), (x1,y1)] endpoints
    Semantics of Algorithm/RobustLineIntersector.cs:10.
    """
    o1 = orient2d(p1[0], p1[1], p2[0], p2[1], q1[0], q1[1])
    o2 = orient2d(p1[0], p1[1], p2[0], p2[1], q2[0], q2[1])
    if (o1 > 0 and o2 > 0) or (o1 < 0 and o2 < 0):
        return "none", []
    o3 = orient2d(q1[0], q1[1], q2[0], q2[1], p1[0], p1[1])
    o4 = orient2d(q1[0], q1[1], q2[0], q2[1], p2[0], p2[1])
    if (o3 > 0 and o4 > 0) or (o3 < 0 and o4 < 0):
        return "none", []
    if o1 == 0 and o2 == 0:
        # collinear: project on dominant axis
        if abs(p2[0] - p1[0]) >= abs(p2[1] - p1[1]):
            axis = 0
        else:
            axis = 1
        pts = sorted([tuple(p1), tuple(p2)], key=lambda c: c[axis])
        qts = sorted([tuple(q1), tuple(q2)], key=lambda c: c[axis])
        lo = max(pts[0][axis], qts[0][axis])
        hi = min(pts[1][axis], qts[1][axis])
        if lo > hi:
            return "none", []
        cands = [c for c in (pts[0], pts[1], qts[0], qts[1]) if lo <= c[axis] <= hi]
        cands = sorted(set(cands), key=lambda c: c[axis])
        if len(cands) == 1 or (len(cands) >= 2 and cands[0] == cands[-1]):
            return "point", [cands[0]]
        return "overlap", [cands[0], cands[-1]]
    # proper or endpoint touch: single point
    # endpoint-on-segment cases first (exact)
    if o1 == 0 and _in_box(q1, p1, p2):
        return "point", [tuple(q1)]
    if o2 == 0 and _in_box(q2, p1, p2):
        return "point", [tuple(q2)]
    if o3 == 0 and _in_box(p1, q1, q2):
        return "point", [tuple(p1)]
    if o4 == 0 and _in_box(p2, q1, q2):
        return "point", [tuple(p2)]
    # proper crossing: compute with doubles.  The point is parameterized
    # along the FIRST segment, so its rounding follows the caller's
    # operand order — the same convention the reference's expected
    # outputs encode (canonicalizing operands here breaks two
    # TestRelateAA-big conformance matrices).  Consequence, accepted: at
    # sub-representable coordinates (denormal ordinates) relate(a,b) and
    # relate(b,a) can disagree by one ulp of node placement; real-domain
    # inputs are operand-symmetric (fuzzed at 1e-15..1e7 scales).
    x1, y1 = p1
    x2, y2 = p2
    x3, y3 = q1
    x4, y4 = q2
    denom = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
    if denom == 0:
        return "none", []
    t = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / denom
    return "point", [(x1 + t * (x2 - x1), y1 + t * (y2 - y1))]


def _in_box(p, a, b) -> bool:
    return min(a[0], b[0]) <= p[0] <= max(a[0], b[0]) and min(a[1], b[1]) <= p[1] <= max(
        a[1], b[1]
    )


# ---------------------------------------------------------------------------
# envelope


def envelope(g: Geom):
    """(minx, miny, maxx, maxy) or None when empty
    (reference: Geometries/Envelope.cs:21)."""
    cs = g.all_coords()
    if len(cs) == 0:
        return None
    return (
        float(cs[:, 0].min()),
        float(cs[:, 1].min()),
        float(cs[:, 0].max()),
        float(cs[:, 1].max()),
    )


# ---------------------------------------------------------------------------
# area / length / ring orientation


def ring_signed_area(ring: np.ndarray) -> float:
    # Anchored at the first vertex (reference: Algorithm/Area.cs
    # OfRingSigned subtracts x0): the raw shoelace loses ~ulp(x*y)
    # per term, which at |coord|~1e7 is ~0.02 absolute — catastrophic
    # for unit-scale rings far from the origin.
    if len(ring) < 3:
        return 0.0
    x = ring[:, 0] - ring[0, 0]
    y = ring[:, 1] - ring[0, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def is_ccw(ring: np.ndarray) -> bool:
    return ring_signed_area(ring) > 0


def is_ccw_robust(ring: np.ndarray) -> bool:
    """Orientation via the highest-vertex technique with robust orientation
    index (reference: Algorithm/Orientation.cs IsCCW) — correct even for
    nearly-degenerate slivers where the shoelace sign is noise."""
    n = len(ring) - 1
    if n < 3:
        return False
    hi = 0
    for i in range(1, n):
        if ring[i, 1] > ring[hi, 1]:
            hi = i
    iprev = hi
    while True:
        iprev = (iprev - 1) % n
        if (ring[iprev] != ring[hi]).any() or iprev == hi:
            break
    inext = hi
    while True:
        inext = (inext + 1) % n
        if (ring[inext] != ring[hi]).any() or inext == hi:
            break
    disc = orient2d(
        ring[iprev, 0], ring[iprev, 1], ring[hi, 0], ring[hi, 1], ring[inext, 0], ring[inext, 1]
    )
    if disc == 0:
        return ring[iprev, 0] > ring[inext, 0]
    return disc > 0


def area(g: Geom) -> float:
    t = g.gtype
    if t == POLYGON:
        if not g.data:
            return 0.0
        a = abs(ring_signed_area(g.data[0]))
        for h in g.data[1:]:
            a -= abs(ring_signed_area(h))
        return a
    if t in (MULTIPOLYGON, GEOMETRYCOLLECTION):
        return sum(area(c) for c in g.geoms())
    return 0.0


def length(g: Geom) -> float:
    t = g.gtype
    if t == LINESTRING:
        if len(g.data) < 2:
            return 0.0
        d = np.diff(g.data, axis=0)
        return float(np.sqrt((d * d).sum(axis=1)).sum())
    if t == POLYGON:
        tot = 0.0
        for r in g.data:
            d = np.diff(r, axis=0)
            tot += float(np.sqrt((d * d).sum(axis=1)).sum())
        return tot
    if t in (MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        return sum(length(c) for c in g.geoms())
    return 0.0


# ---------------------------------------------------------------------------
# point location (ray crossing)


def _ring_envs(rings):
    """Per-ring (minx, miny, maxx, maxy) for the locate prefilter."""
    out = []
    for r in rings:
        r = np.asarray(r)
        if len(r) == 0:
            out.append((0.0, 0.0, -1.0, -1.0))  # empty: excludes everything
        else:
            out.append(
                (
                    float(r[:, 0].min()),
                    float(r[:, 1].min()),
                    float(r[:, 0].max()),
                    float(r[:, 1].max()),
                )
            )
    return out


def geom_ring_envs(g: Geom):
    """Cached per-ring envelopes of a POLYGON, or per-component
    (component_env, ring_envs) list of a MULTIPOLYGON (lazy, stored on the
    Geom; the scalar locate kernel was O(total vertices) per probe, which
    made piece classification against large accumulated unions the
    dominant cost of cascaded union_all)."""
    env = g._env
    if env is None:
        if g.gtype == POLYGON:
            env = _ring_envs(g.data)
        else:  # MULTIPOLYGON
            env = []
            for rings in g.data:
                res = _ring_envs(rings)
                shell = res[0]
                env.append((shell, res))
        g._env = env
    return env


def locate_point_in_rings(px: float, py: float, rings, ring_envs=None) -> int:
    """Even-odd location of a point against a set of rings (shell+holes).
    Returns INTERIOR / BOUNDARY / EXTERIOR.
    Semantics of Algorithm/RayCrossingCounter.cs:34.

    ring_envs: optional per-ring envelopes; a ring whose envelope strictly
    excludes the point is skipped — it contributes an even number of ray
    crossings (a closed ring crosses the horizontal line y=py an even
    number of times, and when the whole ring is on one side of px they
    all count or none do), so parity is invariant, and the point cannot
    lie on its boundary."""
    crossings = 0
    for ri, ring in enumerate(rings):
        if ring_envs is not None:
            e = ring_envs[ri]
            if py < e[1] or py > e[3] or px < e[0] or px > e[2]:
                continue
        n = len(ring)
        for i in range(n - 1):
            x1, y1 = ring[i]
            x2, y2 = ring[i + 1]
            if (y1 <= py) != (y2 <= py):
                o = orient2d(x1, y1, x2, y2, px, py)
                if o == 0:
                    return BOUNDARY
                if y1 <= py:  # upward edge
                    if o > 0:
                        crossings += 1
                else:  # downward edge
                    if o < 0:
                        crossings += 1
            elif y1 == py and y2 == py:
                # horizontal edge at ray level: boundary check only
                if min(x1, x2) <= px <= max(x1, x2):
                    return BOUNDARY
            elif (y1 == py and x1 == px) or (y2 == py and x2 == px):
                return BOUNDARY
    return INTERIOR if crossings % 2 == 1 else EXTERIOR


def locate_points_in_rings(pts: np.ndarray, rings) -> np.ndarray:
    """Vectorized even-odd location of many points vs one ring set.

    pts: (P, 2).  Returns (P,) int8 array of Location codes.  This is the
    batch PIP kernel of the spatial-join stage (prepared-polygon probe,
    reference: Algorithm/Locate/IndexedPointInAreaLocator.cs:111).
    Uses double arithmetic; points flagged near-boundary are re-checked
    with the robust scalar kernel.
    """
    P = len(pts)
    if P == 0:
        return np.empty(0, dtype=np.int8)
    segs = _ring_segments(rings)
    if segs is None:
        return np.full(P, EXTERIOR, dtype=np.int8)
    x1, y1, x2, y2 = segs
    px = pts[:, 0][:, None]
    py = pts[:, 1][:, None]
    straddle = (y1[None, :] <= py) != (y2[None, :] <= py)
    # cross product (p2-p1) x (p - p1)
    o = (x2 - x1)[None, :] * (py - y1[None, :]) - (px - x1[None, :]) * (y2 - y1)[None, :]
    up = (y1[None, :] <= py) & straddle
    down = straddle & ~up
    crossings = ((up & (o > 0)) | (down & (o < 0))).sum(axis=1)
    loc = np.where(crossings % 2 == 1, INTERIOR, EXTERIOR).astype(np.int8)
    # boundary suspects: any straddling edge whose cross product is within
    # the float-filter error bound of zero (same band orient2d escalates
    # to exact arithmetic for — |o| == 0.0 alone under-flags points a few
    # ulp off an edge whose double cross product rounds to the wrong
    # sign), or point in the bbox of a horizontal/degenerate edge
    # touching its y
    errb = 8.0 * np.finfo(np.float64).eps * (
        np.abs((x2 - x1)[None, :] * (py - y1[None, :]))
        + np.abs((px - x1[None, :]) * (y2 - y1)[None, :])
    )
    suspect = (straddle & (np.abs(o) <= errb)).any(axis=1)
    horiz = (y1 == y2)[None, :] & (py == y1[None, :])
    if horiz.any():
        inx = (px >= np.minimum(x1, x2)[None, :]) & (px <= np.maximum(x1, x2)[None, :])
        suspect |= (horiz & inx).any(axis=1)
    vtx = ((px == x1[None, :]) & (py == y1[None, :])) | (
        (px == x2[None, :]) & (py == y2[None, :])
    )
    suspect |= vtx.any(axis=1)
    for i in np.nonzero(suspect)[0]:
        loc[i] = locate_point_in_rings(float(pts[i, 0]), float(pts[i, 1]), rings)
    return loc


def _ring_segments(rings):
    xs1, ys1, xs2, ys2 = [], [], [], []
    for ring in rings:
        if len(ring) < 2:
            continue
        xs1.append(ring[:-1, 0])
        ys1.append(ring[:-1, 1])
        xs2.append(ring[1:, 0])
        ys2.append(ring[1:, 1])
    if not xs1:
        return None
    return (
        np.concatenate(xs1),
        np.concatenate(ys1),
        np.concatenate(xs2),
        np.concatenate(ys2),
    )


def locate_in_geom(px: float, py: float, g: Geom) -> int:
    """Locate a point in an arbitrary geometry (reference:
    Algorithm/PointLocator.cs:21, Mod2 boundary node rule)."""
    t = g.gtype
    if g.is_empty:
        return EXTERIOR
    if t == POINT:
        return INTERIOR if (g.data[0] == px and g.data[1] == py) else EXTERIOR
    if t == MULTIPOINT:
        for p in g.data:
            if p[0] == px and p[1] == py:
                return INTERIOR
        return EXTERIOR
    if t == LINESTRING:
        return _locate_on_lines(px, py, [g.data])
    if t == MULTILINESTRING:
        return _locate_on_lines(px, py, list(g.data))
    if t == POLYGON:
        return locate_point_in_rings(px, py, g.data, geom_ring_envs(g))
    if t == MULTIPOLYGON:
        # boundary wins; interior of any part wins over exterior
        best = EXTERIOR
        for (ce, renvs), rings in zip(geom_ring_envs(g), g.data):
            if py < ce[1] or py > ce[3] or px < ce[0] or px > ce[2]:
                continue
            loc = locate_point_in_rings(px, py, rings, renvs)
            if loc == BOUNDARY:
                return BOUNDARY
            if loc == INTERIOR:
                best = INTERIOR
        return best
    # collection: boundary if on boundary of any, else interior if in any
    best = EXTERIOR
    for c in g.geoms():
        loc = locate_in_geom(px, py, c)
        if loc == BOUNDARY:
            return BOUNDARY
        if loc == INTERIOR:
            best = INTERIOR
    return best


def _locate_on_lines(px, py, lines) -> int:
    """Mod-2 boundary node rule: endpoint with odd valence is boundary
    (reference: Algorithm/BoundaryNodeRule.cs:56)."""
    on_any = False
    endpoint_count = 0
    for ls in lines:
        n = len(ls)
        if n == 0:
            continue
        closed = n > 1 and ls[0, 0] == ls[-1, 0] and ls[0, 1] == ls[-1, 1]
        for i in range(n - 1):
            if on_segment(px, py, ls[i, 0], ls[i, 1], ls[i + 1, 0], ls[i + 1, 1]):
                on_any = True
        if not closed:
            if ls[0, 0] == px and ls[0, 1] == py:
                endpoint_count += 1
            if ls[-1, 0] == px and ls[-1, 1] == py:
                endpoint_count += 1
    if endpoint_count % 2 == 1:
        return BOUNDARY
    return INTERIOR if on_any else EXTERIOR


# ---------------------------------------------------------------------------
# centroid / interior point


def centroid(g: Geom) -> Geom:
    """Dimension-weighted centroid (reference: Algorithm/Centroid.cs:37).

    Mirrors the reference's simultaneous accumulation: signed triangle
    areas against a base point (numerical stability for far-from-origin
    coordinates), ring+line length sums (rings contribute to the lineal
    tier; zero-length lines degrade to their first point), point means.
    Highest tier with nonzero measure wins (Centroid.cs:122-148)."""
    st = _CentroidAcc()
    for comp in g.flatten():
        t = comp.gtype
        if t == POINT:
            st.add_point(comp.data[0], comp.data[1])
        elif t == LINESTRING:
            st.add_line(comp.data)
        elif t == POLYGON:
            st.add_polygon(comp.data)
    return st.result()


class _CentroidAcc:
    __slots__ = ("areasum2", "cg3x", "cg3y", "totlen", "lx", "ly", "np", "px", "py", "base")

    def __init__(self):
        self.areasum2 = 0.0
        self.cg3x = self.cg3y = 0.0
        self.totlen = 0.0
        self.lx = self.ly = 0.0
        self.np = 0
        self.px = self.py = 0.0
        self.base = None

    def add_point(self, x, y):
        self.np += 1
        self.px += x
        self.py += y

    def add_line(self, pts: np.ndarray):
        if len(pts) == 0:
            return
        d = np.diff(pts, axis=0)
        seglen = np.sqrt((d * d).sum(axis=1)) if len(pts) > 1 else np.zeros(0)
        linelen = float(seglen.sum())
        if linelen == 0.0:
            self.add_point(pts[0, 0], pts[0, 1])
            return
        mid = (pts[:-1] + pts[1:]) / 2.0
        self.lx += float((mid[:, 0] * seglen).sum())
        self.ly += float((mid[:, 1] * seglen).sum())
        self.totlen += linelen

    def _add_ring_area(self, pts: np.ndarray, positive: bool):
        bx, by = self.base
        sign = 1.0 if positive else -1.0
        x = pts[:-1, 0]
        y = pts[:-1, 1]
        xn = pts[1:, 0]
        yn = pts[1:, 1]
        area2 = (x - bx) * (yn - by) - (xn - bx) * (y - by)
        self.areasum2 += sign * float(area2.sum())
        self.cg3x += sign * float((area2 * (bx + x + xn)).sum())
        self.cg3y += sign * float((area2 * (by + y + yn)).sum())

    def add_polygon(self, rings):
        if not rings or len(rings[0]) == 0:
            return
        shell = rings[0]
        # base point resets per shell (reference: Centroid.cs:170-173)
        self.base = (float(shell[0, 0]), float(shell[0, 1]))
        if len(shell) >= 4:
            self._add_ring_area(shell, positive=not is_ccw_robust(shell))
        self.add_line(shell)
        for h in rings[1:]:
            if len(h) >= 4:
                self._add_ring_area(h, positive=is_ccw_robust(h))
            self.add_line(h)

    def result(self) -> Geom:
        if abs(self.areasum2) > 0.0:
            return Geom.point(self.cg3x / 3.0 / self.areasum2, self.cg3y / 3.0 / self.areasum2)
        if self.totlen > 0.0:
            return Geom.point(self.lx / self.totlen, self.ly / self.totlen)
        if self.np > 0:
            return Geom.point(self.px / self.np, self.py / self.np)
        return Geom.empty(POINT)


def _centroid_area(g: Geom):
    sx = sy = sa = 0.0
    for poly in g.flatten():
        if poly.gtype != POLYGON:
            continue
        for k, ring in enumerate(poly.data):
            sgn = 1.0 if k == 0 else -1.0
            rs = ring_signed_area(ring)
            a = abs(rs)
            if a == 0:
                continue
            x = ring[:-1, 0]
            y = ring[:-1, 1]
            xn = ring[1:, 0]
            yn = ring[1:, 1]
            cross = x * yn - xn * y
            cx = float(((x + xn) * cross).sum()) / (6.0 * rs)
            cy = float(((y + yn) * cross).sum()) / (6.0 * rs)
            sx += sgn * a * cx
            sy += sgn * a * cy
            sa += sgn * a
    if sa == 0.0:
        return 0.0, 0.0, 0.0
    return sx / sa, sy / sa, sa


def _centroid_lines(g: Geom):
    sx = sy = sl = 0.0
    for comp in g.flatten():
        if comp.gtype == POLYGON:
            arrs = comp.data
        elif comp.gtype == LINESTRING:
            arrs = [comp.data]
        else:
            continue
        for ls in arrs:
            if len(ls) < 2:
                continue
            d = np.diff(ls, axis=0)
            seglen = np.sqrt((d * d).sum(axis=1))
            mid = (ls[:-1] + ls[1:]) / 2.0
            sx += float((mid[:, 0] * seglen).sum())
            sy += float((mid[:, 1] * seglen).sum())
            sl += float(seglen.sum())
    if sl == 0.0:
        return 0.0, 0.0, 0.0
    return sx / sl, sy / sl, sl


def interior_point(g: Geom) -> Geom:
    """A point guaranteed in the interior (areas: widest horizontal slice
    at the centre-y scanline; lines/points: vertex nearest centroid) —
    semantics of Algorithm/InteriorPoint.cs:29."""
    if g.is_empty:
        return Geom.empty(POINT)
    dim = g.dimension
    if dim == 2:
        best = None
        for poly in g.flatten():
            if poly.gtype != POLYGON:
                continue
            cand = _interior_point_polygon(poly)
            if cand is not None:
                if best is None or cand[2] > best[2]:
                    best = cand
        if best is not None:
            return Geom.point(best[0], best[1])
    cen = centroid(g)
    cs = g.all_coords()
    if dim >= 1:
        # prefer non-endpoint vertices nearest the centroid
        d = ((cs - cen.data) ** 2).sum(axis=1)
        i = int(np.argmin(d))
        return Geom.point(float(cs[i, 0]), float(cs[i, 1]))
    d = ((cs - cen.data) ** 2).sum(axis=1)
    i = int(np.argmin(d))
    return Geom.point(float(cs[i, 0]), float(cs[i, 1]))


def _interior_point_polygon(poly: Geom):
    env = envelope(poly)
    if env is None:
        return None
    # scan-line Y: midpoint of the vertex-free band around the bisector
    # (reference: Algorithm/InteriorPointArea.cs ScanLineYOrdinateFinder —
    # hiY = lowest vertex y strictly above centre, loY = highest vertex y
    # at-or-below centre)
    centre = (env[1] + env[3]) / 2.0
    ys = poly.all_coords()[:, 1]
    above = ys[ys > centre]
    below = ys[ys <= centre]
    hi = float(above.min()) if len(above) else env[3]
    lo = float(below.max()) if len(below) else env[1]
    cy = (hi + lo) / 2.0
    xs = []
    for ring in poly.data:
        for i in range(len(ring) - 1):
            y1, y2 = ring[i, 1], ring[i + 1, 1]
            if (y1 <= cy) != (y2 <= cy):
                x1, x2 = ring[i, 0], ring[i + 1, 0]
                xs.append(x1 + (cy - y1) * (x2 - x1) / (y2 - y1))
    if len(xs) < 2:
        # degenerate polygon: fall back to first vertex
        c = poly.data[0][0]
        return float(c[0]), float(c[1]), 0.0
    xs = sorted(xs)
    best = None
    for i in range(0, len(xs) - 1, 2):
        w = xs[i + 1] - xs[i]
        if best is None or w > best[2]:
            best = ((xs[i] + xs[i + 1]) / 2.0, cy, w)
    return best


# ---------------------------------------------------------------------------
# convex hull


def convex_hull(g: Geom) -> Geom:
    """Andrew monotone chain (reference algorithm: Algorithm/ConvexHull.cs:20,
    Graham scan — same output set)."""
    cs = g.all_coords()
    if len(cs) == 0:
        return Geom.empty(GEOMETRYCOLLECTION)
    pts = np.unique(cs, axis=0)
    if len(pts) == 1:
        return Geom.point(float(pts[0, 0]), float(pts[0, 1]))
    # sort by (x, y)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]
    if len(pts) == 2:
        return Geom.linestring(pts)
    lower: list = []
    for p in pts:
        while len(lower) >= 2 and orient2d(
            lower[-2][0], lower[-2][1], lower[-1][0], lower[-1][1], p[0], p[1]
        ) <= 0:
            lower.pop()
        lower.append((float(p[0]), float(p[1])))
    upper: list = []
    for p in pts[::-1]:
        while len(upper) >= 2 and orient2d(
            upper[-2][0], upper[-2][1], upper[-1][0], upper[-1][1], p[0], p[1]
        ) <= 0:
            upper.pop()
        upper.append((float(p[0]), float(p[1])))
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:
        return Geom.linestring(np.array([hull[0], hull[-1]]))
    hull.append(hull[0])
    return Geom(POLYGON, [np.array(hull, dtype=np.float64)])


# ---------------------------------------------------------------------------
# distance


def point_segments_distance(px, py, x1, y1, x2, y2) -> np.ndarray:
    """Vectorized distance from one point to many segments."""
    dx = x2 - x1
    dy = y2 - y1
    ll = dx * dx + dy * dy
    t = np.where(ll > 0, ((px - x1) * dx + (py - y1) * dy) / np.where(ll > 0, ll, 1), 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx = x1 + t * dx
    cy = y1 + t * dy
    return np.hypot(px - cx, py - cy)


def points_to_segments_distance(pts: np.ndarray, segs) -> np.ndarray:
    """min distance from each point (P,2) to a segment set; (P,) array."""
    x1, y1, x2, y2 = segs
    px = pts[:, 0][:, None]
    py = pts[:, 1][:, None]
    dx = (x2 - x1)[None, :]
    dy = (y2 - y1)[None, :]
    ll = dx * dx + dy * dy
    ll_safe = np.where(ll > 0, ll, 1.0)
    t = ((px - x1[None, :]) * dx + (py - y1[None, :]) * dy) / ll_safe
    t = np.clip(t, 0.0, 1.0)
    cx = x1[None, :] + t * dx
    cy = y1[None, :] + t * dy
    d = np.hypot(px - cx, py - cy)
    return d.min(axis=1)


def distance(a: Geom, b: Geom) -> float:
    """Minimum euclidean distance (reference: Operation/Distance/DistanceOp.cs:24).
    Empty input → 0.0 (reference behavior, Geometry.cs Distance)."""
    if a.is_empty or b.is_empty:
        return 0.0
    # containment → 0 for areas
    if a.dimension == 2:
        pb = b.all_coords()
        if _any_point_in_area(pb, a):
            return 0.0
    if b.dimension == 2:
        pa = a.all_coords()
        if _any_point_in_area(pa, b):
            return 0.0
    sa = _geom_segments(a)
    sb = _geom_segments(b)
    pa = a.all_coords()
    pb = b.all_coords()
    best = np.inf
    if sb is not None and len(pa):
        best = min(best, float(points_to_segments_distance(pa, sb).min()))
    if sa is not None and len(pb):
        best = min(best, float(points_to_segments_distance(pb, sa).min()))
    if sa is None and sb is None:
        # point sets
        d = np.hypot(pa[:, 0][:, None] - pb[None, :, 0], pa[:, 1][:, None] - pb[None, :, 1])
        best = float(d.min())
    if sa is not None and sb is not None:
        if _segments_intersect(sa, sb):
            return 0.0
    return float(best)


def _geom_segments(g: Geom):
    arrs = []
    for comp in g.flatten():
        if comp.gtype == LINESTRING:
            arrs.append(comp.data)
        elif comp.gtype == POLYGON:
            arrs.extend(comp.data)
    if not arrs:
        return None
    return _ring_segments(arrs)


def _any_point_in_area(pts: np.ndarray, area_geom: Geom) -> bool:
    for comp in area_geom.flatten():
        if comp.gtype != POLYGON:
            continue
        loc = locate_points_in_rings(pts, comp.data)
        if (loc != EXTERIOR).any():
            return True
    return False


def _segments_intersection_point(sa, sb):
    """First intersection point between any segment of set A and any of
    set B, or None ('overlap' returns the overlap's low endpoint).
    Vectorized bbox filter, then a vectorized float straddle prefilter
    (candidates whose float cross-products show a strict same-side
    separation cannot intersect), then the exact classifier on the
    survivors — disjoint-but-interleaved sets stay out of the Python
    loop."""
    ax1, ay1, ax2, ay2 = sa
    bx1, by1, bx2, by2 = sb
    aminx = np.minimum(ax1, ax2)[:, None]
    amaxx = np.maximum(ax1, ax2)[:, None]
    aminy = np.minimum(ay1, ay2)[:, None]
    amaxy = np.maximum(ay1, ay2)[:, None]
    bminx = np.minimum(bx1, bx2)[None, :]
    bmaxx = np.maximum(bx1, bx2)[None, :]
    bminy = np.minimum(by1, by2)[None, :]
    bmaxy = np.maximum(by1, by2)[None, :]
    cand = (aminx <= bmaxx) & (amaxx >= bminx) & (aminy <= bmaxy) & (amaxy >= bminy)
    ii, jj = np.nonzero(cand)
    if not len(ii):
        return None
    # float straddle prefilter with a conservative error band: only pairs
    # that could straddle (or are within float noise of it) reach the
    # exact classifier.  The band must scale with the TERM magnitudes
    # (Shewchuk detsum-style, like orient2d's filter), not the result
    # magnitude: under cancellation |c| can be tiny while the rounding
    # error is eps * (|t1| + |t2|).  Each difference carries rel. err
    # <= eps/2, each product <= ~1.5 eps, the final subtraction eps/2;
    # 4*eps*(|t1|+|t2|) is a safely conservative absolute bound.
    _E4 = 4.0 * np.finfo(np.float64).eps
    adx = (ax2 - ax1)[ii]
    ady = (ay2 - ay1)[ii]
    d1y = by1[jj] - ay1[ii]
    d1x = bx1[jj] - ax1[ii]
    d2y = by2[jj] - ay1[ii]
    d2x = bx2[jj] - ax1[ii]
    t1a = adx * d1y
    t1b = ady * d1x
    t2a = adx * d2y
    t2b = ady * d2x
    c1 = t1a - t1b
    c2 = t2a - t2b
    e1 = _E4 * (np.abs(t1a) + np.abs(t1b))
    e2 = _E4 * (np.abs(t2a) + np.abs(t2b))
    bdx = (bx2 - bx1)[jj]
    bdy = (by2 - by1)[jj]
    d3y = ay1[ii] - by1[jj]
    d3x = ax1[ii] - bx1[jj]
    d4y = ay2[ii] - by1[jj]
    d4x = ax2[ii] - bx1[jj]
    t3a = bdx * d3y
    t3b = bdy * d3x
    t4a = bdx * d4y
    t4b = bdy * d4x
    c3 = t3a - t3b
    c4 = t4a - t4b
    e3 = _E4 * (np.abs(t3a) + np.abs(t3b))
    e4 = _E4 * (np.abs(t4a) + np.abs(t4b))
    keep = ~(((c1 > e1) & (c2 > e2)) | ((c1 < -e1) & (c2 < -e2))) & ~(
        ((c3 > e3) & (c4 > e4)) | ((c3 < -e3) & (c4 < -e4))
    )
    for i, j in zip(ii[keep], jj[keep]):
        kind, pts = segment_intersection(
            (ax1[i], ay1[i]), (ax2[i], ay2[i]), (bx1[j], by1[j]), (bx2[j], by2[j])
        )
        if kind != "none" and pts:
            return (float(pts[0][0]), float(pts[0][1]))
    return None


def _segments_intersect(sa, sb) -> bool:
    """Any segment of set A intersects any of set B."""
    return _segments_intersection_point(sa, sb) is not None


# ---------------------------------------------------------------------------
# simplify / densify


def simplify_dp(g: Geom, tol: float) -> Geom:
    """Douglas-Peucker (reference: Simplify/DouglasPeuckerSimplifier.cs:29)."""
    t = g.gtype
    if t == POINT or t == MULTIPOINT or g.is_empty:
        return g
    if t == LINESTRING:
        return Geom(LINESTRING, _dp(g.data, tol, False))
    if t == POLYGON:
        rings = [_dp(r, tol, True) for r in g.data]
        rings = [r for i, r in enumerate(rings) if len(r) >= 4 or i == 0]
        if len(rings[0]) < 4:
            return Geom.empty(POLYGON)
        shell = rings[0]
        kept = [shell]
        for h in rings[1:]:
            locs = [locate_point_in_rings(float(p[0]), float(p[1]), [shell]) for p in h[:-1]]
            if any(l == INTERIOR for l in locs):
                kept.append(h)  # holes pushed fully outside are dropped
        rings = kept
        out = Geom(POLYGON, rings)
        # DP can produce a bowtie; the reference repairs it by splitting
        # into valid polygons (DouglasPeuckerSimplifier topology fix)
        from .validity import _ring_self_intersection

        if any(_ring_self_intersection(r) for r in rings):
            from .construct import polygonize

            faces = polygonize(Geom(POLYGON, rings), node=True)
            polys = [c for c in faces.flatten() if c.gtype == POLYGON]
            if len(polys) == 1:
                return polys[0]
            if polys:
                return Geom(MULTIPOLYGON, [p.data for p in polys])
        from .validity import is_valid

        if len(rings) > 1 and not is_valid(out):
            # a simplified hole crossing the shell: the reference repairs
            # by winding (buffer-0 semantics) - shell minus hole areas,
            # poking hole parts clipped at the shell boundary
            from .overlay import overlay, union_all

            shell_g = Geom(POLYGON, [rings[0]])
            holes_u = union_all([Geom(POLYGON, [h]) for h in rings[1:]])
            return overlay(shell_g, holes_u, "difference")
        return out
    if t == MULTILINESTRING:
        return Geom(MULTILINESTRING, [_dp(ls, tol, False) for ls in g.data])
    if t == MULTIPOLYGON:
        parts = []
        for rings in g.data:
            p = simplify_dp(Geom(POLYGON, rings), tol)
            if not p.is_empty:
                parts.extend(c for c in p.flatten() if c.gtype == POLYGON)
        if not parts:
            return Geom.empty(POLYGON)
        if len(parts) == 1:
            # collapsed components drop; a single survivor is a POLYGON
            return parts[0]
        return Geom(MULTIPOLYGON, [p.data for p in parts])
    return Geom(GEOMETRYCOLLECTION, [simplify_dp(c, tol) for c in g.data])


def _dp(coords: np.ndarray, tol: float, is_ring: bool) -> np.ndarray:
    n = len(coords)
    if n <= 2:
        return coords
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        seg = coords[i0 + 1 : i1]
        d = point_segments_distance(
            seg[:, 0],
            seg[:, 1],
            np.full(len(seg), coords[i0, 0]),
            np.full(len(seg), coords[i0, 1]),
            np.full(len(seg), coords[i1, 0]),
            np.full(len(seg), coords[i1, 1]),
        )
        k = int(np.argmax(d))
        if d[k] > tol:
            mid = i0 + 1 + k
            keep[mid] = True
            stack.append((i0, mid))
            stack.append((mid, i1))
    out = coords[keep]
    if is_ring:
        # the ring's arbitrary start point is removable: applied ONCE, and
        # a ring collapsing below 4 points degenerates to nothing
        # (reference: DouglasPeuckerLineSimplifier.SimplifyRingEndpoint)
        if len(out) >= 4:
            d0 = point_segments_distance(
                np.array([out[0, 0]]),
                np.array([out[0, 1]]),
                np.array([out[1, 0]]),
                np.array([out[1, 1]]),
                np.array([out[-2, 0]]),
                np.array([out[-2, 1]]),
            )[0]
            if d0 <= tol:
                out = np.concatenate([out[1:-1], out[1:2]], axis=0)
        if len(out) < 4:
            return out[:0]  # collapsed ring -> dropped (empty result)
    return out


def densify(g: Geom, max_len: float) -> Geom:
    t = g.gtype
    if t in (POINT, MULTIPOINT) or g.is_empty:
        return g
    if t == LINESTRING:
        return Geom(LINESTRING, _densify_coords(g.data, max_len))
    if t == POLYGON:
        return Geom(POLYGON, [_densify_coords(r, max_len) for r in g.data])
    if t == MULTILINESTRING:
        return Geom(MULTILINESTRING, [_densify_coords(c, max_len) for c in g.data])
    if t == MULTIPOLYGON:
        return Geom(
            MULTIPOLYGON,
            [[_densify_coords(r, max_len) for r in rings] for rings in g.data],
        )
    return Geom(GEOMETRYCOLLECTION, [densify(c, max_len) for c in g.data])


def _densify_coords(coords: np.ndarray, max_len: float) -> np.ndarray:
    if len(coords) < 2:
        return coords
    out = [coords[0]]
    for i in range(len(coords) - 1):
        p0 = coords[i]
        p1 = coords[i + 1]
        d = float(np.hypot(*(p1 - p0)))
        if d > max_len:
            nseg = int(np.ceil(d / max_len))
            for k in range(1, nseg):
                out.append(p0 + (p1 - p0) * (k / nseg))
        out.append(p1)
    return np.array(out, dtype=np.float64)


# ---------------------------------------------------------------------------
# equality / normalization / hausdorff


def equals_exact(a: Geom, b: Geom, tol: float = 0.0) -> bool:
    """Structural equality (reference: Geometries/Geometry.cs:1669)."""
    if a.gtype != b.gtype:
        return False
    if a.gtype in (POINT,):
        if a.is_empty or b.is_empty:
            return a.is_empty and b.is_empty
        return _ceq(a.data.reshape(1, 2), b.data.reshape(1, 2), tol)
    if a.gtype == LINESTRING:
        return _ceq(a.data, b.data, tol)
    if a.gtype == POLYGON:
        if len(a.data) != len(b.data):
            return False
        return all(_ceq(ra, rb, tol) for ra, rb in zip(a.data, b.data))
    if a.gtype == MULTIPOINT:
        if len(a.data) != len(b.data):
            return False
        return all(
            _ceq(pa.reshape(1, 2), pb.reshape(1, 2), tol) for pa, pb in zip(a.data, b.data)
        )
    if a.gtype == MULTILINESTRING:
        if len(a.data) != len(b.data):
            return False
        return all(_ceq(la, lb, tol) for la, lb in zip(a.data, b.data))
    if a.gtype == MULTIPOLYGON:
        if len(a.data) != len(b.data):
            return False
        return all(
            equals_exact(Geom(POLYGON, ra), Geom(POLYGON, rb), tol)
            for ra, rb in zip(a.data, b.data)
        )
    if len(a.data) != len(b.data):
        return False
    return all(equals_exact(ca, cb, tol) for ca, cb in zip(a.data, b.data))


def _ceq(a: np.ndarray, b: np.ndarray, tol: float) -> bool:
    if len(a) != len(b):
        return False
    if len(a) == 0:
        return True
    if tol == 0.0:
        return bool((a == b).all())
    return bool((np.abs(a - b) <= tol).all())


def _cmp_coords(a: np.ndarray, b: np.ndarray) -> int:
    """Lexicographic compare of coordinate sequences (reference:
    Geometries/CoordinateArrays.cs Compare)."""
    n = min(len(a), len(b))
    for i in range(n):
        if a[i, 0] != b[i, 0]:
            return -1 if a[i, 0] < b[i, 0] else 1
        if a[i, 1] != b[i, 1]:
            return -1 if a[i, 1] < b[i, 1] else 1
    return (len(a) > len(b)) - (len(a) < len(b))


_TYPE_SORT = {
    POINT: 0,
    MULTIPOINT: 1,
    LINESTRING: 2,
    MULTILINESTRING: 4,
    POLYGON: 5,
    MULTIPOLYGON: 6,
    GEOMETRYCOLLECTION: 7,
}


def normalize(g: Geom) -> Geom:
    """Canonical form (reference: Geometries/Geometry.cs:1839 Normalize):
    rings start at min coordinate, shell CW / holes CCW, linestrings
    oriented forward-smaller, multi-components sorted."""
    t = g.gtype
    if t == POINT:
        return g
    if t == LINESTRING:
        return Geom(LINESTRING, _normalize_line(g.data))
    if t == POLYGON:
        return Geom(POLYGON, _normalize_poly_rings(g.data))
    if t == MULTIPOINT:
        pts = sorted(
            (p for p in g.data), key=lambda p: (p[0], p[1])
        )
        return Geom(MULTIPOINT, list(pts))
    if t == MULTILINESTRING:
        parts = [_normalize_line(ls) for ls in g.data]
        parts.sort(key=_seq_key)
        return Geom(MULTILINESTRING, parts)
    if t == MULTIPOLYGON:
        polys = [_normalize_poly_rings(r) for r in g.data]
        polys.sort(key=lambda rings: _seq_key(rings[0]) if rings else ())
        return Geom(MULTIPOLYGON, polys)
    comps = [normalize(c) for c in g.data]
    comps.sort(key=lambda c: (_TYPE_SORT[c.gtype], _geom_key(c)))
    return Geom(GEOMETRYCOLLECTION, comps)


def _seq_key(arr: np.ndarray):
    return tuple(map(tuple, arr))


def _geom_key(gm: Geom):
    cs = gm.all_coords()
    return tuple(map(tuple, cs))


def _normalize_line(ls: np.ndarray) -> np.ndarray:
    if len(ls) == 0:
        return ls
    closed = len(ls) > 1 and (ls[0] == ls[-1]).all()
    if closed:
        ring = _ring_start_min(ls)
        # orient closed line CCW? JTS normalizes closed linestrings like rings:
        # smallest starting point, direction chosen by next-point comparison
        if len(ring) > 2:
            nxt = ring[1]
            prv = ring[-2]
            if (prv[0], prv[1]) < (nxt[0], nxt[1]):
                ring = ring[::-1].copy()
        return ring
    rev = ls[::-1]
    return ls if _cmp_coords(ls, rev) <= 0 else rev.copy()


def _ring_start_min(ring: np.ndarray) -> np.ndarray:
    body = ring[:-1]
    idx = np.lexsort((body[:, 1], body[:, 0]))
    i = int(idx[0])
    out = np.concatenate([body[i:], body[:i], body[i : i + 1]], axis=0)
    return out


def _orient_ring(ring: np.ndarray, ccw: bool) -> np.ndarray:
    if is_ccw(ring) != ccw:
        return ring[::-1].copy()
    return ring


def _normalize_poly_rings(rings) -> list:
    if not rings:
        return []
    out = [_ring_start_min(_orient_ring(rings[0], ccw=False))]
    holes = [_ring_start_min(_orient_ring(h, ccw=True)) for h in rings[1:]]
    holes.sort(key=_seq_key)
    out.extend(holes)
    return out


def hausdorff(a: Geom, b: Geom, densify_frac: float | None = None) -> float:
    """Discrete (vertex) Hausdorff distance (reference:
    Algorithm/Distance/DiscreteHausdorffDistance.cs:53)."""
    ga, gb = a, b
    if densify_frac:
        env_a = envelope(a)
        env_b = envelope(b)
        if env_a and env_b:
            diag = np.hypot(
                max(env_a[2], env_b[2]) - min(env_a[0], env_b[0]),
                max(env_a[3], env_b[3]) - min(env_a[1], env_b[1]),
            )
            step = max(diag * densify_frac, 1e-12)
            ga = densify(a, step)
            gb = densify(b, step)
    pa = ga.all_coords()
    pb = gb.all_coords()
    if len(pa) == 0 or len(pb) == 0:
        return float("nan")
    sa = _geom_segments(ga)
    sb = _geom_segments(gb)
    if sb is not None:
        d_ab = float(points_to_segments_distance(pa, sb).max())
    else:
        d_ab = float(
            np.hypot(pa[:, 0][:, None] - pb[None, :, 0], pa[:, 1][:, None] - pb[None, :, 1])
            .min(axis=1)
            .max()
        )
    if sa is not None:
        d_ba = float(points_to_segments_distance(pb, sa).max())
    else:
        d_ba = float(
            np.hypot(pb[:, 0][:, None] - pa[None, :, 0], pb[:, 1][:, None] - pa[None, :, 1])
            .min(axis=1)
            .max()
        )
    return max(d_ab, d_ba)


def boundary(g: Geom) -> Geom:
    """Topological boundary (reference: Geometry.cs Boundary; Mod2 rule):
    puntal -> empty GC; lineal -> MultiPoint of odd-valence endpoints;
    polygonal -> linework of the rings."""
    t = g.gtype
    if t in (POINT, MULTIPOINT):
        return Geom.empty(GEOMETRYCOLLECTION)
    if t in (LINESTRING, MULTILINESTRING):
        valence: dict = {}
        for comp in g.flatten():
            ls = comp.data
            if len(ls) < 2 or (ls[0] == ls[-1]).all():
                continue
            for p in (ls[0], ls[-1]):
                k = (float(p[0]), float(p[1]))
                valence[k] = valence.get(k, 0) + 1
        pts = sorted(k for k, v in valence.items() if v % 2 == 1)
        if not pts:
            return Geom.empty(MULTIPOINT)
        return Geom(MULTIPOINT, [np.array(p, dtype=np.float64) for p in pts])
    if t == POLYGON:
        rings = [r.copy() for r in g.data]
        if not rings:
            return Geom.empty(LINESTRING)
        if len(rings) == 1:
            return Geom(LINESTRING, rings[0])
        return Geom(MULTILINESTRING, rings)
    if t == MULTIPOLYGON:
        rings = [r.copy() for poly in g.data for r in poly]
        if not rings:
            return Geom.empty(MULTILINESTRING)
        return Geom(MULTILINESTRING, rings)
    # collection: boundary of components, merged
    parts = [boundary(c) for c in g.data]
    return Geom(GEOMETRYCOLLECTION, parts)


def simplify_tp(g: Geom, tol: float) -> Geom:
    """Topology-preserving simplification - a faithful re-creation of the
    reference pipeline (Simplify/TopologyPreservingSimplifier.cs,
    TaggedLineStringSimplifier.cs, ComponentJumpChecker.cs):

    - every linear component (line / ring) becomes a tagged line with
      min_size (4 for closed, else 2), simplified in ascending
      envelope-area order against SHARED input/output segment indexes
    - a section flattens only if (a) the depth-based worst-case keeps the
      result above min_size, (b) max deviation <= tol, (c) the chord has
      no interior intersection with any output segment or any live input
      segment outside the section, and (d) it does not jump any other
      component (ray-crossing parity at the component's second vertex)
    - rings get a final endpoint-removal pass under the same checks
    """
    t = g.gtype
    comps = []  # dicts: coords, closed, min_size
    layout = []

    def collect(gg):
        if gg.gtype == LINESTRING:
            comps.append({"pts": [(float(p[0]), float(p[1])) for p in gg.data]})
            layout.append(("line", len(comps) - 1, gg.tag))
        elif gg.gtype == POLYGON:
            idxs = []
            for r in gg.data:
                comps.append({"pts": [(float(p[0]), float(p[1])) for p in r]})
                idxs.append(len(comps) - 1)
            layout.append(("poly", idxs, None))
        elif gg.gtype in (POINT, MULTIPOINT):
            layout.append(("point", gg, None))
        else:
            for c in gg.geoms():
                collect(c)

    collect(g)
    for c in comps:
        pts = c["pts"]
        c["closed"] = len(pts) >= 2 and pts[0] == pts[-1]
        c["min_size"] = 4 if c["closed"] else 2
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        c["env_area"] = (max(xs) - min(xs)) * (max(ys) - min(ys)) if pts else 0.0

    # shared input index: one entry per original segment, with a live flag
    inp = []  # [ci, si, p0, p1, alive]
    for ci, c in enumerate(comps):
        for si in range(len(c["pts"]) - 1):
            inp.append([ci, si, c["pts"][si], c["pts"][si + 1], True])
    out_segs = []  # flattened chords, shared across components

    def _interior_hit(a0, a1, b0, b1):
        """HasInvalidIntersection: equal segments, or an intersection point
        interior to either segment."""
        if (a0, a1) in ((b0, b1), (b1, b0)):
            return True
        kind, pts = segment_intersection(a0, a1, b0, b1)
        if kind == "none":
            return False
        if kind == "overlap":
            return True
        q = (float(pts[0][0]), float(pts[0][1]))
        return (q != a0 and q != a1) or (q != b0 and q != b1)

    def _ray_count(pt, segs):
        n = 0
        for p0, p1 in segs:
            if (p0[1] > pt[1]) != (p1[1] > pt[1]):
                xi = p0[0] + (pt[1] - p0[1]) * (p1[0] - p0[0]) / (p1[1] - p0[1])
                if pt[0] < xi:
                    n += 1
        return n

    def _jump(ci, section_segs, env, flat):
        for cj, c2 in enumerate(comps):
            if cj == ci or len(c2["pts"]) < 2:
                continue
            cp = c2["pts"][1]
            if not (env[0] <= cp[0] <= env[2] and env[1] <= cp[1] <= env[3]):
                continue
            if _ray_count(cp, section_segs) % 2 != _ray_count(cp, [flat]) % 2:
                return True
        return False

    def _topo_ok(ci, i, j, flat):
        for os_ in out_segs:
            if _interior_hit(os_[0], os_[1], flat[0], flat[1]):
                return False
        for e in inp:
            if not e[4]:
                continue
            if e[0] == ci and i <= e[1] < j:
                continue
            if _interior_hit(e[2], e[3], flat[0], flat[1]):
                return False
        pts = comps[ci]["pts"]
        sect = [(pts[k], pts[k + 1]) for k in range(i, j)]
        xs = [p[0] for s in sect for p in s]
        ys = [p[1] for s in sect for p in s]
        return not _jump(ci, sect, (min(xs), min(ys), max(xs), max(ys)), flat)

    def _seg_dist(p, a, b):
        dx, dy = b[0] - a[0], b[1] - a[1]
        ll = dx * dx + dy * dy
        if ll == 0:
            return math.hypot(p[0] - a[0], p[1] - a[1])
        tt = ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / ll
        tt = 0.0 if tt < 0 else (1.0 if tt > 1 else tt)
        return math.hypot(p[0] - (a[0] + tt * dx), p[1] - (a[1] + tt * dy))

    order = sorted(range(len(comps)), key=lambda i: comps[i]["env_area"])
    for ci in order:
        c = comps[ci]
        pts = c["pts"]
        if len(pts) < 2:
            c["res"] = []
            continue
        res = []  # [p0, p1, orig_seg_index | None]
        min_size = c["min_size"]

        def sect(i, j, depth):
            depth += 1
            if i + 1 == j:
                res.append([pts[i], pts[j], i])
                return
            valid = True
            result_size = 0 if not res else len(res) + 1
            if result_size < min_size and depth + 1 < min_size:
                valid = False
            max_d = -1.0
            kf = i
            for k in range(i + 1, j):
                d = _seg_dist(pts[k], pts[i], pts[j])
                if d > max_d:
                    max_d = d
                    kf = k
            if max_d > tol:
                valid = False
            if valid and not _topo_ok(ci, i, j, (pts[i], pts[j])):
                valid = False
            if valid:
                for e in inp:
                    if e[0] == ci and i <= e[1] < j:
                        e[4] = False
                out_segs.append((pts[i], pts[j]))
                res.append([pts[i], pts[j], None])
                return
            sect(i, kf, depth)
            sect(kf, j, depth)

        sect(0, len(pts) - 1, 0)

        # ring endpoint pass
        if c["closed"] and (len(res) + 1) > min_size:
            first, last = res[0], res[-1]
            simp = (last[0], first[1])
            end_pt = first[0]
            if _seg_dist(end_pt, simp[0], simp[1]) <= tol:
                ok = orient2d(simp[0][0], simp[0][1], simp[1][0], simp[1][1], end_pt[0], end_pt[1]) == 0
                if not ok:
                    ok = True
                    for os_ in out_segs:
                        if _interior_hit(os_[0], os_[1], simp[0], simp[1]):
                            ok = False
                            break
                    if ok:
                        for e in inp:
                            if e[4] and _interior_hit(e[2], e[3], simp[0], simp[1]):
                                ok = False
                                break
                    if ok:
                        segs2 = [(first[0], first[1]), (last[0], last[1])]
                        xs = [p[0] for s in segs2 for p in s]
                        ys = [p[1] for s in segs2 for p in s]
                        if _jump(ci, segs2, (min(xs), min(ys), max(xs), max(ys)), simp):
                            ok = False
                if ok:
                    for seg in (first, last):
                        if seg[2] is not None:
                            for e in inp:
                                if e[0] == ci and e[1] == seg[2]:
                                    e[4] = False
                        else:
                            key = (seg[0], seg[1])
                            if key in out_segs:
                                out_segs.remove(key)
                    first[0] = last[0]
                    first[2] = None
                    res.pop()
                    out_segs.append((first[0], first[1]))
        c["res"] = res

    def coords_of(ci):
        res = comps[ci]["res"]
        if not res:
            return np.asarray(comps[ci]["pts"], dtype=np.float64)
        return np.array([res[0][0]] + [s[1] for s in res], dtype=np.float64)

    parts = []
    for kind, ref, tag in layout:
        if kind == "line":
            parts.append(Geom(LINESTRING, coords_of(ref), tag=tag))
        elif kind == "poly":
            rings = [coords_of(i) for i in ref]
            rings = [r for k, r in enumerate(rings) if len(r) >= 4 or k == 0]
            if rings and len(rings[0]) >= 4:
                parts.append(Geom(POLYGON, rings))
            else:
                parts.append(Geom.empty(POLYGON))
        else:
            parts.append(ref)
    if t == POLYGON:
        return parts[0] if parts else Geom.empty(POLYGON)
    if t == LINESTRING:
        return parts[0]
    if t == MULTIPOLYGON:
        return Geom(MULTIPOLYGON, [p.data for p in parts if p.gtype == POLYGON and not p.is_empty])
    if t == MULTILINESTRING:
        return Geom(MULTILINESTRING, [p.data for p in parts if p.gtype == LINESTRING])
    if t in (POINT, MULTIPOINT):
        return g
    return Geom(GEOMETRYCOLLECTION, parts)


def nearest_points(a: Geom, b: Geom):
    """The closest pair of points, one on each geometry (reference:
    Operation/Distance/DistanceOp.cs NearestPoints).  Returns
    ((xa, ya), (xb, yb)); None for empty input."""
    if a.is_empty or b.is_empty:
        return None
    # overlapping areas: a boundary vertex of the contained side works
    if a.dimension == 2:
        for p in b.all_coords():
            if locate_in_geom(float(p[0]), float(p[1]), a) != EXTERIOR:
                q = (float(p[0]), float(p[1]))
                return q, q
    if b.dimension == 2:
        for p in a.all_coords():
            if locate_in_geom(float(p[0]), float(p[1]), b) != EXTERIOR:
                q = (float(p[0]), float(p[1]))
                return q, q
    pa = a.all_coords()
    pb = b.all_coords()
    sa = _geom_segments(a)
    sb = _geom_segments(b)
    # crossing boundaries without any vertex inside the other operand:
    # distance() returns 0 via the segment-intersection test, so the
    # nearest pair must be the crossing point itself (reference DistanceOp
    # computes it from the noded edge intersection) — the vertex-to-segment
    # scan below would report a positive gap (found by fuzz_metric)
    if sa is not None and sb is not None:
        q = _segments_intersection_point(sa, sb)
        if q is not None:
            return q, q

    def _nearest_pt_to_segs(pts, segs):
        """(best_dist, point, foot) over all (point, segment) pairs —
        vectorized on the columnar segment arrays."""
        x1, y1, x2, y2 = segs
        px = pts[:, 0][:, None]
        py = pts[:, 1][:, None]
        dx = (x2 - x1)[None, :]
        dy = (y2 - y1)[None, :]
        ll = dx * dx + dy * dy
        ll_safe = np.where(ll > 0, ll, 1.0)
        t = ((px - x1[None, :]) * dx + (py - y1[None, :]) * dy) / ll_safe
        t = np.clip(np.where(ll > 0, t, 0.0), 0.0, 1.0)
        cx = x1[None, :] + t * dx
        cy = y1[None, :] + t * dy
        d = np.hypot(px - cx, py - cy)
        i, j = np.unravel_index(np.argmin(d), d.shape)
        return (
            float(d[i, j]),
            (float(pts[i, 0]), float(pts[i, 1])),
            (float(cx[i, j]), float(cy[i, j])),
        )

    best = (np.inf, None, None)
    if sb is not None and len(pa):
        d, p, q = _nearest_pt_to_segs(pa, sb)
        if d < best[0]:
            best = (d, p, q)
    if sa is not None and len(pb):
        d, p, q = _nearest_pt_to_segs(pb, sa)
        if d < best[0]:
            best = (d, q, p)
    if sa is None and sb is None:
        dd = np.hypot(
            pa[:, 0][:, None] - pb[None, :, 0], pa[:, 1][:, None] - pb[None, :, 1]
        )
        i, j = np.unravel_index(np.argmin(dd), dd.shape)
        best = (
            float(dd[i, j]),
            (float(pa[i, 0]), float(pa[i, 1])),
            (float(pb[j, 0]), float(pb[j, 1])),
        )
    return best[1], best[2]
