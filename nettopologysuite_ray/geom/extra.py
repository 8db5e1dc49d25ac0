"""Additional SURVEY §2 operators: discrete Fréchet distance, similarity
measures, minimum bounding circle / diameter / area-rectangle, coverage
union, linear referencing, geometry fixer.

References: Algorithm/Distance/DiscreteFrechetDistance.cs:40,
Algorithm/Match/{Hausdorff,Area,Frechet}SimilarityMeasure.cs,
Algorithm/MinimumBoundingCircle.cs:44, MinimumDiameter.cs:38,
MinimumAreaRectangle.cs:24, Coverage/CoverageUnion.cs:11,
LinearReferencing/LengthIndexedLine.cs:15, Geometries/Utilities/
GeometryFixer.cs:46 — all re-implemented fresh on numpy.
"""

from __future__ import annotations

import math

import numpy as np

from . import algorithms as alg
from .types import GEOMETRYCOLLECTION, LINESTRING, MULTIPOLYGON, POINT, POLYGON, Geom


# ---------------------------------------------------------------------------
# discrete Fréchet distance (dynamic programming over vertex sequences)


def frechet(a: Geom, b: Geom) -> float:
    pa_ = a.all_coords()
    pb = b.all_coords()
    if len(pa_) == 0 or len(pb) == 0:
        return float("nan")
    d = np.hypot(pa_[:, 0][:, None] - pb[None, :, 0], pa_[:, 1][:, None] - pb[None, :, 1])
    n, m = d.shape
    ca = np.full((n, m), -1.0)
    ca[0, 0] = d[0, 0]
    for i in range(1, n):
        ca[i, 0] = max(ca[i - 1, 0], d[i, 0])
    for j in range(1, m):
        ca[0, j] = max(ca[0, j - 1], d[0, j])
    for i in range(1, n):
        prev = ca[i - 1]
        cur = ca[i]
        for j in range(1, m):
            cur[j] = max(min(prev[j], prev[j - 1], cur[j - 1]), d[i, j])
    return float(ca[n - 1, m - 1])


# ---------------------------------------------------------------------------
# similarity measures (Algorithm/Match)


def _env_diagonal(a: Geom, b: Geom) -> float:
    ea = alg.envelope(a)
    eb = alg.envelope(b)
    if ea is None or eb is None:
        return 0.0
    return math.hypot(
        max(ea[2], eb[2]) - min(ea[0], eb[0]), max(ea[3], eb[3]) - min(ea[1], eb[1])
    )


def hausdorff_similarity(a: Geom, b: Geom) -> float:
    diag = _env_diagonal(a, b)
    if diag == 0.0:
        return 1.0
    h = alg.hausdorff(a, b, densify_frac=0.25)
    return max(0.0, 1.0 - h / diag)


def frechet_similarity(a: Geom, b: Geom) -> float:
    diag = _env_diagonal(a, b)
    if diag == 0.0:
        return 1.0
    return max(0.0, 1.0 - frechet(a, b) / diag)


def area_similarity(a: Geom, b: Geom) -> float:
    """|A ∩ B| / |A ∪ B| (AreaSimilarityMeasure.cs)."""
    from .overlay import overlay

    inter = alg.area(overlay(a, b, "intersection"))
    union = alg.area(overlay(a, b, "union"))
    return inter / union if union > 0 else 0.0


# ---------------------------------------------------------------------------
# minimum bounding circle (deterministic Welzl), diameter, area rectangle


def minimum_bounding_circle(g: Geom) -> tuple[tuple[float, float], float]:
    """((cx, cy), radius); deterministic (fixed processing order)."""
    pts = np.unique(g.all_coords(), axis=0)
    if len(pts) == 0:
        return (0.0, 0.0), float("nan")
    # work on hull points only (small), simple O(h^3) exact search
    hull = alg.convex_hull(g)
    hp = np.unique(hull.all_coords(), axis=0)
    n = len(hp)
    if n == 1:
        return (float(hp[0, 0]), float(hp[0, 1])), 0.0
    best = None
    # 2-point circles
    for i in range(n):
        for j in range(i + 1, n):
            c = ((hp[i, 0] + hp[j, 0]) / 2, (hp[i, 1] + hp[j, 1]) / 2)
            r = math.hypot(hp[i, 0] - c[0], hp[i, 1] - c[1])
            if _covers_all(hp, c, r) and (best is None or r < best[1]):
                best = (c, r)
    if best is not None:
        return best
    # 3-point circumcircles
    for i in range(n):
        for j in range(i + 1, n):
            for k in range(j + 1, n):
                c = _circumcenter(hp[i], hp[j], hp[k])
                if c is None:
                    continue
                r = math.hypot(hp[i, 0] - c[0], hp[i, 1] - c[1])
                if _covers_all(hp, c, r) and (best is None or r < best[1]):
                    best = (c, r)
    return best if best else ((float(hp[0, 0]), float(hp[0, 1])), 0.0)


def _covers_all(pts, c, r) -> bool:
    d = np.hypot(pts[:, 0] - c[0], pts[:, 1] - c[1])
    # ulp slack scaled to the coordinate frame: at |coord|~1e7 the distance
    # itself is good, but candidate radii differ by frame-level rounding
    slack = 1e-9 * max(1.0, r) + 4.0 * float(np.spacing(np.abs(pts).max(initial=1.0)))
    return bool((d <= r + slack).all())


def _circumcenter(p, q, r):
    # Triangle.circumcentre already forms the quadratic terms in a local
    # frame (anchored at its third point) — the raw global-frame formula
    # squared absolute ordinates (~1e14 at a 1e7 frame) and cancelled
    # catastrophically; fuzz measured centers ~18 units off.  Keep only
    # the collinear guard here (mathutil's version divides by zero there).
    from .mathutil import Triangle

    ax, ay = float(p[0]) - float(r[0]), float(p[1]) - float(r[1])
    bx, by = float(q[0]) - float(r[0]), float(q[1]) - float(r[1])
    # relative (not exact-zero) collinearity guard: near-degenerate triples
    # would divide by a tiny denominator and put the center far off
    t1, t2 = ax * by, ay * bx
    if abs(t1 - t2) <= 8.0 * np.finfo(np.float64).eps * (abs(t1) + abs(t2)):
        return None
    cx, cy = Triangle.circumcentre(p, q, r)
    return (float(cx), float(cy))


def minimum_diameter(g: Geom) -> tuple[float, Geom]:
    """(width, the supporting 2-point LineString) — rotating calipers over
    the convex hull (MinimumDiameter.cs:38)."""
    hull = alg.convex_hull(g)
    hp = hull.all_coords()
    if len(hp) <= 2:
        return 0.0, Geom.linestring(hp if len(hp) == 2 else np.zeros((0, 2)))
    ring = hp if (hp[0] == hp[-1]).all() else np.concatenate([hp, hp[:1]])
    best = None
    for i in range(len(ring) - 1):
        a, b = ring[i], ring[i + 1]
        ex, ey = float(b[0] - a[0]), float(b[1] - a[1])
        el = math.hypot(ex, ey)
        if el == 0.0:
            continue
        # perpendicular distance to the edge's infinite LINE (reference
        # MinimumDiameter.cs ComputeSegmentForLine ->
        # DistanceComputer.PointToLinePerpendicular), NOT the clamped
        # segment distance: on a caliper edge the farthest vertex's foot
        # can fall outside the segment, and clamping inflated the width
        # (fuzz: sub-ulp-collinear multipoint whose sliver hull returned
        # an edge LENGTH as the diameter instead of ~0)
        d = (
            np.abs(
                ex * (ring[:-1, 1] - float(a[1]))
                - ey * (ring[:-1, 0] - float(a[0]))
            )
            / el
        )
        k = int(np.argmax(d))
        if best is None or d[k] < best[0]:
            best = (float(d[k]), np.array([a, b]), ring[k])
    if best is None:
        return 0.0, Geom.linestring(np.zeros((0, 2)))
    w, seg, far = best
    # supporting segment: perpendicular from far point to the edge
    ax, ay = seg[0]
    bx, by = seg[1]
    dx, dy = bx - ax, by - ay
    ll = dx * dx + dy * dy
    t = ((far[0] - ax) * dx + (far[1] - ay) * dy) / ll if ll else 0.0
    foot = (ax + t * dx, ay + t * dy)
    return w, Geom.linestring(np.array([foot, far]))


def minimum_area_rectangle(g: Geom) -> Geom:
    """Smallest-area enclosing rectangle (MinimumAreaRectangle.cs:24) —
    one side is collinear with a hull edge."""
    hull = alg.convex_hull(g)
    hp = hull.all_coords()
    if len(hp) < 3:
        return hull
    ring = hp if (hp[0] == hp[-1]).all() else np.concatenate([hp, hp[:1]])
    body = ring[:-1]
    best = None
    for i in range(len(ring) - 1):
        a, b = ring[i], ring[i + 1]
        d = b - a
        ll = math.hypot(d[0], d[1])
        if ll == 0:
            continue
        u = d / ll
        v = np.array([-u[1], u[0]])
        pu = (body - a) @ u
        pv = (body - a) @ v
        area = (pu.max() - pu.min()) * (pv.max() - pv.min())
        if best is None or area < best[0]:
            best = (float(area), a, u, v, pu.min(), pu.max(), pv.min(), pv.max())
    _ar, a, u, v, u0, u1, v0, v1 = best
    corners = [a + u * u0 + v * v0, a + u * u1 + v * v0, a + u * u1 + v * v1, a + u * u0 + v * v1]
    corners.append(corners[0])
    return Geom(POLYGON, [np.array(corners)])


# ---------------------------------------------------------------------------
# coverage union (noding-free fast path)


def coverage_union(polys) -> Geom:
    """Union of a VALID non-overlapping polygonal coverage by shared-edge
    cancellation (Coverage/CoverageUnion.cs:11): segments appearing twice
    are interior — the survivors polygonize into the dissolved boundary.
    O(E) with no noding; the 100 TB tile-dissolve fast path."""
    from .construct import polygonize

    counts: dict = {}
    for p in polys:
        comp = p if isinstance(p, Geom) else Geom(POLYGON, p)
        for ring in comp.coords_list():
            for i in range(len(ring) - 1):
                a = (float(ring[i, 0]), float(ring[i, 1]))
                b = (float(ring[i + 1, 0]), float(ring[i + 1, 1]))
                if a == b:
                    continue
                key = (min(a, b), max(a, b))
                counts[key] = counts.get(key, 0) + 1
    border = [k for k, v in counts.items() if v == 1]
    if not border:
        return Geom.empty(POLYGON)
    lines = Geom("MultiLineString", [np.array([a, b]) for a, b in border])
    faces = polygonize(lines)
    out = [c for c in faces.flatten() if c.gtype == POLYGON]
    # polygonize emits both outer faces and hole faces; keep faces whose
    # interior point is covered by an input polygon
    kept = []
    for f in out:
        ip = alg.interior_point(f)
        x, y = float(ip.data[0]), float(ip.data[1])
        for p in polys:
            comp = p if isinstance(p, Geom) else Geom(POLYGON, p)
            if alg.locate_in_geom(x, y, comp) != alg.EXTERIOR:
                kept.append(f)
                break
    if not kept:
        return Geom.empty(POLYGON)
    if len(kept) == 1:
        return kept[0]
    from .overlay import union_all

    return union_all(kept)


# ---------------------------------------------------------------------------
# linear referencing (LengthIndexedLine)


class LengthIndexedLine:
    """Index positions along a line by length
    (LinearReferencing/LengthIndexedLine.cs:15)."""

    def __init__(self, line: Geom):
        self.coords = line.all_coords()
        d = np.diff(self.coords, axis=0)
        seg = np.sqrt((d * d).sum(axis=1))
        self.cum = np.concatenate([[0.0], np.cumsum(seg)])

    @property
    def end_index(self) -> float:
        return float(self.cum[-1])

    def extract_point(self, index: float) -> Geom:
        index = min(max(index, 0.0), self.end_index)
        i = int(np.searchsorted(self.cum, index, side="right") - 1)
        i = min(i, len(self.coords) - 2)
        seg_len = self.cum[i + 1] - self.cum[i]
        t = (index - self.cum[i]) / seg_len if seg_len > 0 else 0.0
        p = self.coords[i] + t * (self.coords[i + 1] - self.coords[i])
        return Geom.point(float(p[0]), float(p[1]))

    def extract_line(self, start: float, end: float) -> Geom:
        start = min(max(start, 0.0), self.end_index)
        end = min(max(end, 0.0), self.end_index)
        if end < start:
            start, end = end, start
        pts = [self.extract_point(start).data]
        mask = (self.cum > start) & (self.cum < end)
        for i in np.nonzero(mask)[0]:
            pts.append(self.coords[i])
        pts.append(self.extract_point(end).data)
        arr = np.array(pts)
        keep = np.ones(len(arr), dtype=bool)
        keep[1:] = (arr[1:] != arr[:-1]).any(axis=1)
        arr = arr[keep]
        if len(arr) < 2:
            arr = np.array([arr[0], arr[0]]) if len(arr) else np.zeros((0, 2))
        return Geom.linestring(arr)

    def project(self, x: float, y: float) -> float:
        """Length index of the closest point on the line."""
        best = (float("inf"), 0.0)
        for i in range(len(self.coords) - 1):
            a = self.coords[i]
            b = self.coords[i + 1]
            dx, dy = b[0] - a[0], b[1] - a[1]
            ll = dx * dx + dy * dy
            t = ((x - a[0]) * dx + (y - a[1]) * dy) / ll if ll else 0.0
            t = min(max(t, 0.0), 1.0)
            cx, cy = a[0] + t * dx, a[1] + t * dy
            dist = math.hypot(x - cx, y - cy)
            if dist < best[0]:
                best = (dist, float(self.cum[i] + t * math.sqrt(ll)))
        return best[1]


# ---------------------------------------------------------------------------
# geometry fixer (make-valid)
# (reference: Geometries/Utilities/GeometryFixer.cs:46 — semantic rules
#  re-implemented on this engine's numpy ring model; per-ring repair keeps
#  nonzero-winding faces, the exact semantics of the reference's
#  BufferOp.BufferByZero(poly, bothOrientations) at GeometryFixer.cs:413.)


def _clean_coords(arr, ords=None):
    """CoordinateArrays.RemoveRepeatedOrInvalidPoints: drop rows with a
    non-finite X or Y, then collapse consecutive duplicate points.  The
    optional out-of-band ordinate rows (Z/M) follow their XY rows."""
    a = np.asarray(arr, dtype=np.float64).reshape(-1, 2)
    e = None if ords is None else np.asarray(ords, dtype=np.float64).reshape(len(a), -1)
    ok = np.isfinite(a).all(axis=1)
    a = a[ok]
    if e is not None:
        e = e[ok]
    if len(a) > 1:
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]).any(axis=1)
        a = a[keep]
        if e is not None:
            e = e[keep]
    return a, e


def _ring_ords(g: Geom, idx) -> np.ndarray | None:
    """Ordinate rows for one nesting position of g.extra, or None."""
    if g.extra is None:
        return None
    o = g.extra["ords"]
    for i in idx:
        o = o[i]
    return o


class _Fixer:
    """GeometryFixer.cs:46 ported rule-for-rule; collapsed and MULTI
    handling controlled by keep_collapsed / keep_multi exactly as the
    reference's KeepCollapsed / KeepMulti properties."""

    def __init__(self, keep_collapsed: bool = False, keep_multi: bool = True):
        self.keep_collapsed = keep_collapsed
        self.keep_multi = keep_multi

    # -- dispatch (GeometryFixer.GetResult) --------------------------------
    def fix(self, g: Geom) -> Geom:
        if g.is_empty:
            return g
        self._dims = g.extra["dims"] if g.extra else None
        t = g.gtype
        if t == POINT:
            return self._fix_point(g)
        if t == LINESTRING:
            if g.tag == "LinearRing":
                return self._fix_linear_ring(g)
            return self._fix_linestring(g)
        if t == POLYGON:
            return self._fill(self._fix_polygon(g), g)
        if t == "MultiPoint":
            return self._fix_multipoint(g)
        if t == "MultiLineString":
            return self._fix_multilinestring(g)
        if t == MULTIPOLYGON:
            return self._fill(self._fix_multipolygon(g), g)
        if t == GEOMETRYCOLLECTION:
            return Geom(GEOMETRYCOLLECTION, [self.fix(sub) for sub in g.data])
        return g

    # -- points -------------------------------------------------------------
    def _point_element(self, p, ords):
        a = np.asarray(p, dtype=np.float64).reshape(-1)
        if len(a) == 0 or not np.isfinite(a).all():
            return None
        return Geom(POINT, a.copy(), extra=self._wrap(ords) if ords is not None else None)

    def _fix_point(self, g: Geom) -> Geom:
        pt = self._point_element(g.data, _ring_ords(g, ()))
        return pt if pt is not None else Geom.empty(POINT)

    def _fix_multipoint(self, g: Geom) -> Geom:
        pts = []
        for i, p in enumerate(g.data):
            fp = self._point_element(p, _ring_ords(g, (i,)))
            if fp is not None:
                pts.append(fp)
        if not self.keep_multi and len(pts) == 1:
            return pts[0]
        data = [p.data for p in pts]
        extra = None
        if self._dims and pts:
            extra = {"dims": self._dims, "ords": [p.extra["ords"] for p in pts]}
        return Geom("MultiPoint", data, extra=extra)

    # -- lines ---------------------------------------------------------------
    def _wrap(self, ords):
        return {"dims": self._dims, "ords": ords} if getattr(self, "_dims", None) else None

    def _linestring_element(self, arr, ords):
        """FixLineStringElement: cleaned coords; keepCollapsed turns a
        single-point collapse into a Point; <=1 point is dropped."""
        a, e = _clean_coords(arr, ords)
        if self.keep_collapsed and len(a) == 1:
            return Geom(POINT, a[0].copy(), extra=self._wrap(e[0]) if e is not None else None)
        if len(a) <= 1:
            return None
        return Geom(LINESTRING, a, extra=self._wrap(e) if e is not None else None)

    def _fix_linestring(self, g: Geom) -> Geom:
        fixed = self._linestring_element(g.data, _ring_ords(g, ()))
        return fixed if fixed is not None else Geom.empty(LINESTRING)

    def _linear_ring_element(self, arr, ords):
        """FixLinearRingElement: keepCollapsed lowers short rings to
        Point/LineString; an invalid repaired ring degrades to LineString."""
        from .validity import is_valid

        a, e = _clean_coords(arr, ords)
        if self.keep_collapsed:
            if len(a) == 1:
                return Geom(POINT, a[0].copy(), extra=self._wrap(e[0]) if e is not None else None)
            if 1 < len(a) <= 3:
                return Geom(LINESTRING, a, extra=self._wrap(e) if e is not None else None)
        if len(a) <= 3:
            return None
        closed = (a[0] == a[-1]).all()
        ring = Geom(LINESTRING, a, tag="LinearRing" if closed else None,
                    extra=self._wrap(e) if e is not None else None)
        if not closed or not is_valid(ring):
            return Geom(LINESTRING, a, extra=self._wrap(e) if e is not None else None)
        return ring

    def _fix_linear_ring(self, g: Geom) -> Geom:
        fixed = self._linear_ring_element(g.data, _ring_ords(g, ()))
        if fixed is None:
            return Geom(LINESTRING, np.empty((0, 2)), tag="LinearRing")
        return fixed

    def _fix_multilinestring(self, g: Geom) -> Geom:
        fixed, mixed = [], False
        for i, ls in enumerate(g.data):
            f = self._linestring_element(ls, _ring_ords(g, (i,)))
            if f is None:
                continue
            if f.gtype != LINESTRING:
                mixed = True
            fixed.append(f)
        if len(fixed) == 1 and (not self.keep_multi or fixed[0].gtype != LINESTRING):
            return fixed[0]
        if mixed:
            return Geom(GEOMETRYCOLLECTION, fixed)
        extra = None
        if self._dims and fixed and all(f.extra for f in fixed):
            extra = {"dims": self._dims, "ords": [f.extra["ords"] for f in fixed]}
        return Geom("MultiLineString", [f.data for f in fixed], extra=extra)

    # -- polygons -------------------------------------------------------------
    @staticmethod
    def _fix_ring(ring) -> Geom:
        """FixRing (GeometryFixer.cs:408) = BufferOp.BufferByZero(poly(ring),
        bothOrientations): node the ring against itself, polygonize the
        faces, keep faces with NONZERO winding number vs the ring (both
        positively- and negatively-wound regions survive; +/- overlaps
        cancel).  Degenerate/flat rings produce POLYGON EMPTY."""
        from .construct import polygonize
        from .overlay import union_all
        from .validity import _check_ring

        a, _ = _clean_coords(ring)
        if len(a) >= 3 and (a[0] != a[-1]).any():
            a = np.vstack([a, a[:1]])
        if len(a) < 4:
            return Geom.empty(POLYGON)
        if _check_ring(a) is None and alg.ring_signed_area(a) != 0.0:
            return Geom(POLYGON, [a])  # already a valid ring: fast path
        faces = polygonize(Geom(POLYGON, [a]), node=True)
        kept = []
        for f in faces.flatten():
            if f.gtype != POLYGON:
                continue
            ip = alg.interior_point(f)
            if _winding_number(float(ip.data[0]), float(ip.data[1]), a) != 0:
                kept.append(f)
        if not kept:
            return Geom.empty(POLYGON)
        if len(kept) == 1:
            return kept[0]
        return union_all(kept)

    def _fix_polygon_element(self, rings):
        """FixPolygonElement: repaired shell minus intersecting repaired
        holes; holes disjoint from the shell become shells and are
        unioned in (GeometryFixer.cs:310-346)."""
        from .overlay import overlay, union_all
        from .predicates import intersects

        shell_fix = self._fix_ring(rings[0])
        if shell_fix.is_empty:
            if self.keep_collapsed:
                return self._linestring_element(rings[0], None)
            return None
        holes_fixed = [h for h in (self._fix_ring(r) for r in rings[1:]) if not h.is_empty]
        if not holes_fixed:
            return shell_fix
        holes, shells = [], []
        for h in holes_fixed:
            (holes if intersects(shell_fix, h) else shells).append(h)
        poly = shell_fix
        if holes:
            hu = holes[0] if len(holes) == 1 else union_all(holes)
            poly = overlay(shell_fix, hu, "difference")
        if not shells:
            return poly
        return union_all(shells + [poly])

    def _fix_polygon(self, g: Geom) -> Geom:
        fixed = self._fix_polygon_element(g.data)
        return fixed if fixed is not None else Geom.empty(POLYGON)

    def _fix_multipolygon(self, g: Geom) -> Geom:
        from .overlay import union_all

        polys = []
        for rings in g.data:
            p = self._fix_polygon_element(rings)
            if p is not None and not p.is_empty:
                polys.append(p)
        if not polys:
            return Geom.empty(MULTIPOLYGON)
        result = polys[0] if len(polys) == 1 else union_all(polys)
        if self.keep_multi and result.gtype == POLYGON:
            result = Geom(MULTIPOLYGON, [result.data])
        return result

    # -- Z/M re-population for polygon-kernel outputs -------------------------
    def _fill(self, res: Geom, src: Geom) -> Geom:
        """The polygonal repairs run through the 2-D overlay kernel, which
        drops out-of-band Z/M; restore them as OverlayNG does
        (OverlayNG.cs:437-459): exact input vertices keep their ordinates
        (duplicates averaged), new vertices take the ElevationModel Z and
        NaN for M."""
        if src.extra is None or res is None or res.is_empty:
            return res
        dims = src.extra["dims"]
        e = len(dims)
        exact: dict = {}
        counts: dict = {}
        for comp, ords in _walk_ords(src):
            arr = np.asarray(comp, dtype=np.float64).reshape(-1, 2)
            o = np.asarray(ords, dtype=np.float64).reshape(len(arr), e)
            for row, orow in zip(arr, o):
                key = (float(row[0]), float(row[1]))
                n = counts.get(key, 0)
                prev = exact.get(key, np.zeros(e))
                exact[key] = (prev * n + orow) / (n + 1)
                counts[key] = n + 1
        zi = dims.index("Z") if "Z" in dims else None
        model = None
        if zi is not None:
            from .elevation import ElevationModel

            model = ElevationModel.create(src, None)

        def fill(arr2: np.ndarray) -> np.ndarray:
            out = np.full((len(arr2), e), np.nan)
            for i, (x, y) in enumerate(np.asarray(arr2, dtype=np.float64).reshape(-1, 2)):
                key = (float(x), float(y))
                if key in exact:
                    out[i] = exact[key]
                elif zi is not None and model is not None and model.has_z:
                    out[i, zi] = model.get_z(x, y)
            return out

        return _rebuild_with_ords(res, dims, fill)


def _winding_number(x: float, y: float, ring: np.ndarray) -> int:
    """Winding number of (x, y) vs a closed ring — half-open straddle
    rule (p1.y <= y < p2.y counts upward, reversed counts downward), so
    a ray through a vertex is counted exactly once."""
    wn = 0
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if y1 <= y < y2:
            if alg.orient2d(x1, y1, x2, y2, x, y) > 0:
                wn += 1
        elif y2 <= y < y1:
            if alg.orient2d(x1, y1, x2, y2, x, y) < 0:
                wn -= 1
    return wn


def _walk_ords(g: Geom):
    """Yield (coords-array, ords-array) pairs for every component of a
    geometry carrying out-of-band ordinates."""
    if g.extra is None or g.is_empty:
        return
    t, o = g.gtype, g.extra["ords"]
    if t == POINT:
        yield g.data.reshape(1, 2), np.asarray(o).reshape(1, -1)
    elif t == LINESTRING:
        yield g.data, o
    elif t == POLYGON:
        for r, ro in zip(g.data, o):
            yield r, ro
    elif t == "MultiPoint":
        for p, po in zip(g.data, o):
            yield np.asarray(p, dtype=np.float64).reshape(1, 2), np.asarray(po).reshape(1, -1)
    elif t == "MultiLineString":
        for p, po in zip(g.data, o):
            yield p, po
    elif t == MULTIPOLYGON:
        for rings, rords in zip(g.data, o):
            for r, ro in zip(rings, rords):
                yield r, ro
    elif t == GEOMETRYCOLLECTION:
        for sub in g.data:
            yield from _walk_ords(sub)


def _rebuild_with_ords(g: Geom, dims: str, fill) -> Geom:
    """Attach extra ordinates computed by fill(arr2)->(N,e) to every
    component of g, mirroring its nesting."""
    if g.is_empty:
        return g
    t = g.gtype

    def wrap(o):
        return {"dims": dims, "ords": o}

    if t == POINT:
        return Geom(t, g.data, tag=g.tag, extra=wrap(fill(g.data.reshape(1, 2)).ravel()))
    if t == LINESTRING:
        return Geom(t, g.data, tag=g.tag, extra=wrap(fill(g.data)))
    if t == POLYGON:
        return Geom(t, g.data, tag=g.tag, extra=wrap([fill(r) for r in g.data]))
    if t == "MultiPoint":
        return Geom(t, g.data, tag=g.tag,
                    extra=wrap([fill(np.asarray(p).reshape(1, 2)).ravel() for p in g.data]))
    if t == "MultiLineString":
        return Geom(t, g.data, tag=g.tag, extra=wrap([fill(ls) for ls in g.data]))
    if t == MULTIPOLYGON:
        return Geom(t, g.data, tag=g.tag,
                    extra=wrap([[fill(r) for r in rings] for rings in g.data]))
    if t == GEOMETRYCOLLECTION:
        return Geom(t, [_rebuild_with_ords(sub, dims, fill) for sub in g.data], tag=g.tag)
    return g


def fix_geometry(g: Geom, keep_collapsed: bool = False, keep_multi: bool = True) -> Geom:
    """Repair a geometry to validity while preserving as much shape and
    vertex data as possible (GeometryFixer.cs:46-75 semantic rules):
    non-finite ordinates and repeated points are removed, self-crossing
    rings are re-noded into faces keeping nonzero winding (BufferByZero
    both-orientations semantics — +/- overlaps cancel), holes intersecting
    the shell are subtracted, holes outside the shell become shells, and
    collapses become EMPTY (or lower-dimension parts with
    ``keep_collapsed``).  ``keep_multi`` keeps single-item MULTI results
    as MULTI types."""
    return _Fixer(keep_collapsed, keep_multi).fix(g)


# ---------------------------------------------------------------------------
# maximum inscribed circle / largest empty circle
# (reference: Algorithm/Construct/MaximumInscribedCircle.cs:42,
#  LargestEmptyCircle.cs:43 — successive cell refinement)


def maximum_inscribed_circle(g: Geom, tolerance: float = 1e-3):
    """((cx, cy), radius) of the largest circle inside the polygon —
    grid refinement over distance-to-boundary (branch and bound)."""
    from .types import POLYGON

    polys = [c for c in g.flatten() if c.gtype == POLYGON]
    if not polys:
        return (0.0, 0.0), float("nan")
    env = alg.envelope(g)
    segs = alg._geom_segments(g)

    def clearance(x, y):
        loc_in = any(
            alg.locate_point_in_rings(x, y, p.data) == alg.INTERIOR for p in polys
        )
        d = alg.points_to_segments_distance(np.array([[x, y]]), segs)[0]
        return d if loc_in else -d

    # seed grid + iterative refinement around the best cell
    best = (None, -math.inf)
    step = max(env[2] - env[0], env[3] - env[1]) / 16.0
    xs = np.arange(env[0] + step / 2, env[2], step)
    ys = np.arange(env[1] + step / 2, env[3], step)
    cands = [(x, y) for x in xs for y in ys]
    while step > tolerance:
        scored = sorted(((clearance(x, y), x, y) for x, y in cands), reverse=True)
        top = scored[: max(4, len(scored) // 8)]
        if top[0][0] > best[1]:
            best = ((top[0][1], top[0][2]), top[0][0])
        step /= 2.0
        cands = []
        for _c, x, y in top:
            for ddx in (-step, 0, step):
                for ddy in (-step, 0, step):
                    cands.append((x + ddx, y + ddy))
    return best[0], best[1]


def largest_empty_circle(obstacles: Geom, boundary: Geom, tolerance: float = 1e-3):
    """((cx, cy), radius): largest circle inside `boundary` touching no
    obstacle point/line."""
    env = alg.envelope(boundary)
    segs = alg._geom_segments(obstacles)
    pts = obstacles.all_coords()
    bpolys = [c for c in boundary.flatten() if c.gtype == "Polygon"]

    def clearance(x, y):
        if not any(alg.locate_point_in_rings(x, y, p.data) != alg.EXTERIOR for p in bpolys):
            return -math.inf
        d = math.inf
        if segs is not None:
            d = alg.points_to_segments_distance(np.array([[x, y]]), segs)[0]
        elif len(pts):
            d = float(np.hypot(pts[:, 0] - x, pts[:, 1] - y).min())
        return d

    best = (None, -math.inf)
    step = max(env[2] - env[0], env[3] - env[1]) / 16.0
    xs = np.arange(env[0] + step / 2, env[2], step)
    ys = np.arange(env[1] + step / 2, env[3], step)
    cands = [(x, y) for x in xs for y in ys]
    while step > tolerance:
        scored = sorted(((clearance(x, y), x, y) for x, y in cands), reverse=True)
        top = scored[: max(4, len(scored) // 8)]
        if top[0][0] > best[1]:
            best = ((top[0][1], top[0][2]), top[0][0])
        step /= 2.0
        cands = []
        for _c, x, y in top:
            for ddx in (-step, 0, step):
                for ddy in (-step, 0, step):
                    cands.append((x + ddx, y + ddy))
    return best[0], best[1]


# ---------------------------------------------------------------------------
# coverage hygiene (Coverage/CoverageValidator.cs:41, CoverageGapFinder.cs:21)


def coverage_validate(polys) -> list:
    """Edge-consistency check for a polygonal coverage: every interior edge
    must appear EXACTLY twice (once per neighbor, opposite orientation) and
    boundaries once; returns a list of (poly_index, segment) violations —
    segments shared by >2 polygons or overlapping inconsistently."""
    counts: dict = {}
    for pi, p in enumerate(polys):
        comp = p if isinstance(p, Geom) else Geom(POLYGON, p)
        for ring in comp.coords_list():
            for i in range(len(ring) - 1):
                a = (float(ring[i, 0]), float(ring[i, 1]))
                b = (float(ring[i + 1, 0]), float(ring[i + 1, 1]))
                if a == b:
                    continue
                counts.setdefault((min(a, b), max(a, b)), []).append(pi)
    return [(owners[0], seg) for seg, owners in counts.items() if len(owners) > 2]


def coverage_gaps(polys) -> Geom:
    """Gaps in a coverage = holes of the dissolved union that are not holes
    of any input polygon (thin slivers between mis-snapped neighbors)."""
    u = coverage_union(polys)
    gaps = []
    for comp in u.flatten():
        if comp.gtype != POLYGON:
            continue
        for hole in comp.data[1:]:
            hx, hy = float(hole[0, 0]), float(hole[0, 1])
            is_input_hole = False
            for p in polys:
                pc = p if isinstance(p, Geom) else Geom(POLYGON, p)
                for ring in pc.data[1:]:
                    if len(ring) == len(hole) and alg.equals_exact(
                        alg.normalize(Geom(POLYGON, [ring])), alg.normalize(Geom(POLYGON, [hole]))
                    ):
                        is_input_hole = True
            if not is_input_hole:
                gaps.append(Geom(POLYGON, [hole[::-1].copy()]))
    return Geom(GEOMETRYCOLLECTION, gaps)


# ---------------------------------------------------------------------------
# line sequencer (Operation/Linemerge/LineSequencer.cs:45)


def sequence_lines(lines) -> list:
    """Order line components into continuous paths (greedy Eulerian-ish
    walk over the endpoint graph); returns list of coordinate arrays."""
    comps = []
    for ln in lines:
        arr = ln.all_coords() if isinstance(ln, Geom) else np.asarray(ln)
        if len(arr) >= 2:
            comps.append(arr)
    unused = set(range(len(comps)))
    by_endpoint: dict = {}
    for i, arr in enumerate(comps):
        by_endpoint.setdefault(tuple(arr[0]), []).append(i)
        by_endpoint.setdefault(tuple(arr[-1]), []).append(i)
    out = []
    while unused:
        # deterministic start: lowest-index unused component, odd endpoint first
        start = min(unused)
        unused.discard(start)
        path = [comps[start]]
        # extend forward
        while True:
            tail = tuple(path[-1][-1])
            nxt = [j for j in by_endpoint.get(tail, []) if j in unused]
            if not nxt:
                break
            j = min(nxt)
            unused.discard(j)
            arr = comps[j]
            path.append(arr if tuple(arr[0]) == tail else arr[::-1])
        # extend backward
        while True:
            head = tuple(path[0][0])
            prv = [j for j in by_endpoint.get(head, []) if j in unused]
            if not prv:
                break
            j = min(prv)
            unused.discard(j)
            arr = comps[j]
            path.insert(0, arr if tuple(arr[-1]) == head else arr[::-1])
        seq = [path[0]]
        for arr in path[1:]:
            seq.append(arr[1:])
        out.append(np.concatenate(seq, axis=0))
    return out


# ---------------------------------------------------------------------------
# variable buffer + offset curve (Operation/Buffer/VariableBuffer.cs:17,
# OffsetCurve.cs:47)


def variable_buffer(line: Geom, radii) -> Geom:
    """Buffer a line with a per-vertex radius (tapered capsules)."""
    from .buffer import _disk, _buffer_grid
    from .overlay import union_all

    arr = line.all_coords()
    radii = np.asarray(radii, dtype=np.float64)
    pieces = []
    for i in range(len(arr)):
        if radii[i] > 0:
            pieces.append(_disk(float(arr[i, 0]), float(arr[i, 1]), float(radii[i]), 8))
    for i in range(len(arr) - 1):
        r0, r1 = radii[i], radii[i + 1]
        p0, p1 = arr[i], arr[i + 1]
        d = p1 - p0
        ll = math.hypot(d[0], d[1])
        if ll == 0 or (r0 <= 0 and r1 <= 0):
            continue
        nx, ny = -d[1] / ll, d[0] / ll
        quad = np.array(
            [
                [p0[0] + nx * r0, p0[1] + ny * r0],
                [p1[0] + nx * r1, p1[1] + ny * r1],
                [p1[0] - nx * r1, p1[1] - ny * r1],
                [p0[0] - nx * r0, p0[1] - ny * r0],
                [p0[0] + nx * r0, p0[1] + ny * r0],
            ]
        )
        pieces.append(Geom(POLYGON, [quad]))
    if not pieces:
        return Geom.empty(POLYGON)
    # weld=True: the grid is a robustness weld for the piece-union fold
    # (vertex snapping only), NOT a precision model — the fixed-precision
    # path's collapse semantics silently dropped whole capsule pieces
    # (fuzz_offset: a vertex disk vanished, leaving its vertex outside)
    return union_all(pieces, _buffer_grid(float(max(radii.max(), 1e-9))), weld=True)


def offset_curve(line: Geom, dist: float) -> Geom:
    """One-sided offset of a line: the buffer boundary portion on the
    signed side (positive = left).  Approximation via the full buffer's
    boundary clipped to the offset side (OffsetCurve.cs semantics)."""
    from .buffer import buffer as buffer_fn

    if dist == 0:
        return line
    buf = buffer_fn(line, abs(dist))
    bnd = alg.boundary(buf)
    # keep boundary points whose signed side matches
    arr = line.all_coords()
    segs = alg._geom_segments(line)
    out_lines = []
    closed = len(arr) > 1 and (arr[0] == arr[-1]).all()
    nseg = len(arr) - 1
    def _classify(p):
        """(is_cap, side_ok) of a probe point vs the input line: nearest
        segment + side sign; cap = projection clamps to an END vertex of
        an open line with the probe strictly BEYOND it along the outward
        tangent (the reference OffsetCurve has no end caps; the terminus
        directly beside the endpoint is kept)."""
        best = (math.inf, 0.0, False)
        for i in range(nseg):
            a, b = arr[i], arr[i + 1]
            dx, dy = b[0] - a[0], b[1] - a[1]
            llen = dx * dx + dy * dy
            if llen == 0:
                continue
            t = max(0.0, min(1.0, ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / llen))
            cx, cy = a[0] + t * dx, a[1] + t * dy
            dd = math.hypot(p[0] - cx, p[1] - cy)
            is_cap = False
            if not closed:
                sl = math.sqrt(llen)
                if i == 0 and t == 0.0:
                    out_dot = -((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / sl
                    is_cap = out_dot > 1e-9 * (dd + 1.0)
                elif i == nseg - 1 and t == 1.0:
                    out_dot = ((p[0] - b[0]) * dx + (p[1] - b[1]) * dy) / sl
                    is_cap = out_dot > 1e-9 * (dd + 1.0)
            if dd < best[0] - 1e-12:
                side = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
                best = (dd, side, is_cap)
            elif dd < best[0] + 1e-12 and best[2] and not is_cap:
                # equally near an interior location: not a cap point
                side = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
                best = (dd, side, False)
        ok = best[1] > 0 if dist > 0 else best[1] < 0
        return best[2], ok

    for comp in bnd.flatten():
        coords = comp.all_coords()
        # classify boundary EDGES by their midpoint, not vertices: when
        # |dist| is comparable to the line length the welded buffer
        # boundary can lose a side edge's exact tangent VERTEX into the
        # adjacent cap arc (the vertex then classifies as cap), but the
        # edge midpoint still projects onto the line interior — an edge
        # formulation keeps the parallel section where the vertex one
        # dropped it entirely (fuzz_offset: short lines came back EMPTY)
        n_edges = len(coords) - 1
        keep = []
        for k in range(n_edges):
            p0, p1 = coords[k], coords[k + 1]
            mid = ((p0[0] + p1[0]) / 2.0, (p0[1] + p1[1]) / 2.0)
            is_cap, ok = _classify(mid)
            keep.append(ok and not is_cap)
        # chain consecutive kept edges into vertex runs
        run = []
        for k in range(n_edges):
            if keep[k]:
                if not run:
                    run = [coords[k]]
                run.append(coords[k + 1])
            elif len(run) >= 2:
                out_lines.append(np.array(run))
                run = []
            else:
                run = []
        if len(run) >= 2:
            out_lines.append(np.array(run))

    def _along(p) -> float:
        """Arc-length position of p's nearest point on the input line."""
        best = (math.inf, 0.0)
        pos = 0.0
        for i in range(nseg):
            a, b = arr[i], arr[i + 1]
            dx, dy = b[0] - a[0], b[1] - a[1]
            sl = math.hypot(dx, dy)
            if sl == 0:
                continue
            t = max(0.0, min(1.0, ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / (sl * sl)))
            cx, cy = a[0] + t * dx, a[1] + t * dy
            dd = math.hypot(p[0] - cx, p[1] - cy)
            if dd < best[0]:
                best = (dd, pos + t * sl)
            pos += sl
        return best[1]

    # orient each section to follow the input line's direction
    # (reference: OffsetCurve output runs parallel to the input)
    out_lines = [
        ls if _along(ls[0]) <= _along(ls[-1]) else ls[::-1].copy()
        for ls in out_lines
    ]
    if not out_lines:
        return Geom.empty(LINESTRING)
    if len(out_lines) == 1:
        return Geom(LINESTRING, out_lines[0])
    return Geom("MultiLineString", out_lines)


def dissolve_lines(g: Geom) -> Geom:
    """LineDissolver (reference: Dissolve/LineDissolver.cs:29): remove
    duplicate segments from the linework, then stitch the survivors into
    maximal chains broken at junction (degree != 2) nodes."""
    from .overlay import _merge_lines

    pieces = []
    for comp in g.flatten():
        for arr in comp.coords_list():
            for i in range(len(arr) - 1):
                p0 = (float(arr[i, 0]), float(arr[i, 1]))
                p1 = (float(arr[i + 1, 0]), float(arr[i + 1, 1]))
                if p0 != p1:
                    pieces.append((p0, p1))
    merged = _merge_lines(pieces)
    if not merged:
        return Geom.empty(LINESTRING)
    if len(merged) == 1:
        return Geom(LINESTRING, merged[0])
    return Geom("MultiLineString", merged)
