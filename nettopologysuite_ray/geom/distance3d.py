"""3D distance operations (reference: Algorithm/CGAlgorithms3D.cs,
Operation/Distance3D/Distance3DOp.cs, PlanarPolygon3D.cs,
Mathematics/Plane3D.cs).

Z ordinates ride out-of-band on ``Geom.extra`` (dims containing "Z");
components without Z get NaN, which (as in the reference) falls back to
2D distance for point/point and raises for segment math.  Polygons are
treated as planar polygons in 3D: a best-fit plane from the averaged
shell normal, point-in-polygon via projection onto the closest axis
plane."""

from __future__ import annotations

import math

import numpy as np

from .types import (
    GEOMETRYCOLLECTION,
    Geom,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
)


def _flatten_z(g: Geom):
    """Like Geom.flatten() but carrying each component's slice of the
    out-of-band Z/M ordinates (flatten() drops `extra`)."""
    t = g.gtype
    if t in (POINT, LINESTRING, POLYGON):
        if not g.is_empty:
            yield g
        return
    ords = None
    dims = None
    if g.extra and "Z" in g.extra.get("dims", ""):
        dims = g.extra["dims"]
        ords = g.extra["ords"]
    if t == GEOMETRYCOLLECTION:
        for sub in g.data:
            yield from _flatten_z(sub)
        return
    sub_type = {MULTIPOINT: POINT, MULTILINESTRING: LINESTRING, MULTIPOLYGON: POLYGON}[t]
    for i, d in enumerate(g.data):
        e = {"dims": dims, "ords": ords[i]} if ords is not None else None
        yield from _flatten_z(Geom(sub_type, d, extra=e))


# ---------------------------------------------------------------------------
# coordinate access: (N, 3) arrays with NaN Z when absent

def _with_z(arr2: np.ndarray, ords) -> np.ndarray:
    a = np.asarray(arr2, dtype=np.float64).reshape(-1, 2)
    out = np.full((len(a), 3), np.nan, dtype=np.float64)
    out[:, :2] = a
    if ords is not None:
        o = np.asarray(ords, dtype=np.float64).reshape(len(a), -1)
        out[:, 2] = o[:, 0]
    return out


def _component_coords3(comp: Geom):
    """[(N,3) array, ...] — one per ring for polygons, one for lines,
    a single-row array for points.  Z comes from extra when dims has Z."""
    ords = None
    if comp.extra and "Z" in comp.extra.get("dims", ""):
        ords = comp.extra["ords"]
    if comp.gtype == POINT:
        return [_with_z(np.asarray(comp.data).reshape(1, 2), ords)]
    if comp.gtype == LINESTRING:
        return [_with_z(comp.data, ords)]
    if comp.gtype == POLYGON:
        rings = comp.data
        if ords is None:
            return [_with_z(r, None) for r in rings]
        return [_with_z(r, o) for r, o in zip(rings, ords)]
    raise ValueError(comp.gtype)


# ---------------------------------------------------------------------------
# scalar kernels (reference: Algorithm/CGAlgorithms3D.cs)

def distance_3d(p0, p1) -> float:
    """Point distance; falls back to 2D when either Z is NaN."""
    if math.isnan(p0[2]) or math.isnan(p1[2]):
        return math.hypot(p0[0] - p1[0], p0[1] - p1[1])
    return math.sqrt(
        (p0[0] - p1[0]) ** 2 + (p0[1] - p1[1]) ** 2 + (p0[2] - p1[2]) ** 2
    )


def _nn(v: float):
    if math.isnan(v):
        raise ValueError("Ordinates must not be NaN")
    return v


def distance_point_segment_3d(p, a, b):
    """(distance, closest point on ab)."""
    if a[0] == b[0] and a[1] == b[1] and (a[2] == b[2] or (math.isnan(a[2]) and math.isnan(b[2]))):
        return distance_3d(p, a), a
    len2 = _nn(
        (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2 + (b[2] - a[2]) ** 2
    )
    r = (
        (p[0] - a[0]) * (b[0] - a[0])
        + (p[1] - a[1]) * (b[1] - a[1])
        + (p[2] - a[2]) * (b[2] - a[2])
    ) / len2
    if r <= 0.0:
        return distance_3d(p, a), a
    if r >= 1.0:
        return distance_3d(p, b), b
    q = (
        a[0] + r * (b[0] - a[0]),
        a[1] + r * (b[1] - a[1]),
        a[2] + r * (b[2] - a[2]),
    )
    return distance_3d(p, q), q


def _dot3(a, b, c, d) -> float:
    """Dot of vectors ab and cd."""
    return (
        (b[0] - a[0]) * (d[0] - c[0])
        + (b[1] - a[1]) * (d[1] - c[1])
        + (b[2] - a[2]) * (d[2] - c[2])
    )


def distance_segment_segment_3d(a, b, c, d):
    """(distance, closest point on ab, closest point on cd) —
    softsurfer parameterization, degenerate segments delegate to
    point/segment (reference: CGAlgorithms3D.DistanceSegmentSegment)."""
    if a[0] == b[0] and a[1] == b[1] and a[2] == b[2]:
        dist, q = distance_point_segment_3d(a, c, d)
        return dist, a, q
    if c[0] == d[0] and c[1] == d[1] and c[2] == d[2]:
        dist, q = distance_point_segment_3d(c, a, b)
        return dist, q, c
    va = _dot3(a, b, a, b)
    vb = _dot3(a, b, c, d)
    vc = _dot3(c, d, c, d)
    vd = _dot3(a, b, c, a)
    ve = _dot3(c, d, c, a)
    denom = _nn(va * vc - vb * vb)
    if denom <= 0.0:
        s = 0.0
        t = vd / vb if vb > vc else ve / vc
    else:
        s = (vb * ve - vc * vd) / denom
        t = (va * ve - vb * vd) / denom
    if s < 0:
        dist, q = distance_point_segment_3d(a, c, d)
        return dist, a, q
    if s > 1:
        dist, q = distance_point_segment_3d(b, c, d)
        return dist, b, q
    if t < 0:
        dist, q = distance_point_segment_3d(c, a, b)
        return dist, q, c
    if t > 1:
        dist, q = distance_point_segment_3d(d, a, b)
        return dist, q, d
    p0 = (
        a[0] + s * (b[0] - a[0]),
        a[1] + s * (b[1] - a[1]),
        a[2] + s * (b[2] - a[2]),
    )
    p1 = (
        c[0] + t * (d[0] - c[0]),
        c[1] + t * (d[1] - c[1]),
        c[2] + t * (d[2] - c[2]),
    )
    return distance_3d(p0, p1), p0, p1


# ---------------------------------------------------------------------------
# planar polygon in 3D (reference: PlanarPolygon3D.cs, Plane3D.cs)

_XY, _XZ, _YZ = 0, 1, 2


class PlanarPolygon3D:
    def __init__(self, rings3):
        """rings3: [(N,3) shell, (N,3) holes...]."""
        self.rings = rings3
        shell = rings3[0]
        self.base_pt = shell.mean(axis=0)
        # averaged Newell normal over the shell
        p1 = shell[:-1]
        p2 = shell[1:]
        n = np.array(
            [
                ((p1[:, 1] - p2[:, 1]) * (p1[:, 2] + p2[:, 2])).sum(),
                ((p1[:, 2] - p2[:, 2]) * (p1[:, 0] + p2[:, 0])).sum(),
                ((p1[:, 0] - p2[:, 0]) * (p1[:, 1] + p2[:, 1])).sum(),
            ]
        ) / len(shell)
        ln = math.sqrt((n * n).sum())
        self.normal = n / ln if ln > 0 else np.array([0.0, 0.0, 1.0])
        xm, ym, zm = abs(self.normal[0]), abs(self.normal[1]), abs(self.normal[2])
        if xm > ym:
            self.facing = _YZ if xm > zm else _XY
        else:
            self.facing = _XY if zm > ym else _XZ

    def oriented_distance(self, p) -> float:
        pb = self.base_pt - np.asarray(p[:3], dtype=np.float64)
        d = float(pb @ self.normal)
        if math.isnan(d):
            raise ValueError("3D Coordinate has NaN ordinate")
        return d

    def _project(self, arr3: np.ndarray) -> np.ndarray:
        if self.facing == _XY:
            return arr3[..., [0, 1]]
        if self.facing == _XZ:
            return arr3[..., [0, 2]]
        return arr3[..., [1, 2]]

    def _locate_in_ring(self, pt, ring3) -> int:
        from . import algorithms as alg

        proj = self._project(np.asarray(ring3, dtype=np.float64))
        p2 = self._project(np.asarray(pt, dtype=np.float64).reshape(1, 3))[0]
        return alg.locate_point_in_rings(float(p2[0]), float(p2[1]), [proj])

    def intersects(self, pt) -> bool:
        from . import algorithms as alg

        if self._locate_in_ring(pt, self.rings[0]) == alg.EXTERIOR:
            return False
        for hole in self.rings[1:]:
            if self._locate_in_ring(pt, hole) == alg.INTERIOR:
                return False
        return True

    def intersects_ring(self, pt, ring3) -> bool:
        from . import algorithms as alg

        return self._locate_in_ring(pt, ring3) != alg.EXTERIOR


# ---------------------------------------------------------------------------
# Distance3DOp equivalents

def _line_line(c0, c1):
    best = None
    for i in range(len(c0) - 1):
        for j in range(len(c1) - 1):
            d, p, q = distance_segment_segment_3d(
                c0[i], c0[i + 1], c1[j], c1[j + 1]
            )
            if best is None or d < best[0]:
                best = (d, p, q)
                if d <= 0.0:
                    return best
    return best


def _line_point(line, pt):
    best = None
    for i in range(len(line) - 1):
        d, q = distance_point_segment_3d(pt, line[i], line[i + 1])
        if best is None or d < best[0]:
            best = (d, q, tuple(pt))
            if d <= 0.0:
                return best
    return best


def _plane_line_intersection(poly: PlanarPolygon3D, line):
    d0 = poly.oriented_distance(line[0])
    for i in range(len(line) - 1):
        d1 = poly.oriented_distance(line[i + 1])
        if d0 * d1 <= 0:  # segment endpoints straddle (or touch) the plane
            f = 0.0 if (d0 - d1) == 0 else d0 / (d0 - d1)
            int_pt = tuple(
                line[i][k] + f * (line[i + 1][k] - line[i][k]) for k in range(3)
            )
            if poly.intersects(int_pt):
                return int_pt
        d0 = d1
    return None


def _polygon_point(poly: PlanarPolygon3D, pt):
    shell = poly.rings[0]
    if poly.intersects_ring(pt, shell):
        for hole in poly.rings[1:]:
            if poly.intersects_ring(pt, hole):
                return _line_point(hole, pt)
        dist = abs(poly.oriented_distance(pt))
        return (dist, tuple(pt), tuple(pt))
    return _line_point(shell, pt)


def _polygon_line(poly: PlanarPolygon3D, line):
    int_pt = _plane_line_intersection(poly, line)
    if int_pt is not None:
        return (0.0, int_pt, int_pt)
    best = None
    for ring in poly.rings:
        r = _line_line(ring, line)
        if r is not None and (best is None or r[0] < best[0]):
            best = r
            if best[0] <= 0.0:
                return best
    return best


def _polygon_polygon(poly0: PlanarPolygon3D, rings1):
    """Distance requires ALL ring pairings, not just shells
    (reference test: TestPolygonPolygonLinkedThruHoles)."""
    best = None
    for ring in rings1:
        r = _polygon_line(poly0, ring)
        if r is not None and (best is None or r[0] < best[0]):
            best = r
            if best[0] <= 0.0:
                return best
    poly1 = PlanarPolygon3D(rings1)
    for ring in poly0.rings:
        r = _polygon_line(poly1, ring)
        if r is not None and (best is None or r[0] < best[0]):
            best = (r[0], r[2], r[1])  # swap back to (g0, g1) order
            if best[0] <= 0.0:
                return best
    return best


def _component_distance(a: Geom, ca, b: Geom, cb):
    """(dist, pa, pb) for two flattened components with coords3 lists."""
    ta, tb = a.gtype, b.gtype
    if ta == POLYGON:
        poly = PlanarPolygon3D(ca)
        if tb == POLYGON:
            return _polygon_polygon(poly, cb)
        if tb == LINESTRING:
            return _polygon_line(poly, cb[0])
        return _polygon_point(poly, cb[0][0])
    if ta == LINESTRING:
        if tb == POLYGON:
            r = _component_distance(b, cb, a, ca)
            return (r[0], r[2], r[1])
        if tb == LINESTRING:
            return _line_line(ca[0], cb[0])
        r = _line_point(ca[0], cb[0][0])
        return r
    # ta == POINT
    if tb == POINT:
        p, q = ca[0][0], cb[0][0]
        return (distance_3d(p, q), tuple(p), tuple(q))
    r = _component_distance(b, cb, a, ca)
    return (r[0], r[2], r[1])


def distance3d(g0: Geom, g1: Geom):
    """Minimum 3D distance between two geometries
    (reference: Distance3DOp.Distance).  Returns 0.0 when either side is
    empty, as the reference's tests require."""
    comps0 = list(_flatten_z(g0))
    comps1 = list(_flatten_z(g1))
    if not comps0 or not comps1:
        return 0.0
    best = None
    for a in comps0:
        ca = _component_coords3(a)
        for b in comps1:
            cb = _component_coords3(b)
            r = _component_distance(a, ca, b, cb)
            if r is not None and (best is None or r[0] < best[0]):
                best = r
                if best[0] <= 0.0:
                    return 0.0
    return best[0]


def nearest_points3d(g0: Geom, g1: Geom):
    """Closest (x, y, z) pair (reference: Distance3DOp.NearestPoints);
    None when either side is empty."""
    comps0 = list(_flatten_z(g0))
    comps1 = list(_flatten_z(g1))
    if not comps0 or not comps1:
        return None
    best = None
    for a in comps0:
        ca = _component_coords3(a)
        for b in comps1:
            cb = _component_coords3(b)
            r = _component_distance(a, ca, b, cb)
            if r is not None and (best is None or r[0] < best[0]):
                best = r
                if best[0] <= 0.0:
                    break
    return (tuple(best[1]), tuple(best[2]))


def is_within_distance3d(g0: Geom, g1: Geom, d: float) -> bool:
    """reference: Distance3DOp.IsWithinDistance."""
    return distance3d(g0, g1) <= d
