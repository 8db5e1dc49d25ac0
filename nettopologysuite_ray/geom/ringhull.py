"""PolygonHullSimplifier (reference: Simplify/PolygonHullSimplifier.cs:44,
RingHull.cs, RingHullIndex.cs, LinkedRing.cs).

Computes topology-safe outer or inner hulls of polygonal geometry by
eroding concave (outer) / convex (inner) corners, smallest corner-triangle
first, until a target vertex-count fraction or area-delta ratio is
reached.  Corners are only removed when no other ring vertex lies inside
the corner triangle, so rings never cross each other.
"""

from __future__ import annotations

import heapq
import itertools

import numpy as np

from . import algorithms as alg
from .types import MULTIPOLYGON, POLYGON, Geom


class _LinkedRing:
    """reference: Simplify/LinkedRing.cs — circular doubly-linked vertex
    list supporting removal."""

    def __init__(self, pts):
        # pts: closed ring; operate on the n distinct vertices
        self.pts = [(float(x), float(y)) for x, y in pts[:-1]]
        n = len(self.pts)
        self.nxt = [(i + 1) % n for i in range(n)]
        self.prv = [(i - 1) % n for i in range(n)]
        self.live = [True] * n
        self.count = n

    def prev(self, i):
        return self.prv[i]

    def next(self, i):
        return self.nxt[i]

    def coord(self, i):
        return self.pts[i]

    def has(self, i):
        return self.live[i]

    def remove_at(self, i):
        p, n = self.prv[i], self.nxt[i]
        self.nxt[p] = n
        self.prv[n] = p
        self.live[i] = False
        self.count -= 1

    def coordinates(self):
        out = [self.pts[i] for i in range(len(self.pts)) if self.live[i]]
        out.append(out[0])
        return np.array(out, dtype=np.float64)


def _tri_area(a, b, c):
    return abs((b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])) / 2.0


def _tri_contains(a, b, c, p):
    sa = alg.orient2d(a[0], a[1], b[0], b[1], c[0], c[1])
    ext = -1 if sa > 0 else 1

    def o(u, v, w):
        t = alg.orient2d(u[0], u[1], v[0], v[1], w[0], w[1])
        return (t > 0) - (t < 0)

    if o(a, b, p) == ext:
        return False
    if o(b, c, p) == ext:
        return False
    if o(c, a, p) == ext:
        return False
    return True


class _RingHull:
    """reference: Simplify/RingHull.cs."""

    def __init__(self, ring_pts, is_outer):
        pts = [(float(x), float(y)) for x, y in ring_pts]
        # orient: outer hulls CW, inner hulls CCW — kept corners are CW
        is_ccw = alg.ring_signed_area(np.asarray(pts)) > 0
        if is_outer == is_ccw:
            pts = pts[::-1]
        self.ring = _LinkedRing(pts)
        self.env = (
            min(p[0] for p in pts),
            min(p[1] for p in pts),
            max(p[0] for p in pts),
            max(p[1] for p in pts),
        )
        self.target_vertex_num = -1
        self.target_area_delta = -1.0
        self.area_delta = 0.0
        self._counter = itertools.count()
        self.queue: list = []
        for i in range(self.ring.count):
            self._add_corner(i)

    def _is_convex(self, i):
        pp = self.ring.coord(self.ring.prev(i))
        p = self.ring.coord(i)
        pn = self.ring.coord(self.ring.next(i))
        return alg.orient2d(pp[0], pp[1], p[0], p[1], pn[0], pn[1]) < 0  # CW

    def _add_corner(self, i):
        if self._is_convex(i):
            return
        pp = self.ring.coord(self.ring.prev(i))
        p = self.ring.coord(i)
        pn = self.ring.coord(self.ring.next(i))
        area = _tri_area(pp, p, pn)
        heapq.heappush(
            self.queue,
            (area, next(self._counter), i, self.ring.prev(i), self.ring.next(i)),
        )

    def query(self, env):
        """Live vertex indexes inside env (brute force; the reference uses
        a VertexSequencePackedRtree — fine at per-ring scale)."""
        x0, y0, x1, y1 = env
        out = []
        for i in range(len(self.ring.pts)):
            if not self.ring.live[i]:
                continue
            x, y = self.ring.pts[i]
            if x0 <= x <= x1 and y0 <= y <= y1:
                out.append(i)
        return out

    def compute(self, hull_index):
        while self.queue and self.ring.count > 3:
            area, _, i, prv, nxt = heapq.heappop(self.queue)
            if (
                not self.ring.live[i]
                or self.ring.prev(i) != prv
                or self.ring.next(i) != nxt
            ):
                continue  # stale corner
            # target reached?
            if self.target_vertex_num >= 0:
                if self.ring.count < self.target_vertex_num:
                    return
            elif self.target_area_delta >= 0:
                if self.area_delta + area > self.target_area_delta:
                    return
            else:
                return
            if self._is_removable(i, prv, nxt, hull_index):
                self.ring.remove_at(i)
                self.area_delta += area
                self._add_corner(prv)
                self._add_corner(nxt)

    def _corner_env(self, i, prv, nxt):
        pp = self.ring.coord(prv)
        p = self.ring.coord(i)
        pn = self.ring.coord(nxt)
        return (
            min(pp[0], p[0], pn[0]),
            min(pp[1], p[1], pn[1]),
            max(pp[0], p[0], pn[0]),
            max(pp[1], p[1], pn[1]),
        )

    def _is_removable(self, i, prv, nxt, hull_index):
        env = self._corner_env(i, prv, nxt)
        if self._has_intersecting_vertex(i, prv, nxt, env, self):
            return False
        if hull_index is None:
            return True
        for hull in hull_index.query(env):
            if hull is self:
                continue
            if self._has_intersecting_vertex(i, prv, nxt, env, hull):
                return False
        return True

    def _has_intersecting_vertex(self, i, prv, nxt, env, hull):
        pp = self.ring.coord(prv)
        p = self.ring.coord(i)
        pn = self.ring.coord(nxt)
        for idx in hull.query(env):
            if hull is self and idx in (i, prv, nxt):
                continue
            if _tri_contains(pp, p, pn, hull.ring.coord(idx)):
                return True
        return False

    def get_hull(self, hull_index):
        self.compute(hull_index)
        return self.ring.coordinates()


class _RingHullIndex:
    """reference: Simplify/RingHullIndex.cs — simple envelope scan."""

    def __init__(self):
        self.hulls: list[_RingHull] = []

    def add(self, hull):
        self.hulls.append(hull)

    def query(self, env):
        x0, y0, x1, y1 = env
        return [
            h
            for h in self.hulls
            if not (h.env[2] < x0 or h.env[0] > x1 or h.env[3] < y0 or h.env[1] > y1)
        ]


def polygon_hull_simplifier(
    g: Geom,
    is_outer: bool,
    vertex_num_fraction: float | None = None,
    area_delta_ratio: float | None = None,
) -> Geom:
    """reference: Simplify/PolygonHullSimplifier.cs:44 Hull/HullByAreaDelta."""
    if vertex_num_fraction is not None:
        vertex_num_fraction = min(max(abs(vertex_num_fraction), 0.0), 1.0)
        if vertex_num_fraction == 1:
            return g
    elif area_delta_ratio is not None:
        area_delta_ratio = abs(area_delta_ratio)
        if area_delta_ratio == 0:
            return g
    else:
        raise ValueError("a target criterion is required")

    polys = [c for c in g.flatten() if c.gtype == POLYGON]

    def make_hulls(poly, hull_index):
        hulls = []
        if not poly.data:
            return hulls
        if area_delta_ratio is not None:
            area_total = sum(
                abs(alg.ring_signed_area(np.asarray(r))) for r in poly.data
            )
        for ri, ring in enumerate(poly.data):
            h = _RingHull(ring, is_outer if ri == 0 else not is_outer)
            if vertex_num_fraction is not None:
                import math

                h.target_vertex_num = math.ceil(
                    vertex_num_fraction * (len(ring) - 1)
                )
            else:
                ring_area = abs(alg.ring_signed_area(np.asarray(ring)))
                weight = ring_area / area_total if area_total > 0 else 0.0
                h.target_area_delta = weight * area_delta_ratio * ring_area
            if hull_index is not None:
                hull_index.add(h)
            hulls.append(h)
        return hulls

    multi = g.gtype == MULTIPOLYGON or len(polys) > 1
    out = []
    if multi and is_outer and len(polys) > 1:
        # outer hulls of multiple polygons can overlap: shared index
        idx = _RingHullIndex()
        all_hulls = [make_hulls(p, idx) for p in polys]
        for p, hulls in zip(polys, all_hulls):
            out.append([h.get_hull(idx) for h in hulls])
    else:
        for p in polys:
            idx = None
            if not is_outer and len(p.data) > 1:
                idx = _RingHullIndex()
            hulls = make_hulls(p, idx)
            out.append([h.get_hull(idx) for h in hulls])
    if multi:
        return Geom(MULTIPOLYGON, out)
    return Geom(POLYGON, out[0])
