"""Geometry validity — OGC/SFS rules.

Re-creates the observable behavior of the reference's validity operator
(reference: Operation/Valid/IsValidOp.cs:12 — checks: finite coordinates
:374, closed rings :410, ring point count :431, no ring self-intersection
:486-505, holes in shell :519, holes not nested :584, shells not nested,
connected interior) with a fresh implementation:

* ring simplicity by pairwise robust segment intersection;
* hole containment / nesting by point location with on-boundary fallback
  to segment midpoints;
* connected-interior via the ring touch multigraph: the interior is
  disconnected iff the (shell+holes, touch-point) multigraph has a cycle
  (two rings touching twice, or a chain of holes closing a loop).
"""

from __future__ import annotations

import numpy as np

from . import algorithms as alg
from .types import GEOMETRYCOLLECTION, LINESTRING, MULTIPOINT, MULTIPOLYGON, POINT, POLYGON, Geom


def is_valid(g: Geom) -> bool:
    return explain_validity(g) is None


def explain_validity(g: Geom) -> str | None:
    """None if valid, else a reason string (mirrors
    Operation/Valid/TopologyValidationError.cs codes loosely)."""
    t = g.gtype
    if g.is_empty:
        return None
    cs = g.all_coords()
    if not np.isfinite(cs).all():
        return "invalid coordinate"
    if t == POINT or t == MULTIPOINT:
        return None
    if t == LINESTRING:
        if g.tag == "LinearRing":
            return _check_ring(g.data)
        return _check_line(g.data)
    if t == "MultiLineString":
        for ls in g.data:
            r = _check_line(ls)
            if r:
                return r
        return None
    if t == POLYGON:
        return _check_polygon(g.data)
    if t == MULTIPOLYGON:
        for rings in g.data:
            r = _check_polygon(rings)
            if r:
                return r
        return _check_shells_not_nested(g.data)
    if t == GEOMETRYCOLLECTION:
        for c in g.data:
            r = explain_validity(c)
            if r:
                return r
        return None
    return None


def _check_line(ls: np.ndarray) -> str | None:
    if len(ls) == 0:
        return None
    if len(ls) < 2:
        return "too few points in line"
    if len(np.unique(ls, axis=0)) < 2:
        return "too few distinct points"
    return None


def _dedup_ring(ring: np.ndarray) -> np.ndarray:
    """Drop consecutive repeated points (repeated points are legal)."""
    if len(ring) < 2:
        return ring
    keep = np.ones(len(ring), dtype=bool)
    keep[1:] = (ring[1:] != ring[:-1]).any(axis=1)
    return ring[keep]


def _check_ring(ring: np.ndarray) -> str | None:
    if len(ring) == 0:
        return None
    if (ring[0] != ring[-1]).any():
        return "ring not closed"
    r = _dedup_ring(ring)
    if len(r) < 4:
        return "too few points in ring"
    return _ring_self_intersection(r)


def _ring_self_intersection(ring: np.ndarray) -> str | None:
    """Any self-intersection (proper cross, vertex touch, collinear
    overlap) beyond adjacent-segment shared endpoints is invalid."""
    n = len(ring) - 1
    segs = [(ring[i], ring[i + 1]) for i in range(n)]
    if n > 64:
        from .overlay import _candidate_pairs

        cand = _candidate_pairs(np.column_stack([ring[:-1], ring[1:]]))
    else:
        cand = ((i, j) for i in range(n) for j in range(i + 1, n))
    for i, j in cand:
        adjacent = j == i + 1 or (i == 0 and j == n - 1)
        kind, pts = alg.segment_intersection(segs[i][0], segs[i][1], segs[j][0], segs[j][1])
        if kind == "none":
            continue
        if kind == "overlap":
            return "ring self-intersection (collinear)"
        p = pts[0]
        if adjacent:
            # allowed only at the shared endpoint
            shared = segs[i][1] if j == i + 1 else segs[i][0]
            if p[0] == shared[0] and p[1] == shared[1]:
                continue
            return "ring self-intersection"
        return "ring self-intersection"
    return None


def _point_not_on_rings(ring: np.ndarray, other_rings) -> tuple | None:
    """A point of `ring` (vertex or segment midpoint) not lying on any of
    other_rings' boundaries — the probe for containment tests."""
    for p in ring[:-1]:
        if alg.locate_point_in_rings(float(p[0]), float(p[1]), other_rings) != alg.BOUNDARY:
            return float(p[0]), float(p[1])
    for i in range(len(ring) - 1):
        mx = (ring[i, 0] + ring[i + 1, 0]) / 2.0
        my = (ring[i, 1] + ring[i + 1, 1]) / 2.0
        if alg.locate_point_in_rings(mx, my, other_rings) != alg.BOUNDARY:
            return float(mx), float(my)
    return None


def _rings_cross(r1: np.ndarray, r2: np.ndarray) -> tuple[str | None, list]:
    """(error, touch_points): error if rings properly cross or share a
    line; else the list of distinct touch points."""
    touches = []
    n1 = len(r1) - 1
    n2 = len(r2) - 1
    if n1 * n2 > 4096:
        from .overlay import _candidate_pairs

        cand = _candidate_pairs(
            np.column_stack([r1[:-1], r1[1:]]),
            np.column_stack([r2[:-1], r2[1:]]),
        )
    else:
        cand = ((i, j) for i in range(n1) for j in range(n2))
    for i, j in cand:
        kind, pts = alg.segment_intersection(r1[i], r1[i + 1], r2[j], r2[j + 1])
        if kind == "none":
            continue
        if kind == "overlap":
            return "rings share a line segment", []
        p = pts[0]
        # proper crossing = intersection point interior to both segments
        if _strictly_inside_seg(p, r1[i], r1[i + 1]) and _strictly_inside_seg(
            p, r2[j], r2[j + 1]
        ):
            return "rings cross", []
        if p not in touches:
            touches.append(p)
    # vertex-touch that actually crosses (vertex of r1 ON r2 with r1 passing
    # through) is caught by the containment checks downstream
    return None, touches


def _strictly_inside_seg(p, a, b) -> bool:
    if p[0] == a[0] and p[1] == a[1]:
        return False
    if p[0] == b[0] and p[1] == b[1]:
        return False
    return True


def _check_polygon(rings) -> str | None:
    if not rings:
        return None
    for ring in rings:
        err = _check_ring(ring)
        if err:
            return err
    shell = _dedup_ring(rings[0])
    holes = [_dedup_ring(h) for h in rings[1:]]
    # ring-pair relationships + touch graph
    edges = []  # (i, j, point) in multigraph over ring ids (0=shell)
    allr = [shell] + holes
    for i in range(len(allr)):
        for j in range(i + 1, len(allr)):
            err, touches = _rings_cross(allr[i], allr[j])
            if err:
                return err
            if len(touches) > 0:
                for p in touches:
                    edges.append((i, j, p))
    # holes inside shell, not inside other holes
    for k, hole in enumerate(holes):
        probe = _point_not_on_rings(hole, [shell])
        if probe is None:
            return "hole degenerate with shell"
        if alg.locate_point_in_rings(probe[0], probe[1], [shell]) != alg.INTERIOR:
            return "hole outside shell"
        for k2, other in enumerate(holes):
            if k2 == k:
                continue
            probe2 = _point_not_on_rings(hole, [other])
            if probe2 is None:
                return "duplicate holes"
            if alg.locate_point_in_rings(probe2[0], probe2[1], [other]) == alg.INTERIOR:
                return "nested holes"
    # a ring touching ITSELF was rejected in _check_ring; now: interior
    # connectivity via the BIPARTITE ring/touch-point graph — a cycle there
    # encloses area (needs >= 2 distinct touch points), so N holes meeting
    # at ONE point stay valid while two rings touching twice do not
    if _bipartite_has_cycle(len(allr), edges):
        return "interior disconnected"
    return None


def _bipartite_has_cycle(n_rings: int, edges) -> bool:
    """Union-find over nodes = rings + distinct touch points; edge
    ring—point for every incidence; cycle => disconnected interior."""
    pts: dict = {}
    parent = list(range(n_rings))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y) -> bool:
        rx, ry = find(x), find(y)
        if rx == ry:
            return False
        parent[rx] = ry
        return True

    seen = set()
    for i, j, p in edges:
        key = (p[0], p[1])
        if key not in pts:
            pts[key] = len(parent)
            parent.append(len(parent))
        pn = pts[key]
        for ring in (i, j):
            if (ring, pn) in seen:
                continue
            seen.add((ring, pn))
            if not union(ring, pn):
                return True
    return False


def _check_shells_not_nested(polys) -> str | None:
    """MultiPolygon: polygon interiors must be disjoint and boundaries may
    only meet at finitely many points.  Shell-in-hole nesting falls out of
    even-odd location against ALL of the other polygon's rings."""
    polys = [rings for rings in polys if rings and len(rings[0]) > 0]
    # dedup + envelope once per polygon (previously recomputed inside the
    # pair loop, and every midpoint probe ray-crossed every ring of the
    # other polygon — O(P² V²) on large multipolygons; component pairs
    # with disjoint envelopes cannot nest, overlap, or duplicate)
    dd = [[_dedup_ring(r) for r in rings] for rings in polys]
    envs = [alg._ring_envs(d) for d in dd]
    for i in range(len(polys)):
        shell_i = dd[i][0]
        ei = envs[i][0]
        for j in range(len(polys)):
            if i == j:
                continue
            ej = envs[j][0]
            if (
                ej[0] > ei[2]
                or ei[0] > ej[2]
                or ej[1] > ei[3]
                or ei[1] > ej[3]
            ):
                continue
            rings_j = dd[j]
            if i < j:
                # boundaries of DISTINCT polygons may only meet at finitely
                # many points — a proper crossing or 1-D collinear overlap
                # between ANY ring pair (incl. hole_i × shell_j: a polygon
                # nested in another's hole sharing hole-edge segments,
                # misc/TestInvalidA.xml#72) is invalid
                for ri, eri in zip(dd[i], envs[i]):
                    for rj, erj in zip(rings_j, envs[j]):
                        if (
                            erj[0] > eri[2]
                            or eri[0] > erj[2]
                            or erj[1] > eri[3]
                            or eri[1] > erj[3]
                        ):
                            continue
                        err, _t = _rings_cross(ri, rj)
                        if err:
                            return err
            # every boundary segment of polygon i must stay out of Int(j):
            # segments cannot cross d(poly j) except at touch points at their
            # ends, so the midpoint decides each segment's side (even-odd
            # across shell+holes: inside-a-hole comes out EXTERIOR)
            for ri, eri in zip(dd[i], envs[i]):
                if (
                    eri[0] > ej[2]
                    or ej[0] > eri[2]
                    or eri[1] > ej[3]
                    or ej[1] > eri[3]
                ):
                    continue  # every midpoint exterior to j: nothing to flag
                any_probe = False
                for k in range(len(ri) - 1):
                    mx = (ri[k, 0] + ri[k + 1, 0]) / 2.0
                    my = (ri[k, 1] + ri[k + 1, 1]) / 2.0
                    loc = alg.locate_point_in_rings(mx, my, rings_j, envs[j])
                    if loc == alg.INTERIOR:
                        return "nested or overlapping shells"
                    if loc != alg.BOUNDARY:
                        any_probe = True
                if not any_probe and len(ri) > 1:
                    return "duplicate shells"
    return None


def is_simple(g: Geom) -> bool:
    """SFS simplicity (reference: Operation/Valid/IsSimpleOp.cs:59):
    points: no repeated; linework: self-intersections allowed only at
    component BOUNDARY endpoints (closed components have none); polygonal
    geometry: every ring must be a simple closed curve."""
    t = g.gtype
    if g.is_empty:
        return True
    if t == POINT:
        return True
    if t == MULTIPOINT:
        pts = [tuple(p) for p in g.data]
        return len(pts) == len(set(pts))
    if t == POLYGON:
        return all(_check_ring(r) is None for r in g.data)
    if t == MULTIPOLYGON:
        return all(_check_ring(r) is None for rings in g.data for r in rings)
    if t == GEOMETRYCOLLECTION:
        return all(is_simple(c) for c in g.data)
    # linework (LineString / MultiLineString)
    comps = [_dedup_ring(c.data) for c in g.flatten() if c.gtype == LINESTRING]
    segs = []
    seg_comp = []
    comp_ranges = []
    for ci, d in enumerate(comps):
        s = len(segs)
        for i in range(len(d) - 1):
            segs.append((d[i], d[i + 1]))
            seg_comp.append(ci)
        comp_ranges.append((s, len(segs), len(d) > 1 and (d[0] == d[-1]).all()))
    for i in range(len(segs)):
        for j in range(i + 1, len(segs)):
            kind, pts = alg.segment_intersection(segs[i][0], segs[i][1], segs[j][0], segs[j][1])
            if kind == "none":
                continue
            if kind == "overlap":
                return False
            p = (float(pts[0][0]), float(pts[0][1]))
            if _consecutive_segs(i, j, comp_ranges):
                s, e, closed = comp_ranges[seg_comp[i]]
                shared = segs[i][1]  # their common vertex
                if closed and i == s and j == e - 1:
                    shared = segs[i][0]  # ring closure: first.start == last.end
                if p[0] == shared[0] and p[1] == shared[1]:
                    continue
                return False
            # otherwise: allowed only where BOTH segments sit at an OPEN
            # component's outer end and p is exactly that boundary endpoint
            if _at_component_boundary(p, i, comp_ranges, segs) and _at_component_boundary(
                p, j, comp_ranges, segs
            ):
                continue
            return False
    return True


def _consecutive_segs(i, j, comp_ranges) -> bool:
    for s, e, closed in comp_ranges:
        if s <= i < e and s <= j < e:
            if j == i + 1:
                return True
            if closed and i == s and j == e - 1:
                return True
    return False


def _at_component_boundary(p, seg_idx, comp_ranges, segs) -> bool:
    """True iff p is the outer endpoint of an OPEN component and seg_idx is
    the first/last segment carrying that endpoint."""
    for s, e, closed in comp_ranges:
        if s <= seg_idx < e:
            if closed:
                return False
            if seg_idx == s and p[0] == segs[s][0][0] and p[1] == segs[s][0][1]:
                return True
            if seg_idx == e - 1 and p[0] == segs[e - 1][1][0] and p[1] == segs[e - 1][1][1]:
                return True
            return False
    return False
