"""Polygon triangulation (reference: Triangulate/Polygon/
PolygonTriangulator.cs:22, ConstrainedDelaunayTriangulator.cs:18,
PolygonEarClipper.cs, PolygonHoleJoiner.cs, TriDelaunayImprover.cs,
Triangulate/Tri/Tri.cs, TriangulationBuilder.cs).

Holes are joined into the shell with interior-disjoint cut lines, the
joined ring is ear-clipped, and (for the constrained-Delaunay variant)
edge flips improve the triangulation to Delaunay where the constraint
edges allow.
"""

from __future__ import annotations

import math

import numpy as np

from . import algorithms as alg
from .triangulate import _in_circle
from .types import GEOMETRYCOLLECTION, POLYGON, Geom

# vertex/coordinate values are (x, y) float tuples throughout


def _next(i: int) -> int:
    return (i + 1) % 3


def _prev(i: int) -> int:
    return (i + 2) % 3


_opp_vertex = _prev


def _orient(a, b, c) -> int:
    v = alg.orient2d(a[0], a[1], b[0], b[1], c[0], c[1])
    return (v > 0) - (v < 0)  # 1 = CCW, -1 = CW, 0 = collinear


class Tri:
    """JTS Tri: vertices CW; adj[i] is across edge (p[i], p[i+1])."""

    __slots__ = ("p", "adj")

    def __init__(self, p0, p1, p2):
        self.p = [p0, p1, p2]
        self.adj = [None, None, None]

    def has_adjacent(self, i: int) -> bool:
        return self.adj[i] is not None

    def edge_length(self, i: int) -> float:
        a = self.p[i]
        b = self.p[_next(i)]
        return math.hypot(b[0] - a[0], b[1] - a[1])

    def remove(self) -> None:
        for i in range(3):
            a = self.adj[i]
            if a is not None:
                a.replace(self, None)
                self.adj[i] = None

    def index_of_coord(self, q) -> int:
        for i in range(3):
            if self.p[i] == q:
                return i
        return -1

    def index_of_tri(self, t) -> int:
        for i in range(3):
            if self.adj[i] is t:
                return i
        return -1

    def set_adjacent_at_coord(self, q, t) -> None:
        self.adj[self.index_of_coord(q)] = t

    def replace(self, old, new) -> None:
        for i in range(3):
            if self.adj[i] is old:
                self.adj[i] = new
                return

    def flip(self, index: int) -> None:
        """reference: Tri.cs Flip — rotate the shared edge of this tri and
        adj[index] to the opposite diagonal of their quadrilateral."""
        tri = self.adj[index]
        index1 = tri.index_of_tri(self)
        adj0 = self.p[index]
        adj1 = self.p[_next(index)]
        opp0 = self.p[_opp_vertex(index)]
        opp1 = tri.p[_opp_vertex(index1)]
        # order: 0: opp0-adj0, 1: opp0-adj1, 2: opp1-adj0, 3: opp1-adj1
        a = [
            self.adj[_prev(index)],
            self.adj[_next(index)],
            tri.adj[_next(index1)],
            tri.adj[_prev(index1)],
        ]
        self.p = [opp1, opp0, adj0]
        tri.p = [opp0, opp1, adj1]
        self.adj = [tri, a[0], a[2]]
        if a[2] is not None:
            a[2].replace(tri, self)
        tri.adj = [self, a[3], a[1]]
        if a[1] is not None:
            a[1].replace(self, tri)


def build_triangulation(tris) -> None:
    """Link adjacency by undirected coordinate-pair edges
    (reference: TriangulationBuilder.cs)."""
    edge_map: dict = {}
    for tri in tris:
        ns = []
        for i in range(3):
            k = frozenset((tri.p[i], tri.p[_next(i)]))
            ns.append(edge_map.get(k))
        tri.adj = ns
        for i in range(3):
            k = frozenset((tri.p[i], tri.p[_next(i)]))
            if ns[i] is None:
                edge_map[k] = tri
            else:
                ns[i].set_adjacent_at_coord(tri.p[_next(i)], tri)


# ---------------------------------------------------------------------------
# angle utilities (reference: Algorithm/Angle.cs, PolygonNodeTopology.cs)


def _angle_between_oriented(tip1, tail, tip2) -> float:
    a1 = math.atan2(tip1[1] - tail[1], tip1[0] - tail[0])
    a2 = math.atan2(tip2[1] - tail[1], tip2[0] - tail[0])
    d = a2 - a1
    if d <= -math.pi:
        return d + 2 * math.pi
    if d > math.pi:
        return d - 2 * math.pi
    return d


def _quadrant(origin, p) -> int:
    dx = p[0] - origin[0]
    dy = p[1] - origin[1]
    if dx >= 0:
        return 0 if dy >= 0 else 3
    return 1 if dy >= 0 else 2


def _is_angle_greater(origin, p, q) -> bool:
    qp = _quadrant(origin, p)
    qq = _quadrant(origin, q)
    if qp > qq:
        return True
    if qp < qq:
        return False
    return _orient(origin, q, p) == 1


def _is_between(origin, p, e0, e1) -> bool:
    if not _is_angle_greater(origin, p, e0):
        return False
    return not _is_angle_greater(origin, p, e1)


def is_interior_segment(node_pt, a0, a1, b) -> bool:
    """True if segment (node_pt, b) lies in the interior of the ring corner
    a0 -> node_pt -> a1 (reference: PolygonNodeTopology.IsInteriorSegment)."""
    a_lo, a_hi = a0, a1
    interior_between = True
    if _is_angle_greater(node_pt, a_lo, a_hi):
        a_lo, a_hi = a1, a0
        interior_between = False
    between = _is_between(node_pt, b, a_lo, a_hi)
    return between == interior_between


def _triangle_contains(a, b, c, p) -> bool:
    """Inclusive point-in-triangle (reference: Triangle.Intersects)."""
    sa = alg.orient2d(a[0], a[1], b[0], b[1], c[0], c[1])
    exterior = -1 if sa > 0 else 1
    if _orient(a, b, p) == exterior:
        return False
    if _orient(b, c, p) == exterior:
        return False
    if _orient(c, a, p) == exterior:
        return False
    return True


# ---------------------------------------------------------------------------
# hole joining (reference: PolygonHoleJoiner.cs)


def _ring_oriented(arr: np.ndarray, cw: bool):
    pts = [(float(x), float(y)) for x, y in arr]
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    is_cw = alg.ring_signed_area(np.asarray(pts)) < 0
    if is_cw != cw:
        pts = pts[::-1]
    return pts


def join_holes(rings) -> list:
    """Join hole rings into the shell with cut lines; returns the joined
    closed ring (CW shell, CCW holes — reference: PolygonHoleJoiner.Join).
    Assumes rings only touch at vertices (the reference additionally nodes
    segment-interior touches via PolygonNoder)."""
    shell = _ring_oriented(rings[0], cw=True)
    holes = [_ring_oriented(h, cw=False) for h in rings[1:]]
    # sort by envelope (minx, miny, maxx, maxy)
    holes.sort(
        key=lambda h: (
            min(p[0] for p in h),
            min(p[1] for p in h),
            max(p[0] for p in h),
            max(p[1] for p in h),
        )
    )
    joined = list(shell)
    if not holes:
        return joined
    joined_pts = set(joined)
    # segments of the full boundary, for cut-line interior-intersection tests
    boundary_segs = []
    for ring in [shell] + holes:
        for i in range(len(ring) - 1):
            boundary_segs.append((ring[i], ring[i + 1]))

    def intersects_boundary(p0, p1) -> bool:
        minx, maxx = min(p0[0], p1[0]), max(p0[0], p1[0])
        miny, maxy = min(p0[1], p1[1]), max(p0[1], p1[1])
        for q0, q1 in boundary_segs:
            if max(q0[0], q1[0]) < minx or min(q0[0], q1[0]) > maxx:
                continue
            if max(q0[1], q1[1]) < miny or min(q0[1], q1[1]) > maxy:
                continue
            kind, pts = alg.segment_intersection(p0, p1, q0, q1)
            if kind == "none":
                continue
            if kind == "point":
                p = (float(pts[0][0]), float(pts[0][1]))
                # endpoint-only contacts are allowed
                if p in (p0, p1) and p in (q0, q1):
                    continue
                return True
            return True  # collinear overlap
        return False

    def find_join_index(join_coord, hole_join_coord) -> int:
        for i in range(len(joined) - 1):
            if joined[i] == join_coord:
                prev_pt = joined[i - 1 if i > 0 else len(joined) - 2]
                next_pt = joined[i + 1]
                if is_interior_segment(join_coord, prev_pt, next_pt, hole_join_coord):
                    return i
        raise ValueError("unable to find shell join index with interior join line")

    def add_joined_hole(join_index, hole, hole_join_index) -> None:
        join_pt = joined[join_index]
        hole_join_pt = hole[hole_join_index]
        vertex_touch = join_pt == hole_join_pt
        section = []
        if not vertex_touch:
            section.append(hole_join_pt)
        hole_size = len(hole) - 1
        idx = hole_join_index
        for _ in range(hole_size):
            idx = (idx + 1) % hole_size
            section.append(hole[idx])
        if not vertex_touch:
            section.append(join_pt)
        joined[join_index + 1 : join_index + 1] = section
        joined_pts.update(section)

    for hole in holes:
        # touching hole: a hole vertex already on the joined ring
        touch_idx = next(
            (i for i in range(len(hole) - 1) if hole[i] in joined_pts), -1
        )
        if touch_idx >= 0:
            join_pt = hole[touch_idx]
            hole_seg_pt = hole[touch_idx - 1 if touch_idx > 0 else len(hole) - 2]
            join_index = find_join_index(join_pt, hole_seg_pt)
            add_joined_hole(join_index, hole, touch_idx)
            continue
        # non-touching: cut from the hole's lowest-left vertex to a visible
        # joined-ring vertex found by scanning down from the one just above
        hole_join_index = min(
            range(len(hole) - 1), key=lambda i: hole[i]
        )
        hole_join = hole[hole_join_index]
        ordered = sorted(joined_pts)
        import bisect

        k = bisect.bisect_right(ordered, hole_join)
        while k < len(ordered) and ordered[k][0] == hole_join[0]:
            k += 1
        k -= 1
        join_coord = None
        while k >= 0:
            cand = ordered[k]
            if not intersects_boundary(hole_join, cand):
                join_coord = cand
                break
            k -= 1
        if join_coord is None:
            raise ValueError("unable to find joinable vertex")
        join_index = find_join_index(join_coord, hole_join)
        add_joined_hole(join_index, hole, hole_join_index)
    return joined


# ---------------------------------------------------------------------------
# ear clipping (reference: PolygonEarClipper.cs)


def ear_clip(shell_ring: list, skip_flat: bool = False) -> list[Tri]:
    """Ear-clip a CW closed ring (possibly self-touching from hole
    joining) into Tri triangles."""
    vertex = list(shell_ring)
    size = len(vertex) - 1
    nxt = list(range(1, size)) + [0]
    first_ref = [0]
    removed = [False] * size

    def next_index(i):
        return nxt[i]

    corner = [0, 1, 2]

    def find_intersecting_vertex(apex_index, c0, c1, c2):
        dup_apex = -1
        minx = min(c0[0], c1[0], c2[0])
        maxx = max(c0[0], c1[0], c2[0])
        miny = min(c0[1], c1[1], c2[1])
        maxy = max(c0[1], c1[1], c2[1])
        for vi in range(size):
            if vi == apex_index or removed[vi]:
                continue
            v = vertex[vi]
            if not (minx <= v[0] <= maxx and miny <= v[1] <= maxy):
                continue
            if v == c1:
                dup_apex = vi
            elif v == c0 or v == c2:
                continue
            elif _triangle_contains(c0, c1, c2, v):
                return vi
        return dup_apex

    def is_valid_ear_scan(apex_index, c0, c1, c2):
        corner_angle = _angle_between_oriented(c0, c1, c2)
        first = first_ref[0]
        curr = next_index(first)
        v_prev = vertex[first]
        for _ in range(size_live[0]):
            v = vertex[curr]
            if curr != apex_index and v == c1:
                v_next = vertex[next_index(curr)]
                a_out = _angle_between_oriented(c0, c1, v_next)
                a_in = _angle_between_oriented(c0, c1, v_prev)
                if 0 < a_out < corner_angle:
                    return False
                if 0 < a_in < corner_angle:
                    return False
                if a_out == 0 and a_in == corner_angle:
                    return False
            v_prev = v
            curr = next_index(curr)
        return True

    size_live = [size]
    tris: list[Tri] = []
    scan_count = 0
    while True:
        c0, c1, c2 = (vertex[corner[0]], vertex[corner[1]], vertex[corner[2]])
        convex = _orient(c0, c1, c2) == -1  # CW corner of a CW ring
        if not convex:
            invalid = c1 == c0 or c1 == c2 or c0 == c2
            flat = skip_flat and _orient(c0, c1, c2) == 0
            if invalid or flat:
                _remove_corner(corner, nxt, removed, size_live, first_ref)
            scan_count += 1
            if scan_count > 2 * size_live[0] + 4:
                raise ValueError("unable to find a convex corner")
        else:
            apex = corner[1]
            hit = find_intersecting_vertex(apex, c0, c1, c2)
            valid = hit == -1 or (
                vertex[hit] == c1 and is_valid_ear_scan(apex, c0, c1, c2)
            )
            if valid:
                tris.append(Tri(c0, c1, c2))
                _remove_corner(corner, nxt, removed, size_live, first_ref)
                scan_count = 0
        if scan_count > 2 * size_live[0] + 4:
            raise ValueError("unable to find a valid ear")
        if size_live[0] < 3:
            return tris
        # advance (even after ear removal: fewer skinny triangles)
        corner[0] = next_index(corner[0])
        corner[1] = next_index(corner[0])
        corner[2] = next_index(corner[1])


def _remove_corner(corner, nxt, removed, size_live, first_ref) -> None:
    apex = corner[1]
    if first_ref[0] == apex:
        first_ref[0] = nxt[apex]
    nxt[corner[0]] = nxt[apex]
    removed[apex] = True
    nxt[apex] = apex  # mark; never followed again
    size_live[0] -= 1
    corner[1] = nxt[corner[0]]
    corner[2] = nxt[corner[1]]


# ---------------------------------------------------------------------------
# Delaunay improvement (reference: TriDelaunayImprover.cs)


def improve_delaunay(tris: list[Tri]) -> None:
    for _ in range(200):
        improved = 0
        for tri in list(tris):
            for j in range(3):
                if _improve_non_delaunay(tri, j):
                    improved += 1
        if improved == 0:
            return


def _improve_non_delaunay(tri: Tri, index: int) -> bool:
    tri1 = tri.adj[index]
    if tri1 is None:
        return False
    index1 = tri1.index_of_tri(tri)
    adj0 = tri.p[index]
    adj1 = tri.p[_next(index)]
    opp0 = tri.p[_opp_vertex(index)]
    opp1 = tri1.p[_opp_vertex(index1)]
    # flip only if the quadrilateral is convex
    if _orient(opp0, adj0, opp1) != _orient(opp1, adj1, opp0):
        return False
    if _is_delaunay(adj0, adj1, opp0, opp1):
        return False
    tri.flip(index)
    return True


def _is_delaunay(adj0, adj1, opp0, opp1) -> bool:
    if _in_circle_pts(adj0, adj1, opp0, opp1):
        return False
    if _in_circle_pts(adj1, adj0, opp1, opp0):
        return False
    return True


def _in_circle_pts(a, b, c, p) -> bool:
    # reference IsInCircle(a,b,c,p) = IsInCircleRobust(a, c, b, p)
    return (
        _in_circle(a[0], a[1], c[0], c[1], b[0], b[1], p[0], p[1]) > 0
    )


# ---------------------------------------------------------------------------
# public API


def _triangulate_rings(rings, delaunay: bool) -> list[Tri]:
    shell = join_holes(rings)
    tris = ear_clip(shell)
    if delaunay:
        build_triangulation(tris)
        improve_delaunay(tris)
    return tris


def _triangulate(g: Geom, delaunay: bool) -> Geom:
    polys = [c for c in g.flatten() if c.gtype == POLYGON and not c.is_empty]
    out = []
    for poly in polys:
        for t in _triangulate_rings(poly.data, delaunay):
            ring = np.array([t.p[0], t.p[1], t.p[2], t.p[0]], dtype=np.float64)
            out.append(Geom(POLYGON, [ring]))
    return Geom(GEOMETRYCOLLECTION, out)


def polygon_triangulate(g: Geom) -> Geom:
    """Ear-clipping triangulation (reference: PolygonTriangulator.cs:22)."""
    return _triangulate(g, delaunay=False)


def constrained_delaunay(g: Geom) -> Geom:
    """Constrained Delaunay triangulation (reference:
    ConstrainedDelaunayTriangulator.cs:18)."""
    return _triangulate(g, delaunay=True)
