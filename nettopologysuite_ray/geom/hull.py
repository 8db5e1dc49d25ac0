"""Concave hulls (reference: Algorithm/Hull/ConcaveHull.cs:57,
Algorithm/Hull/HullTri.cs, Algorithm/Hull/HullTriangulation.cs).

The hull is constructed by eroding border triangles of the Delaunay
triangulation of the points, largest first, while their "size" (longest
boundary edge sum, or circumradius for alpha shapes) exceeds the target
criterion — keeping the result a single connected polygon (optionally
with holes).
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from . import algorithms as alg
from .triangulate import delaunay_triangles
from .types import POLYGON, Geom


def _next(i: int) -> int:
    return (i + 1) % 3


def _prev(i: int) -> int:
    return (i + 2) % 3


class _Tri:
    """Triangle with edge adjacency (reference: Triangulate/Tri/Tri.cs).

    v = CCW vertex indexes; edge i = (v[i], v[i+1]); adj[i] = neighbor
    across edge i or None."""

    __slots__ = ("v", "adj", "size", "seq")

    def __init__(self, v, seq):
        self.v = list(v)
        self.adj = [None, None, None]
        self.size = 0.0
        self.seq = seq

    # -- topology ---------------------------------------------------------
    def index_of(self, other) -> int:
        for i in range(3):
            if self.adj[i] is other:
                return i
        return -1

    def num_adjacent(self) -> int:
        return sum(1 for a in self.adj if a is not None)

    def is_boundary(self, i: int) -> bool:
        return self.adj[i] is None

    def is_border(self) -> bool:
        return any(a is None for a in self.adj)

    def is_removed(self) -> bool:
        return self.num_adjacent() == 0

    def remove(self, live: set) -> None:
        for i in range(3):
            a = self.adj[i]
            if a is not None:
                a.adj[a.index_of(self)] = None
                self.adj[i] = None
        live.discard(self)

    def is_interior_vertex(self, index: int) -> bool:
        """Walk the triangle fan around vertex v[index]; interior iff the
        fan closes (reference: Tri.cs:590)."""
        curr, ci = self, index
        while True:
            a = curr.adj[ci]
            if a is None:
                return False
            ai = a.index_of(curr)
            curr = a
            ci = _next(ai)
            if curr is self:
                return True

    def adjacent2_vertex_index(self) -> int:
        if self.adj[0] is not None and self.adj[1] is not None:
            return 1
        if self.adj[1] is not None and self.adj[2] is not None:
            return 2
        if self.adj[2] is not None and self.adj[0] is not None:
            return 0
        return -1

    def is_connecting(self) -> bool:
        """Removal would split the hull into two polygons (the vertex
        shared by the two interior edges is on the boundary elsewhere)."""
        return not self.is_interior_vertex(self.adjacent2_vertex_index())

    def has_boundary_touch(self) -> bool:
        for i in range(3):
            if self.is_boundary(i) or self.is_boundary(_prev(i)):
                continue
            if not self.is_interior_vertex(i):
                return True
        return False

    # -- metrics ----------------------------------------------------------
    def edge_len(self, pts, i: int) -> float:
        a = pts[self.v[i]]
        b = pts[self.v[_next(i)]]
        return math.hypot(b[0] - a[0], b[1] - a[1])

    def longest_edge(self, pts) -> float:
        return max(self.edge_len(pts, i) for i in range(3))

    def boundary_len(self, pts) -> float:
        return sum(self.edge_len(pts, i) for i in range(3) if self.adj[i] is None)

    def circumradius(self, pts) -> float:
        a, b, c = (pts[self.v[i]] for i in range(3))
        ar = abs(
            (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
        ) / 2.0
        if ar == 0:
            return float("inf")
        la = math.hypot(b[0] - a[0], b[1] - a[1])
        lb = math.hypot(c[0] - b[0], c[1] - b[1])
        lc = math.hypot(a[0] - c[0], a[1] - c[1])
        return la * lb * lc / (4.0 * ar)

    def area(self, pts) -> float:
        a, b, c = (pts[self.v[i]] for i in range(3))
        return abs(
            (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
        ) / 2.0


def build_tri_mesh(tri_idx, pts):
    """Adjacency-linked triangle mesh from (i,j,k) CCW triples."""
    tris = [_Tri(t, s) for s, t in enumerate(sorted(tri_idx))]
    edge: dict = {}
    for t in tris:
        for i in range(3):
            k = (t.v[i], t.v[_next(i)])
            edge[k] = (t, i)
    for t in tris:
        for i in range(3):
            rev = (t.v[_next(i)], t.v[i])
            hit = edge.get(rev)
            if hit is not None:
                t.adj[i] = hit[0]
    return tris


PARAM_EDGE_LENGTH = 0
PARAM_ALPHA = 1


def concave_hull(
    g: Geom,
    max_edge_length: float | None = None,
    length_ratio: float | None = None,
    alpha: float | None = None,
    holes_allowed: bool = False,
) -> Geom:
    """Concave hull of the vertices of g (reference: ConcaveHull.cs:57).

    Exactly one criterion: max_edge_length (longest hull edge <= value),
    length_ratio in [0,1] (0 = max concaveness, 1 = convex hull), or
    alpha (alpha-shape: erode border tris with circumradius > alpha)."""
    if g.is_empty:
        return Geom.empty(POLYGON)
    criteria = PARAM_ALPHA if alpha is not None else PARAM_EDGE_LENGTH
    if length_ratio is not None and not (0 <= length_ratio <= 1):
        raise ValueError("length ratio must be in [0,1]")
    if length_ratio == 1 and not holes_allowed:
        # "a value of 1 produces the convex hull" (ConcaveHull.cs docs):
        # no triangle can erode, so skip the Delaunay build entirely —
        # the O(n log n) convex hull is the 100 TB-scale fast path
        return alg.convex_hull(g)

    tri_idx, pts = delaunay_triangles(g)
    if not tri_idx:
        return alg.convex_hull(g)
    tris = build_tri_mesh(tri_idx, pts)

    # initial sizes (ConcaveHull.SetSize over the full list)
    for t in tris:
        t.size = t.circumradius(pts) if criteria == PARAM_ALPHA else t.longest_edge(pts)

    if alpha is not None:
        max_size = alpha
    elif length_ratio is not None:
        max_size = _target_edge_length(tris, pts, length_ratio)
    else:
        max_size = float(max_edge_length)

    live = set(tris)
    _erode_border(tris, pts, live, max_size, criteria)
    if holes_allowed:
        _erode_holes(tris, pts, live, max_size, criteria)
    return _to_geometry(live, pts, holes_allowed)


def uniform_grid_edge_length(g: Geom) -> float:
    """reference: ConcaveHull.UniformGridEdgeLength."""
    ch = alg.convex_hull(g)
    n = len(g.all_coords())
    return math.sqrt(alg.area(ch) / max(n, 1))


def _target_edge_length(tris, pts, ratio: float) -> float:
    if ratio == 0:
        return 0.0
    mx = -1.0
    mn = -1.0
    for t in tris:
        for i in range(3):
            ln = t.edge_len(pts, i)
            if ln > mx:
                mx = ln
            if mn < 0 or ln < mn:
                mn = ln
    if ratio == 1:
        return 2 * mx
    return ratio * (mx - mn) + mn


def _queue_size(t, pts, criteria) -> float:
    return t.circumradius(pts) if criteria == PARAM_ALPHA else t.boundary_len(pts)


def _push_border(heap, t, pts, criteria, counter) -> None:
    """AddBorderTri: only single-boundary-edge tris (removal of others
    would isolate a vertex); size frozen at insert (larger first)."""
    if t is None or t.num_adjacent() != 2:
        return
    t.size = _queue_size(t, pts, criteria)
    heapq.heappush(heap, (-t.size, -t.area(pts), next(counter), t))


def _erode_border(tris, pts, live, max_size, criteria) -> None:
    import itertools

    counter = itertools.count()
    heap: list = []
    for t in tris:
        _push_border(heap, t, pts, criteria, counter)
    while heap:
        _, _, _, t = heapq.heappop(heap)
        if t.size < max_size:  # IsInHull
            break
        if t.num_adjacent() == 2 and not t.is_connecting():
            adjs = [a for a in t.adj if a is not None]
            t.remove(live)
            for a in adjs:
                _push_border(heap, a, pts, criteria, counter)


def _erode_holes(tris, pts, live, max_size, criteria) -> None:
    import itertools

    candidates = [
        t
        for t in live
        if t.size >= max_size and not t.is_border() and not t.has_boundary_touch()
    ]
    candidates.sort(key=lambda t: (-t.size, -t.area(pts), t.seq))
    counter = itertools.count()
    for hole in candidates:
        if hole.is_removed() or hole.is_border() or hole.has_boundary_touch():
            continue
        heap: list = []
        heapq.heappush(heap, (-hole.size, -hole.area(pts), next(counter), hole))
        while heap:
            _, _, _, t = heapq.heappop(heap)
            if t is not hole and t.size < max_size:
                break
            removable = t is hole or (
                t.num_adjacent() == 2 and not t.has_boundary_touch()
            )
            if removable:
                adjs = [a for a in t.adj if a is not None]
                t.remove(live)
                for a in adjs:
                    _push_border(heap, a, pts, criteria, counter)


def _to_geometry(live, pts, holes_allowed: bool) -> Geom:
    tris = sorted(live, key=lambda t: t.seq)
    if not tris:
        return Geom.empty(POLYGON)
    if not holes_allowed:
        ring = _trace_boundary(tris, pts)
        if ring is not None:
            return Geom(POLYGON, [ring])
    # holes present (or pinched boundary): union the triangle coverage
    from .extra import coverage_union

    polys = [
        Geom(POLYGON, [np.array([pts[t.v[0]], pts[t.v[1]], pts[t.v[2]], pts[t.v[0]]])])
        for t in tris
    ]
    return coverage_union(polys)


def _trace_boundary(tris, pts):
    """Chain the directed boundary edges (interior on the left for CCW
    tris) into the shell ring (reference: HullTriangulation.TraceBoundary).
    Returns None when the boundary is not one simple cycle."""
    nxt: dict = {}
    for t in tris:
        for i in range(3):
            if t.adj[i] is None:
                a, b = t.v[i], t.v[_next(i)]
                if a in nxt:
                    return None  # pinch: fall back to union
                nxt[a] = b
    if not nxt:
        return None
    start = min(nxt)
    chain = [start]
    cur = nxt[start]
    while cur != start:
        chain.append(cur)
        cur = nxt.get(cur)
        if cur is None or len(chain) > len(nxt):
            return None
    if len(nxt) != len(chain):
        return None  # multiple cycles
    chain.append(start)
    return np.array([pts[i] for i in chain], dtype=np.float64)


# ---------------------------------------------------------------------------
# ConcaveHullOfPolygons (reference: Algorithm/Hull/ConcaveHullOfPolygons.cs:48)


def concave_hull_of_polygons(
    g: Geom,
    max_edge_length: float | None = None,
    length_ratio: float | None = None,
    tight: bool = False,
    holes_allowed: bool = False,
    fill: bool = False,
) -> Geom:
    """Concave hull of a set of polygons: the gaps between the polygons and
    an enclosing frame are constrained-Delaunay triangulated, and border
    gap triangles longer than the target are eroded; the remaining fill is
    unioned with the input (reference: ConcaveHullOfPolygons.cs:48).
    fill=True returns only the fill area between the polygons."""
    from .extra import coverage_union
    from .polytri import _triangulate_rings

    if fill:
        tight = True
    polys = [c for c in g.flatten() if c.gtype == POLYGON and not c.is_empty]
    if not polys:
        return Geom.empty(POLYGON)
    shell_rings = [p.data[0] for p in polys]

    # frame: envelope expanded by 4 * diameter, input shells as holes
    allc = np.concatenate([r for r in shell_rings])
    minx, miny = allc.min(axis=0)
    maxx, maxy = allc.max(axis=0)
    diam = math.hypot(maxx - minx, maxy - miny)
    e = 4.0 * diam
    fx0, fy0, fx1, fy1 = minx - e, miny - e, maxx + e, maxy + e
    frame_ring = np.array(
        [[fx0, fy0], [fx1, fy0], [fx1, fy1], [fx0, fy1], [fx0, fy0]]
    )
    frame_corners = {(float(x), float(y)) for x, y in frame_ring[:-1]}
    tris = _triangulate_rings([frame_ring] + shell_rings, delaunay=True)

    def frame_vertex_index(t):
        for i in range(3):
            if t.p[i] in frame_corners:
                return i
        return -1

    if length_ratio is not None:
        max_edge_length = _cp_target_edge_length(tris, frame_vertex_index, length_ratio)
    max_len = float(max_edge_length)

    # remove frame tris; their non-frame neighbors start the border queue
    from collections import deque

    hull_tris = set()
    border_que: deque = deque()
    border_edge: dict = {}
    for t in tris:
        fi = frame_vertex_index(t)
        if fi >= 0:
            opp = t.adj[(fi + 1) % 3]  # OppEdge(vertex) = Next(vertex)
            if opp is not None and frame_vertex_index(opp) < 0:
                border_que.append(opp)
                border_edge[opp] = opp.index_of_tri(t)
        else:
            hull_tris.add(t)

    ring_vsets = [
        ({(float(x), float(y)) for x, y in r}) for r in shell_rings
    ]

    def touches_single_polygon(t):
        vs = set(t.p)
        return any(vs <= rv for rv in ring_vsets)

    def is_removable(t):
        if tight and touches_single_polygon(t):
            return True
        be = border_edge.get(t)
        if be is not None and t.edge_length(be) > max_len:
            return True
        return False

    def add_border_tris(t):
        for i in range(3):
            a = t.adj[i]
            if a is not None:
                border_que.append(a)
                border_edge[a] = a.index_of_tri(t)

    def remove_tri(t):
        t.remove()
        hull_tris.discard(t)
        border_edge.pop(t, None)

    def remove_border_tris():
        while border_que:
            t = border_que.popleft()
            if t not in hull_tris:
                continue
            if is_removable(t):
                add_border_tris(t)
                remove_tri(t)

    remove_border_tris()
    if holes_allowed:
        while True:
            seed = None
            for t in hull_tris:
                if any(t.adj[i] is None for i in range(3)):
                    continue  # border tri cannot seed a hole
                if any(
                    t.adj[i] is not None and t.edge_length(i) > max_len
                    for i in range(3)
                ):
                    seed = t
                    break
            if seed is None:
                break
            add_border_tris(seed)
            remove_tri(seed)
            remove_border_tris()

    tri_polys = [
        Geom(POLYGON, [np.array([t.p[0], t.p[1], t.p[2], t.p[0]], dtype=np.float64)])
        for t in sorted(hull_tris, key=lambda t: id(t))
    ]
    fill_geom = coverage_union(tri_polys) if tri_polys else Geom.empty(POLYGON)
    if fill:
        return fill_geom
    if fill_geom.is_empty:
        if len(polys) == 1:
            return polys[0]
        from .types import MULTIPOLYGON

        return Geom(MULTIPOLYGON, [p.data for p in polys])
    comps = [c for c in fill_geom.flatten() if c.gtype == POLYGON]
    return coverage_union(comps + polys)


def _cp_target_edge_length(tris, frame_vertex_index, ratio: float) -> float:
    if ratio == 0:
        return 0.0
    mx = -1.0
    mn = -1.0
    for t in tris:
        if frame_vertex_index(t) >= 0:
            continue
        for i in range(3):
            if t.adj[i] is None:
                continue
            ln = t.edge_length(i)
            if ln > mx:
                mx = ln
            if mn < 0 or ln < mn:
                mn = ln
    if ratio == 1:
        return 2 * mx
    return ratio * (mx - mn) + mn
