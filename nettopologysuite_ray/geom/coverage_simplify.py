"""Coverage-aware simplification (reference: Coverage/CoverageSimplifier.cs:48,
CoverageRingEdges.cs, TPVWSimplifier.cs) and plain Visvalingam-Whyatt
simplification (reference: Simplify/VWSimplifier.cs:29,
VWLineSimplifier.cs).

A polygonal coverage is decomposed into EDGES - maximal ring sections
between nodes, where a node is a vertex shared by >= 3 rings or a vertex
where a ring transitions between the coverage's outer boundary and an
inner (shared) boundary.  Each shared edge exists ONCE, so simplifying
the edges and rebuilding the rings keeps neighbouring polygons
bit-identical along their common border (edge-consistent, the defining
coverage property).

Edges are simplified with topology-preserving Visvalingam-Whyatt: the
corner of smallest triangle area is removed while area <= tol^2, unless
removing it would capture another vertex inside the corner triangle or
make the new chord cross existing linework.
"""

from __future__ import annotations

import numpy as np

from . import algorithms as alg
from .types import MULTIPOLYGON, POLYGON, Geom


def simplify_vw(g: Geom, tol: float) -> Geom:
    """Visvalingam-Whyatt simplification (reference: Simplify/VWSimplifier.cs:29):
    repeatedly drop the vertex whose corner triangle has the smallest
    area while that area <= tol^2."""
    t = g.gtype
    if t in ("Point", "MultiPoint") or g.is_empty:
        return g
    if t == "LineString":
        return Geom("LineString", _vw_chain(g.data, tol * tol, min_size=2), tag=g.tag)
    if t == "Polygon":
        rings = []
        for ri, r in enumerate(g.data):
            rr = _vw_chain(r, tol * tol, min_size=4, is_ring=True)
            if len(rr) >= 4 or ri == 0:
                rings.append(rr)
        if len(rings[0]) < 4:
            return Geom.empty(POLYGON)
        return Geom(POLYGON, rings)
    if t == "MultiLineString":
        return Geom("MultiLineString", [_vw_chain(ls, tol * tol, 2) for ls in g.data])
    if t == "MultiPolygon":
        parts = []
        for rings in g.data:
            p = simplify_vw(Geom(POLYGON, rings), tol)
            if not p.is_empty:
                parts.append(p.data)
        if not parts:
            return Geom.empty(MULTIPOLYGON)
        if len(parts) == 1:
            return Geom(POLYGON, parts[0])
        return Geom(MULTIPOLYGON, parts)
    return Geom("GeometryCollection", [simplify_vw(c, tol) for c in g.data])


def _tri_area(a, b, c) -> float:
    return abs((b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])) / 2.0


def _vw_chain(arr: np.ndarray, area_tol: float, min_size: int, is_ring: bool = False) -> np.ndarray:
    pts = [tuple(p) for p in arr]
    changed = True
    while changed and len(pts) > min_size:
        changed = False
        best_i = -1
        best_a = None
        for i in range(1, len(pts) - 1):
            a = _tri_area(pts[i - 1], pts[i], pts[i + 1])
            if a <= area_tol and (best_a is None or a < best_a):
                best_a = a
                best_i = i
        if best_i >= 0:
            del pts[best_i]
            changed = True
    if is_ring and len(pts) > min_size:
        # ring endpoint corner (last-1, endpoint, 1)
        while len(pts) > min_size and _tri_area(pts[-2], pts[0], pts[1]) <= area_tol:
            pts = pts[1:-1] + [pts[1]]
            if len(pts) < min_size:
                break
    return np.array(pts, dtype=np.float64)


# ---------------------------------------------------------------------------
# coverage simplification


def coverage_simplify(geoms, tol: float, inner_only: bool = False):
    """Simplify a polygonal coverage edge-consistently (reference:
    Coverage/CoverageSimplifier.cs Simplify/SimplifyInner).  Returns a new
    list of geometries in the same order; shared borders remain identical
    between neighbours.  inner_only keeps the coverage's outer boundary
    exact and simplifies only interior (shared) edges."""
    rings = []  # (owner: (gi, pi, ri), pts list)
    layout = []  # per input geom: list of list of ring indexes
    for gi, g in enumerate(geoms):
        polys = []
        comps = [g] if g.gtype == POLYGON else list(g.flatten())
        for pi, comp in enumerate(comps):
            if comp.gtype != POLYGON:
                raise ValueError("coverage must be polygonal")
            ridx = []
            for r in comp.data:
                pts = [tuple(p) for p in r]
                if pts[0] != pts[-1]:
                    pts.append(pts[0])
                ridx.append(len(rings))
                rings.append(pts)
            polys.append(ridx)
        layout.append(polys)

    # vertex -> number of distinct rings using it; undirected segment ->
    # number of rings (1 = coverage outer boundary, 2 = shared border)
    vring: dict = {}
    segcnt: dict = {}
    for rid, pts in enumerate(rings):
        for p in set(pts[:-1]):
            vring[p] = vring.get(p, 0) + 1
        for i in range(len(pts) - 1):
            k = (min(pts[i], pts[i + 1]), max(pts[i], pts[i + 1]))
            segcnt[k] = segcnt.get(k, 0) + 1

    def is_boundary(p0, p1) -> bool:
        return segcnt.get((min(p0, p1), max(p0, p1)), 0) == 1

    nodes = {p for p, c in vring.items() if c >= 3}
    for pts in rings:
        n = len(pts) - 1
        for i in range(n):
            # at i=0 the true previous vertex is pts[n-1]; pts[-1] is the
            # closing duplicate of pts[0] (a degenerate segment) and would
            # make every ring-start vertex a spurious node
            prev_b = is_boundary(pts[(i - 1) % n], pts[i])
            next_b = is_boundary(pts[i], pts[i + 1])
            if prev_b != next_b:
                nodes.add(pts[i])  # boundary/inner transition vertex

    # split rings into edges at nodes; shared edges stored once
    edge_map: dict = {}   # canonical key -> edge index
    edges = []            # dicts: pts, ring_count, free_ring
    ring_edges = []       # per ring: list of (edge_idx, forward)

    def edge_key(pts):
        rev = list(reversed(pts))
        return tuple(min(pts, rev))

    def add_edge(pts, free=False):
        key = edge_key(pts)
        if key in edge_map:
            ei = edge_map[key]
            edges[ei]["ring_count"] += 1
            forward = tuple(pts) == tuple(edges[ei]["pts"])
            return ei, forward
        edge_map[key] = len(edges)
        edges.append({"pts": list(pts), "ring_count": 1, "free": free})
        return len(edges) - 1, True

    for pts in rings:
        n = len(pts) - 1
        node_idx = [i for i in range(n) if pts[i] in nodes]
        elist = []
        if not node_idx:
            ei, fwd = add_edge(pts, free=True)  # whole ring is one free edge
            elist.append((ei, fwd))
        else:
            order = node_idx + [node_idx[0] + n]
            for a, b in zip(order, order[1:]):
                seq = [pts[k % n] for k in range(a, b + 1)]
                ei, fwd = add_edge(seq)
                elist.append((ei, fwd))
        ring_edges.append(elist)

    # simplify each edge with TPVW against the LIVE vertex set of all edges
    area_tol = tol * tol

    def all_other_vertices(skip_ei):
        arrs = []
        for ej, e in enumerate(edges):
            if ej == skip_ei:
                continue
            pts = e["new"] if "new" in e else e["pts"]
            if pts:
                arrs.append(np.asarray(pts, dtype=np.float64))
        if not arrs:
            return np.empty((0, 2), dtype=np.float64)
        return np.concatenate(arrs)

    for ei, e in enumerate(edges):
        pts = list(e["pts"])
        if inner_only and e["ring_count"] < 2:
            e["new"] = pts
            continue
        free = e["free"]
        min_size = 4 if free else 2
        guard = all_other_vertices(ei)
        changed = True
        while changed and len(pts) > min_size:
            changed = False
            best = None
            for i in range(1, len(pts) - 1):
                a = _tri_area(pts[i - 1], pts[i], pts[i + 1])
                if a <= area_tol and (best is None or a < best[0]):
                    if _corner_clear(pts, i, guard):
                        best = (a, i)
            if best is not None:
                del pts[best[1]]
                changed = True
        e["new"] = pts

    # rebuild rings and geometries
    out_geoms = []
    for gi, polys in enumerate(layout):
        new_polys = []
        for ridx in polys:
            new_rings = []
            for k, rid in enumerate(ridx):
                chain = []
                for ei, fwd in ring_edges[rid]:
                    seq = edges[ei]["new"] if fwd else list(reversed(edges[ei]["new"]))
                    if chain:
                        seq = seq[1:]
                    chain.extend(seq)
                if chain[0] != chain[-1]:
                    chain.append(chain[0])
                arr = np.array(chain, dtype=np.float64)
                if len(arr) >= 4:
                    new_rings.append(arr)
                elif k == 0:
                    new_rings.append(arr)  # degenerate shell kept for position
            new_polys.append(new_rings)
        src = geoms[gi]
        if src.gtype == POLYGON:
            out_geoms.append(Geom(POLYGON, new_polys[0]))
        else:
            out_geoms.append(Geom(MULTIPOLYGON, new_polys))
    return out_geoms


def _corner_clear(pts, i, guard_xy) -> bool:
    """True if removing corner i keeps topology: no other vertex of the
    edge set lies inside (or on) the corner triangle (reference:
    TPVWSimplifier.Edge.IsRemovable / HasIntersectingVertex).  guard_xy is
    an (N,2) float array; candidates are bbox-filtered vectorized so only
    the (usually tiny) survivors pay the robust orientation test."""
    a, b, c = pts[i - 1], pts[i], pts[i + 1]
    minx = min(a[0], b[0], c[0])
    maxx = max(a[0], b[0], c[0])
    miny = min(a[1], b[1], c[1])
    maxy = max(a[1], b[1], c[1])

    def inside(p):
        if p[0] < minx or p[0] > maxx or p[1] < miny or p[1] > maxy:
            return False
        if p == a or p == b or p == c:
            return False
        d1 = alg.orient2d(a[0], a[1], b[0], b[1], p[0], p[1])
        d2 = alg.orient2d(b[0], b[1], c[0], c[1], p[0], p[1])
        d3 = alg.orient2d(c[0], c[1], a[0], a[1], p[0], p[1])
        neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
        pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
        return not (neg and pos)

    if len(guard_xy):
        m = (
            (guard_xy[:, 0] >= minx)
            & (guard_xy[:, 0] <= maxx)
            & (guard_xy[:, 1] >= miny)
            & (guard_xy[:, 1] <= maxy)
        )
        for p in guard_xy[m]:
            if inside((p[0], p[1])):
                return False
    for j, p in enumerate(pts):
        if j not in (i - 1, i, i + 1) and inside(p):
            return False
    return True
