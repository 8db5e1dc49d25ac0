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

    # simplify each edge with TPVW against the LIVE vertex set of all edges.
    # One uniform grid indexes every edge vertex (the reference backs this
    # with VertexSequencePackedRtree per edge; TPVWSimplifier.cs): corner
    # clearance queries the grid instead of scanning all other edges, and
    # a liveness mask tracks removed vertices so later edges see earlier
    # edges' simplified state — same guard set as the O(E x V) scan.
    area_tol = tol * tol

    edge_gids = []
    gxy = []
    gedge = []
    for ei, e in enumerate(edges):
        ids = []
        for p in e["pts"]:
            ids.append(len(gxy))
            gxy.append(p)
            gedge.append(ei)
        edge_gids.append(ids)
    G = np.asarray(gxy, dtype=np.float64).reshape(-1, 2)
    gedge_arr = np.asarray(gedge, dtype=np.int64)
    galive = np.ones(len(G), dtype=bool)
    grid = _PointGrid(G)

    for ei, e in enumerate(edges):
        pts = list(e["pts"])
        gids = list(edge_gids[ei])
        if inner_only and e["ring_count"] < 2:
            e["new"] = pts
            continue
        free = e["free"]
        min_size = 4 if free else 2
        while len(pts) > min_size:
            arr = np.asarray(pts, dtype=np.float64)
            # corner areas for all interior vertices, same float ops as
            # _tri_area (elementwise IEEE -> identical candidate set)
            ax, ay = arr[:-2, 0], arr[:-2, 1]
            bx, by = arr[1:-1, 0], arr[1:-1, 1]
            cx, cy = arr[2:, 0], arr[2:, 1]
            areas = np.abs((bx - ax) * (cy - ay) - (cx - ax) * (by - ay)) / 2.0
            cand = np.flatnonzero(areas <= area_tol)
            if len(cand) == 0:
                break
            # ascending (area, index): first clear corner == the old
            # "min-area corner passing clearance" choice, tie -> lowest i
            order = cand[np.argsort(areas[cand], kind="stable")]
            removed = False
            for ci in order:
                i = int(ci) + 1
                if _corner_clear_indexed(
                    pts, arr, i, grid, G, galive, gedge_arr, ei
                ):
                    galive[gids[i]] = False
                    del pts[i]
                    del gids[i]
                    removed = True
                    break
            if not removed:
                break
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


class _PointGrid:
    """CSR uniform grid over a static point set for bbox range queries
    (the VertexSequencePackedRtree role from TPVWSimplifier.cs:  O(k)
    per corner query instead of a scan of every edge vertex)."""

    def __init__(self, pts: np.ndarray, target_per_cell: int = 4):
        import math

        n = max(len(pts), 1)
        if len(pts) == 0:
            pts = np.zeros((1, 2))
        self.minx = float(pts[:, 0].min())
        self.miny = float(pts[:, 1].min())
        spanx = float(pts[:, 0].max()) - self.minx
        spany = float(pts[:, 1].max()) - self.miny
        self.spanx = spanx if spanx > 0 else 1.0
        self.spany = spany if spany > 0 else 1.0
        self.g = int(min(1024, max(1, math.sqrt(n / target_per_cell))))
        cx = np.clip(
            ((pts[:, 0] - self.minx) / self.spanx * self.g).astype(np.int64),
            0, self.g - 1,
        )
        cy = np.clip(
            ((pts[:, 1] - self.miny) / self.spany * self.g).astype(np.int64),
            0, self.g - 1,
        )
        cell = cx * self.g + cy
        self.order = np.argsort(cell, kind="stable").astype(np.int64)
        self.starts = np.searchsorted(
            cell[self.order], np.arange(self.g * self.g + 1)
        )

    def query(self, minx, miny, maxx, maxy) -> np.ndarray:
        g = self.g
        cx0 = min(max(int((minx - self.minx) / self.spanx * g), 0), g - 1)
        cx1 = min(max(int((maxx - self.minx) / self.spanx * g), 0), g - 1)
        cy0 = min(max(int((miny - self.miny) / self.spany * g), 0), g - 1)
        cy1 = min(max(int((maxy - self.miny) / self.spany * g), 0), g - 1)
        out = []
        for cx in range(cx0, cx1 + 1):
            base = cx * g
            s = self.starts[base + cy0]
            t = self.starts[base + cy1 + 1]
            if t > s:
                out.append(self.order[s:t])
        if not out:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(out)


def _pt_in_corner(p, a, b, c) -> bool:
    """Point strictly-or-on inside triangle abc (robust orientation);
    coordinate-equal to a corner vertex does not count."""
    if p == a or p == b or p == c:
        return False
    d1 = alg.orient2d(a[0], a[1], b[0], b[1], p[0], p[1])
    d2 = alg.orient2d(b[0], b[1], c[0], c[1], p[0], p[1])
    d3 = alg.orient2d(c[0], c[1], a[0], a[1], p[0], p[1])
    neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
    pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
    return not (neg and pos)


def _corner_clear_indexed(pts, arr, i, grid, G, galive, gedge, ei) -> bool:
    """True if removing corner i keeps topology: no live vertex of any
    other edge, and no other vertex of this edge, lies inside (or on) the
    corner triangle (reference: TPVWSimplifier.Edge.IsRemovable /
    HasIntersectingVertex)."""
    a, b, c = pts[i - 1], pts[i], pts[i + 1]
    minx = min(a[0], b[0], c[0])
    maxx = max(a[0], b[0], c[0])
    miny = min(a[1], b[1], c[1])
    maxy = max(a[1], b[1], c[1])

    rows = grid.query(minx, miny, maxx, maxy)
    if len(rows):
        rows = rows[galive[rows] & (gedge[rows] != ei)]
        for r in rows:
            px = G[r, 0]
            py = G[r, 1]
            if px < minx or px > maxx or py < miny or py > maxy:
                continue
            if _pt_in_corner((px, py), a, b, c):
                return False
    m = (
        (arr[:, 0] >= minx)
        & (arr[:, 0] <= maxx)
        & (arr[:, 1] >= miny)
        & (arr[:, 1] <= maxy)
    )
    m[i - 1 : i + 2] = False
    for j in np.flatnonzero(m):
        if _pt_in_corner(pts[j], a, b, c):
            return False
    return True
