"""Delaunay triangulation + Voronoi diagram.

Re-creates the semantics of the reference's triangulation API
(reference: Triangulate/DelaunayTriangulationBuilder.cs:14 — GC of
triangles; Triangulate/VoronoiDiagramBuilder.cs:28 — GC of cell polygons
clipped to an envelope) with a fresh Bowyer-Watson implementation using
the robust in-circle predicate (double filter + exact Fraction fallback,
mirroring the orientation kernel's strategy).
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

from . import algorithms as alg
from .types import GEOMETRYCOLLECTION, MULTILINESTRING, POLYGON, Geom


def _in_circle(ax, ay, bx, by, cx, cy, dx, dy) -> int:
    """>0 if d strictly inside the circumcircle of CCW triangle abc."""
    adx, ady = ax - dx, ay - dy
    bdx, bdy = bx - dx, by - dy
    cdx, cdy = cx - dx, cy - dy
    ad = adx * adx + ady * ady
    bd = bdx * bdx + bdy * bdy
    cd = cdx * cdx + cdy * cdy
    det = (
        adx * (bdy * cd - bd * cdy)
        - ady * (bdx * cd - bd * cdx)
        + ad * (bdx * cdy - bdy * cdx)
    )
    # conservative filter (Shewchuk-style permanent bound — the error of
    # the float det is proportional to the sum of |term| magnitudes, NOT
    # the product of point magnitudes); exact fallback when inconclusive
    permanent = (
        (abs(bdx * cdy) + abs(bdy * cdx)) * ad
        + (abs(cdx * ady) + abs(cdy * adx)) * bd
        + (abs(adx * bdy) + abs(ady * bdx)) * cd
    )
    if abs(det) > 1e-14 * permanent:
        return 1 if det > 0 else -1
    F = Fraction
    adx, ady = F(ax) - F(dx), F(ay) - F(dy)
    bdx, bdy = F(bx) - F(dx), F(by) - F(dy)
    cdx, cdy = F(cx) - F(dx), F(cy) - F(dy)
    ad = adx * adx + ady * ady
    bd = bdx * bdx + bdy * bdy
    cd = cdx * cdx + cdy * cdy
    det = (
        adx * (bdy * cd - bd * cdy)
        - ady * (bdx * cd - bd * cdx)
        + ad * (bdx * cdy - bdy * cdx)
    )
    return (det > 0) - (det < 0)


def delaunay_triangles(g: Geom) -> list[tuple[int, int, int]]:
    """Bowyer-Watson over the unique vertices; returns vertex-index triples
    (CCW) plus the point array via delaunay()."""
    pts = np.unique(g.all_coords(), axis=0)
    return _bowyer_watson(pts), pts


def _bowyer_watson(pts: np.ndarray):
    """Incremental Bowyer-Watson with adjacency: locate the containing
    triangle by walking from the last insertion (orientation tests), grow
    the cavity by BFS over neighbors (in-circle tests only on the cavity
    frontier), and re-link the star of new triangles.  Amortized ~O(1)
    tests per insertion instead of scanning every triangle."""
    n = len(pts)
    if n < 3:
        return []
    # super-triangle: vertices must be FAR outside every real circumcircle,
    # or hull slivers (near-collinear boundary points, circumradius up to
    # ~span/eps) connect to a super vertex instead and leave notches in the
    # traced hull.  1e20 x span dominates any circumradius representable
    # with float64 triangle areas; the in-circle/orientation filters stay
    # exact at these magnitudes.
    minx, miny = pts.min(axis=0)
    maxx, maxy = pts.max(axis=0)
    d = max(maxx - minx, maxy - miny, 1.0) * 1e20
    cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
    sp = np.array([[cx - 2 * d, cy - d], [cx + 2 * d, cy - d], [cx, cy + 2 * d]])
    P = np.vstack([pts, sp])

    # triangle store (all triangles CCW): vertices, neighbor across edge k
    # = (v[k], v[k+1]), liveness — plain Python lists (all per-insert ops
    # are scalar; numpy row indexing costs ~5x more here)
    T: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]  # CCW
    NB: list[list[int]] = [[-1, -1, -1]]
    alive = [True]
    free: list[int] = []

    Px = P[:, 0].tolist()
    Py = P[:, 1].tolist()

    def orient(a, b, px, py) -> int:
        # inline float filter (python floats, no numpy scalar overhead);
        # robust predicate only when inconclusive — identical decisions
        ax = Px[a]
        ay = Py[a]
        bx = Px[b]
        by = Py[b]
        det = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        bound = 1e-12 * (
            (abs(bx - ax) + abs(by - ay)) * (abs(py - ay) + abs(px - ax)) + 1e-300
        )
        if det > bound:
            return 1
        if det < -bound:
            return -1
        v = alg.orient2d(ax, ay, bx, by, px, py)
        return (v > 0) - (v < 0)

    def in_circle(t, px, py) -> int:
        a, b, c = T[t]
        return _in_circle(Px[a], Py[a], Px[b], Py[b], Px[c], Py[c], px, py)

    def first_alive() -> int:
        for k in range(len(T)):
            if alive[k]:
                return k
        return 0

    # walk-start cache: coarse grid cell -> a VERTEX seen there; vertices
    # never die, and v2t[vertex] is refreshed on every triangle creation,
    # so the walk starts one cell away at most.  (A triangle-valued cache
    # goes stale as soon as nearby insertions destroy the triangle.)
    # Insertion order stays lexicographic (np.unique) — deterministic.
    gridn = max(int(math.sqrt(n) / 2), 1)
    span_x = (maxx - minx) or 1.0
    span_y = (maxy - miny) or 1.0
    start_cache: dict[tuple[int, int], int] = {}
    v2t: dict[int, int] = {}

    def cell_of(px, py):
        gx = int((px - minx) / span_x * gridn)
        gy = int((py - miny) / span_y * gridn)
        return (min(max(gx, 0), gridn - 1), min(max(gy, 0), gridn - 1))

    last = 0
    for i in range(n):
        px = Px[i]
        py = Py[i]
        # -- locate: walk toward p ---------------------------------------
        cell = cell_of(px, py)
        t = -1
        sv = start_cache.get(cell)
        if sv is not None:
            t = v2t.get(sv, -1)
        if t < 0 or not alive[t]:
            t = last if alive[last] else first_alive()
        steps = 0
        limit = 4 * len(T) + 16
        while True:
            steps += 1
            if steps > limit:
                # degenerate walk cycle: fall back to a scan
                t = -1
                for cand in range(len(T)):
                    if not alive[cand]:
                        continue
                    a, b, c = T[cand]
                    if (
                        orient(a, b, px, py) >= 0
                        and orient(b, c, px, py) >= 0
                        and orient(c, a, px, py) >= 0
                    ):
                        t = cand
                        break
                break
            a, b, c = T[t]
            if orient(a, b, px, py) < 0:
                t = NB[t][0]
            elif orient(b, c, px, py) < 0:
                t = NB[t][1]
            elif orient(c, a, px, py) < 0:
                t = NB[t][2]
            else:
                break
            if t < 0:
                break
        if t < 0:
            continue  # outside the super-triangle: impossible, skip
        # -- cavity: BFS over neighbors of bad triangles ------------------
        if in_circle(t, px, py) <= 0:
            continue  # duplicate / degenerate point: no cavity
        bad = {t}
        stack = [t]
        while stack:
            cur = stack.pop()
            for nbt in NB[cur]:
                if nbt >= 0 and nbt not in bad and in_circle(nbt, px, py) > 0:
                    bad.add(nbt)
                    stack.append(nbt)
        # -- boundary edges (directed, cavity on the left) ----------------
        boundary = []  # (a, b, outside_tri)
        for cur in bad:
            tv = T[cur]
            nbs = NB[cur]
            for k in range(3):
                nbt = nbs[k]
                if nbt < 0 or nbt not in bad:
                    boundary.append((tv[k], tv[(k + 1) % 3], nbt))
        # -- retriangulate the star -------------------------------------
        for cur in bad:
            alive[cur] = False
            free.append(cur)
        edge_to_tri: dict = {}
        new_ids = []
        for a, b, outside in boundary:
            if free:
                tid = free.pop()
                T[tid] = (a, b, i)
                NB[tid] = [outside, -1, -1]
                alive[tid] = True
            else:
                tid = len(T)
                T.append((a, b, i))
                NB.append([outside, -1, -1])
                alive.append(True)
            v2t[a] = tid
            v2t[b] = tid
            v2t[i] = tid
            if outside >= 0:
                # fix the outside triangle's back-pointer
                ot = T[outside]
                for k in range(3):
                    if ot[k] == b and ot[(k + 1) % 3] == a:
                        NB[outside][k] = tid
                        break
            edge_to_tri[(a, b)] = tid
            new_ids.append(tid)
        # link new triangles to each other: edge (b, i) pairs with the new
        # triangle whose boundary edge starts at b (its edge (i, b))
        starts = {T[tid][0]: tid for tid in new_ids}
        for tid in new_ids:
            a, b, _ = T[tid]
            nxt = starts[b]  # new tri (b, c, i): shares edge (b, i)
            NB[tid][1] = nxt
            NB[nxt][2] = tid
        last = new_ids[0] if new_ids else t
        start_cache[cell] = i
    # drop super-triangle incident faces; orient CCW (already CCW)
    out = []
    for pos in range(len(T)):
        if not alive[pos]:
            continue
        a, b, c = T[pos]
        if a >= n or b >= n or c >= n:
            continue
        out.append((a, b, c))
    return out


def delaunay(g: Geom) -> Geom:
    """GC of triangle polygons (DelaunayTriangulationBuilder.GetTriangles)."""
    tris, pts = delaunay_triangles(g)
    polys = []
    for a, b, c in sorted(tris):
        ring = np.array([pts[a], pts[b], pts[c], pts[a]])
        polys.append(Geom(POLYGON, [ring]))
    return Geom(GEOMETRYCOLLECTION, polys)


def voronoi(g: Geom, clip_env=None) -> Geom:
    """GC of Voronoi cell polygons, clipped to an envelope (default: the
    input envelope expanded by 50% — VoronoiDiagramBuilder.ClipEnvelope
    semantics).  Cells are convex (intersections of half-planes), so the
    envelope clip is 4 more Sutherland-Hodgman passes — no noding engine
    in the per-site loop (scale path: O(sites x avg-degree) arithmetic)."""
    tris, pts = delaunay_triangles(g)
    if len(pts) == 0:
        return Geom.empty(GEOMETRYCOLLECTION)
    env = alg.envelope(g)
    if clip_env is None:
        w = (env[2] - env[0]) or 1.0
        h = (env[3] - env[1]) or 1.0
        clip_env = (env[0] - w / 2, env[1] - h / 2, env[2] + w / 2, env[3] + h / 2)
    x0, y0, x1, y1 = clip_env
    big = max(x1 - x0, y1 - y0) * 4
    # cell of site i: intersection of half-planes vs its Delaunay neighbors;
    # build from a big square clipped by each neighbor's bisector
    neighbors: dict = {}
    for a, b, c in tris:
        for u, v in ((a, b), (b, c), (c, a)):
            neighbors.setdefault(u, set()).add(v)
            neighbors.setdefault(v, set()).add(u)
    if not neighbors:
        # degenerate site sets (1 site, 2 sites, all collinear): every other
        # site is a neighbor — correct, just less pruned
        n_sites = len(pts)
        for i in range(n_sites):
            neighbors[i] = {j for j in range(n_sites) if j != i}
        if n_sites == 1:
            neighbors[0] = set()
    cells = []
    Px = pts[:, 0].tolist()
    Py = pts[:, 1].tolist()
    for i in sorted(neighbors):
        six = Px[i]
        siy = Py[i]
        ring = [
            (six - big, siy - big),
            (six + big, siy - big),
            (six + big, siy + big),
            (six - big, siy + big),
        ]
        for j in sorted(neighbors[i]):
            ring = _halfplane_clip(ring, six, siy, Px[j], Py[j])
            if len(ring) < 3:
                break
        if len(ring) < 3:
            continue
        clipped = _clip_rect(ring, x0, y0, x1, y1)
        if clipped is not None:
            cells.append(clipped)
    return Geom(GEOMETRYCOLLECTION, cells)


def _clip_rect(ring, x0, y0, x1, y1):
    """Clip a convex cell ring (open list of (x, y) tuples) to
    [x0,x1]x[y0,y1] (four half-plane passes); returns the closed Geom or
    None when the intersection is empty/degenerate."""
    for axis, bound, keep_le in ((0, x1, True), (0, x0, False),
                                 (1, y1, True), (1, y0, False)):
        out = []
        n = len(ring)
        if n == 0:
            return None
        for k in range(n):
            cur = ring[k]
            nxt = ring[(k + 1) % n]
            ci = cur[axis] <= bound if keep_le else cur[axis] >= bound
            ni = nxt[axis] <= bound if keep_le else nxt[axis] >= bound
            if ci:
                out.append(cur)
            if ci != ni:
                t = (bound - cur[axis]) / (nxt[axis] - cur[axis])
                if axis == 0:  # exact on the clip line
                    out.append((bound, cur[1] + t * (nxt[1] - cur[1])))
                else:
                    out.append((cur[0] + t * (nxt[0] - cur[0]), bound))
        ring = out
    if len(ring) < 3:
        return None
    arr = np.array(ring + [ring[0]])
    # drop consecutive duplicates introduced by corner-touching clips
    keep = np.ones(len(arr), dtype=bool)
    keep[1:] = (np.abs(arr[1:] - arr[:-1]).max(axis=1)) > 0
    arr = arr[keep]
    if len(arr) < 4 or (arr[0] != arr[-1]).any():
        if len(arr) >= 3 and (arr[0] != arr[-1]).any():
            arr = np.vstack([arr, arr[:1]])
        if len(arr) < 4:
            return None
    if alg.area(Geom(POLYGON, [arr])) <= 0:
        return None
    return Geom(POLYGON, [arr])


def _halfplane_clip(ring, px, py, qx, qy):
    """Clip a convex ring (open list of (x, y) tuples) to the half-plane of
    points closer to (px, py) than (qx, qy) — Sutherland-Hodgman against
    the perpendicular bisector.  Inside test: (v - mid) . (q - p) <= 0."""
    dx, dy = qx - px, qy - py
    if dx == 0 and dy == 0:
        return ring
    mx, my = (px + qx) / 2, (py + qy) / 2
    n = len(ring)
    vals = [(x - mx) * dx + (y - my) * dy for x, y in ring]
    out = []
    for k in range(n):
        k1 = k + 1 if k + 1 < n else 0
        cv = vals[k]
        nv = vals[k1]
        ci = cv <= 0
        if ci:
            out.append(ring[k])
        if ci != (nv <= 0):
            cur = ring[k]
            nxt = ring[k1]
            t = cv / (cv - nv)
            out.append((cur[0] + t * (nxt[0] - cur[0]),
                        cur[1] + t * (nxt[1] - cur[1])))
    return out


# ---------------------------------------------------------------------------
# conforming Delaunay (reference: Triangulate/ConformingDelaunayTriangulator.cs:33,
# ConformingDelaunayTriangulationBuilder.cs:14, NonEncroachingSplitPointFinder.cs,
# SplitSegment.cs)


def _split_point(p, q, enc, min_len_cap=None):
    """NonEncroachingSplitPointFinder.FindSplitPoint: project the
    encroaching point onto the segment, then keep the split at least
    min(0.8 * 2 * dist(proj, enc), |pq|/2) from the nearer endpoint."""
    px, py = p
    qx, qy = q
    ex, ey = enc
    dx, dy = qx - px, qy - py
    seg_len = math.hypot(dx, dy)
    if seg_len == 0:
        return p
    t = ((ex - px) * dx + (ey - py) * dy) / (seg_len * seg_len)
    proj = (px + t * dx, py + t * dy)
    non_encroach_diam = math.hypot(proj[0] - ex, proj[1] - ey) * 2 * 0.8
    min_len = min(non_encroach_diam, seg_len / 2)
    # SplitSegment.SplitAt(proj) with MinimumLength=min_len
    frac = min_len / seg_len
    if math.hypot(proj[0] - px, proj[1] - py) < min_len:
        return (px + frac * dx, py + frac * dy)
    if math.hypot(proj[0] - qx, proj[1] - qy) < min_len:
        return (qx - frac * (qx - px), qy - frac * (qy - py))
    return proj


def conforming_delaunay_points(sites: Geom, constraints: Geom, tolerance: float = 0.0):
    """Run the Gabriel-enforcement loop: split constraint segments until no
    site lies strictly inside any subsegment's diametral circle; returns
    the final unique point array (sites + constraint vertices + Steiner
    points).  The plain Delaunay of these points then contains every
    constraint (sub)segment (Gabriel edges are Delaunay edges)."""
    from .kdtree import KdTree

    kdt = KdTree(tolerance)
    site_pts = [
        (float(x), float(y)) for x, y in np.asarray(sites.all_coords())
    ]
    segs: list[tuple] = []
    seg_pts: list[tuple] = []
    if constraints is not None and not constraints.is_empty:
        for comp in constraints.flatten():
            arr = comp.all_coords()
            for i in range(len(arr)):
                seg_pts.append((float(arr[i, 0]), float(arr[i, 1])))
            if comp.gtype == "LineString":
                for i in range(len(arr) - 1):
                    segs.append(
                        (
                            (float(arr[i, 0]), float(arr[i, 1])),
                            (float(arr[i + 1, 0]), float(arr[i + 1, 1])),
                        )
                    )
    seg_pt_set = set(seg_pts)
    # sites first (excluding constraint vertices), then constraint vertices
    for p in site_pts:
        if p not in seg_pt_set:
            kdt.insert(p)
    for p in seg_pts:
        kdt.insert(p)

    def find_non_gabriel(p, q):
        mid = ((p[0] + q[0]) / 2.0, (p[1] + q[1]) / 2.0)
        r = math.hypot(p[0] - mid[0], p[1] - mid[1])
        env = (mid[0] - r, mid[1] - r, mid[0] + r, mid[1] + r)
        closest = None
        min_d = float("inf")
        for node in kdt.query(env):
            t = node.coordinate
            if t == p or t == q:
                continue
            d = math.hypot(mid[0] - t[0], mid[1] - t[1])
            if d < r and (closest is None or d < min_d):
                closest = t
                min_d = d
        return closest

    for _ in range(99):
        splits = 0
        new_segs = []
        keep = []
        for p, q in segs:
            enc = find_non_gabriel(p, q)
            if enc is None:
                keep.append((p, q))
                continue
            sp = _split_point(p, q, enc)
            node = kdt.insert(sp)
            sp = node.coordinate
            new_segs.append((p, sp))
            new_segs.append((sp, q))
            splits += 1
        segs = keep + new_segs
        if splits == 0:
            break
    else:
        raise ValueError("too many splitting iterations enforcing constraints")

    pts = [n.coordinate for n in kdt.query((-np.inf, -np.inf, np.inf, np.inf))]
    return np.array(sorted(set(pts)), dtype=np.float64)


def conforming_delaunay_edges(sites: Geom, constraints: Geom) -> Geom:
    """reference: ConformingDelaunayTriangulationBuilder.GetEdges."""
    pts = conforming_delaunay_points(sites, constraints)
    tris = _bowyer_watson(pts)
    edges = set()
    for a, b, c in tris:
        for e in ((a, b), (b, c), (c, a)):
            edges.add((min(e), max(e)))
    parts = [np.array([pts[i], pts[j]]) for i, j in sorted(edges)]
    return Geom(MULTILINESTRING, parts)


def conforming_delaunay_triangles(sites: Geom, constraints: Geom) -> Geom:
    """reference: ConformingDelaunayTriangulationBuilder.GetTriangles."""
    pts = conforming_delaunay_points(sites, constraints)
    tris = _bowyer_watson(pts)
    polys = []
    for a, b, c in sorted(tris):
        ring = np.array([pts[a], pts[b], pts[c], pts[a]])
        polys.append(Geom(POLYGON, [ring]))
    return Geom(GEOMETRYCOLLECTION, polys)
