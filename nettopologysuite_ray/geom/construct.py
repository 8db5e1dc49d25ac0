"""Constructive multi-row operators: minimum clearance, polygonizer,
line merger/dissolver — the graph-flavoured operators of SURVEY.md §2.7.

* minimum_clearance — reference: Precision/MinimumClearance.cs:80
  (min vertex-vertex distance + min vertex-to-nonincident-segment);
  empty/degenerate inputs → Double.MaxValue / LINESTRING EMPTY.
* polygonize — reference: Operation/Polygonize/Polygonizer.cs:35: node
  the linework, walk minimal CCW rings (faces), assign holes.
* merge_lines / dissolve_lines — Operation/Linemerge/LineMerger.cs:25,
  Dissolve/LineDissolver.cs:29.
"""

from __future__ import annotations

import math

import numpy as np

from . import algorithms as alg
from .types import GEOMETRYCOLLECTION, LINESTRING, POLYGON, Geom

DOUBLE_MAX = 1.7976931348623157e308


def minimum_clearance(g: Geom) -> tuple[float, Geom]:
    """(clearance, realizing 2-point LineString)."""
    pts = []
    segs = []
    for comp in g.flatten():
        cs = comp.coords_list()
        for arr in cs:
            for i in range(len(arr)):
                pts.append((float(arr[i, 0]), float(arr[i, 1])))
            for i in range(len(arr) - 1):
                segs.append(
                    (
                        (float(arr[i, 0]), float(arr[i, 1])),
                        (float(arr[i + 1, 0]), float(arr[i + 1, 1])),
                    )
                )
    uniq = list(dict.fromkeys(pts))
    best = None
    for i in range(len(uniq)):
        for j in range(i + 1, len(uniq)):
            d = math.hypot(uniq[i][0] - uniq[j][0], uniq[i][1] - uniq[j][1])
            if d > 0 and (best is None or d < best[0]):
                best = (d, uniq[i], uniq[j])
    for p in uniq:
        for s0, s1 in segs:
            if p == s0 or p == s1:
                continue
            d, cp = _point_seg(p, s0, s1)
            if d > 0 and (best is None or d < best[0]):
                best = (d, p, cp)
    if best is None:
        return DOUBLE_MAX, Geom.empty(LINESTRING)
    return best[0], Geom.linestring(np.array([best[1], best[2]]))


def _point_seg(p, a, b):
    ax, ay = a
    bx, by = b
    dx, dy = bx - ax, by - ay
    ll = dx * dx + dy * dy
    t = 0.0 if ll == 0 else max(0.0, min(1.0, ((p[0] - ax) * dx + (p[1] - ay) * dy) / ll))
    cx, cy = ax + t * dx, ay + t * dy
    return math.hypot(p[0] - cx, p[1] - cy), (cx, cy)


def polygonize(g: Geom, node: bool = False) -> Geom:
    """Faces of the linework → GC of polygons
    (reference: Operation/Polygonize/Polygonizer.cs:35 — input is assumed
    correctly noded; node=True self-nodes first, the repair-path variant)."""
    from .overlay import _Edges, _node_edges, _assemble_polygons

    # gather ALL segments (lines and rings alike) as linework
    segs = []
    for comp in g.flatten():
        for arr in comp.coords_list():
            for i in range(len(arr) - 1):
                if (arr[i] != arr[i + 1]).any():
                    segs.append(
                        (
                            (float(arr[i, 0]), float(arr[i, 1])),
                            (float(arr[i + 1, 0]), float(arr[i + 1, 1])),
                        )
                    )
    if not segs:
        return Geom.empty(GEOMETRYCOLLECTION)
    if node:
        pieces = _self_node(segs)
    else:
        # the reference's Polygonizer assumes correctly-noded input: build
        # the graph from given vertices only (un-noded crossings dangle)
        pieces = list({(min(p0, p1), max(p0, p1)) for p0, p1 in segs if p0 != p1})
    # prune dangles iteratively: edges with a degree-1 endpoint can never
    # bound a face (reference: Polygonizer dangle removal)
    while True:
        deg: dict = {}
        for p0, p1 in pieces:
            deg[p0] = deg.get(p0, 0) + 1
            deg[p1] = deg.get(p1, 0) + 1
        keep = [e for e in pieces if deg[e[0]] > 1 and deg[e[1]] > 1]
        if len(keep) == len(pieces):
            break
        pieces = keep
    if not pieces:
        return Geom.empty(GEOMETRYCOLLECTION)
    # both directions of every piece; minimal CCW rings are faces
    directed = []
    for p0, p1 in pieces:
        directed.append((p0, p1))
        directed.append((p1, p0))
    polys = _assemble_polygons(directed)
    out = [Geom(POLYGON, rings) for rings in polys]
    return Geom(GEOMETRYCOLLECTION, out)


def _self_node(segs):
    splits = [[] for _ in segs]
    for i in range(len(segs)):
        for j in range(i + 1, len(segs)):
            kind, pts = alg.segment_intersection(segs[i][0], segs[i][1], segs[j][0], segs[j][1])
            if kind == "none":
                continue
            for p in pts:
                p = (float(p[0]), float(p[1]))
                if p != segs[i][0] and p != segs[i][1]:
                    splits[i].append(p)
                if p != segs[j][0] and p != segs[j][1]:
                    splits[j].append(p)
    out = set()
    for i, (p0, p1) in enumerate(segs):
        cut = sorted({p0, p1} | set(splits[i]), key=lambda q: (abs(q[0] - p0[0]), abs(q[1] - p0[1])))
        for k in range(len(cut) - 1):
            a, b = cut[k], cut[k + 1]
            if a != b:
                out.add((min(a, b), max(a, b)))
    return list(out)
