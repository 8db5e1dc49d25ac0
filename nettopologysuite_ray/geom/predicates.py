"""DE-9IM relate engine + named spatial predicates.

Re-creates the semantics of the reference's relate operator
(reference: Operation/Relate/RelateOp.cs:26 over
GeometriesGraph/GeometryGraph.cs, modern Operation/RelateNG/RelateNG.cs:47;
matrix semantics Geometries/IntersectionMatrix.cs:45; predicate
definitions Geometries/Geometry.cs:683-1106; Mod2 boundary node rule
Algorithm/BoundaryNodeRule.cs:56) with a fresh "node-and-classify"
algorithm:

1. decompose each geometry into features: isolated points, line segments
   (from linework), ring segments (area boundaries), area interiors;
2. node every A segment against every B segment (robust orientation-based
   intersection, collinear overlaps tracked structurally);
3. classify each resulting piece midpoint / node point / area
   representative point against both geometries;
4. fill the 3x3 dimension matrix, then apply area-adjacency inference
   rules (a boundary point of a valid area always has interior points of
   that area arbitrarily close).

Self-location of pieces is STRUCTURAL (ring piece => Boundary, line piece
=> Interior, endpoint => Mod2 valence), never recomputed by floating
point location — only cross-geometry location uses the point locator.
"""

from __future__ import annotations

import numpy as np

from . import algorithms as alg
from .types import GEOMETRYCOLLECTION, LINESTRING, POINT, POLYGON, Geom

I, B, E = 0, 1, 2
F = -1

_DIM_CHAR = {-1: "F", 0: "0", 1: "1", 2: "2"}


def _is_boundary_valence(valence: int, rule: str) -> bool:
    """Boundary node rules (reference: Algorithm/BoundaryNodeRule.cs:56-81):
    mod2 (OGC SFS), endpoint, multivalent, monovalent."""
    if rule == "mod2":
        return valence % 2 == 1
    if rule == "endpoint":
        return valence > 0
    if rule == "multivalent":
        return valence > 1
    if rule == "monovalent":
        return valence == 1
    raise ValueError(f"unknown boundary node rule: {rule}")


class _Features:
    __slots__ = ("geom", "points", "segs", "seg_kind", "endpoint_valence", "polys", "dim", "empty", "rule")

    def __init__(self, g: Geom, rule: str = "mod2"):
        self.geom = g
        self.rule = rule
        self.points: list[tuple[float, float]] = []
        segs: list[tuple[float, float, float, float, int]] = []
        self.endpoint_valence: dict[tuple[float, float], int] = {}
        self.polys: list[Geom] = []
        for comp in g.flatten():
            t = comp.gtype
            if t == POINT:
                self.points.append((float(comp.data[0]), float(comp.data[1])))
            elif t == LINESTRING:
                ls = comp.data
                closed = len(ls) > 1 and (ls[0] == ls[-1]).all()
                for i2 in range(len(ls) - 1):
                    if (ls[i2] == ls[i2 + 1]).all():
                        continue  # zero-length
                    segs.append(
                        (float(ls[i2, 0]), float(ls[i2, 1]), float(ls[i2 + 1, 0]), float(ls[i2 + 1, 1]), 0)
                    )
                if len(ls) > 1:
                    # EVERY LineString registers both endpoints (a closed
                    # ring registers its start twice), exactly as
                    # GeometryGraph.AddLineString does.  NTS applies the
                    # rule INCREMENTALLY: boundaryCount = 1 + (1 if the
                    # stored location is already Boundary) — equivalent to
                    # valence parity for mod2 but NOT for the other rules
                    # (reference: GeometriesGraph/GeometryGraph.cs:411
                    # InsertBoundaryPoint).  Value True = boundary.
                    for p in (ls[0], ls[-1]):
                        k = (float(p[0]), float(p[1]))
                        bc = 1 + (1 if self.endpoint_valence.get(k) else 0)
                        self.endpoint_valence[k] = _is_boundary_valence(bc, rule)
            elif t == POLYGON:
                self.polys.append(comp)
                for ring in comp.data:
                    for i2 in range(len(ring) - 1):
                        if (ring[i2] == ring[i2 + 1]).all():
                            continue
                        segs.append(
                            (
                                float(ring[i2, 0]),
                                float(ring[i2, 1]),
                                float(ring[i2 + 1, 0]),
                                float(ring[i2 + 1, 1]),
                                1,
                            )
                        )
        self.segs = segs
        self.dim = g.dimension
        self.empty = g.is_empty

    def boundary_endpoints(self) -> set:
        """Line endpoints that are boundary under this geometry's rule."""
        return {p for p, v in self.endpoint_valence.items() if v}

    def locate_structural(self, pt: tuple, on_ring: bool, on_line: bool) -> int:
        """Location of a node in THIS geometry given structural knowledge of
        which of our features it lies on; falls back to the point locator
        only for nodes not on any of our segments (original vertices of the
        other geometry — exactly representable, robust)."""
        if on_ring:
            return B
        if on_line:
            if self.endpoint_valence:
                if pt in self.endpoint_valence:
                    return B if self.endpoint_valence[pt] else I
            return I
        if pt in self.endpoint_valence:
            return B if self.endpoint_valence[pt] else I
        for p in self.points:
            if p == pt:
                return I
        return alg.locate_in_geom(pt[0], pt[1], self.geom)


def relate(a: Geom, b: Geom, rule: str = "mod2") -> str:
    """rule selects the BoundaryNodeRule variant: "mod2" (OGC SFS,
    default), "endpoint", "multivalent", "monovalent" (reference:
    Algorithm/BoundaryNodeRule.cs:56-81, RelateOp.Relate(g1,g2,bnRule)).

    Transpose symmetry: relate(a, b) equals the transpose of
    relate(b, a) except for SUB-ULP-DEGENERATE pairs — edges of the two
    operands nearly coincident within a few ulp at large coordinate
    magnitudes — where the true matrix depends on geometry below float
    resolution and node rounding (whose 1-ulp placement follows operand
    order, see segment_intersection) legitimately decides between two
    answers.  Canonicalizing operand order here would force symmetry
    but flips two TestRelateAA-big reference matrices whose expected
    values encode the operand-order convention; conformance wins (the
    relate-transpose fuzz documents the exception, seed 202901 @ +1e7,
    and asserts the asymmetry vanishes once coordinates are snapped out
    of the ambiguity band)."""
    fa = _Features(a, rule)
    fb = _Features(b, rule)
    M = [[F, F, F], [F, F, F], [F, F, 2]]

    def bump(r, c, d):
        if d > M[r][c]:
            M[r][c] = d

    # ---- node A segments against B segments (and vice versa) -------------
    nodes: dict[tuple, list] = {}  # pt -> [on_a_ring, on_a_line, on_b_ring, on_b_line]

    def note(pt, ar=False, al=False, br=False, bl=False):
        e = nodes.setdefault(pt, [False, False, False, False])
        e[0] |= ar
        e[1] |= al
        e[2] |= br
        e[3] |= bl

    # precompute B segment arrays for bbox filtering
    sb = np.asarray([s[:4] for s in fb.segs], dtype=np.float64).reshape(-1, 4)
    sa = np.asarray([s[:4] for s in fa.segs], dtype=np.float64).reshape(-1, 4)

    # splits[i] = per-A-seg list of (t, pt); overlaps[i] = list of (t0,t1,b_kind)
    a_splits: list[list] = [[] for _ in fa.segs]
    b_splits: list[list] = [[] for _ in fb.segs]
    a_overlap: list[list] = [[] for _ in fa.segs]
    b_overlap: list[list] = [[] for _ in fb.segs]

    if len(sa) and len(sb):
        aminx = np.minimum(sa[:, 0], sa[:, 2])[:, None]
        amaxx = np.maximum(sa[:, 0], sa[:, 2])[:, None]
        aminy = np.minimum(sa[:, 1], sa[:, 3])[:, None]
        amaxy = np.maximum(sa[:, 1], sa[:, 3])[:, None]
        bminx = np.minimum(sb[:, 0], sb[:, 2])[None, :]
        bmaxx = np.maximum(sb[:, 0], sb[:, 2])[None, :]
        bminy = np.minimum(sb[:, 1], sb[:, 3])[None, :]
        bmaxy = np.maximum(sb[:, 1], sb[:, 3])[None, :]
        cand = (aminx <= bmaxx) & (amaxx >= bminx) & (aminy <= bmaxy) & (amaxy >= bminy)
        for ia, ib in zip(*np.nonzero(cand)):
            s1 = fa.segs[ia]
            s2 = fb.segs[ib]
            kind, pts = alg.segment_intersection(
                (s1[0], s1[1]), (s1[2], s1[3]), (s2[0], s2[1]), (s2[2], s2[3])
            )
            if kind == "none":
                continue
            a_is_ring = s1[4] == 1
            b_is_ring = s2[4] == 1
            if kind == "point":
                pt = (float(pts[0][0]), float(pts[0][1]))
                note(pt, ar=a_is_ring, al=not a_is_ring, br=b_is_ring, bl=not b_is_ring)
                a_splits[ia].append(_param(s1, pt))
                b_splits[ib].append(_param(s2, pt))
            else:  # overlap
                p0 = (float(pts[0][0]), float(pts[0][1]))
                p1 = (float(pts[1][0]), float(pts[1][1]))
                for pt in (p0, p1):
                    note(pt, ar=a_is_ring, al=not a_is_ring, br=b_is_ring, bl=not b_is_ring)
                t0a, t1a = _param(s1, p0)[0], _param(s1, p1)[0]
                a_splits[ia].extend([(t0a, p0), (t1a, p1)])
                a_overlap[ia].append((min(t0a, t1a), max(t0a, t1a), b_is_ring))
                t0b, t1b = _param(s2, p0)[0], _param(s2, p1)[0]
                b_splits[ib].extend([(t0b, p0), (t1b, p1)])
                b_overlap[ib].append((min(t0b, t1b), max(t0b, t1b), a_is_ring))

    # isolated points split the OTHER geometry's segments (a point sitting
    # mid-segment must not leave that segment classified as one piece)
    for p in fa.points:
        for ib, s2 in enumerate(fb.segs):
            if alg.on_segment(p[0], p[1], s2[0], s2[1], s2[2], s2[3]):
                note(p, br=s2[4] == 1, bl=s2[4] == 0)
                b_splits[ib].append(_param(s2, p))
    for p in fb.points:
        for ia, s1 in enumerate(fa.segs):
            if alg.on_segment(p[0], p[1], s1[0], s1[1], s1[2], s1[3]):
                note(p, ar=s1[4] == 1, al=s1[4] == 0)
                a_splits[ia].append(_param(s1, p))

    # ---- classify pieces -------------------------------------------------
    a_ring_in_int, a_ring_in_ext = _classify_pieces(fa, fb, a_splits, a_overlap, bump, transpose=False)
    b_ring_in_int, b_ring_in_ext = _classify_pieces(fb, fa, b_splits, b_overlap, bump, transpose=True)

    # ---- classify nodes and isolated points ------------------------------
    for p in fa.points:
        note(p)
    for p in fb.points:
        note(p)
    for p in fa.endpoint_valence:
        note(p, al=True)
    for p in fb.endpoint_valence:
        note(p, bl=True)
    for pt, (ar, al, bl_r, bl_l) in nodes.items():
        la = fa.locate_structural(pt, ar, al)
        lb = fb.locate_structural(pt, bl_r, bl_l)
        bump(la, lb, 0)

    # ---- area representative points --------------------------------------
    # a rep point of A's interior in Int B evidences II = 2; in Ext B, IE = 2.
    # Symmetric from B.  When the rep coincidentally lands ON the other
    # geometry's lower-dimensional interior, the evidenced intersection dim
    # is bounded by that geometry's dimension (a disk of Int A meets a line
    # interior in a 1-D set), hence the min().
    for poly in fa.polys:
        rep = alg.interior_point(poly)
        if rep.is_empty:
            continue
        lb = alg.locate_in_geom(float(rep.data[0]), float(rep.data[1]), b)
        if lb == I:
            bump(I, I, min(2, max(0, fb.dim)))
        elif lb == E:
            bump(I, E, 2)
    for poly in fb.polys:
        rep = alg.interior_point(poly)
        if rep.is_empty:
            continue
        la = alg.locate_in_geom(float(rep.data[0]), float(rep.data[1]), a)
        if la == I:
            bump(I, I, min(2, max(0, fa.dim)))
        elif la == E:
            bump(E, I, 2)

    # ---- area adjacency inference (valid-polygon assumption) -------------
    # every rule needs the target interior to be 2-D open (area) and uses
    # "a boundary point of a valid area has interior AND exterior points of
    # that area arbitrarily close"; the plane exterior is always open.
    # evidence flags are RING-feature-specific: a ring point of a valid
    # polygon is adjacent to that polygon's open interior and to its open
    # exterior, so a ring point strictly inside the other's AREA interior
    # (not merely coincident with a point/line component of a collection)
    # proves 2-D interior overlap on both sides of the ring.
    if fa.dim == 2 and not fa.empty:
        if fb.empty or fb.dim < 2:
            bump(I, E, 2)  # a lower-dim B cannot cover an open 2-D interior
        if a_ring_in_ext:
            bump(I, E, 2)  # ring point in open Ext B -> disk meets Int A
        if a_ring_in_int:
            bump(I, I, 2)  # ring point in open area-Int B -> disk meets Int A
            bump(E, I, 2)  # ... and Ext A
    if fb.dim == 2 and not fb.empty:
        if fa.empty or fa.dim < 2:
            bump(E, I, 2)
        if b_ring_in_ext:
            bump(E, I, 2)
        if b_ring_in_int:
            bump(I, I, 2)
            bump(I, E, 2)

    return "".join(_DIM_CHAR[M[r][c]] for r in (I, B, E) for c in (I, B, E))


def _param(seg, pt):
    """Parameter of pt along seg (dominant axis) for split ordering."""
    dx = seg[2] - seg[0]
    dy = seg[3] - seg[1]
    if abs(dx) >= abs(dy):
        t = (pt[0] - seg[0]) / dx if dx != 0 else 0.0
    else:
        t = (pt[1] - seg[1]) / dy if dy != 0 else 0.0
    return (t, pt)


def _classify_pieces(fs, fo, splits, overlaps, bump, transpose: bool):
    """Classify the split pieces of fs's segments against fo's geometry.

    bump(row, col, dim) with row = self-location, col = other-location;
    transpose swaps the roles (for the B-side pass).

    Returns (ring_in_area_interior, ring_in_exterior): whether any RING
    piece of fs lies strictly inside a polygon interior of fo / in fo's
    exterior — the evidence feeding the area-adjacency inference.
    """
    other = fo.geom
    ring_in_int = False
    ring_in_ext = False
    for i2, seg in enumerate(fs.segs):
        is_ring = seg[4] == 1
        selfloc = B if is_ring else I
        cuts = sorted(set([0.0, 1.0] + [t for t, _ in splits[i2]]))
        p0 = (seg[0], seg[1])
        p1 = (seg[2], seg[3])
        ovl = overlaps[i2]
        for k in range(len(cuts) - 1):
            t0, t1 = cuts[k], cuts[k + 1]
            if t1 - t0 <= 1e-14:
                continue
            tm = (t0 + t1) / 2.0
            # overlap pieces: location on the other geometry is structural
            loc = None
            structural = False
            for o0, o1, other_is_ring in ovl:
                if t0 >= o0 - 1e-14 and t1 <= o1 + 1e-14:
                    loc = B if other_is_ring else I
                    structural = True
                    break
            if loc is None:
                mx = p0[0] + (p1[0] - p0[0]) * tm
                my = p0[1] + (p1[1] - p0[1]) * tm
                loc = alg.locate_in_geom(mx, my, other)
                if loc == B:
                    # a NON-structural piece cannot lie along the other's
                    # boundary (the exact kernel classified every candidate
                    # pair as 'point', not collinear 'overlap'), so a B
                    # sample is a measure-zero accident: the parametric
                    # midpoint of a near-parallel piece can round exactly
                    # onto the other's edge for ~1-ulp plateaus of t,
                    # operand-order-dependently (found by the hypothesis
                    # relate-transpose fuzz, seed 712111).  Re-sample at
                    # golden-ratio offsets and take the first off-boundary
                    # location.
                    for frac in (0.381966011250105, 0.763932022500210):
                        ts = t0 + (t1 - t0) * frac
                        l2 = alg.locate_in_geom(
                            p0[0] + (p1[0] - p0[0]) * ts,
                            p0[1] + (p1[1] - p0[1]) * ts,
                            other,
                        )
                        if l2 != B:
                            loc = l2
                            break
                if is_ring and not (ring_in_int and ring_in_ext):
                    if loc == E:
                        ring_in_ext = True
                    elif loc == I and _in_area_interior(mx, my, fo.polys):
                        ring_in_int = True
            if transpose:
                bump(loc, selfloc, 1)
            else:
                bump(selfloc, loc, 1)
    return ring_in_int, ring_in_ext


def _in_area_interior(x: float, y: float, polys) -> bool:
    for poly in polys:
        if alg.locate_point_in_rings(x, y, poly.data) == I:
            return True
    return False


# ---------------------------------------------------------------------------
# matrix pattern matching + named predicates
# (reference: Geometries/IntersectionMatrix.cs:6-44 pattern symbols)


def matrix_matches(matrix: str, pattern: str) -> bool:
    for m, p in zip(matrix, pattern):
        if p == "*":
            continue
        if p == "T":
            if m == "F":
                return False
        elif p == "F":
            if m != "F":
                return False
        elif m != p:
            return False
    return True


def relate_pattern(a: Geom, b: Geom, pattern: str) -> bool:
    return matrix_matches(relate(a, b), pattern)


def intersects(a: Geom, b: Geom) -> bool:
    m = relate(a, b)
    return m[0] != "F" or m[1] != "F" or m[3] != "F" or m[4] != "F"


def disjoint(a: Geom, b: Geom) -> bool:
    return not intersects(a, b)


def contains(a: Geom, b: Geom) -> bool:
    return matrix_matches(relate(a, b), "T*****FF*")


def within(a: Geom, b: Geom) -> bool:
    return contains(b, a)


def covers(a: Geom, b: Geom) -> bool:
    m = relate(a, b)
    return any(
        matrix_matches(m, p) for p in ("T*****FF*", "*T****FF*", "***T**FF*", "****T*FF*")
    )


def covered_by(a: Geom, b: Geom) -> bool:
    return covers(b, a)


def crosses(a: Geom, b: Geom) -> bool:
    m = relate(a, b)
    da, db = a.dimension, b.dimension
    if da < db:
        return matrix_matches(m, "T*T******")
    if da > db:
        return matrix_matches(m, "T*****T**")
    if da == 1 and db == 1:
        return matrix_matches(m, "0********")
    return False


def overlaps(a: Geom, b: Geom) -> bool:
    m = relate(a, b)
    da, db = a.dimension, b.dimension
    if da != db:
        return False
    if da == 1:
        return matrix_matches(m, "1*T***T**")
    return matrix_matches(m, "T*T***T**")


def touches(a: Geom, b: Geom) -> bool:
    m = relate(a, b)
    return any(matrix_matches(m, p) for p in ("FT*******", "F**T*****", "F***T****"))


def equals_topo(a: Geom, b: Geom) -> bool:
    # IntersectionMatrix.IsEquals requires equal topological dimension
    # (reference: Geometries/IntersectionMatrix.cs IsEquals(dimA, dimB))
    if a.dimension != b.dimension:
        return False
    return matrix_matches(relate(a, b), "T*F**FFF*")
