"""Overlay (intersection / union / difference / symdifference).

Re-creates the result semantics of the reference's overlay operators
(reference: Operation/Overlay/OverlayOp.cs:39 legacy engine,
Operation/OverlayNG/OverlayNG.cs:180 — node edges → label → extract
polygons, then lines, then points; empty-result typing per
OverlayOp.CreateEmptyResult) with a fresh edge-labelling algorithm:

1. node every boundary segment of A against B's (robust predicates,
   collinear overlaps structural);
2. label each undirected piece with the region on each side w.r.t. BOTH
   inputs (own side structural from ring orientation; other side by
   midpoint location — pieces cannot cross the other boundary);
3. keep pieces where result-membership differs across sides, directed
   result-interior-left; assemble rings by angular walk; nest holes;
4. collect lower-dimensional resultants (shared edges / touch points in
   an intersection) exactly where the reference emits them.

Lineal/puntal operands are handled by piece/point classification with
the same noding machinery.
"""

from __future__ import annotations

import math

import numpy as np

from . import algorithms as alg
from .types import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
)

I, B, E = alg.INTERIOR, alg.BOUNDARY, alg.EXTERIOR

_OPS = ("intersection", "union", "difference", "symdifference")


def _snap_arr(arr, grid: float):
    """Round-half-UP to the grid (reference: PrecisionModel.MakePrecise,
    Geometries/PrecisionModel.cs:310 — floor(v*scale + 0.5)/scale; banker's
    rounding visibly diverges on .5 ordinates in the Prec corpus)."""
    return np.floor(np.asarray(arr, dtype=np.float64) / grid + 0.5) * grid


def overlay(a: Geom, b: Geom, op: str, grid_size: float | None = None, merge_line_output: bool = True, ng: bool = False, weld: bool = False, noder=None, check: str = "full") -> Geom:
    """merge_line_output: legacy OverlayOp merges lineal resultants into
    maximal linestrings; OverlayNG emits the noded edges unmerged.
    weld: grid is a robustness weld (buffer piece unions), not a precision
    model - vertex snapping only, no node rounding / collapse semantics.
    noder: optional pre-noder hook (reference: OverlayNG.cs:416 Noder
    property) — a ``Geom -> Geom`` callable applied to each input before
    the built-in exact noding, letting callers trade robustness for
    speed the way the reference's SnappingNoder / SegmentExtractingNoder
    injections do (see ``snapping_noder`` / ``segment_extracting_noder``).
    check: self-heal detector budget for area/area overlays —
      'full' (default): loose area bounds + validity + hole witnesses +
        the exact inclusion-exclusion sibling pin (the pin computes ONE
        sibling overlay per overlapping pair, roughly doubling the
        healthy hot path; it is what catches the silent hole-free
        arrangement-failure taxonomy the fuzz campaign found);
      'fast': loose bounds + validity + hole witnesses only — the 1x-cost
        detector set for bulk map_batches stages where inputs are
        well-conditioned (hole witnesses are free for hole-free inputs);
      'off': trust the arrangement, no retry ladder."""
    if op not in _OPS:
        raise ValueError(op)
    if noder is not None:
        a = noder(a)
        b = noder(b)
    dim_a, dim_b = a.dimension, b.dimension
    orig_a, orig_b = a, b
    if grid_size:
        if ng:
            # snap-rounding (OverlayNG SR): node the ORIGINAL arrangement —
            # re-route chains through the hot pixels their original segments
            # cross — THEN round (snap_round_inputs); rounding vertices
            # first destroys/fabricates pixel hits
            a, b = snap_round_inputs(a, b, grid_size)
        a = snap_clean(a, grid_size)
        b = snap_clean(b, grid_size)
    res, protected = _overlay_general(
        a, b, op, merge_line_output, ng, grid_size, weld,
        point_loc_geoms=((orig_a, orig_b) if (grid_size and ng) else None),
    )
    if grid_size and res is not None:
        # legacy dimensional-collapse lines survive even inside the result
        # area (TestOverlayAAPrec); other covered lines are filtered
        res = _snap_result(res, grid_size, op, protected_lines=protected)
    if res is None or res.is_empty:
        res = _empty_result(op, dim_a, dim_b)
    # weld-path safety net: weld pre-snaps the inputs and runs the EXACT
    # overlay (no precision model), so the result must obey the loose area
    # bounds the same way an unsnapped exact overlay must — but the weld
    # fast path used to skip the checker entirely, and an arrangement
    # failure on the SNAPPED pair surfaced as a silent EMPTY union (buffer
    # fuzz at the 1e7 frame: mitre wedges + cap disks welded at |d|/2^16).
    # The weld grid is orders of magnitude below the geometry size by
    # construction, so an area-bound violation is always a bug, never a
    # legitimate collapse; gate the (2x-cost) retry ladder behind the
    # three-area cheap check to keep the healthy fold at 1x.
    if (
        check != "off"
        and grid_size
        and weld
        and not ng
        and dim_a == 2
        and dim_b == 2
        and not (a.is_empty and b.is_empty)
        and not _area_invariant_ok(op, alg.area(a), alg.area(b), alg.area(res), False)
    ):
        res = _check_and_retry_overlay(a, b, op, res, merge_line_output, ng, check=check)
    # robustness retry (reference: OverlayNGRobust.cs:178 OverlaySnapTries):
    # float noise between nearly-coincident boundaries (e.g. collinear
    # shared edges of rotated inputs) can break the arrangement silently.
    # Cheap area invariants detect it; on violation retry with
    # SnappingNoder-style vertex clustering at escalating tolerances, then
    # the weld grid.
    if (
        check != "off"
        and grid_size is None
        and not weld
        and dim_a == 2
        and dim_b == 2
        # one-sided empty still goes through the checker: the non-empty
        # operand's SOLO arrangement can fail for invalid input (fuzz:
        # invalid-B ∪ ∅ returned ∅), and the area identities are exact
        # and trivial in that case
        and not (orig_a.is_empty and orig_b.is_empty)
    ):
        res = _check_and_retry_overlay(
            orig_a, orig_b, op, res, merge_line_output, ng, check=check
        )
    return res


def _area_invariant_ok(op: str, aa: float, ab: float, ar: float, overlap: bool) -> bool:
    """Necessary conditions on the result area.  `overlap` = some interior
    representative point of one operand lies strictly inside the other —
    when true, intersection cannot be empty, difference cannot equal A,
    symdifference cannot equal A+B."""
    tol = 1e-6 * max(aa, ab, 1.0)
    if op == "union":
        return max(aa, ab) - tol <= ar <= aa + ab + tol
    if op == "intersection":
        if ar > min(aa, ab) + tol:
            return False
        return not (overlap and ar <= tol)
    if op == "difference":
        if not (max(0.0, aa - ab) - tol <= ar <= aa + tol):
            return False
        return not (overlap and ar >= aa - tol)
    if op == "symdifference":
        if not (abs(aa - ab) - tol <= ar <= aa + ab + tol):
            return False
        return not (overlap and ar >= aa + ab - tol)
    return True


def _interiors_overlap(a: Geom, b: Geom) -> bool:
    for g1, g2 in ((a, b), (b, a)):
        for comp in g1.flatten():
            if comp.gtype != POLYGON:
                continue
            rep = alg.interior_point(comp)
            if rep.is_empty:
                continue
            if alg.locate_in_geom(float(rep.data[0]), float(rep.data[1]), g2) == I:
                return True
    # rep-point tests miss overlaps whose representative points happen to
    # fall on/outside the other operand (fuzz: offset rectangles with
    # near-coincident edges).  Probe the envelope-intersection rectangle:
    # a probe strictly interior to BOTH proves overlap (never a false
    # positive), catching the common axis-aligned partial-overlap shape.
    ea, eb = alg.envelope(a), alg.envelope(b)
    if ea is None or eb is None:  # empty operand: no interior to overlap
        return False
    x0, y0 = max(ea[0], eb[0]), max(ea[1], eb[1])
    x1, y1 = min(ea[2], eb[2]), min(ea[3], eb[3])
    if x1 <= x0 or y1 <= y0:
        return False
    # centre + a 4x4 grid at odd-eighths fractions: catches any overlap
    # pocket spanning >= 1/4 of the envelope-intersection in each axis
    # (fuzz: an L-shape ∩ ulp-shifted rect whose true overlap strip sat
    # exactly between the old quarter probes, with a probe ON a boundary)
    dx, dy = x1 - x0, y1 - y0
    probes = [((x0 + x1) / 2.0, (y0 + y1) / 2.0)]
    for fx in (1, 3, 5, 7):
        for fy in (1, 3, 5, 7):
            probes.append((x0 + dx * fx / 8.0, y0 + dy * fy / 8.0))
    for px, py in probes:
        if (
            alg.locate_in_geom(px, py, a) == I
            and alg.locate_in_geom(px, py, b) == I
        ):
            return True
    return False


def _snap_near_vertices_onto_segments(polys, tol: float):
    """SnapIntersectionAdder.ProcessNearVertex semantics at the input
    level (reference: Noding/Snap/SnapIntersectionAdder.cs): any vertex
    lying within tol of ANOTHER segment's interior is inserted INTO that
    segment (at the vertex's own coordinates), so nearly-incident chains
    share exact points and node cleanly.  Used only by the overlay retry
    ladder."""
    verts = []
    for g in polys:
        for ring in g.coords_list():
            for q in ring[:-1]:
                verts.append((float(q[0]), float(q[1])))
    V = np.asarray(verts, dtype=np.float64).reshape(-1, 2)
    out = []
    for g in polys:
        rings = []
        for ring in g.coords_list():
            pts = [(float(q[0]), float(q[1])) for q in ring]
            new_pts = []
            for i2 in range(len(pts) - 1):
                a0 = pts[i2]
                b0 = pts[i2 + 1]
                new_pts.append(a0)
                dx = b0[0] - a0[0]
                dy = b0[1] - a0[1]
                ll = dx * dx + dy * dy
                if ll == 0:
                    continue
                minx = min(a0[0], b0[0]) - tol
                maxx = max(a0[0], b0[0]) + tol
                miny = min(a0[1], b0[1]) - tol
                maxy = max(a0[1], b0[1]) + tol
                m = (
                    (V[:, 0] >= minx)
                    & (V[:, 0] <= maxx)
                    & (V[:, 1] >= miny)
                    & (V[:, 1] <= maxy)
                )
                inserts = []
                for vx, vy in V[m]:
                    t = ((vx - a0[0]) * dx + (vy - a0[1]) * dy) / ll
                    if t <= 0.0 or t >= 1.0:
                        continue
                    px_ = a0[0] + t * dx
                    py_ = a0[1] + t * dy
                    d2 = (vx - px_) ** 2 + (vy - py_) ** 2
                    if d2 >= tol * tol:
                        continue
                    v = (float(vx), float(vy))
                    if v == a0 or v == b0:
                        continue
                    if math.hypot(vx - a0[0], vy - a0[1]) < tol:
                        continue
                    if math.hypot(vx - b0[0], vy - b0[1]) < tol:
                        continue
                    inserts.append((t, v))
                for _t, v in sorted(set(inserts)):
                    if new_pts[-1] != v:
                        new_pts.append(v)
            new_pts.append(pts[-1])
            if new_pts[0] != new_pts[-1]:
                new_pts.append(new_pts[0])
            rings.append(np.asarray(new_pts, dtype=np.float64))
        out.append(Geom(POLYGON, rings))
    return out


def _result_valid(res: Geom) -> bool:
    """Polygonal overlay output must be valid (reference: OverlayNG results
    are guaranteed valid; a ValidatingNoder-style insurance check).
    Validates the polygons as ONE multipolygon, not one-by-one: fuzz found
    symdifference emitting two individually-valid polygons sharing an
    edge (an invalid multipolygon) that per-component checks waved
    through, so the retry never fired."""
    from .validity import is_valid

    polys = [c for c in res.flatten() if c.gtype == POLYGON]
    if not polys:
        return True
    if len(polys) == 1:
        return is_valid(polys[0])
    return is_valid(Geom(MULTIPOLYGON, [p.data for p in polys]))


_PIN_DEPTH = [0]  # reentrancy guard: pins compute a sibling overlay whose
# own check must fall back to the loose bounds, or two mutually-buggy
# results could recurse forever


def _has_holes(g: Geom) -> bool:
    return any(len(c.data) > 1 for c in g.flatten() if c.gtype == POLYGON)


def _pinned_expected(a: Geom, b: Geom, op: str, aa: float, ab: float, ar: float, overlap: bool, tol: float):
    """Inclusion-exclusion pin for the cases the loose bounds cannot
    catch.  With overlapping interiors, only symdifference needs it (the
    historical hole).  With NON-overlapping rep points the disjoint
    expectation is exact (diff == A, union/symdiff == A+B, inter == 0) —
    a result far from it is either a silent arrangement failure (fuzz
    found difference/symdifference returning EMPTY/B for 1-ulp-touching
    quads) or a rep-point false negative; computing the sibling
    intersection (itself self-healing) distinguishes the two and gives
    the exact expected area either way.  Returns None when the loose
    bounds suffice."""
    if _PIN_DEPTH[0] > 0:
        return None
    _PIN_DEPTH[0] += 1
    try:
        # Every op on an overlapping pair is pinned against ONE sibling op
        # computed from the same inputs, giving an exact area expectation.
        # Successive fuzz families proved the loose bounds blind to a
        # whole taxonomy of silent arrangement failures that each stay
        # "plausible": difference returning EMPTY (1-ulp rotated rects),
        # union double-counting, union filling a partially-covered hole
        # (donut families), intersection collapsing to MULTIPOINT
        # (L-shapes) or dropping one component's overlap block with a
        # correct difference (multipolygon families), union dropping a
        # fully-covered component.  A pin mismatch only raises SUSPICION
        # (the sibling may be the broken one) — acceptance of a retry is
        # by mutual consistency in _system_result, never by these pins.
        if op == "difference" and (ar < aa - tol or overlap):
            return aa - alg.area(overlay(a, b, "intersection"))
        if op == "symdifference" and overlap:
            return aa + ab - 2.0 * alg.area(overlay(a, b, "intersection"))
        if op == "union" and overlap:
            return aa + ab - alg.area(overlay(a, b, "intersection"))
        if op == "intersection" and overlap:
            return aa - alg.area(overlay(a, b, "difference"))
        if not overlap:
            if op == "symdifference" and abs(ar - (aa + ab)) > tol:
                return aa + ab - 2.0 * alg.area(overlay(a, b, "intersection"))
            if op == "union" and abs(ar - (aa + ab)) > tol:
                return aa + ab - alg.area(overlay(a, b, "intersection"))
            if op == "intersection" and ar > tol:
                return aa - alg.area(overlay(a, b, "difference"))
        return None
    finally:
        _PIN_DEPTH[0] -= 1


def _hole_witnesses(g: Geom, other: Geom | None = None):
    """Probe points strictly inside each interior ring of ``g``: the
    interior point of the hole-as-polygon plus the quarter probes of its
    envelope that land strictly inside it.  Holes are where arrangement
    failures hide from area bounds — a hole-blind result can lie
    CONSISTENTLY across sibling ops (fuzz: difference and intersection
    both off by the same hole area, so every single-sibling pin cancels),
    but it cannot lie about exact point membership.

    With ``other`` given, also probe the centres of the hole-envelope
    slabs that lie BEYOND the other operand's envelope: when the other
    geometry slices a hole near its edge, the thin uncovered strip is
    exactly where a filled hole escapes the fixed quarter grid (fuzz:
    donut ∪ rect whose top edge cuts the hole at 5/6 height)."""
    pts = []
    oenv = alg.envelope(other) if other is not None and not other.is_empty else None
    MAX_HOLES = 16  # bound witness cost on accumulated many-hole
    n_holes = 0  # multipolygons (cascaded unions); pins stay unbounded
    for comp in g.flatten():
        if comp.gtype != POLYGON:
            continue
        for ring in comp.data[1:]:
            n_holes += 1
            if n_holes > MAX_HOLES:
                return pts
            hp = Geom(POLYGON, [np.asarray(ring, dtype=np.float64)])
            rep = alg.interior_point(hp)
            if not rep.is_empty:
                pts.append((float(rep.data[0]), float(rep.data[1])))
            x0, y0, x1, y1 = alg.envelope(hp)
            cand = [
                (x0 + (x1 - x0) * fx / 4.0, y0 + (y1 - y0) * fy / 4.0)
                for fx, fy in ((1, 1), (3, 1), (1, 3), (3, 3), (2, 2))
            ]
            if oenv is not None:
                ox0, oy0, ox1, oy1 = oenv
                cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
                if oy1 < y1:  # uncovered top slab
                    cand += [(cx, (max(oy1, y0) + y1) / 2.0)]
                if oy0 > y0:  # bottom
                    cand += [(cx, (y0 + min(oy0, y1)) / 2.0)]
                if ox1 < x1:  # right
                    cand += [((max(ox1, x0) + x1) / 2.0, cy)]
                if ox0 > x0:  # left
                    cand += [((x0 + min(ox0, x1)) / 2.0, cy)]
            for px, py in cand:
                if alg.locate_in_geom(px, py, hp) == I:
                    pts.append((px, py))
    return pts


def _witnesses_ok(a: Geom, b: Geom, op: str, res: Geom, wits) -> bool:
    """Exact pointwise membership check: for every witness point located
    unambiguously (not on a boundary) in both operands and the result,
    the result must contain it iff ``_member(locA, locB, op)`` says so."""
    for px, py in wits:
        locA = alg.locate_in_geom(px, py, a)
        locB = alg.locate_in_geom(px, py, b)
        if locA == B or locB == B:
            continue
        locR = alg.locate_in_geom(px, py, res)
        if locR == B:
            continue
        if (locR == I) != _member(locA, locB, op):
            return False
    return True


def _system_result(a2: Geom, b2: Geom, op: str, merge_line_output: bool, ng: bool, grid=None):
    """Recompute the requested op on (a2, b2) and accept it only when the
    FULL inclusion-exclusion system computed from the SAME pair is
    mutually consistent: aa+ab == u+i, d+i == aa, d'+i == ab, all results
    valid.  Mutual consistency over one arrangement does not trust any
    single sibling (the original pair's intersection may itself be
    silently broken — found by fuzz).  Returns the op result or None."""
    # check="off": acceptance here is the mutual consistency of the full
    # sibling system itself; letting the per-op weld checker fire inside a
    # retry candidate would recurse (weld check -> retry -> _system_result
    # -> weld check ... — found by the -3.7e7 buffer fuzz as a
    # RecursionError)
    kw = dict(merge_line_output=merge_line_output, ng=ng, weld=True, check="off")
    u = overlay(a2, b2, "union", grid, **kw)
    i = overlay(a2, b2, "intersection", grid, **kw)
    d = overlay(a2, b2, "difference", grid, **kw)
    dr = overlay(b2, a2, "difference", grid, **kw)
    aa2, ab2 = alg.area(a2), alg.area(b2)
    au, ai, ad, adr = alg.area(u), alg.area(i), alg.area(d), alg.area(dr)
    tol = 1e-6 * max(aa2, ab2, 1.0)
    wits = (
        _hole_witnesses(a2, b2) + _hole_witnesses(b2, a2)
        if (_has_holes(a2) or _has_holes(b2))
        else []
    )
    if (
        abs((aa2 + ab2) - (au + ai)) <= tol
        and abs((ad + ai) - aa2) <= tol
        and abs((adr + ai) - ab2) <= tol
        and _result_valid(u)
        and _result_valid(i)
        and _result_valid(d)
        and _result_valid(dr)
        and (
            not wits
            or (
                _witnesses_ok(a2, b2, "union", u, wits)
                and _witnesses_ok(a2, b2, "intersection", i, wits)
                and _witnesses_ok(a2, b2, "difference", d, wits)
                and _witnesses_ok(b2, a2, "difference", dr, wits)
            )
        )
    ):
        if op == "union":
            return u
        if op == "intersection":
            return i
        if op == "difference":
            return d
        res = overlay(a2, b2, "symdifference", grid, **kw)
        if abs(alg.area(res) - (au - ai)) <= tol and _result_valid(res):
            return res
    return None


def _assemble_operand(comps):
    """Rebuild one retry operand from its snapped polygon components.
    Snapping can weld near-touching sibling components (gap below the
    snap tolerance) onto exactly-shared edges — INVALID as a
    MultiPolygon, so every `_system_result` retry would be rejected and
    the broken original returned (fuzz: two rects 3e-15 apart vs a
    ulp-rotated B never healed).  Union such siblings properly instead:
    exactly-coincident edges are the well-conditioned overlay case."""
    if not comps:
        return Geom.empty(MULTIPOLYGON)
    if len(comps) == 1:
        return comps[0]
    multi = Geom(MULTIPOLYGON, [p.data for p in comps])
    if _result_valid(multi):
        return multi
    merged = comps[0]
    for c in comps[1:]:
        merged = overlay(merged, c, "union", weld=True)
    return merged


def _check_and_retry_overlay(a: Geom, b: Geom, op: str, res: Geom, merge_line_output: bool, ng: bool, check: str = "full") -> Geom:
    aa = alg.area(a)
    ab = alg.area(b)
    overlap = _interiors_overlap(a, b)
    tol = 1e-6 * max(aa, ab, 1.0)
    ar0 = alg.area(res)
    # suspicion: loose bounds violated, OR (for the holes the loose bounds
    # cannot see) the inclusion-exclusion pin against the sibling op
    # disagrees.  A pin mismatch can be a false alarm (the SIBLING may be
    # the broken one), so it only triggers the retry — acceptance of a
    # retry candidate never compares against the original pair's siblings.
    suspicious = not (_area_invariant_ok(op, aa, ab, ar0, overlap) and _result_valid(res))
    if not suspicious and check == "full":
        expected = _pinned_expected(a, b, op, aa, ab, ar0, overlap, tol)
        if expected is not None and abs(ar0 - expected) > max(tol, 1e-6 * max(expected, 1.0)):
            suspicious = True
    # hole witnesses derive solely from interior rings — skip the probe
    # construction entirely for the common hole-free case
    wits = (
        _hole_witnesses(a, b) + _hole_witnesses(b, a)
        if (_has_holes(a) or _has_holes(b))
        else []
    )
    if not suspicious and wits and not _witnesses_ok(a, b, op, res, wits):
        # correlated hole-blind lies cancel in every area identity (fuzz:
        # d' and i both shifted by the full hole area); exact pointwise
        # membership at hole-interior witnesses is immune to cancellation
        suspicious = True
    if not suspicious:
        return res
    mx = max(
        (abs(float(v)) for g in (a, b) for arr in g.coords_list() for q in arr for v in q),
        default=0.0,
    )
    if mx == 0:
        return res
    comps_a = [c for c in a.flatten() if c.gtype == POLYGON]
    comps_b = [c for c in b.flatten() if c.gtype == POLYGON]
    stol = mx / 1e12
    for _try in range(5):
        snapped = _snap_cluster(comps_a + comps_b, stol)
        if len(snapped) == len(comps_a) + len(comps_b):
            snapped = _snap_near_vertices_onto_segments(snapped, stol)
            sa = snapped[: len(comps_a)]
            sb = snapped[len(comps_a) :]
            a2 = _assemble_operand(sa)
            b2 = _assemble_operand(sb)
            res2 = _system_result(a2, b2, op, merge_line_output, ng)
            if res2 is not None:
                return res2
        stol *= 10.0
    wtol = 2.0 ** (math.floor(math.log2(mx)) - 40)
    res3 = _system_result(a, b, op, merge_line_output, ng, grid=wtol)
    if res3 is not None:
        return res3
    # last rung: every retry rejected.  If an OPERAND is itself invalid
    # (e.g. a hole crossing its shell by an ulp — fuzz seed 7700 pair
    # 19957 silently produced union=EMPTY for it), no arrangement of the
    # raw rings can satisfy the inclusion-exclusion system, so the snap
    # ladder can never accept a candidate.  Repair the operands the way
    # the reference repairs invalid polygonal input (GeometryFixer.cs:46,
    # nonzero-winding / buffer(0)-both-orientations semantics) and accept
    # a mutually-consistent system over the FIXED pair.
    from .validity import is_valid as _operand_valid

    va, vb = _operand_valid(a), _operand_valid(b)
    if not (va and vb):
        from .extra import fix_geometry

        try:
            fa = a if va else fix_geometry(a)
            fb = b if vb else fix_geometry(b)
            # the repaired operand can carry a pinch channel (hole welded
            # onto its shell through ulp-separated vertices), so give the
            # fixed pair the same escalation the raw pair got: exact
            # arrangement first, weld grid second
            res4 = _system_result(fa, fb, op, merge_line_output, ng)
            if res4 is None:
                res4 = _system_result(fa, fb, op, merge_line_output, ng, grid=wtol)
        except Exception:
            res4 = None
        if res4 is not None:
            return res4
    return res


def _snap_result(g: Geom, grid: float, op: str, protected_lines: set | None = None) -> Geom:
    """Snap-rounding post-pass on an overlay result: round ordinates to the
    grid, split self-touching rings created by the rounding into minimal
    rings, and degrade collapsed slivers to lines/points (reference
    behavior: OverlayNG with a fixed PrecisionModel emits a collapsed area
    intersection as its lineal remnant)."""
    polys = []
    lines = []
    points = []
    for comp in g.flatten():
        if comp.gtype == POINT:
            points.append(tuple(_snap_arr(comp.data, grid)))
        elif comp.gtype == LINESTRING:
            arr = _dedup(_snap_arr(comp.data, grid))
            if len(arr) >= 2:
                lines.append(arr)
            elif len(arr) == 1:
                points.append((float(arr[0, 0]), float(arr[0, 1])))
        elif comp.gtype == POLYGON:
            shells = []
            holes = []
            for ring in comp.data:
                arr = _dedup(_snap_arr(ring, grid))
                if len(arr) >= 2 and (arr[0] != arr[-1]).any():
                    arr = np.concatenate([arr, arr[:1]])
                closed = [tuple(p) for p in arr]
                from_split = (
                    _split_minimal_rings(closed) if len(closed) >= 4 else []
                )
                got_ring = False
                for sub in from_split:
                    rs = np.array(sub, dtype=np.float64)
                    sa = alg.ring_signed_area(rs)
                    if sa == 0.0 or len(rs) < 4:
                        if op in ("intersection", "union") and len(rs) >= 2:
                            for k2 in range(len(rs) - 1):
                                if (rs[k2] != rs[k2 + 1]).any():
                                    lines.append(rs[k2 : k2 + 2])
                        continue
                    got_ring = True
                    (shells if sa > 0 else holes).append(rs)
                if not got_ring and not from_split and op in ("intersection", "union"):
                    # fully-collapsed ring: emit its UNDIRECTED segments once
                    # (an out-and-back path is one segment, not a 3-point line)
                    seen_s = set()
                    for k2 in range(len(arr) - 1):
                        a0 = tuple(arr[k2])
                        a1 = tuple(arr[k2 + 1])
                        kk = (min(a0, a1), max(a0, a1))
                        if a0 != a1 and kk not in seen_s:
                            seen_s.add(kk)
                            lines.append(np.array([a0, a1], dtype=np.float64))
            # ring orientation from the source polygon may be either way:
            # first ring of the source is the shell side
            if not shells and holes:
                shells = [h[::-1].copy() for h in holes]
                holes = []
            comp_start = len(polys)
            for s in shells:
                if not alg.is_ccw_robust(s):
                    s = s[::-1].copy()
                polys.append([s])
            for h in holes:
                # assign to the INNERMOST containing shell (nested donuts:
                # the outer shell contains the inner polygon's hole too, but
                # the hole belongs to the smallest shell around it); prefer
                # this component's own shells, fall back to earlier comps
                # only if none of them contains the hole
                for cand in (polys[comp_start:], polys[:comp_start]):
                    best = None
                    best_area = math.inf
                    for rings in cand:
                        probe = _ring_probe_not_on(h, rings[0])
                        if probe and alg.locate_point_in_rings(probe[0], probe[1], [rings[0]]) == I:
                            sa = abs(alg.ring_signed_area(rings[0]))
                            if sa < best_area:
                                best_area = sa
                                best = rings
                    if best is not None:
                        best.append(h)
                        break
    polys = _split_touching_holes(polys)
    # drop lines covered by polygons, dedup
    poly_geoms = [Geom(POLYGON, rings) for rings in polys]
    out_lines = []
    seenl = set()
    for ln in lines:
        key = tuple(map(tuple, ln))
        rkey = tuple(map(tuple, ln[::-1]))
        if key in seenl or rkey in seenl:
            continue
        seenl.add(key)
        if not _line_covered(ln, poly_geoms):
            out_lines.append(ln)
            continue
        # covered dimensional-collapse lines survive ONLY in intersection,
        # and only when both endpoints touch the result-area boundary
        # (legacy LineBuilder.CollectBoundaryTouchEdge: interior-area edges
        # are collected for the intersection op)
        prot = protected_lines and any(
            (min(tuple(ln[k2]), tuple(ln[k2 + 1])), max(tuple(ln[k2]), tuple(ln[k2 + 1])))
            in protected_lines
            for k2 in range(len(ln) - 1)
        )
        if prot and op == "intersection":
            def _on_boundary(px, py):
                return any(
                    alg.locate_point_in_rings(px, py, rings) == B for rings in polys
                )
            if _on_boundary(float(ln[0, 0]), float(ln[0, 1])) and _on_boundary(
                float(ln[-1, 0]), float(ln[-1, 1])
            ):
                out_lines.append(ln)
    pts = [p for p in dict.fromkeys(points) if not _point_covered(p, poly_geoms, out_lines)]
    return _compose(polys, out_lines, pts)


def _empty_result(op: str, dim_a: int, dim_b: int) -> Geom:
    """Empty result typed by dimension (reference: OverlayOp.CreateEmptyResult)."""
    if op == "intersection":
        d = min(dim_a, dim_b)
    elif op == "union" or op == "symdifference":
        d = max(dim_a, dim_b)
    else:
        d = dim_a
    if d == 2:
        return Geom.empty(POLYGON)
    if d == 1:
        return Geom.empty(LINESTRING)
    if d == 0:
        return Geom.empty(POINT)
    return Geom.empty(GEOMETRYCOLLECTION)


def snap_to_grid(g: Geom, grid_size: float) -> Geom:
    """Precision reduction: round all ordinates to the grid and drop
    collapsed rings/segments (reference: Operation/OverlayNG/PrecisionReducer.cs;
    MakePrecise semantics Geometries/PrecisionModel.cs:291)."""

    def snap_arr(arr):
        return _snap_arr(arr, grid_size)

    t = g.gtype
    if t == POINT:
        if g.is_empty:
            return g
        return Geom(POINT, snap_arr(g.data))
    if t == LINESTRING:
        out = _dedup(snap_arr(g.data))
        if len(out) < 2:
            return Geom.empty(LINESTRING)
        return Geom(LINESTRING, out, tag=g.tag)
    if t == POLYGON:
        rings = []
        for r in g.data:
            rr = _dedup(snap_arr(r))
            if len(rr) >= 4:
                rings.append(rr)
            elif not rings:
                return Geom.empty(POLYGON)
        return Geom(POLYGON, rings)
    if t == MULTIPOINT:
        return Geom(MULTIPOINT, [snap_arr(p) for p in g.data])
    if t == MULTILINESTRING:
        parts = [_dedup(snap_arr(p)) for p in g.data]
        return Geom(MULTILINESTRING, [p for p in parts if len(p) >= 2])
    if t == MULTIPOLYGON:
        polys = []
        for rings in g.data:
            p = snap_to_grid(Geom(POLYGON, rings), grid_size)
            if not p.is_empty:
                polys.append(p.data)
        return Geom(MULTIPOLYGON, polys)
    return Geom(GEOMETRYCOLLECTION, [snap_to_grid(c, grid_size) for c in g.data])


def snap_clean(g: Geom, grid: float) -> Geom:
    """Snap-rounding input preparation: round ordinates to the grid, then
    repair the rounding damage — self-node each ring (rounding creates
    spikes and vertex-on-edge touches), split into minimal rings, keep the
    ones with area as polygon rings and DEGRADE collapsed pieces to lineal
    components of the same operand.  The collapsed linework then flows
    through the overlay with ordinary mixed-dimension semantics, which is
    how the reference's fixed-precision OverlayNG surfaces collapsed edges
    in its results."""
    polys = []
    lines = []       # genuine lineal inputs, snapped
    collapsed = []   # ring pieces degraded by the rounding
    points = []
    for comp in g.flatten():
        if comp.gtype == POINT:
            points.append(_snap_arr(comp.data, grid))
        elif comp.gtype == LINESTRING:
            arr = _dedup(_snap_arr(comp.data, grid))
            if len(arr) >= 2:
                lines.append(arr)
            elif len(arr) == 1:
                points.append(arr[0])
        elif comp.gtype == POLYGON:
            shells = []
            holes = []
            for ri, ring in enumerate(comp.data):
                arr = _dedup(_snap_arr(ring, grid))
                if len(arr) >= 2 and (arr[0] != arr[-1]).any():
                    arr = np.concatenate([arr, arr[:1]])
                subrings, degraded = _clean_ring(arr, grid)
                collapsed.extend(degraded)
                if not subrings:
                    continue
                # a self-touching snapped ring splits into sub-rings whose
                # traversal orientation ALTERNATES where the ring inverts:
                # sub-rings oriented like the dominant one keep the ring's
                # role, opposite-oriented ones invert it (a hole pinching
                # off an ISLAND, a shell pinching off a hole) — observed
                # OverlayNG fixed-precision behavior
                dom = max(subrings, key=lambda r: abs(alg.ring_signed_area(r)))
                dom_ccw = alg.is_ccw_robust(dom)
                for rs in subrings:
                    same = alg.is_ccw_robust(rs) == dom_ccw
                    is_shell = (ri == 0) == same
                    (shells if is_shell else holes).append(rs)
            for s in shells:
                if not alg.is_ccw_robust(s):
                    s = s[::-1].copy()
                polys.append([s])
            for h in holes:
                for rings in polys:
                    probe = _ring_probe_not_on(h, rings[0])
                    if probe and alg.locate_point_in_rings(probe[0], probe[1], [rings[0]]) == I:
                        rings.append(h)
                        break
    parts = [Geom(POLYGON, rings) for rings in polys]
    parts.extend(Geom(LINESTRING, ln) for ln in lines)
    # collapsed ring linework is NOT an ordinary lineal operand: the
    # reference surfaces it in intersection/union results but not in
    # difference/symdifference
    parts.extend(Geom(LINESTRING, ln, tag="collapsed") for ln in collapsed)
    parts.extend(Geom(POINT, p) for p in points)
    if not parts:
        return _empty_like(g)
    if len(parts) == 1:
        return parts[0]
    if all(p.gtype == POLYGON for p in parts):
        # keep pure-area operands typed as MultiPolygon: downstream
        # arrangement/retry code treats a GeometryCollection operand as
        # mixed-dimension, and a MultiPolygon silently degraded to a
        # collection made every retry rung reject (buffer fuzz at the
        # -3.7e7 frame: welded piece-union collapsed to EMPTY)
        return Geom(MULTIPOLYGON, [p.data for p in parts])
    return Geom(GEOMETRYCOLLECTION, parts)


def _empty_like(g: Geom) -> Geom:
    d = g.dimension
    if d == 2:
        return Geom.empty(POLYGON)
    if d == 1:
        return Geom.empty(LINESTRING)
    if d == 0:
        return Geom.empty(POINT)
    return Geom.empty(GEOMETRYCOLLECTION)


def _clean_ring(arr: np.ndarray, grid: float | None = None):
    """Closed ring array → (valid minimal rings, collapsed line arrays).
    Under a precision grid, self-intersection split points snap-round to
    the grid (the reference's snap-rounding nodes them there)."""
    if len(arr) < 3:
        return [], ([_dedup(arr)] if len(_dedup(arr)) >= 2 else [])
    pts = [tuple(p) for p in arr]
    n = len(pts) - 1
    segs = [(pts[i], pts[i + 1]) for i in range(n)]
    splits = [[] for _ in segs]
    if n > 64:
        cand = _candidate_pairs(
            np.column_stack([arr[: n], arr[1 : n + 1]])
        )
    else:
        cand = ((i, j) for i in range(n) for j in range(i + 1, n))
    for i, j in cand:
        kind, ipts = alg.segment_intersection(segs[i][0], segs[i][1], segs[j][0], segs[j][1])
        if kind == "none":
            continue
        for p in ipts:
            p = (float(p[0]), float(p[1]))
            if grid:
                p = (
                    float(np.floor(p[0] / grid + 0.5) * grid),
                    float(np.floor(p[1] / grid + 0.5) * grid),
                )
            if p != segs[i][0] and p != segs[i][1]:
                splits[i].append(p)
            if p != segs[j][0] and p != segs[j][1]:
                splits[j].append(p)
    path = []
    for i, (p0, p1) in enumerate(segs):
        path.append(p0)
        if splits[i]:
            dx = p1[0] - p0[0]
            dy = p1[1] - p0[1]
            key = (lambda q: (q[0] - p0[0]) / dx) if abs(dx) >= abs(dy) else (
                lambda q: (q[1] - p0[1]) / dy
            )
            for q in sorted(set(splits[i]), key=key):
                path.append(q)
    path.append(pts[0])
    rings = []
    collapsed = []
    for sub in _split_minimal_rings(path):
        rs = np.array(sub, dtype=np.float64)
        if len(rs) >= 4 and abs(alg.ring_signed_area(rs)) > _area_resolution(rs):
            rings.append(rs)
        else:
            # out-and-back spike or noise-floor sliver → its undirected
            # segments as linework
            seen = set()
            for k in range(len(rs) - 1):
                a0 = tuple(rs[k])
                a1 = tuple(rs[k + 1])
                kk = (min(a0, a1), max(a0, a1))
                if a0 != a1 and kk not in seen:
                    seen.add(kk)
                    collapsed.append(np.array([a0, a1], dtype=np.float64))
    return rings, collapsed


def _dedup(arr: np.ndarray) -> np.ndarray:
    if len(arr) < 2:
        return arr
    keep = np.ones(len(arr), dtype=bool)
    keep[1:] = (arr[1:] != arr[:-1]).any(axis=1)
    return arr[keep]


# ---------------------------------------------------------------------------
# feature decomposition


class _Edges:
    """Directed boundary/line segments of one operand with structural side
    info: for area rings, interior_left; for lines, both sides Exterior
    (lines have no area side) but the piece itself is Interior."""

    def __init__(self, g: Geom):
        self.geom = g
        self.segs = []  # (p0, p1, kind, interior_left) kind: 'ring'|'line'
        self.points = []
        self.dim = g.dimension
        self._area_comps = None  # lazy [(comp_env, ring_envs, rings)]
        for comp in g.flatten():
            if comp.gtype == POINT:
                self.points.append((float(comp.data[0]), float(comp.data[1])))
            elif comp.gtype == LINESTRING:
                d = _dedup(comp.data)
                lkind = "cline" if comp.tag == "collapsed" else "line"
                cid = len(self.segs)  # unique per component (first seg index)
                for i2 in range(len(d) - 1):
                    self.segs.append(
                        ((float(d[i2, 0]), float(d[i2, 1])), (float(d[i2 + 1, 0]), float(d[i2 + 1, 1])), lkind, False, cid, i2)
                    )
            elif comp.gtype == POLYGON:
                for ri, ring in enumerate(comp.data):
                    r = _dedup(ring)
                    if len(r) < 4:
                        continue
                    ccw = alg.is_ccw_robust(r)
                    interior_left = ccw if ri == 0 else (not ccw)
                    cid = len(self.segs)
                    for i2 in range(len(r) - 1):
                        self.segs.append(
                            (
                                (float(r[i2, 0]), float(r[i2, 1])),
                                (float(r[i2 + 1, 0]), float(r[i2 + 1, 1])),
                                "ring",
                                interior_left,
                                cid,
                                i2,
                            )
                        )

    def area_comps(self):
        """Cached [(component_env, ring_envs, rings)] of the operand's
        polygon components, so per-piece side probes prefilter by envelope
        instead of ray-crossing every ring of the whole operand (the
        dominant cost of large cascaded unions before caching)."""
        if self._area_comps is None:
            comps = []
            for comp in self.geom.flatten():
                if comp.gtype != POLYGON:
                    continue
                renvs = alg._ring_envs(comp.data)
                comps.append((renvs[0], renvs, comp.data))
            self._area_comps = comps
        return self._area_comps


def _batch_area_side(mids: np.ndarray, comps) -> np.ndarray:
    """Vectorized equivalent of classify_area_side for many midpoints:
    even-odd interior parity across the operand's polygon components,
    with any on-boundary hit coercing to Interior (covered).  Uses the
    batch ray-crossing kernel, whose boundary-suspect band matches the
    scalar orient2d exact-arithmetic filter, so results are identical to
    the per-point robust probe."""
    P = len(mids)
    crossings = np.zeros(P, dtype=np.int64)
    on_b = np.zeros(P, dtype=bool)
    for ce, _renvs, rings in comps:
        sel = (
            (mids[:, 0] >= ce[0])
            & (mids[:, 0] <= ce[2])
            & (mids[:, 1] >= ce[1])
            & (mids[:, 1] <= ce[3])
        )
        if not sel.any():
            continue
        pts = mids[sel]
        nseg = sum(len(r) for r in rings)
        chunk = max(64, 2_000_000 // max(nseg, 1))  # bound the P×E matrix
        if len(pts) <= chunk:
            loc = alg.locate_points_in_rings(pts, rings)
        else:
            loc = np.concatenate(
                [
                    alg.locate_points_in_rings(pts[i : i + chunk], rings)
                    for i in range(0, len(pts), chunk)
                ]
            )
        on_b[sel] |= loc == B
        crossings[sel] += loc == I
    return np.where(on_b | (crossings % 2 == 1), I, E)


def _node_edges(ea: _Edges, eb: _Edges, point_noding: bool = True, grid: float | None = None, hot: bool = True):
    """Split both edge sets at mutual intersections.

    Returns (pieces_a, pieces_b): per input, list of
    (p0, p1, kind, interior_left, overlap_info|None); overlap_info for
    pieces collinear with an edge of the OTHER geometry:
    (other_interior_left_relative_to_piece_dir, other_kind).
    """
    # legacy fixed-precision rounds COMPUTED intersection points to the
    # model (LineIntersector + PrecisionModel).  The legacy path applies
    # this when an areal operand is involved; pure line/line keeps exact
    # nodes - this engine's per-segment line dedup would otherwise merge
    # retraces that only coincide AFTER rounding, which the reference
    # keeps as one edge (TestOverlayLLPrec "narrow V").  NG always rounds:
    # its inputs are already snap-rounded.
    node_grid = grid if (hot or ea.dim == 2 or eb.dim == 2) else None
    splits_a = [[] for _ in ea.segs]
    splits_b = [[] for _ in eb.segs]
    ovl_a = [[] for _ in ea.segs]
    ovl_b = [[] for _ in eb.segs]
    node_pts: set = set()  # points where the two geometries interact
    if ea.segs and eb.segs:
        sa = np.array([(s[0][0], s[0][1], s[1][0], s[1][1]) for s in ea.segs])
        sb = np.array([(s[0][0], s[0][1], s[1][0], s[1][1]) for s in eb.segs])
        cand = _candidate_pairs(sa, sb)
        for ia, ib in cand:
            s1 = ea.segs[ia]
            s2 = eb.segs[ib]
            kind, pts = alg.segment_intersection(s1[0], s1[1], s2[0], s2[1])
            if kind == "none":
                continue
            if kind == "point":
                p = (float(pts[0][0]), float(pts[0][1]))
                if node_grid:
                    # precision model: every arrangement node lands on the grid
                    p = _snap_round_pt(p, node_grid)
                node_pts.add(p)
                splits_a[ia].append(_param_t(s1, p))
                splits_b[ib].append(_param_t(s2, p))
            else:
                p0 = (float(pts[0][0]), float(pts[0][1]))
                p1 = (float(pts[1][0]), float(pts[1][1]))
                node_pts.add(p0)
                node_pts.add(p1)
                t0a, t1a = _param_t(s1, p0), _param_t(s1, p1)
                splits_a[ia].extend([t0a, t1a])
                same_dir_a = _same_dir(s1, s2)
                # other-interior-left relative to A piece direction
                oil = s2[3] if same_dir_a else (not s2[3])
                ovl_a[ia].append((min(t0a[0], t1a[0]), max(t0a[0], t1a[0]), oil, s2[2]))
                t0b, t1b = _param_t(s2, p0), _param_t(s2, p1)
                splits_b[ib].extend([t0b, t1b])
                oil_b = s1[3] if same_dir_a else (not s1[3])
                ovl_b[ib].append((min(t0b[0], t1b[0]), max(t0b[0], t1b[0]), oil_b, s1[2]))
    # full self-noding: each operand's segments split where its OWN other
    # segments/vertices touch or cross them (hole vertex on shell edge,
    # multilinestring self-crossings — the reference nodes these and its
    # output rings/lines include the node).  A point strictly interior to a
    # segment is an arrangement node; plain chain vertices are not.
    for es, splits in ((ea, splits_a), (eb, splits_b)):
        segs = es.segs
        if len(segs) > 1:
            s_arr = np.array([(s[0][0], s[0][1], s[1][0], s[1][1]) for s in segs])
            self_cand = _candidate_pairs(s_arr)
        else:
            self_cand = ()
        for i9, j9 in self_cand:
            s1 = segs[i9]
            s2 = segs[j9]
            kind, pts = alg.segment_intersection(s1[0], s1[1], s2[0], s2[1])
            if kind == "none":
                continue
            for p in pts if kind == "overlap" else pts[:1]:
                p = (float(p[0]), float(p[1]))
                if node_grid:
                    p = _snap_round_pt(p, node_grid)
                in1 = p != s1[0] and p != s1[1]
                in2 = p != s2[0] and p != s2[1]
                if in1:
                    splits[i9].append(_param_t(s1, p))
                if in2:
                    splits[j9].append(_param_t(s2, p))
                if in1 or in2:
                    node_pts.add(p)
        for v in es.points:
            for i9, s1 in enumerate(segs):
                if v != s1[0] and v != s1[1] and alg.on_segment(
                    v[0], v[1], s1[0][0], s1[0][1], s1[1][0], s1[1][1]
                ):
                    splits[i9].append(_param_t(s1, v))
                    node_pts.add(v)
    # isolated points of each split the other's segments (OverlayNG nodes
    # at point-operand touches; the legacy engine does not)
    for p in (ea.points if point_noding else ()):
        for ib, s2 in enumerate(eb.segs):
            if alg.on_segment(p[0], p[1], s2[0][0], s2[0][1], s2[1][0], s2[1][1]):
                splits_b[ib].append(_param_t(s2, p))
    for p in (eb.points if point_noding else ()):
        for ia, s1 in enumerate(ea.segs):
            if alg.on_segment(p[0], p[1], s1[0][0], s1[0][1], s1[1][0], s1[1][1]):
                splits_a[ia].append(_param_t(s1, p))
    # revisited vertices (ring start, self-touching path) are chain-break
    # points for LEGACY line output but not general arrangement nodes
    revisit: set = set()
    for es in (ea, eb):
        counts: dict = {}
        last_by_comp: dict = {}
        for s in es.segs:
            counts[s[0]] = counts.get(s[0], 0) + 1
            last_by_comp[s[4]] = s[1]
        for p in last_by_comp.values():
            counts[p] = counts.get(p, 0) + 1
        for p, c in counts.items():
            if c >= 2:
                revisit.add(p)
    if grid and hot:
        # hot-pixel pass: a segment passing within half a grid cell of any
        # node snaps to (is split at) that node — the reference's
        # SnapRoundingNoder hot-pixel rule (Noding/Snapround/SnapRoundingNoder.cs:38)
        all_nodes = set(node_pts)
        for es in (ea, eb):
            for s in es.segs:
                all_nodes.add(s[0])
                all_nodes.add(s[1])
        half = grid / 2.0
        narr = np.array(sorted(all_nodes), dtype=np.float64) if all_nodes else np.empty((0, 2))
        for es, splits in ((ea, splits_a), (eb, splits_b)):
            for i9, s in enumerate(es.segs):
                if len(narr) == 0:
                    continue
                minx = min(s[0][0], s[1][0]) - half
                maxx = max(s[0][0], s[1][0]) + half
                miny = min(s[0][1], s[1][1]) - half
                maxy = max(s[0][1], s[1][1]) + half
                cand = narr[
                    (narr[:, 0] >= minx)
                    & (narr[:, 0] <= maxx)
                    & (narr[:, 1] >= miny)
                    & (narr[:, 1] <= maxy)
                ]
                if len(cand) == 0:
                    continue
                for q in cand:
                    qt = (float(q[0]), float(q[1]))
                    if qt == s[0] or qt == s[1]:
                        continue
                    # hot pixel = the axis-aligned square of side `grid`
                    # around the node (Chebyshev, not euclidean): a segment
                    # crossing the square snaps to the node
                    if _segment_hits_pixel(s[0], s[1], qt, half):
                        # hot-pixel bends split the segment but are SOFT
                        # nodes: NG line chains merge through them (only
                        # true crossings/junctions break chains)
                        splits[i9].append(_param_t(s, qt))
    return (
        _make_pieces(ea, splits_a, ovl_a),
        _make_pieces(eb, splits_b, ovl_b),
        node_pts,
        revisit,
    )


def _candidate_pairs(sa, sb=None):
    """Bbox-overlap candidate pairs (MCIndexNoder/monotone-chain role,
    reference Noding/MCIndexNoder.cs): dense vectorized mask for small
    inputs, hashed uniform-grid buckets beyond — the dense matrix is
    O(n·m) memory and the all-pairs scalar probe it replaced made the
    self-noding of large accumulated unions quadratic (3.7M
    segment_intersection calls in a 600-part cascade).  With sb=None,
    returns within-set pairs (i < j); else cross pairs."""
    n = len(sa)
    m = n if sb is None else len(sb)
    if n * m <= 1_000_000:
        if sb is None:
            return [(i, j) for i, j in _bbox_pairs(sa, sa) if i < j]
        return list(_bbox_pairs(sa, sb))

    def _ext(s):
        return (
            np.minimum(s[:, 0], s[:, 2]),
            np.minimum(s[:, 1], s[:, 3]),
            np.maximum(s[:, 0], s[:, 2]),
            np.maximum(s[:, 1], s[:, 3]),
        )

    aminx, aminy, amaxx, amaxy = _ext(sa)
    if sb is None:
        bminx, bminy, bmaxx, bmaxy = aminx, aminy, amaxx, amaxy
    else:
        bminx, bminy, bmaxx, bmaxy = _ext(sb)
    gx0 = min(float(aminx.min()), float(bminx.min()))
    gy0 = min(float(aminy.min()), float(bminy.min()))
    span = max(
        max(float(amaxx.max()), float(bmaxx.max())) - gx0,
        max(float(amaxy.max()), float(bmaxy.max())) - gy0,
        0.0,
    )
    avg = (
        float(np.mean(amaxx - aminx))
        + float(np.mean(amaxy - aminy))
        + float(np.mean(bmaxx - bminx))
        + float(np.mean(bmaxy - bminy))
    ) / 4.0
    cell = max(avg * 2.0, span / 2048.0)
    if cell <= 0.0:
        # all segments degenerate to one point: everything is a candidate
        if sb is None:
            return [(i, j) for i in range(n) for j in range(i + 1, n)]
        return [(i, j) for i in range(n) for j in range(m)]

    def _insert(buckets, oversize, minxs, minys, maxxs, maxys, slot):
        ix0 = np.floor((minxs - gx0) / cell).astype(np.int64)
        iy0 = np.floor((minys - gy0) / cell).astype(np.int64)
        ix1 = np.floor((maxxs - gx0) / cell).astype(np.int64)
        iy1 = np.floor((maxys - gy0) / cell).astype(np.int64)
        for i in range(len(minxs)):
            # a bbox spanning many cells (long near-diagonal segment) would
            # blow up insertion; pair it against everything instead
            if (ix1[i] - ix0[i] + 1) * (iy1[i] - iy0[i] + 1) > 1024:
                oversize[slot].append(i)
                continue
            for cx in range(ix0[i], ix1[i] + 1):
                for cy in range(iy0[i], iy1[i] + 1):
                    buckets.setdefault((cx, cy), ([], []))[slot].append(i)

    buckets: dict = {}
    oversize: tuple = ([], [])
    _insert(buckets, oversize, aminx, aminy, amaxx, amaxy, 0)
    if sb is not None:
        _insert(buckets, oversize, bminx, bminy, bmaxx, bmaxy, 1)
    pairs = set()
    if oversize[0] or oversize[1]:
        if sb is None:
            for i in oversize[0]:
                for j in range(n):
                    if i == j:
                        continue
                    a, b = (i, j) if i < j else (j, i)
                    if (
                        aminx[a] <= amaxx[b]
                        and amaxx[a] >= aminx[b]
                        and aminy[a] <= amaxy[b]
                        and amaxy[a] >= aminy[b]
                    ):
                        pairs.add((a, b))
        else:
            for i in oversize[0]:
                for j in range(m):
                    if (
                        aminx[i] <= bmaxx[j]
                        and amaxx[i] >= bminx[j]
                        and aminy[i] <= bmaxy[j]
                        and amaxy[i] >= bminy[j]
                    ):
                        pairs.add((i, j))
            for j in oversize[1]:
                for i in range(n):
                    if (
                        aminx[i] <= bmaxx[j]
                        and amaxx[i] >= bminx[j]
                        and aminy[i] <= bmaxy[j]
                        and amaxy[i] >= bminy[j]
                    ):
                        pairs.add((i, j))
    if sb is None:
        for la, _ in buckets.values():
            for pi in range(len(la)):
                i = la[pi]
                for pj in range(pi + 1, len(la)):
                    j = la[pj]
                    a, b = (i, j) if i < j else (j, i)
                    if (a, b) not in pairs and (
                        aminx[a] <= amaxx[b]
                        and amaxx[a] >= aminx[b]
                        and aminy[a] <= amaxy[b]
                        and amaxy[a] >= aminy[b]
                    ):
                        pairs.add((a, b))
    else:
        for la, lb in buckets.values():
            for i in la:
                for j in lb:
                    if (i, j) not in pairs and (
                        aminx[i] <= bmaxx[j]
                        and amaxx[i] >= bminx[j]
                        and aminy[i] <= bmaxy[j]
                        and amaxy[i] >= bminy[j]
                    ):
                        pairs.add((i, j))
    return sorted(pairs)


def _bbox_pairs(sa, sb):
    aminx = np.minimum(sa[:, 0], sa[:, 2])[:, None]
    amaxx = np.maximum(sa[:, 0], sa[:, 2])[:, None]
    aminy = np.minimum(sa[:, 1], sa[:, 3])[:, None]
    amaxy = np.maximum(sa[:, 1], sa[:, 3])[:, None]
    bminx = np.minimum(sb[:, 0], sb[:, 2])[None, :]
    bmaxx = np.maximum(sb[:, 0], sb[:, 2])[None, :]
    bminy = np.minimum(sb[:, 1], sb[:, 3])[None, :]
    bmaxy = np.maximum(sb[:, 1], sb[:, 3])[None, :]
    cand = (aminx <= bmaxx) & (amaxx >= bminx) & (aminy <= bmaxy) & (amaxy >= bminy)
    return zip(*np.nonzero(cand))


def _segment_hits_pixel(p0, p1, c, half) -> bool:
    """Liang-Barsky: does segment p0p1 intersect the square c +- half?"""
    x0, y0 = p0
    dx = p1[0] - x0
    dy = p1[1] - y0
    t0, t1 = 0.0, 1.0
    for p, q in (
        (-dx, x0 - (c[0] - half)),
        (dx, (c[0] + half) - x0),
        (-dy, y0 - (c[1] - half)),
        (dy, (c[1] + half) - y0),
    ):
        if p == 0:
            if q < 0:
                return False
            continue
        r = q / p
        if p < 0:
            if r > t1:
                return False
            if r > t0:
                t0 = r
        else:
            if r < t0:
                return False
            if r < t1:
                t1 = r
    if t0 > t1:
        return False
    # half-open pixel (closed bottom/left, open top/right — the reference's
    # HotPixel convention): a graze along the top/right boundary must not
    # snap, or diagonal edges touching a pixel corner get spurious bends
    tm = (t0 + t1) / 2.0
    px = x0 + tm * dx
    py = y0 + tm * dy
    return px < c[0] + half and py < c[1] + half


def _param_t(seg, pt):
    """Ordering parameter of pt along seg by scalar projection — snap-round
    bend points lie OFF the segment, where a dominant-axis parameter can
    collide with an endpoint and silently replace it."""
    dx = seg[1][0] - seg[0][0]
    dy = seg[1][1] - seg[0][1]
    ll = dx * dx + dy * dy
    if ll == 0:
        return (0.0, pt)
    t = ((pt[0] - seg[0][0]) * dx + (pt[1] - seg[0][1]) * dy) / ll
    return (t, pt)


def _same_dir(s1, s2) -> bool:
    d1 = (s1[1][0] - s1[0][0], s1[1][1] - s1[0][1])
    d2 = (s2[1][0] - s2[0][0], s2[1][1] - s2[0][1])
    return d1[0] * d2[0] + d1[1] * d2[1] > 0


def _make_pieces(es: _Edges, splits, ovls):
    pieces = []
    for i2, seg in enumerate(es.segs):
        cuts = sorted({0.0, 1.0} | {t for t, _ in splits[i2]})
        pts = {0.0: seg[0], 1.0: seg[1]}
        for t, p in splits[i2]:
            pts[t] = p
        for k in range(len(cuts) - 1):
            t0, t1 = cuts[k], cuts[k + 1]
            if t1 - t0 <= 1e-14:
                continue
            p0 = pts[t0]
            p1 = pts[t1]
            if p0 == p1:
                continue
            over = None
            for o0, o1, oil, okind in ovls[i2]:
                if t0 >= o0 - 1e-14 and t1 <= o1 + 1e-14:
                    over = (oil, okind)
                    break
            pieces.append(
                {
                    "p0": p0,
                    "p1": p1,
                    "kind": seg[2],
                    "il": seg[3],
                    "over": over,
                    "comp": seg[4],
                    "segidx": seg[5],
                    "t0": t0,
                }
            )
    return pieces


# ---------------------------------------------------------------------------
# area/area overlay


def _member(locA, locB, op: str) -> bool:
    if op == "intersection":
        return locA == I and locB == I
    if op == "union":
        return locA == I or locB == I
    if op == "difference":
        return locA == I and locB != I
    return (locA == I) != (locB == I)


def _overlay_general(a: Geom, b: Geom, op: str, merge_line_output: bool = True, ng: bool = False, grid: float | None = None, weld: bool = False, point_loc_geoms=None) -> Geom | None:
    ea = _Edges(a)
    eb = _Edges(b)
    pa, pb, node_pts, revisit = _node_edges(
        ea, eb, point_noding=ng, grid=(None if (weld and not ng) else grid), hot=ng
    )

    result_edges = []  # directed (p0, p1) with result interior on left
    line_pieces = []  # dim-1 resultants
    collapse_pieces = []  # legacy dimensional-collapse lines (unfiltered)
    seen_shared = set()
    seen_shared_lines = set()
    seen_own_interior = set()

    # legacy fixed precision: node rounding can make two ring pieces of the
    # SAME operand coincide with opposite interior sides (adjacent shells,
    # zero-width slivers).  The merged edge is interior to that operand
    # (Label becomes a dim-collapse line label, GeometryGraph.EdgeList
    # merge): it is NOT a result-area boundary, and it surfaces as a LINE
    # resultant wherever the op includes (I, loc_other) - even inside the
    # result area (observed legacy artifact, TestOverlayAAPrec).
    own_interior_keys_a: set = set()
    own_interior_keys_b: set = set()
    if grid and not weld:
        for pieces, tgt in ((pa, own_interior_keys_a), (pb, own_interior_keys_b)):
            groups: dict = {}
            for p in pieces:
                if p["kind"] != "ring":
                    continue
                k = _piece_key(p)
                nil = p["il"] if p["p0"] == k[0] else (not p["il"])
                groups.setdefault(k, set()).add(nil)
            for k, nils in groups.items():
                if len(nils) == 2:
                    tgt.add(k)

    # exact piece-coincidence across sides: snap-rounding can bend two
    # non-collinear input segments onto the SAME noded piece — detect by
    # endpoint identity and synthesize the overlap label the collinear
    # detector could not see
    ring_keys_a = {_piece_key(p) for p in pa if p["kind"] == "ring"}
    ring_keys_b = {_piece_key(p) for p in pb if p["kind"] == "ring"}
    if grid:
        a_map = {_piece_key(p): p for p in pa}
        b_map = {_piece_key(p): p for p in pb}
        for side_pieces, other_map in ((pa, b_map), (pb, a_map)):
            for piece in side_pieces:
                if piece["over"] is not None:
                    continue
                other = other_map.get(_piece_key(piece))
                if other is None:
                    continue
                # lineal pieces only: a bent ring piece's interior side is
                # no longer its structural il, so area labels stay on the
                # midpoint-location path
                if piece["kind"] != "ring" and other["kind"] != "ring":
                    piece["over"] = (False, other["kind"])
                elif piece["kind"] != "ring" and other["kind"] == "ring":
                    piece["over"] = (False, "ring")

    def classify_area_side(piece, other: _Edges):
        """Location of the piece's 2-D SIDES w.r.t. the other operand's
        AREA components only — lineal features have measure zero beside a
        2-D neighborhood and never make a side Interior."""
        memo = piece.get("_side")
        if memo is not None:
            return memo
        mx = (piece["p0"][0] + piece["p1"][0]) / 2.0
        my = (piece["p0"][1] + piece["p1"][1]) / 2.0
        crossings = 0
        for ce, renvs, rings in other.area_comps():
            if my < ce[1] or my > ce[3] or mx < ce[0] or mx > ce[2]:
                continue
            loc = alg.locate_point_in_rings(mx, my, rings, renvs)
            if loc == B:
                return I  # on a ring not detected as overlap: treat covered
            if loc == I:
                crossings += 1
        return I if crossings % 2 == 1 else E

    def handle_area_piece(piece, own_is_a: bool, other: _Edges, other_geom: Geom):
        """Ring piece → maybe a result boundary edge and/or a line resultant."""
        key0 = _piece_key(piece)
        own_coll = own_interior_keys_a if own_is_a else own_interior_keys_b
        other_coll = own_interior_keys_b if own_is_a else own_interior_keys_a
        if key0 in own_coll:
            # collapsed-interior edge of this operand: no boundary edge;
            # a line resultant if the op includes (I, loc_other)
            if key0 in seen_own_interior:
                return
            seen_own_interior.add(key0)
            if ng:
                # OverlayNG: probe the operand's area depth on each side.
                # interior|interior -> gap collapse, faces fuse silently;
                # exterior|exterior -> a zero-width INTERIOR strip (shell
                # meeting hole): collapsed line with own location I
                mx = (piece["p0"][0] + piece["p1"][0]) / 2.0
                my = (piece["p0"][1] + piece["p1"][1]) / 2.0
                dx = piece["p1"][0] - piece["p0"][0]
                dy = piece["p1"][1] - piece["p0"][1]
                ll = math.hypot(dx, dy)
                eps = (grid or 1.0) * 1e-3
                ox, oy = -dy / ll * eps, dx / ll * eps

                def _loc_own(px, py):
                    cr = 0
                    for ce, renvs, rings in (ea if own_is_a else eb).area_comps():
                        if py < ce[1] or py > ce[3] or px < ce[0] or px > ce[2]:
                            continue
                        lo = alg.locate_point_in_rings(px, py, rings, renvs)
                        if lo == B:
                            return I
                        if lo == I:
                            cr += 1
                    return I if cr % 2 == 1 else E

                dl_ = _loc_own(mx + ox, my + oy)
                dr_ = _loc_own(mx - ox, my - oy)
                if dl_ == I and dr_ == I:
                    return
                if dl_ == E and dr_ == E:
                    loc_other = classify_area_side(piece, other)
                    la2, lb2 = (I, loc_other) if own_is_a else (loc_other, I)
                    if _member(la2, lb2, op):
                        line_pieces.append(
                            (piece["p0"], piece["p1"], "shared", ("a" if own_is_a else "b", piece["comp"], piece["segidx"], piece["t0"]))
                        )
                    return
                # mixed: genuine boundary edge with interior on the probed side
                loc_other = classify_area_side(piece, other)
                la_l, lb_l = (dl_, loc_other) if own_is_a else (loc_other, dl_)
                la_r, lb_r = (dr_, loc_other) if own_is_a else (loc_other, dr_)
                m_l2 = _member(la_l, lb_l, op)
                m_r2 = _member(la_r, lb_r, op)
                if m_l2 != m_r2:
                    if m_l2:
                        result_edges.append((piece["p0"], piece["p1"]))
                    else:
                        result_edges.append((piece["p1"], piece["p0"]))
                return
            if piece["over"] is not None and piece["over"][1] == "ring":
                loc_other = I  # on the other's boundary: counts as covered
            else:
                loc_other = classify_area_side(piece, other)
            la2, lb2 = (I, loc_other) if own_is_a else (loc_other, I)
            if _member(la2, lb2, op):
                collapse_pieces.append(
                    (piece["p0"], piece["p1"], "shared", ("a" if own_is_a else "b", piece["comp"], piece["segidx"], piece["t0"]))
                )
            return
        il = piece["il"]
        own_left, own_right = (I, E) if il else (E, I)
        over = piece["over"]
        if over is not None and over[1] == "ring" and key0 in other_coll:
            # coincident with a collapsed pair of the OTHER operand: its
            # 2-D sides there are Exterior (zero-width interior)
            o_left = o_right = E
        elif over is not None and over[1] == "ring":
            key = _piece_key(piece)
            if key in seen_shared:
                return
            seen_shared.add(key)
            o_left, o_right = (I, E) if over[0] else (E, I)
        else:
            # collinear with the other's LINE features or clear of it either
            # way: the 2-D sides are located against its AREA parts only
            o_left = o_right = classify_area_side(piece, other)
        if own_is_a:
            left = (own_left, o_left)
            right = (own_right, o_right)
        else:
            left = (o_left, own_left)
            right = (o_right, own_right)
        m_l = _member(left[0], left[1], op)
        m_r = _member(right[0], right[1], op)
        if m_l != m_r:
            if m_l:
                result_edges.append((piece["p0"], piece["p1"]))
            else:
                result_edges.append((piece["p1"], piece["p0"]))
        elif (
            not m_l
            and op == "intersection"
            and (
                (over is not None and over[1] == "ring")
                or (
                    grid
                    and _piece_key(piece)
                    in (ring_keys_b if own_is_a else ring_keys_a)
                )
            )
        ):
            # shared edge between abutting polygons: 1-D intersection resultant
            key = _piece_key(piece)
            if key not in seen_shared_lines:
                seen_shared_lines.add(key)
                line_pieces.append(
                    (piece["p0"], piece["p1"], "shared", ("a" if own_is_a else "b", piece["comp"], piece["segidx"], piece["t0"]))
                )

    # area boundaries — classify every ring piece's midpoint against the
    # other operand in ONE vectorized pass per side (the scalar per-piece
    # probe scanned the other operand's whole boundary per call and was
    # the hot loop of large cascaded unions); classify_area_side consults
    # the memo, falling back to the scalar kernel only for pieces built
    # after this point (collapsed-line probes use offset points anyway)
    for pieces, other in ((pa, eb), (pb, ea)):
        ring_ps = [p for p in pieces if p["kind"] == "ring"]
        if ring_ps and other.area_comps():
            mids = np.array(
                [
                    (
                        (p["p0"][0] + p["p1"][0]) / 2.0,
                        (p["p0"][1] + p["p1"][1]) / 2.0,
                    )
                    for p in ring_ps
                ]
            )
            sides = _batch_area_side(mids, other.area_comps())
            for p, s in zip(ring_ps, sides):
                p["_side"] = int(s)
    for piece in pa:
        if piece["kind"] == "ring":
            handle_area_piece(piece, True, eb, b)
    for piece in pb:
        if piece["kind"] == "ring":
            handle_area_piece(piece, False, ea, a)

    degenerate_rings: list = []
    polygons = _assemble_polygons(result_edges, degenerate_out=degenerate_rings)
    polygons = _split_touching_holes(polygons)
    if grid and op in ("intersection", "union"):
        # collapsed result slivers (zero-area rings) surface as lineal
        # resultants under fixed precision (OverlayNG SR behavior)
        for r in degenerate_rings:
            seen_d = set()
            for k3 in range(len(r) - 1):
                a3 = (float(r[k3][0]), float(r[k3][1]))
                b3 = (float(r[k3 + 1][0]), float(r[k3 + 1][1]))
                kk = (min(a3, b3), max(a3, b3))
                if a3 != b3 and kk not in seen_d:
                    seen_d.add(kk)
                    line_pieces.append((a3, b3, "shared", ("a", -1, k3, 0.0)))

    # lineal operands; collapsed linework participates in every op
    # (A-collapsed spikes survive difference where B does not cover them)
    for piece in pa:
        if piece["kind"] in ("line", "cline"):
            _handle_line_piece(piece, True, b, op, line_pieces)
    for piece in pb:
        if piece["kind"] == "line" or (piece["kind"] == "cline" and op != "difference"):
            _handle_line_piece(piece, False, a, op, line_pieces)

    # puntal resultants; under OverlayNG snap-rounding, a rounded point
    # operand is located against the ORIGINAL other geometry - the
    # non-point input is not rounded for the location test (reference:
    # OverlayNG/OverlayMixedPoints.cs; TestNGOverlayPPrec "line is not
    # rounded")
    # ...but only when the other operand is non-puntal: point-vs-point
    # compares rounded against rounded, and derived boundary-touch nodes
    # come from the rounded arrangement
    loc_a = point_loc_geoms[0] if (point_loc_geoms and ea.dim >= 1) else a
    loc_b = point_loc_geoms[1] if (point_loc_geoms and eb.dim >= 1) else b
    points = _point_resultants(loc_a, loc_b, ea, eb, pa, pb, op, touch_a=a, touch_b=b)

    # legacy fixed precision: a crossing between COLLAPSED interior edges
    # (or a lineal piece and the other operand's collapsed edge) is a
    # point with location (I, I) - a point resultant where the op admits
    # it and nothing higher-dimensional covers it (PointBuilder over
    # dim-collapse labels; TestOverlayAAPrec "intersecting slivers")
    if grid and not ng and not weld and (own_interior_keys_a or own_interior_keys_b):
        colla = [p for p in pa if p["kind"] == "ring" and _piece_key(p) in own_interior_keys_a]
        collb = [p for p in pb if p["kind"] == "ring" and _piece_key(p) in own_interior_keys_b]
        linesa = [p for p in pa if p["kind"] == "line"]
        linesb = [p for p in pb if p["kind"] == "line"]
        seen_cp = set()
        if _member(I, I, op):
            for side1, side2 in ((colla, collb + linesb), (linesa, collb)):
                for p1 in side1:
                    for p2 in side2:
                        _k4, ipts = alg.segment_intersection(p1["p0"], p1["p1"], p2["p0"], p2["p1"])
                        for q in ipts:
                            q = (float(q[0]), float(q[1]))
                            if q not in seen_cp:
                                seen_cp.add(q)
                                points.append((q, True))

    # drop lower-dim resultants covered by higher-dim ones
    poly_geoms = [Geom(POLYGON, rings) for rings in polygons]
    if merge_line_output:
        lines = _legacy_lines(line_pieces, node_pts | revisit)
        extra_lines = _legacy_lines(collapse_pieces, node_pts | revisit) if collapse_pieces else []
    else:
        lines = _ng_lines(line_pieces, node_pts)
        extra_lines = []
    lines = [ln for ln in lines if not _line_covered(ln, poly_geoms)] + extra_lines
    pts = [
        p
        for p, derived in points
        if not _point_covered(p, poly_geoms, lines)
    ]

    protected = {
        (min(p0, p1), max(p0, p1)) for p0, p1, _k, _m in collapse_pieces
    }
    return _compose(polygons, lines, pts), protected


def _piece_key(piece):
    return (min(piece["p0"], piece["p1"]), max(piece["p0"], piece["p1"]))


def _handle_line_piece(piece, own_is_a: bool, other_geom: Geom, op: str, line_pieces):
    over = piece["over"]
    if over is not None:
        locO = B if over[1] == "ring" else I
    else:
        mx = (piece["p0"][0] + piece["p1"][0]) / 2.0
        my = (piece["p0"][1] + piece["p1"][1]) / 2.0
        locO = alg.locate_in_geom(mx, my, other_geom)
    # line piece location in own geometry = Interior (dim 1)
    if own_is_a:
        locA, locB_ = I, locO
    else:
        locA, locB_ = locO, I
    keep = False
    if op == "intersection":
        keep = locA != E and locB_ != E
    elif op == "union":
        if own_is_a:
            keep = True if locO == E else locO == B and False or locO == E
            keep = locO == E or locO == B and False
            keep = locO == E
        else:
            keep = locO == E
        # union keeps each line piece once; shared pieces kept from A side
        if over is not None and over[1] != "ring" and own_is_a:
            keep = True
        elif over is not None and own_is_a and over[1] == "ring":
            keep = False  # covered by the area operand
    elif op == "difference":
        keep = own_is_a and locO == E
    else:  # symdifference
        keep = locO == E
    if keep:
        label = "shared" if (over is not None) else ("a" if own_is_a else "b")
        line_pieces.append(
            (piece["p0"], piece["p1"], label, ("a" if own_is_a else "b", piece["comp"], piece["segidx"], piece["t0"]))
        )


def _point_resultants(a, b, ea, eb, pa, pb, op, touch_a=None, touch_b=None):
    """Isolated points of the result: operand points kept per op + boundary
    touch points in an intersection."""
    pts = []  # (point, is_derived_touch)
    ea_points = list(dict.fromkeys(ea.points))
    eb_points = list(dict.fromkeys(eb.points))
    if op == "intersection":
        for p in ea_points:
            if alg.locate_in_geom(p[0], p[1], b) != E:
                pts.append((p, False))
        for p in eb_points:
            if alg.locate_in_geom(p[0], p[1], a) != E and (p, False) not in pts:
                pts.append((p, False))
        if ea.dim >= 1 and eb.dim >= 1:
            # boundary/boundary touch nodes (derived, absorbed by any
            # polygon contact downstream).  A node that is an endpoint of
            # noded pieces from BOTH sides lies on both by construction -
            # the float locate can miss a rational crossing point
            ends_a = {q for piece in pa for q in (piece["p0"], piece["p1"])}
            ends_b = {q for piece in pb for q in (piece["p0"], piece["p1"])}
            for q in ends_a | ends_b:
                la = alg.locate_in_geom(q[0], q[1], touch_a if touch_a is not None else a)
                lb = alg.locate_in_geom(q[0], q[1], touch_b if touch_b is not None else b)
                if la == E and q in ends_a and q in ends_b:
                    la = I
                if lb == E and q in ends_a and q in ends_b:
                    lb = I
                if la != E and lb != E:
                    pts.append((q, True))
    elif op == "union":
        # every operand point appears once; coincidences dedup; points
        # covered by kept lines/areas are filtered downstream
        for p in ea_points:
            if (p, False) not in pts:
                pts.append((p, False))
        for p in eb_points:
            if (p, False) not in pts:
                pts.append((p, False))
    elif op == "difference":
        for p in ea_points:
            if alg.locate_in_geom(p[0], p[1], b) == E:
                pts.append((p, False))
    else:
        for p in ea_points:
            if alg.locate_in_geom(p[0], p[1], b) == E:
                pts.append((p, False))
        for p in eb_points:
            if alg.locate_in_geom(p[0], p[1], a) == E:
                pts.append((p, False))
    return pts


# ---------------------------------------------------------------------------
# ring assembly


def _succ_orbits(directed_edges):
    """Sharpest-left successor permutation over deduplicated directed
    edges, decomposed into cycles — the shared face-walk kernel of
    overlay assembly, polygonize, and the tile-distributed polygonize
    stages.  Unlike a stateful used-marks walk, the permutation has no
    traversal state, so its orbits are well-defined objects: an orbit
    whose vertices all have complete stars IS the global orbit — the
    atomicity the tile split needs.

    Formulation: rotation system.  Outgoing edges at each vertex are
    CCW-sorted by the key (atan2 angle, TARGET VERTEX) — not angle
    alone: at ULP tangles two outgoing edges can have EXACTLY equal
    atan2 (targets 1 ULP apart on one axis), and an angle-only match
    sends both reversals to the same slot, collapsing succ into a
    non-injective map whose rho-tail edges silently drop from every
    orbit.  The successor of e is the cyclic PREDECESSOR of rev(e)'s
    key slot (= sharpest left turn; immediate double-back only when
    rev(e) is the sole outgoing edge).  When rev(e) is absent (overlay
    emits one-directional half-edges; stitch levels see residual
    subsets) the bisect lands where rev(e) WOULD sit, and the entry
    before that slot is still the global successor — the open interval
    between an edge's global successor and its reversal is empty
    globally, hence empty in any subset containing the successor.

    Returns a list of edge-index cycles; edges not on a cycle (open
    chains into a dead end) appear in no orbit."""
    import bisect

    out_by_node: dict = {}
    for idx, (p0, p1) in enumerate(directed_edges):
        out_by_node.setdefault(p0, []).append(idx)
    rings: dict = {}
    for v, out_idx in out_by_node.items():
        ring = sorted(
            (
                (
                    math.atan2(
                        directed_edges[i3][1][1] - v[1],
                        directed_edges[i3][1][0] - v[0],
                    ),
                    directed_edges[i3][1],
                ),
                i3,
            )
            for i3 in out_idx
        )
        rings[v] = ([key for key, _ in ring], [i3 for _, i3 in ring])
    n = len(directed_edges)
    succ = np.full(n, -1, dtype=np.int64)
    for idx, (p0, p1) in enumerate(directed_edges):
        entry = rings.get(p1)
        if entry is None:
            continue  # dead end: no outgoing at head (pruned dangle tip)
        keys, ids = entry
        a_rev = math.atan2(p0[1] - p1[1], p0[0] - p1[0])
        k = bisect.bisect_left(keys, (a_rev, p0))
        succ[idx] = ids[k - 1]  # k-1 == -1 wraps to the last slot
    # orbit decomposition (edges whose head has no outgoing keep
    # succ == -1 and sit on no orbit; rho tails are consumed unsaved)
    state = np.zeros(n, dtype=np.int8)  # 0 unseen, 1 on path, 2 done
    orbits = []
    for e0 in range(n):
        if state[e0]:
            continue
        path = []
        pos2: dict = {}
        e = e0
        while e != -1 and state[e] == 0:
            state[e] = 1
            pos2[e] = len(path)
            path.append(e)
            e = int(succ[e])
        if e != -1 and state[e] == 1 and e in pos2:
            cyc = path[pos2[e]:]
            # canonical rotation: start each cycle at its minimal
            # directed-edge tuple.  The minimal-ring split of a cycle
            # with INTERLEAVED repeated vertices (A..B..A..B pinch
            # chains) regroups differently per rotation; pinning the
            # rotation to a value-only key makes the decomposition a
            # function of the edge SET, independent of enumeration
            # order (kernel iterates a hash-ordered dedup set, the
            # tile stages a sorted list — they must split alike)
            k0 = min(range(len(cyc)), key=lambda i9: directed_edges[cyc[i9]])
            orbits.append(cyc[k0:] + cyc[:k0])
        for p in path:
            state[p] = 2
    return orbits


def _trace_rings(directed_edges, ring_edges_out=None):
    """Face rings over DEDUPLICATED directed edges (interior on LEFT):
    the `_succ_orbits` cycles, each split at repeated nodes into minimal
    rings (reference: Operation/Overlay/MaximalEdgeRing →
    MinimalEdgeRing).  Returns closed (N,2) float arrays.  When
    ring_edges_out is given, one list of directed-edge INDICES per
    returned ring is appended to it (the half-edges that ring consumed —
    the accounting hook tile-distributed polygonize needs)."""
    rings = []
    for orbit in _succ_orbits(directed_edges):
        verts = [directed_edges[e][0] for e in orbit]
        ring = verts + [verts[0]]
        for sub_v, sub_e in _split_minimal_rings_indexed(ring, list(orbit)):
            rings.append(np.array(sub_v, dtype=np.float64))
            if ring_edges_out is not None:
                ring_edges_out.append(sub_e)
    return rings


def _area_resolution(ring: np.ndarray) -> float:
    """Smallest ring area distinguishable from zero at this coordinate
    magnitude: every vertex of a float arrangement carries ~ulp(|coord|)
    of noding noise, and displacing each boundary vertex by d changes
    the enclosed area by up to perimeter*d.  Rings whose |area| is below
    this floor are collapsed spurs (e.g. an out-and-back excursion whose
    base points differ by one ulp — true area ~1e-11 at coords ~1e6),
    which the reference's snap ladder welds away; genuine small faces
    sit far above it (a unit square at 3.7e7 has floor ~3e-8)."""
    if len(ring) < 3:
        return 0.0
    m = float(np.max(np.abs(ring)))
    if m == 0.0:
        return 0.0
    d = np.diff(ring, axis=0)
    perimeter = float(np.sqrt((d * d).sum(axis=1)).sum())
    return 2.0 * perimeter * float(np.spacing(m))


def _weld_unbalanced_micro_nodes(edges):
    """Close micro-gaps in the result boundary graph.  Noding can place
    the SAME geometric node at two floats a few ulp apart via different
    operand edges (an operand corner vs the crossing computed on the
    other operand's near-coincident edge), and the sub-1e-14-parameter
    piece connecting the twins is dropped by the piece-length floor —
    leaving one node with surplus in-degree and its twin with surplus
    out-degree, which silently breaks the orbit walk and loses the whole
    component (found by the union permutation fuzz, seed 601405).  Weld
    each surplus-in node onto the nearest complementary surplus-out node
    within an ulp-scaled tolerance; the vertex displacement is below the
    ring area resolution by construction."""
    from collections import Counter

    out_deg = Counter(e[0] for e in edges)
    in_deg = Counter(e[1] for e in edges)
    nodes = set(out_deg) | set(in_deg)
    surplus_out = [p for p in nodes if out_deg[p] > in_deg[p]]
    surplus_in = [p for p in nodes if in_deg[p] > out_deg[p]]
    if not surplus_out or not surplus_in:
        return edges
    remap = {}
    used = set()
    for p in surplus_in:
        tol = 16.0 * float(np.spacing(max(abs(p[0]), abs(p[1]), 1.0)))
        best = None
        for q in surplus_out:
            if q in used:
                continue
            d = max(abs(p[0] - q[0]), abs(p[1] - q[1]))
            if d <= tol and (best is None or d < best[0]):
                best = (d, q)
        if best is not None:
            remap[p] = best[1]
            used.add(best[1])
    if not remap:
        return edges
    out = []
    for e in edges:
        p0 = remap.get(e[0], e[0])
        p1 = remap.get(e[1], e[1])
        if p0 != p1:
            out.append((p0, p1))
    return list(dict.fromkeys(out))


def _assemble_polygons(directed_edges, degenerate_out=None):
    """Directed edges (interior on LEFT) → polygons (rings lists).
    Zero-area rings (collapsed slivers, out-and-back walks) are appended to
    degenerate_out when provided — the SR pipeline degrades them to lines."""
    if not directed_edges:
        return []
    # dedup identical directed edges
    directed_edges = list({(e[0], e[1]) for e in directed_edges})
    directed_edges = _weld_unbalanced_micro_nodes(directed_edges)
    rings = _trace_rings(directed_edges)
    # shells CCW (interior left), holes CW
    shells = []
    holes = []
    degen = []
    for r in rings:
        sa = alg.ring_signed_area(r)
        if abs(sa) <= _area_resolution(r):
            degen.append(r)
        elif sa > 0:
            shells.append(r)
        else:
            holes.append(r)
    if degenerate_out is not None:
        for r in degen:
            if len(r) >= 3:
                degenerate_out.append(r)
    polys = [[s] for s in shells]
    shell_edges = [_ring_edge_set(s) for s in shells]
    for h in holes:
        # assign to the smallest shell containing a point ON the hole ring
        # (an interior point of the hole's enclosed region may lie inside an
        # unrelated smaller shell sitting inside the hole).  A hole never
        # shares an EDGE with its containing shell (faces touch holes at
        # most at vertices) — without this exclusion, a float-rounded
        # edge-midpoint probe of a CW ring can land a ULP inside its own
        # CCW twin and nest a face into itself
        hedges = _ring_edge_set(h)
        best = None
        for pi2, poly in enumerate(polys):
            if hedges & shell_edges[pi2]:
                continue
            probe = _ring_probe_not_on(h, poly[0])
            if probe is None:
                continue
            if alg.locate_point_in_rings(probe[0], probe[1], [poly[0]]) == I:
                area_s = abs(alg.ring_signed_area(poly[0]))
                if best is None or area_s < best[0]:
                    best = (area_s, pi2)
        if best is not None:
            polys[best[1]].append(h)
    return polys


def _ring_edge_set(ring) -> set:
    out = set()
    for i9 in range(len(ring) - 1):
        a = (float(ring[i9, 0]), float(ring[i9, 1]))
        b = (float(ring[i9 + 1, 0]), float(ring[i9 + 1, 1]))
        out.add((min(a, b), max(a, b)))
    return out


def _drop_collinear(ring: np.ndarray) -> np.ndarray:
    if len(ring) < 5:
        return ring
    body = ring[:-1]
    n = len(body)
    keep = []
    for i in range(n):
        p = body[(i - 1) % n]
        q = body[i]
        r = body[(i + 1) % n]
        if alg.orient2d(p[0], p[1], q[0], q[1], r[0], r[1]) != 0:
            keep.append(i)
    if len(keep) < 3:
        return ring
    out = body[keep]
    return np.concatenate([out, out[:1]])


def _split_touching_holes(polygons):
    """A hole meeting its shell (or another hole) in >= 2 points disconnects
    the interior — the reference emits the separate faces instead of an
    invalid shell+hole pair.  Re-decompose such polygons via the face walk
    over their own noded rings."""
    out = []
    for rings in polygons:
        if len(rings) < 2:
            out.append(rings)
            continue
        vsets = [set(map(tuple, r[:-1])) for r in rings]
        pinch = False
        for i in range(len(rings)):
            for j in range(i + 1, len(rings)):
                if len(vsets[i] & vsets[j]) >= 2:
                    pinch = True
        if not pinch:
            out.append(rings)
            continue
        from .construct import polygonize

        faces = polygonize(Geom(POLYGON, rings))
        kept = []
        for f in faces.flatten():
            if f.gtype != POLYGON:
                continue
            ip = alg.interior_point(f)
            if alg.locate_point_in_rings(float(ip.data[0]), float(ip.data[1]), rings) == I:
                kept.append(f)
        if kept:
            # re-nest: faces may themselves contain original holes
            for f in kept:
                out.append(list(f.data))
        else:
            out.append(rings)
    return out


def _split_minimal_rings(ring):
    """Split a closed vertex list (first == last) at repeated nodes into
    minimal simple rings."""
    return [sv for sv, _se in _split_minimal_rings_indexed(ring, None)]


def _split_minimal_rings_indexed(ring, walk_edges):
    """Split a closed vertex list (first == last) at repeated nodes into
    minimal simple rings, attributing the walk's edges to the minimal
    ring each lands in.  ``walk_edges`` is the parallel list of edge ids
    (edge k connects ring[k] → ring[k+1]; len == len(ring) - 1), or None
    to skip attribution.  Returns [(vertices_closed, edge_ids|None)].

    Each stack entry carries the edge that ENTERED its vertex; popping a
    sub-ring takes the entering edges of its interior vertices plus the
    closing edge, and the re-pushed cut vertex keeps the edge that first
    reached it (that edge belongs to the outer ring)."""
    body = ring[:-1]
    n = len(body)
    out = []
    stack_pos: dict = {}
    cur = []  # (vertex, id of the edge that entered it)
    for bi, v in enumerate(body):
        in_e = None if walk_edges is None else (walk_edges[bi - 1] if bi > 0 else None)
        if v in stack_pos:
            i7 = stack_pos[v]
            sub_v = [w for w, _e in cur[i7:]] + [v]
            if len(sub_v) >= 3:
                sub_e = (
                    None
                    if walk_edges is None
                    else [e for _w, e in cur[i7 + 1 :]] + [in_e]
                )
                out.append((sub_v, sub_e))  # len-3 closed = out-and-back
                # spike; callers classify by area and degrade zero-area
                # subs to linework
            first_in = cur[i7][1]
            for w, _e in cur[i7:]:
                stack_pos.pop(w, None)
            cur = cur[:i7]
            in_e = first_in
        stack_pos[v] = len(cur)
        cur.append((v, in_e))
    if len(cur) >= 2:
        sub_v = [w for w, _e in cur] + [cur[0][0]]
        sub_e = (
            None if walk_edges is None else [e for _w, e in cur[1:]] + [walk_edges[n - 1]]
        )
        out.append((sub_v, sub_e))  # len-2 remainder = collapsed out-and-back
    return out


def _ring_probe_not_on(hole, shell):
    """A point of `hole`'s ring (vertex or edge midpoint) not on `shell`."""
    for p in hole[:-1]:
        if alg.locate_point_in_rings(float(p[0]), float(p[1]), [shell]) != B:
            return float(p[0]), float(p[1])
    for i8 in range(len(hole) - 1):
        mx = (hole[i8, 0] + hole[i8 + 1, 0]) / 2.0
        my = (hole[i8, 1] + hole[i8 + 1, 1]) / 2.0
        if alg.locate_point_in_rings(mx, my, [shell]) != B:
            return mx, my
    return None


def _ring_inner_point(ring):
    """A point strictly inside a simple ring (first convex-ish diagonal midpoint)."""
    g = Geom(POLYGON, [ring])
    ip = alg.interior_point(g)
    return float(ip.data[0]), float(ip.data[1])


def _ng_lines(labeled_pieces, node_pts):
    """OverlayNG line output: A-only/B-only chains merge through original
    vertices (degree 2, not an arrangement node); shared (collinear) edges
    are emitted unmerged (observed NG behavior on TestNGOverlayL/A.xml)."""
    seen = set()
    pieces = []
    for p0, p1, label, _prov in labeled_pieces:
        key = (min(p0, p1), max(p0, p1))
        if key in seen or p0 == p1:
            continue
        seen.add(key)
        pieces.append((p0, p1, label))
    degree: dict = {}
    for p0, p1, _l in pieces:
        degree[p0] = degree.get(p0, 0) + 1
        degree[p1] = degree.get(p1, 0) + 1
    out = []
    for label in ("a", "b"):
        group = [(p0, p1) for p0, p1, l in pieces if l == label]
        if not group:
            continue
        out.extend(
            _merge_lines(
                group, junction=lambda n: degree.get(n, 0) != 2 or n in node_pts
            )
        )
    for p0, p1, l in pieces:
        if l == "shared":
            out.append(np.array([p0, p1], dtype=np.float64))
    return out


def _legacy_lines(labeled_pieces, node_pts):
    """Legacy OverlayOp line output: one line per INPUT COMPONENT CHAIN,
    split at arrangement nodes and at the component start (GeometryGraph
    edges are per-component and rings break at their start vertex); chains
    never merge across components; duplicate linework deduplicates."""
    # dedup by undirected key, keep first provenance
    seen = set()
    pieces = []
    for p0, p1, label, prov in labeled_pieces:
        key = (min(p0, p1), max(p0, p1))
        if key in seen or p0 == p1:
            continue
        seen.add(key)
        pieces.append((p0, p1, prov))
    bycomp: dict = {}
    for p0, p1, prov in pieces:
        side, comp, segidx, t0 = prov
        bycomp.setdefault((side, comp), []).append((segidx, t0, p0, p1))
    out = []
    for _key, plist in sorted(bycomp.items()):
        plist.sort()
        chain = None
        for _si, _t0, p0, p1 in plist:
            if chain is not None and chain[-1] == p0 and p0 not in node_pts:
                chain.append(p1)
            else:
                if chain is not None and len(chain) >= 2:
                    out.append(np.array(chain, dtype=np.float64))
                chain = [p0, p1]
        if chain is not None and len(chain) >= 2:
            out.append(np.array(chain, dtype=np.float64))
    return out


def _merge_lines(pieces, junction=None):
    """Stitch pieces into maximal linestrings (LineMerger semantics,
    reference: Operation/Linemerge/LineMerger.cs:25)."""
    if not pieces:
        return []
    # dedup undirected
    seen = set()
    edges = []
    for p0, p1 in pieces:
        key = (min(p0, p1), max(p0, p1))
        if key in seen or p0 == p1:
            continue
        seen.add(key)
        edges.append((p0, p1))
    adj: dict = {}
    for idx, (p0, p1) in enumerate(edges):
        adj.setdefault(p0, []).append(idx)
        adj.setdefault(p1, []).append(idx)
    used = [False] * len(edges)
    lines = []
    if junction is None:
        junction = lambda n: len(adj.get(n, [])) != 2

    # start at junction nodes first, then cycles
    def walk(start_node, eidx):
        line = [start_node]
        node = start_node
        cur = eidx
        while True:
            used[cur] = True
            p0, p1 = edges[cur]
            node = p1 if p0 == node else p0
            line.append(node)
            nxt = [i4 for i4 in adj[node] if not used[i4]]
            if len(nxt) != 1 or len(adj[node]) != 2 or junction(node):
                break
            cur = nxt[0]
        return line

    for node, incident in adj.items():
        if junction(node):
            for eidx in incident:
                if not used[eidx]:
                    lines.append(walk(node, eidx))
    for eidx in range(len(edges)):
        if not used[eidx]:
            lines.append(walk(edges[eidx][0], eidx))
    return [np.array(ln, dtype=np.float64) for ln in lines if len(ln) >= 2]


def _line_covered(line: np.ndarray, poly_geoms) -> bool:
    if not poly_geoms:
        return False
    for i5 in range(len(line) - 1):
        mx = (line[i5, 0] + line[i5 + 1, 0]) / 2.0
        my = (line[i5, 1] + line[i5 + 1, 1]) / 2.0
        if all(alg.locate_in_geom(mx, my, pg) == E for pg in poly_geoms):
            return False
    return True


def _point_covered(p, poly_geoms, lines) -> bool:
    """Point resultants are absorbed by ANY contact with a result polygon
    (interior or boundary) or a result line."""
    for pg in poly_geoms:
        if alg.locate_in_geom(p[0], p[1], pg) != E:
            return True
    for ln in lines:
        for i6 in range(len(ln) - 1):
            if alg.on_segment(p[0], p[1], ln[i6, 0], ln[i6, 1], ln[i6 + 1, 0], ln[i6 + 1, 1]):
                return True
    return False


def _compose(polygons, lines, points) -> Geom | None:
    parts = []
    for rings in polygons:
        parts.append(Geom(POLYGON, rings))
    for ln in lines:
        parts.append(Geom(LINESTRING, ln))
    for p in points:
        parts.append(Geom.point(p[0], p[1]))
    if not parts:
        return None
    kinds = {p.gtype for p in parts}
    if kinds == {POLYGON}:
        if len(parts) == 1:
            return parts[0]
        return Geom(MULTIPOLYGON, [p.data for p in parts])
    if kinds == {LINESTRING}:
        if len(parts) == 1:
            return parts[0]
        return Geom(MULTILINESTRING, [p.data for p in parts])
    if kinds == {POINT}:
        if len(parts) == 1:
            return parts[0]
        return Geom(MULTIPOINT, [p.data for p in parts])
    return Geom(GEOMETRYCOLLECTION, parts)


def _snap_cluster(polys, tol: float):
    """SnappingNoder-style vertex snap (reference: Noding/Snap/
    SnappingNoder.cs, SnappingPointIndex.cs): cluster ALL vertices of all
    polygons within chebyshev tol; the representative is the FIRST-seen
    vertex in document order (seed order of the snap index), so every
    output coordinate is an input coordinate.  Grid-bucketed for O(V)."""
    buckets: dict = {}

    def snap_xy(x: float, y: float):
        cx = math.floor(x / tol)
        cy = math.floor(y / tol)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for rx, ry in buckets.get((cx + dx, cy + dy), ()):
                    if abs(rx - x) <= tol and abs(ry - y) <= tol:
                        return rx, ry
        buckets.setdefault((cx, cy), []).append((x, y))
        return x, y

    out = []
    for g in polys:
        arrs = []
        for ri, a in enumerate(g.coords_list()):
            b = np.array(a, dtype=np.float64, copy=True)
            for i in range(len(b)):
                b[i] = snap_xy(float(b[i, 0]), float(b[i, 1]))
            # drop consecutive duplicates created by snapping
            keep = np.ones(len(b), dtype=bool)
            keep[1:] = (b[1:] != b[:-1]).any(axis=1)
            b = b[keep]
            if len(b) and (b[0] != b[-1]).any():
                b = np.vstack([b, b[:1]])
            if len(b) >= 4:
                arrs.append(b)
            elif ri == 0:
                arrs = None  # shell collapsed: drop the whole polygon
                break
        if arrs:
            out.append(Geom(POLYGON, arrs))
    return out


def snapping_noder(tolerance: float):
    """Pre-noder that snaps every vertex to a grid of the given size
    before overlay (reference role: Noding/Snap/SnappingNoder.cs injected
    via OverlayNG.Noder).  Trades exactness for robustness/speed."""

    def _noder(g: Geom) -> Geom:
        return snap_to_grid(g, tolerance)

    return _noder


def segment_extracting_noder():
    """Pre-noder that splits lineal inputs into their individual segments
    (reference role: Noding/SegmentExtractingNoder.cs — the fast path for
    already-noded coverage linework, which needs no intersection search).
    Areal/puntal inputs pass through unchanged."""

    def _noder(g: Geom) -> Geom:
        segs = []
        other = []
        for comp in g.flatten():
            if comp.gtype == LINESTRING:
                arr = comp.data
                for i in range(len(arr) - 1):
                    if tuple(arr[i]) != tuple(arr[i + 1]):
                        segs.append(np.asarray(arr[i : i + 2], dtype=np.float64))
            else:
                other.append(comp)
        if not segs:
            return g
        line = Geom(MULTILINESTRING, segs)
        if not other:
            return line
        return Geom(GEOMETRYCOLLECTION, other + [line])

    return _noder


def _hilbert_sorted(polys):
    """Order parts along a Hilbert curve of their envelope centers so that
    tree-merge siblings are spatial neighbors (reference:
    Operation/Union/CascadedPolygonUnion.cs:37 builds an STRtree for the
    same locality; the curve gives the identical clustering effect without
    the tree)."""
    if len(polys) <= 2:
        return polys
    from .hilbert import hilbert_encode

    envs = [alg.envelope(p) for p in polys]
    cx = np.array([(e[0] + e[2]) / 2.0 for e in envs])
    cy = np.array([(e[1] + e[3]) / 2.0 for e in envs])
    sx = cx.max() - cx.min()
    sy = cy.max() - cy.min()
    if sx <= 0 and sy <= 0:
        return polys
    ix = np.clip((cx - cx.min()) / (sx or 1.0) * 65535.0, 0, 65535).astype(np.uint64)
    iy = np.clip((cy - cy.min()) / (sy or 1.0) * 65535.0, 0, 65535).astype(np.uint64)
    order = np.argsort(hilbert_encode(ix, iy, 16), kind="stable")
    return [polys[i] for i in order]


def _cascaded_union_fold(polys, pair):
    """Binary-tree union over Hilbert-ordered parts (cascaded semantics,
    reference CascadedPolygonUnion.cs:37).  Replaces the linear fold, whose
    k-th merge re-noded and re-validated the WHOLE accumulator — O(n²)
    total edge work (measured: 60 scattered rectangles took 55 s linear;
    the tree with the disjoint-concat shortcut is milliseconds).  Exactly
    n-1 pair calls, same as the linear fold (UnionStrategy contract)."""
    parts = _hilbert_sorted(polys)
    while len(parts) > 1:
        nxt = []
        for i in range(0, len(parts) - 1, 2):
            nxt.append(pair(parts[i], parts[i + 1]))
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0] if parts else None


def _union_components_pruned(a: Geom, b: Geom, pair_overlay, grid_size: float | None) -> Geom:
    """Union of two polygonal operands that only overlays the components
    near the OTHER operand (reference role: OverlayNG's envelope clipping,
    Operation/OverlayNG/OverlayUtil.cs ClippingEnvelope; CascadedPolygonUnion
    gets the same effect from its STRtree grouping).  Components whose
    envelope is separated from every component envelope of the other
    operand by more than the retry-ladder tolerance cannot interact — they
    pass through unchanged, so a tree merge of n scattered parts costs the
    interacting frontier only, not a full re-noding of both operands."""
    acomp = [c for c in a.flatten() if c.gtype == POLYGON]
    bcomp = [c for c in b.flatten() if c.gtype == POLYGON]
    if not acomp:
        return b
    if not bcomp:
        return a
    aenvs = [alg.envelope(c) for c in acomp]
    benvs = [alg.envelope(c) for c in bcomp]
    mx = max(
        max(abs(e[0]), abs(e[1]), abs(e[2]), abs(e[3]))
        for e in aenvs + benvs
    )
    margin = max(2.0 * (grid_size or 0.0), mx * 1e-7)

    def _near(envs_mine, envs_other):
        near = []
        for i, e in enumerate(envs_mine):
            hit = False
            for f in envs_other:
                if (
                    f[0] <= e[2] + margin
                    and e[0] <= f[2] + margin
                    and f[1] <= e[3] + margin
                    and e[1] <= f[3] + margin
                ):
                    hit = True
                    break
            near.append(hit)
        return near

    near_a = _near(aenvs, benvs)
    near_b = _near(benvs, aenvs)
    far_rings = [c.data for c, n in zip(acomp, near_a) if not n] + [
        c.data for c, n in zip(bcomp, near_b) if not n
    ]
    na = [c for c, n in zip(acomp, near_a) if n]
    nb = [c for c, n in zip(bcomp, near_b) if n]
    if not na and not nb:
        core_rings = []
    elif not na:
        core_rings = [c.data for c in nb]
    elif not nb:
        core_rings = [c.data for c in na]
    else:
        ga = na[0] if len(na) == 1 else Geom(MULTIPOLYGON, [c.data for c in na])
        gb = nb[0] if len(nb) == 1 else Geom(MULTIPOLYGON, [c.data for c in nb])
        core = pair_overlay(ga, gb)
        core_rings = [c.data for c in core.flatten() if c.gtype == POLYGON]
    rings = core_rings + far_rings
    if not rings:
        return Geom.empty(POLYGON)
    if len(rings) == 1:
        return Geom(POLYGON, rings[0])
    return Geom(MULTIPOLYGON, rings)


def union_all(geoms, grid_size: float | None = None, weld: bool = False, strategy=None) -> Geom:
    """Unary union (reference: Operation/Union/UnaryUnionOp.cs:46): fold
    polygonal components through binary union (cascaded semantics,
    CascadedPolygonUnion.cs:37); node lineal components among themselves
    and keep what the area union does not cover; dedup points.
    strategy: optional ``(Geom, Geom) -> Geom`` pairwise union injection
    (reference: Operation/Union/UnionStrategy.cs consumed by
    CascadedPolygonUnion).  A custom strategy owns its own robustness:
    the built-in snap/weld retry ladder is bypassed."""
    polys = []
    lines = []
    points = []
    max_dim = -1
    for g in geoms:
        if g is None:
            continue
        max_dim = max(max_dim, g.dimension)
        if g.is_empty:
            continue
        if grid_size:
            g = snap_clean(g, grid_size)
        for comp in g.flatten():
            if comp.gtype == POLYGON:
                polys.append(comp)
            elif comp.gtype == LINESTRING:
                lines.append(comp.data)
            elif comp.gtype == POINT:
                points.append((float(comp.data[0]), float(comp.data[1])))
    if strategy is not None:
        acc = _cascaded_union_fold(polys, strategy)
    else:

        def _pair(a, b):
            return _union_components_pruned(
                a,
                b,
                lambda x, y: overlay(x, y, "union", grid_size, weld=weld),
                grid_size,
            )

        acc = _cascaded_union_fold(polys, _pair)
    if strategy is None and grid_size is None and acc is not None and len(polys) > 1:
        # robust-union fallback (reference: UnaryUnionOp -> OverlayNGRobust
        # snap retries, OverlayNGRobust.cs:178): float noise between
        # nearly-coincident boundaries can leave abutting components
        # unmerged or produce zero-area sliver components.  First try
        # SnappingNoder-style vertex snapping (tol = ordinate magnitude /
        # 1e12, escalating x10 — OverlayNGRobust.SnapTolerance), which
        # keeps result vertices on INPUT coordinates; last resort is the
        # magnitude-relative weld grid.  Accept only results that merge
        # components / remove slivers and preserve area.
        out0 = [c for c in acc.flatten() if c.gtype == POLYGON]
        out0_pos = [c for c in out0 if alg.area(c) > 0.0]
        has_sliver = len(out0_pos) < len(out0)
        if len(out0) > 1:
            mx = max(
                (abs(float(v)) for c in polys for arr in c.coords_list() for q in arr for v in q),
                default=0.0,
            )
            if mx > 0 and not has_sliver:
                tol = 2.0 ** (math.floor(math.log2(mx)) - 40)
                # a multi-component result is the NORMAL outcome for
                # genuinely disjoint inputs (cascaded union of disjoint
                # cells); only pay the ~2x retry when a merge is plausible:
                # two components whose BOUNDARIES sit a strictly-positive
                # sub-tolerance gap apart (the float-noise signature).
                # Envelope contact alone is far weaker — exact corner/edge
                # touches (distance exactly 0) are topology the per-op
                # self-heal already certified, and they occur in every
                # union of lattice-aligned cells.
                envs = sorted(
                    (alg.envelope(c), ci) for ci, c in enumerate(out0)
                )
                plausible = False
                for ei in range(len(envs)):
                    (x0, y0, x1, y1), ca = envs[ei]
                    for ej in range(ei + 1, len(envs)):
                        (bx0, by0, bx1, by1), cb = envs[ej]
                        if bx0 > x1 + tol:
                            break  # sorted by minx: no later env can touch
                        if by0 <= y1 + tol and by1 >= y0 - tol:
                            d = alg.distance(out0[ca], out0[cb])
                            if 0.0 < d <= tol:
                                plausible = True
                                break
                    if plausible:
                        break
                if not plausible:
                    mx = 0.0  # skip retry
            if mx > 0:
                a0 = sum(alg.area(c) for c in out0)

                def _accept(res):
                    comps = [c for c in res.flatten() if c.gtype == POLYGON]
                    pos = [c for c in comps if alg.area(c) > 0.0]
                    if not pos or len(pos) != len(comps):
                        return None
                    a2 = sum(alg.area(c) for c in pos)
                    if abs(a2 - a0) > 1e-6 * max(a0, 1.0):
                        return None
                    merged = len(pos) < len(out0_pos)
                    cleaned = has_sliver and len(pos) <= len(out0_pos)
                    if not (merged or cleaned):
                        return None
                    if len(pos) == 1:
                        return pos[0]
                    return Geom(MULTIPOLYGON, [c.data for c in pos])

                acc2 = None
                snap_tol = mx / 1e12
                for _try in range(5):
                    snapped = _snap_cluster(polys, snap_tol)
                    accs = _cascaded_union_fold(
                        snapped,
                        lambda a, b: _union_components_pruned(
                            a, b, lambda x, y: overlay(x, y, "union"), None
                        ),
                    )
                    acc2 = _accept(accs) if accs is not None else None
                    if acc2 is not None:
                        break
                    snap_tol *= 10.0
                if acc2 is None:
                    tol = 2.0 ** (math.floor(math.log2(mx)) - 40)
                    accw = _cascaded_union_fold(
                        polys,
                        lambda a, b: _union_components_pruned(
                            a,
                            b,
                            lambda x, y: overlay(x, y, "union", tol, weld=True),
                            tol,
                        ),
                    )
                    acc2 = _accept(accw) if accw is not None else None
                if acc2 is not None:
                    acc = acc2
    parts = []
    if lines and acc is not None:
        # area/line union through overlay, as UnaryUnionOp does: the area
        # boundary is NODED where lines touch it, and only uncovered line
        # remnants survive
        mixed = overlay(acc, Geom(MULTILINESTRING, lines), "union", grid_size, weld=weld)
        parts.extend(c for c in mixed.flatten() if c.gtype in (POLYGON, LINESTRING))
    else:
        if acc is not None:
            parts.extend(c for c in acc.flatten() if c.gtype == POLYGON)
        if lines:
            lines_g = Geom(MULTILINESTRING, lines)
            line_res = overlay(lines_g, Geom.empty(POLYGON), "difference", grid_size)
            parts.extend(c for c in line_res.flatten() if c.gtype == LINESTRING)
    for pt in dict.fromkeys(points):
        covered = False
        for pg in parts:
            if alg.locate_in_geom(pt[0], pt[1], pg) != E:
                covered = True
                break
        if not covered:
            parts.append(Geom.point(pt[0], pt[1]))
    if not parts:
        # typed empty result: highest input dimension (reference:
        # UnaryUnionOp empty handling)
        if max_dim == 2:
            return Geom.empty(POLYGON)
        if max_dim == 1:
            return Geom.empty(LINESTRING)
        if max_dim == 0:
            return Geom.empty(POINT)
        return Geom.empty(GEOMETRYCOLLECTION)
    if len(parts) == 1:
        return parts[0]
    kinds = {p.gtype for p in parts}
    if kinds == {POLYGON}:
        return Geom(MULTIPOLYGON, [p.data for p in parts])
    if kinds == {LINESTRING}:
        return Geom(MULTILINESTRING, [p.data for p in parts])
    if kinds == {POINT}:
        return Geom(MULTIPOINT, [p.data for p in parts])
    return Geom(GEOMETRYCOLLECTION, parts)


def _snap_round_pt(p, grid: float):
    return (
        float(np.floor(p[0] / grid + 0.5) * grid),
        float(np.floor(p[1] / grid + 0.5) * grid),
    )


def snap_round_inputs(a: Geom, b: Geom, grid: float):
    """True snap rounding of both operands as a joint pre-pass (reference:
    Noding/Snapround/SnapRoundingNoder.cs:38): hot pixels at every ROUNDED
    input vertex and every rounded intersection of the ORIGINAL segments;
    each original chain is re-routed through the pixel centers its segments
    cross, ordered along the original segment.  Rounding vertices first and
    noding the rounded arrangement (the old approach) both destroys pixel
    hits (an original segment through a pixel whose rounded image only
    grazes the corner) and fabricates them."""
    segs = []
    for g in (a, b):
        for comp in g.flatten():
            for arr in comp.coords_list():
                for i in range(len(arr) - 1):
                    p0 = (float(arr[i, 0]), float(arr[i, 1]))
                    p1 = (float(arr[i + 1, 0]), float(arr[i + 1, 1]))
                    if p0 != p1:
                        segs.append((p0, p1))
    hot = set()
    for g in (a, b):
        for comp in g.flatten():
            if comp.gtype == POINT:
                continue  # point operands are LOCATED against the noded
                # arrangement, never noded into it (no hot pixel)
            for arr in comp.coords_list():
                for p in arr:
                    hot.add(_snap_round_pt((float(p[0]), float(p[1])), grid))
    if segs:
        sarr = np.array([(s[0][0], s[0][1], s[1][0], s[1][1]) for s in segs])
        for i, j in _candidate_pairs(sarr):
            _k, pts = alg.segment_intersection(segs[i][0], segs[i][1], segs[j][0], segs[j][1])
            for p in pts:
                hot.add(_snap_round_pt((float(p[0]), float(p[1])), grid))
    half = grid / 2.0
    narr = np.array(sorted(hot), dtype=np.float64) if hot else np.empty((0, 2))

    def route(arr):
        """One original chain -> rounded chain detouring through every hot
        pixel its ORIGINAL segments cross (consecutive duplicates merged)."""
        out = []
        for i in range(len(arr) - 1):
            q0 = (float(arr[i, 0]), float(arr[i, 1]))
            q1 = (float(arr[i + 1, 0]), float(arr[i + 1, 1]))
            r0 = _snap_round_pt(q0, grid)
            r1 = _snap_round_pt(q1, grid)
            if not out:
                out.append(r0)
            if q0 == q1:
                continue
            minx = min(q0[0], q1[0]) - half
            maxx = max(q0[0], q1[0]) + half
            miny = min(q0[1], q1[1]) - half
            maxy = max(q0[1], q1[1]) + half
            m = (
                (narr[:, 0] >= minx)
                & (narr[:, 0] <= maxx)
                & (narr[:, 1] >= miny)
                & (narr[:, 1] <= maxy)
            )
            inner = []
            dx = q1[0] - q0[0]
            dy = q1[1] - q0[1]
            ll = dx * dx + dy * dy
            for qq in narr[m]:
                c = (float(qq[0]), float(qq[1]))
                if c == r0 or c == r1:
                    continue
                if _segment_hits_pixel(q0, q1, c, half):
                    t = ((c[0] - q0[0]) * dx + (c[1] - q0[1]) * dy) / ll
                    inner.append((t, c))
            for _t, c in sorted(inner):
                if c != out[-1]:
                    out.append(c)
            if r1 != out[-1]:
                out.append(r1)
        if not out and len(arr):
            out.append(_snap_round_pt((float(arr[0, 0]), float(arr[0, 1])), grid))
        return np.array(out, dtype=np.float64)

    def rebuild(g):
        parts = []
        for comp in g.flatten():
            if comp.gtype == POINT:
                parts.append(Geom(POINT, np.array(_snap_round_pt((float(comp.data[0]), float(comp.data[1])), grid))))
            elif comp.gtype == LINESTRING:
                r = route(comp.data)
                if len(r) >= 2:
                    parts.append(Geom(LINESTRING, r, tag=comp.tag))
                elif len(r) == 1:
                    parts.append(Geom(POINT, r[0]))
            elif comp.gtype == POLYGON:
                parts.append(Geom(POLYGON, [route(rg) for rg in comp.data]))
        if not parts:
            return _empty_like(g)
        if len(parts) == 1:
            return parts[0]
        return Geom(GEOMETRYCOLLECTION, parts)

    return rebuild(a), rebuild(b)


