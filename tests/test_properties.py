"""Property-based tests (hypothesis): algebraic laws the engine must obey
regardless of input shape — the robustness net beyond the XML corpus."""

import numpy as np
from hypothesis import given, settings, strategies as st

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom import predicates as pred
from nettopologysuite_ray.geom.overlay import overlay, union_all
from nettopologysuite_ray.geom.types import Geom
from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt

coord = st.integers(min_value=-50, max_value=50)


@st.composite
def boxes(draw):
    x0 = draw(coord)
    y0 = draw(coord)
    w = draw(st.integers(min_value=1, max_value=40))
    h = draw(st.integers(min_value=1, max_value=40))
    return Geom.polygon([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)])


@st.composite
def multipoints(draw):
    pts = draw(st.lists(st.tuples(coord, coord), min_size=1, max_size=12))
    return Geom("MultiPoint", [np.array(p, dtype=float) for p in pts])


@st.composite
def lines(draw):
    pts = draw(st.lists(st.tuples(coord, coord), min_size=2, max_size=8, unique=True))
    return Geom.linestring(np.array(pts, dtype=float))


@settings(max_examples=120, deadline=None)
@given(boxes(), boxes())
def test_relate_transpose_symmetry(a, b):
    """relate(b, a) is the transpose of relate(a, b)."""
    m = pred.relate(a, b)
    mt = pred.relate(b, a)
    idx = [0, 3, 6, 1, 4, 7, 2, 5, 8]
    assert "".join(m[i] for i in idx) == mt


@settings(max_examples=120, deadline=None)
@given(boxes(), boxes())
def test_overlay_area_algebra(a, b):
    """|A∪B| = |A| + |B| - |A∩B| and |A\\B| = |A| - |A∩B| (exact for
    integer boxes)."""
    ai = alg.area(overlay(a, b, "intersection"))
    au = alg.area(overlay(a, b, "union"))
    ad = alg.area(overlay(a, b, "difference"))
    asym = alg.area(overlay(a, b, "symdifference"))
    assert abs(au - (alg.area(a) + alg.area(b) - ai)) < 1e-6
    assert abs(ad - (alg.area(a) - ai)) < 1e-6
    assert abs(asym - (au - ai)) < 1e-6


@settings(max_examples=120, deadline=None)
@given(boxes(), boxes())
def test_predicates_consistent_with_overlay(a, b):
    inter = overlay(a, b, "intersection")
    has_area = alg.area(inter) > 0
    if has_area:
        assert pred.intersects(a, b)
        assert not pred.touches(a, b)
    if pred.contains(a, b):
        assert abs(alg.area(inter) - alg.area(b)) < 1e-9
    assert pred.intersects(a, b) == pred.intersects(b, a)
    assert pred.disjoint(a, b) != pred.intersects(a, b)


@settings(max_examples=100, deadline=None)
@given(multipoints())
def test_wkb_wkt_roundtrip_property(g):
    assert alg.equals_exact(from_wkb(to_wkb(g)), g)
    assert alg.equals_exact(from_wkt(to_wkt(g)), g)


@settings(max_examples=100, deadline=None)
@given(multipoints())
def test_hull_contains_all_points(g):
    hull = alg.convex_hull(g)
    for p in g.data:
        assert alg.locate_in_geom(float(p[0]), float(p[1]), hull) != alg.EXTERIOR or hull.gtype in ("Point", "LineString")
        if hull.gtype == "Polygon":
            assert alg.locate_in_geom(float(p[0]), float(p[1]), hull) != alg.EXTERIOR


@settings(max_examples=60, deadline=None)
@given(st.lists(boxes(), min_size=1, max_size=5))
def test_union_all_area_upper_bound(parts):
    u = union_all(parts)
    total = sum(alg.area(p) for p in parts)
    au = alg.area(u)
    assert au <= total + 1e-6
    assert au >= max(alg.area(p) for p in parts) - 1e-6
    from nettopologysuite_ray.geom.validity import is_valid

    assert is_valid(u)


@settings(max_examples=80, deadline=None)
@given(lines(), st.integers(min_value=1, max_value=10))
def test_buffer_contains_input(line, d):
    from nettopologysuite_ray.geom.buffer import buffer

    buf = buffer(line, float(d))
    assert buf.gtype in ("Polygon", "MultiPolygon")
    for p in line.all_coords():
        assert alg.locate_in_geom(float(p[0]), float(p[1]), buf) == alg.INTERIOR


def test_random_simple_polygon_overlay_fuzz():
    """Seeded fuzz: random star-shaped simple polygons; inclusion-exclusion
    and result validity must hold for every pair."""
    from nettopologysuite_ray.geom.validity import is_valid

    rng = np.random.default_rng(13)

    def rand_simple_poly(n, scale=20):
        pts = rng.integers(-scale, scale, size=(n, 2)).astype(float)
        c = pts.mean(axis=0)
        ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
        ring = pts[np.argsort(ang)]
        ring = ring[np.concatenate([[True], (np.diff(ring, axis=0) != 0).any(axis=1)])]
        if len(ring) < 3:
            return None
        g = Geom.polygon(ring)
        return g if is_valid(g) else None

    trials = 0
    for _ in range(120):
        a = rand_simple_poly(int(rng.integers(4, 9)))
        b = rand_simple_poly(int(rng.integers(4, 9)))
        if a is None or b is None:
            continue
        trials += 1
        ai = alg.area(overlay(a, b, "intersection"))
        au = alg.area(overlay(a, b, "union"))
        assert abs(au - (alg.area(a) + alg.area(b) - ai)) < 1e-6
        assert is_valid(overlay(a, b, "union"))
        if ai > 1e-9:
            assert pred.intersects(a, b)
    assert trials > 60


# ---------------------------------------------------------------------------
# round-2 operators


@settings(max_examples=80, deadline=None)
@given(multipoints(), st.integers(min_value=0, max_value=10))
def test_concave_hull_contains_points(mp, ratio10):
    """The concave hull contains every input point and is valid."""
    from nettopologysuite_ray.geom.hull import concave_hull
    from nettopologysuite_ray.geom.validity import is_valid

    h = concave_hull(mp, length_ratio=ratio10 / 10.0)
    assert is_valid(h)
    if h.gtype == "Polygon" and not h.is_empty:
        for p in mp.data:
            assert alg.locate_in_geom(float(p[0]), float(p[1]), h) != alg.EXTERIOR


@settings(max_examples=80, deadline=None)
@given(boxes(), boxes())
def test_polygon_triangulate_area_preserved(a, b):
    """Triangulating a (possibly holed/multi) union preserves total area
    exactly on integer coordinates."""
    from nettopologysuite_ray.geom.polytri import constrained_delaunay, polygon_triangulate

    u = overlay(a, b, "union")
    polys = [c for c in u.flatten() if c.gtype == "Polygon"]
    total = sum(alg.area(p) for p in polys)
    for fn in (polygon_triangulate, constrained_delaunay):
        tris = list(fn(u).flatten())
        tri_area = sum(alg.area(t) for t in tris)
        assert abs(tri_area - total) < 1e-9 * max(total, 1.0)


@settings(max_examples=80, deadline=None)
@given(multipoints())
def test_kdtree_nn_matches_brute_force(mp):
    from nettopologysuite_ray.geom.kdtree import KdTree

    pts = [(float(p[0]), float(p[1])) for p in mp.data]
    kd = KdTree()
    for p in pts:
        kd.insert(p)
    q = (3.7, -2.2)
    nn = kd.nearest_neighbor(q)
    best = min(np.hypot(p[0] - q[0], p[1] - q[1]) for p in pts)
    assert abs(nn.distance(*q) - best) < 1e-12


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=10, unique=True))
def test_delaunay_property_random(pts):
    """Every triangle's circumcircle is empty (the defining invariant) —
    guards the incremental walk/cavity rewrite."""
    from nettopologysuite_ray.geom.triangulate import _bowyer_watson, _in_circle

    arr = np.unique(np.array(pts, dtype=float), axis=0)
    tris = _bowyer_watson(arr)
    for a, b, c in tris:
        for k in range(len(arr)):
            if k in (a, b, c):
                continue
            assert (
                _in_circle(
                    arr[a][0], arr[a][1], arr[b][0], arr[b][1],
                    arr[c][0], arr[c][1], arr[k][0], arr[k][1],
                )
                <= 0
            )


@settings(max_examples=60, deadline=None)
@given(boxes(), st.integers(min_value=1, max_value=20))
def test_precision_reducer_valid_on_grid(g, scale):
    from nettopologysuite_ray.geom.precision import reduce_precision
    from nettopologysuite_ray.geom.validity import is_valid

    out = reduce_precision(g, scale)
    assert is_valid(out)
    # every output ordinate lies on the grid
    for comp in out.flatten():
        for arr in comp.coords_list():
            assert np.allclose(arr * scale, np.round(arr * scale), atol=1e-9)


@settings(max_examples=40, deadline=None)
@given(boxes(), boxes())
def test_hull_of_polygons_covers_inputs(a, b):
    from nettopologysuite_ray.geom.hull import concave_hull_of_polygons
    from nettopologysuite_ray.geom.types import MULTIPOLYGON, Geom
    from nettopologysuite_ray.geom.validity import is_valid

    inter = overlay(a, b, "intersection")
    if not inter.is_empty:
        return  # coverage input must be non-overlapping
    mp = Geom(MULTIPOLYGON, [a.data, b.data])
    h = concave_hull_of_polygons(mp, max_edge_length=1000.0, tight=True)
    assert is_valid(h)
    assert alg.area(h) >= alg.area(a) + alg.area(b) - 1e-9


@st.composite
def rotated_quads(draw):
    """Non-axis-aligned convex quadrilaterals (float vertices)."""
    cx = draw(st.integers(min_value=-20, max_value=20))
    cy = draw(st.integers(min_value=-20, max_value=20))
    w = draw(st.integers(min_value=2, max_value=25))
    h = draw(st.integers(min_value=2, max_value=25))
    ang_deg = draw(st.integers(min_value=0, max_value=359))
    t = np.deg2rad(ang_deg)
    R = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
    base = np.array([[-w, -h], [w, -h], [w, h], [-w, h]], dtype=float) / 2.0
    ring = base @ R.T + [cx, cy]
    return Geom.polygon([tuple(p) for p in ring])


@settings(max_examples=100, deadline=None)
@given(rotated_quads(), rotated_quads())
def test_overlay_inclusion_exclusion_rotated(a, b):
    """area(A) + area(B) == area(A∪B) + area(A∩B), and the parts nest —
    float-vertex, non-axis-aligned inputs stress the noding arithmetic."""
    from nettopologysuite_ray.geom.validity import is_valid

    u = overlay(a, b, "union")
    i = overlay(a, b, "intersection")
    d = overlay(a, b, "difference")
    assert is_valid(u) and is_valid(i) and is_valid(d)
    aa, ab = alg.area(a), alg.area(b)
    scale = max(aa, ab, 1.0)
    assert abs((aa + ab) - (alg.area(u) + alg.area(i))) < 1e-6 * scale
    # difference + intersection partitions A
    assert abs((alg.area(d) + alg.area(i)) - aa) < 1e-6 * scale
    # containment: I ⊆ A, I ⊆ B (area of I \ A must vanish)
    if not i.is_empty:
        assert alg.area(overlay(i, a, "difference")) < 1e-6 * scale
        assert alg.area(overlay(i, b, "difference")) < 1e-6 * scale


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_overlay_triangle_transform_algebra(seed):
    """Random triangles vs their rotated/scaled/translated siblings:
    inclusion-exclusion + partition identities + validity."""
    from nettopologysuite_ray.geom.validity import is_valid

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-10, 10, (3, 2))
    if abs(alg.ring_signed_area(np.vstack([pts, pts[:1]]))) < 0.5:
        return
    a = Geom.polygon([tuple(p) for p in pts])
    t = rng.uniform(0, 2 * np.pi)
    R = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
    q = (pts - pts.mean(0)) @ R.T * rng.uniform(0.5, 2.0) + pts.mean(0)
    if abs(alg.ring_signed_area(np.vstack([q, q[:1]]))) < 0.5:
        return
    b = Geom.polygon([tuple(p) for p in q])
    aa, ab = alg.area(a), alg.area(b)
    u, i, d = (overlay(a, b, op) for op in ("union", "intersection", "difference"))
    scale = max(aa, ab, 1.0)
    assert is_valid(u) and is_valid(i) and is_valid(d)
    assert abs((aa + ab) - (alg.area(u) + alg.area(i))) < 1e-6 * scale
    assert abs((alg.area(d) + alg.area(i)) - aa) < 1e-6 * scale


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=100))
def test_union_all_pinwheel_slivers(seed):
    """union_all of rotated thin slivers through one center stays valid
    and area-bounded (near-degenerate center crossings)."""
    from nettopologysuite_ray.geom.validity import is_valid

    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(8):
        t = rng.uniform(0, np.pi)
        R = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
        base = np.array([[-5, -0.3], [5, -0.3], [5, 0.3], [-5, 0.3]], dtype=float)
        parts.append(Geom.polygon([tuple(p) for p in base @ R.T]))
    u = union_all(parts)
    assert is_valid(u)
    au = alg.area(u)
    assert max(alg.area(p) for p in parts) - 1e-6 <= au <= sum(alg.area(p) for p in parts) + 1e-6


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_buffer_contains_line_and_monotonic(seed):
    from nettopologysuite_ray.geom.buffer import buffer
    from nettopologysuite_ray.geom.validity import is_valid

    rng = np.random.default_rng(seed)
    pts = np.cumsum(rng.uniform(-4, 4, (rng.integers(2, 7), 2)), axis=0)
    line = Geom.linestring(pts)
    d = float(rng.uniform(0.1, 3.0))
    b = buffer(line, d)
    assert is_valid(b)
    for p in pts:
        assert alg.locate_in_geom(float(p[0]), float(p[1]), b) != alg.EXTERIOR
    b2 = buffer(line, d * 1.5)
    assert alg.area(overlay(b, b2, "difference")) < 1e-6 * max(alg.area(b), 1.0)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_line_area_overlay_length_partition(seed):
    """len(L ∩ P) + len(L \\ P) == len(L) for random lines vs rotated
    polygons — the mixed-dimension overlay paths."""
    rng = np.random.default_rng(seed)
    t = rng.uniform(0, 2 * np.pi)
    R = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
    w, h = rng.uniform(2, 10, 2)
    c = rng.uniform(-3, 3, 2)
    poly = Geom.polygon(
        [tuple(p) for p in (np.array([[-w, -h], [w, -h], [w, h], [-w, h]]) / 2 @ R.T + c)]
    )
    pts = np.cumsum(rng.uniform(-5, 5, (rng.integers(2, 6), 2)), axis=0)
    line = Geom.linestring(pts)
    L = alg.length(line)
    li = overlay(line, poly, "intersection")
    ld = overlay(line, poly, "difference")
    assert abs((alg.length(li) + alg.length(ld)) - L) < 1e-6 * max(L, 1.0)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=2, max_value=3),
    st.integers(min_value=1, max_value=6),
)
def test_coverage_simplify_partition_preserved(seed, k, tol10):
    """Randomized wiggly-grid coverages stay a clean partition after
    coverage simplification: every cell valid, no pairwise overlap, and
    union area == sum of cell areas (shared borders simplify identically
    on both sides, so neither overlaps nor double-counted slivers can
    appear).  Regression net for the grid-indexed corner-clearance path
    (reference: Coverage/CoverageSimplifier.cs:48 edge consistency)."""
    from nettopologysuite_ray.geom.coverage_simplify import coverage_simplify
    from nettopologysuite_ray.geom.validity import is_valid

    rng = np.random.default_rng(seed)
    tol = tol10 / 10.0

    def wiggle(p0, p1, n=5, amp=0.12):
        ts = np.linspace(0, 1, n + 1)
        base = np.outer(1 - ts, p0) + np.outer(ts, p1)
        d = np.array(p1, float) - np.array(p0, float)
        nrm = np.array([-d[1], d[0]]) / np.hypot(*d)
        off = rng.uniform(-amp, amp, size=n + 1)
        off[0] = off[-1] = 0.0
        return base + np.outer(off, nrm)

    H = {(i, j): wiggle((i, j), (i + 1, j)) for i in range(k) for j in range(k + 1)}
    V = {(i, j): wiggle((i, j), (i, j + 1)) for i in range(k + 1) for j in range(k)}
    cells = []
    for i in range(k):
        for j in range(k):
            ring = np.concatenate(
                [H[(i, j)][:-1], V[(i + 1, j)][:-1], H[(i, j + 1)][::-1][:-1], V[(i, j)][::-1]]
            )
            cells.append(Geom.polygon(ring))
    simp = coverage_simplify(cells, tol)
    assert all(is_valid(c) for c in simp)
    total = 0.0
    for c in simp:
        assert not c.is_empty
        total += alg.area(c)
    u = union_all(simp)
    assert abs(alg.area(u) - total) < 1e-9 * max(total, 1.0)


def test_overlay_one_ulp_touching_quads_regression():
    """Regression (found by this suite's fuzz): a square resting exactly on
    a 1-ulp-rotated square — difference silently returned EMPTY and
    symdifference ate A before the not-overlap inclusion-exclusion pin."""
    a = from_wkt("POLYGON ((-1 1, 1 1, 1 3, -1 3, -1 1))")
    for ang in (1e-14, -1e-14, 1e-13, -1e-13, 5e-15, -5e-15):
        t = np.deg2rad(ang)
        R = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
        base = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
        b = Geom.polygon([tuple(p) for p in (base @ R.T)])
        assert abs(alg.area(overlay(a, b, "difference")) - 4.0) < 1e-5
        assert abs(alg.area(overlay(b, a, "difference")) - 4.0) < 1e-5
        assert abs(alg.area(overlay(a, b, "union")) - 8.0) < 1e-5
        assert abs(alg.area(overlay(a, b, "symdifference")) - 8.0) < 1e-5
        assert alg.area(overlay(a, b, "intersection")) < 1e-5


def test_overlay_one_ulp_overlapping_rect_regression():
    """Regression: genuine partial overlap with 1-ulp-rotated coincident
    edges — difference lost its area (returned EMPTY) under the loose
    lower bound before the unconditional area-loss pin."""
    a = from_wkt("POLYGON ((1 -1, 3 -1, 3 1, 1 1, 1 -1))")
    for ang in (1e-14, -1e-14, 5e-15, -5e-15, 2e-14):
        t = np.deg2rad(ang)
        R = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
        base = np.array([[-2.5, -1.0], [2.5, -1.0], [2.5, 1.0], [-2.5, 1.0]])
        b = Geom.polygon([tuple(p) for p in (base @ R.T)])
        assert abs(alg.area(overlay(a, b, "difference")) - 1.0) < 1e-5
        assert abs(alg.area(overlay(a, b, "intersection")) - 3.0) < 1e-5
        assert abs(alg.area(overlay(a, b, "union")) - 11.0) < 1e-5
        assert abs(alg.area(overlay(a, b, "symdifference")) - 8.0) < 1e-5


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_overlay_near_coincident_edges_fuzz(seed):
    """Focused hunt for silent arrangement loss: axis-aligned integer
    rectangles with every vertex of B perturbed by a few ulps, overlapping
    or touching A along (near-)coincident edges.  Checks the full
    inclusion-exclusion system of all four ops."""
    rng = np.random.default_rng(seed)
    x0, y0 = rng.integers(-5, 5, 2)
    w1, h1 = rng.integers(1, 5, 2)
    a = Geom.polygon([(x0, y0), (x0 + w1, y0), (x0 + w1, y0 + h1), (x0, y0 + h1)])
    # B shares A's edge lattice: pick corners on the same integer grid
    bx0, by0 = x0 + rng.integers(-2, 3), y0 + rng.integers(-2, 3)
    w2, h2 = rng.integers(1, 5, 2)
    ring = np.array(
        [(bx0, by0), (bx0 + w2, by0), (bx0 + w2, by0 + h2), (bx0, by0 + h2)],
        dtype=float,
    )
    # ulp-scale perturbation of every B vertex
    ring += (rng.integers(-3, 4, ring.shape)) * np.spacing(np.maximum(np.abs(ring), 1.0))
    b = Geom.polygon([tuple(p) for p in ring])

    u = overlay(a, b, "union")
    i = overlay(a, b, "intersection")
    d = overlay(a, b, "difference")
    s = overlay(a, b, "symdifference")
    aa, ab = alg.area(a), alg.area(b)
    au, ai, ad, asym = alg.area(u), alg.area(i), alg.area(d), alg.area(s)
    scale = max(aa, ab, 1.0)
    tol = 1e-6 * scale
    assert abs((aa + ab) - (au + ai)) < tol
    assert abs((ad + ai) - aa) < tol
    assert abs(asym - (au - ai)) < tol
    # reverse difference closes the system
    ad2 = alg.area(overlay(b, a, "difference"))
    assert abs((ad + ad2 + ai) - au) < tol


def test_overlay_rep_point_false_negative_regression():
    """Regression (fuzz seed 570757): offset rectangles whose interior
    rep points both fall on/outside the other operand — union returned
    EMPTY and intersection MULTIPOINT until the envelope-probe overlap
    test + same-pair system-consistency retry."""
    rng = np.random.default_rng(570757)
    x0, y0 = rng.integers(-5, 5, 2)
    w1, h1 = rng.integers(1, 5, 2)
    a = Geom.polygon([(x0, y0), (x0 + w1, y0), (x0 + w1, y0 + h1), (x0, y0 + h1)])
    bx0, by0 = x0 + rng.integers(-2, 3), y0 + rng.integers(-2, 3)
    w2, h2 = rng.integers(1, 5, 2)
    ring = np.array(
        [(bx0, by0), (bx0 + w2, by0), (bx0 + w2, by0 + h2), (bx0, by0 + h2)],
        dtype=float,
    )
    ring += (rng.integers(-3, 4, ring.shape)) * np.spacing(np.maximum(np.abs(ring), 1.0))
    b = Geom.polygon([tuple(p) for p in ring])
    for op, want in (("union", 7.0), ("intersection", 1.0),
                     ("difference", 1.0), ("symdifference", 6.0)):
        assert abs(alg.area(overlay(a, b, op)) - want) < 1e-5, op


def test_overlay_holed_and_lshape_ulp_regressions():
    """Regressions (found by the donut/L-shape fuzz families): (1) union
    silently filled the un-covered half of A's hole; (2) an L-shape ∩
    1-ulp-shifted rect collapsed to MULTIPOINT (rep-point AND quarter-grid
    probes all missed the overlap strip); (3) difference and intersection
    lied CONSISTENTLY by the same hole area, cancelling in every area
    identity — only the pointwise hole-witness check sees it."""
    cases = [
        (  # (3) correlated hole-blind lies
            "POLYGON ((4 4, 8 4, 8 5, 4 5, 4 4), (5 4.25, 7 4.25, 7 4.75, 5 4.75, 5 4.25))",
            "POLYGON ((2.9999999999999996 1.9999999999999987, 7.000000000000002 2, "
            "6.999999999999999 5.999999999999998, 2.9999999999999987 6, "
            "2.9999999999999996 1.9999999999999987))",
        ),
        (  # (1) partially-covered hole filled by union
            "POLYGON ((-5 -3, -3 -3, -3 -2, -5 -2, -5 -3), "
            "(-4.5 -2.75, -3.5 -2.75, -3.5 -2.25, -4.5 -2.25, -4.5 -2.75))",
            "POLYGON ((-6.499999999999998 -3.500000000000004, -3.4999999999999987 -3.499999999999996, "
            "-3.5000000000000013 -2.499999999999996, -6.500000000000002 -2.500000000000004, "
            "-6.499999999999998 -3.500000000000004))",
        ),
        (  # (2) L-shape intersection collapse
            "POLYGON ((3 4, 6 4, 6 5, 4.5 5, 4.5 6, 3 6, 3 4))",
            "POLYGON ((4.000000000000003 4.999999999999998, 8.000000000000004 5, "
            "8.000000000000005 7.000000000000001, 4.000000000000003 7.000000000000002, "
            "4.000000000000003 4.999999999999998))",
        ),
    ]
    from nettopologysuite_ray.geom.validity import is_valid

    for aw, bw in cases:
        a, b = from_wkt(aw), from_wkt(bw)
        aa, ab = alg.area(a), alg.area(b)
        u = overlay(a, b, "union")
        i = overlay(a, b, "intersection")
        d = overlay(a, b, "difference")
        dr = overlay(b, a, "difference")
        s = overlay(a, b, "symdifference")
        au, ai, ad, adr, asym = (alg.area(g) for g in (u, i, d, dr, s))
        tol = 1e-6 * max(aa, ab, 1.0)
        assert abs((aa + ab) - (au + ai)) <= tol
        assert abs((ad + ai) - aa) <= tol
        assert abs((adr + ai) - ab) <= tol
        assert abs(asym - (au - ai)) <= tol
        assert all(is_valid(g) for g in (u, i, d, dr, s))


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_overlay_donut_lshape_families_fuzz(seed):
    """The tools/fuzz_overlay.py generator families (plain/donut/L-shape ×
    ulp-perturbed/ulp-rotated/hole-coincident) under the full 5-op
    inclusion-exclusion system — the families that found the hole-fill
    and correlated hole-blind arrangement bugs."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import fuzz_overlay

    rng = np.random.default_rng(seed)
    a, b = fuzz_overlay.make_pair(rng)
    assert fuzz_overlay.check(a, b) == []


def test_overlay_multipolygon_component_drop_regressions():
    """Regressions (multipolygon fuzz family): (1) near-touching sibling
    components (3e-15 gap) never healed because every snapped retry
    operand was an invalid adjacent multipolygon — siblings are now
    unioned after snapping; (2) intersection silently dropped one
    component's whole overlap block with a PLAUSIBLE nonzero area and a
    correct difference — overlapping intersections are now pinned
    against the difference sibling unconditionally."""
    from nettopologysuite_ray.geom.validity import is_valid

    cases = [
        (
            "MULTIPOLYGON (((-2 -1, 1 -1, 1 1, -2 1, -2 -1)), "
            "((1.000000000000003 -1, 5.0000000000000036 -1, "
            "5.0000000000000036 1, 1.000000000000003 1, 1.000000000000003 -1)))",
            "POLYGON ((-3.0000000000000013 -3.0000000000000004, 0 -2.9999999999999987, "
            "-4.440892098500626e-16 0.9999999999999998, -2.999999999999999 1, "
            "-3.0000000000000013 -3.0000000000000004))",
        ),
        (
            "MULTIPOLYGON (((-4 -4, -1 -4, -1 0, -4 0, -4 -4)), "
            "((0 -4, 4 -4, 4 -2, 0 -2, 0 -4)))",
            "POLYGON ((-1.9999999999999996 -4.000000000000001, "
            "1.0000000000000002 -3.9999999999999973, 1.0000000000000004 -1.9999999999999996, "
            "-1.9999999999999991 -2.000000000000001, -1.9999999999999996 -4.000000000000001))",
        ),
        (
            "MULTIPOLYGON (((-1 4, 0 4, 0 6, -1 6, -1 4)), "
            "((3e-15 4, 1.000000000000003 4, 1.000000000000003 5, 3e-15 5, 3e-15 4)))",
            "POLYGON ((-2.5000000000000044 2.000000000000003, 0.4999999999999958 1.999999999999997, "
            "0.5000000000000042 5.9999999999999964, -2.4999999999999956 6.0000000000000036, "
            "-2.5000000000000044 2.000000000000003))",
        ),
    ]
    for aw, bw in cases:
        a, b = from_wkt(aw), from_wkt(bw)
        aa, ab = alg.area(a), alg.area(b)
        u = overlay(a, b, "union")
        i = overlay(a, b, "intersection")
        d = overlay(a, b, "difference")
        dr = overlay(b, a, "difference")
        s = overlay(a, b, "symdifference")
        au, ai, ad, adr, asym = (alg.area(g) for g in (u, i, d, dr, s))
        tol = 1e-6 * max(aa, ab, 1.0)
        assert abs((aa + ab) - (au + ai)) <= tol
        assert abs((ad + ai) - aa) <= tol
        assert abs((adr + ai) - ab) <= tol
        assert abs(asym - (au - ai)) <= tol
        assert all(is_valid(g) for g in (u, i, d, dr, s))


def test_ring_area_anchored_far_from_origin():
    """ring_signed_area anchors at the first vertex (Area.cs
    OfRingSigned): a unit-scale ring translated to |coord|~1e7 keeps an
    exact area (the raw shoelace loses ~0.02 per term there — the r4
    fuzz large-offset family caught identity violations 1000x tol)."""
    for off in (0.0, 1e7, -1e7, 3.7e7):
        ring = np.array(
            [(off, off), (off + 3, off), (off + 3, off + 2), (off, off + 2), (off, off)]
        )
        assert alg.ring_signed_area(ring) == 6.0


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**6),
    st.sampled_from([1e7, -1e7, 3.7e7]),
)
def test_overlay_inclusion_exclusion_large_offset(seed, off):
    """r4 fuzz family pinned: lattice pairs with ulp perturbations at
    |coord|~1e7 (one ulp ~2e-9) satisfy the area identities and produce
    valid results."""
    from nettopologysuite_ray.geom.validity import is_valid

    rng = np.random.default_rng(seed)
    x0 = float(rng.integers(-5, 5)) + off
    y0 = float(rng.integers(-5, 5)) + off
    w1, h1 = (int(v) for v in rng.integers(1, 5, 2))
    a = Geom.polygon([(x0, y0), (x0 + w1, y0), (x0 + w1, y0 + h1), (x0, y0 + h1)])
    bx0 = x0 + float(rng.integers(-2, 3))
    by0 = y0 + float(rng.integers(-2, 3))
    w2, h2 = (int(v) for v in rng.integers(1, 5, 2))
    ring = np.array(
        [(bx0, by0), (bx0 + w2, by0), (bx0 + w2, by0 + h2), (bx0, by0 + h2)],
        dtype=float,
    )
    ring += rng.integers(-3, 4, ring.shape) * np.spacing(np.abs(ring))
    b = Geom.polygon([tuple(p) for p in ring])
    from nettopologysuite_ray.geom.validity import is_valid

    aa, ab = alg.area(a), alg.area(b)
    u = overlay(a, b, "union")
    i = overlay(a, b, "intersection")
    d = overlay(a, b, "difference")
    dr = overlay(b, a, "difference")
    s = overlay(a, b, "symdifference")
    au, ai, ad, adr, asym = (alg.area(g) for g in (u, i, d, dr, s))
    tol = 1e-6 * max(aa, ab, 1.0)
    assert abs((aa + ab) - (au + ai)) <= tol
    assert abs((ad + ai) - aa) <= tol
    assert abs((adr + ai) - ab) <= tol
    assert abs(asym - (au - ai)) <= tol
    assert all(is_valid(g) for g in (u, i, d, dr, s))


def test_pack_cell_overflow_raises():
    """Cell indices beyond +-2^30 fail loudly (they used to corrupt
    silently at 21 bits and return empty topology output)."""
    import numpy as np
    import pytest

    from nettopologysuite_ray.stages.polygonize import _pack_cell, _unpack_cell

    cx = np.array([5_000_000], dtype=np.int64)  # 1e7 frame / cell=2
    cy = np.array([-3_000_000], dtype=np.int64)
    packed = _pack_cell(cx, cy)
    assert _unpack_cell(int(packed[0])) == (5_000_000, -3_000_000)
    with pytest.raises(ValueError):
        _pack_cell(np.array([1 << 31], dtype=np.int64), cy)
    with pytest.raises(ValueError):
        _pack_cell(cx, np.array([-(1 << 31)], dtype=np.int64))


def test_buffer_translation_invariant_far_from_origin():
    from nettopologysuite_ray.geom.buffer import buffer

    base = [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0)]
    ref = alg.area(buffer(Geom.polygon(base), 1.0))
    for off in (1e7, -1e7, 3.7e7):
        g = Geom.polygon([(x + off, y + off) for x, y in base])
        assert alg.area(buffer(g, 1.0)) == ref


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_overlay_r4_families_fuzz(seed):
    """The round-4 generator families (needle slivers, subdivided shared
    edges, concave radial stars, 1e7-offset frames, mixed-scale
    contrast) under the full 5-op inclusion-exclusion system with
    identity-scaled tolerances."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import fuzz_overlay

    rng = np.random.default_rng(seed)
    a, b = fuzz_overlay.make_pair_r4(rng)
    assert fuzz_overlay.check(a, b) == []


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**6),
    st.sampled_from([0.0, 1e7, -1e7, 3.7e7]),
)
def test_union_order_invariance_and_relate_symmetry(seed, off):
    """union_all is permutation-invariant (within vertex-noise area
    tolerance) and relate is transpose-symmetric, at origin and
    large-offset frames.  Perturbations floor the ulp at 1.0 so no
    denormal ordinates arise (segment_intersection documents the
    denormal-only operand-order rounding convention)."""
    from nettopologysuite_ray.geom.validity import is_valid

    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(rng.integers(3, 8)):
        x0 = float(rng.integers(-6, 6)) + off
        y0 = float(rng.integers(-6, 6)) + off
        w, h = (float(v) for v in rng.integers(1, 5, 2))
        ring = np.array([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)])
        if rng.random() < 0.5:
            ring = ring + rng.integers(-3, 4, ring.shape) * np.spacing(
                np.maximum(np.abs(ring), 1.0)
            )
        parts.append(Geom.polygon([tuple(p) for p in ring]))
    u1 = union_all(parts)
    u2 = union_all([parts[i] for i in rng.permutation(len(parts))])
    a1, a2 = alg.area(u1), alg.area(u2)
    assert is_valid(u1) and is_valid(u2)
    assert abs(a1 - a2) <= 1e-6 * max(a1, a2, 1.0)
    m1 = pred.relate(parts[0], parts[-1])
    m2 = pred.relate(parts[-1], parts[0])
    if "".join(m1[j * 3 + i] for i in range(3) for j in range(3)) != m2:
        # documented exception (see pred.relate docstring): for pairs
        # with edges nearly coincident within a few ulp at large
        # magnitudes, node rounding follows operand order and the true
        # matrix is below float resolution.  The asymmetry must vanish
        # once coordinates are snapped out of the ambiguity band.
        def snap(g):
            grid = 64.0 * float(np.spacing(max(abs(off), 1.0)))
            return Geom.polygon(
                [tuple(np.round(np.asarray(p) / grid) * grid) for p in g.data[0]]
            )
        s1, s2 = snap(parts[0]), snap(parts[-1])
        n1 = pred.relate(s1, s2)
        n2 = pred.relate(s2, s1)
        assert "".join(n1[j * 3 + i] for i in range(3) for j in range(3)) == n2, (
            f"asymmetry survives snapping: {m1} vs {m2} -> {n1} vs {n2}"
        )


def test_overlay_invalid_operand_fixer_rung_regression():
    """Regression (fuzz seed 7700 pair 19957): B's hole vertex sits 1-2
    ulp OUTSIDE its shell corner (invalid, "rings cross"), and the raw
    arrangement silently returned EMPTY for union AND intersection.  No
    snapped candidate of the raw rings can ever satisfy the
    inclusion-exclusion system, so the retry ladder ends in a
    GeometryFixer rung (reference GeometryFixer.cs:46 semantics) and the
    identities must hold against the operand areas.  The one-sided-empty
    overlays of the same invalid operand also healed (previously ∅)."""
    a = from_wkt(
        "POLYGON ((1 -1, 5 -1, 5 2, 1 2, 1 -1), (1 -1, 3 -0.25, 2 0.5, 1 -1))"
    )
    b = from_wkt(
        "POLYGON ((3.000000000000001 -2.0000000000000013, "
        "6.999999999999997 -2.0000000000000013, 7.000000000000003 "
        "1.0000000000000007, 2.9999999999999987 1.0000000000000002, "
        "3.000000000000001 -2.0000000000000013), (3 -2.0000000000000004, "
        "5.000000000000001 -1.2500000000000002, 4.000000000000001 "
        "-0.5000000000000004, 3 -2.0000000000000004))"
    )
    aa, ab = alg.area(a), alg.area(b)
    tol = 1e-6 * max(aa, ab)
    u = alg.area(overlay(a, b, "union"))
    i = alg.area(overlay(a, b, "intersection"))
    d = alg.area(overlay(a, b, "difference"))
    dr = alg.area(overlay(b, a, "difference"))
    s = alg.area(overlay(a, b, "symdifference"))
    assert abs((u + i) - (aa + ab)) <= tol
    assert abs((d + i) - aa) <= tol
    assert abs((dr + i) - ab) <= tol
    assert abs(s - (u - i)) <= tol
    assert i > tol  # the operands genuinely overlap
    empty = from_wkt("POLYGON EMPTY")
    assert abs(alg.area(overlay(b, empty, "union")) - ab) <= tol
    assert abs(alg.area(overlay(empty, b, "union")) - ab) <= tol
    assert abs(alg.area(overlay(b, empty, "difference")) - ab) <= tol
    assert alg.area(overlay(empty, b, "difference")) <= tol
    assert alg.area(overlay(b, empty, "intersection")) <= tol


def test_relate_midpoint_plateau_regression():
    """Regression (hypothesis seed 712111): B's near-vertical edge
    crosses A's exact edge x=5; the parametric midpoint of one split
    piece rounds exactly onto x=5.0 in one operand order only, which
    used to bump boundary-boundary to dim 1 asymmetrically.  The exact
    kernel says the edges cross at a point, so dim 0 is correct both
    ways."""
    from nettopologysuite_ray.geom import predicates as pred
    from nettopologysuite_ray.geom.wkt import from_wkt

    a = from_wkt("POLYGON ((1 2, 5 2, 5 5, 1 5, 1 2))")
    b = from_wkt(
        "POLYGON ((4.999999999999998 1.9999999999999991, "
        "7.000000000000001 1.9999999999999996, 6.999999999999999 3, "
        "5.000000000000001 2.999999999999999, "
        "4.999999999999998 1.9999999999999991))"
    )
    m1 = pred.relate(a, b)
    m2 = pred.relate(b, a)
    assert m1 == "212101212"
    assert "".join(m1[j * 3 + i] for i in range(3) for j in range(3)) == m2


def test_union_micro_gap_weld_regression():
    """Regression (union permutation fuzz seeds 601405/601965/602712):
    noding placed the same geometric node at two floats ~1 ulp apart
    (operand corner vs crossing on a near-coincident edge) and the
    micro-piece between them fell under the piece-length floor — the
    orbit walk silently dropped the whole bottom component cluster
    (union of 24+9 returned 17).  _weld_unbalanced_micro_nodes closes
    the gap at assembly."""
    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.overlay import overlay
    from nettopologysuite_ray.geom.validity import is_valid
    from nettopologysuite_ray.geom.wkt import from_wkt

    acc = from_wkt(
        "MULTIPOLYGON (((-5.999999999999999 3.999999999999999, "
        "-5.000000000000003 4.000000000000001, -4.999999999999997 "
        "0.9999999999999998, -4 1, -4 0, -3 0, -3 0.9999999999999998, "
        "-0.9999999999999998 0.9999999999999998, -1.0000000000000007 "
        "4.000000000000002, -4.999999999999999 4.000000000000001, -4 "
        "4.000000000000003, -4.000000000000003 5.000000000000001, "
        "-5.999999999999998 4.999999999999999, -5.999999999999999 "
        "3.999999999999999)), ((-6.000000000000003 -1.9999999999999996, "
        "-5.999999999999999 -3.0000000000000004, -4.000000000000002 -3, "
        "-3.9999999999999982 -2.0000000000000013, -6.000000000000003 "
        "-1.9999999999999996)), ((-4 -6, -3 -6, -3 -4, -1 -4, -1 -2, "
        "-3 -2, -3 -3, -4 -3, -4 -6)))"
    )
    p = from_wkt(
        "POLYGON ((-2 -3.9999999999999973, 1.0000000000000004 "
        "-4.000000000000001, 1.0000000000000004 -1.0000000000000007, "
        "-2.0000000000000004 -1.0000000000000002, -2 "
        "-3.9999999999999973))"
    )
    u = overlay(acc, p, "union")
    assert is_valid(u)
    assert abs(alg.area(u) - 31.0) < 1e-6


def test_candidate_pairs_grid_matches_dense():
    """The hashed-grid candidate generator (used by noding and the
    validity kernels above the dense-matrix threshold) must return exactly
    the bbox-overlapping pairs the dense mask returns, including for
    oversize near-diagonal segments routed through the all-pairs
    fallback."""
    from nettopologysuite_ray.geom.overlay import _bbox_pairs, _candidate_pairs

    rng = np.random.default_rng(3)

    def rand_segs(n, spread=100.0, maxlen=3.0):
        p0 = rng.uniform(-spread, spread, (n, 2))
        d = rng.uniform(-maxlen, maxlen, (n, 2))
        return np.column_stack([p0, p0 + d])

    n, m = 1100, 1100  # above the 1M dense threshold
    sa = rand_segs(n)
    sa[:3] = [
        [-100, -100, 100, 100],
        [-100, 100, 100, -100],
        [0, -100, 0, 100],
    ]
    sb = rand_segs(m)
    assert set(map(tuple, _candidate_pairs(sa, sb))) == set(_bbox_pairs(sa, sb))
    assert set(map(tuple, _candidate_pairs(sa))) == {
        (i, j) for i, j in _bbox_pairs(sa, sa) if i < j
    }


def test_union_all_cascade_scaling():
    """Cascaded (tree) union with component pruning: 400 scattered
    rectangles union in well under a second (the linear fold took tens of
    seconds) and produce the exact lattice area."""
    import time

    rng = np.random.default_rng(17)
    parts = []
    for _ in range(400):
        x0 = float(rng.integers(-40, 40))
        y0 = float(rng.integers(-40, 40))
        w, h = (float(v) for v in rng.integers(1, 6, 2))
        parts.append(
            Geom.polygon([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)])
        )
    t0 = time.time()
    u = union_all(parts)
    dt = time.time() - t0
    from nettopologysuite_ray.geom.validity import is_valid

    assert is_valid(u)
    # exact rasterized truth on the integer lattice (all corners integral)
    grid = np.zeros((90, 90), dtype=bool)
    for p in parts:
        r = p.data[0]
        x0, y0 = int(r[:, 0].min()) + 45, int(r[:, 1].min()) + 45
        x1, y1 = int(r[:, 0].max()) + 45, int(r[:, 1].max()) + 45
        grid[x0:x1, y0:y1] = True
    assert abs(alg.area(u) - float(grid.sum())) < 1e-9
    assert dt < 5.0, f"cascaded union too slow: {dt:.2f}s"
