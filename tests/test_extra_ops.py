"""Tests for the extra SURVEY §2 operators (geom/extra.py)."""

import math

import numpy as np

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom import extra
from nettopologysuite_ray.geom.types import Geom
from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt


def test_frechet_basic():
    a = from_wkt("LINESTRING (0 0, 10 0)")
    b = from_wkt("LINESTRING (0 1, 10 1)")
    assert extra.frechet(a, b) == 1.0
    c = from_wkt("LINESTRING (0 0, 10 0)")
    assert extra.frechet(a, c) == 0.0


def test_similarity_measures():
    a = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    b = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert extra.area_similarity(a, b) == 1.0
    c = from_wkt("POLYGON ((5 0, 15 0, 15 10, 5 10, 5 0))")
    assert abs(extra.area_similarity(a, c) - 50.0 / 150.0) < 1e-12
    assert extra.hausdorff_similarity(a, b) == 1.0
    assert 0.0 < extra.hausdorff_similarity(a, c) < 1.0
    assert extra.frechet_similarity(a, b) == 1.0


def test_minimum_bounding_circle():
    g = from_wkt("MULTIPOINT ((0 0), (10 0), (5 5))")
    (cx, cy), r = extra.minimum_bounding_circle(g)
    assert abs(cx - 5) < 1e-9 and abs(cy) < 1e-9 and abs(r - 5) < 1e-9
    # all points covered
    for p in g.data:
        assert math.hypot(p[0] - cx, p[1] - cy) <= r + 1e-9
    (cx1, cy1), r1 = extra.minimum_bounding_circle(from_wkt("POINT (3 4)"))
    assert (cx1, cy1, r1) == (3.0, 4.0, 0.0)


def test_minimum_bounding_circle_large_offset():
    """Fuzz regression (constructive campaign, +1e7 frame): _circumcenter
    squared absolute ordinates (~1e14) and cancelled catastrophically —
    centers came back ~18 units off, leaving inputs far outside the
    circle.  The circumcenter now forms its quadratic terms in a local
    frame anchored at the first point."""
    off = 1e7
    g = from_wkt(
        f"MULTIPOINT (({off} {off}), ({off + 10} {off}), ({off + 5} {off + 5}),"
        f" ({off + 2} {off + 1}), ({off + 7} {off + 2}))"
    )
    (cx, cy), r = extra.minimum_bounding_circle(g)
    assert abs(cx - (off + 5)) < 1e-6 and abs(cy - off) < 1e-6
    assert abs(r - 5) < 1e-6
    for p in g.data:
        assert math.hypot(p[0] - cx, p[1] - cy) <= r + 1e-6


def test_minimum_diameter_degenerate_sliver_hull():
    """Fuzz regression: rotating calipers used the CLAMPED point-segment
    distance instead of the perpendicular line distance (reference
    MinimumDiameter.cs uses PointToLinePerpendicular) — a sub-ulp-
    collinear multipoint whose hull degenerates to a sliver polygon
    returned an edge LENGTH (~1.17) as the diameter instead of ~0."""
    import numpy as np

    from nettopologysuite_ray.geom.types import MULTIPOINT, Geom

    t = np.array([1.0, 3.7, 8.2, 13.9, 19.6])
    d = np.array([-0.70710678118, 0.70710678118])
    pts = t[:, None] * d  # exactly-computed products: sub-ulp off-line
    g = Geom(MULTIPOINT, [p for p in pts])
    w, _seg = extra.minimum_diameter(g)
    assert w < 1e-9, w


def test_minimum_diameter_and_rectangle():
    g = from_wkt("POLYGON ((0 0, 20 0, 20 5, 0 5, 0 0))")
    w, seg = extra.minimum_diameter(g)
    assert abs(w - 5) < 1e-9
    rect = extra.minimum_area_rectangle(g)
    assert abs(alg.area(rect) - 100.0) < 1e-6
    # rotated thin rectangle: min-area rect hugs it
    g2 = from_wkt("POLYGON ((0 0, 10 10, 11 9, 1 -1, 0 0))")
    rect2 = extra.minimum_area_rectangle(g2)
    assert alg.area(rect2) <= alg.area(extra.minimum_area_rectangle(g2)) + 1e-9
    assert alg.area(rect2) < 25  # far below the axis-aligned bbox (~121)


def test_coverage_union_grid():
    # 2x2 grid of unit squares → one 2x2 square, no noding
    polys = []
    for ix in range(2):
        for iy in range(2):
            polys.append(
                from_wkt(
                    f"POLYGON (({ix} {iy}, {ix+1} {iy}, {ix+1} {iy+1}, {ix} {iy+1}, {ix} {iy}))"
                )
            )
    u = extra.coverage_union(polys)
    assert abs(alg.area(u) - 4.0) < 1e-12
    # topologically the 2x2 square (boundary chains keep lattice vertices,
    # as the reference's noding-free CoverageUnion does)
    from nettopologysuite_ray.geom import predicates as pred

    assert pred.equals_topo(u, from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"))


def test_length_indexed_line():
    line = from_wkt("LINESTRING (0 0, 10 0, 10 10)")
    lil = extra.LengthIndexedLine(line)
    assert lil.end_index == 20.0
    assert to_wkt(lil.extract_point(5)) == "POINT (5 0)"
    assert to_wkt(lil.extract_point(15)) == "POINT (10 5)"
    sub = lil.extract_line(5, 15)
    assert to_wkt(sub) == "LINESTRING (5 0, 10 0, 10 5)"
    assert lil.project(7, 3) == 7.0
    assert lil.project(12, 4) == 14.0


def test_fix_geometry_bowtie():
    bow = from_wkt("POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))")
    from nettopologysuite_ray.geom.validity import is_valid

    assert not is_valid(bow)
    fixed = extra.fix_geometry(bow)
    assert is_valid(fixed)
    assert abs(alg.area(fixed) - 50.0) < 1e-9  # both lobes kept (the raw
    # bowtie shoelace self-cancels to 0)
    # valid input is still processed (reference: "even valid inputs may
    # have some minor alterations") but comes back equal
    ok = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert alg.equals_exact(alg.normalize(extra.fix_geometry(ok)), alg.normalize(ok))


def test_maximum_inscribed_circle():
    sq = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    (cx, cy), r = extra.maximum_inscribed_circle(sq, 1e-3)
    assert abs(cx - 5) < 0.05 and abs(cy - 5) < 0.05 and abs(r - 5) < 0.05
    # with a hole: circle squeezes beside it
    holed = from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 0.5, 6 0.5, 6 9.5, 4 9.5, 4 0.5))"
    )
    (hx, _hy), hr = extra.maximum_inscribed_circle(holed, 1e-3)
    assert hr < 2.1  # bounded by the 4-wide side corridors
    assert hx < 4 or hx > 6


def test_largest_empty_circle():
    obs = from_wkt("MULTIPOINT ((0 0), (10 0), (10 10), (0 10))")
    bound = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    (cx, cy), r = extra.largest_empty_circle(obs, bound, 1e-3)
    assert abs(cx - 5) < 0.05 and abs(cy - 5) < 0.05
    assert abs(r - (50 ** 0.5)) < 0.05


def test_coverage_validate_and_sequencer():
    p1 = from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    p2 = from_wkt("POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))")
    assert extra.coverage_validate([p1, p2]) == []
    p3 = from_wkt("POLYGON ((1 0, 1 1, 2 2, 1 0))")
    assert len(extra.coverage_validate([p1, p2, p3])) == 1
    seqs = extra.sequence_lines(
        [from_wkt("LINESTRING (0 0, 1 1)"), from_wkt("LINESTRING (2 2, 1 1)"), from_wkt("LINESTRING (2 2, 3 3)")]
    )
    assert len(seqs) == 1
    assert seqs[0].tolist() == [[0, 0], [1, 1], [2, 2], [3, 3]]


def test_variable_buffer_and_offset_curve():
    vb = extra.variable_buffer(from_wkt("LINESTRING (0 0, 10 0)"), [1.0, 3.0])
    a = alg.area(vb)
    # trapezoid 40 + half-disks (pi/2 + 9pi/2 ~ 15.7), inscribed 32-gons
    assert 52 < a < 58
    oc = extra.offset_curve(from_wkt("LINESTRING (0 0, 10 0)"), 2.0)
    pts = oc.all_coords()
    assert len(pts) >= 2
    assert (pts[:, 1] >= -1e-9).all()  # left side only (y >= 0)
    oc2 = extra.offset_curve(from_wkt("LINESTRING (0 0, 10 0)"), -2.0)
    assert (oc2.all_coords()[:, 1] <= 1e-9).all()

    # fuzz regressions (fuzz_offset):
    # (1) offset distance comparable to line length — the welded buffer
    # boundary loses the side edge's exact tangent VERTEX into a cap arc;
    # edge-midpoint classification must still keep the parallel section
    short = from_wkt("LINESTRING (0 0, 1.9 0.6)")
    for d in (1.7, -1.7):
        oc3 = extra.offset_curve(short, d)
        assert not oc3.is_empty, d
        for p in oc3.all_coords():
            dd = alg.distance(from_wkt(f"POINT ({p[0]} {p[1]})"), short)
            assert abs(dd - 1.7) < 0.05, (d, dd)
    # (2) variable_buffer's piece-union grid is a WELD, not a precision
    # model — the fixed-precision path silently dropped a capsule piece
    line = from_wkt(
        "LINESTRING (6.2 4.9, 16.76 13.35, 22.59 18.0, 22.62 18.03)"
    )
    vb2 = extra.variable_buffer(line, [0.95, 0.68, 0.24, 0.72])
    for p in line.all_coords():
        assert alg.locate_in_geom(float(p[0]), float(p[1]), vb2) != alg.EXTERIOR


def test_simplify_vw():
    """Visvalingam-Whyatt (reference: Simplify/VWSimplifier.cs:29)."""
    from nettopologysuite_ray.geom.coverage_simplify import simplify_vw
    from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt

    g = from_wkt("LINESTRING (0 0, 1 0.1, 2 0, 3 0.1, 4 0, 10 0, 10 10)")
    assert to_wkt(simplify_vw(g, 1.0)) == "LINESTRING (0 0, 10 0, 10 10)"
    # tiny tolerance: unchanged
    assert to_wkt(simplify_vw(g, 0.01)) == to_wkt(g)


def test_coverage_simplify_edge_consistent():
    """Coverage simplification keeps shared borders identical between
    neighbours (reference: Coverage/CoverageSimplifier.cs:48)."""
    import numpy as np

    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.coverage_simplify import coverage_simplify
    from nettopologysuite_ray.geom.overlay import overlay, union_all
    from nettopologysuite_ray.geom.types import Geom
    from nettopologysuite_ray.geom.validity import is_valid

    def wiggle(p0, p1, k=4, amp=0.15, seed=0):
        rng = np.random.default_rng(seed)
        ts = np.linspace(0, 1, k + 1)
        base = np.outer(1 - ts, p0) + np.outer(ts, p1)
        d = np.array(p1) - np.array(p0)
        nrm = np.array([-d[1], d[0]]) / np.hypot(*d)
        off = rng.uniform(-amp, amp, size=k + 1)
        off[0] = off[-1] = 0
        return base + np.outer(off, nrm)

    H = {(i, j): wiggle((i, j), (i + 1, j), seed=100 + i * 10 + j) for i in range(3) for j in range(4)}
    V = {(i, j): wiggle((i, j), (i, j + 1), seed=200 + i * 10 + j) for i in range(4) for j in range(3)}
    cells = []
    for i in range(3):
        for j in range(3):
            ring = np.concatenate(
                [H[(i, j)][:-1], V[(i + 1, j)][:-1], H[(i, j + 1)][::-1][:-1], V[(i, j)][::-1]]
            )
            cells.append(Geom.polygon(ring))
    simp = coverage_simplify(cells, 0.4)
    assert all(is_valid(c) for c in simp)
    nv0 = sum(len(c.data[0]) for c in cells)
    nv1 = sum(len(c.data[0]) for c in simp)
    assert nv1 < nv0 * 0.5
    # coverage property: no overlaps appear between any pair
    for x in range(len(simp)):
        for y in range(x + 1, len(simp)):
            assert alg.area(overlay(simp[x], simp[y], "intersection")) == 0.0
    # inner-only keeps the union (outer boundary) EXACT
    simp2 = coverage_simplify(cells, 0.4, inner_only=True)
    assert abs(alg.area(union_all(simp2)) - alg.area(union_all(cells))) < 1e-9


def test_coverage_simplify_standalone_ring_survives():
    """A free ring (no nodes) must keep >= 4 vertices at any tolerance —
    the ring-wrap vertex is not a node (reference: CoverageSimplifier
    preserves a minimal ring; regression for the pts[-1] closing-dup bug)."""
    from nettopologysuite_ray.geom.coverage_simplify import coverage_simplify
    from nettopologysuite_ray.geom.wkt import from_wkt

    sq = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    (out,) = coverage_simplify([sq], tol=8)
    assert not out.is_empty
    assert len(out.data[0]) >= 4
    # shared border between two squares stays identical and un-noded
    a = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    b = from_wkt("POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))")
    oa, ob = coverage_simplify([a, b], tol=3)
    sa = {tuple(p) for p in oa.data[0]}
    sb = {tuple(p) for p in ob.data[0]}
    assert {(10.0, 0.0), (10.0, 10.0)} <= (sa & sb)


def test_simplify_vw_multi_collapse_keeps_type():
    """simplify_vw of a MultiPolygon whose parts all vanish returns an
    empty MULTIpolygon (type-stable), not an empty Polygon."""
    from nettopologysuite_ray.geom.coverage_simplify import simplify_vw
    from nettopologysuite_ray.geom.types import Geom, MULTIPOLYGON
    import numpy as np

    deg = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])  # <4 pts => collapses
    mp = Geom(MULTIPOLYGON, [[deg], [deg + 5.0]])
    out = simplify_vw(mp, 100.0)
    assert out.gtype == "MultiPolygon" and out.is_empty


def test_ivf_ann_recall(ray_session):
    """IVF-bucketed ANN (functions/embed.py ivf_ann_topk) finds most of the
    exact top-k, and its plumbing (bucket assign -> probe -> tree merge)
    is deterministic across runs."""
    import numpy as np
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    from nettopologysuite_ray.functions.embed import ann_topk, ivf_ann_topk

    sf = "/root/testdata/sf0.001"
    emb = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(emb["vec_id"].to_pylist())
    vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    qids, qvecs = ids[:3], vecs[:3]
    qref = ray.put({"query_ids": qids, "vectors": qvecs})
    dim = vecs.shape[1]

    def run(fn, **kw):
        ds = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        df = fn(ds, qref, **kw).to_pandas()
        return {q: set(df[df.query_id == q].vec_id) for q in qids}

    exact = run(ann_topk, k=5)
    approx1 = run(ivf_ann_topk, dim=dim, k=5, nprobe=6)
    approx2 = run(ivf_ann_topk, dim=dim, k=5, nprobe=6)
    assert approx1 == approx2  # deterministic
    hits = sum(len(exact[q] & approx1[q]) for q in qids)
    total = sum(len(exact[q]) for q in qids)
    assert hits / total >= 0.6, f"recall {hits}/{total}"
    # full probe == exact
    full = run(ivf_ann_topk, dim=dim, k=5, nprobe=16)
    assert full == exact


def test_dissolve_lines():
    """LineDissolver ports (reference: test/.../Dissolve/LineDissolverTest.cs)."""
    from nettopologysuite_ray.geom.extra import dissolve_lines
    from nettopologysuite_ray.geom.types import GEOMETRYCOLLECTION, Geom
    from nettopologysuite_ray.geom.wkt import from_wkt

    def chains(x):
        out = set()
        for c in x.flatten():
            a = [(float(p[0]), float(p[1])) for p in c.all_coords()]
            out.add(tuple(min(a, a[::-1])))
        return out

    def check(inputs, expected):
        gs = [from_wkt(w) for w in ([inputs] if isinstance(inputs, str) else inputs)]
        g = gs[0] if len(gs) == 1 else Geom(GEOMETRYCOLLECTION, gs)
        assert chains(dissolve_lines(g)) == chains(from_wkt(expected))

    check("LINESTRING (0 0, 1 1)", "LINESTRING (0 0, 1 1)")
    check("LINESTRING (0 0, 1 1, 2 2)", "LINESTRING (0 0, 1 1, 2 2)")
    check(
        ["LINESTRING (0 0, 1 1, 2 2)", "LINESTRING (1 1, 2 2, 3 3)"],
        "LINESTRING (0 0, 1 1, 2 2, 3 3)",
    )
    check(
        ["LINESTRING (0 0, 1 1, 2 2)", "LINESTRING (1 1, 2 2, 3 3)", "LINESTRING (1 1, 2 2, 2 0)"],
        "MULTILINESTRING ((0 0, 1 1, 2 2), (2 0, 2 2), (2 2, 3 3))",
    )
    check(
        "MULTILINESTRING ((0 0, 1 0, 2 1), (0 0, 1 0, 2 0), (1 0, 2 1, 2 0, 3 0))",
        "MULTILINESTRING ((0 0, 1 0), (1 0, 2 0), (1 0, 2 1, 2 0), (2 0, 3 0))",
    )


def test_shape_factory():
    """GeometricShapeFactory / SineStarFactory shapes are valid and sized
    correctly (reference: Utilities/GeometricShapeFactory.cs:30)."""
    import math

    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.shape import GeometricShapeFactory, sine_star
    from nettopologysuite_ray.geom.validity import is_valid

    f = GeometricShapeFactory()
    f.set_base(0, 0)
    f.set_size(10)
    f.num_points = 64
    rect = f.create_rectangle()
    assert is_valid(rect) and alg.area(rect) == 100.0
    circ = f.create_circle()
    assert is_valid(circ)
    assert abs(alg.area(circ) - math.pi * 25) < 0.5
    arc = f.create_arc(0, math.pi)
    assert arc.gtype == "LineString" and len(arc.data) == 64
    pie = f.create_arc_polygon(0, math.pi / 2)
    assert is_valid(pie) and 0 < alg.area(pie) < math.pi * 25 / 3
    star = sine_star(centre=(5, 5), size=10, num_points=200, num_arms=8)
    assert is_valid(star)
    assert 0 < alg.area(star) < math.pi * 25


def test_nearest_points():
    """DistanceOp.NearestPoints parity: the pair realizes distance()
    (reference: Operation/Distance/DistanceOp.cs NearestPoints)."""
    import math

    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.wkt import from_wkt

    a = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    cases = [
        "POINT (15 5)",
        "LINESTRING (20 0, 20 10)",
        "POINT (5 5)",
        "POLYGON ((20 2, 25 2, 25 8, 20 8, 20 2))",
        "MULTIPOINT ((13 4), (30 30))",
    ]
    for wb in cases:
        b = from_wkt(wb)
        p, q = alg.nearest_points(a, b)
        assert math.isclose(math.dist(p, q), alg.distance(a, b), abs_tol=1e-12)
    assert alg.nearest_points(a, from_wkt("POINT (15 5)")) == ((10.0, 5.0), (15.0, 5.0))

    # fuzz regression (fuzz_metric): boundaries CROSSING between vertices,
    # no vertex of either operand inside the other — distance() is 0 via
    # the segment-intersection test, and nearest_points must return the
    # crossing point rather than a positive vertex-to-segment gap
    c = from_wkt("POLYGON ((9 -1, 11 -1, 11 11, 9 11, 9 -1))")
    p, q = alg.nearest_points(a, c)
    assert p == q
    assert math.isclose(alg.distance(a, c), 0.0, abs_tol=1e-15)
    # the shared point lies on both boundaries
    assert alg.locate_in_geom(p[0], p[1], a) != alg.EXTERIOR
    assert alg.locate_in_geom(p[0], p[1], c) != alg.EXTERIOR
    x = from_wkt("LINESTRING (0 0, 10 10)")
    y = from_wkt("LINESTRING (0 10, 10 0)")
    p2, q2 = alg.nearest_points(x, y)
    assert p2 == q2 == (5.0, 5.0)


def test_lsh_dedup_matches_union_find(ray_session):
    """lsh_dedup (linear star-edge label propagation) assigns the same
    cluster representatives as exact union-find over the candidate pair
    graph — the quadratic-free dedup shape for boilerplate clusters."""
    import ray
    import ray.data as rd

    from nettopologysuite_ray.functions.dedup import (
        MinHasher,
        lsh_candidate_pairs,
        lsh_dedup,
    )

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    sigs = ds.map_batches(
        MinHasher, batch_format="pyarrow", batch_size=1024, concurrency=(1, 2), num_cpus=1
    ).materialize()
    # shuffle_partitions must fit the 4-cpu test session (hash-join
    # aggregator actors each need a cpu)
    labels = {
        r[0]: r[1]
        for r in lsh_dedup(sigs, shuffle_partitions=4).to_pandas().itertuples(index=False)
    }
    pairs = lsh_candidate_pairs(sigs).to_pandas()

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs.id_a, pairs.id_b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ids = set(pairs.id_a) | set(pairs.id_b)
    assert ids
    for i in ids:
        assert labels.get(i, i) == find(i)


def test_min_label_propagation_long_chain(ray_session):
    """A path graph of diameter 9 converges to the global min label —
    the fixed-point + pointer-doubling regression test: the old one-hop
    propagation capped at 4 rounds mislabels any chain longer than its
    cap, while doubling reaches diameter 9 in ~4 rounds.  (Kept small:
    every round is a full shuffle with seconds of fixed Ray overhead.)"""
    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.functions.dedup import _min_label_propagation

    n = 10  # edges (i, i+1): min-id eccentricity 9 from the far end
    edges = rd.from_arrow(
        pa.table(
            {
                "a": pa.array(list(range(n - 1)), type=pa.int64()),
                "b": pa.array(list(range(1, n)), type=pa.int64()),
            }
        )
    ).materialize()
    labels = _min_label_propagation(edges, "doc_id", None, 2).to_pandas()
    assert len(labels) == n
    assert (labels["rep_id"] == 0).all()


def test_buffer_cap_styles():
    """End-cap styles (reference: Operation/Buffer/BufferParameters.cs
    EndCapStyle; tests BufferParameterTest.cs): flat = bare rectangle,
    square = extends d beyond each end, round (default) adds the disk
    caps; polygon rings are closed so caps never apply; a flat-cap point
    buffer is empty, a square-cap point buffer is the axis square."""
    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.buffer import buffer
    from nettopologysuite_ray.geom.validity import is_valid
    from nettopologysuite_ray.geom.wkt import from_wkt

    line = from_wkt("LINESTRING (0 0, 100 0)")
    flat = buffer(line, 10.0, cap="flat")
    assert alg.area(flat) == 2000.0 and is_valid(flat)
    sq = buffer(line, 10.0, cap="square")
    assert alg.area(sq) == 2400.0 and is_valid(sq)
    rnd = buffer(line, 10.0)
    assert alg.area(rnd) > 2000.0  # disk caps add area
    # interior joins stay round under flat caps (L-shape: outer corner arc)
    ell = from_wkt("LINESTRING (0 0, 100 0, 100 100)")
    f = buffer(ell, 10.0, cap="flat")
    assert 3900.0 < alg.area(f) < 4000.0 and is_valid(f)
    # points
    pt = from_wkt("POINT (5 5)")
    assert buffer(pt, 2.0, cap="flat").is_empty
    assert alg.area(buffer(pt, 2.0, cap="square")) == 16.0
    # polygons: cap style is a no-op (rings are closed)
    poly = from_wkt("POLYGON ((0 0, 50 0, 50 50, 0 50, 0 0))")
    assert abs(alg.area(buffer(poly, 5.0, cap="flat")) - alg.area(buffer(poly, 5.0))) < 1e-9


def test_buffer_single_sided():
    """Single-sided buffers (reference: BufferParameters.cs IsSingleSided):
    positive distance buffers the LEFT of the line, negative the RIGHT;
    ends are flat; the line itself bounds the region."""
    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.buffer import buffer
    from nettopologysuite_ray.geom.validity import is_valid
    from nettopologysuite_ray.geom.wkt import from_wkt

    line = from_wkt("LINESTRING (0 0, 100 0)")
    left = buffer(line, 10.0, single_sided=True)
    assert alg.area(left) == 1000.0 and is_valid(left)
    assert alg.centroid(left).data[1] == 5.0  # entirely on the left (y>0)
    right = buffer(line, -10.0, single_sided=True)
    assert alg.area(right) == 1000.0
    assert alg.centroid(right).data[1] == -5.0
    # inner turn: rect overlap removed exactly; outer turn: round join arc
    ell = from_wkt("LINESTRING (0 0, 100 0, 100 100)")
    inner = buffer(ell, 10.0, single_sided=True)
    assert alg.area(inner) == 1900.0 and is_valid(inner)
    outer = buffer(ell, -10.0, single_sided=True)
    assert 2000.0 < alg.area(outer) < 2100.0 and is_valid(outer)


def test_fractal_and_curve_builders():
    """Shape namespace parity (reference: Shape/Fractal/*.cs, Shape/Random/*,
    Shape/CubicBezierCurve.cs): Koch snowflake area converges to 8/5 of the
    inscribed triangle, Sierpinski carpet area = (8/9)^(level+1), curves
    visit every grid cell exactly once, random builders respect masks."""
    import math

    import numpy as np

    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.shape import (
        cubic_bezier_curve,
        hilbert_curve,
        koch_snowflake,
        morton_curve,
        random_points,
        random_points_in_grid,
        sierpinski_carpet,
    )
    from nettopologysuite_ray.geom.validity import is_valid
    from nettopologysuite_ray.geom.wkt import from_wkt

    # Koch: valid at several levels; area matches the closed form
    # tri * (1 + 1/3 * sum_{k<level} (4/9)^k) exactly
    tri_area = math.sin(math.pi / 3.0) / 2.0  # side-1 equilateral triangle
    for level in (0, 1, 2, 3):
        k = koch_snowflake((0, 0), 1.0, 3 * 4**level)
        assert is_valid(k)
        expect = tri_area * (1 + sum((4 / 9) ** j for j in range(level)) / 3)
        assert abs(alg.area(k) - expect) < 1e-9

    # Sierpinski: area = (8/9)^(level+1), holes = (9^(level+1) - 1) / 8
    for level in (0, 1, 2):
        s = sierpinski_carpet((0, 0), 1.0, 3 * 4**level)
        assert is_valid(s)
        assert abs(alg.area(s) - (8.0 / 9.0) ** (level + 1)) < 1e-9
        assert len(s.data) - 1 == (8 ** (level + 1) - 1) // 7

    # space-filling curves: 4^level points, each grid node visited once;
    # Hilbert is unit-step (length = n-1 cells), Morton jumps
    for level in (2, 3):
        n = 1 << level
        h = hilbert_curve((0, 0), float(n - 1), level)
        assert len(h.data) == n * n
        assert len({(p[0], p[1]) for p in h.data}) == n * n
        assert abs(alg.length(h) - (n * n - 1)) < 1e-9  # unit steps
        m = morton_curve((0, 0), float(n - 1), level)
        assert len({(p[0], p[1]) for p in m.data}) == n * n
        assert alg.length(m) > alg.length(h)  # Z-order jumps

    # Bezier: smooth interpolation passes through input vertices
    line = from_wkt("LINESTRING (0 0, 10 0, 10 10)")
    b = cubic_bezier_curve(line, 1.0, n_seg=8)
    bp = {(round(p[0], 9), round(p[1], 9)) for p in b.data}
    assert {(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)} <= bp
    assert alg.length(b) >= 20.0  # curve bows outward, never shorter

    # random points: deterministic, inside the mask, holes excluded
    holed = from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    )
    r1 = random_points(holed, 100, seed=7)
    r2 = random_points(holed, 100, seed=7)
    assert len(r1.data) == 100
    assert all((p1 == p2).all() for p1, p2 in zip(r1.data, r2.data))
    assert all(not (4 < p[0] < 6 and 4 < p[1] < 6) for p in r1.data)
    g = random_points_in_grid((0, 0, 8, 8), 4, seed=3, gutter_fraction=0.5)
    assert len(g.data) == 16
    # gutter: each point within the inset quarter of its 2x2 cell
    for j in range(4):
        for i in range(4):
            p = g.data[j * 4 + i]
            assert 2 * i + 0.5 <= p[0] <= 2 * i + 1.5
            assert 2 * j + 0.5 <= p[1] <= 2 * j + 1.5


def test_embed_near_dup_multiblock(ray_session):
    """embed_near_dup with tiny blocks (forces intra-block, cross-block and
    cross-row-pair paths) equals the brute-force all-pairs threshold join."""
    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.functions.embed import embed_near_dup

    rng = np.random.default_rng(11)
    n, dim = 137, 8
    m = rng.standard_normal((n, dim))
    # plant some genuine near-dups
    for a, b in ((3, 77), (10, 11), (50, 120), (121, 122)):
        m[b] = m[a] + rng.standard_normal(dim) * 0.05
    ids = rng.permutation(n).astype(np.int64) + 1000
    tau = 0.6
    tbl = pa.table({"vec_id": ids, "embedding": [list(map(float, r)) for r in m]})
    out = (
        embed_near_dup(rd.from_arrow(tbl), threshold=tau, block_rows=16)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    nrm = np.sqrt((m * m).sum(axis=1))
    sims = (m @ m.T) / (nrm[:, None] * nrm[None, :])
    ii, jj = np.triu_indices(n, k=1)
    keep = sims[ii, jj] >= tau
    lo = np.minimum(ids[ii[keep]], ids[jj[keep]])
    hi = np.maximum(ids[ii[keep]], ids[jj[keep]])
    s4 = np.floor(sims[ii[keep], jj[keep]] * 10000.0 + 0.5).astype(np.int64)
    order = np.lexsort((hi, lo))
    assert len(out) == keep.sum() and keep.sum() >= 4
    assert (out["id_a"].to_numpy() == lo[order]).all()
    assert (out["id_b"].to_numpy() == hi[order]).all()
    assert (out["sim_1e4"].to_numpy() == s4[order]).all()


def test_winnow_fingerprints_matches_reference():
    """Vectorized winnowing == the textbook per-window implementation,
    including rightmost tie-break and the short-doc cutoff."""
    import pyarrow as pa

    from nettopologysuite_ray.functions.text import winnow_fingerprints_batch

    def slow(text, k=8, w=8):
        B, M = 131, 1 << 32
        h = [
            sum(ord(text[p + j]) * B ** (k - 1 - j) for j in range(k)) % M
            for p in range(len(text) - k + 1)
        ]
        sel = set()
        for i in range(len(h) - w + 1):
            win = h[i : i + w]
            mh = min(win)
            p = max(j for j in range(w) if win[j] == mh) + i
            sel.add((p, h[p]))
        return sel

    rng = np.random.default_rng(5)
    texts = [
        "".join(chr(rng.integers(97, 123)) for _ in range(int(n)))
        for n in rng.integers(5, 200, 40)
    ]
    texts += ["aaaaaaaaaaaaaaaaaaaaaaaa", "abababababababababababab", "short"]
    ids = list(range(len(texts)))
    out = winnow_fingerprints_batch(pa.table({"doc_id": ids, "text": texts}))
    got = set(zip(out["doc_id"].to_pylist(), out["pos"].to_pylist(), out["gram_hash"].to_pylist()))
    exp = set()
    for i, t in zip(ids, texts):
        if len(t) >= 15:  # k + w - 1
            exp |= {(i, p, g) for p, g in slow(t)}
    assert got == exp and len(exp) > 100


def test_kmv_sketch_parallelism_invariant_and_accurate(ray_session):
    """KMV bottom-k merge is exact (same sketch at any block split) and
    the estimator lands near truth on a 20k-cardinality group."""
    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.functions.sketch import kmv_distinct

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 20000, 60000).astype(np.int64)  # ~19k distinct
    truth = len(np.unique(keys))
    grp = np.where(keys % 2 == 0, "even", "odd")
    tbl = pa.table({"user_id": pa.array(keys), "event_type": pa.array(grp)})
    outs = []
    for nb in (1, 13):
        ds = rd.from_arrow(tbl).repartition(nb)
        df = (
            kmv_distinct(ds, "user_id", "event_type", k=64)
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1])
    est = int(outs[0]["est_distinct"].sum())
    assert abs(est - truth) / truth < 0.25


def test_bottom_k_sample_invariant_and_unbiased_shape(ray_session):
    """Sample is identical at any block split, ranks are dense per group,
    and a different salt picks a (mostly) different sample."""
    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.functions.sketch import bottom_k_sample

    ids = np.arange(5000, dtype=np.int64)
    grp = np.array(["a", "b", "c"])[ids % 3]
    tbl = pa.table({"doc_id": pa.array(ids), "lang": pa.array(grp)})

    def run(nb, salt=0):
        ds = rd.from_arrow(tbl).repartition(nb)
        return (
            bottom_k_sample(ds, "doc_id", "lang", n=25, salt=salt)
            .to_pandas()
            .sort_values(["lang", "sample_rank"])
            .reset_index(drop=True)
        )

    a, b = run(1), run(17)
    assert a.equals(b)
    assert len(a) == 75
    assert (a.groupby("lang")["sample_rank"].apply(
        lambda s: (s.to_numpy() == np.arange(len(s))).all()
    )).all()
    other = run(5, salt=99)
    overlap = len(set(a.doc_id) & set(other.doc_id))
    assert overlap < 20  # different salt ~ different sample


def test_public_facade_exports_resolve():
    """Every name in the package façade resolves and the kernel works
    through it (a reference user's import surface)."""
    import nettopologysuite_ray as nts

    for name in nts.__all__:
        assert getattr(nts, name) is not None
    from nettopologysuite_ray.geom import algorithms as alg

    g = nts.from_wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert nts.intersects(g, nts.from_wkt("POINT(5 5)"))
    assert abs(alg.area(nts.overlay(g, g, "intersection")) - 100.0) < 1e-9


def test_grouped_quantiles_matches_numpy_and_is_split_invariant(ray_session):
    """Count-based quantiles == rank ceil(q*n/100) in the fully sorted
    array, at any block split, including heavy ties."""
    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.stages.relational import grouped_quantiles

    rng = np.random.default_rng(3)
    n = 20000
    vals = np.round(rng.gamma(2.0, 10.0, n), 2)
    vals[rng.integers(0, n, 5000)] = 7.77  # tie block
    grp = np.array(["x", "y"])[rng.integers(0, 2, n)]
    tbl = pa.table({"event_type": pa.array(grp), "value": pa.array(vals)})
    outs = []
    for nb in (1, 19):
        df = (
            grouped_quantiles(rd.from_arrow(tbl).repartition(nb), "value", "event_type")
            .to_pandas()
            .sort_values(["event_type", "q_pct"])
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1])
    cents = np.round(vals * 100).astype(np.int64)
    for g in ("x", "y"):
        s = np.sort(cents[grp == g])
        for q in (50, 90, 99):
            exp = s[(q * len(s) + 99) // 100 - 1]
            got = outs[0].query(f"event_type == '{g}' and q_pct == {q}")[
                "quantile_cents"
            ].iloc[0]
            assert got == exp, (g, q, got, exp)


def test_hash_split_deterministic_and_proportional(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.functions.sketch import hash_split

    ids = np.arange(50000, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids)})
    outs = []
    for nb in (1, 11):
        df = (
            hash_split(rd.from_arrow(tbl).repartition(nb), "doc_id")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1])
    frac = outs[0]["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.90) < 0.01
    assert abs(frac["val"] - 0.05) < 0.005
    assert abs(frac["test"] - 0.05) < 0.005


def test_top_tokens_matches_local_counter(ray_session, sf_dir):
    import duckdb
    import ray.data as rd
    from collections import Counter

    from nettopologysuite_ray.functions.text import top_tokens

    path = f"{sf_dir}/documents.parquet"
    out = top_tokens(
        rd.read_parquet(path, columns=["doc_id", "text"]), k=30
    ).to_pandas()
    texts = duckdb.sql(f"select text from '{path}'").df()["text"]
    c = Counter(tok for t in texts for tok in t.lower().split())
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    got = list(zip(out["token"], out["n"]))
    assert got == exp
    assert out["rank"].tolist() == list(range(30))


def test_tfidf_top_terms_matches_local(ray_session, sf_dir):
    """Distributed tf-idf ranking == a local pandas replay (same integer
    score and tie-break), at two parallelism levels."""
    import duckdb
    import pandas as pd
    import ray.data as rd
    from collections import Counter

    from nettopologysuite_ray.functions.text import tfidf_top_terms

    path = f"{sf_dir}/documents.parquet"
    outs = []
    for nb in (1, 8):
        ds = rd.read_parquet(path, columns=["doc_id", "text"], override_num_blocks=nb)
        df = (
            tfidf_top_terms(ds, k=5)
            .to_pandas()
            .sort_values(["doc_id", "rank"])
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1])

    docs = duckdb.sql(f"select doc_id, text from '{path}'").df()
    rows = []
    dfc: Counter = Counter()
    tfs = {}
    for _, r in docs.iterrows():
        c = Counter(r.text.lower().split())
        tfs[r.doc_id] = c
        dfc.update(c.keys())
    for did, c in tfs.items():
        scored = sorted(
            ((tok, tf, dfc[tok], tf * 1_000_000 // (dfc[tok] + 1)) for tok, tf in c.items()),
            key=lambda x: (-x[3], x[0]),
        )[:5]
        for rk, (tok, tf, dfv, s) in enumerate(scored):
            rows.append((did, tok, tf, dfv, s, rk))
    exp = pd.DataFrame(
        rows, columns=["doc_id", "token", "tf", "df", "score_1e6", "rank"]
    ).sort_values(["doc_id", "rank"]).reset_index(drop=True)
    got = outs[0][["doc_id", "token", "tf", "df", "score_1e6", "rank"]]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_pii_redactor_patterns():
    """Email/IPv4 redaction on adversarial strings: adjacent PII, emails
    containing digits/dots, IPs inside words (not matched), counts."""
    import pyarrow as pa

    from nettopologysuite_ray.functions.text import PIIRedactor

    red = PIIRedactor()
    texts = [
        "mail a.b_c%d+e@sub.domain.co and 192.168.0.1 now",
        "no pii here",
        "two ips 10.0.0.1 1.2.3.4 and x9.9.9.9y edge",
        "u1@a.bc u2@b.cd",
    ]
    out = red(pa.table({"text": texts}))
    got = out["text"].to_pylist()
    assert got[0] == "mail <EMAIL> and <IP> now"
    assert got[1] == "no pii here"
    assert got[2] == "two ips <IP> <IP> and x9.9.9.9y edge"
    assert got[3] == "<EMAIL> <EMAIL>"
    assert out["n_emails"].to_pylist() == [1, 0, 0, 2]
    assert out["n_ips"].to_pylist() == [1, 0, 2, 0]


def test_coverage_simplify_exact_rectangle_recovery():
    """Kernel of the coverage_simplify_grid gate query: an irregular
    rectangular coverage whose edges are densified with exactly
    representable collinear points must simplify back to the exact
    4-corner rectangles (integer area and perimeter preserved)."""
    import numpy as np

    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.coverage_simplify import coverage_simplify
    from nettopologysuite_ray.geom.types import Geom

    NX, NY = 6, 5
    wx = [4 * ((i * 13) % 50 + 25) for i in range(NX)]
    hy = [4 * ((j * 17) % 50 + 25) for j in range(NY)]
    xc = np.concatenate([[0], np.cumsum(wx)]).astype(float)
    yc = np.concatenate([[0], np.cumsum(hy)]).astype(float)

    def densify_ring(r, k=3):
        pts = [r[0]]
        for a, b in zip(r[:-1], r[1:]):
            for s in range(1, k + 1):
                pts.append(a + (b - a) * (s / (k + 1)))
            pts.append(b)
        return np.array(pts)

    geoms, exp = [], []
    for i in range(NX):
        for j in range(NY):
            ring = np.array(
                [
                    [xc[i], yc[j]],
                    [xc[i + 1], yc[j]],
                    [xc[i + 1], yc[j + 1]],
                    [xc[i], yc[j + 1]],
                    [xc[i], yc[j]],
                ]
            )
            geoms.append(Geom("Polygon", [densify_ring(ring)]))
            exp.append((wx[i] * hy[j], 2 * (wx[i] + hy[j])))

    out = coverage_simplify(geoms, tol=0.5)
    for g, (a, p) in zip(out, exp):
        assert len(g.data[0]) - 1 == 4
        assert int(round(alg.area(g))) == a
        assert int(round(alg.length(g))) == p


def test_mitre_buffer_large_offset_not_empty():
    """Fuzz regression (round-4 buffer campaign at the 1e7 frame, seed
    424242 case 1818): mitre-join buffers with round/square caps came
    back EMPTY — the welded piece-union fold hit an arrangement failure
    on the snapped pair, and the weld path used to bypass the overlay
    checker entirely (overlay() weld fast path).  The weld grid is
    orders of magnitude below the geometry, so a union of non-empty
    pieces collapsing to zero area is always a silent failure; the weld
    path now routes loose-bound violations through the retry ladder."""
    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.buffer import buffer
    from nettopologysuite_ray.geom.validity import is_valid
    from nettopologysuite_ray.geom.wkt import from_wkt

    line = from_wkt(
        "LINESTRING (9999999.384483902 10000002.78824554,"
        " 9999997.411734005 10000004.213728521,"
        " 9999998.150001876 10000001.337526403,"
        " 10000000.114376383 9999998.53687684,"
        " 9999998.856629059 9999995.684333764,"
        " 9999996.00805641 9999994.249029808)"
    )
    round_area = alg.area(buffer(line, 0.3))
    for join in ("round", "mitre", "bevel"):
        for cap in ("round", "flat", "square"):
            res = buffer(line, 0.3, join=join, cap=cap)
            a = alg.area(res)
            # loose floor: flat caps legitimately trim cap area, so 0.8x
            # the fully-round area is the tightest uniform bound
            assert a > 0.8 * round_area, (join, cap, a)
            assert is_valid(res), (join, cap)
    # mitre corners protrude past the round-join arcs: strictly more area
    assert alg.area(buffer(line, 0.3, join="mitre")) > round_area

    # second class from the same campaign (-3.7e7 frame, seed 31337 case
    # 2287): snap_clean degraded a MultiPolygon operand to a
    # GeometryCollection, making every retry rung reject (EMPTY result;
    # with the weld checker alone it surfaced as a RecursionError through
    # _system_result re-entering the weld check)
    line2 = from_wkt(
        "LINESTRING (-37000000.48123864 -36999999.32842781,"
        " -36999999.97915916 -37000002.31723767,"
        " -36999997.81210598 -37000000.949940555,"
        " -36999995.148909524 -36999999.95158758,"
        " -36999997.81272654 -37000000.77405496,"
        " -36999997.77239322 -37000003.74580531)"
    )
    base2 = alg.area(buffer(line2, 3.0))
    assert base2 > 0
    for join in ("round", "mitre"):
        for cap in ("round", "flat", "square"):
            res = buffer(line2, 3.0, join=join, cap=cap)
            a = alg.area(res)
            assert a > 0.7 * base2, (join, cap, a)
            assert is_valid(res), (join, cap)


def test_negative_buffer_nested_donuts():
    """Fuzz regression (round-4 campaign, origin frame i=1255): a
    MULTIPOLYGON of two concentric donuts eroded by a small distance must
    SHRINK, and the result's hole must stay attached to the INNERMOST
    containing shell — the grid-welded assembly used to hand the inner
    donut's hole to the outer shell (a point-set no-op there), silently
    filling the inner donut when the pieces were re-unioned."""
    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.buffer import buffer
    from nettopologysuite_ray.geom.validity import is_valid
    from nettopologysuite_ray.geom.wkt import from_wkt

    g = from_wkt(
        "MULTIPOLYGON (((3 0, 11 0, 11 8, 3 8, 3 0),"
        " (4 1, 10 1, 10 7, 4 7, 4 1)),"
        " ((5 2, 9 2, 9 6, 5 6, 5 2), (6 3, 8 3, 8 5, 6 5, 6 3)))"
    )
    assert alg.area(g) == 40.0
    # mitre keeps square corners: closed-form band areas
    for d, exp in [(-0.05, 36.0), (-0.1, 32.0), (-0.2, 24.0), (-0.3, 16.0)]:
        m = buffer(g, d, join="mitre", cap="flat")
        assert abs(alg.area(m) - exp) < 1e-3, (d, alg.area(m))
        assert is_valid(m)
        # round join differs only by the rounded hole corners: within
        # 2 rings * 4 corners * (4-pi) * d^2 of the mitre area, never more
        r = buffer(g, d, join="round", cap="flat")
        assert is_valid(r)
        assert exp - 1e-3 <= alg.area(r) <= exp + 8 * (4 - 3.14159) * d * d + 1e-3
        # both donuts keep their holes: 2 polygons x 2 rings each
        comps = [c for c in r.flatten()]
        assert sorted(len(c.data) for c in comps) == [2, 2], [
            len(c.data) for c in comps
        ]
