"""Unit tests for the geometry kernel: codecs, algorithms, indexes, SFC keys."""

import numpy as np
import pytest

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom.hilbert import (
    hilbert_decode,
    hilbert_encode,
    morton_encode,
)
from nettopologysuite_ray.geom.index import GridIndex, STRtree, _env_dist
from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt

ROUND_TRIP = [
    "POINT (10 20)",
    "POINT EMPTY",
    "LINESTRING (0 0, 10 10, 20 0)",
    "LINESTRING EMPTY",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    "POLYGON EMPTY",
    "MULTIPOINT ((1 1), (2 2))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
    "GEOMETRYCOLLECTION EMPTY",
]


@pytest.mark.parametrize("wkt", ROUND_TRIP)
def test_wkt_wkb_round_trip(wkt):
    g = from_wkt(wkt)
    assert to_wkt(g) == wkt
    g2 = from_wkb(to_wkb(g))
    assert to_wkt(g2) == wkt


def test_wkt_alt_spellings():
    assert to_wkt(from_wkt("MULTIPOINT (1 1, 2 2)")) == "MULTIPOINT ((1 1), (2 2))"
    assert to_wkt(from_wkt("point(3.5 -4.25)")) == "POINT (3.5 -4.25)"
    # Z ordinates are carried through IO (round 2: out-of-band extra)
    assert to_wkt(from_wkt("POINT Z (1 2 3)")) == "POINT Z (1 2 3)"
    assert to_wkt(from_wkt("LINESTRING(0 0 5, 1 1 6)")) == "LINESTRING Z (0 0 5, 1 1 6)"


def test_wkb_big_endian():
    # hand-built big-endian point
    import struct

    buf = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 3.0, 4.0)
    assert to_wkt(from_wkb(buf)) == "POINT (3 4)"


POLY = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")


def test_area_length():
    assert alg.area(POLY) == 96.0
    assert alg.length(POLY) == 48.0
    assert alg.area(from_wkt("LINESTRING (0 0, 5 5)")) == 0.0


def test_locate():
    assert alg.locate_in_geom(5, 5, POLY) == alg.INTERIOR
    assert alg.locate_in_geom(3, 3, POLY) == alg.EXTERIOR  # inside hole
    assert alg.locate_in_geom(0, 0, POLY) == alg.BOUNDARY
    assert alg.locate_in_geom(2, 3, POLY) == alg.BOUNDARY  # hole edge
    assert alg.locate_in_geom(99, 99, POLY) == alg.EXTERIOR


def test_locate_vectorized_matches_scalar():
    rng = np.random.default_rng(7)
    pts = np.round(rng.uniform(-2, 12, (500, 2)) * 2) / 2  # hit edges sometimes
    vec = alg.locate_points_in_rings(pts, POLY.data)
    for i in range(len(pts)):
        assert vec[i] == alg.locate_in_geom(pts[i, 0], pts[i, 1], POLY)


def test_locate_on_line_mod2():
    ls = from_wkt("LINESTRING (0 0, 10 0)")
    assert alg.locate_in_geom(0, 0, ls) == alg.BOUNDARY
    assert alg.locate_in_geom(5, 0, ls) == alg.INTERIOR
    assert alg.locate_in_geom(5, 1, ls) == alg.EXTERIOR
    closed = from_wkt("LINESTRING (0 0, 10 0, 10 10, 0 0)")
    assert alg.locate_in_geom(0, 0, closed) == alg.INTERIOR  # closed: no boundary


def test_centroid():
    assert to_wkt(alg.centroid(from_wkt("MULTIPOINT ((10 10), (20 20))"))) == "POINT (15 15)"
    assert (
        to_wkt(alg.centroid(from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")))
        == "POINT (5 5)"
    )
    assert to_wkt(alg.centroid(from_wkt("POINT EMPTY"))) == "POINT EMPTY"


def test_convex_hull():
    h = alg.convex_hull(from_wkt("MULTIPOINT ((0 0), (10 0), (10 10), (0 10), (5 5))"))
    assert alg.equals_exact(
        alg.normalize(h), alg.normalize(from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"))
    )
    assert to_wkt(alg.convex_hull(from_wkt("POINT (3 3)"))) == "POINT (3 3)"
    assert (
        to_wkt(alg.convex_hull(from_wkt("MULTIPOINT ((0 0), (5 5), (10 10)))")))
        == "LINESTRING (0 0, 10 10)"
    )


def test_distance():
    assert alg.distance(from_wkt("POINT (20 5)"), POLY) == 10.0
    assert alg.distance(from_wkt("POINT (5 5)"), POLY) == 0.0
    assert alg.distance(from_wkt("LINESTRING (0 0, 1 1)"), from_wkt("LINESTRING (1 0, 0 1)")) == 0.0


def test_interior_point_inside():
    ip = alg.interior_point(POLY)
    assert alg.locate_in_geom(ip.data[0], ip.data[1], POLY) == alg.INTERIOR


def test_normalize_equivalence():
    a = from_wkt("POLYGON ((0 0, 140 0, 140 140, 0 140, 0 0))")
    b = from_wkt("POLYGON ((140 0, 0 0, 0 140, 140 140, 140 0))")
    assert alg.equals_exact(alg.normalize(a), alg.normalize(b))


def test_hilbert_bijective_and_adjacent():
    ix, iy = np.meshgrid(np.arange(16), np.arange(16))
    d = hilbert_encode(ix.ravel(), iy.ravel(), 4)
    assert sorted(d.tolist()) == list(range(256))
    x, y = hilbert_decode(np.arange(256), 4)
    steps = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (steps == 1).all()


def test_morton():
    assert morton_encode(np.array([3]), np.array([5]))[0] == 39


def test_strtree_query_and_knn():
    rng = np.random.default_rng(0)
    lo = rng.uniform(0, 100, (300, 2))
    boxes = np.hstack([lo, lo + rng.uniform(0.1, 3, (300, 2))])
    t = STRtree(boxes)
    q = (20.0, 20.0, 30.0, 30.0)
    got = set(t.query(*q).tolist())
    brute = set(
        np.nonzero(
            (boxes[:, 0] <= q[2])
            & (boxes[:, 2] >= q[0])
            & (boxes[:, 1] <= q[3])
            & (boxes[:, 3] >= q[1])
        )[0].tolist()
    )
    assert got == brute
    nn = t.nearest(50, 50, k=3)
    bd = sorted((_env_dist(boxes[i], 50, 50), i) for i in range(300))[:3]
    assert [i for _, i in nn] == [i for _, i in bd]


def test_grid_index_candidates_cover_truth():
    rng = np.random.default_rng(1)
    lo = rng.uniform(0, 100, (200, 2))
    boxes = np.hstack([lo, lo + 2.0])
    g = GridIndex(boxes)
    pts = rng.uniform(-5, 105, (500, 2))
    pi, ii = g.query_points(pts[:, 0], pts[:, 1])
    cand = set(zip(pi.tolist(), ii.tolist()))
    hits = (
        (boxes[None, :, 0] <= pts[:, 0][:, None])
        & (boxes[None, :, 2] >= pts[:, 0][:, None])
        & (boxes[None, :, 1] <= pts[:, 1][:, None])
        & (boxes[None, :, 3] >= pts[:, 1][:, None])
    )
    true_pairs = set(zip(*np.nonzero(hits)))
    assert true_pairs <= cand


def test_gml_kml_roundtrip():
    """GML2/GML3/KML IO (reference: IO/GML2/GMLWriter.cs:20,
    IO/KML/KMLReader.cs:16): every geometry type roundtrips exactly;
    the reader is dialect- and namespace-agnostic."""
    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.gml import from_gml, to_gml2, to_gml3
    from nettopologysuite_ray.geom.kml import from_kml, to_kml
    from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt

    cases = [
        "POINT (10 20)",
        "LINESTRING (0 0, 10 5, 20 0)",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
        "MULTIPOINT ((1 2), (3 4))",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), ((10 10, 15 10, 15 15, 10 15, 10 10)))",
        "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 2 2), POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0)))",
        "POINT (10.25 -3.5)",
    ]
    for w in cases:
        g = from_wkt(w)
        for enc, dec in ((to_gml2, from_gml), (to_gml3, from_gml), (to_kml, from_kml)):
            assert alg.equals_exact(dec(enc(g)), g), (enc.__name__, w)
    # GML2 dialect detail: comma-in-tuple coordinates
    assert "<gml:coordinates>0,0 10,5 20,0</gml:coordinates>" in to_gml2(from_wkt(cases[1]))
    # GML3 dialect: posList with flat ordinates
    assert "<gml:posList>0 0 10 5 20 0</gml:posList>" in to_gml3(from_wkt(cases[1]))
    # reader tolerates Placemark wrappers and z ordinates (dropped)
    doc = (
        '<kml xmlns="http://www.opengis.net/kml/2.2"><Placemark>'
        "<Point><coordinates>1,2,30</coordinates></Point></Placemark></kml>"
    )
    assert to_wkt(from_kml(doc)) == "POINT (1 2)"


def test_zm_roundtrip_wkt_wkb():
    """Z/M ordinates round-trip through WKT and WKB via the out-of-band
    Geom.extra record (reference: IO/WKBReader.cs:660-699 round-trips
    Z/M); operators remain 2-D and drop them."""
    from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
    from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt

    cases = [
        "POINT Z (1 2 3)",
        "POINT M (1 2 3)",
        "LINESTRING ZM (0 0 1 10, 1 1 2 20)",
        "POLYGON Z ((0 0 1, 1 0 2, 1 1 3, 0 0 1))",
        "MULTIPOINT Z ((10 10 1), (90 10 2))",
        "MULTILINESTRING Z ((0 0 1, 1 1 2), (2 2 3, 3 3 4))",
        "MULTIPOLYGON Z (((0 0 1, 1 0 2, 1 1 3, 0 0 1)))",
        "GEOMETRYCOLLECTION (POINT Z (1 2 3), LINESTRING (0 0, 1 1))",
    ]
    for w in cases:
        g = from_wkt(w)
        assert to_wkt(g) == w
        assert to_wkt(from_wkb(to_wkb(g))) == w
        b = to_wkb(g)
        assert to_wkb(from_wkb(b)) == b
    # untagged 3rd ordinate reads as Z
    assert to_wkt(from_wkt("POINT (1 2 3)")) == "POINT Z (1 2 3)"
    # ops drop Z (2-D kernel, documented)
    from nettopologysuite_ray.geom import algorithms as alg

    assert alg.area(from_wkt("POLYGON Z ((0 0 5, 2 0 5, 2 2 5, 0 0 5))")) == 2.0


# Reference Spatialite EWKB vectors (test/NetTopologySuite.Tests.NUnit/
# IO/WKBReaderTest.cs:110-185 TestSpatialiteWKB_Z / _M / _ZM): hex WKB
# with SRID + Z/M flags → expected geometry.  The reference's
# "MultiPointM" row is skipped: its hex carries the Z flag (a quirk its
# 2-D comparison cannot see).
_SPATIALITE_VECTORS = [
    ("01010000A0E6100000000000000000F03F00000000000000400000000000000840",
     "POINT Z (1 2 3)"),
    ("01020000A0E610000002000000000000000000F03F00000000000000400000000000000840000000000000104000000000000014400000000000001840",
     "LINESTRING Z (1 2 3, 4 5 6)"),
    ("01040000A0E61000000200000001010000800000000000000000000000000000F03F00000000000000400101000080000000000000084000000000000010400000000000001440",
     "MULTIPOINT Z ((0 1 2), (3 4 5))"),
    ("01050000A0E6100000020000000102000080020000000000000000000000000000000000F03F000000000000004000000000000008400000000000001040000000000000144001020000800200000000000000000018400000000000001C400000000000002040000000000000224000000000000024400000000000002640",
     "MULTILINESTRING Z ((0 1 2, 3 4 5), (6 7 8, 9 10 11))"),
    ("0101000060E6100000000000000000F03F00000000000000400000000000000840",
     "POINT M (1 2 3)"),
    ("0102000060E610000002000000000000000000F03F00000000000000400000000000000840000000000000104000000000000014400000000000001840",
     "LINESTRING M (1 2 3, 4 5 6)"),
    ("0105000060E6100000020000000102000040020000000000000000000000000000000000F03F00000000000000400000000000000840000000000000104000000000000014400102000040" "0200000000000000000018400000000000001C40000000000000204000000000000022400000000000002440" "0000000000002640",
     "MULTILINESTRING M ((0 1 2, 3 4 5), (6 7 8, 9 10 11))"),
    ("01010000E0E6100000000000000000F03F000000000000004000000000000008400000000000006940",
     "POINT ZM (1 2 3 200)"),
    ("01020000E0E610000002000000000000000000F03F0000000000000040000000000000084000000000000069400000000000001040000000000000144000000000000018400000000000006940",
     "LINESTRING ZM (1 2 3 200, 4 5 6 200)"),
    ("01040000E0E61000000200000001010000C00000000000000000000000000000F03F0000000000000040000000000000694001010000C00000000000000840000000000000104000000000000014400000000000006940",
     "MULTIPOINT ZM ((0 1 2 200), (3 4 5 200))"),
]


def test_reference_spatialite_zm_wkb_vectors():
    """The reference's own Z/M/ZM-bearing EWKB test vectors decode with
    ordinates intact, and re-encoding (ISO codes) round-trips them."""
    from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
    from nettopologysuite_ray.geom.wkt import to_wkt

    for hexs, wkt in _SPATIALITE_VECTORS:
        g = from_wkb(bytes.fromhex(hexs))
        assert to_wkt(g) == wkt, hexs
        assert to_wkt(from_wkb(to_wkb(g))) == wkt


def test_geometry_transformer_contract():
    """GeometryTransformer structural semantics (reference:
    Geometries/Utilities/GeometryTransformer.cs:46): identity deep-copy,
    ring collapse -> LineString, polygon degrade -> linework collection,
    empty pruning with single-survivor unwrap, GC type preserved."""
    import numpy as np

    from nettopologysuite_ray.geom.transformer import (
        AffineTransformer,
        GeometryTransformer,
        transform_geometry,
    )
    from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt

    # identity: same text out, new coordinate arrays.  A 1-part Multi*
    # unwraps to its component — GeometryFactory.BuildGeometry semantics
    # (the reference's TransformMultiPolygon ends in BuildGeometry).
    for w, exp in [
        ("POINT (1 2)", None),
        ("LINESTRING (0 0, 1 1)", None),
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 2 1, 2 2, 1 1))", None),
        ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))", "POLYGON ((0 0, 1 0, 1 1, 0 0))"),
        ("MULTIPOINT ((1 1), (2 2))", None),
        ("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))", None),
    ]:
        g = from_wkt(w)
        out = GeometryTransformer().transform(g)
        assert to_wkt(out) == (exp or w)
        if out.gtype == "LineString":
            assert out.data is not g.data  # deep copy down to coordinates

    # ring collapse -> LineString (drop vertices 3..n-1 of each ring)
    class Collapse(GeometryTransformer):
        def transform_coordinates(self, coords, parent):
            return coords[:3]

    out = Collapse().transform(from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"))
    assert out.gtype == "LineString" and len(out.data) == 3

    # polygon with surviving shell + degenerate hole -> mixed linework
    class DropSmallRings(GeometryTransformer):
        def transform_coordinates(self, coords, parent):
            return coords if len(coords) >= 5 else coords[:0]

    g = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 2 1, 2 2, 1 1))")
    out = DropSmallRings().transform(g)  # hole dropped, shell survives
    assert out.gtype == "Polygon" and len(out.data) == 1

    # multi: drop everything -> empty; drop all but one -> unwrapped part
    class DropAll(GeometryTransformer):
        def transform_coordinates(self, coords, parent):
            return None

    assert DropAll().transform(from_wkt("MULTIPOINT ((1 1), (2 2))")).is_empty

    class KeepFirstPointOnly(GeometryTransformer):
        def transform_coordinates(self, coords, parent):
            return coords if coords[0, 0] == 1.0 else None

    out = KeepFirstPointOnly().transform(from_wkt("MULTIPOINT ((1 1), (2 2))"))
    assert to_wkt(out) == "POINT (1 1)"  # BuildGeometry single-survivor unwrap

    # GC stays GC even when homogeneous
    out = GeometryTransformer().transform(
        from_wkt("GEOMETRYCOLLECTION (POINT (1 2), POINT (3 4))")
    )
    assert out.gtype == "GeometryCollection"

    # functional hook
    out = transform_geometry(from_wkt("LINESTRING (0 0, 1 1)"), lambda c: c * 2.0)
    assert to_wkt(out) == "LINESTRING (0 0, 2 2)"

    # affine transformer: translate
    out = AffineTransformer(c=10.0, f=20.0).transform(from_wkt("POINT (1 2)"))
    assert to_wkt(out) == "POINT (11 22)"


def test_transformer_and_affine_stage_carry_z():
    """Z/M ordinates survive vertex-count-preserving transforms
    (reference keeps CoordinateZ.Z under AffineTransformation) and are
    conservatively DROPPED when vertices are added/removed."""
    import pyarrow as pa

    from nettopologysuite_ray.geom.transformer import AffineTransformer, GeometryTransformer
    from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
    from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt
    from nettopologysuite_ray.stages.geometry import affine_stage

    cases = {
        "POINT Z (1 2 3)": "POINT Z (11 22 3)",
        "LINESTRING ZM (0 0 1 10, 1 1 2 20)": "LINESTRING ZM (10 20 1 10, 11 21 2 20)",
        "POLYGON Z ((0 0 1, 1 0 2, 1 1 3, 0 0 1))": "POLYGON Z ((10 20 1, 11 20 2, 11 21 3, 10 20 1))",
        "MULTIPOINT M ((5 5 7), (6 6 8))": "MULTIPOINT M ((15 25 7), (16 26 8))",
        "MULTILINESTRING Z ((0 0 1, 1 1 2), (2 2 3, 3 3 4))":
            "MULTILINESTRING Z ((10 20 1, 11 21 2), (12 22 3, 13 23 4))",
        # 1-part multi unwraps (BuildGeometry) — Z still carried
        "MULTIPOLYGON Z (((0 0 1, 1 0 2, 1 1 3, 0 0 1)))":
            "POLYGON Z ((10 20 1, 11 20 2, 11 21 3, 10 20 1))",
    }
    tr = AffineTransformer(c=10.0, f=20.0)
    for src, exp in cases.items():
        assert to_wkt(tr.transform(from_wkt(src))) == exp

    # vertex-dropping transform must NOT carry Z (no silently wrong Z)
    class DropLast(GeometryTransformer):
        def transform_coordinates(self, coords, parent):
            return coords[:-1]

    out = DropLast().transform(from_wkt("LINESTRING Z (0 0 1, 1 1 2, 2 2 3)"))
    assert to_wkt(out) == "LINESTRING (0 0, 1 1)"

    # the dataset stage carries Z through WKB end to end (and, unlike
    # the transformer, preserves the exact input structure: a 1-part
    # MULTIPOLYGON stays a MULTIPOLYGON for WKB bit-stability)
    stage_exp = {
        **cases,
        "MULTIPOLYGON Z (((0 0 1, 1 0 2, 1 1 3, 0 0 1)))":
            "MULTIPOLYGON Z (((10 20 1, 11 20 2, 11 21 3, 10 20 1)))",
    }
    stage = affine_stage(a=1.0, e=1.0, c=10.0, f=20.0, in_col="wkb", out_col="out")
    wkbs = [to_wkb(from_wkt(w)) for w in stage_exp]
    batch = pa.table({"wkb": pa.array(wkbs, type=pa.binary())})
    got = stage(batch)["out"].to_pylist()
    for got_wkb, exp in zip(got, stage_exp.values()):
        assert to_wkt(from_wkb(got_wkb)) == exp


def test_geometry_editor_structure_preserving():
    """GeometryEditor semantics (reference:
    Geometries/Utilities/GeometryEditor.cs:62): structure-preserving
    edit; None/empty deletes with reference deletion propagation."""
    import numpy as np
    import pytest

    from nettopologysuite_ray.geom.transformer import (
        GeometryEditor,
        coordinate_operation,
    )
    from nettopologysuite_ray.geom.types import Geom
    from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt

    donut = from_wkt(
        "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    )

    # coordinate edit preserves full ring structure
    shifted = GeometryEditor(coordinate_operation(lambda c, g: c + [10.0, 0.0])).edit(donut)
    assert to_wkt(shifted) == (
        "POLYGON ((10 0, 15 0, 15 5, 10 5, 10 0), (11 1, 12 1, 12 2, 11 2, 11 1))"
    )

    # deleting a hole: the polygon survives without it
    def drop_unit_rings(g):
        if g.gtype == "LineString" and len(g.data) == 5:
            w = g.data[:, 0].max() - g.data[:, 0].min()
            if w < 2.0:
                return None
        return g

    assert to_wkt(GeometryEditor(drop_unit_rings).edit(donut)) == (
        "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"
    )

    # deleting the shell empties the whole polygon (GeometryEditor.cs:146)
    def drop_big_rings(g):
        if g.gtype == "LineString" and (g.data[:, 0].max() - g.data[:, 0].min()) > 2:
            return None
        return g

    assert GeometryEditor(drop_big_rings).edit(donut).is_empty

    # member deletion keeps the Multi* collection type
    mp = from_wkt("MULTIPOINT ((0 0), (3 4))")

    def drop_origin(g):
        if g.gtype == "Point" and g.data[0] == 0 and g.data[1] == 0:
            return None
        return g

    out = GeometryEditor(drop_origin).edit(mp)
    assert out.gtype == "MultiPoint" and to_wkt(out) == "MULTIPOINT ((3 4))"

    # structure-breaking ring edits raise (use GeometryTransformer instead)
    def truncate(g):
        if g.gtype == "LineString":
            return Geom("LineString", g.data[:3])
        return g

    with pytest.raises(ValueError):
        GeometryEditor(truncate).edit(donut)

    # Z carry through a vertex-preserving coordinate edit
    ls = from_wkt("LINESTRING Z (0 0 7, 1 0 8)")
    out = GeometryEditor(coordinate_operation(lambda c, g: c * 2.0)).edit(ls)
    assert out.extra is not None and list(out.extra["ords"][:, 0]) == [7.0, 8.0]
    assert to_wkt(out).startswith("LINESTRING Z (0 0 7, 2 0 8)")


def test_geometry_mapper():
    """GeometryMapper.Map / FlatMap (reference:
    Geometries/Utilities/GeometryMapper.cs:26,86): first-level member map
    with None-skip + BuildGeometry; flat map recurses nested collections
    and an all-dropped result is empty of the requested dimension."""
    import numpy as np

    from nettopologysuite_ray.geom.transformer import geometry_flat_map, geometry_map
    from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt

    g = from_wkt("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3), (9 9, 9 9.1))")

    def drop_short(m):
        return m if np.hypot(*(m.data[-1] - m.data[0])) > 0.5 else None

    assert to_wkt(geometry_map(g, drop_short)) == (
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"
    )
    # single survivor unwraps; atomic input maps as itself
    only = geometry_map(from_wkt("LINESTRING (0 0, 5 5)"), lambda m: m)
    assert only.gtype == "LineString"

    gc = from_wkt(
        "GEOMETRYCOLLECTION (POINT (1 1),"
        " GEOMETRYCOLLECTION (LINESTRING (0 0, 1 1), POINT (2 2)))"
    )
    pts = geometry_flat_map(gc, lambda m: m if m.gtype == "Point" else None, empty_dim=0)
    assert to_wkt(pts) == "MULTIPOINT ((1 1), (2 2))"
    assert to_wkt(geometry_flat_map(gc, lambda m: None, empty_dim=1)) == "LINESTRING EMPTY"
