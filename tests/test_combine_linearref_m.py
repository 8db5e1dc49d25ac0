"""Round-4 additions: EnvelopeCombiner/GeometryCombiner aggregates,
M-ordinate linear referencing, morton decode, the embed_near_dup exact
cap, and pytest homes for the two rows-only gate queries that moved out
of the driver's 50-query budget (gml/kml round-trip, coverage
simplify)."""

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# combine_geometries (GeometryCombiner.cs:16 BuildGeometry semantics)


def _pt(x, y):
    from nettopologysuite_ray.geom.types import Geom

    return Geom.point(float(x), float(y))


def test_combine_geometries_buildgeometry_semantics():
    from nettopologysuite_ray.geom.types import Geom
    from nettopologysuite_ray.stages.combine import combine_geometries

    # one input -> returned as-is
    p = _pt(1, 2)
    assert combine_geometries([p]) is p
    # homogeneous points -> MultiPoint
    mp = combine_geometries([_pt(1, 2), _pt(3, 4)])
    assert mp.gtype == "MultiPoint" and len(mp.data) == 2
    # homogeneous lines -> MultiLineString
    l1 = Geom.linestring([[0, 0], [1, 0]])
    l2 = Geom.linestring([[0, 1], [1, 1]])
    ml = combine_geometries([l1, l2])
    assert ml.gtype == "MultiLineString"
    # homogeneous polygons -> MultiPolygon
    sq = Geom.polygon([[0, 0], [1, 0], [1, 1], [0, 1]])
    mpoly = combine_geometries([sq, sq])
    assert mpoly.gtype == "MultiPolygon" and len(mpoly.data) == 2
    # mixed -> GeometryCollection
    gc = combine_geometries([p, l1])
    assert gc.gtype == "GeometryCollection"
    # skip_empty mirrors the reference flag
    gc2 = combine_geometries([p, Geom.empty("Point")], skip_empty=True)
    assert gc2 is p
    # empty input -> empty collection
    assert combine_geometries([]).is_empty


def test_envelope_union_aggregate_and_groups(ray_session):
    import ray.data as rd

    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
    from nettopologysuite_ray.stages.combine import EnvelopeUnion, combine_wkb_groups

    import pyarrow as pa

    rng = np.random.default_rng(7)
    xs = rng.integers(-100, 100, size=200)
    ys = rng.integers(-50, 50, size=200)
    bands = np.arange(200) % 4
    wkbs = [to_wkb(_pt(x, y)) for x, y in zip(xs, ys)]
    ds = rd.from_arrow(
        pa.table({"band": pa.array(bands), "wkb": pa.array(wkbs, type=pa.binary())})
    )
    got = {
        r["band"]: r["extent"]
        for r in ds.groupby("band").aggregate(EnvelopeUnion("wkb")).take_all()
    }
    for b in range(4):
        m = bands == b
        assert got[b] == [
            float(xs[m].min()),
            float(ys[m].min()),
            float(xs[m].max()),
            float(ys[m].max()),
        ]
    # global (ungrouped) extent
    whole = ds.aggregate(EnvelopeUnion("wkb"))["extent"]
    assert whole == [float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())]
    # GeometryCombiner per group: combined envelope must agree
    comb = combine_wkb_groups(ds, "band", "wkb").take_all()
    assert len(comb) == 4
    for r in comb:
        g = from_wkb(r["combined_wkb"])
        assert g.gtype == "MultiPoint" and r["n_geoms"] == 50
        env = alg.envelope(g)
        assert list(env) == got[r["band"]]


def test_envelope_union_all_empty_returns_none(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.geom.types import Geom
    from nettopologysuite_ray.geom.wkb import to_wkb
    from nettopologysuite_ray.stages.combine import EnvelopeUnion

    ds = rd.from_arrow(
        pa.table({"wkb": pa.array([to_wkb(Geom.empty("Point"))] * 3, type=pa.binary())})
    )
    assert ds.aggregate(EnvelopeUnion("wkb"))["extent"] is None


# ---------------------------------------------------------------------------
# MeasureIndexedLine (CoordinateM.cs + LengthLocationMap.cs semantics)


def _mline():
    from nettopologysuite_ray.geom.wkt import from_wkt

    # (0,0)->(10,0)->(10,20), measures 100, 140, 200
    return from_wkt("LINESTRING M (0 0 100, 10 0 140, 10 20 200)")


def test_measure_indexed_line_locate_along():
    from nettopologysuite_ray.geom.linearref import MeasureIndexedLine

    mil = MeasureIndexedLine(_mline())
    assert (mil.start_m, mil.end_m) == (100.0, 200.0)
    # mid-measure of segment 1
    p = mil.extract_point(120.0)
    assert tuple(p.data) == (5.0, 0.0)
    assert p.extra["dims"] == "M" and float(p.extra["ords"][0]) == 120.0
    # vertex measure
    assert tuple(mil.extract_point(140.0).data) == (10.0, 0.0)
    # clamping (LengthLocationMap clamps lengths the same way)
    assert tuple(mil.extract_point(-5.0).data) == (0.0, 0.0)
    assert tuple(mil.extract_point(999.0).data) == (10.0, 20.0)
    # measure-at-length: halfway down segment 2 (length 10+10 of 30)
    assert mil.m_at_length(20.0) == 170.0
    assert mil.length_at_m(170.0) == 20.0
    # project: closest point to (5, 3) is (5, 0) -> m=120
    assert mil.project(5.0, 3.0) == 120.0


def test_measure_indexed_line_locate_between_carries_m():
    from nettopologysuite_ray.geom.linearref import MeasureIndexedLine

    mil = MeasureIndexedLine(_mline())
    sub = mil.extract_line(120.0, 170.0)
    assert sub.gtype == "LineString"
    assert [tuple(c) for c in sub.data] == [(5.0, 0.0), (10.0, 0.0), (10.0, 10.0)]
    assert sub.extra["dims"] == "M"
    assert list(sub.extra["ords"][:, 0]) == [120.0, 140.0, 170.0]
    # reversed arguments give the same (forward) range
    sub2 = mil.extract_line(170.0, 120.0)
    assert np.array_equal(sub2.data, sub.data)


def test_measure_indexed_line_constant_run_first_match():
    from nettopologysuite_ray.geom.wkt import from_wkt

    from nettopologysuite_ray.geom.linearref import MeasureIndexedLine

    # constant-measure plateau: first-match rule resolves to run start
    mil = MeasureIndexedLine(from_wkt("LINESTRING M (0 0 0, 10 0 50, 20 0 50, 30 0 90)"))
    assert mil.length_at_m(50.0) == 10.0
    assert tuple(mil.extract_point(50.0).data) == (10.0, 0.0)


def test_measure_indexed_line_rejects_non_monotonic():
    from nettopologysuite_ray.geom.wkt import from_wkt

    from nettopologysuite_ray.geom.linearref import MeasureIndexedLine

    with pytest.raises(ValueError):
        MeasureIndexedLine(from_wkt("LINESTRING M (0 0 5, 10 0 3)"))
    with pytest.raises(ValueError):
        MeasureIndexedLine(from_wkt("LINESTRING (0 0, 10 0)"))


def test_measure_indexed_line_zm_uses_last_column():
    from nettopologysuite_ray.geom.wkt import from_wkt

    from nettopologysuite_ray.geom.linearref import MeasureIndexedLine

    mil = MeasureIndexedLine(from_wkt("LINESTRING ZM (0 0 7 100, 10 0 9 140)"))
    assert tuple(mil.extract_point(120.0).data) == (5.0, 0.0)


# ---------------------------------------------------------------------------
# morton decode (MortonCode.cs:73 Decode)


def test_morton_roundtrip_bijective():
    from nettopologysuite_ray.geom.hilbert import morton_decode, morton_encode

    rng = np.random.default_rng(3)
    ix = rng.integers(0, 1 << 16, size=5000)
    iy = rng.integers(0, 1 << 16, size=5000)
    dx, dy = morton_decode(morton_encode(ix, iy))
    assert np.array_equal(dx, ix) and np.array_equal(dy, iy)


# ---------------------------------------------------------------------------
# embed_near_dup exact-path scale guard


def test_embed_near_dup_exact_block_cap_raises(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.functions.embed import embed_near_dup

    n = 40
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.array([[1.0, 0.0]] * n),
        }
    )
    ds = rd.from_arrow(t)
    with pytest.raises(ValueError, match="max_blocks"):
        # tiny block_rows force many blocks; cap of 2 must trip
        embed_near_dup(ds, block_rows=4, max_blocks=2)


# ---------------------------------------------------------------------------
# pytest homes for the two rows-only queries that left the driver gate


def test_gml_kml_roundtrip_query(ray_session, sf_dir):
    import __ray_entry__ as e

    out = e._q_gml_kml_roundtrip(sf_dir)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(df) > 0
    # every row round-tripped OK (the query itself asserts per-row)


def test_coverage_simplify_query(ray_session, sf_dir):
    import __ray_entry__ as e

    df = e._q_coverage_simplify(sf_dir).to_pandas()
    assert len(df) == 12  # one row per band
    assert bool(df["all_valid"].all())
    assert (df["verts_after"] < df["verts_before"]).all()
