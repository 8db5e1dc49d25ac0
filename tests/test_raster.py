"""Raster <-> vector stages (stages/raster.py): center-sampling burn
semantics, 4-connectivity region extraction with holes, halo/stitch
correctness across tile boundaries, and overlap resolution."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom.types import POLYGON, Geom
from nettopologysuite_ray.geom.validity import is_valid
from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
from nettopologysuite_ray.stages.raster import rasterize, vectorize


def sq(x0, y0, s):
    return np.array(
        [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s), (x0, y0)],
        dtype=np.float64,
    )


def shapes_ds(geoms_values):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "wkb": pa.array([to_wkb(g) for g, _ in geoms_values], type=pa.binary()),
                "value": pa.array([v for _, v in geoms_values], type=pa.int64()),
            }
        )
    )


def cells_ds(rows):
    import ray.data as rd

    ix, iy, v = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "ix": pa.array(ix, type=pa.int64()),
                "iy": pa.array(iy, type=pa.int64()),
                "value": pa.array(v, type=pa.int64()),
            }
        )
    )


def test_rasterize_center_sampling(ray_session):
    # solid square covers exactly s^2 cells; strict-interior rule: the
    # right-triangle hypotenuse x+y=s excludes centers with a+b = s-1
    tri = Geom(POLYGON, [np.array([(0, 0), (7, 0), (0, 7), (0, 0)], float)])
    got = rasterize(shapes_ds([(Geom(POLYGON, [sq(10, 10, 5)]), 1), (tri, 2)])).to_pandas()
    bysq = got[got.value == 1]
    assert len(bysq) == 25
    assert bysq.ix.min() == 10 and bysq.ix.max() == 14
    bytri = got[got.value == 2]
    assert len(bytri) == 21  # s(s-1)/2, s=7
    assert all(r.ix + r.iy <= 5 for r in bytri.itertuples())


def test_rasterize_donut_and_overlap_max(ray_session):
    donut = Geom(POLYGON, [sq(0, 0, 8), sq(2, 2, 4)])
    small = Geom(POLYGON, [sq(0, 0, 3)])  # overlaps donut's lower-left
    got = rasterize(shapes_ds([(donut, 1), (small, 5)])).to_pandas()
    # overlap resolved to max(value): the 3x3 corner minus hole cells
    m = {(r.ix, r.iy): r.value for r in got.itertuples()}
    assert m[(0, 0)] == 5 and m[(1, 1)] == 5
    assert m[(2, 2)] == 5  # hole cell for the donut, covered by small only
    assert m[(7, 7)] == 1
    assert (3, 3) not in m or m[(3, 3)] == 5  # (3,3) is inside the hole: small? no
    donut_cells = sum(1 for v in m.values() if v == 1)
    assert donut_cells == 64 - 16 - (9 - 1)  # small wins its 9 cells; (2,2) was hole


def test_vectorize_connectivity_semantics(ray_session):
    # two equal-value cells touching only at a corner stay separate;
    # adjacent equal-value cells merge; different values split
    rows = [(0, 0, 7), (1, 1, 7), (3, 0, 4), (4, 0, 4), (5, 0, 9)]
    out = vectorize(cells_ds(rows), tile=2, num_partitions=2).to_pandas()
    per_value = out.groupby("value").size().to_dict()
    assert per_value == {7: 2, 4: 1, 9: 1}
    areas = {
        (r.value, round(alg.area(from_wkb(r.face_wkb)))) for r in out.itertuples()
    }
    assert (4, 2) in areas and (9, 1) in areas and (7, 1) in areas


def test_roundtrip_cross_tile_with_hole(ray_session):
    donut = Geom(POLYGON, [sq(0, 0, 9), sq(3, 3, 3)])
    tri = Geom(POLYGON, [np.array([(20, 0), (29, 0), (20, 9), (20, 0)], float)])
    cells = rasterize(shapes_ds([(donut, 1), (tri, 2)]))
    out = vectorize(cells, tile=3, num_partitions=4).to_pandas()
    assert len(out) == 2
    for r in out.itertuples():
        g = from_wkb(r.face_wkb)
        assert is_valid(g)
        if r.value == 1:
            assert len(g.data) - 1 == 1  # hole recovered
            assert round(alg.area(g)) == 81 - 9
        else:
            assert len(g.data) - 1 == 0
            assert round(alg.area(g)) == 36  # 9*8/2


def test_vectorize_negative_coords(ray_session):
    # region spanning the origin and negative tiles
    rows = [(ix, iy, 3) for ix in range(-3, 2) for iy in range(-2, 2)]
    out = vectorize(cells_ds(rows), tile=2, num_partitions=2).to_pandas()
    assert len(out) == 1
    g = from_wkb(out.iloc[0].face_wkb)
    assert round(alg.area(g)) == 20
    env = alg.envelope(g)
    assert tuple(round(x) for x in env) == (-3, -2, 2, 2)


def test_random_grid_roundtrip_exact(ray_session):
    """Adversarial property: vectorize a random labeled grid (gaps,
    diagonal contacts, nested islands all arise at random), then
    rasterize the region polygons back — the exact original cell set
    must reappear, value for value."""
    import ray.data as rd

    rng = np.random.default_rng(77)
    for trial in range(3):
        # ~60% fill with 3 labels over a 12x12 window (negative-offset)
        lab = rng.integers(0, 5, size=(12, 12))
        rows = [
            (ix - 4, iy - 6, int(lab[iy, ix]))
            for iy in range(12)
            for ix in range(12)
            if lab[iy, ix] < 3
        ]
        src = cells_ds(rows)
        regions = vectorize(src, tile=3, num_partitions=3)
        back = rasterize(
            regions.map_batches(
                lambda b: pa.table({"wkb": b["face_wkb"], "value": b["value"]}),
                batch_format="pyarrow",
            )
        ).to_pandas()
        got = {(r.ix, r.iy, r.value) for r in back.itertuples()}
        assert got == set(rows), f"trial {trial}: {len(got)} vs {len(rows)} cells"


def test_vectorize_duplicate_cell_rows(ray_session):
    """Pre-resolve inputs with duplicate (ix, iy) rows settle to
    max(value) everywhere (edge extraction AND value attach): both cells
    here are value 2, one region of area 2 — a last-write-wins dict used
    to emit a spurious internal edge and split the region."""
    rows = [(0, 0, 1), (0, 0, 2), (1, 0, 2)]
    out = vectorize(cells_ds(rows), tile=2, num_partitions=2).to_pandas()
    assert len(out) == 1
    assert out.iloc[0].value == 2
    assert round(alg.area(from_wkb(out.iloc[0].face_wkb))) == 2


def test_rasterize_combine_sum_and_count(ray_session):
    """combine='count' burns coverage density (1 per covering polygon);
    combine='sum' adds the values; partials stay mergeable across the
    resolve groupby."""
    a = Geom(POLYGON, [sq(0, 0, 4)])   # value 10
    b = Geom(POLYGON, [sq(2, 0, 4)])   # value 7, overlaps a on x in [2,4)
    cnt = rasterize(shapes_ds([(a, 10), (b, 7)]), combine="count").to_pandas()
    m = {(r.ix, r.iy): r.value for r in cnt.itertuples()}
    assert m[(0, 0)] == 1 and m[(2, 0)] == 2 and m[(5, 3)] == 1
    assert sum(m.values()) == 16 + 16  # total burns
    tot = rasterize(shapes_ds([(a, 10), (b, 7)]), combine="sum").to_pandas()
    m2 = {(r.ix, r.iy): r.value for r in tot.itertuples()}
    assert m2[(0, 0)] == 10 and m2[(2, 0)] == 17 and m2[(5, 3)] == 7
