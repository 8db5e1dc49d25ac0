"""KdTree ports (reference: test/.../Index/KdTree/KdTreeTest.cs) and
Quadtree correctness in the SpatialIndexTester style
(test/.../Index/SpatialIndexTester.cs: every intersecting item must be
returned; supersets allowed)."""

import numpy as np

from nettopologysuite_ray.geom.kdtree import KdTree
from nettopologysuite_ray.geom.quadtree import Quadtree


# -- KdTree -----------------------------------------------------------------


def test_kdtree_single_point():
    index = KdTree(0.001)
    n1 = index.insert((1, 1))
    n2 = index.insert((1, 1))
    assert n1 is n2
    res = index.query((0, 0, 10, 10))
    assert len(res) == 1
    assert res[0].count == 2 and res[0].is_repeated


def test_kdtree_nearest_neighbor():
    kd = KdTree()
    for xy, d in [
        ((12, 16), "A"), ((15, 8), "B"), ((5, 18), "C"), ((18, 5), "D"),
        ((16, 15), "E"), ((2, 5), "F"), ((7, 10), "G"), ((8, 7), "H"),
        ((5, 5), "I"), ((19, 12), "J"), ((10, 2), "K"),
    ]:
        kd.insert(xy, d)
    assert kd.nearest_neighbor((13, 2)).data == "K"


def test_kdtree_endless_loop_case():
    kd = KdTree()
    for xy, d in [
        ((383, 381), "A"), ((349, 168), "B"), ((473, 223), "C"),
        ((227, 44), "D"), ((273, 214), "E"), ((493, 87), "F"), ((502, 290), "G"),
    ]:
        kd.insert(xy, d)
    assert kd.nearest_neighbor((297, 133)).data == "B"
    assert kd.nearest_neighbor((272, 216)).data == "E"
    assert kd.nearest_neighbor((635, 377)).data == "G"


def _query_coords(index, env):
    return sorted(n.coordinate for n in index.query(env))


def test_kdtree_tolerance_snap():
    kd = KdTree(1.0)
    for xy in [(0, 0), (-0.1, 1), (0.1, 1)]:
        kd.insert(xy)
    assert _query_coords(kd, (-9, -9, 9, 9)) == [(-0.1, 1.0), (0.0, 0.0)]

    kd2 = KdTree(9.0)
    for xy in [(10, 60), (20, 60), (30, 60), (30, 63)]:
        kd2.insert(xy)
    assert _query_coords(kd2, (0, 0, 99, 99)) == [
        (10.0, 60.0), (20.0, 60.0), (30.0, 60.0)
    ]


def test_kdtree_snap_to_nearest():
    kd = KdTree(5.0)
    kd.insert((10, 60))
    kd.insert((20, 60))
    n = kd.insert((16, 60))  # closest existing is (20, 60)
    assert n.coordinate == (20.0, 60.0) and n.count == 2


def test_kdtree_size_depth():
    kd = KdTree()
    for xy in [(10, 60), (20, 60), (16, 60), (1, 1), (23, 400)]:
        kd.insert(xy)
    assert kd.count == 5
    assert 1 < kd.depth <= kd.count


# -- Quadtree ---------------------------------------------------------------


def _grid_items(offset=(0.0, 0.0)):
    items = []
    for i in range(12):
        for j in range(12):
            x = offset[0] + i * 3.7
            y = offset[1] + j * 2.3
            items.append(((x, y, x + 1.9, y + 1.1), (i, j)))
    return items


def _intersects(a, b):
    return not (a[2] < b[0] or a[0] > b[2] or a[3] < b[1] or a[1] > b[3])


def test_quadtree_spatial_index_contract():
    """Every intersecting item is returned (candidate supersets allowed —
    the reference Quadtree has the same contract)."""
    for offset in [(0.0, 0.0), (-21.0, -13.0), (-5.0, 7.0)]:
        qt = Quadtree()
        items = _grid_items(offset)
        for env, it in items:
            qt.insert(env, it)
        assert qt.count == len(items)
        rng = np.random.default_rng(7)
        for _ in range(60):
            x = offset[0] + rng.uniform(-5, 50)
            y = offset[1] + rng.uniform(-5, 35)
            q = (x, y, x + rng.uniform(0, 12), y + rng.uniform(0, 12))
            got = set(qt.query(q))
            expected = {it for env, it in items if _intersects(env, q)}
            assert expected <= got, (q, expected - got)


def test_quadtree_point_envelopes_and_remove():
    qt = Quadtree()
    qt.insert((5, 5, 5, 5), "pt")  # zero-extent: padded
    qt.insert((-3, -3, 4, 4), "origin-crossing")
    assert set(qt.query((4.9, 4.9, 5.1, 5.1))) >= {"pt"}
    assert set(qt.query((-1, -1, 0, 0))) >= {"origin-crossing"}
    assert qt.remove((5, 5, 5, 5), "pt")
    assert "pt" not in set(qt.query((0, 0, 10, 10)))
    assert qt.count == 1


def test_quadtree_null_query():
    qt = Quadtree()
    assert qt.query(None) == []
    qt.insert((0, 0, 10, 10), "d")
    assert qt.query(None) == []


# ---------------------------------------------------------------------------
# Bintree + Interval (reference: test/.../Index/Bintree/IntervalTest.cs,
# BinTreeCorrectTest.cs) and SortedPackedIntervalRTree (reference:
# test/.../Index/IntervalRtree/SortedPackedIntervalRtreeTest.cs)


def test_interval_algebra():
    from nettopologysuite_ray.geom.intervals import Interval

    i = Interval()
    assert i.min == 0 and i.centre == 0 and i.max == 0
    i = Interval(1, 3)
    assert i.min == 1 and i.max == 3 and i.width == 2
    for v1, v2 in [(0.0, 10.0), (10.0, 0.0)]:
        iv = Interval(v1, v2)
        lo, hi = min(v1, v2), max(v1, v2)
        assert iv.min == lo and iv.max == hi
        assert iv.width == hi - lo and iv.centre == lo + (hi - lo) / 2
    i = Interval()
    i.expand_to_include(Interval(-2, -1))
    i.expand_to_include(Interval(1, 2))
    assert (i.min, i.centre, i.max, i.width) == (-2, 0, 2, 4)
    i = Interval()
    i.init(3, 6)
    assert (i.min, i.centre, i.max) == (3, 4.5, 6)
    i.init(-3, -6)
    assert (i.min, i.centre, i.max) == (-6, -4.5, -3)
    a = Interval(3, 6)
    assert a.overlaps(Interval(4, 5)) and a.overlaps(Interval(6, 7))
    assert not a.overlaps(Interval(7, 8))
    assert a.overlaps(Interval(5, 6.1)) and a.overlaps(Interval(2, 3))
    assert a.overlaps(Interval(1.9, 4)) and not a.overlaps(Interval(1, 2))
    assert a.contains(Interval(4, 5))
    for bad in [(6, 7), (7, 8), (5, 6.1), (2, 3), (1.9, 4), (1, 2)]:
        assert not a.contains(Interval(*bad))


def test_bintree_grid_queries_match_brute_force():
    """BinTreeCorrectTest.cs: grid of overlapping intervals, every query's
    exact-filtered candidate set equals the brute-force scan."""
    from nettopologysuite_ray.geom.intervals import Bintree, Interval

    NUM_ITEMS = 2000
    MIN_EXTENT, MAX_EXTENT = -1000.0, 1000.0
    grid_size = int(NUM_ITEMS**0.5) + 1
    extent = MAX_EXTENT - MIN_EXTENT
    inc = extent / grid_size
    cell = 2 * inc
    tree = Bintree()
    all_iv = []
    for i in range(grid_size):
        x = MIN_EXTENT + inc * i
        iv = Interval(x, x + cell)
        tree.insert(iv, iv)
        all_iv.append(iv)
    assert tree.count == grid_size
    qcell = 2.0 * extent / int(NUM_ITEMS**0.5)
    qgrid = int(100**0.5) + 1
    qinc = extent / qgrid
    for i in range(qgrid):
        x = MIN_EXTENT + qinc * i
        q = Interval(x, x + qcell)
        got = sorted((iv.min, iv.max) for iv in tree.query(q) if iv.overlaps(q))
        want = sorted((iv.min, iv.max) for iv in all_iv if iv.overlaps(q))
        assert got == want


def test_sorted_packed_interval_rtree():
    from nettopologysuite_ray.geom.intervals import SortedPackedIntervalRTree

    # empty query must not hang or raise (JTS GH #19)
    t = SortedPackedIntervalRTree()
    out = []
    t.query(0, 1, out.append)
    assert out == []
    # random intervals: query matches brute force
    import numpy as np

    rng = np.random.default_rng(7)
    lows = rng.uniform(-100, 100, 500)
    widths = rng.uniform(0, 20, 500)
    t = SortedPackedIntervalRTree()
    for k in range(500):
        t.insert(lows[k], lows[k] + widths[k], k)
    for lo, hi in [(-5, 5), (-100, -90), (99, 130), (0, 0), (-200, 200)]:
        got = []
        t.query(lo, hi, got.append)
        want = [k for k in range(500) if lows[k] <= hi and lows[k] + widths[k] >= lo]
        assert sorted(got) == sorted(want)
    # inserts after build are rejected
    import pytest

    with pytest.raises(RuntimeError):
        t.insert(0, 1, 999)
