"""General geometry×geometry distributed spatial join (stages/geom_join.py).

Truth is computed two ways: a closed-form integer oracle for diamonds /
squares (L1-ball ⇔ L-inf square in (u,v) = (x+y, x-y) space), and a
per-pair brute-force run of the same exact predicates the kernel uses —
so the cell multiplex + reference-point dedup machinery is what is under
test, not the predicate itself.  Output must be row-identical across
parallelism levels and with hot-cell salting on (the reference-point rule
— reference: Index/Strtree/STRtree.cs:32 box-query semantics generalized
to a PBSM grid)."""

import numpy as np
import pyarrow as pa
import pytest

from nettopologysuite_ray.geom.types import LINESTRING, POLYGON, Geom
from nettopologysuite_ray.geom.wkb import to_wkb

EXT = (-10000.0, -5000.0, 10000.0, 5000.0)


def _diamond(cx, cy, r):
    return Geom(
        POLYGON,
        [
            np.array(
                [[cx + r, cy], [cx, cy + r], [cx - r, cy], [cx, cy - r], [cx + r, cy]],
                dtype=np.float64,
            )
        ],
    )


def _square(cx, cy, h):
    return Geom(
        POLYGON,
        [
            np.array(
                [
                    [cx - h, cy - h],
                    [cx + h, cy - h],
                    [cx + h, cy + h],
                    [cx - h, cy + h],
                    [cx - h, cy - h],
                ],
                dtype=np.float64,
            )
        ],
    )


def _layers(seed, nl=150, nr=200, shape=_diamond, rlo=50, rhi=400):
    rng = np.random.default_rng(seed)
    lcx = rng.integers(-9000, 9000, nl)
    lcy = rng.integers(-4500, 4500, nl)
    lr = rng.integers(rlo, rhi, nl)
    rcx = rng.integers(-9000, 9000, nr)
    rcy = rng.integers(-4500, 4500, nr)
    rr = rng.integers(rlo, rhi, nr)
    lt = pa.table(
        {
            "l_id": pa.array(np.arange(nl)),
            "wkb": pa.array(
                [to_wkb(shape(*v)) for v in zip(lcx, lcy, lr)], type=pa.binary()
            ),
        }
    )
    rt = pa.table(
        {
            "r_id": pa.array(np.arange(nr)),
            "wkb": pa.array(
                [to_wkb(shape(*v)) for v in zip(rcx, rcy, rr)], type=pa.binary()
            ),
        }
    )
    return (lcx, lcy, lr, rcx, rcy, rr, lt, rt)


def _run(lt, rt, predicate, lparts=4, rparts=6, **kw):
    import ray.data as rd

    from nettopologysuite_ray.stages.geom_join import spatial_join

    out = spatial_join(
        rd.from_arrow(lt).repartition(lparts),
        rd.from_arrow(rt).repartition(rparts),
        predicate,
        left_keys=("l_id",),
        right_keys=("r_id",),
        extent=EXT,
        **kw,
    )
    df = out.to_pandas()
    return sorted(map(tuple, df[["l_id", "r_id"]].itertuples(index=False)))


def test_intersects_diamonds_vs_closed_form(ray_session):
    lcx, lcy, lr, rcx, rcy, rr, lt, rt = _layers(7)
    got = _run(lt, rt, "intersects", level=4)
    lu, lv = lcx + lcy, lcx - lcy
    ru, rv = rcx + rcy, rcx - rcy
    truth = sorted(
        (i, int(j))
        for i in range(len(lcx))
        for j in np.nonzero(
            (np.abs(lu[i] - ru) <= lr[i] + rr) & (np.abs(lv[i] - rv) <= lr[i] + rr)
        )[0]
    )
    assert got == truth and len(truth) > 50


def test_contains_and_parallelism_invariance(ray_session):
    lcx, lcy, lr, rcx, rcy, rr, lt, rt = _layers(11, rlo=30, rhi=200)
    # grow left radii so containment happens
    lr = lr + 300
    lt = lt.set_column(
        1,
        "wkb",
        pa.array([to_wkb(_diamond(*v)) for v in zip(lcx, lcy, lr)], type=pa.binary()),
    )
    got = _run(lt, rt, "contains", level=4)
    lu, lv = lcx + lcy, lcx - lcy
    ru, rv = rcx + rcy, rcx - rcy
    truth = sorted(
        (i, int(j))
        for i in range(len(lcx))
        for j in np.nonzero(
            (lr[i] >= rr)
            & (np.abs(lu[i] - ru) <= lr[i] - rr)
            & (np.abs(lv[i] - rv) <= lr[i] - rr)
        )[0]
    )
    assert got == truth and len(truth) > 10
    # identical output at a different parallelism level and grid level
    assert _run(lt, rt, "contains", lparts=1, rparts=13, level=5) == truth


def test_dwithin_squares_and_salting_identity(ray_session):
    lcx, lcy, lh, rcx, rcy, rh, lt, rt = _layers(13, shape=_square, rlo=30, rhi=250)
    D = 150.0
    got = _run(lt, rt, "dwithin", level=4, distance=D)
    gx = np.maximum(0, np.abs(lcx[:, None] - rcx) - (lh[:, None] + rh))
    gy = np.maximum(0, np.abs(lcy[:, None] - rcy) - (lh[:, None] + rh))
    ti, tj = np.nonzero(gx * gx + gy * gy <= D * D)
    truth = sorted(zip(ti.tolist(), tj.tolist()))
    assert got == truth and len(truth) > 50
    # hot-cell salting must not change output
    salted = _run(
        lt, rt, "dwithin", level=4, distance=D, salt_threshold=3, n_salt=8
    )
    assert salted == truth


def test_lines_vs_polygons_brute_predicate(ray_session):
    """Mixed-type join checked against brute-force of the same exact
    predicate — exercises multiplex + dedup on skinny envelopes."""
    import ray.data as rd

    from nettopologysuite_ray.geom import predicates as P
    from nettopologysuite_ray.geom.wkb import from_wkb

    rng = np.random.default_rng(17)
    NS, NR = 120, 100
    sy = rng.integers(-4500, 4500, NS)
    sx0 = rng.integers(-9000, 5000, NS)
    sln = rng.integers(200, 4000, NS)
    lines = [
        Geom(LINESTRING, np.array([[x, y], [x + ln, y + ln // 3]], dtype=np.float64))
        for x, y, ln in zip(sx0, sy, sln)
    ]
    rcx = rng.integers(-9000, 9000, NR)
    rcy = rng.integers(-4500, 4500, NR)
    rr = rng.integers(100, 600, NR)
    polys = [_diamond(*v) for v in zip(rcx, rcy, rr)]
    lt = pa.table(
        {
            "l_id": pa.array(np.arange(NS)),
            "wkb": pa.array([to_wkb(g) for g in lines], type=pa.binary()),
        }
    )
    rt = pa.table(
        {
            "r_id": pa.array(np.arange(NR)),
            "wkb": pa.array([to_wkb(g) for g in polys], type=pa.binary()),
        }
    )
    got = _run(lt, rt, "crosses", level=3)
    truth = sorted(
        (i, j)
        for i in range(NS)
        for j in range(NR)
        if P.crosses(lines[i], polys[j])
    )
    assert got == truth and len(truth) > 20


def test_prepared_ladder_vs_relate_oracle():
    """The kernel's prepared short-circuit predicates must agree with the
    full DE-9IM relate on adversarial families: integer-grid squares
    (exact touches / shared edges), holed polygons, diamonds, segments
    and points, at 0 and 1e7 frames.  (120k-pair campaign clean offline;
    this guard pins a 4k-pair slice.)"""
    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom import predicates as P
    from nettopologysuite_ray.geom.types import LINESTRING, POINT
    from nettopologysuite_ray.stages.geom_join import (
        _Prepared,
        _prep_contains,
        _prep_dwithin,
        _prep_intersects,
    )

    rng = np.random.default_rng(20260820)

    def mk(kind, frame):
        x = frame + rng.integers(-20, 20)
        y = frame + rng.integers(-10, 10)
        r = int(rng.integers(1, 8))
        if kind == 0:
            return Geom(
                POLYGON,
                [np.array([[x, y], [x + r, y], [x + r, y + r], [x, y + r], [x, y]], float)],
            )
        if kind == 1:
            r = max(r, 4)
            o = np.array([[x, y], [x + r, y], [x + r, y + r], [x, y + r], [x, y]], float)
            h = np.array(
                [
                    [x + 1, y + 1],
                    [x + 1, y + r - 1],
                    [x + r - 1, y + r - 1],
                    [x + r - 1, y + 1],
                    [x + 1, y + 1],
                ],
                float,
            )
            return Geom(POLYGON, [o, h])
        if kind == 2:
            return _diamond(x, y, r)
        if kind == 3:
            return Geom(
                LINESTRING,
                np.array(
                    [[x, y], [x + int(rng.integers(-8, 9)), y + int(rng.integers(-8, 9))]],
                    float,
                ),
            )
        return Geom(POINT, np.array([float(x), float(y)]))

    for t in range(4000):
        frame = [0.0, 1e7][t % 2]
        a = mk(int(rng.integers(0, 5)), frame)
        b = mk(int(rng.integers(0, 5)), frame)
        if a.gtype == LINESTRING and alg.length(a) == 0:
            continue
        if b.gtype == LINESTRING and alg.length(b) == 0:
            continue
        pa_, pb_ = _Prepared(a), _Prepared(b)
        assert _prep_intersects(pa_, pb_) == P.intersects(a, b)
        assert _prep_contains(pa_, pb_) == P.contains(a, b)
        d = float(rng.integers(0, 5))
        assert _prep_dwithin(pa_, pb_, d) == (alg.distance(a, b) <= d)


def test_grid_aligned_boundary_ties(ray_session):
    """Adversary for the reference-point dedup: squares whose corners are
    EXACT multiples of the cell size, abutting across cell lines — the
    floor arithmetic hits exact ties, and `touches` pairs live exactly
    on the grid boundaries.  Output must match brute force at every
    grid level."""
    import ray.data as rd

    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom import predicates as P
    from nettopologysuite_ray.stages.geom_join import spatial_join

    rng = np.random.default_rng(99)

    def square(x0, y0, w, h):
        return Geom(
            POLYGON,
            [
                np.array(
                    [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
                    dtype=np.float64,
                )
            ],
        )

    NL = NR = 120
    lx = rng.integers(0, 8, NL) * 128.0
    ly = rng.integers(0, 8, NL) * 64.0
    lw = rng.integers(1, 4, NL) * 128.0
    lh = rng.integers(1, 4, NL) * 64.0
    rx = rng.integers(0, 8, NR) * 128.0
    ry = rng.integers(0, 8, NR) * 64.0
    rw = rng.integers(1, 4, NR) * 128.0
    rh = rng.integers(1, 4, NR) * 64.0
    lgs = [square(*v) for v in zip(lx, ly, lw, lh)]
    rgs = [square(*v) for v in zip(rx, ry, rw, rh)]
    lt = pa.table(
        {
            "l_id": pa.array(np.arange(NL)),
            "wkb": pa.array([to_wkb(g) for g in lgs], type=pa.binary()),
        }
    )
    rt = pa.table(
        {
            "r_id": pa.array(np.arange(NR)),
            "wkb": pa.array([to_wkb(g) for g in rgs], type=pa.binary()),
        }
    )
    for level, pred in ((2, "intersects"), (3, "touches")):
        out = spatial_join(
            rd.from_arrow(lt).repartition(3),
            rd.from_arrow(rt).repartition(5),
            pred,
            left_keys=("l_id",),
            right_keys=("r_id",),
            extent=(0.0, 0.0, 1024.0, 512.0),
            level=level,
        )
        df = out.to_pandas()
        got = (
            sorted(map(tuple, df[["l_id", "r_id"]].itertuples(index=False)))
            if "l_id" in df.columns
            else []
        )
        fn = (
            (lambda a, b: alg.distance(a, b) == 0.0)
            if pred == "intersects"
            else P.touches
        )
        truth = sorted(
            (i, j) for i in range(NL) for j in range(NR) if fn(lgs[i], rgs[j])
        )
        assert got == truth and len(truth) > 100, (level, pred)


def test_bad_predicate_raises(ray_session):
    from nettopologysuite_ray.stages.geom_join import _Prepared, _pred_fn

    with pytest.raises(ValueError):
        _pred_fn("nope", 0.0)
    # relate pattern path: intersects-equivalent pattern
    fn = _pred_fn("relate:T********", 0.0)
    a, b = _Prepared(_diamond(0, 0, 10)), _Prepared(_diamond(5, 0, 10))
    assert fn(a, b)
