"""PreparedRelateJoin (stages/spatial_join.py) — broadcast prepared-
relate for arbitrary probe geometries, verified pairwise against the
full predicates over mixed probe types (points / segments / diamonds)
and holed admin polygons."""

import numpy as np
import pyarrow as pa

from nettopologysuite_ray.geom import algorithms as alg
from nettopologysuite_ray.geom import predicates as P
from nettopologysuite_ray.geom.types import LINESTRING, POINT, POLYGON, Geom
from nettopologysuite_ray.geom.wkb import to_wkb


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


def _holed_square(cx, cy, h):
    outer = np.array(
        [[cx - h, cy - h], [cx + h, cy - h], [cx + h, cy + h], [cx - h, cy + h], [cx - h, cy - h]],
        dtype=np.float64,
    )
    inner = np.array(
        [
            [cx - h / 2, cy - h / 2],
            [cx - h / 2, cy + h / 2],
            [cx + h / 2, cy + h / 2],
            [cx + h / 2, cy - h / 2],
            [cx - h / 2, cy - h / 2],
        ],
        dtype=np.float64,
    )
    return Geom(POLYGON, [outer, inner])


def test_prepared_relate_join_vs_brute(ray_session):
    import ray.data as rd

    from nettopologysuite_ray.stages.spatial_join import (
        PreparedRelateJoin,
        prepare_admin_geoms,
    )

    rng = np.random.default_rng(23)
    NA = 30
    acx = rng.integers(-5000, 5000, NA)
    acy = rng.integers(-2500, 2500, NA)
    admins = [
        _holed_square(x, y, rng.integers(200, 800))
        if i % 3 == 0
        else _diamond(x, y, rng.integers(200, 800))
        for i, (x, y) in enumerate(zip(acx, acy))
    ]
    admin_tbl = pa.table(
        {
            "admin_id": pa.array(np.arange(NA)),
            "geometry_wkb": pa.array([to_wkb(g) for g in admins], type=pa.binary()),
        }
    )
    NP_ = 250
    probes = []
    for i in range(NP_):
        k = i % 3
        x, y = rng.integers(-5500, 5500), rng.integers(-3000, 3000)
        if k == 0:
            probes.append(Geom(POINT, np.array([float(x), float(y)])))
        elif k == 1:
            probes.append(
                Geom(
                    LINESTRING,
                    np.array(
                        [
                            [x, y],
                            [x + rng.integers(50, 900), y + rng.integers(-400, 400)],
                        ],
                        dtype=np.float64,
                    ),
                )
            )
        else:
            probes.append(_diamond(x, y, rng.integers(30, 400)))
    probe_tbl = pa.table(
        {
            "p_id": pa.array(np.arange(NP_)),
            "wkb": pa.array([to_wkb(g) for g in probes], type=pa.binary()),
        }
    )
    ref = prepare_admin_geoms(admin_tbl)
    cases = [
        ("intersects", 0.0, lambda a, b: P.intersects(a, b)),
        ("contains", 0.0, lambda a, b: P.contains(a, b)),
        ("dwithin", 150.0, lambda a, b: alg.distance(a, b) <= 150.0),
    ]
    for predicate, dist, brute in cases:
        ds = rd.from_arrow(probe_tbl).repartition(3).map_batches(
            PreparedRelateJoin,
            fn_constructor_args=(ref, predicate, "wkb", dist),
            concurrency=2,
            batch_size=128,
            batch_format="pyarrow",
        )
        got = sorted(
            map(tuple, ds.to_pandas()[["p_id", "admin_id"]].itertuples(index=False))
        )
        truth = sorted(
            (i, a) for i in range(NP_) for a in range(NA) if brute(admins[a], probes[i])
        )
        assert got == truth and len(truth) > 20, predicate
