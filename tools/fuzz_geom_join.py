"""Parity fuzz for the general geometry×geometry distributed spatial
join (stages/geom_join.py): random mixed layers (diamonds, rotated
boxes, segments, points) joined under every predicate and compared
pair-for-pair against a brute-force run of the SAME exact predicates —
so what is under test is the cell multiplex, the reference-point dedup
and the salting, across grid levels, extents (including a 1e7-offset
frame) and parallelism.

    python tools/fuzz_geom_join.py [--rounds R] [--seed S]

Prints one JSON line; nonzero exit on any mismatch.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def _layer(rng, n, ox, oy, scale):
    from nettopologysuite_ray.geom.types import LINESTRING, POINT, POLYGON, Geom

    geoms = []
    for i in range(n):
        k = int(rng.integers(0, 4))
        x = ox + rng.uniform(-scale, scale)
        y = oy + rng.uniform(-scale / 2, scale / 2)
        r = rng.uniform(scale / 100, scale / 12)
        if k == 0:  # diamond
            ring = np.array(
                [[x + r, y], [x, y + r], [x - r, y], [x, y - r], [x + r, y]]
            )
            geoms.append(Geom(POLYGON, [ring]))
        elif k == 1:  # rotated box
            th = rng.uniform(0, np.pi)
            c, s = np.cos(th), np.sin(th)
            pts = np.array([[-r, -r], [r, -r], [r, r], [-r, r], [-r, -r]])
            ring = pts @ np.array([[c, s], [-s, c]]) + (x, y)
            geoms.append(Geom(POLYGON, [ring]))
        elif k == 2:  # segment
            geoms.append(
                Geom(
                    LINESTRING,
                    np.array(
                        [[x, y], [x + rng.uniform(-3 * r, 3 * r), y + rng.uniform(-3 * r, 3 * r)]]
                    ),
                )
            )
        else:
            geoms.append(Geom(POINT, np.array([x, y])))
    return geoms


def main() -> None:
    rounds = 6
    seed = 20260820
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom import predicates as P
    from nettopologysuite_ray.geom.wkb import to_wkb
    from nettopologysuite_ray.stages.geom_join import spatial_join

    BRUTE = {
        "intersects": lambda a, b: alg.distance(a, b) == 0.0,
        "contains": P.contains,
        "crosses": P.crosses,
        "dwithin": None,  # handled with the distance directly
    }

    rng = np.random.default_rng(seed)
    t0 = time.time()
    n_checked = 0
    fails = []
    for rnd in range(rounds):
        ox, oy = [(0.0, 0.0), (1e7, 1e7), (-3.7e7, 2.2e7)][rnd % 3]
        scale = float(rng.choice([1000.0, 20000.0]))
        nl, nr = int(rng.integers(60, 160)), int(rng.integers(60, 160))
        lg = _layer(rng, nl, ox, oy, scale)
        rg = _layer(rng, nr, ox, oy, scale)
        lt = pa.table(
            {
                "l_id": pa.array(np.arange(nl)),
                "wkb": pa.array([to_wkb(g) for g in lg], type=pa.binary()),
            }
        )
        rt = pa.table(
            {
                "r_id": pa.array(np.arange(nr)),
                "wkb": pa.array([to_wkb(g) for g in rg], type=pa.binary()),
            }
        )
        ext = (ox - scale, oy - scale / 2, ox + scale, oy + scale / 2)
        level = int(rng.integers(2, 6))
        pred = ["intersects", "contains", "crosses", "dwithin"][rnd % 4]
        dist = scale / 50 if pred == "dwithin" else 0.0
        out = spatial_join(
            rd.from_arrow(lt).repartition(int(rng.integers(1, 6))),
            rd.from_arrow(rt).repartition(int(rng.integers(1, 6))),
            pred,
            left_keys=("l_id",),
            right_keys=("r_id",),
            extent=ext,
            level=level,
            distance=dist,
            salt_threshold=int(rng.integers(2, 20)) if rnd % 2 else None,
        )
        df = out.to_pandas()
        got = (
            sorted(map(tuple, df[["l_id", "r_id"]].itertuples(index=False)))
            if "l_id" in df.columns
            else []
        )
        if pred == "dwithin":
            truth = sorted(
                (i, j)
                for i in range(nl)
                for j in range(nr)
                if alg.distance(lg[i], rg[j]) <= dist
            )
        else:
            fn = BRUTE[pred]
            truth = sorted(
                (i, j) for i in range(nl) for j in range(nr) if fn(lg[i], rg[j])
            )
        n_checked += len(truth)
        if got != truth:
            fails.append(
                {
                    "round": rnd,
                    "pred": pred,
                    "level": level,
                    "extent": ext,
                    "extra": sorted(set(got) - set(truth))[:5],
                    "missing": sorted(set(truth) - set(got))[:5],
                }
            )
    ray.shutdown()
    print(
        json.dumps(
            {
                "rounds": rounds,
                "seed": seed,
                "pairs_checked": n_checked,
                "fails": fails,
                "sec": round(time.time() - t0, 1),
            }
        )
    )
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
