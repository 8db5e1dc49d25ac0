"""Extended randomized parity fuzz for the distributed topology stages
(node → polygonize / dissolve vs the in-process kernels on brute-noded
input).  One Ray session, many seeds; prints one JSON summary line.

Usage: python tools/fuzz_topo.py [n_seeds] [num_cpus] [seed_base] [n_max] [offset]

offset (default 0) translates every input line by (offset, offset)
before BOTH the kernel and the distributed path — parity far from the
origin, where one coordinate ulp is ~2e-9 at 1e7 (the frame that
exposed the round-4 raw-shoelace area bug).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    seed_base = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    n_max = int(sys.argv[4]) if len(sys.argv) > 4 else 22
    offset = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.geom.algorithms import normalize
    from nettopologysuite_ray.geom.construct import polygonize
    from nettopologysuite_ray.geom.extra import dissolve_lines
    from nettopologysuite_ray.geom.types import Geom
    from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
    from nettopologysuite_ray.geom.wkt import to_wkt
    from nettopologysuite_ray.stages.linemerge import distributed_line_dissolve
    from nettopologysuite_ray.stages.noding import distributed_node
    from nettopologysuite_ray.stages.polygonize import distributed_polygonize

    from tests.test_topo_fuzz import _brute_node, _canon_line, _random_lines

    t0 = time.time()
    fails = []
    for seed in range(seed_base + 1, seed_base + n_seeds + 1):
        rng = random.Random(seed * 7919)
        lines = _random_lines(rng, n=rng.randint(8, n_max), extent=rng.choice([12, 20, 35]))
        if offset:
            lines = [
                Geom("LineString", l.data + offset) for l in lines
            ]
        cell = rng.choice([2.0, 3.0, 5.0, 7.5, 11.0])
        noded_kernel = [
            Geom("LineString", np.array([a, b], dtype=np.float64))
            for a, b in _brute_node(lines)
        ]
        exp_faces = sorted(
            to_wkt(normalize(p))
            for p in polygonize(Geom("GeometryCollection", noded_kernel)).data
        )
        exp_merge = sorted(
            _canon_line(arr)
            for comp in dissolve_lines(Geom("GeometryCollection", noded_kernel)).flatten()
            for arr in comp.coords_list()
        )
        tbl = pa.table({"wkb": pa.array([to_wkb(l) for l in lines], type=pa.binary())})
        noded = distributed_node(rd.from_arrow(tbl), cell=cell).materialize()
        got_faces = sorted(
            to_wkt(normalize(from_wkb(r["face_wkb"])))
            for r in distributed_polygonize(noded, cell=cell).take_all()
        )
        got_merge = sorted(
            _canon_line(from_wkb(r["line_wkb"]).data)
            for r in distributed_line_dissolve(noded, cell=cell).take_all()
        )
        if got_faces != exp_faces or got_merge != exp_merge:
            fails.append(seed)
        if seed % 10 == 0:
            print(
                f"# {seed}/{n_seeds} seeds, {len(fails)} failures",
                file=sys.stderr,
                flush=True,
            )
    print(
        json.dumps(
            {
                "metric": "distributed topo parity fuzz",
                "seeds": n_seeds,
                "failures": fails,
                "sec": round(time.time() - t0, 1),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
