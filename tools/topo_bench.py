"""Scale check for the distributed topology stages: polygonize, bulk
noding, line dissolve on a parametric road grid (same construction as
the polygonize_grid gate query, sized up).  Prints one JSON line per
stage with rows in/out and wall seconds.

Usage: python tools/topo_bench.py [nx] [num_cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("RAY_GRAFT_CPUS", "32")
    )
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import __ray_entry__ as entry
    from nettopologysuite_ray.geom.types import Geom
    from nettopologysuite_ray.geom.wkb import to_wkb
    from nettopologysuite_ray.stages.linemerge import distributed_line_dissolve
    from nettopologysuite_ray.stages.noding import distributed_node
    from nettopologysuite_ray.stages.polygonize import distributed_polygonize

    C = entry._GRID_C
    ny = nx

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        wkbs = []
        for idx in ids.tolist():
            i, j = idx % nx, idx // nx
            for p0, p1 in entry._grid_segments_for_node(i, j, nx, ny):
                wkbs.append(
                    to_wkb(Geom("LineString", np.array([p0, p1], dtype=np.float64)))
                )
        return pa.table({"wkb": pa.array(wkbs, type=pa.binary())})

    lines = rd.range(nx * ny, override_num_blocks=num_cpus * 2).map_batches(
        build, batch_format="pyarrow"
    ).materialize()
    n_segs = lines.count()
    out = {"nx": nx, "segments": n_segs, "num_cpus": num_cpus}

    def expected_faces() -> int:
        """Closed-form face inventory of the road grid (verified against
        the in-process polygonize kernel at 6 grid sizes): unit blocks,
        minus superblock-merged blocks, plus diagonal splits, plus 2 faces
        (holed superblock + island) per valid superblock anchor."""
        def in_region(i, j):
            if i % 6 not in (4, 5) or j % 6 not in (4, 5):
                return False
            ai = i if i % 6 == 4 else i - 1
            aj = j if j % 6 == 4 else j - 1
            return ai % 6 == 4 and aj % 6 == 4 and ai + 1 <= nx - 2 and aj + 1 <= ny - 2

        n_super = sum(
            1
            for i in range(nx - 1)
            for j in range(ny - 1)
            if i % 6 == 4 and j % 6 == 4 and i + 1 <= nx - 2 and j + 1 <= ny - 2
        )
        n_region = sum(1 for i in range(nx - 1) for j in range(ny - 1) if in_region(i, j))
        n_diag = sum(
            1
            for i in range(nx - 1)
            for j in range(ny - 1)
            if not in_region(i, j) and (i * 31 + j * 17) % 5 == 0
        )
        return (nx - 1) * (ny - 1) - n_region + n_diag + 2 * n_super

    t0 = time.time()
    faces = distributed_polygonize(lines, cell=C * 2.5, num_partitions=num_cpus)
    out["polygonize_faces"] = faces.count()
    out["polygonize_sec"] = round(time.time() - t0, 2)
    out["polygonize_expected"] = expected_faces()
    assert out["polygonize_faces"] == out["polygonize_expected"], out

    t0 = time.time()
    noded = distributed_node(lines, cell=C * 2.5, as_wkb=False)
    out["node_out"] = noded.count()
    out["node_sec"] = round(time.time() - t0, 2)
    # the road grid has no segment crossings (streets/diagonals/island
    # rings meet only at endpoints), so bulk noding must be count-preserving
    assert out["node_out"] == n_segs, out

    t0 = time.time()
    merged = distributed_line_dissolve(lines, cell=C * 2.5)
    out["dissolve_lines"] = merged.count()
    out["dissolve_sec"] = round(time.time() - t0, 2)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
