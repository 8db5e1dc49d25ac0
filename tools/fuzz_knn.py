"""Parity fuzz for the exact large-large kNN join (stages/knn_cell.py):
random clustered/sparse point layouts at 0 / +1e7 / −3.7e7 frames,
random k and grid levels, compared row-for-row (ids AND ranks) against
a brute-force lexsort truth with ascending-id tie-breaks.

    python tools/fuzz_knn.py [--rounds R] [--seed S]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def main() -> None:
    rounds = 12
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

    from nettopologysuite_ray.stages.knn_cell import knn_join

    rng = np.random.default_rng(seed)
    t0 = time.time()
    fails = []
    checked = 0
    for rnd in range(rounds):
        ox, oy = [(0.0, 0.0), (1e7, 1e7), (-3.7e7, 2.2e7)][rnd % 3]
        scale = float(rng.choice([500.0, 8000.0]))
        NL = int(rng.integers(100, 350))
        NR = int(rng.integers(100, 400))
        k = int(rng.integers(1, 6))

        def pts(n):
            kind = rng.random(n)
            x = np.where(kind < 0.5, rng.uniform(0, scale / 40, n), rng.uniform(-scale, scale, n))
            y = np.where(kind < 0.5, rng.uniform(0, scale / 80, n), rng.uniform(-scale / 2, scale / 2, n))
            # integer lattice fraction → exact distance ties
            lat = rng.random(n) < 0.3
            x = np.where(lat, np.round(x / 10) * 10, x)
            y = np.where(lat, np.round(y / 10) * 10, y)
            return ox + x, oy + y

        lx, ly = pts(NL)
        rx, ry = pts(NR)
        lt = pa.table({"l_id": pa.array(np.arange(NL)), "x": pa.array(lx), "y": pa.array(ly)})
        rt = pa.table({"r_id": pa.array(np.arange(NR)), "x": pa.array(rx), "y": pa.array(ry)})
        out = knn_join(
            rd.from_arrow(lt).repartition(int(rng.integers(1, 5))),
            rd.from_arrow(rt).repartition(int(rng.integers(1, 5))),
            k,
            extent=(ox - scale, oy - scale / 2, ox + scale, oy + scale / 2),
            level=int(rng.integers(2, 6)),
        )
        df = out.to_pandas().sort_values(["l_id", "rank"]).reset_index(drop=True)
        d2 = (lx[:, None] - rx[None, :]) ** 2 + (ly[:, None] - ry[None, :]) ** 2
        ok = len(df) == NL * k
        if ok:
            for i in range(NL):
                order = np.lexsort((np.arange(NR), d2[i]))
                got = df[df.l_id == i].r_id.astype(int).tolist()
                if got != [int(order[j]) for j in range(k)]:
                    ok = False
                    break
        checked += NL * k
        if not ok:
            fails.append({"round": rnd, "k": k, "NL": NL, "NR": NR, "frame": (ox, oy)})
    ray.shutdown()
    print(
        json.dumps(
            {
                "rounds": rounds,
                "seed": seed,
                "result_rows_checked": checked,
                "fails": fails,
                "sec": round(time.time() - t0, 1),
            }
        )
    )
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
