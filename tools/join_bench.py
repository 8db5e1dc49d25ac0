"""Large-large within-distance join stress benchmark with a skewed hotspot.

Fixture: N points per side; a fraction of BOTH sides is concentrated in a
single ~0.5-degree urban hotspot (one level-6 cell), the rest uniform
worldwide.  This makes one cell's pair kernel quadratic — the case the
salting pre-pass (`salt_threshold`) and the chunked per-cell kernel exist
for.  The run reports wall time, emitted pairs, and an order-insensitive
checksum; `--verify` re-runs UNSALTED and asserts the checksum matches
(salting must be result-invariant).

    python tools/join_bench.py [--n N] [--hot-frac F] [--verify]

Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage(n: int, hot_frac: float, path: str, seed: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n_hot = int(n * hot_frac)
    # hotspot: a 5 x 2.5 degree box strictly inside ONE level-6 cell
    # (cells are 5.625 x 2.8125 deg; box [1700,2200]x[4510,4760] cents)
    lon = np.concatenate(
        [
            rng.integers(1700, 2200, n_hot),
            rng.integers(-18000, 18000, n - n_hot),
        ]
    ).astype(np.int64)
    lat = np.concatenate(
        [
            rng.integers(4510, 4760, n_hot),
            rng.integers(-9000, 9000, n - n_hot),
        ]
    ).astype(np.int64)
    tbl = pa.table(
        {
            "pid": pa.array(np.arange(n, dtype=np.int64)),
            "lon_1e2": pa.array(lon),
            "lat_1e2": pa.array(lat),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path, row_group_size=65536)


def run_join(left_path: str, right_path: str, radius: int, salt_threshold):
    import ray.data as rd

    from nettopologysuite_ray.stages.cell_join import within_distance_join

    left = rd.read_parquet(left_path)
    right = rd.read_parquet(right_path)
    out = within_distance_join(
        left,
        right,
        radius_1e2=radius,
        level=6,
        left_keys=("pid",),
        right_keys=("pid_r",),
        salt_threshold=salt_threshold,
        n_salt=16,
    )
    t0 = time.time()
    df = out.to_pandas()
    dt = time.time() - t0
    import numpy as np

    ck = int(
        (
            df["pid"].to_numpy() * np.int64(1000003)
            + df["pid_r"].to_numpy() * np.int64(7919)
            + df["dist2"].to_numpy()
        ).sum()
        % (1 << 62)
    )
    return dt, len(df), ck


def main() -> None:
    n = 2_000_000
    hot_frac = 0.01
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    if "--hot-frac" in sys.argv:
        hot_frac = float(sys.argv[sys.argv.index("--hot-frac") + 1])
    lp = "/tmp/join_stage/left.parquet"
    rp = "/tmp/join_stage/right.parquet"
    stage(n, hot_frac, lp, seed=1)
    import pyarrow.parquet as pq

    # right side: same shape, different seed, renamed key
    stage(n, hot_frac, rp, seed=2)
    tbl = pq.read_table(rp).rename_columns(["pid_r", "lon_1e2", "lat_1e2"])
    pq.write_table(tbl, rp, row_group_size=65536)

    import ray

    ncpus = 32
    if "--cpus" in sys.argv:
        # honest small-cluster emulation (same policy as bench.py
        # --scaling): pin the whole Ray session to that many physical
        # cores so fractional-cpu tasks cannot borrow the full machine
        ncpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        os.sched_setaffinity(0, set(range(ncpus)))
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=ncpus, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import nettopologysuite_ray

    ray.cloudpickle.register_pickle_by_value(nettopologysuite_ray)

    radius = 25  # 0.25 deg
    sec, pairs, ck = run_join(lp, rp, radius, salt_threshold=2000)
    res = {
        "metric": "within_distance_join rows/sec (skewed hotspot, salted)",
        "rows_per_side": n,
        "hot_frac": hot_frac,
        "radius_1e2": radius,
        "pairs": pairs,
        "checksum": ck,
        "sec": round(sec, 1),
        "rows_per_sec": round(2 * n / sec, 1),
    }
    if "--verify" in sys.argv:
        sec_u, pairs_u, ck_u = run_join(lp, rp, radius, salt_threshold=None)
        assert (pairs_u, ck_u) == (pairs, ck), (pairs, pairs_u, ck, ck_u)
        res["unsalted_sec"] = round(sec_u, 1)
        res["salting_invariant"] = True
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
