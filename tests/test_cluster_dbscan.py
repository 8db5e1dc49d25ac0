"""Deterministic distributed DBSCAN (`stages/cluster.py`) vs an exact
brute-force reference.

The engine variant is the DETERMINISTIC one (border points join the MIN
cluster label among their core neighbors; cluster label = MIN core id of
the component), so the expected labelling is closed-form — no visit-order
ambiguity to paper over.  Distances are exact integer-cent arithmetic
(dist2 <= eps^2), so the oracle below is bit-exact, not approximate.

Role of the reference: NTS ships the geometric substrate (DistanceOp,
STRtree) but no density clustering; this is an engine-level extension in
the SURVEY.md §2.8 spirit, so the oracle is pure numpy, not a ref port.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_dbscan(lon, lat, ids, eps, min_pts):
    """Exact reference: integer dist2 <= eps^2; core = count(<=eps) >=
    min_pts (self included); clusters = CCs of the core-core graph with
    min-core-id labels; border = min cluster over core neighbors."""
    n = len(ids)
    lon = lon.astype(np.int64)
    lat = lat.astype(np.int64)
    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    nbr = d2 <= eps * eps  # includes self
    core = nbr.sum(axis=1) >= min_pts

    # union-find over core-core eps-edges
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    ci = np.where(core)[0]
    for a in ci:
        for b in ci:
            if a < b and nbr[a, b]:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)

    cluster = np.full(n, -1, dtype=np.int64)
    roles = np.array(["noise"] * n, dtype=object)
    # component label = min core ID in the component
    comp_min: dict[int, int] = {}
    for a in ci:
        r = find(a)
        comp_min[r] = min(comp_min.get(r, np.iinfo(np.int64).max), int(ids[a]))
    for a in ci:
        cluster[a] = comp_min[find(a)]
        roles[a] = "core"
    for a in range(n):
        if core[a]:
            continue
        labs = [cluster[b] for b in ci if nbr[a, b]]
        if labs:
            cluster[a] = min(labs)
            roles[a] = "border"
    return pd.DataFrame({"pt_id": ids, "cluster": cluster, "role": roles})


def _run_engine(df, eps, min_pts, **kw):
    import ray.data as rd

    from nettopologysuite_ray.stages.cluster import dbscan

    pts = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = dbscan(pts, eps_1e2=eps, min_pts=min_pts, **kw).to_pandas()
    return out.sort_values("pt_id").reset_index(drop=True)


def _points(seed, n, span=1200):
    rng = np.random.default_rng(seed)
    # three dense blobs + uniform background so all three roles appear
    blob = lambda cx, cy, m, s: np.stack(
        [
            rng.integers(cx - s, cx + s, m),
            rng.integers(cy - s, cy + s, m),
        ],
        axis=1,
    )
    pts = np.concatenate(
        [
            blob(0, 0, n // 4, 60),
            blob(400, 300, n // 4, 80),
            blob(-500, 200, n // 8, 40),
            np.stack(
                [
                    rng.integers(-span, span, n - n // 4 - n // 4 - n // 8),
                    rng.integers(-span, span, n - n // 4 - n // 4 - n // 8),
                ],
                axis=1,
            ),
        ]
    )
    ids = rng.permutation(len(pts)).astype(np.int64)  # ids not sorted by position
    return pd.DataFrame(
        {"pt_id": ids, "lon_1e2": pts[:, 0].astype(np.int64), "lat_1e2": pts[:, 1].astype(np.int64)}
    )


@pytest.mark.parametrize(
    "seed,n,eps,min_pts",
    [(1, 240, 60, 4), (2, 240, 90, 3), (3, 300, 45, 6), (4, 180, 150, 2)],
)
def test_dbscan_matches_bruteforce(ray_session, seed, n, eps, min_pts):
    df = _points(seed, n)
    exp = (
        _brute_dbscan(
            df["lon_1e2"].to_numpy(), df["lat_1e2"].to_numpy(), df["pt_id"].to_numpy(), eps, min_pts
        )
        .sort_values("pt_id")
        .reset_index(drop=True)
    )
    got = _run_engine(df, eps, min_pts)
    assert len(got) == len(df)
    pd.testing.assert_frame_equal(
        got[["pt_id", "cluster", "role"]], exp, check_dtype=False
    )
    # all three roles occur in at least one parametrization's data — sanity
    assert set(exp["role"]) <= {"core", "border", "noise"}


def test_dbscan_all_noise_and_isolated_core(ray_session):
    # far-apart points: all noise
    df = pd.DataFrame(
        {
            "pt_id": np.arange(5, dtype=np.int64),
            "lon_1e2": np.int64([0, 1000, 2000, 3000, 4000]),
            "lat_1e2": np.zeros(5, dtype=np.int64),
        }
    )
    got = _run_engine(df, eps=10, min_pts=2)
    assert (got["cluster"] == -1).all() and (got["role"] == "noise").all()

    # an isolated core: 3 coincident points (core via its 2 borders... all
    # three are within eps of each other so ALL are cores in one cluster),
    # plus a true isolated-core star: center + 2 satellites within eps of
    # the CENTER only -> center is the lone core, its own singleton label
    df = pd.DataFrame(
        {
            "pt_id": np.int64([10, 11, 12]),
            "lon_1e2": np.int64([0, 90, -90]),
            "lat_1e2": np.int64([0, 0, 0]),
        }
    )
    got = _run_engine(df, eps=100, min_pts=3).set_index("pt_id")
    assert got.loc[10, "role"] == "core" and got.loc[10, "cluster"] == 10
    assert got.loc[11, "role"] == "border" and got.loc[11, "cluster"] == 10
    assert got.loc[12, "role"] == "border" and got.loc[12, "cluster"] == 10


def test_dbscan_border_min_tiebreak(ray_session):
    # two separate 4-point cores with a border point within eps of both
    # clusters' edge cores (but of only 2 points total, so NOT itself a
    # core at min_pts=4): deterministic variant assigns the MIN label
    df = pd.DataFrame(
        {
            "pt_id": np.int64([0, 1, 2, 3, 10, 11, 12, 13, 99]),
            "lon_1e2": np.int64([-140, -120, -100, -80, 80, 100, 120, 140, 0]),
            "lat_1e2": np.zeros(9, dtype=np.int64),
        }
    )
    got = _run_engine(df, eps=85, min_pts=4).set_index("pt_id")
    assert got.loc[99, "role"] == "border"
    assert got.loc[99, "cluster"] == 0  # min of clusters {0, 10}
    assert got.loc[0, "cluster"] == 0 and got.loc[10, "cluster"] == 10
    exp = _brute_dbscan(
        df["lon_1e2"].to_numpy(), df["lat_1e2"].to_numpy(), df["pt_id"].to_numpy(), 85, 4
    )
    pd.testing.assert_frame_equal(
        got.reset_index().sort_values("pt_id").reset_index(drop=True)[
            ["pt_id", "cluster", "role"]
        ],
        exp.sort_values("pt_id").reset_index(drop=True),
        check_dtype=False,
    )


def test_dbscan_parallelism_invariant(ray_session):
    """Row-identical output at different partition counts / salting."""
    df = _points(7, 200)
    a = _run_engine(df, 70, 4, shuffle_partitions=4)
    b = _run_engine(df, 70, 4, shuffle_partitions=32, salt_threshold=20, n_salt=4)
    pd.testing.assert_frame_equal(a, b)


def test_dbscan_min_pts_guard(ray_session):
    import ray.data as rd

    from nettopologysuite_ray.stages.cluster import dbscan

    pts = rd.from_items([{"pt_id": 1, "lon_1e2": 0, "lat_1e2": 0}])
    with pytest.raises(ValueError):
        dbscan(pts, eps_1e2=10, min_pts=1)
