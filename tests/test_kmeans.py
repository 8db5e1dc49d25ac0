"""Distributed integer-exact Lloyd's k-means (`functions/kmeans.py`) vs a
brute-force numpy reference implementing the identical determinism
contract (quantize half-away, integer-rounded centroid means, ties to the
lower centroid id, empty cluster keeps its previous position)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from nettopologysuite_ray.functions.kmeans import (
    _round_div_half_away,
    kmeans,
    quantize_batch,
)

SCALE = 10**6


def _brute_kmeans(ids, X, k, iters, scale=SCALE):
    # replay the engine's storage path: float32 parquet values widened to
    # float64, then round half away from zero at the scale
    Xs = X.astype(np.float32).astype(np.float64) * scale
    q = (np.sign(Xs) * np.floor(np.abs(Xs) + 0.5)).astype(np.int64)
    order = np.argsort(ids, kind="mergesort")
    C = q[order[:k]].copy()

    def assign(C):
        d = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        cid = d.argmin(axis=1)
        return cid, d[np.arange(len(q)), cid]

    for _ in range(iters):
        cid, _ = assign(C)
        for c in range(k):
            sel = cid == c
            if sel.any():
                s = q[sel].sum(axis=0)
                n = int(sel.sum())
                C[c] = _round_div_half_away(s, np.int64(n))
    cid, d2 = assign(C)
    return cid, d2, C


def _mk_ds(ids, X):
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids.astype(np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(X.reshape(-1).astype(np.float32)), X.shape[1]
                ),
            }
        )
    )


def test_round_div_half_away_matches_python():
    rng = np.random.default_rng(7)
    s = rng.integers(-10**9, 10**9, size=500).astype(np.int64)
    n = rng.integers(1, 997, size=500).astype(np.int64)
    got = _round_div_half_away(s, n)
    from fractions import Fraction

    for si, ni, gi in zip(s, n, got):
        f = Fraction(int(si), int(ni))
        # round half away from zero
        exp = int(f) + (1 if (f - int(f)) >= Fraction(1, 2) else 0) if f >= 0 else -(
            int(-f) + (1 if (-f - int(-f)) >= Fraction(1, 2) else 0)
        )
        assert gi == exp, (si, ni, gi, exp)


def test_quantize_batch_half_away():
    t = pa.table(
        {
            "vec_id": pa.array([1, 2]),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(np.array([0.0000005, -0.0000005, 0.25, -0.25], dtype=np.float64)),
                2,
            ),
        }
    )
    q = quantize_batch(t, "embedding", SCALE)
    m = np.stack(q["q"].to_pandas().to_numpy())
    # 0.5 rounds away from zero at the quantization boundary
    assert m.tolist() == [[1, -1], [250000, -250000]]


@pytest.mark.parametrize("npts,dim,k,iters", [(300, 8, 5, 3), (120, 4, 3, 4)])
def test_kmeans_matches_brute(ray_session, npts, dim, k, iters):
    rng = np.random.default_rng(npts)
    centers = rng.normal(size=(k, dim)) * 0.3
    X = centers[rng.integers(0, k, npts)] + rng.normal(size=(npts, dim)) * 0.05
    ids = rng.permutation(npts).astype(np.int64)
    ds = _mk_ds(ids, X)
    out, C = kmeans(ds, dim, k=k, iters=iters)
    got = out.to_pandas().sort_values("vec_id").reset_index(drop=True)
    cid, d2, Cb = _brute_kmeans(ids, X, k, iters)
    order = np.argsort(ids, kind="mergesort")
    exp = (
        np.stack([ids, cid, d2], axis=1)[np.argsort(ids)]
    )
    assert (C == Cb).all()
    assert got["cluster"].to_numpy().tolist() == cid[np.argsort(ids)].tolist()
    assert got["dist2"].to_numpy().tolist() == d2[np.argsort(ids)].tolist()


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    # two far groups, k=3 seeded from the three lowest ids (all in group
    # one) — at least one centroid ends up empty and must stay put
    X = np.vstack(
        [
            np.full((5, 2), 0.1) + np.arange(5)[:, None] * 1e-6,
            np.full((5, 2), -0.1) - np.arange(5)[:, None] * 1e-6,
        ]
    )
    ids = np.arange(10).astype(np.int64)
    ds = _mk_ds(ids, X)
    out, C = kmeans(ds, 2, k=3, iters=3)
    cid, d2, Cb = _brute_kmeans(ids, X, 3, 3)
    assert (C == Cb).all()
    got = out.to_pandas().sort_values("vec_id")
    assert got["cluster"].to_numpy().tolist() == cid.tolist()


def test_kmeans_parallelism_invariant(ray_session):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(200, 6)) * 0.2
    ids = np.arange(200).astype(np.int64)
    a = kmeans(_mk_ds(ids, X).repartition(1), 6, k=4, iters=2)[0].to_pandas()
    b = kmeans(_mk_ds(ids, X).repartition(13), 6, k=4, iters=2)[0].to_pandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)


def test_kmeans_checkpoint_resume(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    X = rng.normal(size=(150, 4)) * 0.2
    ids = np.arange(150).astype(np.int64)
    ck = str(tmp_path / "km")

    # direct 3-iteration run (no checkpoint) = ground truth
    direct, Cd = kmeans(_mk_ds(ids, X), 4, k=3, iters=3)
    direct = direct.to_pandas().sort_values("vec_id").reset_index(drop=True)

    # run 2 iterations with checkpointing, then EXTEND to 3 in a second
    # call against the same dir: the first two Lloyd steps must be reused
    # (their done-markers exist) and the final result must equal direct
    kmeans(_mk_ds(ids, X), 4, k=3, iters=2, checkpoint_dir=ck)
    import os

    assert os.path.exists(os.path.join(ck, "_lineage", "part-iter-2.json"))
    resumed, Cr = kmeans(_mk_ds(ids, X), 4, k=3, iters=3, checkpoint_dir=ck)
    resumed = resumed.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert (Cr == Cd).all()
    assert resumed.equals(direct)

    # a params change invalidates the markers (different hash -> no reuse)
    out2, C2 = kmeans(_mk_ds(ids, X), 4, k=3, iters=3, scale=10**5, checkpoint_dir=ck)
    cid, d2, Cb = _brute_kmeans(ids, X, 3, 3, scale=10**5)
    assert (C2 == Cb).all()
