"""HPRtree — Hilbert-packed flat R-tree (geom/index.py; reference:
Index/HPRtree/HPRtree.cs:40,388).

Candidate pairs are EXACT (bbox-tested at every packed level), so
results must equal a brute-force envelope join; against GridIndex the
contract is identical after the grid's bbox post-filter.  The PIPJoin
stage must produce byte-identical join output with either index."""

import numpy as np
import pyarrow as pa

from nettopologysuite_ray.geom.index import GridIndex, HPRtree


def _grid_exact(gi, qboxes, boxes):
    pi, ci = gi.query_boxes(qboxes)
    bx = boxes[ci]
    keep = (
        (qboxes[pi, 0] <= bx[:, 2])
        & (qboxes[pi, 2] >= bx[:, 0])
        & (qboxes[pi, 1] <= bx[:, 3])
        & (qboxes[pi, 3] >= bx[:, 1])
    )
    return set(zip(pi[keep].tolist(), ci[keep].tolist()))


def test_hprtree_matches_grid_and_brute():
    rng = np.random.default_rng(42)
    for skew in (False, True):
        N = 3000
        if skew:
            cx = np.where(rng.random(N) < 0.9, rng.uniform(0, 20, N), rng.uniform(-1000, 1000, N))
            cy = np.where(rng.random(N) < 0.9, rng.uniform(0, 10, N), rng.uniform(-500, 500, N))
            sz = np.exp(rng.normal(0, 1.5, N))  # heavy-tailed item sizes
        else:
            cx = rng.uniform(-1000, 1000, N)
            cy = rng.uniform(-500, 500, N)
            sz = rng.uniform(1, 30, N)
        boxes = np.column_stack([cx - sz, cy - sz, cx + sz, cy + sz])
        M = 2000
        qx = rng.uniform(-1000, 1000, M)
        qy = rng.uniform(-500, 500, M)
        qboxes = np.column_stack([qx - 5, qy - 5, qx + 5, qy + 5])
        hp = HPRtree(boxes)
        hset = set(zip(*[a.tolist() for a in hp.query_boxes(qboxes)]))
        assert hset == _grid_exact(GridIndex(boxes), qboxes, boxes)
        sub = set()
        for i in range(200):
            m = (
                (qboxes[i, 0] <= boxes[:, 2])
                & (qboxes[i, 2] >= boxes[:, 0])
                & (qboxes[i, 1] <= boxes[:, 3])
                & (qboxes[i, 3] >= boxes[:, 1])
            )
            sub.update((i, int(j)) for j in np.nonzero(m)[0])
        assert {(p, c) for p, c in hset if p < 200} == sub
        # point probes
        hpts = set(zip(*[a.tolist() for a in hp.query_points(qx, qy)]))
        qpts = np.column_stack([qx, qy, qx, qy])
        assert hpts == _grid_exact(GridIndex(boxes), qpts, boxes)


def test_hprtree_degenerate():
    assert HPRtree(np.zeros((0, 4))).query_boxes(np.array([[0, 0, 1, 1.0]]))[0].size == 0
    one = HPRtree(np.array([[0.0, 0.0, 2.0, 2.0]]))
    pi, ci = one.query_boxes(np.array([[1, 1, 3, 3.0], [5, 5, 6, 6.0]]))
    assert pi.tolist() == [0] and ci.tolist() == [0]
    # NaN (empty-geometry) leaves never match and don't poison ancestors
    boxes = np.array([[0, 0, 1, 1.0], [np.nan] * 4, [5, 5, 6, 6.0]])
    hp = HPRtree(boxes)
    pi, ci = hp.query_boxes(np.array([[0.5, 0.5, 5.5, 5.5]]))
    assert sorted(ci.tolist()) == [0, 2]


def test_pipjoin_identical_with_hpr_index(ray_session):
    import ray.data as rd

    from nettopologysuite_ray.sources.pages import admin_boundaries_table
    from nettopologysuite_ray.stages.spatial_join import PIPJoin, prepare_admin_state

    ref = prepare_admin_state(admin_boundaries_table(fancy=False))
    rng = np.random.default_rng(3)
    pts = pa.table(
        {
            "pid": pa.array(np.arange(5000)),
            "lon": pa.array(rng.uniform(-180, 180, 5000)),
            "lat": pa.array(rng.uniform(-90, 90, 5000)),
        }
    )
    outs = {}
    for index in ("grid", "hpr"):
        ds = rd.from_arrow(pts).map_batches(
            PIPJoin,
            fn_constructor_kwargs={"admin_ref": ref, "mode": "assign", "index": index},
            concurrency=1,
            batch_format="pyarrow",
        )
        outs[index] = ds.to_pandas().sort_values("pid").reset_index(drop=True)
    assert outs["grid"].equals(outs["hpr"])
    assert (outs["grid"]["admin_id"] >= -1).all()
    assert (outs["grid"]["admin_id"] >= 0).any()
