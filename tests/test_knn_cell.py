"""Exact large-large kNN join (stages/knn_cell.py) vs brute force:
clustered + sparse-region layout forces the radius-doubling escalation;
ties (equal distances on an integer lattice) must break by ascending
right id; output is identical across parallelism levels."""

import numpy as np
import pyarrow as pa


def _run(lt, rt, k, lparts, rparts, level):
    import ray.data as rd

    from nettopologysuite_ray.stages.knn_cell import knn_join

    out = knn_join(
        rd.from_arrow(lt).repartition(lparts),
        rd.from_arrow(rt).repartition(rparts),
        k,
        extent=(-5000.0, -2500.0, 5000.0, 2500.0),
        level=level,
    )
    return out.to_pandas().sort_values(["l_id", "rank"]).reset_index(drop=True)


def test_knn_join_exact_and_parallelism_invariant(ray_session):
    rng = np.random.default_rng(17)
    NL, NR, K = 400, 700, 3
    lx = np.concatenate([rng.uniform(0, 100, NL // 2), rng.uniform(-5000, 5000, NL - NL // 2)])
    ly = np.concatenate([rng.uniform(0, 50, NL // 2), rng.uniform(-2500, 2500, NL - NL // 2)])
    rx = np.concatenate([rng.uniform(0, 100, NR // 2), rng.uniform(-5000, 5000, NR - NR // 2)])
    ry = np.concatenate([rng.uniform(0, 50, NR // 2), rng.uniform(-2500, 2500, NR - NR // 2)])
    lt = pa.table({"l_id": pa.array(np.arange(NL)), "x": pa.array(lx), "y": pa.array(ly)})
    rt = pa.table({"r_id": pa.array(np.arange(NR)), "x": pa.array(rx), "y": pa.array(ry)})
    df = _run(lt, rt, K, 3, 5, 5)
    assert len(df) == NL * K and not df.duplicated(subset=["l_id", "rank"]).any()
    d2 = (lx[:, None] - rx[None, :]) ** 2 + (ly[:, None] - ry[None, :]) ** 2
    for i in range(NL):
        order = np.lexsort((np.arange(NR), d2[i]))
        sub = df[df.l_id == i]
        assert sub.r_id.astype(int).tolist() == [int(order[j]) for j in range(K)]
    # different parallelism + grid level → identical rows
    df2 = _run(lt, rt, K, 1, 9, 4)
    assert df2[["l_id", "rank", "r_id"]].equals(df[["l_id", "rank", "r_id"]])


def test_knn_join_integer_lattice_ties(ray_session):
    """Left point equidistant from four lattice rights: ties must break
    by ascending right id, exactly."""
    lt = pa.table({"l_id": pa.array([0]), "x": pa.array([0.0]), "y": pa.array([0.0])})
    rt = pa.table(
        {
            "r_id": pa.array([7, 3, 11, 5]),
            "x": pa.array([10.0, -10.0, 0.0, 0.0]),
            "y": pa.array([0.0, 0.0, 10.0, -10.0]),
        }
    )
    df = _run(lt, rt, 3, 1, 1, 3)
    assert df.r_id.tolist() == [3, 5, 7]
    assert (df.dist2 == 100.0).all()
