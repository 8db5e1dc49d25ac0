"""KnnJoin item-distance UDF hook (reference:
Index/Strtree/IItemDistance.cs, GeometryItemDistance.cs): a custom
vectorized score replaces squared euclid; ties still break by id."""

import numpy as np
import pyarrow as pa

import ray


def _centers():
    return {
        "ids": np.array([3, 1, 2], dtype=np.int64),
        "cx": np.array([0.0, 10.0, 20.0]),
        "cy": np.array([0.0, 0.0, 0.0]),
    }


def test_knn_manhattan_udf(ray_session):
    import ray.data as rd

    from nettopologysuite_ray.stages.spatial_join import KnnJoin

    def manhattan(lon, lat, cx, cy):
        return np.abs(lon[:, None] - cx[None, :]) + np.abs(lat[:, None] - cy[None, :])

    probes = pa.table({"pid": [0, 1], "lon": [1.0, 19.0], "lat": [5.0, 1.0]})
    out = (
        rd.from_arrow(probes)
        .map_batches(
            KnnJoin,
            fn_constructor_kwargs={
                "centers_ref": ray.put(_centers()),
                "k": 2,
                "item_distance": manhattan,
            },
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .sort_values(["pid", "rank"])
        .reset_index(drop=True)
    )
    # probe 0 at (1,5): manhattan to centers (id3@0,0)=6, (id1@10,0)=14, (id2@20,0)=24
    assert out.loc[0, "admin_id"] == 3 and out.loc[0, "dist2"] == 6.0
    assert out.loc[1, "admin_id"] == 1 and out.loc[1, "dist2"] == 14.0
    # probe 1 at (19,1): id2@20 -> 2, id1@10 -> 10
    assert out.loc[2, "admin_id"] == 2 and out.loc[2, "dist2"] == 2.0
    assert out.loc[3, "admin_id"] == 1 and out.loc[3, "dist2"] == 10.0
    # default euclid² still intact and ties break by ascending id
    out2 = (
        rd.from_arrow(pa.table({"pid": [0], "lon": [5.0], "lat": [0.0]}))
        .map_batches(
            KnnJoin,
            fn_constructor_kwargs={"centers_ref": ray.put(_centers()), "k": 2},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    # (5,0) is equidistant from id3@0 and id1@10: lower id first
    assert out2.loc[0, "admin_id"] == 1 and out2.loc[1, "admin_id"] == 3
    assert out2.loc[0, "dist2"] == 25.0
