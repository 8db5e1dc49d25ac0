"""Broadcast spatial join: the north-star stage.

Small build side (admin-boundary polygons) → prepared state in an actor
pool; probe side (page geo-entities) streams through as Arrow batches.
Re-creates the reference's prepared-geometry idiom
(reference: Geometries/Prepared/PreparedPolygon.cs:17 — build the index
once, amortize over many probes; Algorithm/Locate/IndexedPointInAreaLocator.cs:111
— indexed ray-crossing PIP; Algorithm/Construct/IndexedPointInPolygonsLocator.cs
— first-containing-polygon lookup over many polygons).

Scale design (SURVEY.md §2.4): the build side is `ray.put` once on the
driver; every actor reads the SAME object-store copy in ``__init__`` —
never re-shipped per batch.  Candidate generation is a vectorized CSR
grid-index lookup (O(1) per probe); the exact predicate is the robust
ray-crossing kernel, applied per candidate polygon over all its probe
points at once.  At 100 TB the probe side streams; the build side is
O(#admin polygons) per node, identical to a 256-node broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..geom import algorithms as alg
from ..geom.index import GridIndex
from ..geom.wkb import from_wkb


def prepare_admin_state(admin_table: pa.Table):
    """Driver-side: parse + index the admin table once, ray.put the result.

    Returns an ObjectRef holding (boxes, rings_per_admin, admin_ids).
    """
    wkbs = admin_table["geometry_wkb"].to_pylist()
    admin_ids = np.asarray(admin_table["admin_id"].to_pylist(), dtype=np.int64)
    rings = []
    boxes = np.empty((len(wkbs), 4), dtype=np.float64)
    for i, b in enumerate(wkbs):
        g = from_wkb(b)
        polys = [c for c in g.flatten() if c.gtype == "Polygon"]
        rs = [r for p in polys for r in p.data]
        rings.append(rs)
        env = alg.envelope(g)
        boxes[i] = env if env else (np.nan,) * 4
    return ray.put({"boxes": boxes, "rings": rings, "admin_ids": admin_ids})


class PIPJoin:
    """Actor-pool point-in-polygon join stage.

    mode:
      'assign' — one output row per probe point, admin_id of the covering
                 polygon (ties on shared boundaries broken by MAX admin_id —
                 the deterministic report-at-reference-point rule that makes
                 output identical across parallelism levels); -1 if none.
      'inner'  — one output row per (point, covering polygon) pair
                 (intersects semi-join, boundary counts as covering).
    """

    def __init__(self, admin_ref, mode: str = "assign", lon_col: str = "lon", lat_col: str = "lat"):
        state = ray.get(admin_ref) if isinstance(admin_ref, ray.ObjectRef) else admin_ref
        self.boxes = state["boxes"]
        self.rings = state["rings"]
        self.admin_ids = state["admin_ids"]
        self.grid = GridIndex(self.boxes)
        self.mode = mode
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        pts = np.column_stack([lon, lat])
        pi, ci = self.grid.query_points(lon, lat)
        # exact bbox filter on candidates
        bx = self.boxes[ci]
        keep = (
            (pts[pi, 0] >= bx[:, 0])
            & (pts[pi, 0] <= bx[:, 2])
            & (pts[pi, 1] >= bx[:, 1])
            & (pts[pi, 1] <= bx[:, 3])
        )
        pi, ci = pi[keep], ci[keep]
        # exact PIP, grouped by candidate polygon (vectorize per polygon)
        hit_mask = np.zeros(len(pi), dtype=bool)
        if len(pi):
            order = np.argsort(ci, kind="stable")
            pi_o, ci_o = pi[order], ci[order]
            bounds = np.nonzero(np.diff(ci_o))[0] + 1
            starts = np.concatenate([[0], bounds])
            ends = np.concatenate([bounds, [len(ci_o)]])
            hm = np.zeros(len(pi_o), dtype=bool)
            for s, e in zip(starts, ends):
                poly = int(ci_o[s])
                loc = alg.locate_points_in_rings(pts[pi_o[s:e]], self.rings[poly])
                hm[s:e] = loc != alg.EXTERIOR  # covers: interior or boundary
            inv = np.empty_like(order)
            inv[order] = np.arange(len(order))
            hit_mask = hm[inv]
        pi_h, ci_h = pi[hit_mask], ci[hit_mask]
        if self.mode == "inner":
            out = batch.take(pa.array(pi_h, type=pa.int64()))
            return out.append_column(
                "admin_id", pa.array(self.admin_ids[ci_h], type=pa.int64())
            )
        # assign: max admin_id per point, -1 when uncovered
        assign = np.full(len(batch), -1, dtype=np.int64)
        if len(pi_h):
            np.maximum.at(assign, pi_h, self.admin_ids[ci_h])
        return batch.append_column("admin_id", pa.array(assign, type=pa.int64()))


class KnnJoin:
    """Actor-pool k-nearest-neighbour stage against the broadcast build side.

    Semantics of STRtree.NearestNeighbour(env, item, dist, k)
    (reference: Index/Strtree/STRtree.cs:556): k nearest build items per
    probe point by euclidean distance, ties by admin_id ascending.

    Implementation is a vectorized brute-force distance matrix per batch
    (build side is broadcast-small; (B x N) numpy is the fast path) with
    squared distances for exact tie semantics; an STRtree branch-and-bound
    path exists in geom.index.STRtree.nearest for large build sides.
    Output: probe columns + rank:int64 (0-based), admin_id, dist2:double.
    """

    def __init__(self, centers_ref, k: int = 3, lon_col: str = "lon", lat_col: str = "lat"):
        state = ray.get(centers_ref) if isinstance(centers_ref, ray.ObjectRef) else centers_ref
        self.cx = state["cx"]
        self.cy = state["cy"]
        self.ids = state["ids"]
        self.k = k
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        dx = lon[:, None] - self.cx[None, :]
        dy = lat[:, None] - self.cy[None, :]
        d2 = dx * dx + dy * dy
        k = min(self.k, d2.shape[1])
        # top-k with (dist2, id) tie order
        part = np.argpartition(d2, k - 1, axis=1)[:, :k]
        rows = np.arange(len(lon))[:, None]
        pd2 = d2[rows, part]
        pids = self.ids[part]
        order = np.lexsort((pids, pd2), axis=1)
        top_ids = pids[rows, order]
        top_d2 = pd2[rows, order]
        n = len(lon)
        idx = np.repeat(np.arange(n), k)
        out = batch.take(pa.array(idx, type=pa.int64()))
        out = out.append_column("rank", pa.array(np.tile(np.arange(k, dtype=np.int64), n)))
        out = out.append_column("admin_id", pa.array(top_ids.ravel(), type=pa.int64()))
        out = out.append_column("dist2", pa.array(top_d2.ravel()))  # keeps int64 for integer coords
        return out
