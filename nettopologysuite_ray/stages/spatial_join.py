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

    def __init__(
        self,
        admin_ref,
        mode: str = "assign",
        lon_col: str = "lon",
        lat_col: str = "lat",
        index: str = "grid",
    ):
        state = ray.get(admin_ref) if isinstance(admin_ref, ray.ObjectRef) else admin_ref
        self.boxes = state["boxes"]
        self.rings = state["rings"]
        self.admin_ids = state["admin_ids"]
        # 'grid' (CSR uniform grid — fastest on uniform admin sets) or
        # 'hpr' (Hilbert-packed R-tree, geom/index.py HPRtree — constant
        # node occupancy on skewed/heavy-tailed admin envelopes where the
        # grid over-buckets; identical join output either way)
        if index == "hpr":
            from ..geom.index import HPRtree

            self.grid = HPRtree(self.boxes)
        else:
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


def prepare_admin_geoms(admin_table: pa.Table, wkb_col: str = "geometry_wkb"):
    """Driver-side: ray.put the raw admin (wkb, id) columns once.  Actors
    parse + index in __init__ (PreparedRelateJoin) — shipping WKB keeps
    the broadcast object small and codec-stable."""
    return ray.put(
        {
            "wkbs": admin_table[wkb_col].to_pylist(),
            "admin_ids": np.asarray(
                admin_table["admin_id"].to_pylist(), dtype=np.int64
            ),
        }
    )


class PreparedRelateJoin:
    """Actor-pool prepared-relate join: arbitrary probe geometries (WKB
    column) against the broadcast admin polygon set.

    Generalizes PIPJoin's broadcast idiom from point probes to any
    geometry, with the reference's prepared short-circuit structure
    (reference: Geometries/Prepared/PreparedPolygon.cs:31-47 — vertex-in-
    area test, then segment-index intersection test, then containment
    probe; full relate only for ambiguous boundary-touch cases):

      intersects(A, B): any B vertex non-exterior to A | any boundary
        segment pair intersects | A's representative vertex inside areal B.
        Complete — no fallback needed.
      contains(A, B): reject when any B vertex is exterior; accept when
        all B vertices are strictly interior and no boundary segments
        intersect; else (boundary touches) fall back to the full DE-9IM
        relate.
      dwithin(A, B): euclidean distance <= d (candidates from the grid
        with envelopes expanded by d).

    Admin state (parse, GridIndex, ring arrays, segment arrays) is built
    ONCE per actor in __init__ from the ray.put broadcast; per batch the
    candidate set comes from one vectorized GridIndex.query_boxes call.
    Output ('inner'): probe columns + admin_id, one row per satisfying
    (probe, admin) pair."""

    def __init__(
        self,
        admin_ref,
        predicate: str = "intersects",
        wkb_col: str = "wkb",
        distance: float = 0.0,
    ):
        from ..geom import predicates as P
        from ..geom.wkb import decode_column

        state = ray.get(admin_ref) if isinstance(admin_ref, ray.ObjectRef) else admin_ref
        wkbs = pa.array(state["wkbs"], type=pa.binary())
        self.geoms = decode_column(wkbs)
        self.admin_ids = state["admin_ids"]
        self.predicate = predicate
        self.distance = float(distance)
        self._relate = P
        n = len(self.geoms)
        self.boxes = np.empty((n, 4), dtype=np.float64)
        self.rings = []
        self.segs = []
        self.rep = np.empty((n, 2), dtype=np.float64)
        for i, g in enumerate(self.geoms):
            env = alg.envelope(g)
            self.boxes[i] = env if env else (np.nan,) * 4
            polys = [c for c in g.flatten() if c.gtype == "Polygon"]
            rs = [r for p in polys for r in p.data]
            self.rings.append(rs)
            self.segs.append(alg._geom_segments(g))
            self.rep[i] = rs[0][0] if rs else (np.nan, np.nan)
        self.grid = GridIndex(self.boxes)
        self.wkb_col = wkb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..geom.wkb import decode_column

        probes = decode_column(batch[self.wkb_col])
        m = len(probes)
        envs = np.empty((m, 4), dtype=np.float64)
        for i, g in enumerate(probes):
            e = alg.envelope(g)
            envs[i] = e if e else (np.nan,) * 4
        grow = self.distance if self.predicate == "dwithin" else 0.0
        q = envs + (-grow, -grow, grow, grow) if grow else envs
        pi, ci = self.grid.query_boxes(q)
        if len(pi):
            bx = self.boxes[ci]
            keep = (
                (q[pi, 0] <= bx[:, 2])
                & (q[pi, 2] >= bx[:, 0])
                & (q[pi, 1] <= bx[:, 3])
                & (q[pi, 3] >= bx[:, 1])
            )
            pi, ci = pi[keep], ci[keep]
        hits = np.zeros(len(pi), dtype=bool)
        if self.predicate == "dwithin":
            for k in range(len(pi)):
                hits[k] = (
                    alg.distance(self.geoms[int(ci[k])], probes[int(pi[k])])
                    <= self.distance
                )
        else:
            # group by admin so each admin's ring arrays run one
            # vectorized multi-probe locate per batch
            order = np.argsort(ci, kind="stable")
            pos = 0
            while pos < len(order):
                end = pos
                a = int(ci[order[pos]])
                while end < len(order) and int(ci[order[end]]) == a:
                    end += 1
                idxs = order[pos:end]
                rings_a = self.rings[a]
                segs_a = self.segs[a]
                for k in idxs:
                    hits[k] = self._pair(
                        a, rings_a, segs_a, probes[int(pi[k])]
                    )
                pos = end
        pi_h, ci_h = pi[hits], ci[hits]
        out = batch.take(pa.array(pi_h, type=pa.int64()))
        return out.append_column(
            "admin_id", pa.array(self.admin_ids[ci_h], type=pa.int64())
        )

    def _pair(self, a: int, rings_a, segs_a, probe) -> bool:
        P = self._relate
        pts = probe.all_coords()
        loc = (
            alg.locate_points_in_rings(pts, rings_a)
            if len(rings_a) and len(pts)
            else np.full(len(pts), alg.EXTERIOR)
        )
        if self.predicate == "intersects":
            if (loc != alg.EXTERIOR).any():
                return True
            sb = alg._geom_segments(probe)
            if sb is not None and segs_a is not None and alg._segments_intersect(
                segs_a, sb
            ):
                return True
            # A entirely inside areal probe
            return alg._any_point_in_area(self.rep[a : a + 1], probe)
        if self.predicate == "contains":
            if (loc == alg.EXTERIOR).any():
                return False
            sb = alg._geom_segments(probe)
            no_seg_x = (
                sb is None
                or segs_a is None
                or not alg._segments_intersect(segs_a, sb)
            )
            if no_seg_x and len(loc) and (loc == alg.INTERIOR).all():
                return True
            return P.contains(self.geoms[a], probe)
        raise ValueError(f"unsupported predicate {self.predicate!r}")


class KnnJoin:
    """Actor-pool k-nearest-neighbour stage against the broadcast build side.

    Semantics of STRtree.NearestNeighbour(env, item, dist, k)
    (reference: Index/Strtree/STRtree.cs:556): k nearest build items per
    probe point by euclidean distance, ties by admin_id ascending.

    Implementation is a chunked brute-force distance scan (build side is
    broadcast-small): the (chunk x N) squared-distance block lives in ONE
    actor-held scratch buffer reused across chunks and batches, and top-k
    is k argmin passes with the found cell masked out — exact (dist2, id)
    tie order because the centers are pre-sorted by id (argmin returns the
    first minimum).  Scratch reuse keeps the per-actor fresh-page footprint
    at one chunk regardless of batch size — both the 100-TB memory bound
    and, on this host, the difference between ms and seconds per task
    (first-touch page faults measured at ~14 MB/s in new workers).  An
    STRtree branch-and-bound path exists in geom.index.STRtree.nearest for
    build sides too big to broadcast.
    Output: probe columns + rank:int64 (0-based), admin_id, dist2 (input
    coord dtype: int64 for integer-cents coords, double for float).
    """

    CHUNK = 512

    def __init__(
        self,
        centers_ref,
        k: int = 3,
        lon_col: str = "lon",
        lat_col: str = "lat",
        item_distance=None,
    ):
        state = ray.get(centers_ref) if isinstance(centers_ref, ray.ObjectRef) else centers_ref
        order = np.argsort(state["ids"], kind="stable")  # argmin tie == lowest id
        self.cx = np.ascontiguousarray(state["cx"][order])
        self.cy = np.ascontiguousarray(state["cy"][order])
        self.ids = np.ascontiguousarray(state["ids"][order])
        self.k = k
        self.lon_col = lon_col
        self.lat_col = lat_col
        # distance UDF hook (reference: Index/Strtree/IItemDistance.cs,
        # GeometryItemDistance.cs): vectorized (lon_chunk, lat_chunk,
        # cx, cy) -> (chunk, N) score matrix; None = squared euclid.
        # Lower score = nearer; ties still break by ascending id.
        self.item_distance = item_distance
        self._d2 = None
        self._tmp = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        n = len(lon)
        N = len(self.cx)
        k = min(self.k, N)
        # a distance UDF scores in float64; the default squared-euclid
        # stays in the input coord dtype (int64-exact for integer cents)
        dt = (
            np.dtype(np.float64)
            if self.item_distance is not None
            else np.result_type(lon, self.cx)
        )
        if n == 0:
            out = batch
            for name, typ in (("rank", pa.int64()), ("admin_id", pa.int64()),
                              ("dist2", pa.from_numpy_dtype(dt))):
                out = out.append_column(name, pa.array([], type=typ))
            return out
        sentinel = np.iinfo(dt).max if np.issubdtype(dt, np.integer) else np.inf
        if self._d2 is None or self._d2.shape != (self.CHUNK, N) or self._d2.dtype != dt:
            self._d2 = np.empty((self.CHUNK, N), dtype=dt)
            self._tmp = np.empty((self.CHUNK, N), dtype=dt)
        top_ids = np.empty((n, k), dtype=np.int64)
        top_d2 = np.empty((n, k), dtype=dt)
        rr = np.arange(self.CHUNK)
        for s in range(0, n, self.CHUNK):
            e = min(n, s + self.CHUNK)
            m = e - s
            if self.item_distance is not None:
                d2 = np.asarray(
                    self.item_distance(lon[s:e], lat[s:e], self.cx, self.cy),
                    dtype=dt,
                )
            else:
                d2 = self._d2[:m]
                t = self._tmp[:m]
                np.subtract(lon[s:e, None], self.cx[None, :], out=d2)
                np.multiply(d2, d2, out=d2)
                np.subtract(lat[s:e, None], self.cy[None, :], out=t)
                np.multiply(t, t, out=t)
                np.add(d2, t, out=d2)
            r = rr[:m]
            for j in range(k):
                am = np.argmin(d2, axis=1)
                top_d2[s:e, j] = d2[r, am]
                top_ids[s:e, j] = self.ids[am]
                d2[r, am] = sentinel
        idx = np.repeat(np.arange(n), k)
        out = batch.take(pa.array(idx, type=pa.int64()))
        out = out.append_column("rank", pa.array(np.tile(np.arange(k, dtype=np.int64), n)))
        out = out.append_column("admin_id", pa.array(top_ids.ravel(), type=pa.int64()))
        out = out.append_column("dist2", pa.array(top_d2.ravel()))  # keeps int64 for integer coords
        return out
