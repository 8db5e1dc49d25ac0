"""Spatial indexes: packed STR-tree and a CSR grid index.

The reference's in-process indexes (Index/Strtree/STRtree.cs:32 with
sort-tile-recursive bulk load at :163-185, Index/HPRtree/HPRtree.cs:40
flat-array Hilbert-packed layout) become, in the engine, broadcast
build-side state held by actor pools (SURVEY.md §2.4).  Both indexes here
are built once in an actor's ``__init__`` from the (small) build-side
table and queried per Arrow batch.

* ``STRtree``    — numpy-packed STR bulk-loaded R-tree; envelope query,
                   branch-and-bound k-nearest-neighbour
                   (semantics of STRtree.NearestNeighbour, STRtree.cs:556).
* ``GridIndex``  — uniform-grid CSR bucket index for vectorized
                   point→candidate lookup; the scale path for the PIP
                   probe (millions of probes/sec, no per-point tree walk).
"""

from __future__ import annotations

import heapq

import numpy as np

NODE_CAP = 10  # reference default node capacity (STRtree.cs DefaultNodeCapacity)


class STRtree:
    """Packed Sort-Tile-Recursive R-tree over item envelopes.

    boxes: (N, 4) float64 [minx, miny, maxx, maxy].  Items are referred to
    by integer position; callers keep their own payload arrays.
    """

    def __init__(self, boxes: np.ndarray, node_capacity: int = NODE_CAP):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        self.boxes = boxes
        self.cap = node_capacity
        if self.n == 0:
            self.levels = []
            self.item_order = np.empty(0, dtype=np.int64)
            return
        # --- STR packing of leaf level (STRtree.cs:163-185): sort by
        # x-centre, slice into sqrt(N/cap) vertical slabs, sort each slab by
        # y-centre, pack runs of `cap`.
        cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
        cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
        order = np.argsort(cx, kind="stable")
        nslices = max(1, int(np.ceil(np.sqrt(self.n / node_capacity))))
        slice_sz = int(np.ceil(self.n / nslices))
        final = np.empty(self.n, dtype=np.int64)
        pos = 0
        for s in range(0, self.n, slice_sz):
            sl = order[s : s + slice_sz]
            sl = sl[np.argsort(cy[sl], kind="stable")]
            final[pos : pos + len(sl)] = sl
            pos += len(sl)
        self.item_order = final
        # --- build level envelopes bottom-up
        level = boxes[final]
        self.levels = []  # top..leaf each (M,4) + children spans implied by cap
        cur = level
        while len(cur) > 1:
            m = int(np.ceil(len(cur) / node_capacity))
            nxt = np.empty((m, 4), dtype=np.float64)
            for i in range(m):
                chunk = cur[i * node_capacity : (i + 1) * node_capacity]
                nxt[i, 0] = chunk[:, 0].min()
                nxt[i, 1] = chunk[:, 1].min()
                nxt[i, 2] = chunk[:, 2].max()
                nxt[i, 3] = chunk[:, 3].max()
            self.levels.append(cur)
            cur = nxt
        self.levels.append(cur)
        self.levels.reverse()  # levels[0] = root level

    def query(self, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
        """Item indices whose envelope intersects the query envelope."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        nodes = np.array([0], dtype=np.int64)
        for depth in range(len(self.levels) - 1):
            child_level = self.levels[depth + 1]
            # children of node i live at [i*cap, min((i+1)*cap, len))
            starts = nodes * self.cap
            kids = []
            for s in starts:
                e = min(s + self.cap, len(child_level))
                kids.append(np.arange(s, e, dtype=np.int64))
            cand = np.concatenate(kids) if kids else np.empty(0, dtype=np.int64)
            cb = child_level[cand]
            hit = (
                (cb[:, 0] <= maxx)
                & (cb[:, 2] >= minx)
                & (cb[:, 1] <= maxy)
                & (cb[:, 3] >= miny)
            )
            nodes = cand[hit]
            if len(nodes) == 0:
                return np.empty(0, dtype=np.int64)
        return self.item_order[nodes]

    # -- kNN ------------------------------------------------------------

    def nearest(self, x: float, y: float, k: int = 1, item_dist=None):
        """k nearest items to point (x, y) by item distance.

        item_dist(idx) -> float gives the true distance for item idx
        (defaults to envelope distance).  Branch-and-bound over a priority
        queue of (dist, kind, id) — semantics of STRtree.cs:329,556.
        Returns list of (dist, idx) sorted ascending, ties by idx.
        """
        if self.n == 0:
            return []
        if item_dist is None:
            item_dist = lambda i: _env_dist(self.boxes[i], x, y)
        heap: list = []
        seq = 0

        def push(dist, kind, ident):
            nonlocal seq
            heapq.heappush(heap, (dist, kind, seq, ident))
            seq += 1

        push(_env_dist(self.levels[0][0], x, y), 0, (0, 0))  # (depth, node)
        result: list = []
        worst = np.inf
        while heap:
            dist, kind, _, ident = heapq.heappop(heap)
            if len(result) >= k and dist > worst:
                break
            if kind == 1:  # item
                result.append((dist, ident))
                result.sort(key=lambda t: (t[0], t[1]))
                if len(result) > k:
                    result = result[:k]
                if len(result) >= k:
                    worst = result[-1][0]
                continue
            depth, node = ident
            if depth == len(self.levels) - 1:
                idx = int(self.item_order[node])
                push(float(item_dist(idx)), 1, idx)
                continue
            child_level = self.levels[depth + 1]
            s = node * self.cap
            e = min(s + self.cap, len(child_level))
            for c in range(s, e):
                push(_env_dist(child_level[c], x, y), 0, (depth + 1, c))
        return result[:k]


def _env_dist(box, x, y) -> float:
    dx = max(box[0] - x, 0.0, x - box[2])
    dy = max(box[1] - y, 0.0, y - box[3])
    return float(np.hypot(dx, dy))


class GridIndex:
    """Uniform-grid CSR bucket index over item envelopes.

    Fully-vectorized candidate generation for point probes: points map to
    grid cells with one floor-divide; candidate item lists come from CSR
    arrays.  This is the scale path of the broadcast PIP join — O(1) per
    probe irrespective of build-side size, no Python-level tree walk.
    """

    def __init__(self, boxes: np.ndarray, nx: int | None = None, ny: int | None = None):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        if self.n == 0:
            self.extent = (0.0, 0.0, 1.0, 1.0)
            self.nx = self.ny = 1
            self.indptr = np.zeros(2, dtype=np.int64)
            self.items = np.empty(0, dtype=np.int64)
            return
        minx = float(boxes[:, 0].min())
        miny = float(boxes[:, 1].min())
        maxx = float(boxes[:, 2].max())
        maxy = float(boxes[:, 3].max())
        if nx is None:
            # aim for ~1-4 items per bucket
            side = max(1, int(np.sqrt(self.n)))
            nx = ny = side
        self.nx, self.ny = int(nx), int(ny or nx)
        # pad extent slightly so max edge falls inside
        w = (maxx - minx) or 1.0
        h = (maxy - miny) or 1.0
        self.extent = (minx, miny, minx + w * (1 + 1e-12), miny + h * (1 + 1e-12))
        cx0, cy0, cx1, cy1 = self._cells_of_boxes(boxes)
        counts = np.zeros(self.nx * self.ny, dtype=np.int64)
        spans = []
        for i in range(self.n):
            xs = np.arange(cx0[i], cx1[i] + 1)
            ys = np.arange(cy0[i], cy1[i] + 1)
            gx, gy = np.meshgrid(xs, ys)
            cells = (gy.ravel() * self.nx + gx.ravel()).astype(np.int64)
            spans.append((cells, i))
            np.add.at(counts, cells, 1)
        self.indptr = np.zeros(self.nx * self.ny + 1, dtype=np.int64)
        np.cumsum(counts, out=self.indptr[1:])
        self.items = np.empty(int(self.indptr[-1]), dtype=np.int64)
        fill = self.indptr[:-1].copy()
        for cells, i in spans:
            for c in cells:
                self.items[fill[c]] = i
                fill[c] += 1

    def _cells_of_boxes(self, boxes):
        minx, miny, maxx, maxy = self.extent
        sx = (maxx - minx) / self.nx
        sy = (maxy - miny) / self.ny
        cx0 = np.clip(((boxes[:, 0] - minx) / sx).astype(np.int64), 0, self.nx - 1)
        cx1 = np.clip(((boxes[:, 2] - minx) / sx).astype(np.int64), 0, self.nx - 1)
        cy0 = np.clip(((boxes[:, 1] - miny) / sy).astype(np.int64), 0, self.ny - 1)
        cy1 = np.clip(((boxes[:, 3] - miny) / sy).astype(np.int64), 0, self.ny - 1)
        return cx0, cy0, cx1, cy1

    def point_cells(self, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
        minx, miny, maxx, maxy = self.extent
        sx = (maxx - minx) / self.nx
        sy = (maxy - miny) / self.ny
        cx = ((np.asarray(xs) - minx) / sx).astype(np.int64)
        cy = ((np.asarray(ys) - miny) / sy).astype(np.int64)
        oob = (cx < 0) | (cx >= self.nx) | (cy < 0) | (cy >= self.ny)
        cell = cy * self.nx + cx
        cell[oob] = -1
        return cell

    def query_points(self, xs: np.ndarray, ys: np.ndarray):
        """CSR candidate pairs for a batch of points.

        Returns (point_idx, item_idx) int64 arrays: every (point, item)
        whose bucket contains the point.  Callers apply the exact predicate
        (bbox + PIP) on the pairs.
        """
        cell = self.point_cells(xs, ys)
        valid = cell >= 0
        pi = np.nonzero(valid)[0]
        c = cell[valid]
        starts = self.indptr[c]
        ends = self.indptr[c + 1]
        counts = ends - starts
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        point_idx = np.repeat(pi, counts)
        # gather: for each pair, item = items[start_j + offset]
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        item_idx = self.items[np.repeat(starts, counts) + offs]
        return point_idx, item_idx

    def query_boxes(self, boxes: np.ndarray):
        """CSR candidate pairs for a batch of probe ENVELOPES.

        Returns (probe_idx, item_idx), deduplicated (an item bucketed in
        several cells of one probe's rectangle reports once).  Same
        vectorized ragged-gather shape as query_points; the per-probe
        cell rectangle is enumerated with the repeat/offset idiom."""
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        if self.n == 0 or not len(boxes):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        cx0, cy0, cx1, cy1 = self._cells_of_boxes(boxes)
        # probes entirely outside the extent still clamp into border cells;
        # the bbox test the caller applies rejects them
        ncell = ((cx1 - cx0 + 1) * (cy1 - cy0 + 1)).astype(np.int64)
        total = int(ncell.sum())
        pi = np.repeat(np.arange(len(boxes), dtype=np.int64), ncell)
        off = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(ncell) - ncell, ncell
        )
        w = np.repeat(cx1 - cx0 + 1, ncell)
        cell = (np.repeat(cy0, ncell) + off // w) * self.nx + (
            np.repeat(cx0, ncell) + off % w
        )
        starts = self.indptr[cell]
        counts = self.indptr[cell + 1] - starts
        tot2 = int(counts.sum())
        if tot2 == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        probe_idx = np.repeat(pi, counts)
        offs = np.arange(tot2, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        item_idx = self.items[np.repeat(starts, counts) + offs]
        pairs = np.unique(probe_idx * np.int64(self.n) + item_idx)
        return pairs // np.int64(self.n), pairs % np.int64(self.n)


class HPRtree:
    """Hilbert-packed R-tree (reference: Index/HPRtree/HPRtree.cs:40,388):
    items sorted by the Hilbert code of their envelope midpoint, packed
    bottom-up into fixed-fanout levels stored as flat numpy bound arrays
    — no node objects, cache-friendly, and query traversal is a fully
    VECTORIZED frontier expansion: a (probe, node) candidate-pair list
    descends one level per step with one bbox test + one repeat/gather.

    Role: build-side alternative to GridIndex for SKEWED item sets —
    a uniform grid degrades when most items pile into a few buckets,
    while Hilbert packing keeps node occupancy constant by construction.
    Same (probe_idx, item_idx) candidate-pair contract as GridIndex."""

    def __init__(self, boxes: np.ndarray, node_capacity: int = 16):
        from .hilbert import hilbert_encode

        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        self.cap = int(node_capacity)
        if self.n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.boxes = boxes
            self.levels = []
            return
        with np.errstate(invalid="ignore"):
            minx = float(np.nanmin(boxes[:, 0])) if not np.isnan(boxes[:, 0]).all() else 0.0
            miny = float(np.nanmin(boxes[:, 1])) if not np.isnan(boxes[:, 1]).all() else 0.0
            maxx = float(np.nanmax(boxes[:, 2])) if not np.isnan(boxes[:, 2]).all() else 1.0
            maxy = float(np.nanmax(boxes[:, 3])) if not np.isnan(boxes[:, 3]).all() else 1.0
        w = (maxx - minx) or 1.0
        h = (maxy - miny) or 1.0
        cx = np.nan_to_num((boxes[:, 0] + boxes[:, 2]) * 0.5, nan=minx)
        cy = np.nan_to_num((boxes[:, 1] + boxes[:, 3]) * 0.5, nan=miny)
        LEVEL = 16
        nside = np.int64(1) << np.int64(LEVEL)
        ix = np.clip(((cx - minx) / w * float(nside)).astype(np.int64), 0, nside - 1)
        iy = np.clip(((cy - miny) / h * float(nside)).astype(np.int64), 0, nside - 1)
        self.order = np.argsort(hilbert_encode(ix, iy, LEVEL), kind="stable")
        self.boxes = np.ascontiguousarray(boxes[self.order])
        # packed levels bottom-up: levels[0] groups cap leaves per node
        self.levels: list[np.ndarray] = []
        cur = self.boxes
        while len(cur) > 1:
            m = (len(cur) + self.cap - 1) // self.cap
            pad = m * self.cap - len(cur)
            if pad:
                filler = np.repeat(cur[-1:], pad, axis=0)
                cur = np.concatenate([cur, filler])
            g = cur.reshape(m, self.cap, 4)
            nodes = np.empty((m, 4), dtype=np.float64)
            # nan-aware: empty-geometry leaves carry NaN boxes and must
            # not poison their ancestors (they simply never match)
            with np.errstate(invalid="ignore"):
                nodes[:, 0] = np.nanmin(g[:, :, 0], axis=1)
                nodes[:, 1] = np.nanmin(g[:, :, 1], axis=1)
                nodes[:, 2] = np.nanmax(g[:, :, 2], axis=1)
                nodes[:, 3] = np.nanmax(g[:, :, 3], axis=1)
            self.levels.append(nodes)
            cur = nodes

    def query_boxes(self, qboxes: np.ndarray):
        """(probe_idx, item_idx) candidate pairs whose envelopes
        intersect — exact (bbox-tested at every level, no bucket
        slop), so callers may skip the post bbox filter."""
        qboxes = np.asarray(qboxes, dtype=np.float64).reshape(-1, 4)
        nq = len(qboxes)
        if self.n == 0 or nq == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        # frontier: (probe, node) pairs at the current level
        top = len(self.levels) - 1
        if top < 0:  # single item
            pi = np.arange(nq, dtype=np.int64)
            b = self.boxes[0]
            hit = (
                (qboxes[:, 0] <= b[2])
                & (qboxes[:, 2] >= b[0])
                & (qboxes[:, 1] <= b[3])
                & (qboxes[:, 3] >= b[1])
            )
            return pi[hit], np.full(int(hit.sum()), self.order[0], dtype=np.int64)
        probe = np.arange(nq, dtype=np.int64)
        node = np.zeros(nq, dtype=np.int64)
        # filter against the root level first
        for lvl in range(top, -1, -1):
            nb = self.levels[lvl]
            hit = (
                (qboxes[probe, 0] <= nb[node, 2])
                & (qboxes[probe, 2] >= nb[node, 0])
                & (qboxes[probe, 1] <= nb[node, 3])
                & (qboxes[probe, 3] >= nb[node, 1])
            )
            probe, node = probe[hit], node[hit]
            if not len(probe):
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
            # expand to children (next level down has cap children per node)
            child_count = len(self.levels[lvl - 1]) if lvl else len(self.boxes)
            first = node * self.cap
            cnt = np.minimum(self.cap, np.maximum(0, child_count - first))
            probe = np.repeat(probe, cnt)
            off = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
                np.cumsum(cnt) - cnt, cnt
            )
            node = np.repeat(first, cnt) + off
        # leaf level: exact bbox test
        hit = (
            (qboxes[probe, 0] <= self.boxes[node, 2])
            & (qboxes[probe, 2] >= self.boxes[node, 0])
            & (qboxes[probe, 1] <= self.boxes[node, 3])
            & (qboxes[probe, 3] >= self.boxes[node, 1])
        )
        return probe[hit], self.order[node[hit]]

    def query_points(self, xs: np.ndarray, ys: np.ndarray):
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        q = np.column_stack([xs, ys, xs, ys])
        return self.query_boxes(q)
