"""Distributed polygonize with tile-boundary stitching.

The reference polygonizes a layer in one address space
(reference: Operation/Polygonize/Polygonizer.cs:35 — collect the noded
linework, walk every face).  At 100 TB the linework doesn't fit one
process, so this stage splits the face walk into three Ray Data phases
that together reproduce the in-process kernel's output exactly
(asserted against `geom.construct.polygonize` in tests):

1. **Tile-local walk** — segments are replicated to every grid cell
   their envelope intersects and each cell walks its local graph with
   the SAME shared tracer the kernel uses (`geom.overlay._trace_rings`).
   A minimal ring is *final* iff every vertex lies strictly inside the
   cell: a strictly-interior vertex has its complete global edge star
   in the cell (any global edge incident to it intersects the cell), so
   the local sharpest-left walk equals the global one.  Final rings are
   consumed atomically (their half-edges never travel further); CCW
   rings become shell candidates, CW rings hole candidates.  The bulk
   of a real layer (parcels, city blocks) finalizes here,
   embarrassingly parallel.
2. **Hierarchical boundary stitch** — the unconsumed half-edges (each
   emitted once, by the cell owning the segment midpoint) are exactly
   the half-edges of faces that cross tile boundaries.  They escalate
   through geometrically larger super-cells (cell × K per level, K=8):
   each level replicates residual edges to the super-cells their
   envelope intersects and re-runs the SAME walk with the SAME
   finality rule (ring final iff every vertex strictly interior), the
   last level walking whatever remains as one group.  Why each level
   is exact: the sharpest-left successor relation is a permutation of
   half-edges whose cycles are the faces, rings are only ever consumed
   as whole cycles, so the global successor of a residual edge is
   itself residual — and since sharpest-left is a max over outgoing
   candidates, the max over the residual subset (which contains the
   global max) IS the global max.  Dangle pruning stays exact across
   the split: a level prunes degree-1 vertices only when strictly
   interior (complete residual star ⇒ global residual degree) and not
   *anchored* (vertices an earlier level saw on a consumed ring —
   their global degree exceeds their residual degree).  A not-anchored
   strictly-interior degree-1 vertex has global degree 1 — the kernel
   prunes it too; protected chains escalate as residue and cascade-prune
   from their unprotected free end at a later level, exactly as the
   kernel's global iterative prune does.
   Level count is log_K(extent / cell) — computed once from a tiny
   min/max aggregate over the residue, each level ONE shuffle, no
   iterative label propagation.
3. **Hole assignment** — shells and holes from both phases meet in a
   cell-keyed exchange (shells replicated by envelope, each hole routed
   by one of its vertices — any shell containing the hole contains that
   vertex): per cell the kernel's own rule runs (smallest shell
   containing a probe point of the hole ring, `_ring_probe_not_on` +
   ray-crossing locate), then a global min per hole picks the smallest
   across cells, ties to the lexicographically smallest shell key.
   Holes with no containing shell (the outer boundary of every cluster)
   drop — same as the kernel.

Partitioning assumptions (document per the Ray-first contract): one
CELL's linework fits a task in phase 1, one SUPER-CELL's residue fits a
task at each stitch level — residue shrinks ~K× per level (perimeter
scaling), so the last level's whole-residue walk is tiny.  Pick `cell`
so tile interiors do the bulk of the work.  Input must be noded (shared
endpoints), the same contract as the reference Polygonizer.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


from ..geom import algorithms as alg
from ..geom.overlay import (
    _area_resolution,
    _ring_probe_not_on,
    _split_minimal_rings_indexed,
    _succ_orbits,
)
from ..geom.types import Geom, LINESTRING, POLYGON
from ..geom.wkb import from_wkb, to_wkb

KIND_SHELL = 0
KIND_HOLE = 1
KIND_RESID = 2
KIND_ANCHOR = 3

_CELL_BIAS = np.int64(1) << np.int64(30)  # cells within ±1.07e9 per axis


def _pack_cell(cx, cy):
    # 31 bits per axis in one int64 (2*31 + sign = 63).  The previous
    # 21-bit packing silently corrupted cell keys for |cell index| > 1M
    # — reachable for fine cells far from the origin (found by the r4
    # topo fuzz at a 1e7 coordinate frame with cell=2) — so out-of-range
    # indices now fail loudly instead.
    bx = cx + _CELL_BIAS
    by = cy + _CELL_BIAS
    lim = np.int64(1) << np.int64(31)
    if np.any(bx < 0) or np.any(bx >= lim) or np.any(by < 0) or np.any(by >= lim):
        raise ValueError(
            "cell index beyond +-2^30: re-center with origin= near the "
            "data, or use a coarser cell size"
        )
    return (by << np.int64(31)) | bx


def _unpack_cell(cell_id: int):
    cx = (cell_id & ((1 << 31) - 1)) - int(_CELL_BIAS)
    cy = (cell_id >> 31) - int(_CELL_BIAS)
    return cx, cy


def segments_wkb_batch(batch: pa.Table, wkb_col: str = "wkb") -> pa.Table:
    """Explode linework WKB into canonical undirected segments
    (p0 < p1 lexicographically), deduplicated within the batch."""
    from ..geom.wkb import decode_column

    seen = set()
    for g in decode_column(batch[wkb_col]):  # vectorized ragged decode
        if g is None:
            continue
        for comp in g.flatten():
            for arr in comp.coords_list():
                for i in range(len(arr) - 1):
                    p0 = (float(arr[i, 0]), float(arr[i, 1]))
                    p1 = (float(arr[i + 1, 0]), float(arr[i + 1, 1]))
                    if p0 == p1:
                        continue
                    seen.add((min(p0, p1), max(p0, p1)))
    segs = sorted(seen)
    return pa.table(
        {
            "x0": pa.array([s[0][0] for s in segs], type=pa.float64()),
            "y0": pa.array([s[0][1] for s in segs], type=pa.float64()),
            "x1": pa.array([s[1][0] for s in segs], type=pa.float64()),
            "y1": pa.array([s[1][1] for s in segs], type=pa.float64()),
        }
    )


def _replicate_to_cells(batch: pa.Table, cell: float, ox: float, oy: float) -> pa.Table:
    """One output row per (segment, grid cell its envelope intersects)."""
    x0 = batch["x0"].to_numpy(zero_copy_only=False)
    y0 = batch["y0"].to_numpy(zero_copy_only=False)
    x1 = batch["x1"].to_numpy(zero_copy_only=False)
    y1 = batch["y1"].to_numpy(zero_copy_only=False)
    cx0 = np.floor((np.minimum(x0, x1) - ox) / cell).astype(np.int64)
    cx1 = np.floor((np.maximum(x0, x1) - ox) / cell).astype(np.int64)
    cy0 = np.floor((np.minimum(y0, y1) - oy) / cell).astype(np.int64)
    cy1 = np.floor((np.maximum(y0, y1) - oy) / cell).astype(np.int64)
    span = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
    out_cell, oi = [], []
    one = span == 1
    if one.any():
        out_cell.append(_pack_cell(cx0[one], cy0[one]))
        oi.append(np.nonzero(one)[0])
    for i in np.nonzero(~one)[0]:  # rare: multi-cell segments
        for cy in range(cy0[i], cy1[i] + 1):
            for cx in range(cx0[i], cx1[i] + 1):
                out_cell.append(np.array([_pack_cell(np.int64(cx), np.int64(cy))]))
                oi.append(np.array([i]))
    cells = np.concatenate(out_cell) if out_cell else np.empty(0, dtype=np.int64)
    idx = np.concatenate(oi) if oi else np.empty(0, dtype=np.int64)
    return pa.table(
        {
            "cell": pa.array(cells, type=pa.int64()),
            "x0": pa.array(x0[idx]),
            "y0": pa.array(y0[idx]),
            "x1": pa.array(x1[idx]),
            "y1": pa.array(y1[idx]),
        }
    )


def _ring_wkb(ring: np.ndarray) -> bytes:
    return to_wkb(Geom(LINESTRING, np.asarray(ring, dtype=np.float64)))


_OUT_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),
        ("wkb", pa.binary()),
        ("x0", pa.float64()),
        ("y0", pa.float64()),
        ("x1", pa.float64()),
        ("y1", pa.float64()),
    ]
)


def _rows_table(rows) -> pa.Table:
    return pa.Table.from_pylist(
        [
            {"kind": k, "wkb": w, "x0": a, "y0": b, "x1": c, "y1": d}
            for (k, w, a, b, c, d) in rows
        ],
        schema=_OUT_SCHEMA,
    ) if rows else _OUT_SCHEMA.empty_table()


def _walk_group(directed, anchors, interior, final, emit_residue):
    """Shared per-group face walk: prune provable dangles, take the
    pure-permutation orbits, consume those whose vertices are all
    strictly interior (every orbit, when `final`) by splitting them into
    minimal rings exactly as the kernel does
    (`overlay._split_minimal_rings_indexed`), and escalate the rest.
    `emit_residue(p0, p1)` says whether this group owns an unconsumed
    half-edge (midpoint rule).  Returns _OUT_SCHEMA rows."""
    segs = {(min(p0, p1), max(p0, p1)) for p0, p1 in directed}
    segs = _prune_dangles(segs, lambda p: (p in anchors) or not interior(p))
    avail = sorted({e for e in directed if (min(e), max(e)) in segs})
    rows = []
    new_anchors: set = set()
    consumed = np.zeros(len(avail), dtype=bool)
    for orbit in _succ_orbits(avail):
        verts = [avail[e][0] for e in orbit]
        if not final and not all(interior(p) for p in verts):
            continue
        consumed[orbit] = True
        new_anchors.update(verts)
        ring = verts + [verts[0]]
        for sub_v, _sub_e in _split_minimal_rings_indexed(ring, None):
            arr = np.array(sub_v, dtype=np.float64)
            sa = alg.ring_signed_area(arr)
            if abs(sa) <= _area_resolution(arr):
                # noise-floor sub-rings (1-ulp twin-node slivers):
                # consumed, emit nothing — same rule as the in-process
                # kernel's _assemble_polygons
                continue
            if sa > 0:
                rows.append((KIND_SHELL, _ring_wkb(arr), None, None, None, None))
            else:
                rows.append((KIND_HOLE, _ring_wkb(arr), None, None, None, None))
    if not final:
        for i, (p0, p1) in enumerate(avail):
            if not consumed[i] and emit_residue(p0, p1):
                rows.append((KIND_RESID, None, p0[0], p0[1], p1[0], p1[1]))
        # an anchor matters later only while residual edges still touch
        # it, and every edge incident to a vertex is replicated to the
        # vertex's floor cell — so filtering against this group's
        # surviving endpoints bounds anchor escalation
        live = {
            p for i, e in enumerate(avail) if not consumed[i] for p in e
        }
        for ax, ay in sorted((anchors | new_anchors) & live):
            rows.append((KIND_ANCHOR, None, ax, ay, None, None))
    return _rows_table(rows)


def _prune_dangles(segs: set, protected) -> set:
    """Iteratively drop segments with a degree-1 endpoint, except when
    that endpoint is protected (incomplete local star / anchored)."""
    segs = set(segs)
    while True:
        deg: dict = {}
        for p0, p1 in segs:
            deg[p0] = deg.get(p0, 0) + 1
            deg[p1] = deg.get(p1, 0) + 1
        drop = [
            e
            for e in segs
            if (deg[e[0]] == 1 and not protected(e[0]))
            or (deg[e[1]] == 1 and not protected(e[1]))
        ]
        if not drop:
            return segs
        segs.difference_update(drop)


def _local_cell_polygonize(t: pa.Table, *, cell: float, ox: float, oy: float) -> pa.Table:
    cell_id = int(t["cell"][0].as_py())
    cx, cy = _unpack_cell(cell_id)
    lo_x, hi_x = ox + cx * cell, ox + (cx + 1) * cell
    lo_y, hi_y = oy + cy * cell, oy + (cy + 1) * cell

    def interior(p) -> bool:
        return lo_x < p[0] < hi_x and lo_y < p[1] < hi_y

    def owns(p0, p1) -> bool:
        mx, my = (p0[0] + p1[0]) / 2.0, (p0[1] + p1[1]) / 2.0
        return (
            int(np.floor((mx - ox) / cell)) == cx
            and int(np.floor((my - oy) / cell)) == cy
        )

    segs = {
        ((float(a), float(b)), (float(c), float(d)))
        for a, b, c, d in zip(
            t["x0"].to_pylist(), t["y0"].to_pylist(), t["x1"].to_pylist(), t["y1"].to_pylist()
        )
    }
    directed = [(p0, p1) for p0, p1 in segs] + [(p1, p0) for p0, p1 in segs]
    return _walk_group(directed, set(), interior, False, owns)


def _stitch_cell(
    t: pa.Table, *, cell: float, ox: float, oy: float, final: bool
) -> pa.Table:
    """One stitch level over residual half-edges + anchors in one
    (super-)cell group: prune provable dangles (degree-1 endpoint that
    is strictly interior and not anchored ⇒ global degree 1), consume
    pure-permutation orbits whose vertices are all strictly interior
    (every orbit, when `final`), escalate the rest as residue+anchors.
    A consumed edge's midpoint is always interior to its consumer, so
    midpoint ownership and consumption agree across replicas."""
    anchors = set()
    directed = []
    for k, a, b, c, d in zip(
        t["kind"].to_pylist(),
        t["x0"].to_pylist(),
        t["y0"].to_pylist(),
        t["x1"].to_pylist(),
        t["y1"].to_pylist(),
    ):
        if k == KIND_ANCHOR:
            anchors.add((float(a), float(b)))
        elif k == KIND_RESID:
            directed.append(((float(a), float(b)), (float(c), float(d))))
    if final:
        def interior(p) -> bool:
            return True

        def owns(p0, p1) -> bool:
            return True
    else:
        cell_id = int(t["cell"][0].as_py())
        cx, cy = _unpack_cell(cell_id)
        lo_x, hi_x = ox + cx * cell, ox + (cx + 1) * cell
        lo_y, hi_y = oy + cy * cell, oy + (cy + 1) * cell

        def interior(p) -> bool:
            return lo_x < p[0] < hi_x and lo_y < p[1] < hi_y

        def owns(p0, p1) -> bool:
            mx, my = (p0[0] + p1[0]) / 2.0, (p0[1] + p1[1]) / 2.0
            return (
                int(np.floor((mx - ox) / cell)) == cx
                and int(np.floor((my - oy) / cell)) == cy
            )

    return _walk_group(directed, anchors, interior, final, owns)


def _route_stitch(batch: pa.Table, cell: float, ox: float, oy: float) -> pa.Table:
    """Route escalating rows to super-cells of size `cell`: residual
    half-edges replicate to every cell their envelope intersects (so a
    strictly-interior vertex has its complete residual star present),
    anchors go to their floor cell (every edge incident to a vertex is
    replicated to the vertex's floor cell, so that is where the anchor
    is consulted)."""
    kinds = batch["kind"].to_numpy(zero_copy_only=False)
    x0 = batch["x0"].to_numpy(zero_copy_only=False)
    y0 = batch["y0"].to_numpy(zero_copy_only=False)
    x1 = batch["x1"].to_numpy(zero_copy_only=False)
    y1 = batch["y1"].to_numpy(zero_copy_only=False)
    is_edge = kinds == KIND_RESID
    ex1 = np.where(is_edge, x1, x0)  # anchor envelope = its point
    ey1 = np.where(is_edge, y1, y0)
    cx0 = np.floor((np.minimum(x0, ex1) - ox) / cell).astype(np.int64)
    cx1 = np.floor((np.maximum(x0, ex1) - ox) / cell).astype(np.int64)
    cy0 = np.floor((np.minimum(y0, ey1) - oy) / cell).astype(np.int64)
    cy1 = np.floor((np.maximum(y0, ey1) - oy) / cell).astype(np.int64)
    span = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
    out_cell, oi = [], []
    one = span == 1
    if one.any():
        out_cell.append(_pack_cell(cx0[one], cy0[one]))
        oi.append(np.nonzero(one)[0])
    for i in np.nonzero(~one)[0]:  # rare: edges spanning multiple cells
        for cy in range(cy0[i], cy1[i] + 1):
            for cx in range(cx0[i], cx1[i] + 1):
                out_cell.append(np.array([_pack_cell(np.int64(cx), np.int64(cy))]))
                oi.append(np.array([i]))
    cells = np.concatenate(out_cell) if out_cell else np.empty(0, dtype=np.int64)
    idx = (
        np.concatenate(oi).astype(np.int64) if oi else np.empty(0, dtype=np.int64)
    )
    return pa.table(
        {
            "cell": pa.array(cells, type=pa.int64()),
            "kind": pa.array(kinds[idx], type=pa.int8()),
            "x0": pa.array(x0[idx]),
            "y0": pa.array(y0[idx]),
            "x1": pa.array(x1[idx]),
            "y1": pa.array(y1[idx]),
        }
    )


def _ring_key(wkb: bytes) -> str:
    return hashlib.md5(wkb).hexdigest()


def distributed_polygonize(
    ds,
    wkb_col: str = "wkb",
    cell: float = 1.0,
    origin=(0.0, 0.0),
    num_partitions: int = 16,
):
    """Polygonize a Dataset of noded linework WKB into a Dataset with one
    `face_wkb` polygon per face — see module docstring for the 3-phase
    plan and its partitioning assumptions."""
    import ray.data  # noqa: F401  (Dataset ops)

    ox, oy = float(origin[0]), float(origin[1])

    staged = (
        ds.map_batches(
            lambda b: segments_wkb_batch(b, wkb_col), batch_format="pyarrow"
        )
        .map_batches(
            lambda b: _replicate_to_cells(b, cell, ox, oy), batch_format="pyarrow"
        )
        .groupby("cell")
        .map_groups(
            lambda g: _local_cell_polygonize(g, cell=cell, ox=ox, oy=oy),
            batch_format="pyarrow",
        )
        .materialize()  # faces + boundary residue: output-scale, consumed
        # by three branches below (recompute would re-walk every tile)
    )

    resid = staged.filter(expr="kind == 2")
    anchors = staged.filter(expr="kind == 3")
    ring_src = staged.filter(expr="kind == 0 or kind == 1")

    # ---- phase 2: hierarchical boundary stitch ---------------------------
    # escalate residue through super-cells of size cell * K^level; each
    # level is ONE shuffle and shrinks the residue ~K× (perimeter
    # scaling).  The level count is log_K(extent / cell), known UP FRONT
    # from one tiny min/max aggregate over the (materialized,
    # residue-scale) phase-1 output — so the whole ladder is built as one
    # lazy pipeline with NO per-level materialize()/count() driver
    # barriers (the r4 fixed 5-8 s stitch latency floor, and a full
    # cluster round-trip per level on a real deployment).  Rings closed
    # at intermediate levels ride along as pass-through rows in hashed
    # "done" buckets (negative cell ids) instead of forking the stream
    # into per-level filter/union branches.
    if resid.count() > 0:
        from ray.data.aggregate import Max, Min

        ext = resid.aggregate(
            Min("x0"), Max("x0"), Min("x1"), Max("x1"),
            Min("y0"), Max("y0"), Min("y1"), Max("y1"),
        )
        minx = min(ext["min(x0)"], ext["min(x1)"])
        maxx = max(ext["max(x0)"], ext["max(x1)"])
        miny = min(ext["min(y0)"], ext["min(y1)"])
        maxy = max(ext["max(y0)"], ext["max(y1)"])
        K = 8.0
        span = max(maxx - minx, maxy - miny)
        levels = []
        lc = float(cell)
        while lc * K <= span:
            lc *= K
            levels.append(lc)
        final_cell = (levels[-1] if levels else float(cell)) * K

        def route_mixed(batch: pa.Table, lc: float | None) -> pa.Table:
            """Route kinds 2/3 to super-cells of size lc (or to ONE cell
            when lc is None: the final whole-extent walk); finished rings
            (kinds 0/1) to deterministic hashed done-buckets."""
            kinds = batch["kind"].to_numpy(zero_copy_only=False)
            live = (kinds == KIND_RESID) | (kinds == KIND_ANCHOR)
            parts = []
            if live.any():
                sub = batch.filter(pa.array(live))
                if lc is None:
                    routed = sub.add_column(
                        0, "cell", pa.array(np.zeros(len(sub), dtype=np.int64))
                    )
                else:
                    routed = _route_stitch(sub, lc, ox, oy)
                parts.append(routed)
            if not live.all():
                done = batch.filter(pa.array(~live))
                cells = np.fromiter(
                    (
                        -1
                        - (
                            int.from_bytes(
                                hashlib.md5(w.as_py()).digest()[:4], "little"
                            )
                            % 64
                        )
                        for w in done["wkb"]
                    ),
                    dtype=np.int64,
                    count=len(done),
                )
                parts.append(done.add_column(0, "cell", pa.array(cells)))
            if not parts:
                return _OUT_SCHEMA.empty_table().add_column(
                    0, "cell", pa.array([], type=pa.int64())
                )
            return pa.concat_tables(parts, promote_options="default")

        def stitch_or_pass(g: pa.Table, lc: float | None) -> pa.Table:
            if int(g["cell"][0].as_py()) < 0:  # done-bucket: rings pass through
                return g.drop_columns(["cell"])
            if lc is None:
                return _stitch_cell(g, cell=final_cell, ox=ox, oy=oy, final=True)
            return _stitch_cell(g, cell=lc, ox=ox, oy=oy, final=False)

        cur = resid.union(anchors)
        for lc in levels + [None]:
            cur = (
                cur.map_batches(
                    lambda b, _c=lc: route_mixed(b, _c), batch_format="pyarrow"
                )
                .groupby("cell")
                .map_groups(
                    lambda g, _c=lc: stitch_or_pass(g, _c), batch_format="pyarrow"
                )
                # lazy (no driver sync): map_groups emits one tiny block per
                # group; unbounded block counts make every later sort pay
                # O(blocks²) scheduling, which was the post-de-barrier floor
                .repartition(max(1, int(num_partitions)))
            )
        ring_src = ring_src.union(cur)

    # ---- phase 3: hole assignment ---------------------------------------
    def keyed_rings(batch: pa.Table) -> pa.Table:
        kinds, wkbs = batch["kind"].to_pylist(), batch["wkb"].to_pylist()
        rows = []
        for k, w in zip(kinds, wkbs):
            ring = from_wkb(w).data
            key = _ring_key(w)
            if k == KIND_SHELL:
                area = abs(alg.ring_signed_area(ring))
                mnx, mny = float(ring[:, 0].min()), float(ring[:, 1].min())
                mxx, mxy = float(ring[:, 0].max()), float(ring[:, 1].max())
                cx0 = int(np.floor((mnx - ox) / cell))
                cx1 = int(np.floor((mxx - ox) / cell))
                cy0 = int(np.floor((mny - oy) / cell))
                cy1 = int(np.floor((mxy - oy) / cell))
                for cyy in range(cy0, cy1 + 1):
                    for cxx in range(cx0, cx1 + 1):
                        rows.append(
                            {
                                "cell": int(_pack_cell(np.int64(cxx), np.int64(cyy))),
                                "kind": int(KIND_SHELL),
                                "key": key,
                                "wkb": w,
                                "area": area,
                                # exactly one replica (the min-corner cell)
                                # represents the shell in the output — marked
                                # HERE so downstream never re-decodes wkb to
                                # recompute the owner per replica
                                "own": cxx == cx0 and cyy == cy0,
                            }
                        )
            else:
                cxx = int(np.floor((float(ring[0, 0]) - ox) / cell))
                cyy = int(np.floor((float(ring[0, 1]) - oy) / cell))
                rows.append(
                    {
                        "cell": int(_pack_cell(np.int64(cxx), np.int64(cyy))),
                        "kind": int(KIND_HOLE),
                        "key": key,
                        "wkb": w,
                        "area": 0.0,
                        "own": True,
                    }
                )
        schema = pa.schema(
            [
                ("cell", pa.int64()),
                ("kind", pa.int8()),
                ("key", pa.string()),
                ("wkb", pa.binary()),
                ("area", pa.float64()),
                ("own", pa.bool_()),
            ]
        )
        return pa.Table.from_pylist(rows, schema=schema) if rows else schema.empty_table()

    ringed = (
        ring_src.map_batches(keyed_rings, batch_format="pyarrow")
        # ring_src is a union of per-level branches — hundreds of tiny
        # blocks; a groupby-sort over B blocks does an O(B²) exchange,
        # so bound B first (same pathology as unbounded label-propagation
        # rounds)
        .repartition(max(1, int(num_partitions)))
        .materialize()
    )

    def _ring_edges_set(ring) -> set:
        out = set()
        for i in range(len(ring) - 1):
            a = (float(ring[i, 0]), float(ring[i, 1]))
            b = (float(ring[i + 1, 0]), float(ring[i + 1, 1]))
            out.add((min(a, b), max(a, b)))
        return out

    def cell_candidates(g: pa.Table) -> pa.Table:
        kinds = g["kind"].to_pylist()
        shells = []
        for i in range(len(g)):
            if kinds[i] == KIND_SHELL:
                sring = from_wkb(g["wkb"][i].as_py()).data
                shells.append(
                    (
                        g["key"][i].as_py(),
                        sring,
                        g["area"][i].as_py(),
                        _ring_edges_set(sring),
                    )
                )
        rows = []
        for i in range(len(g)):
            if kinds[i] != KIND_HOLE:
                continue
            hkey = g["key"][i].as_py()
            hw = g["wkb"][i].as_py()
            hring = from_wkb(hw).data
            hedges = _ring_edges_set(hring)
            for skey, sring, sarea, sedges in shells:
                if hedges & sedges:
                    # a hole never shares an EDGE with its containing
                    # shell (minimal rings touch at most at vertices) —
                    # sharing means adjacency, and in particular a CW
                    # ring must not land inside its own CCW twin via a
                    # float-rounded edge-midpoint probe that falls a ULP
                    # interior
                    continue
                probe = _ring_probe_not_on(hring, sring)
                if probe is None:
                    continue
                if alg.locate_point_in_rings(probe[0], probe[1], [sring]) == alg.INTERIOR:
                    rows.append(
                        {"hkey": hkey, "skey": skey, "area": float(sarea), "hwkb": hw}
                    )
        schema = pa.schema(
            [
                ("hkey", pa.string()),
                ("skey", pa.string()),
                ("area", pa.float64()),
                ("hwkb", pa.binary()),
            ]
        )
        return pa.Table.from_pylist(rows, schema=schema) if rows else schema.empty_table()

    cands = ringed.groupby("cell").map_groups(cell_candidates, batch_format="pyarrow")

    # one-row-per-group map_groups is pathological in Ray Data (one
    # Python call + table slice per group); bucket by key hash and do a
    # vectorized per-bucket reduction instead
    P = max(1, int(num_partitions))

    def _hash_key_col(t: pa.Table, col: str) -> pa.Table:
        h = np.array(
            [int(k[:15], 16) % P for k in t[col].to_pylist()], dtype=np.int64
        )
        return t.append_column("_h", pa.array(h))

    def pick_min_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.to_pandas().sort_values(["hkey", "area", "skey"], kind="mergesort")
        first = df.groupby("hkey", sort=False).head(1)
        return pa.table(
            {
                "skey": pa.array(first["skey"].tolist(), type=pa.string()),
                "hwkb": pa.array(first["hwkb"].tolist(), type=pa.binary()),
            }
        )

    assigned = (
        cands.map_batches(lambda t: _hash_key_col(t, "hkey"), batch_format="pyarrow")
        .groupby("_h")
        .map_groups(pick_min_bucket, batch_format="pyarrow")
    )

    def shell_rows(batch: pa.Table) -> pa.Table:
        # one row per shell: the min-corner replica was marked `own`
        # at replication time (no wkb re-decode here)
        b = batch.filter(
            pa.compute.and_(
                pa.compute.equal(batch["kind"], KIND_SHELL), batch["own"]
            )
        )
        return pa.table(
            {
                "skey": b["key"],
                "part": pa.array(np.zeros(len(b), dtype=np.int8)),
                "wkb": b["wkb"],
            }
        )

    def hole_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "skey": batch["skey"],
                "part": pa.array(np.ones(len(batch), dtype=np.int8)),
                "wkb": batch["hwkb"],
            }
        )

    merged = ringed.map_batches(shell_rows, batch_format="pyarrow").union(
        assigned.map_batches(hole_rows, batch_format="pyarrow")
    )

    def build_faces_bucket(g: pa.Table) -> pa.Table:
        shells: dict = {}
        holes: dict = {}
        for k, p, w in zip(
            g["skey"].to_pylist(), g["part"].to_pylist(), g["wkb"].to_pylist()
        ):
            if p == 0:
                shells[k] = w
            else:
                holes.setdefault(k, []).append(w)
        faces = []
        for k in sorted(shells):
            shell = from_wkb(shells[k]).data
            hs = sorted(holes.get(k, []))
            face = Geom(POLYGON, [shell] + [from_wkb(w).data for w in hs])
            faces.append(to_wkb(face))
        return pa.table({"face_wkb": pa.array(faces, type=pa.binary())})

    return (
        merged.map_batches(lambda t: _hash_key_col(t, "skey"), batch_format="pyarrow")
        .groupby("_h")
        .map_groups(build_faces_bucket, batch_format="pyarrow")
    )
