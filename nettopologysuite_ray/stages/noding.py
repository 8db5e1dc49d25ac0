"""Distributed bulk noding of a whole layer's linework.

The reference nodes a layer inside one process (reference:
Noding/MCIndexNoder.cs:21 — monotone-chain candidate search, robust
intersection, split segments; SnapRoundingNoder for fixed precision).
At 100 TB the layer doesn't fit, so this stage distributes the same
semantics in TWO exchanges with NO boundary-stitch pass at all:

1. **Cell-local intersection search** — canonical segments replicate to
   every grid cell their envelope intersects.  Any two intersecting
   segments have intersecting envelopes, and every point of
   envelope(a) ∩ envelope(b) lies in some cell that BOTH segments are
   replicated to — so every intersection is discovered by at least one
   cell, locally.  Cells emit (segment, split-point) rows (duplicated
   discoveries collapse later); the cell owning a segment's midpoint
   also emits its base row so intersection-free segments survive.
2. **Per-segment re-split** — group by segment, merge the distinct
   split points, order them along the segment, emit the noded
   sub-segments (canonical; deduplicated within each parent segment and
   across identical parents — two collinear parents that only PARTLY
   overlap can both emit the shared piece, exactly as the reference's
   noders do; LineDissolver semantics, not noding, remove those).

Collinear overlaps split at the shared interval's endpoints, single
crossings at the intersection point, exactly as the kernel's
RobustLineIntersector classification (`geom.algorithms
.segment_intersection`, exact-orientation fallback included).

Partitioning assumption: one cell's segments fit a task (the per-cell
search is envelope-prefiltered O(k²) over the cell's k segments — pick
`cell` near the median segment length, as the reference's MC index does
implicitly via chain extents).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import algorithms as alg
from ..geom.types import Geom, LINESTRING
from ..geom.wkb import to_wkb
from .polygonize import (
    _pack_cell,
    _replicate_to_cells,
    _unpack_cell,
    segments_wkb_batch,
)

_NODE_SCHEMA = pa.schema(
    [
        ("skey", pa.int64()),
        ("x0", pa.float64()),
        ("y0", pa.float64()),
        ("x1", pa.float64()),
        ("y1", pa.float64()),
        ("px", pa.float64()),
        ("py", pa.float64()),
        ("has_pt", pa.bool_()),
    ]
)


def _seg_key(x0, y0, x1, y1) -> np.ndarray:
    """int64 mixing key per canonical segment — collisions only co-group
    unrelated segments; the re-split stage separates them by coords."""
    h = np.uint64(0xCBF29CE484222325) * np.ones(len(x0), dtype=np.uint64)
    for v in (x0, y0, x1, y1):
        b = np.ascontiguousarray(v + 0.0, dtype=np.float64).view(np.uint64)
        h = (h ^ b) * np.uint64(0x100000001B3)
    return h.view(np.int64)


def _cell_node(t: pa.Table, *, cell: float, ox: float, oy: float) -> pa.Table:
    cell_id = int(t["cell"][0].as_py())
    cx, cy = _unpack_cell(cell_id)
    segs = sorted(
        {
            ((float(a), float(b)), (float(c), float(d)))
            for a, b, c, d in zip(
                t["x0"].to_pylist(),
                t["y0"].to_pylist(),
                t["x1"].to_pylist(),
                t["y1"].to_pylist(),
            )
        }
    )
    n = len(segs)
    p0 = np.array([s[0] for s in segs], dtype=np.float64).reshape(n, 2)
    p1 = np.array([s[1] for s in segs], dtype=np.float64).reshape(n, 2)
    lo = np.minimum(p0, p1)
    hi = np.maximum(p0, p1)
    rows = []

    def emit(i, pt):
        # interior split points only: endpoints don't split
        if pt != segs[i][0] and pt != segs[i][1]:
            rows.append((segs[i], pt))

    # envelope-prefiltered pair search (numpy broadcast, then the robust
    # kernel only on surviving pairs)
    for i in range(n):
        ok = ~(
            (hi[i + 1 :, 0] < lo[i, 0])
            | (lo[i + 1 :, 0] > hi[i, 0])
            | (hi[i + 1 :, 1] < lo[i, 1])
            | (lo[i + 1 :, 1] > hi[i, 1])
        )
        for j in (np.nonzero(ok)[0] + i + 1).tolist():
            kind, pts = alg.segment_intersection(
                segs[i][0], segs[i][1], segs[j][0], segs[j][1]
            )
            if kind == "none":
                continue
            for pt in pts:
                pt = (float(pt[0]), float(pt[1]))
                emit(i, pt)
                emit(j, pt)
    # base rows from the midpoint owner keep intersection-free segments
    mx = (p0[:, 0] + p1[:, 0]) / 2.0
    my = (p0[:, 1] + p1[:, 1]) / 2.0
    owned = (np.floor((mx - ox) / cell).astype(np.int64) == cx) & (
        np.floor((my - oy) / cell).astype(np.int64) == cy
    )
    out = {k: [] for k in ("x0", "y0", "x1", "y1", "px", "py", "has_pt")}
    for (s0, s1), pt in rows:
        out["x0"].append(s0[0]); out["y0"].append(s0[1])
        out["x1"].append(s1[0]); out["y1"].append(s1[1])
        out["px"].append(pt[0]); out["py"].append(pt[1])
        out["has_pt"].append(True)
    for i in np.nonzero(owned)[0].tolist():
        out["x0"].append(segs[i][0][0]); out["y0"].append(segs[i][0][1])
        out["x1"].append(segs[i][1][0]); out["y1"].append(segs[i][1][1])
        out["px"].append(0.0); out["py"].append(0.0)
        out["has_pt"].append(False)
    x0 = np.array(out["x0"]); y0 = np.array(out["y0"])
    x1 = np.array(out["x1"]); y1 = np.array(out["y1"])
    return pa.table(
        {
            "skey": pa.array(
                _seg_key(x0, y0, x1, y1) if len(x0) else np.empty(0, np.int64)
            ),
            "x0": pa.array(x0), "y0": pa.array(y0),
            "x1": pa.array(x1), "y1": pa.array(y1),
            "px": pa.array(np.array(out["px"])),
            "py": pa.array(np.array(out["py"])),
            "has_pt": pa.array(np.array(out["has_pt"], dtype=bool)),
        },
        schema=_NODE_SCHEMA,
    )


def _resplit(g: pa.Table) -> pa.Table:
    by_seg: dict = {}
    for a, b, c, d, px, py, hp in zip(
        g["x0"].to_pylist(), g["y0"].to_pylist(),
        g["x1"].to_pylist(), g["y1"].to_pylist(),
        g["px"].to_pylist(), g["py"].to_pylist(), g["has_pt"].to_pylist(),
    ):
        key = ((a, b), (c, d))
        pts = by_seg.setdefault(key, set())
        if hp:
            pts.add((px, py))
    out = {"x0": [], "y0": [], "x1": [], "y1": []}
    seen = set()
    for (s0, s1), pts in sorted(by_seg.items()):
        dx, dy = s1[0] - s0[0], s1[1] - s0[1]
        # order split points along the dominant axis of the segment; the
        # off-axis ordinate (direction-consistent) breaks exact ties —
        # 1-ulp twin nodes from crossing two collinear-overlapping
        # parents tie on the dominant axis, and without a deterministic
        # tiebreak the chain order falls to set-iteration order
        axis = 0 if abs(dx) >= abs(dy) else 1
        o = 1 - axis
        rev = (dx if axis == 0 else dy) < 0
        revo = (dx if o == 0 else dy) < 0

        def _k(p, axis=axis, o=o, rev=rev, revo=revo):
            return (
                -p[axis] if rev else p[axis],
                -p[o] if revo else p[o],
            )

        chain = [s0] + sorted(pts, key=_k) + [s1]
        for i in range(len(chain) - 1):
            a, b = chain[i], chain[i + 1]
            if a == b:
                continue
            key = (min(a, b), max(a, b))
            if key in seen:
                continue
            seen.add(key)
            out["x0"].append(key[0][0]); out["y0"].append(key[0][1])
            out["x1"].append(key[1][0]); out["y1"].append(key[1][1])
    return pa.table({k: pa.array(np.array(v, dtype=np.float64)) for k, v in out.items()})


def _dedup_subsegments(g: pa.Table) -> pa.Table:
    """Exact dedup of canonical sub-segments within a dkey bucket.
    Collinear OVERLAPPING parent segments each re-emit their shared
    sub-interval from their own skey group; identity across parents is
    only known globally, so the pipeline co-locates candidates by a
    sub-segment mixing key and drops exact repeats here (hash collisions
    merely co-group unrelated rows — the tuple check keeps them)."""
    arr = np.column_stack(
        [g[c].to_numpy() for c in ("x0", "y0", "x1", "y1")]
    ).astype(np.float64, copy=False)
    uniq = np.unique(arr, axis=0) if len(arr) else arr
    return pa.table(
        {c: pa.array(np.ascontiguousarray(uniq[:, i])) for i, c in enumerate(("x0", "y0", "x1", "y1"))}
    )


def distributed_node(
    ds,
    wkb_col: str = "wkb",
    cell: float = 1.0,
    origin=(0.0, 0.0),
    as_wkb: bool = True,
    dedup: bool = True,
):
    """Node a Dataset of linework WKB: every segment split at every
    intersection with any other segment (and at collinear-overlap
    interval endpoints), output canonical deduplicated sub-segments —
    as `wkb` rows (default, composes with distributed_polygonize /
    distributed_line_dissolve) or as (x0,y0,x1,y1) columns.

    dedup=False skips the final cross-parent dedup exchange (one
    all-to-all over coordinate rows): safe ONLY when no two input
    segments overlap collinearly — with overlaps, the shared
    sub-interval is emitted once per parent and downstream face
    assembly sees duplicate edges."""
    import ray.data  # noqa: F401

    ox, oy = float(origin[0]), float(origin[1])

    def add_dkey(b: pa.Table) -> pa.Table:
        # bucketed, not per-segment: all copies of a sub-segment share a
        # bucket (pure function of its coords) but the group count stays
        # bounded at 4096 — one group per unique segment would drown the
        # exchange in per-group overhead
        if b.num_rows == 0:
            return b.append_column("dkey", pa.array(np.empty(0, np.int64)))
        key = _seg_key(
            b["x0"].to_numpy(), b["y0"].to_numpy(),
            b["x1"].to_numpy(), b["y1"].to_numpy(),
        )
        return b.append_column(
            "dkey", pa.array((key.view(np.uint64) & np.uint64(4095)).view(np.int64))
        )

    noded = (
        ds.map_batches(lambda b: segments_wkb_batch(b, wkb_col), batch_format="pyarrow")
        .map_batches(
            lambda b: _replicate_to_cells(b, cell, ox, oy), batch_format="pyarrow"
        )
        .groupby("cell")
        .map_groups(
            lambda g: _cell_node(g, cell=cell, ox=ox, oy=oy), batch_format="pyarrow"
        )
        .groupby("skey")
        .map_groups(_resplit, batch_format="pyarrow")
    )
    if dedup:
        noded = (
            noded.map_batches(add_dkey, batch_format="pyarrow")
            .groupby("dkey")
            .map_groups(_dedup_subsegments, batch_format="pyarrow")
        )
    if not as_wkb:
        return noded

    def to_wkb_rows(batch: pa.Table) -> pa.Table:
        wkbs = [
            to_wkb(Geom(LINESTRING, np.array([(a, b), (c, d)], dtype=np.float64)))
            for a, b, c, d in zip(
                batch["x0"].to_pylist(), batch["y0"].to_pylist(),
                batch["x1"].to_pylist(), batch["y1"].to_pylist(),
            )
        ]
        return pa.table({"wkb": pa.array(wkbs, type=pa.binary())})

    return noded.map_batches(to_wkb_rows, batch_format="pyarrow")
