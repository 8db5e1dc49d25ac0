"""Distributed line dissolve/merge with tile-boundary stitching.

The reference dissolves a layer's linework in one address space
(reference: Dissolve/LineDissolver.cs:29 — drop duplicate segments,
stitch survivors into maximal chains broken at junction (degree != 2)
nodes; chain semantics shared with Operation/Linemerge/LineMerger.cs:25).
At 100 TB the linework doesn't fit one process, so this stage runs the
SAME kernel chain walk (`geom.overlay._merge_lines`) per grid cell and
escalates what it cannot prove, exactly like `stages.polygonize`:

- Segments are replicated to every cell their envelope intersects, so a
  node strictly inside a cell has its complete global star present and
  its local degree IS its global degree.
- A locally-merged chain is *final* iff every node is strictly interior
  and each endpoint is a proven junction (local degree != 2, or a
  junction MARKER from an earlier level) — or the chain is a closed
  cycle of interior nodes.  Final chains are consumed atomically: their
  segments are all midpoint-owned by the consuming cell (disjoint cell
  interiors ⇒ no two cells consume the same segment).
- Unconsumed segments escalate (owned by the midpoint cell, emitted
  once) through super-cells of size cell × K per level, the last level
  walking the remainder whole.  Junction markers escalate alongside:
  once a node is proven a junction its chains must break there forever,
  even if consumption leaves it with residual degree 2.
- Duplicate segments dedup globally for free: identical segments
  replicate to identical cells and collapse in the per-group set.

Partitioning assumptions: one cell's linework fits a task, residue
shrinks ~K× per level (perimeter scaling).  Unlike polygonize, dangles
are legitimate output lines — there is no pruning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.overlay import _merge_lines
from ..geom.types import Geom, LINESTRING
from ..geom.wkb import to_wkb
from .polygonize import (
    KIND_RESID,
    KIND_ANCHOR,
    _OUT_SCHEMA,
    _pack_cell,
    _replicate_to_cells,
    _route_stitch,
    _rows_table,
    _unpack_cell,
    segments_wkb_batch,
)

K_LINE = 0  # finished merged line (wkb)
K_SEG = KIND_RESID  # escalating segment rows reuse polygonize routing
K_MARK = KIND_ANCHOR  # junction marker (point)


def _merge_cell(
    t: pa.Table, *, cell: float, ox: float, oy: float, final: bool
) -> pa.Table:
    markers = set()
    segs = set()
    for k, a, b, c, d in zip(
        t["kind"].to_pylist(),
        t["x0"].to_pylist(),
        t["y0"].to_pylist(),
        t["x1"].to_pylist(),
        t["y1"].to_pylist(),
    ):
        if k == K_MARK:
            markers.add((float(a), float(b)))
        elif k == K_SEG:
            p0, p1 = (float(a), float(b)), (float(c), float(d))
            segs.add((min(p0, p1), max(p0, p1)))
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

    deg: dict = {}
    for p0, p1 in segs:
        deg[p0] = deg.get(p0, 0) + 1
        deg[p1] = deg.get(p1, 0) + 1

    def true_junction(n) -> bool:
        # trustworthy only at interior nodes (complete star) or markers
        return (n in markers) or deg.get(n, 0) != 2

    # the predicate is BOTH the break set and the walk-start set inside
    # _merge_lines — degree != 2 must stay in it (as in the kernel's
    # default), else leftover walks start mid-chain and split chains at
    # degree-2 nodes
    lines = _merge_lines(
        sorted(segs),
        junction=lambda n: (n in markers)
        or (not interior(n))
        or deg.get(n, 0) != 2,
    )
    rows = []
    consumed: set = set()
    for line in lines:
        pts = [(float(p[0]), float(p[1])) for p in line]
        if not final:
            if not all(interior(p) for p in pts):
                continue
            closed = pts[0] == pts[-1]
            if not closed and not (
                true_junction(pts[0]) and true_junction(pts[-1])
            ):
                continue
        for i in range(len(pts) - 1):
            consumed.add((min(pts[i], pts[i + 1]), max(pts[i], pts[i + 1])))
        wkb = to_wkb(Geom(LINESTRING, np.array(pts, dtype=np.float64)))
        rows.append((K_LINE, wkb, None, None, None, None))
    if not final:
        live: set = set()
        for p0, p1 in segs:
            if (p0, p1) in consumed:
                continue
            live.add(p0)
            live.add(p1)
            if owns(p0, p1):
                rows.append((K_SEG, None, p0[0], p0[1], p1[0], p1[1]))
        # escalate junction knowledge: forwarded markers plus interior
        # nodes proven junction here, while residual segments touch them
        for n in sorted(live):
            if n in markers or (interior(n) and deg.get(n, 0) != 2):
                rows.append((K_MARK, None, n[0], n[1], None, None))
    return _rows_table(rows)


def distributed_line_dissolve(
    ds,
    wkb_col: str = "wkb",
    cell: float = 1.0,
    origin=(0.0, 0.0),
):
    """Dissolve + merge a Dataset of linework WKB into a Dataset with one
    `line_wkb` per maximal chain — see module docstring for the level
    plan.  Matches `geom.extra.dissolve_lines` run on the whole layer
    (asserted in tests), up to direction/rotation of the emitted lines."""
    import ray.data  # noqa: F401  (Dataset ops)

    ox, oy = float(origin[0]), float(origin[1])

    def replicate(batch: pa.Table) -> pa.Table:
        rep = _replicate_to_cells(batch, cell, ox, oy)
        return rep.append_column(
            "kind", pa.array(np.full(len(rep), K_SEG, dtype=np.int8))
        )

    staged = (
        ds.map_batches(lambda b: segments_wkb_batch(b, wkb_col), batch_format="pyarrow")
        .map_batches(replicate, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(
            lambda g: _merge_cell(g, cell=cell, ox=ox, oy=oy, final=False),
            batch_format="pyarrow",
        )
        .materialize()
    )
    lines = staged.filter(expr="kind == 0")
    resid = staged.filter(expr="kind == 2")
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
        level_cell = float(cell)
        cur = staged.filter(expr="kind == 2 or kind == 3")
        while True:
            level_cell *= K
            if level_cell > span:
                break
            lc = level_cell
            routed = (
                cur.map_batches(
                    lambda b, _c=lc: _route_stitch(b, _c, ox, oy),
                    batch_format="pyarrow",
                )
                .groupby("cell")
                .map_groups(
                    lambda g, _c=lc: _merge_cell(
                        g, cell=_c, ox=ox, oy=oy, final=False
                    ),
                    batch_format="pyarrow",
                )
                # bound block growth through the filter/union branches
                .repartition(16)
                .materialize()
            )
            lines = lines.union(routed.filter(expr="kind == 0"))
            cur = routed.filter(expr="kind == 2 or kind == 3")
            if cur.count() == 0:
                cur = None
                break
        if cur is not None:
            final_lines = cur.repartition(1).map_batches(
                lambda g: _merge_cell(
                    g, cell=level_cell, ox=ox, oy=oy, final=True
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
            lines = lines.union(final_lines)

    def out_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"line_wkb": batch["wkb"]})

    return lines.map_batches(out_rows, batch_format="pyarrow")
