"""Raster <-> vector conversion stages.

``rasterize`` burns vector polygons (WKB rows) into integer grid cells
by center sampling: a cell is covered iff its center lies strictly in
the polygon interior (the all_touched=False burn rule of common raster
engines).  ``vectorize`` reconstructs one polygon per 4-connected
equal-value cell region (holes included) from (ix, iy, value) rows.

Scale shape:
- rasterize is map-only per polygon (vectorized point-in-rings over the
  polygon's cell-center grid) plus one optional groupby to resolve
  overlapping burns (map-side partial max first, so the shuffle carries
  pre-aggregated cells);
- vectorize extracts boundary edges tile-locally with a 1-cell ghost
  halo (each border cell is replicated to the adjacent tile — the
  standard raster halo exchange, one map + one groupby), emits every
  boundary edge exactly once via a left/lower-owner rule, then reuses
  the distributed polygonizer (stages/polygonize.py) for cross-tile
  ring stitching, and assigns each face its region value by routing the
  face through its interior cell key (one groupby against the cells).

The reference has no raster engine; this implements the north-star
rule's raster<->vector tiling on the engine's own distributed topology
substrate (for large-scale raster+vector analysis patterns cf. Raptor,
VLDB 2019 — see PAPERS.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import algorithms as alg
from ..geom.types import LINESTRING, POLYGON, Geom
from ..geom.wkb import from_wkb, to_wkb
from .polygonize import _pack_cell, distributed_polygonize

_CELLS_SCHEMA = pa.schema(
    [("ix", pa.int64()), ("iy", pa.int64()), ("value", pa.int64())]
)


def _partial_combine(t: pa.Table, combine: str = "max") -> pa.Table:
    """Arrow-native per-batch (ix, iy) -> combine(value).  ``max`` is
    the overlap-resolution rule; ``sum`` and ``count`` turn rasterize
    into a density/heatmap grid (count burns 1 per covering polygon —
    both are mergeable, so the same map-side partial + one groupby
    works: count partials re-merge with sum)."""
    if len(t) == 0:
        return _CELLS_SCHEMA.empty_table()
    agg = "sum" if combine == "count" else combine
    g = pa.TableGroupBy(t.select(["ix", "iy", "value"]), ["ix", "iy"]).aggregate(
        [("value", agg)]
    )
    out = g.rename_columns(["ix", "iy", "value"])
    return out.set_column(2, "value", out["value"].cast(pa.int64()))


def _partial_max(t: pa.Table) -> pa.Table:
    return _partial_combine(t, "max")


def rasterize_batch(
    batch: pa.Table,
    *,
    wkb_col: str = "wkb",
    value_col: str = "value",
    cell: float = 1.0,
    origin=(0.0, 0.0),
    combine: str = "max",
) -> pa.Table:
    """Burn one batch of polygons into (ix, iy, value) rows (already
    combined within the batch).  combine='count' burns 1 per covering
    polygon (value_col ignored), 'sum'/'max' aggregate the value."""
    ox, oy = float(origin[0]), float(origin[1])
    oix, oiy, ov = [], [], []
    vals = (
        [1] * len(batch)
        if combine == "count"
        else batch[value_col].to_pylist()
    )
    for v, w in zip(vals, batch[wkb_col].to_pylist()):
        g = from_wkb(w)
        for comp in g.flatten():
            if comp.gtype != POLYGON or comp.is_empty:
                continue
            rings = comp.data
            shell = rings[0]
            minx, miny = shell.min(axis=0)
            maxx, maxy = shell.max(axis=0)
            i0 = int(np.floor((minx - ox) / cell))
            i1 = int(np.floor((maxx - ox) / cell))
            j0 = int(np.floor((miny - oy) / cell))
            j1 = int(np.floor((maxy - oy) / cell))
            if i1 < i0 or j1 < j0:
                continue
            ii, jj = np.meshgrid(
                np.arange(i0, i1 + 1, dtype=np.int64),
                np.arange(j0, j1 + 1, dtype=np.int64),
            )
            ii, jj = ii.ravel(), jj.ravel()
            pts = np.column_stack(
                [ox + (ii + 0.5) * cell, oy + (jj + 0.5) * cell]
            ).astype(np.float64)
            loc = alg.locate_points_in_rings(pts, rings)
            m = loc == alg.INTERIOR
            if m.any():
                oix.append(ii[m])
                oiy.append(jj[m])
                ov.append(np.full(int(m.sum()), int(v), dtype=np.int64))
    if not oix:
        return _CELLS_SCHEMA.empty_table()
    t = pa.table(
        {
            "ix": pa.array(np.concatenate(oix)),
            "iy": pa.array(np.concatenate(oiy)),
            "value": pa.array(np.concatenate(ov)),
        }
    )
    # partials are mergeable: count partials re-merge via sum
    return _partial_combine(t, "sum" if combine in ("sum", "count") else "max")


def rasterize(
    ds,
    *,
    wkb_col: str = "wkb",
    value_col: str = "value",
    cell: float = 1.0,
    origin=(0.0, 0.0),
    resolve: bool = True,
    combine: str = "max",
):
    """Dataset of polygons (wkb + integer value) -> Dataset of
    (ix, iy, value) covered cells.  ``combine`` picks the overlap rule:
    'max' (default, GDAL-style burn precedence), 'sum' (additive burn),
    or 'count' (coverage density — how many polygons cover each cell).
    With ``resolve`` (default) the rule is applied globally with one
    key-colocating groupby over pre-aggregated map-side partials; pass
    resolve=False when inputs are known disjoint (map-only)."""
    if combine not in ("max", "sum", "count"):
        raise ValueError("combine must be 'max', 'sum' or 'count'")
    burned = ds.map_batches(
        lambda b: rasterize_batch(
            b, wkb_col=wkb_col, value_col=value_col, cell=cell, origin=origin,
            combine=combine,
        ),
        batch_format="pyarrow",
    )
    if not resolve:
        return burned

    # co-locate by 64x64-cell bucket (NOT per cell: per-cell groups would
    # mean one Python group call per raster cell) and run the arrow
    # groupby vectorized over each whole bucket
    def key(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b.append_column("bucket", pa.array([], type=pa.int64()))
        k = _pack_cell(
            b["ix"].to_numpy(zero_copy_only=False) >> 6,
            b["iy"].to_numpy(zero_copy_only=False) >> 6,
        )
        return b.append_column("bucket", pa.array(k, type=pa.int64()))

    merge_rule = "sum" if combine in ("sum", "count") else "max"

    def final(g: pa.Table) -> pa.Table:
        return _partial_combine(g.select(["ix", "iy", "value"]), merge_rule)

    return (
        burned.map_batches(key, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(final, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# vectorize


def _route_tiles(batch: pa.Table, tile: int) -> pa.Table:
    """Replicate each cell to its own tile plus (as ghost) to the 4-adjacent
    tile for each border it sits on — the halo exchange that gives every
    tile the neighbor values of its border cells."""
    if len(batch) == 0:
        return pa.schema(
            [
                ("tcell", pa.int64()),
                ("ix", pa.int64()),
                ("iy", pa.int64()),
                ("value", pa.int64()),
                ("ghost", pa.bool_()),
            ]
        ).empty_table()
    ix = batch["ix"].to_numpy(zero_copy_only=False).astype(np.int64)
    iy = batch["iy"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch["value"].to_numpy(zero_copy_only=False).astype(np.int64)
    tx = np.floor_divide(ix, tile)
    ty = np.floor_divide(iy, tile)
    rx = ix - tx * tile
    ry = iy - ty * tile
    tcs, ixs, iys, vs, gh = [], [], [], [], []
    tcs.append(_pack_cell(tx, ty))
    ixs.append(ix)
    iys.append(iy)
    vs.append(v)
    gh.append(np.zeros(len(ix), dtype=bool))
    for mask, dtx, dty in (
        (rx == 0, -1, 0),
        (rx == tile - 1, 1, 0),
        (ry == 0, 0, -1),
        (ry == tile - 1, 0, 1),
    ):
        if mask.any():
            tcs.append(_pack_cell(tx[mask] + dtx, ty[mask] + dty))
            ixs.append(ix[mask])
            iys.append(iy[mask])
            vs.append(v[mask])
            gh.append(np.ones(int(mask.sum()), dtype=bool))
    return pa.table(
        {
            "tcell": pa.array(np.concatenate(tcs), type=pa.int64()),
            "ix": pa.array(np.concatenate(ixs)),
            "iy": pa.array(np.concatenate(iys)),
            "value": pa.array(np.concatenate(vs)),
            "ghost": pa.array(np.concatenate(gh)),
        }
    )


def _extract_edges(
    g: pa.Table, *, cell: float, ox: float, oy: float
) -> pa.Table:
    """Boundary edges of the value field within one tile (+ ghost halo).
    Owner rule — each edge emitted exactly once globally: a cell emits
    its east/north edges whenever the neighbor value differs (or is
    missing), and its west/south edges only when that neighbor is
    missing (otherwise the west/south neighbor is the owner)."""
    ix = g["ix"].to_numpy(zero_copy_only=False)
    iy = g["iy"].to_numpy(zero_copy_only=False)
    v = g["value"].to_numpy(zero_copy_only=False)
    ghost = g["ghost"].to_numpy(zero_copy_only=False)
    # duplicate (ix, iy) rows (pre-resolve inputs) settle to max(value) —
    # the same rule as rasterize's overlap resolve and attach(); a
    # last-write-wins dict would emit spurious edges nondeterministically
    vals: dict = {}
    for a, b, c in zip(ix, iy, v):
        key = (int(a), int(b))
        c = int(c)
        if key not in vals or c > vals[key]:
            vals[key] = c
    wkbs = []

    def seg(x0, y0, x1, y1):
        wkbs.append(
            to_wkb(
                Geom(
                    LINESTRING,
                    np.array(
                        [
                            [ox + x0 * cell, oy + y0 * cell],
                            [ox + x1 * cell, oy + y1 * cell],
                        ],
                        dtype=np.float64,
                    ),
                )
            )
        )

    own = sorted({(int(a), int(b)) for a, b, gh in zip(ix, iy, ghost) if not gh})
    for a, b in own:
        val = vals[(a, b)]
        e = vals.get((a + 1, b))
        if e is None or e != val:
            seg(a + 1, b, a + 1, b + 1)
        n = vals.get((a, b + 1))
        if n is None or n != val:
            seg(a, b + 1, a + 1, b + 1)
        if (a - 1, b) not in vals:
            seg(a, b, a, b + 1)
        if (a, b - 1) not in vals:
            seg(a, b, a + 1, b)
    return pa.table({"wkb": pa.array(wkbs, type=pa.binary())})


def vectorize(
    ds,
    *,
    cell: float = 1.0,
    origin=(0.0, 0.0),
    tile: int = 64,
    num_partitions: int | None = None,
    polygonize_cell: float | None = None,
):
    """Dataset of (ix, iy, value) cells -> Dataset of (face_wkb, value):
    one polygon (holes included) per 4-connected equal-value region.
    Regions of equal value touching only at a corner stay separate, as
    do equal-value regions separated by other values.

    ``polygonize_cell`` is the stitcher's spatial grouping granularity —
    independent of the halo ``tile``; the default (8 x tile x cell) lets
    typical region rings complete in the local walk instead of
    escalating the whole workload through the stitch hierarchy (measured
    2.3x on the sf0.1 round trip vs grouping at tile size).

    ``num_partitions`` bounds the stitcher's per-level exchanges; the
    default sizes it to the cluster CPU count so the stitch phases are
    not parallelism-capped below the rest of the pipeline."""
    import ray
    import ray.data  # noqa: F401

    if num_partitions is None:
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 16)))
    ox, oy = float(origin[0]), float(origin[1])

    # the cells feed TWO consumers (edge extraction and the value-attach
    # branch); checkpoint once so a lazy upstream (e.g. a full rasterize
    # burn + resolve shuffle) is not re-executed per branch
    ds = ds.materialize()

    edges = (
        ds.map_batches(lambda b: _route_tiles(b, tile), batch_format="pyarrow")
        .groupby("tcell")
        .map_groups(
            lambda g: _extract_edges(g, cell=cell, ox=ox, oy=oy),
            batch_format="pyarrow",
        )
    )
    # the stitch grid is shifted half a raster cell: every ring vertex
    # lies on the raster lattice, so an unshifted grid would put
    # lattice-aligned regions exactly ON group boundaries and the local
    # walk (which needs strictly-interior vertices) would consume
    # nothing — measured 4x on the sf0.1 round trip's polygonize phase
    faces = distributed_polygonize(
        edges,
        wkb_col="wkb",
        cell=float(polygonize_cell) if polygonize_cell else 8.0 * tile * cell,
        origin=(ox - cell / 2.0, oy - cell / 2.0),
        num_partitions=num_partitions,
    )

    # value assignment: route each face through its interior cell, co-
    # grouped with the cells by 64x64-cell BUCKET (per-cell groups would
    # cost one Python group call per raster cell); within a bucket the
    # lookup is one dict pass (kind 0 = cell value, kind 1 = face)
    def face_key(b: pa.Table) -> pa.Table:
        bks, ixs, iys, kinds, vals_, wkbs = [], [], [], [], [], []
        for w in b["face_wkb"].to_pylist():
            f = from_wkb(w)
            ip = alg.interior_point(f)
            cxx = int(np.floor((float(ip.data[0]) - ox) / cell))
            cyy = int(np.floor((float(ip.data[1]) - oy) / cell))
            bks.append(int(_pack_cell(np.int64(cxx >> 6), np.int64(cyy >> 6))))
            ixs.append(cxx)
            iys.append(cyy)
            kinds.append(1)
            vals_.append(0)
            wkbs.append(w)
        return pa.table(
            {
                "bucket": pa.array(bks, type=pa.int64()),
                "ix": pa.array(ixs, type=pa.int64()),
                "iy": pa.array(iys, type=pa.int64()),
                "kind": pa.array(kinds, type=pa.int8()),
                "value": pa.array(vals_, type=pa.int64()),
                "face_wkb": pa.array(wkbs, type=pa.binary()),
            }
        )

    def cell_key(b: pa.Table) -> pa.Table:
        n = len(b)
        ix = b["ix"].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = b["iy"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = _pack_cell(ix >> 6, iy >> 6)
        return pa.table(
            {
                "bucket": pa.array(k, type=pa.int64()),
                "ix": pa.array(ix),
                "iy": pa.array(iy),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
                "value": b["value"].cast(pa.int64()),
                "face_wkb": pa.array([b""] * n, type=pa.binary()),
            }
        )

    def attach(g: pa.Table) -> pa.Table:
        kinds = g["kind"].to_numpy(zero_copy_only=False)
        face_rows = np.nonzero(kinds == 1)[0]
        if len(face_rows) == 0:
            return pa.schema(
                [("face_wkb", pa.binary()), ("value", pa.int64())]
            ).empty_table()
        ix = g["ix"].to_numpy(zero_copy_only=False)
        iy = g["iy"].to_numpy(zero_copy_only=False)
        vals = g["value"].to_numpy(zero_copy_only=False)
        lut: dict = {}
        for r in np.nonzero(kinds == 0)[0]:
            key = (int(ix[r]), int(iy[r]))
            v = int(vals[r])
            # duplicate cell rows (pre-resolve inputs) settle to
            # max(value), matching rasterize's overlap rule
            if key not in lut or v > lut[key]:
                lut[key] = v
        wk = g["face_wkb"].to_pylist()
        out_w, out_v = [], []
        for r in face_rows:
            v = lut.get((int(ix[r]), int(iy[r])))
            if v is not None:  # faces over no-data (hole faces) drop out
                out_w.append(wk[r])
                out_v.append(v)
        return pa.table(
            {
                "face_wkb": pa.array(out_w, type=pa.binary()),
                "value": pa.array(out_v, type=pa.int64()),
            }
        )

    tagged = faces.map_batches(face_key, batch_format="pyarrow").union(
        ds.map_batches(cell_key, batch_format="pyarrow")
    )
    return tagged.groupby("bucket").map_groups(attach, batch_format="pyarrow")
