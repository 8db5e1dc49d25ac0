"""General geometry×geometry distributed spatial join (SURVEY.md §2.4).

Re-creates the reference's index+predicate join idiom — STRtree bulk-load
plus box query (reference: Index/Strtree/STRtree.cs:32) feeding a prepared
exact predicate (reference: Geometries/Prepared/PreparedPolygon.cs:71) —
for TWO LARGE WKB layers, where neither side fits in a broadcast:

1. Tag: each side decodes its WKB column to envelopes once (map_batches,
   Arrow in/out) and is multiplexed into every grid cell its envelope
   touches (the right side's envelope is expanded by ``distance`` for
   dwithin).  The shuffle therefore moves each row (1 + border-fraction)
   times — the PBSM partition-based spatial-merge shape.
2. One groupby(cell) co-partitions the layers; a per-cell kernel does a
   vectorized chunked envelope test (candidate generation), then runs the
   exact DE-9IM predicate on survivors with per-geometry parse caching.
3. Duplicate candidates (a pair shows up in every cell both envelopes
   share) are eliminated with the reference-point rule: a pair is emitted
   only by the cell containing the lower-left corner of the envelope
   intersection.  Pure float floor arithmetic, identical in the tag and
   the kernel — so join output is row-identical at any parallelism level.
4. Hot cells (dense urban tiles) are salted: left rows spread over
   ``n_salt`` deterministic subkeys, right rows replicated to each, so a
   skewed cell becomes n_salt smaller tasks with identical output.

At 100 TB this is the no-broadcast join shape: the only all-to-all moves
(keys + wkb + 4 env floats) per multiplexed row, candidate generation is
O(per-cell dense bbox test) in bounded chunks, and the exact predicate
runs only on envelope-overlapping survivors.  For a small build side use
stages/spatial_join.py (broadcast) instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import algorithms as alg
from ..geom import predicates as P
from ..geom.wkb import from_wkb

_PREDICATES = {
    "intersects": P.intersects,
    "contains": P.contains,
    "within": P.within,
    "covers": P.covers,
    "covered_by": P.covered_by,
    "crosses": P.crosses,
    "touches": P.touches,
    "overlaps": P.overlaps,
    "equals": P.equals_topo,
}


class _Prepared:
    """Per-geometry derived arrays, built once per kernel group — the
    prepared-geometry idiom (reference: PreparedPolygon.cs:17) applied
    inside the cell kernel: vertex array, polygon rings, segment arrays."""

    __slots__ = ("geom", "pts", "rings", "segs")

    def __init__(self, geom):
        self.geom = geom
        self.pts = geom.all_coords()
        self.rings = [
            r for c in geom.flatten() if c.gtype == "Polygon" for r in c.data
        ]
        self.segs = alg._geom_segments(geom)


def _any_vertex_inside(pts: np.ndarray, rings) -> bool:
    return bool(
        len(rings)
        and len(pts)
        and (alg.locate_points_in_rings(pts, rings) != alg.EXTERIOR).any()
    )


def _prep_intersects(a: _Prepared, b: _Prepared) -> bool:
    """Complete for all geometry mixes: vertex-of-one-in-other covers
    containment and point components, segment intersection covers
    boundary crossings, point-set coincidence covers pure points."""
    if _any_vertex_inside(b.pts, a.rings) or _any_vertex_inside(a.pts, b.rings):
        return True
    if a.segs is not None and b.segs is not None and alg._segments_intersect(
        a.segs, b.segs
    ):
        return True
    if a.segs is None or b.segs is None:
        # at least one side is pure points: exact coincidence with the
        # other's vertices or segments decides
        pp, other = (a, b) if a.segs is None else (b, a)
        if len(pp.pts):
            if other.segs is not None:
                from ..geom.algorithms import points_to_segments_distance

                return bool(points_to_segments_distance(pp.pts, other.segs).min() == 0.0)
            if len(other.pts):
                d = np.hypot(
                    pp.pts[:, 0][:, None] - other.pts[None, :, 0],
                    pp.pts[:, 1][:, None] - other.pts[None, :, 1],
                )
                return bool((d == 0.0).any())
    return False


def _prep_dwithin(a: _Prepared, b: _Prepared, d: float) -> bool:
    if _prep_intersects(a, b):
        return True
    from ..geom.algorithms import points_to_segments_distance

    best = np.inf
    if b.segs is not None and len(a.pts):
        best = min(best, float(points_to_segments_distance(a.pts, b.segs).min()))
    if a.segs is not None and len(b.pts):
        best = min(best, float(points_to_segments_distance(b.pts, a.segs).min()))
    if a.segs is None and b.segs is None and len(a.pts) and len(b.pts):
        dd = np.hypot(
            a.pts[:, 0][:, None] - b.pts[None, :, 0],
            a.pts[:, 1][:, None] - b.pts[None, :, 1],
        )
        best = min(best, float(dd.min()))
    return best <= d


def _prep_contains(a: _Prepared, b: _Prepared) -> bool:
    """Fast reject (a B vertex exterior) / fast accept (all strictly
    interior, boundaries never intersect); full relate on boundary touch
    — the PreparedPolygon.cs:31-47 ladder."""
    if not a.rings or not len(b.pts):
        return P.contains(a.geom, b.geom)
    loc = alg.locate_points_in_rings(b.pts, a.rings)
    if (loc == alg.EXTERIOR).any():
        return False
    no_seg_x = (
        a.segs is None
        or b.segs is None
        or not alg._segments_intersect(a.segs, b.segs)
    )
    if no_seg_x and (loc == alg.INTERIOR).all():
        return True
    return P.contains(a.geom, b.geom)


def _pred_fn(predicate: str, dist: float):
    """(fn(a: _Prepared, b: _Prepared) -> bool) for the cell kernel."""
    if predicate == "dwithin":
        return lambda a, b: _prep_dwithin(a, b, dist)
    if predicate == "intersects":
        return _prep_intersects
    if predicate == "contains":
        return _prep_contains
    if predicate == "within":
        return lambda a, b: _prep_contains(b, a)
    if predicate.startswith("relate:"):
        pattern = predicate.split(":", 1)[1]
        return lambda a, b: P.relate_pattern(a.geom, b.geom, pattern)
    try:
        fn = _PREDICATES[predicate]
    except KeyError:
        raise ValueError(
            f"unknown predicate {predicate!r}; one of {sorted(_PREDICATES)}, "
            "'dwithin', or 'relate:<DE-9IM pattern>'"
        ) from None
    return lambda a, b, _f=fn: _f(a.geom, b.geom)


def spatial_join(
    left_ds,
    right_ds,
    predicate: str = "intersects",
    *,
    left_keys=("l_id",),
    right_keys=("r_id",),
    left_wkb: str = "wkb",
    right_wkb: str = "wkb",
    extent=(-180.0, -90.0, 180.0, 90.0),
    level: int = 6,
    distance: float = 0.0,
    salt_threshold: int | None = None,
    n_salt: int = 16,
    num_partitions: int | None = None,
):
    """All (left, right) pairs where ``predicate(left_geom, right_geom)``
    holds.  Output columns: ``left_keys + right_keys``.

    predicate: 'intersects' | 'contains' | 'within' | 'covers' |
      'covered_by' | 'crosses' | 'touches' | 'overlaps' | 'equals' |
      'dwithin' (with ``distance``) | 'relate:<9-char DE-9IM pattern>'.
    extent/level: the cell grid — 2^level × 2^level cells over extent.
      Geometries sticking out of the extent are clamped to border cells
      (still correct, just more candidates there).
    salt_threshold: when set, cells with more LEFT rows than this are
      split over n_salt subkeys (rights replicated); output identical.
    """
    if predicate == "dwithin" and distance < 0:
        raise ValueError("dwithin needs distance >= 0")
    _RESERVED = {"_wkb", "_minx", "_miny", "_maxx", "_maxy", "cell", "_side"}
    bad = (_RESERVED & set(left_keys)) | (_RESERVED & set(right_keys))
    if bad:
        raise ValueError(f"key columns collide with internal names: {sorted(bad)}")
    if set(left_keys) & set(right_keys):
        raise ValueError("left_keys and right_keys must be disjoint")
    n = np.int64(1) << np.int64(level)
    ex0, ey0, ex1, ey1 = (float(v) for v in extent)
    sx = (ex1 - ex0) / float(n)
    sy = (ey1 - ey0) / float(n)
    lk, rk = list(left_keys), list(right_keys)
    expand = float(distance) if predicate == "dwithin" else 0.0

    left_types = {f.name: f.type for f in left_ds.schema().base_schema}
    right_types = {f.name: f.type for f in right_ds.schema().base_schema}

    def tag(batch: pa.Table, keys, wkb_col: str, grow: float, side: int) -> pa.Table:
        from ..geom.wkb import decode_column

        geoms = decode_column(batch[wkb_col])  # vectorized ragged decode
        env = np.empty((len(geoms), 4), dtype=np.float64)
        for i, g in enumerate(geoms):
            e = alg.envelope(g) if g is not None else None
            env[i] = e if e else (np.nan,) * 4
        if grow:
            env += (-grow, -grow, grow, grow)
        x0 = np.clip(np.floor((env[:, 0] - ex0) / sx), 0, float(n - 1)).astype(np.int64)
        x1 = np.clip(np.floor((env[:, 2] - ex0) / sx), 0, float(n - 1)).astype(np.int64)
        y0 = np.clip(np.floor((env[:, 1] - ey0) / sy), 0, float(n - 1)).astype(np.int64)
        y1 = np.clip(np.floor((env[:, 3] - ey0) / sy), 0, float(n - 1)).astype(np.int64)
        # empty/NaN envelopes join nothing: multiplex to zero cells
        ok = ~np.isnan(env[:, 0])
        cnt = np.where(ok, (x1 - x0 + 1) * (y1 - y0 + 1), 0).astype(np.int64)
        total = int(cnt.sum())
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), cnt)
        off = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        w = np.repeat(x1 - x0 + 1, cnt)
        cx = np.repeat(x0, cnt) + off % w
        cy = np.repeat(y0, cnt) + off // w
        take = pa.array(idx)
        out = {k: batch[k].take(take) for k in keys}
        out["_wkb"] = batch[wkb_col].take(take)
        for j, c in enumerate(("_minx", "_miny", "_maxx", "_maxy")):
            out[c] = pa.array(env[idx, j])
        out["cell"] = pa.array(cy * n + cx)
        out["_side"] = pa.array(np.full(total, side, dtype=np.int8))
        return pa.table(out)

    left_t = left_ds.map_batches(
        lambda b: tag(b, lk, left_wkb, 0.0, 0), batch_format="pyarrow"
    )
    right_t = right_ds.map_batches(
        lambda b: tag(b, rk, right_wkb, expand, 1), batch_format="pyarrow"
    )

    salt_mult = 1
    hot_cells = set()
    if salt_threshold is not None:
        from .tiling import tile_stats

        # the tagged left feeds TWO consumers (hot-cell stats + the join);
        # checkpoint once so the read+decode+multiplex chain is not
        # re-executed per consumer (the stats pass blocks anyway)
        left_t = left_t.materialize()
        hot_df = (
            tile_stats(left_t, "cell", small_result=False)
            .filter(expr=f"n > {int(salt_threshold)}")
            .to_pandas()
        )
        hot_cells = (
            set(hot_df["cell"].astype(np.int64)) if "cell" in hot_df.columns else set()
        )
    if hot_cells:
        salt_mult = int(n_salt)
        hot_arr = np.fromiter(hot_cells, dtype=np.int64, count=len(hot_cells))
        S = np.int64(n_salt)

        def salt_left(batch: pa.Table) -> pa.Table:
            cells = batch["cell"].to_numpy(zero_copy_only=False)
            base = cells * S
            hot = np.isin(cells, hot_arr)
            if hot.any():
                # deterministic per-row salt from the envelope (keys may
                # not be integers): reference-point bits of minx/miny
                h = (
                    np.frombuffer(
                        np.ascontiguousarray(
                            batch["_minx"].to_numpy(zero_copy_only=False)
                        ).tobytes(),
                        dtype=np.int64,
                    )
                    ^ np.frombuffer(
                        np.ascontiguousarray(
                            batch["_miny"].to_numpy(zero_copy_only=False)
                        ).tobytes(),
                        dtype=np.int64,
                    )
                )
                base = np.where(hot, base + (h * np.int64(2654435761)) % S, base)
            return batch.set_column(
                batch.column_names.index("cell"), "cell", pa.array(base)
            )

        def salt_right(batch: pa.Table) -> pa.Table:
            cells = batch["cell"].to_numpy(zero_copy_only=False)
            hot = np.isin(cells, hot_arr)
            reps = np.where(hot, int(n_salt), 1).astype(np.int64)
            idx = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
            off = np.arange(len(idx), dtype=np.int64) - np.repeat(
                np.cumsum(reps) - reps, reps
            )
            salted = cells[idx] * S + off
            out = {c: batch[c].take(pa.array(idx)) for c in batch.column_names}
            out["cell"] = pa.array(salted)
            return pa.table(out)

        left_t = left_t.map_batches(salt_left, batch_format="pyarrow")
        right_t = right_t.map_batches(salt_right, batch_format="pyarrow")

    # align schemas for union: pad each side with the OTHER side's key
    # columns as typed nulls
    def pad(batch: pa.Table, missing: list[str], types) -> pa.Table:
        cols = {}
        for k in lk + rk:
            if k in missing:
                cols[k] = pa.nulls(len(batch), type=types[k])
            else:
                cols[k] = batch[k]
        for c in ("_wkb", "_minx", "_miny", "_maxx", "_maxy", "cell", "_side"):
            cols[c] = batch[c]
        return pa.table(cols)

    both = left_t.map_batches(
        lambda b: pad(b, rk, right_types), batch_format="pyarrow"
    ).union(
        right_t.map_batches(lambda b: pad(b, lk, left_types), batch_format="pyarrow")
    )
    # the groupby sort's fixed overhead is block-count-driven (measured
    # 12x between 128 and 8 blocks on a 57k-row exchange); coalesce to
    # ~cluster-CPU blocks before the shuffle.  At real scale pass
    # num_partitions sized to data volume instead.
    if num_partitions is None:
        import ray

        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 16)))
    both = both.repartition(int(num_partitions))

    fn = _pred_fn(predicate, float(distance))
    SM = np.int64(salt_mult)
    out_names = lk + rk

    def join_cell(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        li = np.nonzero(side == 0)[0]
        ri = np.nonzero(side == 1)[0]
        empty = pa.table(
            {k: g[k].take(pa.array([], type=pa.int64())) for k in out_names}
        )
        if not len(li) or not len(ri):
            return empty
        base_cell = np.int64(g["cell"][0].as_py()) // SM
        lminx = g["_minx"].to_numpy(zero_copy_only=False)[li]
        lminy = g["_miny"].to_numpy(zero_copy_only=False)[li]
        lmaxx = g["_maxx"].to_numpy(zero_copy_only=False)[li]
        lmaxy = g["_maxy"].to_numpy(zero_copy_only=False)[li]
        rminx = g["_minx"].to_numpy(zero_copy_only=False)[ri]
        rminy = g["_miny"].to_numpy(zero_copy_only=False)[ri]
        rmaxx = g["_maxx"].to_numpy(zero_copy_only=False)[ri]
        rmaxy = g["_maxy"].to_numpy(zero_copy_only=False)[ri]
        # chunked dense envelope test: the (chunk x R) bool block stays
        # ~32 MB no matter how hot the cell is (salting divides CPU,
        # this bounds memory)
        chunk = max(1, 4_000_000 // max(len(ri), 1))
        ci_parts, cj_parts = [], []
        for a in range(0, len(li), chunk):
            ov = (
                (lminx[a : a + chunk, None] <= rmaxx[None, :])
                & (lmaxx[a : a + chunk, None] >= rminx[None, :])
                & (lminy[a : a + chunk, None] <= rmaxy[None, :])
                & (lmaxy[a : a + chunk, None] >= rminy[None, :])
            )
            pi, pj = np.nonzero(ov)
            ci_parts.append(pi + a)
            cj_parts.append(pj)
        ci = np.concatenate(ci_parts)
        cj = np.concatenate(cj_parts)
        if len(ci):
            # reference-point dedup: emit only in the cell containing the
            # lower-left corner of the envelope intersection (same float
            # floor arithmetic as the tag stage)
            rpx = np.maximum(lminx[ci], rminx[cj])
            rpy = np.maximum(lminy[ci], rminy[cj])
            cellx = np.clip(np.floor((rpx - ex0) / sx), 0, float(n - 1)).astype(np.int64)
            celly = np.clip(np.floor((rpy - ey0) / sy), 0, float(n - 1)).astype(np.int64)
            keep = (celly * n + cellx) == base_cell
            ci, cj = ci[keep], cj[keep]
        if not len(ci):
            return empty
        # exact predicate with per-geometry PREPARED caching (parse +
        # vertex/ring/segment arrays built once per geometry per cell,
        # not per pair), candidates grouped by left row
        order = np.argsort(ci, kind="stable")
        rprep: dict[int, _Prepared] = {}
        hits = np.zeros(len(ci), dtype=bool)
        cur_left = -1
        pl = None
        wcol = g["_wkb"]
        for pos in order:
            i, j = int(ci[pos]), int(cj[pos])
            if i != cur_left:
                pl = _Prepared(from_wkb(wcol[int(li[i])].as_py()))
                cur_left = i
            pr = rprep.get(j)
            if pr is None:
                pr = rprep[j] = _Prepared(from_wkb(wcol[int(ri[j])].as_py()))
            if fn(pl, pr):
                hits[pos] = True
        hi = np.nonzero(hits)[0]
        if not len(hi):
            return empty
        lt = pa.array(li[ci[hi]])
        rt = pa.array(ri[cj[hi]])
        cols = {k: g[k].take(lt) for k in lk}
        cols.update({k: g[k].take(rt) for k in rk})
        return pa.table(cols)

    return both.groupby("cell").map_groups(join_cell, batch_format="pyarrow")
