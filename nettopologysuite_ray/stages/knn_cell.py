"""Exact large-large k-nearest-neighbour join (engine extra beyond the
reference's single-machine STRtree kNN — Index/Strtree/STRtree.cs:556 —
for the case where NEITHER side fits in a broadcast).

Radius-doubling candidate gather over the PBSM cell grid:

  round m: every still-unsatisfied LEFT point joins the RIGHT points
  within radius r_m = cell * 2^m of its cell (rights multiplexed to all
  cells their r_m-expanded position touches — the same cover rule as
  stages/geom_join.py).  Per cell, each left's candidates are ranked by
  (dist², right_id); a left is SATISFIED when it has ≥ k candidates and
  its k-th distance ≤ r_m — every unseen point is farther than r_m, so
  the top-k is provably exact.  Unsatisfied lefts (sparse regions)
  re-enter the next round with doubled radius; the driver loop is
  bounded by log2(extent / cell) rounds and each round only carries the
  UNSATISFIED residue (for non-adversarial densities one round
  satisfies nearly everything).

Output: left_keys + rank:int64 (0-based) + right_keys + dist2:float64,
ties broken by ascending right id — row-identical at any parallelism.

At 100 TB: the shuffle each round moves |unsatisfied| + the rights'
multiplexed copies (cover factor (2r/cell+1)²) — pick `cell` near the
k-th-neighbour distance scale so round 0 satisfies the bulk.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def knn_join(
    left_ds,
    right_ds,
    k: int,
    *,
    left_keys=("l_id",),
    right_keys=("r_id",),
    x_col: str = "x",
    y_col: str = "y",
    extent=(-180.0, -90.0, 180.0, 90.0),
    level: int = 6,
    max_rounds: int = 40,
):
    """Exact kNN of each left point among ALL right points."""
    import ray.data as rd  # noqa: F401

    n = np.int64(1) << np.int64(level)
    ex0, ey0, ex1, ey1 = (float(v) for v in extent)
    sx = (ex1 - ex0) / float(n)
    sy = (ey1 - ey0) / float(n)
    lk, rk = list(left_keys), list(right_keys)
    k = int(k)

    def tag_left(batch: pa.Table) -> pa.Table:
        xs = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ys = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cx = np.clip(np.floor((xs - ex0) / sx), 0, float(n - 1)).astype(np.int64)
        cy = np.clip(np.floor((ys - ey0) / sy), 0, float(n - 1)).astype(np.int64)
        out = {c: batch[c] for c in lk}
        out["_x"] = pa.array(xs)
        out["_y"] = pa.array(ys)
        out["cell"] = pa.array(cy * n + cx)
        out["_side"] = pa.array(np.zeros(len(xs), dtype=np.int8))
        return pa.table(out)

    def tag_right(radius: float):
        def fn(batch: pa.Table) -> pa.Table:
            xs = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
            ys = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
            x0 = np.clip(np.floor((xs - radius - ex0) / sx), 0, float(n - 1)).astype(np.int64)
            x1 = np.clip(np.floor((xs + radius - ex0) / sx), 0, float(n - 1)).astype(np.int64)
            y0 = np.clip(np.floor((ys - radius - ey0) / sy), 0, float(n - 1)).astype(np.int64)
            y1 = np.clip(np.floor((ys + radius - ey0) / sy), 0, float(n - 1)).astype(np.int64)
            cnt = ((x1 - x0 + 1) * (y1 - y0 + 1)).astype(np.int64)
            total = int(cnt.sum())
            idx = np.repeat(np.arange(len(xs), dtype=np.int64), cnt)
            off = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            w = np.repeat(x1 - x0 + 1, cnt)
            ccx = np.repeat(x0, cnt) + off % w
            ccy = np.repeat(y0, cnt) + off // w
            take = pa.array(idx)
            out = {c: batch[c].take(take) for c in rk}
            out["_x"] = pa.array(xs[idx])
            out["_y"] = pa.array(ys[idx])
            out["cell"] = pa.array(ccy * n + ccx)
            out["_side"] = pa.array(np.ones(total, dtype=np.int8))
            return pa.table(out)

        return fn

    left_types = {f.name: f.type for f in left_ds.schema().base_schema}
    right_types = {f.name: f.type for f in right_ds.schema().base_schema}

    def pad(batch: pa.Table, missing, types) -> pa.Table:
        cols = {}
        for c in lk + rk:
            cols[c] = (
                pa.nulls(len(batch), type=types[c]) if c in missing else batch[c]
            )
        for c in ("_x", "_y", "cell", "_side"):
            cols[c] = batch[c]
        return pa.table(cols)

    out_names = lk + ["rank"] + rk + ["dist2"]

    def kernel(radius: float):
        r2 = radius * radius

        def per_cell(g: pa.Table) -> pa.Table:
            side = g["_side"].to_numpy(zero_copy_only=False)
            li = np.nonzero(side == 0)[0]
            ri = np.nonzero(side == 1)[0]
            sat_schema = {c: g[c].take(pa.array([], type=pa.int64())) for c in lk}
            sat_schema["rank"] = pa.array([], type=pa.int64())
            for c in rk:
                sat_schema[c] = g[c].take(pa.array([], type=pa.int64()))
            sat_schema["dist2"] = pa.array([], type=pa.float64())
            sat_schema["_sat"] = pa.array([], type=pa.int8())
            empty = pa.table(sat_schema)
            if not len(li):
                return empty
            lx = g["_x"].to_numpy(zero_copy_only=False)[li]
            ly = g["_y"].to_numpy(zero_copy_only=False)[li]
            parts = [empty]
            if len(ri):
                rx = g["_x"].to_numpy(zero_copy_only=False)[ri]
                ry = g["_y"].to_numpy(zero_copy_only=False)[ri]
                # deterministic candidate order: (right key) ascending so
                # argsort ties resolve identically everywhere
                rid0 = g[rk[0]].to_numpy(zero_copy_only=False)[ri]
                order = np.argsort(rid0, kind="stable")
                rx, ry, ri_o = rx[order], ry[order], ri[order]
            chunk = max(1, 2_000_000 // max(len(ri), 1))
            # vectorized emit: per chunk, satisfied rows expand to k rows
            # (repeat/tile/ravel), unsatisfied rows emit one sentinel row
            l_parts, rank_parts, r_parts, d2_parts, sat_parts = [], [], [], [], []
            for a in range(0, len(li), chunk):
                lsl = slice(a, min(len(li), a + chunk))
                m = lsl.stop - lsl.start
                if len(ri):
                    dx = lx[lsl, None] - rx[None, :]
                    dy = ly[lsl, None] - ry[None, :]
                    d2 = dx * dx + dy * dy
                    kk = min(k, d2.shape[1])
                    # STABLE full-row sort: candidates are pre-ordered by
                    # right id, so equal distances resolve by id — exact
                    # deterministic ties even at the k-th boundary
                    # (argpartition would pick arbitrarily there)
                    topi = np.argsort(d2, axis=1, kind="stable")[:, :kk]
                    topd = np.take_along_axis(d2, topi, axis=1)
                else:
                    topi = np.zeros((m, 0), dtype=np.int64)
                    topd = np.zeros((m, 0))
                cnt = topi.shape[1]
                gidx = li[np.arange(a, a + m)]
                if cnt >= k:
                    sat = topd[:, -1] <= r2
                else:
                    sat = np.zeros(m, dtype=bool)
                si = np.nonzero(sat)[0]
                if len(si):
                    l_parts.append(np.repeat(gidx[si], k))
                    rank_parts.append(np.tile(np.arange(k, dtype=np.int64), len(si)))
                    r_parts.append(ri_o[topi[si]].ravel())
                    d2_parts.append(topd[si].ravel())
                    sat_parts.append(np.ones(len(si) * k, dtype=np.int8))
                ui = np.nonzero(~sat)[0]
                if len(ui):
                    l_parts.append(gidx[ui])
                    rank_parts.append(np.full(len(ui), -1, dtype=np.int64))
                    r_parts.append(np.full(len(ui), -1, dtype=np.int64))
                    d2_parts.append(np.full(len(ui), np.nan))
                    sat_parts.append(np.zeros(len(ui), dtype=np.int8))
            if not l_parts:
                return empty
            l_all = np.concatenate(l_parts)
            cols = {}
            l_take = pa.array(l_all)
            for c in lk:
                cols[c] = g[c].take(l_take)
            cols["rank"] = pa.array(np.concatenate(rank_parts))
            r_idx = np.concatenate(r_parts)
            sat_all = np.concatenate(sat_parts)
            r_take = pa.array(np.where(r_idx >= 0, r_idx, 0))
            for c in rk:
                v = g[c].take(r_take)
                if (r_idx < 0).any():
                    mask = pa.array(r_idx < 0)
                    v = pa.compute.if_else(mask, pa.scalar(None, type=v.type), v)
                cols[c] = v
            cols["dist2"] = pa.array(np.concatenate(d2_parts))
            cols["_sat"] = pa.array(sat_all)
            return pa.table(cols)

        return per_cell

    results = []
    cur_left = left_ds
    radius = max(sx, sy)
    for _ in range(max_rounds):
        lt = cur_left.map_batches(tag_left, batch_format="pyarrow").map_batches(
            lambda b: pad(b, rk, right_types), batch_format="pyarrow"
        )
        rt = right_ds.map_batches(tag_right(radius), batch_format="pyarrow").map_batches(
            lambda b: pad(b, lk, left_types), batch_format="pyarrow"
        )
        import ray as _ray

        nparts = max(8, int(_ray.cluster_resources().get("CPU", 16)))
        rnd = (
            lt.union(rt)
            # coalesce: sort overhead is block-count-driven (geom_join.py)
            .repartition(nparts)
            .groupby("cell")
            .map_groups(kernel(radius), batch_format="pyarrow")
            .materialize()
        )
        sat = rnd.filter(expr="_sat == 1").drop_columns(["_sat"])
        results.append(sat)
        unsat = rnd.filter(expr="_sat == 0")
        n_unsat = unsat.count()
        if n_unsat == 0:
            break

        # unsatisfied lefts re-enter with doubled radius — selected from
        # the ORIGINAL left by primary key (the residue is sparse-region
        # points, driver-collectable; multi-column left keys must make
        # the first column unique)
        key0 = lk[0]
        keyset = set(unsat.to_pandas()[key0].tolist())

        def refilter(batch: pa.Table) -> pa.Table:
            vals = batch[key0].to_numpy(zero_copy_only=False)
            keep = np.fromiter((v in keyset for v in vals), dtype=bool, count=len(vals))
            return batch.filter(pa.array(keep))

        cur_left = left_ds.map_batches(refilter, batch_format="pyarrow")
        radius *= 2.0
    out = results[0]
    for r in results[1:]:
        out = out.union(r)
    return out
