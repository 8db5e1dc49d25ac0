"""Large-large spatial join via cell-keyed shuffle (SURVEY.md §2.4).

Both sides get space-filling-curve cell keys; geometries/points near cell
borders are multiplexed into every cell their search envelope touches
(flat_map); a groupby(cell) co-partitions the sides and a per-cell local
kernel finds pairs.  The duplicate-candidate problem (a pair appears in
every shared cell) is solved with the report-at-reference-point rule: a
pair is emitted only by the cell containing the LEFT point — exactly
deterministic, so join output is row-identical at any parallelism level.

At 100 TB this is the join shape for two big tables (no broadcast side):
the shuffle moves each row ~(1 + border-fraction) times, and skewed cells
can be salted by subdividing (finer level for hot cells) before the
groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def within_distance_join(
    left_ds,
    right_ds,
    radius_1e2: int,
    level: int = 6,
    left_keys=("doc_id", "entity_idx"),
    right_keys=("event_id",),
    salt_threshold: int | None = None,
    n_salt: int = 16,
):
    """All (left, right) pairs with euclidean distance <= radius (integer
    cent coordinates, exact integer arithmetic — dist2 <= radius^2).

    Output: left_keys + right_keys + dist2 (int64).

    salt_threshold: when set, a cheap combiner pre-pass counts LEFT rows
    per cell; cells above the threshold are salted — left rows spread
    over n_salt deterministic subkeys, right rows replicated to every
    subkey — so a dense urban cell costs n_salt tasks instead of one
    giant dense distance matrix (SURVEY.md §4.2 skew split).  Output is
    identical with or without salting.
    """
    n = 1 << level
    world_w = 36000  # cents
    world_h = 18000
    r = int(radius_1e2)

    def cells_of(lon, lat, expand: bool):
        """Cell ids covered by [lon-r, lon+r] x [lat-r, lat+r] (expand) or
        the single containing cell.  Pure integer arithmetic (coords are
        integer cents) so cell assignment is deterministic cross-platform;
        floor is monotonic, so a left point within distance r of a right
        point always lands inside the right point's expanded cell range."""
        lon = lon.astype(np.int64)
        lat = lat.astype(np.int64)
        if expand:
            x0 = np.clip((lon - r + 18000) * n // world_w, 0, n - 1)
            x1 = np.clip((lon + r + 18000) * n // world_w, 0, n - 1)
            y0 = np.clip((lat - r + 9000) * n // world_h, 0, n - 1)
            y1 = np.clip((lat + r + 9000) * n // world_h, 0, n - 1)
            return x0, x1, y0, y1
        x = np.clip((lon + 18000) * n // world_w, 0, n - 1)
        y = np.clip((lat + 9000) * n // world_h, 0, n - 1)
        return x, x, y, y

    def tag(batch: pa.Table, keys, expand: bool, side: int) -> pa.Table:
        lon = batch["lon_1e2"].to_numpy(zero_copy_only=False)
        lat = batch["lat_1e2"].to_numpy(zero_copy_only=False)
        x0, x1, y0, y1 = cells_of(lon, lat, expand)
        sx = x1 - x0 + 1
        counts = (sx * (y1 - y0 + 1)).astype(np.int64)
        total = int(counts.sum())
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        # vectorized row-major (y outer, x inner) enumeration of each row's
        # cell rectangle: off = position within the row's block
        off = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        sx_r = np.repeat(sx, counts)
        cx = np.repeat(x0, counts) + off % sx_r
        cy = np.repeat(y0, counts) + off // sx_r
        cells = cy * n + cx
        out = {k: batch[k].take(pa.array(idx)) for k in keys}
        out["lon_1e2"] = batch["lon_1e2"].take(pa.array(idx))
        out["lat_1e2"] = batch["lat_1e2"].take(pa.array(idx))
        out["cell"] = pa.array(cells)
        out["side"] = pa.array(np.full(len(cells), side, dtype=np.int8))
        return pa.table(out)

    # multiplex RIGHT side into neighbor cells; LEFT stays in its own cell
    # (the pair is reported where the left point lives)
    lk = list(left_keys)
    rk = list(right_keys)
    left_t = left_ds.map_batches(
        lambda b: tag(b, lk, expand=False, side=0), batch_format="pyarrow"
    )
    right_t = right_ds.map_batches(
        lambda b: tag(b, rk, expand=True, side=1), batch_format="pyarrow"
    )

    hot_cells = set()
    if salt_threshold is not None:
        # combiner pre-pass with the hot filter applied DATASET-side: the
        # driver only ever collects the hot cells themselves — bounded by
        # total_rows / threshold — never the full per-cell stats table
        # (millions of rows at fine levels on a 100-TB corpus)
        from .tiling import tile_stats

        hot_df = (
            tile_stats(left_t, "cell", small_result=False)
            .filter(expr=f"n > {int(salt_threshold)}")
            .to_pandas()
        )
        # a fully-filtered (zero-hot-cell) Dataset loses its schema on
        # collect — the empty frame then has no 'cell' column at all
        hot_cells = (
            set(hot_df["cell"].astype(np.int64))
            if "cell" in hot_df.columns
            else set()
        )

    if hot_cells:
        hot_arr = np.fromiter(hot_cells, dtype=np.int64, count=len(hot_cells))
        S = np.int64(n_salt)

        def salt_left(batch: pa.Table) -> pa.Table:
            cells = batch["cell"].to_numpy(zero_copy_only=False)
            base = cells * S
            hot = np.isin(cells, hot_arr)
            if hot.any():
                # deterministic per-row salt from the first left key
                ids = batch[lk[0]].to_numpy(zero_copy_only=False).astype(np.int64)
                base = np.where(hot, base + (ids * np.int64(2654435761)) % S, base)
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

    # pad schemas to align for union
    def pad(batch: pa.Table, missing_keys) -> pa.Table:
        for k in missing_keys:
            batch = batch.append_column(k, pa.array([None] * len(batch), type=pa.int64()))
        return batch

    left_p = left_t.map_batches(lambda b: pad(b, rk), batch_format="pyarrow")
    right_p = right_t.map_batches(lambda b: pad(b, lk), batch_format="pyarrow")
    both = left_p.union(right_p)
    # coalesce before the groupby: the sort's fixed overhead is
    # block-count-driven (12x measured between 128 and 8 blocks on a
    # 57k-row exchange; see stages/geom_join.py)
    import ray as _ray

    both = both.repartition(max(8, int(_ray.cluster_resources().get("CPU", 16))))

    r2 = r * r

    def join_cell(g: pd.DataFrame) -> pa.Table:
        lefts = g[g["side"] == 0]
        rights = g[g["side"] == 1]
        if lefts.empty or rights.empty:
            return pa.table({k: pa.array([], type=pa.int64()) for k in lk + rk + ["dist2"]})
        lx = lefts["lon_1e2"].to_numpy()
        ly = lefts["lat_1e2"].to_numpy()
        rx = rights["lon_1e2"].to_numpy()
        ry = rights["lat_1e2"].to_numpy()
        # chunk the left side so the dense (chunk x R) distance matrix stays
        # ~32 MB no matter how hot the cell is (salting divides CPU work;
        # this bounds MEMORY).  np.nonzero is row-major, so chunk-by-chunk
        # concatenation reproduces the unchunked pair order byte-identically.
        chunk = max(1, 4_000_000 // max(len(rx), 1))
        ii_parts, jj_parts, d2_parts = [], [], []
        for a in range(0, len(lx), chunk):
            dx = lx[a : a + chunk, None] - rx[None, :]
            dy = ly[a : a + chunk, None] - ry[None, :]
            d2 = dx * dx + dy * dy
            ci, cj = np.nonzero(d2 <= r2)
            ii_parts.append(ci + a)
            jj_parts.append(cj)
            d2_parts.append(d2[ci, cj])
        ii = np.concatenate(ii_parts)
        jj = np.concatenate(jj_parts)
        d2v = np.concatenate(d2_parts)
        out = {}
        # the null-padded union promotes key columns to NaN-bearing float64
        # in pandas; cast back so every output block shares one int64 schema
        # (the driver value-hash distinguishes 42.0 from 42)
        for k in lk:
            out[k] = lefts[k].to_numpy()[ii].astype(np.int64)
        for k in rk:
            out[k] = rights[k].to_numpy()[jj].astype(np.int64)
        out["dist2"] = d2v.astype(np.int64)
        # emit ARROW: pandas return blocks here would mix with the Arrow
        # blocks every downstream map_batches(batch_format="pyarrow")
        # produces, and Ray refuses mixed block types in one dataset
        # (0-row pandas blocks in particular survive later map stages)
        return pa.table(out)

    return both.groupby("cell").map_groups(join_cell, batch_format="pandas")
