"""Tile assignment + skew-aware tile statistics.

Cell keys are space-filling-curve codes (geom/hilbert.py — reference
precedent Shape/Fractal/HilbertCode.cs:111, MortonCode.cs:44).  The tile
stats groupby is the shuffle the north-star metric measures; skewed cells
(dense urban tiles — 30% of fixture pages land in ONE hot cell) are
handled by **pre-aggregation inside map_batches**: each task combines its
batch to per-cell partial counts, so the all-to-all exchange moves one row
per (task, cell) instead of one row per entity, and the hot cell costs the
same as any other.  This is combiner-style salting — the map-side combine
is exactly the FP-Hadoop-style skew split of SURVEY.md §4.2 expressed in
Ray Data terms.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.hilbert import WORLD, hilbert_cell, morton_cell


def assign_cells_batch(
    batch: pa.Table,
    level: int = 12,
    kind: str = "hilbert",
    lon_col: str = "lon",
    lat_col: str = "lat",
    out_col: str = "cell_id",
    extent=WORLD,
) -> pa.Table:
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    f = hilbert_cell if kind == "hilbert" else morton_cell
    cells = f(lon, lat, level, extent)
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(cells, type=pa.int64()))


def partial_cell_counts(batch: pa.Table, cell_col: str = "cell_id") -> pa.Table:
    """Map-side combiner: batch → (cell_id, partial_count)."""
    cells = batch[cell_col].to_numpy(zero_copy_only=False)
    uniq, counts = np.unique(cells, return_counts=True)
    return pa.table(
        {
            cell_col: pa.array(uniq, type=pa.int64()),
            "partial_count": pa.array(counts.astype(np.int64)),
        }
    )


def tile_stats(
    ds,
    cell_col: str = "cell_id",
    count_alias: str = "n",
    small_result: bool = True,
    shuffle_partitions: int = 32,
):
    """cell_id → row count, with map-side pre-aggregation before the shuffle.

    Equivalent to ds.groupby(cell).count() but the exchange carries partial
    counts (skew-proof: a hot cell adds one row per upstream task, not one
    per entity).  small_result=True merges the partials in one task — the
    key set here is STRUCTURALLY bounded by the grid (4^level cells
    regardless of data size), so this is scale-safe for level<=12 world
    grids; at higher levels set False for the key-colocating sort-groupby
    path (repartitioned first so the all-to-all task matrix stays small)."""
    partials = ds.map_batches(
        lambda b: partial_cell_counts(b, cell_col), batch_format="pyarrow"
    )
    if small_result:
        def merge(batch: pa.Table) -> pa.Table:
            cells = batch[cell_col].to_numpy(zero_copy_only=False)
            cnts = batch["partial_count"].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(cells, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inv, cnts)
            return pa.table({cell_col: pa.array(uniq, type=pa.int64()), count_alias: pa.array(sums)})

        def remerge(batch: pa.Table) -> pa.Table:
            cells = batch[cell_col].to_numpy(zero_copy_only=False)
            cnts = batch[count_alias].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(cells, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inv, cnts)
            return pa.table({cell_col: pa.array(uniq, type=pa.int64()), count_alias: pa.array(sums)})

        # two-level tree merge: a single-task concat of every upstream
        # block's partials is a serial tail (~5s at 500 blocks x 10k cells);
        # pre-combining in 8 groups shrinks the final task 8x
        lvl1 = partials.repartition(8).map_batches(merge, batch_format="pyarrow")
        return lvl1.repartition(1).map_batches(remerge, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    return (
        partials.repartition(shuffle_partitions)
        .groupby(cell_col)
        .aggregate(Sum("partial_count", alias_name=count_alias))
    )


def grouped_topk_min(
    ds,
    cell_col: str,
    val_col: str,
    k: int,
    small_result: bool = False,
    shuffle_partitions: int = 32,
):
    """Per cell: the k smallest distinct values of val_col, ranked.

    Min-k is a MERGEABLE aggregate, so the skewed cell costs the same as
    any other: each task emits at most k rows per cell it saw (map-side
    combine), and the final merge re-takes min-k.  The default merge is a
    key-colocating sort groupby over the pre-combined partials (no task
    ever holds more than its key range — safe at any cell cardinality);
    repartition(shuffle_partitions) first keeps the shuffle task matrix
    small (the all-to-all fixed cost scales with blocks^2, and partials
    are tiny).  small_result=True merges in ONE task instead — only valid
    when |cells| * k is block-sized (e.g. structurally bounded low-level
    grids)."""
    import pyarrow.compute as pc

    def _distinct_sorted_head(batch: pa.Table):
        """Pure-Arrow/numpy min-k kernel: distinct (cell, val), sort, keep
        the first k per cell; returns (table, per-row cumcount)."""
        t = (
            batch.select([cell_col, val_col])
            .group_by([cell_col, val_col], use_threads=False)
            .aggregate([])
        )
        idx = pc.sort_indices(
            t, sort_keys=[(cell_col, "ascending"), (val_col, "ascending")]
        )
        t = t.take(idx)
        cells = t[cell_col].to_numpy(zero_copy_only=False)
        if not len(cells):
            return t, np.empty(0, dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, cells[1:] != cells[:-1]])
        runs = np.diff(np.r_[starts, len(cells)])
        cum = np.arange(len(cells), dtype=np.int64) - np.repeat(starts, runs)
        keep = cum < k
        return t.filter(pa.array(keep)), cum[keep]

    def partial(batch: pa.Table) -> pa.Table:
        t, _ = _distinct_sorted_head(batch)
        return t

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        t, cum = _distinct_sorted_head(batch)
        return t.append_column("rank", pa.array(cum, type=pa.int64()))

    if small_result:
        return partials.repartition(1).map_batches(merge, batch_format="pyarrow")
    # large-cardinality path: bucket cells by deterministic hash, co-locate
    # each bucket with groupby(bucket).map_groups, and run the SAME
    # Arrow min-k merge per bucket.  Group count = shuffle_partitions
    # (so no per-tiny-group Python overhead), per-task memory = partial
    # rows / shuffle_partitions (hash-balanced), and every cell's rows meet
    # in exactly one task — safe at any cell cardinality.
    def add_bucket(batch: pa.Table) -> pa.Table:
        cells = batch[cell_col].to_numpy(zero_copy_only=False)
        b = (cells.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(64 - 32)
        return batch.append_column(
            "_bucket", pa.array((b % np.uint64(shuffle_partitions)).astype(np.int64))
        )

    def merge_bucket(g: pa.Table) -> pa.Table:
        return merge(g.drop_columns(["_bucket"]))

    return (
        partials.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def salt_hot_cells(
    batch: pa.Table,
    hot_cells: set,
    n_salt: int,
    cell_col: str = "cell_id",
    out_col: str = "salted_cell",
) -> pa.Table:
    """Split hot cell keys into `n_salt` deterministic subkeys.

    Used when downstream needs per-row grouping by cell (map_groups) rather
    than an algebraic aggregate: salted_cell = cell_id * n_salt + h(row) for
    hot cells, cell_id * n_salt otherwise.  h(row) is a deterministic hash
    of the row index within cell-stable columns, so results are reproducible
    across parallelism levels."""
    cells = batch[cell_col].to_numpy(zero_copy_only=False)
    base = cells * n_salt
    if hot_cells:
        hot_mask = np.isin(cells, np.fromiter(hot_cells, dtype=np.int64, count=len(hot_cells)))
        if hot_mask.any():
            # deterministic per-row salt from a stable id column if present
            if "doc_id" in batch.column_names:
                ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            else:
                ids = np.arange(len(batch), dtype=np.int64)
            salt = (ids * np.int64(2654435761)) % n_salt
            base = np.where(hot_mask, base + salt, base)
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(base, type=pa.int64()))


def find_hot_cells(ds, cell_col: str = "cell_id", threshold_frac: float = 0.01):
    """Cheap pre-pass: per-cell counts (combiner-aggregated), return the set
    of cells holding more than threshold_frac of all rows (SURVEY.md §4.2
    salting pre-pass) plus the stats Dataset.

    The hot-cell filter runs DATASET-side, so the driver only ever holds
    the hot set itself — bounded by 1/threshold_frac rows by construction —
    never the full per-cell stats table (millions of rows at level 14-16 on
    a 100-TB corpus).  The stats table stays a (materialized, spillable)
    Dataset for callers that want it."""
    stats_ds = tile_stats(ds, cell_col).materialize()
    total = stats_ds.sum("n")
    cut = int(total * threshold_frac)
    hot_df = stats_ds.filter(expr=f"n > {cut}").to_pandas()
    # a fully-filtered (zero-hot-cell) Dataset loses its schema on collect
    hot = set(hot_df[cell_col].tolist()) if cell_col in hot_df.columns else set()
    return hot, stats_ds
