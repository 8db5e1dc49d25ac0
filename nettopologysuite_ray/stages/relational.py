"""Relational stages, Ray-Data-first.

The engine's non-spatial query surface: broadcast hash joins (small side
via ray.put, no shuffle), combiner-style grouped aggregates (map-side
partial aggregation so the exchange carries one row per (task, key)), and
global top-k (per-batch prune, then sort+limit on the shrunken stream).

Determinism policy: monetary/ratio doubles are aggregated as exact
integer cents (`*_1e2` columns) so results are bit-identical across any
parallelism level and match a sequential SQL oracle — floating sums are
order-dependent and would break the row-for-row match the north_rule
demands.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count, Max, Min, Sum


def to_cents(col: pa.ChunkedArray | pa.Array, scale: int = 100) -> pa.Array:
    """Exact integer cents from a 2-decimal double column.

    round_mode half_towards_infinity == SQL round() (half away from
    zero), so a value*scale landing exactly on .5 converts identically
    in the engine and in every DuckDB oracle (pyarrow's default
    half_to_even would diverge on ties)."""
    return pc.cast(
        pc.round(
            pc.multiply(col, pa.scalar(float(scale))),
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    )


def broadcast_join_batch(batch: pa.Table, small, key, how: str = "inner"):
    """Arrow batch ⋈ broadcast dimension table, generic path (multi-key or
    duplicate-key dimensions): pyarrow's hash join, re-sorted to
    (probe row, dimension row) order so output is deterministic at any
    parallelism level.  No pandas conversion in either direction."""
    keys = [key] if isinstance(key, str) else list(key)
    small_tbl = (
        small
        if isinstance(small, pa.Table)
        else pa.Table.from_pandas(small, preserve_index=False)
    )
    b = batch.append_column(
        "__probe_idx", pa.array(np.arange(len(batch), dtype=np.int64))
    )
    s = small_tbl.append_column(
        "__dim_idx", pa.array(np.arange(len(small_tbl), dtype=np.int64))
    )
    joined = b.join(
        s,
        keys=keys,
        join_type="inner" if how == "inner" else "left outer",
        left_suffix="_x",
        right_suffix="_y",
    )
    joined = joined.sort_by(
        [("__probe_idx", "ascending"), ("__dim_idx", "ascending")]
    )
    return joined.drop_columns(["__probe_idx", "__dim_idx"])


class BroadcastJoin:
    """Actor-pool broadcast hash join: dimension table fetched from the
    object store ONCE per actor (__init__), joined per batch (__call__).
    The broadcast-join shape of SURVEY.md §2.4 for non-spatial keys.

    Hot path is Arrow-native: a single-column key against a UNIQUE-key
    dimension table is one `pc.index_in` hash probe + `take` of the
    payload columns — no pandas conversion of the probe batch, probe row
    order preserved, output columns = batch columns + dimension payload
    (same layout the pandas merge produced).  Multi-key or duplicate-key
    dimensions (row-multiplying joins) fall back to the generic pandas
    merge; both current engine queries take the fast path."""

    def __init__(self, small_ref, key, how: str = "inner"):
        small = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        self.key = key
        self.how = how
        single = isinstance(key, str)
        tbl = small if isinstance(small, pa.Table) else pa.Table.from_pandas(
            small, preserve_index=False
        )
        keys_unique = False
        if single and how in ("inner", "left"):
            kc = tbl[key].combine_chunks()
            keys_unique = pc.count_distinct(kc).as_py() == len(tbl) and kc.null_count == 0
        if keys_unique:
            self.build_keys = kc
            self.payload = tbl.drop_columns([key]).combine_chunks()
            self.small = None
        else:
            self.build_keys = None
            self.small = tbl.to_pandas() if not isinstance(small, pd.DataFrame) else small

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.build_keys is None:
            return broadcast_join_batch(batch, self.small, self.key, self.how)
        idx = pc.index_in(batch[self.key], value_set=self.build_keys)
        if self.how == "inner":
            keep = pc.is_valid(idx)
            if not pc.all(keep).as_py():
                batch = batch.filter(keep)
                idx = pc.filter(idx, keep)
        taken = self.payload.take(idx)  # null idx → null payload row (left join)
        probe_names = set(batch.column_names)
        for name in taken.column_names:
            if name in probe_names:
                # same _x/_y disambiguation as the pandas-merge fallback,
                # so output schema does not depend on which path ran
                i = batch.column_names.index(name)
                batch = batch.set_column(i, f"{name}_x", batch[name])
                batch = batch.append_column(f"{name}_y", taken[name])
            else:
                batch = batch.append_column(name, taken[name])
        return batch


def grouped_sum(ds, keys, sum_cols, count_alias: str | None = None, small_result: bool = True):
    """groupby(keys).sum(sum_cols) with map-side combining.

    Each upstream task first aggregates its batch to one row per key, so
    the all-to-all shuffle moves |tasks|x|keys| rows instead of the full
    dataset — the skew-proof aggregate shape (SURVEY.md §4.2).

    small_result=True (the default) is for STRUCTURALLY bounded key sets —
    group-by-category rollups (returnflag/status, region, lang) whose
    cardinality does not grow with data size: the partials coalesce to one
    block and a single-task reduce replaces the sort shuffle (~6s less
    fixed overhead per query at this cluster size).  Set False whenever
    |keys| scales with the data (per-cell stats at high tile levels,
    per-entity rollups) for the key-colocating sort-groupby path."""
    keys = list(keys)
    sum_cols = list(sum_cols)

    def _rename(g: pa.Table, mapping: dict) -> pa.Table:
        return g.rename_columns([mapping.get(n, n) for n in g.column_names])

    def combine(batch: pa.Table) -> pa.Table:
        # pure-Arrow partial (no pandas copy): hash groupby inside the task
        aggs = [(c, "sum") for c in sum_cols]
        if count_alias:
            aggs.append(([], "count_all"))
        g = (
            batch.select(keys + sum_cols)
            .group_by(keys, use_threads=False)
            .aggregate(aggs)
        )
        mapping = {f"{c}_sum": c for c in sum_cols}
        if count_alias:
            mapping["count_all"] = count_alias
        return _rename(g, mapping)

    partials = ds.map_batches(combine, batch_format="pyarrow")
    if small_result:
        final_cols = sum_cols + ([count_alias] if count_alias else [])

        def merge(batch: pa.Table) -> pa.Table:
            g = batch.group_by(keys, use_threads=False).aggregate(
                [(c, "sum") for c in final_cols]
            )
            return _rename(g, {f"{c}_sum": c for c in final_cols})

        return partials.repartition(1).map_batches(merge, batch_format="pyarrow")
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    if count_alias:
        aggs.append(Sum(count_alias, alias_name=count_alias))
    return partials.repartition(32).groupby(keys).aggregate(*aggs)


def top_k(ds, sort_cols, k: int, descending=True):
    """Global top-k: per-batch prune to k, then exact sort+limit.

    The per-batch prune means the final sort sees at most k rows per block
    — no full-data sort at scale."""
    if isinstance(descending, bool):
        descending = [descending] * len(sort_cols)

    def prune(batch: pa.Table) -> pa.Table:
        # pure-Arrow: stable sort indices, take the first k (zero pandas copy)
        idx = pc.sort_indices(
            batch,
            sort_keys=[
                (c, "descending" if d else "ascending")
                for c, d in zip(sort_cols, descending)
            ],
        )
        return batch.take(idx[:k])

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    out = pruned.sort(list(sort_cols), descending=list(descending)).limit(k)
    return out


def distinct(ds, cols):
    """Exact distinct over columns with map-side dedup before the shuffle."""
    cols = list(cols)

    def local(batch: pa.Table) -> pa.Table:
        # pure-Arrow distinct: group_by with no aggregates
        return batch.select(cols).group_by(cols, use_threads=False).aggregate([])

    partials = ds.map_batches(local, batch_format="pyarrow")
    return partials.groupby(cols).aggregate(Count(alias_name="_c")).drop_columns(["_c"])


def grouped_min_max_count(ds, keys, col):
    """Exact (order-independent) stats: count/min/max per key with map-side
    combining."""
    keys = list(keys)

    def combine(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(keys + [col])
            .group_by(keys, use_threads=False)
            .aggregate([([], "count_all"), (col, "min"), (col, "max")])
        )
        ren = {"count_all": "_n", f"{col}_min": "_mn", f"{col}_max": "_mx"}
        return g.rename_columns([ren.get(n, n) for n in g.column_names])

    partials = ds.map_batches(combine, batch_format="pyarrow")
    return partials.groupby(keys).aggregate(
        Sum("_n", alias_name="n"),
        Min("_mn", alias_name="min_" + col),
        Max("_mx", alias_name="max_" + col),
    )


def grouped_quantiles(
    ds,
    value_col: str,
    group_col: str,
    q_pcts=(50, 90, 99),
    scale: int = 100,
):
    """Exact distributed quantiles over a quantized (money-like) value
    domain — no global sort.  Map-side partial: (group, value_cents,
    count) rows, so the exchange is bounded by each task's DISTINCT
    values (the quantized-domain assumption; for unbounded real domains
    use a sketch instead).  Per-group merge re-aggregates counts, sorts
    the (small) distinct-value list and reads each quantile at 1-based
    rank ceil(q * n / 100) — the "discrete lower quantile" definition a
    SQL oracle can replay with a cumulative-sum window.

    Output rows: (group_col, q_pct int64, quantile_cents int64).
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {group_col: batch[group_col], "vc": to_cents(batch[value_col], scale)}
        )
        g = t.group_by([group_col, "vc"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(
            ["cnt" if n == "count_all" else n for n in g.column_names]
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby([group_col, "vc"], as_index=False)["cnt"].sum()
        out = []
        for grp, sub in agg.groupby(group_col):
            sub = sub.sort_values("vc", kind="mergesort")
            vals = sub["vc"].to_numpy()
            cum = np.cumsum(sub["cnt"].to_numpy())
            n = int(cum[-1])
            for q in q_pcts:
                rank = (q * n + 99) // 100  # ceil(q*n/100), 1-based
                idx = int(np.searchsorted(cum, rank, side="left"))
                out.append(
                    {
                        group_col: grp,
                        "q_pct": np.int64(q),
                        "quantile_cents": np.int64(vals[idx]),
                    }
                )
        return pd.DataFrame(out)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(group_col).map_groups(merge, batch_format="pandas")
