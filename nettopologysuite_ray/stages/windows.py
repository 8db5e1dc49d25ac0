"""Time-window operators over event streams (engine-level additions).

The reference has no streaming/window surface (SURVEY.md §2.10) — these
are the Ray-Data-native window operators a web-scale event pipeline
needs, expressed as shuffle-light Dataset transforms:

- ``tumbling_window_agg``: fixed-width window rollups as a map-side
  combiner (one partial row per (task, window, key)) followed by a small
  groupby — the pre-aggregate-before-shuffle shape; the all-to-all
  carries partials whose count is bounded by windows x keys x tasks,
  independent of event count.
- ``sessionize_stats``: gap-based session windows per user.  Users are
  hash-bucketed into ``num_partitions`` groups and each partition is
  sessionized in ONE vectorized pandas pass (sort by (user, ts, id),
  vectorized gap/new-user breaks, cumsum session ids) — no per-user
  Python overhead, the same hash-bucket trick as the LSH pairing stage.
  Partitioning assumption: one user's events fit one task (the per-user
  skew bound); a pathological mega-user would need time-chunking with
  boundary stitching, which this corpus never approaches.

All arithmetic is integer-exact (epoch microseconds; money in cents) so
results are bit-deterministic at any parallelism and SQL-oracle-checkable
(see driver-contract determinism notes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

US = 1_000_000


def _epoch_us(col: pa.ChunkedArray) -> np.ndarray:
    """timestamp[us] column -> int64 epoch microseconds."""
    return col.to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)


def _value_cents(col: pa.ChunkedArray) -> np.ndarray:
    """DOUBLE money -> exact int64 cents (half-away-from-zero, matching
    DuckDB round()); keeps aggregate sums order-independent."""
    v = col.to_numpy(zero_copy_only=False)
    return np.sign(v).astype(np.int64) * np.floor(np.abs(v) * 100 + 0.5).astype(np.int64)


def _bucket(ids: np.ndarray, n: int) -> np.ndarray:
    """Deterministic hash bucket of int64 ids into [0, n) — the single
    definition both sessionize and as-of use (golden-ratio multiply);
    keeping one copy is what makes cross-operator co-location and oracle
    replay stay byte-identical."""
    return (
        (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n)
    ).astype(np.int64)


def tumbling_window_agg(
    ds,
    width_s: int,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    shuffle_partitions: int = 32,
):
    """Fixed-width tumbling-window rollup: (window_start, key) ->
    n_events, value_cents.

    window_start is the window's start in epoch SECONDS (int64):
    floor(epoch_us / width_us) * width_s.  A tumbling window IS the
    hopping window with slide == width (k == 1, each event in exactly
    one window) — delegated so the combiner shape exists once (equality
    asserted in tests/test_pipeline.py).
    """
    return hopping_window_agg(
        ds,
        width_s,
        width_s,
        ts_col=ts_col,
        key_col=key_col,
        value_col=value_col,
        shuffle_partitions=shuffle_partitions,
    )


def hopping_window_agg(
    ds,
    width_s: int,
    slide_s: int,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    shuffle_partitions: int = 32,
):
    """Hopping (sliding) window rollup: windows of ``width_s`` starting
    every ``slide_s`` (width must be a multiple of slide).  Each event is
    multiplexed into exactly width/slide windows — epoch-aligned, so
    w = (floor(t/slide) - off) * slide for off in [0, k) always satisfies
    w <= t < w + width with no filter.  Same map-side combiner shape as
    the tumbling window; shuffle volume scales with k, not event count.
    """
    if width_s % slide_s:
        raise ValueError("width_s must be a multiple of slide_s")
    k = width_s // slide_s
    slide_us = slide_s * US

    def partial(batch: pa.Table) -> pa.Table:
        tus = _epoch_us(batch[ts_col])
        base = tus // slide_us  # slide index containing t
        off = np.tile(np.arange(k, dtype=np.int64), len(tus))
        win = (np.repeat(base, k) - off) * np.int64(slide_s)
        df = pd.DataFrame(
            {
                "window_start": win,
                key_col: np.repeat(
                    np.asarray(batch[key_col].to_pylist(), dtype=object), k
                ),
                "vc": np.repeat(_value_cents(batch[value_col]), k),
            }
        )
        g = df.groupby(["window_start", key_col], as_index=False).agg(
            n_events=("vc", "size"), value_cents=("vc", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.repartition(shuffle_partitions)
        .groupby(["window_start", key_col])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_cents", alias_name="value_cents"),
        )
    )


def as_of_join(
    left_ds,
    right_ds,
    by_col: str = "user_id",
    ts_col: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    num_partitions: int = 32,
):
    """Inner as-of join: for each left row, the most recent right row of
    the same ``by_col`` with right ts <= left ts (ties among equal right
    timestamps broken to the max right id, so output is deterministic).
    Unmatched left rows are dropped (inner semantics — no null columns).

    Output: left_id ("id_l"), by_col, left epoch-µs ("tus_l"), matched
    right id ("id_r"), right epoch-µs ("tus_r"), lag_us (int64, >= 0).

    Shape: both sides hash-bucketed by ``by_col`` (same co-location trick
    as sessionize), each bucket joined in ONE vectorized
    ``pandas.merge_asof`` pass.  The all-to-all carries only
    (id, by, tus) int rows — payload columns join back afterwards if
    needed.  Skew bound = one by-key's rows per task.
    """

    def tag(side: int, idname: str):
        def fn(batch: pa.Table) -> pa.Table:
            idc = batch[left_id if side == 0 else right_id]
            by = batch[by_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "_id": idc.cast(pa.int64()),
                    by_col: pa.array(by),
                    "_h": pa.array(_bucket(by, num_partitions)),
                    "tus": pa.array(_epoch_us(batch[ts_col])),
                    "_side": pa.array(np.full(len(by), side, dtype=np.int8)),
                }
            )

        return fn

    def join_partition(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("id_l", by_col, "tus_l", "id_r", "tus_r", "lag_us")
        lefts = g[g["_side"] == 0]
        rights = g[g["_side"] == 1]
        if lefts.empty or rights.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        # deterministic tie-break: one right row per (by, tus) — max id
        r = (
            rights.sort_values([by_col, "tus", "_id"], kind="mergesort")
            .groupby([by_col, "tus"], as_index=False)
            .last()
        )
        lf = lefts.sort_values("tus", kind="mergesort")
        r = r.sort_values("tus", kind="mergesort")
        m = pd.merge_asof(
            lf[["_id", by_col, "tus"]],
            r[["_id", by_col, "tus"]],
            on="tus",
            by=by_col,
            direction="backward",
            allow_exact_matches=True,
            suffixes=("_l", "_r"),
        )
        m = m.dropna(subset=["_id_r"])
        out = pd.DataFrame(
            {
                "id_l": m["_id_l"].to_numpy(dtype=np.int64),
                by_col: m[by_col].to_numpy(dtype=np.int64),
                "tus_l": m["tus"].to_numpy(dtype=np.int64),
                "id_r": m["_id_r"].to_numpy(dtype=np.int64),
            }
        )
        tr = r.set_index("_id")["tus"]
        out["tus_r"] = tr.loc[out["id_r"]].to_numpy(dtype=np.int64)
        out["lag_us"] = out["tus_l"] - out["tus_r"]
        return out

    both = left_ds.map_batches(tag(0, left_id), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1, right_id), batch_format="pyarrow")
    )
    return both.groupby("_h").map_groups(join_partition, batch_format="pandas")


def sessionize_stats(
    ds,
    gap_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_partitions: int = 32,
):
    """Gap-based session windows: a new session starts when a user's
    inter-event gap exceeds gap_s.  Output one row per session:
    (user_id, sess_idx, n_events, ts_start_us, ts_end_us, value_cents),
    sess_idx counting each user's sessions from 0 in time order.
    """
    gap_us = gap_s * US

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                user_col: pa.array(uid),
                "_h": pa.array(_bucket(uid, num_partitions)),
                "tus": pa.array(_epoch_us(batch[ts_col])),
                id_col: batch[id_col],
                "vc": pa.array(_value_cents(batch[value_col])),
            }
        )

    def sessionize_partition(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    c: pd.Series([], dtype="int64")
                    for c in (user_col, "sess_idx", "n_events",
                              "ts_start_us", "ts_end_us", "value_cents")
                }
            )
        df = g.sort_values([user_col, "tus", id_col], kind="mergesort")
        uid = df[user_col].to_numpy()
        tus = df["tus"].to_numpy()
        new_user = np.empty(len(df), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        brk = new_user.copy()
        brk[1:] |= (tus[1:] - tus[:-1]) > gap_us
        sess = np.cumsum(brk) - 1  # global session id within this partition
        # per-user session index: global id minus the user's first global id
        first = pd.Series(np.where(new_user, sess, 0)).groupby(uid).transform("max")
        df = df.assign(_sess=sess, sess_idx=sess - first.to_numpy())
        out = df.groupby([user_col, "_sess", "sess_idx"], as_index=False).agg(
            n_events=("vc", "size"),
            ts_start_us=("tus", "min"),
            ts_end_us=("tus", "max"),
            value_cents=("vc", "sum"),
        )
        return out[
            [user_col, "sess_idx", "n_events", "ts_start_us", "ts_end_us", "value_cents"]
        ]

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby("_h").map_groups(sessionize_partition, batch_format="pandas")
