"""Mergeable distinct-count sketch: KMV (k-minimum-values).

The classic bottom-k sketch (Bar-Yossef et al. 2002): hash every key
with a fixed integer hash, keep the k smallest DISTINCT hash values per
group.  The sketch is exactly mergeable (min-k of unions == union of
min-k's), so the distributed shape is a map-side partial (each task
ships at most groups x k int rows — independent of input size) followed
by a small per-group merge.  Estimator: exact count when fewer than k
distinct hashes survive, else (k-1) * M / h_k with M = 2^32.

Everything is integer arithmetic on a 32-bit Knuth multiplicative hash
((key * 2654435761) % 2^32 — products stay under 2^63 for int keys
< 2^31, so the SQL oracle reproduces the sketch AND the estimate
verbatim in BIGINT).  Deterministic at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

KMV_MULT = 2654435761
KMV_MOD = 1 << 32


def _kmv_hash(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """The single Knuth-hash definition the sketch/sample/split family
    shares — one copy, so engine and SQL-oracle replays cannot drift."""
    return ((keys.astype(np.int64) + np.int64(salt)) * np.int64(KMV_MULT)) % np.int64(
        KMV_MOD
    )


def kmv_distinct(
    ds,
    key_col: str,
    group_col: str,
    k: int = 64,
):
    """Approximate distinct ``key_col`` count per ``group_col``.

    Output per group: est_distinct (int64; exact when the group has
    < k distinct hashes), n_hashes (sketch fill, <= k), kth_hash (the
    k-th minimum, 0 when under-filled).
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                group_col: batch[group_col].to_pylist(),
                "hv": _kmv_hash(batch[key_col].to_numpy(zero_copy_only=False)),
            }
        ).drop_duplicates()
        df = df.sort_values([group_col, "hv"], kind="mergesort")
        df = df.groupby(group_col, as_index=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for grp, sub in g.drop_duplicates().groupby(group_col):
            hv = np.sort(sub["hv"].to_numpy())[:k]
            n = len(hv)
            if n < k:
                est = n
                kth = 0
            else:
                kth = int(hv[-1])
                est = (k - 1) * KMV_MOD // kth
            out.append(
                {
                    group_col: grp,
                    "est_distinct": np.int64(est),
                    "n_hashes": np.int64(n),
                    "kth_hash": np.int64(kth),
                }
            )
        return pd.DataFrame(out)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(group_col).map_groups(merge, batch_format="pandas")


def bottom_k_sample(
    ds,
    id_col: str,
    group_col: str,
    n: int,
    salt: int = 0,
):
    """Deterministic per-group sample of n rows: the n rows whose hashed
    ids are smallest (hash-order / bottom-k sampling).  Unlike
    random_shuffle + limit, the sample is a pure function of the data —
    reproducible across runs, parallelism levels, and engines (the SQL
    oracle replays it with a window rank) — and composable: the same
    rows are picked no matter how the input is partitioned.

    Distributed shape: per-batch local bottom-n partials (shuffle carries
    <= groups x n x tasks rows), then a per-group exact merge.  ``salt``
    varies the sample between runs when wanted while staying
    deterministic for a given value.

    Output: all of ds's columns for the sampled rows, plus sample_rank
    (0-based hash-order rank within the group).
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["_hv"] = _kmv_hash(batch[id_col].to_numpy(zero_copy_only=False), salt)
        df = df.sort_values([group_col, "_hv", id_col], kind="mergesort")
        return pa.Table.from_pandas(
            df.groupby(group_col, as_index=False).head(n), preserve_index=False
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["_hv", id_col], kind="mergesort").head(n)
        df = df.assign(sample_rank=np.arange(len(df), dtype=np.int64))
        return df.drop(columns=["_hv"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(group_col).map_groups(merge, batch_format="pandas")


def hash_split(
    ds,
    id_col: str,
    fractions: dict[str, float] | None = None,
    salt: int = 0,
):
    """Deterministic train/val/test split: each row's bucket is a pure
    function of its id (same Knuth hash as the sketches), so the split is
    reproducible across runs, engines and parallelism, and disjoint by
    construction.  Map-only — no shuffle.

    fractions: ordered {name: fraction} summing to 1.0 (default
    90/5/5 train/val/test).  Output: input columns + ``split`` (string).
    """
    if fractions is None:
        fractions = {"train": 0.90, "val": 0.05, "test": 0.05}
    names = list(fractions)
    cum = np.cumsum([fractions[n] for n in names])
    if abs(cum[-1] - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1.0")
    bounds = np.minimum((cum * KMV_MOD).astype(np.int64), KMV_MOD)

    def assign(batch: pa.Table) -> pa.Table:
        hv = _kmv_hash(batch[id_col].to_numpy(zero_copy_only=False), salt)
        idx = np.searchsorted(bounds, hv, side="right")
        split = np.asarray(names, dtype=object)[idx]
        return batch.append_column("split", pa.array(split, type=pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")
