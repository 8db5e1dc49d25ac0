"""Deduplication operators for the training-data pipeline.

* exact           — hash-partition + per-group first (SQL-oracle-checkable)
* MinHash + LSH   — shingle → minhash signature → banded bucket groupby
* SimHash         — 64-bit fingerprint, near-dup by Hamming distance
* n-gram Jaccard  — exact Jaccard on shingle sets for candidate pairs

All hashing is deterministic (FNV/md5-based) — no Python hash() — so
results are identical across processes and parallelism levels.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_M61 = (1 << 61) - 1


def _stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def shingles(text: str, n: int = 3) -> set:
    """Word n-gram shingles."""
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    return np.fromiter(
        (_stable_u64(s) for s in shingles(text, n)), dtype=np.uint64
    )


class MinHasher:
    """Stateful minhash stage: permutation parameters generated once per
    actor (__init__), signatures per batch (__call__).

    num_perm hash functions h_i(x) = (a_i * x + b_i) mod p (p = 2^61-1),
    banded into `bands` LSH buckets of `rows` rows each.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, ngram: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _M61, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _M61, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.ngram = ngram
        # per-actor token hash cache: md5 per UNIQUE token, not per shingle
        # occurrence — vocabulary is small relative to the token stream
        self._token_hash: dict[str, int] = {}

    def _token_ids(self, toks) -> np.ndarray:
        cache = self._token_hash
        out = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            h = cache.get(t)
            if h is None:
                h = _stable_u64(t)
                cache[t] = h
            out[i] = h
        return out

    def signature(self, text: str) -> np.ndarray:
        toks = text.split()
        n = self.ngram
        if not toks:
            return np.full(self.num_perm, _M61, dtype=np.uint64)
        ids = self._token_ids(toks)
        if len(ids) < n:
            h = np.array([ids.sum(dtype=np.uint64)], dtype=np.uint64)
        else:
            # vectorized shingle hash: position-weighted combination of the
            # n token hashes (deterministic; no per-shingle string building)
            P1 = np.uint64(1099511628211)
            h = ids[: len(ids) - n + 1].copy()
            for k in range(1, n):
                h = h * P1 + ids[k : len(ids) - n + 1 + k]
            h = np.unique(h)
        # (P, S) matrix of permuted hashes; min over shingles
        v = (
            self.a[:, None] * (h[None, :] % _M61) + self.b[:, None]
        ) % np.uint64(_M61)
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sigs = np.stack([self.signature(t) for t in texts])
        out = batch.drop_columns([c for c in ("text",) if c in batch.column_names])
        # band keys: hash of each band's rows → LSH bucket ids
        band_keys = np.empty((len(texts), self.bands), dtype=np.int64)
        for b in range(self.bands):
            chunk = sigs[:, b * self.rows : (b + 1) * self.rows]
            mix = chunk[:, 0].copy()
            for r in range(1, self.rows):
                mix = mix * np.uint64(1099511628211) + chunk[:, r]
            band_keys[:, b] = (mix >> np.uint64(1)).astype(np.int64)
        out = out.append_column("minhash_sig", pa.array(list(sigs.astype(np.int64))))
        out = out.append_column("band_keys", pa.array(list(band_keys)))
        return out


def lsh_candidate_pairs(ds, id_col: str = "doc_id"):
    """Explode band keys → groupby(band, key) → per-bucket candidate pairs.

    The classic MinHash-LSH shuffle: pairs sharing ANY band bucket are
    candidates; exact-verify downstream with jaccard().  Dedup of the
    pair list across buckets happens in the final distinct.
    """

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        bks = batch["band_keys"].to_pylist()
        out_id, out_band, out_key = [], [], []
        for i, keys in zip(ids, bks):
            for b, k in enumerate(keys):
                out_id.append(i)
                out_band.append(b)
                out_key.append(k)
        return pa.table(
            {
                id_col: pa.array(out_id, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int32()),
                "bucket": pa.array(out_key, type=pa.int64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    # candidate buckets (>= 2 members) are RARE — count with a map-side
    # combiner, then pair only rows in those buckets.  Far cheaper than a
    # per-bucket map_groups over every singleton bucket (8000 tiny tasks).
    def bucket_counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["band", "bucket"], as_index=False).size()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = exploded.map_batches(bucket_counts, batch_format="pyarrow")

    def hot_and_pair(batch: pa.Table, rows_df: pd.DataFrame) -> pd.DataFrame:
        df = batch.to_pandas()
        tot = df.groupby(["band", "bucket"], as_index=False)["size"].sum()
        hot = tot[tot["size"] >= 2][["band", "bucket"]]
        members = rows_df.merge(hot, on=["band", "bucket"])
        out = set()
        for (_b, _k), g in members.groupby(["band", "bucket"]):
            ids = sorted(set(g[id_col].tolist()))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out.add((ids[i], ids[j]))
        pairs = sorted(out)
        return pd.DataFrame(
            {
                "id_a": pd.Series([p[0] for p in pairs], dtype="int64"),
                "id_b": pd.Series([p[1] for p in pairs], dtype="int64"),
            }
        )

    # the exploded table is small per-row (3 ints); collecting it into the
    # final single-task pairing is fine at any realistic near-dup density —
    # at extreme scale the same shape runs as a bucket-hash shuffle instead
    import ray

    rows_ref = ray.put(exploded.to_pandas())

    def finalize(batch: pa.Table) -> pa.Table:
        rows_df = ray.get(rows_ref)
        return pa.Table.from_pandas(hot_and_pair(batch, rows_df), preserve_index=False)

    return partials.repartition(1).map_batches(finalize, batch_format="pyarrow")


def jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    sa = shingles(text_a, n)
    sb = shingles(text_b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


class SimHasher:
    """64-bit SimHash fingerprints (stateful: token hash cache per actor)."""

    def __init__(self, ngram: int = 2):
        self.ngram = ngram

    def simhash(self, text: str) -> int:
        h = shingle_hashes(text, self.ngram)
        if len(h) == 0:
            return 0
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        score = bits.sum(axis=0) * 2 - len(h)
        out = np.uint64(0)
        for k in np.nonzero(score > 0)[0]:
            out |= np.uint64(1) << np.uint64(k)
        return int(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        vals = np.array([self.simhash(t) for t in texts], dtype=np.uint64)
        return batch.append_column(
            "simhash", pa.array(vals.astype(np.int64), type=pa.int64())
        )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    return np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", small_result: bool = True):
    """Exact dedup: md5(text) partition key → keep min id per group.

    The LineDissolver/KdTree-snap shape of SURVEY.md §2.8 exact dedup:
    canonical key + groupby.first.  Map-side combining keeps the shuffle
    at one row per (task, distinct text).  small_result=True merges the
    combined partials in one task (fine while |distinct| fits a block);
    at corpus scale set False for the hash-shuffle groupby path.
    """

    def keyed(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keys = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        df = pd.DataFrame({"text_key": keys, id_col: ids})
        g = df.groupby("text_key", as_index=False).agg(
            keep_id=(id_col, "min"), dup_count=(id_col, "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(keyed, batch_format="pyarrow")
    if small_result:
        def merge(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            g = df.groupby("text_key", as_index=False).agg(
                keep_id=("keep_id", "min"), dup_count=("dup_count", "sum")
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        return partials.repartition(1).map_batches(merge, batch_format="pyarrow")
    from ray.data.aggregate import Min, Sum

    return partials.groupby("text_key").aggregate(
        Min("keep_id", alias_name="keep_id"), Sum("dup_count", alias_name="dup_count")
    )
