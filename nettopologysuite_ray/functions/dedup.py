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

    def __init__(
        self,
        num_perm: int = 64,
        bands: int = 16,
        ngram: int = 3,
        seed: int = 42,
        emit_shingles: bool = False,
    ):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _M61, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _M61, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.ngram = ngram
        # emit_shingles: also output each doc's unique shingle-hash set
        # (list<int64> "sh") so exact-Jaccard verification downstream never
        # re-reads/re-tokenizes the text — the expensive pass runs once
        self.emit_shingles = emit_shingles
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

    def shingle_set(self, text: str) -> np.ndarray:
        """Unique shingle hashes of text (uint64).  Distinct hashes are in
        1:1 correspondence with distinct word-n-gram strings (md5-based
        token hashes; collision probability negligible), so set sizes and
        intersections equal the exact string-shingle Jaccard quantities."""
        toks = text.split()
        n = self.ngram
        if not toks:
            return np.empty(0, dtype=np.uint64)
        ids = self._token_ids(toks)
        if len(ids) < n:
            return np.array([ids.sum(dtype=np.uint64)], dtype=np.uint64)
        # vectorized shingle hash: position-weighted combination of the
        # n token hashes (deterministic; no per-shingle string building)
        P1 = np.uint64(1099511628211)
        h = ids[: len(ids) - n + 1].copy()
        for k in range(1, n):
            h = h * P1 + ids[k : len(ids) - n + 1 + k]
        return np.unique(h)

    def signature(self, text: str, h: np.ndarray | None = None) -> np.ndarray:
        if h is None:
            h = self.shingle_set(text)
        if len(h) == 0:
            return np.full(self.num_perm, _M61, dtype=np.uint64)
        # (P, S) matrix of permuted hashes; min over shingles
        v = (
            self.a[:, None] * (h[None, :] % _M61) + self.b[:, None]
        ) % np.uint64(_M61)
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        shs = [self.shingle_set(t) for t in texts]
        sigs = np.stack([self.signature(t, h) for t, h in zip(texts, shs)])
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
        if self.emit_shingles:
            out = out.append_column(
                "sh",
                pa.array([h.astype(np.int64) for h in shs], type=pa.list_(pa.int64())),
            )
        return out


def lsh_candidate_pairs(ds, id_col: str = "doc_id", max_bucket: int = 10000, shuffle_partitions: int = 32):
    """Explode band keys → groupby(band, bucket) shuffle → per-bucket
    candidate pairs → distinct.

    The classic MinHash-LSH shuffle, fully distributed: the only all-to-all
    carries (id, band, bucket) int rows — docs × bands of them, independent
    of text size — and pairs sharing ANY band bucket are emitted where the
    bucket lives.  No driver-side materialization at any stage; a pair
    appearing in k buckets is deduped by a second (tiny, pair-keyed)
    shuffle.  Exact-verify candidates downstream with
    lsh_verified_pairs()/jaccard().

    max_bucket guards a degenerate hot bucket (m members emit m^2/2 pairs):
    buckets above the cap are skipped — at sane signature params a bucket
    that large means the docs are near-identical and already pair through
    their other bands.
    """

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        bks = np.asarray(batch["band_keys"].to_pylist(), dtype=np.int64)
        nb = bks.shape[1] if bks.ndim == 2 else 0
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, nb)),
                "band": pa.array(np.tile(np.arange(nb, dtype=np.int32), len(ids))),
                "bucket": pa.array(bks.reshape(-1)),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    # co-locate (band, bucket) groups by HASH BUCKET, not per-group tasks:
    # nearly every LSH bucket is a singleton, and a groupby over them pays
    # per-tiny-group Python overhead (~1ms x docs*bands groups); instead
    # each of `shuffle_partitions` hash partitions processes its share
    # with ONE vectorized pandas pass (size shuffle_partitions to the
    # cluster so a partition's share of the docs x bands int rows fits a
    # task's heap)

    def add_hash(batch: pa.Table) -> pa.Table:
        b = batch["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        k = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15) + b) >> np.uint64(32)
        return batch.append_column(
            "_h", pa.array((h % np.uint64(shuffle_partitions)).astype(np.int64))
        )

    def pair_partition(g: pd.DataFrame) -> pd.DataFrame:
        df = g[[id_col, "band", "bucket"]].drop_duplicates()
        # keep only multi-member buckets, vectorized
        sizes = df.groupby(["band", "bucket"])[id_col].transform("size")
        df = df[(sizes >= 2) & (sizes <= max_bucket)]
        if df.empty:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                }
            )
        # pair within each bucket by self-merge on the bucket key
        m = df.merge(df, on=["band", "bucket"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        out = m[[f"{id_col}_a", f"{id_col}_b"]].drop_duplicates()
        out.columns = ["id_a", "id_b"]
        return out

    pairs = (
        exploded.map_batches(add_hash, batch_format="pyarrow")
        .groupby("_h")
        .map_groups(pair_partition, batch_format="pandas")
    )

    # distinct (id_a, id_b): local dedup per block, then a pair-keyed
    # groupby over the (near-dup-density-sized) remainder
    def local_distinct(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    from ray.data.aggregate import Count

    deduped = (
        pairs.map_batches(local_distinct, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="nbuckets"))
    )
    return deduped.select_columns(["id_a", "id_b"])


def lsh_verified_pairs(
    sigs,
    id_col: str = "doc_id",
    threshold_num: int = 1,
    threshold_den: int = 2,
    num_partitions: int = 16,
    max_bucket: int = 10000,
):
    """MinHash-LSH candidates exact-verified by true n-gram Jaccard
    (distributed end-to-end; reference for the dedup role: SURVEY.md §2.8).

    sigs must carry id_col, band_keys and the per-doc unique shingle-hash
    set "sh" (MinHasher(emit_shingles=True)) — the expensive tokenize pass
    runs once; verification joins the (small) candidate pair list back to
    shingle sets with two hash-shuffle joins, never re-reading text.

    A pair qualifies when jaccard >= threshold_num/threshold_den, tested in
    exact integer arithmetic: threshold_den * |A∩B| >= threshold_num *
    |A∪B|.  Output: id_a, id_b, inter, uni (all int64) — deterministic at
    any parallelism, so the whole operator is SQL-oracle-checkable.
    """
    sigs = sigs.materialize()  # consumed twice: banding + shingle lookup
    cand = lsh_candidate_pairs(sigs, id_col=id_col, max_bucket=max_bucket)

    sh = sigs.select_columns([id_col, "sh"])

    def _packed(idname: str, shname: str):
        # Ray's hash join rejects list-typed payload columns; ship the
        # sorted int64 shingle set as its raw little-endian bytes instead
        def pack(b: pa.Table) -> pa.Table:
            packed = [
                np.asarray(v, dtype="<i8").tobytes() for v in b["sh"].to_pylist()
            ]
            return pa.table(
                {idname: b[id_col], shname: pa.array(packed, type=pa.binary())}
            )

        return sh.map_batches(pack, batch_format="pyarrow")

    sh_a = _packed("id_a", "sh_a")
    sh_b = _packed("id_b", "sh_b")
    j = cand.join(sh_a, "inner", num_partitions, on=("id_a",))
    j = j.join(sh_b, "inner", num_partitions, on=("id_b",))

    def verify(batch: pa.Table) -> pa.Table:
        ia = batch["id_a"].to_numpy(zero_copy_only=False)
        ib = batch["id_b"].to_numpy(zero_copy_only=False)
        sa = batch["sh_a"].to_pylist()
        sb = batch["sh_b"].to_pylist()
        inter = np.empty(len(ia), dtype=np.int64)
        uni = np.empty(len(ia), dtype=np.int64)
        for i in range(len(ia)):
            a = np.frombuffer(sa[i], dtype="<i8")
            b = np.frombuffer(sb[i], dtype="<i8")
            k = len(np.intersect1d(a, b, assume_unique=True))
            inter[i] = k
            uni[i] = len(a) + len(b) - k
        keep = threshold_den * inter >= threshold_num * uni
        return pa.table(
            {
                "id_a": pa.array(ia[keep]),
                "id_b": pa.array(ib[keep]),
                "inter": pa.array(inter[keep]),
                "uni": pa.array(uni[keep]),
            }
        )

    return j.map_batches(verify, batch_format="pyarrow")


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


def exact_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    small_result: bool = False,
    shuffle_partitions: int = 32,
):
    """Exact dedup: md5(text) partition key → keep min id per group.

    The LineDissolver/KdTree-snap shape of SURVEY.md §2.8 exact dedup:
    canonical key + groupby.first.  Map-side combining keeps the shuffle
    at one row per (task, distinct text).  The DEFAULT merge is a
    key-colocating sort groupby over the combined partials (no task ever
    holds more than its key range — at corpus scale distinct ≈ docs, so
    this is the only safe default); repartition(shuffle_partitions) first
    keeps the all-to-all task matrix small.  small_result=True merges in
    ONE task — only for inputs whose distinct-text count is known to fit
    a block.
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

    return (
        partials.repartition(shuffle_partitions)
        .groupby("text_key")
        .aggregate(
            Min("keep_id", alias_name="keep_id"),
            Sum("dup_count", alias_name="dup_count"),
        )
    )


def lsh_dedup(
    sigs,
    id_col: str = "doc_id",
    rounds: int | None = None,
    shuffle_partitions: int = 32,
):
    """Near-dup GROUP assignment (connected components over LSH buckets):
    each doc gets the min doc id of its connected near-dup cluster.

    The all-pairs candidate list is QUADRATIC in cluster size (a
    boilerplate page replicated 100x yields ~5,000 pairs per bucket) —
    for dedup you only need a representative, which is LINEAR: each
    bucket emits (member, bucket_min) star edges, then `rounds` of
    min-label propagation merge chains across buckets.  This is the
    100 TB-safe shape for web-scale boilerplate clusters.

    Output: (id_col, rep_id) — rep_id == min id of the cluster.
    Propagation runs to a FIXED POINT (stops when a round changes no
    label) with label-to-label shortcutting, so chains of length L
    converge in O(log L) rounds; `rounds` is only a safety cap
    (None, the default, means run until converged).

    Size shuffle_partitions to the cluster: each hash-join/aggregate
    partition runs an aggregator actor needing a CPU — more partitions
    than CPUs stalls the propagation joins.
    """
    from ray.data.aggregate import Min

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        bks = np.asarray(batch["band_keys"].to_pylist(), dtype=np.int64)
        nb = bks.shape[1] if bks.ndim == 2 else 0
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, nb)),
                "band": pa.array(np.tile(np.arange(nb, dtype=np.int32), len(ids))),
                "bucket": pa.array(bks.reshape(-1)),
            }
        )

    def add_hash(batch: pa.Table) -> pa.Table:
        b = batch["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        k = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15) + b) >> np.uint64(32)
        return batch.append_column(
            "_h", pa.array((h % np.uint64(shuffle_partitions)).astype(np.int64))
        )

    def star_edges(g: pd.DataFrame) -> pd.DataFrame:
        df = g[[id_col, "band", "bucket"]].drop_duplicates()
        mn = df.groupby(["band", "bucket"])[id_col].transform("min")
        out = pd.DataFrame({"a": df[id_col].to_numpy(), "b": mn.to_numpy()})
        out = out[out["a"] != out["b"]].drop_duplicates()
        return out

    from ray.data.aggregate import Count

    edges = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby("_h")
        .map_groups(star_edges, batch_format="pandas")
        # global distinct: the same (member, bucket_min) edge repeats once
        # per band (up to 16x) — dedup before the propagation rounds
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["a", "b"])
        .materialize()  # reused every propagation round
    )

    return _min_label_propagation(edges, id_col, rounds, shuffle_partitions)


def _label_checksum(labels) -> int:
    """Exact Python-int sum of the rep_id column (32-bit split keeps every
    per-batch partial inside int64; driver sums partials as Python ints).
    Labels only ever DECREASE under min propagation, so the sum strictly
    decreases iff any label changed — an O(labels) fixed-point detector
    with no join."""

    def part(batch: pa.Table) -> pa.Table:
        v = batch["rep_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = int((v & np.int64(0xFFFFFFFF)).sum())
        hi = int((v >> np.int64(32)).sum())
        return pa.table({"lo": pa.array([lo]), "hi": pa.array([hi])})

    rows = labels.map_batches(part, batch_format="pyarrow").take_all()
    return sum(int(r["lo"]) for r in rows) + (sum(int(r["hi"]) for r in rows) << 32)


def _min_label_propagation(
    edges, id_col: str, rounds: int | None, shuffle_partitions: int
):
    """Connected-component labels by min propagation over an undirected
    edge Dataset with columns (a, b), iterated to a FIXED POINT: each
    round flows labels across graph edges AND across the current
    (node -> rep) links themselves (pointer doubling / label-to-label
    shortcutting), so a path of diameter L converges in O(log L) rounds,
    and the loop stops as soon as a round changes no label.  `rounds` is
    only a safety cap (None = run to convergence); at the fixed point
    every edge has equal endpoint labels, so rep_id == the component min.
    Edges are materialized once by the caller."""
    from ray.data.aggregate import Min

    def seed(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        m = np.minimum(a, b)
        return pa.table(
            {
                id_col: pa.array(np.concatenate([a, b])),
                "rep_id": pa.array(np.concatenate([m, m])),
            }
        )

    labels = (
        edges.map_batches(seed, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Min("rep_id", alias_name="rep_id"))
        .materialize()
    )
    prev_sum = _label_checksum(labels)

    P = np.uint64(shuffle_partitions)

    def _hash_col(v):
        return ((v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % P

    it = 0
    while rounds is None or it < rounds:
        it += 1
        # propagate across BOTH edge directions.  The join is a bucketed
        # sort-merge (hash column + groupby(_h) + vectorized pandas merge
        # per bucket) — Ray's hash-shuffle join spins up aggregator actors
        # per call, which dominates wall time in an iterative loop.
        def tag_edge(batch: pa.Table) -> pa.Table:
            key = batch["b"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "a": batch["a"],
                    "b": batch["b"],
                    "side": pa.array(np.zeros(len(batch), dtype=np.int8)),
                    "_h": pa.array(_hash_col(key).astype(np.int64)),
                }
            )

        def tag_label(batch: pa.Table) -> pa.Table:
            key = batch[id_col].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "a": batch["rep_id"],  # payload: the label
                    "b": batch[id_col],    # join key
                    "side": pa.array(np.ones(len(batch), dtype=np.int8)),
                    "_h": pa.array(_hash_col(key).astype(np.int64)),
                }
            )

        def merge_bucket(g: pd.DataFrame) -> pa.Table:
            lab = g[g["side"] == 1][["b", "a"]].rename(columns={"a": "rep"})
            eg = g[g["side"] == 0][["a", "b"]]
            if lab.empty or eg.empty:
                return pa.table(
                    {
                        id_col: pa.array([], type=pa.int64()),
                        "rep_id": pa.array([], type=pa.int64()),
                    }
                )
            m = eg.merge(lab, on="b")
            # label flows to BOTH endpoints of the edge
            out = pd.DataFrame(
                {
                    id_col: np.concatenate([m["a"].to_numpy(), m["b"].to_numpy()]),
                    "rep_id": np.concatenate([m["rep"].to_numpy(), m["rep"].to_numpy()]),
                }
            ).drop_duplicates()
            return pa.table(
                {
                    id_col: pa.array(out[id_col].to_numpy().astype(np.int64)),
                    "rep_id": pa.array(out["rep_id"].to_numpy().astype(np.int64)),
                }
            )

        # symmetric edges: propagate across both directions by adding the
        # reversed copy once per round
        def rev(batch: pa.Table) -> pa.Table:
            return pa.table({"a": batch["b"], "b": batch["a"]})

        # pointer doubling: the current (node -> rep) links are edges of
        # the same component, so flowing labels across them gives
        # rep(v) <- rep(rep(v)) each round (O(log diameter) convergence)
        def label_edges(batch: pa.Table) -> pa.Table:
            return pa.table({"a": batch[id_col], "b": batch["rep_id"]})

        sym = (
            edges.union(edges.map_batches(rev, batch_format="pyarrow"))
            .union(labels.map_batches(label_edges, batch_format="pyarrow"))
        )
        prop = (
            sym.map_batches(tag_edge, batch_format="pyarrow")
            .union(labels.map_batches(tag_label, batch_format="pyarrow"))
            .groupby("_h")
            .map_groups(merge_bucket, batch_format="pandas")
            # normalize to ARROW blocks: map_groups can emit empty pandas
            # blocks for row-less partitions, and the union below feeds a
            # sort-based aggregate that refuses mixed block types
            .map_batches(lambda t: t, batch_format="pyarrow")
        )
        labels = (
            labels.union(prop)
            .groupby(id_col)
            .aggregate(Min("rep_id", alias_name="rep_id"))
            # bound the block count: groupby output blocks ≈ input blocks,
            # and the per-round union would otherwise compound ~3× per
            # round (1→5→17→53→…), turning scheduling overhead into the
            # dominant cost on long-diameter graphs
            .repartition(shuffle_partitions)
            .materialize()
        )
        new_sum = _label_checksum(labels)
        if new_sum == prev_sum:
            break  # fixed point: no label changed this round
        prev_sum = new_sum
    return labels


def near_dup_groups(
    sigs,
    id_col: str = "doc_id",
    threshold_num: int = 1,
    threshold_den: int = 2,
    rounds: int | None = None,
    num_partitions: int = 16,
):
    """Connected near-dup clusters over EXACT-Jaccard-verified LSH pairs:
    each doc in a cluster gets the cluster's min doc id.  The verified
    pair graph is output-bounded; labels come from distributed min-label
    propagation run to a fixed point with pointer doubling
    (SQL-oracle-checkable via a recursive CTE)."""
    pairs = lsh_verified_pairs(
        sigs,
        id_col=id_col,
        threshold_num=threshold_num,
        threshold_den=threshold_den,
        num_partitions=num_partitions,
    )
    edges = pairs.map_batches(
        lambda t: pa.table({"a": t["id_a"], "b": t["id_b"]}),
        batch_format="pyarrow",
    ).materialize()
    return _min_label_propagation(edges, id_col, rounds, num_partitions)
