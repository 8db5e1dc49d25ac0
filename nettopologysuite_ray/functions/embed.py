"""Embedding-space operators: ANN similarity search + embedding dedup.

* brute-force cosine top-k — numpy matmul per batch against a broadcast
  query matrix (`ray.put` once; fetched per actor in __init__).  The
  baseline path, exact.
* IVF-bucketed variant — coarse k-means-ish centroids (deterministic
  seeding), probe only the nearest `nprobe` buckets; the scale path that
  turns the all-pairs matmul into a per-bucket matmul.
* embedding near-dup — cosine >= threshold pairs via the same broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class CosineTopK:
    """Actor stage: top-k most similar corpus vectors per broadcast query.

    Output: one row per (query_id, rank): query_id, rank, vec_id, sim.
    Each batch computes its LOCAL top-k per query; the global exact top-k
    is the downstream top_k reduce over (query_id, sim desc, vec_id) —
    at 100 TB no batch ships more than k rows per query.
    """

    def __init__(self, queries_ref, k: int = 5, id_col: str = "vec_id", emb_col: str = "embedding"):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = q["query_ids"]
        self.qm = _normalize(np.asarray(q["vectors"], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        emb = _normalize(_emb_matrix(batch[self.emb_col]))
        sims = self.qm @ emb.T  # (Q, B)
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows = np.arange(len(self.qids))[:, None]
        psims = sims[rows, part]
        pids = ids[part]
        order = np.lexsort((pids, -psims), axis=1)
        top_ids = pids[rows, order]
        top_sims = psims[rows, order]
        nq = len(self.qids)
        return pa.table(
            {
                "query_id": pa.array(np.repeat(self.qids, k), type=pa.int64()),
                "vec_id": pa.array(top_ids.ravel(), type=pa.int64()),
                "sim": pa.array(top_sims.ravel(), type=pa.float64()),
            }
        )


def _topk_merge_factory(k: int, with_rank: bool):
    def merge(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        df = df.sort_values(
            ["query_id", "sim", "vec_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        df = df.groupby("query_id", as_index=False).head(k)
        if with_rank:
            df["rank"] = df.groupby("query_id").cumcount()
        return pa.Table.from_pandas(df, preserve_index=False)

    return merge


def topk_tree_merge(local, k: int, fanout: int = 64, expected_blocks: int | None = None):
    """Per-query top-k reduction TREE: each level re-takes min-k per block,
    so no task ever holds more than (blocks_at_level x Q x k) rows — the
    mergeable-aggregate shape that avoids a global sort (top-k per query
    is mergeable: min-k of min-k partials is exact).

    The intermediate fanout level only pays for itself when the number of
    local-partial blocks exceeds `fanout` (each level is a repartition
    barrier with fixed cost, oversized for a handful of k-row partials).
    Lazy datasets can't report their block count, so callers that fan a
    large corpus out pass `expected_blocks` (they know input size /
    batch_size); below the threshold the tree collapses to the single
    final merge, which is exact either way."""
    if expected_blocks is not None and expected_blocks > fanout:
        local = local.repartition(fanout).map_batches(
            _topk_merge_factory(k, with_rank=False), batch_format="pyarrow"
        )
    return local.repartition(1).map_batches(
        _topk_merge_factory(k, with_rank=True), batch_format="pyarrow"
    )


def ann_topk(ds, queries_ref, k: int = 5, expected_blocks: int | None = None):
    """Exact distributed cosine top-k: local top-k per batch, then a
    per-query mergeable top-k tree (no global sort).  Pass
    `expected_blocks` ≈ corpus_rows / 4096 at scale so the merge tree
    adds its intermediate level only when there is enough fan-in."""
    local = ds.map_batches(
        CosineTopK,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 2),
        num_cpus=1,
    )
    return topk_tree_merge(local, k, expected_blocks=expected_blocks)


class IvfTopK:
    """IVF-probed cosine top-k: each query scores ONLY corpus vectors whose
    ivf_bucket is among the query's `nprobe` nearest centroid buckets —
    the per-batch matmul shrinks by the probe selectivity (the scale path
    for large corpora; exactness traded for recall)."""

    def __init__(
        self,
        queries_ref,
        dim: int,
        n_centroids: int = 16,
        nprobe: int = 4,
        k: int = 5,
        seed: int = 42,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        centroids_ref=None,
    ):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = np.asarray(q["query_ids"], dtype=np.int64)
        self.qm = _normalize(np.asarray(q["vectors"], dtype=np.float64))
        self.centroids = _resolve_centroids(centroids_ref, dim, n_centroids, seed)
        qsims = self.qm @ self.centroids.T
        # stable sort: equal-sim ties go to the LOWER centroid index, the
        # same tie-break the SQL oracle uses (ORDER BY sim DESC, cid)
        self.probe = np.argsort(-qsims, axis=1, kind="stable")[:, :nprobe]  # (Q, nprobe)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        emb = _normalize(_emb_matrix(batch[self.emb_col]))
        buckets = batch["ivf_bucket"].to_numpy(zero_copy_only=False)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            mask = np.isin(buckets, self.probe[qi])
            if not mask.any():
                continue
            sims = self.qm[qi] @ emb[mask].T
            sel_ids = ids[mask]
            k = min(self.k, len(sel_ids))
            part = np.argpartition(-sims, k - 1)[:k]
            order = np.lexsort((sel_ids[part], -sims[part]))
            out_q.append(np.full(k, qid, dtype=np.int64))
            out_v.append(sel_ids[part][order])
            out_s.append(sims[part][order])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )


def ivf_ann_topk(
    ds, queries_ref, dim: int, k: int = 5, n_centroids: int = 16, nprobe: int = 4,
    centroids_ref=None, expected_blocks: int | None = None,
    assign_margin: float | None = None,
):
    """End-to-end IVF-bucketed approximate top-k: bucket the corpus with
    IvfIndexer, probe-score per batch, merge with the same top-k tree.
    assign_margin: see IvfIndexer (oracle-gated callers pass 1e-12)."""
    bucketed = ds.map_batches(
        IvfIndexer,
        fn_constructor_kwargs={
            "dim": dim, "n_centroids": n_centroids, "centroids_ref": centroids_ref,
            "assign_margin": assign_margin,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 2),
        num_cpus=1,
    )
    local = bucketed.map_batches(
        IvfTopK,
        fn_constructor_kwargs={
            "queries_ref": queries_ref,
            "dim": dim,
            "n_centroids": n_centroids,
            "nprobe": nprobe,
            "k": k,
            "centroids_ref": centroids_ref,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 2),
        num_cpus=1,
    )
    return topk_tree_merge(local, k, expected_blocks=expected_blocks)


def _resolve_centroids(centroids_ref, dim: int, n_centroids: int, seed: int) -> np.ndarray:
    """Shared centroid resolution for IvfIndexer/IvfTopK: explicit
    data-derived centroids (broadcast once via ray.put — the k-means-style
    'seed from sampled data points' init, and SQL-reproducible), else
    seeded unit directions (no data pass needed)."""
    if centroids_ref is not None:
        c = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref
        return _normalize(np.asarray(c, dtype=np.float64))
    rng = np.random.default_rng(seed)
    return _normalize(rng.standard_normal((n_centroids, dim)))


class IvfIndexer:
    """IVF bucket assignment: nearest of C deterministic centroids.

    Centroids are either explicit data-derived vectors (broadcast ref) or
    seeded from hashed unit directions (no data pass) — at scale you'd
    fit them on a sample; determinism matters more here.

    assign_margin (default OFF): when set, assert that every vector's
    best-centroid sim beats the runner-up by > eps — a near-tie is the
    one case where a different BLAS build could flip the bucket (and
    break a SQL oracle that replays the assignment), so oracle-gated
    callers pass 1e-12 to fail LOUDLY instead of silently diverging.
    The library default is None because an exact tie is a legitimate
    data condition (duplicate / symmetric vectors equidistant from two
    centroids): np.argmax already breaks exact ties deterministically to
    the LOWEST centroid id — the same ORDER BY sim DESC, cid rule the
    oracle uses — so ties degrade recall by nothing and correctness by
    nothing, they just aren't provably BLAS-order-stable.
    """

    def __init__(
        self,
        dim: int,
        n_centroids: int = 16,
        seed: int = 42,
        centroids_ref=None,
        assign_margin: float | None = None,
    ):
        self.centroids = _resolve_centroids(centroids_ref, dim, n_centroids, seed)
        self.assign_margin = assign_margin

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch["embedding"]))
        sims = emb @ self.centroids.T
        bucket = sims.argmax(axis=1).astype(np.int64)
        if self.assign_margin is not None and sims.shape[1] >= 2 and len(sims):
            top2 = np.partition(sims, sims.shape[1] - 2, axis=1)[:, -2:]
            gap = top2[:, 1] - top2[:, 0]
            if gap.min() <= self.assign_margin:
                raise AssertionError(
                    f"IVF bucket assignment tie within {self.assign_margin}: "
                    "argmax is not BLAS-order-stable for this input"
                )
        return batch.append_column("ivf_bucket", pa.array(bucket))


# ---------------------------------------------------------------------------
# embedding near-dup: exact all-pairs cosine >= threshold


def _emb_matrix(col, dtype=np.float64) -> np.ndarray:
    """list<float> column → (n, dim) ndarray via the Arrow values buffer
    (no per-row Python lists)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.FixedSizeListArray):
        vals = arr.values.to_numpy(zero_copy_only=False)
        return vals.reshape(len(arr), -1).astype(dtype, copy=False)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    dim = int(widths[0]) if len(widths) else 0
    if len(widths) and not (widths == dim).all():
        raise ValueError("ragged embedding column")
    vals = arr.flatten().to_numpy(zero_copy_only=False)
    return vals.reshape(len(arr), dim).astype(dtype, copy=False)


def _pack_block_factory(id_col: str, emb_col: str):
    """batch → ONE packed row: ids + raw float64 matrix bytes.  Packing
    lets the pair stage fetch whole blocks from the object store zero-copy
    instead of re-parsing list rows."""

    def pack(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _emb_matrix(batch[emb_col])
        return pa.table(
            {
                "ids": pa.array([ids.tobytes()], type=pa.binary()),
                "mat": pa.array([np.ascontiguousarray(m).tobytes()], type=pa.binary()),
                "n": pa.array([len(ids)], type=pa.int64()),
                "dim": pa.array([m.shape[1] if len(ids) else 0], type=pa.int64()),
            }
        )

    return pack


def _unpack_rows(tbl: pa.Table):
    out = []
    for r in range(tbl.num_rows):
        n = tbl["n"][r].as_py()
        dim = tbl["dim"][r].as_py()
        ids = np.frombuffer(tbl["ids"][r].as_py(), dtype=np.int64)
        m = np.frombuffer(tbl["mat"][r].as_py(), dtype=np.float64).reshape(n, dim)
        nrm = np.sqrt((m * m).sum(axis=1))
        nrm[nrm == 0] = 1.0
        out.append((ids, m, nrm))
    return out


def embed_near_dup(
    ds,
    threshold: float = 0.42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    block_rows: int = 8192,
    max_blocks: int = 64,
):
    """Exact all-pairs embedding near-dup: every unordered pair with
    cosine(a, b) >= threshold, as (id_a < id_b, sim_1e4:int64).

    Shape: pack `block_rows` vectors per block (one object-store entry),
    then one task per block PAIR does the (B x B) float64 matmul — the
    quadratic work is decomposed into bounded-memory tasks that each read
    exactly two blocks zero-copy from the object store; no task and no
    driver ever holds the full corpus.  Partitioning assumption: exact
    all-pairs is inherently O((n/block_rows)^2) tasks — at corpus scale
    use the IVF-bucketed variant (IvfIndexer + intra-bucket pairs) when an
    approximate high-threshold join is acceptable.

    Cosine is computed as dot / (|a| * |b|) in float64 — the same
    associativity class as the SQL oracle's list_dot_product, so the
    rounded sim_1e4 column is hash-stable; sim_1e4 uses floor(x + 0.5)
    (= SQL ROUND's half-away-from-zero for positive sims).
    """
    import ray.data as rd

    packed = ds.map_batches(
        _pack_block_factory(id_col, emb_col),
        batch_format="pyarrow",
        batch_size=block_rows,
    ).materialize()
    n_packed = packed.count()
    if n_packed > max_blocks:
        raise ValueError(
            f"embed_near_dup: corpus packs into {n_packed} blocks of "
            f"{block_rows} rows, above the exact-all-pairs cap "
            f"max_blocks={max_blocks} (~{n_packed * (n_packed + 1) // 2} "
            "block-pair matmuls). This path is the small-corpus exact "
            "opt-in; at corpus scale use embed_near_dup_ivf (IVF-bucketed, "
            "streaming), or raise max_blocks explicitly if you really want "
            "the quadratic join."
        )
    refs = packed.to_arrow_refs()
    nb = len(refs)
    pair_items = [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]

    def score(batch: pa.Table) -> pa.Table:
        a_out, b_out, s_out = [], [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            left = _unpack_rows(ray.get(refs[i]))
            right = left if i == j else _unpack_rows(ray.get(refs[j]))
            for a in range(len(left)):
                ids_a, ma, na = left[a]
                b_start = a if i == j else 0
                for b in range(b_start, len(right)):
                    ids_b, mb, nbm = right[b]
                    if not len(ids_a) or not len(ids_b):
                        continue
                    sims = (ma @ mb.T) / (na[:, None] * nbm[None, :])
                    if i == j and a == b:
                        ii, jj = np.triu_indices(len(ids_a), k=1)
                        mask = sims[ii, jj] >= threshold
                        ii, jj = ii[mask], jj[mask]
                        sv = sims[ii, jj]
                    else:
                        ii, jj = np.nonzero(sims >= threshold)
                        sv = sims[ii, jj]
                    ia, ib = ids_a[ii], ids_b[jj]
                    lo = np.minimum(ia, ib)
                    hi = np.maximum(ia, ib)
                    a_out.append(lo)
                    b_out.append(hi)
                    s_out.append(np.floor(sv * 10000.0 + 0.5).astype(np.int64))
        if a_out:
            aa = np.concatenate(a_out)
            bb = np.concatenate(b_out)
            ss = np.concatenate(s_out)
        else:
            aa = bb = ss = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "id_a": pa.array(aa, type=pa.int64()),
                "id_b": pa.array(bb, type=pa.int64()),
                "sim_1e4": pa.array(ss, type=pa.int64()),
            }
        )

    return rd.from_items(pair_items).map_batches(
        score, batch_format="pyarrow", batch_size=1, num_cpus=1
    )


def _assert_pair_margins(sims: np.ndarray, threshold: float, eps_thresh: float, eps_round: float):
    """Oracle-safety margin assertions (fail LOUD, never silently flaky):
    no computed similarity may sit within eps_thresh of the >= threshold
    cut, and no KEPT similarity within eps_round of a 1e-4 rounding
    half-boundary — the two places where BLAS summation order vs the SQL
    oracle's sequential dot product could flip a row."""
    if not sims.size:
        return
    d = np.abs(sims - threshold)
    if d.min() < eps_thresh:
        raise AssertionError(
            f"cosine within {eps_thresh} of threshold {threshold}: "
            "result not BLAS-order-stable"
        )
    kept = sims[sims >= threshold]
    if kept.size:
        f = kept * 10000.0
        r = np.abs((f - np.floor(f)) - 0.5)
        if r.min() < eps_round:
            raise AssertionError(
                f"kept cosine within {eps_round} of a sim_1e4 rounding "
                "boundary: result not BLAS-order-stable"
            )


def embed_near_dup_ivf(
    ds,
    threshold: float = 0.42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 0,
    n_centroids: int = 16,
    centroids_ref=None,
    chunk_rows: int = 2048,
    eps_thresh: float = 1e-9,
    eps_round: float = 1e-7,
    assign_margin: float | None = None,
):
    """IVF-bucketed embedding near-dup — the 100-TB scale path: bucket
    every vector to its nearest centroid (IvfIndexer, broadcast
    centroids), then emit cosine >= threshold pairs WITHIN each bucket
    only.  Output: (id_a < id_b, sim_1e4:int64), each candidate pair
    generated exactly once (argmax bucketing is a partition of the
    corpus).

    Versus the exact `embed_near_dup`: streaming end-to-end — no
    `.materialize()` of the corpus and no O(blocks^2) task matrix; the
    single shuffle is the bucket groupby, and the quadratic work shrinks
    to sum over buckets of |bucket|^2.  Approximation: cross-bucket pairs
    are missed by design (raise n_centroids/recall via multi-assignment
    when that matters); a SQL oracle can replay the bucketing exactly
    (see __ray_entry__ embed_near_dup), which also makes the trade
    auditable.

    Partitioning assumption: a bucket is the unit of parallelism — size
    n_centroids so the largest bucket's rows fit one task (the intra-
    bucket matmul is chunked to bounded memory, so only the bucket's
    ROWS must fit, not |bucket|^2).

    Margin assertions (see _assert_pair_margins) make BLAS-order
    instability a loud failure instead of a flaky oracle mismatch.
    """

    def pairs_of_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _emb_matrix(t[emb_col])
        nrm = np.sqrt((m * m).sum(axis=1))
        nrm[nrm == 0] = 1.0
        n = len(ids)
        a_out, b_out, s_out = [], [], []
        for i0 in range(0, n, chunk_rows):
            i1 = min(i0 + chunk_rows, n)
            for j0 in range(i0, n, chunk_rows):
                j1 = min(j0 + chunk_rows, n)
                sims = (m[i0:i1] @ m[j0:j1].T) / (nrm[i0:i1, None] * nrm[None, j0:j1])
                if i0 == j0:
                    ii, jj = np.triu_indices(i1 - i0, k=1)
                    flat = sims[ii, jj]
                    _assert_pair_margins(flat, threshold, eps_thresh, eps_round)
                    keep = flat >= threshold
                    ii, jj, sv = ii[keep], jj[keep], flat[keep]
                else:
                    _assert_pair_margins(sims.ravel(), threshold, eps_thresh, eps_round)
                    ii, jj = np.nonzero(sims >= threshold)
                    sv = sims[ii, jj]
                ia = ids[i0:i1][ii]
                ib = ids[j0:j1][jj]
                a_out.append(np.minimum(ia, ib))
                b_out.append(np.maximum(ia, ib))
                s_out.append(np.floor(sv * 10000.0 + 0.5).astype(np.int64))
        aa = np.concatenate(a_out) if a_out else np.empty(0, dtype=np.int64)
        bb = np.concatenate(b_out) if b_out else np.empty(0, dtype=np.int64)
        ss = np.concatenate(s_out) if s_out else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "id_a": pa.array(aa, type=pa.int64()),
                "id_b": pa.array(bb, type=pa.int64()),
                "sim_1e4": pa.array(ss, type=pa.int64()),
            }
        )

    bucketed = ds.map_batches(
        IvfIndexer,
        fn_constructor_kwargs={
            "dim": dim,
            "n_centroids": n_centroids,
            "centroids_ref": centroids_ref,
            "assign_margin": assign_margin,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 2),
        num_cpus=1,
    )
    return bucketed.groupby("ivf_bucket").map_groups(
        pairs_of_bucket, batch_format="pyarrow"
    )
