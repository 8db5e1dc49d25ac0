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
        emb = np.asarray(batch[self.emb_col].to_pylist(), dtype=np.float64)
        emb = _normalize(emb)
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


def ann_topk(ds, queries_ref, k: int = 5):
    """Exact distributed cosine top-k: local top-k per batch, global reduce."""
    from ..stages.relational import top_k

    local = ds.map_batches(
        CosineTopK,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 2),
        num_cpus=1,
    )

    def rank_per_query(batch: pa.Table) -> pa.Table:
        # batch already sorted by (query_id asc, sim desc, vec_id asc)
        import pandas as pd

        df = batch.to_pandas()
        df["rank"] = df.groupby("query_id").cumcount()
        df = df[df["rank"] < k]
        return pa.Table.from_pandas(df, preserve_index=False)

    global_sorted = local.sort(["query_id", "sim", "vec_id"], descending=[False, True, False])
    # ranks are per-query → need contiguous per-query rows; repartition to 1
    # block is fine: result size is |Q|*k*tasks before cut, tiny.
    merged = global_sorted.repartition(1).map_batches(rank_per_query, batch_format="pyarrow")
    return merged


class IvfIndexer:
    """IVF bucket assignment: nearest of C deterministic centroids.

    Centroids are seeded from hashed unit directions (no data pass) —
    at scale you'd fit them on a sample; determinism matters more here.
    """

    def __init__(self, dim: int, n_centroids: int = 16, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.centroids = _normalize(rng.standard_normal((n_centroids, dim)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(np.asarray(batch["embedding"].to_pylist(), dtype=np.float64))
        sims = emb @ self.centroids.T
        bucket = sims.argmax(axis=1).astype(np.int64)
        return batch.append_column("ivf_bucket", pa.array(bucket))
