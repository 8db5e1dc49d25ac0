"""Distributed Lloyd's k-means over an embedding column — the clustering
stage an LLM-data pipeline runs for semantic curation (cluster-balanced
sampling, semantic dedup prefilter) and to FIT the IVF coarse centroids
`functions/embed.py` consumes (`IvfIndexer(centroids_ref=...)`).

The reference ships the geometric substrate but no vector clustering, so
like `stages/cluster.py` this is an engine-level extension in the
SURVEY.md §2.8 spirit.

Determinism contract (what makes this oracle-checkable and row-identical
at any parallelism level):

- Embeddings are QUANTIZED once up front: q = round(x * scale) as int64
  (round half away from zero — the exact `to_cents` convention every
  other gate query uses, so DuckDB's ``round()`` replays it bit-exactly).
  All distances are then EXACT integer arithmetic — no float sum-order
  sensitivity anywhere in the loop.
- Centroids are themselves integer vectors: after each Lloyd step the
  new centroid is the coordinate-wise integer-rounded mean
  ``round_half_away(sum / n)`` computed in pure integer arithmetic
  (``(2s + n) // (2n)`` with sign handling), so the next assignment pass
  is again exact.  A centroid that attracts no points keeps its previous
  position (the classic empty-cluster rule).
- Assignment ties (equal dist2 to two centroids) go to the LOWER
  centroid id — np.argmin's first-minimum rule, replayed in SQL with
  ``ORDER BY d2, cid``.
- Init: the k vectors with the SMALLEST ids (a deterministic data-derived
  seed, expressible as ``ORDER BY id LIMIT k`` — at scale a mergeable
  min-k, not a sort).

Distributed shape: the quantized corpus is materialized once (k-means is
inherently multi-pass; Ray's object store spills it under pressure), each
Lloyd iteration is ONE map_batches pass emitting k×dim partial sums per
block plus a driver-side reduce of those (k × dim ints — bounded by
cluster count, not data), and new centroids are rebroadcast by closure
(4 KB).  No shuffle at all: the only exchange is the bounded partial-sum
collect, which is the textbook Ray Data k-means shape.

Overflow bound: |q| <= scale (unit-ish embeddings), so per-centroid sums
fit int64 while n_per_centroid * scale < 2^63 (~9e12 rows at scale 1e6);
beyond that, partial sums would move to float64 — documented, not hit at
any tested scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .embed import _emb_matrix


def _round_div_half_away(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Exact integer round(s / n) with .5 away from zero (s int64, n>0).

    Matches DuckDB's ``round()`` on the same rational value, replayed in
    SQL as ``CASE WHEN s >= 0 THEN (2*s + n) // (2*n) ELSE ... END``."""
    s = s.astype(np.int64)
    n = n.astype(np.int64)
    pos = (2 * np.abs(s) + n) // (2 * n)
    return np.where(s >= 0, pos, -pos)


def quantize_batch(batch: pa.Table, emb_col: str, scale: int) -> pa.Table:
    """float list column -> int64 list column 'q' (round half away from
    zero at ``scale``), other columns preserved."""
    m = _emb_matrix(batch[emb_col])  # float64 (n, dim)
    arr = pc.cast(
        pc.round(
            pc.multiply(
                pa.array(m.reshape(-1)), pa.scalar(float(scale))
            ),
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    )
    q = pa.FixedSizeListArray.from_arrays(arr, m.shape[1])
    out = batch.drop_columns([emb_col])
    return out.append_column("q", q)


def _assign(X: np.ndarray, C: np.ndarray):
    """Exact integer assignment: (cluster id, dist2) per row; ties to the
    LOWER centroid id (np.argmin first-minimum)."""
    # (n, k) distance matrix in chunks bounded to ~32 MB scratch
    n = len(X)
    cid = np.empty(n, dtype=np.int64)
    d2 = np.empty(n, dtype=np.int64)
    chunk = max(1, 4_000_000 // max(len(C), 1))
    for a in range(0, n, chunk):
        diff = X[a : a + chunk, None, :] - C[None, :, :]
        dist = (diff * diff).sum(axis=2)
        cc = dist.argmin(axis=1)
        cid[a : a + chunk] = cc
        d2[a : a + chunk] = dist[np.arange(len(cc)), cc]
    return cid, d2


def kmeans(
    ds,
    dim: int,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    scale: int = 10**6,
    checkpoint_dir: str | None = None,
):
    """Lloyd's k-means over ``ds[emb_col]`` (list<float>, width ``dim``).

    Returns (assignments Dataset with columns id_col/cluster/dist2,
    centroids int64 ndarray (k, dim) at ``scale``).  ``iters`` full Lloyd
    steps run after init; the returned assignment is computed against the
    final centroids.

    checkpoint_dir: when set, each completed Lloyd iteration writes its
    centroids as a lineage done-marker (state/lineage.py); a re-run with
    the same semantic params resumes from the highest completed iteration
    (``iters`` itself is NOT part of the hash — iteration i's centroids
    do not depend on how many more will run, so extending a finished
    3-iteration run to 5 re-uses the first 3)."""
    import json as _json

    from ..stages.relational import top_k

    q = ds.map_batches(
        lambda b: quantize_batch(b, emb_col, scale), batch_format="pyarrow"
    ).select_columns([id_col, "q"])
    # multi-pass algorithm: pin the quantized corpus in the object store
    # once (spills under pressure) instead of recomputing the upstream
    # read + quantize every iteration
    q = q.materialize()

    log = None
    start_iter = 0
    C = None
    if checkpoint_dir:
        from ..state.lineage import LineageLog

        log = LineageLog(
            checkpoint_dir,
            {
                "algo": "kmeans-lloyd-int",
                "k": k,
                "dim": dim,
                "scale": scale,
                "id_col": id_col,
                "emb_col": emb_col,
            },
        )
        for i in range(int(iters), 0, -1):
            if log.is_done(f"iter-{i}"):
                with open(log.marker_path(f"iter-{i}")) as f:
                    meta = _json.load(f)
                C = np.asarray(meta["metrics"]["centroids"], dtype=np.int64)
                start_iter = i
                break

    if C is None:
        seed = top_k(q, [id_col], k, descending=False).to_pandas()
        C = np.stack(seed.sort_values(id_col)["q"].to_numpy()).astype(np.int64)
        if C.shape != (k, dim):
            raise ValueError(
                f"kmeans: expected {k} seed rows of width {dim}, got {C.shape}"
            )

    for _it in range(start_iter, int(iters)):
        Cl = C  # rebind for closure capture (C mutates per iteration)

        def partial(batch: pa.Table, C=Cl) -> pa.Table:
            X = _emb_matrix(batch["q"], dtype=np.int64)
            cid, _ = _assign(X, C)
            sums = np.zeros((len(C), X.shape[1]), dtype=np.int64)
            np.add.at(sums, cid, X)
            counts = np.bincount(cid, minlength=len(C)).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(len(C), dtype=np.int64)),
                    "n": pa.array(counts),
                    "s": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums.reshape(-1)), X.shape[1]
                    ),
                }
            )

        # bounded collect: blocks x k rows of k x dim ints — the classic
        # Lloyd partial-sum reduce, independent of corpus size
        pdf = q.map_batches(partial, batch_format="pyarrow").to_pandas()
        grp = pdf.groupby("cid", sort=True)
        n_tot = grp["n"].sum().reindex(range(k), fill_value=0).to_numpy()
        s_tot = np.zeros((k, dim), dtype=np.int64)
        for cid_val, g in grp:
            s_tot[int(cid_val)] = np.stack(g["s"].to_numpy()).sum(axis=0)
        nz = n_tot > 0
        newC = C.copy()
        newC[nz] = _round_div_half_away(s_tot[nz], n_tot[nz][:, None])
        C = newC
        if log is not None:
            log.mark_done(
                f"iter-{_it + 1}",
                inputs=[],
                rows=int(n_tot.sum()),
                metrics={"centroids": C.tolist()},
            )

    Cf = C

    def final_assign(batch: pa.Table) -> pa.Table:
        X = _emb_matrix(batch["q"], dtype=np.int64)
        cid, d2 = _assign(X, Cf)
        return pa.table(
            {id_col: batch[id_col], "cluster": pa.array(cid), "dist2": pa.array(d2)}
        )

    return q.map_batches(final_assign, batch_format="pyarrow"), C


def fit_ivf_centroids(ds, dim: int, k: int = 16, iters: int = 4,
                      id_col: str = "vec_id", emb_col: str = "embedding",
                      scale: int = 10**6) -> np.ndarray:
    """k-means-fitted float centroids in the shape `IvfIndexer`
    consumes (`centroids_ref=ray.put(fit_ivf_centroids(...))`)."""
    _, C = kmeans(ds, dim, k=k, iters=iters, id_col=id_col,
                  emb_col=emb_col, scale=scale)
    return C.astype(np.float64) / float(scale)
