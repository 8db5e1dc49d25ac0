"""Distributed density clustering — deterministic DBSCAN over a point
Dataset (the PostGIS ``ST_ClusterDBSCAN`` role; the reference ships the
geometric substrate — DistanceOp, STRtree — but no density clustering, so
this is an engine-level extension in the spirit of SURVEY.md §2.8).

Semantics (the DETERMINISTIC variant — classic DBSCAN's border
assignment depends on visit order, which has no place in a distributed
engine where output must be row-identical at any parallelism level):

- ``core``: a point with >= ``min_pts`` points within ``eps`` (the point
  itself included, the standard convention; distance test is
  ``dist2 <= eps^2`` in exact integer-cent arithmetic).
- clusters: connected components of the core-core eps-graph; the cluster
  label is the MIN core id of the component (an isolated core — no other
  core within eps — is its own singleton cluster).
- ``border``: a non-core point with at least one core within eps; it
  joins the MIN cluster label among its core neighbors (classic DBSCAN
  assigns the first-visiting core's cluster; min is the canonical
  deterministic choice).
- ``noise``: everything else, labelled -1.

Distributed shape (every step is a bounded shuffle, nothing collects to
the driver, every per-bucket kernel is vectorized pandas/numpy):

1. eps-pairs via the cell-keyed shuffle join (`cell_join.py`) — exact
   integer arithmetic, report-at-left-cell dedup, optional hot-cell
   salting; left = right = the point table, so the ordered pair list is
   symmetric by construction ((a,b) and (b,a) both present exactly once).
2. core flags: one ``groupby(id).count`` over the pairs gives degrees;
   the core-id set is a filter over that bounded table.
3. flag attachment: two hash-bucketed co-group passes (the same
   fixed-schema union + groupby(_h) + per-bucket `isin` shape
   `functions/dedup.py` uses for its propagation joins — Ray's native
   hash join is avoided) classify every ordered pair into core-core
   edges and border candidacies without ever shipping the point table.
4. components: min-label propagation to a fixed point (pointer doubling,
   O(log diameter) rounds — reused verbatim from `functions/dedup.py`).
5. label assembly: three more bucketed co-groups keyed by core id then
   point id, all vectorized merges.

At 100 TB the dominant cost is step 1's pair generation (the same join
the `within_distance_join` gate row exercises, salting included); all
later exchanges carry at most the edge list or one row per point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .cell_join import within_distance_join

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _hash_bucket(v: np.ndarray, partitions: int) -> np.ndarray:
    return (
        ((v.astype(np.uint64) * _GOLD) >> np.uint64(32)) % np.uint64(partitions)
    ).astype(np.int64)


def _sym_pairs(points, id_col: str, eps_1e2: int, level: int, salt_threshold, n_salt):
    """Symmetric ordered eps-pair list (id_col, _nbr), self-pairs removed."""
    left = points.select_columns([id_col, "lon_1e2", "lat_1e2"])

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["_nbr" if c == id_col else c for c in b.column_names])

    right = left.map_batches(rename, batch_format="pyarrow")
    pairs = within_distance_join(
        left,
        right,
        radius_1e2=eps_1e2,
        level=level,
        left_keys=(id_col,),
        right_keys=("_nbr",),
        salt_threshold=salt_threshold,
        n_salt=n_salt,
    )

    def drop_self(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.not_equal(b[id_col], b["_nbr"])).select(
            [id_col, "_nbr"]
        )

    return pairs.map_batches(drop_self, batch_format="pyarrow")


def dbscan(
    points,
    eps_1e2: int,
    min_pts: int,
    id_col: str = "pt_id",
    level: int = 6,
    salt_threshold: int | None = None,
    n_salt: int = 16,
    shuffle_partitions: int = 16,
):
    """Deterministic DBSCAN over a Dataset with integer-cent coordinates
    (`id_col`, lon_1e2, lat_1e2).  Returns (`id_col`, cluster int64,
    role string) — cluster == -1 for noise, else the min core id of the
    cluster; role in {'core','border','noise'}.  Output is row-identical
    at any parallelism level (every tie broken by MIN).

    min_pts must be >= 2 (min_pts == 1 degenerates to "every point is a
    singleton cluster", which needs no clustering engine)."""
    if min_pts < 2:
        raise ValueError("dbscan: min_pts must be >= 2")
    from ..functions.dedup import _min_label_propagation

    P = int(shuffle_partitions)
    # pin the eps-pair list: both flag passes read it — without the pin
    # every consumer re-runs the cell join (the most expensive exchange
    # in the pipeline)
    pairs = _sym_pairs(points, id_col, eps_1e2, level, salt_threshold, n_salt).materialize()

    # Fixed co-group row schema: (key, v, w, src) — src=1 rows carry the
    # small side (core ids / labels), src=0 rows the streaming side.
    def _rows(key, v, w, src, part):
        return pa.table(
            {
                "key": pa.array(key),
                "v": pa.array(v),
                "w": pa.array(w),
                "src": pa.array(np.full(len(key), src, dtype=np.int8)),
                "_h": pa.array(_hash_bucket(key, part)),
            }
        )

    def tag_core_set(b: pa.Table) -> pa.Table:
        c = b[id_col].to_numpy(zero_copy_only=False)
        z = np.zeros(len(c), dtype=np.int64)
        return _rows(c, z, z, 1, P)

    # -- steps 2+3 fused: TWO bucketed shuffles classify every pair.
    # Routing a pair row by hash(endpoint) puts that endpoint's ENTIRE
    # neighbor list in one bucket (the pair list is symmetric), so its
    # degree — and therefore its core flag (degree >= min_pts - 1, self
    # counted separately) — is computable in-bucket with one np.unique.
    # No separate degree groupby, no core-set side to union in.
    # NOTE: every per-group fn below returns ARROW — Ray passes 0-row
    # blocks through later map stages unprocessed, so an empty pandas
    # return would plant a sticky pandas block that crashes the first
    # sort-based aggregate over a union with Arrow blocks.
    thresh = int(min_pts) - 1

    def tag_by_a(b: pa.Table) -> pa.Table:
        a = b[id_col].to_numpy(zero_copy_only=False)
        nb = b["_nbr"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(a),
                "v": pa.array(nb),
                "_h": pa.array(_hash_bucket(a, P)),
            }
        )

    def flag_a(g: pd.DataFrame) -> pa.Table:
        a = g["key"].to_numpy().astype(np.int64)
        bb = g["v"].to_numpy().astype(np.int64)
        _, inv, cnt = np.unique(a, return_inverse=True, return_counts=True)
        a_core = (cnt[inv] >= thresh).astype(np.int64)
        # re-key by the b endpoint for pass 2
        return pa.table(
            {
                "key": pa.array(bb),
                "v": pa.array(a),
                "w": pa.array(a_core),
                "_h": pa.array(_hash_bucket(bb, P)),
            }
        )

    # -- pass 2: b's degree in-bucket -> classify.  kind 0 = core-core
    # edge (emitted once, a<b orientation); kind 1 = border candidacy
    # (a = border point, b = its core neighbor); kind 2 = core marker
    # (one row per core point, isolated cores included).
    def flag_b(g: pd.DataFrame) -> pa.Table:
        bb = g["key"].to_numpy().astype(np.int64)
        a = g["v"].to_numpy().astype(np.int64)
        a_core = g["w"].to_numpy().astype(bool)
        ub, inv, cnt = np.unique(bb, return_inverse=True, return_counts=True)
        b_core = cnt[inv] >= thresh
        cc = a_core & b_core & (a < bb)
        cand = (~a_core) & b_core
        core_ids = ub[cnt >= thresh].astype(np.int64)
        return pa.table(
            {
                "a": pa.array(
                    np.concatenate([a[cc], a[cand], core_ids]).astype(np.int64)
                ),
                "b": pa.array(
                    np.concatenate([bb[cc], bb[cand], core_ids]).astype(np.int64)
                ),
                "kind": pa.array(
                    np.concatenate(
                        [
                            np.zeros(int(cc.sum()), dtype=np.int8),
                            np.ones(int(cand.sum()), dtype=np.int8),
                            np.full(len(core_ids), 2, dtype=np.int8),
                        ]
                    )
                ),
            }
        )

    edges_all = (
        pairs.map_batches(tag_by_a, batch_format="pyarrow")
        .groupby("_h")
        .map_groups(flag_a, batch_format="pandas")
        .groupby("_h")
        .map_groups(flag_b, batch_format="pandas")
        .materialize()  # consumed by the CC loop, border branch and cores
    )
    cores = edges_all.filter(expr="kind == 2").map_batches(
        lambda t: pa.table({id_col: t["b"]}), batch_format="pyarrow"
    )
    # normalize to ARROW blocks: edges_all's map_groups emits pandas
    # blocks, and _min_label_propagation unions its input with pyarrow
    # map_batches output — Ray refuses mixed block types in one dataset
    core_edges = edges_all.filter(expr="kind == 0").map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow"
    )
    border_cand = edges_all.filter(expr="kind == 1")  # a=border pt, b=core

    # -- step 4: connected components over core-core edges (only cores
    # with >=1 core neighbor appear; isolated cores are filled below).
    labels = _min_label_propagation(
        core_edges.materialize(), id_col, None, shuffle_partitions
    )

    # -- steps 5a+5b fused: ONE co-group keyed by the CORE id fills in
    # isolated-core labels (core absent from the edge graph -> own id)
    # and attaches every border candidacy to its core's label in the
    # same bucket.  Output rows are emitted directly in the finalize
    # co-group schema — key = POINT id, v = cluster, w = 2 (core row,
    # exactly one per core) or 1 (border candidacy, one per (pt, core
    # neighbor); the MIN is folded into finalize's bucket).
    def tag_lbl(b: pa.Table) -> pa.Table:
        k = b[id_col].to_numpy(zero_copy_only=False)
        z = np.zeros(len(k), dtype=np.int64)
        return _rows(k, b["rep_id"].to_numpy(zero_copy_only=False), z, 1, P)

    def tag_cand(b: pa.Table) -> pa.Table:
        core = b["b"].to_numpy(zero_copy_only=False)
        pt = b["a"].to_numpy(zero_copy_only=False)
        return _rows(core, pt, np.zeros(len(core), dtype=np.int64), 2, P)

    def fill_attach(g: pd.DataFrame) -> pa.Table:
        cr = g[g["src"] == 0][["key"]]
        lb = g[g["src"] == 1][["key", "v"]]
        cd = g[g["src"] == 2][["key", "v"]].rename(columns={"v": "pt"})
        if cr.empty:
            out_k = np.empty(0, dtype=np.int64)
            out_v = np.empty(0, dtype=np.int64)
            out_w = np.empty(0, dtype=np.int64)
        else:
            m = cr.merge(lb, on="key", how="left")
            k = m["key"].to_numpy().astype(np.int64)
            cl = m["v"].to_numpy()
            cl = np.where(np.isnan(cl), k, cl).astype(np.int64)
            if cd.empty:
                bk = np.empty(0, dtype=np.int64)
                bv = np.empty(0, dtype=np.int64)
            else:
                j = cd.merge(
                    pd.DataFrame({"key": k, "cl": cl}), on="key", how="inner"
                )
                bk = j["pt"].to_numpy().astype(np.int64)
                bv = j["cl"].to_numpy().astype(np.int64)
            out_k = np.concatenate([k, bk])
            out_v = np.concatenate([cl, bv])
            out_w = np.concatenate(
                [np.full(len(k), 2, dtype=np.int64), np.ones(len(bk), dtype=np.int64)]
            )
        return _rows(out_k, out_v, out_w, 1, P)

    labeled = (
        cores.map_batches(
            lambda b: _rows(
                b[id_col].to_numpy(zero_copy_only=False),
                np.zeros(len(b), dtype=np.int64),
                np.zeros(len(b), dtype=np.int64),
                0,
                P,
            ),
            batch_format="pyarrow",
        )
        .union(labels.map_batches(tag_lbl, batch_format="pyarrow"))
        .union(border_cand.map_batches(tag_cand, batch_format="pyarrow"))
        .groupby("_h")
        .map_groups(fill_attach, batch_format="pandas")
        # normalize to ARROW blocks (0-row pandas blocks would otherwise
        # survive into the finalize union)
        .map_batches(lambda t: t, batch_format="pyarrow")
    )

    # -- final assembly keyed by point id: core row wins (w=2, unique),
    # else the MIN-cluster border candidacy (w=1, one per core
    # neighbor), else noise (-1).
    def tag_point(b: pa.Table) -> pa.Table:
        k = b[id_col].to_numpy(zero_copy_only=False)
        z = np.zeros(len(k), dtype=np.int64)
        return _rows(k, z, z, 0, P)

    ROLES = np.array(["noise", "border", "core"])

    def finalize(g: pd.DataFrame) -> pa.Table:
        pts = g[g["src"] == 0][["key"]]
        lb = g[g["src"] == 1][["key", "v", "w"]]
        if pts.empty:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "cluster": pa.array([], type=pa.int64()),
                    "role": pa.array([], type=pa.string()),
                }
            )
        # per point: prefer the core row (w=2), else min cluster among
        # border candidacies — one stable sort + keep-first replaces the
        # separate groupby(pt).min() exchange
        lb = lb.sort_values(["key", "w", "v"], ascending=[True, False, True],
                            kind="mergesort").drop_duplicates("key", keep="first")
        m = pts.merge(lb, on="key", how="left")
        w = m["w"].to_numpy()
        w = np.where(np.isnan(w), 0, w).astype(np.int64)
        cl = m["v"].to_numpy()
        cl = np.where(np.isnan(cl), -1, cl).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(m["key"].to_numpy().astype(np.int64)),
                "cluster": pa.array(np.where(w > 0, cl, np.int64(-1))),
                "role": pa.array(ROLES[np.minimum(w, 2)]),
            }
        )

    return (
        points.select_columns([id_col])
        .map_batches(tag_point, batch_format="pyarrow")
        .union(labeled)
        .groupby("_h")
        .map_groups(finalize, batch_format="pandas")
    )
