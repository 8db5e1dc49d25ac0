"""Driver contract for the Ray-Data-native spatial engine.

``entry()`` runs the flagship north-star pipeline (pages → text extract →
geo entities → broadcast PIP join → Hilbert tiles → skew-proof tile
stats) on sf0.001.  ``queries()`` exposes one callable per implemented
operator/pipeline (SURVEY.md §2); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible one.

The driver owns ray.init — nothing here may init/shutdown Ray.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# Ray workers must be able to deserialize our package even when the driver
# ran from outside /root/repo (the package is not pip-installed).
try:  # pragma: no cover
    from ray import cloudpickle as _cp

    import nettopologysuite_ray as _pkg

    _cp.register_pickle_by_value(_pkg)
except Exception:  # noqa: BLE001 - best effort; cwd-based import still works
    pass



LEVEL = 12  # tile level for morton/hilbert cell queries
KNN_K = 3
ANN_K = 5
ANN_NQ = 3
IVF_NC = 16
IVF_NPROBE = 6
EMBED_DUP_TAU = 0.42  # nearest pair gap to tau > 3e-5 at every SF (margin-checked)
WINNOW_K = 8  # winnowing k-gram length
WINNOW_W = 8  # winnowing window (guarantee: every >= k+w-1 char match shares a fingerprint)


def entry() -> Any:
    from nettopologysuite_ray.pipelines.northstar import northstar

    tiled, stats = northstar("/root/testdata/sf0.001")
    return stats


# ---------------------------------------------------------------------------
# engine-side query callables


def _entities(sf_dir: str):
    from nettopologysuite_ray.pipelines.northstar import entity_dataset

    return entity_dataset(sf_dir)


def _q_geo_extract(sf_dir: str):
    return _entities(sf_dir).select_columns(
        ["doc_id", "entity_idx", "lon", "lat", "lon_1e2", "lat_1e2"]
    )


def _q_spatial_join_modes(sf_dir: str):
    """Both PIPJoin modes under one gate row: 'assign' (every entity gets
    its unique containing admin, deterministic tie-break) and 'inner'
    (semi-join hits only; boundary points legitimately match 2+ admins).
    The two legs share one prepared-admin broadcast and are unioned with a
    `mode` tag so both stay oracle-hash-checked within the driver's
    50-query budget."""
    from nettopologysuite_ray.sources.pages import admin_boundaries_table
    from nettopologysuite_ray.stages.spatial_join import PIPJoin, prepare_admin_state

    admin_ref = prepare_admin_state(admin_boundaries_table(fancy=False))

    def leg(mode: str):
        import pyarrow as pa2

        joined = _entities(sf_dir).map_batches(
            PIPJoin,
            fn_constructor_kwargs={"admin_ref": admin_ref, "mode": mode},
            batch_format="pyarrow",
            batch_size=8192,
            concurrency=(1, 2),
            num_cpus=1,
        ).select_columns(["doc_id", "entity_idx", "admin_id"])
        return joined.map_batches(
            lambda b, m=mode: b.append_column(
                "mode", pa2.array([m] * len(b), type=pa2.string())
            ),
            batch_format="pyarrow",
        )

    return leg("assign").union(leg("inner"))


def _q_tile_curves(sf_dir: str):
    """Both space-filling-curve encoders under one gate row, checked
    through the DECODE round trip: each entity is cell-assigned with
    morton and hilbert codes and the emitted ix/iy are recovered with the
    matching decoder, so encode∘decode must equal the plain quantization
    the SQL oracle computes arithmetically (bijectivity for BOTH curves).
    The direct morton cell VALUES stay arithmetically hash-checked by
    tile_stats_morton / tile_top_docs, which share the encoder."""
    from nettopologysuite_ray.stages.tiling import assign_cells_batch

    def leg(kind: str):
        ds = _entities(sf_dir).map_batches(
            lambda b, k=kind: assign_cells_batch(b, level=LEVEL, kind=k),
            batch_format="pyarrow",
        )

        def decode(b: "pa.Table", k=kind):
            import pyarrow as pa2

            from nettopologysuite_ray.geom.hilbert import hilbert_decode, morton_decode

            codes = b["cell_id"].to_numpy(zero_copy_only=False)
            ix, iy = (
                morton_decode(codes) if k == "morton" else hilbert_decode(codes, LEVEL)
            )
            return pa2.table(
                {
                    "doc_id": b["doc_id"],
                    "entity_idx": b["entity_idx"],
                    "curve": pa2.array([k] * len(b), type=pa2.string()),
                    "ix": pa2.array(ix.astype("int64")),
                    "iy": pa2.array(iy.astype("int64")),
                }
            )

        return ds.map_batches(decode, batch_format="pyarrow")

    return leg("morton").union(leg("hilbert"))


def _q_tile_stats_morton(sf_dir: str):
    from nettopologysuite_ray.stages.tiling import assign_cells_batch, tile_stats

    ds = _entities(sf_dir).map_batches(
        lambda b: assign_cells_batch(b, level=LEVEL, kind="morton"),
        batch_format="pyarrow",
    )
    return tile_stats(ds, "cell_id")


def _admin_centers_ref():
    import numpy as np

    import ray

    a = np.arange(648, dtype=np.int64)
    cx = (a % 36) * 1000 - 17500
    cy = (a // 36) * 1000 - 8500
    return ray.put({"cx": cx, "cy": cy, "ids": a})


def _q_knn_admin(sf_dir: str):
    from nettopologysuite_ray.stages.spatial_join import KnnJoin

    ds = _entities(sf_dir).map_batches(
        KnnJoin,
        fn_constructor_kwargs={
            "centers_ref": _admin_centers_ref(),
            "k": KNN_K,
            "lon_col": "lon_1e2",
            "lat_col": "lat_1e2",
        },
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 8),
        num_cpus=1,
    )
    return ds.select_columns(["doc_id", "entity_idx", "rank", "admin_id", "dist2"])


def _q_q1_pricing(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from nettopologysuite_ray.stages.relational import grouped_sum, to_cents

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def cents(b: pa.Table) -> pa.Table:
        base = to_cents(b["l_extendedprice"])
        disc = to_cents(b["l_discount"])
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty_1e2": to_cents(b["l_quantity"]),
                "sum_base_1e2": base,
                "sum_disc_1e4": pc.multiply(
                    base, pc.subtract(pa.scalar(100, pa.int64()), disc)
                ),
            }
        )

    return grouped_sum(
        ds.map_batches(cents, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        ["sum_qty_1e2", "sum_base_1e2", "sum_disc_1e4"],
        count_alias="n",
    )


def _q_top_orders(sf_dir: str):
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    from nettopologysuite_ray.stages.relational import BroadcastJoin, to_cents, top_k

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    cust = cust.filter(pa.compute.equal(cust["c_mktsegment"], "BUILDING")).select(["c_custkey"])
    cust = cust.rename_columns(["o_custkey"])
    ref = ray.put(cust.to_pandas())
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    joined = orders.map_batches(
        BroadcastJoin,
        fn_constructor_kwargs={"small_ref": ref, "key": "o_custkey", "how": "inner"},
        batch_format="pyarrow",
        concurrency=(1, 2),
        num_cpus=1,
    )

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_custkey": b["o_custkey"],
                "totalprice_1e2": to_cents(b["o_totalprice"]),
            }
        )

    return top_k(
        joined.map_batches(cents, batch_format="pyarrow"),
        ["totalprice_1e2", "o_orderkey"],
        10,
        descending=[True, False],
    )


def _q_customers_per_region(sf_dir: str):
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    from nettopologysuite_ray.stages.relational import BroadcastJoin, grouped_sum

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "r_name"]
    ].rename(columns={"n_nationkey": "c_nationkey"})
    ref = ray.put(dim)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    joined = cust.map_batches(
        BroadcastJoin,
        fn_constructor_kwargs={"small_ref": ref, "key": "c_nationkey", "how": "inner"},
        batch_format="pyarrow",
        concurrency=(1, 2),
        num_cpus=1,
    )

    import pyarrow as pa

    def ones(b: pa.Table) -> pa.Table:
        import numpy as np

        return b.select(["r_name"]).append_column(
            "n_customers", pa.array(np.ones(len(b), dtype=np.int64))
        )

    return grouped_sum(
        joined.map_batches(ones, batch_format="pyarrow"), ["r_name"], ["n_customers"]
    )


def _q_events_stats(sf_dir: str):
    import ray.data as rd

    from nettopologysuite_ray.stages.relational import grouped_min_max_count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return grouped_min_max_count(ds, ["event_type"], "value")


def _q_doc_token_stats(sf_dir: str):
    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.functions.text import token_count_batch
    from nettopologysuite_ray.stages.relational import grouped_sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    tok = ds.map_batches(
        lambda b: token_count_batch(b, "text").select(["lang", "n_tokens", "n_chars_computed"]),
        batch_format="pyarrow",
    )

    def prep(b: pa.Table) -> pa.Table:
        return b.rename_columns(["lang", "sum_tokens", "sum_chars"])

    return grouped_sum(
        tok.map_batches(prep, batch_format="pyarrow"),
        ["lang"],
        ["sum_tokens", "sum_chars"],
        count_alias="n_docs",
    )


def _q_dedup_exact(sf_dir: str):
    import ray.data as rd

    from nettopologysuite_ray.functions.dedup import exact_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup(ds)


def _q_ann_topk(sf_dir: str):
    """Both ANN paths under one gate row: 'brute' = exact brute-force
    cosine top-k (mergeable min-k tree over batch partials), 'ivf' = the
    IVF-bucketed approximate path (bucket assign -> probe score -> top-k
    tree; centroids are the first IVF_NC corpus vectors — k-means-style
    data seeding, broadcast once via ray.put — so the whole probe pipeline
    is deterministic and the DuckDB oracle reproduces it exactly).  Recall
    of ivf vs brute is additionally asserted in tests."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    from nettopologysuite_ray.functions.embed import ann_topk, ivf_ann_topk

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vids = np.asarray(emb["vec_id"].to_pylist())
    vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    qmask = vids < ANN_NQ
    qids = vids[qmask]
    qvecs = vecs[qmask]
    dim = qvecs.shape[1]
    order = np.argsort(vids, kind="stable")
    cents = vecs[order[:IVF_NC]]
    qref = ray.put({"query_ids": qids, "vectors": qvecs})
    cref = ray.put(cents)

    def tag(d, m):
        return d.select_columns(["query_id", "rank", "vec_id"]).map_batches(
            lambda b, mm=m: b.append_column(
                "method", pa.array([mm] * len(b), type=pa.string())
            ),
            batch_format="pyarrow",
        )

    brute = ann_topk(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]),
        qref,
        k=ANN_K,
    )
    ivf = ivf_ann_topk(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]),
        qref,
        dim=dim,
        k=ANN_K,
        n_centroids=IVF_NC,
        nprobe=IVF_NPROBE,
        centroids_ref=cref,
        assign_margin=1e-12,  # oracle-gated: fail loud on BLAS-order ties
    )
    # pin each branch's Q*k-row result before the union: a lazy union of
    # two pipelines holding THREE actor pools between them can starve the
    # streaming executor's per-op reservations at tiny CPU budgets
    # (observed flaky stall at num_cpus=4); top-k outputs are tiny by
    # construction, so the pin costs nothing at any scale
    return tag(brute, "brute").materialize().union(tag(ivf, "ivf").materialize())


def _q_winnow_fingerprint(sf_dir: str):
    """Winnowing document fingerprints over the documents table — the
    rolling-hash member of the fingerprint family (md5 whole-doc +
    winnowing local)."""
    import ray.data as rd

    from nettopologysuite_ray.functions.text import winnow_fingerprints_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(winnow_fingerprints_batch, batch_format="pyarrow")


def _q_windows_rollup(sf_dir: str):
    """Both windowed-aggregate shapes under one gate row: 'tumble' =
    fixed-width (6h) tumbling rollup, 'hop' = hopping rollup (1h window,
    15min slide — each event lands in exactly 4 overlapping windows).
    Both are map-side-combined, partial-bounded shuffles."""
    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.stages.windows import (
        hopping_window_agg,
        tumbling_window_agg,
    )

    def read():
        return rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
        )

    def tag(d, k):
        return d.map_batches(
            lambda b, kk=k: b.append_column(
                "kind", pa.array([kk] * len(b), type=pa.string())
            ),
            batch_format="pyarrow",
        )

    tumble = tumbling_window_agg(read(), width_s=21600)
    hop = hopping_window_agg(read(), width_s=3600, slide_s=900)
    return tag(tumble, "tumble").union(tag(hop, "hop"))


def _q_session_stats(sf_dir: str):
    """Gap-based sessionization (30 min) of the events stream per user —
    hash-bucketed users, one vectorized pass per bucket."""
    import ray.data as rd

    from nettopologysuite_ray.stages.windows import sessionize_stats

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    return sessionize_stats(ds, gap_s=1800)


def _q_asof_join(sf_dir: str):
    """As-of join: each click event matched to the user's most recent
    prior view event (inner, tie-broken to max view id) — the time-series
    join member of the engine-level operator family."""
    import ray.data as rd

    from nettopologysuite_ray.stages.windows import as_of_join

    cols = ["event_id", "ts", "user_id", "event_type"]
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)
    clicks = ev.filter(expr="event_type == 'click'")
    views = ev.filter(expr="event_type == 'view'")
    return as_of_join(clicks, views)


def _q_value_quantiles(sf_dir: str):
    """Exact p50/p90/p99 of event value per event_type — count-based
    distributed quantiles over the integer-cents domain (no global
    sort)."""
    import ray.data as rd

    from nettopologysuite_ray.stages.relational import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return grouped_quantiles(ds, value_col="value", group_col="event_type")


def _q_split_assign(sf_dir: str):
    """Deterministic 90/5/5 train/val/test split of documents by id hash
    — map-only, reproducible across runs/engines/parallelism."""
    import ray.data as rd

    from nettopologysuite_ray.functions.sketch import hash_split

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return hash_split(ds, id_col="doc_id")


def _q_top_tokens(sf_dir: str):
    """Global top-50 tokens by frequency (vocabulary head) — map-side
    combined counts, vocabulary-bounded shuffle, pruned exact top-k."""
    import ray.data as rd

    from nettopologysuite_ray.functions.text import top_tokens

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return top_tokens(ds, k=50)


def _q_tfidf_terms(sf_dir: str):
    """Top-5 characteristic terms per document by exact-integer tf-idf
    ranking (tf/(df+1), no floating log) — DF via a vocabulary-bounded
    groupby, tf joined back by token-hash shuffle."""
    import ray.data as rd

    from nettopologysuite_ray.functions.text import tfidf_top_terms

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tfidf_top_terms(ds, k=5)


def _q_term_stats(sf_dir: str):
    """Merged gate row for the two term-statistics pipelines (global
    top-50 vocabulary head + per-doc top-5 tf-idf terms), folded into one
    long-schema table so the 50-query driver cap keeps every component
    covered alongside kmeans_embed."""
    import pyarrow as pa

    def long_top(b: pa.Table) -> pa.Table:
        import numpy as np

        n = len(b)
        return pa.table(
            {
                "tag": pa.array(["top"] * n),
                "doc_id": pa.array(np.full(n, -1, dtype=np.int64)),
                "token": b["token"],
                "v1": b["n"],
                "v2": b["rank"],
                "v3": pa.array(np.zeros(n, dtype=np.int64)),
                "v4": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def long_tfidf(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "tag": pa.array(["tfidf"] * n),
                "doc_id": b["doc_id"],
                "token": b["token"],
                "v1": b["tf"],
                "v2": b["df"],
                "v3": b["score_1e6"],
                "v4": b["rank"],
            }
        )

    top = _q_top_tokens(sf_dir).map_batches(long_top, batch_format="pyarrow")
    tf = _q_tfidf_terms(sf_dir).map_batches(long_tfidf, batch_format="pyarrow")
    return top.union(tf)


KMEANS_K = 8
KMEANS_ITERS = 3
KMEANS_DIM = 64
KMEANS_SCALE = 10**6


def _q_kmeans_embed(sf_dir: str):
    """Distributed integer-exact Lloyd's k-means over the embeddings
    table (functions/kmeans.py): quantize half-away at 1e6, seed from the
    k lowest vec_ids, 3 Lloyd steps with integer-rounded centroid means,
    final assignment with ties to the lower centroid id.  The oracle
    replays every step as nested CTEs."""
    import ray.data as rd

    from nettopologysuite_ray.functions.kmeans import kmeans

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out, _ = kmeans(
        ds, KMEANS_DIM, k=KMEANS_K, iters=KMEANS_ITERS, scale=KMEANS_SCALE
    )
    return out


def _kmeans_oracle_sql() -> str:
    """Compose the Lloyd-step replay: q (quantized long format), c0
    (seed centroids), then per iteration an assignment CTE (argmin dist2,
    ties to lower cid) + a centroid-update CTE (integer-rounded mean,
    empty cluster keeps its position)."""
    k, iters, dim, scale = KMEANS_K, KMEANS_ITERS, KMEANS_DIM, KMEANS_SCALE
    parts = [
        f"""WITH q AS (
  SELECT vec_id, t.i AS i,
         CAST(round(CAST(embedding[t.i + 1] AS DOUBLE) * {scale}) AS BIGINT) AS v
  FROM embeddings, range({dim}) t(i)
),
seed AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
),
c0 AS (SELECT s.cid, q.i, q.v FROM seed s JOIN q ON q.vec_id = s.vec_id)"""
    ]
    for it in range(1, iters + 1):
        prev = f"c{it - 1}"
        parts.append(
            f"""a{it} AS (
  SELECT vec_id, cid, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
  FROM (
    SELECT q.vec_id, c.cid, SUM((q.v - c.v) * (q.v - c.v)) AS d2
    FROM q JOIN {prev} c ON q.i = c.i
    GROUP BY q.vec_id, c.cid
  )
),
m{it} AS (
  SELECT a.cid, q.i, SUM(q.v) AS s, COUNT(*) AS n
  FROM a{it} a JOIN q ON q.vec_id = a.vec_id
  WHERE a.rn = 1
  GROUP BY a.cid, q.i
),
c{it} AS (
  SELECT c.cid, c.i,
         COALESCE(
           CASE WHEN m.s >= 0 THEN (2 * m.s + m.n) // (2 * m.n)
                ELSE -((-2 * m.s + m.n) // (2 * m.n)) END,
           c.v) AS v
  FROM {prev} c LEFT JOIN m{it} m ON m.cid = c.cid AND m.i = c.i
)"""
        )
    parts.append(
        f"""afinal AS (
  SELECT vec_id, cid, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
  FROM (
    SELECT q.vec_id, c.cid, SUM((q.v - c.v) * (q.v - c.v)) AS d2
    FROM q JOIN c{iters} c ON q.i = c.i
    GROUP BY q.vec_id, c.cid
  )
)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster, CAST(d2 AS BIGINT) AS dist2
FROM afinal WHERE rn = 1"""
    )
    head = parts[0]
    rest = parts[1:]
    return head + ",\n" + ",\n".join(rest[:-1]) + ",\n" + rest[-1]


def _q_pii_redact(sf_dir: str):
    """PII redaction (emails, IPv4s) over documents with deterministic
    PII injected per doc_id so the redaction path is actually exercised;
    compiled-regex actor pool, md5 of the redacted text for compact
    value comparison."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.functions.text import PIIRedactor

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def inject(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        texts = b["text"].to_pylist()
        out = [
            f"{t} contact doc{i}@example.com from 10.0.{(i // 256) % 256}.{i % 256}"
            for i, t in zip(ids.tolist(), texts)
        ]
        return b.set_column(
            b.schema.get_field_index("text"), "text", pa.array(out, type=pa.string())
        )

    red = ds.map_batches(inject, batch_format="pyarrow").map_batches(
        PIIRedactor, batch_format="pyarrow", concurrency=(1, 4)
    )

    def digest(b: pa.Table) -> pa.Table:
        md5s = [hashlib.md5(t.encode()).hexdigest() for t in b["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_emails": b["n_emails"],
                "n_ips": b["n_ips"],
                "red_md5": pa.array(md5s, type=pa.string()),
            }
        )

    return red.map_batches(digest, batch_format="pyarrow")


def _q_kmv_distinct(sf_dir: str):
    """KMV bottom-k distinct-count sketch: approximate distinct users per
    event_type — the mergeable-sketch member of the engine-level family
    (map partials bounded by groups x k, independent of event count)."""
    import ray.data as rd

    from nettopologysuite_ray.functions.sketch import kmv_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    return kmv_distinct(ds, key_col="user_id", group_col="event_type", k=64)


def _q_event_sketch_stats(sf_dir: str):
    """KMV bottom-k distinct sketch + exact count-based quantiles,
    consolidated under one gate row (driver 50-row cap) as long rows
    (event_type, stat, value): kmv_est / kmv_fill / kmv_kth from the
    mergeable sketch, p50 / p90 / p99 cents from the no-global-sort
    quantiles (stages/relational.py grouped_quantiles,
    functions/sketch.py kmv_distinct)."""
    import pyarrow as pa

    kmv = _q_kmv_distinct(sf_dir)
    qnt = _q_value_quantiles(sf_dir)

    def kmv_rows(b: pa.Table) -> pa.Table:
        et, st, val = [], [], []
        for t, e, n, k in zip(
            b["event_type"].to_pylist(),
            b["est_distinct"].to_pylist(),
            b["n_hashes"].to_pylist(),
            b["kth_hash"].to_pylist(),
        ):
            et += [t, t, t]
            st += ["kmv_est", "kmv_fill", "kmv_kth"]
            val += [int(e), int(n), int(k)]
        return pa.table(
            {
                "event_type": pa.array(et, type=pa.string()),
                "stat": pa.array(st, type=pa.string()),
                "value": pa.array(val, type=pa.int64()),
            }
        )

    def qnt_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "stat": pa.array(
                    [f"p{q}" for q in b["q_pct"].to_pylist()], type=pa.string()
                ),
                "value": b["quantile_cents"].cast(pa.int64()),
            }
        )

    return kmv.map_batches(kmv_rows, batch_format="pyarrow").union(
        qnt.map_batches(qnt_rows, batch_format="pyarrow")
    )


def _q_raster_roundtrip(sf_dir: str, rep: int = 1):
    """Raster <-> vector round trip (stages/raster.py — the north-star
    rule's raster<->vector tiling): per document one deterministic shape
    (solid square / donut / right triangle by doc_id % 3, side
    s = 6 + (doc_id % 5) * 2, placed on a disjoint 32-cell stride grid)
    is center-sample rasterized at cell=1 (strict-interior rule), then
    vectorized back into region polygons with tile=4 halo extraction and
    cross-tile stitching; the per-region inventory (hole count, integer
    area, bbox) is a closed form the SQL oracle replays.

    ``rep`` (scaling studies only; the gate uses 1) replicates each
    document's shape at rep disjoint vertical bands so the job can be
    grown until compute dominates fixed stitch/scheduling overhead."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.types import POLYGON, Geom
    from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
    from nettopologysuite_ray.stages.raster import rasterize, vectorize

    def _sq(x0, y0, side):
        return np.array(
            [(x0, y0), (x0 + side, y0), (x0 + side, y0 + side), (x0, y0 + side), (x0, y0)],
            dtype=np.float64,
        )

    band = 1 << 22  # vertical stride per replica band (cell indices)

    def build(batch: pa.Table) -> pa.Table:
        wkbs, vals = [], []
        for d in batch["doc_id"].to_pylist():
            s = 6 + (d % 5) * 2
            k = d % 3
            for r in range(rep):
                x0, y0 = (d % 64) * 32, (d // 64) * 32 + r * band
                if k == 0:
                    rings = [_sq(x0, y0, s)]
                elif k == 1:
                    rings = [_sq(x0, y0, s), _sq(x0 + 2, y0 + 2, s - 4)]
                else:
                    rings = [
                        np.array(
                            [(x0, y0), (x0 + s, y0), (x0, y0 + s), (x0, y0)],
                            dtype=np.float64,
                        )
                    ]
                wkbs.append(to_wkb(Geom(POLYGON, rings)))
                vals.append(d)
        return pa.table(
            {
                "wkb": pa.array(wkbs, type=pa.binary()),
                "value": pa.array(vals, type=pa.int64()),
            }
        )

    # documents.parquet is one file → one block → the whole build+burn
    # would run as ONE task; split so the map chain parallelizes (this
    # was the zero-scaling fixed ~3.3s of the rep=4 scaling study)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).repartition(64)
    cells = rasterize(docs.map_batches(build, batch_format="pyarrow"), cell=1.0)
    regions = vectorize(cells, cell=1.0, tile=4)  # num_partitions: auto (CPU count)

    def inventory(batch: pa.Table) -> pa.Table:
        vals, kinds, holes, areas, env = [], [], [], [], []
        for v, w in zip(batch["value"].to_pylist(), batch["face_wkb"].to_pylist()):
            g = from_wkb(w)
            vals.append(int(v))
            kinds.append(int(v) % 3)
            holes.append(len(g.data) - 1)
            areas.append(int(round(alg.area(g))))
            e = alg.envelope(g)
            env.append(tuple(int(round(x)) for x in e))
        return pa.table(
            {
                "value": pa.array(vals, type=pa.int64()),
                "kind": pa.array(kinds, type=pa.int64()),
                "n_holes": pa.array(holes, type=pa.int64()),
                "area": pa.array(areas, type=pa.int64()),
                "minx": pa.array([e[0] for e in env], type=pa.int64()),
                "miny": pa.array([e[1] for e in env], type=pa.int64()),
                "maxx": pa.array([e[2] for e in env], type=pa.int64()),
                "maxy": pa.array([e[3] for e in env], type=pa.int64()),
            }
        )

    return regions.map_batches(inventory, batch_format="pyarrow")


def _q_sample_per_lang(sf_dir: str):
    """Deterministic per-language bottom-k sample of documents (hash-order
    sampling — reproducible at any parallelism, replayable in SQL)."""
    import ray.data as rd

    from nettopologysuite_ray.functions.sketch import bottom_k_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return bottom_k_sample(ds, id_col="doc_id", group_col="lang", n=20)


def _q_embed_near_dup(sf_dir: str):
    """Both embedding-near-dup paths under one gate row: 'ivf' = the
    100-TB scale path (cosine >= tau within each nearest-centroid bucket;
    streaming end to end, one bucket-groupby shuffle, no corpus
    materialize and no O(blocks^2) task matrix — centroids are the first
    IVF_NC corpus vectors, data-seeded and broadcast once, so the DuckDB
    oracle replays the bucketing exactly), 'exact' = the all-pairs
    block-pair matmul decomposition (inherently O(blocks^2), guarded by
    an explicit max_blocks cap so it cannot be invoked at corpus scale by
    accident)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    from nettopologysuite_ray.functions.embed import embed_near_dup, embed_near_dup_ivf

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vids = np.asarray(emb["vec_id"].to_pylist())
    vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(vids, kind="stable")
    cents = vecs[order[:IVF_NC]]
    dim = vecs.shape[1]
    cref = ray.put(cents)

    def read():
        return rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )

    def tag(d, m):
        return d.map_batches(
            lambda b, mm=m: b.append_column(
                "method", pa.array([mm] * len(b), type=pa.string())
            ),
            batch_format="pyarrow",
        )

    ivf = embed_near_dup_ivf(
        read(), threshold=EMBED_DUP_TAU, dim=dim, n_centroids=IVF_NC,
        centroids_ref=cref,
        assign_margin=1e-12,  # oracle-gated: fail loud on BLAS-order ties
    )
    exact = embed_near_dup(read(), threshold=EMBED_DUP_TAU)
    # same pinned-union shape as ann_topk: both branches hold actor pools
    # and their near-dup pair outputs are tiny, so sequence them instead
    # of co-scheduling two pool-heavy pipelines under one reservation
    return tag(ivf, "ivf").materialize().union(tag(exact, "exact").materialize())


def _q_lang_pred(sf_dir: str):
    import ray.data as rd

    from nettopologysuite_ray.functions.text import LangIdModel
    from nettopologysuite_ray.stages.relational import grouped_sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    pred = ds.map_batches(
        LangIdModel, batch_format="pyarrow", concurrency=(1, 2), num_cpus=1, batch_size=2048
    )
    import numpy as np
    import pyarrow as pa

    def ones(b: pa.Table) -> pa.Table:
        return b.select(["lang", "lang_pred"]).append_column(
            "n", pa.array(np.ones(len(b), dtype=np.int64))
        )

    return grouped_sum(pred.map_batches(ones, batch_format="pyarrow"), ["lang", "lang_pred"], ["n"])


def _q_near_dup_groups(sf_dir: str):
    """Connected near-dup clusters (exact-Jaccard-verified LSH pairs +
    distributed min-label propagation); oracle: recursive-CTE transitive
    closure over the same exact all-pairs Jaccard edges."""
    import ray.data as rd

    from nettopologysuite_ray.functions.dedup import MinHasher, near_dup_groups

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"emit_shingles": True},
        batch_format="pyarrow",
        concurrency=(1, 2),
        num_cpus=1,
        batch_size=2048,
    )
    return near_dup_groups(sigs, num_partitions=4)


def _q_minhash_lsh_pairs(sf_dir: str):
    """MinHash-LSH near-dup pairs, exact-verified by n-gram Jaccard >= 1/2
    (integer arithmetic) — fully distributed: banding shuffle for
    candidates, two hash joins back to shingle sets for verification.
    Oracle: exact all-pairs Jaccard in SQL (the corpus separates dups at
    ~0.9 from noise at <0.07, and 16x4 banding recall at s=0.9 is
    1 - (1-s^4)^16 ≈ 1 - 4e-8, so LSH+verify == exact thresholding)."""
    import ray.data as rd

    from nettopologysuite_ray.functions.dedup import MinHasher, lsh_verified_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"emit_shingles": True},
        batch_format="pyarrow",
        concurrency=(1, 2),
        num_cpus=1,
        batch_size=2048,
    )
    return lsh_verified_pairs(sigs, num_partitions=4)


def _q_simhash(sf_dir: str):
    import ray.data as rd

    from nettopologysuite_ray.functions.dedup import SimHasher

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(
        SimHasher, batch_format="pyarrow", concurrency=(1, 2), num_cpus=1, batch_size=2048
    )
    return out.select_columns(["doc_id", "simhash"])


def _q_conformance(sf_dir: str):
    # sf_dir unused: input is the reference's XML corpus (fixed path);
    # rows-only check — pytest asserts the actual pass rates.
    from nettopologysuite_ray.pipelines.conformance import conformance_summary

    return conformance_summary(dirs=("general", "validate"))


def _q_geom_stats(sf_dir: str):
    # real WKB geometry work (area/centroid/envelope stages over polygons);
    # the oracle recomputes the grid arithmetic from admin_id
    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.wkb import from_wkb
    from nettopologysuite_ray.sources.pages import admin_boundaries_table

    ds = rd.from_arrow(admin_boundaries_table(fancy=False).select(["admin_id", "geometry_wkb"]))

    def stats(b: pa.Table) -> pa.Table:
        geoms = [from_wkb(x) for x in b["geometry_wkb"].to_pylist()]
        areas = [alg.area(g) for g in geoms]
        cents = [alg.centroid(g).data for g in geoms]
        envs = [alg.envelope(g) for g in geoms]
        return pa.table(
            {
                "admin_id": b["admin_id"],
                "area": pa.array(areas, type=pa.float64()),
                "cx": pa.array([c[0] for c in cents], type=pa.float64()),
                "cy": pa.array([c[1] for c in cents], type=pa.float64()),
                "minx": pa.array([e[0] for e in envs], type=pa.float64()),
                "miny": pa.array([e[1] for e in envs], type=pa.float64()),
                "maxx": pa.array([e[2] for e in envs], type=pa.float64()),
                "maxy": pa.array([e[3] for e in envs], type=pa.float64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def _q_affine_docs(sf_dir: str):
    """AffineTransformation under the hash gate, both dimensionalities in
    one row: the 'xy' leg pushes plain POINTs through the affine stage
    (2x+3y+7, -y+11 on integer cents; oracle recomputes the arithmetic,
    z_1e2 = 0 by convention), the 'xyz' leg pushes POINT Z geometries
    through the SAME stage — x/y transformed, Z untouched through the full
    WKB -> stage -> WKB path (reference keeps CoordinateZ.Z under
    AffineTransformation, Geometries/Utilities/AffineTransformation.cs:71)."""

    def leg(with_z: bool):
        import numpy as np
        import pyarrow as pa

        from nettopologysuite_ray.geom.types import Geom
        from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
        from nettopologysuite_ray.stages.geometry import affine_stage

        kind = "xyz" if with_z else "xy"

        def to_points(b: pa.Table) -> pa.Table:
            if with_z:
                ids = b["doc_id"].to_numpy(zero_copy_only=False)
                eix = b["entity_idx"].to_numpy(zero_copy_only=False)
                zs = (ids * 31 + eix * 17) % 100000
                wkbs = [
                    to_wkb(
                        Geom(
                            "Point",
                            np.array([float(x), float(y)]),
                            extra={"dims": "Z", "ords": np.array([float(z)])},
                        )
                    )
                    for x, y, z in zip(
                        b["lon_1e2"].to_pylist(), b["lat_1e2"].to_pylist(), zs.tolist()
                    )
                ]
            else:
                wkbs = [
                    to_wkb(Geom.point(float(x), float(y)))
                    for x, y in zip(b["lon_1e2"].to_pylist(), b["lat_1e2"].to_pylist())
                ]
            return b.select(["doc_id", "entity_idx"]).append_column(
                "wkb", pa.array(wkbs, type=pa.binary())
            )

        staged = _entities(sf_dir).map_batches(
            to_points, batch_format="pyarrow"
        ).map_batches(
            affine_stage(a=2.0, b=3.0, c=7.0, d=0.0, e=-1.0, f=11.0),
            batch_format="pyarrow",
        )

        def extract(b: pa.Table) -> pa.Table:
            gs = [from_wkb(x) for x in b["affine_wkb"].to_pylist()]
            if with_z:
                for g in gs:
                    assert g.extra is not None and g.extra["dims"] == "Z"
                zc = [int(g.extra["ords"][0]) for g in gs]
            else:
                zc = [0] * len(gs)
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "entity_idx": b["entity_idx"],
                    "kind": pa.array([kind] * len(gs), type=pa.string()),
                    "tx_1e2": pa.array([int(g.data[0]) for g in gs], type=pa.int64()),
                    "ty_1e2": pa.array([int(g.data[1]) for g in gs], type=pa.int64()),
                    "z_1e2": pa.array(zc, type=pa.int64()),
                }
            )

        return staged.map_batches(extract, batch_format="pyarrow")

    return leg(False).union(leg(True))


def _grid_dims(sf_dir: str) -> int:
    """Road-grid line count for polygonize_grid: nx = ny =
    max(8, ceil(sqrt(#documents))) — scales with sf, replayed in SQL."""
    import math

    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return max(8, math.ceil(math.sqrt(n_docs)))


_GRID_C = 300.0  # street spacing (integer units)


def _grid_in_region(i: int, j: int, nx: int, ny: int) -> bool:
    """Block (i,j) belongs to a 2x2 superblock whose anchor is at
    (a,b), a%6==4, b%6==4, region fully inside the block range."""
    if i % 6 not in (4, 5) or j % 6 not in (4, 5):
        return False
    if i % 6 == 4 and not (i + 1 <= nx - 2):
        return False
    if j % 6 == 4 and not (j + 1 <= ny - 2):
        return False
    return True


def _grid_segments_for_node(i: int, j: int, nx: int, ny: int):
    """Street segments owned by grid node (i,j): its rightward and upward
    unit streets (minus superblock interior removals), the block diagonal,
    and the floating island ring when (i,j) is a superblock anchor."""
    C = _GRID_C
    segs = []
    x, y = i * C, j * C
    # horizontal street (i,j)-(i+1,j): removed when it is an interior
    # street of a valid superblock (j on the region's middle line)
    if i + 1 <= nx - 1:
        rm = (
            j % 6 == 5
            and i % 6 in (4, 5)
            and ((i + 1 <= nx - 2) if i % 6 == 4 else (i <= nx - 2))
            and (j - 1) % 6 == 4
            and (j <= ny - 2)
        )
        if not rm:
            segs.append(((x, y), (x + C, y)))
    # vertical street (i,j)-(i,j+1)
    if j + 1 <= ny - 1:
        rm = (
            i % 6 == 5
            and j % 6 in (4, 5)
            and ((j + 1 <= ny - 2) if j % 6 == 4 else (j <= ny - 2))
            and (i - 1) % 6 == 4
            and (i <= nx - 2)
        )
        if not rm:
            segs.append(((x, y), (x, y + C)))
    # diagonal splitting block (i,j) in two triangles
    if (
        i <= nx - 2
        and j <= ny - 2
        and not _grid_in_region(i, j, nx, ny)
        and (i * 31 + j * 17) % 5 == 0
    ):
        segs.append(((x, y), (x + C, y + C)))
    # island ring inside the superblock anchored here
    if i % 6 == 4 and j % 6 == 4 and i + 1 <= nx - 2 and j + 1 <= ny - 2:
        xc, yc = (i + 1) * C, (j + 1) * C
        pts = [
            (xc - 50, yc - 50),
            (xc + 50, yc - 50),
            (xc + 50, yc + 50),
            (xc - 50, yc + 50),
        ]
        for k in range(4):
            segs.append((pts[k], pts[(k + 1) % 4]))
    return segs


def _q_polygonize_grid(sf_dir: str):
    """Distributed polygonize with tile-boundary stitching
    (stages/polygonize.py; reference role:
    Operation/Polygonize/Polygonizer.cs:35 run layer-wide): a synthetic
    road grid — unit blocks, diagonal-split blocks, 2x2 superblocks with
    a floating island ring (the island's outer traversal must become the
    superblock's hole) — is polygonized with tile cells that CUT through
    every block (cell = 2.5 blocks), so faces routinely cross tile
    boundaries.  Faces are classified back to integer rows the SQL
    oracle recomputes from the same rules."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from nettopologysuite_ray.geom.types import Geom
    from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.stages.polygonize import distributed_polygonize

    nx = ny = _grid_dims(sf_dir)
    C = _GRID_C

    def build(batch) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        wkbs = []
        for idx in ids.tolist():
            i, j = idx % nx, idx // nx
            for p0, p1 in _grid_segments_for_node(i, j, nx, ny):
                wkbs.append(to_wkb(Geom("LineString", np.array([p0, p1], dtype=np.float64))))
        return pa.table({"wkb": pa.array(wkbs, type=pa.binary())})

    lines = rd.range(nx * ny, override_num_blocks=8).map_batches(
        build, batch_format="pyarrow"
    )
    faces = distributed_polygonize(lines, cell=C * 2.5, num_partitions=8)

    def classify(batch: pa.Table) -> pa.Table:
        bxs, bys, parts, areas = [], [], [], []
        for w in batch["face_wkb"].to_pylist():
            g = from_wkb(w)
            shell = g.data[0]
            n_holes = len(g.data) - 1
            area = int(round(alg.area(g)))
            minx, miny = float(shell[:, 0].min()), float(shell[:, 1].min())
            bx, by = int(minx // C), int(miny // C)
            if n_holes == 1:
                part = 3
            elif area == 10000:
                part = 4
            elif area == int(C * C):
                part = 0
            else:  # triangle: part 1 holds the block's top-left corner
                tl = (bx * C, (by + 1) * C)
                verts = {(float(p[0]), float(p[1])) for p in shell[:-1]}
                part = 1 if tl in verts else 2
            bxs.append(bx)
            bys.append(by)
            parts.append(part)
            areas.append(area)
        return pa.table(
            {
                "bx": pa.array(bxs, type=pa.int64()),
                "by": pa.array(bys, type=pa.int64()),
                "part": pa.array(parts, type=pa.int64()),
                "area": pa.array(areas, type=pa.int64()),
            }
        )

    return faces.map_batches(classify, batch_format="pyarrow")


def _q_overlay_z_docs(sf_dir: str):
    """Z-populated overlay (geom/elevation.py; reference:
    Operation/OverlayNG/ElevationModel.cs consumed at
    OverlayNG.cs:437-459): per document, intersect two Z-bearing squares;
    surviving input vertices carry their Z exactly, the two new corners
    are filled from the 3x3 averaged elevation model — whose cell
    arithmetic the SQL oracle replays.  Z doubled to stay integer."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from nettopologysuite_ray.geom.elevation import overlay_z
    from nettopologysuite_ray.geom.wkt import from_wkt

    def compute(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "x": [], "y": [], "z2": []}
        for i in batch["doc_id"].to_pylist():
            zi = i % 7
            wi = i % 5 + 10
            a = from_wkt(
                f"POLYGON Z ((0 0 {zi}, 10 0 {zi}, 10 10 {zi}, 0 10 {zi}, 0 0 {zi}))"
            )
            b = from_wkt(
                f"POLYGON Z ((5 5 {wi}, 15 5 {wi}, 15 15 {wi}, 5 15 {wi}, 5 5 {wi}))"
            )
            res = overlay_z(a, b, "intersection")
            ring = res.data[0]
            zs = np.asarray(res.extra["ords"][0], dtype=np.float64).reshape(-1)
            seen = set()
            for (x, y), z in zip(ring, zs):
                key = (float(x), float(y))
                if key in seen:
                    continue
                seen.add(key)
                out["doc_id"].append(i)
                out["x"].append(int(round(key[0])))
                out["y"].append(int(round(key[1])))
                out["z2"].append(int(round(2 * float(z))))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "x": pa.array(out["x"], type=pa.int64()),
                "y": pa.array(out["y"], type=pa.int64()),
                "z2": pa.array(out["z2"], type=pa.int64()),
            }
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(compute, batch_format="pyarrow")


def _q_node_grid(sf_dir: str):
    """Distributed bulk noding (stages/noding.py; reference role:
    Noding/MCIndexNoder.cs:21 run layer-wide): per document a horizontal
    line crossed by up to ten long verticals; every crossing must split
    both lines, with no boundary-stitch pass (any intersecting pair
    shares a replication cell).  The SQL oracle regenerates the noded
    sub-segment inventory from the construction rules."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from nettopologysuite_ray.geom.types import Geom
    from nettopologysuite_ray.geom.wkb import to_wkb
    from nettopologysuite_ray.stages.noding import distributed_node

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows

    def build(batch: pa.Table) -> pa.Table:
        wkbs = []
        for i in batch["doc_id"].to_pylist():
            wkbs.append(
                to_wkb(Geom("LineString", np.array([(0, i), (100, i)], dtype=np.float64)))
            )
            if i % 50 == 0 and i < 500:
                x = 3 + 7 * (i // 50)
                wkbs.append(
                    to_wkb(
                        Geom(
                            "LineString",
                            np.array([(x, -1), (x, n_docs)], dtype=np.float64),
                        )
                    )
                )
        return pa.table({"wkb": pa.array(wkbs, type=pa.binary())})

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    noded = distributed_node(
        docs.map_batches(build, batch_format="pyarrow"), cell=25.0, as_wkb=False
    )

    def to_int(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                c: pc.cast(pc.round(batch[c]), pa.int64())
                for c in ("x0", "y0", "x1", "y1")
            }
        )

    return noded.map_batches(to_int, batch_format="pyarrow")


def _q_distance3d_docs(sf_dir: str):
    """3D point-to-segment distance (geom/distance3d.py; reference:
    Algorithm/CGAlgorithms3D.cs DistancePointSegment,
    Operation/Distance3D/Distance3DOp.cs): per document a Z-bearing point
    against a Z-bearing segment, both derived from doc_id; the SQL oracle
    replays the clamped-projection formula and compares the distance at
    micro precision."""
    import pyarrow as pa

    import ray.data as rd

    from nettopologysuite_ray.geom.distance3d import distance3d
    from nettopologysuite_ray.geom.wkt import from_wkt

    def compute(batch: pa.Table) -> pa.Table:
        ids, dists = [], []
        for i in batch["doc_id"].to_pylist():
            px, py, pz = i % 17, (i * 3) % 23, (i * 7) % 11
            ax = i % 13
            p = from_wkt(f"POINT ({px} {py} {pz})")
            seg = from_wkt(f"LINESTRING ({ax} 0 0, {ax + 10} 5 2)")
            ids.append(i)
            dists.append(int(round(distance3d(p, seg) * 1_000_000)))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "dist_1e6": pa.array(dists, type=pa.int64()),
            }
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(compute, batch_format="pyarrow")


def _q_fix_docs(sf_dir: str):
    """GeometryFixer as a distributed repair stage (geom/extra.py
    fix_geometry; reference Geometries/Utilities/GeometryFixer.cs:46):
    one deterministic INVALID polygon per document — bowtie /
    disjoint-hole / corner-overlapping-hole by doc_id % 3, side
    s = 100 + (doc_id % 7) * 20, translated by doc_id — repaired through
    WKB map_batches; part/hole counts and exact integer areas are closed
    forms the SQL oracle replays arithmetically."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.extra import fix_geometry
    from nettopologysuite_ray.geom.types import POLYGON, Geom
    from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb

    def _sq(x0: int, y0: int, side: int):
        return [(x0, y0), (x0 + side, y0), (x0 + side, y0 + side), (x0, y0 + side), (x0, y0)]

    def build(batch: pa.Table) -> pa.Table:
        wkbs = []
        for d in batch["doc_id"].to_pylist():
            s = 100 + (d % 7) * 20
            tx, ty = (d * 13) % 1000, (d * 17) % 1000
            k = d % 3
            if k == 0:  # bowtie: diagonals cross at the center
                rings = [[(0, 0), (s, s), (s, 0), (0, s), (0, 0)]]
            elif k == 1:  # hole entirely outside the shell
                rings = [_sq(0, 0, s), _sq(2 * s, 2 * s, s // 5)]
            else:  # hole overlapping the shell's top-right corner
                rings = [_sq(0, 0, s), _sq(3 * s // 4, 3 * s // 4, s // 2)]
            arrs = [
                np.array([(x + tx, y + ty) for x, y in r], dtype=np.float64)
                for r in rings
            ]
            wkbs.append(to_wkb(Geom(POLYGON, arrs)))
        return pa.table({"doc_id": batch["doc_id"], "wkb": pa.array(wkbs, type=pa.binary())})

    def repair(batch: pa.Table) -> pa.Table:
        ids, kinds, parts, holes, areas = [], [], [], [], []
        for d, w in zip(batch["doc_id"].to_pylist(), batch["wkb"].to_pylist()):
            f = fix_geometry(from_wkb(w))
            polys = [c for c in f.flatten() if c.gtype == POLYGON]
            ids.append(d)
            kinds.append(d % 3)
            parts.append(len(polys))
            holes.append(sum(len(p.data) - 1 for p in polys))
            areas.append(int(round(alg.area(f))))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "kind": pa.array(kinds, type=pa.int64()),
                "n_parts": pa.array(parts, type=pa.int64()),
                "n_holes": pa.array(holes, type=pa.int64()),
                "area": pa.array(areas, type=pa.int64()),
            }
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(build, batch_format="pyarrow").map_batches(
        repair, batch_format="pyarrow"
    )


def _q_dissolve_chains(sf_dir: str):
    """Distributed line dissolve/merge with tile-boundary stitching
    (stages/linemerge.py; reference roles: Dissolve/LineDissolver.cs:29,
    Operation/Linemerge/LineMerger.cs:25 run layer-wide): per document a
    horizontal unit-segment chain at y=2*doc_id+1 from x=a..b with
    degree-3 tick junctions at interior multiples of 7 (they split the
    chain), plus duplicated linework re-emitted by every third document
    (dissolve dedups it).  Tiles (cell=4) cut chains mid-way, so merging
    routinely stitches across cells.  Output: per merged line its min
    endpoint, vertex count and integer length — all recomputed by the
    SQL oracle from the construction rules."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from nettopologysuite_ray.geom.types import Geom
    from nettopologysuite_ray.geom.wkb import from_wkb, to_wkb
    from nettopologysuite_ray.stages.linemerge import distributed_line_dissolve

    def build(batch: pa.Table) -> pa.Table:
        wkbs = []

        def row_lines(i: int):
            a = (i * 7) % 20
            b = a + 15 + (i % 5)
            y = 2 * i + 1
            out = [np.array([(x, y) for x in range(a, b + 1)], dtype=np.float64)]
            for x in range(a + 1, b):
                if x % 7 == 0:
                    out.append(np.array([(x, y), (x, y + 1)], dtype=np.float64))
            return out

        for i in batch["doc_id"].to_pylist():
            for arr in row_lines(i):
                wkbs.append(to_wkb(Geom("LineString", arr)))
            if i % 3 == 0 and i > 0:
                # duplicate the previous doc's chain start: dissolve drops it
                ap = ((i - 1) * 7) % 20
                yp = 2 * (i - 1) + 1
                arr = np.array([(x, yp) for x in range(ap, ap + 4)], dtype=np.float64)
                wkbs.append(to_wkb(Geom("LineString", arr)))
        return pa.table({"wkb": pa.array(wkbs, type=pa.binary())})

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    lines = distributed_line_dissolve(
        docs.map_batches(build, batch_format="pyarrow"), cell=4.0
    )

    def classify(batch: pa.Table) -> pa.Table:
        mxs, mys, npts, lens = [], [], [], []
        for w in batch["line_wkb"].to_pylist():
            arr = from_wkb(w).data
            mxs.append(int(round(float(arr[:, 0].min()))))
            mys.append(int(round(float(arr[:, 1].min()))))
            npts.append(len(arr))
            seg = np.abs(np.diff(arr, axis=0)).sum()
            lens.append(int(round(float(seg))))
        return pa.table(
            {
                "mx": pa.array(mxs, type=pa.int64()),
                "my": pa.array(mys, type=pa.int64()),
                "npts": pa.array(npts, type=pa.int64()),
                "len": pa.array(lens, type=pa.int64()),
            }
        )

    return lines.map_batches(classify, batch_format="pyarrow")


def _q_within_distance_join(sf_dir: str):
    import ray.data as rd

    from nettopologysuite_ray.stages.cell_join import within_distance_join

    ents = _entities(sf_dir).select_columns(["doc_id", "entity_idx", "lon_1e2", "lat_1e2"])
    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    import numpy as np
    import pyarrow as pa

    def ev_points(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": b["event_id"],
                "lon_1e2": pa.array((eid * 7919) % 36000 - 18000),
                "lat_1e2": pa.array((eid * 104729) % 18000 - 9000),
            }
        )

    ev = events.map_batches(ev_points, batch_format="pyarrow")
    # salt_threshold=2: events are uniform (~2.4/cell at sf0.01), so a
    # realistic threshold would never fire here — 2 forces most cells
    # through the salting path, putting it under the DuckDB oracle's
    # value-hash (identity also asserted in tests/test_pipeline.py and
    # tools/join_bench.py --verify)
    out = within_distance_join(ev, ents, radius_1e2=300, left_keys=("event_id",),
                               right_keys=("doc_id", "entity_idx"),
                               salt_threshold=2, n_salt=16)
    return out.select_columns(["event_id", "doc_id", "entity_idx", "dist2"])


def _q_cluster_dbscan(sf_dir: str):
    """Deterministic distributed DBSCAN (stages/cluster.py) over points
    synthesized from event ids: 48 tight clusters (60% of points; one
    band with wide jitter supplies border/noise candidates) plus a
    uniform scattered field.  The oracle recomputes the exact semantics
    (integer dist2 <= eps^2; clusters = CCs of the core-core graph with
    MIN-core-id labels; border = MIN cluster over core neighbors) with a
    recursive CTE."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.stages.cluster import dbscan

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def synth(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = eid[eid % 4 == 0]
        m10 = eid % 10
        member = m10 < 5
        wide = m10 == 4
        cid = (eid // 4) % 48
        jx = np.where(wide, (eid * 7919) % 281 - 140, (eid * 7919) % 81 - 40)
        jy = np.where(wide, (eid * 104729) % 281 - 140, (eid * 104729) % 81 - 40)
        x = np.where(member, (cid * 4409) % 30000 - 15000 + jx,
                     (eid * 7919) % 36000 - 18000)
        y = np.where(member, (cid * 6829) % 15000 - 7500 + jy,
                     (eid * 104729) % 18000 - 9000)
        return pa.table(
            {"pt_id": pa.array(eid), "lon_1e2": pa.array(x), "lat_1e2": pa.array(y)}
        )

    pts = events.map_batches(synth, batch_format="pyarrow")
    return dbscan(pts, eps_1e2=150, min_pts=4, id_col="pt_id", level=6)


def _q_relational_rollups(sf_dir: str):
    """Merged gate row for the two broadcast-join relational rollups
    (top-k order selection + per-region customer counts), folded into one
    long-schema table so the 50-query driver cap keeps every component
    covered (VERDICT r3 item 1).  Both sub-results are driver-small
    (10 + #regions rows)."""
    import pandas as pd
    import pyarrow as pa

    top = _q_top_orders(sf_dir).to_pandas()
    reg = _q_customers_per_region(sf_dir).to_pandas()
    out = pd.DataFrame(
        {
            "tag": ["top_order"] * len(top) + ["region"] * len(reg),
            "key": [str(int(k)) for k in top["o_orderkey"]] + list(reg["r_name"]),
            "v1": list(top["o_custkey"].astype("int64"))
            + list(reg["n_customers"].astype("int64")),
            "v2": list(top["totalprice_1e2"].astype("int64")) + [0] * len(reg),
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def _q_tile_top_docs(sf_dir: str):
    from nettopologysuite_ray.stages.tiling import assign_cells_batch, grouped_topk_min

    ds = _entities(sf_dir).map_batches(
        lambda b: assign_cells_batch(b, level=LEVEL, kind="morton"),
        batch_format="pyarrow",
    )
    out = grouped_topk_min(ds, "cell_id", "doc_id", k=3)
    return out.select_columns(["cell_id", "rank", "doc_id"])


def _q_distributed_union(sf_dir: str):
    """Distributed cascaded union (SURVEY §2.5 UnaryUnionOp/CascadedPolygonUnion
    as a dataflow): admin cells shuffled by longitude band, per-band local
    union (map_groups) of the 18 touching cells, band area emitted.
    The oracle recomputes each band's area arithmetically."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.geom import algorithms as alg
    from nettopologysuite_ray.geom.extra import coverage_union
    from nettopologysuite_ray.geom.wkb import from_wkb
    from nettopologysuite_ray.sources.pages import admin_boundaries_table

    t = admin_boundaries_table(fancy=False).select(["admin_id", "geometry_wkb"])
    ds = rd.from_arrow(t)

    def band_of(b: pa.Table) -> pa.Table:
        import numpy as np

        aid = b["admin_id"].to_numpy(zero_copy_only=False)
        return b.append_column("band", pa.array((aid % 36).astype("int64")))

    banded = ds.map_batches(band_of, batch_format="pyarrow")

    def union_band(g: pd.DataFrame) -> pd.DataFrame:
        polys = [from_wkb(w) for w in g["geometry_wkb"]]
        u = coverage_union(polys)  # noding-free dissolve of the coverage
        return pd.DataFrame(
            {"band": [int(g["band"].iloc[0])], "band_area": [alg.area(u)],
             "n_parts": [sum(1 for c in u.flatten())]}
        )

    return banded.groupby("band").map_groups(union_band, batch_format="pandas")


def _q_gml_kml_roundtrip(sf_dir: str):
    """Every conformance-corpus geometry encoded as GML2/GML3/KML and
    parsed back (reference IO surface); returns per-format totals.
    Distributed: corpus rows shard across the ConformanceRunner-style
    actor pool.  Rows-only check (XML IO is not SQL-expressible)."""
    import ray.data as rd

    from nettopologysuite_ray.sources.conformance import load_cases
    from nettopologysuite_ray.stages.geometry import GmlKmlRoundtrip

    table = load_cases(dirs=("general",)).select(["a_wkt"])
    ds = rd.from_arrow(table)
    partial = ds.map_batches(
        GmlKmlRoundtrip,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
        num_cpus=1,
    )

    def merge(b):
        import pyarrow as pa2

        df = b.to_pandas().groupby("fmt", as_index=False)[["n", "n_ok", "bytes"]].sum()
        # the rows-only gate still proves round-trip correctness: fail
        # loudly if ANY geometry did not survive encode->parse
        bad = df[df["n_ok"] != df["n"]]
        if len(bad):
            raise AssertionError(f"GML/KML round-trip failures: {bad.to_dict('records')}")
        return pa2.Table.from_pandas(df.sort_values("fmt"), preserve_index=False)

    return partial.repartition(1).map_batches(merge, batch_format="pyarrow")


def _q_coverage_simplify_grid(sf_dir: str):
    """SQL-oracle-checked distributed coverage simplification (reference:
    Coverage/CoverageSimplifier.cs:48).  Fixture: a 24x20 irregular
    rectangular coverage with every edge densified by 3 exact collinear
    points (integer coordinates, segment lengths divisible by 4 so the
    subdivision points are exactly representable).  Column bands are
    simplified edge-consistently in independent map_groups tasks; each
    cell must come back as exactly its 4-corner rectangle with integer
    area/perimeter — any dropped corner, kept collinear vertex, or
    cross-cell edge inconsistency breaks the hash match."""
    import ray.data as rd

    NX, NY = 24, 20

    ds = rd.range(NX * NY, override_num_blocks=8)

    def keys(b):
        import pyarrow as pa2

        ids = b["id"].to_numpy()
        i = ids // NY
        return pa2.table(
            {
                "i": pa2.array(i, type=pa2.int64()),
                "j": pa2.array(ids % NY, type=pa2.int64()),
                "band": pa2.array(i // 4, type=pa2.int64()),
            }
        )

    def simplify_band(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        import pandas as pd2

        from nettopologysuite_ray.geom import algorithms as alg
        from nettopologysuite_ray.geom.coverage_simplify import coverage_simplify
        from nettopologysuite_ray.geom.types import Geom

        def w_of(i):
            return 4 * ((i * 13) % 50 + 25)

        def h_of(j):
            return 4 * ((j * 17) % 50 + 25)

        xc = np.concatenate([[0], np.cumsum([w_of(i) for i in range(NX)])]).astype(float)
        yc = np.concatenate([[0], np.cumsum([h_of(j) for j in range(NY)])]).astype(float)

        def densify_ring(r, k=3):
            pts = [r[0]]
            for a, b in zip(r[:-1], r[1:]):
                for s in range(1, k + 1):
                    pts.append(a + (b - a) * (s / (k + 1)))
                pts.append(b)
            return np.array(pts)

        ii = g["i"].to_numpy()
        jj = g["j"].to_numpy()
        geoms = []
        for i, j in zip(ii, jj):
            ring = np.array(
                [
                    [xc[i], yc[j]],
                    [xc[i + 1], yc[j]],
                    [xc[i + 1], yc[j + 1]],
                    [xc[i], yc[j + 1]],
                    [xc[i], yc[j]],
                ]
            )
            geoms.append(Geom("Polygon", [densify_ring(ring)]))
        out = coverage_simplify(geoms, tol=0.5)
        return pd2.DataFrame(
            {
                "i": ii.astype("int64"),
                "j": jj.astype("int64"),
                "n_vertices": np.array(
                    [len(p.data[0]) - 1 for p in out], dtype="int64"
                ),
                "area": np.array(
                    [int(round(alg.area(p))) for p in out], dtype="int64"
                ),
                "perim_div4": np.array(
                    [int(round(alg.length(p) / 4)) for p in out], dtype="int64"
                ),
            }
        )

    return (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("band")
        .map_groups(simplify_band, batch_format="pandas")
    )


def _q_gml_kml_coords(sf_dir: str):
    """SQL-oracle-checked GML2/GML3/KML round-trip: per document build a
    3-point LineString and a CCW rectangle from integer-cent arithmetic,
    encode -> parse through each format, and emit the PARSED vertex
    coordinates back as integer cents.  Any precision loss or vertex
    reordering in the XML writers/readers (reference IO surface:
    IO/GML2/GMLWriter.cs, IO/KML/KMLReader.cs) breaks the hash match.
    Map-only: scales as a pure per-batch transform."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def roundtrip(batch):
        import numpy as np
        import pyarrow as pa2

        from nettopologysuite_ray.geom.gml import from_gml, to_gml2, to_gml3
        from nettopologysuite_ray.geom.kml import from_kml, to_kml
        from nettopologysuite_ray.geom.types import Geom

        out_id, out_kind, out_fmt, out_idx, out_x, out_y = [], [], [], [], [], []
        for did in batch["doc_id"].to_pylist():
            did = int(did)
            xs = [((did * 7919 + i * 131) % 36000 - 18000) / 100.0 for i in range(3)]
            ys = [((did * 104729 + i * 173) % 18000 - 9000) / 100.0 for i in range(3)]
            w = ((did % 37) + 1) / 100.0
            h = ((did % 53) + 1) / 100.0
            x0, y0 = xs[0], ys[0]
            geoms = (
                ("line", Geom.linestring(np.column_stack([xs, ys])), 3),
                ("poly", Geom.polygon(np.array(
                    [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]]
                )), 4),
            )
            for fmt, enc, dec in (
                ("gml2", to_gml2, from_gml),
                ("gml3", to_gml3, from_gml),
                ("kml", to_kml, from_kml),
            ):
                for kind, g, nv in geoms:
                    c = dec(enc(g)).all_coords()
                    for i in range(nv):  # skip the closing ring vertex
                        out_id.append(did)
                        out_kind.append(kind)
                        out_fmt.append(fmt)
                        out_idx.append(i)
                        out_x.append(int(round(c[i, 0] * 100)))
                        out_y.append(int(round(c[i, 1] * 100)))
        return pa2.table(
            {
                "doc_id": pa2.array(out_id, type=pa2.int64()),
                "kind": pa2.array(out_kind, type=pa2.string()),
                "fmt": pa2.array(out_fmt, type=pa2.string()),
                "idx": pa2.array(out_idx, type=pa2.int64()),
                "x_1e2": pa2.array(out_x, type=pa2.int64()),
                "y_1e2": pa2.array(out_y, type=pa2.int64()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow", batch_size=512)


def _q_cluster_hulls(sf_dir: str):
    """Per-cluster concave hull as a map_groups stage (reference:
    Algorithm/Hull/ConcaveHull.cs:57).  Fixture points: 4 forced box
    corners (0..10000 cents) + interior points strictly inside, so the
    length_ratio=1 hull is exactly the box — vertex count and doubled
    area are arithmetically oracle-checkable."""
    import numpy as np
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def pts(b: "pa.Table"):
        import pyarrow as pa2

        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cluster = did % 5
        pi = did // 5
        corners = np.array([[0, 0], [10000, 0], [10000, 10000], [0, 10000]])
        x = np.where(pi < 4, corners[np.minimum(pi, 3), 0], 1 + (did * 7919) % 9999)
        y = np.where(pi < 4, corners[np.minimum(pi, 3), 1], 1 + (did * 104729) % 9999)
        return pa2.table(
            {
                "cluster": pa2.array(cluster),
                "x": pa2.array(x.astype(np.int64)),
                "y": pa2.array(y.astype(np.int64)),
            }
        )

    def hull_group(g):
        import numpy as np
        import pandas as pd

        from nettopologysuite_ray.geom import algorithms as alg
        from nettopologysuite_ray.geom.hull import concave_hull
        from nettopologysuite_ray.geom.types import MULTIPOINT, Geom

        xy = np.stack([g["x"].to_numpy(), g["y"].to_numpy()], axis=1).astype(
            np.float64
        )
        h = concave_hull(Geom(MULTIPOINT, list(xy)), length_ratio=1.0)
        return pd.DataFrame(
            {
                "cluster": [np.int64(g["cluster"].iloc[0])],
                "n_points": [np.int64(len(g))],
                "hull_nverts": [np.int64(len(h.data[0]) - 1)],
                "hull_area2": [np.int64(round(2 * alg.area(h)))],
            }
        )

    return (
        docs.map_batches(pts, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(hull_group, batch_format="pandas")
    )


def _q_poly_join(sf_dir: str):
    """General geometry×geometry distributed spatial join gate
    (stages/geom_join.py; reference: Index/Strtree/STRtree.cs:32 bulk-load
    box query + Geometries/Prepared/PreparedPolygon.cs:71 prepared exact
    predicate, generalized to two large WKB layers).  Three legs under one
    tag column, each with a closed-form integer oracle:

      - intersects: diamond×diamond.  |x-cx|+|y-cy| <= r is the L-inf
        square of radius r in (u,v) = (x+y, x-y), so two diamonds
        intersect iff |du| <= r1+r2 AND |dv| <= r1+r2 — SQL-exact, while
        the engine runs the real DE-9IM relate on the polygon rings
        (bbox-overlapping but corner-separated diamonds exercise the
        exact kernel, not the envelope prefilter).
      - contains: big diamond contains small diamond iff r1 >= r2 AND
        |du| <= r1-r2 AND |dv| <= r1-r2.
      - dwithin: axis-aligned squares within euclidean distance D:
        gap_x^2 + gap_y^2 <= D^2 with gap = max(0, |dc| - (h1+h2)).

    Left layer: events (event_id % 5 == 0); right layer: documents."""
    import numpy as np
    import ray.data as rd

    from nettopologysuite_ray.stages.geom_join import spatial_join

    EXT = (-10000.0, -5000.0, 10000.0, 5000.0)

    def synth(ids: np.ndarray, shape: str, cmul1, cmul2, rbase, rmul, rmod):
        import pyarrow as pa2

        from nettopologysuite_ray.geom.types import POLYGON, Geom
        from nettopologysuite_ray.geom.wkb import to_wkb

        cx = (ids * cmul1) % 20000 - 10000
        cy = (ids * cmul2) % 10000 - 5000
        r = rbase + (ids * rmul) % rmod
        wkbs = []
        for x, y, rr in zip(cx, cy, r):
            x, y, rr = float(x), float(y), float(rr)
            if shape == "diamond":
                ring = np.array(
                    [[x + rr, y], [x, y + rr], [x - rr, y], [x, y - rr], [x + rr, y]]
                )
            else:  # square
                ring = np.array(
                    [
                        [x - rr, y - rr],
                        [x + rr, y - rr],
                        [x + rr, y + rr],
                        [x - rr, y + rr],
                        [x - rr, y - rr],
                    ]
                )
            wkbs.append(to_wkb(Geom(POLYGON, [ring])))
        return pa2.array(wkbs, type=pa2.binary())

    def leg(tag: str, shape: str, lparams, rparams, predicate: str, dist=0.0):
        import pyarrow as pa2

        def l_synth(b: "pa.Table") -> "pa.Table":
            eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = eid % 5 == 0
            eid = eid[keep]
            return pa2.table(
                {"l_id": pa2.array(eid), "wkb": synth(eid, shape, *lparams)}
            )

        def r_synth(b: "pa.Table") -> "pa.Table":
            did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa2.table(
                {"r_id": pa2.array(did), "wkb": synth(did, shape, *rparams)}
            )

        lds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"]).map_batches(
            l_synth, batch_format="pyarrow"
        )
        rds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).map_batches(
            r_synth, batch_format="pyarrow"
        )
        out = spatial_join(
            lds,
            rds,
            predicate,
            left_keys=("l_id",),
            right_keys=("r_id",),
            extent=EXT,
            level=5,
            distance=dist,
            salt_threshold=40,
            n_salt=8,
        )

        def add_tag(b: "pa.Table") -> "pa.Table":
            return b.append_column("tag", pa2.array([tag] * len(b), type=pa2.string()))

        return out.map_batches(add_tag, batch_format="pyarrow")

    a = leg("intersects", "diamond", (7919, 104729, 50, 37, 200), (6151, 911, 50, 53, 200), "intersects")
    b = leg("contains", "diamond", (7919, 104729, 300, 37, 200), (6151, 911, 10, 53, 40), "contains")
    c = leg("dwithin", "square", (7919, 104729, 30, 29, 100), (6151, 911, 30, 41, 100), "dwithin", dist=200.0)

    # 4th leg: the BROADCAST path for polygon probes — PreparedRelateJoin
    # (prepared vertex-in-area / segment-index short-circuits, reference:
    # Geometries/Prepared/PreparedPolygon.cs:31-47) against the same
    # closed-form diamond oracle, distinct radii from the cell-join leg
    def bcast_leg():
        import pyarrow as pa2
        import pyarrow.parquet as pq

        from nettopologysuite_ray.stages.spatial_join import (
            PreparedRelateJoin,
            prepare_admin_geoms,
        )

        did = (
            pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])[
                "doc_id"
            ]
            .to_numpy()
            .astype(np.int64)
        )
        admin_tbl = pa2.table(
            {
                "admin_id": pa2.array(did),
                "geometry_wkb": synth(did, "diamond", 6151, 911, 40, 59, 150),
            }
        )
        ref = prepare_admin_geoms(admin_tbl)

        def p_synth(bt: "pa.Table") -> "pa.Table":
            eid = bt["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            eid = eid[eid % 5 == 0]
            return pa2.table(
                {"l_id": pa2.array(eid), "wkb": synth(eid, "diamond", 7919, 104729, 40, 41, 150)}
            )

        out = (
            rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
            .map_batches(p_synth, batch_format="pyarrow")
            .map_batches(
                PreparedRelateJoin,
                fn_constructor_args=(ref, "intersects"),
                # autoscaling pool with min 1: a fixed pool sized at the
                # CPU count deadlocks small sessions (actors hold every
                # slot, upstream read tasks starve)
                concurrency=(1, 4),
                batch_size=512,
                batch_format="pyarrow",
            )
        )

        def shape_rows(bt: "pa.Table") -> "pa.Table":
            return pa2.table(
                {
                    "tag": pa2.array(["bcast_intersects"] * len(bt), type=pa2.string()),
                    "l_id": bt["l_id"],
                    "r_id": bt["admin_id"],
                }
            )

        return out.map_batches(shape_rows, batch_format="pyarrow")

    d = bcast_leg()
    return a.union(b).union(c).union(d).select_columns(["tag", "l_id", "r_id"])


def _q_triangulate_events(sf_dir: str):
    """Constrained-Delaunay triangulation of per-event L-shaped polygons
    (reference: Triangulate/Polygon/ConstrainedDelaunayTriangulator.cs:18).
    Integer-cent vertices make the doubled triangle areas exact, so
    triangle count (6-vertex simple polygon -> 4 tris) and total doubled
    area are arithmetically oracle-checkable."""
    import numpy as np
    import ray.data as rd

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def tri_batch(b: "pa.Table"):
        import pyarrow as pa2

        from nettopologysuite_ray.geom.polytri import constrained_delaunay
        from nettopologysuite_ray.geom.types import POLYGON, Geom

        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = 1000 + (eid * 7) % 500
        bb = 500 + (eid * 11) % 300
        c = a // 2
        d = bb + 200 + (eid * 13) % 100
        n_tris = np.empty(len(eid), dtype=np.int64)
        area2 = np.empty(len(eid), dtype=np.int64)
        for i in range(len(eid)):
            ring = np.array(
                [
                    [0, 0],
                    [a[i], 0],
                    [a[i], bb[i]],
                    [c[i], bb[i]],
                    [c[i], d[i]],
                    [0, d[i]],
                    [0, 0],
                ],
                dtype=np.float64,
            )
            gc = constrained_delaunay(Geom(POLYGON, [ring]))
            tris = list(gc.flatten())
            n_tris[i] = len(tris)
            tot = 0
            for t in tris:
                r = t.data[0]
                tot += abs(
                    (r[1, 0] - r[0, 0]) * (r[2, 1] - r[0, 1])
                    - (r[2, 0] - r[0, 0]) * (r[1, 1] - r[0, 1])
                )
            area2[i] = np.int64(round(tot))
        return pa2.table(
            {
                "event_id": pa2.array(eid),
                "n_tris": pa2.array(n_tris),
                "area2": pa2.array(area2),
            }
        )

    return events.map_batches(tri_batch, batch_format="pyarrow")


def _q_voronoi_cells(sf_dir: str):
    """Per-tile Voronoi diagram as a map_groups stage (reference:
    Triangulate/VoronoiDiagramBuilder.cs:28).  Sites derive from event_id
    integer arithmetic; the oracle checks the exact partition invariant:
    each distinct site keeps exactly one clipped cell and the cells tile
    the clip envelope (area ratio == 1 within 1e-6)."""
    import numpy as np
    import ray.data as rd

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def sites(b: "pa.Table"):
        import pyarrow as pa2

        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa2.table(
            {
                "tile": pa2.array(eid % 16),
                "x": pa2.array((eid * 7919) % 10000),
                "y": pa2.array((eid * 104729) % 10000),
            }
        )

    def voro_group(g):
        import numpy as np
        import pandas as pd

        from nettopologysuite_ray.geom import algorithms as alg
        from nettopologysuite_ray.geom.triangulate import voronoi
        from nettopologysuite_ray.geom.types import MULTIPOINT, Geom

        xy = np.unique(
            np.stack([g["x"].to_numpy(), g["y"].to_numpy()], axis=1).astype(
                np.float64
            ),
            axis=0,
        )
        gm = Geom(MULTIPOINT, list(xy))
        v = voronoi(gm)
        env = alg.envelope(gm)
        w = (env[2] - env[0]) or 1.0
        h = (env[3] - env[1]) or 1.0
        tot = sum(alg.area(c) for c in v.data)
        return pd.DataFrame(
            {
                "tile": [np.int64(g["tile"].iloc[0])],
                "n_sites": [np.int64(len(xy))],
                "n_cells": [np.int64(len(v.data))],
                "area_ppm": [np.int64(round(tot / ((2 * w) * (2 * h)) * 1e6))],
            }
        )

    return (
        events.map_batches(sites, batch_format="pyarrow")
        .groupby("tile")
        .map_groups(voro_group, batch_format="pandas")
    )


def _q_triangulate_voronoi(sf_dir: str):
    """Consolidates the r4 `triangulate_events` and `voronoi_cells` gate
    rows under one tag column (the driver gates at most 50 queries; this
    freed the slot for `poly_join`).  Schemas map to (tag, key, a, b, c):
      tri:     key=event_id, a=n_tris, b=area2,  c=0
      voronoi: key=tile,     a=n_sites, b=n_cells, c=area_ppm
    """
    import pyarrow as pa2

    tri = _q_triangulate_events(sf_dir).map_batches(
        lambda t: pa2.table(
            {
                "tag": pa2.array(["tri"] * len(t), type=pa2.string()),
                "key": t["event_id"],
                "a": t["n_tris"],
                "b": t["area2"],
                "c": pa2.array([0] * len(t), type=pa2.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    vor = _q_voronoi_cells(sf_dir).map_batches(
        lambda t: pa2.table(
            {
                "tag": pa2.array(["voronoi"] * len(t), type=pa2.string()),
                "key": t["tile"],
                "a": t["n_sites"],
                "b": t["n_cells"],
                "c": t["area_ppm"],
            }
        ),
        batch_format="pyarrow",
    )
    return tri.union(vor)


def _q_buffer_styles(sf_dir: str):
    """Non-round buffer styles under one gate row (reference:
    Operation/Buffer/BufferParameters.cs JoinStyle.Mitre / EndCapStyle /
    IsSingleSided).  Per admin id: a w-square buffered with mitre joins is
    exactly the expanded square (doubled area + the 12-vertex regression
    pin), a straight segment buffered with flat caps is the exact
    rectangle, square caps extend d beyond each end, and single-sided
    buffers cover only the signed side (side proven by the centroid) —
    every metric is integer-exact, so the oracle is pure arithmetic."""
    import numpy as np
    import ray.data as rd

    ds = rd.range(648).map_batches(
        lambda b: {"admin_id": b["id"].astype(np.int64)}, batch_format="numpy"
    )

    def buf(b: "pa.Table"):
        import pyarrow as pa2

        from nettopologysuite_ray.geom import algorithms as alg
        from nettopologysuite_ray.geom.buffer import buffer
        from nettopologysuite_ray.geom.types import POLYGON, Geom

        aid = b["admin_id"].to_numpy(zero_copy_only=False)
        w = 500 + (aid * 7) % 500
        dm = 50 + (aid * 13) % 100
        L = 200 + (aid * 7) % 300
        dc = 10 + (aid * 13) % 40
        cols = {
            k: np.empty(len(aid), dtype=np.int64)
            for k in (
                "mitre_area2",
                "mitre_nverts",
                "flat2",
                "square2",
                "ss2",
                "ss_cy2",
                "ssr_cy2",
            )
        }
        for i in range(len(aid)):
            wi = float(w[i])
            sq = Geom(
                POLYGON,
                [np.array([[0, 0], [wi, 0], [wi, wi], [0, wi], [0, 0]])],
            )
            out = buffer(sq, float(dm[i]), join="mitre")
            cols["mitre_area2"][i] = np.int64(round(2 * alg.area(out)))
            cols["mitre_nverts"][i] = len(out.data[0]) - 1
            line = Geom.linestring(np.array([[0.0, 0.0], [float(L[i]), 0.0]]))
            di = float(dc[i])
            cols["flat2"][i] = np.int64(round(2 * alg.area(buffer(line, di, cap="flat"))))
            cols["square2"][i] = np.int64(
                round(2 * alg.area(buffer(line, di, cap="square")))
            )
            left = buffer(line, di, single_sided=True)
            right = buffer(line, -di, single_sided=True)
            cols["ss2"][i] = np.int64(round(2 * alg.area(left)))
            cols["ss_cy2"][i] = np.int64(round(2 * alg.centroid(left).data[1]))
            cols["ssr_cy2"][i] = np.int64(round(2 * alg.centroid(right).data[1]))
        t = {"admin_id": pa2.array(aid)}
        t.update({k: pa2.array(v) for k, v in cols.items()})
        return pa2.table(t)

    return ds.map_batches(buf, batch_format="pyarrow", batch_size=64, num_cpus=0.9)


def _q_multimodal_decode(sf_dir: str):
    """Multimodal image decode, oracle-checked: solid-colour images whose
    RGB derives from doc_id are encoded to real PPM (even ids) / BMP (odd
    ids) bytes, shipped as opaque binary columns, and DECODED back to
    pixels by the pure-numpy decoders (stages/multimodal.py) inside a
    map_batches stage.  Emitted width/height/luminance come from the
    decoded array — the DuckDB oracle recomputes them from doc_id
    arithmetic, so a single wrong pixel or header byte fails the hash."""
    import numpy as np
    import ray.data as rd

    ds = rd.range(256).map_batches(
        lambda b: {"doc_id": b["id"].astype(np.int64)}, batch_format="numpy"
    )

    def enc_dec(b: "pa.Table"):
        import pyarrow as pa2

        from nettopologysuite_ray.functions.imagecodec import decode_png, encode_png
        from nettopologysuite_ray.stages.multimodal import (
            decode_bmp,
            decode_ppm,
            encode_bmp,
            encode_ppm,
        )

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        w_out = np.empty(len(ids), dtype=np.int64)
        h_out = np.empty(len(ids), dtype=np.int64)
        lum_out = np.empty(len(ids), dtype=np.int64)
        sum_out = np.empty(len(ids), dtype=np.int64)
        for i, d in enumerate(ids):
            d = int(d)
            w = 8 + d % 16
            h = 8 + (d // 3) % 12
            rgb = np.array([(d * 37) % 256, (d * 59) % 256, (d * 83) % 256], dtype=np.uint8)
            img = np.broadcast_to(rgb, (h, w, 3)).copy()
            # three real codecs under the same pixel-exact oracle (r5
            # adds the pure-numpy PNG of functions/imagecodec.py; JPEG
            # is lossy so it is pinned by pytest instead)
            codec = d % 3
            if codec == 0:
                blob, dec = encode_ppm(img), None
                dec = decode_ppm(blob)
            elif codec == 1:
                blob = encode_bmp(img)
                dec = decode_bmp(blob)
            else:
                blob = encode_png(img)
                dec = decode_png(blob)
            h_out[i], w_out[i] = dec.shape[:2]
            # first-pixel luminance: identical float64 ops in DuckDB;
            # pix_sum covers EVERY decoded byte integer-exactly
            lum = float(dec[0, 0].astype(np.float64) @ np.array([0.299, 0.587, 0.114]))
            lum_out[i] = np.int64(round(1e6 * lum))
            sum_out[i] = np.int64(dec.astype(np.int64).sum())
        return pa2.table(
            {
                "doc_id": pa2.array(ids),
                "width": pa2.array(w_out),
                "height": pa2.array(h_out),
                "lum_1e6": pa2.array(lum_out),
                "pix_sum": pa2.array(sum_out),
            }
        )

    return ds.map_batches(enc_dec, batch_format="pyarrow", batch_size=64, num_cpus=0.9)


def _q_densify_simplify(sf_dir: str):
    """Densify + Douglas-Peucker round trip (reference: Densify/
    Densifier.cs:27, Simplify/DouglasPeuckerSimplifier.cs): per-cell
    rectangles densified below max_len then simplified back to their 4
    corners — vertex count and exact doubled area are arithmetic."""
    import numpy as np
    import ray.data as rd

    ds = rd.range(648).map_batches(
        lambda b: {"admin_id": b["id"].astype(np.int64)}, batch_format="numpy"
    )

    def ds_fn(b: "pa.Table"):
        import pyarrow as pa2

        from nettopologysuite_ray.geom import algorithms as alg
        from nettopologysuite_ray.geom.types import POLYGON, Geom

        aid = b["admin_id"].to_numpy(zero_copy_only=False)
        w = 500 + (aid * 7) % 500
        h = 300 + (aid * 13) % 300
        area2 = np.empty(len(aid), dtype=np.int64)
        nverts = np.empty(len(aid), dtype=np.int64)
        for i in range(len(aid)):
            wi, hi = float(w[i]), float(h[i])
            rect = Geom(
                POLYGON,
                [np.array([[0, 0], [wi, 0], [wi, hi], [0, hi], [0, 0]])],
            )
            dense = alg.densify(rect, 70.0)
            simp = alg.simplify_dp(dense, 1.0)
            area2[i] = np.int64(round(2 * alg.area(simp)))
            nverts[i] = len(simp.data[0]) - 1
        return pa2.table(
            {
                "admin_id": pa2.array(aid),
                "area2": pa2.array(area2),
                "nverts": pa2.array(nverts),
            }
        )

    return ds.map_batches(ds_fn, batch_format="pyarrow")


def _q_coverage_simplify(sf_dir: str):
    """Per-band coverage simplification of the admin-boundary coverage
    (reference: Coverage/CoverageSimplifier.cs:48): polygons grouped into
    bands, each band's coverage simplified edge-consistently inside a
    map_groups task; reports vertex reduction + validity.  Rows-only."""
    import ray.data as rd

    from nettopologysuite_ray.sources.pages import admin_boundaries_table

    t = admin_boundaries_table(fancy=True).select(["admin_id", "geometry_wkb"])
    ds = rd.from_arrow(t)

    def band_of(b):
        import numpy as np
        import pyarrow as pa2

        aid = b["admin_id"].to_numpy(zero_copy_only=False)
        return b.append_column("band", pa2.array((aid % 12).astype("int64")))

    def simplify_band(g: pd.DataFrame) -> pd.DataFrame:
        from nettopologysuite_ray.geom import algorithms as alg
        from nettopologysuite_ray.geom.coverage_simplify import coverage_simplify
        from nettopologysuite_ray.geom.validity import is_valid
        from nettopologysuite_ray.geom.wkb import from_wkb as _fwkb

        import numpy as np
        import pandas as pd2

        from nettopologysuite_ray.geom.types import Geom as _G

        def densify(p, k=4):
            rings = []
            for r in p.data:
                pts = [r[0]]
                for a2, b2 in zip(r[:-1], r[1:]):
                    for s in range(1, k + 1):
                        pts.append(a2 + (b2 - a2) * (s / k))
                rings.append(np.array(pts))
            return _G("Polygon", rings)

        # densified borders (collinear vertices) give the simplifier real
        # work; shared borders densify identically so edges still dedup
        polys = [densify(_fwkb(w)) for w in g["geometry_wkb"]]
        simp = coverage_simplify(polys, 0.05)
        nv0 = sum(len(r) for p in polys for r in p.data)
        nv1 = sum(len(r) for p in simp for r in p.data)
        return pd2.DataFrame(
            {
                "band": [int(g["band"].iloc[0])],
                "n_polys": [len(polys)],
                "verts_before": [nv0],
                "verts_after": [nv1],
                "all_valid": [bool(all(is_valid(p) for p in simp))],
                "area_after": [float(sum(alg.area(p) for p in simp))],
            }
        )

    return (
        ds.map_batches(band_of, batch_format="pyarrow")
        .groupby("band")
        .map_groups(simplify_band, batch_format="pandas")
    )


def _q_extent_agg(sf_dir: str):
    """EnvelopeCombiner + GeometryCombiner as first-class aggregates
    (reference: Geometries/Utilities/EnvelopeCombiner.cs:12,
    GeometryCombiner.cs:16): entities become point WKBs, grouped into 8
    bands; the 'agg' leg runs the mergeable EnvelopeUnion AggregateFn
    (+ Count) through ds.groupby().aggregate(), the 'combine' leg
    collects each band into ONE combined geometry via map_groups
    (BuildGeometry semantics) and takes its envelope — both must equal
    the arithmetic min/max the SQL oracle computes."""
    import pyarrow as pa

    from nettopologysuite_ray.stages.combine import EnvelopeUnion, combine_wkb_groups

    def to_points(b: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow as pa2

        from nettopologysuite_ray.geom.types import Geom
        from nettopologysuite_ray.geom.wkb import to_wkb

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        wkbs = [
            to_wkb(Geom.point(float(x), float(y)))
            for x, y in zip(b["lon_1e2"].to_pylist(), b["lat_1e2"].to_pylist())
        ]
        return pa2.table(
            {
                "band": pa2.array((ids % 8).astype("int64")),
                "wkb": pa2.array(wkbs, type=pa2.binary()),
            }
        )

    def pts():
        return _entities(sf_dir).map_batches(to_points, batch_format="pyarrow")

    from ray.data.aggregate import Count

    agg = pts().groupby("band").aggregate(EnvelopeUnion("wkb"), Count())

    def expand_agg(b: pa.Table) -> pa.Table:
        import pyarrow as pa2

        ext = b["extent"].to_pylist()
        return pa2.table(
            {
                "band": b["band"],
                "src": pa2.array(["agg"] * len(b), type=pa2.string()),
                "n_geoms": b["count()"].cast(pa2.int64()),
                "minx": pa2.array([int(round(e[0])) for e in ext], type=pa2.int64()),
                "miny": pa2.array([int(round(e[1])) for e in ext], type=pa2.int64()),
                "maxx": pa2.array([int(round(e[2])) for e in ext], type=pa2.int64()),
                "maxy": pa2.array([int(round(e[3])) for e in ext], type=pa2.int64()),
            }
        )

    comb = combine_wkb_groups(pts(), "band", "wkb")

    def expand_comb(b: pa.Table) -> pa.Table:
        import pyarrow as pa2

        from nettopologysuite_ray.geom import algorithms as alg
        from nettopologysuite_ray.geom.wkb import from_wkb

        envs = [alg.envelope(from_wkb(w)) for w in b["combined_wkb"].to_pylist()]
        return pa2.table(
            {
                "band": b["band"],
                "src": pa2.array(["combine"] * len(b), type=pa2.string()),
                "n_geoms": b["n_geoms"].cast(pa2.int64()),
                "minx": pa2.array([int(round(e[0])) for e in envs], type=pa2.int64()),
                "miny": pa2.array([int(round(e[1])) for e in envs], type=pa2.int64()),
                "maxx": pa2.array([int(round(e[2])) for e in envs], type=pa2.int64()),
                "maxy": pa2.array([int(round(e[3])) for e in envs], type=pa2.int64()),
            }
        )

    return agg.map_batches(expand_agg, batch_format="pyarrow").union(
        comb.map_batches(expand_comb, batch_format="pyarrow")
    )


def _q_linearref_m(sf_dir: str):
    """M-ordinate (measure) linear referencing under the hash gate
    (reference: Geometries/CoordinateM.cs:9 +
    LinearReferencing/LengthLocationMap.cs:17): per doc a 3-vertex route
    polyline with strictly-increasing integer measures is built as a
    LINESTRING M WKT, PARSED back (so M rides the real IO path), then
    MeasureIndexedLine answers locate-along (extract_point at two
    measures), project-to-measure, measure-at-length and locate-between
    (extract_line with M carried per vertex) — all answers integer-exact
    by construction, replayed arithmetically by the SQL oracle."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def lr(b: "pa.Table"):
        import numpy as np
        import pyarrow as pa2

        from nettopologysuite_ray.geom.linearref import MeasureIndexedLine
        from nettopologysuite_ray.geom.wkt import from_wkt

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        cols = {
            k: np.empty(len(ids), dtype=np.int64)
            for k in (
                "pax", "pay", "pbx", "pby", "proj_m", "m_half", "sub_npts", "sub_msum"
            )
        }
        for i, d in enumerate(ids):
            d = int(d)
            L1 = 4 * (10 + d % 50)
            L2 = 4 * (5 + d % 30)
            m0 = d
            dm1 = 4 * (1 + d % 20)
            dm2 = 4 * (2 + d % 10)
            m1, m2 = m0 + dm1, m0 + dm1 + dm2
            wkt = (
                f"LINESTRING M (0 0 {m0}, {L1} 0 {m1}, {L1} {L2} {m2})"
            )
            mil = MeasureIndexedLine(from_wkt(wkt))
            ma = m0 + dm1 // 2
            mb = m1 + dm2 // 4
            pa_ = mil.extract_point(float(ma))
            pb_ = mil.extract_point(float(mb))
            cols["pax"][i] = round(pa_.data[0])
            cols["pay"][i] = round(pa_.data[1])
            cols["pbx"][i] = round(pb_.data[0])
            cols["pby"][i] = round(pb_.data[1])
            cols["proj_m"][i] = round(mil.project(L1 / 4.0, 7.0))
            cols["m_half"][i] = round(mil.m_at_length(L1 + L2 / 2.0))
            sub = mil.extract_line(float(ma), float(mb))
            cols["sub_npts"][i] = len(sub.data)
            cols["sub_msum"][i] = round(float(sub.extra["ords"].sum()))
        t = {"doc_id": pa2.array(ids)}
        t.update({k: pa2.array(v) for k, v in cols.items()})
        return pa2.table(t)

    return ds.map_batches(lr, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    # NOTE: the driver gates at most 50 queries (CORRECTNESS_r03 silently
    # dropped entries 51-56), so sibling queries are consolidated under one
    # row each (mode/kind/method tag columns) and the rows-only XML/coverage
    # round-trip variants moved to pytest (tests/test_pipeline.py) — every
    # entry below has a hash-checked oracle except conformance_summary.
    return {
        "conformance_summary": _q_conformance,
        "distributed_union": _q_distributed_union,
        "tile_top_docs": _q_tile_top_docs,
        "geom_stats": _q_geom_stats,
        "affine_docs": _q_affine_docs,
        "polygonize_grid": _q_polygonize_grid,
        "dissolve_chains": _q_dissolve_chains,
        "distance3d_docs": _q_distance3d_docs,
        "fix_docs": _q_fix_docs,
        "node_grid": _q_node_grid,
        "overlay_z_docs": _q_overlay_z_docs,
        "within_distance_join": _q_within_distance_join,
        "cluster_dbscan": _q_cluster_dbscan,
        "geo_extract": _q_geo_extract,
        "spatial_join_modes": _q_spatial_join_modes,
        "tile_curves": _q_tile_curves,
        "tile_stats_morton": _q_tile_stats_morton,
        "knn_admin": _q_knn_admin,
        "extent_agg": _q_extent_agg,
        "linearref_m": _q_linearref_m,
        "buffer_styles": _q_buffer_styles,
        "densify_simplify": _q_densify_simplify,
        "multimodal_decode": _q_multimodal_decode,
        "q1_pricing": _q_q1_pricing,
        "relational_rollups": _q_relational_rollups,
        "events_stats": _q_events_stats,
        "doc_token_stats": _q_doc_token_stats,
        "dedup_exact": _q_dedup_exact,
        "ann_topk": _q_ann_topk,
        "embed_near_dup": _q_embed_near_dup,
        "near_dup_groups": _q_near_dup_groups,
        "winnow_fingerprint": _q_winnow_fingerprint,
        "windows_rollup": _q_windows_rollup,
        "session_stats": _q_session_stats,
        "asof_join": _q_asof_join,
        "event_sketch_stats": _q_event_sketch_stats,
        "sample_per_lang": _q_sample_per_lang,
        "raster_roundtrip": _q_raster_roundtrip,
        "split_assign": _q_split_assign,
        "term_stats": _q_term_stats,
        "kmeans_embed": _q_kmeans_embed,
        "pii_redact": _q_pii_redact,
        "lang_pred": _q_lang_pred,
        "minhash_lsh_pairs": _q_minhash_lsh_pairs,
        "simhash": _q_simhash,
        "gml_kml_coords": _q_gml_kml_coords,
        "coverage_simplify_grid": _q_coverage_simplify_grid,
        "cluster_hulls": _q_cluster_hulls,
        "triangulate_voronoi": _q_triangulate_voronoi,
        "poly_join": _q_poly_join,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles


_ENTS_CTE = """
WITH ents AS (
  SELECT doc_id, unnest(range(doc_id % 4)) AS entity_idx FROM documents
), e2 AS (
  SELECT doc_id, entity_idx,
    CASE WHEN doc_id % 10 < 3 THEN 1320 + (doc_id*7919 + entity_idx*131) % 40
         ELSE (doc_id*7919 + entity_idx*131) % 36000 - 18000 END AS lon_1e2,
    CASE WHEN doc_id % 10 < 3 THEN 5240 + (doc_id*104729 + entity_idx*173) % 20
         ELSE (doc_id*104729 + entity_idx*173) % 18000 - 9000 END AS lat_1e2
  FROM ents
)
"""


def _sql_spread(e: str) -> str:
    s = f"({e})"
    s = f"(({s} | ({s} << 8)) & 16711935)"
    s = f"(({s} | ({s} << 4)) & 252645135)"
    s = f"(({s} | ({s} << 2)) & 858993459)"
    s = f"(({s} | ({s} << 1)) & 1431655765)"
    return s


def _sql_morton_cell(level: int) -> str:
    n = 1 << level
    ix = f"((lon_1e2 + 18000) * {n} // 36000)"
    iy = f"((lat_1e2 + 9000) * {n} // 18000)"
    return f"({_sql_spread(ix)} | ({_sql_spread(iy)} << 1))"


def _sql_lang_pred() -> str:
    """The stopword-profile heuristic of functions/text.py LangIdModel,
    verbatim in SQL: token-occurrence hits per profile, argmax with
    alphabetical-first tie-break, 'und' when no profile hits."""
    from nettopologysuite_ray.functions.text import _STOPWORDS

    rows = ", ".join(
        f"('{lang}', '{w}')"
        for lang in sorted(_STOPWORDS)
        for w in sorted(_STOPWORDS[lang])
    )
    return f"""
WITH tok AS (
  SELECT doc_id, lang,
         lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS w
  FROM documents
),
prof(plang, w) AS (VALUES {rows}),
hits AS (
  SELECT t.doc_id, t.lang, p.plang, count(*) AS h
  FROM tok t JOIN prof p ON p.w = t.w
  GROUP BY 1, 2, 3
),
best AS (
  SELECT doc_id, plang AS lang_pred,
         row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, plang ASC) AS rn
  FROM hits
),
pred AS (
  SELECT d.doc_id, d.lang, coalesce(b.lang_pred, 'und') AS lang_pred
  FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
)
SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2
"""


def oracle_sql() -> dict[str, str]:
    morton = _sql_morton_cell(LEVEL)
    return {
        "distributed_union": """
WITH g AS (SELECT unnest(range(36)) AS band)
SELECT band, 1800.0 AS band_area, CAST(1 AS BIGINT) AS n_parts FROM g
""",
        # the simplified coverage must be exactly the generating rectangles:
        # 4 corners, integer area w*h and quarter-perimeter (w+h)/2
        "coverage_simplify_grid": """
WITH ci AS (SELECT unnest(range(24)) AS i), cj AS (SELECT unnest(range(20)) AS j),
d AS (SELECT i, j, 4*((i*13)%50+25) AS w, 4*((j*17)%50+25) AS h FROM ci CROSS JOIN cj)
SELECT i, j, CAST(4 AS BIGINT) AS n_vertices,
       CAST(w*h AS BIGINT) AS area,
       CAST((w+h)/2 AS BIGINT) AS perim_div4
FROM d
""",
        # replay of the deterministic vertex arithmetic the engine pushes
        # through encode->parse for each of GML2/GML3/KML; hash match
        # proves the XML IO preserves every vertex exactly in order
        "gml_kml_coords": """
WITH li AS (SELECT doc_id, 'line' AS kind, unnest(range(3)) AS idx FROM documents),
lc AS (SELECT doc_id, kind, idx,
         (doc_id*7919 + idx*131) % 36000 - 18000 AS x_1e2,
         (doc_id*104729 + idx*173) % 18000 - 9000 AS y_1e2 FROM li),
pi AS (SELECT doc_id, 'poly' AS kind, unnest(range(4)) AS idx FROM documents),
pc AS (SELECT doc_id, kind, idx,
         (doc_id*7919) % 36000 - 18000
           + CASE WHEN idx IN (1,2) THEN (doc_id % 37) + 1 ELSE 0 END AS x_1e2,
         (doc_id*104729) % 18000 - 9000
           + CASE WHEN idx IN (2,3) THEN (doc_id % 53) + 1 ELSE 0 END AS y_1e2 FROM pi),
f AS (SELECT unnest(['gml2','gml3','kml']) AS fmt)
SELECT doc_id, kind, f.fmt, CAST(idx AS BIGINT) AS idx,
       CAST(x_1e2 AS BIGINT) AS x_1e2, CAST(y_1e2 AS BIGINT) AS y_1e2
FROM (SELECT * FROM lc UNION ALL SELECT * FROM pc) c CROSS JOIN f
""",
        "geom_stats": """
WITH g AS (SELECT unnest(range(648)) AS admin_id)
SELECT admin_id, 100.0 AS area,
  CAST((admin_id % 36) * 10 - 175 AS DOUBLE) AS cx,
  CAST((admin_id // 36) * 10 - 85 AS DOUBLE) AS cy,
  CAST((admin_id % 36) * 10 - 180 AS DOUBLE) AS minx,
  CAST((admin_id // 36) * 10 - 90 AS DOUBLE) AS miny,
  CAST((admin_id % 36) * 10 - 170 AS DOUBLE) AS maxx,
  CAST((admin_id // 36) * 10 - 80 AS DOUBLE) AS maxy
FROM g
""",
        # both dimensionalities under one row: the 'xy' leg reports
        # z_1e2 = 0 by convention; 'xyz' carries z = (doc*31+ent*17) %
        # 100000 untouched through the affine stage
        "affine_docs": _ENTS_CTE
        + """
SELECT doc_id, entity_idx, 'xy' AS kind,
  CAST(2 * lon_1e2 + 3 * lat_1e2 + 7 AS BIGINT) AS tx_1e2,
  CAST(-lat_1e2 + 11 AS BIGINT) AS ty_1e2,
  CAST(0 AS BIGINT) AS z_1e2
FROM e2
UNION ALL
SELECT doc_id, entity_idx, 'xyz',
  CAST(2 * lon_1e2 + 3 * lat_1e2 + 7 AS BIGINT),
  CAST(-lat_1e2 + 11 AS BIGINT),
  CAST((doc_id * 31 + entity_idx * 17) % 100000 AS BIGINT)
FROM e2
""",
        # the road-grid face inventory: every face the distributed
        # polygonize (tile walk + boundary stitch + hole assignment) must
        # produce, recomputed from the grid construction rules alone —
        # unit blocks 300x300, diagonal-split blocks (two triangles),
        # 2x2 superblocks (interior streets removed; area minus the
        # 100x100 island hole) and the island faces themselves
        "polygonize_grid": """
WITH d AS (SELECT greatest(8, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS nx FROM documents),
r AS (SELECT t.range AS v FROM range(0, 4096) t WHERE t.range < (SELECT nx - 1 FROM d)),
b AS (SELECT i1.v AS i, j1.v AS j, d.nx AS nx, d.nx AS ny
      FROM d, r i1, r j1),
c AS (SELECT i, j, nx, ny,
        (i % 6 IN (4, 5)) AND (j % 6 IN (4, 5))
        AND (CASE WHEN i % 6 = 4 THEN i + 1 <= nx - 2 ELSE TRUE END)
        AND (CASE WHEN j % 6 = 4 THEN j + 1 <= ny - 2 ELSE TRUE END) AS in_region
      FROM b)
SELECT i AS bx, j AS by, CAST(0 AS BIGINT) AS part, CAST(90000 AS BIGINT) AS area
FROM c WHERE NOT in_region AND (i * 31 + j * 17) % 5 != 0
UNION ALL
SELECT i, j, CAST(1 AS BIGINT), CAST(45000 AS BIGINT)
FROM c WHERE NOT in_region AND (i * 31 + j * 17) % 5 = 0
UNION ALL
SELECT i, j, CAST(2 AS BIGINT), CAST(45000 AS BIGINT)
FROM c WHERE NOT in_region AND (i * 31 + j * 17) % 5 = 0
UNION ALL
SELECT i, j, CAST(3 AS BIGINT), CAST(350000 AS BIGINT)
FROM c WHERE i % 6 = 4 AND j % 6 = 4 AND i + 1 <= nx - 2 AND j + 1 <= ny - 2
UNION ALL
SELECT i, j, CAST(4 AS BIGINT), CAST(10000 AS BIGINT)
FROM c WHERE i % 6 = 4 AND j % 6 = 4 AND i + 1 <= nx - 2 AND j + 1 <= ny - 2
""",
        # the merged-line inventory the distributed dissolve must produce:
        # per doc a horizontal chain x=a..b at y=2*doc_id+1 split at the
        # interior tick junctions (x % 7 == 0), plus the ticks themselves
        # (unit verticals); duplicated linework contributes nothing
        "dissolve_chains": """
WITH p AS (SELECT doc_id AS i, (doc_id*7) % 20 AS a,
                  (doc_id*7) % 20 + 15 + (doc_id % 5) AS b
           FROM documents),
t AS (SELECT p.i, r.range*7 AS x FROM p, range(0, 100) r
      WHERE r.range*7 > p.a AND r.range*7 < p.b),
cuts AS (SELECT i, a AS x FROM p
         UNION ALL SELECT i, b FROM p
         UNION ALL SELECT i, x FROM t),
seq AS (SELECT i, x, lead(x) OVER (PARTITION BY i ORDER BY x) AS nx FROM cuts)
SELECT CAST(x AS BIGINT) AS mx, CAST(2*i + 1 AS BIGINT) AS my,
       CAST(nx - x + 1 AS BIGINT) AS npts, CAST(nx - x AS BIGINT) AS len
FROM seq WHERE nx IS NOT NULL
UNION ALL
SELECT CAST(x AS BIGINT), CAST(2*i + 1 AS BIGINT),
       CAST(2 AS BIGINT), CAST(1 AS BIGINT)
FROM t
""",
        # the Z the elevation model must assign: surviving input corners
        # carry their own Z ((5,5) from b, (10,10) from a); the two new
        # corners fall in 3x3-model cells populated only by b's vertices
        "overlay_z_docs": """
SELECT doc_id, CAST(5 AS BIGINT) AS x, CAST(5 AS BIGINT) AS y,
       CAST(2*(doc_id % 5 + 10) AS BIGINT) AS z2 FROM documents
UNION ALL
SELECT doc_id, CAST(5 AS BIGINT), CAST(10 AS BIGINT),
       CAST(2*(doc_id % 5 + 10) AS BIGINT) FROM documents
UNION ALL
SELECT doc_id, CAST(10 AS BIGINT), CAST(5 AS BIGINT),
       CAST(2*(doc_id % 5 + 10) AS BIGINT) FROM documents
UNION ALL
SELECT doc_id, CAST(10 AS BIGINT), CAST(10 AS BIGINT),
       CAST(2*(doc_id % 7) AS BIGINT) FROM documents
""",
        # the noded sub-segment inventory: horizontals split at every
        # vertical x, verticals split at every horizontal row (endpoints
        # -1 and max_id+1 cap the vertical runs)
        "node_grid": """
WITH m AS (SELECT max(doc_id) AS mid FROM documents),
v AS (SELECT 3 + 7*(doc_id/50) AS x FROM documents
      WHERE doc_id % 50 = 0 AND doc_id < 500),
hcut AS (
  SELECT d.doc_id AS i, c.x
  FROM documents d,
       (SELECT 0 AS x UNION ALL SELECT 100 UNION ALL SELECT x FROM v) c),
hseq AS (SELECT i, x, lead(x) OVER (PARTITION BY i ORDER BY x) AS nx FROM hcut),
vcut AS (
  SELECT v.x AS x, c.y
  FROM v,
       (SELECT -1 AS y
        UNION ALL SELECT doc_id FROM documents
        UNION ALL SELECT mid + 1 FROM m) c),
vseq AS (SELECT x, y, lead(y) OVER (PARTITION BY x ORDER BY y) AS ny FROM vcut)
SELECT CAST(x AS BIGINT) AS x0, CAST(i AS BIGINT) AS y0,
       CAST(nx AS BIGINT) AS x1, CAST(i AS BIGINT) AS y1
FROM hseq WHERE nx IS NOT NULL
UNION ALL
SELECT CAST(x AS BIGINT), CAST(y AS BIGINT),
       CAST(x AS BIGINT), CAST(ny AS BIGINT)
FROM vseq WHERE ny IS NOT NULL
""",
        # replay of CGAlgorithms3D.DistancePointSegment: project the point
        # onto the segment, clamp to [0,1], euclidean distance in 3D
        "distance3d_docs": """
WITH g AS (
  SELECT doc_id,
         CAST(doc_id % 17 AS DOUBLE) AS px,
         CAST((doc_id*3) % 23 AS DOUBLE) AS py,
         CAST((doc_id*7) % 11 AS DOUBLE) AS pz,
         CAST(doc_id % 13 AS DOUBLE) AS ax
  FROM documents),
r AS (
  SELECT doc_id, px, py, pz, ax,
         ((px - ax)*10.0 + py*5.0 + pz*2.0) / 129.0 AS rr
  FROM g),
c AS (
  SELECT doc_id, px, py, pz,
         ax + greatest(0.0, least(1.0, rr))*10.0 AS qx,
         greatest(0.0, least(1.0, rr))*5.0 AS qy,
         greatest(0.0, least(1.0, rr))*2.0 AS qz
  FROM r)
SELECT doc_id,
       CAST(round(sqrt((px-qx)*(px-qx) + (py-qy)*(py-qy) + (pz-qz)*(pz-qz)) * 1000000) AS BIGINT) AS dist_1e6
FROM c
""",
        "fix_docs": """
WITH p AS (
  SELECT doc_id, doc_id % 3 AS kind, 100 + (doc_id % 7) * 20 AS s
  FROM documents
)
SELECT doc_id,
       CAST(kind AS BIGINT) AS kind,
       CAST(CASE WHEN kind = 2 THEN 1 ELSE 2 END AS BIGINT) AS n_parts,
       CAST(0 AS BIGINT) AS n_holes,
       CAST(CASE kind
            WHEN 0 THEN s*s // 2
            WHEN 1 THEN s*s + (s // 5) * (s // 5)
            ELSE s*s - (s // 4) * (s // 4) END AS BIGINT) AS area
FROM p
""",
        "within_distance_join": _ENTS_CTE
        + """
, ev AS (
  SELECT event_id,
         (event_id * 7919) % 36000 - 18000 AS lon_1e2,
         (event_id * 104729) % 18000 - 9000 AS lat_1e2
  FROM events
)
SELECT ev.event_id, e2.doc_id, e2.entity_idx,
       (ev.lon_1e2 - e2.lon_1e2) * (ev.lon_1e2 - e2.lon_1e2)
       + (ev.lat_1e2 - e2.lat_1e2) * (ev.lat_1e2 - e2.lat_1e2) AS dist2
FROM ev CROSS JOIN e2
WHERE (ev.lon_1e2 - e2.lon_1e2) * (ev.lon_1e2 - e2.lon_1e2)
      + (ev.lat_1e2 - e2.lat_1e2) * (ev.lat_1e2 - e2.lat_1e2) <= 90000
""",
        "geo_extract": _ENTS_CTE
        + """
SELECT doc_id, entity_idx, lon_1e2 / 100.0 AS lon, lat_1e2 / 100.0 AS lat,
       lon_1e2, lat_1e2
FROM e2
""",
        # 'assign': unique containing admin per entity (arithmetic cell);
        # 'inner': semi-join hits — boundary points legitimately match 2+
        "spatial_join_modes": _ENTS_CTE
        + """
, g AS (SELECT unnest(range(648)) AS admin_id)
SELECT doc_id, entity_idx,
       ((lat_1e2 + 9000) // 1000) * 36 + (lon_1e2 + 18000) // 1000 AS admin_id,
       'assign' AS mode
FROM e2
UNION ALL
SELECT e2.doc_id, e2.entity_idx, g.admin_id, 'inner'
FROM e2 CROSS JOIN g
WHERE e2.lon_1e2 >= (g.admin_id % 36)*1000 - 18000
  AND e2.lon_1e2 <= (g.admin_id % 36)*1000 - 17000
  AND e2.lat_1e2 >= (g.admin_id // 36)*1000 - 9000
  AND e2.lat_1e2 <= (g.admin_id // 36)*1000 - 8000
""",
        # mitre buffer of a w-square by d = exact (w+2d)-square with the
        # 12-vertex regression pin (3 per corner: two offset endpoints +
        # mitre apex); flat caps = exact rectangle, square caps extend d
        # beyond each end, single-sided covers only the signed side
        # (centroid y proves the side)
        "buffer_styles": """
WITH g AS (SELECT unnest(range(648)) AS admin_id),
p AS (
  SELECT admin_id,
         500 + (admin_id * 7) % 500 AS w,
         50 + (admin_id * 13) % 100 AS dm,
         200 + (admin_id * 7) % 300 AS L,
         10 + (admin_id * 13) % 40 AS dc
  FROM g
)
SELECT admin_id,
       CAST(2 * (w + 2 * dm) * (w + 2 * dm) AS BIGINT) AS mitre_area2,
       CAST(12 AS BIGINT) AS mitre_nverts,
       CAST(4 * L * dc AS BIGINT) AS flat2,
       CAST(4 * dc * (L + 2 * dc) AS BIGINT) AS square2,
       CAST(2 * L * dc AS BIGINT) AS ss2,
       CAST(dc AS BIGINT) AS ss_cy2,
       CAST(-dc AS BIGINT) AS ssr_cy2
FROM p
""",
        "multimodal_decode": """
WITH g AS (SELECT unnest(range(256)) AS doc_id),
p AS (
  SELECT doc_id,
         8 + doc_id % 16 AS width,
         8 + (doc_id // 3) % 12 AS height,
         (doc_id * 37) % 256 AS r,
         (doc_id * 59) % 256 AS g,
         (doc_id * 83) % 256 AS b
  FROM g
)
SELECT doc_id,
       CAST(width AS BIGINT) AS width,
       CAST(height AS BIGINT) AS height,
       CAST(round(1000000 * (0.299 * r + 0.587 * g + 0.114 * b)) AS BIGINT) AS lum_1e6,
       CAST((r + g + b) * width * height AS BIGINT) AS pix_sum
FROM p
""",
        # densify(<=70) then DP-simplify(1) restores the 4-corner rectangle
        "densify_simplify": """
WITH g AS (SELECT unnest(range(648)) AS admin_id),
p AS (
  SELECT admin_id,
         500 + (admin_id * 7) % 500 AS w,
         300 + (admin_id * 13) % 300 AS h
  FROM g
)
SELECT admin_id, CAST(2 * w * h AS BIGINT) AS area2,
       CAST(4 AS BIGINT) AS nverts
FROM p
""",
        "lang_pred": _sql_lang_pred(),
        # SimHash verbatim in SQL: md5 word-2-gram shingle hashes (first 8
        # digest bytes little-endian), per-bit majority, two's-complement
        # int64 (see functions/dedup.py SimHasher)
        "simhash": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM t),
sh AS (
  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok AS s
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
h AS (SELECT doc_id, md5(s) AS m FROM sh),
bytes AS (
  SELECT doc_id, j,
         (strpos('0123456789abcdef', substr(m, 2*j+1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(m, 2*j+2, 1)) - 1) AS bv
  FROM h, generate_series(0, 7) AS g(j)
),
bits AS (
  SELECT doc_id, j*8 + b AS k, ((bv >> b) & 1) AS bit
  FROM bytes, generate_series(0, 7) AS gb(b)
),
score AS (SELECT doc_id, k, 2*sum(bit) - count(*) AS sc FROM bits GROUP BY 1, 2),
val AS (
  SELECT doc_id,
         sum(CASE WHEN sc > 0 THEN CAST(1 AS HUGEINT) << k
                  ELSE CAST(0 AS HUGEINT) END) AS u
  FROM score GROUP BY 1
)
SELECT doc_id,
       CAST(CASE WHEN u >= CAST(9223372036854775808 AS HUGEINT)
                 THEN u - CAST(18446744073709551616 AS HUGEINT) ELSE u END
            AS BIGINT) AS simhash
FROM val
""",
        # curve bijectivity for BOTH encoders: the engine emits ix/iy
        # DECODED from each curve code, so encode∘decode must equal the
        # plain quantization the oracle computes (morton cell VALUES stay
        # directly checked via tile_stats_morton / tile_top_docs)
        "tile_curves": _ENTS_CTE
        + f"""
, c AS (SELECT unnest(['morton', 'hilbert']) AS curve)
SELECT doc_id, entity_idx, c.curve,
       CAST((lon_1e2 + 18000) * {1 << LEVEL} // 36000 AS BIGINT) AS ix,
       CAST((lat_1e2 + 9000) * {1 << LEVEL} // 18000 AS BIGINT) AS iy
FROM e2 CROSS JOIN c
""",
        "tile_top_docs": _ENTS_CTE
        + f"""
, cells AS (
  SELECT DISTINCT {morton} AS cell_id, doc_id FROM e2
), r AS (
  SELECT cell_id, doc_id,
         row_number() OVER (PARTITION BY cell_id ORDER BY doc_id) - 1 AS rank
  FROM cells
)
SELECT cell_id, rank, doc_id FROM r WHERE rank < 3
""",
        "tile_stats_morton": _ENTS_CTE
        + f"""
SELECT {morton} AS cell_id, CAST(COUNT(*) AS BIGINT) AS n FROM e2 GROUP BY 1
""",
        "knn_admin": _ENTS_CTE
        + f"""
, g AS (SELECT unnest(range(648)) AS admin_id),
d AS (
  SELECT e2.doc_id, e2.entity_idx, g.admin_id,
         (e2.lon_1e2 - ((g.admin_id % 36)*1000 - 17500)) AS dx,
         (e2.lat_1e2 - ((g.admin_id // 36)*1000 - 8500)) AS dy
  FROM e2 CROSS JOIN g
), r AS (
  SELECT doc_id, entity_idx, admin_id, dx*dx + dy*dy AS dist2,
         row_number() OVER (PARTITION BY doc_id, entity_idx
                            ORDER BY dx*dx + dy*dy, admin_id) - 1 AS rank
  FROM d
)
SELECT doc_id, entity_idx, rank, admin_id, dist2 FROM r WHERE rank < {KNN_K}
""",
        "q1_pricing": """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_1e2,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_1e2,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_1e4,
  CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "relational_rollups": """
SELECT 'top_order' AS tag, CAST(o_orderkey AS VARCHAR) AS "key",
       o_custkey AS v1, totalprice_1e2 AS v2
FROM (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_1e2
  FROM orders JOIN customer ON c_custkey = o_custkey
  WHERE c_mktsegment = 'BUILDING'
  ORDER BY totalprice_1e2 DESC, o_orderkey LIMIT 10
)
UNION ALL
SELECT 'region' AS tag, r_name AS "key",
       CAST(COUNT(*) AS BIGINT) AS v1, CAST(0 AS BIGINT) AS v2
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
        "cluster_dbscan": """
WITH RECURSIVE pts AS (
  SELECT event_id AS pt_id,
    CASE WHEN event_id % 10 < 5
      THEN ((event_id // 4) % 48) * 4409 % 30000 - 15000
           + CASE WHEN event_id % 10 = 4
                  THEN (event_id * 7919) % 281 - 140
                  ELSE (event_id * 7919) % 81 - 40 END
      ELSE (event_id * 7919) % 36000 - 18000 END AS x,
    CASE WHEN event_id % 10 < 5
      THEN ((event_id // 4) % 48) * 6829 % 15000 - 7500
           + CASE WHEN event_id % 10 = 4
                  THEN (event_id * 104729) % 281 - 140
                  ELSE (event_id * 104729) % 81 - 40 END
      ELSE (event_id * 104729) % 18000 - 9000 END AS y
  FROM events WHERE event_id % 4 = 0
),
nbr AS (
  SELECT a.pt_id AS ia, b.pt_id AS ib FROM pts a JOIN pts b
  ON a.pt_id <> b.pt_id
 AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 22500
),
deg AS (SELECT ia AS pt_id, COUNT(*) AS n FROM nbr GROUP BY ia),
cores AS (SELECT pt_id FROM deg WHERE n >= 3),
cedge AS (
  SELECT n.ia, n.ib FROM nbr n
  JOIN cores c1 ON n.ia = c1.pt_id
  JOIN cores c2 ON n.ib = c2.pt_id
),
reach(id, lbl) AS (
  SELECT pt_id, pt_id FROM cores
  UNION
  SELECT e.ib, r.lbl FROM reach r JOIN cedge e ON e.ia = r.id
),
clab AS (SELECT id AS pt_id, MIN(lbl) AS cluster FROM reach GROUP BY id),
blab AS (
  SELECT n.ia AS pt_id, MIN(c.cluster) AS cluster
  FROM nbr n JOIN clab c ON n.ib = c.pt_id
  WHERE n.ia NOT IN (SELECT pt_id FROM cores)
  GROUP BY n.ia
)
SELECT p.pt_id,
  CAST(COALESCE(c.cluster, b.cluster, -1) AS BIGINT) AS cluster,
  CASE WHEN c.pt_id IS NOT NULL THEN 'core'
       WHEN b.pt_id IS NOT NULL THEN 'border'
       ELSE 'noise' END AS role
FROM pts p
LEFT JOIN clab c ON p.pt_id = c.pt_id
LEFT JOIN blab b ON p.pt_id = b.pt_id
""",
        "events_stats": """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY event_type
""",
        "doc_token_stats": r"""
SELECT lang,
  CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS sum_tokens,
  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
  CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang
""",
        "dedup_exact": """
SELECT md5(text) AS text_key, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS dup_count
FROM documents GROUP BY md5(text)
""",
        # the forced-corner fixture makes the ratio=1 concave hull exactly
        # the 10000x10000 box (see _q_cluster_hulls)
        "cluster_hulls": """
SELECT doc_id % 5 AS cluster, CAST(count(*) AS BIGINT) AS n_points,
       CAST(4 AS BIGINT) AS hull_nverts,
       CAST(200000000 AS BIGINT) AS hull_area2
FROM documents GROUP BY 1
""",
        # L-shape (0,0)-(a,0)-(a,b)-(c,b)-(c,d)-(0,d): 6-vertex simple
        # polygon -> 4 triangles; doubled area = 2*(a*b + c*(d-b))
        # consolidated tri + voronoi under one tag column (see
        # _q_triangulate_voronoi); the per-leg invariants are unchanged
        # from the r4 rows
        "triangulate_voronoi": """
WITH e AS (
  SELECT event_id,
         1000 + (event_id * 7) % 500 AS aa,
         500 + (event_id * 11) % 300 AS bb,
         (1000 + (event_id * 7) % 500) // 2 AS cc,
         500 + (event_id * 11) % 300 + 200 + (event_id * 13) % 100 AS dd
  FROM events
)
SELECT 'tri' AS tag, event_id AS key, CAST(4 AS BIGINT) AS a,
       CAST(2 * (aa * bb + cc * (dd - bb)) AS BIGINT) AS b,
       CAST(0 AS BIGINT) AS c
FROM e
UNION ALL
SELECT 'voronoi' AS tag, tile AS key, n_sites AS a, n_sites AS b,
       CAST(1000000 AS BIGINT) AS c
FROM (
  SELECT event_id % 16 AS tile,
         CAST(COUNT(DISTINCT (event_id * 7919) % 10000 * 100000
                    + (event_id * 104729) % 10000) AS BIGINT) AS n_sites
  FROM events GROUP BY 1
)
""",
        # diamond/square closed forms in (u,v) = (x+y, x-y) space — see
        # _q_poly_join for the derivation; integer-exact
        "poly_join": """
WITH l AS (
  SELECT event_id AS l_id,
         (event_id * 7919) % 20000 - 10000 AS cx,
         (event_id * 104729) % 10000 - 5000 AS cy,
         50 + (event_id * 37) % 200 AS r_int,
         300 + (event_id * 37) % 200 AS r_cont,
         30 + (event_id * 29) % 100 AS h_dw
  FROM events WHERE event_id % 5 = 0
), r AS (
  SELECT doc_id AS r_id,
         (doc_id * 6151) % 20000 - 10000 AS cx,
         (doc_id * 911) % 10000 - 5000 AS cy,
         50 + (doc_id * 53) % 200 AS r_int,
         10 + (doc_id * 53) % 40 AS r_cont,
         30 + (doc_id * 41) % 100 AS h_dw
  FROM documents
)
SELECT 'intersects' AS tag, l.l_id, r.r_id
FROM l, r
WHERE abs((l.cx + l.cy) - (r.cx + r.cy)) <= l.r_int + r.r_int
  AND abs((l.cx - l.cy) - (r.cx - r.cy)) <= l.r_int + r.r_int
UNION ALL
SELECT 'contains' AS tag, l.l_id, r.r_id
FROM l, r
WHERE l.r_cont >= r.r_cont
  AND abs((l.cx + l.cy) - (r.cx + r.cy)) <= l.r_cont - r.r_cont
  AND abs((l.cx - l.cy) - (r.cx - r.cy)) <= l.r_cont - r.r_cont
UNION ALL
SELECT 'dwithin' AS tag, l.l_id, r.r_id
FROM l, r
WHERE power(greatest(0, abs(l.cx - r.cx) - (l.h_dw + r.h_dw)), 2)
    + power(greatest(0, abs(l.cy - r.cy) - (l.h_dw + r.h_dw)), 2)
    <= 200 * 200
UNION ALL
SELECT 'bcast_intersects' AS tag, l.l_id, r.r_id
FROM (
  SELECT event_id AS l_id,
         (event_id * 7919) % 20000 - 10000 AS cx,
         (event_id * 104729) % 10000 - 5000 AS cy,
         40 + (event_id * 41) % 150 AS rr
  FROM events WHERE event_id % 5 = 0
) l, (
  SELECT doc_id AS r_id,
         (doc_id * 6151) % 20000 - 10000 AS cx,
         (doc_id * 911) % 10000 - 5000 AS cy,
         40 + (doc_id * 59) % 150 AS rr
  FROM documents
) r
WHERE abs((l.cx + l.cy) - (r.cx + r.cy)) <= l.rr + r.rr
  AND abs((l.cx - l.cy) - (r.cx - r.cy)) <= l.rr + r.rr
""",
        # connected components over the exact-Jaccard edge set: recursive
        # transitive closure, min label per node (see _q_near_dup_groups)
        "near_dup_groups": """
WITH RECURSIVE
t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM t),
sh AS (
  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS s3
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
ix AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
  FROM sh x JOIN sh y ON y.s3 = x.s3 AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT id_a AS a, id_b AS b
  FROM ix
  JOIN sizes na ON na.doc_id = id_a
  JOIN sizes nb ON nb.doc_id = id_b
  WHERE 2 * i >= (na.n + nb.n - i)
),
edges2 AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
nodes AS (SELECT DISTINCT a AS id FROM edges2),
reach(id, lab) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.b, r.lab FROM reach r JOIN edges2 e ON e.a = r.id
)
SELECT id AS doc_id, CAST(min(lab) AS BIGINT) AS rep_id
FROM reach GROUP BY id
""",
        # exact all-pairs word-3-gram Jaccard >= 1/2; equals the Ray
        # LSH-candidates + exact-verify result (see _q_minhash_lsh_pairs)
        "minhash_lsh_pairs": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM t),
sh AS (
  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS s3
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
ix AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
  FROM sh x JOIN sh y ON y.s3 = x.s3 AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(i AS BIGINT) AS inter,
       CAST(na.n + nb.n - i AS BIGINT) AS uni
FROM ix
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE 2 * i >= (na.n + nb.n - i)
""",
        # integer-exact: epoch microseconds // width, money as
        # round-half-away cents (floor(|v|*100+0.5)*sign == DuckDB round).
        # 'tumble' = 6h fixed windows; 'hop' = 1h window / 15min slide —
        # every event joins the 4 slide offsets that cover it
        # (epoch-aligned, so no range filter is needed)
        "windows_rollup": """
SELECT epoch_us(ts) // 21600000000 * 21600 AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(abs(value) * 100 + 0.5) AS BIGINT)
           * CASE WHEN value < 0 THEN -1 ELSE 1 END) AS BIGINT) AS value_cents,
       'tumble' AS kind
FROM events
GROUP BY 1, 2
UNION ALL
SELECT (epoch_us(ts) // 900000000 - off) * 900 AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(abs(value) * 100 + 0.5) AS BIGINT)
           * CASE WHEN value < 0 THEN -1 ELSE 1 END) AS BIGINT) AS value_cents,
       'hop' AS kind
FROM events, (SELECT unnest(range(0, 4)) AS off) o
GROUP BY 1, 2
""",
        # sessionization reproduced verbatim: per-user lag gap breaks,
        # running sum -> sess_idx, integer-cent value sums
        "session_stats": """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus,
         CAST(floor(abs(value) * 100 + 0.5) AS BIGINT)
           * CASE WHEN value < 0 THEN -1 ELSE 1 END AS vc,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
                           ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS sess_idx
  FROM e
)
SELECT user_id, sess_idx, count(*) AS n_events,
       min(tus) AS ts_start_us, max(tus) AS ts_end_us,
       CAST(sum(vc) AS BIGINT) AS value_cents
FROM s
GROUP BY 1, 2
""",
        # split thresholds are floor(cumfrac * 2^32): 0.90 -> 3865470566,
        # 0.95 -> 4080218931 (same Knuth hash as the sketches)
        "split_assign": """
SELECT doc_id,
       CASE WHEN hv < 3865470566 THEN 'train'
            WHEN hv < 4080218931 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS hv FROM documents)
""",
        # same RE2-safe patterns, same order (emails first, then IPv4),
        # md5 of the redacted text compared directly
        "pii_redact": r"""
WITH p AS (
  SELECT doc_id,
         text || ' contact doc' || doc_id || '@example.com from 10.0.'
              || (doc_id // 256) % 256 || '.' || doc_id % 256 AS t
  FROM documents
),
r AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM p
)
SELECT doc_id, n_emails,
       len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
       md5(regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS red_md5
FROM r
""",
        # merged term stats (vocabulary head + per-doc tf-idf ranks) in
        # one long schema; same tokenizer both legs: lowercase,
        # whitespace runs, empties dropped; ties token-ascending; score
        # tf*1e6 // (df+1)
        "term_stats": """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[\\t\\n\\f\\r \\x0b]+')) AS token
  FROM documents
),
c AS (SELECT token, count(*) AS n FROM toks WHERE token <> '' GROUP BY 1),
r AS (SELECT token, n, row_number() OVER (ORDER BY n DESC, token) - 1 AS rank FROM c),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks WHERE token <> '' GROUP BY 1, 2
),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         tf.tf * 1000000 // (df.df + 1) AS score_1e6,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * 1000000 // (df.df + 1) DESC, tf.token
         ) - 1 AS rank
  FROM tf JOIN df USING (token)
)
SELECT 'top' AS tag, CAST(-1 AS BIGINT) AS doc_id, token,
       CAST(n AS BIGINT) AS v1, CAST(rank AS BIGINT) AS v2,
       CAST(0 AS BIGINT) AS v3, CAST(0 AS BIGINT) AS v4
FROM r WHERE rank < 50
UNION ALL
SELECT 'tfidf' AS tag, doc_id, token,
       CAST(tf AS BIGINT) AS v1, CAST(df AS BIGINT) AS v2,
       CAST(score_1e6 AS BIGINT) AS v3, CAST(rank AS BIGINT) AS v4
FROM scored WHERE rank < 5
""",
        # full Lloyd replay: quantize half-away at 1e6, seed from the 8
        # lowest vec_ids, 3 integer-exact iterations, ties to lower cid
        "kmeans_embed": _kmeans_oracle_sql(),
        # discrete lower quantile at 1-based rank ceil(q*n/100), replayed
        # with a cumulative-sum window over per-value counts
        "raster_roundtrip": """
WITH p AS (
  SELECT doc_id, doc_id % 3 AS kind, 6 + (doc_id % 5) * 2 AS s,
         (doc_id % 64) * 32 AS x0, (doc_id // 64) * 32 AS y0
  FROM documents
)
SELECT doc_id AS value,
       CAST(kind AS BIGINT) AS kind,
       CAST(CASE WHEN kind = 1 THEN 1 ELSE 0 END AS BIGINT) AS n_holes,
       CAST(CASE kind WHEN 0 THEN s*s
                      WHEN 1 THEN s*s - (s-4)*(s-4)
                      ELSE s*(s-1) // 2 END AS BIGINT) AS area,
       CAST(x0 AS BIGINT) AS minx,
       CAST(y0 AS BIGINT) AS miny,
       CAST(x0 + CASE WHEN kind = 2 THEN s - 1 ELSE s END AS BIGINT) AS maxx,
       CAST(y0 + CASE WHEN kind = 2 THEN s - 1 ELSE s END AS BIGINT) AS maxy
FROM p
""",
        "event_sketch_stats": """
WITH c AS (
  SELECT event_type,
         CAST(floor(abs(value) * 100 + 0.5) AS BIGINT)
           * CASE WHEN value < 0 THEN -1 ELSE 1 END AS vc,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, vc,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY vc
                        ROWS UNBOUNDED PRECEDING) AS cumn,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM c
),
qs AS (SELECT unnest([50, 90, 99]) AS q_pct),
-- KMV replayed verbatim: same Knuth 32-bit hash, same bottom-k, same
-- integer estimator ((k-1)*2^32 // kth) — exact under k distinct
h AS (
  SELECT DISTINCT event_type, (user_id * 2654435761) % 4294967296 AS hv
  FROM events
),
ranked AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
),
stats AS (
  SELECT event_type,
         count(*) FILTER (WHERE rn <= 64) AS n_hashes,
         max(CASE WHEN rn = 64 THEN hv END) AS kth0
  FROM ranked GROUP BY 1
)
SELECT event_type, 'p' || CAST(q_pct AS VARCHAR) AS stat,
       CAST(quantile_cents AS BIGINT) AS value
FROM (
  SELECT cum.event_type, qs.q_pct, min(cum.vc) AS quantile_cents
  FROM cum JOIN qs ON cum.cumn >= (qs.q_pct * cum.n + 99) // 100
  GROUP BY 1, 2
)
UNION ALL
SELECT event_type, 'kmv_est',
       CAST(CASE WHEN n_hashes < 64 THEN n_hashes
                 ELSE (63 * 4294967296) // kth0 END AS BIGINT)
FROM stats
UNION ALL
SELECT event_type, 'kmv_fill', CAST(n_hashes AS BIGINT) FROM stats
UNION ALL
SELECT event_type, 'kmv_kth', CAST(COALESCE(kth0, 0) AS BIGINT) FROM stats
""",
        # hash-order sampling replayed with a window rank over the same
        # Knuth hash; doc_id tie-break mirrors the engine's sort
        "sample_per_lang": """
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
         ) AS rn
  FROM documents
)
SELECT doc_id, lang, rn - 1 AS sample_rank FROM ranked WHERE rn <= 20
""",
        # DuckDB's native ASOF JOIN is the oracle; the right side is
        # pre-deduped to one row per (user, tus) keeping max id — the same
        # deterministic tie-break the engine applies
        "asof_join": """
WITH l AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus
  FROM events WHERE event_type = 'click'
),
r0 AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus
  FROM events WHERE event_type = 'view'
),
r AS (SELECT user_id, tus, max(event_id) AS event_id FROM r0 GROUP BY 1, 2)
SELECT l.event_id AS id_l, l.user_id AS user_id, l.tus AS tus_l,
       r.event_id AS id_r, r.tus AS tus_r, l.tus - r.tus AS lag_us
FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.tus >= r.tus
""",
        # winnowing reproduced verbatim: k-gram polynomial hash as an
        # explicit 8-term BIGINT sum (131^7*255*8 < 2^63, no overflow
        # before % 2^32), window min via an inequality join, rightmost
        # tie-break via max(p) per window, DISTINCT selected positions
        "winnow_fingerprint": f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= {WINNOW_K + WINNOW_W - 1}
),
grams AS (
  -- Horner's rule with mod 2^32 after every step: intermediates stay
  -- under (2^32-1)*131 + 0x10FFFF < 2^40, so ANY Unicode code point is
  -- safe (a flat sum-of-powers overflows BIGINT for code points >= ~14k)
  SELECT doc_id, p,
    ((((((((((((((ascii(substr(text, p + 1, 1))::BIGINT
      * 131 + ascii(substr(text, p + 2, 1))) % 4294967296)
      * 131 + ascii(substr(text, p + 3, 1))) % 4294967296)
      * 131 + ascii(substr(text, p + 4, 1))) % 4294967296)
      * 131 + ascii(substr(text, p + 5, 1))) % 4294967296)
      * 131 + ascii(substr(text, p + 6, 1))) % 4294967296)
      * 131 + ascii(substr(text, p + 7, 1))) % 4294967296)
      * 131 + ascii(substr(text, p + 8, 1))) % 4294967296) AS gram_hash
  FROM (SELECT doc_id, text, unnest(range(0, length(text) - {WINNOW_K} + 1)) AS p FROM docs)
),
wins AS (
  SELECT doc_id, unnest(range(0, length(text) - {WINNOW_K} - {WINNOW_W} + 2)) AS i FROM docs
),
wj AS (
  SELECT g.doc_id, w.i, g.p, g.gram_hash
  FROM wins w JOIN grams g
    ON g.doc_id = w.doc_id AND g.p >= w.i AND g.p < w.i + {WINNOW_W}
),
wm AS (SELECT doc_id, i, min(gram_hash) AS mh FROM wj GROUP BY doc_id, i),
sel AS (
  SELECT j.doc_id, max(j.p) AS pos
  FROM wj j JOIN wm m ON j.doc_id = m.doc_id AND j.i = m.i AND j.gram_hash = m.mh
  GROUP BY j.doc_id, j.i
)
SELECT DISTINCT s.doc_id, s.pos, g.gram_hash
FROM sel s JOIN grams g ON g.doc_id = s.doc_id AND g.p = s.pos
""",
        # 'ivf': bucketing replayed exactly — nearest data-seeded centroid
        # by cosine (ties to lower cid; the engine asserts a >1e-12 margin
        # so the tie-break can never actually fire), then all pairs WITHIN
        # a bucket.  'exact': plain all-pairs.  sim via double-precision
        # dot/(|a||b|) exactly as the engine computes it; ROUND is
        # half-away-from-zero, mirrored by the engine's floor(x+0.5)
        "embed_near_dup": f"""
WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < {IVF_NC}),
e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
eb AS (
  SELECT vec_id, cid AS bucket FROM (
    SELECT x.vec_id, c.cid,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY list_cosine_similarity(x.embedding, c.ce) DESC, c.cid) AS rn
    FROM embeddings x CROSS JOIN c) WHERE rn = 1
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) * 10000) AS BIGINT) AS sim_1e4,
       'ivf' AS method
FROM e a JOIN e b ON a.vec_id < b.vec_id
JOIN eb ba ON ba.vec_id = a.vec_id
JOIN eb bb ON bb.vec_id = b.vec_id AND bb.bucket = ba.bucket
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {EMBED_DUP_TAU}
UNION ALL
SELECT a.vec_id, b.vec_id,
       CAST(ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) * 10000) AS BIGINT),
       'exact'
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {EMBED_DUP_TAU}
""",
        # 'brute': exact cosine top-k over the full corpus.  'ivf': probe
        # pipeline reproduced exactly — centroids = first IVF_NC corpus
        # vectors; corpus bucket = nearest centroid (tie -> lowest cid,
        # same as numpy argmax); each query probes its IVF_NPROBE nearest
        # buckets; exact cosine rank within the probed set.
        "ann_topk": f"""
WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < {IVF_NC}),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {ANN_NQ}),
s AS (
  SELECT q.query_id, e.vec_id, list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
), r AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) - 1 AS rank
  FROM s
),
qp AS (
  SELECT query_id, cid FROM (
    SELECT q.query_id, c.cid,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_cosine_similarity(q.qe, c.ce) DESC, c.cid) AS rn
    FROM q CROSS JOIN c) WHERE rn <= {IVF_NPROBE}
),
eb AS (
  SELECT vec_id, cid AS bucket FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid) AS rn
    FROM embeddings e CROSS JOIN c) WHERE rn = 1
),
s2 AS (
  SELECT q.query_id, e.vec_id, list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
  JOIN eb ON eb.vec_id = e.vec_id
  JOIN qp ON qp.query_id = q.query_id AND qp.cid = eb.bucket
), r2 AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) - 1 AS rank
  FROM s2
)
SELECT query_id, rank, vec_id, 'brute' AS method FROM r WHERE rank < {ANN_K}
UNION ALL
SELECT query_id, rank, vec_id, 'ivf' FROM r2 WHERE rank < {ANN_K}
""",
        # EnvelopeUnion AggregateFn + GeometryCombiner map_groups must both
        # equal the arithmetic per-band min/max extent (+ count)
        "extent_agg": _ENTS_CTE
        + """
, s AS (
  SELECT doc_id % 8 AS band, CAST(count(*) AS BIGINT) AS n_geoms,
         CAST(min(lon_1e2) AS BIGINT) AS minx, CAST(min(lat_1e2) AS BIGINT) AS miny,
         CAST(max(lon_1e2) AS BIGINT) AS maxx, CAST(max(lat_1e2) AS BIGINT) AS maxy
  FROM e2 GROUP BY 1
)
SELECT band, src, n_geoms, minx, miny, maxx, maxy
FROM s CROSS JOIN (SELECT unnest(['agg', 'combine']) AS src) t
""",
        # M-ordinate linear referencing replayed arithmetically: the route
        # line is (0,0)-(L1,0)-(L1,L2) with measures m0, m0+dm1,
        # m0+dm1+dm2 (all divisible by 4, so every query lands on an exact
        # rational); extract_point at m0+dm1/2 and m1+dm2/4, project of
        # (L1/4, 7), measure at length L1+L2/2, and the locate-between
        # sub-line's vertex count + measure sum
        "linearref_m": """
WITH p AS (
  SELECT doc_id,
         4 * (10 + doc_id % 50) AS L1,
         4 * (5 + doc_id % 30) AS L2,
         doc_id AS m0,
         4 * (1 + doc_id % 20) AS dm1,
         4 * (2 + doc_id % 10) AS dm2
  FROM documents
)
SELECT doc_id,
       CAST(L1 // 2 AS BIGINT) AS pax, CAST(0 AS BIGINT) AS pay,
       CAST(L1 AS BIGINT) AS pbx, CAST(L2 // 4 AS BIGINT) AS pby,
       CAST(m0 + dm1 // 4 AS BIGINT) AS proj_m,
       CAST(m0 + dm1 + dm2 // 2 AS BIGINT) AS m_half,
       CAST(3 AS BIGINT) AS sub_npts,
       CAST((m0 + dm1 // 2) + (m0 + dm1) + (m0 + dm1 + dm2 // 4) AS BIGINT) AS sub_msum
FROM p
""",
    }
