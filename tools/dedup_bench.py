"""Near-dup dedup stress benchmark: 500k docs with 100-member boilerplate
clusters (every base doc replicated 100x with a mutated lead token).

This fixture makes ALL-PAIRS candidate emission quadratic (~25M pairs) —
the point is that `lsh_dedup` (linear star edges + min-label propagation)
still labels every document.  Usage:

    python tools/dedup_bench.py [--docs N]

Prints one JSON line with wall times and throughput.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage(n_docs: int, path: str) -> int:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    con = duckdb.connect()
    t = con.execute(
        "select doc_id, text from '/root/testdata/sf0.1/documents.parquet'"
    ).arrow()
    ids = t["doc_id"].to_numpy()
    texts = t["text"].to_pylist()
    base = len(texts)
    rep = max(n_docs // base, 1)
    out_ids, out_texts = [], []
    for r in range(rep):
        off = r * base
        for i in range(base):
            tx = texts[i]
            sp = tx.find(" ")
            out_texts.append(f"r{r}" + tx[sp:])
            out_ids.append(off + int(ids[i]))
    tbl = pa.table(
        {"doc_id": pa.array(out_ids, type=pa.int64()), "text": pa.array(out_texts)}
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path, row_group_size=20000)
    return len(tbl)


def main() -> None:
    n_docs = 500_000
    if "--docs" in sys.argv:
        n_docs = int(sys.argv[sys.argv.index("--docs") + 1])
    path = "/tmp/dedup_stage/documents.parquet"
    n = stage(n_docs, path)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import nettopologysuite_ray

    ray.cloudpickle.register_pickle_by_value(nettopologysuite_ray)
    import ray.data as rd

    from nettopologysuite_ray.functions.dedup import MinHasher, lsh_dedup

    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    t0 = time.time()
    sigs = ds.map_batches(
        MinHasher,
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=(1, 24),
        num_cpus=1,
    ).materialize()
    t_minhash = time.time() - t0
    t1 = time.time()
    labels = lsh_dedup(sigs, shuffle_partitions=24, rounds=2)
    labeled = labels.count()
    t_dedup = time.time() - t1
    total = time.time() - t0
    reps = labels.to_pandas()["rep_id"].nunique()
    print(
        json.dumps(
            {
                "metric": "lsh_dedup docs/sec (100-member boilerplate clusters)",
                "docs": n,
                "labeled": labeled,
                "clusters": int(reps),
                "sec_minhash": round(t_minhash, 1),
                "sec_dedup": round(t_dedup, 1),
                "sec_total": round(total, 1),
                "docs_per_sec": round(n / total, 1),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
