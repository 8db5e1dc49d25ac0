"""Shard-mapped parquet source: apply a batch transform INSIDE the read.

Ray Data's ReadParquet operator ships its raw output blocks through the
object store before any downstream map sees them.  For wide-payload
tables (pages.html is ~95% of the bytes) whose first transform DROPS the
payload (extract text → entities), that round-trip is the pipeline's
dominant cost: on this host the object store's fresh pages fault at
~0.4 GB/s aggregate, so 20 GB of html through plasma costs ~50 s of wall
no matter how many CPUs work.  `shard_map_parquet` instead builds a tiny
Dataset of (file, row-group range) descriptors and runs read+transform in
ONE task per shard — the wide column lives only in the reader's heap, and
only the transform's (narrow) output enters the object store.

This is also the honest 100-TB design: at scale you never want an
all-bytes hop between storage and the first projection; "prune at the
read" includes pruning by TRANSFORM, not just by column list.

Row-group ranges (not whole files) keep per-task memory bounded and give
the scheduler enough shards to balance (a 100-TB table is millions of
row groups); enumeration reads only file footers, parallelized over
files with Ray tasks.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

import ray


def enumerate_shards(path_or_files, target_rows: int = 8192) -> list[dict]:
    """(file, rg_a, rg_b) descriptors covering every row group once, each
    shard holding ~target_rows rows.  Footer reads run as Ray tasks (one
    per file) — 100k-file tables enumerate in parallel, and the driver
    only ever holds the descriptor list."""
    import glob as _glob

    if isinstance(path_or_files, str):
        files = sorted(_glob.glob(f"{path_or_files}/*.parquet")) or [path_or_files]
    else:
        files = list(path_or_files)

    @ray.remote(num_cpus=0.25)
    def footer(f: str) -> list[dict]:
        md = pq.ParquetFile(f).metadata
        out = []
        a = 0
        acc = 0
        for i in range(md.num_row_groups):
            acc += md.row_group(i).num_rows
            if acc >= target_rows or i == md.num_row_groups - 1:
                out.append({"file": f, "rg_a": a, "rg_b": i + 1})
                a = i + 1
                acc = 0
        return out

    shard_lists = ray.get([footer.remote(f) for f in files])
    return [s for lst in shard_lists for s in lst]


def shard_map_parquet(
    path_or_files,
    fn,
    columns: list[str] | None = None,
    target_rows: int = 8192,
    read_batch_rows: int = 2048,
    num_cpus: float = 0.25,
):
    """Dataset of fn(batch) outputs over all row groups of a parquet dir.

    ``fn`` runs on pyarrow Tables of ≤ read_batch_rows rows streamed
    straight off the parquet reader — its input NEVER enters the object
    store; only its output does.  Use when the first transform shrinks the
    data (extract/project/filter); use plain read_parquet when downstream
    needs the raw table.
    """
    import ray.data as rd

    shards = enumerate_shards(path_or_files, target_rows=target_rows)

    def run_shard(batch: pa.Table) -> pa.Table:
        outs = []
        first_pf = None
        for f, a, b in zip(
            batch["file"].to_pylist(),
            batch["rg_a"].to_pylist(),
            batch["rg_b"].to_pylist(),
        ):
            pf = pq.ParquetFile(f)
            first_pf = first_pf or pf
            for rb in pf.iter_batches(
                batch_size=read_batch_rows, row_groups=list(range(a, b)), columns=columns
            ):
                outs.append(fn(pa.Table.from_batches([rb])))
        if not outs:
            # zero-row shard (e.g. an empty parquet file): derive the
            # output schema by running fn on an empty input table
            empty = first_pf.schema_arrow.empty_table()
            if columns:
                empty = empty.select(columns)
            outs.append(fn(empty))
        return pa.concat_tables(outs)

    return rd.from_items(shards).map_batches(
        run_shard, batch_format="pyarrow", batch_size=1, num_cpus=num_cpus
    )
