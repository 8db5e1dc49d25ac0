"""Distributed conformance pipeline: the reference's XML corpus streamed
through the engine as Dataset rows (SURVEY.md §5 test plan).

2,200+ cases / 7,700+ tests from /root/reference/data/... are loaded into
an Arrow table, sharded across the cluster, and each test evaluated by
the ConformanceRunner actor stage; the summary is a per-op pass table.
"""

from __future__ import annotations

import pyarrow as pa

from ..sources.conformance import load_cases
from ..stages.geometry import ConformanceRunner


def conformance_dataset(dirs=("general", "validate"), files=None):
    import ray.data as rd

    table = load_cases(dirs=dirs, files=files)
    return rd.from_arrow(table)


def run_conformance(dirs=("general", "validate"), files=None, concurrency=(1, 16)):
    ds = conformance_dataset(dirs=dirs, files=files)
    return ds.map_batches(
        ConformanceRunner,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=concurrency,
        num_cpus=1,
    )


def conformance_summary(dirs=("general", "validate"), files=None):
    """op → (n_tests, n_supported, n_passed) summary table."""
    res = run_conformance(dirs=dirs, files=files)

    def summarize(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        g = df.groupby("op", as_index=False).agg(
            n=("op", "size"),
            n_supported=("supported", "sum"),
            n_passed=("passed", lambda s: int(s.fillna(False).sum())),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = res.map_batches(summarize, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        g = df.groupby("op", as_index=False)[["n", "n_supported", "n_passed"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return partials.repartition(1).map_batches(merge, batch_format="pyarrow")
