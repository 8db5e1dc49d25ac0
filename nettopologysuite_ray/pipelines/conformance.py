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
    import numpy as np
    import ray.data as rd

    table = load_cases(dirs=dirs, files=files)
    # deterministic driver-side shuffle (table is a few MB): heavy cases
    # cluster by file, and a straggler batch of them serializes the run
    perm = np.random.default_rng(0xC0FFEE).permutation(len(table))
    # one Arrow table = ONE Dataset block = one map task; repartition
    # splits it so the map stage actually fans out across the cluster
    n_blocks = max(len(table) // 32, 1)
    return rd.from_arrow(table.take(perm)).repartition(n_blocks)


def run_conformance(dirs=("general", "validate"), files=None, concurrency=None):
    """Evaluate every corpus case.  The runner is stateless, so this is a
    task pool (instant fan-out) rather than an actor pool — an
    autoscaling actor pool adds ~1 actor every few seconds and serializes
    the first half of the run."""
    ds = conformance_dataset(dirs=dirs, files=files)
    return ds.map_batches(
        lambda batch: ConformanceRunner()(batch),
        batch_format="pyarrow",
        batch_size=32,
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
