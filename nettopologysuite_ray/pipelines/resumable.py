"""Resumable partitioned runs: north_rule's checkpoint/lineage requirement.

``run_partitioned`` executes a Dataset-producing pipeline per partition,
writing each partition to its own parquet directory with an atomic
done-marker (state/lineage.py).  A re-run with the same parameters skips
completed partitions — resume-by-skipping (SURVEY.md §4.2).
"""

from __future__ import annotations

import os

from ..state.lineage import LineageLog


def run_partitioned(
    out_dir: str,
    partition_ids,
    make_dataset,
    params: dict,
    inputs_of=None,
):
    """For each pid in partition_ids not yet done, run
    make_dataset(pid) -> ray.data.Dataset, write to {out_dir}/part={pid}/,
    and mark done with row counts.  Returns (ran, skipped) lists."""
    log = LineageLog(out_dir, params)
    ran = []
    skipped = []
    for pid in partition_ids:
        if log.is_done(str(pid)):
            skipped.append(pid)
            continue
        ds = make_dataset(pid)
        part_dir = os.path.join(out_dir, f"part={pid}")
        ds.write_parquet(part_dir)
        rows = ds.count()
        log.mark_done(str(pid), inputs=(inputs_of(pid) if inputs_of else []), rows=rows)
        ran.append(pid)
    log.write_run_manifest({"partitions": [str(p) for p in partition_ids]})
    return ran, skipped
