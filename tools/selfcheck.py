"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf and compare to oracle_sql() via DuckDB
(row count + column names + order-insensitive values).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"columns: engine={sorted(got.columns)} oracle={sorted(exp.columns)}")
        return problems
    if len(got) != len(exp):
        problems.append(f"rows: engine={len(got)} oracle={len(exp)}")
    g = canon(got)
    e = canon(exp)
    if len(g) == len(e):
        for c in g.columns:
            gv = g[c].to_numpy()
            ev = e[c].to_numpy()
            if gv.dtype.kind == "f" or ev.dtype.kind == "f":
                bad = ~(np.isclose(gv.astype(float), ev.astype(float), rtol=0, atol=0) | (pd.isna(gv) & pd.isna(ev)))
            else:
                bad = gv != ev
            nbad = int(np.asarray(bad).sum())
            if nbad:
                i = int(np.nonzero(np.asarray(bad))[0][0])
                problems.append(f"col {c}: {nbad} mismatches, first at row {i}: engine={gv[i]!r} oracle={ev[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    import os

    if not ray.is_initialized():
        # SELFCHECK_CPUS=32 replicates the driver's parallelism level —
        # parallelism-dependent bugs (e.g. hash-shuffle joins) hide at 8
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("SELFCHECK_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: engine raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} ({dt:.1f}s) [rows-only, no oracle]")
            n_pass += 1
            continue
        exp = con.execute(oracles[name]).df()
        problems = compare(name, got, exp)
        if problems:
            print(f"FAIL {name}: ({dt:.1f}s)")
            for p in problems:
                print(f"     {p}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(got)} ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
