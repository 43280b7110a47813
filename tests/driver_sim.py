"""Standalone driver simulation: run every queries() entry at a given sf
and compare against oracle_sql() via DuckDB exactly like the driver
(row count + schema + order-insensitive value comparison, columns
sorted by name).  Usage: python tests/driver_sim.py [sf_dir]."""

import sys

import numpy as np
import pandas as pd


def to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(name, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"columns: {sorted(got.columns)} vs {sorted(exp.columns)}"]
    if len(got) != len(exp):
        problems.append(f"rows: {len(got)} vs {len(exp)}")
        return problems
    g, e = canon(got), canon(exp)
    for c in g.columns:
        gc, ec = g[c], e[c]
        if gc.dtype != ec.dtype:
            problems.append(f"dtype[{c}]: {gc.dtype} vs {ec.dtype}")
        try:
            if gc.dtype.kind == "f":
                ok = np.allclose(gc.fillna(-1e300), ec.fillna(-1e300), rtol=0, atol=0)
            else:
                ok = gc.equals(ec)
        except Exception as ex:
            ok = False
            problems.append(f"cmp error[{c}]: {ex}")
        if not ok:
            bad = (gc != ec) & ~(gc.isna() & ec.isna())
            problems.append(
                f"values[{c}]: {int(bad.sum())} diffs, e.g. {gc[bad].head(2).tolist()} vs {ec[bad].head(2).tolist()}"
            )
    return problems


def main(sf_dir, only=None):
    import duckdb

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    import time

    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s, rows-only)")
            continue
        exp = con.sql(oracles[name]).df()
        problems = compare(name, got, exp)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(got)} rows ({dt:.1f}s)")
    print("FAILURES:", failures)
    return failures


if __name__ == "__main__":
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    rc = main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01", only)
    ray.shutdown()
    sys.exit(1 if rc else 0)
