"""Driver-style correctness check: run every queries() entry at a given sf
and compare against oracle_sql() via DuckDB (row count + schema-sorted,
order-insensitive value comparison).  Usage:

    python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    try:
        from ray.data import Dataset
    except ImportError:
        Dataset = ()
    if isinstance(res, Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False)
    )
    return rows


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events"
              " documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok    {name}: rows={len(got)} (rows-only) [{dt:.1f}s]")
            continue
        want = con.sql(sqls[name]).df()
        if sorted(got.columns) != sorted(want.columns):
            failures.append(name)
            print(
                f"FAIL  {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}"
            )
            continue
        if len(got) != len(want):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(got)} vs {len(want)}")
            continue
        cg, cw = canon(got), canon(want)
        if cg != cw:
            failures.append(name)
            bad = [i for i, (a, b) in enumerate(zip(cg, cw)) if a != b][:3]
            print(f"FAIL  {name}: values differ, first rows {bad}")
            for i in bad:
                print("   ray:", cg[i])
                print("   sql:", cw[i])
        else:
            print(f"ok    {name}: rows={len(got)} MATCH [{dt:.1f}s]")

    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()
