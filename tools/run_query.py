"""Run any queries() operator from the CLI and print or persist its result.

    python tools/run_query.py <name> [--sf-dir DIR] [--out PATH]
                              [--num-cpus N] [--list]

Without --out, prints the result (head) as a table.  With --out, writes
partitioned parquet via the streaming sink when the result is a Dataset
(resumable layout: one file per block), or a single parquet file for small
driver-side frames.  This is the "switch one pipeline over" entry point for
users of the reference CLI.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?", help="queries() entry to run")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, help="parquet output path")
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--list", action="store_true", help="list query names")
    ap.add_argument(
        "--stats", action="store_true",
        help="print ray.data per-stage execution stats after the run "
             "(Dataset results only) — the tuning feedback loop",
    )
    args = ap.parse_args()

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if args.list or not args.name:
        oracled = set(entrymod.oracle_sql())
        for name in qs:
            print(f"{name}{'' if name in oracled else '  (rows-only)'}")
        return 0
    if args.name not in qs:
        print(f"unknown query {args.name!r} (use --list)", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.num_cpus,
            include_dashboard=False, logging_level="ERROR",
        )
    from ray.data import DataContext, Dataset

    DataContext.get_current().enable_progress_bars = False

    res = qs[args.name](args.sf_dir)
    if isinstance(res, Dataset):
        if args.out:
            res.write_parquet(args.out)
            print(f"wrote Dataset to {args.out}")
        else:
            df = res.to_pandas()
            print(df.head(20).to_string())
            print(f"... {len(df)} rows")
        if args.stats:
            print(res.stats())
    else:
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        if args.out:
            df.to_parquet(args.out)
            print(f"wrote {len(df)} rows to {args.out}")
        else:
            print(df.head(20).to_string())
            print(f"... {len(df)} rows")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
