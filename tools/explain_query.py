"""Print Ray Data's per-stage execution stats for any registered query —
the profiling loop the repo's perf notes are built on (ds.stats() shows
per-operator wall, blocks, rows and memory, so a stage starving the
others is visible immediately).

    python tools/explain_query.py <query_name> [--sf-dir DIR] [--num-cpus N]

Driver-frame results (pandas) have no Ray stats; the tool says so and
prints the frame shape instead."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    fns = entry.queries()
    if args.query not in fns:
        print(f"unknown query {args.query!r}; see tools/run_query.py --list")
        raise SystemExit(1)
    t0 = time.time()
    res = fns[args.query](args.sf_dir)
    if hasattr(res, "stats"):
        df = res.to_pandas()  # execute; query results are driver-safe sizes
        print(res.stats())
        print(f"\nrows={len(df)} wall={time.time() - t0:.2f}s")
    else:
        print("driver-frame result (no Ray Dataset stats): "
              f"shape={getattr(res, 'shape', len(res))} "
              f"wall={time.time() - t0:.2f}s")
    ray.shutdown()


if __name__ == "__main__":
    main()
