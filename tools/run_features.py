"""Feature-store build job: one shuffle, twelve per-user features, atomic
hive-partitioned publish.

    python tools/run_features.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/features [--num-cpus N] [--shards 64]

Materializes `events.user_features` — the single user-bucket co-location
that computes every per-entity behavioral feature at once (counts, active
days, span, value totals, modal type, running-peak drawdown, mean gap,
30-minute sessions) — as a hive-partitioned parquet table
(`features/shard=NN`, shard = user_id % --shards) so a 256-node consumer
reads/joins per partition.  The operator is SQL-oracled in the registry,
so the published table inherits the correctness gate.

Publish is atomic (temp dir + rename, the run_curation pattern) and the
job resumes by lineage: re-running with the same --out, unchanged input
and params returns the existing manifest with ``"skipped": true``; any
change re-computes and REPLACES the whole table (no stale-shard mixing).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_features(sf_dir: str, out_dir: str, shards: int = 64) -> dict:
    """Import-safe library entry (owns no Ray session); returns the
    manifest dict."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from indu_doc_transformer_ray.functions.events import user_features

    in_file = f"{sf_dir}/events.parquet"
    mpath = os.path.join(out_dir, "manifest.json")
    lineage = {
        "input": os.path.abspath(in_file),
        "input_rows": pq.read_metadata(in_file).num_rows,
        "params": {"shards": shards},
    }
    if os.path.exists(mpath):
        with open(mpath) as f:
            old = json.load(f)
        if old.get("complete") and {
            k: old.get(k) for k in ("input", "input_rows", "params")
        } == lineage:
            old["skipped"] = True
            return old

    t0 = time.time()
    feats = user_features(sf_dir)

    def add_shard(t: pa.Table) -> pa.Table:
        return t.append_column(
            "shard",
            pc.cast(
                pc.bit_wise_and(pc.cast(t["user_id"], pa.int64()), shards - 1)
                if shards & (shards - 1) == 0
                else pc.subtract(
                    pc.cast(t["user_id"], pa.int64()),
                    pc.multiply(
                        pc.divide(pc.cast(t["user_id"], pa.int64()), shards),
                        shards,
                    ),
                ),
                pa.int64(),
            ),
        )

    sharded = feats.map_batches(add_shard, batch_format="pyarrow")

    os.makedirs(out_dir, exist_ok=True)
    fdir = os.path.join(out_dir, "features")
    tmp = fdir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    sharded.write_parquet(tmp, partition_cols=["shard"])
    shutil.rmtree(fdir, ignore_errors=True)
    os.rename(tmp, fdir)

    import ray.data

    written = ray.data.read_parquet(fdir)
    n_users = written.count()

    manifest = dict(lineage)
    manifest.update(
        {
            "complete": True,
            "n_users": int(n_users),
            "n_features": len(
                [c for c in written.schema().names if c not in ("user_id", "shard")]
            ),
            "wall_s": round(time.time() - t0, 2),
        }
    )
    tmpm = mpath + ".tmp"
    with open(tmpm, "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmpm, mpath)
    return manifest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--shards", type=int, default=64)
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

    manifest = build_features(args.sf_dir, args.out, shards=args.shards)
    digest = {
        k: manifest[k]
        for k in ("input", "complete", "n_users", "n_features", "wall_s")
        if k in manifest
    }
    digest["skipped"] = manifest.get("skipped", False)
    print(json.dumps(digest))
    ray.shutdown()


if __name__ == "__main__":
    main()
