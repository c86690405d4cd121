"""Dedup job entrypoint: exact-substring keep-one-copy REWRITE -> WRITE.

    python tools/run_dedup.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/deduped [--num-cpus N] [--write-shards 64]

Runs `substring_dedup_rewrite(emit="text")` over the documents table and
materializes the DEDUPLICATED corpus: (doc_id, residual, n_words,
n_removed, lang, source), hive-partitioned by write shard (a 256-node run
resumes/consumes per partition), plus `manifest.json` with params, token
counts and the input lineage.  Re-running with the same --out skips the
write when the manifest is complete and the input is unchanged; the
corpus publish is atomic (temp dir + rename) so a crash mid-write never
leaves a half-doubled corpus (the run_curation pattern)."""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def dedup_and_write(sf_dir: str, out_dir: str, write_shards: int = 64) -> dict:
    """Import-safe library entry (owns no Ray session); returns the
    manifest dict."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray.data

    from indu_doc_transformer_ray.functions._util import n_buckets
    from indu_doc_transformer_ray.functions.dedup import (
        substring_dedup_rewrite,
    )

    in_file = f"{sf_dir}/documents.parquet"
    mpath = os.path.join(out_dir, "manifest.json")
    lineage = {
        "input": os.path.abspath(in_file),
        "input_rows": pq.read_metadata(in_file).num_rows,
        "params": {"write_shards": write_shards},
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
    nb = n_buckets(lineage["input_rows"])
    rewritten = substring_dedup_rewrite(sf_dir, emit="text")

    # re-attach (lang, source) metadata by doc-bucket co-location (the
    # rewrite stream carries only doc_id + residual; a Dataset.join would
    # hit the empty-partition crash on small shards)
    def key_meta(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        return pa.table(
            {
                "mk": pc.cast(pc.bit_wise_and(ids, nb - 1), pa.int32()),
                "doc_id": ids,
                "lang": t["lang"],
                "source": t["source"],
                "residual": pa.array([""] * t.num_rows, pa.string()),
                "n_words": pa.array([-1] * t.num_rows, pa.int64()),
                "n_removed": pa.array([0] * t.num_rows, pa.int64()),
            }
        )

    def key_rw(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        empty = pa.array([""] * t.num_rows, pa.string())
        return pa.table(
            {
                "mk": pc.cast(pc.bit_wise_and(ids, nb - 1), pa.int32()),
                "doc_id": ids,
                "lang": empty,
                "source": empty,
                "residual": t["residual"],
                "n_words": pc.cast(t["n_words"], pa.int64()),
                "n_removed": pc.cast(t["n_removed"], pa.int64()),
            }
        )

    def stitch(g) -> pa.Table:
        import pandas as pd  # noqa: F401

        meta = g[g["n_words"] < 0].set_index("doc_id")
        rw = g[g["n_words"] >= 0]
        return pa.table(
            {
                "doc_id": pa.array(rw["doc_id"].to_numpy("int64")),
                "residual": pa.array(rw["residual"].astype(str), pa.string()),
                "n_words": pa.array(rw["n_words"].to_numpy("int64")),
                "n_removed": pa.array(rw["n_removed"].to_numpy("int64")),
                "lang": pa.array(
                    rw["doc_id"].map(meta["lang"]).astype(str), pa.string()
                ),
                "source": pa.array(
                    rw["doc_id"].map(meta["source"]).astype(str), pa.string()
                ),
                "shard": pa.array(
                    (rw["doc_id"] % write_shards).to_numpy("int64")
                ),
            }
        )

    meta = ray.data.read_parquet(
        in_file, columns=["doc_id", "lang", "source"]
    )
    out = (
        rewritten.map_batches(key_rw, batch_format="pyarrow")
        .union(meta.map_batches(key_meta, batch_format="pyarrow"))
        .groupby("mk")
        .map_groups(stitch, batch_format="pandas")
        .materialize()
    )

    os.makedirs(out_dir, exist_ok=True)
    corpus_dir = os.path.join(out_dir, "corpus")
    tmp_corpus = corpus_dir + ".tmp"
    shutil.rmtree(tmp_corpus, ignore_errors=True)
    out.write_parquet(tmp_corpus, partition_cols=["shard"])
    shutil.rmtree(corpus_dir, ignore_errors=True)
    os.rename(tmp_corpus, corpus_dir)

    import pandas as pd

    stats = out.select_columns(["n_words", "n_removed"]).to_pandas()
    manifest = dict(lineage)
    manifest.update(
        {
            "complete": True,
            "n_docs": int(len(stats)),
            "n_words_in": int(stats["n_words"].sum()),
            "n_words_removed": int(stats["n_removed"].sum()),
            "removed_bp": int(
                stats["n_removed"].sum() * 10000
                // max(int(stats["n_words"].sum()), 1)
            ),
            "wall_s": round(time.time() - t0, 2),
        }
    )
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--write-shards", type=int, default=64)
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

    manifest = dedup_and_write(
        args.sf_dir, args.out, write_shards=args.write_shards
    )
    print(json.dumps(manifest))
    ray.shutdown()


if __name__ == "__main__":
    main()
