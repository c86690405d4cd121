"""Curation job entrypoint: filter -> dedup -> cap -> pack -> WRITE.

    python tools/run_curation.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/curated [--num-cpus N] [--min-tokens 10] \
        [--min-chars 100] [--per-lang-cap 50] [--budget 512]

Runs the `curation_pipeline` flagship over the documents table and
materializes the curated corpus: full document rows enriched with
(n_tokens, bin_id), written as hive-partitioned parquet (one directory per
write shard, so a 256-node run resumes/consumes per partition), plus a
`manifest.json` recording params, counts and the exact input file.
Re-running with the same --out skips the write when the manifest is
complete and the input is unchanged (lineage check, the run_job pattern).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WRITE_SHARDS = 64


def curate_and_write(
    sf_dir: str,
    out_dir: str,
    min_tokens: int = 10,
    min_chars: int = 100,
    per_lang_cap: int = 50,
    budget: int = 512,
) -> dict:
    """The library entry the CLI wraps (import-safe for tests; owns no Ray
    session).  Returns the manifest dict."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray.data

    from indu_doc_transformer_ray.functions._util import n_buckets
    from indu_doc_transformer_ray.functions.text import curation_pipeline

    in_file = f"{sf_dir}/documents.parquet"
    mpath = os.path.join(out_dir, "manifest.json")
    lineage = {
        "input": os.path.abspath(in_file),
        "input_rows": pq.read_metadata(in_file).num_rows,
        "params": {
            "min_tokens": min_tokens,
            "min_chars": min_chars,
            "per_lang_cap": per_lang_cap,
            "budget": budget,
        },
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
    packed = curation_pipeline(
        sf_dir, min_tokens=min_tokens, min_chars=min_chars,
        per_lang_cap=per_lang_cap, budget=budget,
    ).materialize()  # curated-set-sized: (doc_id, n_tokens, cum_before, bin_id)

    nb = n_buckets(lineage["input_rows"])

    def key_docs(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        return pa.table(
            {
                "bk": pc.cast(pc.bit_wise_and(ids, nb - 1), pa.int32()),
                "doc_id": ids,
                "text": t["text"],
                "lang": t["lang"],
                "source": t["source"],
                "kind": pa.array([0] * t.num_rows, pa.int8()),
                "n_tokens": pa.array([0] * t.num_rows, pa.int64()),
                "bin_id": pa.array([0] * t.num_rows, pa.int64()),
            }
        )

    def key_keep(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        empty = pa.array([""] * t.num_rows, pa.string())
        return pa.table(
            {
                "bk": pc.cast(pc.bit_wise_and(ids, nb - 1), pa.int32()),
                "doc_id": ids,
                "text": empty,
                "lang": empty,
                "source": empty,
                "kind": pa.array([1] * t.num_rows, pa.int8()),
                "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
                "bin_id": pc.cast(t["bin_id"], pa.int64()),
            }
        )

    def enrich(g: "pd.DataFrame") -> pa.Table:
        keep = g[g["kind"] == 1].set_index("doc_id")
        d = g[(g["kind"] == 0) & g["doc_id"].isin(keep.index)]
        return pa.table(
            {
                "doc_id": pa.array(d["doc_id"].to_numpy("int64")),
                "text": pa.array(d["text"].astype(str), pa.string()),
                "lang": pa.array(d["lang"].astype(str), pa.string()),
                "source": pa.array(d["source"].astype(str), pa.string()),
                "n_tokens": pa.array(
                    d["doc_id"].map(keep["n_tokens"]).to_numpy("int64")
                ),
                "bin_id": pa.array(
                    d["doc_id"].map(keep["bin_id"]).to_numpy("int64")
                ),
                "shard": pa.array(
                    (d["doc_id"].map(keep["bin_id"]) % WRITE_SHARDS)
                    .to_numpy("int64")
                ),
            }
        )

    docs = ray.data.read_parquet(
        in_file, columns=["doc_id", "text", "lang", "source"]
    )
    curated = (
        docs.map_batches(key_docs, batch_format="pyarrow")
        .union(packed.map_batches(key_keep, batch_format="pyarrow"))
        .groupby("bk")
        .map_groups(enrich, batch_format="pandas")
        .materialize()
    )
    # atomic corpus publish: write into a temp dir and rename into place.
    # write_parquet generates uniquely-named files, so writing straight into
    # an existing corpus/ after a partial failure (crash before
    # manifest.json) or a params change would APPEND a second full copy —
    # readers of the hive layout would see duplicated documents while the
    # manifest reports only the fresh count.
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    corpus_dir = os.path.join(out_dir, "corpus")
    tmp_corpus = corpus_dir + ".tmp"
    shutil.rmtree(tmp_corpus, ignore_errors=True)
    curated.write_parquet(tmp_corpus, partition_cols=["shard"])
    shutil.rmtree(corpus_dir, ignore_errors=True)
    os.rename(tmp_corpus, corpus_dir)

    n_docs = curated.count()
    manifest = dict(lineage)
    manifest.update(
        {
            "complete": True,
            "n_docs_kept": int(n_docs),
            "n_bins": int(packed.to_pandas()["bin_id"].nunique()),
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
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--min-chars", type=int, default=100)
    ap.add_argument("--per-lang-cap", type=int, default=50)
    ap.add_argument("--budget", type=int, default=512)
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

    manifest = curate_and_write(
        args.sf_dir, args.out,
        min_tokens=args.min_tokens, min_chars=args.min_chars,
        per_lang_cap=args.per_lang_cap, budget=args.budget,
    )
    print(json.dumps(manifest))
    ray.shutdown()


if __name__ == "__main__":
    main()
