"""Sequence-packing job entrypoint: tokenize -> global prefix scan -> cut
into fixed-length training sequences -> WRITE.

    python tools/run_pack.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/packed [--num-cpus N] [--seq-len 512]

The GPT-style pretraining layout: the corpus token stream (docs in doc_id
order, tokens = ``text.TOKEN_RE`` over the lowercased text) is cut every
``seq_len`` tokens; a document contributes a PIECE to every sequence its
token span overlaps.  Output rows are (seq_id, part_pos, doc_id, n_tokens,
piece) hive-partitioned by ``shard = seq_id % 64`` — a consumer reads one
shard and rebuilds each sequence by concatenating pieces in ``part_pos``
order; every sequence except the last holds exactly ``seq_len`` tokens
(invariant asserted by tests/test_pack_job.py).  ``manifest.json`` records
params, totals and the exact input; re-running with the same --out skips
via the lineage check, and the corpus publish is atomic (temp dir +
rename — the run_curation pattern, round-3 ADVICE).

Distributed shape: per-doc token offsets come from the hierarchical
prefix scan already under ``pack_bins`` (no level holds more than
n_docs/16M rows on the driver); the doc text meets its offset row in ONE
doc-bucket co-location (union + groupby — never a join, whose empty hash
partitions crash on small sides); piece emission is a streaming map whose
fan-out per doc is ceil(len/seq_len)+1; the write streams block-by-block.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WRITE_SHARDS = 64


def pack_and_write(sf_dir: str, out_dir: str, seq_len: int = 512) -> dict:
    """The library entry the CLI wraps (import-safe for tests; owns no Ray
    session).  Returns the manifest dict."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray.data

    from indu_doc_transformer_ray.functions._util import n_buckets
    from indu_doc_transformer_ray.functions.text import TOKEN_RE, pack_bins

    in_file = f"{sf_dir}/documents.parquet"
    mpath = os.path.join(out_dir, "manifest.json")
    lineage = {
        "input": os.path.abspath(in_file),
        "input_rows": pq.read_metadata(in_file).num_rows,
        "params": {"seq_len": seq_len},
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
    # (doc_id, n_tokens, cum_before, bin_id) via the hierarchical scan;
    # budget=seq_len so bin_id is already floor(cum_before / seq_len) —
    # only the piece cutting below needs the exact offsets.
    offsets = pack_bins(sf_dir, budget=seq_len).materialize()
    nb = n_buckets(lineage["input_rows"])

    def key_docs(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        return pa.table(
            {
                "bk": pc.cast(pc.bit_wise_and(ids, nb - 1), pa.int32()),
                "doc_id": ids,
                "text": t["text"],
                "kind": pa.array([0] * t.num_rows, pa.int8()),
                "cum_before": pa.array([0] * t.num_rows, pa.int64()),
            }
        )

    def key_offsets(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        return pa.table(
            {
                "bk": pc.cast(pc.bit_wise_and(ids, nb - 1), pa.int32()),
                "doc_id": ids,
                "text": pa.array([""] * t.num_rows, pa.string()),
                "kind": pa.array([1] * t.num_rows, pa.int8()),
                "cum_before": pc.cast(t["cum_before"], pa.int64()),
            }
        )

    def cut_pieces(g: "pd.DataFrame") -> pa.Table:
        off = g[g["kind"] == 1].set_index("doc_id")["cum_before"]
        docs = g[g["kind"] == 0]
        out = {"seq_id": [], "part_pos": [], "doc_id": [], "n_tokens": [], "piece": []}
        for doc_id, text in zip(docs["doc_id"].to_numpy(), docs["text"]):
            toks = TOKEN_RE.findall(text.lower())
            if not toks:
                continue
            start = int(off[doc_id])
            end = start + len(toks)
            for k in range(start // seq_len, (end - 1) // seq_len + 1):
                s = max(k * seq_len, start)
                e = min((k + 1) * seq_len, end)
                out["seq_id"].append(k)
                out["part_pos"].append(s - k * seq_len)
                out["doc_id"].append(int(doc_id))
                out["n_tokens"].append(e - s)
                out["piece"].append(" ".join(toks[s - start : e - start]))
        return pa.table(
            {
                "seq_id": pa.array(out["seq_id"], pa.int64()),
                "part_pos": pa.array(out["part_pos"], pa.int64()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "n_tokens": pa.array(out["n_tokens"], pa.int64()),
                "piece": pa.array(out["piece"], pa.string()),
                "shard": pa.array(
                    [k % WRITE_SHARDS for k in out["seq_id"]], pa.int64()
                ),
            }
        )

    docs = ray.data.read_parquet(in_file, columns=["doc_id", "text"])
    pieces = (
        docs.map_batches(key_docs, batch_format="pyarrow")
        .union(
            offsets.map_batches(key_offsets, batch_format="pyarrow")
        )
        .groupby("bk")
        .map_groups(cut_pieces, batch_format="pandas")
        .materialize()
    )

    # atomic corpus publish (temp dir + rename): write_parquet appends
    # uniquely-named files, so a partial prior run must never be visible.
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    corpus_dir = os.path.join(out_dir, "sequences")
    tmp_corpus = corpus_dir + ".tmp"
    shutil.rmtree(tmp_corpus, ignore_errors=True)
    pieces.write_parquet(tmp_corpus, partition_cols=["shard"])
    shutil.rmtree(corpus_dir, ignore_errors=True)
    os.rename(tmp_corpus, corpus_dir)

    from ray.data.aggregate import Max, Sum

    totals = pieces.aggregate(
        Sum("n_tokens", alias_name="n_tokens"), Max("seq_id", alias_name="max_seq")
    )
    n_tokens = int(totals["n_tokens"])
    n_seqs = int(totals["max_seq"]) + 1
    manifest = dict(lineage)
    manifest.update(
        {
            "complete": True,
            "n_pieces": int(pieces.count()),
            "n_tokens": n_tokens,
            "n_seqs": n_seqs,
            "last_seq_fill_bp": (
                10_000 * (n_tokens - (n_seqs - 1) * seq_len) // seq_len
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
    ap.add_argument("--seq-len", type=int, default=512)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(
            address="local", include_dashboard=False, logging_level="ERROR", **kw
        )
    try:
        manifest = pack_and_write(args.sf_dir, args.out, seq_len=args.seq_len)
        print(json.dumps(manifest))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
