"""Verify a finished extraction run against the single-process oracle.

    python tools/verify_spans.py --out <run dir> --input <docs parquet dir> \
        [--sample N]

Re-derives the golden span sequences for N sampled documents (default 200)
with the pure-Python oracle and compares them against the run's checkpoint
under the BASELINE per-row invariant — span-sequence equality on
(kind, text, media_ref, order).  Exit code 0 = 100% match on the sample.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--sample", type=int, default=200)
    args = ap.parse_args()

    import pyarrow.dataset as pads

    from indu_doc_transformer_ray.core import default_config
    from indu_doc_transformer_ray.emit import process_document
    from indu_doc_transformer_ray.spandoc import Span
    from indu_doc_transformer_ray.store import ExtractionStore

    run = pads.dataset(os.path.join(args.out, "extracted")).to_table(
        columns=["doc_id", "spans"]
    )
    got = dict(zip(run.column("doc_id").to_pylist(),
                   run.column("spans").to_pylist()))

    docs = pads.dataset(args.input).to_table(columns=["doc_id", "spans"])
    doc_ids = docs.column("doc_id").to_pylist()
    raw_spans = docs.column("spans").to_pylist()
    sample_ids = sorted(doc_ids)[:: max(1, len(doc_ids) // args.sample)]
    sample = set(sample_ids)

    mismatches = []
    checked = 0
    for doc_id, raw in zip(doc_ids, raw_spans):
        if doc_id not in sample:
            continue
        store = ExtractionStore(default_config)
        want = process_document(
            doc_id,
            [Span(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in raw],
            store,
        )
        have = got.get(doc_id)
        if have is None:
            mismatches.append((doc_id, "missing from run"))
            continue
        want_t = [(s.kind, s.text, s.media_ref, s.offset) for s in want]
        have_t = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in have
        ]
        if want_t != have_t:
            mismatches.append((doc_id, "span sequence differs"))
        checked += 1

    print(f"checked={checked} mismatches={len(mismatches)}")
    for doc_id, why in mismatches[:10]:
        print(f"  {doc_id}: {why}")
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
