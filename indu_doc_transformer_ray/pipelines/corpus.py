"""Distributed corpus materialization.

Generates the deterministic synthetic span corpus (fixtures.py) in parallel
with Ray and writes it as partitioned parquet — generation is a pure
function of ``(doc_index, seed)``, so it map_batches cleanly over a range
dataset and any shard can be regenerated independently.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data import Dataset

from ..fixtures import corpus_batch


def corpus_dataset(n_docs: int, seed: int = 42, batch_size: int = 64) -> Dataset:
    def gen(batch: pa.Table) -> pa.Table:
        ids = [f"doc-{i:06d}" for i in batch.column("id").to_pylist()]
        return corpus_batch(ids, seed)

    return ray.data.range(n_docs).map_batches(
        gen, batch_format="pyarrow", batch_size=batch_size
    )


def materialize_corpus(
    n_docs: int, out_dir: str, seed: int = 42, batch_size: int = 64
) -> str:
    corpus_dataset(n_docs, seed, batch_size).write_parquet(out_dir)
    return out_dir
