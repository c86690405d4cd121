"""Training-feed surface: hand one Dataset to N concurrent consumers.

``ds.streaming_split(n)`` is Ray Data's multi-consumer contract — the
shape that feeds an N-GPU training job from one corpus pipeline with
coordinated backpressure (each trainer pulls its share of blocks; no
consumer materializes the corpus).  ``training_feed_counts`` runs the
full loop locally with counting "trainer" actors so the engine's feed
path is exercised end-to-end: every corpus row reaches EXACTLY one
consumer.  Block assignment across consumers is scheduler-driven (not
deterministic), so this is a pipeline surface with a pytest totals gate,
not a `queries()` entry."""

from __future__ import annotations

import pyarrow.compute as pc

import ray
import ray.data


@ray.remote(num_cpus=0)
class _CountingTrainer:
    """Stand-in trainer: consumes its split's batches, accounts rows and
    whitespace tokens (the real job would run a training step per batch)."""

    def consume(self, it) -> dict:
        rows = 0
        tokens = 0
        for b in it.iter_batches(batch_size=256, batch_format="pyarrow"):
            rows += b.num_rows
            tokens += int(
                pc.sum(
                    pc.list_value_length(
                        pc.split_pattern(b.column("text"), " ")
                    )
                ).as_py()
                or 0
            )
        return {"rows": rows, "tokens": tokens}


def training_feed_counts(sf_dir: str, n_consumers: int = 4) -> list[dict]:
    """Split the documents table across ``n_consumers`` streaming
    consumers; returns each consumer's (rows, tokens) accounting.  The
    iterators coordinate, so all consumers must run CONCURRENTLY (one
    ray.get over all consume calls)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    its = ds.streaming_split(n_consumers, equal=False)
    trainers = [_CountingTrainer.remote() for _ in range(n_consumers)]
    return ray.get(
        [t.consume.remote(it) for t, it in zip(trainers, its)]
    )
