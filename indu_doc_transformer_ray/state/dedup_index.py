"""Shared mutable fingerprint index — the one place the engine drops to raw
``@ray.remote`` actors, per the design rule: Dataset ops for every
per-record transform, actors only for state that must OUTLIVE a single
Dataset execution.

Use case: incremental / streaming ingest.  A batch-only exact dedup
(``functions/dedup.py::dedup_exact``) re-shuffles the whole corpus every
run; when new documents arrive continuously, the set of already-ingested
fingerprints is long-lived state that each new wave queries.  The index is
a sharded distributed hash set: ``n_shards`` actors, each owning the
fingerprints whose first hex chars route to it (md5-uniform), with batched
add/contains RPCs (one call per batch per shard, never per row).  Memory
per actor = distinct_fingerprints / n_shards x ~48 B; size ``n_shards`` to
the cluster, not the driver.

The demo query ``incremental_dedup`` treats the even-doc_id half of the
corpus as the previously-ingested snapshot (build pass: one streaming
``map_batches`` whose side effect fills the index) and then flags each
odd-doc_id document whose exact text already exists in the snapshot —
deterministic (set membership is order-free), so it carries a full DuckDB
oracle despite the stateful execution.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray
import ray.data
from ray.data import Dataset


@ray.remote(num_cpus=0)
class FingerprintShard:
    """One shard of the distributed fingerprint set.  ``num_cpus=0``: the
    work is dict lookups; a CPU reservation would starve the map tasks that
    call it (actor-pool deadlock gotcha)."""

    def __init__(self):
        self._seen: set[str] = set()

    def add_batch(self, fps: list[str]) -> int:
        self._seen.update(fps)
        return len(self._seen)

    def contains_batch(self, fps: list[str]) -> list[bool]:
        s = self._seen
        return [f in s for f in fps]

    def size(self) -> int:
        return len(self._seen)


class FingerprintIndex:
    """Driver-side facade over the actor shards: routes each fingerprint by
    its first 4 hex chars, issues ONE batched RPC per touched shard."""

    def __init__(self, n_shards: int = 8):
        self.n_shards = n_shards
        self.shards = [FingerprintShard.remote() for _ in range(n_shards)]

    def _route(self, fps: list[str]) -> dict[int, list[int]]:
        by_shard: dict[int, list[int]] = {}
        for i, f in enumerate(fps):
            by_shard.setdefault(int(f[:4], 16) % self.n_shards, []).append(i)
        return by_shard

    def add(self, fps: list[str]) -> None:
        refs = [
            self.shards[s].add_batch.remote([fps[i] for i in idx])
            for s, idx in self._route(fps).items()
        ]
        ray.get(refs)  # barrier: the batch's adds are durable on return

    def contains(self, fps: list[str]) -> list[bool]:
        routed = self._route(fps).items()
        refs = [
            self.shards[s].contains_batch.remote([fps[i] for i in idx])
            for s, idx in routed
        ]
        out = [False] * len(fps)
        for (_, idx), res in zip(routed, ray.get(refs)):
            for i, hit in zip(idx, res):
                out[i] = hit
        return out

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))


def _fps(batch: pa.Table) -> list[str]:
    return [
        hashlib.md5(t.encode()).hexdigest()
        for t in batch.column("text").to_pylist()
    ]


def incremental_dedup(sf_dir: str, n_shards: int = 8) -> Dataset:
    """Flag every odd-doc_id document whose exact text already exists in
    the even-doc_id snapshot.  Build pass: stream the snapshot wave through
    ``map_batches`` whose side effect fills the shared index (the terminal
    ``count()`` is the completion barrier — every ``add`` is ray.get-ed
    inside its batch).  Query pass: stream the new wave, one batched
    ``contains`` RPC per shard per batch.  Output: (doc_id, is_dup)."""
    index = FingerprintIndex(n_shards)
    shards = index.shards
    n = index.n_shards

    def docs():
        return ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )

    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ids % 2 == 0))
        fps = _fps(batch)
        by_shard: dict[int, list[str]] = {}
        for f in fps:
            by_shard.setdefault(int(f[:4], 16) % n, []).append(f)
        ray.get(
            [shards[s].add_batch.remote(v) for s, v in by_shard.items()]
        )
        return pa.table({"n": pa.array([len(fps)], pa.int64())})

    docs().map_batches(build, batch_format="pyarrow").count()  # barrier

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ids % 2 == 1))
        fps = _fps(batch)
        by_shard: dict[int, list[int]] = {}
        for i, f in enumerate(fps):
            by_shard.setdefault(int(f[:4], 16) % n, []).append(i)
        hits = [False] * len(fps)
        routed = list(by_shard.items())
        for (_, idx), res in zip(
            routed,
            ray.get(
                [
                    shards[s].contains_batch.remote([fps[i] for i in idx])
                    for s, idx in routed
                ]
            ),
        ):
            for i, hit in zip(idx, res):
                hits[i] = hit
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "is_dup": pa.array([1 if h else 0 for h in hits], pa.int64()),
            }
        )

    return docs().map_batches(score, batch_format="pyarrow")


INCREMENTAL_DEDUP_SQL = """
SELECT d.doc_id,
       CAST(CASE WHEN s.h IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup
FROM (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 2 = 1) d
LEFT JOIN (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 0) s
  USING (h)
"""
