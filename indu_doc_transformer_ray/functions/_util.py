"""Shared helpers for the operator modules."""

from __future__ import annotations


def join_partitions(cap: int = 64) -> int:
    """Hash-join partition count sized to the Ray session: ncpu/2, capped.
    Each partition spawns a shuffle-aggregator actor PER JOIN SIDE, and a
    partition count exceeding available CPUs deadlocks small sessions
    (aggregators can't all schedule, the join never drains); the cap bounds
    actor fan-out on big clusters — raise it for >128-CPU clusters where
    join key cardinality warrants."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(cap, ncpu // 2))
