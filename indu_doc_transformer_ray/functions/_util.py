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


#: Target rows a single coarse co-location bucket should hold: the in-bucket
#: kernel materializes one bucket as one pandas frame, so this bounds the
#: per-task working set (~64k rows of narrow int/str columns is a few MB)
#: while keeping buckets far fewer than groups at test scale.
ROWS_PER_BUCKET = 65_536


def n_buckets(
    n_rows: int | None,
    rows_per_bucket: int = ROWS_PER_BUCKET,
    lo: int = 64,
    hi: int = 1 << 22,
) -> int:
    """Coarse co-location bucket count DERIVED from the corpus size instead
    of a fixed constant: next power of two of ``n_rows / rows_per_bucket``,
    clamped to [lo, hi].  A fixed 512 meant corpus/512 rows per in-bucket
    pandas frame — ~200 GB/task at 10^12 rows; deriving from the row count
    keeps the per-task working set bounded at any scale while the power-of-
    two form keeps the modulo cheap.  Results must be (and are, see
    tests/test_functions.py bucket-invariance) independent of the count —
    buckets only coarsen the shuffle key, never the group key.  ``n_rows``
    comes from parquet metadata (``Dataset.count()`` on a fresh read) or a
    materialized Dataset's metadata — never a full scan."""
    if not n_rows or n_rows <= 0:
        return lo
    want = (n_rows + rows_per_bucket - 1) // rows_per_bucket
    b = 1 << max(0, (want - 1).bit_length())
    return max(lo, min(hi, b))
