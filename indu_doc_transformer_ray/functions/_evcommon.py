"""Shared plumbing for the events operator modules (split session 10 —
the single module had grown past 7 kLoC, the relational.py precedent):
column-pruned reader, timestamp normalization, derived user-bucket count
and the metadata-only corpus time bounds."""

from __future__ import annotations

import pandas as pd  # noqa: F401  (re-exported convention)
import pyarrow as pa
import pyarrow.compute as pc  # noqa: F401
import ray.data  # noqa: F401
from ray.data import Dataset

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def _ts_us_i64(col: "pa.ChunkedArray") -> "pa.ChunkedArray":
    """Epoch MICROSECONDS as int64 regardless of the parquet timestamp
    resolution (the table contract is us, but a ns-written file must not
    silently scale every derived day/window by 1000)."""
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())


def _user_buckets(sf_dir: str) -> int:
    """Coarse user-bucket count derived from the events row count (parquet
    metadata only, no scan) so one bucket's in-kernel pandas frame stays
    ~``_util.ROWS_PER_BUCKET`` rows at any scale.  User ids are dense and
    uniform, so modulo bucketing is skew-free; results are bucket-count
    invariant (the kernel re-groups by the exact user id inside)."""
    import pyarrow.parquet as pq

    from ._util import n_buckets

    return n_buckets(pq.read_metadata(f"{sf_dir}/events.parquet").num_rows)


def _read_events(sf_dir: str, columns: list[str]) -> Dataset:
    from ._util import read_small_aware

    return read_small_aware(f"{sf_dir}/events.parquet", columns=columns)



# -- interval-overlap join: concurrent-session counting ----------------------

def _ts_bounds_us(path: str) -> tuple[int, int]:
    """Global (min, max) of the ``ts`` column in integer microseconds from
    parquet ROW-GROUP STATISTICS only — no scan, so deriving time buckets
    from the corpus time span stays metadata-cheap at any scale."""
    import numpy as np
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    lo, hi = None, None
    for r in range(md.num_row_groups):
        rg = md.row_group(r)
        for c in range(rg.num_columns):
            col = rg.column(c)
            if col.path_in_schema == "ts" and col.statistics is not None:
                s = col.statistics
                mn = int(np.datetime64(s.min, "us").astype("int64"))
                mx = int(np.datetime64(s.max, "us").astype("int64"))
                lo = mn if lo is None else min(lo, mn)
                hi = mx if hi is None else max(hi, mx)
    if lo is None:  # pragma: no cover - stats always present on our data
        raise ValueError(f"no ts statistics in {path}")
    return lo, hi

