"""Shared relational plumbing: column-pruned reads, integer-cents casts,
and the broadcast-dimension lookup helpers with their size guard
(``MAX_BROADCAST_DIM_ROWS``) used by every dual-plan join query.

Split out of the former single-module relational.py (round-4 hygiene);
``relational`` remains the public facade re-exporting every operator.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

from ._util import join_partitions


def _read(
    sf_dir: str,
    table: str,
    columns: list[str] | None = None,
    filter: "object | None" = None,
) -> Dataset:
    """Column-pruned parquet read; ``filter`` (a ``pyarrow.dataset``
    expression) pushes a row predicate INTO the scan — row groups whose
    column statistics exclude the range never leave storage (at 100 TB a
    date-window query reads the window, not the corpus).  Callers keep
    their exact in-batch masks: the pushdown is a superset prune, the
    batch mask stays the semantic truth."""
    from ._util import read_small_aware

    kwargs = {} if filter is None else {"filter": filter}
    return read_small_aware(
        f"{sf_dir}/{table}.parquet", columns=columns, **kwargs
    )


def _cents(col: pa.ChunkedArray | pa.Array, scale: int = 100) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, float(scale))), pa.int64())



def _dim_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows


def _dim_lookup(sf_dir: str, table: str, key: str, cols: list[str]):
    """Driver-side sorted-key lookup for a dimension table: returns
    (sorted key ndarray, {col: aligned ndarray}) for one ``ray.put``
    broadcast.  Callers guard on ``_dim_rows(...) <= MAX_BROADCAST_DIM_ROWS``
    first — above the guard the co-location/join plan must run instead."""
    import numpy as np

    df = _read(sf_dir, table, [key, *cols]).to_pandas().sort_values(key)
    keys = df[key].to_numpy(np.int64)
    vals = {c: df[c].to_numpy() for c in cols}
    return keys, vals


def _lookup_hits(keys, probe):
    """searchsorted membership probe: (hit_mask, index-into-keys[hit])."""
    import numpy as np

    if len(keys) == 0:
        return np.zeros(len(probe), bool), np.zeros(0, np.int64)
    idx = np.clip(np.searchsorted(keys, probe), 0, len(keys) - 1)
    hit = keys[idx] == probe
    return hit, idx[hit]


#: Dimension-broadcast guard for q7: a nation-key map over this many rows
#: (~tens of MB as two int arrays) stays a driver broadcast; above it the
#: all-co-location plan runs (same answer, one more exchange per dim —
#: the decontaminate two-physical-plans pattern).
MAX_BROADCAST_DIM_ROWS = 2_000_000


