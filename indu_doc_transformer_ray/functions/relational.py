"""Relational operators over the TPC-H-ish driver tables, Ray-Data-first.

Each query is a lazy ``Dataset`` pipeline: column-pruned parquet reads,
vectorized pyarrow.compute kernels inside ``map_batches``, broadcast hash
joins for small dimension sides (``ray.put`` once, probe per batch),
``Dataset.join`` (hash-partitioned shuffle join) when both sides are large,
and ``groupby().aggregate()`` for the wide aggregations.

Exactness contract: monetary aggregates are computed in integer-scaled
cents (``*_c2`` = 1e2, ``*_c4`` = 1e4, ``*_c6`` = 1e6) so the Ray results
hash-match the DuckDB oracle bit-for-bit — float SUMs would differ in the
last ulp across summation orders.

This module is the public FACADE: implementations live in tpch_scan /
tpch_join / tpch_corr / setops / profiling / star (split round 4 — the
single module had grown past 5 kLoC), with shared plumbing in
``_relcommon``.  Every public name is re-exported here unchanged.
"""

from ._relcommon import (  # noqa: F401
    MAX_BROADCAST_DIM_ROWS,
    _cents,
    _dim_lookup,
    _dim_rows,
    _lookup_hits,
    _read,
)
from .profiling import *  # noqa: F401,F403
from .profiling import _frontier_mask  # noqa: F401  (property-tested helper)
from .setops import *  # noqa: F401,F403
from .star import *  # noqa: F401,F403
from .tpch_corr import *  # noqa: F401,F403
from .tpch_join import *  # noqa: F401,F403
from .tpch_scan import *  # noqa: F401,F403
