"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time windows/watermarks, so stream semantics follow
the ray_guide pattern: partition by key, sort by timestamp WITHIN the group,
and implement the window/join logic in ``groupby(key).map_groups`` — the
ordering assumption (per-user ts order, event_id tie-break) is stated here
and mirrored in the oracle SQL's OVER clauses.

The groupby key is a COARSE user bucket (count DERIVED from the events
row count — ``_user_buckets``), not the raw user id: the shuffle still
co-locates each user's events, but one map_groups call handles a bucket of
users with a vectorized pandas ``groupby(user_id)`` inside — per-group
Python call overhead across millions of users would otherwise dominate at
scale, while the derived count bounds one bucket's pandas frame at any
corpus size (a fixed 512 meant corpus/512 rows per task).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from ._evcommon import (  # noqa: F401
    SESSION_GAP_US,
    _read_events,
    _ts_bounds_us,
    _ts_us_i64,
    _user_buckets,
)
from .events_streams import (  # noqa: F401
    _CUSUM_H_C2,
    _CUSUM_K_C2,
    _DENSITY_BUCKET_US,
    _DENSITY_WINDOW_US,
)
from .events_series import (  # noqa: F401
    _DFT7_COS,
    _DFT7_SIN,
    _IAT_HIST_W,
    _RFM_HIST_W,
    _RFM_QS,
    _haar_sql,
    _markov_sql,
    _rfm_cut_sql,
)
from .events_behavior import (  # noqa: F401
    _BANDIT_UNPLAYED_KEY,
    _HUFFMAN_MERGES,
    _MA_CHANNELS,
    _MA_ROUNDS,
    _MA_SCALE,
    _SHAPLEY_CHANNELS,
    _SHAPLEY_FACT,
    _holt_winters_sql,
    _huffman_sql,
    _ma_round_cte,
    _ma_sql,
)
from .events_behavior import *  # noqa: F401,F403
from .events_series import *  # noqa: F401,F403
from .events_streams import *  # noqa: F401,F403

