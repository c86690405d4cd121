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


def asof_prior_click(sf_dir: str) -> Dataset:
    """For every 'error' event: the most recent prior-or-equal 'click' by
    the same user (an as-of join).  One groupby co-locates each user's
    events; the in-group kernel is a sorted ``pd.merge_asof``.  Errors with
    no prior click drop (inner as-of).  Output: (event_id, click_id,
    gap_us) — integers only, so the DuckDB ASOF JOIN oracle hash-matches."""

    ds = _read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    ubk = _user_buckets(sf_dir)
    ds = ds.filter(expr="event_type == 'error' or event_type == 'click'")

    def add_bucket(t: pa.Table) -> pa.Table:
        # arrow out: the user-bucket co-location shuffle sorts these
        # blocks, and pandas blocks pay ~13x (BASELINE block-format note)
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32())
        )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        errors = g[g["event_type"] == "error"]
        clicks = g[g["event_type"] == "click"]
        if errors.empty or clicks.empty:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "click_id": pa.array([], pa.int64()),
                 "gap_us": pa.array([], pa.int64())}
            )
        clicks = clicks.assign(ts_click=clicks["ts"])
        # per-user as-of via merge_asof(by=...): one vectorized call covers
        # every user in the bucket
        m = pd.merge_asof(
            errors.sort_values(["ts", "event_id"]),
            clicks.sort_values(["ts", "event_id"]),
            on="ts", by="user_id", direction="backward",
            suffixes=("", "_click"),
        )
        m = m[m["event_id_click"].notna()]
        return pa.table(
            {
                "event_id": pa.array(m["event_id"].astype("int64").values),
                "click_id": pa.array(m["event_id_click"].astype("int64").values),
                "gap_us": pa.array(
                    (m["ts"].astype("int64") - m["ts_click"].astype("int64"))
                    .astype("int64").values
                ),
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_user, batch_format="pandas")
    )
    return out.sort("event_id")


ASOF_PRIOR_CLICK_SQL = """
SELECT e.event_id,
       c.event_id AS click_id,
       CAST(epoch_us(e.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
ORDER BY e.event_id
"""


def sessionize(sf_dir: str) -> Dataset:
    """Session windows per user (gap > 30 min starts a new session):
    per-user sorted scan inside map_groups; output integer session stats
    (user_id, n_sessions, max_session_events, longest_session_us)."""

    ds = _read_events(sf_dir, ["event_id", "ts", "user_id"])
    ubk = _user_buckets(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        # arrow out: the user-bucket co-location shuffle sorts these
        # blocks, and pandas blocks pay ~13x (BASELINE block-format note)
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass over ALL users in the bucket: session breaks
        # are per-user ts gaps (diff crosses user boundaries -> mask them)
        g = g.sort_values(["user_id", "ts", "event_id"])
        ts = g["ts"].astype("int64")
        same_user = g["user_id"].eq(g["user_id"].shift())
        new_session = (ts.diff() > SESSION_GAP_US) & same_user
        # a new user also starts a new session id space
        sid = (new_session | ~same_user).cumsum()
        per_session = pd.DataFrame(
            {"user_id": g["user_id"].values, "sid": sid.values, "ts": ts.values}
        ).groupby(["user_id", "sid"])["ts"].agg(["count", "min", "max"])
        per_session["dur"] = per_session["max"] - per_session["min"]
        agg = per_session.groupby(level=0).agg(
            n_sessions=("count", "size"),
            max_session_events=("count", "max"),
            longest_session_us=("dur", "max"),
        ).reset_index()
        return pa.table(
            {
                "user_id": pa.array(agg["user_id"].astype("int64").values),
                "n_sessions": pa.array(agg["n_sessions"].astype("int64").values),
                "max_session_events": pa.array(
                    agg["max_session_events"].astype("int64").values
                ),
                "longest_session_us": pa.array(
                    agg["longest_session_us"].astype("int64").values
                ),
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return out.sort("user_id")


SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM marked
), per_session AS (
  SELECT user_id, sid, COUNT(*) AS n,
         epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
  FROM sessions GROUP BY user_id, sid
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(MAX(n) AS BIGINT) AS max_session_events,
       CAST(MAX(dur_us) AS BIGINT) AS longest_session_us
FROM per_session GROUP BY user_id ORDER BY user_id
"""


def funnel_counts(sf_dir: str) -> "object":
    """Ordered-sequence funnel view -> click -> purchase: a user advances a
    stage only with a LATER event of the next type (first view, first click
    strictly after it, first purchase strictly after that).  One bucketed
    co-location shuffle; the in-group kernel is three vectorized
    merge+filter+groupby-min passes over every user in the bucket; buckets
    emit one partial row and the driver sums a bucket-count-sized frame.
    Output: (n_view, n_view_click, n_full_funnel) — one row."""
    ubk = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["ts", "user_id", "event_type"]).filter(
        expr=(
            "event_type == 'view' or event_type == 'click'"
            " or event_type == 'purchase'"
        )
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        # arrow out: the user-bucket co-location shuffle sorts these
        # blocks, and pandas blocks pay ~13x (BASELINE block-format note)
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].astype("int64")
        g = g.assign(ts_us=ts)
        t1 = (
            g[g["event_type"] == "view"].groupby("user_id")["ts_us"].min()
        )
        clicks = g[g["event_type"] == "click"].merge(
            t1.rename("t1"), left_on="user_id", right_index=True
        )
        t2 = (
            clicks[clicks["ts_us"] > clicks["t1"]]
            .groupby("user_id")["ts_us"].min()
        )
        purch = g[g["event_type"] == "purchase"].merge(
            t2.rename("t2"), left_on="user_id", right_index=True
        )
        t3 = (
            purch[purch["ts_us"] > purch["t2"]]
            .groupby("user_id")["ts_us"].min()
        )
        return pd.DataFrame(
            {
                "n_view": pd.Series([len(t1)], dtype="int64"),
                "n_view_click": pd.Series([len(t2)], dtype="int64"),
                "n_full_funnel": pd.Series([len(t3)], dtype="int64"),
            }
        )

    parts = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # one row per user bucket
    )
    return pd.DataFrame(
        {
            "n_view": [int(parts["n_view"].sum())],
            "n_view_click": [int(parts["n_view_click"].sum())],
            "n_full_funnel": [int(parts["n_full_funnel"].sum())],
        }
    )


FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_full_funnel
"""


def cohort_retention(sf_dir: str) -> Dataset:
    """Weekly cohort retention matrix: users grouped by first-activity week
    (cohort), counted in each later week they were active.  One bucketed
    co-location shuffle keyed by user (cohort = per-user min week and the
    user's distinct active weeks are computed together in-group, vectorized
    across the bucket's users), then a small groupby over (cohort_week,
    weeks_since).  Output: (cohort_week, weeks_since, n_users)."""
    from ray.data.aggregate import Sum

    WEEK_US = 7 * 86_400_000_000

    ds = _read_events(sf_dir, ["ts", "user_id"])
    ubk = _user_buckets(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        week = pc.divide(
            pc.cast(t["ts"].cast(pa.timestamp("us")), pa.int64()), WEEK_US
        )
        tab = pa.table(
            {
                "user_id": uid,
                "week": pc.cast(week, pa.int64()),
                "ub": pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32()),
            }
        )
        # batch-local (user, week) combine, arrow out for the shuffle
        return pa.TableGroupBy(tab, ["user_id", "week", "ub"]).aggregate([])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uw = g[["user_id", "week"]].drop_duplicates()
        cohort = uw.groupby("user_id")["week"].min().rename("cohort_week")
        m = uw.merge(cohort, left_on="user_id", right_index=True)
        out = (
            m.assign(weeks_since=m["week"] - m["cohort_week"])
            .groupby(["cohort_week", "weeks_since"])
            .size()
            .rename("partial_n")
            .reset_index()
        )
        return out.astype(
            {"cohort_week": "int64", "weeks_since": "int64", "partial_n": "int64"}
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["cohort_week", "weeks_since"])
        .aggregate(Sum("partial_n", alias_name="n_users"))
    )


COHORT_RETENTION_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 604800000000 AS week
  FROM events
), cohort AS (
  SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
)
SELECT cohort.cohort_week,
       uw.week - cohort.cohort_week AS weeks_since,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM uw JOIN cohort ON uw.user_id = cohort.user_id
GROUP BY cohort.cohort_week, weeks_since
"""


def events_prior_window(sf_dir: str) -> Dataset:
    """Per-event sliding-window RANGE self-join: for every event, how many
    events the same user produced in the preceding hour
    (``ts - 1h <= other.ts < ts`` — strictly-before, so simultaneous events
    don't count each other).  Unlike ``events_hopping`` the window slides
    per ROW, which SQL expresses as a range self-join; here it is one
    shuffle (user-bucket groupby) + a fully vectorized in-bucket kernel:
    each user's sorted timestamps are offset onto a disjoint int64 keyline
    (user_rank * span_padding + ts_norm) so ONE pair of
    ``np.searchsorted`` calls answers every row's window count at once —
    no per-user Python loop.  Output: (event_id, user_id, n_prior_1h)."""
    import numpy as np

    window_us = 3_600 * 1_000_000

    ds = _read_events(sf_dir, ["event_id", "ts", "user_id"])
    ubk = _user_buckets(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        # arrow out: the user-bucket co-location shuffle sorts these
        # blocks, and pandas blocks pay ~13x (BASELINE block-format note)
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        # normalize to us regardless of the parquet timestamp resolution
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        ts_norm = ts - ts.min()
        uid = g["user_id"].to_numpy()
        # dense per-bucket user rank -> disjoint keyline per user
        urank = pd.factorize(uid)[0].astype("int64")
        stride = int(ts_norm.max()) + 2 * window_us + 2
        key = urank * stride + ts_norm
        n = np.searchsorted(key, key, side="left") - np.searchsorted(
            key, key - window_us, side="left"
        )
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64").values,
                "user_id": g["user_id"].astype("int64").values,
                "n_prior_1h": n.astype("int64"),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
    )


EVENTS_PRIOR_WINDOW_SQL = """
SELECT e1.event_id, e1.user_id,
       CAST(COUNT(e2.event_id) AS BIGINT) AS n_prior_1h
FROM events e1
LEFT JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts >= e1.ts - INTERVAL 1 HOUR
 AND e2.ts <  e1.ts
GROUP BY e1.event_id, e1.user_id
"""


# -- semi-structured: JSON property extraction ------------------------------

def props_extract_stats(sf_dir: str) -> "object":
    """Parse the ``props`` JSON payload and aggregate the extracted field
    per event type — the semi-structured-column pattern (the reference
    stores free-form attribute dicts as JSON payloads the same way,
    reference: src/indu_doc/god.py attribute maps).  Extraction is ONE
    vectorized ``pc.extract_regex`` kernel per batch (no per-row
    json.loads — at 100 TB the regex kernel is ~10× cheaper and the
    payload shape is fixed); rows whose payload lacks the field drop out
    as nulls.  Partials are per-batch ≤5-row aggregates, so the final
    groupby exchanges a handful of rows per block."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Max, Sum

    ds = _read_events(sf_dir, ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["props"], r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        sub = pa.table({"event_type": t["event_type"], "k": k}).filter(
            pc.is_valid(k)
        )
        return (
            sub.group_by(["event_type"])
            .aggregate([("k", "sum"), ("k", "max"), ("k", "count")])
            .rename_columns(["event_type", "sum_k", "max_k", "n_k"])
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("sum_k", alias_name="sum_k"),
            Max("max_k", alias_name="max_k"),
            Sum("n_k", alias_name="n_k"),
        )
        .to_pandas()  # ≤5 event types
    )
    for c in ("sum_k", "max_k", "n_k"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


PROPS_EXTRACT_SQL = """
SELECT event_type,
       CAST(SUM(CAST(NULLIF(regexp_extract(props, '"k":\\s*(\\d+)', 1), '') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(NULLIF(regexp_extract(props, '"k":\\s*(\\d+)', 1), '') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(COUNT(NULLIF(regexp_extract(props, '"k":\\s*(\\d+)', 1), '')) AS BIGINT) AS n_k
FROM events
WHERE props IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


# -- sequence mining: event-type transition matrix --------------------------

def event_transitions(sf_dir: str) -> "object":
    """First-order Markov transition counts over each user's time-ordered
    event stream (sequence-bigram mining; the funnel's unordered cousin).
    Users co-locate by the derived user bucket; ONE vectorized kernel per
    bucket sorts (user, ts, event_id) and pairs each event with its
    predecessor via ``groupby().shift()`` — no per-user Python.  Pair
    partials pre-combine per bucket (≤|types|² rows), so the final groupby
    exchanges a handful of rows per bucket.  Timestamps normalize to
    int64 us BEFORE pandas (ns-promotion gotcha).  Output:
    (from_type, to_type, n) — ≤25 rows."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    nb = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, nb - 1), pa.int32()),
                "user_id": uid,
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "event_type": t["event_type"],
                "ts_us": pc.cast(t["ts"].cast(pa.timestamp("us")), pa.int64()),
            }
        )

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"])
        prev = g.groupby("user_id")["event_type"].shift(1)
        keep = prev.notna()
        agg = (
            pd.DataFrame(
                {"from_type": prev[keep], "to_type": g.loc[keep, "event_type"]}
            )
            .groupby(["from_type", "to_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        agg["n"] = agg["n"].astype("int64")
        return agg

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(transitions, batch_format="pandas")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= |event types|^2 rows
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["from_type", "to_type"]).reset_index(drop=True)


EVENT_TRANSITIONS_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type AS from_type, event_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY from_type, to_type
"""


def value_outliers(sf_dir: str) -> "object":
    """Two-pass z-score outlier detection per event type — the canonical
    distributed data-cleaning shape: pass 1 folds each batch to one row of
    per-type integer moment sums (n, Σx, Σx² in c4 units), the driver adds
    them as arbitrary-precision Python ints and derives EXACT integer cut
    points for |x·n − Σx| > 2·sqrt(n·Σx² − Σx²) via ``math.isqrt``
    (x ≥ ceil((S+r+1)/n) or x ≤ floor((S−r−1)/n) with r = isqrt(4D) is
    exactly equivalent to the squared inequality — no float sqrt at any
    scale, no int64 overflow: per-row compares stay in int64 against the
    precomputed cut points).  Pass 2 is a streaming filter + count/sum per
    type.  The oracle states the squared inequality directly in HUGEINT.
    Output: (event_type, n, n_out, sum_out_c4)."""
    import math

    import pyarrow as pa
    import pyarrow.compute as pc

    def _c4(col):
        return pc.cast(pc.round(pc.multiply(col, 10_000.0)), pa.int64())

    ds = _read_events(sf_dir, ["event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        x = _c4(t["value"])
        folded = pa.table(
            {
                "event_type": t["event_type"],
                "x": x,
                "xx": pc.multiply(x, x),
            }
        )
        g = pa.TableGroupBy(folded, "event_type").aggregate(
            [("x", "sum"), ("xx", "sum"), ([], "count_all")]
        )
        return g

    parts = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    cuts: dict[str, tuple[int, int, int]] = {}
    agg = parts.groupby("event_type")
    for et, g in agg:
        # big-int exact: second moments overflow int64 sums at extreme scale
        n = sum(int(v) for v in g["count_all"])
        s = sum(int(v) for v in g["x_sum"])
        q = sum(int(v) for v in g["xx_sum"])
        d = n * q - s * s
        r = math.isqrt(4 * d)
        hi = -(-(s + r + 1) // n)  # ceil
        lo = (s - r - 1) // n      # floor
        cuts[str(et)] = (lo, hi, n)

    types = sorted(cuts)
    lo_arr = {t: cuts[t][0] for t in types}
    hi_arr = {t: cuts[t][1] for t in types}

    def flag(t: pa.Table) -> pa.Table:
        x = _c4(t["value"])
        et = t["event_type"]
        lo = pc.take(
            pa.array([lo_arr[k] for k in types], pa.int64()),
            pc.index_in(et, value_set=pa.array(types)),
        )
        hi = pc.take(
            pa.array([hi_arr[k] for k in types], pa.int64()),
            pc.index_in(et, value_set=pa.array(types)),
        )
        out = pc.or_(pc.greater_equal(x, hi), pc.less_equal(x, lo))
        sub = pa.table({"event_type": et, "x": x}).filter(out)
        g = pa.TableGroupBy(sub, "event_type").aggregate(
            [("x", "sum"), ([], "count_all")]
        )
        return g

    import pandas as pd

    flat = ds.map_batches(flag, batch_format="pyarrow").to_pandas()
    rows = []
    for et in types:
        g = flat[flat["event_type"] == et]
        rows.append(
            {
                "event_type": et,
                "n": cuts[et][2],
                "n_out": int(g["count_all"].sum()),
                "sum_out_c4": int(g["x_sum"].sum()),
            }
        )
    return pd.DataFrame(rows).astype(
        {"n": "int64", "n_out": "int64", "sum_out_c4": "int64"}
    )


VALUE_OUTLIERS_SQL = """
WITH x AS (
  SELECT event_type, CAST(ROUND(value*10000) AS BIGINT) AS x
  FROM events),
m AS (
  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(x AS HUGEINT)) AS s, SUM(CAST(x AS HUGEINT) * x) AS q
  FROM x GROUP BY event_type)
SELECT m.event_type, CAST(n AS BIGINT) AS n,
       CAST(COALESCE(SUM(CASE WHEN (CAST(x.x AS HUGEINT)*n - s)
                                   * (CAST(x.x AS HUGEINT)*n - s)
                                   > 4*(n*q - s*s) THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_out,
       CAST(COALESCE(SUM(CASE WHEN (CAST(x.x AS HUGEINT)*n - s)
                                   * (CAST(x.x AS HUGEINT)*n - s)
                                   > 4*(n*q - s*s) THEN x.x ELSE 0 END), 0)
            AS BIGINT) AS sum_out_c4
FROM m JOIN x ON x.event_type = m.event_type
GROUP BY m.event_type, n
ORDER BY m.event_type
"""


def latest_event_per_user(sf_dir: str) -> Dataset:
    """CDC-style last-value compaction: each user's LATEST event (ts DESC,
    event_id DESC tie-break) — the upsert-merge primitive a change-stream
    consumer runs to materialize current state.  One user-bucket
    co-location; the in-bucket kernel is a vectorized sort + head-per-user
    (never a per-user Python call).  Output: (user_id, event_type, ts_us,
    value_c4)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    nb = _user_buckets(sf_dir)
    ds = _read_events(
        sf_dir, ["event_id", "ts", "user_id", "event_type", "value"]
    )

    def keyed(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        u = df["user_id"].astype("int64")
        return pd.DataFrame(
            {
                "ub": (u % nb).astype("int32"),
                "user_id": u,
                "event_id": df["event_id"].astype("int64"),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "event_type": df["event_type"].astype("object"),
                "value_c4": (df["value"] * 10_000).round().astype("int64"),
            }
        )

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "ts_us", "event_id"], ascending=[True, False, False]
        ).drop_duplicates("user_id")
        return g[["user_id", "event_type", "ts_us", "value_c4"]].reset_index(
            drop=True
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(latest, batch_format="pandas")
        .sort("user_id")
    )


LATEST_EVENT_SQL = """
SELECT user_id, event_type,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       CAST(ROUND(value*10000) AS BIGINT) AS value_c4
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
  FROM events)
WHERE rk = 1
ORDER BY user_id
"""


def first_touch_attribution(sf_dir: str) -> Dataset:
    """Marketing-style first-touch attribution over session windows: every
    session (same 30-min gap rule as ``sessionize``) is attributed to the
    event_type of its FIRST event, and the session's total value rides to
    that channel.  One user-bucket co-location (sessions never span
    users); the in-bucket kernel computes session ids, first-event
    channels, and per-session value sums in three vectorized passes and
    emits ≤|event_types| partial rows per bucket; a tiny groupby folds.
    Value is floored to integer cents (FLOOR(value*100): floor of the
    identical float64 product on both sides — no rounding-tie channel).
    Output: (event_type, n_sessions, total_value_c2)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])
    ubk = _user_buckets(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32()),
                "user_id": uid,
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "ts_us": pc.cast(t["ts"].cast(pa.timestamp("us")), pa.int64()),
                "event_type": t["event_type"],
                "value_c2": pc.cast(
                    pc.floor(pc.multiply(t["value"], 100.0)), pa.int64()
                ),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts_us", "event_id"])
        ts = g["ts_us"]
        same_user = g["user_id"].eq(g["user_id"].shift())
        new_session = (ts.diff() > SESSION_GAP_US) & same_user
        sid = (new_session | ~same_user).cumsum()
        f = pd.DataFrame(
            {
                "sid": sid.values,
                "event_type": g["event_type"].values,
                "value_c2": g["value_c2"].values,
            }
        )
        per_s = f.groupby("sid").agg(
            channel=("event_type", "first"),  # frame sorted: first = first touch
            v=("value_c2", "sum"),
        )
        out = per_s.groupby("channel", as_index=False).agg(
            n_sessions=("v", "size"), total_value_c2=("v", "sum")
        )
        return pa.table(
            {
                "event_type": pa.array(out["channel"].astype(str).values),
                "n_sessions": pa.array(out["n_sessions"].astype("int64").values),
                "total_value_c2": pa.array(
                    out["total_value_c2"].astype("int64").values
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n_sessions", alias_name="n_sessions"),
            Sum("total_value_c2", alias_name="total_value_c2"),
        )
        .sort("event_type")
    )


FIRST_TOUCH_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(FLOOR(value*100) AS BIGINT) AS value_c2,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, event_id, event_type, value_c2,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM marked
), per_session AS (
  SELECT user_id, sid,
         FIRST(event_type ORDER BY ts, event_id) AS channel,
         SUM(value_c2) AS v
  FROM sessions GROUP BY user_id, sid
)
SELECT channel AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(v) AS BIGINT) AS total_value_c2
FROM per_session GROUP BY channel ORDER BY event_type
"""


def late_event_rates(sf_dir: str, lateness_us: int = 600_000_000) -> "object":
    """Streaming watermark / late-data accounting — the semantics the
    reference never needed (SURVEY §2.8) restated exactly: events arrive
    in a deterministic md5 permutation of ``event_id`` (the self-contained
    network-reordering analogue, same spirit as decontaminate's benchmark
    carve), the watermark is the running max event-time over the arrival
    stream, and an event is LATE when its event-time sits more than
    ``lateness_us`` behind the watermark at its arrival.  The running max
    is a distributed PREFIX-MAX scan (the ``pack_bins`` prefix-sum shape):
    arrival-order buckets are CONTIGUOUS md5-prefix ranges, so pass 1
    folds per-bucket max event-times to the driver (O(buckets) state),
    the exclusive prefix-max per bucket broadcasts back, and pass 2 runs
    one vectorized in-bucket scan.  Output: (event_type, n_late, n_total)."""
    import numpy as np

    ds = _read_events(sf_dir, ["event_id", "ts", "event_type"])
    nb = _user_buckets(sf_dir)  # same corpus-derived bucket budget
    shift = 64 - (nb.bit_length() - 1)

    def _h64(ids: np.ndarray) -> np.ndarray:
        import hashlib

        return np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(str(int(e)).encode()).digest()[:8], "big"
                )
                for e in ids
            ),
            dtype=np.uint64,
            count=len(ids),
        )

    def keyed(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["event_id"], pa.int64()).to_numpy()
        h = _h64(ids)
        return pa.table(
            {
                "ab": pa.array((h >> np.uint64(shift)).astype("int64")),
                "h": pa.array(h.view(np.int64)),  # same order as uint64? no —
                # stored only for in-bucket ordering, compared as uint64 below
                "event_id": pa.array(ids),
                "ts_us": pc.cast(t["ts"].cast(pa.timestamp("us")), pa.int64()),
                "event_type": t["event_type"],
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    # pass 1: per-bucket max event-time -> exclusive prefix max on the driver
    def bucket_max(t: pa.Table) -> pa.Table:
        folded = pa.table({"ab": t["ab"], "ts_us": t["ts_us"]})
        return pa.TableGroupBy(folded, "ab").aggregate([("ts_us", "max")]
            ).rename_columns(["ab", "ts_us"])

    bm = (
        keyed_ds.map_batches(bucket_max, batch_format="pyarrow")
        .to_pandas()  # ≤ buckets·blocks rows
        .groupby("ab")["ts_us"].max().sort_index()
    )
    prefix = bm.cummax().shift(1)  # exclusive: max over strictly-lower buckets
    offsets = {int(a): (None if pd.isna(v) else int(v)) for a, v in prefix.items()}
    import ray as _ray

    off_ref = _ray.put(offsets)

    # pass 2: in-bucket running max (shifted: watermark excludes self)
    def scan(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _r

        offs = _r.get(off_ref)
        g = g.copy()
        g["hu"] = g["h"].to_numpy().astype("int64").view("uint64")
        g = g.sort_values(["hu", "event_id"])
        run = g["ts_us"].cummax().shift(1)
        off = offs.get(int(g["ab"].iloc[0]))
        if off is not None:
            run = run.fillna(off).clip(lower=off)
        late = g["ts_us"] < run - lateness_us
        out = pd.DataFrame(
            {"event_type": g["event_type"].values, "late": late.astype("int64").values}
        ).groupby("event_type", as_index=False).agg(
            n_late=("late", "sum"), n_total=("late", "size")
        )
        return out  # ≤|event_types| rows per bucket

    return (
        keyed_ds.groupby("ab")
        .map_groups(scan, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", as_index=False)[["n_late", "n_total"]]
        .sum()
        .astype({"n_late": "int64", "n_total": "int64"})
        .sort_values("event_type")
        .reset_index(drop=True)
    )


LATE_EVENT_RATES_SQL = """
WITH arr AS (
  SELECT event_type, epoch_us(ts) AS ts_us,
         MAX(epoch_us(ts)) OVER (
             ORDER BY CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 16))
                           AS UBIGINT), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN ts_us < wm - 600000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(COUNT(*) AS BIGINT) AS n_total
FROM arr GROUP BY event_type ORDER BY event_type
"""


def ewma_user_value(sf_dir: str) -> Dataset:
    """Per-user EWMA (alpha = 1/2) over the time-ordered event values —
    the stateful sequential scan a feature pipeline keeps per entity
    (fraud velocity scores, engagement decay).  The recurrence
    e_t = trunc((e_{t-1} + v_t) / 2) is NONLINEAR under integer
    truncation, so unlike running_total it cannot collapse into a cumsum:
    the in-bucket kernel walks each user's sequence once (parallel across
    users/buckets — the per-key scan is inherently sequential, the corpus
    isn't).  Integer c4 units end-to-end; truncation toward zero mirrors
    DuckDB's ``//`` exactly (values are sign-free here, but the helper is
    sign-correct anyway).  One user-bucket co-location; full series out:
    (user_id, seq, ewma_c4)."""
    import numpy as np
    import pyarrow as pa

    nb = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def keyed(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        u = df["user_id"].astype("int64")
        return pd.DataFrame(
            {
                "ub": (u % nb).astype("int32"),
                "user_id": u,
                "event_id": df["event_id"].astype("int64"),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "value_c4": (df["value"] * 10_000).round().astype("int64"),
            }
        )

    def _trunc_half(q: int) -> int:
        return q // 2 if q >= 0 else -((-q) // 2)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"]).reset_index(drop=True)
        users = g["user_id"].to_numpy(np.int64)
        vals = g["value_c4"].to_numpy(np.int64)
        out = np.empty(len(g), np.int64)
        seq = np.empty(len(g), np.int64)
        start = np.concatenate(([True], users[1:] != users[:-1]))
        e = 0
        s = 0
        for i in range(len(g)):
            if start[i]:
                e = int(vals[i])
                s = 1
            else:
                e = _trunc_half(e + int(vals[i]))
                s += 1
            out[i] = e
            seq[i] = s
        return pd.DataFrame(
            {"user_id": users, "seq": seq, "ewma_c4": out}
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(scan, batch_format="pandas")
        .sort(["user_id", "seq"])
    )


EWMA_USER_VALUE_SQL = """
WITH RECURSIVE seq AS (
  SELECT user_id,
         CAST(ROUND(value*10000) AS BIGINT) AS v_c4,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), rec AS (
  SELECT user_id, rn, v_c4 AS e FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, (r.e + s.v_c4) // 2
  FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id, CAST(rn AS BIGINT) AS seq, CAST(e AS BIGINT) AS ewma_c4
FROM rec
ORDER BY user_id, seq
"""


def scd2_intervals(sf_dir: str) -> Dataset:
    """Slowly-changing-dimension (type-2) compaction: collapse each user's
    consecutive same-``event_type`` runs into validity intervals
    (valid_from = run start, valid_to = next run's start, -1 = current) —
    the history-table build a warehouse runs over a change stream.  One
    user-bucket co-location; the kernel is vectorized shift/compare over
    the whole bucket (change detection + per-user LEAD), never a per-user
    Python call.  Output: (user_id, event_type, valid_from_us,
    valid_to_us)."""
    import numpy as np
    import pyarrow as pa

    nb = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def keyed(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, nb - 1), pa.int32())
        )

    def compact(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        ts = g["ts"].astype("datetime64[us]").astype("int64")
        same_user = g["user_id"].eq(g["user_id"].shift())
        change = ~(same_user & g["event_type"].eq(g["event_type"].shift()))
        s = pd.DataFrame(
            {
                "user_id": g.loc[change, "user_id"].astype("int64").values,
                "event_type": g.loc[change, "event_type"].values,
                "valid_from_us": ts[change].values,
            }
        )
        nxt = s["valid_from_us"].shift(-1)
        same_next = s["user_id"].eq(s["user_id"].shift(-1))
        s["valid_to_us"] = (
            nxt.where(same_next, -1).fillna(-1).astype("int64")
        )
        return s

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(compact, batch_format="pandas")
        .sort(["user_id", "valid_from_us"])
    )


SCD2_INTERVALS_SQL = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_t
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), starts AS (
  SELECT user_id, event_type, ts, event_id FROM o
  WHERE prev_t IS NULL OR prev_t != event_type
)
SELECT user_id, event_type,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       CAST(COALESCE(epoch_us(lead(ts) OVER (
            PARTITION BY user_id ORDER BY ts, event_id)), -1) AS BIGINT)
         AS valid_to_us
FROM starts
ORDER BY user_id, valid_from_us
"""


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


def session_overlap(sf_dir: str) -> Dataset:
    """Interval-overlap join at session grain: for every user session
    (30-min-gap windows, closed intervals) the number of OTHER sessions —
    any user — it overlaps in time (the concurrency profile a capacity /
    ab-test analysis reads).  The naive shape is an O(n^2) inequality
    self-join; this uses the rank identity ``overlaps(i) = #{starts <=
    end_i} - #{ends < start_i} - 1`` (valid because ends < start_i implies
    the whole interval precedes i), turning the join into two global RANK
    lookups.  Ranks are computed hierarchically, the prefix-scan pattern:
    session endpoints and probes co-locate into contiguous time buckets
    (span/width from parquet metadata, count derived via ``n_buckets``);
    each bucket emits vectorized in-bucket ranks (searchsorted) plus its
    endpoint counts; the driver folds ONLY the O(buckets) counts into
    prefix offsets, broadcast back into a streaming adjust pass.  One
    endpoint exchange + one per-session sum — no all-to-all join, no
    corpus-sized driver state.  Output: (user_id, sess_n, n_overlap)."""
    import numpy as np

    from ._util import n_buckets

    path = f"{sf_dir}/events.parquet"
    ds = _read_events(sf_dir, ["event_id", "ts", "user_id"])
    ubk = _user_buckets(sf_dir)
    t0, t1 = _ts_bounds_us(path)
    import pyarrow.parquet as pq

    B = n_buckets(pq.read_metadata(path).num_rows)
    width = max(1, (t1 - t0) // B + 1)

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32())
        )

    def build_sessions(g: pd.DataFrame) -> pa.Table:
        # per-user sorted scan -> (user_id, sess_n, s_us, e_us); a user's
        # sessions never overlap each other (gaps > the window), so the
        # global count needs no same-user exclusion
        g = g.sort_values(["user_id", "ts", "event_id"])
        ts = g["ts"].astype("datetime64[us]").astype("int64")
        same_user = g["user_id"].eq(g["user_id"].shift())
        new_session = (ts.diff() > SESSION_GAP_US) & same_user
        sid = (new_session | ~same_user).cumsum()
        per = pd.DataFrame(
            {"user_id": g["user_id"].values, "sid": sid.values,
             "ts": ts.values}
        ).groupby(["user_id", "sid"], sort=True)["ts"].agg(["min", "max"])
        per = per.reset_index()
        sess_n = per.groupby("user_id").cumcount() + 1
        return pa.table(
            {
                "user_id": pa.array(per["user_id"].astype("int64").values),
                "sess_n": pa.array(sess_n.astype("int64").values),
                "s_us": pa.array(per["min"].astype("int64").values),
                "e_us": pa.array(per["max"].astype("int64").values),
            }
        )

    def emit_points(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy()
        sn = t.column("sess_n").to_numpy()
        s = t.column("s_us").to_numpy()
        e = t.column("e_us").to_numpy()
        tb_s = np.minimum((s - t0) // width, B - 1).astype(np.int32)
        tb_e = np.minimum((e - t0) // width, B - 1).astype(np.int32)
        neg = np.full(len(u), -1, dtype=np.int64)
        zero = np.zeros(len(u), dtype=np.int64)
        return pa.table(
            {
                "tb": pa.array(np.concatenate([tb_s, tb_e, tb_e, tb_s])),
                "kind": pa.array(
                    np.repeat(np.array([0, 1, 2, 3], np.int32), len(u))
                ),
                "x": pa.array(np.concatenate([s, e, e, s])),
                "user_id": pa.array(np.concatenate([neg, neg, u, u])),
                "sess_n": pa.array(np.concatenate([zero, zero, sn, sn])),
            }
        )

    def bucket_ranks(g: pd.DataFrame) -> pa.Table:
        starts = np.sort(g.loc[g["kind"] == 0, "x"].to_numpy())
        ends = np.sort(g.loc[g["kind"] == 1, "x"].to_numpy())
        p2 = g[g["kind"] == 2]
        p3 = g[g["kind"] == 3]
        tb = int(g["tb"].iloc[0])
        out_u = [p2["user_id"].to_numpy(), p3["user_id"].to_numpy(),
                 np.array([-1, -1], np.int64)]
        out_sn = [p2["sess_n"].to_numpy(), p3["sess_n"].to_numpy(),
                  np.array([0, 0], np.int64)]
        out_tb = [np.full(len(p2), tb, np.int32),
                  np.full(len(p3), tb, np.int32),
                  np.array([tb, tb], np.int32)]
        out_kind = [np.full(len(p2), 2, np.int32),
                    np.full(len(p3), 3, np.int32),
                    np.array([8, 9], np.int32)]
        out_val = [
            np.searchsorted(starts, p2["x"].to_numpy(), side="right"),
            -np.searchsorted(ends, p3["x"].to_numpy(), side="left"),
            np.array([len(starts), len(ends)], np.int64),
        ]
        return pa.table(
            {
                "user_id": pa.array(np.concatenate(out_u).astype(np.int64)),
                "sess_n": pa.array(np.concatenate(out_sn).astype(np.int64)),
                "tb": pa.array(np.concatenate(out_tb).astype(np.int32)),
                "kind": pa.array(np.concatenate(out_kind).astype(np.int32)),
                "val": pa.array(np.concatenate(out_val).astype(np.int64)),
            }
        )

    partials = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(build_sessions, batch_format="pandas")
        .map_batches(emit_points, batch_format="pyarrow")
        .groupby("tb")
        .map_groups(bucket_ranks, batch_format="pandas")
        .materialize()  # session-scale (4 rows/session + 2/bucket)
    )
    counts = partials.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("kind"), 8)),
        batch_format="pyarrow",
    ).to_pandas()  # O(buckets) rows only
    off_s = np.zeros(B + 1, np.int64)
    off_e = np.zeros(B + 1, np.int64)
    for _, row in counts.iterrows():
        (off_s if row["kind"] == 8 else off_e)[int(row["tb"]) + 1] += int(
            row["val"]
        )
    off_s = np.cumsum(off_s)
    off_e = np.cumsum(off_e)

    def adjust(t: pa.Table) -> pa.Table:
        tb = t.column("tb").to_numpy()
        kind = t.column("kind").to_numpy()
        val = t.column("val").to_numpy()
        adj = np.where(kind == 2, val + off_s[tb], val - off_e[tb])
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "sess_n": t.column("sess_n"),
                "val": pa.array(adj.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    def key_user(t: pa.Table) -> pa.Table:
        return t.append_column(
            "ub",
            pc.cast(pc.bit_wise_and(t["user_id"], ubk - 1), pa.int32()),
        )

    def finish(g: pd.DataFrame) -> pa.Table:
        # per-session sum INSIDE a user-bucket kernel: a direct groupby on
        # (user, sess_n) is session-count-proportional in groups, and this
        # Ray build's aggregate cost scales with the group count
        # (BASELINE session-5 finding)
        c = g.groupby(["user_id", "sess_n"], as_index=False)["val"].sum()
        return pa.table(
            {
                "user_id": pa.array(c["user_id"].to_numpy("int64")),
                "sess_n": pa.array(c["sess_n"].to_numpy("int64")),
                "n_overlap": pa.array(
                    (c["val"] - 1).to_numpy("int64")
                ),
            }
        )

    return (
        partials.map_batches(
            lambda t: t.filter(pc.less(t.column("kind"), 8)),
            batch_format="pyarrow",
        )
        .map_batches(adjust, batch_format="pyarrow")
        .map_batches(key_user, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(finish, batch_format="pandas")
        .sort(["user_id", "sess_n"])
    )


SESSION_OVERLAP_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM marked
), sess AS (
  SELECT user_id, sid, epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us
  FROM numbered GROUP BY user_id, sid
), sess2 AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY s_us) AS sess_n,
         s_us, e_us
  FROM sess
)
SELECT a.user_id, CAST(a.sess_n AS BIGINT) AS sess_n,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_overlap
FROM sess2 a JOIN sess2 b ON b.s_us <= a.e_us AND b.e_us >= a.s_us
GROUP BY a.user_id, a.sess_n
ORDER BY a.user_id, a.sess_n
"""


# -- growth accounting: cumulative distinct users ----------------------------

def cumulative_unique_users(sf_dir: str) -> "object":
    """Cumulative distinct users per day — the growth curve.  A naive
    per-day COUNT(DISTINCT) over expanding windows rescans the corpus per
    day; the scalable identity is ``cum_users(d) = #{users whose FIRST
    event day <= d}``.  Per-user mins reduce INSIDE a user-bucket kernel
    (bounded groups — never a corpus-proportional-group Dataset.groupby,
    the BASELINE session-5 finding), which emits O(days) new-user-count
    partials; the driver folds days and cumsums against the observed-day
    spine.  One bucketed co-location + two O(days) folds.  Output:
    (day_bucket, cum_users)."""
    import pandas as pd

    from ray.data.aggregate import Count, Sum

    ubk = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["ts", "user_id"])

    def day_user(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        uid = pc.cast(t["user_id"], pa.int64())
        folded = pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32()),
                "user_id": uid,
                "day": day,
            }
        )
        # map-side partial min per user: the shuffle ships one row per
        # (user, batch), not per event
        return pa.TableGroupBy(folded, ["ub", "user_id"]).aggregate(
            [("day", "min")]
        ).rename_columns(["ub", "user_id", "day"])

    def bucket_new_users(g: pd.DataFrame) -> pa.Table:
        d0 = g.groupby("user_id")["day"].min()
        c = d0.value_counts().sort_index()
        return pa.table(
            {
                "d0": pa.array(c.index.to_numpy("int64")),
                "n": pa.array(c.to_numpy("int64")),
            }
        )

    new_per_day = (
        ds.map_batches(day_user, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(bucket_new_users, batch_format="pandas")
        .groupby("d0")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(days)
    )

    def day_only(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        return pa.TableGroupBy(pa.table({"day": day}), "day").aggregate(
            [([], "count_all")]
        )

    days = (
        ds.map_batches(day_only, batch_format="pyarrow")
        .groupby("day").aggregate(Count(alias_name="_c"))
        .to_pandas()  # O(days)
    )
    spine = days[["day"]].sort_values("day").reset_index(drop=True)
    merged = spine.merge(
        new_per_day.rename(columns={"d0": "day"}), on="day", how="left"
    )
    out = pd.DataFrame(
        {
            "day_bucket": merged["day"].astype("int64"),
            "cum_users": merged["n"].fillna(0).cumsum().astype("int64"),
        }
    )
    return out


CUMULATIVE_UNIQUE_USERS_SQL = """
WITH fs AS (
  SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS d0
  FROM events GROUP BY user_id
), days AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day_bucket FROM events
)
SELECT day_bucket,
       CAST((SELECT COUNT(*) FROM fs WHERE fs.d0 <= days.day_bucket)
            AS BIGINT) AS cum_users
FROM days ORDER BY day_bucket
"""


# -- gap-filled time series (dense hourly spine) ------------------------------

def events_hourly_dense(sf_dir: str) -> "object":
    """Gap-filled hourly event counts: every hour between the corpus' first
    and last event, zero rows included — the dense spine a time-series
    model trains on (sparse groupby output silently drops quiet hours).
    The spine bounds come from parquet row-group statistics (metadata, no
    scan); counts fold map-side per batch, the groupby output is O(hours)
    and the reindex against the spine happens on the driver (the spine is
    time-span-sized, corpus-size free).  Output: (hour_bucket, n_events)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    path = f"{sf_dir}/events.parquet"
    t0, t1 = _ts_bounds_us(path)
    h0, h1 = t0 // 3_600_000_000, t1 // 3_600_000_000
    ds = _read_events(sf_dir, ["ts"])

    def hourly(t: pa.Table) -> pa.Table:
        hour = pc.divide(pc.cast(t["ts"], pa.int64()), 3_600_000_000)
        return pa.TableGroupBy(pa.table({"hour": hour}), "hour").aggregate(
            [([], "count_all")]
        )

    counts = (
        ds.map_batches(hourly, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()  # O(hours)
    )
    spine = pd.DataFrame({"hour_bucket": np.arange(h0, h1 + 1, dtype=np.int64)})
    merged = spine.merge(
        counts.rename(columns={"hour": "hour_bucket"}), on="hour_bucket",
        how="left",
    )
    merged["n_events"] = merged["n"].fillna(0).astype("int64")
    return merged[["hour_bucket", "n_events"]]


EVENTS_HOURLY_DENSE_SQL = """
WITH bounds AS (
  SELECT epoch_us(MIN(ts)) // 3600000000 AS h0,
         epoch_us(MAX(ts)) // 3600000000 AS h1
  FROM events
), spine AS (
  SELECT unnest(range(h0, h1 + 1)) AS hour_bucket FROM bounds
), c AS (
  SELECT epoch_us(ts) // 3600000000 AS hour_bucket, COUNT(*) AS n
  FROM events GROUP BY 1
)
SELECT spine.hour_bucket, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM spine LEFT JOIN c USING (hour_bucket)
ORDER BY spine.hour_bucket
"""


# -- sequence mining: top session paths --------------------------------------

PATH_PREFIX_LEN = 4
TOP_PATHS_K = 20


def top_paths(sf_dir: str) -> Dataset:
    """Top-20 session paths: the ordered sequence of the first 4 event
    types in each 30-min-gap session, counted across the corpus — the
    navigation-pattern mining behind funnel design.  Sessions build inside
    the user-bucket co-location (one vectorized pass per bucket); the
    kernel pre-counts ITS paths so the exchange ships (path, n) partials,
    bounded by the path domain per bucket, never per-session rows; one
    small groupby folds them and the top-k is a sort+limit over the path
    domain.  Ties at the k boundary break on path text, so the cut is
    deterministic.  Output: (path, n)."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    ubk = _user_buckets(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32())
        )

    def bucket_paths(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"])
        ts = g["ts"].astype("datetime64[us]").astype("int64")
        same_user = g["user_id"].eq(g["user_id"].shift())
        new_session = (ts.diff() > SESSION_GAP_US) & same_user
        sid = (new_session | ~same_user).cumsum()
        rn = g.groupby(sid.values).cumcount()
        head = g[rn < PATH_PREFIX_LEN]
        paths = (
            head.groupby(sid.values[rn < PATH_PREFIX_LEN], sort=False)[
                "event_type"
            ].agg(">".join)
        )
        counts = paths.value_counts()
        return pa.table(
            {
                "path": pa.array(counts.index.astype(str), pa.string()),
                "n": pa.array(counts.values.astype("int64"), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(bucket_paths, batch_format="pandas")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "path"], descending=[True, False])
        .limit(TOP_PATHS_K)
    )


TOP_PATHS_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM marked
), ranked AS (
  SELECT user_id, sid, event_type, ts, event_id,
         row_number() OVER (
           PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
  FROM numbered
), paths AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= {PATH_PREFIX_LEN}
  GROUP BY user_id, sid
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n
FROM paths GROUP BY path
ORDER BY n DESC, path
LIMIT {TOP_PATHS_K}
"""


# -- grouped mode: modal event type per user ----------------------------------

def user_modal_event(sf_dir: str) -> Dataset:
    """Each user's most frequent event type (count DESC, type ASC on ties)
    — the grouped-MODE holistic aggregate.  Never co-locates raw rows by
    user: batches fold to (user, type, n) partials map-side, one groupby
    sums them, and the argmax runs vectorized inside a user-bucket
    co-location of the TINY (user x type) domain.  Output: (user_id,
    modal_type, n)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["user_id", "event_type"])
    ubk = _user_buckets(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        folded = pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "event_type": t["event_type"],
            }
        )
        agg = pa.TableGroupBy(folded, ["user_id", "event_type"]).aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["user_id", "event_type", "n"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32())
        )

    def argmax(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True])
        top = g.groupby("user_id", sort=True).head(1)
        return pa.table(
            {
                "user_id": pa.array(top["user_id"].astype("int64").values),
                "modal_type": pa.array(
                    top["event_type"].astype(str).values, pa.string()
                ),
                "n": pa.array(top["n"].astype("int64").values),
            }
        )

    return (
        counts.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(argmax, batch_format="pandas")
        .sort("user_id")
    )


USER_MODAL_EVENT_SQL = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
)
SELECT user_id, event_type AS modal_type, CAST(n AS BIGINT) AS n
FROM (SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
      FROM c)
WHERE rk = 1
ORDER BY user_id
"""


# -- equi-width value histogram -----------------------------------------------

HIST_BIN_C2 = 5_000  # 50.00 per bin over value's [0, ~500] range


def value_histogram(sf_dir: str) -> Dataset:
    """Equi-width histogram of ``value`` per event type (cents / 5000 per
    bin) — the profiling primitive behind every distribution dashboard.
    Pure combiner shape: each batch folds to (type, bin, n) partials, one
    tiny groupby sums them.  Output: (event_type, bin, n)."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        from .sketches import _floor_bucket

        v = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        # FLOOR bucket (not pc.divide's trunc): the DuckDB // oracle floors,
        # and the two disagree for negative values
        folded = pa.table(
            {"event_type": t["event_type"], "bin": _floor_bucket(v, HIST_BIN_C2)}
        )
        agg = pa.TableGroupBy(folded, ["event_type", "bin"]).aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["event_type", "bin", "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["event_type", "bin"])
    )


# bin is FLOOR division (DuckDB's // truncates toward zero, which would
# give a double-width bin straddling zero on signed values): subtract the
# non-negative remainder first so the // is exact
VALUE_HISTOGRAM_SQL = f"""
WITH c AS (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS v FROM events)
SELECT event_type,
       (v - ((v % {HIST_BIN_C2}) + {HIST_BIN_C2}) % {HIST_BIN_C2}) // {HIST_BIN_C2} AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM c GROUP BY 1, 2 ORDER BY 1, 2
"""


# -- DAU / WAU stickiness ------------------------------------------------------

def dau_wau_stickiness(sf_dir: str) -> Dataset:
    """Product-analytics stickiness: per day, DAU, the trailing-7-day WAU
    (distinct users over the week ENDING that day) and DAU*1000//WAU.
    Both distinct counts reduce INSIDE one user-bucket co-location (a
    user's rows land in one bucket, so in-bucket distinct IS global
    distinct; bounded groups per the BASELINE session-5 groupby finding):
    the kernel dedups (user, day), counts its DAU partials, fans each
    user-day to the <=7 windows it supports and counts its WAU partials —
    only O(days) partial rows leave any kernel.  Windows clipped to days
    with events.  Output: (day_bucket, dau, wau, stickiness_permille)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    ubk = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["ts", "user_id"])

    def day_user(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        uid = pc.cast(t["user_id"], pa.int64())
        folded = pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32()),
                "user_id": uid,
                "day": day,
            }
        )
        return pa.TableGroupBy(folded, ["ub", "user_id", "day"]).aggregate(
            [([], "count_all")]
        ).drop_columns(["count_all"])

    def bucket_counts(g: pd.DataFrame) -> pa.Table:
        d = g[["user_id", "day"]].drop_duplicates()
        dau = d.groupby("day").size()
        u = d["user_id"].to_numpy("int64")
        dy = d["day"].to_numpy("int64")
        w = pd.DataFrame(
            {
                "user_id": np.repeat(u, 7),
                "wday": (dy[:, None] + np.arange(7)[None, :]).reshape(-1),
            }
        ).drop_duplicates()
        wau = w.groupby("wday").size()
        return pa.table(
            {
                "day": pa.array(
                    np.concatenate(
                        [dau.index.to_numpy("int64"),
                         wau.index.to_numpy("int64")]
                    )
                ),
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(len(dau), np.int8),
                         np.ones(len(wau), np.int8)]
                    )
                ),
                "n": pa.array(
                    np.concatenate(
                        [dau.to_numpy("int64"), wau.to_numpy("int64")]
                    )
                ),
            }
        )

    parts = (
        ds.map_batches(day_user, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(bucket_counts, batch_format="pandas")
        .groupby(["day", "kind"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(days) x 2
    )
    dau = parts[parts["kind"] == 0][["day", "n"]].rename(columns={"n": "dau"})
    wau = parts[parts["kind"] == 1][["day", "n"]].rename(columns={"n": "wau"})
    out = dau.merge(wau, on="day", how="left").sort_values("day")
    out = out.reset_index(drop=True)
    out["stickiness_permille"] = (
        out["dau"] * 1000 // out["wau"]
    ).astype("int64")
    out = out.rename(columns={"day": "day_bucket"})
    for c in ("day_bucket", "dau", "wau"):
        out[c] = out[c].astype("int64")
    return out[["day_bucket", "dau", "wau", "stickiness_permille"]]


DAU_WAU_STICKINESS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), dau AS (
  SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
), w AS (
  SELECT DISTINCT ud.user_id, ud.day + o.i AS wday
  FROM ud, range(0, 7) o(i)
), wau AS (
  SELECT wday, COUNT(*) AS wau FROM w GROUP BY wday
)
SELECT dau.day AS day_bucket, CAST(dau.dau AS BIGINT) AS dau,
       CAST(wau.wau AS BIGINT) AS wau,
       CAST(dau.dau * 1000 // wau.wau AS BIGINT) AS stickiness_permille
FROM dau JOIN wau ON wau.wday = dau.day
ORDER BY day_bucket
"""


# -- SCD2 point-in-interval enrichment lookup ---------------------------------

def event_state_lookup(sf_dir: str) -> Dataset:
    """The classic warehouse SCD2 lookup: enrich every event with the
    validity interval of its user's type-history that CONTAINS its
    timestamp (``scd2_intervals`` semantics: valid_from <= ts < valid_to,
    -1 = still current) — a keyed point-in-interval range join.  Intervals
    and probes share one user-bucket co-location; the kernel rebuilds the
    bucket's intervals from its own events (cheaper than shipping them
    twice) and resolves each event with a vectorized per-user searchsorted
    over run starts.  Output: (event_id, state_type, valid_from_us,
    valid_to_us)."""
    import numpy as np

    nb = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def keyed(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, nb - 1), pa.int32())
        )

    def lookup(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        ts = g["ts"].astype("datetime64[us]").astype("int64")
        same_user = g["user_id"].eq(g["user_id"].shift())
        change = ~(same_user & g["event_type"].eq(g["event_type"].shift()))
        # run index per event: each event belongs to the run started at the
        # latest change at-or-before it (rows are user-then-time sorted, so
        # a cumsum over change flags IS the run id)
        run = np.cumsum(change.values) - 1
        starts_ts = ts[change.values].to_numpy()
        starts_type = g.loc[change.values, "event_type"].to_numpy()
        run_user = g.loc[change.values, "user_id"].to_numpy()
        nxt = np.empty(len(starts_ts), dtype=np.int64)
        nxt[:-1] = starts_ts[1:]
        nxt[-1] = -1
        same_next = np.empty(len(starts_ts), dtype=bool)
        same_next[:-1] = run_user[1:] == run_user[:-1]
        same_next[-1] = False
        valid_to = np.where(same_next, nxt, -1)
        return pa.table(
            {
                "event_id": pa.array(g["event_id"].astype("int64").values),
                "state_type": pa.array(starts_type[run], pa.string()),
                "valid_from_us": pa.array(starts_ts[run], pa.int64()),
                "valid_to_us": pa.array(valid_to[run], pa.int64()),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(lookup, batch_format="pandas")
        .sort("event_id")
    )


# run-id equality join (not a ts-range predicate): membership is defined by
# EVENT ORDER (ts, event_id), so simultaneous-timestamp type changes — which
# produce zero-length intervals a BETWEEN join would skip — still resolve to
# the run the event belongs to, exactly as the kernel's cumsum does.
EVENT_STATE_LOOKUP_SQL = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w != event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT user_id, event_type, ts, event_id,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rid
  FROM o
), iv AS (
  SELECT user_id, rid, MIN(event_type) AS state_type,
         CAST(MIN(epoch_us(ts)) AS BIGINT) AS valid_from_us
  FROM runs GROUP BY user_id, rid
), iv2 AS (
  SELECT user_id, rid, state_type, valid_from_us,
         CAST(COALESCE(lead(valid_from_us) OVER (
             PARTITION BY user_id ORDER BY rid), -1) AS BIGINT)
           AS valid_to_us
  FROM iv
)
SELECT r.event_id, iv2.state_type, iv2.valid_from_us, iv2.valid_to_us
FROM runs r JOIN iv2 USING (user_id, rid)
ORDER BY r.event_id
"""


# -- incremental view maintenance ----------------------------------------------

def incremental_hourly_counts(sf_dir: str) -> Dataset:
    """Incremental aggregate maintenance (delta-refresh of a materialized
    view): yesterday's hourly-count STATE plus today's late-arriving delta
    (``event_id % 10 == 9`` plays the delta batch) merge into the refreshed
    view by summing per-key states — the base raw data is never rescanned
    at refresh time (here the state is built in the same call only because
    the demo owns no cross-run storage; ``pipelines.runner``'s manifests
    are the persistent analogue).  Count states are self-mergeable; the
    merge is a union + one bounded-domain groupby (hours x types).  The
    refreshed view must equal the from-scratch aggregate — that equality
    IS the oracle.  Output: (event_type, hour_bucket, n_events)."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["event_id", "ts", "event_type"])

    def split_partials(delta: bool):
        def f(t: pa.Table) -> pa.Table:
            eid = pc.cast(t["event_id"], pa.int64())
            is_delta = pc.equal(
                pc.subtract(eid, pc.multiply(pc.divide(eid, 10), 10)), 9
            )
            sub = t.filter(is_delta if delta else pc.invert(is_delta))
            hour = pc.divide(pc.cast(sub["ts"], pa.int64()), 3_600_000_000)
            folded = pa.table(
                {"event_type": sub["event_type"], "hour_bucket": hour}
            )
            agg = pa.TableGroupBy(
                folded, ["event_type", "hour_bucket"]
            ).aggregate([([], "count_all")])
            return agg.rename_columns(
                ["event_type", "hour_bucket", "n"]
            )

        return f

    base_state = (
        ds.map_batches(split_partials(False), batch_format="pyarrow")
        .groupby(["event_type", "hour_bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # "yesterday's" persisted view state
    )
    delta_state = (
        ds.map_batches(split_partials(True), batch_format="pyarrow")
        .groupby(["event_type", "hour_bucket"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return (
        base_state.union(delta_state)
        .groupby(["event_type", "hour_bucket"])
        .aggregate(Sum("n", alias_name="n_events"))
    )


INCREMENTAL_HOURLY_COUNTS_SQL = """
SELECT event_type,
       epoch_us(ts) // 3600000000 AS hour_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type, hour_bucket
"""


# -- distributed regression via sufficient statistics ---------------------------

def value_trend_per_type(sf_dir: str) -> "object":
    """Per-type OLS trend of ``value`` over time — distributed REGRESSION
    via sufficient statistics: each batch folds to (n, Σx, Σy, Σxy, Σxx)
    per type, one tiny groupby sums the moments, and the slope is the
    exact integer fraction ``(nΣxy − ΣxΣy) / (nΣxx − (Σx)²)`` — no
    residual pass, no row ever leaves its batch.  x = hours since the
    corpus start (bounds from parquet stats keep the products inside
    int64; the oracle does the same arithmetic in HUGEINT and casts
    back).  Output: (event_type, n, slope_num, slope_den)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    t0, _ = _ts_bounds_us(f"{sf_dir}/events.parquet")
    h0 = t0 // 3_600_000_000
    ds = _read_events(sf_dir, ["ts", "event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        x = pc.subtract(
            pc.divide(pc.cast(t["ts"], pa.int64()), 3_600_000_000), h0
        )
        y = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        folded = pa.table(
            {
                "event_type": t["event_type"],
                "n": pa.array([1] * t.num_rows, pa.int64()),
                "sx": x,
                "sy": y,
                "sxy": pc.multiply(x, y),
                "sxx": pc.multiply(x, x),
            }
        )
        return pa.TableGroupBy(folded, "event_type").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxy", "sum"), ("sxx", "sum")]
        ).rename_columns(["event_type", "n", "sx", "sy", "sxy", "sxx"])

    m = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
        )
        .to_pandas()  # O(|types|)
    )
    # final two products in PYTHON ints (object dtype): n is
    # corpus-proportional and sxy grows with hours^2 x value, so int64
    # products can wrap silently at large scale.  Exact arbitrary-precision
    # arithmetic here, then the int64 cast RAISES on overflow — the faithful
    # mirror of the oracle's HUGEINT math + BIGINT cast (which also errors
    # rather than wrapping).
    n_o, sx_o, sy_o = m["n"].astype(object), m["sx"].astype(object), m["sy"].astype(object)
    sxy_o, sxx_o = m["sxy"].astype(object), m["sxx"].astype(object)
    out = pd.DataFrame(
        {
            "event_type": m["event_type"].astype(str),
            "n": m["n"].astype("int64"),
            "slope_num": (n_o * sxy_o - sx_o * sy_o).astype("int64"),
            "slope_den": (n_o * sxx_o - sx_o * sx_o).astype("int64"),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


VALUE_TREND_PER_TYPE_SQL = """
WITH b AS (SELECT epoch_us(MIN(ts)) // 3600000000 AS h0 FROM events),
x AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 - h0 AS HUGEINT) AS x,
         CAST(CAST(ROUND(value*100) AS BIGINT) AS HUGEINT) AS y
  FROM events, b
), m AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*y) AS sxy, SUM(x*x) AS sxx
  FROM x GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
FROM m ORDER BY event_type
"""


# -- continuous-window range self-join (global trailing density) --------------

#: time-bucket width for the rank identity (us); window << bucket so most
#: probe pairs co-locate, and driver state is O(span / width)
_DENSITY_BUCKET_US = 4_096_000_000
_DENSITY_WINDOW_US = 300_000_000  # 5 minutes


def events_trailing_density(sf_dir: str) -> Dataset:
    """For every event: how many events (ANY user) fell in the continuous
    window ``[ts - 5min, ts)`` — the GLOBAL range self-join, at microsecond
    precision with non-aligned boundaries, so it does NOT decompose into
    pre-bucketed counts (contrast ``events_hourly``; the per-user variant
    is ``events_prior_window``).

    Rank identity, no global sort and no O(n·window) pair blowup:
    ``count[a,b) = n_before(b) − n_before(a)``, where ``n_before(x)`` =
    events with ts < x.  Pass 1 folds time-bucket histogram counts (driver
    holds the O(span/width) cumulative offsets).  Pass 2 co-locates each
    bucket's events with every PROBE point that falls in it (two probes
    per event: ts with +1, ts−W with −1 — probe points need not be event
    times); one vectorized searchsorted per bucket yields exact global
    ranks.  A final event-bucket co-location sums the two signed ranks per
    event.  Exchanges: 1 tiny groupby + 2 bounded co-locations.  Output:
    (event_id, n_prior_5m)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    from ._util import n_buckets

    ds = _read_events(sf_dir, ["event_id", "ts"])

    def hist(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64())
        folded = pa.table({"tb": pc.divide(ts, _DENSITY_BUCKET_US)})
        agg = pa.TableGroupBy(folded, "tb").aggregate([([], "count_all")])
        return agg.rename_columns(["tb", "n"])

    counts = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("tb")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(corpus span / bucket width)
        .sort_values("tb")
        .reset_index(drop=True)
    )
    # base(tb) = events in buckets strictly BELOW tb — valid for ANY tb,
    # including buckets no event touched (a ts−W probe can land in one)
    bucket_ids = counts["tb"].to_numpy("int64")
    bucket_ends = counts["n"].cumsum().to_numpy("int64")

    def _base(tb: int) -> int:
        i = int(np.searchsorted(bucket_ids, tb, side="left"))
        return int(bucket_ends[i - 1]) if i > 0 else 0

    def keyed(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64())
        eid = pc.cast(t["event_id"], pa.int64())
        n = t.num_rows
        lo = pc.subtract(ts, _DENSITY_WINDOW_US)
        # kind 0 = data row (an event time), kind 1 = probe row; ts values
        # are non-negative epoch-us so trunc == floor here
        data = pa.table(
            {
                "tb": pc.divide(ts, _DENSITY_BUCKET_US),
                "t": ts,
                "event_id": eid,
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
                "sign": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )
        hi_probe = pa.table(
            {
                "tb": pc.divide(ts, _DENSITY_BUCKET_US),
                "t": ts,
                "event_id": eid,
                "kind": pa.array(np.ones(n, dtype=np.int8)),
                "sign": pa.array(np.ones(n, dtype=np.int8)),
            }
        )
        lo_probe = pa.table(
            {
                "tb": pc.divide(lo, _DENSITY_BUCKET_US),
                "t": lo,
                "event_id": eid,
                "kind": pa.array(np.ones(n, dtype=np.int8)),
                "sign": pa.array(np.full(n, -1, dtype=np.int8)),
            }
        )
        return pa.concat_tables([data, hi_probe, lo_probe])

    def rank_bucket(g: pd.DataFrame) -> pa.Table:
        base = _base(int(g["tb"].iloc[0]))
        data_ts = np.sort(g.loc[g["kind"] == 0, "t"].to_numpy("int64"))
        probes = g[g["kind"] == 1]
        ranks = base + np.searchsorted(
            data_ts, probes["t"].to_numpy("int64"), side="left"
        )
        return pa.table(
            {
                "event_id": pa.array(probes["event_id"].to_numpy("int64")),
                "part": pa.array(
                    ranks * probes["sign"].to_numpy("int64"), pa.int64()
                ),
            }
        )

    import pyarrow.parquet as pq

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/events.parquet").num_rows)

    def ebucket(t: pa.Table) -> pa.Table:
        eid = pc.cast(t["event_id"], pa.int64())
        return t.append_column(
            "eb", pc.cast(pc.bit_wise_and(eid, nb - 1), pa.int32())
        )

    def combine(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("event_id")["part"].sum()
        return pa.table(
            {
                "event_id": pa.array(s.index.to_numpy("int64")),
                "n_prior_5m": pa.array(s.to_numpy("int64")),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("tb")
        .map_groups(rank_bucket, batch_format="pandas")
        .map_batches(ebucket, batch_format="pyarrow")
        .groupby("eb")
        .map_groups(combine, batch_format="pandas")
    )


EVENTS_TRAILING_DENSITY_SQL = f"""
SELECT e1.event_id,
       CAST((SELECT COUNT(*) FROM events e2
             WHERE epoch_us(e2.ts) >= epoch_us(e1.ts) - {_DENSITY_WINDOW_US}
               AND epoch_us(e2.ts) < epoch_us(e1.ts)) AS BIGINT) AS n_prior_5m
FROM events e1 ORDER BY e1.event_id
"""


# -- distributed CUSUM drift detection (prefix-scan identity) -----------------

_CUSUM_K_C2 = 5_500   # reference level (cents): slightly above the ~50.00 mean
_CUSUM_H_C2 = 20_000  # alarm threshold (cents of cumulative excess)


def cusum_drift(sf_dir: str) -> "object":
    """Per-type CUSUM drift/changepoint statistic over the event stream —
    ``s_t = max(0, s_{t-1} + (x_t − K))`` with an alarm when ``s_t > H``.
    The recurrence looks inherently sequential, but unrolls to the PREFIX
    IDENTITY ``s_t = max(0, prefix_t − min(0, min_{j<t} prefix_j))``, so
    it distributes as a hierarchical scan (the pack_bins/ewma pattern):

    - stage 1: per (type, time-bucket) kernel sorts its slice and emits
      ONE summary row (bucket d-sum, bucket min-prefix);
    - driver: O(buckets) fold turns summaries into each bucket's entry
      offset and entering running-min;
    - stage 2: the same co-location recomputes local prefixes and counts
      alarms / max excursion vectorized; a tiny per-type fold finishes.

    Exchanges: two (type, time-bucket) co-locations + one |types|-row
    fold; driver state is counts-per-bucket, never rows.  Output:
    (event_type, n_events, n_alarms, max_cusum_c2)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Max, Sum

    ds = _read_events(sf_dir, ["event_id", "ts", "event_type", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64())
        v = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return pa.table(
            {
                "s": t["event_type"],
                "tb": pc.divide(ts, 3_600_000_000 * 24),  # day buckets
                "ts": ts,
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "d": pc.subtract(v, _CUSUM_K_C2),
            }
        )

    def summarize(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["ts", "event_id"])
        lp = g["d"].to_numpy("int64").cumsum()
        return pa.table(
            {
                "s": pa.array([str(g["s"].iloc[0])], pa.string()),
                "tb": pa.array([int(g["tb"].iloc[0])], pa.int64()),
                "dsum": pa.array([int(lp[-1])], pa.int64()),
                "minp": pa.array([int(lp.min())], pa.int64()),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    summaries = (
        keyed_ds.groupby(["s", "tb"])
        .map_groups(summarize, batch_format="pandas")
        .to_pandas()  # O(types x day-buckets)
        .sort_values(["s", "tb"])
        .reset_index(drop=True)
    )

    # driver fold: entry offset + entering running-min per (type, bucket)
    enter: dict[tuple[str, int], tuple[int, int]] = {}
    for s, g in summaries.groupby("s"):
        off = 0
        m = 0  # min(0, prefixes seen so far) — prefix_0 = 0 included
        for _, row in g.iterrows():
            enter[(str(s), int(row["tb"]))] = (off, m)
            m = min(m, off + int(row["minp"]))
            off += int(row["dsum"])

    def alarms(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["ts", "event_id"])
        off, m_in = enter[(str(g["s"].iloc[0]), int(g["tb"].iloc[0]))]
        gp = off + g["d"].to_numpy("int64").cumsum()  # global prefixes
        # running min of prefixes STRICTLY before each row: the entering
        # min (m_in, which already folds 0 and all earlier buckets) clipped
        # against the in-bucket prefixes seen so far
        m = np.empty_like(gp)
        m[0] = m_in
        if len(gp) > 1:
            m[1:] = np.minimum(m_in, np.minimum.accumulate(gp[:-1]))
        s_t = np.maximum(0, gp - m)
        return pa.table(
            {
                "s": pa.array([str(g["s"].iloc[0])], pa.string()),
                "n": pa.array([len(g)], pa.int64()),
                "n_alarms": pa.array([int((s_t > _CUSUM_H_C2).sum())], pa.int64()),
                "max_s": pa.array([int(s_t.max())], pa.int64()),
            }
        )

    folded = (
        keyed_ds.groupby(["s", "tb"])
        .map_groups(alarms, batch_format="pandas")
        .groupby("s")
        .aggregate(
            Sum("n", alias_name="n_events"),
            Sum("n_alarms", alias_name="n_alarms"),
            Max("max_s", alias_name="max_cusum_c2"),
        )
        .to_pandas()  # O(|types|)
    )
    out = folded.rename(columns={"s": "event_type"}).astype(
        {"n_events": "int64", "n_alarms": "int64", "max_cusum_c2": "int64"}
    )
    return out.sort_values("event_type").reset_index(drop=True)


CUSUM_DRIFT_SQL = f"""
WITH x AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value*100) AS BIGINT) - {_CUSUM_K_C2} AS d
  FROM events
), p AS (
  SELECT event_type, ts, event_id,
         SUM(d) OVER (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS pre
  FROM x
), q AS (
  SELECT event_type, pre,
         LEAST(0, COALESCE(MIN(pre) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) AS m
  FROM p
), s AS (
  SELECT event_type, GREATEST(0, pre - m) AS st FROM q
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN st > {_CUSUM_H_C2} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarms,
       CAST(MAX(st) AS BIGINT) AS max_cusum_c2
FROM s GROUP BY event_type ORDER BY event_type
"""


# -- day-of-week uniformity audit (chi-square, integer-exact) -----------------

def dow_chisq_by_type(sf_dir: str) -> "pd.DataFrame":
    """Chi-square uniformity statistic of the day-of-week distribution per
    event type — the seasonality/skew audit a pipeline owner runs before
    trusting time-based sampling.  chi² against the uniform null is
    Σ_d (o_d − n/7)² / (n/7) = (7·Σ o_d² − n²) / n, a pure function of the
    7 per-dow counts, so the whole operator is one tiny
    (type, dow)-combined groupby: per-batch Arrow partials → a
    |types|×7-row exchange → driver arithmetic in Python ints (n² exceeds
    int64 at ~3·10^9 rows).  Zero-count days drop out of Σ o² exactly as
    the identity requires, so missing dows need no densification.

    Day-of-week convention: DuckDB's EXTRACT(dow) counts Sunday=0;
    Arrow's day_of_week counts Monday=0 — shifted here, asserted by the
    oracle equality test.  Output: (event_type, n, chi2_u) with
    chi2_u = floor(chi²·1e6) in exact integer arithmetic (numerator ≥ 0 by
    Cauchy–Schwarz, so DuckDB's truncating // is floor).
    Beyond-reference engine addition (SURVEY.md §2.8)."""
    ds = _read_events(sf_dir, ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        # Arrow: Monday=0 .. Sunday=6  ->  DuckDB dow: Sunday=0 .. Saturday=6
        dow = pc.cast(
            pc.add(pc.day_of_week(t["ts"]), 1), pa.int64()
        )
        dow = pc.subtract(dow, pc.multiply(pc.divide(dow, 7), 7))
        folded = pa.table({"event_type": t["event_type"], "d": dow})
        return pa.TableGroupBy(folded, ["event_type", "d"]).aggregate(
            [([], "count_all")]
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "d"])
        .aggregate(ray.data.aggregate.Sum("count_all", alias_name="o"))
        .to_pandas()  # O(|types| × 7)
    )
    out = []
    for et, sub in counts.groupby("event_type"):
        o = [int(x) for x in sub["o"]]
        n = sum(o)
        chi2_u = ((7 * sum(c * c for c in o) - n * n) * 1_000_000) // n
        out.append({"event_type": et, "n": n, "chi2_u": chi2_u})
    return pd.DataFrame(sorted(out, key=lambda r: r["event_type"]))


DOW_CHISQ_BY_TYPE_SQL = """
WITH c AS (
  SELECT event_type, EXTRACT(dow FROM ts) AS d,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(SUM(o) AS BIGINT) AS n,
       CAST(((7*SUM(o*o) - SUM(o)*SUM(o)) * 1000000) // SUM(o) AS BIGINT)
         AS chi2_u
FROM c GROUP BY event_type ORDER BY event_type
"""


# -- RFM feature scores (recency / frequency / monetary quintiles) ------------

#: quintile ranks in micro-quantile units (the price_decile convention)
_RFM_QS = (200_000, 400_000, 600_000, 800_000)
_RFM_HIST_W = 4_096


def rfm_scores(sf_dir: str) -> Dataset:
    """Per-user RFM feature table — recency (days since the user's last
    event, against the corpus max), frequency (event count) and monetary
    (Σ value in c4 units) plus a 1–5 quintile score per dimension: the
    classic behavioral-feature block a ranking model consumes.

    Three stages, all bounded: (1) per-user aggregates in ONE user-bucket
    co-location (per-batch Arrow partials combine map-side, the in-bucket
    kernel folds per user vectorized), materialized once — user rows are
    far smaller than the corpus and spill like any Dataset; (2) exact
    quintile cut points PER DIMENSION via the counting-histogram two-pass
    (windows.price_decile machinery; one tagged (dim, bucket) aggregate —
    driver state O(3 × domain/4096) counts, fine pass touches only the
    cut buckets); (3) one streaming score-assignment pass
    (1 + #cut-points strictly below, duplicates counted — deterministic
    under ties, unlike NTILE).  Higher recency score = STALER user (raw
    days since last event; flip downstream if needed).

    Output: (user_id, r_days, f, m_c4, r_score, f_score, m_score).
    Beyond-reference engine addition (SURVEY.md §2.8)."""
    import numpy as np

    from ray.data.aggregate import Sum

    from .sketches import _floor_bucket

    nb = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        u = pc.cast(t["user_id"], pa.int64())
        folded = pa.table(
            {
                "user_id": u,
                "ts_us": pc.cast(t["ts"].cast(pa.timestamp("us")), pa.int64()),
                "m": pc.cast(pc.round(pc.multiply(t["value"], 10_000.0)),
                             pa.int64()),
            }
        )
        g = pa.TableGroupBy(folded, "user_id").aggregate(
            [("ts_us", "max"), ("m", "sum"), ([], "count_all")]
        )
        return g.append_column(
            "ub",
            pc.cast(pc.bit_wise_and(g["user_id"], nb - 1), pa.int32()),
        )

    def fold(g: "pd.DataFrame") -> pa.Table:
        agg = g.groupby("user_id").agg(
            last=("ts_us_max", "max"), m=("m_sum", "sum"),
            f=("count_all", "sum"),
        )
        return pa.table(
            {
                "user_id": pa.array(agg.index.to_numpy(np.int64)),
                "last_us": pa.array(agg["last"].to_numpy(np.int64)),
                "f": pa.array(agg["f"].to_numpy(np.int64)),
                "m_c4": pa.array(agg["m"].to_numpy(np.int64)),
            }
        )

    users = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(fold, batch_format="pandas")
        .materialize()  # reused by the histogram pass and the score pass
    )
    gmax = int(users.max("last_us"))

    def dim_hist(t: pa.Table) -> pa.Table:
        r = pc.divide(pc.subtract(gmax, t["last_us"]), 86_400_000_000)
        frames = []
        for dim, col in ((0, r), (1, t["f"]), (2, t["m_c4"])):
            frames.append(
                pa.table(
                    {
                        "dim": pa.array([dim] * len(t), pa.int32()),
                        "b": _floor_bucket(pc.cast(col, pa.int64()),
                                           _RFM_HIST_W),
                    }
                )
            )
        allb = pa.concat_tables(frames)
        return pa.TableGroupBy(allb, ["dim", "b"]).aggregate(
            [([], "count_all")]
        )

    counts = (
        users.map_batches(dim_hist, batch_format="pyarrow")
        .groupby(["dim", "b"])
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()  # O(3 × domain/4096)
    )
    need: dict[tuple[int, int], list[int]] = {}
    for dim, sub in counts.groupby("dim"):
        sub = sub.sort_values("b").reset_index(drop=True)
        n = int(sub["n"].sum())
        cum = sub["n"].cumsum()
        for q in _RFM_QS:
            k = (q * (n - 1)) // 1_000_000
            i = int((cum > k).idxmax())
            before = int(cum.iloc[i - 1]) if i > 0 else 0
            need.setdefault((int(dim), int(sub.loc[i, "b"])), []).append(
                k - before
            )
    wanted = {d: pa.array(sorted(b for dd, b in need if dd == d), pa.int64())
              for d in (0, 1, 2)}

    def fine_hist(t: pa.Table) -> pa.Table:
        r = pc.cast(
            pc.divide(pc.subtract(gmax, t["last_us"]), 86_400_000_000),
            pa.int64(),
        )
        frames = []
        for dim, col in ((0, r), (1, pc.cast(t["f"], pa.int64())),
                         (2, pc.cast(t["m_c4"], pa.int64()))):
            b = _floor_bucket(col, _RFM_HIST_W)
            sub = pa.table(
                {
                    "dim": pa.array([dim] * len(t), pa.int32()),
                    "b": b,
                    "v": col,
                }
            ).filter(pc.is_in(b, value_set=wanted[dim]))
            frames.append(sub)
        allf = pa.concat_tables(frames)
        return pa.TableGroupBy(allf, ["dim", "b", "v"]).aggregate(
            [([], "count_all")]
        )

    fine = (
        users.map_batches(fine_hist, batch_format="pyarrow")
        .groupby(["dim", "b", "v"])
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()  # distinct values inside cut buckets only
    )
    cuts: dict[int, list[int]] = {0: [], 1: [], 2: []}
    for (dim, b), ranks in need.items():
        g = (
            fine[(fine["dim"] == dim) & (fine["b"] == b)]
            .sort_values("v")
            .reset_index(drop=True)
        )
        gc = g["n"].cumsum()
        for rk in ranks:
            j = int((gc > rk).idxmax())
            cuts[dim].append(int(g.loc[j, "v"]))
    cut_arrs = {d: np.sort(np.array(cuts[d], np.int64)) for d in cuts}

    def assign(t: pa.Table) -> pa.Table:
        r = pc.cast(
            pc.divide(pc.subtract(gmax, t["last_us"]), 86_400_000_000),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        f = pc.cast(t["f"], pa.int64()).to_numpy(zero_copy_only=False)
        m = pc.cast(t["m_c4"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"],
                "r_days": pa.array(r),
                "f": t["f"],
                "m_c4": t["m_c4"],
                "r_score": pa.array(
                    1 + np.searchsorted(cut_arrs[0], r, side="left"), pa.int64()
                ),
                "f_score": pa.array(
                    1 + np.searchsorted(cut_arrs[1], f, side="left"), pa.int64()
                ),
                "m_score": pa.array(
                    1 + np.searchsorted(cut_arrs[2], m, side="left"), pa.int64()
                ),
            }
        )

    return users.map_batches(assign, batch_format="pyarrow")


def _rfm_cut_sql(dim_expr: str, alias: str) -> str:
    ranks = ", ".join(
        f"(SELECT (({q} * (COUNT(*) - 1)) // 1000000) FROM u)"
        for q in _RFM_QS
    )
    return f"""{alias} AS (
  SELECT v FROM (
    SELECT {dim_expr} AS v,
           ROW_NUMBER() OVER (ORDER BY {dim_expr}) - 1 AS rk
    FROM u)
  WHERE rk IN ({ranks})
)"""


RFM_SCORES_SQL = f"""
WITH u AS (
  SELECT user_id,
         (SELECT MAX(epoch_us(ts)) FROM events) - MAX(epoch_us(ts)) AS age_us,
         CAST(COUNT(*) AS BIGINT) AS f,
         CAST(SUM(CAST(ROUND(value*10000) AS BIGINT)) AS BIGINT) AS m_c4
  FROM events GROUP BY user_id
),
{_rfm_cut_sql("age_us // 86400000000", "cr")},
{_rfm_cut_sql("f", "cf")},
{_rfm_cut_sql("m_c4", "cm")}
SELECT user_id,
       CAST(age_us // 86400000000 AS BIGINT) AS r_days, f, m_c4,
       CAST(1 + (SELECT COUNT(*) FROM cr WHERE cr.v < u.age_us // 86400000000)
            AS BIGINT) AS r_score,
       CAST(1 + (SELECT COUNT(*) FROM cf WHERE cf.v < u.f) AS BIGINT)
         AS f_score,
       CAST(1 + (SELECT COUNT(*) FROM cm WHERE cm.v < u.m_c4) AS BIGINT)
         AS m_score
FROM u ORDER BY user_id
"""


# -- seasonal-naive forecast backtest (lag-7 MAE) ------------------------------

def seasonal_error_by_type(sf_dir: str) -> "pd.DataFrame":
    """Backtest error of the seasonal-naive forecast (ŝ_d = s_{d−7}) on
    per-type daily value totals — the baseline every capacity/volume
    forecasting effort must beat, and the drift alarm when it suddenly
    degrades.  One bounded (type, day) aggregate — O(types × days)
    groups, a time-domain constant at any corpus size — then a driver
    fold in Python ints: MAE over the days whose lag-7 day was observed
    (no spine densification; the sparse join is mirrored in the oracle).
    mae_c4 floors in c4 units (|Δ| ≥ 0, so DuckDB's truncating // agrees).

    Output: (event_type, n_days, mae_c4).  Beyond-reference engine
    addition (SURVEY.md §2.8)."""
    ds = _read_events(sf_dir, ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        folded = pa.table(
            {
                "event_type": t["event_type"],
                "day": pc.divide(
                    pc.cast(t["ts"].cast(pa.timestamp("us")), pa.int64()),
                    86_400_000_000,
                ),
                "s": pc.cast(pc.round(pc.multiply(t["value"], 10_000.0)),
                             pa.int64()),
            }
        )
        return pa.TableGroupBy(folded, ["event_type", "day"]).aggregate(
            [("s", "sum")]
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(ray.data.aggregate.Sum("s_sum", alias_name="s"))
        .to_pandas()  # O(types × days) — time-domain bounded
    )
    out = []
    for et, sub in daily.groupby("event_type"):
        series = {int(d): int(s) for d, s in zip(sub["day"], sub["s"])}
        errs = [
            abs(s - series[d - 7]) for d, s in series.items()
            if d - 7 in series
        ]
        if not errs:
            continue
        out.append(
            {
                "event_type": et,
                "n_days": len(errs),
                "mae_c4": sum(errs) // len(errs),
            }
        )
    return pd.DataFrame(sorted(out, key=lambda r: r["event_type"]))


SEASONAL_ERROR_BY_TYPE_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         SUM(CAST(ROUND(value*10000) AS BIGINT)) AS s
  FROM events GROUP BY 1, 2
)
SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(ABS(a.s - b.s)) // COUNT(*) AS BIGINT) AS mae_c4
FROM d a JOIN d b ON a.event_type = b.event_type AND b.day = a.day - 7
GROUP BY 1 ORDER BY 1
"""


# -- Mann-Kendall trend test (integer-exact S and Var[S]) ----------------------

def mann_kendall_by_type(sf_dir: str) -> "pd.DataFrame":
    """Mann-Kendall monotonic-trend test on per-type daily value totals —
    the nonparametric drift detector that complements ``cusum_drift``
    (mean shifts) and ``value_trend_per_type`` (OLS slope): S =
    Σ_{i<j} sign(s_j − s_i) over the time-ordered daily series, with the
    tie-corrected null variance Var[S] = (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5))
    / 18.  S is an integer and the variance is emitted as its ×18 integer
    NUMERATOR (the /18 need not divide evenly), so the result hash-matches
    the oracle with no float anywhere; consumers form
    z = (S∓1)/sqrt(var18/18) downstream.

    Distributed plan: identical to ``seasonal_error_by_type`` — ONE
    bounded (type, day) aggregate (O(types × days) groups, a time-domain
    constant at any corpus size), then a driver fold in Python ints; the
    O(d log d) inversion count runs on the day-domain series, never on
    rows.  Output: (event_type, n_days, s_stat, var18).
    Beyond-reference engine addition (SURVEY.md §2.8)."""
    ds = _read_events(sf_dir, ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        folded = pa.table(
            {
                "event_type": t["event_type"],
                "day": pc.divide(
                    pc.cast(t["ts"].cast(pa.timestamp("us")), pa.int64()),
                    86_400_000_000,
                ),
                "s": pc.cast(pc.round(pc.multiply(t["value"], 10_000.0)),
                             pa.int64()),
            }
        )
        return pa.TableGroupBy(folded, ["event_type", "day"]).aggregate(
            [("s", "sum")]
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(ray.data.aggregate.Sum("s_sum", alias_name="s"))
        .to_pandas()  # O(types × days)
    )
    out = []
    for et, sub in daily.groupby("event_type"):
        sub = sub.sort_values("day")
        vals = [int(v) for v in sub["s"]]
        n = len(vals)
        s_stat = 0
        for i in range(n):  # day-domain O(d²) with tiny d; never row-level
            for j in range(i + 1, n):
                s_stat += (vals[j] > vals[i]) - (vals[j] < vals[i])
        from collections import Counter

        ties = Counter(vals)
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
        )
        out.append(
            {"event_type": et, "n_days": n, "s_stat": s_stat, "var18": var18}
        )
    return pd.DataFrame(sorted(out, key=lambda r: r["event_type"]))


MANN_KENDALL_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         SUM(CAST(ROUND(value*10000) AS BIGINT)) AS s
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         SUM(CASE WHEN b.s > a.s THEN 1 WHEN b.s < a.s THEN -1 ELSE 0 END)
           AS s_stat
  FROM d a JOIN d b ON a.event_type = b.event_type AND b.day > a.day
  GROUP BY 1
),
nn AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
tie AS (
  SELECT event_type,
         COALESCE(SUM(t*(t-1)*(2*t+5)), 0) AS corr
  FROM (SELECT event_type, s, COUNT(*) AS t FROM d GROUP BY 1, 2)
  WHERE t > 1 GROUP BY 1
)
SELECT nn.event_type, nn.n AS n_days,
       CAST(COALESCE(pairs.s_stat, 0) AS BIGINT) AS s_stat,
       CAST(nn.n*(nn.n-1)*(2*nn.n+5) - COALESCE(tie.corr, 0) AS BIGINT)
         AS var18
FROM nn LEFT JOIN pairs USING (event_type) LEFT JOIN tie USING (event_type)
ORDER BY nn.event_type
"""


# -- Benford first-digit audit --------------------------------------------------

def benford_digits_by_type(sf_dir: str) -> "pd.DataFrame":
    """First-significant-digit distribution of event values per type —
    the Benford's-law forensic audit that flags fabricated or truncated
    numeric feeds (a conforming natural-value column leads with digit d
    at rate log10(1+1/d); a synthetic or clipped one does not).  Counts
    only — exact integers, no irrational expected-rate arithmetic — so
    the output hash-matches; consumers fit the Benford curve downstream.

    The digit comes from the exact decimal rendering of the integer c4
    value (Arrow int64→string cast, first code unit), not from a float
    log10 whose ulp at powers of ten would disagree with the oracle's
    string slice.  Zero values have no significant digit and are dropped
    on both sides.  One |types|×9 aggregate; no other exchange.

    Output: (event_type, digit, n).  Beyond-reference engine addition
    (SURVEY.md §2.8)."""
    ds = _read_events(sf_dir, ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(pc.abs(t["value"]), 10_000.0)),
                    pa.int64())
        folded = pa.table(
            {
                "event_type": t["event_type"],
                "digit": pc.utf8_slice_codeunits(
                    pc.cast(v, pa.string()), 0, 1
                ),
            }
        ).filter(pc.greater(v, 0))
        return pa.TableGroupBy(folded, ["event_type", "digit"]).aggregate(
            [([], "count_all")]
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "digit"])
        .aggregate(ray.data.aggregate.Sum("count_all", alias_name="n"))
        .to_pandas()  # O(|types| × 9)
        .sort_values(["event_type", "digit"])
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


BENFORD_DIGITS_SQL = """
SELECT event_type,
       substr(CAST(CAST(ROUND(ABS(value)*10000) AS BIGINT) AS VARCHAR), 1, 1)
         AS digit,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE CAST(ROUND(ABS(value)*10000) AS BIGINT) > 0
GROUP BY 1, 2 ORDER BY 1, 2
"""


# -- inter-arrival-time quantiles (user stream cadence audit) ------------------

_IAT_HIST_W = 4_096  # seconds per coarse counting bucket


def interarrival_quantiles_by_type(sf_dir: str) -> "pd.DataFrame":
    """Exact p50/p90 of the inter-arrival time (whole seconds between a
    user's consecutive events, attributed to the LATER event's type) —
    the stream-cadence audit behind session-gap tuning and bot
    detection.  The gap multiset is invariant to tie order at equal
    timestamps, so the oracle's ROW_NUMBER tie-break cannot diverge.

    Shape: (1) one user-bucket co-location computes within-user diffs
    vectorized and folds them to (type, gap_s) count partials; (2) one
    coarse count-table co-location (gini_by_status's ``b mod n_buckets``
    key — never one Python call per (type, bucket) group) exactifies the
    counts, MATERIALIZED once; (3) the exact-quantile two-pass then runs
    over count rows only — a coarse fold for driver offsets
    (O(types × gap-domain/4096) counts) and a filtered fine read of just
    the cut buckets.  No corpus row is ever shuffled twice.

    Output: (event_type, n, p50_s, p90_s).  Beyond-reference engine
    addition (SURVEY.md §2.8)."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ._util import n_buckets
    from .sketches import _floor_bucket

    nb_u = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "event_type", "event_id"])

    def keyed(t: pa.Table) -> pa.Table:
        u = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(u, nb_u - 1), pa.int32()),
                "user_id": u,
                "ts_us": pc.cast(t["ts"].cast(pa.timestamp("us")), pa.int64()),
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "event_type": t["event_type"],
            }
        )

    def gaps(g: "pd.DataFrame") -> pa.Table:
        g = g.sort_values(["user_id", "ts_us", "event_id"])
        prev = g.groupby("user_id")["ts_us"].shift(1)
        keep = prev.notna()
        gap_s = ((g["ts_us"][keep] - prev[keep]) // 1_000_000).astype("int64")
        sub = pd.DataFrame(
            {"event_type": g["event_type"][keep], "gap_s": gap_s}
        )
        c = sub.groupby(["event_type", "gap_s"]).size().reset_index(name="n")
        return pa.table(
            {
                "event_type": pa.array(c["event_type"], pa.string()),
                "gap_s": pa.array(c["gap_s"].to_numpy("int64")),
                "n": pa.array(c["n"].to_numpy("int64")),
            }
        )

    partials = (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(gaps, batch_format="pandas")
    )

    nb_c = n_buckets(int(1e6))  # count-table rows ≤ types × gap domain

    def coarse_key(t: pa.Table) -> pa.Table:
        gb = _floor_bucket(t["gap_s"], _IAT_HIST_W)
        return pa.table(
            {
                "cb": pc.cast(pc.bit_wise_and(gb, nb_c - 1), pa.int32()),
                "event_type": t["event_type"],
                "gb": gb,
                "gap_s": t["gap_s"],
                "n": t["n"],
            }
        )

    def exactify(g: "pd.DataFrame") -> pa.Table:
        c = (
            g.groupby(["event_type", "gb", "gap_s"], as_index=False)["n"]
            .sum()
        )
        return pa.table(
            {
                "event_type": pa.array(c["event_type"], pa.string()),
                "gb": pa.array(c["gb"].to_numpy("int64")),
                "gap_s": pa.array(c["gap_s"].to_numpy("int64")),
                "n": pa.array(c["n"].to_numpy("int64")),
            }
        )

    counts = (
        partials.map_batches(coarse_key, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(exactify, batch_format="pandas")
        .materialize()  # exact (type, gap_s) counts; reused twice below
    )

    def coarse_fold(t: pa.Table) -> pa.Table:
        folded = pa.table(
            {"event_type": t["event_type"], "gb": t["gb"], "n": t["n"]}
        )
        return pa.TableGroupBy(folded, ["event_type", "gb"]).aggregate(
            [("n", "sum")]
        )

    coarse = (
        counts.map_batches(coarse_fold, batch_format="pyarrow")
        .groupby(["event_type", "gb"])
        .aggregate(Sum("n_sum", alias_name="n"))
        .to_pandas()  # O(types × gap-domain/4096)
    )
    qs = (500_000, 900_000)
    need: dict[str, dict[int, list[tuple[int, int]]]] = {}
    totals: dict[str, int] = {}
    for et, sub in coarse.groupby("event_type"):
        sub = sub.sort_values("gb").reset_index(drop=True)
        n = int(sub["n"].sum())
        totals[et] = n
        cum = sub["n"].cumsum()
        for q in qs:
            k = (q * (n - 1)) // 1_000_000
            i = int((cum > k).idxmax())
            before = int(cum.iloc[i - 1]) if i > 0 else 0
            need.setdefault(et, {}).setdefault(
                int(sub.loc[i, "gb"]), []
            ).append((q, k - before))

    wanted = pa.array(
        sorted(f"{et}|{gb}" for et, m in need.items() for gb in m),
        pa.string(),
    )

    def fine_filter(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["event_type"], pa.string()),
            pc.cast(t["gb"], pa.string()),
            "|",
        )
        return t.filter(pc.is_in(key, value_set=wanted))

    fine = counts.map_batches(
        fine_filter, batch_format="pyarrow"
    ).to_pandas()  # distinct gap values inside cut buckets only

    res: dict[str, dict[int, int]] = {}
    for (et, gb), sub in fine.groupby(["event_type", "gb"]):
        if et not in need or int(gb) not in need[et]:
            continue
        sub = sub.sort_values("gap_s").reset_index(drop=True)
        gc = sub["n"].cumsum()
        for q, rk in need[et][int(gb)]:
            j = int((gc > rk).idxmax())
            res.setdefault(et, {})[q] = int(sub.loc[j, "gap_s"])

    out = [
        {
            "event_type": et,
            "n": totals[et],
            "p50_s": res[et][500_000],
            "p90_s": res[et][900_000],
        }
        for et in sorted(res)
    ]
    return pd.DataFrame(out)


INTERARRIVAL_QUANTILES_SQL = """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gap_s
  FROM events
),
gg AS (SELECT event_type, gap_s FROM g WHERE gap_s IS NOT NULL),
r AS (
  SELECT event_type, gap_s,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap_s) - 1 AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM gg
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(CASE WHEN rk = (500000*(n-1))//1000000 THEN gap_s END)
            AS BIGINT) AS p50_s,
       CAST(MAX(CASE WHEN rk = (900000*(n-1))//1000000 THEN gap_s END)
            AS BIGINT) AS p90_s
FROM r GROUP BY event_type ORDER BY event_type
"""


# -- Theil-Sen robust trend slope ----------------------------------------------

def theil_sen_by_type(sf_dir: str) -> "pd.DataFrame":
    """Theil–Sen robust trend slope of per-type daily value totals — the
    median of all pairwise slopes, the outlier-proof companion to the
    OLS ``value_trend_per_type`` and the Mann-Kendall S test (a single
    corrupted day moves OLS arbitrarily but this at most one rank).

    Same bounded shape as the other daily-series stats: ONE
    O(types × days) aggregate, then a day-domain driver fold.  Slopes
    quantize to integer micro-units with FLOOR division on both sides —
    numerators go negative, numpy's floor_divide floors natively, and
    the oracle emulates floor with the non-negative-remainder identity
    ``(num − ((num % den) + den) % den) // den`` because DuckDB's native
    ``//`` truncates.  The reported value is the lower median (0-based
    rank (n−1)//2), deterministic under ties.  int64-safe while a daily
    total stays under ~4·10^12 c4 (|Δs|·10^6 < 2^62); the guard asserts
    and falls back to exact Python ints past that.

    Output: (event_type, n_pairs, slope_u).  Beyond-reference engine
    addition (SURVEY.md §2.8)."""
    import numpy as np

    ds = _read_events(sf_dir, ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        folded = pa.table(
            {
                "event_type": t["event_type"],
                "day": pc.divide(
                    pc.cast(t["ts"].cast(pa.timestamp("us")), pa.int64()),
                    86_400_000_000,
                ),
                "s": pc.cast(pc.round(pc.multiply(t["value"], 10_000.0)),
                             pa.int64()),
            }
        )
        return pa.TableGroupBy(folded, ["event_type", "day"]).aggregate(
            [("s", "sum")]
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(ray.data.aggregate.Sum("s_sum", alias_name="s"))
        .to_pandas()  # O(types × days)
    )
    out = []
    for et, sub in daily.groupby("event_type"):
        sub = sub.sort_values("day")
        d = sub["day"].to_numpy(np.int64)
        s = sub["s"].to_numpy(np.int64)
        if len(d) < 2:
            continue
        if int(np.abs(s).max()) * 2_000_000 < (1 << 62):
            num = (s[None, :] - s[:, None]) * 1_000_000
            den = d[None, :] - d[:, None]
            iu = np.triu_indices(len(d), k=1)
            slopes = np.floor_divide(num[iu], den[iu])
            slopes.sort()
            n_pairs = len(slopes)
            med = int(slopes[(n_pairs - 1) // 2])
        else:  # pragma: no cover - beyond-int64 daily totals
            sl = sorted(
                (int(s[j]) - int(s[i])) * 1_000_000 // (int(d[j]) - int(d[i]))
                for i in range(len(d))
                for j in range(i + 1, len(d))
            )
            n_pairs = len(sl)
            med = sl[(n_pairs - 1) // 2]
        out.append(
            {"event_type": et, "n_pairs": n_pairs, "slope_u": med}
        )
    return pd.DataFrame(sorted(out, key=lambda r: r["event_type"]))


THEIL_SEN_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         SUM(CAST(ROUND(value*10000) AS BIGINT)) AS s
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT a.event_type,
         (b.s - a.s) * 1000000 AS num,
         (b.day - a.day) AS den
  FROM d a JOIN d b ON a.event_type = b.event_type AND b.day > a.day
),
sl AS (
  SELECT event_type,
         (num - ((num % den) + den) % den) // den AS slope_u
  FROM p
),
r AS (
  SELECT event_type, slope_u,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope_u) - 1
           AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM sl
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_pairs,
       CAST(MAX(CASE WHEN rk = (n-1)//2 THEN slope_u END) AS BIGINT)
         AS slope_u
FROM r GROUP BY event_type ORDER BY event_type
"""


# -- Fano-factor burstiness audit ---------------------------------------------

def fano_factor_by_type(sf_dir: str) -> "pd.DataFrame":
    """Burstiness of each event type as the exact Fano-factor ingredients —
    population variance-to-mean of the zero-filled DAILY count series over
    the corpus's global day span (a Poisson process gives F = 1; F >> 1
    flags bursty types, F < 1 regular ones).  One (type, day) count fold
    is the only exchange (group count = |types| x days, corpus-size-free);
    the global span and all moments come off that same count table, with
    the day-count products done in Python ints (zero-filled days contribute
    nothing to S1/S2, so only observed cells are touched).  Output keeps
    the ratio exact: F = fano_num / fano_den with
    fano_num = m·ΣC² − (ΣC)², fano_den = m·ΣC over m span days.

    int64 bound: ΣC² ≤ n² per type — exact output to ~3e9 rows/type (the
    ``auc_by_type`` caveat; the driver is arbitrary-precision and the final
    cast RAISES rather than wraps).  Output: (event_type, n_days,
    days_active, total, fano_num, fano_den).  Beyond-reference engine
    addition (SURVEY.md §2.8)."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        folded = pa.table({"e": t["event_type"], "day": day})
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate(
            [([], "count_all")]
        )

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|types| x span days)
    )
    m = int(d["day"].max()) - int(d["day"].min()) + 1
    rows = []
    for e, sub in d.groupby("e"):
        cs = [int(c) for c in sub["c"]]
        s1, s2 = sum(cs), sum(c * c for c in cs)
        rows.append(
            {"event_type": e, "n_days": m, "days_active": len(cs),
             "total": s1, "fano_num": m * s2 - s1 * s1, "fano_den": m * s1}
        )
    return (
        pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
        .astype({c: "int64" for c in
                 ("n_days", "days_active", "total", "fano_num", "fano_den")})
        .reset_index(drop=True)
    )


FANO_FACTOR_BY_TYPE_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT MAX(day) - MIN(day) + 1 AS m FROM d),
s AS (
  SELECT event_type, COUNT(*) AS days_active,
         CAST(SUM(c) AS HUGEINT) AS s1,
         SUM(CAST(c AS HUGEINT) * c) AS s2
  FROM d GROUP BY 1
)
SELECT event_type, CAST(span.m AS BIGINT) AS n_days,
       CAST(days_active AS BIGINT) AS days_active,
       CAST(s1 AS BIGINT) AS total,
       CAST(span.m * s2 - s1 * s1 AS BIGINT) AS fano_num,
       CAST(span.m * s1 AS BIGINT) AS fano_den
FROM s, span ORDER BY event_type
"""


# -- running-peak maximum drawdown per user -----------------------------------

def user_drawdown(sf_dir: str) -> Dataset:
    """Maximum drawdown of each user's cumulative event value — the
    running-peak-minus-current statistic risk pipelines keep per entity
    (max dip below the high-water mark of a value stream).  One user-bucket
    co-location is the only exchange; the in-bucket kernel is fully
    vectorized (groupby-cumsum, groupby-cummax, one max per user — no
    Python loop, unlike the truncating-EWMA recurrence).  Exact integer
    cents; ordering (ts, event_id) is deterministic because event ids are
    unique.  Output: (user_id, n_events, final_c2, peak_c2,
    max_drawdown_c2)."""
    import numpy as np

    nb = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def keyed(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        u = df["user_id"].astype("int64")
        return pd.DataFrame(
            {
                "ub": (u % nb).astype("int32"),
                "user_id": u,
                "event_id": df["event_id"].astype("int64"),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "v_c2": (df["value"] * 100).round().astype("int64"),
            }
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"]).reset_index(drop=True)
        by = g.groupby("user_id", sort=True)
        cum = by["v_c2"].cumsum()
        peak = cum.groupby(g["user_id"]).cummax()
        dd = peak - cum
        out = pd.DataFrame(
            {
                "user_id": g["user_id"],
                "cum": cum.astype("int64"),
                "peak": peak.astype("int64"),
                "dd": dd.astype("int64"),
            }
        )
        agg = out.groupby("user_id", sort=True).agg(
            n_events=("cum", "size"),
            final_c2=("cum", "last"),
            peak_c2=("peak", "max"),
            max_drawdown_c2=("dd", "max"),
        ).reset_index()
        return agg.astype(
            {c: "int64" for c in
             ("n_events", "final_c2", "peak_c2", "max_drawdown_c2")}
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(scan, batch_format="pandas")
        .sort("user_id")
    )


USER_DRAWDOWN_SQL = """
WITH c AS (
  SELECT user_id, ts, event_id,
         SUM(CAST(ROUND(value*100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS cum
  FROM events
),
p AS (
  SELECT user_id, ts, event_id, cum,
         MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS peak
  FROM c
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(CASE WHEN rn_desc = 1 THEN cum END) AS BIGINT) AS final_c2,
       CAST(MAX(peak) AS BIGINT) AS peak_c2,
       CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown_c2
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn_desc
      FROM p)
GROUP BY user_id ORDER BY user_id
"""


# -- exact autocorrelation of the daily count series ---------------------------

ACF_LAGS = (1, 7)


def acf_daily_by_type(sf_dir: str) -> "pd.DataFrame":
    """Exact autocorrelation ingredients of each type's ZERO-FILLED daily
    count series at lags 1 and 7 (the daily/weekly persistence audit that
    complements ``fano_factor_by_type``'s dispersion and
    ``mann_kendall_by_type``'s monotone trend).  Uses the standard ACF
    convention: r_k = Σ(c_t−c̄)(c_{t+k}−c̄) / Σ(c_t−c̄)² with the GLOBAL
    series mean in both factors.  Kept exact by clearing denominators:
    with S = Σc over m span days, acf_num = m²·Σ c_t·c_{t+k}
    − m·S·(pre_k + post_k) + (m−k)·S², acf_den = m²·Σc² − m·S² where
    pre/post are the series sums excluding the last/first k days — all
    integer, zero-filled days contributing only through m (the lag products
    touch observed-day pairs only, found by an O(days) two-pointer walk).

    One (type, day) count fold is the only exchange (the
    ``fano_factor_by_type`` table); the driver folds Python ints.  Output:
    (event_type, lag, n_days, acf_num, acf_den) — r_k = acf_num/acf_den.
    Beyond-reference engine addition (SURVEY.md §2.8)."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        folded = pa.table({"e": t["event_type"], "day": day})
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate(
            [([], "count_all")]
        )

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|types| x span days)
    )
    d0, d1 = int(d["day"].min()), int(d["day"].max())
    m = d1 - d0 + 1
    rows = []
    for e, sub in d.groupby("e"):
        series = sorted((int(day), int(c)) for day, c in zip(sub["day"], sub["c"]))
        days = [x[0] for x in series]
        cs = [x[1] for x in series]
        s1 = sum(cs)
        s2 = sum(c * c for c in cs)
        den = m * m * s2 - m * s1 * s1
        for k in ACF_LAGS:
            cross = 0
            j = 0
            for i, day in enumerate(days):
                # two-pointer: find day+k among observed days
                while j < len(days) and days[j] < day + k:
                    j += 1
                if j < len(days) and days[j] == day + k:
                    cross += cs[i] * cs[j]
            pre = sum(c for day, c in series if day <= d1 - k)
            post = sum(c for day, c in series if day >= d0 + k)
            num = m * m * cross - m * s1 * (pre + post) + (m - k) * s1 * s1
            rows.append(
                {"event_type": e, "lag": k, "n_days": m,
                 "acf_num": num, "acf_den": den}
            )
    return (
        pd.DataFrame(sorted(rows, key=lambda r: (r["event_type"], r["lag"])))
        .astype({c: "int64" for c in ("lag", "n_days", "acf_num", "acf_den")})
        .reset_index(drop=True)
    )


ACF_DAILY_BY_TYPE_SQL = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT MIN(day) AS d0, MAX(day) AS d1,
                MAX(day) - MIN(day) + 1 AS m FROM d),
s AS (
  SELECT event_type, CAST(SUM(c) AS HUGEINT) AS s1,
         SUM(CAST(c AS HUGEINT) * c) AS s2
  FROM d GROUP BY 1
),
lags(k) AS (VALUES {", ".join(f"({k})" for k in ACF_LAGS)}),
cross_k AS (
  SELECT a.event_type, l.k,
         SUM(CAST(a.c AS HUGEINT) * b.c) AS cross_sum
  FROM d a JOIN lags l ON TRUE
  JOIN d b ON b.event_type = a.event_type AND b.day = a.day + l.k
  GROUP BY 1, 2
),
edge AS (
  SELECT d.event_type, l.k,
         CAST(SUM(CASE WHEN d.day <= span.d1 - l.k THEN d.c ELSE 0 END)
              AS HUGEINT) AS pre_sum,
         CAST(SUM(CASE WHEN d.day >= span.d0 + l.k THEN d.c ELSE 0 END)
              AS HUGEINT) AS post_sum
  FROM d, span, lags l GROUP BY 1, 2
)
SELECT e.event_type AS event_type, CAST(e.k AS BIGINT) AS lag,
       CAST(span.m AS BIGINT) AS n_days,
       CAST(span.m * span.m * COALESCE(c.cross_sum, 0)
            - span.m * s.s1 * (e.pre_sum + e.post_sum)
            + (span.m - e.k) * s.s1 * s.s1 AS BIGINT) AS acf_num,
       CAST(span.m * span.m * s.s2 - span.m * s.s1 * s.s1 AS BIGINT) AS acf_den
FROM edge e
JOIN s ON s.event_type = e.event_type
LEFT JOIN cross_k c ON c.event_type = e.event_type AND c.k = e.k
CROSS JOIN span
ORDER BY e.event_type, lag
"""


# -- one-pass per-user feature-store build -------------------------------------

SESSION_BREAK_US = 30 * 60 * 1_000_000


def user_features(sf_dir: str) -> Dataset:
    """The feature-store build: TWELVE per-user behavioral features in ONE
    user-bucket co-location — the entity-feature materialization a training
    pipeline runs nightly, where computing each feature as its own
    operator would cost one shuffle apiece.  Everything the in-bucket
    kernel does is vectorized pandas over the bucket's sorted frame
    (group sizes, distinct days/types, min/max, modal type with the
    deterministic (count DESC, type ASC) tie-break, running-peak drawdown,
    30-minute session breaks) — no per-user Python loop.

    Exact integer outputs end-to-end (cents, epoch-us, counts);
    ``mean_gap_us`` is a floor division of non-negative spans, so the
    DuckDB oracle's ``//`` agrees.  Output, sorted by user: (user_id,
    n_events, n_active_days, first_ts_us, last_ts_us, total_value_c2,
    max_value_c2, n_types, modal_event, modal_count, max_drawdown_c2,
    mean_gap_us, sessions_30m).  Consumed by ``tools/run_features.py``,
    which publishes it as a lineage-guarded hive-partitioned table.
    Beyond-reference engine addition (SURVEY.md §2.8)."""
    import numpy as np

    nb = _user_buckets(sf_dir)
    ds = _read_events(
        sf_dir, ["event_id", "ts", "user_id", "event_type", "value"]
    )

    def keyed(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        u = df["user_id"].astype("int64")
        return pd.DataFrame(
            {
                "ub": (u % nb).astype("int32"),
                "user_id": u,
                "event_id": df["event_id"].astype("int64"),
                "tu": df["ts"].astype("datetime64[us]").astype("int64"),
                "event_type": df["event_type"].astype(str),
                "v_c2": (df["value"] * 100).round().astype("int64"),
            }
        )

    def featurize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "tu", "event_id"]).reset_index(drop=True)
        g["day"] = g["tu"] // 86_400_000_000
        by = g.groupby("user_id", sort=True)
        base = by.agg(
            n_events=("tu", "size"),
            n_active_days=("day", "nunique"),
            first_ts_us=("tu", "min"),
            last_ts_us=("tu", "max"),
            total_value_c2=("v_c2", "sum"),
            max_value_c2=("v_c2", "max"),
            n_types=("event_type", "nunique"),
        )
        # modal type: deterministic (count DESC, type ASC) tie-break
        mc = (
            g.groupby(["user_id", "event_type"], sort=True)
            .size()
            .reset_index(name="cnt")
            .sort_values(
                ["user_id", "cnt", "event_type"],
                ascending=[True, False, True],
            )
            .drop_duplicates("user_id")
            .set_index("user_id")
        )
        base["modal_event"] = mc["event_type"]
        base["modal_count"] = mc["cnt"]
        # running-peak drawdown (the user_drawdown kernel)
        cum = by["v_c2"].cumsum()
        peak = cum.groupby(g["user_id"]).cummax()
        base["max_drawdown_c2"] = (peak - cum).groupby(g["user_id"]).max()
        # mean inter-event gap (floor) + 30-minute session count
        span = base["last_ts_us"] - base["first_ts_us"]
        n1 = (base["n_events"] - 1).clip(lower=1)
        base["mean_gap_us"] = np.where(
            base["n_events"] > 1, span // n1, 0
        ).astype("int64")
        gap = by["tu"].diff()
        base["sessions_30m"] = (
            (gap > SESSION_BREAK_US).groupby(g["user_id"]).sum().astype("int64")
            + 1
        )
        out = base.reset_index()
        intcols = [c for c in out.columns if c not in ("modal_event",)]
        return out.astype({c: "int64" for c in intcols})

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(featurize, batch_format="pandas")
        .sort("user_id")
    )


USER_FEATURES_SQL = f"""
WITH x AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(ROUND(value*100) AS BIGINT) AS v,
         epoch_us(ts) AS tu,
         epoch_us(ts) // 86400000000 AS day
  FROM events
),
base AS (
  SELECT user_id, COUNT(*) AS n_events,
         COUNT(DISTINCT day) AS n_active_days,
         MIN(tu) AS first_ts_us, MAX(tu) AS last_ts_us,
         SUM(v) AS total_value_c2, MAX(v) AS max_value_c2,
         COUNT(DISTINCT event_type) AS n_types
  FROM x GROUP BY user_id
),
modal AS (
  SELECT user_id, event_type AS modal_event, cnt AS modal_count
  FROM (SELECT user_id, event_type, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY COUNT(*) DESC, event_type) AS rk
        FROM x GROUP BY user_id, event_type)
  WHERE rk = 1
),
c AS (
  SELECT user_id,
         SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM x
),
p AS (
  SELECT user_id, cum,
         MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS peak
  FROM (SELECT user_id, ts, event_id, cum,
               ts AS o_ts, event_id AS o_eid
        FROM (SELECT user_id, ts, event_id,
                     SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
              FROM x))
),
dd AS (SELECT user_id, MAX(peak - cum) AS max_drawdown_c2 FROM p
       GROUP BY user_id),
gaps AS (
  SELECT user_id,
         SUM(CASE WHEN gap > {SESSION_BREAK_US} THEN 1 ELSE 0 END) AS breaks
  FROM (SELECT user_id,
               tu - LAG(tu) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS gap
        FROM x)
  WHERE gap IS NOT NULL GROUP BY user_id
)
SELECT b.user_id, CAST(b.n_events AS BIGINT) AS n_events,
       CAST(b.n_active_days AS BIGINT) AS n_active_days,
       CAST(b.first_ts_us AS BIGINT) AS first_ts_us,
       CAST(b.last_ts_us AS BIGINT) AS last_ts_us,
       CAST(b.total_value_c2 AS BIGINT) AS total_value_c2,
       CAST(b.max_value_c2 AS BIGINT) AS max_value_c2,
       CAST(b.n_types AS BIGINT) AS n_types,
       m.modal_event, CAST(m.modal_count AS BIGINT) AS modal_count,
       CAST(dd.max_drawdown_c2 AS BIGINT) AS max_drawdown_c2,
       CAST(CASE WHEN b.n_events > 1
                 THEN (b.last_ts_us - b.first_ts_us) // (b.n_events - 1)
                 ELSE 0 END AS BIGINT) AS mean_gap_us,
       CAST(COALESCE(g.breaks, 0) + 1 AS BIGINT) AS sessions_30m
FROM base b
JOIN modal m ON m.user_id = b.user_id
JOIN dd ON dd.user_id = b.user_id
LEFT JOIN gaps g ON g.user_id = b.user_id
ORDER BY b.user_id
"""


# -- Kaplan-Meier survival (time to first purchase) -----------------------------

def km_survival(sf_dir: str) -> "pd.DataFrame":
    """Kaplan–Meier survival curve for days-until-first-'purchase',
    censoring users who never purchase at their last observed event — the
    survival-analysis estimator (Kaplan & Meier 1958) a retention team
    runs on activation funnels, with censoring handled properly (a user
    still active without purchasing is NOT a zero).

    Determinism: the product-limit recurrence runs in fixed micro-units,
    ``S_mu ← (S_mu·(n_t−d_t)) // n_t`` over event-days ascending — a
    floored sequential product both sides replay identically (the
    ``ewma_user_value`` recursive-CTE contract; all quantities are
    non-negative so DuckDB's truncating ``//`` is floor).

    Scale shape: ONE user-bucket co-location folds each user to
    (duration_days, observed) — the kernel is vectorized groupby min/max —
    and only the (duration, observed) COUNT table (≤ span-days × 2 rows)
    reaches the driver, which replays the recurrence over death-days in
    Python ints.  Output: (duration_days, n_risk, n_events, n_censored,
    km_survival_mu).  Beyond-reference engine addition (SURVEY.md §2.8)."""
    from ray.data.aggregate import Sum

    nb = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["ts", "user_id", "event_type"])

    def keyed(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        u = df["user_id"].astype("int64")
        tu = df["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "ub": (u % nb).astype("int32"),
                "user_id": u,
                "tu": tu,
                "is_p": (df["event_type"] == "purchase").astype("int8"),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        by = g.groupby("user_id", sort=True)
        first = by["tu"].min()
        last = by["tu"].max()
        fp = g[g["is_p"] == 1].groupby("user_id", sort=True)["tu"].min()
        end = fp.reindex(first.index)
        observed = end.notna()
        end = end.fillna(last)
        dur = ((end - first) // 86_400_000_000).astype("int64")
        out = pd.DataFrame(
            {"d": dur, "observed": observed.astype("int8")}
        )
        c = out.groupby(["d", "observed"], sort=True).size().reset_index(name="c")
        return c.astype({"d": "int64", "observed": "int8", "c": "int64"})

    counts = (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(fold, batch_format="pandas")
        .groupby(["d", "observed"])
        .aggregate(Sum("c", alias_name="n"))
        .to_pandas()  # O(span days x 2)
    )
    tbl: dict[int, list[int]] = {}
    for d, o, n in zip(counts["d"], counts["observed"], counts["n"]):
        e = tbl.setdefault(int(d), [0, 0])
        e[int(o)] += int(n)  # [censored, deaths]
    total = sum(c + d for c, d in tbl.values())
    at_risk = total
    s_mu = 1_000_000
    rows = []
    for d in sorted(tbl):
        cens, deaths = tbl[d]
        if deaths > 0:
            s_mu = (s_mu * (at_risk - deaths)) // at_risk
            rows.append(
                {"duration_days": d, "n_risk": at_risk, "n_events": deaths,
                 "n_censored": cens, "km_survival_mu": s_mu}
            )
        at_risk -= deaths + cens
    return pd.DataFrame(rows).astype(
        {c: "int64" for c in
         ("duration_days", "n_risk", "n_events", "n_censored",
          "km_survival_mu")}
    )


KM_SURVIVAL_SQL = """
WITH RECURSIVE per_user AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS first_tu,
         MAX(epoch_us(ts)) AS last_tu,
         MIN(CASE WHEN event_type = 'purchase'
                  THEN epoch_us(ts) END) AS fp_tu
  FROM events GROUP BY user_id
),
dur AS (
  SELECT (COALESCE(fp_tu, last_tu) - first_tu) // 86400000000 AS d,
         CASE WHEN fp_tu IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM per_user
),
tb AS (
  SELECT d,
         SUM(observed) AS deaths,
         SUM(1 - observed) AS cens
  FROM dur GROUP BY d
),
ordered AS (
  SELECT d, deaths, cens,
         ROW_NUMBER() OVER (ORDER BY d) AS rn,
         (SELECT COUNT(*) FROM dur)
           - COALESCE(SUM(deaths + cens) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM tb
),
rec AS (
  SELECT rn, d, deaths, cens, n_risk,
         CASE WHEN deaths > 0
              THEN (CAST(1000000 AS HUGEINT) * (n_risk - deaths)) // n_risk
              ELSE CAST(1000000 AS HUGEINT) END AS s_mu
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.rn, o.d, o.deaths, o.cens, o.n_risk,
         CASE WHEN o.deaths > 0
              THEN (r.s_mu * (o.n_risk - o.deaths)) // o.n_risk
              ELSE r.s_mu END
  FROM rec r JOIN ordered o ON o.rn = r.rn + 1
)
SELECT CAST(d AS BIGINT) AS duration_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(deaths AS BIGINT) AS n_events,
       CAST(cens AS BIGINT) AS n_censored,
       CAST(s_mu AS BIGINT) AS km_survival_mu
FROM rec WHERE deaths > 0
ORDER BY duration_days
"""


# -- lead-lag cross-correlation between type pairs ------------------------------

CCF_LAGS = (1, 7)


def ccf_type_pairs(sf_dir: str) -> "pd.DataFrame":
    """Lead–lag cross-correlation ingredients between every ORDERED pair
    of event types over the zero-filled daily count series: does type a at
    day t predict type b at day t+k?  (The pairwise sibling of
    ``acf_daily_by_type`` — same cleared-denominator exactness, same single
    (type, day) count fold feeding the whole statistic.)

    For each ordered pair (a, b) and lag k: ccf_num = m²·Σ a_t·b_{t+k}
    − m·S_b·pre_a − m·S_a·post_b + (m−k)·S_a·S_b, reported beside the two
    full-series variance numerators (var_x_num = m²·ΣC² − m·S²), so
    r = ccf_num/√(var_a·var_b) is one caller-side division — no float or
    sqrt ever crosses the oracle boundary.  Output: (type_a, type_b, lag,
    n_days, ccf_num, var_a_num, var_b_num).  Beyond-reference engine
    addition (SURVEY.md §2.8)."""
    import itertools

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        folded = pa.table({"e": t["event_type"], "day": day})
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate(
            [([], "count_all")]
        )

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|types| x span days)
    )
    d0, d1 = int(d["day"].min()), int(d["day"].max())
    m = d1 - d0 + 1
    series = {
        e: dict(zip(sub["day"].astype(int), sub["c"].astype(int)))
        for e, sub in d.groupby("e")
    }
    stats = {}
    for e, cs in series.items():
        s1 = sum(cs.values())
        s2 = sum(c * c for c in cs.values())
        stats[e] = (s1, m * m * s2 - m * s1 * s1)
    rows = []
    for a, b in itertools.permutations(sorted(series), 2):
        ca, cb = series[a], series[b]
        sa, va = stats[a]
        sb, vb = stats[b]
        for k in CCF_LAGS:
            cross = sum(c * cb.get(day + k, 0) for day, c in ca.items())
            pre_a = sum(c for day, c in ca.items() if day <= d1 - k)
            post_b = sum(c for day, c in cb.items() if day >= d0 + k)
            num = (m * m * cross - m * sb * pre_a - m * sa * post_b
                   + (m - k) * sa * sb)
            rows.append(
                {"type_a": a, "type_b": b, "lag": k, "n_days": m,
                 "ccf_num": num, "var_a_num": va, "var_b_num": vb}
            )
    return (
        pd.DataFrame(sorted(rows, key=lambda r:
                            (r["type_a"], r["type_b"], r["lag"])))
        .astype({c: "int64" for c in
                 ("lag", "n_days", "ccf_num", "var_a_num", "var_b_num")})
        .reset_index(drop=True)
    )


CCF_TYPE_PAIRS_SQL = f"""
WITH d AS (
  SELECT event_type AS e, epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS HUGEINT) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT MIN(day) AS d0, MAX(day) AS d1,
                MAX(day) - MIN(day) + 1 AS m FROM d),
s AS (SELECT e, SUM(c) AS s1, SUM(c * c) AS s2 FROM d GROUP BY e),
tp AS (SELECT a.e AS ea, b.e AS eb FROM s a JOIN s b ON a.e <> b.e),
lags(k) AS (VALUES {", ".join(f"({k})" for k in CCF_LAGS)}),
cross_k AS (
  SELECT t.ea, t.eb, l.k, COALESCE(SUM(a.c * b.c), 0) AS cr
  FROM tp t CROSS JOIN lags l
  LEFT JOIN d a ON a.e = t.ea
  LEFT JOIN d b ON b.e = t.eb AND b.day = a.day + l.k
  GROUP BY 1, 2, 3
),
edge AS (
  SELECT t.ea, t.eb, l.k,
         (SELECT COALESCE(SUM(c), 0) FROM d, span
          WHERE d.e = t.ea AND d.day <= span.d1 - l.k) AS pre_a,
         (SELECT COALESCE(SUM(c), 0) FROM d, span
          WHERE d.e = t.eb AND d.day >= span.d0 + l.k) AS post_b
  FROM tp t CROSS JOIN lags l
)
SELECT e.ea AS type_a, e.eb AS type_b, CAST(e.k AS BIGINT) AS lag,
       CAST(span.m AS BIGINT) AS n_days,
       CAST(span.m * span.m * c.cr - span.m * sb.s1 * e.pre_a
            - span.m * sa.s1 * e.post_b
            + (span.m - e.k) * sa.s1 * sb.s1 AS BIGINT) AS ccf_num,
       CAST(span.m * span.m * sa.s2 - span.m * sa.s1 * sa.s1 AS BIGINT)
         AS var_a_num,
       CAST(span.m * span.m * sb.s2 - span.m * sb.s1 * sb.s1 AS BIGINT)
         AS var_b_num
FROM edge e
JOIN cross_k c ON c.ea = e.ea AND c.eb = e.eb AND c.k = e.k
JOIN s sa ON sa.e = e.ea
JOIN s sb ON sb.e = e.eb
CROSS JOIN span
ORDER BY type_a, type_b, lag
"""


# -- longest active-day streak per user (gaps and islands) ----------------------

def user_day_streaks(sf_dir: str) -> Dataset:
    """Longest run of CONSECUTIVE active days per user — the
    gaps-and-islands engagement metric (login streaks).  The classic
    SQL identity (day − dense_rank is constant within an island) runs
    vectorized inside ONE user-bucket co-location: distinct (user, day)
    pairs, sorted; island id = day − cumcount within user; the longest
    island and the island count fall out of two groupbys — no Python loop,
    no second exchange.  Output: (user_id, n_active_days, n_streaks,
    max_streak_days)."""
    import numpy as np

    nb = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["ts", "user_id"])

    def keyed(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        u = df["user_id"].astype("int64")
        day = (
            df["ts"].astype("datetime64[us]").astype("int64")
            // 86_400_000_000
        )
        out = pd.DataFrame({"user_id": u, "day": day}).drop_duplicates()
        out["ub"] = (out["user_id"] % nb).astype("int32")
        return out

    def streaks(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g[["user_id", "day"]].drop_duplicates()
            .sort_values(["user_id", "day"])
            .reset_index(drop=True)
        )
        pos = g.groupby("user_id", sort=True).cumcount()
        g["island"] = g["day"] - pos
        isl = (
            g.groupby(["user_id", "island"], sort=True)
            .size()
            .reset_index(name="len")
        )
        out = isl.groupby("user_id", sort=True).agg(
            n_streaks=("len", "size"), max_streak_days=("len", "max")
        )
        out["n_active_days"] = isl.groupby("user_id")["len"].sum()
        return out.reset_index()[
            ["user_id", "n_active_days", "n_streaks", "max_streak_days"]
        ].astype("int64")

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(streaks, batch_format="pandas")
        .sort("user_id")
    )


USER_DAY_STREAKS_SQL = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
isl AS (
  SELECT user_id,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM d
),
runs AS (
  SELECT user_id, island, COUNT(*) AS len
  FROM isl GROUP BY user_id, island
)
SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS max_streak_days
FROM runs GROUP BY user_id ORDER BY user_id
"""


# -- Markov stationary distribution of the event-type chain --------------------

#: Power-iteration rounds for ``markov_stationary`` — enough for the
#: 5-state empirical chain to mix to well past ppm precision, small enough
#: to unroll as chained CTEs in the oracle.
MARKOV_ITERS = 12


def markov_stationary(sf_dir: str) -> "pd.DataFrame":
    """Stationary distribution of the per-user event-type Markov chain —
    the long-run occupancy each event type converges to if users keep
    transitioning per the empirical first-order chain (the PageRank-style
    fixed point of behavioral-sequence models).

    One user-bucket co-location builds the transition-count table (each
    user's consecutive (ts, event_id)-ordered pairs are bucket-local;
    per-bucket (a, b) count partials pre-fold, so the global groupby sees
    |types|² cells — corpus-size-free).  The driver then runs
    ``MARKOV_ITERS`` rounds of fixed-point power iteration in exact ppm
    integers: π⁰ is the floored-uniform vector (remainder to the
    lexicographically first states) and each step is
    π'_b = Σ_a floor(π_a · c_ab / rowsum_a) — all floors, so the oracle's
    unrolled chained-CTE replay is bit-identical (the ``gbdt_boost_rounds``
    fixed-round-unroll pattern; DuckDB ``//`` truncates = floors on the
    non-negative domain).  Output: (event_type, out_trans, pi_ppm).
    Beyond-reference engine addition (SURVEY.md §2.8)."""
    import numpy as np

    from ray.data.aggregate import Sum

    nb = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def keyed(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, nb - 1), pa.int32()),
                "user_id": uid,
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "event_type": t["event_type"],
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"])
        same = g["user_id"].to_numpy()[:-1] == g["user_id"].to_numpy()[1:]
        et = g["event_type"].to_numpy()
        out = pd.DataFrame({"a": et[:-1][same], "b": et[1:][same]})
        agg = out.groupby(["a", "b"], as_index=False).size().rename(
            columns={"size": "n"}
        )
        agg["n"] = agg["n"].astype("int64")
        return agg

    t = (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= |types|^2 cells
    )
    states = sorted(set(t["a"]) | set(t["b"]))
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    c = np.zeros((k, k), dtype=np.int64)
    for r in t.itertuples():
        c[idx[r.a], idx[r.b]] = int(r.n)
    rowsum = c.sum(axis=1)
    pi = [10**6 // k + (1 if i < 10**6 % k else 0) for i in range(k)]
    for _ in range(MARKOV_ITERS):
        nxt = [0] * k
        for a in range(k):
            if rowsum[a] == 0:
                continue
            for b in range(k):
                nxt[b] += pi[a] * int(c[a, b]) // int(rowsum[a])
        pi = nxt
    return pd.DataFrame(
        {
            "event_type": states,
            "out_trans": rowsum.astype("int64"),
            "pi_ppm": np.array(pi, dtype=np.int64),
        }
    )


def _markov_sql() -> str:
    steps = []
    for i in range(1, MARKOV_ITERS + 1):
        steps.append(
            f"p{i} AS (\n"
            f"  SELECT t.b AS s, SUM(p{i-1}.p * t.n // rs.rs) AS p\n"
            f"  FROM p{i-1} JOIN t ON p{i-1}.s = t.a\n"
            f"  JOIN rs ON rs.a = t.a\n"
            f"  GROUP BY t.b\n"
            f")"
        )
    chain = ",\n".join(steps)
    last = f"p{MARKOV_ITERS}"
    return f"""
WITH seq AS (
  SELECT event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS nxt
  FROM events
),
t AS (
  SELECT event_type AS a, nxt AS b, COUNT(*) AS n
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
),
rs AS (SELECT a, SUM(n) AS rs FROM t GROUP BY a),
st AS (
  SELECT a AS s, ROW_NUMBER() OVER (ORDER BY a) - 1 AS rnk,
         COUNT(*) OVER () AS k
  FROM (SELECT DISTINCT a FROM t UNION SELECT DISTINCT b FROM t)
),
p0 AS (
  SELECT s, CAST(1000000 // k
         + CASE WHEN rnk < 1000000 % k THEN 1 ELSE 0 END AS BIGINT) AS p
  FROM st
),
{chain}
SELECT st.s AS event_type,
       CAST(COALESCE(rs.rs, 0) AS BIGINT) AS out_trans,
       CAST(COALESCE({last}.p, 0) AS BIGINT) AS pi_ppm
FROM st LEFT JOIN rs ON rs.a = st.s
        LEFT JOIN {last} ON {last}.s = st.s
ORDER BY event_type
"""


MARKOV_STATIONARY_SQL = _markov_sql()


# -- changepoint detection over daily counts -----------------------------------

def cpd_daily_by_type(sf_dir: str) -> "pd.DataFrame":
    """Single best changepoint of each event type's zero-filled daily count
    series — binary-segmentation step one (the CUSUM/least-squares split
    that maximizes between-segment variance reduction; Scott-Knott / ruptures
    style).  For a split after k of m days with left-sum s_l and total s,
    the reduction is (m·s_l − k·s)² / (m·k·(m−k)); dropping the constant m
    gives the per-k score h(k) = (m·s_l − k·s)² / (k·(m−k)).  The CONTRACT
    statistic is the floored fixed-point ``h_scaled = (m·s_l − k·s)²·1024
    // (k·(m−k))`` with argmax tie-broken toward the smaller k, so both
    sides replay identically in integers (the fixed-point-lattice pattern;
    all quantities non-negative so DuckDB's truncating ``//`` floors).

    One (type, day) count fold is the only exchange (|types| × span-days
    cells, corpus-size-free); the driver's zero-filled prefix scan over the
    span is O(m) Python ints per type.  Output: (event_type, n_days,
    total, split_k, h_scaled).  Beyond-reference engine addition
    (SURVEY.md §2.8)."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        folded = pa.table({"e": t["event_type"], "day": day})
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate(
            [([], "count_all")]
        )

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|types| x span days)
    )
    d0, d1 = int(d["day"].min()), int(d["day"].max())
    m = d1 - d0 + 1
    rows = []
    for e, sub in d.groupby("e"):
        counts = [0] * m
        for r in sub.itertuples():
            counts[int(r.day) - d0] = int(r.c)
        s = sum(counts)
        best_k, best_h = 0, -1
        sl = 0
        for k in range(1, m):
            sl += counts[k - 1]
            num = m * sl - k * s
            h = (num * num * 1024) // (k * (m - k))
            if h > best_h:
                best_k, best_h = k, h
        rows.append(
            {"event_type": e, "n_days": m, "total": s,
             "split_k": best_k, "h_scaled": best_h}
        )
    return (
        pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
        .astype({c: "int64" for c in
                 ("n_days", "total", "split_k", "h_scaled")})
        .reset_index(drop=True)
    )


CPD_DAILY_BY_TYPE_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
days AS (
  SELECT span.d0 + u.g AS day
  FROM span, (
    SELECT generate_series AS g FROM generate_series(0, 100000)
  ) u
  WHERE span.d0 + u.g <= span.d1
),
types AS (SELECT DISTINCT event_type FROM d),
z AS (
  SELECT t.event_type, dd.day, COALESCE(d.c, 0) AS c
  FROM types t CROSS JOIN days dd
  LEFT JOIN d ON d.event_type = t.event_type AND d.day = dd.day
),
cum AS (
  SELECT event_type,
         SUM(c) OVER (PARTITION BY event_type ORDER BY day) AS sl,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k,
         SUM(c) OVER (PARTITION BY event_type) AS s,
         COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM z
),
sc AS (
  SELECT event_type, k, s, m,
         (CAST(m * sl - k * s AS HUGEINT)
          * (m * sl - k * s) * 1024) // (CAST(k AS HUGEINT) * (m - k))
           AS h
  FROM cum WHERE k < m
)
SELECT event_type, CAST(m AS BIGINT) AS n_days, CAST(s AS BIGINT) AS total,
       CAST(k AS BIGINT) AS split_k, CAST(h AS BIGINT) AS h_scaled
FROM sc
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h DESC, k ASC) = 1
ORDER BY event_type
"""


# -- exact trailing-window rolling median --------------------------------------

def rolling_median_value(sf_dir: str) -> Dataset:
    """Exact trailing-5-event rolling MEDIAN of each user's value stream —
    the holistic windowed aggregate (unlike sum/mean, a median cannot be
    expressed as running partials, which is why warehouses special-case
    it).  The window is odd and values are integer cents, so the median is
    integer-exact and hash-matches the window-function oracle.

    One user-bucket co-location is the only exchange; the in-bucket kernel
    sorts once and computes every user's rolling median via pandas'
    C-level ``groupby(...).rolling(5).median()`` — no Python loop.  Only
    full windows emit (row number >= 5 within the user).  Output:
    (event_id, med_c2), one row per event past the warm-up.
    Beyond-reference engine addition (SURVEY.md §2.8)."""
    nb = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, nb - 1), pa.int32()),
                "user_id": uid,
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "v_c2": pc.cast(
                    pc.round(pc.multiply(t["value"], 100.0)), pa.int64()
                ),
            }
        )

    def kernel(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts_us", "event_id"]).reset_index(drop=True)
        med = (
            g.groupby("user_id")["v_c2"]
            .rolling(window=5, min_periods=5)
            .median()
            .reset_index(level=0, drop=True)
        )
        keep = med.notna()
        return pa.table(
            {
                "event_id": pa.array(
                    g.loc[keep, "event_id"].to_numpy("int64")
                ),
                "med_c2": pa.array(med[keep].to_numpy("int64")),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(kernel, batch_format="pandas")
    )


ROLLING_MEDIAN_VALUE_SQL = """
WITH v AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS v_c2
  FROM events
),
w AS (
  SELECT event_id,
         CAST(median(v_c2) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS med_c2,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS rn
  FROM v
)
SELECT event_id, med_c2 FROM w WHERE rn >= 5 ORDER BY event_id
"""


# -- Holt linear-trend smoothing ------------------------------------------------

def holt_linear_by_type(sf_dir: str) -> "pd.DataFrame":
    """Holt's linear-trend double exponential smoothing of each event
    type's zero-filled daily count series, with power-of-two gains
    α = β = 1/4 so every smoothing step is an exact floored fixed-point
    update (the ``ewma_user_value`` trick lifted to two-state smoothing):

        L_t = ⌊(v_t·10⁶ + 3·(L_{t−1} + B_{t−1})) / 4⌋
        B_t = ⌊(L_t − L_{t−1} + 3·B_{t−1}) / 4⌋        (L_0 = v_0·10⁶, B_0 = 0)

    B_t can be negative, so BOTH sides floor: Python ``//`` floors
    natively; the oracle's recursive CTE uses the non-negative-remainder
    emulation (the ``theil_sen_by_type`` pattern — DuckDB ``//``
    truncates).  One (type, day) count fold is the only exchange; the
    driver replays O(span) exact-integer steps per type.  Output:
    (event_type, n_days, level_u, trend_u, forecast7_u) with the 7-day-
    ahead forecast L + 7B.  Beyond-reference engine addition
    (SURVEY.md §2.8)."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        folded = pa.table({"e": t["event_type"], "day": day})
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate(
            [([], "count_all")]
        )

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|types| x span days)
    )
    d0, d1 = int(d["day"].min()), int(d["day"].max())
    m = d1 - d0 + 1
    rows = []
    for e, sub in d.groupby("e"):
        counts = [0] * m
        for r in sub.itertuples():
            counts[int(r.day) - d0] = int(r.c)
        lvl, tr = counts[0] * 10**6, 0
        for v in counts[1:]:
            lnew = (v * 10**6 + 3 * (lvl + tr)) // 4
            tr = (lnew - lvl + 3 * tr) // 4
            lvl = lnew
        rows.append(
            {"event_type": e, "n_days": m, "level_u": lvl, "trend_u": tr,
             "forecast7_u": lvl + 7 * tr}
        )
    return (
        pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
        .astype({c: "int64" for c in
                 ("n_days", "level_u", "trend_u", "forecast7_u")})
        .reset_index(drop=True)
    )


HOLT_LINEAR_BY_TYPE_SQL = """
WITH RECURSIVE d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
days AS (
  SELECT span.d0 + u.g AS day
  FROM span, (
    SELECT generate_series AS g FROM generate_series(0, 100000)
  ) u
  WHERE span.d0 + u.g <= span.d1
),
types AS (SELECT DISTINCT event_type FROM d),
z AS (
  SELECT t.event_type, dd.day, COALESCE(d.c, 0) AS c
  FROM types t CROSS JOIN days dd
  LEFT JOIN d ON d.event_type = t.event_type AND d.day = dd.day
),
it AS (
  SELECT z.event_type, z.day,
         CAST(z.c * 1000000 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b
  FROM z WHERE z.day = (SELECT d0 FROM span)
  UNION ALL
  SELECT s.event_type, s.day, s.lnew,
         (s.lnew - s.l + 3 * s.b
          - ((((s.lnew - s.l + 3 * s.b) % 4) + 4) % 4)) // 4
  FROM (
    SELECT it.event_type, z.day, it.l, it.b,
           (z.c * 1000000 + 3 * (it.l + it.b)
            - ((((z.c * 1000000 + 3 * (it.l + it.b)) % 4) + 4) % 4)) // 4
             AS lnew
    FROM it JOIN z ON z.event_type = it.event_type AND z.day = it.day + 1
  ) s
)
SELECT event_type,
       CAST((SELECT d1 - d0 + 1 FROM span) AS BIGINT) AS n_days,
       l AS level_u, b AS trend_u,
       CAST(l + 7 * b AS BIGINT) AS forecast7_u
FROM it WHERE day = (SELECT d1 FROM span)
ORDER BY event_type
"""


# -- sequential pattern mining (MATCH_RECOGNIZE-style) -------------------------

SEQ_PATTERN = ("view", "click", "purchase")  # adjacent triple, distinct kinds


def seq_pattern_hits(sf_dir: str) -> "object":
    """Count, per user, the non-overlapping occurrences of the ADJACENT
    event pattern view -> click -> purchase in the time-ordered stream —
    the MATCH_RECOGNIZE / sessions-that-convert-immediately primitive —
    then histogram users by hit count (hits, n_users), zero-hit users
    included so the rows sum to the user population.

    The pattern's three kinds are distinct, so occurrences cannot overlap
    and the count equals the number of matching window positions — which
    makes the kernel fully vectorized: users co-locate by the derived
    bucket, ONE sort per bucket, then a shifted boolean AND over the type
    array (no per-user Python, no string assembly).  Per-bucket partials
    are (hits, n_users) histograms, so the final exchange is O(max_hits)
    rows per bucket."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    nb = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, nb - 1), pa.int32()),
                "user_id": uid,
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "event_type": t["event_type"],
                "ts_us": pc.cast(t["ts"].cast(pa.timestamp("us")), pa.int64()),
            }
        )

    a, b, c = SEQ_PATTERN

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"])
        t = g["event_type"].to_numpy()
        u = g["user_id"].to_numpy()
        if len(g) >= 3:
            m = (
                (t[:-2] == a)
                & (t[1:-1] == b)
                & (t[2:] == c)
                & (u[:-2] == u[2:])  # window stays inside one user's run
            )
            hit_users = u[:-2][m]
        else:
            hit_users = np.empty(0, dtype=np.int64)
        per_user = pd.Series(0, index=pd.unique(u), dtype="int64")
        if len(hit_users):
            add = pd.Series(hit_users).value_counts()
            per_user = per_user.add(add, fill_value=0).astype("int64")
        out = per_user.value_counts().sort_index()
        return pd.DataFrame(
            {
                "hits": out.index.to_numpy(dtype=np.int64),
                "n_users": out.to_numpy(dtype=np.int64),
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(hist, batch_format="pandas")
        .groupby("hits")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()  # <= max-hits-per-user rows
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("hits").reset_index(drop=True).astype("int64")


SEQ_PATTERN_HITS_SQL = f"""
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER w AS t1,
         LEAD(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), per_user AS (
  SELECT u.user_id, COALESCE(h.hits, 0) AS hits
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN (
    SELECT user_id, COUNT(*) AS hits FROM s
    WHERE event_type = '{SEQ_PATTERN[0]}' AND t1 = '{SEQ_PATTERN[1]}'
          AND t2 = '{SEQ_PATTERN[2]}'
    GROUP BY user_id
  ) h USING (user_id)
)
SELECT CAST(hits AS BIGINT) AS hits, CAST(COUNT(*) AS BIGINT) AS n_users
FROM per_user GROUP BY hits ORDER BY hits
"""


# -- MASE: mean absolute scaled error of the naive forecast ---------------------

def mase_weekly(sf_dir: str) -> "pd.DataFrame":
    """MASE (Hyndman & Koehler 2006) of the one-step naive forecast
    against the seasonal (lag-7) naive on each type's zero-filled daily
    series — the scale-free forecastability audit: mase < 1e6 ppm means
    yesterday's value beats last week's.  Exact by clearing denominators:
    N_k = sum over the span of |y_t - y_{t-k}| decomposes over the SPARSE
    observed days as sum(|c_t - c_{t-k}|-c_t-c_{t-k}) over both-observed
    pairs (two-pointer walk) + the edge-windowed single sums, identical
    to the acf_daily_by_type discipline; mase_ppm = (N1*(m-7)*1e6) //
    (N7*(m-1)).  One (type, day) fold is the only exchange.  Output:
    (event_type, n_days, n1_sum, n7_sum, mase_ppm)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        folded = pa.table({"e": t["event_type"], "day": day})
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate(
            [([], "count_all")]
        )

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|types| x span days)
    )
    d0, d1 = int(d["day"].min()), int(d["day"].max())
    m = d1 - d0 + 1

    def n_k(days: list, cs: list, k: int) -> int:
        total = sum(c for day, c in zip(days, cs) if day >= d0 + k)
        total += sum(c for day, c in zip(days, cs) if day <= d1 - k)
        j = 0
        for i, day in enumerate(days):
            while j < len(days) and days[j] < day - k:
                j += 1
            if j < len(days) and days[j] == day - k:
                total += abs(cs[i] - cs[j]) - cs[i] - cs[j]
        return total

    rows = []
    for e, sub in d.groupby("e"):
        series = sorted(
            (int(day), int(c)) for day, c in zip(sub["day"], sub["c"])
        )
        days = [x[0] for x in series]
        cs = [x[1] for x in series]
        n1 = n_k(days, cs, 1)
        n7 = n_k(days, cs, 7)
        mase = (n1 * (m - 7) * 10 ** 6) // (n7 * (m - 1)) if n7 > 0 else -1
        rows.append(
            {
                "event_type": e,
                "n_days": m,
                "n1_sum": n1,
                "n7_sum": n7,
                "mase_ppm": mase,
            }
        )
    out = pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
    for c in ("n_days", "n1_sum", "n7_sum", "mase_ppm"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


MASE_WEEKLY_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT MIN(day) AS d0, MAX(day) AS d1,
                MAX(day) - MIN(day) + 1 AS m FROM d),
lags(k) AS (VALUES (1), (7)),
edge AS (
  SELECT d.event_type, l.k,
         CAST(SUM(CASE WHEN d.day >= span.d0 + l.k THEN d.c ELSE 0 END)
              AS HUGEINT)
         + CAST(SUM(CASE WHEN d.day <= span.d1 - l.k THEN d.c ELSE 0 END)
              AS HUGEINT) AS singles
  FROM d, span, lags l GROUP BY 1, 2
),
both_obs AS (
  SELECT a.event_type, l.k,
         SUM(CAST(abs(a.c - b.c) AS HUGEINT) - a.c - b.c) AS adj
  FROM d a JOIN lags l ON TRUE
  JOIN d b ON b.event_type = a.event_type AND b.day = a.day - l.k
  GROUP BY 1, 2
),
nk AS (
  SELECT e.event_type, e.k, e.singles + COALESCE(b.adj, 0) AS n_sum
  FROM edge e LEFT JOIN both_obs b USING (event_type, k)
)
SELECT n1.event_type, CAST(span.m AS BIGINT) AS n_days,
       CAST(n1.n_sum AS BIGINT) AS n1_sum,
       CAST(n7.n_sum AS BIGINT) AS n7_sum,
       CAST(CASE WHEN n7.n_sum > 0
                 THEN (n1.n_sum * (span.m - 7) * 1000000)
                      // (n7.n_sum * (span.m - 1))
                 ELSE -1 END AS BIGINT) AS mase_ppm
FROM nk n1 JOIN nk n7 ON n1.event_type = n7.event_type AND n7.k = 7
CROSS JOIN span
WHERE n1.k = 1
ORDER BY n1.event_type
"""


# -- conversion latency quantiles -----------------------------------------------

CONV_QS = (50, 90, 99)


def conversion_latency_quantiles(sf_dir: str) -> "pd.DataFrame":
    """Exact p50/p90/p99 of the first-view -> first-purchase latency (in
    whole seconds) across converting users — the product-analytics
    time-to-convert distribution.  One user-bucket co-location builds the
    per-user (min view ts, min purchase ts) pairs with a vectorized
    masked-min kernel; converting users' floored-second latencies
    materialize once and the exact order statistics come from the two-pass
    counting histogram (driver holds touched-bucket counts, never rows).
    Rank convention k = (q*(n-1))//100, 0-based, same as the oracle's
    ROW_NUMBER form.  Output: (q_pct, latency_s)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    from .sketches import _floor_bucket

    nb = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, nb - 1), pa.int32()),
                "user_id": uid,
                "event_type": t["event_type"],
                "ts_us": pc.cast(t["ts"].cast(pa.timestamp("us")), pa.int64()),
            }
        )

    def latencies(g: pd.DataFrame) -> pd.DataFrame:
        v = (
            g[g["event_type"] == "view"]
            .groupby("user_id")["ts_us"].min()
        )
        p = (
            g[g["event_type"] == "purchase"]
            .groupby("user_id")["ts_us"].min()
        )
        both = v.index.intersection(p.index)
        lat = (p[both] - v[both]) // 1_000_000
        lat = lat[lat >= 0]
        return pd.DataFrame({"latency_s": lat.to_numpy(np.int64)})

    lat_ds = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(latencies, batch_format="pandas")
        .materialize()  # converting-user proportional; scanned twice below
    )
    n = lat_ds.count()
    ks = {q: (q * (n - 1)) // 100 for q in CONV_QS}

    def hist(t: pd.DataFrame) -> pa.Table:
        v = pa.array(t["latency_s"].to_numpy(np.int64), pa.int64())
        folded = pa.table({"b": _floor_bucket(v)})
        return pa.TableGroupBy(folded, "b").aggregate([([], "count_all")])

    counts = (
        lat_ds.map_batches(hist, batch_format="pandas")
        .groupby("b")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    cum = counts["n"].cumsum()
    need: dict[int, list[int]] = {}
    for q, k in ks.items():
        i = int((cum > k).idxmax())
        before = int(cum.iloc[i - 1]) if i > 0 else 0
        need.setdefault(int(counts.loc[i, "b"]), []).append(k - before)
    wanted = pa.array(sorted(need), pa.int64())

    def in_bucket(t: pd.DataFrame) -> pa.Table:
        v = pa.array(t["latency_s"].to_numpy(np.int64), pa.int64())
        b = _floor_bucket(v)
        sub = pa.table({"b": b, "v": v}).filter(
            pc.is_in(b, value_set=wanted)
        )
        return pa.TableGroupBy(sub, ["b", "v"]).aggregate([([], "count_all")])

    fine = (
        lat_ds.map_batches(in_bucket, batch_format="pandas")
        .groupby(["b", "v"])
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for q in CONV_QS:
        k = ks[q]
        i = int((cum > k).idxmax())
        before = int(cum.iloc[i - 1]) if i > 0 else 0
        b = int(counts.loc[i, "b"])
        g = fine[fine["b"] == b].sort_values("v").reset_index(drop=True)
        gc = g["n"].cumsum()
        j = int((gc > (k - before)).idxmax())
        rows.append({"q_pct": q, "latency_s": int(g.loc[j, "v"])})
    return pd.DataFrame(rows).astype("int64")


CONVERSION_LATENCY_SQL = f"""
WITH u AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
  FROM events GROUP BY user_id
),
lat AS (
  SELECT (p - v) // 1000000 AS latency_s
  FROM u WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v
),
nn AS (SELECT COUNT(*) AS n FROM lat),
r AS (
  SELECT latency_s, row_number() OVER (ORDER BY latency_s) - 1 AS rk FROM lat
),
qs(q) AS (VALUES {", ".join(f"({q})" for q in CONV_QS)})
SELECT CAST(qs.q AS BIGINT) AS q_pct, CAST(r.latency_s AS BIGINT) AS latency_s
FROM qs CROSS JOIN nn JOIN r ON r.rk = (qs.q * (nn.n - 1)) // 100
ORDER BY q_pct
"""


# -- Page-Hinkley drift statistic ------------------------------------------------

def page_hinkley_by_type(sf_dir: str) -> "pd.DataFrame":
    """Page-Hinkley cumulative-deviation drift statistic (Page 1954,
    Hinkley 1971) over each type's sequence of ACTIVE-day counts — the
    sequential mean-shift monitor: with the cleared-denominator cumulative
    M_t = T*S_t - t*S (T active days, S total count, S_t prefix sum), the
    statistic is PH = max_t (M_t - min_{s<=t} M_s), positive when the
    series' mean rises mid-stream.  All integers, driver scan is
    span-bounded (the holt/acf discipline), one (type, day) fold is the
    only exchange.  Ties take the earliest t.  Output: (event_type,
    n_days, ph_num, t_at) — the drift magnitude is ph_num / T per step."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        folded = pa.table({"e": t["event_type"], "day": day})
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate(
            [([], "count_all")]
        )

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|types| x span days)
    )
    rows = []
    for e, sub in d.groupby("e"):
        cs = [int(c) for _, c in sorted(zip(sub["day"], sub["c"]))]
        T = len(cs)
        S = sum(cs)
        s_t = 0
        run_min = 0  # M_0 = 0 (empty prefix)
        ph, at = 0, 0
        for i, c in enumerate(cs, start=1):
            s_t += c
            m_t = T * s_t - i * S
            if m_t - run_min > ph:
                ph, at = m_t - run_min, i
            if m_t < run_min:
                run_min = m_t
        rows.append(
            {"event_type": e, "n_days": T, "ph_num": ph, "t_at": at}
        )
    out = pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
    for c in ("n_days", "ph_num", "t_at"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


PAGE_HINKLEY_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT event_type, day, c,
         row_number() OVER w AS i,
         SUM(c) OVER w AS s_t,
         SUM(c) OVER (PARTITION BY event_type) AS s,
         COUNT(*) OVER (PARTITION BY event_type) AS t_days
  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
m AS (
  SELECT event_type, i, t_days,
         t_days * s_t - i * s AS m_t,
         LEAST(0, MIN(t_days * s_t - i * s) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) AS run_min
  FROM seq
),
ph AS (
  SELECT event_type, i, t_days, m_t - run_min AS gain,
         row_number() OVER (
           PARTITION BY event_type ORDER BY m_t - run_min DESC, i
         ) AS rk
  FROM m
)
SELECT event_type, CAST(t_days AS BIGINT) AS n_days,
       CAST(CASE WHEN gain > 0 THEN gain ELSE 0 END AS BIGINT) AS ph_num,
       CAST(CASE WHEN gain > 0 THEN i ELSE 0 END AS BIGINT) AS t_at
FROM ph WHERE rk = 1 ORDER BY event_type
"""


# -- Haar wavelet energy spectrum -------------------------------------------------

HAAR_LEVELS = 12          # 4096-day dyadic window
HAAR_SPAN = 1 << HAAR_LEVELS


def haar_energy_by_type(sf_dir: str) -> "pd.DataFrame":
    """Integer Haar wavelet energy spectrum of each type's zero-filled
    daily count series — the multiresolution periodicity audit (which
    time scale carries the variance: day-to-day noise, weekly cycle,
    long drift).  The unnormalized Haar transform is pure integer
    adds/subtracts: level j pairs adjacent level-(j-1) sums, detail
    d = left - right, energy_j = sum d^2 — exact at any scale (Python
    ints on the driver, HUGEINT in the 12-level unrolled oracle).
    Days index into a fixed 4096-day dyadic window anchored at the
    corpus min day (documented cap; longer spans need a larger window).
    Sparse-safe: missing days are zeros, and both engines compute
    c_{j}[k] and d_{j}[k] as signed sums over PRESENT rows only.
    One (type, day) fold is the only exchange.  Output:
    (event_type, level, energy)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        folded = pa.table({"e": t["event_type"], "day": day})
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate(
            [([], "count_all")]
        )

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|types| x span days)
    )
    d0 = int(d["day"].min())
    rows = []
    for e, sub in d.groupby("e"):
        dense = np.zeros(HAAR_SPAN, dtype=object)
        for day, c in zip(sub["day"], sub["c"]):
            idx = int(day) - d0
            if 0 <= idx < HAAR_SPAN:
                dense[idx] = int(c)
        cur = dense
        for level in range(1, HAAR_LEVELS + 1):
            left, right = cur[0::2], cur[1::2]
            detail = left - right
            cur = left + right
            energy = int(sum(int(x) * int(x) for x in detail))
            rows.append({"event_type": e, "level": level, "energy": energy})
    out = pd.DataFrame(
        sorted(rows, key=lambda r: (r["event_type"], r["level"]))
    )
    out["level"] = out["level"].astype("int64")
    out["energy"] = out["energy"].astype("int64")
    return out.reset_index(drop=True)


def _haar_sql(levels: int = HAAR_LEVELS) -> str:
    steps = []
    energies = []
    for j in range(1, levels + 1):
        prev = "c0" if j == 1 else f"c{j - 1}"
        steps.append(f"""c{j} AS (
  SELECT e, k // 2 AS k, SUM(v) AS v,
         SUM(CASE WHEN k % 2 = 0 THEN v ELSE -v END) AS dv
  FROM {prev} GROUP BY e, k // 2
)""")
        energies.append(f"""
  SELECT e AS event_type, {j} AS level,
         CAST(COALESCE(SUM(CAST(dv AS HUGEINT) * dv), 0) AS BIGINT) AS energy
  FROM c{j} GROUP BY e""")
    return f"""
WITH d AS (
  SELECT event_type AS e, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
d0 AS (SELECT MIN(day) AS d0 FROM d),
c0 AS (
  SELECT e, day - d0.d0 AS k, CAST(c AS BIGINT) AS v
  FROM d CROSS JOIN d0 WHERE day - d0.d0 < {HAAR_SPAN}
),
{",".join(steps)}
SELECT event_type, CAST(level AS BIGINT) AS level, energy
FROM ({" UNION ALL ".join(energies)})
ORDER BY event_type, level
"""


HAAR_ENERGY_SQL = _haar_sql()


# -- record-setting days -----------------------------------------------------------

def record_days_by_type(sf_dir: str) -> "pd.DataFrame":
    """Record-breaking days per event type: how many days set a new
    all-time daily-count high (strictly greater than every prior day),
    and when the standing record was set — the leaders/records audit
    (expected ~ln n for an i.i.d. series, so an excess says trend).
    One (type, day) fold, vectorized running-max scan on the driver.
    Output: (event_type, n_records, record_c, record_day)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        folded = pa.table({"e": t["event_type"], "day": day})
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate(
            [([], "count_all")]
        )

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()
    )
    rows = []
    for e, sub in d.groupby("e"):
        sub = sub.sort_values("day")
        cs = sub["c"].to_numpy(np.int64)
        days = sub["day"].to_numpy(np.int64)
        runmax = np.maximum.accumulate(cs)
        is_rec = np.concatenate(([True], cs[1:] > runmax[:-1]))
        rec_idx = int(np.flatnonzero(is_rec)[-1])
        rows.append(
            {
                "event_type": e,
                "n_records": int(is_rec.sum()),
                "record_c": int(cs[rec_idx]),
                "record_day": int(days[rec_idx]),
            }
        )
    out = pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
    for c in ("n_records", "record_c", "record_day"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


RECORD_DAYS_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, day, c,
         COALESCE(MAX(c) OVER (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) AS prior
  FROM d
),
recs AS (SELECT * FROM w WHERE c > prior)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(MAX_BY(c, day) AS BIGINT) AS record_c,
       CAST(MAX(day) AS BIGINT) AS record_day
FROM recs GROUP BY event_type ORDER BY event_type
"""


# -- interval-union active time -----------------------------------------------

#: activity window attached to every event for the union-coverage measure (us)
ACTIVE_WINDOW_US = 5 * 60 * 1_000_000


def user_active_time(sf_dir: str) -> Dataset:
    """Total time each user was "active": the union length of the windows
    ``[ts, ts + 5min)`` over the user's events — the classic interval-union
    sweep (engagement minutes, billing meters).  Overlapping windows must
    not double-count, so a plain SUM is wrong; the sorted-scan identity
    ``union = sum(min(next_ts - ts, W)) + W(last)`` computes it in one
    vectorized pass with no pairwise interval join.

    Distributed shape: ONE user-bucket co-location (derived bucket count,
    so per-task frames stay bounded at any corpus size); inside the kernel
    a single whole-bucket sort + numpy diff covers every user at once —
    per-user boundaries are a shifted-equality mask, never a Python loop.
    Output: (user_id, n_events, active_us), all integers so the LEAD/LEAST
    window oracle hash-matches exactly (duplicate timestamps contribute 0
    regardless of tie order, so the scan is tie-deterministic)."""
    import numpy as np

    ds = _read_events(sf_dir, ["ts", "user_id"])
    ubk = _user_buckets(sf_dir)
    W = ACTIVE_WINDOW_US

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32())
        )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].astype("int64").to_numpy()
        n = len(ts)
        contrib = np.full(n, W, dtype=np.int64)
        if n > 1:
            same = uid[1:] == uid[:-1]
            gap = ts[1:] - ts[:-1]
            contrib[:-1] = np.where(same, np.minimum(gap, W), W)
        s = (
            pd.DataFrame({"user_id": uid, "c": contrib})
            .groupby("user_id", sort=False)
            .agg(n_events=("c", "size"), active_us=("c", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "user_id": pa.array(s["user_id"].to_numpy(np.int64)),
                "n_events": pa.array(s["n_events"].to_numpy(np.int64)),
                "active_us": pa.array(s["active_us"].to_numpy(np.int64)),
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return out.sort("user_id")


USER_ACTIVE_TIME_SQL = """
WITH w AS (
  SELECT user_id, epoch_us(ts) AS t,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS nxt
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN nxt IS NULL THEN 300000000
                     ELSE LEAST(nxt - t, 300000000) END) AS BIGINT) AS active_us
FROM w GROUP BY user_id ORDER BY user_id
"""


# -- weekly spectral line (integer DFT bin) -----------------------------------

#: pre-rounded cos/sin(2*pi*k/7) x 10^6, k = day % 7 — the same constant
#: table is inlined in the oracle so both engines do identical integer
#: arithmetic (the libm-free-oracle pattern, PATTERNS.md).
_DFT7_COS = (1_000_000, 623_490, -222_521, -900_969, -900_969, -222_521, 623_490)
_DFT7_SIN = (0, 781_831, 974_928, 433_884, -433_884, -974_928, -781_831)


def dft_weekly_power(sf_dir: str) -> "pd.DataFrame":
    """Spectral line at period 7 of each event type's daily-count series —
    the single-bin DFT (Goertzel) weekly-seasonality audit: ``re + i*im =
    sum_d c_d * exp(-2*pi*i*(d%7)/7)``.  A flat series concentrates mass
    at |re|,|im| ~ sqrt(n); strong weekday structure shows up as |z| ~ n.
    Zero-filled days cost nothing (c_d = 0 terms vanish), so the fold is
    sparse-safe by construction.

    Distributed shape: because the kernel only depends on ``day % 7``, the
    per-day series NEVER materializes — one map-side combiner folds
    directly to (event_type, k) with k in 0..6, a <= 7x|types| exchange.
    The driver multiplies the 7-entry pre-rounded integer trig table in
    exact Python ints; the final int64 cast RAISES on overflow (HUGEINT ->
    BIGINT in the oracle does the same).  Output: (event_type, n_events,
    p7_re, p7_im)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        k = pc.subtract(day, pc.multiply(pc.divide(day, 7), 7))
        folded = pa.table({"e": t["event_type"], "k": k})
        return pa.TableGroupBy(folded, ["e", "k"]).aggregate([([], "count_all")])

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "k"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(7 x |types|)
    )
    rows = []
    for e, sub in d.groupby("e"):
        ks = sub["k"].to_numpy(np.int64)
        cs = sub["c"].to_numpy(np.int64)
        re = sum(int(c) * _DFT7_COS[int(k)] for k, c in zip(ks, cs))
        im = sum(int(c) * _DFT7_SIN[int(k)] for k, c in zip(ks, cs))
        rows.append(
            {"event_type": e, "n_events": int(cs.sum()), "p7_re": re, "p7_im": im}
        )
    out = pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
    for c in ("n_events", "p7_re", "p7_im"):
        out[c] = out[c].astype("int64")  # raises on overflow, like the oracle
    return out.reset_index(drop=True)


DFT_WEEKLY_POWER_SQL = """
WITH d AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 86400000000) % 7 AS BIGINT) AS k,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(SUM(CAST(c AS HUGEINT) * ck) AS BIGINT) AS p7_re,
       CAST(SUM(CAST(c AS HUGEINT) * sk) AS BIGINT) AS p7_im
FROM d
JOIN (VALUES (0, 1000000, 0), (1, 623490, 781831), (2, -222521, 974928),
             (3, -900969, 433884), (4, -900969, -433884),
             (5, -222521, -974928), (6, 623490, -781831)) tab(k, ck, sk)
  USING (k)
GROUP BY event_type ORDER BY event_type
"""


# -- global peak concurrency ---------------------------------------------------


def peak_concurrency(sf_dir: str) -> "pd.DataFrame":
    """Peak number of simultaneously-open sessions (30-min-gap windows,
    closed intervals) across ALL users — the capacity-planning headline.
    The sweep-line identity: concurrency changes only at endpoint deltas
    (+1 at start, -1 at end+1), and C(t) = sum of deltas <= t; the peak is
    the max of that prefix sum over distinct delta times.

    Distributed shape: sessions build inside the usual user-bucket
    co-location; deltas then co-locate into contiguous TIME buckets.  The
    key trick is carry-independence: a bucket's internal argmax location,
    tie count and first-time do not depend on the unknown prefix carry
    (the carry shifts every in-bucket prefix equally), so ONE time-bucket
    pass emits (total_delta, max_prefix, n_at_max, first_t) per bucket and
    the driver folds only the O(buckets) carry chain — no global sort, no
    second pass, no corpus-sized driver state.  Output: one row
    (peak, n_peak_times, first_peak_us); n_peak_times counts distinct
    delta timestamps at the peak (the function is piecewise constant)."""
    import numpy as np

    from ._util import n_buckets

    path = f"{sf_dir}/events.parquet"
    ds = _read_events(sf_dir, ["ts", "user_id"])
    ubk = _user_buckets(sf_dir)
    t0, t1 = _ts_bounds_us(path)
    import pyarrow.parquet as pq

    B = n_buckets(pq.read_metadata(path).num_rows)
    width = max(1, (t1 + 1 - t0) // B + 1)

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32())
        )

    def build_sessions(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        ts = g["ts"].astype("datetime64[us]").astype("int64")
        same_user = g["user_id"].eq(g["user_id"].shift())
        new_session = (ts.diff() > SESSION_GAP_US) & same_user
        sid = (new_session | ~same_user).cumsum()
        per = (
            pd.DataFrame({"uid": g["user_id"].values, "sid": sid.values,
                          "ts": ts.values})
            .groupby(["uid", "sid"], sort=False)["ts"].agg(["min", "max"])
        )
        s = per["min"].to_numpy(np.int64)
        e = per["max"].to_numpy(np.int64) + 1  # -1 fires just past the close
        t_all = np.concatenate([s, e])
        d_all = np.concatenate(
            [np.ones(len(s), np.int64), np.full(len(e), -1, np.int64)]
        )
        tb = np.minimum((t_all - t0) // width, B - 1).astype(np.int32)
        return pa.table({"tb": pa.array(tb), "t": pa.array(t_all),
                         "d": pa.array(d_all)})

    def per_time_bucket(g: pd.DataFrame) -> pa.Table:
        # fold equal timestamps FIRST (prefix values are defined on the
        # distinct-time axis), then the carry-independent in-bucket scan
        f = g.groupby("t", sort=True)["d"].sum()
        c = f.to_numpy(np.int64).cumsum()
        ts = f.index.to_numpy(np.int64)
        mx = int(c.max())
        at = c == mx
        return pa.table(
            {
                "tb": pa.array([int(g["tb"].iloc[0])], pa.int32()),
                "total": pa.array([int(c[-1])], pa.int64()),
                "max_prefix": pa.array([mx], pa.int64()),
                "n_at_max": pa.array([int(at.sum())], pa.int64()),
                "first_t": pa.array([int(ts[at.argmax()])], pa.int64()),
            }
        )

    per_bucket = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(build_sessions, batch_format="pandas")
        .groupby("tb")
        .map_groups(per_time_bucket, batch_format="pandas")
        .to_pandas()  # O(buckets)
        .sort_values("tb")
    )
    totals = per_bucket["total"].to_numpy(np.int64)
    carry = np.concatenate(([0], totals.cumsum()[:-1]))
    bmax = carry + per_bucket["max_prefix"].to_numpy(np.int64)
    peak = int(bmax.max())
    hit = bmax == peak
    out = pd.DataFrame(
        {
            "peak": [peak],
            "n_peak_times": [int(per_bucket["n_at_max"].to_numpy(np.int64)[hit].sum())],
            "first_peak_us": [int(per_bucket["first_t"].to_numpy(np.int64)[hit].min())],
        }
    )
    return out.astype("int64")


PEAK_CONCURRENCY_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t,
         CASE WHEN epoch_us(ts)
                   - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                   > 1800000000 THEN 1
              WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                   IS NULL THEN 1
              ELSE 0 END AS new_sess
  FROM events
), s AS (
  SELECT user_id, t,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t
             ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
), iv AS (
  SELECT user_id, sid, MIN(t) AS st, MAX(t) AS en FROM s GROUP BY 1, 2
), d AS (
  SELECT st AS t, 1 AS dd FROM iv
  UNION ALL SELECT en + 1, -1 FROM iv
), g AS (
  SELECT t, SUM(dd) AS dd FROM d GROUP BY t
), c AS (
  SELECT t, SUM(dd) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS conc FROM g
), mx AS (SELECT MAX(conc) AS peak FROM c)
SELECT CAST(mx.peak AS BIGINT) AS peak,
       CAST(COUNT(*) AS BIGINT) AS n_peak_times,
       CAST(MIN(c.t) AS BIGINT) AS first_peak_us
FROM c, mx WHERE c.conc = mx.peak GROUP BY mx.peak
"""


# -- Markov removal-effect attribution ----------------------------------------

#: touchpoint channels (every event type except the converting 'purchase');
#: fixed list so the unrolled oracle enumerates identical scenarios.
_MA_CHANNELS = ("click", "error", "signup", "view")
_MA_SCALE = 10**12
_MA_ROUNDS = 16


def markov_attribution(sf_dir: str) -> "pd.DataFrame":
    """Markov-chain (removal-effect) attribution, the data-driven
    alternative to first/last-touch: per-user journeys truncate at the
    first 'purchase' (absorption into conv; journeys without one absorb
    into null), first-order transition counts form the chain, and each
    channel's credit is how much the start->conv absorption probability
    DROPS when every transition into that channel is redirected to null
    (Anderl et al.'s removal effect).

    Absorption probabilities come from a fixed _MA_ROUNDS-round integer
    fixed point v'(s) = (sum_c m[s,c]*v(c) + m[s,conv]*SCALE) // tot(s) —
    floor division at every step, so the oracle's unrolled HUGEINT CTE
    chain replays it bit-for-bit (the pagerank_knn discipline; equality
    does not depend on convergence).  Distributed shape: ONE user-bucket
    co-location emits per-bucket (from, to) partial counts (vectorized
    truncation + shift, no per-user Python); the global fold is bounded by
    (|types|+1)^2; the five fixed points run on the driver over that tiny
    matrix in exact Python ints.  Output: (channel, base_v, removed_v,
    removal_effect) with v scaled by 10^12."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    ubk = _user_buckets(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32())
        )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        is_p = et == "purchase"
        # prior-purchase count per user (vectorized reset-at-head cumsum)
        cp = np.cumsum(is_p.astype(np.int64))
        same = np.empty(len(g), bool)
        same[0] = False
        same[1:] = uid[1:] == uid[:-1]
        head = np.flatnonzero(~same)
        user_base = np.where(head > 0, cp[head - 1], 0)
        runs = np.diff(np.append(head, len(g)))
        prior = cp - np.repeat(user_base, runs) - is_p.astype(np.int64)
        keep = prior == 0  # up to and including the first purchase
        kdf = pd.DataFrame({"uid": uid[keep], "et": et[keep], "isp": is_p[keep]})
        prev = kdf.groupby("uid", sort=False)["et"].shift()
        f = prev.fillna("start").to_numpy()
        t_to = np.where(kdf["isp"].to_numpy(), "conv", kdf["et"].to_numpy())
        # non-converting users: last kept row -> null
        ku = kdf["uid"].to_numpy()
        nsame = np.append(ku[1:] == ku[:-1], False)
        has_p = kdf.groupby("uid", sort=False)["isp"].transform("any").to_numpy()
        tail = (~nsame) & (~has_p)
        f_all = np.concatenate([f, kdf["et"].to_numpy()[tail]])
        t_all = np.concatenate([t_to, np.full(int(tail.sum()), "null", object)])
        c = (
            pd.DataFrame({"f": f_all, "t": t_all})
            .groupby(["f", "t"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.table(
            {
                "f": pa.array(c["f"].astype(str)),
                "t": pa.array(c["t"].astype(str)),
                "c": pa.array(c["c"].to_numpy(np.int64)),
            }
        )

    m_df = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["f", "t"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # <= (|types|+1) x (|types|+2)
    )
    m = {(r.f, r.t): int(r.c) for r in m_df.itertuples()}
    tot: dict[str, int] = {}
    for (fr, _), c in m.items():
        tot[fr] = tot.get(fr, 0) + c

    def solve(removed: str | None) -> int:
        v = {s: 0 for s in tot}
        for _ in range(_MA_ROUNDS):
            v = {
                s: (
                    sum(
                        m.get((s, ch), 0) * v.get(ch, 0)
                        for ch in _MA_CHANNELS
                        if ch != removed
                    )
                    + m.get((s, "conv"), 0) * _MA_SCALE
                )
                // tot[s]
                for s in tot
            }
        return v.get("start", 0)

    base = solve(None)
    rows = [
        {
            "channel": ch,
            "base_v": base,
            "removed_v": (rv := solve(ch)),
            "removal_effect": base - rv,
        }
        for ch in _MA_CHANNELS
    ]
    out = pd.DataFrame(rows)
    for c in ("base_v", "removed_v", "removal_effect"):
        out[c] = out[c].astype("int64")
    return out.sort_values("channel").reset_index(drop=True)


def _ma_round_cte(r: str, k: int) -> str:
    excl = "" if r == "base" else f", '{r}'"
    prev = f"v_{r}_{k - 1}"
    return f"""v_{r}_{k} AS MATERIALIZED (
  SELECT tot.f AS s,
    ( COALESCE((SELECT SUM(m.c * v.val) FROM m JOIN {prev} v ON v.s = m.t
                WHERE m.f = tot.f AND m.t NOT IN ('conv', 'null'{excl})), 0)
      + COALESCE((SELECT SUM(m.c) FROM m
                  WHERE m.f = tot.f AND m.t = 'conv'), 0) * 1000000000000
    ) // tot.tot AS val
  FROM tot
)"""


def _ma_sql() -> str:
    scen = ["base"] + list(_MA_CHANNELS)
    ctes = []
    for r in scen:
        ctes.append(
            f"v_{r}_0 AS (SELECT f AS s, CAST(0 AS HUGEINT) AS val FROM tot)"
        )
        ctes.extend(_ma_round_cte(r, k) for k in range(1, _MA_ROUNDS + 1))
    K = _MA_ROUNDS
    finals = "\nUNION ALL\n".join(
        f"""SELECT '{ch}' AS channel,
       CAST((SELECT val FROM v_base_{K} WHERE s = 'start') AS BIGINT) AS base_v,
       CAST((SELECT val FROM v_{ch}_{K} WHERE s = 'start') AS BIGINT) AS removed_v,
       CAST((SELECT val FROM v_base_{K} WHERE s = 'start')
            - (SELECT val FROM v_{ch}_{K} WHERE s = 'start') AS BIGINT) AS removal_effect"""
        for ch in _MA_CHANNELS
    )
    cte_block = ",\n".join(ctes)
    return f"""
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS prior_purch
  FROM events
), p AS (
  SELECT user_id, ts, event_id, event_type FROM e WHERE prior_purch = 0
), tr AS (
  SELECT COALESCE(LAG(event_type) OVER w, 'start') AS f,
         CASE WHEN event_type = 'purchase' THEN 'conv' ELSE event_type END AS t
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), lastrow AS (
  SELECT event_type AS f, 'null' AS t
  FROM (SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id) AS has_p
        FROM p)
  WHERE rn = 1 AND has_p = 0
), m AS MATERIALIZED (
  SELECT f, t, CAST(COUNT(*) AS HUGEINT) AS c
  FROM (SELECT f, t FROM tr UNION ALL SELECT f, t FROM lastrow) GROUP BY 1, 2
), tot AS MATERIALIZED (SELECT f, SUM(c) AS tot FROM m GROUP BY 1),
{cte_block}
{finals}
ORDER BY channel
"""


MARKOV_ATTRIBUTION_SQL = _ma_sql()


# -- session bounce rate -------------------------------------------------------


def bounce_rate(sf_dir: str) -> "pd.DataFrame":
    """Bounce rate per session ENTRY type: of the sessions whose first
    event is X, how many ended after that single event (the landing-page
    diagnostic).  Sessions are the usual 30-min-gap windows; ties break by
    event_id exactly as the oracle's ROW_NUMBER.  One user-bucket
    co-location; the kernel sessionizes the whole bucket vectorized and
    folds straight to (entry_type, n_sessions, n_bounces) partials, so the
    final exchange is O(|types|).  Output adds the integer floor ppm."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    ubk = _user_buckets(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32())
        )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = g["ts"].astype("datetime64[us]").astype("int64")
        same_user = g["user_id"].eq(g["user_id"].shift())
        new_session = ((ts.diff() > SESSION_GAP_US) & same_user) | ~same_user
        sid = new_session.cumsum()
        per = (
            pd.DataFrame(
                {"sid": sid.values, "et": g["event_type"].values}
            )
            .groupby("sid", sort=False)["et"]
            .agg(entry="first", n="size")
        )
        folded = (
            per.assign(b=(per["n"] == 1).astype(np.int64))
            .groupby("entry")
            .agg(n_s=("n", "size"), n_b=("b", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(folded["entry"].astype(str)),
                "n_s": pa.array(folded["n_s"].to_numpy(np.int64)),
                "n_b": pa.array(folded["n_b"].to_numpy(np.int64)),
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n_s", alias_name="n_sessions"),
            Sum("n_b", alias_name="n_bounces"),
        )
        .to_pandas()  # O(|types|)
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["n_sessions"] = out["n_sessions"].astype("int64")
    out["n_bounces"] = out["n_bounces"].astype("int64")
    out["bounce_ppm"] = (
        out["n_bounces"] * 1_000_000 // out["n_sessions"]
    ).astype("int64")
    return out


BOUNCE_RATE_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts)
                   - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                   > 1800000000 THEN 1
              WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                   IS NULL THEN 1
              ELSE 0 END AS new_sess
  FROM events
), s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
), s2 AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, sid
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, sid) AS n
  FROM s
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS bounce_ppm
FROM s2 WHERE rn = 1 GROUP BY event_type ORDER BY event_type
"""


# -- SAX motif discovery -------------------------------------------------------


def sax_motifs_by_type(sf_dir: str) -> "pd.DataFrame":
    """SAX motif histogram per event type: symbolize each type's daily
    counts into terciles (a/b/c by the exact 1/3 and 2/3 order statistics
    of that type's OBSERVED days, lower-rank convention k=(n-1)*q//3) and
    count every 3-day sliding motif over the day-ordered series — the
    time-series motif-discovery primitive (Lin-Keogh SAX) with the
    Gaussian breakpoints replaced by exact data terciles so both engines
    stay integer-deterministic.  Motif id = 9*s0 + 3*s1 + s2 (<= 27
    motifs).  ONE (type, day) fold; the driver symbolizes the O(span)
    per-type series and folds motifs — the record_days/haar state bound.
    Output: (event_type, motif, n)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        folded = pa.table({"e": t["event_type"], "day": day})
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate([([], "count_all")])

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|types| x span-days)
    )
    rows = []
    for e, sub in d.groupby("e"):
        sub = sub.sort_values("day")
        cs = sub["c"].to_numpy(np.int64)
        n = len(cs)
        srt = np.sort(cs)
        cut1 = int(srt[(n - 1) // 3])
        cut2 = int(srt[2 * (n - 1) // 3])
        sym = np.where(cs <= cut1, 0, np.where(cs <= cut2, 1, 2)).astype(np.int64)
        if n >= 3:
            motifs = 9 * sym[:-2] + 3 * sym[1:-1] + sym[2:]
            vals, cnts = np.unique(motifs, return_counts=True)
            for m, c in zip(vals, cnts):
                rows.append({"event_type": e, "motif": int(m), "n": int(c)})
    out = pd.DataFrame(sorted(rows, key=lambda r: (r["event_type"], r["motif"])))
    for c in ("motif", "n"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


SAX_MOTIFS_SQL = """
WITH d AS (
  SELECT event_type AS e, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), r AS (
  SELECT e, day, c,
         ROW_NUMBER() OVER (PARTITION BY e ORDER BY c, day) AS rn,
         COUNT(*) OVER (PARTITION BY e) AS n
  FROM d
), cuts AS (
  SELECT a.e,
         MAX(CASE WHEN a.rn = (a.n - 1) // 3 + 1 THEN a.c END) AS cut1,
         MAX(CASE WHEN a.rn = 2 * (a.n - 1) // 3 + 1 THEN a.c END) AS cut2
  FROM r a GROUP BY a.e
), sym AS (
  SELECT d.e, d.day,
         CASE WHEN d.c <= cut1 THEN 0 WHEN d.c <= cut2 THEN 1 ELSE 2 END AS s
  FROM d JOIN cuts USING (e)
), seq AS (
  SELECT e, s,
         LEAD(s, 1) OVER (PARTITION BY e ORDER BY day) AS s1,
         LEAD(s, 2) OVER (PARTITION BY e ORDER BY day) AS s2
  FROM sym
)
SELECT e AS event_type,
       CAST(9 * s + 3 * s1 + s2 AS BIGINT) AS motif,
       CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE s2 IS NOT NULL
GROUP BY 1, 2 ORDER BY event_type, motif
"""


# -- exact rolling weekly active users ----------------------------------------


def rolling_wau_exact(sf_dir: str) -> "pd.DataFrame":
    """EXACT 7-day rolling active users for every day in the corpus span —
    the precise companion the ``hll_wau`` sketch is calibrated against.
    Rolling COUNT DISTINCT does not decompose into per-day counts, but it
    DOES decompose per user: a user is active on day d iff they have an
    event in [d-6, d], i.e. each user contributes a union of [day, day+7)
    coverage intervals (runs of active days closer than 7 days merge).
    Those interval deltas sum across users, so the day series is one
    prefix scan.

    Distributed shape: the user-bucket kernel merges each user's active
    days into +1/-1 day deltas (vectorized run-splitting, no per-user
    Python); a (day)-keyed fold sums deltas (O(span) groups — the
    record_days bound); the driver cumsums the O(span) series and
    zero-fills. Output: (day, wau) for every day min..max."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "user_id"])
    ubk = _user_buckets(sf_dir)
    W = 7

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        folded = pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32()),
                "user_id": uid,
                "day": day,
            }
        )
        # batch-local (user, day) dedup — the combiner
        return pa.TableGroupBy(folded, ["ub", "user_id", "day"]).aggregate([])

    def deltas(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        uid = g["user_id"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        same = np.empty(len(g), bool)
        same[0] = False
        same[1:] = uid[1:] == uid[:-1]
        # a new coverage run starts when the user changes or the gap
        # between consecutive active days is >= 7 (windows disjoint)
        gap_new = np.empty(len(g), bool)
        gap_new[0] = True
        gap_new[1:] = (~same[1:]) | (day[1:] - day[:-1] >= W)
        starts = day[gap_new]
        # a run's coverage ends 7 days after its LAST active day
        run_last = np.append(gap_new[1:], True)
        ends = day[run_last] + W
        t_all = np.concatenate([starts, ends])
        d_all = np.concatenate(
            [np.ones(len(starts), np.int64), -np.ones(len(ends), np.int64)]
        )
        return pa.table({"day": pa.array(t_all), "d": pa.array(d_all)})

    series = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(deltas, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("d", alias_name="d"))
        .to_pandas()  # O(span) days
        .sort_values("day")
    )
    dd = series["day"].to_numpy(np.int64)
    cs = series["d"].to_numpy(np.int64).cumsum()
    lo, hi = int(dd.min()), int(dd.max())  # last delta day is max+7 exclusive
    days = np.arange(lo, hi)
    idx = np.searchsorted(dd, days, side="right") - 1
    wau = np.where(idx >= 0, cs[np.maximum(idx, 0)], 0)
    out = pd.DataFrame({"day": days, "wau": wau})
    # clip to the observed event-day span (coverage extends 7 past it)
    max_event_day = int(dd.max()) - W
    out = out[out["day"] <= max_event_day + W - 1]
    return out.astype("int64").reset_index(drop=True)


ROLLING_WAU_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), span AS (
  SELECT unnest(range((SELECT MIN(day) FROM ud),
                      (SELECT MAX(day) FROM ud) + 7)) AS day
)
SELECT CAST(s.day AS BIGINT) AS day,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
FROM span s LEFT JOIN ud u ON u.day BETWEEN s.day - 6 AND s.day
GROUP BY s.day ORDER BY s.day
"""


# -- weekday/weekend KS distance ------------------------------------------------


def weekend_effect_ks(sf_dir: str) -> "pd.DataFrame":
    """Kolmogorov-Smirnov distance between the WEEKDAY and WEEKEND value
    distributions per event type — the two-sample drift test for the most
    common real segmentation.  Computed exactly on 4096-cent-bucketed
    values (the statistic is DEFINED on the bucketed ECDF, identically in
    both engines) as the cleared fraction ks_num = max |cum_wd * n_we -
    cum_we * n_wd| over ks_den = n_wd * n_we — no division, no floats.
    Day class uses the epoch-day parity convention day%7 in {2,3} ==
    weekend (1970-01-01 was a Thursday, so 2=Sat, 3=Sun).  ONE bounded
    (type, class, bucket) fold; the driver scans O(domain/4096) buckets.
    Output: (event_type, n_wd, n_we, ks_num, ks_den)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type", "value"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        k = pc.subtract(day, pc.multiply(pc.divide(day, 7), 7))
        we = pc.or_(pc.equal(k, 2), pc.equal(k, 3))
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        b = pc.divide(cents, 4096)  # non-negative values: trunc == floor
        folded = pa.table(
            {"e": t["event_type"], "we": pc.cast(we, pa.int8()), "b": b}
        )
        return pa.TableGroupBy(folded, ["e", "we", "b"]).aggregate(
            [([], "count_all")]
        )

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "we", "b"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|types| x 2 x domain/4096)
    )
    rows = []
    for e, sub in d.groupby("e"):
        wd = sub[sub["we"] == 0].set_index("b")["c"]
        we_ = sub[sub["we"] == 1].set_index("b")["c"]
        n_wd, n_we = int(wd.sum()), int(we_.sum())
        bs = np.unique(sub["b"].to_numpy(np.int64))
        cum_wd = np.cumsum([int(wd.get(b, 0)) for b in bs], dtype=object)
        cum_we = np.cumsum([int(we_.get(b, 0)) for b in bs], dtype=object)
        ks = max(
            (abs(int(cw) * n_we - int(ce) * n_wd) for cw, ce in zip(cum_wd, cum_we)),
            default=0,
        )
        rows.append(
            {"event_type": e, "n_wd": n_wd, "n_we": n_we,
             "ks_num": ks, "ks_den": n_wd * n_we}
        )
    out = pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
    for c in ("n_wd", "n_we", "ks_num", "ks_den"):
        out[c] = out[c].astype("int64")  # raises on overflow, like the oracle
    return out.reset_index(drop=True)


WEEKEND_EFFECT_KS_SQL = """
WITH x AS (
  SELECT event_type AS e,
         CASE WHEN (epoch_us(ts) // 86400000000) % 7 IN (2, 3)
              THEN 1 ELSE 0 END AS we,
         CAST(ROUND(value * 100) AS BIGINT) // 4096 AS b
  FROM events
), h AS (
  SELECT e, we, b, CAST(COUNT(*) AS HUGEINT) AS c FROM x GROUP BY 1, 2, 3
), bs AS (SELECT DISTINCT e, b FROM h),
cum AS (
  SELECT bs.e, bs.b,
         SUM(CASE WHEN h.we = 0 THEN h.c ELSE 0 END)
           OVER (PARTITION BY bs.e ORDER BY bs.b) AS cum_wd,
         SUM(CASE WHEN h.we = 1 THEN h.c ELSE 0 END)
           OVER (PARTITION BY bs.e ORDER BY bs.b) AS cum_we
  FROM bs LEFT JOIN h ON h.e = bs.e AND h.b = bs.b
), n AS (
  SELECT e,
         SUM(CASE WHEN we = 0 THEN c ELSE 0 END) AS n_wd,
         SUM(CASE WHEN we = 1 THEN c ELSE 0 END) AS n_we
  FROM h GROUP BY e
)
SELECT cum.e AS event_type,
       CAST(n.n_wd AS BIGINT) AS n_wd,
       CAST(n.n_we AS BIGINT) AS n_we,
       CAST(MAX(ABS(cum.cum_wd * n.n_we - cum.cum_we * n.n_wd)) AS BIGINT)
         AS ks_num,
       CAST(n.n_wd * n.n_we AS BIGINT) AS ks_den
FROM cum JOIN n ON n.e = cum.e
GROUP BY cum.e, n.n_wd, n.n_we ORDER BY event_type
"""


# -- Huffman code lengths --------------------------------------------------------

_HUFFMAN_MERGES = 4  # |event types| - 1; the oracle unrolls exactly these


def huffman_code_lengths(sf_dir: str) -> "pd.DataFrame":
    """Optimal prefix-code lengths (Huffman) for the event-type alphabet
    under the observed frequencies — the coding-theory companion to
    ``compression_ratio`` (code_len is what an entropy coder would spend
    per symbol; Kraft equality sums to one on a full tree).  Deterministic
    tie rule: merge the two nodes minimal by (freq, min-member-label);
    each merge adds one bit to every member's code.  The merge sequence is
    replayed EXACTLY by the oracle as unrolled state-passing CTEs (CSV
    member bookkeeping), so the lengths hash-match bit-for-bit.

    Distributed cost: ONE O(|types|) frequency fold; the 4-merge tree is
    driver arithmetic.  Output: (event_type, freq, code_len)."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["event_type"])

    def fold(t: pa.Table) -> pa.Table:
        return pa.TableGroupBy(
            pa.table({"e": t["event_type"]}), "e"
        ).aggregate([([], "count_all")])

    f = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby("e")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()  # O(|types|)
    )
    nodes = [
        (int(n), str(e), frozenset([str(e)]))
        for e, n in zip(f["e"], f["n"])
    ]
    depth = {str(e): 0 for e in f["e"]}
    while len(nodes) > 1:
        nodes.sort(key=lambda x: (x[0], x[1]))
        (f1, l1, m1), (f2, l2, m2) = nodes[0], nodes[1]
        merged = (f1 + f2, min(l1, l2), m1 | m2)
        for s in m1 | m2:
            depth[s] += 1
        nodes = nodes[2:] + [merged]
    out = pd.DataFrame(
        {
            "event_type": f["e"].astype(str),
            "freq": f["n"].astype("int64"),
            "code_len": [depth[str(e)] for e in f["e"]],
        }
    )
    out["code_len"] = out["code_len"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def _huffman_sql(merges: int = _HUFFMAN_MERGES) -> str:
    ctes = [
        "s_0 AS (SELECT event_type AS lbl, COUNT(*) AS freq,"
        " event_type AS members FROM events GROUP BY 1)"
    ]
    for k in range(1, merges + 1):
        p = k - 1
        ctes.append(f"""m_{k} AS (
  SELECT lbl, freq, members,
         ROW_NUMBER() OVER (ORDER BY freq, lbl) AS rn
  FROM s_{p}
), merged_{k} AS (
  SELECT MIN(lbl) AS lbl, SUM(freq) AS freq,
         string_agg(members, ',' ORDER BY lbl) AS members
  FROM m_{k} WHERE rn <= 2
), s_{k} AS (
  SELECT lbl, freq, members FROM m_{k} WHERE rn > 2
  UNION ALL SELECT lbl, freq, members FROM merged_{k}
)""")
    contains = " + ".join(
        f"(SELECT CASE WHEN (',' || m.members || ',')"
        f" LIKE ('%,' || s.lbl || ',%') THEN 1 ELSE 0 END FROM merged_{k} m)"
        for k in range(1, merges + 1)
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT s.lbl AS event_type, CAST(s.freq AS BIGINT) AS freq,
       CAST({contains} AS BIGINT) AS code_len
FROM s_0 s ORDER BY event_type
"""
    )


HUFFMAN_CODE_LENGTHS_SQL = _huffman_sql()


# -- offline greedy-bandit replay ------------------------------------------------

_BANDIT_UNPLAYED_KEY = 1 << 62  # optimistic init: unplayed arms rank first


def greedy_bandit_replay(sf_dir: str) -> "pd.DataFrame":
    """Offline policy evaluation of the greedy bandit over event types at
    day granularity: each day the policy plays the arm (event type) with
    the highest running mean value over all PRIOR days (floor-scaled
    integer mean ``cum_v_cents * 10^6 // cum_n`` so the ranking key is
    identical on both engines; unplayed arms rank first — optimistic
    initialization — and ties break to the lexicographically smallest
    type), and earns that type's actual day total.  The counterfactual
    replay a recommendation/routing pipeline runs before an online test.

    ONE (type, day) fold (the shared record_days bound); the sequential
    scan is O(span x |types|) driver arithmetic and a pure window-function
    oracle (no unroll — the policy depends on prefix sums only).
    Output: (day, chosen_type, reward_n, reward_v_cents)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type", "value"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        folded = pa.table({"e": t["event_type"], "day": day, "v": cents})
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate(
            [("v", "count"), ("v", "sum")]
        )

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(
            Sum("v_count", alias_name="n"), Sum("v_sum", alias_name="v")
        )
        .to_pandas()  # O(|types| x span)
    )
    types = sorted(d["e"].unique())
    days = np.sort(d["day"].unique())
    stat = {
        (r.e, int(r.day)): (int(r.n), int(r.v)) for r in d.itertuples()
    }
    cum = {e: [0, 0] for e in types}  # n, v
    rows = []
    for day in days:
        day = int(day)
        best_key, best_e = None, None
        for e in types:  # |types| is tiny; key is exact integer
            cn, cv = cum[e]
            key = cv * 1_000_000 // cn if cn > 0 else _BANDIT_UNPLAYED_KEY
            if best_key is None or key > best_key:
                best_key, best_e = key, e
        n_d, v_d = stat.get((best_e, day), (0, 0))
        rows.append(
            {"day": day, "chosen_type": best_e, "reward_n": n_d,
             "reward_v_cents": v_d}
        )
        for e in types:
            s = stat.get((e, day))
            if s:
                cum[e][0] += s[0]
                cum[e][1] += s[1]
    out = pd.DataFrame(rows)
    for c in ("day", "reward_n", "reward_v_cents"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


GREEDY_BANDIT_REPLAY_SQL = f"""
WITH td AS (
  SELECT event_type AS e, epoch_us(ts) // 86400000000 AS day,
         COUNT(*) AS n, SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT d.day, t.e FROM (SELECT DISTINCT day FROM td) d
  CROSS JOIN (SELECT DISTINCT e FROM td) t
), cum AS (
  SELECT g.day, g.e, COALESCE(td.n, 0) AS n_d, COALESCE(td.v, 0) AS v_d,
         COALESCE(SUM(td.n) OVER (PARTITION BY g.e ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cn,
         COALESCE(SUM(td.v) OVER (PARTITION BY g.e ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cv
  FROM grid g LEFT JOIN td ON td.e = g.e AND td.day = g.day
), keyed AS (
  SELECT day, e, n_d, v_d,
         CASE WHEN cn > 0 THEN cv * 1000000 // cn
              ELSE {_BANDIT_UNPLAYED_KEY} END AS key,
         ROW_NUMBER() OVER (PARTITION BY day
             ORDER BY CASE WHEN cn > 0 THEN cv * 1000000 // cn
                           ELSE {_BANDIT_UNPLAYED_KEY} END DESC, e) AS rn
  FROM cum
)
SELECT CAST(day AS BIGINT) AS day, e AS chosen_type,
       CAST(n_d AS BIGINT) AS reward_n,
       CAST(v_d AS BIGINT) AS reward_v_cents
FROM keyed WHERE rn = 1 ORDER BY day
"""


# -- frequency-weighted type co-engagement --------------------------------------


def type_user_inner(sf_dir: str) -> "pd.DataFrame":
    """Frequency-weighted co-engagement between event types: the exact
    inner product of per-user activity vectors <n_u,a * n_u,b> per type
    pair, with the squared norms — the cleared-integer ingredients of the
    cosine similarity between types (the 'users who click also buy'
    number with magnitudes, where ``kmv_type_overlap`` only counts set
    overlap).  ONE user-bucket co-location; the kernel pivots each
    bucket's (user, type) counts and folds all C(|types|,2)+|types|
    partials in-kernel, so the exchange is O(|types|^2).
    Output: (type_a, type_b, inner, norm2_a, norm2_b)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["user_id", "event_type"])
    ubk = _user_buckets(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        folded = pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32()),
                "user_id": uid,
                "e": t["event_type"],
            }
        )
        return pa.TableGroupBy(folded, ["ub", "user_id", "e"]).aggregate(
            [([], "count_all")]
        )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        piv = (
            g.groupby(["user_id", "e"])["count_all"].sum().unstack(fill_value=0)
        )
        types = sorted(piv.columns)
        m = piv[types].to_numpy(np.int64)
        gram = m.T @ m  # |types| x |types|, exact int64
        rows_a, rows_b, inner, na, nb2 = [], [], [], [], []
        for i, a in enumerate(types):
            for j in range(i + 1, len(types)):
                rows_a.append(a)
                rows_b.append(types[j])
                inner.append(int(gram[i, j]))
                na.append(int(gram[i, i]))
                nb2.append(int(gram[j, j]))
        return pa.table(
            {
                "type_a": pa.array(rows_a, pa.string()),
                "type_b": pa.array(rows_b, pa.string()),
                "inner": pa.array(inner, pa.int64()),
                "norm2_a": pa.array(na, pa.int64()),
                "norm2_b": pa.array(nb2, pa.int64()),
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["type_a", "type_b"])
        .aggregate(
            Sum("inner", alias_name="inner"),
            Sum("norm2_a", alias_name="norm2_a"),
            Sum("norm2_b", alias_name="norm2_b"),
        )
        .to_pandas()  # O(|types|^2)
        .sort_values(["type_a", "type_b"])
        .reset_index(drop=True)
    )
    for c in ("inner", "norm2_a", "norm2_b"):
        out[c] = out[c].astype("int64")
    return out


TYPE_USER_INNER_SQL = """
WITH uc AS (
  SELECT user_id, event_type AS e, CAST(COUNT(*) AS HUGEINT) AS c
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.e AS type_a, b.e AS type_b, SUM(a.c * b.c) AS inner
  FROM uc a JOIN uc b ON a.user_id = b.user_id AND a.e < b.e
  GROUP BY 1, 2
), norms AS (
  SELECT e, SUM(c * c) AS n2 FROM uc GROUP BY e
), grid AS (
  SELECT a.e AS type_a, b.e AS type_b, a.n2 AS norm2_a, b.n2 AS norm2_b
  FROM norms a JOIN norms b ON a.e < b.e
)
SELECT g.type_a, g.type_b,
       CAST(COALESCE(p.inner, 0) AS BIGINT) AS inner,
       CAST(g.norm2_a AS BIGINT) AS norm2_a,
       CAST(g.norm2_b AS BIGINT) AS norm2_b
FROM grid g LEFT JOIN pairs p USING (type_a, type_b)
ORDER BY type_a, type_b
"""


# -- Wald-Wolfowitz runs test ----------------------------------------------------


def runs_test_by_type(sf_dir: str) -> "pd.DataFrame":
    """Wald-Wolfowitz runs test ingredients per event type: symbolize each
    day as above (1) or not-above (0) that type's MEDIAN daily count
    (lower median, the doclen convention) and count the runs of equal
    symbols over the day-ordered series — too FEW runs says trend/
    clustering, too many says oscillation; expected runs under randomness
    is 1 + 2*n1*n0/(n1+n0), so everything stays a cleared integer.
    ONE shared (type, day) fold, O(span) driver scan.
    Output: (event_type, n_days, n_above, n_runs)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        folded = pa.table({"e": t["event_type"], "day": day})
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate([([], "count_all")])

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|types| x span)
    )
    rows = []
    for e, sub in d.groupby("e"):
        sub = sub.sort_values("day")
        cs = sub["c"].to_numpy(np.int64)
        n = len(cs)
        med = int(np.sort(cs)[(n - 1) // 2])
        sym = (cs > med).astype(np.int64)
        n_runs = 1 + int((sym[1:] != sym[:-1]).sum()) if n else 0
        rows.append(
            {"event_type": e, "n_days": n, "n_above": int(sym.sum()),
             "n_runs": n_runs}
        )
    out = pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
    for c in ("n_days", "n_above", "n_runs"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


RUNS_TEST_SQL = """
WITH d AS (
  SELECT event_type AS e, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), r AS (
  SELECT e, day, c,
         ROW_NUMBER() OVER (PARTITION BY e ORDER BY c, day) AS rn,
         COUNT(*) OVER (PARTITION BY e) AS n
  FROM d
), med AS (
  SELECT e, MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN c END) AS m
  FROM r GROUP BY e
), sym AS (
  SELECT d.e, d.day, CASE WHEN d.c > med.m THEN 1 ELSE 0 END AS s
  FROM d JOIN med USING (e)
), runs AS (
  SELECT e, s,
         LAG(s) OVER (PARTITION BY e ORDER BY day) AS prev
  FROM sym
)
SELECT e AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(s) AS BIGINT) AS n_above,
       CAST(SUM(CASE WHEN prev IS NULL OR s <> prev THEN 1 ELSE 0 END)
            AS BIGINT) AS n_runs
FROM runs GROUP BY e ORDER BY event_type
"""


# -- heavy-user outlier screen ---------------------------------------------------


def user_activity_outliers(sf_dir: str) -> "pd.DataFrame":
    """Heavy-user screen: users whose event count exceeds the population
    mean by more than 5 standard deviations, decided in EXACT integer
    arithmetic — the outlier test (n_u*N - S)^2 > 25*(N*Q - S^2) with
    S = sum counts, Q = sum squared counts (both sides of the comparison
    are the cleared-denominator forms of (n_u - mean) and 5*sigma).  The
    bot/abuse triage a pipeline runs before user-level statistics.

    Distributed shape: per-user counts fold inside the user-bucket
    co-location straight to an ACTIVITY HISTOGRAM (count value -> n_users,
    domain-bounded), so the driver sees O(distinct activity levels) and
    the moments and the screen are exact Python-int arithmetic.  Output:
    (n_users, sum_events, sumsq_events, n_outliers, max_activity)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["user_id"])
    ubk = _user_buckets(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        folded = pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32()),
                "user_id": uid,
            }
        )
        return pa.TableGroupBy(folded, ["ub", "user_id"]).aggregate(
            [([], "count_all")]
        )

    def hist(g: pd.DataFrame) -> pa.Table:
        per = g.groupby("user_id")["count_all"].sum()
        vals, cnts = np.unique(per.to_numpy(np.int64), return_counts=True)
        return pa.table(
            {
                "activity": pa.array(vals.astype(np.int64)),
                "n_u": pa.array(cnts.astype(np.int64)),
            }
        )

    h = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(hist, batch_format="pandas")
        .groupby("activity")
        .aggregate(Sum("n_u", alias_name="n_u"))
        .to_pandas()  # O(distinct activity levels)
    )
    acts = [int(x) for x in h["activity"]]
    cnts = [int(x) for x in h["n_u"]]
    N = sum(cnts)
    S = sum(a * c for a, c in zip(acts, cnts))
    Q = sum(a * a * c for a, c in zip(acts, cnts))
    var_n = N * Q - S * S  # N^2 * variance
    n_out = sum(
        c
        for a, c in zip(acts, cnts)
        if a * N - S > 0 and (a * N - S) ** 2 > 25 * var_n
    )
    out = pd.DataFrame(
        {
            "n_users": [N],
            "sum_events": [S],
            "sumsq_events": [Q],
            "n_outliers": [n_out],
            "max_activity": [max(acts)],
        }
    )
    return out.astype("int64")  # raises on overflow, like the oracle


USER_ACTIVITY_OUTLIERS_SQL = """
WITH per AS (
  SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS n FROM events GROUP BY 1
), m AS (
  SELECT COUNT(*) AS nn, SUM(n) AS s, SUM(n * n) AS q, MAX(n) AS mx FROM per
)
SELECT CAST(m.nn AS BIGINT) AS n_users,
       CAST(m.s AS BIGINT) AS sum_events,
       CAST(m.q AS BIGINT) AS sumsq_events,
       CAST((SELECT COUNT(*) FROM per, m
             WHERE per.n * m.nn - m.s > 0
               AND (per.n * m.nn - m.s) * (per.n * m.nn - m.s)
                   > 25 * (m.nn * m.q - m.s * m.s)) AS BIGINT) AS n_outliers,
       CAST(m.mx AS BIGINT) AS max_activity
FROM m
"""


# -- session-level co-occurrence lift --------------------------------------------


def session_cross_lift(sf_dir: str) -> "pd.DataFrame":
    """Session-grain co-occurrence lift between event types: for every
    type pair, the number of sessions containing BOTH vs each alone and
    the session total — the cleared ingredients of lift = P(a&b) /
    (P(a)*P(b)) at the granularity where intent lives (the market-basket
    primitive ``copurchase_type_pairs`` runs on orders; this one runs on
    behavioral sessions).  Output: (type_a, type_b, n_both, n_a, n_b,
    n_sessions), full C(|types|,2) grid zero-filled.

    ONE user-bucket co-location: the kernel sessionizes the whole bucket
    vectorized, dedups (session, type), and folds pair AND marginal
    partials in-kernel, so the exchange is O(|types|^2)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "user_id", "event_type"])
    ubk = _user_buckets(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32())
        )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        ts = g["ts"].astype("datetime64[us]").astype("int64")
        same_user = g["user_id"].eq(g["user_id"].shift())
        new_session = ((ts.diff() > SESSION_GAP_US) & same_user) | ~same_user
        sid = new_session.cumsum()
        st = pd.DataFrame(
            {"sid": sid.values, "e": g["event_type"].values}
        ).drop_duplicates()
        n_sessions = int(sid.iloc[-1] - sid.iloc[0] + 1) if len(g) else 0
        # marginals
        marg = st.groupby("e", sort=False).size()
        # pairs via in-kernel self-merge per session
        m = st.merge(st, on="sid")
        m = m[m["e_x"] < m["e_y"]]
        pairs = m.groupby(["e_x", "e_y"], sort=False).size()
        out_a = [a for a, _ in pairs.index] + list(marg.index) + ["\x00"]
        out_b = [b for _, b in pairs.index] + [""] * len(marg) + [""]
        out_c = list(pairs.values) + list(marg.values) + [n_sessions]
        return pa.table(
            {
                "a": pa.array(out_a, pa.string()),
                "b": pa.array(out_b, pa.string()),
                "c": pa.array(np.asarray(out_c, dtype=np.int64)),
            }
        )

    parts = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # O(|types|^2)
    )
    n_sessions = int(parts.loc[parts["a"] == "\x00", "c"].sum())
    marg = {
        r.a: int(r.c)
        for r in parts[(parts["b"] == "") & (parts["a"] != "\x00")].itertuples()
    }
    both = {
        (r.a, r.b): int(r.c)
        for r in parts[parts["b"] != ""].itertuples()
    }
    types = sorted(marg)
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            rows.append(
                {
                    "type_a": a,
                    "type_b": b,
                    "n_both": both.get((a, b), 0),
                    "n_a": marg[a],
                    "n_b": marg[b],
                    "n_sessions": n_sessions,
                }
            )
    out = pd.DataFrame(rows)
    for c in ("n_both", "n_a", "n_b", "n_sessions"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


SESSION_CROSS_LIFT_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts)
                   - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                   > 1800000000 THEN 1
              WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                   IS NULL THEN 1
              ELSE 0 END AS new_sess
  FROM events
), s AS (
  SELECT user_id, event_type,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
), st AS (
  SELECT DISTINCT user_id, sid, event_type FROM s
), ns AS (
  SELECT COUNT(*) AS n FROM (SELECT DISTINCT user_id, sid FROM st)
), marg AS (
  SELECT event_type, COUNT(*) AS n FROM st GROUP BY 1
), bo AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n
  FROM st a JOIN st b
    ON a.user_id = b.user_id AND a.sid = b.sid
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT g.type_a, g.type_b,
       CAST(COALESCE(bo.n, 0) AS BIGINT) AS n_both,
       CAST(ma.n AS BIGINT) AS n_a,
       CAST(mb.n AS BIGINT) AS n_b,
       CAST(ns.n AS BIGINT) AS n_sessions
FROM (SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM marg a JOIN marg b ON a.event_type < b.event_type) g
JOIN marg ma ON ma.event_type = g.type_a
JOIN marg mb ON mb.event_type = g.type_b
LEFT JOIN bo ON bo.type_a = g.type_a AND bo.type_b = g.type_b
CROSS JOIN ns
ORDER BY g.type_a, g.type_b
"""


# -- causal inference: difference-in-differences --------------------------------


def did_type_effect(sf_dir: str) -> "pd.DataFrame":
    """Difference-in-differences screen over the event stream: for each
    event type (treated group) vs the 'view' baseline (control), the
    pre/post change in mean value where the period split is the corpus
    MIDPOINT day (min_day + max_day + 1) // 2 — post = day >= split.
    DiD = (mean_t_post - mean_t_pre) - (mean_v_post - mean_v_pre),
    emitted as floor-scaled micro-dollars over the exact common
    denominator n_tp*n_tr*n_vp*n_vr (Python-int exact; HUGEINT with
    negative-safe floor emulation in the oracle).  ONE shared
    (type, day) fold — the split day derives from the SAME fold, no
    second scan.  Output: (event_type, n_pre, n_post, did_micro) for
    every type except the control."""
    from ray.data.aggregate import Count, Sum

    ds = _read_events(sf_dir, ["ts", "event_type", "value"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        folded = pa.table(
            {"e": t["event_type"], "day": day,
             "n": pa.array([1] * len(t), pa.int64()), "s": cents}
        )
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate(
            [("n", "sum"), ("s", "sum")]
        )

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(Sum("n_sum", alias_name="n"), Sum("s_sum", alias_name="s"))
        .to_pandas()  # O(|types| x span)
    )
    lo, hi = int(d["day"].min()), int(d["day"].max())
    split = (lo + hi + 1) // 2
    d["post"] = (d["day"] >= split).astype(int)
    cells: dict[tuple[str, int], tuple[int, int]] = {}
    for (e, post), sub in d.groupby(["e", "post"]):
        cells[(e, int(post))] = (int(sub["n"].sum()), int(sub["s"].sum()))
    n_vr, s_vr = cells.get(("view", 0), (0, 0))
    n_vp, s_vp = cells.get(("view", 1), (0, 0))
    rows = []
    for e in sorted({k for k, _ in cells}):
        if e == "view":
            continue
        n_tr, s_tr = cells.get((e, 0), (0, 0))
        n_tp, s_tp = cells.get((e, 1), (0, 0))
        den = n_tp * n_tr * n_vp * n_vr
        num = (
            s_tp * n_tr * n_vp * n_vr
            - s_tr * n_tp * n_vp * n_vr
            - s_vp * n_tp * n_tr * n_vr
            + s_vr * n_tp * n_tr * n_vp
        )
        rows.append(
            {
                "event_type": e,
                "n_pre": n_tr,
                "n_post": n_tp,
                "did_micro": (10_000 * num) // den if den else 0,
            }
        )
    out = pd.DataFrame(rows)
    for c in ("n_pre", "n_post", "did_micro"):
        out[c] = out[c].astype("int64")  # raises on overflow
    return out.reset_index(drop=True)


DID_TYPE_EFFECT_SQL = """
WITH b AS (
  SELECT (MIN(epoch_us(ts) // 86400000000)
          + MAX(epoch_us(ts) // 86400000000) + 1) // 2 AS split
  FROM events
), x AS (
  SELECT event_type AS e,
         CASE WHEN epoch_us(ts) // 86400000000 >= b.split
              THEN 1 ELSE 0 END AS post,
         CAST(CAST(ROUND(value * 100) AS BIGINT) AS HUGEINT) AS c
  FROM events, b
), cells AS (
  SELECT e, post, COUNT(*) AS n, SUM(c) AS s FROM x GROUP BY e, post
), v AS (
  SELECT
    MAX(CASE WHEN post = 0 THEN n ELSE 0 END) AS n_vr,
    MAX(CASE WHEN post = 0 THEN s ELSE 0 END) AS s_vr,
    MAX(CASE WHEN post = 1 THEN n ELSE 0 END) AS n_vp,
    MAX(CASE WHEN post = 1 THEN s ELSE 0 END) AS s_vp
  FROM cells WHERE e = 'view'
), t AS (
  SELECT e,
    MAX(CASE WHEN post = 0 THEN n ELSE 0 END) AS n_tr,
    MAX(CASE WHEN post = 0 THEN s ELSE 0 END) AS s_tr,
    MAX(CASE WHEN post = 1 THEN n ELSE 0 END) AS n_tp,
    MAX(CASE WHEN post = 1 THEN s ELSE 0 END) AS s_tp
  FROM cells WHERE e <> 'view' GROUP BY e
), d AS (
  SELECT t.e, t.n_tr, t.n_tp,
         t.n_tp * t.n_tr * v.n_vp * v.n_vr AS den,
         10000 * (t.s_tp * t.n_tr * v.n_vp * v.n_vr
                  - t.s_tr * t.n_tp * v.n_vp * v.n_vr
                  - v.s_vp * t.n_tp * t.n_tr * v.n_vr
                  + v.s_vr * t.n_tp * t.n_tr * v.n_vp) AS num
  FROM t CROSS JOIN v
)
SELECT e AS event_type,
       CAST(n_tr AS BIGINT) AS n_pre, CAST(n_tp AS BIGINT) AS n_post,
       CAST(CASE WHEN den = 0 THEN 0
            ELSE (num - ((num % den) + den) % den) // den END
            AS BIGINT) AS did_micro
FROM d ORDER BY e
"""


# -- Shapley-value channel attribution ------------------------------------------


#: channel -> coalition bit, the four non-purchase event types in sorted
#: order; k = 4 so k! = 24 scales every Shapley weight to an exact integer.
_SHAPLEY_CHANNELS = ["click", "error", "signup", "view"]
_SHAPLEY_FACT = [1, 1, 2, 6, 24]  # n!


def shapley_attribution(sf_dir: str) -> "pd.DataFrame":
    """Shapley-value conversion attribution over the four non-purchase
    channels (the game-theoretic companion to ``markov_attribution`` and
    ``first_touch_attribution``): each user's coalition is the SET of
    channels touched strictly before their first purchase (all touches
    for non-converters), the characteristic function is
    v(S) = #converted users whose coalition ⊆ S (Zhao et al.'s
    simplified-game form), and each channel's credit is the exact
    Shapley sum φ_i·k! = Σ_{S∌i} |S|!·(k−1−|S|)!·(v(S∪i) − v(S)) —
    integer-exact, so the oracle's 16-subset grid replay hash-matches.
    ONE user-bucket co-location folds to ≤ 2^k (mask, conv) partials;
    the driver's subset-sum (zeta transform) and Shapley loop are O(4^k)
    on k = 4.  Output: (channel, shapley_num) with the efficiency
    identity Σφ = k!·(v(full) − v(∅)).  Beyond-reference engine addition
    (SURVEY.md §2.8)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ubk = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["ts", "user_id", "event_type"])
    bit = {c: 1 << i for i, c in enumerate(_SHAPLEY_CHANNELS)}
    k = len(_SHAPLEY_CHANNELS)

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(ts_us=g["ts"].astype("int64"))
        fp = (
            g[g["event_type"] == "purchase"]
            .groupby("user_id")["ts_us"].min()
            .rename("fp")
        )
        g = g.merge(fp, left_on="user_id", right_index=True, how="left")
        ch = g[g["event_type"] != "purchase"]
        pre = ch[ch["fp"].isna() | (ch["ts_us"] < ch["fp"])]
        bits = pre["event_type"].map(bit).astype(np.int64)
        masks = (
            pd.DataFrame({"user_id": pre["user_id"], "b": bits})
            .groupby("user_id")["b"]
            .agg(lambda s: int(np.bitwise_or.reduce(s.to_numpy())))
        )
        users = pd.DataFrame({"user_id": g["user_id"].unique()})
        users["mask"] = users["user_id"].map(masks).fillna(0).astype(np.int64)
        users["conv"] = (
            users["user_id"].isin(fp.index).astype(np.int64)
        )
        out = (
            users.groupby("mask", as_index=False)["conv"].sum()
            .rename(columns={"conv": "c"})
        )
        out["c"] = out["c"].astype("int64")
        return out

    t = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("mask")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # <= 2^k rows
    )
    conv = {int(r["mask"]): int(r["c"]) for _, r in t.iterrows()}
    nmask = 1 << k
    v = [0] * nmask
    for s in range(nmask):
        v[s] = sum(c for m, c in conv.items() if (m & s) == m)
    rows = []
    for i, name in enumerate(_SHAPLEY_CHANNELS):
        phi = 0
        for s in range(nmask):
            if (s >> i) & 1:
                continue
            p = bin(s).count("1")
            w = _SHAPLEY_FACT[p] * _SHAPLEY_FACT[k - 1 - p]
            phi += w * (v[s | (1 << i)] - v[s])
        rows.append({"channel": name, "shapley_num": phi})
    out = pd.DataFrame(rows).sort_values("channel").reset_index(drop=True)
    out["shapley_num"] = out["shapley_num"].astype("int64")
    return out


SHAPLEY_ATTRIBUTION_SQL = """
WITH fp AS (
  SELECT user_id, MIN(ts) AS fpts FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
), um AS (
  SELECT e.user_id,
         COALESCE(BIT_OR(CASE e.event_type
                         WHEN 'click' THEN 1 WHEN 'error' THEN 2
                         WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END)
                  FILTER (WHERE e.event_type <> 'purchase'
                          AND (fp.fpts IS NULL OR e.ts < fp.fpts)), 0)
           AS mask,
         CASE WHEN fp.fpts IS NULL THEN 0 ELSE 1 END AS conv
  FROM events e LEFT JOIN fp ON e.user_id = fp.user_id
  GROUP BY e.user_id, fp.fpts
), t AS (
  SELECT mask, SUM(conv) AS c FROM um GROUP BY mask
), s AS (
  SELECT CAST(range AS BIGINT) AS smask FROM range(16)
), v AS (
  SELECT s.smask, COALESCE(SUM(t.c), 0) AS v
  FROM s LEFT JOIN t ON (t.mask & s.smask) = t.mask
  GROUP BY s.smask
), ch AS (
  SELECT * FROM (VALUES (0, 'click'), (1, 'error'),
                        (2, 'signup'), (3, 'view')) AS ch(i, channel)
), phi AS (
  SELECT ch.channel,
         SUM((CASE ((va.smask >> 0) & 1) + ((va.smask >> 1) & 1)
                   + ((va.smask >> 2) & 1) + ((va.smask >> 3) & 1)
              WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END)
             * (vb.v - va.v)) AS shapley_num
  FROM ch
  JOIN v va ON ((va.smask >> ch.i) & 1) = 0
  JOIN v vb ON vb.smask = (va.smask | (1 << ch.i))
  GROUP BY ch.channel
)
SELECT channel, CAST(shapley_num AS BIGINT) AS shapley_num
FROM phi ORDER BY channel
"""


# -- Lempel-Ziv complexity of the daily-activity symbol stream ------------------


def lz_complexity_by_type(sf_dir: str) -> "pd.DataFrame":
    """LZ76 (Kaspar-Schuster) phrase complexity of each type's daily
    activity symbol stream — days symbolize '1'/'0' against the type's
    lower-median daily count (the ``runs_test_by_type`` convention) and
    the parser counts dictionary phrases: low complexity = periodic /
    trending activity, high = noise.  The parse is the deterministic
    prefix-search variant (extend the phrase while S[p..pos] occurs in
    S[1..pos-1], else cut), replayed bit-for-bit by the oracle's
    recursive CTE over the string_agg'd symbol string.  ONE shared
    (type, day) fold, O(span^2) driver parse per type (span-bounded).
    Output: (event_type, n_days, lz_c)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        folded = pa.table({"e": t["event_type"], "day": day})
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate(
            [([], "count_all")]
        )

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|types| x span)
    )
    rows = []
    for e, sub in d.groupby("e"):
        sub = sub.sort_values("day")
        cs = sub["c"].to_numpy(np.int64)
        n = len(cs)
        med = int(np.sort(cs)[(n - 1) // 2])
        s = "".join("1" if c > med else "0" for c in cs)
        c = 1
        p = 1  # 0-based phrase start
        pos = 1
        while pos < n:
            if s[p : pos + 1] in s[:pos]:
                pos += 1
            else:
                c += 1
                pos += 1
                p = pos
        rows.append({"event_type": e, "n_days": n, "lz_c": c})
    out = pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
    for col in ("n_days", "lz_c"):
        out[col] = out[col].astype("int64")
    return out.reset_index(drop=True)


LZ_COMPLEXITY_SQL = """
WITH RECURSIVE d AS (
  SELECT event_type AS e, epoch_us(ts) // 86400000000 AS day,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
), rkd AS (
  SELECT e, c, ROW_NUMBER() OVER (PARTITION BY e ORDER BY c, day) AS rn,
         COUNT(*) OVER (PARTITION BY e) AS n
  FROM d
), med AS (
  SELECT e, MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN c END) AS med
  FROM rkd GROUP BY e
), sym AS (
  SELECT d.e,
         string_agg(CASE WHEN d.c > med.med THEN '1' ELSE '0' END, ''
                    ORDER BY d.day) AS s,
         COUNT(*) AS n
  FROM d JOIN med ON d.e = med.e GROUP BY d.e
), r AS (
  SELECT e, s, n, 2 AS pos, 2 AS p, 1 AS c FROM sym
  UNION ALL
  SELECT e, s, n, pos + 1,
         CASE WHEN strpos(substr(s, 1, pos - 1),
                          substr(s, p, pos - p + 1)) > 0
              THEN p ELSE pos + 1 END,
         CASE WHEN strpos(substr(s, 1, pos - 1),
                          substr(s, p, pos - p + 1)) > 0
              THEN c ELSE c + 1 END
  FROM r WHERE pos <= n
)
SELECT e AS event_type, CAST(n AS BIGINT) AS n_days, CAST(c AS BIGINT) AS lz_c
FROM r WHERE pos = n + 1 ORDER BY e
"""


# -- two-state burst segmentation (integer Viterbi) -----------------------------


def burst_viterbi_by_type(sf_dir: str) -> "pd.DataFrame":
    """Kleinberg-style two-state BURST segmentation of each type's daily
    activity (simplified to integer linear costs so the Viterbi replay is
    exact): states are 'base' and 'burst' with target rates r_lo / r_hi =
    the lower/upper quartile of the observed daily counts (lower-order-
    statistic convention), day cost = |count - rate|, and switching pays
    lam = max(1, (r_hi - r_lo) // 4).  The DP carries BOTH state costs
    AND the burst-day count along the argmin path (ties prefer staying),
    so the optimal segmentation's burst mass emerges without a backtrack
    pass — the trick that makes the oracle a single forward recursive
    CTE.  ONE shared (type, day) fold, O(span) driver DP per type.
    Output: (event_type, n_days, r_lo, r_hi, total_cost, burst_days)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        folded = pa.table({"e": t["event_type"], "day": day})
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate(
            [([], "count_all")]
        )

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|types| x span)
    )
    rows = []
    for e, sub in d.groupby("e"):
        sub = sub.sort_values("day")
        cs = sub["c"].to_numpy(np.int64)
        n = len(cs)
        srt = np.sort(cs)
        r_lo = int(srt[(n - 1) // 4])
        r_hi = int(srt[3 * (n - 1) // 4])
        lam = max(1, (r_hi - r_lo) // 4)
        c0 = abs(int(cs[0]) - r_lo)
        c1 = abs(int(cs[0]) - r_hi) + lam
        b0, b1 = 0, 1
        for t_ in range(1, n):
            stay0, sw0 = c0, c1 + lam
            n0 = abs(int(cs[t_]) - r_lo) + min(stay0, sw0)
            nb0 = b0 if stay0 <= sw0 else b1
            stay1, sw1 = c1, c0 + lam
            n1 = abs(int(cs[t_]) - r_hi) + min(stay1, sw1)
            nb1 = (b1 if stay1 <= sw1 else b0) + 1
            c0, c1, b0, b1 = n0, n1, nb0, nb1
        if c0 <= c1:
            total, bursts = c0, b0
        else:
            total, bursts = c1, b1
        rows.append(
            {"event_type": e, "n_days": n, "r_lo": r_lo, "r_hi": r_hi,
             "total_cost": total, "burst_days": bursts}
        )
    out = pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
    for c in ("n_days", "r_lo", "r_hi", "total_cost", "burst_days"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


BURST_VITERBI_SQL = """
WITH RECURSIVE d AS (
  SELECT event_type AS e, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), byday AS (
  SELECT e, day, c, ROW_NUMBER() OVER (PARTITION BY e ORDER BY day) AS rn,
         COUNT(*) OVER (PARTITION BY e) AS n
  FROM d
), byc AS (
  SELECT e, c, ROW_NUMBER() OVER (PARTITION BY e ORDER BY c, day) AS rc,
         COUNT(*) OVER (PARTITION BY e) AS n
  FROM d
), q AS (
  SELECT e,
         MAX(CASE WHEN rc = (n - 1) // 4 + 1 THEN c END) AS r_lo,
         MAX(CASE WHEN rc = 3 * (n - 1) // 4 + 1 THEN c END) AS r_hi
  FROM byc GROUP BY e
), lamt AS (
  SELECT e, r_lo, r_hi, GREATEST(1, (r_hi - r_lo) // 4) AS lam FROM q
), v AS (
  SELECT b.e, b.n, 1 AS pos,
         ABS(b.c - l.r_lo) AS c0,
         ABS(b.c - l.r_hi) + l.lam AS c1,
         0 AS b0, 1 AS b1
  FROM byday b JOIN lamt l ON b.e = l.e WHERE b.rn = 1
  UNION ALL
  SELECT v.e, v.n, v.pos + 1,
         ABS(b.c - l.r_lo) + LEAST(v.c0, v.c1 + l.lam),
         ABS(b.c - l.r_hi) + LEAST(v.c1, v.c0 + l.lam),
         CASE WHEN v.c0 <= v.c1 + l.lam THEN v.b0 ELSE v.b1 END,
         CASE WHEN v.c1 <= v.c0 + l.lam THEN v.b1 ELSE v.b0 END + 1
  FROM v
  JOIN byday b ON b.e = v.e AND b.rn = v.pos + 1
  JOIN lamt l ON l.e = v.e
  WHERE v.pos < v.n
)
SELECT v.e AS event_type, CAST(v.n AS BIGINT) AS n_days,
       CAST(l.r_lo AS BIGINT) AS r_lo, CAST(l.r_hi AS BIGINT) AS r_hi,
       CAST(CASE WHEN c0 <= c1 THEN c0 ELSE c1 END AS BIGINT) AS total_cost,
       CAST(CASE WHEN c0 <= c1 THEN b0 ELSE b1 END AS BIGINT) AS burst_days
FROM v JOIN lamt l ON l.e = v.e
WHERE v.pos = v.n ORDER BY v.e
"""


# -- time-constrained funnel -----------------------------------------------------

WFUNNEL_CLICK_US = 3_600_000_000         # view -> click within 1 hour
WFUNNEL_PURCHASE_US = 86_400_000_000     # click -> purchase within 24 hours


def windowed_funnel(sf_dir: str) -> "object":
    """Time-CONSTRAINED funnel view -> click -> purchase (the realistic
    attribution variant of ``funnel_counts``): the click must land within
    1 hour of the user's first view, the purchase within 24 hours of the
    first qualifying click — late conversions don't count.  Same
    execution shape: one user-bucket co-location, three vectorized
    merge+filter+min passes per bucket, O(1) partials.  Output: one row
    (n_view, n_click_1h, n_purchase_24h)."""
    ubk = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["ts", "user_id", "event_type"]).filter(
        expr=(
            "event_type == 'view' or event_type == 'click'"
            " or event_type == 'purchase'"
        )
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(ts_us=g["ts"].astype("int64"))
        t1 = g[g["event_type"] == "view"].groupby("user_id")["ts_us"].min()
        clicks = g[g["event_type"] == "click"].merge(
            t1.rename("t1"), left_on="user_id", right_index=True
        )
        t2 = (
            clicks[
                (clicks["ts_us"] > clicks["t1"])
                & (clicks["ts_us"] <= clicks["t1"] + WFUNNEL_CLICK_US)
            ]
            .groupby("user_id")["ts_us"].min()
        )
        purch = g[g["event_type"] == "purchase"].merge(
            t2.rename("t2"), left_on="user_id", right_index=True
        )
        t3 = (
            purch[
                (purch["ts_us"] > purch["t2"])
                & (purch["ts_us"] <= purch["t2"] + WFUNNEL_PURCHASE_US)
            ]
            .groupby("user_id")["ts_us"].min()
        )
        return pd.DataFrame(
            {
                "n_view": pd.Series([len(t1)], dtype="int64"),
                "n_click_1h": pd.Series([len(t2)], dtype="int64"),
                "n_purchase_24h": pd.Series([len(t3)], dtype="int64"),
            }
        )

    parts = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # one row per user bucket
    )
    return pd.DataFrame(
        {
            "n_view": [int(parts["n_view"].sum())],
            "n_click_1h": [int(parts["n_click_1h"].sum())],
            "n_purchase_24h": [int(parts["n_purchase_24h"].sum())],
        }
    )


WINDOWED_FUNNEL_SQL = f"""
WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
    AND epoch_us(e.ts) <= v.t1 + {WFUNNEL_CLICK_US}
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
    AND epoch_us(e.ts) <= c.t2 + {WFUNNEL_PURCHASE_US}
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_1h,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_24h
"""


# -- gapped-subsequence triple mining --------------------------------------------


def subseq_triples(sf_dir: str) -> "pd.DataFrame":
    """Sequential-pattern mining with GAPS (the PrefixSpan-style
    complement to the adjacent-only ``seq_pattern_hits``): for every
    ordered type triple (a, b, c) — 125 cells — the number of users
    whose event sequence contains a ... b ... c as a SUBSEQUENCE
    (positions strictly increasing, any gap).  Containment tests use
    the greedy-earliest chain (first a, first b after it, any c after
    that), which is exact for subsequence matching; sequence order is
    (ts, event_id).  One user-bucket co-location; the in-bucket kernel
    runs 25 vectorized first-after min-chains + 125 exists-counts over
    the whole bucket frame — |types|^2-bounded passes, never per-user
    Python.  Output: the zero-filled (a, b, c, n_users) grid."""
    import numpy as np

    from ray.data.aggregate import Sum

    ubk = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["ts", "event_id", "user_id", "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return t.append_column(
            "ub", pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(ts_us=g["ts"].astype("int64"))
        g = g.sort_values(["user_id", "ts_us", "event_id"])
        g["pos"] = np.arange(len(g), dtype=np.int64)  # global order works
        # per-user monotone because rows are user-sorted first
        types = sorted(g["event_type"].unique())
        rows = []
        for a in types:
            fa = g[g["event_type"] == a].groupby("user_id")["pos"].min()
            for b in types:
                gb = g[g["event_type"] == b].merge(
                    fa.rename("fa"), left_on="user_id", right_index=True
                )
                fab = (
                    gb[gb["pos"] > gb["fa"]]
                    .groupby("user_id")["pos"].min()
                )
                # one merge resolves ALL 5 c-cells of this (a, b) prefix:
                # rows after the user's fab position, user-distinct per type
                tail = g.merge(
                    fab.rename("fab"), left_on="user_id", right_index=True
                )
                tail = tail[tail["pos"] > tail["fab"]]
                cnt = tail.groupby("event_type")["user_id"].nunique()
                for c in types:
                    rows.append(
                        {"a": a, "b": b, "c": c, "n": int(cnt.get(c, 0))}
                    )
        out = pd.DataFrame(rows)
        out["n"] = out["n"].astype("int64")
        return out

    parts = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["a", "b", "c"])
        .aggregate(Sum("n", alias_name="n_users"))
        .to_pandas()  # <= |types|^3 rows
    )
    types = sorted(
        set(parts["a"]) | set(parts["b"]) | set(parts["c"])
    )
    grid = pd.DataFrame(
        [(a, b, c) for a in types for b in types for c in types],
        columns=["a", "b", "c"],
    )
    out = grid.merge(parts, on=["a", "b", "c"], how="left").fillna(0)
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["a", "b", "c"]).reset_index(drop=True)


SUBSEQ_TRIPLES_SQL = """
WITH seq AS (
  SELECT user_id AS u, event_type AS e,
         ROW_NUMBER() OVER (ORDER BY user_id, ts, event_id) AS pos
  FROM events
), types AS (
  SELECT DISTINCT e FROM seq
), fa AS (
  SELECT u, e AS a, MIN(pos) AS p1 FROM seq GROUP BY u, e
), fab AS (
  SELECT fa.u, fa.a, s.e AS b, MIN(s.pos) AS p2
  FROM fa JOIN seq s ON s.u = fa.u AND s.pos > fa.p1
  GROUP BY fa.u, fa.a, s.e
), fabc AS (
  SELECT fab.a, fab.b, s.e AS c, COUNT(DISTINCT fab.u) AS n
  FROM fab JOIN seq s ON s.u = fab.u AND s.pos > fab.p2
  GROUP BY fab.a, fab.b, s.e
)
SELECT ta.e AS a, tb.e AS b, tc.e AS c,
       CAST(COALESCE(f.n, 0) AS BIGINT) AS n_users
FROM types ta CROSS JOIN types tb CROSS JOIN types tc
LEFT JOIN fabc f ON f.a = ta.e AND f.b = tb.e AND f.c = tc.e
ORDER BY ta.e, tb.e, tc.e
"""


# -- churn baseline evaluation ---------------------------------------------------


def churn_baseline_confusion(sf_dir: str) -> "pd.DataFrame":
    """Churn-prediction BASELINE confusion matrix: label = user inactive
    in the corpus's final 7 days (churned), predictor = the naive
    "inactive in the penultimate 7 days too" rule — the
    yesterday's-weather baseline every churn model must beat.  Window
    edges derive from the corpus MAX day (a scalar pre-fold); the
    per-user bits then fold inside ONE user-bucket co-location to 4-row
    partials, so driver state is O(buckets), never O(users).  Output:
    (predicted_churn, actual_churn, n_users)."""
    import numpy as np

    from ray.data.aggregate import Max, Sum

    ds = _read_events(sf_dir, ["ts", "user_id"])

    def day_part(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        return pa.table({"mx": pa.array([pc.max(day).as_py()], pa.int64())})

    mx = int(
        ds.map_batches(day_part, batch_format="pyarrow").max("mx")
    )
    last_lo, prev_lo = mx - 6, mx - 13
    ubk = _user_buckets(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        return pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32()),
                "u": uid,
                "day": day,
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        day = g["day"].to_numpy(np.int64)
        sub = pd.DataFrame(
            {
                "u": g["u"].to_numpy(np.int64),
                "al": (day >= last_lo).astype(np.int64),
                "ap": ((day >= prev_lo) & (day < last_lo)).astype(np.int64),
            }
        )
        pu = sub.groupby("u").agg(al=("al", "max"), ap=("ap", "max"))
        out = (
            pu.groupby(["al", "ap"]).size().rename("n").reset_index()
        )
        out["predicted_churn"] = 1 - out["ap"]
        out["actual_churn"] = 1 - out["al"]
        out = out[["predicted_churn", "actual_churn", "n"]]
        return out.astype("int64")

    parts = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["predicted_churn", "actual_churn"])
        .aggregate(Sum("n", alias_name="n_users"))
        .to_pandas()  # <= 4 rows
    )
    grid = pd.DataFrame(
        [(p, a) for p in (0, 1) for a in (0, 1)],
        columns=["predicted_churn", "actual_churn"],
    )
    out = grid.merge(parts, on=["predicted_churn", "actual_churn"], how="left")
    out["n_users"] = out["n_users"].fillna(0).astype("int64")
    for c in ("predicted_churn", "actual_churn"):
        out[c] = out[c].astype("int64")
    return out.sort_values(
        ["predicted_churn", "actual_churn"]
    ).reset_index(drop=True)


CHURN_BASELINE_SQL = """
WITH d AS (
  SELECT user_id AS u, epoch_us(ts) // 86400000000 AS day
  FROM events GROUP BY 1, 2
), mx AS (
  SELECT MAX(day) AS m FROM d
), per_user AS (
  SELECT u,
         1 - MAX(CASE WHEN day >= mx.m - 6 THEN 1 ELSE 0 END)
           AS actual_churn,
         1 - MAX(CASE WHEN day >= mx.m - 13 AND day < mx.m - 6
                      THEN 1 ELSE 0 END) AS predicted_churn
  FROM d, mx GROUP BY u
), grid AS (
  SELECT p.p AS predicted_churn, a.a AS actual_churn
  FROM (VALUES (0), (1)) p(p) CROSS JOIN (VALUES (0), (1)) a(a)
)
SELECT CAST(g.predicted_churn AS BIGINT) AS predicted_churn,
       CAST(g.actual_churn AS BIGINT) AS actual_churn,
       CAST(COALESCE(COUNT(pu.u), 0) AS BIGINT) AS n_users
FROM grid g LEFT JOIN per_user pu
  ON pu.predicted_churn = g.predicted_churn
 AND pu.actual_churn = g.actual_churn
GROUP BY g.predicted_churn, g.actual_churn
ORDER BY g.predicted_churn, g.actual_churn
"""


# -- exact distinct-user overlap between type pairs ------------------------------


def type_overlap_exact(sf_dir: str) -> "pd.DataFrame":
    """EXACT distinct-user overlap |users(a) ∩ users(b)| for every type
    pair — the truth the KMV sketch in ``kmv_type_overlap`` estimates,
    and the set-cardinality complement to the frequency-weighted
    ``type_user_inner``: inside ONE user-bucket co-location each user
    folds to a 5-bit touched MASK, buckets emit 2^|types|-bounded mask
    counts, and every pairwise intersection is a subset-sum over the 32
    global mask counts — no per-pair pass, no distinct shuffle,
    O(2^|types|) driver state.  Output: (type_a, type_b, n_both, n_a,
    n_b) for a < b."""
    import numpy as np

    from ray.data.aggregate import Sum

    ubk = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type"])

    # type -> bit map must be global: derive from a tiny distinct fold
    types = sorted(
        ds.map_batches(
            lambda t: pa.TableGroupBy(
                pa.table({"e": t["event_type"]}), "e"
            ).aggregate([]),
            batch_format="pyarrow",
        )
        .groupby("e")
        .count()
        .to_pandas()["e"]
    )
    bit = {e: 1 << i for i, e in enumerate(types)}

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32()),
                "u": uid,
                "e": t["event_type"],
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = g["e"].map(bit).to_numpy(np.int64)
        masks = (
            pd.DataFrame({"u": g["u"].to_numpy(np.int64), "b": b})
            .groupby("u")["b"]
            .agg(lambda s: int(np.bitwise_or.reduce(s.to_numpy())))
        )
        out = masks.value_counts().rename("n").reset_index()
        out.columns = ["mask", "n"]
        return out.astype("int64")

    parts = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("mask")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= 2^|types| rows
    )
    mask_counts = {int(r["mask"]): int(r["n"]) for _, r in parts.iterrows()}
    rows = []
    for i, a in enumerate(types):
        for b2 in types[i + 1:]:
            ba, bb = bit[a], bit[b2]
            n_both = sum(
                c for m, c in mask_counts.items()
                if (m & ba) and (m & bb)
            )
            n_a = sum(c for m, c in mask_counts.items() if m & ba)
            n_b = sum(c for m, c in mask_counts.items() if m & bb)
            rows.append(
                {"type_a": a, "type_b": b2, "n_both": n_both,
                 "n_a": n_a, "n_b": n_b}
            )
    out = pd.DataFrame(rows)
    for c in ("n_both", "n_a", "n_b"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


TYPE_OVERLAP_EXACT_SQL = """
WITH ut AS (
  SELECT DISTINCT user_id AS u, event_type AS e FROM events
), types AS (
  SELECT DISTINCT e FROM ut
), pairs AS (
  SELECT a.e AS ta, b.e AS tb FROM types a JOIN types b ON a.e < b.e
)
SELECT p.ta AS type_a, p.tb AS type_b,
       CAST((SELECT COUNT(*) FROM ut x JOIN ut y
             ON x.u = y.u AND x.e = p.ta AND y.e = p.tb) AS BIGINT)
         AS n_both,
       CAST((SELECT COUNT(*) FROM ut x WHERE x.e = p.ta) AS BIGINT) AS n_a,
       CAST((SELECT COUNT(*) FROM ut y WHERE y.e = p.tb) AS BIGINT) AS n_b
FROM pairs p ORDER BY p.ta, p.tb
"""


# -- Holt-Winters triple exponential smoothing ----------------------------------


def holt_winters_by_type(sf_dir: str) -> "pd.DataFrame":
    """Additive HOLT-WINTERS triple exponential smoothing of each type's
    zero-filled daily count series with period-7 seasonality and
    power-of-two gains alpha = beta = gamma = 1/4 — the seasonal top of
    the forecasting ladder (ewma -> holt_linear -> here), as an exact
    floored fixed point at 10^6 scale:

        L_t = floor((y_t*1e6 - S_{t-7} + 3*(L_{t-1} + B_{t-1})) / 4)
        B_t = floor((L_t - L_{t-1} + 3*B_{t-1}) / 4)
        S_t = floor((y_t*1e6 - L_t + 3*S_{t-7}) / 4)

    with L_0 = y_0*1e6, B_0 = 0 and the seven seasonal slots starting
    at 0.  The oracle's recursive CTE carries the seven slots as seven
    explicit columns (only slot t%7 updates per step).  ONE (type, day)
    fold, O(span) exact-integer driver replay.  Output: (event_type,
    n_days, level_u, trend_u, season_u, forecast7_u) with
    forecast7 = L + 7B + S_{slot(T)} (the slot day T+7 reads)."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def fold(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        folded = pa.table({"e": t["event_type"], "day": day})
        return pa.TableGroupBy(folded, ["e", "day"]).aggregate(
            [([], "count_all")]
        )

    d = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "day"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|types| x span days)
    )
    d0, d1 = int(d["day"].min()), int(d["day"].max())
    m = d1 - d0 + 1
    rows = []
    for e, sub in d.groupby("e"):
        counts = [0] * m
        for r in sub.itertuples():
            counts[int(r.day) - d0] = int(r.c)
        lvl, tr = counts[0] * 10**6, 0
        sea = [0] * 7
        for t_ in range(1, m):
            v = counts[t_]
            slot = t_ % 7
            sm = sea[slot]
            lnew = (v * 10**6 - sm + 3 * (lvl + tr)) // 4
            tr = (lnew - lvl + 3 * tr) // 4
            sea[slot] = (v * 10**6 - lnew + 3 * sm) // 4
            lvl = lnew
        season = sea[(m - 1) % 7]
        rows.append(
            {"event_type": e, "n_days": m, "level_u": lvl, "trend_u": tr,
             "season_u": season, "forecast7_u": lvl + 7 * tr + season}
        )
    return (
        pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
        .astype({c: "int64" for c in
                 ("n_days", "level_u", "trend_u", "season_u", "forecast7_u")})
        .reset_index(drop=True)
    )


def _holt_winters_sql() -> str:
    fl = (
        lambda x: f"({x} - ((({x}) % 4) + 4) % 4) // 4"
    )  # negative-safe floor-div-4 emulation
    s_cols = ", ".join(f"CAST(0 AS BIGINT) AS s{i}" for i in range(7))
    sm_case = (
        "CASE CAST((z.day - (SELECT d0 FROM span)) % 7 AS INTEGER) "
        + " ".join(f"WHEN {i} THEN it.s{i}" for i in range(7))
        + " END"
    )
    s_upd = ", ".join(
        f"CASE WHEN s.slot = {i} THEN s.snew ELSE s.s{i} END" for i in range(7)
    )
    season_pick = (
        "CASE CAST((day - (SELECT d0 FROM span)) % 7 AS INTEGER) "
        + " ".join(f"WHEN {i} THEN s{i}" for i in range(7))
        + " END"
    )
    return f"""
WITH RECURSIVE d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
days AS (
  SELECT span.d0 + u.g AS day
  FROM span, (
    SELECT generate_series AS g FROM generate_series(0, 100000)
  ) u
  WHERE span.d0 + u.g <= span.d1
),
types AS (SELECT DISTINCT event_type FROM d),
z AS (
  SELECT t.event_type, dd.day, COALESCE(d.c, 0) AS c
  FROM types t CROSS JOIN days dd
  LEFT JOIN d ON d.event_type = t.event_type AND d.day = dd.day
),
it AS (
  SELECT z.event_type, z.day,
         CAST(z.c * 1000000 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
         {s_cols}
  FROM z WHERE z.day = (SELECT d0 FROM span)
  UNION ALL
  SELECT s.event_type, s.day, s.lnew,
         {fl("s.lnew - s.l + 3 * s.b")},
         {s_upd}
  FROM (
    SELECT it.event_type, z.day, it.l, it.b,
           it.s0, it.s1, it.s2, it.s3, it.s4, it.s5, it.s6,
           CAST((z.day - (SELECT d0 FROM span)) % 7 AS INTEGER) AS slot,
           {fl(f"z.c * 1000000 - ({sm_case}) + 3 * (it.l + it.b)")} AS lnew,
           {fl(f"z.c * 1000000 - ({fl(f'z.c * 1000000 - ({sm_case}) + 3 * (it.l + it.b)')}) + 3 * ({sm_case})")}
             AS snew
    FROM it JOIN z ON z.event_type = it.event_type AND z.day = it.day + 1
  ) s
)
SELECT event_type,
       CAST((SELECT d1 - d0 + 1 FROM span) AS BIGINT) AS n_days,
       l AS level_u, b AS trend_u,
       CAST({season_pick} AS BIGINT) AS season_u,
       CAST(l + 7 * b + ({season_pick}) AS BIGINT) AS forecast7_u
FROM it WHERE day = (SELECT d1 FROM span)
ORDER BY event_type
"""


HOLT_WINTERS_BY_TYPE_SQL = _holt_winters_sql()


# -- Markov next-event prediction accuracy ----------------------------------------


def markov_next_accuracy(sf_dir: str) -> "pd.DataFrame":
    """Held-out NEXT-EVENT prediction accuracy of the first-order Markov
    chain (the evaluation layer over ``event_transitions`` /
    ``markov_stationary``): transitions whose source event falls before
    the corpus MIDPOINT day train the argmax predictor (ties to the
    lexicographically lowest target), later transitions test it — the
    honest sequence-model baseline number.  ONE user-bucket co-location
    emits (from, to, phase) pair partials (<= 2*|types|^2 rows); train
    matrix, predictions and per-type accuracy all come off that single
    bounded fold.  Unseen-in-train sources score 0 on their test rows.
    Output: (event_type, pred_next, n_test, n_correct)."""
    import numpy as np

    from ray.data.aggregate import Sum

    nb = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, nb - 1), pa.int32()),
                "user_id": uid,
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "event_type": t["event_type"],
                "ts_us": pc.cast(t["ts"].cast(pa.timestamp("us")), pa.int64()),
            }
        )

    def day_part(t: pa.Table) -> pa.Table:
        day = pc.divide(_ts_us_i64(t["ts"]), 86_400_000_000)
        return pa.table(
            {
                "lo": pa.array([pc.min(day).as_py()], pa.int64()),
                "hi": pa.array([pc.max(day).as_py()], pa.int64()),
            }
        )

    span = (
        _read_events(sf_dir, ["ts"])
        .map_batches(day_part, batch_format="pyarrow")
        .to_pandas()
    )
    split = (int(span["lo"].min()) + int(span["hi"].max()) + 1) // 2

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"])
        prev = g.groupby("user_id")["event_type"].shift(1)
        prev_ts = g.groupby("user_id")["ts_us"].shift(1)
        keep = prev.notna()
        phase = (
            (prev_ts[keep] // 86_400_000_000) >= split
        ).astype(int)
        agg = (
            pd.DataFrame(
                {
                    "from_type": prev[keep],
                    "to_type": g.loc[keep, "event_type"],
                    "phase": phase,
                }
            )
            .groupby(["from_type", "to_type", "phase"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        agg["n"] = agg["n"].astype("int64")
        agg["phase"] = agg["phase"].astype("int64")
        return agg

    m = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(transitions, batch_format="pandas")
        .groupby(["from_type", "to_type", "phase"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= 2 x |types|^2 rows
    )
    train = m[m["phase"] == 0]
    test = m[m["phase"] == 1]
    pred = {}
    for a, sub in train.groupby("from_type"):
        sub = sub.sort_values(["n", "to_type"], ascending=[False, True])
        pred[a] = sub.iloc[0]["to_type"]
    rows = []
    for a, sub in test.groupby("from_type"):
        n_test = int(sub["n"].sum())
        p = pred.get(a)
        n_correct = (
            int(sub[sub["to_type"] == p]["n"].sum()) if p is not None else 0
        )
        rows.append(
            {"event_type": a, "pred_next": p if p is not None else "",
             "n_test": n_test, "n_correct": n_correct}
        )
    out = pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
    for c in ("n_test", "n_correct"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


MARKOV_NEXT_ACCURACY_SQL = """
WITH b AS (
  SELECT (MIN(epoch_us(ts) // 86400000000)
          + MAX(epoch_us(ts) // 86400000000) + 1) // 2 AS split
  FROM events
), seq AS (
  SELECT user_id, event_type,
         epoch_us(ts) // 86400000000 AS day,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), tr AS (
  SELECT s.event_type AS a, s.nxt AS t,
         CASE WHEN s.day >= b.split THEN 1 ELSE 0 END AS phase,
         COUNT(*) AS n
  FROM seq s, b WHERE s.nxt IS NOT NULL
  GROUP BY 1, 2, 3
), pred AS (
  SELECT a, t AS pred_next FROM (
    SELECT a, t, ROW_NUMBER() OVER (
      PARTITION BY a ORDER BY n DESC, t) AS rk
    FROM tr WHERE phase = 0
  ) WHERE rk = 1
), test AS (
  SELECT a, SUM(n) AS n_test,
         SUM(CASE WHEN t = p.pred_next THEN n ELSE 0 END) AS n_correct,
         MAX(p.pred_next) AS pred_next
  FROM tr LEFT JOIN pred p USING (a)
  WHERE phase = 1 GROUP BY a
)
SELECT a AS event_type, COALESCE(pred_next, '') AS pred_next,
       CAST(n_test AS BIGINT) AS n_test,
       CAST(n_correct AS BIGINT) AS n_correct
FROM test ORDER BY a
"""


# -- weekly cohort VALUE (LTV) matrix --------------------------------------------


def cohort_value_matrix(sf_dir: str) -> "pd.DataFrame":
    """Weekly cohort LIFETIME-VALUE matrix — ``cohort_retention``'s
    revenue companion: users group by first-activity week, and each
    (cohort_week, weeks_since) cell accumulates the cohort's value
    CENTS in that later week (the LTV curve read along a row, the
    acquisition-quality comparison read down a column).  Same shape:
    one user-bucket co-location computes cohort + per-week sums
    in-group, then a bounded (span/7)^2 groupby.  Output:
    (cohort_week, weeks_since, n_users, value_c)."""
    import numpy as np

    from ray.data.aggregate import Sum

    WEEK_US = 7 * 86_400_000_000

    ds = _read_events(sf_dir, ["ts", "user_id", "value"])
    ubk = _user_buckets(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        week = pc.divide(_ts_us_i64(t["ts"]), WEEK_US)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        return pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, ubk - 1), pa.int32()),
                "user_id": uid,
                "week": pc.cast(week, pa.int64()),
                "c": cents,
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cohort = g.groupby("user_id")["week"].min().rename("cw")
        g = g.merge(cohort, left_on="user_id", right_index=True)
        g["ws"] = g["week"] - g["cw"]
        cell_val = (
            g.groupby(["cw", "ws"], as_index=False)["c"].sum()
        )
        users = (
            g[["user_id", "cw", "ws"]]
            .drop_duplicates()
            .groupby(["cw", "ws"], as_index=False)
            .size()
            .rename(columns={"size": "nu"})
        )
        out = cell_val.merge(users, on=["cw", "ws"])
        return out.astype("int64")

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["cw", "ws"])
        .aggregate(Sum("c", alias_name="value_c"),
                   Sum("nu", alias_name="n_users"))
        .to_pandas()  # O((span/7)^2)
    )
    out = out.rename(columns={"cw": "cohort_week", "ws": "weeks_since"})
    out = out[["cohort_week", "weeks_since", "n_users", "value_c"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(
        ["cohort_week", "weeks_since"]
    ).reset_index(drop=True)


COHORT_VALUE_MATRIX_SQL = """
WITH x AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS week,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
), cw AS (
  SELECT user_id, MIN(week) AS cohort_week FROM x GROUP BY user_id
)
SELECT cw.cohort_week, x.week - cw.cohort_week AS weeks_since,
       CAST(COUNT(DISTINCT x.user_id) AS BIGINT) AS n_users,
       CAST(SUM(x.c) AS BIGINT) AS value_c
FROM x JOIN cw ON x.user_id = cw.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


# -- two-sample log-rank test ------------------------------------------------------


def logrank_purchase(sf_dir: str) -> "pd.DataFrame":
    """Two-sample LOG-RANK test between even- and odd-user-id cohorts on
    days-until-first-purchase (the ``km_survival`` durations, censoring
    at last activity) — the survival-curve comparison an A/B readout
    needs before claiming one arm converts faster.  The observed-minus-
    expected mass accumulates as per-death-day floored micro terms
    oe_micro += floor(1e6*(d_At*n_t - d_t*n_At)/n_t) (negative-safe on
    both engines), leaving the chi-square normalization to the reader —
    the O-E sign + magnitude IS the direction readout.  ONE user-bucket
    co-location folds each user to (group, duration, observed); only the
    <= 2 x span x 2 count table reaches the driver.  Output: one row
    (n_a, n_b, events_a, events_b, oe_micro)."""
    import numpy as np

    from ray.data.aggregate import Sum

    nb = _user_buckets(sf_dir)
    ds = _read_events(sf_dir, ["ts", "user_id", "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, nb - 1), pa.int32()),
                "user_id": uid,
                "event_type": t["event_type"],
                "ts_us": _ts_us_i64(t["ts"]),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("user_id")["ts_us"].min()
        last = g.groupby("user_id")["ts_us"].max()
        fp = (
            g[g["event_type"] == "purchase"]
            .groupby("user_id")["ts_us"].min()
        )
        users = pd.DataFrame({"first": first, "last": last})
        users["fp"] = fp
        end = users["fp"].fillna(users["last"])
        d = ((end - users["first"]) // 86_400_000_000).astype(np.int64)
        observed = users["fp"].notna().astype(np.int64)
        grp = (users.index.to_numpy(np.int64) % 2).astype(np.int64)
        out = (
            pd.DataFrame({"g": grp, "d": d, "o": observed})
            .groupby(["g", "d", "o"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return out.astype("int64")

    tbl = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["g", "d", "o"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= 2 x span x 2 rows
    )
    days = sorted(tbl["d"].unique())
    n_tot = {0: int(tbl[tbl["g"] == 0]["n"].sum()),
             1: int(tbl[tbl["g"] == 1]["n"].sum())}
    ev = {0: int(tbl[(tbl["g"] == 0) & (tbl["o"] == 1)]["n"].sum()),
          1: int(tbl[(tbl["g"] == 1) & (tbl["o"] == 1)]["n"].sum())}
    removed = {0: 0, 1: 0}
    oe = 0
    for day in days:
        n_a = n_tot[0] - removed[0]
        n_b = n_tot[1] - removed[1]
        n_t = n_a + n_b
        sub = tbl[tbl["d"] == day]
        d_a = int(sub[(sub["g"] == 0) & (sub["o"] == 1)]["n"].sum())
        d_b = int(sub[(sub["g"] == 1) & (sub["o"] == 1)]["n"].sum())
        d_t = d_a + d_b
        if n_t > 0 and d_t > 0:
            num = 10**6 * (d_a * n_t - d_t * n_a)
            oe += num // n_t  # Python // floors
        removed[0] += int(sub[sub["g"] == 0]["n"].sum())
        removed[1] += int(sub[sub["g"] == 1]["n"].sum())
    out = pd.DataFrame(
        {
            "n_a": pd.Series([n_tot[0]], dtype="int64"),
            "n_b": pd.Series([n_tot[1]], dtype="int64"),
            "events_a": pd.Series([ev[0]], dtype="int64"),
            "events_b": pd.Series([ev[1]], dtype="int64"),
            "oe_micro": pd.Series([oe], dtype="int64"),
        }
    )
    return out


LOGRANK_PURCHASE_SQL = """
WITH per_user AS (
  SELECT user_id, user_id % 2 AS grp,
         MIN(epoch_us(ts)) AS first_tu,
         MAX(epoch_us(ts)) AS last_tu,
         MIN(CASE WHEN event_type = 'purchase'
                  THEN epoch_us(ts) END) AS fp_tu
  FROM events GROUP BY user_id
), dur AS (
  SELECT grp, (COALESCE(fp_tu, last_tu) - first_tu) // 86400000000 AS d,
         CASE WHEN fp_tu IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM per_user
), tb AS (
  SELECT d,
         SUM(CASE WHEN grp = 0 THEN observed ELSE 0 END) AS d_a,
         SUM(CASE WHEN grp = 1 THEN observed ELSE 0 END) AS d_b,
         SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS r_a,
         SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS r_b
  FROM dur GROUP BY d
), risk AS (
  SELECT d, d_a, d_b,
         (SELECT COUNT(*) FROM dur WHERE grp = 0)
           - COALESCE(SUM(r_a) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_a,
         (SELECT COUNT(*) FROM dur WHERE grp = 1)
           - COALESCE(SUM(r_b) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_b
  FROM tb
), terms AS (
  SELECT (1000000 * (d_a * (n_a + n_b) - (d_a + d_b) * n_a)) AS num,
         n_a + n_b AS den
  FROM risk WHERE d_a + d_b > 0 AND n_a + n_b > 0
)
SELECT
  CAST((SELECT COUNT(*) FROM dur WHERE grp = 0) AS BIGINT) AS n_a,
  CAST((SELECT COUNT(*) FROM dur WHERE grp = 1) AS BIGINT) AS n_b,
  CAST((SELECT SUM(observed) FROM dur WHERE grp = 0) AS BIGINT) AS events_a,
  CAST((SELECT SUM(observed) FROM dur WHERE grp = 1) AS BIGINT) AS events_b,
  CAST(COALESCE(SUM((num - ((num % den) + den) % den) // den), 0) AS BIGINT)
    AS oe_micro
FROM terms
"""
