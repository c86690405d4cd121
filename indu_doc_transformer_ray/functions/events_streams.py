"""Stream/session-shaped event operators: as-of joins, sessionization, funnels, interval overlap, windows, incremental views, CUSUM, RFM-adjacent per-user scans (chronologically the round-2/3 family).

Split out of functions/events.py (session 10); the public surface is
re-exported by ``functions.events`` — see that module's docstring for the
stream-semantics contract.  Shared plumbing lives in ``_evcommon``.
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
    endpoint counts; a superbucket stage (sqrt(B) buckets each) folds the
    counts into per-bucket IN-SUPERBUCKET prefix offsets distributedly, the
    driver folds ONLY the O(sqrt(buckets)) superbucket totals, and the
    per-bucket offsets rejoin the probes by tb co-location (no O(B)
    broadcast, driver state sublinear in the bucket count — round-5
    verdict item #3).  Output: (user_id, sess_n, n_overlap)."""
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
    # -- two-level offset fold (counts -> per-bucket EXCLUSIVE prefixes) --
    # level 1 (distributed): each superbucket of sqrt(B) time buckets folds
    # its count rows into in-superbucket exclusive prefixes per tb (kind
    # 20/21 rows) plus one total row (kind 30); level 2 (driver): the
    # O(sqrt(B)) totals fold into superbucket carries.
    import math

    sb_width = max(1, math.isqrt(B))

    def add_super(t: pa.Table) -> pa.Table:
        return t.append_column(
            "sb",
            pc.cast(
                pc.divide(pc.cast(t["tb"], pa.int64()), sb_width), pa.int32()
            ),
        )

    def fold_super(g: pd.DataFrame) -> pa.Table:
        sb = int(g["sb"].iloc[0])
        piv = (
            g.pivot_table(index="tb", columns="kind", values="val",
                          aggfunc="sum", fill_value=0)
            .reindex(columns=[8, 9], fill_value=0)
            .sort_index()
        )
        tb = piv.index.to_numpy(np.int32)
        cs = piv[8].to_numpy(np.int64)
        ce = piv[9].to_numpy(np.int64)
        ex_s = np.concatenate(([0], cs.cumsum()[:-1]))
        ex_e = np.concatenate(([0], ce.cumsum()[:-1]))
        return pa.table(
            {
                "tb": pa.array(
                    np.concatenate([tb, tb, [sb]]).astype(np.int32)
                ),
                "kind": pa.array(
                    np.concatenate(
                        [np.full(len(tb), 20), np.full(len(tb), 21), [30]]
                    ).astype(np.int32)
                ),
                "val": pa.array(np.concatenate([ex_s, ex_e, [0]])),
                "val2": pa.array(
                    np.concatenate(
                        [np.zeros(2 * len(tb), np.int64),
                         [int(cs.sum()) * (1 << 32) + int(ce.sum())]]
                    )
                ),
                "sb": pa.array(np.full(2 * len(tb) + 1, sb, np.int32)),
            }
        )

    folded = (
        partials.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("kind"), 8)),
            batch_format="pyarrow",
        )
        .map_batches(add_super, batch_format="pyarrow")
        .groupby("sb")
        .map_groups(fold_super, batch_format="pandas")
        .materialize()  # O(buckets) rows, distributed
    )
    totals = (
        folded.map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), 30)),
            batch_format="pyarrow",
        ).to_pandas()  # O(sqrt(buckets)) rows only
    ).sort_values("sb")
    n_sb = B // sb_width + 1
    carry_s = np.zeros(n_sb + 1, np.int64)
    carry_e = np.zeros(n_sb + 1, np.int64)
    sbs = totals["sb"].to_numpy(np.int64)
    packed = totals["val2"].to_numpy(np.int64)
    carry_s[sbs + 1] = packed >> 32
    carry_e[sbs + 1] = packed & ((1 << 32) - 1)
    carry_s = np.cumsum(carry_s)
    carry_e = np.cumsum(carry_e)

    def add_carry(t: pa.Table) -> pa.Table:
        # per-tb offset rows gain their superbucket carry; the closure
        # ships only the O(sqrt(B)) carry arrays
        kind = t.column("kind").to_numpy()
        sb = t.column("sb").to_numpy()
        val = t.column("val").to_numpy()
        adj = np.where(kind == 20, val + carry_s[sb], val + carry_e[sb])
        return pa.table(
            {
                "user_id": pa.array(np.full(len(adj), -2, np.int64)),
                "sess_n": pa.array(np.zeros(len(adj), np.int64)),
                "tb": t.column("tb"),
                "kind": t.column("kind"),
                "val": pa.array(adj.astype(np.int64)),
            }
        )

    offsets = folded.map_batches(
        lambda t: t.filter(pc.less(t.column("kind"), 30)),
        batch_format="pyarrow",
    ).map_batches(add_carry, batch_format="pyarrow")

    def adjust_group(g: pd.DataFrame) -> pa.Table:
        # one time bucket: its two offset rows + its probe rows
        off_s = int(g.loc[g["kind"] == 20, "val"].iloc[0])
        off_e = int(g.loc[g["kind"] == 21, "val"].iloc[0])
        p = g[g["kind"] < 8]
        if len(p) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "sess_n": pa.array([], pa.int64()),
                    "val": pa.array([], pa.int64()),
                }
            )
        kind = p["kind"].to_numpy()
        val = p["val"].to_numpy(np.int64)
        adj = np.where(kind == 2, val + off_s, val - off_e)
        return pa.table(
            {
                "user_id": pa.array(p["user_id"].to_numpy(np.int64)),
                "sess_n": pa.array(p["sess_n"].to_numpy(np.int64)),
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

    probes = partials.map_batches(
        lambda t: t.filter(pc.less(t.column("kind"), 8)),
        batch_format="pyarrow",
    )
    return (
        probes.union(offsets)
        .groupby("tb")
        .map_groups(adjust_group, batch_format="pandas")
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


