"""Behavioral analytics / attribution / evaluation event operators: Markov attribution, Shapley credit, burst segmentation, churn and funnel evaluation, log-rank, cohort LTV (chronologically the session-9/10 family).

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

