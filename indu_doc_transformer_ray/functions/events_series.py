"""Daily-series / forecasting / statistics event operators: RFM quintiles, trend and drift tests, ACF/DFT/Haar, Kaplan-Meier, Markov chains, Holt smoothing, sequential patterns (chronologically the session-5..8 family).

Split out of functions/events.py (session 10); the public surface is
re-exported by ``functions.events`` — see that module's docstring for the
stream-semantics contract.  Shared plumbing lives in ``_evcommon``.
"""

from __future__ import annotations

import math

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


def _fold_carry_rows(df: "pd.DataFrame") -> tuple[int, int, int, int]:
    """Sweep-line carry fold over tb-sorted summary rows (total,
    max_prefix, n_at_max, first_t): returns the SAME summary one level up
    — (total, max_prefix, n_at_max, first_t) relative to the sequence
    start.  Associative by carry-independence (a prefix carry shifts every
    in-segment prefix equally), so superbucket folds compose exactly with
    the flat fold; shared by the distributed superbucket kernel and the
    driver's final O(sqrt(buckets)) chain."""
    import numpy as np

    totals = df["total"].to_numpy(np.int64)
    carry = np.concatenate(([0], totals.cumsum()[:-1]))
    bmax = carry + df["max_prefix"].to_numpy(np.int64)
    mx = int(bmax.max())
    hit = bmax == mx
    return (
        int(totals.sum()),
        mx,
        int(df["n_at_max"].to_numpy(np.int64)[hit].sum()),
        int(df["first_t"].to_numpy(np.int64)[hit].min()),
    )


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
    pass emits (total_delta, max_prefix, n_at_max, first_t) per bucket, a
    SECOND application of the same carry-independent fold collapses
    sqrt(B)-sized superbuckets distributedly, and the driver folds only
    the O(sqrt(buckets)) superbucket chain — no global sort, no second
    data pass, driver state sublinear in the bucket count (round-5
    verdict item #3).  Output: one row (peak, n_peak_times,
    first_peak_us); n_peak_times counts distinct delta timestamps at the
    peak (the function is piecewise constant)."""
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

    # second-level fold: the per-bucket summary rows are themselves a
    # sweep-line sequence (total/max_prefix/n_at_max/first_t is exactly
    # the shape _fold_carry_rows consumes), so sqrt(B) superbuckets fold
    # distributedly with the SAME kernel before the tiny driver fold
    sb_width = max(1, math.isqrt(B))

    def add_super(t: pa.Table) -> pa.Table:
        return t.append_column(
            "sb",
            pc.cast(
                pc.divide(pc.cast(t["tb"], pa.int64()), sb_width), pa.int32()
            ),
        )

    def fold_super(g: pd.DataFrame) -> pa.Table:
        f = _fold_carry_rows(g.sort_values("tb"))
        return pa.table(
            {
                "tb": pa.array([int(g["sb"].iloc[0])], pa.int32()),
                "total": pa.array([f[0]], pa.int64()),
                "max_prefix": pa.array([f[1]], pa.int64()),
                "n_at_max": pa.array([f[2]], pa.int64()),
                "first_t": pa.array([f[3]], pa.int64()),
            }
        )

    per_super = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(build_sessions, batch_format="pandas")
        .groupby("tb")
        .map_groups(per_time_bucket, batch_format="pandas")
        .map_batches(add_super, batch_format="pyarrow")
        .groupby("sb")
        .map_groups(fold_super, batch_format="pandas")
        .to_pandas()  # O(sqrt(buckets))
        .sort_values("tb")
    )
    peak, n_at, first_t = _fold_carry_rows(per_super)[1:]
    out = pd.DataFrame(
        {
            "peak": [peak],
            "n_peak_times": [n_at],
            "first_peak_us": [first_t],
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


