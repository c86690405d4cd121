"""Star-schema / stream aggregates and clustering layout primitives
(simple grouped aggregates, region rollup, event-stream windows,
full-outer join, co-purchase, orders_wide, Z-order, item-item CF).

Split out of relational.py; see functions/_relcommon.py.  The public
surface is re-exported by ``functions.relational``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum  # noqa: F401

from . import _relcommon as _rc
from ._relcommon import (  # noqa: F401
    _cents,
    _dim_lookup,
    _dim_rows,
    _lookup_hits,
    _read,
)
from ._util import join_partitions  # noqa: F401


# -- simple global/grouped aggregates ---------------------------------------

def orders_per_status(sf_dir: str) -> Dataset:
    return (
        _read(sf_dir, "orders", ["o_orderstatus"])
        .groupby("o_orderstatus")
        .aggregate(Count(alias_name="n"))
    )


ORDERS_PER_STATUS_SQL = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderstatus
"""


def part_type_stats(sf_dir: str) -> Dataset:
    """Grouped min/max/count over part sizes (Min/Max aggregate coverage)."""
    ds = _read(sf_dir, "part", ["p_type", "p_size"])

    def widen(t: pa.Table) -> pa.Table:
        return pa.table(
            {"p_type": t["p_type"], "p_size": pc.cast(t["p_size"], pa.int64())}
        )

    return (
        ds.map_batches(widen, batch_format="pyarrow")
        .groupby("p_type")
        .aggregate(
            Min("p_size", alias_name="min_size"),
            Max("p_size", alias_name="max_size"),
            Count(alias_name="n"),
        )
    )


PART_TYPE_STATS_SQL = """
SELECT p_type, CAST(MIN(p_size) AS BIGINT) AS min_size,
       CAST(MAX(p_size) AS BIGINT) AS max_size,
       CAST(COUNT(*) AS BIGINT) AS n
FROM part GROUP BY p_type
"""


def distinct_suppliers_per_nation(sf_dir: str) -> "object":
    """Exact distinct-count via two-level groupby (dedup then count) — the
    scalable pattern for COUNT(DISTINCT) without a global set."""
    import pandas as pd

    ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    dedup = ds.groupby(["s_nationkey", "s_suppkey"]).aggregate(
        Count(alias_name="_c")
    )
    out = (
        dedup.groupby("s_nationkey")
        .aggregate(Count(alias_name="n_suppliers"))
        .to_pandas()
    )
    out["s_nationkey"] = out["s_nationkey"].astype("int32")
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    return out.sort_values("s_nationkey").reset_index(drop=True)


DISTINCT_SUPPLIERS_SQL = """
SELECT s_nationkey, CAST(COUNT(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers
FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
"""


# -- region rollup: q5 extended one dimension level --------------------------

def region_revenue(sf_dir: str) -> "object":
    """Revenue per REGION: the q5 join chain rolled up one more dimension
    level.  The two scaling joins (orders x customer, lineitem x orders)
    stay hash-partitioned ``Dataset.join``s; nation (25 rows) and region
    (5 rows) decorate the 25-row aggregate on the driver."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    o_nation = orders.join(
        cust, join_type="inner", num_partitions=join_partitions(),
        on=("o_custkey",), right_on=("c_custkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    ).select_columns(["o_orderkey", "c_nationkey"])

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _cents(t["l_extendedprice"]), pc.subtract(100, _cents(t["l_discount"]))
        )
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue_c4": rev})

    joined = li.map_batches(revenue, batch_format="pyarrow").join(
        o_nation, join_type="inner", num_partitions=join_partitions(),
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )
    agg = (
        joined.groupby("c_nationkey")
        .aggregate(Sum("revenue_c4", alias_name="revenue_c4"))
        .to_pandas()  # 25 rows
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    out = (
        agg.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .merge(region, left_on="n_regionkey", right_on="r_regionkey")
        .groupby("r_name", as_index=False)["revenue_c4"].sum()
        .sort_values("r_name")
        .reset_index(drop=True)
    )
    out["revenue_c4"] = out["revenue_c4"].astype("int64")
    return out


REGION_REVENUE_SQL = """
SELECT r_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


# -- windowed aggregate over the event stream -------------------------------

def events_hourly(sf_dir: str) -> Dataset:
    """Tumbling 1-hour window per event type: Ray Data has no event-time
    windows, so the window key is computed vectorized (epoch-us integer
    division) and the window IS a groupby key (ray_guide streaming-shaped
    pattern)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def windowed(t: pa.Table) -> pa.Table:
        hour = pc.divide(pc.cast(t["ts"], pa.int64()), 3_600_000_000)
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour_bucket": hour,
                "value_c4": _cents(t["value"], 10_000),
            }
        )

    return (
        ds.map_batches(windowed, batch_format="pyarrow")
        .groupby(["event_type", "hour_bucket"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_c4", alias_name="sum_value_c4"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT event_type,
       epoch_us(ts) // 3600000000 AS hour_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value*10000) AS BIGINT)) AS BIGINT) AS sum_value_c4
FROM events
GROUP BY event_type, hour_bucket
"""


def events_hopping(sf_dir: str) -> Dataset:
    """Hopping windows (1h length, 30min hop): every event lands in exactly
    two overlapping windows, emitted vectorized as two window-start columns
    concatenated per batch — window membership is computed map-side and the
    window IS a groupby key, like ``events_hourly`` (no event-time runtime
    needed)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    WIN = 3_600_000_000
    HOP = 1_800_000_000

    def windowed(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64())
        base = pc.multiply(pc.divide(ts, HOP), HOP)
        v = _cents(t["value"], 10_000)
        parts = []
        for off in (0, HOP):
            parts.append(
                pa.table(
                    {
                        "event_type": t["event_type"],
                        "window_start": pc.subtract(base, off),
                        "value_c4": v,
                    }
                )
            )
        return pa.concat_tables(parts)

    return (
        ds.map_batches(windowed, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_c4", alias_name="sum_value_c4"),
        )
    )


# each event belongs to windows starting at floor(t/hop)*hop and that minus
# one hop (window length = 2 hops, so membership needs no extra predicate)
EVENTS_HOPPING_SQL = """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS t,
         CAST(ROUND(value*10000) AS BIGINT) AS v
  FROM events
), w AS (
  SELECT event_type, v,
         (t // 1800000000) * 1800000000 - s.off AS window_start
  FROM e CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1800000000 AS BIGINT))) s(off)
)
SELECT event_type, window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(v) AS BIGINT) AS sum_value_c4
FROM w GROUP BY event_type, window_start
"""


def distinct_users_daily(sf_dir: str) -> Dataset:
    """Exact distinct users per (day, event_type) — the two-level
    COUNT(DISTINCT) pattern on a composite window key.  The dedup happens
    INSIDE a user-bucket kernel (a user's rows all land in one bucket, so
    in-bucket distinct IS global distinct) and only (day, type, partial
    count) rows reach the final fold — group counts stay bounded by
    days x types at any corpus size (a naive groupby on (day, type, user)
    is corpus-proportional in GROUPS, and this Ray build's aggregate cost
    scales with the group count — BASELINE session-5 finding)."""
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/events.parquet").num_rows)
    ds = _read(sf_dir, "events", ["ts", "event_type", "user_id"])

    def windowed(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000)
        uid = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, nb - 1), pa.int32()),
                "day_bucket": day,
                "event_type": t["event_type"],
                "user_id": uid,
            }
        )

    def bucket_distinct(g: pd.DataFrame) -> pa.Table:
        d = g[["day_bucket", "event_type", "user_id"]].drop_duplicates()
        c = d.groupby(["day_bucket", "event_type"]).size().reset_index(
            name="n"
        )
        return pa.table(
            {
                "day_bucket": pa.array(c["day_bucket"].to_numpy("int64")),
                "event_type": pa.array(
                    c["event_type"].astype(str).to_numpy(), pa.string()
                ),
                "n": pa.array(c["n"].to_numpy("int64")),
            }
        )

    return (
        ds.map_batches(windowed, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(bucket_distinct, batch_format="pandas")
        .groupby(["day_bucket", "event_type"])
        .aggregate(Sum("n", alias_name="n_users"))
    )


DISTINCT_USERS_DAILY_SQL = """
SELECT epoch_us(ts) // 86400000000 AS day_bucket, event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY day_bucket, event_type
"""


def user_event_counts(sf_dir: str) -> Dataset:
    """Per-user per-type event counts — partial-aggregate push-down PLUS a
    bucketed final fold: batches combine map-side, then the per-(user,
    type) sums happen inside a user-bucket kernel (bounded groups — a
    direct groupby on (user, type) is corpus-proportional in GROUPS, the
    BASELINE session-5 finding)."""
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/events.parquet").num_rows)
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        folded = pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, nb - 1), pa.int32()),
                "user_id": uid,
                "event_type": t["event_type"],
            }
        )
        agg = pa.TableGroupBy(
            folded, ["ub", "user_id", "event_type"]
        ).aggregate([([], "count_all")])
        return agg.rename_columns(["ub", "user_id", "event_type", "partial_n"])

    def bucket_fold(g: pd.DataFrame) -> pa.Table:
        c = g.groupby(["user_id", "event_type"], as_index=False)[
            "partial_n"
        ].sum()
        return pa.table(
            {
                "user_id": pa.array(c["user_id"].to_numpy("int64")),
                "event_type": pa.array(
                    c["event_type"].astype(str).to_numpy(), pa.string()
                ),
                "n": pa.array(c["partial_n"].to_numpy("int64")),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(bucket_fold, batch_format="pandas")
    )


USER_EVENT_COUNTS_SQL = """
SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY user_id, event_type
"""


# -- full-outer join (symmetric groupby form) -------------------------------

def daily_orders_events_outer(sf_dir: str) -> Dataset:
    """Per-day order count vs event count — FULL OUTER JOIN semantics
    (unmatched days survive from BOTH sides with zero-filled counts).
    Expressed as the symmetric-union groupby rather than a hash join: the
    events side has only ~30 distinct days, and `Dataset.join` crashes on
    hash partitions that receive zero rows (see the verify-skill gotcha);
    union + one groupby is the crash-safe co-location for outer joins with
    a potentially sparse side, and costs the same single exchange.  Both
    sides pre-aggregate per batch, so the exchange carries day-sized rows."""
    DAY_US = 86_400_000_000

    def od_part(t: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(t["o_orderdate"].cast(pa.timestamp("us")), pa.int64()),
            DAY_US,
        )
        g = pa.table({"day": day}).group_by(["day"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "day": g["day"],
                "n_orders": pc.cast(g["count_all"], pa.int64()),
                "n_events": pa.array([0] * g.num_rows, pa.int64()),
            }
        )

    def ev_part(t: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(t["ts"].cast(pa.timestamp("us")), pa.int64()), DAY_US
        )
        g = pa.table({"day": day}).group_by(["day"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "day": g["day"],
                "n_orders": pa.array([0] * g.num_rows, pa.int64()),
                "n_events": pc.cast(g["count_all"], pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderdate"]).map_batches(
        od_part, batch_format="pyarrow"
    )
    events = _read(sf_dir, "events", ["ts"]).map_batches(
        ev_part, batch_format="pyarrow"
    )
    return (
        orders.union(events)
        .groupby("day")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("n_events", alias_name="n_events"),
        )
        .sort("day")
    )


DAILY_OUTER_SQL = """
WITH od AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day, COUNT(*) AS n
  FROM orders GROUP BY 1
), ev AS (
  SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
  FROM events GROUP BY 1
)
SELECT COALESCE(od.day, ev.day) AS day,
       CAST(COALESCE(od.n, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(ev.n, 0) AS BIGINT) AS n_events
FROM od FULL JOIN ev ON od.day = ev.day
ORDER BY day
"""


# -- market-basket co-occurrence --------------------------------------------

def copurchase_type_pairs(sf_dir: str) -> "object":
    """Order-level part-type co-occurrence counts (market-basket pairs):
    in how many orders do two part types appear together?  lineitem ⋈ part
    attaches the type, then order rows co-locate by a derived orderkey
    bucket and ONE vectorized kernel per bucket dedups (order, type) and
    expands per-order pairs via a self-merge — per-order distinct types
    are bounded by the 6-value type domain, so the expansion is O(15) per
    order.  Per-batch pair partials pre-combine (≤15 pairs) before the
    final tiny groupby.  Output: (type_a, type_b, n_orders) — 15 rows."""
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    BUCKETS = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    joined = li.join(
        part,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_partkey",),
        right_on=("p_partkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )

    def bucketed(t: pa.Table) -> pa.Table:
        # map-side (order, type) dedup shrinks the exchange below one row
        # per lineitem
        sub = (
            t.select(["l_orderkey", "p_type"])
            .group_by(["l_orderkey", "p_type"])
            .aggregate([])
        )
        ok = pc.cast(sub["l_orderkey"], pa.int64())
        return pa.table(
            {
                "ob": pc.cast(pc.bit_wise_and(ok, BUCKETS - 1), pa.int32()),
                "l_orderkey": ok,
                "p_type": sub["p_type"],
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "p_type"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["p_type_x"] < m["p_type_y"]]
        agg = (
            m.groupby(["p_type_x", "p_type_y"], as_index=False)
            .size()
            .rename(columns={"p_type_x": "type_a", "p_type_y": "type_b",
                             "size": "n"})
        )
        agg["n"] = agg["n"].astype("int64")
        return agg

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(bucketed, batch_format="pyarrow")
        .groupby("ob")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n_orders"))
        .to_pandas()  # <= 15 rows
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


COPURCHASE_SQL = """
WITH ot AS (
  SELECT DISTINCT l_orderkey, p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT a.p_type AS type_a, b.p_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM ot a JOIN ot b
  ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
GROUP BY a.p_type, b.p_type
ORDER BY type_a, type_b
"""


# -- star-schema denormalization (wide-table build) ---------------------------

def orders_wide(sf_dir: str) -> Dataset:
    """Star-flattening denormalization: every order enriched with its
    customer's market segment and nation/region names — the wide-table
    build that feeds BI extracts and feature stores.  Map-side broadcast
    star join: the three dimension maps (customer->segment+nation,
    nation->name+region, region->name) ship ONCE via ``ray.put`` as sorted
    key arrays (under ``MAX_BROADCAST_DIM_ROWS``, their true shape — at
    real scale the customer dim flips to the co-location plan per the q7
    two-plans pattern); the fact table streams through one vectorized
    searchsorted pass per batch and never shuffles AT ALL.  Output:
    (o_orderkey, price_c2, c_mktsegment, n_name, r_name)."""
    import numpy as np

    ck, cv = _dim_lookup(
        sf_dir, "customer", "c_custkey", ["c_mktsegment", "c_nationkey"]
    )
    nk, nv = _dim_lookup(
        sf_dir, "nation", "n_nationkey", ["n_name", "n_regionkey"]
    )
    rk, rv = _dim_lookup(sf_dir, "region", "r_regionkey", ["r_name"])
    ref = ray.put((ck, cv, nk, nv, rk, rv))

    def widen(t: pa.Table) -> pa.Table:
        ck, cv, nk, nv, rk, rv = ray.get(ref)
        cust = pc.cast(t["o_custkey"], pa.int64()).to_numpy()
        ci = np.searchsorted(ck, cust)
        seg = cv["c_mktsegment"][ci]
        nat = cv["c_nationkey"][ci].astype(np.int64)
        ni = np.searchsorted(nk, nat)
        nname = nv["n_name"][ni]
        reg = nv["n_regionkey"][ni].astype(np.int64)
        ri = np.searchsorted(rk, reg)
        rname = rv["r_name"][ri]
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "price_c2": _cents(t["o_totalprice"]),
                "c_mktsegment": pa.array(seg.astype(str), pa.string()),
                "n_name": pa.array(nname.astype(str), pa.string()),
                "r_name": pa.array(rname.astype(str), pa.string()),
            }
        )

    return _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(widen, batch_format="pyarrow")


ORDERS_WIDE_SQL = """
SELECT o.o_orderkey,
       CAST(ROUND(o.o_totalprice*100) AS BIGINT) AS price_c2,
       c.c_mktsegment, n.n_name, r.r_name
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
"""


# -- Z-order clustering key (multi-column locality) ----------------------------

_Z_BITS = 16
_Z_BUCKET_SHIFT = 24  # zbucket = top 8 of the 32 interleaved bits


def _z_sql_interleave(col: str, shift: int) -> str:
    """Unrolled SQL bit-interleave: spreads ``col``'s low 16 bits to even
    positions, shifted left by ``shift`` (0 = even lanes, 1 = odd)."""
    terms = [
        f"((({col} >> {i}) & 1) << {2 * i + shift})" for i in range(_Z_BITS)
    ]
    return " + ".join(terms)


def _col_bounds(sf_dir: str, table: str, col: str) -> tuple[int, int]:
    """(min, max) of a numeric column from parquet ROW-GROUP STATISTICS —
    exact for numeric columns, metadata-only at any corpus size."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(f"{sf_dir}/{table}.parquet")
    lo = hi = None
    for r in range(md.num_row_groups):
        rg = md.row_group(r)
        for c in range(rg.num_columns):
            cc = rg.column(c)
            if cc.path_in_schema == col and cc.statistics is not None:
                s = cc.statistics
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
    if lo is None:  # pragma: no cover - stats always present on our data
        raise ValueError(f"no statistics for {table}.{col}")
    return lo, hi


def zorder_parts(sf_dir: str) -> Dataset:
    """Z-order (Morton) clustering key over (p_size, price) — the
    multi-column data-layout primitive behind Delta/Iceberg Z-ORDER: rows
    close in BOTH dimensions get close keys, so range predicates on either
    column prune contiguous key ranges (``sources.io.write_clustered`` is
    the matching sink).  Each dimension min-max-normalizes to 16 bits
    first — bounds come from parquet row-group statistics (metadata-only,
    exact for numerics), mirrored by the oracle's MIN/MAX — otherwise a
    narrow dimension collapses the whole key into one bucket.  Pure
    streaming map (numpy bit interleave, no exchange); ``zbucket`` (top 8
    bits) is the write partition.  Output: (p_partkey, p_size, price_c2,
    zval, zbucket)."""
    import numpy as np

    s_lo, s_hi = _col_bounds(sf_dir, "part", "p_size")
    p_lo_f, p_hi_f = _col_bounds(sf_dir, "part", "p_retailprice")
    p_lo = int(round(p_lo_f * 100))
    p_hi = int(round(p_hi_f * 100))
    s_span = max(1, int(s_hi) - int(s_lo))
    p_span = max(1, p_hi - p_lo)
    M = (1 << _Z_BITS) - 1

    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def zmap(t: pa.Table) -> pa.Table:
        size = pc.cast(t["p_size"], pa.int64()).to_numpy()
        price = pc.cast(
            pc.round(pc.multiply(t["p_retailprice"], 100.0)), pa.int64()
        ).to_numpy()
        a = ((size - int(s_lo)) * M // s_span).astype(np.uint64)
        b = ((price - p_lo) * M // p_span).astype(np.uint64)
        z = np.zeros(len(a), dtype=np.uint64)
        for i in range(_Z_BITS):
            z |= ((a >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i)
            z |= ((b >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i + 1)
        zv = z.astype(np.int64)
        return pa.table(
            {
                "p_partkey": pc.cast(t["p_partkey"], pa.int64()),
                "p_size": pa.array(size, pa.int64()),
                "price_c2": pa.array(price, pa.int64()),
                "zval": pa.array(zv, pa.int64()),
                "zbucket": pa.array(zv >> _Z_BUCKET_SHIFT, pa.int64()),
            }
        )

    return ds.map_batches(zmap, batch_format="pyarrow")


ZORDER_PARTS_SQL = f"""
WITH bounds AS (
  SELECT CAST(MIN(p_size) AS BIGINT) AS s_lo,
         GREATEST(CAST(MAX(p_size) AS BIGINT)
                  - CAST(MIN(p_size) AS BIGINT), 1) AS s_span,
         CAST(ROUND(MIN(p_retailprice)*100) AS BIGINT) AS p_lo,
         GREATEST(CAST(ROUND(MAX(p_retailprice)*100) AS BIGINT)
                  - CAST(ROUND(MIN(p_retailprice)*100) AS BIGINT), 1)
           AS p_span
  FROM part
), x AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
         CAST(ROUND(p_retailprice*100) AS BIGINT) AS price_c2,
         (CAST(p_size AS BIGINT) - s_lo) * {(1 << _Z_BITS) - 1} // s_span
           AS a,
         (CAST(ROUND(p_retailprice*100) AS BIGINT) - p_lo)
           * {(1 << _Z_BITS) - 1} // p_span AS b
  FROM part, bounds
)
SELECT p_partkey, p_size, price_c2,
       CAST({_z_sql_interleave('a', 0)} + {_z_sql_interleave('b', 1)}
            AS BIGINT) AS zval,
       CAST(({_z_sql_interleave('a', 0)} + {_z_sql_interleave('b', 1)})
            >> {_Z_BUCKET_SHIFT} AS BIGINT) AS zbucket
FROM x
"""


# -- item-item collaborative filtering -----------------------------------------

ITEM_SIM_TOPK = 5
_ITEM_SIM_SCALE = 1_000_000


def item_similarity_topk(sf_dir: str) -> Dataset:
    """Item-item collaborative filtering (the classic Amazon-style
    recommender build): for every part, the 5 most-similar parts by
    co-purchase cosine ``cooc / sqrt(n_a * n_b)`` over order baskets.
    Ranking stays integer-exact via the scaled square
    ``cooc^2 * 1e6 // (n_a * n_b)`` (monotone in the cosine up to the
    stated quantization, mirrored verbatim in the oracle).  Fully
    broadcast-free — item counts could be corpus-proportional, so they
    ATTACH via co-locations instead — and it never runs a high-cardinality
    ``Dataset.groupby`` (this Ray version's aggregate cost scales with the
    GROUP count: a measured ~20 s for 276k groups at any row count; every
    per-pair sum here happens vectorized INSIDE a coarse-bucket kernel):
    (1) order-bucket kernel dedups baskets, emits directed pair partials
    plus per-item basket-count partials in one schema (dst = -1 marks
    count rows); (2) a src-bucket co-location sums each (src, dst) —
    complete there by construction — and attaches n_src, passing count
    rows through; (3) a dst-bucket co-location attaches n_dst and scores;
    (4) a final src-bucket top-k prunes to 5.  Four bounded exchanges, no
    corpus-sized driver state.  Output: (p_partkey, rec_partkey, cooc,
    score_mu)."""
    import numpy as np
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    OB = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)
    PB = n_buckets(pq.read_metadata(f"{sf_dir}/part.parquet").num_rows)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def keyed(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["l_orderkey"], pa.int64())
        return pa.table(
            {
                "ob": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "o": ok,
                "p": pc.cast(t["l_partkey"], pa.int64()),
            }
        )

    def basket_pairs(g: pd.DataFrame) -> pa.Table:
        g = g[["o", "p"]].drop_duplicates()
        m = g.merge(g, on="o")
        m = m[m["p_x"] != m["p_y"]]
        pairs = m.groupby(["p_x", "p_y"]).size().reset_index(name="c")
        items = g.groupby("p").size().reset_index(name="c")
        src = np.concatenate(
            [pairs["p_x"].to_numpy(np.int64), items["p"].to_numpy(np.int64)]
        )
        dst = np.concatenate(
            [pairs["p_y"].to_numpy(np.int64),
             np.full(len(items), -1, np.int64)]
        )
        c = np.concatenate(
            [pairs["c"].to_numpy(np.int64), items["c"].to_numpy(np.int64)]
        )
        return pa.table(
            {
                # next co-location: by the src item (count rows carry the
                # item in src, so one key column serves both row kinds)
                "kb": pa.array((src & (PB - 1)).astype(np.int32)),
                "src": pa.array(src),
                "dst": pa.array(dst),
                "c": pa.array(c),
            }
        )

    def attach_src(g: pd.DataFrame) -> pa.Table:
        # every partial for a given (src, dst) — and every count partial
        # for a given item — is in THIS bucket, so local sums are global
        g = g.groupby(["src", "dst"], as_index=False)["c"].sum()
        n_src = g[g["dst"] == -1].set_index("src")["c"]
        p = g[g["dst"] != -1]
        src = p["src"].to_numpy("int64")
        dst = p["dst"].to_numpy("int64")
        rows_src = np.concatenate([src, n_src.index.to_numpy("int64")])
        rows_dst = np.concatenate(
            [dst, np.full(len(n_src), -1, np.int64)]
        )
        rows_c = np.concatenate(
            [p["c"].to_numpy("int64"), n_src.to_numpy("int64")]
        )
        rows_ns = np.concatenate(
            [p["src"].map(n_src).to_numpy("int64"),
             np.zeros(len(n_src), np.int64)]
        )
        # rekey: pairs by dst bucket, count rows by their item's bucket
        key_item = np.where(rows_dst == -1, rows_src, rows_dst)
        return pa.table(
            {
                "kb": pa.array((key_item & (PB - 1)).astype(np.int32)),
                "src": pa.array(rows_src),
                "dst": pa.array(rows_dst),
                "c": pa.array(rows_c),
                "n_src": pa.array(rows_ns),
            }
        )

    def attach_dst(g: pd.DataFrame) -> pa.Table:
        n_dst = g[g["dst"] == -1].set_index("src")["c"]
        p = g[g["dst"] != -1]
        cc = p["c"].to_numpy("int64")
        ns = p["n_src"].to_numpy("int64")
        nd = p["dst"].map(n_dst).to_numpy("int64")
        score = cc * cc * _ITEM_SIM_SCALE // (ns * nd)
        src = p["src"].to_numpy("int64")
        return pa.table(
            {
                "kb": pa.array((src & (PB - 1)).astype(np.int32)),
                "src": pa.array(src),
                "dst": pa.array(p["dst"].to_numpy("int64")),
                "c": pa.array(cc),
                "score_mu": pa.array(score.astype("int64")),
            }
        )

    def topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["src", "score_mu", "dst"],
                          ascending=[True, False, True])
        top = g.groupby("src", sort=True).head(ITEM_SIM_TOPK)
        return pa.table(
            {
                "p_partkey": pa.array(top["src"].to_numpy("int64")),
                "rec_partkey": pa.array(top["dst"].to_numpy("int64")),
                "cooc": pa.array(top["c"].to_numpy("int64")),
                "score_mu": pa.array(top["score_mu"].to_numpy("int64")),
            }
        )

    return (
        li.map_batches(keyed, batch_format="pyarrow")
        .groupby("ob")
        .map_groups(basket_pairs, batch_format="pandas")
        .groupby("kb")
        .map_groups(attach_src, batch_format="pandas")
        .groupby("kb")
        .map_groups(attach_dst, batch_format="pandas")
        .groupby("kb")
        .map_groups(topk, batch_format="pandas")
        .sort(["p_partkey", "score_mu", "rec_partkey"],
              descending=[False, True, False])
    )


ITEM_SIMILARITY_TOPK_SQL = f"""
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n AS (SELECT p, COUNT(*) AS n FROM b GROUP BY p),
pairs AS (
  SELECT a.p AS src, c.p AS dst, COUNT(*) AS cooc
  FROM b a JOIN b c ON a.o = c.o AND a.p != c.p
  GROUP BY 1, 2
), scored AS (
  SELECT pairs.src, pairs.dst, pairs.cooc,
         pairs.cooc * pairs.cooc * {_ITEM_SIM_SCALE} // (ns.n * nd.n)
           AS score_mu
  FROM pairs
  JOIN n ns ON ns.p = pairs.src
  JOIN n nd ON nd.p = pairs.dst
)
SELECT src AS p_partkey, dst AS rec_partkey,
       CAST(cooc AS BIGINT) AS cooc, CAST(score_mu AS BIGINT) AS score_mu
FROM (SELECT *, row_number() OVER (
        PARTITION BY src ORDER BY score_mu DESC, dst) AS rn
      FROM scored)
WHERE rn <= {ITEM_SIM_TOPK}
ORDER BY p_partkey, score_mu DESC, rec_partkey
"""




# -- CDC upsert/delete materialization (the lakehouse MERGE shape) -----------

def cdc_upsert_snapshot(sf_dir: str) -> Dataset:
    """Materialize a current snapshot from a base table + a changelog of
    upserts and deletes — the Delta-Lake/Iceberg MERGE INTO shape.  The
    changelog is derived deterministically from orders so the op is
    self-contained: version 0 = every base row, version 1 = an upsert
    doubling o_totalprice for o_orderkey % 7 == 0, version 2 = a delete
    for o_orderkey % 11 == 0.  Semantics: per key, the highest version
    wins; a winning delete drops the key.

    Scale shape: base and changelog are UNIONED as one stream tagged
    (version, op) and resolved in ONE key-bucket co-location — per-key
    latest is computed vectorized inside ``groupby(kb).map_groups``
    (sort + tail(1) per key in-kernel, never a key-proportional Dataset
    groupby), so the exchange volume is base + changelog rows and driver
    state is zero.  A real changelog source would replace the two derived
    map_batches; the resolve stage is unchanged."""
    import numpy as np
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)
    base = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def tag(version: int):
        def fn(t: pa.Table) -> pa.Table:
            k = t.column("o_orderkey")
            price = t.column("o_totalprice")
            if version == 0:
                keep = np.ones(len(t), dtype=bool)
                pr = price.to_numpy(zero_copy_only=False)
                op = "i"
            elif version == 1:
                keep = k.to_numpy(zero_copy_only=False) % 7 == 0
                pr = price.to_numpy(zero_copy_only=False) * 2.0
                op = "u"
            else:
                keep = k.to_numpy(zero_copy_only=False) % 11 == 0
                pr = np.zeros(len(t), dtype=np.float64)
                op = "d"
            kk = k.to_numpy(zero_copy_only=False)[keep]
            return pa.table(
                {
                    "kb": pa.array((kk % nb).astype(np.int32)),
                    "k": pa.array(kk.astype(np.int64)),
                    "price": pa.array(np.asarray(pr)[keep].astype(np.float64)),
                    "version": pa.array(
                        np.full(keep.sum(), version, dtype=np.int64)
                    ),
                    "op": pa.array([op] * int(keep.sum()), pa.string()),
                }
            )

        return fn

    stream = (
        base.map_batches(tag(0), batch_format="pyarrow")
        .union(base.map_batches(tag(1), batch_format="pyarrow"))
        .union(base.map_batches(tag(2), batch_format="pyarrow"))
    )

    def resolve(g: pd.DataFrame) -> pa.Table:
        latest = (
            g.sort_values(["k", "version"]).groupby("k", as_index=False)
            .tail(1)
        )
        live = latest[latest["op"] != "d"]
        return pa.table(
            {
                "o_orderkey": pa.array(live["k"].to_numpy("int64")),
                "price": pa.array(live["price"].to_numpy("float64")),
                "version": pa.array(live["version"].to_numpy("int64")),
            }
        )

    return stream.groupby("kb").map_groups(resolve, batch_format="pandas")


CDC_UPSERT_SQL = """
WITH all_rows AS (
  SELECT o_orderkey AS k, o_totalprice AS price, 0 AS version, 'i' AS op
  FROM orders
  UNION ALL
  SELECT o_orderkey, o_totalprice * 2, 1, 'u' FROM orders
  WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, 0.0, 2, 'd' FROM orders WHERE o_orderkey % 11 = 0
),
latest AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY version DESC) AS rn
  FROM all_rows
)
SELECT k AS o_orderkey, price, CAST(version AS BIGINT) AS version
FROM latest WHERE rn = 1 AND op <> 'd'
ORDER BY o_orderkey
"""


# -- directional association rules (support / confidence / lift) --------------

#: Minimum co-occurrence count for an emitted rule; keeps the rule table
#: non-degenerate at tiny scale and bounds nothing at large scale (the
#: pair domain itself is |brands|^2-bounded).
ASSOC_MIN_SUP = 2


def assoc_rules(sf_dir: str) -> "object":
    """Directional market-basket association rules over order baskets at
    the part-BRAND granularity (Agrawal-Srikant support/confidence/lift,
    the classic retail co-purchase miner): for every ordered brand pair
    (ante -> cons) seen in >= ``ASSOC_MIN_SUP`` common baskets, the exact
    counts and the fixed-point confidence / lift.

    Shape for 100 TB: lineitem |><| part attaches the brand (hash join;
    part is the small side but corpus-proportional in principle, so the
    shuffle-join plan is used), then ONE orderkey-bucket co-location makes
    every basket bucket-local; the in-bucket kernel dedups (order, brand)
    and expands pairs via a vectorized self-merge — per-basket distinct
    brands are bounded by the brand domain, so the expansion is O(|B|^2)
    per order worst-case and ~1-7 in practice.  Pair counts, per-brand
    basket counts and the basket total are all bucket-local partials off
    that one exchange; the final groupby folds a <= |B|^2 + |B| + 1 row
    tall table.  Confidence/lift are emitted as exact ppm floors
    (conf_ppm = 1e6*n_ab // n_a, lift_ppm = 1e6*n_ab*N // (n_a*n_b)) so
    the DuckDB oracle hash-matches.  Output: (ante, cons, n_ab, n_ante,
    n_cons, n_baskets, conf_ppm, lift_ppm) sorted by (ante, cons).
    Beyond-reference engine addition (SURVEY.md §2.6)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ._util import n_buckets

    BUCKETS = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    if _dim_rows(sf_dir, "part") <= _rc.MAX_BROADCAST_DIM_ROWS:
        # map-side broadcast attach: the brand map ships once; the fact
        # stream never passes through a join operator (orders_wide pattern)
        import numpy as np

        pk, pv = _dim_lookup(sf_dir, "part", "p_partkey", ["p_brand"])
        ref = ray.put((pk, pv["p_brand"]))

        def attach(t: pa.Table) -> pa.Table:
            pk_, brand_ = ray.get(ref)
            part_ids = pc.cast(t["l_partkey"], pa.int64()).to_numpy()
            return pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "p_brand": pa.array(
                        brand_[np.searchsorted(pk_, part_ids)], pa.string()
                    ),
                }
            )

        joined = li.map_batches(attach, batch_format="pyarrow")
    else:  # the co-location plan: same answer, one more exchange
        part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
        joined = li.join(
            part,
            join_type="inner",
            num_partitions=join_partitions(),
            on=("l_partkey",),
            right_on=("p_partkey",),
            aggregator_ray_remote_args={"num_cpus": 0},
        )

    def bucketed(t: pa.Table) -> pa.Table:
        # map-side (order, brand) dedup shrinks the exchange below one row
        # per lineitem
        sub = (
            t.select(["l_orderkey", "p_brand"])
            .group_by(["l_orderkey", "p_brand"])
            .aggregate([])
        )
        ok = pc.cast(sub["l_orderkey"], pa.int64())
        return pa.table(
            {
                "ob": pc.cast(pc.bit_wise_and(ok, BUCKETS - 1), pa.int32()),
                "l_orderkey": ok,
                "p_brand": sub["p_brand"],
            }
        )

    def partials(g: pd.DataFrame) -> pd.DataFrame:
        # baskets are complete within a bucket (bucket key derives from the
        # orderkey), so pair counts, brand marginals and the basket total
        # are all exact bucket-local partials: one tall (a, b, n) frame
        # where b='' marks a brand marginal and a='' b='' the basket count.
        g = g.drop_duplicates(["l_orderkey", "p_brand"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["p_brand_x"] < m["p_brand_y"]]
        pair = (
            m.groupby(["p_brand_x", "p_brand_y"], as_index=False).size()
            .rename(columns={"p_brand_x": "a", "p_brand_y": "b"})
        )
        marg = (
            g.groupby("p_brand", as_index=False).size()
            .rename(columns={"p_brand": "a"})
        )
        marg["b"] = ""
        total = pd.DataFrame(
            {"a": [""], "b": [""], "size": [g["l_orderkey"].nunique()]}
        )
        out = pd.concat(
            [pair[["a", "b", "size"]], marg[["a", "b", "size"]], total],
            ignore_index=True,
        ).rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    folded = (
        joined.map_batches(bucketed, batch_format="pyarrow")
        .groupby("ob")
        .map_groups(partials, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= |brands|^2 + |brands| + 1 rows
    )
    n_baskets = int(folded.loc[(folded["a"] == "") & (folded["b"] == ""), "n"].iloc[0])
    marg = {
        r.a: int(r.n)
        for r in folded[(folded["b"] == "") & (folded["a"] != "")].itertuples()
    }
    rows = []
    pairs = folded[(folded["a"] != "") & (folded["b"] != "")]
    for r in pairs.itertuples():
        n_ab = int(r.n)
        if n_ab < ASSOC_MIN_SUP:
            continue
        for ante, cons in ((r.a, r.b), (r.b, r.a)):
            n_a, n_b = marg[ante], marg[cons]
            rows.append(
                {
                    "ante": ante, "cons": cons, "n_ab": n_ab,
                    "n_ante": n_a, "n_cons": n_b, "n_baskets": n_baskets,
                    "conf_ppm": 10**6 * n_ab // n_a,
                    "lift_ppm": 10**6 * n_ab * n_baskets // (n_a * n_b),
                }
            )
    out = pd.DataFrame(
        sorted(rows, key=lambda r: (r["ante"], r["cons"]))
    ).reset_index(drop=True)
    return out.astype(
        {c: "int64" for c in
         ("n_ab", "n_ante", "n_cons", "n_baskets", "conf_ppm", "lift_ppm")}
    )


ASSOC_RULES_SQL = """
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
total AS (SELECT COUNT(DISTINCT l_orderkey) AS nb FROM ob),
marg AS (SELECT p_brand, COUNT(*) AS n FROM ob GROUP BY 1),
pair AS (
  SELECT a.p_brand AS x, b.p_brand AS y, COUNT(*) AS n_ab
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
   AND a.p_brand < b.p_brand
  GROUP BY 1, 2
),
dir AS (
  SELECT x AS ante, y AS cons, n_ab FROM pair WHERE n_ab >= 2
  UNION ALL
  SELECT y, x, n_ab FROM pair WHERE n_ab >= 2
)
SELECT d.ante, d.cons,
       CAST(d.n_ab AS BIGINT) AS n_ab,
       CAST(ma.n AS BIGINT) AS n_ante,
       CAST(mc.n AS BIGINT) AS n_cons,
       CAST(total.nb AS BIGINT) AS n_baskets,
       CAST(1000000 * d.n_ab // ma.n AS BIGINT) AS conf_ppm,
       CAST(CAST(1000000 AS HUGEINT) * d.n_ab * total.nb
            // (CAST(ma.n AS HUGEINT) * mc.n) AS BIGINT) AS lift_ppm
FROM dir d
JOIN marg ma ON ma.p_brand = d.ante
JOIN marg mc ON mc.p_brand = d.cons
CROSS JOIN total
ORDER BY ante, cons
"""


# -- Apriori frequent triples ----------------------------------------------------

APRIORI3_MIN_SUP = 5


def apriori_triples(sf_dir: str) -> "object":
    """Frequent 3-itemsets over order baskets at brand granularity — the
    Apriori candidate-growth step past ``assoc_rules``' pairs (Agrawal &
    Srikant, VLDB 1994).  Same physical plan: brand attach (broadcast
    under the guard, shuffle join above), ONE orderkey-bucket co-location
    making every basket bucket-local, and an in-kernel vectorized 3-way
    self-merge whose expansion is bounded by C(|brand domain|, 3) per
    basket worst-case (~1-7 distinct brands in practice).  Triple counts
    fold through a <=|B|^3-bounded groupby; the support filter runs on
    the driver over that bounded table.  Output: (a, b, c, n_abc,
    supp_ppm) for triples with support >= APRIORI3_MIN_SUP baskets."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ._util import n_buckets

    BUCKETS = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    if _dim_rows(sf_dir, "part") <= _rc.MAX_BROADCAST_DIM_ROWS:
        import numpy as np

        pk, pv = _dim_lookup(sf_dir, "part", "p_partkey", ["p_brand"])
        ref = ray.put((pk, pv["p_brand"]))

        def attach(t: pa.Table) -> pa.Table:
            pk_, brand_ = ray.get(ref)
            part_ids = pc.cast(t["l_partkey"], pa.int64()).to_numpy()
            return pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "p_brand": pa.array(
                        brand_[np.searchsorted(pk_, part_ids)], pa.string()
                    ),
                }
            )

        joined = li.map_batches(attach, batch_format="pyarrow")
    else:
        part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
        joined = li.join(
            part,
            join_type="inner",
            num_partitions=join_partitions(),
            on=("l_partkey",),
            right_on=("p_partkey",),
            aggregator_ray_remote_args={"num_cpus": 0},
        )

    def bucketed(t: pa.Table) -> pa.Table:
        sub = (
            t.select(["l_orderkey", "p_brand"])
            .group_by(["l_orderkey", "p_brand"])
            .aggregate([])
        )
        ok = pc.cast(sub["l_orderkey"], pa.int64())
        return pa.table(
            {
                "ob": pc.cast(pc.bit_wise_and(ok, BUCKETS - 1), pa.int32()),
                "l_orderkey": ok,
                "p_brand": sub["p_brand"],
            }
        )

    def partials(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = g.drop_duplicates(["l_orderkey", "p_brand"])
        # bucket-local integer codes: the 3-way merge and the triple
        # groupby run on int16s, not strings (ordinal order == lexical
        # order because categories are sorted) — measured ~2x kernel cut
        cats = g["p_brand"].astype("category")
        names = cats.cat.categories.to_numpy()
        enc = pd.DataFrame(
            {
                "l_orderkey": g["l_orderkey"].to_numpy(),
                "bc": cats.cat.codes.to_numpy(np.int16),
            }
        )
        m = enc.merge(enc, on="l_orderkey")
        m = m[m["bc_x"] < m["bc_y"]]
        t3 = m.merge(enc, on="l_orderkey")
        t3 = t3[t3["bc_y"] < t3["bc"]]
        tri = t3.groupby(["bc_x", "bc_y", "bc"], as_index=False).size()
        total = pd.DataFrame(
            {"a": [""], "b": [""], "c": [""],
             "n": [g["l_orderkey"].nunique()]}
        )
        out = pd.concat(
            [
                pd.DataFrame(
                    {
                        "a": names[tri["bc_x"].to_numpy()],
                        "b": names[tri["bc_y"].to_numpy()],
                        "c": names[tri["bc"].to_numpy()],
                        "n": tri["size"].to_numpy(np.int64),
                    }
                ),
                total,
            ],
            ignore_index=True,
        )
        out["n"] = out["n"].astype("int64")
        return out

    folded = (
        joined.map_batches(bucketed, batch_format="pyarrow")
        .groupby("ob")
        .map_groups(partials, batch_format="pandas")
        .groupby(["a", "b", "c"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= |brands|^3 + 1 rows
    )
    n_baskets = int(
        folded.loc[(folded["a"] == "") & (folded["b"] == ""), "n"].iloc[0]
    )
    tri = folded[(folded["a"] != "") & (folded["n"] >= APRIORI3_MIN_SUP)]
    out = tri.sort_values(["a", "b", "c"]).reset_index(drop=True)
    return pd.DataFrame(
        {
            "a": out["a"],
            "b": out["b"],
            "c": out["c"],
            "n_abc": out["n"].astype("int64"),
            "supp_ppm": (
                out["n"].astype("int64") * 10 ** 6 // n_baskets
            ).astype("int64"),
        }
    )


APRIORI_TRIPLES_SQL = f"""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM ob),
tri AS (
  SELECT a.p_brand AS a, b.p_brand AS b, c.p_brand AS c,
         CAST(COUNT(*) AS BIGINT) AS n_abc
  FROM ob a
  JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  JOIN ob c ON a.l_orderkey = c.l_orderkey AND b.p_brand < c.p_brand
  GROUP BY 1, 2, 3
)
SELECT a, b, c, n_abc,
       CAST(n_abc * 1000000 // tot.n AS BIGINT) AS supp_ppm
FROM tri CROSS JOIN tot
WHERE n_abc >= {APRIORI3_MIN_SUP}
ORDER BY a, b, c
"""


# -- ABC / Pareto revenue classification -------------------------------------------

ABC_CUTS = (80, 95)  # cumulative-revenue percent boundaries (A | B | C)


def abc_parts(sf_dir: str) -> "object":
    """ABC (Pareto) inventory classification of parts by lineitem revenue:
    class A carries the first 80% of cumulative revenue in (revenue DESC,
    partkey ASC) order, B the next 15%, C the tail — the classic 80/20
    stocking policy cube.  The crossing part belongs to the richer class
    (cum_prior < threshold), making ties deterministic.

    Zero row movement past the folds: ONE partkey-bucket co-location
    builds per-part revenue; a coarse revenue-histogram fold (count + rev
    sums per 4096-wide bucket) gives descending bucket offsets, buckets
    fully inside a class classify WHOLESALE from the histogram, and the
    <=2 straddling buckets resolve from a fine per-value fold — equal-
    revenue runs split by pure arithmetic (j-th part's prior = group
    start + (j-1)*rev), so no row ever leaves its fold.  Output:
    (cls, n_parts, revenue_c2)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ._util import n_buckets
    from .sketches import _floor_bucket

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64()
        )
        g = pa.TableGroupBy(
            pa.table(
                {
                    "p": pc.cast(t["l_partkey"], pa.int64()),
                    "rev": cents,
                }
            ),
            "p",
        ).aggregate([("rev", "sum")])
        g = g.rename_columns(["p", "rev"])
        pb = pc.cast(
            pc.bit_wise_and(pc.cast(g["p"], pa.int64()), nb - 1), pa.int32()
        )
        return g.append_column("pb", pb)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("p", as_index=False)["rev"].sum()
        return agg.astype("int64")

    pr = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(fold, batch_format="pandas")
        .materialize()  # part-proportional; scanned twice below
    )

    def hist(t: pd.DataFrame) -> pa.Table:
        import numpy as np

        v = pa.array(t["rev"].to_numpy(np.int64), pa.int64())
        folded = pa.table({"b": _floor_bucket(v), "rev": v})
        return pa.TableGroupBy(folded, "b").aggregate(
            [([], "count_all"), ("rev", "sum")]
        )

    counts = (
        pr.map_batches(hist, batch_format="pandas")
        .groupby("b")
        .aggregate(
            Sum("count_all", alias_name="n"), Sum("rev_sum", alias_name="r")
        )
        .to_pandas()
        .sort_values("b", ascending=False)  # revenue DESC order
        .reset_index(drop=True)
    )
    T = int(counts["r"].sum())
    cuts = [(q * T) // 100 for q in ABC_CUTS]
    prior_r = counts["r"].cumsum().shift(1).fillna(0).astype("int64")
    after_r = counts["r"].cumsum().astype("int64")

    # wholesale classification for non-straddling buckets
    totals = {"A": [0, 0], "B": [0, 0], "C": [0, 0]}

    def _cls(prior: int) -> str:
        if prior < cuts[0]:
            return "A"
        if prior < cuts[1]:
            return "B"
        return "C"

    straddling = []
    for i in range(len(counts)):
        lo, hi = int(prior_r.iloc[i]), int(after_r.iloc[i])
        if any(lo < c < hi for c in cuts):
            straddling.append((int(counts.loc[i, "b"]), lo))
        else:
            c = _cls(lo)
            totals[c][0] += int(counts.loc[i, "n"])
            totals[c][1] += int(counts.loc[i, "r"])

    if straddling:
        wanted = pa.array(sorted(b for b, _ in straddling), pa.int64())

        def in_bucket(t: pd.DataFrame) -> pa.Table:
            import numpy as np

            v = pa.array(t["rev"].to_numpy(np.int64), pa.int64())
            b = _floor_bucket(v)
            sub = pa.table({"b": b, "rev": v}).filter(
                pc.is_in(b, value_set=wanted)
            )
            return pa.TableGroupBy(sub, ["b", "rev"]).aggregate(
                [([], "count_all")]
            )

        fine = (
            pr.map_batches(in_bucket, batch_format="pandas")
            .groupby(["b", "rev"])
            .aggregate(Sum("count_all", alias_name="n"))
            .to_pandas()
        )
        for b, lo in straddling:
            g = fine[fine["b"] == b].sort_values(
                "rev", ascending=False
            ).reset_index(drop=True)
            prior = lo
            for rev, m in zip(g["rev"].astype(int), g["n"].astype(int)):
                # parts in an equal-revenue run split arithmetically:
                # j-th part's prior = prior + (j-1)*rev
                rem = m
                for c_i, cut in enumerate(cuts):
                    if prior >= cut:
                        continue
                    # parts of this run whose prior stays below this cut
                    # ceil((cut - prior) / rev) parts still fit this class
                    fit = min(rem, -((prior - cut) // rev) if rev else rem)
                    totals["AB"[c_i]][0] += fit
                    totals["AB"[c_i]][1] += fit * rev
                    prior += fit * rev
                    rem -= fit
                    if rem == 0:
                        break
                if rem:
                    totals["C"][0] += rem
                    totals["C"][1] += rem * rev
                    prior += rem * rev
    import pandas as pd  # noqa: F811

    rows = [
        {"cls": k, "n_parts": v[0], "revenue_c2": v[1]}
        for k, v in sorted(totals.items())
    ]
    out = pd.DataFrame(rows)
    out["n_parts"] = out["n_parts"].astype("int64")
    out["revenue_c2"] = out["revenue_c2"].astype("int64")
    return out.reset_index(drop=True)


ABC_PARTS_SQL = f"""
WITH pr AS (
  SELECT l_partkey, SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev
  FROM lineitem GROUP BY 1
),
tot AS (SELECT SUM(rev) AS t FROM pr),
o AS (
  SELECT rev,
         COALESCE(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM pr
),
cls AS (
  SELECT rev,
         CASE WHEN prior < ({ABC_CUTS[0]} * t) // 100 THEN 'A'
              WHEN prior < ({ABC_CUTS[1]} * t) // 100 THEN 'B'
              ELSE 'C' END AS cls
  FROM o CROSS JOIN tot
)
SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS revenue_c2
FROM cls GROUP BY cls ORDER BY cls
"""


# -- brand eigenvector centrality ----------------------------------------------------

BRAND_EIG_MASS = 10 ** 12
BRAND_EIG_ROUNDS = 6


def brand_centrality(sf_dir: str) -> "object":
    """Eigenvector centrality of brands in the basket co-occurrence graph
    (Bonacich): the dominant eigenvector of the |brands| x |brands|
    co-purchase count matrix, via ``BRAND_EIG_ROUNDS`` integer power-
    iteration rounds with L1 mass renormalization ((MASS * raw) // total,
    the hits_scores discipline) — exact fixed point, oracle-unrolled.

    The matrix is BOUNDED (brand-domain squared), so after the one
    orderkey-bucket co-location that assoc_rules already pays, the whole
    iteration is driver arithmetic over <= |B|^2 integers — the
    sufficient-statistics reduction: the fold ships the matrix, never
    baskets.  Output: (p_brand, cent_mu)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    pairs = _brand_pair_counts(sf_dir)
    brands = sorted(
        set(pairs["a"]).union(pairs["b"])
    )
    idx = {b: i for i, b in enumerate(brands)}
    nb_ = len(brands)
    mat = [[0] * nb_ for _ in range(nb_)]
    for a, b, n in pairs.itertuples(index=False):
        mat[idx[a]][idx[b]] += int(n)
        mat[idx[b]][idx[a]] += int(n)
    S = BRAND_EIG_MASS
    v = [S // nb_] * nb_
    for _ in range(BRAND_EIG_ROUNDS):
        raw = [
            sum(mat[i][j] * v[j] for j in range(nb_)) for i in range(nb_)
        ]
        tot = sum(raw)
        v = [(S * r) // tot for r in raw] if tot else v
    return pd.DataFrame(
        {"p_brand": brands, "cent_mu": pd.array(v, dtype="int64")}
    )


def _brand_pair_counts(sf_dir: str) -> "object":
    """Shared (brand-pair, basket-count) fold: the assoc_rules exchange
    shape reduced to its pair table (a < b, undirected)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ._util import n_buckets

    BUCKETS = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    import numpy as np

    pk, pv = _dim_lookup(sf_dir, "part", "p_partkey", ["p_brand"])
    ref = ray.put((pk, pv["p_brand"]))

    def attach(t: pa.Table) -> pa.Table:
        pk_, brand_ = ray.get(ref)
        part_ids = pc.cast(t["l_partkey"], pa.int64()).to_numpy()
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "p_brand": pa.array(
                    brand_[np.searchsorted(pk_, part_ids)], pa.string()
                ),
            }
        )

    def bucketed(t: pa.Table) -> pa.Table:
        sub = (
            t.select(["l_orderkey", "p_brand"])
            .group_by(["l_orderkey", "p_brand"])
            .aggregate([])
        )
        ok = pc.cast(sub["l_orderkey"], pa.int64())
        return pa.table(
            {
                "ob": pc.cast(pc.bit_wise_and(ok, BUCKETS - 1), pa.int32()),
                "l_orderkey": ok,
                "p_brand": sub["p_brand"],
            }
        )

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "p_brand"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["p_brand_x"] < m["p_brand_y"]]
        out = (
            m.groupby(["p_brand_x", "p_brand_y"], as_index=False).size()
            .rename(columns={"p_brand_x": "a", "p_brand_y": "b",
                             "size": "n"})
        )
        out["n"] = out["n"].astype("int64")
        return out

    return (
        li.map_batches(attach, batch_format="pyarrow")
        .map_batches(bucketed, batch_format="pyarrow")
        .groupby("ob")
        .map_groups(pair_partials, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= |brands|^2 rows
    )


def _brand_centrality_sql(rounds: int = BRAND_EIG_ROUNDS) -> str:
    S = BRAND_EIG_MASS
    prev = "v0"
    steps = []
    for t in range(1, rounds + 1):
        steps.append(f"""r{t} AS MATERIALIZED (
  SELECT m.i, SUM(m.w * {prev}.v) AS raw
  FROM m JOIN {prev} ON m.j = {prev}.i GROUP BY m.i
), v{t} AS MATERIALIZED (
  SELECT b.i,
         CAST((CAST({S} AS HUGEINT) * COALESCE(r{t}.raw, 0))
              // (SELECT SUM(raw) FROM r{t}) AS BIGINT) AS v
  FROM brands b LEFT JOIN r{t} USING (i)
)""")
        prev = f"v{t}"
    joined = ",\n".join(steps)
    return f"""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
pairs AS MATERIALIZED (
  SELECT a.p_brand AS ba, b.p_brand AS bb, COUNT(*) AS n
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
),
brands AS (
  SELECT ba AS i FROM pairs UNION SELECT bb FROM pairs
),
m AS MATERIALIZED (
  SELECT ba AS i, bb AS j, n AS w FROM pairs
  UNION ALL SELECT bb, ba, n FROM pairs
),
v0 AS (
  SELECT i, CAST({S} // (SELECT COUNT(*) FROM brands) AS BIGINT) AS v
  FROM brands
),
{joined}
SELECT i AS p_brand, v AS cent_mu FROM {prev} ORDER BY i
"""


BRAND_CENTRALITY_SQL = _brand_centrality_sql()


# -- Gale-Shapley stable assignment ----------------------------------------------------

def _supplier_nation_revenue(sf_dir: str) -> "object":
    """(suppkey, nationkey, rev_c2) revenue matrix — the q5 fast-plan
    shape: customer->nation broadcast, orders attach the nation
    in-stream, ONE orderkey-bucket co-location whose kernel folds
    (supplier x nation) partials (bounded domain) per bucket."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ._util import n_buckets

    OB = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    ck = np.sort(cust["c_custkey"].to_numpy(np.int64))
    cn = cust.set_index("c_custkey")["c_nationkey"].loc[ck].to_numpy(np.int64)
    maps_ref = ray.put((ck, cn))

    def o_rows(t: pa.Table) -> pd.DataFrame:
        ck_, cn_ = ray.get(maps_ref)
        ckv = pc.cast(t["o_custkey"], pa.int64()).to_numpy()
        ok = pc.cast(t["o_orderkey"], pa.int64()).to_numpy()
        nat = cn_[np.searchsorted(ck_, ckv)]
        # ARROW out: these blocks cross the union + bucket shuffle, where a
        # pandas block pays ~13x (BASELINE block-format finding)
        return pa.table(
            {
                "ob": pa.array((ok % OB).astype(np.int32)),
                "key": pa.array(ok),
                "s": pa.array(np.full(len(ok), -1, dtype=np.int64)),
                "v": pa.array(nat.astype(np.int64)),
            }
        )

    def l_rows(t: pa.Table) -> pd.DataFrame:
        ok = pc.cast(t["l_orderkey"], pa.int64()).to_numpy()
        sk = pc.cast(t["l_suppkey"], pa.int64()).to_numpy()
        rev = pc.cast(
            pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64()
        ).to_numpy()
        return pa.table(
            {
                "ob": pa.array((ok % OB).astype(np.int32)),
                "key": pa.array(ok),
                "s": pa.array(sk),
                "v": pa.array(rev),
            }
        )

    def fold(g: pd.DataFrame) -> pa.Table:
        nat = g[g["s"] == -1].set_index("key")["v"]
        li = g[g["s"] != -1]
        out = pd.DataFrame(
            {
                "s_suppkey": li["s"].to_numpy(np.int64),
                "nationkey": nat.reindex(li["key"]).to_numpy(np.int64),
                "rev_c2": li["v"].to_numpy(np.int64),
            }
        )
        f = out.groupby(
            ["s_suppkey", "nationkey"], as_index=False
        )["rev_c2"].sum()
        return pa.table(
            {
                "s_suppkey": pa.array(f["s_suppkey"].to_numpy(np.int64)),
                "nationkey": pa.array(f["nationkey"].to_numpy(np.int64)),
                "rev_c2": pa.array(f["rev_c2"].to_numpy(np.int64)),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        o_rows, batch_format="pyarrow"
    )
    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice"]
    ).map_batches(l_rows, batch_format="pyarrow")
    return (
        li.union(orders)
        .groupby("ob")
        .map_groups(fold, batch_format="pandas")
        .groupby(["s_suppkey", "nationkey"])
        .aggregate(Sum("rev_c2", alias_name="rev_c2"))
        .to_pandas()  # <= |suppliers| x |nations| rows
    )


def stable_assignment(sf_dir: str) -> "object":
    """Gale-Shapley stable assignment of suppliers to nations (the
    hospitals/residents deferred-acceptance algorithm, Nobel 2012):
    suppliers propose in revenue-preference order, each nation holds a
    capacity-bounded court (capacity = ceil(|S| / |N|)) and evicts its
    weakest tenant — the canonical two-sided market-design primitive
    (supplier-to-region allocation under mutual preferences).

    Both sides' preferences derive from the SAME exact revenue matrix
    (``_supplier_nation_revenue``; rev desc, key asc tie-break), so the
    matching is deterministic.  The matrix is the sufficient statistic —
    bounded |S| x |N| — so after its one co-location fold the deferred-
    acceptance rounds are pure driver arithmetic.  SQL-oracled since
    round 5: ``STABLE_ASSIGNMENT_SQL`` replays synchronous-round deferred
    acceptance as a recursive CTE, equal to this sequential run by the
    McVitie-Wilson order-independence theorem; the pytest gate verifies
    no blocking pair AND sequential==synchronous on randomized tied
    matrices.  Output: (s_suppkey, nationkey, rev_c2)."""
    import pandas as pd

    rev = _supplier_nation_revenue(sf_dir)
    supps = sorted(rev["s_suppkey"].unique())
    nats = sorted(rev["nationkey"].unique())
    cap = -(-len(supps) // len(nats))
    r = {
        (int(s), int(n)): int(v)
        for s, n, v in rev.itertuples(index=False)
    }

    def srev(s, n):
        return r.get((s, n), 0)

    # supplier preference lists: (rev desc, nationkey asc)
    pref = {
        s: sorted(nats, key=lambda n: (-srev(s, n), n)) for s in supps
    }
    nxt = {s: 0 for s in supps}
    court: dict[int, list[int]] = {n: [] for n in nats}
    free = list(reversed(supps))  # pop() proposes in ascending suppkey
    while free:
        s = free.pop()
        if nxt[s] >= len(nats):
            continue  # exhausted (cannot happen with cap*|N| >= |S|)
        n = pref[s][nxt[s]]
        nxt[s] += 1
        court[n].append(s)
        if len(court[n]) > cap:
            # evict the nation's weakest tenant (rev asc, suppkey desc)
            worst = min(court[n], key=lambda x: (srev(x, n), -x))
            court[n].remove(worst)
            free.append(worst)
    rows = [
        {"s_suppkey": s, "nationkey": n, "rev_c2": srev(s, n)}
        for n in nats
        for s in court[n]
    ]
    out = pd.DataFrame(rows).sort_values("s_suppkey").reset_index(drop=True)
    return out.astype("int64")


SUPPLIER_NATION_REV_SQL = """
SELECT l.l_suppkey AS s_suppkey, c.c_nationkey AS nationkey,
       SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS rev_c2
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


# Round-5: the driver oracle for stable_assignment.  The engine runs
# SEQUENTIAL supplier-proposing deferred acceptance; the oracle runs the
# SYNCHRONOUS-round variant as a recursive CTE (window functions in the
# recursive term, one scan of the working table per round).  They agree by
# the McVitie-Wilson order-independence theorem: deferred acceptance with
# responsive capacitated preferences yields THE supplier-optimal stable
# matching under any proposal order — a parallel round is just one such
# order.  State per supplier: (nxt = proposals made, held_n = -1 if free);
# each round every free non-exhausted supplier proposes to pref[nxt],
# every nation keeps the top-cap of holders+proposers by (rev DESC, s ASC)
# (exactly the engine's eviction of min by (rev, -s)); recursion ends when
# no free supplier remains (the emitted-row guard goes empty).  All
# arithmetic is integer (rev cents), so the replay is exact.
STABLE_ASSIGNMENT_SQL = """
WITH RECURSIVE
rev AS (
  SELECT l.l_suppkey AS s, c.c_nationkey AS n,
         CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_c2
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
supps AS (SELECT DISTINCT s FROM rev),
nats AS (SELECT DISTINCT n FROM rev),
cap AS (
  SELECT ((SELECT COUNT(*) FROM supps) + (SELECT COUNT(*) FROM nats) - 1)
           // (SELECT COUNT(*) FROM nats) AS cap,
         (SELECT COUNT(*) FROM nats) AS nn
),
full_rev AS (
  SELECT supps.s, nats.n, COALESCE(rev.rev_c2, 0) AS rev
  FROM supps CROSS JOIN nats
  LEFT JOIN rev ON rev.s = supps.s AND rev.n = nats.n
),
pref AS (
  SELECT s, n, rev,
         row_number() OVER (PARTITION BY s ORDER BY rev DESC, n) - 1 AS rk
  FROM full_rev
),
-- composite-key lookup so the recursive term needs exactly ONE inner join
-- on ONE reference to the working table (DuckDB rejects outer joins on
-- the recursive subquery): k1=0 rows answer "free supplier proposing at
-- rank k2" (rk=nn sentinel = exhausted, NULL candidate), k1=1 rows answer
-- "held at nation k2"
lut AS (
  SELECT s, 0 AS k1, rk AS k2, n AS n_cand, rev, 1 AS is_prop FROM pref
  UNION ALL
  SELECT s, 0, (SELECT nn FROM cap), CAST(NULL AS INTEGER),
         CAST(NULL AS BIGINT), 0
  FROM supps
  UNION ALL
  SELECT s, 1, n, n, rev, 0 FROM full_rev
),
gs AS (
  SELECT 0 AS round, s, 0 AS nxt, -1 AS held_n FROM supps
  UNION ALL
  SELECT round + 1, s, nxt_out,
         CASE WHEN n_cand IS NOT NULL
                   AND row_number() OVER (
                         PARTITION BY n_cand ORDER BY rev_cand DESC, s
                       ) <= (SELECT cap FROM cap)
              THEN n_cand ELSE -1 END AS held_out
  FROM (
    SELECT g.round, g.s,
           g.nxt + lut.is_prop AS nxt_out,
           lut.n_cand, lut.rev AS rev_cand,
           SUM(CASE WHEN g.held_n = -1 AND g.nxt < (SELECT nn FROM cap)
                    THEN 1 ELSE 0 END) OVER () AS n_active
    FROM gs g
    JOIN lut
      ON lut.s = g.s
         AND lut.k1 = CASE WHEN g.held_n = -1 THEN 0 ELSE 1 END
         AND lut.k2 = CASE WHEN g.held_n = -1 THEN g.nxt ELSE g.held_n END
  )
  WHERE n_active > 0 AND round < 100000
)
SELECT g.s AS s_suppkey, g.held_n AS nationkey, f.rev AS rev_c2
FROM gs g
JOIN full_rev f ON f.s = g.s AND f.n = g.held_n
WHERE g.round = (SELECT MAX(round) FROM gs) AND g.held_n != -1
ORDER BY s_suppkey
"""


# -- supplier h-index ---------------------------------------------------------------------

def h_index_suppliers(sf_dir: str) -> "object":
    """Hirsch index per supplier over order sizes: the largest h such
    that the supplier serves h orders each containing >= h of its line
    items — the bibliometric concentration transplant (breadth AND depth
    of the relationship in one integer).  One combiner groupby to the
    bounded (supplier, order) count table... which is order-proportional,
    so it folds through a supplier-bucket co-location instead of a raw
    group key; the in-bucket kernel computes h vectorized from the sorted
    count run.  Output: (s_suppkey, h, n_orders)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ._util import n_buckets

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_orderkey"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {
                    "s": pc.cast(t["l_suppkey"], pa.int64()),
                    "o": pc.cast(t["l_orderkey"], pa.int64()),
                }
            ),
            ["s", "o"],
        ).aggregate([([], "count_all")])
        g = g.rename_columns(["s", "o", "n"])
        sb = pc.cast(
            pc.bit_wise_and(pc.cast(g["s"], pa.int64()), nb - 1), pa.int32()
        )
        return g.append_column("sb", sb)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby(["s", "o"], as_index=False)["n"].sum()
        rows = []
        for s, sub in per.groupby("s"):
            cnt = np.sort(sub["n"].to_numpy(np.int64))[::-1]
            rk = np.arange(1, len(cnt) + 1)
            h = int((cnt >= rk).sum())
            rows.append({"s_suppkey": int(s), "h": h,
                         "n_orders": len(cnt)})
        return pd.DataFrame(rows)

    out = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("sb")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # supplier-proportional
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
    return out.astype("int64")


H_INDEX_SQL = """
WITH per AS (
  SELECT l_suppkey AS s, l_orderkey AS o, COUNT(*) AS n
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT s, n,
         row_number() OVER (PARTITION BY s ORDER BY n DESC, o) AS rk
  FROM per
)
SELECT s AS s_suppkey,
       CAST(COALESCE(MAX(CASE WHEN n >= rk THEN rk END), 0) AS BIGINT) AS h,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM ranked GROUP BY s ORDER BY s
"""


# -- business-day fulfillment latency -----------------------------------------


def business_days_latency(sf_dir: str) -> "object":
    """Histogram of order fulfillment latency in BUSINESS days (order date
    exclusive through last ship date inclusive, epoch-day weekend
    convention day%7 in {2,3}) — the SLA metric that calendar-day latency
    ops (q12 and friends) get wrong by up to 2/7.  Weekday counting is the
    closed form W(d) = 5*(d//7) + r - [r>=3] - [r>=4] (r = d%7, W = #
    weekdays in [0, d)), so both engines do identical integer arithmetic —
    no calendar tables.

    Distributed shape: one orderkey-bucket co-location (orders + lineitem
    union, arrow blocks) computes each order's MAX ship day and its
    business-day latency in-kernel, folding to per-bucket histogram
    partials; the global fold is O(latency domain).  Output: (biz_days,
    n_orders)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ._util import n_buckets

    OB = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)

    def o_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["o_orderkey"], pa.int64()).to_numpy()
        day = (
            pc.cast(t["o_orderdate"], pa.int64()).to_numpy() // 86_400_000_000
        )
        return pa.table(
            {
                "ob": pa.array((ok % OB).astype(np.int32)),
                "key": pa.array(ok),
                "d": pa.array(day.astype(np.int64)),
                "kind": pa.array(np.zeros(len(ok), np.int8)),
            }
        )

    def l_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["l_orderkey"], pa.int64()).to_numpy()
        day = (
            pc.cast(t["l_shipdate"], pa.int64()).to_numpy() // 86_400_000_000
        )
        return pa.table(
            {
                "ob": pa.array((ok % OB).astype(np.int32)),
                "key": pa.array(ok),
                "d": pa.array(day.astype(np.int64)),
                "kind": pa.array(np.ones(len(ok), np.int8)),
            }
        )

    def W(d: "np.ndarray") -> "np.ndarray":
        r = d % 7
        return 5 * (d // 7) + r - (r >= 3) - (r >= 4)

    def fold(g: pd.DataFrame) -> pa.Table:
        o = g[g["kind"] == 0].set_index("key")["d"]
        ship = g[g["kind"] == 1].groupby("key")["d"].max()
        both = o.to_frame("od").join(ship.to_frame("sd"), how="inner")
        od = both["od"].to_numpy(np.int64)
        sd = both["sd"].to_numpy(np.int64)
        biz = W(sd + 1) - W(od + 1)
        vals, cnts = np.unique(biz, return_counts=True)
        return pa.table(
            {
                "biz_days": pa.array(vals.astype(np.int64)),
                "n_p": pa.array(cnts.astype(np.int64)),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        o_rows, batch_format="pyarrow"
    )
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        l_rows, batch_format="pyarrow"
    )
    out = (
        li.union(orders)
        .groupby("ob")
        .map_groups(fold, batch_format="pandas")
        .groupby("biz_days")
        .aggregate(Sum("n_p", alias_name="n_orders"))
        .to_pandas()  # O(latency domain)
        .sort_values("biz_days")
        .reset_index(drop=True)
    )
    out["biz_days"] = out["biz_days"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


BUSINESS_DAYS_LATENCY_SQL = """
WITH o AS (
  SELECT o_orderkey, epoch_us(o_orderdate) // 86400000000 AS od FROM orders
), s AS (
  SELECT l_orderkey, MAX(epoch_us(l_shipdate) // 86400000000) AS sd
  FROM lineitem GROUP BY 1
), b AS (
  SELECT (5 * ((sd + 1) // 7) + (sd + 1) % 7
          - CASE WHEN (sd + 1) % 7 >= 3 THEN 1 ELSE 0 END
          - CASE WHEN (sd + 1) % 7 >= 4 THEN 1 ELSE 0 END)
       - (5 * ((od + 1) // 7) + (od + 1) % 7
          - CASE WHEN (od + 1) % 7 >= 3 THEN 1 ELSE 0 END
          - CASE WHEN (od + 1) % 7 >= 4 THEN 1 ELSE 0 END) AS biz_days
  FROM o JOIN s ON s.l_orderkey = o.o_orderkey
)
SELECT CAST(biz_days AS BIGINT) AS biz_days,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM b GROUP BY 1 ORDER BY 1
"""


# -- Laspeyres / Paasche price indices per brand ---------------------------------

PRICE_INDEX_Y0 = 1996
PRICE_INDEX_Y1 = 1997


def price_index_brands(sf_dir: str) -> "object":
    """LASPEYRES and PAASCHE price indices per brand between base year
    1996 and comparison year 1997 — the economics-index primitive over
    the star schema (which brands actually got dearer, holding the
    basket fixed at base-year vs current-year quantities).  Unit prices
    are the rationals s_y/q_y per part; every cross term floors ONCE per
    part at 1e6 scale (p1*q0 -> floor(1e6*s1*q0/q1)) and the index
    floors once more over the exact cents denominators — double-floor
    arithmetic replayed verbatim by the oracle, so the approximate
    index itself hash-matches.  Parts need BOTH years with q > 0.
    ONE part-dimension-bounded (partkey, year) fold; the brand attaches
    AFTER the fold on the already-bounded driver frame (searchsorted
    over the part dim), so no fact-side join exists at all.  Output:
    (brand, n_parts, laspeyres_micro, paasche_micro)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        yr = pc.year(t["l_shipdate"])
        mask = pc.or_(
            pc.equal(yr, PRICE_INDEX_Y0), pc.equal(yr, PRICE_INDEX_Y1)
        )
        sub = pa.table(
            {
                "pk": pc.cast(t["l_partkey"], pa.int64()),
                "y": pc.cast(yr, pa.int64()),
                "q": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
                "s": pc.cast(
                    pc.round(pc.multiply(t["l_extendedprice"], 100)),
                    pa.int64(),
                ),
            }
        ).filter(mask)
        return pa.TableGroupBy(sub, ["pk", "y"]).aggregate(
            [("q", "sum"), ("s", "sum")]
        )

    m = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby(["pk", "y"])
        .aggregate(Sum("q_sum", alias_name="q"), Sum("s_sum", alias_name="s"))
        .to_pandas()  # <= 2 x |part| rows (dimension-bounded)
    )
    pk, pv = _dim_lookup(sf_dir, "part", "p_partkey", ["p_brand"])
    m["brand"] = pv["p_brand"][np.searchsorted(pk, m["pk"].to_numpy())]
    piv = m.pivot_table(
        index=["brand", "pk"], columns="y", values=["q", "s"], aggfunc="sum"
    )
    rows = []
    for brand, sub in piv.groupby(level="brand"):
        n_parts = 0
        lasp_num = 0
        s0_tot = 0
        s1_tot = 0
        paasche_den = 0
        def _cell(r, key):
            v = r.get(key, 0)
            return 0 if v is None or pd.isna(v) else int(v)

        for _, r in sub.iterrows():
            q0 = _cell(r, ("q", PRICE_INDEX_Y0))
            q1 = _cell(r, ("q", PRICE_INDEX_Y1))
            s0 = _cell(r, ("s", PRICE_INDEX_Y0))
            s1 = _cell(r, ("s", PRICE_INDEX_Y1))
            if q0 <= 0 or q1 <= 0:
                continue
            n_parts += 1
            lasp_num += (10**6 * s1 * q0) // q1
            paasche_den += (10**6 * s0 * q1) // q0
            s0_tot += s0
            s1_tot += s1
        if n_parts == 0:
            continue
        rows.append(
            {
                "brand": brand,
                "n_parts": n_parts,
                "laspeyres_micro": lasp_num // s0_tot,
                "paasche_micro": (10**12 * s1_tot) // paasche_den,
            }
        )
    out = pd.DataFrame(sorted(rows, key=lambda r: r["brand"]))
    for c in ("n_parts", "laspeyres_micro", "paasche_micro"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


PRICE_INDEX_BRANDS_SQL = f"""
WITH x AS (
  SELECT l.l_partkey AS pk, p.p_brand AS brand,
         CAST(year(l.l_shipdate) AS BIGINT) AS y,
         CAST(ROUND(l.l_quantity) AS HUGEINT) AS q,
         CAST(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS HUGEINT) AS s
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l.l_shipdate) IN ({PRICE_INDEX_Y0}, {PRICE_INDEX_Y1})
), cell AS (
  SELECT brand, pk, y, SUM(q) AS q, SUM(s) AS s FROM x GROUP BY 1, 2, 3
), piv AS (
  SELECT brand, pk,
         MAX(CASE WHEN y = {PRICE_INDEX_Y0} THEN q END) AS q0,
         MAX(CASE WHEN y = {PRICE_INDEX_Y1} THEN q END) AS q1,
         MAX(CASE WHEN y = {PRICE_INDEX_Y0} THEN s END) AS s0,
         MAX(CASE WHEN y = {PRICE_INDEX_Y1} THEN s END) AS s1
  FROM cell GROUP BY brand, pk
), ok AS (
  SELECT * FROM piv WHERE q0 > 0 AND q1 > 0
), agg AS (
  SELECT brand, COUNT(*) AS n_parts,
         SUM((1000000 * s1 * q0) // q1) AS lasp_num,
         SUM((1000000 * s0 * q1) // q0) AS paasche_den,
         SUM(s0) AS s0_tot, SUM(s1) AS s1_tot
  FROM ok GROUP BY brand
)
SELECT brand, CAST(n_parts AS BIGINT) AS n_parts,
       CAST(lasp_num // s0_tot AS BIGINT) AS laspeyres_micro,
       CAST((1000000000000 * s1_tot) // paasche_den AS BIGINT)
         AS paasche_micro
FROM agg ORDER BY brand
"""


# -- open-orders timeline (counting process over order lifetimes) ---------------


def open_orders_weekly(sf_dir: str) -> "object":
    """OPEN-ORDER backlog timeline: for each week, how many orders were
    in flight (placed but not yet fully shipped — order lifetime spans
    o_orderdate to the order's MAX l_shipdate).  The ops-analytics
    counting process over order lifetimes, built shuffle-light: one
    orderkey-bucket co-location unions the order rows with the lineitem
    rows and folds each order's (start_week, end_week) IN-KERNEL into
    +1/-1 week DELTAS, so the exchange carries O(span) delta rows per
    bucket and the driver runs one O(span) prefix scan — the
    ``peak_concurrency`` shape on a two-table interval.  Orders with no
    lineitems are ignored (no ship evidence).  Output: (week,
    n_open)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ._util import n_buckets

    WEEK_US = 7 * 86_400_000_000
    nb = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def o_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["o_orderkey"], pa.int64())
        wk = pc.divide(
            pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")), pa.int64()),
            WEEK_US,
        )
        return pa.table(
            {
                "ob": pc.cast(pc.bit_wise_and(ok, nb - 1), pa.int32()),
                "ok": ok,
                "wk": wk,
                "kind": pa.array([0] * len(t), pa.int64()),
            }
        )

    def l_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["l_orderkey"], pa.int64())
        wk = pc.divide(
            pc.cast(pc.cast(t["l_shipdate"], pa.timestamp("us")), pa.int64()),
            WEEK_US,
        )
        return pa.table(
            {
                "ob": pc.cast(pc.bit_wise_and(ok, nb - 1), pa.int32()),
                "ok": ok,
                "wk": wk,
                "kind": pa.array([1] * len(t), pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["kind"] == 0].set_index("ok")["wk"]
        ship = g[g["kind"] == 1].groupby("ok")["wk"].max()
        both = pd.DataFrame({"start": o}).join(
            ship.rename("end"), how="inner"
        )
        # the synthetic corpus ships some lines BEFORE the order date;
        # normalize the lifetime to the symmetric span (both engines)
        lo = both.min(axis=1)
        hi = both.max(axis=1)
        both = pd.DataFrame({"start": lo, "end": hi})
        deltas = pd.concat(
            [
                both.groupby("start").size().rename("d"),
                -both.groupby(both["end"] + 1).size().rename("d"),
            ]
        )
        out = deltas.groupby(level=0).sum().reset_index()
        out.columns = ["wk", "delta"]
        return out.astype("int64")

    d = (
        orders.map_batches(o_rows, batch_format="pyarrow")
        .union(li.map_batches(l_rows, batch_format="pyarrow"))
        .groupby("ob")
        .map_groups(fold, batch_format="pandas")
        .groupby("wk")
        .aggregate(Sum("delta", alias_name="delta"))
        .to_pandas()  # O(span weeks)
    )
    d = d.sort_values("wk").reset_index(drop=True)
    d["n_open"] = d["delta"].cumsum()
    out = d[d["n_open"] != 0][["wk", "n_open"]].rename(columns={"wk": "week"})
    # also keep interior zero weeks for exactness vs the oracle: rebuild
    # the full dense span instead
    full = pd.DataFrame(
        {"week": np.arange(int(d["wk"].min()), int(d["wk"].max()))}
    )
    full = full.merge(
        d[["wk", "delta"]], left_on="week", right_on="wk", how="left"
    ).fillna(0)
    full["n_open"] = full["delta"].cumsum().astype("int64")
    full = full[["week", "n_open"]]
    full["week"] = full["week"].astype("int64")
    return full.reset_index(drop=True)


OPEN_ORDERS_WEEKLY_SQL = """
WITH life AS (
  SELECT o_orderkey, LEAST(ws, we) AS ws, GREATEST(ws, we) AS we FROM (
    SELECT o.o_orderkey,
           epoch_us(o.o_orderdate) // 604800000000 AS ws,
           MAX(epoch_us(l.l_shipdate) // 604800000000) AS we
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
  )
), span AS (
  SELECT MIN(ws) AS w0, MAX(we + 1) AS w1 FROM life
), weeks AS (
  SELECT span.w0 + u.g AS week
  FROM span, (SELECT generate_series AS g FROM generate_series(0, 100000)) u
  WHERE span.w0 + u.g < span.w1
)
SELECT w.week,
       CAST(COUNT(l.o_orderkey) AS BIGINT) AS n_open
FROM weeks w LEFT JOIN life l ON l.ws <= w.week AND l.we >= w.week
GROUP BY w.week ORDER BY w.week
"""
