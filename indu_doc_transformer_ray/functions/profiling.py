"""Profiling, data-quality and planning primitives (column profiler,
rollup/cube/pivot, correlation, constraint audit, pareto frontier,
k-anonymity, join-size estimate, skew report).

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


# -- generic column profiler -------------------------------------------------

def profile_columns(
    ds: Dataset, numeric_cols: list[str], key_col: str
) -> "object":
    """Generic data-profiling aggregate: per numeric column (count, nulls,
    min, max, integer-scaled sum) plus exact distinct count of ``key_col``
    via the two-level groupby — one pass + one tiny shuffle, the profile
    never exceeds a few rows.  The building block for ingest validation at
    scale (schema drift, null explosions, range regressions)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        names, counts, nulls, mins, maxs, sums = [], [], [], [], [], []
        for c in numeric_cols:
            col = t[c]
            names.append(c)
            counts.append(len(col) - col.null_count)
            nulls.append(col.null_count)
            mn, mx = pc.min(col).as_py(), pc.max(col).as_py()
            # +/-inf sentinels for all-null/empty batches: a 0 coercion
            # would corrupt the global min/max whenever the true column
            # min > 0 or max < 0.  Mapped back to NaN after the reduce.
            mins.append(float("inf") if mn is None else float(mn))
            maxs.append(float("-inf") if mx is None else float(mx))
            s = pc.sum(_cents(col)).as_py()
            sums.append(0 if s is None else int(s))
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n": pa.array(counts, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
                "min_v": pa.array(mins, pa.float64()),
                "max_v": pa.array(maxs, pa.float64()),
                "sum_c2": pa.array(sums, pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    prof = (
        parts.groupby("column")
        .agg(
            n=("n", "sum"), nulls=("nulls", "sum"), min_v=("min_v", "min"),
            max_v=("max_v", "max"), sum_c2=("sum_c2", "sum"),
        )
        .reset_index()
    )
    import numpy as np

    prof["min_v"] = prof["min_v"].replace(np.inf, np.nan)
    prof["max_v"] = prof["max_v"].replace(-np.inf, np.nan)
    distinct = (
        ds.groupby(key_col).aggregate(Count(alias_name="_c"))
        .count()
    )
    prof["n_distinct_keys"] = int(distinct)
    return prof.astype(
        {"n": "int64", "nulls": "int64", "sum_c2": "int64",
         "n_distinct_keys": "int64"}
    ).sort_values("column").reset_index(drop=True)


def profile_lineitem(sf_dir: str) -> "object":
    """Profile of lineitem's numeric columns keyed by l_orderkey."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    return profile_columns(
        ds, ["l_quantity", "l_extendedprice", "l_discount"], "l_orderkey"
    )


PROFILE_LINEITEM_SQL = """
WITH d AS (SELECT COUNT(DISTINCT l_orderkey) AS nd FROM lineitem),
p AS (
  SELECT 'l_quantity' AS "column", COUNT(l_quantity) AS n,
         COUNT(*) - COUNT(l_quantity) AS nulls,
         CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
         CAST(MAX(l_quantity) AS DOUBLE) AS max_v,
         CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_c2
  FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', COUNT(l_extendedprice),
         COUNT(*) - COUNT(l_extendedprice),
         CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE),
         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'l_discount', COUNT(l_discount), COUNT(*) - COUNT(l_discount),
         CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE),
         CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT)
  FROM lineitem
)
SELECT p.*, CAST(d.nd AS BIGINT) AS n_distinct_keys
FROM p CROSS JOIN d ORDER BY "column"
"""


# -- rollup: hierarchical totals ---------------------------------------------

def orders_rollup(sf_dir: str) -> "object":
    """GROUP BY ROLLUP(status, priority): the hierarchical-aggregate shape —
    ONE distributed groupby at the finest grain, then the coarser levels
    re-aggregate the (tiny) finest result on the driver (classic rollup
    push-down: never re-scan the fact table per level).  NULL grouping
    columns are encoded as '' for hash-stable comparison."""
    import pandas as pd

    base = (
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()  # |statuses| x |priorities| rows
    )
    lvl1 = (
        base.groupby("o_orderstatus", as_index=False)["n"].sum()
        .assign(o_orderpriority="")
    )
    total = pd.DataFrame(
        {"o_orderstatus": [""], "o_orderpriority": [""], "n": [base["n"].sum()]}
    )
    out = pd.concat([base, lvl1, total], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(
        ["o_orderstatus", "o_orderpriority"]
    ).reset_index(drop=True)


ORDERS_ROLLUP_SQL = """
SELECT COALESCE(o_orderstatus, '') AS o_orderstatus,
       COALESCE(o_orderpriority, '') AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


# -- pivot: long -> wide -----------------------------------------------------

def status_priority_pivot(sf_dir: str) -> "object":
    """Pivot orders to a status x priority count matrix: map-side one-hot
    columns (one int column per priority value, vectorized) + ONE groupby
    Sum — the long->wide shape without a second pass or driver pivot of the
    fact table.  Priority values are a fixed domain (dimension metadata at
    scale)."""
    PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    COLS = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]

    def one_hot(t: pa.Table) -> pa.Table:
        cols = {"o_orderstatus": t["o_orderstatus"]}
        for val, name in zip(PRIORITIES, COLS):
            cols[name] = pc.cast(
                pc.equal(t["o_orderpriority"], val), pa.int64()
            )
        return pa.table(cols)

    out = (
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
        .map_batches(one_hot, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(*[Sum(c, alias_name=c) for c in COLS])
        .to_pandas()  # |statuses| rows
    )
    for c in COLS:
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderstatus").reset_index(drop=True)


STATUS_PRIORITY_PIVOT_SQL = """
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1_urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2_high,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3_medium,
       CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4_not_specified,
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5_low
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# -- statistics: Pearson correlation ----------------------------------------

def corr_qty_price(sf_dir: str) -> "object":
    """Pearson correlation of quantity vs extended price over lineitem —
    the single-pass distributed-statistics shape: each batch folds to ONE
    row of integer-cent moment sums (Σx, Σy, Σxy, Σx², Σy², n), the driver
    adds them as arbitrary-precision Python ints (the sums, not the data;
    SQL mirrors with HUGEINT), and the final correlation is one fixed
    double expression — num/sqrt(a)/sqrt(b), each operand an exact big-int
    correctly rounded to double on both engines — FLOORED to micro-units
    (the bm25 technique).  Output: one row (n, corr_mu)."""
    import math

    import pandas as pd

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(pc.multiply(t["l_quantity"], 100.0)), pa.int64())
        y = _cents(t["l_extendedprice"])
        return pa.table(
            {
                "sx": pa.array([pc.sum(x).as_py() or 0], pa.int64()),
                "sy": pa.array([pc.sum(y).as_py() or 0], pa.int64()),
                "sxy": pa.array(
                    [pc.sum(pc.multiply(x, y)).as_py() or 0], pa.int64()
                ),
                "sxx": pa.array(
                    [pc.sum(pc.multiply(x, x)).as_py() or 0], pa.int64()
                ),
                "syy": pa.array(
                    [pc.sum(pc.multiply(y, y)).as_py() or 0], pa.int64()
                ),
                "cnt": pa.array([t.num_rows], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # arbitrary-precision accumulation: at extreme scale int64 pandas sums
    # of second moments would overflow; Python ints cannot
    sx = sum(int(v) for v in parts["sx"])
    sy = sum(int(v) for v in parts["sy"])
    sxy = sum(int(v) for v in parts["sxy"])
    sxx = sum(int(v) for v in parts["sxx"])
    syy = sum(int(v) for v in parts["syy"])
    n = sum(int(v) for v in parts["cnt"])
    num = n * sxy - sx * sy
    va = n * sxx - sx * sx
    vb = n * syy - sy * sy
    corr = num / math.sqrt(va) / math.sqrt(vb)
    return pd.DataFrame(
        {"n": [n], "corr_mu": [math.floor(corr * 1e6)]}
    ).astype({"n": "int64", "corr_mu": "int64"})


CORR_QTY_PRICE_SQL = """
WITH m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(CAST(ROUND(l_quantity*100) AS BIGINT) AS HUGEINT)) AS sx,
         SUM(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT) AS HUGEINT)) AS sy,
         SUM(CAST(CAST(ROUND(l_quantity*100) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS sxy,
         SUM(CAST(CAST(ROUND(l_quantity*100) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(l_quantity*100) AS BIGINT)) AS sxx,
         SUM(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS syy
  FROM lineitem
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  / sqrt(CAST(n * syy - sy * sy AS DOUBLE))
                  * 1e6) AS BIGINT) AS corr_mu
FROM m
"""


# -- CUBE grouping sets -------------------------------------------------------

def orders_cube(sf_dir: str) -> "object":
    """CUBE(status, priority) order counts + totalprice sums — the grouping-
    sets shape done map-side: each batch emits partials for all FOUR
    grouping sets at once (one pyarrow group_by per set over the batch,
    'ALL' as the rolled-up sentinel), so a single small groupby folds the
    whole cube; no per-set corpus pass, no driver pivot.  Output:
    (o_orderstatus, o_orderpriority, n_orders, total_c2)."""
    import pandas as pd

    ds = _read(
        sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        base = pa.table(
            {
                "s": t["o_orderstatus"],
                "p": t["o_orderpriority"],
                "c2": _cents(t["o_totalprice"]),
            }
        )
        outs = []
        n = len(base)
        for keep_s, keep_p in (
            (True, True), (True, False), (False, True), (False, False),
        ):
            g = pa.table(
                {
                    "s": base["s"] if keep_s
                    else pa.array(["ALL"] * n, pa.string()),
                    "p": base["p"] if keep_p
                    else pa.array(["ALL"] * n, pa.string()),
                    "c2": base["c2"],
                }
            )
            outs.append(
                pa.TableGroupBy(g, ["s", "p"]).aggregate(
                    [("c2", "sum"), ([], "count_all")]
                )
            )
        return pa.concat_tables(outs)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["s", "p"])
        .aggregate(
            Sum("count_all", alias_name="n_orders"),
            Sum("c2_sum", alias_name="total_c2"),
        )
        .to_pandas()  # (|status|+1) x (|priority|+1) rows
        .rename(columns={"s": "o_orderstatus", "p": "o_orderpriority"})
        .astype({"n_orders": "int64", "total_c2": "int64"})
    )
    return out.sort_values(
        ["o_orderstatus", "o_orderpriority"]
    ).reset_index(drop=True)


ORDERS_CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c2
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


def constraint_check(sf_dir: str) -> "object":
    """Data-quality constraint audit — the expectation-suite pass a
    production pipeline runs before publishing a snapshot (null / range /
    referential-integrity / temporal-ordering violations), reported as one
    (constraint_name, n_violations) row each.  The row-local checks fold
    map-side to per-batch partial counts; the two CROSS-TABLE checks
    (orphan lineitems, ship-before-order) ride ONE orderkey-bucket
    co-location exchange — order rows carry their orderdate, line rows
    their shipdate, the in-bucket kernel counts both violations
    vectorized.  Scalar partials fold on the driver under the bucket
    guard, distributed above it (the source_overlap escape)."""
    import numpy as np
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    OB = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)

    def o_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["o_orderkey"], pa.int64())
        od = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")), pa.int64())
        n_price = pc.sum(
            pc.cast(pc.less_equal(t["o_totalprice"], 0.0), pa.int64())
        ).as_py() or 0
        n_null = t["o_orderpriority"].null_count
        base = pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "ok": ok,
                "kind": pa.array([0] * len(t), pa.int8()),
                "ts_us": od,
                "name": pa.array([""] * len(t), pa.string()),
                "n": pa.array([0] * len(t), pa.int64()),
            }
        )
        part = pa.table(
            {
                "b": pa.array([0, 0], pa.int32()),
                "ok": pa.array([-1, -1], pa.int64()),
                "kind": pa.array([2, 2], pa.int8()),
                "ts_us": pa.array([0, 0], pa.int64()),
                "name": pa.array(
                    ["order_totalprice_nonpositive", "order_null_priority"],
                    pa.string(),
                ),
                "n": pa.array([n_price, n_null], pa.int64()),
            }
        )
        return pa.concat_tables([base, part])

    def l_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["l_orderkey"], pa.int64())
        ship = pc.cast(pc.cast(t["l_shipdate"], pa.timestamp("us")), pa.int64())
        q = t["l_quantity"]
        n_range = pc.sum(
            pc.cast(
                pc.or_(pc.less(q, 1.0), pc.greater(q, 50.0)), pa.int64()
            )
        ).as_py() or 0
        base = pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "ok": ok,
                "kind": pa.array([1] * len(t), pa.int8()),
                "ts_us": ship,
                "name": pa.array([""] * len(t), pa.string()),
                "n": pa.array([0] * len(t), pa.int64()),
            }
        )
        part = pa.table(
            {
                "b": pa.array([0], pa.int32()),
                "ok": pa.array([-1], pa.int64()),
                "kind": pa.array([2], pa.int8()),
                "ts_us": pa.array([0], pa.int64()),
                "name": pa.array(["lineitem_qty_out_of_range"], pa.string()),
                "n": pa.array([n_range], pa.int64()),
            }
        )
        return pa.concat_tables([base, part])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        names, ns = [], []
        pass_thru = g[g["kind"] == 2]
        if len(pass_thru):
            agg = pass_thru.groupby("name")["n"].sum()
            names.extend(agg.index.tolist())
            ns.extend(int(v) for v in agg.values)
        o = g[g["kind"] == 0]
        l = g[g["kind"] == 1]
        if len(l):
            od = pd.Series(o["ts_us"].values, index=o["ok"].values)
            mapped = l["ok"].map(od)
            orphan = int(mapped.isna().sum())
            before = int((l["ts_us"].values < mapped.fillna(-(2**62)).values).sum())
            names.extend(["lineitem_orphan", "lineitem_ship_before_order"])
            ns.extend([orphan, before])
        return pd.DataFrame({"name": names, "n": pd.array(ns, dtype="int64")})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_totalprice",
                    "o_orderpriority"]).map_batches(
        o_rows, batch_format="pyarrow"
    )
    lines = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_shipdate", "l_quantity"]).map_batches(
        l_rows, batch_format="pyarrow"
    )
    partials = (
        orders.union(lines)
        .groupby("b")
        .map_groups(fold, batch_format="pandas")
    )
    if OB <= 4096:
        parts = partials.to_pandas().groupby("name", as_index=False)["n"].sum()
    else:
        parts = (
            partials.groupby("name")
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()
        )
    # every constraint reports, violated or not
    all_names = [
        "lineitem_orphan", "lineitem_qty_out_of_range",
        "lineitem_ship_before_order", "order_null_priority",
        "order_totalprice_nonpositive",
    ]
    out = (
        parts.set_index("name").reindex(all_names, fill_value=0)["n"]
        .reset_index()
        .rename(columns={"name": "constraint_name", "n": "n_violations"})
    )
    out["n_violations"] = out["n_violations"].astype("int64")
    return out.sort_values("constraint_name").reset_index(drop=True)


CONSTRAINT_CHECK_SQL = """
SELECT constraint_name, CAST(n_violations AS BIGINT) AS n_violations FROM (
  SELECT 'lineitem_orphan' AS constraint_name,
         (SELECT COUNT(*) FROM lineitem l
          LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderkey IS NULL) AS n_violations
  UNION ALL
  SELECT 'lineitem_qty_out_of_range',
         (SELECT COUNT(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
  UNION ALL
  SELECT 'lineitem_ship_before_order',
         (SELECT COUNT(*) FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_shipdate < o.o_orderdate)
  UNION ALL
  SELECT 'order_null_priority',
         (SELECT COUNT(*) FROM orders WHERE o_orderpriority IS NULL)
  UNION ALL
  SELECT 'order_totalprice_nonpositive',
         (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
)
ORDER BY constraint_name
"""


# -- pareto frontier (skyline over two objectives) ---------------------------

def _frontier_mask(price, size):
    """Boolean keep-mask of the (minimize price, maximize size) pareto
    frontier: keep iff size == max(size | price' <= price) (not outsized by
    a cheaper-or-equal row) AND size > max(size | price' < price) (not
    matched by a strictly cheaper row) — vectorized via one lexsort + a
    per-price-group running max.  Idempotent and lossless under batching
    (a locally dominated row is globally dominated), which is what makes
    the distributed tree fold exact."""
    import numpy as np

    order = np.lexsort((-size, price))
    ps, ss = price[order], size[order]
    new = np.empty(len(ps), dtype=bool)
    new[0] = True
    new[1:] = ps[1:] != ps[:-1]
    gidx = np.cumsum(new) - 1
    gmax = ss[new]                          # size sorts desc within price
    run = np.maximum.accumulate(gmax)
    mlt_g = np.empty_like(run)
    mlt_g[0] = np.iinfo(np.int64).min
    mlt_g[1:] = run[:-1]
    keep_sorted = (ss == run[gidx]) & (ss > mlt_g[gidx])
    mask = np.empty(len(ps), dtype=bool)
    mask[order] = keep_sorted
    return mask


def pareto_frontier(sf_dir: str) -> "object":
    """Skyline query: parts not strictly dominated on (minimize price,
    maximize size) — the multi-objective shortlist shape (cheapest part at
    every size level).  Monotone tree fold: each batch prunes its own rows
    to a local frontier (a locally dominated row is globally dominated, so
    the prune is lossless), survivors regroup into a handful of blocks for
    a second prune, and the driver folds the last few hundred rows.  No
    all-to-all: the exchange ships only frontier candidates, which are
    output-sized (worst case the frontier IS the output, and returning it
    is the contract).  Output: (p_partkey, p_name, price_c2, p_size)."""
    import numpy as np
    import pandas as pd

    _frontier = _frontier_mask

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        if "price_c2" not in t.column_names:
            t = t.append_column(
                "price_c2", _cents(t.column("p_retailprice"))
            ).drop_columns(["p_retailprice"])
        mask = _frontier(
            t.column("price_c2").to_numpy(zero_copy_only=False),
            t.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64),
        )
        return t.filter(pa.array(mask))

    partials = (
        _read(sf_dir, "part",
              ["p_partkey", "p_name", "p_retailprice", "p_size"])
        .map_batches(prune, batch_format="pyarrow")
        .repartition(4)
        .map_batches(prune, batch_format="pyarrow")
    )
    df = partials.to_pandas()  # output-sized: local frontiers only
    if len(df):
        mask = _frontier(
            df["price_c2"].to_numpy(), df["p_size"].to_numpy().astype("int64")
        )
        df = df[mask]
    df = df[["p_partkey", "p_name", "price_c2", "p_size"]]
    return df.sort_values(
        ["price_c2", "p_size", "p_partkey"]
    ).reset_index(drop=True)


PARETO_FRONTIER_SQL = """
WITH p AS (
  SELECT p_partkey, p_name,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c2, p_size
  FROM part
)
SELECT a.p_partkey, a.p_name, a.price_c2, a.p_size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_c2 <= a.price_c2 AND b.p_size >= a.p_size
    AND (b.price_c2 < a.price_c2 OR b.p_size > a.p_size)
)
ORDER BY price_c2, p_size, p_partkey
"""


# -- privacy: k-anonymity audit ------------------------------------------------

K_ANON_THRESHOLDS = (2, 5, 10)


def k_anonymity_audit(sf_dir: str) -> "object":
    """k-anonymity audit of the customer table under the quasi-identifier
    (nation, market segment): for each k, how many equivalence classes
    have fewer than k members and how many ROWS sit in them — the re-
    identification risk report a privacy review runs before releasing a
    derived dataset.  One combiner groupby builds the class-size table
    (|nations| x |segments| rows, corpus-size free); the threshold sweep is
    a vectorized driver fold over that tiny table.  Output: (k,
    n_classes_below, n_rows_at_risk)."""
    import pandas as pd

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])

    def partial(t: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(
            t, ["c_nationkey", "c_mktsegment"]
        ).aggregate([([], "count_all")])
        return agg.rename_columns(["c_nationkey", "c_mktsegment", "n"])

    classes = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["c_nationkey", "c_mktsegment"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # quasi-identifier domain, corpus-size free
    )
    rows = []
    for k in K_ANON_THRESHOLDS:
        below = classes[classes["n"] < k]
        rows.append(
            {
                "k": k,
                "n_classes_below": len(below),
                "n_rows_at_risk": int(below["n"].sum()),
            }
        )
    return pd.DataFrame(rows).astype(
        {"k": "int64", "n_classes_below": "int64", "n_rows_at_risk": "int64"}
    )


K_ANONYMITY_AUDIT_SQL = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
  FROM customer GROUP BY 1, 2
), ks(k) AS (VALUES {", ".join(f"({k})" for k in K_ANON_THRESHOLDS)})
SELECT CAST(k AS BIGINT) AS k,
       CAST(COUNT(*) FILTER (WHERE n < k) AS BIGINT) AS n_classes_below,
       CAST(COALESCE(SUM(n) FILTER (WHERE n < k), 0) AS BIGINT)
         AS n_rows_at_risk
FROM ks CROSS JOIN classes
GROUP BY k ORDER BY k
"""


# -- join-size accounting (planning primitive) --------------------------------

def join_size_estimate(sf_dir: str) -> "object":
    """EXACT cardinality of ``lineitem ⋈ orders`` on orderkey WITHOUT
    materializing the join — the planner/capacity primitive run before
    committing to a heavy join: |A ⋈ B| = Σ_k cA(k)·cB(k).  Map-side
    per-key count partials from both sides ride ONE bucketed co-location
    (union, the empty-partition-safe idiom); each kernel emits a single
    scalar partial (its buckets' Σ products), so the driver folds
    O(buckets) rows at any corpus size.  Also reports both input counts
    and the max per-key fan-out (the skew number that decides salting).
    Output: (n_left, n_right, join_rows, max_key_fanout)."""
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)

    def side(table: str, key: str, tag: int):
        def partial(t: pa.Table) -> pa.Table:
            k = pc.cast(t[key], pa.int64())
            folded = pa.table({"k": k})
            agg = pa.TableGroupBy(folded, "k").aggregate([([], "count_all")])
            k2 = agg.column("k")
            return pa.table(
                {
                    "bk": pc.cast(
                        pc.bit_wise_and(k2, nb - 1), pa.int32()
                    ),
                    "k": k2,
                    "side": pa.array([tag] * agg.num_rows, pa.int8()),
                    "n": agg.column("count_all"),
                }
            )

        return _read(sf_dir, table, [key]).map_batches(
            partial, batch_format="pyarrow"
        )

    def fold(g: pd.DataFrame) -> pa.Table:
        c = g.groupby(["k", "side"])["n"].sum().unstack(fill_value=0)
        a = c[0] if 0 in c.columns else pd.Series(0, index=c.index)
        b = c[1] if 1 in c.columns else pd.Series(0, index=c.index)
        prod = a * b
        return pa.table(
            {
                "join_rows": pa.array([int(prod.sum())], pa.int64()),
                "n_left": pa.array([int(a.sum())], pa.int64()),
                "n_right": pa.array([int(b.sum())], pa.int64()),
                "max_key_fanout": pa.array(
                    [int(prod.max()) if len(prod) else 0], pa.int64()
                ),
            }
        )

    parts = (
        side("lineitem", "l_orderkey", 0)
        .union(side("orders", "o_orderkey", 1))
        .groupby("bk")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # O(buckets) scalar partials
    )
    out = pd.DataFrame(
        [
            {
                "n_left": int(parts["n_left"].sum()),
                "n_right": int(parts["n_right"].sum()),
                "join_rows": int(parts["join_rows"].sum()),
                "max_key_fanout": int(parts["max_key_fanout"].max()),
            }
        ]
    )
    return out.astype("int64")


JOIN_SIZE_ESTIMATE_SQL = """
WITH a AS (SELECT l_orderkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1),
b AS (SELECT o_orderkey AS k, COUNT(*) AS n FROM orders GROUP BY 1),
j AS (SELECT a.n * b.n AS rows FROM a JOIN b USING (k))
SELECT CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_left,
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_right,
       CAST(COALESCE(SUM(rows), 0) AS BIGINT) AS join_rows,
       CAST(COALESCE(MAX(rows), 0) AS BIGINT) AS max_key_fanout
FROM j
"""


# -- join-key skew diagnostics --------------------------------------------------

SKEW_TOP_K = 20


def skew_report(sf_dir: str) -> "object":
    """Heavy-key diagnostics for the lineitem⋈orders join column: the 20
    heaviest orderkeys by lineitem fan-out plus each key's corpus share in
    permille — the report that decides whether a join needs salting
    (companion to ``join_size_estimate``).  Per-key counts fold inside a
    key-bucket kernel (bounded groups) which pre-prunes to ITS top-20, so
    only buckets x 20 candidate rows reach the driver.  Output:
    (l_orderkey, n_rows, share_permille) ordered by (n_rows DESC, key)."""
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    total = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    nb = n_buckets(total)
    ds = _read(sf_dir, "lineitem", ["l_orderkey"])

    def partial(t: pa.Table) -> pa.Table:
        k = pc.cast(t["l_orderkey"], pa.int64())
        folded = pa.table(
            {"kb": pc.cast(pc.bit_wise_and(k, nb - 1), pa.int32()), "k": k}
        )
        agg = pa.TableGroupBy(folded, ["kb", "k"]).aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["kb", "k", "n"])

    def bucket_topk(g: pd.DataFrame) -> pa.Table:
        c = g.groupby("k", as_index=False)["n"].sum()
        c = c.sort_values(["n", "k"], ascending=[False, True]).head(
            SKEW_TOP_K
        )
        return pa.table(
            {
                "k": pa.array(c["k"].to_numpy("int64")),
                "n": pa.array(c["n"].to_numpy("int64")),
            }
        )

    cand = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()  # <= buckets * K rows
    )
    top = cand.sort_values(["n", "k"], ascending=[False, True]).head(
        SKEW_TOP_K
    )
    out = pd.DataFrame(
        {
            "l_orderkey": top["k"].astype("int64").values,
            "n_rows": top["n"].astype("int64").values,
            "share_permille": (
                top["n"] * 1000 // total
            ).astype("int64").values,
        }
    )
    return out.reset_index(drop=True)


SKEW_REPORT_SQL = f"""
WITH c AS (
  SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY 1
), t AS (SELECT COUNT(*) AS total FROM lineitem)
SELECT l_orderkey, CAST(n AS BIGINT) AS n_rows,
       CAST(n * 1000 // total AS BIGINT) AS share_permille
FROM c, t
ORDER BY n DESC, l_orderkey
LIMIT {SKEW_TOP_K}
"""


# -- l-diversity privacy audit --------------------------------------------------

L_DIV_THRESHOLDS = (2, 3, 5)


def l_diversity_audit(sf_dir: str) -> "object":
    """l-diversity audit (Machanavajjhala et al., ICDE 2006) — the
    k-anonymity companion: a class of identical quasi-identifiers is still
    unsafe if its SENSITIVE attribute is homogeneous.  QI = (nation,
    market segment); sensitive = the account balance rounded to $100
    bands.  For each l threshold: how many QI classes carry fewer than l
    DISTINCT sensitive values and how many rows sit in them.

    One combiner groupby builds the (QI, band) distinct table — bounded by
    |nations|×|segments|×|bands|, corpus-size free (map-side
    (QI, band, count) partials collapse duplicates before the exchange);
    the threshold sweep is a driver fold over that tiny table.  Output:
    (l, n_classes_below, n_rows_at_risk)."""
    import pandas as pd

    ds = _read(sf_dir, "customer",
               ["c_nationkey", "c_mktsegment", "c_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        band = pc.cast(
            pc.floor(pc.divide(t["c_acctbal"], 100.0)), pa.int64()
        )
        folded = t.select(["c_nationkey", "c_mktsegment"]).append_column(
            "band", band
        )
        agg = pa.TableGroupBy(
            folded, ["c_nationkey", "c_mktsegment", "band"]
        ).aggregate([([], "count_all")])
        return agg.rename_columns(
            ["c_nationkey", "c_mktsegment", "band", "n"]
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["c_nationkey", "c_mktsegment", "band"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # QI x band domain, corpus-size free
    )
    classes = (
        cells.groupby(["c_nationkey", "c_mktsegment"])
        .agg(l=("band", "nunique"), rows=("n", "sum"))
        .reset_index()
    )
    rows = []
    for l in L_DIV_THRESHOLDS:
        below = classes[classes["l"] < l]
        rows.append(
            {"l": l, "n_classes_below": len(below),
             "n_rows_at_risk": int(below["rows"].sum())}
        )
    return pd.DataFrame(rows).astype(
        {"l": "int64", "n_classes_below": "int64", "n_rows_at_risk": "int64"}
    )


L_DIVERSITY_AUDIT_SQL = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         COUNT(DISTINCT CAST(FLOOR(c_acctbal / 100) AS BIGINT)) AS l,
         COUNT(*) AS rows_n
  FROM customer GROUP BY 1, 2
), ls(l) AS (VALUES {", ".join(f"({l})" for l in L_DIV_THRESHOLDS)})
SELECT CAST(ls.l AS BIGINT) AS l,
       CAST(COUNT(*) FILTER (WHERE classes.l < ls.l) AS BIGINT)
         AS n_classes_below,
       CAST(COALESCE(SUM(rows_n) FILTER (WHERE classes.l < ls.l), 0)
            AS BIGINT) AS n_rows_at_risk
FROM ls CROSS JOIN classes
GROUP BY ls.l ORDER BY l
"""


# -- chi-square independence audit (lang x source) ----------------------------

CHI2_SCALE = 10 ** 6  # micro-units for the per-cell contribution


def chi2_lang_source(sf_dir: str) -> "object":
    """Pearson chi-square independence audit of the documents table's
    (lang, source) contingency — the drift/dependence screen a corpus
    review runs before stratifying a mixture by either axis.  One combiner
    groupby builds the |langs| x |sources| table (corpus-size free); the
    per-cell statistic is computed in EXACT integers with the cleared-
    denominator identity chi2_cell = (O*N - rt*ct)^2 / (N*rt*ct), floored
    to micro-units per cell so the distributed fold and the SQL oracle
    agree bit-for-bit (Python ints here, HUGEINT there; the oracle's
    128-bit headroom caps it at ~1e9 observed rows — the Ray side is
    unbounded).  Output: one row per observed cell (lang, source, obs,
    chi2_mu) plus the dof via the cell count; ordered for hashing."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(t, ["lang", "source"]).aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["lang", "source", "n"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded by the (lang x source) domain
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    N = int(cells["n"].sum())
    row_tot = cells.groupby("lang")["n"].sum().to_dict()
    col_tot = cells.groupby("source")["n"].sum().to_dict()
    chi2_mu = []
    for lang, source, obs in cells.itertuples(index=False):
        rt, ct = int(row_tot[lang]), int(col_tot[source])
        num = (int(obs) * N - rt * ct) ** 2 * CHI2_SCALE
        chi2_mu.append(num // (N * rt * ct))
    out = pd.DataFrame(
        {
            "lang": cells["lang"],
            "source": cells["source"],
            "obs": cells["n"].astype("int64"),
            "chi2_mu": pd.array(chi2_mu, dtype="int64"),
        }
    )
    return out


CHI2_LANG_SOURCE_SQL = f"""
WITH cells AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
), tot AS (SELECT SUM(n) AS N FROM cells),
rt AS (SELECT lang, SUM(n) AS rt FROM cells GROUP BY lang),
ct AS (SELECT source, SUM(n) AS ct FROM cells GROUP BY source)
SELECT c.lang, c.source, c.n AS obs,
       CAST(
         (CAST(c.n AS HUGEINT) * t.N - CAST(r.rt AS HUGEINT) * ct.ct)
         * (CAST(c.n AS HUGEINT) * t.N - CAST(r.rt AS HUGEINT) * ct.ct)
         * {CHI2_SCALE}
         // (CAST(t.N AS HUGEINT) * r.rt * ct.ct)
       AS BIGINT) AS chi2_mu
FROM cells c
JOIN tot t ON TRUE
JOIN rt r USING (lang)
JOIN ct USING (source)
ORDER BY c.lang, c.source
"""


# -- Benford's-law first-digit audit -------------------------------------------

#: P(leading digit = d) = log10(1 + 1/d), pre-rounded to ppm in Python and
#: embedded verbatim in the SQL CASE (the HLL linear-counting discipline:
#: no libm log on either engine's hot path, no last-bit divergence channel).
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_audit(sf_dir: str) -> "object":
    """Benford's-law conformance audit of order totals — the classic
    fraud/synthetic-data screen: the observed leading-digit histogram of
    o_totalprice (in cents) against the log-law expectation.  Leading
    digit extraction is string-based on BOTH engines (first character of
    the decimal rendering) so there is no float log10 anywhere; expected
    counts are (n * ppm) // 1e6 in exact integers.  One bounded groupby
    (9 digit groups) over per-batch count partials.  Output: (digit, obs,
    expected, dev) with dev = obs - expected."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("o_totalprice"))
        d = pc.utf8_slice_codeunits(pc.cast(cents, pa.string()), 0, 1)
        agg = pa.TableGroupBy(
            pa.table({"digit": d}), "digit"
        ).aggregate([([], "count_all")])
        return agg.rename_columns(["digit", "n"])

    obs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= 9 rows
    )
    obs["digit"] = obs["digit"].astype("int64")
    obs = obs.set_index("digit")["n"].astype("int64")
    n = int(obs.sum())
    rows = []
    for d in range(1, 10):
        o = int(obs.get(d, 0))
        e = (n * BENFORD_PPM[d]) // 10 ** 6
        rows.append({"digit": d, "obs": o, "expected": e, "dev": o - e})
    return pd.DataFrame(rows).astype("int64")


BENFORD_AUDIT_SQL = f"""
WITH cents AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
), obs AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM cents GROUP BY 1
), tot AS (SELECT SUM(obs) AS n FROM obs),
digits AS (
  SELECT d.digit,
         CASE d.digit {" ".join(f"WHEN {d} THEN {p}" for d, p in BENFORD_PPM.items())} END AS ppm
  FROM (SELECT UNNEST(range(1, 10)) AS digit) d
)
SELECT d.digit, COALESCE(o.obs, 0) AS obs,
       CAST((t.n * d.ppm) // 1000000 AS BIGINT) AS expected,
       CAST(COALESCE(o.obs, 0) - (t.n * d.ppm) // 1000000 AS BIGINT) AS dev
FROM digits d LEFT JOIN obs o USING (digit) CROSS JOIN tot t
ORDER BY d.digit
"""


# -- Simpson diversity of sources within each language --------------------------

def simpson_diversity_by_lang(sf_dir: str) -> "object":
    """Simpson concentration / Gini-Simpson diversity of the source mix
    within each language — the log-free diversity index (entropy's exact
    cousin): lambda = sum n_i(n_i-1) / (N(N-1)), the probability two
    random docs of the language share a source.  Kept exact as a cleared
    fraction (simpson_num, simpson_den) so no division ever happens;
    diversity = 1 - num/den reads off the same columns.  One combiner
    groupby over the bounded (lang, source) domain.  Output: (lang,
    n_docs, n_sources, simpson_num, simpson_den)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(t, ["lang", "source"]).aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["lang", "source", "n"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded (lang x source) domain
    )
    rows = []
    for lang, sub in cells.groupby("lang"):
        ns = [int(x) for x in sub["n"]]
        N = sum(ns)
        rows.append(
            {
                "lang": lang,
                "n_docs": N,
                "n_sources": len(ns),
                "simpson_num": sum(n * (n - 1) for n in ns),
                "simpson_den": N * (N - 1),
            }
        )
    out = pd.DataFrame(sorted(rows, key=lambda r: r["lang"]))
    for c in ("n_docs", "n_sources", "simpson_num", "simpson_den"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


SIMPSON_DIVERSITY_SQL = """
WITH cells AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
)
SELECT lang,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_sources,
       CAST(SUM(n * (n - 1)) AS BIGINT) AS simpson_num,
       CAST(SUM(n) * (SUM(n) - 1) AS BIGINT) AS simpson_den
FROM cells GROUP BY lang ORDER BY lang
"""


# -- t-closeness audit ----------------------------------------------------------------

def t_closeness_audit(sf_dir: str) -> "object":
    """t-closeness audit (Li, Li, Venkatasubramanian, ICDE 2007) — the
    third rung of the privacy ladder after k-anonymity and l-diversity: a
    QI class leaks if its SENSITIVE distribution sits far from the
    corpus-wide one even when it is diverse.  Distance is the ordered-
    domain earth-mover (W1) over $100 account-balance bands, kept exact
    as the cleared fraction w1_num = sum_b |cum_c(b)*N - cum_g(b)*n_c|
    over w1_den = n_c*N (the wasserstein_type_pairs discipline).

    One combiner groupby to the bounded (nation, segment, band) table is
    the only exchange; the CDF walk is a driver fold over that grid.
    Output: (c_nationkey, c_mktsegment, n_rows, w1_num, w1_den)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "customer", ["c_nationkey", "c_mktsegment", "c_acctbal"]
    )

    def partial(t: pa.Table) -> pa.Table:
        band = pc.cast(
            pc.floor(pc.divide(t["c_acctbal"], 100.0)), pa.int64()
        )
        folded = t.select(["c_nationkey", "c_mktsegment"]).append_column(
            "band", band
        )
        agg = pa.TableGroupBy(
            folded, ["c_nationkey", "c_mktsegment", "band"]
        ).aggregate([([], "count_all")])
        return agg.rename_columns(
            ["c_nationkey", "c_mktsegment", "band", "n"]
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["c_nationkey", "c_mktsegment", "band"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded QI x band domain
    )
    bands = sorted(cells["band"].unique())
    g_counts = cells.groupby("band")["n"].sum()
    N = int(g_counts.sum())
    g_cum = []
    acc = 0
    for b in bands:
        acc += int(g_counts.get(b, 0))
        g_cum.append(acc)
    rows = []
    for (nat, seg), sub in cells.groupby(["c_nationkey", "c_mktsegment"]):
        cc = sub.set_index("band")["n"].astype(int)
        n_c = int(cc.sum())
        acc = 0
        w1 = 0
        for b, gc in zip(bands, g_cum):
            acc += int(cc.get(b, 0))
            w1 += abs(acc * N - gc * n_c)
        rows.append(
            {
                "c_nationkey": int(nat),
                "c_mktsegment": seg,
                "n_rows": n_c,
                "w1_num": w1,
                "w1_den": n_c * N,
            }
        )
    out = pd.DataFrame(
        sorted(rows, key=lambda r: (r["c_nationkey"], r["c_mktsegment"]))
    )
    for c in ("c_nationkey", "n_rows", "w1_num", "w1_den"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


T_CLOSENESS_SQL = """
WITH cells AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 100.0) AS BIGINT) AS band,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2, 3
),
bands AS (SELECT DISTINCT band FROM cells),
classes AS (
  SELECT c_nationkey, c_mktsegment, SUM(n) AS n_c FROM cells GROUP BY 1, 2
),
tot AS (SELECT SUM(n) AS N FROM cells),
gcum AS (
  SELECT b.band,
         SUM(COALESCE(g.n, 0)) OVER (ORDER BY b.band) AS cum_g
  FROM bands b LEFT JOIN (
    SELECT band, SUM(n) AS n FROM cells GROUP BY band
  ) g USING (band)
),
grid AS (
  SELECT cl.c_nationkey, cl.c_mktsegment, cl.n_c, b.band,
         COALESCE(c.n, 0) AS n
  FROM classes cl CROSS JOIN bands b
  LEFT JOIN cells c ON c.c_nationkey = cl.c_nationkey
    AND c.c_mktsegment = cl.c_mktsegment AND c.band = b.band
),
ccum AS (
  SELECT c_nationkey, c_mktsegment, n_c, band,
         SUM(n) OVER (PARTITION BY c_nationkey, c_mktsegment
                      ORDER BY band) AS cum_c
  FROM grid
)
SELECT cc.c_nationkey, cc.c_mktsegment,
       CAST(cc.n_c AS BIGINT) AS n_rows,
       CAST(SUM(ABS(CAST(cc.cum_c AS HUGEINT) * t.N
                    - CAST(g.cum_g AS HUGEINT) * cc.n_c)) AS BIGINT)
         AS w1_num,
       CAST(cc.n_c * t.N AS BIGINT) AS w1_den
FROM ccum cc JOIN gcum g USING (band) CROSS JOIN tot t
GROUP BY cc.c_nationkey, cc.c_mktsegment, cc.n_c, t.N
ORDER BY cc.c_nationkey, cc.c_mktsegment
"""


# -- Tukey median polish --------------------------------------------------------------

MEDIAN_POLISH_ROUNDS = 2


def median_polish(sf_dir: str) -> "object":
    """Tukey median polish of the (nation x segment) account-balance
    matrix — the robust two-way ANOVA: alternately sweep row and column
    medians out of the cell-median matrix, leaving residuals that expose
    interaction structure outliers can't drag around.  Sparse-table
    policy: medians are over OBSERVED cells only (the SQL GROUP BY
    median's natural semantics), so empty cells neither appear nor bias.

    Exactness without integers: every median here is an average of two
    integers-or-dyadics, so all values live on the 1/32 lattice (cell
    median may halve once, each of the four polish medians may halve
    again) — binary fractions that float64 and DuckDB's MEDIAN double
    both represent EXACTLY, and subtraction keeps exact.  The output
    scales by 32 back to integers.  One (cell, value) combiner fold is
    the only exchange; the polish runs on the <=125-cell frame.
    Output: (c_nationkey, c_mktsegment, resid_32nd)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "customer", ["c_nationkey", "c_mktsegment", "c_acctbal"]
    )

    def partial(t: pa.Table) -> pa.Table:
        v = _cents(t.column("c_acctbal"))
        folded = t.select(["c_nationkey", "c_mktsegment"]).append_column(
            "v", v
        )
        agg = pa.TableGroupBy(
            folded, ["c_nationkey", "c_mktsegment", "v"]
        ).aggregate([([], "count_all")])
        return agg.rename_columns(["c_nationkey", "c_mktsegment", "v", "n"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["c_nationkey", "c_mktsegment", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded by cells x cent domain
    )

    def cell_median(sub: "pd.DataFrame") -> float:
        sub = sub.sort_values("v")
        n = int(sub["n"].sum())
        cum = sub["n"].cumsum()
        lo_k, hi_k = (n - 1) // 2, n // 2  # 0-based middle order stats
        lo = int(sub.loc[(cum > lo_k).idxmax(), "v"])
        hi = int(sub.loc[(cum > hi_k).idxmax(), "v"])
        return (lo + hi) / 2.0  # dyadic, float-exact

    df = (
        cells.groupby(["c_nationkey", "c_mktsegment"])
        .apply(cell_median, include_groups=False)
        .reset_index(name="v")
    )
    for _ in range(MEDIAN_POLISH_ROUNDS):
        rm = df.groupby("c_nationkey")["v"].median()
        df["v"] = df["v"] - rm.reindex(df["c_nationkey"]).to_numpy()
        cm = df.groupby("c_mktsegment")["v"].median()
        df["v"] = df["v"] - cm.reindex(df["c_mktsegment"]).to_numpy()
    out = df.sort_values(["c_nationkey", "c_mktsegment"]).reset_index(
        drop=True
    )
    out["resid_32nd"] = (out["v"] * 32).round().astype("int64")
    return out[["c_nationkey", "c_mktsegment", "resid_32nd"]].astype(
        {"c_nationkey": "int64"}
    )


def _median_polish_sql(rounds: int = MEDIAN_POLISH_ROUNDS) -> str:
    prev = "m0"
    steps = []
    for t in range(1, rounds + 1):
        steps.append(f"""rmed{t} AS (
  SELECT c_nationkey, MEDIAN(v) AS rm
  FROM {prev} GROUP BY c_nationkey
), mr{t} AS (
  SELECT p.c_nationkey, p.c_mktsegment, p.v - r.rm AS v
  FROM {prev} p JOIN rmed{t} r USING (c_nationkey)
), cmed{t} AS (
  SELECT c_mktsegment, MEDIAN(v) AS cm
  FROM mr{t} GROUP BY c_mktsegment
), m{t} AS (
  SELECT p.c_nationkey, p.c_mktsegment, p.v - c.cm AS v
  FROM mr{t} p JOIN cmed{t} c USING (c_mktsegment)
)""")
        prev = f"m{t}"
    joined = ",\n".join(steps)
    return f"""
WITH m0 AS (
  SELECT c_nationkey, c_mktsegment,
         MEDIAN(CAST(round(c_acctbal * 100) AS BIGINT)) AS v
  FROM customer GROUP BY 1, 2
),
{joined}
SELECT c_nationkey, c_mktsegment,
       CAST(round(v * 32) AS BIGINT) AS resid_32nd
FROM {prev} ORDER BY c_nationkey, c_mktsegment
"""


MEDIAN_POLISH_SQL = _median_polish_sql()


# -- functional-dependency discovery ------------------------------------------

#: bounded-domain lineitem columns the FD audit sweeps (name, kind) — 's' =
#: string as-is, 'c' = cents-coded double (x100 -> int64) so both engines
#: compare identical integers, never float text.
_FD_COLS = (
    ("l_returnflag", "s"), ("l_linestatus", "s"), ("l_linenumber", "i"),
    ("l_quantity", "c"), ("l_discount", "c"), ("l_tax", "c"),
)


def fd_discovery(sf_dir: str) -> "object":
    """TANE-style functional-dependency audit over the bounded-domain
    lineitem columns: for every ordered pair (A, B) of the 6 swept columns (30 pairs), A -> B holds iff
    ``|distinct A| == |distinct (A, B)|`` (each A-value maps to exactly one
    B-value).  The schema-mining primitive behind key detection and
    normalization advice in data catalogs.

    Distributed shape: ONE pass emits per-batch LOCAL-distinct (pair, a, b)
    rows for all pairs (a map-side combiner — the emitted stream is
    domain-bounded, never row-proportional), one global groupby
    deduplicates, and the driver folds the O(sum |A|x|B|) distinct-pair
    table into counts.  Only bounded-domain columns are swept, so the
    group key is corpus-invariant by construction (the session-5 groupby
    rule).  Output: (lhs, rhs, n_lhs, n_pairs, holds)."""
    import pandas as pd

    cols = [c for c, _ in _FD_COLS]
    ds = _read(sf_dir, "lineitem", cols)

    def canon(t: pa.Table, name: str, kind: str) -> pa.Array:
        col = t[name]
        if kind == "s":
            return pc.cast(col, pa.string())
        if kind == "i":
            return pc.cast(pc.cast(col, pa.int64()), pa.string())
        cents = pc.cast(pc.round(pc.multiply(col, 100)), pa.int64())
        return pc.cast(cents, pa.string())

    def local_pairs(t: pa.Table) -> pa.Table:
        outs = []
        canons = {c: canon(t, c, k) for c, k in _FD_COLS}
        for a, _ in _FD_COLS:
            for b, _ in _FD_COLS:
                if a == b:
                    continue
                sub = pa.table({"a": canons[a], "b": canons[b]})
                dedup = pa.TableGroupBy(sub, ["a", "b"]).aggregate([])
                outs.append(
                    dedup.append_column(
                        "p", pa.array([f"{a}>{b}"] * dedup.num_rows, pa.string())
                    )
                )
        return pa.concat_tables(outs)

    d = (
        ds.map_batches(local_pairs, batch_format="pyarrow")
        .groupby(["p", "a", "b"])
        .aggregate(Count(alias_name="_c"))
        .to_pandas()  # O(sum over pairs of |A| x |B|) — domain-bounded
    )
    rows = []
    for p, sub in d.groupby("p"):
        lhs, rhs = p.split(">")
        n_lhs = sub["a"].nunique()
        n_pairs = len(sub)
        rows.append(
            {"lhs": lhs, "rhs": rhs, "n_lhs": n_lhs, "n_pairs": n_pairs,
             "holds": int(n_lhs == n_pairs)}
        )
    out = pd.DataFrame(sorted(rows, key=lambda r: (r["lhs"], r["rhs"])))
    for c in ("n_lhs", "n_pairs", "holds"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def _fd_canon_sql(name: str, kind: str) -> str:
    if kind == "s":
        return name
    if kind == "i":
        return f"CAST({name} AS BIGINT)"
    return f"CAST(ROUND({name}*100) AS BIGINT)"


FD_DISCOVERY_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{a}' AS lhs, '{b}' AS rhs,
       CAST((SELECT COUNT(DISTINCT {_fd_canon_sql(a, ka)}) FROM lineitem) AS BIGINT) AS n_lhs,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT {_fd_canon_sql(a, ka)}, {_fd_canon_sql(b, kb)} FROM lineitem)) AS BIGINT) AS n_pairs,
       CAST((SELECT COUNT(DISTINCT {_fd_canon_sql(a, ka)}) FROM lineitem)
            = (SELECT COUNT(*) FROM (SELECT DISTINCT {_fd_canon_sql(a, ka)}, {_fd_canon_sql(b, kb)} FROM lineitem)) AS BIGINT) AS holds"""
    for a, ka in _FD_COLS for b, kb in _FD_COLS if a != b
) + "\nORDER BY lhs, rhs"


def fd_discovery2(sf_dir: str) -> "object":
    """Level-2 functional-dependency audit (the TANE lattice one level up
    from ``fd_discovery``): for every composite determinant {A, B} and
    every other column C, (A,B) -> C holds iff ``|distinct (A,B)| ==
    |distinct (A,B,C)|`` — the composite-key discovery that single-column
    FDs miss.  Same execution shape: ONE pass emits batch-local-distinct
    (triple, a, b, c) rows for all 60 (pair, rhs) combinations (the
    level-2 distinct table subsumes the level-1 counts via its (a, b)
    projection in-driver), one domain-bounded global dedup, driver fold.
    Output: (lhs_a, lhs_b, rhs, n_lhs, n_triples, holds)."""
    import pandas as pd

    cols = [c for c, _ in _FD_COLS]
    ds = _read(sf_dir, "lineitem", cols)

    def canon(t: pa.Table, name: str, kind: str) -> pa.Array:
        col = t[name]
        if kind == "s":
            return pc.cast(col, pa.string())
        if kind == "i":
            return pc.cast(pc.cast(col, pa.int64()), pa.string())
        cents = pc.cast(pc.round(pc.multiply(col, 100)), pa.int64())
        return pc.cast(cents, pa.string())

    def local_triples(t: pa.Table) -> pa.Table:
        outs = []
        canons = {c: canon(t, c, k) for c, k in _FD_COLS}
        names = [c for c, _ in _FD_COLS]
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                for c in names:
                    if c in (a, b):
                        continue
                    sub = pa.table(
                        {"a": canons[a], "b": canons[b], "c": canons[c]}
                    )
                    dedup = pa.TableGroupBy(sub, ["a", "b", "c"]).aggregate([])
                    outs.append(
                        dedup.append_column(
                            "p",
                            pa.array(
                                [f"{a},{b}>{c}"] * dedup.num_rows, pa.string()
                            ),
                        )
                    )
        return pa.concat_tables(outs)

    # The distinct-triple table is domain-bounded but LARGE (~60 x |A x B
    # x C| groups) — a raw groupby on it pays Ray's per-group sort cost
    # (measured ~20 s at ~300k groups, the session-5 finding).  Bucket by
    # (p, a, b) instead — all c-rows of one determinant pair co-locate, so
    # the in-bucket pandas dedup emits per-p partial counts and the final
    # groupby folds 60 rows.
    import zlib

    import pyarrow.parquet as pq_

    from ._util import n_buckets

    nb = n_buckets(pq_.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = [
            zlib.crc32(f"{p}|{a}|{b}".encode()) % nb
            for p, a, b in zip(
                t["p"].to_pylist(), t["a"].to_pylist(), t["b"].to_pylist()
            )
        ]
        return t.append_column("bk", pa.array(keys, pa.int32()))

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        dedup = g.drop_duplicates(["p", "a", "b", "c"])
        tri = dedup.groupby("p").size().rename("n_tr")
        pairs = (
            dedup[["p", "a", "b"]].drop_duplicates()
            .groupby("p").size().rename("n_lhs")
        )
        out = pd.concat([pairs, tri], axis=1).reset_index()
        return out.astype({"n_lhs": "int64", "n_tr": "int64"})

    d = (
        ds.map_batches(local_triples, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(fold, batch_format="pandas")
        .groupby("p")
        .aggregate(Sum("n_lhs", alias_name="n_lhs"),
                   Sum("n_tr", alias_name="n_tr"))
        .to_pandas()  # 60 rows
    )
    rows = []
    for r in d.itertuples():
        lhs, rhs = r.p.split(">")
        la, lb = lhs.split(",")
        n_lhs, n_tr = int(r.n_lhs), int(r.n_tr)
        rows.append(
            {"lhs_a": la, "lhs_b": lb, "rhs": rhs, "n_lhs": n_lhs,
             "n_triples": n_tr, "holds": int(n_lhs == n_tr)}
        )
    out = pd.DataFrame(
        sorted(rows, key=lambda r: (r["lhs_a"], r["lhs_b"], r["rhs"]))
    )
    for c in ("n_lhs", "n_triples", "holds"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


FD_DISCOVERY2_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{a}' AS lhs_a, '{b}' AS lhs_b, '{c}' AS rhs,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT {_fd_canon_sql(a, ka)}, {_fd_canon_sql(b, kb)} FROM lineitem)) AS BIGINT) AS n_lhs,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT {_fd_canon_sql(a, ka)}, {_fd_canon_sql(b, kb)}, {_fd_canon_sql(c, kc)} FROM lineitem)) AS BIGINT) AS n_triples,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT {_fd_canon_sql(a, ka)}, {_fd_canon_sql(b, kb)} FROM lineitem))
            = (SELECT COUNT(*) FROM (SELECT DISTINCT {_fd_canon_sql(a, ka)}, {_fd_canon_sql(b, kb)}, {_fd_canon_sql(c, kc)} FROM lineitem)) AS BIGINT) AS holds"""
    for ia, (a, ka) in enumerate(_FD_COLS)
    for b, kb in _FD_COLS[ia + 1:]
    for c, kc in _FD_COLS
    if c not in (a, b)
) + "\nORDER BY lhs_a, lhs_b, rhs"


# -- inclusion-dependency discovery (SPIDER-style, bounded domains) -----------

#: candidate (table, column) pairs for the IND sweep — every bounded-domain
#: string column across the star schema, so the melted distinct stream is
#: domain-bounded, never row-proportional.
_IND_COLS = [
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("customer", "c_mktsegment"),
    ("part", "p_brand"),
    ("part", "p_type"),
    ("nation", "n_name"),
    ("region", "r_name"),
]


def ind_discovery(sf_dir: str) -> "object":
    """SPIDER-style INCLUSION-dependency audit across the star schema —
    the cross-table companion to the intra-table ``fd_discovery``: for
    every ordered pair (A, B) of the nine bounded-domain string columns,
    does value-set(A) ⊆ value-set(B)?  The schema-mining primitive
    behind foreign-key suggestion in data catalogs.

    Distributed shape: each table contributes ONE melted pass emitting
    per-batch LOCAL-distinct (col, val) rows (map-side combiner —
    domain-bounded output), a single union + global groupby dedups, and
    the driver folds the O(Σ|domain|) value table into the 72-pair
    subset matrix.  Output: (col_a, col_b, n_a, n_missing, holds)."""
    import pandas as pd

    import ray.data as rd

    by_table: dict[str, list[str]] = {}
    for tbl, col in _IND_COLS:
        by_table.setdefault(tbl, []).append(col)

    def melt(cols):
        def _m(t: pa.Table) -> pa.Table:
            outs = []
            for c in cols:
                vals = pc.cast(t[c], pa.string())
                sub = pa.TableGroupBy(
                    pa.table({"val": vals}), "val"
                ).aggregate([])
                outs.append(
                    sub.append_column(
                        "col", pa.array([c] * sub.num_rows, pa.string())
                    )
                )
            return pa.concat_tables(outs)

        return _m

    parts = []
    for tbl, cols in by_table.items():
        parts.append(
            _read(sf_dir, tbl, cols).map_batches(
                melt(cols), batch_format="pyarrow"
            )
        )
    ds = parts[0].union(*parts[1:])
    d = (
        ds.groupby(["col", "val"])
        .aggregate(Count(alias_name="_c"))
        .to_pandas()  # O(sum of domain sizes)
    )
    dom = {c: set(sub["val"]) for c, sub in d.groupby("col")}
    rows = []
    for _, a in _IND_COLS:
        for _, b in _IND_COLS:
            if a == b:
                continue
            missing = dom.get(a, set()) - dom.get(b, set())
            rows.append(
                {
                    "col_a": a,
                    "col_b": b,
                    "n_a": len(dom.get(a, set())),
                    "n_missing": len(missing),
                    "holds": int(not missing),
                }
            )
    out = pd.DataFrame(sorted(rows, key=lambda r: (r["col_a"], r["col_b"])))
    for c in ("n_a", "n_missing", "holds"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


IND_DISCOVERY_SQL = """
WITH d AS (
  SELECT 'l_returnflag' AS col, CAST(l_returnflag AS VARCHAR) AS val
    FROM lineitem GROUP BY 2
  UNION ALL SELECT 'l_linestatus', CAST(l_linestatus AS VARCHAR)
    FROM lineitem GROUP BY 2
  UNION ALL SELECT 'o_orderstatus', CAST(o_orderstatus AS VARCHAR)
    FROM orders GROUP BY 2
  UNION ALL SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR)
    FROM orders GROUP BY 2
  UNION ALL SELECT 'c_mktsegment', CAST(c_mktsegment AS VARCHAR)
    FROM customer GROUP BY 2
  UNION ALL SELECT 'p_brand', CAST(p_brand AS VARCHAR) FROM part GROUP BY 2
  UNION ALL SELECT 'p_type', CAST(p_type AS VARCHAR)
    FROM part GROUP BY 2
  UNION ALL SELECT 'n_name', CAST(n_name AS VARCHAR) FROM nation GROUP BY 2
  UNION ALL SELECT 'r_name', CAST(r_name AS VARCHAR) FROM region GROUP BY 2
), cols AS (
  SELECT DISTINCT col FROM d
), pairs AS (
  SELECT a.col AS ca, b.col AS cb FROM cols a JOIN cols b ON a.col <> b.col
), miss AS (
  SELECT p.ca, p.cb,
         COUNT(*) AS n_a,
         COUNT(*) FILTER (WHERE db.val IS NULL) AS n_missing
  FROM pairs p
  JOIN d da ON da.col = p.ca
  LEFT JOIN d db ON db.col = p.cb AND db.val = da.val
  GROUP BY p.ca, p.cb
)
SELECT ca AS col_a, cb AS col_b, CAST(n_a AS BIGINT) AS n_a,
       CAST(n_missing AS BIGINT) AS n_missing,
       CAST(CASE WHEN n_missing = 0 THEN 1 ELSE 0 END AS BIGINT) AS holds
FROM miss ORDER BY ca, cb
"""


# -- differentially-private counts (deterministic discrete-Laplace replay) -----

#: discrete Laplace alpha = 1/2 (eps = ln 2): P(k) = 2^-|k| / 3 — every
#: probability is an exact dyadic/3 rational, so the inverse-CDF thresholds
#: below are exact integers on the md5 52-bit uniform lattice (the repo's
#: md5-seeded-op oracle convention).  Enumeration order 0, +1, -1, ... +K,
#: -K with the ~5e-6 tail mass falling back to 0.
_DP_K = 16


def _dp_thresholds() -> list[tuple[int, int]]:
    from fractions import Fraction

    order = [0]
    for k in range(1, _DP_K + 1):
        order += [k, -k]
    cum = Fraction(0)
    out = []
    for k in order:
        cum += Fraction(1, 3 * 2 ** abs(k))
        out.append((k, (cum.numerator * (1 << 52)) // cum.denominator))
    return out


_DP_THS = _dp_thresholds()


def dp_count_by_type(sf_dir: str) -> "object":
    """Differentially-private per-type event counts via the DISCRETE
    LAPLACE mechanism (eps = ln 2), with the noise drawn DETERMINISTICALLY
    from each type's md5 52-bit uniform through an exact inverse CDF —
    alpha = 1/2 makes every pmf value an exact dyadic/3 rational, so the
    threshold table is integer-exact and the DP output itself
    hash-matches the oracle (the privacy-mechanism plumbing demonstrated
    with the repo's md5-uniform convention; the privacy ladder's
    k-anon / l-diversity / t-closeness audits measure, this one
    RELEASES).  ONE bounded per-type count fold.  Output: (event_type,
    n_true, noise, n_dp)."""
    import hashlib

    import pandas as pd

    from ._util import read_small_aware

    ds = read_small_aware(f"{sf_dir}/events.parquet", columns=["event_type"])

    def fold(t: pa.Table) -> pa.Table:
        return pa.TableGroupBy(
            pa.table({"e": t["event_type"]}), "e"
        ).aggregate([([], "count_all")])

    m = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby("e")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()  # O(|types|)
    )
    rows = []
    for r in m.itertuples():
        u = int(hashlib.md5(str(r.e).encode()).hexdigest()[:13], 16)
        noise = 0
        for k, th in _DP_THS:
            if u < th:
                noise = k
                break
        rows.append(
            {"event_type": r.e, "n_true": int(r.n), "noise": noise,
             "n_dp": int(r.n) + noise}
        )
    out = pd.DataFrame(sorted(rows, key=lambda x: x["event_type"]))
    for c in ("n_true", "noise", "n_dp"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


DP_COUNT_BY_TYPE_SQL = f"""
WITH t AS (
  SELECT event_type AS e, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(concat('0x', substr(md5(event_type), 1, 13)) AS BIGINT) AS u
  FROM events GROUP BY event_type
), ths(idx, k, th) AS (
  VALUES {", ".join(f"({i}, {k}, {th})" for i, (k, th) in enumerate(_DP_THS))}
), pick AS (
  SELECT t.e, t.n,
         COALESCE(MIN(ths.idx) FILTER (WHERE t.u < ths.th), -1) AS idx
  FROM t LEFT JOIN ths ON TRUE GROUP BY t.e, t.n
)
SELECT p.e AS event_type, p.n AS n_true,
       CAST(COALESCE(ths.k, 0) AS BIGINT) AS noise,
       CAST(p.n + COALESCE(ths.k, 0) AS BIGINT) AS n_dp
FROM pick p LEFT JOIN ths ON ths.idx = p.idx
ORDER BY p.e
"""


# -- zone-map (min/max) data-skipping audit -------------------------------------

_ZM_BLOCK = 256          # rows per zone-map block
_ZM_LO = "1997-01-01"    # audit predicate: shipdate within 1997
_ZM_HI = "1997-12-31"


def zonemap_prune_audit(sf_dir: str) -> "object":
    """Zone-map (min/max) DATA-SKIPPING audit for the predicate
    "shipdate in 1997": how many 256-row blocks a reader could prune
    (block max < lo or block min > hi) under (a) the physical INSERTION
    layout (blocks = l_orderkey // 256 — correlated only if the data
    happens to arrive time-ordered) vs (b) the SHIPDATE-SORTED layout,
    whose prune count needs no sort at all — it falls out arithmetically
    from the two out-of-range row counts (full blocks of 256 below /
    above the range are prunable; straddlers are not).  The
    sort-vs-skipping ROI measurement behind clustering keys and
    ``zorder_parts``.  Insertion layout: per-batch (block, min, max, n)
    combiners into a BUCKETED co-location (block count is
    corpus-proportional — the session-5 group rule), O(1) partials out.
    Output: (layout, n_blocks, n_pruned, rows_pruned)."""
    import pandas as pd

    from ._util import n_buckets
    import pyarrow.parquet as pq_

    n_rows = pq_.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    nb = n_buckets(n_rows)
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(pc.cast(t["l_shipdate"], pa.timestamp("us")), pa.int64()),
            pa.int64(),
        )
        day = pc.divide(day, 86_400_000_000)
        blk = pc.divide(pc.cast(t["l_orderkey"], pa.int64()), _ZM_BLOCK)
        folded = pa.table(
            {"blk": blk, "lo": day, "hi": day,
             "n": pa.array([1] * len(t), pa.int64())}
        )
        agg = pa.TableGroupBy(folded, "blk").aggregate(
            [("lo", "min"), ("hi", "max"), ("n", "sum")]
        )
        return agg.append_column(
            "bb", pc.cast(
                pc.bit_wise_and(agg["blk"], nb - 1), pa.int32()
            )
        )

    import datetime as _dt

    lo_day = (_dt.date.fromisoformat(_ZM_LO) - _dt.date(1970, 1, 1)).days
    hi_day = (_dt.date.fromisoformat(_ZM_HI) - _dt.date(1970, 1, 1)).days

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("blk").agg(
            lo=("lo_min", "min"), hi=("hi_max", "max"), n=("n_sum", "sum")
        )
        pruned = (agg["hi"] < lo_day) | (agg["lo"] > hi_day)
        return pd.DataFrame(
            {
                "n_blocks": pd.Series([len(agg)], dtype="int64"),
                "n_pruned": pd.Series([int(pruned.sum())], dtype="int64"),
                "rows_pruned": pd.Series(
                    [int(agg["n"][pruned].sum())], dtype="int64"
                ),
                "n_below": pd.Series([0], dtype="int64"),
                "n_above": pd.Series([0], dtype="int64"),
            }
        )

    def counts_partial(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(pc.cast(t["l_shipdate"], pa.timestamp("us")), pa.int64()),
            pa.int64(),
        )
        day = pc.divide(day, 86_400_000_000)
        below = pc.sum(pc.cast(pc.less(day, lo_day), pa.int64())).as_py() or 0
        above = pc.sum(pc.cast(pc.greater(day, hi_day), pa.int64())).as_py() or 0
        return pa.table(
            {
                "n_blocks": pa.array([0], pa.int64()),
                "n_pruned": pa.array([0], pa.int64()),
                "rows_pruned": pa.array([0], pa.int64()),
                "n_below": pa.array([below], pa.int64()),
                "n_above": pa.array([above], pa.int64()),
            }
        )

    ins = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bb")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # one row per bucket
    )
    cnt = (
        ds.map_batches(counts_partial, batch_format="pyarrow")
        .to_pandas()  # one row per block
    )
    c_lo = int(cnt["n_below"].sum())
    c_hi = int(cnt["n_above"].sum())
    n = n_rows
    blk = _ZM_BLOCK
    n_blocks_sorted = (n + blk - 1) // blk
    pl = c_lo // blk
    j_hi = ((n - c_hi) + blk - 1) // blk
    ph = n_blocks_sorted - j_hi
    rows_pl = blk * pl
    rows_ph = n - blk * j_hi if ph > 0 else 0
    out = pd.DataFrame(
        [
            {
                "layout": "insertion",
                "n_blocks": int(ins["n_blocks"].sum()),
                "n_pruned": int(ins["n_pruned"].sum()),
                "rows_pruned": int(ins["rows_pruned"].sum()),
            },
            {
                "layout": "shipdate_sorted",
                "n_blocks": n_blocks_sorted,
                "n_pruned": pl + ph,
                "rows_pruned": rows_pl + rows_ph,
            },
        ]
    )
    for c in ("n_blocks", "n_pruned", "rows_pruned"):
        out[c] = out[c].astype("int64")
    return out.sort_values("layout").reset_index(drop=True)


ZONEMAP_PRUNE_SQL = f"""
WITH days AS (
  SELECT l_orderkey, epoch_us(l_shipdate) // 86400000000 AS day
  FROM lineitem
), bounds AS (
  SELECT CAST(epoch_us(TIMESTAMP '{_ZM_LO} 00:00:00') // 86400000000
              AS BIGINT) AS lo,
         CAST(epoch_us(TIMESTAMP '{_ZM_HI} 00:00:00') // 86400000000
              AS BIGINT) AS hi
), blocks AS (
  SELECT l_orderkey // {_ZM_BLOCK} AS blk, MIN(day) AS mn, MAX(day) AS mx,
         COUNT(*) AS n
  FROM days GROUP BY 1
), ins AS (
  SELECT 'insertion' AS layout,
         CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(COUNT(*) FILTER (WHERE mx < b.lo OR mn > b.hi) AS BIGINT)
           AS n_pruned,
         CAST(COALESCE(SUM(n) FILTER (WHERE mx < b.lo OR mn > b.hi), 0)
              AS BIGINT) AS rows_pruned
  FROM blocks, bounds b GROUP BY b.lo, b.hi
), cnts AS (
  SELECT COUNT(*) AS n,
         COUNT(*) FILTER (WHERE day < b.lo) AS c_lo,
         COUNT(*) FILTER (WHERE day > b.hi) AS c_hi
  FROM days, bounds b GROUP BY b.lo, b.hi
), srt AS (
  SELECT 'shipdate_sorted' AS layout,
         CAST((n + {_ZM_BLOCK} - 1) // {_ZM_BLOCK} AS BIGINT) AS n_blocks,
         CAST(c_lo // {_ZM_BLOCK}
              + ((n + {_ZM_BLOCK} - 1) // {_ZM_BLOCK}
                 - ((n - c_hi) + {_ZM_BLOCK} - 1) // {_ZM_BLOCK})
              AS BIGINT) AS n_pruned,
         CAST({_ZM_BLOCK} * (c_lo // {_ZM_BLOCK})
              + CASE WHEN (n + {_ZM_BLOCK} - 1) // {_ZM_BLOCK}
                          > ((n - c_hi) + {_ZM_BLOCK} - 1) // {_ZM_BLOCK}
                     THEN n - {_ZM_BLOCK}
                          * (((n - c_hi) + {_ZM_BLOCK} - 1) // {_ZM_BLOCK})
                     ELSE 0 END
              AS BIGINT) AS rows_pruned
  FROM cnts
)
SELECT * FROM ins UNION ALL SELECT * FROM srt ORDER BY layout
"""


# -- Goodman-Kruskal lambda (proportional-reduction-in-error association) ------

#: (table, predictor, response) sweeps — bounded-domain pairs across the
#: star schema where "how well does knowing X predict Y" is the question.
_GK_PAIRS = [
    ("lineitem", "l_returnflag", "l_linestatus"),
    ("orders", "o_orderpriority", "o_orderstatus"),
    ("part", "p_brand", "p_type"),
]


def gk_lambda_pairs(sf_dir: str) -> "object":
    """Goodman-Kruskal LAMBDA — the proportional-reduction-in-error
    association the chi-square family can't give you (chi2 says
    "dependent", lambda says "knowing X removes this fraction of the
    errors you'd make guessing Y"): lambda = (sum_x max_y n_xy - max_y
    n_y) / (N - max_y n_y), an EXACT integer fraction emitted as
    (lambda_num, lambda_den) plus the floored ppm.  One bounded
    contingency fold per (predictor, response) pair; modal ties resolve
    by MAX count only (counts, not categories, enter the statistic, so
    ties are harmless).  Output: (tbl, x, y, n, lambda_num, lambda_den,
    lambda_ppm)."""
    import pandas as pd

    rows = []
    for tbl, x, y in _GK_PAIRS:
        ds = _read(sf_dir, tbl, [x, y])

        def fold(t: pa.Table, x=x, y=y) -> pa.Table:
            sub = pa.table(
                {"x": pc.cast(t[x], pa.string()),
                 "y": pc.cast(t[y], pa.string())}
            )
            return pa.TableGroupBy(sub, ["x", "y"]).aggregate(
                [([], "count_all")]
            )

        m = (
            ds.map_batches(fold, batch_format="pyarrow")
            .groupby(["x", "y"])
            .aggregate(Sum("count_all", alias_name="n"))
            .to_pandas()  # |X| x |Y| bounded
        )
        N = int(m["n"].sum())
        max_y = int(m.groupby("y")["n"].sum().max())
        sum_max = int(m.groupby("x")["n"].max().sum())
        num = sum_max - max_y
        den = N - max_y
        rows.append(
            {
                "tbl": tbl, "x": x, "y": y, "n": N,
                "lambda_num": num, "lambda_den": den,
                "lambda_ppm": (10**6 * num) // den if den else 0,
            }
        )
    out = pd.DataFrame(sorted(rows, key=lambda r: (r["tbl"], r["x"])))
    for c in ("n", "lambda_num", "lambda_den", "lambda_ppm"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


GK_LAMBDA_PAIRS_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{tbl}' AS tbl, '{x}' AS x, '{y}' AS y,
       CAST((SELECT COUNT(*) FROM {tbl}) AS BIGINT) AS n,
       CAST((SELECT SUM(mx) FROM (
              SELECT MAX(c) AS mx FROM (
                SELECT {x} AS gx, {y} AS gy, COUNT(*) AS c
                FROM {tbl} GROUP BY 1, 2) GROUP BY gx))
            - (SELECT MAX(c) FROM (
                SELECT {y} AS gy, COUNT(*) AS c FROM {tbl} GROUP BY 1))
            AS BIGINT) AS lambda_num,
       CAST((SELECT COUNT(*) FROM {tbl})
            - (SELECT MAX(c) FROM (
                SELECT {y} AS gy, COUNT(*) AS c FROM {tbl} GROUP BY 1))
            AS BIGINT) AS lambda_den,
       CAST(CASE WHEN (SELECT COUNT(*) FROM {tbl})
                      - (SELECT MAX(c) FROM (
                          SELECT {y} AS gy, COUNT(*) AS c
                          FROM {tbl} GROUP BY 1)) = 0 THEN 0
            ELSE (1000000 * ((SELECT SUM(mx) FROM (
                    SELECT MAX(c) AS mx FROM (
                      SELECT {x} AS gx, {y} AS gy, COUNT(*) AS c
                      FROM {tbl} GROUP BY 1, 2) GROUP BY gx))
                  - (SELECT MAX(c) FROM (
                      SELECT {y} AS gy, COUNT(*) AS c
                      FROM {tbl} GROUP BY 1))))
                 // ((SELECT COUNT(*) FROM {tbl})
                     - (SELECT MAX(c) FROM (
                         SELECT {y} AS gy, COUNT(*) AS c
                         FROM {tbl} GROUP BY 1))) END AS BIGINT)
         AS lambda_ppm
"""
    for tbl, x, y in _GK_PAIRS
) + "\nORDER BY tbl, x"
