"""TPC-H scan-shaped queries: one fact table, light/broadcast dimensions
(q1, q4, q6, q10, q12, q13, q14, q15, q18, q22).

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


# -- q1: pricing summary (groupby + vectorized derived columns) -------------

def q1_pricing_summary(sf_dir: str) -> Dataset:
    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_tax"],
    )

    def derive(t: pa.Table) -> pa.Table:
        price_c2 = _cents(t["l_extendedprice"])
        disc_c2 = _cents(t["l_discount"])
        tax_c2 = _cents(t["l_tax"])
        one_minus_disc = pc.subtract(100, disc_c2)
        disc_price_c4 = pc.multiply(price_c2, one_minus_disc)
        charge_c6 = pc.multiply(disc_price_c4, pc.add(100, tax_c2))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
                "price_c2": price_c2,
                "disc_price_c4": disc_price_c4,
                "charge_c6": charge_c6,
            }
        )

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price_c2", alias_name="sum_base_price_c2"),
            Sum("disc_price_c4", alias_name="sum_disc_price_c4"),
            Sum("charge_c6", alias_name="sum_charge_c6"),
            Count(alias_name="count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_c2,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_price_c4,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS BIGINT) AS sum_charge_c6,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# -- q4-style semi-join: order priority check -------------------------------

def q4_order_priority(sf_dir: str) -> "object":
    """Orders-per-priority where at least one lineitem shipped with quantity
    > 45 — the distributed EXISTS/semi-join restated as ONE orderkey-bucket
    co-location: the predicate-pushdown lineitem read emits hot orderkeys
    (batch-deduped), orders co-locate by the same bucket, and the in-bucket
    kernel intersects and counts per priority (≤5 partial rows per bucket
    — driver fold).  No ``Dataset.join`` and no corpus-wide distinct
    groupby; both exchange sides scale with SF but ship only (key, tag)
    pairs."""
    import pandas as pd

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ._util import n_buckets

    OB = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)

    def li_rows(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.greater(t["l_quantity"], 45.0))
        ok = pc.cast(sub["l_orderkey"], pa.int64())
        folded = pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "ok": ok,
                "pri": pa.array([""] * len(sub), pa.string()),
            }
        )
        # batch-local dedup: the exchange ships distinct hot keys
        return pa.TableGroupBy(folded, ["b", "ok", "pri"]).aggregate([])

    def o_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["o_orderkey"], pa.int64())
        return pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "ok": ok,
                "pri": pc.cast(t["o_orderpriority"], pa.string()),
            }
        )

    def pri_fold(g: pd.DataFrame) -> pd.DataFrame:
        hot = set(g.loc[g["pri"] == "", "ok"])
        o = g[g["pri"] != ""]
        o = o[o["ok"].isin(hot)]
        out = o.groupby("pri", as_index=False).size()
        out.columns = ["o_orderpriority", "n_orders"]
        return out  # ≤5 rows per bucket

    out = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"],
              filter=pads.field("l_quantity") > 45.0)
        .map_batches(li_rows, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
                o_rows, batch_format="pyarrow"
            )
        )
        .groupby("b")
        .map_groups(pri_fold, batch_format="pandas")
        .to_pandas()  # ≤5·buckets rows
        .groupby("o_orderpriority", as_index=False)["n_orders"]
        .sum()
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders SEMI JOIN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45) l
  ON o_orderkey = l.l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# -- q10-style returned-item report -----------------------------------------

def q10_returned_items(sf_dir: str) -> "object":
    """Top-20 customers by revenue on returned ('R') lineitems — TWO
    bucketed co-locations instead of join + corpus-wide groupby + global
    sort: (1) the R-filtered lineitem per-order revenue partials co-locate
    with orders by orderkey and emit (custkey, revenue) partials already
    bucketed by custkey-hash; (2) the custkey buckets hold every order of
    a customer, so the kernel computes full per-customer totals and emits
    its LOCAL top-20 — the driver merges O(buckets·20) rows.  Only the
    final 20 rows are decorated with c_name via a broadcast ``pc.is_in``
    probe of customer (no scaling-table materialization)."""
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    OB = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)
    CB = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)

    def li_rows(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t["l_returnflag"], "R"))
        ok = pc.cast(sub["l_orderkey"], pa.int64())
        rev = pc.multiply(
            _cents(sub["l_extendedprice"]), pc.subtract(100, _cents(sub["l_discount"]))
        )
        folded = pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "ok": ok,
                "is_line": pa.array([1] * len(sub), pa.int8()),
                "v": rev,
            }
        )
        return pa.TableGroupBy(folded, ["b", "ok", "is_line"]).aggregate(
            [("v", "sum")]
        ).rename_columns(["b", "ok", "is_line", "v"])

    def o_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["o_orderkey"], pa.int64())
        return pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "ok": ok,
                "is_line": pa.array([0] * len(t), pa.int8()),
                "v": pc.cast(t["o_custkey"], pa.int64()),  # custkey rides v
            }
        )

    def cust_partial(g: pd.DataFrame) -> pa.Table:
        ck = g.loc[g["is_line"] == 0].set_index("ok")["v"]
        li = g[g["is_line"] == 1]
        c = li["ok"].map(ck)
        keep = c.notna()
        sub = (
            pd.DataFrame(
                {
                    "ck": c[keep].astype("int64"),
                    "rev": li.loc[keep, "v"].astype("int64"),
                }
            )
            .groupby("ck", as_index=False)["rev"]
            .sum()
        )
        ckv = sub["ck"].to_numpy("int64")
        # arrow out, pre-bucketed by custkey for the second co-location
        return pa.table(
            {
                "cb": pa.array((ckv & (CB - 1)).astype("int32")),
                "o_custkey": pa.array(ckv),
                "revenue_c4": pa.array(sub["rev"].to_numpy("int64")),
            }
        )

    def top_fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("o_custkey", as_index=False)["revenue_c4"].sum()
        return agg.sort_values(
            ["revenue_c4", "o_custkey"], ascending=[False, True]
        ).head(20)  # full per-customer totals live in one cb bucket

    top = (
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        )
        .map_batches(li_rows, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
                o_rows, batch_format="pyarrow"
            )
        )
        .groupby("b")
        .map_groups(cust_partial, batch_format="pandas")
        .groupby("cb")
        .map_groups(top_fold, batch_format="pandas")
        .to_pandas()  # ≤20·buckets rows
        .sort_values(["revenue_c4", "o_custkey"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    keys = pa.array(top["o_custkey"].astype("int64"))

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(pc.cast(t["c_custkey"], pa.int64()), keys))

    names = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()  # 20 rows
    )
    out = top.merge(names, left_on="o_custkey", right_on="c_custkey")
    out = out[["c_custkey", "c_name", "revenue_c4"]]
    out["c_custkey"] = out["c_custkey"].astype("int64")
    out["revenue_c4"] = out["revenue_c4"].astype("int64")
    return out.sort_values(
        ["revenue_c4", "c_custkey"], ascending=[False, True]
    ).reset_index(drop=True)


Q10_SQL = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue_c4 DESC, c_custkey
LIMIT 20
"""


# -- q14-style promo revenue share ------------------------------------------

def q14_promo_revenue(sf_dir: str) -> "object":
    """Promo vs total revenue: lineitem ⋈ part on PARTKEY — the second join
    key family (every other join here is orderkey/custkey), both sides
    scaling with SF — then per-batch partial sums folded to one row (the
    ratio stays integer-exact as a (promo_c4, total_c4) pair)."""
    import pandas as pd

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
    if _dim_rows(sf_dir, "part") <= _rc.MAX_BROADCAST_DIM_ROWS:
        # fast plan: partkey->is_promo broadcasts once; ZERO exchanges —
        # per-batch scalar partials fold on the driver
        import numpy as np

        pk, vals = _dim_lookup(sf_dir, "part", "p_partkey", ["p_type"])
        promo_flags = vals["p_type"] == "PROMO"
        maps_ref = ray.put((pk, promo_flags))

        def bpartial(t: pa.Table) -> pa.Table:
            pk_, pf_ = ray.get(maps_ref)
            pkv = pc.cast(t["l_partkey"], pa.int64()).to_numpy()
            hit, hidx = _lookup_hits(pk_, pkv)
            sub = t.filter(pa.array(hit))
            rev = pc.multiply(
                _cents(sub["l_extendedprice"]),
                pc.subtract(100, _cents(sub["l_discount"])),
            ).to_numpy()
            promo = pf_[hidx]
            return pa.table(
                {
                    "promo_c4": pa.array([int(rev[promo].sum())], pa.int64()),
                    "total_c4": pa.array([int(rev.sum())], pa.int64()),
                }
            )

        parts = li.map_batches(bpartial, batch_format="pyarrow").to_pandas()
        return pd.DataFrame(
            {
                "promo_revenue_c4": [int(parts["promo_c4"].sum())],
                "total_revenue_c4": [int(parts["total_c4"].sum())],
            }
        )

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    joined = li.join(
        part,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_partkey",),
        right_on=("p_partkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _cents(t["l_extendedprice"]), pc.subtract(100, _cents(t["l_discount"]))
        )
        promo = pc.equal(t["p_type"], "PROMO")
        promo_sum = pc.sum(pc.if_else(promo, rev, 0)).as_py() or 0
        total_sum = pc.sum(rev).as_py() or 0
        return pa.table(
            {
                "promo_c4": pa.array([promo_sum], pa.int64()),
                "total_c4": pa.array([total_sum], pa.int64()),
            }
        )

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "promo_revenue_c4": [int(parts["promo_c4"].sum())],
            "total_revenue_c4": [int(parts["total_c4"].sum())],
        }
    )


Q14_SQL = """
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                ELSE 0 END) AS BIGINT) AS promo_revenue_c4,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS total_revenue_c4
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# -- q18-style large-volume orders ------------------------------------------

def q18_large_orders(sf_dir: str) -> Dataset:
    """Orders whose total lineitem quantity exceeds 150 (GROUP BY + HAVING),
    decorated with customer/price — ONE orderkey-bucket co-location of
    (lineitem per-batch partials + orders rows): the in-bucket kernel sums
    quantity per order, applies the HAVING cut, and attaches the order
    columns that live in the same bucket — no ``Dataset.join`` and no
    corpus-wide per-key groupby (the bucketed exchange ships the same rows
    into B groups instead of |orders| groups).  Only the qualifying rows
    (a ~1e-2 fraction) enter the final global sort.  Returned as a sorted
    Dataset (the result scales with SF, so it never lands on the driver)."""
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    OB = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)

    def li_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["l_orderkey"], pa.int64())
        folded = pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "ok": ok,
                "is_line": pa.array([1] * len(t), pa.int8()),
                "qty": pc.cast(t["l_quantity"], pa.int64()),
                "ck": pa.array([0] * len(t), pa.int64()),
                "price_c2": pa.array([0] * len(t), pa.int64()),
            }
        )
        # map-side combine: lineitem is clustered by orderkey, so the
        # per-batch Arrow group_by collapses ~7 rows/key before the shuffle
        return pa.TableGroupBy(
            folded, ["b", "ok", "is_line", "ck", "price_c2"]
        ).aggregate([("qty", "sum")]).rename_columns(
            ["b", "ok", "is_line", "ck", "price_c2", "qty"]
        )

    def o_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["o_orderkey"], pa.int64())
        return pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "ok": ok,
                "is_line": pa.array([0] * len(t), pa.int8()),
                "ck": pc.cast(t["o_custkey"], pa.int64()),
                "price_c2": _cents(t["o_totalprice"]),
                "qty": pa.array([0] * len(t), pa.int64()),
            }
        )

    def having_fold(g: pd.DataFrame) -> pa.Table:
        li = g[g["is_line"] == 1]
        qty = li.groupby("ok")["qty"].sum()
        big = qty[qty > 150]
        o = g[g["is_line"] == 0].set_index("ok")
        o = o.loc[o.index.intersection(big.index)]
        sq = big.loc[o.index]
        # arrow out: only qualifying rows enter the global sort
        return pa.table(
            {
                "o_orderkey": pa.array(o.index.to_numpy("int64")),
                "o_custkey": pa.array(o["ck"].astype("int64").values),
                "sum_qty": pa.array(sq.astype("int64").values),
                "totalprice_c2": pa.array(o["price_c2"].astype("int64").values),
            }
        )

    return (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(li_rows, batch_format="pyarrow")
        .union(
            _read(
                sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
            ).map_batches(o_rows, batch_format="pyarrow")
        )
        .groupby("b")
        .map_groups(having_fold, batch_format="pandas")
        .sort(["sum_qty", "o_orderkey"], descending=[True, False])
    )


Q18_SQL = """
SELECT CAST(l_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(ROUND(o_totalprice*100) AS BIGINT) AS totalprice_c2
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_orderkey, o_custkey, o_totalprice
HAVING SUM(CAST(l_quantity AS BIGINT)) > 150
ORDER BY sum_qty DESC, o_orderkey
"""


# -- q6-style filtered global aggregate -------------------------------------

def q6_revenue_filtered(sf_dir: str) -> "object":
    """Single-row filtered revenue sum — vectorized predicate inside
    map_batches (pushing the filter into the batch beats ds.filter's per-row
    Python)."""
    import pandas as pd

    import pyarrow.dataset as pads

    # conservative scan prune (float bounds straddle the cent rounding);
    # the exact cent-band mask below remains the semantic predicate
    ds = _read(
        sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_quantity") < 24.0)
        & (pads.field("l_discount") >= 0.044)
        & (pads.field("l_discount") <= 0.076),
    )

    def partial(t: pa.Table) -> pa.Table:
        disc_c2 = _cents(t["l_discount"])
        mask = pc.and_(
            pc.less(t["l_quantity"], 24.0),
            pc.and_(pc.greater_equal(disc_c2, 5), pc.less_equal(disc_c2, 7)),
        )
        sub = t.filter(mask)
        rev = pc.multiply(_cents(sub["l_extendedprice"]), _cents(sub["l_discount"]))
        total = pc.sum(rev).as_py() or 0
        return pa.table({"partial_c4": pa.array([total], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"revenue_c4": [int(parts["partial_c4"].sum())]})


Q6_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_c4
FROM lineitem
WHERE l_quantity < 24
  AND CAST(ROUND(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
"""


# -- q13-style: distribution of orders-per-customer --------------------------

def q13_order_distribution(sf_dir: str) -> "object":
    """How many customers placed exactly N orders, including N = 0 — the
    distribution-of-aggregates pattern (TPC-H q13 without the comment
    filter, which the driver schema lacks).  One |orders| groupby, then a
    per-batch histogram combine so the second shuffle moves <=hundreds of
    (count, customers) partials; the zero row is two O(1) dataset counts,
    never a driver key set."""
    import pandas as pd

    per_cust = (
        _read(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="c_count"))
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        # map-side combine: one row per distinct order-count value
        return (
            pa.table({"c_count": t["c_count"]})
            .group_by("c_count")
            .aggregate([("c_count", "count")])
            .rename_columns(["c_count", "custdist"])
        )

    dist = (
        per_cust.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .to_pandas()  # <= max orders-per-customer rows
    )
    n_customers = _read(sf_dir, "customer", ["c_custkey"]).count()
    n_with_orders = int(dist["custdist"].sum())
    zero = n_customers - n_with_orders
    if zero > 0:
        dist = pd.concat(
            [dist, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    dist["c_count"] = dist["c_count"].astype("int64")
    dist["custdist"] = dist["custdist"].astype("int64")
    return (
        dist.sort_values(["custdist", "c_count"], ascending=[False, False])
        .reset_index(drop=True)
    )


Q13_ORDER_DISTRIBUTION_SQL = """
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# -- q22-style: dormant high-balance customers --------------------------------

def q22_dormant_balance(sf_dir: str) -> "object":
    """Per market segment: customers whose balance exceeds the global
    positive-balance average AND who have no 'P'-status orders — global
    scalar subquery + anti-join (TPC-H q22 adapted: c_phone doesn't exist,
    the segment plays the country-code role).  The global average is two
    O(1) scalars (sum, count) on the driver; the comparison is exact in
    integers (bal_c2 * n_pos > sum_pos_c2); the anti side is the
    pending-custkey set co-located with the rich customers in ONE
    custkey-bucket exchange (the anti-join never ships |orders| rows:
    batch-deduped keys only), as customers_no_orders."""
    import pandas as pd

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])

    def bal_partial(t: pa.Table) -> pa.Table:
        bal = _cents(t["c_acctbal"])
        pos = pc.greater(bal, 0)
        s = pc.sum(pc.if_else(pos, bal, pa.scalar(0, pa.int64()))).as_py() or 0
        n = pc.sum(pc.cast(pos, pa.int64())).as_py() or 0
        return pa.table(
            {
                "sum_pos_c2": pa.array([int(s)], pa.int64()),
                "n_pos": pa.array([int(n)], pa.int64()),
            }
        )

    g = cust.map_batches(bal_partial, batch_format="pyarrow").sum(
        ["sum_pos_c2", "n_pos"]
    )
    sum_pos = int(g["sum(sum_pos_c2)"])
    n_pos = int(g["sum(n_pos)"])

    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    CB = n_buckets(pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows)

    def o_rows(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t["o_orderstatus"], "P"))
        ck = pc.cast(sub["o_custkey"], pa.int64())
        folded = pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ck, CB - 1), pa.int32()),
                "ck": ck,
                "seg": pa.array([""] * len(sub), pa.string()),
                "bal_c2": pa.array([0] * len(sub), pa.int64()),
            }
        )
        # batch-local dedup: the exchange ships distinct pending custkeys
        return pa.TableGroupBy(folded, ["b", "ck", "seg", "bal_c2"]).aggregate([])

    def rich_rows(t: pa.Table) -> pa.Table:
        bal = _cents(t["c_acctbal"])
        # bal > sum/n  <=>  bal * n > sum   (exact integers, n > 0)
        mask = pc.greater(
            pc.multiply(bal, pa.scalar(n_pos, pa.int64())),
            pa.scalar(sum_pos, pa.int64()),
        )
        sub = t.filter(mask)
        ck = pc.cast(sub["c_custkey"], pa.int64())
        return pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ck, CB - 1), pa.int32()),
                "ck": ck,
                "seg": pc.cast(sub["c_mktsegment"], pa.string()),
                "bal_c2": _cents(sub["c_acctbal"]),
            }
        )

    def dormant_fold(g: pd.DataFrame) -> pd.DataFrame:
        pending = set(g.loc[g["seg"] == "", "ck"])
        c = g[g["seg"] != ""]
        c = c[~c["ck"].isin(pending)]
        out = c.groupby("seg", as_index=False).agg(
            numcust=("ck", "size"), totacctbal_c2=("bal_c2", "sum")
        )
        out.columns = ["c_mktsegment", "numcust", "totacctbal_c2"]
        return out  # ≤|segments| rows per bucket

    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
        .map_batches(o_rows, batch_format="pyarrow")
        .union(cust.map_batches(rich_rows, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(dormant_fold, batch_format="pandas")
        .to_pandas()  # ≤|segments|·buckets rows
        .groupby("c_mktsegment", as_index=False)[["numcust", "totacctbal_c2"]]
        .sum()
    )
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal_c2"] = out["totacctbal_c2"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


Q22_DORMANT_SQL = """
WITH avgbal AS (
  SELECT SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS sum_pos_c2,
         COUNT(*) AS n_pos
  FROM customer WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) > 0
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS totacctbal_c2
FROM customer, avgbal
WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) * n_pos > sum_pos_c2
  AND c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# -- q15: top supplier(s) by windowed revenue (view + global-max shape) ------

def q15_top_supplier(sf_dir: str) -> "object":
    """TPC-H q15 adaptation (no partsupp in the driver schema): revenue per
    supplier over a 3-month shipdate window; return every supplier tied at
    the maximum — the CREATE VIEW + MAX scalar-subquery shape.  Map-side
    per-batch combiner folds (suppkey, rev) before the one small groupby;
    the global max is a single driver scalar; winners are a tiny set, so
    supplier names attach via a broadcast winner set instead of a
    ``Dataset.join`` whose sparse side would leave hash partitions empty
    (schemaless-empty-block crash, see verify notes).  Exact in c4 cents.
    Reference parity: SURVEY §2.6 top-k / windowed-aggregate family."""
    from datetime import datetime

    import pandas as pd

    import pyarrow.dataset as pads

    lo = pa.scalar(datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(1996, 4, 1), pa.timestamp("us"))

    li = _read(
        sf_dir, "lineitem",
        ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= datetime(1996, 1, 1))
        & (pads.field("l_shipdate") < datetime(1996, 4, 1)),
    )

    def partial(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].cast(pa.timestamp("us"))
        sub = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        rev = pc.multiply(
            _cents(sub["l_extendedprice"]), pc.subtract(100, _cents(sub["l_discount"]))
        )
        folded = pa.table(
            {"l_suppkey": pc.cast(sub["l_suppkey"], pa.int64()), "rev_c4": rev}
        )
        return pa.TableGroupBy(folded, "l_suppkey").aggregate([("rev_c4", "sum")])

    rev = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("rev_c4_sum", alias_name="total_revenue_c4"))
        .materialize()  # reused twice: max scalar + winner filter
    )
    best = int(rev.max("total_revenue_c4"))
    winners = {
        int(r["l_suppkey"])
        for r in rev.filter(
            expr=f"total_revenue_c4 == {best}"
        ).take_all()  # ties at the max: a handful of rows by construction
    }
    win_ref = ray.put(winners)

    def names(t: pa.Table) -> pa.Table:
        w = ray.get(win_ref)
        keys = pc.cast(t["s_suppkey"], pa.int64())
        mask = pc.is_in(keys, value_set=pa.array(sorted(w), pa.int64()))
        sub = t.filter(mask)
        return pa.table(
            {
                "s_suppkey": pc.cast(sub["s_suppkey"], pa.int64()),
                "s_name": sub["s_name"],
                "total_revenue_c4": pa.array(
                    [best] * len(sub), pa.int64()
                ),
            }
        )

    out = (
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
        .map_batches(names, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("s_suppkey").reset_index(drop=True)


Q15_TOP_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS total_revenue_c4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_revenue_c4 AS BIGINT) AS total_revenue_c4
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue_c4 = (SELECT MAX(total_revenue_c4) FROM revenue)
ORDER BY s_suppkey
"""


# -- q12: late shipments by return flag (join + conditional aggregate) -------

def q12_late_shipments(sf_dir: str) -> "object":
    """TPC-H q12 adaptation (no shipmode/commit/receipt dates in the driver
    schema): lines shipped in 1997 at least 60 days after their order date,
    grouped by ``l_returnflag`` (the 2-3-value mode analog), counting lines
    of high- vs low-priority orders — the CASE-WHEN conditional-count
    shape.  ONE orderkey-bucket co-location (the year filter prunes
    lineitem at the parquet scan BEFORE the exchange): the in-bucket
    kernel joins ship and order dates, applies the lateness predicate, and
    emits ≤3 partial rows per bucket — a corpus-independent driver fold
    finishes.  Reference parity: SURVEY §2.6 conditional-aggregate family
    (status_priority_pivot is the unjoined version)."""
    from datetime import datetime

    import pandas as pd

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ._util import n_buckets

    lo = pa.scalar(datetime(1997, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(1998, 1, 1), pa.timestamp("us"))
    _LATE_US = 60 * 86_400_000_000
    push = (pads.field("l_shipdate") >= datetime(1997, 1, 1)) & (
        pads.field("l_shipdate") < datetime(1998, 1, 1)
    )
    OB = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)
    FLAGS = {"A": 1, "N": 2, "R": 3}

    def li_rows(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].cast(pa.timestamp("us"))
        mask = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        sub = t.filter(mask)
        ok = pc.cast(sub["l_orderkey"], pa.int64())
        flag = pc.case_when(
            pc.make_struct(
                pc.equal(sub["l_returnflag"], "A"),
                pc.equal(sub["l_returnflag"], "N"),
            ),
            1, 2, 3,
        )
        return pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "ok": ok,
                "flag": pc.cast(flag, pa.int64()),
                "us": pc.cast(sub["l_shipdate"].cast(pa.timestamp("us")), pa.int64()),
            }
        )

    def o_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["o_orderkey"], pa.int64())
        pri = t["o_orderpriority"]
        high = pc.or_(pc.equal(pri, "1-URGENT"), pc.equal(pri, "2-HIGH"))
        return pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "ok": ok,
                # flag slot: 0 marks the orders side; -1/-2 carries is_high
                "flag": pc.cast(
                    pc.if_else(high, pa.scalar(-2, pa.int64()),
                               pa.scalar(-1, pa.int64())),
                    pa.int64(),
                ),
                "us": pc.cast(t["o_orderdate"].cast(pa.timestamp("us")), pa.int64()),
            }
        )

    inv_flags = {v: k for k, v in FLAGS.items()}

    def late_fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["flag"] < 0].set_index("ok")
        li = g[g["flag"] > 0]
        ous = li["ok"].map(o["us"])
        keep = ous.notna() & (li["us"] - ous >= _LATE_US)
        sub = li[keep]
        high = (sub["ok"].map(o["flag"]) == -2).astype("int64")
        out = pd.DataFrame(
            {
                "l_returnflag": sub["flag"].map(inv_flags),
                "high_line_count": high,
                "low_line_count": 1 - high,
            }
        )
        return out.groupby("l_returnflag", as_index=False)[
            ["high_line_count", "low_line_count"]
        ].sum()  # ≤3 rows per bucket

    out = (
        _read(
            sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_shipdate"],
            filter=push,
        )
        .map_batches(li_rows, batch_format="pyarrow")
        .union(
            _read(
                sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
            ).map_batches(o_rows, batch_format="pyarrow")
        )
        .groupby("b")
        .map_groups(late_fold, batch_format="pandas")
        .to_pandas()  # ≤3·buckets rows
        .groupby("l_returnflag", as_index=False)[
            ["high_line_count", "low_line_count"]
        ]
        .sum()
    )
    for c in ("high_line_count", "low_line_count"):
        out[c] = out[c].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


Q12_LATE_SHIPMENTS_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


