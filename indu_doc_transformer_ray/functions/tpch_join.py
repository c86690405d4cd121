"""TPC-H multi-way-join queries with dual physical plans under the
broadcast-dimension guard (q3, q5, q7, q8, q17, q19, q21, suppliers_per_type).

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


# -- q3: top orders by revenue for one market segment -----------------------
# customer is the small side -> broadcast; orders|><|lineitem -> Dataset.join
# (hash-partitioned shuffle join, both sides scale with SF).

def q3_top_orders(sf_dir: str) -> "object":
    """Top-10 BUILDING-segment orders by revenue.  Fast plan (customer
    under ``MAX_BROADCAST_DIM_ROWS``): the BUILDING custkey set broadcasts
    once as a sorted int array; orders filter in-stream and lineitem
    pre-folds to per-order revenue partials, so the ONLY exchange is one
    orderkey-bucket co-location whose kernel sums per-order revenue and
    emits its local top-10 — the driver merges O(buckets·10) rows (the
    bounded-heap top-k shape, no global sort stage).  Above the guard the
    original two-``Dataset.join`` + groupby + sort plan runs (customer is
    corpus-proportional at true TPC-H scale).  Tests pin both plans to the
    same oracle hash."""
    import numpy as np
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    if pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows > _rc.MAX_BROADCAST_DIM_ROWS:
        return _q3_join_plan(sf_dir)

    OB = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)
    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .filter(expr="c_mktsegment == 'BUILDING'")
        .select_columns(["c_custkey"])
        .to_pandas()
    )
    keys = np.sort(cust["c_custkey"].to_numpy(np.int64))
    import ray as _ray

    keys_ref = _ray.put(keys)

    def o_rows(t: pa.Table) -> pa.Table:
        import ray as _r

        ks = _r.get(keys_ref)
        ckv = pc.cast(t["o_custkey"], pa.int64()).to_numpy()
        idx = np.clip(np.searchsorted(ks, ckv), 0, max(len(ks) - 1, 0))
        hit = (ks[idx] == ckv) if len(ks) else np.zeros(len(ckv), bool)
        ok = pc.cast(t["o_orderkey"], pa.int64()).to_numpy()[hit]
        return pa.table(
            {
                "b": pa.array((ok & (OB - 1)).astype("int32")),
                "ok": pa.array(ok),
                "is_line": pa.array(np.zeros(len(ok), dtype="int8")),
                "revenue_c4": pa.array(np.zeros(len(ok), dtype="int64")),
            }
        )

    def li_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["l_orderkey"], pa.int64())
        rev = pc.multiply(
            _cents(t["l_extendedprice"]), pc.subtract(100, _cents(t["l_discount"]))
        )
        folded = pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "ok": ok,
                "is_line": pa.array([1] * len(t), pa.int8()),
                "revenue_c4": rev,
            }
        )
        # batch-local per-order combine shrinks the exchange
        return pa.TableGroupBy(folded, ["b", "ok", "is_line"]).aggregate(
            [("revenue_c4", "sum")]
        ).rename_columns(["b", "ok", "is_line", "revenue_c4"])

    def top_fold(g: pd.DataFrame) -> pd.DataFrame:
        keep = set(g.loc[g["is_line"] == 0, "ok"])
        li = g[g["is_line"] == 1]
        li = li[li["ok"].isin(keep)]
        agg = li.groupby("ok", as_index=False)["revenue_c4"].sum()
        return (
            agg.sort_values(["revenue_c4", "ok"], ascending=[False, True])
            .head(10)  # local top-10 -> driver merge is O(buckets*10)
        )

    tops = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        .map_batches(o_rows, batch_format="pyarrow")
        .union(
            _read(
                sf_dir, "lineitem",
                ["l_orderkey", "l_extendedprice", "l_discount"],
            ).map_batches(li_rows, batch_format="pyarrow")
        )
        .groupby("b")
        .map_groups(top_fold, batch_format="pandas")
        .to_pandas()
    )
    out = (
        tops.sort_values(["revenue_c4", "ok"], ascending=[False, True])
        .head(10)
        .rename(columns={"ok": "o_orderkey"})
        .reset_index(drop=True)
        .astype({"o_orderkey": "int64", "revenue_c4": "int64"})
    )
    return out[["o_orderkey", "revenue_c4"]]


def _q3_join_plan(sf_dir: str) -> Dataset:
    """q3 scale path: vectorized customer filter, then orders ⋈ customer
    and lineitem ⋈ orders as hash-partitioned ``Dataset.join``s — no
    driver-side key-set materialization (both join sides scale with SF)."""
    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .filter(expr="c_mktsegment == 'BUILDING'")
        .select_columns(["c_custkey"])
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    building_orders = orders.join(
        cust,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("o_custkey",),
        right_on=("c_custkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    ).select_columns(["o_orderkey"])

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _cents(t["l_extendedprice"]), pc.subtract(100, _cents(t["l_discount"]))
        )
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue_c4": rev})

    li_rev = li.map_batches(revenue, batch_format="pyarrow")
    joined = li_rev.join(
        building_orders,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )
    return (
        joined.groupby("l_orderkey")
        .aggregate(Sum("revenue_c4", alias_name="revenue_c4"))
        .sort(["revenue_c4", "l_orderkey"], descending=[True, False])
        .limit(10)
        .rename_columns({"l_orderkey": "o_orderkey"})
    )


Q3_SQL = """
SELECT o_orderkey,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue_c4 DESC, o_orderkey
LIMIT 10
"""


# -- q5-ish: revenue per nation ---------------------------------------------
# orders ⋈ customer and lineitem ⋈ orders are hash-partitioned Dataset.joins
# (both sides scale with SF); only `nation` — a fixed 25-row dimension — is
# read onto the driver, to decorate the 25-row final aggregate.

def q5_nation_revenue(sf_dir: str) -> "object":
    """Revenue per customer nation.  Fast plan (customer under
    ``MAX_BROADCAST_DIM_ROWS``): the custkey→nation map broadcasts once;
    orders attach the nation in-stream and lineitem pre-folds per-order
    revenue, so the ONLY exchange is one orderkey co-location whose kernel
    emits ≤25 nation partials per bucket — driver fold finishes.  Above
    the guard the two-``Dataset.join`` plan runs.  Tests pin both plans
    to the same oracle hash."""
    import numpy as np
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    if pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows > _rc.MAX_BROADCAST_DIM_ROWS:
        return _q5_join_plan(sf_dir)

    OB = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    ck = np.sort(cust["c_custkey"].to_numpy(np.int64))
    cn = cust.set_index("c_custkey")["c_nationkey"].loc[ck].to_numpy(np.int64)
    maps_ref = ray.put((ck, cn))

    def o_rows(t: pa.Table) -> pa.Table:
        ck_, cn_ = ray.get(maps_ref)
        ckv = pc.cast(t["o_custkey"], pa.int64()).to_numpy()
        idx = np.clip(np.searchsorted(ck_, ckv), 0, max(len(ck_) - 1, 0))
        hit = (ck_[idx] == ckv) if len(ck_) else np.zeros(len(ckv), bool)
        ok = pc.cast(t["o_orderkey"], pa.int64()).to_numpy()[hit]
        return pa.table(
            {
                "b": pa.array((ok & (OB - 1)).astype("int32")),
                "ok": pa.array(ok),
                "is_line": pa.array(np.zeros(len(ok), dtype="int8")),
                "v": pa.array(cn_[idx[hit]]),  # nation rides the value slot
            }
        )

    def li_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["l_orderkey"], pa.int64())
        rev = pc.multiply(
            _cents(t["l_extendedprice"]), pc.subtract(100, _cents(t["l_discount"]))
        )
        folded = pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "ok": ok,
                "is_line": pa.array([1] * len(t), pa.int8()),
                "v": rev,
            }
        )
        # batch-local per-order combine shrinks the exchange
        return pa.TableGroupBy(folded, ["b", "ok", "is_line"]).aggregate(
            [("v", "sum")]
        ).rename_columns(["b", "ok", "is_line", "v"])

    def nation_fold(g: pd.DataFrame) -> pd.DataFrame:
        nat = g.loc[g["is_line"] == 0].set_index("ok")["v"]
        li = g[g["is_line"] == 1]
        n = li["ok"].map(nat)
        keep = n.notna()
        sub = pd.DataFrame(
            {
                "c_nationkey": n[keep].astype("int64"),
                "revenue_c4": li.loc[keep, "v"].astype("int64"),
            }
        )
        return sub.groupby("c_nationkey", as_index=False)["revenue_c4"].sum()

    agg = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(li_rows, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
                o_rows, batch_format="pyarrow"
            )
        )
        .groupby("b")
        .map_groups(nation_fold, batch_format="pandas")
        .to_pandas()  # ≤25·buckets rows, corpus-independent
        .groupby("c_nationkey", as_index=False)["revenue_c4"]
        .sum()
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = agg.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    out = out[["n_name", "revenue_c4"]].sort_values("n_name").reset_index(drop=True)
    out["revenue_c4"] = out["revenue_c4"].astype("int64")
    return out


def _q5_join_plan(sf_dir: str) -> "object":
    """q5 scale path: two hash-partitioned ``Dataset.join``s (customer is
    corpus-proportional at true TPC-H scale)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    o_nation = orders.join(
        cust,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("o_custkey",),
        right_on=("c_custkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    ).select_columns(["o_orderkey", "c_nationkey"])

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _cents(t["l_extendedprice"]), pc.subtract(100, _cents(t["l_discount"]))
        )
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue_c4": rev})

    joined = li.map_batches(revenue, batch_format="pyarrow").join(
        o_nation,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )
    agg = (
        joined.groupby("c_nationkey")
        .aggregate(Sum("revenue_c4", alias_name="revenue_c4"))
        .to_pandas()  # exactly 25 rows — one per nation
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = agg.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    out = out[["n_name", "revenue_c4"]].sort_values("n_name").reset_index(drop=True)
    out["revenue_c4"] = out["revenue_c4"].astype("int64")
    return out


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


# -- q7-ish: nation-pair trade matrix (5-way join) --------------------------

def q7_nation_pairs(sf_dir: str) -> "object":
    """Revenue between every (customer-nation, supplier-nation) pair where
    the two differ — the widest join in the library (lineitem ⋈ orders ⋈
    customer ⋈ supplier ⋈ nation², reference has nothing similar; TPC-H q7
    shape adapted to the driver schema).  Two physical plans, same answer:

    - dims under ``MAX_BROADCAST_DIM_ROWS``: the custkey→nation and
      suppkey→nation maps broadcast once via ``ray.put`` as sorted int
      arrays (searchsorted lookup per batch), so the ONLY key exchange is
      the orderkey co-location of (orders + pre-summed lineitem) — one
      all-to-all total, kernel emits ≤625 nation-pair partials per bucket,
      driver folds O(buckets·625) rows.  11.6s → ~6s at sf0.1/32 CPUs.
    - above the guard (dims are corpus-proportional at true TPC-H scale):
      custkey and suppkey become union + bucketed-groupby co-locations
      (the ``q21_sole_returner`` shape) — three exchanges, nothing
      corpus-sized on the driver.

    Tests pin both plans to the same oracle hash (guard monkeypatched)."""
    import numpy as np
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    LB = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)
    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    n_supp = pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows
    broadcast_dims = max(n_cust, n_supp) <= _rc.MAX_BROADCAST_DIM_ROWS

    if broadcast_dims:
        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
        ck = np.sort(cust["c_custkey"].to_numpy(np.int64))
        cn = cust.set_index("c_custkey")["c_nationkey"].loc[ck].to_numpy(np.int32)
        supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
        sk_ = np.sort(supp["s_suppkey"].to_numpy(np.int64))
        sn = supp.set_index("s_suppkey")["s_nationkey"].loc[sk_].to_numpy(np.int32)
        import ray as _ray

        cust_ref = _ray.put((ck, cn))
        supp_ref = _ray.put((sk_, sn))

        def o_rows(t: pa.Table) -> pa.Table:
            import ray as _r

            keys, nats = _r.get(cust_ref)
            ckv = pc.cast(t["o_custkey"], pa.int64()).to_numpy()
            idx = np.searchsorted(keys, ckv)
            idx = np.clip(idx, 0, len(keys) - 1)
            hit = keys[idx] == ckv
            ok = pc.cast(t["o_orderkey"], pa.int64()).to_numpy()[hit]
            return pa.table(
                {
                    "b": pa.array((ok & (LB - 1)).astype("int32")),
                    "ok": pa.array(ok),
                    "nat": pa.array(nats[idx[hit]]),
                    "rev_c4": pa.array(np.full(hit.sum(), -1, dtype="int64")),
                }
            )

        def l_rows(t: pa.Table) -> pa.Table:
            import ray as _r

            keys, nats = _r.get(supp_ref)
            skv = pc.cast(t["l_suppkey"], pa.int64()).to_numpy()
            idx = np.searchsorted(keys, skv)
            idx = np.clip(idx, 0, len(keys) - 1)
            hit = keys[idx] == skv
            ok = pc.cast(t["l_orderkey"], pa.int64()).to_numpy()[hit]
            rev = pc.multiply(
                _cents(t["l_extendedprice"]),
                pc.subtract(100, _cents(t["l_discount"])),
            ).to_numpy()[hit]
            folded = pa.table(
                {
                    "b": pa.array((ok & (LB - 1)).astype("int32")),
                    "ok": pa.array(ok),
                    "nat": pa.array(nats[idx[hit]]),
                    "rev_c4": pa.array(rev),
                }
            )
            # batch-local (order, supp-nation) combine shrinks the exchange
            return pa.TableGroupBy(folded, ["b", "ok", "nat"]).aggregate(
                [("rev_c4", "sum")]
            ).rename_columns(["b", "ok", "nat", "rev_c4"])

        o_sided = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
            o_rows, batch_format="pyarrow"
        )
        l_sided = _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ).map_batches(l_rows, batch_format="pyarrow")
    else:
        o_sided, l_sided = _q7_colocated_sides(sf_dir, LB)

    def pair_partial(g: pd.DataFrame) -> pd.DataFrame:
        cn_ = g.loc[g["rev_c4"] < 0].set_index("ok")["nat"]
        li = g[g["rev_c4"] >= 0]
        c = li["ok"].map(cn_)
        keep = c.notna() & (c != li["nat"])
        sub = pd.DataFrame(
            {
                "c_nationkey": c[keep].astype("int32"),
                "s_nationkey": li.loc[keep, "nat"].astype("int32"),
                "revenue_c4": li.loc[keep, "rev_c4"].astype("int64"),
            }
        )
        return (
            sub.groupby(["c_nationkey", "s_nationkey"], as_index=False)[
                "revenue_c4"
            ].sum()  # ≤625 rows per bucket -> driver fold, no extra all-to-all
        )

    agg = (
        o_sided.union(l_sided)
        .groupby("b")
        .map_groups(pair_partial, batch_format="pandas")
        .to_pandas()  # ≤625·buckets rows, corpus-independent
        .groupby(["c_nationkey", "s_nationkey"], as_index=False)["revenue_c4"]
        .sum()
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    agg["cust_nation"] = agg["c_nationkey"].map(name)
    agg["supp_nation"] = agg["s_nationkey"].map(name)
    out = (
        agg[["cust_nation", "supp_nation", "revenue_c4"]]
        .sort_values(["cust_nation", "supp_nation"])
        .reset_index(drop=True)
    )
    out["revenue_c4"] = out["revenue_c4"].astype("int64")
    return out


def _q7_colocated_sides(sf_dir: str, LB: int):
    """q7 scale path: attach the nation keys through union + bucketed-
    groupby co-locations on custkey and suppkey (one exchange each) instead
    of driver broadcasts; returns the two orderkey-bucketed sides."""
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    CB = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)

    def orders_rows(t: pa.Table) -> pa.Table:
        ck = pc.cast(t["o_custkey"], pa.int64())
        return pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ck, CB - 1), pa.int32()),
                "key": ck,
                "ok": pc.cast(t["o_orderkey"], pa.int64()),
                "nat": pa.array([-1] * len(t), pa.int32()),
            }
        )

    def cust_rows(t: pa.Table) -> pa.Table:
        ck = pc.cast(t["c_custkey"], pa.int64())
        return pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ck, CB - 1), pa.int32()),
                "key": ck,
                "ok": pa.array([-1] * len(t), pa.int64()),
                "nat": pc.cast(t["c_nationkey"], pa.int32()),
            }
        )

    def attach_cnat(g: pd.DataFrame) -> pa.Table:
        nat = g.loc[g["ok"] < 0].set_index("key")["nat"]
        o = g[g["ok"] >= 0]
        cn = o["key"].map(nat)
        keep = cn.notna()
        ok = o.loc[keep, "ok"].astype("int64")
        return pa.table(
            {
                "b": pa.array((ok.values & (LB - 1)).astype("int32")),
                "ok": pa.array(ok.values),
                "nat": pa.array(cn[keep].astype("int32").values),
                "rev_c4": pa.array([-1] * int(keep.sum()), pa.int64()),
            }
        )

    o_sided = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        .map_batches(orders_rows, batch_format="pyarrow")
        .union(
            _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
                cust_rows, batch_format="pyarrow"
            )
        )
        .groupby("b")
        .map_groups(attach_cnat, batch_format="pandas")
    )

    def line_rows(t: pa.Table) -> pa.Table:
        sk = pc.cast(t["l_suppkey"], pa.int64())
        rev = pc.multiply(
            _cents(t["l_extendedprice"]), pc.subtract(100, _cents(t["l_discount"]))
        )
        folded = pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(sk, LB - 1), pa.int32()),
                "key": sk,
                "ok": pc.cast(t["l_orderkey"], pa.int64()),
                "nat": pa.array([-1] * len(t), pa.int32()),
                "rev_c4": rev,
            }
        )
        return pa.TableGroupBy(folded, ["b", "key", "ok", "nat"]).aggregate(
            [("rev_c4", "sum")]
        ).rename_columns(["b", "key", "ok", "nat", "rev_c4"])

    def supp_rows(t: pa.Table) -> pa.Table:
        sk = pc.cast(t["s_suppkey"], pa.int64())
        return pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(sk, LB - 1), pa.int32()),
                "key": sk,
                "ok": pa.array([-1] * len(t), pa.int64()),
                "nat": pc.cast(t["s_nationkey"], pa.int32()),
                "rev_c4": pa.array([0] * len(t), pa.int64()),
            }
        )

    def attach_snat(g: pd.DataFrame) -> pa.Table:
        nat = g.loc[g["ok"] < 0].set_index("key")["nat"]
        li = g[g["ok"] >= 0]
        sn = li["key"].map(nat)
        keep = sn.notna()
        li = li[keep]
        out = (
            pd.DataFrame(
                {
                    "ok": li["ok"].astype("int64"),
                    "nat": sn[keep].astype("int32"),
                    "rev_c4": li["rev_c4"].astype("int64"),
                }
            )
            .groupby(["ok", "nat"], as_index=False)["rev_c4"]
            .sum()  # (order, supp-nation) grain before the orderkey exchange
        )
        return pa.table(
            {
                "b": pa.array((out["ok"].values & (LB - 1)).astype("int32")),
                "ok": pa.array(out["ok"].astype("int64").values),
                "nat": pa.array(out["nat"].astype("int32").values),
                "rev_c4": pa.array(out["rev_c4"].astype("int64").values),
            }
        )

    l_sided = (
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(line_rows, batch_format="pyarrow")
        .union(
            _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
                supp_rows, batch_format="pyarrow"
            )
        )
        .groupby("b")
        .map_groups(attach_snat, batch_format="pandas")
    )
    return o_sided, l_sided


Q7_NATION_PAIRS_SQL = """
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation cn ON c_nationkey = cn.n_nationkey
              JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_nationkey <> sn.n_nationkey
GROUP BY cn.n_name, sn.n_name
ORDER BY cust_nation, supp_nation
"""


# -- q19-ish: disjunctive predicate join ------------------------------------

def q19_disjunctive(sf_dir: str) -> "object":
    """Revenue under an OR of brand/size/quantity conjunctions (TPC-H q19
    shape adapted to the driver schema) — exercises disjunctive predicate
    evaluation AFTER a join: the filter needs columns from both sides, so
    it cannot be pushed below the join; it IS pushed into the first
    map_batches above the join, and the per-clause masks are vectorized
    Arrow kernels combined with ``pc.or_``."""
    import pandas as pd

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    if _dim_rows(sf_dir, "part") <= _rc.MAX_BROADCAST_DIM_ROWS:
        # fast plan: the (brand, size) attribute map broadcasts once and
        # the disjunction evaluates in-stream — ZERO exchanges; per-batch
        # scalar partials fold on the driver
        return _q19_broadcast(sf_dir, li)
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    joined = li.join(
        part,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_partkey",),
        right_on=("p_partkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )

    clauses = [
        ("Brand#1", 1, 10, 1.0, 15.0),
        ("Brand#2", 1, 20, 10.0, 25.0),
        ("Brand#3", 1, 30, 20.0, 35.0),
    ]

    def partial(t: pa.Table) -> pa.Table:
        mask = None
        for brand, s_lo, s_hi, q_lo, q_hi in clauses:
            m = pc.and_(
                pc.equal(t["p_brand"], brand),
                pc.and_(
                    pc.and_(
                        pc.greater_equal(t["p_size"], s_lo),
                        pc.less_equal(t["p_size"], s_hi),
                    ),
                    pc.and_(
                        pc.greater_equal(t["l_quantity"], q_lo),
                        pc.less_equal(t["l_quantity"], q_hi),
                    ),
                ),
            )
            mask = m if mask is None else pc.or_(mask, m)
        sub = t.filter(mask)
        rev = pc.multiply(
            _cents(sub["l_extendedprice"]), pc.subtract(100, _cents(sub["l_discount"]))
        )
        return pa.table(
            {
                "revenue_c4": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
                "n_items": pa.array([sub.num_rows], pa.int64()),
            }
        )

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "revenue_c4": [int(parts["revenue_c4"].sum())],
            "n_items": [int(parts["n_items"].sum())],
        }
    )


def _q19_broadcast(sf_dir: str, li: Dataset) -> "object":
    import numpy as np
    import pandas as pd

    pk, vals = _dim_lookup(sf_dir, "part", "p_partkey", ["p_brand", "p_size"])
    maps_ref = ray.put((pk, vals["p_brand"], vals["p_size"].astype("int64")))
    clauses = [
        ("Brand#1", 1, 10, 1.0, 15.0),
        ("Brand#2", 1, 20, 10.0, 25.0),
        ("Brand#3", 1, 30, 20.0, 35.0),
    ]

    def partial(t: pa.Table) -> pa.Table:
        pk_, pb_, ps_ = ray.get(maps_ref)
        pkv = pc.cast(t["l_partkey"], pa.int64()).to_numpy()
        hit, hidx = _lookup_hits(pk_, pkv)
        sub = t.filter(pa.array(hit))
        brand, size = pb_[hidx], ps_[hidx]
        qty = sub["l_quantity"].to_numpy()
        mask = np.zeros(len(sub), bool)
        for b, s_lo, s_hi, q_lo, q_hi in clauses:
            mask |= (
                (brand == b) & (size >= s_lo) & (size <= s_hi)
                & (qty >= q_lo) & (qty <= q_hi)
            )
        rev = pc.multiply(
            _cents(sub["l_extendedprice"]),
            pc.subtract(100, _cents(sub["l_discount"])),
        ).to_numpy()
        return pa.table(
            {
                "revenue_c4": pa.array([int(rev[mask].sum())], pa.int64()),
                "n_items": pa.array([int(mask.sum())], pa.int64()),
            }
        )

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "revenue_c4": [int(parts["revenue_c4"].sum())],
            "n_items": [int(parts["n_items"].sum())],
        }
    )


Q19_DISJUNCTIVE_SQL = """
SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))), 0) AS BIGINT) AS revenue_c4,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 35)
"""


# -- q16-ish: distinct suppliers per part type over a join ------------------

def suppliers_per_type(sf_dir: str) -> "object":
    """COUNT(DISTINCT supplier) per part type ACROSS a fact join (TPC-H q16
    shape on the driver schema): lineitem ⋈ part, then the two-level
    dedup-then-count groupby (same scalable COUNT(DISTINCT) pattern as
    distinct_suppliers_per_nation, but the dedup input scales with SF).  A
    per-batch Arrow ``group_by`` pre-dedups (type, suppkey) pairs before
    the shuffle — lineitem repeats each pair many times, so the exchange
    carries near-distinct rows only."""
    import pandas as pd

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    if _dim_rows(sf_dir, "part") <= _rc.MAX_BROADCAST_DIM_ROWS:
        # fast plan: partkey->type broadcasts once; the one exchange is the
        # dedup groupby over batch-pre-deduped (type, supp) combos
        pk, vals = _dim_lookup(sf_dir, "part", "p_partkey", ["p_type"])
        maps_ref = ray.put((pk, vals["p_type"]))

        def local_dedup(t: pa.Table) -> pa.Table:
            pk_, pt_ = ray.get(maps_ref)
            pkv = pc.cast(t["l_partkey"], pa.int64()).to_numpy()
            hit, hidx = _lookup_hits(pk_, pkv)
            sub = t.filter(pa.array(hit))
            folded = pa.table(
                {
                    "p_type": pa.array(pt_[hidx], pa.string()),
                    "l_suppkey": pc.cast(sub["l_suppkey"], pa.int64()),
                }
            )
            return folded.group_by(["p_type", "l_suppkey"]).aggregate([])

        deduped_src = li.map_batches(local_dedup, batch_format="pyarrow")
    else:
        part = _read(sf_dir, "part", ["p_partkey", "p_type"])
        joined = li.join(
            part,
            join_type="inner",
            num_partitions=join_partitions(),
            on=("l_partkey",),
            right_on=("p_partkey",),
            aggregator_ray_remote_args={"num_cpus": 0},
        )

        def local_dedup(t: pa.Table) -> pa.Table:
            return (
                t.select(["p_type", "l_suppkey"])
                .group_by(["p_type", "l_suppkey"])
                .aggregate([])
            )

        deduped_src = joined.map_batches(local_dedup, batch_format="pyarrow")

    dedup = (
        deduped_src
        .groupby(["p_type", "l_suppkey"])
        .aggregate(Count(alias_name="_c"))
    )
    out = (
        dedup.groupby("p_type")
        .aggregate(Count(alias_name="n_suppliers"))
        .to_pandas()  # 6 part types
    )
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    return out.sort_values("p_type").reset_index(drop=True)[
        ["p_type", "n_suppliers"]
    ]


SUPPLIERS_PER_TYPE_SQL = """
SELECT p_type, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_type ORDER BY p_type
"""


# -- q8-style: per-year market share of one supplier nation ------------------

def q8_market_share(sf_dir: str) -> "object":
    """Per order-year PROMO-part revenue in region ASIA, split into the
    share supplied by NATION_5 vs the total (TPC-H q8 shape adapted to the
    driver schema; the reference has no relational surface).  Fast plan
    (dims under ``MAX_BROADCAST_DIM_ROWS``): the PROMO partkey set, the
    supplier nation map, and the customer nation map broadcast once via
    ``ray.put``; lineitem pre-folds (orderkey, is-target-nation) revenue
    and orders pre-filter to ASIA years in-stream, so the ONLY exchange is
    one orderkey co-location emitting ≤7-year partials per bucket — a
    corpus-independent driver fold finishes.  Above the guard the original
    four-``Dataset.join`` tree runs.  The ratio is emitted as two exact
    integer sums (nation_c4, total_c4) so the oracle hash-matches — a
    float division would differ in the last ulp."""
    import numpy as np
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    n_part = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
    n_supp = pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows
    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    if max(n_part, n_supp, n_cust) > _rc.MAX_BROADCAST_DIM_ROWS:
        return _q8_join_plan(sf_dir)

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia_key = int(region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    asia_nations = set(
        int(k) for k in nation.loc[nation["n_regionkey"] == asia_key, "n_nationkey"]
    )
    target_nation = int(
        nation.loc[nation["n_name"] == "NATION_5", "n_nationkey"].iloc[0]
    )

    OB = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    pk = np.sort(
        part.loc[part["p_type"] == "PROMO", "p_partkey"].to_numpy(np.int64)
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sk = np.sort(supp["s_suppkey"].to_numpy(np.int64))
    sn = supp.set_index("s_suppkey")["s_nationkey"].loc[sk].to_numpy(np.int64)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    ak = np.sort(
        cust.loc[cust["c_nationkey"].isin(asia_nations), "c_custkey"].to_numpy(
            np.int64
        )
    )
    maps_ref = ray.put((pk, sk, sn, ak))

    def li_rows(t: pa.Table) -> pa.Table:
        pk_, sk_, sn_, _ak = ray.get(maps_ref)
        pkv = pc.cast(t["l_partkey"], pa.int64()).to_numpy()
        pidx = np.clip(np.searchsorted(pk_, pkv), 0, max(len(pk_) - 1, 0))
        hit = (pk_[pidx] == pkv) if len(pk_) else np.zeros(len(pkv), bool)
        sub = t.filter(pa.array(hit))
        skv = pc.cast(sub["l_suppkey"], pa.int64()).to_numpy()
        sidx = np.clip(np.searchsorted(sk_, skv), 0, max(len(sk_) - 1, 0))
        shit = (sk_[sidx] == skv) if len(sk_) else np.zeros(len(skv), bool)
        sub = sub.filter(pa.array(shit))
        rev = pc.multiply(
            _cents(sub["l_extendedprice"]),
            pc.subtract(100, _cents(sub["l_discount"])),
        ).to_numpy()
        is_t = sn_[sidx[shit]] == target_nation
        ok = pc.cast(sub["l_orderkey"], pa.int64()).to_numpy()
        folded = pa.table(
            {
                "b": pa.array((ok & (OB - 1)).astype("int32")),
                "ok": pa.array(ok),
                "is_line": pa.array(np.ones(len(ok), dtype="int8")),
                "nation_c4": pa.array(np.where(is_t, rev, 0)),
                "total_c4": pa.array(rev),
            }
        )
        # batch-local per-order combine shrinks the exchange
        return pa.TableGroupBy(folded, ["b", "ok", "is_line"]).aggregate(
            [("nation_c4", "sum"), ("total_c4", "sum")]
        ).rename_columns(["b", "ok", "is_line", "nation_c4", "total_c4"])

    def o_rows(t: pa.Table) -> pa.Table:
        _pk, _sk, _sn, ak_ = ray.get(maps_ref)
        ckv = pc.cast(t["o_custkey"], pa.int64()).to_numpy()
        idx = np.clip(np.searchsorted(ak_, ckv), 0, max(len(ak_) - 1, 0))
        hit = (ak_[idx] == ckv) if len(ak_) else np.zeros(len(ckv), bool)
        sub = t.filter(pa.array(hit))
        ok = pc.cast(sub["o_orderkey"], pa.int64()).to_numpy()
        yr = pc.cast(pc.year(sub["o_orderdate"]), pa.int64()).to_numpy()
        return pa.table(
            {
                "b": pa.array((ok & (OB - 1)).astype("int32")),
                "ok": pa.array(ok),
                "is_line": pa.array(np.zeros(len(ok), dtype="int8")),
                "nation_c4": pa.array(yr),  # year rides the nation slot
                "total_c4": pa.array(np.zeros(len(ok), dtype="int64")),
            }
        )

    def year_fold(g: pd.DataFrame) -> pd.DataFrame:
        yr = g.loc[g["is_line"] == 0].set_index("ok")["nation_c4"]
        li = g[g["is_line"] == 1]
        y = li["ok"].map(yr)
        keep = y.notna()
        sub = pd.DataFrame(
            {
                "o_year": y[keep].astype("int64"),
                "nation_c4": li.loc[keep, "nation_c4"].astype("int64"),
                "total_c4": li.loc[keep, "total_c4"].astype("int64"),
            }
        )
        return sub.groupby("o_year", as_index=False)[
            ["nation_c4", "total_c4"]
        ].sum()  # ≤7 rows per bucket

    out = (
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey",
             "l_extendedprice", "l_discount"],
        )
        .map_batches(li_rows, batch_format="pyarrow")
        .union(
            _read(
                sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
            ).map_batches(o_rows, batch_format="pyarrow")
        )
        .groupby("b")
        .map_groups(year_fold, batch_format="pandas")
        .to_pandas()  # corpus-independent driver fold
        .groupby("o_year", as_index=False)[["nation_c4", "total_c4"]]
        .sum()
    )
    for c in ("nation_c4", "total_c4"):
        out[c] = out[c].astype("int64")
    return out.sort_values("o_year").reset_index(drop=True)


def _q8_join_plan(sf_dir: str) -> "object":
    """Per order-year PROMO-part revenue in region ASIA, split into the
    share supplied by NATION_5 vs the total (TPC-H q8 shape adapted to the
    driver schema; the reference has no relational surface).  All three
    fact joins are hash-partitioned ``Dataset.join``s; nation/region (25 +
    5 fixed rows) are driver-side lookups via ``ray.put`` broadcast.  The
    ratio is emitted as two exact integer sums (nation_c4, total_c4) so the
    oracle hash-matches — a float division would differ in the last ulp."""
    import pandas as pd

    # ASIA customer nations (<=25 keys) and the target supplier nation:
    # tiny fixed dimensions -> resolved on the driver, broadcast into tasks.
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia_key = int(region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    asia_nations = set(
        int(k) for k in nation.loc[nation["n_regionkey"] == asia_key, "n_nationkey"]
    )
    target_nation = int(
        nation.loc[nation["n_name"] == "NATION_5", "n_nationkey"].iloc[0]
    )
    asia_ref = ray.put(asia_nations)

    promo_parts = (
        _read(sf_dir, "part", ["p_partkey", "p_type"])
        .filter(expr="p_type == 'PROMO'")
        .select_columns(["p_partkey"])
    )
    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li_promo = li.join(
        promo_parts,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_partkey",),
        right_on=("p_partkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    li_supp = li_promo.join(
        supp,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_suppkey",),
        right_on=("s_suppkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    o_cust = orders.join(
        cust,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("o_custkey",),
        right_on=("c_custkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )

    class AsiaYears:
        """Actor-pool stage: the ASIA nation-key set is fetched from the
        object store once per actor, not re-shipped per batch."""

        def __init__(self, asia_ref):
            self.asia = ray.get(asia_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pc.is_in(
                pc.cast(t["c_nationkey"], pa.int64()),
                value_set=pa.array(sorted(self.asia), pa.int64()),
            )
            sub = t.filter(mask)
            year = pc.year(sub["o_orderdate"])
            return pa.table(
                {
                    "o_orderkey": sub["o_orderkey"],
                    "o_year": pc.cast(year, pa.int64()),
                }
            )

    o_asia = o_cust.map_batches(
        AsiaYears, fn_constructor_args=(asia_ref,),
        batch_format="pyarrow", concurrency=(1, 4),
    )

    joined = li_supp.join(
        o_asia,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )

    def year_partial(t: pa.Table) -> pa.Table:
        # map-side combine: <=7 years per batch regardless of batch size
        rev = pc.multiply(
            _cents(t["l_extendedprice"]), pc.subtract(100, _cents(t["l_discount"]))
        )
        is_target = pc.equal(pc.cast(t["s_nationkey"], pa.int64()), target_nation)
        nat_rev = pc.if_else(is_target, rev, pa.scalar(0, pa.int64()))
        part = pa.table(
            {"o_year": t["o_year"], "nation_c4": nat_rev, "total_c4": rev}
        )
        return (
            part.group_by("o_year")
            .aggregate([("nation_c4", "sum"), ("total_c4", "sum")])
            .rename_columns(["o_year", "nation_c4", "total_c4"])
        )

    out = (
        joined.map_batches(year_partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(
            Sum("nation_c4", alias_name="nation_c4"),
            Sum("total_c4", alias_name="total_c4"),
        )
        .to_pandas()  # <=7 rows
    )
    for c in ("nation_c4", "total_c4"):
        out[c] = out[c].astype("int64")
    return out.sort_values("o_year").reset_index(drop=True)


Q8_MARKET_SHARE_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
                THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                ELSE 0 END) AS BIGINT) AS nation_c4,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS total_c4
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
GROUP BY o_year
ORDER BY o_year
"""


# -- q17-style: revenue from small-quantity orders of one brand --------------

def q17_small_qty_revenue(sf_dir: str) -> "object":
    """Total price of Brand#13 lineitems whose quantity is below 20% of
    that part's average quantity — the correlated-scalar-subquery pattern
    (TPC-H q17 adapted: p_container doesn't exist in the driver schema).
    Fast plan (part under ``MAX_BROADCAST_DIM_ROWS``): the Brand#13
    partkey set broadcasts once; every row of a part co-locates in ONE
    partkey-bucket exchange whose kernel computes the per-part average AND
    the small-quantity test together (the correlated aggregate never
    leaves the bucket), emitting one partial row per bucket — driver sum
    finishes.  Above the guard: brand join, per-part aggregate, join-back
    (the original plan).  The comparison runs in exact integers —
    qty < 0.2*avg  <=>  5*qty_c2*cnt < sum_qty_c2 — so the oracle
    hash-matches."""
    import numpy as np
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    if pq.read_metadata(f"{sf_dir}/part.parquet").num_rows > _rc.MAX_BROADCAST_DIM_ROWS:
        return _q17_join_plan(sf_dir)

    PB = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    pk = np.sort(
        part.loc[part["p_brand"] == "Brand#13", "p_partkey"].to_numpy(np.int64)
    )
    keys_ref = ray.put(pk)

    def li_rows(t: pa.Table) -> pa.Table:
        pk_ = ray.get(keys_ref)
        pkv = pc.cast(t["l_partkey"], pa.int64()).to_numpy()
        idx = np.clip(np.searchsorted(pk_, pkv), 0, max(len(pk_) - 1, 0))
        hit = (pk_[idx] == pkv) if len(pk_) else np.zeros(len(pkv), bool)
        sub = t.filter(pa.array(hit))
        key = pc.cast(sub["l_partkey"], pa.int64())
        return pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(key, PB - 1), pa.int32()),
                "pk": key,
                "qty_c2": _cents(sub["l_quantity"]),
                "price_c2": _cents(sub["l_extendedprice"]),
            }
        )

    def small_fold(g: pd.DataFrame) -> pd.DataFrame:
        by = g.groupby("pk")["qty_c2"]
        s = by.transform("sum")
        n = by.transform("size")
        # qty < 0.2 * (sum/cnt)  <=>  5 * qty * cnt < sum  (exact integers)
        small = 5 * g["qty_c2"] * n < s
        return pd.DataFrame(
            {
                "total_price_c2": [int(g.loc[small, "price_c2"].sum())],
                "n_small": [int(small.sum())],
            }
        )

    out = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(li_rows, batch_format="pyarrow")
        .groupby("b")
        .map_groups(small_fold, batch_format="pandas")
        .to_pandas()  # one row per bucket
    )
    return pd.DataFrame(
        {
            "total_price_c2": [int(out["total_price_c2"].sum())],
            "n_small": [int(out["n_small"].sum())],
        }
    )


def _q17_join_plan(sf_dir: str) -> "object":
    """Total price of Brand#13 lineitems whose quantity is below 20% of
    that part's average quantity — the correlated-scalar-subquery pattern
    (TPC-H q17 adapted: p_container doesn't exist in the driver schema).
    The per-part average is a second |lineitem_filtered| aggregate joined
    back by partkey (NOT broadcast: the brand slice scales with SF); the
    comparison runs in exact integers — qty < 0.2*avg  <=>
    5*qty_c2*cnt < sum_qty_c2 — so the oracle hash-matches."""
    import pandas as pd

    brand_parts = (
        _read(sf_dir, "part", ["p_partkey", "p_brand"])
        .filter(expr="p_brand == 'Brand#13'")
        .select_columns(["p_partkey"])
    )
    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
    )
    li_brand = li.join(
        brand_parts,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_partkey",),
        right_on=("p_partkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )

    def qty_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "qty_c2": _cents(t["l_quantity"]),
                "price_c2": _cents(t["l_extendedprice"]),
            }
        )

    li_q = li_brand.map_batches(qty_partial, batch_format="pyarrow")
    per_part = li_q.groupby("l_partkey").aggregate(
        Sum("qty_c2", alias_name="sum_qty_c2"),
        Count(alias_name="n_li"),
    )
    joined = li_q.join(
        per_part,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_partkey",),
        right_on=("l_partkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )

    def small_qty(t: pa.Table) -> pa.Table:
        # qty < 0.2 * (sum/cnt)  <=>  5 * qty * cnt < sum   (exact integers)
        lhs = pc.multiply(
            pc.multiply(t["qty_c2"], pa.scalar(5, pa.int64())), t["n_li"]
        )
        mask = pc.less(lhs, t["sum_qty_c2"])
        sub = t.filter(mask)
        total = pc.sum(sub["price_c2"]).as_py() or 0
        return pa.table(
            {
                "total_price_c2": pa.array([int(total)], pa.int64()),
                "n_small": pa.array([sub.num_rows], pa.int64()),
            }
        )

    agg = (
        joined.map_batches(small_qty, batch_format="pyarrow")
        .sum(["total_price_c2", "n_small"])
    )
    return pd.DataFrame(
        {
            "total_price_c2": [int(agg["sum(total_price_c2)"])],
            "n_small": [int(agg["sum(n_small)"])],
        }
    )


Q17_SMALL_QTY_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(ROUND(l_quantity*100) AS BIGINT) AS qty_c2,
         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c2
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'
), pp AS (
  SELECT l_partkey, SUM(qty_c2) AS sum_qty_c2, COUNT(*) AS n_li
  FROM li GROUP BY l_partkey
)
SELECT CAST(COALESCE(SUM(price_c2), 0) AS BIGINT) AS total_price_c2,
       CAST(COUNT(*) AS BIGINT) AS n_small
FROM li JOIN pp USING (l_partkey)
WHERE 5 * qty_c2 * n_li < sum_qty_c2
"""


# -- q21: sole-returner suppliers (multi-exists / not-exists shape) ----------

def q21_sole_returner(sf_dir: str) -> "object":
    """TPC-H q21 adaptation (no commit/receipt dates in the driver schema —
    ``l_returnflag='R'`` plays the late-delivery role): suppliers counted
    per order where they returned a line, the order touches >=2 distinct
    suppliers (EXISTS other supplier), and NO other supplier returned
    (NOT EXISTS) — the double-correlated-subquery shape.  Both correlated
    aggregates live at the same (order, supplier) grain, so ONE order-
    bucket co-location answers them: the in-bucket kernel dedups (ok, sk)
    exactly, computes per-order supplier/return counts with vectorized
    groupby-transforms, and emits only winning supplier rows — no
    ``Dataset.join``, no second aggregate pass (the first version paid a
    2-sided shuffle join + extra groupby: 28.8s at sf0.1/32 CPUs; this is
    3 all-to-alls total).  Supplier names attach through the union +
    bucketed groupby co-location fold (the sparse-side-safe join, see
    functions/dedup.py::minhash_lsh_pairs); each bucket emits only its
    local top-20 so the driver merge is O(buckets * 20).  Output: top 20
    by (numwait DESC, s_name ASC) — a total order, s_name is unique."""
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])
    OB = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)

    def grain(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["l_orderkey"], pa.int64())
        folded = pa.table(
            {
                "ob": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "ok": ok,
                "sk": pc.cast(t["l_suppkey"], pa.int64()),
                "r": pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64()),
            }
        )
        return pa.TableGroupBy(folded, ["ob", "ok", "sk"]).aggregate(
            [("r", "max")]
        )

    def order_fold(g: pd.DataFrame) -> pa.Table:
        g = g.groupby(["ok", "sk"], as_index=False)["r_max"].max()
        by_ok = g.groupby("ok")["r_max"]
        n_supp = by_ok.transform("size")
        n_ret = by_ok.transform("sum")
        w = g[(g["r_max"] == 1) & (n_supp >= 2) & (n_ret == 1)]
        # arrow out: the numwait Count shuffle sorts these blocks
        return pa.table({"sk": pa.array(w["sk"].astype("int64").values)})

    waits = (
        li.map_batches(grain, batch_format="pyarrow")
        .groupby("ob")
        .map_groups(order_fold, batch_format="pandas")
        .groupby("sk")
        .aggregate(Count(alias_name="numwait"))
    )

    BUCKETS = n_buckets(
        pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows
    )

    # the union sides both emit ARROW (a union rejects mixed block types,
    # and pandas blocks pay ~13x through the bucket groupby)
    def wait_rows(t: pa.Table) -> pa.Table:
        sk = pc.cast(t["sk"], pa.int64())
        return pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(sk, BUCKETS - 1), pa.int32()),
                "sk": sk,
                "s_name": pa.array([""] * len(t), pa.string()),
                "numwait": pc.cast(t["numwait"], pa.int64()),
            }
        )

    def name_rows(t: pa.Table) -> pa.Table:
        sk = pc.cast(t["s_suppkey"], pa.int64())
        return pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(sk, BUCKETS - 1), pa.int32()),
                "sk": sk,
                "s_name": pc.cast(t["s_name"], pa.string()),
                "numwait": pa.array([-1] * len(t), pa.int64()),
            }
        )

    names = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
        name_rows, batch_format="pyarrow"
    )

    def fold_top(g: pd.DataFrame) -> pd.DataFrame:
        nm = g[g["numwait"] < 0].set_index("sk")["s_name"]
        w = g[g["numwait"] >= 0]
        out = pd.DataFrame(
            {
                "s_name": w["sk"].map(nm).astype("object"),
                "numwait": w["numwait"].astype("int64"),
            }
        )
        return out.sort_values(
            ["numwait", "s_name"], ascending=[False, True]
        ).head(20)

    tops = (
        waits.map_batches(wait_rows, batch_format="pyarrow")
        .union(names)
        .groupby("b")
        .map_groups(fold_top, batch_format="pandas")
        .to_pandas()  # <= 20 * BUCKETS rows
    )
    return (
        tops.sort_values(["numwait", "s_name"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )


Q21_SOLE_RETURNER_SQL = """
WITH los AS (
  SELECT l_orderkey AS ok, l_suppkey AS sk,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
  FROM lineitem GROUP BY 1, 2),
per_order AS (
  SELECT ok, COUNT(*) AS n_supp, SUM(has_r) AS n_ret FROM los GROUP BY ok)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM los JOIN per_order USING (ok) JOIN supplier ON s_suppkey = sk
WHERE has_r = 1 AND n_supp >= 2 AND n_ret = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


