"""Set operations, anti/semi joins, sampling and per-group top-k
(union-distinct, EXCEPT/INTERSECT, customers_no_orders, bloom_semi_join,
hash sampling, top-k per group/global).

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


# -- sort / top-k -----------------------------------------------------------

def top_parts_by_price(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])

    def scale(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "p_name": t["p_name"],
                "price_c2": _cents(t["p_retailprice"]),
            }
        )

    return (
        ds.map_batches(scale, batch_format="pyarrow")
        .sort(["price_c2", "p_partkey"], descending=[True, False])
        .limit(20)
    )


TOP_PARTS_SQL = """
SELECT p_partkey, p_name, CAST(ROUND(p_retailprice*100) AS BIGINT) AS price_c2
FROM part
ORDER BY price_c2 DESC, p_partkey
LIMIT 20
"""


# -- anti-join: customers with no orders ------------------------------------

def customers_no_orders(sf_dir: str) -> "object":
    """Per-nation count of customers with NO pending ('P') orders — the
    anti-join surface as ONE custkey-bucket co-location: the filtered
    orders side ships batch-deduped custkeys, customers co-locate by the
    same bucket, and the kernel counts per nation the customers absent
    from the pending set (≤25 partial rows per bucket — driver fold).
    No ``Dataset.join`` and no |customers|-key aggregate exchange.  The
    'P' filter keeps the anti set non-empty on the synthetic data (every
    customer has SOME order)."""
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
                "nat": pa.array([-1] * len(sub), pa.int64()),
            }
        )
        # batch-local dedup: the exchange ships distinct pending custkeys
        return pa.TableGroupBy(folded, ["b", "ck", "nat"]).aggregate([])

    def c_rows(t: pa.Table) -> pa.Table:
        ck = pc.cast(t["c_custkey"], pa.int64())
        return pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ck, CB - 1), pa.int32()),
                "ck": ck,
                "nat": pc.cast(t["c_nationkey"], pa.int64()),
            }
        )

    def anti_fold(g: pd.DataFrame) -> pd.DataFrame:
        pending = set(g.loc[g["nat"] < 0, "ck"])
        c = g[g["nat"] >= 0]
        c = c[~c["ck"].isin(pending)]
        out = c.groupby("nat", as_index=False).size()
        out.columns = ["c_nationkey", "n_customers"]
        return out  # ≤25 rows per bucket

    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
        .map_batches(o_rows, batch_format="pyarrow")
        .union(
            _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
                c_rows, batch_format="pyarrow"
            )
        )
        .groupby("b")
        .map_groups(anti_fold, batch_format="pandas")
        .to_pandas()  # ≤25·buckets rows
        .groupby("c_nationkey", as_index=False)["n_customers"]
        .sum()
        .astype({"c_nationkey": "int64", "n_customers": "int64"})
    )
    return out.reset_index(drop=True)


CUSTOMERS_NO_ORDERS_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer ANTI JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
  ON c_custkey = o.o_custkey
GROUP BY c_nationkey
"""


# -- top-k per group (window-function shape) --------------------------------

def top2_orders_per_customer(sf_dir: str) -> Dataset:
    """Top-2 orders per customer by total price — the distributed
    row_number()-per-partition pattern.  The groupby key is a coarse
    customer bucket; one map_groups call ranks every customer in the bucket
    with ONE vectorized pandas groupby-rank (per-customer Python calls
    would dominate at millions of customers).  Returned as a sorted
    Dataset, never materialized on the driver."""
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    # derived from the orders row count (metadata only): ~64k rows per
    # in-bucket pandas frame at any scale, power of two for the bit-and
    BUCKETS = n_buckets(
        pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    )
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def scale(t: pa.Table) -> pa.Table:
        cust = pc.cast(t["o_custkey"], pa.int64())
        return pa.table(
            {
                "cb": pc.cast(
                    pc.bit_wise_and(cust, BUCKETS - 1), pa.int32()
                ),
                "o_custkey": cust,
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "totalprice_c2": _cents(t["o_totalprice"]),
            }
        )

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "totalprice_c2", "o_orderkey"],
            ascending=[True, False, True],
        )
        g = g.assign(rk=g.groupby("o_custkey").cumcount() + 1)
        g = g[g["rk"] <= 2]
        # arrow out: the final global sort shuffles these blocks
        return pa.table(
            {
                "o_custkey": pa.array(g["o_custkey"].astype("int64").values),
                "o_orderkey": pa.array(g["o_orderkey"].astype("int64").values),
                "totalprice_c2": pa.array(
                    g["totalprice_c2"].astype("int64").values
                ),
                "rk": pa.array(g["rk"].astype("int64").values),
            }
        )

    return (
        ds.map_batches(scale, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(top2, batch_format="pandas")
        .sort(["o_custkey", "rk"])
    )


TOP2_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ROUND(o_totalprice*100) AS BIGINT) AS totalprice_c2,
       CAST(row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
       ) AS BIGINT) AS rk
FROM orders
QUALIFY rk <= 2
ORDER BY o_custkey, rk
"""


# -- set ops: union + distinct ----------------------------------------------

def distinct_types_union(sf_dir: str) -> "object":
    """`ds.union` of two filtered projections, then `ds.unique` — the set-op
    surface of the Dataset API."""
    import pandas as pd

    high_value = _read(sf_dir, "events", ["event_type", "value"]).filter(
        expr="value > 100.0"
    ).select_columns(["event_type"])
    early_users = _read(sf_dir, "events", ["event_type", "user_id"]).filter(
        expr="user_id < 50"
    ).select_columns(["event_type"])
    values = sorted(high_value.union(early_users).unique("event_type"))
    return pd.DataFrame({"event_type": values})


DISTINCT_TYPES_UNION_SQL = """
SELECT DISTINCT event_type FROM (
  SELECT event_type FROM events WHERE value > 100.0
  UNION ALL
  SELECT event_type FROM events WHERE user_id < 50
) ORDER BY event_type
"""


# -- deterministic hash sampling --------------------------------------------

def sample_docs_hash(sf_dir: str) -> Dataset:
    """Deterministic ~1/16 sample: md5(doc_id) first hex char — the
    reproducible alternative to random_sample for pipelines that must be
    re-runnable bit-identically.  Returned as a sorted Dataset (the sample
    scales with SF, so it never lands on the driver)."""
    import hashlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def pick(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        mask = pa.array(
            [hashlib.md5(str(i).encode()).hexdigest()[0] == "0" for i in ids]
        )
        return t.filter(mask)

    return ds.map_batches(pick, batch_format="pyarrow").sort("doc_id")


SAMPLE_DOCS_HASH_SQL = """
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
ORDER BY doc_id
"""


# -- Bloom-pushdown semi-join (sketch-accelerated shuffle join) ---------------

_BLOOM_JOIN_M = 1 << 20  # bits; ~1e5 keys at sf0.1 -> fp ~1e-3 at k=3
_BLOOM_JOIN_MULS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)


def bloom_semi_join(sf_dir: str) -> "object":
    """Revenue of line items whose order belongs to a high-balance customer
    — a two-hop semi-join executed with the SKETCH-PUSHDOWN idiom every
    scale engine uses: the qualifying orderkey set folds into an O(M)-bit
    Bloom filter (per-batch position partials, driver OR-fold, one
    ``ray.put`` broadcast), the fact table pre-filters AGAINST THE BITS
    before any shuffle (vectorized numpy multiply-shift hashes — no
    per-row Python), and only survivors (true matches + ~1e-3 false
    positives) enter the exact hash join that removes the FPs.  The join
    therefore moves the semi-join's OUTPUT size, not the fact table.  The
    result is EXACT — the sketch only prunes — so the oracle is the plain
    nested semi-join.  Output: (l_returnflag, n_items, revenue_c4)."""
    import pandas as pd

    qual_cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
        .map_batches(
            lambda t: pa.table(
                {"c_custkey": pc.cast(t["c_custkey"], pa.int64())}
            ).filter(pc.greater(_cents(t["c_acctbal"]), 500_000)),
            batch_format="pyarrow",
        )
    )
    okeys = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        .join(
            qual_cust,
            join_type="inner",
            num_partitions=join_partitions(),
            on=("o_custkey",),
            right_on=("c_custkey",),
            aggregator_ray_remote_args={"num_cpus": 0},
        )
        .select_columns(["o_orderkey"])
        .materialize()  # reused: bloom build + exact verify side
    )

    def _positions(keys):
        import numpy as np

        k = keys.astype(np.uint64)
        return [
            ((k + 1) * np.uint64(m) % np.uint64(_BLOOM_JOIN_M)).astype(np.int64)
            for m in _BLOOM_JOIN_MULS
        ]

    def build(t: pa.Table) -> pa.Table:
        import numpy as np

        pos = np.unique(
            np.concatenate(
                _positions(t.column("o_orderkey").to_numpy(zero_copy_only=False))
            )
        )
        return pa.table({"pos": pa.array(pos, pa.int64())})

    import numpy as np

    parts = okeys.map_batches(build, batch_format="pyarrow").to_pandas()
    bits = np.zeros(_BLOOM_JOIN_M, dtype=bool)
    for p in parts["pos"]:
        bits[p] = True
    bref = ray.put(bits)

    def prefilter(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        keys = pc.cast(t["l_orderkey"], pa.int64()).to_numpy(zero_copy_only=False)
        mask = np.ones(len(keys), dtype=bool)
        for pos in _positions(keys):
            mask &= b[pos]
        sub = t.filter(pa.array(mask))
        rev = pc.multiply(
            _cents(sub["l_extendedprice"]), pc.subtract(100, _cents(sub["l_discount"]))
        )
        return pa.table(
            {
                "l_orderkey": pc.cast(sub["l_orderkey"], pa.int64()),
                "l_returnflag": sub["l_returnflag"],
                "rev_c4": rev,
            }
        )

    survivors = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
    ).map_batches(prefilter, batch_format="pyarrow")

    out = (
        survivors.join(  # exact verify: removes the sketch's false positives
            okeys,
            join_type="inner",
            num_partitions=join_partitions(),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
            aggregator_ray_remote_args={"num_cpus": 0},
        )
        .groupby("l_returnflag")
        .aggregate(
            Count(alias_name="n_items"), Sum("rev_c4", alias_name="revenue_c4")
        )
        .to_pandas()  # 3 rows
        .astype({"n_items": "int64", "revenue_c4": "int64"})
    )
    return out.sort_values("l_returnflag").reset_index(drop=True)


BLOOM_SEMI_JOIN_SQL = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
         AS revenue_c4
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_custkey IN (
    SELECT c_custkey FROM customer
    WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) > 500000))
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# -- EXCEPT set op: customers active in 1997 but not 1998 --------------------

def customers_1997_except_1998(sf_dir: str) -> "object":
    """``EXCEPT`` as ONE shuffle: instead of materializing two distinct
    sets and anti-joining (two all-to-alls + a sparse join side), each
    batch folds (custkey, seen-in-1997, seen-in-1998) flag maxima map-side;
    one groupby ORs the flags; a vectorized filter keeps 1997-only keys.
    The same fold generalizes to INTERSECT (both flags set) and UNION (any
    flag) — distinct_types_union covers the UNION shape.  Engine addition
    (SURVEY §2.6 set-op family)."""

    def fold(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"])
        sub = pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "y97": pc.cast(pc.equal(y, 1997), pa.int64()),
                "y98": pc.cast(pc.equal(y, 1998), pa.int64()),
            }
        )
        return (
            pa.TableGroupBy(sub, "o_custkey")
            .aggregate([("y97", "max"), ("y98", "max")])
            .rename_columns(["o_custkey", "y97", "y98"])
        )

    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
        .map_batches(fold, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            Max("y97", alias_name="y97"),
            Max("y98", alias_name="y98"),
        )
        .filter(expr="y97 == 1 and y98 == 0")
        .select_columns(["o_custkey"])
        .sort("o_custkey")
        .to_pandas()
    )
    out["o_custkey"] = out["o_custkey"].astype("int64")
    return out


CUSTOMERS_EXCEPT_SQL = """
SELECT CAST(o_custkey AS BIGINT) AS o_custkey
FROM (
  SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
  EXCEPT
  SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998
)
ORDER BY o_custkey
"""


def customers_both_years(sf_dir: str) -> "object":
    """``INTERSECT`` companion of :func:`customers_1997_except_1998` —
    the same single-shuffle flag-maxima fold (map-side (custkey, y97, y98)
    per-batch maxima, one groupby OR), keeping keys with BOTH flags set.
    Completes the set-op family: UNION (distinct_types_union), EXCEPT,
    INTERSECT.  Engine addition (SURVEY §2.6)."""

    def fold(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"])
        sub = pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "y97": pc.cast(pc.equal(y, 1997), pa.int64()),
                "y98": pc.cast(pc.equal(y, 1998), pa.int64()),
            }
        )
        return (
            pa.TableGroupBy(sub, "o_custkey")
            .aggregate([("y97", "max"), ("y98", "max")])
            .rename_columns(["o_custkey", "y97", "y98"])
        )

    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
        .map_batches(fold, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            Max("y97", alias_name="y97"),
            Max("y98", alias_name="y98"),
        )
        .filter(expr="y97 == 1 and y98 == 1")
        .select_columns(["o_custkey"])
        .sort("o_custkey")
        .to_pandas()
    )
    out["o_custkey"] = out["o_custkey"].astype("int64")
    return out


CUSTOMERS_INTERSECT_SQL = """
SELECT CAST(o_custkey AS BIGINT) AS o_custkey
FROM (
  SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
  INTERSECT
  SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998
)
ORDER BY o_custkey
"""




# -- relational division -------------------------------------------------------

def relational_division(sf_dir: str) -> Dataset:
    """Relational division (Codd's /): customers whose orders span EVERY
    order-priority class — "for all" over a derived divisor set, the
    algebra operator behind universal-quantifier business questions
    ("served every region", "stocked every brand").

    Two stages, both bounded: a tiny distinct fold discovers the divisor
    cardinality (priority domain, O(1)); then per-batch Arrow combiners
    pre-aggregate (custkey, priority, n) so the single exchange is a
    BUCKETED co-location (custkey is corpus-proportional — never a raw
    group key, per the groupby-cost audit), and the in-bucket kernel
    emits qualifying customers with their order counts.  Output:
    (o_custkey, n_orders) sorted."""
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    # divisor cardinality: batch-distinct partials -> tiny driver fold
    n_prio = len(
        set(
            ds.map_batches(
                lambda t: pa.table(
                    {"p": pc.unique(t.column("o_orderpriority"))}
                ),
                batch_format="pyarrow",
            )
            .to_pandas()["p"]
            .tolist()
        )
    )

    def partial(t: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(
            t, ["o_custkey", "o_orderpriority"]
        ).aggregate([([], "count_all")])
        agg = agg.rename_columns(["o_custkey", "o_orderpriority", "n"])
        cb = pc.cast(
            pc.bit_wise_and(pc.cast(agg["o_custkey"], pa.int64()), nb - 1),
            pa.int32(),
        )
        return agg.append_column("cb", cb)

    def divide(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("o_custkey").agg(
            k=("o_orderpriority", "nunique"), n_orders=("n", "sum")
        )
        keep = per[per["k"] == n_prio]
        return pd.DataFrame(
            {
                "o_custkey": keep.index.to_numpy("int64"),
                "n_orders": keep["n_orders"].to_numpy("int64"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(divide, batch_format="pandas")
        .sort("o_custkey")
    )


RELATIONAL_DIVISION_SQL = """
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING COUNT(DISTINCT o_orderpriority) =
       (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
ORDER BY o_custkey
"""
