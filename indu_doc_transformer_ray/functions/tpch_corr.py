"""TPC-H correlated / nested-aggregate shapes (q2, q9, q11, q16, q20).

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


# -- q2: min-cost supplier per part (correlated-MIN + 5-way join shape) ------

def q2_min_cost_supplier(sf_dir: str) -> "object":
    """TPC-H q2 adaptation (no partsupp in the driver schema): for each
    LARGE part of size <= 10, the EUROPE supplier(s) offering it at the
    minimum observed line price.  The correlated ``MIN`` subquery becomes a
    single ``groupby(partkey).map_groups`` kernel that sees every
    (supplier, min-price) pair for the part at once — one co-location
    shuffle replaces the oracle's join-back-on-the-min.  Under
    ``MAX_BROADCAST_DIM_ROWS`` the selected-part and EUROPE-supplier key
    sets broadcast once via ``ray.put`` and lineitem filters in-stream
    (one exchange total); above the guard both fact-side joins run as
    hash-partitioned ``Dataset.join``s with the EUROPE filter post-join
    (a pre-filtered supplier side leaves hash partitions empty — q15's
    schemaless-empty-block crash); only nation/region (25 + 5 fixed rows)
    resolve on the driver.  Winner decoration (names, brands, balances) attaches to the
    <=100-row result via broadcast-filtered dimension reads, never a
    shuffle.  Reference parity: SURVEY §2.5 join family."""
    import pandas as pd

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    eur_key = int(region.loc[region["r_name"] == "EUROPE", "r_regionkey"].iloc[0])
    eur_nations = sorted(
        int(k) for k in nation.loc[nation["n_regionkey"] == eur_key, "n_nationkey"]
    )
    eur_arr = pa.array(eur_nations, pa.int64())

    import numpy as np

    import pyarrow.parquet as pq

    n_part = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
    n_supp = pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows
    if max(n_part, n_supp) <= _rc.MAX_BROADCAST_DIM_ROWS:
        # fast plan: selected-part key set + EUROPE-supplier key set
        # broadcast once; lineitem filters in-stream and pre-folds
        # (part, supp) minima, so the ONLY exchange is the per-part
        # winners co-location
        part = _read(sf_dir, "part", ["p_partkey", "p_type", "p_size"]).to_pandas()
        pk = np.sort(
            part.loc[
                (part["p_type"] == "LARGE") & (part["p_size"] <= 10), "p_partkey"
            ].to_numpy(np.int64)
        )
        suppd = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
        ek = np.sort(
            suppd.loc[
                suppd["s_nationkey"].isin(eur_nations), "s_suppkey"
            ].to_numpy(np.int64)
        )
        import ray as _ray

        keys_ref = _ray.put((pk, ek))

        def li_fold(t: pa.Table) -> pa.Table:
            import ray as _r

            pk_, ek_ = _r.get(keys_ref)
            pkv = pc.cast(t["l_partkey"], pa.int64()).to_numpy()
            pidx = np.clip(np.searchsorted(pk_, pkv), 0, max(len(pk_) - 1, 0))
            hit = (pk_[pidx] == pkv) if len(pk_) else np.zeros(len(pkv), bool)
            skv = pc.cast(t["l_suppkey"], pa.int64()).to_numpy()
            sidx = np.clip(np.searchsorted(ek_, skv), 0, max(len(ek_) - 1, 0))
            hit &= (ek_[sidx] == skv) if len(ek_) else False
            sub = t.filter(pa.array(hit))
            folded_t = pa.table(
                {
                    "p_partkey": pc.cast(sub["l_partkey"], pa.int64()),
                    "s_suppkey": pc.cast(sub["l_suppkey"], pa.int64()),
                    "cost_c2": _cents(sub["l_extendedprice"]),
                }
            )
            return (
                pa.TableGroupBy(folded_t, ["p_partkey", "s_suppkey"])
                .aggregate([("cost_c2", "min")])
                .rename_columns(["p_partkey", "s_suppkey", "cost_c2"])
            )

        folded = _read(
            sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"]
        ).map_batches(li_fold, batch_format="pyarrow")
    else:
        sel_parts = (
            _read(sf_dir, "part", ["p_partkey", "p_type", "p_size"])
            .filter(expr="p_type == 'LARGE' and p_size <= 10")
            .select_columns(["p_partkey"])
        )

        # join the FULL supplier projection (dense right side — a
        # region-filtered side leaves hash partitions empty, the
        # schemaless-empty-block crash documented at q15) and filter
        # EUROPE in the fold.
        supp_keys = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

        li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
        li_parts = li.join(
            sel_parts,
            join_type="inner",
            num_partitions=join_partitions(),
            on=("l_partkey",),
            right_on=("p_partkey",),
            aggregator_ray_remote_args={"num_cpus": 0},
        )
        li_eur = li_parts.join(
            supp_keys,
            join_type="inner",
            num_partitions=join_partitions(),
            on=("l_suppkey",),
            right_on=("s_suppkey",),
            aggregator_ray_remote_args={"num_cpus": 0},
        )

        def fold(t: pa.Table) -> pa.Table:
            # EUROPE filter + map-side combine: one (part, supp) min per batch
            t = t.filter(
                pc.is_in(pc.cast(t["s_nationkey"], pa.int64()), value_set=eur_arr)
            )
            folded_t = pa.table(
                {
                    "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
                    "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                    "cost_c2": _cents(t["l_extendedprice"]),
                }
            )
            return (
                pa.TableGroupBy(folded_t, ["p_partkey", "s_suppkey"])
                .aggregate([("cost_c2", "min")])
                .rename_columns(["p_partkey", "s_suppkey", "cost_c2"])
            )

        folded = li_eur.map_batches(fold, batch_format="pyarrow")

    def winners(g: "pd.DataFrame") -> "pd.DataFrame":
        # all (supplier, min-cost) pairs of one part: pick the tied minimum
        per_supp = g.groupby("s_suppkey")["cost_c2"].min()
        best = int(per_supp.min())
        win = per_supp[per_supp == best]
        return pd.DataFrame(
            {
                "p_partkey": int(g["p_partkey"].iloc[0]),
                "s_suppkey": win.index.astype("int64"),
                "cost_c2": best,
            }
        )

    win = (
        folded.groupby("p_partkey")
        .map_groups(winners, batch_format="pandas")
        .to_pandas()  # <= |selected parts| x |tied suppliers|: tiny by filter
    )
    if len(win) == 0:
        return pd.DataFrame(
            {
                "s_acctbal_c2": pd.Series([], dtype="int64"),
                "s_name": pd.Series([], dtype="object"),
                "n_name": pd.Series([], dtype="object"),
                "p_partkey": pd.Series([], dtype="int64"),
                "s_suppkey": pd.Series([], dtype="int64"),
                "cost_c2": pd.Series([], dtype="int64"),
            }
        )

    win_supp = pa.array(sorted(set(int(s) for s in win["s_suppkey"])), pa.int64())

    def supp_pick(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_in(pc.cast(t["s_suppkey"], pa.int64()), value_set=win_supp))
        return pa.table(
            {
                "s_suppkey": pc.cast(sub["s_suppkey"], pa.int64()),
                "s_name": sub["s_name"],
                "s_acctbal_c2": _cents(sub["s_acctbal"]),
                "s_nationkey": pc.cast(sub["s_nationkey"], pa.int64()),
            }
        )

    supp = (
        _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"])
        .map_batches(supp_pick, batch_format="pyarrow")
        .to_pandas()  # winners only
    )
    out = win.merge(supp, on="s_suppkey").merge(
        nation[["n_nationkey", "n_name"]],
        left_on="s_nationkey",
        right_on="n_nationkey",
    )
    out = out[
        ["s_acctbal_c2", "s_name", "n_name", "p_partkey", "s_suppkey", "cost_c2"]
    ].astype({"s_acctbal_c2": "int64", "p_partkey": "int64",
              "s_suppkey": "int64", "cost_c2": "int64"})
    out = out.sort_values(
        ["s_acctbal_c2", "n_name", "s_name", "p_partkey", "s_suppkey"],
        ascending=[False, True, True, True, True],
    ).head(100)
    return out.reset_index(drop=True)


Q2_MIN_COST_SQL = """
WITH eur_supp AS (
  SELECT s_suppkey, s_name, CAST(ROUND(s_acctbal*100) AS BIGINT) AS s_acctbal_c2,
         n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
sel_parts AS (
  SELECT p_partkey FROM part WHERE p_type = 'LARGE' AND p_size <= 10),
cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS cost_c2
  FROM lineitem JOIN sel_parts ON l_partkey = p_partkey
                JOIN eur_supp  ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey)
SELECT es.s_acctbal_c2, es.s_name, es.n_name,
       CAST(c.l_partkey AS BIGINT) AS p_partkey,
       CAST(c.l_suppkey AS BIGINT) AS s_suppkey,
       CAST(c.cost_c2 AS BIGINT) AS cost_c2
FROM cost c JOIN eur_supp es ON c.l_suppkey = es.s_suppkey
WHERE c.cost_c2 = (SELECT MIN(c2.cost_c2) FROM cost c2
                   WHERE c2.l_partkey = c.l_partkey)
ORDER BY es.s_acctbal_c2 DESC, es.n_name, es.s_name, p_partkey, s_suppkey
LIMIT 100
"""


# -- q11: important parts (groupby + global-scalar HAVING shape) -------------

def q11_important_parts(sf_dir: str) -> "object":
    """TPC-H q11 adaptation: per-part line-revenue supplied by ASIA
    suppliers, keeping parts whose value exceeds twice the mean per-part
    value — the ``HAVING SUM(...) > (SELECT SUM(...) * f)`` global-scalar
    shape with a corpus-free fraction (TPC-H's own 0.0001/SF scales the
    cutoff with data size; a fixed fraction degenerates to 0 or all rows
    as the part count grows).
    lineitem ⋈ ASIA-suppliers is a hash-partitioned ``Dataset.join`` (the
    supplier table scales); per-part value folds map-side before ONE small
    groupby; the grand total is a driver scalar off the materialized
    aggregate (reused for the filter — no second pass over lineitem); the
    share test is exact integer (``value*500 > total``), so the result
    hash-matches the oracle.  Reference parity: SURVEY §2.6."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia_key = int(region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    asia_arr = pa.array(
        sorted(int(k) for k in nation.loc[nation["n_regionkey"] == asia_key, "n_nationkey"]),
        pa.int64(),
    )

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
    if _dim_rows(sf_dir, "supplier") <= _rc.MAX_BROADCAST_DIM_ROWS:
        # fast plan: the ASIA-supplier key set broadcasts once; lineitem
        # filters in-stream, leaving ONE per-part groupby exchange
        import numpy as np

        sk, vals = _dim_lookup(sf_dir, "supplier", "s_suppkey", ["s_nationkey"])
        asia_set = set(int(a) for a in asia_arr.to_pylist())
        ak = sk[np.isin(vals["s_nationkey"].astype("int64"),
                        np.array(sorted(asia_set), dtype="int64"))]
        ak_ref = ray.put(ak)

        def asia_filter(t: pa.Table) -> pa.Table:
            ak_ = ray.get(ak_ref)
            skv = pc.cast(t["l_suppkey"], pa.int64()).to_numpy()
            hit, _ = _lookup_hits(ak_, skv)
            return t.filter(pa.array(hit))

        joined = li.map_batches(asia_filter, batch_format="pyarrow")
        already_asia = True
    else:
        # full supplier projection as the join side (dense — a region-
        # filtered side leaves hash partitions empty, see q15's
        # schemaless-empty-block note); the ASIA filter runs in the fold.
        supp_keys = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        joined = li.join(
            supp_keys,
            join_type="inner",
            num_partitions=join_partitions(),
            on=("l_suppkey",),
            right_on=("s_suppkey",),
            aggregator_ray_remote_args={"num_cpus": 0},
        )
        already_asia = False

    def fold(t: pa.Table) -> pa.Table:
        if not already_asia:
            t = t.filter(
                pc.is_in(pc.cast(t["s_nationkey"], pa.int64()), value_set=asia_arr)
            )
        folded = pa.table(
            {
                "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "value_c2": _cents(t["l_extendedprice"]),
            }
        )
        return (
            pa.TableGroupBy(folded, "p_partkey")
            .aggregate([("value_c2", "sum")])
            .rename_columns(["p_partkey", "value_c2"])
        )

    val = (
        joined.map_batches(fold, batch_format="pyarrow")
        .groupby("p_partkey")
        .aggregate(Sum("value_c2", alias_name="value_c2"))
        .materialize()  # reused: grand total + share filter
    )
    total = int(val.sum("value_c2") or 0)
    n_parts = int(val.count())
    # value*n > 2*total  <=>  value >= (2*total)//n + 1  (exact in integers)
    out = (
        val.filter(expr=f"value_c2 >= {(2 * total) // max(1, n_parts) + 1}")
        .sort(["value_c2", "p_partkey"], descending=[True, False])
        .to_pandas()
    )
    out["value_c2"] = out["value_c2"].astype("int64")
    out["p_partkey"] = out["p_partkey"].astype("int64")
    return out


Q11_IMPORTANT_PARTS_SQL = """
WITH asia_supp AS (
  SELECT s_suppkey
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'),
val AS (
  SELECT l_partkey AS p_partkey,
         SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS value_c2
  FROM lineitem JOIN asia_supp ON l_suppkey = s_suppkey
  GROUP BY l_partkey)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, CAST(value_c2 AS BIGINT) AS value_c2
FROM val
WHERE value_c2 * (SELECT COUNT(*) FROM val) > 2 * (SELECT SUM(value_c2) FROM val)
ORDER BY value_c2 DESC, p_partkey
"""


# -- q16: supplier counts per part attribute (distinct-count + anti-join) ----

def q16_supplier_counts(sf_dir: str) -> "object":
    """TPC-H q16 adaptation: distinct suppliers per (brand, type, size) for
    a filtered part family, excluding low-balance suppliers (the
    complaints anti-join analog).  Fast plan (part + supplier under
    ``MAX_BROADCAST_DIM_ROWS``): the selected-part attribute map and the
    qualifying-supplier key set broadcast once via ``ray.put``; lineitem
    attaches both in-stream and dedups (brand,type,size,suppkey) per
    batch, so the ONLY exchange is the 4-key dedup groupby over unique
    combos — per-batch 3-key count partials then fold on the driver
    (≤|brands|·|types|·|sizes| rows).  Above the guard the two-join +
    two-groupby plan runs.  Tests pin both plans to the same oracle
    hash."""
    import numpy as np
    import pandas as pd

    import pyarrow.parquet as pq

    n_part = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
    n_supp = pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows
    if max(n_part, n_supp) > _rc.MAX_BROADCAST_DIM_ROWS:
        return _q16_join_plan(sf_dir)

    sizes = {1, 4, 9, 14, 19, 23, 36, 45}
    part = _read(
        sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]
    ).to_pandas()
    part = part[
        (part["p_brand"] != "Brand#5")
        & (part["p_type"] != "PROMO")
        & part["p_size"].isin(sizes)
    ].sort_values("p_partkey")
    pk = part["p_partkey"].to_numpy(np.int64)
    pbrand = part["p_brand"].to_numpy(object)
    ptype = part["p_type"].to_numpy(object)
    psize = part["p_size"].to_numpy(np.int64)
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).to_pandas()
    sk = np.sort(
        supp.loc[
            (supp["s_acctbal"] * 100).round().astype("int64") >= 100_000,
            "s_suppkey",
        ].to_numpy(np.int64)
    )
    import ray as _ray

    maps_ref = _ray.put((pk, pbrand, ptype, psize, sk))

    def li_rows(t: pa.Table) -> pa.Table:
        import ray as _r

        pk_, pb_, pt_, ps_, sk_ = _r.get(maps_ref)
        pkv = pc.cast(t["l_partkey"], pa.int64()).to_numpy()
        pidx = np.clip(np.searchsorted(pk_, pkv), 0, max(len(pk_) - 1, 0))
        hit = (pk_[pidx] == pkv) if len(pk_) else np.zeros(len(pkv), bool)
        skv = pc.cast(t["l_suppkey"], pa.int64()).to_numpy()
        sidx = np.clip(np.searchsorted(sk_, skv), 0, max(len(sk_) - 1, 0))
        hit &= (sk_[sidx] == skv) if len(sk_) else False
        folded = pa.table(
            {
                "p_brand": pa.array(pb_[pidx[hit]], pa.string()),
                "p_type": pa.array(pt_[pidx[hit]], pa.string()),
                "p_size": pa.array(ps_[pidx[hit]]),
                "s_suppkey": pa.array(skv[hit]),
            }
        )
        # map-side dedup: the shuffle ships unique combos, not lineitems
        return pa.TableGroupBy(
            folded, ["p_brand", "p_type", "p_size", "s_suppkey"]
        ).aggregate([])

    uniq = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(li_rows, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size", "s_suppkey"])
        .aggregate(Count(alias_name="n"))
    )

    def count_partial(t: pa.Table) -> pa.Table:
        folded = pa.table(
            {
                "p_brand": t["p_brand"],
                "p_type": t["p_type"],
                "p_size": t["p_size"],
                "one": pa.array([1] * len(t), pa.int64()),
            }
        )
        return (
            pa.TableGroupBy(folded, ["p_brand", "p_type", "p_size"])
            .aggregate([("one", "sum")])
            .rename_columns(["p_brand", "p_type", "p_size", "supplier_cnt"])
        )

    out = (
        uniq.map_batches(count_partial, batch_format="pyarrow")
        .to_pandas()  # ≤|brands|·|types|·|sizes| per batch -> driver fold
        .groupby(["p_brand", "p_type", "p_size"], as_index=False)[
            "supplier_cnt"
        ].sum()
    )
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    out["p_size"] = out["p_size"].astype("int64")
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
    ).reset_index(drop=True)


def _q16_join_plan(sf_dir: str) -> "object":
    """TPC-H q16 adaptation: distinct suppliers per (brand, type, size) for
    a filtered part family, excluding low-balance suppliers (the
    complaints anti-join analog).  Both fact joins are hash-partitioned
    ``Dataset.join``s; the distinct count is two groupbys on the SAME key
    prefix — first (brand,type,size,suppkey) to dedup (with a map-side
    pyarrow dedup fold so the shuffle carries unique combos only), then
    (brand,type,size) to count — the partitioning-friendly way to express
    COUNT(DISTINCT) over a join.  Reference parity: SURVEY §2.6 distinct
    family (distinct_suppliers_per_nation is the 1-key version)."""
    sizes = pa.array([1, 4, 9, 14, 19, 23, 36, 45], pa.int64())

    def part_pick(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.not_equal(t["p_brand"], "Brand#5"),
                pc.not_equal(t["p_type"], "PROMO"),
            ),
            pc.is_in(pc.cast(t["p_size"], pa.int64()), value_set=sizes),
        )
        sub = t.filter(mask)
        return pa.table(
            {
                "p_partkey": pc.cast(sub["p_partkey"], pa.int64()),
                "p_brand": sub["p_brand"],
                "p_type": sub["p_type"],
                "p_size": pc.cast(sub["p_size"], pa.int64()),
            }
        )

    sel_parts = _read(
        sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]
    ).map_batches(part_pick, batch_format="pyarrow")

    def supp_ok(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.greater_equal(_cents(t["s_acctbal"]), 100_000))
        return pa.table({"s_suppkey": pc.cast(sub["s_suppkey"], pa.int64())})

    ok_supp = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).map_batches(
        supp_ok, batch_format="pyarrow"
    )

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    li_parts = li.join(
        sel_parts,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_partkey",),
        right_on=("p_partkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )
    li_ok = li_parts.join(
        ok_supp,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_suppkey",),
        right_on=("s_suppkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )

    def dedup_fold(t: pa.Table) -> pa.Table:
        # map-side dedup: the shuffle ships unique combos, not lineitems
        folded = pa.table(
            {
                "p_brand": t["p_brand"],
                "p_type": t["p_type"],
                "p_size": pc.cast(t["p_size"], pa.int64()),
                "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            }
        )
        return (
            pa.TableGroupBy(folded, ["p_brand", "p_type", "p_size", "s_suppkey"])
            .aggregate([])
        )

    uniq = (
        li_ok.map_batches(dedup_fold, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size", "s_suppkey"])
        .aggregate(Count(alias_name="n"))
    )

    def count_fold(t: pa.Table) -> pa.Table:
        folded = pa.table(
            {
                "p_brand": t["p_brand"],
                "p_type": t["p_type"],
                "p_size": t["p_size"],
                "one": pa.array([1] * len(t), pa.int64()),
            }
        )
        return (
            pa.TableGroupBy(folded, ["p_brand", "p_type", "p_size"])
            .aggregate([("one", "sum")])
            .rename_columns(["p_brand", "p_type", "p_size", "supplier_cnt"])
        )

    out = (
        uniq.map_batches(count_fold, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size"])
        .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt"))
        .to_pandas()  # |brands| x |types| x |sizes| upper bound: small
    )
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    out["p_size"] = out["p_size"].astype("int64")
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
    ).reset_index(drop=True)


Q16_SUPPLIER_COUNTS_SQL = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND CAST(ROUND(s_acctbal*100) AS BIGINT) >= 100000
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# -- q9: profit by nation and year (4-way join + 2-key groupby shape) --------

def q9_nation_profit(sf_dir: str) -> "object":
    """TPC-H q9 adaptation (no partsupp): per (supplier-nation, order-year)
    profit over 'bolt' parts, profit = line revenue minus a retail-price
    cost proxy (``p_retailprice * l_quantity`` — supplycost is absent from
    the driver schema).  Fast plan (dims under ``MAX_BROADCAST_DIM_ROWS``):
    the bolt-part retail map and the supplier nation map broadcast once via
    ``ray.put``; lineitem attaches both in-stream and pre-folds to
    (orderkey, nation) grain, so the ONLY exchange is the orderkey
    co-location with orders (for the year), whose kernel emits
    ≤25·|years| partials per bucket — a corpus-independent driver fold
    finishes.  Above the guard the original three-``Dataset.join`` tree
    runs (dims are corpus-proportional at true TPC-H scale).  Exact in c4
    cents.  Reference parity: SURVEY §2.5/2.6 multi-join aggregate
    family.  Tests pin both plans to the same oracle hash."""
    import numpy as np
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    n_part = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
    n_supp = pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows
    if max(n_part, n_supp) > _rc.MAX_BROADCAST_DIM_ROWS:
        return _q9_join_tree(sf_dir)

    OB = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)

    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]).to_pandas()
    part = part[part["p_name"].str.contains("bolt")]
    pk = np.sort(part["p_partkey"].to_numpy(np.int64))
    pr = (
        part.set_index("p_partkey")["p_retailprice"]
        .loc[pk].mul(100).round().astype("int64").to_numpy()
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sk = np.sort(supp["s_suppkey"].to_numpy(np.int64))
    sn = supp.set_index("s_suppkey")["s_nationkey"].loc[sk].to_numpy(np.int64)
    import ray as _ray

    maps_ref = _ray.put((pk, pr, sk, sn))

    def li_rows(t: pa.Table) -> pa.Table:
        import ray as _r

        pk_, pr_, sk_, sn_ = _r.get(maps_ref)
        pkv = pc.cast(t["l_partkey"], pa.int64()).to_numpy()
        pidx = np.clip(np.searchsorted(pk_, pkv), 0, max(len(pk_) - 1, 0))
        hit = (pk_[pidx] == pkv) if len(pk_) else np.zeros(len(pkv), bool)
        sub = t.filter(pa.array(hit))
        retail = pr_[pidx[hit]]
        skv = pc.cast(sub["l_suppkey"], pa.int64()).to_numpy()
        sidx = np.clip(np.searchsorted(sk_, skv), 0, max(len(sk_) - 1, 0))
        shit = sk_[sidx] == skv
        sub = sub.filter(pa.array(shit))
        retail = retail[shit]
        rev = pc.multiply(
            _cents(sub["l_extendedprice"]),
            pc.subtract(100, _cents(sub["l_discount"])),
        ).to_numpy()
        cost = retail * 100 * pc.cast(sub["l_quantity"], pa.int64()).to_numpy()
        ok = pc.cast(sub["l_orderkey"], pa.int64()).to_numpy()
        folded = pa.table(
            {
                "b": pa.array((ok & (OB - 1)).astype("int32")),
                "ok": pa.array(ok),
                "nat": pa.array(sn_[sidx[shit]]),
                "is_line": pa.array(np.ones(len(ok), dtype="int8")),
                "profit_c4": pa.array(rev - cost),
            }
        )
        # batch-local (order, nation) combine shrinks the exchange
        return pa.TableGroupBy(folded, ["b", "ok", "nat", "is_line"]).aggregate(
            [("profit_c4", "sum")]
        ).rename_columns(["b", "ok", "nat", "is_line", "profit_c4"])

    def o_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["o_orderkey"], pa.int64())
        return pa.table(
            {
                "b": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "ok": ok,
                "nat": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                "is_line": pa.array([0] * len(t), pa.int8()),
                "profit_c4": pa.array([0] * len(t), pa.int64()),
            }
        )

    def year_fold(g: pd.DataFrame) -> pd.DataFrame:
        yr = g.loc[g["is_line"] == 0].set_index("ok")["nat"]
        li = g[g["is_line"] == 1]
        y = li["ok"].map(yr)
        keep = y.notna()
        sub = pd.DataFrame(
            {
                "s_nationkey": li.loc[keep, "nat"].astype("int64"),
                "o_year": y[keep].astype("int64"),
                "profit_c4": li.loc[keep, "profit_c4"].astype("int64"),
            }
        )
        return sub.groupby(
            ["s_nationkey", "o_year"], as_index=False
        )["profit_c4"].sum()  # ≤25·|years| rows per bucket

    agg = (
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
             "l_extendedprice", "l_discount"],
        )
        .map_batches(li_rows, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
                o_rows, batch_format="pyarrow"
            )
        )
        .groupby("b")
        .map_groups(year_fold, batch_format="pandas")
        .to_pandas()  # corpus-independent driver fold
        .groupby(["s_nationkey", "o_year"], as_index=False)["profit_c4"]
        .sum()
    )
    return _q9_decorate(sf_dir, agg)


def _q9_decorate(sf_dir: str, agg) -> "object":
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = agg.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    out = out[["n_name", "o_year", "profit_c4"]].astype(
        {"o_year": "int64", "profit_c4": "int64"}
    )
    return out.sort_values(
        ["n_name", "o_year"], ascending=[True, False]
    ).reset_index(drop=True)


def _q9_join_tree(sf_dir: str) -> "object":
    """q9 scale path: the original three hash-partitioned ``Dataset.join``
    tree (part filter, supplier nationkey, orders year) with map-side
    2-key folds — nothing corpus-sized on the driver."""

    def part_pick(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.match_substring(t["p_name"], "bolt"))
        return pa.table(
            {
                "p_partkey": pc.cast(sub["p_partkey"], pa.int64()),
                "retail_c2": _cents(sub["p_retailprice"]),
            }
        )

    bolt_parts = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]).map_batches(
        part_pick, batch_format="pyarrow"
    )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_extendedprice", "l_discount"],
    )
    li_parts = li.join(
        bolt_parts,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_partkey",),
        right_on=("p_partkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    li_supp = li_parts.join(
        supp,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_suppkey",),
        right_on=("s_suppkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )

    def order_year(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        order_year, batch_format="pyarrow"
    )
    joined = li_supp.join(
        orders,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0},
    )

    def fold(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _cents(t["l_extendedprice"]), pc.subtract(100, _cents(t["l_discount"]))
        )
        cost = pc.multiply(
            pc.multiply(pc.cast(t["retail_c2"], pa.int64()), 100),
            pc.cast(t["l_quantity"], pa.int64()),
        )
        folded = pa.table(
            {
                "s_nationkey": pc.cast(t["s_nationkey"], pa.int64()),
                "o_year": t["o_year"],
                "profit_c4": pc.subtract(rev, cost),
            }
        )
        return (
            pa.TableGroupBy(folded, ["s_nationkey", "o_year"])
            .aggregate([("profit_c4", "sum")])
            .rename_columns(["s_nationkey", "o_year", "profit_c4"])
        )

    agg = (
        joined.map_batches(fold, batch_format="pyarrow")
        .groupby(["s_nationkey", "o_year"])
        .aggregate(Sum("profit_c4", alias_name="profit_c4"))
        .to_pandas()  # <= 25 nations x |years|
    )
    return _q9_decorate(sf_dir, agg)


Q9_NATION_PROFIT_SQL = """
SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                - CAST(ROUND(p_retailprice*100) AS BIGINT) * 100
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_c4
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


# -- q20: excess-share suppliers (nested aggregate + semi-join shape) --------

def q20_excess_suppliers(sf_dir: str) -> "object":
    """TPC-H q20 adaptation (no partsupp availqty): AMERICA suppliers who
    shipped more than 20% of the total 1996 volume of some STANDARD part —
    the nested-aggregate semi-join shape (original: availqty > half the
    yearly shipped quantity).  The per-(part, supplier) and per-part sums
    both come out of ONE ``groupby(partkey).map_groups`` co-location (the
    kernel sees every supplier of the part at once and applies the exact
    integer share test ``5*qty > total``); lineitem ⋈ STANDARD parts is a
    hash-partitioned ``Dataset.join``; the surviving supplier set is tiny
    (bounded by 5 per part), so names/regions attach via broadcast-filtered
    dimension reads.  Reference parity: SURVEY §2.5 semi-join family."""
    from datetime import datetime

    import pandas as pd

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    am_key = int(region.loc[region["r_name"] == "AMERICA", "r_regionkey"].iloc[0])
    am_nations = pa.array(
        sorted(int(k) for k in nation.loc[nation["n_regionkey"] == am_key, "n_nationkey"]),
        pa.int64(),
    )

    import numpy as np

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    lo = pa.scalar(datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(1997, 1, 1), pa.timestamp("us"))
    push = (pads.field("l_shipdate") >= datetime(1996, 1, 1)) & (
        pads.field("l_shipdate") < datetime(1997, 1, 1)
    )

    def li_pick(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].cast(pa.timestamp("us"))
        sub = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        return pa.table(
            {
                "l_partkey": pc.cast(sub["l_partkey"], pa.int64()),
                "l_suppkey": pc.cast(sub["l_suppkey"], pa.int64()),
                "qty": pc.cast(sub["l_quantity"], pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        filter=push,
    ).map_batches(li_pick, batch_format="pyarrow")

    if pq.read_metadata(f"{sf_dir}/part.parquet").num_rows <= _rc.MAX_BROADCAST_DIM_ROWS:
        # fast plan: the STANDARD partkey set broadcasts once — the part
        # join disappears and the per-part winners co-location is the only
        # exchange
        part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
        pk = np.sort(
            part.loc[part["p_type"] == "STANDARD", "p_partkey"].to_numpy(np.int64)
        )
        pk_ref = ray.put(pk)

        def std_filter(t: pa.Table) -> pa.Table:
            pk_ = ray.get(pk_ref)
            pkv = pc.cast(t["l_partkey"], pa.int64()).to_numpy()
            idx = np.clip(np.searchsorted(pk_, pkv), 0, max(len(pk_) - 1, 0))
            hit = (pk_[idx] == pkv) if len(pk_) else np.zeros(len(pkv), bool)
            return t.filter(pa.array(hit))

        li_std = li.map_batches(std_filter, batch_format="pyarrow")
    else:
        std_parts = (
            _read(sf_dir, "part", ["p_partkey", "p_type"])
            .filter(expr="p_type == 'STANDARD'")
            .select_columns(["p_partkey"])
        )
        li_std = li.join(
            std_parts,
            join_type="inner",
            num_partitions=join_partitions(),
            on=("l_partkey",),
            right_on=("p_partkey",),
            aggregator_ray_remote_args={"num_cpus": 0},
        )

    def fold(t: pa.Table) -> pa.Table:
        # map-side combine: one (part, supp) qty partial per batch
        return (
            pa.TableGroupBy(
                t.select(["l_partkey", "l_suppkey", "qty"]), ["l_partkey", "l_suppkey"]
            )
            .aggregate([("qty", "sum")])
            .rename_columns(["l_partkey", "l_suppkey", "qty"])
        )

    def excess(g: "pd.DataFrame") -> "pd.DataFrame":
        per_supp = g.groupby("l_suppkey")["qty"].sum()
        total = int(per_supp.sum())
        win = per_supp[per_supp * 5 > total]
        return pd.DataFrame({"s_suppkey": win.index.astype("int64")})

    win = (
        li_std.map_batches(fold, batch_format="pyarrow")
        .groupby("l_partkey")
        .map_groups(excess, batch_format="pandas")
        .groupby("s_suppkey")
        .aggregate(Count(alias_name="n_parts"))  # distinct suppliers
        .to_pandas()  # <= 5 winners per part, deduped: small
    )
    if len(win) == 0:
        return pd.DataFrame(
            {
                "s_suppkey": pd.Series([], dtype="int64"),
                "s_name": pd.Series([], dtype="object"),
            }
        )
    win_arr = pa.array(sorted(int(s) for s in win["s_suppkey"]), pa.int64())

    def supp_pick(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_in(pc.cast(t["s_suppkey"], pa.int64()), value_set=win_arr),
            pc.is_in(pc.cast(t["s_nationkey"], pa.int64()), value_set=am_nations),
        )
        sub = t.filter(mask)
        return pa.table(
            {
                "s_suppkey": pc.cast(sub["s_suppkey"], pa.int64()),
                "s_name": sub["s_name"],
            }
        )

    out = (
        _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
        .map_batches(supp_pick, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("s_suppkey").reset_index(drop=True)


Q20_EXCESS_SUPPLIERS_SQL = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'STANDARD'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey),
tot AS (
  SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey),
excess AS (
  SELECT DISTINCT s.l_suppkey
  FROM shipped s JOIN tot t ON s.l_partkey = t.l_partkey
  WHERE s.qty * 5 > t.total_qty)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
FROM supplier
JOIN excess ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
ORDER BY s_suppkey
"""




# -- Mann-Whitney U (rank-sum) between return flags ----------------------------

def mann_whitney_qty(sf_dir: str) -> "object":
    """Mann-Whitney U rank-sum test statistic between every pair of return
    flags on l_quantity — the nonparametric two-sample location test, in
    the repo's joint-histogram-replay discipline: quantity's bounded
    domain (50 values) means ONE (flag, qty) combiner groupby ships the
    sufficient statistics and the driver replays the tie-handled U in
    exact Python ints.  Ties use the standard half-credit, kept integral
    by the doubled statistic u2 = 2*U = sum_x c_a(x) * (2*#{b below x} +
    #{b tied at x}); the identity u2_ab + u2_ba = 2*n_a*n_b is
    pytest-gated.  Output: (flag_a, flag_b, n_a, n_b, u2_ab, u2_ba)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {
                    "f": t["l_returnflag"],
                    "q": pc.cast(t["l_quantity"], pa.int64()),
                }
            ),
            ["f", "q"],
        ).aggregate([([], "count_all")])
        return g.rename_columns(["f", "q", "c"])

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["f", "q"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # <= |flags| x |qty domain| rows
    )
    flags = sorted(h["f"].unique())
    counts = {
        f: h[h["f"] == f].set_index("q")["c"].astype(int).to_dict()
        for f in flags
    }
    qs = sorted(h["q"].unique())
    rows = []
    for i, fa in enumerate(flags):
        for fb in flags[i + 1:]:
            ca, cb = counts[fa], counts[fb]
            below_b = below_a = 0
            u2_ab = u2_ba = 0
            for q in qs:
                a_x, b_x = ca.get(q, 0), cb.get(q, 0)
                u2_ab += a_x * (2 * below_b + b_x)
                u2_ba += b_x * (2 * below_a + a_x)
                below_b += b_x
                below_a += a_x
            rows.append(
                {
                    "flag_a": fa,
                    "flag_b": fb,
                    "n_a": sum(ca.values()),
                    "n_b": sum(cb.values()),
                    "u2_ab": u2_ab,
                    "u2_ba": u2_ba,
                }
            )
    out = pd.DataFrame(rows)
    for c in ("n_a", "n_b", "u2_ab", "u2_ba"):
        out[c] = out[c].astype("int64")
    return out


MANN_WHITNEY_QTY_SQL = """
WITH h AS (
  SELECT l_returnflag AS f, CAST(l_quantity AS BIGINT) AS q,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
flags AS (SELECT DISTINCT f FROM h),
pairs AS (SELECT a.f AS fa, b.f AS fb FROM flags a JOIN flags b ON a.f < b.f),
qs AS (SELECT DISTINCT q FROM h),
grid AS (
  SELECT p.fa, p.fb, q.q,
         COALESCE(ha.c, 0) AS ca, COALESCE(hb.c, 0) AS cb
  FROM pairs p CROSS JOIN qs q
  LEFT JOIN h ha ON ha.f = p.fa AND ha.q = q.q
  LEFT JOIN h hb ON hb.f = p.fb AND hb.q = q.q
),
w AS (
  SELECT fa, fb, ca, cb,
         COALESCE(SUM(cb) OVER (PARTITION BY fa, fb ORDER BY q
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cbb,
         COALESCE(SUM(ca) OVER (PARTITION BY fa, fb ORDER BY q
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cab
  FROM grid
)
SELECT fa AS flag_a, fb AS flag_b,
       CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
       CAST(SUM(ca * (2 * cbb + cb)) AS BIGINT) AS u2_ab,
       CAST(SUM(cb * (2 * cab + ca)) AS BIGINT) AS u2_ba
FROM w GROUP BY fa, fb ORDER BY fa, fb
"""


# -- Simpson's-paradox screen ----------------------------------------------------


def simpson_paradox_qty_discount(sf_dir: str) -> "object":
    """Simpson's-paradox screen for the (quantity, discount) association:
    the covariance NUMERATOR n*Sxy - Sx*Sy (the sign of the correlation,
    denominator-free) per return-flag stratum AND pooled ('ALL') — a sign
    flip between strata and pool is the aggregation-bias red flag every
    metrics review should run before acting on a pooled correlation.
    Quantity in units, discount in cents; exact Python-int products with
    the overflow-raising int64 cast (HUGEINT -> BIGINT in the oracle).
    ONE bounded per-flag moment fold.  Output: (stratum, n, cov_num)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ._relcommon import _read

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_discount"])

    def moments(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        d = pc.cast(pc.round(pc.multiply(t["l_discount"], 100)), pa.int64())
        folded = pa.table(
            {
                "f": t["l_returnflag"],
                "n": pa.array([1] * len(t), pa.int64()),
                "sx": q,
                "sy": d,
                "sxy": pc.multiply(q, d),
            }
        )
        return pa.TableGroupBy(folded, "f").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxy", "sum")]
        )

    m = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("f")
        .aggregate(
            Sum("n_sum", alias_name="n"),
            Sum("sx_sum", alias_name="sx"),
            Sum("sy_sum", alias_name="sy"),
            Sum("sxy_sum", alias_name="sxy"),
        )
        .to_pandas()  # O(|flags|)
    )
    rows = []
    for r in m.itertuples():
        n, sx, sy, sxy = int(r.n), int(r.sx), int(r.sy), int(r.sxy)
        rows.append({"stratum": r.f, "n": n, "cov_num": n * sxy - sx * sy})
    N = int(m["n"].sum())
    SX = int(m["sx"].sum())
    SY = int(m["sy"].sum())
    SXY = int(m["sxy"].sum())
    rows.append({"stratum": "ALL", "n": N, "cov_num": N * SXY - SX * SY})
    out = pd.DataFrame(sorted(rows, key=lambda r: r["stratum"]))
    out["n"] = out["n"].astype("int64")
    out["cov_num"] = out["cov_num"].astype("int64")  # raises on overflow
    return out.reset_index(drop=True)


SIMPSON_PARADOX_SQL = """
WITH x AS (
  SELECT l_returnflag AS f,
         CAST(ROUND(l_quantity) AS HUGEINT) AS q,
         CAST(ROUND(l_discount * 100) AS HUGEINT) AS d
  FROM lineitem
), per AS (
  SELECT f AS stratum, COUNT(*) AS n,
         COUNT(*) * SUM(q * d) - SUM(q) * SUM(d) AS cov_num
  FROM x GROUP BY f
), pooled AS (
  SELECT 'ALL' AS stratum, COUNT(*) AS n,
         COUNT(*) * SUM(q * d) - SUM(q) * SUM(d) AS cov_num
  FROM x
)
SELECT stratum, CAST(n AS BIGINT) AS n, CAST(cov_num AS BIGINT) AS cov_num
FROM (SELECT * FROM per UNION ALL SELECT * FROM pooled)
ORDER BY stratum
"""


# -- causal inference: stratified average treatment effect -----------------------


def ate_discount_strata(sf_dir: str) -> "object":
    """Stratified average-treatment-effect screen (the causal-inference
    companion to ``simpson_paradox_qty_discount``): treatment = deep
    discount (>= 5%), outcome = order quantity, stratum = return flag.
    Within a stratum the propensity is exactly n_t/n, so the stratified
    difference of means IS the IPW/ATE estimate under
    stratum-as-confounder; comparing the per-stratum rows against 'ALL'
    (the crude pooled contrast) is the confounding screen.  Effects are
    emitted as exact sufficient statistics plus a floor-scaled micro-unit
    contrast diff_micro = floor(1e6*(sy_t*n_c - sy_c*n_t)/(n_t*n_c)) —
    Python-int exact at any corpus size, HUGEINT with negative-safe floor
    emulation in the oracle.  ONE bounded per-(flag, treated) moment fold.
    Output: (stratum, n_t, n_c, sy_t, sy_c, diff_micro)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_discount"])

    def moments(t: pa.Table) -> pa.Table:
        y = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        d = pc.cast(pc.round(pc.multiply(t["l_discount"], 100)), pa.int64())
        tr = pc.cast(pc.greater_equal(d, 5), pa.int64())
        folded = pa.table(
            {
                "f": t["l_returnflag"],
                "tr": tr,
                "n": pa.array([1] * len(t), pa.int64()),
                "sy": y,
            }
        )
        return pa.TableGroupBy(folded, ["f", "tr"]).aggregate(
            [("n", "sum"), ("sy", "sum")]
        )

    m = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby(["f", "tr"])
        .aggregate(Sum("n_sum", alias_name="n"), Sum("sy_sum", alias_name="sy"))
        .to_pandas()  # <= 2 x |flags| rows
    )
    cells: dict[tuple[str, int], tuple[int, int]] = {
        (r.f, int(r.tr)): (int(r.n), int(r.sy)) for r in m.itertuples()
    }
    flags = sorted({f for f, _ in cells})
    rows = []

    def contrast(stratum: str, keys: list[str]) -> dict:
        n_t = sum(cells.get((f, 1), (0, 0))[0] for f in keys)
        sy_t = sum(cells.get((f, 1), (0, 0))[1] for f in keys)
        n_c = sum(cells.get((f, 0), (0, 0))[0] for f in keys)
        sy_c = sum(cells.get((f, 0), (0, 0))[1] for f in keys)
        num = 1_000_000 * (sy_t * n_c - sy_c * n_t)
        den = n_t * n_c
        return {
            "stratum": stratum,
            "n_t": n_t,
            "n_c": n_c,
            "sy_t": sy_t,
            "sy_c": sy_c,
            "diff_micro": num // den if den else 0,
        }

    for f in flags:
        rows.append(contrast(f, [f]))
    rows.append(contrast("ALL", flags))
    out = pd.DataFrame(sorted(rows, key=lambda r: r["stratum"]))
    for c in ("n_t", "n_c", "sy_t", "sy_c", "diff_micro"):
        out[c] = out[c].astype("int64")  # raises on overflow
    return out.reset_index(drop=True)


ATE_DISCOUNT_STRATA_SQL = """
WITH x AS (
  SELECT l_returnflag AS f,
         CASE WHEN CAST(ROUND(l_discount * 100) AS BIGINT) >= 5
              THEN 1 ELSE 0 END AS tr,
         CAST(ROUND(l_quantity) AS HUGEINT) AS y
  FROM lineitem
), per AS (
  SELECT f AS stratum,
         SUM(tr) AS n_t, SUM(1 - tr) AS n_c,
         SUM(tr * y) AS sy_t, SUM((1 - tr) * y) AS sy_c
  FROM x GROUP BY f
  UNION ALL
  SELECT 'ALL', SUM(tr), SUM(1 - tr), SUM(tr * y), SUM((1 - tr) * y) FROM x
), d AS (
  SELECT *, 1000000 * (sy_t * n_c - sy_c * n_t) AS num, n_t * n_c AS den
  FROM per
)
SELECT stratum,
       CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
       CAST(sy_t AS BIGINT) AS sy_t, CAST(sy_c AS BIGINT) AS sy_c,
       CAST(CASE WHEN den = 0 THEN 0
            ELSE (num - ((num % den) + den) % den) // den END
            AS BIGINT) AS diff_micro
FROM d ORDER BY stratum
"""


# -- multivariate OLS via Cramer determinants ------------------------------------


def ols_price_model(sf_dir: str) -> "object":
    """Per-return-flag ordinary-least-squares fit of
    price_dollars ~ b0 + b1*quantity + b2*discount_pct via the 3x3 normal
    equations solved with CRAMER determinants in exact integer arithmetic
    — the closed-form multivariate-regression primitive (the bivariate
    companions are ``corr_qty_price`` / ``value_trend_per_type``).  Nine
    moments fold map-side (one bounded exchange); the driver expands the
    determinants in Python ints (never overflows) and emits floor-scaled
    micro-unit coefficients beta_i_micro = floor(1e6 * det_i / det); the
    oracle replays the same determinant polynomial in HUGEINT with the
    negative-safe floor emulation (the ``theil_sen_by_type`` pattern).
    Output: (flag, n, b0_micro, b1_micro, b2_micro)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_quantity", "l_discount", "l_extendedprice"],
    )

    def moments(t: pa.Table) -> pa.Table:
        x1 = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        x2 = pc.cast(pc.round(pc.multiply(t["l_discount"], 100)), pa.int64())
        y = pc.cast(pc.floor(t["l_extendedprice"]), pa.int64())
        folded = pa.table(
            {
                "f": t["l_returnflag"],
                "n": pa.array([1] * len(t), pa.int64()),
                "s1": x1,
                "s2": x2,
                "s11": pc.multiply(x1, x1),
                "s12": pc.multiply(x1, x2),
                "s22": pc.multiply(x2, x2),
                "sy": y,
                "s1y": pc.multiply(x1, y),
                "s2y": pc.multiply(x2, y),
            }
        )
        return pa.TableGroupBy(folded, "f").aggregate(
            [(c, "sum") for c in folded.column_names if c not in ("f",)]
        )

    cols = ["n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y"]
    m = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("f")
        .aggregate(*[Sum(f"{c}_sum", alias_name=c) for c in cols])
        .to_pandas()  # O(|flags|)
    )
    rows = []
    for r in m.itertuples():
        n, s1, s2 = int(r.n), int(r.s1), int(r.s2)
        s11, s12, s22 = int(r.s11), int(r.s12), int(r.s22)
        sy, s1y, s2y = int(r.sy), int(r.s1y), int(r.s2y)
        det = (
            n * (s11 * s22 - s12 * s12)
            - s1 * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s12 - s11 * s2)
        )
        det0 = (
            sy * (s11 * s22 - s12 * s12)
            - s1 * (s1y * s22 - s12 * s2y)
            + s2 * (s1y * s12 - s11 * s2y)
        )
        det1 = (
            n * (s1y * s22 - s12 * s2y)
            - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2)
        )
        det2 = (
            n * (s11 * s2y - s1y * s12)
            - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2)
        )
        rows.append(
            {
                "flag": r.f,
                "n": n,
                "b0_micro": (1_000_000 * det0) // det,
                "b1_micro": (1_000_000 * det1) // det,
                "b2_micro": (1_000_000 * det2) // det,
            }
        )
    out = pd.DataFrame(sorted(rows, key=lambda r: r["flag"]))
    for c in ("n", "b0_micro", "b1_micro", "b2_micro"):
        out[c] = out[c].astype("int64")  # raises on overflow
    return out.reset_index(drop=True)


OLS_PRICE_MODEL_SQL = """
WITH x AS (
  SELECT l_returnflag AS f,
         CAST(ROUND(l_quantity) AS HUGEINT) AS x1,
         CAST(ROUND(l_discount * 100) AS HUGEINT) AS x2,
         CAST(FLOOR(l_extendedprice) AS HUGEINT) AS y
  FROM lineitem
), m AS (
  SELECT f, COUNT(*) AS n, SUM(x1) AS s1, SUM(x2) AS s2,
         SUM(x1*x1) AS s11, SUM(x1*x2) AS s12, SUM(x2*x2) AS s22,
         SUM(y) AS sy, SUM(x1*y) AS s1y, SUM(x2*y) AS s2y
  FROM x GROUP BY f
), d AS (
  SELECT f, n,
         n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
           + s2*(s1*s12 - s11*s2) AS det,
         sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
           + s2*(s1y*s12 - s11*s2y) AS det0,
         n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
           + s2*(s1*s2y - s1y*s2) AS det1,
         n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
           + sy*(s1*s12 - s11*s2) AS det2
  FROM m
)
SELECT f AS flag, CAST(n AS BIGINT) AS n,
  CAST((1000000*det0 - (((1000000*det0) % det) + det) % det) // det
       AS BIGINT) AS b0_micro,
  CAST((1000000*det1 - (((1000000*det1) % det) + det) % det) // det
       AS BIGINT) AS b1_micro,
  CAST((1000000*det2 - (((1000000*det2) % det) + det) % det) // det
       AS BIGINT) AS b2_micro
FROM d ORDER BY f
"""


# -- RANSAC robust line fit ------------------------------------------------------

RANSAC_CANDS = 16
RANSAC_TOL_C = 2_000  # inlier tolerance: 2000 floored dollars x |dx| cleared


def ransac_price_fit(sf_dir: str) -> "object":
    """RANSAC robust line fit of price ~ quantity (Fischler-Bolles, made
    fully deterministic): the 32 sample rows are the md5-lowest lineitem
    keys (distributed per-batch top-32 merge — no global sort), paired
    in md5 order into 16 candidate lines ((orderkey, linenumber) is NOT
    unique in this corpus, so the sample order tie-breaks through (x, y)
    as well); a row is an INLIER of the line
    through (x1,y1),(x2,y2) iff |(y-y1)*dx - (x-x1)*dy| <= TOL*|dx| —
    the cleared-denominator point-to-line test, exact ints everywhere so
    the winning candidate (inliers DESC, cand ASC) hash-matches.  One
    broadcast consensus pass with per-batch count partials.  Degenerate
    dx = 0 candidates score 0 by definition.  Output: one row
    (cand, x1, y1, dx, dy, n_inliers)."""
    import hashlib

    import pandas as pd

    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )

    def local_top(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_pylist()
        ln = t["l_linenumber"].to_pylist()
        x = pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_pylist()
        y = pc.cast(pc.floor(t["l_extendedprice"]), pa.int64()).to_pylist()
        rows = sorted(
            (
                hashlib.md5(f"{o}-{l}".encode()).hexdigest(),
                int(o), int(l), int(xi), int(yi),
            )
            for o, l, xi, yi in zip(ok, ln, x, y)
        )[: 2 * RANSAC_CANDS]
        return pa.table(
            {
                "h": pa.array([r[0] for r in rows], pa.string()),
                "o": pa.array([r[1] for r in rows], pa.int64()),
                "l": pa.array([r[2] for r in rows], pa.int64()),
                "x": pa.array([r[3] for r in rows], pa.int64()),
                "y": pa.array([r[4] for r in rows], pa.int64()),
            }
        )

    top = (
        ds.map_batches(local_top, batch_format="pyarrow")
        .to_pandas()  # <= 32 x n_blocks rows
        .sort_values(["h", "o", "l", "x", "y"])
        .head(2 * RANSAC_CANDS)
        .reset_index(drop=True)
    )
    cands = []
    for i in range(RANSAC_CANDS):
        a, b = top.iloc[2 * i], top.iloc[2 * i + 1]
        cands.append(
            (i, int(a["x"]), int(a["y"]),
             int(b["x"]) - int(a["x"]), int(b["y"]) - int(a["y"]))
        )
    ref = ray.put(cands)

    def consensus(t: pa.Table) -> pa.Table:
        import numpy as np

        cs = ray.get(ref)
        x = np.asarray(
            pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_pylist(),
            dtype=np.int64,
        )
        y = np.asarray(
            pc.cast(pc.floor(t["l_extendedprice"]), pa.int64()).to_pylist(),
            dtype=np.int64,
        )
        out_c, out_n = [], []
        for i, x1, y1, dx, dy in cs:
            if dx == 0:
                n_in = 0
            else:
                resid = np.abs((y - y1) * dx - (x - x1) * dy)
                n_in = int((resid <= RANSAC_TOL_C * abs(dx)).sum())
            out_c.append(i)
            out_n.append(n_in)
        return pa.table(
            {"cand": pa.array(out_c, pa.int64()),
             "n_in": pa.array(out_n, pa.int64())}
        )

    counts = (
        ds.map_batches(consensus, batch_format="pyarrow")
        .groupby("cand")
        .aggregate(Sum("n_in", alias_name="n_inliers"))
        .to_pandas()  # 16 rows
    )
    merged = {int(r.cand): int(r.n_inliers) for r in counts.itertuples()}
    best = min(
        cands, key=lambda c: (-(merged.get(c[0], 0) if c[3] != 0 else 0), c[0])
    )
    i, x1, y1, dx, dy = best
    n_in = merged.get(i, 0) if dx != 0 else 0
    return pd.DataFrame(
        {
            "cand": pd.Series([i], dtype="int64"),
            "x1": pd.Series([x1], dtype="int64"),
            "y1": pd.Series([y1], dtype="int64"),
            "dx": pd.Series([dx], dtype="int64"),
            "dy": pd.Series([dy], dtype="int64"),
            "n_inliers": pd.Series([n_in], dtype="int64"),
        }
    )


RANSAC_PRICE_FIT_SQL = f"""
WITH pts AS (
  SELECT md5(CAST(l_orderkey AS VARCHAR) || '-'
             || CAST(l_linenumber AS VARCHAR)) AS h,
         l_orderkey AS o, l_linenumber AS l,
         CAST(ROUND(l_quantity) AS BIGINT) AS x,
         CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
), samp AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY h, o, l, x, y) - 1 AS rn
  FROM pts QUALIFY rn < {2 * RANSAC_CANDS}
), cands AS (
  SELECT a.rn // 2 AS cand, a.x AS x1, a.y AS y1,
         b.x - a.x AS dx, b.y - a.y AS dy
  FROM samp a JOIN samp b ON b.rn = a.rn + 1
  WHERE a.rn % 2 = 0
), scored AS (
  SELECT c.cand, c.x1, c.y1, c.dx, c.dy,
         CASE WHEN c.dx = 0 THEN 0
              ELSE COUNT(*) FILTER (
                WHERE ABS((p.y - c.y1) * c.dx - (p.x - c.x1) * c.dy)
                      <= {RANSAC_TOL_C} * ABS(c.dx)) END AS n_inliers
  FROM cands c CROSS JOIN pts p
  GROUP BY c.cand, c.x1, c.y1, c.dx, c.dy
)
SELECT CAST(cand AS BIGINT) AS cand, CAST(x1 AS BIGINT) AS x1,
       CAST(y1 AS BIGINT) AS y1, CAST(dx AS BIGINT) AS dx,
       CAST(dy AS BIGINT) AS dy, CAST(n_inliers AS BIGINT) AS n_inliers
FROM scored ORDER BY n_inliers DESC, cand LIMIT 1
"""


# -- deterministic permutation test ----------------------------------------------

PERM_TEST_ROUNDS = 16


def perm_test_discount_qty(sf_dir: str) -> "object":
    """Permutation test for the quantity difference between deep-discount
    (>= 5%) and shallow-discount lineitems, with the permutations drawn
    DETERMINISTICALLY: pseudo-relabeling r assigns each row to group
    md5(key || ':' || r) % 2, and the observed |cleared mean gap| is
    compared against the 16 relabeled gaps — p_num = #{r : |gap_r| >=
    |gap_obs|} is the exact numerator of the one-sided permutation
    p-value on this fixed permutation set.  Cleared comparison
    |sy_a*n_b - sy_b*n_a| cross-multiplied across denominators keeps
    everything in exact ints (Python / HUGEINT).  ONE pass folds all 17
    labelings' moments (17 columns of partials, no reshuffle).  Output:
    one row (n_deep, n_shallow, gap_num_obs, p_num, n_perms)."""
    import hashlib

    import pandas as pd

    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"],
    )
    R = PERM_TEST_ROUNDS

    def moments(t: pa.Table) -> pa.Table:
        import numpy as np

        q = np.asarray(
            pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_pylist(),
            dtype=np.int64,
        )
        d = np.asarray(
            pc.cast(pc.round(pc.multiply(t["l_discount"], 100)),
                    pa.int64()).to_pylist(),
            dtype=np.int64,
        )
        keys = [
            f"{o}-{l}"
            for o, l in zip(t["l_orderkey"].to_pylist(),
                            t["l_linenumber"].to_pylist())
        ]
        cols = {"one": pa.array([1] * len(q), pa.int64())}
        obs = (d >= 5).astype(np.int64)
        cols["n_a0"] = pa.array((obs == 1).astype(np.int64), pa.int64())
        cols["s_a0"] = pa.array(q * (obs == 1), pa.int64())
        cols["s_all"] = pa.array(q, pa.int64())
        for r in range(1, R + 1):
            lab = np.array(
                [
                    int(hashlib.md5(f"{k}:{r}".encode()).hexdigest()[:8], 16)
                    % 2
                    for k in keys
                ],
                dtype=np.int64,
            )
            cols[f"n_a{r}"] = pa.array(lab, pa.int64())
            cols[f"s_a{r}"] = pa.array(q * lab, pa.int64())
        folded = pa.table(cols)
        out = {c: [int(pc.sum(folded[c]).as_py() or 0)] for c in cols}
        return pa.table({c: pa.array(v, pa.int64()) for c, v in out.items()})

    agg_cols = ["one", "n_a0", "s_a0", "s_all"] + [
        f"{p}{r}" for r in range(1, R + 1) for p in ("n_a", "s_a")
    ]
    m = (
        ds.map_batches(moments, batch_format="pyarrow")
        .to_pandas()  # one row per block
        .sum()
    )
    N = int(m["one"])
    S = int(m["s_all"])

    def gap(n_a: int, s_a: int) -> int:
        n_b, s_b = N - n_a, S - s_a
        return abs(s_a * n_b - s_b * n_a), n_a * n_b

    g_obs, den_obs = gap(int(m["n_a0"]), int(m["s_a0"]))
    p_num = 0
    for r in range(1, R + 1):
        g_r, den_r = gap(int(m[f"n_a{r}"]), int(m[f"s_a{r}"]))
        # compare |gap_r| >= |gap_obs| as fractions: g_r/den_r >= g_obs/den_obs
        if den_r == 0:
            continue
        if g_r * den_obs >= g_obs * den_r:
            p_num += 1
    return pd.DataFrame(
        {
            "n_deep": pd.Series([int(m["n_a0"])], dtype="int64"),
            "n_shallow": pd.Series([N - int(m["n_a0"])], dtype="int64"),
            "gap_num_obs": pd.Series([g_obs], dtype="int64"),
            "p_num": pd.Series([p_num], dtype="int64"),
            "n_perms": pd.Series([R], dtype="int64"),
        }
    )


def _perm_test_sql(rounds: int = PERM_TEST_ROUNDS) -> str:
    perm_cols = ", ".join(
        f"SUM(CASE WHEN CAST(concat('0x', substr(md5(k || ':' || {r}), 1, 8))"
        f" AS BIGINT) % 2 = 1 THEN 1 ELSE 0 END) AS n_a{r},"
        f" SUM(CASE WHEN CAST(concat('0x', substr(md5(k || ':' || {r}), 1, 8))"
        f" AS BIGINT) % 2 = 1 THEN q ELSE 0 END) AS s_a{r}"
        for r in range(1, rounds + 1)
    )
    cmps = " + ".join(
        f"(CASE WHEN ABS(s_a{r} * (cnt - n_a{r}) - (s_all - s_a{r}) * n_a{r})"
        f" * (n_a0 * (cnt - n_a0))"
        f" >= ABS(s_a0 * (cnt - n_a0) - (s_all - s_a0) * n_a0)"
        f" * (n_a{r} * (cnt - n_a{r}))"
        f" AND n_a{r} * (cnt - n_a{r}) > 0 THEN 1 ELSE 0 END)"
        for r in range(1, rounds + 1)
    )
    return f"""
WITH x AS (
  SELECT CAST(l_orderkey AS VARCHAR) || '-'
           || CAST(l_linenumber AS VARCHAR) AS k,
         CAST(CAST(ROUND(l_quantity) AS BIGINT) AS HUGEINT) AS q,
         CASE WHEN CAST(ROUND(l_discount * 100) AS BIGINT) >= 5
              THEN 1 ELSE 0 END AS obs
  FROM lineitem
), m AS (
  SELECT COUNT(*) AS cnt, SUM(q) AS s_all,
         SUM(obs) AS n_a0, SUM(obs * q) AS s_a0,
         {perm_cols}
  FROM x
)
SELECT CAST(n_a0 AS BIGINT) AS n_deep,
       CAST(cnt - n_a0 AS BIGINT) AS n_shallow,
       CAST(ABS(s_a0 * (cnt - n_a0) - (s_all - s_a0) * n_a0) AS BIGINT)
         AS gap_num_obs,
       CAST({cmps} AS BIGINT) AS p_num,
       {rounds} AS n_perms
FROM m
"""


PERM_TEST_DISCOUNT_QTY_SQL = _perm_test_sql()
