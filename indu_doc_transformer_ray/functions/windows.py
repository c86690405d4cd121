"""Window-function operators: running totals and lag gaps per key.

The reference engine has no window functions (its pipelines are
page-sequential; see SURVEY.md §2.8) — this is the engine-addition window
family over the TPC-H-ish ``orders`` table, built on the same coarse-bucket
co-location pattern as ``top2_orders_per_customer`` (relational.py): rows
are bucketed by a cheap hash of the PARTITION BY key, then ONE
``groupby(bucket).map_groups`` call runs a vectorized pandas kernel that
handles every key in the bucket at once (sort + ``groupby().cumsum()`` /
``shift()``) — never a per-key Python call.

Scale notes
-----------
- Bucket count derives from the table row count (``_util.n_buckets``), so
  an in-bucket frame holds ~64k rows at any corpus size; the only shuffle
  is the bucketed groupby (a window function NEEDS one key exchange — this
  is the minimal one, and the bucket key reuses the partition key's hash so
  a pre-partitioned input would need none).
- Timestamps are converted to int64 microseconds in the Arrow projection
  stage, so the pandas kernel never touches datetime dtypes (pandas
  silently promotes to ns resolution, which has bitten this repo before —
  see events.py cohort_retention).
- Exactness: money stays integer cents end-to-end, gaps are integer days
  (dates are midnight-aligned), so results hash-match the DuckDB oracle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data import Dataset

from ._util import n_buckets

_DAY_US = 86_400_000_000


def _orders_bucketed(sf_dir: str, value_cols: dict[str, str]) -> tuple[Dataset, int]:
    """orders → (cb, o_custkey, o_orderkey, od_us, *value_cols) with a
    derived customer-hash bucket column.  ``value_cols`` maps output name →
    source column for extra per-row values (converted to cents if the name
    ends in ``_c2``)."""
    import pyarrow.parquet as pq

    buckets = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)
    cols = ["o_orderkey", "o_custkey", "o_orderdate", *value_cols.values()]
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)

    def scale(t: pa.Table) -> pa.Table:
        cust = pc.cast(t["o_custkey"], pa.int64())
        out = {
            "cb": pc.cast(pc.bit_wise_and(cust, buckets - 1), pa.int32()),
            "o_custkey": cust,
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "od_us": pc.cast(t["o_orderdate"].cast(pa.timestamp("us")), pa.int64()),
        }
        for name, src in value_cols.items():
            col = t[src]
            if name.endswith("_c2"):
                col = pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())
            out[name] = col
        return pa.table(out)

    return ds.map_batches(scale, batch_format="pyarrow"), buckets


def running_total_per_customer(sf_dir: str) -> Dataset:
    """Cumulative order value per customer ordered by (date, orderkey) —
    the ``SUM(...) OVER (PARTITION BY ... ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`` shape.  One bucketed shuffle; the in-bucket kernel sorts
    once and runs a single vectorized ``groupby().cumsum()`` over every
    customer in the bucket."""
    import pandas as pd

    bucketed, _ = _orders_bucketed(sf_dir, {"price_c2": "o_totalprice"})

    def running(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["o_custkey", "od_us", "o_orderkey"])
        run = g.groupby("o_custkey")["price_c2"].cumsum()
        # arrow out: the final global sort shuffles these blocks, and
        # pandas blocks pay ~13x through the sort machinery
        return pa.table(
            {
                "o_custkey": pa.array(g["o_custkey"].astype("int64").values),
                "o_orderkey": pa.array(g["o_orderkey"].astype("int64").values),
                "running_c2": pa.array(run.astype("int64").values),
            }
        )

    return (
        bucketed.groupby("cb")
        .map_groups(running, batch_format="pandas")
        .sort(["o_custkey", "o_orderkey"])
    )


RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_c2
FROM orders
ORDER BY o_custkey, o_orderkey
"""


def order_gaps(sf_dir: str) -> Dataset:
    """Days since the same customer's previous order — the ``LAG()`` shape.
    Same single bucketed shuffle; the kernel sorts once and uses a
    vectorized ``groupby().shift(1)``.  First orders (no prior) are
    dropped, mirroring the oracle's ``WHERE prev IS NOT NULL`` — emitting
    them would force a nullable column through the hash compare."""
    import pandas as pd

    bucketed, _ = _orders_bucketed(sf_dir, {})

    def gaps(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["o_custkey", "od_us", "o_orderkey"])
        prev = g.groupby("o_custkey")["od_us"].shift(1)
        keep = prev.notna()
        gap = ((g.loc[keep, "od_us"] - prev[keep]) // _DAY_US).astype("int64")
        return pa.table(
            {
                "o_custkey": pa.array(g.loc[keep, "o_custkey"].astype("int64").values),
                "o_orderkey": pa.array(g.loc[keep, "o_orderkey"].astype("int64").values),
                "gap_days": pa.array(gap.values),
            }
        )

    return (
        bucketed.groupby("cb")
        .map_groups(gaps, batch_format="pandas")
        .sort(["o_custkey", "o_orderkey"])
    )


ORDER_GAPS_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(DATE_DIFF('day', prev_dt, o_orderdate) AS BIGINT) AS gap_days
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         LAG(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_dt
  FROM orders
)
WHERE prev_dt IS NOT NULL
ORDER BY o_custkey, o_orderkey
"""
