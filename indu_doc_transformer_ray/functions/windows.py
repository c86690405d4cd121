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
    from ._util import read_small_aware

    ds = read_small_aware(f"{sf_dir}/orders.parquet", columns=cols)

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


def rolling_window_orders(sf_dir: str) -> Dataset:
    """3-row moving window per customer — the ``ROWS BETWEEN 2 PRECEDING
    AND CURRENT ROW`` frame shape.  Same single bucketed shuffle as
    ``running_total_per_customer``; the in-bucket kernel runs ONE
    vectorized ``groupby().rolling(3)`` over every customer in the bucket.
    Emitted as integer (window sum, window count) pairs instead of a float
    average so the hash compare vs the oracle is exact."""
    import pandas as pd

    bucketed, _ = _orders_bucketed(sf_dir, {"price_c2": "o_totalprice"})

    def roll(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["o_custkey", "od_us", "o_orderkey"])
        r = g.groupby("o_custkey")["price_c2"].rolling(3, min_periods=1)
        win_sum = r.sum().reset_index(level=0, drop=True)
        win_n = r.count().reset_index(level=0, drop=True)
        return pa.table(
            {
                "o_custkey": pa.array(g["o_custkey"].astype("int64").values),
                "o_orderkey": pa.array(g["o_orderkey"].astype("int64").values),
                "win_sum_c2": pa.array(win_sum.astype("int64").values),
                "win_n": pa.array(win_n.astype("int64").values),
            }
        )

    return (
        bucketed.groupby("cb")
        .map_groups(roll, batch_format="pandas")
        .sort(["o_custkey", "o_orderkey"])
    )


ROLLING_WINDOW_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(price_c2) OVER w AS BIGINT) AS win_sum_c2,
       CAST(COUNT(*) OVER w AS BIGINT) AS win_n
FROM (SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_c2 FROM orders)
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""

#: Decile targets in rank micro-units, rank k = floor(q*(n-1)) 0-based —
#: the exact_price_quantiles convention.
_DECILE_MU = tuple(q * 100_000 for q in range(1, 10))
_HIST_WIDTH = 4_096


def price_decile(sf_dir: str) -> Dataset:
    """Global value-decile assignment WITHOUT a global sort — the NTILE-by-
    value shape (width_bucket over exact decile cut points, so ties get a
    deterministic bucket, unlike NTILE's arbitrary tie splits).  Pass 1 is
    the two-pass counting-histogram exact quantile (sketches.
    exact_price_quantiles) over order price cents yielding the 9 cut
    points (driver holds ~domain/4096 bucket counts, never rows); pass 2
    streams the table once assigning decile = 1 + #cutpoints strictly
    below the price.  Output: (o_orderkey, price_c2, decile)."""
    import pandas as pd

    from ._util import read_small_aware

    ds = read_small_aware(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def hist(t: pa.Table) -> pa.Table:
        from .sketches import _floor_bucket

        v = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        folded = pa.table({"b": _floor_bucket(v, _HIST_WIDTH)})
        return pa.TableGroupBy(folded, "b").aggregate([([], "count_all")])

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    n = int(counts["n"].sum())
    cum = counts["n"].cumsum()
    targets = {q: (q * (n - 1)) // 1_000_000 for q in _DECILE_MU}
    need: dict[int, list[tuple[int, int]]] = {}
    for q, k in targets.items():
        i = int((cum > k).idxmax())
        b = int(counts.loc[i, "b"])
        before = int(cum.iloc[i - 1]) if i > 0 else 0
        need.setdefault(b, []).append((q, k - before))
    wanted = pa.array(sorted(need), pa.int64())

    def in_bucket(t: pa.Table) -> pa.Table:
        from .sketches import _floor_bucket

        v = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        sub = pa.table({"b": _floor_bucket(v, _HIST_WIDTH), "v": v}).filter(
            pc.is_in(_floor_bucket(v, _HIST_WIDTH), value_set=wanted)
        )
        return pa.TableGroupBy(sub, ["b", "v"]).aggregate([([], "count_all")])

    fine = (
        ds.map_batches(in_bucket, batch_format="pyarrow")
        .groupby(["b", "v"])
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    cuts = []
    for b, qs in need.items():
        g = fine[fine["b"] == b].sort_values("v").reset_index(drop=True)
        gc = g["n"].cumsum()
        for _q, rk in qs:
            j = int((gc > rk).idxmax())
            cuts.append(int(g.loc[j, "v"]))
    cut_arr = pa.array(sorted(cuts), pa.int64())

    def assign(t: pa.Table) -> pa.Table:
        import numpy as np

        v = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
        ).to_numpy()
        dec = 1 + np.searchsorted(
            np.asarray(cut_arr), v, side="left"
        ).astype("int64")
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "price_c2": pa.array(v),
                "decile": pa.array(dec),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


PRICE_DECILE_SQL = f"""
WITH x AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS v FROM orders),
nn AS (SELECT COUNT(*) AS n FROM x),
o AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rk FROM x),
qs(q_mu) AS (VALUES {",".join(f"({q})" for q in _DECILE_MU)}),
cuts AS (
  SELECT o.v AS cut FROM qs, nn
  JOIN o ON o.rk = (q_mu * (n - 1)) // 1000000 + 1
)
SELECT x.o_orderkey, CAST(x.v AS BIGINT) AS price_c2,
       CAST(1 + COALESCE((SELECT COUNT(*) FROM cuts WHERE cut < x.v), 0)
            AS BIGINT) AS decile
FROM x
"""


# -- distributed global ROW_NUMBER (rank without a global sort) ---------------

_RANK_BUCKET_C2 = 4_096  # cents per counting bucket (the sketches.py width)

#: max rows ONE rank task may co-locate; a value bucket over this splits by
#: the tie-break key (override in tests to force the salted path)
RANK_TASK_BOUND = 1 << 18


def global_price_rank(sf_dir: str) -> Dataset:
    """Global ROW_NUMBER over (o_totalprice DESC, o_orderkey ASC) WITHOUT a
    global sort: the distributed rank-assignment primitive (leaderboards,
    curriculum ordering, systematic sampling all sit on it).  Pass 1 folds
    batch-side counting-histogram partials (``price // 4096`` buckets);
    the driver turns the O(domain/4096) bucket counts into "rows above
    this bucket" offsets; pass 2 co-locates each bucket's rows once,
    sorts locally, and adds the offset — every rank is exact, contiguous
    and unique, but no machine ever holds more than one bucket.  A global
    ``Dataset.sort`` would ship the corpus through a range partitioner
    AND materialize sorted blocks; this ships each row once and the
    exchange key is the histogram bucket.

    Skew guard (a near-constant value distribution would collapse the
    corpus into ONE bucket): any bucket whose pass-1 count exceeds
    ``RANK_TASK_BOUND`` is SALTED by the tie-break key — an extra counting
    pass folds (value, orderkey // 4096) partials for just those buckets,
    the driver derives exact per-group offsets from the counts (ordering
    within equal values is by orderkey, and the orderkey bucket is
    monotone in orderkey, so groups concatenate exactly), and pass 2
    exchanges on the salted key.  Per-task rows are then bounded by
    max(bound, rows per (value, 4096-wide orderkey range)); driver state is
    O(buckets + fine groups), counts only, never rows.  Output:
    (o_orderkey, price_c2, rnk)."""
    import numpy as np
    import pandas as pd

    from .sketches import _floor_bucket

    from ._util import read_small_aware

    ds = read_small_aware(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def hist(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        folded = pa.table({"b": _floor_bucket(v, _RANK_BUCKET_C2)})
        return pa.TableGroupBy(folded, "b").aggregate([([], "count_all")])

    counts = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("b")
        .aggregate(ray.data.aggregate.Sum("count_all", alias_name="n"))
        .to_pandas()  # O(domain / 4096)
        .sort_values("b", ascending=False)
        .reset_index(drop=True)
    )
    # offset[b] = rows in strictly HIGHER buckets (rank 1 = highest price)
    above = counts["n"].cumsum().shift(1).fillna(0).astype("int64")
    bucket_offsets = dict(zip(counts["b"].astype(int), above))
    overfull = {
        int(b)
        for b, n in zip(counts["b"], counts["n"])
        if int(n) > RANK_TASK_BOUND
    }

    # group key -> rank offset; normal buckets key "b<b>", salted fine
    # groups key "f<v>|<okb>"
    offsets: dict[str, int] = {
        f"b{b}": int(off) for b, off in bucket_offsets.items()
        if b not in overfull
    }
    if overfull:
        over_arr = pa.array(sorted(overfull), pa.int64())

        def fine_hist(t: pa.Table) -> pa.Table:
            v = pc.cast(
                pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
            )
            ok = pc.cast(t["o_orderkey"], pa.int64())
            sub = pa.table(
                {
                    "b": _floor_bucket(v, _RANK_BUCKET_C2),
                    "v": v,
                    "okb": _floor_bucket(ok, _RANK_BUCKET_C2),
                }
            ).filter(pc.is_in(_floor_bucket(v, _RANK_BUCKET_C2),
                              value_set=over_arr))
            return pa.TableGroupBy(sub, ["b", "v", "okb"]).aggregate(
                [([], "count_all")]
            )

        fine = (
            ds.map_batches(fine_hist, batch_format="pyarrow")
            .groupby(["b", "v", "okb"])
            .aggregate(ray.data.aggregate.Sum("count_all", alias_name="n"))
            .to_pandas()  # counts per (value, orderkey-range), never rows
        )
        for b, sub in fine.groupby("b"):
            sub = sub.sort_values(
                ["v", "okb"], ascending=[False, True]
            ).reset_index(drop=True)
            above_in_bucket = (
                sub["n"].cumsum().shift(1).fillna(0).astype("int64")
            )
            base = int(bucket_offsets[int(b)])
            for v, okb, off in zip(sub["v"], sub["okb"], above_in_bucket):
                offsets[f"f{int(v)}|{int(okb)}"] = base + int(off)

    overfull_arr = pa.array(sorted(overfull), pa.int64())

    def keyed(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        ok = pc.cast(t["o_orderkey"], pa.int64())
        b = _floor_bucket(v, _RANK_BUCKET_C2)
        if not overfull:
            # common path: the exchange key stays a plain int64 (a string
            # key measurably slows the co-location shuffle)
            return pa.table({"gk": b, "o_orderkey": ok, "price_c2": v})
        gk = pc.binary_join_element_wise("b", pc.cast(b, pa.string()), "")
        salted = pc.binary_join_element_wise(
            "f",
            pc.cast(v, pa.string()),
            "|",
            pc.cast(_floor_bucket(ok, _RANK_BUCKET_C2), pa.string()),
            "",
        )
        gk = pc.if_else(pc.is_in(b, value_set=overfull_arr), salted, gk)
        return pa.table({"gk": gk, "o_orderkey": ok, "price_c2": v})

    def rank_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(
            ["price_c2", "o_orderkey"], ascending=[False, True]
        ).reset_index(drop=True)
        k = g["gk"].iloc[0]
        base = int(offsets[f"b{int(k)}" if not overfull else str(k)])
        return pa.table(
            {
                "o_orderkey": pa.array(g["o_orderkey"].values, pa.int64()),
                "price_c2": pa.array(g["price_c2"].values, pa.int64()),
                "rnk": pa.array(
                    base + np.arange(1, len(g) + 1, dtype=np.int64)
                ),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(rank_bucket, batch_format="pandas")
    )


GLOBAL_PRICE_RANK_SQL = """
SELECT o_orderkey,
       CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_c2,
       CAST(row_number() OVER (
           ORDER BY ROUND(o_totalprice*100) DESC, o_orderkey) AS BIGINT)
         AS rnk
FROM orders
"""


# -- ordered string aggregation (sequence build per key) ----------------------

def customer_order_seq(sf_dir: str) -> Dataset:
    """Per-customer '|'-joined orderkey sequence in (o_orderdate,
    o_orderkey) order — the ordered STRING_AGG shape (sequence features
    for behavioral models ride exactly this).  Same single bucketed
    exchange as the other window ops; the in-bucket kernel sorts once and
    joins per customer (the join itself is C-level; group count per bucket
    is bounded by the derived bucket sizing).  Output: (o_custkey, seq)."""
    import pandas as pd

    bucketed, _ = _orders_bucketed(sf_dir, {})

    def seq(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["o_custkey", "od_us", "o_orderkey"])
        s = g.groupby("o_custkey")["o_orderkey"].agg(
            lambda k: "|".join(map(str, k))
        )
        return pa.table(
            {
                "o_custkey": pa.array(s.index.to_numpy("int64")),
                "seq": pa.array(s.to_numpy(), pa.string()),
            }
        )

    return bucketed.groupby("cb").map_groups(seq, batch_format="pandas")


CUSTOMER_ORDER_SEQ_SQL = """
SELECT o_custkey,
       STRING_AGG(CAST(o_orderkey AS VARCHAR), '|'
                  ORDER BY o_orderdate, o_orderkey) AS seq
FROM orders GROUP BY o_custkey ORDER BY o_custkey
"""

# -- exact distributed Gini coefficient (inequality audit) --------------------

_GINI_SPLIT = 1 << 62  # hi/lo carry base for 128-bit-exact int64 transport


def gini_by_status(sf_dir: str):
    """EXACT Gini coefficient of ``o_totalprice`` per ``o_orderstatus``
    WITHOUT a global sort and WITHOUT shuffling a single corpus row — the
    inequality/concentration audit a corpus curator runs over source sizes
    or spend distributions.  Uses the identity
    G = (2·Σ i·v_i − (n+1)·Σv) / (n·Σv) with v ascending (1-based rank i);
    Σ i·v_i is tie-order invariant, so it is a pure function of the
    per-VALUE counts: a run of c equal values v occupying ranks
    a+1..a+c contributes v·(a·c + c(c+1)/2).

    Distributed plan (one count-row exchange, total):  per-batch Arrow
    partials fold (status, bucket, value) → count with bucket =
    value // 4096 cents; ONE coarse ``groupby(cb).map_groups`` co-locates
    the count rows, keyed by ``b mod n_buckets`` — NOT by (s, b) raw,
    because domain/4096 × statuses separate groups would pay one Python
    kernel call each (the measured group-count groupby cost this repo
    buckets everything for); the kernel separates its (s, b) groups
    itself.  Per-task rows stay bounded: ≤4096 distinct values per
    4096-cent bucket × the buckets hashed together — corpus-size
    independent, so the skew salting the row-shuffling rank ops need does
    not arise.  The kernel computes each bucket's Σ i·v with in-bucket
    offsets starting at 0 in PYTHON ints (offset×count×value exceeds
    int64 past ~10^9 rows — the value_trend_per_type overflow lesson) and
    emits it hi/lo-split on base 2^62 so the int64 transport stays exact;
    the driver adds the cross-bucket term below_b·Σv_b from the bucket
    counts it already holds (O(statuses × domain/4096) driver state,
    counts only) and scales to micro-units in exact integer arithmetic —
    the result hash-matches the DuckDB oracle with no float anywhere.

    Output: (o_orderstatus, n, gini_u) with gini_u = floor(G·1e6).
    Beyond-reference engine addition (SURVEY.md §2.8)."""
    import pandas as pd

    from ._util import read_small_aware
    from .sketches import _floor_bucket

    ds = read_small_aware(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice", "o_orderstatus"]
    )

    import pyarrow.parquet as pq

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)

    def vcounts(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        folded = pa.table(
            {
                "s": t["o_orderstatus"],
                "b": _floor_bucket(v, _RANK_BUCKET_C2),
                "v": v,
            }
        )
        out = pa.TableGroupBy(folded, ["s", "b", "v"]).aggregate(
            [([], "count_all")]
        )
        return out.append_column(
            "cb",
            pc.cast(pc.bit_wise_and(out["b"], nb - 1), pa.int32()),
        )

    def bucket_partial(g: pd.DataFrame) -> pa.Table:
        g = (
            g.groupby(["s", "b", "v"], as_index=False)["count_all"]
            .sum()
            .sort_values(["s", "b", "v"])
        )
        ss, bs = [], []
        iv_hi, iv_lo, sv_hi, sv_lo, cnt = [], [], [], [], []
        iv = sv = off = 0
        prev = None
        rows = zip(g["s"], g["b"], g["v"], g["count_all"])

        def flush(key):
            ss.append(key[0])
            bs.append(int(key[1]))
            h, l = divmod(iv, _GINI_SPLIT)
            iv_hi.append(h)
            iv_lo.append(l)
            h, l = divmod(sv, _GINI_SPLIT)
            sv_hi.append(h)
            sv_lo.append(l)
            cnt.append(off)

        for s, b, v, cc in rows:  # Python-int exact; rows/task bounded
            v, cc = int(v), int(cc)
            if prev is not None and (s, b) != prev:
                flush(prev)
                iv = sv = off = 0
            prev = (s, b)
            iv += v * (off * cc + cc * (cc + 1) // 2)
            sv += v * cc
            off += cc
        if prev is not None:
            flush(prev)
        return pa.table(
            {
                "s": pa.array(ss, pa.string()),
                "b": pa.array(bs, pa.int64()),
                "iv_hi": pa.array(iv_hi, pa.int64()),
                "iv_lo": pa.array(iv_lo, pa.int64()),
                "sv_hi": pa.array(sv_hi, pa.int64()),
                "sv_lo": pa.array(sv_lo, pa.int64()),
                "c": pa.array(cnt, pa.int64()),
            }
        )

    partials = (
        ds.map_batches(vcounts, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(bucket_partial, batch_format="pandas")
        .to_pandas()  # one row per (status, bucket): O(domain/4096)
    )

    out = []
    for s, sub in partials.groupby("s"):
        sub = sub.sort_values("b").reset_index(drop=True)
        T = S = n = 0
        below = 0
        for iv_hi, iv_lo, sv_hi, sv_lo, c in zip(
            sub["iv_hi"], sub["iv_lo"], sub["sv_hi"], sub["sv_lo"], sub["c"]
        ):
            iv = int(iv_hi) * _GINI_SPLIT + int(iv_lo)
            sv = int(sv_hi) * _GINI_SPLIT + int(sv_lo)
            T += iv + below * sv
            S += sv
            below += int(c)
            n += int(c)
        gini_u = ((2 * T - (n + 1) * S) * 1_000_000) // (n * S)
        out.append({"o_orderstatus": s, "n": n, "gini_u": int(gini_u)})
    return pd.DataFrame(sorted(out, key=lambda r: r["o_orderstatus"]))


#: numerator ≥ 0 (Chebyshev/rearrangement: ascending ranks maximize Σ i·v),
#: so DuckDB's truncating // equals floor here; SUM(BIGINT) is HUGEINT so
#: the products stay exact.
GINI_BY_STATUS_SQL = """
WITH x AS (
  SELECT o_orderstatus AS s,
         CAST(ROUND(o_totalprice*100) AS BIGINT) AS v,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY ROUND(o_totalprice*100), o_orderkey)
           AS i
  FROM orders
)
SELECT s AS o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(((2*SUM(i*v) - (COUNT(*)+1)*SUM(v)) * 1000000)
            // (COUNT(*)*SUM(v)) AS BIGINT) AS gini_u
FROM x GROUP BY s ORDER BY s
"""


# -- Lorenz-curve points (value share at row deciles) --------------------------

_LORENZ_QS = tuple(q * 100_000 for q in range(1, 10))


def lorenz_by_status(sf_dir: str):
    """Lorenz-curve points per order status — the cumulative VALUE share
    held by the cheapest q of rows, at the nine row-count deciles: the
    curve whose unit-square area the Gini summarizes
    (``gini_by_status``), reported point-wise for concentration audits
    ("the top 10 % of orders carry X % of spend").

    Count-only like its Gini sibling: one coarse pass folds
    (status, bucket) → (count, Σv) so the driver knows every bucket's
    cumulative rows/value; a fine (bucket, value) count pass touches only
    the nine boundary buckets per status; cumvalue(k) = full buckets +
    full runs + value·(k − rows_below) for the straddling run — the k
    cheapest of an equal-value run contribute the same sum under any tie
    order, so the oracle's ROW_NUMBER tie-break cannot diverge.  All
    arithmetic is exact Python ints; share_u = (cumvalue·1e6) // total.

    Output: (o_orderstatus, q_mu, share_u).  Beyond-reference engine
    addition (SURVEY.md §2.8)."""
    import pandas as pd

    from ._util import read_small_aware
    from .sketches import _floor_bucket

    from ray.data.aggregate import Sum

    ds = read_small_aware(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice", "o_orderstatus"]
    )

    def hist(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        folded = pa.table(
            {"s": t["o_orderstatus"], "b": _floor_bucket(v, _RANK_BUCKET_C2),
             "v": v}
        )
        return pa.TableGroupBy(folded, ["s", "b"]).aggregate(
            [("v", "sum"), ([], "count_all")]
        )

    coarse = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby(["s", "b"])
        .aggregate(
            Sum("v_sum", alias_name="sv"),
            Sum("count_all", alias_name="c"),
        )
        .to_pandas()  # O(statuses × domain/4096)
    )
    # per status: totals + which bucket each decile boundary lands in
    need: dict[tuple[str, int], list[tuple[int, int, int]]] = {}
    totals: dict[str, tuple[int, int]] = {}
    for s, sub in coarse.groupby("s"):
        sub = sub.sort_values("b").reset_index(drop=True)
        n = int(sub["c"].sum())
        total_v = int(sub["sv"].sum())
        totals[s] = (n, total_v)
        cum_c = sub["c"].cumsum()
        cum_v = sub["sv"].cumsum()
        for q in _LORENZ_QS:
            k = (q * n) // 1_000_000
            if k <= 0:
                need.setdefault((s, -1), []).append((q, 0, 0))
                continue
            i = int((cum_c >= k).idxmax())
            rows_below = int(cum_c.iloc[i - 1]) if i > 0 else 0
            val_below = int(cum_v.iloc[i - 1]) if i > 0 else 0
            need.setdefault((s, int(sub.loc[i, "b"])), []).append(
                (q, k - rows_below, val_below)
            )

    wanted = pa.array(
        sorted(f"{s}|{b}" for s, b in need if b >= 0), pa.string()
    )

    def fine(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        b = _floor_bucket(v, _RANK_BUCKET_C2)
        key = pc.binary_join_element_wise(
            pc.cast(t["o_orderstatus"], pa.string()),
            pc.cast(b, pa.string()), "|",
        )
        sub = pa.table(
            {"s": t["o_orderstatus"], "b": b, "v": v}
        ).filter(pc.is_in(key, value_set=wanted))
        return pa.TableGroupBy(sub, ["s", "b", "v"]).aggregate(
            [([], "count_all")]
        )

    fined = (
        ds.map_batches(fine, batch_format="pyarrow")
        .groupby(["s", "b", "v"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # distinct values inside boundary buckets only
    )
    out = []
    for (s, b), entries in need.items():
        n, total_v = totals[s]
        if b < 0:
            for q, _, _ in entries:
                out.append({"o_orderstatus": s, "q_mu": q, "share_u": 0})
            continue
        sub = (
            fined[(fined["s"] == s) & (fined["b"] == b)]
            .sort_values("v")
            .reset_index(drop=True)
        )
        for q, rows_into_bucket, val_below in entries:
            remaining = rows_into_bucket
            cumv = val_below
            for v, c in zip(sub["v"], sub["c"]):
                take = min(int(c), remaining)
                cumv += int(v) * take
                remaining -= take
                if remaining == 0:
                    break
            out.append(
                {
                    "o_orderstatus": s,
                    "q_mu": q,
                    "share_u": (cumv * 1_000_000) // total_v,
                }
            )
    return pd.DataFrame(
        sorted(out, key=lambda r: (r["o_orderstatus"], r["q_mu"]))
    )


LORENZ_BY_STATUS_SQL = f"""
WITH x AS (
  SELECT o_orderstatus AS s,
         CAST(ROUND(o_totalprice*100) AS BIGINT) AS v,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY ROUND(o_totalprice*100), o_orderkey)
           AS rn,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n,
         SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
           OVER (PARTITION BY o_orderstatus) AS total
  FROM orders
),
qs(q_mu) AS (VALUES {", ".join(f"({q})" for q in _LORENZ_QS)})
SELECT s AS o_orderstatus, CAST(q_mu AS BIGINT) AS q_mu,
       CAST((SUM(CASE WHEN rn <= (q_mu * n) // 1000000 THEN v ELSE 0 END)
             * 1000000) // MAX(total) AS BIGINT) AS share_u
FROM x CROSS JOIN qs
GROUP BY s, q_mu ORDER BY s, q_mu
"""


# -- RFM customer segmentation -------------------------------------------------

RFM_QS = (20, 40, 60, 80)  # quintile cut percentiles


def rfm_segments(sf_dir: str) -> "object":
    """RFM (recency / frequency / monetary) customer segmentation — the
    canonical marketing-analytics cube: score each customer 1..5 per axis
    by exact value-quantile cut points, then count the population of every
    (r_q, f_q, m_q) cell.  Companion to ``events.rfm_scores`` (the
    per-user feature TABLE over the events stream): same cut-point
    discipline, different source table (orders) and different consumer —
    this one feeds the segment-population dashboard, that one feeds a
    ranking model.  Scores are CUT-POINT based (score = 1 + number
    of cut points strictly below the value — the price_decile width_bucket
    convention), so ties are deterministic on both engines, unlike NTILE's
    arbitrary tie splits.

    Scale shape: ONE bucketed custkey co-location builds the per-customer
    (max order day, n_orders, total cents) table from per-batch Arrow
    combiners; it is materialized once and re-scanned by the three
    two-pass counting-histogram order-statistic folds (the
    exact_price_quantiles machinery — driver state is bucket counts, never
    rows) and by the final scoring pass, which folds into the <=125-cell
    segment cube.  Output: (r_q, f_q, m_q, n_customers)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ._util import n_buckets, read_small_aware
    from .sketches import _floor_bucket

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)
    ds = read_small_aware(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(t["o_orderdate"], pa.date32()), pa.int32())
        cents = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
        )
        g = pa.TableGroupBy(
            pa.table(
                {
                    "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                    "day": pc.cast(day, pa.int64()),
                    "cents": cents,
                }
            ),
            "o_custkey",
        ).aggregate([("day", "max"), ([], "count_all"), ("cents", "sum")])
        g = g.rename_columns(["o_custkey", "r_v", "f_v", "m_v"])
        cb = pc.cast(
            pc.bit_wise_and(pc.cast(g["o_custkey"], pa.int64()), nb - 1),
            pa.int32(),
        )
        return g.append_column("cb", cb)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("o_custkey").agg(
            r_v=("r_v", "max"), f_v=("f_v", "sum"), m_v=("m_v", "sum")
        )
        return agg.reset_index().astype("int64")

    rfm = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(fold, batch_format="pandas")
        .materialize()  # customer-proportional; re-scanned 7x below
    )
    n = rfm.count()
    ks = sorted({(q * (n - 1)) // 100 for q in RFM_QS})

    def order_stats(col: str) -> list[int]:
        """Exact 0-based k-th order statistics of one metric column via the
        two-pass counting histogram (coarse bucket fold -> fine per-value
        fold in only the straddling buckets)."""
        def hist(t: pd.DataFrame) -> pa.Table:
            v = pa.array(t[col].to_numpy(np.int64), pa.int64())
            folded = pa.table({"b": _floor_bucket(v)})
            return pa.TableGroupBy(folded, "b").aggregate([([], "count_all")])

        counts = (
            rfm.map_batches(hist, batch_format="pandas")
            .groupby("b")
            .aggregate(Sum("count_all", alias_name="n"))
            .to_pandas()
            .sort_values("b")
            .reset_index(drop=True)
        )
        cum = counts["n"].cumsum()
        need: dict[int, list[int]] = {}
        for k in ks:
            i = int((cum > k).idxmax())
            before = int(cum.iloc[i - 1]) if i > 0 else 0
            need.setdefault(int(counts.loc[i, "b"]), []).append(k - before)
        wanted = pa.array(sorted(need), pa.int64())

        def in_bucket(t: pd.DataFrame) -> pa.Table:
            v = pa.array(t[col].to_numpy(np.int64), pa.int64())
            b = _floor_bucket(v)
            sub = pa.table({"b": b, "v": v}).filter(
                pc.is_in(b, value_set=wanted)
            )
            return pa.TableGroupBy(sub, ["b", "v"]).aggregate(
                [([], "count_all")]
            )

        fine = (
            rfm.map_batches(in_bucket, batch_format="pandas")
            .groupby(["b", "v"])
            .aggregate(Sum("count_all", alias_name="n"))
            .to_pandas()
        )
        out = []
        for k in ks:
            i = int((cum > k).idxmax())
            before = int(cum.iloc[i - 1]) if i > 0 else 0
            b = int(counts.loc[i, "b"])
            g = fine[fine["b"] == b].sort_values("v").reset_index(drop=True)
            gc = g["n"].cumsum()
            j = int((gc > (k - before)).idxmax())
            out.append(int(g.loc[j, "v"]))
        # expand dedup'd ks back to one cut per requested percentile
        per_q = {k: v for k, v in zip(ks, out)}
        return [per_q[(q * (n - 1)) // 100] for q in RFM_QS]

    cuts = {c: np.array(order_stats(c), dtype=np.int64) for c in ("r_v", "f_v", "m_v")}

    def score(t: pd.DataFrame) -> pd.DataFrame:
        qs = {}
        for c in ("r_v", "f_v", "m_v"):
            v = t[c].to_numpy(np.int64)
            qs[c[0] + "_q"] = (
                (v[:, None] > cuts[c][None, :]).sum(axis=1) + 1
            ).astype(np.int64)
        out = pd.DataFrame(qs)
        return (
            out.groupby(["r_q", "f_q", "m_q"], as_index=False)
            .size()
            .rename(columns={"size": "n_customers"})
        )

    cube = (
        rfm.map_batches(score, batch_format="pandas")
        .groupby(["r_q", "f_q", "m_q"])
        .aggregate(Sum("n_customers", alias_name="n_customers"))
        .to_pandas()  # <= 125 cells
    )
    return (
        cube.sort_values(["r_q", "f_q", "m_q"])
        .reset_index(drop=True)
        .astype("int64")
    )


def _rfm_sql() -> str:
    cut_sel = ", ".join(f"(({q} * (n - 1)) // 100)" for q in RFM_QS)
    return f"""
WITH rfm AS (
  SELECT o_custkey,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(MAX(o_orderdate) AS DATE)) AS BIGINT) AS r_v,
         CAST(COUNT(*) AS BIGINT) AS f_v,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS m_v
  FROM orders GROUP BY o_custkey
), nn AS (SELECT COUNT(*) AS n FROM rfm),
cuts_r AS (
  SELECT v FROM (
    SELECT r_v AS v, row_number() OVER (ORDER BY r_v) - 1 AS rk FROM rfm
  ) CROSS JOIN nn WHERE rk IN ({cut_sel})
),
cuts_f AS (
  SELECT v FROM (
    SELECT f_v AS v, row_number() OVER (ORDER BY f_v) - 1 AS rk FROM rfm
  ) CROSS JOIN nn WHERE rk IN ({cut_sel})
),
cuts_m AS (
  SELECT v FROM (
    SELECT m_v AS v, row_number() OVER (ORDER BY m_v) - 1 AS rk FROM rfm
  ) CROSS JOIN nn WHERE rk IN ({cut_sel})
),
scored AS (
  SELECT (SELECT 1 + COUNT(*) FROM cuts_r c WHERE rfm.r_v > c.v) AS r_q,
         (SELECT 1 + COUNT(*) FROM cuts_f c WHERE rfm.f_v > c.v) AS f_q,
         (SELECT 1 + COUNT(*) FROM cuts_m c WHERE rfm.m_v > c.v) AS m_q
  FROM rfm
)
SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
       CAST(m_q AS BIGINT) AS m_q, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


RFM_SEGMENTS_SQL = _rfm_sql()
