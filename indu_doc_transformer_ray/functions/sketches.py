"""Mergeable cardinality sketches over the ``events`` table.

HyperLogLog (Flajolet, Fusy, Gandouet, Meunier — "HyperLogLog: the analysis
of a near-optimal cardinality estimation algorithm", AofA 2007) as a Ray
Data aggregation: every batch folds its rows into per-group register
partials (one ``(group, register_idx, rank)`` row per TOUCHED register),
then ONE distributed ``groupby(group, reg).Max`` merges the partials —
register merge is elementwise max, so the sketch is associative/commutative
and the fold is exact regardless of partitioning.  Driver state is
``n_groups x 2^p`` small integers (the sketch, never the data).

The hash is md5-derived so estimates are deterministic across runs and
processes (builtin ``hash()`` is seed-randomized — see the verify-skill
pitfalls); the accuracy gate lives in tests/test_functions.py (relative
error vs exact distinct counts, theoretical sigma = 1.04/sqrt(2^p)).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Max

from .text import TOKEN_RE

P_BITS = 12  # 4096 registers -> ~1.6% standard error
M = 1 << P_BITS


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _estimate(registers: np.ndarray) -> int:
    """Bias-corrected HLL estimate with the small-range linear-counting
    switch (the classic 2007 correction; the 64-bit hash makes the
    large-range correction unnecessary below ~1e17)."""
    m = len(registers)
    e = _alpha(m) * m * m / float(np.sum(np.exp2(-registers.astype(np.float64))))
    if e <= 2.5 * m:
        zeros = int(np.count_nonzero(registers == 0))
        if zeros:
            e = m * math.log(m / zeros)
    return int(round(e))


def _hll_partials(batch: pa.Table, group_col: str, key_col: str) -> pa.Table:
    """Per-batch register partials: md5-hash each key, split into register
    index (low p bits) and rank (leading zeros of the remaining 64-p bits
    + 1), keep the max rank per (group, register) seen in this batch."""
    groups = batch.column(group_col).to_pylist()
    keys = batch.column(key_col).to_pylist()
    best: dict[tuple[str, int], int] = {}
    for g, k in zip(groups, keys):
        h = int.from_bytes(
            hashlib.md5(str(k).encode()).digest()[:8], "big"
        )
        reg = h & (M - 1)
        rest = h >> P_BITS  # (64 - P_BITS) significant bits
        rank = (64 - P_BITS) - rest.bit_length() + 1
        cur = best.get((g, reg), 0)
        if rank > cur:
            best[(g, reg)] = rank
    gs, rs, ks = [], [], []
    for (g, reg), rank in best.items():
        gs.append(g)
        rs.append(reg)
        ks.append(rank)
    return pa.table(
        {
            "grp": pa.array(gs, pa.string()),
            "reg": pa.array(rs, pa.int32()),
            "rank": pa.array(ks, pa.int32()),
        }
    )


def hll_distinct(
    ds: Dataset, group_col: str, key_col: str
) -> "object":
    """Approximate COUNT(DISTINCT key) per group as a DataFrame
    (group, approx_distinct): batch partials -> one groupby(grp, reg).Max
    shuffle over at most n_groups*4096 keys -> per-group register fold on
    the driver (sketch-sized, independent of data volume)."""
    import pandas as pd

    folded = (
        ds.map_batches(
            lambda t: _hll_partials(t, group_col, key_col),
            batch_format="pyarrow",
        )
        .groupby(["grp", "reg"])
        .aggregate(Max("rank", alias_name="rank"))
        .to_pandas()  # <= n_groups * 4096 rows: the sketch, not the data
    )
    out = []
    for g, sub in folded.groupby("grp"):
        regs = np.zeros(M, dtype=np.int32)
        regs[sub["reg"].to_numpy()] = sub["rank"].to_numpy()
        out.append((g, _estimate(regs)))
    return pd.DataFrame(
        sorted(out), columns=[group_col, "approx_distinct"]
    ).astype({"approx_distinct": "int64"})


def hll_users_per_type(sf_dir: str) -> "object":
    """Approximate distinct users per event_type (the 100-TB shape of
    COUNT DISTINCT: fixed-size mergeable sketch instead of a user-sized
    shuffle).  Accuracy graded in pytest vs the exact two-level groupby;
    exactness graded by ``HLL_USERS_SQL`` (the md5-deterministic sketch is
    itself SQL-expressible, so even the APPROXIMATE answer hash-matches)."""
    from ._util import read_small_aware

    ds = read_small_aware(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return hll_distinct(ds, "event_type", "user_id")


def _hll_users_sql() -> str:
    """DuckDB mirror of the full HLL pipeline — expressible because the
    register construction is md5-deterministic: same 64-bit hash split, same
    max-register fold, same bias-corrected / linear-counting estimate.
    Estimate math is double-precision on both sides; the only divergence
    channel is an estimate landing within ~1e-10 of a .5 rounding boundary
    (never observed at sf0.001/0.01/0.1 — all three hash-match)."""
    alpha_mm = _alpha(M) * M * M
    return f"""
WITH h AS (
  SELECT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 16)) AS UBIGINT) AS hv
  FROM events
), rr AS (
  SELECT event_type, CAST(hv & {M - 1} AS INTEGER) AS reg,
         CAST(hv >> {P_BITS} AS UBIGINT) AS rest
  FROM h
), regs AS (
  SELECT event_type, reg,
         MAX(CASE WHEN rest = 0 THEN {64 - P_BITS + 1}
                  ELSE {64 - P_BITS} - length(bin(rest)) + 1 END) AS rank
  FROM rr GROUP BY event_type, reg
), folded AS (
  SELECT event_type, COUNT(*) AS touched,
         SUM(power(2.0, -rank)) AS s_touched
  FROM regs GROUP BY event_type
), est AS (
  SELECT event_type,
         {alpha_mm!r} / (s_touched + CAST({M} - touched AS DOUBLE)) AS e,
         {M} - touched AS zeros
  FROM folded
)
SELECT event_type,
       CAST(CASE WHEN e <= {2.5 * M!r} AND zeros > 0
                 THEN round({M} * ln({M} / CAST(zeros AS DOUBLE)))
                 ELSE round(e) END AS BIGINT) AS approx_distinct
FROM est ORDER BY event_type
"""


HLL_USERS_SQL = _hll_users_sql()


# -- Bloom-filter membership probe -------------------------------------------

BLOOM_M = 1 << 17  # filter bits
BLOOM_K = 3  # hash functions


def _bloom_positions(text: str) -> list[int]:
    return [
        int(hashlib.md5(f"{text}#{j}".encode()).hexdigest()[:8], 16) % BLOOM_M
        for j in range(1, BLOOM_K + 1)
    ]


def bloom_probe(sf_dir: str) -> Dataset:
    """Broadcast Bloom-filter membership: the sketch-based complement of the
    exact actor index (``state/dedup_index.py``).  The even-doc_id snapshot
    builds a ``BLOOM_M``-bit / ``BLOOM_K``-hash filter (md5-derived
    positions, so build and probe are deterministic across engines); the
    filter is O(M) bits BY CONSTRUCTION — that is the point of the sketch —
    so it broadcasts once via ``ray.put`` and the probe pass streams with
    no shuffle.  Output per odd-doc_id document: (doc_id, maybe_dup) —
    1 for every true duplicate plus a deterministic false-positive rate
    set by M/K (compare ``incremental_dedup`` for ground truth)."""
    import ray as _ray

    def docs():
        return ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )

    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        pos = set()
        for t in batch.filter(pa.array(ids % 2 == 0)).column("text").to_pylist():
            pos.update(_bloom_positions(t))
        return pa.table({"pos": pa.array(sorted(pos), pa.int64())})

    parts = docs().map_batches(build, batch_format="pyarrow").to_pandas()
    bits = np.zeros(BLOOM_M, dtype=bool)
    bits[parts["pos"].to_numpy()] = True  # the sketch — O(M), never the data
    bref = _ray.put(bits)

    def probe(batch: pa.Table) -> pa.Table:
        bits_ = _ray.get(bref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ids % 2 == 1))
        out_id, out_m = [], []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            out_id.append(doc_id)
            out_m.append(1 if all(bits_[p] for p in _bloom_positions(t)) else 0)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "maybe_dup": pa.array(out_m, pa.int64()),
            }
        )

    return docs().map_batches(probe, batch_format="pyarrow")


BLOOM_PROBE_SQL = f"""
WITH bits AS (
  SELECT DISTINCT
         CAST(concat('0x', substr(md5(text || '#' || CAST(j AS VARCHAR)), 1, 8))
              AS UBIGINT) % {BLOOM_M} AS pos
  FROM documents, UNNEST(range(1, {BLOOM_K + 1})) AS t(j)
  WHERE doc_id % 2 = 0
), probe AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(text || '#' || CAST(j AS VARCHAR)), 1, 8))
              AS UBIGINT) % {BLOOM_M} AS pos
  FROM documents, UNNEST(range(1, {BLOOM_K + 1})) AS t(j)
  WHERE doc_id % 2 = 1
)
SELECT p.doc_id,
       CAST(CASE WHEN COUNT(*) = COUNT(b.pos) THEN 1 ELSE 0 END AS BIGINT)
         AS maybe_dup
FROM probe p LEFT JOIN bits b USING (pos)
GROUP BY p.doc_id
"""


# -- count-min sketch ---------------------------------------------------------

CM_W = 1024  # columns per hash row
CM_D = 4  # independent hash rows


def _cm_cell(row: int, tok: str) -> int:
    """Deterministic cell for (hash row, token): md5-derived, mirrored
    bit-exactly by the SQL oracle."""
    h = hashlib.md5(f"{row}:{tok}".encode()).hexdigest()[:16]
    return row * CM_W + int(h, 16) % CM_W


def _cm_sketch(sf_dir: str) -> dict:
    """Build the CM_W x CM_D count-min sketch over the corpus token stream
    (per-batch Counter partials -> one cell groupby); shared by the probe
    op and the calibration audit."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch.column("text").to_pylist():
            c.update(TOKEN_RE.findall(text.lower()))
        cells: Counter = Counter()
        for tok, n in c.items():
            for r in range(CM_D):
                cells[_cm_cell(r, tok)] += n
        ks = sorted(cells)
        return pa.table(
            {
                "cell": pa.array(ks, pa.int64()),
                "cnt": pa.array([cells[k] for k in ks], pa.int64()),
            }
        )

    sketch = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("cnt", alias_name="s"))
        .to_pandas()  # <= CM_W x CM_D rows — the sketch itself, tiny
    )
    return dict(zip(sketch["cell"], sketch["s"]))


def count_min_probe(sf_dir: str) -> "object":
    """Count-min sketch over the corpus token stream, then point-frequency
    probes: the mergeable counting complement of Bloom (membership) and HLL
    (distincts).  Build: every batch folds its token counts into partial
    (cell, cnt) rows — a Counter per batch, CM_D cells per distinct token —
    and ONE small groupby().sum() merges them into the <= CM_W x CM_D-cell
    sketch (partials-before-shuffle; the shuffle moves sketch cells, never
    tokens).  Probe: estimate(tok) = min over its CM_D cells — >= the true
    count, == for tokens without collisions.  Deterministic md5 hashing
    makes the approximate estimates themselves hash-checkable
    (``COUNT_MIN_PROBE_SQL``).  Output: (token, cm_estimate) for the fixed
    probe list."""
    import pandas as pd

    cm = _cm_sketch(sf_dir)

    probes = CM_PROBE_TOKENS
    return pd.DataFrame(
        {
            "token": list(probes),
            "cm_estimate": pd.array(
                [
                    min(cm.get(_cm_cell(r, tok), 0) for r in range(CM_D))
                    for tok in probes
                ],
                dtype="int64",
            ),
        }
    ).sort_values("token").reset_index(drop=True)


#: fixed probe list: common corpus words + one absent token (its estimate
#: is whatever collisions put in its cells — deterministic either way)
CM_PROBE_TOKENS = (
    "data", "the", "vector", "join", "stream", "row", "zzz_not_a_token",
)


COUNT_MIN_PROBE_SQL = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
), cnt AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
), rows AS (
  SELECT CAST(i AS INTEGER) AS i FROM range({CM_D}) t(i)
), cells AS (
  SELECT i,
         i * {CM_W}
         + CAST(concat('0x', substr(md5(CAST(i AS VARCHAR) || ':' || tok), 1, 16))
                AS UBIGINT) % {CM_W} AS cell,
         SUM(c) AS s
  FROM cnt CROSS JOIN rows
  GROUP BY 1, 2
), probes(token) AS (
  VALUES {", ".join(f"('{t}')" for t in ("data", "the", "vector", "join", "stream", "row", "zzz_not_a_token"))}
), pc AS (
  SELECT p.token, r.i,
         r.i * {CM_W}
         + CAST(concat('0x', substr(md5(CAST(r.i AS VARCHAR) || ':' || p.token), 1, 16))
                AS UBIGINT) % {CM_W} AS cell
  FROM probes p CROSS JOIN rows r
)
SELECT p.token,
       CAST(MIN(COALESCE(cl.s, 0)) AS BIGINT) AS cm_estimate
FROM pc p LEFT JOIN cells cl ON p.i = cl.i AND p.cell = cl.cell
GROUP BY p.token
ORDER BY p.token
"""


# -- sampled quantiles over a continuous domain -----------------------------

def value_quantile_sample(sf_dir: str, target: int = 4096) -> "object":
    """Approximate per-type quantiles of the CONTINUOUS ``value`` column by
    deterministic uniform sampling — the scale path where the exact
    histogram fold (``text.doclen_percentiles``) fails because a double
    domain has corpus-many distinct values.  The md5(event_id) 52-bit key
    admits a row when key < threshold, with the threshold derived from the
    table row count (parquet metadata) to target a FIXED ~``target``-row
    sample per corpus regardless of scale — the sample, not the data, is
    what the per-type kernel and the driver ever hold.  Quantiles are the
    lower discrete statistic on the (value, event_id)-sorted sample with
    NO float arithmetic (values pass through bit-exact), so the
    deterministic approximation carries a full DuckDB oracle
    (``VALUE_QUANTILE_SQL`` — the threshold re-derives from COUNT(*) with
    identical integer math).  Output: (event_type, pct, value)."""
    import pandas as pd

    import pyarrow.parquet as pq

    thr = _sample_threshold(
        pq.read_metadata(f"{sf_dir}/events.parquet").num_rows, target
    )

    def sample(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_pylist()
        keep = [
            i
            for i, eid in enumerate(ids)
            if int(hashlib.md5(str(eid).encode()).hexdigest()[:13], 16) < thr
        ]
        sub = t.take(keep)
        return pa.table(
            {
                "event_type": sub["event_type"],
                "event_id": sub["event_id"],
                "value": sub["value"],
            }
        )

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"]).reset_index(drop=True)
        n = len(g)
        rows = []
        for pct in (50, 90, 99):
            k = (n - 1) * pct // 100
            rows.append((g["event_type"].iloc[0], pct, float(g["value"].iloc[k])))
        return pd.DataFrame(rows, columns=["event_type", "pct", "value"])

    out = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "event_type", "value"],
        )
        .map_batches(sample, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(quantiles, batch_format="pandas")
        .to_pandas()  # <= 3 rows per event type
    )
    out["pct"] = out["pct"].astype("int64")
    return out.sort_values(["event_type", "pct"]).reset_index(drop=True)


def _sample_threshold(n_rows: int, target: int = 4096) -> int:
    """52-bit admission threshold targeting ~``target`` sampled rows."""
    U52 = 1 << 52
    if n_rows <= target:
        return U52
    return max(1, (U52 * target) // n_rows)


# Static DuckDB mirror: the admission threshold derives from COUNT(*) with
# the same integer math as _sample_threshold (metadata row count == COUNT(*)),
# so one SQL string is correct at every scale factor.
VALUE_QUANTILE_SQL = f"""
WITH c AS (SELECT COUNT(*) AS n FROM events),
thr AS (
  SELECT CASE WHEN n <= 4096 THEN CAST({1 << 52} AS HUGEINT)
         ELSE GREATEST(1, (CAST({1 << 52} AS HUGEINT) * 4096) // n) END AS t
  FROM c
), s AS (
  SELECT event_type, event_id, value
  FROM events
  WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 13))
             AS UBIGINT) < (SELECT t FROM thr)
), o AS (
  SELECT event_type, event_id, value,
         row_number() OVER (
             PARTITION BY event_type ORDER BY value, event_id) - 1 AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM s
)
SELECT event_type, CAST(p.pct AS BIGINT) AS pct, o.value
FROM (VALUES (50), (90), (99)) p(pct)
JOIN o ON o.rn = (o.n - 1) * p.pct // 100
ORDER BY event_type, pct"""


# -- exact distributed quantiles (two-pass counting histogram) ---------------

PRICE_QUANTILES_MU = (250_000, 500_000, 750_000, 950_000, 990_000)
_HIST_WIDTH = 4_096  # c2 cents per coarse bucket; <=4096 distinct values/bucket


def _floor_bucket(v: "pa.Array", width: int = _HIST_WIDTH) -> "pa.Array":
    """Exact integer FLOOR division bucket (width > 0).  Arrow's
    ``pc.divide`` truncates toward zero, but the fine-pass re-filters
    (pandas ``//``) FLOOR — for negative values trunc(-5/4096)=0 vs
    floor=-1 would silently drop rows from the straddling bucket and
    corrupt the median.  Integer-exact (no float64 detour, safe past
    2**53).  Power-of-two widths (the common _HIST_WIDTH case) floor in
    ONE kernel via arithmetic right shift; otherwise correct the truncated
    quotient wherever the remainder is negative."""
    import pyarrow.compute as pc

    if width > 0 and (width & (width - 1)) == 0:
        return pc.shift_right(v, width.bit_length() - 1)
    q = pc.divide(v, width)
    r = pc.subtract(v, pc.multiply(q, width))
    return pc.if_else(pc.less(r, 0), pc.subtract(q, 1), q)


def exact_price_quantiles(sf_dir: str) -> "object":
    """EXACT order statistics of l_extendedprice without a global sort —
    the two-pass counting-histogram shape (contrast value_quantile_sample,
    the SAMPLED variant): pass 1 folds each batch into coarse bucket counts
    (``value_c2 // 4096``; the shuffle carries one row per touched bucket
    per batch, the driver holds only the ~domain/4096 cumulative counts);
    pass 2 re-reads ONLY rows in the few buckets that straddle a target
    rank (column-pruned + bucket filter) and folds exact per-value counts
    (<=4096 distinct values per bucket, so the driver reduce is O(1) per
    quantile at any corpus size).  Rank convention: k = floor(q*(n-1)),
    0-based — stated identically in the oracle's ROW_NUMBER form.
    Output: (q_mu, value_c2)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ._util import read_small_aware

    ds = read_small_aware(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def hist(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        folded = pa.table({"b": _floor_bucket(v)})
        return pa.TableGroupBy(folded, "b").aggregate([([], "count_all")])

    counts = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("b")
        .aggregate(ray.data.aggregate.Sum("count_all", alias_name="n"))
        .to_pandas()  # <= domain / 4096 rows
        .sort_values("b")
        .reset_index(drop=True)
    )
    n = int(counts["n"].sum())
    cum = counts["n"].cumsum()

    # bucket holding each target rank (0-based k)
    targets = {q: (q * (n - 1)) // 1_000_000 for q in PRICE_QUANTILES_MU}
    need: dict[int, list[tuple[int, int]]] = {}
    for q, k in targets.items():
        i = int((cum > k).idxmax())
        b = int(counts.loc[i, "b"])
        before = int(cum.iloc[i - 1]) if i > 0 else 0
        need.setdefault(b, []).append((q, k - before))  # rank within bucket

    wanted = pa.array(sorted(need), pa.int64())

    def in_bucket(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        sub = pa.table({"b": _floor_bucket(v), "v": v}).filter(
            pc.is_in(_floor_bucket(v), value_set=wanted)
        )
        return pa.TableGroupBy(sub, ["b", "v"]).aggregate([([], "count_all")])

    fine = (
        ds.map_batches(in_bucket, batch_format="pyarrow")
        .groupby(["b", "v"])
        .aggregate(ray.data.aggregate.Sum("count_all", alias_name="n"))
        .to_pandas()  # <= |wanted| * 4096 rows
    )

    rows = []
    for b, qs in need.items():
        g = fine[fine["b"] == b].sort_values("v").reset_index(drop=True)
        gc = g["n"].cumsum()
        for q, rk in qs:
            j = int((gc > rk).idxmax())
            rows.append({"q_mu": q, "value_c2": int(g.loc[j, "v"])})
    return (
        pd.DataFrame(rows)
        .astype({"q_mu": "int64", "value_c2": "int64"})
        .sort_values("q_mu")
        .reset_index(drop=True)
    )


EXACT_PRICE_QUANTILES_SQL = f"""
WITH x AS (
  SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS v FROM lineitem),
nn AS (SELECT COUNT(*) AS n FROM x),
o AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rk FROM x),
qs(q_mu) AS (VALUES {",".join(f"({q})" for q in PRICE_QUANTILES_MU)})
SELECT CAST(q_mu AS BIGINT) AS q_mu, CAST(o.v AS BIGINT) AS value_c2
FROM qs, nn
JOIN o ON o.rk = (q_mu * (n - 1)) // 1000000 + 1
ORDER BY q_mu
"""


# -- group-wise exact median: the hot-group holistic-aggregate shape ---------

def median_price_per_status(sf_dir: str) -> "object":
    """EXACT per-group median of o_totalprice with only THREE groups — the
    pathological-skew case for holistic aggregates: a naive
    ``groupby(status).map_groups`` would drag a third of the corpus into
    one task.  Instead the group key never co-locates raw rows: pass 1
    folds (status, coarse-bucket) counts map-side (the shuffle carries one
    row per touched bucket per batch); the driver finds each group's two
    middle ranks in the ~domain/4096-row cumulative histogram; pass 2
    re-reads ONLY the straddling (status, bucket) pairs and folds exact
    per-value counts.  Driver state is O(groups x domain/4096), corpus-size
    free.  The median is emitted as ``median_c2_x2`` = lower+upper middle
    value (2x the interpolated median) so even-count groups stay integer-
    exact vs the oracle's ``2*MEDIAN``.  Output: (o_orderstatus, n_orders,
    median_c2_x2).  Engine addition (SURVEY §2.6 quantile family;
    exact_price_quantiles is the ungrouped version)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ._util import read_small_aware

    ds = read_small_aware(
        f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_totalprice"]
    )

    def hist(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        folded = pa.table({"s": t["o_orderstatus"], "b": _floor_bucket(v)})
        return pa.TableGroupBy(folded, ["s", "b"]).aggregate([([], "count_all")])

    counts = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby(["s", "b"])
        .aggregate(ray.data.aggregate.Sum("count_all", alias_name="n"))
        .to_pandas()  # <= |statuses| * domain/4096 rows
        .sort_values(["s", "b"])
        .reset_index(drop=True)
    )

    # per group: the bucket(s) holding the two middle ranks (0-based)
    need: dict[tuple[str, int], list[int]] = {}
    totals: dict[str, int] = {}
    for s, g in counts.groupby("s"):
        g = g.reset_index(drop=True)
        n = int(g["n"].sum())
        totals[str(s)] = n
        cum = g["n"].cumsum()
        for k in ((n - 1) // 2, n // 2):
            i = int((cum > k).idxmax())
            b = int(g.loc[i, "b"])
            before = int(cum.iloc[i - 1]) if i > 0 else 0
            need.setdefault((str(s), b), []).append(k - before)

    keys = pa.array([f"{s}|{b}" for (s, b) in sorted(need)], pa.string())

    def in_bucket(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        key = pc.binary_join_element_wise(
            t["o_orderstatus"], pc.cast(_floor_bucket(v), pa.string()), "|"
        )
        sub = pa.table({"s": t["o_orderstatus"], "v": v}).filter(
            pc.is_in(key, value_set=keys)
        )
        return pa.TableGroupBy(sub, ["s", "v"]).aggregate([([], "count_all")])

    fine = (
        ds.map_batches(in_bucket, batch_format="pyarrow")
        .groupby(["s", "v"])
        .aggregate(ray.data.aggregate.Sum("count_all", alias_name="n"))
        .to_pandas()  # <= |straddling buckets| * 4096 rows
    )

    med: dict[str, int] = {s: 0 for s in totals}
    for (s, b), ranks in need.items():
        g = (
            fine[(fine["s"] == s) & (fine["v"] // _HIST_WIDTH == b)]
            .sort_values("v")
            .reset_index(drop=True)
        )
        cum = g["n"].cumsum()
        for kk in ranks:  # rank WITHIN this bucket (pass-1 subtracted prefix)
            i = int((cum > kk).idxmax())
            med[s] += int(g.loc[i, "v"])
    out = pd.DataFrame(
        [
            {"o_orderstatus": s, "n_orders": n, "median_c2_x2": med[s]}
            for s, n in sorted(totals.items())
        ]
    ).astype({"n_orders": "int64", "median_c2_x2": "int64"})
    return out.sort_values("o_orderstatus").reset_index(drop=True)


MEDIAN_PRICE_PER_STATUS_SQL = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(2 * MEDIAN(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
         AS median_c2_x2
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# -- robust anomaly accounting: median absolute deviation --------------------

def mad_outliers(sf_dir: str) -> "object":
    """Robust per-type outlier audit over ``events.value``: lower-discrete
    median, MAD (median of |v - median|), and the count of values beyond
    5 x MAD — the outlier gate a quality pipeline runs where mean/stddev
    would be poisoned by the very outliers it hunts.  MAD needs TWO nested
    holistic aggregates; each uses the two-pass counting-histogram shape of
    ``median_price_per_status`` (coarse (type, bucket) counts map-side,
    driver finds the straddling bucket in O(domain/4096) state, a pruned
    second pass resolves the exact value), with the per-type medians
    broadcast into the deviation passes as an O(|types|) closure.  Five
    linear scans, zero corpus-sized exchanges, no per-type co-location of
    raw rows (the hot-group-skew trap).  Output: (event_type, n,
    median_c2, mad_c2, n_outliers)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ._util import read_small_aware

    ds = read_small_aware(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def _lower_median(val_of):
        """Two-pass exact lower-discrete median per type; ``val_of`` maps a
        batch to an int64 array (identity for pass 1, |v - med| for the
        MAD pass)."""

        def hist(t: pa.Table) -> pa.Table:
            v = val_of(t)
            folded = pa.table(
                {"s": t["event_type"], "b": _floor_bucket(v)}
            )
            return pa.TableGroupBy(folded, ["s", "b"]).aggregate(
                [([], "count_all")]
            )

        counts = (
            ds.map_batches(hist, batch_format="pyarrow")
            .groupby(["s", "b"])
            .aggregate(ray.data.aggregate.Sum("count_all", alias_name="n"))
            .to_pandas()
            .sort_values(["s", "b"])
            .reset_index(drop=True)
        )
        need: dict[tuple[str, int], int] = {}
        totals: dict[str, int] = {}
        for s, g in counts.groupby("s"):
            g = g.reset_index(drop=True)
            n = int(g["n"].sum())
            totals[str(s)] = n
            cum = g["n"].cumsum()
            k = (n - 1) // 2
            i = int((cum > k).idxmax())
            before = int(cum.iloc[i - 1]) if i > 0 else 0
            need[(str(s), int(g.loc[i, "b"]))] = k - before

        keys = pa.array([f"{s}|{b}" for (s, b) in sorted(need)], pa.string())

        def in_bucket(t: pa.Table) -> pa.Table:
            v = val_of(t)
            key = pc.binary_join_element_wise(
                t["event_type"],
                pc.cast(_floor_bucket(v), pa.string()), "|",
            )
            sub = pa.table({"s": t["event_type"], "v": v}).filter(
                pc.is_in(key, value_set=keys)
            )
            return pa.TableGroupBy(sub, ["s", "v"]).aggregate(
                [([], "count_all")]
            )

        fine = (
            ds.map_batches(in_bucket, batch_format="pyarrow")
            .groupby(["s", "v"])
            .aggregate(ray.data.aggregate.Sum("count_all", alias_name="n"))
            .to_pandas()
        )
        med: dict[str, int] = {}
        for (s, b), rk in need.items():
            g = (
                fine[(fine["s"] == s) & (fine["v"] // _HIST_WIDTH == b)]
                .sort_values("v")
                .reset_index(drop=True)
            )
            cum = g["n"].cumsum()
            i = int((cum > rk).idxmax())
            med[s] = int(g.loc[i, "v"])
        return med, totals

    def _v(t: pa.Table) -> pa.Array:
        return pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())

    med, totals = _lower_median(_v)

    type_list = sorted(med)
    types_arr = pa.array(type_list, pa.string())
    med_arr = pa.array([med[s] for s in type_list], pa.int64())

    def _dev(t: pa.Table) -> pa.Array:
        # vectorized per-type lookup: index_in + take, no row loop
        idx = pc.index_in(t["event_type"], value_set=types_arr)
        return pc.abs(pc.subtract(_v(t), pc.take(med_arr, idx)))

    mad, _ = _lower_median(_dev)
    mad_arr = pa.array([5 * mad[s] for s in type_list], pa.int64())

    def outlier_partial(t: pa.Table) -> pa.Table:
        dev = _dev(t)
        idx = pc.index_in(t["event_type"], value_set=types_arr)
        thresh = pc.take(mad_arr, idx)
        folded = pa.table(
            {
                "s": t["event_type"],
                "o": pc.cast(pc.greater(dev, thresh), pa.int64()),
            }
        )
        return pa.TableGroupBy(folded, "s").aggregate([("o", "sum")])

    out_n = (
        ds.map_batches(outlier_partial, batch_format="pyarrow")
        .groupby("s")
        .aggregate(ray.data.aggregate.Sum("o_sum", alias_name="n_outliers"))
        .to_pandas()  # O(|types|)
    )
    rows = pd.DataFrame(
        [
            {
                "event_type": s,
                "n": totals[s],
                "median_c2": med[s],
                "mad_c2": mad[s],
            }
            for s in sorted(totals)
        ]
    )
    out = rows.merge(
        out_n.rename(columns={"s": "event_type"}), on="event_type"
    )
    for c in ("n", "median_c2", "mad_c2", "n_outliers"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


MAD_OUTLIERS_SQL = """
WITH x AS (
  SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS v FROM events
), m AS (
  SELECT event_type, v AS med FROM (
    SELECT event_type, v,
           row_number() OVER (PARTITION BY event_type ORDER BY v) AS rk,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM x) WHERE rk = (n - 1) // 2 + 1
), d AS (
  SELECT x.event_type, x.v, abs(x.v - m.med) AS dev, m.med
  FROM x JOIN m USING (event_type)
), md AS (
  SELECT event_type, dev AS mad FROM (
    SELECT event_type, dev,
           row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rk,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM d) WHERE rk = (n - 1) // 2 + 1
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(d.med) AS BIGINT) AS median_c2,
       CAST(MIN(md.mad) AS BIGINT) AS mad_c2,
       CAST(SUM(CASE WHEN d.dev > 5 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM d JOIN md USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


# -- windowed sketch merge: approximate trailing WAU ---------------------------

def hll_wau(sf_dir: str) -> "object":
    """Approximate trailing-7-day WAU per day via HLL REGISTER MERGE — the
    streaming-window shape of COUNT DISTINCT at 100 TB: per-day sketches
    are fixed-size and mergeable (elementwise max), so a trailing window
    is 7 register merges, never a rescan and never a user-sized shuffle
    (``dau_wau_stickiness`` is the exact twin; this is its sketch-path
    scale story).  Shape: a user-bucket kernel dedups (user, day), hashes
    each user ONCE, fans its register partial to the <=7 windows the day
    supports and pre-merges per (window, register); a fused-key bucket
    fold completes the merge (bounded groups, never a
    windowsxregisters-proportional Dataset.groupby); the driver folds
    days x 4096 sketch rows and estimates.  Windows clipped to days with
    events.  Output: (day_bucket, approx_wau)."""
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    path = f"{sf_dir}/events.parquet"
    nb = n_buckets(pq.read_metadata(path).num_rows)
    from ._util import read_small_aware

    ds = read_small_aware(path, columns=["ts", "user_id"])

    import pyarrow.compute as pc

    def day_user(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000)
        uid = pc.cast(t["user_id"], pa.int64())
        folded = pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, nb - 1), pa.int32()),
                "user_id": uid,
                "day": day,
            }
        )
        return pa.TableGroupBy(folded, ["ub", "user_id", "day"]).aggregate(
            [([], "count_all")]
        ).drop_columns(["count_all"])

    def bucket_sketch(g: pd.DataFrame) -> pa.Table:
        d = g[["user_id", "day"]].drop_duplicates()
        regs: dict[int, tuple[int, int]] = {}
        best: dict[tuple[int, int], int] = {}
        for u, day in zip(
            d["user_id"].to_numpy("int64"), d["day"].to_numpy("int64")
        ):
            rr = regs.get(u)
            if rr is None:
                h = int.from_bytes(
                    hashlib.md5(str(u).encode()).digest()[:8], "big"
                )
                reg = h & (M - 1)
                rest = h >> P_BITS
                rank = (64 - P_BITS) - rest.bit_length() + 1
                rr = (reg, rank)
                regs[u] = rr
            reg, rank = rr
            for i in range(7):
                key = (int(day) + i, reg)
                if rank > best.get(key, 0):
                    best[key] = rank
        wds, rs, ks = [], [], []
        for (wd, reg), rank in best.items():
            wds.append(wd)
            rs.append(reg)
            ks.append(rank)
        import numpy as np

        wda = np.array(wds, dtype=np.int64)
        rga = np.array(rs, dtype=np.int64)
        return pa.table(
            {
                "kb": pa.array(
                    (((wda << P_BITS) | rga) & (nb - 1)).astype("int32")
                ),
                "wd": pa.array(wda),
                "reg": pa.array(rga.astype("int32")),
                "rank": pa.array(np.array(ks, dtype=np.int32)),
            }
        )

    def merge_fold(g: pd.DataFrame) -> pa.Table:
        m = g.groupby(["wd", "reg"], as_index=False)["rank"].max()
        return pa.table(
            {
                "wd": pa.array(m["wd"].to_numpy("int64")),
                "reg": pa.array(m["reg"].to_numpy("int32")),
                "rank": pa.array(m["rank"].to_numpy("int32")),
            }
        )

    sketch = (
        ds.map_batches(day_user, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(bucket_sketch, batch_format="pandas")
        .groupby("kb")
        .map_groups(merge_fold, batch_format="pandas")
        .to_pandas()  # <= days x 4096 rows: sketches, never users
    )
    days = set(
        ds.map_batches(
            lambda t: pa.TableGroupBy(
                pa.table(
                    {
                        "day": pc.divide(
                            pc.cast(t["ts"], pa.int64()), 86_400_000_000
                        )
                    }
                ),
                "day",
            ).aggregate([([], "count_all")]).drop_columns(["count_all"]),
            batch_format="pyarrow",
        )
        .groupby("day")
        .aggregate(ray.data.aggregate.Count(alias_name="_c"))
        .to_pandas()["day"]
        .astype("int64")
    )
    out = []
    for wd, sub in sketch.groupby("wd"):
        if int(wd) not in days:
            continue
        regs_arr = np.zeros(M, dtype=np.int32)
        regs_arr[sub["reg"].to_numpy()] = sub["rank"].to_numpy()
        out.append((int(wd), _estimate(regs_arr)))
    import pandas as pd

    return pd.DataFrame(
        sorted(out), columns=["day_bucket", "approx_wau"]
    ).astype({"day_bucket": "int64", "approx_wau": "int64"})


def _hll_wau_sql() -> str:
    alpha_mm = _alpha(M) * M * M
    return f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events
), days AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS wd FROM events
), w AS (
  SELECT DISTINCT ud.user_id, ud.d + r.i AS wd FROM ud, range(0, 7) r(i)
), h AS (
  SELECT w.wd,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
              AS UBIGINT) AS hv
  FROM w JOIN days USING (wd)
), rr AS (
  SELECT wd, CAST(hv & {M - 1} AS INTEGER) AS reg,
         CAST(hv >> {P_BITS} AS UBIGINT) AS rest
  FROM h
), regs AS (
  SELECT wd, reg,
         MAX(CASE WHEN rest = 0 THEN {64 - P_BITS + 1}
                  ELSE {64 - P_BITS} - length(bin(rest)) + 1 END) AS rank
  FROM rr GROUP BY wd, reg
), folded AS (
  SELECT wd, COUNT(*) AS touched,
         SUM(power(2.0, -rank)) AS s_touched
  FROM regs GROUP BY wd
), est AS (
  SELECT wd,
         {alpha_mm!r} / (s_touched + CAST({M} - touched AS DOUBLE)) AS e,
         {M} - touched AS zeros
  FROM folded
)
SELECT wd AS day_bucket,
       CAST(CASE WHEN e <= {2.5 * M!r} AND zeros > 0
                 THEN round({M} * ln({M} / CAST(zeros AS DOUBLE)))
                 ELSE round(e) END AS BIGINT) AS approx_wau
FROM est ORDER BY day_bucket
"""


HLL_WAU_SQL = _hll_wau_sql()


# -- windowed holistic aggregate: exact P50 per (type, day) --------------------

def daily_value_median(sf_dir: str) -> "object":
    """Exact lower-discrete median of ``value`` per (event_type, day) — the
    windowed HOLISTIC aggregate a streaming dashboard needs (percentiles
    don't decompose like sums, so the naive shape co-locates every
    window's raw rows).  Same two-pass counting histogram as
    ``median_price_per_status`` but on the composite (type, day) key:
    pass 1 folds (type, day, coarse bucket) counts map-side; the driver
    holds windows x domain/4096 cumulative counts (bounded: windows =
    types x days, never corpus-sized); pass 2 re-reads only straddling
    buckets for exact per-value counts.  Output: (event_type, day_bucket,
    n, median_c2)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ._util import read_small_aware

    ds = read_small_aware(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def keyed(t: pa.Table):
        day = pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000)
        v = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return day, v

    def hist(t: pa.Table) -> pa.Table:
        day, v = keyed(t)
        folded = pa.table(
            {
                "s": t["event_type"],
                "d": day,
                "b": _floor_bucket(v),
            }
        )
        return pa.TableGroupBy(folded, ["s", "d", "b"]).aggregate(
            [([], "count_all")]
        )

    counts = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby(["s", "d", "b"])
        .aggregate(ray.data.aggregate.Sum("count_all", alias_name="n"))
        .to_pandas()  # <= windows * domain/4096 rows
        .sort_values(["s", "d", "b"])
        .reset_index(drop=True)
    )
    need: dict[tuple[str, int, int], int] = {}
    totals: dict[tuple[str, int], int] = {}
    for (s, d), g in counts.groupby(["s", "d"]):
        g = g.reset_index(drop=True)
        n = int(g["n"].sum())
        totals[(str(s), int(d))] = n
        cum = g["n"].cumsum()
        k = (n - 1) // 2
        i = int((cum > k).idxmax())
        before = int(cum.iloc[i - 1]) if i > 0 else 0
        need[(str(s), int(d), int(g.loc[i, "b"]))] = k - before

    keys = pa.array(
        [f"{s}|{d}|{b}" for (s, d, b) in sorted(need)], pa.string()
    )

    def in_bucket(t: pa.Table) -> pa.Table:
        day, v = keyed(t)
        key = pc.binary_join_element_wise(
            t["event_type"],
            pc.cast(day, pa.string()),
            pc.cast(_floor_bucket(v), pa.string()),
            "|",
        )
        sub = pa.table(
            {"s": t["event_type"], "d": day, "v": v}
        ).filter(pc.is_in(key, value_set=keys))
        return pa.TableGroupBy(sub, ["s", "d", "v"]).aggregate(
            [([], "count_all")]
        )

    fine = (
        ds.map_batches(in_bucket, batch_format="pyarrow")
        .groupby(["s", "d", "v"])
        .aggregate(ray.data.aggregate.Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    med: dict[tuple[str, int], int] = {}
    for (s, d, b), rk in need.items():
        g = (
            fine[
                (fine["s"] == s) & (fine["d"] == d)
                & (fine["v"] // _HIST_WIDTH == b)
            ]
            .sort_values("v")
            .reset_index(drop=True)
        )
        cum = g["n"].cumsum()
        i = int((cum > rk).idxmax())
        med[(s, d)] = int(g.loc[i, "v"])
    out = pd.DataFrame(
        [
            {
                "event_type": s,
                "day_bucket": d,
                "n": n,
                "median_c2": med[(s, d)],
            }
            for (s, d), n in sorted(totals.items())
        ]
    )
    for c in ("day_bucket", "n", "median_c2"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


DAILY_VALUE_MEDIAN_SQL = """
WITH x AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day_bucket,
         CAST(ROUND(value*100) AS BIGINT) AS v
  FROM events
)
SELECT event_type, day_bucket, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CASE WHEN rk = (n2 - 1) // 2 + 1 THEN v END) AS BIGINT)
         AS median_c2
FROM (
  SELECT event_type, day_bucket, v,
         row_number() OVER (
           PARTITION BY event_type, day_bucket ORDER BY v) AS rk,
         COUNT(*) OVER (PARTITION BY event_type, day_bucket) AS n2
  FROM x
)
GROUP BY event_type, day_bucket
ORDER BY event_type, day_bucket
"""


# -- exact WEIGHTED median (holistic aggregate with weights) ------------------

def weighted_median_price(sf_dir: str) -> "object":
    """Exact QUANTITY-WEIGHTED median of l_extendedprice per l_returnflag —
    the weighted holistic aggregate (fair price levels, demand-weighted
    cut points).  Same two-pass counting-histogram shape as
    ``median_price_per_status``, but the histogram accumulates WEIGHT SUMS
    instead of row counts: pass 1 folds per-(flag, bucket) Σw partials
    (driver holds flags × domain/4096 integers), pass 2 re-reads only the
    straddling buckets for per-(flag, value) Σw.  Convention (mirrored
    verbatim in the oracle): the weighted median is the smallest v with
    2·cumweight(v) ≥ W — integer arithmetic only, no halving.  Output:
    (l_returnflag, total_qty, wmedian_c2)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ._util import read_small_aware

    ds = read_small_aware(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )

    def hist(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        w = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        folded = pa.table(
            {"s": t["l_returnflag"], "b": _floor_bucket(v), "w": w}
        )
        agg = pa.TableGroupBy(folded, ["s", "b"]).aggregate([("w", "sum")])
        return agg.rename_columns(["s", "b", "w"])

    counts = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby(["s", "b"])
        .aggregate(ray.data.aggregate.Sum("w", alias_name="w"))
        .to_pandas()  # <= |flags| * domain/4096 rows
        .sort_values(["s", "b"])
        .reset_index(drop=True)
    )

    # per flag: the bucket where cumulative weight first reaches W/2
    need: dict[tuple[str, int], int] = {}
    totals: dict[str, int] = {}
    for s, g in counts.groupby("s"):
        g = g.reset_index(drop=True)
        W = int(g["w"].sum())
        totals[str(s)] = W
        cum = g["w"].cumsum()
        i = int((2 * cum >= W).idxmax())
        b = int(g.loc[i, "b"])
        before = int(cum.iloc[i - 1]) if i > 0 else 0
        need[(str(s), b)] = before  # weight in strictly lower buckets

    keys = pa.array([f"{s}|{b}" for (s, b) in sorted(need)], pa.string())

    def in_bucket(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        w = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        key = pc.binary_join_element_wise(
            t["l_returnflag"], pc.cast(_floor_bucket(v), pa.string()), "|"
        )
        sub = pa.table({"s": t["l_returnflag"], "v": v, "w": w}).filter(
            pc.is_in(key, value_set=keys)
        )
        agg = pa.TableGroupBy(sub, ["s", "v"]).aggregate([("w", "sum")])
        return agg.rename_columns(["s", "v", "w"])

    fine = (
        ds.map_batches(in_bucket, batch_format="pyarrow")
        .groupby(["s", "v"])
        .aggregate(ray.data.aggregate.Sum("w", alias_name="w"))
        .to_pandas()  # <= |flags| * 4096 rows
    )

    med: dict[str, int] = {}
    for (s, b), before in need.items():
        g = (
            fine[(fine["s"] == s) & (fine["v"] // _HIST_WIDTH == b)]
            .sort_values("v")
            .reset_index(drop=True)
        )
        cum = before + g["w"].cumsum()
        W = totals[s]
        i = int((2 * cum >= W).idxmax())
        med[s] = int(g.loc[i, "v"])
    out = pd.DataFrame(
        [
            {"l_returnflag": s, "total_qty": W, "wmedian_c2": med[s]}
            for s, W in sorted(totals.items())
        ]
    ).astype({"total_qty": "int64", "wmedian_c2": "int64"})
    return out.sort_values("l_returnflag").reset_index(drop=True)


WEIGHTED_MEDIAN_PRICE_SQL = """
WITH x AS (
  SELECT l_returnflag AS f,
         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS v,
         CAST(ROUND(l_quantity) AS BIGINT) AS w
  FROM lineitem
), tot AS (SELECT f, SUM(w) AS W FROM x GROUP BY f),
pv AS (SELECT f, v, SUM(w) AS wv FROM x GROUP BY f, v),
c AS (
  SELECT f, v, SUM(wv) OVER (PARTITION BY f ORDER BY v) AS cw FROM pv
)
SELECT c.f AS l_returnflag, CAST(tot.W AS BIGINT) AS total_qty,
       CAST(MIN(c.v) AS BIGINT) AS wmedian_c2
FROM c JOIN tot ON c.f = tot.f
WHERE 2 * c.cw >= tot.W
GROUP BY c.f, tot.W
ORDER BY c.f
"""


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable frequency summary + exact verify pass)
# ---------------------------------------------------------------------------

HH_K = 30  # report tokens whose corpus frequency exceeds n_tokens / HH_K
HH_CAPACITY = 32  # counters per summary; guarantee covers freq > n/(C+1)


def _mg_fold(counts: dict, capacity: int) -> dict:
    """Misra-Gries prune: if more than ``capacity`` entries survive, subtract
    the (capacity+1)-th largest count from every entry and drop the
    non-positive ones.  This is the mergeable-summaries combine step
    (Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries",
    PODS 2012): any merge tree of fold(sum(...)) underestimates each true
    count by at most n / (capacity + 1), so every token with true frequency
    above that bound is guaranteed to survive into the candidate set."""
    if len(counts) <= capacity:
        return dict(counts)
    vals = sorted(counts.values(), reverse=True)
    dec = vals[capacity]
    return {t: c - dec for t, c in counts.items() if c > dec}


def heavy_hitters(sf_dir: str) -> "object":
    """EXACT corpus heavy hitters (tokens with frequency > n/HH_K) via the
    two-pass sketch-then-verify shape: pass 1 folds each batch's token
    counts into a Misra-Gries summary of HH_CAPACITY entries (per-task
    memory is O(capacity), NOT vocabulary-sized — the property that matters
    when the corpus vocabulary outgrows a worker), one vocabulary-pruned
    ``groupby(tok).Sum`` merges the summaries, and the driver's final MG
    prune yields a candidate set of <= HH_CAPACITY tokens that provably
    contains every true heavy hitter (capacity 32 > HH_K guarantees
    superset).  Pass 2 streams the corpus once more counting ONLY the
    broadcast candidates (<= capacity rows leave each task) and keeps the
    exact counts that clear the threshold — so the output is exact, the
    sketch only bounded the candidate set.  Output: (tok, cnt)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from .text import _read_docs

    def pass1(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        total = 0
        for text in t.column("text").to_pylist():
            toks = TOKEN_RE.findall(text.lower())
            total += len(toks)
            c.update(toks)
        kept = _mg_fold(c, HH_CAPACITY)
        toks_out = sorted(kept) + [""]
        vals_out = [kept[x] for x in sorted(kept)] + [total]
        return pa.table(
            {
                "tok": pa.array(toks_out, pa.string()),
                "v": pa.array(vals_out, pa.int64()),
            }
        )

    merged = (
        _read_docs(sf_dir, ["text"])
        .map_batches(pass1, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("v", alias_name="v"))
        .to_pandas()  # <= union of summary tokens: summary-pruned, tiny
    )
    n_total = int(merged.loc[merged["tok"] == "", "v"].iloc[0])
    cand_counts = {
        t: int(v) for t, v in zip(merged["tok"], merged["v"]) if t != ""
    }
    candidates = tuple(sorted(_mg_fold(cand_counts, HH_CAPACITY)))

    def pass2(t: pa.Table) -> pa.Table:
        cset = set(candidates)
        from collections import Counter

        c: Counter = Counter()
        for text in t.column("text").to_pylist():
            c.update(x for x in TOKEN_RE.findall(text.lower()) if x in cset)
        toks_out = sorted(c)
        return pa.table(
            {
                "tok": pa.array(toks_out, pa.string()),
                "cnt": pa.array([c[x] for x in toks_out], pa.int64()),
            }
        )

    exact = (
        _read_docs(sf_dir, ["text"])
        .map_batches(pass2, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # <= HH_CAPACITY rows
    )
    out = exact[exact["cnt"] * HH_K > n_total].sort_values(
        ["cnt", "tok"], ascending=[False, True]
    )
    return pd.DataFrame(
        {
            "tok": out["tok"].astype(str),
            "cnt": out["cnt"].astype("int64"),
        }
    ).reset_index(drop=True)


HEAVY_HITTERS_SQL = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
), tot AS (SELECT COUNT(*) AS n FROM toks)
SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
FROM toks CROSS JOIN tot
GROUP BY tok, tot.n
HAVING COUNT(*) * {HH_K} > tot.n
ORDER BY cnt DESC, tok
"""


# -- KMV (k-minimum-values) distinct sketch + exact verify --------------------

KMV_K = 256
_KMV_DOMAIN = 1 << 60  # 15 md5 hex chars: BIGINT-safe on the oracle side


def _kmv_hash_batch(users: "np.ndarray") -> list[int]:
    """60-bit md5 hash of each (already deduplicated) user id — the KMV
    value space, deterministic and SQL-mirrorable."""
    return [
        int.from_bytes(hashlib.md5(str(u).encode()).digest()[:8], "big") >> 4
        for u in users
    ]


def kmv_distinct_users(sf_dir: str) -> "object":
    """Distinct users per event_type two ways side by side: a KMV
    (k-minimum-values / bottom-k) sketch estimate (Bar-Yossef et al. 2002;
    the mergeable bottom-k form of Beyer et al., SIGMOD 2007) and the exact
    count — the sketch-accuracy audit shape, like ``heavy_hitters``.

    KMV state is the K smallest distinct 60-bit md5 hashes per group;
    estimate = (K-1) * 2^60 // h_K (pure integers, so the APPROXIMATE
    answer hash-matches its SQL mirror — same trick as ``hll_users_per_type``).
    Scale shape: batch partials emit <= K rows per (group, batch); a
    combine ``map_batches`` re-sketches ~256 partial blocks per task before
    the per-group fold, so the fold's input is blocks/256 * K rows — a
    tree reduce, never corpus-proportional.  The exact side is the
    user-bucket co-location of [[distinct-users-daily]] (in-bucket distinct
    is global distinct; only (bucket, group, count) partials reach the
    5-group aggregate).  Output: (event_type, exact_distinct,
    kmv_estimate); ``exact_distinct`` counts distinct HASHES (= distinct
    users absent 60-bit collisions, which both sides share by
    construction)."""
    import pandas as pd

    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ._util import n_buckets, read_small_aware

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/events.parquet").num_rows)
    ds = read_small_aware(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": t.column("event_type").to_pylist(),
                "u": t.column("user_id").to_pylist(),
            }
        ).drop_duplicates()
        gs, hs = [], []
        for g, sub in df.groupby("g"):
            hv = sorted(set(_kmv_hash_batch(sub["u"].to_numpy())))[:KMV_K]
            gs.extend([g] * len(hv))
            hs.extend(hv)
        return pa.table(
            {"g": pa.array(gs, pa.string()), "hv": pa.array(hs, pa.int64())}
        )

    def resketch(t: pa.Table) -> pa.Table:
        # combine stage: merge many batch partials into one K-sketch per
        # group (pure pandas nsmallest over distinct hashes)
        df = t.to_pandas().drop_duplicates()
        out_g, out_h = [], []
        for g, sub in df.groupby("g"):
            keep = sub["hv"].nsmallest(KMV_K)
            out_g.extend([g] * len(keep))
            out_h.extend(keep.tolist())
        return pa.table(
            {
                "g": pa.array(out_g, pa.string()),
                "hv": pa.array(out_h, pa.int64()),
            }
        )

    sketch = (
        ds.map_batches(partials, batch_format="pyarrow")
        .map_batches(resketch, batch_format="pyarrow", batch_size=KMV_K * 256)
        .groupby("g")
        .map_groups(resketch, batch_format="pyarrow")
        .to_pandas()  # <= n_groups * K rows: the sketch, not the data
    )

    # exact pass: user-bucket co-location over the same 60-bit hash space
    def hash_rows(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": t.column("event_type").to_pylist(),
                "u": t.column("user_id").to_pylist(),
            }
        ).drop_duplicates()
        hv = np.array(_kmv_hash_batch(df["u"].to_numpy()), dtype=np.int64)
        return pa.table(
            {
                "ub": pa.array((hv & (nb - 1)).astype(np.int32)),
                "g": pa.array(df["g"].to_numpy(), pa.string()),
                "hv": pa.array(hv),
            }
        )

    def bucket_distinct(g: pd.DataFrame) -> pa.Table:
        c = g[["g", "hv"]].drop_duplicates().groupby("g").size()
        return pa.table(
            {
                "g": pa.array(c.index.to_numpy(), pa.string()),
                "n": pa.array(c.to_numpy("int64")),
            }
        )

    exact = (
        ds.map_batches(hash_rows, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(bucket_distinct, batch_format="pandas")
        .groupby("g")
        .aggregate(Sum("n", alias_name="nd"))
        .to_pandas()  # n_groups rows
    )

    rows = []
    nd_by_g = dict(zip(exact["g"], exact["nd"]))
    for g, sub in sketch.groupby("g"):
        hv = sorted(sub["hv"].tolist())
        if len(hv) < KMV_K:
            est = len(hv)
        else:
            est = (KMV_K - 1) * _KMV_DOMAIN // int(hv[KMV_K - 1])
        rows.append((g, int(nd_by_g[g]), int(est)))
    return pd.DataFrame(
        sorted(rows), columns=["event_type", "exact_distinct", "kmv_estimate"]
    ).astype({"exact_distinct": "int64", "kmv_estimate": "int64"})


KMV_DISTINCT_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
              AS UBIGINT) >> 4 AS hv
  FROM events
), r AS (
  SELECT event_type, CAST(hv AS BIGINT) AS hv,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS nd
  FROM h
)
SELECT event_type,
       CAST(MAX(nd) AS BIGINT) AS exact_distinct,
       CAST(CASE WHEN MAX(nd) >= {KMV_K}
                 THEN CAST({KMV_K - 1} AS HUGEINT)
                      * CAST({_KMV_DOMAIN} AS HUGEINT)
                      // CAST(MAX(CASE WHEN rn = {KMV_K} THEN hv END)
                              AS HUGEINT)
                 ELSE MAX(nd) END AS BIGINT) AS kmv_estimate
FROM r GROUP BY event_type ORDER BY event_type
"""


# -- DDSketch-style relative-error quantile sketch (integer-exact) ------------

#: quantiles reported, in basis points
DDSKETCH_QS = (5000, 9000, 9900, 9990)


def _dd_rep(idx: int) -> int:
    """Bucket lower bound from the bucket index (the reported estimate)."""
    if idx < 32:
        return idx
    bl = 6 + (idx - 32) // 16
    sub = (idx - 32) % 16
    return (16 + sub) << (bl - 5)


def ddsketch_price_quantiles(sf_dir: str) -> "pd.DataFrame":
    """Relative-error quantile sketch over ``l_extendedprice`` — the
    DDSketch shape (log-spaced buckets, counts mergeable by addition)
    rebuilt on INTEGER bit arithmetic so the approximate answer is
    DETERMINISTIC and hash-matches a DuckDB oracle: no ``ln`` boundary
    ulps, no merge-order dependence (bucket counts commute), unlike
    KLL/t-digest whose compaction is sample-order dependent and would
    break this repo's partitioning-invariance contract.

    Bucketing (positive cents v): v < 32 → exact bucket v; else with
    bl = bit_length(v), bucket = (bl, top-4-bits-after-msb), lower bound
    (16+sub)·2^(bl-5) — ≤ 1/16 relative bucket width, ~16 buckets per
    octave, ≤ ~500 buckets for any int64 domain.  bit_length is exact on
    both sides (numpy ``frexp`` exponent below 2^53; DuckDB
    ``length(bin(v))``), so the sketch needs no float anywhere.

    Distributed plan: per-batch numpy partials (bucket → count), one
    ~500-group aggregate (far under the group-count groupby cliff), a
    driver fold in exact integer arithmetic.  Reported estimate per
    quantile q: the lower bound of the first bucket whose cumulative
    count reaches ceil(q·n) — guaranteed est ≤ true < est·17/16
    (error-bound pytest vs the exact sorted quantile).

    Output: (q_bp, est_c2).  Beyond-reference engine addition
    (SURVEY.md §2.8)."""
    import numpy as np
    import pandas as pd

    from ._util import read_small_aware

    ds = read_small_aware(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = pc.cast(
            pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        # exact bit length below 2^53: frexp exponent of the float image
        bl = np.frexp(v.astype(np.float64))[1].astype(np.int64)
        sub = (v >> np.maximum(bl - 5, 0)) & 15
        idx = np.where(v < 32, v, 32 + (bl - 6) * 16 + sub)
        u, c = np.unique(idx, return_counts=True)
        return pa.table({"idx": pa.array(u, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("idx")
        .aggregate(ray.data.aggregate.Sum("c", alias_name="c"))
        .to_pandas()  # ≤ ~500 rows for any corpus
        .sort_values("idx")
        .reset_index(drop=True)
    )
    idxs = [int(x) for x in counts["idx"]]
    cs = [int(x) for x in counts["c"]]
    n = sum(cs)
    cum = 0
    cums = []
    for c in cs:
        cum += c
        cums.append(cum)
    out = []
    for q in DDSKETCH_QS:
        target = (q * n + 9999) // 10000  # ceil(q·n/1e4), Python-int exact
        pos = next(i for i, cm in enumerate(cums) if cm >= target)
        out.append({"q_bp": q, "est_c2": _dd_rep(idxs[pos])})
    return pd.DataFrame(out)


DDSKETCH_PRICE_QUANTILES_SQL = f"""
WITH v AS (
  SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS v FROM lineitem
),
b AS (
  SELECT CASE WHEN v < 32 THEN v
              ELSE 32 + (length(bin(v)) - 6) * 16
                   + ((v >> (length(bin(v)) - 5)) & 15)
         END AS idx, CAST(COUNT(*) AS BIGINT) AS c
  FROM v GROUP BY 1
),
cum AS (
  SELECT idx, SUM(c) OVER (ORDER BY idx) AS cum,
         (SELECT SUM(c) FROM b) AS n
  FROM b
),
qs(q_bp) AS (VALUES {", ".join(f"({q})" for q in DDSKETCH_QS)}),
pick AS (
  SELECT q_bp, MIN(idx) AS idx
  FROM qs JOIN cum ON cum.cum >= (q_bp * cum.n + 9999) // 10000
  GROUP BY q_bp
)
SELECT CAST(q_bp AS BIGINT) AS q_bp,
       CAST(CASE WHEN idx < 32 THEN idx
                 ELSE (16 + (idx - 32) % 16) << ((6 + (idx - 32) // 16) - 5)
            END AS BIGINT) AS est_c2
FROM pick ORDER BY q_bp
"""


# -- KMV sketch set-algebra: pairwise distinct-user overlap --------------------

def kmv_type_overlap(sf_dir: str) -> "object":
    """Distinct-user OVERLAP between every pair of event types, two ways:
    the KMV set-intersection estimator (Beyer et al., SIGMOD 2007 — the
    sketch-algebra trick that makes bottom-k mergeable ACROSS set
    operations, which HLL union-only state cannot do) next to the exact
    count.  Per pair: union sketch = K smallest hashes of S_a ∪ S_b,
    ρ = members of that union sketch present in BOTH input sketches, and
    ``est = ρ·((K−1)·2⁶⁰//h_K)//K`` — pure integers end-to-end, so the
    APPROXIMATE answer hash-matches its SQL mirror (the
    ``kmv_distinct_users`` contract).  When the union holds < K hashes the
    sketch IS the exact hash set and the estimate degrades to ρ itself.

    Scale shape: sketches reuse the tree-combined bottom-k fold (≤ K rows
    per group per combine block); the exact side is ONE user-bucket
    co-location whose in-bucket kernel forms the boolean user×type
    presence matrix and emits all pair counts via one M^T·M matmul — only
    (type_a, type_b, count) partials reach the final |pairs|-row fold.
    Output: (type_a, type_b, exact_overlap, kmv_estimate)."""
    import itertools

    import pandas as pd

    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ._util import n_buckets, read_small_aware

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/events.parquet").num_rows)
    ds = read_small_aware(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": t.column("event_type").to_pylist(),
                "u": t.column("user_id").to_pylist(),
            }
        ).drop_duplicates()
        gs, hs = [], []
        for g, sub in df.groupby("g"):
            hv = sorted(set(_kmv_hash_batch(sub["u"].to_numpy())))[:KMV_K]
            gs.extend([g] * len(hv))
            hs.extend(hv)
        return pa.table(
            {"g": pa.array(gs, pa.string()), "hv": pa.array(hs, pa.int64())}
        )

    def resketch(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        out_g, out_h = [], []
        for g, sub in df.groupby("g"):
            keep = sub["hv"].nsmallest(KMV_K)
            out_g.extend([g] * len(keep))
            out_h.extend(keep.tolist())
        return pa.table(
            {
                "g": pa.array(out_g, pa.string()),
                "hv": pa.array(out_h, pa.int64()),
            }
        )

    sketch = (
        ds.map_batches(partials, batch_format="pyarrow")
        .map_batches(resketch, batch_format="pyarrow", batch_size=KMV_K * 256)
        .groupby("g")
        .map_groups(resketch, batch_format="pyarrow")
        .to_pandas()  # <= n_groups * K rows
    )
    sk = {g: set(sub["hv"].tolist()) for g, sub in sketch.groupby("g")}

    # exact pairwise overlap: ONE user-bucket co-location, matmul kernel
    def hash_rows(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": t.column("event_type").to_pylist(),
                "u": t.column("user_id").to_pylist(),
            }
        ).drop_duplicates()
        hv = np.array(_kmv_hash_batch(df["u"].to_numpy()), dtype=np.int64)
        return pa.table(
            {
                "ub": pa.array((hv & (nb - 1)).astype(np.int32)),
                "g": pa.array(df["g"].to_numpy(), pa.string()),
                "hv": pa.array(hv),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        m = (
            g[["hv", "g"]].drop_duplicates()
            .assign(one=1)
            .pivot_table(index="hv", columns="g", values="one",
                         fill_value=0, aggfunc="max")
        )
        types = sorted(m.columns)
        mat = m[types].to_numpy(dtype=np.int64)
        cc = mat.T @ mat
        ga, gb, n = [], [], []
        for i, j in itertools.combinations(range(len(types)), 2):
            ga.append(types[i])
            gb.append(types[j])
            n.append(int(cc[i, j]))
        return pa.table(
            {
                "ga": pa.array(ga, pa.string()),
                "gb": pa.array(gb, pa.string()),
                "n": pa.array(n, pa.int64()),
            }
        )

    exact = (
        ds.map_batches(hash_rows, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["ga", "gb"])
        .aggregate(Sum("n", alias_name="ov"))
        .to_pandas()  # |type pairs| rows
    )
    ov = {(a, b): int(n) for a, b, n in zip(exact["ga"], exact["gb"], exact["ov"])}

    rows = []
    for a, b in itertools.combinations(sorted(sk), 2):
        union = sorted(sk[a] | sk[b])
        top = union[:KMV_K]
        rho = sum(1 for h in top if h in sk[a] and h in sk[b])
        if len(union) >= KMV_K:
            hk = int(top[KMV_K - 1])
            est = rho * ((KMV_K - 1) * _KMV_DOMAIN // hk) // KMV_K
        else:
            est = rho
        rows.append((a, b, ov.get((a, b), 0), est))
    return pd.DataFrame(
        rows, columns=["type_a", "type_b", "exact_overlap", "kmv_estimate"]
    ).astype({"exact_overlap": "int64", "kmv_estimate": "int64"})


KMV_TYPE_OVERLAP_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type AS g,
         CAST(CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
              AS UBIGINT) >> 4 AS BIGINT) AS hv
  FROM events
),
r AS (SELECT g, hv, ROW_NUMBER() OVER (PARTITION BY g ORDER BY hv) AS rn
      FROM h),
sk AS (SELECT g, hv FROM r WHERE rn <= {KMV_K}),
tp AS (SELECT DISTINCT g FROM sk),
pairs AS (SELECT a.g AS ga, b.g AS gb FROM tp a JOIN tp b ON a.g < b.g),
u AS (
  SELECT p.ga, p.gb, s.hv,
         MAX(CASE WHEN s.g = p.ga THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN s.g = p.gb THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN sk s ON s.g IN (p.ga, p.gb)
  GROUP BY p.ga, p.gb, s.hv
),
ur AS (
  SELECT ga, gb, hv, in_a, in_b,
         ROW_NUMBER() OVER (PARTITION BY ga, gb ORDER BY hv) AS rn,
         COUNT(*) OVER (PARTITION BY ga, gb) AS nu
  FROM u
),
est AS (
  SELECT ga, gb,
         SUM(CASE WHEN rn <= {KMV_K} AND in_a = 1 AND in_b = 1
                  THEN 1 ELSE 0 END) AS rho,
         MAX(CASE WHEN rn = {KMV_K} THEN hv END) AS hk,
         MAX(nu) AS nu
  FROM ur GROUP BY ga, gb
),
ex AS (
  SELECT a.g AS ga, b.g AS gb, COUNT(*) AS ov
  FROM h a JOIN h b ON a.hv = b.hv AND a.g < b.g
  GROUP BY 1, 2
)
SELECT e.ga AS type_a, e.gb AS type_b,
       CAST(COALESCE(ex.ov, 0) AS BIGINT) AS exact_overlap,
       CAST(CASE WHEN e.nu >= {KMV_K}
                 THEN CAST(e.rho AS HUGEINT)
                      * (CAST({KMV_K - 1} AS HUGEINT)
                         * CAST({_KMV_DOMAIN} AS HUGEINT) // e.hk)
                      // {KMV_K}
                 ELSE e.rho END AS BIGINT) AS kmv_estimate
FROM est e LEFT JOIN ex ON ex.ga = e.ga AND ex.gb = e.gb
ORDER BY type_a, type_b
"""


# -- exact trimmed mean (robust location) --------------------------------------

TRIM_BP = 1_000  # basis points trimmed off EACH tail (10%)


def trimmed_mean_by_type(sf_dir: str) -> "object":
    """Exact 10%-trimmed mean ingredients of event value per type — the
    robust location estimate that tolerates a tail of corrupt records
    (complements ``mad_outliers``'s robust scale): drop the ⌊n/10⌋
    cheapest and ⌊n/10⌋ most expensive rows by rank, report the exact sum
    and count of what is kept.  Tie-order invariant: the k cheapest of an
    equal-value run contribute the same sum under any tie permutation.

    The [[counting-histogram-rank-identity]] two-pass shape: a coarse
    (type, bucket) count+sum fold locates the two trim boundaries per
    type; a fine per-value count pass touches ONLY those boundary buckets;
    kept_sum = cumvalue(n−k) − cumvalue(k) with straddling-run arithmetic
    in Python ints.  No corpus row is shuffled twice and the driver holds
    O(types × domain/4096) rows.  Output: (event_type, n, kept_n,
    kept_sum_c2, trimmed_mean_mu = (kept_sum_c2·10⁶)//kept_n).
    Beyond-reference engine addition (SURVEY.md §2.8)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from ._util import read_small_aware

    ds = read_small_aware(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def hist(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        folded = pa.table(
            {"s": t["event_type"], "b": _floor_bucket(v), "v": v}
        )
        return pa.TableGroupBy(folded, ["s", "b"]).aggregate(
            [("v", "sum"), ([], "count_all")]
        )

    coarse = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby(["s", "b"])
        .aggregate(
            Sum("v_sum", alias_name="sv"), Sum("count_all", alias_name="c")
        )
        .to_pandas()  # O(types x domain/4096)
    )
    # per type: the two rank targets k and n-k, and which buckets straddle
    need: dict[tuple[str, int], list[int]] = {}
    info: dict[str, tuple[int, int, int]] = {}  # n, total, k
    cums: dict[str, tuple] = {}
    for s, sub in coarse.groupby("s"):
        sub = sub.sort_values("b").reset_index(drop=True)
        n = int(sub["c"].sum())
        total = int(sub["sv"].sum())
        k = (n * TRIM_BP) // 10_000
        info[s] = (n, total, k)
        cums[s] = sub
        for target in (k, n - k):
            if target <= 0:
                continue
            cum_c = sub["c"].cumsum()
            i = int((cum_c >= target).idxmax())
            need.setdefault((s, int(sub.loc[i, "b"])), []).append(target)

    wanted = pa.array(sorted(f"{s}|{b}" for s, b in need), pa.string())

    def fine(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        b = _floor_bucket(v)
        key = pc.binary_join_element_wise(
            pc.cast(t["event_type"], pa.string()), pc.cast(b, pa.string()), "|"
        )
        sub = pa.table({"s": t["event_type"], "b": b, "v": v}).filter(
            pc.is_in(key, value_set=wanted)
        )
        return pa.TableGroupBy(sub, ["s", "b", "v"]).aggregate(
            [([], "count_all")]
        )

    fined = (
        ds.map_batches(fine, batch_format="pyarrow")
        .groupby(["s", "b", "v"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # distinct values inside boundary buckets only
    )

    def cumvalue(s: str, target: int) -> int:
        if target <= 0:
            return 0
        sub = cums[s]
        cum_c = sub["c"].cumsum()
        i = int((cum_c >= target).idxmax())
        rows_below = int(cum_c.iloc[i - 1]) if i > 0 else 0
        val_below = int(sub["sv"].cumsum().iloc[i - 1]) if i > 0 else 0
        bb = int(sub.loc[i, "b"])
        fsub = (
            fined[(fined["s"] == s) & (fined["b"] == bb)]
            .sort_values("v")
            .reset_index(drop=True)
        )
        remaining = target - rows_below
        cumv = val_below
        for v, c in zip(fsub["v"], fsub["c"]):
            take = min(int(c), remaining)
            cumv += int(v) * take
            remaining -= take
            if remaining == 0:
                break
        return cumv

    rows = []
    for s, (n, total, k) in info.items():
        kept_sum = cumvalue(s, n - k) - cumvalue(s, k)
        kept_n = n - 2 * k
        rows.append(
            {"event_type": s, "n": n, "kept_n": kept_n,
             "kept_sum_c2": kept_sum,
             "trimmed_mean_mu": (kept_sum * 1_000_000) // kept_n}
        )
    return (
        pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
        .astype({c: "int64" for c in
                 ("n", "kept_n", "kept_sum_c2", "trimmed_mean_mu")})
        .reset_index(drop=True)
    )


TRIMMED_MEAN_BY_TYPE_SQL = f"""
WITH x AS (
  SELECT event_type AS s, CAST(ROUND(value*100) AS BIGINT) AS v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ROUND(value*100))
           AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT s AS event_type, CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(n) - 2 * ((MAX(n) * {TRIM_BP}) // 10000) AS BIGINT) AS kept_n,
       CAST(SUM(CASE WHEN rn > (n * {TRIM_BP}) // 10000
                      AND rn <= n - (n * {TRIM_BP}) // 10000
                     THEN v ELSE 0 END) AS BIGINT) AS kept_sum_c2,
       CAST(SUM(CASE WHEN rn > (n * {TRIM_BP}) // 10000
                      AND rn <= n - (n * {TRIM_BP}) // 10000
                     THEN CAST(v AS HUGEINT) ELSE 0 END) * 1000000
            // (MAX(n) - 2 * ((MAX(n) * {TRIM_BP}) // 10000)) AS BIGINT)
         AS trimmed_mean_mu
FROM x GROUP BY s ORDER BY s
"""


# -- exact 1-D Wasserstein (earth-mover) distance between types ----------------

def wasserstein_type_pairs(sf_dir: str) -> "object":
    """Exact Wasserstein-1 (earth-mover) distance between the value
    distributions of every event-type pair — the drift metric that, unlike
    ``source_drift_ks``'s sup-norm, integrates the WHOLE CDF gap:
    W₁ = ∫|F_a − F_b| dv, computed exactly on integer cents as
    ``emd_num/emd_den`` with emd_num = Σ_runs |cumA·n_b − cumB·n_a|·gap and
    emd_den = n_a·n_b (denominators cleared — no float ever).

    Scale shape: the corpus collapses map-side into (type, value) partial
    counts (the value DOMAIN, not rows — the interarrival-quantiles count
    table); the driver walks each pair's merged support once with Python
    ints.  int64 bound: cum·n ≤ n² and ×gap ≤ n²·range — exact output to
    ~10⁷ rows/type at this value range (the ``auc_by_type`` caveat: the
    driver is arbitrary-precision, the final cast RAISES, the HUGEINT
    oracle likewise).  Output: (type_a, type_b, n_a, n_b, emd_num,
    emd_den).  Beyond-reference engine addition (SURVEY.md §2.8)."""
    import itertools

    import pandas as pd

    from ray.data.aggregate import Sum

    from ._util import read_small_aware

    ds = read_small_aware(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def fold(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        folded = pa.table({"t": t["event_type"], "v": v})
        return pa.TableGroupBy(folded, ["t", "v"]).aggregate(
            [([], "count_all")]
        )

    counts = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["t", "v"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(types x value domain)
    )
    per_type = {
        t: dict(zip(sub["v"].astype(int), sub["c"].astype(int)))
        for t, sub in counts.groupby("t")
    }
    rows = []
    for a, b in itertools.combinations(sorted(per_type), 2):
        ca, cb = per_type[a], per_type[b]
        na, nbt = sum(ca.values()), sum(cb.values())
        support = sorted(set(ca) | set(cb))
        cum_a = cum_b = 0
        num = 0
        for v, nxt in zip(support, support[1:]):
            cum_a += ca.get(v, 0)
            cum_b += cb.get(v, 0)
            num += abs(cum_a * nbt - cum_b * na) * (nxt - v)
        rows.append(
            {"type_a": a, "type_b": b, "n_a": na, "n_b": nbt,
             "emd_num": num, "emd_den": na * nbt}
        )
    return pd.DataFrame(rows).astype(
        {c: "int64" for c in ("n_a", "n_b", "emd_num", "emd_den")}
    )


WASSERSTEIN_TYPE_PAIRS_SQL = """
WITH v AS (
  SELECT event_type AS t, CAST(ROUND(value*100) AS BIGINT) AS v,
         CAST(COUNT(*) AS HUGEINT) AS c
  FROM events GROUP BY 1, 2
),
tp AS (SELECT DISTINCT t FROM v),
pairs AS (SELECT a.t AS ta, b.t AS tb FROM tp a JOIN tp b ON a.t < b.t),
sup AS (
  SELECT p.ta, p.tb, x.v,
         SUM(CASE WHEN x.t = p.ta THEN x.c ELSE 0 END) AS ca,
         SUM(CASE WHEN x.t = p.tb THEN x.c ELSE 0 END) AS cb
  FROM pairs p JOIN v x ON x.t IN (p.ta, p.tb)
  GROUP BY 1, 2, 3
),
cum AS (
  SELECT ta, tb, v,
         SUM(ca) OVER (PARTITION BY ta, tb ORDER BY v) AS cuma,
         SUM(cb) OVER (PARTITION BY ta, tb ORDER BY v) AS cumb,
         LEAD(v) OVER (PARTITION BY ta, tb ORDER BY v) AS nxt,
         SUM(ca) OVER (PARTITION BY ta, tb) AS na,
         SUM(cb) OVER (PARTITION BY ta, tb) AS nb
  FROM sup
)
SELECT ta AS type_a, tb AS type_b,
       CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
       CAST(SUM(CASE WHEN nxt IS NULL THEN 0
                     ELSE ABS(cuma * nb - cumb * na) * (nxt - v) END)
            AS BIGINT) AS emd_num,
       CAST(MAX(na) * MAX(nb) AS BIGINT) AS emd_den
FROM cum GROUP BY 1, 2 ORDER BY 1, 2
"""


# -- AMS F2 sketch (second frequency moment) ----------------------------------

#: AMS counter count: 16 independent ±1-hash counters; the estimate is the
#: median of their squares (emitted as the sum of the two middle order
#: statistics so the even-K median stays integer-exact).
AMS_K = 16


def ams_f2_by_type(sf_dir: str) -> "object":
    """Second frequency moment F2 = Σ_u c_u² of the per-user event counts
    for each event type, two ways side by side: the Alon-Matias-Szegedy
    ±1-sketch estimate (STOC 1996 — THE original streaming-moments sketch;
    F2 is the self-join size / repeat-rate statistic) and the exact value,
    in the ``heavy_hitters``/``kmv`` sketch-accuracy-audit shape.

    AMS state is ``AMS_K`` integer counters per type, each
    ``Σ_events sign_j(user)`` with the sign drawn from bit j of the 64-bit
    md5 of the user id — LINEAR in the stream, so per-batch partials fold
    through an ordinary combiner groupby and NOTHING is co-located for the
    sketch.  E[counter²] = F2; the estimate here is the median of the
    ``AMS_K`` squares, emitted as the sum of the two middle order
    statistics (integer-exact, SQL-mirrorable like ``hll_users_per_type``).
    The exact side is ONE user-bucket co-location whose kernel counts
    (type, user) locally (complete: bucket derives from the user id) and
    ships only per-type Σc² partials.  Output: (event_type, f2_exact,
    f2_ams_x2).  Beyond-reference engine addition (SURVEY.md §2.8)."""
    import pandas as pd

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ._util import n_buckets, read_small_aware

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/events.parquet").num_rows)
    ds = read_small_aware(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def ams_partials(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        uids = df["user_id"].to_numpy(np.int64)
        uniq, inv = np.unique(uids, return_inverse=True)
        hv = np.array(
            [
                int.from_bytes(hashlib.md5(str(u).encode()).digest()[:8], "big")
                for u in uniq
            ],
            dtype=np.uint64,
        )
        bits = (
            (hv[:, None] >> np.arange(AMS_K, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.int64)
        signs = (2 * bits - 1)[inv]  # (rows, K)
        part = pd.DataFrame(signs, columns=[f"c{j}" for j in range(AMS_K)])
        part["event_type"] = df["event_type"].to_numpy()
        agg = part.groupby("event_type", as_index=False).sum()
        return pa.table(
            {
                "event_type": pa.array(agg["event_type"], pa.string()),
                **{
                    f"c{j}": pa.array(agg[f"c{j}"].to_numpy(np.int64))
                    for j in range(AMS_K)
                },
            }
        )

    counters = (
        ds.map_batches(ams_partials, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(*[Sum(f"c{j}", alias_name=f"c{j}") for j in range(AMS_K)])
        .to_pandas()  # |types| rows
    )

    def keyed(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "ub": pc.cast(pc.bit_wise_and(uid, nb - 1), pa.int32()),
                "event_type": t["event_type"],
                "user_id": uid,
            }
        )

    def bucket_f2(g: pd.DataFrame) -> pd.DataFrame:
        cu = (
            g.groupby(["event_type", "user_id"], as_index=False).size()
        )
        cu["f2"] = cu["size"].astype("int64") ** 2
        out = cu.groupby("event_type", as_index=False)["f2"].sum()
        out["f2"] = out["f2"].astype("int64")
        return out

    exact = (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(bucket_f2, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("f2", alias_name="f2_exact"))
        .to_pandas()  # |types| rows
    )

    merged = exact.merge(counters, on="event_type").sort_values("event_type")
    est = []
    for r in merged.itertuples():
        sq = sorted(int(getattr(r, f"c{j}")) ** 2 for j in range(AMS_K))
        est.append(sq[AMS_K // 2 - 1] + sq[AMS_K // 2])
    out = pd.DataFrame(
        {
            "event_type": merged["event_type"].to_numpy(),
            "f2_exact": merged["f2_exact"].to_numpy(np.int64),
            "f2_ams_x2": np.array(est, dtype=np.int64),
        }
    )
    return out.reset_index(drop=True)


def _ams_sql() -> str:
    terms = ",\n         ".join(
        f"SUM(CASE WHEN (hv >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS c{j}"
        for j in range(AMS_K)
    )
    squares = ", ".join(
        f"CAST(c{j} AS HUGEINT) * c{j}" for j in range(AMS_K)
    )
    mid = AMS_K // 2
    return f"""
WITH h AS (
  SELECT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
              AS UBIGINT) AS hv
  FROM events
),
ctr AS (
  SELECT event_type,
         {terms}
  FROM h GROUP BY event_type
),
med AS (
  SELECT event_type,
         list_sort(list_value({squares})) AS sq
  FROM ctr
),
ex AS (
  SELECT event_type, CAST(SUM(c * c) AS BIGINT) AS f2_exact
  FROM (
    SELECT event_type, user_id, COUNT(*) AS c FROM events GROUP BY 1, 2
  ) GROUP BY event_type
)
SELECT ex.event_type, ex.f2_exact,
       CAST(sq[{mid}] + sq[{mid + 1}] AS BIGINT) AS f2_ams_x2
FROM ex JOIN med ON ex.event_type = med.event_type
ORDER BY ex.event_type
"""


AMS_F2_BY_TYPE_SQL = _ams_sql()


# -- interpolated (quantile_cont) percentiles ----------------------------------

#: percent points for the interpolated quantile surface
QCONT_PCTS = (25, 50, 75, 90)


def quantile_cont_price(sf_dir: str) -> "object":
    """INTERPOLATED percentiles of l_extendedprice — SQL ``quantile_cont``
    / numpy ``linear`` semantics (pos = p/100·(n−1), linear blend of the
    two straddling order statistics), complementing the discrete
    ``exact_price_quantiles``.  The blend stays integer-exact by emitting
    hundredth-of-cent units: with k = (n−1)·p // 100 and remainder
    r = (n−1)·p % 100, ``value_c4 = v_k·100 + (v_{k+1} − v_k)·r`` — no
    float division on either side.

    Same two-pass counting-histogram shape as ``exact_price_quantiles``
    (coarse bucket counts locate the straddling buckets; the fine pass
    re-reads only those buckets' values), fetching BOTH order statistics
    k and k+1 per target.  Output: (pct, value_c4).  Beyond-reference
    engine addition (SURVEY.md §2.8)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ._util import read_small_aware

    ds = read_small_aware(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def hist(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        folded = pa.table({"b": _floor_bucket(v)})
        return pa.TableGroupBy(folded, "b").aggregate([([], "count_all")])

    counts = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("b")
        .aggregate(ray.data.aggregate.Sum("count_all", alias_name="n"))
        .to_pandas()  # <= domain / 4096 rows
        .sort_values("b")
        .reset_index(drop=True)
    )
    n = int(counts["n"].sum())
    cum = counts["n"].cumsum()

    # ranks needed: k and k+1 (0-based) per percent point
    kparts = {p: divmod((n - 1) * p, 100) for p in QCONT_PCTS}
    ranks = sorted(
        {k for k, _ in kparts.values()}
        | {min(k + 1, n - 1) for k, _ in kparts.values()}
    )
    need: dict[int, list[int]] = {}
    rank_bucket: dict[int, tuple[int, int]] = {}
    for rk in ranks:
        i = int((cum > rk).idxmax())
        b = int(counts.loc[i, "b"])
        before = int(cum.iloc[i - 1]) if i > 0 else 0
        need.setdefault(b, []).append(rk)
        rank_bucket[rk] = (b, rk - before)

    wanted = pa.array(sorted(need), pa.int64())

    def in_bucket(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        sub = pa.table({"b": _floor_bucket(v), "v": v}).filter(
            pc.is_in(_floor_bucket(v), value_set=wanted)
        )
        return pa.TableGroupBy(sub, ["b", "v"]).aggregate([([], "count_all")])

    fine = (
        ds.map_batches(in_bucket, batch_format="pyarrow")
        .groupby(["b", "v"])
        .aggregate(ray.data.aggregate.Sum("count_all", alias_name="n"))
        .to_pandas()  # <= |wanted| * 4096 rows
    )

    val_at: dict[int, int] = {}
    for b, rks in need.items():
        g = fine[fine["b"] == b].sort_values("v").reset_index(drop=True)
        gc = g["n"].cumsum()
        for rk in rks:
            j = int((gc > rank_bucket[rk][1]).idxmax())
            val_at[rk] = int(g.loc[j, "v"])

    rows = []
    for p in QCONT_PCTS:
        k, r = kparts[p]
        lo = val_at[k]
        hi = val_at[min(k + 1, n - 1)]
        rows.append({"pct": p, "value_c4": lo * 100 + (hi - lo) * r})
    return (
        pd.DataFrame(rows)
        .astype({"pct": "int64", "value_c4": "int64"})
        .sort_values("pct")
        .reset_index(drop=True)
    )


QUANTILE_CONT_PRICE_SQL = """
WITH v AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v
  FROM lineitem
),
r AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v) - 1 AS rk,
         COUNT(*) OVER () AS n
  FROM v
),
p AS (SELECT * FROM (VALUES (25), (50), (75), (90)) AS t(pct)),
t AS (
  SELECT pct, (n - 1) * pct // 100 AS k, (n - 1) * pct % 100 AS rem
  FROM p CROSS JOIN (SELECT DISTINCT n FROM r) AS nn(n)
)
SELECT t.pct,
       CAST(lo.v * 100 + (COALESCE(hi.v, lo.v) - lo.v) * t.rem AS BIGINT)
         AS value_c4
FROM t
JOIN r lo ON lo.rk = t.k
LEFT JOIN r hi ON hi.rk = t.k + 1
ORDER BY t.pct
"""


# -- Hodges-Lehmann location estimate -----------------------------------------


def hodges_lehmann_qty(sf_dir: str) -> "object":
    """Exact Hodges-Lehmann location estimator of l_quantity per return
    flag — the rank-based robust center (median of all pairwise Walsh
    sums over i<j plus ties-within-value), the point estimate that pairs
    with the Mann-Whitney test (``mann_whitney_qty``).  The naive form is
    an O(n^2) self-join; here the 50-value quantity domain makes the
    per-flag VALUE HISTOGRAM a sufficient statistic: pair multiplicities
    are c_i*c_j (v_i<v_j) and c*(c-1)/2 (v_i=v_j), so the full pairwise-sum
    distribution is an O(domain^2) convolution the driver replays in exact
    Python ints.  The doubled estimator hl2 (median pairwise SUM, lower
    median at 0-based rank (P-1)//2) avoids /2 and stays integer on both
    engines.  ONE domain-bounded fold; nothing corpus-sized moves.
    Output: (l_returnflag, n, n_pairs, hl2_low)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ._util import read_small_aware

    ds = read_small_aware(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )

    def hist(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        folded = pa.table({"f": t["l_returnflag"], "v": v})
        return pa.TableGroupBy(folded, ["f", "v"]).aggregate([([], "count_all")])

    h = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby(["f", "v"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|flags| x domain)
    )
    rows = []
    for f, sub in h.groupby("f"):
        sub = sub.sort_values("v")
        vs = [int(x) for x in sub["v"]]
        cs = [int(x) for x in sub["c"]]
        n = sum(cs)
        conv: dict[int, int] = {}
        for i, (vi, ci) in enumerate(zip(vs, cs)):
            conv[vi + vi] = conv.get(vi + vi, 0) + ci * (ci - 1) // 2
            for vj, cj in zip(vs[i + 1:], cs[i + 1:]):
                conv[vi + vj] = conv.get(vi + vj, 0) + ci * cj
        P = sum(conv.values())
        rank = (P - 1) // 2  # lower median, 0-based
        cum = 0
        hl2 = 0
        for s in sorted(conv):
            cum += conv[s]
            if cum >= rank + 1:
                hl2 = s
                break
        rows.append({"l_returnflag": f, "n": n, "n_pairs": P, "hl2_low": hl2})
    out = pd.DataFrame(sorted(rows, key=lambda r: r["l_returnflag"]))
    for c in ("n", "n_pairs", "hl2_low"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


HODGES_LEHMANN_QTY_SQL = """
WITH hist AS (
  SELECT l_returnflag AS f, CAST(ROUND(l_quantity) AS BIGINT) AS v,
         CAST(COUNT(*) AS HUGEINT) AS c
  FROM lineitem GROUP BY 1, 2
), conv AS (
  SELECT a.f, a.v + b.v AS s,
         SUM(CASE WHEN a.v < b.v THEN a.c * b.c
                  ELSE a.c * (a.c - 1) // 2 END) AS pc
  FROM hist a JOIN hist b ON a.f = b.f AND a.v <= b.v
  GROUP BY 1, 2
), cum AS (
  SELECT f, s, SUM(pc) OVER (PARTITION BY f ORDER BY s
                             ROWS UNBOUNDED PRECEDING) AS cumpc,
         SUM(pc) OVER (PARTITION BY f) AS total
  FROM conv
), pick AS (
  SELECT f, MIN(s) AS hl2_low FROM cum
  WHERE cumpc >= (total - 1) // 2 + 1 GROUP BY f
), nn AS (
  SELECT f, SUM(c) AS n, SUM(c) * (SUM(c) - 1) // 2 AS n_pairs
  FROM hist GROUP BY f
)
SELECT nn.f AS l_returnflag, CAST(nn.n AS BIGINT) AS n,
       CAST(nn.n_pairs AS BIGINT) AS n_pairs,
       CAST(pick.hl2_low AS BIGINT) AS hl2_low
FROM nn JOIN pick ON pick.f = nn.f ORDER BY l_returnflag
"""


def cms_calibration(sf_dir: str, k: int = 20) -> "object":
    """Count-min calibration audit: for the EXACT top-k tokens, the
    sketch's estimate vs the true count and the collision overestimate —
    the before-you-trust-it measurement for the CMS at production width
    (estimates are always >= exact; the gap profile says whether CM_W
    is sized right for the corpus's head).  Both legs are md5-exact, so
    even the audit is SQL-oracled (the minhash_jaccard_calibration
    pattern applied to the counting sketch).

    Cost: the corpus-scan sketch fold + the Heaps-bounded vocab top-k;
    probes are driver arithmetic.  Output: (token, exact_n, cm_estimate,
    overestimate) ordered (exact_n desc, token)."""
    import pandas as pd

    from .text import vocab_topk

    cm = _cm_sketch(sf_dir)
    top = vocab_topk(sf_dir, k).to_pandas()
    est = [
        min(int(cm.get(_cm_cell(r, t), 0)) for r in range(CM_D))
        for t in top["token"]
    ]
    out = pd.DataFrame(
        {
            "token": top["token"].astype(str),
            "exact_n": top["n"].astype("int64"),
            "cm_estimate": pd.Series(est, dtype="int64"),
        }
    )
    out["overestimate"] = (out["cm_estimate"] - out["exact_n"]).astype("int64")
    return out.reset_index(drop=True)


CMS_CALIBRATION_SQL = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
), cnt AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
), rows AS (
  SELECT CAST(i AS INTEGER) AS i FROM range({CM_D}) t(i)
), cells AS (
  SELECT i,
         i * {CM_W}
         + CAST(concat('0x', substr(md5(CAST(i AS VARCHAR) || ':' || tok), 1, 16))
                AS UBIGINT) % {CM_W} AS cell,
         SUM(c) AS s
  FROM cnt CROSS JOIN rows
  GROUP BY 1, 2
), topk AS (
  SELECT tok, c FROM cnt ORDER BY c DESC, tok LIMIT 20
), pc AS (
  SELECT t.tok, r.i,
         r.i * {CM_W}
         + CAST(concat('0x', substr(md5(CAST(r.i AS VARCHAR) || ':' || t.tok), 1, 16))
                AS UBIGINT) % {CM_W} AS cell
  FROM topk t CROSS JOIN rows r
), est AS (
  SELECT p.tok, MIN(COALESCE(cl.s, 0)) AS e
  FROM pc p LEFT JOIN cells cl ON p.i = cl.i AND p.cell = cl.cell
  GROUP BY p.tok
)
SELECT t.tok AS token, CAST(t.c AS BIGINT) AS exact_n,
       CAST(e.e AS BIGINT) AS cm_estimate,
       CAST(e.e - t.c AS BIGINT) AS overestimate
FROM topk t JOIN est e ON e.tok = t.tok
ORDER BY exact_n DESC, token
"""


# -- sketch calibration audits ---------------------------------------------------
# Every sketch in this engine is md5-deterministic, so its accuracy audit
# is ALSO SQL-oracled (PATTERNS.md block 22): estimate and exact truth run
# side by side and even the error column hash-matches.


def hll_calibration(sf_dir: str) -> "object":
    """HyperLogLog calibration: per event type, the sketch's distinct-user
    estimate vs the exact two-level-groupby truth with the ppm error —
    the audit that justifies replacing COUNT DISTINCT with an O(registers)
    sketch at 100 TB.  Output: (event_type, exact_distinct,
    approx_distinct, err_ppm)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Count
    from ._util import read_small_aware

    h = hll_users_per_type(sf_dir)
    h = h.to_pandas() if hasattr(h, "to_pandas") else h

    ds = read_small_aware(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def dedup_local(t: pa.Table) -> pa.Table:
        return pa.TableGroupBy(
            pa.table({"e": t["event_type"], "u": t["user_id"]}), ["e", "u"]
        ).aggregate([])

    exact = (
        ds.map_batches(dedup_local, batch_format="pyarrow")
        .groupby(["e", "u"])
        .aggregate(Count(alias_name="_c"))
        .groupby("e")
        .aggregate(Count(alias_name="exact_distinct"))
        .to_pandas()
        .rename(columns={"e": "event_type"})
    )
    out = exact.merge(h, on="event_type").sort_values("event_type")
    out["exact_distinct"] = out["exact_distinct"].astype("int64")
    out["approx_distinct"] = out["approx_distinct"].astype("int64")
    out["err_ppm"] = (
        (out["approx_distinct"] - out["exact_distinct"]).abs()
        * 1_000_000
        // out["exact_distinct"]
    ).astype("int64")
    return out.reset_index(drop=True)


HLL_CALIBRATION_SQL = f"""
WITH h AS ({HLL_USERS_SQL}),
ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT h.event_type,
       CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
       CAST(h.approx_distinct AS BIGINT) AS approx_distinct,
       CAST(ABS(h.approx_distinct - ex.exact_distinct) * 1000000
            // ex.exact_distinct AS BIGINT) AS err_ppm
FROM h JOIN ex USING (event_type) ORDER BY event_type
"""


def ddsketch_calibration(sf_dir: str) -> "object":
    """DDSketch calibration at the overlapping grid points (p50, p99):
    the sketch's relative-error GUARANTEE made measurable — est/exact must
    sit within the sketch's gamma band, and the emitted err_ppm is the
    observed relative error.  Composes the two existing passes; output:
    (q_mu, exact_c2, est_c2, err_ppm)."""
    import pandas as pd

    ex = exact_price_quantiles(sf_dir)
    ex = ex.to_pandas() if hasattr(ex, "to_pandas") else ex
    dd = ddsketch_price_quantiles(sf_dir)
    dd = dd.to_pandas() if hasattr(dd, "to_pandas") else dd
    dd = dd.assign(q_mu=dd["q_bp"] * 100)
    out = ex.merge(dd[["q_mu", "est_c2"]], on="q_mu").sort_values("q_mu")
    out = out.rename(columns={"value_c2": "exact_c2"})
    out["err_ppm"] = (
        (out["est_c2"] - out["exact_c2"]).abs() * 1_000_000 // out["exact_c2"]
    ).astype("int64")
    for c in ("q_mu", "exact_c2", "est_c2"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


DDSKETCH_CALIBRATION_SQL = f"""
WITH ex AS ({EXACT_PRICE_QUANTILES_SQL}),
dd AS ({DDSKETCH_PRICE_QUANTILES_SQL})
SELECT CAST(ex.q_mu AS BIGINT) AS q_mu,
       CAST(ex.value_c2 AS BIGINT) AS exact_c2,
       CAST(dd.est_c2 AS BIGINT) AS est_c2,
       CAST(ABS(dd.est_c2 - ex.value_c2) * 1000000 // ex.value_c2
            AS BIGINT) AS err_ppm
FROM ex JOIN dd ON dd.q_bp * 100 = ex.q_mu
ORDER BY q_mu
"""


def bloom_calibration(sf_dir: str) -> "object":
    """Bloom-filter calibration: over the odd-doc_id probe population,
    exact duplicate truth (text md5 equality against the even-doc_id
    build set, one hash-bucket co-location) vs the filter's flags — no
    false negatives by construction, so n_false_pos = n_flagged -
    n_true_dups and the observed FPR is (n_false_pos, n_probes) as a
    cleared fraction.  Output: one row (n_probes, n_true_dups, n_flagged,
    n_false_pos)."""
    import hashlib as _hl

    import pandas as pd

    from ray.data.aggregate import Sum
    from ._util import n_buckets
    import pyarrow.parquet as pq

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows)

    flags = bloom_probe(sf_dir)
    n_flagged = int(flags.aggregate(Sum("maybe_dup", alias_name="n"))["n"])

    def h_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        hs = [
            int(_hl.md5(x.encode()).hexdigest()[:15], 16)
            for x in t.column("text").to_pylist()
        ]
        return pa.table(
            {
                "gb": pa.array([h % nb for h in hs], pa.int32()),
                "h": pa.array(hs, pa.int64()),
                "odd": pa.array((ids % 2 == 1).astype("int8")),
            }
        )

    def dup_fold(g: "pd.DataFrame") -> pa.Table:
        even = set(g.loc[g["odd"] == 0, "h"])
        odd = g[g["odd"] == 1]
        n_probes = len(odd)
        n_dups = int(odd["h"].isin(even).sum())
        return pa.table(
            {
                "n_p": pa.array([n_probes], pa.int64()),
                "n_d": pa.array([n_dups], pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(h_rows, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(dup_fold, batch_format="pandas")
        .to_pandas()  # O(buckets)
    )
    n_probes = int(parts["n_p"].sum())
    n_dups = int(parts["n_d"].sum())
    return pd.DataFrame(
        {
            "n_probes": [n_probes],
            "n_true_dups": [n_dups],
            "n_flagged": [n_flagged],
            "n_false_pos": [n_flagged - n_dups],
        }
    ).astype("int64")


BLOOM_CALIBRATION_SQL = f"""
WITH fl AS ({BLOOM_PROBE_SQL}),
odd AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
ev AS (SELECT DISTINCT text FROM documents WHERE doc_id % 2 = 0),
truth AS (
  SELECT COUNT(*) AS n_probes,
         SUM(CASE WHEN ev.text IS NOT NULL THEN 1 ELSE 0 END) AS n_true_dups
  FROM odd LEFT JOIN ev ON ev.text = odd.text
)
SELECT CAST(t.n_probes AS BIGINT) AS n_probes,
       CAST(t.n_true_dups AS BIGINT) AS n_true_dups,
       CAST((SELECT SUM(maybe_dup) FROM fl) AS BIGINT) AS n_flagged,
       CAST((SELECT SUM(maybe_dup) FROM fl) - t.n_true_dups AS BIGINT)
         AS n_false_pos
FROM truth t
"""


# -- V-optimal histogram construction (DB-internals planning family) ----------

#: base-bin width (cents) and bin count for the v-optimal search space —
#: fixed constants so the binning is corpus-independent; the clamp catches
#: values past the expected domain.
_VOPT_WIDTH = 1_024
_VOPT_BINS = 64


def voptimal_histogram(sf_dir: str) -> "object":
    """V-optimal histogram construction over the event-value distribution
    (the DB-internals planning primitive behind variance-minimizing
    bucket boundaries — Jagadish et al., VLDB 1998): choose 3 cut points
    over 64 fixed 1024-cent base bins (4 buckets) minimizing the CLEARED
    per-segment variance objective sum_seg(n_s * S2_s - S1_s^2) — each
    term is n_s^2 x variance, integer-exact on both engines, so even the
    argmin's tie-break (cost, then ascending cuts) hash-matches.  ONE
    bounded (bin, n, s1, s2) moment fold; the driver scans the
    C(63,3) ~ 40k cut triples over 64-entry prefix arrays (exact Python
    ints; the oracle's cross-join replays it in HUGEINT).  Output: one
    row (cut1, cut2, cut3, cost_mega = cost // 10^6)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ._util import read_small_aware

    ds = read_small_aware(f"{sf_dir}/events.parquet", columns=["value"])

    def fold(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        b = pc.min_element_wise(
            pc.divide(cents, _VOPT_WIDTH),
            pa.scalar(_VOPT_BINS - 1, pa.int64()),
        )
        folded = pa.table(
            {
                "b": b,
                "n": pa.array([1] * len(t), pa.int64()),
                "s1": cents,
                "s2": pc.multiply(cents, cents),
            }
        )
        return pa.TableGroupBy(folded, "b").aggregate(
            [("n", "sum"), ("s1", "sum"), ("s2", "sum")]
        )

    m = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("n_sum", alias_name="n"),
                   Sum("s1_sum", alias_name="s1"),
                   Sum("s2_sum", alias_name="s2"))
        .to_pandas()  # <= _VOPT_BINS rows
    )
    n = [0] * (_VOPT_BINS + 1)
    s1 = [0] * (_VOPT_BINS + 1)
    s2 = [0] * (_VOPT_BINS + 1)
    for r in m.itertuples():
        n[int(r.b) + 1] = int(r.n)
        s1[int(r.b) + 1] = int(r.s1)
        s2[int(r.b) + 1] = int(r.s2)
    for t_ in range(1, _VOPT_BINS + 1):
        n[t_] += n[t_ - 1]
        s1[t_] += s1[t_ - 1]
        s2[t_] += s2[t_ - 1]

    def seg(a: int, b: int) -> int:
        """Cleared variance cost of bins [a, b) from the prefix arrays."""
        nn = n[b] - n[a]
        w1 = s1[b] - s1[a]
        w2 = s2[b] - s2[a]
        return nn * w2 - w1 * w1

    best = None
    for i in range(1, _VOPT_BINS - 2):
        c01 = seg(0, i)
        for j in range(i + 1, _VOPT_BINS - 1):
            c2 = seg(i, j)
            for k in range(j + 1, _VOPT_BINS):
                cost = c01 + c2 + seg(j, k) + seg(k, _VOPT_BINS)
                key = (cost, i, j, k)
                if best is None or key < best:
                    best = key
    cost, i, j, k = best
    return pd.DataFrame(
        {
            "cut1": pd.Series([i], dtype="int64"),
            "cut2": pd.Series([j], dtype="int64"),
            "cut3": pd.Series([k], dtype="int64"),
            "cost_mega": pd.Series([cost // 10**6], dtype="int64"),
        }
    )


VOPTIMAL_HISTOGRAM_SQL = f"""
WITH x AS (
  SELECT LEAST(CAST(ROUND(value * 100) AS BIGINT) // {_VOPT_WIDTH},
               {_VOPT_BINS - 1}) AS b,
         CAST(ROUND(value * 100) AS HUGEINT) AS c
  FROM events
), binm AS (
  SELECT b, COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2 FROM x GROUP BY b
), bins AS (
  SELECT CAST(range AS BIGINT) AS b FROM range({_VOPT_BINS})
), pre AS (
  SELECT bins.b,
         COALESCE(SUM(binm.n) FILTER (WHERE binm.b < bins.b), 0) AS pn,
         COALESCE(SUM(binm.s1) FILTER (WHERE binm.b < bins.b), 0) AS p1,
         COALESCE(SUM(binm.s2) FILTER (WHERE binm.b < bins.b), 0) AS p2
  FROM bins LEFT JOIN binm ON TRUE GROUP BY bins.b
  UNION ALL
  SELECT {_VOPT_BINS},
         COALESCE(SUM(n), 0), COALESCE(SUM(s1), 0), COALESCE(SUM(s2), 0)
  FROM binm
), cuts AS (
  SELECT i.b AS i, j.b AS j, k.b AS k
  FROM bins i JOIN bins j ON j.b > i.b JOIN bins k ON k.b > j.b
  WHERE i.b >= 1
), cost AS (
  SELECT c.i, c.j, c.k,
         ((pi.pn - p0.pn) * (pi.p2 - p0.p2) - (pi.p1 - p0.p1) * (pi.p1 - p0.p1))
       + ((pj.pn - pi.pn) * (pj.p2 - pi.p2) - (pj.p1 - pi.p1) * (pj.p1 - pi.p1))
       + ((pk.pn - pj.pn) * (pk.p2 - pj.p2) - (pk.p1 - pj.p1) * (pk.p1 - pj.p1))
       + ((pe.pn - pk.pn) * (pe.p2 - pk.p2) - (pe.p1 - pk.p1) * (pe.p1 - pk.p1))
         AS cost
  FROM cuts c
  JOIN pre p0 ON p0.b = 0
  JOIN pre pi ON pi.b = c.i
  JOIN pre pj ON pj.b = c.j
  JOIN pre pk ON pk.b = c.k
  JOIN pre pe ON pe.b = {_VOPT_BINS}
)
SELECT CAST(i AS BIGINT) AS cut1, CAST(j AS BIGINT) AS cut2,
       CAST(k AS BIGINT) AS cut3,
       CAST(cost // 1000000 AS BIGINT) AS cost_mega
FROM cost ORDER BY cost, i, j, k LIMIT 1
"""
