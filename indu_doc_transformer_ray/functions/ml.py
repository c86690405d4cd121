"""Distributed model-evaluation / model-training operators.

The reference engine has no ML surface (SURVEY.md §2.8) — this is the
engine-addition family a training-data pipeline needs once the corpus
feeds an actual model: exact ranking-quality evaluation (ROC AUC) and a
from-scratch distributed classifier fit (logistic regression by IRLS),
both expressed as bounded-state folds over streaming Dataset passes.

Scale notes
-----------
- ``auc_by_type`` is the [[global-price-rank]] histogram-offset shape:
  ONE value-bucket co-location computes in-bucket pair contributions,
  the driver holds only ``O(value_domain / 4096 × n_types)`` count rows
  and folds the cross-bucket term with exact Python-int products (the
  pair count ``P·N`` overflows int64 past ~3e9 rows — the same reason
  ``value_trend_per_type`` does its final products in object dtype).
- ``logreg_train`` never ships rows anywhere: each IRLS iteration is one
  streaming pass emitting per-bucket sufficient statistics
  ``(X^T(y-p), X^T W X)`` — 65 + 2145 float64s per bucket — tree-combined
  through a 256-way second-level fold so the driver reads ≤256 rows no
  matter the corpus size.  Determinism (the repo-wide hash-equality
  contract) holds because bucket membership is a pure function of
  ``vec_id``, in-bucket rows are sorted before the matmul, and every
  combine level sums in sorted-key order — no float sum ever depends on
  Ray's scheduling order.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from ._util import n_buckets, read_small_aware

# -- exact ROC AUC per class (one-vs-rest), Mann-Whitney form ----------------

#: coarse value bucket width in cents: power of two so the arithmetic
#: right-shift floors identically for signed values (round-3 ADVICE on the
#: trunc-vs-floor histogram family).
_AUC_SHIFT = 12


def auc_by_type(sf_dir: str) -> "pa.Table":
    """Exact one-vs-rest ROC AUC of ``value`` as a score for each
    ``event_type``: for class t, AUC = P(value_pos > value_neg) + ½·P(tie)
    over all (positive, negative) pairs — the Mann-Whitney U statistic.
    Ties use the standard ½ credit, kept integer-exact by accumulating
    ``auc_num2 = 2·U`` so ``auc_bp = 10000·num2 // (2·P·N)`` floors the
    same way in the Ray path and the DuckDB window-function oracle.

    Distributed shape: values floor to integer cents, bucket by an
    arithmetic right-shift (floor-consistent for signed values); ONE
    ``groupby(bucket)`` co-location pivots each bucket to a
    (distinct value × type) count frame and folds the in-bucket pair term
    vectorized; the driver sees only (bucket × type) partial rows —
    ``O(domain/4096 × 5)`` at any corpus size — and adds the cross-bucket
    term ``2·c_pos(b,t)·neg_before(b,t)`` from a prefix scan over bucket
    totals, in exact Python ints (``P·N ≈ n²/4`` overflows int64 past
    ~6e9 rows; the int64 guard on the emitted partials raises loudly
    rather than wrapping if a single 40.96-unit value band ever holds
    >~2e9 rows)."""
    import pandas as pd

    ds = read_small_aware(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def project(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.floor(pc.multiply(t["value"], 100.0)), pa.int64())
        return pa.table(
            {
                "vb": pc.shift_right(v, _AUC_SHIFT),
                "v": v,
                "event_type": t["event_type"],
            }
        )

    def bucket_partials(g: "pd.DataFrame") -> "pd.DataFrame":
        vb = int(g["vb"].iloc[0])
        piv = (
            g.groupby(["v", "event_type"], sort=True)
            .size()
            .unstack(fill_value=0)
            .sort_index()
        )
        total = piv.sum(axis=1)
        rows = []
        # event_type is a tiny closed domain (≤ a handful of classes), so a
        # per-class loop over VECTORIZED column ops is not a row loop.
        for t_name in piv.columns:
            pos = piv[t_name].to_numpy()
            neg = total.to_numpy() - pos
            negs_less = neg.cumsum() - neg  # exclusive prefix within bucket
            num2 = int(
                (
                    pos.astype(object) * (2 * negs_less.astype(object) + neg.astype(object))
                ).sum()
            )
            if num2 >= 1 << 62:  # pragma: no cover - >~2e9 rows in one band
                raise OverflowError("auc_by_type: in-bucket pair term exceeds int64")
            rows.append(
                {"vb": vb, "event_type": t_name, "num2_in": num2, "c_pos": int(pos.sum())}
            )
        return pd.DataFrame(rows)

    parts = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(bucket_partials, batch_format="pandas")
    )
    # driver fold: O(buckets × types) rows, exact Python-int products
    pdf = parts.to_pandas().sort_values(["vb", "event_type"])
    piv_pos = pdf.pivot(index="vb", columns="event_type", values="c_pos").fillna(0).astype("int64").sort_index()
    piv_num = pdf.pivot(index="vb", columns="event_type", values="num2_in").fillna(0).astype("int64").sort_index()
    bucket_tot = piv_pos.sum(axis=1)
    out = []
    grand_total = int(bucket_tot.sum())
    for t_name in sorted(piv_pos.columns):
        pos = piv_pos[t_name].to_numpy().astype(object)
        neg = bucket_tot.to_numpy().astype(object) - pos
        neg_before = neg.cumsum() - neg
        num2 = int(piv_num[t_name].astype(object).sum() + (2 * pos * neg_before).sum())
        p = int(pos.sum())
        n = grand_total - p
        out.append(
            {
                "event_type": t_name,
                "n_pos": p,
                "n_neg": n,
                "auc_num2": num2,
                "auc_bp": (10_000 * num2) // (2 * p * n) if p and n else 0,
            }
        )
    tbl = pa.Table.from_pylist(out)
    return tbl.cast(
        pa.schema(
            [
                ("event_type", pa.string()),
                ("n_pos", pa.int64()),
                ("n_neg", pa.int64()),
                ("auc_num2", pa.int64()),
                ("auc_bp", pa.int64()),
            ]
        )
    )


AUC_BY_TYPE_SQL = """
WITH s AS (
  SELECT CAST(FLOOR(value * 100) AS BIGINT) AS v, event_type FROM events
),
agg AS (
  SELECT v, event_type, COUNT(*) AS c FROM s GROUP BY 1, 2
),
allv AS (
  SELECT v, SUM(c) AS ca FROM agg GROUP BY 1
),
pos AS (
  SELECT t.event_type, a.v, COALESCE(g.c, 0) AS cp, a.ca
  FROM (SELECT DISTINCT event_type FROM s) t
  CROSS JOIN allv a
  LEFT JOIN agg g ON g.v = a.v AND g.event_type = t.event_type
),
sc AS (
  SELECT event_type, v, cp, ca - cp AS cn,
         COALESCE(SUM(ca - cp) OVER (
           PARTITION BY event_type ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nl
  FROM pos
),
fin AS (
  SELECT event_type, SUM(cp) AS p, SUM(cp * (2 * nl + cn)) AS num2
  FROM sc GROUP BY 1
),
tot AS (SELECT COUNT(*) AS n_all FROM s)
SELECT f.event_type,
       CAST(f.p AS BIGINT)                          AS n_pos,
       CAST(t.n_all - f.p AS BIGINT)                AS n_neg,
       CAST(f.num2 AS BIGINT)                       AS auc_num2,
       CAST((10000 * f.num2) // (2 * f.p * (t.n_all - f.p)) AS BIGINT) AS auc_bp
FROM fin f, tot t
ORDER BY f.event_type
"""


# -- distributed logistic regression (IRLS over sufficient statistics) -------

_LR_ITERS = 6
_LR_RIDGE = 1e-3  # Tikhonov term added to X^T W X: keeps Newton steps stable
_LR_SUPER = 256   # second-level combine fan-in (driver reads ≤ this many rows)


def _emb_matrix(t: "pa.Table", col: str = "embedding"):
    """(n, dim) float64 matrix from an Arrow list column — flat-values
    reshape (one copy of the contiguous child buffer), never a per-row
    ``to_pylist`` walk."""
    import numpy as np

    arr = t.column(col).combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1)


#: session-scoped coefficient memo so logreg_train and calibration_bins
#: share ONE 6-pass fit when they run in the same Ray session (the IVF
#: k-NN graph memo pattern, similarity.py:474).
_LR_MEMO: dict[tuple, "object"] = {}


def _logreg_fit_memo(sf_dir: str, iters: int = _LR_ITERS):
    from ._util import session_token

    key = (session_token(), sf_dir, iters)
    if key not in _LR_MEMO:
        _LR_MEMO.clear()  # one live session at a time; drop dead-session keys
        _LR_MEMO[key] = _logreg_fit(sf_dir, iters)
    return _LR_MEMO[key]


def _logreg_fit(sf_dir: str, iters: int = _LR_ITERS):
    """Fit ``P(label is odd | embedding)`` by IRLS (Newton) and return the
    (dim+1,) float64 coefficient vector (intercept first).

    Each iteration is one streaming pass over ``embeddings``: per
    vec_id-derived bucket, rows sort by ``vec_id`` and fold to the exact
    Newton sufficient statistics ``g = X^T (y - p)`` and
    ``H = X^T diag(p(1-p)) X`` (upper triangle packed); a 256-way
    second-level ``groupby`` sums buckets in sorted order so the driver
    fold is ≤256 rows and every float sum has a fixed order — the result
    is bit-deterministic under any scheduling/partitioning (asserted by
    tests/test_ml.py against a single-process reference)."""
    import numpy as np
    import pyarrow.parquet as pq

    path = f"{sf_dir}/embeddings.parquet"
    meta = pq.read_metadata(path)
    buckets = n_buckets(meta.num_rows, rows_per_bucket=16_384)
    dim = None
    beta = None

    for _ in range(iters):
        beta_ref = None if beta is None else beta.copy()

        def project(t: pa.Table) -> pa.Table:
            vid = pc.cast(t["vec_id"], pa.int64())
            return pa.table(
                {
                    "vb": pc.bit_wise_and(vid, buckets - 1),
                    "vec_id": vid,
                    "embedding": t["embedding"],
                    "y": pc.cast(pc.bit_wise_and(pc.cast(t["label"], pa.int64()), 1), pa.float64()),
                }
            )

        def bucket_stats(g):
            import pandas as pd

            g = g.sort_values("vec_id")
            X = np.stack(g["embedding"].to_numpy())
            X = np.hstack([np.ones((len(X), 1)), X]).astype(np.float64)
            y = g["y"].to_numpy(dtype=np.float64)
            d = X.shape[1]
            b = np.zeros(d) if beta_ref is None else beta_ref
            z = np.clip(X @ b, -30.0, 30.0)
            p = 1.0 / (1.0 + np.exp(-z))
            grad = X.T @ (y - p)
            H = (X * (p * (1.0 - p))[:, None]).T @ X
            iu = np.triu_indices(d)
            vb = int(g["vb"].iloc[0])
            return pd.DataFrame(
                {
                    "sb": [vb % _LR_SUPER],
                    "vb": [vb],
                    "g": [grad.tolist()],
                    "h": [H[iu].tolist()],
                }
            )

        def super_sum(g):
            import pandas as pd

            g = g.sort_values("vb")
            return pd.DataFrame(
                {
                    "sb": [int(g["sb"].iloc[0])],
                    "vb": [int(g["vb"].iloc[0])],
                    "g": [np.add.reduce(np.stack(g["g"].to_numpy()), axis=0).tolist()],
                    "h": [np.add.reduce(np.stack(g["h"].to_numpy()), axis=0).tolist()],
                }
            )

        parts = (
            read_small_aware(path, columns=["vec_id", "embedding", "label"])
            .map_batches(project, batch_format="pyarrow")
            .groupby("vb")
            .map_groups(bucket_stats, batch_format="pandas")
            .groupby("sb")
            .map_groups(super_sum, batch_format="pandas")
        )
        pdf = parts.to_pandas().sort_values("sb")  # ≤ _LR_SUPER rows
        grad = np.add.reduce(np.stack(pdf["g"].to_numpy()), axis=0)
        hsum = np.add.reduce(np.stack(pdf["h"].to_numpy()), axis=0)
        dim = grad.shape[0]
        iu = np.triu_indices(dim)
        H = np.zeros((dim, dim))
        H[iu] = hsum
        H = H + H.T - np.diag(np.diag(H))
        H[np.diag_indices(dim)] += _LR_RIDGE
        step = np.linalg.solve(H, grad)
        beta = (np.zeros(dim) if beta is None else beta) + step
    return beta


def logreg_train(sf_dir: str) -> "pa.Table":
    """Train the odd-label logistic classifier with :func:`_logreg_fit`,
    then score the corpus in one broadcast pass and report the per-class
    confusion counts — integer outputs so the result is hash-stable even
    though the coefficients carry float rounding.  Output:
    (y, n, n_correct, accuracy_bp) for y ∈ {0, 1}."""
    import numpy as np

    beta = _logreg_fit_memo(sf_dir)

    def score(t: pa.Table) -> pa.Table:
        X = _emb_matrix(t)
        X = np.hstack([np.ones((len(X), 1)), X])
        y = t.column("label").combine_chunks().to_numpy(zero_copy_only=False) & 1
        y = y.astype(np.int64)
        pred = (X @ beta > 0.0).astype(np.int64)
        out = {"y": [], "n": [], "n_correct": []}
        for cls in (0, 1):
            m = y == cls
            out["y"].append(cls)
            out["n"].append(int(m.sum()))
            out["n_correct"].append(int((pred[m] == cls).sum()))
        return pa.table(
            {k: pa.array(v, type=pa.int64()) for k, v in out.items()}
        )

    from ray.data.aggregate import Sum

    folded = (
        read_small_aware(f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"])
        .map_batches(score, batch_format="pyarrow")
        .groupby("y")
        .aggregate(Sum("n", alias_name="n"), Sum("n_correct", alias_name="n_correct"))
    )
    pdf = folded.to_pandas().sort_values("y")  # 2 rows
    pdf["accuracy_bp"] = (10_000 * pdf["n_correct"]) // pdf["n"]
    return pa.Table.from_pandas(pdf.reset_index(drop=True)).cast(
        pa.schema(
            [
                ("y", pa.int64()),
                ("n", pa.int64()),
                ("n_correct", pa.int64()),
                ("accuracy_bp", pa.int64()),
            ]
        )
    )


def calibration_bins(sf_dir: str) -> "pa.Table":
    """Reliability diagram for the odd-label classifier: predicted
    probabilities fall into 10 equal-width bins and each bin reports how
    often the positive class actually occurred — the calibration check a
    quality-scoring model needs before its scores gate corpus admission.
    Outputs stay integer so the result is hash-stable despite the float
    fit: per-row confidence floors to 1e-6 units BEFORE the fold, so the
    sum is order-independent.  Output: (bin, n, n_pos, pos_rate_bp,
    avg_conf_bp) for the non-empty bins, ascending.

    Distributed shape: the (memoized) :func:`_logreg_fit` coefficients are
    closure-broadcast; one streaming pass folds per-batch (bin, n, n_pos,
    sum_conf_e6) partials; the final ``groupby`` touches ≤10 groups."""
    import numpy as np

    beta = _logreg_fit_memo(sf_dir)

    def partials(t: pa.Table) -> pa.Table:
        X = _emb_matrix(t)
        X = np.hstack([np.ones((len(X), 1)), X])
        y = t.column("label").combine_chunks().to_numpy(zero_copy_only=False) & 1
        z = np.clip(X @ beta, -30.0, 30.0)
        p = 1.0 / (1.0 + np.exp(-z))
        b = np.minimum((p * 10).astype(np.int64), 9)
        conf_e6 = np.floor(p * 1_000_000).astype(np.int64)
        out = {"bin": [], "n": [], "n_pos": [], "sum_conf_e6": []}
        for k in np.unique(b):  # ≤10 iterations — bin domain, not rows
            m = b == k
            out["bin"].append(int(k))
            out["n"].append(int(m.sum()))
            out["n_pos"].append(int(y[m].sum()))
            out["sum_conf_e6"].append(int(conf_e6[m].sum()))
        return pa.table({k: pa.array(v, type=pa.int64()) for k, v in out.items()})

    from ray.data.aggregate import Sum

    folded = (
        read_small_aware(f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_pos", alias_name="n_pos"),
            Sum("sum_conf_e6", alias_name="sum_conf_e6"),
        )
    )
    pdf = folded.to_pandas().sort_values("bin").reset_index(drop=True)  # ≤10 rows
    pdf["pos_rate_bp"] = (10_000 * pdf["n_pos"]) // pdf["n"]
    pdf["avg_conf_bp"] = pdf["sum_conf_e6"] // (100 * pdf["n"])
    pdf = pdf.drop(columns=["sum_conf_e6"])
    return pa.Table.from_pandas(pdf).cast(
        pa.schema(
            [
                ("bin", pa.int64()),
                ("n", pa.int64()),
                ("n_pos", pa.int64()),
                ("pos_rate_bp", pa.int64()),
                ("avg_conf_bp", pa.int64()),
            ]
        )
    )


# -- Bradley-Terry ranking from pairwise outcomes (MM algorithm) --------------

_BT_ITERS = 15
#: pair tables at or under this row count run the MM loop on the driver in
#: one numpy pass per iteration (the pagerank_knn driver-escape pattern);
#: above it the static pair table is pinned ONCE in sharded num_cpus=0
#: actors and each iteration is k batched RPCs — the table never crosses
#: an exchange again.  Equality between the two paths is pytest-gated.
_BT_DRIVER_PAIR_BUDGET = 2_000_000


def _bt_pair_table(sf_dir: str) -> Dataset:
    """(lo, hi, n, w_lo) supplier-pair outcome table from lineitem: within
    each part, supplier A beats supplier B when A's cheapest observed unit
    price (micro-units, floor) for that part is strictly lower — ties
    contribute no game.  Two bounded co-locations: a part-bucket kernel
    reduces to per-(part,supplier) minima and enumerates that part's
    supplier pairs (fan-out Σ s_p² over suppliers-per-part, never raw
    lineitems²), then a pair-bucket kernel folds duplicate pairs across
    part buckets so the output holds one row per distinct supplier pair."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)

    def project(t: pa.Table) -> pa.Table:
        part = pc.cast(t["l_partkey"], pa.int64())
        u = pc.cast(
            pc.floor(
                pc.multiply(pc.divide(t["l_extendedprice"], t["l_quantity"]), 1e6)
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "pb": pc.cast(pc.bit_wise_and(part, nb - 1), pa.int32()),
                "p": part,
                "s": pc.cast(t["l_suppkey"], pa.int64()),
                "u": u,
            }
        )

    def part_pairs(g: "pd.DataFrame") -> "pd.DataFrame":
        best = g.groupby(["p", "s"], sort=True)["u"].min().reset_index()
        m = best.merge(best, on="p", suffixes=("_a", "_b"))
        m = m[m["s_a"] < m["s_b"]]
        m = m[m["u_a"] != m["u_b"]]  # ties: no game
        if not len(m):
            return pd.DataFrame(
                {"lo": pd.Series([], dtype="int64"),
                 "hi": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64"),
                 "w_lo": pd.Series([], dtype="int64")}
            )
        m["w"] = (m["u_a"] < m["u_b"]).astype("int64")
        out = (
            m.groupby(["s_a", "s_b"], sort=True)
            .agg(n=("w", "size"), w_lo=("w", "sum"))
            .reset_index()
            .rename(columns={"s_a": "lo", "s_b": "hi"})
        )
        return out.astype({"lo": "int64", "hi": "int64", "n": "int64", "w_lo": "int64"})

    def key_pair(t: pa.Table) -> pa.Table:
        qb = pc.bit_wise_and(
            pc.add(pc.multiply(t["lo"], 1_000_003), t["hi"]), nb - 1
        )
        return t.append_column("qb", pc.cast(qb, pa.int32()))

    def fold_pairs(g: "pd.DataFrame") -> "pd.DataFrame":
        out = (
            g.groupby(["lo", "hi"], sort=True)[["n", "w_lo"]].sum().reset_index()
        )
        return out.astype({"lo": "int64", "hi": "int64", "n": "int64", "w_lo": "int64"})

    return (
        read_small_aware(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
        )
        .map_batches(project, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(part_pairs, batch_format="pandas")
        .map_batches(key_pair, batch_format="pyarrow")
        .groupby("qb")
        .map_groups(fold_pairs, batch_format="pandas")
    )


def _bt_mm(lo, hi, n, w_lo, n_sup: int, iters: int):
    """Regularized Bradley-Terry MM updates (Hunter 2004) over dense
    supplier-indexed arrays: each supplier also plays one virtual half-win
    / half-loss game against a fixed γ=1 dummy, which keeps never-winners
    finite and the solution unique without a normalization constraint."""
    import numpy as np

    gamma = np.ones(n_sup, dtype=np.float64)
    wins = np.zeros(n_sup, dtype=np.float64)
    np.add.at(wins, lo, w_lo.astype(np.float64))
    np.add.at(wins, hi, (n - w_lo).astype(np.float64))
    for _ in range(iters):
        denom = np.zeros(n_sup, dtype=np.float64)
        inv = n.astype(np.float64) / (gamma[lo] + gamma[hi])
        np.add.at(denom, lo, inv)
        np.add.at(denom, hi, inv)
        gamma = (wins + 0.5) / (denom + 1.0 / (gamma + 1.0))
    return gamma, wins


def bt_supplier_strengths(
    sf_dir: str, topk: int = 20, driver_pair_budget: int = _BT_DRIVER_PAIR_BUDGET
) -> "pa.Table":
    """Bradley-Terry supplier strength from pairwise cheaper-for-the-
    same-part outcomes — learning-to-rank from comparisons, the preference-
    aggregation shape an RLHF data pipeline runs over annotator votes.
    Output: top-``topk`` suppliers by strength, (s_suppkey, games, wins,
    strength_e6) with the strength floored to 1e-6 units; integer columns
    and a fully order-fixed float path keep the result hash-stable.

    Distributed shape: the pair table comes from :func:`_bt_pair_table`
    (two bounded co-locations); suppliers are the DIMENSION side (the
    broadcast-bound assumption every dim lookup in relational.py documents:
    a dense supplier-indexed vector must fit one worker — ~8 MB per 10⁶
    suppliers).  The MM loop never re-shuffles the pair table: at or under
    ``driver_pair_budget`` rows it runs on the driver (one vectorized
    numpy pass per iteration); above it the sorted pair shards pin in
    ``num_cpus=0`` actors and each iteration is one batched RPC per shard,
    with the driver summing shard partials in shard order — float folds
    deterministic at every level (pytest forces both paths and asserts
    exact equality).  SQL-oracled since round 5: the MM loop is
    +/*/÷-only, so ``BT_SUPPLIER_STRENGTHS_SQL`` replays the driver path
    bit-exactly via ordered ``list_reduce`` folds (see
    :func:`_bt_oracle_sql`)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    import ray

    pairs = _bt_pair_table(sf_dir).materialize()
    n_pairs = pairs.count()
    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    n_sup = int(pc.max(sup["s_suppkey"]).as_py()) + 1

    if n_pairs <= driver_pair_budget:
        pdf = pairs.to_pandas().sort_values(["lo", "hi"])
        lo = pdf["lo"].to_numpy(np.int64)
        hi = pdf["hi"].to_numpy(np.int64)
        nn = pdf["n"].to_numpy(np.int64)
        wl = pdf["w_lo"].to_numpy(np.int64)
        gamma, wins = _bt_mm(lo, hi, nn, wl, n_sup, _BT_ITERS)
        games = np.zeros(n_sup, dtype=np.int64)
        np.add.at(games, lo, nn)
        np.add.at(games, hi, nn)
    else:  # pragma: no branch - exercised via driver_pair_budget=0 in tests
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        n_shards = max(2, min(16, ncpu // 2))

        @ray.remote(num_cpus=0)
        class PairShard:
            """Owns the pair rows with (lo*1000003+hi) % n_shards == id,
            sorted by (lo, hi) at seal — num_cpus=0: arithmetic only."""

            def __init__(self):
                self._parts = []
                self._lo = self._hi = self._n = self._w = None

            def add(self, lo, hi, n, w):
                self._parts.append((lo, hi, n, w))
                return len(lo)

            def seal(self):
                import numpy as np

                if self._parts:
                    lo = np.concatenate([p[0] for p in self._parts])
                    hi = np.concatenate([p[1] for p in self._parts])
                    n = np.concatenate([p[2] for p in self._parts])
                    w = np.concatenate([p[3] for p in self._parts])
                else:
                    lo = hi = n = w = np.empty(0, dtype=np.int64)
                order = np.lexsort((hi, lo))
                self._lo, self._hi = lo[order], hi[order]
                self._n, self._w = n[order], w[order]
                self._parts = None
                return len(self._lo)

            def wins_games(self, n_sup):
                import numpy as np

                wins = np.zeros(n_sup, dtype=np.float64)
                games = np.zeros(n_sup, dtype=np.int64)
                np.add.at(wins, self._lo, self._w.astype(np.float64))
                np.add.at(wins, self._hi, (self._n - self._w).astype(np.float64))
                np.add.at(games, self._lo, self._n)
                np.add.at(games, self._hi, self._n)
                return wins, games

            def denom(self, gamma):
                import numpy as np

                d = np.zeros(len(gamma), dtype=np.float64)
                inv = self._n.astype(np.float64) / (
                    gamma[self._lo] + gamma[self._hi]
                )
                np.add.at(d, self._lo, inv)
                np.add.at(d, self._hi, inv)
                return d

        shards = [PairShard.remote() for _ in range(n_shards)]

        def push(t: "pd.DataFrame") -> "pd.DataFrame":
            lo = t["lo"].to_numpy(np.int64)
            sh = (lo * 1_000_003 + t["hi"].to_numpy(np.int64)) % n_shards
            ray.get(
                [
                    shards[s].add.remote(
                        lo[sh == s],
                        t["hi"].to_numpy(np.int64)[sh == s],
                        t["n"].to_numpy(np.int64)[sh == s],
                        t["w_lo"].to_numpy(np.int64)[sh == s],
                    )
                    for s in np.unique(sh)
                ]
            )
            return pd.DataFrame({"n": pd.Series([len(t)], dtype="int64")})

        pairs.map_batches(push, batch_format="pandas").materialize()
        ray.get([s.seal.remote() for s in shards])
        wg = ray.get([s.wins_games.remote(n_sup) for s in shards])
        wins = np.add.reduce([w for w, _ in wg])  # shard order: deterministic
        games = np.add.reduce([g for _, g in wg])
        gamma = np.ones(n_sup, dtype=np.float64)
        for _ in range(_BT_ITERS):
            ds_ = ray.get([s.denom.remote(gamma) for s in shards])
            denom = np.add.reduce(ds_)
            gamma = (wins + 0.5) / (denom + 1.0 / (gamma + 1.0))

    played = games > 0
    idx = np.flatnonzero(played)
    strength_e6 = np.floor(gamma[idx] * 1e6).astype(np.int64)
    out = pd.DataFrame(
        {
            "s_suppkey": idx.astype(np.int64),
            "games": games[idx],
            "wins": wins[idx].astype(np.int64),
            "strength_e6": strength_e6,
        }
    ).sort_values(["strength_e6", "s_suppkey"], ascending=[False, True]).head(topk)
    return pa.Table.from_pandas(out.reset_index(drop=True)).cast(
        pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("games", pa.int64()),
                ("wins", pa.int64()),
                ("strength_e6", pa.int64()),
            ]
        )
    )


def _bt_oracle_sql(iters: int = _BT_ITERS, topk: int = 20) -> str:
    """Round-5 driver oracle for ``bt_supplier_strengths``: the MM loop
    uses ONLY +, *, / on doubles (no libm transcendentals), so DuckDB can
    replay it BIT-EXACTLY when the additions fold in the engine's order.
    ``np.add.at(denom, lo, inv)`` then ``(hi, inv)`` over the
    (lo, hi)-sorted pair array == per supplier a sequential left fold over
    (side, lo, hi)-ordered contributions — spelled
    ``list_reduce(list(inv ORDER BY side, lo, hi), (a,b) -> a+b)``.
    wins/games are integer-valued (exact under any order); the
    ``iters`` MM rounds unroll as a CTE chain (the Lloyd-unroll pattern).
    Non-players never enter any player's denominator, so the oracle only
    carries players."""
    head = """
WITH best AS MATERIALIZED (
  SELECT l_partkey AS p, l_suppkey AS s,
         MIN(CAST(floor(l_extendedprice / l_quantity * 1e6) AS BIGINT)) AS u
  FROM lineitem GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT a.s AS lo, b.s AS hi,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a.u < b.u THEN 1 ELSE 0 END) AS BIGINT) AS w_lo
  FROM best a JOIN best b ON a.p = b.p AND a.s < b.s
  WHERE a.u != b.u
  GROUP BY 1, 2
),
stats AS MATERIALIZED (
  SELECT s, CAST(SUM(w) AS DOUBLE) AS wins, CAST(SUM(n) AS BIGINT) AS games
  FROM (
    SELECT lo AS s, w_lo AS w, n FROM pairs
    UNION ALL SELECT hi, n - w_lo, n FROM pairs
  ) GROUP BY s
),
g0 AS (SELECT s, 1.0 AS g FROM stats)
"""
    step = """
, p{k} AS MATERIALIZED (
  SELECT p.lo, p.hi, CAST(p.n AS DOUBLE) / (gl.g + gh.g) AS inv
  FROM pairs p JOIN g{k} gl ON gl.s = p.lo JOIN g{k} gh ON gh.s = p.hi
),
d{k} AS MATERIALIZED (
  SELECT s, list_reduce(list(inv ORDER BY side, lo, hi), (a, b) -> a + b) AS d
  FROM (
    SELECT lo AS s, 0 AS side, lo, hi, inv FROM p{k}
    UNION ALL SELECT hi, 1, lo, hi, inv FROM p{k}
  ) GROUP BY s
),
g{k1} AS MATERIALIZED (
  SELECT g.s, (st.wins + 0.5) / (d.d + 1.0 / (g.g + 1.0)) AS g
  FROM g{k} g JOIN d{k} d ON d.s = g.s JOIN stats st ON st.s = g.s
)
"""
    tail = f"""
SELECT st.s AS s_suppkey, st.games, CAST(st.wins AS BIGINT) AS wins,
       CAST(floor(g.g * 1e6) AS BIGINT) AS strength_e6
FROM g{iters} g JOIN stats st ON st.s = g.s
ORDER BY strength_e6 DESC, s_suppkey LIMIT {topk}
"""
    return (
        head
        + "".join(step.format(k=k, k1=k + 1) for k in range(iters))
        + tail
    )


BT_SUPPLIER_STRENGTHS_SQL = _bt_oracle_sql()


# -- ALS matrix factorization (implicit customer x part ratings) --------------

_ALS_K = 8           # latent rank
_ALS_ITERS = 4       # alternating rounds
_ALS_LAM = 0.1       # L2 regularization
#: FIXED shard count (not CPU-derived): the cross-shard float reduction
#: order is part of the numeric result, so the shard layout must be a pure
#: function of the DATA for the bit-equality contract to hold on any host.
_ALS_SHARDS = 8
#: at or under this many rating rows the fit runs on the driver — same
#: virtual-shard math, zero actors (tests force the actor path with 0)
_ALS_DRIVER_BUDGET = 2_000_000


def _als_ratings(sf_dir: str) -> Dataset:
    """Implicit (custkey, partkey, r) ratings: r = total l_quantity the
    customer ever ordered of the part.  Two bounded co-locations, no
    corpus-sized groupby key: an orderkey-bucket kernel attaches o_custkey
    to lineitems (both sides of the order join land in the bucket by
    construction) and pre-sums within the bucket; a custkey-bucket kernel
    completes the (c, p) sums (every rating partial for a customer lands
    in that customer's bucket).  Output columns: (cb, c, p, r)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    OB = n_buckets(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)
    CB = n_buckets(
        pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows,
        rows_per_bucket=4_096,
    )

    def li_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["l_orderkey"], pa.int64())
        return pa.table(
            {
                "ob": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "o": ok,
                "c": pa.array(np.full(t.num_rows, -1, np.int64)),
                "p": pc.cast(t["l_partkey"], pa.int64()),
                "q": pc.cast(t["l_quantity"], pa.int64()),
            }
        )

    def o_rows(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["o_orderkey"], pa.int64())
        return pa.table(
            {
                "ob": pc.cast(pc.bit_wise_and(ok, OB - 1), pa.int32()),
                "o": ok,
                "c": pc.cast(t["o_custkey"], pa.int64()),
                "p": pa.array(np.full(t.num_rows, -1, np.int64)),
                "q": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        )

    def attach(g: "pd.DataFrame") -> "pd.DataFrame":
        omap = g[g["p"] == -1].set_index("o")["c"]
        li = g[g["p"] != -1]
        out = (
            pd.DataFrame(
                {
                    "c": li["o"].map(omap).astype("int64"),
                    "p": li["p"],
                    "q": li["q"],
                }
            )
            .groupby(["c", "p"], sort=True)["q"]
            .sum()
            .reset_index(name="r")
        )
        out["cb"] = (out["c"] % CB).astype("int32")
        return out.astype({"c": "int64", "p": "int64", "r": "int64"})

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        out = g.groupby(["c", "p"], sort=True)["r"].sum().reset_index()
        out["cb"] = (out["c"] % CB).astype("int32")
        return out.astype({"c": "int64", "p": "int64", "r": "int64"})

    li = read_small_aware(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    ).map_batches(li_rows, batch_format="pyarrow")
    orders = read_small_aware(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_rows, batch_format="pyarrow")
    return (
        li.union(orders)
        .groupby("ob")
        .map_groups(attach, batch_format="pandas")
        .groupby("cb")
        .map_groups(fold, batch_format="pandas")
    )


def _als_init_y(n_items: int, k: int = _ALS_K):
    """Deterministic pseudo-random item-factor init: a per-(item, j) LCG
    hash mapped to [-0.05, 0.05) — no RNG state, identical on every host."""
    import numpy as np

    i = np.arange(n_items, dtype=np.int64)[:, None]
    j = np.arange(k, dtype=np.int64)[None, :]
    h = (i * 2_654_435_761 + j * 40_503 + 12_345) % (1 << 31)
    return (h.astype(np.float64) / (1 << 31) - 0.5) * 0.1


def _als_shard_step(c, p, r, Y, lam: float = _ALS_LAM):
    """One shard's half-iteration: solve this shard's user factors against
    the broadcast item factors ``Y``, then return the shard's item-step
    partials + quality partials.  Rows MUST be pre-sorted by (c, p) — all
    accumulation (``np.ufunc.at`` is unbuffered and in argument order, and
    ``np.dot`` pairwise-sums a fixed array) is order-fixed, which is what
    makes the distributed fit bit-equal to the single-process one.
    Returns (Ap, bp, sse, xnorm, n_users)."""
    import numpy as np

    k = Y.shape[1]
    n_items = Y.shape[0]
    if len(c) == 0:
        return (
            np.zeros((n_items, k, k)), np.zeros((n_items, k)), 0.0, 0.0, 0
        )
    uc, uidx = np.unique(c, return_inverse=True)
    Yp = Y[p]
    outer = Yp[:, :, None] * Yp[:, None, :]
    A = np.zeros((len(uc), k, k))
    np.add.at(A, uidx, outer)
    A += lam * np.eye(k)[None, :, :]
    b = np.zeros((len(uc), k))
    np.add.at(b, uidx, r[:, None] * Yp)
    X = np.linalg.solve(A, b)
    Xc = X[uidx]
    err = r - np.einsum("ij,ij->i", Xc, Yp)
    sse = float(np.dot(err, err))
    xnorm = float(np.dot(X.ravel(), X.ravel()))
    outer_x = Xc[:, :, None] * Xc[:, None, :]
    Ap = np.zeros((n_items, k, k))
    np.add.at(Ap, p, outer_x)
    bp = np.zeros((n_items, k))
    np.add.at(bp, p, r[:, None] * Xc)
    return Ap, bp, sse, xnorm, len(uc)


def als_factorize(
    sf_dir: str,
    k: int = _ALS_K,
    iters: int = _ALS_ITERS,
    lam: float = _ALS_LAM,
    driver_row_budget: int = _ALS_DRIVER_BUDGET,
) -> "pa.Table":
    """Alternating-least-squares matrix factorization of the implicit
    customer x part quantity matrix — the collaborative-filtering trainer
    a recommendation data pipeline runs after [[item-similarity-topk]]'s
    neighborhood model.  Output: one row per iteration,
    (iteration, n_ratings, n_users, mse_u6, x_norm_u6, y_norm_u6) — floats
    floored to 1e-6 units; hash-stable because the whole float path is
    order-fixed.

    Distributed shape: ratings come from :func:`_als_ratings` (two bounded
    co-locations); parts are the DIMENSION side (catalog-small: dense
    item-indexed partials, ~``n_items x k x (k+1)`` float64 per shard,
    must fit a worker — the same broadcast-bound assumption every dim
    lookup documents), customers are UNBOUNDED (their factors never leave
    the shard that owns them).  The iteration loop never re-shuffles:
    rating rows pin once in ``_ALS_SHARDS`` zero-CPU actors sharded by
    ``c % _ALS_SHARDS`` and sorted by (c, p); each iteration broadcasts Y
    (one ``ray.put``), every shard solves its users and returns item-step
    normal-equation partials, and the driver folds the partials IN SHARD
    ORDER and batch-solves the item factors.  The shard count is a fixed
    constant, not CPU-derived, so the reduction order — hence every output
    bit — is a pure function of the data; at or under
    ``driver_row_budget`` rows the same virtual-shard math runs on the
    driver with zero actors (pytest forces both paths and asserts exact
    equality)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    import ray

    n_items = (
        int(
            pc.max(
                pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])[
                    "p_partkey"
                ]
            ).as_py()
        )
        + 1
    )
    ratings = _als_ratings(sf_dir).materialize()
    n_ratings = ratings.count()
    Y = _als_init_y(n_items, k)

    if n_ratings <= driver_row_budget:
        pdf = ratings.to_pandas()
        sh = (pdf["c"].to_numpy(np.int64) % _ALS_SHARDS).astype(np.int64)
        shard_rows = []
        for s in range(_ALS_SHARDS):
            g = pdf[sh == s].sort_values(["c", "p"])
            shard_rows.append(
                (
                    g["c"].to_numpy(np.int64),
                    g["p"].to_numpy(np.int64),
                    g["r"].to_numpy(np.float64),
                )
            )

        def round_partials(Ycur):
            return [
                _als_shard_step(c_, p_, r_, Ycur, lam)
                for c_, p_, r_ in shard_rows
            ]

    else:  # pragma: no branch - forced via driver_row_budget=0 in tests

        @ray.remote(num_cpus=0)
        class RatingShard:
            """Owns the rating rows with c % _ALS_SHARDS == id, sorted by
            (c, p) at seal — num_cpus=0: arithmetic only."""

            def __init__(self):
                self._parts = []
                self._c = self._p = self._r = None

            def add(self, c, p, r):
                self._parts.append((c, p, r))
                return len(c)

            def seal(self):
                import numpy as np

                if self._parts:
                    c = np.concatenate([x[0] for x in self._parts])
                    p = np.concatenate([x[1] for x in self._parts])
                    r = np.concatenate([x[2] for x in self._parts])
                else:
                    c = p = np.empty(0, np.int64)
                    r = np.empty(0, np.float64)
                order = np.lexsort((p, c))
                self._c, self._p, self._r = c[order], p[order], r[order]
                self._parts = None
                return len(self._c)

            def step(self, Ycur, lam_):
                return _als_shard_step(self._c, self._p, self._r, Ycur, lam_)

        shards = [RatingShard.remote() for _ in range(_ALS_SHARDS)]

        def push(t: "pd.DataFrame") -> "pd.DataFrame":
            c = t["c"].to_numpy(np.int64)
            p = t["p"].to_numpy(np.int64)
            r = t["r"].to_numpy(np.float64)
            sh = c % _ALS_SHARDS
            ray.get(
                [
                    shards[s].add.remote(c[sh == s], p[sh == s], r[sh == s])
                    for s in np.unique(sh)
                ]
            )
            return pd.DataFrame({"n": pd.Series([len(t)], dtype="int64")})

        ratings.map_batches(push, batch_format="pandas").materialize()
        ray.get([s.seal.remote() for s in shards])

        def round_partials(Ycur):
            ref = ray.put(Ycur)
            return ray.get([s.step.remote(ref, lam) for s in shards])

    rows = []
    for it in range(iters):
        parts = round_partials(Y)
        A = np.add.reduce([x[0] for x in parts])  # shard order: fixed
        B = np.add.reduce([x[1] for x in parts])
        sse = 0.0
        xnorm = 0.0
        n_users = 0
        for x in parts:  # shard order: fixed
            sse += x[2]
            xnorm += x[3]
            n_users += x[4]
        A += lam * np.eye(k)[None, :, :]
        Y = np.linalg.solve(A, B)
        rows.append(
            {
                "iteration": it,
                "n_ratings": int(n_ratings),
                "n_users": int(n_users),
                "mse_u6": int(np.floor(1e6 * sse / max(1, n_ratings))),
                "x_norm_u6": int(np.floor(1e6 * xnorm)),
                "y_norm_u6": int(
                    np.floor(1e6 * float(np.dot(Y.ravel(), Y.ravel())))
                ),
            }
        )
    out = pd.DataFrame(rows)
    return pa.Table.from_pandas(out).cast(
        pa.schema(
            [
                ("iteration", pa.int64()),
                ("n_ratings", pa.int64()),
                ("n_users", pa.int64()),
                ("mse_u6", pa.int64()),
                ("x_norm_u6", pa.int64()),
                ("y_norm_u6", pa.int64()),
            ]
        )
    )


# -- multinomial naive Bayes language classifier (trained on-corpus) ----------

def nb_lang_confusion(sf_dir: str) -> "pd.DataFrame":
    """Train a multinomial naive-Bayes language classifier on the corpus's
    own char-bigram counts (add-one smoothing over the observed bigram
    vocabulary, log-prior from class frequencies) and report its
    self-classification confusion matrix — the trained-classifier
    counterpart to the fixed-wordlist heuristic in
    ``text.langid_confusion`` (CLD/fastText-style quality gates are
    exactly this shape).

    Distributed plan: ONE streaming pass folds per-batch Arrow
    (lang, bigram) count partials through a vocab-bounded groupby — the
    bigram domain is charset², Heaps-capped like ``text.vocab_topk``, so
    the driver-side weight table is O(|langs| × charset²), corpus-size
    independent.  The driver quantizes log-probabilities to INTEGER
    micro-nats — q = floor(ln((c+1)/(tot+V))·1e6), the pmi_bigrams
    convention (same double division, same libm ln as the DuckDB oracle) —
    and broadcasts (vocab index, weight matrix, priors) once via
    ``ray.put``; the scoring pass is per-doc sparse·dense int64 dot
    products (no floats ⇒ no scheduling-order nondeterminism), and the
    confusion matrix folds as tiny (lang, pred) count partials.
    Tie-break: ``np.argmax`` takes the FIRST maximum and lang rows are
    sorted, matching the oracle's ORDER BY s DESC, pl.  Counts stay exact
    in int64 up to ~10^12-char docs per (doc, gram) product; class totals
    convert exactly to float64 below 2^53 grams per class.

    Output: (lang, pred_lang, n).  Beyond-reference engine addition
    (SURVEY.md §2.8)."""
    from collections import Counter

    import numpy as np
    import pandas as pd

    import ray

    docs = read_small_aware(f"{sf_dir}/documents.parquet",
                            columns=["lang", "text"])

    def gram_partial(t: pa.Table) -> pa.Table:
        per_lang: dict[str, Counter] = {}
        for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            c = per_lang.setdefault(lang, Counter())
            c.update(zip(txt, txt[1:]))
        ls, gs, cs = [], [], []
        for lang, c in per_lang.items():
            for (a, b), n in c.items():
                ls.append(lang)
                gs.append(a + b)
                cs.append(n)
        return pa.table({
            "l": pa.array(ls, pa.string()),
            "gm": pa.array(gs, pa.string()),
            "c": pa.array(cs, pa.int64()),
        })

    counts = (
        docs.map_batches(gram_partial, batch_format="pyarrow")
        .groupby(["l", "gm"])
        .aggregate(ray.data.aggregate.Sum("c", alias_name="c"))
        .to_pandas()  # O(|langs| × charset²), corpus-size independent
    )
    ndocs = (
        read_small_aware(f"{sf_dir}/documents.parquet", columns=["lang"])
        .groupby("lang")
        .count()
        .to_pandas()  # O(|langs|)
    )
    langs = sorted(ndocs["lang"])
    vocab = sorted(counts["gm"].unique())
    v = len(vocab)
    lidx = {l: i for i, l in enumerate(langs)}
    gidx = {g: i for i, g in enumerate(vocab)}
    cmat = np.zeros((len(langs), v), dtype=np.int64)
    cmat[
        counts["l"].map(lidx).to_numpy(np.int64),
        counts["gm"].map(gidx).to_numpy(np.int64),
    ] = counts["c"].to_numpy(np.int64)
    tot = cmat.sum(axis=1)
    # integer micro-nat weights: same double ratio, same libm ln, same
    # floor as the oracle's FLOOR(LN((c+1.0)/(tot+V))*1e6)
    w = np.floor(
        np.log((cmat + 1.0) / (tot[:, None] + float(v))) * 1e6
    ).astype(np.int64)
    n_by_lang = dict(zip(ndocs["lang"], ndocs["count()"]))
    n_total = int(sum(n_by_lang.values()))
    prior = np.array(
        [np.floor(np.log(int(n_by_lang[l]) / n_total) * 1e6) for l in langs],
        dtype=np.int64,
    )
    model = ray.put((gidx, w, prior, langs))

    def score_partial(t: pa.Table) -> pa.Table:
        gi_map, W, p, ls = ray.get(model)
        conf: Counter = Counter()
        for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            c = Counter(zip(txt, txt[1:]))
            if c:
                gi = np.fromiter(
                    (gi_map[a + b] for a, b in c), np.int64, count=len(c)
                )
                cv = np.fromiter(c.values(), np.int64, count=len(c))
                s = p + W[:, gi] @ cv
            else:
                s = p
            conf[(lang, ls[int(np.argmax(s))])] += 1
        ks = sorted(conf)
        return pa.table({
            "lang": pa.array([k[0] for k in ks], pa.string()),
            "pred_lang": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([conf[k] for k in ks], pa.int64()),
        })

    out = (
        docs.map_batches(score_partial, batch_format="pyarrow")
        .groupby(["lang", "pred_lang"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()  # O(|langs|²)
        .sort_values(["lang", "pred_lang"])
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


NB_LANG_CONFUSION_SQL = """
WITH g AS (
  SELECT doc_id, lang,
         substr(text, CAST(i AS INTEGER), 2) AS gm
  FROM (SELECT doc_id, lang, text,
               unnest(range(1, length(text))) AS i
        FROM documents)
),
c AS (SELECT lang AS l, gm, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY 1, 2),
tot AS (SELECT l, SUM(c) AS tot FROM c GROUP BY 1),
vocab AS (SELECT DISTINCT gm FROM g),
nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
langs AS (SELECT DISTINCT lang AS l FROM documents),
w AS (
  SELECT langs.l, vocab.gm,
         CAST(FLOOR(LN((COALESCE(c.c, 0) + 1.0) / (tot.tot + nv.v))
                    * 1000000) AS BIGINT) AS q
  FROM langs CROSS JOIN vocab CROSS JOIN nv
  JOIN tot ON tot.l = langs.l
  LEFT JOIN c ON c.l = langs.l AND c.gm = vocab.gm
),
prior AS (
  SELECT lang AS l,
         CAST(FLOOR(LN(CAST(COUNT(*) AS DOUBLE)
                       / (SELECT COUNT(*) FROM documents)) * 1000000)
              AS BIGINT) AS p
  FROM documents GROUP BY 1
),
dg AS (SELECT doc_id, gm, CAST(COUNT(*) AS BIGINT) AS cnt FROM g GROUP BY 1, 2),
sc AS (
  SELECT dg.doc_id, w.l AS pl, SUM(dg.cnt * w.q) AS s
  FROM dg JOIN w ON w.gm = dg.gm
  GROUP BY 1, 2
),
all_s AS (
  SELECT d.doc_id, d.lang, langs.l AS pl,
         COALESCE(sc.s, 0) + prior.p AS st
  FROM documents d CROSS JOIN langs
  LEFT JOIN sc ON sc.doc_id = d.doc_id AND sc.pl = langs.l
  JOIN prior ON prior.l = langs.l
),
pred AS (
  SELECT doc_id, lang, pl AS pred_lang
  FROM (SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY st DESC, pl) AS rn
        FROM all_s)
  WHERE rn = 1
)
SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2 ORDER BY 1, 2
"""


# -- leave-one-out target encoding (categorical feature building) --------------

def loo_target_encode(sf_dir: str) -> Dataset:
    """Leave-one-out target encoding of ``o_orderpriority`` against the
    order value — the categorical-feature primitive for tree/linear
    models that avoids self-leakage by excluding each row's own target
    from its category mean: loo = (S_cat − v) / (n_cat − 1).

    Distributed plan: one |categories|-row aggregate (category → (Σv, n)
    in cents), the tiny map broadcast into a vectorized streaming pass —
    no corpus-row exchange at all, output streams as a Dataset.  Kept
    integer end-to-end: loo_c2 = (S − v) // (n − 1) floors in cents
    (numerator ≥ 0, so numpy floor_divide, DuckDB's truncating // and
    Python // all agree).  int64-safe while a category's Σv stays under
    2^63 (~10^11 orders at TPC-H prices); past that the per-category sums
    must carry hi/lo like gini_by_status.  Singleton categories (n = 1)
    have no leave-one-out mean and are dropped on both sides.

    Output: (o_orderkey, loo_c2).  Beyond-reference engine addition
    (SURVEY.md §2.8)."""
    import numpy as np

    ds = read_small_aware(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )

    def cat_partial(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        folded = pa.table({"p": t["o_orderpriority"], "v": v})
        return pa.TableGroupBy(folded, "p").aggregate(
            [("v", "sum"), ([], "count_all")]
        )

    cats = (
        ds.map_batches(cat_partial, batch_format="pyarrow")
        .groupby("p")
        .aggregate(
            ray.data.aggregate.Sum("v_sum", alias_name="s"),
            ray.data.aggregate.Sum("count_all", alias_name="n"),
        )
        .to_pandas()  # O(|categories|)
    )
    smap = {p: (int(s), int(n)) for p, s, n in zip(cats["p"], cats["s"], cats["n"])}

    def encode(t: pa.Table) -> pa.Table:
        v = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        ps = t["o_orderpriority"].to_pylist()
        s = np.fromiter((smap[p][0] for p in ps), np.int64, count=len(ps))
        n = np.fromiter((smap[p][1] for p in ps), np.int64, count=len(ps))
        keep = n > 1
        loo = (s[keep] - v[keep]) // (n[keep] - 1)
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "loo_c2": pa.array(loo, pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


LOO_TARGET_ENCODE_SQL = """
WITH c AS (
  SELECT o_orderpriority AS p,
         SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
)
SELECT o.o_orderkey,
       CAST((c.s - CAST(ROUND(o.o_totalprice*100) AS BIGINT)) // (c.n - 1)
            AS BIGINT) AS loo_c2
FROM orders o JOIN c ON c.p = o.o_orderpriority
WHERE c.n > 1
ORDER BY o.o_orderkey
"""


# -- histogram-based best-split finding (the GBDT/XGBoost inner loop) ---------

#: price-feature histogram width: power of two so the arithmetic right
#: shift floors identically for signed values (the _floor_bucket contract).
_SPLIT_SHIFT = 12
#: fixed-point scale for the variance-reduction gain.
_SPLIT_MU = 1_000_000


def gbdt_split_gain(sf_dir: str) -> "object":
    """Histogram-based best-split finding — the inner loop of every
    distributed gradient-boosted-tree trainer (XGBoost's approx/hist mode,
    LightGBM): bin each feature, build per-bin (count, positive-count)
    histograms in ONE streaming pass over all features at once, then scan
    bin boundaries for the split maximizing impurity reduction.  Label
    ``y = 1`` iff ``o_orderpriority`` is urgent/high; features are the
    binned price (4096-cent bins), ISO weekday and month of
    ``o_orderdate``.

    Scale shape: the fold emits one (feature, bin) partial per batch —
    the shuffle carries histograms, never rows — and the driver holds only
    ``O(Σ feature domains)`` count rows (price domain/4096 + 7 + 12); the
    boundary scan is exact Python-int arithmetic.  The gain is the
    variance-reduction numerator for 0/1 labels in fixed micro-units,
    ``(P_L²·10⁶)//n_L + (P_R²·10⁶)//n_R − (P²·10⁶)//n`` — floored integer
    division on both sides, so the DuckDB HUGEINT oracle hash-matches
    (all per-term numerators are non-negative, where ``//`` trunc ==
    floor).  Per-term products stay under HUGEINT's 1.7e38 up to ~1e15
    rows; ``gain_fp ≤ 10⁶·n`` keeps the int64 output safe past 1e12.

    Output: one row per feature — (feature, split_b, n_left, pos_left,
    gain_fp, is_best) with rows going left iff ``bin ≤ split_b``; ties
    break toward the smaller bin, the cross-feature winner toward the
    lexicographically smaller feature name.  Beyond-reference engine
    addition (SURVEY.md §2.8)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = read_small_aware(
        f"{sf_dir}/orders.parquet",
        columns=["o_totalprice", "o_orderpriority", "o_orderdate"],
    )
    pos_set = pa.array(["1-URGENT", "2-HIGH"])

    def hist(t: pa.Table) -> pa.Table:
        y = pc.cast(pc.is_in(t["o_orderpriority"], value_set=pos_set), pa.int64())
        v = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        feats = (
            ("month", pc.cast(pc.month(t["o_orderdate"]), pa.int64())),
            ("price_bucket", pc.shift_right(v, _SPLIT_SHIFT)),
            # Arrow day_of_week counts Monday=0 — mirrored as isodow()-1.
            ("weekday", pc.cast(pc.day_of_week(t["o_orderdate"]), pa.int64())),
        )
        folded = pa.concat_tables(
            pa.table({"f": pa.array([name] * t.num_rows, pa.string()),
                      "b": col, "y": y})
            for name, col in feats
        )
        return pa.TableGroupBy(folded, ["f", "b"]).aggregate(
            [("y", "sum"), ([], "count_all")]
        )

    h = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby(["f", "b"])
        .aggregate(Sum("y_sum", alias_name="p"), Sum("count_all", alias_name="c"))
        .to_pandas()  # O(sum of feature bin domains)
    )
    rows = []
    for f, sub in h.groupby("f"):
        sub = sub.sort_values("b").reset_index(drop=True)
        n, pt = int(sub["c"].sum()), int(sub["p"].sum())
        total_term = (pt * pt * _SPLIT_MU) // n
        nl = pl = 0
        best = None  # (gain, b, nl, pl)
        for b, c, p in zip(sub["b"], sub["c"], sub["p"]):
            nl += int(c)
            pl += int(p)
            if nl >= n:
                break
            gain = (
                (pl * pl * _SPLIT_MU) // nl
                + ((pt - pl) * (pt - pl) * _SPLIT_MU) // (n - nl)
                - total_term
            )
            if best is None or gain > best[0]:
                best = (gain, int(b), nl, pl)
        if best is not None:
            rows.append(
                {"feature": f, "split_b": best[1], "n_left": best[2],
                 "pos_left": best[3], "gain_fp": best[0]}
            )
    winner = min(rows, key=lambda r: (-r["gain_fp"], r["feature"]))["feature"]
    out = pd.DataFrame(sorted(rows, key=lambda r: r["feature"]))
    out["is_best"] = (out["feature"] == winner).astype("int64")
    return out.reset_index(drop=True)


GBDT_SPLIT_GAIN_SQL = f"""
WITH x AS (
  SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS v,
         isodow(o_orderdate) - 1 AS dw,
         month(o_orderdate) AS mo,
         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM orders
),
long AS (
  SELECT 'price_bucket' AS f, v // {1 << _SPLIT_SHIFT} AS b, y FROM x
  UNION ALL SELECT 'weekday', dw, y FROM x
  UNION ALL SELECT 'month', mo, y FROM x
),
h AS (SELECT f, b, CAST(COUNT(*) AS HUGEINT) AS c,
             CAST(SUM(y) AS HUGEINT) AS p
      FROM long GROUP BY f, b),
cum AS (
  SELECT f, b,
         SUM(c) OVER (PARTITION BY f ORDER BY b) AS nl,
         SUM(p) OVER (PARTITION BY f ORDER BY b) AS pl,
         SUM(c) OVER (PARTITION BY f) AS n,
         SUM(p) OVER (PARTITION BY f) AS pt
  FROM h
),
g AS (
  SELECT f, b, nl, pl,
         (pl*pl*{_SPLIT_MU})//nl
         + ((pt-pl)*(pt-pl)*{_SPLIT_MU})//(n-nl)
         - (pt*pt*{_SPLIT_MU})//n AS gain
  FROM cum WHERE nl < n
),
best AS (
  SELECT f, b, nl, pl, gain,
         ROW_NUMBER() OVER (PARTITION BY f ORDER BY gain DESC, b) AS rk
  FROM g
),
ranked AS (
  SELECT f, b, nl, pl, gain,
         ROW_NUMBER() OVER (ORDER BY gain DESC, f) AS rk2
  FROM best WHERE rk = 1
)
SELECT f AS feature, CAST(b AS BIGINT) AS split_b,
       CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
       CAST(gain AS BIGINT) AS gain_fp,
       CAST(CASE WHEN rk2 = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_best
FROM ranked ORDER BY feature
"""


# -- Kendall rank-correlation concordance counts ------------------------------

def kendall_tau_counts(sf_dir: str) -> "object":
    """Exact Kendall rank-correlation ingredients per return flag between
    ``l_quantity`` and ``l_discount`` — concordant / discordant / tied pair
    counts, from which τ-a and τ-b are one division away.  Both columns
    have SMALL finite domains (quantity 1..50, discount 0..10 cents), so
    the n² pair sums collapse onto the joint (flag, qty, disc) histogram:
    the streaming fold ships ≤ |flags|·550 count cells, the global groupby
    has ~1650 groups, and the driver does the O(cells²) concordance scan
    in exact Python ints.  No row pair is ever materialized.

    int64 bound: pair counts reach n²/2 per flag — exact in the int64
    output to ~4.3e9 rows per flag (the ``auc_by_type`` Mann-Whitney
    caveat; the Python driver is arbitrary-precision, only the final cast
    saturates, and it RAISES rather than wraps).

    Output: (l_returnflag, n, concordant, discordant, ties_x, ties_y,
    ties_xy).  Beyond-reference engine addition (SURVEY.md §2.8)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = read_small_aware(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"],
    )

    def fold(t: pa.Table) -> pa.Table:
        j = pa.table(
            {
                "f": t["l_returnflag"],
                "x": pc.cast(t["l_quantity"], pa.int64()),
                "y": pc.cast(
                    pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64()
                ),
            }
        )
        return pa.TableGroupBy(j, ["f", "x", "y"]).aggregate([([], "count_all")])

    j = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["f", "x", "y"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|flags| x 50 x 11) cells
    )
    rows = []
    for f, sub in j.groupby("f"):
        cells = sorted(
            (int(x), int(y), int(c))
            for x, y, c in zip(sub["x"], sub["y"], sub["c"])
        )
        n = sum(c for _, _, c in cells)
        con = dis = tx = ty = 0
        for i in range(len(cells)):
            x1, y1, c1 = cells[i]
            for x2, y2, c2 in cells[i + 1:]:
                d = (x1 - x2) * (y1 - y2)
                if d > 0:
                    con += c1 * c2
                elif d < 0:
                    dis += c1 * c2
                elif x1 == x2:
                    tx += c1 * c2
                else:
                    ty += c1 * c2
        txy = sum(c * (c - 1) // 2 for _, _, c in cells)
        rows.append(
            {"l_returnflag": f, "n": n, "concordant": con, "discordant": dis,
             "ties_x": tx, "ties_y": ty, "ties_xy": txy}
        )
    return (
        pd.DataFrame(sorted(rows, key=lambda r: r["l_returnflag"]))
        .astype({c: "int64" for c in
                 ("n", "concordant", "discordant", "ties_x", "ties_y", "ties_xy")})
        .reset_index(drop=True)
    )


KENDALL_TAU_COUNTS_SQL = """
WITH j AS (
  SELECT l_returnflag AS f, CAST(l_quantity AS BIGINT) AS x,
         CAST(ROUND(l_discount*100) AS BIGINT) AS y,
         CAST(COUNT(*) AS HUGEINT) AS c
  FROM lineitem GROUP BY 1, 2, 3
),
p AS (
  SELECT a.f,
    SUM(CASE WHEN (a.x-b.x)*(a.y-b.y) > 0 THEN a.c*b.c ELSE 0 END) AS con,
    SUM(CASE WHEN (a.x-b.x)*(a.y-b.y) < 0 THEN a.c*b.c ELSE 0 END) AS dis,
    SUM(CASE WHEN a.x = b.x AND a.y <> b.y THEN a.c*b.c ELSE 0 END) AS tx,
    SUM(CASE WHEN a.y = b.y AND a.x <> b.x THEN a.c*b.c ELSE 0 END) AS ty
  FROM j a JOIN j b
    ON a.f = b.f AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
  GROUP BY a.f
),
t AS (SELECT f, SUM(c) AS n, SUM(c*(c-1)//2) AS txy FROM j GROUP BY f)
SELECT t.f AS l_returnflag, CAST(t.n AS BIGINT) AS n,
       CAST(COALESCE(p.con, 0) AS BIGINT) AS concordant,
       CAST(COALESCE(p.dis, 0) AS BIGINT) AS discordant,
       CAST(COALESCE(p.tx, 0) AS BIGINT) AS ties_x,
       CAST(COALESCE(p.ty, 0) AS BIGINT) AS ties_y,
       CAST(t.txy AS BIGINT) AS ties_xy
FROM t LEFT JOIN p ON p.f = t.f ORDER BY l_returnflag
"""


# -- two-round gradient-boosted stumps ----------------------------------------

def gbdt_boost_rounds(sf_dir: str) -> "object":
    """Two rounds of gradient boosting with depth-1 trees (stumps) under
    squared loss — the iterative half of the GBDT family whose single-split
    inner loop is :func:`gbdt_split_gain`: round 1 fits a price-bin stump
    to the 0/1 urgent-priority label, round 2 fits a weekday stump to the
    RESIDUALS of round 1.  Because the label is binary and each round uses
    one binned feature, the residual of a row is a pure function of its
    (price_bin, weekday, y) cell — so ONE streaming pass folding the joint
    histogram (≤ bins×7×2 cells shuffled, never rows) feeds BOTH rounds,
    and the driver replays the boosting recurrence over cells in exact
    Python ints.  Leaf values and residuals live in fixed micro-units
    (ŷ_mu = (ΣY·10⁶)//n_leaf, r_mu = y·10⁶ − ŷ_mu), so round-2 sums stay
    integers; round-2 leaf means are FLOOR divisions of possibly negative
    sums — Python ``//`` floors natively, the oracle uses the
    non-negative-remainder emulation (DuckDB ``//`` truncates).

    Round-2 gain is in micro² units: ≤ 10¹²·n, int64-exact to ~9e6 rows —
    past that only the gain column saturates its cast (and RAISES); at
    cluster scale report it scaled down or widen the column.

    Output: (boost_round, feature, split_b, n_left, gain_fp, leaf_lo_mu,
    leaf_hi_mu).  Beyond-reference engine addition (SURVEY.md §2.8)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = read_small_aware(
        f"{sf_dir}/orders.parquet",
        columns=["o_totalprice", "o_orderpriority", "o_orderdate"],
    )
    pos_set = pa.array(["1-URGENT", "2-HIGH"])
    MU = 1_000_000

    def joint(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        folded = pa.table(
            {
                "pb": pc.shift_right(v, _SPLIT_SHIFT),
                "dw": pc.cast(pc.day_of_week(t["o_orderdate"]), pa.int64()),
                "y": pc.cast(
                    pc.is_in(t["o_orderpriority"], value_set=pos_set), pa.int64()
                ),
            }
        )
        return pa.TableGroupBy(folded, ["pb", "dw", "y"]).aggregate(
            [([], "count_all")]
        )

    j = (
        ds.map_batches(joint, batch_format="pyarrow")
        .groupby(["pb", "dw", "y"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # O(price bins x 7 x 2)
    )
    cells = [
        (int(pb), int(dw), int(y), int(c))
        for pb, dw, y, c in zip(j["pb"], j["dw"], j["y"], j["c"])
    ]
    # round 1: price-bin stump on y
    h1: dict[int, list[int]] = {}
    for pb, _, y, c in cells:
        e = h1.setdefault(pb, [0, 0])
        e[0] += c
        e[1] += c * y
    n = sum(e[0] for e in h1.values())
    pt = sum(e[1] for e in h1.values())
    total1 = (pt * pt * MU) // n
    nl = pl = 0
    best1 = None  # (gain, pb, nl, pl)
    for pb in sorted(h1):
        nl += h1[pb][0]
        pl += h1[pb][1]
        if nl >= n:
            break
        gain = (pl * pl * MU) // nl + ((pt - pl) * (pt - pl) * MU) // (n - nl) - total1
        if best1 is None or gain > best1[0]:
            best1 = (gain, pb, nl, pl)
    g1, b1, nl1, pl1 = best1
    lo1 = (pl1 * MU) // nl1
    hi1 = ((pt - pl1) * MU) // (n - nl1)
    # round 2: weekday stump on micro-residuals
    h2: dict[int, list[int]] = {}
    for pb, dw, y, c in cells:
        rv = y * MU - (lo1 if pb <= b1 else hi1)
        e = h2.setdefault(dw, [0, 0])
        e[0] += c
        e[1] += c * rv
    st = sum(e[1] for e in h2.values())
    total2 = (st * st) // n
    nl = sl = 0
    best2 = None
    for dw in sorted(h2):
        nl += h2[dw][0]
        sl += h2[dw][1]
        if nl >= n:
            break
        gain = (sl * sl) // nl + ((st - sl) * (st - sl)) // (n - nl) - total2
        if best2 is None or gain > best2[0]:
            best2 = (gain, dw, nl, sl)
    g2, b2, nl2, sl2 = best2
    return pd.DataFrame(
        [
            {"boost_round": 1, "feature": "price_bucket", "split_b": b1,
             "n_left": nl1, "gain_fp": g1, "leaf_lo_mu": lo1,
             "leaf_hi_mu": hi1},
            {"boost_round": 2, "feature": "weekday", "split_b": b2,
             "n_left": nl2, "gain_fp": g2, "leaf_lo_mu": sl2 // nl2,
             "leaf_hi_mu": (st - sl2) // (n - nl2)},
        ]
    ).astype({c: "int64" for c in
              ("boost_round", "split_b", "n_left", "gain_fp",
               "leaf_lo_mu", "leaf_hi_mu")})


GBDT_BOOST_ROUNDS_SQL = f"""
WITH x AS (
  SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) // {1 << _SPLIT_SHIFT} AS pb,
         isodow(o_orderdate) - 1 AS dw,
         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM orders
),
j AS (SELECT pb, dw, y, CAST(COUNT(*) AS HUGEINT) AS c FROM x GROUP BY 1,2,3),
h1 AS (SELECT pb, SUM(c) AS c, SUM(c*y) AS p FROM j GROUP BY pb),
cum1 AS (
  SELECT pb, SUM(c) OVER (ORDER BY pb) AS nl, SUM(p) OVER (ORDER BY pb) AS pl,
         SUM(c) OVER () AS n, SUM(p) OVER () AS pt
  FROM h1
),
g1 AS (
  SELECT pb, nl, pl, n, pt,
         (pl*pl*{1_000_000})//nl + ((pt-pl)*(pt-pl)*{1_000_000})//(n-nl)
         - (pt*pt*{1_000_000})//n AS gain
  FROM cum1 WHERE nl < n
),
w1 AS (
  SELECT *, (pl*{1_000_000})//nl AS lo1,
         ((pt-pl)*{1_000_000})//(n-nl) AS hi1
  FROM g1 ORDER BY gain DESC, pb LIMIT 1
),
r AS (
  SELECT j.dw, j.c,
         CAST(j.y AS HUGEINT)*{1_000_000}
         - CASE WHEN j.pb <= w1.pb THEN w1.lo1 ELSE w1.hi1 END AS rv
  FROM j, w1
),
h2 AS (SELECT dw, SUM(c) AS cw, SUM(c*rv) AS sw FROM r GROUP BY dw),
cum2 AS (
  SELECT dw, SUM(cw) OVER (ORDER BY dw) AS nl, SUM(sw) OVER (ORDER BY dw) AS sl,
         SUM(cw) OVER () AS n, SUM(sw) OVER () AS st
  FROM h2
),
g2 AS (
  SELECT dw, nl, sl, n, st,
         (sl*sl)//nl + ((st-sl)*(st-sl))//(n-nl) - (st*st)//n AS gain
  FROM cum2 WHERE nl < n
),
w2 AS (SELECT * FROM g2 ORDER BY gain DESC, dw LIMIT 1)
SELECT CAST(1 AS BIGINT) AS boost_round, 'price_bucket' AS feature,
       CAST(pb AS BIGINT) AS split_b, CAST(nl AS BIGINT) AS n_left,
       CAST(gain AS BIGINT) AS gain_fp, CAST(lo1 AS BIGINT) AS leaf_lo_mu,
       CAST(hi1 AS BIGINT) AS leaf_hi_mu
FROM w1
UNION ALL
SELECT CAST(2 AS BIGINT), 'weekday', CAST(dw AS BIGINT), CAST(nl AS BIGINT),
       CAST(gain AS BIGINT),
       CAST((sl - ((sl % nl) + nl) % nl) // nl AS BIGINT),
       CAST(((st-sl) - (((st-sl) % (n-nl)) + (n-nl)) % (n-nl)) // (n-nl)
            AS BIGINT)
FROM w2
ORDER BY boost_round
"""


# -- isotonic regression (PAVA via the minimax identity) -----------------------

_ISO_SHIFT = 19  # 2^19-cent (~$5.2k) price bins: O(B^3) minimax needs small B


def isotonic_price_urgency(sf_dir: str) -> "object":
    """Isotonic (monotone non-decreasing) regression of the urgent-order
    rate on price — the calibration fit (pool-adjacent-violators) that
    turns a noisy per-bin rate into the best monotone step function, the
    standard post-hoc calibrator next to ``calibration_bins``'s
    reliability diagram.  Computed via the PAVA minimax identity
    ``iso(i) = max_{j≤i} min_{k≥i} mean(y[j..k])`` — order-free, so it
    distributes trivially — with means in FLOORED micro-units
    ``((pos_jk)·10⁶)//(n_jk)``: the max/min lattice then operates on
    integers and the DuckDB oracle replays it exactly (the well-defined
    floored-mean variant of PAVA; both sides apply the identical floor).

    Scale shape: one histogram fold to (bin, n, positives) — the
    ``gbdt_split_gain`` shuffle, never rows — and the O(B²)–O(B³) minimax
    runs on ≤ a few dozen bins driver-side in Python ints.  Output:
    (bin_id, n, pos, rate_mu, iso_rate_mu) — iso_rate_mu is non-decreasing
    in bin_id by construction.  Beyond-reference engine addition
    (SURVEY.md §2.8)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = read_small_aware(
        f"{sf_dir}/orders.parquet",
        columns=["o_totalprice", "o_orderpriority"],
    )
    pos_set = pa.array(["1-URGENT", "2-HIGH"])

    def hist(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        folded = pa.table(
            {
                "b": pc.shift_right(v, _ISO_SHIFT),
                "y": pc.cast(
                    pc.is_in(t["o_orderpriority"], value_set=pos_set),
                    pa.int64(),
                ),
            }
        )
        return pa.TableGroupBy(folded, "b").aggregate(
            [("y", "sum"), ([], "count_all")]
        )

    h = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("y_sum", alias_name="p"), Sum("count_all", alias_name="c"))
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    bins = [(int(b), int(c), int(p)) for b, c, p in zip(h["b"], h["c"], h["p"])]
    B = len(bins)
    # prefix sums for O(1) segment means
    pn = [0] * (B + 1)
    pp = [0] * (B + 1)
    for i, (_, c, p) in enumerate(bins):
        pn[i + 1] = pn[i] + c
        pp[i + 1] = pp[i] + p

    def mu(j: int, k: int) -> int:  # floored micro-mean of bins j..k
        return ((pp[k + 1] - pp[j]) * 1_000_000) // (pn[k + 1] - pn[j])

    rows = []
    for i, (b, c, p) in enumerate(bins):
        iso = max(min(mu(j, k) for k in range(i, B)) for j in range(i + 1))
        rows.append(
            {"bin_id": b, "n": c, "pos": p,
             "rate_mu": (p * 1_000_000) // c, "iso_rate_mu": iso}
        )
    return pd.DataFrame(rows).astype(
        {c: "int64" for c in ("bin_id", "n", "pos", "rate_mu", "iso_rate_mu")}
    )


ISOTONIC_PRICE_URGENCY_SQL = f"""
WITH h AS (
  SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) // {1 << _ISO_SHIFT} AS b,
         CAST(COUNT(*) AS HUGEINT) AS c,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                       THEN 1 ELSE 0 END) AS HUGEINT) AS p
  FROM orders GROUP BY b
),
o AS (SELECT b, c, p, ROW_NUMBER() OVER (ORDER BY b) AS i FROM h),
pre AS (
  SELECT b, c, p, i,
         SUM(c) OVER (ORDER BY i) AS pn,
         SUM(p) OVER (ORDER BY i) AS pp
  FROM o
),
seg AS (  -- floored micro-mean of every bin segment j..k
  SELECT j.i AS j, k.i AS k,
         ((k.pp - j.pp + j.p) * 1000000) // (k.pn - j.pn + j.c) AS mu
  FROM pre j JOIN pre k ON j.i <= k.i
),
inner_min AS (  -- min over k >= i of mean(j..k), per (i, j<=i)
  SELECT i.i AS i, s.j, MIN(s.mu) AS m
  FROM pre i JOIN seg s ON s.j <= i.i AND s.k >= i.i
  GROUP BY i.i, s.j
),
iso AS (SELECT i, MAX(m) AS iso_mu FROM inner_min GROUP BY i)
SELECT pre.b AS bin_id, CAST(pre.c AS BIGINT) AS n,
       CAST(pre.p AS BIGINT) AS pos,
       CAST((pre.p * 1000000) // pre.c AS BIGINT) AS rate_mu,
       CAST(iso.iso_mu AS BIGINT) AS iso_rate_mu
FROM pre JOIN iso ON iso.i = pre.i
ORDER BY bin_id
"""


# -- block jackknife uncertainty of the per-type mean ---------------------------

_JK_FOLDS = 8


def jackknife_mean_by_type(sf_dir: str) -> "object":
    """Delete-one-block jackknife over eight user-id folds for the
    per-type mean event value — distributed uncertainty quantification
    without replication: the fold statistic grid is ONE (type, fold)
    sufficient-statistics exchange (Σv, n per cell — never rows), and the
    leave-one-fold-out means + spread are exact driver arithmetic.
    Folding by user (not by row) respects within-user correlation — the
    block-jackknife requirement.

    Fixed-point contract: every leave-one-out mean is floored micro-cents
    ``((S−S_f)·10⁶)//(n−n_f)``, their center is the floored fold average,
    and jk_ss_mu2 = Σ_f (θ_f − θ̄)² in exact ints — the HUGEINT oracle
    replays the identical floors.  Var_jack = (F−1)/F · jk_ss / (scale
    factors left to the caller).  Output: (event_type, n, mean_mu,
    jk_ss_mu2).  Beyond-reference engine addition (SURVEY.md §2.8)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = read_small_aware(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "value"]
    )

    def fold(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        f = pc.bit_wise_and(pc.cast(t["user_id"], pa.int64()), _JK_FOLDS - 1)
        folded = pa.table(
            {"e": t["event_type"], "f": f, "v": v}
        )
        return pa.TableGroupBy(folded, ["e", "f"]).aggregate(
            [("v", "sum"), ([], "count_all")]
        )

    g = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["e", "f"])
        .aggregate(Sum("v_sum", alias_name="s"),
                   Sum("count_all", alias_name="c"))
        .to_pandas()  # O(|types| x folds)
    )
    rows = []
    for e, sub in g.groupby("e"):
        n = int(sub["c"].sum())
        s = int(sub["s"].sum())
        thetas = []
        for _, r in sub.iterrows():
            nf, sf = int(r["c"]), int(r["s"])
            if n - nf > 0:
                thetas.append(((s - sf) * 1_000_000) // (n - nf))
        center = sum(thetas) // len(thetas)
        ss = sum((t - center) ** 2 for t in thetas)
        rows.append(
            {"event_type": e, "n": n, "mean_mu": (s * 1_000_000) // n,
             "jk_ss_mu2": ss}
        )
    return (
        pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
        .astype({c: "int64" for c in ("n", "mean_mu", "jk_ss_mu2")})
        .reset_index(drop=True)
    )


JACKKNIFE_MEAN_BY_TYPE_SQL = f"""
WITH x AS (
  SELECT event_type AS e, user_id & {_JK_FOLDS - 1} AS f,
         CAST(ROUND(value*100) AS BIGINT) AS v
  FROM events
),
cell AS (SELECT e, f, CAST(SUM(v) AS HUGEINT) AS s,
                CAST(COUNT(*) AS HUGEINT) AS c
         FROM x GROUP BY e, f),
tot AS (SELECT e, SUM(s) AS st, SUM(c) AS nt FROM cell GROUP BY e),
theta AS (
  SELECT cell.e, ((tot.st - cell.s) * 1000000) // (tot.nt - cell.c) AS th
  FROM cell JOIN tot ON tot.e = cell.e
  WHERE tot.nt - cell.c > 0
),
ctr AS (SELECT e, SUM(th) // COUNT(*) AS center FROM theta GROUP BY e)
SELECT t.e AS event_type, CAST(tot.nt AS BIGINT) AS n,
       CAST((tot.st * 1000000) // tot.nt AS BIGINT) AS mean_mu,
       CAST(SUM((t.th - c.center) * (t.th - c.center)) AS BIGINT)
         AS jk_ss_mu2
FROM theta t JOIN ctr c ON c.e = t.e JOIN tot ON tot.e = t.e
GROUP BY t.e, tot.nt, tot.st
ORDER BY event_type
"""


# -- exact tie-corrected Spearman rank correlation ----------------------------

def spearman_qty_discount(sf_dir: str) -> "pa.Table":
    """Tie-corrected Spearman rank correlation between quantity and
    discount per return flag — the nonparametric monotone-association
    companion to ``kendall_tau_counts`` (Pearson on midranks; with ties,
    the midrank formula is the exact definition, not an approximation).

    Shape for 100 TB: BOTH variables live on tiny domains (50 quantities x
    11 discounts), so ONE combiner groupby folds the joint (flag, qty,
    disc) histogram — <= 550 cells per flag cross the wire, never rows.
    The driver computes doubled midranks (2*cum_before + c + 1, integer-
    exact under ties) from the marginals and the cleared-denominator
    Pearson moments on ranks in arbitrary-precision Python ints.  The one
    irrational step (sqrt of the variance product) uses IEEE-754 double
    sqrt/divide — correctly rounded by the standard, so Python and DuckDB
    produce bit-identical doubles from identical integer inputs and the
    floored ppm output hash-matches.  int->double conversion of the >2^53
    moment products is also correctly rounded on both sides.  Output:
    (l_returnflag, n, spearman_ppm).  Beyond-reference engine addition
    (SURVEY.md §2.8)."""
    import math

    import pandas as pd

    from ray.data.aggregate import Sum

    ds = read_small_aware(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"],
    )

    def fold(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "f": t["l_returnflag"],
                "q": pc.cast(t["l_quantity"], pa.int64()),
                "d": pc.cast(
                    pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64()
                ),
            }
        )
        return pa.TableGroupBy(g, ["f", "q", "d"]).aggregate([([], "count_all")])

    h = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["f", "q", "d"])
        .aggregate(Sum("count_all", alias_name="c"))
        .to_pandas()  # <= |flags| x 550 cells
    )

    def midranks2(sub: "pd.DataFrame", key: str) -> dict[int, int]:
        m = sub.groupby(key)["c"].sum().sort_index()
        out, cum = {}, 0
        for v, c in m.items():
            out[int(v)] = 2 * cum + int(c) + 1
            cum += int(c)
        return out

    rows = []
    for f, sub in h.groupby("f"):
        rq = midranks2(sub, "q")
        rd = midranks2(sub, "d")
        n = sx = sy = sxx = syy = sxy = 0
        for r in sub.itertuples():
            c, x, y = int(r.c), rq[int(r.q)], rd[int(r.d)]
            n += c
            sx += c * x
            sy += c * y
            sxx += c * x * x
            syy += c * y * y
            sxy += c * x * y
        num = n * sxy - sx * sy
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        ppm = (
            math.floor(
                1000000.0 * (float(num) / math.sqrt(float(denx) * float(deny)))
            )
            if denx > 0 and deny > 0
            else 0
        )
        rows.append({"l_returnflag": f, "n": n, "spearman_ppm": ppm})
    rows.sort(key=lambda r: r["l_returnflag"])
    return pa.table(
        {
            "l_returnflag": pa.array([r["l_returnflag"] for r in rows]),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "spearman_ppm": pa.array(
                [r["spearman_ppm"] for r in rows], pa.int64()
            ),
        }
    )


SPEARMAN_QTY_DISCOUNT_SQL = """
WITH h AS (
  SELECT l_returnflag AS f, CAST(l_quantity AS BIGINT) AS q,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS d, COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2, 3
),
qm AS (SELECT f, q, SUM(c) AS cq FROM h GROUP BY 1, 2),
qr AS (
  SELECT f, q,
         2 * COALESCE(SUM(cq) OVER (PARTITION BY f ORDER BY q
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cq + 1 AS rq2
  FROM qm
),
dm AS (SELECT f, d, SUM(c) AS cd FROM h GROUP BY 1, 2),
dr AS (
  SELECT f, d,
         2 * COALESCE(SUM(cd) OVER (PARTITION BY f ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cd + 1 AS rd2
  FROM dm
),
m AS (
  SELECT h.f, CAST(SUM(c) AS HUGEINT) AS n,
         SUM(CAST(c AS HUGEINT) * rq2) AS sx,
         SUM(CAST(c AS HUGEINT) * rd2) AS sy,
         SUM(CAST(c AS HUGEINT) * rq2 * rq2) AS sxx,
         SUM(CAST(c AS HUGEINT) * rd2 * rd2) AS syy,
         SUM(CAST(c AS HUGEINT) * rq2 * rd2) AS sxy
  FROM h JOIN qr ON h.f = qr.f AND h.q = qr.q
         JOIN dr ON h.f = dr.f AND h.d = dr.d
  GROUP BY h.f
)
SELECT f AS l_returnflag, CAST(n AS BIGINT) AS n,
       CAST(FLOOR(1000000.0 * (CAST(n * sxy - sx * sy AS DOUBLE)
            / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                 * CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT)
         AS spearman_ppm
FROM m ORDER BY l_returnflag
"""


# -- PLSA topic model (EM over pinned doc shards) ------------------------------

_PLSA_K = 4
_PLSA_ITERS = 5
_PLSA_SHARDS = 8
#: at or under this many (doc, term) cells the same virtual-shard math runs
#: on the driver with zero actors (pytest forces both paths, bit-equality)
_PLSA_DRIVER_BUDGET = 200_000


def _plsa_init_phi(n_vocab: int, k: int = _PLSA_K) -> "np.ndarray":
    """Deterministic symmetric-broken init: phi[z, w] ∝ 1 + (31w+17z) mod 7."""
    import numpy as np

    w = np.arange(n_vocab, dtype=np.int64)
    phi = np.stack([1.0 + ((31 * w + 17 * z) % 7) for z in range(k)])
    return phi / phi.sum(axis=1, keepdims=True)


def _plsa_init_theta(doc_ids: "np.ndarray", k: int = _PLSA_K) -> "np.ndarray":
    import numpy as np

    return np.stack(
        [1.0 + ((doc_ids + z) % 5) for z in range(k)], axis=1
    ) / np.stack(
        [1.0 + ((doc_ids + z) % 5) for z in range(k)], axis=1
    ).sum(axis=1, keepdims=True)


def _plsa_shard_step(pos, w, n, theta, phi):
    """One EM step over a shard's sorted cells (pos = local doc index per
    cell): returns (phi_partial K x V, loglik_partial, theta_new).  All
    float64 in a FIXED row order, so the result is a pure function of
    (cells, theta, phi)."""
    import numpy as np

    k, v = phi.shape
    q = phi[:, w].T * theta[pos]  # (cells, K)
    s = q.sum(axis=1)
    ll = float((n * np.log(s)).sum())
    p = q / s[:, None]  # responsibilities
    wn = n[:, None] * p
    phi_part = np.zeros((k, v))
    for z in range(k):
        np.add.at(phi_part[z], w, wn[:, z])
    theta_new = np.zeros_like(theta)
    np.add.at(theta_new, pos, wn)
    theta_new = theta_new / theta_new.sum(axis=1, keepdims=True)
    return phi_part, ll, theta_new


def plsa_topics(
    sf_dir: str,
    k: int = _PLSA_K,
    iters: int = _PLSA_ITERS,
    driver_row_budget: int = _PLSA_DRIVER_BUDGET,
) -> "pa.Table":
    """PLSA topic model (Hofmann, SIGIR 1999 — the EM matrix-decomposition
    ancestor of LDA) over the documents' (doc, term) count matrix: ``k``
    topics fit by ``iters`` EM rounds.  Output: one row per iteration,
    (iteration, n_docs, n_vocab, n_cells, loglik_u6) with the exact
    floored 1e-6-unit log-likelihood — non-decreasing by the EM guarantee
    (pytest asserts it), hash-stable because the whole float path is
    order-fixed.

    Distributed shape (the ``als_factorize`` pattern): the topic-term
    table φ (k × |vocab| float64) is the DIMENSION side — broadcast once
    per round under the vocabulary-bounded assumption (Heaps' law);
    doc-topic state θ is UNBOUNDED and never leaves the shard that owns
    its documents.  Cells pin ONCE into ``_PLSA_SHARDS`` zero-CPU actors
    (doc_id mod shards, sorted by (doc, term)); each round ships φ via one
    ``ray.put``, shards return φ partials + loglik, and the driver folds
    IN SHARD ORDER — reduction order, hence every output bit, is a pure
    function of the data.  At or under ``driver_row_budget`` cells the
    identical virtual-shard math runs driver-side (pytest forces both
    paths and asserts bit equality).  No SQL oracle (iterative float EM);
    the correctness gates are the equality + monotonicity pytests.
    Beyond-reference engine addition (SURVEY.md §2.8)."""
    import numpy as np
    import pandas as pd

    import ray

    from .text import TOKEN_RE, _read_docs

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def tok_partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        toks = set()
        for text in t.column("text").to_pylist():
            toks.update(TOKEN_RE.findall(text.lower()))
        return pa.table({"token": pa.array(sorted(toks), pa.string())})

    from ray.data.aggregate import Count

    vocab = sorted(
        docs.map_batches(tok_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Count(alias_name="_c"))  # distinct
        .to_pandas()["token"]  # Heaps-bounded
    )
    wid = {t: i for i, t in enumerate(vocab)}
    wid_ref = ray.put(wid)

    def cells(t: pa.Table) -> "pd.DataFrame":
        from collections import Counter

        wmap = ray.get(wid_ref)
        ds_, ws_, ns_ = [], [], []
        ids = t.column("doc_id").to_pylist()
        for did, text in zip(ids, t.column("text").to_pylist()):
            c = Counter(TOKEN_RE.findall(text.lower()))
            for tok, cnt in c.items():
                ds_.append(did)
                ws_.append(wmap[tok])
                ns_.append(cnt)
        return pd.DataFrame(
            {
                "d": pd.Series(ds_, dtype="int64"),
                "w": pd.Series(ws_, dtype="int64"),
                "n": pd.Series(ns_, dtype="float64"),
            }
        )

    cell_ds = docs.map_batches(cells, batch_format="pyarrow").materialize()
    n_cells = cell_ds.count()
    phi = _plsa_init_phi(len(vocab), k)

    def _seal(arrs):
        d = np.concatenate([x[0] for x in arrs]) if arrs else np.empty(0, np.int64)
        w = np.concatenate([x[1] for x in arrs]) if arrs else np.empty(0, np.int64)
        n = np.concatenate([x[2] for x in arrs]) if arrs else np.empty(0, np.float64)
        order = np.lexsort((w, d))
        d, w, n = d[order], w[order], n[order]
        uniq = np.unique(d)
        pos = np.searchsorted(uniq, d)  # local doc index per cell
        theta = _plsa_init_theta(uniq, k)
        return pos, w, n, theta, len(uniq)

    if n_cells <= driver_row_budget:
        pdf = cell_ds.to_pandas()
        sh = (pdf["d"].to_numpy(np.int64) % _PLSA_SHARDS).astype(np.int64)
        state = []
        for s in range(_PLSA_SHARDS):
            g = pdf[sh == s]
            state.append(
                _seal(
                    [
                        (
                            g["d"].to_numpy(np.int64),
                            g["w"].to_numpy(np.int64),
                            g["n"].to_numpy(np.float64),
                        )
                    ]
                )
            )

        def round_partials(phi_cur):
            out = []
            for i, (pos, w, n, theta, nd) in enumerate(state):
                part, ll, tnew = _plsa_shard_step(pos, w, n, theta, phi_cur)
                state[i] = (pos, w, n, tnew, nd)
                out.append((part, ll, nd))
            return out

    else:  # pragma: no branch - forced via driver_row_budget=0 in tests

        @ray.remote(num_cpus=0)
        class CellShard:
            def __init__(self):
                self._parts = []
                self._state = None

            def add(self, d, w, n):
                self._parts.append((d, w, n))
                return len(d)

            def seal(self):
                self._state = _seal(self._parts)
                self._parts = None
                return self._state[4]

            def step(self, phi_cur):
                pos, w, n, theta, nd = self._state
                part, ll, tnew = _plsa_shard_step(pos, w, n, theta, phi_cur)
                self._state = (pos, w, n, tnew, nd)
                return part, ll, nd

        shards = [CellShard.remote() for _ in range(_PLSA_SHARDS)]

        def push(t: "pd.DataFrame") -> "pd.DataFrame":
            d = t["d"].to_numpy(np.int64)
            w = t["w"].to_numpy(np.int64)
            n = t["n"].to_numpy(np.float64)
            sh = d % _PLSA_SHARDS
            ray.get(
                [
                    shards[s].add.remote(d[sh == s], w[sh == s], n[sh == s])
                    for s in np.unique(sh)
                ]
            )
            return pd.DataFrame({"n": pd.Series([len(t)], dtype="int64")})

        cell_ds.map_batches(push, batch_format="pandas").materialize()
        ray.get([s.seal.remote() for s in shards])

        def round_partials(phi_cur):
            ref = ray.put(phi_cur)
            return ray.get([s.step.remote(ref) for s in shards])

    rows = []
    n_docs = None
    for it in range(iters):
        parts = round_partials(phi)
        ll = 0.0
        for p_, l_, _nd in parts:  # shard order: fixed
            ll += l_
        if n_docs is None:
            n_docs = sum(x[2] for x in parts)
        phi = np.add.reduce([x[0] for x in parts])
        phi = phi / phi.sum(axis=1, keepdims=True)
        rows.append(
            {
                "iteration": it + 1,
                "n_docs": n_docs,
                "n_vocab": len(vocab),
                "n_cells": n_cells,
                "loglik_u6": int(np.floor(ll * 1e6)),
            }
        )
    import pandas as pd  # noqa: F811

    out = pd.DataFrame(rows)
    return pa.table(
        {
            c: pa.array(out[c].to_numpy(np.int64))
            for c in ("iteration", "n_docs", "n_vocab", "n_cells", "loglik_u6")
        }
    )


# -- split-conformal prediction intervals ------------------------------------


def conformal_value_bounds(sf_dir: str) -> "object":
    """Split-conformal prediction interval per event type (Vovk/Lei-style
    uncertainty quantification, the missing companion to the point
    predictors): events split md5(event_id) % 2 into train (0) / calib
    (1); the predictor is the floored per-type train mean (cents), the
    conformal radius is the EXACT q90 order statistic of absolute calib
    residuals (rank k = 9*(n-1)//10, 0-based ascending — the repo's
    lower-order-statistic convention), and the emitted interval is
    pred ± q90.  Two streaming passes: a bounded per-type moment fold,
    then a (type, residual) counting-histogram fold — bounded by the
    value DOMAIN in cents, never the corpus (for an unbounded domain the
    two-pass coarse/fine pattern of ``sketches.daily_value_median``
    drops in).  Output: (event_type, n_train, n_calib, pred_c, q90_c,
    lo_c, hi_c) — all exact integers, hash-matching the oracle's
    ROW_NUMBER replay."""
    import hashlib

    import pandas as pd

    from ray.data.aggregate import Sum

    ds = read_small_aware(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def _half(ids) -> "pa.Array":
        return pa.array(
            [
                int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2
                for i in ids.to_pylist()
            ],
            pa.int64(),
        )

    def train_moments(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        mask = pc.equal(_half(t["event_id"]), 0)
        sub = pa.table(
            {"e": t["event_type"], "n": pa.array([1] * len(t), pa.int64()),
             "s": cents}
        ).filter(mask)
        return pa.TableGroupBy(sub, "e").aggregate([("n", "sum"), ("s", "sum")])

    tr = (
        ds.map_batches(train_moments, batch_format="pyarrow")
        .groupby("e")
        .aggregate(Sum("n_sum", alias_name="n"), Sum("s_sum", alias_name="s"))
        .to_pandas()  # O(|types|)
    )
    pred = {r.e: int(r.s) // int(r.n) for r in tr.itertuples()}
    n_train = {r.e: int(r.n) for r in tr.itertuples()}

    def calib_hist(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        mask = pc.equal(_half(t["event_id"]), 1)
        sub = pa.table({"e": t["event_type"], "c": cents}).filter(mask)
        p = pa.array([pred.get(e, 0) for e in sub["e"].to_pylist()], pa.int64())
        folded = pa.table(
            {"e": sub["e"], "r": pc.abs(pc.subtract(sub["c"], p)),
             "n": pa.array([1] * len(sub), pa.int64())}
        )
        return pa.TableGroupBy(folded, ["e", "r"]).aggregate([("n", "sum")])

    h = (
        ds.map_batches(calib_hist, batch_format="pyarrow")
        .groupby(["e", "r"])
        .aggregate(Sum("n_sum", alias_name="n"))
        .to_pandas()  # <= |types| x |value domain| rows
    )
    rows = []
    for e, sub in h.groupby("e"):
        sub = sub.sort_values("r")
        n_cal = int(sub["n"].sum())
        k = 9 * (n_cal - 1) // 10
        cum = 0
        q90 = 0
        for r_, c_ in zip(sub["r"], sub["n"]):
            cum += int(c_)
            if cum > k:
                q90 = int(r_)
                break
        p = pred.get(e, 0)
        rows.append(
            {
                "event_type": e,
                "n_train": n_train.get(e, 0),
                "n_calib": n_cal,
                "pred_c": p,
                "q90_c": q90,
                "lo_c": p - q90,
                "hi_c": p + q90,
            }
        )
    out = pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
    for c in ("n_train", "n_calib", "pred_c", "q90_c", "lo_c", "hi_c"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


CONFORMAL_VALUE_BOUNDS_SQL = """
WITH x AS (
  SELECT event_type AS e,
         CAST(ROUND(value * 100) AS BIGINT) AS c,
         CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 2 AS h
  FROM events
), tr AS (
  SELECT e, COUNT(*) AS n_train, SUM(c) // COUNT(*) AS pred
  FROM x WHERE h = 0 GROUP BY e
), cal AS (
  SELECT x.e, ABS(x.c - tr.pred) AS r, tr.n_train, tr.pred
  FROM x JOIN tr ON x.e = tr.e WHERE x.h = 1
), rk AS (
  SELECT e, r, n_train, pred,
         ROW_NUMBER() OVER (PARTITION BY e ORDER BY r) - 1 AS i,
         COUNT(*) OVER (PARTITION BY e) AS n_calib
  FROM cal
)
SELECT e AS event_type,
       CAST(n_train AS BIGINT) AS n_train,
       CAST(n_calib AS BIGINT) AS n_calib,
       CAST(pred AS BIGINT) AS pred_c,
       CAST(r AS BIGINT) AS q90_c,
       CAST(pred - r AS BIGINT) AS lo_c,
       CAST(pred + r AS BIGINT) AS hi_c
FROM rk WHERE i = 9 * (n_calib - 1) // 10
ORDER BY e
"""


# -- k-fold cross-validated MSE of the per-type mean predictor ----------------


def cv_mse_by_type(sf_dir: str) -> "object":
    """5-fold CROSS-VALIDATED mean-squared-error of the per-type mean
    value predictor (the model-evaluation primitive: every other
    predictor in the engine should beat this held-out baseline): folds
    are ``md5(event_id) % 5``, fold f's prediction is the FLOORED mean of
    the other folds' cents, and the held-out SSE expands exactly from
    the same (type, fold) moments — sse_f = s2_f - 2*pred*s_f +
    n_f*pred^2, so ONE bounded (type, fold) moment fold carries the
    whole evaluation, no second pass.  All arithmetic exact ints
    (Python / HUGEINT).  Output: (event_type, n, mse_milli) with
    mse_milli = floor(1000 * sse_total / n)."""
    import hashlib

    import pandas as pd

    from ray.data.aggregate import Sum

    ds = read_small_aware(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def moments(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        f = pa.array(
            [
                int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 5
                for i in t["event_id"].to_pylist()
            ],
            pa.int64(),
        )
        folded = pa.table(
            {"e": t["event_type"], "f": f,
             "n": pa.array([1] * len(t), pa.int64()),
             "s": cents, "s2": pc.multiply(cents, cents)}
        )
        return pa.TableGroupBy(folded, ["e", "f"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("s2", "sum")]
        )

    m = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby(["e", "f"])
        .aggregate(Sum("n_sum", alias_name="n"), Sum("s_sum", alias_name="s"),
                   Sum("s2_sum", alias_name="s2"))
        .to_pandas()  # <= |types| x 5 rows
    )
    rows = []
    for e, sub in m.groupby("e"):
        N = int(sub["n"].sum())
        S = int(sub["s"].sum())
        sse = 0
        for r in sub.itertuples():
            n_f, s_f, s2_f = int(r.n), int(r.s), int(r.s2)
            if N == n_f:
                continue
            pred = (S - s_f) // (N - n_f)
            sse += s2_f - 2 * pred * s_f + n_f * pred * pred
        rows.append(
            {"event_type": e, "n": N, "mse_milli": (1000 * sse) // N}
        )
    out = pd.DataFrame(sorted(rows, key=lambda r: r["event_type"]))
    for c in ("n", "mse_milli"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


CV_MSE_BY_TYPE_SQL = """
WITH x AS (
  SELECT event_type AS e,
         CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 5 AS f,
         CAST(CAST(ROUND(value * 100) AS BIGINT) AS HUGEINT) AS c
  FROM events
), cells AS (
  SELECT e, f, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS s2
  FROM x GROUP BY e, f
), tot AS (
  SELECT e, f, n, s, s2,
         SUM(n) OVER (PARTITION BY e) AS nn,
         SUM(s) OVER (PARTITION BY e) AS ss
  FROM cells
), sse AS (
  SELECT e, nn,
         SUM(s2 - 2 * ((ss - s) // (nn - n)) * s
                + n * ((ss - s) // (nn - n)) * ((ss - s) // (nn - n))) AS t
  FROM tot WHERE nn > n GROUP BY e, nn
)
SELECT e AS event_type, CAST(nn AS BIGINT) AS n,
       CAST((1000 * t) // nn AS BIGINT) AS mse_milli
FROM sse ORDER BY e
"""
