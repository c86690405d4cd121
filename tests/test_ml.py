"""ml.py gates: exact-AUC equality vs a naive pairwise reference and the
DuckDB window oracle; distributed IRLS equality vs a single-process fit."""

import numpy as np
import pandas as pd
import pytest

from indu_doc_transformer_ray.functions import ml

SF = "/root/testdata/sf0.001"


def test_auc_by_type_matches_naive_pairwise(ray_session):
    out = ml.auc_by_type(SF).to_pandas().set_index("event_type")

    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    v = np.floor(ev["value"].to_numpy() * 100).astype(np.int64)
    types = sorted(ev["event_type"].unique())
    assert list(out.index) == types
    for cls in types:
        yp = (ev["event_type"] == cls).to_numpy()
        pv, nv = v[yp], v[~yp]
        # O(P*N) literal Mann-Whitney count — only viable at sf0.001
        num2 = int(2 * (pv[:, None] > nv[None, :]).sum() + (pv[:, None] == nv[None, :]).sum())
        row = out.loc[cls]
        assert int(row["auc_num2"]) == num2
        assert int(row["n_pos"]) == len(pv) and int(row["n_neg"]) == len(nv)
        assert int(row["auc_bp"]) == (10_000 * num2) // (2 * len(pv) * len(nv))


def test_auc_by_type_matches_duckdb_oracle(ray_session):
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    oracle = con.sql(ml.AUC_BY_TYPE_SQL).df()
    got = ml.auc_by_type(SF).to_pandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        oracle.astype(got.dtypes.to_dict()).reset_index(drop=True),
    )


def _reference_irls(sf_dir: str, iters: int) -> np.ndarray:
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.hstack(
        [np.ones((len(df), 1)), np.stack(df["embedding"].to_numpy()).astype(np.float64)]
    )
    y = (df["label"].to_numpy().astype(np.int64) & 1).astype(np.float64)
    b = np.zeros(X.shape[1])
    for _ in range(iters):
        z = np.clip(X @ b, -30.0, 30.0)
        p = 1.0 / (1.0 + np.exp(-z))
        g = X.T @ (y - p)
        H = (X * (p * (1.0 - p))[:, None]).T @ X
        H[np.diag_indices(len(b))] += ml._LR_RIDGE
        b = b + np.linalg.solve(H, g)
    return b


def test_logreg_fit_matches_single_process(ray_session):
    beta = ml._logreg_fit(SF, iters=3)
    ref = _reference_irls(SF, iters=3)
    # distributed partials differ from one global matmul only by float
    # summation grouping; the sorted-order folds keep that at epsilon scale
    assert np.allclose(beta, ref, rtol=1e-8, atol=1e-10)


def test_logreg_train_confusion_counts(ray_session):
    out = ml.logreg_train(SF).to_pandas()
    assert list(out["y"]) == [0, 1]
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.hstack(
        [np.ones((len(df), 1)), np.stack(df["embedding"].to_numpy()).astype(np.float64)]
    )
    y = df["label"].to_numpy().astype(np.int64) & 1
    pred = (X @ _reference_irls(SF, iters=ml._LR_ITERS) > 0.0).astype(np.int64)
    for cls in (0, 1):
        m = y == cls
        row = out[out["y"] == cls].iloc[0]
        assert int(row["n"]) == int(m.sum())
        assert int(row["n_correct"]) == int((pred[m] == cls).sum())
        assert int(row["accuracy_bp"]) == (10_000 * int(row["n_correct"])) // int(row["n"])


def test_calibration_bins_matches_single_process(ray_session):
    out = ml.calibration_bins(SF).to_pandas()
    beta = _reference_irls(SF, iters=ml._LR_ITERS)
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.hstack(
        [np.ones((len(df), 1)), np.stack(df["embedding"].to_numpy()).astype(np.float64)]
    )
    y = df["label"].to_numpy().astype(np.int64) & 1
    p = 1.0 / (1.0 + np.exp(-np.clip(X @ beta, -30.0, 30.0)))
    b = np.minimum((p * 10).astype(np.int64), 9)
    conf = np.floor(p * 1_000_000).astype(np.int64)
    assert (out["n"].sum()) == len(df)
    for _, row in out.iterrows():
        m = b == row["bin"]
        assert int(row["n"]) == int(m.sum())
        assert int(row["n_pos"]) == int(y[m].sum())
        assert int(row["avg_conf_bp"]) == int(conf[m].sum()) // (100 * int(m.sum()))
        assert int(row["pos_rate_bp"]) == (10_000 * int(y[m].sum())) // int(m.sum())
    # every non-empty bin present
    assert set(out["bin"]) == set(np.unique(b).tolist())


def _reference_bt(sf_dir=SF, iters=None):
    iters = iters or ml._BT_ITERS
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )
    li["u"] = np.floor(li["l_extendedprice"] / li["l_quantity"] * 1e6).astype(np.int64)
    best = li.groupby(["l_partkey", "l_suppkey"])["u"].min().reset_index()
    m = best.merge(best, on="l_partkey", suffixes=("_a", "_b"))
    m = m[(m["l_suppkey_a"] < m["l_suppkey_b"]) & (m["u_a"] != m["u_b"])]
    m["w"] = (m["u_a"] < m["u_b"]).astype(np.int64)
    pt = (
        m.groupby(["l_suppkey_a", "l_suppkey_b"])
        .agg(n=("w", "size"), w_lo=("w", "sum"))
        .reset_index()
        .sort_values(["l_suppkey_a", "l_suppkey_b"])
    )
    sup = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    n_sup = int(sup["s_suppkey"].max()) + 1
    lo = pt["l_suppkey_a"].to_numpy(np.int64)
    hi = pt["l_suppkey_b"].to_numpy(np.int64)
    gamma, wins = ml._bt_mm(
        lo, hi, pt["n"].to_numpy(np.int64), pt["w_lo"].to_numpy(np.int64), n_sup, iters
    )
    games = np.zeros(n_sup, dtype=np.int64)
    np.add.at(games, lo, pt["n"].to_numpy(np.int64))
    np.add.at(games, hi, pt["n"].to_numpy(np.int64))
    return gamma, wins, games


def test_bt_pair_table_matches_single_process(ray_session):
    got = (
        ml._bt_pair_table(SF)
        .to_pandas()
        .sort_values(["lo", "hi"])
        .reset_index(drop=True)[["lo", "hi", "n", "w_lo"]]
    )
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )
    li["u"] = np.floor(li["l_extendedprice"] / li["l_quantity"] * 1e6).astype(np.int64)
    best = li.groupby(["l_partkey", "l_suppkey"])["u"].min().reset_index()
    m = best.merge(best, on="l_partkey", suffixes=("_a", "_b"))
    m = m[(m["l_suppkey_a"] < m["l_suppkey_b"]) & (m["u_a"] != m["u_b"])]
    m["w"] = (m["u_a"] < m["u_b"]).astype(np.int64)
    ref = (
        m.groupby(["l_suppkey_a", "l_suppkey_b"])
        .agg(n=("w", "size"), w_lo=("w", "sum"))
        .reset_index()
        .rename(columns={"l_suppkey_a": "lo", "l_suppkey_b": "hi"})
        .astype({"lo": "int64", "hi": "int64", "n": "int64", "w_lo": "int64"})
        .sort_values(["lo", "hi"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)


def test_bt_strengths_match_single_process(ray_session):
    out = ml.bt_supplier_strengths(SF).to_pandas()
    gamma, wins, games = _reference_bt()
    for _, r in out.iterrows():
        k = int(r["s_suppkey"])
        assert int(r["games"]) == int(games[k])
        assert int(r["wins"]) == int(wins[k])
        # same fold order on both sides -> identical floats
        assert int(r["strength_e6"]) == int(np.floor(gamma[k] * 1e6))


def test_bt_actor_path_equals_driver_escape(ray_session):
    esc = ml.bt_supplier_strengths(SF).to_pandas()
    act = ml.bt_supplier_strengths(SF, driver_pair_budget=0).to_pandas()
    # integer outcome columns are exact across paths; strengths may differ
    # by float summation grouping only (per-shard vs global order)
    pd.testing.assert_frame_equal(
        esc[["s_suppkey", "games", "wins"]], act[["s_suppkey", "games", "wins"]]
    )
    assert (np.abs(esc["strength_e6"] - act["strength_e6"]) <= 1).all()


def _reference_als_ratings():
    """Single-process (c, p, r) ratings straight off the parquet files."""
    import pyarrow.parquet as pq

    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    ).to_pandas()
    o = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    return (
        m.groupby(["o_custkey", "l_partkey"], sort=True)["l_quantity"]
        .sum()
        .reset_index()
        .rename(columns={"o_custkey": "c", "l_partkey": "p", "l_quantity": "r"})
        .astype({"c": "int64", "p": "int64", "r": "int64"})
    )


def test_als_ratings_match_single_process(ray_session):
    got = (
        ml._als_ratings(SF)
        .to_pandas()[["c", "p", "r"]]
        .sort_values(["c", "p"])
        .reset_index(drop=True)
        .astype({"c": "int64", "p": "int64", "r": "int64"})
    )
    pd.testing.assert_frame_equal(got, _reference_als_ratings())


def test_als_fit_matches_single_process(ray_session):
    """Full bit-equality: the distributed fit must reproduce a from-scratch
    single-process ALS that uses the same shard layout / fold order."""
    import pyarrow.parquet as pq

    pdf = _reference_als_ratings()
    n_items = (
        int(
            pq.read_table(f"{SF}/part.parquet", columns=["p_partkey"])[
                "p_partkey"
            ].combine_chunks().to_numpy().max()
        )
        + 1
    )
    Y = ml._als_init_y(n_items)
    sh = pdf["c"].to_numpy(np.int64) % ml._ALS_SHARDS
    shard_rows = []
    for s in range(ml._ALS_SHARDS):
        g = pdf[sh == s].sort_values(["c", "p"])
        shard_rows.append(
            (g["c"].to_numpy(np.int64), g["p"].to_numpy(np.int64),
             g["r"].to_numpy(np.float64))
        )
    want = []
    for _ in range(ml._ALS_ITERS):
        parts = [ml._als_shard_step(c, p, r, Y) for c, p, r in shard_rows]
        A = np.add.reduce([x[0] for x in parts]) + ml._ALS_LAM * np.eye(ml._ALS_K)
        B = np.add.reduce([x[1] for x in parts])
        sse = sum(x[2] for x in parts)
        Y = np.linalg.solve(A, B)
        want.append(int(np.floor(1e6 * sse / len(pdf))))

    got = ml.als_factorize(SF).to_pandas()
    assert got["mse_u6"].tolist() == want
    assert (got["n_ratings"] == len(pdf)).all()


def test_als_actor_path_equals_driver_escape(ray_session):
    esc = ml.als_factorize(SF).to_pandas()
    act = ml.als_factorize(SF, driver_row_budget=0).to_pandas()
    # fixed shard count + order-fixed folds: BIT-equal across paths
    pd.testing.assert_frame_equal(esc, act)


def test_als_converges(ray_session):
    out = ml.als_factorize(SF).to_pandas()
    assert out["mse_u6"].iloc[-1] < out["mse_u6"].iloc[0] // 2


def test_plsa_em_monotone_and_paths_equal(ray_session):
    """EM guarantee: the PLSA log-likelihood is non-decreasing across
    iterations; and the pinned-actor path is BIT-equal to the driver
    escape (reduction order is a pure function of the data)."""
    from indu_doc_transformer_ray.functions import ml

    drv = ml.plsa_topics(SF).to_pandas()
    act = ml.plsa_topics(SF, driver_row_budget=0).to_pandas()
    assert drv.equals(act)
    ll = drv.sort_values("iteration")["loglik_u6"]
    assert ll.is_monotonic_increasing
    assert (drv["n_vocab"] > 0).all() and (drv["n_cells"] > 0).all()
