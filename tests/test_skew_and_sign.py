"""Round-4 hardening tests:

- constant-value skew in the histogram-rank family: a near-constant price
  distribution collapses every row into ONE counting bucket; the salted
  path must subdivide by the tie-break key and stay hash-identical to the
  SQL oracle (round-3 verdict #4);
- signed-value binning: Arrow's ``pc.divide`` truncates toward zero while
  the pandas fine-pass ``//`` and the DuckDB ``//`` oracles FLOOR — for
  negative values the two disagree (trunc(-5/4096)=0 vs floor=-1), silently
  dropping rows from the straddling bucket (ADVICE round 3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _compare_vs_oracle(got, con, sql, name):
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = con.execute(sql).df()
    assert sorted(got.columns) == sorted(want.columns), name
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(w), (name, len(g), len(w))
    for c in cols:
        assert (g[c].astype(str).values == w[c].astype(str).values).all(), (
            name, c,
        )


def test_global_price_rank_constant_value_salted(ray_session, monkeypatch, tmp_path):
    """300 orders all at the SAME price (one histogram bucket) with the
    task bound forced tiny: the salted (value, orderkey-range) path must
    produce exactly the oracle's ROW_NUMBER — contiguous, unique, ordered
    by the tie-break key."""
    import duckdb

    from indu_doc_transformer_ray.functions import windows

    rng = np.random.default_rng(7)
    n = 300
    # orderkeys spread across many 4096-wide ranges so the salt actually
    # subdivides; a handful of rows at other prices keep mixed buckets alive
    keys = rng.choice(np.arange(1, 400_000), size=n, replace=False)
    df = pd.DataFrame(
        {
            "o_orderkey": np.sort(keys),
            "o_totalprice": [123.45] * (n - 20)
            + [50.0] * 10
            + [99_999.99] * 10,
        }
    )
    df.to_parquet(tmp_path / "orders.parquet")

    monkeypatch.setattr(windows, "RANK_TASK_BOUND", 32)
    got = windows.global_price_rank(str(tmp_path))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet'"
    )
    _compare_vs_oracle(got, con, windows.GLOBAL_PRICE_RANK_SQL,
                       "global_price_rank")


def test_global_price_rank_normal_path_unchanged(ray_session, tmp_path):
    """Same input through the default bound (no bucket over-full): the
    unsalted path still matches the oracle."""
    import duckdb

    from indu_doc_transformer_ray.functions import windows

    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, 101, dtype=np.int64),
            "o_totalprice": np.linspace(10.0, 5000.0, 100).round(2),
        }
    )
    df.to_parquet(tmp_path / "orders.parquet")
    got = windows.global_price_rank(str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet'"
    )
    _compare_vs_oracle(got, con, windows.GLOBAL_PRICE_RANK_SQL,
                       "global_price_rank_normal")


def test_signed_value_binning_matches_oracle(ray_session, tmp_path):
    """Histogram-binned ops over a corpus with NEGATIVE values: the Arrow
    floor-bucket must agree with the pandas fine-pass and the DuckDB //
    oracle on both sides of zero (value_histogram, mad_outliers,
    daily_value_median)."""
    import duckdb

    from indu_doc_transformer_ray.functions import events as ev
    from indu_doc_transformer_ray.functions import sketches as sk

    rng = np.random.default_rng(11)
    n = 2_000
    ts = pd.to_datetime("2024-03-01") + pd.to_timedelta(
        rng.integers(0, 14 * 86_400, size=n), unit="s"
    )
    # values straddle zero, with mass concentrated near the -4096..4096 cent
    # straddling bucket where trunc and floor disagree
    value = np.round(rng.normal(0.0, 60.0, size=n), 2)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts.astype("datetime64[us]"),
            "event_type": rng.choice(["click", "view", "error"], size=n),
            "user_id": rng.integers(1, 50, size=n).astype(np.int64),
            "value": value,
        }
    )
    df.to_parquet(tmp_path / "events.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    _compare_vs_oracle(
        ev.value_histogram(str(tmp_path)), con, ev.VALUE_HISTOGRAM_SQL,
        "value_histogram",
    )
    _compare_vs_oracle(
        sk.mad_outliers(str(tmp_path)), con, sk.MAD_OUTLIERS_SQL,
        "mad_outliers",
    )
    _compare_vs_oracle(
        sk.daily_value_median(str(tmp_path)), con, sk.DAILY_VALUE_MEDIAN_SQL,
        "daily_value_median",
    )


def test_floor_bucket_kernel():
    """_floor_bucket == python floor division on both signs, at width
    boundaries, and far outside float64's exact-integer range."""
    import pyarrow.compute as pc

    from indu_doc_transformer_ray.functions.sketches import _floor_bucket

    vals = [0, 1, -1, 4095, 4096, 4097, -4095, -4096, -4097,
            2**60 + 12345, -(2**60) - 12345]
    arr = pa.array(vals, pa.int64())
    got = _floor_bucket(arr, 4096).to_pylist()
    assert got == [v // 4096 for v in vals]


def test_gini_by_status_constant_value(ray_session, tmp_path):
    """Gini with a near-constant price distribution: every row lands in
    ONE histogram bucket, but the count-based kernel's per-task rows are
    bounded by DISTINCT VALUES per 4096-cent bucket (not corpus rows), so
    unlike the row-shuffling rank ops no salting is needed — the run
    formula v·(a·c + c(c+1)/2) must handle the giant equal-value run
    exactly."""
    import duckdb

    from indu_doc_transformer_ray.functions import windows

    rng = np.random.default_rng(11)
    n = 300
    keys = rng.choice(np.arange(1, 400_000), size=n, replace=False)
    df = pd.DataFrame(
        {
            "o_orderkey": np.sort(keys),
            "o_totalprice": [123.45] * (n - 20) + [50.0] * 10
            + [99_999.99] * 10,
            "o_orderstatus": ["F", "O", "P"] * 100,
        }
    )
    df.to_parquet(tmp_path / "orders.parquet")

    got = windows.gini_by_status(str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet'"
    )
    _compare_vs_oracle(got, con, windows.GINI_BY_STATUS_SQL,
                       "gini_by_status_salted")


def test_sorted_neighborhood_halo_and_salt(ray_session, monkeypatch, tmp_path):
    """Sorted-neighborhood blocking with BOTH guards forced: a tiny rank
    segment (so windows straddle many segment boundaries and the halo
    copies + native-high-rank dedup must be exact) and a tiny task bound
    over near-constant balances (so the salted (value, custkey-range)
    rank path runs).  Output must equal the oracle's window self-join."""
    import duckdb

    from indu_doc_transformer_ray.functions import dedup

    rng = np.random.default_rng(23)
    n = 600
    bal = np.where(rng.random(n) < 0.8, 123.45, rng.integers(1, 9999, n) / 100.0)
    df = pd.DataFrame(
        {
            "c_custkey": np.sort(rng.choice(np.arange(1, 500_000), n, replace=False)),
            "c_acctbal": np.round(bal, 2),
            "c_mktsegment": rng.choice(["A", "B", "C"], n),
        }
    )
    df.to_parquet(tmp_path / "customer.parquet")

    monkeypatch.setattr(dedup, "_SN_SEG", 64)
    monkeypatch.setattr(dedup, "SN_RANK_TASK_BOUND", 32)
    got = dedup.sorted_neighborhood_pairs(str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{tmp_path}/customer.parquet'"
    )
    _compare_vs_oracle(got, con, dedup.SORTED_NEIGHBORHOOD_SQL,
                       "sorted_neighborhood_halo_salt")


def test_peak_concurrency_degenerate_single_instant(ray_session, tmp_path):
    """Every event at the SAME microsecond (one time bucket, maximal tie
    mass): peak == #users, one peak time, oracle-equal."""
    import duckdb

    from indu_doc_transformer_ray.functions import events as E

    n = 200
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01 12:00:00.000123"] * n),
            "user_id": np.arange(n, dtype=np.int64) % 37,
            "event_type": ["click"] * n,
            "value": [1.0] * n,
            "props": ["{}"] * n,
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    got = E.peak_concurrency(str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    _compare_vs_oracle(got, con, E.PEAK_CONCURRENCY_SQL, "peak_concurrency")
    assert got["peak"].iloc[0] == 37
    assert got["n_peak_times"].iloc[0] == 1


def test_user_active_time_single_user_all_ties(ray_session, tmp_path):
    """One user, duplicate timestamps (zero gaps): union == exactly one
    window; oracle-equal under arbitrary tie order."""
    import duckdb

    from indu_doc_transformer_ray.functions import events as E

    n = 64
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01 00:00:00"] * n),
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": ["view"] * n,
            "value": [0.0] * n,
            "props": ["{}"] * n,
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    got = E.user_active_time(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    _compare_vs_oracle(got, con, E.USER_ACTIVE_TIME_SQL, "user_active_time")
    assert len(got) == 1
    assert got["active_us"].iloc[0] == E.ACTIVE_WINDOW_US


def test_rolling_wau_gap_exactly_seven_days(ray_session, tmp_path):
    """Active days exactly 7 apart: coverage intervals must NOT merge
    (windows are [d, d+7)), the classic off-by-one; oracle-equal."""
    import duckdb

    from indu_doc_transformer_ray.functions import events as E

    days = [0, 7, 14, 30]
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(days), dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(days, unit="D"),
            "user_id": np.zeros(len(days), dtype=np.int64),
            "event_type": ["view"] * len(days),
            "value": [0.0] * len(days),
            "props": ["{}"] * len(days),
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    got = E.rolling_wau_exact(str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    _compare_vs_oracle(got, con, E.ROLLING_WAU_SQL, "rolling_wau_exact")
    assert set(got["wau"]) == {0, 1}  # never 2: windows abut, don't overlap
