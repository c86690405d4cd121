"""events_prior_window semantics vs an O(n^2) brute force on a synthetic
stream with planted edge cases: simultaneous events (excluded both ways),
exact window-boundary events (included), cross-user isolation."""

import numpy as np
import pandas as pd

from indu_doc_transformer_ray.functions.events import events_prior_window

HOUR_US = 3_600 * 1_000_000


def test_events_prior_window_matches_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    n = 240
    base = pd.Timestamp("2025-03-01").value // 1000  # us
    ts_us = base + rng.integers(0, 6 * HOUR_US, n)
    # planted: two simultaneous events for user 0, one exactly 1h apart
    ts_us[0] = ts_us[1] = base + HOUR_US
    ts_us[2] = base + 2 * HOUR_US  # window [base+1h, base+2h): includes both
    user = rng.integers(0, 9, n)
    user[:3] = 0
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.to_datetime(ts_us, unit="us"),
            "user_id": user.astype("int64"),
            "event_type": "click",
            "value": 0.0,
            "props": "",
        }
    )
    df.to_parquet(tmp_path / "events.parquet")

    got = (
        events_prior_window(str(tmp_path))
        .to_pandas()
        .set_index("event_id")["n_prior_1h"]
    )

    t = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    for i in range(n):
        want = int(
            (
                (user == user[i]) & (t >= t[i] - HOUR_US) & (t < t[i])
            ).sum()
        )
        assert got[i] == want, (i, got[i], want)
    # the planted boundary event sees both simultaneous events at exactly
    # ts-1h (left edge inclusive), plus any random user-0 events in between
    assert got[2] >= 2
    # simultaneous events never count each other
    assert got[0] == got[1]


def test_session_overlap_matches_bruteforce(ray_session, tmp_path):
    """session_overlap's rank-identity + bucketed prefix scan vs an O(n^2)
    interval check, with planted edge cases: zero-length sessions (single
    events), exact-boundary touching intervals (closed-interval overlap),
    and a long session spanning many time buckets."""
    from indu_doc_transformer_ray.functions.events import (
        SESSION_GAP_US,
        session_overlap,
    )

    rng = np.random.default_rng(11)
    n = 300
    base = pd.Timestamp("2025-05-01").value // 1000
    ts_us = base + rng.integers(0, 48 * HOUR_US, n).astype("int64")
    user = rng.integers(0, 12, n).astype("int64")
    # planted: a long session for user 0 spanning most of the range (events
    # every 20 min keep one session alive across every time bucket)
    n_long = 60
    ts_us[:n_long] = base + np.arange(n_long, dtype="int64") * (20 * 60 * 1_000_000)
    user[:n_long] = 0
    # planted: two single-event sessions at the same instant (zero-length
    # intervals overlap each other exactly at a point)
    ts_us[n_long] = ts_us[n_long + 1] = base + 47 * HOUR_US
    user[n_long] = 1
    user[n_long + 1] = 2
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.to_datetime(ts_us, unit="us"),
            "user_id": user,
            "event_type": "click",
            "value": 0.0,
            "props": "",
        }
    )
    df.to_parquet(tmp_path / "events.parquet")

    got = session_overlap(str(tmp_path)).to_pandas()

    # brute force: build sessions, then O(n^2) closed-interval overlap
    d = df.sort_values(["user_id", "ts", "event_id"])
    t = d["ts"].astype("datetime64[us]").astype("int64")
    same = d["user_id"].eq(d["user_id"].shift())
    sid = ((t.diff() > SESSION_GAP_US) & same | ~same).cumsum()
    sess = (
        pd.DataFrame({"user_id": d["user_id"].values, "sid": sid.values,
                      "t": t.values})
        .groupby(["user_id", "sid"])["t"].agg(["min", "max"]).reset_index()
    )
    sess["sess_n"] = sess.groupby("user_id").cumcount() + 1
    s, e = sess["min"].values, sess["max"].values
    want = []
    for i in range(len(sess)):
        cnt = int(((s <= e[i]) & (e >= s[i])).sum()) - 1
        want.append((int(sess["user_id"].iloc[i]),
                     int(sess["sess_n"].iloc[i]), cnt))
    want_df = (
        pd.DataFrame(want, columns=["user_id", "sess_n", "n_overlap"])
        .sort_values(["user_id", "sess_n"]).reset_index(drop=True)
    )
    got = got.sort_values(["user_id", "sess_n"]).reset_index(drop=True)
    assert got["n_overlap"].astype("int64").tolist() == \
        want_df["n_overlap"].tolist()
    assert len(got) == len(want_df)
    # the planted point-coincident sessions must see each other: for users
    # 1 and 2, the session containing the planted instant has overlap >= 1
    inst = int(ts_us[n_long])
    for u in (1, 2):
        su = sess[(sess.user_id == u) & (sess["min"] <= inst)
                  & (sess["max"] >= inst)]
        assert len(su) == 1
        sn = int(su["sess_n"].iloc[0])
        row = got[(got.user_id == u) & (got.sess_n == sn)]
        assert int(row["n_overlap"].iloc[0]) >= 1


def test_cusum_drift_matches_sequential_recurrence(ray_session, tmp_path):
    """The distributed prefix-scan identity must equal the literal
    sequential CUSUM recurrence s_t = max(0, s_{t-1} + d_t) — including
    planted drift bursts that span day-bucket boundaries (the hierarchical
    hand-off is exactly what the identity must survive)."""
    import numpy as np
    import pandas as pd

    from indu_doc_transformer_ray.functions.events import (
        _CUSUM_H_C2,
        _CUSUM_K_C2,
        cusum_drift,
    )

    rng = np.random.default_rng(23)
    n = 5_000
    base = pd.to_datetime("2024-05-01")
    ts = base + pd.to_timedelta(np.sort(rng.integers(0, 10 * 86_400, n)), unit="s")
    value = rng.uniform(0.0, 100.0, n).round(2)
    # planted drift: a burst of high values straddling a midnight boundary
    burst = (ts > base + pd.Timedelta("2 days 22:00:00")) & (
        ts < base + pd.Timedelta("3 days 02:00:00")
    )
    value[burst] = rng.uniform(300.0, 500.0, int(burst.sum())).round(2)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Series(ts).astype("datetime64[us]"),
            "event_type": rng.choice(["click", "view"], size=n),
            "user_id": rng.integers(1, 40, n).astype(np.int64),
            "value": value,
        }
    )
    df.to_parquet(tmp_path / "events.parquet")

    got = cusum_drift(str(tmp_path)).set_index("event_type")

    for et, g in df.sort_values(["ts", "event_id"]).groupby("event_type"):
        s = 0
        alarms = 0
        max_s = 0
        for v in g["value"]:
            s = max(0, s + int(round(v * 100)) - _CUSUM_K_C2)
            alarms += s > _CUSUM_H_C2
            max_s = max(max_s, s)
        assert int(got.loc[et, "n_events"]) == len(g)
        assert int(got.loc[et, "n_alarms"]) == alarms, et
        assert int(got.loc[et, "max_cusum_c2"]) == max_s, et
    assert (got["n_alarms"] > 0).any()  # the planted drift actually fired


def test_fold_carry_rows_associative():
    """The superbucket fold (peak_concurrency / session_overlap round-5
    hierarchy) must compose exactly: folding segment summaries of ANY
    partition of the bucket sequence equals the flat fold."""
    import numpy as np
    import pandas as pd

    from indu_doc_transformer_ray.functions.events_series import (
        _fold_carry_rows,
    )

    rng = np.random.RandomState(7)
    n = 257
    df = pd.DataFrame(
        {
            "tb": np.arange(n),
            "total": rng.randint(-5, 6, n).astype(np.int64),
            "max_prefix": rng.randint(-3, 8, n).astype(np.int64),
            "n_at_max": rng.randint(1, 4, n).astype(np.int64),
            "first_t": rng.randint(0, 10**9, n).astype(np.int64),
        }
    )
    flat = _fold_carry_rows(df)
    for width in (1, 2, 7, 16, 100, 257, 1000):
        segs = [
            _fold_carry_rows(df.iloc[i : i + width])
            for i in range(0, n, width)
        ]
        two = _fold_carry_rows(
            pd.DataFrame(
                segs, columns=["total", "max_prefix", "n_at_max", "first_t"]
            )
        )
        assert two == flat, width
