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
