"""Per-group winsorization vs a pandas reference; HLL rolling-WAU vs the
exact window plan (error bound + union monotonicity)."""
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_winsorized_matches_pandas_reference():
    from security_log_analysis_rust_ray.functions.util import round_half_up
    from security_log_analysis_rust_ray.pipelines.relational import (
        WINSOR_HI_P, WINSOR_LO_P, events_value_winsorized)
    got = events_value_winsorized(SF).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    want = []
    for t, g in ev.groupby("event_type"):
        g = g.sort_values(["value", "event_id"]).reset_index(drop=True)
        n = len(g)
        lo = g["value"].iat[int(np.floor(WINSOR_LO_P * (n - 1)))]
        hi = g["value"].iat[int(np.floor(WINSOR_HI_P * (n - 1)))]
        w = g["value"].clip(lo, hi)
        want.append(pd.DataFrame({"event_id": g["event_id"],
                                  "value_w": round_half_up(w.to_numpy(), 6)}))
    want = pd.concat(want).sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(want) == len(ev)
    np.testing.assert_array_equal(got["event_id"].to_numpy(),
                                  want["event_id"].to_numpy())
    np.testing.assert_array_equal(got["value_w"].to_numpy(),
                                  want["value_w"].to_numpy())
    # the clamp actually fired somewhere (sf0.001 has tail values)
    ev_s = ev.sort_values("event_id").reset_index(drop=True)
    assert (got["value_w"].to_numpy()
            != round_half_up(ev_s["value"].to_numpy(), 6)).any()


@pytest.mark.usefixtures("ray_session")
def test_rolling_wau_approx_tracks_exact():
    from security_log_analysis_rust_ray.pipelines.relational import (
        rolling_wau, rolling_wau_approx)
    approx = rolling_wau_approx(SF).to_pandas()
    exact = rolling_wau(SF).to_pandas()
    m = approx.merge(exact, on="day", how="outer")
    # same day coverage as the exact plan
    assert not m["wau_approx"].isna().any()
    assert not m["n_users"].isna().any()
    rel = (m["wau_approx"] - m["n_users"]).abs() / m["n_users"]
    assert rel.max() <= 0.08  # HLL p=12 typical error ~1.6%


@pytest.mark.usefixtures("ray_session")
def test_window_union_dominates_daily_sketches():
    """Register-max union can never estimate below any single merged day."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from security_log_analysis_rust_ray.pipelines.relational import (
        DAY_US, rolling_wau_approx)
    from security_log_analysis_rust_ray.sources.readers import read_table
    from security_log_analysis_rust_ray.stages.sketch import (
        grouped_distinct_registers, hll_estimate)
    ev = read_table(SF, "events", columns=["user_id", "ts"])

    def dayed(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b["ts"], pa.int64()), DAY_US)
        return pa.table({"day": day, "user_id": b["user_id"]})

    regs = grouped_distinct_registers(
        ev.map_batches(dayed, batch_format="pyarrow", batch_size=None),
        ["day"], "user_id")
    daily = {int(d.as_py()): hll_estimate(
        np.frombuffer(r.as_py(), dtype=np.uint8))
        for d, r in zip(regs["day"], regs["reg"])}
    win = rolling_wau_approx(SF).to_pandas().set_index("day")["wau_approx"]
    for d, est in win.items():
        floor_est = max(daily.get(w, 0.0) for w in range(d - 6, d + 1))
        assert est >= int(np.floor(floor_est)) - 1


@pytest.mark.usefixtures("ray_session")
def test_outliers_match_pandas_reference():
    from security_log_analysis_rust_ray.pipelines.relational import (
        IQR_FENCE_K, events_value_outliers)
    got = events_value_outliers(SF).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    flagged = []
    for t, g in ev.groupby("event_type"):
        g = g.sort_values(["value", "event_id"]).reset_index(drop=True)
        n = len(g)
        q1 = g["value"].iat[int(np.floor(0.25 * (n - 1)))]
        q3 = g["value"].iat[int(np.floor(0.75 * (n - 1)))]
        lo, hi = q1 - IQR_FENCE_K * (q3 - q1), q3 + IQR_FENCE_K * (q3 - q1)
        flagged.append(g[(g["value"] < lo) | (g["value"] > hi)])
    want = pd.concat(flagged).sort_values("event_id").reset_index(drop=True)
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert 0 < len(got) < len(ev)


@pytest.mark.usefixtures("ray_session")
def test_rolling_mean_rows_matches_pandas():
    from security_log_analysis_rust_ray.functions.util import round_half_up
    from security_log_analysis_rust_ray.pipelines.relational import (
        ROLLING_ROWS_W, user_rolling_mean_rows)
    got = user_rolling_mean_rows(SF).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"]) \
        .sort_values(["user_id", "ts", "event_id"])
    ref = ev.groupby("user_id")["value"] \
        .rolling(ROLLING_ROWS_W, min_periods=1).mean() \
        .reset_index(drop=True)
    want = ev.reset_index(drop=True)
    want["mean_5"] = round_half_up(ref.to_numpy(), 6)
    want = want.sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(want)
    np.testing.assert_allclose(got["mean_5"].to_numpy(),
                               want["mean_5"].to_numpy(), atol=2e-6)
