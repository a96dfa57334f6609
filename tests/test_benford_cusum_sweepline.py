"""Benford audit, daily CUSUM, and sweep-line max-concurrency vs pure
pandas/Python references (sf0.001)."""
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_benford_matches_reference():
    from security_log_analysis_rust_ray.functions.util import round_half_up
    from security_log_analysis_rust_ray.pipelines.relational import \
        events_benford_audit
    got = events_benford_audit(SF).to_pandas().sort_values("digit") \
        .reset_index(drop=True)
    v = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])["value"]
    iv = np.floor(v.to_numpy() * 100.0).astype(np.int64)
    iv = iv[iv > 0]
    first = np.array([int(str(x)[0]) for x in iv])
    cnt = pd.Series(first).value_counts().sort_index()
    assert got["digit"].tolist() == cnt.index.tolist()
    assert got["cnt"].tolist() == cnt.tolist()
    n = cnt.sum()
    np.testing.assert_array_equal(
        got["freq"].to_numpy(),
        round_half_up(cnt.to_numpy() / n, 6))
    # expected column is the Benford law itself
    np.testing.assert_array_equal(
        got["expected"].to_numpy(),
        round_half_up(np.log10(1 + 1 / cnt.index.to_numpy(dtype=float)), 6))


@pytest.mark.usefixtures("ray_session")
def test_cusum_matches_reference_and_resets():
    from security_log_analysis_rust_ray.functions.util import round_half_up
    from security_log_analysis_rust_ray.pipelines.relational import (
        CUSUM_SLACK_K, events_daily_cusum)
    got = events_daily_cusum(SF).to_pandas().sort_values("day") \
        .reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    daily = ev.groupby(ev["ts"].dt.floor("D")).size().sort_index()
    x = daily.to_numpy(dtype=float)
    mean = x.sum() / len(x)
    std = np.sqrt((x * x).sum() / len(x) - mean * mean)
    drift = mean + CUSUM_SLACK_K * std
    acc, ref = 0.0, []
    for xi in x:
        acc = max(0.0, acc + (xi - drift))
        ref.append(acc)
    assert got["cnt"].tolist() == daily.tolist()
    np.testing.assert_array_equal(got["cusum"].to_numpy(),
                                  round_half_up(np.array(ref), 4))
    assert (got["cusum"] >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_max_concurrency_matches_brute_force():
    from security_log_analysis_rust_ray.pipelines.streaming import (
        DAY_US, SESSION_GAP_S, events_max_concurrency)
    got = events_max_concurrency(SF).to_pandas().sort_values("day") \
        .reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_id", "ts"]) \
        .sort_values(["user_id", "ts", "event_id"])
    # sessions via the gap rule
    ts_us = ev["ts"].astype("int64").to_numpy()
    u = ev["user_id"].to_numpy()
    brk = np.r_[True, (u[1:] != u[:-1])
                | (np.diff(ts_us) > SESSION_GAP_S * 1_000_000)]
    sid = np.cumsum(brk)
    sess = pd.DataFrame({"u": u, "sid": sid, "ts": ts_us}) \
        .groupby(["u", "sid"])["ts"].agg(["min", "max"]).reset_index()
    # brute sweep: starts before ends at equal ts
    eps = sorted(
        [(r["min"], 0, 1) for _, r in sess.iterrows()]
        + [(r["max"], 1, -1) for _, r in sess.iterrows()])
    conc, per_day = 0, {}
    for ts, _, d in eps:
        conc += d
        day = ts // DAY_US
        per_day[day] = max(per_day.get(day, -10**9), conc)
    want = pd.DataFrame(sorted(per_day.items()),
                        columns=["day", "max_concurrent"])
    assert got["day"].tolist() == want["day"].tolist()
    assert got["max_concurrent"].tolist() == want["max_concurrent"].tolist()
    assert got["max_concurrent"].min() >= 1


@pytest.mark.usefixtures("ray_session")
def test_longest_streak_matches_reference():
    from security_log_analysis_rust_ray.pipelines.relational import (
        DAY_US, user_longest_streak)
    got = user_longest_streak(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    ev["day"] = ev["ts"].astype("int64") // DAY_US
    want = {}
    for u, g in ev.drop_duplicates(["user_id", "day"]).groupby("user_id"):
        days = sorted(g["day"])
        best = run = 1
        for a, b in zip(days, days[1:]):
            run = run + 1 if b - a == 1 else 1
            best = max(best, run)
        want[u] = best
    assert dict(zip(got["user_id"], got["longest_streak"])) == want


@pytest.mark.usefixtures("ray_session")
def test_seasonal_backtest_mae_consistent():
    from security_log_analysis_rust_ray.pipelines.relational import \
        events_seasonal_backtest
    got = events_seasonal_backtest(SF).to_pandas()
    assert len(got) > 0
    # one MAE value, equal to the mean of the per-day absolute errors
    assert got["mae"].nunique() == 1
    from security_log_analysis_rust_ray.functions.util import round_half_up
    assert got["mae"].iloc[0] == round_half_up(
        got["abs_err"].to_numpy(dtype=float).mean(), 6)
    assert (got["abs_err"] == (got["cnt"] - got["forecast"]).abs()).all()


@pytest.mark.usefixtures("ray_session")
def test_cvm_matches_scipy_style_reference():
    from security_log_analysis_rust_ray.pipelines.relational import (
        KS_TYPE_A, KS_TYPE_B, events_cvm_statistic)
    got = float(events_cvm_statistic(SF).to_pandas()["cvm"].iloc[0])
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    ev = ev[ev["event_type"].isin([KS_TYPE_A, KS_TYPE_B])] \
        .sort_values(["value", "event_id"]).reset_index(drop=True)
    ia = (ev["event_type"] == KS_TYPE_A).to_numpy().astype(np.int64)
    na, nb = ia.sum(), (1 - ia).sum()
    fa = np.cumsum(ia) / na
    fb = np.cumsum(1 - ia) / nb
    ref = na * nb / float(na + nb) ** 2 * ((fa - fb) ** 2).sum()
    assert abs(got - ref) < 1e-6
    assert got > 0


@pytest.mark.usefixtures("ray_session")
def test_bounce_rate_consistent_with_sessionize():
    from security_log_analysis_rust_ray.pipelines.streaming import (
        DAY_US, session_bounce_rate, sessionize)
    got = session_bounce_rate(SF).to_pandas()
    sess = sessionize(SF).to_pandas()
    sess["day"] = sess["session_start"].astype("int64") // DAY_US
    ref = sess.groupby("day").agg(
        sessions=("n_events", "size"),
        bounces=("n_events", lambda s: int((s == 1).sum())))
    m = got.set_index("day")
    assert m["sessions"].to_dict() == ref["sessions"].to_dict()
    assert m["bounces"].to_dict() == ref["bounces"].to_dict()
    assert ((got["bounce_rate"] >= 0) & (got["bounce_rate"] <= 1)).all()


@pytest.mark.usefixtures("ray_session")
def test_behavior_entropy_bounds_and_reference():
    from security_log_analysis_rust_ray.functions.util import round_half_up
    from security_log_analysis_rust_ray.pipelines.relational import \
        user_behavior_entropy
    got = user_behavior_entropy(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    for _, r in got.iterrows():
        c = ev[ev["user_id"] == r["user_id"]]["event_type"].value_counts()
        p = c.to_numpy(dtype=float) / c.sum()
        assert r["entropy"] == round_half_up(-(p * np.log(p)).sum(), 6)
        assert 0 <= r["entropy"] <= np.log(len(c)) + 1e-9
        assert r["n_events"] == c.sum()


@pytest.mark.usefixtures("ray_session")
def test_lag_correlation_reference_and_bounds():
    from security_log_analysis_rust_ray.pipelines.relational import (
        DAY_US, XCORR_MAX_LAG, events_daily_lag_correlation)
    got = events_daily_lag_correlation(SF).to_pandas()
    assert 0 < len(got) <= XCORR_MAX_LAG + 1
    assert ((got["r"] >= -1) & (got["r"] <= 1)).all()
    # lag 0 recomputed with numpy.corrcoef on the dense spine
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type"])
    ev["day"] = ev["ts"].astype("int64") // DAY_US
    full = np.arange(ev["day"].min(), ev["day"].max() + 1)
    c = ev[ev["event_type"] == "click"]["day"].value_counts() \
        .reindex(full, fill_value=0).to_numpy(dtype=float)
    p = ev[ev["event_type"] == "purchase"]["day"].value_counts() \
        .reindex(full, fill_value=0).to_numpy(dtype=float)
    r0 = float(np.corrcoef(c, p)[0, 1])
    assert abs(float(got.set_index("lag").loc[0, "r"]) - r0) < 1e-6


@pytest.mark.usefixtures("ray_session")
def test_rfm_tiles_balanced_and_segments_consistent():
    from security_log_analysis_rust_ray.pipelines.relational import (
        RFM_BINS, user_rfm_segments)
    got = user_rfm_segments(SF).to_pandas()
    n = len(got)
    assert n > RFM_BINS
    for col in ["r_score", "f_score", "m_score"]:
        cnt = got[col].value_counts()
        # DuckDB big-tiles-first rule: sizes differ by at most one and
        # the larger tiles have the smaller tile numbers
        assert cnt.max() - cnt.min() <= 1
        assert sorted(cnt.index) == list(range(1, RFM_BINS + 1))
        big = cnt[cnt == cnt.max()].index
        assert max(big) <= RFM_BINS - (cnt.min() == cnt.max() - 1) \
            or cnt.max() == cnt.min()
    champ = got[got["segment"] == "champion"]
    assert ((champ["r_score"] == 1) & (champ["f_score"] == 1)).all()


@pytest.mark.usefixtures("ray_session")
def test_seasonal_decompose_reconstructs_counts():
    from security_log_analysis_rust_ray.pipelines.relational import \
        events_seasonal_decompose
    got = events_seasonal_decompose(SF).to_pandas()
    assert len(got) > 0
    # additive identity: cnt == trend + dow_effect + residual (round 6)
    recon = got["trend"] + got["dow_effect"] + got["residual"]
    np.testing.assert_allclose(recon.to_numpy(),
                               got["cnt"].to_numpy(dtype=float),
                               atol=3e-6)
    # weekday effects roughly mean-zero over represented dows
    eff = got.groupby(pd.to_datetime(got["day"]).dt.dayofweek)[
        "dow_effect"].first()
    assert abs(eff.mean()) < got["cnt"].mean()  # sanity scale bound


@pytest.mark.usefixtures("ray_session")
def test_survival_curve_matches_km_reference():
    from security_log_analysis_rust_ray.pipelines.relational import (
        DAY_US, user_survival_curve)
    got = user_survival_curve(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    ev["t"] = ev["ts"].astype("int64")
    wm = ev["t"].max()
    durs, obs = [], []
    for _, g in ev.sort_values("t").groupby("user_id"):
        t = g["t"].to_numpy()
        if len(t) >= 2:
            durs.append((t[1] - t[0]) // DAY_US); obs.append(1)
        else:
            durs.append((wm - t[0]) // DAY_US); obs.append(0)
    durs, obs = np.array(durs), np.array(obs)
    s_run, ref = 1.0, {}
    for d in sorted(set(durs[obs == 1])):
        n = int((durs >= d).sum())
        e = int(((durs == d) & (obs == 1)).sum())
        s_run *= 1 - e / n
        ref[d] = (n, e, s_run)
    assert got["t_days"].tolist() == sorted(ref)
    for _, r in got.iterrows():
        n, e, sv = ref[r["t_days"]]
        assert (r["at_risk"], r["events"]) == (n, e)
        assert abs(r["survival"] - sv) < 1e-6
    # survival is a proper non-increasing curve in (0, 1]
    sv = got["survival"].to_numpy()
    assert (np.diff(sv) <= 0).all() and sv[0] <= 1.0 and (sv >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_type_drift_scores_match_reference():
    from security_log_analysis_rust_ray.functions.util import round_half_up
    from security_log_analysis_rust_ray.pipelines.relational import \
        events_type_drift_scores
    got = events_type_drift_scores(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type", "value"]) \
        .sort_values(["value", "event_id"]).reset_index(drop=True)
    n = len(ev)
    g = np.arange(1, n + 1)
    ref = {}
    for t, grp in ev.groupby("event_type"):
        idx = grp.index.to_numpy()
        k = np.arange(1, len(idx) + 1)
        ref[t] = round_half_up(
            np.abs(k / len(idx) - g[idx] / n).max(), 6)
    assert dict(zip(got["event_type"], got["drift"])) == ref
    assert ((got["drift"] > 0) & (got["drift"] <= 1)).all()
