"""Bluefire sessionization (scripts/bluefire/step1_*.py semantics):
hand-computed golden cases for the threshold + ganz mergers, idxmin dedup
vs DuckDB, and distributed-vs-sequential equality on the synthetic POUS
series."""

import duckdb
import pandas as pd
import pytest
import ray.data as rd

from outage_data_scraper_ray.pipelines.sessionize import (
    GROUP_KEYS,
    dedup_min_customers_out,
    merge_ganz_sessions,
    merge_threshold_sessions,
    sessionize,
    event_properties,
    _split_runs,
)
from outage_data_scraper_ray.synth import synth_pous


def _rows(vals, t0="2023-07-01 00:00:00", step_min=15, tracked=10000):
    ts = pd.Timestamp(t0)
    out = []
    for i, v in enumerate(vals):
        out.append(
            {
                "UtilityName": "U", "StateName": "S", "CountyName": "C",
                "CityName": "T", "CountyFIPS": "1", "CustomersTracked": tracked,
                "CustomersOut": v,
                "RecordDateTime": ts + pd.Timedelta(minutes=step_min * i),
            }
        )
    return out


def test_threshold_single_plateau():
    """100 out for 3 ticks then 0: one event, time-weighted mean 100."""
    ev = merge_threshold_sessions(_rows([100, 100, 100, 0]), 0.1, 0)
    # the final zero is a big decrease closing the outage (case D)
    assert len(ev) == 1
    e = ev[0]
    assert e["start_time"] == pd.Timestamp("2023-07-01 00:00:00")
    assert e["end_time"] == pd.Timestamp("2023-07-01 00:45:00")
    assert e["duration"] == pd.Timedelta(minutes=45)
    assert e["customer_affected_mean"] == pytest.approx(100.0)


def test_threshold_two_overlapping_outages():
    """100 then +200 jump then -200 drop then -100: two events; the drop of
    200 closes the closest-sized (200) outage first (case D closest match)."""
    ev = merge_threshold_sessions(_rows([100, 300, 100, 0]), 0.1, 0)
    assert len(ev) == 2
    sizes = sorted(round(e["customer_affected_mean"]) for e in ev)
    # outage A: 100 for 45 min; outage B: 200 for 15 of its 15-min life
    assert ev[0]["duration"] == pd.Timedelta(minutes=15)  # the 200-blob closes first
    assert ev[1]["duration"] == pd.Timedelta(minutes=45)


def test_threshold_small_drift_absorbed():
    """Small deltas under the threshold merge into one outage (cases A/C)."""
    ev = merge_threshold_sessions(_rows([1000, 1050, 990, 1010, 0]), 0.2, 0)
    assert len(ev) == 1


def test_ganz_level_crossing():
    """Threshold 0.05 * 10000 = 500: window spans rows >= 500 until the
    first row back under."""
    ev = merge_ganz_sessions(_rows([100, 600, 700, 400, 100]), 0.05)
    assert len(ev) == 1
    e = ev[0]
    assert e["start_time"] == pd.Timestamp("2023-07-01 00:15:00")
    assert e["end_time"] == pd.Timestamp("2023-07-01 00:45:00")
    # weighted mean over [600@15min, 700@15min] / 30min
    assert e["customer_affected_mean"] == pytest.approx((600 * 900 + 700 * 900) / 1800)


def test_split_runs_on_zero():
    g = pd.DataFrame(_rows([5, 0, 7, 8, 0, 9]))
    runs = _split_runs(g)
    assert [r["CustomersOut"].tolist() for r in runs] == [[5, 0], [7, 8, 0], [9]]


def test_dedup_min_matches_duckdb(ray_session):
    df = synth_pous(n_groups=6, n_rows=25, seed=11)
    got = (
        dedup_min_customers_out(rd.from_pandas(df))
        .to_pandas()
        .sort_values(GROUP_KEYS + ["RecordDateTime"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pous", df)
    want = con.sql(
        """
        SELECT * FROM pous
        QUALIFY row_number() OVER (
            PARTITION BY UtilityName, StateName, CountyName, CityName, RecordDateTime
            ORDER BY CustomersOut
        ) = 1
        ORDER BY UtilityName, StateName, CountyName, CityName, RecordDateTime
        """
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False
    )


@pytest.mark.parametrize("method,kw", [
    ("threshold", {"threshold": 0.1, "abs_diff": 0.0}),
    ("threshold", {"threshold": 0.0005, "abs_diff": 10.0}),
    ("ganz", {"threshold": 0.0005}),
])
def test_distributed_matches_sequential(ray_session, method, kw):
    """The Ray groupby/map_groups sessionizer must equal a sequential pass
    (sorted groups, same mergers) — validates the distributed wiring."""
    df = synth_pous(n_groups=8, n_rows=40, seed=5)
    got = sessionize(rd.from_pandas(df), method=method, **kw).to_pandas()

    # sequential: dedup -> per-group sorted -> split -> merge
    idx = df.groupby(GROUP_KEYS + ["RecordDateTime"])["CustomersOut"].idxmin()
    sdf = df.loc[idx]
    events = []
    for _, g in sdf.groupby(GROUP_KEYS):
        g = g.sort_values("RecordDateTime", kind="mergesort")
        for run in _split_runs(g):
            rows = run.to_dict("records")
            if method == "threshold":
                events.extend(merge_threshold_sessions(rows, kw["threshold"], kw["abs_diff"]))
            else:
                events.extend(merge_ganz_sessions(rows, kw["threshold"]))
    want = pd.DataFrame(events)
    want = want[want["duration"] > pd.Timedelta(seconds=0)]

    key = GROUP_KEYS + ["start_time", "end_time"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want[got.columns].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)
    assert len(got_s) > 0


def test_event_properties(ray_session):
    df = synth_pous(n_groups=4, n_rows=30, seed=3)
    ev = sessionize(rd.from_pandas(df), method="threshold", threshold=0.1)
    props = event_properties(ev)
    assert props["frequency"] > 0
    assert props["avg_duration_sec"] > 0


def test_split_pous_matches_reference_predicates(ray_session):
    """step0_split_file.py:10-23: substring + inclusive date-window filter."""
    import ray.data as rd

    from outage_data_scraper_ray.pipelines.sessionize import split_pous
    from outage_data_scraper_ray.synth import synth_pous

    df = synth_pous(8, 30, 7)
    sub = df["UtilityName"].iloc[0][:2]
    start, end = "2023-07-23 00:00:00", "2023-07-28 00:00:00"
    got = (
        split_pous(rd.from_pandas(df), utility_substring=sub, start=start, end=end)
        .to_pandas()
        .reset_index(drop=True)
    )
    # the reference's exact pandas expression
    want = df[df["UtilityName"].str.contains(sub)]
    ts = pd.to_datetime(want["RecordDateTime"])
    want = want[(ts >= start) & (ts <= end)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_month_properties_matches_reference_window(ray_session):
    """step2_grower_property.py:68-106: month-window scalars equal the
    reference's pandas computation on the same events."""
    import ray.data as rd

    from outage_data_scraper_ray.pipelines.sessionize import (
        month_properties,
        sessionize,
    )
    from outage_data_scraper_ray.synth import synth_pous

    events = sessionize(
        rd.from_pandas(synth_pous(10, 40, 42)), method="threshold",
        threshold=0.1, abs_diff=0.0,
    )
    ev = events.to_pandas()
    got = month_properties(events, 2023, 7)
    ts = pd.to_datetime(ev["start_time"])
    w = ev[(ts >= "2023-07-01") & (ts <= "2023-08-01")]
    assert len(w) > 0
    assert got["frequency"] == len(w)
    if len(w):
        dur_s = pd.to_timedelta(w["duration"]).dt.total_seconds()
        assert got["avg_duration_sec"] == pytest.approx(dur_s.sum() / len(w))
