"""TRUE reference-equality test for the sessionizers.

Unlike the scraper layers (selenium, live endpoints — impossible here), the
bluefire scripts are pure pandas, so the REAL reference implementation can
execute in-process: we load scripts/bluefire/step1_threshold.py /
step1_ganz.py from the read-only reference checkout (executing only the
function-definition prefix — the module tail is an argparse CLI), run their
``merger()`` on synthetic series, and require our re-implementation to
produce identical events.

Skipped automatically if the reference checkout is absent.
"""

import os

import pandas as pd
import pytest

from outage_data_scraper_ray.pipelines.sessionize import (
    merge_ganz_sessions,
    merge_threshold_sessions,
)
from outage_data_scraper_ray.synth import synth_pous

REF = "/root/reference/scripts/bluefire"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference checkout not available"
)


def _load_reference_fn(filename: str, fn_name: str):
    """Execute only the definition prefix of a reference CLI script (cut
    before the module-level argparse) and return the named function."""
    src = open(os.path.join(REF, filename)).read()
    cut = src.index("parser = argparse.ArgumentParser()")
    ns: dict = {}
    exec(compile(src[:cut], filename, "exec"), ns)
    return ns[fn_name]


def _series_rows(vals, t0="2023-07-01 00:00:00", step_min=15, tracked=10000):
    ts = pd.Timestamp(t0)
    return [
        {
            "UtilityName": "U", "StateName": "S", "CountyName": "C",
            "CityName": "T", "CountyFIPS": "1", "CustomersTracked": tracked,
            "CustomersOut": int(v),
            "RecordDateTime": str(ts + pd.Timedelta(minutes=step_min * i)),
        }
        for i, v in enumerate(vals)
    ]


def _norm(events):
    out = []
    for e in events:
        if not e:
            continue
        out.append(
            (
                pd.to_datetime(e["start_time"]),
                pd.to_datetime(e["end_time"]),
                pd.to_timedelta(e["duration"]),
                round(float(e["customer_affected_mean"]), 6),
            )
        )
    return sorted(out)


def _pous_series(n_groups=10, n_rows=60, seed=42):
    """Zero-delimited sub-series from the synthetic POUS generator, exactly
    as the reference's is_new() row loop would segment them."""
    df = synth_pous(n_groups, n_rows, seed)
    idx = df.groupby(
        ["UtilityName", "StateName", "CountyName", "CityName", "RecordDateTime"]
    )["CustomersOut"].idxmin()
    df = df.loc[idx].sort_values(
        ["UtilityName", "StateName", "CountyName", "CityName", "RecordDateTime"]
    )
    series = []
    for _, g in df.groupby(["UtilityName", "StateName", "CountyName", "CityName"]):
        zero_before = g["CustomersOut"].shift(1).fillna(1).eq(0)
        for _, run in g.groupby(zero_before.cumsum()):
            rows = run.copy()
            rows["RecordDateTime"] = rows["RecordDateTime"].astype(str)
            series.append(rows.to_dict("records"))
    return series


@pytest.mark.parametrize("threshold,abs_diff", [(0.1, 0.0), (0.0005, 10.0), (0.3, 0.0)])
def test_threshold_merger_matches_reference(threshold, abs_diff):
    ref_merger = _load_reference_fn("step1_threshold.py", "merger")
    mismatches = []
    for rows in _pous_series():
        want = _norm(ref_merger([dict(r) for r in rows], threshold, abs_diff))
        got = _norm(merge_threshold_sessions([dict(r) for r in rows], threshold, abs_diff))
        if got != want:
            mismatches.append((rows, got, want))
    assert not mismatches, (
        f"{len(mismatches)} series diverge from the reference merger; first: "
        f"{[r['CustomersOut'] for r in mismatches[0][0]]}\n"
        f"got={mismatches[0][1]}\nwant={mismatches[0][2]}"
    )


@pytest.mark.parametrize("threshold", [0.0005, 0.005])
def test_ganz_merger_matches_reference(threshold):
    ref_merger = _load_reference_fn("step1_ganz.py", "merger")
    mismatches = []
    for rows in _pous_series(seed=7):
        want = _norm(ref_merger([dict(r) for r in rows], threshold))
        got = _norm(merge_ganz_sessions([dict(r) for r in rows], threshold))
        if got != want:
            mismatches.append((rows, got, want))
    assert not mismatches, f"{len(mismatches)} series diverge from reference ganz merger"


@pytest.mark.parametrize("vals", [
    # D-1: drop smaller than the closest open outage by >= max(10, 10%) -> split
    [1000, 1000, 400, 400, 0],
    # D-2: drop larger than every open outage -> close a set of smaller ones
    [100, 300, 650, 50, 0],
    # stacked outages closed one by one (closest-match selection)
    [200, 500, 900, 700, 200, 0],
    # exact-match close then tail close
    [300, 800, 300, 0],
    # ramp with absorbed drift then collapse
    [1000, 1040, 1010, 1060, 20, 0],
])
def test_threshold_merger_reference_case_d_branches(vals):
    ref_merger = _load_reference_fn("step1_threshold.py", "merger")
    rows = _series_rows(vals)
    want = _norm(ref_merger([dict(r) for r in rows], 0.1, 0.0))
    got = _norm(merge_threshold_sessions([dict(r) for r in rows], 0.1, 0.0))
    assert got == want, f"vals={vals}\ngot={got}\nwant={want}"
